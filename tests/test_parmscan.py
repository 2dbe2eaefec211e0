"""GCR parmset grid scan (-parmscan): differential test against the
reference binary built with GCR_PARMSCAN enabled (readtape.c:1730-1754).

The reference re-reads the first block once per combo (5280 sequential
decodes); here the grid rides the batched parmset axis, so a whole chunk
of combos decodes in one device call. The log lines must match the C's
anyway -- same float32 grid stepping, same fields, same values."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from readtape_tpu.decode.pipeline import (DecodeOptions, TapeDecoder,
                                          gcr_parmscan, parmscan_grid)
from readtape_tpu.formats import tbin as tb
from readtape_tpu.synth import default_spec, synthesize_tape

REFERENCE_SRC = "/root/reference/src"
PSCAN_DIR = "/tmp/oracle_pscan"


@pytest.fixture(scope="session")
def pscan_oracle():
    """The reference binary with the GCR_PARMSCAN debug feature compiled
    in (decoder.h:47 flipped in the /tmp build copy)."""
    exe = os.path.join(PSCAN_DIR, "readtape")
    if os.path.exists(exe):
        return exe
    if not os.path.isdir(REFERENCE_SRC):
        pytest.skip("reference source not available")
    os.makedirs(PSCAN_DIR, exist_ok=True)
    for name in os.listdir(REFERENCE_SRC):
        shutil.copy(os.path.join(REFERENCE_SRC, name), PSCAN_DIR)
    hdr = os.path.join(PSCAN_DIR, "decoder.h")
    with open(hdr) as f:
        src = f.read()
    src = src.replace("#define GCR_PARMSCAN false",
                      "#define GCR_PARMSCAN true")
    with open(hdr, "w") as f:
        f.write(src)
    try:
        subprocess.run(["make", "readtape"], cwd=PSCAN_DIR, check=True,
                       capture_output=True, timeout=300)
    except Exception:
        pytest.skip("parmscan oracle build failed")
    if not os.path.exists(exe):
        pytest.skip("parmscan oracle build failed")
    return exe


def _scan_lines(text):
    return [ln.strip() for ln in text.splitlines()
            if ln.startswith("clk_alpha ")]


def _make_tape():
    """A one-block GCR tape degraded by transition-time jitter only: the
    gaps stay clean (so the C's first readblock position IS the block and
    the scan runs exactly once -- on a noisy-gap tape the reference
    re-scans at every pre-block noise position while numblks == 0), while
    the jitter makes the grid's extreme z1pt/z2pt combos decode
    differently from the good ones."""
    rng = np.random.default_rng(77)
    block = bytes(rng.integers(0, 256, 154, dtype=np.uint8))
    spec = default_spec(tb.MODE_GCR, time_jitter_bits=0.025, seed=77)
    hdr, samples = synthesize_tape(spec, [("block", block), ("tapemark",)])
    return hdr, samples


def test_parmscan_matches_reference(pscan_oracle, tmp_path):
    hdr, samples = _make_tape()
    tb.write_tbin(str(tmp_path / "ps.tbin"), hdr, samples)
    r = subprocess.run([pscan_oracle, "-v", "-m", "-gcr", "-ips=25",
                        "-tap", "ps.tbin"],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    ref_lines = _scan_lines(r.stdout)
    grid = parmscan_grid()
    assert len(ref_lines) == len(grid)

    # the combo sequence (float32 stepping incl. its accumulated drift)
    # must match the C's line for line
    for ln, (ca, pa, z1, z2) in zip(ref_lines, grid):
        prefix = (f"clk_alpha {ca:.3f} pulseadj {pa:.3f} "
                  f"z1pt {z1:.3f} z2pt {z2:.3f}")
        assert ln.startswith(prefix), (ln, prefix)

    # decode a subset of combos (first chunk + a mid-grid chunk) on the
    # batched parmset axis and compare full result lines vs the C's
    sub = list(range(8)) + list(range(2640, 2648))
    combos = [grid[i] for i in sub]
    opts = DecodeOptions(mode=tb.MODE_GCR, ntrks=9, bpi=9042, ips=25,
                         deltat=hdr.tdelta_ns * 1e-9,
                         maxvolts=hdr.maxvolts)
    dec = TapeDecoder(samples, opts)
    segs = dec.segments()
    ours = []
    os.environ["READTAPE_PARMSCAN_CHUNK"] = "8"
    try:
        gcr_parmscan(dec, segs[0], lambda s: ours.append(s.strip()),
                     combos=combos)
    finally:
        del os.environ["READTAPE_PARMSCAN_CHUNK"]
    assert len(ours) == len(sub)
    mismatches = [(got, ref_lines[i]) for got, i in zip(ours, sub)
                  if got != ref_lines[i]]
    assert not mismatches, mismatches[:4]


def test_parmscan_cli_smoke(tmp_path):
    """-parmscan end to end through the CLI (grid truncated via the env
    knob): scan lines appear in the log and the decode still completes."""
    import subprocess
    import sys
    hdr, samples = _make_tape()
    tb.write_tbin(str(tmp_path / "pc.tbin"), hdr, samples)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               READTAPE_PARMSCAN_LIMIT="4", READTAPE_PARMSCAN_CHUNK="4")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "readtape"), "-v", "-m",
         "-gcr", "-ips=25", "-tap", "-parmscan", "pc.tbin"],
        cwd=tmp_path, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    lines = _scan_lines(r.stdout)
    assert len(lines) == 4
    assert all(ln.startswith("clk_alpha 0.010 ") for ln in lines)
    assert (tmp_path / "pc.tap").exists()


def test_parmscan_restores_parmsets():
    hdr, samples = _make_tape()
    opts = DecodeOptions(mode=tb.MODE_GCR, ntrks=9, bpi=9042, ips=25,
                         deltat=hdr.tdelta_ns * 1e-9,
                         maxvolts=hdr.maxvolts)
    dec = TapeDecoder(samples, opts)
    segs = dec.segments()
    before = (opts.parmsets, dec.P, len(opts.parmsets.sets))
    gcr_parmscan(dec, segs[0], lambda s: None, combos=parmscan_grid()[:2])
    assert (opts.parmsets, dec.P, len(opts.parmsets.sets)) == before
