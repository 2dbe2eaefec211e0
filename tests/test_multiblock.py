"""Multi-block NRZI segments: gaps SHORTER than the segmenter's min_gap
merge several blocks into one segment; the slot scan ends at each block's
postamble idle and the host re-dispatches the remainder, so every block
is still recovered — matching the reference's per-block re-entry
(readtape.c:1720-1882). Round-1 behavior silently dropped everything
after the first block of such a segment."""

import os
import subprocess
import sys

import numpy as np

from readtape_tpu.decode.pipeline import DecodeOptions, decode_tape
from readtape_tpu.formats import tbin as tb
from readtape_tpu.synth import default_spec, synthesize_tape

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_tape(ibg_secs):
    rng = np.random.default_rng(83)
    blocks = [bytes(rng.integers(0, 256, 120, dtype=np.uint8))
              for _ in range(4)]
    spec = default_spec(tb.MODE_NRZI, ibg_secs=ibg_secs,
                        start_gap_secs=0.004)
    hdr, samples = synthesize_tape(spec, [("block", b) for b in blocks])
    return hdr, samples, blocks


def test_sub_min_gap_blocks_all_recovered():
    # 0.8 ms gaps < the 1.5 ms min_gap: all 4 blocks share one segment
    hdr, samples, blocks = _mk_tape(0.0008)
    opts = DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                         deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)
    out, stats = decode_tape(samples, opts)
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks, \
        f"recovered {len(datas)}/4 blocks from the merged segment"
    assert stats["nerrblocks"] == 0


def test_sub_min_gap_tap_identical_to_oracle(oracle, tmp_path):
    hdr, samples, blocks = _mk_tape(0.0008)
    tb.write_tbin(str(tmp_path / "mb.tbin"), hdr, samples)
    (tmp_path / "ref").mkdir()
    (tmp_path / "ours").mkdir()
    args = ["-v", "-m", "-nrzi", "-bpi=800", "-ips=50", "-tap"]
    r1 = subprocess.run([oracle] + args + ["-outp=ref/", "mb.tbin"],
                        cwd=tmp_path, capture_output=True, text=True)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "readtape")] + args +
        ["-outp=ours/", "mb.tbin"],
        cwd=tmp_path, capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert (tmp_path / "ref" / "mb.tap").read_bytes() == \
        (tmp_path / "ours" / "mb.tap").read_bytes()


def _diff_vs_oracle(oracle, tmp_path, hdr, samples, args, name):
    tb.write_tbin(str(tmp_path / f"{name}.tbin"), hdr, samples)
    (tmp_path / "ref").mkdir(exist_ok=True)
    (tmp_path / "ours").mkdir(exist_ok=True)
    r1 = subprocess.run([oracle] + args + ["-outp=ref/", f"{name}.tbin"],
                        cwd=tmp_path, capture_output=True, text=True)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "readtape")] + args +
        ["-outp=ours/", f"{name}.tbin"],
        cwd=tmp_path, capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert (tmp_path / "ref" / f"{name}.tap").read_bytes() == \
        (tmp_path / "ours" / f"{name}.tap").read_bytes()


def test_pe_short_gap_blocks_identical_to_oracle(oracle, tmp_path):
    """PE blocks separated by gaps just past the 2.5-bit idle horizon:
    the reference ends each block at all-tracks-idle and resets track
    state; our mode-aware segmentation must split identically."""
    rng = np.random.default_rng(89)
    blocks = [bytes(rng.integers(0, 256, 90, dtype=np.uint8))
              for _ in range(3)]
    spec = default_spec(tb.MODE_PE, ibg_secs=0.0006,   # ~19 bits at 1600/50
                        start_gap_secs=0.003)
    hdr, samples = synthesize_tape(spec, [("block", b) for b in blocks])
    _diff_vs_oracle(oracle, tmp_path, hdr, samples,
                    ["-v", "-m", "-pe", "-bpi=1600", "-ips=50", "-tap"],
                    "pes")


def test_gcr_short_gap_blocks_identical_to_oracle(oracle, tmp_path):
    rng = np.random.default_rng(91)
    blocks = [bytes(rng.integers(0, 256, 80, dtype=np.uint8))
              for _ in range(3)]
    spec = default_spec(tb.MODE_GCR, ibg_secs=0.0005,
                        start_gap_secs=0.003)
    hdr, samples = synthesize_tape(spec, [("block", b) for b in blocks])
    _diff_vs_oracle(oracle, tmp_path, hdr, samples,
                    ["-v", "-m", "-gcr", "-bpi=9042", "-ips=25", "-tap"],
                    "gcs")


def test_many_blocks_past_old_round_cap():
    """A merged segment with MORE blocks than the re-dispatch loop's old
    16-round cap (each round carves one block): all 20 must come back."""
    rng = np.random.default_rng(84)
    blocks = [bytes(rng.integers(0, 256, 24, dtype=np.uint8))
              for _ in range(20)]
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.0008,
                        start_gap_secs=0.004)
    hdr, samples = synthesize_tape(spec, [("block", b) for b in blocks])
    opts = DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                         deltat=hdr.tdelta_ns * 1e-9,
                         maxvolts=hdr.maxvolts)
    out, stats = decode_tape(samples, opts)
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks, \
        f"recovered {len(datas)}/20 blocks from the merged segment"
    # per-block end times must be distinct and increasing (each block's
    # t_end comes from ITS end_s, not the shared segment end)
    ends = [b.t_end for b in out if b.kind == "data"]
    assert all(e2 > e1 for e1, e2 in zip(ends, ends[1:])), ends
