"""Full-CLI differential tests: our CLI and the reference C binary decode the
same synthesized .tbin and the .tap outputs must compare byte-identical --
the reference's own acceptance methodology (examples/*/Makefile)."""

import os
import subprocess
import sys

import numpy as np

from readtape_tpu.formats import tbin as tb
from readtape_tpu.synth import default_spec, synthesize_tape

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_both(oracle, tmp_path, name, hdr, samples, args):
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
    ref = (tmp_path / "ref" / f"{name}.tap").read_bytes()
    ours = (tmp_path / "ours" / f"{name}.tap").read_bytes()
    return ref, ours, r1.stdout, r2.stdout


def test_cli_nrzi_tap_identical(oracle, tmp_path):
    rng = np.random.default_rng(50)
    blocks = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
              for n in (120, 80, 37)]
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_NRZI),
        [("block", blocks[0]), ("tapemark",), ("block", blocks[1]),
         ("block", blocks[2]), ("tapemark",)])
    ref, ours, _, _ = run_both(oracle, tmp_path, "n1", hdr, samples,
                               ["-v", "-m", "-nrzi", "-tap"])
    assert ref == ours


def test_cli_pe_tap_identical(oracle, tmp_path):
    rng = np.random.default_rng(51)
    blocks = [bytes(rng.integers(0, 256, 150, dtype=np.uint8))]
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_PE), [("block", blocks[0]), ("tapemark",)])
    ref, ours, _, _ = run_both(
        oracle, tmp_path, "p1", hdr, samples,
        ["-v", "-m", "-pe", "-bpi=1600", "-ips=50", "-tap"])
    assert ref == ours


def test_cli_gcr_tap_identical(oracle, tmp_path):
    rng = np.random.default_rng(52)
    blocks = [bytes(rng.integers(0, 256, 154, dtype=np.uint8))]
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_GCR), [("block", blocks[0]), ("tapemark",)])
    ref, ours, _, _ = run_both(oracle, tmp_path, "g1", hdr, samples,
                               ["-v", "-m", "-gcr", "-ips=25", "-tap"])
    assert ref == ours


def test_cli_ww_tap_identical(oracle, tmp_path):
    rng = np.random.default_rng(53)
    words = [int(w) for w in rng.integers(0, 65536, 24)]
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_WW),
        [("block", words), ("tapemark",), ("block", words[:8])])
    ref, ours, _, _ = run_both(
        oracle, tmp_path, "w1", hdr, samples,
        ["-v", "-whirlwind", "-fluxdir=neg", "-tap"])
    assert ref == ours


def test_cli_bin_output_split(oracle, tmp_path):
    """Without -tap, data files split at tapemarks (.nnn.bin)."""
    rng = np.random.default_rng(54)
    blocks = [bytes(rng.integers(0, 256, 64, dtype=np.uint8))
              for _ in range(2)]
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_NRZI),
        [("block", blocks[0]), ("tapemark",), ("block", blocks[1]),
         ("tapemark",)])
    tb.write_tbin(str(tmp_path / "s1.tbin"), hdr, samples)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "readtape"), "-v", "-m",
         "-nrzi", "s1.tbin"],
        cwd=tmp_path, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert (tmp_path / "s1.001.bin").read_bytes() == blocks[0]
    assert (tmp_path / "s1.002.bin").read_bytes() == blocks[1]
    assert (tmp_path / "s1.log").exists()


def test_cli_nrzi7_even_tap_identical(oracle, tmp_path):
    """7-track NRZI with even parity (-ntrks=7 -even)."""
    rng = np.random.default_rng(55)
    blocks = [bytes(rng.integers(0, 64, 90, dtype=np.uint8))]
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_NRZI, ntrks=7, even_parity=True),
        [("block", blocks[0]), ("tapemark",)])
    ref, ours, _, _ = run_both(
        oracle, tmp_path, "n7e", hdr, samples,
        ["-v", "-m", "-nrzi", "-ntrks=7", "-even", "-tap"])
    assert ref == ours


def test_cli_nrzi7_addparity_tap_identical(oracle, tmp_path):
    """-addparity: the parity bit joins the data as the high bit."""
    rng = np.random.default_rng(56)
    blocks = [bytes(rng.integers(0, 64, 75, dtype=np.uint8))]
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_NRZI, ntrks=7),
        [("block", blocks[0]), ("tapemark",)])
    ref, ours, _, _ = run_both(
        oracle, tmp_path, "n7a", hdr, samples,
        ["-v", "-m", "-nrzi", "-ntrks=7", "-addparity", "-tap"])
    assert ref == ours


def test_cli_nrzi7_revparity_tap_identical(oracle, tmp_path):
    """-revparity=n: blocks of exactly n bytes expect the opposite parity
    (readtape.c's revparity option)."""
    rng = np.random.default_rng(57)
    blocks = [bytes(rng.integers(0, 64, 90, dtype=np.uint8))]
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_NRZI, ntrks=7, even_parity=True),
        [("block", blocks[0]), ("tapemark",)])
    ref, ours, _, ours_log = run_both(
        oracle, tmp_path, "n7r", hdr, samples,
        ["-v", "-m", "-nrzi", "-ntrks=7", "-revparity=90", "-tap"])
    assert ref == ours
    # the even-parity block decodes clean under the reversed expectation
    assert "0 blocks had errors" in ours_log


def test_cli_nrzi_track_order_tap_identical(oracle, tmp_path):
    """-order=: heads wired in a scrambled order are permuted back to the
    canonical (msb..lsb, parity) layout (readtape.c parse_track_order)."""
    rng = np.random.default_rng(58)
    blocks = [bytes(rng.integers(0, 256, 100, dtype=np.uint8))]
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_NRZI), [("block", blocks[0]), ("tapemark",)])
    perm = [3, 8, 1, 6, 0, 5, 2, 7, 4]          # column h <- logical perm[h]
    scrambled = samples[:, perm]
    order = "".join("P" if t == 8 else str(t) for t in perm)
    ref, ours, _, _ = run_both(
        oracle, tmp_path, "nord", hdr, scrambled,
        ["-v", "-m", "-nrzi", f"-order={order}", "-tap"])
    assert ref == ours
    import struct
    n = struct.unpack("<I", ours[:4])[0]
    assert ours[4:4 + n] == blocks[0]


def test_cli_csv_input_tap_identical(oracle, tmp_path):
    """Decoding straight from a .csv capture (no TBIN header: mode/bpi/ips
    come from options, deltat from the timestamps)."""
    from readtape_tpu.formats.csvfmt import write_csv
    rng = np.random.default_rng(59)
    blocks = [bytes(rng.integers(0, 256, 70, dtype=np.uint8))]
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_NRZI), [("block", blocks[0]), ("tapemark",)])
    volts = samples.astype(np.float64) * (hdr.maxvolts / 32767.0)
    write_csv(str(tmp_path / "c1.csv"), 0.0, hdr.tdelta_ns * 1e-9, volts)
    (tmp_path / "ref").mkdir(exist_ok=True)
    (tmp_path / "ours").mkdir(exist_ok=True)
    args = ["-v", "-m", "-nrzi", "-bpi=800", "-ips=50", "-tap"]
    r1 = subprocess.run([oracle] + args + ["-outp=ref/", "c1.csv"],
                        cwd=tmp_path, capture_output=True, text=True)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "readtape")] + args +
        ["-outp=ours/", "c1.csv"],
        cwd=tmp_path, capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    ref = (tmp_path / "ref" / "c1.tap").read_bytes()
    ours = (tmp_path / "ours" / "c1.tap").read_bytes()
    assert ref == ours
    import struct
    n = struct.unpack("<I", ours[:4])[0]
    assert ours[4:4 + n] == blocks[0]


def test_cli_csv_high_amplitude_tap_identical(oracle, tmp_path):
    """CSV captures keep full float precision with no fixed +-6 V clip
    (readtape.c:1405-1448): a 10 V-amplitude capture must decode
    byte-identically to the C, which reads the floats directly. (The old
    int16-at-6V ingest clipped every peak of this tape.)"""
    from readtape_tpu.formats.csvfmt import write_csv
    rng = np.random.default_rng(61)
    blocks = [bytes(rng.integers(0, 256, 90, dtype=np.uint8))]
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_NRZI), [("block", blocks[0]), ("tapemark",)])
    volts = samples.astype(np.float64) * (hdr.maxvolts / 32767.0)
    volts *= 10.0 / np.abs(volts).max()          # scale peaks to 10 V
    write_csv(str(tmp_path / "hi.csv"), 0.0, hdr.tdelta_ns * 1e-9, volts)
    (tmp_path / "ref").mkdir(exist_ok=True)
    (tmp_path / "ours").mkdir(exist_ok=True)
    args = ["-v", "-m", "-nrzi", "-bpi=800", "-ips=50", "-tap"]
    r1 = subprocess.run([oracle] + args + ["-outp=ref/", "hi.csv"],
                        cwd=tmp_path, capture_output=True, text=True)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "readtape")] + args +
        ["-outp=ours/", "hi.csv"],
        cwd=tmp_path, capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    ref = (tmp_path / "ref" / "hi.tap").read_bytes()
    ours = (tmp_path / "ours" / "hi.tap").read_bytes()
    assert ref == ours
    import struct
    n = struct.unpack("<I", ours[:4])[0]
    assert ours[4:4 + n] == blocks[0]


def test_cli_nrzi_correct_tap_identical(oracle, tmp_path):
    """-correct (NRZI): the AGC-keyed single-track flip on parity errors
    (decode_nrzi.c:116-140). A noisy tape exercises the correction path;
    output must stay byte-identical to the C."""
    rng = np.random.default_rng(67)
    blocks = [bytes(rng.integers(0, 256, 150, dtype=np.uint8))
              for _ in range(3)]
    spec = default_spec(tb.MODE_NRZI, noise_rms=0.04, amp_jitter=0.08)
    hdr, samples = synthesize_tape(
        spec, [("block", b) for b in blocks])
    tb.write_tbin(str(tmp_path / "c.tbin"), hdr, samples)
    (tmp_path / "ref").mkdir()
    (tmp_path / "ours").mkdir()
    args = ["-v", "-m", "-nrzi", "-bpi=800", "-ips=50", "-correct", "-tap"]
    r1 = subprocess.run([oracle] + args + ["-outp=ref/", "c.tbin"],
                        cwd=tmp_path, capture_output=True, text=True)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "readtape")] + args +
        ["-outp=ours/", "c.tbin"],
        cwd=tmp_path, capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert (tmp_path / "ref" / "c.tap").read_bytes() == \
        (tmp_path / "ours" / "c.tap").read_bytes()


def test_cli_density_autodetect_tap_identical(oracle, tmp_path):
    """No -bpi: density auto-detection from the transition-delta histogram
    (decoder.c:329-394) must pick the same standard density and produce
    identical output."""
    rng = np.random.default_rng(71)
    blocks = [bytes(rng.integers(0, 256, 120, dtype=np.uint8))]
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_NRZI), [("block", blocks[0]), ("tapemark",)])
    hdr.bpi = 0.0                       # force detection in both engines
    tb.write_tbin(str(tmp_path / "d.tbin"), hdr, samples)
    (tmp_path / "ref").mkdir()
    (tmp_path / "ours").mkdir()
    args = ["-v", "-m", "-nrzi", "-ips=50", "-tap"]
    r1 = subprocess.run([oracle] + args + ["-outp=ref/", "d.tbin"],
                        cwd=tmp_path, capture_output=True, text=True)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    assert "density" in (r1.stdout + r1.stderr).lower()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "readtape")] + args +
        ["-outp=ours/", "d.tbin"],
        cwd=tmp_path, capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert (tmp_path / "ref" / "d.tap").read_bytes() == \
        (tmp_path / "ours" / "d.tap").read_bytes()


def test_cli_gcr_zeros_noisy_tap_identical(oracle, tmp_path):
    """Plain -zeros on a NOISY tape: the pending/stale-extremum
    confirmation rules (decoder.c:617-649) and the live-clock slope gate
    decide which marginal crossings become transitions -- the regime
    where an approximation diverges from the C."""
    rng = np.random.default_rng(81)
    blocks = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
              for n in (154, 210)]
    spec = default_spec(tb.MODE_GCR, noise_rms=0.06, amp_jitter=0.10)
    hdr, samples = synthesize_tape(
        spec, [("block", blocks[0]), ("block", blocks[1]), ("tapemark",)])
    ref, ours, _, _ = run_both(
        oracle, tmp_path, "gz", hdr, samples,
        ["-v", "-m", "-gcr", "-ips=25", "-zeros", "-tap"])
    assert ref == ours


def test_cli_gcr_diff_zeros_noisy_tap_identical(oracle, tmp_path):
    """-differentiate -zeros with noise: phase-local pending consumption
    (decoder.c:654-683) must not re-fire on non-attaining wiggles."""
    rng = np.random.default_rng(83)
    blocks = [bytes(rng.integers(0, 256, 154, dtype=np.uint8))]
    spec = default_spec(tb.MODE_GCR, pulse_width_bits=0.45,
                        noise_rms=0.005)
    hdr, samples = synthesize_tape(
        spec, [("block", blocks[0]), ("tapemark",)])
    ref, ours, _, _ = run_both(
        oracle, tmp_path, "gdz", hdr, samples,
        ["-v", "-m", "-gcr", "-ips=25", "-differentiate", "-zeros",
         "-tap"])
    assert ref == ours


def test_cli_nrzi_zeros_noisy_tap_identical(oracle, tmp_path):
    """-zeros with NRZI: crossings feed the global slot scan at their
    confirmation sample; the slope gate is static because NRZI never
    adjusts the per-track clock (decode_nrzi.c uses only nrzi.clkavg)."""
    rng = np.random.default_rng(85)
    blocks = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
              for n in (120, 80)]
    spec = default_spec(tb.MODE_NRZI, noise_rms=0.05, amp_jitter=0.08)
    hdr, samples = synthesize_tape(
        spec, [("block", blocks[0]), ("tapemark",), ("block", blocks[1])])
    ref, ours, _, _ = run_both(
        oracle, tmp_path, "nz", hdr, samples,
        ["-v", "-m", "-nrzi", "-bpi=800", "-ips=50", "-zeros", "-tap"])
    assert ref == ours


def test_cli_adjskew_identical(oracle, tmp_path):
    """-adjskew (decoder.c:305-320): per-block +-1 skew nudging. The .tap,
    every per-track deviation/bitspacing log line, and each skew
    increase/reduce decision must match the reference."""
    rng = np.random.default_rng(42)
    spec = default_spec(tb.MODE_NRZI,
                        skew_samples=(0, 3, 1, 5, 2, 0, 4, 1, 2))
    items = []
    for n in (200, 80, 512, 120, 300):
        items.append(("block", bytes(rng.integers(0, 256, n,
                                                  dtype=np.uint8))))
    items.insert(2, ("tapemark",))
    hdr, samples = synthesize_tape(spec, items)
    ref, ours, ref_out, ours_out = run_both(
        oracle, tmp_path, "adj", hdr, samples,
        ["-v", "-m", "-nrzi", "-adjskew", "-tap"])
    assert ref == ours
    ref_dev = [ln for ln in ref_out.splitlines() if "deviation is" in ln]
    ours_dev = [ln for ln in ours_out.splitlines() if "deviation is" in ln]
    assert ref_dev and ref_dev == ours_dev


def test_cli_peakstats_identical_nrzi_pe(oracle, tmp_path):
    """peakstats CSVs byte-identical for NRZI and PE: first-transition
    skip (datablock gate), peak_trksums in-range 0/49 counting, and
    output_peakstats' truncating average."""
    rng = np.random.default_rng(43)
    cases = [
        ("ps_n", tb.MODE_NRZI, ["-v", "-m", "-nrzi", "-tap"],
         default_spec(tb.MODE_NRZI,
                      skew_samples=(0, 3, 1, 5, 2, 0, 4, 1, 2))),
        ("ps_p", tb.MODE_PE,
         ["-v", "-m", "-pe", "-bpi=1600", "-ips=50", "-tap"],
         default_spec(tb.MODE_PE)),
    ]
    for name, mode, args, spec in cases:
        items = []
        for n in (150, 80, 64):
            items.append(("block", bytes(rng.integers(0, 256, n,
                                                      dtype=np.uint8))))
        items.append(("tapemark",))
        hdr, samples = synthesize_tape(spec, items)
        ref, ours, _, _ = run_both(oracle, tmp_path, name, hdr, samples,
                                   args)
        assert ref == ours, name
        ref_ps = (tmp_path / "ref" / f"{name}.peakstats.csv").read_bytes()
        ours_ps = (tmp_path / "ours" / f"{name}.peakstats.csv").read_bytes()
        assert ref_ps == ours_ps, name


DEBUG_DIR = "/tmp/oracle_debug"


def _build_debug_oracle():
    """The reference binary compiled with #define DEBUG true: the only
    semantic difference is -correct's parity-check index
    (decode_nrzi.c:258,262 set last_complete_byte; the release build
    leaves it 0)."""
    import shutil
    exe = os.path.join(DEBUG_DIR, "readtape")
    if os.path.exists(exe):
        return exe
    ref_src = "/root/reference/src"
    if not os.path.isdir(ref_src):
        return None
    os.makedirs(DEBUG_DIR, exist_ok=True)
    for name in os.listdir(ref_src):
        shutil.copy(os.path.join(ref_src, name), DEBUG_DIR)
    hdr = os.path.join(DEBUG_DIR, "decoder.h")
    src = open(hdr).read()
    assert "#define DEBUG false" in src
    src = src.replace("#define DEBUG false", "#define DEBUG true")
    # keep the DEBUG build from also writing a trace spreadsheet
    src = src.replace("#define TRACEFILE (true & DEBUG)",
                      "#define TRACEFILE false")
    open(hdr, "w").write(src)
    r = subprocess.run(["make"], cwd=DEBUG_DIR, capture_output=True,
                       timeout=300)
    return exe if r.returncode == 0 and os.path.exists(exe) else None


def test_cli_nrzi_correctdbg_tap_identical(tmp_path):
    """-correctdbg: the DEBUG-build variant of NRZI -correct, whose parity
    check reads data[last_complete_byte] at slot time
    (decode_nrzi.c:116-140, 258-302 with DEBUG). Diffed against an oracle
    binary actually built with #define DEBUG true."""
    import pytest
    oracle = _build_debug_oracle()
    if oracle is None:
        pytest.skip("DEBUG reference oracle could not be built")
    rng = np.random.default_rng(67)
    blocks = [bytes(rng.integers(0, 256, 150, dtype=np.uint8))
              for _ in range(3)]
    spec = default_spec(tb.MODE_NRZI, noise_rms=0.04, amp_jitter=0.08)
    hdr, samples = synthesize_tape(spec, [("block", b) for b in blocks])
    tb.write_tbin(str(tmp_path / "cd.tbin"), hdr, samples)
    (tmp_path / "ref").mkdir()
    (tmp_path / "ours").mkdir()
    args = ["-v", "-m", "-nrzi", "-bpi=800", "-ips=50", "-tap"]
    r1 = subprocess.run([oracle] + args + ["-correct", "-outp=ref/",
                                           "cd.tbin"],
                        cwd=tmp_path, capture_output=True, text=True)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "readtape")] + args +
        ["-correctdbg", "-outp=ours/", "cd.tbin"],
        cwd=tmp_path, capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert (tmp_path / "ref" / "cd.tap").read_bytes() == \
        (tmp_path / "ours" / "cd.tap").read_bytes()
    # the per-block decisions (tries/parmset/errors) must agree too
    import re
    pat = re.compile(r"wrote block.*parmset \d+")
    assert pat.findall(r1.stdout) == pat.findall(r2.stdout)
