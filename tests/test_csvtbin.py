"""csvtbin feature parity vs the reference utility (csvtbin.c): the
sample payload of CSV->TBIN conversions must be byte-identical (headers
compared field-wise, excluding conversion timestamps), and the -read /
-showheader / -scale= / -graph= / -redo / float -stagger= features must
behave like the C."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.csvfmt import write_csv

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_CSVTBIN = "/tmp/oracle/csvtbin"


@pytest.fixture(scope="module")
def csvtbin_oracle(oracle):
    # `oracle` builds /tmp/oracle (incl. csvtbin) from the reference source
    if not os.path.exists(ORACLE_CSVTBIN):
        pytest.skip("reference csvtbin binary not available")
    return ORACLE_CSVTBIN


def _ours(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "readtape_tpu.csvtbin"] + args,
        capture_output=True, text=True, env=env, cwd=REPO)


def _mk_csv(path, seed=7, n=3000, ntrks=5, amp=3.0, deltat=2e-6):
    rng = np.random.default_rng(seed)
    volts = (rng.standard_normal((n, ntrks)) * amp / 3).astype(np.float64)
    volts = np.clip(volts, -amp, amp)
    write_csv(str(path), 0.0, deltat, volts)
    return volts


def _payload(path):
    """Samples of a .tbin (skipping the header) via the parser, plus the
    parsed header."""
    hdr, samples = tb.read_tbin(str(path))
    return hdr, np.asarray(samples)


def _assert_equivalent(ours_path, ref_path):
    h1, s1 = _payload(ours_path)
    h2, s2 = _payload(ref_path)
    assert (h1.ntrks, h1.tdelta_ns, h1.mode) == \
        (h2.ntrks, h2.tdelta_ns, h2.mode)
    assert abs(h1.maxvolts - h2.maxvolts) < 1e-5, \
        f"maxvolts {h1.maxvolts} vs {h2.maxvolts}"
    assert s1.shape == s2.shape, f"{s1.shape} vs {s2.shape}"
    np.testing.assert_array_equal(s1, s2)


def test_csv_to_tbin_identical_payload(csvtbin_oracle, tmp_path):
    _mk_csv(tmp_path / "a.csv")
    r = subprocess.run([csvtbin_oracle, "-ntrks=5", "-nrzi", "-bpi=800",
                        "-ips=50", "a"],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    os.rename(tmp_path / "a.tbin", tmp_path / "ref.tbin")
    r2 = _ours(["-ntrks=5", "-nrzi", "-bpi=800", "-ips=50",
                str(tmp_path / "a.csv"), str(tmp_path / "ours.tbin")])
    assert r2.returncode == 0, r2.stdout + r2.stderr
    _assert_equivalent(tmp_path / "ours.tbin", tmp_path / "ref.tbin")


def test_scale_matches_oracle(csvtbin_oracle, tmp_path):
    _mk_csv(tmp_path / "a.csv")
    r = subprocess.run([csvtbin_oracle, "-ntrks=5", "-scale=2.5", "a"],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    os.rename(tmp_path / "a.tbin", tmp_path / "ref.tbin")
    r2 = _ours(["-ntrks=5", "-scale=2.5",
                str(tmp_path / "a.csv"), str(tmp_path / "ours.tbin")])
    assert r2.returncode == 0, r2.stdout + r2.stderr
    _assert_equivalent(tmp_path / "ours.tbin", tmp_path / "ref.tbin")


def test_redo_rescales_clipped_conversion(csvtbin_oracle, tmp_path):
    # the maxvolts estimate comes from the first 1M-line preread
    # (csvtbin.c:631); a later spike clips and -redo rescales. Both
    # converters must take the same redo path and produce the same tbin.
    rng = np.random.default_rng(5)
    n = 1_000_400
    volts = (rng.standard_normal((n, 5)) * 0.2).astype(np.float64)
    volts = np.clip(volts, -0.6, 0.6)
    volts[n - 100, 0] = 4.0                    # past the preread window
    write_csv(str(tmp_path / "a.csv"), 0.0, 2e-6, volts)
    r = subprocess.run([csvtbin_oracle, "-ntrks=5", "-redo", "a"],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    log = (tmp_path / "a.csvtbin.log").read_text() \
        if (tmp_path / "a.csvtbin.log").exists() else ""
    assert "redoing" in (r.stdout + r.stderr + log)
    os.rename(tmp_path / "a.tbin", tmp_path / "ref.tbin")
    r2 = _ours(["-ntrks=5", "-redo",
                str(tmp_path / "a.csv"), str(tmp_path / "ours.tbin")])
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "redoing" in r2.stdout
    _assert_equivalent(tmp_path / "ours.tbin", tmp_path / "ref.tbin")


def test_read_regenerates_reference_format_csv(csvtbin_oracle, tmp_path):
    _mk_csv(tmp_path / "a.csv")
    subprocess.run([csvtbin_oracle, "-ntrks=5", "a"],
                   cwd=tmp_path, check=True, capture_output=True)
    os.rename(tmp_path / "a.tbin", tmp_path / "t.tbin")
    os.rename(tmp_path / "a.csv", tmp_path / "orig.csv")
    r = subprocess.run([csvtbin_oracle, "-read", "t"],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    os.rename(tmp_path / "t.csv", tmp_path / "ref.csv")
    r2 = _ours(["-read", str(tmp_path / "t.tbin"),
                str(tmp_path / "ours.csv")])
    assert r2.returncode == 0, r2.stdout + r2.stderr
    ref_rows = (tmp_path / "ref.csv").read_text().splitlines()
    our_rows = (tmp_path / "ours.csv").read_text().splitlines()
    assert len(ref_rows) == len(our_rows)
    # numeric equality row by row (the C uses %12.8lf/%9.5f; match values)
    for i in (2, 5, len(ref_rows) - 1):
        rv = [float(x) for x in ref_rows[i].split(",") if x.strip()]
        ov = [float(x) for x in our_rows[i].split(",") if x.strip()]
        assert rv == pytest.approx(ov, abs=1e-5), f"row {i}"


def test_showheader_reports_fields(tmp_path):
    _mk_csv(tmp_path / "a.csv")
    _ours(["-ntrks=5", "-gcr", "-bpi=9042", "-ips=25", "-descr=hello",
           str(tmp_path / "a.csv"), str(tmp_path / "t.tbin")])
    r = _ours(["-showheader", str(tmp_path / "t.tbin")])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "encoding GCR" in r.stdout
    assert "description: hello" in r.stdout
    assert "3,000 samples" in r.stdout


def test_graph_extraction(tmp_path):
    _mk_csv(tmp_path / "a.csv")
    r = _ours(["-ntrks=5", "-graph=500",
               str(tmp_path / "a.csv"), str(tmp_path / "t.tbin")])
    assert r.returncode == 0, r.stdout + r.stderr
    g = (tmp_path / "t.tbin.graph.csv").read_text().splitlines()
    assert len(g) == 6                     # 3000 / 500
    vals = [float(line.split(",")[1]) for line in g]
    assert all(0.0 < v <= 4.5 for v in vals)


def test_float_stagger(tmp_path):
    _mk_csv(tmp_path / "a.csv", ntrks=3)
    _ours(["-ntrks=3", str(tmp_path / "a.csv"), str(tmp_path / "t.tbin")])
    r = _ours(["-read", "-stagger=2.0", str(tmp_path / "t.tbin"),
               str(tmp_path / "s.csv")])
    assert r.returncode == 0, r.stdout + r.stderr
    row = [float(x) for x in
           (tmp_path / "s.csv").read_text().splitlines()[2].split(",")
           if x.strip()]
    # track k is offset by 2k volts
    plain = _ours(["-read", str(tmp_path / "t.tbin"),
                   str(tmp_path / "p.csv")])
    prow = [float(x) for x in
            (tmp_path / "p.csv").read_text().splitlines()[2].split(",")
            if x.strip()]
    for k in range(3):
        assert row[1 + k] == pytest.approx(prow[1 + k] + 2.0 * k, abs=1e-4)
