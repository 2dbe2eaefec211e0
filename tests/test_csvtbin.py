"""csvtbin converter tests, including a differential run against the
reference csvtbin binary."""

import os
import subprocess

import numpy as np

from readtape_tpu import csvtbin as cv
from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.csvfmt import read_csv, write_csv


def _make_csv(path, n=5000, ntrks=9, seed=0):
    rng = np.random.default_rng(seed)
    volts = (rng.normal(0, 0.5, (n, ntrks))
             + 2 * np.sin(np.arange(n) / 10)[:, None]).astype(np.float32)
    write_csv(str(path), 0.0, 1.28e-6, volts)
    return volts


def test_csv_roundtrip(tmp_path):
    volts = _make_csv(tmp_path / "a.csv")
    t0, dt, back = read_csv(str(tmp_path / "a.csv"))
    assert abs(dt - 1.28e-6) < 1e-9
    np.testing.assert_allclose(back, volts, atol=1e-4)


def test_csv_to_tbin_to_csv(tmp_path):
    volts = _make_csv(tmp_path / "a.csv")
    assert cv.main([str(tmp_path / "a.csv"), str(tmp_path / "a.tbin"),
                    "-nrzi", "-bpi=800", "-ips=50"]) == 0
    hdr, samples = tb.read_tbin(str(tmp_path / "a.tbin"))
    assert hdr.mode == tb.MODE_NRZI and hdr.ntrks == 9
    assert hdr.tdelta_ns == 1280
    got = tb.samples_to_volts(np.asarray(samples), hdr.maxvolts)
    np.testing.assert_allclose(got, volts, atol=2e-4 * hdr.maxvolts)
    assert cv.main([str(tmp_path / "a.tbin"), str(tmp_path / "b.csv")]) == 0
    _, _, back = read_csv(str(tmp_path / "b.csv"))
    np.testing.assert_allclose(back, volts, atol=3e-4 * hdr.maxvolts)


def test_oracle_reads_converted_tbin(tmp_path, oracle):
    """The reference readtape must accept a tbin our converter produced."""
    _make_csv(tmp_path / "c.csv")
    cv.main([str(tmp_path / "c.csv"), str(tmp_path / "c.tbin"),
             "-nrzi", "-bpi=800", "-ips=50"])
    r = subprocess.run([oracle, "-nrzi", "c.tbin"], cwd=tmp_path,
                       capture_output=True, text=True)
    assert "using .tbin bpi = 800" in r.stdout
