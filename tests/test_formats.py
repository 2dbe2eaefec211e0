import numpy as np
import pytest

from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.simh import TapWriter, read_tap
from readtape_tpu.formats.parms import (
    builtin_parmsets, parse_parms_text, MODE_NRZI, MODE_PE, MODE_GCR, MODE_WW)


def test_tbin_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    samples = rng.integers(-32000, 32000, (1000, 9), dtype=np.int16)
    hdr = tb.TbinHeader(descr="test tape", ntrks=9, tdelta_ns=1280,
                        maxvolts=6.0, mode=tb.MODE_NRZI, bpi=800, ips=50)
    path = str(tmp_path / "x.tbin")
    tb.write_tbin(path, hdr, samples)
    hdr2, samples2 = tb.read_tbin(path)
    assert hdr2.ntrks == 9 and hdr2.tdelta_ns == 1280
    assert hdr2.mode == tb.MODE_NRZI
    assert abs(hdr2.maxvolts - 6.0) < 1e-6
    assert hdr2.bpi == 800 and hdr2.ips == 50
    assert hdr2.descr == "test tape"
    np.testing.assert_array_equal(np.asarray(samples2), samples)


def test_tbin_trkorder_extension(tmp_path):
    samples = np.zeros((10, 6), dtype=np.int16)
    hdr = tb.TbinHeader(ntrks=6, tdelta_ns=5000, maxvolts=5.0,
                        mode=tb.MODE_WW, trkorder="CMLcml")
    path = str(tmp_path / "ww.tbin")
    tb.write_tbin(path, hdr, samples)
    hdr2, _ = tb.read_tbin(path)
    assert hdr2.trkorder == "CMLcml"
    assert hdr2.flags & tb.TBIN_TRKORDER_INCLUDED


def test_tbin_oracle_reads_ours(tmp_path, oracle):
    """The reference C binary must accept a .tbin file we wrote."""
    import subprocess
    samples = np.zeros((5000, 9), dtype=np.int16)
    hdr = tb.TbinHeader(ntrks=9, tdelta_ns=1280, maxvolts=6.0,
                        mode=tb.MODE_NRZI, bpi=800, ips=50)
    path = str(tmp_path / "z.tbin")
    tb.write_tbin(path, hdr, samples)
    r = subprocess.run([oracle, "-nrzi", "z.tbin"], cwd=tmp_path,
                       capture_output=True, text=True)
    assert ".tbin file header" in r.stdout
    assert "using .tbin bpi = 800" in r.stdout


def test_tap_roundtrip(tmp_path):
    path = str(tmp_path / "x.tap")
    w = TapWriter(path)
    w.write_block(b"hello", error=False)      # odd length: pad
    w.write_tapemark()
    w.write_block(b"world!", error=True)
    w.write_eom()
    w.close()
    recs = read_tap(path)
    kinds = [r.kind for r in recs]
    assert kinds == ["data", "tapemark", "data", "eom"]
    assert recs[0].data == b"hello" and not recs[0].error
    assert recs[2].data == b"world!" and recs[2].error


def test_builtin_parmsets():
    for mode, n in [(MODE_PE, 8), (MODE_NRZI, 8), (MODE_GCR, 5), (MODE_WW, 2)]:
        ps = builtin_parmsets(mode)
        assert len(ps) == n
        assert all(p.active for p in ps.sets)
    nrzi = builtin_parmsets(MODE_NRZI)
    assert nrzi[0].clk_alpha == 0.2 and nrzi[0].agc_alpha == 0.3
    assert nrzi[0].midbit == 0.5
    gcr = builtin_parmsets(MODE_GCR)
    assert gcr[0].z1pt == 1.45 and gcr[0].z2pt == 2.35


def test_parms_file_parse():
    text = """
// a comment
readtape -ntrks=7 -even
parms active, clk_window, clk_alpha, bogus_parm, pkww_rise, id
{ 1, 3, 0.1, 9.9, 0.4, PRM } // first
{ 1, 0, 0.2, 9.9, 0.1, "PRM" }
{ 0, 0, 0.2, 9.9, 0.1, PRM }
"""
    ps = parse_parms_text(text, MODE_NRZI)
    assert len(ps) == 2          # inactive set dropped
    assert ps[0].clk_window == 3 and ps[0].clk_alpha == pytest.approx(0.1)
    assert ps[0].pkww_rise == pytest.approx(0.4)
    assert ps[0].comment == "first"
    # missing parm defaults to first builtin value
    assert ps[0].pulse_adj == pytest.approx(0.3)
    assert ps.extra_options == ["-ntrks=7", "-even"]
    assert any("obsolete" in w for w in ps.warnings)


def test_parms_gcr_example_file():
    """The example gcr.parms shipped with the reference must parse."""
    import os
    path = "/root/reference/examples/9trk_GCR/gcr.parms"
    if not os.path.exists(path):
        pytest.skip("no reference examples")
    with open(path) as f:
        ps = parse_parms_text(f.read(), MODE_GCR)
    assert len(ps) >= 1
