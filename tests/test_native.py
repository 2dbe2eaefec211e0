"""Native C++ IO runtime tests (skipped when no toolchain)."""

import numpy as np
import pytest

from readtape_tpu import native
from readtape_tpu.formats.csvfmt import write_csv
from readtape_tpu.formats.simh import read_tap

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_native_csv_scan(tmp_path):
    rng = np.random.default_rng(0)
    volts = rng.normal(0, 1, (4000, 9)).astype(np.float32)
    path = str(tmp_path / "x.csv")
    write_csv(path, 0.0, 1.28e-6, volts)
    t0, dt, got = native.csv_scan_native(path)
    assert abs(dt - 1.28e-6) < 1e-9
    assert got.shape == volts.shape
    np.testing.assert_allclose(got, volts, atol=1e-4)


def test_native_tap_writer(tmp_path):
    path = str(tmp_path / "x.tap")
    w = native.NativeTapWriter(path)
    w.write_block(b"hello", error=False)
    w.write_tapemark()
    w.write_block(b"world!", error=True)
    w.write_eom()
    w.close()
    recs = read_tap(path)
    assert [r.kind for r in recs] == ["data", "tapemark", "data", "eom"]
    assert recs[0].data == b"hello" and recs[2].data == b"world!"
    assert recs[2].error
