"""End-to-end tests of the TPU NRZI decoder against synthesized tapes
(which are themselves validated against the reference C binary in
test_synth_oracle.py)."""

import numpy as np

from readtape_tpu.formats import tbin as tb
from readtape_tpu.synth import default_spec, synthesize_tape
from readtape_tpu.decode.pipeline import DecodeOptions, decode_tape


def _decode(spec, items, **opt_kw):
    hdr, samples = synthesize_tape(spec, items)
    opts = DecodeOptions(mode=spec.mode, ntrks=spec.ntrks, bpi=spec.bpi,
                         ips=spec.ips, deltat=hdr.tdelta_ns * 1e-9,
                         maxvolts=hdr.maxvolts, **opt_kw)
    return decode_tape(samples, opts)


def test_nrzi9_basic():
    rng = np.random.default_rng(1)
    blocks = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
              for n in (100, 37, 150)]
    out, stats = _decode(default_spec(tb.MODE_NRZI),
                         [("block", b) for b in blocks] + [("tapemark",)])
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks
    assert sum(1 for b in out if b.kind == "tapemark") == 1
    assert all(b.errcount == 0 and b.warncount == 0 for b in out)
    assert stats["nblocks"] == 3 and stats["ntapemarks"] == 1


def test_nrzi7():
    rng = np.random.default_rng(2)
    blocks = [bytes(rng.integers(0, 64, 90, dtype=np.uint8))]
    spec = default_spec(tb.MODE_NRZI, ntrks=7, bpi=556)
    out, _ = _decode(spec, [("block", blocks[0]), ("tapemark",)])
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks
    assert sum(1 for b in out if b.kind == "tapemark") == 1


def test_nrzi7_even_parity():
    rng = np.random.default_rng(3)
    blocks = [bytes(rng.integers(0, 64, 80, dtype=np.uint8))]
    spec = default_spec(tb.MODE_NRZI, ntrks=7, bpi=800, even_parity=True)
    out, _ = _decode(spec, [("block", blocks[0])], expected_parity=0)
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks
    assert out[0].errcount == 0


def test_nrzi_noise_skew_deskew():
    rng = np.random.default_rng(4)
    blocks = [bytes(rng.integers(0, 256, 120, dtype=np.uint8))
              for _ in range(2)]
    spec = default_spec(tb.MODE_NRZI, noise_rms=0.04, amp_jitter=0.08,
                        skew_samples=(0, 2, 1, 0, 3, 0, 1, 2, 0))
    out, stats = _decode(spec, [("block", b) for b in blocks], deskew=True)
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks
    assert all(b.errcount == 0 for b in out)
    # inferred delays are relative to the slowest track
    assert stats["skew"] == [3, 1, 2, 3, 0, 3, 2, 1, 3]


def test_nrzi_explicit_skew():
    rng = np.random.default_rng(5)
    blocks = [bytes(rng.integers(0, 256, 100, dtype=np.uint8))]
    spec = default_spec(tb.MODE_NRZI, skew_samples=(0, 3, 0, 0, 0, 0, 0, 0, 0))
    out, _ = _decode(spec, [("block", blocks[0])],
                     skew=(3, 0, 3, 3, 3, 3, 3, 3, 3))
    assert [b.data for b in out if b.kind == "data"] == blocks


def test_nrzi_crc_lrc_detects_corruption():
    """Flip amplitude of one transition region so a bit drops; the decode
    should flag parity/CRC errors rather than silently pass."""
    rng = np.random.default_rng(6)
    block = bytes(rng.integers(0, 256, 100, dtype=np.uint8))
    spec = default_spec(tb.MODE_NRZI)
    hdr, samples = synthesize_tape(spec, [("block", block)])
    # kill the signal on one track for a span inside the block's data
    # (the block starts right after the synthesized start gap)
    start = int(spec.start_gap_secs / spec.deltat)
    mid = start + 1000
    samples = np.array(samples)
    samples[mid:mid + 500, 3] = 0
    opts = DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                         deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)
    out, _ = decode_tape(samples, opts)
    data_blocks = [b for b in out if b.kind in ("data", "badblock")]
    assert data_blocks, "block vanished entirely"
    assert any(b.errcount > 0 or b.data != block for b in data_blocks)


def test_density_detection():
    rng = np.random.default_rng(7)
    blocks = [bytes(rng.integers(0, 256, 150, dtype=np.uint8))]
    spec = default_spec(tb.MODE_NRZI)   # 800 bpi
    hdr, samples = synthesize_tape(spec, [("block", blocks[0])] * 3)
    opts = DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                         deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)
    from readtape_tpu.decode.pipeline import TapeDecoder
    dec = TapeDecoder(samples, opts)
    segs = dec.segments()
    std, raw = dec.detect_density(segs)
    assert std == 800.0
