"""End-to-end tests of the TPU PE decoder."""

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


def test_pe_basic():
    rng = np.random.default_rng(20)
    blocks = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
              for n in (64, 120)]
    out, stats = _decode(default_spec(tb.MODE_PE),
                         [("block", b) for b in blocks] + [("tapemark",)])
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks
    assert sum(1 for b in out if b.kind == "tapemark") == 1
    assert all(b.errcount == 0 and b.warncount == 0 for b in out)
    assert all(b.tries == 1 for b in out if b.kind == "data")


def test_pe_reverse_polarity():
    """PE auto-detects inverted signal polarity (decode_pe.c:129-134)."""
    rng = np.random.default_rng(21)
    blocks = [bytes(rng.integers(0, 256, 80, dtype=np.uint8))]
    out, _ = _decode(default_spec(tb.MODE_PE), [("block", blocks[0])],
                     invert=True)
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks and out[0].errcount == 0


def test_pe_dropout_fake_bits():
    """A mid-block single-track dropout is bridged with fake bits
    (decode_pe.c:245-258), keeping the track in sync."""
    rng = np.random.default_rng(22)
    block = bytes(rng.integers(0, 256, 120, dtype=np.uint8))
    spec = default_spec(tb.MODE_PE)
    hdr, samples = synthesize_tape(spec, [("block", block)])
    samples = np.array(samples)
    st = int(spec.start_gap_secs / spec.deltat)
    samples[st + 3000:st + 3800, 4] = 0        # ~20 bits dead on track 4
    opts = DecodeOptions(mode=tb.MODE_PE, ntrks=9, bpi=1600, ips=50,
                         deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)
    out, _ = decode_tape(samples, opts)
    data_blocks = [b for b in out if b.kind == "data"]
    assert len(data_blocks) == 1
    blk = data_blocks[0]
    # the dropout produces fake bits (warnings) and parity errors on the
    # faked span, but the block length must be preserved
    assert len(blk.data) == len(block)
    assert blk.detail["corrected_bits"] > 0
    # bytes outside the dropout region should survive
    assert blk.data[:100] == block[:100]


def test_pe_noise():
    rng = np.random.default_rng(23)
    blocks = [bytes(rng.integers(0, 256, 100, dtype=np.uint8))]
    spec = default_spec(tb.MODE_PE, noise_rms=0.03, amp_jitter=0.04)
    out, _ = _decode(spec, [("block", blocks[0])])
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks
