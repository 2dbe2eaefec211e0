"""The power-of-two decode bucket extends past a segment's end into REAL
tape; the reference stops scanning a block at its idle point, so anything
there (gap noise, the next block's preamble) must be invisible to the
per-track scans. Regression for the fuzz-found bug where a noise burst
just past a PE block's end appended junk bits to one track (tap record
error flags differed from the reference's)."""

import numpy as np

from readtape_tpu.formats import tbin as tb
from readtape_tpu.synth import default_spec, synthesize_tape
from readtape_tpu.decode.pipeline import DecodeOptions, decode_tape


def _noise_burst(samples, start, length, amp, seed=7):
    rng = np.random.default_rng(seed)
    burst = (rng.normal(0, amp, (length, samples.shape[1])) * 32767 / 6.0)
    samples = samples.copy()
    samples[start:start + length] += burst.astype(np.int16)
    return samples


def test_nrzi_gap_burst_does_not_leak_into_block():
    rng = np.random.default_rng(11)
    blk = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.004)
    hdr, samples = synthesize_tape(spec, [("block", blk)])
    # a strong burst well after the block's end (beyond the idle margin and
    # the minimum gap, but inside the block segment's power-of-two bucket)
    end = samples.shape[0]
    samples = np.pad(samples, ((0, 4000), (0, 0)))
    samples = _noise_burst(samples, end + 1800, 120, amp=1.5)
    opts = DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                         deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)
    blocks, stats = decode_tape(samples, opts)
    datas = [b for b in blocks if b.kind == "data"]
    # the burst may decode as its own garbage block (the reference would
    # attempt it too); what must NOT happen is its bits leaking into the
    # real block's tail through the shared decode bucket
    assert datas[0].data == blk
    assert datas[0].errcount == 0 and datas[0].warncount == 0


def test_pe_gap_burst_does_not_leak_into_block():
    rng = np.random.default_rng(12)
    blk = bytes(rng.integers(0, 256, 80, dtype=np.uint8))
    spec = default_spec(tb.MODE_PE, ibg_secs=0.004)
    hdr, samples = synthesize_tape(spec, [("block", blk)])
    end = samples.shape[0]
    samples = np.pad(samples, ((0, 4000), (0, 0)))
    samples = _noise_burst(samples, end + 1800, 120, amp=1.5)
    opts = DecodeOptions(mode=tb.MODE_PE, ntrks=9, bpi=1600, ips=50,
                         deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)
    blocks, stats = decode_tape(samples, opts)
    datas = [b for b in blocks if b.kind == "data"]
    assert len(datas) == 1
    assert datas[0].data == blk
    assert datas[0].errcount == 0 and datas[0].warncount == 0
