"""Granule upload pipeline: the chunked lazy upload must decode
bit-identically to the one-shot resident-tape path, including granule
boundaries that cut through blocks mid-peak (the 12-bit delta chains
restart from a carried base row, native pack12_delta_base)."""

import os

import numpy as np
import pytest

from readtape_tpu.formats import tbin as tb
from readtape_tpu.synth import default_spec, synthesize_tape


def _make_tape(nblocks=6, blocksize=600, seed=11):
    rng = np.random.default_rng(seed)
    items = [("block", bytes(rng.integers(0, 256, blocksize, dtype=np.uint8)))
             for _ in range(nblocks)]
    items.append(("tapemark",))
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.004, start_gap_secs=0.004,
                        seed=seed)
    return synthesize_tape(spec, items)


def _decode(samples, hdr, env):
    from readtape_tpu.decode import pipeline as pl

    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        opts = pl.DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                                deltat=hdr.tdelta_ns * 1e-9,
                                maxvolts=hdr.maxvolts)
        out, stats = pl.decode_tape(samples, opts)
        return [b.data for b in out if b.kind == "data"], stats
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_granule_pipeline_matches_resident():
    hdr, samples = _make_tape()
    # granule small enough that the tape spans many granules and
    # boundaries land inside blocks
    datas_g, stats_g = _decode(samples, hdr,
                               {"READTAPE_GRANULES": "1",
                                "READTAPE_GRANULE": "16384"})
    datas_r, stats_r = _decode(samples, hdr, {"READTAPE_GRANULES": "0"})
    assert datas_g == datas_r
    assert stats_g["nerrblocks"] == stats_r["nerrblocks"] == 0
    assert stats_g["ntapemarks"] == stats_r["ntapemarks"] == 1
    assert len(datas_g) == 6


def test_granule_raw_fallback_matches():
    """With the 12-bit packer disabled, granules upload raw and must
    still be identical."""
    hdr, samples = _make_tape(nblocks=3, seed=12)
    datas_g, _ = _decode(samples, hdr, {"READTAPE_GRANULES": "1",
                                        "READTAPE_GRANULE": "16384",
                                        "READTAPE_PACK12": "0"})
    datas_r, _ = _decode(samples, hdr, {"READTAPE_GRANULES": "0"})
    assert datas_g == datas_r
    assert len(datas_g) == 3


def test_pack12_base_roundtrip():
    """pack12_delta(base=...) splits must reconstruct exactly."""
    from readtape_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    x = np.cumsum(rng.integers(-40, 40, (3001, 9)), axis=0).astype(np.int16)
    cut = 1700
    pa = native.pack12_delta(x[:cut])
    pb = native.pack12_delta(x[cut:], base=x[cut - 1])
    assert pa is not None and pb is not None

    def unpack(planes, n, t, base=None):
        b = planes.astype(np.int32)
        u0 = b[0] | ((b[1] & 0xF) << 8)
        u1 = (b[1] >> 4) | (b[2] << 4)
        u = np.stack([u0, u1], 1).reshape(-1)[: n * t]
        out = np.cumsum((u - 2048).reshape(n, t), axis=0)
        if base is not None:
            out = out + base[None, :].astype(np.int32)
        return out.astype(np.int16)

    assert np.array_equal(unpack(pa, cut, 9), x[:cut])
    assert np.array_equal(unpack(pb, 3001 - cut, 9, x[cut - 1]), x[cut:])


def test_host_activity_matches_device():
    """host_activity must reproduce the device _activity_from_tape mask
    exactly and its height estimate to float tolerance."""
    import jax.numpy as jnp

    from readtape_tpu.decode import segment as seg

    hdr, samples = _make_tape(nblocks=2, seed=13)
    h_host, act_host = seg.host_activity(samples, hdr.maxvolts)
    step = max(1, samples.size // 2_000_000)
    _, h_dev, act_dev = seg.tape_activity(jnp.asarray(samples),
                                          jnp.float32(hdr.maxvolts),
                                          step=step)
    assert np.array_equal(act_host, np.asarray(act_dev))
    assert abs(h_host - float(h_dev)) < 1e-4 * max(1.0, h_host)
