"""End-to-end and unit tests of the TPU GCR decoder."""

import jax.numpy as jnp
import numpy as np
import pytest

from readtape_tpu.formats import tbin as tb
from readtape_tpu.synth import default_spec, synthesize_tape
from readtape_tpu.synth.synthesize import gcr_storage_bits
from readtape_tpu.decode import gcr as gcr_mod
from readtape_tpu.decode.pipeline import DecodeOptions, decode_tape


def _decode(spec, items, **opt_kw):
    hdr, samples = synthesize_tape(spec, items)
    opts = DecodeOptions(mode=spec.mode, ntrks=spec.ntrks, bpi=spec.bpi,
                         ips=spec.ips, deltat=hdr.tdelta_ns * 1e-9,
                         maxvolts=hdr.maxvolts, **opt_kw)
    return decode_tape(samples, opts)


def test_gcr_basic():
    rng = np.random.default_rng(30)
    # one multiple-of-7 block and one with residual bytes
    blocks = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
              for n in (154, 100)]
    out, _ = _decode(default_spec(tb.MODE_GCR),
                     [("block", b) for b in blocks] + [("tapemark",)])
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks
    assert sum(1 for b in out if b.kind == "tapemark") == 1
    assert all(b.errcount == 0 and b.warncount == 0 for b in out)


def test_gcr_differentiate_zeros():
    """-differentiate -zeros: transitions from zero crossings of the
    differentiated signal (the 'analog' example workflow)."""
    rng = np.random.default_rng(31)
    blocks = [bytes(rng.integers(0, 256, 154, dtype=np.uint8))]
    spec = default_spec(tb.MODE_GCR, pulse_width_bits=0.45, noise_rms=0.0)
    out, _ = _decode(spec, [("block", blocks[0])],
                     find_zeros=True, differentiate=True)
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks and out[0].errcount == 0


def test_gcr_noise():
    rng = np.random.default_rng(32)
    blocks = [bytes(rng.integers(0, 256, 77, dtype=np.uint8))]
    spec = default_spec(tb.MODE_GCR, noise_rms=0.03, amp_jitter=0.05)
    out, _ = _decode(spec, [("block", blocks[0])])
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks


def _storage_to_buffers(data: bytes, spec, maxb):
    sb = gcr_storage_bits(data, spec)
    T = 9
    bits = np.zeros((T, maxb), np.int8)
    dcs = np.zeros(T, np.int32)
    for t in range(T):
        bits[t, :len(sb[t])] = sb[t]
        dcs[t] = len(sb[t])
    return bits, dcs


def test_gcr_postprocess_direct():
    """Group decode straight from known storage bits."""
    rng = np.random.default_rng(33)
    data = bytes(rng.integers(0, 256, 70, dtype=np.uint8))
    spec = default_spec(tb.MODE_GCR)
    bits, dcs = _storage_to_buffers(data, spec, 2048)
    post = gcr_mod.gcr_postprocess(jnp.asarray(bits), jnp.asarray(dcs),
                                   int(dcs.max()), 1, False, 2048)
    n = int(post["bytenum"])
    assert n == len(data)
    decoded = bytes((np.asarray(post["data"][:n]) >> 1).astype(np.uint8))
    assert decoded == data
    assert int(post["vparity_errs"]) == 0
    assert int(post["ecc_errs"]) == 0


def test_gcr_ecc_correction():
    """Flip one data bit in a dgroup: parity+ECC errors appear; -correct
    repairs them via the single-track syndrome correction."""
    rng = np.random.default_rng(34)
    data = bytes(rng.integers(0, 256, 70, dtype=np.uint8))
    spec = default_spec(tb.MODE_GCR)
    bits, dcs = _storage_to_buffers(data, spec, 2048)
    # corrupt: change one 5-bit data sgroup on track 3 into a different
    # VALID sgroup so the group decodes but the byte (and parity) is wrong.
    # first data group starts after preamble (85 bits)
    seg = bits[3, 85:90].tolist()
    from readtape_tpu.synth.synthesize import GCR_DATA_TO_SGROUP
    cur = int("".join(map(str, seg)), 2)
    nib = GCR_DATA_TO_SGROUP.index(cur)
    alt = GCR_DATA_TO_SGROUP[nib ^ 1]          # one data-bit different
    bits[3, 85:90] = [(alt >> k) & 1 for k in range(4, -1, -1)]

    post = gcr_mod.gcr_postprocess(jnp.asarray(bits), jnp.asarray(dcs),
                                   int(dcs.max()), 1, False, 2048)
    assert int(post["vparity_errs"]) > 0 or int(post["ecc_errs"]) > 0

    post2 = gcr_mod.gcr_postprocess(jnp.asarray(bits), jnp.asarray(dcs),
                                    int(dcs.max()), 1, True, 2048)
    n = int(post2["bytenum"])
    decoded = bytes((np.asarray(post2["data"][:n]) >> 1).astype(np.uint8))
    assert decoded == data
    assert int(post2["vparity_errs"]) == 0
    assert int(post2["corrected_bits"]) >= 1
