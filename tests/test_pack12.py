"""12-bit delta-packed upload (native.pack12_delta +
segment.tape_activity_packed): the packed path must be bit-identical to
the raw int16 upload, and must fall back cleanly when a delta exceeds 12
bits."""

import numpy as np
import jax.numpy as jnp
import pytest

from readtape_tpu import native
from readtape_tpu.decode import segment as seg


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native IO library unavailable")


def _roundtrip_tape(x):
    p = native.pack12_delta(x)
    assert p is not None
    mv = jnp.float32(5.7)
    v1, h1, a1 = seg.tape_activity(jnp.asarray(x), mv, step=7)
    v2, h2, a2 = seg.tape_activity_packed(
        jnp.asarray(p), mv, step=7, n=x.shape[0], t=x.shape[1])
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    assert float(h1) == float(h2)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))


@needs_native
def test_packed_equals_raw_even_and_odd_element_count():
    rng = np.random.default_rng(5)
    n = 4801
    t = np.arange(n)[:, None]
    for ntrks in (9, 7):        # 9*4801 odd-ish mixes; 7*4801 odd count
        x = (900 * np.sin(t * 0.3 + np.arange(ntrks)[None, :])
             + rng.normal(0, 40, (n, ntrks))).astype(np.int16)
        _roundtrip_tape(x)


@needs_native
def test_packed_extreme_values_at_12bit_edge():
    # deltas of exactly +/-2047 must pack; the first row packs vs 0
    x = np.zeros((6, 2), np.int16)
    x[1] = (2047, -2047)
    x[2] = (0, 0)
    x[3] = (-2047, 2047)
    x[4] = (-2047 + 2047, 2047 - 2047)
    _roundtrip_tape(x)


@needs_native
def test_pack_overflow_falls_back_to_none():
    x = np.zeros((4, 3), np.int16)
    x[2, 1] = 2048              # delta 2048 > 12-bit signed range
    assert native.pack12_delta(x) is None
    x = np.zeros((4, 3), np.int16)
    x[2, 1] = -2049
    assert native.pack12_delta(x) is None


@needs_native
def test_pack_rejects_wrong_dtype():
    assert native.pack12_delta(np.zeros((4, 3), np.float32)) is None
