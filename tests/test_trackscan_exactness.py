"""Regression tests for two trackscan hazards:

1. Integer fields (sample positions) must survive the f32 output packing
   EXACTLY even beyond 2^24 (Whirlwind scans the whole tape as one segment,
   so positions can reach 2^26): they ride as int32 bit patterns.
2. The packed-features scan's post-admit BLIND jump (s+L+1) can land on
   positions the masked jump table excludes (segment tail past seg_len,
   warmup lead); admission there must be rejected, exactly as the
   table-routed scan variant behaves.
"""

import numpy as np
import jax.numpy as jnp

from readtape_tpu.decode import common as cm
from readtape_tpu.decode import trackscan as ts
from readtape_tpu.decode.common import F32, I32


def test_int_bits_roundtrip_beyond_2_24():
    vals = np.array([0, 1, 2 ** 24 + 1, 2 ** 24 + 3, 2 ** 26 - 5,
                     int(ts.BIG_S)], np.int32)
    enc = ts._int_to_f32_bits(jnp.asarray(vals))
    assert enc.dtype == jnp.float32
    dec = np.asarray(ts._f32_bits_to_int(enc))
    np.testing.assert_array_equal(dec, vals)


def test_compact_outputs_exact_beyond_2_24():
    n = 16
    flags = jnp.asarray([i % 2 == 0 for i in range(n)])
    s = jnp.asarray(2 ** 24 + 1 + np.arange(n, dtype=np.int32) * 3)
    t = jnp.asarray(np.linspace(0.0, 1.0, n), F32)
    out = ts.compact_outputs(flags, 8, tr_s=(s, ts.BIG_S),
                             tr_t=(t, F32(0.0)),
                             tr_top=(flags, False))
    got = np.asarray(out["tr_s"])
    want = np.asarray(s)[::2]
    np.testing.assert_array_equal(got, want)      # odd values, exact
    assert out["tr_s"].dtype == jnp.int32
    assert bool(np.all(np.asarray(out["tr_top"])))


def _mk_track(S, seg_len, spike_at, last_peak, spb=20):
    """A quiet track with real peaks inside [0, seg_len) (the last one at
    `last_peak`) and one junk spike at spike_at (>= seg_len, inside the
    bucket tail)."""
    v = np.zeros(S, np.float32)
    k = 0
    for s in range(3 * spb, last_peak, spb):
        v[s] = 4.0 if k % 2 == 0 else -4.0
        k += 1
    v[last_peak] = 4.0 if k % 2 == 0 else -4.0
    v[spike_at] = 4.5
    return jnp.asarray(v)


def test_masked_tail_not_admitted_via_blind_jump():
    S, seg_len = 2048, 1500
    W = cm.pkww_width_for(0.7, 800, 50, 1.28e-6)
    # the last real peak admits at ~last_peak+1 and jumps BLIND to
    # ~last_peak+W+1; the spike sits inside that landing position's window
    # (and past seg_len), so without the candidacy gate the landing step's
    # threshold test admits it
    v = _mk_track(S, seg_len, spike_at=seg_len + 2,
                  last_peak=seg_len - 2)[None, :]              # [1, S]
    rise_floor = jnp.full(1, 0.1, F32)
    min_floor = jnp.full(1, 0.0, F32)
    nxt = ts.loose_jump_table(v, W, rise_floor, min_floor)
    # mask: candidates only in [0, seg_len)
    iota = jnp.arange(S + 1, dtype=I32)[None, :]
    nxt_masked = jnp.where(nxt < seg_len, nxt, S)

    nsteps, K = 512, 256
    args = (W, S, nsteps, K, jnp.float32(0.4), jnp.float32(0.0),
            jnp.float32(0.3), jnp.int32(5))
    fin_live = ts.nrzi_track_scan(v[0], nxt_masked[0], *args)
    feat = ts.precompute_window_features(v, W, nxt_masked)
    fin_pre = ts.nrzi_track_scan_pre(feat[0], nxt_masked[0], *args)

    n_live = int(fin_live["n_admitted"])
    n_pre = int(fin_pre["n_admitted"])
    assert n_live > 3                                  # real peaks admitted
    assert n_pre == n_live
    s_live = np.asarray(fin_live["tr_s"])[:n_live]
    s_pre = np.asarray(fin_pre["tr_s"])[:n_pre]
    np.testing.assert_array_equal(s_pre, s_live)
    assert (s_pre < seg_len).all(), \
        f"admitted junk past seg_len: {s_pre[s_pre >= seg_len]}"
