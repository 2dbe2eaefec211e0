"""Precomputed window features must match the live window_features exactly
(same extremes, leftmost-argmax tie semantics, edges, neighbors) at every
position that matters for an admission decision."""

import jax
import jax.numpy as jnp
import numpy as np

from readtape_tpu.decode import trackscan as ts


def _compare(v, W, S):
    feat = ts.precompute_window_features(v, W)        # [T, S, 10]
    Wj = jnp.asarray(W, jnp.int32)
    for trk in range(v.shape[0]):
        live = jax.vmap(lambda s: ts.window_features(
            v[trk], s, Wj, S, ts.cm.PKWW_MAX_WIDTH))(
                jnp.arange(S, dtype=jnp.int32))
        pre = jax.vmap(lambda s: ts.gather_window_features(
            feat[trk], s))(jnp.arange(S, dtype=jnp.int32))
        for key in ("wmax", "wmin", "v_left", "v_right", "l_top", "l_bot"):
            np.testing.assert_array_equal(
                np.asarray(live[key]), np.asarray(pre[key]),
                err_msg=f"trk{trk} {key} W={W}")
        # neighbors only matter when the extremum is interior to the
        # logical window (the only admissible case; see refine_time)
        for key, kfield in (("prevmax", "l_top"), ("nextmax", "l_top"),
                            ("prevmin", "l_bot"), ("nextmin", "l_bot")):
            s = np.arange(S)
            left_pos = np.maximum(s - W + 1, 0)
            k_abs = left_pos + np.asarray(live[kfield]) - 1
            interior = (k_abs > left_pos) & (k_abs < s)
            np.testing.assert_array_equal(
                np.asarray(live[key])[interior],
                np.asarray(pre[key])[interior],
                err_msg=f"trk{trk} {key} W={W}")


def test_precompute_matches_live():
    rng = np.random.default_rng(7)
    S = 400
    # ties included: quantized values force equal samples in one window
    v = jnp.asarray(
        np.round(rng.normal(size=(3, S)) * 4) / 4, jnp.float32)
    for W in (3, 8, 17, 32, 50):
        _compare(v, W, S)


def test_precompute_flat_and_ramp():
    S = 200
    flat = jnp.zeros((1, S), jnp.float32)
    ramp = jnp.arange(S, dtype=jnp.float32)[None, :]
    saw = jnp.asarray((np.arange(S) % 7).astype(np.float32))[None, :]
    for v in (flat, ramp, -ramp, saw):
        for W in (5, 16, 50):
            _compare(v, W, S)
