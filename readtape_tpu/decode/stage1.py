"""Stage 1: data-parallel candidate-peak extraction.

The reference's inner hot loop (decoder.c:751-810) maintains a moving
min/max window per track per sample. On TPU we invert the computation:

  1. trailing-window max/min for every sample at once (XLA reduce_window --
     a pure stencil that XLA tiles onto the VPU),
  2. a *loose* candidate predicate (the loosest threshold any AGC state could
     produce) marks samples that could possibly be peaks,
  3. a jump table to the next candidate (trackscan.loose_jump_table) lets
     the admission scan hop from candidate to candidate.

Exact admission -- AGC-dependent rise thresholds and the reference's
blind-until-peak-exits-window rule (decoder.c:741, 778-779) -- is applied
by the O(transitions) jump scan in trackscan.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


NEG = np.float32(-3.0e38)
POS = np.float32(3.0e38)


def window_minmax(v: jnp.ndarray, W: int):
    """Trailing-window max/min over the last axis: out[..., i] covers
    v[..., max(0, i-W+1) : i+1] (partial windows at the start, like the
    reference's filling window)."""
    wmax = jax.lax.reduce_window(
        v, float(NEG), jax.lax.max, window_dimensions=(1, W),
        window_strides=(1, 1), padding=((0, 0), (W - 1, 0)))
    wmin = jax.lax.reduce_window(
        v, float(POS), jax.lax.min, window_dimensions=(1, W),
        window_strides=(1, 1), padding=((0, 0), (W - 1, 0)))
    return wmax, wmin


def left_edge_values(v: jnp.ndarray, W: int):
    """v_left[..., i] = v[..., max(0, i-W+1)]: the voltage at the window's
    left edge."""
    n = v.shape[-1]
    idx = jnp.maximum(jnp.arange(n) - (W - 1), 0)
    return v[..., idx]


def candidate_mask(v, wmax, wmin, v_left, rise_floor, min_floor):
    """Loose candidate predicate: superset of every threshold the exact
    AGC-dependent test could use. v_right is v itself (the newest sample).
    rise_floor/min_floor: [T] per-track floors (broadcast over samples)."""
    rf = rise_floor[..., None]
    mf = min_floor[..., None]
    top = (wmax > v_left + rf) & (wmax > v + rf) & ((mf <= 0) | (wmax > mf))
    bot = (wmin < v_left - rf) & (wmin < v - rf) & ((mf <= 0) | (wmin < -mf))
    return top | bot
