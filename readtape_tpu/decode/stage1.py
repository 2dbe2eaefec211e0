"""Stage 1: data-parallel candidate-peak extraction.

The reference's inner hot loop (decoder.c:751-810) maintains a moving
min/max window per track per sample. On TPU we invert the computation:

  1. trailing-window max/min for every sample at once (XLA reduce_window --
     a pure stencil that XLA tiles onto the VPU),
  2. a *loose* candidate predicate (the loosest threshold any AGC state could
     produce) marks samples that could possibly be peaks,
  3. candidates are compacted into a dense event list; per-event features
     (window argmax position, interpolation neighbors) are gathered sparsely.

Exact admission -- AGC-dependent rise thresholds and the reference's
blind-until-peak-exits-window rule (decoder.c:741, 778-779) -- is applied
later by an O(events) scan (trackscan.py), NOT an O(samples) scan: events
run ~10-20x sparser than samples, which is where the speedup lives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .common import F32, I32, FLT_MAX

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


def compact_events(mask: jnp.ndarray, cap: int):
    """Compact True positions of mask [T, S] into [T, cap] sample indices
    (ascending; padded with S). Returns (indices, counts, overflowed)."""
    T, S = mask.shape
    idx = jnp.cumsum(mask, axis=-1) - 1            # position of each event
    counts = jnp.sum(mask, axis=-1).astype(I32)
    sample_ids = jnp.broadcast_to(jnp.arange(S, dtype=I32), (T, S))
    scatter_to = jnp.where(mask, jnp.minimum(idx, cap - 1), cap)
    out = jnp.full((T, cap + 1), S, dtype=I32)
    out = jax.vmap(lambda o, st, sid: o.at[st].set(
        sid, mode="drop"))(out, scatter_to, sample_ids)
    # where overflowed, slot cap-1 holds the last event; fine: flagged anyway
    return out[:, :cap], counts, counts > cap


@partial(jax.jit, static_argnames=("W", "cap"))
def extract_events(v: jnp.ndarray, W: int, cap: int,
                   rise_floor: jnp.ndarray, min_floor: jnp.ndarray):
    """Full stage 1 for one window width.

    v: [T, S] float32 voltages (deskewed/differentiated already).
    Returns a dict of per-event features, each [T, cap]:
      s        sample index (== S when slot unused)
      valid    event slot in use
      wmax/wmin, v_left/v_right
      l_top    left_distance of the first window max (1-based, C semantics)
      prevmax/nextmax  neighbors of the first max (for +-0.5 interpolation)
      l_bot/prevmin/nextmin  same for the min
    plus counts [T] and overflow flag [T].
    """
    T, S = v.shape
    wmax, wmin = window_minmax(v, W)
    v_left = left_edge_values(v, W)
    mask = candidate_mask(v, wmax, wmin, v_left, rise_floor, min_floor)
    ev_s, counts, overflow = compact_events(mask, cap)
    valid = ev_s < S

    s_safe = jnp.minimum(ev_s, S - 1)
    gather = jax.vmap(lambda row, i: row[i])
    f_wmax = gather(wmax, s_safe)
    f_wmin = gather(wmin, s_safe)
    f_vleft = gather(v_left, s_safe)
    f_vright = gather(v, s_safe)

    # per-event window gather: [T, cap, W]
    lo = jnp.maximum(s_safe - (W - 1), 0)                      # [T, cap]
    pos = lo[..., None] + jnp.arange(W, dtype=I32)[None, None, :]
    in_win = pos <= s_safe[..., None]
    pos_c = jnp.minimum(pos, S - 1)
    win = jax.vmap(lambda row, p: row[p])(v, pos_c.reshape(T, -1))
    win = win.reshape(T, cap, W)

    win_top = jnp.where(in_win, win, NEG)
    k_top = jnp.argmax(win_top, axis=-1)                       # first max
    win_bot = jnp.where(in_win, win, POS)
    k_bot = jnp.argmin(win_bot, axis=-1)                       # first min

    def neigh(w, k):
        km = jnp.clip(k - 1, 0, W - 1)
        kp = jnp.clip(k + 1, 0, W - 1)
        take = jax.vmap(jax.vmap(lambda row, i: row[i]))
        return take(w, km), take(w, kp)

    prevmax, nextmax = neigh(win, k_top)
    prevmin, nextmin = neigh(win, k_bot)

    # C's left_distance counts 1-based from the window's left slot. For
    # partial windows the window's left slot is index 0 == sample lo.
    l_top = (k_top + 1).astype(I32)
    l_bot = (k_bot + 1).astype(I32)

    return dict(s=ev_s, valid=valid, wmax=f_wmax, wmin=f_wmin,
                v_left=f_vleft, v_right=f_vright,
                l_top=l_top, prevmax=prevmax, nextmax=nextmax,
                l_bot=l_bot, prevmin=prevmin, nextmin=nextmin,
                counts=counts, overflow=overflow)
