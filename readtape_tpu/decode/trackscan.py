"""Stage 2: exact peak admission as a position-jumping scan.

The reference's inner hot loop (decoder.c:751-810) runs once per sample. The
TPU reformulation runs once per *admission opportunity*: the scan carries a
sample cursor; each step

  - slices the W-sample window at the cursor (jax dynamic_slice -> VPU),
  - recomputes the reference's exact window test: AGC-scaled rise/min-peak
    thresholds against the window extremes and edges,
  - on admission: refines the peak time (+-0.5-sample interpolation), applies
    the blind-until-the-peak-exits-the-window rule by jumping the cursor
    past the blind region, and runs the mode hook (AGC bookkeeping, bit
    emission for self-clocked modes),
  - on rejection: advances one sample,
  - then snaps the cursor forward to the next *loose candidate* using a
    precomputed jump table (stage 1's data-parallel candidate mask), skipping
    silence entirely.

Steps consumed ~= admitted peaks + a few rejects, i.e. 10-20x fewer
iterations than samples, with bit-identical admission decisions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import common as cm
from . import stage1
from .common import F32, I32

BIG_S = np.int32(2 ** 30)


_BITS_BIAS = np.int32(0x40000000)


def _int_to_f32_bits(x):
    """Encode int32 values into float32 buffers EXACTLY (a value cast is
    only exact below 2^24; Whirlwind scans the whole tape as one segment,
    so sample positions can exceed that): add 2^30 with wrapping int32
    arithmetic, then bitcast. The bias lifts small values out of the
    DENORMAL range -- the TPU flushes denormals to zero even through some
    data-movement paths, which silently zeroed raw-bitcast positions on
    v5e hardware. Encoded patterns are normal floats for v in [0, 2^30)
    and exactly -0.0 for the BIG_S sentinel (2^30); NaN patterns would
    need v >= 0x3F800000 ~ 1.07e9, far above any streamed field. The
    values never enter float arithmetic while encoded."""
    return jax.lax.bitcast_convert_type(
        x.astype(jnp.int32) + _BITS_BIAS, jnp.float32)


def _f32_bits_to_int(x, dtype=I32):
    v = jax.lax.bitcast_convert_type(x, jnp.int32) - _BITS_BIAS
    return v.astype(dtype)


def loose_jump_table(v: jnp.ndarray, W: int, rise_floor, min_floor):
    """[T, S] voltages -> jump table nxt[T, S+1]: nxt[i] = first sample
    j >= i where the loose candidate test passes (S if none)."""
    T, S = v.shape
    wmax, wmin = stage1.window_minmax(v, W)
    v_left = stage1.left_edge_values(v, W)
    loose = stage1.candidate_mask(v, wmax, wmin, v_left, rise_floor, min_floor)
    idx = jnp.where(loose, jnp.arange(S, dtype=I32)[None, :], S)
    rev = jnp.flip(idx, axis=-1)
    run = jax.lax.associative_scan(jnp.minimum, rev, axis=-1)
    nxt = jnp.flip(run, axis=-1)
    nxt = jnp.concatenate([nxt, jnp.full((T, 1), S, I32)], axis=-1)
    return nxt


def admission_init(W, agc_ring: int = cm.AGC_MAX_WINDOW):
    st = cm.agc_state_init(agc_ring)
    st.update(
        pos=I32(0),
        W=jnp.asarray(W, I32),
        v_top=F32(0.0),
        v_bot=F32(0.0),
        n_admitted=I32(0),
    )
    return st


def window_features(v_trk: jnp.ndarray, s: jnp.ndarray, W, S: int,
                    WMAX: int = None):
    """The reference's window state at sample s: extremes, edges, first
    argmax/argmin positions and their interpolation neighbors. W may be a
    *runtime* value <= WMAX (the slice is WMAX wide; the logical window is
    masked), so one compiled scan serves every parmset's window width."""
    WMAX = W if WMAX is None else WMAX
    start = jnp.clip(s - WMAX + 1, 0, max(S - WMAX, 0))
    win = jax.lax.dynamic_slice(v_trk, (start,), (WMAX,))
    o = jnp.arange(WMAX, dtype=I32)
    p = start + o
    left_pos = jnp.maximum(s - W + 1, 0)
    valid = (p >= left_pos) & (p <= s)
    win_top = jnp.where(valid, win, -jnp.inf)
    win_bot = jnp.where(valid, win, jnp.inf)
    wmax = jnp.max(win_top)
    wmin = jnp.min(win_bot)
    k_top = jnp.argmax(win_top)            # first occurrence, like refine_peak
    k_bot = jnp.argmin(win_bot)
    k_left = left_pos - start              # index of the window's left slot
    v_left = win[jnp.clip(k_left, 0, WMAX - 1)]
    v_right = win[jnp.clip(s - start, 0, WMAX - 1)]

    def neigh(k):
        return (win[jnp.clip(k - 1, 0, WMAX - 1)],
                win[jnp.clip(k + 1, 0, WMAX - 1)])
    pm, nm = neigh(k_top)
    pb, nb = neigh(k_bot)
    return dict(wmax=wmax, wmin=wmin, v_left=v_left, v_right=v_right,
                l_top=(k_top - k_left + 1).astype(I32), prevmax=pm,
                nextmax=nm, l_bot=(k_bot - k_left + 1).astype(I32),
                prevmin=pb, nextmin=nb)


def admission_test(st, ev, rise_parm, min_parm):
    """The exact lookfor_peak threshold test (decoder.c:781-810)."""
    scale = st["v_avg_height"] / cm.PKWW_PEAKHEIGHT
    rise = rise_parm * scale / st["agc_gain"]
    rmin = min_parm * scale / st["agc_gain"]
    no_min = min_parm == 0
    is_top = ((ev["wmax"] > ev["v_left"] + rise) &
              (ev["wmax"] > ev["v_right"] + rise) &
              (no_min | (ev["wmax"] > rmin)))
    is_bot = ((~is_top) &
              (ev["wmin"] < ev["v_left"] - rise) &
              (ev["wmin"] < ev["v_right"] - rise) &
              (no_min | (ev["wmin"] < -rmin)))
    return is_top, is_bot


def refine_frac(st, ev, admit_top):
    """refine_peak's sub-sample offset RELATIVE to the detection sample
    (decoder.c:700-749): frac = -((W - L) - adj), an exact f32 (small
    integer +- 0.5). Splitting the time into (s exact int, frac exact
    f32) lets huge captures (s beyond the f32 mantissa) carry exact peak
    times; t_peak = f32(s) + frac reproduces the original absolute
    arithmetic bit-for-bit where both are representable."""
    L = jnp.where(admit_top, ev["l_top"], ev["l_bot"])
    val = jnp.where(admit_top, ev["wmax"], ev["wmin"])
    prev = jnp.where(admit_top, ev["prevmax"], ev["prevmin"])
    nxt = jnp.where(admit_top, ev["nextmax"], ev["nextmin"])
    thr = cm.PEAK_THRESHOLD / st["agc_gain"]
    ref = jnp.where(admit_top, val - thr, val + thr)
    prev_close = jnp.where(admit_top, prev > ref, prev < ref)
    next_close = jnp.where(admit_top, nxt > ref, nxt < ref)
    adj = jnp.where(prev_close & ~next_close, F32(-0.5),
                    jnp.where(next_close & ~prev_close, F32(0.5), F32(0.0)))
    return -((st["W"] - L).astype(F32) - adj), L


def refine_time(st, ev, s, admit_top):
    """refine_peak (decoder.c:700-749): +-0.5-sample interpolation and the
    C's verbatim time formula (full window width even while filling)."""
    frac, L = refine_frac(st, ev, admit_top)
    t_peak = s.astype(F32) + frac
    return t_peak, L


def run_jump_scan(step_extra, init_extra, v_trk, nxt_trk, W, S: int,
                  nsteps: int, rise_parm, min_parm, WMAX: int = None,
                  agc_ring: int = cm.AGC_MAX_WINDOW):
    """Drive the admission scan for one lane as an early-exiting while loop.

    step_extra(st2, st, ev, admit_top, admit_bot, t_peak, s) -> st3 applies
    the mode-specific state updates (AGC policy, bit emission) AFTER a peak
    admission decision; admitted transitions must be recorded by step_extra
    into carry buffers (there are no per-step outputs -- a while loop exits
    as soon as every vmapped lane runs out of candidates, which is the
    difference between paying for ~transitions steps and ~samples/3 steps).
    init_extra: extra carry fields. W may be a traced per-lane value
    (<= WMAX), so all parmsets share one compiled scan.
    """
    WMAX = (W if isinstance(W, int) else cm.PKWW_MAX_WIDTH) \
        if WMAX is None else WMAX

    def cond(st):
        return (st["pos"] < S) & (st["steps"] < nsteps)

    def body(st):
        s = st["pos"]
        ev = window_features(v_trk, jnp.minimum(s, S - 1), st["W"], S, WMAX)
        admit_top, admit_bot = admission_test(st, ev, rise_parm, min_parm)
        admit = admit_top | admit_bot
        t_peak, L = refine_time(st, ev, s, admit_top)

        st2 = dict(st)
        st2["v_top"] = jnp.where(admit_top, ev["wmax"], st["v_top"])
        st2["v_bot"] = jnp.where(admit_bot, ev["wmin"], st["v_bot"])
        st2["n_admitted"] = st["n_admitted"] + admit.astype(I32)

        st3 = step_extra(st2, st, ev, admit_top, admit_bot, t_peak, s)

        nxt_pos = jnp.where(admit, s + L + 1, s + 1)
        st3["pos"] = nxt_trk[jnp.clip(nxt_pos, 0, S)]
        st3["steps"] = st["steps"] + 1
        return st3

    init = admission_init(W, agc_ring)
    init["steps"] = I32(0)
    init["pos"] = nxt_trk[0]            # first candidate (skip leading quiet)
    init.update(init_extra)
    final = jax.lax.while_loop(cond, body, init)
    final["incomplete"] = final["pos"] < S
    return final


def precompute_window_features(v: jnp.ndarray, W: int,
                               nxt: jnp.ndarray = None):
    """All of window_features for every sample position at a STATIC window
    width, data-parallel: [T, 10|12, S] f32 (rows: wmax, wmin, v_left,
    v_right, l_top, prevmax, nextmax, l_bot, prevmin, nextmin, and --
    when the [T, S+1] jump table nxt is given -- nxt[s+1], the cursor
    target for a reject step (just a shift of the table), plus nxt[s],
    which lets the scan test CANDIDACY of the current position: the
    post-admit blind jump can land on masked-out positions, which must
    reject regardless of thresholds; both int rows ride as exact int32
    bit patterns). The
    sample axis stays innermost so the pack is dense on TPU (a trailing
    small axis would pad to 128 lanes, >10x the memory).

    Carrying nxt[s+1] in the pack removes the separate in-loop jump-table
    gather (~37 us/step at 576 lanes, HBM-latency-bound like the feature
    gather): the reject path reads its target from the pack, and the
    ADMIT path jumps blind to s+L+1, letting the next step's reject snap
    to the following candidate -- one extra cheap step per admission,
    zero in-loop jump-table gathers.

    (Two rejected experiments, both measured slower on the v5e: packing
    the admit-path jump lookups as extra rows needs [T, S]-sized
    take_along_axis gathers at precompute (~50 ms each at B=8); an
    interleaved [T, 16*S] layout for one-contiguous-read fetches pays a
    materialized relayout at precompute. TPU gathers are only cheap when
    sparse, and relayouts are never cheap.)

    The features depend only on (v, W, s) -- not on decoder state -- so they
    hoist out of the sequential scan entirely; the scan body then needs one
    dynamic_slice instead of a ~15-kernel slice/argmax/gather chain, which is
    the difference on a latency-bound TPU loop. Tie semantics match
    window_features: first (leftmost) occurrence of the extremum."""
    T, S = v.shape
    iota = jnp.broadcast_to(jnp.arange(S, dtype=I32)[None, :], (T, S))

    def shift(a, d, fill):
        return jnp.concatenate(
            [jnp.full((T, d), fill, a.dtype), a[:, :S - d]], axis=1)

    # TPU gathers are slow, so the extremum's NEIGHBOR values propagate
    # through the recursion alongside the argmax (base case: static shifts
    # of v) instead of being gathered at best_k +- 1 afterwards.
    vprev = shift(v, 1, np.float32(0.0))
    vnext = jnp.concatenate(
        [v[:, 1:], jnp.zeros((T, 1), v.dtype)], axis=1)

    def combine(acc, d):
        """Merge trailing-window (value, first-index, neighbors) tables: acc
        with acc shifted right by d (the shifted copy covers strictly
        earlier indices, so ties prefer it -> leftmost occurrence)."""
        def half(cur, fills, better):
            sh = [shift(a, d, f) for a, f in zip(cur, fills)]
            take = better(sh[0], cur[0])
            return [jnp.where(take, s, c) for s, c in zip(sh, cur)]

        mx, mn = acc
        mx = half(mx, [-np.inf, 0, 0.0, 0.0], lambda a, b: a >= b)
        mn = half(mn, [np.inf, 0, 0.0, 0.0], lambda a, b: a <= b)
        return mx, mn

    # sparse-table doubling: build width-P tables (P = 2^floor(log2 W)) in
    # log steps, then one overlapping combine to reach exactly width W
    acc = ([v, iota, vprev, vnext], [v, iota, vprev, vnext])
    p = 1
    while 2 * p <= W:
        acc = combine(acc, p)
        p *= 2
    if p < W:
        acc = combine(acc, W - p)
    (best_v, best_k, prevmax, nextmax), (worst_v, worst_k,
                                         prevmin, nextmin) = acc
    left_pos = jnp.maximum(iota - W + 1, 0)
    v_left = shift(v, W - 1, np.float32(0.0))
    if W > 1:
        v_left = jnp.where(iota < W - 1, v[:, :1], v_left)
    l_top = (best_k - left_pos + 1).astype(v.dtype)
    l_bot = (worst_k - left_pos + 1).astype(v.dtype)
    rows = [best_v, worst_v, v_left, v, l_top, prevmax, nextmax,
            l_bot, prevmin, nextmin]
    if nxt is not None:
        # both rows ride as exact int32 bit patterns (see _int_to_f32_bits)
        rows.append(_int_to_f32_bits(nxt[:, 1:]))     # nxt[s+1]: a shift
        rows.append(_int_to_f32_bits(nxt[:, :-1]))    # nxt[s]: candidacy test
    return jnp.stack(rows, axis=1)


def gather_window_features(feat: jnp.ndarray, s):
    """Unpack one position's precomputed features ([10|12, S] -> ev)."""
    R = feat.shape[0]
    f = jax.lax.dynamic_slice(feat, (0, s), (R, 1))[:, 0]
    ev = dict(wmax=f[0], wmin=f[1], v_left=f[2], v_right=f[3],
              l_top=f[4].astype(I32), prevmax=f[5], nextmax=f[6],
              l_bot=f[7].astype(I32), prevmin=f[8], nextmin=f[9])
    if R >= 12:
        ev["nxt_reject"] = _f32_bits_to_int(f[10])
        ev["nxt_here"] = _f32_bits_to_int(f[11])
    return ev


def run_jump_scan_seq(step_extra, init_extra, ev_fn, nxt_trk, W, S: int,
                      nsteps: int, rise_parm, min_parm,
                      agc_ring: int = cm.AGC_MAX_WINDOW,
                      chunk: int = 512,     # 256 measured slower (439 vs 420ms)
                      init_override=None):
    """lax.scan variant of run_jump_scan with PER-STEP OUTPUTS.

    Scattering into big buffers carried through a loop forces XLA to copy the
    buffers every iteration on TPU (~1000x the cost of the step body); scan
    outputs append via in-place slice writes instead. step_extra has the
    run_jump_scan signature but returns (st3, out_dict); out_dict fields are
    stacked along a leading [>= nsteps] axis. ev_fn(st, s) supplies the
    window features (live computation or a precomputed-feature gather).

    Early exit is chunked: an outer while_loop runs `chunk`-step inner scans
    and stops as soon as the cursor exhausts the candidates, so the lane pays
    for ~candidates steps (rounded up to a chunk), not the worst-case budget.
    Output rows for never-executed chunks hold a DEAD step's output (cursor
    at S, admissions masked), which every consumer treats as inert.

    All of a step's outputs are PACKED into one f32 vector before leaving
    the scan: each scan output costs one unfused buffer write per
    iteration, and on this runtime every unfused op in a sequential loop
    is ~10-25 us of dispatch, so one packed write instead of N is a direct
    per-step saving. Integer/bool fields ride as exact int32 BIT PATTERNS
    (not value casts), so sample positions beyond 2^24 -- e.g. Whirlwind's
    whole-tape segment -- survive the round trip exactly.
    Returns (final_state, outputs) with outputs unpacked back to the
    step_extra field structure."""

    def raw_step(st):
        s = st["pos"]
        live = s < S
        ev = ev_fn(st, jnp.minimum(s, S - 1))
        is_top, is_bot = admission_test(st, ev, rise_parm, min_parm)
        if "nxt_here" in ev:
            # the post-admit path jumps BLIND to s+L+1, which can land on a
            # position the masked jump table excludes (segment tail, warmup
            # lead); only positions the table maps to themselves are
            # admissible candidates -- exactly the set the while-loop
            # variant (whose admit path routes through the table) visits.
            # A non-candidate position still steps (reject -> nxt[s+1]).
            at_cand = ev["nxt_here"] == s
            is_top = is_top & at_cand
            is_bot = is_bot & at_cand
        admit_top = live & is_top
        admit_bot = live & is_bot
        admit = admit_top | admit_bot
        t_peak, L = refine_time(st, ev, s, admit_top)

        st2 = dict(st)
        st2["v_top"] = jnp.where(admit_top, ev["wmax"], st["v_top"])
        st2["v_bot"] = jnp.where(admit_bot, ev["wmin"], st["v_bot"])
        st2["n_admitted"] = st["n_admitted"] + admit.astype(I32)

        st3, out = step_extra(st2, st, ev, admit_top, admit_bot, t_peak, s)

        if "nxt_reject" in ev:
            # admit: jump blind past the peak (the next step's reject will
            # snap to the following candidate); reject: snap via slot 10
            pos2 = jnp.where(admit, s + L + 1, ev["nxt_reject"])
        else:
            nxt_pos = jnp.where(admit, s + L + 1, s + 1)
            pos2 = nxt_trk[jnp.clip(nxt_pos, 0, S)]
        # dead steps (pos already past S) PRESERVE the exit position: the
        # chunked-capture driver distinguishes a genuine blind-jump
        # overshoot (<= S + W, carries the blind frontier into the next
        # chunk) from the no-more-candidates snap (> S + 255)
        st3["pos"] = jnp.where(live, pos2, st["pos"])
        return st3, out

    if init_override is not None:
        # chunked captures: resume from the previous chunk's full carried
        # state (positions already translated to this chunk's frame)
        init = dict(init_override)
    else:
        init = admission_init(W, agc_ring)
        init["pos"] = nxt_trk[0]        # first candidate (skip leading quiet)
        init.update(init_extra)

    # probe the output structure to build the pack/unpack maps
    dead = dict(init)
    dead["pos"] = jnp.asarray(S, I32)
    _, out0 = raw_step(dead)
    leaves0, treedef = jax.tree.flatten(out0)
    sizes = [int(np.prod(jnp.shape(x))) if jnp.ndim(x) else 1
             for x in leaves0]
    offs = np.concatenate([[0], np.cumsum(sizes)])
    NV = int(offs[-1])

    def _enc(x):
        return (x.astype(F32) if jnp.issubdtype(x.dtype, jnp.floating)
                else _int_to_f32_bits(x))

    def pack_out(out):
        parts = [_enc(x).reshape(-1) if jnp.ndim(x)
                 else _enc(x).reshape(1)
                 for x in jax.tree.leaves(out)]
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def unpack_outs(vecs):
        """[N, NV] -> output dict with leading [N] axis per field."""
        fields = []
        for x, a, b in zip(leaves0, offs[:-1], offs[1:]):
            raw = vecs[:, a:b]
            v = (raw.astype(x.dtype)
                 if jnp.issubdtype(x.dtype, jnp.floating)
                 else _f32_bits_to_int(raw, x.dtype))
            fields.append(v.reshape((vecs.shape[0],) + jnp.shape(x)))
        return jax.tree.unflatten(treedef, fields)

    def step(st, _):
        st3, out = raw_step(st)
        return st3, pack_out(out)

    CH = max(1, min(chunk, nsteps))
    nchunks = -(-nsteps // CH)
    dead_vec = pack_out(out0)
    bufs = jnp.broadcast_to(dead_vec, (nchunks * CH, NV))

    def cond(c):
        st, k, _ = c
        return (st["pos"] < S) & (k < nchunks)

    def body(c):
        st, k, bufs = c
        st2, outs = jax.lax.scan(step, st, None, length=CH)
        bufs2 = jax.lax.dynamic_update_slice(bufs, outs, (k * CH, 0))
        return (st2, k + 1, bufs2)

    final, _, vecs = jax.lax.while_loop(cond, body, (init, I32(0), bufs))
    final["incomplete"] = final["pos"] < S
    return final, unpack_outs(vecs)


def compact_outputs(flags, rank_cap: int, **fields):
    """Compact per-step outputs where `flags` is true into [cap] buffers in
    step order. fields: name -> (values, fill). Overflow overwrites the last
    slot (matching the in-carry clamping the while version used).

    All fields compact through ONE f32 scatter (a scatter over the
    [nsteps]-sized output buffers costs ~10 ms per op per call at bench
    sizes). Integer/bool fields ride as exact int32 bit patterns so sample
    positions beyond 2^24 survive (see _int_to_f32_bits)."""
    rank = jnp.cumsum(flags) - 1
    idx = jnp.where(flags, jnp.minimum(rank, rank_cap - 1), rank_cap)
    names = list(fields)

    def enc(x):
        x = jnp.asarray(x)
        return (x.astype(F32) if jnp.issubdtype(x.dtype, jnp.floating)
                else _int_to_f32_bits(x))

    vals = jnp.stack([enc(fields[n][0]) for n in names], axis=-1)
    fill = jnp.stack([enc(jnp.asarray(fields[n][1],
                                      jnp.asarray(fields[n][0]).dtype))
                      for n in names])
    buf = jnp.broadcast_to(fill, (rank_cap + 1, len(names)))
    packed = buf.at[idx].set(vals, mode="drop")[:rank_cap]
    out = {}
    for j, n in enumerate(names):
        dt = jnp.asarray(fields[n][0]).dtype
        col = packed[:, j]
        out[n] = (col.astype(dt) if jnp.issubdtype(dt, jnp.floating)
                  else _f32_bits_to_int(col, dt))
    return out


# ---------------------------------------------------------------------------
# NRZI / calibration lane: admission + the nrzi_top/bot AGC policy
# (decode_nrzi.c:184-230); bits are emitted later by the global clock scan.
# ---------------------------------------------------------------------------

def nrzi_agc_policy(st2, st, admit_top, admit_bot, agc_alpha, agc_window):
    """AGC bookkeeping shared verbatim by nrzi_top/bot and gcr_top/bot:
    top peaks 5..15 accumulate the baseline; beyond 15 the first top
    finishes it; later tops and bots adjust AGC."""
    admit = admit_top | admit_bot
    pc = st["peakcount"] + admit.astype(I32)
    height = st2["v_top"] - st2["v_bot"]
    in_base = admit_top & (pc >= cm.AGC_STARTBASE) & (pc <= cm.AGC_ENDBASE)
    past = pc > cm.AGC_ENDBASE
    do_finish = admit_top & past & (st["v_avg_height_count"] > 0)
    do_agc = ((admit_top & past & (st["v_avg_height_count"] == 0)) |
              (admit_bot & past & (st["v_avg_height_count"] == 0)))

    acc = cm.accumulate_baseline(st2, height, agc_window)
    fin = cm.finish_baseline(st2)
    agc = cm.adjust_agc(st2, agc_alpha, agc_window)

    out = dict(st2)
    for k in ("v_avg_height_sum", "v_avg_height_count", "v_heights",
              "heightndx", "v_avg_height", "agc_gain",
              "max_agc_gain", "min_agc_gain"):
        out[k] = jnp.where(in_base, acc[k],
                           jnp.where(do_finish, fin[k],
                                     jnp.where(do_agc, agc[k], st2[k])))
    out["peakcount"] = pc
    return out


@partial(jax.jit, static_argnames=("S", "nsteps", "K", "agc_ring"))
def nrzi_track_scan(v_trk, nxt_trk, W, S: int, nsteps: int, K: int,
                    rise_parm, min_parm, agc_alpha, agc_window,
                    agc_ring: int = cm.AGC_MAX_WINDOW):
    """Admission + AGC for NRZI (and calibration passes). Admitted
    transitions stream out as scan outputs and are compacted into [K]
    buffers after the scan (see run_jump_scan_seq)."""
    def extra(st2, st, ev, admit_top, admit_bot, t_peak, s):
        admit = admit_top | admit_bot
        # first data bit initializes max_agc_gain (nrzi_addbit:149)
        first = admit & (st["n_admitted"] == 0)
        st2["max_agc_gain"] = jnp.where(first, st["agc_gain"],
                                        st["max_agc_gain"])
        st3 = nrzi_agc_policy(st2, st, admit_top, admit_bot,
                              agc_alpha, agc_window)
        st3["v_lasttop"] = jnp.where(admit_top, ev["wmax"], st["v_lasttop"])
        st3["v_lastbot"] = jnp.where(admit_bot, ev["wmin"], st["v_lastbot"])
        out = dict(admit=admit, s_det=s, t_peak=t_peak,
                   agc_after=st3["agc_gain"], is_top=admit_top)
        return st3, out

    WMAX = W if isinstance(W, int) else cm.PKWW_MAX_WIDTH
    ev_fn = lambda st, s: window_features(v_trk, s, st["W"], S, WMAX)
    final, outs = run_jump_scan_seq(extra, {}, ev_fn, nxt_trk, W, S, nsteps,
                                    rise_parm, min_parm, agc_ring=agc_ring)
    final.update(compact_outputs(
        outs["admit"], K,
        tr_s=(outs["s_det"], BIG_S),
        tr_t=(outs["t_peak"], F32(0.0)),
        tr_agc=(outs["agc_after"], F32(1.0)),
        tr_top=(outs["is_top"], False)))
    return final


@partial(jax.jit, static_argnames=("S", "nsteps", "K", "agc_ring"))
def nrzi_track_scan_pre(feat, nxt_trk, W, S: int, nsteps: int, K: int,
                        rise_parm, min_parm, agc_alpha, agc_window,
                        agc_ring: int = cm.AGC_MAX_WINDOW):
    """nrzi_track_scan over PRECOMPUTED window features ([S, 10], see
    precompute_window_features): the production path, where the per-step
    body is one feature gather plus elementwise state updates."""
    def extra(st2, st, ev, admit_top, admit_bot, t_peak, s):
        admit = admit_top | admit_bot
        first = admit & (st["n_admitted"] == 0)
        st2["max_agc_gain"] = jnp.where(first, st["agc_gain"],
                                        st["max_agc_gain"])
        st3 = nrzi_agc_policy(st2, st, admit_top, admit_bot,
                              agc_alpha, agc_window)
        st3["v_lasttop"] = jnp.where(admit_top, ev["wmax"], st["v_lasttop"])
        st3["v_lastbot"] = jnp.where(admit_bot, ev["wmin"], st["v_lastbot"])
        out = dict(admit=admit, s_det=s, t_peak=t_peak,
                   agc_after=st3["agc_gain"], is_top=admit_top)
        return st3, out

    ev_fn = lambda st, s: gather_window_features(feat, s)
    final, outs = run_jump_scan_seq(extra, {}, ev_fn, nxt_trk, W, S, nsteps,
                                    rise_parm, min_parm, agc_ring=agc_ring)
    final.update(compact_outputs(
        outs["admit"], K,
        tr_s=(outs["s_det"], BIG_S),
        tr_t=(outs["t_peak"], F32(0.0)),
        tr_agc=(outs["agc_after"], F32(1.0)),
        tr_top=(outs["is_top"], False)))
    return final
