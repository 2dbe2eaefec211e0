"""Pallas TPU kernel for the NRZI global bit-slot scan: per-track
row-space windows, no merged stream, no sort.

(The superseded v2 design -- see git history -- consumed a pre-merged
time-sorted stream, paying an XLA lax.sort of ~0.3-0.4 s/tape at bench
shapes plus ~30 cross-lane reductions per consume round to extract
per-track values from a 256-entry shared window.)

This kernel exploits that NRZI consumption is PER TRACK
(decode_nrzi.c:232-314 via nrzi.nrzi_slot_scan: each track independently
consumes its next <=4 transitions with s_det < s_z): it holds a
256-entry window PER TRACK, laid out with tracks as sublanes ([16, 128]
blocks, row t = track t), so every per-track quantity (counts, rank-j
times, newest/second) is ONE lane-axis reduction over a [16, 128] block
for ALL tracks at once:

- candidates   c = (rel in [0, 4)) & (idx < count) & (s < s_z), where
  rel = window index - (kvis - base); per-track transitions are sorted
  ascending so the candidate region is automatically the contiguous run
  of the next unconsumed entries -- rank == rel, no prefix scan needed;
- kvis/base/lp/pv live as [16, 128] lane-replicated columns, updated by
  vector ops (the v2 design mirrored kvis in T SMEM scalars);
- per-(track, slot) outputs stream out through a track-major block
  ([16, CH*16]: row = track, column = slot*16 + field) that the XLA
  reconstruct transposes for free, replacing the per-track
  lane-extraction reductions of the v2 design.

Window refill is per track and rare (once per 128 consumed entries per
track): one dynamically indexed row DMA from the [T*nr, 128] per-track
stream.

Semantics are decode_nrzi.c:232-314 through the XLA scan
(nrzi.nrzi_slot_scan), which this kernel must match bit-exactly; the
equality test is tests/test_pallas_slot.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import F32, I32

CH = 8                      # slots per grid step (CH * F == 128)
F = 16                      # track-block fields per (track, slot)
NEG_T = np.float32(-1e30)
BIG_S = np.float32(2 ** 30)

# track-block fields (row = track, column = slot*F + field)
(TB_N1, TB_TJ10, TB_TJ11, TB_TJ12, TB_N2, TB_TJ20, TB_TJ21, TB_TJ22,
 TB_ACT, TB_LP) = range(10)

# per-slot scalar stream lanes (subset of v2's: per-track lanes moved to
# the track block)
L_TLC0, L_TLC1, L_TLC2, L_B0, L_TLM0, L_POST0 = range(6)
L_FLAGS, L_POST2, L_TLC3 = 11, 12, 13
F_ENDED, F_PASTEND, F_OVF, F_HAVE, F_LIVE = 1, 2, 4, 8, 16

# SMEM scalar slots (all f32)
(SM_TLC, SM_TLM, SM_POST, SM_AVG, SM_BITNDX, SM_DONE, SM_OVF, SM_ENDED,
 SM_ENDS, SM_NSLOT) = range(10)
SM_BASE = 10                   # per-track window base (16 slots)
N_SM = SM_BASE + 16

# VMEM scratch row-blocks ([16, 128] each unless noted)
R_WS0, R_WS1, R_WT0, R_WT1 = 0, 16, 32, 48   # windows: s / t_peak, 2 rows
R_KV, R_BASE, R_LP, R_PV, R_TB = 64, 80, 96, 112, 128
R_RING = 144                   # clock ring, lane vector ([1, 128])
R_MISC = 145                   # cross-pl.when scalars (lane 0/1)
N_ROWS = 146


def _kernel(s_ref, t_ref, cnt_ref, out_ref, tb_ref, scal_ref,
            st_ref, smem_ref, *, P, T, S, nr, spb,
            clk_windows, clk_alphas, pulse_adjs, midbits):
    n_chunks = pl.num_programs(1)
    chunk = pl.program_id(1)
    p_id = pl.program_id(0) % P
    lane = jax.lax.broadcasted_iota(I32, (16, 128), 1)
    row = jax.lax.broadcasted_iota(I32, (16, 128), 0)
    lane1 = jax.lax.broadcasted_iota(I32, (1, 128), 1)
    zf = jnp.zeros((16, 128), F32)
    zf1 = jnp.zeros((1, 128), F32)
    active = row < T
    lanef = lane.astype(F32)

    def kf(vals):                        # per-parmset knob -> traced scalar
        out = jnp.float32(vals[0])
        for p in range(1, P):
            out = jnp.where(p_id == p, jnp.float32(vals[p]), out)
        return out

    clk_window = kf([float(x) for x in clk_windows])
    clk_alpha = kf(clk_alphas)
    pulse_adj = kf(pulse_adjs)
    midbit = kf(midbits)

    cntv = cnt_ref[0, :, :]              # [16, 128] lane-replicated counts

    def fill(t, w, base_t):
        """DMA stream row (base_t//128 + w) of track t into window row w
        (the only dynamically indexed reads in the kernel)."""
        r = jnp.clip((base_t / 128.0).astype(I32) + w, 0, nr - 1)
        idx = t * nr + r
        o = 16 * w + t
        st_ref[R_WS0 + o:R_WS0 + o + 1, :] = s_ref[0, pl.ds(idx, 1), :]
        st_ref[R_WT0 + o:R_WT0 + o + 1, :] = t_ref[0, pl.ds(idx, 1), :]

    def consume(s_z_f, t_lc_in, b_in, post0):
        """One consume round for all tracks at once. Updates kvis and
        returns per-track columns + the realigned clock."""
        ws0 = st_ref[R_WS0:R_WS0 + 16, :]
        ws1 = st_ref[R_WS1:R_WS1 + 16, :]
        wt0 = st_ref[R_WT0:R_WT0 + 16, :]
        wt1 = st_ref[R_WT1:R_WT1 + 16, :]
        kv = st_ref[R_KV:R_KV + 16, :]
        bs = st_ref[R_BASE:R_BASE + 16, :]
        off = kv - bs
        rel0 = lanef - off
        rel1 = lanef + 128.0 - off
        c0 = (active & (rel0 >= 0.0) & (rel0 < 4.0) &
              (bs + lanef < cntv) & (ws0 < s_z_f))
        c1 = (active & (rel1 >= 0.0) & (rel1 < 4.0) &
              (bs + lanef + 128.0 < cntv) & (ws1 < s_z_f))

        def rsum(m, v):                  # [16, 128] -> [16, 1] row-reduce
            return jnp.sum(jnp.where(m, v, 0.0), axis=1, keepdims=True)

        one = zf + 1.0
        n_seen = rsum(c0, one) + rsum(c1, one)               # [16, 1]
        ovf = (jnp.sum(jnp.where(c0 & (rel0 == 3.0), 1.0, 0.0)) +
               jnp.sum(jnp.where(c1 & (rel1 == 3.0), 1.0, 0.0))) > 0.0
        tj = [rsum(c0 & (rel0 == j), wt0) + rsum(c1 & (rel1 == j), wt1)
              for j in (0.0, 1.0, 2.0)]
        newest = (rsum(c0 & (rel0 == n_seen - 1.0), wt0) +
                  rsum(c1 & (rel1 == n_seen - 1.0), wt1))
        second = (rsum(c0 & (rel0 == n_seen - 2.0), wt0) +
                  rsum(c1 & (rel1 == n_seen - 2.0), wt1))
        w0 = c0 & (rel0 < 3.0)
        w1 = c1 & (rel1 < 3.0)
        t_max = jnp.maximum(jnp.max(jnp.where(w0, wt0, NEG_T)),
                            jnp.max(jnp.where(w1, wt1, NEG_T)))
        st_ref[R_KV:R_KV + 16, :] = kv + n_seen
        realign = ((post0 > 0.0) & (t_max > NEG_T / 2) &
                   (t_lc_in < t_max - (2.0 - midbit) * b_in))
        t_lc_out = jnp.where(realign, t_max - 2.0 * b_in, t_lc_in)
        return dict(n=n_seen, tj=tj, newest=newest, second=second,
                    ovf=ovf, t_lc=t_lc_out)

    def lp_pv_update(r):
        lp = st_ref[R_LP:R_LP + 16, :]
        pv = st_ref[R_PV:R_PV + 16, :]
        had = r["n"] >= 1.0
        pv = jnp.where(r["n"] >= 2.0, r["second"], jnp.where(had, lp, pv))
        lp = jnp.where(had, r["newest"], lp)
        st_ref[R_LP:R_LP + 16, :] = lp
        st_ref[R_PV:R_PV + 16, :] = pv

    @pl.when(chunk == 0)
    def _():
        for t in range(T):
            smem_ref[SM_BASE + t] = 0.0
            fill(t, 0, jnp.float32(0.0))
            fill(t, 1, jnp.float32(0.0))
        st_ref[R_KV:R_KV + 16, :] = zf
        st_ref[R_BASE:R_BASE + 16, :] = zf
        st_ref[R_LP:R_LP + 16, :] = zf + NEG_T
        st_ref[R_PV:R_PV + 16, :] = zf + NEG_T
        st_ref[R_RING:R_RING + 1, :] = zf1 + jnp.float32(spb)
        total = jnp.sum(jnp.where(active & (lane == 0), cntv, 0.0))
        any_trans = total > 0.0
        # earliest detection, low track wins (nrzi_slot_scan's argmin over
        # trans_s[:, 0]): min of s*16 + t over each track's first entry
        ws0 = st_ref[R_WS0:R_WS0 + 16, :]
        wt0 = st_ref[R_WT0:R_WT0 + 16, :]
        key = jnp.where(active & (lane == 0) & (cntv > 0.0),
                        ws0 * 16.0 + row.astype(F32), BIG_S * 16.0)
        kmin = jnp.min(key)
        t_first = jnp.sum(jnp.where(key == kmin, wt0, 0.0))
        t_lc0 = t_first - spb
        smem_ref[SM_TLC] = jnp.where(any_trans, t_lc0, 0.0)
        smem_ref[SM_TLM] = jnp.where(any_trans, t_lc0 + midbit * spb, 0.0)
        smem_ref[SM_POST] = 0.0
        smem_ref[SM_AVG] = jnp.float32(spb)
        smem_ref[SM_BITNDX] = 0.0
        smem_ref[SM_DONE] = jnp.where(any_trans, 0.0, 1.0)
        smem_ref[SM_OVF] = 0.0
        smem_ref[SM_ENDED] = 0.0
        smem_ref[SM_ENDS] = jnp.float32(S)
        smem_ref[SM_NSLOT] = 0.0

    for cc in range(CH):
        was_done = smem_ref[SM_DONE] >= 0.5      # read ONCE: the live body
                                                 # below may set DONE for
                                                 # this very slot
        slot_cols = (lane >= cc * F) & (lane < cc * F + F)

        def tb_set(field, col):
            m = lane == cc * F + field
            tb = st_ref[R_TB:R_TB + 16, :]
            st_ref[R_TB:R_TB + 16, :] = jnp.where(m, col, tb)

        @pl.when(jnp.logical_not(was_done))
        def _(cc=cc, slot_cols=slot_cols, tb_set=tb_set):
            t_lc0 = smem_ref[SM_TLC]
            b0 = smem_ref[SM_AVG]
            post0 = smem_ref[SM_POST]
            t_lm0 = smem_ref[SM_TLM]

            # per-track window shift (rare: once per 128 consumed entries)
            kv = st_ref[R_KV:R_KV + 16, :]
            bs = st_ref[R_BASE:R_BASE + 16, :]
            need = jnp.sum(jnp.where(active & (lane == 0) &
                                     (kv - bs >= 128.0), 1.0, 0.0)) > 0.0

            @pl.when(need)
            def _():
                for t in range(T):
                    kv_t = jnp.sum(jnp.where((row == t) & (lane == 0),
                                             st_ref[R_KV:R_KV + 16, :],
                                             0.0))
                    b_t = smem_ref[SM_BASE + t]

                    @pl.when(kv_t - b_t >= 128.0)
                    def _(t=t, b_t=b_t):
                        st_ref[R_WS0 + t:R_WS0 + t + 1, :] = \
                            st_ref[R_WS1 + t:R_WS1 + t + 1, :]
                        st_ref[R_WT0 + t:R_WT0 + t + 1, :] = \
                            st_ref[R_WT1 + t:R_WT1 + t + 1, :]
                        smem_ref[SM_BASE + t] = b_t + 128.0
                        fill(t, 1, b_t + 128.0)
                        st_ref[R_BASE + t:R_BASE + t + 1, :] = \
                            jnp.zeros((1, 128), F32) + (b_t + 128.0)

            s_z0 = jnp.floor(t_lc0 + 2.0 * b0) + 1.0
            r1 = consume(jnp.minimum(s_z0, jnp.float32(S)), t_lc0, b0,
                         post0)
            lp_pv_update(r1)

            s_z1 = jnp.floor(r1["t_lc"] + 2.0 * b0) + 1.0
            need2 = (s_z1 > s_z0) | r1["ovf"]

            # zero this slot's track-block columns, then set fields
            st_ref[R_TB:R_TB + 16, :] = jnp.where(
                slot_cols, 0.0, st_ref[R_TB:R_TB + 16, :])
            tb_set(TB_N1, r1["n"])
            tb_set(TB_TJ10, r1["tj"][0])
            tb_set(TB_TJ11, r1["tj"][1])
            tb_set(TB_TJ12, r1["tj"][2])

            @pl.when(need2)
            def _():
                r2 = consume(jnp.minimum(s_z1, jnp.float32(S)),
                             r1["t_lc"], b0, post0)
                lp_pv_update(r2)
                tb_set(TB_N2, r2["n"])
                tb_set(TB_TJ20, r2["tj"][0])
                tb_set(TB_TJ21, r2["tj"][1])
                tb_set(TB_TJ22, r2["tj"][2])
                st_ref[R_MISC:R_MISC + 1, :] = jnp.where(
                    lane1 == 0, r2["t_lc"],
                    jnp.where(lane1 == 1,
                              jnp.where(r2["ovf"], 1.0, 0.0), zf1))

            @pl.when(jnp.logical_not(need2))
            def _():
                st_ref[R_MISC:R_MISC + 1, :] = jnp.where(
                    lane1 == 0, r1["t_lc"], zf1)

            misc = st_ref[R_MISC:R_MISC + 1, :]
            t_lc2 = jnp.sum(jnp.where(lane1 == 0, misc, 0.0))
            ovf2 = jnp.sum(jnp.where(lane1 == 1, misc, 0.0)) > 0.5
            lp = st_ref[R_LP:R_LP + 16, :]
            pv = st_ref[R_PV:R_PV + 16, :]
            past_end = s_z1 >= jnp.float32(S)

            # ---- zerocheck (decode_nrzi.c:232-314) ----
            right = t_lc2 + (1.0 + midbit) * b0
            last_in = active & (lp > t_lm0) & (lp < right)
            prev_in = active & (pv > t_lm0) & (pv < right)
            dup = last_in & prev_in
            b2f = (~last_in) & prev_in
            later = active & (~last_in) & (~prev_in) & (lp > right)
            zero = active & (~last_in) & (~prev_in) & (~later)

            col0 = lane == 0
            numbits = jnp.sum(jnp.where(col0 & (last_in | b2f), 1.0, 0.0))
            numlater = jnp.sum(jnp.where(col0 & later, 1.0, 0.0))
            avg_pos = jnp.sum(jnp.where(
                col0, jnp.where(last_in, lp,
                                jnp.where(b2f, pv, 0.0)), 0.0))
            have = numbits > 0.0

            post_h = jnp.where(post0 == 1.0, 0.0, post0)
            avg = avg_pos / jnp.maximum(numbits, 1.0)
            expected = t_lc2 + b0
            adjusted = jnp.where(post_h > 0.0, avg,
                                 expected + pulse_adj * (avg - expected))
            delta = adjusted - t_lc2

            bitndx = smem_ref[SM_BITNDX]
            ndx_i = bitndx.astype(I32)
            ring_row = st_ref[R_RING:R_RING + 1, :]
            old = jnp.sum(jnp.where(lane1 == ndx_i, ring_row, 0.0))
            avg_w = b0 + (delta - old) / jnp.maximum(clk_window, 1.0)
            avg_e = clk_alpha * delta + (1.0 - clk_alpha) * b0
            use_w = clk_window > 0.0
            use_e = (~use_w) & (clk_alpha > 0.0)
            avg_new = jnp.where(use_w, avg_w,
                                jnp.where(use_e, avg_e, jnp.float32(spb)))
            do_clk = have & (post_h == 0.0)

            @pl.when(do_clk & use_w)
            def _():
                st_ref[R_RING:R_RING + 1, :] = jnp.where(
                    lane1 == ndx_i, delta, st_ref[R_RING:R_RING + 1, :])
                smem_ref[SM_BITNDX] = jnp.where(
                    bitndx + 1.0 >= clk_window, 0.0, bitndx + 1.0)

            smem_ref[SM_AVG] = jnp.where(do_clk, avg_new, b0)
            post_h2 = jnp.where(post_h > 0.0, post_h + 1.0, post_h)
            post_n = jnp.where((numlater == 0.0) & (post0 == 0.0), 1.0,
                               jnp.where(post0 > 0.0, post0 + 1.0, post0))
            post2 = jnp.where(have, post_h2, post_n)
            t_lc3 = jnp.where(have, adjusted, t_lc2 + b0)
            smem_ref[SM_TLC] = t_lc3
            smem_ref[SM_TLM] = right
            smem_ref[SM_POST] = post2

            ended = post2 >= 8.0
            smem_ref[SM_ENDS] = jnp.where(
                ended & (smem_ref[SM_ENDED] < 0.5),
                jnp.minimum(s_z1, jnp.float32(S)), smem_ref[SM_ENDS])
            smem_ref[SM_ENDED] = jnp.where(ended, 1.0, smem_ref[SM_ENDED])
            smem_ref[SM_OVF] = jnp.where(r1["ovf"] | ovf2, 1.0,
                                         smem_ref[SM_OVF])
            smem_ref[SM_DONE] = jnp.where(ended | past_end, 1.0, 0.0)
            smem_ref[SM_NSLOT] = smem_ref[SM_NSLOT] + 1.0

            act = (jnp.where(dup, 1.0, 0.0) + jnp.where(later, 2.0, 0.0) +
                   jnp.where(zero, 3.0, 0.0))
            tb_set(TB_ACT, act)
            tb_set(TB_LP, jnp.where(active & (lp > NEG_T / 2), lp, 0.0))

            flags = (jnp.where(ended, float(F_ENDED), 0.0) +
                     jnp.where(past_end, float(F_PASTEND), 0.0) +
                     jnp.where(r1["ovf"] | ovf2, float(F_OVF), 0.0) +
                     jnp.where(have, float(F_HAVE), 0.0) + float(F_LIVE))
            vals = jnp.where(lane1 == L_TLC0, t_lc0,
                    jnp.where(lane1 == L_TLC1, r1["t_lc"],
                     jnp.where(lane1 == L_TLC2, t_lc2,
                      jnp.where(lane1 == L_B0, b0,
                       jnp.where(lane1 == L_TLM0, t_lm0,
                        jnp.where(lane1 == L_POST0, post0,
                         jnp.where(lane1 == L_FLAGS, flags,
                          jnp.where(lane1 == L_POST2, post2,
                           jnp.where(lane1 == L_TLC3, t_lc3,
                            zf1)))))))))
            out_ref[0, cc:cc + 1, :] = vals

        @pl.when(was_done)
        def _(cc=cc, slot_cols=slot_cols):
            out_ref[0, cc:cc + 1, :] = zf1       # inert row (flags = 0)
            st_ref[R_TB:R_TB + 16, :] = jnp.where(
                slot_cols, 0.0, st_ref[R_TB:R_TB + 16, :])

    tb_ref[0, :, :] = st_ref[R_TB:R_TB + 16, :]

    @pl.when(chunk == n_chunks - 1)
    def _():
        # the reconstruct reads lanes 1 (overflow) and 2 (end_s); lanes
        # 0/3 ride along for debugging (per-track kvis comes from the
        # track-block counts, not from here)
        scal_ref[0, 0:1, :] = jnp.where(
            lane1 == 0, smem_ref[SM_ENDED],
            jnp.where(lane1 == 1, smem_ref[SM_OVF],
                      jnp.where(lane1 == 2, smem_ref[SM_ENDS],
                                jnp.where(lane1 == 3, smem_ref[SM_NSLOT],
                                          zf1))))


@functools.partial(jax.jit, static_argnames=(
    "S", "T", "Kp", "max_slots", "spb_i", "clk_windows", "clk_alphas",
    "pulse_adjs", "midbits", "interpret"))
def nrzi_slot_scan_pallas(tr_s, tr_t, counts, *, S, T, Kp, max_slots,
                           spb_i, clk_windows, clk_alphas, pulse_adjs,
                           midbits, interpret=False):
    """tr_s/tr_t: [B, P, T, Kp] per-track admitted transitions (s_det
    ascending, BIG_S fill; Kp a multiple of 128); counts: [B, P, T].
    Returns (stream [B, P, nsl, 128], tb [B, P, nsl//CH, 16, 128],
    scal [B, P, 128])."""
    B, P, T_, K_ = tr_s.shape
    assert T_ == T and K_ == Kp and Kp % 128 == 0
    # the earliest-detection tiebreak key is s*16 + track in one f32 lane
    # (kernel init); past S = 2^20 the track bits fall out of the 24-bit
    # mantissa and the low-track-wins rule silently degrades -- fail loud
    assert S <= 1 << 20, f"slot kernel bucket too large for f32 key: {S}"
    nr = Kp // 128
    n_chunks = -(-max_slots // CH)
    nsl = n_chunks * CH
    kern = functools.partial(
        _kernel, P=P, T=T, S=S, nr=nr, spb=spb_i,
        clk_windows=clk_windows, clk_alphas=clk_alphas,
        pulse_adjs=pulse_adjs, midbits=midbits)

    s_in = tr_s.astype(F32).reshape(B * P, T * nr, 128)
    t_in = tr_t.astype(F32).reshape(B * P, T * nr, 128)
    cnt_in = jnp.broadcast_to(
        jnp.pad(counts.astype(F32), ((0, 0), (0, 0), (0, 16 - T))
                ).reshape(B * P, 16, 1), (B * P, 16, 128))

    stream, tb, scal = pl.pallas_call(
        kern,
        grid=(B * P, n_chunks),
        in_specs=[
            pl.BlockSpec((1, T * nr, 128), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, T * nr, 128), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i, c: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, CH, 128), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, 16, 128), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, 1, 128), lambda i, c: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * P, nsl, 128), jnp.float32),
            jax.ShapeDtypeStruct((B * P, n_chunks * 16, 128), jnp.float32),
            jax.ShapeDtypeStruct((B * P, 1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_ROWS, 128), jnp.float32),
            pltpu.SMEM((N_SM,), jnp.float32),
        ],
        interpret=interpret,
    )(s_in, t_in, cnt_in)
    return (stream.reshape(B, P, nsl, 128),
            tb.reshape(B, P, n_chunks, 16, 128),
            scal.reshape(B, P, 128))


def slot_stream_reconstruct(stream, tb, scal, *,
                             T: int, S: int, maxb: int, spb,
                             stat_leftbin, stat_binwidth, first_k=None):
    """Rebuild the XLA slot scan's final state from the v3 kernel's
    streams for ONE (parmset) lane. stream: [nsl, 128]; tb: [nch, 16,
    128]; scal: [128]. The track block is transposed once ([nsl, T,
    fields]) and every per-track quantity (counts, consumed-transition
    times, act codes, last-seen times) reads straight out of it -- no
    gathers into the [T, K] transition buffers at all. Returns the dict
    nrzi_finish expects (plus end_s/kvis)."""
    nsl = stream.shape[0]
    nch = tb.shape[0]
    trk = jnp.arange(T)
    slot_i = jnp.arange(nsl, dtype=I32)

    # [nch, 16, CH, F] -> [nch, CH, 16, F] -> [nsl, T, F]
    tbt = tb.reshape(nch, 16, CH, F).transpose(0, 2, 1, 3) \
            .reshape(nsl, 16, F)[:, :T, :]
    n1 = tbt[:, :, TB_N1].astype(I32)                          # [nsl, T]
    n2 = tbt[:, :, TB_N2].astype(I32)
    tj1 = tbt[:, :, TB_TJ10:TB_TJ10 + 3]                       # [nsl, T, 3]
    tj2 = tbt[:, :, TB_TJ20:TB_TJ20 + 3]
    act = tbt[:, :, TB_ACT].astype(I32)
    dup = act == 1
    later = act == 2
    zero = act == 3

    ncons = n1 + n2
    kvis_b4 = jnp.cumsum(ncons, axis=0) - ncons                # [nsl, T]
    kvis_fin = kvis_b4[-1] + ncons[-1] if nsl else jnp.zeros(T, I32)

    # dc evolution. The XLA scan CLAMPS at every sub-update
    # (nrzi.py: dc = min(dc + n_new, maxb) per consume round, the dup
    # delete, then min(dc + 1, maxb) for later/zero), so a plain cumsum
    # diverges once any track overflows maxb. Each slot's net effect is
    # an affine-min map x -> min(x + a, b) (composition of clamped adds:
    # (a1,b1)∘(a2,b2) = (a1+a2, min(b1+a2, b2))), so the exact clamped
    # dc comes from one associative scan over slots.
    dupi = dup.astype(I32)
    lati = later.astype(I32)
    zeri = zero.astype(I32)
    # within-slot composition: consume n1 (clamp maxb), consume n2
    # (clamp), dup -1 (no clamp), later +1 (clamp), zero +1 (clamp)
    a_slot = ncons - dupi + lati + zeri
    b_slot = jnp.minimum(maxb - dupi + lati, maxb) + zeri
    b_slot = jnp.minimum(b_slot, maxb)

    def _amin_compose(f, g):
        # apply f THEN g (scan runs in slot order)
        return (f[0] + g[0], jnp.minimum(f[1] + g[0], g[1]))

    pa_, pb_ = jax.lax.associative_scan(
        _amin_compose, (a_slot, b_slot), axis=0)
    dc_after = jnp.minimum(pa_, pb_)           # dc entering slot i+1
    dc_b4 = jnp.concatenate(
        [jnp.zeros((1, T), I32), dc_after[:-1]], axis=0)
    dc_fin = dc_after[-1] if nsl else jnp.zeros(T, I32)
    dc1c = jnp.minimum(dc_b4 + n1, maxb)       # after consume round 1
    dc2c = jnp.minimum(dc1c + n2, maxb)        # after consume round 2
    dca = dc2c - dupi                          # after the dup delete

    # ---- consume write indices (ops 0..5) and peak-stat buckets ----
    # counts advance kvis/dc by up to 4, but only 3 positions get writes
    # and peak stats (the XLA consume's wr/hb loops run j in range(3));
    # writes clamp to maxb-1 exactly like the scan's min(dc + j, maxb-1)
    j3 = jnp.arange(3)[None, None, :]
    has1 = j3 < jnp.minimum(n1, 3)[:, :, None]                  # [nsl, T, 3]
    has2 = j3 < jnp.minimum(n2, 3)[:, :, None]
    wr1 = jnp.where(has1, jnp.minimum(dc_b4[:, :, None] + j3, maxb - 1),
                    maxb)
    wr2 = jnp.where(has2, jnp.minimum(dc1c[:, :, None] + j3, maxb - 1),
                    maxb)

    post0 = stream[:, L_POST0]
    stat_ok = post0 == 0.0
    t_lc0 = stream[:, L_TLC0]
    t_lc1 = stream[:, L_TLC1]

    # the block's FIRST transition (track first_k, rank 0) is never
    # stat-recorded: the C's record check runs before nrzi_addbit sets
    # nrzi.datablock (decode_nrzi.c:156-162, 187, 202)
    if first_k is not None:
        fe = (kvis_b4 == 0) & (trk[None, :] == first_k)        # [nsl, T]
        skip1 = fe[:, :, None] & (j3 == 0)
        skip2 = fe[:, :, None] & (n1[:, :, None] == 0) & (j3 == 0)
    else:
        skip1 = skip2 = jnp.zeros((1, 1, 1), bool)

    def buckets(tj, has, t_lc, skip):
        val = tj - t_lc[:, None, None]
        # (int) cast truncates toward zero (decoder.c:160)
        bkt = ((val - stat_leftbin) / stat_binwidth).astype(I32)
        # in-range buckets 0..49 count toward trksums; out-of-range maps
        # to the extreme buckets without trksums (52 -> 0, 53 -> 49)
        code = jnp.where(bkt < 0, 52, jnp.where(bkt > 49, 53, bkt))
        return jnp.where(has & stat_ok[:, None, None] & ~skip, code, 50)

    hb = jnp.concatenate([buckets(tj1, has1, t_lc0, skip1),
                          buckets(tj2, has2, t_lc1, skip2)],
                         axis=2)                                # [nsl, T, 6]

    # midbit warnings (nrzi consume():193-194)
    t_lm0 = stream[:, L_TLM0]
    miss = ((has1 & (tj1 < t_lm0[:, None, None])) |
            (has2 & (tj2 < t_lm0[:, None, None]))) & \
        stat_ok[:, None, None]
    missed_midbits = jnp.sum(miss.astype(I32))

    # ---- zerocheck write indices (ops 6..8) ----
    i0 = jnp.where(later, jnp.maximum(dca - 1, 0), maxb)
    i1 = jnp.where(later, jnp.minimum(dca, maxb - 1), maxb)
    dcb = jnp.minimum(dca + lati, maxb)
    i2 = jnp.where(zero, jnp.minimum(dcb, maxb - 1), maxb)

    wr = jnp.concatenate([wr1, wr2, i0[:, :, None], i1[:, :, None],
                          i2[:, :, None]], axis=2)              # [nsl, T, 9]

    # ---- replay without last-writer keys ----
    # The scatter-max replay (key = (slot*16+op)*2+val over all 9 write
    # ops) costs ~14 ns/update on the v5e; its entry count dominates the
    # reconstruct. But the final bit at interior positions needs no key
    # resolution at all: consume/op7 1-writes at a position always come
    # BEFORE any zerocheck 0-write there (future consume ranges start at
    # dc >= dcb > the zeroed index), so
    #     bits[m] = covered_by_a_1_range(m) AND NOT zero_marked(m).
    # Coverage is a prefix-max: scatter end-of-range at start-of-range,
    # cummax along m, covered iff running end > m. Only 4 scatter
    # columns per (slot, track) instead of 9. The two positions where
    # index CLAMPING can break the no-later-1-write argument (0, from
    # max(dca-1, 0); maxb-1, where every overflowing write of either
    # value piles up via min(., maxb-1)) are fixed up exactly with the
    # original max-key rule via two cheap reductions over wr.
    m1 = jnp.minimum(n1, 3)
    m2 = jnp.minimum(n2, 3)
    s2w = dc1c                         # round-2 writes start here (clamped)
    hole1 = n1 > 3                     # round-1 write cap leaves a hole
    # col A: merged round-1+2 range when contiguous, else round 1 only
    stA = jnp.where((m1 + m2) > 0, dc_b4, maxb)
    enA = jnp.where(hole1, dc_b4 + m1, s2w + m2)
    # col B: round-2 range when a hole separates it from round 1
    stB = jnp.where(hole1 & (m2 > 0), s2w, maxb)
    enB = s2w + m2
    # col C: op7 (the "later" re-write at dca, val 1)
    stC = jnp.where(later, dca, maxb)
    enC = dca + 1
    covst = jnp.clip(jnp.stack([stA, stB, stC], axis=-1), 0, maxb)
    coven = jnp.stack([enA, enB, enC], axis=-1)
    ti2 = trk[:, None]
    cov = jnp.full((T, maxb + 1), -1, I32).at[
        ti2, covst.transpose(1, 0, 2).reshape(T, nsl * 3)].max(
        coven.transpose(1, 0, 2).reshape(T, nsl * 3), mode="drop")
    mm = jnp.arange(maxb, dtype=I32)
    covered = jax.lax.cummax(cov[:, :maxb], axis=1) > mm[None, :]
    # zero marks: op6 (later) and op8 (zero) are mutually exclusive
    zidx = jnp.where(later, jnp.maximum(dca - 1, 0),
                     jnp.where(zero, dcb, maxb))
    zz = jnp.zeros((T, maxb + 1), I32).at[
        ti2, jnp.clip(zidx, 0, maxb).T].max(1, mode="drop")
    bits = (covered & (zz[:, :maxb] == 0)).astype(jnp.int8)

    # exact fixup at the clamp-collision positions via the key rule
    op_val = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 1, 0], I32)
    key = ((slot_i[:, None, None] * 16 + jnp.arange(9, dtype=I32)) * 2
           + op_val)                                            # [nsl,1,9]
    k0 = jnp.max(jnp.where(wr == 0, key, -1), axis=(0, 2))      # [T]
    kL = jnp.max(jnp.where(wr == maxb - 1, key, -1), axis=(0, 2))
    bits = bits.at[:, 0].set(
        jnp.where(k0 >= 0, (k0 & 1), 0).astype(jnp.int8))
    bits = bits.at[:, maxb - 1].set(
        jnp.where(kL >= 0, (kL & 1), 0).astype(jnp.int8))

    # dense one-hot reduction instead of scatter-add: TPU scatters cost
    # ~14 ns/update (measured), the 51-bin compare+sum is ~3.4x faster
    hb2 = jnp.where(hb == 52, 0, jnp.where(hb == 53, 49, hb))
    hist = jnp.sum((hb2[:, :, :, None] ==
                    jnp.arange(50, dtype=I32)).astype(I32), axis=(0, 2))
    trksums = jnp.sum((hb <= 49).astype(I32), axis=(0, 2))

    # ---- first/last bit times ----
    b0 = stream[:, L_B0]
    t_lc2 = stream[:, L_TLC2]
    tz = t_lc2 + b0                                             # [nsl]
    # last per track: zerocheck overrides consume within a slot. The
    # consume path's t_lastbit is the last WRITTEN transition (j < 3 per
    # round); the "later" action instead records lastpeak = the last SEEN
    # transition (kvis-1, which can be an unwritten 4th) -- the kernel's
    # lp column, streamed as track-block field TB_LP.
    lastpeak_t = tbt[:, :, TB_LP]                               # [nsl, T]
    nw = jnp.minimum(n1, 3) + jnp.minimum(n2, 3)

    def at_rank(tj, n):
        """tj[:, :, rank n-1] via one-hot (no gather)."""
        return jnp.sum(jnp.where(j3 == (n - 1)[:, :, None], tj, 0.0),
                       axis=2)
    lastwrite_t = jnp.where(jnp.minimum(n2, 3) > 0,
                            at_rank(tj2, jnp.minimum(n2, 3)),
                            at_rank(tj1, jnp.minimum(n1, 3)))
    any_c = nw > 0
    t_last_slot = jnp.where(later, lastpeak_t,
                            jnp.where(zero, tz[:, None],
                                      jnp.where(any_c, lastwrite_t, -1.0)))
    wrote = later | zero | any_c
    last_slot = jnp.max(jnp.where(wrote, slot_i[:, None], -1), axis=0)
    t_lastbit = jnp.where(
        last_slot >= 0,
        t_last_slot[jnp.maximum(last_slot, 0), trk], 0.0)

    # first: the write that brought dc 0 -> positive (round 1's first
    # write if it had any, else round 2's)
    first_c = any_c & (dc_b4 == 0)
    tj_first = jnp.where(jnp.minimum(n1, 3) > 0, tj1[:, :, 0],
                         tj2[:, :, 0])
    zlike = later | zero
    first_z = zlike & (dca == 0)
    t_first_slot = jnp.where(first_c, tj_first,
                             jnp.where(first_z, tz[:, None], BIG_S))
    first_slot = jnp.argmin(
        jnp.where(first_c | first_z, slot_i[:, None], 2 ** 30), axis=0)
    has_first = jnp.any(first_c | first_z, axis=0)
    t_firstbit = jnp.where(has_first,
                           t_first_slot[first_slot, trk], 0.0)

    flags_all = stream[:, L_FLAGS].astype(I32)
    consume_overflow = jnp.any((flags_all & F_OVF) > 0) | (scal[1] > 0.5)

    return dict(
        dc=dc_fin, kvis=kvis_fin, bits=bits,
        t_firstbit=t_firstbit, t_lastbit=t_lastbit,
        missed_midbits=missed_midbits,
        corrected_bits=jnp.int32(0), faked_tracks=jnp.int32(0),
        hist=hist, trksums=trksums,
        consume_overflow=consume_overflow,
        end_s=jnp.minimum(scal[2], jnp.float32(S)).astype(I32),
    )
