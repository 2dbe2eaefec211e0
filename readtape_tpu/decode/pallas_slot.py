"""Pallas TPU kernel for the NRZI global bit-slot scan.

The XLA slot scan (nrzi.nrzi_slot_scan) pays ~100-300 us of op dispatch
per sequential slot; this Mosaic kernel runs the whole slot loop as one
program at ~1 us/slot. Semantics are decode_nrzi.c:232-314 via the XLA
scan, which it must match bit-exactly.

Design:

- One instance per (batch, parmset) lane; grid = (B*P, slot chunks). Each
  grid step processes CH slots and writes one [CH, 128] stream-out block
  statically; decode state persists in SMEM scalars + VMEM scratch rows.
- The per-track transition lists are pre-merged into ONE time-sorted
  stream (XLA sort by (s_det, track), each entry carrying its per-track
  sequence number); the kernel holds a 256-entry register window over it.
  Consumption is tracked per track (kvis, exactly like the XLA scan's
  visible counts) because the reference's <=3-per-track-per-consume rule
  can leave entries of one track unconsumed while later entries of other
  tracks are consumed; the window advances whenever its leading row is
  fully consumed.
- Only the loop-carried decode state lives in the kernel: the global
  clock (ring as a lane vector), postamble counter, per-track
  last/previous peak times and kvis. Everything else (bit-buffer writes,
  peak-stat buckets, midbit warnings, first/last bit times) is
  RECONSTRUCTED data-parallel in XLA from a compact per-slot stream
  (consume counts per track, zerocheck action codes, clock values in
  effect), then fed through scatter replay so nrzi_finish sees exactly
  the state the XLA scan would have produced (slot_stream_reconstruct).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import common as cm
from .common import F32, I32

CH = 8                      # slots per grid step
NEG_T = np.float32(-1e30)
BIG_S = np.float32(2 ** 30)

# SMEM scalar slots (all f32)
(SM_TLC, SM_TLM, SM_POST, SM_AVG, SM_BITNDX, SM_GBASE, SM_DONE,
 SM_OVF, SM_ENDED, SM_ENDS, SM_NSLOT, SM_KV) = range(12)
N_SM = 12 + 16                 # SM_KV.. = per-track kvis mirror (scalars)

# VMEM scratch rows (window rows cache the merged stream so the hot
# per-slot path does ZERO dynamically indexed reads; refills happen only
# when the window shifts, ~once per 128 consumed entries)
ST_LP, ST_PV, ST_RING, ST_R2, ST_TJ2 = 0, 1, 2, 3, 4
ST_WS, ST_WT, ST_WK, ST_WQ = 5, 7, 9, 11       # each spans 2 rows
ST_RANK, ST_SECOND = 13, 15                     # rank spans 2 rows
N_ST = 16

# per-slot stream lanes
(L_TLC0, L_TLC1, L_TLC2, L_B0, L_TLM0, L_POST0, L_N1P0, L_N1P1,
 L_N2P0, L_N2P1, L_ACT, L_FLAGS, L_POST2, L_TLC3) = range(14)
F_ENDED, F_PASTEND, F_OVF, F_HAVE, F_LIVE = 1, 2, 4, 8, 16


def _kernel(ms_ref, mt_ref, mtrk_ref, mk_ref, nent_ref, out_ref, times_ref,
            scal_ref, st_ref, smem_ref, *, P, T, S, M, spb,
            clk_windows, clk_alphas, pulse_adjs, midbits):
    n_chunks = pl.num_programs(1)
    chunk = pl.program_id(1)
    p_id = pl.program_id(0) % P
    lane = jax.lax.broadcasted_iota(I32, (1, 128), 1)
    lane2 = jax.lax.broadcasted_iota(I32, (2, 128), 1)
    row2 = jax.lax.broadcasted_iota(I32, (2, 128), 0)
    zf = (lane * 0).astype(F32)
    lane_t = lane                        # lanes 0..T-1 = tracks
    active_t = lane_t < T

    def kf(vals):                        # per-parmset knob -> traced scalar
        out = jnp.float32(vals[0])
        for p in range(1, P):
            out = jnp.where(p_id == p, jnp.float32(vals[p]), out)
        return out

    clk_window = kf([float(x) for x in clk_windows])
    clk_alpha = kf(clk_alphas)
    pulse_adj = kf(pulse_adjs)
    midbit = kf(midbits)

    nent = jnp.sum(jnp.where((lane2 == 0) & (row2 == 0),
                             nent_ref[0, 0:2, :], 0.0))

    def win_fill(row_of_window):
        """DMA one merged-stream row into window slot 0 or 1 (the only
        dynamically indexed reads in the kernel)."""
        gb_i = smem_ref[SM_GBASE].astype(I32)
        r = jnp.clip(gb_i // 128 + row_of_window, 0, M // 128 - 1)
        o = row_of_window
        st_ref[ST_WS + o:ST_WS + o + 1, :] = ms_ref[0, pl.ds(r, 1), :]
        st_ref[ST_WT + o:ST_WT + o + 1, :] = mt_ref[0, pl.ds(r, 1), :]
        st_ref[ST_WK + o:ST_WK + o + 1, :] = mtrk_ref[0, pl.ds(r, 1), :]
        st_ref[ST_WQ + o:ST_WQ + o + 1, :] = mk_ref[0, pl.ds(r, 1), :]

    def win_read():
        gb_i = smem_ref[SM_GBASE].astype(I32)
        r = jnp.clip(gb_i // 128, 0, M // 128 - 2)
        s2 = st_ref[ST_WS:ST_WS + 2, :]
        t2 = st_ref[ST_WT:ST_WT + 2, :]
        k2 = st_ref[ST_WK:ST_WK + 2, :]
        q2 = st_ref[ST_WQ:ST_WQ + 2, :]
        gpos = (r * 128 + row2 * 128 + lane2).astype(F32)
        return s2, t2, k2, q2, gpos

    def prefix2(x):
        """Inclusive-turned-exclusive prefix over the 256-entry window."""
        inc = x
        for sh in (1, 2, 4, 8, 16, 32, 64):
            inc = inc + jnp.where(lane2 >= sh, pltpu.roll(inc, sh, 1),
                                  jnp.zeros_like(inc))
        exc = inc - x
        tot0 = jnp.max(jnp.where(row2 == 0, inc, jnp.zeros_like(inc)))
        return exc + jnp.where(row2 == 1, tot0, jnp.zeros_like(inc))

    def maybe_shift():
        """Advance the window while its leading row is fully consumed."""
        for _ in range(2):
            s2, t2, k2, q2, gpos = win_read()
            tk = k2.astype(I32)
            kv_e2 = jnp.zeros((2, 128), F32)
            for t in range(T):
                kv_e2 = jnp.where(tk == t, smem_ref[SM_KV + t], kv_e2)
            row0_done = jnp.sum(jnp.where(
                (row2 == 0) & (gpos < nent) & (q2 >= kv_e2), 1.0, 0.0))
            gb = smem_ref[SM_GBASE]

            @pl.when((row0_done == 0.0) & (gb + 256.0 < nent))
            def _():
                smem_ref[SM_GBASE] = gb + 128.0
                # slide: cached row1 -> row0, fetch the new row1
                st_ref[ST_WS:ST_WS + 1, :] = st_ref[ST_WS + 1:ST_WS + 2, :]
                st_ref[ST_WT:ST_WT + 1, :] = st_ref[ST_WT + 1:ST_WT + 2, :]
                st_ref[ST_WK:ST_WK + 1, :] = st_ref[ST_WK + 1:ST_WK + 2, :]
                st_ref[ST_WQ:ST_WQ + 1, :] = st_ref[ST_WQ + 1:ST_WQ + 2, :]
                win_fill(1)

    def consume(s_z_f, t_lc_in, b_in, post0):
        """One consume round. Updates kvis; returns per-track info +
        packed counts + realigned clock."""
        s2, t2, k2, q2, gpos = win_read()
        tk = k2.astype(I32)
        tk5 = jnp.maximum(tk - 5, 0)
        kv_e2 = jnp.zeros((2, 128), F32)
        for t in range(T):
            kv_e2 = jnp.where(tk == t, smem_ref[SM_KV + t], kv_e2)
        cand = (q2 >= kv_e2) & (s2 < s_z_f) & (gpos < nent)
        grp0 = jnp.where(cand & (tk < 5), 1 << (6 * tk), 0)
        grp1 = jnp.where(cand & (tk >= 5), 1 << (6 * tk5), 0)
        # candidate counts per track (2 reduces); the expensive per-track
        # RANK prefix runs only when some track has 2+ candidates in the
        # window -- on clean tapes almost never
        tot0 = jnp.sum(grp0)
        tot1 = jnp.sum(grp1)
        multi = jnp.bool_(False)
        for t in range(9):
            c_t = jnp.where(t < 5, (tot0 >> (6 * t)) & 63,
                            (tot1 >> (6 * (t - 5))) & 63)
            multi = multi | (c_t >= 2)

        @pl.when(multi)
        def _():
            pre0 = prefix2(grp0)
            pre1 = prefix2(grp1)
            rk = jnp.where(tk < 5, (pre0 >> (6 * tk)) & 63,
                           (pre1 >> (6 * tk5)) & 63)
            st_ref[ST_RANK:ST_RANK + 2, :] = rk.astype(F32)

        @pl.when(jnp.logical_not(multi))
        def _():
            st_ref[ST_RANK:ST_RANK + 2, :] = jnp.zeros((2, 128), F32)

        rank = st_ref[ST_RANK:ST_RANK + 2, :].astype(I32)
        # the XLA scan's consume checks FOUR positions: up to 3 get bit
        # writes but kvis/dc advance past a 4th "seen" transition (which
        # also sets the overflow flag); ranks >= 4 wait for the next round
        take = cand & (rank < 4)
        ovf = jnp.sum(jnp.where(cand & (rank >= 3), 1.0, 0.0)) > 0.0

        # take counts pack in 4-bit fields (counts <= 4): 5 tracks x 4
        # bits = 20 bits stays exact through the f32 stream lane (6-bit
        # fields hit 30 bits and lost the low track's count to f32
        # mantissa rounding)
        cp0 = jnp.sum(jnp.where(take & (tk < 5), 1 << (4 * tk), 0))
        cp1 = jnp.sum(jnp.where(take & (tk >= 5), 1 << (4 * tk5), 0))
        cnt_pack0 = cp0.astype(F32)
        cnt_pack1 = cp1.astype(F32)
        n_new = jnp.where(lane_t < 5, (cp0 >> (4 * lane_t)) & 15,
                          (cp1 >> (4 * jnp.maximum(lane_t - 5, 0))) & 15)
        n_new = jnp.where(active_t, n_new, 0).astype(F32)
        for t in range(T):
            cnt_t = jnp.where(t < 5, (cp0 >> (4 * t)) & 15,
                              (cp1 >> (4 * max(t - 5, 0))) & 15)
            smem_ref[SM_KV + t] = smem_ref[SM_KV + t] + cnt_t.astype(F32)

        n_by_entry = jnp.where(tk < 5, (cp0 >> (4 * tk)) & 15,
                               (cp1 >> (4 * tk5)) & 15)
        m_last = take & (rank == n_by_entry - 1)

        def to_track_lanes(mask, val):
            out = zf
            for t in range(T):
                v = jnp.sum(jnp.where(mask & (tk == t), val, 0.0))
                out = jnp.where(lane_t == t, v, out)
            return out

        newest = to_track_lanes(m_last, t2)

        # consumed-transition times for the reconstruct stream: lane
        # base + t*3 + j carries the time of track t's rank-j write this
        # round (rank row is all-zero when not multi, which is exactly
        # right: at most one candidate per track then, and it has rank 0)
        def to_tj_lanes(base):
            out = zf
            for j in range(3):
                m = take & (rank == j)
                for t in range(T):
                    v = jnp.sum(jnp.where(m & (tk == t), t2, 0.0))
                    out = jnp.where(lane == base + t * 3 + j, v, out)
            return out

        @pl.when(multi)
        def _():
            m_prev = take & (rank == n_by_entry - 2)
            st_ref[ST_SECOND:ST_SECOND + 1, :] = \
                to_track_lanes(m_prev, t2)

        @pl.when(jnp.logical_not(multi))
        def _():
            st_ref[ST_SECOND:ST_SECOND + 1, :] = zf

        second = st_ref[ST_SECOND:ST_SECOND + 1, :]

        t_max = jnp.max(jnp.where(take & (rank < 3), t2, NEG_T))
        realign = ((post0 > 0.0) & (t_max > NEG_T / 2) &
                   (t_lc_in < t_max - (2.0 - midbit) * b_in))
        t_lc_out = jnp.where(realign, t_max - 2.0 * b_in, t_lc_in)
        return dict(n_new=n_new, newest=newest, second=second,
                    p0=cnt_pack0, p1=cnt_pack1, ovf=ovf, t_lc=t_lc_out,
                    tj=to_tj_lanes)

    @pl.when(chunk == 0)
    def _():
        any_trans = nent > 0.0
        t_first = jnp.sum(jnp.where((lane2 == 0) & (row2 == 0),
                                    mt_ref[0, 0:2, :], 0.0))
        t_lc0 = t_first - spb
        smem_ref[SM_TLC] = jnp.where(any_trans, t_lc0, 0.0)
        smem_ref[SM_TLM] = jnp.where(any_trans, t_lc0 + midbit * spb, 0.0)
        smem_ref[SM_POST] = 0.0
        smem_ref[SM_AVG] = jnp.float32(spb)
        smem_ref[SM_BITNDX] = 0.0
        smem_ref[SM_GBASE] = 0.0
        smem_ref[SM_DONE] = jnp.where(any_trans, 0.0, 1.0)
        smem_ref[SM_OVF] = 0.0
        smem_ref[SM_ENDED] = 0.0
        smem_ref[SM_ENDS] = jnp.float32(S)
        smem_ref[SM_NSLOT] = 0.0
        st_ref[ST_LP:ST_LP + 1, :] = zf + NEG_T
        st_ref[ST_PV:ST_PV + 1, :] = zf + NEG_T
        st_ref[ST_RING:ST_RING + 1, :] = zf + jnp.float32(spb)
        for t in range(T):
            smem_ref[SM_KV + t] = 0.0
        win_fill(0)
        win_fill(1)

    for cc in range(CH):
        was_done = smem_ref[SM_DONE] >= 0.5      # read ONCE: the live body
                                                 # below may set DONE for
                                                 # this very slot

        @pl.when(jnp.logical_not(was_done))
        def _(cc=cc):
            t_lc0 = smem_ref[SM_TLC]
            b0 = smem_ref[SM_AVG]
            post0 = smem_ref[SM_POST]
            t_lm0 = smem_ref[SM_TLM]

            maybe_shift()
            s_z0 = jnp.floor(t_lc0 + 2.0 * b0) + 1.0
            r1 = consume(jnp.minimum(s_z0, jnp.float32(S)), t_lc0, b0,
                         post0)
            tj1row = r1["tj"](0)
            lp = st_ref[ST_LP:ST_LP + 1, :]
            pv = st_ref[ST_PV:ST_PV + 1, :]
            had1 = r1["n_new"] >= 1.0
            pv = jnp.where(r1["n_new"] >= 2.0, r1["second"],
                           jnp.where(had1, lp, pv))
            lp = jnp.where(had1, r1["newest"], lp)
            st_ref[ST_LP:ST_LP + 1, :] = lp
            st_ref[ST_PV:ST_PV + 1, :] = pv

            s_z1 = jnp.floor(r1["t_lc"] + 2.0 * b0) + 1.0
            need2 = (s_z1 > s_z0) | r1["ovf"]

            @pl.when(need2)
            def _():
                maybe_shift()
                r2 = consume(jnp.minimum(s_z1, jnp.float32(S)),
                             r1["t_lc"], b0, post0)
                st_ref[ST_TJ2:ST_TJ2 + 1, :] = r2["tj"](27)
                lp_ = st_ref[ST_LP:ST_LP + 1, :]
                pv_ = st_ref[ST_PV:ST_PV + 1, :]
                had2 = r2["n_new"] >= 1.0
                pv_ = jnp.where(r2["n_new"] >= 2.0, r2["second"],
                                jnp.where(had2, lp_, pv_))
                lp_ = jnp.where(had2, r2["newest"], lp_)
                st_ref[ST_LP:ST_LP + 1, :] = lp_
                st_ref[ST_PV:ST_PV + 1, :] = pv_
                st_ref[ST_R2:ST_R2 + 1, :] = jnp.where(
                    lane == 0, r2["t_lc"],
                    jnp.where(lane == 1, r2["p0"],
                              jnp.where(lane == 2, r2["p1"],
                                        jnp.where(lane == 3,
                                                  jnp.where(r2["ovf"], 1.0,
                                                            0.0), zf))))

            @pl.when(jnp.logical_not(need2))
            def _():
                st_ref[ST_TJ2:ST_TJ2 + 1, :] = zf
                st_ref[ST_R2:ST_R2 + 1, :] = jnp.where(
                    lane == 0, r1["t_lc"], zf)

            r2row = st_ref[ST_R2:ST_R2 + 1, :]
            r2 = dict(
                t_lc=jnp.sum(jnp.where(lane == 0, r2row, 0.0)),
                p0=jnp.sum(jnp.where(lane == 1, r2row, 0.0)),
                p1=jnp.sum(jnp.where(lane == 2, r2row, 0.0)),
                ovf=jnp.sum(jnp.where(lane == 3, r2row, 0.0)) > 0.5)
            lp = st_ref[ST_LP:ST_LP + 1, :]
            pv = st_ref[ST_PV:ST_PV + 1, :]
            t_lc2 = r2["t_lc"]
            past_end = s_z1 >= jnp.float32(S)

            # ---- zerocheck (decode_nrzi.c:232-314) ----
            right = t_lc2 + (1.0 + midbit) * b0
            last_in = active_t & (lp > t_lm0) & (lp < right)
            prev_in = active_t & (pv > t_lm0) & (pv < right)
            dup = last_in & prev_in
            b2f = (~last_in) & prev_in
            later = active_t & (~last_in) & (~prev_in) & (lp > right)
            zero = active_t & (~last_in) & (~prev_in) & (~later)

            numbits = jnp.sum(jnp.where(last_in | b2f, 1.0, 0.0))
            numlater = jnp.sum(jnp.where(later, 1.0, 0.0))
            avg_pos = jnp.sum(jnp.where(last_in, lp,
                                        jnp.where(b2f, pv, 0.0)))
            have = numbits > 0.0

            post_h = jnp.where(post0 == 1.0, 0.0, post0)
            avg = avg_pos / jnp.maximum(numbits, 1.0)
            expected = t_lc2 + b0
            adjusted = jnp.where(post_h > 0.0, avg,
                                 expected + pulse_adj * (avg - expected))
            delta = adjusted - t_lc2

            bitndx = smem_ref[SM_BITNDX]
            ndx_i = bitndx.astype(I32)
            ring_row = st_ref[ST_RING:ST_RING + 1, :]
            old = jnp.sum(jnp.where(lane_t == ndx_i, ring_row, 0.0))
            avg_w = b0 + (delta - old) / jnp.maximum(clk_window, 1.0)
            avg_e = clk_alpha * delta + (1.0 - clk_alpha) * b0
            use_w = clk_window > 0.0
            use_e = (~use_w) & (clk_alpha > 0.0)
            avg_new = jnp.where(use_w, avg_w,
                                jnp.where(use_e, avg_e, jnp.float32(spb)))
            do_clk = have & (post_h == 0.0)

            @pl.when(do_clk & use_w)
            def _():
                st_ref[ST_RING:ST_RING + 1, :] = jnp.where(
                    lane_t == ndx_i, delta, st_ref[ST_RING:ST_RING + 1, :])
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
            smem_ref[SM_OVF] = jnp.where(r1["ovf"] | r2["ovf"], 1.0,
                                         smem_ref[SM_OVF])
            smem_ref[SM_DONE] = jnp.where(ended | past_end, 1.0, 0.0)
            smem_ref[SM_NSLOT] = smem_ref[SM_NSLOT] + 1.0

            act = (jnp.where(dup, 1, 0) + jnp.where(later, 2, 0) +
                   jnp.where(zero, 3, 0)).astype(F32)
            act_pack = jnp.sum(
                act * jnp.where(active_t,
                                jnp.exp2(2.0 * lane_t.astype(F32)), 0.0))
            flags = (jnp.where(ended, float(F_ENDED), 0.0) +
                     jnp.where(past_end, float(F_PASTEND), 0.0) +
                     jnp.where(r1["ovf"] | r2["ovf"], float(F_OVF), 0.0) +
                     jnp.where(have, float(F_HAVE), 0.0) + float(F_LIVE))
            vals = jnp.where(lane == L_TLC0, t_lc0,
                    jnp.where(lane == L_TLC1, r1["t_lc"],
                     jnp.where(lane == L_TLC2, t_lc2,
                      jnp.where(lane == L_B0, b0,
                       jnp.where(lane == L_TLM0, t_lm0,
                        jnp.where(lane == L_POST0, post0,
                         jnp.where(lane == L_N1P0, r1["p0"],
                          jnp.where(lane == L_N1P1, r1["p1"],
                           jnp.where(lane == L_N2P0, r2["p0"],
                            jnp.where(lane == L_N2P1, r2["p1"],
                             jnp.where(lane == L_ACT, act_pack,
                              jnp.where(lane == L_FLAGS, flags,
                               jnp.where(lane == L_POST2, post2,
                                jnp.where(lane == L_TLC3, t_lc3,
                                 zf))))))))))))))
            out_ref[0, cc:cc + 1, :] = vals
            # times row: lanes t*3+j / 27+t*3+j = round-1/2 consumed
            # transition times; 54+t = per-track last-SEEN time (lp, which
            # includes an unwritten 4th) for the zerocheck "later" action
            lpm = jnp.where((lane_t < T) & (lp > NEG_T / 2), lp, zf)
            times_ref[0, cc:cc + 1, :] = (tj1row +
                                          st_ref[ST_TJ2:ST_TJ2 + 1, :] +
                                          pltpu.roll(lpm, 54, 1))

        @pl.when(was_done)
        def _(cc=cc):
            out_ref[0, cc:cc + 1, :] = zf        # inert row (flags = 0)
            times_ref[0, cc:cc + 1, :] = zf

    @pl.when(chunk == n_chunks - 1)
    def _():
        kvis_v = zf
        for t in range(T):
            kvis_v = jnp.where(lane == 8 + t, smem_ref[SM_KV + t], kvis_v)
        scal_ref[0, 0:1, :] = jnp.where(
            lane == 0, smem_ref[SM_ENDED],
            jnp.where(lane == 1, smem_ref[SM_OVF],
                      jnp.where(lane == 2, smem_ref[SM_ENDS],
                                jnp.where(lane == 3, smem_ref[SM_NSLOT],
                                          kvis_v))))


@functools.partial(jax.jit, static_argnames=(
    "S", "T", "M", "max_slots", "spb_i", "clk_windows", "clk_alphas",
    "pulse_adjs", "midbits", "interpret"))
def nrzi_slot_scan_pallas_raw(ms, mt, mtrk, mk, nent, *, S, T, M,
                              max_slots, spb_i, clk_windows, clk_alphas,
                              pulse_adjs, midbits, interpret=False):
    """ms/mt/mtrk/mk: [B, P, M] merged stream (s_det f32 ascending with
    BIG_S padding, t_peak f32, track f32, per-track sequence number f32);
    nent: [B, P] f32 entry counts. Returns (stream [B, P, nsl, 128],
    times [B, P, nsl, 128], scal [B, P, 128])."""
    B, P, M_ = ms.shape
    assert M_ == M and M % 128 == 0
    n_chunks = -(-max_slots // CH)
    nsl = n_chunks * CH
    kern = functools.partial(
        _kernel, P=P, T=T, S=S, M=M, spb=spb_i,
        clk_windows=clk_windows, clk_alphas=clk_alphas,
        pulse_adjs=pulse_adjs, midbits=midbits)

    def spec_in():
        return pl.BlockSpec((1, M // 128, 128), lambda i, c: (i, 0, 0))

    stream, times, scal = pl.pallas_call(
        kern,
        grid=(B * P, n_chunks),
        in_specs=[spec_in(), spec_in(), spec_in(), spec_in(),
                  pl.BlockSpec((1, 2, 128), lambda i, c: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, CH, 128), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, CH, 128), lambda i, c: (i, c, 0)),
            pl.BlockSpec((1, 1, 128), lambda i, c: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * P, nsl, 128), jnp.float32),
            jax.ShapeDtypeStruct((B * P, nsl, 128), jnp.float32),
            jax.ShapeDtypeStruct((B * P, 1, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N_ST, 128), jnp.float32),
            pltpu.SMEM((N_SM,), jnp.float32),
        ],
        interpret=interpret,
    )(ms.reshape(B * P, M // 128, 128), mt.reshape(B * P, M // 128, 128),
      mtrk.reshape(B * P, M // 128, 128),
      mk.reshape(B * P, M // 128, 128),
      jnp.broadcast_to(
          nent.reshape(B * P, 1, 1), (B * P, 2, 128)).astype(F32))
    return (stream.reshape(B, P, nsl, 128),
            times.reshape(B, P, nsl, 128),
            scal.reshape(B, P, 128))


# ---------------------------------------------------------------------------
# XLA-side stream preparation and reconstruction
# ---------------------------------------------------------------------------

def slot_stream_prepare(tr_s, tr_t, counts, M: int):
    """Per (parmset) lane: [T, K] transition buffers -> time-sorted merged
    stream. Returns (ms, mt, mtrk, mk, nent) with [M] entries (BIG_S
    padding), where mk is each entry's per-track sequence number.
    (A searchsorted-based 9-way merge was measured 3x SLOWER than the
    bitonic sort on the v5e -- vmapped searchsorted lowers to scalar
    gathers.)"""
    T, K = tr_s.shape
    valid = jnp.arange(K)[None, :] < counts[:, None]
    key = jnp.where(valid, tr_s * 16 + jnp.arange(T, dtype=I32)[:, None],
                    jnp.int32(2 ** 30))
    flat_key = key.reshape(-1)
    flat_t = tr_t.reshape(-1)
    flat_k = jnp.broadcast_to(jnp.arange(K, dtype=I32)[None, :],
                              (T, K)).reshape(-1)
    sk, st_, sq = jax.lax.sort((flat_key, flat_t, flat_k), num_keys=1)
    if M > sk.shape[0]:
        pad_n = M - sk.shape[0]
        sk = jnp.concatenate([sk, jnp.full(pad_n, 2 ** 30, I32)])
        st_ = jnp.concatenate([st_, jnp.zeros(pad_n, F32)])
        sq = jnp.concatenate([sq, jnp.zeros(pad_n, I32)])
    sk, st_, sq = sk[:M], st_[:M], sq[:M]
    pad = sk >= 2 ** 30
    ms = jnp.where(pad, BIG_S, (sk >> 4).astype(F32))
    mtrk = jnp.where(pad, 0.0, (sk & 15).astype(F32))
    mt = jnp.where(pad, 0.0, st_)
    mk = jnp.where(pad, 0.0, sq.astype(F32))
    nent = jnp.sum(counts).astype(F32)
    return ms, mt, mtrk, mk, nent


def slot_stream_reconstruct(stream, times, scal, *,
                            T: int, S: int, maxb: int, spb,
                            stat_leftbin, stat_binwidth):
    """Rebuild the XLA slot scan's final state from the kernel's per-slot
    streams for ONE (parmset) lane. stream/times: [nsl, 128]; scal: [128].
    Gather-free: the consumed transition times ride the times stream
    (lanes t*3+j per round, 54+t = last-seen), so nothing is looked up in
    the [T, K] transition buffers (TPU gathers there dominated the old
    reconstruct). Returns the dict nrzi_finish expects (plus end_s/kvis)."""
    nsl = stream.shape[0]
    trk = jnp.arange(T)
    live = (stream[:, L_FLAGS].astype(I32) & F_LIVE) > 0
    slot_i = jnp.arange(nsl, dtype=I32)

    def unpack_counts(p0, p1):
        p0 = p0.astype(I32)[:, None]
        p1 = p1.astype(I32)[:, None]
        t_ = trk[None, :]
        return jnp.where(t_ < 5, (p0 >> (4 * t_)) & 15,
                         (p1 >> (4 * jnp.maximum(t_ - 5, 0))) & 15)

    n1 = unpack_counts(stream[:, L_N1P0], stream[:, L_N1P1])   # [nsl, T]
    n2 = unpack_counts(stream[:, L_N2P0], stream[:, L_N2P1])
    act = (stream[:, L_ACT].astype(I32)[:, None] >>
           (2 * trk[None, :])) & 3
    dup = act == 1
    later = act == 2
    zero = act == 3

    ncons = n1 + n2
    kvis_b4 = jnp.cumsum(ncons, axis=0) - ncons                # [nsl, T]
    kvis_fin = kvis_b4[-1] + ncons[-1] if nsl else jnp.zeros(T, I32)

    # dc evolution (appends then zerocheck adjustments)
    delta = ncons - dup.astype(I32) + later.astype(I32) + zero.astype(I32)
    dc_b4 = jnp.cumsum(delta, axis=0) - delta
    dc_fin = dc_b4[-1] + delta[-1]
    dca = dc_b4 + ncons - dup.astype(I32)      # after consumes + dup delete

    # ---- consume write indices (ops 0..5) and peak-stat buckets ----
    # counts advance kvis/dc by up to 4, but only 3 positions get writes
    # and peak stats (the XLA consume's wr/hb loops run j in range(3))
    j3 = jnp.arange(3)[None, None, :]
    has1 = j3 < jnp.minimum(n1, 3)[:, :, None]                  # [nsl, T, 3]
    has2 = j3 < jnp.minimum(n2, 3)[:, :, None]
    wr1 = jnp.where(has1, dc_b4[:, :, None] + j3, maxb)
    wr2 = jnp.where(has2, dc_b4[:, :, None] + n1[:, :, None] + j3, maxb)
    # times of the consumed transitions, straight off the times stream
    tj1 = times[:, :3 * T].reshape(nsl, T, 3)                   # [nsl, T, 3]
    tj2 = times[:, 27:27 + 3 * T].reshape(nsl, T, 3)

    post0 = stream[:, L_POST0]
    stat_ok = post0 == 0.0
    t_lc0 = stream[:, L_TLC0]
    t_lc1 = stream[:, L_TLC1]

    def buckets(tj, has, t_lc):
        val = tj - t_lc[:, None, None]
        bkt = jnp.floor((val - stat_leftbin) / stat_binwidth).astype(I32)
        return jnp.where(has & stat_ok[:, None, None],
                         jnp.clip(bkt, 0, 49), 50)

    hb = jnp.concatenate([buckets(tj1, has1, t_lc0),
                          buckets(tj2, has2, t_lc1)], axis=2)   # [nsl, T, 6]

    # midbit warnings (nrzi consume():193-194)
    t_lm0 = stream[:, L_TLM0]
    miss = ((has1 & (tj1 < t_lm0[:, None, None])) |
            (has2 & (tj2 < t_lm0[:, None, None]))) & \
        stat_ok[:, None, None]
    missed_midbits = jnp.sum(miss.astype(I32))

    # ---- zerocheck write indices (ops 6..8) ----
    i0 = jnp.where(later, jnp.maximum(dca - 1, 0), maxb)
    i1 = jnp.where(later, jnp.minimum(dca, maxb - 1), maxb)
    dcb = dca + later.astype(I32)
    i2 = jnp.where(zero, jnp.minimum(dcb, maxb - 1), maxb)

    wr = jnp.concatenate([wr1, wr2, i0[:, :, None], i1[:, :, None],
                          i2[:, :, None]], axis=2)              # [nsl, T, 9]

    # ---- replay (same key scheme as nrzi.nrzi_slot_scan) ----
    op_val = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 1, 0], I32)
    key = ((slot_i[:, None, None] * 16 + jnp.arange(9, dtype=I32)) * 2
           + op_val)
    trkb = jnp.broadcast_to(trk[None, :, None], (nsl, T, 9))
    packed = jnp.full((T, maxb), -1, I32).at[trkb, wr].max(
        jnp.broadcast_to(key, (nsl, T, 9)), mode="drop")
    bits = jnp.where(packed >= 0, packed & 1, 0).astype(jnp.int8)

    hist = jnp.zeros((T, 50), I32).at[
        jnp.broadcast_to(trk[None, :, None], hb.shape), hb].add(
            1, mode="drop")
    trksums = jnp.sum(((hb >= 1) & (hb <= 48)).astype(I32), axis=(0, 2))

    # ---- first/last bit times ----
    b0 = stream[:, L_B0]
    t_lc2 = stream[:, L_TLC2]
    tz = t_lc2 + b0                                             # [nsl]
    # last per track: zerocheck overrides consume within a slot. The
    # consume path's t_lastbit is the last WRITTEN transition (j < 3 per
    # round); the "later" action instead records lastpeak = the last SEEN
    # transition (kvis-1, which can be an unwritten 4th) -- the kernel's
    # lp row, streamed at lanes 54+t.
    lastpeak_t = times[:, 54:54 + T]                            # [nsl, T]
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
    first_z = zlike & ((dc_b4 + ncons - dup.astype(I32)) == 0)
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
