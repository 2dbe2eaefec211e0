"""NRZI decoder (7-track 200/556/800 BPI, 9-track 800 BPI).

NRZI has one *global* bit clock synchronized to transitions on any track
(decoder.h:260-264). The reference interleaves per-sample peak detection with
a per-bit "zerocheck" (decode_nrzi.c:232-314). Here the per-track transition
lists are fully precomputed (stage 1+2), and a single scan over *bit slots*
replays the global clock: each step consumes the transitions that became
visible (detection-ordered, like the C), appends their 1-bits, runs the
zerocheck branch logic, adjusts the clock, and advances.

Block postprocess (tapemark/noise/mismatch/CRC/LRC/parity,
decode_nrzi.c:35-113) is fully vectorized; the 9-track CRC recurrence is
GF(2)-linear, so it is evaluated as a gather over precomputed powers of its
transition matrix instead of a sequential loop.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import common as cm
from .common import F32, I32

BIG_S = np.int32(2 ** 30)          # s_det sentinel for unused slots
NEG_T = np.float32(-1e30)

# block-status codes (mirrors enum bstate_t, decoder.h:318-325)
BS_NONE, BS_TAPEMARK, BS_NOISE, BS_BADBLOCK, BS_BLOCK = 0, 1, 2, 3, 4


# ---------------------------------------------------------------------------
# CRC as a linear map: crc' = L(crc ^ frame); L = rotate-right-9 after the
# conditional 0xf0 flip (decode_nrzi.c:62-66). L is GF(2)-linear and
# invertible, so crc_final = XOR_i L^(n-i)(frame_i) ^ 0x1af.
# ---------------------------------------------------------------------------

def _crc_step_int(t: int) -> int:
    if t & 2:
        t ^= 0xF0
    lsb = t & 1
    t >>= 1
    if lsb:
        t |= 0x100
    return t


@lru_cache(None)
def _crc_power_table():
    """Masks for L^k, k in [0, cycle): out bit j = parity(x & mask[k][j])."""
    basis = [_crc_step_int(1 << b) for b in range(9)]   # L as columns

    def mat_from_cols(cols):
        # mask[j] = bits b where col b has bit j set
        masks = [0] * 9
        for b, c in enumerate(cols):
            for j in range(9):
                if (c >> j) & 1:
                    masks[j] |= 1 << b
        return masks

    def apply_mat(masks, x):
        out = 0
        for j in range(9):
            out |= (bin(x & masks[j]).count("1") & 1) << j
        return out

    ident = mat_from_cols([1 << b for b in range(9)])
    L = mat_from_cols(basis)
    tables = [ident]
    cur = L
    while cur != ident:
        tables.append(cur)
        cur = mat_from_cols([apply_mat(cur, _crc_step_int(1 << b))
                             for b in range(9)])
        if len(tables) > 4096:
            raise RuntimeError("CRC matrix cycle not found")
    return np.asarray(tables, np.int32)        # [cycle, 9]


def xor_fold(vals: jnp.ndarray) -> jnp.ndarray:
    """Log-depth XOR reduction (a lax.scan here would serialize thousands
    of trivial steps)."""
    n = vals.shape[0]
    m = 1
    while m < n:
        m *= 2
    v = jnp.concatenate([vals, jnp.zeros(m - n, vals.dtype)]) \
        if m != n else vals
    while m > 1:
        v = v[:m // 2] ^ v[m // 2:m]
        m //= 2
    return v[0]


def crc9_of_frames(frames: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """CRC over frames[0:n] (frames: int32 [M]). Vectorized."""
    table = jnp.asarray(_crc_power_table())    # [C, 9]
    C = table.shape[0]
    M = frames.shape[0]
    i = jnp.arange(M, dtype=I32)
    k = jnp.mod(n - i, C)                       # L^(n-i)
    masks = table[k]                            # [M, 9]
    contrib = cm.parity9(frames[:, None] & masks)       # [M, 9] bits
    bits = contrib << jnp.arange(9, dtype=I32)[None, :]
    per_frame = jnp.sum(bits, axis=-1).astype(I32)      # value of L^(n-i)(f)
    per_frame = jnp.where(i < n, per_frame, 0)
    return xor_fold(per_frame) ^ 0x1AF


def xor_reduce_masked(frames, keep):
    return xor_fold(jnp.where(keep, frames, 0))


# ---------------------------------------------------------------------------
# the global bit-slot scan
# ---------------------------------------------------------------------------

def nrzi_slot_scan(trans_s, trans_t, trans_agc, counts, S, spb,
                   clk_window, clk_alpha, pulse_adj, midbit,
                   expected_parity, do_correct,
                   maxb: int, max_slots: int,
                   stat_leftbin, stat_binwidth,
                   clk_ring: int = cm.CLKRATE_WINDOW,
                   debug: bool = False, adj_init=None,
                   stream_writes: bool = False):
    """One parmset lane. trans_*: [T, K] admitted transitions per track
    (s_det ascending, BIG_S fill). Returns the per-track bit buffers and the
    block-result scalars.

    adj_init=(n0 [T] f32, mean0 [T] f32) enables the -adjskew accumulators
    (decoder.c:128-173 peak_block_deviation): per track, the incremental
    f32 mean of (peaktime - bitspacing) over stat-recorded in-range peaks,
    SEEDED from the running value (the C resets it only in adjust_deskew,
    so tapemark/noise blocks roll their events into the next data block's
    average). Final values come back as adj_n / adj_mean (sample units)."""
    T, K = trans_s.shape
    trk = jnp.arange(T)

    any_trans = jnp.sum(counts) > 0
    first_k = jnp.argmin(trans_s[:, 0])        # earliest detection, low trk wins
    t_first = trans_t[first_k, 0]
    t_lastclock0 = t_first - spb
    midbit0 = t_lastclock0 + midbit * spb

    # bit-buffer writes stream out of the scan as (track, index) records and
    # reconstruct afterwards: in-carry [T, maxb] scatters force XLA to copy
    # the buffer every slot. All write VALUES are static per op position
    # (consume appends 1s; zerocheck writes 0,1,0), so only indices stream;
    # last-write-wins replay is a scatter-max of (slot*16+op)*2+val keys.
    # The -correct branch reads column 0, mirrored in a tiny bits0 carry.
    init = dict(
        t_lastclock=t_lastclock0,
        t_last_midbit=midbit0,
        clkavg=cm.clkavg_init(spb, clk_ring),
        post_counter=I32(0),
        kvis=jnp.zeros(T, I32),
        dc=jnp.zeros(T, I32),
        bits0=jnp.zeros(T, I32),
        t_firstbit=jnp.zeros(T, F32),
        t_lastbit=jnp.zeros(T, F32),
        missed_midbits=I32(0),
        corrected_bits=I32(0),
        faked_tracks=I32(0),
        consume_overflow=jnp.bool_(False),
        done=~any_trans,
        ended_by_post=jnp.bool_(False),
        end_s=I32(S),        # sample where the block ended (postamble idle)
    )
    if adj_init is not None:
        init["adj_n"] = adj_init[0].astype(F32)
        init["adj_mean"] = adj_init[1].astype(F32)

    def consume(st, s_z):
        """Append 1-bits for transitions with s_det < s_z (detection order);
        returns write/stat records plus midbit warnings and the post-area
        clock realignment (nrzi_addbit:171-175). The visible-count advance
        is 4 bounded compares, not a searchsorted: the reference consumes at
        most 3 transitions per slot; a 4th sets the overflow flag."""
        # per-index [T] gathers measure FASTER here than one batched
        # take_along_axis [T,4] gather (448 vs 387 ms/scan on the v5e)
        seen = [(trans_s[trk, jnp.minimum(st["kvis"] + j, K - 1)] < s_z) &
                (st["kvis"] + j < K) for j in range(4)]
        n_new = sum(s.astype(I32) for s in seen)
        dc = st["dc"]
        b = st["clkavg"]["t_bitspaceavg"]
        newmax_t = jnp.full(T, NEG_T)
        out = dict(st)
        wr, hb = [], []
        for j in range(3):
            has = seen[j]
            kj = jnp.minimum(st["kvis"] + j, K - 1)
            tj = trans_t[trk, kj]
            idx = jnp.where(has, jnp.minimum(dc + j, maxb - 1), maxb)
            wr.append(idx)
            out["bits0"] = jnp.where(idx == 0, 1, out["bits0"])
            # first/last bit times
            was_first = has & (dc + j == 0)
            out["t_firstbit"] = jnp.where(was_first, tj, out["t_firstbit"])
            out["t_lastbit"] = jnp.where(has, tj, out["t_lastbit"])
            newmax_t = jnp.where(has, jnp.maximum(newmax_t, tj), newmax_t)
            # midbit warning (nrzi_top/bot:189,204): peak before last midbit
            miss = has & (tj < st["t_last_midbit"]) & (st["post_counter"] == 0)
            out["missed_midbits"] = out["missed_midbits"] + jnp.sum(miss)
            # peak statistics (nrzi_top/bot:187,202). The block's very
            # FIRST transition is never recorded: the C's record check
            # runs before nrzi_addbit sets nrzi.datablock
            # (decode_nrzi.c:156-162), so the peak that seeds t_lastclock
            # sees datablock still false.
            stat_ok = (has & (st["post_counter"] == 0) &
                       ~((trk == first_k) & (kj == 0)))
            val = tj - st["t_lastclock"]
            # (int) cast truncates toward zero: a quotient in (-1, 0)
            # lands in bucket 0 WITH trksums (decoder.c:160)
            bkt = ((val - stat_leftbin) / stat_binwidth).astype(I32)
            # codes: computed bucket 0..49 counts toward peak_trksums
            # (record_peakstat's in-range branch, decoder.c:168-173);
            # out-of-range lands in the extreme buckets WITHOUT trksums
            # (52 -> bucket 0, 53 -> bucket 49); 50 = not recorded
            code = jnp.where(bkt < 0, 52, jnp.where(bkt > 49, 53, bkt))
            hb.append(jnp.where(stat_ok, code, 50))
            if adj_init is not None:
                # -adjskew block-deviation accumulator (decoder.c:169-173):
                # updated only for IN-RANGE buckets (the ++peak_trksums
                # branch), incremental mean in the C's expression order
                ok = stat_ok & (bkt >= 0) & (bkt < 50)
                n2 = out["adj_n"] + ok.astype(F32)
                out["adj_mean"] = jnp.where(
                    ok, out["adj_mean"] + ((val - b) - out["adj_mean"])
                    / jnp.maximum(n2, 1.0), out["adj_mean"])
                out["adj_n"] = n2
        out["dc"] = jnp.minimum(dc + n_new, maxb)
        out["kvis"] = jnp.minimum(st["kvis"] + n_new, K)
        out["consume_overflow"] = st["consume_overflow"] | jnp.any(seen[3])
        # post-area realignment by newly-seen 1 bits
        t_max = jnp.max(newmax_t)
        realign = ((st["post_counter"] > 0) & (t_max > NEG_T / 2) &
                   (st["t_lastclock"] < t_max - (2 - midbit) * b))
        out["t_lastclock"] = jnp.where(realign, t_max - 2 * b,
                                       st["t_lastclock"])
        return out, wr, hb

    def slot(st):
        def live(st):
            b0 = st["clkavg"]["t_bitspaceavg"]
            s_z0 = jnp.floor(st["t_lastclock"] + 2 * b0).astype(I32) + 1
            st, wr1, hb1 = consume(st, jnp.minimum(s_z0, S))
            # realignment may have pushed the boundary later: recompute once
            s_z = jnp.floor(st["t_lastclock"] + 2 * b0).astype(I32) + 1
            st, wr2, hb2 = consume(st, jnp.minimum(s_z, S))
            past_end = s_z >= S

            # ---- zerocheck (decode_nrzi.c:232-314) ----
            b = st["clkavg"]["t_bitspaceavg"]
            left = st["t_last_midbit"]
            right = st["t_lastclock"] + (1 + midbit) * b
            k = st["kvis"]
            lastpeak = jnp.where(k >= 1, trans_t[trk, jnp.maximum(k - 1, 0)], NEG_T)
            prevlast = jnp.where(k >= 2, trans_t[trk, jnp.maximum(k - 2, 0)], NEG_T)
            last_in = (lastpeak > left) & (lastpeak < right)
            prev_in = (prevlast > left) & (prevlast < right)

            dup = last_in & prev_in                      # noisy double peak
            b2 = (~last_in) & prev_in
            later = (~last_in) & (~prev_in) & (lastpeak > right)
            zero = (~last_in) & (~prev_in) & (~later)

            lcb = I32(-1)
            if stream_writes:
                # DEBUG-build last_complete_byte (decode_nrzi.c:258,262
                # under #define DEBUG true): the track loop leaves the
                # value from the HIGHEST track with a peak in the window --
                # datacount-1 after the dup deletion when the last peak is
                # in, else datacount-2 when only the previous peak is.
                # (Tracks on the "neither" branch never assign it.)
                cand = last_in | prev_in
                dc_postdup = jnp.where(dup, st["dc"] - 1, st["dc"])
                idx_t = jnp.where(last_in, dc_postdup - 1, dc_postdup - 2)
                hi_trk = (T - 1) - jnp.argmax(cand[::-1])
                lcb = jnp.where(jnp.any(cand), idx_t[hi_trk], -1)

            dc = st["dc"]
            bits0 = st["bits0"]
            # dup: delete the extra appended 1
            dc = jnp.where(dup, dc - 1, dc)
            # later: insert 0 before the (future) 1 just appended
            i0 = jnp.where(later, jnp.maximum(dc - 1, 0), maxb)
            bits0 = jnp.where(i0 == 0, 0, bits0)
            i1 = jnp.where(later, jnp.minimum(dc, maxb - 1), maxb)
            bits0 = jnp.where(i1 == 0, 1, bits0)
            dc = jnp.where(later, jnp.minimum(dc + 1, maxb), dc)
            # plain zero: append a 0
            i2 = jnp.where(zero, jnp.minimum(dc, maxb - 1), maxb)
            bits0 = jnp.where(i2 == 0, 0, bits0)
            dc = jnp.where(zero, jnp.minimum(dc + 1, maxb), dc)

            tz = st["t_lastclock"] + b                   # zero-bit time
            zlike = later | zero
            t_firstbit = jnp.where(zlike & (st["dc"] == 0) & (dc > st["dc"]),
                                   tz, st["t_firstbit"])
            t_lastbit = jnp.where(later, lastpeak,
                                  jnp.where(zero, tz, st["t_lastbit"]))

            numbits = jnp.sum((last_in | b2).astype(I32))
            numlater = jnp.sum(later.astype(I32))
            avg_pos = jnp.sum(jnp.where(last_in, lastpeak,
                                        jnp.where(b2, prevlast, 0.0)))
            post = st["post_counter"]
            clk = st["clkavg"]
            t_lc = st["t_lastclock"]
            have = numbits > 0

            # --- have-transitions path ---
            post_h = jnp.where(post == 1, 0, post)       # cancel a fresh post
            avg = avg_pos / jnp.maximum(numbits, 1).astype(F32)
            expected = t_lc + b
            adjusted = jnp.where(post_h > 0, avg,
                                 expected + pulse_adj * (avg - expected))
            delta = adjusted - t_lc
            clk_h = cm.adjust_clock(clk, delta, clk_window, clk_alpha, spb)
            clk_h = jax.tree.map(
                lambda n, o: jnp.where(post_h == 0, n, o), clk_h, clk)
            t_lc_h = adjusted
            post_h = jnp.where(post_h > 0, post_h + 1, post_h)

            # --- no-transitions path ---
            post_n = jnp.where((numlater == 0) & (post == 0), 1,
                               jnp.where(post > 0, post + 1, post))
            t_lc_n = t_lc + b

            post2 = jnp.where(have, post_h, post_n)
            t_lc2 = jnp.where(have, t_lc_h, t_lc_n)
            clk2 = jax.tree.map(lambda hn, nn: jnp.where(have, hn, nn),
                                clk_h, clk)

            # --- optional error correction (release-binary semantics:
            # last_complete_byte is 0 outside DEBUG builds; readtape.c
            # nrzi_zerocheck:245,302) ---
            corrected = st["corrected_bits"]
            faked = st["faked_tracks"]
            fix_trk = jnp.int32(T)
            fix_val = jnp.int32(0)
            if do_correct:
                frame0 = jnp.sum(bits0.astype(I32) <<
                                 (T - 1 - trk)).astype(I32)
                par_bad = cm.parity9(frame0) != expected_parity
                agc_now = jnp.where(k >= 1,
                                    trans_agc[trk, jnp.maximum(k - 1, 0)],
                                    1.0)
                hi = jnp.max(agc_now)
                badtrk = jnp.argmax(agc_now)
                next_hi = jnp.max(agc_now.at[badtrk].set(-1.0))
                do_fix = have & par_bad & (hi >= cm.NRZI_BADTRK_FACTOR * next_hi)
                fix_trk = jnp.where(do_fix, badtrk, T).astype(I32)
                fix_val = bits0[badtrk] ^ 1
                bits0 = bits0.at[fix_trk].set(fix_val, mode="drop")
                corrected = corrected + do_fix.astype(I32)
                faked = faked | jnp.where(
                    do_fix, (1 << (T - 1 - badtrk)).astype(I32), 0)

            out = dict(st)
            out.update(bits0=bits0, dc=dc, t_firstbit=t_firstbit,
                       t_lastbit=t_lastbit, post_counter=post2,
                       t_lastclock=t_lc2, t_last_midbit=right, clkavg=clk2,
                       corrected_bits=corrected, faked_tracks=faked)
            ended = post2 >= 8
            out["ended_by_post"] = st["ended_by_post"] | ended
            out["done"] = out["done"] | ended | past_end
            # where scanning stopped: the next block's decode resumes here
            # (the reference's readblock returns and the driver re-enters
            # at the current sample, readtape.c:1720-1882)
            out["end_s"] = jnp.where(ended, jnp.minimum(s_z, S), st["end_s"])
            rec = dict(wr=jnp.stack(wr1 + wr2 + [i0, i1, i2], axis=-1),
                       hb=jnp.stack(hb1 + hb2, axis=-1),
                       fix_trk=fix_trk, fix_val=fix_val)
            if stream_writes:
                agc_now_s = jnp.where(
                    k >= 1, trans_agc[trk, jnp.maximum(k - 1, 0)], 1.0)
                rec.update(lcb=lcb, agc=agc_now_s, have=have)
            if debug:
                # per-slot events for the -trace avgpos/zerchk lanes
                rec.update(dbg_zc=jnp.minimum(s_z, S).astype(F32),
                           dbg_avgpos=jnp.where(have, adjusted, F32(0.0)),
                           dbg_live=jnp.bool_(True))
            return out, rec

        new, rec = live(st)
        d = st["done"]
        st2 = jax.tree.map(lambda o, n: jnp.where(d, o, n), st, new)
        rec2 = dict(wr=jnp.where(d, maxb, rec["wr"]),
                    hb=jnp.where(d, 50, rec["hb"]),
                    fix_trk=jnp.where(d, T, rec["fix_trk"]),
                    fix_val=rec["fix_val"])
        if stream_writes:
            rec2.update(lcb=jnp.where(d, -1, rec["lcb"]), agc=rec["agc"],
                        have=jnp.where(d, False, rec["have"]))
        if debug:
            rec2.update(dbg_zc=jnp.where(d, F32(0.0), rec["dbg_zc"]),
                        dbg_avgpos=jnp.where(d, F32(0.0),
                                             rec["dbg_avgpos"]),
                        dbg_live=~d)
        return st2, rec2

    # chunked early exit: stop scanning at the first chunk boundary after
    # the block ends (postamble counter or past segment end). Dead chunks'
    # output rows are inert (wr=maxb, hb=50, fix_trk=T).
    CH = max(1, min(256, max_slots))
    nchunks = -(-max_slots // CH)
    dead = dict(init)
    dead["done"] = jnp.bool_(True)
    _, dead_rec = slot(dead)
    bufs = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (nchunks * CH,) + jnp.shape(x)),
        dead_rec)

    def cond(c):
        st, k, _ = c
        return (~st["done"]) & (k < nchunks)

    def body(c):
        st, k, bufs = c
        st2, recs = jax.lax.scan(lambda s, _: slot(s), st, None, length=CH)
        bufs2 = jax.tree.map(
            lambda b, o: jax.lax.dynamic_update_slice(
                b, o.astype(b.dtype), (k * CH,) + (0,) * (b.ndim - 1)),
            bufs, recs)
        return (st2, k + 1, bufs2)

    final, _, recs = jax.lax.while_loop(cond, body, (init, I32(0), bufs))
    max_slots = nchunks * CH

    # ---- replay the streamed writes (vectorized) ----
    nsl = max_slots
    slot_i = jnp.arange(nsl, dtype=I32)
    # op order within a slot = program order; value per op is static:
    # consume x6 append 1, zerocheck i0/i1/i2 write 0/1/0, fix is op 15
    op_val = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 1, 0], I32)
    key = ((slot_i[:, None, None] * 16 + jnp.arange(9, dtype=I32)) * 2
           + op_val)                                     # [nsl, 1, 9] -> bcast
    trkb = jnp.broadcast_to(trk[None, :, None], (nsl, T, 9))
    packed = jnp.full((T, maxb), -1, I32).at[trkb, recs["wr"]].max(
        jnp.broadcast_to(key, (nsl, T, 9)), mode="drop")
    fix_key = (slot_i * 16 + 15) * 2 + recs["fix_val"]
    packed = packed.at[recs["fix_trk"],
                       jnp.zeros(nsl, I32)].max(fix_key, mode="drop")
    final["bits"] = jnp.where(packed >= 0, packed & 1, 0).astype(jnp.int8)

    hb = recs["hb"]                                      # [nsl, T, 6]
    hb2 = jnp.where(hb == 52, 0, jnp.where(hb == 53, 49, hb))
    final["hist"] = jnp.zeros((T, 50), I32).at[
        jnp.broadcast_to(trk[None, :, None], hb.shape), hb2].add(
            1, mode="drop")
    final["trksums"] = jnp.sum((hb <= 49).astype(I32), axis=(0, 2))
    if stream_writes:
        # the DEBUG-variant -correct host replay re-derives data[] slot by
        # slot from these (pipeline._nrzi_correctdbg path)
        final["rec_wr"] = recs["wr"]
        final["rec_lcb"] = recs["lcb"]
        final["rec_agc"] = recs["agc"]
        final["rec_have"] = recs["have"]
    if debug:
        final["dbg_zc"] = recs["dbg_zc"]
        final["dbg_avgpos"] = recs["dbg_avgpos"]
        final["dbg_live"] = recs["dbg_live"]
        # which slot finalized each column (for the parerr lane): the
        # replay key holds slot*16+op; recover the slot of the winning
        # write per (track, column)
        final["dbg_col_slot"] = jnp.where(packed >= 0, (packed // 2) // 16,
                                          -1)
    return final


# ---------------------------------------------------------------------------
# end-of-block processing (nrzi_end_of_block + nrzi_postprocess)
# ---------------------------------------------------------------------------

def nrzi_finish(st, ntrks: int, expected_parity, revparity, maxb: int):
    """Vectorized block classification + CRC/LRC/parity checks for one lane.
    Returns a dict of results_t-like fields plus the frame array."""
    T = ntrks
    trk = jnp.arange(T)
    dc = st["dc"]
    minbits = jnp.min(dc)
    maxbits = jnp.max(dc)
    started = jnp.sum(st["kvis"]) > 0

    spacing = (st["t_lastbit"] - st["t_firstbit"]) / jnp.maximum(dc, 1).astype(F32)
    avg_bit_spacing = jnp.mean(spacing)

    frames = jnp.sum(st["bits"].astype(I32) <<
                     (T - 1 - trk)[:, None], axis=0)      # [maxb]

    if T == 9:
        is_tm = (minbits == 9) & (frames[0] == 0x26) & (frames[8] == 0x26)
    else:
        is_tm = ((minbits == 9) & (frames[0] == 0x1E) &
                 ((frames[3] == 0x1E) | (frames[4] == 0x1E)))
    is_noise = (~is_tm) & (maxbits <= cm.NRZI_MIN_BLOCK)
    mismatch = maxbits - minbits
    is_bad = (~is_tm) & (~is_noise) & (mismatch > cm.NRZI_MAX_MISMATCH)
    is_block = (~is_tm) & (~is_noise) & (~is_bad)

    # postprocess (decode_nrzi.c:35-75): strip the 8 post frames
    has_post = minbits > 8
    n = jnp.maximum(minbits - 8, 0)
    idx = jnp.arange(maxb, dtype=I32)
    keep = idx < n

    exp_par = jnp.where((revparity > 0) & (maxbits - 8 == revparity),
                        1 - expected_parity, expected_parity)
    par = cm.parity9(frames)
    vparity_errs = jnp.sum(jnp.where(keep & is_block & has_post,
                                     (par != exp_par).astype(I32), 0))
    lrc_data = xor_reduce_masked(frames, keep)
    crc_errs = jnp.int32(0)
    lrc_errs = jnp.int32(0)
    stored_crc = jnp.int32(0)
    stored_lrc = jnp.int32(0)
    if T == 9:
        crc_calc = crc9_of_frames(frames, n)
        mb = jnp.maximum(minbits, 9)
        stored_crc = frames[mb - 6] | frames[mb - 5] | frames[mb - 4]
        stored_lrc = frames[mb - 1]
        lrc_calc = lrc_data ^ crc_calc
        crc_errs = (is_block & has_post & (crc_calc != stored_crc)).astype(I32)
        lrc_errs = (is_block & has_post & (lrc_calc != stored_lrc)).astype(I32)
    else:
        mb = jnp.maximum(minbits, 9)
        stored_lrc = frames[mb - 6] | frames[mb - 5] | frames[mb - 4]
        lrc_errs = (is_block & has_post & (lrc_data != stored_lrc)).astype(I32)

    blktype = jnp.where(~started, BS_NONE,
               jnp.where(is_tm, BS_TAPEMARK,
                jnp.where(is_noise, BS_NOISE,
                 jnp.where(is_bad, BS_BADBLOCK, BS_BLOCK))))
    out_min = jnp.where(is_block & has_post, minbits - 8, minbits)
    out_max = jnp.where(is_block & has_post, maxbits - 8, maxbits)

    errcount = (jnp.where(is_bad, mismatch, 0) + vparity_errs +
                crc_errs + lrc_errs)
    warncount = st["missed_midbits"] + st["corrected_bits"]

    return dict(
        blktype=blktype, minbits=out_min, maxbits=out_max,
        track_mismatch=jnp.where(is_bad, mismatch, 0),
        vparity_errs=vparity_errs, crc_errs=crc_errs, lrc_errs=lrc_errs,
        stored_crc=stored_crc, stored_lrc=stored_lrc,
        errcount=errcount, warncount=warncount,
        missed_midbits=st["missed_midbits"],
        corrected_bits=st["corrected_bits"],
        faked_tracks=st["faked_tracks"],
        avg_bit_spacing=avg_bit_spacing,
        frames=frames,
        hist=st["hist"], trksums=st["trksums"],
        consume_overflow=st["consume_overflow"],
    )


def correct_debug_replay(wr, lcb, agc, have, T: int, maxb: int,
                         expected_parity: int):
    """Host replay of the DEBUG-build ``-correct`` chain
    (decode_nrzi.c:232-314 compiled with ``#define DEBUG true``): the
    parity check reads data[last_complete_byte] AT SLOT TIME, where
    last_complete_byte is the index left by the highest track with a peak
    in the zerocheck window -- so the data array must be rebuilt write by
    write. Corrections feed back into later parity checks (a flipped bit
    stays flipped unless a later write overwrites it), so this is a
    sequential host pass over the streamed per-slot write records.

    wr: [nsl, T, 9] int write indices (maxb = no write), ops in program
    order with static values (1,1,1,1,1,1,0,1,0); lcb: [nsl]; agc: [nsl,
    T]; have: [nsl] bool. Returns (bits [T, maxb] int8, corrected_bits,
    faked_tracks)."""
    op_val = np.asarray([1, 1, 1, 1, 1, 1, 0, 1, 0], np.int8)
    bits = np.zeros((T, maxb + 1), np.int8)       # col maxb = drop target
    trkr = np.arange(T)
    corrected = 0
    faked = 0
    # past the last live slot nothing is written or checked
    live = have | (wr < maxb).any(axis=(1, 2))
    lastn = int(np.max(np.nonzero(live)[0])) + 1 if live.any() else 0
    for n in range(lastn):
        w = wr[n]
        for j in range(9):
            bits[trkr, np.minimum(w[:, j], maxb)] = op_val[j]
        c = int(lcb[n])
        if have[n] and 0 <= c < maxb:
            if (int(bits[:T, c].sum()) & 1) != expected_parity:
                a = agc[n]
                b_i = int(np.argmax(a))
                hi = float(a[b_i])
                rest = np.delete(a, b_i)
                next_hi = float(rest.max()) if rest.size else 0.0
                if hi >= cm.NRZI_BADTRK_FACTOR * next_hi:
                    bits[b_i, c] ^= 1
                    corrected += 1
                    faked |= 1 << (T - 1 - b_i)
    return bits[:, :maxb], corrected, faked
