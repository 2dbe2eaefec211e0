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
    # XOR-reduce
    def body(c, x):
        return c ^ x, None
    out, _ = jax.lax.scan(body, jnp.int32(0), per_frame)
    return out ^ 0x1AF


def xor_reduce_masked(frames, keep):
    vals = jnp.where(keep, frames, 0)
    def body(c, x):
        return c ^ x, None
    out, _ = jax.lax.scan(body, jnp.int32(0), vals)
    return out


# ---------------------------------------------------------------------------
# the global bit-slot scan
# ---------------------------------------------------------------------------

def nrzi_slot_scan(trans_s, trans_t, trans_agc, counts, S, spb,
                   clk_window, clk_alpha, pulse_adj, midbit,
                   expected_parity, do_correct,
                   maxb: int, max_slots: int,
                   stat_leftbin, stat_binwidth,
                   clk_ring: int = cm.CLKRATE_WINDOW,
                   consume_cap: int = 12):
    """One parmset lane. trans_*: [T, K] admitted transitions per track
    (s_det ascending, BIG_S fill). Returns the per-track bit buffers and the
    block-result scalars.

    The per-track transition lists are merged into ONE time-sorted stream
    before the scan: the consume step then reads the next `consume_cap`
    events with a single contiguous dynamic_slice and does all per-track
    bookkeeping (append ranks, last/previous peak per track) as dense
    [C, T] one-hot algebra -- no per-index gathers in the loop body, which
    were ~10 scattered-gather kernels per slot and dominated the step."""
    T, K = trans_s.shape
    C = consume_cap
    trk = jnp.arange(T)

    # merged stream, stably sorted by detection sample so each track's
    # per-call consume set is exactly a prefix split; pad so the in-loop
    # slice of C+1 never clips
    flat_s = jnp.concatenate([trans_s.reshape(-1),
                              jnp.full(C + 1, BIG_S, I32)])
    flat_t = jnp.concatenate([trans_t.reshape(-1), jnp.zeros(C + 1, F32)])
    flat_a = jnp.concatenate([trans_agc.reshape(-1), jnp.ones(C + 1, F32)])
    flat_k = jnp.concatenate([
        jnp.broadcast_to(trk[:, None], (T, K)).reshape(-1).astype(I32),
        jnp.full(C + 1, T, I32)])
    m_s, m_t, m_a, m_k = jax.lax.sort(
        (flat_s, flat_t, flat_a, flat_k), num_keys=1, is_stable=True)

    any_trans = jnp.sum(counts) > 0
    t_first = m_t[0]                   # earliest detection, low trk wins
    t_lastclock0 = t_first - spb
    midbit0 = t_lastclock0 + midbit * spb

    # bit-buffer writes stream out of the scan as (track, index) records and
    # reconstruct afterwards: in-carry [T, maxb] scatters force XLA to copy
    # the buffer every slot. All write VALUES are static per op position
    # (consume appends 1s; zerocheck writes 0,1,0), so only indices stream;
    # last-write-wins replay is a scatter-max of (slot*OPS+op)*2+val keys.
    # The -correct branch reads column 0, mirrored in a tiny bits0 carry.
    init = dict(
        t_lastclock=t_lastclock0,
        t_last_midbit=midbit0,
        clkavg=cm.clkavg_init(spb, clk_ring),
        post_counter=I32(0),
        m=I32(0),
        dc=jnp.zeros(T, I32),
        bits0=jnp.zeros(T, I32),
        lastpeak=jnp.full(T, NEG_T, F32),
        prevlast=jnp.full(T, NEG_T, F32),
        last_agc=jnp.ones(T, F32),
        t_firstbit=jnp.zeros(T, F32),
        t_lastbit=jnp.zeros(T, F32),
        missed_midbits=I32(0),
        corrected_bits=I32(0),
        faked_tracks=I32(0),
        consume_overflow=jnp.bool_(False),
        done=~any_trans,
        ended_by_post=jnp.bool_(False),
    )

    def consume(st, s_z):
        """Consume merged events with s_det < s_z (detection order): append
        their 1-bits, update per-track last/previous peak, count midbit
        warnings and peak stats, and apply the post-area clock realignment
        (nrzi_addbit:171-175). Returns (state, entry records)."""
        sl_s = jax.lax.dynamic_slice(m_s, (st["m"],), (C + 1,))
        sl_t = jax.lax.dynamic_slice(m_t, (st["m"],), (C + 1,))[:C]
        sl_k = jax.lax.dynamic_slice(m_k, (st["m"],), (C + 1,))[:C]
        take = sl_s[:C] < s_z                       # sorted -> prefix mask
        n_new = jnp.sum(take.astype(I32))
        onehot = (sl_k[:, None] == trk[None, :]) & take[:, None]   # [C, T]
        oh = onehot.astype(I32)
        cnt_t = jnp.sum(oh, axis=0)                 # consumed per track [T]
        rank = jnp.cumsum(oh, axis=0) - 1           # rank within track
        rank_e = jnp.sum(rank * oh, axis=1)         # [C]
        dc = st["dc"]
        dc_e = jnp.sum(dc[None, :] * oh, axis=1)    # dc[trk_e]
        wr_idx = jnp.where(take, jnp.minimum(dc_e + rank_e, maxb - 1), maxb)

        out = dict(st)
        ohf = onehot.astype(F32)
        # bits0 mirror + first/last bit times per track
        hit0 = jnp.any(onehot & (wr_idx == 0)[:, None], axis=0)
        out["bits0"] = jnp.where(hit0, 1, st["bits0"])
        was_first = onehot & ((dc_e + rank_e) == 0)[:, None]
        out["t_firstbit"] = jnp.where(
            jnp.any(was_first, axis=0),
            jnp.sum(was_first.astype(F32) * sl_t[:, None], axis=0),
            st["t_firstbit"])
        is_last = onehot & (rank == (cnt_t - 1)[None, :])
        last_t = jnp.sum(is_last.astype(F32) * sl_t[:, None], axis=0)
        has = cnt_t > 0
        out["t_lastbit"] = jnp.where(has, last_t, st["t_lastbit"])
        # last/previous consumed peak per track (zerocheck inputs)
        is_2nd = onehot & (rank == (cnt_t - 2)[None, :])
        snd_t = jnp.sum(is_2nd.astype(F32) * sl_t[:, None], axis=0)
        out["prevlast"] = jnp.where(cnt_t >= 2, snd_t,
                                    jnp.where(cnt_t == 1, st["lastpeak"],
                                              st["prevlast"]))
        out["lastpeak"] = jnp.where(has, last_t, st["lastpeak"])
        if do_correct:
            sl_a = jax.lax.dynamic_slice(m_a, (st["m"],), (C + 1,))[:C]
            out["last_agc"] = jnp.where(
                has, jnp.sum(is_last.astype(F32) * sl_a[:, None], axis=0),
                st["last_agc"])
        # midbit warning (nrzi_top/bot:189,204): peak before last midbit
        quiet = st["post_counter"] == 0
        miss = take & (sl_t < st["t_last_midbit"]) & quiet
        out["missed_midbits"] = st["missed_midbits"] + jnp.sum(miss)
        # peak statistics (nrzi_top/bot:187,202)
        val = sl_t - st["t_lastclock"]
        bkt = jnp.floor((val - stat_leftbin) / stat_binwidth).astype(I32)
        hb = jnp.where(take & quiet, jnp.clip(bkt, 0, 49), 50)
        out["dc"] = jnp.minimum(dc + cnt_t, maxb)
        out["m"] = st["m"] + n_new
        out["consume_overflow"] = st["consume_overflow"] | (
            (n_new == C) & (sl_s[C] < s_z))
        # post-area realignment by newly-seen 1 bits
        b = st["clkavg"]["t_bitspaceavg"]
        t_max = jnp.max(jnp.where(take, sl_t, NEG_T))
        realign = ((st["post_counter"] > 0) & (n_new > 0) &
                   (st["t_lastclock"] < t_max - (2 - midbit) * b))
        out["t_lastclock"] = jnp.where(realign, t_max - 2 * b,
                                       st["t_lastclock"])
        rec = dict(e_trk=jnp.where(take, sl_k, T),
                   e_wr=wr_idx, e_hb=hb)
        return out, rec

    def slot(st):
        def live(st):
            b0 = st["clkavg"]["t_bitspaceavg"]
            s_z0 = jnp.floor(st["t_lastclock"] + 2 * b0).astype(I32) + 1
            st, rec1 = consume(st, jnp.minimum(s_z0, S))
            # realignment may have pushed the boundary later: recompute once
            s_z = jnp.floor(st["t_lastclock"] + 2 * b0).astype(I32) + 1
            st, rec2 = consume(st, jnp.minimum(s_z, S))
            past_end = s_z >= S

            # ---- zerocheck (decode_nrzi.c:232-314) ----
            b = st["clkavg"]["t_bitspaceavg"]
            left = st["t_last_midbit"]
            right = st["t_lastclock"] + (1 + midbit) * b
            lastpeak = st["lastpeak"]
            prevlast = st["prevlast"]
            last_in = (lastpeak > left) & (lastpeak < right)
            prev_in = (prevlast > left) & (prevlast < right)

            dup = last_in & prev_in                      # noisy double peak
            b2 = (~last_in) & prev_in
            later = (~last_in) & (~prev_in) & (lastpeak > right)
            zero = (~last_in) & (~prev_in) & (~later)

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
                agc_now = st["last_agc"]
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
            rec = dict(e_trk=jnp.concatenate([rec1["e_trk"], rec2["e_trk"]]),
                       e_wr=jnp.concatenate([rec1["e_wr"], rec2["e_wr"]]),
                       e_hb=jnp.concatenate([rec1["e_hb"], rec2["e_hb"]]),
                       z_wr=jnp.stack([i0, i1, i2], axis=-1),
                       fix_trk=fix_trk, fix_val=fix_val)
            return out, rec

        new, rec = live(st)
        d = st["done"]
        st2 = jax.tree.map(lambda o, n: jnp.where(d, o, n), st, new)
        rec = dict(e_trk=jnp.where(d, T, rec["e_trk"]),
                   e_wr=jnp.where(d, maxb, rec["e_wr"]),
                   e_hb=jnp.where(d, 50, rec["e_hb"]),
                   z_wr=jnp.where(d, maxb, rec["z_wr"]),
                   fix_trk=jnp.where(d, T, rec["fix_trk"]),
                   fix_val=rec["fix_val"])
        return st2, rec

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
    # 2C consume appends write 1, zerocheck i0/i1/i2 write 0/1/0, the
    # -correct fix (op 2C+3) writes its own recorded value
    OPS = 2 * C + 4
    e_op = jnp.arange(2 * C, dtype=I32)
    e_key = (slot_i[:, None] * OPS + e_op[None, :]) * 2 + 1   # [nsl, 2C]
    packed = jnp.full((T, maxb), -1, I32).at[
        recs["e_trk"], recs["e_wr"]].max(e_key, mode="drop")
    z_val = jnp.asarray([0, 1, 0], I32)
    z_key = ((slot_i[:, None, None] * OPS + 2 * C +
              jnp.arange(3, dtype=I32)) * 2 + z_val)          # [nsl, 1, 3]
    trkb = jnp.broadcast_to(trk[None, :, None], (nsl, T, 3))
    packed = packed.at[trkb, recs["z_wr"]].max(
        jnp.broadcast_to(z_key, (nsl, T, 3)), mode="drop")
    fix_key = (slot_i * OPS + 2 * C + 3) * 2 + recs["fix_val"]
    packed = packed.at[recs["fix_trk"],
                       jnp.zeros(nsl, I32)].max(fix_key, mode="drop")
    final["bits"] = jnp.where(packed >= 0, packed & 1, 0).astype(jnp.int8)

    final["hist"] = jnp.zeros((T, 50), I32).at[
        recs["e_trk"], recs["e_hb"]].add(1, mode="drop")
    final["trksums"] = jnp.sum(final["hist"][:, 1:49], axis=1)
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
    started = st["m"] > 0

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
