"""GCR decoder (9-track "6250 BPI" = 9042 frpi group-coded recording).

Per-track, GCR is NRZI with guaranteed <=2 consecutive zeros, so each track
self-clocks: zero bits are inferred from the delta between flux transitions
against the z1pt/z2pt thresholds, with pulse adjustment and clock tracking on
runs of three consecutive ones, and resync (MARK2...MARK1) bursts force the
clock (decode_gcr.c:731-865). This all fuses into the per-track jump scan.

Block-level, the storage bits decode through a state machine over 5-bit
storage groups (preamble / data A-B pairs / resync / residual / CRC /
postamble) with 5->4 group decode, parity, ECC checks and optional
ECC-based correction (decode_gcr.c:420-729). That runs as a scan over
*groups* (bits/5 steps), vmapped over the parmset axis.

The -zeros variants (zero-crossing detection, plain and differentiated) are
data-parallel: crossings and excursion checks involve no AGC feedback
(decoder.c:501 disables AGC when find_zeros), so transitions extract without
any sequential admission at all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import common as cm
from . import gcr_tables as gt
from . import trackscan as ts
from .common import F32, I32
from .nrzi import BS_BADBLOCK, BS_BLOCK, BS_NOISE, BS_TAPEMARK

ZEROCROSS_PEAK = 0.2
ZEROCROSS_SLOPE = 1.5


# ---------------------------------------------------------------------------
# per-track bit recovery: shared step used by both the peaks jump scan and
# the zerocross transition scan
# ---------------------------------------------------------------------------

def gcr_bit_step(st, admit, t_this, z1pt, z2pt, pulse_adj_parm,
                 clk_window, clk_alpha, spb, maxb):
    """gcr_checkzeros + gcr_addbit for one admitted transition
    (decode_gcr.c:731-834). Bit writes stream out as (index) records (values
    are static per write position: inferred 0, 0, then the 1) and replay
    after the scan; the 3-consecutive-ones clock test reads the last bits
    from the lastbits pattern register instead of the buffer. Returns
    (state, wr) where wr is the list of 3 write indices (maxb = none)."""
    b = st["clkavg"]["t_bitspaceavg"]
    delta = t_this - st["t_lastpeak"]
    in_blk = admit & st["datablock"]

    zero1 = in_blk & (delta - st["t_pulse_adj"] > z1pt * b)
    zero2 = zero1 & (delta - st["t_pulse_adj"] > z2pt * b)
    numbits = 1 + zero1.astype(I32) + zero2.astype(I32)

    dc = st["datacount"]
    lastbits = st["lastbits"]
    rsc = st["resync_bitcount"]
    clkavg = st["clkavg"]
    t_peakdelta_new = jnp.where(in_blk, delta, st["t_peakdelta"])
    wr = []

    def add_one_bit(carry, bitval, enable):
        """One gcr_addbit (decode_gcr.c:731-787): write, shift the pattern
        register, resync detection at 5-bit boundaries, and the mid-resync
        force_clock."""
        dc_, lastbits_, rsc_, clkavg_ = carry
        wr.append(jnp.where(enable, jnp.minimum(dc_, maxb - 1), maxb))
        dc_n = jnp.where(enable, jnp.minimum(dc_ + 1, maxb), dc_)
        lb_n = jnp.where(enable, ((lastbits_ << 1) | bitval) & 0xFF,
                         lastbits_)
        at5 = enable & ((dc_n % 5) == 0)
        rsc_ = jnp.where(at5 & ((lb_n & 0x1F) == gt.GCR_MARK2), 1,
                jnp.where(at5 & ((lb_n & 0x1F) == gt.GCR_MARK1) & (rsc_ > 0),
                          0, rsc_))
        in_resync = enable & (rsc_ > 0)
        force = in_resync & (rsc_ == 5)
        clkavg_ = jax.tree.map(
            lambda n, o: jnp.where(force, n, o),
            cm.force_clock(clkavg_, t_peakdelta_new), clkavg_)
        rsc_ = jnp.where(in_resync, rsc_ + 1, rsc_)
        return (dc_n, lb_n, rsc_, clkavg_)

    carry = (dc, lastbits, rsc, clkavg)
    carry = add_one_bit(carry, 0, zero1 & admit)
    carry = add_one_bit(carry, 0, zero2 & admit)
    dc1, lastbits, rsc, clkavg = carry

    # clock adjust on 3 consecutive one-bits (decode_gcr.c:808-810), using
    # the previous peak delta; checked before the current 1-bit is added.
    # bits[dc1-2] == bit 1 of the pattern register (LSB = last written)
    prev2 = jnp.where(dc1 >= 2, (lastbits >> 1) & 1, 0)
    do_adj = in_blk & (dc1 > 3) & (numbits == 1) & (prev2 == 1)
    clk_new = cm.adjust_clock(clkavg, st["t_peakdelta"],
                              clk_window, clk_alpha, spb)
    clkavg = jax.tree.map(lambda n, o: jnp.where(do_adj, n, o),
                          clk_new, clkavg)
    t_pulse_adj = jnp.where(
        in_blk, pulse_adj_parm * (numbits.astype(F32) * clkavg["t_bitspaceavg"]
                                  - delta),
        st["t_pulse_adj"])

    carry = (dc1, lastbits, rsc, clkavg)
    dc2, lastbits, rsc, clkavg = add_one_bit(carry, 1, admit)

    out = dict(st)
    out["datacount"] = dc2
    out["lastbits"] = lastbits
    out["resync_bitcount"] = rsc
    out["clkavg"] = clkavg
    out["t_pulse_adj"] = t_pulse_adj
    out["t_peakdeltaprev"] = jnp.where(in_blk, st["t_peakdelta"],
                                       st["t_peakdeltaprev"])
    out["t_peakdelta"] = jnp.where(in_blk, delta, st["t_peakdelta"])
    out["datablock"] = st["datablock"] | admit
    out["t_firstbit"] = jnp.where(admit & (st["datacount"] == 0), t_this,
                                  st["t_firstbit"])
    out["t_lastbit"] = jnp.where(admit, t_this, st["t_lastbit"])
    out["t_lastpeak"] = jnp.where(admit, t_this, st["t_lastpeak"])
    return out, wr


GCR_WR_VALS = np.asarray([0, 0, 1], np.int8)   # inferred zeros, then the 1


def gcr_replay_bits(wr: jnp.ndarray, maxb: int) -> jnp.ndarray:
    """Scatter streamed write records [nsteps, 3] into the bit buffer
    (indices are unique and monotonic; values are static per position)."""
    nst = wr.shape[0]
    vals = jnp.broadcast_to(jnp.asarray(GCR_WR_VALS), (nst, 3))
    return jnp.zeros(maxb, jnp.int8).at[wr].set(vals, mode="drop")


def gcr_bit_state_init(spb, maxb, clk_ring: int = cm.CLKRATE_WINDOW):
    return dict(
        clkavg=cm.clkavg_init(spb, clk_ring),
        t_pulse_adj=F32(0.0),
        t_peakdelta=F32(0.0),
        t_peakdeltaprev=F32(0.0),
        datablock=jnp.bool_(False),
        datacount=I32(0),
        lastbits=I32(0),
        resync_bitcount=I32(0),
        t_firstbit=F32(0.0),
        t_lastbit=F32(0.0),
        t_lastpeak=F32(0.0),
    )


def gcr_idle_entry_sample(t_lp, thr, s_floor):
    """First integer sample s >= s_floor where f32(s) > t_lp + thr --
    the reference's per-sample GCR idle check (decoder.c:879-880:
    timenow > t_lastpeak + GCR_IDLE_THRESH * bitspaceavg), with its exact
    comparison form (threshold added to the peak time, unlike PE's
    subtracted-gap form)."""
    x = t_lp + thr
    c = jnp.floor(x).astype(I32)
    offs = c - 1 + jnp.arange(4, dtype=I32)
    pred = offs.astype(F32) > x
    e = jnp.where(jnp.any(pred), c - 1 + jnp.argmax(pred), c + 2)
    return jnp.maximum(e, s_floor)


@partial(jax.jit, static_argnames=("S", "nsteps", "maxb", "clk_ring",
                                    "agc_ring", "pre", "debug_peaks",
                                    "idle_out"))
def gcr_track_scan(v_trk, nxt_trk, W, S: int, nsteps: int,
                   rise_parm, min_parm, agc_alpha, agc_window,
                   clk_window, clk_alpha, z1pt, z2pt, pulse_adj_parm,
                   spb, maxb: int,
                   stat_leftbin=jnp.float32(0.0),
                   stat_binwidth=jnp.float32(1.0),
                   clk_ring: int = cm.CLKRATE_WINDOW,
                   agc_ring: int = cm.AGC_MAX_WINDOW,
                   pre: bool = False, debug_peaks: bool = False,
                   idle_out: bool = False, s_first_check=I32(0)):
    """Peak-detection GCR lane: admission + AGC + bit recovery fused.
    With pre=True the first argument is the precomputed [10, S] feature
    pack for this lane's (static) window width.

    idle_out=True additionally models the reference's mid-scan track
    idle (decoder.c:879-888): when a datablock track sees no peaks for
    GCR_IDLE_THRESH bit times its datablock flag drops (so the wake peak
    skips zero-inference and re-seeds the block, gcr_addbit:749-753),
    idle-entry intervals stream out for the cross-track all-idle point,
    and the raw per-step records are returned (final["_st_*"]) instead of
    being replayed, so the caller can truncate at tau (gcr_apply_tau)."""

    def extra(st2, st, ev, admit_top, admit_bot, t_peak, s):
        admit = admit_top | admit_bot
        first = admit & (st["datacount"] == 0)
        st2["max_agc_gain"] = jnp.where(first, st["agc_gain"],
                                        st["max_agc_gain"])
        st3 = ts.nrzi_agc_policy(st2, st, admit_top, admit_bot,
                                 agc_alpha, agc_window)
        st3["v_lasttop"] = jnp.where(admit_top, ev["wmax"], st["v_lasttop"])
        st3["v_lastbot"] = jnp.where(admit_bot, ev["wmin"], st["v_lastbot"])
        # peak statistics for deskew (decode_gcr.c:839-840,849-850); the
        # reference gates on t_lastclock != 0, which is set by the first
        # gcr_addbit and never cleared -- "has ever had data", not the
        # (idle-resettable) datablock flag
        stat_ok = admit & st.get("had_data", st["datablock"])
        val = t_peak - st["t_lastpeak"]
        # (int) cast truncates toward zero (decoder.c:160)
        bkt = ((val - stat_leftbin) / stat_binwidth).astype(I32)
        idle_rec = {}
        if idle_out:
            # mid-scan idle (decoder.c:879-888): entry between the
            # previous admission and this one drops datablock, so THIS
            # admission re-seeds the block (no zero-inference)
            thr = np.float32(cm.GCR_IDLE_THRESH) * \
                st["clkavg"]["t_bitspaceavg"]
            entry = gcr_idle_entry_sample(st["t_lastpeak"], thr,
                                          st["s_lastdet"])
            went_idle = admit & st["datablock"] & (entry <= s - 1)
            st3["datablock"] = st["datablock"] & ~went_idle
            st3["s_lastdet"] = jnp.where(admit, s, st["s_lastdet"])
            st3["had_data"] = st["had_data"] | admit
            idle_rec = dict(adm=admit, s_det=s,
                            ie_valid=went_idle, ie_e=entry)
        st4, wr = gcr_bit_step(st3, admit, t_peak, z1pt, z2pt,
                               pulse_adj_parm, clk_window, clk_alpha,
                               spb, maxb)
        rec = dict(wr=jnp.stack(wr),
                   # in-range buckets 0..49 count toward trksums;
                   # out-of-range maps to the extremes without trksums
                   hb=jnp.where(stat_ok,
                                jnp.where(bkt < 0, 52,
                                          jnp.where(bkt > 49, 53, bkt)),
                                50))
        if idle_out:
            rec.update(idle_rec,
                       t_fb=st4["t_firstbit"], t_lb=st4["t_lastbit"],
                       agc_mx=st4["max_agc_gain"],
                       agc_mn=st4["min_agc_gain"])
        if debug_peaks:
            # zero-inference events for the -trace zerpos/adjpos lanes
            rec.update(admit=admit, s_det=s, t_pk=t_peak, is_top=admit_top,
                       nzeros=(st4["datacount"] - st["datacount"] - 1
                               ).astype(jnp.int8),
                       padj=st4["t_pulse_adj"])
        return st4, rec

    init = gcr_bit_state_init(spb, maxb, clk_ring)
    if idle_out:
        init["s_lastdet"] = s_first_check
        init["had_data"] = jnp.bool_(False)
    if pre:
        ev_fn = lambda st, s: ts.gather_window_features(v_trk, s)
    else:
        WMAX = W if isinstance(W, int) else cm.PKWW_MAX_WIDTH
        ev_fn = lambda st, s: ts.window_features(v_trk, s, st["W"], S, WMAX)
    final, recs = ts.run_jump_scan_seq(extra, init, ev_fn, nxt_trk, W, S,
                                       nsteps, rise_parm, min_parm,
                                       agc_ring=agc_ring)
    if debug_peaks:
        final.update(ts.compact_outputs(
            recs["admit"], maxb,
            tr_s=(recs["s_det"], ts.BIG_S),
            tr_t=(recs["t_pk"], jnp.float32(0.0)),
            tr_top=(recs["is_top"], False),
            tr_nzeros=(recs["nzeros"], np.int8(0)),
            tr_padj=(recs["padj"], jnp.float32(0.0))))
        final["n_admitted"] = jnp.sum(recs["admit"].astype(I32))
    if idle_out:
        from . import pe as pe_mod
        final.update(ts.compact_outputs(
            recs["ie_valid"], pe_mod.IDLE_CAP,
            ie_e=(recs["ie_e"], pe_mod.BIG_TAU),
            ie_w=(recs["s_det"], pe_mod.BIG_TAU)))
        final["n_ie"] = jnp.sum(recs["ie_valid"].astype(I32))
        thr_t = np.float32(cm.GCR_IDLE_THRESH) * \
            final["clkavg"]["t_bitspaceavg"]
        trail = gcr_idle_entry_sample(final["t_lastpeak"], thr_t,
                                      final["s_lastdet"])
        # a trailing entry exists only while the track still holds an
        # open datablock (a dead/never-written track can never go idle,
        # decoder.c:879: `t->datablock &&`)
        final["ie_trail"] = jnp.where(final["datablock"], trail,
                                      pe_mod.BIG_TAU)
        for k in ("adm", "s_det", "wr", "hb", "t_fb", "t_lb",
                  "agc_mx", "agc_mn"):
            final["_st_" + k] = recs[k]
        return final
    final["bits"] = gcr_replay_bits(recs["wr"], maxb)
    hb = recs["hb"]
    hb2 = jnp.where(hb == 52, 0, jnp.where(hb == 53, 49, hb))
    final["hist"] = jnp.zeros(50, I32).at[hb2].add(1, mode="drop")
    final["trksum"] = jnp.sum((hb <= 49).astype(I32))
    return final


def gcr_apply_tau(final, maxb: int, tau):
    """Truncate one parmset lane's per-track GCR scan streams at the
    all-idle sample tau (gcr_end_of_block, decoder.c:885-888) and rebuild
    the per-track state gcr_finish consumes. tau = BIG_TAU reproduces the
    full-scan state exactly."""
    def one_track(fin):
        mask = fin["_st_adm"] & (fin["_st_s_det"] < tau)
        steps = jnp.arange(mask.shape[0], dtype=I32)
        last = jnp.max(jnp.where(mask, steps, -1))
        has = last >= 0

        def at_last(field, init):
            return jnp.where(has, field[jnp.maximum(last, 0)],
                             jnp.asarray(init, field.dtype))

        wr = jnp.where(mask[:, None], fin["_st_wr"], maxb)
        out = {}
        out["bits"] = gcr_replay_bits(wr, maxb)
        out["datacount"] = jnp.minimum(
            jnp.sum((wr < maxb).astype(I32)), maxb)
        hb = jnp.where(mask, fin["_st_hb"], 50)
        hb2 = jnp.where(hb == 52, 0, jnp.where(hb == 53, 49, hb))
        out["hist"] = jnp.zeros(50, I32).at[hb2].add(1, mode="drop")
        out["trksum"] = jnp.sum((hb <= 49).astype(I32))
        out["peakcount"] = jnp.sum(mask.astype(I32))
        out["t_firstbit"] = at_last(fin["_st_t_fb"], F32(0.0))
        out["t_lastbit"] = at_last(fin["_st_t_lb"], F32(0.0))
        out["max_agc_gain"] = at_last(fin["_st_agc_mx"], F32(0.0))
        out["min_agc_gain"] = at_last(fin["_st_agc_mn"], cm.FLT_MAX)
        out["incomplete"] = fin["incomplete"]
        out["n_consumed"] = out["peakcount"]
        out["n_total"] = jnp.sum(fin["_st_adm"].astype(I32))
        return out

    return jax.vmap(one_track)(final)


# ---------------------------------------------------------------------------
# zero-crossing transition extraction (-zeros): fully data-parallel
# ---------------------------------------------------------------------------

def zerocross_transitions(v: jnp.ndarray, spb, cap: int,
                          differentiated: bool, seg_len=None,
                          lead_len=None):
    """[T, S] -> per-track transition lists, exact to the reference's
    per-sample state machines.

    Plain (decoder.c:617-649, lookfor_zerocrossing): a crossing arms a
    pending transition only if the accumulated opposite extremum (v_top /
    v_bot, which persist across noise wiggles and reset only when the
    OPPOSITE crossing confirms) exceeded ZEROCROSS_PEAK; the pending
    confirms at the first strict new maximum above both the running
    same-sign extremum and ZEROCROSS_PEAK within the same excursion
    (crossing back cancels it).  Confirmation consumes the pending and
    resets the opposite extremum regardless of the slope test; the slope
    test (conf_time - cross_time <= t_bitspaceavg * ZEROCROSS_SLOPE,
    against the track's LIVE clock) only gates emission, so it is applied
    downstream (in-scan for GCR, statically for NRZI).  The returned `dt`
    lane carries the confirmation lag for that gate; `det` is the
    confirmation sample -- the moment the C calls process_up/down_
    transition, which is the event order the NRZI global scan needs.

    The state machine is phase-level: a "phase" is a maximal run of
    same-sign samples with exact zeros transparent (zeros update nothing
    in the C).  Pendings never survive an opposite-sign sample, so they
    are per-phase; the only cross-phase state is the running extremum
    pair, a 2-scalar lax.scan.  A phase whose own extremum is <=
    ZEROCROSS_PEAK is provably transparent: it cannot confirm (the
    threshold is >= PEAK), cannot tip the arming test (which compares the
    OPPOSITE carry against PEAK strictly), and its carry contribution
    never lifts any max(carry, PEAK) term -- so only SIGNIFICANT phases
    (extremum > PEAK) are enumerated, bounding the list by signal
    density instead of noise sign-flip density.  Confirmation points are
    recovered data-parallel from the per-phase thresholds afterwards.

    Differentiated (decoder.c:654-683): a crossing fires iff the
    immediately preceding opposite phase attained the threshold (the
    pending is consumed by the first opposite-sign sample, so there is no
    long-range memory), at the midpoint of the zeros recorded after the
    phase's last attaining sample, or at crossing - 0.5 samples if none.
    Only firing crossings are listed (same noise-density argument).

    Residual vs the C: segments decode with zeroed extremum carries, so
    the first confirmation of a segment can use a lower threshold than
    the C reaches with carries from the previous block's tail; segment
    margins are quiet, so this lands in the block preamble.
    """
    T, S = v.shape
    idxs = jnp.broadcast_to(jnp.arange(S, dtype=I32), (T, S))
    elig = jnp.ones((T, S), bool)
    if seg_len is not None:
        elig = elig & (idxs < seg_len)
    if lead_len is not None:
        elig = elig & (idxs >= lead_len)
    vv = jnp.where(elig, v, 0.0)
    sgn = jnp.where(vv > 0, 1, jnp.where(vv < 0, -1, 0)).astype(jnp.int8)
    nz = sgn != 0
    amp = jnp.abs(vv)
    att = amp > ZEROCROSS_PEAK                  # strict, c.626/640/665/678

    def seg_or(flags, start):
        """Segmented inclusive or-scan (start marks segment heads)."""
        def op(x, y):
            sa, va = x
            sb, vb = y
            return (sa | sb, jnp.where(sb, vb, va | vb))
        _, out = jax.lax.associative_scan(op, (start, flags), axis=1)
        return out

    if differentiated:
        # crossing: first nonzero sample whose sign differs from the last
        # nonzero sample (pending survives exact-zero runs)
        ff = jax.lax.associative_scan(
            lambda x, y: jnp.where(y != 0, y, x), sgn, axis=1)
        ff_excl = jnp.concatenate([jnp.zeros((T, 1), jnp.int8),
                                   ff[:, :-1]], axis=1)
        crossing = nz & (ff_excl != 0) & (sgn != ff_excl)
        # a crossing fires iff its whole preceding segment (= the
        # inclusive attain-prefix at the sample just before it) attained
        pre_any = seg_or(att, crossing)
        pre_prev = jnp.concatenate([jnp.zeros((T, 1), bool),
                                    pre_any[:, :-1]], axis=1)
        keep = crossing & pre_prev
        # zero-run window: zeros after the segment's last attaining sample
        last_att = jax.lax.associative_scan(
            jnp.maximum, jnp.where(att, idxs, -1), axis=1)
        la_prev = jnp.concatenate([jnp.full((T, 1), -1, I32),
                                   last_att[:, :-1]], axis=1)
        is_zero = sgn == 0
        next_zero = jax.lax.associative_scan(
            jnp.minimum, jnp.where(is_zero, idxs, S)[:, ::-1],
            axis=1)[:, ::-1]
        last_zero = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_zero, idxs, -1), axis=1)
        lz_prev = jnp.concatenate([jnp.full((T, 1), -1, I32),
                                   last_zero[:, :-1]], axis=1)

        cnt = jnp.cumsum(keep.astype(I32), axis=1)
        nkept = cnt[:, -1]
        scat = jnp.where(keep, jnp.minimum(cnt - 1, cap - 1), cap)
        def compact(x, fill):
            o = jnp.full((T, cap + 1), fill, x.dtype)
            return jax.vmap(lambda oo, ii, xx: oo.at[ii].set(
                xx, mode="drop"))(o, scat, x)[:, :cap]
        cpos = compact(idxs, S)
        valid = cpos < S
        cpos_c = jnp.minimum(cpos, S - 1)
        csign = jnp.take_along_axis(sgn, cpos_c, axis=1).astype(I32)
        la = jnp.take_along_axis(la_prev, cpos_c, axis=1)
        zf = jnp.take_along_axis(
            next_zero, jnp.minimum(la + 1, S - 1), axis=1)
        zl = jnp.take_along_axis(lz_prev, cpos_c, axis=1)
        has_zero = (zf < cpos_c) & (zl >= zf)
        t_trans = jnp.where(has_zero,
                            (zf.astype(F32) + zl.astype(F32)) / 2,
                            cpos_c.astype(F32) - 0.5)
        return dict(t=t_trans, ok=valid, dt=jnp.zeros_like(t_trans),
                    det=cpos_c, is_top=csign > 0, valid=valid,
                    overflow=jnp.any(nkept > cap))

    # ---- plain variant: exact pending/extremum machine over phases ----
    # phase = maximal same-sign run, zeros transparent
    sgn_prev = jnp.concatenate([jnp.zeros((T, 1), jnp.int8),
                                sgn[:, :-1]], axis=1)
    ff = jax.lax.associative_scan(
        lambda x, y: jnp.where(y != 0, y, x), sgn, axis=1)
    ff_excl = jnp.concatenate([jnp.zeros((T, 1), jnp.int8),
                               ff[:, :-1]], axis=1)
    phase_start = nz & (ff_excl != sgn)
    # pending is armed only on a literal adjacent sign flip (c.631: v_prev)
    strict = nz & (sgn_prev == (-sgn).astype(jnp.int8))
    # significant phases only (see docstring)
    fwd_any = seg_or(att, phase_start)
    phase_end = jnp.concatenate([phase_start[:, 1:],
                                 jnp.ones((T, 1), bool)], axis=1)
    bwd_any = seg_or(att[:, ::-1], phase_end[:, ::-1])[:, ::-1]
    sig_start = phase_start & (fwd_any | bwd_any)
    sid = jnp.cumsum(sig_start, axis=1)                    # 0 before first
    nph = cap + 2
    sc = jnp.minimum(sid, nph - 1)

    ph_a = jnp.full((T, nph), S, I32)
    ph_a = jax.vmap(lambda m, i, x: m.at[i].min(x))(
        ph_a, jnp.where(sig_start, sc, nph - 1),
        jnp.where(sig_start, idxs, S))
    ph_flip = jnp.zeros((T, nph), bool)
    ph_flip = jax.vmap(lambda m, i, x: m.at[i].max(x))(
        ph_flip, jnp.where(sig_start, sc, nph - 1), strict & sig_start)
    ph_sig = jnp.zeros((T, nph), jnp.int8)
    ph_sig = jax.vmap(lambda m, i, x: m.at[i].add(x))(
        ph_sig, jnp.where(sig_start, sc, nph - 1),
        jnp.where(sig_start, sgn, 0))
    # the bucket sweeps until the next significant phase; extra samples
    # are all <= PEAK < the phase's own extremum, so max/exceed are safe
    ph_max = jnp.zeros((T, nph), F32)
    ph_max = jax.vmap(lambda m, i, x: m.at[i].max(x))(ph_max, sc, amp)
    ph_va = jnp.zeros((T, nph), F32)
    ph_va = jax.vmap(lambda m, i, x: m.at[i].add(x))(
        ph_va, jnp.where(sig_start, sc, nph - 1),
        jnp.where(sig_start, amp, 0.0))

    def phase_step(carry, x):
        ct, cbm = carry             # running extrema magnitudes (v_top,-v_bot)
        sig, flip, M, va = x
        is_pos = sig > 0
        # the C updates the same-sign extremum at the flip sample with the
        # pending still false, THEN arms it (decoder.c:622-634), so the
        # flip sample itself never confirms: threshold includes va
        own = jnp.where(is_pos, ct, cbm)
        opp = jnp.where(is_pos, cbm, ct)
        pend = flip & (opp > ZEROCROSS_PEAK)
        thresh = jnp.maximum(jnp.maximum(own, va), ZEROCROSS_PEAK)
        conf = pend & (M > thresh)
        own2 = jnp.maximum(own, M)
        opp2 = jnp.where(conf, 0.0, opp)   # confirm resets the opposite
        ct2 = jnp.where(is_pos, own2, opp2)
        cbm2 = jnp.where(is_pos, opp2, own2)
        nzp = sig != 0
        ct2 = jnp.where(nzp, ct2, ct)
        cbm2 = jnp.where(nzp, cbm2, cbm)
        return (ct2, cbm2), (conf, thresh)

    def one_track(sig, flip, M, va):
        (_, _), (conf, thr) = jax.lax.scan(
            phase_step, (F32(0.0), F32(0.0)), (sig, flip, M, va))
        return conf, thr
    conf, thr = jax.vmap(one_track)(ph_sig, ph_flip, ph_max, ph_va)

    # confirmation point: first sample in the phase strictly above the
    # phase threshold (any earlier sample was <= it, so this is the first
    # strict new max above max(v_top, ZEROCROSS_PEAK))
    thr_g = jnp.take_along_axis(thr, sc, axis=1)
    conf_g = jnp.take_along_axis(conf, sc, axis=1)
    exceed = conf_g & (amp > thr_g) & nz
    ph_j = jnp.full((T, nph), S, I32)
    ph_j = jax.vmap(lambda m, i, x: m.at[i].min(x))(
        ph_j, jnp.where(exceed, sc, nph - 1), jnp.where(exceed, idxs, S))

    nphase = jnp.max(sid, axis=1)                           # [T]
    prng = jnp.broadcast_to(jnp.arange(1, cap + 1, dtype=I32)[None, :],
                            (T, cap))
    valid = prng <= nphase[:, None]
    a_l = jnp.take_along_axis(ph_a, prng, axis=1)
    ok = jnp.take_along_axis(conf, prng, axis=1) & valid
    j_l = jnp.take_along_axis(ph_j, prng, axis=1)
    dt = jnp.where(ok, (j_l - a_l).astype(F32), 0.0)
    t_trans = a_l.astype(F32)
    is_top = jnp.take_along_axis(ph_sig, prng, axis=1) > 0
    return dict(t=t_trans, ok=ok, dt=dt, det=jnp.minimum(j_l, S - 1),
                is_top=is_top, valid=valid,
                overflow=jnp.any(nphase > cap))


@partial(jax.jit, static_argnames=("cap", "maxb"))
def gcr_zeros_track_scan(trans_t, trans_ok, trans_dt, cap: int,
                         clk_window, clk_alpha, z1pt, z2pt, pulse_adj_parm,
                         spb, maxb: int):
    """Bit recovery over an extracted zero-crossing transition list.

    The plain -zeros slope test (decoder.c:629,643: confirmation must
    come within ZEROCROSS_SLOPE bit times of the crossing) compares
    against the track's LIVE clock, which the GCR bit logic adjusts as
    bits decode -- so it is applied here inside the scan, where the
    evolving t_bitspaceavg is at hand, not at extraction time.  A
    slope-failed confirmation still consumed its pending upstream; here
    it is simply not emitted."""
    def step(st, x):
        t_this, ok, dtc = x
        emit = ok & (dtc <= st["clkavg"]["t_bitspaceavg"] * ZEROCROSS_SLOPE)
        st2, wr = gcr_bit_step(st, emit, t_this, z1pt, z2pt, pulse_adj_parm,
                               clk_window, clk_alpha, spb, maxb)
        return st2, (jnp.stack(wr), emit)

    init = gcr_bit_state_init(spb, maxb)
    final, (wrs, emits) = jax.lax.scan(
        step, init, (trans_t, trans_ok, trans_dt))
    final["bits"] = gcr_replay_bits(wrs, maxb)
    final["peakcount"] = jnp.sum(emits.astype(I32))
    final["max_agc_gain"] = F32(0.0)
    final["min_agc_gain"] = cm.FLT_MAX
    final["incomplete"] = jnp.bool_(False)
    final["hist"] = jnp.zeros(50, I32)
    final["trksum"] = I32(0)
    return final


# ---------------------------------------------------------------------------
# group-level postprocess (decode_gcr.c:503-674) as a scan over 5-bit groups
# ---------------------------------------------------------------------------

S_PREAMBLE, S_DATA_A, S_DATA_B, S_RESYNC = 0, 1, 2, 3
S_RESID_A, S_RESID_B, S_CRC_A, S_CRC_B, S_POSTAMBLE = 4, 5, 6, 7, 8


def _reorder9_vec(x, order):
    out = jnp.zeros_like(x)
    for i in range(9):
        out = out | (((x >> i) & 1) << int(order[i]))
    return out


def _reverse8_vec(x):
    out = jnp.zeros_like(x)
    for i in range(8):
        out = out | (((x >> i) & 1) << (7 - i))
    return out


def _times_alpha_vec(s):
    bit7 = (s >> 7) & 1
    return ((s << 1) & 0xFF) ^ jnp.where(bit7 == 1, 0x39, 0)


def _divby_alpha_vec(s):
    bit0 = s & 1
    return (s >> 1) ^ jnp.where(bit0 == 1, 0x9C, 0)


def gcr_correct_errors(frames8, bad_tracks):
    """General 1-2 track ECC correction of one 8-frame group: the device
    (jnp) port of the reference's full correct_errors API
    (decode_gcr.c:233-341), validated against a harness built from the
    reference binary for every 1- and 2-bit mask. frames8: [8] int32 in
    (msb..lsb,P) order. bad_tracks: 9-bit mask in the reference's
    tom_order bit space (bit 7-t = data track t, bit 8 = parity track);
    with one bit set (or the caller not knowing, mask 0x01) the syndrome
    locates the bad track itself, with two bits set both tracks are
    corrected as erasures. The reference's own decode path only ever
    calls this with 0x01 (decode_gcr.c:593) -- the two-track path is the
    capability its API offers to callers. Returns (ok, corrected)."""
    bad_tracks = jnp.asarray(bad_tracks, I32)
    tom = ((frames8 >> 1) & 0xFF) | ((frames8 & 1) << 8)
    B = _reorder9_vec(tom, gt.BIT_ORDER)
    bt = _reorder9_vec(bad_tracks[None], gt.BIT_ORDER)[0]
    idx9 = jnp.arange(9)
    setb = (bt >> idx9) & 1
    nset = jnp.sum(setb)
    pi = jnp.argmax(setb)                       # lowest set bit (0 if none)
    pi = jnp.where(nset > 0, pi, 0)
    setb2 = setb.at[pi].set(0)
    pj = jnp.where(nset >= 2, jnp.argmax(setb2), pi)
    two = pj > pi

    par = cm.parity9(B)
    S1p = jnp.int32(0xFF)
    for i in range(8):
        S1p = S1p ^ (par[i] << i)
    S2p = jnp.int32(0)
    for i in range(8):
        S2p = _times_alpha_vec(S2p) ^ (B[i] & 0xFF)
    S2p = _reverse8_vec(S2p)

    # ---- single-track path (pi == pj): syndrome locates the track ----
    errloc = jnp.int32(-1)
    errloc = jnp.where(S2p == 0, 8, errloc)
    Sxp = S1p
    found = S2p == 0
    for i in range(8):
        hit = (~found) & (S2p == Sxp)
        errloc = jnp.where(hit, i, errloc)
        found = found | hit
        Sxp = _divby_alpha_vec(Sxp)
    has_err = S1p != 0
    ok1 = (~has_err) | (errloc >= 0)
    do_fix1 = has_err & (errloc >= 0)
    loc = jnp.maximum(errloc, 0)
    corr1 = jnp.where(do_fix1, ((S1p >> jnp.arange(8)) & 1) << loc, 0)

    # ---- two-track path (pi < pj): erasure correction via Mk ----
    mrow = jnp.take(jnp.asarray(gt.CORR_MS), jnp.minimum(pj - pi, 7),
                    axis=0)                     # [8]; unused when pj == 8
    Mk = _reverse8_vec(mrow)
    Syp = S2p
    for i in range(8):
        Syp = jnp.where(i < pi, _times_alpha_vec(Syp), Syp)
    Syp = Syp ^ S1p
    e2m = jnp.int32(0)
    for i in range(8):
        e2m = e2m | (cm.parity9(Mk[i] & Syp) << (7 - i))
    e2p = jnp.where(pj == 8, Syp, e2m)
    e1p = e2p ^ S1p
    corr2 = ((((e1p >> jnp.arange(8)) & 1) << pi) |
             (((e2p >> jnp.arange(8)) & 1) << pj))

    corr = jnp.where(two, corr2, corr1)
    ok = jnp.where(two, True, ok1)
    applied = two | do_fix1 | (~has_err)
    B = B ^ jnp.where(applied, corr, 0)
    back = _reorder9_vec(B, gt.UNDO_ORDER)
    out = ((back & 0xFF) << 1) | ((back >> 8) & 1)
    return ok, jnp.where(applied, out, frames8)


def gcr_correct_single(frames8):
    """The reference decode path's correction call: correct_errors with
    bad_tracks hardcoded to 0x01 (decode_gcr.c:593), i.e. the
    syndrome-locating single-track path."""
    return gcr_correct_errors(frames8, 0x01)


def gcr_compute_ecc_vec(frames7):
    """ECC over 7 frames' data bytes (jnp; decode_gcr.c:127-144)."""
    bytes7 = (frames7 >> 1) & 0xFF
    # dblock = big-endian concatenation; split into 28-bit halves
    lo = jnp.int32(0)
    hi = jnp.int32(0)
    for i in range(7):
        shift = 8 * (6 - i)          # byte i occupies bits [shift, shift+8)
        b = bytes7[i]
        if shift >= 28:
            hi = hi | (b << (shift - 28))
        elif shift + 8 <= 28:
            lo = lo | (b << shift)
        else:                        # straddles the 28-bit boundary
            lo = lo | ((b << shift) & 0xFFFFFFF)
            hi = hi | (b >> (28 - shift))
    lo = lo & 0xFFFFFFF
    ecc = jnp.int32(0)
    for i in range(8):
        p = cm.parity9(lo & int(gt.ECC_LO[i])) ^ cm.parity9(hi & int(gt.ECC_HI[i]))
        ecc = ecc | (p << i)
    return ecc


def gcr_postprocess(bits, dcs, maxbits, expected_parity, do_correct,
                    maxb: int, do_correct2: bool = False):
    """One parmset lane: bits [T=9, maxb] storage bits, dcs [9] counts.
    Returns decoded frames + error counts (decode_gcr.c:503-674).

    do_correct2 is an extension beyond the reference: when the reference's
    0x01 syndrome-located single-track fix fails on a parity-bad dgroup,
    identify up to two bad tracks from the dgroup's invalid 5-bit storage
    codes and run the full two-track erasure correction the reference's
    correct_errors API supports but its decode path never invokes."""
    T = 9
    trk = jnp.arange(T)
    ngroups = maxb // 5
    datamap = jnp.asarray(gt.GCR_DATAMAP)

    # precompute per-group 5-bit codes for every track: [T, ngroups]
    gbits = bits[:, :ngroups * 5].astype(I32).reshape(T, ngroups, 5)
    weights = jnp.asarray([16, 8, 4, 2, 1], I32)
    sgroups = jnp.sum(gbits * weights[None, None, :], axis=-1)  # [T, G]

    def step(st, g):
        sg = sgroups[:, g]                        # [T]
        in_range = (g * 5 + 5) <= maxbits
        sub = sg[0]                               # master track (MTRK=0)
        state = st["state"]

        nibble_raw = datamap[sg]                  # [T]
        bad_code = nibble_raw >= 16
        nibble = jnp.where(bad_code, nibble_raw - 16, nibble_raw)
        # 4 frames from the track nibbles
        frames4 = jnp.stack([
            jnp.sum(((nibble >> (3 - k)) & 1) << (T - 1 - trk))
            for k in range(4)])                   # [4]
        par4 = cm.parity9(frames4)
        nbad_par = jnp.sum((par4 != expected_parity).astype(I32))
        nbad_codes = jnp.sum(bad_code.astype(I32))

        is_mark1 = sub == gt.GCR_MARK1
        is_mark2 = sub == gt.GCR_MARK2
        is_sync = sub == gt.GCR_SYNC

        store = jnp.bool_(False)
        nstate = state
        bp = st["bad_parity"]
        out = dict(st)

        # -- transitions --
        pre_to_data = (state == S_PREAMBLE) & is_mark1
        nstate = jnp.where(pre_to_data, S_DATA_A, nstate)
        out["bytenum"] = jnp.where(pre_to_data, 0, st["bytenum"])

        da = state == S_DATA_A
        da_resync = da & is_mark2
        da_resid = da & ~is_mark2 & is_sync
        da_store = da & ~is_mark2 & ~is_sync
        nstate = jnp.where(da_resync, S_RESYNC,
                  jnp.where(da_resid, S_RESID_A,
                   jnp.where(da_store, S_DATA_B, nstate)))
        bp = jnp.where(da_store, 0, bp)
        if do_correct2:          # remember group A's bad-code tracks
            out["badA"] = jnp.where(da_store, bad_code, st["badA"])

        db = state == S_DATA_B
        nstate = jnp.where(db, S_DATA_A, nstate)

        rs = state == S_RESYNC
        nstate = jnp.where(rs & is_mark1, S_DATA_A, nstate)
        bad_resync = rs & ~is_mark1 & ~is_sync

        ra = state == S_RESID_A
        rb = state == S_RESID_B
        ca = state == S_CRC_A
        cb = state == S_CRC_B
        nstate = jnp.where(ra, S_RESID_B,
                  jnp.where(rb, S_CRC_A,
                   jnp.where(ca, S_CRC_B,
                    jnp.where(cb, S_POSTAMBLE, nstate))))

        store = da_store | db | ra | rb | ca | cb
        store = store & in_range
        nstate = jnp.where(in_range, nstate, state)

        # -- store the 4 frames --
        bn = out["bytenum"]
        widx = jnp.where(store, jnp.minimum(bn + jnp.arange(4), maxb - 1),
                         maxb)
        data = st["data"].at[widx].set(frames4, mode="drop")
        bp = jnp.where(store, bp + nbad_par, bp)
        # first_error: the byte index of the first parity error seen at
        # store time (decode_gcr.c:493 -- gcr_store_dgroups runs the check
        # for data, residual, AND crc groups, ECC byte included)
        parbad = par4 != expected_parity                     # [4]
        first_par = jnp.min(jnp.where(parbad, bn + jnp.arange(4),
                                      jnp.int32(2 ** 30)))
        fe = st["first_error"]
        fe = jnp.where((fe < 0) & store & jnp.any(parbad), first_par, fe)
        out["bad_dgroups"] = st["bad_dgroups"] + jnp.where(
            store, nbad_codes, 0)
        out["gcr_bad_sequence"] = st["gcr_bad_sequence"] + jnp.where(
            bad_resync & in_range, 1, 0)
        bn = jnp.where(store, bn + 4, bn)

        # -- group-B processing: ECC check / correction, parity tally --
        isdb = db & in_range
        frames8 = jax.lax.dynamic_slice(
            data, (jnp.clip(bn - 8, 0, maxb - 8),), (8,))
        ecc_ok = gcr_compute_ecc_vec(frames8[:7]) == ((frames8[7] >> 1) & 0xFF)
        ecc_err0 = isdb & ~ecc_ok
        out["ecc_errs"] = st["ecc_errs"] + ecc_err0.astype(I32)
        # ECC mismatch marks the ECC byte (decode_gcr.c:580; the store-time
        # parity check above ran first, as gcr_store_dgroups precedes
        # gcr_compute_ecc)
        fe = jnp.where((fe < 0) & ecc_err0, bn - 1, fe)
        out["first_error"] = fe

        vpar = st["vparity_errs"]
        corrected = st["corrected_bits"]
        if do_correct:
            fix_ok, fixed = gcr_correct_single(frames8)
            do_fix = isdb & (bp > 0) & fix_ok
            if do_correct2:
                bad2 = st["badA"] | bad_code
                tom_bits = jnp.where(trk == 8, 8, 7 - trk)
                mask2 = jnp.sum(jnp.where(bad2, 1 << tom_bits, 0))
                cnt2 = jnp.sum(bad2.astype(I32))
                ok2, fixed2 = gcr_correct_errors(frames8, mask2)
                do_fix2 = (isdb & (bp > 0) & (~do_fix) & ok2 &
                           (cnt2 >= 1) & (cnt2 <= 2))
                fixed = jnp.where(do_fix2, fixed2, fixed)
                do_fix = do_fix | do_fix2
            data = jax.lax.dynamic_update_slice(
                data, jnp.where(do_fix, fixed, frames8),
                (jnp.clip(bn - 8, 0, maxb - 8),))
            new_bp = jnp.sum(
                (cm.parity9(fixed) != expected_parity).astype(I32))
            ecc2_ok = gcr_compute_ecc_vec(fixed[:7]) == ((fixed[7] >> 1) & 0xFF)
            out["ecc_errs"] = out["ecc_errs"] + (do_fix & ~ecc2_ok).astype(I32)
            corrected = corrected + do_fix.astype(I32)
            bp = jnp.where(do_fix, new_bp, bp)
        vpar = vpar + jnp.where(isdb, bp, 0)
        bn = jnp.where(isdb, bn - 1, bn)      # drop the ECC byte

        # -- CRC group B: extract residual count and trim --
        iscb = cb & in_range
        resid_char = data[jnp.clip(bn - 2, 0, maxb - 1)]
        resid_cnt = resid_char >> 6
        bn = jnp.where(iscb, bn - (16 - resid_cnt), bn)

        out["data"] = data
        out["bytenum"] = bn
        out["bad_parity"] = bp
        out["vparity_errs"] = vpar
        out["corrected_bits"] = corrected
        out["state"] = nstate
        return out, None

    init = dict(state=I32(S_PREAMBLE), bytenum=I32(0),
                data=jnp.zeros(maxb, I32), bad_parity=I32(0),
                vparity_errs=I32(0), ecc_errs=I32(0), bad_dgroups=I32(0),
                gcr_bad_sequence=I32(0), corrected_bits=I32(0),
                first_error=I32(-1))
    if do_correct2:
        init["badA"] = jnp.zeros(T, bool)
    final, _ = jax.lax.scan(step, init, jnp.arange(ngroups))
    return final


def gcr_finish(finals, T: int, expected_parity, revparity, do_correct,
               maxb: int, do_correct2: bool = False):
    """gcr_end_of_block (decode_gcr.c:682-729) for one parmset lane."""
    trk = jnp.arange(T)
    dc = finals["datacount"]
    pc = finals["peakcount"]
    minbits = jnp.min(dc)
    maxbits = jnp.max(dc)
    started = maxbits > 0

    avg_sp = jnp.mean((finals["t_lastbit"] - finals["t_firstbit"]) /
                      jnp.maximum(dc, 1).astype(F32))

    is_noise = maxbits <= 10
    live = jnp.asarray([1, 0, 1, 0, 0, 1, 1, 1, 1], bool)
    is_tm = ((~is_noise) &
             jnp.all(jnp.where(live, (dc >= 250) & (dc <= 400), True)) &
             jnp.all(jnp.where(~live, pc <= 2, True)))
    mismatch = maxbits - minbits
    is_bad = (~is_noise) & (~is_tm) & (mismatch > 2)
    is_block = (~is_noise) & (~is_tm) & (~is_bad)

    post = gcr_postprocess(finals["bits"], dc, maxbits,
                           expected_parity, do_correct, maxb,
                           do_correct2=do_correct2)
    n = post["bytenum"]

    blktype = jnp.where(~started, 0,
               jnp.where(is_noise, BS_NOISE,
                jnp.where(is_tm, BS_TAPEMARK,
                 jnp.where(is_bad, BS_BADBLOCK, BS_BLOCK))))
    vpar = jnp.where(is_block, post["vparity_errs"], 0)
    ecc = jnp.where(is_block, post["ecc_errs"], 0)
    badseq = jnp.where(is_block, post["gcr_bad_sequence"], 0)
    baddg = jnp.where(is_block, post["bad_dgroups"], 0)
    corrected = jnp.where(is_block, post["corrected_bits"], 0)
    errcount = jnp.where(is_bad, mismatch, 0) + vpar + ecc + badseq
    warncount = baddg + corrected

    return dict(
        blktype=blktype,
        minbits=jnp.where(is_block, n, minbits),
        maxbits=jnp.where(is_block, n, maxbits),
        track_mismatch=jnp.where(is_bad, mismatch, 0),
        vparity_errs=vpar, crc_errs=jnp.int32(0), lrc_errs=jnp.int32(0),
        ecc_errs=ecc, gcr_bad_dgroups=baddg, gcr_bad_sequence=badseq,
        errcount=errcount, warncount=warncount,
        first_error=post["first_error"],
        missed_midbits=jnp.int32(0), corrected_bits=corrected,
        faked_tracks=jnp.int32(0),
        avg_bit_spacing=avg_sp, frames=post["data"],
        hist=finals["hist"], trksums=finals["trksum"],
        consume_overflow=jnp.any(finals["incomplete"]),
        alltrk_max_agc=jnp.max(finals["max_agc_gain"]),
        alltrk_min_agc=jnp.min(finals["min_agc_gain"]),
    )
