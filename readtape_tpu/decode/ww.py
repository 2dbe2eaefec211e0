"""Whirlwind I decoder (6-track 100 BPI, 2 bits per tape character).

Whirlwind tapes carry redundant primary/alternate clock, MSB and LSB tracks
(decode_ww.c). A "pulse" is a full flux excursion -- two opposite peaks
(start + end). Data bits are pulses on the MSB/LSB tracks within one bit time
before a clock pulse end; a blockmark is an LSB pulse with no clock running.
Blocks can abut within a bit time, so (like the reference, which never resets
peak state between WW blocks) the whole tape decodes as ONE pass:

  1. per-track jump scans admit peaks (AGC on every pulse edge),
  2. the admitted transitions of all tracks merge in detection order,
  3. a single global scan replays the reference's pulse/clock/blockmark state
     machine, emitting 2-bit characters and block boundaries,
  4. block assembly (8 chars -> 16-bit words, leading-clock trim, -reverse)
     is done per block on the host (cheap).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import common as cm
from . import trackscan as ts
from .common import F32, I32
from .nrzi import BS_BLOCK, BS_TAPEMARK

WWTRK_PRICLK, WWTRK_PRILSB, WWTRK_PRIMSB = 0, 1, 2
WWTRK_ALTCLK, WWTRK_ALTLSB, WWTRK_ALTMSB = 3, 4, 5
NOTRK = -1

FLUX_POS, FLUX_NEG, FLUX_AUTO = 0, 1, 2


def parse_ww_order(order: str):
    """-order string like "CMLcml" -> dict of track-type -> track index
    (tracks numbered in head order, ignoring 'x'; readtape.c:869-902)."""
    type_to_trk = {k: NOTRK for k in range(6)}
    head_to_trk = []
    sym = {"C": WWTRK_PRICLK, "L": WWTRK_PRILSB, "M": WWTRK_PRIMSB,
           "c": WWTRK_ALTCLK, "l": WWTRK_ALTLSB, "m": WWTRK_ALTMSB}
    ntrks = 0
    for head, ch in enumerate(order):
        if ch == "x":
            head_to_trk.append(NOTRK)
            continue
        if ch not in sym:
            raise ValueError(f"bad Whirlwind track order symbol: {ch}")
        type_to_trk[sym[ch]] = ntrks
        head_to_trk.append(ntrks)
        ntrks += 1
    for need, name in [(WWTRK_PRICLK, "C"), (WWTRK_PRIMSB, "M"),
                       (WWTRK_PRILSB, "L")]:
        if type_to_trk[need] == NOTRK:
            raise ValueError(f"primary track '{name}' wasn't assigned")
    return type_to_trk, head_to_trk, ntrks


@partial(jax.jit, static_argnames=("S", "nsteps", "K", "pre", "chunked"))
def ww_track_scan(v_trk, nxt_trk, W, S: int, nsteps: int, K: int,
                  rise_parm, min_parm, agc_alpha, agc_window,
                  v_avg_height_init, pre: bool = False,
                  chunked: bool = False, carry_in=None):
    """Admission + the WW AGC policy: adjust_agc on every pulse edge
    (decode_ww.c:171,190). v_avg_height comes from the deskew pass when
    available (decoder.c:484-497), else the nominal value. Also measures
    average pulse heights (accumulate_avg_height) for the deskew pass."""

    def extra(st2, st, ev, admit_top, admit_bot, t_peak, s):
        admit = admit_top | admit_bot
        st2["peakcount"] = st["peakcount"] + admit.astype(I32)
        agc_new = cm.adjust_agc(st2, agc_alpha, agc_window)
        st3 = dict(st2)
        for k in ("agc_gain", "v_heights", "heightndx",
                  "max_agc_gain", "min_agc_gain"):
            st3[k] = jnp.where(admit, agc_new[k], st2[k])
        # average-height measurement (accumulate_avg_height at pulse ends;
        # decode_ww.c:189) for the deskew calibration pass
        height = st2["v_top"] - st2["v_bot"]
        meas = admit_top & (height > 0)
        st3["h_sum"] = st["h_sum"] + jnp.where(meas, height, 0.0)
        st3["h_cnt"] = st["h_cnt"] + meas.astype(I32)
        st3["v_lasttop"] = jnp.where(admit_top, ev["wmax"], st["v_lasttop"])
        st3["v_lastbot"] = jnp.where(admit_bot, ev["wmin"], st["v_lastbot"])
        # exact sub-sample offset alongside the absolute f32 time: huge
        # captures (s beyond the f32 mantissa) rebuild exact local times
        # as f32(s - base) + frac (see ww_global_scan's rebasing)
        frac, _L = ts.refine_frac(st, ev, admit_top)
        out = dict(admit=admit, s_det=s, t_peak=t_peak, t_frac=frac,
                   is_top=admit_top)
        return st3, out

    init = {"v_avg_height": jnp.asarray(v_avg_height_init, F32),
            "h_sum": F32(0.0), "h_cnt": I32(0)}
    if pre:
        ev_fn = lambda st, s: ts.gather_window_features(v_trk, s)
    else:
        WMAX = W if isinstance(W, int) else cm.PKWW_MAX_WIDTH
        ev_fn = lambda st, s: ts.window_features(v_trk, s, st["W"], S, WMAX)
    final, outs = ts.run_jump_scan_seq(extra, init, ev_fn, nxt_trk, W, S,
                                       nsteps, rise_parm, min_parm,
                                       init_override=carry_in if chunked
                                       else None)
    final.update(ts.compact_outputs(
        outs["admit"], K,
        tr_s=(outs["s_det"], ts.BIG_S),
        tr_t=(outs["t_peak"], F32(0.0)),
        tr_frac=(outs["t_frac"], F32(0.0)),
        tr_top=(outs["is_top"], False)))
    return final


def ww_carry_init(T: int, W: int, v_avg_height_init,
                  agc_ring: int = cm.AGC_MAX_WINDOW):
    """Fresh per-track carry for the CHUNKED scan (ww_track_scan with
    chunked=True): the full admission + WW state, [T]-leading so it vmaps
    like the scan. pos starts at 0 (one reject step snaps to the first
    candidate, identical admissions to starting at nxt[0])."""
    one = ts.admission_init(W, agc_ring)
    one.update(v_avg_height=jnp.asarray(0.0, F32), h_sum=F32(0.0),
               h_cnt=I32(0), steps=I32(0))
    carry = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (T,) + jnp.shape(x)),
        one)
    carry["v_avg_height"] = jnp.asarray(v_avg_height_init, F32).reshape(T)
    return carry


def merge_transitions(trans, T: int, cap: int):
    """trans: dict of [T, K] compacted per-track transitions. Merge into one
    detection-ordered stream [cap]: within a sample, lower tracks first (the
    reference's per-sample track loop order). A STABLE sort on s_det with
    the [T, K] row-major flattening gives exactly that tiebreak, with no
    upper bound on s_det (the old key packed s*16+trk into an int32, which
    capped captures at 2^26 samples)."""
    K = trans["s_det"].shape[1]
    flat_s = trans["s_det"].reshape(-1)
    order = jnp.argsort(flat_s, stable=True)[:cap]
    out = {k: v.reshape(-1)[order] for k, v in trans.items()}
    out["trk"] = (order // K).astype(I32)
    out["valid"] = out["s_det"] < ts.BIG_S
    return out


REBASE_SPAN = 1 << 22     # rebase when an event is this far past the base


@partial(jax.jit, static_argnames=(
    "pri_clk", "pri_lsb", "pri_msb", "alt_clk", "alt_lsb", "alt_msb",
    "T", "maxchars", "maxblocks", "fluxdir_req", "debug_times", "flush"))
def ww_global_scan(m_trk, m_t, m_s, m_is_top, m_valid,
                   clk_window, clk_alpha, spb,
                   stat_leftbin=jnp.float32(0.0),
                   stat_binwidth=jnp.float32(1.0),
                   *, pri_clk, pri_lsb, pri_msb, alt_clk, alt_lsb, alt_msb,
                   T, maxchars, maxblocks, fluxdir_req,
                   debug_times: bool = False, m_frac=None,
                   init_state=None, flush: bool = True):
    """The merged-stream state machine (decode_ww.c:51-271).

    Carried times are RELATIVE to a rolling integer base: when an event
    lands more than REBASE_SPAN samples past the base, the base jumps to
    it and every carried time shifts down (0.0 'never' sentinels
    preserved). Below the span the base stays 0 and the arithmetic is
    bit-identical to the old absolute-time scan, so captures beyond the
    f32 mantissa (the PL/I tape is 49M samples; the old cap was 2^26)
    decode with full sub-sample clocking precision. m_frac (exact
    sub-sample offsets from refine_frac) enables the exact local-time
    rebuild f32(s - base) + frac; without it the absolute m_t is used
    (trace path, small captures only).

    debug_times additionally records each data char's clock-end time
    (char_t) for the -trace data lane (TRACE(data, clkendtime, ...),
    decode_ww.c:90); off by default to keep the carried buffer small."""
    clk_trks = [t for t in (pri_clk, alt_clk) if t >= 0]
    lsb_trks = [t for t in (pri_lsb, alt_lsb) if t >= 0]
    TIME_FIELDS = ("t_lastclkpulsestart", "t_lastclkpulseend",
                   "t_lastpriclkpulsestart", "t_lastaltclkpulsestart",
                   "t_lastpriclkpulseend", "t_lastblockmark",
                   "ww_lastpeak", "trk_lastpulsestart", "trk_lastpulseend",
                   "trk_lastpeak", "trk_prevlastpeak")

    def emit_block(st, btype, end_t, cond):
        """Record a block boundary (ww_end_of_block / ww_blockmark) when
        cond. The [maxblocks] arrays take ONE predicated dropped-index
        write instead of a whole-array where-merge: a full select costs
        O(maxblocks) per event, which at large-capture sizes moves
        megabytes per scan step (it crashed the TPU worker on a 70M-sample
        capture); the predicated write is bit-identical and O(1)."""
        i = jnp.where(cond, jnp.minimum(st["nblocks"], maxblocks - 1),
                      maxblocks)
        blk = dict(st)
        for name, val in [
                ("b_start", st["blockstart_char"]),
                ("b_end", st["datacount"]),
                ("b_type", btype),
                ("b_t_end", end_t),
                ("b_t_base", st["base"]),
                ("b_bitspace", st["clkavg"]["t_bitspaceavg"]),
                ("b_leadclk", jnp.int32(0)),
                ("b_missing1", st["w_missing_onebit"]),
                ("b_missingclk", st["w_missing_clock"])]:
            blk[name] = st[name].at[i].set(val, mode="drop")
        blk["nblocks"] = st["nblocks"] + cond.astype(I32)

        def sel(new, old):
            return jnp.where(cond, new, old)
        blk["blockstart_char"] = sel(st["datacount"],
                                     st["blockstart_char"])
        blk["w_missing_onebit"] = sel(jnp.int32(0), st["w_missing_onebit"])
        blk["w_missing_clock"] = sel(jnp.int32(0), st["w_missing_clock"])
        # ww_init_blockstate: reset clock + per-track peak memory
        blk["clkavg"] = jax.tree.map(sel, cm.clkavg_init(spb),
                                     st["clkavg"])
        for k in ("t_lastclkpulsestart", "t_lastclkpulseend",
                  "t_lastpriclkpulseend", "t_lastpriclkpulsestart",
                  "t_lastaltclkpulsestart"):
            blk[k] = sel(F32(0.0), st[k])
        blk["datablock"] = sel(jnp.bool_(False), st["datablock"])
        blk["trk_lastpeak"] = sel(jnp.zeros(T, F32), st["trk_lastpeak"])
        blk["trk_prevlastpeak"] = sel(jnp.zeros(T, F32),
                                      st["trk_prevlastpeak"])
        return blk

    def chk_databits(st, clkend, cond):
        """ww_chk_databits at a clock pulse end (decode_ww.c:51-92),
        applied when cond (predicated writes, see emit_block)."""
        b = st["clkavg"]["t_bitspaceavg"]
        def chk(trk):
            if trk < 0:
                return jnp.int32(0)
            tps = st["trk_lastpulsestart"][trk]
            hit = (tps > clkend - b) & (tps < clkend)
            return jnp.where(hit, 1, 2)
        r_pm = chk(pri_msb)
        r_am = chk(alt_msb)
        r_pl = chk(pri_lsb)
        r_al = chk(alt_lsb)
        msb = ((r_pm == 1) | (r_am == 1)).astype(I32)
        lsb = ((r_pl == 1) | (r_al == 1)).astype(I32)
        miss = ((r_pm | r_am) == 3).astype(I32) + ((r_pl | r_al) == 3).astype(I32)
        ch = (msb << 1) | lsb
        i = jnp.where(cond, jnp.minimum(st["datacount"], maxchars - 1),
                      maxchars)
        out = dict(st)
        out["chars"] = st["chars"].at[i].set(ch.astype(jnp.int8),
                                             mode="drop")
        if debug_times:
            out["char_t"] = st["char_t"].at[i].set(clkend, mode="drop")
        out["datacount"] = jnp.where(
            cond, jnp.minimum(st["datacount"] + 1, maxchars),
            st["datacount"])
        out["w_missing_onebit"] = st["w_missing_onebit"] + \
            jnp.where(cond, miss, 0)
        return out

    def step(st, x):
        trk, t_in, frac, s_det, is_top, valid = x
        b = st["clkavg"]["t_bitspaceavg"]

        # ---- rolling rebase (see docstring) ----
        ds = s_det - st["base"]
        reb = valid & (ds > REBASE_SPAN)
        dsf = ds.astype(F32)
        for k in TIME_FIELDS:
            st[k] = jnp.where(reb,
                              jnp.where(st[k] == 0.0, 0.0, st[k] - dsf),
                              st[k])
        st["base"] = jnp.where(reb, s_det, st["base"])
        s_rel = (s_det - st["base"]).astype(F32)
        # exact local event time; identical to the absolute t when the
        # base is 0 (t was computed as f32(s) + frac in refine_time)
        t = jnp.where(st["base"] == 0, t_in, s_rel + frac)

        # block end between events: the clock stopped (decoder.c:892-894)
        ended = (valid & st["datablock"] & (st["t_lastclkpulseend"] > 0) &
                 (s_rel - st["t_lastclkpulseend"] >
                  b * cm.WW_CLKSTOP_BITS))
        # queued blockmark: an LSB pulse end straggling past the last clock
        # (decode_ww.c:148-158)
        lsb_strag = jnp.bool_(False)
        for lt in lsb_trks:
            lsb_strag = lsb_strag | (
                st["trk_lastpulseend"][lt] - st["t_lastclkpulseend"] >
                b * cm.WW_PEAKSCLOSE_BITS)
        st = emit_block(st, jnp.int32(BS_BLOCK), t, ended)
        emit_mark = ended & lsb_strag
        st = emit_block(st, jnp.int32(BS_TAPEMARK), t, emit_mark)
        st["t_lastblockmark"] = jnp.where(emit_mark, t,
                                          st["t_lastblockmark"])

        # flux direction (decode_ww.c:244-271); mid-tape polarity changes
        # are counted like num_flux_polarity_changes (decode_ww.c:246)
        if fluxdir_req == FLUX_AUTO:
            faraway = (t - st["ww_lastpeak"]) > b * cm.WW_PEAKSFAR_BITS
            newdir = jnp.where(is_top, FLUX_POS, FLUX_NEG)
            setev = valid & faraway
            changed = setev & st["flux_set"] & (newdir != st["flux"])
            st["num_flux_changes"] = (st["num_flux_changes"] +
                                      changed.astype(I32))
            st["flux"] = jnp.where(setev, newdir, st["flux"])
            st["flux_set"] = st["flux_set"] | setev
            flux = st["flux"]
        else:
            flux = jnp.int32(fluxdir_req)
        st["ww_lastpeak"] = jnp.where(valid, t, st["ww_lastpeak"])

        is_start = valid & (is_top == (flux == FLUX_POS))
        is_end = valid & ~is_start

        is_clk = jnp.zeros((), bool)
        for ct in clk_trks:
            is_clk = is_clk | (trk == ct)
        is_pri_clk = (trk == pri_clk) if pri_clk >= 0 else jnp.bool_(False)
        is_alt_clk = (trk == alt_clk) if alt_clk >= 0 else jnp.bool_(False)
        is_lsb = jnp.zeros((), bool)
        for lt in lsb_trks:
            is_lsb = is_lsb | (trk == lt)

        # ---- pulse start (decode_ww.c:167-183) ----
        ps = is_start
        st["trk_lastpulsestart"] = st["trk_lastpulsestart"].at[
            jnp.where(ps, trk, T)].set(t, mode="drop")
        start_clk = ps & is_clk
        st["datablock"] = st["datablock"] | start_clk
        prevpeak = st["trk_prevlastpeak"][jnp.clip(trk, 0, T - 1)]
        clk_close = (t - prevpeak) < b * cm.WW_PEAKSFAR_BITS
        adj = cm.adjust_clock(st["clkavg"], t - prevpeak,
                              clk_window, clk_alpha, spb)
        st["clkavg"] = jax.tree.map(
            lambda n, o: jnp.where(start_clk & clk_close, n, o),
            adj, st["clkavg"])
        st["t_lastclkpulsestart"] = jnp.where(start_clk, t,
                                              st["t_lastclkpulsestart"])
        st["t_lastpriclkpulsestart"] = jnp.where(
            ps & is_pri_clk, t, st["t_lastpriclkpulsestart"])
        st["t_lastaltclkpulsestart"] = jnp.where(
            ps & is_alt_clk, t, st["t_lastaltclkpulsestart"])

        # ---- pulse end (decode_ww.c:185-232) ----
        pe = is_end
        st["trk_lastpulseend"] = st["trk_lastpulseend"].at[
            jnp.where(pe, trk, T)].set(t, mode="drop")
        # skew statistics vs the last primary clock pulse end
        # (decode_ww.c:192-203): normalize the delta to ~one bit spacing
        delta = t - st["t_lastpriclkpulseend"]
        near = pe & (st["t_lastpriclkpulseend"] > 0) & \
            (delta > -b * 1.5) & (delta < b * 1.5)
        delta = jnp.where(delta <= 0, delta + b,
                          jnp.where(delta < b * 0.5, delta + b, delta))
        # (int) cast truncates toward zero (decoder.c:160)
        bkt = ((delta - stat_leftbin) / stat_binwidth).astype(I32)
        bkt_c = jnp.clip(bkt, 0, 49)
        st["hist"] = st["hist"].at[jnp.where(near, trk, T),
                                   jnp.where(near, bkt_c, 0)].add(
            1, mode="drop")
        st["trksums"] = st["trksums"].at[
            jnp.where(near & (bkt >= 0) & (bkt <= 49), trk, T)].add(
            1, mode="drop")
        end_clk = pe & is_clk
        do_chk = end_clk & ((t - st["t_lastclkpulseend"]) >
                            b * cm.WW_PEAKSCLOSE_BITS)
        st = chk_databits(st, t, do_chk)
        st["t_lastclkpulseend"] = jnp.where(end_clk, t,
                                            st["t_lastclkpulseend"])
        # missing-clock warnings (decode_ww.c:210-223)
        end_pri = pe & is_pri_clk
        miss_alt = (end_pri & (st["t_lastaltclkpulsestart"] > 0) &
                    (st["t_lastaltclkpulsestart"] < t - b))
        end_alt = pe & is_alt_clk
        miss_pri = (end_alt & (st["t_lastpriclkpulsestart"] > 0) &
                    (st["t_lastpriclkpulsestart"] < t - b))
        st["w_missing_clock"] = (st["w_missing_clock"] +
                                 miss_alt.astype(I32) + miss_pri.astype(I32))
        st["t_lastpriclkpulseend"] = jnp.where(end_pri, t,
                                               st["t_lastpriclkpulseend"])
        # standalone blockmark: LSB pulse end with no clock running
        bm = (pe & is_lsb & (st["t_lastclkpulsestart"] == 0) &
              (t - st["t_lastblockmark"] > b))
        st = emit_block(st, jnp.int32(BS_TAPEMARK), t, bm)
        st["t_lastblockmark"] = jnp.where(bm, t, st["t_lastblockmark"])

        # per-track peak history (process_up/down_transition tail)
        tix = jnp.where(valid, trk, T)
        st["trk_prevlastpeak"] = st["trk_prevlastpeak"].at[tix].set(
            st["trk_lastpeak"][jnp.clip(trk, 0, T - 1)], mode="drop")
        st["trk_lastpeak"] = st["trk_lastpeak"].at[tix].set(t, mode="drop")
        return st, None

    init = dict(
        chars=jnp.zeros(maxchars, jnp.int8),
        **({"char_t": jnp.zeros(maxchars, F32)} if debug_times else {}),
        datacount=I32(0),
        blockstart_char=I32(0),
        nblocks=I32(0),
        b_start=jnp.zeros(maxblocks, I32),
        b_end=jnp.zeros(maxblocks, I32),
        b_type=jnp.zeros(maxblocks, I32),
        b_t_end=jnp.zeros(maxblocks, F32),
        b_t_base=jnp.zeros(maxblocks, I32),
        base=I32(0),
        b_bitspace=jnp.zeros(maxblocks, F32),
        b_leadclk=jnp.zeros(maxblocks, I32),
        b_missing1=jnp.zeros(maxblocks, I32),
        b_missingclk=jnp.zeros(maxblocks, I32),
        clkavg=cm.clkavg_init(spb),
        datablock=jnp.bool_(False),
        t_lastclkpulsestart=F32(0.0),
        t_lastclkpulseend=F32(0.0),
        t_lastpriclkpulsestart=F32(0.0),
        t_lastaltclkpulsestart=F32(0.0),
        t_lastpriclkpulseend=F32(0.0),
        t_lastblockmark=F32(0.0),
        ww_lastpeak=F32(0.0),
        flux=jnp.int32(FLUX_NEG if fluxdir_req == FLUX_AUTO else fluxdir_req),
        flux_set=jnp.bool_(False),
        trk_lastpulsestart=jnp.zeros(T, F32),
        trk_lastpulseend=jnp.zeros(T, F32),
        trk_lastpeak=jnp.zeros(T, F32),
        trk_prevlastpeak=jnp.zeros(T, F32),
        w_missing_onebit=I32(0),
        w_missing_clock=I32(0),
        num_flux_changes=I32(0),
        hist=jnp.zeros((T, 50), I32),
        trksums=jnp.zeros(T, I32),
    )
    if m_frac is None:
        m_frac = jnp.zeros_like(m_t)
    if init_state is not None:
        # resumable slices: huge captures run the scan in bounded pieces
        # (one long device program trips the runtime's execution watchdog),
        # threading the carried state through host calls; invalid events
        # are exact no-ops, so padded tails are safe
        init = init_state
    final, _ = jax.lax.scan(step, init,
                            (m_trk, m_t, m_frac, m_s, m_is_top, m_valid))
    if not flush:
        return final
    # flush a trailing block (samples continue past the last event, so the
    # clock-stop check would have fired eventually)
    lsb_strag = jnp.bool_(False)
    for lt in lsb_trks:
        lsb_strag = lsb_strag | (
            final["trk_lastpulseend"][lt] - final["t_lastclkpulseend"] >
            final["clkavg"]["t_bitspaceavg"] * cm.WW_PEAKSCLOSE_BITS)
    ended = final["datablock"] & (final["t_lastclkpulseend"] > 0)
    final2 = emit_block(final, jnp.int32(BS_BLOCK),
                        final["t_lastclkpulseend"], ended)
    emit_mark = ended & lsb_strag
    final2 = emit_block(final2, jnp.int32(BS_TAPEMARK),
                        final2["t_lastclkpulseend"], emit_mark)
    return final2


def assemble_ww_blocks(res_host, spb, reverse: bool):
    """Host-side block assembly (ww_assemble_data, decode_ww.c:94-127)."""
    out = []
    chars = res_host["chars"]
    n = int(res_host["nblocks"])
    for i in range(min(n, len(res_host["b_start"]))):
        btype = int(res_host["b_type"][i])
        if btype == BS_TAPEMARK:
            out.append(dict(kind="tapemark", data=b"", warnings={},
                            t_end_samples=float(res_host["b_t_base"][i]) +
                            float(res_host["b_t_end"][i])))
            continue
        a, b = int(res_host["b_start"][i]), int(res_host["b_end"][i])
        two = np.asarray(chars[a:b], np.int32)
        lead = 0
        if len(two) % 8 == 1 and len(two) >= 9:
            # a spurious leading clock produced one extra char: drop it
            two = two[1:]
            lead = 1
        if reverse:
            two = two[::-1]
        nbytes = len(two) // 4
        usable = two[:nbytes * 4]
        if len(usable):
            quads = usable.reshape(-1, 4)
            byts = ((quads[:, 0] << 6) | (quads[:, 1] << 4) |
                    (quads[:, 2] << 2) | quads[:, 3]).astype(np.uint8)
        else:
            byts = np.zeros(0, np.uint8)
        bitspace = float(res_host["b_bitspace"][i])
        speed_err = 1 if abs(bitspace - spb) / spb > cm.WW_MAX_CLK_VARIATION \
            else 0
        warnings = dict(
            ww_leading_clock=lead,
            ww_missing_onebit=int(res_host["b_missing1"][i]),
            ww_missing_clock=int(res_host["b_missingclk"][i]),
            ww_bad_length=0 if len(two) % 8 == 0 else 1,
            ww_speed_err=speed_err,
            avg_bit_spacing=bitspace,
        )
        out.append(dict(kind="data", data=byts.tobytes(), warnings=warnings,
                        t_end_samples=float(res_host["b_t_base"][i]) +
                        float(res_host["b_t_end"][i])))
    return out
