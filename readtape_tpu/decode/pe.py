"""PE decoder (9-track 1600 BPI phase encoding).

PE is self-clocking per track (decode_pe.c): each track independently detects
its preamble (>=70 zero peaks then a missed-clock 1-bit, with automatic
polarity detection), classifies subsequent transitions as clock or data using
the t_clkwindow / pulse-adjustment rules, bridges dropouts with fake bits,
and strips the postamble at end of block.

Because there is no cross-track coupling until block assembly, the ENTIRE
decoder fuses into the stage-2 jump scan: one lax.scan per (parmset x track)
lane emits that track's bit stream directly. Block assembly (tapemark
pattern, postamble strip, parity) is vectorized afterwards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import common as cm
from . import trackscan as ts
from .common import F32, I32
from .nrzi import BS_BLOCK, BS_NOISE, BS_TAPEMARK


RUN_CAP = 128        # max dropout fake-bit runs per track per segment
IDLE_CAP = 510       # max idle-entry intervals streamed per track per scan
IDLE_ECAP = 128      # idle entries tested as all-idle candidates (the fire
                     # point is the FIRST simultaneous idle, so only early
                     # entries can trigger it; later ones are interval data)
BIG_TAU = np.int32(2 ** 30)


def idle_entry_sample(t_lp, thr, s_floor):
    """First integer sample s >= s_floor where (f32(s) - t_lp) > thr --
    the sample at which the reference's per-sample idle check
    (decoder.c:868: timenow - t_lastpeak > bitspaceavg * PE_IDLE_FACTOR)
    first fires after a peak at t_lp. Evaluated with the same f32
    arithmetic as the in-scan was_idle test so entry points are exactly
    the scan's own idle semantics."""
    x = t_lp + thr
    c = jnp.floor(x).astype(I32)
    offs = c - 1 + jnp.arange(4, dtype=I32)
    pred = (offs.astype(F32) - t_lp) > thr
    e = jnp.where(jnp.any(pred), c - 1 + jnp.argmax(pred), c + 2)
    return jnp.maximum(e, s_floor)


@partial(jax.jit, static_argnames=("S", "nsteps", "maxb", "clk_ring",
                                    "agc_ring", "pre", "debug_peaks",
                                    "idle_out"))
def pe_track_scan(v_trk, nxt_trk, W, S: int, nsteps: int,
                  rise_parm, min_parm, agc_alpha, agc_window,
                  clk_window, clk_alpha, clk_factor, pulse_adj_parm,
                  spb, maxb: int,
                  stat_leftbin=jnp.float32(0.0),
                  stat_binwidth=jnp.float32(1.0),
                  clk_ring: int = cm.CLKRATE_WINDOW,
                  agc_ring: int = cm.AGC_MAX_WINDOW,
                  pre: bool = False, debug_peaks: bool = False,
                  idle_out: bool = False,
                  t_lp_virtual=F32(0.0), s_first_check=I32(0)):
    """One (parmset x track) lane. Returns the final state including the
    emitted bit/fake buffers. With pre=True the first argument is the
    PRECOMPUTED [10, S] feature pack for this lane's (static) window
    width instead of the raw voltages.

    idle_out=True streams the raw per-step records out in the final state
    (final["_st_*"]) INSTEAD of replaying them into bit buffers, plus the
    track's idle-entry intervals (decoder.c:868-877): the caller computes
    the cross-track all-idle point tau and builds the block result from
    the streams truncated at tau (pe_apply_tau) -- the reference's
    end-of-block semantics, where nothing after tau exists. t_lp_virtual /
    s_first_check seed the pre-first-peak idle clock: the reference
    initializes t_lastpeak to the block's first scanned sample (staggered
    one sample per track by the init `break`, decoder.c:856-862), so a
    silent track goes idle ~PE_IDLE_FACTOR bit times after block start."""

    def extra(st2, st, ev, admit_top, admit_bot, t_peak, s):
        admit = admit_top | admit_bot
        s_now = s.astype(F32)
        b = st["clkavg"]["t_bitspaceavg"]
        pc = st["peakcount"] + admit.astype(I32)
        st2["peakcount"] = pc
        t_this = t_peak

        # ---- idle detection + fake-bit generation (decoder.c:868-877,
        # decode_pe.c:245-258): idle was declared at an earlier sample if the
        # gap since the last peak exceeded PE_IDLE_FACTOR bit times.
        was_idle = st["idle"] | (
            (s_now - 1.0 - st["t_lastpeak"]) > b * cm.PE_IDLE_FACTOR)
        gen_fakes = (admit & was_idle & st["datablock"] &
                     (st["datacount"] > 1))
        numfake = jnp.floor((s_now - st["t_lastbit"]) /
                            jnp.maximum(b, 1e-3)).astype(I32)
        numfake = jnp.where(gen_fakes, jnp.maximum(numfake, 0), 0)
        run = dict(start=st["datacount"], length=numfake,
                   bit=st["lastdatabit"], valid=gen_fakes & (numfake > 0))
        dc = jnp.minimum(st["datacount"] + run["length"], maxb)
        t_lastbit = jnp.where(run["valid"], F32(0.0), st["t_lastbit"])
        clknext_f = jnp.where(gen_fakes, st["lastdatabit"] != 0,
                              st["clknext"])
        st2["idle"] = jnp.where(admit, False, st["idle"])

        # ---- preamble (decode_pe.c:127-155) ----
        in_pre = admit & ~st["datablock"]
        first_peak = in_pre & (pc == 1)
        bit1_up = jnp.where(first_peak, ~admit_top, st["bit1_up"])
        start_data = (in_pre & (pc > cm.PE_MIN_PREBITS) &
                      (bit1_up == admit_top) &
                      ((t_this - st["t_lastpeak"]) > st["t_clkwindow"]))
        clknext_pre = admit_top != bit1_up
        acc_ok = (in_pre & ~start_data & (pc >= cm.AGC_STARTBASE) &
                  (pc <= cm.AGC_ENDBASE) & (st2["v_top"] > st2["v_bot"]))
        acc = cm.accumulate_baseline(st2, st2["v_top"] - st2["v_bot"],
                                     agc_window)
        datablock = st["datablock"] | start_data
        v_avg_height = jnp.where(
            start_data,
            st["v_avg_height_sum"] /
            jnp.maximum(st["v_avg_height_count"], 1).astype(F32),
            st["v_avg_height"])

        # ---- data classification (decode_pe.c:157-201) ----
        in_data = admit & st["datablock"]          # datablock BEFORE this peak
        # peak statistics (pe_top/bot:159-160,182-183): every data-block
        # peak, vs the previous peak, with the PRE-update clock. In-range
        # buckets 0..49 count toward trksums; out-of-range maps to the
        # extremes without trksums (52 -> 0, 53 -> 49); 50 = unrecorded.
        stat_val = t_this - st["t_lastpeak"]
        # (int) cast truncates toward zero (decoder.c:160)
        stat_bkt = ((stat_val - stat_leftbin) / stat_binwidth).astype(I32)
        stat_hb = jnp.where(
            in_data,
            jnp.where(stat_bkt < 0, 52,
                      jnp.where(stat_bkt > 49, 53, stat_bkt)), 50)
        missed = (t_this + st["t_pulse_adj"]) - st["t_lastpeak"] > st["t_clkwindow"]
        is_data = in_data & (~st["clknext"] | missed)
        bitval = jnp.where(admit_top, bit1_up, ~bit1_up)

        # pe_addbit (decode_pe.c:104-125): clock adjusts on every real data
        # bit; t_lastbit==0 (after fake generation) re-seeds one bit back.
        t_lb_seed = jnp.where(t_lastbit == 0.0, t_this - spb, t_lastbit)
        clk_new = cm.adjust_clock(st["clkavg"], t_this - t_lb_seed,
                                  clk_window, clk_alpha, spb)
        clkavg = jax.tree.map(lambda n, o: jnp.where(is_data, n, o),
                              clk_new, st["clkavg"])
        t_clkwindow = jnp.where(is_data,
                                clkavg["t_bitspaceavg"] / 2 * clk_factor,
                                st["t_clkwindow"])
        widx = jnp.where(is_data, jnp.minimum(dc, maxb - 1), maxb)
        t_firstbit = jnp.where(is_data & (dc == 0), t_this, st["t_firstbit"])
        dc = jnp.where(is_data, jnp.minimum(dc + 1, maxb), dc)
        t_lastbit = jnp.where(is_data, t_this, t_lastbit)
        lastdatabit = jnp.where(is_data, bitval, st["lastdatabit"])
        clknext = jnp.where(in_data, is_data,
                            jnp.where(in_pre & ~start_data, clknext_pre,
                                      clknext_f))
        t_pulse_adj = jnp.where(
            in_data,
            ((t_this - st["t_lastpeak"]) -
             clkavg["t_bitspaceavg"] / jnp.where(missed, 1.0, 2.0)) *
            pulse_adj_parm,
            st["t_pulse_adj"])

        # ---- AGC: pe_top/bot run adjust_agc on every data-block peak ----
        agc_new = cm.adjust_agc(st2, agc_alpha, agc_window)
        out = dict(st2)
        for kk in ("agc_gain", "v_heights", "heightndx",
                   "max_agc_gain", "min_agc_gain"):
            out[kk] = jnp.where(in_data, agc_new[kk],
                                jnp.where(acc_ok, acc.get(kk, st2[kk]),
                                          st2[kk]))
        for kk in ("v_avg_height_sum", "v_avg_height_count"):
            out[kk] = jnp.where(acc_ok, acc[kk], st2[kk])
        out["v_avg_height"] = v_avg_height
        out["datablock"] = datablock
        out["bit1_up"] = bit1_up
        out["clknext"] = clknext
        out["t_clkwindow"] = t_clkwindow
        out["clkavg"] = clkavg
        out["t_pulse_adj"] = t_pulse_adj
        out["datacount"] = dc
        out["t_firstbit"] = t_firstbit
        out["t_lastbit"] = t_lastbit
        out["lastdatabit"] = lastdatabit
        out["corrected_bits"] = st["corrected_bits"] + jnp.where(
            run["valid"], run["length"], 0)
        out["v_lasttop"] = jnp.where(admit_top, ev["wmax"], st["v_lasttop"])
        out["v_lastbot"] = jnp.where(admit_bot, ev["wmin"], st["v_lastbot"])
        out["t_lastpeak"] = jnp.where(admit, t_this, st["t_lastpeak"])
        # bit writes + fake-bit runs stream out as scan outputs (in-carry
        # buffer scatters force per-iteration copies on TPU)
        rec = dict(widx=widx, bitval=bitval.astype(jnp.int8),
                   run_start=run["start"], run_len=run["length"],
                   run_bit=run["bit"].astype(jnp.int8),
                   run_valid=run["valid"], hb=stat_hb)
        if idle_out:
            # idle-entry interval: the track went idle between the previous
            # admission and this one (decoder.c:868-877). The entry sample
            # uses the PRE-admission clock/lastpeak (between admissions the
            # clock is constant); the floor is the previous admission's
            # detection sample (the check runs from there on, with the
            # just-updated t_lastpeak).
            thr = st["clkavg"]["t_bitspaceavg"] * np.float32(
                cm.PE_IDLE_FACTOR)
            entry = idle_entry_sample(st["t_lastpeak"], thr, st["s_lastdet"])
            out["s_lastdet"] = jnp.where(admit, s, st["s_lastdet"])
            rec.update(adm=admit, s_det=s,
                       ie_valid=admit & (entry <= s - 1), ie_e=entry,
                       t_fb=out["t_firstbit"], t_lb=out["t_lastbit"],
                       agc_mx=out["max_agc_gain"], agc_mn=out["min_agc_gain"])
        if debug_peaks:
            rec.update(admit=admit, s_det=s, t_pk=t_peak, is_top=admit_top,
                       is_data=is_data, clkw=t_clkwindow,
                       bitval=bitval.astype(jnp.int8))
        return out, rec

    init_extra = dict(
        idle=jnp.bool_(True),
        datablock=jnp.bool_(False),
        clknext=jnp.bool_(False),
        bit1_up=jnp.bool_(True),
        clkavg=cm.clkavg_init(spb, clk_ring),
        t_clkwindow=spb / 2 * clk_factor,
        t_pulse_adj=F32(0.0),
        t_lastbit=F32(0.0),
        t_firstbit=F32(0.0),
        # the virtual pre-first-peak t_lastpeak (decoder.c:856-862);
        # 0.0 (the default) reproduces the historical init exactly for
        # callers without idle tracking (it only feeds was_idle, which the
        # idle=True init forces anyway at the first admission)
        t_lastpeak=t_lp_virtual,
        datacount=I32(0),
        lastdatabit=jnp.bool_(False),
        corrected_bits=I32(0),
    )
    if idle_out:
        init_extra["s_lastdet"] = s_first_check
    if pre:
        ev_fn = lambda st, s: ts.gather_window_features(v_trk, s)
    else:
        WMAX = W if isinstance(W, int) else cm.PKWW_MAX_WIDTH
        ev_fn = lambda st, s: ts.window_features(v_trk, s, st["W"], S, WMAX)
    final, recs = ts.run_jump_scan_seq(extra, init_extra, ev_fn, nxt_trk,
                                       W, S, nsteps, rise_parm, min_parm,
                                       agc_ring=agc_ring)
    if debug_peaks:    # admitted-peak stream for -trace / per-peak diffing
        final.update(ts.compact_outputs(
            recs["admit"], maxb,
            tr_s=(recs["s_det"], ts.BIG_S),
            tr_t=(recs["t_pk"], F32(0.0)),
            tr_top=(recs["is_top"], False),
            tr_isdata=(recs["is_data"], False),
            tr_clkw=(recs["clkw"], F32(0.0)),
            tr_bitval=(recs["bitval"], np.int8(0))))
        final["n_admitted"] = jnp.sum(recs["admit"].astype(I32))
    if idle_out:
        # defer the bit replay to pe_apply_tau (it needs the cross-track
        # all-idle point); stream the records out plus this track's
        # compacted idle intervals, including the trailing entry after the
        # last admission (wake = BIG_TAU: nothing wakes it in this scan)
        final.update(ts.compact_outputs(
            recs["ie_valid"], IDLE_CAP,
            ie_e=(recs["ie_e"], BIG_TAU),
            ie_w=(recs["s_det"], BIG_TAU)))
        final["n_ie"] = jnp.sum(recs["ie_valid"].astype(I32))
        thr_t = final["clkavg"]["t_bitspaceavg"] * np.float32(
            cm.PE_IDLE_FACTOR)
        final["ie_trail"] = idle_entry_sample(
            final["t_lastpeak"], thr_t, final["s_lastdet"])
        for k in ("adm", "s_det", "widx", "bitval", "run_start", "run_len",
                  "run_bit", "run_valid", "hb", "t_fb", "t_lb", "agc_mx",
                  "agc_mn"):
            final["_st_" + k] = recs[k]
        return final
    final.update(pe_replay_streams(recs, maxb))
    return final


def pe_replay_streams(recs, maxb: int, mask=None):
    """Replay the scan's streamed bit/run/stat records into the block
    buffers (bits, faked, hist, trksum). mask (bool [nsteps]) truncates
    the stream -- records where mask is False never happened (the
    reference's end-of-block: nothing after the all-idle point exists)."""
    widx = recs["widx"]
    run_valid = recs["run_valid"]
    hb = recs["hb"]
    if mask is not None:
        widx = jnp.where(mask, widx, maxb)
        run_valid = run_valid & mask
        hb = jnp.where(mask, hb, 50)
    out = {}
    # replay streamed bit writes (indices are unique and monotonic)
    out["bits"] = jnp.zeros(maxb, jnp.int8).at[widx].set(
        recs["bitval"], mode="drop")
    hb2 = jnp.where(hb == 52, 0, jnp.where(hb == 53, 49, hb))
    out["hist"] = jnp.zeros(50, I32).at[hb2].add(1, mode="drop")
    out["trksum"] = jnp.sum((hb <= 49).astype(I32))
    out["faked"] = jnp.zeros(maxb, jnp.int8)
    out.update(ts.compact_outputs(
        run_valid, RUN_CAP,
        run_start=(recs["run_start"], 0),
        run_len=(recs["run_len"], 0),
        run_bit=(recs["run_bit"], np.int8(0))))
    out["n_runs"] = jnp.sum(run_valid.astype(I32))

    # apply accumulated fake-bit runs (non-overlapping by construction)
    valid = jnp.arange(RUN_CAP) < out["n_runs"]
    starts = jnp.where(valid, out["run_start"], maxb)
    ends = jnp.where(valid,
                     jnp.minimum(out["run_start"] + out["run_len"],
                                 maxb), maxb)
    delta = jnp.zeros(maxb + 1, I32).at[starts].add(1, mode="drop")
    delta = delta.at[ends].add(-1, mode="drop")
    inrun = jnp.cumsum(delta[:maxb]) > 0
    bvals = out["run_bit"].astype(I32)
    vdelta = jnp.zeros(maxb + 1, I32).at[starts].add(bvals, mode="drop")
    vdelta = vdelta.at[ends].add(-bvals, mode="drop")
    runbit = jnp.cumsum(vdelta[:maxb])
    out["bits"] = jnp.where(inrun, runbit.astype(jnp.int8), out["bits"])
    out["faked"] = jnp.where(inrun, jnp.int8(1), out["faked"])
    return out


def pe_idle_tau(e, w, valid):
    """First sample where ALL tracks are simultaneously idle -- the
    reference's pe_end_of_block trigger (decoder.c:868-877: per-track
    idle entries bump num_trks_idle; the block ends the moment it reaches
    ntrks). e, w, valid: [T, C] idle intervals per track (entry sample,
    wake = the next admission's detection sample, BIG_TAU-sentinel).

    The track loop runs in index order within a sample, and a track's
    admission (wake) precedes its own idle check, so at a candidate entry
    (track i, sample s): tracks k < i count as idle if idle at s (their
    sample-s processing already ran), tracks k > i if idle at s-1 (theirs
    has not). Only the first IDLE_ECAP entries per track are tested as
    candidates (the fire point is the FIRST simultaneous idle); intervals
    beyond that still participate as coverage. Returns BIG_TAU if the
    tracks never align."""
    T, C = e.shape
    ECAP = min(C, IDLE_ECAP)
    cand_e = e[:, :ECAP]                                   # [T, ECAP]
    cand_ok = valid[:, :ECAP]
    s0 = cand_e.reshape(-1)                                # [N]
    ok0 = cand_ok.reshape(-1)
    ti = jnp.repeat(jnp.arange(T, dtype=I32), ECAP)        # [N]

    def idle_at(s):                                        # [N] -> [N, T]
        return jnp.any(valid[None, :, :]
                       & (e[None, :, :] <= s[:, None, None])
                       & (s[:, None, None] < w[None, :, :]), axis=2)

    ia_now = idle_at(s0)
    ia_prev = idle_at(s0 - 1)
    k = jnp.arange(T, dtype=I32)[None, :]
    cond = jnp.all(jnp.where(k < ti[:, None], ia_now,
                             jnp.where(k > ti[:, None], ia_prev, True)),
                   axis=1)
    fire = ok0 & cond
    return jnp.min(jnp.where(fire, s0, BIG_TAU))


def pe_apply_tau(final, maxb: int, nsteps: int, tau):
    """Truncate one parmset lane's per-track scan streams at the all-idle
    sample tau and rebuild the per-track block state pe_finish consumes:
    the reference's scan stopped at tau (pe_end_of_block), so admissions
    with detection sample >= tau never happened. tau = BIG_TAU (no fire)
    reproduces the full-scan state exactly. final: per-track stacked
    (leading axis T) scan state with _st_* streams from
    pe_track_scan(idle_out=True)."""
    def one_track(fin):
        mask = fin["_st_adm"] & (fin["_st_s_det"] < tau)
        # streams are chunk-padded by run_jump_scan_seq (>= nsteps)
        steps = jnp.arange(mask.shape[0], dtype=I32)
        last = jnp.max(jnp.where(mask, steps, -1))
        has = last >= 0

        def at_last(field, init):
            return jnp.where(has, field[jnp.maximum(last, 0)],
                             jnp.asarray(init, field.dtype))

        fakes = jnp.sum(jnp.where(mask & fin["_st_run_valid"],
                                  fin["_st_run_len"], 0))
        recs = {k: fin["_st_" + k] for k in
                ("widx", "bitval", "run_start", "run_len", "run_bit",
                 "run_valid", "hb")}
        out = pe_replay_streams(recs, maxb, mask=mask)
        out["peakcount"] = jnp.sum(mask.astype(I32))
        out["datacount"] = jnp.minimum(
            jnp.sum((mask & (fin["_st_widx"] < maxb)).astype(I32)) + fakes,
            maxb)
        out["t_firstbit"] = at_last(fin["_st_t_fb"], F32(0.0))
        out["t_lastbit"] = at_last(fin["_st_t_lb"], F32(0.0))
        out["max_agc_gain"] = at_last(fin["_st_agc_mx"], F32(0.0))
        out["min_agc_gain"] = at_last(fin["_st_agc_mn"], cm.FLT_MAX)
        out["corrected_bits"] = fakes
        out["incomplete"] = fin["incomplete"]
        out["n_consumed"] = out["peakcount"]
        out["n_total"] = jnp.sum(fin["_st_adm"].astype(I32))
        return out

    return jax.vmap(one_track)(final)


def pe_finish(finals, T: int, expected_parity, revparity, maxb: int):
    """Block assembly for one parmset lane: tapemark test, postamble strip,
    parity count (decode_pe.c:33-102). finals: per-track stacked state."""
    trk = jnp.arange(T)
    dc = finals["datacount"]            # [T]
    pc = finals["peakcount"]

    # tapemark (9-track only): specific live/erased track pattern
    if T == 9:
        live = jnp.asarray([1, 0, 1, 0, 0, 1, 1, 1, 1], bool)
        is_tm = (jnp.all(jnp.where(live, (dc <= 2) & (pc > 75), True)) &
                 jnp.all(jnp.where(~live, pc <= 2, True)))
    else:
        is_tm = jnp.bool_(False)

    avg_sp = jnp.mean((finals["t_lastbit"] - finals["t_firstbit"]) /
                      jnp.maximum(dc, 1).astype(F32))

    # postamble strip per track: remove trailing bits through the first 1-bit
    # found after ignoring PE_IGNORE_POSTBITS (max PE_MAX_POSTBITS+1 removed)
    j = jnp.arange(cm.PE_MAX_POSTBITS + 1, dtype=I32)     # [41]
    pos = dc[:, None] - 1 - j[None, :]                    # [T, 41]
    pos_c = jnp.clip(pos, 0, maxb - 1)
    bit_at = jnp.take_along_axis(finals["bits"].astype(I32), pos_c, axis=1)
    fake_at = jnp.take_along_axis(finals["faked"].astype(I32), pos_c, axis=1)
    stop = (j[None, :] > cm.PE_IGNORE_POSTBITS) & (bit_at == 1) & (pos >= 0)
    any_stop = jnp.any(stop, axis=1)
    first_stop = jnp.argmax(stop, axis=1)
    nstrip = jnp.where(any_stop, first_stop + 1,
                       jnp.int32(cm.PE_MAX_POSTBITS + 1))
    nstrip = jnp.where(dc > 0, jnp.minimum(nstrip, dc), 0)
    stripped_fakes = jnp.sum(
        jnp.where((j[None, :] < nstrip[:, None]) & (pos >= 0), fake_at, 0))
    dc2 = dc - nstrip

    minbits = jnp.min(dc2)
    maxbits = jnp.max(dc2)
    corrected = jnp.maximum(
        jnp.sum(finals["corrected_bits"]) - stripped_fakes, 0)

    has_data = dc > 0
    alltrk_max = jnp.max(jnp.where(has_data, finals["max_agc_gain"], 0.0))
    alltrk_min = jnp.min(jnp.where(has_data, finals["min_agc_gain"],
                                   cm.FLT_MAX))

    frames = jnp.sum(
        (finals["bits"].astype(I32) << (T - 1 - trk)[:, None]) *
        (jnp.arange(maxb)[None, :] < dc2[:, None]), axis=0)
    faked_frames = jnp.sum(
        (finals["faked"].astype(I32) << (T - 1 - trk)[:, None]) *
        (jnp.arange(maxb)[None, :] < dc2[:, None]), axis=0)

    is_noise = (~is_tm) & (maxbits == 0)
    is_block = (~is_tm) & (~is_noise)
    mismatch = jnp.where(is_block & (minbits != maxbits),
                         maxbits - minbits, 0)

    exp_par = jnp.where((revparity > 0) & (maxbits == revparity),
                        1 - expected_parity, expected_parity)
    par = cm.parity9(frames)
    keep = jnp.arange(maxb) < minbits
    vparity = jnp.sum(jnp.where(keep & is_block,
                                (par != exp_par).astype(I32), 0))

    blktype = jnp.where(is_tm, BS_TAPEMARK,
                        jnp.where(is_noise, BS_NOISE, BS_BLOCK))
    errcount = mismatch + vparity
    warncount = corrected
    return dict(
        blktype=blktype, minbits=minbits, maxbits=maxbits,
        track_mismatch=mismatch, vparity_errs=vparity,
        crc_errs=jnp.int32(0), lrc_errs=jnp.int32(0),
        errcount=errcount, warncount=warncount,
        missed_midbits=jnp.int32(0), corrected_bits=corrected,
        faked_tracks=jnp.int32(0),
        avg_bit_spacing=avg_sp, frames=frames, faked_frames=faked_frames,
        hist=finals["hist"], trksums=finals["trksum"],
        consume_overflow=jnp.any(finals["incomplete"]),
        alltrk_max_agc=alltrk_max, alltrk_min_agc=alltrk_min,
    )
