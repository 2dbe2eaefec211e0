"""Stage 2: exact peak admission as an O(events) scan.

Stage 1 produced *loose* candidate events (a superset). This scan walks the
candidates of each (parmset x track) lane in sample order and applies the
reference engine's exact sequential rules (decoder.c:700-810):

  - AGC-dependent rise / min-peak thresholds,
  - the blind-until-the-peak-exits-the-window rule (pkww_countdown),
  - +-0.5-sample peak-time interpolation (refine_peak),
  - per-mode AGC baseline measurement and gain updates.

The crucial point: the candidate *features* (window max/min, argmax position,
neighbors) are functions of the waveform alone, so the data-parallel stage 1
could precompute them; only the genuinely sequential admission decision runs
here, and it runs per event (10-20x sparser than samples).

Emits, per lane, the admitted transition list: detection sample, refined peak
time (sample units), top/bottom flag, and the AGC gain after the transition.
Mode-specific bit *emission* happens in the per-mode modules.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import common as cm
from .common import F32, I32, FLT_MAX


def admission_init(W):
    st = cm.agc_state_init()
    st.update(
        blind_until=I32(0),
        W=jnp.asarray(W, I32),
        v_top=F32(0.0),
        v_bot=F32(0.0),
        n_admitted=I32(0),
    )
    return st


def admission_test(st, ev, rise_parm, min_parm):
    """The exact lookfor_peak threshold test (decoder.c:781-810)."""
    visible = ev["valid"] & (ev["s"] >= st["blind_until"])
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
    admit_top = visible & is_top
    admit_bot = visible & is_bot
    return admit_top, admit_bot


def refine_time(st, ev, admit_top):
    """refine_peak (decoder.c:700-749): first occurrence of the extreme in
    the window, +-0.5 sample interpolation against PEAK_THRESHOLD/agc, and
    the C's verbatim time formula (which uses the full window width even
    while the window is still filling)."""
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
    t_peak = ev["s"].astype(F32) - ((st["W"] - L).astype(F32) - adj)
    return t_peak, L


def nrzi_gcr_agc_step(st, admit_top, admit_bot, agc_alpha, agc_window):
    """The AGC bookkeeping shared verbatim by nrzi_top/bot
    (decode_nrzi.c:196-230) and gcr_top/bot (decode_gcr.c:843-865):
      top: peaks 5..15 accumulate baseline; beyond 15, first finishes the
           baseline, later ones adjust AGC
      bot: beyond 15 with baseline finished, adjust AGC."""
    admit = admit_top | admit_bot
    pc = st["peakcount"] + admit.astype(I32)

    height = st["v_top"] - st["v_bot"]
    in_base = admit_top & (pc >= cm.AGC_STARTBASE) & (pc <= cm.AGC_ENDBASE)
    past = pc > cm.AGC_ENDBASE
    do_finish = admit_top & past & (st["v_avg_height_count"] > 0)
    do_agc_top = admit_top & past & (st["v_avg_height_count"] == 0)
    do_agc_bot = admit_bot & (pc > cm.AGC_ENDBASE) & (st["v_avg_height_count"] == 0)
    do_agc = do_agc_top | do_agc_bot

    acc = cm.accumulate_baseline(st, height, agc_window)
    fin = cm.finish_baseline(st)
    agc = cm.adjust_agc(st, agc_alpha, agc_window)

    out = dict(st)
    for k in ("v_avg_height_sum", "v_avg_height_count", "v_heights",
              "heightndx", "v_avg_height", "agc_gain",
              "max_agc_gain", "min_agc_gain"):
        out[k] = jnp.where(in_base, acc[k],
                           jnp.where(do_finish, fin[k],
                                     jnp.where(do_agc, agc[k], st[k])))
    out["peakcount"] = pc
    return out


@partial(jax.jit, static_argnames=("with_agc_trace",))
def nrzi_track_scan(events, W, rise_parm, min_parm, agc_alpha, agc_window,
                    with_agc_trace=True):
    """Admission scan for NRZI (also used by the deskew/density calibration
    passes). events: dict of [E] arrays for ONE lane. Scalar parms.
    Returns per-event outputs: admit, is_top, t_peak, agc_after."""

    def step(st, ev):
        admit_top, admit_bot = admission_test(st, ev, rise_parm, min_parm)
        admit = admit_top | admit_bot
        t_peak, L = refine_time(st, ev, admit_top)

        # new extremes recorded at detection (v_top=wmax / v_bot=wmin)
        st2 = dict(st)
        st2["v_top"] = jnp.where(admit_top, ev["wmax"], st["v_top"])
        st2["v_bot"] = jnp.where(admit_bot, ev["wmin"], st["v_bot"])

        # first data bit initializes max_agc_gain (nrzi_addbit:149)
        first = admit & (st["n_admitted"] == 0)
        st2["max_agc_gain"] = jnp.where(first, st["agc_gain"],
                                        st["max_agc_gain"])
        st2["n_admitted"] = st["n_admitted"] + admit.astype(I32)

        st3 = nrzi_gcr_agc_step(st2, admit_top, admit_bot,
                                agc_alpha, agc_window)

        # process_up/down_transition tail: remember last top/bot values
        st3["v_lasttop"] = jnp.where(admit_top, ev["wmax"], st["v_lasttop"])
        st3["v_lastbot"] = jnp.where(admit_bot, ev["wmin"], st["v_lastbot"])
        st3["blind_until"] = jnp.where(admit, ev["s"] + L + 1,
                                       st["blind_until"])
        out = dict(admit=admit, is_top=admit_top, t_peak=t_peak,
                   s_det=ev["s"], agc_after=st3["agc_gain"])
        return st3, out

    init = admission_init(W)
    final, outs = jax.lax.scan(step, init, events)
    return final, outs


def compact_admitted(admit, payload, cap, fill_s):
    """Compact per-event payload arrays (each [..., E]) down to the admitted
    transitions [..., cap], in order. admit: bool [..., E]. fill_s: value for
    the s_det field of unused slots (a large sentinel)."""
    lead = admit.shape[:-1]
    E = admit.shape[-1]
    flat_admit = admit.reshape(-1, E)
    pos = jnp.cumsum(flat_admit, axis=-1) - 1
    scat = jnp.where(flat_admit, jnp.minimum(pos, cap - 1), cap)

    def one(dst_fill, src):
        flat_src = src.reshape(-1, E)
        out = jnp.full((flat_src.shape[0], cap + 1), dst_fill, flat_src.dtype)
        out = jax.vmap(lambda o, st_, v: o.at[st_].set(v, mode="drop"))(
            out, scat, flat_src)
        return out[:, :cap].reshape(*lead, cap)

    counts = jnp.sum(flat_admit, axis=-1).astype(I32).reshape(lead)
    return {k: one(fill_s if k == "s_det" else 0, v)
            for k, v in payload.items()}, counts
