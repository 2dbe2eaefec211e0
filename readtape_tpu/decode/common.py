"""Shared constants and numeric helpers for the decode engine.

All times inside the device pipeline are expressed in *sample units* (float32,
relative to the start of the segment being decoded): the reference's absolute
double-precision seconds are only needed for logging, and sample-unit float32
carries more than enough precision within a block (< 2^23 samples) while
staying on the TPU fast path. Conversion to absolute seconds happens on the
host at the edges.

Constant values mirror decoder.h:101-155.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
I32 = jnp.int32

PKWW_MAX_WIDTH = 50
PKWW_PEAKHEIGHT = 4.0          # nominal peak-to-peak volts for rise scaling
PEAK_THRESHOLD = 0.005         # volts defining "same peak" (refine interp)
AGC_MAX_WINDOW = 10
AGC_MAX_VALUE = 2.0
AGC_STARTBASE = 5              # peaks 5..15 measure the baseline height
AGC_ENDBASE = 15
CLKRATE_WINDOW = 50

NRZI_IBG_SECS = 200e-6
NRZI_MIN_BLOCK = 10
NRZI_MAX_MISMATCH = 10
NRZI_BADTRK_FACTOR = 2.0
GCR_IDLE_THRESH = 6.0
GCR_IBG_SECS = 200e-6
PE_IDLE_FACTOR = 2.5
PE_IBG_SECS = 200e-6
PE_IGNORE_POSTBITS = 5
PE_MIN_PREBITS = 70
PE_MAX_POSTBITS = 40
WW_CLKSTOP_BITS = 1.5
WW_PEAKSCLOSE_BITS = 0.5
WW_PEAKSFAR_BITS = 2.0
WW_MAX_CLK_VARIATION = 0.10
MAXBLOCK = 131072

FLT_MAX = np.float32(3.4028235e38)


@dataclasses.dataclass(frozen=True)
class ParmArrays:
    """Parmset values as stacked device arrays, one entry per parmset.
    This is the batch axis that replaces the reference's sequential
    retry-with-reseek loop (readtape.c:1755-1795)."""
    clk_window: jnp.ndarray     # int32 [P]
    clk_alpha: jnp.ndarray      # f32 [P]
    agc_window: jnp.ndarray     # int32 [P]
    agc_alpha: jnp.ndarray      # f32 [P]
    min_peak: jnp.ndarray       # f32 [P]
    clk_factor: jnp.ndarray     # f32 [P]
    pulse_adj: jnp.ndarray      # f32 [P]
    pkww_bitfrac: jnp.ndarray   # f32 [P]
    pkww_rise: jnp.ndarray      # f32 [P]
    midbit: jnp.ndarray         # f32 [P]
    z1pt: jnp.ndarray           # f32 [P]
    z2pt: jnp.ndarray           # f32 [P]

    @staticmethod
    def from_parmsets(ps) -> "ParmArrays":
        def arr(name, dtype):
            return jnp.asarray([getattr(p, name) for p in ps.sets], dtype)
        return ParmArrays(
            clk_window=arr("clk_window", I32),
            clk_alpha=arr("clk_alpha", F32),
            agc_window=arr("agc_window", I32),
            agc_alpha=arr("agc_alpha", F32),
            min_peak=arr("min_peak", F32),
            clk_factor=arr("clk_factor", F32),
            pulse_adj=arr("pulse_adj", F32),
            pkww_bitfrac=arr("pkww_bitfrac", F32),
            pkww_rise=arr("pkww_rise", F32),
            midbit=arr("midbit", F32),
            z1pt=arr("z1pt", F32),
            z2pt=arr("z2pt", F32),
        )

jax.tree_util.register_pytree_node(
    ParmArrays,
    lambda pa: (tuple(getattr(pa, f.name) for f in dataclasses.fields(pa)), None),
    lambda _, ch: ParmArrays(*ch))


def pkww_width_for(bitfrac: float, bpi: float, ips: float, deltat: float) -> int:
    """Peak-window width in samples (readtape.c:1455-1457)."""
    if bpi <= 0:
        return 8
    return max(2, min(PKWW_MAX_WIDTH, int(bitfrac / (bpi * ips * deltat))))


# ---------------------------------------------------------------------------
# AGC: automatic gain control (decoder.c:500-531)
# ---------------------------------------------------------------------------

def agc_state_init(agc_ring: int = AGC_MAX_WINDOW):
    """agc_ring: ring size for the min-of-window AGC; the reference always
    allocates AGC_MAX_WINDOW (decoder.h:234) but only the largest active
    parmset's agc_window entries are ever read, so carried scan state can
    shrink to that."""
    return dict(
        agc_gain=F32(1.0),
        v_avg_height=F32(PKWW_PEAKHEIGHT),
        v_avg_height_sum=F32(0.0),
        v_avg_height_count=I32(0),
        v_heights=jnp.zeros(agc_ring, F32),
        heightndx=I32(0),
        max_agc_gain=F32(0.0),
        min_agc_gain=FLT_MAX,
        v_lasttop=F32(0.0),
        v_lastbot=F32(0.0),
        peakcount=I32(0),
    )


def adjust_agc(st, agc_alpha, agc_window):
    """One AGC update; returns the new state dict. Mirrors decoder.c:500-531:
    exponential smoothing when agc_alpha > 0, else min-of-window when
    agc_window > 0, both capped at AGC_MAX_VALUE."""
    lastheight = st["v_lasttop"] - st["v_lastbot"]
    gain = st["agc_gain"]
    heights = st["v_heights"]
    ndx = st["heightndx"]

    # exponential variant
    g_exp = st["v_avg_height"] / jnp.maximum(lastheight, 1e-9)
    g_exp = agc_alpha * g_exp + (1 - agc_alpha) * st["agc_gain"]
    g_exp = jnp.minimum(g_exp, AGC_MAX_VALUE)
    use_exp = (agc_alpha > 0) & (lastheight > 0)

    # min-of-window variant
    heights_w = heights.at[ndx].set(lastheight)
    ndx_w = jnp.where(ndx + 1 >= agc_window, 0, ndx + 1)
    lane = jnp.arange(heights.shape[0])
    minheight = jnp.min(jnp.where(lane < agc_window, heights_w, FLT_MAX))
    g_win = jnp.minimum(st["v_avg_height"] / jnp.maximum(minheight, 1e-9),
                        AGC_MAX_VALUE)
    use_win = (agc_window > 0) & (lastheight > 0)

    gain = jnp.where(use_exp, g_exp, gain)
    gain = jnp.where(use_win, g_win, gain)
    heights = jnp.where(use_win, heights_w, heights)
    ndx = jnp.where(use_win, ndx_w, ndx)
    changed = use_exp | use_win
    out = dict(st)
    out["agc_gain"] = gain
    out["v_heights"] = heights
    out["heightndx"] = ndx
    out["max_agc_gain"] = jnp.where(changed & (gain > st["max_agc_gain"]),
                                    gain, st["max_agc_gain"])
    out["min_agc_gain"] = jnp.where(changed & (gain < st["min_agc_gain"]),
                                    gain, st["min_agc_gain"])
    return out


def accumulate_baseline(st, height, agc_window):
    """Accumulate a peak-to-peak height into the baseline average
    (decode_nrzi.c:218-222 and friends)."""
    out = dict(st)
    out["v_avg_height_sum"] = st["v_avg_height_sum"] + height
    out["v_avg_height_count"] = st["v_avg_height_count"] + 1
    out["v_heights"] = st["v_heights"].at[st["heightndx"]].set(height)
    out["heightndx"] = jnp.where(st["heightndx"] + 1 >= agc_window,
                                 0, st["heightndx"] + 1)
    return out


def finish_baseline(st):
    """First peak beyond AGC_ENDBASE: freeze the baseline average."""
    out = dict(st)
    cnt = jnp.maximum(st["v_avg_height_count"], 1)
    out["v_avg_height"] = st["v_avg_height_sum"] / cnt.astype(F32)
    out["v_avg_height_count"] = I32(0)
    return out


# ---------------------------------------------------------------------------
# clock averaging (decoder.c:533-558); clkavg state is (spacing window, idx,
# current average), all in sample units
# ---------------------------------------------------------------------------

def clkavg_init(spb: jnp.ndarray, clk_ring: int = CLKRATE_WINDOW):
    """clk_ring: moving-window ring size; only the largest active parmset's
    clk_window entries are ever read (decoder.h:189)."""
    return dict(
        t_bitspacing=jnp.broadcast_to(spb, (clk_ring,)).astype(F32),
        bitndx=I32(0),
        t_bitspaceavg=F32(spb),
    )


def adjust_clock(c, delta, clk_window, clk_alpha, const_spb):
    """Mirrors adjust_clock's three strategies: moving window (with the same
    incremental-average update the C uses), exponential, constant."""
    # moving window
    old = c["t_bitspacing"][c["bitndx"]]
    spc_w = c["t_bitspacing"].at[c["bitndx"]].set(delta)
    ndx_w = jnp.where(c["bitndx"] + 1 >= clk_window, 0, c["bitndx"] + 1)
    avg_w = c["t_bitspaceavg"] + (delta - old) / jnp.maximum(clk_window, 1).astype(F32)
    # exponential
    avg_e = clk_alpha * delta + (1 - clk_alpha) * c["t_bitspaceavg"]

    use_w = clk_window > 0
    use_e = (~use_w) & (clk_alpha > 0)
    out = dict(c)
    out["t_bitspacing"] = jnp.where(use_w, spc_w, c["t_bitspacing"])
    out["bitndx"] = jnp.where(use_w, ndx_w, c["bitndx"])
    out["t_bitspaceavg"] = jnp.where(
        use_w, avg_w, jnp.where(use_e, avg_e, const_spb))
    return out


def force_clock(c, delta):
    return dict(
        t_bitspacing=jnp.broadcast_to(
            delta, c["t_bitspacing"].shape).astype(F32),
        bitndx=c["bitndx"],
        t_bitspaceavg=F32(delta),
    )


def parity9(frames: jnp.ndarray) -> jnp.ndarray:
    """Bit parity of each value (up to 31 bits); int array in, {0,1} out."""
    v = frames.astype(jnp.int32)
    v = v ^ (v >> 16)
    v = v ^ (v >> 8)
    v = v ^ (v >> 4)
    v = v ^ (v >> 2)
    v = v ^ (v >> 1)
    return v & 1
