"""Decode pipeline orchestrator.

Host-side driver that turns a sample tensor into decoded blocks:

  1. permute heads -> tracks, estimate signal height, find segments (gaps),
  2. per segment: run the device decode for ALL active parmsets at once
     (the batched replacement for the reference's retry-with-reseek loop,
     readtape.c:1755-1795),
  3. apply the reference's best-decoding selection over the "tried" prefix
     (readtape.c:1799-1843) -- the prefix emulates the C's early stop at the
     first perfect decode so parmset usage statistics match,
  4. emit blocks/tapemarks in tape order.

Calibration passes (density detection, deskew) reuse the same machinery on
the leading segments, exactly as the reference rewinds and re-reads
(readtape.c:1656-1717) -- except nothing is re-read: the tensor is resident.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import tbin as tb
from ..formats.parms import ParmSets, builtin_parmsets
from . import common as cm
from . import gcr as gcr_mod
from . import nrzi as nrzi_mod
from . import pe as pe_mod
from . import segment as seg
from . import stage1, trackscan
from . import ww as ww_mod
from .common import F32, I32, ParmArrays

BS_NAMES = {0: "BS_NONE", 1: "BS_TAPEMARK", 2: "BS_NOISE",
            3: "BS_BADBLOCK", 4: "BS_BLOCK"}

# Window-warmup: each segment's device slice starts this many samples early
# so the first ELIGIBLE positions see a peak window full of real preceding
# gap samples, as the reference's gap-to-gap scan does. Candidates inside
# the warmup are masked -- edge-clamped filling windows otherwise admit
# junk peaks the reference never sees (fuzz case 4023: five junk peaks in
# the first 10 samples flipped a PE track's polarity detection).
SEG_WARMUP = 64          # > PKWW_MAX_WIDTH + refine margin

DIFFERENTIATE_THRESHOLD = 0.05
DIFFERENTIATE_SCALE = 0.4

# granule-pipeline window cap: a decode batch may span at most this many
# upload granules; wider spans fall back to the full resident tape
_WINDOW_KMAX = 4


@lru_cache(maxsize=None)
def _concat_granules(k: int):
    return jax.jit(lambda *gs: jnp.concatenate(gs, axis=1))


_TIMING = os.environ.get("READTAPE_TIMING") == "1"


def _tlog(msg):
    if _TIMING:
        import sys as _sys
        print(f"# timing: {msg}", file=_sys.stderr, flush=True)


def _pallas_enabled() -> bool:
    """The Mosaic admission kernel is the default on TPU backends;
    READTAPE_PALLAS=0/1 overrides. CPU (tests, virtual mesh) uses the XLA
    scans -- pallas interpret mode is far slower there."""
    env = os.environ.get("READTAPE_PALLAS")
    if env is not None:
        return env == "1"
    try:
        import jax
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@dataclass
class DecodeOptions:
    mode: int = tb.MODE_NRZI
    ntrks: int = 9
    bpi: float = 800.0
    ips: float = 50.0
    deltat: float = 1.28e-6
    maxvolts: float = 6.0
    parmsets: ParmSets = None
    multiple_tries: bool = True
    do_correct: bool = False
    do_correct2: bool = False     # extension: 2-track GCR erasure correction
    # NRZI -correct with the reference's DEBUG-build parity-index semantics
    # (decode_nrzi.c:258,262 under #define DEBUG true): the parity check
    # reads data[last_complete_byte] at slot time instead of data[0]
    do_correct_debug: bool = False
    expected_parity: int = 1          # 1 = odd (default), 0 = even
    revparity: int = 0
    invert: bool = False
    differentiate: bool = False
    find_zeros: bool = False
    deskew: bool = False
    skew: tuple = None                # per-track delays in samples, or None
    add_parity: bool = False
    head_to_trk: tuple = None         # permutation; None = identity
    reverse: bool = False
    adjskew: bool = False             # NRZI: per-block +-1 skew nudging
    fluxdir: str = "neg"              # ww: "pos" | "neg" | "auto"
    ww_order: str = "CMLcml"
    blklimit: int = 2 ** 31 - 1
    t0_seconds: float = 0.0
    parmscan: bool = False        # GCR: grid-scan parms on the first block

    def __post_init__(self):
        if self.parmsets is None:
            self.parmsets = builtin_parmsets(self.mode)

    @property
    def spb(self) -> float:
        """samples per bit"""
        return 1.0 / (self.bpi * self.ips * self.deltat)


@dataclass
class BlockResult:
    kind: str                 # "data" | "tapemark" | "noise" | "badblock"
    data: bytes = b""
    parmset: int = 0
    tries: int = 1
    errcount: int = 0
    warncount: int = 0
    detail: dict = field(default_factory=dict)
    t_start: float = 0.0      # seconds (absolute tape time)
    t_end: float = 0.0


# ---------------------------------------------------------------------------
# device segment decode (NRZI); PE/GCR/WW live in their own modules and are
# dispatched from decode_tape below.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("S", "T", "differentiate", "spb_int",
                                   "apply_skew"))
def _prep_volts(v_i16, maxvolts, invert_sign, skew_delay, *,
                S, T, differentiate, spb_int, apply_skew=True):
    """int16 -> float32 volts, optional differentiation (readtape.c:1383),
    per-track deskew delay lines (decoder.c:819-830).

    apply_skew=False skips the delay-line gather entirely (a [T, S]
    take_along_axis costs ~10 ms per 16-segment batch on the v5e);
    callers pass the host-side fact that every skew delay is zero."""
    v = v_i16.astype(F32) * (maxvolts / 32767.0) * invert_sign
    if differentiate:
        prev = jnp.concatenate([jnp.zeros((T, 1), F32), v[:, :-1]], axis=1)
        d = v - prev
        d = jnp.where((d < DIFFERENTIATE_THRESHOLD) &
                      (d > -DIFFERENTIATE_THRESHOLD), 0.0, d)
        v = d * (DIFFERENTIATE_SCALE * spb_int)
    if not apply_skew:
        return v
    idx = jnp.maximum(jnp.arange(S)[None, :] - skew_delay[:, None], 0)
    return jnp.take_along_axis(v, idx, axis=1)


def _mask_jump_table(nxt, seg_len, lead_len, S):
    """Restrict candidates to [lead_len, seg_len): positions below the
    warmup lead snap forward to the first eligible candidate, positions at
    or past the segment's true end (bucket tail = unscanned real tape)
    vanish. lead_len may be a scalar or a per-track [T] vector (the
    reference's per-track init stagger plus window refill, decoder.c:
    856-862, 751-777: after init_trackstate, track k's moving window only
    re-fills by block_start + k + W - 1, so earlier positions cannot be
    steady-window detections)."""
    T = nxt.shape[0]
    lead = jnp.broadcast_to(jnp.asarray(lead_len, I32), (T,))[:, None]
    first = jnp.take_along_axis(nxt, jnp.clip(lead, 0, nxt.shape[1] - 1),
                                axis=1)
    iota = jnp.arange(nxt.shape[1], dtype=I32)[None, :]
    nxt = jnp.where(iota < lead, first, nxt)
    return jnp.where(nxt < seg_len, nxt, S)


def _union_jump_table(v, Ws, rise_floor, min_floor):
    """Candidate jump table valid for EVERY parmset window width: the
    element-wise min over per-width tables is the union of the candidate
    sets, so one compiled scan (window width as data) serves all parmsets."""
    nxt = None
    for W in sorted(set(Ws)):
        t_ = trackscan.loose_jump_table(v, W, rise_floor, min_floor)
        nxt = t_ if nxt is None else jnp.minimum(nxt, t_)
    return nxt


def _nrzi_segment_device(v_i16, seg_len, lead_len, maxvolts, invert_sign,
                         skew_delay,
                         pa: ParmArrays, spb, expected_parity, revparity,
                         rise_floor, min_floor,
                         stat_leftbin, stat_binwidth, *adj_init,
                         S, T, P, nsteps, K, maxb, max_slots,
                         Ws, do_correct, find_zeros, differentiate, spb_int,
                         clk_ring=50, agc_ring=10, stream_writes=False,
                         skew_on=True):
    """v_i16: [T, S] int16 (S is the shared power-of-two bucket; only the
    first seg_len samples belong to this segment -- the rest is real tape
    past the block's idle point, which the reference never scans, so
    candidates there are masked out). Returns per-parmset results
    (stacked [P, ...])."""
    v = _prep_volts(v_i16, maxvolts, invert_sign, skew_delay,
                    S=S, T=T, differentiate=differentiate, spb_int=spb_int,
                    apply_skew=skew_on)

    if find_zeros:
        # -zeros for NRZI: transitions come from the zero-crossing state
        # machines (decoder.c:617-683) instead of the peak window.  NRZI
        # never adjusts the per-track clock (decode_nrzi.c touches only
        # the GLOBAL nrzi.clkavg; t->clkavg stays at its 1/(bpi*ips)
        # init, decoder.c:448), so the plain-variant ZEROCROSS_SLOPE gate
        # (decoder.c:629) is static here.  AGC is off (decoder.c:501):
        # every transition carries gain 1.  The global slot scan consumes
        # events at their CONFIRMATION sample (where the C calls
        # process_up/down_transition) with the crossing time as the
        # transition time.
        trans = gcr_mod.zerocross_transitions(
            v, jnp.float32(spb), nsteps, differentiate, seg_len, lead_len)
        zok = trans["ok"] & trans["valid"]
        if not differentiate:
            zok = zok & (trans["dt"]
                         <= jnp.float32(spb) * gcr_mod.ZEROCROSS_SLOPE)
        cnt = jnp.cumsum(zok.astype(I32), axis=1)
        n_adm = cnt[:, -1]
        scat = jnp.where(zok, jnp.minimum(cnt - 1, K - 1), K)
        tr_s = jnp.full((T, K + 1), nrzi_mod.BIG_S, I32)
        tr_s = jax.vmap(lambda o, i, x: o.at[i].set(x, mode="drop"))(
            tr_s, scat, trans["det"])[:, :K]
        tr_t = jnp.zeros((T, K + 1), F32)
        tr_t = jax.vmap(lambda o, i, x: o.at[i].set(x, mode="drop"))(
            tr_t, scat, trans["t"])[:, :K]
        bcast = lambda x: jnp.broadcast_to(x, (P,) + x.shape)
        finals = dict(
            tr_s=bcast(tr_s), tr_t=bcast(tr_t),
            tr_agc=jnp.ones((P, T, K), F32),
            n_admitted=bcast(jnp.minimum(n_adm, K)),
            # AGC is off under -zeros (adjust_agc's first line), but each
            # track's first bit records agc_gain=1.0 as its max
            # (decode_nrzi.c:149), so blocks report "max AGC 1.00"
            max_agc_gain=jnp.ones((P, T), F32),
            min_agc_gain=jnp.full((P, T), cm.FLT_MAX, F32),
            incomplete=jnp.broadcast_to(
                trans["overflow"] | (n_adm > K), (P, T)))
        return _nrzi_globals(finals, pa, spb, expected_parity, revparity,
                             do_correct, maxb, max_slots, T, S,
                             stat_leftbin, stat_binwidth, clk_ring,
                             adj_init=adj_init or None,
                             stream_writes=stream_writes)
    nxt = _mask_jump_table(
        _union_jump_table(v, Ws, rise_floor, min_floor), seg_len, lead_len, S)

    # group parmsets by their (static) window width: features precompute
    # data-parallel per distinct W, so the scan body is one gather deep
    order, parts = [], []
    for Wd in sorted(set(Ws)):
        idxs = [i for i, w in enumerate(Ws) if w == Wd]
        order += idxs
        feat = trackscan.precompute_window_features(v, Wd, nxt)
        lane = jax.vmap(    # over tracks
            lambda ft, nx, rise, minp, aa, aw, _W=Wd:
                trackscan.nrzi_track_scan_pre(
                    ft, nx, _W, S, nsteps, K, rise, minp, aa, aw,
                    agc_ring=agc_ring),
            in_axes=(0, 0) + (None,) * 4)
        sel = jnp.asarray(idxs, I32)
        parts.append(jax.vmap(   # over this group's parmsets
            lambda rise, minp, aa, aw: lane(feat, nxt, rise, minp, aa, aw)
        )(pa.pkww_rise[sel], pa.min_peak[sel],
          pa.agc_alpha[sel], pa.agc_window[sel]))
    inv = jnp.asarray(np.argsort(order), I32)
    finals = jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=0)[inv], *parts)
    # sanitize transition buffers past each lane's admitted count: the
    # global scan's binary searches require the sentinel-sorted invariant
    keep = jnp.arange(K) < finals["n_admitted"][..., None]
    finals["tr_s"] = jnp.where(keep, finals["tr_s"], nrzi_mod.BIG_S)
    finals["tr_t"] = jnp.where(keep, finals["tr_t"], 0.0)
    finals["tr_agc"] = jnp.where(keep, finals["tr_agc"], 1.0)

    return _nrzi_globals(finals, pa, spb, expected_parity, revparity,
                         do_correct, maxb, max_slots, T, S,
                         stat_leftbin, stat_binwidth, clk_ring,
                         adj_init=adj_init or None,
                         stream_writes=stream_writes)


def _nrzi_globals(finals, pa, spb, expected_parity, revparity, do_correct,
                  maxb, max_slots, T, S, stat_leftbin, stat_binwidth,
                  clk_ring, adj_init=None, stream_writes=False):
    """The per-parmset global slot scan over admitted transition lists
    (shared by the peak and zero-crossing front ends).

    stream_writes: the -correct DEBUG-variant path -- return the scan's
    raw per-slot write/check records plus the pre-finish state instead of
    finished results; the host replays the parity/correction chain
    (nrzi.correct_debug_replay) and re-finishes."""
    def global_lane(ts1, tt1, ta1, cnt1, cw, ca, padj, mb):
        st = nrzi_mod.nrzi_slot_scan(
            ts1, tt1, ta1, cnt1, S, spb, cw, ca, padj, mb,
            expected_parity, do_correct, maxb, max_slots,
            stat_leftbin, stat_binwidth, clk_ring=clk_ring,
            adj_init=adj_init, stream_writes=stream_writes)
        if stream_writes:
            r = {k: st[k] for k in
                 ("dc", "kvis", "t_firstbit", "t_lastbit",
                  "missed_midbits", "consume_overflow", "hist",
                  "trksums", "rec_lcb", "rec_agc", "rec_have")}
            r["rec_wr"] = (st["rec_wr"].astype(jnp.int16)
                           if maxb < 32767 else st["rec_wr"])
            r["counts"] = cnt1
            r["end_s"] = st["end_s"]
            r["unconsumed"] = jnp.sum(jnp.maximum(cnt1 - st["kvis"], 0))
            return r
        r = nrzi_mod.nrzi_finish(st, T, expected_parity, revparity, maxb)
        # multi-block support: where the block ended and how many admitted
        # transitions remain unconsumed past it (a sub-min_gap gap means
        # another block lives in this segment; the host re-dispatches the
        # remainder, mirroring readtape.c:1720-1882's per-block loop)
        r["end_s"] = st["end_s"]
        r["unconsumed"] = jnp.sum(jnp.maximum(cnt1 - st["kvis"], 0))
        if adj_init is not None:
            # -adjskew: the running deviation accumulators plus the live
            # clock at block end (adjust_deskew's bitspacing argument,
            # readtape.c:1310)
            r["adj_n"] = st["adj_n"]
            r["adj_mean"] = st["adj_mean"]
            r["t_bitspaceavg"] = st["clkavg"]["t_bitspaceavg"]
        return r

    res = jax.vmap(global_lane)(
        finals["tr_s"], finals["tr_t"], finals["tr_agc"],
        finals["n_admitted"],
        pa.clk_window, pa.clk_alpha, pa.pulse_adj, pa.midbit)
    res["alltrk_max_agc"] = jnp.max(finals["max_agc_gain"], axis=1)
    res["alltrk_min_agc"] = jnp.min(finals["min_agc_gain"], axis=1)
    res["event_overflow"] = jnp.any(finals["incomplete"])
    return res


def _pe_segment_device(v_i16, seg_len, lead_len, maxvolts, invert_sign,
                       skew_delay,
                       pa: ParmArrays, spb, expected_parity, revparity,
                       rise_floor, min_floor,
                       stat_leftbin=jnp.float32(0.0),
                       stat_binwidth=jnp.float32(1.0),
                       *, S, T, P, nsteps, maxb, Ws,
                       differentiate, spb_int, clk_ring=50, agc_ring=10,
                       skew_on=True):
    v = _prep_volts(v_i16, maxvolts, invert_sign, skew_delay,
                    S=S, T=T, differentiate=differentiate, spb_int=spb_int,
                    apply_skew=skew_on)
    spb_f = jnp.float32(spb)
    nxt_union = _union_jump_table(v, Ws, rise_floor, min_floor)

    # group parmsets by (static) window width over precomputed features,
    # exactly like the NRZI path
    trk = jnp.arange(T, dtype=I32)
    # the reference initializes each track's idle clock to the block's
    # first scanned sample, staggered one sample per track by the init
    # `break` (decoder.c:856-862); the first idle CHECK for track k runs
    # one sample later
    t_lp_virtual = (lead_len + trk).astype(F32)
    s_first_check = lead_len + trk + 1
    order, parts = [], []
    nxt_first = None
    for Wd in sorted(set(Ws)):
        idxs = [i for i, w in enumerate(Ws) if w == Wd]
        order += idxs
        # per-track candidate floor: after init_trackstate the reference's
        # moving window re-fills sample by sample (decoder.c:751-777), so
        # track k's first steady-window detection is block_start + k +
        # W - 1; earlier positions see partial windows (which admit at
        # most rare left-edge-referenced tops -- masked here, noted in
        # README known divergences)
        nxt = _mask_jump_table(nxt_union, seg_len,
                               lead_len + trk + Wd - 1, S)
        if nxt_first is None:
            nxt_first = nxt              # smallest W: loosest candidacy
        feat = trackscan.precompute_window_features(v, Wd, nxt)
        lane = jax.vmap(    # over tracks
            lambda ft, nx, tv, sf, *p, _W=Wd: pe_mod.pe_track_scan(
                ft, nx, _W, S, nsteps, *p, spb_f, maxb,
                stat_leftbin, stat_binwidth,
                clk_ring=clk_ring, agc_ring=agc_ring, pre=True,
                idle_out=True, t_lp_virtual=tv, s_first_check=sf),
            in_axes=(0, 0, 0, 0) + (None,) * 8)
        sel = jnp.asarray(idxs, I32)
        parts.append(jax.vmap(  # over this group's parmsets
            lambda *p: lane(feat, nxt, t_lp_virtual, s_first_check, *p)
        )(pa.pkww_rise[sel], pa.min_peak[sel], pa.agc_alpha[sel],
          pa.agc_window[sel], pa.clk_window[sel], pa.clk_alpha[sel],
          pa.clk_factor[sel], pa.pulse_adj[sel]))
    inv = jnp.asarray(np.argsort(order), I32)
    finals = jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=0)[inv], *parts)

    # cross-track all-idle point per parmset (pe_end_of_block,
    # decoder.c:868-877): insert each track's trailing idle entry into its
    # interval stream, then find the first simultaneous idle
    iota_cap = jnp.arange(pe_mod.IDLE_CAP, dtype=I32)

    def one_lane_tau(fin):
        n_ie = jnp.minimum(fin["n_ie"], pe_mod.IDLE_CAP)        # [T]
        e = jax.vmap(lambda e_, n_, tr_: e_.at[n_].set(tr_, mode="drop"))(
            fin["ie_e"], n_ie, fin["ie_trail"])
        w = fin["ie_w"]                       # fill is BIG_TAU: open wake
        valid = iota_cap[None, :] <= n_ie[:, None]
        tau = pe_mod.pe_idle_tau(e, w, valid)
        overflow = jnp.any(fin["n_ie"] > pe_mod.IDLE_CAP)
        # gaveup: the fire point may exist beyond the tested candidate
        # horizon -- tau=BIG here means "unknown", not "never idled"
        gaveup = overflow | (jnp.any(fin["n_ie"] > pe_mod.IDLE_ECAP)
                             & (tau >= pe_mod.BIG_TAU))
        return jnp.where(overflow, pe_mod.BIG_TAU, tau), gaveup

    tau, tau_gaveup = jax.vmap(one_lane_tau)(finals)             # [P]
    truncated = jax.vmap(
        lambda f, t_: pe_mod.pe_apply_tau(f, maxb, nsteps, t_))(finals, tau)
    res = jax.vmap(lambda f: pe_mod.pe_finish(
        f, T, expected_parity, revparity, maxb))(truncated)
    res["event_overflow"] = jnp.any(finals["incomplete"])
    # multi-block support: where the block ended (the all-idle sample) and
    # how many admitted transitions the truncation discarded (the host
    # re-dispatches the remainder, mirroring readtape.c:1720-1882's
    # per-block loop); cand_after anchors the host's empty-hop
    # fast-forward (first loose candidate at/after tau+1)
    res["end_s"] = jnp.minimum(tau, seg_len).astype(I32)
    res["tau_gaveup"] = tau_gaveup
    res["scan_incomplete"] = jnp.any(finals["incomplete"], axis=1)
    res["consumed"] = jnp.sum(truncated["n_consumed"], axis=1)
    res["unconsumed"] = jnp.sum(
        truncated["n_total"] - truncated["n_consumed"], axis=1)
    start = jnp.clip(tau + 1, 0, S)
    res["cand_after"] = jnp.min(nxt_first[:, start], axis=0)
    # first candidate that could have RACED the virtual idle horizon (its
    # detection landing after tau): the host re-anchors a zero-admission
    # hop so these peaks stay fully visible (see the PE chain)
    start2 = jnp.clip(tau - max(Ws), 0, S)
    res["cand_race"] = jnp.min(nxt_first[:, start2], axis=0)
    return res


def _gcr_segment_device(v_i16, seg_len, lead_len, maxvolts, invert_sign,
                        skew_delay,
                        pa: ParmArrays, spb, expected_parity, revparity,
                        rise_floor, min_floor,
                        stat_leftbin=jnp.float32(0.0),
                        stat_binwidth=jnp.float32(1.0),
                        *, S, T, P, nsteps, maxb, Ws, do_correct,
                        do_correct2, find_zeros, differentiate, spb_int,
                        clk_ring=50, agc_ring=10, skew_on=True):
    v = _prep_volts(v_i16, maxvolts, invert_sign, skew_delay,
                    S=S, T=T, differentiate=differentiate, spb_int=spb_int,
                    apply_skew=skew_on)
    spb_f = jnp.float32(spb)

    overflow = None
    if find_zeros:
        # zero-crossing transition extraction is data-parallel (no AGC);
        # parmsets differ only in the bit-recovery knobs
        trans = gcr_mod.zerocross_transitions(v, spb_f, nsteps,
                                              differentiate, seg_len,
                                              lead_len)
        overflow = trans["overflow"]
        lane = jax.vmap(   # over tracks
            lambda tt, ok, dtc, *p: gcr_mod.gcr_zeros_track_scan(
                tt, ok, dtc, nsteps, *p, spb_f, maxb),
            in_axes=(0, 0, 0) + (None,) * 5)
        finals = jax.vmap(  # over parmsets
            lambda *p: lane(trans["t"], trans["ok"] & trans["valid"],
                            trans["dt"], *p)
        )(pa.clk_window, pa.clk_alpha, pa.z1pt, pa.z2pt, pa.pulse_adj)
    else:
        nxt_union = _union_jump_table(v, Ws, rise_floor, min_floor)
        trk = jnp.arange(T, dtype=I32)
        s_first_check = lead_len + trk + 1
        order, parts = [], []
        nxt_first = None
        for Wd in sorted(set(Ws)):
            idxs = [i for i, w in enumerate(Ws) if w == Wd]
            order += idxs
            # per-track candidate floor: the reference's moving window
            # re-fills after init_trackstate (see _pe_segment_device)
            nxt = _mask_jump_table(nxt_union, seg_len,
                                   lead_len + trk + Wd - 1, S)
            if nxt_first is None:
                nxt_first = nxt
            feat = trackscan.precompute_window_features(v, Wd, nxt)
            lane = jax.vmap(   # over tracks
                lambda ft, nx, sf, *p, _W=Wd: gcr_mod.gcr_track_scan(
                    ft, nx, _W, S, nsteps, *p, spb_f, maxb,
                    stat_leftbin, stat_binwidth,
                    clk_ring=clk_ring, agc_ring=agc_ring, pre=True,
                    idle_out=True, s_first_check=sf),
                in_axes=(0, 0, 0) + (None,) * 9)
            sel = jnp.asarray(idxs, I32)
            parts.append(jax.vmap(  # over this group's parmsets
                lambda *p: lane(feat, nxt, s_first_check, *p)
            )(pa.pkww_rise[sel], pa.min_peak[sel], pa.agc_alpha[sel],
              pa.agc_window[sel], pa.clk_window[sel], pa.clk_alpha[sel],
              pa.z1pt[sel], pa.z2pt[sel], pa.pulse_adj[sel]))
        inv = jnp.asarray(np.argsort(order), I32)
        finals = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0)[inv], *parts)

        # cross-track all-idle point per parmset (gcr_end_of_block,
        # decoder.c:879-888); same machinery as PE
        iota_cap = jnp.arange(pe_mod.IDLE_CAP, dtype=I32)

        def one_lane_tau(fin):
            n_ie = jnp.minimum(fin["n_ie"], pe_mod.IDLE_CAP)
            e = jax.vmap(
                lambda e_, n_, tr_: e_.at[n_].set(tr_, mode="drop"))(
                    fin["ie_e"], n_ie, fin["ie_trail"])
            w = fin["ie_w"]
            valid = iota_cap[None, :] <= n_ie[:, None]
            tau = pe_mod.pe_idle_tau(e, w, valid)
            overflow_ = jnp.any(fin["n_ie"] > pe_mod.IDLE_CAP)
            return jnp.where(overflow_, pe_mod.BIG_TAU, tau)

        tau = jax.vmap(one_lane_tau)(finals)
        truncated = jax.vmap(
            lambda f, t_: gcr_mod.gcr_apply_tau(f, maxb, t_))(finals, tau)
        res = jax.vmap(lambda f: gcr_mod.gcr_finish(
            f, T, expected_parity, revparity, do_correct, maxb,
            do_correct2=do_correct2))(truncated)
        res["event_overflow"] = jnp.any(finals["incomplete"])
        res["end_s"] = jnp.minimum(tau, seg_len).astype(I32)
        res["consumed"] = jnp.sum(truncated["n_consumed"], axis=1)
        res["unconsumed"] = jnp.sum(
            truncated["n_total"] - truncated["n_consumed"], axis=1)
        start = jnp.clip(tau + 1, 0, S)
        res["cand_after"] = jnp.min(nxt_first[:, start], axis=0)
        return res

    res = jax.vmap(lambda f: gcr_mod.gcr_finish(
        f, T, expected_parity, revparity, do_correct, maxb,
        do_correct2=do_correct2))(finals)
    res["event_overflow"] = (jnp.any(finals["incomplete"])
                             if overflow is None else overflow)
    return res


def _nrzi_group_fused(tape, off, seg_lens, leads, maxvolts, invert_sign,
                      skew_delay, pa: ParmArrays, spb, expected_parity,
                      revparity, rise_floor, min_floor,
                      stat_leftbin, stat_binwidth, *,
                      S, T, P, maxb, max_slots, Ws, knobs, do_correct,
                      differentiate, spb_int, agc_ring, skew_on=True):
    """One NRZI segment-batch group through the FUSED Mosaic kernel
    (pallas_fused): features + admission + slot scan + bit accumulation in
    one sweep; the only XLA work left is volts prep and nrzi_finish."""
    from . import pallas_fused as pfu

    _, track_knobs, slot_knobs = knobs
    rises, minps, aalphas, awindows = zip(*track_knobs)
    spb_f, clk_ws, clk_as, padjs, mbs = slot_knobs

    def prep(o):
        v_i16 = jax.lax.dynamic_slice(tape, (0, o), (T, S))
        v = _prep_volts(v_i16, maxvolts, invert_sign, skew_delay, S=S, T=T,
                        differentiate=differentiate, spb_int=spb_int,
                        apply_skew=skew_on)
        return jnp.pad(v, ((0, 16 - T), (0, 0)))

    volts = jax.vmap(prep)(off)                        # [B, 16, S]

    lanei = jnp.arange(128)

    def meta1(ln, ld):
        row = jnp.zeros(128, F32)
        row = row.at[pfu.M_SEGLEN].set(ln.astype(F32))
        row = row.at[pfu.M_LEAD].set(ld.astype(F32))
        row = row.at[pfu.M_STATLB].set(stat_leftbin)
        row = row.at[pfu.M_STATBW].set(stat_binwidth)
        row = row.at[pfu.M_EXPPAR].set(expected_parity.astype(F32))
        m = jnp.broadcast_to(row, (16, 128))
        rf = jnp.pad(rise_floor, (0, 16 - T))
        mf = jnp.pad(min_floor, (0, 16 - T))
        m = jnp.where(lanei[None, :] == pfu.M_RISEF, rf[:, None], m)
        m = jnp.where(lanei[None, :] == pfu.M_MINF, mf[:, None], m)
        return m

    meta = jax.vmap(meta1)(seg_lens, leads)

    bits, hist, scal = pfu.nrzi_fused_scan(
        volts, meta, S=S, T=T, P=P, maxb=maxb, max_slots=max_slots,
        Ws=Ws, rises=rises, minps=minps, aalphas=aalphas,
        awindows=awindows, clk_windows=clk_ws, clk_alphas=clk_as,
        pulse_adjs=padjs, midbits=mbs, spb=spb_f, do_correct=do_correct,
        agc_ring=max(max(awindows), 1))

    def lane(bb, hh, ss):
        st = pfu.fused_state(bb, hh, ss, T=T, maxb=maxb)
        r = nrzi_mod.nrzi_finish(st, T, expected_parity, revparity, maxb)
        r["end_s"] = st["end_s"]
        r["unconsumed"] = jnp.sum(
            jnp.maximum(st["n_admitted"] - st["kvis"], 0))
        r["alltrk_max_agc"] = jnp.max(st["max_agc_gain"])
        r["alltrk_min_agc"] = jnp.min(st["min_agc_gain"])
        r["event_overflow"] = jnp.any(st["incomplete"])
        r["fused_bail"] = st["bail"]
        return r

    return jax.vmap(jax.vmap(lane))(bits, hist, scal)


def _pe_group_fused(tape, off, seg_lens, leads, maxvolts, invert_sign,
                    skew_delay, pa: ParmArrays, spb, expected_parity,
                    revparity, rise_floor, min_floor,
                    stat_leftbin, stat_binwidth, *,
                    S, T, P, maxb, Ws, knobs, differentiate, spb_int,
                    agc_ring, clk_ring, skew_on=True):
    """One PE segment-batch group through the fused per-track kernel."""
    from . import pallas_fused as pfu

    def prep(o):
        v_i16 = jax.lax.dynamic_slice(tape, (0, o), (T, S))
        v = _prep_volts(v_i16, maxvolts, invert_sign, skew_delay, S=S, T=T,
                        differentiate=differentiate, spb_int=spb_int,
                        apply_skew=skew_on)
        return jnp.pad(v, ((0, 16 - T), (0, 0)))

    volts = jax.vmap(prep)(off)

    lanei = jnp.arange(128)

    def meta1(ln, ld):
        row = jnp.zeros(128, F32)
        row = row.at[pfu.M_SEGLEN].set(ln.astype(F32))
        row = row.at[pfu.M_LEAD].set(ld.astype(F32))
        row = row.at[pfu.M_STATLB].set(stat_leftbin)
        row = row.at[pfu.M_STATBW].set(stat_binwidth)
        m = jnp.broadcast_to(row, (16, 128))
        rf = jnp.pad(rise_floor, (0, 16 - T))
        mf = jnp.pad(min_floor, (0, 16 - T))
        m = jnp.where(lanei[None, :] == pfu.M_RISEF, rf[:, None], m)
        m = jnp.where(lanei[None, :] == pfu.M_MINF, mf[:, None], m)
        return m

    meta = jax.vmap(meta1)(seg_lens, leads)
    (spb_f, rises, minps, aalphas, awindows, clk_ws, clk_as, clk_fs,
     padjs) = knobs[1]
    bits, hist, scal, runs = pfu.pe_fused_scan(
        volts, meta, S=S, T=T, P=P, maxb=maxb, Ws=Ws, rises=rises,
        minps=minps, aalphas=aalphas, awindows=awindows,
        clk_windows=clk_ws, clk_alphas=clk_as, clk_factors=clk_fs,
        pulse_adjs=padjs,
        spb=spb_f, agc_ring=agc_ring, clk_ring=clk_ring)

    def lane(bb, hh, ss, rr):
        col = lambda ln: ss[:T, ln]
        dc = col(pfu.PL_DC).astype(I32)
        bits_t = bb[:T, :maxb].astype(jnp.int8)
        # apply the fake-bit runs (pe.py's delta-cumsum replay, per track)
        n_runs = col(pfu.PL_NRUNS).astype(I32)
        valid = jnp.arange(128)[None, :] < jnp.minimum(n_runs, 128)[:, None]
        starts = jnp.where(valid, rr[0, :T].astype(I32), maxb)
        ends = jnp.where(valid, jnp.minimum(
            rr[0, :T].astype(I32) + rr[1, :T].astype(I32), maxb), maxb)
        bvals = (rr[2, :T] > 0.5).astype(I32)
        ti = jnp.arange(T)[:, None]
        delta = jnp.zeros((T, maxb + 1), I32).at[
            ti, starts].add(1, mode="drop").at[ti, ends].add(-1,
                                                            mode="drop")
        inrun = jnp.cumsum(delta[:, :maxb], axis=1) > 0
        vdelta = jnp.zeros((T, maxb + 1), I32).at[
            ti, starts].add(jnp.where(valid, bvals, 0), mode="drop").at[
            ti, ends].add(-jnp.where(valid, bvals, 0), mode="drop")
        runbit = jnp.cumsum(vdelta[:, :maxb], axis=1)
        bits_t = jnp.where(inrun, runbit.astype(jnp.int8), bits_t)
        faked = jnp.where(inrun, jnp.int8(1), jnp.int8(0))
        finals = dict(
            datacount=dc,
            peakcount=col(pfu.PL_PEAKCNT).astype(I32),
            t_firstbit=col(pfu.PL_TFIRST),
            t_lastbit=col(pfu.PL_TLAST),
            bits=bits_t, faked=faked,
            corrected_bits=col(pfu.PL_CORR).astype(I32),
            max_agc_gain=col(pfu.PL_MAXAGC),
            min_agc_gain=col(pfu.PL_MINAGC),
            hist=hh[:T, :50].astype(I32),
            trksum=col(pfu.PL_TRKSUM).astype(I32),
            incomplete=col(pfu.PL_INCOMP) > 0.5,
        )
        r = pe_mod.pe_finish(finals, T, expected_parity, revparity, maxb)
        r["event_overflow"] = jnp.any(finals["incomplete"])
        r["fused_bail"] = ss[0, pfu.PL_BAIL] > 0.5
        return r

    return jax.vmap(jax.vmap(lane))(bits, hist, scal, runs)


def _gcr_group_fused(tape, off, seg_lens, leads, maxvolts, invert_sign,
                     skew_delay, pa: ParmArrays, spb, expected_parity,
                     revparity, rise_floor, min_floor,
                     stat_leftbin, stat_binwidth, *,
                     S, T, P, maxb, Ws, knobs, do_correct, do_correct2,
                     differentiate, spb_int, agc_ring, skew_on=True):
    """One GCR segment-batch group through the fused per-track kernel."""
    from . import pallas_fused as pfu
    from . import gcr_tables as gt

    def prep(o):
        v_i16 = jax.lax.dynamic_slice(tape, (0, o), (T, S))
        v = _prep_volts(v_i16, maxvolts, invert_sign, skew_delay, S=S, T=T,
                        differentiate=differentiate, spb_int=spb_int,
                        apply_skew=skew_on)
        return jnp.pad(v, ((0, 16 - T), (0, 0)))

    volts = jax.vmap(prep)(off)
    lanei = jnp.arange(128)

    def meta1(ln, ld):
        row = jnp.zeros(128, F32)
        row = row.at[pfu.M_SEGLEN].set(ln.astype(F32))
        row = row.at[pfu.M_LEAD].set(ld.astype(F32))
        row = row.at[pfu.M_STATLB].set(stat_leftbin)
        row = row.at[pfu.M_STATBW].set(stat_binwidth)
        m = jnp.broadcast_to(row, (16, 128))
        rf = jnp.pad(rise_floor, (0, 16 - T))
        mf = jnp.pad(min_floor, (0, 16 - T))
        m = jnp.where(lanei[None, :] == pfu.M_RISEF, rf[:, None], m)
        m = jnp.where(lanei[None, :] == pfu.M_MINF, mf[:, None], m)
        return m

    meta = jax.vmap(meta1)(seg_lens, leads)
    (spb_f, rises, minps, aalphas, awindows, clk_ws, clk_as, z1s, z2s,
     padjs) = knobs[1]
    bits, hist, scal = pfu.gcr_fused_scan(
        volts, meta, S=S, T=T, P=P, maxb=maxb, Ws=Ws, rises=rises,
        minps=minps, aalphas=aalphas, awindows=awindows,
        clk_windows=clk_ws, clk_alphas=clk_as, z1pts=z1s, z2pts=z2s,
        pulse_adjs=padjs, spb=spb_f, agc_ring=agc_ring,
        mark1=int(gt.GCR_MARK1), mark2=int(gt.GCR_MARK2))

    def lane(bb, hh, ss):
        col = lambda ln: ss[:T, ln]
        finals = dict(
            datacount=col(pfu.GL_DC).astype(I32),
            peakcount=col(pfu.GL_PEAKCNT).astype(I32),
            t_firstbit=col(pfu.GL_TFIRST),
            t_lastbit=col(pfu.GL_TLAST),
            bits=bb[:T, :maxb].astype(jnp.int8),
            max_agc_gain=col(pfu.GL_MAXAGC),
            min_agc_gain=col(pfu.GL_MINAGC),
            hist=hh[:T, :50].astype(I32),
            trksum=col(pfu.GL_TRKSUM).astype(I32),
            incomplete=col(pfu.GL_INCOMP) > 0.5,
        )
        r = gcr_mod.gcr_finish(finals, T, expected_parity, revparity,
                               do_correct, maxb, do_correct2=do_correct2)
        r["event_overflow"] = jnp.any(finals["incomplete"])
        r["fused_bail"] = ss[0, pfu.GL_BAIL] > 0.5
        return r

    return jax.vmap(jax.vmap(lane))(bits, hist, scal)


def _nrzi_segment_pallas_finals(v, nxt, *, Ws):
    """Per-segment front end for the Pallas admission kernel: stack the
    per-distinct-width feature packs. Returns [G, T, 12, S]."""
    wset = sorted(set(Ws))
    return jnp.stack(
        [trackscan.precompute_window_features(v, Wd, nxt) for Wd in wset])


def _nrzi_group_pallas(tape, off, seg_lens, leads, maxvolts, invert_sign,
                       skew_delay, pa: ParmArrays, spb, expected_parity,
                       revparity, rise_floor, min_floor,
                       stat_leftbin, stat_binwidth, *,
                       S, T, P, nsteps, K, maxb, max_slots, Ws, knobs,
                       do_correct, differentiate, spb_int,
                       clk_ring, agc_ring, skew_on=True):
    """Pallas-kernel variant of one NRZI segment-batch group: the
    admission scans for ALL (segment, track, parmset) lanes run as ONE
    Mosaic kernel (pallas_scan.nrzi_track_scan_pallas) instead of B*T*P
    XLA jump scans; the slot scans and finish are unchanged."""
    from .pallas_scan import (nrzi_track_scan_pallas,
                              nrzi_track_scan_pallas_tracks)

    def prep(o, ln, ld):
        v_i16 = jax.lax.dynamic_slice(tape, (0, o), (T, S))
        v = _prep_volts(v_i16, maxvolts, invert_sign, skew_delay,
                        S=S, T=T, differentiate=differentiate,
                        spb_int=spb_int, apply_skew=skew_on)
        nxt = _mask_jump_table(
            _union_jump_table(v, Ws, rise_floor, min_floor), ln, ld, S)
        return _nrzi_segment_pallas_finals(v, nxt, Ws=Ws)

    feat = jax.vmap(prep)(off, seg_lens, leads)       # [B, G, T, 12, S]
    wset = sorted(set(Ws))
    rises, minps, aalphas, awindows = zip(*knobs[0])
    # one shared window width -> the track-sublane variant (full VPU
    # occupancy per instance); mixed widths -> the parmset-sublane variant
    kernel = (nrzi_track_scan_pallas_tracks if len(wset) == 1
              else nrzi_track_scan_pallas)
    finals = kernel(
        feat, S=S, K=K, Ws=Ws, rises=rises, minps=minps, aalphas=aalphas,
        awindows=awindows, groups=tuple(wset.index(w) for w in Ws))

    if knobs[1] is not None:
        # slot scans as a second Mosaic kernel: per-track transition
        # buffers in DIRECTLY (no merged-stream sort), compact per-slot +
        # track-major streams out, state reconstructed in XLA
        from . import pallas_slot as psl
        spb_f, clk_ws, clk_as, padjs, mbs = knobs[1]
        K_ = finals["tr_s"].shape[3]
        Kp = -(-K_ // 128) * 128
        tr_s, tr_t = finals["tr_s"], finals["tr_t"]
        if Kp != K_:
            pad = ((0, 0), (0, 0), (0, 0), (0, Kp - K_))
            tr_s = jnp.pad(tr_s, pad, constant_values=trackscan.BIG_S)
            tr_t = jnp.pad(tr_t, pad)
        stream, tbk, scal = psl.nrzi_slot_scan_pallas(
            tr_s, tr_t, finals["n_admitted"], S=S, T=T, Kp=Kp,
            max_slots=max_slots, spb_i=spb_f, clk_windows=clk_ws,
            clk_alphas=clk_as, pulse_adjs=padjs, midbits=mbs)

        def slot_lane(strm, tbb, scl, cnt, ts0):
            st = psl.slot_stream_reconstruct(
                strm, tbb, scl, T=T, S=S, maxb=maxb,
                spb=spb_f, stat_leftbin=stat_leftbin,
                stat_binwidth=stat_binwidth,
                first_k=jnp.argmin(ts0))
            r = nrzi_mod.nrzi_finish(st, T, expected_parity, revparity,
                                     maxb)
            r["end_s"] = st["end_s"]
            r["unconsumed"] = jnp.sum(jnp.maximum(cnt - st["kvis"], 0))
            return r

        res = jax.vmap(jax.vmap(slot_lane))(
            stream, tbk, scal, finals["n_admitted"],
            finals["tr_s"][:, :, :, 0])
        res["alltrk_max_agc"] = jnp.max(finals["max_agc_gain"], axis=2)
        res["alltrk_min_agc"] = jnp.min(finals["min_agc_gain"], axis=2)
        res["event_overflow"] = jnp.any(finals["incomplete"], axis=(1, 2))
        return res

    def seg_lane(f):          # per segment: [P, T, ...] finals
        def global_lane(ts1, tt1, ta1, cnt1, cw, ca, padj, mb):
            st = nrzi_mod.nrzi_slot_scan(
                ts1, tt1, ta1, cnt1, S, spb, cw, ca, padj, mb,
                expected_parity, do_correct, maxb, max_slots,
                stat_leftbin, stat_binwidth, clk_ring=clk_ring)
            r = nrzi_mod.nrzi_finish(st, T, expected_parity, revparity,
                                     maxb)
            r["end_s"] = st["end_s"]
            r["unconsumed"] = jnp.sum(jnp.maximum(cnt1 - st["kvis"], 0))
            return r
        res = jax.vmap(global_lane)(
            f["tr_s"], f["tr_t"], f["tr_agc"], f["n_admitted"],
            pa.clk_window, pa.clk_alpha, pa.pulse_adj, pa.midbit)
        res["alltrk_max_agc"] = jnp.max(f["max_agc_gain"], axis=1)
        res["alltrk_min_agc"] = jnp.min(f["min_agc_gain"], axis=1)
        res["event_overflow"] = jnp.any(f["incomplete"])
        return res

    return jax.vmap(seg_lane)(finals)



@lru_cache(maxsize=None)
def _batched_fn(mode, S, T, P, nsteps, K, maxb, max_slots, Ws,
                do_correct, do_correct2, find_zeros, differentiate, spb_int,
                clk_ring, agc_ring, pallas_knobs=None, adjskew=False,
                mesh_ver=0, correctdbg=False, skew_on=True):
    """Cached jitted segment-batch decoder for one static configuration.

    The returned function takes (tape [T, N] int16, offsets [B] int32,
    *broadcast args): segment slicing happens ON DEVICE from the resident
    tape (offsets are data, so any batch of segments hits the same
    executable), and all scalar-per-lane result fields are packed into two
    dense tensors so fetching results costs a handful of transfers, not one
    per field -- critical when the device link has high latency."""
    if mode == tb.MODE_NRZI:
        base = partial(_nrzi_segment_device,
                       S=S, T=T, P=P, nsteps=nsteps, K=K, maxb=maxb,
                       max_slots=max_slots, Ws=Ws,
                       do_correct=do_correct and not correctdbg,
                       find_zeros=find_zeros,
                       differentiate=differentiate, spb_int=spb_int,
                       clk_ring=clk_ring, agc_ring=agc_ring,
                       stream_writes=correctdbg, skew_on=skew_on)
        n_in = 13 if adjskew else 11    # +2: the -adjskew (n, mean) seeds
    elif mode == tb.MODE_PE:
        base = partial(_pe_segment_device,
                       S=S, T=T, P=P, nsteps=nsteps, maxb=maxb, Ws=Ws,
                       differentiate=differentiate, spb_int=spb_int,
                       clk_ring=clk_ring, agc_ring=agc_ring,
                       skew_on=skew_on)
        n_in = 11
        if pallas_knobs is not None and pallas_knobs[0] == "fused-pe":
            _group = partial(_pe_group_fused,
                             S=S, T=T, P=P, maxb=maxb, Ws=Ws,
                             knobs=pallas_knobs,
                             differentiate=differentiate, spb_int=spb_int,
                             agc_ring=agc_ring, clk_ring=clk_ring,
                             skew_on=skew_on)
    elif mode == tb.MODE_GCR:
        base = partial(_gcr_segment_device,
                       S=S, T=T, P=P, nsteps=nsteps, maxb=maxb, Ws=Ws,
                       do_correct=do_correct, do_correct2=do_correct2,
                       find_zeros=find_zeros,
                       differentiate=differentiate, spb_int=spb_int,
                       clk_ring=clk_ring, agc_ring=agc_ring,
                       skew_on=skew_on)
        n_in = 11
        if pallas_knobs is not None and pallas_knobs[0] == "fused-gcr":
            _group = partial(_gcr_group_fused,
                             S=S, T=T, P=P, maxb=maxb, Ws=Ws,
                             knobs=pallas_knobs, do_correct=do_correct,
                             do_correct2=do_correct2,
                             differentiate=differentiate, spb_int=spb_int,
                             agc_ring=agc_ring, skew_on=skew_on)
    else:
        raise NotImplementedError(f"mode {mode}")

    def _categorize(res, B):
        """Split result fields ([nb, B]-leading): small ints, small floats,
        big arrays."""
        ikeys, fkeys, bkeys = [], [], []
        for k in sorted(res):
            x = res[k]
            if x.ndim <= 3 and x.dtype in (jnp.int32, jnp.bool_):
                ikeys.append(k)
            elif x.ndim <= 3 and x.dtype == jnp.float32:
                fkeys.append(k)
            else:
                bkeys.append(k)
        return ikeys, fkeys, bkeys

    if mode == tb.MODE_NRZI and pallas_knobs is not None:
        if pallas_knobs[0] == "fused":
            _group = partial(_nrzi_group_fused,
                             S=S, T=T, P=P, maxb=maxb,
                             max_slots=max_slots, Ws=Ws, knobs=pallas_knobs,
                             do_correct=do_correct,
                             differentiate=differentiate,
                             spb_int=spb_int, agc_ring=agc_ring,
                             skew_on=skew_on)
        else:
            _group = partial(_nrzi_group_pallas,
                             S=S, T=T, P=P, nsteps=nsteps, K=K, maxb=maxb,
                             max_slots=max_slots, Ws=Ws, knobs=pallas_knobs,
                             do_correct=do_correct,
                             differentiate=differentiate,
                             spb_int=spb_int, clk_ring=clk_ring,
                             agc_ring=agc_ring, skew_on=skew_on)
    elif (mode in (tb.MODE_PE, tb.MODE_GCR) and pallas_knobs is not None):
        pass                        # _group bound above (fused-pe/-gcr)
    else:
        def _group(tape, off, lens, leads, *args):
            v = jax.vmap(lambda o: jax.lax.dynamic_slice(
                tape, (0, o), (T, S)))(off)
            return jax.vmap(base, in_axes=(0, 0, 0) + (None,) * n_in)(
                v, lens, leads, *args)

    def run(tape, offsets, seg_lens, leads, *args):
        """offsets, seg_lens: [nb, B]. The nb sub-batches run inside ONE
        executable (lax.map -> sequential reuse of the B-wide program), so
        a whole tape's phase-1 pays one dispatch/sync instead of nb, and
        device memory stays at the single-sub-batch footprint."""
        nb, B = offsets.shape
        res = jax.lax.map(
            lambda ol: _group(tape, ol[0], ol[1], ol[2], *args),
            (offsets, seg_lens, leads))
        ikeys, fkeys, bkeys = _categorize(res, B)
        # P from a result field, not the static config: under a sharded
        # parm axis each device sees its LOCAL parmset count ("end_s" for
        # NRZI incl. the stream-writes mode, "blktype" otherwise)
        anchor = "end_s" if "end_s" in res else "blktype"
        Pdim = res[anchor].shape[2]

        def to_bp(x):
            return (x if x.ndim == 3
                    else jnp.broadcast_to(x[:, :, None], (nb, B, Pdim)))
        packed_i = jnp.stack(
            [to_bp(res[k].astype(jnp.int32)) for k in ikeys], axis=-1)
        packed_f = jnp.stack([to_bp(res[k]) for k in fkeys], axis=-1)
        return packed_i, packed_f, [res[k] for k in bkeys]

    compiled = jax.jit(run)

    # multi-chip: shard the SEGMENT axis of the batch over the decode
    # mesh's "data" axis (each device decodes its own blocks -- SURVEY.md
    # §2's block parallelism), and, when every parmset shares one window
    # width, the parmset axis over "parm". shard_map keeps the Mosaic
    # kernels intact per device; the only collective is the output gather.
    sharded, data_n = None, 1
    from ..parallel import mesh as pmesh
    mesh, _ = pmesh.get_decode_mesh()
    if mesh is not None:
        from jax.sharding import PartitionSpec as PS
        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        data_n = axes.get("data", 1)
        parm_n = axes.get("parm", 1)
        shard_parm = (parm_n > 1 and len(set(Ws)) == 1 and P % parm_n == 0
                      and pallas_knobs is None and not find_zeros
                      and not adjskew)
        if data_n > 1 or shard_parm:
            dspec = PS(None, "data")
            pa_spec = PS("parm") if shard_parm else PS()
            in_specs = ((PS(), dspec, dspec, dspec)
                        + (PS(),) * 3 + (pa_spec,)
                        + (PS(),) * (n_in - 4))
            out_specs = (PS(None, "data", "parm") if shard_parm
                         else PS(None, "data"))
            sharded = jax.jit(jax.shard_map(
                run, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False))

    def call(tape, offsets, seg_lens, leads, *args, fetch=True):
        """offsets, seg_lens: [nb, B] sub-batch groups. fetch=False
        returns a thunk that materializes the results later: callers can
        dispatch batches asynchronously (JAX dispatch is async) and
        overlap per-call device/link latency. Results are [nb, B, ...]."""
        if "keys" not in call.__dict__:
            shaped = jax.eval_shape(
                lambda t_, o_, l_, ld_, *a_: jax.lax.map(
                    lambda ol: _group(t_, ol[0], ol[1], ol[2], *a_),
                    (o_, l_, ld_)),
                tape, offsets, seg_lens, leads, *args)
            call.keys = _categorize(shaped, offsets.shape[1])
        fn_ = (sharded if sharded is not None
               and offsets.shape[1] % data_n == 0 else compiled)
        packed_i, packed_f, bigs = fn_(tape, offsets, seg_lens, leads,
                                       *args)

        def materialize():
            pi, pf = np.asarray(packed_i), np.asarray(packed_f)
            ikeys, fkeys, bkeys = call.keys
            out = {k: pi[..., j] for j, k in enumerate(ikeys)}
            out.update({k: pf[..., j] for j, k in enumerate(fkeys)})
            out.update({k: np.asarray(b) for k, b in zip(bkeys, bigs)})
            return out

        return materialize() if fetch else materialize

    return call


# ---------------------------------------------------------------------------
# best-decoding selection (readtape.c:1776-1843)
# ---------------------------------------------------------------------------

def is_stopping_decode(bt, err, warn, minbits, mode) -> bool:
    """The sequential retry loop's early-stop rule (readtape.c:1755-1795
    with SKIP_NOISE): a tapemark, noise, a perfect block, or (PE) a
    zero-bit decode ends the parmset retries. Single source of truth for
    both the staged-retry dispatcher and pick_best's tried accounting."""
    perfect = bt == nrzi_mod.BS_BLOCK and err == 0 and warn == 0
    return (bt == nrzi_mod.BS_TAPEMARK or bt == nrzi_mod.BS_NOISE
            or perfect or (mode == tb.MODE_PE and minbits == 0))


def pick_best(res_host: dict, P: int, multiple_tries: bool, mode: int):
    """Emulates the sequential retry loop's stopping rule and 4-stage pick.
    res_host fields are numpy arrays [P]. Returns (chosen_idx, tries)."""
    bt = res_host["blktype"]
    err = res_host["errcount"]
    warn = res_host["warncount"]
    minbits = res_host["minbits"]

    if not multiple_tries:
        return 0, 1
    # the C tries parmsets in order and stops early (SKIP_NOISE=true)
    tried = P
    for i in range(P):
        if is_stopping_decode(bt[i], err[i], warn[i], minbits[i], mode):
            tried = i + 1
            break
    cand = range(tried)
    last = tried - 1
    if bt[last] in (nrzi_mod.BS_TAPEMARK,):
        return last, tried
    if bt[last] == nrzi_mod.BS_NOISE:
        return last, tried
    if (bt[last] == nrzi_mod.BS_BLOCK and err[last] == 0 and warn[last] == 0):
        return last, tried
    # try 1: no errors, min warnings
    best, best_w = -1, None
    for i in cand:
        if bt[i] == nrzi_mod.BS_BLOCK and err[i] == 0:
            if best_w is None or warn[i] < best_w:
                best, best_w = i, warn[i]
    if best >= 0:
        return best, tried
    # try 2: min errors
    best, best_e = -1, None
    for i in cand:
        if bt[i] == nrzi_mod.BS_BLOCK:
            if best_e is None or err[i] < best_e:
                best, best_e = i, err[i]
    if best >= 0:
        return best, tried
    # try 3: min track mismatch among bad blocks
    best, best_m = -1, None
    for i in cand:
        if bt[i] == nrzi_mod.BS_BADBLOCK:
            m = res_host["track_mismatch"][i]
            if best_m is None or m < best_m:
                best, best_m = i, m
    if best >= 0:
        return best, tried
    # try 4: first noise
    for i in cand:
        if bt[i] == nrzi_mod.BS_NOISE:
            return i, tried
    return last, tried


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------

def _peakstat_bins(mode: int, bitspacing_secs: float):
    """record_peakstat's bin geometry (decoder.c:136-158), in seconds."""
    rangef = {tb.MODE_NRZI: 1.0, tb.MODE_PE: 1.2,
              tb.MODE_GCR: 3.0, tb.MODE_WW: 0.75}.get(mode, 1.0)
    rng = bitspacing_secs * rangef
    binwidth = rng / 50
    binwidth = (int(binwidth * 10e6 + 0.5) * 1e-6) / 10.0
    leftbin = bitspacing_secs - rng / 2
    leftbin = int(leftbin / binwidth) * binwidth
    return leftbin, binwidth


def permute_heads(samples: np.ndarray, head_to_trk) -> np.ndarray:
    """[N, heads] -> [N, tracks] per the -order permutation."""
    if head_to_trk is None:
        return samples
    ntrks = samples.shape[1]
    out_cols = np.zeros(ntrks, np.int64)
    for head, trkn in enumerate(head_to_trk):
        out_cols[trkn] = head
    return samples[:, out_cols]


class TapeDecoder:
    """Holds device state for one tape and runs decode passes over it.

    int16 tapes upload through the GRANULE PIPELINE: activity/height run
    on the host (numpy, one pass), the tape uploads lazily in fixed
    power-of-two granules (12-bit delta-packed, native.pack12_delta), and
    decode batches take a per-run WINDOW of concatenated granules instead
    of the whole tape. Dispatch interleaves granule uploads with decode
    executions, so on link-bound setups (a relay-attached TPU moves
    ~25-45 MB/s) the upload of granule g+1 overlaps the decode of the
    segments in granule g -- the reference streams blocks through a small
    host buffer for the same reason (readtape.c:1112 reads per block); we
    stream granules through the device link. Float tapes (CSV volts) keep
    the one-shot device upload."""

    def __init__(self, samples: np.ndarray, opts: DecodeOptions):
        import time as _time
        t0 = _time.perf_counter()
        self.opts = opts
        samples = permute_heads(samples, opts.head_to_trk)
        self.n_samples = samples.shape[0]
        self._granules = None
        if (samples.dtype == np.int16
                and os.environ.get("READTAPE_GRANULES", "1") == "1"):
            self._granule_L = int(os.environ.get("READTAPE_GRANULE",
                                                 str(1 << 20)))
            self.h_est, self._act = seg.host_activity(samples, opts.maxvolts)
            self._samples_host = samples
            self._granules = {}
            self._windows = {}
            self._nG = max(1, -(-self.n_samples // self._granule_L))
            self.v_i16 = None          # materialized on demand (aux paths)
            _tlog(f"host activity {_time.perf_counter() - t0:.2f}s "
                  f"({self._nG} granules)")
        else:
            # upload [N, T] as stored; transpose + height + activity run
            # as ONE device program (the host-side transpose copy alone
            # cost ~5 s/tape on one vCPU). int16 tapes go over the link
            # 12-bit delta-packed when the native packer is available.
            step = max(1, (self.n_samples * opts.ntrks) // 2_000_000)
            packed = None
            if (samples.dtype == np.int16
                    and os.environ.get("READTAPE_PACK12", "1") == "1"):
                from .. import native
                packed = native.pack12_delta(samples)
            if packed is not None:
                self.v_i16, h_est, act = seg.tape_activity_packed(
                    jnp.asarray(packed), jnp.float32(opts.maxvolts),
                    step=step, n=self.n_samples, t=opts.ntrks)
            else:
                self.v_i16, h_est, act = seg.tape_activity(
                    jnp.asarray(samples), jnp.float32(opts.maxvolts),
                    step=step)
            self.h_est = float(h_est)
            self._act = np.asarray(act)
            _tlog(f"upload+activity {_time.perf_counter() - t0:.2f}s")
        self.pa = ParmArrays.from_parmsets(opts.parmsets)
        self.P = len(opts.parmsets)
        self.skew = np.zeros(opts.ntrks, np.int32)
        if opts.skew is not None:
            self.skew[:len(opts.skew)] = opts.skew
        self.deskew_percent = 0.0

    # ---- granule pipeline ----
    def _granule(self, g: int):
        """Device [T, L] int16 for granule g, uploading on first use
        (12-bit delta-packed against the previous granule's last row);
        granules past the tape share one zeros block."""
        if g >= self._nG:
            z = self._granules.get(-1)
            if z is None:
                z = jnp.zeros((self.opts.ntrks, self._granule_L), jnp.int16)
                self._granules[-1] = z
            return z
        d = self._granules.get(g)
        if d is None:
            L, t = self._granule_L, self.opts.ntrks
            lo, hi = g * L, min((g + 1) * L, self.n_samples)
            n = hi - lo
            chunk = self._samples_host[lo:hi]
            base = (self._samples_host[lo - 1] if lo
                    else np.zeros(t, np.int16))
            packed = None
            if os.environ.get("READTAPE_PACK12", "1") == "1":
                from .. import native
                packed = native.pack12_delta(chunk, base=base)
            if packed is not None:
                if n < L:        # fixed-size planes: one executable for
                    used = (n * t + 1) // 2     # every tape's last granule
                    full = np.empty((3, (L * t) // 2), np.uint8)
                    full[:, :used] = packed
                    for pl in range(3):
                        full[pl, used:] = seg.PACK12_PAD[pl]
                    packed = full
                d = seg.unpack_granule(jnp.asarray(packed),
                                       jnp.asarray(base), jnp.int32(n),
                                       t=t, L=L)
            else:
                if n < L:
                    pad = np.zeros((L - n, t), np.int16)
                    chunk = np.concatenate([chunk, pad], axis=0)
                d = seg.granule_from_raw(jnp.asarray(chunk))
            self._granules[g] = d
        return d

    def _window(self, ga: int, gb: int):
        """Concatenated granules [ga, gb) as one [T, (gb-ga)*L] array.
        Single-granule windows alias the granule itself (free); each
        multi-granule window is a fresh device copy, so only the most
        recent one is kept cached -- dispatch walks the tape in order, so
        re-use beyond the current run is rare and the bound keeps device
        memory at one tape + one window instead of O(runs) copies."""
        w = self._windows.get((ga, gb))
        if w is None:
            gs = [self._granule(g) for g in range(ga, gb)]
            w = gs[0] if len(gs) == 1 else _concat_granules(len(gs))(*gs)
            if gb - ga > 1:
                for k in [k for k in self._windows if k[1] - k[0] > 1]:
                    del self._windows[k]
            self._windows[(ga, gb)] = w
        return w

    def window_for(self, spans, S: int):
        """(window array, origin sample) covering every decode window a
        batch over `spans` with bucket S can touch: [a - SEG_WARMUP,
        b + S) per span (phase windows start at a - SEG_WARMUP; re-
        dispatched remainders start anywhere below b, so b + S bounds
        their reach). Returns None if the spans would need more than
        _WINDOW_KMAX granules (caller falls back to the full tape)."""
        if self.v_i16 is not None:
            return None       # full tape already resident: windows would
        L = self._granule_L   # only add redundant device copies
        lo = min(max(a - SEG_WARMUP, 0) for a, b in spans)
        hi = max(b for a, b in spans) + S
        ga, gb = lo // L, -(-hi // L)
        if gb - ga > _WINDOW_KMAX:
            return None
        return self._window(ga, gb), ga * L

    # ---- segmentation ----
    def segments(self):
        opts = self.opts
        act = self._act
        # Per-mode gap thresholds mirror the reference's END-OF-BLOCK
        # machinery: PE tracks go idle 2.5 bit-times after the last peak
        # (PE_IDLE_FACTOR, decoder.c:868-877) and GCR 6 bit-times
        # (GCR_IDLE_THRESH, decoder.c:879-888), so any all-track quiet run
        # that long ends the block and the next block decodes from a FRESH
        # track state -- which is exactly what a segment boundary gives us.
        # (PE/GCR signals transition at least every 1/3 bit-cells per
        # track, so an in-block quiet run this long is impossible.) NRZI
        # allows indefinite per-track idle; its blocks end via the global
        # clock's post counter, handled by the multi-block slot scan.
        blank = 0
        # During density auto-detection (readtape.c:1656-1672 runs the
        # normal reader with bpi still 0) the bit spacing is unknown;
        # segment with a provisional mid-range density -- detection only
        # needs active regions, not exact block boundaries.
        spb = (opts.spb if opts.bpi > 0
               else 1.0 / (1600.0 * opts.ips * opts.deltat))
        if opts.mode == tb.MODE_PE:
            min_gap_secs = cm.PE_IDLE_FACTOR * spb * opts.deltat
            # idle horizon + PE_IBG_SECS samples are blanked after a block
            blank = int(cm.PE_IDLE_FACTOR * spb +
                        cm.PE_IBG_SECS / opts.deltat)
        elif opts.mode == tb.MODE_GCR:
            min_gap_secs = cm.GCR_IDLE_THRESH * spb * opts.deltat
            blank = int(cm.GCR_IDLE_THRESH * spb +
                        cm.GCR_IBG_SECS / opts.deltat)
        else:
            min_gap_secs = max(20 * spb * opts.deltat, 0.0015)
        min_gap_chunks = max(2, int(min_gap_secs / (opts.deltat * seg.CHUNK)))
        # post margin = the mode's idle-detection horizon (see decoder.h:
        # PE_IDLE_FACTOR 2.5 bits, GCR_IDLE_THRESH 6 bits; NRZI needs ~10
        # free-running bit slots for its post counter)
        post_bits = {tb.MODE_PE: 3.0, tb.MODE_GCR: 7.0,
                     tb.MODE_NRZI: 13.0, tb.MODE_WW: 3.0}[opts.mode]
        return seg.find_segments(
            act, min_gap_chunks, self.n_samples,
            pre_margin=int(2 * spb),
            post_margin=int(post_bits * spb),
            blank=blank)

    # ---- per-segment decode ----
    def decode_segment(self, a: int, b: int, nparms=None):
        res = self.decode_segment_batch([(a, b)], nparms=nparms)
        return jax.tree.map(lambda x: x[0, 0], res)

    def _tape_padded(self, min_len: int):
        """The device-resident tape, zero-padded so any in-jit
        dynamic_slice window fits (padded once, grown if ever needed).
        In granule mode the full tape materializes here on first use
        (aux paths: deskew, parmscan, -zeros chains, trace, density)."""
        if self.v_i16 is None:
            self.v_i16 = self._window(0, self._nG)
            # the full tape subsumes every granule and window copy
            self._granules.clear()
            self._windows.clear()
        if self.v_i16.shape[1] < min_len:
            n_pad = seg.bucket_length(min_len)
            self.v_i16 = jnp.pad(
                self.v_i16, ((0, 0), (0, n_pad - self.v_i16.shape[1])))
        return self.v_i16

    def decode_segment_batch(self, spans, fetch=True, bucket=None,
                             nparms=None, window=None, parm_sel=None,
                             adj_init=None, correctdbg=False,
                             force_xla=False):
        """Decode a batch of same-bucket segments at once: the whole
        multi-stage pipeline is vmapped over the segment axis, so scan
        iterations amortize across every block on the tape (the third
        level of parallelism after tracks and parmsets). Slicing happens
        on device (offsets are data) and results come back packed -- a
        single executable + a handful of transfers per batch.

        nparms limits the decode to the FIRST nparms parmsets: the staged
        retry decodes every segment with parmset 0 first (exactly the
        reference's sequential try order, readtape.c:1755-1795) and only
        re-decodes imperfect segments with the full set.

        spans is a list of (a, b) tuples (one sub-batch) or a list of
        equally-sized lists of them (several sub-batches executed inside
        one device program); results carry leading axes [nb, B].

        window=(array [T, W], origin): decode against a granule window
        instead of the full resident tape; offsets become window-relative.
        Callers must guarantee every [a - SEG_WARMUP, a0 + S) slice lies
        inside the window (TapeDecoder.window_for does).

        parm_sel selects an arbitrary tuple of parmset indices instead of
        the nparms prefix (the -adjskew driver decodes single parmsets
        sequentially, threading the deviation accumulators through
        adj_init=(n0 [T], mean0 [T]) -- NRZI only)."""
        opts = self.opts
        if parm_sel is not None:
            sel = list(parm_sel)
            active = [opts.parmsets.sets[k] for k in sel]
            pa = jax.tree.map(lambda a: a[jnp.asarray(sel)], self.pa)
            nparms = len(sel)
        else:
            nparms = self.P if nparms is None else min(nparms, self.P)
            active = opts.parmsets.sets[:nparms]
            pa = (self.pa if nparms == self.P else
                  jax.tree.map(lambda a: a[:nparms], self.pa))
        groups = spans if spans and isinstance(spans[0], list) else [spans]
        # decode mesh: pad every sub-batch to a multiple of the mesh's
        # "data" axis so the segment axis shards evenly (padding repeats
        # the last span; callers index results by chunk position and never
        # read the pad lanes)
        from ..parallel import mesh as pmesh
        mesh, mesh_ver = pmesh.get_decode_mesh()
        if mesh is None:
            mesh_ver = 0
        else:
            dn = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)
            if dn > 1:
                tgt = -(-max(len(g) for g in groups) // dn) * dn
                groups = [list(g) + [g[-1]] * (tgt - len(g)) for g in groups]
        flat = [s for g in groups for s in g]

        def a0(a):
            return max(a - SEG_WARMUP, 0)
        S = bucket or seg.bucket_length(max(b - a0(a) for a, b in flat))
        T = opts.ntrks
        if window is not None:
            tape, origin = window
            assert all(a0(a) >= origin and
                       a0(a) + S <= origin + tape.shape[1]
                       for a, b in flat)
        else:
            tape = self._tape_padded(max(a0(a) for a, b in flat) + S)
            origin = 0
        offsets = jnp.asarray([[a0(a) - origin for a, b in g]
                               for g in groups], I32)
        seg_lens = jnp.asarray([[b - a0(a) for a, b in g] for g in groups],
                               I32)
        leads = jnp.asarray([[a - a0(a) for a, b in g] for g in groups], I32)
        spb = opts.spb
        Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, opts.bpi, opts.ips,
                                     opts.deltat)
                   for p in active)
        # scan-step budget: ~2 peaks/bit (PE) plus reject slack; the while
        # loop exits when every lane runs dry, so this is only a cap
        nsteps = int(S / spb * 3.2) + 64
        K = int(S / spb * 2.5) + 64
        maxb = int(S / spb * 1.3) + 64
        max_slots = int(S / spb * 1.25) + 48

        scale = min(1.0, self.h_est / cm.PKWW_PEAKHEIGHT)
        rise_min = min(p.pkww_rise for p in active)
        minp_min = min(p.min_peak for p in active)
        rise_floor = jnp.full(T, rise_min * scale / cm.AGC_MAX_VALUE * 0.8, F32)
        min_floor = jnp.full(T, minp_min * scale / cm.AGC_MAX_VALUE * 0.8, F32)

        spb_int = int(spb) if opts.bpi > 0 else 20
        # carried ring sizes shrink to the largest ACTIVE parmset's windows
        clk_ring = max(max(p.clk_window for p in active), 1)
        agc_ring = max(max(p.agc_window for p in active), 1)
        # Pallas admission kernel (NRZI): one Mosaic kernel replaces the
        # B*T*P XLA jump scans. Requires row-aligned buckets and a wide
        # enough window for the 32-slot per-row record format; parmset
        # knobs become compile-time constants of the kernel. The slot
        # scans run as a second Mosaic kernel except under -correct
        # (whose AGC-keyed bit flip needs the full XLA slot scan).
        pallas_knobs = None
        fused_ok = (opts.mode == tb.MODE_NRZI and _pallas_enabled()
                    and os.environ.get("READTAPE_FUSED", "1") == "1"
                    and not opts.find_zeros and adj_init is None
                    and not correctdbg and not force_xla
                    and S % 2048 == 0 and S <= 1 << 20 and nparms <= 16
                    and opts.ntrks <= 16 and max(Ws) <= 128)
        if fused_ok:
            # the FUSED kernel: one sweep, -correct included (the
            # AGC-keyed flip runs in-kernel); READTAPE_FUSED=0 reverts
            # to the two-kernel v3 path below
            track_knobs = tuple(
                (float(p.pkww_rise), float(p.min_peak),
                 float(p.agc_alpha), int(p.agc_window)) for p in active)
            slot_knobs = (float(spb),
                          tuple(int(p.clk_window) for p in active),
                          tuple(float(p.clk_alpha) for p in active),
                          tuple(float(p.pulse_adj) for p in active),
                          tuple(float(p.midbit) for p in active))
            pallas_knobs = ("fused", track_knobs, slot_knobs)
        elif (opts.mode == tb.MODE_NRZI and _pallas_enabled()
                and not opts.find_zeros and adj_init is None
                and not correctdbg and not force_xla
                and S % 1024 == 0 and nparms <= 16
                and 128 // (min(Ws) + 1) + 1 <= 32):
            track_knobs = tuple(
                (float(p.pkww_rise), float(p.min_peak),
                 float(p.agc_alpha), int(p.agc_window)) for p in active)
            # The Mosaic slot kernel (per-track windows, sort-free) is
            # exact (see tests) and beats the XLA slot scan at bench
            # shapes -- on by default wherever the admission kernel runs;
            # READTAPE_SLOT_PALLAS=0 reverts. (-correct stays on the XLA
            # scan: its AGC-keyed bit flip feeds back into the slot loop.)
            slot_knobs = None
            if (os.environ.get("READTAPE_SLOT_PALLAS", "1") == "1"
                    and not opts.do_correct and opts.ntrks <= 9
                    and S <= 1 << 20):  # f32 tiebreak key limit (see kernel)
                slot_knobs = (float(spb),
                              tuple(int(p.clk_window) for p in active),
                              tuple(float(p.clk_alpha) for p in active),
                              tuple(float(p.pulse_adj) for p in active),
                              tuple(float(p.midbit) for p in active))
            pallas_knobs = (track_knobs, slot_knobs)
        elif (opts.mode == tb.MODE_PE and _pallas_enabled()
                and os.environ.get("READTAPE_FUSED", "1") == "1"
                and not force_xla
                and S % 2048 == 0 and S <= 1 << 20 and nparms <= 16
                and opts.ntrks <= 16 and max(Ws) <= 128):
            # PE rides the fused per-track kernel (no slot machine)
            pallas_knobs = ("fused-pe", (
                float(spb),
                tuple(float(p.pkww_rise) for p in active),
                tuple(float(p.min_peak) for p in active),
                tuple(float(p.agc_alpha) for p in active),
                tuple(int(p.agc_window) for p in active),
                tuple(int(p.clk_window) for p in active),
                tuple(float(p.clk_alpha) for p in active),
                tuple(float(p.clk_factor) for p in active),
                tuple(float(p.pulse_adj) for p in active)))
        elif (opts.mode == tb.MODE_GCR and _pallas_enabled()
                and os.environ.get("READTAPE_FUSED", "1") == "1"
                and not opts.find_zeros and not force_xla
                and S % 2048 == 0 and S <= 1 << 20 and nparms <= 16
                and opts.ntrks <= 16 and max(Ws) <= 128):
            # GCR rides the fused per-track kernel (zero-inference
            # in-kernel; -correct/-correct2 live in gcr_finish)
            pallas_knobs = ("fused-gcr", (
                float(spb),
                tuple(float(p.pkww_rise) for p in active),
                tuple(float(p.min_peak) for p in active),
                tuple(float(p.agc_alpha) for p in active),
                tuple(int(p.agc_window) for p in active),
                tuple(int(p.clk_window) for p in active),
                tuple(float(p.clk_alpha) for p in active),
                tuple(float(p.z1pt) for p in active),
                tuple(float(p.z2pt) for p in active),
                tuple(float(p.pulse_adj) for p in active)))
        fn = _batched_fn(opts.mode, S, T, nparms, nsteps, K, maxb,
                         max_slots, Ws, opts.do_correct, opts.do_correct2,
                         opts.find_zeros,
                         opts.differentiate, spb_int, clk_ring, agc_ring,
                         pallas_knobs=pallas_knobs,
                         adjskew=adj_init is not None, mesh_ver=mesh_ver,
                         correctdbg=correctdbg,
                         skew_on=bool(np.any(self.skew)))
        args = [tape, offsets, seg_lens, leads, jnp.float32(opts.maxvolts),
                jnp.float32(-1.0 if opts.invert else 1.0),
                jnp.asarray(self.skew, I32), pa, jnp.float32(spb),
                jnp.int32(opts.expected_parity), jnp.int32(opts.revparity),
                rise_floor, min_floor]
        if opts.mode in (tb.MODE_NRZI, tb.MODE_GCR, tb.MODE_PE):
            lb, bw = _peakstat_bins(opts.mode, 1.0 / (opts.bpi * opts.ips))
            args += [jnp.float32(lb / opts.deltat),
                     jnp.float32(bw / opts.deltat)]
        if adj_init is not None:
            assert opts.mode == tb.MODE_NRZI
            args += [jnp.asarray(adj_init[0], F32),
                     jnp.asarray(adj_init[1], F32)]
        return fn(*args, fetch=fetch)

    # ---- debug trace extraction (trace.c equivalent; runtime option) ----
    def trace_lanes(self, a: int, b: int):
        """Decode samples [a, b) with parmset 0 and return (volts [N, T],
        lanes dict) for the <base>.trace.csv debug spreadsheet -- the
        reference's 11 event lanes (trace.c:46-92), mode-filtered."""
        opts = self.opts
        T = opts.ntrks
        S = seg.bucket_length(b - a)
        v = self._tape_padded(b)[:, a:b]
        if v.shape[1] < S:
            v = jnp.pad(v, ((0, 0), (0, S - v.shape[1])))
        vf = _prep_volts(v, jnp.float32(opts.maxvolts),
                         jnp.float32(-1.0 if opts.invert else 1.0),
                         jnp.asarray(self.skew, I32), S=S, T=T,
                         differentiate=opts.differentiate,
                         spb_int=int(opts.spb))
        p0 = opts.parmsets[0]
        W = cm.pkww_width_for(p0.pkww_bitfrac, opts.bpi, opts.ips,
                              opts.deltat)
        scale = min(1.0, self.h_est / cm.PKWW_PEAKHEIGHT)
        rise_floor = jnp.full(T, p0.pkww_rise * scale / 2 * 0.8, F32)
        min_floor = jnp.full(T, p0.min_peak * scale / 2 * 0.8, F32)
        nxt = trackscan.loose_jump_table(vf, W, rise_floor, min_floor)
        spb = opts.spb
        nsteps = max(512, S // 4)
        Kd = max(512, S // 6)
        t0 = self.opts.t0_seconds + a * opts.deltat
        dt = opts.deltat

        def tsec(x):
            return t0 + float(x) * dt

        lanes = {}
        if opts.mode == tb.MODE_PE:
            maxb = int(S / spb * 1.3) + 64
            lane = jax.vmap(lambda vt, nx: pe_mod.pe_track_scan(
                vt, nx, W, S, nsteps,
                jnp.float32(p0.pkww_rise), jnp.float32(p0.min_peak),
                jnp.float32(p0.agc_alpha), jnp.int32(p0.agc_window),
                jnp.int32(p0.clk_window), jnp.float32(p0.clk_alpha),
                jnp.float32(p0.clk_factor), jnp.float32(p0.pulse_adj),
                jnp.float32(spb), maxb, debug_peaks=True))
            fin = jax.tree.map(np.asarray, lane(vf, nxt))
            peaks, clkedg, datedg, clkwin, clkdet, data =                 [], [], [], [], [], []
            for trk in range(T):
                n = fin["n_admitted"][trk]
                tt = fin["tr_t"][trk][:n]
                top = fin["tr_top"][trk][:n]
                isd = fin["tr_isdata"][trk][:n]
                ckw = fin["tr_clkw"][trk][:n]
                bv = fin["tr_bitval"][trk][:n]
                peaks.append([(tsec(x), bool(u)) for x, u in zip(tt, top)])
                datedg.append([(tsec(x), 1) for x, d in zip(tt, isd) if d])
                clkedg.append([(tsec(x), 1)
                               for x, d in zip(tt, isd) if not d])
                cw = []
                for x, d, w in zip(tt, isd, ckw):
                    if d:
                        cw.append((tsec(x), 1))
                        cw.append((tsec(x + w), 0))
                clkwin.append(cw)
                clkdet.append([(tsec(tt[0]), 1), (tsec(tt[-1]), 0)]
                              if n else [])
                data.append([(tsec(x), int(bb))
                             for x, d, bb in zip(tt, isd, bv) if d])
            lanes = dict(peak=peaks, clkedg=clkedg, datedg=datedg,
                         clkwin=clkwin, clkdet=clkdet, data=data)
        elif opts.mode == tb.MODE_GCR:
            maxb = int(S / spb * 1.3) + 64
            lb, bw = _peakstat_bins(opts.mode, 1.0 / (opts.bpi * opts.ips))
            lane = jax.vmap(lambda vt, nx: gcr_mod.gcr_track_scan(
                vt, nx, W, S, nsteps,
                jnp.float32(p0.pkww_rise), jnp.float32(p0.min_peak),
                jnp.float32(p0.agc_alpha), jnp.int32(p0.agc_window),
                jnp.int32(p0.clk_window), jnp.float32(p0.clk_alpha),
                jnp.float32(p0.z1pt), jnp.float32(p0.z2pt),
                jnp.float32(p0.pulse_adj), jnp.float32(spb), maxb,
                jnp.float32(lb / opts.deltat),
                jnp.float32(bw / opts.deltat), debug_peaks=True))
            fin = jax.tree.map(np.asarray, lane(vf, nxt))
            peaks, zerpos, adjpos, data = [], [], [], []
            for trk in range(T):
                n = fin["n_admitted"][trk]
                tt = fin["tr_t"][trk][:n]
                top = fin["tr_top"][trk][:n]
                nz = fin["tr_nzeros"][trk][:n]
                pa_ = fin["tr_padj"][trk][:n]
                peaks.append([(tsec(x), bool(u)) for x, u in zip(tt, top)])
                zp, dd = [], []
                for i in range(1, n):
                    k = int(nz[i])
                    for z in range(max(k, 0)):
                        tz = tt[i - 1] + (tt[i] - tt[i - 1]) *                             (z + 1) / (k + 1)
                        zp.append((tsec(tz), 1))
                        dd.append((tsec(tz), 0))
                    dd.append((tsec(tt[i]), 1))
                zerpos.append(zp)
                data.append(dd)
                adjpos.append([(tsec(x), 1) for x, adj in zip(tt, pa_)
                               if abs(adj) > 1e-6])
            lanes = dict(peak=peaks, zerpos=zerpos, adjpos=adjpos,
                         data=data)
        else:
            # NRZI (and calibration passes): per-track admission + the
            # global slot scan with its debug event stream
            lane = jax.vmap(lambda vt, nx: trackscan.nrzi_track_scan(
                vt, nx, W, S, nsteps, Kd, p0.pkww_rise, p0.min_peak,
                p0.agc_alpha, p0.agc_window))
            fin = jax.tree.map(np.asarray, lane(vf, nxt))
            peaks = []
            for trk in range(T):
                n = fin["n_admitted"][trk]
                peaks.append([(tsec(x), bool(u))
                              for x, u in zip(fin["tr_t"][trk][:n],
                                              fin["tr_top"][trk][:n])])
            lanes = dict(peak=peaks)
            if opts.mode == tb.MODE_NRZI:
                keep = np.arange(Kd) < fin["n_admitted"][:, None]
                maxb = int(S / spb * 1.3) + 64
                max_slots = int(S / spb * 1.25) + 48
                lb, bw = _peakstat_bins(opts.mode,
                                        1.0 / (opts.bpi * opts.ips))
                st = nrzi_mod.nrzi_slot_scan(
                    jnp.asarray(np.where(keep, fin["tr_s"],
                                         nrzi_mod.BIG_S)),
                    jnp.asarray(np.where(keep, fin["tr_t"], 0.0)),
                    jnp.asarray(np.where(keep, fin["tr_agc"], 1.0)),
                    jnp.asarray(fin["n_admitted"]), S, jnp.float32(spb),
                    jnp.int32(p0.clk_window), jnp.float32(p0.clk_alpha),
                    jnp.float32(p0.pulse_adj), jnp.float32(p0.midbit),
                    jnp.int32(opts.expected_parity), False, maxb,
                    max_slots, jnp.float32(lb / opts.deltat),
                    jnp.float32(bw / opts.deltat), debug=True)
                st = jax.tree.map(np.asarray, st)
                live = st["dbg_live"]
                zc = st["dbg_zc"][live]
                ap = st["dbg_avgpos"][live]
                lanes["zerchk"] = [(tsec(x), 1) for x in zc]
                lanes["avgpos"] = [(tsec(x), 1) for x in ap if x > 0]
                # data lane + parity errors per completed column
                frames = np.zeros(maxb, np.int64)
                for trk in range(T):
                    frames |= st["bits"][trk].astype(np.int64) <<                         (T - 1 - trk)
                col_slot = st["dbg_col_slot"]          # [T, maxb]
                slot_t = np.zeros(int(st["dbg_live"].shape[0]) + 1)
                slot_t[:len(st["dbg_zc"])] = st["dbg_zc"]
                data = []
                for trk in range(T):
                    dd = []
                    for c in range(int(st["dc"][trk])):
                        sl = col_slot[trk, c]
                        if sl >= 0:
                            dd.append((tsec(slot_t[sl]),
                                       int(st["bits"][trk][c])))
                    data.append(dd)
                lanes["data"] = data
                par = np.zeros(maxb, np.int64)
                x = frames.copy()
                while x.any():
                    par ^= x & 1
                    x >>= 1
                perr = []
                for c in range(int(st["dc"].min())):
                    if par[c] != opts.expected_parity:
                        sl = col_slot[:, c].max()
                        if sl >= 0:
                            perr.append((tsec(slot_t[sl]), 1))
                lanes["parerr"] = perr
        volts = np.asarray(vf).T[:b - a]
        return volts, lanes

    def trace_window(self, a: int, b: int):
        """Back-compat shim: (volts, peaks) only."""
        volts, lanes = self.trace_lanes(a, b)
        return volts, lanes.get("peak")

    # ---- deskew calibration (decoder.c:243-281) ----
    def calibrate_deskew(self, segments, max_blocks=100, min_transitions=1000):
        opts = self.opts
        lb, bw = _peakstat_bins(opts.mode, 1.0 / (opts.bpi * opts.ips))
        hist = np.zeros((opts.ntrks, 50), np.int64)
        trksums = np.zeros(opts.ntrks, np.int64)
        nblks = 0
        for (a, b) in segments:
            # calibration reads only parmset 0's histogram, like the
            # reference's first-parmset deskew pass (readtape.c:1676-1717)
            res = self.decode_segment(a, b, nparms=1)
            if res["blktype"][0] == nrzi_mod.BS_NOISE:
                continue
            hist += res["hist"][0]
            trksums += res["trksums"][0]
            nblks += 1
            if nblks >= max_blocks or trksums.min() >= min_transitions:
                break
        if trksums.min() == 0:
            return False
        # average peak position per track over interior buckets, with the
        # C's exact arithmetic (skew_compute_deskew, decoder.c:243-281):
        # bin centers from the FLOAT32 binwidth/leftbin, each product
        # truncated to integer before summing, f32 division
        lb32 = np.float64(np.float32(lb)) * 1e6
        bw32 = np.float64(np.float32(bw)) * 1e6
        avgsum = np.asarray(
            [sum(int(int(hist[t, k]) * (bw32 * k + lb32))
                 for k in range(1, 49)) for t in range(opts.ntrks)])
        avg = (np.float32(avgsum) / np.float32(trksums)).astype(np.float32)
        maxavg = avg.max()
        t_sec = np.where(trksums > 0,
                         ((maxavg - avg).astype(np.float32)
                          / np.float32(1e6)), np.float32(0))
        delays = np.minimum(
            ((t_sec.astype(np.float64) + opts.deltat / 2)
             / opts.deltat).astype(int), 50)
        self.skew = delays.astype(np.int32)
        bitspace_us = 1e6 / (opts.bpi * opts.ips)
        self.deskew_percent = float((maxavg - avg.min()) / bitspace_us * 100)
        return True

    # ---- density detection (decoder.c:329-394) ----
    def detect_density(self, segments):
        opts = self.opts
        # decode transitions with a default window on leading segments
        deltas = []
        total = 0
        for (a, b) in segments:
            S = seg.bucket_length(b - a)
            v = self._tape_padded(b)[:, a:b]
            if v.shape[1] < S:
                v = jnp.pad(v, ((0, 0), (0, S - v.shape[1])))
            vf = v.astype(F32) * (opts.maxvolts / 32767.0)
            if opts.invert:
                vf = -vf
            p0 = opts.parmsets[0]
            scale = min(1.0, self.h_est / cm.PKWW_PEAKHEIGHT)
            rise_floor = jnp.full(opts.ntrks,
                                  p0.pkww_rise * scale / 2 * 0.8, F32)
            min_floor = jnp.full(opts.ntrks,
                                 p0.min_peak * scale / 2 * 0.8, F32)
            nsteps = max(512, S // 4)
            Kd = max(512, S // 6)
            nxt = trackscan.loose_jump_table(vf, 8, rise_floor, min_floor)
            lane = jax.vmap(
                lambda vt, nx: trackscan.nrzi_track_scan(
                    vt, nx, 8, S, nsteps, Kd, p0.pkww_rise, p0.min_peak,
                    p0.agc_alpha, p0.agc_window))
            fin = lane(vf, nxt)
            n_adm = np.asarray(fin["n_admitted"])
            t_peak = np.asarray(fin["tr_t"])
            for trk in range(opts.ntrks):
                t = t_peak[trk][:n_adm[trk]] * opts.deltat
                d = np.diff(t)
                deltas.append(d[(d > 0) & (d <= 120e-6)])
                total += len(deltas[-1])
            if total >= 9999:
                break
        if not deltas:
            raise RuntimeError("density detection failed: no transitions")
        d = np.concatenate(deltas)
        bins = (d / 0.5e-6).astype(int)
        counts = np.bincount(bins)
        need = len(d) * 0.05
        ok = np.nonzero(counts > need)[0]
        if len(ok) == 0:
            raise RuntimeError("density detection failed")
        mindist = ok.min()
        density = 1.0 / (opts.ips * (mindist + 0.5) * 0.5e-6)
        if opts.mode == tb.MODE_PE:
            density /= 2
        for std in (200.0, 556.0, 800.0, 1600.0, 9042.0):
            if abs(density - std) < std * 0.20:
                return std, density
        raise RuntimeError(f"non-standard density {density:.0f} BPI detected; "
                           "please specify -bpi")


def decode_tape(samples: np.ndarray, opts: DecodeOptions, log=None,
                decoder: "TapeDecoder" = None, ww_pre=None):
    """Decode a whole tape. Returns (blocks, stats dict).

    decoder: reuse a pre-built TapeDecoder (device-resident tape) instead
    of uploading `samples` -- the bench's HBM-resident throughput metric
    times the decode alone this way. ww_pre is the Whirlwind analog:
    (v_i16 [T, N] device int16 in CANONICAL track order, h_est float)
    from segment.tape_activity(_packed), skipping the upload."""
    if opts.mode in (tb.MODE_NRZI, tb.MODE_PE, tb.MODE_GCR):
        return _decode_tape_nrzi_like(samples, opts, log, decoder)
    if opts.mode == tb.MODE_WW:
        return _decode_tape_ww(samples, opts, log, pre=ww_pre)
    raise NotImplementedError(f"mode {opts.mode}")


def ww_trace_lanes(samples, opts, a: int, b: int):
    """WW -trace extraction: per-track peak events plus the track-0 data
    lane (TRACE(data, clkendtime, UPTICK*(1 + 2 bits)), decode_ww.c:90).
    Returns (volts [b-a, T], lanes) like TapeDecoder.trace_lanes."""
    type_to_trk, head_to_trk, ntrks = ww_mod.parse_ww_order(opts.ww_order)
    used = [h for h, t in enumerate(head_to_trk) if t >= 0]
    samples = samples[:, used]
    perm = [head_to_trk[h] for h in used]
    cols = np.zeros(ntrks, np.int64)
    for pos, trkn in enumerate(perm):
        cols[trkn] = pos
    samples = samples[a:b][:, cols]
    T = ntrks
    S = seg.bucket_length(b - a)
    v_i16, h_est, _ = seg.tape_activity(
        jnp.asarray(samples), jnp.float32(opts.maxvolts), step=1)
    h_est = float(h_est)
    if v_i16.shape[1] < S:
        v_i16 = jnp.pad(v_i16, ((0, 0), (0, S - v_i16.shape[1])))
    skew = np.zeros(T, np.int32)
    if opts.skew is not None:
        skew[:len(opts.skew)] = opts.skew

    spb = opts.spb
    p0 = opts.parmsets[0]
    W = cm.pkww_width_for(p0.pkww_bitfrac, opts.bpi, opts.ips, opts.deltat)
    nsteps = int(S / spb * 3.2) + 64
    K = int(S / spb * 2.5) + 64
    vf = _prep_volts(v_i16, jnp.float32(opts.maxvolts),
                     jnp.float32(-1.0 if opts.invert else 1.0),
                     jnp.asarray(skew, I32), S=S, T=T,
                     differentiate=opts.differentiate, spb_int=int(spb))
    scale = min(1.0, h_est / cm.PKWW_PEAKHEIGHT)
    rise_floor = jnp.full(T, p0.pkww_rise * scale / cm.AGC_MAX_VALUE * 0.8,
                          F32)
    min_floor = jnp.full(T, p0.min_peak * scale / cm.AGC_MAX_VALUE * 0.8,
                         F32)
    nxt = trackscan.loose_jump_table(vf, W, rise_floor, min_floor)
    feat = trackscan.precompute_window_features(vf, W, nxt)
    lane = jax.vmap(lambda ft, nx: ww_mod.ww_track_scan(
        ft, nx, W, S, nsteps, K, p0.pkww_rise, p0.min_peak,
        p0.agc_alpha, p0.agc_window,
        jnp.float32(cm.PKWW_PEAKHEIGHT), pre=True))
    fin = jax.tree.map(np.asarray, lane(feat, nxt))

    t0 = opts.t0_seconds + a * opts.deltat
    dt = opts.deltat

    def tsec(x):
        return t0 + float(x) * dt

    peaks = []
    for trk in range(T):
        n = fin["n_admitted"][trk]
        peaks.append([(tsec(x), bool(u))
                      for x, u in zip(fin["tr_t"][trk][:n],
                                      fin["tr_top"][trk][:n])])

    counts = fin["n_admitted"]
    keep = np.arange(K) < counts[..., None]
    trans = dict(s_det=jnp.where(keep, fin["tr_s"], nrzi_mod.BIG_S),
                 t_peak=jnp.where(keep, fin["tr_t"], 0.0),
                 t_frac=jnp.where(keep, fin["tr_frac"], 0.0),
                 is_top=jnp.where(keep, fin["tr_top"], False))
    Mcap = min(int(T * K), int(np.sum(counts)) + 16)
    merged = ww_mod.merge_transitions(trans, T, Mcap)
    maxchars = int(S / spb) + 256
    lb, bw = _peakstat_bins(opts.mode, 1.0 / (opts.bpi * opts.ips))
    fluxdir = {"pos": ww_mod.FLUX_POS, "neg": ww_mod.FLUX_NEG,
               "auto": ww_mod.FLUX_AUTO}[opts.fluxdir]
    res = jax.tree.map(np.asarray, ww_mod.ww_global_scan(
        merged["trk"], merged["t_peak"], merged["s_det"],
        merged["is_top"], merged["valid"],
        jnp.int32(p0.clk_window), jnp.float32(p0.clk_alpha),
        jnp.float32(spb),
        jnp.float32(lb / opts.deltat), jnp.float32(bw / opts.deltat),
        pri_clk=type_to_trk[ww_mod.WWTRK_PRICLK],
        pri_lsb=type_to_trk[ww_mod.WWTRK_PRILSB],
        pri_msb=type_to_trk[ww_mod.WWTRK_PRIMSB],
        alt_clk=type_to_trk[ww_mod.WWTRK_ALTCLK],
        alt_lsb=type_to_trk[ww_mod.WWTRK_ALTLSB],
        alt_msb=type_to_trk[ww_mod.WWTRK_ALTMSB],
        T=T, maxchars=maxchars, maxblocks=4096, fluxdir_req=fluxdir,
        debug_times=True, m_frac=merged["t_frac"]))
    nchars = int(res["datacount"])
    data = [[] for _ in range(T)]
    data[0] = [(tsec(res["char_t"][i]), int(res["chars"][i]))
               for i in range(nchars)]
    lanes = dict(peak=peaks, data=data)
    volts = np.asarray(vf).T[:b - a]
    return volts, lanes


def _decode_tape_ww(samples, opts, log, pre=None):
    """Whirlwind: the whole tape decodes in one pass (blocks can abut;
    decode_ww.c:29-31), no multi-parmset retry (readtape.c:1987)."""
    type_to_trk, head_to_trk, ntrks = ww_mod.parse_ww_order(opts.ww_order)
    used = [h for h, t in enumerate(head_to_trk) if t >= 0]
    samples = samples[:, used]
    perm = [head_to_trk[h] for h in used]
    cols = np.zeros(ntrks, np.int64)
    for pos, trkn in enumerate(perm):
        cols[trkn] = pos
    samples = samples[:, cols]

    T = ntrks
    N = samples.shape[0]
    # Captures up to READTAPE_WW_SINGLE_MAX samples decode in one
    # whole-capture pass; larger ones (the PL/I tape was 49M samples)
    # stream through fixed-size admission chunks with the per-track scan
    # state carried across boundaries, and the global scan's rolling time
    # base (ww_global_scan) keeps sub-sample clocking exact at any
    # length. The old hard cap at 2^26 samples is gone.
    WW_SINGLE_MAX = int(os.environ.get("READTAPE_WW_SINGLE_MAX",
                                       str(1 << 24)))
    # the XLA paths split at WW_SINGLE_MAX (absolute f32 positions);
    # the fused kernel's grid-aligned position rebase has no length
    # cap, so when it is eligible the whole capture is one sweep
    chunked = N > WW_SINGLE_MAX
    WW_CH = int(os.environ.get("READTAPE_WW_CHUNK", str(1 << 22)))
    WW_PAD = 192                      # > max window width + max skew delay
    p0 = opts.parmsets[0]
    W = cm.pkww_width_for(p0.pkww_bitfrac, opts.bpi, opts.ips, opts.deltat)
    fused_ww_ok = (_pallas_enabled()
                   and os.environ.get("READTAPE_FUSED", "1") == "1"
                   and T <= 16 and W <= 128
                   and p0.agc_window == 0 and p0.clk_window == 0)
    # eighth-granularity buckets instead of powers of two: WW sweeps the
    # WHOLE padded tape in one program, so a 2x bucket costs up to 2x
    # decode time (a 2.6M-sample tape padded to 4.2M wasted 63%); the
    # finer rounding caps waste at 12.5% for ~3x the distinct shapes
    p2 = seg.bucket_length(N)
    gran = max(p2 // 8, 2048)
    S = -(-N // gran) * gran
    if chunked and not fused_ww_ok:
        S = (-(-N // WW_CH)) * WW_CH + WW_PAD
    step = max(1, (N * T) // 2_000_000)
    if pre is not None:
        v_i16, h_est = pre
    else:
        packed = None
        # the one-shot packed unpack materializes pathologically tiled
        # intermediates beyond granule scale (a 19M-sample tape asked
        # XLA for a 29 GB s32 buffer); keep 12-bit upload to the sizes
        # it was built for and ship huge captures raw
        if (samples.dtype == np.int16 and N * T <= 64 << 20
                and os.environ.get("READTAPE_PACK12", "1") == "1"):
            from .. import native
            packed = native.pack12_delta(samples)
        if packed is not None:       # 12-bit delta-packed upload (25% less
            v_i16, h_est, _ = seg.tape_activity_packed(   # over the relay)
                jnp.asarray(packed), jnp.float32(opts.maxvolts),
                step=step, n=N, t=T)
        else:
            v_i16, h_est, _ = seg.tape_activity(
                jnp.asarray(samples), jnp.float32(opts.maxvolts),
                step=step)
    h_est = float(h_est)
    if v_i16.shape[1] < S:
        v_i16 = jnp.pad(v_i16, ((0, 0), (0, S - v_i16.shape[1])))
    skew = np.zeros(T, np.int32)
    if opts.skew is not None:
        skew[:len(opts.skew)] = opts.skew

    spb = opts.spb
    nsteps = int(S / spb * 3.2) + 64
    lb, bw = _peakstat_bins(opts.mode, 1.0 / (opts.bpi * opts.ips))

    def _floors():
        scale = min(1.0, h_est / cm.PKWW_PEAKHEIGHT)
        return (jnp.full(T, p0.pkww_rise * scale / cm.AGC_MAX_VALUE * 0.8,
                         F32),
                jnp.full(T, p0.min_peak * scale / cm.AGC_MAX_VALUE * 0.8,
                         F32))

    def _global(m_trk, m_t, m_frac, m_s, m_top, m_valid, maxblocks,
                init_state=None, flush=True):
        maxchars = int(N / spb) + 256
        fluxdir = {"pos": ww_mod.FLUX_POS, "neg": ww_mod.FLUX_NEG,
                   "auto": ww_mod.FLUX_AUTO}[opts.fluxdir]
        return ww_mod.ww_global_scan(
            m_trk, m_t, m_s, m_top, m_valid,
            jnp.int32(p0.clk_window), jnp.float32(p0.clk_alpha),
            jnp.float32(spb),
            jnp.float32(lb / opts.deltat), jnp.float32(bw / opts.deltat),
            pri_clk=type_to_trk[ww_mod.WWTRK_PRICLK],
            pri_lsb=type_to_trk[ww_mod.WWTRK_PRILSB],
            pri_msb=type_to_trk[ww_mod.WWTRK_PRIMSB],
            alt_clk=type_to_trk[ww_mod.WWTRK_ALTCLK],
            alt_lsb=type_to_trk[ww_mod.WWTRK_ALTLSB],
            alt_msb=type_to_trk[ww_mod.WWTRK_ALTMSB],
            T=T, maxchars=maxchars, maxblocks=maxblocks,
            fluxdir_req=fluxdir, m_frac=m_frac,
            init_state=init_state, flush=flush)

    def run_pass_single(skew_arr, v_avg_init):
        v = _prep_volts(v_i16, jnp.float32(opts.maxvolts),
                        jnp.float32(-1.0 if opts.invert else 1.0),
                        jnp.asarray(skew_arr, I32), S=S, T=T,
                        differentiate=opts.differentiate, spb_int=int(spb))
        rise_floor, min_floor = _floors()
        nxt = trackscan.loose_jump_table(v, W, rise_floor, min_floor)
        K = int(S / spb * 2.5) + 64
        feat = trackscan.precompute_window_features(v, W, nxt)
        lane = jax.vmap(lambda ft, nx, vh: ww_mod.ww_track_scan(
            ft, nx, W, S, nsteps, K, p0.pkww_rise, p0.min_peak,
            p0.agc_alpha, p0.agc_window, vh, pre=True))
        finals = lane(feat, nxt, jnp.asarray(v_avg_init, F32))

        counts = finals["n_admitted"]
        keep = np.arange(K) < np.asarray(counts)[..., None]
        trans = dict(
            s_det=jnp.where(keep, finals["tr_s"], nrzi_mod.BIG_S),
            t_peak=jnp.where(keep, finals["tr_t"], 0.0),
            t_frac=jnp.where(keep, finals["tr_frac"], 0.0),
            is_top=jnp.where(keep, finals["tr_top"], False))
        Mcap = min(int(T * K), int(np.sum(np.asarray(counts))) + 16)
        merged = ww_mod.merge_transitions(trans, T, Mcap)
        res = _global(merged["trk"], merged["t_peak"], merged["t_frac"],
                      merged["s_det"], merged["is_top"], merged["valid"],
                      maxblocks=4096)
        return jax.tree.map(np.asarray, res), jax.tree.map(np.asarray,
                                                           finals)

    def run_pass_chunked(skew_arr, v_avg_init):
        """Streamed admission front end for huge captures: fixed chunks
        with the per-track scan state carried across boundaries. A WW_PAD
        margin re-reads the previous chunk's tail so windows, skew delay
        lines and differentiation see real history; candidates in the pad
        are masked (they were scanned by the previous chunk)."""
        SL = WW_CH + WW_PAD
        # WW admits up to 2 pulse edges per bit per track; the single-pass
        # 3.2x/bit step budget only suffices because inter-block gaps pool
        # across the tape -- a chunk can be wall-to-wall block, so budget
        # for the dense case (steps ~= admissions + rejects ~= 5/bit)
        K_c = int(WW_CH / spb * 3.0) + 128
        nst = int(WW_CH / spb * 6.0) + 256
        nchunks = -(-N // WW_CH)
        # when the fused kernel bailed, the resident tape was padded to
        # the (shorter) fused bucket; extend it to the chunk grid
        S_need = nchunks * WW_CH + WW_PAD
        nonlocal v_i16
        if v_i16.shape[1] < S_need:
            v_i16 = jnp.pad(v_i16, ((0, 0), (0, S_need - v_i16.shape[1])))
        rise_floor, min_floor = _floors()
        carry = ww_mod.ww_carry_init(T, W, v_avg_init)
        carry_keys = list(carry.keys())
        prev_cnt = np.zeros(T, np.int64)
        s_l, f_l, k_l, u_l = [], [], [], []
        skew_j = jnp.asarray(skew_arr, I32)
        fin_np = None
        for c in range(nchunks):
            org = c * WW_CH - (WW_PAD if c else 0)
            end = min((c + 1) * WW_CH, N)
            lead = WW_PAD if c else 0
            sl = jax.lax.dynamic_slice(v_i16, (0, org), (T, SL))
            v = _prep_volts(sl, jnp.float32(opts.maxvolts),
                            jnp.float32(-1.0 if opts.invert else 1.0),
                            skew_j, S=SL, T=T,
                            differentiate=opts.differentiate,
                            spb_int=int(spb))
            # the no-more-candidates snap target is SL + 256 -- a value
            # a genuine blind jump (<= SL + W) can never reach, so the
            # carried cursor translation below can tell them apart
            nxt = _mask_jump_table(
                trackscan.loose_jump_table(v, W, rise_floor, min_floor),
                jnp.int32(end - org), jnp.int32(lead), SL + 256)
            feat = trackscan.precompute_window_features(v, W, nxt)
            lane = jax.vmap(lambda ft, nx, cr: ww_mod.ww_track_scan(
                ft, nx, W, SL, nst, K_c, p0.pkww_rise, p0.min_peak,
                p0.agc_alpha, p0.agc_window, jnp.float32(0.0), pre=True,
                chunked=True, carry_in=cr))
            fin = lane(feat, nxt, carry)
            fin_np = {k: np.asarray(fin[k]) for k in
                      ("tr_s", "tr_t", "tr_frac", "tr_top", "n_admitted",
                       "pos", "h_sum", "h_cnt")}
            new = fin_np["n_admitted"].astype(np.int64) - prev_cnt
            prev_cnt = fin_np["n_admitted"].astype(np.int64)
            if os.environ.get("READTAPE_WW_DEBUG"):
                t0s = fin_np["tr_s"][0, :max(int(new[0]), 1)]
                print(f"# chunk {c} org={org} end={end} new={new.tolist()} "
                      f"pos={fin_np['pos'].tolist()} "
                      f"trk0 s[:3]={(t0s[:3] + org).tolist()} "
                      f"s[-1]={int(t0s[max(int(new[0]) - 1, 0)]) + org}",
                      flush=True)
            for t in range(T):
                n = min(int(new[t]), K_c)
                s_l.append(fin_np["tr_s"][t, :n].astype(np.int64) + org)
                f_l.append(fin_np["tr_frac"][t, :n])
                k_l.append(np.full(n, t, np.int32))
                u_l.append(fin_np["tr_top"][t, :n])
            carry = {k: fin[k] for k in carry_keys}
            next_org = (c + 1) * WW_CH - WW_PAD
            posn = fin_np["pos"].astype(np.int64)
            art = posn >= SL + 256      # artificial no-more-candidates snap
            # artificial: resume at the next chunk's first admissible
            # position (abs `end`); genuine (a blind jump past the chunk
            # end): translate, preserving the blind frontier exactly
            pos_next = np.where(art, end - next_org,
                                np.maximum(posn + org - next_org, 0))
            carry["pos"] = jnp.asarray(pos_next.astype(np.int32))
            carry["steps"] = jnp.zeros(T, I32)

        s_all = np.concatenate(s_l) if s_l else np.zeros(0, np.int64)
        order = np.lexsort((np.concatenate(k_l), s_all))
        M = len(order)
        s_srt = s_all[order]
        # m_t (absolute f32) is only read by the global scan while its
        # base is still 0, i.e. for events below REBASE_SPAN < 2^23 where
        # f32 is exact; later events use f32(s - base) + frac
        trk_m = np.concatenate(k_l)[order]
        t_m = (s_srt + np.concatenate(f_l)[order]
               .astype(np.float64)).astype(np.float32)
        f_m = np.concatenate(f_l)[order]
        s_m = np.minimum(s_srt, 2 ** 30).astype(np.int32)
        u_m = np.concatenate(u_l)[order]
        maxblocks = int(N / spb) // 8 + 64
        # the scan runs in bounded slices (one multi-million-step device
        # program trips the runtime's execution watchdog); state threads
        # through on device, padded tail events are exact no-ops
        SLICE = 1 << 20
        nsl = max(1, -(-M // SLICE))
        state = None
        for k in range(nsl):
            a, b = k * SLICE, min((k + 1) * SLICE, M)
            pad = SLICE - (b - a)

            def cut(x, fill=0):
                return jnp.asarray(np.pad(x[a:b], (0, pad),
                                          constant_values=fill))
            state = _global(cut(trk_m), cut(t_m), cut(f_m), cut(s_m),
                            cut(u_m),
                            jnp.asarray(np.pad(np.ones(b - a, bool),
                                               (0, pad))),
                            maxblocks=maxblocks,
                            init_state=state, flush=(k == nsl - 1))
        res = state
        finals = dict(h_sum=fin_np["h_sum"], h_cnt=fin_np["h_cnt"])
        return jax.tree.map(np.asarray, res), finals

    # Fused WW Mosaic kernel (pallas_fused._ww_kernel): admission row
    # sweep + the whole pulse/clock/blockmark machine in one device
    # sweep, bit-exact vs the XLA scans (tests/test_pallas_fused.py);
    # position rebasing removes any capture-length cap. Gated to the
    # builtin-parmset shape (exponential AGC + exponential clock);
    # ring-pressure/overflow bails fall back to the XLA paths.
    def run_pass_fused(skew_arr, v_avg_init):
        import numpy as _np
        from . import pallas_fused as pfu
        v = _prep_volts(v_i16, jnp.float32(opts.maxvolts),
                        jnp.float32(-1.0 if opts.invert else 1.0),
                        jnp.asarray(skew_arr, I32), S=S, T=T,
                        differentiate=opts.differentiate, spb_int=int(spb))
        rise_floor, min_floor = _floors()
        volts = jnp.pad(v, ((0, 16 - T), (0, 0)))[None]
        meta = _np.zeros((1, 16, 128), _np.float32)
        meta[0, :, pfu.M_SEGLEN] = S
        meta[0, :, pfu.M_STATLB] = lb / opts.deltat
        meta[0, :, pfu.M_STATBW] = bw / opts.deltat
        meta[0, :T, pfu.M_RISEF] = _np.asarray(rise_floor)
        meta[0, :T, pfu.M_MINF] = _np.asarray(min_floor)
        meta[0, :T, pfu.M_WW_VAH] = _np.asarray(v_avg_init,
                                                _np.float32)
        meta[0, :, pfu.M_WW_AAL] = p0.agc_alpha
        meta[0, :, pfu.M_WW_CLKA] = p0.clk_alpha
        maxchars = int(N / spb) + 256
        fluxdir = {"pos": ww_mod.FLUX_POS, "neg": ww_mod.FLUX_NEG,
                   "auto": ww_mod.FLUX_AUTO}[opts.fluxdir]
        chars, blkp, hist, scal = pfu.ww_fused_scan(
            volts, jnp.asarray(meta), S=S, T=T, W=W, maxchars=maxchars,
            rise=float(p0.pkww_rise), minp=float(p0.min_peak),
            agc_alpha=float(p0.agc_alpha), clk_alpha=float(p0.clk_alpha),
            spb=float(spb), fluxdir_req=fluxdir,
            pri_clk=type_to_trk[ww_mod.WWTRK_PRICLK],
            pri_lsb=type_to_trk[ww_mod.WWTRK_PRILSB],
            pri_msb=type_to_trk[ww_mod.WWTRK_PRIMSB],
            alt_clk=type_to_trk[ww_mod.WWTRK_ALTCLK],
            alt_lsb=type_to_trk[ww_mod.WWTRK_ALTLSB],
            alt_msb=type_to_trk[ww_mod.WWTRK_ALTMSB])
        res = pfu.ww_fused_state(chars, blkp, hist, scal, T=T,
                                 maxchars=maxchars)
        if res["bail"]:
            return None
        finals = dict(h_sum=res["h_sum"], h_cnt=res["h_cnt"])
        return res, finals

    def run_pass(skew_arr, v_avg_init):
        if fused_ww_ok:
            out = run_pass_fused(skew_arr, v_avg_init)
            if out is not None:
                return out
            _tlog("ww fused bail: falling back to the XLA scans")
        return (run_pass_chunked if chunked
                else run_pass_single)(skew_arr, v_avg_init)

    v_avg_init = np.full(T, cm.PKWW_PEAKHEIGHT, np.float32)
    deskew_done = False
    if opts.deskew and opts.skew is None:
        # calibration pass: skew from the transition-position histogram
        # (readtape.c:1676-1717), average pulse heights for AGC baselines
        res0, finals0 = run_pass(np.zeros(T, np.int32), v_avg_init)
        sums = res0["trksums"].astype(np.int64)
        if sums.min() > 0:
            us = bw * 1e6 * np.arange(50) + lb * 1e6
            avg = (res0["hist"][:, 1:49] *
                   us[1:49][None, :]).sum(axis=1) / np.maximum(sums, 1)
            delays_us = avg.max() - avg
            skew = np.minimum(((delays_us * 1e-6 + opts.deltat / 2) /
                               opts.deltat).astype(np.int32), 50)
            deskew_done = True
        hs = finals0["h_sum"]
        hc = np.maximum(finals0["h_cnt"], 1)
        v_avg_init = np.where(finals0["h_cnt"] > 0, hs / hc,
                              cm.PKWW_PEAKHEIGHT).astype(np.float32)

    res_host, _ = run_pass(skew, v_avg_init)
    raw = ww_mod.assemble_ww_blocks(res_host, spb, opts.reverse)

    blocks = []
    stats = dict(nblocks=0, ntapemarks=0, nerrblocks=0, nwarnblocks=0,
                 nunusable=0, nmismatched=0, nmidbiterr=0, ncorrected=0,
                 ngoodmultiple=0, tried=np.zeros(1, int),
                 chosen=np.zeros(1, int), deskew_percent=0.0,
                 skew=np.asarray(skew).tolist(),
                 peak_hist=res_host["hist"].astype(np.int64),
                 peak_trksums=res_host["trksums"].astype(np.int64),
                 peak_bins=(lb, bw),
                 num_flux_changes=int(res_host["num_flux_changes"]),
                 flux_dir_final=("pos" if int(res_host["flux"]) ==
                                 ww_mod.FLUX_POS else "neg"))
    for rb in raw:
        if stats["nblocks"] >= opts.blklimit:
            break
        t_blk = opts.t0_seconds + rb["t_end_samples"] * opts.deltat
        if rb["kind"] == "tapemark":
            blocks.append(BlockResult("tapemark", t_start=t_blk,
                                      t_end=t_blk))
            stats["ntapemarks"] += 1
            continue
        w = rb["warnings"]
        err = w["ww_bad_length"] + w["ww_speed_err"]
        warn = (w["ww_leading_clock"] + w["ww_missing_onebit"] +
                w["ww_missing_clock"])
        detail = dict(w)
        detail["avg_bit_spacing"] = w["avg_bit_spacing"]
        blocks.append(BlockResult("data", rb["data"], errcount=err,
                                  warncount=warn, detail=detail,
                                  t_start=t_blk, t_end=t_blk))
        stats["nblocks"] += 1
        stats["tried"][0] += 1
        stats["chosen"][0] += 1
        if err:
            stats["nerrblocks"] += 1
        if warn:
            stats["nwarnblocks"] += 1
    return blocks, stats


def parmscan_grid():
    """The reference's GCR parameter grid (readtape.c:1730-1754), with its
    float32 loop stepping reproduced exactly so the combo list (and its
    nesting order) matches the C binary's log line for line."""
    f32 = np.float32
    combos = []
    clk_alpha = f32(0.010)
    while clk_alpha <= f32(0.030):
        pulse_adj = f32(0.2)
        while pulse_adj <= f32(0.401):
            z1pt = f32(1.4)
            while z1pt <= f32(1.501):
                z2pt = f32(2.20)
                while z2pt <= f32(2.501):
                    combos.append((float(clk_alpha), float(pulse_adj),
                                   float(z1pt), float(z2pt)))
                    z2pt = f32(z2pt + f32(0.02))
                z1pt = f32(z1pt + f32(0.01))
            pulse_adj = f32(pulse_adj + f32(0.1))
        clk_alpha = f32(clk_alpha + f32(0.002))
    return combos


def gcr_parmscan(dec, span, log, combos=None):
    """GCR parmset grid scan over the first block (readtape.c:1730-1754,
    the GCR_PARMSCAN debug build): decode one segment under every
    (clk_alpha, pulse_adj, z1pt, z2pt) combo and log the reference's
    result line per combo. Where the C re-reads the block once per combo,
    the grid rides the batched parmset axis -- a whole chunk of combos
    decodes in ONE device call (the tape is already resident)."""
    import copy
    opts = dec.opts
    if combos is None:
        combos = parmscan_grid()
        limit = int(os.environ.get("READTAPE_PARMSCAN_LIMIT", "0"))
        if limit > 0:             # test hook: truncate the 5280-combo grid
            combos = combos[:limit]
    base = dataclasses.replace(opts.parmsets.sets[0], clk_window=0)
    chunk = int(os.environ.get("READTAPE_PARMSCAN_CHUNK", "64"))
    saved = (opts.parmsets, dec.pa, dec.P)
    a, b = span
    try:
        for lo in range(0, len(combos), chunk):
            cs = combos[lo:lo + chunk]
            pad = cs + [cs[-1]] * (min(chunk, len(combos)) - len(cs))
            ps = copy.copy(opts.parmsets)
            ps.sets = [dataclasses.replace(
                base, clk_alpha=ca, pulse_adj=pa_, z1pt=z1, z2pt=z2)
                for ca, pa_, z1, z2 in pad]
            opts.parmsets = ps
            dec.pa = ParmArrays.from_parmsets(ps)
            dec.P = len(ps.sets)
            res = jax.tree.map(np.asarray, dec.decode_segment(a, b))
            for j, (ca, pa_, z1, z2) in enumerate(cs):
                log(f"clk_alpha {ca:.3f} pulseadj {pa_:.3f} "
                    f"z1pt {z1:.3f} z2pt {z2:.3f} "
                    f"firsterr {int(res['first_error'][j]):4d} "
                    f"errors {int(res['errcount'][j])} "
                    f"warnings {int(res['warncount'][j])} "
                    f"minbits {int(res['minbits'][j])} "
                    f"maxbits {int(res['maxbits'][j])}\n")
    finally:
        opts.parmsets, dec.pa, dec.P = saved


@lru_cache(maxsize=None)
def _correctdbg_finish_fn(T, maxb):
    """Finish a batch of parmset lanes from host-replayed bit buffers
    (the -correct DEBUG-variant second device call)."""
    def fin(dc, kvis, tf, tl, mm, hist, trksums, covf, bits, corrected,
            faked, counts, end_s, expected_parity, revparity):
        def lane(dc1, kv1, tf1, tl1, mm1, h1, ts1, co1, b1, cb1, fk1,
                 cnt1, es1):
            st = dict(dc=dc1, kvis=kv1, t_firstbit=tf1, t_lastbit=tl1,
                      missed_midbits=mm1, hist=h1, trksums=ts1,
                      consume_overflow=co1, bits=b1, corrected_bits=cb1,
                      faked_tracks=fk1)
            r = nrzi_mod.nrzi_finish(st, T, expected_parity, revparity,
                                     maxb)
            r["end_s"] = es1
            r["unconsumed"] = jnp.sum(jnp.maximum(cnt1 - kv1, 0))
            return r
        return jax.vmap(lane)(dc, kvis, tf, tl, mm, hist, trksums, covf,
                              bits, corrected, faked, counts, end_s)
    return jax.jit(fin)


def _nrzi_correctdbg_segment(dec, a, b, S):
    """One segment under the -correct DEBUG-variant semantics: device
    slot scan streaming per-slot write/check records -> host replay of
    the parity/correction chain per parmset lane -> device finish."""
    opts = dec.opts
    res = dec.decode_segment_batch([(a, b)], bucket=S, correctdbg=True)
    res = {k: v[0, 0] for k, v in res.items()}          # [P, ...]
    P = res["end_s"].shape[0]
    T = opts.ntrks
    maxb = int(S / opts.spb * 1.3) + 64   # same formula as the batch call
    bits_l, corr_l, fak_l = [], [], []
    for p in range(P):
        bits, corr, fak = nrzi_mod.correct_debug_replay(
            res["rec_wr"][p].astype(np.int32), res["rec_lcb"][p],
            res["rec_agc"][p], res["rec_have"][p], T, maxb,
            opts.expected_parity)
        bits_l.append(bits)
        corr_l.append(corr)
        fak_l.append(fak)
    fin = _correctdbg_finish_fn(T, maxb)(
        jnp.asarray(res["dc"]), jnp.asarray(res["kvis"]),
        jnp.asarray(res["t_firstbit"]), jnp.asarray(res["t_lastbit"]),
        jnp.asarray(res["missed_midbits"]), jnp.asarray(res["hist"]),
        jnp.asarray(res["trksums"]),
        jnp.asarray(res["consume_overflow"].astype(bool)),
        jnp.asarray(np.stack(bits_l)), jnp.asarray(corr_l, I32),
        jnp.asarray(fak_l, I32), jnp.asarray(res["counts"]),
        jnp.asarray(res["end_s"]), jnp.int32(opts.expected_parity),
        jnp.int32(opts.revparity))
    out = {k: np.asarray(v) for k, v in fin.items()}
    for k in ("alltrk_max_agc", "alltrk_min_agc", "event_overflow"):
        out[k] = res[k]
    return out


def _decode_tape_nrzi_like(samples, opts, log, decoder=None):
    dec = decoder if decoder is not None else TapeDecoder(samples, opts)
    segs = dec.segments()
    stats = dict(nblocks=0, ntapemarks=0, nerrblocks=0, nwarnblocks=0,
                 nunusable=0, nmismatched=0, nmidbiterr=0, ncorrected=0,
                 ngoodmultiple=0,
                 tried=np.zeros(dec.P, int), chosen=np.zeros(dec.P, int),
                 deskew_percent=0.0, skew=None,
                 peak_hist=np.zeros((opts.ntrks, 50), np.int64),
                 peak_trksums=np.zeros(opts.ntrks, np.int64),
                 peak_bins=_peakstat_bins(opts.mode,
                                          1.0 / (opts.bpi * opts.ips)))
    if opts.deskew and opts.skew is None:
        dec.calibrate_deskew(segs)
        stats["deskew_percent"] = dec.deskew_percent
    stats["skew"] = dec.skew.tolist()

    if opts.parmscan and opts.mode != tb.MODE_GCR and log:
        log("-parmscan is only implemented for GCR (as in the reference's "
            "GCR_PARMSCAN build); ignored\n")
    if opts.parmscan and opts.mode == tb.MODE_GCR and segs and log:
        # GCR_PARMSCAN (readtape.c:1730-1754): grid-scan decode parms over
        # the first block before the normal decode begins. The reference
        # re-scans at every block position while numblks == 0; here that
        # is segments up to and including the first non-noise decode.
        for sp in segs:
            gcr_parmscan(dec, sp, log)
            r0 = dec.decode_segment(*sp, nparms=1)
            if int(np.asarray(r0["blktype"])[0]) not in (
                    0, nrzi_mod.BS_NOISE):
                break

    # decode all segments, batched by bucket size (vmapped on device).
    # For NRZI, unify to ONE bucket so tapemark-sized segments ride along
    # with data blocks (fewer device calls): safe because the NRZI slot
    # scan self-terminates at end-of-block, so over-long windows that reach
    # into the next segment decode nothing extra. PE/GCR per-track scans
    # have no in-scan block end, so they keep tight per-segment buckets.
    buckets = [seg.bucket_length(b - max(a - SEG_WARMUP, 0))
               for a, b in segs]
    maxbkt = max(buckets)
    unified = opts.mode == tb.MODE_NRZI and maxbkt <= 65536
    if unified:
        buckets = [maxbkt] * len(buckets)
    # batch cap: round-1's batched-while version corrupted whole lanes at
    # B=16 on the v5e; the current scan-with-outputs + Mosaic-kernel path
    # was re-proven bit-exact at B=16 and B=32 on hardware (round 3,
    # scripts/batch_exact.py), and B=16 measured fastest end-to-end.
    # Override with READTAPE_MAX_BATCH.
    max_batch_elems = int(os.environ.get("READTAPE_MAX_BATCH", "16")) * 32768

    def dispatch(indices, nparms):
        """Async-dispatch a set of segments; returns [(chunk, thunk)]."""
        # the cap bounds LANES (segments x parmsets): a parmset-0-only pass
        # can batch P x more segments per call at the same device footprint
        elems = max_batch_elems * max(1, dec.P // nparms)
        pending = []
        leftover = []
        if dec._granules is not None:
            # granule pipeline: RUNS of tape-order-consecutive same-bucket
            # segments, each decoded against its own granule window as its
            # own device execution. Uploads happen lazily inside
            # window_for, so the enqueue order interleaves [granules of
            # run k] -> [decode of run k] -> [granules of run k+1] -> ...
            # and the link streams granule k+1 while run k decodes. Runs
            # cap at 32 segments: finer pipeline grain than one
            # whole-phase program, and full runs stay a power of two so
            # every batch reuses one compiled executable.
            L = dec._granule_L
            runs = []
            cur, cga, cgb = [], 0, 0
            for i in sorted(indices, key=lambda i_: segs[i_][0]):
                S = buckets[i]
                a, b = segs[i]
                lo = max(a - SEG_WARMUP, 0)
                ga, gb = lo // L, -(-(b + S) // L)
                run_b = max(1, min(elems // S, 32))
                if cur and (buckets[cur[0]] != S or len(cur) >= run_b
                            or max(cgb, gb) - min(cga, ga) > _WINDOW_KMAX):
                    runs.append(cur)
                    cur = []
                if not cur:
                    cga, cgb = ga, gb
                cur.append(i)
                cga, cgb = min(cga, ga), max(cgb, gb)
            if cur:
                runs.append(cur)
            for run in runs:
                S = buckets[run[0]]
                spans = [segs[i] for i in run]
                win = dec.window_for(spans, S)
                if win is None:        # span too wide: full-tape fallback
                    leftover.extend(run)
                    continue
                B = seg.bucket_length(len(spans), 1)
                while len(spans) < B:
                    spans.append(spans[-1])
                pending.append(([run], dec.decode_segment_batch(
                    [spans], fetch=False, bucket=S, nparms=nparms,
                    window=win)))
            indices = leftover
        by_bucket = {}
        for i in indices:
            by_bucket.setdefault(buckets[i], []).append(i)
        for S, idxs in sorted(by_bucket.items()):
            bmax = max(1, elems // S)
            chunk_list, span_groups = [], []
            for lo in range(0, len(idxs), bmax):
                chunk = idxs[lo:lo + bmax]
                spans = [segs[i] for i in chunk]
                # pad to a power-of-two batch so every batch of a bucket
                # hits the same compiled program (remote TPU compiles are
                # expensive)
                B = (bmax if len(idxs) > bmax
                     else seg.bucket_length(len(spans), 1))
                while len(spans) < B:
                    spans.append(spans[-1])
                chunk_list.append(chunk)
                span_groups.append(spans)
            # all of a bucket's sub-batches go in ONE device execution
            # (lax.map inside the program); dispatch async, fetch after
            # everything is in flight
            pending.append((chunk_list, dec.decode_segment_batch(
                span_groups, fetch=False, bucket=S, nparms=nparms)))
        return pending

    def collect(pending, results):
        for chunk_list, thunk in pending:
            res = thunk()
            for g, chunk in enumerate(chunk_list):
                for j, i in enumerate(chunk):
                    results[i] = jax.tree.map(lambda x: x[g][j], res)

    # staged retry, exactly the reference's sequential-try semantics
    # (readtape.c:1755-1795): every block decodes with parmset 0 first; only
    # blocks that are not a stopping decode (perfect block / tapemark /
    # noise) are retried -- here re-decoded with ALL parmsets at once and
    # best-picked over the tried prefix. On clean tapes this is ~P x less
    # device work than decoding every parmset everywhere.
    results = [None] * len(segs)

    def stopper(i):
        res = results[i]
        mb = int(res["minbits"][0])
        if opts.mode == tb.MODE_PE and "end_s" in res and mb == 0:
            # an unreliable parmset-0 scan (never terminated / caps hit)
            # reporting minbits 0 must not trip PE's dead-track stopping
            # rule: its reference counterpart is a giant merged scan with
            # data on every track (see the PE walk below)
            a_, b_ = segs[i]
            sl = b_ - max(a_ - SEG_WARMUP, 0)
            if ((int(res["end_s"][0]) >= sl
                 or bool(res["tau_gaveup"][0])
                 or bool(res["scan_incomplete"][0]))
                    and int(res["blktype"][0]) in (nrzi_mod.BS_BLOCK,
                                                   nrzi_mod.BS_BADBLOCK)
                    and int(res["errcount"][0]) > 0):
                mb = 1
        return is_stopping_decode(
            int(res["blktype"][0]), int(res["errcount"][0]),
            int(res["warncount"][0]), mb, opts.mode)

    def rescue_bailed(idxs):
        """Fused-kernel ring-pressure bail (pathological segments only):
        re-decode those segments through the exact XLA path."""
        bailed = [i for i in idxs
                  if results[i] is not None
                  and "fused_bail" in results[i]
                  and np.any(results[i]["fused_bail"])]
        for i in bailed:
            res = dec.decode_segment_batch([(segs[i])], bucket=buckets[i],
                                           force_xla=True)
            results[i] = jax.tree.map(lambda x: x[0][0], res)
        if bailed:
            _tlog(f"fused bail fallback: {len(bailed)} segs")

    def decode_indices(idxs):
        import time as _time
        t0 = _time.perf_counter()
        pend = dispatch(idxs, 1)
        t1 = _time.perf_counter()
        collect(pend, results)
        rescue_bailed(idxs)
        t2 = _time.perf_counter()
        _tlog(f"phase1({len(idxs)} segs) dispatch {t1-t0:.2f}s "
              f"collect {t2-t1:.2f}s")
        if opts.multiple_tries and dec.P > 1:
            retry = [i for i in idxs if not stopper(i)]
            collect(dispatch(retry, dec.P), results)
            rescue_bailed(retry)
            _tlog(f"retry({len(retry)} segs) {_time.perf_counter()-t2:.2f}s")

    order = list(range(len(segs)))
    adjskew_seq = (opts.mode == tb.MODE_NRZI and opts.adjskew
                   and not opts.find_zeros)
    if adjskew_seq:
        # -adjskew (decoder.c:305-320, experimental in the reference):
        # after every data block, nudge each track's skew delay by +-1
        # sample based on that block's average peak deviation. The skew
        # applied to block n depends on blocks 0..n-1 AND the deviation
        # accumulator threads through every parmset try in the C's
        # sequential order (reset only in adjust_deskew, so tapemark /
        # noise segments roll their events into the next data block) --
        # so segments decode ONE AT A TIME, each parmset try its own
        # device call seeded with the running (count, mean).
        ibg_blank = int(cm.NRZI_IBG_SECS / opts.deltat)
        adj_n = np.zeros(opts.ntrks, np.float32)
        adj_mean = np.zeros(opts.ntrks, np.float32)
        worklist = order[:]
        order = []
        k = 0
        while k < len(worklist):
            i = worklist[k]
            k += 1
            a, b = segs[i]
            S_i = buckets[i]

            def one(psel, span=None):
                nonlocal adj_n, adj_mean
                r = dec.decode_segment_batch(
                    [span or (a, b)], bucket=S_i, parm_sel=(psel,),
                    adj_init=(adj_n, adj_mean))
                r = jax.tree.map(lambda x: x[0, 0], r)   # [nb=1, B=1, ...]
                adj_n = np.asarray(r["adj_n"][0], np.float32)
                adj_mean = np.asarray(r["adj_mean"][0], np.float32)
                return r

            tries_res = [one(0)]
            if opts.multiple_tries:
                while len(tries_res) < dec.P:
                    r = tries_res[-1]
                    if is_stopping_decode(
                            int(r["blktype"][0]), int(r["errcount"][0]),
                            int(r["warncount"][0]), int(r["minbits"][0]),
                            opts.mode):
                        break
                    tries_res.append(one(len(tries_res)))
            res = {kk: np.stack([np.asarray(r[kk][0]) for r in tries_res])
                   for kk in tries_res[0]}
            results[i] = res
            order.append(i)
            p, _tries = pick_best(res, len(tries_res),
                                  opts.multiple_tries, opts.mode)
            if p != len(tries_res) - 1:
                # re-decode with the winner (readtape.c:1853-1863); its
                # stat events accumulate AGAIN, like the C's re-decode
                rw = one(p)
                bitspace = float(np.asarray(rw["t_bitspaceavg"])[0])
            else:
                bitspace = float(res["t_bitspaceavg"][p])
            bt = int(res["blktype"][p])
            if bt in (nrzi_mod.BS_BLOCK, nrzi_mod.BS_BADBLOCK):
                # adjust_deskew runs for every got_datablock call
                # (readtape.c:1310), zero-length and label blocks included
                report = []
                thr = np.float32(0.1) * np.float32(bitspace)
                for trk in range(opts.ntrks):
                    dev = np.float32(adj_mean[trk])
                    act = 0
                    if dev < thr and dec.skew[trk] > 0:
                        dec.skew[trk] -= 1
                        act = -1
                    elif dev > thr and dec.skew[trk] < 50:  # MAXSKEWSAMP
                        dec.skew[trk] += 1
                        act = 1
                    report.append((float(dev) * opts.deltat,
                                   float(bitspace) * opts.deltat,
                                   act, int(dec.skew[trk])))
                res["_adjskew_report"] = report
                adj_n = np.zeros(opts.ntrks, np.float32)
                adj_mean = np.zeros(opts.ntrks, np.float32)
            # multi-block remainder, inline so it stays in tape order
            if ("unconsumed" in res and int(res["unconsumed"][p]) > 0
                    and bt != nrzi_mod.BS_NONE):
                a0_ = max(a - SEG_WARMUP, 0)
                a_rem = a0_ + int(res["end_s"][p]) + ibg_blank
                if a < a_rem < b - 4:
                    j = len(segs)
                    segs.append((a_rem, b))
                    buckets.append(
                        maxbkt if unified else
                        seg.bucket_length(b - max(a_rem - SEG_WARMUP, 0)))
                    results.append(None)
                    worklist.insert(k, j)
    elif (opts.mode == tb.MODE_NRZI and opts.do_correct_debug
          and not opts.find_zeros):
        # -correct under DEBUG-build semantics: device scan -> host
        # parity/correction replay -> device finish, one segment at a time
        # (the host replay is sequential by nature; this is an opt-in
        # recovery mode, not the throughput path)
        ibg_blank = int(cm.NRZI_IBG_SECS / opts.deltat)
        worklist = order[:]
        order = []
        k = 0
        while k < len(worklist):
            i = worklist[k]
            k += 1
            a, b = segs[i]
            res = _nrzi_correctdbg_segment(dec, a, b, buckets[i])
            results[i] = res
            order.append(i)
            p, _t = pick_best(res, len(res["blktype"]),
                              opts.multiple_tries, opts.mode)
            bt = int(res["blktype"][p])
            if int(res["unconsumed"][p]) > 0 and bt != nrzi_mod.BS_NONE:
                a0_ = max(a - SEG_WARMUP, 0)
                a_rem = a0_ + int(res["end_s"][p]) + ibg_blank
                if a < a_rem < b - 4:
                    j = len(segs)
                    segs.append((a_rem, b))
                    buckets.append(
                        maxbkt if unified else
                        seg.bucket_length(b - max(a_rem - SEG_WARMUP, 0)))
                    results.append(None)
                    worklist.insert(k, j)
    elif opts.mode == tb.MODE_NRZI and opts.find_zeros:
        # -zeros NRZI decodes as a SEQUENTIAL per-block chain, exactly
        # readtape.c:1720-1882: the zero-crossing extremum carries
        # (v_top/v_bot, decoder.c:617-649) are long-range -- they
        # accumulate gap NOISE from the previous block's end until the
        # next block's first pulse, and whether that carry tips over
        # ZEROCROSS_PEAK decides the arming of the block's first
        # transition.  So each window's eligibility must start where the
        # C's state reset happened: the previous block's end-of-block
        # sample + the NRZI_IBG blanking (decoder.c:901-904 delays the
        # non-BS_NONE return by interblock_counter samples, so blockstart
        # for EVERY attempt of the next block -- first try and retries
        # alike -- is end_s + NRZI_IBG_SECS/dt).  Activity segments serve
        # only as scan horizons; windows are (chain position, segment
        # end).  Sequential by nature (end_s is a decode output), which
        # is fine: -zeros is a recovery fallback, not the throughput path.
        ibg_blank = int(cm.NRZI_IBG_SECS / opts.deltat)
        act = segs[:]
        # one unified bucket class so chain windows share compiled
        # programs; a BS_NONE cascade can widen a window past the class,
        # which just compiles the next power of two once
        chainbkt = max(seg.bucket_length(b - max(pa_ - SEG_WARMUP, 0))
                       for pa_, b in zip([0] + [a for a, _ in act],
                                         [b for _, b in act]))
        del segs[:], buckets[:], results[:], order[:]
        cur, si = 0, 0
        while si < len(act):
            b_i = act[si][1]
            if cur >= b_i - 4:
                si += 1
                continue
            a0w = max(cur - SEG_WARMUP, 0)
            i = len(segs)
            segs.append((cur, b_i))
            buckets.append(max(chainbkt, seg.bucket_length(b_i - a0w)))
            results.append(None)
            order.append(i)
            decode_indices([i])
            res = results[i]
            p, _ = pick_best(res, len(res["blktype"]),
                             opts.multiple_tries, opts.mode)
            if int(res["blktype"][p]) == nrzi_mod.BS_NONE:
                # no transitions before this horizon: the C's scan just
                # keeps going, carries intact -- keep cur, widen to the
                # next segment's horizon (the probe window is dropped;
                # the C counts no attempt for it, readtape.c:1769)
                order.remove(i)
                si += 1
                continue
            nxt = a0w + int(res["end_s"][p]) + ibg_blank
            if nxt <= cur:
                si += 1
                continue
            cur = nxt
    else:
        decode_indices(order[:])

    # Multi-block segments (PE): the reference ends a PE block the moment
    # ALL tracks go idle (pe_end_of_block, decoder.c:868-877) and restarts
    # the scan with FRESH track state right after (noise/tapemark: next
    # sample; data block: after PE_IBG_SECS of interblock blanking).
    # Through a noisy gap it therefore hops micro noise-blocks, resetting
    # AGC/clock state every ~2.5 bit times -- which is how it keeps gap
    # noise from polluting the next real block's decode (the heavy-noise
    # regime README.txt:63-66 is about). The per-lane all-idle point tau
    # is computed in-device (end_s); segments whose winner left admitted
    # transitions or loose candidates beyond tau re-dispatch the
    # remainder, exactly readtape.c:1720-1882's per-block loop. Hops with
    # no peaks advance deterministically (fresh state, no admissions), so
    # quiet stretches fast-forward arithmetically to the next candidate
    # instead of dispatching a decode per 2.5-bit hop.
    # An UNFINISHED lane (end_s == seg_len: its tracks never all idled
    # inside the window) is semantically "the reference would have kept
    # scanning": its scan merges across our activity segments until the
    # tracks do all idle (possibly at the very end of the tape -- observed
    # in the reference's own DEBUG trace: a parmset-0 scan of a noisy
    # tapemark region ran 4000+ bits into the following blocks and came
    # back BS_BLOCK-with-errors, which is what kept the retry loop alive
    # long enough for parmset 1 to detect the tapemark). So the chain
    # walks segments in tape order, WIDENING any decode whose tried
    # prefix contains an unfinished lane to the next segment's horizon
    # (ultimately the tape end, where an unfinished scan is the
    # reference's EOF BS_NONE, readtape.c:1771). On clean tapes every
    # lane self-terminates and this walk dispatches nothing.
    if opts.mode == tb.MODE_PE:
        ibg_blank = int(cm.PE_IBG_SECS / opts.deltat)
        # re-anchor margin: a scan started ANCHOR samples before a peak
        # sees it with a full moving window on every track (stagger + W)
        # while its detection still lands inside the virtual idle horizon
        # -- the phase-free equivalent of the reference's fill-mode window
        # catching a peak right at a noise-hop boundary
        maxW = max(cm.pkww_width_for(ps.pkww_bitfrac, opts.bpi, opts.ips,
                                     opts.deltat)
                   for ps in opts.parmsets.sets)
        anchor = maxW + opts.ntrks - 2
        n_total = dec.n_samples
        orig_ends = sorted(b for _, b in (segs[i] for i in order))
        walk = order[:]
        consumed_until = -1
        endfile = False

        def tried_prefix(res, P_):
            """Lanes the sequential retry would have consumed, via the
            stopping rule (pick_best's `tried`)."""
            if not opts.multiple_tries:
                return 1
            for j in range(P_):
                if is_stopping_decode(int(res["blktype"][j]),
                                      int(res["errcount"][j]),
                                      int(res["warncount"][j]),
                                      int(res["minbits"][j]), opts.mode):
                    return j + 1
            return P_

        for i0 in walk:
            if endfile or segs[i0][0] < consumed_until:
                if i0 in order:
                    order.remove(i0)     # consumed by an earlier chain
                continue
            cur = i0
            for _hop in range(65536):
                if results[cur] is None:
                    decode_indices([cur])
                res = results[cur]
                if res is None or "unconsumed" not in res:
                    break
                a_c, b_c = segs[cur]
                a0_ = max(a_c - SEG_WARMUP, 0)
                seg_len_c = b_c - a0_
                P_ = len(res["blktype"])
                # Lanes whose scan never terminated in this window, gave
                # up on tau (idle-entry cap) or ran out of scan budget
                # have UNRELIABLE content. Their reference counterpart is
                # a giant merged scan whose every track accumulates data
                # (minbits > 0), i.e. a NON-stopping BS_BLOCK-with-errors
                # that keeps the retry loop alive -- whereas our capped
                # artifact can report minbits == 0, which would wrongly
                # trip PE's dead-track stopping rule (readtape.c:1782)
                # and abort the retries. Lift those to minbits = 1.
                unrel = [j for j in range(P_)
                         if (int(res["end_s"][j]) >= seg_len_c
                             or bool(res["tau_gaveup"][j])
                             or bool(res["scan_incomplete"][j]))
                         and int(res["blktype"][j]) in (
                             nrzi_mod.BS_BLOCK, nrzi_mod.BS_BADBLOCK)
                         and int(res["minbits"][j]) == 0
                         and int(res["errcount"][j]) > 0]
                if unrel:
                    res = {k2: (np.array(v, copy=True)
                                if getattr(v, "ndim", 0) >= 1 else v)
                           for k2, v in res.items()}
                    for j in unrel:
                        res["minbits"][j] = 1
                    results[cur] = res
                tp = tried_prefix(res, P_)
                # gaveup lanes have an UNKNOWN tau (idle-entry cap
                # exceeded) and incomplete lanes ran out of scan budget
                # (noise-dense spans): neither is a proven never-idle, so
                # treat them as finished at the segment end (the
                # pre-chain behavior) rather than cascading a widen to
                # the tape end.
                unfinished = [j for j in range(tp)
                              if int(res["end_s"][j]) >= seg_len_c
                              and not bool(res["tau_gaveup"][j])
                              and not bool(res["scan_incomplete"][j])]
                if unfinished and b_c < n_total - 4:
                    # widen to the next activity horizon (readblock keeps
                    # scanning); the chain consumes anything it overlaps
                    nxt_b = next((e for e in orig_ends if e > b_c),
                                 n_total)
                    nxt_b = max(nxt_b, min(2 * b_c - a_c, n_total))
                    _tlog(f"pe-walk widen ({a_c},{b_c})->{nxt_b} "
                          f"unfinished={unfinished}")
                    segs[cur] = (a_c, nxt_b)
                    buckets[cur] = seg.bucket_length(nxt_b - a0_)
                    results[cur] = None
                    continue
                p, _t = pick_best(res, P_, opts.multiple_tries, opts.mode)
                if unfinished and p in unfinished:
                    # tape end reached and even the best decode never all-
                    # idled: the reference's readblock hits EOF and
                    # returns BS_NONE (readtape.c:1771 -> endfile, the
                    # partial block dropped and nothing after decoded).
                    # When the winner is a FINISHED lane we emit it -- the
                    # unfinished lanes played their reference role of
                    # keeping the retry loop alive (their giant merged
                    # scans are non-stopping BS_BLOCKs with errors).
                    _tlog(f"pe-walk EOF at seg ({a_c},{b_c}): "
                          f"winner lane {p} unfinished at tape end")
                    if cur in order:
                        order.remove(cur)   # EOF: block dropped
                    endfile = True
                    break
                bt = int(res["blktype"][p])
                end_s = int(res["end_s"][p])
                consumed = int(res["consumed"][p])
                cand = int(res["cand_after"][p])
                cand_abs = a0_ + cand if cand < seg_len_c else None
                if consumed == 0 and bt == nrzi_mod.BS_NOISE:
                    # zero-admission hop: every candidate before tau was
                    # rejected with fresh state; candidates whose
                    # detection would have landed past tau (the raced
                    # ones) restart fully visible
                    race = int(res["cand_race"][p])
                    race_abs = a0_ + race if race < seg_len_c else None
                    if race_abs is None:
                        break
                    nxt_start = max(a_c + 1, race_abs - anchor)
                else:
                    # next scan start: BS_BLOCK sets interblock_counter
                    # (decode_pe.c:95); noise/tapemarks return immediately
                    step = (ibg_blank if bt in (nrzi_mod.BS_BLOCK,
                                                nrzi_mod.BS_BADBLOCK)
                            else 1)
                    nxt_start = a0_ + end_s + step
                    if cand_abs is None:
                        break           # nothing beyond tau at all
                    # skip empty hops: re-anchor at the next candidate
                    # (blank-skipped candidates keep the plain step)
                    nxt_start = max(nxt_start, cand_abs - anchor)
                if not (a_c < nxt_start < b_c - 4):
                    break
                # bound the hop to the next activity horizon: most hops
                # terminate (all-idle) well inside it, and the widening
                # above grows any that genuinely merge further
                b_hop = next((e for e in orig_ends
                              if e > nxt_start + 4), b_c)
                b_hop = min(max(b_hop, nxt_start + 5), b_c)
                j = len(segs)
                segs.append((nxt_start, b_hop))
                buckets.append(
                    maxbkt if unified else
                    seg.bucket_length(
                        b_hop - max(nxt_start - SEG_WARMUP, 0)))
                results.append(None)
                order.insert(order.index(cur) + 1, j)
                cur = j
            consumed_until = max(consumed_until, segs[cur][1])

    # Multi-block segments (GCR): same all-idle machinery as PE
    # (gcr_end_of_block fires when every track's datablock has dropped,
    # decoder.c:879-888). A GCR track only goes idle after it HAS data,
    # so a zero-admission hop can never fire tau -- no race re-anchor
    # needed; only gcr_postprocess (clean blocks) sets the interblock
    # counter (decode_gcr.c:673).
    if opts.mode == tb.MODE_GCR and not opts.find_zeros:
        ibg_blank = int(cm.GCR_IBG_SECS / opts.deltat)
        maxW = max(cm.pkww_width_for(ps.pkww_bitfrac, opts.bpi, opts.ips,
                                     opts.deltat)
                   for ps in opts.parmsets.sets)
        anchor = maxW + opts.ntrks - 2
        frontier = order[:]
        for _round in range(65536):
            spawned = []
            for i in frontier:
                a, b = segs[i]
                res = results[i]
                if res is None or "unconsumed" not in res:
                    continue
                p, _ = pick_best(res, len(res["blktype"]),
                                 opts.multiple_tries, opts.mode)
                bt = int(res["blktype"][p])
                a0_ = max(a - SEG_WARMUP, 0)
                seg_len_i = b - a0_
                end_s = int(res["end_s"][p])
                if end_s >= seg_len_i or bt == nrzi_mod.BS_NONE:
                    continue
                cand = int(res["cand_after"][p])
                cand_abs = a0_ + cand if cand < seg_len_i else None
                if cand_abs is None:
                    continue
                step = ibg_blank if bt == nrzi_mod.BS_BLOCK else 1
                nxt_start = a0_ + end_s + step
                nxt_start = max(nxt_start, cand_abs - anchor)
                if not (a < nxt_start < b - 4):
                    continue
                j = len(segs)
                segs.append((nxt_start, b))
                buckets.append(
                    maxbkt if unified else
                    seg.bucket_length(b - max(nxt_start - SEG_WARMUP, 0)))
                results.append(None)
                order.insert(order.index(i) + 1, j)
                spawned.append(j)
            if not spawned:
                break
            decode_indices(spawned)
            frontier = spawned

    # Multi-block segments (NRZI): the slot scan self-terminates at the
    # block's postamble idle; if admitted transitions remain past that
    # point, the segment holds ANOTHER block behind a sub-min_gap gap.
    # Re-dispatch the remainder as a fresh segment starting after the
    # reference's interblock blanking (decode_nrzi.c:112), exactly the
    # per-block re-entry of readtape.c:1720-1882. (The -adjskew driver
    # carves its remainders inline, sequentially.)
    if (opts.mode == tb.MODE_NRZI and not opts.find_zeros
            and not adjskew_seq and not opts.do_correct_debug):
        ibg_blank = int(cm.NRZI_IBG_SECS / opts.deltat)
        frontier = order[:]
        # each round carves at most ONE remainder per chain, so a merged
        # segment with N blocks needs N-1 rounds; every spawn strictly
        # advances its chain's start (a_rem > a), so the loop terminates
        # on its own -- the cap is only a runaway guard
        for _round in range(65536):
            spawned = []
            for i in frontier:
                a, b = segs[i]
                res = results[i]
                if "unconsumed" not in res:
                    continue
                p, _ = pick_best(res, len(res["blktype"]),
                                 opts.multiple_tries, opts.mode)
                if int(res["unconsumed"][p]) <= 0:
                    continue
                a0 = max(a - SEG_WARMUP, 0)
                a_rem = a0 + int(res["end_s"][p]) + ibg_blank
                if a_rem <= a or a_rem >= b - 4:
                    continue
                j = len(segs)
                segs.append((a_rem, b))
                bkt = seg.bucket_length(b - max(a_rem - SEG_WARMUP, 0))
                buckets.append(maxbkt if unified else bkt)
                results.append(None)
                order.insert(order.index(i) + 1, j)
                spawned.append(j)
            if not spawned:
                break
            decode_indices(spawned)
            frontier = spawned

    blocks = []
    for i in order:
        a, b = segs[i]
        if stats["nblocks"] >= opts.blklimit:
            break
        res = results[i]
        p, tries = pick_best(res, len(res["blktype"]),
                             opts.multiple_tries, opts.mode)
        if "hist" in res:
            # peak stats accumulate across EVERY parmset try, plus the
            # winner's re-decode when it wasn't the last try (the C never
            # resets peak_counts between retries, decoder.c:136-141;
            # re-decode at readtape.c:1853-1863)
            for t_i in range(min(tries, len(res["hist"]))):
                stats["peak_hist"] += res["hist"][t_i]
                stats["peak_trksums"] += res["trksums"][t_i]
            if tries > 1 and p != tries - 1:
                stats["peak_hist"] += res["hist"][p]
                stats["peak_trksums"] += res["trksums"][p]
        for i in range(tries):
            stats["tried"][i] += 1
        bt = int(res["blktype"][p])
        t_start = opts.t0_seconds + a * opts.deltat
        # block end: where the scan actually ended the block (postamble
        # fire), not the segment's end -- in a merged multi-block segment
        # every carved block otherwise reports the final block's end
        end_b = b
        if "end_s" in res:
            a0 = max(a - SEG_WARMUP, 0)
            end_b = min(a0 + int(res["end_s"][p]), b)
        t_end = opts.t0_seconds + end_b * opts.deltat
        if bt == nrzi_mod.BS_NONE:
            continue
        if bt != nrzi_mod.BS_NOISE:
            stats["chosen"][p] += 1
        if bt == nrzi_mod.BS_TAPEMARK:
            blocks.append(BlockResult("tapemark", parmset=p, tries=tries,
                                      t_start=t_start, t_end=t_end))
            stats["ntapemarks"] += 1
            continue
        if bt == nrzi_mod.BS_NOISE:
            continue
        err = int(res["errcount"][p])
        warn = int(res["warncount"][p])
        detail = {k: np.asarray(res[k][p]).tolist()
                  for k in ("minbits", "maxbits", "track_mismatch",
                            "vparity_errs", "crc_errs", "lrc_errs",
                            "missed_midbits", "corrected_bits",
                            "faked_tracks", "avg_bit_spacing",
                            "alltrk_max_agc", "alltrk_min_agc")}
        if "_adjskew_report" in res:
            detail["adjskew"] = res["_adjskew_report"]
        if bt == nrzi_mod.BS_BADBLOCK:
            blocks.append(BlockResult("badblock", parmset=p, tries=tries,
                                      errcount=err, warncount=warn,
                                      detail=detail,
                                      t_start=t_start, t_end=t_end))
            stats["nunusable"] += 1
            continue
        n = int(res["minbits"][p])
        frames = res["frames"][p][:n]
        data = (frames >> 1).astype(np.uint8)
        if opts.add_parity:
            data = data | ((frames & 1).astype(np.uint8) << (opts.ntrks - 1))
        blocks.append(BlockResult("data", bytes(data.tobytes()), parmset=p,
                                  tries=tries, errcount=err, warncount=warn,
                                  detail=detail,
                                  t_start=t_start, t_end=t_end))
        stats["nblocks"] += 1
        if err:
            stats["nerrblocks"] += 1
        if warn:
            stats["nwarnblocks"] += 1
        if detail["track_mismatch"]:
            stats["nmismatched"] += 1
        if detail["missed_midbits"]:
            stats["nmidbiterr"] += 1
        if detail["corrected_bits"]:
            stats["ncorrected"] += 1
        if err == 0 and warn == 0 and tries > 1:
            stats["ngoodmultiple"] += 1
    if adjskew_seq:
        # the end-of-run skew report shows the ADJUSTED delays
        stats["skew"] = dec.skew.tolist()
    return blocks, stats
