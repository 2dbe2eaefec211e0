"""Pallas TPU kernel for the NRZI admission scan (v2, row-vectorized).

The XLA jump scan pays ~100-300 us per sequential step on this runtime
(each step is a handful of unfused kernels, and every kernel in a
sequential loop costs ~10-25 us of dispatch); a Mosaic kernel runs the
same work at ~0.1-0.3 us per admission because the whole loop is ONE
kernel. Semantics mirror decoder.c:751-810 exactly (validated against the
XLA scan bit-for-bit).

Design — the key moves vs the retired v1 kernel (which lost to XLA at
~24 us/step from per-candidate dynamic VMEM indexing):

- The tape is processed ROW by row (128 positions per row). Window
  features are NOT computed in-kernel: the XLA front end already
  precomputes them data-parallel (trackscan.precompute_window_features);
  the kernel streams the [12, 128] feature rows in through the grid's
  BlockSpec pipeline, so there are ZERO dynamically indexed memory reads.
- Two variants share one commit-loop body (_row_commit):
  * _kernel: grid (B*T, rowblocks), parmsets on the SUBLANE axis —
    every state update covers all P parmsets at once; supports multiple
    distinct window widths (feature group per parmset).
  * _kernel_tracks: grid (B*P, rowblocks), TRACKS on the sublane axis —
    one instance scans a whole segment for one parmset; ~T x better VPU
    occupancy when P is small (the staged retry's dominant P=1 phase).
    Requires a single shared window width.
- Within a row, admission is a commit loop: eligibility mask (candidate
  positions past each lane's blind window whose AGC-scaled thresholds
  pass) -> first eligible position per sublane (lane reduce) -> feature
  extraction at that position (masked reduces) -> state update, repeat.
  Admission slots are statically unrolled and guarded by an SMEM
  work-remains flag, so rows with no admissions cost ~one eligibility
  test and gap rows cost almost nothing.
- Admitted records pack 4 f32 lanes each (s, t_peak, agc_after, is_top)
  into a per-row [SL, 128] register, written back once per row; the
  XLA side compacts them into the [K] transition buffers (same contract
  as trackscan.nrzi_track_scan_pre).

Parmset knob values are compile-time constants (a tape's parmsets are
fixed for the whole decode); rebuilt per grid step from sublane iota +
scalar selects because pallas_call forbids captured constant arrays.
Knob constants keep their ORIGINAL shapes through the shared body
([SL, 128] vectors in both variants, but W is a vector in _kernel and a
scalar in _kernel_tracks): scalar-vs-vector constants fuse differently
(FMA association) and a 1-ULP AGC divergence can cascade into admission
decisions on marginal peaks — both variants are validated bit-exact
against the XLA scan as-is.

Mosaic-on-v5e constraints baked in (learned the hard way in round 1):
no loop-carried vector registers (cssa copies crash the register
allocator) -> state lives in VMEM scratch; no bool-branch selects; no
sub-(8,128) blocked inputs; scalars for pl.when come from full reduces.
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
from .trackscan import _BITS_BIAS

RB = 8                      # feature rows (128 positions each) per grid step
NEG = np.float32(-1e30)

F_FIELDS = ("blind", "v_top", "v_bot", "n_adm", "agc", "vah", "vah_sum",
            "vah_cnt", "hndx", "max_agc", "min_agc", "v_lasttop",
            "v_lastbot", "peakcount", "overflow", "cnt")
REC_SENT = np.float32(-1.0)         # s-field sentinel for unused record slots


def _state_accessors(st_ref, SL):
    """Named [SL, 128] row-block views over the VMEM state scratch."""
    FIDX = {k: n for n, k in enumerate(F_FIELDS)}

    def st_read(k):
        n = FIDX[k] if isinstance(k, str) else len(F_FIELDS) + k
        return st_ref[n * SL:(n + 1) * SL, :]

    def st_write(k, val):
        n = FIDX[k] if isinstance(k, str) else len(F_FIELDS) + k
        st_ref[n * SL:(n + 1) * SL, :] = val

    return st_read, st_write


def _init_state(st_write, zf, ring):
    st_write("blind", zf - 1.0)
    st_write("v_top", zf)
    st_write("v_bot", zf)
    st_write("n_adm", zf)
    st_write("agc", zf + 1.0)
    st_write("vah", zf + cm.PKWW_PEAKHEIGHT)
    st_write("vah_sum", zf)
    st_write("vah_cnt", zf)
    st_write("hndx", zf)
    st_write("max_agc", zf)
    st_write("min_agc", zf + cm.FLT_MAX)
    st_write("v_lasttop", zf)
    st_write("v_lastbot", zf)
    st_write("peakcount", zf)
    st_write("overflow", zf)
    for k in range(ring):
        st_write(k, zf)


def _final_scalars(scal_ref, st_read, K):
    scal_ref[0, 0, 0] = st_read("n_adm")
    scal_ref[0, 0, 1] = st_read("max_agc")
    scal_ref[0, 0, 2] = st_read("min_agc")
    ov = st_read("overflow") + jnp.where(st_read("n_adm") > K, 1.0, 0.0)
    scal_ref[0, 0, 3] = ov


def _row_commit(*, rr, feat, cand_full, posf, base, active,
                rise_k, minp_k, aal_k, awin_k, W_term,
                st_read, st_write, recs_ref, smem_ref,
                lane, zf, A_MAX, ring, rec_sent):
    """The per-row admission commit loop, shared by both kernel variants.

    feat: the 10 per-row feature blocks (wmax, wmin, v_left, v_right,
    l_top, prevmax, nextmax, l_bot, prevmin, nextmin), each [SL, 128].
    cand_full: candidacy (+ active-sublane) mask. Knob constants
    rise_k/minp_k/aal_k/awin_k are [SL, 128]; W_term keeps each
    variant's original shape (vector / scalar — see module docstring).
    """
    (wmax, wmin, v_left, v_right, l_top, prevmax, nextmax, l_bot,
     prevmin, nextmin) = feat
    no_min = minp_k == 0.0
    use_exp = aal_k > 0.0
    use_win = awin_k > 0

    def elig(agc, vah, blind):
        scale = vah / cm.PKWW_PEAKHEIGHT
        rise = rise_k * scale / agc
        rmin = minp_k * scale / agc
        is_top = ((wmax > v_left + rise) & (wmax > v_right + rise) &
                  (no_min | (wmax > rmin)))
        is_bot = ((~is_top) & (wmin < v_left - rise) &
                  (wmin < v_right - rise) & (no_min | (wmin < -rmin)))
        return (is_top | is_bot) & cand_full & (posf > blind), is_top

    # row-leading eligibility -> work flag
    e0, _t0 = elig(st_read("agc"), st_read("vah"), st_read("blind"))
    smem_ref[0] = jnp.sum(e0.astype(I32))
    st_write("cnt", zf)
    recs_ref[0, 0, rr] = rec_sent

    def slot_body(j, carry, rr=rr):
        @pl.when(smem_ref[0] > 0)
        def _(rr=rr):
            agc = st_read("agc")
            vah = st_read("vah")
            blind = st_read("blind")
            e, is_top_row = elig(agc, vah, blind)

            # first eligible lane per sublane (+ broadcast back)
            li = jnp.min(jnp.where(e, lane, 9999), axis=1, keepdims=True)
            li = jnp.broadcast_to(li, lane.shape)
            adm = (li < 9999) & active
            sel = (lane == li) & adm

            def ext(x):
                v = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
                return jnp.broadcast_to(v, lane.shape)

            is_top = ext(jnp.where(is_top_row, F32(1.0), F32(0.0))) > 0.5
            is_top = is_top & adm
            is_bot = adm & (~is_top)
            L = ext(jnp.where(is_top_row, l_top, l_bot))
            val = ext(jnp.where(is_top_row, wmax, wmin))
            prev = ext(jnp.where(is_top_row, prevmax, prevmin))
            nxt = ext(jnp.where(is_top_row, nextmax, nextmin))
            s_f = li.astype(F32) + F32(base)         # admitted position

            # refine_peak (decoder.c:700-749)
            thr = cm.PEAK_THRESHOLD / agc
            ref = jnp.where(is_top, val - thr, val + thr)
            p_close = (is_top & (prev > ref)) | (is_bot & (prev < ref))
            n_close = (is_top & (nxt > ref)) | (is_bot & (nxt < ref))
            adj = jnp.where(p_close & ~n_close, F32(-0.5),
                            jnp.where(n_close & ~p_close, F32(0.5),
                                      F32(0.0)))
            t_peak = s_f - ((W_term - L) - adj)

            # ---- state updates (nrzi_track_scan's extra hook) ----
            n_adm = st_read("n_adm")
            v_top2 = jnp.where(is_top, val, st_read("v_top"))
            v_bot2 = jnp.where(is_bot, val, st_read("v_bot"))
            first = adm & (n_adm == 0.0)
            max_agc2 = jnp.where(first, agc, st_read("max_agc"))

            # nrzi_agc_policy (decode_nrzi.c:184-230)
            pc = st_read("peakcount") + jnp.where(adm, 1.0, 0.0)
            height = v_top2 - v_bot2
            in_base = (is_top & (pc >= cm.AGC_STARTBASE) &
                       (pc <= cm.AGC_ENDBASE))
            past = pc > cm.AGC_ENDBASE
            vah_cnt = st_read("vah_cnt")
            do_fin = is_top & past & (vah_cnt > 0.0)
            do_agc = adm & past & (vah_cnt == 0.0)

            vah_sum2 = jnp.where(in_base, st_read("vah_sum") + height,
                                 st_read("vah_sum"))
            vah_cnt2 = jnp.where(in_base, vah_cnt + 1.0, vah_cnt)
            hndx = st_read("hndx")
            hndx_acc = jnp.where(hndx + 1.0 >= awin_k.astype(F32),
                                 F32(0.0), hndx + 1.0)
            hndx2 = jnp.where(in_base, hndx_acc, hndx)
            ring_rows = [st_read(k) for k in range(ring)]
            ring2 = [jnp.where(in_base & (hndx == k), height, ring_rows[k])
                     for k in range(ring)]

            vah_fin = st_read("vah_sum") / jnp.maximum(vah_cnt, 1.0)
            vah2 = jnp.where(do_fin, vah_fin, vah)
            vah_cnt2 = jnp.where(do_fin, F32(0.0), vah_cnt2)

            # adjust_agc (decoder.c:500-531)
            lastheight = st_read("v_lasttop") - st_read("v_lastbot")
            hgt_ok = lastheight > 0.0
            g_exp = vah2 / jnp.maximum(lastheight, 1e-9)
            g_exp = jnp.minimum(aal_k * g_exp + (1 - aal_k) * agc,
                                cm.AGC_MAX_VALUE)
            ring3 = [jnp.where(do_agc & use_win & hgt_ok & (hndx == k),
                               lastheight, ring2[k]) for k in range(ring)]
            minh = zf + cm.FLT_MAX
            for k in range(ring):
                minh = jnp.minimum(
                    minh, jnp.where(k < awin_k, ring3[k], cm.FLT_MAX))
            g_win = jnp.minimum(vah2 / jnp.maximum(minh, 1e-9),
                                cm.AGC_MAX_VALUE)
            agc2 = jnp.where(do_agc & use_exp & hgt_ok, g_exp, agc)
            agc2 = jnp.where(do_agc & use_win & hgt_ok, g_win, agc2)
            hndx2 = jnp.where(do_agc & use_win & hgt_ok, hndx_acc, hndx2)
            changed = do_agc & (use_exp | use_win) & hgt_ok
            max_agc2 = jnp.where(changed & (agc2 > max_agc2), agc2,
                                 max_agc2)
            min_agc2 = jnp.where(changed & (agc2 < st_read("min_agc")),
                                 agc2, st_read("min_agc"))

            # ---- record write: lanes 4c..4c+3 = s, t_peak, agc', top ----
            cnt = st_read("cnt")
            c4 = cnt * 4.0
            lf = lane.astype(F32)
            in_slot = adm & (lf >= c4) & (lf < c4 + 4.0) & (cnt < A_MAX)
            fld = lane % 4
            newrec = jnp.where(fld == 0, s_f,
                      jnp.where(fld == 1, t_peak,
                       jnp.where(fld == 2, agc2,
                                 jnp.where(is_top, F32(1.0), F32(0.0)))))
            cur = recs_ref[0, 0, rr]
            recs_ref[0, 0, rr] = jnp.where(in_slot, newrec, cur)

            blind2 = jnp.where(adm, s_f + L, st_read("blind"))
            st_write("blind", blind2)
            st_write("v_top", v_top2)
            st_write("v_bot", v_bot2)
            st_write("n_adm", n_adm + jnp.where(adm, 1.0, 0.0))
            st_write("agc", agc2)
            st_write("vah", vah2)
            st_write("vah_sum", vah_sum2)
            st_write("vah_cnt", vah_cnt2)
            st_write("hndx", hndx2)
            st_write("max_agc", max_agc2)
            st_write("min_agc", min_agc2)
            st_write("v_lasttop", jnp.where(is_top, val,
                                            st_read("v_lasttop")))
            st_write("v_lastbot", jnp.where(is_bot, val,
                                            st_read("v_lastbot")))
            st_write("peakcount", pc)
            st_write("cnt", cnt + jnp.where(adm, 1.0, 0.0))
            for k in range(ring):
                st_write(k, ring3[k])

            # remaining eligibility under the new state; slot overflow
            e2, _ = elig(agc2, vah2, blind2)
            nleft = jnp.sum(e2.astype(F32), axis=1, keepdims=True)
            ovf = (jnp.broadcast_to(nleft, lane.shape) > 0.0) & \
                (cnt + 1.0 >= A_MAX)
            st_write("overflow",
                     jnp.where(ovf, zf + 1.0, st_read("overflow")))
            smem_ref[0] = jnp.sum(e2.astype(I32))

        return carry

    jax.lax.fori_loop(0, A_MAX, slot_body, 0)


def _kernel(feat_ref, recs_ref, scal_ref, st_ref, smem_ref, *,
            G, P, SL, S, Ws, rises, minps, aalphas, awindows, groups,
            A_MAX, K, ring):
    n_rblks = pl.num_programs(1)
    rblk = pl.program_id(1)
    sub = jax.lax.broadcasted_iota(I32, (SL, 128), 0)
    lane = jax.lax.broadcasted_iota(I32, (SL, 128), 1)
    lane1 = jax.lax.broadcasted_iota(I32, (1, 128), 1)
    active = sub < P
    zf = (sub * 0).astype(F32)

    def const_f(vals):
        out = zf
        for p, v in enumerate(vals):
            out = jnp.where(sub == p, jnp.float32(v), out)
        return out

    def const_i(vals):
        out = sub * 0
        for p, v in enumerate(vals):
            out = jnp.where(sub == p, jnp.int32(v), out)
        return out

    W_v = const_f([float(w) for w in Ws])
    rise_v = const_f(rises)
    minp_v = const_f(minps)
    aal_v = const_f(aalphas)
    awin_v = const_i(awindows)
    grp_v = const_i(groups)

    st_read, st_write = _state_accessors(st_ref, SL)
    rec_sent = jnp.where(lane % 4 == 0, REC_SENT, F32(0.0))

    @pl.when(rblk == 0)
    def _():
        _init_state(st_write, zf, ring)

    for rr in range(RB):
        # ---- the row's precomputed features, group-selected per parmset ----
        def fsel(f, rr=rr):
            out = jnp.broadcast_to(feat_ref[0, 0, 0, f, rr:rr + 1, :],
                                   (SL, 128))
            for g in range(1, G):
                out = jnp.where(grp_v == g,
                                feat_ref[0, g, 0, f, rr:rr + 1, :], out)
            return out

        feat = (fsel(0), fsel(1), fsel(2), fsel(3), fsel(4), fsel(5),
                fsel(6), fsel(7), fsel(8), fsel(9))
        # candidacy: nxt[s] == s (rows 10/11 are biased-bitcast int32)
        enc_here = feat_ref[0, 0, 0, 11, rr:rr + 1, :]
        nxt_here = jax.lax.bitcast_convert_type(enc_here, I32) - _BITS_BIAS
        base = (rblk * RB + rr) * 128
        pos1 = base + lane1                              # [1, 128] i32
        cand_full = ((nxt_here == pos1) & (pos1 < S)) & active
        posf = (base + lane).astype(F32)                 # [SL, 128]

        _row_commit(rr=rr, feat=feat, cand_full=cand_full, posf=posf,
                    base=base, active=active, rise_k=rise_v, minp_k=minp_v,
                    aal_k=aal_v, awin_k=awin_v, W_term=W_v,
                    st_read=st_read, st_write=st_write, recs_ref=recs_ref,
                    smem_ref=smem_ref, lane=lane, zf=zf, A_MAX=A_MAX,
                    ring=ring, rec_sent=rec_sent)

    # ---- final scalars at the last row block ----
    @pl.when(rblk == n_rblks - 1)
    def _():
        _final_scalars(scal_ref, st_read, K)


def _kernel_tracks(feat_ref, recs_ref, scal_ref, st_ref, smem_ref, *,
                   P, T, SL, S, W, rises, minps, aalphas, awindows,
                   A_MAX, K, ring):
    """Variant with SUBLANE = TRACK (one instance scans a whole segment
    for one parmset; grid = (B*P, row blocks)). Requires every parmset to
    share one window width (G == 1): the feature rows are then common to
    all parmsets and each instance selects its scalar knobs by parmset id.
    ~T x better VPU occupancy than the sublane=parmset variant when P is
    small -- which is the staged retry's dominant phase (P=1)."""
    n_rblks = pl.num_programs(1)
    rblk = pl.program_id(1)
    p_id = pl.program_id(0) % P
    sub = jax.lax.broadcasted_iota(I32, (SL, 128), 0)
    lane = jax.lax.broadcasted_iota(I32, (SL, 128), 1)
    active = sub < T
    zf = (sub * 0).astype(F32)

    # knob constants as [SL, 128] vectors (not scalars): see module
    # docstring (FMA association)
    def kf(vals):
        out = (sub * 0).astype(F32) + jnp.float32(vals[0])
        for p in range(1, P):
            out = jnp.where(p_id == p,
                            (sub * 0).astype(F32) + jnp.float32(vals[p]),
                            out)
        return out

    def ki(vals):
        out = sub * 0 + jnp.int32(vals[0])
        for p in range(1, P):
            out = jnp.where(p_id == p, sub * 0 + jnp.int32(vals[p]), out)
        return out

    rise_p = kf(rises)
    minp_p = kf(minps)
    aal_p = kf(aalphas)
    awin_p = ki(awindows)
    W_f = jnp.float32(W)

    st_read, st_write = _state_accessors(st_ref, SL)
    rec_sent = jnp.where(lane % 4 == 0, REC_SENT, F32(0.0))

    @pl.when(rblk == 0)
    def _():
        _init_state(st_write, zf, ring)

    for rr in range(RB):
        # feature rows cover ALL tracks at once (sublane-major reads)
        feat = tuple(feat_ref[0, 0, :, f, rr, :]
                     for f in (0, 1, 2, 3, 4, 5, 6, 7, 8, 9))
        enc_here = feat_ref[0, 0, :, 11, rr, :]
        nxt_here = jax.lax.bitcast_convert_type(enc_here, I32) - _BITS_BIAS
        base = (rblk * RB + rr) * 128
        pos = base + lane                                # [SL, 128]
        cand_full = (nxt_here == pos) & (pos < S) & active
        posf = pos.astype(F32)

        _row_commit(rr=rr, feat=feat, cand_full=cand_full, posf=posf,
                    base=base, active=active, rise_k=rise_p, minp_k=minp_p,
                    aal_k=aal_p, awin_k=awin_p, W_term=W_f,
                    st_read=st_read, st_write=st_write, recs_ref=recs_ref,
                    smem_ref=smem_ref, lane=lane, zf=zf, A_MAX=A_MAX,
                    ring=ring, rec_sent=rec_sent)

    @pl.when(rblk == n_rblks - 1)
    def _():
        _final_scalars(scal_ref, st_read, K)


def _compact_records(r4_flat, c, n_adm, *, K, R, idx_of):
    """Row-structured record compaction. The kernels emit ≤32 records per
    128-sample row, DENSE from slot 0 (REC_SENT marks unused slots), so
    the [K] transition buffers come from per-row counts + one tiny
    boundary scatter + cumsum + one aligned gather -- measured 2.3x
    faster than the rank-compaction scatter it replaces (the scatter was
    ~55% of the admission stage at bench shapes on the v5e).

    r4_flat: [B, N_all, 4] records in storage order (whole per-segment
    record plane, flattened); c: [B, P, T, R] per-row record counts (scan
    order); n_adm: [B, P, T]; idx_of(r, j, p, t): storage index into the
    N_all axis for record j of row r, parmset p, track t. Returns packed
    [B, P, T, K, 4]."""
    B, P, T, _ = c.shape
    o = jnp.cumsum(c, axis=-1)                           # [B,P,T,R] ends
    bi = jnp.arange(B)[:, None, None, None]
    pi = jnp.arange(P)[None, :, None, None]
    ti = jnp.arange(T)[None, None, :, None]
    marks = jnp.zeros((B, P, T, K + 1), I32)
    marks = marks.at[bi, pi, ti, jnp.minimum(o, K)].add(1, mode="drop")
    r_of_k = jnp.minimum(jnp.cumsum(marks[..., :K], axis=-1), R - 1)
    start = jnp.take_along_axis(o - c, r_of_k, axis=-1)  # [B,P,T,K]
    kk = jnp.arange(K, dtype=I32)
    j = kk[None, None, None, :] - start
    sh = r_of_k.shape
    src = idx_of(r_of_k, j, jnp.broadcast_to(pi, sh),
                 jnp.broadcast_to(ti, sh))
    src = jnp.clip(src, 0, r4_flat.shape[-2] - 1)
    out = jax.vmap(                                      # over B
        lambda rf, sc: jnp.take_along_axis(
            rf, sc.reshape(-1)[:, None], axis=0)
    )(r4_flat, src).reshape(B, P, T, K, 4)
    valid = kk[None, None, None, :] < n_adm[..., None]
    return jnp.where(valid[..., None], out, 0.0)


@functools.partial(jax.jit, static_argnames=(
    "S", "K", "Ws", "rises", "minps", "aalphas", "awindows", "groups",
    "interpret"))
def nrzi_track_scan_pallas_tracks(feat, *, S: int, K: int, Ws: tuple,
                                  rises: tuple, minps: tuple,
                                  aalphas: tuple, awindows: tuple,
                                  groups: tuple = None,
                                  interpret: bool = False):
    """Track-sublane variant: feat [B, 1, T, 12, S] (single shared window
    width), grid (B*P, rowblocks). Returns the same contract as
    nrzi_track_scan_pallas, axes [B, P, T, ...]."""
    B, G, T, NR, S_ = feat.shape
    assert G == 1 and NR == 12 and S_ == S and S % (128 * RB) == 0
    P = len(Ws)
    W = Ws[0]
    assert all(w == W for w in Ws)
    SL = 16
    assert T <= SL
    R = S // 128
    n_rblks = R // RB
    A_MAX = min(32, 128 // (W + 1) + 2)
    if 128 // (W + 1) + 1 > 32:
        raise ValueError("window too narrow for the 32-slot row record")
    ring = max(1, max(awindows))

    # pad the track axis to the full sublane tile so kernel reads are
    # [SL, 128]; padded tracks have zero features -> never candidates
    featp = jnp.pad(feat, ((0, 0), (0, 0), (0, SL - T), (0, 0), (0, 0)))

    kern = functools.partial(
        _kernel_tracks, P=P, T=T, SL=SL, S=S, W=W, rises=rises,
        minps=minps, aalphas=aalphas, awindows=awindows, A_MAX=A_MAX,
        K=K, ring=ring)
    NF = len(F_FIELDS) + ring
    recs, scal = pl.pallas_call(
        kern,
        grid=(B * P, n_rblks),
        in_specs=[
            pl.BlockSpec((1, 1, SL, 12, RB, 128),
                         lambda i, r, P=P: (i // P, 0, 0, 0, r, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RB, SL, 128),
                         lambda i, r, P=P: (i // P, i % P, r, 0, 0)),
            pl.BlockSpec((1, 1, 4, SL, 128),
                         lambda i, r, P=P: (i // P, i % P, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, P, R, SL, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, P, 4, SL, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NF * SL, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(featp.reshape(B, 1, SL, 12, R, 128))

    # recs[b, p, r, t, 4c + f] -> [B, P, T, K] via row-count compaction
    r6 = recs.reshape(B, P, R, SL, 32, 4)
    c = jnp.sum((r6[..., 0] >= 0.0).astype(I32), axis=-1)   # [B,P,R,SL]
    c = c.transpose(0, 1, 3, 2)[:, :, :T]                    # [B,P,T,R]
    n_adm = scal[:, :, 0, :T, 0].astype(I32)                 # [B, P, T]
    packed = _compact_records(
        recs.reshape(B, -1, 4), c, n_adm, K=K, R=R,
        idx_of=lambda r, j, p, t: ((p * R + r) * SL + t) * 32 + j)
    keep = jnp.arange(K)[None, None, None, :] < n_adm[..., None]
    return dict(
        tr_s=jnp.where(keep, packed[..., 0].astype(I32), jnp.int32(2 ** 30)),
        tr_t=jnp.where(keep, packed[..., 1], 0.0),
        tr_agc=jnp.where(keep, packed[..., 2], 1.0),
        tr_top=keep & (packed[..., 3] > 0.5),
        n_admitted=n_adm,
        max_agc_gain=scal[:, :, 1, :T, 0],
        min_agc_gain=scal[:, :, 2, :T, 0],
        incomplete=scal[:, :, 3, :T, 0] > 0.0,
    )


@functools.partial(jax.jit, static_argnames=(
    "S", "K", "Ws", "rises", "minps", "aalphas", "awindows", "groups",
    "interpret"))
def nrzi_track_scan_pallas(feat, *, S: int, K: int, Ws: tuple, rises: tuple,
                           minps: tuple, aalphas: tuple, awindows: tuple,
                           groups: tuple, interpret: bool = False):
    """feat: [B, G, T, 12, S] f32 — per distinct window width g, the
    12-row precomputed feature pack (trackscan.precompute_window_features
    with the masked jump table; rows 10/11 biased-bitcast int32). groups:
    per-parmset index into the G axis. Returns the nrzi_track_scan finals
    contract with axes [B, P, T, ...]."""
    B, G, T, NR, S_ = feat.shape
    assert NR == 12 and S_ == S and S % (128 * RB) == 0
    P = len(Ws)
    SL = 8 if P <= 8 else 16
    assert P <= SL
    R = S // 128
    n_rblks = R // RB
    A_MAX = min(32, 128 // (min(Ws) + 1) + 2)
    if 128 // (min(Ws) + 1) + 1 > 32:
        raise ValueError("window too narrow for the 32-slot row record")
    ring = max(1, max(awindows))

    kern = functools.partial(
        _kernel, G=G, P=P, SL=SL, S=S, Ws=Ws, rises=rises, minps=minps,
        aalphas=aalphas, awindows=awindows, groups=groups, A_MAX=A_MAX,
        K=K, ring=ring)
    NF = len(F_FIELDS) + ring
    recs, scal = pl.pallas_call(
        kern,
        grid=(B * T, n_rblks),
        in_specs=[
            pl.BlockSpec((1, G, 1, 12, RB, 128),
                         lambda i, r: (i // T, 0, i % T, 0, r, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RB, SL, 128),
                         lambda i, r: (i // T, i % T, r, 0, 0)),
            pl.BlockSpec((1, 1, 4, SL, 128),
                         lambda i, r: (i // T, i % T, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, R, SL, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, T, 4, SL, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NF * SL, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(feat.reshape(B, G, T, 12, R, 128))

    # ---- unpack: per-row record slots -> [B, P, T, K] transition buffers
    # recs[b, t, r, p, 4c + f]: record c of row r for parmset p; records
    # beyond K are dropped -- flagged via `incomplete` (the XLA path
    # instead overwrites the last slot, an only-on-overflow difference)
    r6 = recs.reshape(B, T, R, SL, 32, 4)
    c = jnp.sum((r6[..., 0] >= 0.0).astype(I32), axis=-1)    # [B,T,R,SL]
    c = c.transpose(0, 3, 1, 2)[:, :P]                        # [B,P,T,R]
    n_adm = scal[:, :, 0, :P, 0].astype(I32).transpose(0, 2, 1)   # [B, P, T]
    packed = _compact_records(
        recs.reshape(B, -1, 4), c, n_adm, K=K, R=R,
        idx_of=lambda r, j, p, t: ((t * R + r) * SL + p) * 32 + j)
    keep = jnp.arange(K)[None, None, None, :] < n_adm[..., None]
    return dict(
        tr_s=jnp.where(keep, packed[..., 0].astype(I32), jnp.int32(2 ** 30)),
        tr_t=jnp.where(keep, packed[..., 1], 0.0),
        tr_agc=jnp.where(keep, packed[..., 2], 1.0),
        tr_top=keep & (packed[..., 3] > 0.5),
        n_admitted=n_adm,
        max_agc_gain=scal[:, :, 1, :P, 0].transpose(0, 2, 1),
        min_agc_gain=scal[:, :, 2, :P, 0].transpose(0, 2, 1),
        incomplete=scal[:, :, 3, :P, 0].transpose(0, 2, 1) > 0.0,
    )
