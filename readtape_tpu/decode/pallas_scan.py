"""Pallas TPU kernel for the NRZI admission scan.

The XLA scan pays ~100-250 us per sequential step (each step is ~10-30
fused kernels and every kernel costs ~5-15 us of dispatch through this
environment's relay); a Mosaic kernel runs the same loop at ~100-300 ns per
step. Design (see PLAN.md / decoder.c:751-810 for the semantics):

- ONE kernel instance per (batch, track) pair; grid instances serialize on
  the single TensorCore, so all P parmsets are evaluated INSIDE the
  instance, packed across vector lanes (lane p = parmset p).
- No cursor jumps: the instance iterates the UNION candidate list in order
  and each parmset applies a blind-window predicate (process only
  candidates strictly past its last admission's blind region) -- visit
  order and admission decisions are identical to the jump scan.
- The candidate's +-128-sample neighborhood is two dynamically indexed
  rows of the [S/128, 128] waveform, loaded ONCE and shared by all
  parmsets; window extremes/argmax reduce per distinct (static) window
  width, then broadcast group->lane.
- Admitted-transition records pack 32 per row (4 f32 lanes each: s, t_peak,
  agc_after, is_top) and are written with predicated read-modify-write row
  stores; per-parmset scalars stream out as lane-vector rows.

Parmset knob values (window widths, thresholds, AGC constants) are baked
into the kernel as compile-time constants: a tape's parmsets are fixed for
the whole decode, and specializing eliminates all scalar memory traffic.
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

BIG = np.float32(1e30)
NEG = np.float32(-1e30)
RECS_PER_ROW = 32          # 4 f32 lanes per record


def _lane_iota():
    return jax.lax.broadcasted_iota(I32, (1, 128), 1)


def _extract(vec, lane: int):
    """Static-lane scalar extraction from a [1, 128] vreg."""
    return jnp.sum(jnp.where(_lane_iota() == lane, vec, 0).astype(vec.dtype))


def _lanes_const(vals, dtype):
    """[P] python values -> [1, 128] vreg (lane p = vals[p]), built from
    iota + scalar selects: pallas_call forbids captured constant ARRAYS,
    but scalar constants are fine."""
    lane = _lane_iota()
    out = (lane * 0).astype(dtype)
    for p, val in enumerate(vals):
        out = jnp.where(lane == p, jnp.asarray(val, dtype), out)
    return out


F_FIELDS = ("v_top", "v_bot", "agc", "vah", "vah_sum", "max_agc",
            "min_agc", "v_lasttop", "v_lastbot")
I_FIELDS = ("blind", "n_adm", "vah_cnt", "hndx", "peakcount")


def _kernel(v_ref, cand_ref, recs_ref, scal_ref, f_ref, i_ref, *,
            S, R, Ccap, K, P, Ws, rises, minps, aalphas, awindows,
            agc_ring):
    KR = recs_ref.shape[3]
    wgroups = sorted(set(Ws))
    lane = _lane_iota()
    active = lane < P

    # static lane constants -- keep the persistent set minimal (the v5e
    # register allocator crashes under vreg pressure); booleans and group
    # masks derive from these with one op at point of use
    W_v = _lanes_const([float(w) for w in Ws], F32)
    rise_v = _lanes_const(rises, F32)
    minp_v = _lanes_const(minps, F32)
    aal_v = _lanes_const(aalphas, F32)
    awin_v = _lanes_const(awindows, I32)
    no_min_v = minp_v == 0.0
    use_exp_v = aal_v > 0.0
    use_win_v = awin_v > 0
    gmask = {Wd: W_v == float(Wd) for Wd in wgroups}

    zi = lane * 0
    zf = zi.astype(F32)

    # zero the record buffer (unwritten rows must be inert); the iota*0
    # construction avoids a captured constant array
    zero_block = (jax.lax.broadcasted_iota(I32, (KR, 128), 0) * 0).astype(F32)
    for p in range(P):
        recs_ref[0, 0, p] = zero_block

    # candidate count rides in the extra trailing row of the cand array
    # (lane 0); TPU lowering rejects sub-(8,128) blocked scalar inputs
    ncand = jnp.sum(jnp.where(lane == 0, cand_ref[0, 0, pl.ds(Ccap // 128, 1), :], 0))

    gpos_iota = jax.lax.broadcasted_iota(I32, (2, 128), 0) * 128 + \
        jax.lax.broadcasted_iota(I32, (2, 128), 1)

    init = dict(
        blind=zi - 1,
        v_top=zf, v_bot=zf,
        n_adm=zi,
        agc=zf + 1.0,
        vah=zf + cm.PKWW_PEAKHEIGHT,
        vah_sum=zf, vah_cnt=zi,
        hndx=zi,
        max_agc=zf, min_agc=zf + cm.FLT_MAX,
        v_lasttop=zf, v_lastbot=zf,
        peakcount=zi,
        ring=tuple(zf for _ in range(agc_ring)),
    )

    # state lives in VMEM scratch, not the fori carry: loop-carried vregs
    # produce "copy for cssa" phis that crash the v5e register allocator
    def pack(st):
        f_ref[...] = jnp.concatenate(
            [st[k] for k in F_FIELDS] + list(st["ring"]), axis=0)
        i_ref[...] = jnp.concatenate([st[k] for k in I_FIELDS], axis=0)

    def unpack():
        f = f_ref[...]
        i_ = i_ref[...]
        st = {k: f[n:n + 1] for n, k in enumerate(F_FIELDS)}
        st["ring"] = tuple(f[len(F_FIELDS) + k: len(F_FIELDS) + k + 1]
                           for k in range(agc_ring))
        st.update({k: i_[n:n + 1] for n, k in enumerate(I_FIELDS)})
        return st

    pack(init)

    def compute(i, st):
        # ---- candidate position (dynamic row + lane extract) ----
        crow = cand_ref[0, 0, pl.ds(i // 128, 1), :]
        s = jnp.sum(jnp.where(lane == i % 128, crow, 0))
        # vector-form liveness: Mosaic mishandles scalar-bool -> vector
        # broadcasts (i8 -> i1 truncation), so compare as [1, 128] vectors
        live = ((zi + i) < ncand) & ((zi + s) < S)
        s_c = jnp.minimum(s, S - 1)

        # ---- shared waveform neighborhood ----
        r = jnp.clip(s_c // 128 - 1, 0, R - 2)
        two = jnp.concatenate([v_ref[0, 0, pl.ds(r, 1), :],
                               v_ref[0, 0, pl.ds(r + 1, 1), :]], axis=0)
        gpos = r * 128 + gpos_iota

        # ---- per distinct W: window features (group scalars) ----
        feat = {}
        for Wd in wgroups:
            left = jnp.maximum(s_c - Wd + 1, 0)
            m = (gpos >= left) & (gpos <= s_c)
            top = jnp.where(m, two, NEG)
            bot = jnp.where(m, two, BIG)
            wmax = jnp.max(top)
            wmin = jnp.min(bot)
            k_t = jnp.min(jnp.where((two >= wmax) & m, gpos, 2 ** 30))
            k_b = jnp.min(jnp.where((two <= wmin) & m, gpos, 2 ** 30))
            grab = lambda k: jnp.sum(jnp.where(gpos == k, two, 0.0))
            feat[Wd] = dict(
                wmax=wmax, wmin=wmin,
                v_left=grab(left),
                l_top=(k_t - left + 1).astype(F32),
                l_bot=(k_b - left + 1).astype(F32),
                prevmax=grab(k_t - 1), nextmax=grab(k_t + 1),
                prevmin=grab(k_b - 1), nextmin=grab(k_b + 1),
            )
        v_right = jnp.sum(jnp.where(gpos == s_c, two, 0.0))

        def bcast(name):
            out = zf
            for Wd in wgroups:
                out = jnp.where(gmask[Wd], feat[Wd][name], out)
            return out

        wmax_v, wmin_v = bcast("wmax"), bcast("wmin")
        vleft_v = bcast("v_left")
        ltop_v, lbot_v = bcast("l_top"), bcast("l_bot")

        # ---- admission test (decoder.c:781-810) ----
        scale = st["vah"] / cm.PKWW_PEAKHEIGHT
        rise = rise_v * scale / st["agc"]
        rmin = minp_v * scale / st["agc"]
        vis = active & live & (s > st["blind"])
        is_top = (vis & (wmax_v > vleft_v + rise) &
                  (wmax_v > v_right + rise) &
                  (no_min_v | (wmax_v > rmin)))
        is_bot = ((~is_top) & vis & (wmin_v < vleft_v - rise) &
                  (wmin_v < v_right - rise) &
                  (no_min_v | (wmin_v < -rmin)))
        admit = is_top | is_bot

        # ---- refine_time (decoder.c:700-749) ----
        L = jnp.where(is_top, ltop_v, lbot_v)
        val = jnp.where(is_top, wmax_v, wmin_v)
        prev = jnp.where(is_top, bcast("prevmax"), bcast("prevmin"))
        nxt = jnp.where(is_top, bcast("nextmax"), bcast("nextmin"))
        thr = cm.PEAK_THRESHOLD / st["agc"]
        ref = jnp.where(is_top, val - thr, val + thr)
        # logical (not select) combination: Mosaic can't lower selects with
        # BOOL branches (i8->i1 truncation)
        p_close = (is_top & (prev > ref)) | (~is_top & (prev < ref))
        n_close = (is_top & (nxt > ref)) | (~is_top & (nxt < ref))
        adj = jnp.where(p_close & ~n_close, F32(-0.5),
                        jnp.where(n_close & ~p_close, F32(0.5), F32(0.0)))
        t_peak = s.astype(F32) - ((W_v - L) - adj)

        # ---- state updates mirroring nrzi_track_scan's extra hook ----
        v_top2 = jnp.where(is_top, wmax_v, st["v_top"])
        v_bot2 = jnp.where(is_bot, wmin_v, st["v_bot"])
        first = admit & (st["n_adm"] == 0)
        max_agc2 = jnp.where(first, st["agc"], st["max_agc"])

        # nrzi_agc_policy (decode_nrzi.c:184-230)
        pc = st["peakcount"] + admit.astype(I32)
        height = v_top2 - v_bot2
        in_base = is_top & (pc >= cm.AGC_STARTBASE) & (pc <= cm.AGC_ENDBASE)
        past = pc > cm.AGC_ENDBASE
        do_fin = is_top & past & (st["vah_cnt"] > 0)
        do_agc = admit & past & (st["vah_cnt"] == 0)

        # accumulate_baseline
        vah_sum2 = jnp.where(in_base, st["vah_sum"] + height, st["vah_sum"])
        vah_cnt2 = jnp.where(in_base, st["vah_cnt"] + 1, st["vah_cnt"])
        ring2 = tuple(
            jnp.where(in_base & (st["hndx"] == k), height, st["ring"][k])
            for k in range(agc_ring))
        hndx_acc = jnp.where(st["hndx"] + 1 >= awin_v, 0, st["hndx"] + 1)
        hndx2 = jnp.where(in_base, hndx_acc, st["hndx"])

        # finish_baseline
        vah_fin = st["vah_sum"] / jnp.maximum(st["vah_cnt"], 1).astype(F32)
        vah2 = jnp.where(do_fin, vah_fin, st["vah"])
        vah_cnt2 = jnp.where(do_fin, 0, vah_cnt2)

        # adjust_agc (decoder.c:500-531)
        lastheight = st["v_lasttop"] - st["v_lastbot"]
        hgt_ok = lastheight > 0
        g_exp = vah2 / jnp.maximum(lastheight, 1e-9)
        g_exp = jnp.minimum(aal_v * g_exp + (1 - aal_v) * st["agc"],
                            cm.AGC_MAX_VALUE)
        ring3 = tuple(
            jnp.where(do_agc & use_win_v & hgt_ok & (st["hndx"] == k),
                      lastheight, ring2[k]) for k in range(agc_ring))
        minh = zf + cm.FLT_MAX
        for k in range(agc_ring):
            minh = jnp.minimum(minh, jnp.where(k < awin_v, ring3[k],
                                               cm.FLT_MAX))
        g_win = jnp.minimum(vah2 / jnp.maximum(minh, 1e-9),
                            cm.AGC_MAX_VALUE)
        agc2 = jnp.where(do_agc & use_exp_v & hgt_ok, g_exp, st["agc"])
        agc2 = jnp.where(do_agc & use_win_v & hgt_ok, g_win, agc2)
        hndx2 = jnp.where(do_agc & use_win_v & hgt_ok, hndx_acc, hndx2)
        changed = do_agc & (use_exp_v | use_win_v) & hgt_ok
        max_agc2 = jnp.where(changed & (agc2 > max_agc2), agc2, max_agc2)
        min_agc2 = jnp.where(changed & (agc2 < st["min_agc"]), agc2,
                             st["min_agc"])

        # ---- streamed records: 32 per row, 4 lanes per record ----
        for p in range(P):
            adm_p = _extract(admit.astype(I32), p) > 0

            @pl.when(adm_p)
            def _(p=p):
                n_p = _extract(st["n_adm"], p)
                idx = jnp.minimum(n_p, K - 1)
                row, c = idx // RECS_PER_ROW, idx % RECS_PER_ROW
                cur = recs_ref[0, 0, p, pl.ds(row, 1), :]
                l4 = lane - 4 * c
                neww = jnp.where(l4 == 0, s.astype(F32),
                        jnp.where(l4 == 1, _extract(t_peak, p),
                         jnp.where(l4 == 2, _extract(agc2, p),
                          jnp.where(l4 == 3,
                                    _extract(is_top.astype(F32), p), cur))))
                recs_ref[0, 0, p, pl.ds(row, 1), :] = neww

        return dict(
            blind=jnp.where(admit, s + L.astype(I32), st["blind"]),
            v_top=v_top2, v_bot=v_bot2,
            n_adm=st["n_adm"] + admit.astype(I32),
            agc=agc2, vah=vah2, vah_sum=vah_sum2, vah_cnt=vah_cnt2,
            hndx=hndx2, max_agc=max_agc2, min_agc=min_agc2,
            v_lasttop=jnp.where(is_top, wmax_v, st["v_lasttop"]),
            v_lastbot=jnp.where(is_bot, wmin_v, st["v_lastbot"]),
            peakcount=pc, ring=ring3,
        )

    def body(i, _):
        pack(compute(i, unpack()))
        return 0

    jax.lax.fori_loop(0, jnp.minimum(ncand, Ccap), body, 0)
    fin = unpack()

    scal_ref[0, 0, 0, :] = fin["n_adm"].astype(F32)[0]
    scal_ref[0, 0, 1, :] = fin["max_agc"][0]
    scal_ref[0, 0, 2, :] = fin["min_agc"][0]
    scal_ref[0, 0, 3, :] = fin["agc"][0]
    scal_ref[0, 0, 4, :] = fin["vah"][0]
    scal_ref[0, 0, 5, :] = fin["peakcount"].astype(F32)[0]


@functools.partial(jax.jit, static_argnames=(
    "S", "Ccap", "K", "Ws", "rises", "minps", "aalphas", "awindows",
    "agc_ring", "interpret"))
def nrzi_track_scan_pallas(v, cand, ncand, *, S: int, Ccap: int, K: int,
                           Ws: tuple, rises: tuple, minps: tuple,
                           aalphas: tuple, awindows: tuple,
                           agc_ring: int = 0,
                           interpret: bool = False):
    """v: [B, T, S] f32 volts; cand: [B, T, Ccap] i32 ascending union
    candidate positions (S-padded); ncand: [B, T] i32 true counts.
    Returns the nrzi_track_scan finals contract, axes [B, P, T, ...]."""
    B, T, _ = v.shape
    P = len(Ws)
    assert S % 128 == 0 and Ccap % 128 == 0
    R = S // 128
    KR = -(-K // RECS_PER_ROW)
    if agc_ring <= 0:
        # ring entries past the largest active agc_window are never read
        agc_ring = max(1, max(awindows))

    kern = functools.partial(
        _kernel, S=S, R=R, Ccap=Ccap, K=K, P=P, Ws=Ws, rises=rises,
        minps=minps, aalphas=aalphas, awindows=awindows, agc_ring=agc_ring)
    cand2 = jnp.concatenate(
        [cand.reshape(B, T, Ccap // 128, 128),
         jnp.broadcast_to(
             jnp.where(jnp.arange(128) == 0, 1, 0)[None, None, None, :] *
             ncand[:, :, None, None], (B, T, 1, 128)).astype(I32)],
        axis=2)
    recs, scal = pl.pallas_call(
        kern,
        grid=(B * T,),
        in_specs=[
            pl.BlockSpec((1, 1, R, 128), lambda i: (i // T, i % T, 0, 0)),
            pl.BlockSpec((1, 1, Ccap // 128 + 1, 128),
                         lambda i: (i // T, i % T, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, P, KR, 128),
                         lambda i: (i // T, i % T, 0, 0, 0)),
            pl.BlockSpec((1, 1, 8, 128), lambda i: (i // T, i % T, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, P, KR, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, T, 8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((len(F_FIELDS) + agc_ring, 128), jnp.float32),
            pltpu.VMEM((len(I_FIELDS), 128), jnp.int32),
        ],
        interpret=interpret,
    )(v.reshape(B, T, R, 128), cand2)

    # unpack records -> [B, P, T, K] transition buffers
    r4 = recs.reshape(B, T, P, KR, RECS_PER_ROW, 4)[..., :, :, :]
    r4 = r4.reshape(B, T, P, KR * RECS_PER_ROW, 4)[:, :, :, :K, :]
    r4 = r4.transpose(0, 2, 1, 3, 4)                  # [B, P, T, K, 4]
    n_adm = scal[:, :, 0, :P].astype(I32).transpose(0, 2, 1)  # [B, P, T]
    rank = jnp.arange(K, dtype=I32)
    keep = rank[None, None, None, :] < n_adm[..., None]
    return dict(
        tr_s=jnp.where(keep, r4[..., 0].astype(I32), jnp.int32(2 ** 30)),
        tr_t=jnp.where(keep, r4[..., 1], 0.0),
        tr_agc=jnp.where(keep, r4[..., 2], 1.0),
        tr_top=keep & (r4[..., 3] > 0.5),
        n_admitted=n_adm,
        max_agc_gain=scal[:, :, 1, :P].transpose(0, 2, 1),
        min_agc_gain=scal[:, :, 2, :P].transpose(0, 2, 1),
        incomplete=jnp.broadcast_to(
            (ncand > Ccap)[:, None, :], (B, P, T)),
    )


def union_candidates(loose_mask: jnp.ndarray, Ccap: int):
    """[T, S] bool union candidate mask -> (positions [T, Ccap] ascending,
    S-padded; counts [T])."""
    T, S = loose_mask.shape
    idxs = jnp.broadcast_to(jnp.arange(S, dtype=I32), (T, S))
    rank = jnp.cumsum(loose_mask, axis=1) - 1
    scat = jnp.where(loose_mask, jnp.minimum(rank, Ccap - 1), Ccap)
    out = jnp.full((T, Ccap + 1), S, I32)
    out = jax.vmap(lambda o, st, v_: o.at[st].set(v_, mode="drop"))(
        out, scat, idxs)
    return out[:, :Ccap], jnp.sum(loose_mask, axis=1)
