"""Fused Mosaic kernel for NRZI: window features + peak admission + the
global bit-slot scan + bit/statistic accumulation in ONE tape sweep.

Round-3 measurements showed the three-stage Pallas pipeline (admission
kernel -> XLA compaction -> slot kernel -> XLA reconstruct) spends more
than half its time in the XLA glue and the intermediate HBM streams
(~620 MB per 16-segment batch: the [B,P,R,16,128] admission record
plane, the [B,P,T,Kp] transition regather, and the per-slot
stream/track-block outputs). This kernel removes all of it:

  grid = (B*P, S/1024); each step reads 1024 samples of volts per track,

  1. computes the 10 per-position window features IN-KERNEL via
     lane-roll sparse-table doubling over a (prev row, cur row) pair
     (replacing the XLA feature precompute and its 14 MB/segment pack),
  2. runs the admission commit loop (same formulation as
     pallas_scan._row_commit, validated bit-exact against the XLA jump
     scan) and appends admitted transitions to per-track VMEM rings,
  3. advances the global slot machine (same formulation as
     pallas_slot._kernel) over every bit slot whose consume boundary
     falls inside the swept samples -- admission and slot decoding are
     one-way coupled (slots only read transitions with s_det < s_z,
     all of which are already in the rings; see the boundary proof in
     _slot_iteration), and
  4. accumulates the per-track BIT BUFFERS, peak-statistics histogram,
     first/last bit times and all block scalars in VMEM, so the XLA
     side goes straight to nrzi_finish -- no stream reconstruction.

Semantics are decoder.c:751-810 (admission), decode_nrzi.c:86-314
(slot consume/zerocheck incl. -correct's release-binary AGC-keyed flip,
decode_nrzi.c:116-140), validated bit-exact against the XLA scans
(tests/test_pallas_fused.py).

Mosaic-on-v5e constraints (inherited from rounds 1-3): state in VMEM
scratch (no loop-carried vectors), no bool-branch selects, no
sub-(8,128) blocked inputs, scalars for pl.when from full reduces,
knob constants rebuilt from iota + selects (no captured arrays).
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

RB = 16                      # 128-sample rows per grid step
NEG = np.float32(-1e30)
NEGF = np.float32(-3.0e38)   # stage1.NEG (loose-candidate fill)
POSF = np.float32(3.0e38)
BIG_S = np.float32(2 ** 30)

# ---- meta input lanes ([B, 16, 128] f32, lane-replicated rows) ----
M_SEGLEN, M_LEAD, M_STATLB, M_STATBW, M_EXPPAR = range(5)
M_RISEF, M_MINF = 5, 6       # per-track floors: value at (row=track, lane)

# ---- final-scalars output lanes ([B*P, 16, 128]) ----
(L_NADM, L_MAXAGC, L_MINAGC, L_INCOMP, L_KVIS, L_DC, L_TFIRST, L_TLAST,
 L_TRKSUM, L_FAKED, L_ENDED, L_CONSOVF, L_ENDS, L_MISSMID, L_NSLOT,
 L_CORR, L_BAIL) = range(17)

# ---- SMEM scalar slots (f32) ----
(SM_TLC, SM_TLM, SM_POST, SM_AVG, SM_BITNDX, SM_DONE, SM_OVF, SM_ENDED,
 SM_ENDS, SM_NSLOT, SM_STARTED, SM_MISSMID, SM_CORR, SM_BAIL,
 SM_BITBASE, SM_AWORK) = range(16)
N_SM = 16

RING = 256                   # per-track transition ring entries (2 blocks)

# ---- VMEM state rows (each a [16, 128] block unless noted) ----
# admission state (pallas_scan.F_FIELDS order + AGC ring rows appended)
ADM_FIELDS = ("blind", "v_top", "v_bot", "n_adm", "agc", "vah", "vah_sum",
              "vah_cnt", "hndx", "max_agc", "min_agc", "v_lasttop",
              "v_lastbot", "peakcount", "overflow")


def _fused_layout(agc_ring: int):
    """Row offsets into the VMEM state scratch."""
    off = {}
    n = 0

    def alloc(name, rows=16):
        nonlocal n
        off[name] = n
        n += rows
        return off[name]

    for f in ADM_FIELDS:
        alloc(f"adm_{f}")
    for k in range(agc_ring):
        alloc(f"admring_{k}")
    alloc("elig")                 # carried eligibility (saves a recompute)
    alloc("rs0"); alloc("rs1")    # transition ring: s_det (2 blocks)
    alloc("rt0"); alloc("rt1")    # t_peak
    alloc("ra0"); alloc("ra1")    # agc_after
    alloc("kv")                   # slot consume counts (lane-replicated)
    alloc("dc")                   # per-track bit count (lane-replicated)
    alloc("lp"); alloc("pv")      # last / previous consumed peak time
    alloc("bw0"); alloc("bw1")    # rolling bit window (2 blocks)
    alloc("bits0")                # running bit column 0 (for -correct)
    alloc("tfirst"); alloc("tlast")
    alloc("trksum")
    alloc("faked")
    alloc("vmarg")                # previous row's volts (feature margin)
    alloc("firstk")               # first-transition track one-hot column
    alloc("col0v")                # the segment's first sample per track
    alloc("clkring", 1)           # clock ring, lane vector [1, 128]
    alloc("misc", 1)              # cross-pl.when scalar staging [1, 128]
    return off, n


# ---------------------------------------------------------------------------
# in-kernel window features (replaces trackscan.precompute_window_features)
# ---------------------------------------------------------------------------

def _row_features(vprev, vcur, vnext0_row, W: int, *, first_row,
                  seg_end_col, col0_row, lane, lanef):
    """Features for the 128 positions of vcur given the previous row.

    All arrays are [16, 128] blocks (Mosaic's layout pass rejects wider
    vectors and strided extracts); the logical 256-wide (prev row, cur
    row) concatenation is carried as BLOCK PAIRS, with cross-block shifts
    done as two rolls + a lane select. Prev-half lanes below the
    cumulative shift hold roll-wrap garbage, which is provably never read:
    a cur-half output at lane i only pulls cat positions >= i+128-(W-1)
    >= 129-W >= 1 for W <= 128.

    vnext0_row: [16, 128] lane-replicated first sample of the NEXT row
    (the nextmax/nextmin neighbor of an extremum at the current sample).
    first_row: traced bool -- at the segment's first row the prev half
    acts as fills (-inf/+inf values, 0.0 neighbors), reproducing the
    partial filling window of stage1.window_minmax / precompute's shifts.
    seg_end_col: [16, 128] bool, position == S-1 (vnext fill 0.0 there).
    col0_row: [16, 128] lane-replicated segment-first sample (v_left
    clamp while the window is filling)."""
    def pair_shift(prev, cur, d):
        rp = pltpu.roll(prev, d, 1)
        rc = pltpu.roll(cur, d, 1)
        return rp, jnp.where(lane < d, rp, rc)

    def pick(a, b):
        return jnp.where(first_row, a, b)

    # base arrays: (prev, cur) pairs for value / index / both neighbors
    vm1p, vm1c = pair_shift(vprev, vcur, 1)        # value at i-1
    lcur = pltpu.roll(vcur, 127, 1)                # value at i+1 (mod)
    lprev = pltpu.roll(vprev, 127, 1)
    cur0 = jnp.broadcast_to(
        jnp.sum(jnp.where(lane == 0, vcur, 0.0), axis=1, keepdims=True),
        (16, 128))
    vp1c = jnp.where(lane == 127, vnext0_row, lcur)
    vp1c = jnp.where(seg_end_col, 0.0, vp1c)
    vp1p = jnp.where(lane == 127, cur0, lprev)

    zf = jnp.zeros((16, 128), F32)
    posc = lanef                                    # row-local position
    posp = lanef - 128.0

    def chain(fillv, better):
        acc = [(pick(zf + fillv, vprev), vcur),
               (posp, posc),
               (pick(zf, vm1p), vm1c),
               (pick(zf, vp1p), vp1c)]

        def combine(acc, d):
            out = []
            shs = [pair_shift(p, c, d) for p, c in acc]
            take_p = better(shs[0][0], acc[0][0])
            take_c = better(shs[0][1], acc[0][1])
            for (p, c), (sp, sc) in zip(acc, shs):
                out.append((jnp.where(take_p, sp, p),
                            jnp.where(take_c, sc, c)))
            return out

        p = 1
        while 2 * p <= W:
            acc = combine(acc, p)
            p *= 2
        if p < W:
            acc = combine(acc, W - p)
        return [c for _, c in acc]

    wmax, k_top, prevmax, nextmax = chain(NEGF, lambda a, b: a >= b)
    wmin, k_bot, prevmin, nextmin = chain(POSF, lambda a, b: a <= b)

    left_pos = posc - float(W - 1)
    # v_left: the sample at the window's left edge; while the window is
    # filling (s < W-1, first row only) it clamps to the segment's first
    # sample (precompute_window_features' iota < W-1 patch)
    _, v_left = pair_shift(vprev, vcur, W - 1)
    filling = first_row & (posc < np.float32(W - 1))
    v_left = jnp.where(filling, col0_row, v_left)
    left_eff = jnp.where(filling, 0.0, left_pos)
    l_top = k_top - left_eff + 1.0
    l_bot = k_bot - left_eff + 1.0
    return dict(wmax=wmax, wmin=wmin, v_left=v_left, v_right=vcur,
                l_top=l_top, prevmax=prevmax, nextmax=nextmax,
                l_bot=l_bot, prevmin=prevmin, nextmin=nextmin)


def _rows_features_interleaved(rows, W: int, *, col0_row, lane, lanef):
    """_row_features for a whole grid step's RB rows at once, with the
    doubling-chain LEVEL loop outside the row loop.

    The math (and therefore the results, bit for bit) is identical to
    calling _row_features per row; only the op ORDER changes. That order
    is the point: each row's chain is a serial dependency chain whose
    per-op latency (~60-100 ns measured on v5e) cannot be hidden within
    the chain, but the RB rows' chains are mutually independent, and
    interleaving their ops in program order lets the VPU overlap them
    (measured: two interleaved chains run ~1.5x faster than the same ops
    as one serial chain). Features depend only on volts, never on
    admission state, so hoisting them off the serial admission path is
    free.

    rows: list of dicts with vprev, vcur, nxt0 (lane-replicated first
    sample of the next row), first_row (traced bool), seg_end (bool
    mask). Returns a list of feature dicts, one per row."""
    zf = jnp.zeros((16, 128), F32)
    posc = lanef
    posp = lanef - 128.0

    def pair_shift(prev, cur, d):
        rp = pltpu.roll(prev, d, 1)
        rc = pltpu.roll(cur, d, 1)
        return rp, jnp.where(lane < d, rp, rc)

    # per-row prologue (rows independent -> already interleavable)
    states = []
    for r in rows:
        first_row = r["first_row"]

        def pick(a, b, fr=first_row):
            return jnp.where(fr, a, b)

        vprev, vcur = r["vprev"], r["vcur"]
        vm1p, vm1c = pair_shift(vprev, vcur, 1)
        lcur = pltpu.roll(vcur, 127, 1)
        lprev = pltpu.roll(vprev, 127, 1)
        cur0 = jnp.broadcast_to(
            jnp.sum(jnp.where(lane == 0, vcur, 0.0), axis=1,
                    keepdims=True), (16, 128))
        vp1c = jnp.where(lane == 127, r["nxt0"], lcur)
        vp1c = jnp.where(r["seg_end"], 0.0, vp1c)
        vp1p = jnp.where(lane == 127, cur0, lprev)
        acc_max = [(pick(zf + NEGF, vprev), vcur), (posp, posc),
                   (pick(zf, vm1p), vm1c), (pick(zf, vp1p), vp1c)]
        acc_min = [(pick(zf + POSF, vprev), vcur), (posp, posc),
                   (pick(zf, vm1p), vm1c), (pick(zf, vp1p), vp1c)]
        states.append([acc_max, acc_min])

    def combine(acc, d, better):
        out = []
        shs = [pair_shift(p, c, d) for p, c in acc]
        take_p = better(shs[0][0], acc[0][0])
        take_c = better(shs[0][1], acc[0][1])
        for (p, c), (sp, sc) in zip(acc, shs):
            out.append((jnp.where(take_p, sp, p),
                        jnp.where(take_c, sc, c)))
        return out

    ds = []
    p = 1
    while 2 * p <= W:
        ds.append(p)
        p *= 2
    if p < W:
        ds.append(W - p)

    ge = lambda a, b: a >= b
    le = lambda a, b: a <= b
    for d in ds:                       # level outer, rows inner: ILP
        for st in states:
            st[0] = combine(st[0], d, ge)
            st[1] = combine(st[1], d, le)

    feats = []
    for r, st in zip(rows, states):
        wmax, k_top, prevmax, nextmax = [c for _, c in st[0]]
        wmin, k_bot, prevmin, nextmin = [c for _, c in st[1]]
        left_pos = posc - float(W - 1)
        _, v_left = pair_shift(r["vprev"], r["vcur"], W - 1)
        filling = r["first_row"] & (posc < np.float32(W - 1))
        v_left = jnp.where(filling, col0_row, v_left)
        left_eff = jnp.where(filling, 0.0, left_pos)
        feats.append(dict(wmax=wmax, wmin=wmin, v_left=v_left,
                          v_right=r["vcur"],
                          l_top=k_top - left_eff + 1.0, prevmax=prevmax,
                          nextmax=nextmax, l_bot=k_bot - left_eff + 1.0,
                          prevmin=prevmin, nextmin=nextmin))
    return feats


def _mod(x, m: float):
    return x - m * jnp.floor(x / m)


def _kernel(meta_ref, v_ref, vnxt_ref, bits_ref, hist_ref, scal_ref,
            st_ref, smem_ref, *, P, T, S, maxb, max_slots, MBP,
            Ws, rises, minps, aalphas, awindows,
            clk_windows, clk_alphas, pulse_adjs, midbits,
            spb, do_correct, agc_ring, no_slots=False, no_commit=False):
    n_rblks = pl.num_programs(1)
    rblk = pl.program_id(1)
    last_blk = rblk == n_rblks - 1
    p_id = pl.program_id(0) % P
    sub = jax.lax.broadcasted_iota(I32, (16, 128), 0)
    lane = jax.lax.broadcasted_iota(I32, (16, 128), 1)
    lane1 = jax.lax.broadcasted_iota(I32, (1, 128), 1)
    zf = jnp.zeros((16, 128), F32)
    zf1 = jnp.zeros((1, 128), F32)
    active = sub < T
    lanef = lane.astype(F32)
    OFF, _NR = _fused_layout(agc_ring)

    def srow(name):
        o = OFF[name]
        n = 1 if name in ("clkring", "misc") else 16
        return st_ref[o:o + n, :]

    def wrow(name, val):
        o = OFF[name]
        n = 1 if name in ("clkring", "misc") else 16
        st_ref[o:o + n, :] = val

    def st_read(k):
        return srow(f"adm_{k}" if isinstance(k, str) else None) \
            if isinstance(k, str) else srow(f"admring_{k}")

    def st_write(k, val):
        if isinstance(k, str):
            wrow(f"adm_{k}", val)
        else:
            wrow(f"admring_{k}", val)

    # ---- per-parmset compile-time knobs (scalar selects on p_id) ----
    def kf(vals):
        out = jnp.float32(vals[0])
        for p in range(1, P):
            out = jnp.where(p_id == p, jnp.float32(vals[p]), out)
        return out

    def kfv(vals):
        out = zf + jnp.float32(vals[0])
        for p in range(1, P):
            out = jnp.where(p_id == p, zf + jnp.float32(vals[p]), out)
        return out

    def kiv(vals):
        out = sub * 0 + jnp.int32(vals[0])
        for p in range(1, P):
            out = jnp.where(p_id == p, sub * 0 + jnp.int32(vals[p]), out)
        return out

    rise_k = kfv(rises)
    minp_k = kfv(minps)
    aal_k = kfv(aalphas)
    awin_k = kiv(awindows)
    clk_window = kf([float(x) for x in clk_windows])
    clk_alpha = kf(clk_alphas)
    pulse_adj = kf(pulse_adjs)
    midbit = kf(midbits)
    wset = sorted(set(Ws))
    G = len(wset)
    grp_k = kiv([wset.index(w) for w in Ws])        # this parmset's W group
    W_f = kf([float(w) for w in Ws])

    meta = meta_ref[0, :, :]                         # [16, 128], resident

    def meta_scalar(lane_idx):
        return jnp.sum(jnp.where((sub == 0) & (lane == lane_idx), meta, 0.0))

    def meta_col(lane_idx):
        c = jnp.sum(jnp.where(lane == lane_idx, meta, 0.0), axis=1,
                    keepdims=True)
        return jnp.broadcast_to(c, (16, 128))

    seg_len = meta_scalar(M_SEGLEN)
    lead_len = meta_scalar(M_LEAD)
    stat_lb = meta_scalar(M_STATLB)
    stat_bw = meta_scalar(M_STATBW)
    exp_par = meta_scalar(M_EXPPAR)
    rf_col = meta_col(M_RISEF)
    mf_col = meta_col(M_MINF)

    # ---- init at the segment's first grid step ----
    @pl.when(rblk == 0)
    def _():
        zeros16 = zf
        st_write("blind", zeros16 - 1.0)
        st_write("v_top", zeros16)
        st_write("v_bot", zeros16)
        st_write("n_adm", zeros16)
        st_write("agc", zeros16 + 1.0)
        st_write("vah", zeros16 + cm.PKWW_PEAKHEIGHT)
        st_write("vah_sum", zeros16)
        st_write("vah_cnt", zeros16)
        st_write("hndx", zeros16)
        st_write("max_agc", zeros16)
        st_write("min_agc", zeros16 + cm.FLT_MAX)
        st_write("v_lasttop", zeros16)
        st_write("v_lastbot", zeros16)
        st_write("peakcount", zeros16)
        st_write("overflow", zeros16)
        for k in range(agc_ring):
            st_write(k, zeros16)
        for nm in ("elig", "rs0", "rs1", "rt0", "rt1", "ra0", "ra1",
                   "kv", "dc", "bw0", "bw1", "bits0", "tfirst", "tlast",
                   "trksum", "faked", "vmarg", "firstk", "col0v"):
            wrow(nm, zf)
        wrow("lp", zf + NEG)
        wrow("pv", zf + NEG)
        wrow("clkring", zf1 + jnp.float32(spb))
        for sm, val in ((SM_TLC, 0.0), (SM_TLM, 0.0), (SM_POST, 0.0),
                        (SM_AVG, float(spb)), (SM_BITNDX, 0.0),
                        (SM_DONE, 0.0), (SM_OVF, 0.0), (SM_ENDED, 0.0),
                        (SM_ENDS, float(S)), (SM_NSLOT, 0.0),
                        (SM_STARTED, 0.0), (SM_MISSMID, 0.0),
                        (SM_CORR, 0.0), (SM_BAIL, 0.0), (SM_BITBASE, 0.0)):
            smem_ref[sm] = jnp.float32(val)
        for k in range(MBP // 128):
            bits_ref[0, :, k * 128:(k + 1) * 128] = zf
        hist_ref[0, :, :] = zf

    # ======================================================================
    # 1. admission for this step's RB rows
    # ======================================================================
    # worst-case admissions per 128-sample row: the blind window only
    # guarantees successive admission POSITIONS 2 apart (peak at the
    # window's left edge), so cover 64+2; the commit loop is
    # hierarchically guarded (work count is monotone within a row), so
    # dead iterations cost ~one branch per 8
    A_MAX = 66

    def elig_fn(feat, cand_full, posf):
        wmax, wmin, v_left, v_right = (feat["wmax"], feat["wmin"],
                                       feat["v_left"], feat["v_right"])
        no_min = minp_k == 0.0

        def elig(agc, vah, blind):
            scale = vah / cm.PKWW_PEAKHEIGHT
            rise = rise_k * scale / agc
            rmin = minp_k * scale / agc
            is_top = ((wmax > v_left + rise) & (wmax > v_right + rise) &
                      (no_min | (wmax > rmin)))
            is_bot = ((~is_top) & (wmin < v_left - rise) &
                      (wmin < v_right - rise) & (no_min | (wmin < -rmin)))
            return (is_top | is_bot) & cand_full & (posf > blind), is_top
        return elig

    def row_admission(feat, cand_full, posf):
        (wmax, wmin, l_top, prevmax, nextmax, l_bot, prevmin, nextmin) = (
            feat["wmax"], feat["wmin"], feat["l_top"], feat["prevmax"],
            feat["nextmax"], feat["l_bot"], feat["prevmin"], feat["nextmin"])
        elig = elig_fn(feat, cand_full, posf)
        use_exp = aal_k > 0.0
        use_win = awin_k > 0

        def e_pack(e, is_top_row):
            # 0 = not eligible, 1 = eligible bottom, 2 = eligible top:
            # the commit reuses the topness instead of re-running the
            # threshold test (2 divides) per iteration
            return jnp.where(e, jnp.where(is_top_row, 2.0, 1.0), 0.0)

        e0, t0 = elig(st_read("agc"), st_read("vah"), st_read("blind"))
        wrow("elig", e_pack(e0, t0))
        smem_ref[SM_AWORK] = jnp.sum(jnp.where(e0, 1.0, 0.0))

        def slot_body(j, carry):
            @pl.when(smem_ref[SM_AWORK] > 0.0)
            def _():
                agc = st_read("agc")
                vah = st_read("vah")
                erow = srow("elig")
                e = erow > 0.5
                top_row = erow > 1.5

                li = jnp.min(jnp.where(e, lane, 9999), axis=1,
                             keepdims=True)
                li = jnp.broadcast_to(li, lane.shape)
                adm = (li < 9999) & active
                sel = (lane == li) & adm

                def ext(x):
                    v = jnp.sum(jnp.where(sel, x, 0.0), axis=1,
                                keepdims=True)
                    return jnp.broadcast_to(v, lane.shape)

                # refine_peak in ROW space (per-position, data-parallel),
                # then one extraction per scalar actually carried
                L_row = jnp.where(top_row, l_top, l_bot)
                val_row = jnp.where(top_row, wmax, wmin)
                prev_row = jnp.where(top_row, prevmax, prevmin)
                nxt_row = jnp.where(top_row, nextmax, nextmin)
                thr = cm.PEAK_THRESHOLD / agc
                ref = jnp.where(top_row, val_row - thr, val_row + thr)
                # boolean algebra, not where-of-bools (Mosaic-on-v5e
                # rejects i1 selects)
                p_close = ((top_row & (prev_row > ref)) |
                           (~top_row & (prev_row < ref)))
                n_close = ((top_row & (nxt_row > ref)) |
                           (~top_row & (nxt_row < ref)))
                adj = jnp.where(p_close & ~n_close, F32(-0.5),
                                jnp.where(n_close & ~p_close, F32(0.5),
                                          F32(0.0)))
                t_row = posf - ((W_f - L_row) - adj)

                is_top = ext(jnp.where(top_row, F32(1.0), F32(0.0))) > 0.5
                is_top = is_top & adm
                is_bot = adm & (~is_top)
                L = ext(L_row)
                val = ext(val_row)
                s_f = ext(posf)
                t_peak = ext(t_row)

                n_adm = st_read("n_adm")
                v_top2 = jnp.where(is_top, val, st_read("v_top"))
                v_bot2 = jnp.where(is_bot, val, st_read("v_bot"))
                first = adm & (n_adm == 0.0)
                max_agc2 = jnp.where(first, agc, st_read("max_agc"))

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
                ring_rows = [st_read(k) for k in range(agc_ring)]
                ring2 = [jnp.where(in_base & (hndx == k), height,
                                   ring_rows[k]) for k in range(agc_ring)]

                vah_fin = st_read("vah_sum") / jnp.maximum(vah_cnt, 1.0)
                vah2 = jnp.where(do_fin, vah_fin, vah)
                vah_cnt2 = jnp.where(do_fin, F32(0.0), vah_cnt2)

                lastheight = st_read("v_lasttop") - st_read("v_lastbot")
                hgt_ok = lastheight > 0.0
                g_exp = vah2 / jnp.maximum(lastheight, 1e-9)
                g_exp = jnp.minimum(aal_k * g_exp + (1 - aal_k) * agc,
                                    cm.AGC_MAX_VALUE)
                ring3 = [jnp.where(do_agc & use_win & hgt_ok & (hndx == k),
                                   lastheight, ring2[k])
                         for k in range(agc_ring)]
                minh = zf + cm.FLT_MAX
                for k in range(agc_ring):
                    minh = jnp.minimum(
                        minh, jnp.where(k < awin_k, ring3[k], cm.FLT_MAX))
                g_win = jnp.minimum(vah2 / jnp.maximum(minh, 1e-9),
                                    cm.AGC_MAX_VALUE)
                agc2 = jnp.where(do_agc & use_exp & hgt_ok, g_exp, agc)
                agc2 = jnp.where(do_agc & use_win & hgt_ok, g_win, agc2)
                hndx2 = jnp.where(do_agc & use_win & hgt_ok, hndx_acc,
                                  hndx2)
                changed = do_agc & (use_exp | use_win) & hgt_ok
                max_agc2 = jnp.where(changed & (agc2 > max_agc2), agc2,
                                     max_agc2)
                min_agc2 = jnp.where(changed & (agc2 < st_read("min_agc")),
                                     agc2, st_read("min_agc"))

                # ---- transition-ring append (s_f, t_peak, agc2) ----
                ridx = _mod(n_adm, float(RING))
                rcol = _mod(ridx, 128.0)
                in_b0 = ridx < 128.0
                m0 = adm & in_b0 & (lanef == rcol)
                m1 = adm & (~in_b0) & (lanef == rcol)
                wrow("rs0", jnp.where(m0, s_f, srow("rs0")))
                wrow("rs1", jnp.where(m1, s_f, srow("rs1")))
                wrow("rt0", jnp.where(m0, t_peak, srow("rt0")))
                wrow("rt1", jnp.where(m1, t_peak, srow("rt1")))
                if do_correct:
                    wrow("ra0", jnp.where(m0, agc2, srow("ra0")))
                    wrow("ra1", jnp.where(m1, agc2, srow("ra1")))
                # ring-overwrite bail: an unconsumed entry would be lost
                not_done = smem_ref[SM_DONE] < 0.5
                pressure = jnp.max(jnp.where(
                    adm, n_adm - srow("kv"), -1.0)) >= float(RING)
                smem_ref[SM_BAIL] = jnp.where(
                    not_done & pressure, 1.0, smem_ref[SM_BAIL])

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
                for k in range(agc_ring):
                    st_write(k, ring3[k])

                e2, t2 = elig(agc2, vah2, blind2)
                wrow("elig", e_pack(e2, t2))
                smem_ref[SM_AWORK] = jnp.sum(jnp.where(e2, 1.0, 0.0))
            return carry

        def commit_block(o, carry):
            @pl.when(smem_ref[SM_AWORK] > 0.0)
            def _():
                jax.lax.fori_loop(0, 8, slot_body, 0)
            return carry

        if not no_commit:         # debug: features+eligibility-only timing
            jax.lax.fori_loop(0, -(-A_MAX // 8), commit_block, 0)
        # eligibility left after A_MAX commits: admission overflow (the
        # XLA path's `incomplete`; consumers only use any())
        st_write("overflow", jnp.where(smem_ref[SM_AWORK] > 0.0,
                                       zf + 1.0, st_read("overflow")))

    # ---- sweep this step's RB rows: features -> admission ----
    def col0_bcast(blk):
        return jnp.broadcast_to(
            jnp.sum(jnp.where(lane == 0, blk, 0.0), axis=1, keepdims=True),
            (16, 128))

    # phase 1: per-row inputs (and the first-row col0 capture)
    row_inputs = []
    for rr in range(RB):
        vcur = v_ref[0, :, rr * 128:(rr + 1) * 128]
        if rr == 0:
            vprev = srow("vmarg")
        else:
            vprev = v_ref[0, :, (rr - 1) * 128:rr * 128]
        nxt_blk = (v_ref[0, :, (rr + 1) * 128:(rr + 2) * 128]
                   if rr < RB - 1 else vnxt_ref[0, :, :])
        base = rblk * (RB * 128) + rr * 128
        first_row = (rblk == 0) & (rr == 0)

        @pl.when(first_row)
        def _(vcur=vcur):
            wrow("col0v", col0_bcast(vcur))

        posf = lanef + base.astype(F32)
        row_inputs.append(dict(vprev=vprev, vcur=vcur,
                               nxt0=col0_bcast(nxt_blk),
                               first_row=first_row,
                               seg_end=posf == np.float32(S - 1),
                               posf=posf))

    # phase 2: features for ALL rows, chain levels interleaved across
    # rows so the VPU overlaps the RB independent dependency chains
    # (features never depend on admission state)
    col0 = srow("col0v")
    featsW = [_rows_features_interleaved(row_inputs, Wd, col0_row=col0,
                                         lane=lane, lanef=lanef)
              for Wd in wset]

    # phase 3: the serial part -- candidacy + admission commits per row
    for rr in range(RB):
        if G == 1:
            feat = featsW[0][rr]
        else:
            feat = {k: featsW[0][rr][k] for k in featsW[0][rr]}
            for g in range(1, G):
                feat = {k: jnp.where(grp_k == g, featsW[g][rr][k],
                                     feat[k]) for k in feat}

        vcur = row_inputs[rr]["vcur"]
        posf = row_inputs[rr]["posf"]
        # loose candidacy (stage1.candidate_mask) + segment span mask
        wmax, wmin, v_left = feat["wmax"], feat["wmin"], feat["v_left"]
        no_mf = mf_col <= 0.0
        topc = ((wmax > v_left + rf_col) & (wmax > vcur + rf_col) &
                (no_mf | (wmax > mf_col)))
        botc = ((wmin < v_left - rf_col) & (wmin < vcur - rf_col) &
                (no_mf | (wmin < -mf_col)))
        cand_full = ((topc | botc) & active &
                     (posf >= lead_len) & (posf < seg_len))
        row_admission(feat, cand_full, posf)
    wrow("vmarg", row_inputs[RB - 1]["vcur"])

    # ======================================================================
    # 2. slot machine: start once the first transition exists, then run
    #    every slot whose consume boundary lies inside the swept samples
    # ======================================================================
    cnt_col = st_read("n_adm")                       # live per-track counts

    @pl.when((smem_ref[SM_STARTED] < 0.5) &
             (jnp.sum(jnp.where(active & (lane == 0), cnt_col, 0.0)) > 0.0))
    def _():
        # earliest first transition, low track wins (ring entry 0 is each
        # track's first admission; later row blocks only append later s)
        rs0 = srow("rs0")
        rt0 = srow("rt0")
        key = jnp.where(active & (lane == 0) & (cnt_col > 0.0),
                        rs0 * 16.0 + sub.astype(F32), BIG_S * 16.0)
        kmin = jnp.min(key)
        t_first = jnp.sum(jnp.where(key == kmin, rt0, 0.0))
        t_lc0 = t_first - spb
        wrow("firstk", jnp.broadcast_to(
            jnp.sum(jnp.where(key == kmin, 1.0, 0.0), axis=1,
                    keepdims=True), (16, 128)))
        smem_ref[SM_TLC] = t_lc0
        smem_ref[SM_TLM] = t_lc0 + midbit * spb
        smem_ref[SM_STARTED] = 1.0

    boundary = jnp.where(last_blk, jnp.float32(2 ** 30),
                         ((rblk + 1) * (RB * 128)).astype(F32))
    SLMAX = int(RB * 128 / spb * 1.5) + 8

    def consume(s_z_f, t_lc_in, b_in, post0):
        """One consume round for all tracks (ring edition of the v3
        kernel's consume): candidates are ring entries kv..kv+3 with
        s_det < s_z. Returns per-track columns + realigned clock."""
        rs0, rs1 = srow("rs0"), srow("rs1")
        rt0, rt1 = srow("rt0"), srow("rt1")
        kv = srow("kv")
        kvm = _mod(kv, float(RING))
        relA = _mod(lanef - kvm, float(RING))              # block 0 ranks
        relB = _mod(lanef + 128.0 - kvm, float(RING))      # block 1 ranks
        c0 = (active & (relA < 4.0) & (kv + relA < cnt_col) & (rs0 < s_z_f))
        c1 = (active & (relB < 4.0) & (kv + relB < cnt_col) & (rs1 < s_z_f))

        def rsum(m, v):
            return jnp.sum(jnp.where(m, v, 0.0), axis=1, keepdims=True)

        one = zf + 1.0
        n_seen = rsum(c0, one) + rsum(c1, one)             # [16, 1]
        ovf = jnp.sum(jnp.where(c0 & (relA == 3.0), 1.0, 0.0) +
                      jnp.where(c1 & (relB == 3.0), 1.0, 0.0)) > 0.0
        tj = [rsum(c0 & (relA == j), rt0) + rsum(c1 & (relB == j), rt1)
              for j in (0.0, 1.0, 2.0, 3.0)]
        nb = jnp.broadcast_to(n_seen, (16, 128))
        tjb = [jnp.broadcast_to(t, (16, 128)) for t in tj]
        newest = jnp.where(nb >= 4.0, tjb[3],
                  jnp.where(nb == 3.0, tjb[2],
                   jnp.where(nb == 2.0, tjb[1], tjb[0])))
        second = jnp.where(nb >= 4.0, tjb[2],
                  jnp.where(nb == 3.0, tjb[1], tjb[0]))
        w0 = c0 & (relA < 3.0)
        w1 = c1 & (relB < 3.0)
        t_max = jnp.max(jnp.maximum(jnp.where(w0, rt0, NEG),
                                    jnp.where(w1, rt1, NEG)))
        tj = tj[:3]
        wrow("kv", kv + jnp.broadcast_to(n_seen, (16, 128)))
        realign = ((post0 > 0.0) & (t_max > NEG / 2) &
                   (t_lc_in < t_max - (2.0 - midbit) * b_in))
        t_lc_out = jnp.where(realign, t_max - 2.0 * b_in, t_lc_in)
        return dict(n=jnp.broadcast_to(n_seen, (16, 128)), tj=tj,
                    newest=newest, second=second, ovf=ovf, t_lc=t_lc_out)

    def lp_pv_update(r):
        lp = srow("lp")
        pv = srow("pv")
        had = r["n"] >= 1.0
        nb = jnp.broadcast_to
        pv = jnp.where(r["n"] >= 2.0, nb(r["second"], (16, 128)),
                       jnp.where(had, lp, pv))
        lp = jnp.where(had, nb(r["newest"], (16, 128)), lp)
        wrow("lp", lp)
        wrow("pv", pv)

    def bits_write(idx_col, val, mask):
        """bits[track, idx] = val where mask; idx_col a [16, 128]
        lane-replicated f32 column, window-relative handling inside."""
        base = smem_ref[SM_BITBASE]
        rel = idx_col - base
        m0 = mask & (rel >= 0.0) & (rel < 128.0) & (lanef == rel)
        m1 = mask & (rel >= 128.0) & (rel < 256.0) & (lanef == rel - 128.0)
        wrow("bw0", jnp.where(m0, val, srow("bw0")))
        wrow("bw1", jnp.where(m1, val, srow("bw1")))
        if do_correct:
            z = mask & (idx_col == 0.0)
            wrow("bits0", jnp.where(z, val, srow("bits0")))

    def consume_writes(r, kv_rs, t_lc_used):
        """Bit-buffer writes + stats for one consume round (j < 3).
        All three ranks' 1-writes, histogram adds, trksum/midbit counts
        merge into ONE buffer update each (the values are identical and
        the adds commute, so the fused form is bit-equal to the XLA
        scan's sequential j-loop; tfirst can only trigger at rank 0
        since dc >= 0, and tlast is the last written rank)."""
        dc = srow("dc")
        n = r["n"]
        base = smem_ref[SM_BITBASE]
        post0 = smem_ref[SM_POST]
        t_lm0 = smem_ref[SM_TLM]
        or0 = zf > 1.0
        or1 = zf > 1.0
        hadd = zf
        trk_cnt = zf
        miss_cnt = zf
        firstk_col = srow("firstk") > 0.5
        for j in range(3):
            tjb = jnp.broadcast_to(r["tj"][j], (16, 128))
            has = (n > float(j)) & active
            rel = jnp.minimum(dc + float(j), float(maxb - 1)) - base
            or0 = or0 | (has & (rel >= 0.0) & (rel < 128.0) &
                         (lanef == rel))
            or1 = or1 | (has & (rel >= 128.0) & (rel < 256.0) &
                         (lanef == rel - 128.0))
            skip = firstk_col & (kv_rs + float(j) == 0.0)
            stat_ok = has & (post0 == 0.0) & jnp.logical_not(skip)
            val = tjb - t_lc_used
            bkt = ((val - stat_lb) / stat_bw).astype(I32)
            code = jnp.where(bkt < 0, 0, jnp.where(bkt > 49, 49, bkt))
            hadd = hadd + jnp.where(stat_ok & (lane == code), 1.0, 0.0)
            trk_cnt = trk_cnt + jnp.where(
                stat_ok & (bkt >= 0) & (bkt <= 49) & (lane == 0), 1.0,
                0.0)
            miss_cnt = miss_cnt + jnp.where(
                has & (tjb < t_lm0) & (post0 == 0.0) & (lane == 0), 1.0,
                0.0)
        wrow("bw0", jnp.where(or0, 1.0, srow("bw0")))
        wrow("bw1", jnp.where(or1, 1.0, srow("bw1")))
        if do_correct:
            z = (n > 0.0) & active & (dc == 0.0)
            wrow("bits0", jnp.where(z, 1.0, srow("bits0")))
        hist_ref[0, :, :] = hist_ref[0, :, :] + hadd
        wrow("trksum", srow("trksum") + trk_cnt)
        smem_ref[SM_MISSMID] = smem_ref[SM_MISSMID] + jnp.sum(miss_cnt)
        tj0 = jnp.broadcast_to(r["tj"][0], (16, 128))
        was_first = (n > 0.0) & active & (dc == 0.0)
        wrow("tfirst", jnp.where(was_first, tj0, srow("tfirst")))
        m = jnp.minimum(n, 3.0)
        tlast_new = jnp.where(
            m == 1.0, tj0,
            jnp.where(m == 2.0, jnp.broadcast_to(r["tj"][1], (16, 128)),
                      jnp.broadcast_to(r["tj"][2], (16, 128))))
        wrow("tlast", jnp.where((n > 0.0) & active, tlast_new,
                                srow("tlast")))
        wrow("dc", jnp.minimum(dc + n, float(maxb)))

    def slot_iteration(it, carry):
        started = smem_ref[SM_STARTED] > 0.5
        not_done = smem_ref[SM_DONE] < 0.5
        t_lc0 = smem_ref[SM_TLC]
        b0 = smem_ref[SM_AVG]
        s_z0 = jnp.floor(t_lc0 + 2.0 * b0) + 1.0
        can_run = (started & not_done & (s_z0 <= boundary) &
                   (smem_ref[SM_NSLOT] < float(max_slots)))

        @pl.when(can_run)
        def _():
            post0 = smem_ref[SM_POST]
            t_lm0 = smem_ref[SM_TLM]
            kv_before1 = srow("kv")
            r1 = consume(jnp.minimum(s_z0, jnp.float32(S)), t_lc0, b0,
                         post0)
            lp_pv_update(r1)
            consume_writes(r1, kv_before1, t_lc0)

            s_z1 = jnp.floor(r1["t_lc"] + 2.0 * b0) + 1.0
            need2 = (s_z1 > s_z0) | r1["ovf"]

            @pl.when(need2)
            def _():
                kv_before2 = srow("kv")
                r2 = consume(jnp.minimum(s_z1, jnp.float32(S)),
                             r1["t_lc"], b0, post0)
                lp_pv_update(r2)
                consume_writes(r2, kv_before2, r1["t_lc"])
                wrow("misc", jnp.where(
                    lane1 == 0, r2["t_lc"],
                    jnp.where(lane1 == 1,
                              jnp.where(r2["ovf"], 1.0, 0.0), zf1)))

            @pl.when(jnp.logical_not(need2))
            def _():
                wrow("misc", jnp.where(lane1 == 0, r1["t_lc"], zf1))

            misc = srow("misc")
            t_lc2 = jnp.sum(jnp.where(lane1 == 0, misc, 0.0))
            ovf2 = jnp.sum(jnp.where(lane1 == 1, misc, 0.0)) > 0.5
            lp = srow("lp")
            pv = srow("pv")
            past_end = s_z1 >= jnp.float32(S)

            # ---- zerocheck (decode_nrzi.c:232-314) ----
            right = t_lc2 + (1.0 + midbit) * b0
            last_in = active & (lp > t_lm0) & (lp < right)
            prev_in = active & (pv > t_lm0) & (pv < right)
            dup = last_in & prev_in
            b2f = (~last_in) & prev_in
            later = active & (~last_in) & (~prev_in) & (lp > right)
            zero = active & (~last_in) & (~prev_in) & (~later)

            col0 = lane == 0
            numbits = jnp.sum(jnp.where(col0 & (last_in | b2f), 1.0, 0.0))
            numlater = jnp.sum(jnp.where(col0 & later, 1.0, 0.0))
            avg_pos = jnp.sum(jnp.where(
                col0, jnp.where(last_in, lp,
                                jnp.where(b2f, pv, 0.0)), 0.0))
            have = numbits > 0.0

            # ---- bit-buffer updates (dup delete / later insert / zero) ----
            dc0 = srow("dc")
            dc1 = jnp.where(dup, dc0 - 1.0, dc0)
            i0 = jnp.maximum(dc1 - 1.0, 0.0)
            bits_write(i0, 0.0, later)
            i1 = jnp.minimum(dc1, float(maxb - 1))
            bits_write(i1, 1.0, later)
            dc2 = jnp.where(later, jnp.minimum(dc1 + 1.0, float(maxb)), dc1)
            i2 = jnp.minimum(dc2, float(maxb - 1))
            bits_write(i2, 0.0, zero)
            dc3 = jnp.where(zero, jnp.minimum(dc2 + 1.0, float(maxb)), dc2)
            wrow("dc", dc3)

            tz = t_lc2 + b0
            zlike = later | zero
            wrow("tfirst", jnp.where(
                zlike & (dc0 == 0.0) & (dc3 > dc0), tz, srow("tfirst")))
            wrow("tlast", jnp.where(later, lp,
                                    jnp.where(zero, tz, srow("tlast"))))

            # ---- clock update / post counter (nrzi_zerocheck tail) ----
            post_h = jnp.where(post0 == 1.0, 0.0, post0)
            avg = avg_pos / jnp.maximum(numbits, 1.0)
            expected = t_lc2 + b0
            adjusted = jnp.where(post_h > 0.0, avg,
                                 expected + pulse_adj * (avg - expected))
            delta = adjusted - t_lc2

            bitndx = smem_ref[SM_BITNDX]
            ndx_i = bitndx.astype(I32)
            ring_row = srow("clkring")
            old = jnp.sum(jnp.where(lane1 == ndx_i, ring_row, 0.0))
            avg_w = b0 + (delta - old) / jnp.maximum(clk_window, 1.0)
            avg_e = clk_alpha * delta + (1.0 - clk_alpha) * b0
            use_w = clk_window > 0.0
            use_e = (~use_w) & (clk_alpha > 0.0)
            avg_new = jnp.where(use_w, avg_w,
                                jnp.where(use_e, avg_e, jnp.float32(spb)))
            do_clk = have & (post_h == 0.0)

            @pl.when(do_clk & use_w)
            def _():
                wrow("clkring", jnp.where(lane1 == ndx_i, delta,
                                          srow("clkring")))
                smem_ref[SM_BITNDX] = jnp.where(
                    bitndx + 1.0 >= clk_window, 0.0, bitndx + 1.0)

            smem_ref[SM_AVG] = jnp.where(do_clk, avg_new, b0)
            post_h2 = jnp.where(post_h > 0.0, post_h + 1.0, post_h)
            post_n = jnp.where((numlater == 0.0) & (post0 == 0.0), 1.0,
                               jnp.where(post0 > 0.0, post0 + 1.0, post0))
            post2 = jnp.where(have, post_h2, post_n)
            t_lc3 = jnp.where(have, adjusted, t_lc2 + b0)
            smem_ref[SM_TLC] = t_lc3
            smem_ref[SM_TLM] = right
            smem_ref[SM_POST] = post2

            # ---- -correct: release-binary AGC-keyed flip of column 0 ----
            if do_correct:
                bits0 = srow("bits0")
                par = _mod(jnp.sum(jnp.where(active & col0, bits0, 0.0)),
                           2.0)
                par_bad = par != exp_par
                kvn = srow("kv")
                am = _mod(kvn - 1.0, float(RING))
                a0 = jnp.sum(jnp.where((lanef == am) & (am < 128.0),
                                       srow("ra0"), 0.0),
                             axis=1, keepdims=True)
                a1 = jnp.sum(jnp.where((lanef == am - 128.0) &
                                       (am >= 128.0), srow("ra1"), 0.0),
                             axis=1, keepdims=True)
                agc_now = jnp.broadcast_to(
                    jnp.where(jnp.sum(jnp.where(col0, kvn, 0.0), axis=1,
                                      keepdims=True) >= 1.0, a0 + a1, 1.0),
                    (16, 128))
                agc_now = jnp.where(active, agc_now, -1.0)
                hi = jnp.max(jnp.where(col0, agc_now, -1.0))
                is_hi = active & (agc_now == hi)
                badtrk = jnp.min(jnp.where(is_hi & col0, sub, 99))
                next_hi = jnp.max(jnp.where(col0 & active & (sub != badtrk),
                                            agc_now, -1.0))
                do_fix = (have & par_bad &
                          (hi >= cm.NRZI_BADTRK_FACTOR * next_hi))
                fixm = do_fix & (sub == badtrk)
                newv = jnp.where(bits0 > 0.5, 0.0, 1.0)
                wrow("bits0", jnp.where(fixm, newv, bits0))
                wrow("faked", jnp.where(fixm, 1.0, srow("faked")))
                smem_ref[SM_CORR] = smem_ref[SM_CORR] + \
                    jnp.where(do_fix, 1.0, 0.0)

            ended = post2 >= 8.0
            smem_ref[SM_ENDS] = jnp.where(
                ended & (smem_ref[SM_ENDED] < 0.5),
                jnp.minimum(s_z1, jnp.float32(S)), smem_ref[SM_ENDS])
            smem_ref[SM_ENDED] = jnp.where(ended, 1.0,
                                           smem_ref[SM_ENDED])
            smem_ref[SM_OVF] = jnp.where(r1["ovf"] | ovf2, 1.0,
                                         smem_ref[SM_OVF])
            smem_ref[SM_DONE] = jnp.where(ended | past_end, 1.0, 0.0)
            smem_ref[SM_NSLOT] = smem_ref[SM_NSLOT] + 1.0

            # ---- rolling bit-window flush (max dc crossed 224) ----
            mx = jnp.max(jnp.where(active & col0, srow("dc"), 0.0))
            bb = smem_ref[SM_BITBASE]

            @pl.when((mx - bb >= 224.0) & (bb + 128.0 < float(MBP)))
            def _():
                bi = (bb / 128.0).astype(I32)
                bits_ref[0, :, pl.ds(bi * 128, 128)] = srow("bw0")
                wrow("bw0", srow("bw1"))
                wrow("bw1", zf)
                smem_ref[SM_BITBASE] = bb + 128.0
        return carry

    def slot_block(nouter, inner):
        """Hierarchically guarded slot loop: the can_run condition is
        monotone non-increasing within a grid step (s_z and nslot only
        grow, done is sticky), so a whole inner block can be skipped on
        one check -- dead tail iterations cost ~one branch per `inner`
        slots instead of one each."""
        def outer(o, carry):
            t_lc0 = smem_ref[SM_TLC]
            b0 = smem_ref[SM_AVG]
            s_z0 = jnp.floor(t_lc0 + 2.0 * b0) + 1.0
            alive = ((smem_ref[SM_STARTED] > 0.5) &
                     (smem_ref[SM_DONE] < 0.5) & (s_z0 <= boundary) &
                     (smem_ref[SM_NSLOT] < float(max_slots)))

            @pl.when(alive)
            def _():
                jax.lax.fori_loop(0, inner, slot_iteration, 0)
            return carry

        jax.lax.fori_loop(0, nouter, outer, 0)

    if not no_slots:              # debug: admission-only timing
        slot_block(-(-SLMAX // 8), 8)

    # tail: after the last row block the boundary is gone -- run the slot
    # machine to completion (postamble end / past-segment / slot cap)
    @pl.when(last_blk & (not no_slots))
    def _():
        slot_block(-(-max_slots // 16), 16)

    # ======================================================================
    # 3. finalization at the segment's last grid step
    # ======================================================================
    @pl.when(last_blk)
    def _():
        # flush the bit window remnants
        bb = smem_ref[SM_BITBASE]
        bi = (bb / 128.0).astype(I32)

        @pl.when(bb < float(MBP))
        def _():
            bits_ref[0, :, pl.ds(bi * 128, 128)] = srow("bw0")

        @pl.when(bb + 128.0 < float(MBP))
        def _():
            bits_ref[0, :, pl.ds(bi * 128 + 128, 128)] = srow("bw1")
        if do_correct:
            # bits0 is lane-replicated: paste its value into column 0
            bits_ref[0, :, 0:128] = jnp.where(
                lane == 0, srow("bits0"), bits_ref[0, :, 0:128])

        vals = zf
        for ln, col in (
                (L_NADM, st_read("n_adm")),
                (L_MAXAGC, st_read("max_agc")),
                (L_MINAGC, st_read("min_agc")),
                (L_INCOMP, st_read("overflow")),
                (L_KVIS, srow("kv")),
                (L_DC, srow("dc")),
                (L_TFIRST, srow("tfirst")),
                (L_TLAST, srow("tlast")),
                (L_TRKSUM, jnp.broadcast_to(
                    jnp.sum(jnp.where(lane == 0, srow("trksum"), 0.0),
                            axis=1, keepdims=True), (16, 128))),
                (L_FAKED, srow("faked"))):
            vals = jnp.where(lane == ln, col, vals)
        for ln, sm in ((L_ENDED, SM_ENDED), (L_CONSOVF, SM_OVF),
                       (L_ENDS, SM_ENDS), (L_MISSMID, SM_MISSMID),
                       (L_NSLOT, SM_NSLOT), (L_CORR, SM_CORR),
                       (L_BAIL, SM_BAIL)):
            vals = jnp.where(lane == ln, smem_ref[sm], vals)
        scal_ref[0, :, :] = vals


@functools.partial(jax.jit, static_argnames=(
    "S", "T", "P", "maxb", "max_slots", "Ws", "rises", "minps", "aalphas",
    "awindows", "clk_windows", "clk_alphas", "pulse_adjs", "midbits",
    "spb", "do_correct", "agc_ring", "interpret", "no_slots", "no_commit"))
def nrzi_fused_scan(volts, meta, *, S: int, T: int, P: int, maxb: int,
                    max_slots: int, Ws, rises, minps, aalphas, awindows,
                    clk_windows, clk_alphas, pulse_adjs, midbits,
                    spb: float, do_correct: bool, agc_ring: int,
                    interpret: bool = None, no_slots: bool = False,
                    no_commit: bool = False):
    """volts: [B, 16, S] f32 (padded tracks zero); meta: [B, 16, 128] f32
    (lanes M_*). Returns (bits [B, P, 16, MBP], hist [B, P, 16, 128],
    scal [B, P, 16, 128]) -- everything nrzi_finish needs, no
    reconstruction pass."""
    if interpret is None:
        # production gating keeps this kernel off CPU; tests that force it
        # on (READTAPE_PALLAS=1) get interpret mode there automatically
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    B = volts.shape[0]
    assert volts.shape[1] == 16 and volts.shape[2] == S
    assert S % (RB * 128) == 0 and T <= 16
    n_rblks = S // (RB * 128)
    R = S // 128
    MBP = -(-maxb // 128) * 128

    kern = functools.partial(
        _kernel, P=P, T=T, S=S, maxb=maxb, max_slots=max_slots, MBP=MBP,
        Ws=Ws, rises=rises, minps=minps, aalphas=aalphas,
        awindows=awindows, clk_windows=clk_windows, clk_alphas=clk_alphas,
        pulse_adjs=pulse_adjs, midbits=midbits, spb=spb,
        do_correct=do_correct, agc_ring=agc_ring, no_slots=no_slots,
        no_commit=no_commit)
    _, n_rows = _fused_layout(agc_ring)

    bits, hist, scal = pl.pallas_call(
        kern,
        grid=(B * P, n_rblks),
        in_specs=[
            pl.BlockSpec((1, 16, 128), lambda i, r, P=P: (i // P, 0, 0)),
            pl.BlockSpec((1, 16, RB * 128),
                         lambda i, r, P=P: (i // P, 0, r)),
            pl.BlockSpec((1, 16, 128),
                         lambda i, r, P=P, R=R:
                         (i // P, 0, jnp.minimum(r * RB + RB, R - 1))),
        ],
        out_specs=[
            pl.BlockSpec((1, 16, MBP), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i, r: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * P, 16, MBP), jnp.float32),
            jax.ShapeDtypeStruct((B * P, 16, 128), jnp.float32),
            jax.ShapeDtypeStruct((B * P, 16, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_rows, 128), jnp.float32),
            pltpu.SMEM((N_SM,), jnp.float32),
        ],
        interpret=interpret,
    )(meta, volts, volts)
    return (bits.reshape(B, P, 16, MBP), hist.reshape(B, P, 16, 128),
            scal.reshape(B, P, 16, 128))


def fused_state(bits, hist, scal, *, T: int, maxb: int):
    """Convert one (segment, parmset) lane's kernel outputs into the state
    dict nrzi_finish expects (the contract slot_stream_reconstruct used to
    produce). bits: [16, MBP]; hist/scal: [16, 128]."""
    trk = jnp.arange(T)
    col = lambda ln: scal[:T, ln]
    faked_bits = (col(L_FAKED) > 0.5).astype(I32) << (T - 1 - trk)
    return dict(
        dc=col(L_DC).astype(I32),
        kvis=col(L_KVIS).astype(I32),
        bits=bits[:T, :maxb].astype(jnp.int8),
        t_firstbit=col(L_TFIRST),
        t_lastbit=col(L_TLAST),
        missed_midbits=scal[0, L_MISSMID].astype(I32),
        corrected_bits=scal[0, L_CORR].astype(I32),
        faked_tracks=jnp.sum(faked_bits),
        hist=hist[:T, :50].astype(I32),
        trksums=col(L_TRKSUM).astype(I32),
        consume_overflow=scal[0, L_CONSOVF] > 0.5,
        end_s=scal[0, L_ENDS].astype(I32),
        n_admitted=col(L_NADM).astype(I32),
        max_agc_gain=col(L_MAXAGC),
        min_agc_gain=col(L_MINAGC),
        incomplete=col(L_INCOMP) > 0.5,
        bail=scal[0, L_BAIL] > 0.5,
    )


# ---------------------------------------------------------------------------
# PE: per-track self-clocked machine (decode_pe.c) in the same fused
# skeleton -- features + admission + bit emission, no global slot scan.
# ---------------------------------------------------------------------------

M_CLKFAC = 7                  # extra meta lane: clk_factor rides per parmset
                              # via compile-time knobs instead; lane unused

# scal output lanes (PE)
(PL_DC, PL_TFIRST, PL_TLAST, PL_CORR, PL_MAXAGC, PL_MINAGC, PL_TRKSUM,
 PL_INCOMP, PL_NRUNS, PL_DATABLK, PL_BAIL, PL_PEAKCNT) = range(12)

# SMEM slots (PE)
PSM_AWORK, PSM_BITBASE, PSM_BAIL = range(3)
PN_SM = 3


def _pe_layout(agc_ring: int, clk_ring: int):
    off = {}
    n = 0

    def alloc(name, rows=16):
        nonlocal n
        off[name] = n
        n += rows

    for f in ("blind", "v_top", "v_bot", "peakcount", "agc", "vah",
              "vah_sum", "vah_cnt", "hndx", "max_agc", "min_agc",
              "v_lasttop", "v_lastbot", "overflow"):
        alloc(f"adm_{f}")
    for k in range(agc_ring):
        alloc(f"admring_{k}")
    for nm in ("elig", "idle", "datablock", "clknext", "bit1up",
               "tclkw", "tpadj", "tlastbit", "tfirstbit", "tlastpeak",
               "dc", "lastbit", "corr", "clkavg", "clkndx", "clkring",
               "bw0", "bw1", "nruns", "rstart", "rlen", "rbit",
               "trksum", "vmarg", "col0v"):
        alloc(nm)
    alloc("misc", 1)
    return off, n


def _pe_kernel(meta_ref, v_ref, vnxt_ref, bits_ref, hist_ref, scal_ref,
               runs_ref, st_ref, smem_ref, *, P, T, S, maxb, MBP,
               Ws, rises, minps, aalphas, awindows, clk_windows,
               clk_alphas, clk_factors, pulse_adjs,
               spb, agc_ring, clk_ring):
    n_rblks = pl.num_programs(1)
    rblk = pl.program_id(1)
    last_blk = rblk == n_rblks - 1
    p_id = pl.program_id(0) % P
    sub = jax.lax.broadcasted_iota(I32, (16, 128), 0)
    lane = jax.lax.broadcasted_iota(I32, (16, 128), 1)
    zf = jnp.zeros((16, 128), F32)
    active = sub < T
    lanef = lane.astype(F32)
    OFF, _NR = _pe_layout(agc_ring, clk_ring)

    def srow(name):
        o = OFF[name]
        nrow = 1 if name == "misc" else 16
        return st_ref[o:o + nrow, :]

    def wrow(name, val):
        o = OFF[name]
        nrow = 1 if name == "misc" else 16
        st_ref[o:o + nrow, :] = val

    def st_read(k):
        return srow(f"adm_{k}") if isinstance(k, str) else srow(f"admring_{k}")

    def st_write(k, val):
        if isinstance(k, str):
            wrow(f"adm_{k}", val)
        else:
            wrow(f"admring_{k}", val)

    def kfv(vals):
        out = zf + jnp.float32(vals[0])
        for p in range(1, P):
            out = jnp.where(p_id == p, zf + jnp.float32(vals[p]), out)
        return out

    def kiv(vals):
        out = sub * 0 + jnp.int32(vals[0])
        for p in range(1, P):
            out = jnp.where(p_id == p, sub * 0 + jnp.int32(vals[p]), out)
        return out

    rise_k = kfv(rises)
    minp_k = kfv(minps)
    aal_k = kfv(aalphas)
    awin_k = kiv(awindows)
    clkw_k = kfv([float(x) for x in clk_windows])
    clka_k = kfv(clk_alphas)
    clkf_k = kfv(clk_factors)
    padj_k = kfv(pulse_adjs)
    wset = sorted(set(Ws))
    G = len(wset)
    grp_k = kiv([wset.index(w) for w in Ws])
    W_f = kfv([float(w) for w in Ws])

    meta = meta_ref[0, :, :]

    def meta_scalar(lane_idx):
        return jnp.sum(jnp.where((sub == 0) & (lane == lane_idx), meta, 0.0))

    def meta_col(lane_idx):
        c = jnp.sum(jnp.where(lane == lane_idx, meta, 0.0), axis=1,
                    keepdims=True)
        return jnp.broadcast_to(c, (16, 128))

    seg_len = meta_scalar(M_SEGLEN)
    lead_len = meta_scalar(M_LEAD)
    stat_lb = meta_scalar(M_STATLB)
    stat_bw = meta_scalar(M_STATBW)
    rf_col = meta_col(M_RISEF)
    mf_col = meta_col(M_MINF)

    @pl.when(rblk == 0)
    def _():
        st_write("blind", zf - 1.0)
        st_write("v_top", zf)
        st_write("v_bot", zf)
        st_write("peakcount", zf)
        st_write("agc", zf + 1.0)
        st_write("vah", zf + cm.PKWW_PEAKHEIGHT)
        st_write("vah_sum", zf)
        st_write("vah_cnt", zf)
        st_write("hndx", zf)
        st_write("max_agc", zf)
        st_write("min_agc", zf + cm.FLT_MAX)
        st_write("v_lasttop", zf)
        st_write("v_lastbot", zf)
        st_write("overflow", zf)
        for k in range(agc_ring):
            st_write(k, zf)
        for nm in ("elig", "datablock", "clknext", "tpadj", "tlastbit",
                   "tfirstbit", "tlastpeak", "dc", "lastbit", "corr",
                   "clkndx", "bw0", "bw1", "nruns", "rstart", "rlen",
                   "rbit", "trksum", "vmarg", "col0v"):
            wrow(nm, zf)
        wrow("idle", zf + 1.0)
        wrow("bit1up", zf + 1.0)
        wrow("tclkw", zf + jnp.float32(spb) / 2.0 * clkf_k)
        wrow("clkavg", zf + jnp.float32(spb))
        wrow("clkring", zf + jnp.float32(spb))
        for sm, val in ((PSM_AWORK, 0.0), (PSM_BITBASE, 0.0),
                        (PSM_BAIL, 0.0)):
            smem_ref[sm] = jnp.float32(val)
        for k in range(MBP // 128):
            bits_ref[0, :, k * 128:(k + 1) * 128] = zf
        hist_ref[0, :, :] = zf

    A_MAX = 66        # worst-case per-row admissions (see NRZI kernel)

    def bits_write(idx_col, val, mask):
        base = smem_ref[PSM_BITBASE]
        rel = idx_col - base
        oob = mask & ((rel < 0.0) | (rel >= 256.0))
        smem_ref[PSM_BAIL] = jnp.where(jnp.sum(jnp.where(oob, 1.0, 0.0))
                                       > 0.0, 1.0, smem_ref[PSM_BAIL])
        m0 = mask & (rel >= 0.0) & (rel < 128.0) & (lanef == rel)
        m1 = mask & (rel >= 128.0) & (rel < 256.0) & (lanef == rel - 128.0)
        wrow("bw0", jnp.where(m0, val, srow("bw0")))
        wrow("bw1", jnp.where(m1, val, srow("bw1")))

    def elig_fn(feat, cand_full, posf):
        wmax, wmin, v_left, v_right = (feat["wmax"], feat["wmin"],
                                       feat["v_left"], feat["v_right"])
        no_min = minp_k == 0.0

        def elig(agc, vah, blind):
            scale = vah / cm.PKWW_PEAKHEIGHT
            rise = rise_k * scale / agc
            rmin = minp_k * scale / agc
            is_top = ((wmax > v_left + rise) & (wmax > v_right + rise) &
                      (no_min | (wmax > rmin)))
            is_bot = ((~is_top) & (wmin < v_left - rise) &
                      (wmin < v_right - rise) & (no_min | (wmin < -rmin)))
            return (is_top | is_bot) & cand_full & (posf > blind), is_top
        return elig

    def row_admission(feat, cand_full, posf):
        (wmax, wmin, l_top, prevmax, nextmax, l_bot, prevmin, nextmin) = (
            feat["wmax"], feat["wmin"], feat["l_top"], feat["prevmax"],
            feat["nextmax"], feat["l_bot"], feat["prevmin"], feat["nextmin"])
        elig = elig_fn(feat, cand_full, posf)

        e0, _ = elig(st_read("agc"), st_read("vah"), st_read("blind"))
        wrow("elig", jnp.where(e0, 1.0, 0.0))
        smem_ref[PSM_AWORK] = jnp.sum(e0.astype(F32))

        def commit(j, carry):
            @pl.when(smem_ref[PSM_AWORK] > 0.0)
            def _():
                agc = st_read("agc")
                vah = st_read("vah")
                e = srow("elig") > 0.5

                li = jnp.min(jnp.where(e, lane, 9999), axis=1,
                             keepdims=True)
                li = jnp.broadcast_to(li, lane.shape)
                adm = (li < 9999) & active
                sel = (lane == li) & adm

                def ext(x):
                    v = jnp.sum(jnp.where(sel, x, 0.0), axis=1,
                                keepdims=True)
                    return jnp.broadcast_to(v, lane.shape)

                scale = vah / cm.PKWW_PEAKHEIGHT
                rise = rise_k * scale / agc
                rmin = minp_k * scale / agc
                no_min = minp_k == 0.0
                top_row = ((wmax > feat["v_left"] + rise) &
                           (wmax > feat["v_right"] + rise) &
                           (no_min | (wmax > rmin)))
                is_top = ext(jnp.where(top_row, F32(1.0), F32(0.0))) > 0.5
                is_top = is_top & adm
                is_bot = adm & (~is_top)
                L = ext(jnp.where(top_row, l_top, l_bot))
                val = ext(jnp.where(top_row, wmax, wmin))
                prev = ext(jnp.where(top_row, prevmax, prevmin))
                nxt = ext(jnp.where(top_row, nextmax, nextmin))
                s_f = ext(posf)

                thr = cm.PEAK_THRESHOLD / agc
                ref = jnp.where(is_top, val - thr, val + thr)
                p_close = (is_top & (prev > ref)) | (is_bot & (prev < ref))
                n_close = (is_top & (nxt > ref)) | (is_bot & (nxt < ref))
                adj = jnp.where(p_close & ~n_close, F32(-0.5),
                                jnp.where(n_close & ~p_close, F32(0.5),
                                          F32(0.0)))
                t_this = s_f - ((W_f - L) - adj)

                # ---- pe_track_scan extra() as column ops ----
                v_top2 = jnp.where(is_top, val, st_read("v_top"))
                v_bot2 = jnp.where(is_bot, val, st_read("v_bot"))
                b = srow("clkavg")
                pc = st_read("peakcount") + jnp.where(adm, 1.0, 0.0)

                was_idle = (srow("idle") > 0.5) | (
                    (s_f - 1.0 - srow("tlastpeak")) >
                    b * cm.PE_IDLE_FACTOR)
                dblk = srow("datablock") > 0.5
                dc0 = srow("dc")
                gen_fakes = adm & was_idle & dblk & (dc0 > 1.0)
                numfake = jnp.floor((s_f - srow("tlastbit")) /
                                    jnp.maximum(b, 1e-3))
                numfake = jnp.where(gen_fakes, jnp.maximum(numfake, 0.0),
                                    0.0)
                run_valid = gen_fakes & (numfake > 0.0)
                dc = jnp.minimum(dc0 + numfake, float(maxb))
                t_lastbit = jnp.where(run_valid, 0.0, srow("tlastbit"))
                lastbit = srow("lastbit")
                clknext_f = jnp.where(gen_fakes,
                                      jnp.where(lastbit > 0.5, 1.0, 0.0),
                                      srow("clknext"))
                wrow("idle", jnp.where(adm, 0.0, srow("idle")))

                # record the fake run (cap RUN_CAP=128 like the XLA path;
                # overflow overwrites the last slot)
                nr = srow("nruns")
                ncl = jnp.minimum(nr, 127.0)
                rm = run_valid & (lanef == ncl)
                wrow("rstart", jnp.where(rm, dc0, srow("rstart")))
                wrow("rlen", jnp.where(rm, numfake, srow("rlen")))
                wrow("rbit", jnp.where(rm, lastbit, srow("rbit")))
                wrow("nruns", nr + jnp.where(run_valid, 1.0, 0.0))

                # ---- preamble ----
                in_pre = adm & (~dblk)
                first_peak = in_pre & (pc == 1.0)
                bit1_up = jnp.where(first_peak,
                                    jnp.where(is_top, 0.0, 1.0),
                                    srow("bit1up"))
                b1u = bit1_up > 0.5
                start_data = (in_pre & (pc > cm.PE_MIN_PREBITS) &
                              (b1u == is_top) &
                              ((t_this - srow("tlastpeak")) >
                               srow("tclkw")))
                clknext_pre = jnp.where(is_top != b1u, 1.0, 0.0)
                vah_cnt = st_read("vah_cnt")
                acc_ok = (in_pre & (~start_data) &
                          (pc >= cm.AGC_STARTBASE) &
                          (pc <= cm.AGC_ENDBASE) & (v_top2 > v_bot2))
                height = v_top2 - v_bot2
                hndx = st_read("hndx")
                hndx_acc = jnp.where(hndx + 1.0 >= awin_k.astype(F32),
                                     F32(0.0), hndx + 1.0)
                vah_sum2 = jnp.where(acc_ok, st_read("vah_sum") + height,
                                     st_read("vah_sum"))
                vah_cnt2 = jnp.where(acc_ok, vah_cnt + 1.0, vah_cnt)
                ring_rows = [st_read(k) for k in range(agc_ring)]
                ring2 = [jnp.where(acc_ok & (hndx == k), height,
                                   ring_rows[k]) for k in range(agc_ring)]
                hndx2 = jnp.where(acc_ok, hndx_acc, hndx)
                datablock2 = jnp.where(start_data, 1.0,
                                       srow("datablock"))
                vah2 = jnp.where(
                    start_data,
                    st_read("vah_sum") / jnp.maximum(vah_cnt, 1.0), vah)

                # ---- data classification ----
                in_data = adm & dblk
                stat_val = t_this - srow("tlastpeak")
                stat_bkt = ((stat_val - stat_lb) / stat_bw).astype(I32)
                code = jnp.where(stat_bkt < 0, 0,
                                 jnp.where(stat_bkt > 49, 49, stat_bkt))
                stat_ok = in_data
                hist_ref[0, :, :] = hist_ref[0, :, :] + jnp.where(
                    stat_ok & (lane == code), 1.0, 0.0)
                wrow("trksum", srow("trksum") + jnp.where(
                    stat_ok & (stat_bkt >= 0) & (stat_bkt <= 49) &
                    (lane == 0), 1.0, 0.0))

                missed = ((t_this + srow("tpadj")) - srow("tlastpeak")
                          ) > srow("tclkw")
                is_data = in_data & ((srow("clknext") < 0.5) | missed)
                bitval = jnp.where(is_top, bit1_up, 1.0 - bit1_up)

                t_lb_seed = jnp.where(t_lastbit == 0.0,
                                      t_this - jnp.float32(spb), t_lastbit)
                delta = t_this - t_lb_seed
                # adjust_clock (window / exp / const)
                ndx = srow("clkndx")
                ring = srow("clkring")
                old = jnp.sum(jnp.where(lanef == ndx, ring, 0.0), axis=1,
                              keepdims=True)
                old = jnp.broadcast_to(old, (16, 128))
                use_w = clkw_k > 0.0
                use_e = (~use_w) & (clka_k > 0.0)
                avg_w = b + (delta - old) / jnp.maximum(clkw_k, 1.0)
                avg_e = clka_k * delta + (1.0 - clka_k) * b
                avg_new = jnp.where(use_w, avg_w,
                                    jnp.where(use_e, avg_e,
                                              jnp.float32(spb)))
                upd = is_data
                wrow("clkring", jnp.where(
                    upd & use_w & (lanef == ndx), delta, ring))
                ndx2 = jnp.where(ndx + 1.0 >= clkw_k, 0.0, ndx + 1.0)
                wrow("clkndx", jnp.where(upd & use_w, ndx2, ndx))
                clkavg2 = jnp.where(upd, avg_new, b)
                wrow("clkavg", clkavg2)
                wrow("tclkw", jnp.where(
                    is_data, clkavg2 / 2.0 * clkf_k, srow("tclkw")))

                widx = jnp.minimum(dc, float(maxb - 1))
                bits_write(widx, bitval, is_data)
                wrow("tfirstbit", jnp.where(is_data & (dc == 0.0), t_this,
                                            srow("tfirstbit")))
                dc2 = jnp.where(is_data,
                                jnp.minimum(dc + 1.0, float(maxb)), dc)
                wrow("dc", dc2)
                t_lastbit = jnp.where(is_data, t_this, t_lastbit)
                wrow("tlastbit", t_lastbit)
                wrow("lastbit", jnp.where(is_data, bitval,
                                          srow("lastbit")))
                wrow("clknext", jnp.where(
                    in_data, jnp.where(is_data, 1.0, 0.0),
                    jnp.where(in_pre & (~start_data), clknext_pre,
                              clknext_f)))
                wrow("tpadj", jnp.where(
                    in_data,
                    ((t_this - srow("tlastpeak")) -
                     clkavg2 / jnp.where(missed, 1.0, 2.0)) * padj_k,
                    srow("tpadj")))
                wrow("corr", srow("corr") +
                     jnp.where(run_valid, numfake, 0.0))

                # ---- AGC (adjust_agc on every data-block peak) ----
                lastheight = st_read("v_lasttop") - st_read("v_lastbot")
                hgt_ok = lastheight > 0.0
                use_exp = aal_k > 0.0
                use_win = awin_k > 0
                g_exp = vah2 / jnp.maximum(lastheight, 1e-9)
                g_exp = jnp.minimum(aal_k * g_exp + (1 - aal_k) * agc,
                                    cm.AGC_MAX_VALUE)
                ring3 = [jnp.where(in_data & use_win & hgt_ok &
                                   (hndx2 == k), lastheight, ring2[k])
                         for k in range(agc_ring)]
                minh = zf + cm.FLT_MAX
                for k in range(agc_ring):
                    minh = jnp.minimum(
                        minh, jnp.where(k < awin_k, ring3[k], cm.FLT_MAX))
                g_win = jnp.minimum(vah2 / jnp.maximum(minh, 1e-9),
                                    cm.AGC_MAX_VALUE)
                agc2 = jnp.where(in_data & use_exp & hgt_ok, g_exp, agc)
                agc2 = jnp.where(in_data & use_win & hgt_ok, g_win, agc2)
                hndx3 = jnp.where(in_data & use_win & hgt_ok, hndx_acc,
                                  hndx2)
                changed = in_data & (use_exp | use_win) & hgt_ok
                max_agc2 = jnp.where(changed & (agc2 > st_read("max_agc")),
                                     agc2, st_read("max_agc"))
                min_agc2 = jnp.where(changed & (agc2 < st_read("min_agc")),
                                     agc2, st_read("min_agc"))

                blind2 = jnp.where(adm, s_f + L, st_read("blind"))
                st_write("blind", blind2)
                st_write("v_top", v_top2)
                st_write("v_bot", v_bot2)
                st_write("peakcount", pc)
                st_write("agc", agc2)
                st_write("vah", vah2)
                st_write("vah_sum", vah_sum2)
                st_write("vah_cnt", vah_cnt2)
                st_write("hndx", hndx3)
                st_write("max_agc", max_agc2)
                st_write("min_agc", min_agc2)
                st_write("v_lasttop", jnp.where(is_top, val,
                                                st_read("v_lasttop")))
                st_write("v_lastbot", jnp.where(is_bot, val,
                                                st_read("v_lastbot")))
                for k in range(agc_ring):
                    st_write(k, ring3[k])
                wrow("datablock", datablock2)
                wrow("bit1up", bit1_up)
                wrow("tlastpeak", jnp.where(adm, t_this,
                                            srow("tlastpeak")))
                st_write("vah", vah2)

                # flush the rolling bit window on pressure or a run jump
                mx = jnp.max(jnp.where(active & (lane == 0), dc2, 0.0))
                bb = smem_ref[PSM_BITBASE]

                @pl.when((mx - bb >= 224.0) & (bb + 128.0 < float(MBP)))
                def _():
                    bi = (bb / 128.0).astype(I32)
                    bits_ref[0, :, pl.ds(bi * 128, 128)] = srow("bw0")
                    wrow("bw0", srow("bw1"))
                    wrow("bw1", zf)
                    smem_ref[PSM_BITBASE] = bb + 128.0

                # run jump beyond the window: flush both blocks and skip
                # base forward (skipped positions are run-filled in XLA).
                # Tracks that never entered a datablock write no bits, so
                # they don't hold the window back (a dead track otherwise
                # pins dc=0 forever and every live write would bail).
                bb2 = smem_ref[PSM_BITBASE]
                mn = jnp.min(jnp.where(
                    active & (lane == 0) & (srow("datablock") > 0.5),
                    dc2, 1e9))

                @pl.when((mn - bb2 >= 256.0) & (mn < 1e8))
                def _():
                    bi = (bb2 / 128.0).astype(I32)

                    @pl.when(bb2 + 128.0 <= float(MBP))
                    def _():
                        bits_ref[0, :, pl.ds(bi * 128, 128)] = srow("bw0")

                    @pl.when(bb2 + 256.0 <= float(MBP))
                    def _():
                        bits_ref[0, :, pl.ds(bi * 128 + 128, 128)] = \
                            srow("bw1")
                    wrow("bw0", zf)
                    wrow("bw1", zf)
                    nb = jnp.minimum(jnp.floor(mn / 128.0) * 128.0,
                                     float(MBP - 128))
                    smem_ref[PSM_BITBASE] = nb

                e2, _ = elig(agc2, vah2, blind2)
                wrow("elig", jnp.where(e2, 1.0, 0.0))
                smem_ref[PSM_AWORK] = jnp.sum(e2.astype(F32))
            return carry

        def commit_block(o, carry):
            @pl.when(smem_ref[PSM_AWORK] > 0.0)
            def _():
                jax.lax.fori_loop(0, 8, commit, 0)
            return carry

        jax.lax.fori_loop(0, -(-A_MAX // 8), commit_block, 0)
        st_write("overflow", jnp.where(smem_ref[PSM_AWORK] > 0.0,
                                       zf + 1.0, st_read("overflow")))

    # ---- sweep rows ----
    def col0_bcast(blk):
        return jnp.broadcast_to(
            jnp.sum(jnp.where(lane == 0, blk, 0.0), axis=1, keepdims=True),
            (16, 128))

    for rr in range(RB):
        vcur = v_ref[0, :, rr * 128:(rr + 1) * 128]
        if rr == 0:
            vprev = srow("vmarg")
        else:
            vprev = v_ref[0, :, (rr - 1) * 128:rr * 128]
        nxt_blk = (v_ref[0, :, (rr + 1) * 128:(rr + 2) * 128]
                   if rr < RB - 1 else vnxt_ref[0, :, :])
        nxt0_row = col0_bcast(nxt_blk)
        base = rblk * (RB * 128) + rr * 128
        first_row = (rblk == 0) & (rr == 0)

        @pl.when(first_row)
        def _(vcur=vcur):
            wrow("col0v", col0_bcast(vcur))

        posf = lanef + base.astype(F32)
        seg_end_col = posf == np.float32(S - 1)

        feats = []
        for Wd in wset:
            feats.append(_row_features(
                vprev, vcur, nxt0_row, Wd, first_row=first_row,
                seg_end_col=seg_end_col, col0_row=srow("col0v"),
                lane=lane, lanef=lanef))
        if G == 1:
            feat = feats[0]
        else:
            feat = {k: feats[0][k] for k in feats[0]}
            for g in range(1, G):
                feat = {k: jnp.where(grp_k == g, feats[g][k], feat[k])
                        for k in feat}

        wmax, wmin, v_left = feat["wmax"], feat["wmin"], feat["v_left"]
        no_mf = mf_col <= 0.0
        topc = ((wmax > v_left + rf_col) & (wmax > vcur + rf_col) &
                (no_mf | (wmax > mf_col)))
        botc = ((wmin < v_left - rf_col) & (wmin < vcur - rf_col) &
                (no_mf | (wmin < -mf_col)))
        cand_full = ((topc | botc) & active &
                     (posf >= lead_len) & (posf < seg_len))
        row_admission(feat, cand_full, posf)
        if rr == RB - 1:
            wrow("vmarg", vcur)

    # ---- finalization ----
    @pl.when(last_blk)
    def _():
        bb = smem_ref[PSM_BITBASE]
        bi = (bb / 128.0).astype(I32)

        @pl.when(bb < float(MBP))
        def _():
            bits_ref[0, :, pl.ds(bi * 128, 128)] = srow("bw0")

        @pl.when(bb + 128.0 < float(MBP))
        def _():
            bits_ref[0, :, pl.ds(bi * 128 + 128, 128)] = srow("bw1")

        vals = zf
        for ln, col in (
                (PL_DC, srow("dc")),
                (PL_TFIRST, srow("tfirstbit")),
                (PL_TLAST, srow("tlastbit")),
                (PL_CORR, srow("corr")),
                (PL_MAXAGC, st_read("max_agc")),
                (PL_MINAGC, st_read("min_agc")),
                (PL_TRKSUM, jnp.broadcast_to(
                    jnp.sum(jnp.where(lane == 0, srow("trksum"), 0.0),
                            axis=1, keepdims=True), (16, 128))),
                (PL_INCOMP, st_read("overflow")),
                (PL_NRUNS, srow("nruns")),
                (PL_DATABLK, srow("datablock")),
                (PL_PEAKCNT, st_read("peakcount"))):
            vals = jnp.where(lane == ln, col, vals)
        vals = jnp.where(lane == PL_BAIL, zf + smem_ref[PSM_BAIL], vals)
        scal_ref[0, :, :] = vals
        runs_ref[0, 0, :, :] = srow("rstart")
        runs_ref[0, 1, :, :] = srow("rlen")
        runs_ref[0, 2, :, :] = srow("rbit")


@functools.partial(jax.jit, static_argnames=(
    "S", "T", "P", "maxb", "Ws", "rises", "minps", "aalphas",
    "awindows", "clk_windows", "clk_alphas", "clk_factors", "pulse_adjs",
    "spb", "agc_ring", "clk_ring", "interpret"))
def pe_fused_scan(volts, meta, *, S: int, T: int, P: int, maxb: int,
                  Ws, rises, minps, aalphas, awindows, clk_windows,
                  clk_alphas, clk_factors, pulse_adjs, spb: float,
                  agc_ring: int, clk_ring: int, interpret: bool = None):
    """PE per-track fused scan. Returns (bits [B,P,16,MBP],
    hist [B,P,16,128], scal [B,P,16,128], runs [B,P,3,16,128])."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    B = volts.shape[0]
    assert volts.shape[1] == 16 and volts.shape[2] == S
    assert S % (RB * 128) == 0 and T <= 16
    n_rblks = S // (RB * 128)
    R = S // 128
    MBP = -(-maxb // 128) * 128

    kern = functools.partial(
        _pe_kernel, P=P, T=T, S=S, maxb=maxb, MBP=MBP, Ws=Ws, rises=rises,
        minps=minps, aalphas=aalphas, awindows=awindows,
        clk_windows=clk_windows, clk_alphas=clk_alphas,
        clk_factors=clk_factors, pulse_adjs=pulse_adjs, spb=spb,
        agc_ring=agc_ring, clk_ring=clk_ring)
    _, n_rows = _pe_layout(agc_ring, clk_ring)

    bits, hist, scal, runs = pl.pallas_call(
        kern,
        grid=(B * P, n_rblks),
        in_specs=[
            pl.BlockSpec((1, 16, 128), lambda i, r, P=P: (i // P, 0, 0)),
            pl.BlockSpec((1, 16, RB * 128),
                         lambda i, r, P=P: (i // P, 0, r)),
            pl.BlockSpec((1, 16, 128),
                         lambda i, r, P=P, R=R:
                         (i // P, 0, jnp.minimum(r * RB + RB, R - 1))),
        ],
        out_specs=[
            pl.BlockSpec((1, 16, MBP), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, 3, 16, 128), lambda i, r: (i, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * P, 16, MBP), jnp.float32),
            jax.ShapeDtypeStruct((B * P, 16, 128), jnp.float32),
            jax.ShapeDtypeStruct((B * P, 16, 128), jnp.float32),
            jax.ShapeDtypeStruct((B * P, 3, 16, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_rows, 128), jnp.float32),
            pltpu.SMEM((PN_SM,), jnp.float32),
        ],
        interpret=interpret,
    )(meta, volts, volts)
    return (bits.reshape(B, P, 16, MBP), hist.reshape(B, P, 16, 128),
            scal.reshape(B, P, 16, 128), runs.reshape(B, P, 3, 16, 128))


# ---------------------------------------------------------------------------
# GCR: per-track NRZI-AGC + zero-inference bit recovery (decode_gcr.c)
# ---------------------------------------------------------------------------

# scal output lanes (GCR)
(GL_DC, GL_TFIRST, GL_TLAST, GL_MAXAGC, GL_MINAGC, GL_TRKSUM, GL_INCOMP,
 GL_PEAKCNT, GL_BAIL) = range(9)

GSM_AWORK, GSM_BITBASE, GSM_BAIL = range(3)
GN_SM = 3


def _gcr_layout(agc_ring: int):
    off = {}
    n = 0

    def alloc(name):
        nonlocal n
        off[name] = n
        n += 1 if name == "misc" else 16

    for f in ("blind", "v_top", "v_bot", "n_adm", "agc", "vah", "vah_sum",
              "vah_cnt", "hndx", "max_agc", "min_agc", "v_lasttop",
              "v_lastbot", "peakcount", "overflow"):
        alloc(f"adm_{f}")
    for k in range(agc_ring):
        alloc(f"admring_{k}")
    for nm in ("elig", "dc", "lastbits", "rsc", "clkavg", "clkndx",
               "clkring", "tpadj", "tpkdelta", "tpkdeltaprev",
               "datablock", "tfirstbit", "tlastbit", "tlastpeak",
               "bw0", "bw1", "trksum", "vmarg", "col0v", "misc"):
        alloc(nm)
    return off, n


def _gcr_kernel(meta_ref, v_ref, vnxt_ref, bits_ref, hist_ref, scal_ref,
                st_ref, smem_ref, *, P, T, S, maxb, MBP,
                Ws, rises, minps, aalphas, awindows, clk_windows,
                clk_alphas, z1pts, z2pts, pulse_adjs, spb, agc_ring,
                mark1: int, mark2: int):
    n_rblks = pl.num_programs(1)
    rblk = pl.program_id(1)
    last_blk = rblk == n_rblks - 1
    p_id = pl.program_id(0) % P
    sub = jax.lax.broadcasted_iota(I32, (16, 128), 0)
    lane = jax.lax.broadcasted_iota(I32, (16, 128), 1)
    zf = jnp.zeros((16, 128), F32)
    active = sub < T
    lanef = lane.astype(F32)
    OFF, _NR = _gcr_layout(agc_ring)

    def srow(name):
        o = OFF[name]
        nrow = 1 if name == "misc" else 16
        return st_ref[o:o + nrow, :]

    def wrow(name, val):
        o = OFF[name]
        nrow = 1 if name == "misc" else 16
        st_ref[o:o + nrow, :] = val

    def st_read(k):
        return srow(f"adm_{k}") if isinstance(k, str) else srow(f"admring_{k}")

    def st_write(k, val):
        if isinstance(k, str):
            wrow(f"adm_{k}", val)
        else:
            wrow(f"admring_{k}", val)

    def kfv(vals):
        out = zf + jnp.float32(vals[0])
        for p in range(1, P):
            out = jnp.where(p_id == p, zf + jnp.float32(vals[p]), out)
        return out

    def kiv(vals):
        out = sub * 0 + jnp.int32(vals[0])
        for p in range(1, P):
            out = jnp.where(p_id == p, sub * 0 + jnp.int32(vals[p]), out)
        return out

    rise_k = kfv(rises)
    minp_k = kfv(minps)
    aal_k = kfv(aalphas)
    awin_k = kiv(awindows)
    clkw_k = kfv([float(x) for x in clk_windows])
    clka_k = kfv(clk_alphas)
    z1_k = kfv(z1pts)
    z2_k = kfv(z2pts)
    padj_k = kfv(pulse_adjs)
    wset = sorted(set(Ws))
    G = len(wset)
    grp_k = kiv([wset.index(w) for w in Ws])
    W_f = kfv([float(w) for w in Ws])

    meta = meta_ref[0, :, :]

    def meta_scalar(lane_idx):
        return jnp.sum(jnp.where((sub == 0) & (lane == lane_idx), meta, 0.0))

    def meta_col(lane_idx):
        c = jnp.sum(jnp.where(lane == lane_idx, meta, 0.0), axis=1,
                    keepdims=True)
        return jnp.broadcast_to(c, (16, 128))

    seg_len = meta_scalar(M_SEGLEN)
    lead_len = meta_scalar(M_LEAD)
    stat_lb = meta_scalar(M_STATLB)
    stat_bw = meta_scalar(M_STATBW)
    rf_col = meta_col(M_RISEF)
    mf_col = meta_col(M_MINF)

    @pl.when(rblk == 0)
    def _():
        st_write("blind", zf - 1.0)
        st_write("agc", zf + 1.0)
        st_write("vah", zf + cm.PKWW_PEAKHEIGHT)
        st_write("min_agc", zf + cm.FLT_MAX)
        for f in ("v_top", "v_bot", "n_adm", "vah_sum", "vah_cnt", "hndx",
                  "max_agc", "v_lasttop", "v_lastbot", "peakcount",
                  "overflow"):
            st_write(f, zf)
        for k in range(agc_ring):
            st_write(k, zf)
        for nm in ("elig", "dc", "lastbits", "rsc", "clkndx", "tpadj",
                   "tpkdelta", "tpkdeltaprev", "datablock", "tfirstbit",
                   "tlastbit", "tlastpeak", "bw0", "bw1", "trksum",
                   "vmarg", "col0v"):
            wrow(nm, zf)
        wrow("clkavg", zf + jnp.float32(spb))
        wrow("clkring", zf + jnp.float32(spb))
        for sm in (GSM_AWORK, GSM_BITBASE, GSM_BAIL):
            smem_ref[sm] = jnp.float32(0.0)
        for k in range(MBP // 128):
            bits_ref[0, :, k * 128:(k + 1) * 128] = zf
        hist_ref[0, :, :] = zf

    A_MAX = 66

    def bits_write(idx_col, val, mask):
        base = smem_ref[GSM_BITBASE]
        rel = idx_col - base
        oob = mask & ((rel < 0.0) | (rel >= 256.0))
        smem_ref[GSM_BAIL] = jnp.where(
            jnp.sum(jnp.where(oob, 1.0, 0.0)) > 0.0, 1.0,
            smem_ref[GSM_BAIL])
        m0 = mask & (rel >= 0.0) & (rel < 128.0) & (lanef == rel)
        m1 = mask & (rel >= 128.0) & (rel < 256.0) & (lanef == rel - 128.0)
        wrow("bw0", jnp.where(m0, val, srow("bw0")))
        wrow("bw1", jnp.where(m1, val, srow("bw1")))

    def elig_fn(feat, cand_full, posf):
        wmax, wmin, v_left, v_right = (feat["wmax"], feat["wmin"],
                                       feat["v_left"], feat["v_right"])
        no_min = minp_k == 0.0

        def elig(agc, vah, blind):
            scale = vah / cm.PKWW_PEAKHEIGHT
            rise = rise_k * scale / agc
            rmin = minp_k * scale / agc
            is_top = ((wmax > v_left + rise) & (wmax > v_right + rise) &
                      (no_min | (wmax > rmin)))
            is_bot = ((~is_top) & (wmin < v_left - rise) &
                      (wmin < v_right - rise) & (no_min | (wmin < -rmin)))
            return (is_top | is_bot) & cand_full & (posf > blind), is_top
        return elig

    def row_admission(feat, cand_full, posf):
        (wmax, wmin, l_top, prevmax, nextmax, l_bot, prevmin, nextmin) = (
            feat["wmax"], feat["wmin"], feat["l_top"], feat["prevmax"],
            feat["nextmax"], feat["l_bot"], feat["prevmin"], feat["nextmin"])
        elig = elig_fn(feat, cand_full, posf)
        use_exp = aal_k > 0.0
        use_win = awin_k > 0

        e0, _ = elig(st_read("agc"), st_read("vah"), st_read("blind"))
        wrow("elig", jnp.where(e0, 1.0, 0.0))
        smem_ref[GSM_AWORK] = jnp.sum(e0.astype(F32))

        def commit(j, carry):
            @pl.when(smem_ref[GSM_AWORK] > 0.0)
            def _():
                agc = st_read("agc")
                vah = st_read("vah")
                e = srow("elig") > 0.5

                li = jnp.min(jnp.where(e, lane, 9999), axis=1,
                             keepdims=True)
                li = jnp.broadcast_to(li, lane.shape)
                adm = (li < 9999) & active
                sel = (lane == li) & adm

                def ext(x):
                    v = jnp.sum(jnp.where(sel, x, 0.0), axis=1,
                                keepdims=True)
                    return jnp.broadcast_to(v, lane.shape)

                scale = vah / cm.PKWW_PEAKHEIGHT
                rise = rise_k * scale / agc
                rmin = minp_k * scale / agc
                no_min = minp_k == 0.0
                top_row = ((wmax > feat["v_left"] + rise) &
                           (wmax > feat["v_right"] + rise) &
                           (no_min | (wmax > rmin)))
                is_top = ext(jnp.where(top_row, F32(1.0), F32(0.0))) > 0.5
                is_top = is_top & adm
                is_bot = adm & (~is_top)
                L = ext(jnp.where(top_row, l_top, l_bot))
                val = ext(jnp.where(top_row, wmax, wmin))
                prev = ext(jnp.where(top_row, prevmax, prevmin))
                nxt = ext(jnp.where(top_row, nextmax, nextmin))
                s_f = ext(posf)

                thr = cm.PEAK_THRESHOLD / agc
                ref = jnp.where(is_top, val - thr, val + thr)
                p_close = (is_top & (prev > ref)) | (is_bot & (prev < ref))
                n_close = (is_top & (nxt > ref)) | (is_bot & (nxt < ref))
                adj = jnp.where(p_close & ~n_close, F32(-0.5),
                                jnp.where(n_close & ~p_close, F32(0.5),
                                          F32(0.0)))
                t_this = s_f - ((W_f - L) - adj)

                # first data bit initializes max_agc (gcr_track_scan)
                dc_pre = srow("dc")
                first = adm & (dc_pre == 0.0)
                max_agc1 = jnp.where(first, agc, st_read("max_agc"))

                # ---- nrzi_agc_policy (shared with the NRZI kernel) ----
                n_adm = st_read("n_adm")
                v_top2 = jnp.where(is_top, val, st_read("v_top"))
                v_bot2 = jnp.where(is_bot, val, st_read("v_bot"))
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
                ring_rows = [st_read(k) for k in range(agc_ring)]
                ring2 = [jnp.where(in_base & (hndx == k), height,
                                   ring_rows[k]) for k in range(agc_ring)]
                vah_fin = st_read("vah_sum") / jnp.maximum(vah_cnt, 1.0)
                vah2 = jnp.where(do_fin, vah_fin, vah)
                vah_cnt2 = jnp.where(do_fin, F32(0.0), vah_cnt2)
                lastheight = st_read("v_lasttop") - st_read("v_lastbot")
                hgt_ok = lastheight > 0.0
                g_exp = vah2 / jnp.maximum(lastheight, 1e-9)
                g_exp = jnp.minimum(aal_k * g_exp + (1 - aal_k) * agc,
                                    cm.AGC_MAX_VALUE)
                ring3 = [jnp.where(do_agc & use_win & hgt_ok & (hndx == k),
                                   lastheight, ring2[k])
                         for k in range(agc_ring)]
                minh = zf + cm.FLT_MAX
                for k in range(agc_ring):
                    minh = jnp.minimum(
                        minh, jnp.where(k < awin_k, ring3[k], cm.FLT_MAX))
                g_win = jnp.minimum(vah2 / jnp.maximum(minh, 1e-9),
                                    cm.AGC_MAX_VALUE)
                agc2 = jnp.where(do_agc & use_exp & hgt_ok, g_exp, agc)
                agc2 = jnp.where(do_agc & use_win & hgt_ok, g_win, agc2)
                hndx2 = jnp.where(do_agc & use_win & hgt_ok, hndx_acc,
                                  hndx2)
                changed = do_agc & (use_exp | use_win) & hgt_ok
                max_agc2 = jnp.where(changed & (agc2 > max_agc1), agc2,
                                     max_agc1)
                min_agc2 = jnp.where(changed & (agc2 < st_read("min_agc")),
                                     agc2, st_read("min_agc"))

                # ---- peak statistics (pre-update datablock/lastpeak) ----
                stat_ok = adm & (srow("datablock") > 0.5)
                stat_val = t_this - srow("tlastpeak")
                stat_bkt = ((stat_val - stat_lb) / stat_bw).astype(I32)
                code = jnp.where(stat_bkt < 0, 0,
                                 jnp.where(stat_bkt > 49, 49, stat_bkt))
                hist_ref[0, :, :] = hist_ref[0, :, :] + jnp.where(
                    stat_ok & (lane == code), 1.0, 0.0)
                wrow("trksum", srow("trksum") + jnp.where(
                    stat_ok & (stat_bkt >= 0) & (stat_bkt <= 49) &
                    (lane == 0), 1.0, 0.0))

                # ---- gcr_bit_step (decode_gcr.c:731-834) ----
                b = srow("clkavg")
                delta = t_this - srow("tlastpeak")
                in_blk = adm & (srow("datablock") > 0.5)
                zero1 = in_blk & (delta - srow("tpadj") > z1_k * b)
                zero2 = zero1 & (delta - srow("tpadj") > z2_k * b)
                numbits = (1.0 + jnp.where(zero1, 1.0, 0.0) +
                           jnp.where(zero2, 1.0, 0.0))
                tpd_new = jnp.where(in_blk, delta, srow("tpkdelta"))

                dc = dc_pre
                lastbits = srow("lastbits")
                rsc = srow("rsc")
                clkavg = b
                clkring = srow("clkring")
                clkndx = srow("clkndx")

                def add_one_bit(dc_, lb_, rsc_, ca_, cr_, bitval, enable):
                    bits_write(jnp.minimum(dc_, float(maxb - 1)), bitval,
                               enable)
                    dc_n = jnp.where(enable,
                                     jnp.minimum(dc_ + 1.0, float(maxb)),
                                     dc_)
                    lb_n = jnp.where(enable,
                                     _mod(lb_ * 2.0 + bitval, 256.0), lb_)
                    at5 = enable & (_mod(dc_n, 5.0) == 0.0)
                    lb5 = _mod(lb_n, 32.0)
                    rsc_n = jnp.where(at5 & (lb5 == float(mark2)), 1.0,
                             jnp.where(at5 & (lb5 == float(mark1)) &
                                       (rsc_ > 0.0), 0.0, rsc_))
                    in_resync = enable & (rsc_n > 0.0)
                    force = in_resync & (rsc_n == 5.0)
                    ca_n = jnp.where(force, tpd_new, ca_)
                    cr_n = jnp.where(force, tpd_new, cr_)
                    rsc_n = jnp.where(in_resync, rsc_n + 1.0, rsc_n)
                    return dc_n, lb_n, rsc_n, ca_n, cr_n

                dc, lastbits, rsc, clkavg, clkring = add_one_bit(
                    dc, lastbits, rsc, clkavg, clkring, 0.0, zero1 & adm)
                dc, lastbits, rsc, clkavg, clkring = add_one_bit(
                    dc, lastbits, rsc, clkavg, clkring, 0.0, zero2 & adm)

                # clock adjust on 3 consecutive ones (prev delta)
                prev2 = jnp.where(dc >= 2.0,
                                  _mod(jnp.floor(lastbits / 2.0), 2.0),
                                  0.0)
                do_adj = in_blk & (dc > 3.0) & (numbits == 1.0) & \
                    (prev2 == 1.0)
                pdelta = srow("tpkdelta")
                old = jnp.sum(jnp.where(lanef == clkndx, clkring, 0.0),
                              axis=1, keepdims=True)
                old = jnp.broadcast_to(old, (16, 128))
                use_wc = clkw_k > 0.0
                use_ec = (~use_wc) & (clka_k > 0.0)
                avg_w = clkavg + (pdelta - old) / jnp.maximum(clkw_k, 1.0)
                avg_e = clka_k * pdelta + (1.0 - clka_k) * clkavg
                avg_new = jnp.where(use_wc, avg_w,
                                    jnp.where(use_ec, avg_e,
                                              jnp.float32(spb)))
                clkring = jnp.where(do_adj & use_wc & (lanef == clkndx),
                                    pdelta, clkring)
                ndx2 = jnp.where(clkndx + 1.0 >= clkw_k, 0.0, clkndx + 1.0)
                clkndx = jnp.where(do_adj & use_wc, ndx2, clkndx)
                clkavg = jnp.where(do_adj, avg_new, clkavg)

                tpadj2 = jnp.where(
                    in_blk, padj_k * (numbits * clkavg - delta),
                    srow("tpadj"))

                dc, lastbits, rsc, clkavg, clkring = add_one_bit(
                    dc, lastbits, rsc, clkavg, clkring, 1.0, adm)

                wrow("dc", dc)
                wrow("lastbits", lastbits)
                wrow("rsc", rsc)
                wrow("clkavg", clkavg)
                wrow("clkring", clkring)
                wrow("clkndx", clkndx)
                wrow("tpadj", tpadj2)
                wrow("tpkdeltaprev", jnp.where(in_blk, srow("tpkdelta"),
                                               srow("tpkdeltaprev")))
                wrow("tpkdelta", jnp.where(in_blk, delta,
                                           srow("tpkdelta")))
                wrow("datablock", jnp.where(adm, 1.0, srow("datablock")))
                wrow("tfirstbit", jnp.where(adm & (dc_pre == 0.0), t_this,
                                            srow("tfirstbit")))
                wrow("tlastbit", jnp.where(adm, t_this, srow("tlastbit")))
                wrow("tlastpeak", jnp.where(adm, t_this,
                                            srow("tlastpeak")))

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
                for k in range(agc_ring):
                    st_write(k, ring3[k])

                # flush pressure
                mx = jnp.max(jnp.where(active & (lane == 0), dc, 0.0))
                bb = smem_ref[GSM_BITBASE]

                @pl.when((mx - bb >= 224.0) & (bb + 128.0 < float(MBP)))
                def _():
                    bi = (bb / 128.0).astype(I32)
                    bits_ref[0, :, pl.ds(bi * 128, 128)] = srow("bw0")
                    wrow("bw0", srow("bw1"))
                    wrow("bw1", zf)
                    smem_ref[GSM_BITBASE] = bb + 128.0

                e2, _ = elig(agc2, vah2, blind2)
                wrow("elig", jnp.where(e2, 1.0, 0.0))
                smem_ref[GSM_AWORK] = jnp.sum(e2.astype(F32))
            return carry

        def commit_block(o, carry):
            @pl.when(smem_ref[GSM_AWORK] > 0.0)
            def _():
                jax.lax.fori_loop(0, 8, commit, 0)
            return carry

        jax.lax.fori_loop(0, -(-A_MAX // 8), commit_block, 0)
        st_write("overflow", jnp.where(smem_ref[GSM_AWORK] > 0.0,
                                       zf + 1.0, st_read("overflow")))

    def col0_bcast(blk):
        return jnp.broadcast_to(
            jnp.sum(jnp.where(lane == 0, blk, 0.0), axis=1, keepdims=True),
            (16, 128))

    for rr in range(RB):
        vcur = v_ref[0, :, rr * 128:(rr + 1) * 128]
        if rr == 0:
            vprev = srow("vmarg")
        else:
            vprev = v_ref[0, :, (rr - 1) * 128:rr * 128]
        nxt_blk = (v_ref[0, :, (rr + 1) * 128:(rr + 2) * 128]
                   if rr < RB - 1 else vnxt_ref[0, :, :])
        nxt0_row = col0_bcast(nxt_blk)
        base = rblk * (RB * 128) + rr * 128
        first_row = (rblk == 0) & (rr == 0)

        @pl.when(first_row)
        def _(vcur=vcur):
            wrow("col0v", col0_bcast(vcur))

        posf = lanef + base.astype(F32)
        seg_end_col = posf == np.float32(S - 1)

        feats = []
        for Wd in wset:
            feats.append(_row_features(
                vprev, vcur, nxt0_row, Wd, first_row=first_row,
                seg_end_col=seg_end_col, col0_row=srow("col0v"),
                lane=lane, lanef=lanef))
        if G == 1:
            feat = feats[0]
        else:
            feat = {k: feats[0][k] for k in feats[0]}
            for g in range(1, G):
                feat = {k: jnp.where(grp_k == g, feats[g][k], feat[k])
                        for k in feat}

        wmax, wmin, v_left = feat["wmax"], feat["wmin"], feat["v_left"]
        no_mf = mf_col <= 0.0
        topc = ((wmax > v_left + rf_col) & (wmax > vcur + rf_col) &
                (no_mf | (wmax > mf_col)))
        botc = ((wmin < v_left - rf_col) & (wmin < vcur - rf_col) &
                (no_mf | (wmin < -mf_col)))
        cand_full = ((topc | botc) & active &
                     (posf >= lead_len) & (posf < seg_len))
        row_admission(feat, cand_full, posf)
        if rr == RB - 1:
            wrow("vmarg", vcur)

    @pl.when(last_blk)
    def _():
        bb = smem_ref[GSM_BITBASE]
        bi = (bb / 128.0).astype(I32)

        @pl.when(bb < float(MBP))
        def _():
            bits_ref[0, :, pl.ds(bi * 128, 128)] = srow("bw0")

        @pl.when(bb + 128.0 < float(MBP))
        def _():
            bits_ref[0, :, pl.ds(bi * 128 + 128, 128)] = srow("bw1")

        vals = zf
        for ln, col in (
                (GL_DC, srow("dc")),
                (GL_TFIRST, srow("tfirstbit")),
                (GL_TLAST, srow("tlastbit")),
                (GL_MAXAGC, st_read("max_agc")),
                (GL_MINAGC, st_read("min_agc")),
                (GL_TRKSUM, jnp.broadcast_to(
                    jnp.sum(jnp.where(lane == 0, srow("trksum"), 0.0),
                            axis=1, keepdims=True), (16, 128))),
                (GL_INCOMP, st_read("overflow")),
                (GL_PEAKCNT, st_read("peakcount"))):
            vals = jnp.where(lane == ln, col, vals)
        vals = jnp.where(lane == GL_BAIL, zf + smem_ref[GSM_BAIL], vals)
        scal_ref[0, :, :] = vals


@functools.partial(jax.jit, static_argnames=(
    "S", "T", "P", "maxb", "Ws", "rises", "minps", "aalphas", "awindows",
    "clk_windows", "clk_alphas", "z1pts", "z2pts", "pulse_adjs", "spb",
    "agc_ring", "mark1", "mark2", "interpret"))
def gcr_fused_scan(volts, meta, *, S: int, T: int, P: int, maxb: int,
                   Ws, rises, minps, aalphas, awindows, clk_windows,
                   clk_alphas, z1pts, z2pts, pulse_adjs, spb: float,
                   agc_ring: int, mark1: int, mark2: int,
                   interpret: bool = None):
    """GCR per-track fused scan. Returns (bits, hist, scal)."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    B = volts.shape[0]
    assert volts.shape[1] == 16 and volts.shape[2] == S
    assert S % (RB * 128) == 0 and T <= 16
    n_rblks = S // (RB * 128)
    R = S // 128
    MBP = -(-maxb // 128) * 128

    kern = functools.partial(
        _gcr_kernel, P=P, T=T, S=S, maxb=maxb, MBP=MBP, Ws=Ws,
        rises=rises, minps=minps, aalphas=aalphas, awindows=awindows,
        clk_windows=clk_windows, clk_alphas=clk_alphas, z1pts=z1pts,
        z2pts=z2pts, pulse_adjs=pulse_adjs, spb=spb, agc_ring=agc_ring,
        mark1=mark1, mark2=mark2)
    _, n_rows = _gcr_layout(agc_ring)

    bits, hist, scal = pl.pallas_call(
        kern,
        grid=(B * P, n_rblks),
        in_specs=[
            pl.BlockSpec((1, 16, 128), lambda i, r, P=P: (i // P, 0, 0)),
            pl.BlockSpec((1, 16, RB * 128),
                         lambda i, r, P=P: (i // P, 0, r)),
            pl.BlockSpec((1, 16, 128),
                         lambda i, r, P=P, R=R:
                         (i // P, 0, jnp.minimum(r * RB + RB, R - 1))),
        ],
        out_specs=[
            pl.BlockSpec((1, 16, MBP), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i, r: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * P, 16, MBP), jnp.float32),
            jax.ShapeDtypeStruct((B * P, 16, 128), jnp.float32),
            jax.ShapeDtypeStruct((B * P, 16, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_rows, 128), jnp.float32),
            pltpu.SMEM((GN_SM,), jnp.float32),
        ],
        interpret=interpret,
    )(meta, volts, volts)
    return (bits.reshape(B, P, 16, MBP), hist.reshape(B, P, 16, 128),
            scal.reshape(B, P, 16, 128))


# ===========================================================================
# Whirlwind fused kernel: admission row sweep + the global pulse/clock/
# blockmark machine (decode_ww.c:51-271) in ONE tape sweep.
#
# WW decodes the whole tape as a single pass (blocks can abut;
# decode_ww.c:29-31) with ONE parmset (readtape.c:1987), so the kernel's
# grid is (B=1, S/2048) and every knob is a compile-time constant. The
# admission part is the same row formulation as the NRZI kernel (features
# via _row_features, loose candidacy, commit loop) with WW's AGC policy:
# cm.adjust_agc on EVERY admitted peak, v_avg_height fixed per track (from
# the deskew pass or nominal -- ww.py:ww_track_scan.extra). Admitted
# transitions append (s, frac, is_top) to per-track VMEM rings; after each
# RB-row sweep the machine pops ring events in global time order (min s,
# lower track first -- exactly merge_transitions' stable-sort tiebreak)
# and replays ww_global_scan.step op for op, including the rolling integer
# rebasing that keeps sub-sample clocking exact on multi-million-sample
# captures.
#
# The machine is one-way coupled to admission (it only reads transitions,
# never influences them), so lagging pops are safe: a pop budget per grid
# step bounds worst-case work, leftovers drain on later steps, and the
# ring-pressure bail (same rule as NRZI) guards overwrites -- the pipeline
# re-decodes bailed tapes through the exact XLA path.
# ===========================================================================

FLUX_POS, FLUX_NEG, FLUX_AUTO = 0, 1, 2     # ww.py's flux direction codes
REBASE_SPAN = 1 << 22                       # ww.py's rolling-base span

# machine SMEM slots. WS_PB is the POSITION base: unbounded captures keep
# every position-valued quantity (posf, blind, ring s, machine base, the
# seg_len/lead limits) relative to it, shifting by a grid-step-aligned
# amount (a multiple of 2048, so every shifted integer stays f32-exact)
# whenever the step offset exceeds the span -- the old 2^24 f32 position
# cap is gone and any capture decodes in ONE kernel sweep.
(WS_TLCS, WS_TLCE, WS_TLPCS, WS_TLACS, WS_TLPCE, WS_TLBM, WS_LASTPK,
 WS_BASE, WS_DC, WS_BSC, WS_NBLK, WS_M1, WS_MCLK, WS_NFLUX, WS_FLUX,
 WS_FLUXSET, WS_DBLK, WS_BAVG, WS_CHBASE, WS_BAIL, WS_AWORK,
 WS_PB, WS_SEGL, WS_LEAD) = range(24)
WN_SM = 24

WW_MAXBLK = 2048              # block-record window capacity (bail beyond)

# scal_ref output lanes ([1, 16, 128]; per-track values at (row=track))
(WL_NADM, WL_KV, WL_HSUM, WL_HCNT, WL_TRKSUM, WL_PEAKCNT, WL_MAXAGC,
 WL_MINAGC, WL_DCNT, WL_NBLK, WL_FLUX, WL_FLUXSET, WL_NFLUX, WL_M1,
 WL_MCLK, WL_BAIL, WL_OVF) = range(17)

# meta lane for the per-track v_avg_height init (deskew pass average)
M_WW_VAH = 7
# alphas ride meta as TRACED values mirroring the XLA path's operand
# shapes (agc_alpha a per-track vector like the NRZI kernel's kfv,
# clk_alpha a scalar): compile-time Python constants let Mosaic fuse
# a*x+(1-a)*y differently (1-ulp clock-average divergence, observed)
M_WW_AAL, M_WW_CLKA = 8, 9


def _ww_layout():
    off = {}
    n = 0

    def alloc(name, rows=16):
        nonlocal n
        off[name] = n
        n += rows

    for f in ("blind", "v_top", "v_bot", "n_adm", "agc", "max_agc",
              "min_agc", "v_lasttop", "v_lastbot", "peakcount", "h_sum",
              "h_cnt", "overflow"):
        alloc(f"adm_{f}")
    for nm in ("elig", "rs0", "rs1", "rf0", "rf1", "rp0", "rp1", "kv",
               "tlps", "tlpe", "tlpk", "tplk", "cw0", "cw1",
               "b_start", "b_end", "b_type", "b_t_end", "b_t_base",
               "b_t_bhi", "b_bitspace", "b_miss1", "b_missclk", "trksum",
               "vmarg", "col0v"):
        alloc(nm)
    alloc("misc", 1)
    return off, n


def _ww_kernel(meta_ref, v_ref, vnxt_ref, chars_ref, blk_ref, hist_ref,
               scal_ref, st_ref, smem_ref, *, T, S, W, maxchars, MCP,
               rise, minp, agc_alpha, clk_alpha, spb, fluxdir_req,
               pri_clk, pri_lsb, pri_msb, alt_clk, alt_lsb, alt_msb,
               span=REBASE_SPAN):
    n_rblks = pl.num_programs(1)
    rblk = pl.program_id(1)
    last_blk = rblk == n_rblks - 1
    sub = jax.lax.broadcasted_iota(I32, (16, 128), 0)
    lane = jax.lax.broadcasted_iota(I32, (16, 128), 1)
    zf = jnp.zeros((16, 128), F32)
    active = sub < T
    lanef = lane.astype(F32)
    OFF, _NR = _ww_layout()
    clk_trks = [t for t in (pri_clk, alt_clk) if t >= 0]
    lsb_trks = [t for t in (pri_lsb, alt_lsb) if t >= 0]

    def srow(name):
        o = OFF[name]
        nrow = 1 if name == "misc" else 16
        return st_ref[o:o + nrow, :]

    def wrow(name, val):
        o = OFF[name]
        nrow = 1 if name == "misc" else 16
        st_ref[o:o + nrow, :] = val

    def st_read(k):
        return srow(f"adm_{k}")

    def st_write(k, val):
        wrow(f"adm_{k}", val)

    meta = meta_ref[0, :, :]

    def meta_scalar(lane_idx):
        return jnp.sum(jnp.where((sub == 0) & (lane == lane_idx), meta, 0.0))

    def meta_col(lane_idx):
        c = jnp.sum(jnp.where(lane == lane_idx, meta, 0.0), axis=1,
                    keepdims=True)
        return jnp.broadcast_to(c, (16, 128))

    seg_len = meta_scalar(M_SEGLEN)
    lead_len = meta_scalar(M_LEAD)
    stat_lb = meta_scalar(M_STATLB)
    stat_bw = meta_scalar(M_STATBW)
    rf_col = meta_col(M_RISEF)
    mf_col = meta_col(M_MINF)
    vah_col = meta_col(M_WW_VAH)          # fixed per-track v_avg_height
    aal_col = meta_col(M_WW_AAL)          # agc_alpha (vector, see M_WW_AAL)
    clka = meta_scalar(M_WW_CLKA)         # clk_alpha (scalar)
    # (rise_parm * scale) precomputed -- scale never changes for WW
    rp_scale = jnp.float32(rise) * (vah_col / cm.PKWW_PEAKHEIGHT)
    mp_scale = jnp.float32(minp) * (vah_col / cm.PKWW_PEAKHEIGHT)
    W_f = jnp.float32(W)

    @pl.when(rblk == 0)
    def _():
        st_write("blind", zf - 1.0)
        st_write("v_top", zf)
        st_write("v_bot", zf)
        st_write("n_adm", zf)
        st_write("agc", zf + 1.0)
        st_write("max_agc", zf)
        st_write("min_agc", zf + cm.FLT_MAX)
        st_write("v_lasttop", zf)
        st_write("v_lastbot", zf)
        st_write("peakcount", zf)
        st_write("h_sum", zf)
        st_write("h_cnt", zf)
        st_write("overflow", zf)
        for nm in ("elig", "rs0", "rs1", "rf0", "rf1", "rp0", "rp1", "kv",
                   "tlps", "tlpe", "tlpk", "tplk", "cw0", "cw1",
                   "b_start", "b_end", "b_type", "b_t_end", "b_t_base",
                   "b_t_bhi", "b_bitspace", "b_miss1", "b_missclk",
                   "trksum", "vmarg", "col0v"):
            wrow(nm, zf)
        for sm in range(WN_SM):
            smem_ref[sm] = jnp.float32(0.0)
        smem_ref[WS_BAVG] = jnp.float32(spb)
        smem_ref[WS_FLUX] = jnp.float32(
            FLUX_NEG if fluxdir_req == FLUX_AUTO else fluxdir_req)
        smem_ref[WS_SEGL] = seg_len
        smem_ref[WS_LEAD] = lead_len
        hist_ref[0, :, :] = zf
        for k in range(MCP // 128):
            chars_ref[0, :, k * 128:(k + 1) * 128] = zf

    # ---- position rebase (see WS_PB): keep row positions, blind
    # frontiers, ring s entries, the machine base and the span limits
    # relative to a grid-step-aligned base so every stored position stays
    # an f32-exact integer at ANY capture length. ds is a multiple of
    # RB*128, so shifted multiples-of-2048 (WS_SEGL init included) and
    # shifted small ints remain exact; sentinel semantics survive because
    # every comparison shifts both sides.
    off0 = (rblk * (RB * 128)).astype(F32) - smem_ref[WS_PB]

    @pl.when(off0 > float(span))
    def _():
        ds = off0
        smem_ref[WS_PB] = smem_ref[WS_PB] + ds
        smem_ref[WS_SEGL] = smem_ref[WS_SEGL] - ds
        smem_ref[WS_LEAD] = smem_ref[WS_LEAD] - ds
        smem_ref[WS_BASE] = smem_ref[WS_BASE] - ds
        st_write("blind", st_read("blind") - ds)
        wrow("rs0", srow("rs0") - ds)
        wrow("rs1", srow("rs1") - ds)

    pos_base = (rblk * (RB * 128)).astype(F32) - smem_ref[WS_PB]
    seg_len_r = smem_ref[WS_SEGL]
    lead_len_r = smem_ref[WS_LEAD]
    # the tape-end column for the vnext fill, in relative coordinates
    # (exact whenever it can actually coincide with a swept row)
    send = jnp.float32(S) - smem_ref[WS_PB] - 1.0

    # ======================================================================
    # 1. admission row sweep (NRZI kernel structure, WW AGC policy)
    # ======================================================================
    A_MAX = 66

    def elig_fn(cand_full, posf, wmax, wmin, v_left, v_right):
        no_min = minp == 0.0

        def elig(agc, blind):
            rise_t = rp_scale / agc
            rmin = mp_scale / agc
            is_top = ((wmax > v_left + rise_t) & (wmax > v_right + rise_t) &
                      (no_min | (wmax > rmin)))
            is_bot = ((~is_top) & (wmin < v_left - rise_t) &
                      (wmin < v_right - rise_t) & (no_min | (wmin < -rmin)))
            return (is_top | is_bot) & cand_full & (posf > blind), is_top
        return elig

    def row_admission(feat, cand_full, posf):
        (wmax, wmin, l_top, prevmax, nextmax, l_bot, prevmin, nextmin) = (
            feat["wmax"], feat["wmin"], feat["l_top"], feat["prevmax"],
            feat["nextmax"], feat["l_bot"], feat["prevmin"], feat["nextmin"])
        elig = elig_fn(cand_full, posf, wmax, wmin, feat["v_left"],
                       feat["v_right"])

        def e_pack(e, is_top_row):
            return jnp.where(e, jnp.where(is_top_row, 2.0, 1.0), 0.0)

        e0, t0 = elig(st_read("agc"), st_read("blind"))
        wrow("elig", e_pack(e0, t0))
        smem_ref[WS_AWORK] = jnp.sum(jnp.where(e0, 1.0, 0.0))

        def commit_one(j, carry):
            @pl.when(smem_ref[WS_AWORK] > 0.0)
            def _():
                agc = st_read("agc")
                erow = srow("elig")
                e = erow > 0.5
                top_row = erow > 1.5

                li = jnp.min(jnp.where(e, lane, 9999), axis=1,
                             keepdims=True)
                li = jnp.broadcast_to(li, lane.shape)
                adm = (li < 9999) & active
                sel = (lane == li) & adm

                def ext(x):
                    v = jnp.sum(jnp.where(sel, x, 0.0), axis=1,
                                keepdims=True)
                    return jnp.broadcast_to(v, lane.shape)

                # refine in row space -> exact frac = -((W - L) - adj)
                L_row = jnp.where(top_row, l_top, l_bot)
                val_row = jnp.where(top_row, wmax, wmin)
                prev_row = jnp.where(top_row, prevmax, prevmin)
                nxt_row = jnp.where(top_row, nextmax, nextmin)
                thr = cm.PEAK_THRESHOLD / agc
                ref = jnp.where(top_row, val_row - thr, val_row + thr)
                p_close = ((top_row & (prev_row > ref)) |
                           (~top_row & (prev_row < ref)))
                n_close = ((top_row & (nxt_row > ref)) |
                           (~top_row & (nxt_row < ref)))
                adj = jnp.where(p_close & ~n_close, F32(-0.5),
                                jnp.where(n_close & ~p_close, F32(0.5),
                                          F32(0.0)))
                frac_row = -((W_f - L_row) - adj)

                is_top = ext(jnp.where(top_row, F32(1.0), F32(0.0))) > 0.5
                is_top = is_top & adm
                is_bot = adm & (~is_top)
                L = ext(L_row)
                val = ext(val_row)
                s_f = ext(posf)
                frac = ext(frac_row)

                n_adm = st_read("n_adm")
                v_top2 = jnp.where(is_top, val, st_read("v_top"))
                v_bot2 = jnp.where(is_bot, val, st_read("v_bot"))

                # WW AGC: cm.adjust_agc on every admit, exponential
                # variant (the kernel gate requires agc_window == 0),
                # v_avg_height fixed. lastheight reads the PRE-update
                # v_lasttop/v_lastbot (ww.py extra: adjust_agc(st2) before
                # the v_last* writes).
                lastheight = st_read("v_lasttop") - st_read("v_lastbot")
                g_exp = vah_col / jnp.maximum(lastheight, 1e-9)
                g_exp = aal_col * g_exp + (1 - aal_col) * agc
                g_exp = jnp.minimum(g_exp, cm.AGC_MAX_VALUE)
                use_exp = (agc_alpha > 0) & (lastheight > 0.0)
                agc2 = jnp.where(adm & use_exp, g_exp, agc)
                changed = adm & use_exp
                max_agc2 = jnp.where(changed & (agc2 > st_read("max_agc")),
                                     agc2, st_read("max_agc"))
                min_agc2 = jnp.where(changed & (agc2 < st_read("min_agc")),
                                     agc2, st_read("min_agc"))

                # deskew average-height measurement (pulse tops)
                height = v_top2 - v_bot2
                meas = is_top & (height > 0.0)
                st_write("h_sum", st_read("h_sum") +
                         jnp.where(meas, height, 0.0))
                st_write("h_cnt", st_read("h_cnt") +
                         jnp.where(meas, 1.0, 0.0))

                # ---- transition-ring append (s_f, frac, is_top) ----
                ridx = _mod(n_adm, float(RING))
                rcol = _mod(ridx, 128.0)
                in_b0 = ridx < 128.0
                m0 = adm & in_b0 & (lanef == rcol)
                m1 = adm & (~in_b0) & (lanef == rcol)
                wrow("rs0", jnp.where(m0, s_f, srow("rs0")))
                wrow("rs1", jnp.where(m1, s_f, srow("rs1")))
                wrow("rf0", jnp.where(m0, frac, srow("rf0")))
                wrow("rf1", jnp.where(m1, frac, srow("rf1")))
                topv = jnp.where(is_top, 1.0, 0.0)
                wrow("rp0", jnp.where(m0, topv, srow("rp0")))
                wrow("rp1", jnp.where(m1, topv, srow("rp1")))
                pressure = jnp.max(jnp.where(
                    adm, n_adm - srow("kv"), -1.0)) >= float(RING)
                smem_ref[WS_BAIL] = jnp.where(pressure, 1.0,
                                              smem_ref[WS_BAIL])

                blind2 = jnp.where(adm, s_f + L, st_read("blind"))
                st_write("blind", blind2)
                st_write("v_top", v_top2)
                st_write("v_bot", v_bot2)
                st_write("n_adm", n_adm + jnp.where(adm, 1.0, 0.0))
                st_write("agc", agc2)
                st_write("max_agc", max_agc2)
                st_write("min_agc", min_agc2)
                st_write("v_lasttop", jnp.where(is_top, val,
                                                st_read("v_lasttop")))
                st_write("v_lastbot", jnp.where(is_bot, val,
                                                st_read("v_lastbot")))
                st_write("peakcount", st_read("peakcount") +
                         jnp.where(adm, 1.0, 0.0))

                e2, t2 = elig(agc2, blind2)
                wrow("elig", e_pack(e2, t2))
                smem_ref[WS_AWORK] = jnp.sum(jnp.where(e2, 1.0, 0.0))
            return carry

        def commit_block(o, carry):
            @pl.when(smem_ref[WS_AWORK] > 0.0)
            def _():
                jax.lax.fori_loop(0, 8, commit_one, 0)
            return carry

        jax.lax.fori_loop(0, -(-A_MAX // 8), commit_block, 0)
        st_write("overflow", jnp.where(smem_ref[WS_AWORK] > 0.0,
                                       zf + 1.0, st_read("overflow")))

    def col0_bcast(blk):
        return jnp.broadcast_to(
            jnp.sum(jnp.where(lane == 0, blk, 0.0), axis=1, keepdims=True),
            (16, 128))

    for rr in range(RB):
        vcur = v_ref[0, :, rr * 128:(rr + 1) * 128]
        if rr == 0:
            vprev = srow("vmarg")
        else:
            vprev = v_ref[0, :, (rr - 1) * 128:rr * 128]
        nxt_blk = (v_ref[0, :, (rr + 1) * 128:(rr + 2) * 128]
                   if rr < RB - 1 else vnxt_ref[0, :, :])
        nxt0_row = col0_bcast(nxt_blk)
        first_row = (rblk == 0) & (rr == 0)

        @pl.when(first_row)
        def _(vcur=vcur):
            wrow("col0v", col0_bcast(vcur))

        posf = lanef + (pos_base + np.float32(rr * 128))
        seg_end_col = posf == send
        feat = _row_features(vprev, vcur, nxt0_row, W,
                             first_row=first_row, seg_end_col=seg_end_col,
                             col0_row=srow("col0v"), lane=lane, lanef=lanef)
        wmax, wmin, v_left = feat["wmax"], feat["wmin"], feat["v_left"]
        no_mf = mf_col <= 0.0
        topc = ((wmax > v_left + rf_col) & (wmax > vcur + rf_col) &
                (no_mf | (wmax > mf_col)))
        botc = ((wmin < v_left - rf_col) & (wmin < vcur - rf_col) &
                (no_mf | (wmin < -mf_col)))
        cand_full = ((topc | botc) & active &
                     (posf >= lead_len_r) & (posf < seg_len_r))
        row_admission(feat, cand_full, posf)
        if rr == RB - 1:
            wrow("vmarg", vcur)

    # ======================================================================
    # 2. the global machine: pop ring events in time order, replay
    #    ww_global_scan.step exactly
    # ======================================================================
    cnt_col = st_read("n_adm")

    def emit_block(btype, end_t, cond):
        """ww_end_of_block / ww_blockmark when cond (scalar f32 bool)."""
        i = smem_ref[WS_NBLK]
        smem_ref[WS_BAIL] = jnp.where((cond > 0.0) &
                                      (i >= float(WW_MAXBLK)), 1.0,
                                      smem_ref[WS_BAIL])
        wm = ((cond > 0.0) & (sub == (i / 128.0).astype(I32)) &
              (lanef == _mod(i, 128.0)) & (i < float(WW_MAXBLK)))
        b0 = smem_ref[WS_BAVG]
        for name, val in (("b_start", smem_ref[WS_BSC]),
                          ("b_end", smem_ref[WS_DC]),
                          ("b_type", jnp.float32(btype)),
                          ("b_t_end", end_t),
                          ("b_t_base", smem_ref[WS_BASE]),
                          ("b_t_bhi", smem_ref[WS_PB]),
                          ("b_bitspace", b0),
                          ("b_miss1", smem_ref[WS_M1]),
                          ("b_missclk", smem_ref[WS_MCLK])):
            wrow(name, jnp.where(wm, val, srow(name)))
        smem_ref[WS_NBLK] = i + jnp.where(cond > 0.0, 1.0, 0.0)
        smem_ref[WS_BSC] = jnp.where(cond > 0.0, smem_ref[WS_DC],
                                     smem_ref[WS_BSC])
        smem_ref[WS_M1] = jnp.where(cond > 0.0, 0.0, smem_ref[WS_M1])
        smem_ref[WS_MCLK] = jnp.where(cond > 0.0, 0.0, smem_ref[WS_MCLK])
        # ww_init_blockstate: clock + per-track peak memory reset
        smem_ref[WS_BAVG] = jnp.where(cond > 0.0, jnp.float32(spb), b0)
        for sm in (WS_TLCS, WS_TLCE, WS_TLPCE, WS_TLPCS, WS_TLACS):
            smem_ref[sm] = jnp.where(cond > 0.0, 0.0, smem_ref[sm])
        smem_ref[WS_DBLK] = jnp.where(cond > 0.0, 0.0, smem_ref[WS_DBLK])
        cm16 = (cond > 0.0) & active
        wrow("tlpk", jnp.where(cm16, 0.0, srow("tlpk")))
        wrow("tplk", jnp.where(cm16, 0.0, srow("tplk")))

    def chk_databits(clkend, cond):
        """ww_chk_databits (decode_ww.c:51-92) when cond; reads the FRESH
        bitspace average (st at call time, like the XLA version)."""
        bfr = smem_ref[WS_BAVG]
        tlps = srow("tlps")
        hits = (tlps > clkend - bfr) & (tlps < clkend)
        l0 = lane == 0
        hv = jnp.sum(
            jnp.where(hits & l0 & (sub == pri_msb), 1.0, 0.0) +
            (jnp.where(hits & l0 & (sub == alt_msb), 2.0, 0.0)
             if alt_msb >= 0 else 0.0) +
            jnp.where(hits & l0 & (sub == pri_lsb), 4.0, 0.0) +
            (jnp.where(hits & l0 & (sub == alt_lsb), 8.0, 0.0)
             if alt_lsb >= 0 else 0.0))
        h_pm = _mod(hv, 2.0) >= 1.0
        h_am = _mod(jnp.floor(hv / 2.0), 2.0) >= 1.0
        h_pl = _mod(jnp.floor(hv / 4.0), 2.0) >= 1.0
        h_al = _mod(jnp.floor(hv / 8.0), 2.0) >= 1.0
        msb = h_pm | (h_am if alt_msb >= 0 else False)
        lsb = h_pl | (h_al if alt_lsb >= 0 else False)
        # miss: (r_pri | r_alt) == 3 -- only possible when both tracks
        # exist and exactly one of them hit (ww.py chk_databits)
        miss = jnp.float32(0.0)
        if alt_msb >= 0:
            miss = miss + jnp.where(h_pm ^ h_am, 1.0, 0.0)
        if alt_lsb >= 0:
            miss = miss + jnp.where(h_pl ^ h_al, 1.0, 0.0)
        ch = jnp.where(msb, 2.0, 0.0) + jnp.where(lsb, 1.0, 0.0)
        i = jnp.minimum(smem_ref[WS_DC], float(maxchars - 1))
        rel = i - smem_ref[WS_CHBASE]
        in0 = (rel >= 0.0) & (rel < 2048.0)
        in1 = (rel >= 2048.0) & (rel < 4096.0)
        r0 = rel
        r1 = rel - 2048.0
        m0 = (cond & in0 & (sub == (r0 / 128.0).astype(I32)) &
              (lanef == _mod(r0, 128.0)))
        m1 = (cond & in1 & (sub == (r1 / 128.0).astype(I32)) &
              (lanef == _mod(r1, 128.0)))
        wrow("cw0", jnp.where(m0, ch, srow("cw0")))
        wrow("cw1", jnp.where(m1, ch, srow("cw1")))
        smem_ref[WS_BAIL] = jnp.where(cond & ~(in0 | in1), 1.0,
                                      smem_ref[WS_BAIL])
        smem_ref[WS_DC] = jnp.where(
            cond, jnp.minimum(smem_ref[WS_DC] + 1.0, float(maxchars)),
            smem_ref[WS_DC])
        smem_ref[WS_M1] = smem_ref[WS_M1] + jnp.where(cond, miss, 0.0)

    def pop_event(it, carry):
        kv = srow("kv")
        kvm = _mod(kv, float(RING))
        h0 = (lanef == kvm) & (kvm < 128.0)
        h1 = (lanef == kvm - 128.0) & (kvm >= 128.0)
        has = active & (kv < cnt_col)
        s_head = jnp.broadcast_to(jnp.sum(
            jnp.where(h0, srow("rs0"), 0.0) +
            jnp.where(h1, srow("rs1"), 0.0), axis=1, keepdims=True),
            (16, 128))
        s_head = jnp.where(has, s_head, BIG_S)
        s_min = jnp.min(s_head)
        run = s_min < BIG_S / 2.0

        @pl.when(run)
        def _():
            cand = has & (s_head == s_min)
            trk_sel = jnp.min(jnp.where(cand, sub, 99))
            onehot = sub == trk_sel
            sel0 = onehot & h0
            sel1 = onehot & h1
            frac = jnp.sum(jnp.where(sel0, srow("rf0"), 0.0) +
                           jnp.where(sel1, srow("rf1"), 0.0))
            is_top = jnp.sum(jnp.where(sel0, srow("rp0"), 0.0) +
                             jnp.where(sel1, srow("rp1"), 0.0)) > 0.5
            wrow("kv", kv + jnp.where(onehot, 1.0, 0.0))

            b_top = smem_ref[WS_BAVG]      # stale binding, like step()'s b
            s_ev = s_min

            # ---- rolling rebase ----
            ds = s_ev - smem_ref[WS_BASE]
            reb = ds > float(span)

            @pl.when(reb)
            def _():
                for sm in (WS_TLCS, WS_TLCE, WS_TLPCS, WS_TLACS, WS_TLPCE,
                           WS_TLBM, WS_LASTPK):
                    v = smem_ref[sm]
                    smem_ref[sm] = jnp.where(v == 0.0, 0.0, v - ds)
                for nm in ("tlps", "tlpe", "tlpk", "tplk"):
                    r = srow(nm)
                    wrow(nm, jnp.where(r == 0.0, 0.0, r - ds))
                smem_ref[WS_BASE] = s_ev

            s_rel = s_ev - smem_ref[WS_BASE]
            t = s_rel + frac

            # ---- block end between events (clock stopped) ----
            ended = ((smem_ref[WS_DBLK] > 0.0) &
                     (smem_ref[WS_TLCE] > 0.0) &
                     (s_rel - smem_ref[WS_TLCE] >
                      b_top * cm.WW_CLKSTOP_BITS))
            tlpe_r = srow("tlpe")
            strag_m = zf > 1.0
            for lt in lsb_trks:
                strag_m = strag_m | ((sub == lt) & (lane == 0) &
                                     (tlpe_r - smem_ref[WS_TLCE] >
                                      b_top * cm.WW_PEAKSCLOSE_BITS))
            lsb_strag = jnp.sum(jnp.where(strag_m, 1.0, 0.0)) > 0.0
            emit_block(4, t, jnp.where(ended, 1.0, 0.0))        # BS_BLOCK
            emit_mark = ended & lsb_strag
            emit_block(1, t, jnp.where(emit_mark, 1.0, 0.0))    # BS_TAPEMARK
            smem_ref[WS_TLBM] = jnp.where(emit_mark, t,
                                          smem_ref[WS_TLBM])

            # ---- flux direction ----
            if fluxdir_req == FLUX_AUTO:
                faraway = (t - smem_ref[WS_LASTPK]) > \
                    b_top * cm.WW_PEAKSFAR_BITS
                newdir = jnp.where(is_top, jnp.float32(FLUX_POS),
                                   jnp.float32(FLUX_NEG))
                changed = (faraway & (smem_ref[WS_FLUXSET] > 0.0) &
                           (newdir != smem_ref[WS_FLUX]))
                smem_ref[WS_NFLUX] = smem_ref[WS_NFLUX] + \
                    jnp.where(changed, 1.0, 0.0)
                smem_ref[WS_FLUX] = jnp.where(faraway, newdir,
                                              smem_ref[WS_FLUX])
                smem_ref[WS_FLUXSET] = jnp.where(faraway, 1.0,
                                                 smem_ref[WS_FLUXSET])
                flux = smem_ref[WS_FLUX]
            else:
                flux = jnp.float32(fluxdir_req)
            smem_ref[WS_LASTPK] = t

            is_start = is_top == (flux == float(FLUX_POS))
            is_end = jnp.logical_not(is_start)
            is_clk = jnp.zeros((), bool)
            for ct in clk_trks:
                is_clk = is_clk | (trk_sel == ct)
            is_pri_clk = (trk_sel == pri_clk) if pri_clk >= 0 else False
            is_alt_clk = (trk_sel == alt_clk) if alt_clk >= 0 else False
            is_lsb = jnp.zeros((), bool)
            for lt in lsb_trks:
                is_lsb = is_lsb | (trk_sel == lt)

            # ---- pulse start ----
            ps = is_start
            wrow("tlps", jnp.where(onehot & ps, t, srow("tlps")))
            start_clk = ps & is_clk
            smem_ref[WS_DBLK] = jnp.where(start_clk, 1.0,
                                          smem_ref[WS_DBLK])
            prevpeak = jnp.sum(jnp.where(onehot & (lane == 0),
                                         srow("tplk"), 0.0))
            clk_close = (t - prevpeak) < b_top * cm.WW_PEAKSFAR_BITS
            delta_c = t - prevpeak
            bfr = smem_ref[WS_BAVG]
            if clk_alpha > 0.0:
                avg_e = clka * delta_c + (1.0 - clka) * bfr
            else:
                avg_e = jnp.float32(spb)
            smem_ref[WS_BAVG] = jnp.where(start_clk & clk_close, avg_e,
                                          bfr)
            smem_ref[WS_TLCS] = jnp.where(start_clk, t, smem_ref[WS_TLCS])
            smem_ref[WS_TLPCS] = jnp.where(ps & is_pri_clk, t,
                                           smem_ref[WS_TLPCS])
            smem_ref[WS_TLACS] = jnp.where(ps & is_alt_clk, t,
                                           smem_ref[WS_TLACS])

            # ---- pulse end ----
            pe = is_end
            wrow("tlpe", jnp.where(onehot & pe, t, srow("tlpe")))
            delta = t - smem_ref[WS_TLPCE]
            near = (pe & (smem_ref[WS_TLPCE] > 0.0) &
                    (delta > -b_top * 1.5) & (delta < b_top * 1.5))
            delta2 = jnp.where(delta <= 0.0, delta + b_top,
                               jnp.where(delta < b_top * 0.5,
                                         delta + b_top, delta))
            bkt = ((delta2 - stat_lb) / stat_bw).astype(I32)
            bkt_c = jnp.clip(bkt, 0, 49)
            hist_ref[0, :, :] = hist_ref[0, :, :] + jnp.where(
                onehot & near & (lane == bkt_c), 1.0, 0.0)
            wrow("trksum", srow("trksum") + jnp.where(
                onehot & near & (bkt >= 0) & (bkt <= 49) & (lane == 0),
                1.0, 0.0))
            end_clk = pe & is_clk
            do_chk = end_clk & ((t - smem_ref[WS_TLCE]) >
                                b_top * cm.WW_PEAKSCLOSE_BITS)
            chk_databits(t, do_chk)
            smem_ref[WS_TLCE] = jnp.where(end_clk, t, smem_ref[WS_TLCE])
            end_pri = pe & is_pri_clk
            miss_alt = (end_pri & (smem_ref[WS_TLACS] > 0.0) &
                        (smem_ref[WS_TLACS] < t - b_top))
            end_alt = pe & is_alt_clk
            miss_pri = (end_alt & (smem_ref[WS_TLPCS] > 0.0) &
                        (smem_ref[WS_TLPCS] < t - b_top))
            smem_ref[WS_MCLK] = smem_ref[WS_MCLK] + \
                jnp.where(miss_alt, 1.0, 0.0) + \
                jnp.where(miss_pri, 1.0, 0.0)
            smem_ref[WS_TLPCE] = jnp.where(end_pri, t, smem_ref[WS_TLPCE])
            bm = (pe & is_lsb & (smem_ref[WS_TLCS] == 0.0) &
                  (t - smem_ref[WS_TLBM] > b_top))
            emit_block(1, t, jnp.where(bm, 1.0, 0.0))           # blockmark
            smem_ref[WS_TLBM] = jnp.where(bm, t, smem_ref[WS_TLBM])

            # ---- per-track peak history ----
            old_last = jnp.sum(jnp.where(onehot & (lane == 0),
                                         srow("tlpk"), 0.0))
            wrow("tplk", jnp.where(onehot, old_last, srow("tplk")))
            wrow("tlpk", jnp.where(onehot, t, srow("tlpk")))
        return carry

    POPCAP = 512

    def pop_block(o, carry):
        # cheap work-remains probe: any track with unconsumed entries
        @pl.when(jnp.max(jnp.where(active, cnt_col - srow("kv"), 0.0))
                 > 0.0)
        def _():
            jax.lax.fori_loop(0, 8, pop_event, 0)
        return carry

    jax.lax.fori_loop(0, POPCAP // 8, pop_block, 0)

    # final drain + flush at the last grid step
    @pl.when(last_blk)
    def _():
        jax.lax.fori_loop(0, (T * RING) // 8 + 1, pop_block, 0)
        # leftovers after the full drain = ring pressure we never caught
        smem_ref[WS_BAIL] = jnp.where(
            jnp.max(jnp.where(active, cnt_col - srow("kv"), 0.0)) > 0.0,
            1.0, smem_ref[WS_BAIL])

        # trailing-block flush (ww_global_scan flush=True): uses the FINAL
        # bitspace average
        bfin = smem_ref[WS_BAVG]
        tlpe_r = srow("tlpe")
        strag_m = zf > 1.0
        for lt in lsb_trks:
            strag_m = strag_m | ((sub == lt) & (lane == 0) &
                                 (tlpe_r - smem_ref[WS_TLCE] >
                                  bfin * cm.WW_PEAKSCLOSE_BITS))
        lsb_strag = jnp.sum(jnp.where(strag_m, 1.0, 0.0)) > 0.0
        ended = (smem_ref[WS_DBLK] > 0.0) & (smem_ref[WS_TLCE] > 0.0)
        t_end = smem_ref[WS_TLCE]
        emit_block(4, t_end, jnp.where(ended, 1.0, 0.0))
        emit_block(1, t_end, jnp.where(ended & lsb_strag, 1.0, 0.0))

        # flush the chars windows
        cb = smem_ref[WS_CHBASE]
        ci = (cb / 2048.0).astype(I32)

        @pl.when(cb < float(maxchars))
        def _():
            chars_ref[0, :, pl.ds(ci * 128, 128)] = srow("cw0")

        @pl.when(cb + 2048.0 < float(maxchars))
        def _():
            chars_ref[0, :, pl.ds(ci * 128 + 128, 128)] = srow("cw1")

        # block-record fields
        for k, nm in enumerate(("b_start", "b_end", "b_type", "b_t_end",
                                "b_t_base", "b_t_bhi", "b_bitspace",
                                "b_miss1", "b_missclk")):
            blk_ref[0, :, k * 128:(k + 1) * 128] = srow(nm)

        vals = zf
        for ln, col in ((WL_NADM, st_read("n_adm")),
                        (WL_KV, srow("kv")),
                        (WL_HSUM, st_read("h_sum")),
                        (WL_HCNT, st_read("h_cnt")),
                        (WL_TRKSUM, jnp.broadcast_to(
                            jnp.sum(jnp.where(lane == 0, srow("trksum"),
                                              0.0), axis=1, keepdims=True),
                            (16, 128))),
                        (WL_PEAKCNT, st_read("peakcount")),
                        (WL_MAXAGC, st_read("max_agc")),
                        (WL_MINAGC, st_read("min_agc")),
                        (WL_OVF, st_read("overflow"))):
            vals = jnp.where(lane == ln, col, vals)
        for ln, sm in ((WL_DCNT, WS_DC), (WL_NBLK, WS_NBLK),
                       (WL_FLUX, WS_FLUX), (WL_FLUXSET, WS_FLUXSET),
                       (WL_NFLUX, WS_NFLUX), (WL_M1, WS_M1),
                       (WL_MCLK, WS_MCLK), (WL_BAIL, WS_BAIL)):
            vals = jnp.where(lane == ln, smem_ref[sm], vals)
        scal_ref[0, :, :] = vals

    # chars-window roll: the stream index only grows ~RB*128/spb per grid
    # step, far below the 2048-slack, so one check per step suffices
    @pl.when((smem_ref[WS_DC] - smem_ref[WS_CHBASE] >= 2048.0) &
             (smem_ref[WS_CHBASE] + 2048.0 < float(maxchars)) &
             jnp.logical_not(last_blk))
    def _():
        ci = (smem_ref[WS_CHBASE] / 2048.0).astype(I32)
        chars_ref[0, :, pl.ds(ci * 128, 128)] = srow("cw0")
        wrow("cw0", srow("cw1"))
        wrow("cw1", zf)
        smem_ref[WS_CHBASE] = smem_ref[WS_CHBASE] + 2048.0


@functools.partial(jax.jit, static_argnames=(
    "S", "T", "W", "maxchars", "rise", "minp", "agc_alpha", "clk_alpha",
    "spb", "fluxdir_req", "pri_clk", "pri_lsb", "pri_msb", "alt_clk",
    "alt_lsb", "alt_msb", "interpret", "span"))
def ww_fused_scan(volts, meta, *, S: int, T: int, W: int, maxchars: int,
                  rise: float, minp: float, agc_alpha: float,
                  clk_alpha: float, spb: float, fluxdir_req: int,
                  pri_clk: int, pri_lsb: int, pri_msb: int, alt_clk: int,
                  alt_lsb: int, alt_msb: int, interpret: bool = None,
                  span: int = REBASE_SPAN):
    """volts: [1, 16, S] f32; meta: [1, 16, 128]. Returns (chars, blk,
    hist, scal) raw kernel planes; decode with ww_fused_state."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    assert volts.shape == (1, 16, S) and S % (RB * 128) == 0
    n_rblks = S // (RB * 128)
    R = S // 128
    MCP = -(-maxchars // 2048) * 128

    kern = functools.partial(
        _ww_kernel, T=T, S=S, W=W, maxchars=maxchars, MCP=MCP, rise=rise,
        minp=minp, agc_alpha=agc_alpha, clk_alpha=clk_alpha, spb=spb,
        fluxdir_req=fluxdir_req, pri_clk=pri_clk, pri_lsb=pri_lsb,
        pri_msb=pri_msb, alt_clk=alt_clk, alt_lsb=alt_lsb, alt_msb=alt_msb,
        span=span)
    _, n_rows = _ww_layout()

    chars, blk, hist, scal = pl.pallas_call(
        kern,
        grid=(1, n_rblks),
        in_specs=[
            pl.BlockSpec((1, 16, 128), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, 16, RB * 128), lambda i, r: (i, 0, r)),
            pl.BlockSpec((1, 16, 128),
                         lambda i, r, R=R:
                         (i, 0, jnp.minimum(r * RB + RB, R - 1))),
        ],
        out_specs=[
            pl.BlockSpec((1, 16, MCP), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, 16, 9 * 128), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, 16, 128), lambda i, r: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 16, MCP), jnp.float32),
            jax.ShapeDtypeStruct((1, 16, 9 * 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 16, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 16, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_rows, 128), jnp.float32),
            pltpu.SMEM((WN_SM,), jnp.float32),
        ],
        interpret=interpret,
    )(meta, volts, volts)
    return chars, blk, hist, scal


def ww_fused_state(chars, blk, hist, scal, *, T: int, maxchars: int):
    """Decode the WW kernel's output planes into the ww_global_scan result
    dict consumed by assemble_ww_blocks / the stats block."""
    chars = np.asarray(chars[0])
    blk = np.asarray(blk[0])
    hist = np.asarray(hist[0])
    ss = np.asarray(scal[0])
    nch = chars.shape[1] // 128
    flat = chars.reshape(16, nch, 128).transpose(1, 0, 2).reshape(-1)
    fields = {}
    for k, nm in enumerate(("b_start", "b_end", "b_type", "b_t_end",
                            "b_t_base", "b_t_bhi", "b_bitspace",
                            "b_miss1", "b_missclk")):
        fields[nm] = blk[:, k * 128:(k + 1) * 128].reshape(-1)
    nblocks = int(ss[0, WL_NBLK])
    res = dict(
        chars=flat[:maxchars].astype(np.int8),
        datacount=np.int32(ss[0, WL_DCNT]),
        nblocks=np.int32(nblocks),
        b_start=fields["b_start"].astype(np.int32),
        b_end=fields["b_end"].astype(np.int32),
        b_type=fields["b_type"].astype(np.int32),
        b_t_end=fields["b_t_end"].astype(np.float32),
        b_t_base=(fields["b_t_base"].astype(np.int64) +
                  fields["b_t_bhi"].astype(np.int64)).astype(np.int64),
        b_bitspace=fields["b_bitspace"].astype(np.float32),
        b_leadclk=np.zeros(WW_MAXBLK, np.int32),
        b_missing1=fields["b_miss1"].astype(np.int32),
        b_missingclk=fields["b_missclk"].astype(np.int32),
        hist=hist[:T, :50].astype(np.int64),
        trksums=ss[:T, WL_TRKSUM].astype(np.int64),
        num_flux_changes=np.int32(ss[0, WL_NFLUX]),
        flux=np.int32(ss[0, WL_FLUX]),
        flux_set=bool(ss[0, WL_FLUXSET] > 0.5),
        w_missing_onebit=np.int32(ss[0, WL_M1]),
        w_missing_clock=np.int32(ss[0, WL_MCLK]),
        bail=bool(ss[0, WL_BAIL] > 0.5) or bool(
            ss[:T, WL_OVF].max() > 0.5),
        h_sum=ss[:T, WL_HSUM].astype(np.float32),
        h_cnt=ss[:T, WL_HCNT].astype(np.int32),
        n_admitted=ss[:T, WL_NADM].astype(np.int64),
    )
    return res
