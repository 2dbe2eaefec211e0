#!/usr/bin/env python3
"""Micro-decomposition of the NRZI device path's XLA glue at bench shapes:

  admission pallas_call RAW (records, no unpack)
  unpack: transpose+rank                      (cumsum part)
  unpack: compaction scatter                  (the .at[].set)
  unpack: gather-based compaction             (candidate replacement)
  slot kernel RAW
  reconstruct: scatter-max replay only
  reconstruct: rest (hist one-hot, first/last, finish)

    python scripts/profile_micro.py [B] [P]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from readtape_tpu.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from readtape_tpu.decode import common as cm
from readtape_tpu.decode import pallas_scan as ps
from readtape_tpu.decode import pallas_slot as psl
from readtape_tpu.decode import nrzi as nrzi_mod
from readtape_tpu.decode.common import F32, I32, ParmArrays
from readtape_tpu.decode.pipeline import (_mask_jump_table, _prep_volts,
                                          _union_jump_table,
                                          _nrzi_segment_pallas_finals,
                                          _peakstat_bins)
from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.parms import builtin_parmsets
from readtape_tpu.synth import default_spec, synthesize_tape
from jax.experimental import pallas as pl


def timeit(fn, *args, reps=8):
    out = jax.block_until_ready(fn(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    S = 32768
    T = 9
    print(f"# devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(7)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.005, start_gap_secs=0.002)
    blk = bytes(rng.integers(0, 256, 1200, dtype=np.uint8))
    hdr, samples = synthesize_tape(spec, [("block", blk)])
    seg_np = samples[:S].T.astype(np.int16)
    if seg_np.shape[1] < S:
        seg_np = np.pad(seg_np, ((0, 0), (0, S - seg_np.shape[1])))
    tape = jnp.asarray(np.tile(seg_np, (1, B)))
    off = jnp.arange(B, dtype=I32) * S
    lens = jnp.full(B, S, I32)
    leads = jnp.zeros(B, I32)

    pms = builtin_parmsets(tb.MODE_NRZI)
    sets = pms.sets[:P]
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (800 * 50 * deltat)
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 800, 50, deltat)
               for p in sets)
    K = int(S / spb * 2.5) + 64
    Kp = -(-K // 128) * 128
    maxb = int(S / spb * 1.3) + 64
    max_slots = int(S / spb * 1.25) + 48
    lb, bw = _peakstat_bins(tb.MODE_NRZI, 1.0 / (800 * 50))
    lbj = jnp.float32(lb / deltat)
    bwj = jnp.float32(bw / deltat)
    print(f"# B={B} T={T} S={S} P={P} Ws={sorted(set(Ws))} K={K} "
          f"maxb={maxb} max_slots={max_slots}", flush=True)

    maxvolts = jnp.float32(hdr.maxvolts)
    skew = jnp.zeros(T, I32)
    rise_floor = jnp.full(T, min(p.pkww_rise for p in sets) * 0.4, F32)
    min_floor = jnp.full(T, 0.0, F32)
    spb_f = float(spb)

    def prep(o, ln, ld):
        v_i16 = jax.lax.dynamic_slice(tape, (0, o), (T, S))
        v = _prep_volts(v_i16, maxvolts, jnp.float32(1.0), skew, S=S, T=T,
                        differentiate=False, spb_int=int(spb))
        nxt = _mask_jump_table(
            _union_jump_table(v, Ws, rise_floor, min_floor), ln, ld, S)
        return _nrzi_segment_pallas_finals(v, nxt, Ws=Ws)

    feat = jax.jit(lambda o, l, d: jax.vmap(prep)(o, l, d))(off, lens, leads)
    feat = jax.block_until_ready(feat)

    # ---- admission kernel RAW (single shared W assumed at P=1) ----
    rises = tuple(float(p.pkww_rise) for p in sets)
    minps = tuple(float(p.min_peak) for p in sets)
    aalphas = tuple(float(p.agc_alpha) for p in sets)
    awindows = tuple(int(p.agc_window) for p in sets)
    wset = sorted(set(Ws))
    assert len(wset) == 1, "profile assumes one W (P=1 phase)"
    W = wset[0]
    SL = 16
    R = S // 128
    RB = ps.RB
    n_rblks = R // RB
    A_MAX = min(32, 128 // (W + 1) + 2)
    ring = max(1, max(awindows))
    from jax.experimental.pallas import tpu as pltpu

    kern = functools.partial(
        ps._kernel_tracks, P=P, T=T, SL=SL, S=S, W=W, rises=rises,
        minps=minps, aalphas=aalphas, awindows=awindows, A_MAX=A_MAX,
        K=K, ring=ring)
    NF = len(ps.F_FIELDS) + ring

    def raw_call(featp):
        return pl.pallas_call(
            kern,
            grid=(B * P, n_rblks),
            in_specs=[pl.BlockSpec((1, 1, SL, 12, RB, 128),
                                   lambda i, r, P=P: (i // P, 0, 0, 0, r, 0))],
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
            scratch_shapes=[pltpu.VMEM((NF * SL, 128), jnp.float32),
                            pltpu.SMEM((1,), jnp.int32)],
        )(featp)

    featp = jnp.pad(feat, ((0, 0), (0, 0), (0, SL - T), (0, 0), (0, 0)))
    featp = featp.reshape(B, 1, SL, 12, R, 128)
    f_raw = jax.jit(raw_call)
    dt, (recs, scal) = timeit(f_raw, featp)
    print(f"admission RAW kernel:     {dt*1e3:7.1f} ms", flush=True)

    # ---- unpack pieces ----
    def rank_part(recs):
        r4 = recs.reshape(B, P, R, SL, 32, 4)[:, :, :, :T]
        r4 = r4.transpose(0, 1, 3, 2, 4, 5).reshape(B, P, T, R * 32, 4)
        written = r4[..., 0] >= 0.0
        rank = jnp.cumsum(written.astype(I32), axis=-1) - 1
        return r4, written, rank

    dt, (r4, written, rank) = timeit(jax.jit(rank_part), recs)
    print(f"unpack transpose+rank:    {dt*1e3:7.1f} ms", flush=True)

    def scatter_part(r4, written, rank):
        idx = jnp.where(written & (rank < K), rank, K)
        buf = jnp.zeros((B, P, T, K + 1, 4), F32)
        bi = jnp.arange(B)[:, None, None, None]
        pi = jnp.arange(P)[None, :, None, None]
        ti = jnp.arange(T)[None, None, :, None]
        return buf.at[bi, pi, ti, idx].set(r4, mode="drop")[..., :K, :]

    dt, packed_sc = timeit(jax.jit(scatter_part), r4, written, rank)
    print(f"unpack scatter:           {dt*1e3:7.1f} ms", flush=True)

    def gather_part(r4, written, rank):
        # inverse mapping: for output rank k, source position = the unique
        # j with rank[j] == k and written[j]; since rank is the cumsum,
        # searchsorted over the (sorted) rank-where-written gives it.
        # Build keys = rank where written else BIG, then positions of the
        # k-th written record via searchsorted on the monotone cumsum.
        cums = jnp.cumsum(written.astype(I32), axis=-1)   # [B,P,T,R32]
        kk = jnp.arange(K, dtype=I32) + 1
        pos = jax.vmap(lambda c: jnp.searchsorted(
            c, kk, side="left"))(cums.reshape(-1, R * 32))
        pos = pos.reshape(B, P, T, K)
        valid = pos < R * 32
        posc = jnp.minimum(pos, R * 32 - 1)
        out = jnp.take_along_axis(
            r4.reshape(B, P, T, R * 32, 4), posc[..., None], axis=3)
        return jnp.where(valid[..., None], out, 0.0)

    def rowcount_part(recs, scal):
        """Row-structured compaction: records are DENSE within each
        32-slot row, so per-row counts + one boundary scatter + cumsum +
        one aligned gather replace the 2.4M-element compaction scatter."""
        r4 = recs.reshape(B, P, R, SL, 32, 4)[:, :, :, :T]
        r4 = r4.transpose(0, 1, 3, 2, 4, 5).reshape(B, P, T, R * 32, 4)
        written = r4[..., 0] >= 0.0
        c = jnp.sum(written.reshape(B, P, T, R, 32).astype(I32), axis=-1)
        o = jnp.cumsum(c, axis=-1)                       # [B,P,T,R] ends
        marks = jnp.zeros((B, P, T, K + 1), I32)
        bi = jnp.arange(B)[:, None, None, None]
        pi = jnp.arange(P)[None, :, None, None]
        ti = jnp.arange(T)[None, None, :, None]
        marks = marks.at[bi, pi, ti, jnp.minimum(o, K)].add(1, mode="drop")
        r_of_k = jnp.cumsum(marks[..., :K], axis=-1)     # [B,P,T,K]
        r_of_k = jnp.minimum(r_of_k, R - 1)
        start = jnp.take_along_axis(o - c, r_of_k, axis=-1)
        kk = jnp.arange(K, dtype=I32)
        src = jnp.clip(r_of_k * 32 + (kk - start), 0, R * 32 - 1)
        out = jnp.take_along_axis(r4, src[..., None], axis=3)
        n_adm = scal[:, :, 0, :T, 0].astype(I32)
        valid = kk[None, None, None, :] < n_adm[..., None]
        return jnp.where(valid[..., None], out, 0.0)

    dt, packed_rc = timeit(jax.jit(rowcount_part), recs, scal)
    a = np.asarray(packed_sc)
    b = np.asarray(packed_rc)
    # the old path zeroes entries past rank K too; compare on the valid
    # region only (both are masked by keep downstream)
    same_rc = np.array_equal(a, b)
    print(f"unpack rowcount variant:  {dt*1e3:7.1f} ms "
          f"(match={same_rc})", flush=True)

    try:
        dt, packed_ga = timeit(jax.jit(gather_part), r4, written, rank)
        a = np.asarray(packed_sc)
        b = np.asarray(packed_ga)
        same = np.array_equal(np.nan_to_num(a), np.nan_to_num(b))
        print(f"unpack gather variant:    {dt*1e3:7.1f} ms "
              f"(match={same})", flush=True)
    except Exception as e:
        print(f"unpack gather variant failed: {type(e).__name__}: {e}",
              flush=True)

    # ---- slot kernel RAW + reconstruct pieces ----
    n_adm = scal[:, :, 0, :T, 0].astype(I32)
    keep = jnp.arange(K)[None, None, None, :] < n_adm[..., None]
    tr_s = jnp.where(keep, packed_sc[..., 0].astype(I32), jnp.int32(2 ** 30))
    tr_t = jnp.where(keep, packed_sc[..., 1], 0.0)
    if Kp != K:
        tr_s = jnp.pad(tr_s, ((0, 0),) * 3 + ((0, Kp - K),),
                       constant_values=2 ** 30)
        tr_t = jnp.pad(tr_t, ((0, 0),) * 3 + ((0, Kp - K),))

    clk_ws = tuple(float(p.clk_window) for p in sets)
    clk_as = tuple(float(p.clk_alpha) for p in sets)
    padjs = tuple(float(p.pulse_adj) for p in sets)
    mbs = tuple(float(p.midbit) for p in sets)
    f_slot = jax.jit(functools.partial(
        psl.nrzi_slot_scan_pallas, S=S, T=T, Kp=Kp, max_slots=max_slots,
        spb_i=spb_f, clk_windows=clk_ws, clk_alphas=clk_as,
        pulse_adjs=padjs, midbits=mbs))
    dt, (stream, tbk, scal2) = timeit(f_slot, tr_s, tr_t,
                                      n_adm)
    print(f"slot kernel RAW:          {dt*1e3:7.1f} ms", flush=True)

    # reconstruct: full
    def recon(strm, tbb, scl, cnt, ts0):
        st = psl.slot_stream_reconstruct(
            strm, tbb, scl, T=T, S=S, maxb=maxb, spb=spb_f,
            stat_leftbin=lbj, stat_binwidth=bwj, first_k=jnp.argmin(ts0))
        r = nrzi_mod.nrzi_finish(st, T, jnp.int32(1), jnp.int32(0), maxb)
        r["end_s"] = st["end_s"]
        return r

    f_rec = jax.jit(lambda s_, t_, c_, n_, s0: jax.vmap(jax.vmap(
        recon))(s_, t_, c_, n_, s0))
    dt, _ = timeit(f_rec, stream, tbk, scal2, n_adm, tr_s[:, :, :, 0])
    print(f"reconstruct+finish FULL:  {dt*1e3:7.1f} ms", flush=True)

    # reconstruct: scatter-max replay alone
    nsl = stream.shape[2]
    nch = tbk.shape[2]
    CH, Fd = psl.CH, psl.F

    def replay_only(strm, tbb):
        tbt = tbb.reshape(nch, 16, CH, Fd).transpose(0, 2, 1, 3) \
                 .reshape(nsl, 16, Fd)[:, :T, :]
        n1 = tbt[:, :, psl.TB_N1].astype(I32)
        n2 = tbt[:, :, psl.TB_N2].astype(I32)
        act = tbt[:, :, psl.TB_ACT].astype(I32)
        dup, later, zero = act == 1, act == 2, act == 3
        ncons = n1 + n2
        delta = (ncons - dup.astype(I32) + later.astype(I32)
                 + zero.astype(I32))
        dc_b4 = jnp.cumsum(delta, axis=0) - delta
        dca = dc_b4 + ncons - dup.astype(I32)
        j3 = jnp.arange(3)[None, None, :]
        has1 = j3 < jnp.minimum(n1, 3)[:, :, None]
        has2 = j3 < jnp.minimum(n2, 3)[:, :, None]
        wr1 = jnp.where(has1, dc_b4[:, :, None] + j3, maxb)
        wr2 = jnp.where(has2, dc_b4[:, :, None] + n1[:, :, None] + j3, maxb)
        i0 = jnp.where(later, jnp.maximum(dca - 1, 0), maxb)
        i1 = jnp.where(later, jnp.minimum(dca, maxb - 1), maxb)
        dcb = dca + later.astype(I32)
        i2 = jnp.where(zero, jnp.minimum(dcb, maxb - 1), maxb)
        wr = jnp.concatenate([wr1, wr2, i0[:, :, None], i1[:, :, None],
                              i2[:, :, None]], axis=2)
        slot_i = jnp.arange(nsl, dtype=I32)
        op_val = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 1, 0], I32)
        key = ((slot_i[:, None, None] * 16 + jnp.arange(9, dtype=I32)) * 2
               + op_val)
        trkb = jnp.broadcast_to(jnp.arange(T)[None, :, None], (nsl, T, 9))
        packed = jnp.full((T, maxb), -1, I32).at[trkb, wr].max(
            jnp.broadcast_to(key, (nsl, T, 9)), mode="drop")
        return packed

    f_rep = jax.jit(lambda s_, t_: jax.vmap(jax.vmap(replay_only))(s_, t_))
    dt, ref_packed = timeit(f_rep, stream, tbk)
    print(f"  replay scatter-max:     {dt*1e3:7.1f} ms", flush=True)

    # compacted replay: per (slot, op-group) the real writes are DENSE, so
    # row-compaction shrinks the scatter from nsl*9 to ~#real updates
    Kw = -(-min(maxb + 640, nsl * 9) // 128) * 128

    def replay_compact(strm, tbb):
        tbt = tbb.reshape(nch, 16, CH, Fd).transpose(0, 2, 1, 3) \
                 .reshape(nsl, 16, Fd)[:, :T, :]
        n1 = tbt[:, :, psl.TB_N1].astype(I32)
        n2 = tbt[:, :, psl.TB_N2].astype(I32)
        act = tbt[:, :, psl.TB_ACT].astype(I32)
        dup, later, zero = act == 1, act == 2, act == 3
        ncons = n1 + n2
        delta = (ncons - dup.astype(I32) + later.astype(I32)
                 + zero.astype(I32))
        dc_b4 = jnp.cumsum(delta, axis=0) - delta
        dca = dc_b4 + ncons - dup.astype(I32)
        m1 = jnp.minimum(n1, 3)
        m2 = jnp.minimum(n2, 3)
        # group sizes per (slot, track): [m1, m2, 2*later, zero]
        gsz = jnp.stack([m1, m2, 2 * later.astype(I32),
                         zero.astype(I32)], axis=1)      # [nsl, 4, T]
        gflat = gsz.transpose(2, 0, 1).reshape(T, nsl * 4)
        o = jnp.cumsum(gflat, axis=-1)                   # [T, nsl*4]
        total = o[:, -1]
        marks = jnp.zeros((T, Kw + 1), I32)
        ti = jnp.arange(T)[:, None]
        marks = marks.at[ti, jnp.minimum(o, Kw)].add(1, mode="drop")
        g_of_k = jnp.minimum(jnp.cumsum(marks[:, :Kw], axis=-1),
                             nsl * 4 - 1)                # [T, Kw]
        start = jnp.take_along_axis(o - gflat, g_of_k, axis=-1)
        kk = jnp.arange(Kw, dtype=I32)
        j = kk[None, :] - start
        slot_k = g_of_k // 4
        grp = g_of_k % 4
        # write index + key per (group, j)
        def at_slot(x):                                  # [nsl, T] -> [T, Kw]
            return jnp.take_along_axis(x.T, slot_k, axis=-1)
        dcb4_k = at_slot(dc_b4)
        n1_k = at_slot(m1)
        dca_k = at_slot(dca)
        wr_k = jnp.where(grp == 0, dcb4_k + j,
                jnp.where(grp == 1, dcb4_k + n1_k + j,
                 jnp.where(grp == 2,
                           jnp.where(j == 0, jnp.maximum(dca_k - 1, 0),
                                     jnp.minimum(dca_k, maxb - 1)),
                           jnp.minimum(dca_k, maxb - 1))))
        wr_k = jnp.minimum(wr_k, maxb - 1)
        op = jnp.where(grp == 0, j, jnp.where(grp == 1, 3 + j,
                       jnp.where(grp == 2, 6 + j, 8)))
        val = jnp.where((op == 6) | (op == 8), 0, 1)
        key = (slot_k * 16 + op) * 2 + val
        valid = kk[None, :] < total[:, None]
        wr_k = jnp.where(valid, wr_k, maxb)
        packed = jnp.full((T, maxb), -1, I32).at[
            jnp.broadcast_to(ti, (T, Kw)), wr_k].max(key, mode="drop")
        return packed

    f_repc = jax.jit(lambda s_, t_: jax.vmap(jax.vmap(replay_compact))(
        s_, t_))
    dt, got_packed = timeit(f_repc, stream, tbk)
    rp, gp = np.asarray(ref_packed), np.asarray(got_packed)
    same = np.array_equal(np.where(rp >= 0, rp & 1, -1),
                          np.where(gp >= 0, gp & 1, -1))
    print(f"  replay compacted:       {dt*1e3:7.1f} ms "
          f"(bits match={same})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
