#!/usr/bin/env python3
"""Decompose one NRZI segment-batch device call (_nrzi_group_pallas) into
stages at bench shapes, timed on the real TPU:

  prep (volts + jump table + window features)
  admission kernel (Mosaic)
  unpack/compaction (XLA)
  slot kernel (Mosaic)
  reconstruct + finish (XLA)
  full group call (everything fused in one executable)
  full call + packed-result fetch

    python scripts/profile_group.py [B] [P] [S]
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
from readtape_tpu.decode.common import F32, I32
from readtape_tpu.decode.pipeline import (_mask_jump_table, _prep_volts,
                                          _union_jump_table,
                                          _nrzi_segment_pallas_finals,
                                          _peakstat_bins, ParmArrays)
from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.parms import builtin_parmsets
from readtape_tpu.synth import default_spec, synthesize_tape


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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 32768
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
    pa = jax.tree.map(lambda a: a[:P], ParmArrays.from_parmsets(pms))
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (800 * 50 * deltat)
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 800, 50, deltat)
               for p in sets)
    K = int(S / spb * 2.5) + 64
    Kp = -(-K // 128) * 128
    maxb = int(S / spb) + 64
    max_slots = int(S / spb * 1.5) + 64
    lb, bw = _peakstat_bins(tb.MODE_NRZI, 1.0 / (800 * 50))
    lbj = jnp.float32(lb / deltat)
    bwj = jnp.float32(bw / deltat)
    print(f"# B={B} S={S} P={P} Ws={sorted(set(Ws))} K={K} maxb={maxb} "
          f"max_slots={max_slots}", flush=True)

    maxvolts = jnp.float32(hdr.maxvolts)
    skew = jnp.zeros(T, I32)
    rise_floor = jnp.full(T, min(p.pkww_rise for p in sets) * 0.4, F32)
    min_floor = jnp.full(T, 0.0, F32)
    spb_f = float(spb)

    # ---- stage 1: prep ----
    def prep(o, ln, ld):
        v_i16 = jax.lax.dynamic_slice(tape, (0, o), (T, S))
        v = _prep_volts(v_i16, maxvolts, jnp.float32(1.0), skew, S=S, T=T,
                        differentiate=False, spb_int=int(spb))
        nxt = _mask_jump_table(
            _union_jump_table(v, Ws, rise_floor, min_floor), ln, ld, S)
        return _nrzi_segment_pallas_finals(v, nxt, Ws=Ws)

    f_prep = jax.jit(lambda o, l, d: jax.vmap(prep)(o, l, d))
    dt, feat = timeit(f_prep, off, lens, leads)
    print(f"prep:               {dt*1e3:7.1f} ms", flush=True)

    # ---- stage 2: admission kernel (+unpack together, then split) ----
    rises = tuple(float(p.pkww_rise) for p in sets)
    minps = tuple(float(p.min_peak) for p in sets)
    aalphas = tuple(float(p.agc_alpha) for p in sets)
    awindows = tuple(int(p.agc_window) for p in sets)
    wset = sorted(set(Ws))
    single_w = len(wset) == 1
    kernel = (ps.nrzi_track_scan_pallas_tracks if single_w
              else ps.nrzi_track_scan_pallas)
    f_adm = jax.jit(functools.partial(
        kernel, S=S, K=K, Ws=Ws, rises=rises, minps=minps,
        aalphas=aalphas, awindows=awindows,
        groups=tuple(wset.index(w) for w in Ws)))
    dt, finals = timeit(f_adm, feat)
    print(f"admission+unpack:   {dt*1e3:7.1f} ms", flush=True)

    # ---- stage 3: slot kernel ----
    clk_ws = tuple(float(p.clk_window) for p in sets)
    clk_as = tuple(float(p.clk_alpha) for p in sets)
    padjs = tuple(float(p.pulse_adj) for p in sets)
    mbs = tuple(float(p.midbit) for p in sets)

    def pad_tr(finals):
        tr_s, tr_t = finals["tr_s"], finals["tr_t"]
        K_ = tr_s.shape[3]
        if Kp != K_:
            pad = ((0, 0), (0, 0), (0, 0), (0, Kp - K_))
            tr_s = jnp.pad(tr_s, pad, constant_values=2 ** 30)
            tr_t = jnp.pad(tr_t, pad)
        return tr_s, tr_t

    f_slot = jax.jit(lambda fin: psl.nrzi_slot_scan_pallas(
        *pad_tr(fin), fin["n_admitted"], S=S, T=T, Kp=Kp,
        max_slots=max_slots, spb_i=spb_f, clk_windows=clk_ws,
        clk_alphas=clk_as, pulse_adjs=padjs, midbits=mbs))
    dt, (stream, tbk, scal) = timeit(f_slot, finals)
    print(f"slot kernel:        {dt*1e3:7.1f} ms", flush=True)

    # ---- stage 4: reconstruct + finish ----
    def slot_lane(strm, tbb, scl, cnt, ts0):
        st = psl.slot_stream_reconstruct(
            strm, tbb, scl, T=T, S=S, maxb=maxb, spb=spb_f,
            stat_leftbin=lbj, stat_binwidth=bwj, first_k=jnp.argmin(ts0))
        r = nrzi_mod.nrzi_finish(st, T, jnp.int32(1), jnp.int32(0), maxb)
        r["end_s"] = st["end_s"]
        r["unconsumed"] = jnp.sum(jnp.maximum(cnt - st["kvis"], 0))
        return r

    f_rec = jax.jit(lambda stream, tbk, scal, fin: jax.vmap(jax.vmap(
        slot_lane))(stream, tbk, scal, fin["n_admitted"],
                    fin["tr_s"][:, :, :, 0]))
    dt, res = timeit(f_rec, stream, tbk, scal, finals)
    print(f"reconstruct+finish: {dt*1e3:7.1f} ms", flush=True)

    # ---- full group call via the production path ----
    from readtape_tpu.decode.pipeline import _nrzi_group_pallas
    knobs = (tuple(zip(rises, minps, aalphas, awindows)),
             (spb_f, clk_ws, clk_as, padjs, mbs))
    f_full = jax.jit(functools.partial(
        _nrzi_group_pallas, S=S, T=T, P=P, nsteps=0, K=K, maxb=maxb,
        max_slots=max_slots, Ws=Ws, knobs=knobs, do_correct=False,
        differentiate=False, spb_int=int(spb), clk_ring=50, agc_ring=10))
    args = (tape, off, lens, leads, maxvolts, jnp.float32(1.0), skew, pa,
            jnp.float32(spb), jnp.int32(1), jnp.int32(0), rise_floor,
            min_floor, lbj, bwj)
    dt, out = timeit(f_full, *args)
    print(f"FULL group call:    {dt*1e3:7.1f} ms", flush=True)
    tot = B * S / 1e6
    print(f"  -> {tot / dt:7.2f} Msamples/s device-resident "
          f"({tot:.2f} Ms per call)", flush=True)
    nblk = int(np.sum(np.asarray(out['blktype']) == nrzi_mod.BS_BLOCK))
    print(f"  sanity: {nblk} data blocks decoded", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
