#!/usr/bin/env python3
"""Stage timing of the PRODUCTION phase-1 NRZI group (Pallas kernels) at
bench shapes: prep front-end, admission kernel + unpack, slot kernel,
reconstruct + finish. Each prefix is jitted separately so the deltas
attribute device time per stage (XLA may fuse differently per prefix;
treat deltas as approximate).

    python scripts/profile_prod.py [B] [S] [P]
"""

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
from readtape_tpu.decode import nrzi as nrzi_mod
from readtape_tpu.decode import pallas_slot as psl
from readtape_tpu.decode import trackscan
from readtape_tpu.decode.common import F32, I32
from readtape_tpu.decode.pipeline import (_mask_jump_table,
                                          _nrzi_segment_pallas_finals,
                                          _prep_volts, _union_jump_table)
from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.parms import builtin_parmsets
from readtape_tpu.synth import default_spec, synthesize_tape


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    T = 9
    print(f"# devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(7)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.005, start_gap_secs=0.002)
    blk = bytes(rng.integers(0, 256, 1200, dtype=np.uint8))
    hdr, samples = synthesize_tape(spec, [("block", blk)])
    seg_np = samples[:S].T.astype(np.int16)
    if seg_np.shape[1] < S:
        seg_np = np.pad(seg_np, ((0, 0), (0, S - seg_np.shape[1])))
    tape = jnp.asarray(np.tile(seg_np, (1, B)))          # [T, B*S]
    off = jnp.arange(B, dtype=I32) * S
    lens = jnp.full(B, S, I32)
    leads = jnp.zeros(B, I32)

    ps = builtin_parmsets(tb.MODE_NRZI)
    sets = ps.sets[:P]
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (800 * 50 * deltat)
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 800, 50, deltat)
               for p in sets)
    K = int(S / spb * 2.5) + 64
    maxb = int(S / spb * 1.3) + 64
    max_slots = int(S / spb * 1.25) + 48
    print(f"# B={B} T={T} S={S} P={P} Ws={sorted(set(Ws))} K={K} "
          f"maxb={maxb} max_slots={max_slots}", flush=True)

    maxvolts = jnp.float32(hdr.maxvolts)
    invert = jnp.float32(1.0)
    skew = jnp.zeros(T, I32)
    rise_floor = jnp.full(T, 0.02, F32)
    min_floor = jnp.full(T, 0.0, F32)
    lb, bw = jnp.float32(0.0), jnp.float32(1.0)

    rises = tuple(float(p.pkww_rise) for p in sets)
    minps = tuple(float(p.min_peak) for p in sets)
    aalphas = tuple(float(p.agc_alpha) for p in sets)
    awindows = tuple(int(p.agc_window) for p in sets)
    clk_ws = tuple(int(p.clk_window) for p in sets)
    clk_as = tuple(float(p.clk_alpha) for p in sets)
    padjs = tuple(float(p.pulse_adj) for p in sets)
    mbs = tuple(float(p.midbit) for p in sets)
    wset = sorted(set(Ws))

    def prep(o, ln, ld):
        v_i16 = jax.lax.dynamic_slice(tape, (0, o), (T, S))
        v = _prep_volts(v_i16, maxvolts, invert, skew, S=S, T=T,
                        differentiate=False, spb_int=int(spb))
        nxt = _mask_jump_table(
            _union_jump_table(v, Ws, rise_floor, min_floor), ln, ld, S)
        return _nrzi_segment_pallas_finals(v, nxt, Ws=Ws)

    @jax.jit
    def f_prep(off, lens, leads):
        return jax.vmap(prep)(off, lens, leads)

    dt, feat = timeit(f_prep, off, lens, leads)
    print(f"prep front-end:        {dt*1e3:7.1f} ms", flush=True)

    from readtape_tpu.decode.pallas_scan import (
        nrzi_track_scan_pallas, nrzi_track_scan_pallas_tracks)
    kernel = (nrzi_track_scan_pallas_tracks if len(wset) == 1
              else nrzi_track_scan_pallas)

    @jax.jit
    def f_adm(feat):
        return kernel(feat, S=S, K=K, Ws=Ws, rises=rises, minps=minps,
                      aalphas=aalphas, awindows=awindows,
                      groups=tuple(wset.index(w) for w in Ws))

    dt, finals = timeit(f_adm, feat)
    print(f"admission kernel+unpack:{dt*1e3:6.1f} ms", flush=True)

    K_ = finals["tr_s"].shape[3]
    Kp = -(-K_ // 128) * 128

    @jax.jit
    def f_slot(finals):
        tr_s, tr_t = finals["tr_s"], finals["tr_t"]
        if Kp != K_:
            pad = ((0, 0), (0, 0), (0, 0), (0, Kp - K_))
            tr_s = jnp.pad(tr_s, pad, constant_values=trackscan.BIG_S)
            tr_t = jnp.pad(tr_t, pad)
        return psl.nrzi_slot_scan_pallas(
            tr_s, tr_t, finals["n_admitted"], S=S, T=T, Kp=Kp,
            max_slots=max_slots, spb_i=float(spb), clk_windows=clk_ws,
            clk_alphas=clk_as, pulse_adjs=padjs, midbits=mbs)

    dt, (stream, tbk, scal) = timeit(f_slot, finals)
    print(f"slot kernel:           {dt*1e3:7.1f} ms", flush=True)

    @jax.jit
    def f_recon(stream, tbk, scal, finals):
        def lane(strm, tbb, scl, cnt):
            st = psl.slot_stream_reconstruct(
                strm, tbb, scl, T=T, S=S, maxb=maxb, spb=float(spb),
                stat_leftbin=lb, stat_binwidth=bw)
            r = nrzi_mod.nrzi_finish(st, T, jnp.int32(1), jnp.int32(0),
                                     maxb)
            r["end_s"] = st["end_s"]
            r["unconsumed"] = jnp.sum(jnp.maximum(cnt - st["kvis"], 0))
            return r
        return jax.vmap(jax.vmap(lane))(stream, tbk, scal,
                                        finals["n_admitted"])

    dt, res = timeit(f_recon, stream, tbk, scal, finals)
    print(f"reconstruct+finish:    {dt*1e3:7.1f} ms", flush=True)
    print(f"# sanity: blktype={np.asarray(res['blktype'])[0, 0]} "
          f"minbits={np.asarray(res['minbits'])[0, 0]} "
          f"dc={np.asarray(res['databytes'])[0, 0] if 'databytes' in res else '?'}",
          flush=True)


if __name__ == "__main__":
    main()
