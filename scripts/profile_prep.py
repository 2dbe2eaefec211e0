#!/usr/bin/env python3
"""Decompose the group call's prep stage (volts + jump table + window
features) at bench shapes on the real TPU.

    python scripts/profile_prep.py [B] [S]
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
from readtape_tpu.decode import trackscan
from readtape_tpu.decode.common import F32, I32
from readtape_tpu.decode.pipeline import (_mask_jump_table, _prep_volts,
                                          _union_jump_table,
                                          _nrzi_segment_pallas_finals)
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
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
    sets = pms.sets[:1]
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (800 * 50 * deltat)
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 800, 50, deltat)
               for p in sets)
    print(f"# B={B} S={S} Ws={sorted(set(Ws))}", flush=True)

    maxvolts = jnp.float32(hdr.maxvolts)
    skew = jnp.zeros(T, I32)
    rise_floor = jnp.full(T, min(p.pkww_rise for p in sets) * 0.4, F32)
    min_floor = jnp.full(T, 0.0, F32)

    def volts(o):
        v_i16 = jax.lax.dynamic_slice(tape, (0, o), (T, S))
        return _prep_volts(v_i16, maxvolts, jnp.float32(1.0), skew,
                           S=S, T=T, differentiate=False, spb_int=int(spb))

    f_volts = jax.jit(lambda o: jax.vmap(volts)(o))
    dt, v = timeit(f_volts, off)
    print(f"volts (i16->f32 + deskew): {dt*1e3:7.1f} ms", flush=True)

    f_jump = jax.jit(lambda v: jax.vmap(
        lambda vv: _union_jump_table(vv, Ws, rise_floor, min_floor))(v))
    dt, nxt = timeit(f_jump, v)
    print(f"union jump table:          {dt*1e3:7.1f} ms", flush=True)

    f_mask = jax.jit(lambda n, l, d: jax.vmap(
        lambda nn, ll, dd: _mask_jump_table(nn, ll, dd, S))(n, l, d))
    dt, nxtm = timeit(f_mask, nxt, lens, leads)
    print(f"mask jump table:           {dt*1e3:7.1f} ms", flush=True)

    f_feat = jax.jit(lambda v, n: jax.vmap(
        lambda vv, nn: _nrzi_segment_pallas_finals(vv, nn, Ws=Ws))(v, n))
    dt, feat = timeit(f_feat, v, nxtm)
    print(f"window features:           {dt*1e3:7.1f} ms", flush=True)

    # the whole prep fused in one jit (what the group call runs)
    def prep(o, ln, ld):
        vv = volts(o)
        nn = _mask_jump_table(
            _union_jump_table(vv, Ws, rise_floor, min_floor), ln, ld, S)
        return _nrzi_segment_pallas_finals(vv, nn, Ws=Ws)

    f_prep = jax.jit(lambda o, l, d: jax.vmap(prep)(o, l, d))
    dt, feat = timeit(f_prep, off, lens, leads)
    print(f"FULL prep (fused):         {dt*1e3:7.1f} ms", flush=True)

    # candidate-mask-only variant: features + loose mask, no jump table
    from readtape_tpu.decode import stage1

    def prep2(o, ln, ld):
        vv = volts(o)
        W = Ws[0]
        wmax, wmin = stage1.window_minmax(vv, W)
        v_left = stage1.left_edge_values(vv, W)
        loose = stage1.candidate_mask(vv, wmax, wmin, v_left,
                                      rise_floor, min_floor)
        iota = jnp.arange(S, dtype=I32)[None, :]
        loose = loose & (iota >= ld) & (iota < ln)
        pack = trackscan.precompute_window_features(vv, W)
        enc = jnp.where(loose, iota, S)
        encf = jax.lax.bitcast_convert_type(
            enc + trackscan._BITS_BIAS, jnp.float32)
        return jnp.concatenate(
            [pack, jnp.broadcast_to(encf[:, None, :], (T, 2, S))], axis=1)

    f_prep2 = jax.jit(lambda o, l, d: jax.vmap(prep2)(o, l, d)[:, None])
    dt, feat2 = timeit(f_prep2, off, lens, leads)
    print(f"prep v2 (mask, no jump):   {dt*1e3:7.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
