#!/usr/bin/env python3
"""Decompose 'admission kernel+unpack': the Mosaic kernel alone vs the XLA
record compaction, at bench shapes.

    python scripts/profile_adm.py [B] [S] [P]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from readtape_tpu.decode import common as cm
from readtape_tpu.decode import pallas_scan as ps
from readtape_tpu.decode import trackscan
from readtape_tpu.decode.common import F32, I32
from readtape_tpu.decode.pipeline import (_mask_jump_table, _prep_volts,
                                          _union_jump_table,
                                          _nrzi_segment_pallas_finals)
from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.parms import builtin_parmsets
from readtape_tpu.synth import default_spec, synthesize_tape


def timeit(fn, *args, reps=5):
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
    tape = jnp.asarray(np.tile(seg_np, (1, B)))
    off = jnp.arange(B, dtype=I32) * S
    lens = jnp.full(B, S, I32)
    leads = jnp.zeros(B, I32)

    sets = builtin_parmsets(tb.MODE_NRZI).sets[:P]
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (800 * 50 * deltat)
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 800, 50, deltat)
               for p in sets)
    K = int(S / spb * 2.5) + 64
    print(f"# B={B} S={S} P={P} Ws={sorted(set(Ws))} K={K}", flush=True)

    maxvolts = jnp.float32(hdr.maxvolts)
    skew = jnp.zeros(T, I32)
    rise_floor = jnp.full(T, 0.02, F32)
    min_floor = jnp.full(T, 0.0, F32)

    def prep(o, ln, ld):
        v_i16 = jax.lax.dynamic_slice(tape, (0, o), (T, S))
        v = _prep_volts(v_i16, maxvolts, jnp.float32(1.0), skew, S=S, T=T,
                        differentiate=False, spb_int=int(spb))
        nxt = _mask_jump_table(
            _union_jump_table(v, Ws, rise_floor, min_floor), ln, ld, S)
        return _nrzi_segment_pallas_finals(v, nxt, Ws=Ws)

    feat = jax.block_until_ready(
        jax.jit(lambda o, l, d: jax.vmap(prep)(o, l, d))(off, lens, leads))

    rises = tuple(float(p.pkww_rise) for p in sets)
    minps = tuple(float(p.min_peak) for p in sets)
    aalphas = tuple(float(p.agc_alpha) for p in sets)
    awindows = tuple(int(p.agc_window) for p in sets)
    wset = sorted(set(Ws))
    assert len(wset) == 1

    # ---- kernel alone (raw recs/scal out) ----
    W = wset[0]
    SL = 16
    R = S // 128
    n_rblks = R // ps.RB
    A_MAX = min(32, 128 // (W + 1) + 2)
    ring = max(1, max(awindows))
    featp = jnp.pad(feat, ((0, 0), (0, 0), (0, SL - T), (0, 0), (0, 0)))
    kern = functools.partial(
        ps._kernel_tracks, P=P, T=T, SL=SL, S=S, W=W, rises=rises,
        minps=minps, aalphas=aalphas, awindows=awindows, A_MAX=A_MAX,
        K=K, ring=ring)
    NF = len(ps.F_FIELDS) + ring

    @jax.jit
    def f_kernel(featp):
        return pl.pallas_call(
            kern,
            grid=(B * P, n_rblks),
            in_specs=[pl.BlockSpec((1, 1, SL, 12, ps.RB, 128),
                                   lambda i, r, P=P: (i // P, 0, 0, 0, r, 0))],
            out_specs=[
                pl.BlockSpec((1, 1, ps.RB, SL, 128),
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
        )(featp.reshape(B, 1, SL, 12, R, 128))

    dt, (recs, scal) = timeit(f_kernel, featp)
    print(f"kernel alone:       {dt*1e3:7.1f} ms", flush=True)

    # ---- unpack alone ----
    @jax.jit
    def f_unpack(recs, scal):
        r4 = recs.reshape(B, P, R, SL, 32, 4)[:, :, :, :T]
        r4 = r4.transpose(0, 1, 3, 2, 4, 5).reshape(B, P, T, R * 32, 4)
        written = r4[..., 0] >= 0.0
        rank = jnp.cumsum(written.astype(I32), axis=-1) - 1
        idx = jnp.where(written & (rank < K), rank, K)
        buf = jnp.zeros((B, P, T, K + 1, 4), F32)
        bi = jnp.arange(B)[:, None, None, None]
        pi = jnp.arange(P)[None, :, None, None]
        ti = jnp.arange(T)[None, None, :, None]
        packed = buf.at[bi, pi, ti, idx].set(r4, mode="drop")[..., :K, :]
        n_adm = scal[:, :, 0, :T, 0].astype(I32)
        keep = jnp.arange(K)[None, None, None, :] < n_adm[..., None]
        return (jnp.where(keep, packed[..., 0].astype(I32),
                          jnp.int32(2 ** 30)),
                jnp.where(keep, packed[..., 1], 0.0))

    dt, _ = timeit(f_unpack, recs, scal)
    print(f"unpack alone:       {dt*1e3:7.1f} ms", flush=True)

    # ---- unpack sub-stages ----
    @jax.jit
    def f_transpose(recs):
        r4 = recs.reshape(B, P, R, SL, 32, 4)[:, :, :, :T]
        return r4.transpose(0, 1, 3, 2, 4, 5).reshape(B, P, T, R * 32, 4)

    dt, r4 = timeit(f_transpose, recs)
    print(f"  transpose:        {dt*1e3:7.1f} ms", flush=True)

    @jax.jit
    def f_cumsum(r4):
        written = r4[..., 0] >= 0.0
        rank = jnp.cumsum(written.astype(I32), axis=-1) - 1
        return jnp.where(written & (rank < K), rank, K)

    dt, idx = timeit(f_cumsum, r4)
    print(f"  cumsum+mask:      {dt*1e3:7.1f} ms", flush=True)

    @jax.jit
    def f_scatter(r4, idx):
        buf = jnp.zeros((B, P, T, K + 1, 4), F32)
        bi = jnp.arange(B)[:, None, None, None]
        pi = jnp.arange(P)[None, :, None, None]
        ti = jnp.arange(T)[None, None, :, None]
        return buf.at[bi, pi, ti, idx].set(r4, mode="drop")[..., :K, :]

    dt, _ = timeit(f_scatter, r4, idx)
    print(f"  scatter:          {dt*1e3:7.1f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
