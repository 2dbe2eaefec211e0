#!/usr/bin/env python3
"""Hardware check of the v2 Pallas admission kernel: exact-match vs the XLA
jump scan on the real TPU, then a timing comparison at bench shapes.

    python scripts/pallas_v2_check.py [B] [S] [P]
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
from readtape_tpu.decode import trackscan as ts
from readtape_tpu.decode.common import F32, I32
from readtape_tpu.decode.pallas_scan import nrzi_track_scan_pallas
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    print(f"# devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(5)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.005, start_gap_secs=0.002)
    blk = bytes(rng.integers(0, 256, 1200, dtype=np.uint8))
    hdr, samples = synthesize_tape(spec, [("block", blk)])
    seg = samples[:S].T.astype(np.float32) * (hdr.maxvolts / 32767.0)
    if seg.shape[1] < S:
        seg = np.pad(seg, ((0, 0), (0, S - seg.shape[1])))
    T = seg.shape[0]
    v = jnp.asarray(np.broadcast_to(seg, (B, T, S)).copy())

    ps = builtin_parmsets(tb.MODE_NRZI)
    sets = ps.sets[:P]
    deltat = hdr.tdelta_ns * 1e-9
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 800, 50, deltat)
               for p in sets)
    rises = tuple(p.pkww_rise for p in sets)
    minps = tuple(p.min_peak for p in sets)
    aalphas = tuple(p.agc_alpha for p in sets)
    awindows = tuple(p.agc_window for p in sets)
    wset = sorted(set(Ws))
    groups = tuple(wset.index(w) for w in Ws)
    G = len(wset)
    K = int(S / 20 * 2.5) + 64
    print(f"# B={B} T={T} S={S} P={P} G={G} Ws={Ws} K={K}", flush=True)

    rise_floor = jnp.full(T, 0.02, F32)
    min_floor = jnp.full(T, 0.0, F32)

    @jax.jit
    def front(v):
        def per_seg(vb):
            nxt = None
            for W in wset:
                t_ = ts.loose_jump_table(vb, W, rise_floor, min_floor)
                nxt = t_ if nxt is None else jnp.minimum(nxt, t_)
            nxt = jnp.where(nxt < S - 256, nxt, S)       # tail mask
            return nxt, jnp.stack(
                [ts.precompute_window_features(vb, W, nxt) for W in wset])
        nxt, feat = jax.vmap(per_seg)(v)
        return nxt, feat

    dtf, (nxt, feat) = timeit(front, v)
    print(f"front-end: {dtf*1e3:.1f} ms", flush=True)

    # ---- pallas kernel ----
    def pk(feat):
        return nrzi_track_scan_pallas(
            feat, S=S, K=K, Ws=Ws, rises=rises, minps=minps,
            aalphas=aalphas, awindows=awindows, groups=groups)
    t0 = time.perf_counter()
    try:
        dtp, got = timeit(pk, feat)
    except Exception as e:
        print(f"PALLAS COMPILE/RUN FAILED: {type(e).__name__}: {e}")
        return 1
    print(f"pallas track scan: {dtp*1e3:.1f} ms "
          f"(first call {time.perf_counter()-t0:.1f}s)", flush=True)

    # ---- XLA reference ----
    @jax.jit
    def xla(feat, nxt):
        outs = []
        for wi, Wd in enumerate(wset):
            idxs = [i for i, w in enumerate(Ws) if w == Wd]
            sel = jnp.asarray(idxs, jnp.int32)
            pa_r = jnp.asarray(rises, F32)[sel]
            pa_m = jnp.asarray(minps, F32)[sel]
            pa_a = jnp.asarray(aalphas, F32)[sel]
            pa_w = jnp.asarray(awindows, I32)[sel]
            lane = jax.vmap(lambda ft, nx, r, m, a, w, _W=Wd:
                            ts.nrzi_track_scan_pre(ft, nx, _W, S, S, K,
                                                   r, m, a, w),
                            in_axes=(0, 0) + (None,) * 4)
            grp = jax.vmap(lambda r, m, a, w: jax.vmap(
                lambda f1, n1: lane(f1, n1, r, m, a, w))(feat[:, wi], nxt))(
                    pa_r, pa_m, pa_a, pa_w)
            outs.append(grp)
        order = [i for Wd in wset for i, w in enumerate(Ws) if w == Wd]
        inv = jnp.asarray(np.argsort(order), I32)
        fin = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0)[inv],
                           *outs)
        return fin

    dtx, ref = timeit(xla, feat, nxt)
    print(f"xla track scan:    {dtx*1e3:.1f} ms  "
          f"(speedup {dtx/dtp:.1f}x)", flush=True)

    # ---- exact comparison ----
    ref = jax.tree.map(np.asarray, ref)
    got = {k: np.asarray(x) for k, x in got.items()}
    n_ref = ref["n_admitted"].transpose(1, 0, 2)         # [P,B,T]->[B,P,T]
    ok = True
    if not (got["n_admitted"] == n_ref).all():
        print("n_admitted MISMATCH", got["n_admitted"].sum(), n_ref.sum())
        ok = False
    for k, rk in (("tr_s", "tr_s"), ("tr_t", "tr_t"), ("tr_agc", "tr_agc"),
                  ("tr_top", "tr_top")):
        r = ref[rk].transpose(1, 0, 2, 3)
        nmin = np.minimum(got["n_admitted"], n_ref)
        for b in range(B):
            for p in range(P):
                for t in range(T):
                    m = nmin[b, p, t]
                    if not np.array_equal(got[k][b, p, t][:m],
                                          r[b, p, t][:m]):
                        bad = np.nonzero(got[k][b, p, t][:m] !=
                                         r[b, p, t][:m])[0][:5]
                        print(f"{k} mismatch lane b{b} p{p} t{t} at {bad}: "
                              f"{got[k][b,p,t][bad]} vs {r[b,p,t][bad]}")
                        ok = False
                        break
                if not ok:
                    break
            if not ok:
                break
    print("EXACT MATCH" if ok else "MISMATCH -- do not enable")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
