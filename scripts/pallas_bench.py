"""Time the Pallas NRZI admission kernel on the real TPU at bench shapes,
against the XLA track-scan timing from scripts/profile_nrzi.py."""

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
from readtape_tpu.decode import pallas_scan as psc
from readtape_tpu.decode import stage1
from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.parms import builtin_parmsets
from readtape_tpu.synth import default_spec, synthesize_tape


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    rng = np.random.default_rng(5)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.005, start_gap_secs=0.002)
    blk = bytes(rng.integers(0, 256, 1200, dtype=np.uint8))
    hdr, samples = synthesize_tape(spec, [("block", blk)])
    seg = samples[:S].T.astype(np.float32) * (hdr.maxvolts / 32767.0)
    if seg.shape[1] < S:
        seg = np.pad(seg, ((0, 0), (0, S - seg.shape[1])))
    T = seg.shape[0]
    v = jnp.asarray(np.broadcast_to(seg, (B, T, S)).copy())
    deltat = hdr.tdelta_ns * 1e-9

    ps = builtin_parmsets(tb.MODE_NRZI)
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 800, 50, deltat)
               for p in ps.sets)
    spb = 1 / (800 * 50 * deltat)
    K = int(S / spb * 2.5) + 64

    rise_floor = jnp.full(T, min(p.pkww_rise for p in ps.sets) / 2,
                          jnp.float32)
    min_floor = jnp.zeros(T, jnp.float32)

    @jax.jit
    def front(v):
        def one(vt):
            m = None
            for Wd in sorted(set(Ws)):
                wmax, wmin = stage1.window_minmax(vt, Wd)
                vl = stage1.left_edge_values(vt, Wd)
                mm = stage1.candidate_mask(vt, wmax, wmin, vl, rise_floor,
                                           min_floor)
                m = mm if m is None else (m | mm)
            return m
        return jax.vmap(one)(v)

    mask = front(v)
    counts = np.asarray(jnp.sum(mask, axis=2))
    Ccap = -(-(int(counts.max()) + 64) // 128) * 128
    print(f"# B={B} T={T} S={S} P={len(Ws)} Ws={sorted(set(Ws))} "
          f"K={K} Ccap={Ccap} cand_max={counts.max()}", flush=True)

    @jax.jit
    def compact(mask):
        return jax.vmap(lambda m: psc.union_candidates(m, Ccap))(mask)

    cand, ncand = compact(mask)

    def run():
        return psc.nrzi_track_scan_pallas(
            v, cand, ncand, S=S, Ccap=Ccap, K=K, Ws=Ws,
            rises=tuple(p.pkww_rise for p in ps.sets),
            minps=tuple(p.min_peak for p in ps.sets),
            aalphas=tuple(p.agc_alpha for p in ps.sets),
            awindows=tuple(p.agc_window for p in ps.sets))

    t0 = time.perf_counter()
    out = run()
    jax.block_until_ready(out)
    print(f"# compile+first run {time.perf_counter() - t0:.1f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    n = np.asarray(out["n_admitted"])
    print(f"pallas track scans ({B * T} instances x <= {Ccap} candidates): "
          f"{best * 1e3:.1f} ms", flush=True)
    print(f"# admitted p0: {n[0, 0]}", flush=True)


if __name__ == "__main__":
    main()
