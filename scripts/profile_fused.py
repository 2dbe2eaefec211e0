#!/usr/bin/env python3
"""Bisect the fused NRZI kernel on the real TPU at bench shapes:

    full kernel  |  no_slots (admission+features only)  |  no_commit
    (features+eligibility only)

Distinct volts per rep (the axon relay dedup-caches identical
program+data calls). Prints per-variant best/median wall times.

    python scripts/profile_fused.py [B] [S] [P] [reps]
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
from readtape_tpu.decode import pallas_fused as pf
from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.parms import builtin_parmsets
from readtape_tpu.synth import default_spec, synthesize_tape


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    T = 9
    print(f"# devices: {jax.devices()}  B={B} S={S} P={P}", flush=True)

    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.005, start_gap_secs=0.002)
    deltat = spec.deltat
    spb = 1.0 / (800 * 50 * deltat)
    sets = builtin_parmsets(tb.MODE_NRZI).sets[:P]
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 800, 50, deltat)
               for p in sets)
    maxb = int(S / spb * 1.3) + 64
    max_slots = int(S / spb * 1.25) + 48
    agc_ring = max(max(p.agc_window for p in sets), 1)

    def make_volts(seed):
        rng = np.random.default_rng(seed)
        blk = bytes(rng.integers(0, 256, 1200, dtype=np.uint8))
        hdr, samples = synthesize_tape(
            __import__("dataclasses").replace(spec, seed=seed),
            [("block", blk)])
        seg = samples[:S].T.astype(np.float32) * (hdr.maxvolts / 32767.0)
        if seg.shape[1] < S:
            seg = np.pad(seg, ((0, 0), (0, S - seg.shape[1])))
        v = np.zeros((B, 16, S), np.float32)
        for b in range(B):
            v[b, :T] = np.roll(seg, b * 37, axis=1)
        return jnp.asarray(v)

    meta = np.zeros((B, 16, 128), np.float32)
    meta[:, :, pf.M_SEGLEN] = S
    meta[:, :, pf.M_STATLB] = 0.0
    meta[:, :, pf.M_STATBW] = 1.0
    meta[:, :, pf.M_EXPPAR] = 1
    meta[:, :T, pf.M_RISEF] = 0.02
    meta_j = jnp.asarray(meta)

    kw = dict(S=S, T=T, P=P, maxb=maxb, max_slots=max_slots, Ws=Ws,
              rises=tuple(float(p.pkww_rise) for p in sets),
              minps=tuple(float(p.min_peak) for p in sets),
              aalphas=tuple(float(p.agc_alpha) for p in sets),
              awindows=tuple(int(p.agc_window) for p in sets),
              clk_windows=tuple(int(p.clk_window) for p in sets),
              clk_alphas=tuple(float(p.clk_alpha) for p in sets),
              pulse_adjs=tuple(float(p.pulse_adj) for p in sets),
              midbits=tuple(float(p.midbit) for p in sets),
              spb=float(spb), do_correct=False, agc_ring=agc_ring)

    tapes = [make_volts(100 + i) for i in range(reps + 1)]
    for name, extra in (("full", {}),
                        ("no_slots", {"no_slots": True}),
                        ("no_commit", {"no_slots": True,
                                       "no_commit": True})):
        fn = lambda v: pf.nrzi_fused_scan(v, meta_j, **kw, **extra)

        def run(v):
            # fetch the small scal plane: block_until_ready alone is NOT
            # a barrier through the axon relay (acks early)
            return np.asarray(fn(v)[2]).sum()

        t0 = time.perf_counter()
        run(tapes[0])
        compile_s = time.perf_counter() - t0
        walls = []
        for i in range(reps):
            t0 = time.perf_counter()
            run(tapes[1 + i])
            walls.append(time.perf_counter() - t0)
        walls.sort()
        msps = B * S / walls[len(walls) // 2] / 1e6
        print(f"{name:10s}: best {walls[0]*1e3:7.1f} ms  "
              f"median {walls[len(walls)//2]*1e3:7.1f} ms  "
              f"({msps:7.2f} Ms/s)  compile {compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    sys.exit(main())
