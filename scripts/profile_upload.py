#!/usr/bin/env python3
"""Split the upload+activity wall into its parts: host 12-bit pack,
link transfer, and the device activity program, for both the packed and
raw int16 paths.

    python scripts/profile_upload.py
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

from readtape_tpu import native
from readtape_tpu.decode import segment as seg
from readtape_tpu.formats import tbin as tb
from readtape_tpu.synth import default_spec, synthesize_tape


def timeit(label, fn, reps=3):
    best = None
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out) if hasattr(out, "block_until_ready") or \
            isinstance(out, (jax.Array, tuple, list)) else None
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:40s} {best*1e3:9.1f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(7)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.005, start_gap_secs=0.005)
    items = []
    for _ in range(160):
        items.append(("block",
                      bytes(rng.integers(0, 256, 1200, dtype=np.uint8))))
    hdr, samples = synthesize_tape(spec, items)
    n, t = samples.shape
    print(f"# tape {n:,} x {t} int16 = {samples.nbytes/1e6:.1f} MB",
          flush=True)
    print(f"# devices: {jax.devices()}", flush=True)

    # host pack
    packed = None
    t0 = time.perf_counter()
    packed = native.pack12_delta(samples)
    print(f"{'host pack12_delta':40s} {(time.perf_counter()-t0)*1e3:9.1f} ms"
          f"  ({packed.nbytes/1e6:.1f} MB)", flush=True)

    # fresh-buffer transfers (relay may dedup identical uploads: perturb)
    def fresh(arr):
        a = arr.copy()
        flat = a.reshape(-1)
        flat[:8] = rng.integers(0, 127, 8).astype(a.dtype)
        return a

    for label, arr in (("device_put raw int16", samples),
                       ("device_put packed12", packed)):
        for i in range(3):
            a = fresh(arr)
            t0 = time.perf_counter()
            d = jax.device_put(a)
            d.block_until_ready()
            dt = time.perf_counter() - t0
            print(f"{label + f' (fresh #{i})':40s} {dt*1e3:9.1f} ms",
                  flush=True)

    # device activity programs (data resident; compile excluded by rep 1)
    step = max(1, (n * t) // 2_000_000)
    mv = jnp.float32(hdr.maxvolts)
    pj = jnp.asarray(packed)
    sj = jnp.asarray(samples)
    jax.block_until_ready((pj, sj))

    timeit("tape_activity_packed (resident)",
           lambda: seg.tape_activity_packed(pj, mv, step=step, n=n, t=t))
    timeit("tape_activity raw (resident)",
           lambda: seg.tape_activity(sj, mv, step=step))

    # end-to-end, as TapeDecoder does it
    def e2e_packed():
        a = fresh(samples)
        p = native.pack12_delta(a)
        v, h, act = seg.tape_activity_packed(jnp.asarray(p), mv,
                                             step=step, n=n, t=t)
        return float(h), np.asarray(act)

    def e2e_raw():
        a = fresh(samples)
        v, h, act = seg.tape_activity(jnp.asarray(a), mv, step=step)
        return float(h), np.asarray(act)

    for i in range(3):
        t0 = time.perf_counter()
        e2e_packed()
        print(f"{'e2e packed (fresh #%d)' % i:40s} "
              f"{(time.perf_counter()-t0)*1e3:9.1f} ms", flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        e2e_raw()
        print(f"{'e2e raw (fresh #%d)' % i:40s} "
              f"{(time.perf_counter()-t0)*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
