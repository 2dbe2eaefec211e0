#!/usr/bin/env python3
"""Does the relay overlap host->device transfers with device compute?

Dispatches a long device compute on resident data, then immediately
device_puts a fresh 60 MB buffer, and compares wall-clock vs running the
two serially. If total ~= max(compute, upload), overlap works and a
chunked upload/decode pipeline will pay.
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


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    # a compute that takes ~1-2 s on a v5e: iterated matmul
    x = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))

    @jax.jit
    def burn(x, iters):
        def body(i, a):
            return a @ x * (1.0 / 64.0)
        return jax.lax.fori_loop(0, iters, body, x)

    jax.block_until_ready(burn(x, 10))     # compile
    for iters in (200, 400):
        t0 = time.perf_counter()
        jax.block_until_ready(burn(x, iters))
        print(f"burn({iters}): {time.perf_counter()-t0:.2f}s", flush=True)

    def fresh_mb(mb):
        return rng.integers(-2000, 2000,
                            (mb * 1024 * 1024) // 2).astype(np.int16)

    # fresh-data upload times at several sizes
    for mb in (4, 16, 60):
        a = fresh_mb(mb)
        t0 = time.perf_counter()
        jax.device_put(a).block_until_ready()
        print(f"upload fresh {mb} MB: {time.perf_counter()-t0:.2f}s",
              flush=True)

    # serial: compute then upload
    a = fresh_mb(60)
    t0 = time.perf_counter()
    jax.block_until_ready(burn(x, 400))
    t1 = time.perf_counter()
    jax.device_put(a).block_until_ready()
    t2 = time.perf_counter()
    print(f"serial: compute {t1-t0:.2f}s + upload {t2-t1:.2f}s "
          f"= {t2-t0:.2f}s", flush=True)

    # overlapped: dispatch compute async, then upload
    a = fresh_mb(60)
    t0 = time.perf_counter()
    out = burn(x, 400)
    d = jax.device_put(a)
    d.block_until_ready()
    tu = time.perf_counter()
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    print(f"overlap: upload-done at {tu-t0:.2f}s, both done {t2-t0:.2f}s",
          flush=True)

    # overlapped the other way: upload async (device_put returns
    # immediately?) then dispatch compute
    a = fresh_mb(60)
    t0 = time.perf_counter()
    d = jax.device_put(a)
    td = time.perf_counter()
    out = burn(x, 400)
    jax.block_until_ready(out)
    tb = time.perf_counter()
    d.block_until_ready()
    t2 = time.perf_counter()
    print(f"overlap2: device_put returned {td-t0:.3f}s, compute done "
          f"{tb-t0:.2f}s, upload done {t2-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
