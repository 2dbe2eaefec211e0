#!/usr/bin/env python3
"""True relay link throughput, fetch-forced: block_until_ready on this
backend does NOT force the transfer, so every probe is forced by fetching
a scalar that depends on the uploaded bytes.

Measures single-stream upload at several sizes, then N concurrent
uploads from threads, to see whether the relay multiplexes streams.
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from readtape_tpu.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


@jax.jit
def checksum(x):
    return jnp.sum(x.astype(jnp.int32))


def force(d):
    return int(checksum(d))


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    def fresh_mb(mb):
        return rng.integers(-2000, 2000,
                            (int(mb) * 1024 * 1024) // 2).astype(np.int16)

    force(jax.device_put(fresh_mb(1)))       # compile checksum

    for mb in (2, 8, 16, 32, 60):
        a = fresh_mb(mb)
        t0 = time.perf_counter()
        force(jax.device_put(a))
        dt = time.perf_counter() - t0
        print(f"single {mb:3d} MB: {dt:6.2f}s  {mb/dt:6.1f} MB/s",
              flush=True)

    for nstream in (2, 4):
        per = 60 // nstream
        bufs = [fresh_mb(per) for _ in range(nstream)]
        t0 = time.perf_counter()
        with ThreadPoolExecutor(nstream) as ex:
            handles = list(ex.map(jax.device_put, bufs))
        for h in handles:
            force(h)
        dt = time.perf_counter() - t0
        print(f"{nstream} streams x {per} MB: {dt:6.2f}s  "
              f"{nstream*per/dt:6.1f} MB/s aggregate", flush=True)

    # sequential chunked via async dispatch (what a chunk pipeline does):
    # device_put all chunks back-to-back, force at the end
    for nchunk in (4, 8):
        per = 60 / nchunk
        bufs = [fresh_mb(per) for _ in range(nchunk)]
        t0 = time.perf_counter()
        handles = [jax.device_put(b) for b in bufs]
        for h in handles:
            force(h)
        dt = time.perf_counter() - t0
        print(f"async chain {nchunk} x {per:.0f} MB: {dt:6.2f}s  "
              f"{60/dt:6.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
