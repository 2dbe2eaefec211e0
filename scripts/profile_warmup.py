"""Diagnose bench warmup time: persistent-cache hits vs misses vs execution.

Round-4 problem (VERDICT #1d): bench warmup was 687-845 s even with the
523 MB persistent cache populated. This probe reproduces the bench warmup
(same synth shapes, same decode path) with compilation-cache debug logging
so we can see, per compiled executable, whether it was a cache hit, a miss
(recompiled remotely), or whether the time went somewhere else entirely.
"""

import logging
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from readtape_tpu.jaxcache import enable_compilation_cache

enable_compilation_cache()

logging.basicConfig(level=logging.WARNING, stream=sys.stderr,
                    format="%(asctime)s %(name)s %(message)s")
for name in ("jax._src.compilation_cache", "jax._src.compiler",
             "jax._src.cache_key"):
    logging.getLogger(name).setLevel(logging.DEBUG)

t0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter() - t0:8.1f}s] {msg}", flush=True)


import jax  # noqa: E402

stamp(f"jax imported, devices: {jax.devices()}")

from readtape_tpu.formats import tbin as tb  # noqa: E402
from readtape_tpu.synth import default_spec, synthesize_tape  # noqa: E402
from readtape_tpu.decode.pipeline import DecodeOptions, decode_tape  # noqa: E402

nblocks = int(os.environ.get("BENCH_BLOCKS", "160"))
blocksize = int(os.environ.get("BENCH_BLOCKSIZE", "1200"))
spec = default_spec(tb.MODE_NRZI, ibg_secs=0.005, start_gap_secs=0.005)
rng = np.random.default_rng(2026)
blocks = [bytes(rng.integers(0, 256, blocksize, dtype=np.uint8))
          for _ in range(nblocks)]
items = [("block", b) for b in blocks]
items.insert(nblocks // 2, ("tapemark",))
items.append(("tapemark",))
hdr, samples = synthesize_tape(replace(spec, seed=2026), items)
stamp(f"synthesized {samples.shape[0]:,} samples")

opts = DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                     deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)
out, stats = decode_tape(samples, opts)
stamp(f"warmup decode done: {stats}")
datas = [b.data for b in out if b.kind == "data"]
stamp(f"blocks ok: {datas == blocks}")
