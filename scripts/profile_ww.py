"""Measure Whirlwind decode throughput on the TPU (VERDICT r4 #4: WW has
never had a recorded number; target >= 1.6 Ms/s = the C core).

Synthesizes the bench WW tapes (40 blocks x 600 words) and times
decode_tape end-to-end per rep with distinct data, plus READTAPE_TIMING
stage logs."""

import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from readtape_tpu.jaxcache import enable_compilation_cache

enable_compilation_cache()

from readtape_tpu.formats import tbin as tb  # noqa: E402
from readtape_tpu.synth import default_spec, synthesize_tape  # noqa: E402
from readtape_tpu.decode.pipeline import DecodeOptions, decode_tape  # noqa: E402

nblk = int(os.environ.get("WW_BLOCKS", "40"))
spec = default_spec(tb.MODE_WW, ibg_secs=0.005, start_gap_secs=0.005)
for rep in range(4):
    seed = 6100 + rep
    rng = np.random.default_rng(seed)
    words = [[int(w) for w in rng.integers(0, 65536, 600)]
             for _ in range(nblk)]
    items = [("block", w) for w in words]
    blocks = [b"".join(bytes([w >> 8, w & 0xFF]) for w in ws)
              for ws in words]
    hdr, samples = synthesize_tape(replace(spec, seed=seed), items)
    opts = DecodeOptions(mode=tb.MODE_WW, ntrks=spec.ntrks, bpi=spec.bpi,
                         ips=spec.ips, ww_order=spec.ww_order,
                         fluxdir="neg", multiple_tries=False,
                         deltat=hdr.tdelta_ns * 1e-9,
                         maxvolts=hdr.maxvolts)
    t0 = time.perf_counter()
    res, _st = decode_tape(samples, opts)
    dt = time.perf_counter() - t0
    datas = [b.data for b in res if b.kind == "data"]
    ok = datas == blocks
    print(f"rep {rep}: {samples.shape[0]:,} samples in {dt:.2f}s = "
          f"{samples.shape[0]/dt/1e6:.3f} Ms/s  blocks_ok={ok}",
          flush=True)
