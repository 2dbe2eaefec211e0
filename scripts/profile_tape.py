#!/usr/bin/env python3
"""End-to-end phase timing of the bench-shaped tape decode: upload+init,
segmentation, phase-1 dispatch (parmset 0), fetch, remainder/retry, and
host-side emission — so the optimization target is measured, not guessed.

    python scripts/profile_tape.py [nblocks]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from readtape_tpu.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax

from readtape_tpu.formats import tbin as tb
from readtape_tpu.synth import default_spec, synthesize_tape
from readtape_tpu.decode import pipeline as pl


def main():
    nblocks = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    rng = np.random.default_rng(2026)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.005, start_gap_secs=0.005)
    blocks = [bytes(rng.integers(0, 256, 1200, dtype=np.uint8))
              for _ in range(nblocks)]
    items = [("block", b) for b in blocks]
    items.insert(nblocks // 2, ("tapemark",))
    items.append(("tapemark",))
    hdr, samples = synthesize_tape(spec, items)
    print(f"# {samples.shape[0]:,} samples", flush=True)
    opts = pl.DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                            deltat=hdr.tdelta_ns * 1e-9,
                            maxvolts=hdr.maxvolts)

    # warmup (compile everything)
    t0 = time.perf_counter()
    out, stats = pl.decode_tape(samples, opts)
    print(f"# warmup {time.perf_counter()-t0:.1f}s "
          f"({stats['nblocks']} blocks)", flush=True)

    # instrumented steady-state run
    for rep in range(2):
        t = {}
        t0 = time.perf_counter()
        dec = pl.TapeDecoder(samples, opts)
        jax.block_until_ready(dec.v_i16)
        t["upload+activity"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        segs = dec.segments()
        t["segmentation(host)"] = time.perf_counter() - t0

        # phase 1: parmset 0 on all segments (async dispatch, then fetch)
        buckets = [pl.seg.bucket_length(b - max(a - pl.SEG_WARMUP, 0))
                   for a, b in segs]
        S = max(buckets)
        t0 = time.perf_counter()
        spans = [segs[i:i + 64] for i in range(0, len(segs), 64)]
        thunks = []
        for group in spans:
            g = group + [group[-1]] * (64 - len(group))
            thunks.append(dec.decode_segment_batch([g], fetch=False,
                                                   bucket=S, nparms=1))
        t["phase1 dispatch"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        results = [th() for th in thunks]
        t["phase1 fetch"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        out, stats = pl.decode_tape(samples, opts)
        t["full decode_tape"] = time.perf_counter() - t0
        print(f"# rep {rep}: " + ", ".join(f"{k}={v:.2f}s"
                                           for k, v in t.items()),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
