#!/usr/bin/env python3
"""Bit-exactness + timing across decode batch caps on the real TPU.

VERDICT round-2 item 3: round-1's batched-while version corrupted whole
lanes at B=16 on the v5e; the current scan-with-outputs + Mosaic-kernel
path must be (re)proven at B=16/32 before the batch cap can rise.

Decodes one synthesized bench-shape tape at READTAPE_MAX_BATCH in
{8, 16, 32}, requiring identical block bytes / kinds / parmset decisions
at every cap, and prints per-cap wall time.

    python scripts/batch_exact.py [nblocks]
"""
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from readtape_tpu.jaxcache import enable_compilation_cache

enable_compilation_cache()

from readtape_tpu.formats import tbin as tb
from readtape_tpu.synth import default_spec, synthesize_tape
from readtape_tpu.decode.pipeline import DecodeOptions, decode_tape


def main():
    nblocks = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.005, start_gap_secs=0.005)
    rng = np.random.default_rng(777)
    items = [("block", bytes(rng.integers(0, 256, 1200, dtype=np.uint8)))
             for _ in range(nblocks)]
    items.insert(nblocks // 2, ("tapemark",))
    items.append(("tapemark",))
    hdr, samples = synthesize_tape(replace(spec, seed=777), items)
    print(f"# tape: {samples.shape[0]:,} samples", flush=True)
    opts = DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                         deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)

    ref = None
    fail = 0
    for cap in (8, 16, 32):
        os.environ["READTAPE_MAX_BATCH"] = str(cap)
        t0 = time.perf_counter()
        out, stats = decode_tape(samples, opts)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        out, stats = decode_tape(samples, opts)
        dt = time.perf_counter() - t0
        sig = [(b.kind, b.data, b.parmset, b.tries, b.errcount,
                b.warncount) for b in out]
        if ref is None:
            ref = sig
            status = "baseline"
        elif sig == ref:
            status = "EXACT"
        else:
            status = "MISMATCH"
            fail += 1
            for i, (a, b) in enumerate(zip(ref, sig)):
                if a != b:
                    print(f"#   first diff at block {i}: "
                          f"{a[:1]}{a[2:]} vs {b[:1]}{b[2:]} "
                          f"data_eq={a[1] == b[1]}", flush=True)
                    break
        print(f"B={cap:3d}: {status:9s} warm={warm:6.1f}s "
              f"steady={dt:5.2f}s "
              f"({samples.shape[0] / dt / 1e6:5.2f} Ms/s)", flush=True)
    print("FAIL" if fail else "ALL EXACT", flush=True)
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
