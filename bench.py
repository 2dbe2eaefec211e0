"""Benchmark: 9-track NRZI TBIN decode throughput per chip.

The BASELINE.json metric: TBIN Msamples/sec on the 9trk NRZI config, vs the
reference C decoder's ~1.49 Msamples/s (examples/9trk_NRZI PLAGO: 4,481,584
samples in 3 s on a desktop core -- BASELINE.md).

Synthesizes a PLAGO-scale tape (~4.5M samples, >=150 blocks), decodes it with
the full production pipeline (8 parmsets, best-pick, block emission), checks
every byte, and reports steady-state wall-clock throughput. Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from readtape_tpu.jaxcache import enable_compilation_cache

enable_compilation_cache()

BASELINE_MSPS = 1.49


def _backend_alive(timeout_s=float(os.environ.get("BENCH_PROBE_TIMEOUT",
                                                  "900"))):
    """Probe the TPU backend in a subprocess: the axon relay sometimes
    goes down and jax.devices() then HANGS (observed for hours), which
    would leave the bench silently stuck. Probe first, fail loudly."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # the relay has been observed down for hours at a stretch: keep
    # probing for a while before conceding, so a transient outage at
    # bench time doesn't record a zero round
    deadline = time.monotonic() + 60 * float(
        os.environ.get("BENCH_PROBE_MINUTES", "90"))
    while not _backend_alive():
        if time.monotonic() >= deadline:
            print(json.dumps({
                "metric": "TBIN Msamples/sec/chip (9trk NRZI)",
                "value": 0.0, "unit": "Msamples/s", "vs_baseline": 0.0,
                "error": "TPU backend unavailable (relay down; "
                         "init hung through the probe window)"}))
            return 1
        print("# TPU backend unavailable; retrying", file=sys.stderr,
              flush=True)
        time.sleep(120)
    from readtape_tpu.formats import tbin as tb
    from readtape_tpu.synth import default_spec, synthesize_tape
    from readtape_tpu.decode.pipeline import DecodeOptions, decode_tape

    nblocks = int(os.environ.get("BENCH_BLOCKS", "160"))
    blocksize = int(os.environ.get("BENCH_BLOCKSIZE", "1200"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.005, start_gap_secs=0.005)

    # one FRESH tape per timed rep (distinct data AND distinct waveform
    # noise): the axon relay dedup-caches identical program+data uploads,
    # so repeated decodes of one tape flatter the upload term.  Shapes are
    # identical across tapes, so compilation is still amortized by warmup.
    def make_tape(seed):
        rng = np.random.default_rng(seed)
        blocks = [bytes(rng.integers(0, 256, blocksize, dtype=np.uint8))
                  for _ in range(nblocks)]
        items = [("block", b) for b in blocks]
        items.insert(nblocks // 2, ("tapemark",))
        items.append(("tapemark",))
        hdr, samples = synthesize_tape(replace(spec, seed=seed), items)
        return blocks, hdr, samples

    t_synth = time.perf_counter()
    tapes = [make_tape(2026 + i) for i in range(1 + reps)]
    blocks, hdr, samples = tapes[0]
    nsamples = samples.shape[0]
    print(f"# synthesized {1 + reps} tapes of {nsamples:,} samples in "
          f"{time.perf_counter() - t_synth:.1f}s", file=sys.stderr, flush=True)

    opts = DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                         deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)

    # warmup (includes compilation) + bit-exactness check; if this TPU
    # stack miscompiles at the default batch size or the Mosaic kernel
    # misbehaves, fall back (correctness always wins over speed)
    ok = False
    for env_override in (None, {"READTAPE_SLOT_PALLAS": "0"},
                         {"READTAPE_PALLAS": "0"},
                         {"READTAPE_PALLAS": "0", "READTAPE_MAX_BATCH": "4"},
                         {"READTAPE_PALLAS": "0", "READTAPE_MAX_BATCH": "1"}):
        if env_override is not None:
            os.environ.update(env_override)
            print(f"# retrying with {env_override}",
                  file=sys.stderr, flush=True)
        t_warm = time.perf_counter()
        try:
            out, stats = decode_tape(samples, opts)
        except Exception as e:       # remote compile service flakiness
            print(f"# warmup failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            continue
        print(f"# warmup (incl. compile) {time.perf_counter() - t_warm:.1f}s",
              file=sys.stderr, flush=True)
        datas = [b.data for b in out if b.kind == "data"]
        ok = (datas == blocks and stats["ntapemarks"] == 2 and
              stats["nerrblocks"] == 0)
        if ok:
            break
    if not ok:
        print(json.dumps({"metric": "TBIN Msamples/sec/chip (9trk NRZI)",
                          "value": 0.0, "unit": "Msamples/s",
                          "vs_baseline": 0.0,
                          "error": "decode mismatch"}))
        return 1

    best = None
    for i in range(reps):
        blocks_i, _, samples_i = tapes[1 + i]
        t0 = time.perf_counter()
        out_i, stats_i = decode_tape(samples_i, opts)
        dt = time.perf_counter() - t0
        datas_i = [b.data for b in out_i if b.kind == "data"]
        if datas_i != blocks_i or stats_i["nerrblocks"] != 0:
            print(json.dumps({"metric": "TBIN Msamples/sec/chip (9trk NRZI)",
                              "value": 0.0, "unit": "Msamples/s",
                              "vs_baseline": 0.0,
                              "error": f"decode mismatch on timed rep {i}"}))
            return 1
        best = dt if best is None else min(best, dt)

    msps = nsamples / best / 1e6
    print(json.dumps({
        "metric": "TBIN Msamples/sec/chip (9trk NRZI, 8 parmsets, "
                  "bit-exact vs reference)",
        "value": round(msps, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / BASELINE_MSPS, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
