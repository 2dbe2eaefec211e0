"""Benchmark: 9-track NRZI TBIN decode throughput per chip.

The BASELINE.json metric: TBIN Msamples/sec on the 9trk NRZI config, vs the
reference C decoder's ~1.49 Msamples/s (examples/9trk_NRZI PLAGO: 4,481,584
samples in 3 s on a desktop core -- BASELINE.md).

Synthesizes PLAGO-scale tapes (~4.5M samples, >=150 blocks), decodes them
with the full production pipeline (8 parmsets, best-pick, block emission),
checks every byte against the synthesizer's ground truth, and additionally
diffs the warmup tape's .tap byte-for-byte against the reference C binary
(the reference's own acceptance methodology, examples/*/Makefile).

Output protocol (round-5 redesign -- the round-4 artifact was empty because
a slow remote compile in the per-mode sweep ran before the single JSON
print; rc=124 with no line ever emitted):

  1. a thin WATCHDOG parent re-execs this file with --inner under a total
     wall budget and streams its output; if the inner process produces no
     JSON line before the deadline (e.g. a hung remote compile), the parent
     kills it and prints an error JSON so the driver ALWAYS parses a line;
  2. the inner process prints the MAIN JSON line immediately after the
     resident reps -- before any per-mode work;
  3. each per-mode benchmark (PE/GCR/WW) runs in its own subprocess with a
     hard timeout (a hung compile skips that mode, never blocks);
  4. a second, richer JSON line (main metrics + modes dict) is printed at
     the end. The driver parses the LAST JSON line, so it sees the richer
     line normally and the main line if the modes phase is cut short.

JSON fields:
  value            end-to-end Msamples/s (host tape in, decoded blocks out;
                   includes the host->device upload, which on this relay-
                   tunneled TPU is link-bound)
  resident_msps    Msamples/s decoding a DEVICE-RESIDENT tape (timed after
                   upload; the chip-capability number BASELINE.md's north
                   star is about)
  kernel_path      which compute path produced the numbers
  fallback         true if any bit-exactness fallback triggered
  oracle_tap       result of the .tap diff vs the reference C binary
  modes            per-mode resident Msamples/s (pe/gcr/ww), byte-checked
"""

import json
import os
import shutil
import subprocess
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MSPS = 1.49

KERNEL_PATHS = (
    (None, "fused"),
    ({"READTAPE_FUSED": "0"}, "pallas-v3"),
    ({"READTAPE_FUSED": "0", "READTAPE_SLOT_PALLAS": "0"},
     "pallas-admission+xla-slot"),
    ({"READTAPE_FUSED": "0", "READTAPE_PALLAS": "0"}, "xla"),
    ({"READTAPE_FUSED": "0", "READTAPE_PALLAS": "0",
      "READTAPE_MAX_BATCH": "4"}, "xla-b4"),
    ({"READTAPE_FUSED": "0", "READTAPE_PALLAS": "0",
      "READTAPE_MAX_BATCH": "1"}, "xla-b1"),
)

METRIC = ("TBIN Msamples/sec/chip (9trk NRZI, 8 parmsets, "
          "block bytes checked vs ground truth every rep; "
          ".tap diffed vs reference binary)")


def watchdog_main():
    """Parent: run --inner under a wall budget; guarantee a JSON line."""
    budget = float(os.environ.get("BENCH_TOTAL_BUDGET", "3300"))
    t0 = time.monotonic()
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--inner"],
        stdout=subprocess.PIPE, text=True, bufsize=1)
    saw_json = False
    import selectors
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    buf = ""
    while True:
        remaining = budget - (time.monotonic() - t0)
        if remaining <= 0:
            break
        if not sel.select(timeout=min(remaining, 10.0)):
            if proc.poll() is not None:
                break
            continue
        chunk = proc.stdout.readline()
        if chunk == "":
            break
        buf = chunk
        if chunk.lstrip().startswith("{"):
            saw_json = True
        sys.stdout.write(chunk)
        sys.stdout.flush()
    if proc.poll() is None:
        proc.kill()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            pass
    if not saw_json:
        print(json.dumps({
            "metric": METRIC, "value": 0.0, "unit": "Msamples/s",
            "vs_baseline": 0.0,
            "error": f"bench produced no JSON within {budget:.0f}s "
                     f"(last line: {buf.strip()[:200]!r})"}), flush=True)
        return 1
    return 0


def _backend_alive(timeout_s=float(os.environ.get("BENCH_PROBE_TIMEOUT",
                                                  "900"))):
    """Probe the TPU backend in a subprocess: the axon relay sometimes
    goes down and jax.devices() then HANGS (observed for hours), which
    would leave the bench silently stuck. Probe first, fail loudly."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _oracle_tap_check(hdr, samples, out):
    """Diff our decode's .tap against the reference C binary's on the same
    tape (built from /root/reference/src; never copied into this repo)."""
    import tempfile
    from readtape_tpu.formats import tbin as tb
    from readtape_tpu.formats.simh import TapWriter

    src = "/root/reference/src"
    exe = "/tmp/oracle/readtape"
    try:
        if not os.path.exists(exe):
            if not os.path.isdir(src):
                return "skipped(no reference source)"
            os.makedirs("/tmp/oracle", exist_ok=True)
            for name in os.listdir(src):
                shutil.copy(os.path.join(src, name), "/tmp/oracle")
            subprocess.run(["make"], cwd="/tmp/oracle", check=True,
                           capture_output=True, timeout=300)
        with tempfile.TemporaryDirectory() as td:
            tb.write_tbin(os.path.join(td, "bench.tbin"), hdr, samples)
            r = subprocess.run([exe, "-m", "-tap", "bench.tbin"], cwd=td,
                               capture_output=True, text=True, timeout=600)
            if r.returncode != 0:
                return f"skipped(oracle exit {r.returncode})"
            ref = open(os.path.join(td, "bench.tap"), "rb").read()
            # our .tap from the already-decoded blocks, via the same output
            # layer the CLI uses (cli.py block emission loop)
            w = TapWriter(os.path.join(td, "ours.tap"))
            for blk in out:
                if blk.kind == "tapemark":
                    w.write_tapemark()
                elif blk.kind == "data" and len(blk.data):
                    w.write_block(blk.data, error=blk.errcount > 0)
            w.write_eom()
            w.close()
            ours = open(os.path.join(td, "ours.tap"), "rb").read()
        return "identical" if ref == ours else "MISMATCH"
    except Exception as e:
        return f"skipped({type(e).__name__})"


def inner_main():
    from readtape_tpu.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    # the relay has been observed down for hours at a stretch: keep
    # probing for a while before conceding, so a transient outage at
    # bench time doesn't record a zero round
    deadline = time.monotonic() + 60 * float(
        os.environ.get("BENCH_PROBE_MINUTES", "30"))
    while not _backend_alive():
        if time.monotonic() >= deadline:
            print(json.dumps({
                "metric": METRIC,
                "value": 0.0, "unit": "Msamples/s", "vs_baseline": 0.0,
                "error": "TPU backend unavailable (relay down; "
                         "init hung through the probe window)"}), flush=True)
            return 1
        print("# TPU backend unavailable; retrying", file=sys.stderr,
              flush=True)
        time.sleep(120)
    import numpy as np
    from readtape_tpu.formats import tbin as tb
    from readtape_tpu.synth import default_spec, synthesize_tape
    from readtape_tpu.decode.pipeline import (DecodeOptions, TapeDecoder,
                                              decode_tape)

    nblocks = int(os.environ.get("BENCH_BLOCKS", "160"))
    blocksize = int(os.environ.get("BENCH_BLOCKSIZE", "1200"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    # resident is the chip-capability number: median-of-5 with per-rep
    # walls recorded, so a 2x ambient swing is distinguishable from a
    # real regression (round-3 verdict: 5.95 vs 3.39 within one session)
    reps_res = int(os.environ.get("BENCH_RES_REPS", "5"))
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
    tapes = [make_tape(2026 + i) for i in range(1 + max(reps, reps_res))]
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
    kernel_path, fallback = KERNEL_PATHS[0][1], False
    out = None
    for env_override, path_name in KERNEL_PATHS:
        if env_override is not None:
            os.environ.update(env_override)
            fallback = True
            print(f"# retrying with {env_override}",
                  file=sys.stderr, flush=True)
        kernel_path = path_name
        t_warm = time.perf_counter()
        try:
            out, stats = decode_tape(samples, opts)
        except Exception as e:       # remote compile service flakiness
            print(f"# warmup failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            continue
        warmup_s = time.perf_counter() - t_warm
        print(f"# warmup (incl. compile) {warmup_s:.1f}s",
              file=sys.stderr, flush=True)
        datas = [b.data for b in out if b.kind == "data"]
        ok = (datas == blocks and stats["ntapemarks"] == 2 and
              stats["nerrblocks"] == 0)
        if ok:
            break
    if not ok:
        print(json.dumps({"metric": METRIC,
                          "value": 0.0, "unit": "Msamples/s",
                          "vs_baseline": 0.0,
                          "error": "decode mismatch"}), flush=True)
        return 1

    oracle_tap = _oracle_tap_check(hdr, samples, out)
    print(f"# oracle .tap diff: {oracle_tap}", file=sys.stderr, flush=True)

    def run_checked(samples_i, blocks_i, label, decoder=None):
        t0 = time.perf_counter()
        out_i, stats_i = decode_tape(samples_i, opts, decoder=decoder)
        dt = time.perf_counter() - t0
        datas_i = [b.data for b in out_i if b.kind == "data"]
        if datas_i != blocks_i or stats_i["nerrblocks"] != 0:
            raise AssertionError(f"decode mismatch on {label}")
        return dt

    try:
        import jax

        # link-throughput probe: fresh random data so the relay's content
        # dedup can't serve it from cache; gives the environment context
        # that separates link regressions from chip regressions
        probe = np.random.default_rng(int(time.time())).integers(
            -2 ** 15, 2 ** 15, (8_000_000,), dtype=np.int16)
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(probe))
        link_mbps = probe.nbytes / (time.perf_counter() - t0) / 1e6

        # end-to-end: host samples in -> decoded+checked blocks out
        e2e_walls = []
        for i in range(reps):
            blocks_i, _, samples_i = tapes[1 + i]
            e2e_walls.append(run_checked(samples_i, blocks_i,
                                         f"end-to-end rep {i}"))
        best = min(e2e_walls)

        # HBM-resident: upload each rep tape fully (one-shot path), then
        # time the decode alone. Distinct tapes per rep so relay-side
        # program/data caches can't flatter the number.
        saved_granules = os.environ.get("READTAPE_GRANULES")
        os.environ["READTAPE_GRANULES"] = "0"   # one-shot resident upload
        try:
            res_walls, upload_walls = [], []
            for i in range(reps_res):
                blocks_i, _, samples_i = tapes[1 + (i % max(reps, reps_res))]
                t0 = time.perf_counter()
                dec = TapeDecoder(samples_i, opts)
                jax.block_until_ready(dec.v_i16)
                upload_walls.append(time.perf_counter() - t0)
                res_walls.append(run_checked(samples_i, blocks_i,
                                             f"resident rep {i}",
                                             decoder=dec))
            med_res = sorted(res_walls)[len(res_walls) // 2]
        finally:
            if saved_granules is None:
                os.environ.pop("READTAPE_GRANULES", None)
            else:
                os.environ["READTAPE_GRANULES"] = saved_granules
    except AssertionError as e:
        print(json.dumps({"metric": METRIC,
                          "value": 0.0, "unit": "Msamples/s",
                          "vs_baseline": 0.0, "error": str(e),
                          "kernel_path": kernel_path}), flush=True)
        return 1

    msps = nsamples / best / 1e6
    result = {
        "metric": METRIC,
        "value": round(msps, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / BASELINE_MSPS, 2),
        "resident_msps": round(nsamples / med_res / 1e6, 3),
        "resident_best_msps": round(nsamples / min(res_walls) / 1e6, 3),
        "e2e_walls_s": [round(x, 3) for x in e2e_walls],
        "resident_walls_s": [round(x, 3) for x in res_walls],
        "upload_walls_s": [round(x, 3) for x in upload_walls],
        "link_mbps": round(link_mbps, 1),
        "kernel_path": kernel_path,
        "fallback": fallback,
        "oracle_tap": oracle_tap,
        "warmup_s": round(warmup_s, 1),
    }
    # MAIN JSON LINE -- printed before any per-mode work so a slow or hung
    # mode compile can never empty the round's artifact (round-4 failure)
    print(json.dumps(result), flush=True)

    if os.environ.get("BENCH_MODES", "1") == "1":
        result["modes"] = _bench_modes_subprocess()
        # richer final line; the driver parses the tail of stdout
        print(json.dumps(result), flush=True)
    return 0


def _bench_modes_subprocess():
    """Per-mode device-resident throughput (PE, GCR, Whirlwind), each mode
    in its own subprocess under a hard timeout so a hung remote compile
    skips the mode instead of blocking the bench (round-4 failure mode).
    Reference single-core numbers (BASELINE.md): PE ~1.2, GCR ~2.7,
    WW ~1.6 Msamples/s."""
    out = {}
    deadline = time.monotonic() + float(
        os.environ.get("BENCH_MODES_BUDGET", "1800"))
    for name in ("pe", "gcr", "ww"):
        remaining = deadline - time.monotonic()
        if remaining <= 30:
            out[name] = {"skipped": "modes budget exhausted"}
            continue
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--mode", name],
                capture_output=True, text=True, timeout=remaining)
            line = [ln for ln in r.stdout.splitlines()
                    if ln.lstrip().startswith("{")]
            if line:
                out[name] = json.loads(line[-1])
            else:
                out[name] = {"error": f"no JSON (rc={r.returncode}): "
                                      f"{r.stderr.strip()[-200:]}"}
        except subprocess.TimeoutExpired:
            out[name] = {"skipped": f"timeout after {remaining:.0f}s "
                                    "(mode budget)"}
        print(f"# modes[{name}]: {out[name]}", file=sys.stderr, flush=True)
    return out


def mode_main(name):
    """Child process: benchmark one mode (pe/gcr/ww), print one JSON dict."""
    from readtape_tpu.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import jax
    from readtape_tpu.formats import tbin as tb
    from readtape_tpu.synth import default_spec, synthesize_tape
    from readtape_tpu.decode.pipeline import (DecodeOptions, TapeDecoder,
                                              decode_tape)

    mode = {"pe": tb.MODE_PE, "gcr": tb.MODE_GCR, "ww": tb.MODE_WW}[name]
    # WW runs at 100 BPI (66.7 samples/bit): 12x400-word blocks is already
    # a ~2.6M-sample tape (the reference's 6trk example is 1.57M) and the
    # Python-side synthesis of bigger ones eats the mode budget
    nblk = {"pe": 60, "gcr": 40, "ww": 12}[name]
    os.environ["READTAPE_GRANULES"] = "0"
    try:
        spec = default_spec(mode, ibg_secs=0.005, start_gap_secs=0.005)
        walls = []
        nsamp = 0
        for rep in range(3):
            seed = (4100 if mode == tb.MODE_PE else
                    5100 if mode == tb.MODE_GCR else 6100) + rep
            rng = np.random.default_rng(seed)
            kw = dict(mode=mode, ntrks=spec.ntrks, bpi=spec.bpi,
                      ips=spec.ips)
            if mode == tb.MODE_WW:
                words = [[int(w) for w in rng.integers(0, 65536, 400)]
                         for _ in range(nblk)]
                items = [("block", w) for w in words]
                blocks = [b"".join(bytes([w >> 8, w & 0xFF])
                                   for w in ws) for ws in words]
                kw.update(ww_order=spec.ww_order, fluxdir="neg",
                          multiple_tries=False)
            else:
                blocks = [bytes(rng.integers(0, 256, 1200, dtype=np.uint8))
                          for _ in range(nblk)]
                items = [("block", b) for b in blocks]
            hdr, samples = synthesize_tape(replace(spec, seed=seed), items)
            nsamp = samples.shape[0]
            kw.update(deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)
            opts = DecodeOptions(**kw)
            if mode == tb.MODE_WW:
                # device-resident like the other modes: upload first
                # (12-bit packed activity pass), then time the decode
                from readtape_tpu import native
                from readtape_tpu.decode import segment as sg
                packed = native.pack12_delta(samples)
                N, T = samples.shape
                v_i16, h_est, _ = sg.tape_activity_packed(
                    jax.numpy.asarray(packed),
                    jax.numpy.float32(hdr.maxvolts),
                    step=max(1, (N * T) // 2_000_000), n=N, t=T)
                jax.block_until_ready(v_i16)
                t0 = time.perf_counter()
                res, _st = decode_tape(samples, opts,
                                       ww_pre=(v_i16, float(h_est)))
                dt = time.perf_counter() - t0
            else:
                dec = TapeDecoder(samples, opts)
                jax.block_until_ready(dec.v_i16)
                t0 = time.perf_counter()
                res, _st = decode_tape(samples, opts, decoder=dec)
                dt = time.perf_counter() - t0
            datas = [b.data for b in res if b.kind == "data"]
            if datas != blocks:
                print(json.dumps({"error": "decode mismatch"}), flush=True)
                return 1
            if rep > 0:          # rep 0 pays compilation
                walls.append(dt)
        med = sorted(walls)[len(walls) // 2]
        print(json.dumps({"msps": round(nsamp / med / 1e6, 3),
                          "walls_s": [round(x, 3) for x in walls],
                          "blocks_checked": nblk}), flush=True)
        return 0
    except Exception as e:
        print(json.dumps(
            {"error": f"{type(e).__name__}: {e}"[:200]}), flush=True)
        return 1


if __name__ == "__main__":
    if "--inner" in sys.argv:
        sys.exit(inner_main())
    elif "--mode" in sys.argv:
        sys.exit(mode_main(sys.argv[sys.argv.index("--mode") + 1]))
    else:
        sys.exit(watchdog_main())
