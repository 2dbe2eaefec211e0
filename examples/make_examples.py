#!/usr/bin/env python3
"""Generate the example tapes (the reference mirror strips its .tbin inputs,
so ours are synthesized deterministically) and check decode outputs.

  python examples/make_examples.py generate   # write the .tbin inputs
  python examples/make_examples.py test       # decode + compare to golden

Golden values are SHA-256 hashes of the .tap outputs, recorded from decodes
that were differentially validated against the reference C binary.
"""

import hashlib
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from readtape_tpu.formats import tbin as tb           # noqa: E402
from readtape_tpu.synth import default_spec, synthesize_tape  # noqa: E402

# 10 example decodes matching the reference's distribution
# (examples/README.txt:1-9): 2 x 7trk NRZI, 2 x 9trk NRZI, 2 x 9trk PE,
# 3 x 9trk GCR (one a CSV capture needing -differentiate -zeros),
# 1 x 6trk Whirlwind. Keys are "<dir>/<basename>".
CASES = {
    "9trk_NRZI/example": dict(
        spec=lambda: default_spec(tb.MODE_NRZI),
        seed=101, mode="blocks",
        sizes=[200, 80, 512, 120, 300],
        args=["-v", "-m", "-nrzi", "-tap"]),
    "9trk_NRZI/example2": dict(
        # head-skewed capture decoded with -deskew (like PLAGO_beginning)
        spec=lambda: default_spec(tb.MODE_NRZI,
                                  skew_samples=(0, 3, 1, 5, 2, 0, 4, 1, 2)),
        seed=106, mode="blocks",
        sizes=[256, 96, 400],
        args=["-v", "-m", "-nrzi", "-deskew", "-tap"]),
    "7trk_NRZI/example": dict(
        spec=lambda: default_spec(tb.MODE_NRZI, ntrks=7, bpi=556),
        seed=102, mode="blocks6",
        sizes=[100, 120, 64],
        args=["-v", "-m", "-nrzi", "-ntrks=7", "-tap"]),
    "7trk_NRZI/example2": dict(
        spec=lambda: default_spec(tb.MODE_NRZI, ntrks=7, bpi=200),
        seed=107, mode="blocks6",
        sizes=[84, 120],
        args=["-v", "-m", "-nrzi", "-ntrks=7", "-bpi=200", "-tap"]),
    "9trk_PE/example": dict(
        spec=lambda: default_spec(tb.MODE_PE),
        seed=103, mode="blocks",
        sizes=[150, 300, 64],
        args=["-v", "-m", "-pe", "-bpi=1600", "-ips=50", "-tap"]),
    "9trk_PE/example2": dict(
        spec=lambda: default_spec(tb.MODE_PE),
        seed=108, mode="blocks",
        sizes=[512, 80, 200, 150],
        args=["-v", "-m", "-pe", "-bpi=1600", "-ips=50", "-tap"]),
    "9trk_GCR/example": dict(
        spec=lambda: default_spec(tb.MODE_GCR),
        seed=104, mode="blocks",
        sizes=[154, 100, 210],
        args=["-v", "-m", "-gcr", "-ips=25", "-tap"]),
    "9trk_GCR/example2": dict(
        # plain -zeros with -correct (like the 1kblks example)
        spec=lambda: default_spec(tb.MODE_GCR),
        seed=109, mode="blocks",
        sizes=[140, 210, 77],
        args=["-v", "-m", "-gcr", "-ips=25", "-zeros", "-correct",
              "-tap"]),
    "9trk_GCR/example3": dict(
        # CSV "analog" capture requiring -differentiate -zeros
        spec=lambda: default_spec(tb.MODE_GCR, pulse_width_bits=0.45,
                                  noise_rms=0.0),
        seed=110, mode="blocks", fmt="csv",
        sizes=[154, 64],
        args=["-v", "-m", "-gcr", "-bpi=9042", "-ips=25",
              "-differentiate", "-zeros", "-tap"]),
    "6trk_Whirlwind/example": dict(
        spec=lambda: default_spec(tb.MODE_WW),
        seed=105, mode="words",
        sizes=[24, 8],
        args=["-v", "-whirlwind", "-fluxdir=auto", "-tap"]),
}


def build_case(name, case):
    rng = np.random.default_rng(case["seed"])
    spec = case["spec"]()
    items = []
    for n in case["sizes"]:
        if case["mode"] == "words":
            items.append(("block", [int(w) for w in
                                    rng.integers(0, 65536, n)]))
        elif case["mode"] == "blocks6":
            items.append(("block", bytes(rng.integers(0, 64, n,
                                                      dtype=np.uint8))))
        else:
            items.append(("block", bytes(rng.integers(0, 256, n,
                                                      dtype=np.uint8))))
        items.append(("tapemark",))
    return synthesize_tape(spec, items)


def generate():
    from readtape_tpu.formats.csvfmt import write_csv
    for name, case in CASES.items():
        d = os.path.join(HERE, os.path.dirname(name))
        base = os.path.basename(name)
        os.makedirs(d, exist_ok=True)
        hdr, samples = build_case(name, case)
        if case.get("fmt") == "csv":
            path = os.path.join(d, base + ".csv")
            volts = samples.astype(np.float64) * (hdr.maxvolts / 32767.0)
            write_csv(path, 0.0, hdr.tdelta_ns * 1e-9, volts)
        else:
            path = os.path.join(d, base + ".tbin")
            tb.write_tbin(path, hdr, samples)
        print(f"{name}: {samples.shape[0]:,} samples -> {path}")


def sha(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def run(record=False):
    golden_path = os.path.join(HERE, "golden.json")
    golden = {}
    if os.path.exists(golden_path):
        golden = json.load(open(golden_path))
    ok = True
    for name, case in CASES.items():
        d = os.path.join(HERE, os.path.dirname(name))
        base = os.path.basename(name)
        ext = ".csv" if case.get("fmt") == "csv" else ".tbin"
        if not os.path.exists(os.path.join(d, base + ext)):
            generate()
        env = dict(os.environ)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "readtape")] + case["args"] +
            [base + ext], cwd=d, env=env, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"{name}: DECODE FAILED\n{r.stdout}\n{r.stderr}")
            ok = False
            continue
        h = sha(os.path.join(d, base + ".tap"))
        if record:
            golden[name] = h
            print(f"{name}: recorded {h[:16]}")
        elif golden.get(name) == h:
            print(f"{name}: ok ({h[:16]})")
        else:
            print(f"{name}: MISMATCH got {h[:16]} want "
                  f"{golden.get(name, '?')[:16]}")
            ok = False
    if record:
        json.dump(golden, open(golden_path, "w"), indent=1)
    return ok


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "test"
    if cmd == "generate":
        generate()
    elif cmd == "record":
        run(record=True)
    else:
        sys.exit(0 if run() else 1)
