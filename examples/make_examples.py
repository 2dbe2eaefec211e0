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

CASES = {
    "9trk_NRZI": dict(
        spec=lambda: default_spec(tb.MODE_NRZI),
        seed=101, mode="blocks",
        sizes=[200, 80, 512, 120, 300],
        args=["-v", "-m", "-nrzi", "-tap"]),
    "7trk_NRZI": dict(
        spec=lambda: default_spec(tb.MODE_NRZI, ntrks=7, bpi=556),
        seed=102, mode="blocks6",
        sizes=[100, 120, 64],
        args=["-v", "-m", "-nrzi", "-ntrks=7", "-tap"]),
    "9trk_PE": dict(
        spec=lambda: default_spec(tb.MODE_PE),
        seed=103, mode="blocks",
        sizes=[150, 300, 64],
        args=["-v", "-m", "-pe", "-bpi=1600", "-ips=50", "-tap"]),
    "9trk_GCR": dict(
        spec=lambda: default_spec(tb.MODE_GCR),
        seed=104, mode="blocks",
        sizes=[154, 100, 210],
        args=["-v", "-m", "-gcr", "-ips=25", "-tap"]),
    "6trk_Whirlwind": dict(
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
    for name, case in CASES.items():
        d = os.path.join(HERE, name)
        os.makedirs(d, exist_ok=True)
        hdr, samples = build_case(name, case)
        path = os.path.join(d, "example.tbin")
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
        d = os.path.join(HERE, name)
        if not os.path.exists(os.path.join(d, "example.tbin")):
            generate()
        env = dict(os.environ)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "readtape")] + case["args"] +
            ["example.tbin"], cwd=d, env=env, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"{name}: DECODE FAILED\n{r.stdout}\n{r.stderr}")
            ok = False
            continue
        h = sha(os.path.join(d, "example.tap"))
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
