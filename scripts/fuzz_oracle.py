#!/usr/bin/env python3
"""Differential fuzzer: random synthesized tapes decoded by BOTH this
framework's CLI and the reference C binary; .tap outputs must match
byte-for-byte and per-block decisions (tries, parmset) must agree.

This generalizes tests/test_cli_oracle.py to randomized content, noise,
jitter, skew, and block mixes -- the reference's own acceptance methodology
(examples/*/Makefile `cmp`) applied at scale.

    python scripts/fuzz_oracle.py [iterations] [base_seed]

Failing cases are preserved under /tmp/fuzz_oracle/case_<n>/ for replay.
"""

import os
import re
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ORACLE_DIR = "/tmp/oracle"
REFERENCE_SRC = "/root/reference/src"

from readtape_tpu.formats import tbin as tb             # noqa: E402
from readtape_tpu.synth import default_spec, synthesize_tape  # noqa: E402


def build_oracle():
    exe = os.path.join(ORACLE_DIR, "readtape")
    if os.path.exists(exe):
        return exe
    if not os.path.isdir(REFERENCE_SRC):
        return None
    os.makedirs(ORACLE_DIR, exist_ok=True)
    for name in os.listdir(REFERENCE_SRC):
        shutil.copy(os.path.join(REFERENCE_SRC, name), ORACLE_DIR)
    subprocess.run(["make"], cwd=ORACLE_DIR, check=True,
                   capture_output=True, timeout=300)
    return exe if os.path.exists(exe) else None


BLOCK_RE = re.compile(
    r"wrote block\s+(\d+),\s+(\d+) bytes,\s+(\d+) tr(?:y|ies), parmset (\d+)")


def decisions(log_text):
    return BLOCK_RE.findall(log_text)


def random_case(rng):
    """One random tape: (name, hdr, samples, cli args)."""
    kind = rng.choice(["nrzi9", "nrzi7", "pe", "gcr", "ww"])
    noise = float(rng.uniform(0.005, 0.06))
    jitter = float(rng.uniform(0.0, 0.04))
    ampj = float(rng.uniform(0.0, 0.12))
    skew = tuple(int(s) for s in rng.integers(0, 6, 9))
    nblocks = int(rng.integers(1, 5))

    def blocks(lo, hi, maxbytes):
        items = []
        for _ in range(nblocks):
            n = int(rng.integers(16, maxbytes))
            items.append(("block",
                          bytes(rng.integers(lo, hi, n, dtype=np.uint8))))
            if rng.random() < 0.4:
                items.append(("tapemark",))
        return items

    common = dict(noise_rms=noise, time_jitter_bits=jitter, amp_jitter=ampj,
                  skew_samples=skew)
    if kind == "nrzi9":
        spec = default_spec(tb.MODE_NRZI, **common)
        items = blocks(0, 256, 400)
        args = ["-v", "-m", "-nrzi", "-tap"]
    elif kind == "nrzi7":
        even = bool(rng.random() < 0.3)
        spec = default_spec(tb.MODE_NRZI, ntrks=7,
                            bpi=float(rng.choice([556, 800])),
                            even_parity=even, **common)
        items = blocks(0, 64, 300)
        args = ["-v", "-m", "-nrzi", "-ntrks=7", "-tap"] + (
            ["-even"] if even else [])
    elif kind == "pe":
        spec = default_spec(tb.MODE_PE, **common)
        items = blocks(0, 256, 400)
        args = ["-v", "-m", "-pe", "-bpi=1600", "-ips=50", "-tap"]
    elif kind == "gcr":
        spec = default_spec(tb.MODE_GCR, **common)
        items = blocks(0, 256, 300)
        args = ["-v", "-m", "-gcr", "-ips=25", "-tap"]
        if rng.random() < 0.3:
            args.insert(-1, "-correct")
    else:
        spec = default_spec(tb.MODE_WW, **common)
        items = []
        for _ in range(nblocks):
            nw = int(rng.integers(4, 40))
            items.append(("block",
                          [int(w) for w in rng.integers(0, 65536, nw)]))
            if rng.random() < 0.4:
                items.append(("tapemark",))
        args = ["-v", "-whirlwind", "-fluxdir=neg", "-tap"]
    hdr, samples = synthesize_tape(spec, items, seed=int(rng.integers(1 << 30)))
    return kind, hdr, samples, args


def run_one(oracle, case_dir, hdr, samples, args):
    os.makedirs(os.path.join(case_dir, "ref"), exist_ok=True)
    os.makedirs(os.path.join(case_dir, "ours"), exist_ok=True)
    tb.write_tbin(os.path.join(case_dir, "t.tbin"), hdr, samples)
    r1 = subprocess.run([oracle] + args + ["-outp=ref/", "t.tbin"],
                        cwd=case_dir, capture_output=True, text=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "readtape")] + args +
        ["-outp=ours/", "t.tbin"],
        cwd=case_dir, capture_output=True, text=True, env=env)
    if r1.returncode != 0 or r2.returncode != 0:
        return ("crash", r1.returncode, r2.returncode,
                (r1.stdout + r1.stderr)[-500:], (r2.stdout + r2.stderr)[-500:])
    ref = open(os.path.join(case_dir, "ref", "t.tap"), "rb").read()
    ours = open(os.path.join(case_dir, "ours", "t.tap"), "rb").read()
    if ref != ours:
        return ("tap-mismatch", len(ref), len(ours))
    d1, d2 = decisions(r1.stdout), decisions(r2.stdout)
    if d1 != d2:
        return ("decision-mismatch", d1, d2)
    return None


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    base_seed = int(sys.argv[2]) if len(sys.argv) > 2 else 2026
    oracle = build_oracle()
    if oracle is None:
        print("reference oracle unavailable; nothing to fuzz against")
        return 0
    keep_root = "/tmp/fuzz_oracle"
    os.makedirs(keep_root, exist_ok=True)
    fails = 0
    for i in range(iters):
        rng = np.random.default_rng(base_seed + i)
        kind, hdr, samples, args = random_case(rng)
        tmp = tempfile.mkdtemp(prefix="fz_")
        bad = run_one(oracle, tmp, hdr, samples, args)
        if bad is None:
            print(f"[{i}] {kind}: ok ({samples.shape[0]:,} samples, "
                  f"{' '.join(args)})", flush=True)
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            fails += 1
            dst = os.path.join(keep_root, f"case_{base_seed + i}_{kind}")
            shutil.rmtree(dst, ignore_errors=True)
            shutil.move(tmp, dst)
            print(f"[{i}] {kind}: FAIL {bad[0]} -> {dst}\n    {bad[1:]}",
                  flush=True)
    print(f"{iters - fails}/{iters} matched")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
