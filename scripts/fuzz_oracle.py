#!/usr/bin/env python3
"""Differential fuzzer: random synthesized tapes decoded by BOTH this
framework's CLI and the reference C binary, classified against the
synthesizer's ground truth:

  ok         .tap outputs byte-identical (and per-block decisions agree)
  win        ours matches the written data exactly; the reference lost or
             corrupted blocks (e.g. seed 3000: the C drops a clean 201-byte
             GCR block after a tapemark that we recover with 0 errors)
  FAIL       the reference matches ground truth and we do not -- a real
             fidelity bug; the case directory is preserved for replay
  divergent  neither engine recovers the tape exactly (heavy-degradation
             regime where the reference's sample-driven idle detection and
             our gap segmentation legitimately split differently); scored
             by how many ground-truth blocks each side recovered

    python scripts/fuzz_oracle.py [iterations] [base_seed] [hard]

"hard" widens noise/jitter/skew into the heavy-degradation regime.
Failing/divergent cases are preserved under /tmp/fuzz_oracle/.
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
from readtape_tpu.formats.simh import read_tap          # noqa: E402
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


def ww_words_to_bytes(words):
    out = bytearray()
    for w in words:
        out += bytes([(w >> 8) & 0xFF, w & 0xFF])
    return bytes(out)


def random_case(rng, hard=False):
    """One random tape: (name, hdr, samples, cli args, truth) where truth
    is the written sequence of ("block", bytes) / ("tapemark",)."""
    kind = rng.choice(["nrzi9", "nrzi7", "pe", "gcr", "ww"])
    if hard:
        noise = float(rng.uniform(0.02, 0.08))
        jitter = float(rng.uniform(0.0, 0.04))
        ampj = float(rng.uniform(0.0, 0.15))
        skew = tuple(int(s) for s in rng.integers(0, 6, 9))
    else:
        noise = float(rng.uniform(0.005, 0.03))
        jitter = float(rng.uniform(0.0, 0.012))
        ampj = float(rng.uniform(0.0, 0.06))
        skew = tuple(int(s) for s in rng.integers(0, 3, 9))
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
                  skew_samples=skew, seed=int(rng.integers(1 << 30)))
    if kind == "nrzi9":
        spec = default_spec(tb.MODE_NRZI, **common)
        items = blocks(0, 256, 400)
        args = ["-v", "-m", "-nrzi", "-tap"]
        r = rng.random()
        if r < 0.25:
            # -zeros exercises the sequential carry chain; kept apart
            # from -deskew (deskew calibration is peak-driven)
            args.insert(-1, "-zeros")
        elif r < 0.5:
            args.insert(-1, "-deskew")
        if rng.random() < 0.3:
            args.insert(-1, "-correct")
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
        if rng.random() < 0.3:
            args.insert(-1, "-zeros")
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
    hdr, samples = synthesize_tape(spec, items)
    truth = [("tapemark",) if it[0] == "tapemark" else
             ("block", ww_words_to_bytes(it[1]) if kind == "ww"
              else bytes(it[1]))
             for it in items]
    return kind, hdr, samples, args, truth


def tap_items(path):
    if not os.path.exists(path):
        return []
    out = []
    for rec in read_tap(path):
        if rec.kind == "data":
            out.append(("block", rec.data))
        elif rec.kind == "tapemark":
            out.append(("tapemark",))
    return out


def score(items, truth):
    """How many ground-truth blocks were recovered byte-exact."""
    got = [it[1] for it in items if it[0] == "block"]
    want = [it[1] for it in truth if it[0] == "block"]
    hits = sum(1 for w in want if w in got)
    return hits, len(want)


def run_one(oracle, case_dir, hdr, samples, args, truth):
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
        return ("crash", f"ref rc={r1.returncode} ours rc={r2.returncode}",
                (r2.stdout + r2.stderr)[-400:])
    rp = os.path.join(case_dir, "ref", "t.tap")
    op = os.path.join(case_dir, "ours", "t.tap")
    ref = open(rp, "rb").read() if os.path.exists(rp) else None
    ours = open(op, "rb").read() if os.path.exists(op) else None
    if ref == ours:
        d1, d2 = decisions(r1.stdout), decisions(r2.stdout)
        if d1 != d2:
            return ("decision-mismatch", d1, d2)
        return ("ok",)
    ri, oi = tap_items(rp), tap_items(op)
    ours_exact = oi == truth
    ref_exact = ri == truth
    if ours_exact and not ref_exact:
        return ("win", f"ours exact; ref recovered "
                f"{score(ri, truth)[0]}/{score(ri, truth)[1]} blocks")
    if ref_exact and not ours_exact:
        return ("FAIL", f"ref exact; ours recovered "
                f"{score(oi, truth)[0]}/{score(oi, truth)[1]} blocks")
    rs, os_ = score(ri, truth), score(oi, truth)
    return ("divergent", f"blocks exact: ref {rs[0]}/{rs[1]}, "
            f"ours {os_[0]}/{os_[1]}")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    base_seed = int(sys.argv[2]) if len(sys.argv) > 2 else 2026
    hard = len(sys.argv) > 3 and sys.argv[3] == "hard"
    oracle = build_oracle()
    if oracle is None:
        print("reference oracle unavailable; nothing to fuzz against")
        return 0
    keep_root = "/tmp/fuzz_oracle"
    os.makedirs(keep_root, exist_ok=True)
    counts = {}
    fails = 0
    for i in range(iters):
        rng = np.random.default_rng(base_seed + i)
        kind, hdr, samples, args, truth = random_case(rng, hard)
        tmp = tempfile.mkdtemp(prefix="fz_")
        verdict = run_one(oracle, tmp, hdr, samples, args, truth)
        tag = verdict[0]
        counts[tag] = counts.get(tag, 0) + 1
        if tag in ("ok",):
            shutil.rmtree(tmp, ignore_errors=True)
            print(f"[{i}] {kind}: ok ({samples.shape[0]:,} samples)",
                  flush=True)
        else:
            dst = os.path.join(keep_root, f"case_{base_seed + i}_{kind}")
            shutil.rmtree(dst, ignore_errors=True)
            shutil.move(tmp, dst)
            if tag in ("FAIL", "crash", "decision-mismatch"):
                fails += 1
            print(f"[{i}] {kind}: {tag} {verdict[1:]} -> {dst}", flush=True)
    print("summary:", counts)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
