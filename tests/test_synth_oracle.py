"""Differential validation of the waveform synthesizer: the reference C
binary must decode synthesized tapes bit-exactly with zero errors. These
synthetic tapes are then the golden fixtures for our TPU decoder."""

import subprocess

import numpy as np
import pytest

from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.simh import read_tap
from readtape_tpu.synth import default_spec, synthesize_tape


def run_decode(oracle, tmp_path, name, spec, items, args):
    hdr, samples = synthesize_tape(spec, items)
    tb.write_tbin(str(tmp_path / f"{name}.tbin"), hdr, samples)
    r = subprocess.run([oracle] + args + ["-tap", f"{name}.tbin"],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    recs = read_tap(str(tmp_path / f"{name}.tap"))
    datas = [rec.data for rec in recs if rec.kind == "data"]
    marks = sum(1 for rec in recs if rec.kind == "tapemark")
    errs = sum(1 for rec in recs if rec.error)
    return datas, marks, errs, r.stdout


def test_nrzi9_oracle(oracle, tmp_path):
    rng = np.random.default_rng(11)
    blocks = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
              for n in (80, 200, 1024)]
    spec = default_spec(tb.MODE_NRZI)
    datas, marks, errs, _ = run_decode(
        oracle, tmp_path, "n9", spec,
        [("block", b) for b in blocks] + [("tapemark",)],
        ["-v", "-m", "-nrzi"])
    assert datas == blocks and marks == 1 and errs == 0


def test_nrzi7_oracle(oracle, tmp_path):
    rng = np.random.default_rng(12)
    blocks = [bytes(rng.integers(0, 64, 120, dtype=np.uint8)) for _ in range(2)]
    spec = default_spec(tb.MODE_NRZI, ntrks=7, bpi=556)
    datas, marks, errs, _ = run_decode(
        oracle, tmp_path, "n7", spec,
        [("block", blocks[0]), ("tapemark",), ("block", blocks[1])],
        ["-v", "-m", "-nrzi", "-ntrks=7"])
    assert datas == blocks and marks == 1 and errs == 0


def test_nrzi7_even_parity_oracle(oracle, tmp_path):
    rng = np.random.default_rng(13)
    blocks = [bytes(rng.integers(1, 64, 60, dtype=np.uint8))]
    spec = default_spec(tb.MODE_NRZI, ntrks=7, bpi=800, even_parity=True)
    datas, marks, errs, _ = run_decode(
        oracle, tmp_path, "n7e", spec, [("block", blocks[0])],
        ["-v", "-m", "-nrzi", "-ntrks=7", "-even"])
    assert datas == blocks and errs == 0


def test_pe_oracle(oracle, tmp_path):
    rng = np.random.default_rng(14)
    blocks = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
              for n in (64, 513)]
    spec = default_spec(tb.MODE_PE)
    datas, marks, errs, _ = run_decode(
        oracle, tmp_path, "pe", spec,
        [("block", blocks[0]), ("block", blocks[1]), ("tapemark",)],
        ["-v", "-m", "-pe", "-bpi=1600", "-ips=50"])
    assert datas == blocks and marks == 1 and errs == 0


def test_gcr_oracle(oracle, tmp_path):
    rng = np.random.default_rng(15)
    blocks = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
              for n in (154, 100)]      # multiple of 7, and a residual case
    spec = default_spec(tb.MODE_GCR)
    datas, marks, errs, out = run_decode(
        oracle, tmp_path, "gcr", spec,
        [("block", blocks[0]), ("block", blocks[1]), ("tapemark",)],
        ["-v", "-m", "-gcr", "-ips=25"])
    assert datas == blocks and marks == 1 and errs == 0


def test_ww_oracle(oracle, tmp_path):
    rng = np.random.default_rng(16)
    words = [int(w) for w in rng.integers(0, 65536, 40)]
    exp = b"".join(bytes([w >> 8, w & 0xFF]) for w in words)
    spec = default_spec(tb.MODE_WW)
    datas, marks, errs, _ = run_decode(
        oracle, tmp_path, "ww", spec,
        [("block", words), ("tapemark",), ("block", words[:8])],
        ["-v", "-whirlwind", "-fluxdir=neg"])
    exp2 = b"".join(bytes([w >> 8, w & 0xFF]) for w in words[:8])
    assert datas == [exp, exp2] and marks == 1 and errs == 0


def test_nrzi_with_noise_and_skew(oracle, tmp_path):
    rng = np.random.default_rng(17)
    blocks = [bytes(rng.integers(0, 256, 256, dtype=np.uint8))]
    spec = default_spec(tb.MODE_NRZI, noise_rms=0.05, amp_jitter=0.1,
                        skew_samples=(0, 2, 1, 0, 3, 0, 1, 2, 0))
    datas, marks, errs, _ = run_decode(
        oracle, tmp_path, "nsk", spec, [("block", blocks[0])],
        ["-v", "-m", "-nrzi", "-deskew"])
    assert datas == blocks and errs == 0
