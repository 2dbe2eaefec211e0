"""Multi-block NRZI segments: gaps SHORTER than the segmenter's min_gap
merge several blocks into one segment; the slot scan ends at each block's
postamble idle and the host re-dispatches the remainder, so every block
is still recovered — matching the reference's per-block re-entry
(readtape.c:1720-1882). Round-1 behavior silently dropped everything
after the first block of such a segment."""

import os
import subprocess
import sys

import numpy as np

from readtape_tpu.decode.pipeline import DecodeOptions, decode_tape
from readtape_tpu.formats import tbin as tb
from readtape_tpu.synth import default_spec, synthesize_tape

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_tape(ibg_secs):
    rng = np.random.default_rng(83)
    blocks = [bytes(rng.integers(0, 256, 120, dtype=np.uint8))
              for _ in range(4)]
    spec = default_spec(tb.MODE_NRZI, ibg_secs=ibg_secs,
                        start_gap_secs=0.004)
    hdr, samples = synthesize_tape(spec, [("block", b) for b in blocks])
    return hdr, samples, blocks


def test_sub_min_gap_blocks_all_recovered():
    # 0.8 ms gaps < the 1.5 ms min_gap: all 4 blocks share one segment
    hdr, samples, blocks = _mk_tape(0.0008)
    opts = DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                         deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)
    out, stats = decode_tape(samples, opts)
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == blocks, \
        f"recovered {len(datas)}/4 blocks from the merged segment"
    assert stats["nerrblocks"] == 0


def test_sub_min_gap_tap_identical_to_oracle(oracle, tmp_path):
    hdr, samples, blocks = _mk_tape(0.0008)
    tb.write_tbin(str(tmp_path / "mb.tbin"), hdr, samples)
    (tmp_path / "ref").mkdir()
    (tmp_path / "ours").mkdir()
    args = ["-v", "-m", "-nrzi", "-bpi=800", "-ips=50", "-tap"]
    r1 = subprocess.run([oracle] + args + ["-outp=ref/", "mb.tbin"],
                        cwd=tmp_path, capture_output=True, text=True)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "readtape")] + args +
        ["-outp=ours/", "mb.tbin"],
        cwd=tmp_path, capture_output=True, text=True, env=env)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert (tmp_path / "ref" / "mb.tap").read_bytes() == \
        (tmp_path / "ours" / "mb.tap").read_bytes()
