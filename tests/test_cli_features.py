"""CLI feature tests: file lists, tapread, textfile output, trace."""

import os
import subprocess
import sys

import numpy as np

from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.simh import TapWriter
from readtape_tpu.synth import default_spec, synthesize_tape

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu")


def _cli(args, cwd):
    return subprocess.run([sys.executable, os.path.join(REPO, "readtape")] +
                          args, cwd=cwd, env=ENV, capture_output=True,
                          text=True)


def test_filelist(tmp_path):
    rng = np.random.default_rng(60)
    for i in range(2):
        block = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
        hdr, samples = synthesize_tape(default_spec(tb.MODE_NRZI),
                                       [("block", block)])
        tb.write_tbin(str(tmp_path / f"t{i}.tbin"), hdr, samples)
        (tmp_path / f"exp{i}.bin").write_bytes(block)
    (tmp_path / "list.txt").write_text(
        "-nrzi -m t0\n"
        "-nrzi -m t1\n")
    r = _cli(["-f", "list"], tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "t0: ok" in r.stdout and "t1: ok" in r.stdout
    assert (tmp_path / "t0.001.bin").read_bytes() == \
        (tmp_path / "exp0.bin").read_bytes()
    assert (tmp_path / "t1.001.bin").read_bytes() == \
        (tmp_path / "exp1.bin").read_bytes()


def test_tapread_textfile(tmp_path):
    w = TapWriter(str(tmp_path / "x.tap"))
    w.write_block(b"HELLO WORLD AA", error=False)
    w.write_tapemark()
    w.write_eom()
    w.close()
    r = _cli(["-tapread", "-hex", "-ascii", "x.tap"], tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    outs = [f for f in os.listdir(tmp_path) if f.endswith(".txt")]
    assert outs, "no text file produced"
    text = (tmp_path / outs[0]).read_text()
    assert "HELLO WORLD AA" in text
    assert "48454C4C4F" in text.replace(" ", "")
    assert "tape mark" in text


def test_textfile_and_peakstats(tmp_path):
    rng = np.random.default_rng(61)
    block = bytes(rng.integers(0, 256, 80, dtype=np.uint8))
    hdr, samples = synthesize_tape(default_spec(tb.MODE_NRZI),
                                   [("block", block)])
    tb.write_tbin(str(tmp_path / "p.tbin"), hdr, samples)
    r = _cli(["-nrzi", "-m", "-hex", "-ebcdic", "p.tbin"], tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert (tmp_path / "p.hex.ebcdic.txt").exists()
    assert (tmp_path / "p.peakstats.csv").exists()
    stats = (tmp_path / "p.peakstats.csv").read_text().splitlines()
    assert len(stats) == 10 and stats[0].startswith("total cnt")


def test_ibm_labels_name_output_files(tmp_path):
    """VOL1/HDR1/EOF1 label blocks are absorbed and the HDR1 dataset id
    names the output file (ibmlabels.c:147-153)."""
    from readtape_tpu.out.charsets import EBCDIC
    rev = {}
    for i in range(256):
        ch = chr(EBCDIC[i])
        if ch not in rev:
            rev[ch] = i

    def ebc(s):
        return bytes(rev[c] for c in s)

    vol1 = ebc("VOL1SER001" + " " * 31 + "OWNER     " + " " * 29)
    hdr1 = ebc("HDR1MYDATA" + " " * 11 + "SER001" + "0001" * 3 + "00"
               + "990101" + "000000" + "0" + "000000" + " " * 13 + " " * 7)
    eof1 = ebc("EOF1MYDATA" + " " * 11 + "SER001" + "0001" * 3 + "00"
               + "990101" + "000000" + "0" + "000001" + " " * 13 + " " * 7)
    assert len(vol1) == len(hdr1) == len(eof1) == 80
    rng = np.random.default_rng(62)
    payload = bytes(rng.integers(0, 256, 100, dtype=np.uint8))
    hdr, samples = synthesize_tape(
        default_spec(tb.MODE_NRZI),
        [("block", vol1), ("block", hdr1), ("block", payload),
         ("block", eof1), ("tapemark",)])
    tb.write_tbin(str(tmp_path / "lab.tbin"), hdr, samples)
    r = _cli(["-nrzi", "-m", "lab.tbin"], tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "tape label VOL1" in r.stdout
    assert 'dsid "MYDATA"' in r.stdout
    outs = [f for f in os.listdir(tmp_path) if f.endswith(".bin")]
    assert len(outs) == 1 and "MYDATA" in outs[0]
    assert (tmp_path / outs[0]).read_bytes() == payload


def test_dumptap(tmp_path):
    """dumptap compatibility shim: header/record layout of dumptap.c."""
    from readtape_tpu.dumptap import main as dumptap_main
    w = TapWriter(str(tmp_path / "d.tap"))
    w.write_block(b"HELLO", error=False)
    w.write_block(b"BAD", error=True)
    w.write_tapemark()
    w.write_eom()
    w.close()
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert dumptap_main(["-hex", "-ascii", "-linesize=4", "d"]) == 0
    finally:
        os.chdir(old)
    text = (tmp_path / "d.hex.ASCII.txt").read_text()
    assert text.startswith("dumptap file:d\n")
    assert "options: -hex -ASCII -LINESIZE=4" in text
    assert "   5: 48454C4C" in text and "HELL" in text
    assert "!   3: 424144" in text
    assert ".tap tape mark" in text and ".tap end of medium" in text
