"""Output-layer tests: interpreted text dump, IBM labels, peakstats."""

import numpy as np

from readtape_tpu.out.charsets import EBCDIC, translate
from readtape_tpu.out.labels import describe_label, parse_label
from readtape_tpu.out.peakstats import write_peakstats
from readtape_tpu.out.textfile import TextFile, TxtOptions


def _ebc(s: str) -> bytes:
    """ASCII -> EBCDIC for building test labels."""
    rev = {}
    for i in range(256):
        ch = chr(EBCDIC[i])
        if ch not in rev:
            rev[ch] = i
    return bytes(rev[c] for c in s)


def test_charsets():
    assert translate(0xC1, "ebcdic") == "A"
    assert translate(0xF9, "ebcdic") == "9"
    assert translate(0o61, "bcd") == "A"
    assert translate(0o21, "b5500") == "A"
    assert translate(0x41, "ascii") == "A"
    assert translate(1, "sixbit") == "!"
    assert translate(0o21, "sds") == "A"
    assert translate(1, "cdc") == "A"
    assert translate(0o61, "univac") == "1"


def test_textfile_hex_ascii(tmp_path):
    path = str(tmp_path / "x.txt")
    t = TextFile(path, TxtOptions("hex", "ascii", linesize=16), "0.1")
    t.output_record(b"Hello, tape world!", 0, 0, blocknum=1, timenow=1.5,
                    errinfo="ok")
    t.tapemark(2.0)
    t.close()
    out = open(path).read()
    assert "48656C6C6F" in out.replace(" ", "")
    assert "Hello, tape woun" not in out
    assert "Hello, tape wor" in out
    assert "tape mark at time 2.0" in out
    assert "1 data blocks" in out.replace("there were ", "1 ", 1) or \
        "there were 1 data blocks" in out


def test_textfile_octal2_flag_lines(tmp_path):
    path = str(tmp_path / "y.txt")
    t = TextFile(path, TxtOptions("octal2", "none"), "0.1", ntrks=6)
    t.output_record(bytes(range(8)), 1, 0, blocknum=1, timenow=0.1,
                    errinfo="1 err")
    t.close()
    out = open(path).read()
    assert "000001" in out        # 16-bit octal words
    assert "block 1: 8 bytes" in out


def test_ibm_labels():
    vol = _ebc("VOL1ABCDEF" + " " * 31 + "OWNERNAME " + " " * 29)
    assert len(vol) == 80
    info = parse_label(vol)
    assert info.kind == "VOL1" and info.fields["serno"] == "ABCDEF"
    assert "OWNERNAME" in describe_label(info)

    hdr1 = _ebc("HDR1DATASET.NAME  " + " " * 3 + "SERIAL" + "0001" + "0001"
                + "0001" + "00" + "990101" + "000000" + "0" + "000000"
                + "SYSTEMCODE   " + " " * 7)
    assert len(hdr1) == 80
    info = parse_label(hdr1)
    assert info.kind == "HDR1"
    assert info.fields["dsid"] == "DATASET.NAME"
    assert info.dataset_filename == "DATASET.NAME"

    assert parse_label(b"\x00" * 80) is None
    assert parse_label(b"ab") is None


def test_peakstats_csv(tmp_path):
    hist = np.zeros((9, 50), np.int64)
    hist[:, 25] = 100
    hist[0, 0] = 3
    sums = np.full(9, 100, np.int64)
    path = str(tmp_path / "p.csv")
    total = write_peakstats(path, hist, sums, 12.5e-6, 0.5e-6, True)
    assert total == 900
    lines = open(path).read().splitlines()
    assert lines[0].startswith("total cnt")
    assert lines[1].startswith("103, 3, 0,trk0")
    assert "100.00%" in lines[1]
