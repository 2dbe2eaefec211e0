"""End-to-end tests of the TPU Whirlwind decoder."""

import numpy as np

from readtape_tpu.formats import tbin as tb
from readtape_tpu.synth import default_spec, synthesize_tape
from readtape_tpu.decode.pipeline import DecodeOptions, decode_tape


def _words_bytes(words):
    return b"".join(bytes([w >> 8, w & 0xFF]) for w in words)


def _decode(spec, items, **opt_kw):
    hdr, samples = synthesize_tape(spec, items)
    kw = dict(mode=spec.mode, ntrks=spec.ntrks, bpi=spec.bpi, ips=spec.ips,
              deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts,
              ww_order=spec.ww_order, multiple_tries=False)
    kw.update(opt_kw)
    return decode_tape(samples, DecodeOptions(**kw))


def test_ww_basic():
    rng = np.random.default_rng(40)
    words = [int(w) for w in rng.integers(0, 65536, 40)]
    out, stats = _decode(default_spec(tb.MODE_WW),
                         [("block", words), ("tapemark",),
                          ("block", words[:8])],
                         fluxdir="neg")
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == [_words_bytes(words), _words_bytes(words[:8])]
    assert sum(1 for b in out if b.kind == "tapemark") == 1
    assert all(b.errcount == 0 and b.warncount == 0 for b in out)


def test_ww_fluxdir_auto():
    rng = np.random.default_rng(41)
    words = [int(w) for w in rng.integers(0, 65536, 24)]
    out, _ = _decode(default_spec(tb.MODE_WW),
                     [("block", words)], fluxdir="auto")
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == [_words_bytes(words)]


def test_ww_reverse():
    """-reverse: bit pairs within words and words within the block reversed
    (decode_ww.c:107-114)."""
    rng = np.random.default_rng(42)
    words = [int(w) for w in rng.integers(0, 65536, 16)]
    out, _ = _decode(default_spec(tb.MODE_WW), [("block", words)],
                     fluxdir="neg", reverse=True)
    datas = [b.data for b in out if b.kind == "data"]
    # reversed 2-bit chars, repacked 4 per byte
    two = []
    for w in words:
        for nib in range(8):
            two.append((w >> (14 - 2 * nib)) & 3)
    two = two[::-1]
    exp = bytes((two[i] << 6) | (two[i + 1] << 4) | (two[i + 2] << 2) |
                two[i + 3] for i in range(0, len(two), 4))
    assert datas == [exp]


def test_ww_abutting_blockmark():
    """Blockmarks can directly follow a block within ~a bit time; the queued
    blockmark must still be emitted (decode_ww.c:144-158)."""
    rng = np.random.default_rng(43)
    words = [int(w) for w in rng.integers(0, 65536, 8)]
    spec = default_spec(tb.MODE_WW, ibg_secs=0.004)
    out, _ = _decode(spec, [("block", words), ("tapemark",),
                            ("tapemark",), ("block", words)],
                     fluxdir="neg")
    kinds = [b.kind for b in out]
    assert kinds == ["data", "tapemark", "tapemark", "data"]
    datas = [b.data for b in out if b.kind == "data"]
    assert datas == [_words_bytes(words)] * 2


def test_ww_order_parsing():
    from readtape_tpu.decode.ww import parse_ww_order, NOTRK
    t2t, h2t, n = parse_ww_order("CMLcml")
    assert n == 6 and h2t == [0, 1, 2, 3, 4, 5]
    # ignored heads ('x') are dropped from the track numbering
    t2t, h2t, n = parse_ww_order("xCxMxLxx")
    assert n == 3 and h2t == [NOTRK, 0, NOTRK, 1, NOTRK, 2, NOTRK, NOTRK]
    import pytest
    with pytest.raises(ValueError):
        parse_ww_order("Mcml")       # no primary clock


def test_ww_chunked_matches_single(monkeypatch):
    """The chunked admission front end + rolling-base global scan
    (captures beyond READTAPE_WW_SINGLE_MAX; the old hard 2^26-sample cap
    is gone) must reproduce the single-pass decode byte for byte. Forced
    here with a small chunk size on a mid-size capture whose blocks
    straddle several chunk boundaries."""
    rng = np.random.default_rng(77)
    spec = default_spec(tb.MODE_WW)
    items = []
    for i in range(12):
        words = [int(w) for w in rng.integers(0, 65536, 120)]
        items.append(("block", words))
        if i == 5:
            items.append(("tapemark",))
    out_ref, stats_ref = _decode(spec, items, fluxdir="neg")

    monkeypatch.setenv("READTAPE_WW_SINGLE_MAX", str(1 << 18))
    monkeypatch.setenv("READTAPE_WW_CHUNK", str(1 << 17))
    out_ch, stats_ch = _decode(spec, items, fluxdir="neg")

    assert [b.kind for b in out_ch] == [b.kind for b in out_ref]
    assert [b.data for b in out_ch] == [b.data for b in out_ref]
    assert [b.errcount for b in out_ch] == [b.errcount for b in out_ref]
    assert stats_ch["nblocks"] == 12 and stats_ch["ntapemarks"] == 1
    np.testing.assert_array_equal(stats_ch["peak_hist"],
                                  stats_ref["peak_hist"])
    for a, b in zip(out_ch, out_ref):
        assert abs(a.t_end - b.t_end) < 1e-6
