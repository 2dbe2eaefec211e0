"""The fused NRZI kernel (features + admission + slot scan + bit
accumulation in one sweep) must reproduce the XLA reference pipeline's
pre-finish state EXACTLY: bits, dc, kvis, n_admitted, AGC extrema, peak
histogram, trksums, midbit warnings, first/last bit times, end position —
across parmsets, track counts, multi-block segments, and -correct."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from readtape_tpu.decode import common as cm
from readtape_tpu.decode import nrzi as nrzi_mod
from readtape_tpu.decode import trackscan as ts
from readtape_tpu.decode import pallas_fused as pf
from readtape_tpu.decode.common import F32, I32
from readtape_tpu.decode.pipeline import _mask_jump_table, _union_jump_table
from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.parms import builtin_parmsets
from readtape_tpu.synth import default_spec, synthesize_tape


def _make_volts(S, seed=13, nblocks=1, ibg=0.002, ntrks=9, noise=0.0):
    rng = np.random.default_rng(seed)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=ibg, start_gap_secs=0.001,
                        ntrks=ntrks)
    items = []
    hi = 256 if ntrks == 9 else 64
    for _ in range(nblocks):
        items.append(("block",
                      bytes(rng.integers(0, hi, 100, dtype=np.uint8))))
    hdr, samples = synthesize_tape(spec, items)
    v = samples.T.astype(np.float32) * (hdr.maxvolts / 32767.0)
    if noise:
        v = v + rng.normal(0.0, noise, v.shape).astype(np.float32)
    v = v[:, :S]
    if v.shape[1] < S:
        v = np.pad(v, ((0, 0), (0, S - v.shape[1])))
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (800 * 50 * deltat)
    return jnp.asarray(v), spb


def _xla_reference(v, spb, sets, S, T, K, maxb, max_slots, lb, bw,
                   seg_len, lead, rise_floor, min_floor, do_correct=False,
                   expected_parity=1):
    """The production XLA path: union jump table -> per-parmset track
    scans -> slot scans; returns the list of per-parmset st dicts plus
    track-scan finals."""
    deltat_Ws = [cm.pkww_width_for(p.pkww_bitfrac, 800, 50,
                                   1.0 / (800 * 50 * spb)) for p in sets]
    Ws = tuple(deltat_Ws)
    nxt = _mask_jump_table(_union_jump_table(v, Ws, rise_floor, min_floor),
                           seg_len, lead, S)
    refs = []
    finals_l = []
    for p, W in zip(sets, Ws):
        feat = ts.precompute_window_features(v, W, nxt)
        lane = jax.vmap(lambda f, nx, W=W, p=p: ts.nrzi_track_scan_pre(
            f, nx, W, S, S, K, jnp.float32(p.pkww_rise),
            jnp.float32(p.min_peak), jnp.float32(p.agc_alpha),
            jnp.int32(p.agc_window)))
        fin = lane(feat, nxt)
        keep = jnp.arange(K) < fin["n_admitted"][:, None]
        tr_s = jnp.where(keep, fin["tr_s"], nrzi_mod.BIG_S)
        tr_t = jnp.where(keep, fin["tr_t"], 0.0)
        tr_agc = jnp.where(keep, fin["tr_agc"], 1.0)
        st = nrzi_mod.nrzi_slot_scan(
            tr_s, tr_t, tr_agc, fin["n_admitted"], S,
            jnp.float32(spb), jnp.int32(p.clk_window),
            jnp.float32(p.clk_alpha), jnp.float32(p.pulse_adj),
            jnp.float32(p.midbit), jnp.int32(expected_parity), do_correct,
            maxb, max_slots, jnp.float32(lb), jnp.float32(bw))
        refs.append(jax.tree.map(np.asarray, st))
        finals_l.append(jax.tree.map(np.asarray, fin))
    return refs, finals_l


def _run_fused(v, spb, sets, S, T, maxb, max_slots, lb, bw, seg_len, lead,
               rise_floor, min_floor, do_correct=False, expected_parity=1):
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 800, 50,
                                 1.0 / (800 * 50 * spb)) for p in sets)
    volts = jnp.pad(v, ((0, 16 - T), (0, 0)))[None]       # [1, 16, S]
    meta = np.zeros((1, 16, 128), np.float32)
    meta[0, :, pf.M_SEGLEN] = seg_len
    meta[0, :, pf.M_LEAD] = lead
    meta[0, :, pf.M_STATLB] = lb
    meta[0, :, pf.M_STATBW] = bw
    meta[0, :, pf.M_EXPPAR] = expected_parity
    meta[0, :T, pf.M_RISEF] = np.asarray(rise_floor)
    meta[0, :T, pf.M_MINF] = np.asarray(min_floor)
    agc_ring = max(max(p.agc_window for p in sets), 1)
    bits, hist, scal = pf.nrzi_fused_scan(
        volts, jnp.asarray(meta), S=S, T=T, P=len(sets), maxb=maxb,
        max_slots=max_slots,
        Ws=Ws,
        rises=tuple(float(p.pkww_rise) for p in sets),
        minps=tuple(float(p.min_peak) for p in sets),
        aalphas=tuple(float(p.agc_alpha) for p in sets),
        awindows=tuple(int(p.agc_window) for p in sets),
        clk_windows=tuple(int(p.clk_window) for p in sets),
        clk_alphas=tuple(float(p.clk_alpha) for p in sets),
        pulse_adjs=tuple(float(p.pulse_adj) for p in sets),
        midbits=tuple(float(p.midbit) for p in sets),
        spb=float(spb), do_correct=do_correct, agc_ring=agc_ring,
        interpret=True)
    outs = []
    for pi in range(len(sets)):
        st = pf.fused_state(bits[0, pi], hist[0, pi], scal[0, pi],
                            T=T, maxb=maxb)
        outs.append({k: np.asarray(x) for k, x in st.items()})
    return outs


@pytest.mark.parametrize("nblocks,ibg,ntrks,noise",
                         [(1, 0.002, 9, 0.0),
                          (3, 0.0008, 9, 0.0),
                          (1, 0.002, 7, 0.0),
                          (2, 0.0012, 9, 0.02)])
def test_fused_matches_xla(nblocks, ibg, ntrks, noise):
    S = 8192 if nblocks == 1 else 16384
    P = 3
    T = ntrks
    v, spb = _make_volts(S, nblocks=nblocks, ibg=ibg, ntrks=ntrks,
                         noise=noise)
    sets = builtin_parmsets(tb.MODE_NRZI).sets[:P]
    K = int(S / spb * 2.5) + 64
    maxb = int(S / spb * 1.3) + 64
    max_slots = int(S / spb * 1.25) + 48
    lb, bw = 0.0, 1.0
    rise_floor = np.full(T, 0.02, np.float32)
    min_floor = np.zeros(T, np.float32)

    refs, finals = _xla_reference(v, spb, sets, S, T, K, maxb, max_slots,
                                  lb, bw, S, 0, jnp.asarray(rise_floor),
                                  jnp.asarray(min_floor))
    outs = _run_fused(v, spb, sets, S, T, maxb, max_slots, lb, bw, S, 0,
                      rise_floor, min_floor)

    for pi, (r, fin, got) in enumerate(zip(refs, finals, outs)):
        msg = f"parmset {pi}"
        np.testing.assert_array_equal(got["n_admitted"],
                                      fin["n_admitted"], err_msg=msg)
        np.testing.assert_array_equal(got["kvis"], r["kvis"], err_msg=msg)
        np.testing.assert_array_equal(got["dc"], r["dc"], err_msg=msg)
        np.testing.assert_array_equal(got["bits"], r["bits"], err_msg=msg)
        np.testing.assert_array_equal(got["hist"], r["hist"], err_msg=msg)
        np.testing.assert_array_equal(got["trksums"], r["trksums"],
                                      err_msg=msg)
        assert int(got["missed_midbits"]) == int(r["missed_midbits"]), msg
        np.testing.assert_allclose(got["t_firstbit"], r["t_firstbit"],
                                   rtol=0, atol=0, err_msg=msg)
        np.testing.assert_allclose(got["t_lastbit"], r["t_lastbit"],
                                   rtol=0, atol=0, err_msg=msg)
        np.testing.assert_allclose(got["max_agc_gain"],
                                   fin["max_agc_gain"], rtol=0, atol=0,
                                   err_msg=msg)
        np.testing.assert_allclose(got["min_agc_gain"],
                                   fin["min_agc_gain"], rtol=0, atol=0,
                                   err_msg=msg)
        assert bool(got["consume_overflow"]) == \
            bool(r["consume_overflow"]), msg
        assert int(got["end_s"]) == int(r["end_s"]), msg
        assert not bool(got["bail"]), msg
        assert r["dc"].max() > 50, "segment decoded too little"


def test_fused_correct_matches_xla():
    """-correct (AGC-keyed column-0 flip) on the fused path."""
    S, P, T = 8192, 2, 9
    v, spb = _make_volts(S, seed=99, noise=0.05)
    sets = builtin_parmsets(tb.MODE_NRZI).sets[:P]
    K = int(S / spb * 2.5) + 64
    maxb = int(S / spb * 1.3) + 64
    max_slots = int(S / spb * 1.25) + 48
    rise_floor = np.full(T, 0.02, np.float32)
    min_floor = np.zeros(T, np.float32)

    refs, finals = _xla_reference(
        v, spb, sets, S, T, K, maxb, max_slots, 0.0, 1.0, S, 0,
        jnp.asarray(rise_floor), jnp.asarray(min_floor), do_correct=True)
    outs = _run_fused(v, spb, sets, S, T, maxb, max_slots, 0.0, 1.0, S, 0,
                      rise_floor, min_floor, do_correct=True)
    for pi, (r, got) in enumerate(zip(refs, outs)):
        msg = f"parmset {pi}"
        np.testing.assert_array_equal(got["bits"], r["bits"], err_msg=msg)
        np.testing.assert_array_equal(got["dc"], r["dc"], err_msg=msg)
        assert int(got["corrected_bits"]) == int(r["corrected_bits"]), msg
        assert int(got["faked_tracks"]) == int(r["faked_tracks"]), msg


@pytest.fixture()
def fresh_caches():
    """The production-wiring tests run whole decode_tape pipelines; with
    the full suite's accumulated executables the XLA:CPU runtime has been
    observed to segfault inside a compiled program (reproduced at
    test_gcr_fused_production_wiring after ~90 prior tests). Dropping the
    lru-cached batch programs and jax's caches before each wiring decode
    avoids the pathological state and keeps suite memory bounded."""
    import jax
    from readtape_tpu.decode.pipeline import _batched_fn
    _batched_fn.cache_clear()
    jax.clear_caches()
    yield


def test_fused_production_wiring(fresh_caches, monkeypatch):
    """End-to-end decode_tape through the fused group function (forced on
    for CPU via READTAPE_PALLAS=1; the kernel runs in interpret mode):
    decoded blocks must match the XLA path byte for byte."""
    from readtape_tpu.decode import pipeline as pl
    rng = np.random.default_rng(7)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.004, start_gap_secs=0.004)
    blocks = [bytes(rng.integers(0, 256, 200, dtype=np.uint8))
              for _ in range(3)]
    items = [("block", b) for b in blocks] + [("tapemark",)]
    hdr, samples = synthesize_tape(spec, items)
    opts = pl.DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                            deltat=hdr.tdelta_ns * 1e-9,
                            maxvolts=hdr.maxvolts)
    monkeypatch.setenv("READTAPE_PALLAS", "0")
    out_ref, stats_ref = pl.decode_tape(samples, opts)
    monkeypatch.setenv("READTAPE_PALLAS", "1")
    monkeypatch.setenv("READTAPE_FUSED", "1")
    out_f, stats_f = pl.decode_tape(samples, opts)
    assert [b.data for b in out_f] == [b.data for b in out_ref]
    assert [b.kind for b in out_f] == [b.kind for b in out_ref]
    assert stats_f["nblocks"] == 3 and stats_f["ntapemarks"] == 1
    assert stats_f["nerrblocks"] == stats_ref["nerrblocks"]
    np.testing.assert_array_equal(stats_f["peak_hist"],
                                  stats_ref["peak_hist"])


def test_fused_bail_rescue(fresh_caches, monkeypatch):
    """A pathological mid-block noise burst admits transitions faster than
    the slot machine consumes them; the fused kernel's transition ring
    (RING=256 per track) would overwrite unconsumed entries, so it sets
    the bail flag and the pipeline re-decodes the segment through the
    exact XLA path (pipeline.rescue_bailed). This exercises the rescue
    end-to-end: the bail must fire AND the rescued output must be byte-
    identical to a pure-XLA decode."""
    from readtape_tpu.decode import pipeline as pl
    rng = np.random.default_rng(3)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.004, start_gap_secs=0.004)
    payload = bytes(rng.integers(0, 256, 320, dtype=np.uint8))
    hdr, samples = synthesize_tape(spec, [("block", payload)])
    samples = np.asarray(samples).copy()
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (800 * 50 * deltat)
    # dense period-4 square burst (a peak every 2 samples on every track)
    # across bit cells 100..260 of the block: admission outpaces the
    # <=8-per-track-per-slot consume capacity while the machine is live
    a = int(0.004 / deltat + 100 * spb)
    b = int(0.004 / deltat + 260 * spb)
    amp = np.int16(2.0 / hdr.maxvolts * 32767)
    tt = np.arange(b - a)
    sq = np.where((tt // 2) % 2 == 0, amp, -amp).astype(np.int16)
    samples[a:b, :] = sq[:, None]

    opts = pl.DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                            deltat=deltat, maxvolts=hdr.maxvolts)
    monkeypatch.setenv("READTAPE_PALLAS", "0")
    out_ref, stats_ref = pl.decode_tape(samples, opts)

    monkeypatch.setenv("READTAPE_PALLAS", "1")
    monkeypatch.setenv("READTAPE_FUSED", "1")
    calls = []
    orig = pl.TapeDecoder.decode_segment_batch

    def spy(self, *args, **kw):
        calls.append(bool(kw.get("force_xla", False)))
        return orig(self, *args, **kw)

    monkeypatch.setattr(pl.TapeDecoder, "decode_segment_batch", spy)
    out_f, stats_f = pl.decode_tape(samples, opts)
    assert calls, "decode_segment_batch never dispatched"
    assert True in calls, "rescue (force_xla) never triggered"
    assert [b_.data for b_ in out_f] == [b_.data for b_ in out_ref]
    assert [b_.kind for b_ in out_f] == [b_.kind for b_ in out_ref]
    assert stats_f["nerrblocks"] == stats_ref["nerrblocks"]


# ---------------------------------------------------------------------------
# PE fused kernel
# ---------------------------------------------------------------------------

def _pe_xla_reference(v, spb, sets, S, T, maxb, lb, bw, seg_len, lead,
                      rise_floor, min_floor):
    from readtape_tpu.decode import pe as pe_mod
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 1600, 50,
                                 1.0 / (1600 * 50 * spb)) for p in sets)
    nxt = _mask_jump_table(_union_jump_table(v, Ws, rise_floor, min_floor),
                           seg_len, lead, S)
    outs = []
    for p, W in zip(sets, Ws):
        feat = ts.precompute_window_features(v, W, nxt)
        lane = jax.vmap(lambda f, nx, W=W, p=p: pe_mod.pe_track_scan(
            f, nx, W, S, S, jnp.float32(p.pkww_rise),
            jnp.float32(p.min_peak), jnp.float32(p.agc_alpha),
            jnp.int32(p.agc_window), jnp.int32(p.clk_window),
            jnp.float32(p.clk_alpha), jnp.float32(p.clk_factor),
            jnp.float32(p.pulse_adj), jnp.float32(spb), maxb,
            jnp.float32(lb), jnp.float32(bw), pre=True))
        outs.append(jax.tree.map(np.asarray, lane(feat, nxt)))
    return outs


@pytest.mark.parametrize("nblocks,ibg,noise", [(1, 0.003, 0.0),
                                               (2, 0.0015, 0.03)])
def test_pe_fused_matches_xla(nblocks, ibg, noise):
    from readtape_tpu.decode import pipeline as pl
    S, P, T = 8192, 3, 9
    rng = np.random.default_rng(21)
    spec = default_spec(tb.MODE_PE, ibg_secs=ibg, start_gap_secs=0.001)
    items = [("block", bytes(rng.integers(0, 256, 80, dtype=np.uint8)))
             for _ in range(nblocks)]
    hdr, samples = synthesize_tape(spec, items)
    v = samples.T.astype(np.float32) * (hdr.maxvolts / 32767.0)
    if noise:
        v = v + rng.normal(0.0, noise, v.shape).astype(np.float32)
    v = v[:, :S]
    if v.shape[1] < S:
        v = np.pad(v, ((0, 0), (0, S - v.shape[1])))
    v = jnp.asarray(v)
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (1600 * 50 * deltat)
    sets = builtin_parmsets(tb.MODE_PE).sets[:P]
    maxb = int(S / spb * 1.3) + 64
    lb, bw = 0.0, 1.0
    rise_floor = np.full(T, 0.02, np.float32)
    min_floor = np.zeros(T, np.float32)

    refs = _pe_xla_reference(v, spb, sets, S, T, maxb, lb, bw, S, 0,
                             jnp.asarray(rise_floor),
                             jnp.asarray(min_floor))

    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 1600, 50, deltat)
               for p in sets)
    volts = jnp.pad(v, ((0, 16 - T), (0, 0)))[None]
    meta = np.zeros((1, 16, 128), np.float32)
    meta[0, :, pf.M_SEGLEN] = S
    meta[0, :, pf.M_STATLB] = lb
    meta[0, :, pf.M_STATBW] = bw
    meta[0, :T, pf.M_RISEF] = rise_floor
    meta[0, :T, pf.M_MINF] = min_floor
    bits, hist, scal, runs = pf.pe_fused_scan(
        volts, jnp.asarray(meta), S=S, T=T, P=P, maxb=maxb, Ws=Ws,
        rises=tuple(float(p.pkww_rise) for p in sets),
        minps=tuple(float(p.min_peak) for p in sets),
        aalphas=tuple(float(p.agc_alpha) for p in sets),
        awindows=tuple(int(p.agc_window) for p in sets),
        clk_windows=tuple(int(p.clk_window) for p in sets),
        clk_alphas=tuple(float(p.clk_alpha) for p in sets),
        clk_factors=tuple(float(p.clk_factor) for p in sets),
        pulse_adjs=tuple(float(p.pulse_adj) for p in sets),
        spb=float(spb), agc_ring=max(max(p.agc_window for p in sets), 1),
        clk_ring=max(max(p.clk_window for p in sets), 1), interpret=True)

    for pi, (p, fin) in enumerate(zip(sets, refs)):
        msg = f"parmset {pi}"
        ss = np.asarray(scal[0, pi])
        col = lambda ln: ss[:T, ln]
        np.testing.assert_array_equal(col(pf.PL_DC).astype(np.int64),
                                      fin["datacount"], err_msg=msg)
        np.testing.assert_array_equal(col(pf.PL_PEAKCNT).astype(np.int64),
                                      fin["peakcount"], err_msg=msg)
        np.testing.assert_allclose(col(pf.PL_TFIRST), fin["t_firstbit"],
                                   rtol=0, atol=0, err_msg=msg)
        np.testing.assert_allclose(col(pf.PL_TLAST), fin["t_lastbit"],
                                   rtol=0, atol=0, err_msg=msg)
        np.testing.assert_array_equal(col(pf.PL_CORR).astype(np.int64),
                                      fin["corrected_bits"], err_msg=msg)
        np.testing.assert_array_equal(col(pf.PL_TRKSUM).astype(np.int64),
                                      fin["trksum"], err_msg=msg)
        np.testing.assert_array_equal(
            np.asarray(hist[0, pi])[:T, :50].astype(np.int64),
            fin["hist"], err_msg=msg)
        assert not ss[0, pf.PL_BAIL] > 0.5, msg
        # bits with fake runs applied must match exactly: reuse the
        # production glue's replay by comparing through the group lane
        n_runs = col(pf.PL_NRUNS).astype(np.int64)
        rr = np.asarray(runs[0, pi])
        bits_t = np.asarray(bits[0, pi])[:T, :maxb].astype(np.int8)
        for t in range(T):
            bt = bits_t[t].copy()
            fk = np.zeros(maxb, np.int8)
            for k in range(min(n_runs[t], 128)):
                a = int(rr[0, t, k])
                e = min(int(rr[0, t, k]) + int(rr[1, t, k]), maxb)
                bt[a:e] = 1 if rr[2, t, k] > 0.5 else 0
                fk[a:e] = 1
            np.testing.assert_array_equal(bt, fin["bits"][t],
                                          err_msg=f"{msg} trk {t}")
            np.testing.assert_array_equal(fk, fin["faked"][t],
                                          err_msg=f"{msg} trk {t}")
        assert fin["datacount"].max() > 50, "decoded too little"


def test_pe_fused_production_wiring(fresh_caches, monkeypatch):
    from readtape_tpu.decode import pipeline as pl
    rng = np.random.default_rng(5)
    spec = default_spec(tb.MODE_PE, ibg_secs=0.004, start_gap_secs=0.004)
    blocks = [bytes(rng.integers(0, 256, 150, dtype=np.uint8))
              for _ in range(3)]
    items = [("block", b) for b in blocks]
    hdr, samples = synthesize_tape(spec, items)
    opts = pl.DecodeOptions(mode=tb.MODE_PE, ntrks=9, bpi=1600, ips=50,
                            deltat=hdr.tdelta_ns * 1e-9,
                            maxvolts=hdr.maxvolts)
    monkeypatch.setenv("READTAPE_PALLAS", "0")
    out_ref, stats_ref = pl.decode_tape(samples, opts)
    monkeypatch.setenv("READTAPE_PALLAS", "1")
    monkeypatch.setenv("READTAPE_FUSED", "1")
    out_f, stats_f = pl.decode_tape(samples, opts)
    assert [b.data for b in out_f] == [b.data for b in out_ref]
    assert [b.kind for b in out_f] == [b.kind for b in out_ref]
    assert stats_f["nblocks"] == 3
    np.testing.assert_array_equal(stats_f["peak_hist"],
                                  stats_ref["peak_hist"])


# ---------------------------------------------------------------------------
# GCR fused kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("nblocks,noise", [(1, 0.0), (2, 0.03)])
def test_gcr_fused_matches_xla(nblocks, noise):
    from readtape_tpu.decode import gcr as gcr_mod
    from readtape_tpu.decode import gcr_tables as gt
    S, P, T = 8192, 3, 9
    rng = np.random.default_rng(31)
    spec = default_spec(tb.MODE_GCR, ibg_secs=0.003, start_gap_secs=0.001)
    items = [("block", bytes(rng.integers(0, 256, 200, dtype=np.uint8)))
             for _ in range(nblocks)]
    hdr, samples = synthesize_tape(spec, items)
    v = samples.T.astype(np.float32) * (hdr.maxvolts / 32767.0)
    if noise:
        v = v + rng.normal(0.0, noise, v.shape).astype(np.float32)
    v = v[:, :S]
    if v.shape[1] < S:
        v = np.pad(v, ((0, 0), (0, S - v.shape[1])))
    v = jnp.asarray(v)
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (spec.bpi * spec.ips * deltat)
    sets = builtin_parmsets(tb.MODE_GCR).sets[:P]
    maxb = int(S / spb * 1.3) + 64
    lb, bw = 0.0, 1.0
    rise_floor = np.full(T, 0.02, np.float32)
    min_floor = np.zeros(T, np.float32)
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, spec.bpi, spec.ips,
                                 deltat) for p in sets)
    nxt = _mask_jump_table(
        _union_jump_table(v, Ws, jnp.asarray(rise_floor),
                          jnp.asarray(min_floor)), S, 0, S)
    refs = []
    for p, W in zip(sets, Ws):
        feat = ts.precompute_window_features(v, W, nxt)
        lane = jax.vmap(lambda f, nx, W=W, p=p: gcr_mod.gcr_track_scan(
            f, nx, W, S, S, jnp.float32(p.pkww_rise),
            jnp.float32(p.min_peak), jnp.float32(p.agc_alpha),
            jnp.int32(p.agc_window), jnp.int32(p.clk_window),
            jnp.float32(p.clk_alpha), jnp.float32(p.z1pt),
            jnp.float32(p.z2pt), jnp.float32(p.pulse_adj),
            jnp.float32(spb), maxb, jnp.float32(lb), jnp.float32(bw),
            pre=True))
        refs.append(jax.tree.map(np.asarray, lane(feat, nxt)))

    volts = jnp.pad(v, ((0, 16 - T), (0, 0)))[None]
    meta = np.zeros((1, 16, 128), np.float32)
    meta[0, :, pf.M_SEGLEN] = S
    meta[0, :, pf.M_STATLB] = lb
    meta[0, :, pf.M_STATBW] = bw
    meta[0, :T, pf.M_RISEF] = rise_floor
    bits, hist, scal = pf.gcr_fused_scan(
        volts, jnp.asarray(meta), S=S, T=T, P=P, maxb=maxb, Ws=Ws,
        rises=tuple(float(p.pkww_rise) for p in sets),
        minps=tuple(float(p.min_peak) for p in sets),
        aalphas=tuple(float(p.agc_alpha) for p in sets),
        awindows=tuple(int(p.agc_window) for p in sets),
        clk_windows=tuple(int(p.clk_window) for p in sets),
        clk_alphas=tuple(float(p.clk_alpha) for p in sets),
        z1pts=tuple(float(p.z1pt) for p in sets),
        z2pts=tuple(float(p.z2pt) for p in sets),
        pulse_adjs=tuple(float(p.pulse_adj) for p in sets),
        spb=float(spb), agc_ring=max(max(p.agc_window for p in sets), 1),
        mark1=int(gt.GCR_MARK1), mark2=int(gt.GCR_MARK2), interpret=True)

    for pi, fin in enumerate(refs):
        msg = f"parmset {pi}"
        ss = np.asarray(scal[0, pi])
        col = lambda ln: ss[:T, ln]
        np.testing.assert_array_equal(col(pf.GL_DC).astype(np.int64),
                                      fin["datacount"], err_msg=msg)
        np.testing.assert_array_equal(col(pf.GL_PEAKCNT).astype(np.int64),
                                      fin["peakcount"], err_msg=msg)
        np.testing.assert_allclose(col(pf.GL_TFIRST), fin["t_firstbit"],
                                   rtol=0, atol=0, err_msg=msg)
        np.testing.assert_allclose(col(pf.GL_TLAST), fin["t_lastbit"],
                                   rtol=0, atol=0, err_msg=msg)
        np.testing.assert_array_equal(
            np.asarray(bits[0, pi])[:T, :maxb].astype(np.int8),
            fin["bits"], err_msg=msg)
        np.testing.assert_array_equal(
            np.asarray(hist[0, pi])[:T, :50].astype(np.int64),
            fin["hist"], err_msg=msg)
        np.testing.assert_array_equal(col(pf.GL_TRKSUM).astype(np.int64),
                                      fin["trksum"], err_msg=msg)
        np.testing.assert_allclose(col(pf.GL_MAXAGC),
                                   fin["max_agc_gain"], rtol=0, atol=0,
                                   err_msg=msg)
        assert not ss[0, pf.GL_BAIL] > 0.5, msg
        assert fin["datacount"].max() > 100, "decoded too little"


def test_gcr_fused_production_wiring(fresh_caches, monkeypatch):
    from readtape_tpu.decode import pipeline as pl
    rng = np.random.default_rng(9)
    spec = default_spec(tb.MODE_GCR, ibg_secs=0.004, start_gap_secs=0.004)
    blocks = [bytes(rng.integers(0, 256, 400, dtype=np.uint8))
              for _ in range(3)]
    items = [("block", b) for b in blocks]
    hdr, samples = synthesize_tape(spec, items)
    opts = pl.DecodeOptions(mode=tb.MODE_GCR, ntrks=9, bpi=spec.bpi,
                            ips=spec.ips, deltat=hdr.tdelta_ns * 1e-9,
                            maxvolts=hdr.maxvolts)
    monkeypatch.setenv("READTAPE_PALLAS", "0")
    out_ref, stats_ref = pl.decode_tape(samples, opts)
    monkeypatch.setenv("READTAPE_PALLAS", "1")
    monkeypatch.setenv("READTAPE_FUSED", "1")
    out_f, stats_f = pl.decode_tape(samples, opts)
    assert [b.data for b in out_f] == [b.data for b in out_ref]
    assert [b.kind for b in out_f] == [b.kind for b in out_ref]
    assert stats_f["nblocks"] == 3
    np.testing.assert_array_equal(stats_f["peak_hist"],
                                  stats_ref["peak_hist"])


# ---------------------------------------------------------------------------
# Whirlwind fused kernel
# ---------------------------------------------------------------------------

def _ww_xla_reference(v, spb, p0, S, T, W, maxchars, lb, bw, vah_init,
                      fluxdir_req, type_to_trk):
    from readtape_tpu.decode import ww as ww_mod
    nxt = _mask_jump_table(
        ts.loose_jump_table(v, W, jnp.full(T, 0.04, np.float32),
                            jnp.full(T, 0.2, np.float32)),
        jnp.int32(S), jnp.int32(0), S)
    K = int(S / spb * 6.0) + 64
    nsteps = int(S / spb * 12.0) + 64
    feat = ts.precompute_window_features(v, W, nxt)
    lane = jax.vmap(lambda ft, nx, vh: ww_mod.ww_track_scan(
        ft, nx, W, S, nsteps, K, p0.pkww_rise, p0.min_peak,
        p0.agc_alpha, p0.agc_window, vh, pre=True))
    finals = lane(feat, nxt, jnp.asarray(vah_init, np.float32))
    counts = finals["n_admitted"]
    keep = np.arange(K) < np.asarray(counts)[..., None]
    trans = dict(
        s_det=jnp.where(keep, finals["tr_s"], ts.BIG_S),
        t_peak=jnp.where(keep, finals["tr_t"], 0.0),
        t_frac=jnp.where(keep, finals["tr_frac"], 0.0),
        is_top=jnp.where(keep, finals["tr_top"], False))
    Mcap = min(int(T * K), int(np.sum(np.asarray(counts))) + 16)
    merged = ww_mod.merge_transitions(trans, T, Mcap)
    res = jax.tree.map(np.asarray, ww_mod.ww_global_scan(
        merged["trk"], merged["t_peak"], merged["s_det"],
        merged["is_top"], merged["valid"],
        jnp.int32(p0.clk_window), jnp.float32(p0.clk_alpha),
        jnp.float32(spb), jnp.float32(lb), jnp.float32(bw),
        pri_clk=type_to_trk[ww_mod.WWTRK_PRICLK],
        pri_lsb=type_to_trk[ww_mod.WWTRK_PRILSB],
        pri_msb=type_to_trk[ww_mod.WWTRK_PRIMSB],
        alt_clk=type_to_trk[ww_mod.WWTRK_ALTCLK],
        alt_lsb=type_to_trk[ww_mod.WWTRK_ALTLSB],
        alt_msb=type_to_trk[ww_mod.WWTRK_ALTMSB],
        T=T, maxchars=maxchars, maxblocks=4096,
        fluxdir_req=fluxdir_req, m_frac=merged["t_frac"]))
    return res, finals


@pytest.mark.parametrize("seed,nblocks,noise,fluxdir,tapemark",
                         [(3, 1, 0.0, "neg", False),
                          (5, 2, 0.05, "auto", False),
                          (6, 2, 0.0, "neg", True)])
def test_ww_fused_matches_xla(seed, nblocks, noise, fluxdir, tapemark):
    """The fused WW kernel (admission + the global pulse/clock/blockmark
    machine in one sweep) must reproduce ww_track_scan + merge +
    ww_global_scan exactly: chars, block records, peak hist, flux state,
    deskew height averages."""
    from readtape_tpu.decode import ww as ww_mod
    from readtape_tpu.decode.pipeline import _peakstat_bins
    rng = np.random.default_rng(seed)
    spec = default_spec(tb.MODE_WW, ibg_secs=0.003, start_gap_secs=0.002)
    items = []
    for i in range(nblocks):
        items.append(("block", [int(w) for w in
                                rng.integers(0, 65536, 8)]))
        if tapemark and i == 0:
            items.append(("tapemark",))
    hdr, samples = synthesize_tape(spec, items)
    T = 6
    S = 4096
    while S < samples.shape[0]:
        S *= 2
    v = samples.T.astype(np.float32) * (hdr.maxvolts / 32767.0)
    v = np.pad(v, ((0, 0), (0, S - v.shape[1])))
    if noise:
        v = v + rng.normal(0.0, noise, v.shape).astype(np.float32)
    v = jnp.asarray(v)
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (spec.bpi * spec.ips * deltat)
    p0 = builtin_parmsets(tb.MODE_WW).sets[0]
    W = cm.pkww_width_for(p0.pkww_bitfrac, spec.bpi, spec.ips, deltat)
    lb, bw = _peakstat_bins(tb.MODE_WW, 1.0 / (spec.bpi * spec.ips))
    lb, bw = lb / deltat, bw / deltat
    type_to_trk, _, _n = ww_mod.parse_ww_order(spec.ww_order)
    vah_init = np.full(T, cm.PKWW_PEAKHEIGHT, np.float32)
    fluxdir_req = {"pos": ww_mod.FLUX_POS, "neg": ww_mod.FLUX_NEG,
                   "auto": ww_mod.FLUX_AUTO}[fluxdir]
    maxchars = int(S / spb) + 256

    res, finals = _ww_xla_reference(v, spb, p0, S, T, W, maxchars, lb, bw,
                                    vah_init, fluxdir_req, type_to_trk)

    volts = jnp.pad(v, ((0, 16 - T), (0, 0)))[None]
    meta = np.zeros((1, 16, 128), np.float32)
    meta[0, :, pf.M_SEGLEN] = S
    meta[0, :, pf.M_STATLB] = lb
    meta[0, :, pf.M_STATBW] = bw
    meta[0, :T, pf.M_RISEF] = 0.04
    meta[0, :T, pf.M_MINF] = 0.2
    meta[0, :T, pf.M_WW_VAH] = vah_init
    meta[0, :, pf.M_WW_AAL] = p0.agc_alpha
    meta[0, :, pf.M_WW_CLKA] = p0.clk_alpha
    chars, blk, hist, scal = pf.ww_fused_scan(
        volts, jnp.asarray(meta), S=S, T=T, W=W, maxchars=maxchars,
        rise=float(p0.pkww_rise), minp=float(p0.min_peak),
        agc_alpha=float(p0.agc_alpha), clk_alpha=float(p0.clk_alpha),
        spb=float(spb), fluxdir_req=fluxdir_req,
        pri_clk=type_to_trk[ww_mod.WWTRK_PRICLK],
        pri_lsb=type_to_trk[ww_mod.WWTRK_PRILSB],
        pri_msb=type_to_trk[ww_mod.WWTRK_PRIMSB],
        alt_clk=type_to_trk[ww_mod.WWTRK_ALTCLK],
        alt_lsb=type_to_trk[ww_mod.WWTRK_ALTLSB],
        alt_msb=type_to_trk[ww_mod.WWTRK_ALTMSB], interpret=True)
    got = pf.ww_fused_state(chars, blk, hist, scal, T=T,
                            maxchars=maxchars)

    assert not got["bail"]
    np.testing.assert_array_equal(got["n_admitted"],
                                  np.asarray(finals["n_admitted"]))
    nb = int(res["nblocks"])
    dc = int(res["datacount"])
    assert int(got["nblocks"]) == nb
    assert int(got["datacount"]) == dc
    np.testing.assert_array_equal(got["chars"][:dc], res["chars"][:dc])
    for f in ("b_start", "b_end", "b_type", "b_t_base", "b_missing1",
              "b_missingclk"):
        np.testing.assert_array_equal(
            got[f][:nb].astype(np.int64),
            np.asarray(res[f][:nb]).astype(np.int64), err_msg=f)
    np.testing.assert_allclose(got["b_t_end"][:nb], res["b_t_end"][:nb],
                               rtol=0, atol=0, err_msg="b_t_end")
    # the clock average's exponential update a*d + (1-a)*b gets FMA-
    # contracted differently per compiled graph (XLA:CPU does it for the
    # scan and for the interpreted kernel independently; the C reference
    # itself builds with gcc's default -ffp-contract) -- a pure-IEEE
    # numpy replay matches NEITHER side on all blocks. Everything the
    # average feeds (chars, hit windows, block times) is compared
    # bit-exactly above; the average itself gets a few-ulp tolerance.
    np.testing.assert_allclose(got["b_bitspace"][:nb],
                               res["b_bitspace"][:nb], rtol=1e-6,
                               err_msg="b_bitspace")
    np.testing.assert_array_equal(got["hist"], res["hist"])
    np.testing.assert_array_equal(got["trksums"], res["trksums"])
    assert int(got["num_flux_changes"]) == int(res["num_flux_changes"])
    assert int(got["flux"]) == int(res["flux"])
    np.testing.assert_allclose(got["h_sum"], np.asarray(finals["h_sum"]),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(got["h_cnt"],
                                  np.asarray(finals["h_cnt"]))
    assert dc > 0 and nb >= nblocks


def test_ww_fused_production_wiring(fresh_caches, monkeypatch):
    """decode_tape for WW through the fused kernel must produce exactly
    the XLA path's blocks/stats (incl. -deskew's two-pass flow)."""
    from readtape_tpu.decode import pipeline as pl
    rng = np.random.default_rng(11)
    spec = default_spec(tb.MODE_WW, ibg_secs=0.004, start_gap_secs=0.003)
    words = [[int(w) for w in rng.integers(0, 65536, 10)]
             for _ in range(3)]
    items = [("block", w) for w in words]
    items.insert(2, ("tapemark",))
    hdr, samples = synthesize_tape(spec, items)
    opts = pl.DecodeOptions(mode=tb.MODE_WW, ntrks=6, bpi=spec.bpi,
                            ips=spec.ips, deltat=hdr.tdelta_ns * 1e-9,
                            maxvolts=hdr.maxvolts, fluxdir="neg",
                            ww_order=spec.ww_order, multiple_tries=False,
                            deskew=True)
    monkeypatch.setenv("READTAPE_PALLAS", "0")
    out_ref, stats_ref = pl.decode_tape(samples, opts)
    monkeypatch.setenv("READTAPE_PALLAS", "1")
    monkeypatch.setenv("READTAPE_FUSED", "1")
    out_f, stats_f = pl.decode_tape(samples, opts)
    assert [b.data for b in out_f] == [b.data for b in out_ref]
    assert [b.kind for b in out_f] == [b.kind for b in out_ref]
    assert stats_f["nblocks"] == 3 and stats_f["ntapemarks"] >= 1
    np.testing.assert_array_equal(stats_f["peak_hist"],
                                  stats_ref["peak_hist"])
    assert stats_f["skew"] == stats_ref["skew"]


def test_ww_fused_rebase_matches_xla(fresh_caches, monkeypatch):
    """The kernel's grid-aligned POSITION rebase plus the machine's event
    rebase (unbounded-capture machinery) must be exact: with the span
    shrunk to 8192 both mechanisms fire many times on a small tape, and
    the result must still equal the XLA path (whose REBASE_SPAN is
    monkeypatched to the same value; jax caches cleared by the fixture
    so the patched constant is retraced)."""
    from readtape_tpu.decode import ww as ww_mod
    from readtape_tpu.decode.pipeline import _peakstat_bins
    monkeypatch.setattr(ww_mod, "REBASE_SPAN", 8192)
    rng = np.random.default_rng(17)
    spec = default_spec(tb.MODE_WW, ibg_secs=0.003, start_gap_secs=0.002)
    items = [("block", [int(w) for w in rng.integers(0, 65536, 10)])
             for _ in range(3)]
    hdr, samples = synthesize_tape(spec, items)
    T = 6
    S = 4096
    while S < samples.shape[0]:
        S *= 2
    v = samples.T.astype(np.float32) * (hdr.maxvolts / 32767.0)
    v = jnp.asarray(np.pad(v, ((0, 0), (0, S - v.shape[1]))))
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (spec.bpi * spec.ips * deltat)
    p0 = builtin_parmsets(tb.MODE_WW).sets[0]
    W = cm.pkww_width_for(p0.pkww_bitfrac, spec.bpi, spec.ips, deltat)
    lb, bw = _peakstat_bins(tb.MODE_WW, 1.0 / (spec.bpi * spec.ips))
    lb, bw = lb / deltat, bw / deltat
    type_to_trk, _, _n = ww_mod.parse_ww_order(spec.ww_order)
    vah_init = np.full(T, cm.PKWW_PEAKHEIGHT, np.float32)
    maxchars = int(S / spb) + 256

    res, finals = _ww_xla_reference(v, spb, p0, S, T, W, maxchars, lb, bw,
                                    vah_init, ww_mod.FLUX_NEG, type_to_trk)

    volts = jnp.pad(v, ((0, 16 - T), (0, 0)))[None]
    meta = np.zeros((1, 16, 128), np.float32)
    meta[0, :, pf.M_SEGLEN] = S
    meta[0, :, pf.M_STATLB] = lb
    meta[0, :, pf.M_STATBW] = bw
    meta[0, :T, pf.M_RISEF] = 0.04
    meta[0, :T, pf.M_MINF] = 0.2
    meta[0, :T, pf.M_WW_VAH] = vah_init
    meta[0, :, pf.M_WW_AAL] = p0.agc_alpha
    meta[0, :, pf.M_WW_CLKA] = p0.clk_alpha
    chars, blk, hist, scal = pf.ww_fused_scan(
        volts, jnp.asarray(meta), S=S, T=T, W=W, maxchars=maxchars,
        rise=float(p0.pkww_rise), minp=float(p0.min_peak),
        agc_alpha=float(p0.agc_alpha), clk_alpha=float(p0.clk_alpha),
        spb=float(spb), fluxdir_req=ww_mod.FLUX_NEG,
        pri_clk=type_to_trk[ww_mod.WWTRK_PRICLK],
        pri_lsb=type_to_trk[ww_mod.WWTRK_PRILSB],
        pri_msb=type_to_trk[ww_mod.WWTRK_PRIMSB],
        alt_clk=type_to_trk[ww_mod.WWTRK_ALTCLK],
        alt_lsb=type_to_trk[ww_mod.WWTRK_ALTLSB],
        alt_msb=type_to_trk[ww_mod.WWTRK_ALTMSB], interpret=True,
        span=8192)
    got = pf.ww_fused_state(chars, blk, hist, scal, T=T,
                            maxchars=maxchars)

    assert not got["bail"]
    np.testing.assert_array_equal(got["n_admitted"],
                                  np.asarray(finals["n_admitted"]))
    nb = int(res["nblocks"])
    dc = int(res["datacount"])
    assert int(got["nblocks"]) == nb == 3
    assert int(got["datacount"]) == dc
    np.testing.assert_array_equal(got["chars"][:dc], res["chars"][:dc])
    for f in ("b_start", "b_end", "b_type", "b_missing1", "b_missingclk"):
        np.testing.assert_array_equal(
            got[f][:nb].astype(np.int64),
            np.asarray(res[f][:nb]).astype(np.int64), err_msg=f)
    # absolute bases: kernel hi+lo must equal the XLA rolling base, and
    # the block end times (base-relative) must match bit for bit
    np.testing.assert_array_equal(got["b_t_base"][:nb],
                                  np.asarray(res["b_t_base"][:nb]))
    np.testing.assert_allclose(got["b_t_end"][:nb], res["b_t_end"][:nb],
                               rtol=0, atol=0)
    np.testing.assert_array_equal(got["hist"], res["hist"])
