"""The Pallas admission kernel must reproduce the XLA jump scan EXACTLY:
same admitted positions, times, AGC values, polarity flags, and scalars,
for multiple parmsets with distinct window widths, on synthesized NRZI
waveforms with a masked segment range (warmup lead + bucket tail)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from readtape_tpu.decode import common as cm
from readtape_tpu.decode import trackscan as ts
from readtape_tpu.decode.common import F32, I32
from readtape_tpu.decode.pallas_scan import (nrzi_track_scan_pallas,
                                             nrzi_track_scan_pallas_tracks)
from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.parms import builtin_parmsets
from readtape_tpu.synth import default_spec, synthesize_tape


def _setup(B=2, S=4096, P=3, uniform_w=False):
    rng = np.random.default_rng(11)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.002, start_gap_secs=0.001)
    segs = []
    for b in range(B):
        blk = bytes(rng.integers(0, 256, 120, dtype=np.uint8))
        hdr, samples = synthesize_tape(spec, [("block", blk)])
        v = samples.T.astype(np.float32) * (hdr.maxvolts / 32767.0)
        v = v[:, :S]
        if v.shape[1] < S:
            v = np.pad(v, ((0, 0), (0, S - v.shape[1])))
        segs.append(v)
    v = jnp.asarray(np.stack(segs))                     # [B, T, S]
    T = v.shape[1]

    ps = builtin_parmsets(tb.MODE_NRZI)
    sets = ps.sets[:P]
    if uniform_w:
        import dataclasses
        sets = [dataclasses.replace(p, pkww_bitfrac=0.7) for p in sets]
    deltat = 1.28e-6
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 800, 50, deltat)
               for p in sets)
    rises = tuple(p.pkww_rise for p in sets)
    minps = tuple(p.min_peak for p in sets)
    aalphas = tuple(p.agc_alpha for p in sets)
    awindows = tuple(p.agc_window for p in sets)
    wset = sorted(set(Ws))
    groups = tuple(wset.index(w) for w in Ws)

    rise_floor = jnp.full(T, 0.02, F32)
    min_floor = jnp.full(T, 0.0, F32)
    seg_len, lead = S - 700, 64
    nxts, feats = [], []
    for b in range(B):
        nxt = None
        for W in wset:
            t_ = ts.loose_jump_table(v[b], W, rise_floor, min_floor)
            nxt = t_ if nxt is None else jnp.minimum(nxt, t_)
        nxt = jnp.where(nxt < seg_len, nxt, S)
        iota = jnp.arange(S + 1, dtype=I32)[None, :]
        first = jnp.take_along_axis(
            nxt, jnp.full((T, 1), lead, I32), axis=1)
        nxt = jnp.where(iota < lead, first, nxt)
        nxts.append(nxt)
        feats.append(jnp.stack(
            [ts.precompute_window_features(v[b], W, nxt) for W in wset]))
    feat = jnp.stack(feats)                             # [B, G, T, 12, S]
    nxt = jnp.stack(nxts)                               # [B, T, S+1]
    return dict(v=v, feat=feat, nxt=nxt, S=S, T=T, P=P, Ws=Ws, rises=rises,
                minps=minps, aalphas=aalphas, awindows=awindows,
                groups=groups, wset=wset)


def _xla_reference(cfg, K):
    """Per-lane XLA jump scans (the production path)."""
    B, T, P, S = (cfg["v"].shape[0], cfg["T"], cfg["P"], cfg["S"])
    out = {k: [] for k in ("tr_s", "tr_t", "tr_agc", "tr_top", "n_admitted",
                           "max_agc_gain", "min_agc_gain")}
    for b in range(B):
        per_p = {k: [] for k in out}
        for p in range(P):
            g = cfg["groups"][p]
            W = cfg["Ws"][p]
            per_t = {k: [] for k in out}
            for t in range(T):
                fin = ts.nrzi_track_scan_pre(
                    cfg["feat"][b, g, t], cfg["nxt"][b, t], W, S,
                    nsteps=S, K=K,
                    rise_parm=jnp.float32(cfg["rises"][p]),
                    min_parm=jnp.float32(cfg["minps"][p]),
                    agc_alpha=jnp.float32(cfg["aalphas"][p]),
                    agc_window=jnp.int32(cfg["awindows"][p]))
                for k in per_t:
                    per_t[k].append(np.asarray(fin[k]))
            for k in per_p:
                per_p[k].append(np.stack(per_t[k]))
        for k in out:
            out[k].append(np.stack(per_p[k]))
    return {k: np.stack(v) for k, v in out.items()}     # [B, P, T, ...]


@pytest.mark.parametrize("variant", ["parmset_sublane", "track_sublane"])
def test_pallas_matches_xla_scan(variant):
    cfg = _setup(uniform_w=(variant == "track_sublane"))
    K = 512
    ref = _xla_reference(cfg, K)
    kernel = (nrzi_track_scan_pallas_tracks if variant == "track_sublane"
              else nrzi_track_scan_pallas)
    got = kernel(
        cfg["feat"], S=cfg["S"], K=K, Ws=cfg["Ws"], rises=cfg["rises"],
        minps=cfg["minps"], aalphas=cfg["aalphas"],
        awindows=cfg["awindows"], groups=cfg["groups"], interpret=True)
    got = {k: np.asarray(x) for k, x in got.items()}

    np.testing.assert_array_equal(got["n_admitted"], ref["n_admitted"])
    n = ref["n_admitted"]
    assert n.sum() > 100, "test waveform produced too few admissions"
    for b in range(n.shape[0]):
        for p in range(n.shape[1]):
            for t in range(n.shape[2]):
                m = n[b, p, t]
                np.testing.assert_array_equal(
                    got["tr_s"][b, p, t][:m], ref["tr_s"][b, p, t][:m],
                    err_msg=f"tr_s lane {b},{p},{t}")
                np.testing.assert_allclose(
                    got["tr_t"][b, p, t][:m], ref["tr_t"][b, p, t][:m],
                    rtol=0, atol=0, err_msg=f"tr_t lane {b},{p},{t}")
                np.testing.assert_allclose(
                    got["tr_agc"][b, p, t][:m], ref["tr_agc"][b, p, t][:m],
                    rtol=0, atol=0, err_msg=f"tr_agc lane {b},{p},{t}")
                np.testing.assert_array_equal(
                    got["tr_top"][b, p, t][:m], ref["tr_top"][b, p, t][:m],
                    err_msg=f"tr_top lane {b},{p},{t}")
    np.testing.assert_allclose(got["max_agc_gain"], ref["max_agc_gain"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(got["min_agc_gain"], ref["min_agc_gain"],
                               rtol=0, atol=0)
