"""Pallas NRZI admission kernel vs the XLA jump scan: identical admitted
transitions, times, AGC trajectories and counts on real synthesized
waveforms (interpret mode; the TPU path compiles the same kernel)."""

import jax
import jax.numpy as jnp
import numpy as np

from readtape_tpu.decode import common as cm
from readtape_tpu.decode import pallas_scan as psc
from readtape_tpu.decode import stage1
from readtape_tpu.decode import trackscan as ts
from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.parms import builtin_parmsets
from readtape_tpu.synth import default_spec, synthesize_tape


def _make_inputs(nbytes=128, seed=3):
    rng = np.random.default_rng(seed)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.002, start_gap_secs=0.002)
    blk = bytes(rng.integers(0, 256, nbytes, dtype=np.uint8))
    hdr, samples = synthesize_tape(spec, [("block", blk)])
    S = 4096
    v = samples[:S].T.astype(np.float32) * (hdr.maxvolts / 32767.0)
    if v.shape[1] < S:
        v = np.pad(v, ((0, 0), (0, S - v.shape[1])))
    deltat = hdr.tdelta_ns * 1e-9
    return jnp.asarray(v), hdr, deltat, S


def test_pallas_matches_xla_scan():
    v, hdr, deltat, S = _make_inputs()
    T = v.shape[0]
    ps = builtin_parmsets(tb.MODE_NRZI)
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 800, 50, deltat)
               for p in ps.sets)
    P = len(ps.sets)
    spb = 1 / (800 * 50 * deltat)
    K = int(S / spb * 2.5) + 64

    rise_floor = jnp.full(T, min(p.pkww_rise for p in ps.sets) / 2, jnp.float32)
    min_floor = jnp.zeros(T, jnp.float32)

    # union candidate mask across distinct Ws (same stage-1 the XLA path uses)
    mask = None
    for Wd in sorted(set(Ws)):
        wmax, wmin = stage1.window_minmax(v, Wd)
        v_left = stage1.left_edge_values(v, Wd)
        m = stage1.candidate_mask(v, wmax, wmin, v_left, rise_floor,
                                  min_floor)
        mask = m if mask is None else (mask | m)
    # kernel capacity covers ALL union candidates (it visits each one);
    # give the XLA reference the same budget so neither truncates
    Ccap = -(-(int(jnp.max(jnp.sum(mask, axis=1))) + 64) // 128) * 128
    nsteps = Ccap
    cand, counts = psc.union_candidates(mask, Ccap)

    # XLA reference: per-(parmset, track) jump scan over the union table
    idx = jnp.where(mask, jnp.arange(S, dtype=jnp.int32)[None, :], S)
    rev = jnp.flip(idx, axis=-1)
    run = jax.lax.associative_scan(jnp.minimum, rev, axis=-1)
    nxt = jnp.concatenate([jnp.flip(run, axis=-1),
                           jnp.full((T, 1), S, jnp.int32)], axis=-1)

    feats = {Wd: ts.precompute_window_features(v, Wd)
             for Wd in sorted(set(Ws))}
    ref = {}
    for pi, p in enumerate(ps.sets):
        lane = jax.vmap(lambda ft, nx: ts.nrzi_track_scan_pre(
            ft, nx, Ws[pi], S, nsteps, K,
            jnp.float32(p.pkww_rise), jnp.float32(p.min_peak),
            jnp.float32(p.agc_alpha), jnp.int32(p.agc_window)))
        ref[pi] = lane(feats[Ws[pi]], nxt)

    # Pallas kernel (interpret mode = same program, CPU execution)
    out = psc.nrzi_track_scan_pallas(
        v[None], cand[None], counts[None], S=S, Ccap=Ccap, K=K, Ws=Ws,
        rises=tuple(p.pkww_rise for p in ps.sets),
        minps=tuple(p.min_peak for p in ps.sets),
        aalphas=tuple(p.agc_alpha for p in ps.sets),
        awindows=tuple(p.agc_window for p in ps.sets),
        interpret=True)

    total = 0
    for pi in range(P):
        r = ref[pi]
        n_ref = np.asarray(r["n_admitted"])
        n_pal = np.asarray(out["n_admitted"][0, pi])
        np.testing.assert_array_equal(n_ref, n_pal, err_msg=f"p{pi} count")
        total += int(n_ref.sum())
        for trk in range(T):
            n = n_ref[trk]
            np.testing.assert_array_equal(
                np.asarray(r["tr_s"][trk][:n]),
                np.asarray(out["tr_s"][0, pi, trk][:n]),
                err_msg=f"p{pi} trk{trk} tr_s")
            np.testing.assert_allclose(
                np.asarray(r["tr_t"][trk][:n]),
                np.asarray(out["tr_t"][0, pi, trk][:n]),
                rtol=0, atol=1e-4, err_msg=f"p{pi} trk{trk} tr_t")
            np.testing.assert_allclose(
                np.asarray(r["tr_agc"][trk][:n]),
                np.asarray(out["tr_agc"][0, pi, trk][:n]),
                rtol=1e-6, atol=1e-6, err_msg=f"p{pi} trk{trk} tr_agc")
            np.testing.assert_array_equal(
                np.asarray(r["tr_top"][trk][:n]),
                np.asarray(out["tr_top"][0, pi, trk][:n]),
                err_msg=f"p{pi} trk{trk} tr_top")
        np.testing.assert_allclose(
            np.asarray(r["max_agc_gain"]),
            np.asarray(out["max_agc_gain"][0, pi]), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(r["min_agc_gain"]),
            np.asarray(out["min_agc_gain"][0, pi]), rtol=1e-6, atol=1e-6)
    assert total > 1000, f"too few admitted transitions ({total})"
