#!/usr/bin/env python3
"""Hardware check of the Pallas slot kernel (per-track windows, no
merge sort): exact-match vs the XLA slot scan on the real TPU, with a
timing measurement at bench shapes.

    python scripts/pallas_slot_check.py [B] [S] [P]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from readtape_tpu.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from readtape_tpu.decode import common as cm
from readtape_tpu.decode import nrzi as nrzi_mod
from readtape_tpu.decode import trackscan as ts
from readtape_tpu.decode import pallas_slot as psl
from readtape_tpu.decode.common import F32
from readtape_tpu.formats import tbin as tb
from readtape_tpu.formats.parms import builtin_parmsets
from readtape_tpu.synth import default_spec, synthesize_tape


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


CMP = ("kvis", "dc", "bits", "hist", "trksums", "missed_midbits",
       "t_firstbit", "t_lastbit", "consume_overflow", "end_s")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    print(f"# devices: {jax.devices()}", flush=True)

    rng = np.random.default_rng(7)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.005, start_gap_secs=0.002)
    blk = bytes(rng.integers(0, 256, 1200, dtype=np.uint8))
    hdr, samples = synthesize_tape(spec, [("block", blk)])
    seg = samples[:S].T.astype(np.float32) * (hdr.maxvolts / 32767.0)
    if seg.shape[1] < S:
        seg = np.pad(seg, ((0, 0), (0, S - seg.shape[1])))
    T = seg.shape[0]
    v = jnp.asarray(seg)

    ps = builtin_parmsets(tb.MODE_NRZI)
    sets = ps.sets[:P]
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (800 * 50 * deltat)
    K = 2048
    maxb = int(S / spb * 1.3) + 64
    max_slots = int(S / spb * 1.25) + 48
    lb, bw = 0.0, 1.0
    print(f"# B={B} T={T} S={S} P={P} K={K} max_slots={max_slots}",
          flush=True)

    rise_floor = jnp.full(T, 0.02, F32)
    min_floor = jnp.full(T, 0.0, F32)

    # admitted transitions per parmset (XLA track scans, not under test)
    trans = []
    for p in sets:
        W = cm.pkww_width_for(p.pkww_bitfrac, 800, 50, deltat)
        nxt = ts.loose_jump_table(v, W, rise_floor, min_floor)
        nxt = jnp.where(nxt < S - 256, nxt, S)
        feat = ts.precompute_window_features(v, W, nxt)
        lane = jax.vmap(lambda f, nx: ts.nrzi_track_scan_pre(
            f, nx, W, S, S, K, jnp.float32(p.pkww_rise),
            jnp.float32(p.min_peak), jnp.float32(p.agc_alpha),
            jnp.int32(p.agc_window)))
        fin = lane(feat, nxt)
        keep = jnp.arange(K) < fin["n_admitted"][:, None]
        trans.append(dict(
            tr_s=jnp.where(keep, fin["tr_s"], ts.BIG_S),
            tr_t=jnp.where(keep, fin["tr_t"], 0.0),
            tr_agc=jnp.where(keep, fin["tr_agc"], 1.0),
            counts=fin["n_admitted"]))

    # ---- XLA reference (per parmset, one lane) ----
    ref = []
    for p, tr in zip(sets, trans):
        st = nrzi_mod.nrzi_slot_scan(
            tr["tr_s"], tr["tr_t"], tr["tr_agc"], tr["counts"], S,
            jnp.float32(spb), jnp.int32(p.clk_window),
            jnp.float32(p.clk_alpha), jnp.float32(p.pulse_adj),
            jnp.float32(p.midbit), jnp.int32(1), False, maxb, max_slots,
            jnp.float32(lb), jnp.float32(bw))
        ref.append(jax.tree.map(np.asarray, st))

    tr_s = jnp.broadcast_to(jnp.stack([t["tr_s"] for t in trans]),
                            (B, P, T, K))
    tr_t = jnp.broadcast_to(jnp.stack([t["tr_t"] for t in trans]),
                            (B, P, T, K))
    counts = jnp.broadcast_to(jnp.stack([t["counts"] for t in trans]),
                              (B, P, T))
    kw = dict(clk_windows=tuple(p.clk_window for p in sets),
              clk_alphas=tuple(p.clk_alpha for p in sets),
              pulse_adjs=tuple(p.pulse_adj for p in sets),
              midbits=tuple(p.midbit for p in sets))

    # ---- v3 path: kernel + reconstruct, end to end ----
    @jax.jit
    def v3(tr_s, tr_t, counts):
        stream, tb_, scal = psl.nrzi_slot_scan_pallas(
            tr_s, tr_t, counts, S=S, T=T, Kp=K, max_slots=max_slots,
            spb_i=float(spb), **kw)
        return jax.vmap(jax.vmap(lambda st, tbb, sc, ts0:
                                 psl.slot_stream_reconstruct(
                                     st, tbb, sc, T=T, S=S, maxb=maxb,
                                     spb=float(spb),
                                     stat_leftbin=jnp.float32(lb),
                                     stat_binwidth=jnp.float32(bw),
                                     first_k=jnp.argmin(ts0))))(
            stream, tb_, scal, tr_s[:, :, :, 0])

    t0 = time.perf_counter()
    try:
        dt3, got3 = timeit(v3, tr_s, tr_t, counts)
    except Exception as e:
        print(f"V3 COMPILE/RUN FAILED: {type(e).__name__}: {e}")
        return 1
    print(f"v3 kernel+reconstruct: {dt3*1e3:.1f} ms "
          f"(first call {time.perf_counter()-t0:.1f}s)", flush=True)

    # ---- exact comparison of v3 vs the XLA scan ----
    got3 = {k: np.asarray(x) for k, x in got3.items()}
    ok = True
    for pi in range(P):
        r = ref[pi]
        for k in CMP:
            for b in (0, B - 1):
                g = got3[k][b, pi]
                if not np.array_equal(g, np.asarray(r[k])):
                    print(f"MISMATCH {k} b{b} p{pi}: "
                          f"{np.asarray(g).ravel()[:5]} vs "
                          f"{np.asarray(r[k]).ravel()[:5]}")
                    ok = False
                    break
    print("EXACT MATCH" if ok else "MISMATCH -- do not enable")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
