"""Stage-by-stage TPU timing of the NRZI batched decode path.

Synthesizes one representative segment batch and times, as separately jitted
programs with identical inputs: (1) the data-parallel front end (volts, union
jump table, window-feature precompute), (2) the per-track admission scans,
(3) the global slot scan + finish. Prints milliseconds per stage so the
sequential-scan cost split is visible. Usage:

    python scripts/profile_nrzi.py [B] [S] [P]
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
from readtape_tpu.decode import trackscan
from readtape_tpu.decode.pipeline import (DecodeOptions, _prep_volts,
                                          _union_jump_table)
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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    T = 9
    rng = np.random.default_rng(5)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.005, start_gap_secs=0.002)
    blk = bytes(rng.integers(0, 256, 1200, dtype=np.uint8))
    hdr, samples = synthesize_tape(spec, [("block", blk)])
    seg = samples[:S].T.astype(np.int16)            # [T, S]
    if seg.shape[1] < S:
        seg = np.pad(seg, ((0, 0), (0, S - seg.shape[1])))
    v_i16 = jnp.asarray(np.broadcast_to(seg, (B, T, S)).copy())

    opts = DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                         deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)
    ps = builtin_parmsets(tb.MODE_NRZI)
    pa = cm.ParmArrays.from_parmsets(ps)
    P = len(ps.sets)
    if len(sys.argv) > 3:
        P = min(P, int(sys.argv[3]))
        ps.sets = ps.sets[:P]
        pa = jax.tree.map(lambda a: a[:P], pa)
    spb = 1 / (800 * 50 * opts.deltat)
    Ws = tuple(cm.pkww_width_for(p.pkww_bitfrac, 800, 50, opts.deltat)
               for p in ps.sets)
    scale_volts = jnp.float32(hdr.maxvolts)
    nsteps = int(S / spb * 3.2) + 64
    K = int(S / spb * 2.5) + 64
    maxb = int(S / spb * 1.3) + 64
    max_slots = int(S / spb * 1.25) + 48
    print(f"# B={B} T={T} S={S} P={P} Ws={sorted(set(Ws))} "
          f"nsteps={nsteps} K={K} maxb={maxb} max_slots={max_slots}",
          flush=True)
    scale = scale_volts
    skew = jnp.zeros(T, jnp.int32)
    rise_floor = jnp.full(T, 0.1, jnp.float32)
    min_floor = jnp.full(T, 0.0, jnp.float32)

    @jax.jit
    def front(v_i16):
        v = jax.vmap(lambda vv: _prep_volts(vv, scale, jnp.float32(1.0),
                                            skew, S=S, T=T,
                                            differentiate=False,
                                            spb_int=int(spb)))(v_i16)
        nxt = jax.vmap(lambda vv: _union_jump_table(vv, Ws, rise_floor,
                                                    min_floor))(v)
        feats = [jax.vmap(trackscan.precompute_window_features,
                          in_axes=(0, None, 0))(v, Wd, nxt)
                 for Wd in sorted(set(Ws))]
        return v, nxt, feats

    dt, (v, nxt, feats) = timeit(front, v_i16)
    print(f"front-end (volts+jump+features x{len(feats)}W): {dt*1e3:.1f} ms",
          flush=True)

    wset = sorted(set(Ws))

    @jax.jit
    def tracks(feats, nxt):
        outs = []
        for wi, Wd in enumerate(wset):
            idxs = [i for i, w in enumerate(Ws) if w == Wd]
            sel = jnp.asarray(idxs, jnp.int32)
            lane = jax.vmap(lambda ft, nx, rise, minp, aa, aw, _W=Wd:
                            trackscan.nrzi_track_scan_pre(
                                ft, nx, _W, S, nsteps, K,
                                rise, minp, aa, aw),
                            in_axes=(0, 0) + (None,) * 4)
            grp = jax.vmap(lambda rise, minp, aa, aw: jax.vmap(
                lambda f1, n1: lane(f1, n1, rise, minp, aa, aw))(
                    feats[wi], nxt))(
                pa.pkww_rise[sel], pa.min_peak[sel],
                pa.agc_alpha[sel], pa.agc_window[sel])
            outs.append(grp)
        return outs

    dt, grps = timeit(tracks, feats, nxt)
    print(f"track scans ({nsteps} steps): {dt*1e3:.1f} ms", flush=True)

    finals = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *grps)
    keep = jnp.arange(K) < finals["n_admitted"][..., None]
    tr_s = jnp.where(keep, finals["tr_s"], nrzi_mod.BIG_S)
    tr_t = jnp.where(keep, finals["tr_t"], 0.0)
    tr_agc = jnp.where(keep, finals["tr_agc"], 1.0)
    cnt = finals["n_admitted"]

    @jax.jit
    def slots(tr_s, tr_t, tr_agc, cnt):
        def lane(ts1, tt1, ta1, c1, cw, ca, padj, mb):
            st = nrzi_mod.nrzi_slot_scan(
                ts1, tt1, ta1, c1, S, jnp.float32(spb), cw, ca, padj, mb,
                jnp.int32(0), False, maxb, max_slots,
                jnp.float32(0.0), jnp.float32(1.0))
            return nrzi_mod.nrzi_finish(st, T, jnp.int32(0), jnp.int32(0),
                                        maxb)
        f = jax.vmap(lambda a, b, c, d: jax.vmap(lane)(
            a, b, c, d, pa.clk_window,
            pa.clk_alpha, pa.pulse_adj, pa.midbit))
        return f(tr_s.transpose(1, 0, 2, 3), tr_t.transpose(1, 0, 2, 3),
                 tr_agc.transpose(1, 0, 2, 3), cnt.transpose(1, 0, 2))

    dt, res = timeit(slots, tr_s, tr_t, tr_agc, cnt)
    print(f"slot scan+finish ({max_slots} slots): {dt*1e3:.1f} ms",
          flush=True)
    print(f"# sanity: blktype={np.asarray(res['blktype'])[0, 0]} "
          f"minbits={np.asarray(res['minbits'])[0, 0]}", flush=True)


if __name__ == "__main__":
    main()
