#!/usr/bin/env python3
"""Sub-stage timing of slot_stream_reconstruct + nrzi_finish at bench
shapes: field extraction/cumsums vs the scatter replay vs the histogram
vs nrzi_finish. Run after profile_prod.py (shares its cache keys).

    python scripts/profile_recon.py [B] [S]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from readtape_tpu.jaxcache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
from readtape_tpu.decode import common as cm
from readtape_tpu.decode import nrzi as nrzi_mod
from readtape_tpu.decode import pallas_slot as psl
from readtape_tpu.decode import trackscan
from readtape_tpu.decode.common import F32, I32
from readtape_tpu.decode.pallas_slot import (CH, F, TB_N1, TB_N2, TB_TJ10,
                                             TB_TJ20, TB_ACT, TB_LP,
                                             L_TLC0, L_TLC1, L_TLM0,
                                             L_POST0, L_B0, L_TLC2,
                                             L_FLAGS, F_OVF, BIG_S)

def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out

def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    T = 9
    spb = 19.1
    maxb = int(S / spb * 1.3) + 64
    max_slots = int(S / spb * 1.25) + 48
    nch = -(-max_slots // CH)
    nsl = nch * CH
    print(f"# B={B} S={S} nsl={nsl} maxb={maxb}", flush=True)
    rng = np.random.default_rng(0)
    # synthetic but plausible streams: ~1250 live slots, 1 transition/track
    stream = np.zeros((B, 1, nsl, 128), np.float32)
    live = 1250
    stream[:, :, :live, L_FLAGS] = 8 + 16
    stream[:, :, :live, L_B0] = spb
    stream[:, :, :live, L_TLC0] = np.arange(live) * spb
    stream[:, :, :live, L_TLC1] = np.arange(live) * spb
    stream[:, :, :live, L_TLC2] = np.arange(live) * spb + 1
    stream[:, :, :live, L_TLM0] = np.arange(live) * spb
    tb = np.zeros((B, 1, nch, 16, 128), np.float32)
    # ~1 consume/track/slot
    for cc in range(CH):
        tb[:, :, :, :T, cc * F + TB_N1] = 1.0
        tb[:, :, :, :T, cc * F + TB_TJ10] = 7.0
    scal = np.zeros((B, 1, 128), np.float32)
    scal[:, :, 2] = S
    stream, tb, scal = jnp.asarray(stream), jnp.asarray(tb), jnp.asarray(scal)
    cnt = jnp.full((B, 1, T), live, I32)
    lb, bw = jnp.float32(0.0), jnp.float32(1.0)

    def recon_lane(strm, tbb, scl):
        return psl.slot_stream_reconstruct(strm, tbb, scl, T=T, S=S,
                                           maxb=maxb, spb=spb,
                                           stat_leftbin=lb, stat_binwidth=bw)

    @jax.jit
    def f_full(stream, tb, scal, cnt):
        def lane(strm, tbb, scl, c):
            st = recon_lane(strm, tbb, scl)
            r = nrzi_mod.nrzi_finish(st, T, jnp.int32(1), jnp.int32(0), maxb)
            r["end_s"] = st["end_s"]
            return r
        return jax.vmap(jax.vmap(lane))(stream, tb, scal, cnt)

    @jax.jit
    def f_recon(stream, tb, scal):
        return jax.vmap(jax.vmap(recon_lane))(stream, tb, scal)

    @jax.jit
    def f_bits_only(stream, tb, scal):
        # the scatter replay alone (bits path), sharing the field prep
        def lane(strm, tbb, scl):
            nslL = strm.shape[0]
            nchL = tbb.shape[0]
            slot_i = jnp.arange(nslL, dtype=I32)
            trk = jnp.arange(T)
            tbt = tbb.reshape(nchL, 16, CH, F).transpose(0, 2, 1, 3) \
                     .reshape(nslL, 16, F)[:, :T, :]
            n1 = tbt[:, :, TB_N1].astype(I32)
            n2 = tbt[:, :, TB_N2].astype(I32)
            act = tbt[:, :, TB_ACT].astype(I32)
            dup, later, zero = act == 1, act == 2, act == 3
            ncons = n1 + n2
            kvis_b4 = jnp.cumsum(ncons, axis=0) - ncons
            delta = ncons - dup.astype(I32) + later.astype(I32) + zero.astype(I32)
            dc_b4 = jnp.cumsum(delta, axis=0) - delta
            dca = dc_b4 + ncons - dup.astype(I32)
            j3 = jnp.arange(3)[None, None, :]
            has1 = j3 < jnp.minimum(n1, 3)[:, :, None]
            has2 = j3 < jnp.minimum(n2, 3)[:, :, None]
            wr1 = jnp.where(has1, dc_b4[:, :, None] + j3, maxb)
            wr2 = jnp.where(has2, dc_b4[:, :, None] + n1[:, :, None] + j3, maxb)
            i0 = jnp.where(later, jnp.maximum(dca - 1, 0), maxb)
            i1 = jnp.where(later, jnp.minimum(dca, maxb - 1), maxb)
            dcb = dca + later.astype(I32)
            i2 = jnp.where(zero, jnp.minimum(dcb, maxb - 1), maxb)
            wr = jnp.concatenate([wr1, wr2, i0[:, :, None], i1[:, :, None],
                                  i2[:, :, None]], axis=2)
            op_val = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 1, 0], I32)
            key = ((slot_i[:, None, None] * 16 + jnp.arange(9, dtype=I32)) * 2
                   + op_val)
            trkb = jnp.broadcast_to(trk[None, :, None], (nslL, T, 9))
            packed = jnp.full((T, maxb), -1, I32).at[trkb, wr].max(
                jnp.broadcast_to(key, (nslL, T, 9)), mode="drop")
            return jnp.where(packed >= 0, packed & 1, 0).astype(jnp.int8)
        return jax.vmap(jax.vmap(lane))(stream, tb, scal)

    dt, _ = timeit(f_recon, stream, tb, scal)
    print(f"reconstruct only:      {dt*1e3:7.1f} ms", flush=True)
    dt, _ = timeit(f_full, stream, tb, scal, cnt)
    print(f"reconstruct + finish:  {dt*1e3:7.1f} ms", flush=True)
    dt, _ = timeit(f_bits_only, stream, tb, scal)
    print(f"fieldprep + scatter:   {dt*1e3:7.1f} ms", flush=True)

if __name__ == "__main__":
    main()
