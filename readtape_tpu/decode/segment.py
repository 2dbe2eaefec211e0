"""Block segmentation: find interblock gaps over the whole sample tensor.

The reference discovers block boundaries on the fly (idle detection +
interblock countdown, decoder.c:868-894, readtape.c:1112). Here the whole
tape is segmented up front with one data-parallel reduction: a sample is
"active" if any track exceeds a noise-floor threshold; quiet runs longer than
a mode-dependent gap threshold split the tape, and each segment extends to
the midpoints of its bounding gaps so no samples are lost. Segments then
decode independently (and, across devices, in parallel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


CHUNK = 16          # gap-resolution granularity in samples: fine enough
                    # to resolve PE's 2.5-bit idle horizon (~50 samples at
                    # 20 samples/bit), which is where the reference ends a
                    # PE block (decoder.c:868-877)


@partial(jax.jit, static_argnames=())
def activity_chunks(v_abs_max: jnp.ndarray, thresh) -> jnp.ndarray:
    """v_abs_max: [S] max over tracks of |v|. Returns bool [S//CHUNK]:
    any active sample in each chunk."""
    S = v_abs_max.shape[0]
    n = S // CHUNK
    act = (v_abs_max[: n * CHUNK].reshape(n, CHUNK) > thresh).any(axis=1)
    return act


def _activity_from_tape(v_i16, maxvolts, step: int):
    """Height estimate (twice the 0.999-quantile of |v| on a subsample --
    thresholds/floors only, never decode values) and the per-CHUNK
    activity mask at the segmentation threshold derived from it, from the
    device-resident [T, N] tape. The quantile must be extreme: on a
    mostly-empty tape (one small block in seconds of gap) a 0.98-quantile
    lands in the NOISE, collapsing the height estimate and dragging the
    activity threshold to the noise floor -- every chunk goes active and
    the whole tape merges into one segment (hard-fuzz case 7013 lost a
    tapemark that way)."""
    scale = maxvolts / 32767.0
    sub = jnp.abs(v_i16[:, ::step].astype(jnp.float32)) * scale
    amp = jnp.quantile(sub.reshape(-1), 0.999)
    h_est = jnp.maximum(2.0 * amp, 0.05)
    thresh = jnp.maximum(0.04, 0.15 * h_est / 2)
    T, S = v_i16.shape
    n = S // CHUNK
    vmax = jnp.max(jnp.abs(v_i16[:, :n * CHUNK].astype(jnp.float32)),
                   axis=0) * scale
    act = (vmax.reshape(n, CHUNK) > thresh).any(axis=1)
    return h_est, act


@partial(jax.jit, static_argnames=("step",))
def tape_activity(samples_nt: jnp.ndarray, maxvolts, *, step: int):
    """One device pass over the uploaded tape [N, T]: the device-resident
    transposed tape [T, N] plus _activity_from_tape's height estimate and
    activity mask. On the host the transpose + quantile cost ~19 s per
    tape on one slow vCPU; on device it is one fused pass plus two tiny
    fetches."""
    v_i16 = samples_nt.T
    h_est, act = _activity_from_tape(v_i16, maxvolts, step)
    return v_i16, h_est, act


@partial(jax.jit, static_argnames=("step", "n", "t"))
def tape_activity_packed(planes: jnp.ndarray, maxvolts, *, step: int,
                         n: int, t: int):
    """tape_activity from a 12-bit delta-packed upload
    (native.pack12_delta): planes [3, ceil(n*t/2)] uint8 carry biased
    12-bit per-track deltas of the [n, t] int16 tape in flattened C
    order. 25% fewer bytes over the host->device link; the exact int16
    samples come back from one integer cumsum, so everything downstream
    is bit-identical to the raw-upload path."""
    b = planes.astype(jnp.int32)
    u0 = b[0] | ((b[1] & 0xF) << 8)
    u1 = (b[1] >> 4) | (b[2] << 4)
    u = jnp.stack([u0, u1], axis=1).reshape(-1)[: n * t]
    d = u - 2048
    x = jnp.cumsum(d.reshape(n, t), axis=0).astype(jnp.int16)
    v_i16 = x.T
    h_est, act = _activity_from_tape(v_i16, maxvolts, step)
    return v_i16, h_est, act


@partial(jax.jit, static_argnames=("t", "L"))
def unpack_granule(planes: jnp.ndarray, base: jnp.ndarray, n, *, t: int,
                   L: int):
    """Reconstruct one upload granule: planes [3, ceil(L*t/2)] uint8 of
    12-bit biased per-track deltas (native.pack12_delta with `base` = the
    previous granule's last row; the host fills bytes past the real n*t
    elements with the zero-delta pattern), base [t] int16. Returns the
    exact [t, L] int16 slice, zeroed past n. `n` is DATA, not a static
    shape: a tape's final partial granule reuses the same executable as
    every other tape's (remote compiles cost seconds; fresh tapes are the
    common case)."""
    b = planes.astype(jnp.int32)
    u0 = b[0] | ((b[1] & 0xF) << 8)
    u1 = (b[1] >> 4) | (b[2] << 4)
    u = jnp.stack([u0, u1], axis=1).reshape(-1)[: L * t]
    d = u - 2048
    x = (jnp.cumsum(d.reshape(L, t), axis=0) +
         base[None, :].astype(jnp.int32)).astype(jnp.int16)
    v = x.T
    return jnp.where(jnp.arange(L)[None, :] < n, v, jnp.int16(0))


# trailing plane bytes for zero-delta pairs (u0 = u1 = 2048):
# p0 = 0, p1 = (2048 >> 8) | ((2048 & 0xF) << 4) = 8, p2 = 2048 >> 4 = 128
PACK12_PAD = (0, 8, 128)


@partial(jax.jit, static_argnames=())
def granule_from_raw(samples_nt: jnp.ndarray):
    """Raw-upload fallback of unpack_granule: [L, T] int16 (host-padded
    with zeros past the tape) -> [T, L]."""
    return samples_nt.T


def host_activity(samples_i16: np.ndarray, maxvolts: float):
    """_activity_from_tape computed on the host, so segmentation (and the
    decode dispatch it gates) no longer waits on the device upload -- the
    granule pipeline overlaps that upload with decode compute instead.
    Mirrors the device formula op for op (same subsample set, same f32
    scale/compares), so h_est and the mask match up to float reduction
    order; the activity compare itself is exact (|int16| -> f32 * scale
    is lossless and monotone, so comparing the per-chunk int max is the
    same as comparing every sample). The heavy sweep runs in the native
    scanner when available (numpy needs ~1 s/tape on a slow vCPU)."""
    from .. import native

    n, t = samples_i16.shape
    scale = np.float32(maxvolts / 32767.0)
    step = max(1, (n * t) // 2_000_000)
    scanned = native.tape_scan(samples_i16, step)
    if scanned is not None:
        chunk_max, sub_abs = scanned
        sub = sub_abs.astype(np.float32) * scale
    else:
        # int32 abs: np.abs wraps at int16 -32768, the device path
        # (abs of float32) does not
        sub = np.abs(samples_i16[::step].astype(np.float32)) * scale
        nc = n // CHUNK
        chunk_max = (np.abs(samples_i16[: nc * CHUNK].astype(np.int32))
                     .max(axis=1).reshape(nc, CHUNK).max(axis=1))
    amp = np.quantile(sub, 0.999)
    h_est = float(max(2.0 * amp, 0.05))
    thresh = np.float32(max(0.04, 0.15 * h_est / 2))
    act = (chunk_max.astype(np.float32) * scale) > thresh
    return h_est, act


def estimate_height(samples_i16: np.ndarray, maxvolts: float) -> float:
    """Host fallback of tape_activity's height estimate (kept for callers
    that have no device-resident tape)."""
    step = max(1, samples_i16.shape[0] // 2_000_000)
    sub = np.abs(samples_i16[::step].astype(np.float32))
    amp = float(np.quantile(sub, 0.999)) * maxvolts / 32767.0
    return max(2.0 * amp, 0.05)


def find_segments(active: np.ndarray, min_gap_chunks: int, total_samples: int,
                  pre_margin: int = 0, post_margin: int = 0,
                  blank: int = 0):
    """active: host bool array per CHUNK. Returns a list of (start, end)
    sample ranges covering each active region plus margins. The post margin
    reproduces the reference's end-of-block point: its per-mode idle
    detection fires a few bit-times after the last transition
    (decoder.c:868-894), so trailing gap noise is never scanned -- exactly
    as the reference stops sampling a block at all-tracks-idle.

    `blank` reproduces the reference's interblock blanking: after a block
    ends, interblock_counter skips idle-horizon + *_IBG_SECS worth of
    samples outright (decoder.c:841,901; decode_pe.c:95, decode_gcr.c:673),
    so a following segment never starts earlier than the previous ACTIVE
    region's end plus `blank` -- on sub-blank gaps the reference (and we)
    sacrifice the start of the next block's preamble.

    The reference scans the tape gap-to-gap, so its moving window is full
    of REAL gap samples when a block's first peaks arrive; here each
    segment's device slice starts SEG_WARMUP samples before `a` with the
    warmup candidates masked (pipeline.decode_segment_batch), which fixes
    the boundary-fill artifacts fuzz cases 3002/4023 exposed (junk peaks
    admitted from an edge-clamped filling window)."""
    n = len(active)
    if n == 0 or not active.any():
        return []
    idx = np.nonzero(active)[0]
    gaps = np.nonzero(np.diff(idx) - 1 >= min_gap_chunks)[0]
    run_starts = np.concatenate([[idx[0]], idx[gaps + 1]])
    run_ends = np.concatenate([idx[gaps], [idx[-1]]])       # inclusive chunks
    segs = []
    prev_end = 0          # the reference starts scanning at sample 0
    prev_active_end = None
    for s, e in zip(run_starts, run_ends):
        a = max(0, s * CHUNK - pre_margin)
        a = max(a, prev_end if segs else 0)
        if blank and prev_active_end is not None:
            a = max(a, prev_active_end + blank)
        b = min(total_samples, (e + 1) * CHUNK + post_margin)
        if b - a > 4:
            segs.append((int(a), int(b)))
            prev_end = int(b)
        prev_active_end = (e + 1) * CHUNK
    return segs


def bucket_length(n: int, minimum: int = 4096) -> int:
    """Round a length up to a power of two (bounded recompiles)."""
    b = minimum
    while b < n:
        b *= 2
    return b


