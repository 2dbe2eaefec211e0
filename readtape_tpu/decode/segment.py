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

from .common import F32

CHUNK = 64          # gap-resolution granularity in samples


@partial(jax.jit, static_argnames=())
def activity_chunks(v_abs_max: jnp.ndarray, thresh) -> jnp.ndarray:
    """v_abs_max: [S] max over tracks of |v|. Returns bool [S//CHUNK]:
    any active sample in each chunk."""
    S = v_abs_max.shape[0]
    n = S // CHUNK
    act = (v_abs_max[: n * CHUNK].reshape(n, CHUNK) > thresh).any(axis=1)
    return act


def estimate_height(samples_i16: np.ndarray, maxvolts: float) -> float:
    """Robust peak-to-peak estimate: twice a high quantile of |v| over a
    subsample. Used only for thresholds/floors, never for decode values."""
    step = max(1, samples_i16.shape[0] // 2_000_000)
    sub = np.abs(samples_i16[::step].astype(np.float32))
    amp = float(np.quantile(sub, 0.98)) * maxvolts / 32767.0
    return max(2.0 * amp, 0.05)


def find_segments(active: np.ndarray, min_gap_chunks: int, total_samples: int):
    """active: host bool array per CHUNK. Returns list of (start, end) sample
    ranges partitioned at the midpoints of qualifying gaps."""
    n = len(active)
    if n == 0 or not active.any():
        return []
    # indices of active chunks
    idx = np.nonzero(active)[0]
    # gaps between consecutive active chunks
    gaps = np.nonzero(np.diff(idx) - 1 >= min_gap_chunks)[0]
    cuts = []
    for g in gaps:
        lo, hi = idx[g], idx[g + 1]
        cuts.append(((lo + hi + 1) // 2) * CHUNK)
    bounds = [0] + cuts + [total_samples]
    segs = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        segs.append((a, b))
    return segs


def bucket_length(n: int, minimum: int = 4096) -> int:
    """Round a segment length up to a power of two (bounded recompiles)."""
    b = minimum
    while b < n:
        b *= 2
    return b
