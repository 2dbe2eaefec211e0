"""readtape_tpu: a TPU-native framework for recovering data from digitized
analog magnetic-tape recordings.

This is a ground-up, TPU-first reimplementation of the capabilities of
LenShustek/readtape (reference: /root/reference/src/readtape.c et al.):
multi-track flux-transition detection, clock recovery, and NRZI / PE / GCR /
Whirlwind decoding, with parity/CRC/LRC/ECC validation, batched
multi-parameter-set retry, SIMH .tap and binary outputs, interpreted text
dumps, IBM label handling, and CSV<->TBIN conversion.

Architecture (nothing is ported line-by-line; the signal chain is reformulated
for XLA/Pallas):

  host ingest (TBIN/CSV, C++ fast path)  ->  int16 sample tensor in HBM
    stage 1: windowed min/max/argmax stencils over all samples x tracks
             (pure data-parallel; XLA reduce_window / Pallas kernels)
    stage 2: sparse candidate-event compaction, then a lax.scan over *events*
             (not samples) applying exact peak admission, the blind-window
             rule, AGC, and clock recovery; vmapped over
             blocks x parmsets x tracks
    stage 3: mode-specific bit emission (NRZI global clock scan, PE/GCR
             per-track self-clocked scans, WW redundant-track merge)
    stage 4: block post-processing as dense int ops (parity, CRC/LRC,
             GCR group decode + ECC correction, tapemark patterns)
    stage 5: best-decoding selection across the parmset batch axis
  host output (.tap/.bin/.txt/logs)

Multi-chip scaling is pure data parallelism over tape segments via
jax.sharding; see readtape_tpu.parallel.
"""

from .version import __version__

__all__ = ["__version__"]
