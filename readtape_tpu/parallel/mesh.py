"""Multi-chip scaling via jax.sharding.

Tape decoding has no cross-chip data dependencies until final block
concatenation (SURVEY.md section 2: block/chunk parallelism), so the
scale-out story is:

  - mesh axis "data": tape segments (blocks) shard across chips -- each chip
    decodes its own slice of the tape,
  - mesh axis "parm": the parameter-set retry batch shards across chips --
    the same waveform decoded under different parmsets on different chips
    (useful when a damaged tape needs many parmsets: the reference retries
    sequentially, we fan out),

with tracks and the scan lanes vectorized within each chip. The only
collectives are the implicit gathers XLA inserts when results return to the
host, riding ICI.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_decode_mesh(devices=None, parm_axis: int = 1) -> Mesh:
    """Build a (data, parm) mesh over the given devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    pp = parm_axis
    while n % pp:
        pp -= 1
    dd = n // pp
    return Mesh(np.asarray(devices).reshape(dd, pp), ("data", "parm"))


def sharded_decode_step(mesh: Mesh, decode_fn, n_args: int):
    """Wrap a batched segment-decode function (v [B,T,S] + broadcast args)
    with shardings: the segment batch splits over "data"; the ParmArrays
    pytree (arg index 4) splits over "parm"."""
    v_sharding = NamedSharding(mesh, P("data", None, None))
    parm_sharding = NamedSharding(mesh, P("parm"))
    rep = NamedSharding(mesh, P())
    in_shardings = [v_sharding] + [rep] * (n_args - 1)
    in_shardings[4] = parm_sharding     # the ParmArrays pytree leaves
    return jax.jit(decode_fn, in_shardings=tuple(in_shardings))
