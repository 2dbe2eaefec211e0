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

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# --- production decode mesh -------------------------------------------------
# decode_tape shards its segment batches over this mesh when one is set
# (pipeline._batched_fn wraps the device program in jax.shard_map). The
# version counter keys the pipeline's executable cache so switching meshes
# mid-process can't reuse a stale sharded executable.
_DECODE_MESH = None
_DECODE_MESH_VERSION = 0


def set_decode_mesh(mesh: "Mesh | None") -> None:
    """Install (or clear) the mesh the production decode pipeline shards
    over. The CLI's -mesh option and READTAPE_MESH=1 call this."""
    global _DECODE_MESH, _DECODE_MESH_VERSION
    _DECODE_MESH = mesh
    _DECODE_MESH_VERSION += 1


def get_decode_mesh():
    """(mesh, version) -- mesh is None when decoding single-device."""
    global _DECODE_MESH, _DECODE_MESH_VERSION
    if _DECODE_MESH is None and os.environ.get("READTAPE_MESH") == "1":
        if len(jax.devices()) > 1:
            _DECODE_MESH = make_decode_mesh(
                parm_axis=int(os.environ.get("READTAPE_MESH_PARM", "1")))
            _DECODE_MESH_VERSION += 1
    return _DECODE_MESH, _DECODE_MESH_VERSION


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
