"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import os
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)      # raises on failure


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_sharded_decode_correctness():
    """The mesh-sharded decode must produce the same frames as single-device."""
    import __graft_entry__ as g
    from readtape_tpu.parallel import make_decode_mesh, sharded_decode_step

    S, P = 4096, 2
    args, spb, _ = g._make_inputs(4, S, P)
    fn = g._decode_fn(S, P, spb)

    def step(*a):
        res = fn(*a)
        return res["frames"], res["errcount"], res["blktype"]

    ref = jax.jit(step)(*args)
    mesh = make_decode_mesh(jax.devices()[:4], parm_axis=2)
    sharded = sharded_decode_step(mesh, step, len(args))
    with mesh:
        got = sharded(*args)
    for r, g_ in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g_))
