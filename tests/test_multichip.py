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


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_sharded_gcr_decode_correctness():
    """The (data x parm) sharding is mode-agnostic: a GCR segment batch
    decoded over the mesh must equal the single-device decode exactly."""
    import dataclasses
    from functools import partial

    import jax.numpy as jnp

    from readtape_tpu.decode import common as cm
    from readtape_tpu.decode.common import F32, I32, ParmArrays
    from readtape_tpu.decode.pipeline import _gcr_segment_device
    from readtape_tpu.formats import tbin as tb
    from readtape_tpu.formats.parms import builtin_parmsets
    from readtape_tpu.parallel import make_decode_mesh, sharded_decode_step
    from readtape_tpu.synth import default_spec, synthesize_tape

    S, P, B = 8192, 2, 4
    rng = np.random.default_rng(5)
    spec = default_spec(tb.MODE_GCR, start_gap_secs=0.0008, ibg_secs=0.002)
    blocks = [bytes(rng.integers(0, 256, 40, dtype=np.uint8))
              for _ in range(B)]
    hdr, samples = synthesize_tape(spec, [("block", b) for b in blocks])
    v = samples.T.astype(np.int16)
    segs = []
    per = v.shape[1] // B
    for i in range(B):
        sl = v[:, i * per:i * per + S]
        segs.append(np.pad(sl, ((0, 0), (0, S - sl.shape[1]))))
    vb = jnp.asarray(np.stack(segs))

    ps = builtin_parmsets(tb.MODE_GCR)
    base = ps.sets[0]
    ps.sets = [dataclasses.replace(base, clk_alpha=0.01 + 0.005 * i)
               for i in range(P)]
    pa = ParmArrays.from_parmsets(ps)
    deltat = hdr.tdelta_ns * 1e-9
    spb = 1.0 / (9042 * 25 * deltat)
    W = cm.pkww_width_for(base.pkww_bitfrac, 9042, 25, deltat)
    T = 9
    nsteps = int(S / spb * 3.2) + 64
    maxb = int(S / spb * 1.3) + 64

    fn = partial(_gcr_segment_device, S=S, T=T, P=P, nsteps=nsteps,
                 maxb=maxb, Ws=(W,) * P, do_correct=False,
                 do_correct2=False, find_zeros=False, differentiate=False,
                 spb_int=int(spb))

    def step(vb, *rest):
        lens = jnp.full(vb.shape[:1], S, jnp.int32)
        leads = jnp.zeros(vb.shape[:1], jnp.int32)
        res = jax.vmap(fn, in_axes=(0, 0, 0) + (None,) * 11)(
            vb, lens, leads, *rest)
        return res["frames"], res["errcount"], res["blktype"], res["minbits"]

    args = (vb, jnp.float32(hdr.maxvolts), jnp.float32(1.0),
            jnp.zeros(T, I32), pa, jnp.float32(spb), jnp.int32(1),
            jnp.int32(0), jnp.full(T, 0.02, F32), jnp.full(T, 0.1, F32),
            jnp.float32(0.0), jnp.float32(1.0))

    ref = jax.jit(step)(*args)
    mesh = make_decode_mesh(jax.devices()[:4], parm_axis=2)
    sharded = sharded_decode_step(mesh, step, len(args))
    with mesh:
        got = sharded(*args)
    assert int(np.asarray(ref[2]).max()) == 4, "no GCR block decoded"
    for r, g_ in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g_))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_production_decode_tape_sharded_equality():
    """VERDICT r2 item 6: the PRODUCTION decode_tape (staged retry,
    buckets, best-pick, multi-block re-dispatch) sharded over an 8-device
    (data x parm) mesh must equal the single-device decode byte-for-byte,
    including parmset/tries decisions."""
    from readtape_tpu.formats import tbin as tb
    from readtape_tpu.synth import default_spec, synthesize_tape
    from readtape_tpu.decode.pipeline import DecodeOptions, decode_tape
    from readtape_tpu.parallel import make_decode_mesh, set_decode_mesh

    rng = np.random.default_rng(99)
    spec = default_spec(tb.MODE_NRZI, ibg_secs=0.004, start_gap_secs=0.004)
    blocks = [bytes(rng.integers(0, 256, 180, dtype=np.uint8))
              for _ in range(12)]
    items = [("block", b) for b in blocks]
    items.insert(5, ("tapemark",))
    import dataclasses
    hdr, samples = synthesize_tape(dataclasses.replace(spec, seed=99), items)
    opts = DecodeOptions(mode=tb.MODE_NRZI, ntrks=9, bpi=800, ips=50,
                         deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)

    def sig(out):
        return [(b.kind, b.data, b.parmset, b.tries, b.errcount,
                 b.warncount) for b in out]

    ref_out, ref_stats = decode_tape(samples, opts)
    assert [b.data for b in ref_out if b.kind == "data"] == blocks
    try:
        set_decode_mesh(make_decode_mesh(jax.devices()[:8], parm_axis=2))
        got_out, got_stats = decode_tape(samples, opts)
    finally:
        set_decode_mesh(None)
    assert sig(got_out) == sig(ref_out)
    np.testing.assert_array_equal(got_stats["tried"], ref_stats["tried"])
    np.testing.assert_array_equal(got_stats["chosen"], ref_stats["chosen"])
    np.testing.assert_array_equal(got_stats["peak_hist"],
                                  ref_stats["peak_hist"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_production_decode_tape_sharded_gcr():
    """Same production-path equality for GCR (uniform window widths, so
    the parm axis of the mesh engages on the retry phase)."""
    from readtape_tpu.formats import tbin as tb
    from readtape_tpu.synth import default_spec, synthesize_tape
    from readtape_tpu.decode.pipeline import DecodeOptions, decode_tape
    from readtape_tpu.parallel import make_decode_mesh, set_decode_mesh

    rng = np.random.default_rng(7)
    spec = default_spec(tb.MODE_GCR, start_gap_secs=0.0008, ibg_secs=0.002)
    blocks = [bytes(rng.integers(0, 256, 64, dtype=np.uint8))
              for _ in range(6)]
    hdr, samples = synthesize_tape(spec, [("block", b) for b in blocks])
    opts = DecodeOptions(mode=tb.MODE_GCR, ntrks=9, bpi=9042, ips=25,
                         deltat=hdr.tdelta_ns * 1e-9, maxvolts=hdr.maxvolts)

    def sig(out):
        return [(b.kind, b.data, b.parmset, b.tries, b.errcount,
                 b.warncount) for b in out]

    ref_out, _ = decode_tape(samples, opts)
    assert [b.data for b in ref_out if b.kind == "data"] == blocks
    try:
        set_decode_mesh(make_decode_mesh(jax.devices()[:8], parm_axis=2))
        got_out, _ = decode_tape(samples, opts)
    finally:
        set_decode_mesh(None)
    assert sig(got_out) == sig(ref_out)
