"""Probe 2: dynamic ROW indexing of a 2D VMEM ref inside fori_loop --
the Mosaic-native way to express a sliding window at dynamic offsets."""
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

def kern(v_ref, o_ref):
    def body(i, acc):
        row = i % 100
        r0 = v_ref[pl.dslice(row, 1), :]          # [1, 128] dynamic row
        r1 = v_ref[pl.dslice(row + 1, 1), :]
        two = jnp.concatenate([r0, r1], axis=0)   # [2, 128]
        return acc + jnp.max(two)
    acc = jax.lax.fori_loop(0, 1000, body, jnp.float32(0.0))
    o_ref[...] = jnp.broadcast_to(acc, (1, 1))

@jax.jit
def run(v):
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))(v)

v = jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128)
import time
r = run(v); jax.block_until_ready(r)
t0 = time.perf_counter()
r = run(v); jax.block_until_ready(r)
print("result:", r, f"time {1e3*(time.perf_counter()-t0):.2f} ms")
