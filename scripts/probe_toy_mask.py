"""Toy-kernel bisect of the VMEM OOM: which construct blows scoped vmem?

Variants:
  a) vectorized (L, RT) slab grid computed in-kernel, result reduced to
     scratch (L, 1)
  b) while_loop branching on a dynamic scalar read from VMEM scratch
  c) both together (the shape that OOM'd in the real kernel)
"""
import sys
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

L, RT = 156, 512
LP = 160


def kernel(mode, rays_ref, aabb_ref, out_ref, smask_ref):
    o = tuple(rays_ref[pl.ds(k, 1), :] for k in range(3))
    si = tuple(1.0 / rays_ref[pl.ds(k, 1), :] for k in range(3, 6))
    dist = rays_ref[pl.ds(6, 1), :]
    out_ref[:] = jnp.zeros((8, RT), jnp.float32)

    if mode in ("grid", "both"):
        t0 = jnp.broadcast_to(jnp.full((1, RT), 1e-4, jnp.float32), (L, RT))
        t1 = jnp.broadcast_to(dist, (L, RT))
        for axis in range(3):
            bmin = aabb_ref[:, axis].reshape(L, 1)
            bmax = aabb_ref[:, axis + 3].reshape(L, 1)
            lo = (bmin - o[axis]) * si[axis]
            hi = (bmax - o[axis]) * si[axis]
            t0 = jnp.maximum(t0, jnp.minimum(lo, hi))
            t1 = jnp.minimum(t1, jnp.maximum(lo, hi))
        cand = t0 <= t1
        smask_ref[pl.ds(0, L), :] = jnp.max(
            jnp.where(cand, 1.0, 0.0), axis=1, keepdims=True)
    else:
        smask_ref[:] = jnp.ones((LP, 1), jnp.float32)

    if mode in ("scalar", "both"):
        def cond(k):
            return (k < L) & jnp.any(out_ref[:] < 3.0)

        def body(k):
            @pl.when(smask_ref[pl.ds(k, 1), :][0, 0] > 0.0)
            def _():
                out_ref[:] = out_ref[:] + 1.0

            return k + 1

        jax.lax.while_loop(cond, body, jnp.int32(0))
    else:
        out_ref[:] = smask_ref[pl.ds(0, 1), :] + dist


@partial(jax.jit, static_argnames=("mode",))
def run(mode, rays, aabb):
    return pl.pallas_call(
        partial(kernel, mode),
        out_shape=[jax.ShapeDtypeStruct((64, RT), jnp.float32)],
        grid=(8,),
        in_specs=[
            pl.BlockSpec((8, RT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((8, RT), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((LP, 1), jnp.float32)],
    )(rays, aabb)


rays = jnp.ones((64, RT), jnp.float32)
aabb = jnp.ones((L, 8), jnp.float32)
for mode in ("grid", "scalar", "both"):
    try:
        out = jax.block_until_ready(run(mode, rays, aabb))
        print(f"{mode}: OK {float(out[0].sum()):.1f}", file=sys.stderr)
    except Exception as e:
        print(f"{mode}: FAIL {str(e)[:300]}", file=sys.stderr)
