"""Fused detached-traversal oracle for the differentiable integrator.

The detached-diff backward pass (``bench.py --grad``) spends most of
its step re-running the detached FORWARD: 4 standalone kernel launches
per step (closest + occlusion x 2 bounces) cost 42.7 of 84.1 ms at
960x540 (profiled, docs/DESIGN.md round 4).  The fused bounce kernel
computes all of it — winner (t, u, v, id), per-light shadow
visibility, and the RR branch decisions — in ONE launch per bounce,
but was "not differentiable" and therefore excluded
(``megakernel.py`` eligibility).

This module lifts the exclusion the detached way: the fused
``bounce_step_tiles(diff_out=True)`` kernel runs the whole bounce under
the hood and RETURNS the detached residuals the differentiable chain
needs (everything a gradient flows through — the winner Moller-Trumbore
recompute, hit frame, BRDF — is recomputed differentiably in XLA from
those residuals, exactly like the existing detached estimator).  The
kernel's decisions are authoritative: the chain adopts the oracle's
found/diffuse/mirror/alive bits, so kernel-vs-XLA last-ulp drift can
never desynchronize branches, and RNG streams stay in lockstep because
commits are gated on the same bits.

In exact (interpret/CPU) semantics the oracle equals the standalone
kernels bit for bit (same winner rule, same RNG, same shadow walk —
``tests/test_diff_oracle.py``); gradients are identical to the
detached mode by construction (the gradient-carrying recompute is the
same code).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .megakernel import _ST_ROWS, RAY_TILE, bounce_step_tiles, staged_flat

__all__ = ["fused_bounce_oracle", "oracle_eligible"]


def oracle_eligible(scene, model_axis) -> bool:
    """Static eligibility for the fused detached oracle."""
    from .pallas_kernels import fits_vmem

    if scene.accel is None or model_axis is not None:
        return False
    if scene.dialect != "gpu":
        return False  # cpuonly soft shadows: not wired for capture
    if not fits_vmem(scene.accel):
        return False
    n_lights = int(scene.lights.intensity.shape[0])
    # visibility bits ride an exact-integer f32 oracle row: <= 24 bits
    # (f32 mantissa); a zero-light scene has no visibility to capture
    # and no speedup to gain — keep its plain detached path
    return 1 <= n_lights <= 24


def fused_bounce_oracle(origins: Array, dirs: Array, seeds: Array,
                        scene, max_depth: int, *, interpret: bool,
                        det_eps: float, tmin: float, shadow_eps: float,
                        shadow_tmin: float, cand=None):
    """Run ``max_depth`` fused bounce kernels on the wavefront and
    return per-bounce detached residual dicts (lists of (R,) arrays):
    ``t, u, v`` f32; ``idx`` int32 (-1 miss); ``vis`` int32 per-light
    unoccluded bits; ``dec`` int32 decision bits (1 found, 2 diffuse,
    4 mirror, 8 alive-after).  All outputs are stop_gradient'd.

    ``cand``: optional ``(meta, stream, chunk)`` binned camera-candidate
    plan (``ops.binned``; stream refreshed against the CURRENT grid via
    ``refresh_stream``) — bounce 0 then dense-tests each tile's own
    candidate chunks instead of every block (~15x fewer pairs on the
    grad-bench scene).  Bounces >= 1 keep the block walk (their
    wavefronts are not the camera bin).  The plan must cover this exact
    padded tile stream (meta rows == nt)."""
    sg = jax.lax.stop_gradient
    origins = sg(origins)
    dirs = sg(dirs)
    # the scene's leaves (vertices, accel planes, materials, lights)
    # carry tangents under value_and_grad — the kernels are detached
    # oracles, so cut every input edge into pallas_call
    scene = jax.tree.map(sg, scene)
    r = origins.shape[0]
    pad = (-r) % (8 * RAY_TILE)
    rp = r + pad
    nt = rp // RAY_TILE

    def stream(x, fill):
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x
        return x.reshape(nt, RAY_TILE)

    zeros = jnp.zeros((nt, RAY_TILE), jnp.float32)
    ones = jnp.ones((nt, RAY_TILE), jnp.float32)
    rows = [
        stream(origins[:, 0], 1e30), stream(origins[:, 1], 1e30),
        stream(origins[:, 2], 1e30),
        stream(dirs[:, 0], 0.0), stream(dirs[:, 1], 0.0),
        stream(dirs[:, 2], 1.0),
        ones, ones, ones,          # throughput
        zeros, zeros, zeros,       # radiance (unused)
        jnp.concatenate(           # alive: real rays only
            [jnp.ones(r, jnp.float32), jnp.zeros(pad, jnp.float32)]
        ).reshape(nt, RAY_TILE) if pad else ones,
    ] + [zeros] * (_ST_ROWS - 13)
    st = jnp.stack(rows, axis=1).reshape(nt * _ST_ROWS, RAY_TILE)
    seeds_i = jnp.asarray(seeds).view(jnp.int32) if seeds.dtype == jnp.uint32 \
        else jnp.asarray(seeds, jnp.int32)
    rng = jnp.concatenate([
        stream(seeds_i, 0)[:, None, :],
        jnp.zeros((nt, 7, RAY_TILE), jnp.int32),
    ], axis=1).reshape(nt * 8, RAY_TILE)

    grid = scene.accel
    flat = staged_flat(grid.num_blocks)
    ls = -(-grid.num_blocks // 8)
    kw = dict(interpret=interpret, det_eps=det_eps, tmin=tmin,
              shadow_eps=shadow_eps, shadow_tmin=shadow_tmin,
              dialect="gpu", diff_out=True)

    out = dict(t=[], u=[], v=[], idx=[], vis=[], dec=[])
    for _k in range(int(max_depth)):
        if flat:
            order = jnp.zeros((nt, ls), jnp.int32)
            entry = jnp.zeros((nt, ls), jnp.float32)
        else:
            from .wavefront import bounce_tile_plan

            order, entry = bounce_tile_plan(st, grid)
        ckw = {}
        if _k == 0 and cand is not None:
            meta, stream, cchunk = cand
            ckw = dict(cand_meta=jax.lax.stop_gradient(meta),
                       cand_stream=jax.lax.stop_gradient(stream),
                       cand_chunk=int(cchunk))
        st, rng, diff = bounce_step_tiles(scene, st, rng, order, entry,
                                          **kw, **ckw)
        dv = sg(diff).reshape(nt, 8, RAY_TILE)
        take = lambda row: dv[:, row].reshape(rp)[:r]
        out["t"].append(take(0))
        out["u"].append(take(1))
        out["v"].append(take(2))
        out["idx"].append(take(3).astype(jnp.int32))
        out["vis"].append(take(4).astype(jnp.int32))
        out["dec"].append(take(5).astype(jnp.int32))
    return out
