"""Wavefront bounce scheduling: sort-compacted bounce wavefronts.

The monolithic megakernel (``ops.megakernel.render_tiles``) keeps each
camera tile's rays together for the whole path.  After one diffuse
bounce only ~3% of the frog frame's rays are alive, scattered across
~5% of the tiles, so bounce traversal wastes >90% of its dense
arithmetic on dead or slab-failing lanes (measured: bounce 1 of 8 costs
~89 ms of a 216 ms 1080p frame; scripts/probe_bounce_stats.py).

This module is the TPU restatement of wavefront path tracing (the
stream-compaction design of Laine et al. 2013, "Megakernels Considered
Harmful" — the reference's ``TraceRayIterative`` is the megakernel
form, ``query.h:156-220``):

  1. ``emit_tiles`` runs depth 0 fused (jitter, camera rays, planned
     traversal, direct light, RR bounce decision) and writes per-ray
     bounce state;
  2. ONE ``lax.sort`` over the flat ray axis packs alive rays to the
     front and orders them by (direction octant, origin morton) —
     on TPU a multi-operand sort is fast (~18 ms for 2M x 16 at 1080p)
     while gathers/scatters are catastrophically slow
     (scripts/probe_compact_glue.py), so compaction IS a sort;
  3. ``resume_tiles`` runs bounce depths 1..max on the packed tiles:
     dense occupancy, coherent slab behavior, and dead tiles form a
     suffix that exits at one scalar test;
  4. a second 4-operand sort returns per-ray radiance to pixel order.

Per-ray math is bit-identical to the monolithic kernel (state rides
verbatim through the sorts; radiance accumulates in the same order),
so images match lane-for-lane — the ordering-invariance the whole
framework maintains (images must not depend on ray placement).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .lbvh import _bit_expand
from .megakernel import (
    _ST_ALIVE_ROW,
    _ST_LIVE_ROWS,
    _ST_ROWS,
    RAY_TILE,
    _pad_plan_rows,
    _pad_tiles,
    camera_tile_plan,
    emit_tiles,
    resume_tiles,
)

__all__ = ["render_tiles_wavefront", "sort_bounce_state"]

_I32_MAX = np.int32(2**31 - 1)


def _sort_key(bo, bd, alive, lo, span):
    """(direction octant << 24) | 24-bit origin morton; dead rays get
    INT32_MAX so they pack to the tail of the sorted stream.  Bit
    interleave via ``lbvh._bit_expand`` (``bitExpansion``, bvh.h:131-140;
    the quantized inputs here use 8 of its 10 bits)."""
    oct_ = (
        (jnp.where(bd[0] < 0.0, 4, 0))
        | (jnp.where(bd[1] < 0.0, 2, 0))
        | (jnp.where(bd[2] < 0.0, 1, 0))
    ).astype(jnp.int32)
    q = [
        jnp.clip((bo[c] - lo[c]) / span[c] * 256.0, 0.0, 255.0).astype(
            jnp.uint32
        )
        for c in range(3)
    ]
    morton = (
        _bit_expand(q[0])
        | (_bit_expand(q[1]) << 1)
        | (_bit_expand(q[2]) << 2)
    ).astype(jnp.int32)
    key = (oct_ << 24) | morton
    return jnp.where(alive, key, _I32_MAX)


def sort_bounce_state(state: Array, rng_state: Array, pix: Array,
                      lo, span):
    """Globally sort per-ray bounce state by the compaction key.

    ``state`` is the (nt*16, RAY_TILE) row layout of ``emit_tiles``;
    returns (sorted state, sorted rng, sorted pixel ids).

    The sort is deliberately UNSTABLE: per-ray math never depends on a
    ray's tile placement (the framework's ordering-invariance contract)
    and the unsort keys (pixel ids) are unique, so stability would only
    add a hidden iota tiebreak operand to the hot ~2M-row multi-operand
    sort for nothing.
    """
    nt = state.shape[0] // _ST_ROWS
    nr = nt * RAY_TILE
    stv = state.reshape(nt, _ST_ROWS, RAY_TILE)

    def plane(k):
        return stv[:, k, :].reshape(nr)

    planes = [plane(k) for k in range(_ST_LIVE_ROWS)]
    rng_flat = rng_state.reshape(nt, 8, RAY_TILE)[:, 0, :].reshape(nr)
    key = _sort_key(planes[0:3], planes[3:6],
                    planes[_ST_ALIVE_ROW] > 0.0, lo, span)

    out = jax.lax.sort(
        tuple([key, pix, rng_flat] + planes), dimension=0, num_keys=1,
    )
    pix_s, rng_s = out[1], out[2]
    planes_s = list(out[3:])

    rows = planes_s + (
        [jnp.zeros(nr, jnp.float32)] * (_ST_ROWS - _ST_LIVE_ROWS))
    st_s = jnp.stack(
        [r.reshape(nt, RAY_TILE) for r in rows], axis=1
    ).reshape(nt * _ST_ROWS, RAY_TILE)
    rng_rows = jnp.concatenate(
        [rng_s.reshape(nt, 1, RAY_TILE),
         jnp.zeros((nt, 7, RAY_TILE), jnp.int32)], axis=1
    ).reshape(nt * 8, RAY_TILE)
    return st_s, rng_rows, pix_s


@partial(jax.jit, static_argnames=("spp", "interpret", "det_eps", "tmin",
                                   "shadow_eps", "shadow_tmin",
                                   "dialect", "jitter", "shadow_samples"))
def render_tiles_wavefront(
    scene,
    xs: Array,
    ys: Array,
    spp: int,
    sample_offset=0,
    *,
    interpret: bool = False,
    det_eps: float = 1e-8,
    tmin: float = 1e-4,
    shadow_eps: float = 1e-3,
    shadow_tmin: float = 1e-4,
    dialect: str = "gpu",
    jitter: str = "wang",
    shadow_samples: int = 1,
) -> Array:
    """Wavefront render of swizzled pixel tiles -> (N, 3) radiance SUM
    over spp samples; drop-in for ``megakernel.render_tiles`` on
    non-terminal scenes of either dialect (bit-identical output)."""
    grid = scene.accel
    xs_p, ys_p, n, np_rays = _pad_tiles(xs, ys)
    nt = np_rays // RAY_TILE

    # scene bounds for morton quantization (any monotone map works;
    # block AABBs cover all real triangles)
    lo = [jnp.min(grid.aabb[c]) for c in range(3)]
    span = [jnp.maximum(jnp.max(grid.aabb[3 + c]) - lo[c], 1e-20)
            for c in range(3)]
    pix = jnp.arange(np_rays, dtype=jnp.int32)

    # the camera plan is sample-independent: build it ONCE and hand it
    # to every emit (otherwise each sample re-traces the O(nt x LS)
    # hull/slab/argsort build — duplicated spp times in the unrolled
    # graph, or left to while-loop LICM in the scan branch)
    plan = _pad_plan_rows(
        *camera_tile_plan(scene.camera, xs_p, ys_p, grid, RAY_TILE))

    kw = dict(interpret=interpret, det_eps=det_eps, tmin=tmin,
              shadow_eps=shadow_eps, shadow_tmin=shadow_tmin,
              dialect=dialect, shadow_samples=shadow_samples)

    def one_sample(s):
        st, rng = emit_tiles(scene, xs_p, ys_p, s, jitter=jitter,
                             plan=plan, **kw)
        st_s, rng_s, pix_s = sort_bounce_state(st, rng, pix, lo, span)
        r, g, b = resume_tiles(scene, st_s, rng_s, **kw)
        # radiance back to pixel order: one more (cheap) 3-payload sort
        _, r2, g2, b2 = jax.lax.sort(
            (pix_s, r.reshape(np_rays), g.reshape(np_rays),
             b.reshape(np_rays)),
            dimension=0, num_keys=1,
        )
        if dialect == "cpuonly":
            # no per-sample clamp in this dialect (clamped at PNG)
            return r2, g2, b2
        # per-sample clamp (query.h:219), same point in the op order as
        # the monolithic kernel's accumulation
        return (jnp.clip(r2, 0.0, 1.0), jnp.clip(g2, 0.0, 1.0),
                jnp.clip(b2, 0.0, 1.0))

    off = jnp.asarray(sample_offset, jnp.int32)
    if spp <= 4:
        acc = [jnp.zeros(np_rays, jnp.float32) for _ in range(3)]
        for s in range(spp):
            sample = one_sample(off + s)
            acc = [a + c for a, c in zip(acc, sample)]
    else:
        # one traced pipeline, scanned over samples (the HLO would
        # otherwise contain spp copies of emit/sort/resume)
        def step(carry, s):
            sample = one_sample(off + s)
            return tuple(a + c for a, c in zip(carry, sample)), None

        acc, _ = jax.lax.scan(
            step,
            tuple(jnp.zeros(np_rays, jnp.float32) for _ in range(3)),
            jnp.arange(spp, dtype=jnp.int32),
        )
    return jnp.stack([a[:n] for a in acc], axis=1)  # (N, 3) sums
