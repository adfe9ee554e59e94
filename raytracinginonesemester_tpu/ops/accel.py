"""Block-culling acceleration structure — the TPU-shaped traversal.

Per-ray stack traversal (``ops.traversal``) is semantically faithful to
the reference but maps poorly onto TPU: every step is a data-dependent
gather and per-lane branching.  The TPU-native formulation trades tree
depth for vectorizable breadth (the "wide/shallow" plan from SURVEY.md
section 7):

1. **Build** (from the same Morton order the LBVH uses,
   ``bvh.cu:101-133``): sort triangles by centroid Morton code and group
   consecutive runs of ``block_size`` into *blocks*; a block's AABB is the
   union of its members'.  Spatially-coherent triangles land in the same
   block, so block AABBs are tight — this is exactly the bottom
   ``log2(block_size)`` levels of the LBVH collapsed into one node.

2. **Query**: for a wavefront of rays, slab-test *all* block AABBs
   against all rays — an (R, L) elementwise grid, perfectly regular.
   Then visit only blocks some ray hit, in a compacted dynamic-length
   ``while_loop``; each visit is a dense (R, block_size)
   Moller-Trumbore — large, regular, fusible arithmetic instead of
   pointer chasing.  The reference's per-thread stack becomes "one shared
   worklist per wavefront"; its stack-overflow -> brute-force fallback
   (``query.h:298-308``) corresponds to the degenerate case where every
   block is active, which is simply... visiting every block.

Coherent wavefronts (primary rays, shadow rays) activate a small block
subset; fully-incoherent wavefronts degrade to brute force over blocks —
the same worst case the reference has.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .intersect import F32_MAX, HitData
from .lbvh import morton_codes, triangle_aabbs
from .traversal import _slab_test

__all__ = ["BlockGrid", "build_block_grid", "block_closest", "block_occluded"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockGrid:
    """Morton-ordered triangle blocks with per-block AABBs.

    ``vertices`` is (L, B, 3, 3) — triangles re-ordered by Morton code and
    padded with point-degenerate triangles (never hit: zero edges give
    det == 0).  ``tri_index`` maps back to original triangle ids (-1 for
    padding).
    """

    vertices: Array  # (L, B, 3, 3)
    tri_index: Array  # (L, B) int32, original triangle index or -1
    aabb_min: Array  # (L, 3)
    aabb_max: Array  # (L, 3)
    block_size: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_blocks(self) -> int:
        return int(self.vertices.shape[0])


@partial(jax.jit, static_argnames=("block_size",))
def build_block_grid(vertices: Array, num_valid: Array, block_size: int = 128) -> BlockGrid:
    """Build the block grid from (T, 3, 3) triangles.

    ``num_valid`` masks padding triangles (they sort to a dedicated tail
    region and never produce hits).  T must be a multiple of
    ``block_size``.
    """
    t = vertices.shape[0]
    assert t % block_size == 0, "triangle count must be padded to block_size"
    l = t // block_size

    leaf_min, leaf_max = triangle_aabbs(vertices)
    valid = jnp.arange(t) < num_valid
    vmin = jnp.where(valid[:, None], leaf_min, jnp.inf)
    vmax = jnp.where(valid[:, None], leaf_max, -jnp.inf)
    scene_min = jnp.min(vmin, axis=0)
    scene_max = jnp.max(vmax, axis=0)

    centroid = 0.5 * (leaf_min + leaf_max)
    extent = scene_max - scene_min
    norm = (centroid - scene_min) / jnp.where(extent == 0, 1.0, extent)
    codes = morton_codes(norm)
    # push padding to the end regardless of its morton code
    codes = jnp.where(valid, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes, stable=True).astype(jnp.int32)

    sorted_verts = vertices[order].reshape(l, block_size, 3, 3)
    sorted_valid = valid[order]
    tri_index = jnp.where(sorted_valid, order, -1).reshape(l, block_size)

    bmin = jnp.where(sorted_valid[:, None], leaf_min[order], jnp.inf)
    bmax = jnp.where(sorted_valid[:, None], leaf_max[order], -jnp.inf)
    block_min = bmin.reshape(l, block_size, 3).min(axis=1)
    block_max = bmax.reshape(l, block_size, 3).max(axis=1)

    return BlockGrid(
        vertices=sorted_verts,
        tri_index=tri_index,
        aabb_min=block_min,
        aabb_max=block_max,
        block_size=block_size,
    )


def _block_tri_test(o, d, tris, det_eps, tmin, tmax):
    """(R,) rays vs one block's (B, 3, 3) tris -> per-ray best within block."""
    v0 = tris[:, 0]
    e1c = tris[:, 1] - v0
    e2c = tris[:, 2] - v0
    pvec = jnp.cross(d[:, None, :], e2c[None])
    det = jnp.sum(e1c[None] * pvec, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < det_eps, 1.0, det)
    tvec = o[:, None, :] - v0[None]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1c[None])
    v = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2c[None] * qvec, axis=-1) * inv_det
    ok = (
        (jnp.abs(det) >= det_eps)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= tmin[:, None]) & (t <= tmax[:, None])
    )
    t = jnp.where(ok, t, F32_MAX)
    j = jnp.argmin(t, axis=-1)
    rows = jnp.arange(o.shape[0])
    return t[rows, j], u[rows, j], v[rows, j], j


@partial(jax.jit, static_argnames=("det_eps",))
def block_closest(
    origins: Array,
    dirs: Array,
    grid: BlockGrid,
    tmin=1e-4,
    *,
    det_eps: float = 1e-8,
) -> HitData:
    """Closest hit for a ray wavefront via block culling."""
    r = origins.shape[0]
    l = grid.num_blocks
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    inv_d = 1.0 / dirs

    # (R, L) slab grid — regular elementwise work, the TPU sweet spot
    hit_grid = _slab_test(
        origins[:, None, :],
        inv_d[:, None, :],
        grid.aabb_min[None],
        grid.aabb_max[None],
        tmin[:, None],
        jnp.full((r, 1), F32_MAX),
    )
    block_active = jnp.any(hit_grid, axis=0)  # (L,)
    # compact: active block ids first
    visit_order = jnp.argsort(~block_active, stable=True).astype(jnp.int32)
    num_active = jnp.sum(block_active.astype(jnp.int32))

    def body(k, carry):
        best_t, best_u, best_v, best_idx = carry
        b = visit_order[k]
        t, u, v, j = _block_tri_test(
            origins, dirs, grid.vertices[b], det_eps, tmin, best_t
        )
        idx = grid.tri_index[b, j]
        take = (t < best_t) & (idx >= 0)
        return (
            jnp.where(take, t, best_t),
            jnp.where(take, u, best_u),
            jnp.where(take, v, best_v),
            jnp.where(take, idx, best_idx),
        )

    init = (
        jnp.full((r,), F32_MAX, jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.full((r,), -1, jnp.int32),
    )
    best_t, best_u, best_v, best_idx = jax.lax.fori_loop(
        0, num_active, body, init
    )
    return HitData(
        t=best_t, u=best_u, v=best_v, tri_idx=best_idx, hit=best_idx >= 0
    )


@partial(jax.jit, static_argnames=("det_eps",))
def block_occluded(
    origins: Array,
    dirs: Array,
    grid: BlockGrid,
    tmin=1e-4,
    tmax=F32_MAX,
    *,
    det_eps: float = 1e-8,
) -> Array:
    """Any-hit occlusion via block culling; early-exits once every ray
    with an active block is resolved."""
    r = origins.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    inv_d = 1.0 / dirs

    hit_grid = _slab_test(
        origins[:, None, :],
        inv_d[:, None, :],
        grid.aabb_min[None],
        grid.aabb_max[None],
        tmin[:, None],
        tmax[:, None],
    )
    block_active = jnp.any(hit_grid, axis=0)
    visit_order = jnp.argsort(~block_active, stable=True).astype(jnp.int32)
    num_active = jnp.sum(block_active.astype(jnp.int32))

    def cond(carry):
        k, blocked = carry
        return (k < num_active) & ~jnp.all(blocked)

    def body(carry):
        k, blocked = carry
        b = visit_order[k]
        t, _, _, j = _block_tri_test(
            origins, dirs, grid.vertices[b], det_eps, tmin, tmax
        )
        idx = grid.tri_index[b, j]
        blocked = blocked | ((t < F32_MAX) & (idx >= 0))
        return k + 1, blocked

    _, blocked = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), jnp.zeros((r,), bool))
    )
    return blocked
