"""Per-tile TRIANGLE-granularity candidate lists — binned traversal.

The round-4 roofline measured the tile-union block walk at its floor:
every firing (tile, block) visit dense-tests all ``block_size``
triangles, and the frog camera pass pays 0.7-1.2e9 ray-triangle pairs
for a true tile-hull candidate set of ~4e7 (scripts/
probe_tile_candidates.py: 14.8x padded pair cut at 128-lane chunks).
This module is the structural replacement (the rasterizer-style
binning of VERDICT round-4 task #1):

1. **Plan** (host, once per (scene, camera)): conservatively bin
   triangles to ray tiles — an interval slab test of each tile's
   jitter-inflated corner-ray hull against per-TRIANGLE AABBs (the
   same math as ``megakernel.camera_tile_plan``, at triangle rather
   than superblock granularity) — and gather each tile's candidates
   into dense lane-padded chunk rows, CSR-style: 16 f32 rows per
   chunk [v0 xyz | e1 xyz | e2 xyz | global id | home quarter row |
   5 x pad], concatenated in tile order.
2. **Walk** (in-kernel): per tile, a double-buffered
   ``make_async_copy`` stream of its own chunks from HBM, each visited
   with the standard dense Moller-Trumbore + lexicographic (t, global
   id) winner update.  No slab tests, no gates, no pipeline restarts —
   the plan IS the culling, and the kernel runs uninterrupted dense
   arithmetic on ~1/15 the pairs.

Winner selection is order-invariant (min reductions are exact; ties
break on global id), and the plan is a conservative superset of every
per-ray candidate set, so images are bit-identical to the block walk
in exact (interpret/CPU) semantics; on TPU the different static shape
shifts the last ulp like any static-shape change (docs/DESIGN.md
round 3).  The per-candidate "home quarter row" lets the winner's
attributes resolve through the UNCHANGED deferred MXU pass against the
VMEM-resident grid (``megakernel._make_traverse`` r_body).

Reference counterpart: this replaces the per-thread BVH descent of
``/root/reference/HW2/HW2/GPUandCPU/include/query.h:224-311`` — the
reference prunes per thread via the tree; a TPU prunes per tile via a
precomputed bin, because per-lane gathers are ~100x the dense test.
"""

from __future__ import annotations

import dataclasses
import hashlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

__all__ = ["CandidatePlan", "CAND_ROWS", "build_camera_candidate_plan",
           "candidate_plan_stats", "plan_candidate_gids", "refresh_stream"]

# rows per candidate chunk window: 9 triangle planes, global ids (as
# exact f32 integers), home quarter row, 5 zero rows of sublane padding
# (f32 DMA windows want multiples of 8 sublanes)
CAND_ROWS = 16


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CandidatePlan:
    """CSR candidate stream for the binned camera traversal.

    ``stream`` (total_chunks * CAND_ROWS, chunk) f32 lives in HBM and
    is DMA'd per chunk; ``meta`` (nt, 8) int32 rows carry [chunk start,
    chunk count, 0...] per ray tile.  ``chunk`` is the candidate lane
    width C (the dense test is (RAY_TILE, C) per visit)."""

    stream: Array  # (total_chunks * CAND_ROWS, C) float32
    meta: Array    # (nt, 8) int32
    chunk: int = dataclasses.field(metadata=dict(static=True))
    total_chunks: int = dataclasses.field(metadata=dict(static=True))


def _tile_dir_hulls(camera, xs_p, ys_p, ray_tile):
    """Jitter-inflated per-tile camera-ray direction interval boxes
    (host numpy twin of ``camera_tile_plan``'s corner math)."""
    xs = np.asarray(xs_p, np.float32)
    ys = np.asarray(ys_p, np.float32)
    nt = xs.size // ray_tile
    xs_t = xs.reshape(nt, ray_tile)
    ys_t = ys.reshape(nt, ray_tile)
    px_lo = xs_t.min(1) - 0.5
    px_hi = xs_t.max(1) + 0.5
    py_lo = ys_t.min(1) - 0.5
    py_hi = ys_t.max(1) + 0.5
    base = np.asarray(camera.pixel00_loc - camera.center, np.float32)
    du = np.asarray(camera.pixel_delta_u, np.float32)
    dv = np.asarray(camera.pixel_delta_v, np.float32)
    corners = np.stack([
        base[None] + a[:, None] * du[None] + b[:, None] * dv[None]
        for a in (px_lo, px_hi) for b in (py_lo, py_hi)
    ])  # (4, nt, 3)
    return corners.min(0), corners.max(0), np.asarray(camera.center,
                                                      np.float32)


def _hull_box_pass(d_lo, d_hi, c, boxes_lo, boxes_hi):
    """Interval slab test: tiles (origin ``c``, direction boxes) vs
    AABBs -> (ntile, nbox) bool.  Conservative: every real jittered ray
    that can hit a box also passes here (same slack rules as
    ``camera_tile_plan``)."""
    ntile = d_lo.shape[0]
    nb = boxes_lo.shape[0]
    near_all = np.zeros((ntile, nb), np.float32)
    far_all = np.full((ntile, nb), np.inf, np.float32)
    for axis in range(3):
        blo = boxes_lo[:, axis][None, :]
        bhi = boxes_hi[:, axis][None, :]
        dlo = d_lo[:, axis:axis + 1]
        dhi = d_hi[:, axis:axis + 1]
        spans0 = (dlo <= 0.0) & (dhi >= 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_a, inv_b = 1.0 / dhi, 1.0 / dlo
            ca = blo - c[axis]
            cb = bhi - c[axis]
            cands = np.stack([ca * inv_a, ca * inv_b,
                              cb * inv_a, cb * inv_b])
            near = np.nanmin(cands, 0)
            far = np.nanmax(cands, 0)
        near = near - np.abs(near) * np.float32(4e-7)  # rounding slack
        far = far + np.abs(far) * np.float32(4e-7)
        bad = spans0 | np.isnan(near) | np.isnan(far)
        near_all = np.maximum(near_all, np.where(bad, -np.inf, near))
        far_all = np.minimum(far_all, np.where(bad, np.inf, far))
    return (near_all <= far_all) & (far_all >= 0.0)


def build_camera_candidate_plan(camera, xs_p, ys_p, grid, ray_tile: int,
                                nq: int = 1,
                                chunk: int = 256,
                                slack: float = 0.0) -> CandidatePlan:
    """Build the binned camera plan on the host (concrete arrays only).

    ``xs_p``/``ys_p`` must be the tile-padded swizzled pixel stream the
    emit kernel will render (``megakernel._pad_tiles`` output), so the
    plan covers the padding tiles' real rays too.  ``nq`` is the static
    quarter count of the kernel build (``megakernel.quarters_for``) —
    home rows are quarter rows, == block rows at nq == 1.

    ``slack``: absolute inflation of every triangle (and block) AABB.
    The candidate SET then stays conservative for any later geometry
    whose vertices each move less than ``slack`` from the build-time
    positions — the contract behind ``refresh_stream`` (inverse
    rendering optimizes vertices between plan rebuilds, exactly like a
    BVH refit-vs-rebuild cadence).  0.0 = static geometry.
    """
    xs = np.asarray(xs_p)
    ys = np.asarray(ys_p)
    nt = xs.size // ray_tile
    assert nt % 8 == 0, "tile stream must be padded to 8-tile groups"
    l, b = grid.tri_index.shape
    t_all = l * b
    qs = b // nq

    d_lo, d_hi, c = _tile_dir_hulls(camera, xs, ys, ray_tile)

    tri = np.asarray(grid.tri, np.float32)  # (9, L, B)
    flat_tri = tri.reshape(9, t_all)
    v0 = flat_tri[0:3].T
    p1 = v0 + flat_tri[3:6].T
    p2 = v0 + flat_tri[6:9].T
    tlo = np.minimum(np.minimum(v0, p1), p2) - np.float32(slack)  # (T, 3)
    thi = np.maximum(np.maximum(v0, p1), p2) + np.float32(slack)
    ids_flat = np.asarray(grid.tri_index).reshape(t_all)
    valid = ids_flat >= 0

    # block-level prefilter: only tiles that can see SOME block test
    # triangles (the sky majority of a frame skips the (nt, T) pass)
    baabb = np.asarray(grid.aabb, np.float32)
    blk_pass = _hull_box_pass(d_lo, d_hi, c,
                              baabb[:3].T - np.float32(slack),
                              baabb[3:].T + np.float32(slack))
    blk_pass &= (baabb[0] <= baabb[3])[None, :]
    active = np.where(blk_pass.any(1))[0]

    starts = np.zeros(nt, np.int64)
    counts = np.zeros(nt, np.int64)
    chunk_slots = []
    if active.size:
        tri_pass = _hull_box_pass(d_lo[active], d_hi[active], c, tlo, thi)
        tri_pass &= valid[None, :]
        for row, ti in enumerate(active):
            slots = np.where(tri_pass[row])[0]
            if slots.size == 0:
                continue
            nch = -(-slots.size // chunk)
            padded = np.full(nch * chunk, -1, np.int64)
            padded[:slots.size] = slots
            starts[ti] = len(chunk_slots)
            counts[ti] = nch
            chunk_slots.extend(padded.reshape(nch, chunk))
    if not chunk_slots:
        chunk_slots = [np.full(chunk, -1, np.int64)]  # one dummy chunk
    slots = np.stack(chunk_slots)  # (TC, C)
    tc = slots.shape[0]

    safe = np.maximum(slots, 0)
    rows = np.zeros((tc, CAND_ROWS, chunk), np.float32)
    planes = flat_tri[:, safe]  # (9, TC, C)
    live = slots >= 0
    rows[:, :9] = np.where(live[None], planes, 0.0).transpose(1, 0, 2)
    rows[:, 9] = np.where(live, ids_flat[safe], -1).astype(np.float32)
    rows[:, 10] = (safe // qs).astype(np.float32)

    meta = np.zeros((nt, 8), np.int32)
    meta[:, 0] = starts
    meta[:, 1] = counts
    return CandidatePlan(
        stream=jnp.asarray(rows.reshape(tc * CAND_ROWS, chunk)),
        meta=jnp.asarray(meta),
        chunk=int(chunk),
        total_chunks=int(tc),
    )


def candidate_plan_stats(plan: CandidatePlan, ray_tile: int) -> dict:
    """Plan-size diagnostics (host): padded dense pairs, stream bytes."""
    counts = np.asarray(plan.meta[:, 1], np.int64)
    return dict(
        tiles=int(counts.size),
        nonempty_tiles=int((counts > 0).sum()),
        chunks=int(plan.total_chunks),
        padded_pairs=int(counts.sum()) * plan.chunk * ray_tile,
        stream_bytes=int(plan.stream.size) * 4,
    )


def plan_candidate_gids(plan: CandidatePlan) -> np.ndarray:
    """Static per-slot GLOBAL triangle ids of a plan, (total_chunks,
    chunk) int32, -1 for padding lanes (host numpy — the ids are the
    geometry-independent part of the plan; see ``refresh_stream``)."""
    rows = np.asarray(plan.stream).reshape(plan.total_chunks, CAND_ROWS,
                                           plan.chunk)
    return np.rint(rows[:, 9]).astype(np.int32)


def refresh_stream(gids, grid, nq: int) -> Array:
    """Rebuild a plan's chunk stream against the CURRENT grid (jit-safe).

    The candidate ID SET of a slack-inflated plan stays conservative
    while every vertex moves less than ``slack`` (see
    ``build_camera_candidate_plan``); what goes stale per optimization
    step is (a) the baked v0/e1/e2 plane VALUES and (b) each
    candidate's home quarter row (``apply_params`` rebuilds the block
    grid from the new vertices, which re-permutes triangles).  This
    regathers both from ``grid`` by global id — a ~MB-scale gather, so
    inverse-rendering steps pay microseconds instead of a host rebuild.

    ``gids``: (TC, C) int32 global ids (``plan_candidate_gids``), -1
    padding.  Returns the (TC * CAND_ROWS, C) f32 stream.
    """
    l, b = grid.tri_index.shape
    qs = b // nq
    tc, c = gids.shape
    gids = jnp.asarray(gids, jnp.int32)
    flat_ids = grid.tri_index.reshape(l * b)
    # inverse permutation global id -> current flat grid position
    # (padding slots of the grid scatter out of range and are dropped)
    t_hi = l * b  # global ids are < l*b by construction
    inv = jnp.zeros((t_hi + 1,), jnp.int32).at[
        jnp.where(flat_ids >= 0, flat_ids, t_hi)
    ].set(jnp.arange(l * b, dtype=jnp.int32), mode="drop")[:t_hi]
    live = gids >= 0
    pos = inv[jnp.clip(gids, 0, t_hi - 1)]            # (TC, C)
    planes = grid.tri.reshape(9, l * b)[:, pos]       # (9, TC, C)
    planes = jnp.where(live[None], planes, 0.0)
    id_row = jnp.where(live, gids, -1).astype(jnp.float32)
    home_row = jnp.where(live, pos // qs, 0).astype(jnp.float32)
    rows = jnp.concatenate([
        planes.transpose(1, 0, 2),                    # (TC, 9, C)
        id_row[:, None, :],
        home_row[:, None, :],
        jnp.zeros((tc, CAND_ROWS - 11, c), jnp.float32),
    ], axis=1)
    return rows.reshape(tc * CAND_ROWS, c)


def plan_fingerprint(camera, grid, ray_tile: int, nq: int,
                     chunk: int) -> str:
    """Cache key for a (scene, camera) plan: camera geometry + the
    TRIANGLE PLANES themselves.

    Unlike the wavefront capacity cache (perf-only), this cache is
    correctness-bearing: the plan bakes v0/e1/e2 planes into its
    stream, so a stale hit would silently render pre-edit geometry.
    Block AABBs alone are not enough — a vertex strictly interior to
    its block's hull can move without shifting any AABB — so small
    grids hash every plane byte; large grids (>2M plane elements,
    where the device fetch would dominate) hash the AABBs plus
    per-plane float sums and a strided byte sample, which any
    realistic edit perturbs (documented, non-adversarial contract)."""
    h = hashlib.sha1(repr((ray_tile, nq, chunk,
                           int(camera.width), int(camera.height))).encode())
    h.update(np.asarray(camera.center).tobytes())
    h.update(np.asarray(camera.pixel00_loc).tobytes())
    h.update(np.asarray(camera.pixel_delta_u).tobytes())
    h.update(np.asarray(camera.pixel_delta_v).tobytes())
    h.update(np.asarray(grid.aabb).tobytes())
    tri = np.asarray(grid.tri)
    if tri.size <= 2 ** 21:
        h.update(tri.tobytes())
    else:
        h.update(np.float64(tri.sum(axis=(1, 2), dtype=np.float64)).tobytes())
        h.update(tri.reshape(-1)[::97].tobytes())
    return h.hexdigest()[:16]
