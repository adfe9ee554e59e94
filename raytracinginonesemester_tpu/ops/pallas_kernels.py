"""Pallas TPU kernels for the hot ray-tracing ops.

The XLA block-culling path (``ops.accel``) pays a fixed scheduling cost
per sequential block step and re-streams ray data from HBM every step.
These kernels fuse the whole per-wavefront traversal into one Mosaic
kernel per ray tile, with an *ordered* worklist:

1. an XLA pre-pass (``accel.tile_visit_plan``) slab-tests every block
   against every ray and, per ray tile, sorts the surviving blocks by
   closest slab-entry distance — front-to-back traversal order;
2. the kernel walks that order in an in-kernel ``while_loop``, running a
   dense (RAY_TILE, B) Moller-Trumbore per block, and **stops early**
   once the next block's entry distance exceeds every ray's current
   best hit — the wavefront analog of ordered BVH descent with
   closest-t pruning (``query.h:251-263``).

Combined with spatially-coherent ray tiles (the renderer's 16x16 pixel
swizzle), primary/shadow wavefronts touch a handful of blocks instead of
the whole scene.  This is the TPU equivalent of ``renderBatchCUDA``
(``query.cu:12-66``): one fused kernel per wavefront, per-thread
running-best state, acceleration structure shared by all lanes.

Layout rules (everything 2D for Mosaic) — TWO ray layouts, each matched
to the ops that consume it:

- **sublane-major** (RAY_TILE, 1) columns feed the dense triangle test:
  sublanes = rays broadcast against lanes = triangles, the 8x128 VPU
  shape.  Triangle planes are (9*L, B): row k*L+b holds plane k of
  block b, a native (1, B) row read.
- **lane-major** (1, RAY_TILE) rows carry everything *per-ray*: slab
  tests, the running-best t, shadow blocked masks.  A (RAY_TILE, 1)
  column uses 1 of 128 VPU lanes — per-ray bookkeeping in that layout
  runs at <1% width and dominated the kernel before this split.  The
  two layouts meet only on improving visits (one (R,1)->(1,R) relayout
  each), which front-to-back ordering makes rare.

VMEM budget: planes cost 36 B/triangle, so scenes to ~280k triangles fit
comfortably; callers fall back to the XLA path beyond ``fits_vmem``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import F32_MAX, HitData
from .accel import SUPER, BlockGrid, tile_visit_plan_fast

__all__ = ["fits_vmem", "num_chunks_for", "pallas_block_closest",
           "pallas_block_occluded", "pallas_block_closest_chunked",
           "pallas_block_occluded_chunked",
           "pallas_block_closest_streamed",
           "pallas_block_occluded_streamed", "RAY_TILE"]

# rays per kernel program.  512 won the terminal-workload sweep
# (scripts/probe_ray_tile.py); override for experiments with RT_RAY_TILE.
RAY_TILE = int(__import__("os").environ.get("RT_RAY_TILE", "512"))
_INT_MAX = np.int32(2**31 - 1)

# leave headroom for ray tiles, scratch and double buffers
_VMEM_TRI_BUDGET_BYTES = 10 * 1024 * 1024


import os as _os

# Triangle-axis (quarter-block) gating for the standalone closest /
# occluded kernels — same semantics as the megakernel's RT_QUARTER
# gate (see ops.megakernel), defined here independently to avoid an
# import cycle (megakernel imports from this module).  Winner updates
# stay bit-exact: quarters combine through the same lexicographic
# (t, global id) take rule.  DEFAULT OFF (its own RT_PK_QUARTER knob):
# unlike the megakernel's camera tiles, these kernels' visit sets
# measured SLOWER gated on the grad bench (gpu_spheres 960x540
# bounces-2 train step: 87.5 -> 127.6 ms/step, checksums identical) —
# 3-4 of 4 quarters fire per visit, so the gate pays 4 pipeline
# restarts + slab tests for little skipped work.  Recorded negative,
# kept for scenes with tighter quarter/ray relationships.
_PK_QUARTER_RAW = _os.environ.get("RT_PK_QUARTER", "0")
_PK_QUARTER_LANES = (0 if _PK_QUARTER_RAW == "0"
                     else 128 if _PK_QUARTER_RAW == "1"
                     else int(_PK_QUARTER_RAW))


def pk_quarters_for(block_size: int) -> int:
    """Static quarter count for a block size (1 = gating disabled)."""
    if (_PK_QUARTER_LANES and block_size % _PK_QUARTER_LANES == 0
            and block_size >= 2 * _PK_QUARTER_LANES):
        return block_size // _PK_QUARTER_LANES
    return 1


def _grid_bytes(l: int, b: int) -> int:
    return 9 * l * b * 4 + 8 * l * 4 + l * b * 4


def fits_vmem(grid: BlockGrid) -> bool:
    l, b = grid.tri_index.shape
    return _grid_bytes(l, b) < _VMEM_TRI_BUDGET_BYTES


def num_chunks_for(grid: BlockGrid) -> int:
    """Fewest block-axis chunks such that each chunk's planes fit the
    kernel VMEM budget (1 when the whole grid fits)."""
    l, b = grid.tri_index.shape
    n = 1
    while _grid_bytes(-(-l // n), b) >= _VMEM_TRI_BUDGET_BYTES:
        n += 1
    return n


def _grid_chunk(grid: BlockGrid, c: int, n: int) -> BlockGrid:
    """Static slice of chunk ``c`` of ``n`` along the block axis.

    Blocks are Morton-ordered, so consecutive runs are spatially
    coherent and the chunk's AABBs stay tight.  ``tri_index`` keeps the
    GLOBAL triangle ids, which is what makes the chunked closest-hit
    merge partition-invariant (ties break on (t, global id) everywhere).
    """
    l = grid.num_blocks
    size = -(-l // n)
    lo = c * size
    hi = min(lo + size, l)
    return BlockGrid(
        tri=grid.tri[:, lo:hi],
        norm=grid.norm[:, lo:hi],
        tri_index=grid.tri_index[lo:hi],
        obj=grid.obj[lo:hi],
        aabb=grid.aabb[:, lo:hi],
        block_size=grid.block_size,
    )


def _mt_block(o, d, tri, det_eps, tmin, tmax):
    """(RAY_TILE, 1) ray components vs (1, B) triangle planes.

    Unrolled Moller-Trumbore (query.h:72-132); returns (t, u, v) as
    (RAY_TILE, B) with misses at F32_MAX.
    """
    ox, oy, oz = o
    dx, dy, dz = d
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = tri

    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < det_eps, 1.0, det)

    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det

    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

    ok = (
        (jnp.abs(det) >= det_eps)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= tmin) & (t <= tmax)
    )
    return jnp.where(ok, t, F32_MAX), u, v


def _load_rays_cols(lane_ref):
    """Sublane-major (RAY_TILE, 1) column loads for the dense test,
    derived from the lane-major rows by relayout (same float values; a
    dedicated (RP, 8) ray operand would tile its 8 lanes to 128 in
    VMEM — 16x staging waste that OOM'd scoped VMEM at 2M rays)."""
    o, d, tmin, tmax = _load_rays_lane(lane_ref)
    return (tuple(_to_col(c) for c in o), tuple(_to_col(c) for c in d),
            _to_col(tmin), _to_col(tmax))


def _load_rays_lane(lane_ref):
    """Lane-major loads: (1, RAY_TILE) rows for slab tests/bookkeeping."""
    o = tuple(lane_ref[pl.ds(k, 1), :] for k in range(3))
    d = tuple(lane_ref[pl.ds(k, 1), :] for k in range(3, 6))
    tmin = lane_ref[pl.ds(6, 1), :]
    tmax = lane_ref[pl.ds(7, 1), :]
    return o, d, tmin, tmax


def _to_lane(col):
    """(R, 1) sublane-major -> (1, R) lane-major relayout."""
    return col.reshape(1, -1)


def _to_col(lane):
    """(1, R) lane-major -> (R, 1) sublane-major relayout."""
    return lane.reshape(-1, 1)


def _tile_slab(aabb_ref, b, o, inv_d, tmin, tmax):
    """Slab test vs block AABB row ``b``; layout-agnostic elementwise
    math — pass lane-major (1, R) components (the fast path) or
    sublane-major (R, 1)."""
    arow = aabb_ref[pl.ds(b, 1), :]
    t0, t1 = tmin, tmax
    for axis in range(3):
        lo = (arow[0, axis] - o[axis]) * inv_d[axis]
        hi = (arow[0, axis + 3] - o[axis]) * inv_d[axis]
        near = jnp.minimum(lo, hi)
        far = jnp.maximum(lo, hi)
        near = jnp.where(jnp.isnan(near), -jnp.inf, near)
        far = jnp.where(jnp.isnan(far), jnp.inf, far * 1.0000004)
        t0 = jnp.maximum(t0, near)
        t1 = jnp.minimum(t1, far)
    return t0 <= t1


def _closest_kernel(det_eps, num_blocks, num_supers, block_size, with_normals,
                    n_shadow, shadow_eps, shadow_tmin, nq, shared_o,
                    lane_ref, tri_ref, norm_ref, ids_ref, aabb_ref,
                    qaabb_ref, order_ref, entry_ref, *rest):
    # Outputs are (1, RT) lane-major ROWS of (NT, RT) arrays — a
    # sublane-major (RP, 1) output array tiles to (8, 128) with 127 of
    # 128 lanes padding, which at 2M rays made XLA's scoped-VMEM
    # staging of the results alone exceed the 16 MB budget.  Running
    # state lives in column/lane scratches instead and is written out
    # once at the end.
    if shared_o:
        origin_ref = rest[0]  # (1, 8) SMEM [ox, oy, oz, ...]
        rest = rest[1:]
    if n_shadow:
        lights_ref = rest[0]
        rest = rest[1:]
    n_scratch = 5 + (3 if with_normals else 0) + (1 if n_shadow else 0)
    outs, scratch = rest[:-n_scratch], rest[-n_scratch:]
    t_lane = scratch[0]  # (1, RT) running best, lane-major
    t_col, u_col, v_col, idx_col = scratch[1:5]  # (RT, 1) state columns
    scratch = scratch[5:]
    if with_normals:
        nx_s, ny_s, nz_s = scratch[:3]  # (1, RT) shading normal state
        scratch = scratch[3:]
    if n_shadow:
        blk_lane = scratch[0]  # (1, RT) shadow blocked accumulator
    if n_shadow:
        t_out, u_out, v_out, idx_out, nx_out, ny_out, nz_out = outs[:7]
        vis_outs = outs[7:]
    elif with_normals:
        t_out, u_out, v_out, idx_out, nx_out, ny_out, nz_out = outs
    else:
        t_out, u_out, v_out, idx_out = outs
    o, d, tmin, _ = _load_rays_cols(lane_ref)
    o_l, d_l, tmin_l, _ = _load_rays_lane(lane_ref)
    if shared_o:
        # camera pass: every ray shares one origin, so the dense test's
        # pair-invariant subexpressions (tvec, qvec, t numerator)
        # collapse to (1, B) triangle rows via broadcasting — ~30% of
        # the per-pair Moller-Trumbore ops.  Same per-lane values and
        # op order, just narrower broadcast shapes.  Padded filler
        # rays' own 1e30 origins are ignored (their outputs are sliced
        # off; per-lane winner state never crosses lanes).
        o = (origin_ref[0, 0], origin_ref[0, 1], origin_ref[0, 2])
    inv_l = tuple(1.0 / c for c in d_l)
    rt = t_col.shape[0]

    t_col[:] = jnp.full((rt, 1), F32_MAX, jnp.float32)
    t_lane[:] = jnp.full((1, rt), F32_MAX, jnp.float32)
    u_col[:] = jnp.zeros((rt, 1), jnp.float32)
    v_col[:] = jnp.zeros((rt, 1), jnp.float32)
    idx_col[:] = jnp.full((rt, 1), -1, jnp.int32)
    if with_normals:
        nx_s[:] = jnp.zeros((1, rt), jnp.float32)
        ny_s[:] = jnp.zeros((1, rt), jnp.float32)
        nz_s[:] = jnp.full((1, rt), 1.0, jnp.float32)

    # plan rows come in groups of 8 sublanes; ours is program_id % 8
    row = jax.lax.rem(pl.program_id(0), 8)
    from .accel import SUPER

    def cond(k):
        # stop once the next superblock starts beyond every ray's best
        # hit — entries are sorted ascending with inf marking inactive
        # superblocks, so the entry test doubles as the count bound
        in_range = k < num_supers
        next_entry = entry_ref[row, jnp.minimum(k, num_supers - 1)]
        return in_range & (next_entry <= jnp.max(t_lane[:]))

    nrows = num_blocks * nq  # quarter rows per plane (nq == 1: blocks)

    def visit_quarter(bq):
        """Dense triangle test of one quarter row (the whole block when
        nq == 1), updating the running best.  Sequential per-quarter
        updates through the same lexicographic (t, id) take rule compute
        exactly the block-at-once winner (min is an exact reduction),
        so quarter gating never shifts a bit — the megakernel's
        RT_QUARTER argument restated for this kernel."""
        tri = tuple(
            tri_ref[pl.ds(k_ * nrows + bq, 1), :] for k_ in range(9)
        )
        ids = ids_ref[pl.ds(bq, 1), :]  # (1, QS)
        t, u, v = _mt_block(o, d, tri, det_eps, tmin, t_col[:])
        t = jnp.where(ids >= 0, t, F32_MAX)
        min_t = jnp.min(t, axis=1, keepdims=True)
        # (t, id) lexicographic tie-break, matching accel.block_closest;
        # scene triangle ids are unique so `pick` has <=1 lane per row
        at_min = t == min_t
        id_key = jnp.where(at_min & (ids >= 0), ids, _INT_MAX)
        best_id = jnp.min(id_key, axis=1, keepdims=True)

        old_t = t_col[:]
        old_idx = idx_col[:]
        old_key = jnp.where(old_idx >= 0, old_idx, _INT_MAX)
        take = (min_t < F32_MAX) & (
            (min_t < old_t) | ((min_t == old_t) & (best_id < old_key))
        )

        # the expensive lane-selection reductions (u, v, normal) and the
        # state writes only run when the block improved some ray; under
        # front-to-back order most later visits don't
        @pl.when(jnp.any(take))
        def _():
            new_t = jnp.where(take, min_t, old_t)
            t_col[:] = new_t
            t_lane[:] = _to_lane(new_t)
            idx_col[:] = jnp.where(take, best_id, old_idx)
            pick = at_min & (id_key == best_id)
            sel_u = jnp.sum(jnp.where(pick, u, 0.0), axis=1, keepdims=True)
            sel_v = jnp.sum(jnp.where(pick, v, 0.0), axis=1, keepdims=True)
            u_col[:] = jnp.where(take, sel_u, u_col[:])
            v_col[:] = jnp.where(take, sel_v, v_col[:])

            if with_normals:
                # gpu-dialect shading-normal hygiene (query.h:113-126)
                # done in-kernel from VMEM-resident planes: per-lane
                # interpolation, geometric sidedness, zero-length
                # fallback, hemisphere alignment — then one
                # pick-reduction per component.  This replaces 2M-ray
                # HBM gathers of vertex/normal data.
                nrm = tuple(
                    norm_ref[pl.ds(k_ * nrows + bq, 1), :]
                    for k_ in range(12)
                )
                n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z, gx, gy, gz = nrm
                w = 1.0 - u - v
                snx = w * n0x + u * n1x + v * n2x
                sny = w * n0y + u * n1y + v * n2y
                snz = w * n0z + u * n1z + v * n2z
                dx, dy, dz = d
                dg = dx * gx + dy * gy + dz * gz
                gsign = jnp.where(dg < 0.0, 1.0, -1.0)  # orient against ray
                ogx, ogy, ogz = gx * gsign, gy * gsign, gz * gsign
                len_sq = snx * snx + sny * sny + snz * snz
                inv_len = jax.lax.rsqrt(jnp.maximum(len_sq, 1e-38))
                use_geom = len_sq < 1e-12
                snx = jnp.where(use_geom, ogx, snx * inv_len)
                sny = jnp.where(use_geom, ogy, sny * inv_len)
                snz = jnp.where(use_geom, ogz, snz * inv_len)
                flip = (snx * ogx + sny * ogy + snz * ogz) < 0.0
                fsign = jnp.where(flip, -1.0, 1.0)
                snx, sny, snz = snx * fsign, sny * fsign, snz * fsign
                take_l = _to_lane(jnp.where(take, 1.0, 0.0)) > 0.0
                sel_nx = jnp.sum(jnp.where(pick, snx, 0.0), axis=1, keepdims=True)
                sel_ny = jnp.sum(jnp.where(pick, sny, 0.0), axis=1, keepdims=True)
                sel_nz = jnp.sum(jnp.where(pick, snz, 0.0), axis=1, keepdims=True)
                nx_s[:] = jnp.where(take_l, _to_lane(sel_nx), nx_s[:])
                ny_s[:] = jnp.where(take_l, _to_lane(sel_ny), ny_s[:])
                nz_s[:] = jnp.where(take_l, _to_lane(sel_nz), nz_s[:])

    def visit_block(b):
        if nq == 1:
            visit_quarter(b)
            return
        # triangle-axis gate: only 128-lane quarters some ray can reach
        # run their (RT, QS) dense test (2.3x hull-level pair cut on
        # frog; scripts/probe_quarter_gate.py)
        for q in range(nq):
            boxed_q = _tile_slab(qaabb_ref, b * nq + q, o_l, inv_l,
                                 tmin_l, t_lane[:])
            pl.when(jnp.any(boxed_q))(partial(visit_quarter, b * nq + q))

    def body(k):
        sb = order_ref[row, k]
        for j in range(SUPER):
            b = sb * SUPER + j
            b_c = jnp.minimum(b, num_blocks - 1)  # clamp OOB tail reads
            boxed = _tile_slab(aabb_ref, b_c, o_l, inv_l, tmin_l, t_lane[:])
            do_visit = jnp.any(boxed) & (b < num_blocks)

            @pl.when(do_visit)
            def _():
                visit_block(b_c)

        return k + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))

    t_out[pl.ds(row, 1), :] = t_lane[:]
    u_out[pl.ds(row, 1), :] = _to_lane(u_col[:])
    v_out[pl.ds(row, 1), :] = _to_lane(v_col[:])
    idx_out[pl.ds(row, 1), :] = _to_lane(idx_col[:])
    if with_normals:
        nx_out[pl.ds(row, 1), :] = nx_s[:]
        ny_out[pl.ds(row, 1), :] = ny_s[:]
        nz_out[pl.ds(row, 1), :] = nz_s[:]

    if n_shadow:
        # --- fused shadow rays (IsInShadow, shader.h:44-62) ---
        # Shares the VMEM triangle planes: per light, spawn the shadow
        # ray at the hit point offset along the shading normal
        # (p + N*RT_EPS, shader.h:57) and any-hit test blocks with
        # per-tile slab culling.  Non-hit lanes park at 1e30 so empty
        # tiles exit after the slab sweep.  All per-ray state here is
        # lane-major; only the dense triangle test under pl.when touches
        # the sublane-major copies.
        hit_l = t_lane[:] < F32_MAX
        nx_lane = nx_s[:]
        ny_lane = ny_s[:]
        nz_lane = nz_s[:]
        # hit points built lane-major (same values/op order as the
        # former column form: o + t*d + n*eps elementwise)
        px_l = jnp.where(hit_l, o_l[0] + t_lane[:] * d_l[0]
                         + nx_lane * shadow_eps, 1e30)
        py_l = jnp.where(hit_l, o_l[1] + t_lane[:] * d_l[1]
                         + ny_lane * shadow_eps, 1e30)
        pz_l = jnp.where(hit_l, o_l[2] + t_lane[:] * d_l[2]
                         + nz_lane * shadow_eps, 1e30)
        px_c, py_c, pz_c = _to_col(px_l), _to_col(py_l), _to_col(pz_l)
        dx_l, dy_l, dz_l = d_l
        # view = -d for unit ray dirs; backfacing (N.V<=0) lanes shade to
        # zero through the brdf `lit` gate whatever visibility says
        ndotv_l = -(nx_lane * dx_l + ny_lane * dy_l + nz_lane * dz_l)
        s_tmin_c = jnp.full((rt, 1), shadow_tmin, jnp.float32)
        s_tmin_l = jnp.full((1, rt), shadow_tmin, jnp.float32)

        for li in range(n_shadow):
            lx = lights_ref[li, 0]
            ly = lights_ref[li, 1]
            lz = lights_ref[li, 2]
            tox_l, toy_l, toz_l = lx - px_l, ly - py_l, lz - pz_l
            dist_l = jnp.sqrt(jnp.maximum(
                tox_l * tox_l + toy_l * toy_l + toz_l * toz_l, 1e-38))
            inv_dist = 1.0 / dist_l
            sdx_l, sdy_l, sdz_l = (tox_l * inv_dist, toy_l * inv_dist,
                                   toz_l * inv_dist)
            so_l = (px_l, py_l, pz_l)
            si_l = (1.0 / sdx_l, 1.0 / sdy_l, 1.0 / sdz_l)
            # sublane-major copies for the dense test
            so_c = (px_c, py_c, pz_c)
            sd_c = (_to_col(sdx_l), _to_col(sdy_l), _to_col(sdz_l))
            dist_c = _to_col(dist_l)

            # unlit lanes (N.L<=0 or N.V<=0) multiply visibility by zero
            # in ShadeDirect, so they never spawn shadow work
            ndotl_l = (nx_lane * sdx_l + ny_lane * sdy_l + nz_lane * sdz_l)
            facing = hit_l & (ndotl_l > 0.0) & (ndotv_l > 0.0)

            blk_lane[:] = jnp.zeros((1, rt), jnp.float32)

            def s_cond(k):
                return (k < num_blocks) & jnp.any(facing & (blk_lane[:] == 0.0))

            def _s_visit(bq):
                tri = tuple(
                    tri_ref[pl.ds(k_ * nrows + bq, 1), :]
                    for k_ in range(9)
                )
                ids = ids_ref[pl.ds(bq, 1), :]
                ts, _, _ = _mt_block(so_c, sd_c, tri, det_eps,
                                     s_tmin_c, dist_c)
                ts = jnp.where(ids >= 0, ts, F32_MAX)
                s_hit = jnp.min(ts, axis=1, keepdims=True) < F32_MAX
                blk_lane[:] = jnp.maximum(
                    blk_lane[:], _to_lane(s_hit.astype(jnp.float32))
                )

            def s_body(k):
                boxed = (
                    _tile_slab(aabb_ref, k, so_l, si_l, s_tmin_l, dist_l)
                    & facing & (blk_lane[:] == 0.0)
                )

                @pl.when(jnp.any(boxed))
                def _():
                    if nq == 1:
                        _s_visit(k)
                        return
                    for q in range(nq):
                        # any-hit max-accumulation is order-independent,
                        # so quarter gating is exact here too
                        boxed_q = (
                            _tile_slab(qaabb_ref, k * nq + q, so_l,
                                       si_l, s_tmin_l, dist_l)
                            & facing & (blk_lane[:] == 0.0)
                        )
                        pl.when(jnp.any(boxed_q))(
                            partial(_s_visit, k * nq + q))

                return k + 1

            jax.lax.while_loop(s_cond, s_body, jnp.int32(0))
            vis_l = jnp.where(facing & (blk_lane[:] == 0.0), 1.0, 0.0)
            vis_outs[li][pl.ds(row, 1), :] = vis_l


def _pad_plan_rows(order, entry):
    """Pad the plan's tile axis to a multiple of 8 (Mosaic sublane floor)."""
    nt = order.shape[0]
    pad = (-nt) % 8
    if pad:
        order = jnp.pad(order, ((0, pad), (0, 0)))
        entry = jnp.pad(entry, ((0, pad), (0, 0)), constant_values=jnp.inf)
    return order, entry


def _prep_rays(origins, dirs, tmin, tmax):
    r = origins.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    rays = jnp.stack([
        origins[:, 0], origins[:, 1], origins[:, 2],
        dirs[:, 0], dirs[:, 1], dirs[:, 2],
        tmin, tmax,
    ], axis=1)  # (R, 8)
    pad = (-r) % (8 * RAY_TILE)
    if pad:
        # padded rays point nowhere: infinite origin makes every slab
        # entry inf, so they never appear in any tile's visit plan.
        # Whole 8-tile groups because output blocks are (8, RT) rows
        # shared by 8 consecutive programs (Mosaic's sublane floor).
        filler = jnp.full((pad, 8), 1.0, jnp.float32).at[:, 0:3].set(1e30)
        rays = jnp.concatenate([rays, filler])
    return rays, r + pad


def _lane_major_rays(rays, ray_tile):
    """(RP, 8) -> (8*NT, RT): per tile, components on sublanes and rays
    on lanes — the layout every per-ray kernel op wants."""
    rp = rays.shape[0]
    nt = rp // ray_tile
    return (
        rays.reshape(nt, ray_tile, 8)
        .transpose(0, 2, 1)
        .reshape(nt * 8, ray_tile)
    )


@partial(jax.jit, static_argnames=(
    "det_eps", "interpret", "return_normal", "shadow_eps", "shadow_tmin",
    "shared_origin"))
def pallas_block_closest(
    origins: Array,
    dirs: Array,
    grid: BlockGrid,
    tmin=1e-4,
    *,
    det_eps: float = 1e-8,
    interpret: bool = False,
    return_normal: bool = False,
    shadow_lights: Array = None,
    shadow_eps: float = 1e-3,
    shadow_tmin: float = 1e-4,
    shared_origin: bool = False,
):
    """Closest hit via the fused, front-to-back Pallas traversal kernel.

    Semantics identical to ``accel.block_closest`` (same tie-break);
    tests assert hit/triangle equality between the two.

    - ``return_normal=True``: also returns the gpu-dialect shading
      normal (R, 3) computed in-kernel from VMEM-resident planes — no
      HBM vertex/normal gathers.
    - ``shadow_lights`` (NL, 3) point-light positions: additionally
      traces one shadow ray per light from each hit point inside the
      same kernel (``IsInShadow``, shader.h:44-62) and returns
      per-light visibility (R, NL) — implies ``return_normal``.
    - ``shared_origin``: caller guarantees every ray has origins[0]
      (the pinhole camera pass); the dense test then hoists the
      pair-invariant Moller-Trumbore subexpressions to (1, B) rows
      (~30% fewer per-pair ops).  Same per-lane values/op order.
    """
    r = origins.shape[0]
    l, b = grid.tri_index.shape
    n_shadow = 0 if shadow_lights is None else int(shadow_lights.shape[0])
    if n_shadow:
        return_normal = True
    rays, rp = _prep_rays(origins, dirs, tmin, F32_MAX)
    lane = _lane_major_rays(rays, RAY_TILE)
    order, entry, _ = tile_visit_plan_fast(
        rays[:, 0:3], rays[:, 3:6], grid, rays[:, 6], rays[:, 7], RAY_TILE
    )
    order, entry = _pad_plan_rows(order, entry)
    ls = order.shape[1]
    # quarter-major plane rows (nq == 1 reproduces the block layout):
    # row (k*L + b)*... == k*(L*nq) + b*nq + q, each 128-lane quarter
    # Morton-contiguous within its block (a pure reshape of the B axis)
    nq = pk_quarters_for(b)
    qs = b // nq
    tri_rows = grid.tri.reshape(9 * l * nq, qs)
    norm_rows = grid.norm.reshape(12 * l * nq, qs)
    ids_rows = grid.tri_index.reshape(l * nq, qs)
    aabb_rows = jnp.pad(grid.aabb.T, (((0, (-l) % 8)), (0, 2)))  # (Lp, 8)
    from .accel import quarter_aabb_rows

    qaabb_rows = (quarter_aabb_rows(grid, nq) if nq > 1
                  else jnp.zeros((8, 8), jnp.float32))

    out_row = lambda: pl.BlockSpec(
        (8, RAY_TILE), lambda i: (i // 8, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((8, RAY_TILE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # tri rows (9L*NQ, QS)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # norm rows (12L*NQ, QS)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ids (L*NQ, QS)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # aabb rows (L, 8)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # quarter aabb rows
        # plan rows in groups of 8 sublanes (Mosaic tiling floor);
        # the kernel picks row program_id % 8.  SMEM because the
        # kernel reads them with dynamic scalar indices.
        pl.BlockSpec((8, ls), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((8, ls), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
    ]
    inputs = [lane, tri_rows, norm_rows, ids_rows, aabb_rows, qaabb_rows,
              order, entry]
    if shared_origin:
        origin_row = jnp.pad(origins[0:1].astype(jnp.float32),
                             ((0, 0), (0, 5)))  # (1, 8)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(origin_row)
    if n_shadow:
        lights_pad = jnp.pad(
            jnp.asarray(shadow_lights, jnp.float32), ((0, 0), (0, 5))
        )  # (NL, 8)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # lights
        inputs.append(lights_pad)

    nt = rp // RAY_TILE
    dtypes = [jnp.float32, jnp.float32, jnp.float32, jnp.int32]
    if return_normal:
        dtypes += [jnp.float32, jnp.float32, jnp.float32]
    # one (NT, RT) row array per result + per shadow light: lane-major
    # rows tile VMEM/HBM densely.  The former (RP, 1) column outputs
    # tiled to (8, 128) with 127/128 lanes padding, which made XLA's
    # scoped-VMEM staging of the results OOM at 2M-ray wavefronts.
    dtypes += [jnp.float32] * n_shadow
    out_shapes = [jax.ShapeDtypeStruct((nt, RAY_TILE), dt) for dt in dtypes]
    out_specs = [out_row() for _ in dtypes]

    scratch_shapes = [
        pltpu.VMEM((1, RAY_TILE), jnp.float32),   # t_lane
        pltpu.VMEM((RAY_TILE, 1), jnp.float32),   # t_col
        pltpu.VMEM((RAY_TILE, 1), jnp.float32),   # u_col
        pltpu.VMEM((RAY_TILE, 1), jnp.float32),   # v_col
        pltpu.VMEM((RAY_TILE, 1), jnp.int32),     # idx_col
    ]
    if return_normal:
        scratch_shapes += [pltpu.VMEM((1, RAY_TILE), jnp.float32)] * 3
    if n_shadow:
        scratch_shapes.append(pltpu.VMEM((1, RAY_TILE), jnp.float32))  # blk

    grid_spec = pl.GridSpec(
        grid=(rp // RAY_TILE,), in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    outs = pl.pallas_call(
        partial(_closest_kernel, det_eps, l, ls, b, return_normal, n_shadow,
                shadow_eps, shadow_tmin, nq, shared_origin),
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
    )(*inputs)

    t, u, v, idx = (a.reshape(rp)[:r] for a in outs[:4])
    hits = HitData(t=t, u=u, v=v, tri_idx=idx, hit=idx >= 0)
    if n_shadow:
        normal = jnp.stack([a.reshape(rp)[:r] for a in outs[4:7]], axis=1)
        vis = jnp.stack([a.reshape(rp)[:r] for a in outs[7:]], axis=1)
        return hits, normal, vis
    if return_normal:
        normal = jnp.stack([a.reshape(rp)[:r] for a in outs[4:]], axis=1)
        return hits, normal
    return hits


def _occluded_kernel(det_eps, num_blocks, num_supers, block_size, nq,
                     lane_ref, tri_ref, ids_ref, aabb_ref, qaabb_ref,
                     order_ref, entry_ref, out_ref, blk_lane):
    o, d, tmin, tmax = _load_rays_cols(lane_ref)
    o_l, d_l, tmin_l, tmax_l = _load_rays_lane(lane_ref)
    inv_l = tuple(1.0 / c for c in d_l)
    rt = out_ref.shape[1]
    blk_lane[:] = jnp.zeros((1, rt), jnp.float32)
    row = jax.lax.rem(pl.program_id(0), 8)
    nrows = num_blocks * nq
    from .accel import SUPER

    def cond(k):
        in_range = k < num_supers
        next_entry = entry_ref[row, jnp.minimum(k, num_supers - 1)]
        return (in_range & (next_entry < jnp.inf)
                & jnp.any(blk_lane[:] == 0.0))

    def visit_quarter(bq):
        # any-hit max-accumulation is order-independent: quarter
        # gating is exact (same argument as the megakernel's gate)
        tri = tuple(
            tri_ref[pl.ds(k_ * nrows + bq, 1), :]
            for k_ in range(9)
        )
        ids = ids_ref[pl.ds(bq, 1), :]
        t, _, _ = _mt_block(o, d, tri, det_eps, tmin, tmax)
        t = jnp.where(ids >= 0, t, F32_MAX)
        hit = jnp.min(t, axis=1, keepdims=True) < F32_MAX
        blk_lane[:] = jnp.maximum(
            blk_lane[:], _to_lane(hit.astype(jnp.float32))
        )

    def body(k):
        sb = order_ref[row, k]
        for j in range(SUPER):
            b = sb * SUPER + j
            b_c = jnp.minimum(b, num_blocks - 1)
            unresolved = blk_lane[:] == 0.0
            boxed = (
                _tile_slab(aabb_ref, b_c, o_l, inv_l, tmin_l, tmax_l)
                & unresolved
            )
            do_visit = jnp.any(boxed) & (b < num_blocks)

            @pl.when(do_visit)
            def _():
                if nq == 1:
                    visit_quarter(b_c)
                    return
                for q in range(nq):
                    boxed_q = (
                        _tile_slab(qaabb_ref, b_c * nq + q, o_l, inv_l,
                                   tmin_l, tmax_l)
                        & (blk_lane[:] == 0.0)
                    )
                    pl.when(jnp.any(boxed_q))(
                        partial(visit_quarter, b_c * nq + q))

        return k + 1

    jax.lax.while_loop(cond, body, jnp.int32(0))
    out_ref[pl.ds(row, 1), :] = (blk_lane[:] > 0.0).astype(jnp.int32)


@partial(jax.jit, static_argnames=("det_eps", "interpret"))
def pallas_block_occluded(
    origins: Array,
    dirs: Array,
    grid: BlockGrid,
    tmin=1e-4,
    tmax=F32_MAX,
    *,
    det_eps: float = 1e-8,
    interpret: bool = False,
) -> Array:
    """Any-hit occlusion via the fused Pallas kernel (near blockers
    first thanks to the sorted plan, so most tiles resolve in one or two
    block visits)."""
    r = origins.shape[0]
    l, b = grid.tri_index.shape
    rays, rp = _prep_rays(origins, dirs, tmin, tmax)
    lane = _lane_major_rays(rays, RAY_TILE)
    order, entry, _ = tile_visit_plan_fast(
        rays[:, 0:3], rays[:, 3:6], grid, rays[:, 6], rays[:, 7], RAY_TILE
    )
    order, entry = _pad_plan_rows(order, entry)
    ls = order.shape[1]
    nq = pk_quarters_for(b)
    qs = b // nq
    tri_rows = grid.tri.reshape(9 * l * nq, qs)
    ids_rows = grid.tri_index.reshape(l * nq, qs)
    aabb_rows = jnp.pad(grid.aabb.T, (((0, (-l) % 8)), (0, 2)))  # (Lp, 8)
    from .accel import quarter_aabb_rows

    qaabb_rows = (quarter_aabb_rows(grid, nq) if nq > 1
                  else jnp.zeros((8, 8), jnp.float32))

    grid_spec = pl.GridSpec(
        grid=(rp // RAY_TILE,),
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tri rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ids
            pl.BlockSpec(memory_space=pltpu.VMEM),  # aabb rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # quarter aabb rows
            pl.BlockSpec((8, ls), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, ls), lambda i: (i // 8, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, RAY_TILE), jnp.float32)],
    )
    (blocked,) = pl.pallas_call(
        partial(_occluded_kernel, det_eps, l, ls, b, nq),
        out_shape=[jax.ShapeDtypeStruct((rp // RAY_TILE, RAY_TILE), jnp.int32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(lane, tri_rows, ids_rows, aabb_rows, qaabb_rows, order, entry)
    return blocked.reshape(rp)[:r] > 0


# --- chunked variants for scenes whose planes exceed VMEM ---
#
# The reference handles arbitrary scene sizes because its BVH lives in
# GPU global memory (bvh.cu:93-206); our kernel keeps triangle planes
# VMEM-resident, which caps a single launch at ~280k triangles.  Beyond
# that, the grid is split into Morton-contiguous block-axis chunks (each
# spatially tight), each chunk runs the SAME fused kernel with its
# planes resident, and per-ray results merge by the global
# (t, triangle id) tie-break — the identical rule used by the XLA path,
# the in-kernel visits, and the model-axis shard merge
# (parallel/sharded.py), so images are bit-identical to an unchunked
# render of the same scene.


@partial(jax.jit, static_argnames=(
    "det_eps", "interpret", "return_normal", "num_chunks"))
def pallas_block_closest_chunked(
    origins: Array,
    dirs: Array,
    grid: BlockGrid,
    tmin=1e-4,
    *,
    det_eps: float = 1e-8,
    interpret: bool = False,
    return_normal: bool = False,
    num_chunks: int = 0,
):
    """Closest hit over VMEM-sized chunks of an oversized grid.

    ``num_chunks <= 0`` sizes automatically (``num_chunks_for``).
    Fused shadow rays are not offered here: per-chunk hit points are
    provisional until the merge, so visibility must come from a separate
    (chunked) occlusion pass.
    """
    n = num_chunks if num_chunks > 0 else num_chunks_for(grid)
    best = None
    for c in range(n):
        sub = _grid_chunk(grid, c, n)
        out = pallas_block_closest(
            origins, dirs, sub, tmin=tmin, det_eps=det_eps,
            interpret=interpret, return_normal=return_normal,
        )
        h, nrm = out if return_normal else (out, None)
        if best is None:
            best = (h, nrm)
            continue
        bh, bn = best
        b_key = jnp.where(bh.tri_idx >= 0, bh.tri_idx, _INT_MAX)
        n_key = jnp.where(h.tri_idx >= 0, h.tri_idx, _INT_MAX)
        take = h.hit & (
            ~bh.hit | (h.t < bh.t) | ((h.t == bh.t) & (n_key < b_key))
        )
        merged = HitData(
            t=jnp.where(take, h.t, bh.t),
            u=jnp.where(take, h.u, bh.u),
            v=jnp.where(take, h.v, bh.v),
            tri_idx=jnp.where(take, h.tri_idx, bh.tri_idx),
            hit=bh.hit | h.hit,
        )
        if return_normal:
            bn = jnp.where(take[:, None], nrm, bn)
        best = (merged, bn)
    h, nrm = best
    return (h, nrm) if return_normal else h


@partial(jax.jit, static_argnames=("det_eps", "interpret", "num_chunks"))
def pallas_block_occluded_chunked(
    origins: Array,
    dirs: Array,
    grid: BlockGrid,
    tmin=1e-4,
    tmax=F32_MAX,
    *,
    det_eps: float = 1e-8,
    interpret: bool = False,
    num_chunks: int = 0,
) -> Array:
    """Any-hit occlusion over VMEM-sized chunks (OR of chunk results)."""
    n = num_chunks if num_chunks > 0 else num_chunks_for(grid)
    blocked = None
    for c in range(n):
        sub = _grid_chunk(grid, c, n)
        bc = pallas_block_occluded(
            origins, dirs, sub, tmin=tmin, tmax=tmax, det_eps=det_eps,
            interpret=interpret,
        )
        blocked = bc if blocked is None else (blocked | bc)
    return blocked


# --- streamed variants: triangle planes stay in HBM, the kernel DMAs
# superblocks through a VMEM double buffer ---
#
# The chunked variants above re-LAUNCH the kernel per chunk: every
# chunk pays plan build + ray staging + result merge, and every ray
# tile visits every chunk's plan even when front-to-back pruning would
# have stopped after the first blocks.  The streamed kernel instead
# keeps the whole grid in HBM and walks ONE front-to-back plan,
# `pltpu.make_async_copy`-ing each candidate superblock (8 blocks x 9
# planes) into one half of a VMEM double buffer while the dense visits
# consume the other half — the TPU restatement of the reference's
# global-memory BVH traversal (``query.h:224-311`` reads node/triangle
# data from HBM through the cache; here the "cache" is an explicitly
# scheduled double buffer).  Early exit carries over unchanged, so a
# tile that resolves in its first superblocks never streams the rest
# of the scene.  Results are bit-identical to the resident/chunked
# kernels: same _mt_block math, same (t, global id) tie-break.


def _stream_grid_operands(grid: BlockGrid):
    """(tri_hbm (LS*72, B), ids_hbm (LS*8, B), aabb rows, LS): the
    block axis padded to whole superblocks so every DMA is in range;
    padding blocks carry ids == -1 and never contribute hits."""
    l, b = grid.tri_index.shape
    ls = -(-l // SUPER)
    pad = ls * SUPER - l
    tri = grid.tri
    ids = grid.tri_index
    if pad:
        tri = jnp.concatenate(
            [tri, jnp.zeros((9, pad, b), tri.dtype)], axis=1)
        ids = jnp.concatenate([ids, jnp.full((pad, b), -1, jnp.int32)])
    # block-major rows: rows [blk*9, blk*9+9) are one block's planes,
    # so a superblock is one contiguous (72, B) DMA
    tri_hbm = tri.transpose(1, 0, 2).reshape(ls * SUPER * 9, b)
    aabb_rows = jnp.pad(grid.aabb.T, (((0, (-l) % 8)), (0, 2)))  # (Lp, 8)
    return tri_hbm, ids, aabb_rows, ls


def _streamed_walk(num_supers, row, order_ref, entry_ref,
                   tri_hbm, ids_hbm, tri_buf, ids_buf, tri_sem, ids_sem,
                   stop_fn, visit_fn):
    """Shared double-buffered plan walk for the streamed kernels.

    ``stop_fn() -> bool``: extra loop-continue condition (front-to-back
    early exit).  ``visit_fn(slot, sb)``: consume the superblock in
    buffer ``slot``.  Exactly one copy is outstanding at every point:
    the pre-loop issue fills slot 0; each body waits its slot, issues
    the NEXT (clamped) superblock into the other slot, then visits; the
    drain after the loop retires the last outstanding copy.
    """
    def issue(slot, k):
        sb = order_ref[row, jnp.minimum(k, num_supers - 1)]
        pltpu.make_async_copy(
            tri_hbm.at[pl.ds(sb * (SUPER * 9), SUPER * 9), :],
            tri_buf.at[slot], tri_sem.at[slot],
        ).start()
        pltpu.make_async_copy(
            ids_hbm.at[pl.ds(sb * SUPER, SUPER), :],
            ids_buf.at[slot], ids_sem.at[slot],
        ).start()

    def wait(slot):
        pltpu.make_async_copy(
            tri_hbm.at[pl.ds(0, SUPER * 9), :], tri_buf.at[slot],
            tri_sem.at[slot],
        ).wait()
        pltpu.make_async_copy(
            ids_hbm.at[pl.ds(0, SUPER), :], ids_buf.at[slot],
            ids_sem.at[slot],
        ).wait()

    issue(0, jnp.int32(0))

    def cond(k):
        in_range = k < num_supers
        next_entry = entry_ref[row, jnp.minimum(k, num_supers - 1)]
        return in_range & stop_fn(next_entry)

    def body(k):
        slot = jax.lax.rem(k, 2)
        wait(slot)
        issue(1 - slot, k + 1)
        sb = order_ref[row, k]
        visit_fn(slot, sb)
        return k + 1

    k_end = jax.lax.while_loop(cond, body, jnp.int32(0))
    wait(jax.lax.rem(k_end, 2))  # drain the one outstanding prefetch


def _closest_streamed_kernel(det_eps, num_blocks, num_supers, block_size,
                             lane_ref, aabb_ref, order_ref, entry_ref,
                             tri_hbm, ids_hbm,
                             t_out, u_out, v_out, idx_out,
                             t_lane, t_col, u_col, v_col, idx_col,
                             tri_buf, ids_buf, tri_sem, ids_sem):
    o, d, tmin, _ = _load_rays_cols(lane_ref)
    o_l, d_l, tmin_l, _ = _load_rays_lane(lane_ref)
    inv_l = tuple(1.0 / c for c in d_l)
    rt = t_col.shape[0]
    t_col[:] = jnp.full((rt, 1), F32_MAX, jnp.float32)
    t_lane[:] = jnp.full((1, rt), F32_MAX, jnp.float32)
    u_col[:] = jnp.zeros((rt, 1), jnp.float32)
    v_col[:] = jnp.zeros((rt, 1), jnp.float32)
    idx_col[:] = jnp.full((rt, 1), -1, jnp.int32)
    row = jax.lax.rem(pl.program_id(0), 8)

    def visit(slot, sb):
        for j in range(SUPER):
            b = sb * SUPER + j
            b_c = jnp.minimum(b, num_blocks - 1)
            boxed = _tile_slab(aabb_ref, b_c, o_l, inv_l, tmin_l, t_lane[:])
            do_visit = jnp.any(boxed) & (b < num_blocks)

            @pl.when(do_visit)
            def _(j=j):
                tri = tuple(
                    tri_buf[slot, pl.ds(j * 9 + k_, 1), :] for k_ in range(9)
                )
                ids = ids_buf[slot, pl.ds(j, 1), :]
                t, u, v = _mt_block(o, d, tri, det_eps, tmin, t_col[:])
                t = jnp.where(ids >= 0, t, F32_MAX)
                min_t = jnp.min(t, axis=1, keepdims=True)
                at_min = t == min_t
                id_key = jnp.where(at_min & (ids >= 0), ids, _INT_MAX)
                best_id = jnp.min(id_key, axis=1, keepdims=True)
                old_t = t_col[:]
                old_idx = idx_col[:]
                old_key = jnp.where(old_idx >= 0, old_idx, _INT_MAX)
                take = (min_t < F32_MAX) & (
                    (min_t < old_t)
                    | ((min_t == old_t) & (best_id < old_key))
                )

                @pl.when(jnp.any(take))
                def _():
                    new_t = jnp.where(take, min_t, old_t)
                    t_col[:] = new_t
                    t_lane[:] = _to_lane(new_t)
                    idx_col[:] = jnp.where(take, best_id, old_idx)
                    pick = at_min & (id_key == best_id)
                    sel_u = jnp.sum(jnp.where(pick, u, 0.0), axis=1,
                                    keepdims=True)
                    sel_v = jnp.sum(jnp.where(pick, v, 0.0), axis=1,
                                    keepdims=True)
                    u_col[:] = jnp.where(take, sel_u, u_col[:])
                    v_col[:] = jnp.where(take, sel_v, v_col[:])

    _streamed_walk(num_supers, row, order_ref, entry_ref,
                   tri_hbm, ids_hbm, tri_buf, ids_buf, tri_sem, ids_sem,
                   lambda next_entry: next_entry <= jnp.max(t_lane[:]),
                   visit)

    t_out[pl.ds(row, 1), :] = t_lane[:]
    u_out[pl.ds(row, 1), :] = _to_lane(u_col[:])
    v_out[pl.ds(row, 1), :] = _to_lane(v_col[:])
    idx_out[pl.ds(row, 1), :] = _to_lane(idx_col[:])


@partial(jax.jit, static_argnames=("det_eps", "interpret"))
def pallas_block_closest_streamed(
    origins: Array,
    dirs: Array,
    grid: BlockGrid,
    tmin=1e-4,
    *,
    det_eps: float = 1e-8,
    interpret: bool = False,
) -> HitData:
    """Closest hit with HBM-resident triangle planes streamed through a
    double-buffered VMEM window — ONE launch for scenes of any size
    (vs ``pallas_block_closest_chunked``'s launch-per-chunk).  Returns
    HitData only (no in-kernel normals: callers recompute the shading
    frame via ``make_hit_frame``, whose gathers are the cheap part at
    streaming scale)."""
    r = origins.shape[0]
    l, b = grid.tri_index.shape
    rays, rp = _prep_rays(origins, dirs, tmin, F32_MAX)
    lane = _lane_major_rays(rays, RAY_TILE)
    order, entry, _ = tile_visit_plan_fast(
        rays[:, 0:3], rays[:, 3:6], grid, rays[:, 6], rays[:, 7], RAY_TILE
    )
    order, entry = _pad_plan_rows(order, entry)
    ls = order.shape[1]
    tri_hbm, ids_hbm, aabb_rows, _ = _stream_grid_operands(grid)

    nt = rp // RAY_TILE
    out_row = lambda: pl.BlockSpec(
        (8, RAY_TILE), lambda i: (i // 8, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pl.GridSpec(
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # aabb rows (small)
            pl.BlockSpec((8, ls), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, ls), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # tri planes, HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # ids, HBM
        ],
        out_specs=[out_row() for _ in range(4)],
        scratch_shapes=[
            pltpu.VMEM((1, RAY_TILE), jnp.float32),   # t_lane
            pltpu.VMEM((RAY_TILE, 1), jnp.float32),   # t_col
            pltpu.VMEM((RAY_TILE, 1), jnp.float32),   # u_col
            pltpu.VMEM((RAY_TILE, 1), jnp.float32),   # v_col
            pltpu.VMEM((RAY_TILE, 1), jnp.int32),     # idx_col
            pltpu.VMEM((2, SUPER * 9, b), jnp.float32),  # tri double buffer
            pltpu.VMEM((2, SUPER, b), jnp.int32),        # ids double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dtypes = [jnp.float32, jnp.float32, jnp.float32, jnp.int32]
    outs = pl.pallas_call(
        partial(_closest_streamed_kernel, det_eps, l, ls, b),
        out_shape=[jax.ShapeDtypeStruct((nt, RAY_TILE), dt) for dt in dtypes],
        grid_spec=grid_spec,
        interpret=interpret,
    )(lane, aabb_rows, order, entry, tri_hbm, ids_hbm)
    t, u, v, idx = (a.reshape(rp)[:r] for a in outs)
    return HitData(t=t, u=u, v=v, tri_idx=idx, hit=idx >= 0)


# --- BLOCK-MAJOR streamed variants: scene slabs stream ONCE per ray
# CHUNK instead of once per ray TILE ---
#
# The plan-walk streamed kernels above re-DMA each candidate superblock
# per 512-ray tile: HBM read traffic scales as tiles x candidate
# blocks (~206 GB for the 1.27M-tri frame, measured 494 ms at ~51% of
# HBM peak — round-4 #3).  Inverting the loop bounds traffic by
# scene_bytes x n_ray_chunks + ray_bytes: the Pallas grid is
# (ray chunks I, scene slabs J) with J minor, so the pipeline fetches
# each 64-block slab once per 32k-ray chunk (auto double-buffered by
# the BlockSpec index_map) and the kernel sweeps it against the RESIDENT
# chunk's 64 ray tiles.  An XLA-side (I, J) interval gate skips the
# arithmetic (not the fetch) for chunk/slab pairs that cannot meet.
# This is the TPU restatement of the LBVH's memory-scaling role
# (``bvh.cu:93-206``): the tree bounds which triangles a ray pays for;
# here the bin gate + per-tile slab tests bound which slabs a chunk
# pays COMPUTE for, while the streaming schedule bounds what everything
# pays in BANDWIDTH.  Results are bit-identical to the other kernels:
# same _mt_block math, same lexicographic (t, global id) winner.

BM_CHUNK_TILES = 64   # ray tiles per resident chunk (32k rays)
BM_SLAB_BLOCKS = 64   # blocks per streamed scene slab


def _blockmajor_operands(grid: BlockGrid, slab_blocks: int):
    """Block-major slab rows + resident AABB/union operands.

    Returns (tri_slabs (Lp*9, B), ids (Lp, B), aabb_rows (Lp8, 8),
    union_rows (J8, 8), num_slabs).  Padding blocks carry ids == -1 and
    empty AABBs (slab test fails for every finite ray)."""
    l, b = grid.tri_index.shape
    j = -(-l // slab_blocks)
    pad = j * slab_blocks - l
    tri = grid.tri
    ids = grid.tri_index
    aabb = grid.aabb
    if pad:
        tri = jnp.concatenate([tri, jnp.zeros((9, pad, b), tri.dtype)],
                              axis=1)
        ids = jnp.concatenate([ids, jnp.full((pad, b), -1, jnp.int32)])
        aabb = jnp.concatenate(
            [aabb, jnp.concatenate([jnp.full((3, pad), jnp.inf),
                                    jnp.full((3, pad), -jnp.inf)])],
            axis=1)
    lp = j * slab_blocks
    tri_slabs = tri.transpose(1, 0, 2).reshape(lp * 9, b)
    aabb_rows = jnp.pad(aabb.T, ((0, (-lp) % 8), (0, 2)))
    umin = aabb[:3].reshape(3, j, slab_blocks).min(axis=2)
    umax = aabb[3:].reshape(3, j, slab_blocks).max(axis=2)
    union_rows = jnp.pad(jnp.concatenate([umin, umax]).T,
                         ((0, (-j) % 8), (0, 2)))
    return tri_slabs, ids, aabb_rows, union_rows, j


def _chunk_slab_gate(rays, chunk_rays: int, union_rows, num_slabs: int):
    """(I, J) int32 gate: conservative interval slab test of each ray
    chunk's live hull against each scene slab's union AABB (the same
    interval arithmetic as ``accel.tile_visit_plan_fast``)."""
    rp = rays.shape[0]
    ni = rp // chunk_rays
    o3 = rays[:, 0:3].reshape(ni, chunk_rays, 3)
    d3 = rays[:, 3:6].reshape(ni, chunk_rays, 3)
    live = (o3[..., 0:1] < 1e29)
    o_lo = jnp.min(jnp.where(live, o3, jnp.inf), axis=1)
    o_hi = jnp.max(jnp.where(live, o3, -jnp.inf), axis=1)
    d_lo = jnp.min(jnp.where(live, d3, jnp.inf), axis=1)
    d_hi = jnp.max(jnp.where(live, d3, -jnp.inf), axis=1)
    tn = rays[:, 6].reshape(ni, chunk_rays)
    tx = rays[:, 7].reshape(ni, chunk_rays)
    lv = live[..., 0]
    near_all = jnp.min(jnp.where(lv, tn, jnp.inf), axis=1)[:, None]
    far_all = jnp.max(jnp.where(lv, tx, -jnp.inf), axis=1)[:, None]
    any_live = jnp.any(lv, axis=1)

    def imul(alo, ahi, blo, bhi):
        p1, p2, p3, p4 = alo * blo, alo * bhi, ahi * blo, ahi * bhi
        return (jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
                jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)))

    ub = union_rows[:num_slabs]  # (J, 8)
    for axis in range(3):
        blo = ub[:, axis][None, :]
        bhi = ub[:, axis + 3][None, :]
        olo, ohi = o_lo[:, axis:axis + 1], o_hi[:, axis:axis + 1]
        dlo, dhi = d_lo[:, axis:axis + 1], d_hi[:, axis:axis + 1]
        spans0 = (dlo <= 0.0) & (dhi >= 0.0)
        inv_a, inv_b = 1.0 / dhi, 1.0 / dlo
        p1lo, p1hi = imul(blo - ohi, blo - olo, inv_a, inv_b)
        p2lo, p2hi = imul(bhi - ohi, bhi - olo, inv_a, inv_b)
        near = jnp.minimum(p1lo, p2lo) - jnp.abs(jnp.minimum(p1lo, p2lo)) * 4e-7
        far = jnp.maximum(p1hi, p2hi) + jnp.abs(jnp.maximum(p1hi, p2hi)) * 4e-7
        bad = spans0 | jnp.isnan(near) | jnp.isnan(far)
        near_all = jnp.maximum(near_all, jnp.where(bad, -jnp.inf, near))
        far_all = jnp.minimum(far_all, jnp.where(bad, jnp.inf, far))
    valid = (ub[:, 0] <= ub[:, 3])[None, :]
    hit = (near_all <= far_all) & valid & any_live[:, None]
    return hit.astype(jnp.int32)  # (I, J)


def _closest_blockmajor_kernel(det_eps, num_slabs, slab_blocks,
                               chunk_tiles, block_size, occluded,
                               gate_ref, lane_ref, aabb_ref,
                               tri_ref, ids_ref,
                               t_out, u_out, v_out, idx_out):
    i = pl.program_id(0)
    j = pl.program_id(1)
    rt = lane_ref.shape[1]

    @pl.when(j == 0)
    def _():
        t_out[:] = jnp.full((chunk_tiles, rt), F32_MAX, jnp.float32)
        u_out[:] = jnp.zeros((chunk_tiles, rt), jnp.float32)
        v_out[:] = jnp.zeros((chunk_tiles, rt), jnp.float32)
        idx_out[:] = jnp.full((chunk_tiles, rt), -1, jnp.int32)

    @pl.when(gate_ref[i, j] > 0)
    def _():
        def tile_body(ti, _):
            o_l = tuple(lane_ref[pl.ds(ti * 8 + k, 1), :] for k in range(3))
            d_l = tuple(lane_ref[pl.ds(ti * 8 + 3 + k, 1), :]
                        for k in range(3))
            tmin_l = lane_ref[pl.ds(ti * 8 + 6, 1), :]
            tmax_l = lane_ref[pl.ds(ti * 8 + 7, 1), :]
            inv_l = tuple(1.0 / c for c in d_l)
            o_c = tuple(_to_col(c) for c in o_l)
            d_c = tuple(_to_col(c) for c in d_l)
            tmin_c = _to_col(tmin_l)

            def blk_body(bb, _):
                gb = j * slab_blocks + bb
                if occluded:
                    # blocked lanes get a closed window: their slab
                    # test fails, so fully-blocked tiles skip visits
                    window = jnp.where(idx_out[pl.ds(ti, 1), :] > 0,
                                       -jnp.inf, tmax_l)
                else:
                    window = t_out[pl.ds(ti, 1), :]
                boxed = _tile_slab(aabb_ref, gb, o_l, inv_l, tmin_l,
                                   window)

                @pl.when(jnp.any(boxed))
                def _():
                    tri = tuple(
                        tri_ref[pl.ds(bb * 9 + k_, 1), :] for k_ in range(9)
                    )
                    ids = ids_ref[pl.ds(bb, 1), :]
                    if occluded:
                        ts, _u, _v = _mt_block(
                            o_c, d_c, tri, det_eps, tmin_c,
                            _to_col(tmax_l))
                        ts = jnp.where(ids >= 0, ts, F32_MAX)
                        s_hit = jnp.min(ts, axis=1, keepdims=True) < F32_MAX
                        idx_out[pl.ds(ti, 1), :] = jnp.maximum(
                            idx_out[pl.ds(ti, 1), :],
                            _to_lane(jnp.where(s_hit, 1, 0)))
                        return
                    old_t_l = t_out[pl.ds(ti, 1), :]
                    t, u, v = _mt_block(o_c, d_c, tri, det_eps, tmin_c,
                                        _to_col(old_t_l))
                    t = jnp.where(ids >= 0, t, F32_MAX)
                    min_t = jnp.min(t, axis=1, keepdims=True)
                    at_min = t == min_t
                    id_key = jnp.where(at_min & (ids >= 0), ids, _INT_MAX)
                    best_id = jnp.min(id_key, axis=1, keepdims=True)
                    old_t = _to_col(old_t_l)
                    old_idx = _to_col(idx_out[pl.ds(ti, 1), :])
                    old_key = jnp.where(old_idx >= 0, old_idx, _INT_MAX)
                    take = (min_t < F32_MAX) & (
                        (min_t < old_t)
                        | ((min_t == old_t) & (best_id < old_key))
                    )

                    @pl.when(jnp.any(take))
                    def _():
                        new_t = jnp.where(take, min_t, old_t)
                        t_out[pl.ds(ti, 1), :] = _to_lane(new_t)
                        idx_out[pl.ds(ti, 1), :] = _to_lane(
                            jnp.where(take, best_id, old_idx))
                        pick = at_min & (id_key == best_id)
                        sel_u = jnp.sum(jnp.where(pick, u, 0.0), axis=1,
                                        keepdims=True)
                        sel_v = jnp.sum(jnp.where(pick, v, 0.0), axis=1,
                                        keepdims=True)
                        old_u = _to_col(u_out[pl.ds(ti, 1), :])
                        old_v = _to_col(v_out[pl.ds(ti, 1), :])
                        u_out[pl.ds(ti, 1), :] = _to_lane(
                            jnp.where(take, sel_u, old_u))
                        v_out[pl.ds(ti, 1), :] = _to_lane(
                            jnp.where(take, sel_v, old_v))

                return 0

            jax.lax.fori_loop(0, slab_blocks, blk_body, 0)
            return 0

        jax.lax.fori_loop(0, chunk_tiles, tile_body, 0)


def _blockmajor_call(origins, dirs, grid, tmin, tmax, det_eps, interpret,
                     occluded, chunk_tiles, slab_blocks):
    l, b = grid.tri_index.shape
    r = origins.shape[0]
    rays, rp = _prep_rays(origins, dirs, tmin, tmax)
    chunk_rays = chunk_tiles * RAY_TILE
    pad = (-rp) % chunk_rays
    if pad:
        filler = jnp.full((pad, 8), 1.0, jnp.float32).at[:, 0:3].set(1e30)
        rays = jnp.concatenate([rays, filler])
        rp += pad
    lane = _lane_major_rays(rays, RAY_TILE)
    tri_slabs, ids, aabb_rows, union_rows, nj = _blockmajor_operands(
        grid, slab_blocks)
    gate = _chunk_slab_gate(rays, chunk_rays, union_rows, nj)
    ni = rp // chunk_rays

    out_block = lambda dt: pl.BlockSpec(
        (chunk_tiles, RAY_TILE), lambda i, j: (i, 0),
        memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # gate (I, J)
            pl.BlockSpec((chunk_tiles * 8, RAY_TILE),
                         lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # aabb rows (all)
            pl.BlockSpec((slab_blocks * 9, b), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),  # slab planes (stream)
            pl.BlockSpec((slab_blocks, b), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),  # slab ids (stream)
        ],
        out_specs=[out_block(jnp.float32)] * 3 + [out_block(jnp.int32)],
    )
    nt = rp // RAY_TILE
    dtypes = [jnp.float32, jnp.float32, jnp.float32, jnp.int32]
    outs = pl.pallas_call(
        partial(_closest_blockmajor_kernel, det_eps, nj, slab_blocks,
                chunk_tiles, b, occluded),
        out_shape=[jax.ShapeDtypeStruct((nt, RAY_TILE), dt)
                   for dt in dtypes],
        grid_spec=grid_spec,
        interpret=interpret,
    )(gate, lane, aabb_rows, tri_slabs, ids)
    return outs, r, rp


@partial(jax.jit, static_argnames=("det_eps", "interpret", "chunk_tiles",
                                   "slab_blocks"))
def pallas_block_closest_blockmajor(
    origins: Array,
    dirs: Array,
    grid: BlockGrid,
    tmin=1e-4,
    *,
    det_eps: float = 1e-8,
    interpret: bool = False,
    chunk_tiles: int = BM_CHUNK_TILES,
    slab_blocks: int = BM_SLAB_BLOCKS,
) -> HitData:
    """Closest hit with BLOCK-MAJOR streaming: each 64-block scene slab
    is fetched once per 32k-ray chunk and swept against the resident
    rays — HBM traffic is scene x n_chunks + rays, instead of the
    plan-walk streamed kernel's tiles x candidate-blocks.  One launch;
    bit-identical winners (same math, same (t, id) tie-break)."""
    outs, r, rp = _blockmajor_call(origins, dirs, grid, tmin, F32_MAX,
                                   det_eps, interpret, occluded=False,
                                   chunk_tiles=chunk_tiles,
                                   slab_blocks=slab_blocks)
    t, u, v, idx = (a.reshape(rp)[:r] for a in outs)
    return HitData(t=t, u=u, v=v, tri_idx=idx, hit=idx >= 0)


@partial(jax.jit, static_argnames=("det_eps", "interpret", "chunk_tiles",
                                   "slab_blocks"))
def pallas_block_occluded_blockmajor(
    origins: Array,
    dirs: Array,
    grid: BlockGrid,
    tmin=1e-4,
    tmax=F32_MAX,
    *,
    det_eps: float = 1e-8,
    interpret: bool = False,
    chunk_tiles: int = BM_CHUNK_TILES,
    slab_blocks: int = BM_SLAB_BLOCKS,
) -> Array:
    """Any-hit occlusion with block-major streaming (see
    ``pallas_block_closest_blockmajor``)."""
    outs, r, rp = _blockmajor_call(origins, dirs, grid, tmin, tmax,
                                   det_eps, interpret, occluded=True,
                                   chunk_tiles=chunk_tiles,
                                   slab_blocks=slab_blocks)
    return outs[3].reshape(rp)[:r] > 0


def _occluded_streamed_kernel(det_eps, num_blocks, num_supers, block_size,
                              lane_ref, aabb_ref, order_ref, entry_ref,
                              tri_hbm, ids_hbm, out_ref,
                              blk_lane, tri_buf, ids_buf, tri_sem, ids_sem):
    o, d, tmin, tmax = _load_rays_cols(lane_ref)
    o_l, d_l, tmin_l, tmax_l = _load_rays_lane(lane_ref)
    inv_l = tuple(1.0 / c for c in d_l)
    rt = out_ref.shape[1]
    blk_lane[:] = jnp.zeros((1, rt), jnp.float32)
    row = jax.lax.rem(pl.program_id(0), 8)

    def visit(slot, sb):
        for j in range(SUPER):
            b = sb * SUPER + j
            b_c = jnp.minimum(b, num_blocks - 1)
            unresolved = blk_lane[:] == 0.0
            boxed = (
                _tile_slab(aabb_ref, b_c, o_l, inv_l, tmin_l, tmax_l)
                & unresolved
            )
            do_visit = jnp.any(boxed) & (b < num_blocks)

            @pl.when(do_visit)
            def _(j=j):
                tri = tuple(
                    tri_buf[slot, pl.ds(j * 9 + k_, 1), :] for k_ in range(9)
                )
                ids = ids_buf[slot, pl.ds(j, 1), :]
                t, _, _ = _mt_block(o, d, tri, det_eps, tmin, tmax)
                t = jnp.where(ids >= 0, t, F32_MAX)
                hit = jnp.min(t, axis=1, keepdims=True) < F32_MAX
                blk_lane[:] = jnp.maximum(
                    blk_lane[:], _to_lane(hit.astype(jnp.float32))
                )

    _streamed_walk(
        num_supers, row, order_ref, entry_ref,
        tri_hbm, ids_hbm, tri_buf, ids_buf, tri_sem, ids_sem,
        lambda next_entry: (next_entry < jnp.inf)
        & jnp.any(blk_lane[:] == 0.0),
        visit)

    out_ref[pl.ds(row, 1), :] = (blk_lane[:] > 0.0).astype(jnp.int32)


@partial(jax.jit, static_argnames=("det_eps", "interpret"))
def pallas_block_occluded_streamed(
    origins: Array,
    dirs: Array,
    grid: BlockGrid,
    tmin=1e-4,
    tmax=F32_MAX,
    *,
    det_eps: float = 1e-8,
    interpret: bool = False,
) -> Array:
    """Any-hit occlusion with HBM-streamed planes (one launch; early
    exit once every lane is blocked or the plan runs out)."""
    r = origins.shape[0]
    l, b = grid.tri_index.shape
    rays, rp = _prep_rays(origins, dirs, tmin, tmax)
    lane = _lane_major_rays(rays, RAY_TILE)
    order, entry, _ = tile_visit_plan_fast(
        rays[:, 0:3], rays[:, 3:6], grid, rays[:, 6], rays[:, 7], RAY_TILE
    )
    order, entry = _pad_plan_rows(order, entry)
    ls = order.shape[1]
    tri_hbm, ids_hbm, aabb_rows, _ = _stream_grid_operands(grid)

    nt = rp // RAY_TILE
    grid_spec = pl.GridSpec(
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ls), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, ls), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((8, RAY_TILE), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, RAY_TILE), jnp.float32),
            pltpu.VMEM((2, SUPER * 9, b), jnp.float32),
            pltpu.VMEM((2, SUPER, b), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (blocked,) = pl.pallas_call(
        partial(_occluded_streamed_kernel, det_eps, l, ls, b),
        out_shape=[jax.ShapeDtypeStruct((nt, RAY_TILE), jnp.int32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(lane, aabb_rows, order, entry, tri_hbm, ids_hbm)
    return blocked.reshape(rp)[:r] > 0
