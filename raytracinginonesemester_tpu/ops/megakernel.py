"""Fused render megakernel: the TPU restatement of ``renderBatchCUDA``.

The reference's GPU render is ONE kernel per sample batch that does
everything per pixel thread — jitter, ray generation, BVH traversal,
shading, shadows (``GPUandCPU/include/query.cu:12-66``).  The wavefront
integrator (``ops.integrator``) splits those stages into XLA ops with a
Pallas traversal core, which costs ~15 ms of HBM-bound glue per 1080p
wavefront (ray buffers, seeds, material gathers, radiance combines).

This module fuses the whole sample loop into the traversal kernel for
the common terminal case — gpu dialect, point lights, no contributing
secondary rays (``Scene.terminal_only`` and ``diffuse_bounce=False``;
with all kr == 0 the reference's mirror branch carries zero throughput,
``query.h:202-206``, so skipping bounces is exact).  Per 512-ray tile:

1. in-kernel per-sample wang-hash jitter + camera ray generation,
   bit-compatible with ``core.rng.pixel_jitter`` / ``Camera.get_rays``
   (``query.cu:36-43``, ``camera.h:49-53``);
2. the front-to-back block traversal of ``pallas_kernels`` (same dense
   Moller-Trumbore, tie-break, and in-kernel shading normals);
3. in-kernel ``IsInShadow`` + ``ShadeDirect`` (``shader.h:44-110``) with
   materials resolved by a static per-object loop — object counts are
   tiny, so each object's scalar parameters broadcast over the tile
   instead of per-lane gathers;
4. spp accumulation in VMEM (the analog of the reference's 32-sample
   register batches, ``antialias.h:39``).

The traversal plan comes from ``camera_tile_plan``: per pixel tile, an
interval slab test of the tile's jitter-inflated corner-ray hull against
superblock AABBs — sample-independent, so one plan serves every spp.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import F32_MAX
from .accel import SUPER, super_aabbs
from .pallas_kernels import (
    RAY_TILE,
    _mt_block,
    _pad_plan_rows,
    _tile_slab,
    _to_col,
    _to_lane,
    fits_vmem,
)

__all__ = ["megakernel_eligible", "render_tiles", "camera_tile_plan",
           "emit_tiles", "resume_tiles"]

MAX_OBJECTS = 32

# trace-time switches for perf bisection (set the env vars before
# import, e.g. `MK_SKIP_SHADOW=1 python bench.py`); production runs
# leave them unset
import os as _os

_DEBUG_SKIP_SHADOW = _os.environ.get("MK_SKIP_SHADOW") == "1"
_DEBUG_SKIP_TRAVERSAL = _os.environ.get("MK_SKIP_TRAVERSAL") == "1"
_DEBUG_SKIP_DENSE = _os.environ.get("MK_SKIP_DENSE") == "1"
_DEBUG_DENSE_ONLY = _os.environ.get("MK_DENSE_ONLY") == "1"
_DEBUG_NO_DIST_EXIT = _os.environ.get("MK_NO_DIST_EXIT") == "1"
_ORDERED_BOUNCE_SCAN = _os.environ.get("MK_ORDERED_SCAN") == "1"
# timing bisect: keep the (t, id) winner update but skip the per-visit
# normal/obj attribute selection (normals stay (0,0,1): image wrong,
# alive-mask and scan behavior realistic)
_DEBUG_SKIP_ATTRS = _os.environ.get("MK_SKIP_ATTRS") == "1"
# timing bisect: skip dense visits only in BOUNCE traversals (camera
# pass intact, so bounce wavefronts are realistic); isolates the pure
# per-block scan overhead of the bounce flat scan
_DEBUG_SKIP_DENSE_BOUNCE = _os.environ.get("MK_SKIP_DENSE_BOUNCE") == "1"

# Traversal order: the planned walk visits fewer blocks front-to-back
# but its data-dependent block index defeats Mosaic's strided-read
# pipelining (the same effect that made the flat scan beat the ordered
# bounce scan).  Measured on frog 1080p depth-8 (39 blocks): flat
# camera pass saves ~22 ms, flat staged bounces ~5 ms, bit-identical
# (the (t, id) tie-break is visit-order invariant).  Flat wins while
# the per-tile slab sweep is cheap; scenes with many blocks keep the
# planned walk's early exit.  MK_EMIT_FLAT / MK_STAGED_FLAT = 0/1
# force either choice; MK_FLAT_MAX_BLOCKS moves the crossover.
_FLAT_MAX_BLOCKS = int(_os.environ.get("MK_FLAT_MAX_BLOCKS", "96"))
# read ONCE at import (like every MK_* knob): an env read at trace time
# would be captured by the first trace and silently masked by the jit
# cache thereafter — bisections set these per process
_EMIT_FLAT_ENV = _os.environ.get("MK_EMIT_FLAT", "")
_STAGED_FLAT_ENV = _os.environ.get("MK_STAGED_FLAT", "")


def _flat_choice(env_value, num_blocks):
    if env_value in ("0", "1"):
        return env_value == "1"
    return num_blocks <= _FLAT_MAX_BLOCKS


def emit_flat(num_blocks: int) -> bool:
    return _flat_choice(_EMIT_FLAT_ENV, num_blocks)


def staged_flat(num_blocks: int) -> bool:
    return _flat_choice(_STAGED_FLAT_ENV, num_blocks)

# Visit-body branch experiment: MK_NO_WHEN=1 runs the winner-update
# body of every dense visit UNCONDITIONALLY (every write in it is
# already where-gated on take, so this is bit-exact) instead of behind
# pl.when(any(take)) — measures whether the scalar branch itself stalls
# Mosaic's visit pipeline.
_NO_WHEN = _os.environ.get("MK_NO_WHEN", "0") == "1"

# MXU winner-attribute selection: per firing visit, select ALL winner
# attributes (tri v0/e1/e2 for the exact u/v recompute, vertex normals,
# geometric normal, object id) with ONE one-hot (RT, B) x (B, 128) bf16
# matmul instead of masked cross-lane reductions.  Attribute values are
# pre-split into three bf16 parts (hi/mid/lo) whose f32 sum is
# bit-exact for |q| in [1e-32, 3.38e38] (scripts/probe_mm_select.py
# verifies bit-identity end to end); the one-hot row has exactly one
# 1.0, so the MXU f32 accumulation is a pure selection.  Costs one
# (L*B, 128) bf16 VMEM operand (~0.26 KB/triangle).
_MM_ATTRS = _os.environ.get("MK_MM_ATTRS", "1") == "1"

# Sublane-chunked dense visits for incoherent bounce wavefronts: the
# slab mask `boxed` says which of the tile's rays can possibly improve
# in a block; after a diffuse bounce only ~3-5% can, scattered across
# the tile, so the full (RAY_TILE, B) Moller-Trumbore wastes >90% of
# its register-ops.  Gating the dense test per CHUNK sublane rows (an
# (8, 128) chunk is exactly one VPU register) skips the dead rows.
# Correctness is inherited from the existing tile-level gate: a failed
# slab test (vs the running best t, inflated-far, <=) proves the block
# cannot beat that ray's (t, id) winner, ties included.
# MEASURED SLOWER (frog 1080p depth-8: 235 -> 492 ms at MK_CHUNK=8):
# the ~64 scalar `pl.when` predicates per visit cost far more than the
# skipped register-ops — same lesson as the ordered bounce scan; kept
# behind the flag as a recorded negative result.
_CHUNK_ROWS = int(_os.environ.get("MK_CHUNK", "0"))

# Sublane-chunk gating for the EMIT (camera) pass's flat-scan visits
# and shadow walks.  Unlike the round-1 MK_CHUNK=8 negative (64 scalar
# preds/visit), coarse chunks add only RAY_TILE/chunk preds; the camera
# pass has whole sky row-chunks and best-t-pruned rows that the tile-
# level any-gate cannot skip (hull proxy: 43.5% -> 33.2% pairs kept at
# chunk 256 on top of 128-lane quarters, probe_chunk_quarter_gate.py).
# Rows per chunk; 0 = off.  Read once at import (jit-cache masking).
_EMIT_CHUNK = int(_os.environ.get("RT_EMIT_CHUNK", "0"))

# Triangle-axis (quarter-block) gating of the dense visits: each
# 512-triangle block is split into NQ Morton-contiguous 128-lane
# quarters with their own AABBs; a firing visit slab-tests each quarter
# against the tile and runs the (RT, 128) Moller-Trumbore only for
# quarters some ray can reach.  This cuts ray-triangle pairs BELOW the
# tile-union bound the roofline note treats as this design's floor:
# the corner-ray hull proxy keeps only 43.5% of dense pairs at
# 128-lane quarters on the frog camera pass (2.3x pair cut,
# scripts/probe_quarter_gate.py), and the in-kernel per-ray any-reduce
# gate is strictly tighter.  Winner updates stay bit-exact: quarters
# are combined through the same lexicographic (t, global id) take rule,
# and min is an exact reduction, so the winner — and the image — is
# bit-identical to the ungated visit.  RT_QUARTER sets the sub-block
# lane width (0 disables; "1" = the 128-lane default).
# DEFAULT OFF since round 4: the round-3 win did not reproduce on the
# driver bench — the 16-frame steady state measures 55.3 ms ungated vs
# 61.0 at 128-lane quarters vs 56.4 at 256 (the 2.3x hull-level pair
# cut does not pay for the per-quarter slab tests + pipeline restarts
# on mostly-active firing visits; same lesson as RT_PK_QUARTER and the
# emit chunk gate).  "1" restores the 128-lane gate.
_QUARTER_RAW = _os.environ.get("RT_QUARTER", "0")
_QUARTER_LANES = (0 if _QUARTER_RAW == "0"
                  else 128 if _QUARTER_RAW == "1" else int(_QUARTER_RAW))


def quarters_for(block_size: int) -> int:
    """Static quarter count for a block size (1 = gating disabled)."""
    if (_QUARTER_LANES and block_size % _QUARTER_LANES == 0
            and block_size >= 2 * _QUARTER_LANES):
        return block_size // _QUARTER_LANES
    return 1

_INV_PI = 0.31830988618
_INV_2PI = 0.15915494309
_U32 = jnp.uint32
_INV_U32_MAX = np.float32(1.0) / np.float32(0xFFFFFFFF)


def megakernel_kwargs(scene, jitter_mode: str) -> dict:
    """The dialect-specific static kwargs for ``render_tiles`` — ONE
    definition shared by every dispatch site (render_scene and the
    sharded fast path), so single-chip and sharded renders can never
    drift apart on eps families or sampling statics."""
    if scene.dialect != "cpuonly":
        return {}
    from .intersect import FLT_EPSILON
    from .shading import RT_EPS_CPUONLY

    return dict(
        dialect="cpuonly", jitter=jitter_mode,
        shadow_samples=int(scene.lights.max_shadow_samples()),
        det_eps=FLT_EPSILON, shadow_eps=RT_EPS_CPUONLY,
        shadow_tmin=RT_EPS_CPUONLY,
    )


def megakernel_ineligible_reason(scene, jitter_mode: str):
    """Why a scene falls off the fused fast path (None = eligible).

    The reasons matter operationally: the staged/XLA fallbacks are
    correct but ~10x slower, so drivers surface this string instead of
    silently degrading (round-3 verdict #7)."""
    if scene.accel is None:
        return "no block-grid accel (accel=None)"
    if not fits_vmem(scene.accel):
        return "triangle planes exceed the kernel VMEM budget"
    if getattr(scene, "differentiable", False):
        # detached-diff scenes differentiate through the staged
        # integrator; the fused kernels are not differentiable
        return "differentiable scene (staged integrator only)"
    if scene.dialect == "gpu":
        if jitter_mode != "wang":
            return f"gpu dialect with jitter_mode={jitter_mode!r} (needs 'wang')"
        return None
    if scene.dialect == "cpuonly":
        # soft-shadow walks unroll statically: keep the kernel bounded
        if jitter_mode not in ("wang", "center"):
            return (f"cpuonly dialect with jitter_mode={jitter_mode!r} "
                    "(needs 'wang'/'center')")
        if int(scene.lights.max_shadow_samples()) > 16:
            return (f"shadow_samples={int(scene.lights.max_shadow_samples())}"
                    " > 16 (static soft-shadow unroll bound)")
        return None
    return f"unknown dialect {scene.dialect!r}"


def megakernel_eligible(scene, jitter_mode: str) -> bool:
    """Static-only eligibility for the fused path (see module docstring)."""
    return megakernel_ineligible_reason(scene, jitter_mode) is None


# --- in-kernel RNG (bit-compatible with core.rng / query.h:32-48) ---


# Mosaic has no uint32 casts/bitcasts for every shape we need, so the
# uint32 streams run on int32: two's-complement add/mul/xor are
# bit-identical, and the unsigned shifts become shift_right_logical.


def _srl(h, n):
    return jax.lax.shift_right_logical(h, jnp.int32(n))


def _mix_i32(h):
    """``core.rng._mix`` on int32 bit patterns (query.h:34-41)."""
    h = (h ^ np.int32(61)) ^ _srl(h, 16)
    h = h * np.int32(9)
    h = h ^ _srl(h, 4)
    h = h * np.int32(np.uint32(0x27D4EB2D).view(np.int32))
    h = h ^ _srl(h, 15)
    return h


def _bits_to_f32(h):
    """int32 bit pattern -> float32(uint32 value), bit-exact to uitofp.

    Split into exact 16-bit halves: hi*65536 is exact in f32, so the
    single rounding happens in the final add — identical to a direct
    round-to-nearest unsigned conversion.
    """
    hi = _srl(h, 16).astype(jnp.float32)
    lo = (h & np.int32(0xFFFF)).astype(jnp.float32)
    return hi * 65536.0 + lo


def _wang_float(h):
    return _bits_to_f32(_mix_i32(h)) * _INV_U32_MAX


# --- XLA-side plan ---


def camera_tile_plan(camera, xs: Array, ys: Array, grid, ray_tile: int):
    """Sample-independent traversal plan from pixel-tile ray hulls.

    For each tile of ``ray_tile`` pixels: the camera ray direction is
    affine in the fractional pixel coords, so the jitter-inflated hull
    ([x_lo-0.5, x_hi+0.5] x [y_lo-0.5, y_hi+0.5]) has exact per-component
    direction bounds at its 4 corners.  An interval slab test of (camera
    center, direction hull) against superblock AABBs then gives a
    conservative candidate set covering EVERY sample's jittered rays.
    Entries are normalized-t lower bounds (unnormalized entry x a lower
    bound of |d|), so the kernel's front-to-back early exit stays exact.

    Returns (order (NT, LS) int32, sorted_entry (NT, LS) f32).
    """
    r = xs.shape[0]
    assert r % ray_tile == 0
    nt = r // ray_tile
    saabb = super_aabbs(grid)  # (6, LS)

    xs_t = xs.reshape(nt, ray_tile).astype(jnp.float32)
    ys_t = ys.reshape(nt, ray_tile).astype(jnp.float32)
    px_lo = jnp.min(xs_t, axis=1) - 0.5
    px_hi = jnp.max(xs_t, axis=1) + 0.5
    py_lo = jnp.min(ys_t, axis=1) - 0.5
    py_hi = jnp.max(ys_t, axis=1) + 0.5

    base = camera.pixel00_loc - camera.center  # (3,)
    du, dv = camera.pixel_delta_u, camera.pixel_delta_v
    corners = [
        base[None, :] + a[:, None] * du[None, :] + b[:, None] * dv[None, :]
        for a in (px_lo, px_hi)
        for b in (py_lo, py_hi)
    ]  # 4 x (nt, 3)
    cs = jnp.stack(corners)  # (4, nt, 3)
    d_lo = jnp.min(cs, axis=0)
    d_hi = jnp.max(cs, axis=0)

    # |d| lower bound: the largest per-axis magnitude floor
    same_sign = (d_lo > 0.0) | (d_hi < 0.0)
    axis_floor = jnp.where(
        same_sign, jnp.minimum(jnp.abs(d_lo), jnp.abs(d_hi)), 0.0
    )
    dnorm_lb = jnp.max(axis_floor, axis=1)  # (nt,)

    near_all = jnp.zeros((nt, 1), jnp.float32)
    far_all = jnp.full((nt, 1), jnp.inf, jnp.float32)
    c = camera.center
    for axis in range(3):
        blo = saabb[axis][None, :]
        bhi = saabb[axis + 3][None, :]
        dlo = d_lo[:, axis:axis + 1]
        dhi = d_hi[:, axis:axis + 1]
        spans0 = (dlo <= 0.0) & (dhi >= 0.0)
        inv_a, inv_b = 1.0 / dhi, 1.0 / dlo  # same-sign interval reciprocal
        ca = blo - c[axis]
        cb = bhi - c[axis]
        cands = [ca * inv_a, ca * inv_b, cb * inv_a, cb * inv_b]
        near = jnp.minimum(jnp.minimum(cands[0], cands[1]),
                           jnp.minimum(cands[2], cands[3]))
        far = jnp.maximum(jnp.maximum(cands[0], cands[1]),
                          jnp.maximum(cands[2], cands[3]))
        near = near - jnp.abs(near) * 4e-7  # rounding slack, conservative
        far = far + jnp.abs(far) * 4e-7
        bad = spans0 | jnp.isnan(near) | jnp.isnan(far)
        near_all = jnp.maximum(near_all, jnp.where(bad, -jnp.inf, near))
        far_all = jnp.minimum(far_all, jnp.where(bad, jnp.inf, far))

    valid_box = (saabb[0] <= saabb[3])[None, :]
    hit = (near_all <= far_all) & (far_all >= 0.0) & valid_box
    entry = jnp.maximum(near_all, 0.0) * dnorm_lb[:, None]
    entry = jnp.where(hit, entry, jnp.inf)
    order = jnp.argsort(entry, axis=1).astype(jnp.int32)
    sorted_entry = jnp.take_along_axis(entry, order, axis=1).astype(jnp.float32)
    return order, sorted_entry


# --- kernel building blocks ---
#
# The closest-hit walk, direct-lighting shade, and RR bounce step are
# factory functions closing over explicit ref/const arguments so the
# SAME Mosaic bodies serve every kernel built from them: the fused
# megakernel below and the staged wavefront kernels (kernel P / kernel
# B) that add XLA-side compaction between bounces.


def _interp_normal(nrm, u, v):
    """Raw (unnormalized) interpolated vertex normal — the only part of
    the shading-normal computation that genuinely needs the dense
    per-(ray, triangle) grid; everything downstream operates on the
    winner's selected values (``_finish_shading_normal``)."""
    n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z = nrm[:9]
    w = 1.0 - u - v
    snx = w * n0x + u * n1x + v * n2x
    sny = w * n0y + u * n1y + v * n2y
    snz = w * n0z + u * n1z + v * n2z
    return snx, sny, snz


def _finish_shading_normal(dialect, d_vec, sn, g):
    """Normalize/sidedness/hemisphere logic of the shading normal on
    already-selected winner values (any elementwise layout).

    - gpu: geometric sidedness + hemisphere alignment + zero-length
      interpolation fallback (``query.h:113-126``).
    - cpuonly: face normal decides sidedness; shading normal is the
      normalized interpolation flipped to that side
      (``CPUOnly/include/ray.h:76-92``; ``make_hit_frame`` mode
      "cpuonly").
    """
    snx, sny, snz = sn
    gx, gy, gz = g
    dx, dy, dz = d_vec
    dg = dx * gx + dy * gy + dz * gz
    gsign = jnp.where(dg < 0.0, 1.0, -1.0)
    len_sq = snx * snx + sny * sny + snz * snz
    if dialect == "cpuonly":
        inv_len = jax.lax.rsqrt(jnp.maximum(len_sq, 1e-24))
        s = inv_len * gsign
        return snx * s, sny * s, snz * s
    ogx, ogy, ogz = gx * gsign, gy * gsign, gz * gsign
    inv_len = jax.lax.rsqrt(jnp.maximum(len_sq, 1e-38))
    use_geom = len_sq < 1e-12
    snx = jnp.where(use_geom, ogx, snx * inv_len)
    sny = jnp.where(use_geom, ogy, sny * inv_len)
    snz = jnp.where(use_geom, ogz, snz * inv_len)
    flip = (snx * ogx + sny * ogy + snz * ogz) < 0.0
    fsign = jnp.where(flip, -1.0, 1.0)
    return snx * fsign, sny * fsign, snz * fsign


def _shading_normal(dialect, d_vec, nrm, u, v):
    """Winner-triangle shading normal for one dense visit (the fused
    dense form; production visits select first and call
    ``_finish_shading_normal`` on the winner instead)."""
    snx, sny, snz = _interp_normal(nrm, u, v)
    return _finish_shading_normal(dialect, d_vec, (snx, sny, snz),
                                  nrm[9:12])


def _make_traverse(det_eps, tmin, num_blocks, num_supers, row,
                   tri_ref, norm_ref, ids_ref, obj_ref, aabb_ref, alane_ref,
                   order_ref, entry_ref,
                   t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
                   chunk=0, col_scr=None, dialect="gpu", qsel_ref=None,
                   mm_f32_dot=False, qaabb_ref=None, nq=1, binned=None,
                   uv_scr=None):
    rt = t_col.shape[0]
    # quarter-major layout: with the triangle-axis gate on, operand
    # rows are 128-lane QUARTERS (row (k*L + b)*nq + q); nq == 1 makes
    # a quarter the whole block and reproduces the original layout, so
    # all addressing below is uniform in the quarter index bq.
    qs = ids_ref.shape[1]  # lanes per quarter row
    nrows = num_blocks * nq  # quarter rows per plane
    int_max = np.int32(2**31 - 1)
    tmin_l = jnp.full((1, rt), tmin, jnp.float32)
    tmin_c = jnp.full((rt, 1), tmin, jnp.float32)
    if chunk:
        blk_c = col_scr[1]  # (RT, 1) int32 winner-block column
        tmin_ch = jnp.full((chunk, 1), tmin, jnp.float32)

    def traverse(o_sc, o_l, d_c, d_l, use_plan, active_l):
        """Closest hit into the t/idx/normal/obj scratches.

        ``o_sc`` may be scalars (shared-origin primaries; then the dense
        test broadcasts) or (RT, 1) columns.  ``use_plan`` walks the
        sorted superblock plan front-to-back with entry early-exit;
        ``"binned"`` streams the tile's precomputed candidate chunks
        from HBM (``ops.binned``, requires the ``binned`` closure refs);
        otherwise (incoherent bounce wavefronts) a flat block scan.
        """
        dx_c, dy_c, dz_c = d_c
        inv_l = (1.0 / d_l[0], 1.0 / d_l[1], 1.0 / d_l[2])
        t_col[:] = jnp.full((rt, 1), F32_MAX, jnp.float32)
        idx_col[:] = jnp.full((rt, 1), -1, jnp.int32)
        t_lane[:] = jnp.full((1, rt), F32_MAX, jnp.float32)
        blk_win[:] = jnp.full((1, rt), int_max, jnp.int32)
        nx_l[:] = jnp.zeros((1, rt), jnp.float32)
        ny_l[:] = jnp.zeros((1, rt), jnp.float32)
        nz_l[:] = jnp.ones((1, rt), jnp.float32)
        obj_l[:] = jnp.zeros((1, rt), jnp.int32)
        if uv_scr is not None:
            uv_scr[0][:] = jnp.zeros((1, rt), jnp.float32)
            uv_scr[1][:] = jnp.zeros((1, rt), jnp.float32)
        chunked = chunk and not use_plan
        if chunked and jnp.ndim(o_sc[0]) == 0:
            # chunked visits slice (RT, 1) origin columns; expand a
            # shared scalar origin (flat-scan camera pass) from the
            # lane copy.  Dead lanes' parked origins only affect their
            # own discarded winner state (alive masks gate all reads).
            o_sc = (_to_col(o_l[0]), _to_col(o_l[1]), _to_col(o_l[2]))
        if chunked:
            blk_c[:] = jnp.full((rt, 1), int_max, jnp.int32)

        def _visit_cols(bq):
            """Dense test + winner update on one quarter row (the whole
            block when nq == 1).  Sequential per-quarter updates through
            the same lexicographic (t, global id) take rule compute
            exactly the block-at-once winner — min is an exact
            reduction — so gating never shifts a bit."""
            tri = tuple(
                tri_ref[pl.ds(k_ * nrows + bq, 1), :] for k_ in range(9)
            )
            ids = ids_ref[pl.ds(bq, 1), :]  # (1, QS)
            t, u, v = _mt_block(o_sc, d_c, tri, det_eps, tmin_c, t_col[:])
            t = jnp.where(ids >= 0, t, F32_MAX)
            min_t = jnp.min(t, axis=1, keepdims=True)
            if _DEBUG_DENSE_ONLY:
                # timing bisect: raw dense math + reduction, no winner
                # bookkeeping (results are wrong; timing only)
                t_col[:] = jnp.minimum(t_col[:], min_t)
                return
            at_min = t == min_t
            id_key = jnp.where(at_min & (ids >= 0), ids, int_max)
            best_id = jnp.min(id_key, axis=1, keepdims=True)
            old_t = t_col[:]
            old_idx = idx_col[:]
            old_key = jnp.where(old_idx >= 0, old_idx, int_max)
            take = (min_t < F32_MAX) & (
                (min_t < old_t) | ((min_t == old_t) & (best_id < old_key))
            )

            if _DEBUG_SKIP_ATTRS:
                @pl.when(jnp.any(take))
                def _():
                    new_t = jnp.where(take, min_t, old_t)
                    t_col[:] = new_t
                    idx_col[:] = jnp.where(take, best_id, old_idx)
                    t_lane[:] = _to_lane(new_t)
                return

            def _take_body():
                new_t = jnp.where(take, min_t, old_t)
                t_col[:] = new_t
                idx_col[:] = jnp.where(take, best_id, old_idx)
                t_lane[:] = _to_lane(new_t)
                take_l = _to_lane(jnp.where(take, 1.0, 0.0)) > 0.0
                # attrs are DEFERRED: record only the winner's quarter
                # row; the resolve pass after the walk rebuilds pick
                # from the (unique) global triangle ids and computes the
                # attributes once per DISTINCT winner quarter (~5/tile)
                # instead of per improving visit (~20/tile).  Attrs
                # are consumed only after traverse returns, so this is
                # bit-exact by construction.
                blk_win[:] = jnp.where(take_l, bq, blk_win[:])

            if _NO_WHEN:
                _take_body()
            else:
                pl.when(jnp.any(take))(_take_body)

        def visit_block(b):
            if nq == 1:
                _visit_cols(b)
                return
            # triangle-axis gate: only quarters some ray can reach run
            # their (RT, QS) dense test (see the RT_QUARTER note above)
            for q in range(nq):
                boxed_q = _tile_slab(qaabb_ref, b * nq + q, o_l, inv_l,
                                     tmin_l, t_lane[:]) & active_l
                pl.when(jnp.any(boxed_q))(partial(_visit_cols,
                                                  b * nq + q))

        def visit_block_chunked(b, boxed_col):
            """Dense test gated per ``chunk`` sublane rows.

            ``boxed_col`` is the (RT, 1) f32 slab mask: rows whose slab
            test failed cannot improve, so whole row-chunks with no
            passing ray skip their share of the (RT, B) register-ops.
            Winner ATTRIBUTES are deferred exactly like the unchunked
            visit (the round-2 inline-attr variant lost; git history):
            each chunk only updates (t, id) and records the winner's
            block in the blk_c column; the resolve pass after the walk
            reads blk_win and does the attribute selection once per
            distinct winner block.  t_lane is refreshed once per visit
            for the caller's slab pruning.
            """
            def _quarter_chunks(bq):
                tri = tuple(
                    tri_ref[pl.ds(k_ * nrows + bq, 1), :]
                    for k_ in range(9)
                )
                ids = ids_ref[pl.ds(bq, 1), :]  # (1, QS)
                for c in range(rt // chunk):
                    lo = c * chunk
                    pred = jnp.sum(boxed_col[lo:lo + chunk, :]) > 0.0

                    @pl.when(pred)
                    def _(lo=lo):
                        old_t = t_col[pl.ds(lo, chunk), :]
                        old_idx = idx_col[pl.ds(lo, chunk), :]
                        o_ch = tuple(x[lo:lo + chunk, :] for x in o_sc)
                        d_ch = tuple(x[lo:lo + chunk, :] for x in d_c)
                        t, u, v = _mt_block(o_ch, d_ch, tri, det_eps,
                                            tmin_ch, old_t)
                        t = jnp.where(ids >= 0, t, F32_MAX)
                        min_t = jnp.min(t, axis=1, keepdims=True)
                        at_min = t == min_t
                        id_key = jnp.where(at_min & (ids >= 0), ids,
                                           int_max)
                        best_id = jnp.min(id_key, axis=1, keepdims=True)
                        old_key = jnp.where(old_idx >= 0, old_idx, int_max)
                        take = (min_t < F32_MAX) & (
                            (min_t < old_t)
                            | ((min_t == old_t) & (best_id < old_key))
                        )

                        @pl.when(jnp.any(take))
                        def _():
                            sl = pl.ds(lo, chunk)
                            t_col[sl, :] = jnp.where(take, min_t, old_t)
                            idx_col[sl, :] = jnp.where(take, best_id,
                                                       old_idx)
                            blk_c[sl, :] = jnp.where(take, bq,
                                                     blk_c[sl, :])

            if nq == 1:
                _quarter_chunks(b)
            else:
                # triangle-axis gate on top of the row-chunk gate: a
                # skipped quarter is one no ray in the TILE can reach
                for q in range(nq):
                    boxed_q = _tile_slab(qaabb_ref, b * nq + q, o_l,
                                         inv_l, tmin_l, t_lane[:]
                                         ) & active_l
                    pl.when(jnp.any(boxed_q))(partial(_quarter_chunks,
                                                      b * nq + q))

            t_lane[:] = _to_lane(t_col[:])

        if _DEBUG_SKIP_TRAVERSAL:
            return
        if use_plan == "binned":
            # --- binned candidate walk (ops.binned): stream this
            # tile's precomputed candidate chunks from HBM through a
            # double buffer; each chunk is a dense (RT, C) visit with
            # the standard lexicographic (t, global id) winner update.
            # No slab gates: the plan IS the culling (probe: 14.8x
            # fewer padded pairs than the tile-union block walk).
            cs_hbm, meta_ref, cand_buf, cand_sem = binned
            crows = cand_buf.shape[1]
            start = meta_ref[row, 0]
            cnt = meta_ref[row, 1]

            def b_issue(slot, k):
                # clamped so the unconditional prefetch of the pattern
                # (pre-issue + drain) stays in range for cnt == 0 tiles
                kk = jnp.maximum(jnp.minimum(k, cnt - 1), 0)
                pltpu.make_async_copy(
                    cs_hbm.at[pl.ds((start + kk) * crows, crows), :],
                    cand_buf.at[slot], cand_sem.at[slot],
                ).start()

            def b_wait(slot):
                pltpu.make_async_copy(
                    cs_hbm.at[pl.ds(0, crows), :], cand_buf.at[slot],
                    cand_sem.at[slot],
                ).wait()

            b_issue(0, jnp.int32(0))

            def b_body(k):
                slot = jax.lax.rem(k, 2)
                b_wait(slot)
                b_issue(1 - slot, k + 1)
                tri = tuple(
                    cand_buf[slot, pl.ds(k_, 1), :] for k_ in range(9)
                )
                # exact-integer f32 rows -> int32 (values < 2^24)
                ids = cand_buf[slot, pl.ds(9, 1), :].astype(jnp.int32)
                home = cand_buf[slot, pl.ds(10, 1), :]
                t, u, v = _mt_block(o_sc, d_c, tri, det_eps, tmin_c,
                                    t_col[:])
                t = jnp.where(ids >= 0, t, F32_MAX)
                min_t = jnp.min(t, axis=1, keepdims=True)
                at_min = t == min_t
                id_key = jnp.where(at_min & (ids >= 0), ids, int_max)
                best_id = jnp.min(id_key, axis=1, keepdims=True)
                old_t = t_col[:]
                old_idx = idx_col[:]
                old_key = jnp.where(old_idx >= 0, old_idx, int_max)
                take = (min_t < F32_MAX) & (
                    (min_t < old_t)
                    | ((min_t == old_t) & (best_id < old_key))
                )

                @pl.when(jnp.any(take))
                def _():
                    new_t = jnp.where(take, min_t, old_t)
                    t_col[:] = new_t
                    idx_col[:] = jnp.where(take, best_id, old_idx)
                    t_lane[:] = _to_lane(new_t)
                    # winner home rows vary per lane here (a chunk
                    # mixes triangles from different blocks): select
                    # the winning lane's home with the same unique-id
                    # one-hot the deferred resolve uses
                    pick = at_min & (id_key == best_id)
                    home_w = jnp.sum(jnp.where(pick, home, 0.0),
                                     axis=1, keepdims=True)
                    take_l = _to_lane(jnp.where(take, 1.0, 0.0)) > 0.0
                    blk_win[:] = jnp.where(
                        take_l, _to_lane(home_w).astype(jnp.int32),
                        blk_win[:])

                return k + 1

            k_end = jax.lax.while_loop(lambda k: k < cnt, b_body,
                                       jnp.int32(0))
            b_wait(jax.lax.rem(k_end, 2))  # drain the prefetch
        elif use_plan:
            def cond(k):
                in_range = k < num_supers
                next_entry = entry_ref[row, jnp.minimum(k, num_supers - 1)]
                return in_range & (next_entry <= jnp.max(t_lane[:]))

            def body(k):
                sb = order_ref[row, k]
                for j in range(SUPER):
                    b = sb * SUPER + j
                    b_c = jnp.minimum(b, num_blocks - 1)
                    boxed = _tile_slab(aabb_ref, b_c, o_l, inv_l, tmin_l,
                                       t_lane[:]) & active_l
                    do_visit = jnp.any(boxed) & (b < num_blocks)
                    if _DEBUG_SKIP_DENSE:
                        continue

                    @pl.when(do_visit)
                    def _():
                        visit_block(b_c)

                return k + 1

            jax.lax.while_loop(cond, body, jnp.int32(0))
        elif not _ORDERED_BOUNCE_SCAN:
            # Default bounce path: flat scan of every block with lane
            # slab culling.  The static induction variable lets Mosaic
            # pipeline the strided tri/norm reads; measured FASTER than
            # the ordered scan below (frog 1080p depth-8: 235 vs 268 ms).
            def f_cond(k):
                return k < num_blocks

            def f_body(k):
                boxed = _tile_slab(aabb_ref, k, o_l, inv_l, tmin_l,
                                   t_lane[:]) & active_l
                if not (_DEBUG_SKIP_DENSE
                        or (_DEBUG_SKIP_DENSE_BOUNCE and not use_plan)):
                    @pl.when(jnp.any(boxed))
                    def _():
                        if chunked:
                            visit_block_chunked(
                                k, _to_col(jnp.where(boxed, 1.0, 0.0)))
                        else:
                            visit_block(k)

                return k + 1

            jax.lax.while_loop(f_cond, f_body, jnp.int32(0))
            if chunked:
                # hand the chunked walk's winner blocks to the shared
                # deferred-attribute resolve pass below (int32 relayouts
                # are cheap; see the layout notes in docs/DESIGN.md)
                blk_win[:] = _to_lane(blk_c[:])
        else:
            # MK_ORDERED_SCAN=1: centroid-ordered near-to-far scan.
            # Per-block conservative entry bound: euclidean distance from
            # the alive-origin centroid c to the block AABB minus the max
            # origin spread — for unit directions, a hit in block B by
            # alive lane i has t >= dist(o_i, B) >= dist(c, B) -
            # ||o_i - c||.  Visiting near blocks first tightens best-t
            # early, and the scan provably ends once the nearest
            # remaining block is beyond every alive lane's best t — the
            # bounce-wavefront analog of the plan's front-to-back exit.
            # MEASURED SLOWER than the flat scan on frog depth-8 (the
            # data-dependent block index defeats Mosaic's read
            # pipelining and diffuse wavefronts are too scattered for
            # the exit to fire); kept behind the flag for re-testing on
            # scenes with many more blocks.  Results are bit-identical
            # (closest-hit ties break on (t, triangle id)).
            act_f = jnp.where(active_l, 1.0, 0.0)
            cnt = jnp.maximum(jnp.sum(act_f), 1.0)
            ocx = jnp.sum(act_f * o_l[0]) / cnt
            ocy = jnp.sum(act_f * o_l[1]) / cnt
            ocz = jnp.sum(act_f * o_l[2]) / cnt
            # mask the deltas BEFORE squaring: parked origins are 1e30,
            # whose square overflows to inf and 0*inf = NaN would poison
            # the exit comparison (NaN <= mt is False -> instant exit)
            odx = act_f * (o_l[0] - ocx)
            ody = act_f * (o_l[1] - ocy)
            odz = act_f * (o_l[2] - ocz)
            spread = jnp.sqrt(jnp.max(odx * odx + ody * ody + odz * odz))
            # (1, LB) lane-major block distances; padded lanes are huge
            ex = jnp.maximum(jnp.maximum(
                alane_ref[pl.ds(0, 1), :] - ocx,
                ocx - alane_ref[pl.ds(3, 1), :]), 0.0)
            ey = jnp.maximum(jnp.maximum(
                alane_ref[pl.ds(1, 1), :] - ocy,
                ocy - alane_ref[pl.ds(4, 1), :]), 0.0)
            ez = jnp.maximum(jnp.maximum(
                alane_ref[pl.ds(2, 1), :] - ocz,
                ocz - alane_ref[pl.ds(5, 1), :]), 0.0)
            e_vec0 = jnp.sqrt(ex * ex + ey * ey + ez * ez)
            lane_ids = jax.lax.broadcasted_iota(jnp.int32, e_vec0.shape, 1)

            def o_cond(c):
                k, e_vec = c
                mt = jnp.max(jnp.where(active_l, t_lane[:], 0.0))
                if _DEBUG_NO_DIST_EXIT:
                    return (k < num_blocks) & (jnp.min(e_vec) < jnp.inf)
                return (k < num_blocks) & (jnp.min(e_vec) - spread <= mt)

            def o_body(c):
                k, e_vec = c
                m = jnp.min(e_vec)
                b = jnp.min(jnp.where(e_vec <= m, lane_ids, int_max))
                boxed = _tile_slab(aabb_ref, b, o_l, inv_l, tmin_l,
                                   t_lane[:]) & active_l

                @pl.when(jnp.any(boxed))
                def _():
                    visit_block(b)

                return k + 1, jnp.where(lane_ids == b, jnp.inf, e_vec)

            jax.lax.while_loop(o_cond, o_body, (jnp.int32(0), e_vec0))

        # --- deferred winner-attribute resolution ---
        # One pass per DISTINCT winner block (typically ~5 against ~20
        # improving visits): rebuild the one-hot pick from the winner's
        # global triangle id (ids are unique; -1 no-hit lanes are
        # excluded), select the 22 attributes (MXU matmul, or masked
        # reductions for scenes without a qsel matrix), and run the
        # u/v + shading-normal chain with _mt_block's exact op order —
        # identical bits to resolving inside the winning visit, since
        # attributes are only consumed after traverse returns.  The
        # chunked path records winner blocks in blk_c and joins here
        # via the blk_win relayout above; debug-skip modes leave
        # blk_win at int_max so the loop no-ops.
        def r_cond(c):
            k, bw = c
            return (k < nrows) & (jnp.min(bw) < int_max)

        def r_body(c):
            k, bw = c
            b = jnp.min(bw)  # winner QUARTER row (== block when nq == 1)
            mask = blk_win[:] == b
            idxc = idx_col[:]
            ids = ids_ref[pl.ds(b, 1), :]
            pick = (ids == idxc) & (idxc >= 0)
            if qsel_ref is not None:
                qb = qsel_ref[pl.ds(b * qs, qs), :]
                if mm_f32_dot:
                    mm = jnp.dot(jnp.where(pick, 1.0, 0.0),
                                 qb.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
                else:
                    mm = jnp.dot(
                        jnp.where(pick, 1.0, 0.0).astype(jnp.bfloat16),
                        qb, preferred_element_type=jnp.float32)
                outt = mm.T  # (128, RT) — attrs land lane-major
                attr = lambda f: (outt[f:f + 1, :]
                                  + outt[32 + f:33 + f, :]
                                  + outt[64 + f:65 + f, :])
                a = [attr(f) for f in range(21)]
                obj_w = attr(21).astype(jnp.int32)
            else:
                planes = [tri_ref[pl.ds(k_ * nrows + b, 1), :]
                          for k_ in range(9)]
                planes += [norm_ref[pl.ds(k_ * nrows + b, 1), :]
                           for k_ in range(12)]
                selc = lambda q: _to_lane(jnp.sum(
                    jnp.where(pick, q, 0.0), axis=1, keepdims=True))
                a = [selc(q) for q in planes]
                objs = obj_ref[pl.ds(b, 1), :]
                obj_w = _to_lane(jnp.sum(
                    jnp.where(pick, objs, 0), axis=1, keepdims=True))
            v0x, v0y, v0z = a[0], a[1], a[2]
            e1x, e1y, e1z = a[3], a[4], a[5]
            e2x, e2y, e2z = a[6], a[7], a[8]
            dx, dy, dz = d_l
            ox, oy, oz = o_l
            # _mt_block's exact sequence on the winner values
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = 1.0 / jnp.where(jnp.abs(det) < det_eps, 1.0, det)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            u_w = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v_w = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            if uv_scr is not None:
                # diff-oracle capture: the winner's primal barycentrics
                # (consumed by the detached-diff chain's thru() rule)
                uv_scr[0][:] = jnp.where(mask, u_w, uv_scr[0][:])
                uv_scr[1][:] = jnp.where(mask, v_w, uv_scr[1][:])
            sn_w = _interp_normal(tuple(a[9:18]), u_w, v_w)
            snx, sny, snz = _finish_shading_normal(
                dialect, d_l, sn_w, (a[18], a[19], a[20]))
            nx_l[:] = jnp.where(mask, snx, nx_l[:])
            ny_l[:] = jnp.where(mask, sny, ny_l[:])
            nz_l[:] = jnp.where(mask, snz, nz_l[:])
            obj_l[:] = jnp.where(mask, obj_w, obj_l[:])
            return k + 1, jnp.where(mask, int_max, bw)

        jax.lax.while_loop(r_cond, r_body, (jnp.int32(0), blk_win[:]))

    return traverse


def _make_shade(det_eps, shadow_eps, shadow_tmin, num_blocks,
                n_lights, n_objects,
                tri_ref, ids_ref, aabb_ref, lights_ref, mats_ref,
                t_lane, nx_l, ny_l, nz_l, obj_l, blk_lane,
                chunk=0, blk_col=None,
                dialect="gpu", shadow_samples=1, rng_st=None,
                spos_scr=None, matsq_ref=None, mats_mm=0,
                qaabb_ref=None, nq=1, vis_scr=None):
    rt = t_lane.shape[1]
    nrows = num_blocks * nq  # quarter rows per plane (see _make_traverse)
    s_tmin_l = jnp.full((1, rt), shadow_tmin, jnp.float32)
    s_tmin_c = jnp.full((rt, 1), shadow_tmin, jnp.float32)
    if chunk:
        s_tmin_ch = jnp.full((chunk, 1), shadow_tmin, jnp.float32)
    cpuonly = dialect == "cpuonly"
    if cpuonly:
        assert not chunk and rng_st is not None and spos_scr is not None

    def shade(o_l, d_l, chunked=False):
        """Direct lighting at the current hit state (scratches).

        Returns (lo_rgb, hit_l, p_l): per-lane direct radiance, the hit
        mask, and the eps-offset hit points (== the reference bounce
        origin p + N*RT_EPS).

        - gpu: hard shadows, one fused IsInShadow walk per light
          (ShadeDirect, shader.h:65-110).
        - cpuonly: soft shadows — up to ``shadow_samples`` disk-sampled
          occlusion walks per area light, one for point lights
          (ShadowVisibility, CPUOnly/raytracer.h:121-168), with the
          in-kernel rejection disk sampler bit-compatible with
          ``core.rng.random_in_unit_disk``.  RNG advances commit only
          on hit lanes (the staged integrator's where(found) rule).
        """
        dx_l, dy_l, dz_l = d_l
        t_hit = t_lane[:]
        hit_l = t_hit < F32_MAX
        px_l = jnp.where(hit_l, o_l[0] + t_hit * dx_l + nx_l[:] * shadow_eps,
                         1e30)
        py_l = jnp.where(hit_l, o_l[1] + t_hit * dy_l + ny_l[:] * shadow_eps,
                         1e30)
        pz_l = jnp.where(hit_l, o_l[2] + t_hit * dz_l + nz_l[:] * shadow_eps,
                         1e30)
        vx, vy, vz = -dx_l, -dy_l, -dz_l
        nx, ny, nz = nx_l[:], ny_l[:], nz_l[:]
        ndotv = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
        obj_lane = obj_l[:]

        # ambient + emission (shader.h:82-87): per-object scalar loops
        # within MAX_OBJECTS (bit-exact legacy path), else all 13
        # material features per lane via the one-hot MXU dot (missed
        # lanes' obj == -1 selects the all-zero row -> 0 contribution,
        # matching the loop's no-mask case)
        if mats_mm:
            ml = _mat_lanes_mm(obj_lane, matsq_ref, mats_mm)
            lo_r = ml[0] * 0.05 + ml[10]
            lo_g = ml[1] * 0.05 + ml[11]
            lo_b = ml[2] * 0.05 + ml[12]
        else:
            ml = None
            lo_r = jnp.zeros((1, rt), jnp.float32)
            lo_g = jnp.zeros((1, rt), jnp.float32)
            lo_b = jnp.zeros((1, rt), jnp.float32)
            for o in range(n_objects):
                m = jnp.where(obj_lane == o, 1.0, 0.0)
                al_r, al_g, al_b = (mats_ref[o, 0], mats_ref[o, 1],
                                    mats_ref[o, 2])
                em_r, em_g, em_b = (mats_ref[o, 10], mats_ref[o, 11],
                                    mats_ref[o, 12])
                lo_r = lo_r + m * (al_r * 0.05 + em_r)
                lo_g = lo_g + m * (al_g * 0.05 + em_g)
                lo_b = lo_b + m * (al_b * 0.05 + em_b)

        so_l = (px_l, py_l, pz_l)
        so_c = (_to_col(px_l), _to_col(py_l), _to_col(pz_l))
        if vis_scr is not None:
            vis_scr[:] = jnp.zeros((1, rt), jnp.int32)

        def any_hit_walk(sd_l, si, dist, tmax_c, facing):
            """Fused occlusion walk: sets blk_lane to 1.0 on lanes whose
            shadow segment [shadow_tmin, tmax) hits anything."""
            sd_c = (_to_col(sd_l[0]), _to_col(sd_l[1]), _to_col(sd_l[2]))

            def s_cond(k):
                return (k < num_blocks) & jnp.any(
                    facing & (blk_lane[:] == 0.0))

            def _s_visit_cols(bq, boxed):
                """Any-hit dense test on one quarter row (the whole
                block when nq == 1); any-hit max-accumulation is
                order-independent, so quarter gating is exact."""
                tri = tuple(
                    tri_ref[pl.ds(k_ * nrows + bq, 1), :]
                    for k_ in range(9)
                )
                ids = ids_ref[pl.ds(bq, 1), :]
                if not chunked:
                    ts, _, _ = _mt_block(so_c, sd_c, tri, det_eps,
                                         s_tmin_c, tmax_c)
                    ts = jnp.where(ids >= 0, ts, F32_MAX)
                    s_hit = (jnp.min(ts, axis=1, keepdims=True)
                             < F32_MAX)
                    blk_lane[:] = jnp.maximum(
                        blk_lane[:],
                        _to_lane(jnp.where(s_hit, 1.0, 0.0))
                    )
                    return
                # bounce-phase shadows: same sublane-chunk gating
                # as visit_block_chunked — any-hit, so a skipped
                # chunk (no facing+unblocked+slab lane) is exact
                boxed_col = _to_col(jnp.where(boxed, 1.0, 0.0))
                for c in range(rt // chunk):
                    lo = c * chunk
                    pred = jnp.sum(boxed_col[lo:lo + chunk, :]) > 0.0

                    @pl.when(pred)
                    def _(lo=lo):
                        so_ch = tuple(
                            x[lo:lo + chunk, :] for x in so_c)
                        sd_ch = tuple(
                            x[lo:lo + chunk, :] for x in sd_c)
                        ts, _, _ = _mt_block(
                            so_ch, sd_ch, tri, det_eps, s_tmin_ch,
                            tmax_c[lo:lo + chunk, :])
                        ts = jnp.where(ids >= 0, ts, F32_MAX)
                        s_hit = (jnp.min(ts, axis=1, keepdims=True)
                                 < F32_MAX)
                        sl = pl.ds(lo, chunk)
                        blk_col[sl, :] = jnp.maximum(
                            blk_col[sl, :],
                            jnp.where(s_hit, 1.0, 0.0))

                blk_lane[:] = _to_lane(blk_col[:])

            def s_body(k):
                boxed = (
                    _tile_slab(aabb_ref, k, so_l, si, s_tmin_l, dist)
                    & facing & (blk_lane[:] == 0.0)
                )

                @pl.when(jnp.any(boxed))
                def _():
                    if nq == 1:
                        _s_visit_cols(k, boxed)
                        return
                    for q in range(nq):
                        boxed_q = (
                            _tile_slab(qaabb_ref, k * nq + q, so_l, si,
                                       s_tmin_l, dist)
                            & facing & (blk_lane[:] == 0.0)
                        )
                        pl.when(jnp.any(boxed_q))(partial(
                            _s_visit_cols, k * nq + q, boxed_q))

                return k + 1

            if not _DEBUG_SKIP_SHADOW:
                jax.lax.while_loop(s_cond, s_body, jnp.int32(0))

        def disk_sample():
            """Lockstep rejection sampler: uniform point in the unit
            disk, advancing rng_st in place — stream-exact
            ``core.rng.random_in_unit_disk`` (raytracer.h:77-85)."""
            zeros = jnp.zeros((1, rt), jnp.float32)

            def du_cond(c):
                k, _x, _y, acc_f = c
                return (k < 64) & ~jnp.all(acc_f > 0.0)

            def du_body(c):
                k, x, y, acc_f = c
                acc = acc_f > 0.0
                s0 = rng_st[:]
                s1 = s0 * np.int32(1664525) + np.int32(1013904223)
                xx = 2.0 * _wang_float(s1) - 1.0
                s2 = s1 * np.int32(1664525) + np.int32(1013904223)
                yy = 2.0 * _wang_float(s2) - 1.0
                r2 = xx * xx + yy * yy
                ok = (r2 > 1e-10) & (r2 <= 1.0)
                take = ok & ~acc
                x = jnp.where(take, xx, x)
                y = jnp.where(take, yy, y)
                rng_st[:] = jnp.where(acc, s0, s2)
                return k + 1, x, y, jnp.where(acc | ok, 1.0, 0.0)

            _, x, y, _ = jax.lax.while_loop(
                du_cond, du_body, (jnp.int32(0), zeros, zeros, zeros))
            return x, y

        def brdf_add(lo_rgb, rad_rgb, ldir, ndotl, vis):
            """Per-object normalized Blinn-Phong + Lambert contribution
            (brdf.h:12-40), scaled by ndotl * vis * lit."""
            lo_r, lo_g, lo_b = lo_rgb
            rad_r, rad_g, rad_b = rad_rgb
            ldx, ldy, ldz = ldir
            hx, hy, hz = ldx + vx, ldy + vy, ldz + vz
            hlen = jnp.sqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-38))
            ndoth = jnp.maximum((nx * hx + ny * hy + nz * hz) / hlen, 0.0)
            lit = jnp.where((ndotl > 0.0) & (ndotv > 0.0), 1.0, 0.0)
            scale = ndotl * vis * lit

            if mats_mm:
                # per-lane features (one pow for the whole tile instead
                # of one per object); unlit/missed lanes have scale == 0
                al_r, al_g, al_b, kd = ml[0], ml[1], ml[2], ml[3]
                sp_r, sp_g, sp_b, ks, shin = (ml[4], ml[5], ml[6], ml[7],
                                              ml[8])
                lobe = jnp.power(ndoth, shin) * ((shin + 2.0) * _INV_2PI * ks)
                fd = kd * _INV_PI
                lo_r = lo_r + scale * rad_r * (al_r * fd + sp_r * lobe)
                lo_g = lo_g + scale * rad_g * (al_g * fd + sp_g * lobe)
                lo_b = lo_b + scale * rad_b * (al_b * fd + sp_b * lobe)
                return lo_r, lo_g, lo_b

            for o in range(n_objects):
                m = jnp.where(obj_lane == o, 1.0, 0.0) * scale
                al_r, al_g, al_b = (mats_ref[o, 0], mats_ref[o, 1],
                                    mats_ref[o, 2])
                kd = mats_ref[o, 3]
                sp_r, sp_g, sp_b = (mats_ref[o, 4], mats_ref[o, 5],
                                    mats_ref[o, 6])
                ks = mats_ref[o, 7]
                shin = mats_ref[o, 8]
                lobe = jnp.power(ndoth, shin) * ((shin + 2.0) * _INV_2PI * ks)
                fd = kd * _INV_PI
                lo_r = lo_r + m * rad_r * (al_r * fd + sp_r * lobe)
                lo_g = lo_g + m * rad_g * (al_g * fd + sp_g * lobe)
                lo_b = lo_b + m * rad_b * (al_b * fd + sp_b * lobe)
            return lo_r, lo_g, lo_b

        if cpuonly:
            saved_rng = rng_st[:]
        for li in range(n_lights):
            lx = lights_ref[li, 0]
            ly = lights_ref[li, 1]
            lz = lights_ref[li, 2]
            rad_rgb = (lights_ref[li, 3], lights_ref[li, 4],
                       lights_ref[li, 5])
            tox, toy, toz = lx - px_l, ly - py_l, lz - pz_l
            dist = jnp.sqrt(jnp.maximum(tox * tox + toy * toy + toz * toz,
                                        1e-38 if not cpuonly else 1e-24))
            inv_dist = 1.0 / dist
            ldx, ldy, ldz = tox * inv_dist, toy * inv_dist, toz * inv_dist

            # backfacing lanes (N.L<=0 or N.V<=0) contribute zero no
            # matter what visibility says (the brdf lit gate + ndotl
            # scale), so they never spawn shadow work
            ndotl = jnp.maximum(nx * ldx + ny * ldy + nz * ldz, 0.0)
            facing = hit_l & (ndotl > 0.0) & (ndotv > 0.0)

            if not cpuonly:
                blk_lane[:] = jnp.zeros((1, rt), jnp.float32)
                if chunked:
                    blk_col[:] = jnp.zeros((rt, 1), jnp.float32)
                any_hit_walk((ldx, ldy, ldz),
                             (1.0 / ldx, 1.0 / ldy, 1.0 / ldz),
                             dist, _to_col(dist), facing)
                vis = jnp.where(facing & (blk_lane[:] == 0.0), 1.0, 0.0)
                if vis_scr is not None:
                    # diff-oracle capture: per-light unoccluded bit
                    vis_scr[:] = vis_scr[:] | jnp.where(
                        vis > 0.0, np.int32(1 << li), np.int32(0))
                lo_r, lo_g, lo_b = brdf_add(
                    (lo_r, lo_g, lo_b), rad_rgb, (ldx, ldy, ldz),
                    ndotl, vis)
                continue

            # --- cpuonly soft shadows (ShadowVisibility) ---
            radius = lights_ref[li, 6]
            is_area = radius > 0.0  # one scalar per light
            spx, spy, spz, unocc = spos_scr

            # disk basis around w = (p - light)/|p - light|
            # (make_basis, raytracer.h:88-93)
            wx, wy, wz = -ldx, -ldy, -ldz
            use_y = jnp.abs(wx) > 0.9
            a0 = jnp.where(use_y, 0.0, 1.0)
            a1 = jnp.where(use_y, 1.0, 0.0)
            tx = a1 * wz
            ty = -a0 * wz
            tz = a0 * wy - a1 * wx
            t_inv = jax.lax.rsqrt(tx * tx + ty * ty + tz * tz)
            tx, ty, tz = tx * t_inv, ty * t_inv, tz * t_inv
            bx = wy * tz - wz * ty
            by = wz * tx - wx * tz
            bz = wx * ty - wy * tx

            unocc[:] = jnp.zeros((1, rt), jnp.float32)

            def soft_sample(jittered):
                """One shadow sample: walk toward spos_scr, count the
                unoccluded lanes (active rule: every sample for area
                lights, only the first otherwise)."""
                stx, sty, stz = tox, toy, toz
                if jittered:
                    stx = spx[:] - px_l
                    sty = spy[:] - py_l
                    stz = spz[:] - pz_l
                d_s = jnp.sqrt(jnp.maximum(
                    stx * stx + sty * sty + stz * stz, 1e-24))
                inv_s = 1.0 / d_s
                sldx, sldy, sldz = stx * inv_s, sty * inv_s, stz * inv_s
                blk_lane[:] = jnp.zeros((1, rt), jnp.float32)
                any_hit_walk((sldx, sldy, sldz),
                             (1.0 / sldx, 1.0 / sldy, 1.0 / sldz),
                             d_s, _to_col(d_s - shadow_eps), facing)
                unocc[:] = unocc[:] + jnp.where(
                    blk_lane[:] == 0.0, 1.0, 0.0)

            def place_disk_sample():
                dxs, dys = disk_sample()
                spx[:] = lx + (tx * dxs + bx * dys) * radius
                spy[:] = ly + (ty * dxs + by * dys) * radius
                spz[:] = lz + (tz * dxs + bz * dys) * radius

            for s in range(shadow_samples):
                if s == 0:
                    @pl.when(is_area)
                    def _():
                        place_disk_sample()
                        soft_sample(True)

                    @pl.when(~is_area)
                    def _():
                        soft_sample(False)
                else:
                    # extra samples exist only for area lights
                    # (S==1 effectively for point lights,
                    # raytracer.h:126-127); their RNG draws likewise
                    @pl.when(is_area)
                    def _(s=s):
                        place_disk_sample()
                        soft_sample(True)

            denom = jnp.where(is_area, np.float32(shadow_samples),
                              np.float32(1.0))
            vis = unocc[:] / denom
            lo_r, lo_g, lo_b = brdf_add(
                (lo_r, lo_g, lo_b), rad_rgb, (ldx, ldy, ldz), ndotl, vis)

        if cpuonly:
            # the staged integrator commits shadow-sampling RNG only on
            # hit lanes (state = where(found, state_direct, state))
            rng_st[:] = jnp.where(hit_l, rng_st[:], saved_rng)

        return (lo_r, lo_g, lo_b), hit_l, (px_l, py_l, pz_l)

    return shade


def _make_rng_hemisphere(rng_st, hm_x, hm_y, hm_z):
    """Per-lane RNG advance + lockstep hemisphere rejection sampler over
    the given state scratches."""

    def rng_next_lane():
        """Advance the rng scratch; returns (new_state, float)."""
        s1 = rng_st[:] * np.int32(1664525) + np.int32(1013904223)
        return s1, _wang_float(s1)

    def hemisphere(n_l):
        """random_on_hemisphere for every lane (query.h:51-71):
        lockstep rejection rounds; accepted lanes stop consuming
        their stream, exactly like the scalar loop.  Results land in
        the hm_* scratches; rng_st advances in place.

        The acceptance mask rides the loop CARRY, not a scratch ref:
        interpret-mode ``while_loop`` conds see the STALE entry value
        of refs mutated in the body (Mosaic conds see fresh values),
        so a ref-read cond would never terminate under interpret.
        The 64-round cap is unreachable (P(reject^64) ~ 1e-21/lane)
        and only guards against a degenerate stream.
        """
        rt = rng_st.shape[1]

        def ru_cond(c):
            k, acc_f = c
            return (k < 64) & ~jnp.all(acc_f > 0.0)

        def ru_body(c):
            k, acc_f = c
            acc = acc_f > 0.0
            s0 = rng_st[:]
            s1 = s0 * np.int32(1664525) + np.int32(1013904223)
            x = 2.0 * _wang_float(s1) - 1.0
            s2 = s1 * np.int32(1664525) + np.int32(1013904223)
            y = 2.0 * _wang_float(s2) - 1.0
            s3 = s2 * np.int32(1664525) + np.int32(1013904223)
            z = 2.0 * _wang_float(s3) - 1.0
            lensq = x * x + y * y + z * z
            ok = (lensq > 1e-10) & (lensq <= 1.0)
            inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-10))
            take = ok & ~acc
            hm_x[:] = jnp.where(take, x * inv, hm_x[:])
            hm_y[:] = jnp.where(take, y * inv, hm_y[:])
            hm_z[:] = jnp.where(take, z * inv, hm_z[:])
            rng_st[:] = jnp.where(acc, s0, s3)
            return k + 1, jnp.where(acc | ok, 1.0, 0.0)

        jax.lax.while_loop(
            ru_cond, ru_body,
            (jnp.int32(0), jnp.zeros((1, rt), jnp.float32)),
        )
        # flip onto the normal's hemisphere (query.h:66-71)
        dot = hm_x[:] * n_l[0] + hm_y[:] * n_l[1] + hm_z[:] * n_l[2]
        fs = jnp.where(dot > 0.0, 1.0, -1.0)
        return hm_x[:] * fs, hm_y[:] * fs, hm_z[:] * fs

    return rng_next_lane, hemisphere


def _make_bounce(traverse, shade, rng_next_lane, hemisphere,
                 diffuse_bounce, n_objects, miss_rgb, mats_ref,
                 tp_refs, rd_refs, rng_st, alive_st, bo_refs, bd_refs,
                 nx_l, ny_l, nz_l, obj_l, hm_refs=None, chunk_shadow=False,
                 dialect="gpu", matsq_ref=None, mats_mm=0, dec_scr=None):
    miss_r, miss_g, miss_b = miss_rgb
    cpuonly = dialect == "cpuonly"
    tp_r, tp_g, tp_b = tp_refs
    rd_r, rd_g, rd_b = rd_refs
    bo_x, bo_y, bo_z = bo_refs
    bd_x, bd_y, bd_z = bd_refs
    rt = rng_st.shape[1]

    def bounce(use_plan, shared_origin=None):
        """One closest-hit + shade + RR step on the state scratches
        (the loop body of TraceRayIterative, query.h:165-216).

        ``shared_origin``: scalar (x, y, z) when every lane shares one
        origin (depth-0 camera rays; the dense test then broadcasts),
        else None for per-lane origins from the bo_* scratches.
        """
        alive = alive_st[:] > 0.0
        o_l = (
            jnp.where(alive, bo_x[:], 1e30),
            jnp.where(alive, bo_y[:], 1e30),
            jnp.where(alive, bo_z[:], 1e30),
        )
        d_l = (bd_x[:], bd_y[:], bd_z[:])
        d_c = (_to_col(d_l[0]), _to_col(d_l[1]), _to_col(d_l[2]))
        if shared_origin is not None:
            o_sc = shared_origin
        else:
            o_sc = (_to_col(o_l[0]), _to_col(o_l[1]), _to_col(o_l[2]))
        traverse(o_sc, o_l, d_c, d_l, use_plan, alive)

        (lo_r, lo_g, lo_b), hit_l, p_l = shade(
            o_l, d_l, chunked=chunk_shadow and not use_plan)
        found = hit_l & alive
        found_f = jnp.where(found, 1.0, 0.0)
        missed_f = jnp.where(alive & ~hit_l, 1.0, 0.0)
        if cpuonly:
            # miss shader: sky gradient on the unit direction
            # (CPUOnly/raytracer.h:226-229); d_l is always unit here
            skyt = 0.5 * (d_l[2] + 1.0)
            ms_r = (1.0 - skyt) + skyt * 0.5
            ms_g = (1.0 - skyt) + skyt * 0.7
            ms_b = (1.0 - skyt) + skyt * 1.0
        else:
            ms_r, ms_g, ms_b = miss_r, miss_g, miss_b
        rd_r[:] = rd_r[:] + tp_r[:] * (missed_f * ms_r + found_f * lo_r)
        rd_g[:] = rd_g[:] + tp_g[:] * (missed_f * ms_g + found_f * lo_g)
        rd_b[:] = rd_b[:] + tp_b[:] * (missed_f * ms_b + found_f * lo_b)

        # per-lane material params by object: masked scalar loops
        # within MAX_OBJECTS, the one-hot MXU dot beyond (miss lanes'
        # obj == -1 -> all-zero features, same as the no-mask case)
        obj_lane = obj_l[:]
        zeros = jnp.zeros((1, rt), jnp.float32)
        if mats_mm:
            ml = _mat_lanes_mm(obj_lane, matsq_ref, mats_mm)
            kd_l, kr_l = ml[3], ml[9]
            al = [ml[0], ml[1], ml[2]]
            sp = [ml[4], ml[5], ml[6]]
        else:
            kd_l = zeros
            kr_l = zeros
            al = [zeros, zeros, zeros]
            sp = [zeros, zeros, zeros]
            for o in range(n_objects):
                m = jnp.where(obj_lane == o, 1.0, 0.0)
                kd_l = kd_l + m * mats_ref[o, 3]
                kr_l = kr_l + m * mats_ref[o, 9]
                al = [al[c] + m * mats_ref[o, c] for c in range(3)]
                sp = [sp[c] + m * mats_ref[o, 4 + c] for c in range(3)]

        # Russian-roulette split (query.h:188-206)
        total = kd_l + kr_l
        can_bounce = found & (total > 0.0)
        s_xi, xi = rng_next_lane()
        rng_st[:] = jnp.where(can_bounce, s_xi, rng_st[:])
        ratio = kd_l / jnp.where(total > 0.0, total, 1.0)
        if diffuse_bounce:
            take_diff = can_bounce & (xi < ratio)
        else:
            take_diff = jnp.zeros((1, rt), bool)
        take_mirror = can_bounce & ~take_diff
        if cpuonly:
            # CPUOnly only mirrors when kr > 0 (raytracer.h:249); the
            # GPU loop always takes the else-branch
            take_mirror = take_mirror & (kr_l > 0.0)

        nx, ny, nz = nx_l[:], ny_l[:], nz_l[:]
        if diffuse_bounce:
            # the lockstep rejection sampler is the most expensive part
            # of the bounce decision (~9 rounds x 3 RNG draws for the
            # whole tile); skip it when NO lane takes the diffuse branch
            # — bit-exact, since skipped tiles multiply the sample by
            # td_f == 0 everywhere and non-diffuse lanes' RNG advances
            # are rolled back regardless.  The flipped sample lands in
            # the hm_* scratches so the unguarded reads below see it;
            # dead-tile reads are masked by take_diff (select, not
            # multiply, so stale/uninitialized scratch bits are inert).
            assert hm_refs is not None
            hm_x, hm_y, hm_z = hm_refs

            @pl.when(jnp.any(take_diff))
            def _():
                rng_before = rng_st[:]
                fx, fy, fz = hemisphere((nx, ny, nz))
                hm_x[:] = fx
                hm_y[:] = fy
                hm_z[:] = fz
                # hemisphere() advanced every lane; roll back lanes that
                # did not take the diffuse branch (masked state
                # threading, ops/integrator.py bounce)
                rng_st[:] = jnp.where(take_diff, rng_st[:], rng_before)

            hx = jnp.where(take_diff, hm_x[:], 0.0)
            hy = jnp.where(take_diff, hm_y[:], 0.0)
            hz = jnp.where(take_diff, hm_z[:], 0.0)
            ndotl_h = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
            # diffuse throughput: albedo * 2 N.L (query.h:195-199), with
            # the CPUOnly extra * (kd + kr) factor (raytracer.h:240-248)
            dtp = (total * (2.0 * ndotl_h)) if cpuonly else (2.0 * ndotl_h)
        else:
            hx = hy = hz = zeros
            dtp = zeros

        # mirror: reflect(d, n) with kr * tint (query.h:202-205)
        ddn = d_l[0] * nx + d_l[1] * ny + d_l[2] * nz
        rfx = d_l[0] - 2.0 * ddn * nx
        rfy = d_l[1] - 2.0 * ddn * ny
        rfz = d_l[2] - 2.0 * ddn * nz

        td_f = jnp.where(take_diff, 1.0, 0.0)
        bounced = take_diff | take_mirror
        b_f = jnp.where(bounced, 1.0, 0.0)
        new_dx = td_f * hx + (1.0 - td_f) * rfx
        new_dy = td_f * hy + (1.0 - td_f) * rfy
        new_dz = td_f * hz + (1.0 - td_f) * rfz
        # mirror: GPU scales by kr (query.h:202-205); CPUOnly by
        # (diffuse_bounce ? kd+kr : kr) (raytracer.h:249-255)
        if cpuonly and diffuse_bounce:
            mirror_scale = total
        else:
            mirror_scale = kr_l
        tsc = [
            td_f * (al[c] * dtp) + (1.0 - td_f) * (sp[c] * mirror_scale)
            for c in range(3)
        ]

        bo_x[:] = jnp.where(bounced, p_l[0], bo_x[:])
        bo_y[:] = jnp.where(bounced, p_l[1], bo_y[:])
        bo_z[:] = jnp.where(bounced, p_l[2], bo_z[:])
        bd_x[:] = b_f * new_dx + (1.0 - b_f) * bd_x[:]
        bd_y[:] = b_f * new_dy + (1.0 - b_f) * bd_y[:]
        bd_z[:] = b_f * new_dz + (1.0 - b_f) * bd_z[:]
        ntp = [None, None, None]
        for c, ref in enumerate((tp_r, tp_g, tp_b)):
            ntp[c] = b_f * (ref[:] * tsc[c]) + (1.0 - b_f) * ref[:]
            ref[:] = ntp[c]
        # early-out: all channels < 1e-4 (query.h:209-212)
        tiny = (ntp[0] < 1e-4) & (ntp[1] < 1e-4) & (ntp[2] < 1e-4)
        alive_st[:] = jnp.where(bounced & ~tiny, 1.0, 0.0)
        if dec_scr is not None:
            # diff-oracle capture: branch decisions, authoritative for
            # the detached-diff chain (bit0 found, bit1 diffuse,
            # bit2 mirror, bit3 alive-after)
            z = jnp.zeros((1, rt), jnp.int32)
            dec_scr[:] = (
                jnp.where(found, np.int32(1), z)
                | jnp.where(take_diff, np.int32(2), z)
                | jnp.where(take_mirror, np.int32(4), z)
                | jnp.where(alive_st[:] > 0.0, np.int32(8), z)
            )

    return bounce


# --- the fused kernel ---


def _make_primary(xy_ref, cam_ref, off_ref, jitter="wang"):
    """Camera scalars + the jittered primary-ray builder.

    Bit-compatible with ``core.rng.pixel_jitter`` / ``Camera.get_rays``
    (``query.cu:36-43``, ``camera.h:49-53``); shared by the monolithic
    render kernel and the wavefront emit kernel so the streams can
    never diverge.  ``jitter`` is "wang" (per-(pixel, sample) hash, the
    gpu dialect) or "center" (+0.5 pixel centers, the CPUOnly spp==1
    convention, ``CPUOnly/src/render.cpp:127-128``); the rng seed state
    is ``make_rng_seed(x, y, s)`` in both modes.
    Returns (primary_ray, camera_xyz, miss_rgb).
    """
    cx, cy, cz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    p0x, p0y, p0z = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
    dux, duy, duz = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
    dvx, dvy, dvz = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
    miss_rgb = (cam_ref[0, 12], cam_ref[0, 13], cam_ref[0, 14])
    off = off_ref[0, 0]

    x_i = xy_ref[pl.ds(0, 1), :]  # (1, RT) int32
    y_i = xy_ref[pl.ds(1, 1), :]
    x_f = x_i.astype(jnp.float32)
    y_f = y_i.astype(jnp.float32)
    seed_pix = x_i * np.int32(73856093) ^ y_i * np.int32(19349663)

    def primary_ray(s):
        """Sub-pixel jitter + camera ray (query.cu:36-43, camera.h:49-53);
        returns lane-major unit directions and the rng seed state."""
        h = seed_pix ^ ((s + off) * np.int32(83492791))
        if jitter == "center":
            jx = jnp.full(x_f.shape, 0.5, jnp.float32)
            jy = jx
        else:
            jx = _wang_float(h) - 0.5
            h2 = h * np.int32(1664525) + np.int32(1013904223)
            jy = _wang_float(h2) - 0.5
        px = x_f + jx
        py = y_f + jy
        rx = (p0x + px * dux + py * dvx) - cx
        ry = (p0y + px * duy + py * dvy) - cy
        rz = (p0z + px * duz + py * dvz) - cz
        rlen = jnp.sqrt(rx * rx + ry * ry + rz * rz)
        return (rx / rlen, ry / rlen, rz / rlen), h

    return primary_ray, (cx, cy, cz), miss_rgb


def _render_kernel(spp, det_eps, tmin, shadow_eps, shadow_tmin,
                   max_depth, diffuse_bounce, terminal, chunk,
                   dialect, jitter, shadow_samples,
                   num_blocks, num_supers, n_lights, n_objects, mm_attrs,
                   mats_mm, nq, binned_chunk,
                   xy_ref, cam_ref, lights_ref, mats_ref, off_ref,
                   tri_ref, norm_ref, ids_ref, obj_ref, aabb_ref, alane_ref,
                   qsel_ref, matsq_ref, qaabb_ref, order_ref, entry_ref,
                   cmeta_ref, cstream_ref,
                   r_out, g_out, b_out, *rest):
    col_scr = None
    spos_scr = None
    binned = None
    if binned_chunk:
        *rest, cand_buf, cand_sem = rest
        rest = tuple(rest)
    cpuonly = dialect == "cpuonly"
    if terminal:
        (t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
         acc_r, acc_g, acc_b, blk_lane) = rest
        chunk = 0
    elif chunk:
        (t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
         acc_r, acc_g, acc_b, blk_lane,
         tp_r, tp_g, tp_b, rd_r, rd_g, rd_b, rng_st, alive_st,
         bo_x, bo_y, bo_z, bd_x, bd_y, bd_z,
         hm_x, hm_y, hm_z,
         sblk_c, blk_c) = rest
        col_scr = (sblk_c, blk_c)
    elif cpuonly:
        (t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
         acc_r, acc_g, acc_b, blk_lane,
         tp_r, tp_g, tp_b, rd_r, rd_g, rd_b, rng_st, alive_st,
         bo_x, bo_y, bo_z, bd_x, bd_y, bd_z,
         hm_x, hm_y, hm_z,
         sp_x, sp_y, sp_z, unocc) = rest
        spos_scr = (sp_x, sp_y, sp_z, unocc)
    else:
        (t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
         acc_r, acc_g, acc_b, blk_lane,
         tp_r, tp_g, tp_b, rd_r, rd_g, rd_b, rng_st, alive_st,
         bo_x, bo_y, bo_z, bd_x, bd_y, bd_z,
         hm_x, hm_y, hm_z) = rest
    rt = t_col.shape[0]
    row = jax.lax.rem(pl.program_id(0), 8)
    if binned_chunk:
        binned = (cstream_ref, cmeta_ref, cand_buf, cand_sem)

    primary_ray, (cx, cy, cz), (miss_r, miss_g, miss_b) = _make_primary(
        xy_ref, cam_ref, off_ref, jitter=jitter)

    # empty plan -> every primary ray in the tile provably misses (and
    # with nothing hit, no bounces either): skip traversal/shade and
    # accumulate the per-sample clamped miss color with EXACTLY the
    # main loop's arithmetic (one vector add of clip(miss) per sample),
    # so a pixel's bits never depend on which tile composition it lands
    # in (the sharding/tiling invariance contract).  Sky tiles are the
    # majority of a frame.
    #
    # cpuonly has no such shortcut: its miss radiance is the
    # jitter-dependent sky gradient, and replicating the bounce loop's
    # exact float contraction in a second expression is not robust
    # (measured 1-ulp drift) — all tiles take the full path instead.
    if cpuonly:
        has_work = jnp.bool_(True)
    else:
        if binned_chunk:
            has_work = cmeta_ref[row, 1] > 0
        else:
            has_work = entry_ref[row, 0] < jnp.inf

        @pl.when(~has_work)
        def _():
            cm_r = jnp.full((1, rt), jnp.clip(miss_r, 0.0, 1.0), jnp.float32)
            cm_g = jnp.full((1, rt), jnp.clip(miss_g, 0.0, 1.0), jnp.float32)
            cm_b = jnp.full((1, rt), jnp.clip(miss_b, 0.0, 1.0), jnp.float32)
            acc_r[:] = jnp.zeros((1, rt), jnp.float32)
            acc_g[:] = jnp.zeros((1, rt), jnp.float32)
            acc_b[:] = jnp.zeros((1, rt), jnp.float32)

            def sky_body(s, _):
                acc_r[:] = acc_r[:] + cm_r
                acc_g[:] = acc_g[:] + cm_g
                acc_b[:] = acc_b[:] + cm_b
                return 0

            jax.lax.fori_loop(0, spp, sky_body, 0)
            r_out[pl.ds(row, 1), :] = acc_r[:]
            g_out[pl.ds(row, 1), :] = acc_g[:]
            b_out[pl.ds(row, 1), :] = acc_b[:]

    traverse = _make_traverse(
        det_eps, tmin, num_blocks, num_supers, row,
        tri_ref, norm_ref, ids_ref, obj_ref, aabb_ref, alane_ref,
        order_ref, entry_ref,
        t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
        chunk=chunk, col_scr=col_scr, dialect=dialect,
        qsel_ref=qsel_ref if mm_attrs else None,
        mm_f32_dot=mm_attrs == 2, qaabb_ref=qaabb_ref, nq=nq,
        binned=binned,
    )
    shade = _make_shade(
        det_eps, shadow_eps, shadow_tmin, num_blocks, n_lights, n_objects,
        tri_ref, ids_ref, aabb_ref, lights_ref, mats_ref,
        t_lane, nx_l, ny_l, nz_l, obj_l, blk_lane,
        chunk=chunk,
        blk_col=col_scr[0] if chunk else None,  # shadow blocked column
        dialect=dialect, shadow_samples=shadow_samples,
        rng_st=None if terminal else rng_st,
        spos_scr=spos_scr, matsq_ref=matsq_ref, mats_mm=mats_mm,
        qaabb_ref=qaabb_ref, nq=nq,
    )

    if terminal:
        # --- V1 fast path: primary visibility + direct lighting only ---
        depth0_mode = "binned" if binned_chunk else not emit_flat(num_blocks)

        def sample_body(s, _):
            d_l, _h = primary_ray(s)
            d_c = (_to_col(d_l[0]), _to_col(d_l[1]), _to_col(d_l[2]))
            o_l = (cx, cy, cz)
            traverse((cx, cy, cz), o_l, d_c, d_l,
                     depth0_mode, jnp.full((1, rt), True))
            (lo_r, lo_g, lo_b), hit_l, _p = shade(o_l, d_l)
            hit_f = jnp.where(hit_l, 1.0, 0.0)
            acc_r[:] = acc_r[:] + jnp.clip(
                hit_f * lo_r + (1.0 - hit_f) * miss_r, 0.0, 1.0)
            acc_g[:] = acc_g[:] + jnp.clip(
                hit_f * lo_g + (1.0 - hit_f) * miss_g, 0.0, 1.0)
            acc_b[:] = acc_b[:] + jnp.clip(
                hit_f * lo_b + (1.0 - hit_f) * miss_b, 0.0, 1.0)
            return 0
    else:
        # --- V2: the full iterative RR bounce loop in-kernel — the
        # wavefront restatement of TraceRayIterative (query.h:156-220)
        # with bit-compatible RNG streams (core.rng) so sample decisions
        # match the staged integrator lane for lane. ---
        rng_next_lane, hemisphere = _make_rng_hemisphere(
            rng_st, hm_x, hm_y, hm_z)
        bounce = _make_bounce(
            traverse, shade, rng_next_lane, hemisphere,
            diffuse_bounce, n_objects, (miss_r, miss_g, miss_b), mats_ref,
            (tp_r, tp_g, tp_b), (rd_r, rd_g, rd_b), rng_st, alive_st,
            (bo_x, bo_y, bo_z), (bd_x, bd_y, bd_z),
            nx_l, ny_l, nz_l, obj_l, hm_refs=(hm_x, hm_y, hm_z),
            chunk_shadow=bool(chunk), dialect=dialect,
            matsq_ref=matsq_ref, mats_mm=mats_mm,
        )

        depth0_mode = "binned" if binned_chunk else not emit_flat(num_blocks)

        def sample_body(s, _):
            d_l, h = primary_ray(s)
            bd_x[:], bd_y[:], bd_z[:] = d_l
            bo_x[:] = jnp.full((1, rt), cx, jnp.float32)
            bo_y[:] = jnp.full((1, rt), cy, jnp.float32)
            bo_z[:] = jnp.full((1, rt), cz, jnp.float32)
            rng_st[:] = h  # make_rng_seed(x, y, s) == the jitter base
            tp_r[:] = jnp.ones((1, rt), jnp.float32)
            tp_g[:] = jnp.ones((1, rt), jnp.float32)
            tp_b[:] = jnp.ones((1, rt), jnp.float32)
            rd_r[:] = jnp.zeros((1, rt), jnp.float32)
            rd_g[:] = jnp.zeros((1, rt), jnp.float32)
            rd_b[:] = jnp.zeros((1, rt), jnp.float32)
            alive_st[:] = jnp.ones((1, rt), jnp.float32)

            # depth 0: planned (or binned), shared-origin traversal
            bounce(depth0_mode, (cx, cy, cz))

            def d_cond(depth):
                return (depth < max_depth) & jnp.any(alive_st[:] > 0.0)

            def d_body(depth):
                bounce(False)
                return depth + 1

            jax.lax.while_loop(d_cond, d_body, jnp.int32(1))

            if cpuonly:
                # no per-sample clamp in this dialect (clamped at PNG
                # quantization; CPUOnly/src/render.cpp:157-160)
                acc_r[:] = acc_r[:] + rd_r[:]
                acc_g[:] = acc_g[:] + rd_g[:]
                acc_b[:] = acc_b[:] + rd_b[:]
            else:
                # per-sample clamp (query.h:219)
                acc_r[:] = acc_r[:] + jnp.clip(rd_r[:], 0.0, 1.0)
                acc_g[:] = acc_g[:] + jnp.clip(rd_g[:], 0.0, 1.0)
                acc_b[:] = acc_b[:] + jnp.clip(rd_b[:], 0.0, 1.0)
            return 0

    @pl.when(has_work)
    def _():
        acc_r[:] = jnp.zeros((1, rt), jnp.float32)
        acc_g[:] = jnp.zeros((1, rt), jnp.float32)
        acc_b[:] = jnp.zeros((1, rt), jnp.float32)
        jax.lax.fori_loop(0, spp, sample_body, 0)
        r_out[pl.ds(row, 1), :] = acc_r[:]
        g_out[pl.ds(row, 1), :] = acc_g[:]
        b_out[pl.ds(row, 1), :] = acc_b[:]


_QSEL_F = 22  # qsel features: tri v0/e1/e2 (9) | vn n0/n1/n2 (9) | g (3) | obj (1)
_MM_OBJ_F = 13  # material features: albedo(3) kd specular(3) ks shin kr emission(3)


def mats_mm_mode(n_objects: int, interpret: bool) -> int:
    """Static per-lane material-selection mode: 0 = the unrolled
    per-object masked-sum loops (scenes within MAX_OBJECTS — today's
    bit-exact path), 1 = one-hot bf16 MXU dot over the mats table
    (TPU), 2 = f32 dot of the same parts (interpret mode).  Modes 1/2
    lift the object-count ceiling: kernel cost is one (RT, NOp) x
    (NOp, 128) dot instead of n_objects masked adds per consumer."""
    if n_objects <= MAX_OBJECTS:
        return 0
    return 2 if interpret else 1


def _build_mats_qsel(mats_rows):
    """(NOp, 128) bf16 selection matrix over OBJECTS: per object row,
    the 13 material features split into bf16 hi/mid/lo parts (cols
    [0,13)/[32,45)/[64,77)); the f32 sum hi+mid+lo reconstructs each
    f32 feature bit-exactly (same scheme as ``_build_qsel``; one-hot
    rows are exact in bf16)."""
    no = mats_rows.shape[0]
    nop = max(16, -(-no // 16) * 16)  # bf16 sublane tile (16, 128)
    feats = jnp.pad(mats_rows[:, :_MM_OBJ_F].astype(jnp.float32),
                    ((0, nop - no), (0, 0)))
    from .bf16_split import bf16_split3

    hi, mid, lo = bf16_split3(feats)  # fold-proof split (see _build_qsel)
    q = jnp.zeros((nop, 128), jnp.bfloat16)
    return (q.at[:, 0:_MM_OBJ_F].set(hi)
            .at[:, 32:32 + _MM_OBJ_F].set(mid)
            .at[:, 64:64 + _MM_OBJ_F].set(lo))


def _mat_lanes_mm(obj_lane, matsq_ref, mats_mm):
    """All 13 per-lane material features for each lane's object via the
    one-hot matmul — one dot for ANY object count.  Returns a list of
    13 (1, rt) f32 rows in mats-row column order."""
    rt = obj_lane.shape[1]
    nop = matsq_ref.shape[0]
    obj_c = _to_col(obj_lane)  # (rt, 1) int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (rt, nop), 1)
    pick = cols == obj_c
    if mats_mm == 2:
        mm = jnp.dot(jnp.where(pick, 1.0, 0.0),
                     matsq_ref[:].astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    else:
        mm = jnp.dot(jnp.where(pick, 1.0, 0.0).astype(jnp.bfloat16),
                     matsq_ref[:], preferred_element_type=jnp.float32)
    outt = mm.T  # (128, rt): features land lane-major
    attr = lambda f: (outt[f:f + 1, :]
                      + outt[32 + f:33 + f, :]
                      + outt[64 + f:65 + f, :])
    return [attr(f) for f in range(_MM_OBJ_F)]


def mm_attrs_mode(grid, interpret: bool) -> int:
    """Static MXU-selection mode for a kernel build: 0 = off (VPU
    select fallback), 1 = bf16 dot (TPU), 2 = f32 dot of the same parts
    (interpret mode; XLA:CPU lacks bf16 dots).  ONE definition shared
    by every pallas_call site so emit/resume/bounce kernels can never
    compile mismatched selection paths."""
    if not mm_attrs_for(grid):
        return 0
    return 2 if interpret else 1


def mm_attrs_for(grid) -> bool:
    """Whether the MXU winner-attribute selection is enabled for this
    grid (env switch + the extra (L*B, 128) bf16 operand must fit the
    kernel VMEM budget next to the triangle planes)."""
    if not _MM_ATTRS:
        return False
    from .pallas_kernels import _VMEM_TRI_BUDGET_BYTES, _grid_bytes

    l, b = grid.tri_index.shape
    return _grid_bytes(l, b) + l * b * 128 * 2 < _VMEM_TRI_BUDGET_BYTES


def _build_qsel(grid):
    """(L*B, 128) bf16 selection matrix: per triangle row, attribute
    values split into three bf16 parts — hi at cols [0, 22), mid at
    [32, 54), lo at [64, 86).  The f32 sum hi+mid+lo reconstructs each
    attribute bit-exactly for |q| in [1e-32, 3.38e38] (padding
    triangles are zeroed; scripts/probe_mm_select.py).

    RANGE CONTRACT: below ~1e-32 the lo part underflows bf16 subnormals
    and the reconstruction loses low-order bits (ops.bf16_split module
    docstring).  Geometry/normal/material magnitudes are either 0 (exact
    in all parts) or well above the bound for any sanely-scaled scene;
    a degenerate scene with ~1e-33-sized coordinates would silently
    round those attributes — scale the scene, don't shrink it."""
    l, b = grid.tri_index.shape
    valid = (grid.tri_index >= 0)[None]  # (1, L, B)
    feats = jnp.concatenate([
        grid.tri,                              # (9, L, B)
        grid.norm,                             # (12, L, B)
        grid.obj[None].astype(jnp.float32),    # (1, L, B)
    ])
    feats = jnp.where(valid, feats, 0.0).reshape(_QSEL_F, l * b).T
    # integer-mask split (ops.bf16_split): the convert-based split is
    # folded to identity by XLA under jit on TPU, which silently
    # zeroed mid/lo here — found + fixed round 4
    from .bf16_split import bf16_split3

    hi, mid, lo = bf16_split3(feats)
    q = jnp.zeros((l * b, 128), jnp.bfloat16)
    return (q.at[:, 0:_QSEL_F].set(hi)
            .at[:, 32:32 + _QSEL_F].set(mid)
            .at[:, 64:64 + _QSEL_F].set(lo))


# moved to ops.accel (shared with the standalone closest/occluded
# kernels' quarter gating); aliased to keep in-module call sites
from .accel import quarter_aabb_rows as _quarter_aabb_rows  # noqa: E402


def _scene_rows(scene, grid):
    """Host-side operand prep shared by the fused kernels: scalar rows
    (SMEM) + plane-SoA geometry (VMEM) with their BlockSpecs."""
    cam = scene.camera
    l, b = grid.tri_index.shape
    cam_row = jnp.concatenate([
        cam.center, cam.pixel00_loc, cam.pixel_delta_u, cam.pixel_delta_v,
        jnp.asarray(scene.miss_color, jnp.float32).reshape(3),
        jnp.zeros(1, jnp.float32),
    ]).reshape(1, 16)

    lights = scene.lights
    n_lights = int(lights.intensity.shape[0])
    lights_rows = jnp.concatenate([
        lights.position,
        lights.color * lights.intensity[:, None],
        jnp.asarray(lights.radius, jnp.float32).reshape(n_lights, 1),
        jnp.zeros((n_lights, 1), jnp.float32),
    ], axis=1)  # (NL, 8): pos, color*intensity, radius, pad

    mats = scene.materials
    n_objects = int(mats.kd.shape[0])
    mats_rows = jnp.concatenate([
        mats.albedo, mats.kd[:, None], mats.specular_color, mats.ks[:, None],
        mats.shininess[:, None], mats.kr[:, None], mats.emission,
        jnp.zeros((n_objects, 3), jnp.float32),
    ], axis=1)  # (NO, 16)

    # quarter-major plane layout when the triangle-axis gate is on:
    # each 128-lane quarter is its own ROW (row (k*L + b)*nq + q), so
    # every in-kernel load is a full row at lane offset 0 — Mosaic has
    # no dynamic-row loads at a nonzero lane offset
    nq = quarters_for(b)
    qs = b // nq
    tri_rows = grid.tri.reshape(9 * l * nq, qs)
    norm_rows = grid.norm.reshape(12 * l * nq, qs)
    ids_rows = grid.tri_index.reshape(l * nq, qs)
    obj_rows = grid.obj.reshape(l * nq, qs)
    aabb_rows = jnp.pad(grid.aabb.T, (((0, (-l) % 8)), (0, 2)))  # (Lp, 8)
    # lane-major copy for the bounce scan's per-block distance bounds:
    # rows 0-5 = lo.xyz/hi.xyz over block lanes, padding pushed to +huge
    # so padded lanes sort last and never get visited
    lb = max(128, -(-l // 128) * 128)
    aabb_lane = jnp.pad(grid.aabb, ((0, 2), (0, lb - l)),
                        constant_values=np.float32(3e38))  # (8, LB)

    scalar_ops = (cam_row, lights_rows, mats_rows)
    scalar_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
    # MXU attr selection: the qsel matrix when enabled, a dummy row
    # otherwise (operand arity stays fixed; the static mm_attrs flag
    # tells the kernel which path was compiled)
    qsel = (_build_qsel(grid) if mm_attrs_for(grid)
            else jnp.zeros((16, 128), jnp.bfloat16))
    # per-lane material selection beyond MAX_OBJECTS: the (NOp, 128)
    # bf16 object-feature matrix for the one-hot dot (_mat_lanes_mm);
    # a dummy row keeps operand arity fixed when the unrolled loops
    # were compiled instead
    matsq = (_build_mats_qsel(mats_rows) if n_objects > MAX_OBJECTS
             else jnp.zeros((16, 128), jnp.bfloat16))
    # quarter-AABB rows for the triangle-axis visit gate (a dummy when
    # the static quarter count is 1 — operand arity stays fixed)
    qaabb = (_quarter_aabb_rows(grid, nq) if nq > 1
             else jnp.zeros((8, 8), jnp.float32))
    geom_ops = (tri_rows, norm_rows, ids_rows, obj_rows,
                aabb_rows, aabb_lane, qsel, matsq, qaabb)
    geom_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
    return (scalar_ops, scalar_specs, geom_ops, geom_specs,
            n_lights, n_objects)


def _pad_tiles(xs, ys):
    """Pad the swizzled pixel stream to whole 8-tile groups (output
    blocks are (8, RAY_TILE) rows shared by 8 consecutive programs)."""
    n = xs.shape[0]
    pad = (-n) % (8 * RAY_TILE)
    if pad:
        xs = jnp.concatenate([xs, jnp.zeros(pad, xs.dtype)])
        ys = jnp.concatenate([ys, jnp.zeros(pad, ys.dtype)])
    return xs, ys, n, n + pad


@partial(jax.jit, static_argnames=("spp", "interpret", "det_eps", "tmin",
                                   "shadow_eps", "shadow_tmin", "chunk",
                                   "dialect", "jitter", "shadow_samples"))
def render_tiles(
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
    chunk: int = _CHUNK_ROWS,
    dialect: str = "gpu",
    jitter: str = "wang",
    shadow_samples: int = 1,
    cand_plan=None,
) -> Array:
    """Fused render of swizzled pixel tiles -> (N, 3) radiance SUM over
    spp samples (callers divide; matches ``accumulate_samples``).

    ``cand_plan``: optional binned camera-candidate plan (``ops.binned``,
    built for exactly this padded tile stream) — the depth-0 traversal
    of every sample then streams per-tile triangle candidates instead
    of walking blocks (the spp loop reuses the plan: it is
    sample-independent by jitter inflation).

    ``dialect`` selects the reference semantics: "gpu"
    (``TraceRayIterative`` + ``IsInShadow``) or "cpuonly" (``TraceRay``
    + disk-sampled ``ShadowVisibility`` with ``shadow_samples`` walks
    per area light, sky-gradient misses, no per-sample clamp).  Callers
    pass the dialect's eps family (``ops.integrator.trace_rays``)."""
    grid = scene.accel
    cam = scene.camera
    l, b = grid.tri_index.shape
    xs, ys, n, np_rays = _pad_tiles(xs, ys)
    nt = np_rays // RAY_TILE

    if cand_plan is not None:
        # binned depth-0: the superblock plan is dead (see emit_tiles)
        order = jnp.zeros((nt, 8), jnp.int32)
        entry = jnp.zeros((nt, 8), jnp.float32)
        assert cand_plan.meta.shape[0] == nt, (
            "candidate plan built for a different tile stream")
        cmeta, cstream = cand_plan.meta, cand_plan.stream
        binned_chunk = int(cand_plan.chunk)
    else:
        order, entry = camera_tile_plan(cam, xs, ys, grid, RAY_TILE)
        order, entry = _pad_plan_rows(order, entry)
        cmeta = jnp.zeros((nt, 8), jnp.int32)
        cstream = jnp.zeros((16, 128), jnp.float32)
        binned_chunk = 0
    ls = order.shape[1]

    # rows [8i]=x, [8i+1]=y, rest zero-pad (Mosaic needs 8-row blocks)
    xy = jnp.concatenate(
        [xs.reshape(nt, 1, RAY_TILE), ys.reshape(nt, 1, RAY_TILE),
         jnp.zeros((nt, 6, RAY_TILE), xs.dtype)], axis=1
    ).reshape(8 * nt, RAY_TILE)

    (scalar_ops, scalar_specs, geom_ops, geom_specs,
     n_lights, n_objects) = _scene_rows(scene, grid)
    off_row = jnp.asarray(sample_offset, jnp.int32).reshape(1, 1)

    in_specs = (
        [pl.BlockSpec((8, RAY_TILE), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)]
        + scalar_specs
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]  # sample offset
        + geom_specs
        + [pl.BlockSpec((8, ls), lambda i: (i // 8, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec((8, ls), lambda i: (i // 8, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec((8, 8), lambda i: (i // 8, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pl.ANY)]
    )
    out_row = lambda: pl.BlockSpec(
        (8, RAY_TILE), lambda i: (i // 8, 0), memory_space=pltpu.VMEM
    )
    lane = lambda: pltpu.VMEM((1, RAY_TILE), jnp.float32)
    cpuonly = dialect == "cpuonly"
    # MK_CHUNK is a gpu-dialect perf-bisection knob; ignore it here
    # rather than crash every cpuonly render while someone bisects gpu
    chunk = 0 if cpuonly else chunk
    # the V1 terminal specialization encodes gpu shading; cpuonly
    # terminal scenes go through V2 (its depth loop exits after depth 0
    # when nothing can bounce)
    terminal = (bool(scene.terminal_only) and not scene.diffuse_bounce
                and not cpuonly)
    max_depth = int(scene.max_bounces)
    scratch = [
        pltpu.VMEM((RAY_TILE, 1), jnp.float32),  # t_col
        pltpu.VMEM((RAY_TILE, 1), jnp.int32),    # idx_col
        lane(),                                   # t_lane
        lane(), lane(), lane(),                   # normal
        pltpu.VMEM((1, RAY_TILE), jnp.int32),     # obj
        pltpu.VMEM((1, RAY_TILE), jnp.int32),     # blk_win (deferred attrs)
        lane(), lane(), lane(),                   # accum rgb
        lane(),                                   # shadow blocked
    ]
    if not terminal:
        # path state for the in-kernel bounce loop: throughput, path
        # radiance, rng, aliveness, bounce origin/dir, hemisphere sample
        scratch += [lane() for _ in range(6)]
        scratch += [pltpu.VMEM((1, RAY_TILE), jnp.int32), lane()]  # rng, alive
        scratch += [lane() for _ in range(9)]  # bo, bd, hm
        if chunk:
            assert RAY_TILE % chunk == 0 and chunk % 8 == 0
            assert not cpuonly
            # shadow-blocked column + winner-block column for the
            # chunked bounce visits (attrs are deferred, so no
            # per-attribute columns)
            scratch += [pltpu.VMEM((RAY_TILE, 1), jnp.float32),
                        pltpu.VMEM((RAY_TILE, 1), jnp.int32)]
        elif cpuonly:
            # sampled shadow origin xyz + the unoccluded-count lane
            scratch += [lane() for _ in range(4)]

    if binned_chunk:
        from .binned import CAND_ROWS

        scratch += [pltpu.VMEM((2, CAND_ROWS, binned_chunk), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
    outs = pl.pallas_call(
        partial(_render_kernel, spp, det_eps, tmin, shadow_eps, shadow_tmin,
                max_depth, bool(scene.diffuse_bounce), terminal,
                int(chunk) if not terminal else 0,
                dialect, jitter, int(shadow_samples),
                l, ls, n_lights, n_objects, mm_attrs_mode(grid, interpret),
                mats_mm_mode(n_objects, interpret), quarters_for(b),
                binned_chunk),
        out_shape=[jax.ShapeDtypeStruct((nt, RAY_TILE), jnp.float32)] * 3,
        grid_spec=pl.GridSpec(
            grid=(nt,),
            in_specs=in_specs,
            out_specs=[out_row(), out_row(), out_row()],
            scratch_shapes=scratch,
        ),
        interpret=interpret,
    )(xy, *scalar_ops, off_row, *geom_ops, order, entry, cmeta, cstream)

    return jnp.stack(
        [a.reshape(np_rays)[:n] for a in outs], axis=1
    )  # (N, 3) sums


# --- wavefront split: emit (depth 0) + resume (depths 1..max-1) ---
#
# The monolithic kernel wastes most of its bounce arithmetic: after a
# diffuse bounce only a few % of a camera tile's lanes stay alive, yet
# every gated dense visit still computes all RAY_TILE rows.  The
# wavefront path splits the sample at the first bounce boundary:
# ``emit_tiles`` runs depth 0 (jitter/camera/traversal/direct light)
# and writes each ray's bounce state; the caller globally sorts rays
# by (alive, direction octant, origin morton) -- compaction by
# ``lax.sort``, the one fast reorder primitive on TPU (gathers and
# scatters are not; see scripts/probe_compact_glue.py) -- and
# ``resume_tiles`` runs the remaining depths on dense, coherent tiles
# where dead tiles form a suffix that exits at one scalar test.

_ST_ROWS = 16  # rows: bo xyz, bd xyz, tp rgb, rd rgb, alive, pad x3
_ST_LIVE_ROWS = 13  # rows 0..12 carry state; 13..15 are layout padding
_ST_ALIVE_ROW = 12  # the aliveness flag row (1.0 alive / 0.0 dead)


def _emit_kernel(det_eps, tmin, shadow_eps, shadow_tmin, diffuse_bounce,
                 dialect, jitter, shadow_samples,
                 num_blocks, num_supers, n_lights, n_objects, mm_attrs,
                 mats_mm, nq, chunk, binned_chunk,
                 xy_ref, cam_ref, lights_ref, mats_ref, off_ref,
                 tri_ref, norm_ref, ids_ref, obj_ref, aabb_ref, alane_ref,
                 qsel_ref, matsq_ref, qaabb_ref, order_ref, entry_ref,
                 cmeta_ref, cstream_ref,
                 st_out, rng_out, *scratch):
    cpuonly = dialect == "cpuonly"
    spos_scr = None
    col_scr = None
    binned = None
    if binned_chunk:
        *scratch, cand_buf, cand_sem = scratch
        scratch = tuple(scratch)
    if cpuonly:
        (t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
         blk_lane,
         tp_r, tp_g, tp_b, rd_r, rd_g, rd_b, rng_st, alive_st,
         bo_x, bo_y, bo_z, bd_x, bd_y, bd_z, hm_x, hm_y, hm_z,
         sp_x, sp_y, sp_z, unocc) = scratch
        spos_scr = (sp_x, sp_y, sp_z, unocc)
    elif chunk:
        (t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
         blk_lane,
         tp_r, tp_g, tp_b, rd_r, rd_g, rd_b, rng_st, alive_st,
         bo_x, bo_y, bo_z, bd_x, bd_y, bd_z, hm_x, hm_y, hm_z,
         sblk_c, blk_c) = scratch
        col_scr = (sblk_c, blk_c)
    else:
        (t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
         blk_lane,
         tp_r, tp_g, tp_b, rd_r, rd_g, rd_b, rng_st, alive_st,
         bo_x, bo_y, bo_z, bd_x, bd_y, bd_z, hm_x, hm_y, hm_z) = scratch
    rt = t_col.shape[0]
    row = jax.lax.rem(pl.program_id(0), 8)
    if binned_chunk:
        binned = (cstream_ref, cmeta_ref, cand_buf, cand_sem)

    primary_ray, (cx, cy, cz), (miss_r, miss_g, miss_b) = _make_primary(
        xy_ref, cam_ref, off_ref, jitter=jitter)

    zeros = jnp.zeros((1, rt), jnp.float32)
    for r_ in range(13, _ST_ROWS):
        st_out[pl.ds(r_, 1), :] = zeros
    zeros_i = jnp.zeros((1, rt), jnp.int32)
    for r_ in range(1, 8):
        rng_out[pl.ds(r_, 1), :] = zeros_i

    # empty plan: every primary ray provably misses -> dead state whose
    # radiance is the raw miss color (the per-sample clip happens at
    # accumulation, matching the monolithic kernel's order of ops).
    # cpuonly has no such shortcut (jitter-dependent sky; same
    # contraction-robustness rule as _render_kernel).
    if cpuonly:
        has_work = jnp.bool_(True)
    else:
        if binned_chunk:
            # candidate count 0 <=> no triangle any tile ray can reach
            # (conservative at triangle granularity — a strictly
            # tighter shortcut than the superblock plan's)
            has_work = cmeta_ref[row, 1] > 0
        else:
            has_work = entry_ref[row, 0] < jnp.inf

        @pl.when(~has_work)
        def _():
            # dead state, but with a valid unit direction: a zero
            # direction would be the one ray state the monolithic
            # kernel can never produce (dead lanes there keep their
            # last real direction), and 1/0 components poison
            # downstream math
            for r_ in range(5):
                st_out[pl.ds(r_, 1), :] = zeros
            st_out[pl.ds(5, 1), :] = jnp.ones((1, rt), jnp.float32)
            for r_ in range(6, 9):
                st_out[pl.ds(r_, 1), :] = zeros
            st_out[pl.ds(9, 1), :] = jnp.full((1, rt), miss_r, jnp.float32)
            st_out[pl.ds(10, 1), :] = jnp.full((1, rt), miss_g, jnp.float32)
            st_out[pl.ds(11, 1), :] = jnp.full((1, rt), miss_b, jnp.float32)
            st_out[pl.ds(12, 1), :] = zeros
            rng_out[pl.ds(0, 1), :] = zeros_i

    traverse = _make_traverse(
        det_eps, tmin, num_blocks, num_supers, row,
        tri_ref, norm_ref, ids_ref, obj_ref, aabb_ref, alane_ref,
        order_ref, entry_ref,
        t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
        chunk=chunk, col_scr=col_scr,
        dialect=dialect, qsel_ref=qsel_ref if mm_attrs else None,
        mm_f32_dot=mm_attrs == 2, qaabb_ref=qaabb_ref, nq=nq,
        binned=binned,
    )
    shade = _make_shade(
        det_eps, shadow_eps, shadow_tmin, num_blocks, n_lights, n_objects,
        tri_ref, ids_ref, aabb_ref, lights_ref, mats_ref,
        t_lane, nx_l, ny_l, nz_l, obj_l, blk_lane,
        chunk=chunk,
        blk_col=col_scr[0] if chunk else None,
        dialect=dialect, shadow_samples=shadow_samples, rng_st=rng_st,
        spos_scr=spos_scr, matsq_ref=matsq_ref, mats_mm=mats_mm,
        qaabb_ref=qaabb_ref, nq=nq,
    )
    rng_next_lane, hemisphere = _make_rng_hemisphere(
        rng_st, hm_x, hm_y, hm_z)
    bounce = _make_bounce(
        traverse, shade, rng_next_lane, hemisphere,
        diffuse_bounce, n_objects, (miss_r, miss_g, miss_b), mats_ref,
        (tp_r, tp_g, tp_b), (rd_r, rd_g, rd_b), rng_st, alive_st,
        (bo_x, bo_y, bo_z), (bd_x, bd_y, bd_z),
        nx_l, ny_l, nz_l, obj_l, hm_refs=(hm_x, hm_y, hm_z),
        chunk_shadow=bool(chunk), dialect=dialect,
        matsq_ref=matsq_ref, mats_mm=mats_mm,
    )
    depth0_mode = "binned" if binned_chunk else not emit_flat(num_blocks)

    @pl.when(has_work)
    def _():
        d_l, h = primary_ray(jnp.int32(0))
        bd_x[:], bd_y[:], bd_z[:] = d_l
        bo_x[:] = jnp.full((1, rt), cx, jnp.float32)
        bo_y[:] = jnp.full((1, rt), cy, jnp.float32)
        bo_z[:] = jnp.full((1, rt), cz, jnp.float32)
        rng_st[:] = h
        tp_r[:] = jnp.ones((1, rt), jnp.float32)
        tp_g[:] = jnp.ones((1, rt), jnp.float32)
        tp_b[:] = jnp.ones((1, rt), jnp.float32)
        rd_r[:] = zeros
        rd_g[:] = zeros
        rd_b[:] = zeros
        alive_st[:] = jnp.ones((1, rt), jnp.float32)

        # depth 0: planned (or binned-candidate), shared-origin
        # traversal + direct light + the RR bounce decision
        # (bit-identical to the monolithic path in exact semantics)
        bounce(depth0_mode, (cx, cy, cz))

        for r_, ref in enumerate((bo_x, bo_y, bo_z, bd_x, bd_y, bd_z,
                                  tp_r, tp_g, tp_b, rd_r, rd_g, rd_b,
                                  alive_st)):
            st_out[pl.ds(r_, 1), :] = ref[:]
        rng_out[pl.ds(0, 1), :] = rng_st[:]


def _resume_kernel(det_eps, tmin, shadow_eps, shadow_tmin, max_depth,
                   diffuse_bounce, dialect, shadow_samples,
                   num_blocks, num_supers,
                   n_lights, n_objects, mm_attrs, mats_mm, nq,
                   cam_ref, lights_ref, mats_ref,
                   tri_ref, norm_ref, ids_ref, obj_ref, aabb_ref, alane_ref,
                   qsel_ref, matsq_ref, qaabb_ref, order_ref, entry_ref,
                   st_ref, rng_ref,
                   r_out, g_out, b_out, *scratch):
    cpuonly = dialect == "cpuonly"
    spos_scr = None
    if cpuonly:
        (t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
         blk_lane,
         tp_r, tp_g, tp_b, rd_r, rd_g, rd_b, rng_st, alive_st,
         bo_x, bo_y, bo_z, bd_x, bd_y, bd_z, hm_x, hm_y, hm_z,
         sp_x, sp_y, sp_z, unocc) = scratch
        spos_scr = (sp_x, sp_y, sp_z, unocc)
    else:
        (t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
         blk_lane,
         tp_r, tp_g, tp_b, rd_r, rd_g, rd_b, rng_st, alive_st,
         bo_x, bo_y, bo_z, bd_x, bd_y, bd_z, hm_x, hm_y, hm_z) = scratch
    rt = t_col.shape[0]
    row = jax.lax.rem(pl.program_id(0), 8)
    miss_r, miss_g, miss_b = cam_ref[0, 12], cam_ref[0, 13], cam_ref[0, 14]

    for r_, ref in enumerate((bo_x, bo_y, bo_z, bd_x, bd_y, bd_z,
                              tp_r, tp_g, tp_b, rd_r, rd_g, rd_b,
                              alive_st)):
        ref[:] = st_ref[pl.ds(r_, 1), :]
    rng_st[:] = rng_ref[pl.ds(0, 1), :]

    traverse = _make_traverse(
        det_eps, tmin, num_blocks, num_supers, row,
        tri_ref, norm_ref, ids_ref, obj_ref, aabb_ref, alane_ref,
        order_ref, entry_ref,
        t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
        dialect=dialect, qsel_ref=qsel_ref if mm_attrs else None,
        mm_f32_dot=mm_attrs == 2, qaabb_ref=qaabb_ref, nq=nq,
    )
    shade = _make_shade(
        det_eps, shadow_eps, shadow_tmin, num_blocks, n_lights, n_objects,
        tri_ref, ids_ref, aabb_ref, lights_ref, mats_ref,
        t_lane, nx_l, ny_l, nz_l, obj_l, blk_lane,
        dialect=dialect, shadow_samples=shadow_samples, rng_st=rng_st,
        spos_scr=spos_scr, matsq_ref=matsq_ref, mats_mm=mats_mm,
        qaabb_ref=qaabb_ref, nq=nq,
    )
    rng_next_lane, hemisphere = _make_rng_hemisphere(
        rng_st, hm_x, hm_y, hm_z)
    bounce = _make_bounce(
        traverse, shade, rng_next_lane, hemisphere,
        diffuse_bounce, n_objects, (miss_r, miss_g, miss_b), mats_ref,
        (tp_r, tp_g, tp_b), (rd_r, rd_g, rd_b), rng_st, alive_st,
        (bo_x, bo_y, bo_z), (bd_x, bd_y, bd_z),
        nx_l, ny_l, nz_l, obj_l, hm_refs=(hm_x, hm_y, hm_z),
        dialect=dialect, matsq_ref=matsq_ref, mats_mm=mats_mm,
    )

    # the sort puts dead rays last, so dead tiles are a suffix of the
    # grid; they fall through to the passthrough writes below
    @pl.when(jnp.any(alive_st[:] > 0.0))
    def _():
        def d_cond(depth):
            return (depth < max_depth) & jnp.any(alive_st[:] > 0.0)

        def d_body(depth):
            bounce(False)
            return depth + 1

        jax.lax.while_loop(d_cond, d_body, jnp.int32(1))

    r_out[pl.ds(row, 1), :] = rd_r[:]
    g_out[pl.ds(row, 1), :] = rd_g[:]
    b_out[pl.ds(row, 1), :] = rd_b[:]


def _bounce_scratch(cpuonly: bool = False, rt: int = None):
    rt = RAY_TILE if rt is None else rt
    lane = lambda: pltpu.VMEM((1, rt), jnp.float32)
    return (
        [pltpu.VMEM((rt, 1), jnp.float32),   # t_col
         pltpu.VMEM((rt, 1), jnp.int32),     # idx_col
         lane(), lane(), lane(), lane(),           # t_lane, normal xyz
         pltpu.VMEM((1, rt), jnp.int32),     # obj
         pltpu.VMEM((1, rt), jnp.int32),     # blk_win (deferred attrs)
         lane()]                                   # shadow blocked
        + [lane() for _ in range(6)]               # tp rgb, rd rgb
        + [pltpu.VMEM((1, rt), jnp.int32), lane()]  # rng, alive
        + [lane() for _ in range(9)]               # bo, bd, hm
        # cpuonly soft shadows: sampled light pos xyz + unoccluded count
        + ([lane() for _ in range(4)] if cpuonly else [])
    )


@partial(jax.jit, static_argnames=("interpret", "det_eps", "tmin",
                                   "shadow_eps", "shadow_tmin",
                                   "dialect", "jitter", "shadow_samples",
                                   "chunk"))
def emit_tiles(
    scene,
    xs: Array,
    ys: Array,
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
    plan=None,
    chunk: int = None,
    cand_plan=None,
):
    """Depth-0 pass of the wavefront path: camera rays + direct light +
    the RR bounce decision.  Returns (state, rng_state):
    state (nt*16, RAY_TILE) f32 rows per tile [bo xyz, bd xyz, tp rgb,
    rd rgb, alive, pad x3]; rng_state (nt*8, RAY_TILE) i32, row 0 live.

    ``plan``: optional precomputed ``(order, entry)`` from
    ``camera_tile_plan`` + ``_pad_plan_rows`` — the plan is
    sample-independent, so spp loops pass it in once instead of
    duplicating its build per sample in the traced graph.

    ``chunk``: sublane-chunk gating of the flat-scan dense visits and
    shadow walks (``visit_block_chunked``; None = the RT_EMIT_CHUNK
    default).  The camera pass has whole sky row-chunks and best-t-
    pruned rows the (1, RT) any-gate cannot skip; chunk preds can —
    bit-identical winner updates (same per-row take rule).  Only
    active on the flat-scan path (plan traversal keeps full tiles).

    ``cand_plan``: optional ``ops.binned.CandidatePlan`` built for
    EXACTLY this (scene, camera, padded tile stream) — the depth-0
    traversal then streams each tile's precomputed triangle-granularity
    candidate chunks from HBM instead of walking blocks (~15x fewer
    dense pairs on the frog camera pass).  Bit-identical winners in
    exact semantics (conservative superset + order-invariant (t, id)
    selection).
    """
    grid = scene.accel
    xs, ys, n, np_rays = _pad_tiles(xs, ys)
    nt = np_rays // RAY_TILE
    if chunk is None:
        chunk = _EMIT_CHUNK
    if cand_plan is not None:
        chunk = 0  # row-chunk gating is a flat-scan knob; binned replaces it
    if chunk and (RAY_TILE % chunk or chunk % 8 or dialect == "cpuonly"
                  or not emit_flat(grid.num_blocks)):
        chunk = 0

    if cand_plan is not None:
        # the binned walk replaces the superblock plan entirely (the
        # kernel's depth-0 traversal and has_work both read the
        # candidate meta) — dummies keep the operand arity without
        # paying the hull/slab/argsort build per emit
        order = jnp.zeros((nt, 8), jnp.int32)
        entry = jnp.zeros((nt, 8), jnp.float32)
    elif plan is None:
        order, entry = camera_tile_plan(scene.camera, xs, ys, grid, RAY_TILE)
        order, entry = _pad_plan_rows(order, entry)
    else:
        order, entry = plan
    ls = order.shape[1]

    if cand_plan is not None:
        assert cand_plan.meta.shape[0] == nt, (
            "candidate plan built for a different tile stream")
        cmeta, cstream = cand_plan.meta, cand_plan.stream
        binned_chunk = int(cand_plan.chunk)
    else:
        cmeta = jnp.zeros((nt, 8), jnp.int32)
        cstream = jnp.zeros((16, 128), jnp.float32)
        binned_chunk = 0

    xy = jnp.concatenate(
        [xs.reshape(nt, 1, RAY_TILE), ys.reshape(nt, 1, RAY_TILE),
         jnp.zeros((nt, 6, RAY_TILE), xs.dtype)], axis=1
    ).reshape(8 * nt, RAY_TILE)

    (scalar_ops, scalar_specs, geom_ops, geom_specs,
     n_lights, n_objects) = _scene_rows(scene, grid)
    off_row = jnp.asarray(sample_offset, jnp.int32).reshape(1, 1)
    l = grid.num_blocks

    in_specs = (
        [pl.BlockSpec((8, RAY_TILE), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)]
        + scalar_specs
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + geom_specs
        + [pl.BlockSpec((8, ls), lambda i: (i // 8, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec((8, ls), lambda i: (i // 8, 0),
                        memory_space=pltpu.SMEM),
           # binned candidate plan: per-tile meta scalars + the HBM
           # chunk stream (dummies when binned_chunk == 0)
           pl.BlockSpec((8, 8), lambda i: (i // 8, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pl.ANY)]
    )

    scratch = _bounce_scratch(dialect == "cpuonly")
    if chunk:
        scratch += [pltpu.VMEM((RAY_TILE, 1), jnp.float32),
                    pltpu.VMEM((RAY_TILE, 1), jnp.int32)]
    if binned_chunk:
        from .binned import CAND_ROWS

        scratch += [pltpu.VMEM((2, CAND_ROWS, binned_chunk), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
    st, rng = pl.pallas_call(
        partial(_emit_kernel, det_eps, tmin, shadow_eps, shadow_tmin,
                bool(scene.diffuse_bounce),
                dialect, jitter, int(shadow_samples),
                l, ls, n_lights, n_objects, mm_attrs_mode(grid, interpret),
                mats_mm_mode(n_objects, interpret),
                quarters_for(grid.tri_index.shape[1]), int(chunk),
                binned_chunk),
        out_shape=[
            jax.ShapeDtypeStruct((nt * _ST_ROWS, RAY_TILE), jnp.float32),
            jax.ShapeDtypeStruct((nt * 8, RAY_TILE), jnp.int32),
        ],
        grid_spec=pl.GridSpec(
            grid=(nt,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((_ST_ROWS, RAY_TILE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, RAY_TILE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        ),
        interpret=interpret,
    )(xy, *scalar_ops, off_row, *geom_ops, order, entry, cmeta, cstream)
    return st, rng


@partial(jax.jit, static_argnames=("interpret", "det_eps", "tmin",
                                   "shadow_eps", "shadow_tmin",
                                   "dialect", "shadow_samples"))
def resume_tiles(
    scene,
    state: Array,
    rng_state: Array,
    *,
    interpret: bool = False,
    det_eps: float = 1e-8,
    tmin: float = 1e-4,
    shadow_eps: float = 1e-3,
    shadow_tmin: float = 1e-4,
    dialect: str = "gpu",
    shadow_samples: int = 1,
):
    """Bounce depths 1..max_bounces-1 on (usually sorted/compacted)
    per-ray state from ``emit_tiles``.  Returns the per-ray path
    radiance (nt, RAY_TILE) x rgb, in the state's ray order."""
    grid = scene.accel
    nt = state.shape[0] // _ST_ROWS

    (scalar_ops, scalar_specs, geom_ops, geom_specs,
     n_lights, n_objects) = _scene_rows(scene, grid)
    l = grid.num_blocks
    # the resume pass never traverses with a plan; tiny dummies keep
    # the shared traverse builder's signature satisfied
    order = jnp.zeros((8, 128), jnp.int32)
    entry = jnp.zeros((8, 128), jnp.float32)

    in_specs = (
        scalar_specs
        + geom_specs
        + [pl.BlockSpec((8, 128), lambda i: (0, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec((8, 128), lambda i: (0, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec((_ST_ROWS, RAY_TILE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((8, RAY_TILE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]
    )
    out_row = lambda: pl.BlockSpec(
        (8, RAY_TILE), lambda i: (i // 8, 0), memory_space=pltpu.VMEM
    )

    outs = pl.pallas_call(
        partial(_resume_kernel, det_eps, tmin, shadow_eps, shadow_tmin,
                int(scene.max_bounces), bool(scene.diffuse_bounce),
                dialect, int(shadow_samples),
                l, 128, n_lights, n_objects, mm_attrs_mode(grid, interpret),
                mats_mm_mode(n_objects, interpret),
                quarters_for(grid.tri_index.shape[1])),
        out_shape=[jax.ShapeDtypeStruct((nt, RAY_TILE), jnp.float32)] * 3,
        grid_spec=pl.GridSpec(
            grid=(nt,),
            in_specs=in_specs,
            out_specs=[out_row(), out_row(), out_row()],
            scratch_shapes=_bounce_scratch(dialect == "cpuonly"),
        ),
        interpret=interpret,
    )(*scalar_ops, *geom_ops, order, entry, state, rng_state)
    return outs


def _bounce_step_kernel(det_eps, tmin, shadow_eps, shadow_tmin,
                        diffuse_bounce, dialect, shadow_samples, chunk,
                        diff_out, binned_chunk,
                        num_blocks, num_supers, n_lights, n_objects,
                        mm_attrs, mats_mm, nq,
                        cam_ref, lights_ref, mats_ref,
                        tri_ref, norm_ref, ids_ref, obj_ref, aabb_ref,
                        alane_ref, qsel_ref, matsq_ref, qaabb_ref,
                        order_ref, entry_ref,
                        st_ref, rng_ref, *rest):
    if binned_chunk:
        cmeta_ref, cstream_ref, st_out, rng_out, *rest = rest
    else:
        st_out, rng_out, *rest = rest
    """ONE planned bounce on packed per-ray state (state in, state out).

    The staged wavefront scheduler re-sorts the alive prefix between
    bounces, so every call sees freshly packed, spatially coherent
    tiles with a per-tile traversal plan that is exactly valid for this
    bounce's origins/directions (``wavefront.bounce_tile_plan``).
    Radiance rides in the state's rd rows — dead tiles pass through."""
    cpuonly = dialect == "cpuonly"
    spos_scr = None
    col_scr = None
    diff_ref = None
    uv_scr = vis_scr = dec_scr = None
    cand_buf = cand_sem = None
    if diff_out:
        diff_ref, *scratch = rest
        if binned_chunk:
            *scratch, u_l, v_l, vis_scr, dec_scr, cand_buf, cand_sem = \
                scratch
        else:
            *scratch, u_l, v_l, vis_scr, dec_scr = scratch
        uv_scr = (u_l, v_l)
        scratch = tuple(scratch)
    else:
        scratch = rest
    if cpuonly:
        (t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
         blk_lane,
         tp_r, tp_g, tp_b, rd_r, rd_g, rd_b, rng_st, alive_st,
         bo_x, bo_y, bo_z, bd_x, bd_y, bd_z, hm_x, hm_y, hm_z,
         sp_x, sp_y, sp_z, unocc) = scratch
        spos_scr = (sp_x, sp_y, sp_z, unocc)
    elif chunk:
        (t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
         blk_lane,
         tp_r, tp_g, tp_b, rd_r, rd_g, rd_b, rng_st, alive_st,
         bo_x, bo_y, bo_z, bd_x, bd_y, bd_z, hm_x, hm_y, hm_z,
         sblk_c, blk_c) = scratch
        col_scr = (sblk_c, blk_c)
    else:
        (t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
         blk_lane,
         tp_r, tp_g, tp_b, rd_r, rd_g, rd_b, rng_st, alive_st,
         bo_x, bo_y, bo_z, bd_x, bd_y, bd_z, hm_x, hm_y, hm_z) = scratch
    rt = t_col.shape[0]
    row = jax.lax.rem(pl.program_id(0), 8)
    miss_r, miss_g, miss_b = cam_ref[0, 12], cam_ref[0, 13], cam_ref[0, 14]

    for r_, ref in enumerate((bo_x, bo_y, bo_z, bd_x, bd_y, bd_z,
                              tp_r, tp_g, tp_b, rd_r, rd_g, rd_b,
                              alive_st)):
        ref[:] = st_ref[pl.ds(r_, 1), :]
    rng_st[:] = rng_ref[pl.ds(0, 1), :]

    traverse = _make_traverse(
        det_eps, tmin, num_blocks, num_supers, row,
        tri_ref, norm_ref, ids_ref, obj_ref, aabb_ref, alane_ref,
        order_ref, entry_ref,
        t_col, idx_col, t_lane, nx_l, ny_l, nz_l, obj_l, blk_win,
        chunk=chunk, col_scr=col_scr,
        dialect=dialect, qsel_ref=qsel_ref if mm_attrs else None,
        mm_f32_dot=mm_attrs == 2, qaabb_ref=qaabb_ref, nq=nq,
        uv_scr=uv_scr,
        binned=((cstream_ref, cmeta_ref, cand_buf, cand_sem)
                if binned_chunk else None),
    )
    shade = _make_shade(
        det_eps, shadow_eps, shadow_tmin, num_blocks, n_lights, n_objects,
        tri_ref, ids_ref, aabb_ref, lights_ref, mats_ref,
        t_lane, nx_l, ny_l, nz_l, obj_l, blk_lane,
        chunk=chunk,
        blk_col=col_scr[0] if chunk else None,
        dialect=dialect, shadow_samples=shadow_samples, rng_st=rng_st,
        spos_scr=spos_scr, matsq_ref=matsq_ref, mats_mm=mats_mm,
        qaabb_ref=qaabb_ref, nq=nq, vis_scr=vis_scr,
    )
    rng_next_lane, hemisphere = _make_rng_hemisphere(
        rng_st, hm_x, hm_y, hm_z)
    bounce = _make_bounce(
        traverse, shade, rng_next_lane, hemisphere,
        diffuse_bounce, n_objects, (miss_r, miss_g, miss_b), mats_ref,
        (tp_r, tp_g, tp_b), (rd_r, rd_g, rd_b), rng_st, alive_st,
        (bo_x, bo_y, bo_z), (bd_x, bd_y, bd_z),
        nx_l, ny_l, nz_l, obj_l, hm_refs=(hm_x, hm_y, hm_z),
        chunk_shadow=bool(chunk), dialect=dialect,
        matsq_ref=matsq_ref, mats_mm=mats_mm, dec_scr=dec_scr,
    )

    if diff_out:
        # defaults for dead/passthrough tiles: no hit, nothing visible
        rtw = t_col.shape[0]
        diff_ref[pl.ds(0, 1), :] = jnp.full((1, rtw), F32_MAX, jnp.float32)
        for r_ in (1, 2, 5, 6, 7):
            diff_ref[pl.ds(r_, 1), :] = jnp.zeros((1, rtw), jnp.float32)
        diff_ref[pl.ds(3, 1), :] = jnp.full((1, rtw), -1.0, jnp.float32)
        diff_ref[pl.ds(4, 1), :] = jnp.zeros((1, rtw), jnp.float32)

    # dead tiles (the sorted suffix) skip straight to the passthrough
    @pl.when(jnp.any(alive_st[:] > 0.0))
    def _():
        bounce("binned" if binned_chunk
               else not staged_flat(num_blocks))
        if diff_out:
            # oracle rows: [t, u, v, idx, vis bits, decision bits, 0, 0]
            # (ints as exact f32; consumed by the detached-diff chain)
            diff_ref[pl.ds(0, 1), :] = t_lane[:]
            diff_ref[pl.ds(1, 1), :] = uv_scr[0][:]
            diff_ref[pl.ds(2, 1), :] = uv_scr[1][:]
            diff_ref[pl.ds(3, 1), :] = _to_lane(
                idx_col[:]).astype(jnp.float32)
            diff_ref[pl.ds(4, 1), :] = vis_scr[:].astype(jnp.float32)
            diff_ref[pl.ds(5, 1), :] = dec_scr[:].astype(jnp.float32)

    for r_, ref in enumerate((bo_x, bo_y, bo_z, bd_x, bd_y, bd_z,
                              tp_r, tp_g, tp_b, rd_r, rd_g, rd_b,
                              alive_st)):
        st_out[pl.ds(r_, 1), :] = ref[:]
    zeros = jnp.zeros((1, rt), jnp.float32)
    for r_ in range(_ST_LIVE_ROWS, _ST_ROWS):
        st_out[pl.ds(r_, 1), :] = zeros
    rng_out[pl.ds(0, 1), :] = rng_st[:]
    zeros_i = jnp.zeros((1, rt), jnp.int32)
    for r_ in range(1, 8):
        rng_out[pl.ds(r_, 1), :] = zeros_i


def bounce_step_tiles(
    scene,
    state: Array,
    rng_state: Array,
    order: Array,
    entry: Array,
    *,
    interpret: bool = False,
    det_eps: float = 1e-8,
    tmin: float = 1e-4,
    shadow_eps: float = 1e-3,
    shadow_tmin: float = 1e-4,
    dialect: str = "gpu",
    shadow_samples: int = 1,
    chunk: int = 0,
    diff_out: bool = False,
    cand_meta=None,
    cand_stream=None,
    cand_chunk: int = 0,
):
    """One planned bounce over packed state tiles -> (state', rng').

    ``(order, entry)`` is the per-tile front-to-back superblock plan
    from ``wavefront.bounce_tile_plan`` (padded via ``_pad_plan_rows``).
    Not jitted on its own: the staged wavefront scheduler traces it
    inside its bounce loop.

    ``chunk``: sublane-chunk gating of the dense visits (see
    ``_make_traverse.visit_block_chunked``) — the compaction sort
    clusters slab-passing lanes, so post-sort tiles can skip whole
    dead row-chunks; 0 = full-tile visits.

    ``diff_out``: additionally return a (nt*8, RAY_TILE) f32 oracle
    block per tile — rows [winner t, u, v, global id, per-light
    visibility bits, decision bits, 0, 0] (ints as exact f32) — the
    detached residuals the differentiable integrator consumes instead
    of launching standalone closest/occlusion kernels
    (``integrator``'s fused-oracle mode)."""
    grid = scene.accel
    nt = state.shape[0] // _ST_ROWS
    rt = state.shape[1]  # tile width: RAY_TILE, or the narrower ladder
    ls = order.shape[1]
    if chunk and (rt % chunk or chunk % 8 or dialect == "cpuonly"):
        chunk = 0
    if diff_out:
        assert dialect == "gpu" and not chunk, \
            "diff oracle: gpu dialect, unchunked visits"
    if cand_chunk:
        # binned candidate traversal (ops.binned): only wired for the
        # oracle's depth-0 camera bounce — the plan is a per-TILE
        # camera bin, meaningless for re-sorted bounce wavefronts
        assert diff_out, "binned bounce: oracle (diff_out) path only"
        assert cand_meta.shape[0] == nt, \
            "candidate plan built for a different tile stream"

    (scalar_ops, scalar_specs, geom_ops, geom_specs,
     n_lights, n_objects) = _scene_rows(scene, grid)
    l = grid.num_blocks

    in_specs = (
        scalar_specs
        + geom_specs
        + [pl.BlockSpec((8, ls), lambda i: (i // 8, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec((8, ls), lambda i: (i // 8, 0),
                        memory_space=pltpu.SMEM),
           pl.BlockSpec((_ST_ROWS, rt), lambda i: (i, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((8, rt), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]
    )
    if cand_chunk:
        in_specs = in_specs + [
            pl.BlockSpec((8, 8), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]

    scratch = _bounce_scratch(dialect == "cpuonly", rt=rt)
    if chunk:
        scratch += [pltpu.VMEM((rt, 1), jnp.float32),
                    pltpu.VMEM((rt, 1), jnp.int32)]
    out_shapes = [
        jax.ShapeDtypeStruct((nt * _ST_ROWS, rt), jnp.float32),
        jax.ShapeDtypeStruct((nt * 8, rt), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((_ST_ROWS, rt), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, rt), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if diff_out:
        out_shapes.append(
            jax.ShapeDtypeStruct((nt * 8, rt), jnp.float32))
        out_specs.append(pl.BlockSpec((8, rt), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        # uv capture + per-light visibility bits + decision bits
        scratch += [pltpu.VMEM((1, rt), jnp.float32),
                    pltpu.VMEM((1, rt), jnp.float32),
                    pltpu.VMEM((1, rt), jnp.int32),
                    pltpu.VMEM((1, rt), jnp.int32)]
    extra_ops = ()
    if cand_chunk:
        from .binned import CAND_ROWS

        scratch += [pltpu.VMEM((2, CAND_ROWS, cand_chunk), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
        extra_ops = (cand_meta, cand_stream)
    outs = pl.pallas_call(
        partial(_bounce_step_kernel, det_eps, tmin, shadow_eps, shadow_tmin,
                bool(scene.diffuse_bounce), dialect, int(shadow_samples),
                int(chunk), bool(diff_out), int(cand_chunk),
                l, ls, n_lights, n_objects, mm_attrs_mode(grid, interpret),
                mats_mm_mode(n_objects, interpret),
                quarters_for(grid.tri_index.shape[1])),
        out_shape=out_shapes,
        grid_spec=pl.GridSpec(
            grid=(nt,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        interpret=interpret,
    )(*scalar_ops, *geom_ops, order, entry, state, rng_state, *extra_ops)
    return tuple(outs)
