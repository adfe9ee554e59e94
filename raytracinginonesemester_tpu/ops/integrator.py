"""Path integrator: fixed-depth wavefront loop with throughput/radiance carry.

TPU-native port of the *iterative* tracer the reference proved on GPU
(``TraceRayIterative``, ``GPUandCPU/include/query.h:156-220``) — the same
semantics as CPUOnly's recursive ``TraceRay``
(``CPUOnly/include/raytracer.h:215-260``) restated as a loop, which is
exactly the shape ``lax.scan`` wants: static depth, whole-wavefront state,
per-lane aliveness masks instead of control flow.

Per bounce:  closest hit -> miss shading -> direct lighting (+shadows) ->
Russian-roulette diffuse/mirror split -> throughput update -> early-out.
RNG is the reference's per-ray uint32 stream (bit-compatible, see
``core.rng``); masked state threading reproduces the scalar code's
draws-only-when-the-branch-is-taken behavior lane by lane.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from ..core import rng as rnglib
from ..core.vecmath import reflect
from ..scene.build import Scene
from . import shading
from .intersect import (FLT_EPSILON, HitData, intersect_closest,
                        make_hit_frame, mt_single)

__all__ = ["trace_rays", "make_bounce_step"]

import os as _os

# read ONCE at import (an env read at trace time would be captured by
# the first trace and masked by the jit cache)
_STREAM_ENV = _os.environ.get("RT_STREAM", "1") == "1"
# block-major streaming for >VMEM scenes (round-4 verdict #3): stream
# each 64-block scene slab once per 32k-ray chunk instead of once per
# 512-ray tile.  Default OFF — measured on-chip at 1.27M tris it is a
# 3x REGRESSION vs the plan-walk kernels (closest 1481 vs 494 ms;
# ~2 GB/s effective scene read — the 2D-grid pipeline restarts per
# (chunk, slab) step dominate the DMA saving), and its occlusion
# variant faulted the TPU worker on the full-frame render
# (docs/DESIGN.md round 5).  "1" re-enables for re-measurement.
_STREAM_BLOCKMAJOR = _os.environ.get("RT_STREAM_BLOCKMAJOR", "0") == "1"

# Debug-only gradient bisection for the detached-diff path: a comma
# list of cut points ("tri", "tuv", "p", "n") that stop_gradient the
# named intermediate, isolating which backward branch costs what
# (scripts/probe_grad_parts.py).  Wrong gradients when set — never use
# outside probes.
_DIFF_SG = set(filter(None, _os.environ.get("RT_DIFF_SG", "").split(",")))
# Read ONCE at import, like _STREAM_ENV: an env read at trace time
# would be captured by the first trace and masked by the jit cache
# (flipping the knob between renders would silently do nothing).
_DIFF_UNROLL_ENV = _os.environ.get("RT_DIFF_UNROLL", "")
# Fused detached oracle for differentiable scenes (ops.diff_oracle):
# ONE fused bounce kernel per depth supplies winners + shadow
# visibility + branch decisions, replacing the 2 closest + 2 occlusion
# standalone launches per step (42.7 of 84.1 ms at 960x540 bounces-2,
# round-4 profile).  "0" keeps the standalone detached kernels.
_DIFF_ORACLE = _os.environ.get("RT_DIFF_ORACLE", "1") == "1"

# Binned camera-candidate plan for the fused oracle's depth-0 bounce
# (ops.binned): set by callers (diff/inverse.py, bench --grad) around
# tracing via ``diff_candidate_plan`` — a context, not a function arg,
# so the public render chain's signatures stay unchanged.  The holder
# carries the STATIC part only (meta rows + global candidate ids);
# trace_rays regathers the plane stream from the CURRENT grid inside
# the trace (``binned.refresh_stream``), so vertex-optimization steps
# never see stale geometry.  The candidate SET stays conservative
# while every vertex moves less than the plan's build slack — rebuild
# the plan on that cadence (refit-vs-rebuild contract).
_DIFF_CAND = [None]


class diff_candidate_plan:
    """Context manager: route the detached-diff oracle's depth-0 bounce
    through a binned candidate plan.  ``meta``/``gids`` are the static
    plan parts (``binned`` build + ``plan_candidate_gids``); ``chunk``
    the candidate lane width."""

    def __init__(self, meta, gids, chunk: int):
        self._v = (meta, gids, int(chunk))

    def __enter__(self):
        _DIFF_CAND.append(self._v)
        return self

    def __exit__(self, *exc):
        _DIFF_CAND.pop()
        return False
# Fused in-kernel shadow visibility for detached-diff scenes (see
# make_bounce_step).  Default OFF — re-measured after the round-4
# backward cleanup and it still loses (87.4 -> 129.7 ms/step on the
# grad bench: the fused kernel's in-kernel normal+shadow work costs
# more than the two occlusion launches it replaces, same verdict as
# round 3's 310 -> 348).  Read once at import like every knob here.
_DIFF_FUSED_SHADOW = _os.environ.get("RT_DIFF_FUSED_SHADOW", "0") == "1"
# Remat the unrolled diff bounce chain (save only kernel outputs);
# see trace_rays.  Default OFF: at the whole-frame tiling render_loss
# now defaults to, storing residuals beats recomputing the chains
# (119 vs 138 ms/step @960x540 bounces-2); at small ray tiles the
# stacked-residual carry dominates and remat wins (136 vs 174) — set
# RT_DIFF_REMAT=1 together with an explicit ray_tile.
_DIFF_REMAT = _os.environ.get("RT_DIFF_REMAT", "0") == "1"


def merge_hits_over_axis(hits, axis_name: str, extra=None):
    """Min-t merge of per-shard HitData across a mesh axis.

    The collective analog of the reference's sequential closest-t update
    (``query.h:254-263``) when triangle testing is sharded over devices:
    all_gather the per-shard candidates (a few scalars per ray) and select
    the global minimum, lowest shard winning ties.  ``extra`` (R, K)
    per-ray payload (e.g. kernel-computed normals) merges with the same
    selection.
    """
    from .intersect import HitData

    t = jax.lax.all_gather(hits.t, axis_name)  # (S, R)
    u = jax.lax.all_gather(hits.u, axis_name)
    v = jax.lax.all_gather(hits.v, axis_name)
    idx = jax.lax.all_gather(hits.tri_idx, axis_name)
    # lexicographic (t, global tri id): partition-invariant and identical
    # to the unsharded tie-break (smallest original index wins)
    min_t = jnp.min(t, axis=0, keepdims=True)
    id_key = jnp.where((t == min_t) & (idx >= 0), idx, 2**31 - 1)
    best_id = jnp.min(id_key, axis=0, keepdims=True)
    best = jnp.argmax((t == min_t) & (id_key == best_id), axis=0)
    cols = jnp.arange(t.shape[1])
    merged = HitData(
        t=t[best, cols],
        u=u[best, cols],
        v=v[best, cols],
        tri_idx=idx[best, cols],
        hit=idx[best, cols] >= 0,
    )
    if extra is None:
        return merged
    ex = jax.lax.all_gather(extra, axis_name)  # (S, R, K)
    return merged, ex[best, cols]


def make_bounce_step(scene: Scene, model_axis: str | None = None,
                     oracle=None):
    """Build the integrator's single-bounce step for a scene.

    Returns ``bounce(carry, _) -> (carry, None)`` over the wavefront
    carry ``(origins, dirs, throughput, radiance, rng_state, alive)``
    — the loop body of ``TraceRayIterative`` (query.h:165-216) with
    the scene's dialect rules, acceleration dispatch, and (under
    ``model_axis``) the collective hit merges baked in.  Shared by
    ``trace_rays`` and the compacted sharded scheduler
    (``parallel.wavefront_sharded``), so the two can never drift.

    ``oracle``: per-bounce detached residuals from
    ``ops.diff_oracle.fused_bounce_oracle`` — the differentiable chain
    then consumes the fused kernel's winners/visibility/decisions
    (indexed by the static bounce index ``k`` the unrolled caller
    passes) instead of launching standalone closest/occlusion kernels.
    """
    gpu = scene.dialect == "gpu"
    det_eps = 1e-8 if gpu else FLT_EPSILON
    offset_eps = shading.RT_EPS_GPU if gpu else shading.RT_EPS_CPUONLY
    tmin = 1e-4  # kRayTMin (query.h:230) == CPUOnly RT_EPS
    diffuse_bounce = scene.diffuse_bounce

    geom = scene.geometry

    # kernel_normals: the gpu dialect's shading-normal hygiene runs inside
    # the Pallas kernel (VMEM planes), skipping make_hit_frame's HBM
    # gathers entirely.  kernel_shadows: point-light shadow rays are
    # traced in the same kernel invocation too (fused IsInShadow).
    use_pallas = scene.use_pallas
    if use_pallas is None:
        # auto: fused kernels on real TPU; interpret mode is test-only
        use_pallas = jax.default_backend() == "tpu"
    grid_chunks = 1
    streamed = False
    if use_pallas and scene.accel is not None:
        from .pallas_kernels import num_chunks_for

        # scenes whose planes exceed VMEM: default to the streamed
        # kernels (ONE launch; planes stay in HBM and DMA through a
        # double-buffered VMEM window, pallas_kernels "streamed
        # variants"); RT_STREAM=0 falls back to the launch-per-chunk
        # variants.  Results are bit-identical either way
        # (test_pallas.py): same visit math, same (t, id) tie-break.
        grid_chunks = num_chunks_for(scene.accel)
        streamed = grid_chunks > 1 and _STREAM_ENV

    # detached-diff mode needs differentiable normals (make_hit_frame
    # gathers), so the in-kernel normal fusion is discarded there; the
    # fused SHADOW visibility is optional (RT_DIFF_FUSED_SHADOW) and
    # measured SLOWER both times it was tried (round 3: 310 -> 348 ms;
    # round 4, after the gather cleanup: 87.4 -> 129.7 ms/step) — the
    # kernel's in-kernel normal+shadow work costs more than the two
    # occlusion launches it replaces.  The estimator is identical
    # either way: visibility is a sg'd 0/1 step from bit-equal primal
    # hit points.
    differentiable = bool(getattr(scene, "differentiable", False))
    fused_shadow_diff = (differentiable and _DIFF_FUSED_SHADOW)
    kernel_normals = (scene.accel is not None and use_pallas and gpu
                      and (not differentiable or fused_shadow_diff)
                      and not streamed)
    # gpu lights are always point lights; under model sharding each shard
    # only sees its own blocks, so fused visibility would be partial —
    # fall back to the psum'd occlusion kernel there.  Chunked grids
    # likewise: per-chunk hit points are provisional until the merge.
    kernel_shadows = kernel_normals and model_axis is None and grid_chunks == 1

    if scene.accel is not None and use_pallas:
        from .pallas_kernels import (
            pallas_block_closest,
            pallas_block_closest_chunked,
            pallas_block_occluded,
            pallas_block_occluded_chunked,
        )

        interp = jax.default_backend() != "tpu"  # interpret off-TPU

        if grid_chunks == 1:
            def closest_local(o, d, shared=False):
                return pallas_block_closest(
                    o, d, scene.accel, tmin=tmin, det_eps=det_eps,
                    interpret=interp, return_normal=kernel_normals,
                    shadow_lights=(
                        scene.lights.position if kernel_shadows else None),
                    shadow_eps=shading.RT_EPS_GPU,
                    shadow_tmin=1e-4,
                    shared_origin=shared,
                )

            def occlude_local(o, d, s_tmin, s_tmax):
                return pallas_block_occluded(
                    o, d, scene.accel, tmin=s_tmin, tmax=s_tmax,
                    det_eps=det_eps, interpret=interp,
                )
        elif streamed and _STREAM_BLOCKMAJOR:
            from .pallas_kernels import (
                pallas_block_closest_blockmajor,
                pallas_block_occluded_blockmajor,
            )

            def closest_local(o, d, shared=False):
                return pallas_block_closest_blockmajor(
                    o, d, scene.accel, tmin=tmin, det_eps=det_eps,
                    interpret=interp,
                )

            def occlude_local(o, d, s_tmin, s_tmax):
                return pallas_block_occluded_blockmajor(
                    o, d, scene.accel, tmin=s_tmin, tmax=s_tmax,
                    det_eps=det_eps, interpret=interp,
                )
        elif streamed:
            from .pallas_kernels import (
                pallas_block_closest_streamed,
                pallas_block_occluded_streamed,
            )

            def closest_local(o, d, shared=False):
                return pallas_block_closest_streamed(
                    o, d, scene.accel, tmin=tmin, det_eps=det_eps,
                    interpret=interp,
                )

            def occlude_local(o, d, s_tmin, s_tmax):
                return pallas_block_occluded_streamed(
                    o, d, scene.accel, tmin=s_tmin, tmax=s_tmax,
                    det_eps=det_eps, interpret=interp,
                )
        else:
            def closest_local(o, d, shared=False):
                return pallas_block_closest_chunked(
                    o, d, scene.accel, tmin=tmin, det_eps=det_eps,
                    interpret=interp, return_normal=kernel_normals,
                    num_chunks=grid_chunks,
                )

            def occlude_local(o, d, s_tmin, s_tmax):
                return pallas_block_occluded_chunked(
                    o, d, scene.accel, tmin=s_tmin, tmax=s_tmax,
                    det_eps=det_eps, interpret=interp,
                    num_chunks=grid_chunks,
                )
    elif scene.accel is not None:
        from .accel import block_closest, block_occluded

        def closest_local(o, d, shared=False):
            return block_closest(o, d, scene.accel, tmin=tmin, det_eps=det_eps)

        def occlude_local(o, d, s_tmin, s_tmax):
            return block_occluded(
                o, d, scene.accel, tmin=s_tmin, tmax=s_tmax, det_eps=det_eps
            )
    else:

        def closest_local(o, d, shared=False):
            return intersect_closest(o, d, geom.vertices, tmin=tmin, det_eps=det_eps)

        def occlude_local(o, d, s_tmin, s_tmax):
            from .intersect import occluded

            return occluded(
                o, d, geom.vertices, tmin=s_tmin, tmax=s_tmax, det_eps=det_eps
            )

    # normalize closest_fn to return (hits, normal_or_None, vis_or_None)
    if model_axis is None:
        if kernel_shadows:
            closest_fn = closest_local  # already a 3-tuple
        elif kernel_normals:
            def closest_fn(o, d, shared=False):
                h, n = closest_local(o, d, shared=shared)
                return h, n, None
        else:
            def closest_fn(o, d, shared=False):
                return closest_local(o, d, shared=shared), None, None
        occlude_fn = occlude_local
    else:
        # triangle testing sharded over `model_axis`: local candidates are
        # merged by collectives (the ICI analog of cross-thread reduction)
        def closest_fn(o, d, shared=False):
            if kernel_normals:
                local, nrm = closest_local(o, d, shared=shared)
                h, n = merge_hits_over_axis(local, model_axis, extra=nrm)
                return h, n, None
            return (
                merge_hits_over_axis(closest_local(o, d, shared=shared),
                                     model_axis),
                None,
                None,
            )

        def occlude_fn(o, d, s_tmin, s_tmax):
            local = occlude_local(o, d, s_tmin, s_tmax)
            return jax.lax.psum(local.astype(jnp.int32), model_axis) > 0

    tri_cell = [None]  # set by the detached closest_fn below
    oracle_closest = None
    if oracle is not None:
        # Fused detached oracle (ops.diff_oracle): winners, visibility,
        # and branch decisions come from the fused bounce kernels;
        # the gradient-carrying recompute below is IDENTICAL to the
        # standalone detached path's.
        assert differentiable and scene.accel is not None and gpu
        sg = jax.lax.stop_gradient
        from jax.ad_checkpoint import checkpoint_name

        _ckpt = lambda x: checkpoint_name(x, "diff_kernel")
        from .diff_gather import gather_rows
        interp_g = jax.default_backend() != "tpu"
        n_lights_o = int(scene.lights.intensity.shape[0])

        def oracle_closest(o, d, k):
            idx_raw = _ckpt(oracle["idx"][k])
            hits = HitData(t=_ckpt(oracle["t"][k]), u=_ckpt(oracle["u"][k]),
                           v=_ckpt(oracle["v"][k]), tri_idx=idx_raw,
                           hit=idx_raw >= 0)
            idx = jnp.maximum(idx_raw, 0)
            tri = gather_rows(geom.vertices.shape[0], interp_g,
                              geom.vertices, idx)
            if "tri" in _DIFF_SG:
                tri = sg(tri)
            tn = gather_rows(geom.normals.shape[0], interp_g,
                             geom.normals, idx)
            tri_cell[0] = (tri, tn)
            t2, u2, v2 = mt_single(o, d, tri, det_eps)
            thru = lambda a, b: a + (b - sg(b))
            hits = HitData(
                t=thru(hits.t, t2), u=thru(hits.u, u2),
                v=thru(hits.v, v2), tri_idx=hits.tri_idx, hit=hits.hit,
            )
            if "tuv" in _DIFF_SG:
                hits = jax.tree.map(sg, hits)
            vis_bits = _ckpt(oracle["vis"][k])
            kv = jnp.stack(
                [((vis_bits >> li) & 1).astype(jnp.float32)
                 for li in range(n_lights_o)], axis=1)
            return hits, None, kv, _ckpt(oracle["dec"][k])

    if differentiable and scene.accel is not None and oracle is None:
        # Detached-traversal differentiable mode: the (dynamic-loop,
        # non-differentiable) block/Pallas traversal runs entirely under
        # stop_gradient to pick the winner triangle; a per-ray
        # Moller-Trumbore on the gathered winner then carries gradients
        # w.r.t. vertices/origins/directions, while the primal t/u/v
        # pass through BIT-EXACTLY via a + (b - stop_gradient(b)).
        # This is the standard detached estimator (the discrete
        # which-triangle choice has zero gradient anyway away from
        # silhouettes, exactly like the brute-force path's argmin).
        sg = jax.lax.stop_gradient
        from jax.ad_checkpoint import checkpoint_name

        # tag the kernel outputs so the RT_DIFF_REMAT policy saves them
        # across the remat boundary (everything else is recomputed in
        # the backward pass; the Pallas kernels must NOT re-run there)
        _ckpt = lambda x: checkpoint_name(x, "diff_kernel")
        inner_closest = closest_fn
        def closest_fn(o, d, shared=False):
            hits, kn, kv = inner_closest(sg(o), sg(d), shared=shared)
            hits = jax.tree.map(lambda x: _ckpt(sg(x)), hits)
            idx = jnp.maximum(hits.tri_idx, 0)
            # differentiable gather (R, 3, 3); stashed in tri_cell so
            # make_hit_frame reuses it and the gather is paid once per
            # bounce, not twice.  The custom VJP routes the vertex
            # cotangent through the Pallas one-hot MXU accumulate
            # (ops.diff_gather) instead of XLA's scatter-add — the
            # scatter was the largest single term of the backward pass
            # (~37 ms/bounce at 518k rays; scripts/probe_grad_cost.py)
            from .diff_gather import gather_rows
            interp_g = jax.default_backend() != "tpu"
            tri = gather_rows(geom.vertices.shape[0], interp_g,
                              geom.vertices, idx)
            if "tri" in _DIFF_SG:
                tri = sg(tri)
            # winner NORMALS ride the same MXU one-hot gather: the XLA
            # row gather costs ~4 ms/call at R=518k (profiled round 4)
            # and the backward scatter (if normals are ever optimized)
            # gets the Pallas accumulate for free
            tn = gather_rows(geom.normals.shape[0], interp_g,
                             geom.normals, idx)
            tri_cell[0] = (tri, tn)
            t2, u2, v2 = mt_single(o, d, tri, det_eps)
            thru = lambda a, b: a + (b - sg(b))
            hits = HitData(
                t=thru(hits.t, t2), u=thru(hits.u, u2),
                v=thru(hits.v, v2), tri_idx=hits.tri_idx, hit=hits.hit,
            )
            if "tuv" in _DIFF_SG:
                hits = jax.tree.map(sg, hits)
            # the kernel NORMAL is non-differentiable — discard it and
            # let the dispatch below recompute it via make_hit_frame's
            # differentiable gathers; kernel VISIBILITY is kept (sg'ed):
            # a 0/1 step function carries no gradient anywhere, and the
            # fused walk replaces two occlusion launches per bounce
            kv = None if kv is None else jax.tree.map(
                lambda x: _ckpt(sg(x)), kv)
            return hits, None, kv

        # occlusion is a 0/1 step function of its inputs (no useful
        # gradient anywhere), and the Pallas occlusion kernel has no JVP
        # rule — detach its inputs so hit points built from the
        # gradient-carrying t never push tangents into pallas_call
        inner_occlude = occlude_fn

        def occlude_fn(o, d, s_tmin, s_tmax):
            return _ckpt(inner_occlude(sg(o), sg(d), sg(s_tmin),
                                       sg(s_tmax)))

    def bounce(carry, _, first=False, k=0):
        # ``first``: statically marks the depth-0 camera pass whose
        # rays all share one origin (trace_rays' shared_origin0) — the
        # pallas closest kernel then hoists pair-invariant MT terms.
        # ``k``: static bounce index selecting the fused oracle's
        # residual rows (oracle mode only).
        o, d, throughput, radiance, state, alive = carry
        r = o.shape[0]

        # park dead rays at an unreachable origin: every slab test misses,
        # so finished lanes cost the traversal kernels nothing
        o = jnp.where(alive[:, None], o, 1e30)

        dec = None
        if oracle_closest is not None:
            hits, kernel_n, kernel_vis, dec = oracle_closest(o, d, k)
        else:
            hits, kernel_n, kernel_vis = closest_fn(o, d, shared=first)
        found = hits.hit & alive

        # --- miss shading ---
        if gpu:
            miss_rad = jnp.broadcast_to(scene.miss_color, (r, 3))
        else:
            unit_d = d / jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1, keepdims=True), 1e-24))
            miss_rad = shading.sky_gradient(unit_d)
        missed = alive & ~hits.hit
        radiance = radiance + jnp.where(missed[:, None], throughput * miss_rad, 0.0)

        # --- hit frame + material ---
        if kernel_n is not None:
            # shading normal came out of the traversal kernel; the hit
            # point is just o + t*d (query.h:111)
            p = o + hits.t[:, None] * d
            n = kernel_n
        else:
            tri_tn = tri_cell[0]
            p, n, _ = make_hit_frame(
                o, d, hits, geom.vertices, geom.normals,
                mode=scene.dialect,
                tri=tri_tn[0] if tri_tn is not None else None,
                tn=tri_tn[1] if tri_tn is not None else None,
            )
            if "p" in _DIFF_SG:
                p = jax.lax.stop_gradient(p)
            if "n" in _DIFF_SG:
                n = jax.lax.stop_gradient(n)
        # park miss/dead lanes' shade points too: their shadow rays then
        # cull instantly instead of tracing from a garbage position
        p = jnp.where(found[:, None], p, 1e30)
        from .diff_gather import gather_int_rows
        obj = gather_int_rows(geom.obj_id, jnp.maximum(hits.tri_idx, 0),
                              jax.default_backend() != "tpu")
        mat = scene.materials.gather(obj)

        # --- direct lighting ---
        n_shade = (jax.lax.stop_gradient(n) if "shade_n" in _DIFF_SG
                   else n)
        direct, state_direct = shading.shade_direct(
            o, d, p, n_shade, mat, scene.lights, occlude_fn, state,
            dialect=scene.dialect, vis_precomputed=kernel_vis,
        )
        state = jnp.where(found, state_direct, state)
        radiance = radiance + jnp.where(found[:, None], throughput * direct, 0.0)

        # --- Russian-roulette bounce split (query.h:188-206) ---
        kd, kr = mat.kd, mat.kr
        total = kd + kr
        can_bounce = found & (total > 0.0)

        n_unit = n / jnp.sqrt(jnp.maximum(jnp.sum(n * n, -1, keepdims=True), 1e-24))
        state_xi, xi = rnglib.rng_next(state)
        state = jnp.where(can_bounce, state_xi, state)

        if dec is not None:
            # oracle decisions are authoritative: the fused kernel and
            # the XLA recompute can drift in the last ulp on TPU, and a
            # desynchronized branch would pair this chain's rays with
            # the wrong next-bounce residuals
            take_diffuse = (dec & 2) > 0
            take_mirror = (dec & 4) > 0
        else:
            take_diffuse = can_bounce & (
                xi < kd / jnp.where(total > 0, total, 1.0))
            if not diffuse_bounce:
                take_diffuse = jnp.zeros_like(take_diffuse)
            take_mirror = can_bounce & ~take_diffuse
            if not gpu:
                # CPUOnly only mirrors when kr > 0 (raytracer.h:249);
                # the GPU loop always takes the else-branch.
                take_mirror = take_mirror & (kr > 0.0)

        if diffuse_bounce:
            # diffuse branch: hemisphere sample consumes RNG only where
            # taken.  stop_gradient on the normal keeps the rejection
            # while_loop out of reverse-mode autodiff (sample directions
            # are treated as constants, the standard score-free estimator).
            state_h, hemi = rnglib.random_on_hemisphere(
                jax.lax.stop_gradient(n_unit), state
            )
            if differentiable:
                # save the sampled directions across the remat boundary:
                # they are constants to the gradient (detached sampler)
                # but recomputing them would replay the rejection
                # while_loop in the backward pass
                from jax.ad_checkpoint import checkpoint_name
                state_h = checkpoint_name(state_h, "diff_kernel")
                hemi = checkpoint_name(hemi, "diff_kernel")
            state = jnp.where(take_diffuse, state_h, state)
            ndotl = jnp.maximum(jnp.sum(n_unit * hemi, axis=-1), 0.0)
            if gpu:
                diff_tp = mat.albedo * (2.0 * ndotl)[:, None]
            else:
                diff_tp = mat.albedo * (total * 2.0 * ndotl)[:, None]
        else:
            # statically mirror-only: no sampling ops in the graph at all,
            # keeping the integrator reverse-differentiable
            hemi = n_unit
            diff_tp = jnp.ones_like(mat.albedo)

        # mirror branch: GPU uses kr * tint (query.h:202-205); CPUOnly uses
        # (diffuse_bounce ? total : kr) * tint (raytracer.h:249-255)
        d_unit = d / jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1, keepdims=True), 1e-24))
        refl = reflect(d_unit, n_unit)
        if gpu:
            mirror_scale = kr
        else:
            mirror_scale = total if diffuse_bounce else kr
        mirror_tp = mat.specular_color * mirror_scale[:, None]

        new_dir = jnp.where(take_diffuse[:, None], hemi, refl)
        new_origin = p + n_unit * offset_eps
        tp_scale = jnp.where(
            take_diffuse[:, None], diff_tp,
            jnp.where(take_mirror[:, None], mirror_tp, 1.0),
        )

        bounced = take_diffuse | take_mirror
        if "newdir" in _DIFF_SG:
            new_dir = jax.lax.stop_gradient(new_dir)
        if "neworig" in _DIFF_SG:
            new_origin = jax.lax.stop_gradient(new_origin)
        o = jnp.where(bounced[:, None], new_origin, o)
        d = jnp.where(bounced[:, None], new_dir, d)
        throughput = jnp.where(bounced[:, None], throughput * tp_scale, throughput)

        # early-out: all channels < 1e-4 (query.h:209-212)
        if dec is not None:
            alive = (dec & 8) > 0  # the kernel's own bounced & ~tiny
        else:
            tiny = jnp.all(throughput < 1e-4, axis=-1)
            alive = bounced & ~tiny

        return (o, d, throughput, radiance, state, alive), None

    # whether the depth-0 shared-origin flag reaches a kernel that can
    # use it (the resident Pallas closest).  trace_rays gates its loop
    # peeling on this so paths that CANNOT benefit keep their exact
    # loop structure (the scan-vs-while bit-identity contract of
    # test_detached_traversal_gradients_match_brute).
    bounce.shared_origin_capable = (
        scene.accel is not None and use_pallas and grid_chunks == 1
    )
    return bounce


def trace_rays(
    origins: Array,
    dirs: Array,
    rng_state: Array,
    scene: Scene,
    model_axis: str | None = None,
    shared_origin0: bool = False,
) -> Array:
    """Trace a wavefront of rays to completion; returns radiance (R, 3).

    Dialect differences honored (see module docstring of ``ops.shading``):

    =====================  ======================  =====================
    ..                     gpu                     cpuonly
    =====================  ======================  =====================
    det epsilon            1e-8                    FLT_EPSILON
    ray-offset eps         1e-3                    1e-4
    traversal tmin         1e-4                    1e-4
    miss radiance          miss_color              sky gradient
    diffuse throughput     albedo * 2 * N.L        albedo * total * 2 * N.L
    mirror throughput      kr * tint               (db ? total : kr) * tint
    final clamp            [0, 1] per bounce loop  none (clamped at PNG)
    =====================  ======================  =====================

    (throughput rows cite ``query.h:195-206`` vs ``raytracer.h:240-256``;
    the GPU path clamps the summed radiance once at loop exit,
    ``query.h:219``.)

    ``shared_origin0``: caller guarantees every ray's origin equals
    ``origins[0]`` (the pinhole camera pass) — depth 0 then runs the
    shared-origin dense test (~30% fewer per-pair MT ops in the
    resident Pallas kernel).  Identical per-lane math either way.
    """
    differentiable0 = bool(getattr(scene, "differentiable", False))
    use_pallas0 = scene.use_pallas
    if use_pallas0 is None:
        use_pallas0 = jax.default_backend() == "tpu"
    # ONE unroll decision for the diff loop below AND the oracle gate:
    # the oracle indexes residuals by a STATIC bounce k, which only the
    # unrolled loop provides (a scan bounce would silently consume
    # bounce 0's residuals at every depth)
    if _DIFF_UNROLL_ENV:
        unroll = _DIFF_UNROLL_ENV == "1"
    else:
        unroll = int(scene.max_bounces) <= 8
    oracle = None
    if differentiable0 and use_pallas0 and _DIFF_ORACLE:
        from .diff_oracle import fused_bounce_oracle, oracle_eligible

        if unroll and oracle_eligible(scene, model_axis):
            gpu0 = scene.dialect == "gpu"
            cand = None
            if _DIFF_CAND[-1] is not None:
                from .megakernel import RAY_TILE, quarters_for
                from .binned import refresh_stream

                meta, gids, cchunk = _DIFF_CAND[-1]
                r0 = origins.shape[0]
                nt0 = (r0 + (-r0) % (8 * RAY_TILE)) // RAY_TILE
                # engage only for the ray stream the plan was built for
                # (other renders traced under the context keep the
                # block walk rather than asserting)
                if int(meta.shape[0]) == nt0:
                    nqv = quarters_for(int(scene.accel.tri_index.shape[1]))
                    stream = refresh_stream(gids, scene.accel, nqv)
                    cand = (jnp.asarray(meta), stream, cchunk)
            oracle = fused_bounce_oracle(
                origins, dirs, rng_state, scene, int(scene.max_bounces),
                interpret=jax.default_backend() != "tpu",
                det_eps=1e-8 if gpu0 else FLT_EPSILON, tmin=1e-4,
                shadow_eps=shading.RT_EPS_GPU, shadow_tmin=1e-4,
                cand=cand)
    bounce = make_bounce_step(scene, model_axis, oracle=oracle)
    shared_origin0 = (shared_origin0
                      and getattr(bounce, "shared_origin_capable", False))
    max_depth = scene.max_bounces
    gpu = scene.dialect == "gpu"
    differentiable = bool(getattr(scene, "differentiable", False))
    r = origins.shape[0]

    init = (
        origins,
        dirs,
        jnp.ones((r, 3), jnp.float32),
        jnp.zeros((r, 3), jnp.float32),
        jnp.asarray(rng_state, jnp.uint32),
        jnp.ones((r,), bool),
    )
    if scene.accel is None or differentiable:
        # differentiable path: fixed trip count (reverse-mode
        # transposes; lax.while_loop does not) — detached-traversal
        # scenes need it just as much as brute-force ones.  Shallow
        # loops UNROLL: lax.scan's stacked residuals + per-iteration
        # dynamic slicing cost the backward pass ~53 ms at 960x540
        # bounces-2 on v5e (222.6 -> 169.4 ms vg; docs/DESIGN.md round
        # 3 #8) — unrolled, XLA fuses across bounce boundaries and
        # residuals stay unstacked.  Deep loops keep the scan to bound
        # compile time/program size (RT_DIFF_UNROLL overrides).
        if unroll:
            body = lambda c, first=False, k=0: bounce(c, None, first=first,
                                                      k=k)[0]
            if _DIFF_REMAT and differentiable:
                # rematerialize the bounce chain in the backward pass,
                # SAVING only the traversal/occlusion kernel outputs
                # (tagged "diff_kernel" in make_bounce_step): the
                # elementwise shading/frame chains are ~free to
                # recompute on the VPU, while storing their residuals
                # was ~50 ms/step of HBM-bound fusions at 960x540
                # bounces-2 (profiled; docs/DESIGN.md round 4) — the
                # Pallas kernels themselves are never re-run.
                body = jax.checkpoint(
                    body,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "diff_kernel"),
                    static_argnums=(1, 2),
                )
            carry = init
            for i in range(int(max_depth)):
                carry = body(carry, i == 0 and shared_origin0, i)
            radiance = carry[3]
        else:
            # the scan body has no static bounce index — the oracle
            # gate above shares this exact `unroll` flag, so an oracle
            # can never reach here (it would pair every depth with
            # bounce 0's residuals)
            assert oracle is None
            (_, _, _, radiance, _, _), _ = jax.lax.scan(
                bounce, init, None, length=max_depth
            )
    else:
        # forward path: stop as soon as every ray has terminated — e.g. a
        # mirror-free scene finishes in 1 bounce instead of max_depth
        # (the wavefront analog of the reference's per-thread `break`,
        # query.h:209-212)
        def w_cond(carry):
            depth, state = carry
            return (depth < max_depth) & jnp.any(state[5])

        def w_body(carry):
            depth, state = carry
            new_state, _ = bounce(state, None)
            return depth + 1, new_state

        start = (jnp.int32(0), init)
        if shared_origin0 and int(max_depth) >= 1:
            # peel the camera bounce so its static shared-origin flag
            # reaches the kernel (the while body's depth is traced);
            # the peeled iteration is exactly w_body's depth-0 step and
            # w_cond is True at entry (all camera rays start alive)
            start = (jnp.int32(1), bounce(init, None, first=True)[0])
        _, (_, _, _, radiance, _, _) = jax.lax.while_loop(
            w_cond, w_body, start
        )

    if gpu:
        radiance = jnp.clip(radiance, 0.0, 1.0)  # clamp(radiance), query.h:219
    return radiance
