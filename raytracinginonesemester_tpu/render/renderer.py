"""Top-level render drivers: whole-image wavefront rendering under ``jit``.

TPU-native replacement for the reference's render entry points:

- ``HW1/src/render.cpp:15-136`` — brute-force single-bounce renderer,
- ``CPUOnly/src/render.cpp:22-169`` — recursive tracer driver,
- ``GPUandCPU/include/query.cu:10-167`` — ``renderBatchCUDA`` pixel-thread
  kernel + sample batching, and its CPU fallback loop.

Design: rays for the whole image are generated in one batched op, tiled
into fixed-size wavefronts (``lax.map`` over ray tiles bounds peak memory
the way the reference's 16x16 CUDA blocks bound register pressure), with
the sample loop as a ``lax.scan`` accumulating into the image — the analog
of the reference's 32-sample register batches (``query.cu:39-65``).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..core import rng as rnglib
from ..core.camera import Camera
from ..ops import shading
from ..ops.integrator import trace_rays
from ..ops.intersect import FLT_EPSILON, intersect_closest, make_hit_frame
from ..scene.build import Scene

__all__ = ["render_scene", "render_hw1", "resolve_wavefront",
           "DEFAULT_RAY_TILE"]

DEFAULT_RAY_TILE = 16384


def _pixel_grid(width: int, height: int):
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    return xs.reshape(-1), ys.reshape(-1)


def _swizzled_grid(width: int, height: int, tile: int = 16):
    """Pixel indices in tile-major (16x16) order over a tile-padded frame.

    Spatially-coherent ray tiles are what make the traversal kernels'
    per-tile culling effective — the TPU analog of the reference's 16x16
    CUDA thread blocks (``buffers.h:6-7``, ``query.cu:31-33``).  The
    frame pads to tile multiples (wp, hp) so the inverse mapping is a
    pure reshape/transpose (``_unswizzle``) instead of a 2M-element
    gather; the <2% padded pixels trace sky rays and are cropped.
    Because RNG seeds derive from absolute (x, y), any pixel order
    produces the identical image.
    """
    wp = -(-width // tile) * tile
    hp = -(-height // tile) * tile
    ys, xs = np.mgrid[0:hp, 0:wp]

    def swz(a):
        return (
            a.reshape(hp // tile, tile, wp // tile, tile)
            .transpose(0, 2, 1, 3)
            .ravel()
        )

    return (
        jnp.asarray(swz(xs), jnp.int32),
        jnp.asarray(swz(ys), jnp.int32),
        (hp, wp),
    )


def _unswizzle(accum: Array, width: int, height: int, hp: int, wp: int,
               tile: int = 16) -> Array:
    """(hp*wp, C) tile-major -> (height, width, C) scanline, by reshape."""
    c = accum.shape[-1]
    img = (
        accum.reshape(hp // tile, wp // tile, tile, tile, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(hp, wp, c)
    )
    return img[:height, :width]


def _tile_map(fn, args, num_rays: int, tile: int):
    """Apply ``fn`` over fixed-size ray tiles; pads the tail tile.

    All ``args`` leaves must have leading dim ``num_rays``; result leaves
    keep leading dim ``num_rays``.  ``tile <= 0`` means one whole-batch
    tile (no padding replication — the padded filler rays are real ray
    copies, so callers wanting a single wavefront should use this).
    """
    tile = num_rays if tile <= 0 else min(tile, num_rays)
    padded = ((num_rays + tile - 1) // tile) * tile
    if padded != num_rays:
        args = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (padded - num_rays,) + a.shape[1:])]
            ),
            args,
        )
    args = jax.tree.map(lambda a: a.reshape((padded // tile, tile) + a.shape[1:]), args)
    out = jax.lax.map(fn, args)
    out = jax.tree.map(lambda a: a.reshape((padded,) + a.shape[2:])[:num_rays], out)
    return out


def resolve_jitter_mode(scene: Scene, jitter_mode: str, spp: int) -> str:
    if jitter_mode != "auto":
        return jitter_mode
    gpu = scene.dialect == "gpu"
    return "wang" if (gpu or spp > 1) else "center"


def accumulate_samples(
    scene: Scene,
    xs: Array,
    ys: Array,
    spp: int,
    jitter_mode: str,
    ray_tile: int = DEFAULT_RAY_TILE,
    sample_offset: Array | int = 0,
) -> Array:
    """Sum of per-sample radiance for the given pixel-index arrays.

    The shard-friendly core: callers hand it any subset of pixels (whole
    image, a device's shard, a tile), it returns the un-normalized (N, 3)
    accumulator.  Seeding is by absolute (x, y, sample)
    (``make_rng_seed``, query.h:44-48), so any partitioning of the pixel
    set produces identical radiance — resharding never changes the image.
    """
    cam = scene.camera
    num_rays = xs.shape[0]

    host_offsets = None
    if jitter_mode == "reference_cpu":
        host_offsets = jnp.asarray(rnglib.jittered_samples(spp, 42, centered=True))

    def one_sample(s: Array) -> Array:
        s = s + sample_offset  # distinct seed stream per frame in benches
        if jitter_mode == "wang":
            jx, jy = rnglib.pixel_jitter(xs, ys, s)
        elif jitter_mode == "reference_cpu":
            jx = jnp.broadcast_to(host_offsets[jnp.minimum(s, spp - 1), 0], xs.shape)
            jy = jnp.broadcast_to(host_offsets[jnp.minimum(s, spp - 1), 1], ys.shape)
        elif jitter_mode == "center":
            jx = jnp.full(xs.shape, 0.5, jnp.float32)
            jy = jnp.full(ys.shape, 0.5, jnp.float32)
        else:
            raise ValueError(f"unknown jitter_mode {jitter_mode!r}")

        px = xs.astype(jnp.float32) + jx
        py = ys.astype(jnp.float32) + jy
        origins, dirs = cam.get_rays(px, py)
        seeds = rnglib.make_rng_seed(xs, ys, s)

        def tile_fn(args):
            o, d, st = args
            # pinhole camera: every depth-0 ray shares cam.center, so
            # the resident Pallas closest runs its shared-origin dense
            # test (integrator.trace_rays shared_origin0) — gated on
            # the camera contract, not assumed (a lens/aperture camera
            # must not silently render every ray from origins[0])
            return trace_rays(o, d, st, scene,
                              shared_origin0=bool(cam.is_pinhole))

        return _tile_map(tile_fn, (origins, dirs, seeds), num_rays, ray_tile)

    accum, _ = jax.lax.scan(
        lambda acc, s: (acc + one_sample(s), None),
        jnp.zeros((num_rays, 3), jnp.float32),
        jnp.arange(spp, dtype=jnp.int32),
    )
    return accum


def resolve_wavefront(scene: Scene, jitter_mode: str = "auto",
                      spp_override: Optional[int] = None):
    """Resolve the (wavefront, capacity) dispatch decision for a scene.

    Reads the RT_WAVEFRONT / RT_WAVEFRONT_CAP env knobs, applies the
    staged scheduler's eligibility gate, and — when capacity is "auto"
    — runs the one-emit-dispatch calibration (cached in memory and on
    disk per scene fingerprint, ``ops.wavefront.auto_capacity_tiles``).
    Exposed so drivers/benches can warm the calibration without paying
    a full eager render; ``render_scene`` calls it on every invocation
    (cached after the first).
    """
    wf_env = os.environ.get("RT_WAVEFRONT", "auto")
    wavefront = wf_env in ("1", "auto")
    wavefront_cap = None
    cap_env = os.environ.get("RT_WAVEFRONT_CAP", "auto")
    if wavefront and cap_env:
        from ..ops.megakernel import megakernel_eligible, megakernel_kwargs

        spp_eff = spp_override if spp_override is not None else scene.spp
        jm = resolve_jitter_mode(scene, jitter_mode, spp_eff)
        use_pallas = scene.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        # gate the calibration on EXACTLY the conditions under which
        # _render_scene_jit would take the wavefront path — otherwise
        # the calibration emit dispatch is wasted work for scenes that
        # render via the staged/XLA fallback, and can even fail for
        # scenes whose planes exceed the kernel VMEM budget
        eligible = (use_pallas and megakernel_eligible(scene, jm)
                    and bool(scene.diffuse_bounce or not scene.terminal_only))
        if not eligible:
            wavefront = False
        elif cap_env == "auto":
            from ..ops.wavefront import auto_capacity_tiles

            mk_kw = megakernel_kwargs(scene, jm)
            mk_kw.setdefault("jitter", jm if jm != "reference_cpu" else "wang")
            wavefront_cap = auto_capacity_tiles(
                scene, interpret=jax.default_backend() != "tpu", **mk_kw)
        else:
            wavefront_cap = int(cap_env)
    if wf_env == "auto" and wavefront_cap is None:
        # no staged capacity (scene never bounces, alive wavefront ~
        # whole frame, or calibration impossible under an outer trace):
        # the monolithic megakernel beats the single-sort wavefront
        wavefront = False
    return wavefront, wavefront_cap


# (scene, camera) fingerprint -> binned camera-candidate plan
# (ops.binned.CandidatePlan).  A missing plan only routes the emit
# kernel to the block walk; a STALE hit would be a correctness bug,
# which is why the fingerprint hashes the triangle planes themselves
# (ops.binned.plan_fingerprint).  Bounded: each plan pins a
# multi-megabyte device stream, so a camera-animation loop must not
# grow this without limit — oldest entries evict beyond the cap.
_CAND_PLAN_CACHE: dict = {}
_CAND_PLAN_CACHE_MAX = 8


def resolve_candidate_plan(scene: Scene, jitter_mode: str = "auto",
                           spp_override: Optional[int] = None,
                           align_tiles: int = 1):
    """Binned camera-candidate plan for eligible scenes (``ops.binned``).

    Built host-side once per (scene, camera) and cached; the emit
    kernel then streams each tile's precomputed triangle-granularity
    candidate chunks instead of walking the block union (~15x fewer
    dense camera pairs on frog 1080p).  Env knobs: ``RT_BINNED``
    (1/auto = on for eligible scenes, 0 = off) and ``RT_BINNED_CHUNK``
    (candidate lane width C, default 256).  Returns None when off,
    ineligible, or when the scene is being traced (plan building needs
    concrete geometry — warm the cache with one eager resolve first).
    """
    env = os.environ.get("RT_BINNED", "auto")
    if env == "0":
        return None
    # binned engages wherever the fused kernels do (wavefront emit OR
    # the monolithic megakernel) — same dispatch criterion as
    # _frame_accum, so the plan is never built for a scene that will
    # render via the staged/XLA fallback
    from ..ops.megakernel import megakernel_eligible

    spp_eff = spp_override if spp_override is not None else scene.spp
    jm = resolve_jitter_mode(scene, jitter_mode, spp_eff)
    use_pallas = scene.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not (use_pallas and megakernel_eligible(scene, jm)):
        return None
    if isinstance(scene.accel.tri, jax.core.Tracer):
        return None
    from ..ops.binned import build_camera_candidate_plan, plan_fingerprint
    from ..ops.megakernel import _pad_tiles, quarters_for
    from ..ops.pallas_kernels import RAY_TILE

    chunk = int(os.environ.get("RT_BINNED_CHUNK", "256"))
    nq = quarters_for(int(scene.accel.tri_index.shape[1]))
    fp = (plan_fingerprint(scene.camera, scene.accel, RAY_TILE, nq, chunk),
          int(align_tiles))
    if fp in _CAND_PLAN_CACHE:
        plan = _CAND_PLAN_CACHE.pop(fp)
        _CAND_PLAN_CACHE[fp] = plan  # LRU: refresh insertion order
        return plan
    import dataclasses

    import jax.numpy as jnp

    w, h = int(scene.camera.width), int(scene.camera.height)
    xs, ys, _ = _swizzled_grid(w, h)
    xs_p, ys_p, _, _ = _pad_tiles(xs, ys)
    # ``align_tiles``: pad the plan's tile axis so it splits evenly over
    # a data mesh (the sharded fast path shards meta rows and replicates
    # the chunk stream); padding tiles are all-sky (count 0) and their
    # rays are the stream's own padding rays
    nt = xs_p.shape[0] // RAY_TILE
    extra = (-nt) % (align_tiles * 8)
    if extra:
        pad_rays = extra * RAY_TILE
        xs_p = jnp.concatenate([xs_p, jnp.zeros(pad_rays, xs_p.dtype)])
        ys_p = jnp.concatenate([ys_p, jnp.zeros(pad_rays, ys_p.dtype)])
    plan = build_camera_candidate_plan(
        scene.camera, xs_p, ys_p, scene.accel, RAY_TILE, nq=nq,
        chunk=chunk)
    while len(_CAND_PLAN_CACHE) >= _CAND_PLAN_CACHE_MAX:
        _CAND_PLAN_CACHE.pop(next(iter(_CAND_PLAN_CACHE)))
    _CAND_PLAN_CACHE[fp] = plan
    return plan


def _warn_if_fallback(scene, jitter_mode, spp_override) -> None:
    """One warning when a scene that WOULD use the fused fast path (TPU
    backend, use_pallas unset/true) falls back to the ~10x slower
    staged/XLA integrator — silent perf cliffs cost users minutes per
    frame (round-3 review).  Warned once per (reason) per process."""
    from ..ops.megakernel import megakernel_ineligible_reason
    from ..utils.logging import warn_once

    use_pallas = scene.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return
    spp_eff = spp_override if spp_override is not None else scene.spp
    jm = resolve_jitter_mode(scene, jitter_mode, spp_eff)
    reason = megakernel_ineligible_reason(scene, jm)
    if reason is not None and reason.startswith("differentiable"):
        # differentiable scenes have no faster option (the fused
        # kernels are not differentiable) — warning would be noise on
        # the documented diff API
        return
    if reason is not None:
        warn_once(
            f"mk-fallback:{reason}",
            f"scene falls off the fused fast path ({reason}); "
            "rendering via the staged/XLA integrator (~10x slower)")


def render_scene(
    scene: Scene,
    jitter_mode: str = "auto",
    ray_tile: int = DEFAULT_RAY_TILE,
    spp_override: Optional[int] = None,
    sample_offset: Array | int = 0,
    normalize: bool = True,
    cand_plan=None,
) -> Array:
    """Render a built scene to a linear (H, W, 3) float32 image.

    ``jitter_mode`` picks the sub-pixel sampling scheme:

    - ``"wang"`` — per-(pixel, sample) Wang-hash jitter in [-0.5, 0.5),
      exactly the CUDA kernel's sequence (``query.cu:36-43``),
    - ``"reference_cpu"`` — one host-side mt19937(42) offset per sample
      shared by all pixels, exactly the GPU repo's CPU fallback
      (``query.cu:137-146``) — the oracle-parity mode,
    - ``"center"`` — deterministic pixel centers: offset +0.5 in the
      CPUOnly convention (``CPUOnly/src/render.cpp:127-128`` at spp==1),
    - ``"auto"`` — gpu dialect -> "wang"; cpuonly -> "center" when spp==1
      else "wang" (the reference's spp>1 CPUOnly jitter is a non-seeded
      mt19937 and thus unreproducible; we substitute the wang stream).

    The per-ray RNG seed is ``make_rng_seed(x, y, sample)`` in every mode
    (``query.h:44-48``), so images are independent of ray-tile size and
    device sharding.

    ``normalize=False`` returns the raw per-pixel radiance SUM over the
    spp samples (no ``/spp``) — the accumulation unit for progressive /
    resumable rendering (``render.progressive``).
    """
    # RT_WAVEFRONT / RT_WAVEFRONT_CAP are read OUTSIDE the jitted body
    # (resolve_wavefront) and passed as static args — an env read
    # inside the traced function would be captured at first trace and
    # masked by the jit cache thereafter.
    # Default "auto": the staged wavefront scheduler is the production
    # path for eligible bouncing scenes; "0" forces the monolithic
    # megakernel, "1" forces wavefront unconditionally.  Capacity is a
    # static perf knob — the staged path falls back in-graph if it
    # ever proves too small.  (The sharded driver resolves the same
    # way and runs the staged scheduler per data shard;
    # parallel/sharded.py.)
    wavefront, wavefront_cap = resolve_wavefront(
        scene, jitter_mode, spp_override)
    if cand_plan is None:
        # eager callers resolve (and cache) the binned plan here; under
        # an outer jit trace this returns None — pre-resolve eagerly
        # and pass ``cand_plan`` explicitly to keep the binned path
        cand_plan = resolve_candidate_plan(scene, jitter_mode, spp_override)
    _warn_if_fallback(scene, jitter_mode, spp_override)
    return _render_scene_jit(
        scene, jitter_mode=jitter_mode, ray_tile=ray_tile,
        spp_override=spp_override, sample_offset=sample_offset,
        normalize=normalize, wavefront=wavefront,
        wavefront_cap=wavefront_cap, cand_plan=cand_plan)


@partial(jax.jit, static_argnames=("jitter_mode", "ray_tile", "spp_override",
                                   "normalize", "wavefront", "wavefront_cap"))
def _render_scene_jit(
    scene: Scene,
    jitter_mode: str,
    ray_tile: int,
    spp_override: Optional[int],
    sample_offset: Array | int,
    normalize: bool,
    wavefront: bool,
    wavefront_cap: Optional[int] = None,
    cand_plan=None,
) -> Array:
    spp = spp_override if spp_override is not None else scene.spp
    w, h = scene.camera.width, scene.camera.height
    xs, ys, (hp, wp) = _swizzled_grid(w, h)
    accum = _frame_accum(scene, xs, ys, spp, sample_offset, jitter_mode,
                         ray_tile, wavefront, wavefront_cap, cand_plan)
    img = _unswizzle(accum, w, h, hp, wp)
    return img / float(spp) if normalize else img


def _frame_accum(scene, xs, ys, spp, sample_offset, jitter_mode,
                 ray_tile, wavefront, wavefront_cap, cand_plan=None):
    """Per-ray radiance SUM over spp samples, (N, 3) in swizzled order —
    the dispatch core shared by ``_render_scene_jit`` and the batched
    ``render_scene_frames`` fallback."""
    jitter_mode = resolve_jitter_mode(scene, jitter_mode, spp)

    # fused megakernel fast path (ops.megakernel): eligible scenes of
    # either dialect render the whole spp loop inside one Pallas call
    from ..ops.megakernel import (
        megakernel_eligible,
        megakernel_kwargs,
        render_tiles,
    )

    use_pallas = scene.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and megakernel_eligible(scene, jitter_mode):
        interpret = jax.default_backend() != "tpu"
        mk_kw = dict(interpret=interpret, **megakernel_kwargs(scene, jitter_mode))
        bouncing = bool(scene.diffuse_bounce) or not scene.terminal_only
        if bouncing and wavefront:
            # sort-compacted bounce wavefronts (ops.wavefront): packs
            # the sparse post-bounce ray population into dense,
            # direction/origin-coherent tiles; bit-identical images
            from ..ops.wavefront import render_tiles_wavefront

            return render_tiles_wavefront(
                scene, xs, ys, spp, sample_offset=sample_offset,
                capacity_tiles=wavefront_cap, cand_plan=cand_plan,
                **mk_kw,
            )
        return render_tiles(
            scene, xs, ys, spp, sample_offset=sample_offset,
            cand_plan=cand_plan, **mk_kw,
        )
    return accumulate_samples(
        scene, xs, ys, spp, jitter_mode, ray_tile,
        sample_offset=sample_offset,
    )


def render_scene_frames(
    scene: Scene,
    frames: int,
    jitter_mode: str = "auto",
    sample_offset: Array | int = 0,
    ray_tile: int = DEFAULT_RAY_TILE,
    cand_plan=None,
) -> Array:
    """Render ``frames`` consecutive spp-1 frames in ONE dispatch ->
    (frames, H, W, 3); frame f uses sample index ``sample_offset + f``.

    The batched-serving driver: on the staged-wavefront fast path all
    frames' bounce wavefronts share one merged compaction sort + bounce
    ladder per dispatch (``ops.wavefront.render_tiles_wavefront_frames``
    — the analog of the reference's 32-sample register batching,
    ``GPUandCPU/include/query.cu:39-65``), amortizing scheduling costs
    that a frame-at-a-time loop pays per frame.  Each returned frame is
    bit-identical to ``render_scene(scene, ..., spp_override=1,
    sample_offset=offset + f)`` rendered alone (same per-sample math;
    see ``ops.wavefront._render_group``).  Ineligible scenes fall back
    to an in-graph scan of single-frame renders — same images, only the
    dispatch batching differs."""
    wavefront, wavefront_cap = resolve_wavefront(scene, jitter_mode, 1)
    if cand_plan is None:
        cand_plan = resolve_candidate_plan(scene, jitter_mode, 1)
    _warn_if_fallback(scene, jitter_mode, 1)
    return _render_scene_frames_jit(
        scene, frames=frames, jitter_mode=jitter_mode, ray_tile=ray_tile,
        sample_offset=sample_offset, wavefront=wavefront,
        wavefront_cap=wavefront_cap, cand_plan=cand_plan)


@partial(jax.jit, static_argnames=("frames", "jitter_mode", "ray_tile",
                                   "wavefront", "wavefront_cap"))
def _render_scene_frames_jit(
    scene: Scene,
    frames: int,
    jitter_mode: str,
    ray_tile: int,
    sample_offset: Array | int,
    wavefront: bool,
    wavefront_cap: Optional[int] = None,
    cand_plan=None,
) -> Array:
    w, h = scene.camera.width, scene.camera.height
    xs, ys, (hp, wp) = _swizzled_grid(w, h)
    jm = resolve_jitter_mode(scene, jitter_mode, 1)

    from ..ops.megakernel import megakernel_eligible, megakernel_kwargs

    use_pallas = scene.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    eligible = use_pallas and megakernel_eligible(scene, jm)
    bouncing = bool(scene.diffuse_bounce) or not scene.terminal_only
    if (eligible and bouncing and wavefront and wavefront_cap is not None):
        from ..ops.wavefront import render_tiles_wavefront_frames

        interpret = jax.default_backend() != "tpu"
        mk_kw = dict(interpret=interpret,
                     **megakernel_kwargs(scene, jm))
        accum = render_tiles_wavefront_frames(
            scene, xs, ys, frames, sample_offset,
            capacity_tiles=wavefront_cap, cand_plan=cand_plan,
            **mk_kw)  # (F, N, 3)
    else:
        def one(_, off):
            return 0, _frame_accum(scene, xs, ys, 1, off, jitter_mode,
                                   ray_tile, wavefront, wavefront_cap,
                                   cand_plan)

        off0 = jnp.asarray(sample_offset, jnp.int32)
        _, accum = jax.lax.scan(
            one, 0, off0 + jnp.arange(frames, dtype=jnp.int32))
    return jax.vmap(lambda a: _unswizzle(a, w, h, hp, wp))(accum)


@partial(jax.jit, static_argnames=("width", "height", "spp", "ray_tile"))
def render_hw1(
    vertices: Array,
    normals: Array,
    camera: Camera,
    light_position: Array,
    light_color: Array,
    width: int,
    height: int,
    spp: int = 1,
    offsets: Optional[Array] = None,
    ray_tile: int = DEFAULT_RAY_TILE,
) -> Array:
    """The HW1 pipeline: one brute-force bounce, fixed metal shader.

    Faithful to ``HW1/src/render.cpp:72-116`` including its jitter quirk:
    render.cpp builds fractional coords ``i + offset`` but HW1's camera
    only has an ``(int, int)`` ``get_pixel_position`` overload
    (``HW1/include/camera.h:33-35``), so C++ silently truncates the
    offsets away and every sample shoots through the integer grid point.
    We therefore floor the offsets (pass ``offsets`` (spp, 2) in [0, 1) or
    default to the reference's mt19937(42) stream, which all floor to 0).
    Closest hit over all triangles uses t >= 0 with the FLT_EPSILON det
    cutoff, then ``shade_hw1``.
    """
    if offsets is None:
        offsets = jnp.asarray(rnglib.jittered_samples(spp, 42, centered=False))
    offsets = jnp.floor(offsets)  # the reference's int-truncation quirk
    xs, ys = _pixel_grid(width, height)
    num_rays = width * height

    def one_sample(s):
        px = xs.astype(jnp.float32) + offsets[s, 0]
        py = ys.astype(jnp.float32) + offsets[s, 1]
        origins, dirs = camera.get_rays(px, py)

        def tile_fn(args):
            o, d = args
            hits = intersect_closest(
                o, d, vertices, tmin=0.0, det_eps=FLT_EPSILON
            )
            p, n, _ = make_hit_frame(o, d, hits, vertices, normals, mode="hw1")
            return shading.shade_hw1(
                o, d, p, n, hits.hit, light_position, light_color
            )

        return _tile_map(tile_fn, (origins, dirs), num_rays, ray_tile)

    accum, _ = jax.lax.scan(
        lambda acc, s: (acc + one_sample(s), None),
        jnp.zeros((num_rays, 3), jnp.float32),
        jnp.arange(spp, dtype=jnp.int32),
    )
    return (accum / float(spp)).reshape(height, width, 3)
