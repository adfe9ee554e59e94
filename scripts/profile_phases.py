"""Phase breakdown of one 1080p frog frame on the real TPU.

Times, separately jitted and hard-synced:
  1. tile_visit_plan (the XLA pre-pass: superblock slab grid + argsort)
  2. pallas_block_closest with normals + fused shadows (the kernel)
  3. the full trace_rays wavefront (everything incl. shading/integrator)
  4. render_scene end-to-end

Differences between consecutive rows localize where a frame's time goes.
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.core import rng as rnglib
from raytracinginonesemester_tpu.ops.accel import (
    tile_visit_plan, tile_visit_plan_fast)
from raytracinginonesemester_tpu.ops.pallas_kernels import (
    RAY_TILE, pallas_block_closest, _prep_rays)
from raytracinginonesemester_tpu.ops.integrator import trace_rays
from raytracinginonesemester_tpu.render.renderer import (
    _swizzled_grid, render_scene)
from raytracinginonesemester_tpu.utils.timing import measure

W, H = 1920, 1080
scene = _frog_scene(width=W, height=H, spp=1)
scene = dataclasses.replace(scene, max_bounces=4, use_pallas=True)
jax.block_until_ready(scene.accel.tri)
print(f"device {jax.devices()[0]}, {scene.geometry.num_triangles} tris",
      file=sys.stderr, flush=True)

xs, ys, inv = _swizzled_grid(W, H)
jx, jy = rnglib.pixel_jitter(xs, ys, jnp.int32(0))
px = xs.astype(jnp.float32) + jx
py = ys.astype(jnp.float32) + jy
origins, dirs = scene.camera.get_rays(px, py)
seeds = rnglib.make_rng_seed(xs, ys, jnp.int32(0))
origins, dirs, seeds = jax.block_until_ready((origins, dirs, seeds))
R = origins.shape[0]


@jax.jit
def plan_only(o, d):
    rays, rp = _prep_rays(o, d, 1e-4, 3.4e38)
    order, entry, count = tile_visit_plan(
        rays[:, 0:3], rays[:, 3:6], scene.accel, rays[:, 6], rays[:, 7],
        RAY_TILE)
    return jnp.sum(order) + jnp.sum(count)


@jax.jit
def plan_fast(o, d):
    rays, rp = _prep_rays(o, d, 1e-4, 3.4e38)
    order, entry, count = tile_visit_plan_fast(
        rays[:, 0:3], rays[:, 3:6], scene.accel, rays[:, 6], rays[:, 7],
        RAY_TILE)
    return jnp.sum(order) + jnp.sum(count)


@jax.jit
def kernel_only(o, d):
    hits, nrm, vis = pallas_block_closest(
        o, d, scene.accel, tmin=1e-4, det_eps=1e-8, return_normal=True,
        shadow_lights=scene.lights.position, shadow_eps=1e-3,
        shadow_tmin=1e-4)
    return jnp.sum(hits.t * (hits.tri_idx >= 0)) + jnp.sum(nrm) + jnp.sum(vis)


@jax.jit
def trace_full(o, d, s):
    return jnp.sum(trace_rays(o, d, s, scene))


@jax.jit
def frame(off):
    return jnp.sum(render_scene(
        scene, jitter_mode="wang", ray_tile=2073600, spp_override=1,
        sample_offset=off))


for name, fn, args in [
    ("plan_only ", plan_only, (origins, dirs)),
    ("plan_fast ", plan_fast, (origins, dirs)),
    ("kernel    ", kernel_only, (origins, dirs)),
    ("trace_full", trace_full, (origins, dirs, seeds)),
    ("frame     ", frame, (jnp.int32(1),)),
]:
    t0 = time.time()
    stats = measure(fn, *args, warmup=1, iters=5)
    print(f"{name}: {stats['median_s']*1e3:8.2f} ms  "
          f"(min {stats['min_s']*1e3:.2f}, compile+w {time.time()-t0:.1f}s)",
          file=sys.stderr, flush=True)
