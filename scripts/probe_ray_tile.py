"""Probe per-program fixed overhead: RAY_TILE sweep + empty-scene floor."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.core import rng as rnglib
from raytracinginonesemester_tpu.ops import pallas_kernels as pk
from raytracinginonesemester_tpu.ops.accel import build_block_grid
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid
from raytracinginonesemester_tpu.utils.timing import measure

W, H = 1920, 1080
scene = _frog_scene(width=W, height=H, spp=1)
scene = dataclasses.replace(scene, max_bounces=4, use_pallas=True)
jax.block_until_ready(scene.accel.tri)

xs, ys, inv = _swizzled_grid(W, H)
jx, jy = rnglib.pixel_jitter(xs, ys, jnp.int32(0))
origins, dirs = scene.camera.get_rays(
    xs.astype(jnp.float32) + jx, ys.astype(jnp.float32) + jy)
origins, dirs = jax.block_until_ready((origins, dirs))

# a 1-block scene nowhere near the camera: every tile plans zero visits,
# so kernel time == pure per-program overhead
far = jnp.asarray(
    np.tile(np.array([[1000.0, 1000.0, 1000.0]], np.float32), (128, 3, 1))
    .reshape(128, 3, 3) + np.arange(128, dtype=np.float32)[:, None, None])
empty_grid = build_block_grid(far, jnp.asarray(128), block_size=128)


def k_shadow(o, d):
    h, n, vis = pk.pallas_block_closest(
        o, d, scene.accel, tmin=1e-4, det_eps=1e-8, return_normal=True,
        shadow_lights=scene.lights.position, shadow_eps=1e-3,
        shadow_tmin=1e-4)
    return jnp.sum(h.t * (h.tri_idx >= 0)) + jnp.sum(n) + jnp.sum(vis)


def k_empty(o, d):
    h = pk.pallas_block_closest(
        o, d, empty_grid, tmin=1e-4, det_eps=1e-8)
    return jnp.sum(h.t * (h.tri_idx >= 0))


def run(name, fn, *args):
    t0 = time.time()
    stats = measure(jax.jit(fn), *args, warmup=1, iters=5)
    print(f"{name}: {stats['median_s']*1e3:8.2f} ms (min {stats['min_s']*1e3:.2f},"
          f" c+w {time.time()-t0:.1f}s)", file=sys.stderr, flush=True)


for rt in (512, 1024, 2048):
    pk.RAY_TILE = rt
    pk.pallas_block_closest.clear_cache()
    pk.pallas_block_occluded.clear_cache()
    run(f"empty  rt{rt:4d}", k_empty, origins, dirs)
    run(f"shadow rt{rt:4d}", k_shadow, origins, dirs)
