"""Isolate kernel-time contributions: RTT floor, closest-only, +normals,
+shadows, and exact-vs-interval plan."""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.core import rng as rnglib
from raytracinginonesemester_tpu.ops import accel as accel_mod
from raytracinginonesemester_tpu.ops import pallas_kernels as pk
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

tiny = jnp.ones((8,), jnp.float32)


@jax.jit
def rtt_floor(x):
    return jnp.sum(x)


def k_closest(o, d):
    h = pk.pallas_block_closest(o, d, scene.accel, tmin=1e-4, det_eps=1e-8)
    return jnp.sum(h.t * (h.tri_idx >= 0))


def k_normals(o, d):
    h, n = pk.pallas_block_closest(
        o, d, scene.accel, tmin=1e-4, det_eps=1e-8, return_normal=True)
    return jnp.sum(h.t * (h.tri_idx >= 0)) + jnp.sum(n)


def k_shadow(o, d):
    h, n, vis = pk.pallas_block_closest(
        o, d, scene.accel, tmin=1e-4, det_eps=1e-8, return_normal=True,
        shadow_lights=scene.lights.position, shadow_eps=1e-3,
        shadow_tmin=1e-4)
    return jnp.sum(h.t * (h.tri_idx >= 0)) + jnp.sum(n) + jnp.sum(vis)


def k_unfused(o, d):
    h, n = pk.pallas_block_closest(
        o, d, scene.accel, tmin=1e-4, det_eps=1e-8, return_normal=True)
    hitm = h.tri_idx >= 0
    p = jnp.where(hitm[:, None], o + h.t[:, None] * d + n * 1e-3, 1e30)
    lpos = scene.lights.position[0]
    to_l = lpos - p
    dist = jnp.sqrt(jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-38))
    ldir = to_l / dist[:, None]
    blocked = pk.pallas_block_occluded(
        p, ldir, scene.accel, tmin=1e-4, tmax=dist, det_eps=1e-8)
    return (jnp.sum(h.t * hitm) + jnp.sum(n)
            + jnp.sum(blocked.astype(jnp.float32)))


def run(name, fn, *args):
    t0 = time.time()
    stats = measure(jax.jit(fn), *args, warmup=1, iters=5)
    print(f"{name}: {stats['median_s']*1e3:8.2f} ms (min {stats['min_s']*1e3:.2f},"
          f" c+w {time.time()-t0:.1f}s)", file=sys.stderr, flush=True)


run("rtt_floor      ", rtt_floor, tiny)
run("shadow fusedflat", k_shadow, origins, dirs)
run("shadow unfused ", k_unfused, origins, dirs)
