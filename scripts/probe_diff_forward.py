"""Bisect the detached-diff FORWARD (the grad bench's 76 ms net).

Times, at the grad-bench shape (960x540 gpu_spheres, 518400 rays):
  - pallas_block_closest alone (x1)
  - pallas_block_occluded alone (x1)
  - trace_rays (differentiable) at max_bounces 1 vs 2
  - trace_rays (NON-diff, same scene/accel) at max_bounces 2
  - render_scene of the non-diff scene (production staged path)
Scalar-fetch sync; subtract the printed rtt floor.
"""
import dataclasses
import os, sys, time

import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import raytracinginonesemester_tpu as rt
from raytracinginonesemester_tpu.core.camera import Camera
from raytracinginonesemester_tpu.core import rng as rnglib
from raytracinginonesemester_tpu.ops.integrator import trace_rays
from raytracinginonesemester_tpu.ops.pallas_kernels import (
    pallas_block_closest, pallas_block_occluded)

W, H = 960, 540
R = W * H
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
scene = rt.load_scene(os.path.join(
    repo, "tests/assets/scenes/gpu_spheres.json"), accel="blocks")
cam = Camera.create(position=(0.0, -2.5, 1.2), look_at=(0.0, 0.0, 0.5),
                    up=(0, 0, 1), focal_length_mm=24.0, width=W, height=H)
scene = dataclasses.replace(scene, camera=cam, max_bounces=2, spp=1)
scene_d = dataclasses.replace(scene, differentiable=True)
print(f"device {jax.devices()[0]}  R={R} blocks={scene.accel.num_blocks} "
      f"lights={scene.lights.position.shape[0]}", flush=True)


def timed(name, fn, iters=5):
    t0 = time.time(); c = float(jax.device_get(fn(0)))
    warm = time.time() - t0
    ts = []
    for i in range(iters):
        t0 = time.time(); float(jax.device_get(fn(i + 1)))
        ts.append(time.time() - t0)
    print(f"{name:30s}: {sorted(ts)[len(ts)//2]*1e3:8.2f} ms "
          f"(warm {warm:.1f}s chk {c:.4g})", flush=True)


noop = jax.jit(lambda o: jnp.sum(jnp.full((8, 128), o, jnp.float32)))
timed("rtt_floor", noop)

xs, ys = np.meshgrid(np.arange(W, dtype=np.float32),
                     np.arange(H, dtype=np.float32))
o, d = scene.camera.get_rays(jnp.asarray(xs.ravel() + 0.5),
                             jnp.asarray(ys.ravel() + 0.5))
o = jax.block_until_ready(o)

cl = jax.jit(lambda s: jnp.sum(pallas_block_closest(
    o, d + 0.0 * s, scene.accel, tmin=1e-4, det_eps=1e-8).t))
timed("pallas closest x1", cl)
oc = jax.jit(lambda s: jnp.sum(pallas_block_occluded(
    o, d + 0.0 * s, scene.accel, tmin=1e-4, tmax=10.0,
    det_eps=1e-8).astype(jnp.float32)))
timed("pallas occluded x1", oc)

seeds = rnglib.make_rng_seed(
    jnp.asarray(xs.ravel().astype(np.int32)),
    jnp.asarray(ys.ravel().astype(np.int32)), 0)

for mb in (1, 2):
    sd = dataclasses.replace(scene_d, max_bounces=mb)
    tr = jax.jit(lambda s, sd=sd: jnp.sum(trace_rays(
        o, d + 0.0 * s, seeds, sd)))
    timed(f"trace_rays diff mb={mb}", tr)

tr_nd = jax.jit(lambda s: jnp.sum(trace_rays(o, d + 0.0 * s, seeds, scene)))
timed("trace_rays NON-diff mb=2", tr_nd)

rs_j = jax.jit(lambda s, off: jnp.sum(rt.render_scene(
    s, jitter_mode="center", spp_override=1, sample_offset=off)))
timed("render_scene non-diff", lambda i: rs_j(scene, i))
