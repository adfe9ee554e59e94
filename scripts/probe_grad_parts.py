"""Decompose the detached-diff backward pass at the grad-bench shape.

Isolates, at R=518400 rays / T=2894 tris (960x540 gpu_spheres):
  - the Pallas segment-accum (vertex cotangent scatter) alone;
  - mt_single value_and_grad w.r.t. tri (the winner recompute);
  - make_hit_frame + shade-direct style glue backward;
  - vg with vertices vs albedo-only vs light-only param sets
to see where the remaining backward milliseconds sit.
Scalar-fetch sync; subtract the rtt floor.
"""
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import raytracinginonesemester_tpu as rt
from raytracinginonesemester_tpu.core.camera import Camera
from raytracinginonesemester_tpu.diff.inverse import (
    apply_params, extract_params, render_loss)
from raytracinginonesemester_tpu.ops.diff_gather import segment_accum_rows
from raytracinginonesemester_tpu.ops.intersect import mt_single

W, H = 960, 540
R = W * H

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
scene = rt.load_scene(os.path.join(
    repo, "tests/assets/scenes/gpu_spheres.json"), accel="blocks")
scene = dataclasses.replace(scene, differentiable=True)
cam = Camera.create(position=(0.0, -2.5, 1.2), look_at=(0.0, 0.0, 0.5),
                    up=(0, 0, 1), focal_length_mm=24.0, width=W, height=H)
scene = dataclasses.replace(scene, camera=cam, max_bounces=2, spp=1)
T = int(scene.geometry.vertices.shape[0])
target = rt.render_scene(scene, jitter_mode="center", spp_override=1)
print(f"device {jax.devices()[0]}  R={R} T={T}", flush=True)


def timed(name, fn, iters=5):
    t0 = time.time()
    c = float(jax.device_get(fn(0)))
    warm = time.time() - t0
    times = []
    for i in range(iters):
        t0 = time.time()
        float(jax.device_get(fn(i + 1)))
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"{name:34s}: {med * 1e3:8.2f} ms  (warmup {warm:.1f}s, "
          f"chk {c:.4f})", flush=True)
    return med


noop = jax.jit(lambda o: jnp.sum(jnp.full((8, 128), o, jnp.float32)))
timed("rtt_floor", noop)

rs = np.random.RandomState(0)
idx = jnp.asarray(rs.randint(0, T, R).astype(np.int32))
ct = jnp.asarray(rs.standard_normal((R, 9)).astype(np.float32))
sa = jax.jit(lambda i: jnp.sum(segment_accum_rows(idx, ct + 0 * i, T)))
timed("segment_accum (1x)", sa)

o = jnp.asarray(rs.standard_normal((R, 3)).astype(np.float32))
d = jnp.asarray(rs.standard_normal((R, 3)).astype(np.float32))
tri = jnp.asarray(rs.standard_normal((R, 3, 3)).astype(np.float32))


def mt_loss(tri_, s):
    t, u, v = mt_single(o + 0 * s, d, tri_, 1e-8)
    return jnp.sum(t * u * v)


mt_vg = jax.jit(jax.value_and_grad(mt_loss))
timed("mt_single value_and_grad", lambda i: mt_vg(tri, jnp.float32(i))[0])

for keys in (("albedo",), ("light_intensity",), ("vertices",),
             ("albedo", "light_intensity", "vertices")):
    params = extract_params(scene, keys=keys)
    vg = jax.jit(jax.value_and_grad(
        lambda p, s: render_loss(p, scene, target + 0.0 * s,
                                 jitter_mode="center", spp_override=1)))
    timed(f"vg keys={','.join(keys)}",
          lambda i, vg=vg, params=params: vg(params, jnp.float32(i))[0])

fwd = jax.jit(lambda p, s: render_loss(p, scene, target + 0.0 * s,
                                       jitter_mode="center",
                                       spp_override=1))
params = extract_params(scene, keys=("vertices",))
timed("forward-only (diff scene)",
      lambda i: fwd(params, jnp.float32(i)))
