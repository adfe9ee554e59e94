"""Bisect the detached-diff backward pass cost at 960x540.

Levers probed: ray_tile (lax.map serialization), value_and_grad vs
forward-only, grid rebuild in apply_params, param subsets.
Honest sync by scalar fetch.
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import raytracinginonesemester_tpu as rt
from raytracinginonesemester_tpu.core.camera import Camera
from raytracinginonesemester_tpu.diff.inverse import (apply_params,
                                                      extract_params)
from raytracinginonesemester_tpu.render.renderer import render_scene

W, H = 960, 540
scene = rt.load_scene("/root/repo/tests/assets/scenes/gpu_spheres.json",
                      accel="blocks")
scene = dataclasses.replace(scene, differentiable=True)
cam = Camera.create(position=(0.0, -2.5, 1.2), look_at=(0.0, 0.0, 0.5),
                    up=(0, 0, 1), focal_length_mm=24.0, width=W, height=H)
scene = dataclasses.replace(scene, camera=cam, max_bounces=2, spp=1)
target = jnp.zeros((H, W, 3), jnp.float32)
rays = W * H

def timeit(tag, fn, *a):
    out = fn(*a)
    s = float(jax.device_get(jnp.sum(out if not isinstance(out, tuple)
                                     else out[0])))
    times = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*a)
        s = float(jax.device_get(jnp.sum(out if not isinstance(out, tuple)
                                         else out[0])))
        times.append(time.time() - t0)
    dt = sorted(times)[1]
    print(f"{tag:42s} {dt*1e3:8.2f} ms  {rays/dt:.3e} rays/s", flush=True)
    return dt

for ray_tile in (16384, 65536, 0):
    def loss_fn(p, rtile=ray_tile):
        img = render_scene(apply_params(scene, p), jitter_mode="center",
                           spp_override=1, ray_tile=rtile)
        return jnp.mean((img - target) ** 2)

    fwd = jax.jit(loss_fn, static_argnames=())
    params = extract_params(scene, keys=("albedo", "light_intensity",
                                         "vertices"))
    timeit(f"forward-only rt={ray_tile}", fwd, params)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    timeit(f"value_and_grad rt={ray_tile}", vg, params)

# param-subset bisect at the best tile
def loss_fn0(p):
    img = render_scene(apply_params(scene, p), jitter_mode="center",
                       spp_override=1, ray_tile=0)
    return jnp.mean((img - target) ** 2)
for keys in (("albedo",), ("vertices",), ("albedo", "light_intensity")):
    vg = jax.jit(jax.value_and_grad(loss_fn0))
    timeit(f"vg rt=0 keys={','.join(keys)}",
           vg, extract_params(scene, keys=keys))
