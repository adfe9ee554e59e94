"""On-chip emit (depth-0) timing under the MK_* bisection flags.

Run repeatedly with different env flags, e.g.:
    python scripts/probe_emit_bisect.py            # production emit
    MK_SKIP_SHADOW=1 python scripts/probe_emit_bisect.py
    MK_SKIP_DENSE=1  python scripts/probe_emit_bisect.py
    MK_SKIP_ATTRS=1  python scripts/probe_emit_bisect.py
Prints the rtt floor and the emit dispatch median.
"""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.ops.megakernel import (
    RAY_TILE, _pad_plan_rows, _pad_tiles, camera_tile_plan, emit_tiles)
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

flags = {k: v for k, v in os.environ.items() if k.startswith("MK_")}
scene = _frog_scene(width=1920, height=1080, spp=1, max_bounces=8,
                    diffuse_bounce=True)
grid = scene.accel
jax.block_until_ready(grid.tri)
xs, ys, _ = _swizzled_grid(1920, 1080)
xs_p, ys_p, n, np_rays = _pad_tiles(xs, ys)
plan = _pad_plan_rows(
    *camera_tile_plan(scene.camera, xs_p, ys_p, grid, RAY_TILE))


def timed(name, fn, iters=5):
    t0 = time.time()
    out = fn(0)
    first = out[0] if isinstance(out, tuple) else out
    c = float(jax.device_get(jnp.sum(first.astype(jnp.float32))))
    warm = time.time() - t0
    times = []
    for i in range(iters):
        t0 = time.time()
        out = fn(i + 1)
        first = out[0] if isinstance(out, tuple) else out
        float(jax.device_get(jnp.sum(first.astype(jnp.float32))))
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"{name:14s}: {med * 1e3:8.2f} ms  (warmup {warm:.1f}s, "
          f"chk {c:.4e})  flags={flags}", flush=True)


cand = None
if os.environ.get("RT_BINNED", "1") != "0":
    # round 5: bisect the BINNED emit (the production default) —
    # RT_BINNED=0 reproduces the round-4 plan-walk bisect
    from raytracinginonesemester_tpu.ops.binned import (
        build_camera_candidate_plan)
    from raytracinginonesemester_tpu.ops.megakernel import quarters_for

    cand = build_camera_candidate_plan(
        scene.camera, xs_p, ys_p, grid, RAY_TILE,
        nq=quarters_for(int(grid.tri_index.shape[1])),
        chunk=int(os.environ.get("RT_BINNED_CHUNK", "256")))

noop = jax.jit(lambda o: jnp.full((8, 128), o, jnp.float32))
timed("rtt_floor", noop)
emit_j = jax.jit(lambda s: emit_tiles(scene, xs_p, ys_p, s, plan=plan,
                                      cand_plan=cand))
timed("emit(d0)", emit_j)
