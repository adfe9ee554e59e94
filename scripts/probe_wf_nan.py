"""Localize the wavefront resume NaN: which depth, which lanes, what state."""
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.ops.megakernel import (
    _ST_ROWS, RAY_TILE, _pad_tiles, emit_tiles, resume_tiles)
from raytracinginonesemester_tpu.ops.wavefront import sort_bounce_state

W, H = 320, 180
scene = _frog_scene(width=W, height=H, spp=1, max_bounces=8,
                    diffuse_bounce=True)
grid = scene.accel
jax.block_until_ready(grid.tri)
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid
xs, ys, _ = _swizzled_grid(W, H)
xs_p, ys_p, n, np_rays = _pad_tiles(xs, ys)
nt = np_rays // RAY_TILE

st, rng = emit_tiles(scene, xs_p, ys_p, 0)
lo = [jnp.min(grid.aabb[c]) for c in range(3)]
span = [jnp.maximum(jnp.max(grid.aabb[3 + c]) - lo[c], 1e-20)
        for c in range(3)]
pix = jnp.arange(np_rays, dtype=jnp.int32)
st_s, rng_s, pix_s = jax.jit(sort_bounce_state)(st, rng, pix, lo, span)
jax.block_until_ready(st_s)

for depth in (2, 3, 4, 8):
    sc = dataclasses.replace(scene, max_bounces=depth)
    r, g, b = jax.block_until_ready(resume_tiles(sc, st_s, rng_s))
    r = np.asarray(r)
    bad = ~np.isfinite(r)
    print(f"depth {depth}: nan lanes {bad.sum()} "
          f"tiles {np.unique(np.where(bad)[0])[:6]}", flush=True)
    if bad.sum() and depth == 8:
        ti, li = np.where(bad)
        sv = np.asarray(st_s).reshape(nt, _ST_ROWS, RAY_TILE)
        names = ["bo_x", "bo_y", "bo_z", "bd_x", "bd_y", "bd_z",
                 "tp_r", "tp_g", "tp_b", "rd_r", "rd_g", "rd_b", "alive"]
        for j in range(min(3, len(ti))):
            t_, l_ = ti[j], li[j]
            print(f"  lane ({t_},{l_}): r={r[t_, l_]}")
            for k, nm in enumerate(names):
                print(f"    {nm}={sv[t_, k, l_]:.6e}")
# interpret-mode twin on the same sorted state: does CPU also NaN?
ri, gi, bi = resume_tiles(scene, st_s, rng_s, interpret=True)
ri = np.asarray(ri)
print("interpret resume finite:", np.isfinite(ri).all())
r8, _, _ = resume_tiles(scene, st_s, rng_s)
r8 = np.asarray(r8)
m = np.isfinite(r8)
print("tpu-vs-interp equal on finite lanes:",
      np.array_equal(r8[m], ri[m]))
