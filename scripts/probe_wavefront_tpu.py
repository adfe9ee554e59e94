"""On-chip bisect of the wavefront path: which stage makes NaNs?"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.ops.megakernel import (
    _ST_ROWS, RAY_TILE, _pad_tiles, emit_tiles, render_tiles, resume_tiles)
from raytracinginonesemester_tpu.ops.wavefront import (
    render_tiles_wavefront, sort_bounce_state)
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

W, H = 320, 180
scene = _frog_scene(width=W, height=H, spp=1, max_bounces=8,
                    diffuse_bounce=True)
grid = scene.accel
jax.block_until_ready(grid.tri)
print(f"device {jax.devices()[0]}", flush=True)
xs, ys, _ = _swizzled_grid(W, H)
xs_p, ys_p, n, np_rays = _pad_tiles(xs, ys)
nt = np_rays // RAY_TILE

st, rng = jax.block_until_ready(emit_tiles(scene, xs_p, ys_p, 0))
stv = np.asarray(st).reshape(nt, _ST_ROWS, RAY_TILE)
print("emit finite:", np.isfinite(stv[:, :13]).all())
names = ["bo_x", "bo_y", "bo_z", "bd_x", "bd_y", "bd_z",
         "tp_r", "tp_g", "tp_b", "rd_r", "rd_g", "rd_b", "alive"]
for k, nm in enumerate(names):
    v = stv[:, k]
    print(f"  {nm}: finite={np.isfinite(v).all()} "
          f"min={np.nanmin(v):.3e} max={np.nanmax(v):.3e}")
print("alive:", (stv[:, 12] > 0).sum(), "/", nt * RAY_TILE)

lo = [jnp.min(grid.aabb[c]) for c in range(3)]
span = [jnp.maximum(jnp.max(grid.aabb[3 + c]) - lo[c], 1e-20)
        for c in range(3)]
pix = jnp.arange(np_rays, dtype=jnp.int32)
st_s, rng_s, pix_s = jax.block_until_ready(
    jax.jit(sort_bounce_state)(st, rng, pix, lo, span))
sv = np.asarray(st_s).reshape(nt, _ST_ROWS, RAY_TILE)
print("sorted finite:", np.isfinite(sv[:, :13]).all(),
      "alive:", (sv[:, 12] > 0).sum())
p = np.asarray(pix_s)
print("pix perm ok:", np.array_equal(np.sort(p), np.arange(np_rays)))

r, g, b = jax.block_until_ready(resume_tiles(scene, st_s, rng_s))
r = np.asarray(r)
print("resume finite:", np.isfinite(r).all(),
      "nan tiles:", np.unique(np.where(~np.isfinite(r))[0])[:10])

a = np.asarray(render_tiles(scene, xs, ys, 1))
bwf = np.asarray(render_tiles_wavefront(scene, xs, ys, 1))
print("mono finite:", np.isfinite(a).all(),
      "wf finite:", np.isfinite(bwf).all(),
      "equal:", np.array_equal(a, bwf),
      "maxdiff:", np.abs(a - bwf).max())
