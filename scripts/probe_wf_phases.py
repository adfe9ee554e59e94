"""On-chip phase breakdown of the wavefront path at full resolution.

Times emit / sort / resume / unsort separately (each as its own jitted
dispatch, scalar-fetch sync, minus the rtt floor), plus resume on an
all-dead state (the theoretical floor of the packed suffix) and on the
UNSORTED emit state (what resume costs without compaction).

Run on the real TPU: `python scripts/probe_wf_phases.py [W H depth]`.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.ops.megakernel import (
    _ST_ALIVE_ROW, _ST_ROWS, RAY_TILE, _pad_plan_rows, _pad_tiles,
    camera_tile_plan, emit_tiles, resume_tiles)
from raytracinginonesemester_tpu.ops.wavefront import sort_bounce_state
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

args = [int(a) for a in sys.argv[1:]]
W, H = (args[0], args[1]) if len(args) >= 2 else (1920, 1080)
DEPTH = args[2] if len(args) >= 3 else 8

scene = _frog_scene(width=W, height=H, spp=1, max_bounces=DEPTH,
                    diffuse_bounce=True)
grid = scene.accel
jax.block_until_ready(grid.tri)
xs, ys, _ = _swizzled_grid(W, H)
xs_p, ys_p, n, np_rays = _pad_tiles(xs, ys)
nt = np_rays // RAY_TILE
print(f"device {jax.devices()[0]}  {W}x{H} depth {DEPTH}  tiles {nt}",
      flush=True)

plan = _pad_plan_rows(
    *camera_tile_plan(scene.camera, xs_p, ys_p, grid, RAY_TILE))
lo = [jnp.min(grid.aabb[c]) for c in range(3)]
span = [jnp.maximum(jnp.max(grid.aabb[3 + c]) - lo[c], 1e-20)
        for c in range(3)]
pix = jnp.arange(np_rays, dtype=jnp.int32)


def timed(name, fn, iters=5):
    t0 = time.time()
    out = fn(0)
    c = float(jax.device_get(jnp.sum(out[0] if isinstance(out, tuple)
                                     else out)))
    warm = time.time() - t0
    times = []
    for i in range(iters):
        t0 = time.time()
        out = fn(i + 1)
        float(jax.device_get(jnp.sum(out[0] if isinstance(out, tuple)
                                     else out)))
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"{name:16s}: {med * 1e3:8.2f} ms  (warmup {warm:.1f}s, "
          f"chk {c:.3e}, all {[f'{t*1e3:.1f}' for t in times]})",
          flush=True)
    return med


noop = jax.jit(lambda o: jnp.full((8, 128), o, jnp.float32))
timed("rtt_floor", noop)

emit_j = jax.jit(lambda s: emit_tiles(scene, xs_p, ys_p, s, plan=plan))
t_emit = timed("emit(d0)", emit_j)

st, rng = emit_j(0)
st = jax.block_until_ready(st)
alive = np.asarray(st.reshape(nt, _ST_ROWS, RAY_TILE)[:, _ST_ALIVE_ROW])
print(f"alive rays: {(alive > 0).sum()}/{nt * RAY_TILE} "
      f"({100.0 * (alive > 0).mean():.2f}%)  "
      f"alive tiles: {(alive > 0).any(1).sum()}/{nt}", flush=True)

sort_j = jax.jit(lambda st, rng, o: sort_bounce_state(
    st, rng, pix + o * 0, lo, span))
timed("sort16", lambda o: sort_j(st, rng, o))

st_s, rng_s, pix_s = jax.block_until_ready(sort_j(st, rng, 0))
a_s = np.asarray(st_s.reshape(nt, _ST_ROWS, RAY_TILE)[:, _ST_ALIVE_ROW])
print(f"sorted alive tiles: {(a_s > 0).any(1).sum()}/{nt}", flush=True)

res_j = jax.jit(lambda st, rng, o: resume_tiles(
    scene, st + 0.0 * o, rng))
timed("resume(sorted)", lambda o: res_j(st_s, rng_s, o))
timed("resume(unsort)", lambda o: res_j(st, rng, o))

# all-dead floor: zero the alive row everywhere
stv = np.asarray(st_s).reshape(nt, _ST_ROWS, RAY_TILE).copy()
stv[:, _ST_ALIVE_ROW] = 0.0
st_dead = jnp.asarray(stv.reshape(nt * _ST_ROWS, RAY_TILE))
timed("resume(alldead)", lambda o: res_j(st_dead, rng_s, o))

r, g, b = res_j(st_s, rng_s, 0)
uns_j = jax.jit(lambda p, r, g, b, o: jax.lax.sort(
    (p + 0 * o, r.reshape(np_rays), g.reshape(np_rays),
     b.reshape(np_rays)), dimension=0, num_keys=1))
timed("unsort4", lambda o: uns_j(pix_s, r, g, b, o)[1])
