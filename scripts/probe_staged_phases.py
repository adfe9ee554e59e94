"""On-chip phase breakdown of the STAGED wavefront scheduler.

Times one staged bounce iteration's pieces at the calibrated capacity
(plan / kernel / re-sort), plus the whole staged while_loop, to see
where the per-bounce ~16 ms goes.  Scalar-fetch sync; subtract the
rtt floor.

Run on the real TPU: `python scripts/probe_staged_phases.py [cap]`.
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
    bounce_step_tiles, camera_tile_plan, emit_tiles)
from raytracinginonesemester_tpu.ops.wavefront import (
    bounce_tile_plan, sort_bounce_state)
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 256
W, H, DEPTH = 1920, 1080, 8

scene = _frog_scene(width=W, height=H, spp=1, max_bounces=DEPTH,
                    diffuse_bounce=True)
grid = scene.accel
jax.block_until_ready(grid.tri)
xs, ys, _ = _swizzled_grid(W, H)
xs_p, ys_p, n, np_rays = _pad_tiles(xs, ys)
nt = np_rays // RAY_TILE
print(f"device {jax.devices()[0]}  cap {CAP}  tiles {nt}", flush=True)

plan = _pad_plan_rows(
    *camera_tile_plan(scene.camera, xs_p, ys_p, grid, RAY_TILE))
lo = [jnp.min(grid.aabb[c]) for c in range(3)]
span = [jnp.maximum(jnp.max(grid.aabb[3 + c]) - lo[c], 1e-20)
        for c in range(3)]
pix = jnp.arange(np_rays, dtype=jnp.int32)


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
    print(f"{name:18s}: {med * 1e3:8.2f} ms  (warmup {warm:.1f}s, "
          f"chk {c:.3e})", flush=True)
    return med


noop = jax.jit(lambda o: jnp.full((8, 128), o, jnp.float32))
timed("rtt_floor", noop)

emit_j = jax.jit(lambda s: emit_tiles(scene, xs_p, ys_p, s, plan=plan))
st, rng = jax.block_until_ready(emit_j(0))
sort_j = jax.jit(lambda st, rng, o: sort_bounce_state(
    st, rng, pix + o * 0, lo, span))
st_s, rng_s, pix_s = jax.block_until_ready(sort_j(st, rng, 0))

h_st = st_s[:CAP * _ST_ROWS]
h_rng = rng_s[:CAP * 8]
h_pix = pix_s[:CAP * RAY_TILE]

plan_j = jax.jit(lambda st, o: bounce_tile_plan(st + 0.0 * o, grid))
timed("bounce_plan", lambda o: plan_j(h_st, o))

order, entry = jax.block_until_ready(plan_j(h_st, 0))
step_j = jax.jit(lambda st, rng, order, entry, o: bounce_step_tiles(
    scene, st + 0.0 * o, rng, order, entry))
timed("bounce_kernel", lambda o: step_j(h_st, h_rng, order, entry, o))

st2, rng2 = jax.block_until_ready(step_j(h_st, h_rng, order, entry, 0))
resort_j = jax.jit(lambda st, rng, p, o: sort_bounce_state(
    st, rng, p + 0 * o, lo, span))
timed("re-sort(cap)", lambda o: resort_j(st2, rng2, h_pix, o))

# one fused (plan+kernel+sort) iteration, as the while body would run it
def one_iter(st, rng, p, o):
    order, entry = bounce_tile_plan(st + 0.0 * o, grid)
    st, rng = bounce_step_tiles(scene, st, rng, order, entry)
    return sort_bounce_state(st, rng, p, lo, span)
iter_j = jax.jit(one_iter)
timed("fused_iter", lambda o: iter_j(h_st, h_rng, h_pix, o))

# how many staged iterations actually run before the wavefront dies?
cur = (h_st, h_rng, h_pix)
for d in range(1, DEPTH):
    cur = jax.block_until_ready(iter_j(*cur, 0))
    a = np.asarray(cur[0].reshape(CAP, _ST_ROWS, RAY_TILE)
                   [:, _ST_ALIVE_ROW])
    print(f"after bounce {d}: alive {(a > 0).sum()} rays / "
          f"{(a > 0).any(1).sum()} tiles", flush=True)
    if (a > 0).sum() == 0:
        break
