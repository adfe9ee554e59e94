"""On-chip cost of the staged wavefront's XLA glue (no bounce loop).

Times, as separate dispatches (scalar-fetch sync, subtract rtt):
  emit            — the depth-0 kernel alone
  emit+compact    — emit + tile gather + subset compaction sort
  emit+cpct+out   — + the subset pix-sort + radiance scatter-back
Against the full staged render; the residual is the bounce phase.

Run on the real TPU: `python scripts/probe_glue.py`.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.ops.megakernel import (
    _ST_ALIVE_ROW, _ST_ROWS, RAY_TILE, _pad_plan_rows, _pad_tiles,
    camera_tile_plan, emit_tiles)
from raytracinginonesemester_tpu.ops.wavefront import (
    render_tiles_wavefront, sort_bounce_state)
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

CAP = 256
scene = _frog_scene(width=1920, height=1080, spp=1, max_bounces=8,
                    diffuse_bounce=True)
grid = scene.accel
jax.block_until_ready(grid.tri)
xs, ys, _ = _swizzled_grid(1920, 1080)
xs_p, ys_p, n, np_rays = _pad_tiles(xs, ys)
nt = np_rays // RAY_TILE
plan = _pad_plan_rows(
    *camera_tile_plan(scene.camera, xs_p, ys_p, grid, RAY_TILE))
lo = [jnp.min(grid.aabb[c]) for c in range(3)]
span = [jnp.maximum(jnp.max(grid.aabb[3 + c]) - lo[c], 1e-20)
        for c in range(3)]


def timed(name, fn, iters=5):
    t0 = time.time()
    c = float(jax.device_get(jnp.sum(fn(0))))
    warm = time.time() - t0
    ts = []
    for i in range(iters):
        t0 = time.time()
        float(jax.device_get(jnp.sum(fn(i + 1))))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:16s}: {med * 1e3:8.2f} ms  (warm {warm:.1f}s, "
          f"chk {c:.4e})", flush=True)


noop = jax.jit(lambda o: jnp.full((8, 128), o, jnp.float32))
timed("rtt_floor", noop)

emit_j = jax.jit(lambda s: emit_tiles(scene, xs_p, ys_p, s, plan=plan)[0])
timed("emit", emit_j)


def compact(s):
    st, rng = emit_tiles(scene, xs_p, ys_p, s, plan=plan)
    stv = st.reshape(nt, _ST_ROWS, RAY_TILE)
    alive_t = jnp.any(stv[:, _ST_ALIVE_ROW] > 0.0, axis=1)
    iota_t = jnp.arange(nt, dtype=jnp.int32)
    key_t = jnp.where(alive_t, iota_t, iota_t + nt)
    idx = jnp.sort(jnp.argsort(key_t)[:CAP])
    st_g = st.reshape(nt, _ST_ROWS * RAY_TILE)[idx].reshape(
        CAP * _ST_ROWS, RAY_TILE)
    rng_g = rng.reshape(nt, 8 * RAY_TILE)[idx].reshape(CAP * 8, RAY_TILE)
    pix_g = (idx[:, None] * RAY_TILE
             + jnp.arange(RAY_TILE, dtype=jnp.int32)[None, :]
             ).reshape(CAP * RAY_TILE)
    return st, stv, idx, sort_bounce_state(st_g, rng_g, pix_g, lo, span)


timed("emit+compact", jax.jit(lambda s: compact(s)[3][0]))


def with_out(s):
    st, stv, idx, (h_st, h_rng, h_pix) = compact(s)
    fv = h_st.reshape(CAP, _ST_ROWS, RAY_TILE)
    _, r_s, g_s, b_s = jax.lax.sort(
        (h_pix, fv[:, 9].reshape(CAP * RAY_TILE),
         fv[:, 10].reshape(CAP * RAY_TILE),
         fv[:, 11].reshape(CAP * RAY_TILE)), dimension=0, num_keys=1)
    outs = []
    for row, sub in zip((9, 10, 11), (r_s, g_s, b_s)):
        outs.append(stv[:, row].at[idx].set(
            sub.reshape(CAP, RAY_TILE)).reshape(np_rays))
    return outs[0] + outs[1] + outs[2]


timed("emit+cpct+out", jax.jit(with_out))
timed("full staged", jax.jit(lambda s: jnp.sum(render_tiles_wavefront(
    scene, xs_p[:n], ys_p[:n], 1, sample_offset=s, capacity_tiles=CAP))))


# one staged bounce after compaction (isolates b1 from ladder/cond glue)
def with_b1(s):
    st, stv, idx, (h_st, h_rng, h_pix) = compact(s)
    from raytracinginonesemester_tpu.ops.megakernel import bounce_step_tiles
    ls = -(-grid.num_blocks // 8)
    order = jnp.zeros((CAP, ls), jnp.int32)
    entry = jnp.zeros((CAP, ls), jnp.float32)
    h_st, h_rng = bounce_step_tiles(scene, h_st, h_rng, order, entry)
    return jnp.sum(h_st.reshape(CAP, _ST_ROWS, RAY_TILE)[:, 9:12])


timed("emit+cpct+b1", jax.jit(with_b1))


def with_b1_sort(s):
    st, stv, idx, (h_st, h_rng, h_pix) = compact(s)
    from raytracinginonesemester_tpu.ops.megakernel import bounce_step_tiles
    ls = -(-grid.num_blocks // 8)
    order = jnp.zeros((CAP, ls), jnp.int32)
    entry = jnp.zeros((CAP, ls), jnp.float32)
    h_st, h_rng = bounce_step_tiles(scene, h_st, h_rng, order, entry)
    h_st, h_rng, h_pix = sort_bounce_state(h_st, h_rng, h_pix, lo, span)
    return jnp.sum(h_st.reshape(CAP, _ST_ROWS, RAY_TILE)[:, 9:12])


timed("emit+cpct+b1+s", jax.jit(with_b1_sort))
