"""Simulate the megakernel's bounce-1 flat scan and count, per tile:

  - gated visits  (any lane passes the block slab -> dense test runs)
  - improving visits (any lane improves its (t,id) -> attr block fires)
  - distinct winner blocks (the visits a deferred attr pass would need)

Decides between a two-pass deferred-attribute scan (saving ~= (improving
- winners) x attr_cost) and the wavefront compaction architecture.
Uses the exact bounce-1 wavefront (camera hits + cosine dirs, kernel
RNG) at the current RT_BLOCK_SIZE.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.core import rng as rnglib
from raytracinginonesemester_tpu.ops.accel import block_closest
from raytracinginonesemester_tpu.ops.intersect import make_hit_frame
from raytracinginonesemester_tpu.ops.pallas_kernels import RAY_TILE
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

W, H = 1920, 1080
scene = _frog_scene(width=W, height=H, spp=1)
grid = scene.accel
jax.block_until_ready(grid.tri)
B = grid.block_size
L = grid.num_blocks
print(f"device {jax.devices()[0]}, {L} blocks x {B}", flush=True)

xs, ys, _ = _swizzled_grid(W, H)
F32_MAX = np.float32(3.4e38)
INT_MAX = np.int32(2**31 - 1)


@jax.jit
def bounce1_rays(xs, ys):
    jx, jy = rnglib.pixel_jitter(xs, ys, jnp.int32(0))
    px = xs.astype(jnp.float32) + jx
    py = ys.astype(jnp.float32) + jy
    o, d = scene.camera.get_rays(px, py)
    hits = block_closest(o, d, grid, det_eps=1e-8, tmin=1e-4)
    p0, n, _ = make_hit_frame(o, d, hits, scene.geometry.vertices,
                              scene.geometry.normals, mode="gpu")
    p = p0 + 1e-3 * n
    st = rnglib.make_rng_seed(xs, ys, jnp.int32(0))
    st = rnglib.rng_next(st)[0]
    _, bd = rnglib.random_on_hemisphere(n, st)
    return p, bd, hits.tri_idx >= 0


@jax.jit
def scan_tile(p, bd, alive):
    """Walk the L blocks in order like the kernel; count visit kinds."""
    inv = 1.0 / bd
    tri = grid.tri  # (9, L, B)
    ids = grid.tri_index  # (L, B)
    lo = grid.aabb[:3]  # (3, L)
    hi = grid.aabb[3:]

    def body(k, carry):
        best_t, best_id, gated, improving, winner_blk = carry
        t0 = jnp.full((RAY_TILE,), 1e-4, jnp.float32)
        t1 = best_t
        for a in range(3):
            la = (lo[a, k] - p[:, a]) * inv[:, a]
            ha = (hi[a, k] - p[:, a]) * inv[:, a]
            t0 = jnp.maximum(t0, jnp.minimum(la, ha))
            t1 = jnp.minimum(t1, jnp.maximum(la, ha) * 1.0000004)
        boxed = (t0 <= t1) & alive
        any_boxed = jnp.any(boxed)

        v0 = tri[:, k]  # (9, B)
        e2 = v0[6:9]
        pv = jnp.stack([
            bd[:, 1, None] * e2[2] - bd[:, 2, None] * e2[1],
            bd[:, 2, None] * e2[0] - bd[:, 0, None] * e2[2],
            bd[:, 0, None] * e2[1] - bd[:, 1, None] * e2[0],
        ])
        e1 = v0[3:6]
        det = e1[0] * pv[0] + e1[1] * pv[1] + e1[2] * pv[2]
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-8, 1.0, det)
        tv = jnp.stack([p[:, a, None] - v0[a][None, :]
                        for a in range(3)])  # (3, R, B)
        u = (tv[0] * pv[0] + tv[1] * pv[1] + tv[2] * pv[2]) * inv_det
        qv = jnp.stack([
            tv[1] * e1[2] - tv[2] * e1[1],
            tv[2] * e1[0] - tv[0] * e1[2],
            tv[0] * e1[1] - tv[1] * e1[0],
        ])
        v = (bd[:, 0, None] * qv[0] + bd[:, 1, None] * qv[1]
             + bd[:, 2, None] * qv[2]) * inv_det
        t = (e2[0] * qv[0] + e2[1] * qv[1] + e2[2] * qv[2]) * inv_det
        ok = ((jnp.abs(det) >= 1e-8) & (u >= 0) & (u <= 1) & (v >= 0)
              & (u + v <= 1) & (t >= 1e-4) & (t <= best_t[:, None])
              & (ids[k] >= 0)[None, :] & boxed[:, None])
        t = jnp.where(ok, t, F32_MAX)
        min_t = jnp.min(t, axis=1)
        at_min = t == min_t[:, None]
        id_key = jnp.where(at_min & ok, ids[k][None], INT_MAX)
        bid = jnp.min(id_key, axis=1)
        old_key = jnp.where(best_id >= 0, best_id, INT_MAX)
        take = (min_t < F32_MAX) & (
            (min_t < best_t) | ((min_t == best_t) & (bid < old_key)))
        any_take = jnp.any(take) & any_boxed
        best_t = jnp.where(take & (any_boxed), min_t, best_t)
        best_id = jnp.where(take & (any_boxed), bid, best_id)
        winner_blk = jnp.where(take & any_boxed, k, winner_blk)
        return (best_t, best_id,
                gated + jnp.where(any_boxed, 1, 0),
                improving + jnp.where(any_take, 1, 0),
                winner_blk)

    init = (jnp.full((RAY_TILE,), F32_MAX), jnp.full((RAY_TILE,), -1,
            jnp.int32), jnp.int32(0), jnp.int32(0),
            jnp.full((RAY_TILE,), -1, jnp.int32))
    best_t, best_id, gated, improving, wblk = jax.lax.fori_loop(
        0, L, body, init)
    # distinct winner blocks among rays that hit
    onehot = jnp.zeros((L,), jnp.int32).at[jnp.where(
        best_id >= 0, wblk, 0)].max(jnp.where(best_id >= 0, 1, 0))
    return gated, improving, jnp.sum(onehot), jnp.sum(alive)


R = xs.shape[0]
n_chunks = 16
rows = []
for c in range(n_chunks):
    sl = slice(c * R // n_chunks, (c + 1) * R // n_chunks)
    p, bd, alive = jax.block_until_ready(bounce1_rays(xs[sl], ys[sl]))
    nt = p.shape[0] // RAY_TILE
    g, i, w, na = jax.vmap(scan_tile)(
        p.reshape(nt, RAY_TILE, 3), bd.reshape(nt, RAY_TILE, 3),
        alive.reshape(nt, RAY_TILE))
    rows.append(np.stack([np.asarray(g), np.asarray(i), np.asarray(w),
                          np.asarray(na)], -1))
rows = np.concatenate(rows)
alive_tiles = rows[:, 3] > 0
r = rows[alive_tiles]
print(f"alive tiles {alive_tiles.sum()}, blocks {L}")
for name, col in (("gated visits", 0), ("improving visits", 1),
                  ("distinct winner blocks", 2), ("alive rays", 3)):
    print(f"{name}/alive-tile: mean {r[:, col].mean():7.1f} "
          f"median {np.median(r[:, col]):5.0f} p90 "
          f"{np.percentile(r[:, col], 90):5.0f}")
