"""Exact bounce-1 visit statistics for the megakernel's flat block scan.

Reconstructs the bounce-1 wavefront (camera hit points + cosine bounce
dirs, same RNG as the kernel) in pure jnp on the chip, then counts per
(ray tile, block): does ANY lane pass the slab test?  That is exactly
the megakernel's dense-visit gate (with best-t = inf, i.e. an upper
bound that ignores in-scan best-t tightening), so

    visits/tile x 3.4us  ~ dense-visit time per tile per bounce

tells whether bounce time is dense work or per-block loop overhead.
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
print(f"device {jax.devices()[0]}, {scene.geometry.num_triangles} tris, "
      f"{grid.num_blocks} blocks", flush=True)

xs, ys, _ = _swizzled_grid(W, H)


@jax.jit
def bounce1_stats(xs, ys):
    jx, jy = rnglib.pixel_jitter(xs, ys, jnp.int32(0))
    px = xs.astype(jnp.float32) + jx
    py = ys.astype(jnp.float32) + jy
    o, d = scene.camera.get_rays(px, py)
    hits = block_closest(o, d, grid, det_eps=1e-8, tmin=1e-4)
    hit = hits.tri_idx >= 0
    p0, n, _ = make_hit_frame(o, d, hits, scene.geometry.vertices,
                              scene.geometry.normals, mode="gpu")
    # bounce origin/dir: offset hit point along shading normal, cosine dir
    p = p0 + 1e-3 * n
    st = rnglib.make_rng_seed(xs, ys, jnp.int32(0))
    st = rnglib.rng_next(st)[0]  # jitter consumed 2? approximation is fine
    _, bd = rnglib.random_on_hemisphere(n, st)
    inv = 1.0 / bd

    nt = xs.shape[0] // RAY_TILE
    po = p.reshape(nt, RAY_TILE, 3)
    iv = inv.reshape(nt, RAY_TILE, 3)
    alive = hit.reshape(nt, RAY_TILE)

    lo = grid.aabb[:3, :].T  # (B, 3): aabb is (6, L) plane-SoA
    hi = grid.aabb[3:6, :].T

    def tile_stat(po_t, iv_t, alive_t):
        # (RT, B) slab test
        t0 = jnp.full((RAY_TILE, grid.num_blocks), 1e-4, jnp.float32)
        t1 = jnp.full((RAY_TILE, grid.num_blocks), 3.4e38, jnp.float32)
        for a in range(3):
            la = (lo[None, :, a] - po_t[:, a, None]) * iv_t[:, a, None]
            ha = (hi[None, :, a] - po_t[:, a, None]) * iv_t[:, a, None]
            near = jnp.minimum(la, ha)
            far = jnp.maximum(la, ha)
            t0 = jnp.maximum(t0, near)
            t1 = jnp.minimum(t1, far * 1.0000004)
        pass_ = (t0 <= t1) & alive_t[:, None]
        visits = jnp.any(pass_, axis=0)            # (B,) visited blocks
        lanes = jnp.sum(pass_, axis=0)             # lanes passing per block
        return (jnp.sum(visits), jnp.sum(lanes),
                jnp.any(alive_t), jnp.sum(alive_t))

    visits, lanes, tile_alive, n_alive = jax.vmap(tile_stat)(po, iv, alive)
    return visits, lanes, tile_alive, n_alive


R = xs.shape[0]
n_chunks = 16
assert R % (n_chunks * RAY_TILE) == 0
parts = []
for c in range(n_chunks):
    sl = slice(c * R // n_chunks, (c + 1) * R // n_chunks)
    parts.append(jax.block_until_ready(bounce1_stats(xs[sl], ys[sl])))
v, l, ta, na = (np.concatenate([np.asarray(p[i]) for p in parts])
                for i in range(4))
nt = v.shape[0]
print(f"tiles {nt}, alive tiles {ta.sum()} ({ta.mean():.1%})")
print(f"alive rays: {na.sum()} ({na.sum() / (nt * RAY_TILE):.1%})")
av = v[ta]
print(f"visits/alive-tile: mean {av.mean():.1f} median {np.median(av):.0f} "
      f"p90 {np.percentile(av, 90):.0f} max {av.max()}")
print(f"total visits {v.sum()} -> est dense time "
      f"{v.sum() * 3.4e-6 * 1e3:.1f} ms/frame")
print(f"lanes passing per visit: {l.sum() / max(v.sum(), 1):.1f} "
      f"({l.sum() / max(v.sum(), 1) / RAY_TILE:.1%} of tile)")
