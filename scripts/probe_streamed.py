"""On-chip measurement of the streamed (HBM double-buffered DMA)
traversal vs the launch-per-chunk variants on a >VMEM scene.

Scene: the frog mesh instanced into a grid until ~400k triangles
(spatially disjoint copies keep block AABBs realistic).  Compares
pallas_block_closest_streamed vs pallas_block_closest_chunked and a
full render through the staged integrator, plus the triangle-
proportional expectation from the 20k-tri frog.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from raytracinginonesemester_tpu.io.obj import load_obj
from raytracinginonesemester_tpu.ops.accel import build_block_grid
from raytracinginonesemester_tpu.ops.pallas_kernels import (
    fits_vmem, num_chunks_for, pallas_block_closest,
    pallas_block_closest_chunked, pallas_block_closest_streamed)

mesh, _ = load_obj("/root/repo/tests/assets/meshes/frog.obj")
tris = mesh.positions[mesh.indices.reshape(-1, 3)].astype(np.float32)
print("frog tris:", tris.shape, flush=True)
copies = int(np.ceil(400_000 / tris.shape[0]))
side = int(np.ceil(np.sqrt(copies)))
ext = tris.reshape(-1, 3).max(0) - tris.reshape(-1, 3).min(0)
insts = []
for i in range(copies):
    off = np.array([(i % side) * ext[0] * 1.2,
                    (i // side) * ext[1] * 1.2, 0.0], np.float32)
    insts.append(tris + off)
big = np.concatenate(insts)[:400_000]
pad = (-big.shape[0]) % 512
big = np.concatenate([big, np.zeros((pad, 3, 3), np.float32)])
print("scene tris:", big.shape[0], flush=True)

grid = build_block_grid(jnp.asarray(big), jnp.asarray(400_000),
                        block_size=512)
print("blocks:", grid.num_blocks, "fits_vmem:", fits_vmem(grid),
      "chunks:", num_chunks_for(grid), flush=True)

# camera-ish rays at 1080p over the instanced grid
W, H = 1920, 1080
R = W * H
ys, xs = np.mgrid[0:H, 0:W]
center = big.reshape(-1, 3)[: 400_000 * 3].mean(0)
o = center + np.array([0, -0.9 * ext[1] * side, 0.35 * ext[2] * side], np.float32)
look = (center - o); look /= np.linalg.norm(look)
up = np.array([0, 0, 1.0], np.float32)
right = np.cross(look, up); right /= np.linalg.norm(right)
upv = np.cross(right, look)
u = (xs / W - 0.5).astype(np.float32).ravel()
vv = (ys / H - 0.5).astype(np.float32).ravel()
d = (look[None] + u[:, None] * right[None] * 1.6
     + vv[:, None] * upv[None] * 0.9)
d = d / np.linalg.norm(d, axis=1, keepdims=True)
o_j = jnp.asarray(np.tile(o, (R, 1)).astype(np.float32))
d_j = jnp.asarray(d.astype(np.float32))

def timeit(tag, f, *a):
    t0 = time.time(); out = f(*a)
    s = float(jax.device_get(jnp.sum(out.t)))
    print(f"{tag:28s} compile+1 {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time(); out = f(*a)
        s = float(jax.device_get(jnp.sum(out.t)))
        ts.append(time.time() - t0)
    print(f"{tag:28s} {sorted(ts)[1]*1e3:9.2f} ms", flush=True)
    return out

a = timeit("closest streamed 400k", lambda o, d: pallas_block_closest_streamed(
    o, d, grid, tmin=1e-4, det_eps=1e-8), o_j, d_j)
b = timeit("closest chunked 400k", lambda o, d: pallas_block_closest_chunked(
    o, d, grid, tmin=1e-4, det_eps=1e-8,
    num_chunks=num_chunks_for(grid)), o_j, d_j)
same = bool(jnp.all(a.tri_idx == b.tri_idx))
print("streamed == chunked winners:", same,
      "hits:", int(jnp.sum(a.hit)), flush=True)

# frog-scale baseline for the triangle-proportional comparison
frog_grid = build_block_grid(
    jnp.asarray(np.concatenate([tris,
                                np.zeros(((-tris.shape[0]) % 512, 3, 3),
                                         np.float32)])),
    jnp.asarray(tris.shape[0]), block_size=512)
c = timeit("closest resident frog 20k", lambda o, d: pallas_block_closest(
    o, d, frog_grid, tmin=1e-4, det_eps=1e-8), o_j, d_j)
