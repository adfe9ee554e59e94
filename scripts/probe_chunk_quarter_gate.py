"""Ray-chunk x triangle-quarter pair-keep proxy for the camera pass.

The round-3 quarter gate culls the TRIANGLE axis of firing dense visits
at 128-lane granularity (keeps 43.5% of pairs on frog 1080p).  This
probe asks what chunking the RAY axis buys ON TOP: split each 512-ray
tile into 512/chunk contiguous subtiles (the swizzled grid keeps them
spatially coherent) and count, per firing (tile, quarter) visit, which
subtile hulls actually touch the quarter's AABB.  Estimated pair keep =
touched (subtile, quarter) cells / (firing visits * nq * nchunks) — a
LOWER bound on the cut: the kernel's per-ray slab-vs-best-t gate is
strictly tighter than the conservative corner-ray hull.

Cost model reminder: each gated cell costs one scalar `pl.when`; the
round-1 chunk=8 experiment (64 preds/visit) lost 2x, chunk=256 on the
staged bounce path (2 preds) won 2.3 ms — so keep rates must be read
against predicate counts (printed per configuration).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge

    if xla_bridge._backends:
        xla_bridge._clear_backends()
except Exception:
    pass

from __graft_entry__ import _frog_scene
from probe_quarter_gate import quarter_aabbs
from probe_treelet_blocks import sorted_leaves
from raytracinginonesemester_tpu.ops.megakernel import RAY_TILE
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

B = 512


def chunk_hull_visits(scene, bmin, bmax, chunk):
    """(n_subtiles, L) hull-slab hits with ``chunk`` rays per subtile
    (probe_treelet_blocks.tile_hull_visits generalized to subtiles)."""
    cam = scene.camera
    xs, ys, _ = _swizzled_grid(cam.width, cam.height)
    xs = np.asarray(xs).astype(np.float32)
    ys = np.asarray(ys).astype(np.float32)
    nt = len(xs) // chunk
    xs_t = xs[: nt * chunk].reshape(nt, chunk)
    ys_t = ys[: nt * chunk].reshape(nt, chunk)
    px_lo, px_hi = xs_t.min(1) - 0.5, xs_t.max(1) + 0.5
    py_lo, py_hi = ys_t.min(1) - 0.5, ys_t.max(1) + 0.5
    base = np.asarray(cam.pixel00_loc - cam.center)
    du, dv = np.asarray(cam.pixel_delta_u), np.asarray(cam.pixel_delta_v)
    cs = np.stack([
        base[None] + a[:, None] * du[None] + b[:, None] * dv[None]
        for a in (px_lo, px_hi) for b in (py_lo, py_hi)
    ])
    d_lo, d_hi = cs.min(0), cs.max(0)
    c = np.asarray(cam.center)

    near = np.zeros((nt, bmin.shape[0]), np.float64)
    far = np.full_like(near, np.inf)
    for ax in range(3):
        dlo = d_lo[:, ax:ax + 1].astype(np.float64)
        dhi = d_hi[:, ax:ax + 1].astype(np.float64)
        spans0 = (dlo <= 0.0) & (dhi >= 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_a, inv_b = 1.0 / dhi, 1.0 / dlo
            ca = bmin[None, :, ax] - c[ax]
            cb = bmax[None, :, ax] - c[ax]
            cands = np.stack([ca * inv_a, ca * inv_b,
                              cb * inv_a, cb * inv_b])
        lo_ax = np.nanmin(cands, 0)
        hi_ax = np.nanmax(cands, 0)
        lo_ax = np.where(spans0, -np.inf, lo_ax)
        hi_ax = np.where(spans0, np.inf, hi_ax)
        near = np.maximum(near, lo_ax)
        far = np.minimum(far, hi_ax)
    return (near <= far) & (far >= 0.0)  # (n_subtiles, L)


def main():
    scene = _frog_scene(width=1920, height=1080)
    geom = scene.geometry
    order, codes, lmin, lmax = sorted_leaves(
        np.asarray(geom.vertices), int(geom.num_triangles))
    pad = (-len(order)) % B
    order_p = np.concatenate([order, np.repeat(order[-1:], pad)])

    bmin, bmax = quarter_aabbs(order_p, lmin, lmax, B)
    hit_block = chunk_hull_visits(scene, bmin, bmax, RAY_TILE)  # (nt, L)
    visits = int(hit_block.sum())
    l = hit_block.shape[1]

    for qsize in (512, 128):
        nq = B // qsize
        qmin, qmax = quarter_aabbs(order_p, lmin, lmax, qsize)
        for chunk in (512, 256, 128, 64):
            nch = RAY_TILE // chunk
            hq = chunk_hull_visits(scene, qmin, qmax, chunk)
            # (nt, nch, L, nq) subtile-x-quarter cells inside firing
            # (tile, block) visits
            hq4 = hq.reshape(-1, nch, l, nq)
            cells = (hq4 & hit_block[:, None, :, None]).sum()
            total = visits * nq * nch
            preds = nq * nch
            print(f"qsize {qsize:3d} chunk {chunk:3d}: "
                  f"{int(cells)}/{total} = {cells / total:5.1%} pairs "
                  f"kept ({total / max(cells, 1):.2f}x cut), "
                  f"{preds} preds/visit", flush=True)


if __name__ == "__main__":
    main()
