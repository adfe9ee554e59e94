"""Block-quality comparison: Morton RUNS vs LBVH TREELET-aligned cuts.

VERDICT round-2 item 6 asks the LBVH either to take a production role
(treelet-derived blocks with tighter AABBs) or for a measured
justification of the fixed Morton runs.  This probe measures both
partitions on the real workloads:

- **runs**: consecutive runs of ``block_size`` sorted leaves (what
  ``build_block_grid`` ships) — L blocks, zero padding lanes.
- **treelets**: recursive Karras splits (split each range at its
  highest differing Morton bit — exactly ``find_split``,
  ``bvh.h:219-257``) until a range fits ``block_size``; every block is
  then a complete LBVH subtree, padded to ``block_size`` lanes.

Cost model for the kernels' dense work (per camera pass):
  visits  = tile-hull x block-AABB slab intersections (every firing
            visit runs a full (RAY_TILE, B) Moller-Trumbore)
  pairs   = visits x block_size  (dense lanes incl. padding)
so treelets win only if tighter AABBs cut visits by more than the
padding multiplies the block count.
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

import jax.numpy as jnp

from __graft_entry__ import _frog_scene
from raytracinginonesemester_tpu.ops.lbvh import morton_codes, triangle_aabbs
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

B = 512
RAY_TILE = 512


def sorted_leaves(vertices, num_valid):
    lmin, lmax = triangle_aabbs(vertices)
    lmin, lmax = np.asarray(lmin), np.asarray(lmax)
    valid = np.arange(vertices.shape[0]) < num_valid
    smin = np.where(valid[:, None], lmin, np.inf).min(0)
    smax = np.where(valid[:, None], lmax, -np.inf).max(0)
    centroid = 0.5 * (lmin + lmax)
    ext = np.where(smax - smin == 0, 1.0, smax - smin)
    norm = (centroid - smin) / ext
    codes = np.asarray(morton_codes(jnp.asarray(norm)))
    codes = np.where(valid, codes, np.uint32(0xFFFFFFFF))
    order = np.argsort(codes, kind="stable")
    return order[valid[order]], codes[order][valid[order]], lmin, lmax


def treelet_cuts(codes, block_size):
    """Karras-split ranges of the sorted codes until <= block_size."""
    out = []
    stack = [(0, len(codes) - 1)]
    while stack:
        lo, hi = stack.pop()
        n = hi - lo + 1
        if n <= block_size:
            out.append((lo, hi))
            continue
        first, last = int(codes[lo]), int(codes[hi])
        if first == last:
            mid = lo + (n // 2) - 1  # equal codes: median split
        else:
            common = 32 - ((first ^ last).bit_length())
            # highest position where the prefix grows (find_split,
            # bvh.h:219-257): binary search for the last index sharing
            # > common prefix bits with `first`
            split, step = lo, n
            while step > 1:
                step = (step + 1) // 2
                nxt = split + step
                if nxt < hi:
                    code = int(codes[nxt])
                    prefix = 32 - ((first ^ code).bit_length() or 0)
                    if first == code:
                        prefix = 64
                    if prefix > common:
                        split = nxt
            mid = split
        stack.append((lo, mid))
        stack.append((mid + 1, hi))
    return sorted(out)


def block_aabbs(ranges, order, lmin, lmax):
    mins, maxs, counts = [], [], []
    for lo, hi in ranges:
        idx = order[lo:hi + 1]
        mins.append(lmin[idx].min(0))
        maxs.append(lmax[idx].max(0))
        counts.append(hi - lo + 1)
    return np.array(mins), np.array(maxs), np.array(counts)


def tile_hull_visits(scene, bmin, bmax):
    """Per 512-ray camera tile: blocks whose AABB intersects the
    jitter-inflated corner-ray hull (camera_tile_plan's interval slab,
    per BLOCK instead of per superblock)."""
    cam = scene.camera
    xs, ys, _ = _swizzled_grid(cam.width, cam.height)
    xs = np.asarray(xs).astype(np.float32)
    ys = np.asarray(ys).astype(np.float32)
    nt = len(xs) // RAY_TILE
    xs_t = xs[: nt * RAY_TILE].reshape(nt, RAY_TILE)
    ys_t = ys[: nt * RAY_TILE].reshape(nt, RAY_TILE)
    px_lo, px_hi = xs_t.min(1) - 0.5, xs_t.max(1) + 0.5
    py_lo, py_hi = ys_t.min(1) - 0.5, ys_t.max(1) + 0.5
    base = np.asarray(cam.pixel00_loc - cam.center)
    du, dv = np.asarray(cam.pixel_delta_u), np.asarray(cam.pixel_delta_v)
    cs = np.stack([
        base[None] + a[:, None] * du[None] + b[:, None] * dv[None]
        for a in (px_lo, px_hi) for b in (py_lo, py_hi)
    ])
    d_lo, d_hi = cs.min(0), cs.max(0)  # (nt, 3)
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
    hit = (near <= far) & (far >= 0.0)
    return hit  # (nt, L)


def report(tag, scene, ranges, order, lmin, lmax, counts_pad_to):
    bmin, bmax, counts = block_aabbs(ranges, order, lmin, lmax)
    hit = tile_hull_visits(scene, bmin, bmax)
    visits = int(hit.sum())
    pairs = visits * counts_pad_to
    real_pairs = int((hit * counts[None, :]).sum())
    fill = counts.mean() / counts_pad_to
    print(f"{tag:18s} blocks {len(ranges):5d}  fill {fill:5.1%}  "
          f"visits {visits:7d}  dense pairs {pairs / 1e6:8.1f}M  "
          f"real pairs {real_pairs / 1e6:8.1f}M", flush=True)
    return pairs


def main():
    for name, scene in (
        ("frog 1080p", _frog_scene(width=1920, height=1080)),
    ):
        geom = scene.geometry
        v = np.asarray(geom.vertices)
        t = int(geom.num_triangles)
        order, codes, lmin, lmax = sorted_leaves(geom.vertices, t)
        print(f"--- {name}: {t} tris ---", flush=True)
        runs = [(i, min(i + B, t) - 1) for i in range(0, t, B)]
        p_runs = report("morton runs", scene, runs, order, lmin, lmax, B)
        cuts = treelet_cuts(codes, B)
        p_tree = report("lbvh treelets", scene, cuts, order, lmin, lmax, B)
        print(f"treelet/runs dense-pair ratio: {p_tree / p_runs:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
