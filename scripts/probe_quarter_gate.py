"""Triangle-axis (quarter-block) culling proxy.

The roofline notes the 1e8 target needs ray-triangle pairs cut below
the tile-union bound.  Sublane chunking already gates the RAY axis of
each dense visit; this probe asks whether gating the TRIANGLE axis
pays: split each 512-triangle block into 4 Morton-contiguous quarters
with their own AABBs, and count — per firing (tile, block) visit from
the camera tile hull — how many quarters the hull actually touches.
Estimated dense-pair reduction = mean touched quarters / 4 (a LOWER
bound: the kernel's per-ray any-reduce gate skips strictly more than
the conservative corner-ray hull).
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
from probe_treelet_blocks import sorted_leaves, tile_hull_visits

B = 512


def quarter_aabbs(order, lmin, lmax, qsize):
    t = len(order)
    nq = t // qsize
    qmin = lmin[order][: nq * qsize].reshape(nq, qsize, 3).min(1)
    qmax = lmax[order][: nq * qsize].reshape(nq, qsize, 3).max(1)
    return qmin, qmax


def main():
    for name, scene in (
        ("frog 1080p", _frog_scene(width=1920, height=1080)),
    ):
        geom = scene.geometry
        order, codes, lmin, lmax = sorted_leaves(
            np.asarray(geom.vertices), int(geom.num_triangles))
        # pad the order to full blocks with repeats of the last valid
        # leaf (padding lanes in the real grid have empty AABBs; using
        # repeats only makes quarters LOOSER -> conservative)
        pad = (-len(order)) % B
        order_p = np.concatenate([order, np.repeat(order[-1:], pad)])

        bmin, bmax = quarter_aabbs(order_p, lmin, lmax, B)
        hit_block = tile_hull_visits(scene, bmin, bmax)  # (nt, L)
        visits = hit_block.sum()

        for qsize in (256, 128, 64):
            qmin, qmax = quarter_aabbs(order_p, lmin, lmax, qsize)
            hit_q = tile_hull_visits(scene, qmin, qmax)  # (nt, L*4)
            nq = B // qsize
            l = hit_block.shape[1]
            hq = hit_q.reshape(hit_q.shape[0], l, nq)
            # only quarters inside FIRING block visits count
            touched = (hq & hit_block[:, :, None]).sum()
            frac = touched / (visits * nq)
            print(f"{name}: qsize {qsize:3d}: visits {int(visits)}, "
                  f"touched quarters {int(touched)}/{int(visits * nq)} "
                  f"= {frac:5.1%} of dense pairs kept "
                  f"({1 / max(frac, 1e-9):.2f}x pair cut)", flush=True)


if __name__ == "__main__":
    main()
