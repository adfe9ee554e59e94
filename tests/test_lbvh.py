"""LBVH construction and traversal tests.

Structural invariants mirror what the reference's Karras build guarantees
(``bvh.h:260-289``, ``bvh.cu:93-206``); functional equivalence is tested
against the brute-force intersector (the same oracle relationship the
reference gets from its CPU compile path).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from raytracinginonesemester_tpu.io.obj import load_obj, mesh_to_triangles
from raytracinginonesemester_tpu.ops.accel import (
    block_closest,
    block_occluded,
    build_block_grid,
)
from raytracinginonesemester_tpu.ops.intersect import intersect_closest, occluded
from raytracinginonesemester_tpu.ops.lbvh import build_lbvh, morton_codes
from raytracinginonesemester_tpu.ops.traversal import bvh_closest


def random_tris(n, seed=0, spread=4.0):
    rs = np.random.RandomState(seed)
    centers = rs.uniform(-spread, spread, size=(n, 1, 3))
    tri = centers + rs.uniform(-0.4, 0.4, size=(n, 3, 3))
    return jnp.asarray(tri.astype(np.float32))


def test_morton_codes_reference_values():
    """Interleave pattern: x gets bits 29,26,...; code(x=1rest0) etc.
    Independent check: morton(unit corner points)."""
    pts = jnp.asarray(
        np.array(
            [
                [0.0, 0.0, 0.0],
                [1.0, 1.0, 1.0],
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
            ],
            np.float32,
        )
    )
    codes = np.asarray(morton_codes(pts))
    assert codes[0] == 0
    # all-ones 30-bit code for the max corner (1023 in each axis)
    assert codes[1] == (1 << 30) - 1
    # single-axis max: every 3rd bit set, starting at the axis weight
    def spread_bits():
        v = 0
        for b in range(10):
            v |= 1 << (3 * b)
        return v

    assert codes[2] == spread_bits() * 4  # x has weight 4 (bvh.h:150)
    assert codes[3] == spread_bits() * 2  # y weight 2
    assert codes[4] == spread_bits() * 1  # z weight 1


@pytest.mark.parametrize("n", [2, 3, 17, 256, 1000])
def test_lbvh_structure(n):
    tris = random_tris(n, seed=n)
    bvh = build_lbvh(tris)
    P = n
    parent = np.asarray(bvh.parent)
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    obj = np.asarray(bvh.object_idx)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)

    assert parent.shape[0] == 2 * P - 1
    INV = 0xFFFFFFFF

    # leaves carry each original triangle exactly once
    leaf_objs = sorted(obj[P - 1 :].tolist())
    assert leaf_objs == list(range(P))
    assert (obj[: P - 1] == INV).all()

    # every node except the root is some internal node's child, exactly once
    child_count = np.zeros(2 * P - 1, np.int64)
    for i in range(P - 1):
        child_count[left[i]] += 1
        child_count[right[i]] += 1
    assert child_count[0] == 0  # root
    assert (child_count[1:] == 1).all()

    # parent pointers consistent with child links
    for i in range(P - 1):
        assert parent[left[i]] == i
        assert parent[right[i]] == i

    # the tree is connected: DFS from root reaches all nodes
    seen = np.zeros(2 * P - 1, bool)
    stack = [0]
    while stack:
        nidx = stack.pop()
        if seen[nidx]:
            continue
        seen[nidx] = True
        if obj[nidx] == INV:
            stack.append(int(left[nidx]))
            stack.append(int(right[nidx]))
    assert seen.all()

    # AABB containment: child boxes inside parent (refit correctness)
    for i in range(P - 1):
        for c in (int(left[i]), int(right[i])):
            assert (amin[i] <= amin[c] + 1e-6).all()
            assert (amax[i] >= amax[c] - 1e-6).all()

    # leaf AABBs match their triangles
    tris_np = np.asarray(tris)
    for li in range(P - 1, 2 * P - 1):
        t = int(obj[li])
        np.testing.assert_allclose(amin[li], tris_np[t].min(axis=0), atol=1e-6)
        np.testing.assert_allclose(amax[li], tris_np[t].max(axis=0), atol=1e-6)


def _random_rays(n, seed=1, spread=6.0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_bvh_closest_matches_bruteforce():
    tris = random_tris(512, seed=3)
    bvh = build_lbvh(tris)
    o, d = _random_rays(256, seed=4)
    hb = bvh_closest(o, d, bvh, tris, tmin=1e-4)
    hr = intersect_closest(o, d, tris, tmin=1e-4)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(hr.hit))
    hit = np.asarray(hr.hit)
    np.testing.assert_allclose(
        np.asarray(hb.t)[hit], np.asarray(hr.t)[hit], rtol=1e-6
    )
    # triangle ids agree except where exact-tie duplicates could differ
    same = np.asarray(hb.tri_idx)[hit] == np.asarray(hr.tri_idx)[hit]
    assert same.mean() > 0.99


def test_bvh_closest_on_mesh(sphere_mesh_path):
    mesh, _ = load_obj(sphere_mesh_path)
    verts, _ = mesh_to_triangles(mesh)
    pad = 1024 - verts.shape[0]
    verts = np.concatenate([verts, np.broadcast_to(verts[0, 0], (pad, 3, 3))])
    tris = jnp.asarray(verts)
    bvh = build_lbvh(tris)
    # rays from a ring toward the origin
    n = 128
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    o = np.stack([2 * np.cos(ang), 2 * np.sin(ang), np.full(n, 0.3)], -1).astype(
        np.float32
    )
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    hb = bvh_closest(o, d, bvh, tris, tmin=1e-4)
    hr = intersect_closest(o, d, tris, tmin=1e-4)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(hr.hit))
    np.testing.assert_allclose(np.asarray(hb.t), np.asarray(hr.t), rtol=1e-6)


def test_block_grid_matches_bruteforce():
    tris = random_tris(1024, seed=7)
    grid = build_block_grid(tris, jnp.asarray(1024), block_size=128)
    o, d = _random_rays(512, seed=8)
    hg = block_closest(o, d, grid, tmin=1e-4)
    hr = intersect_closest(o, d, tris, tmin=1e-4)
    np.testing.assert_array_equal(np.asarray(hg.hit), np.asarray(hr.hit))
    hit = np.asarray(hr.hit)
    np.testing.assert_allclose(
        np.asarray(hg.t)[hit], np.asarray(hr.t)[hit], rtol=1e-6
    )


def test_block_grid_padding_masked():
    """Padding triangles (num_valid < T) must never produce hits."""
    tris_np = np.array(random_tris(128, seed=9))
    # make the tail 64 triangles degenerate copies at a hittable location
    tris_np[64:] = tris_np[0]
    grid = build_block_grid(jnp.asarray(tris_np), jnp.asarray(64), block_size=64)
    o, d = _random_rays(128, seed=10)
    h = block_closest(o, d, grid, tmin=1e-4)
    assert np.asarray(h.tri_idx)[np.asarray(h.hit)].max(initial=-1) < 64


def test_block_occluded_matches_bruteforce():
    tris = random_tris(512, seed=11)
    grid = build_block_grid(tris, jnp.asarray(512), block_size=128)
    o, d = _random_rays(256, seed=12)
    bg = block_occluded(o, d, grid, tmin=1e-4, tmax=3.0)
    br = occluded(o, d, tris, tmin=1e-4, tmax=3.0)
    np.testing.assert_array_equal(np.asarray(bg), np.asarray(br))
