"""Pallas kernel equivalence tests (interpret mode on CPU).

The analog of the reference's single-source CPU/GPU duality
(``GPUandCPU/CMakeLists.txt:35-51``): the fused kernel must agree with
the XLA block path, which in turn is tested against brute force.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracinginonesemester_tpu.ops.accel import (
    block_closest,
    block_occluded,
    build_block_grid,
)
from raytracinginonesemester_tpu.ops.pallas_kernels import (
    fits_vmem,
    pallas_block_closest,
    pallas_block_occluded,
)


@pytest.fixture(scope="module")
def grid_and_rays():
    rs = np.random.RandomState(0)
    tris = jnp.asarray(
        (rs.uniform(-4, 4, (1024, 1, 3)) + rs.uniform(-0.4, 0.4, (1024, 3, 3)))
        .astype(np.float32)
    )
    grid = build_block_grid(tris, jnp.asarray(1000), block_size=128)
    o = jnp.asarray(rs.uniform(-6, 6, (300, 3)).astype(np.float32))
    d = rs.normal(size=(300, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return grid, o, jnp.asarray(d)


def test_fits_vmem(grid_and_rays):
    grid, _, _ = grid_and_rays
    assert fits_vmem(grid)


def test_closest_matches_xla(grid_and_rays):
    grid, o, d = grid_and_rays
    ha = block_closest(o, d, grid, tmin=1e-4)
    hp = pallas_block_closest(o, d, grid, tmin=1e-4, interpret=True)
    # hit set and winning triangles identical; t may differ by fusion
    # rounding ulps between the two compilations
    np.testing.assert_array_equal(np.asarray(ha.hit), np.asarray(hp.hit))
    np.testing.assert_array_equal(np.asarray(ha.tri_idx), np.asarray(hp.tri_idx))
    np.testing.assert_allclose(np.asarray(ha.t), np.asarray(hp.t), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ha.u), np.asarray(hp.u), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ha.v), np.asarray(hp.v), rtol=1e-5, atol=1e-6)


def test_occluded_matches_xla(grid_and_rays):
    grid, o, d = grid_and_rays
    ba = block_occluded(o, d, grid, tmin=1e-4, tmax=4.0)
    bp = pallas_block_occluded(o, d, grid, tmin=1e-4, tmax=4.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(ba), np.asarray(bp))


def test_ray_padding(grid_and_rays):
    """Ray counts not divisible by RAY_TILE are padded and unpadded."""
    grid, o, d = grid_and_rays
    h_all = pallas_block_closest(o, d, grid, interpret=True)
    h_sub = pallas_block_closest(o[:37], d[:37], grid, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(h_all.tri_idx)[:37], np.asarray(h_sub.tri_idx)
    )


def test_kernel_normals_match_hit_frame(grid_and_rays):
    """In-kernel gpu-dialect shading normals must match make_hit_frame."""
    import jax.numpy as jnp

    from raytracinginonesemester_tpu.ops.intersect import make_hit_frame

    rs = np.random.RandomState(5)
    tris_np = np.asarray(
        (rs.uniform(-4, 4, (256, 1, 3)) + rs.uniform(-0.4, 0.4, (256, 3, 3)))
        .astype(np.float32)
    )
    normals_np = rs.normal(size=(256, 3, 3)).astype(np.float32)
    normals_np /= np.linalg.norm(normals_np, axis=-1, keepdims=True)
    grid = build_block_grid(
        jnp.asarray(tris_np), jnp.asarray(256), block_size=128,
        normals=jnp.asarray(normals_np),
    )
    o = jnp.asarray(rs.uniform(-6, 6, (200, 3)).astype(np.float32))
    d = rs.normal(size=(200, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)

    hits, knorm = pallas_block_closest(
        o, d, grid, tmin=1e-4, interpret=True, return_normal=True
    )
    _, n_ref, _ = make_hit_frame(
        o, d, hits, jnp.asarray(tris_np), jnp.asarray(normals_np), mode="gpu"
    )
    hit = np.asarray(hits.hit)
    np.testing.assert_allclose(
        np.asarray(knorm)[hit], np.asarray(n_ref)[hit], rtol=1e-4, atol=1e-5
    )


def test_interval_plan_superset_of_exact(grid_and_rays):
    """tile_visit_plan_fast must visit a superset of the exact per-ray
    plan's superblocks, with entry distances that lower-bound the exact
    entries — the two properties that make it a drop-in conservative
    replacement (bit-identical kernel results)."""
    from raytracinginonesemester_tpu.ops.accel import (
        tile_visit_plan, tile_visit_plan_fast)
    from raytracinginonesemester_tpu.ops.intersect import F32_MAX
    from raytracinginonesemester_tpu.ops.pallas_kernels import (
        RAY_TILE, _prep_rays)

    grid, o, d = grid_and_rays
    # a coherent tile (shared origin, small cone) + the incoherent rays
    rs = np.random.RandomState(7)
    co = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -6.0], jnp.float32), (212, 3))
    cd = np.concatenate(
        [rs.uniform(-0.2, 0.2, (212, 2)), np.ones((212, 1))], axis=1
    ).astype(np.float32)
    cd /= np.linalg.norm(cd, axis=-1, keepdims=True)
    o = jnp.concatenate([o, co])
    d = jnp.concatenate([d, jnp.asarray(cd)])

    rays, _ = _prep_rays(o, d, 1e-4, F32_MAX)
    a = (rays[:, 0:3], rays[:, 3:6], grid, rays[:, 6], rays[:, 7], RAY_TILE)
    e_order, e_entry, e_count = tile_visit_plan(*a)
    f_order, f_entry, f_count = tile_visit_plan_fast(*a)

    e_order, e_entry = np.asarray(e_order), np.asarray(e_entry)
    f_order, f_entry = np.asarray(f_order), np.asarray(f_entry)
    for ti in range(e_order.shape[0]):
        exact = {int(s): float(t) for s, t in zip(e_order[ti], e_entry[ti])
                 if np.isfinite(t)}
        fast = {int(s): float(t) for s, t in zip(f_order[ti], f_entry[ti])
                if np.isfinite(t)}
        assert set(exact) <= set(fast), f"tile {ti} lost superblocks"
        for s, t in exact.items():
            assert fast[s] <= t + 1e-5, f"tile {ti} super {s} entry not a lower bound"


def test_interval_plan_parked_tile_empty():
    """A tile whose rays are all parked (origin 1e30) must plan nothing."""
    from raytracinginonesemester_tpu.ops.accel import (
        build_block_grid, tile_visit_plan_fast)

    rs = np.random.RandomState(1)
    tris = jnp.asarray(
        (rs.uniform(-4, 4, (128, 1, 3)) + rs.uniform(-0.4, 0.4, (128, 3, 3)))
        .astype(np.float32))
    grid = build_block_grid(tris, jnp.asarray(128), block_size=128)
    o = jnp.full((512, 3), 1e30, jnp.float32)
    d = jnp.ones((512, 3), jnp.float32)
    _, entry, count = tile_visit_plan_fast(
        o, d, grid, jnp.full((512,), 1e-4), jnp.full((512,), 3.4e38), 512)
    assert int(np.asarray(count)[0, 0]) == 0
    assert not np.isfinite(np.asarray(entry)).any()


def test_chunked_closest_bit_identical(grid_and_rays):
    """>VMEM path: chunked traversal must merge to EXACTLY the
    single-launch result (the (t, global id) tie-break is partition-
    invariant, CLAUDE.md invariants)."""
    from raytracinginonesemester_tpu.ops.pallas_kernels import (
        pallas_block_closest_chunked,
    )

    grid, o, d = grid_and_rays
    h1 = pallas_block_closest(o, d, grid, tmin=1e-4, interpret=True,
                              return_normal=True)
    for n in (2, 3):
        hn = pallas_block_closest_chunked(
            o, d, grid, tmin=1e-4, interpret=True, return_normal=True,
            num_chunks=n,
        )
        np.testing.assert_array_equal(np.asarray(h1[0].hit),
                                      np.asarray(hn[0].hit))
        np.testing.assert_array_equal(np.asarray(h1[0].tri_idx),
                                      np.asarray(hn[0].tri_idx))
        np.testing.assert_array_equal(np.asarray(h1[0].t),
                                      np.asarray(hn[0].t))
        hit = np.asarray(h1[0].hit)
        np.testing.assert_array_equal(np.asarray(h1[1])[hit],
                                      np.asarray(hn[1])[hit])


def test_chunked_occluded_bit_identical(grid_and_rays):
    from raytracinginonesemester_tpu.ops.pallas_kernels import (
        pallas_block_occluded_chunked,
    )

    grid, o, d = grid_and_rays
    b1 = pallas_block_occluded(o, d, grid, tmin=1e-4, tmax=6.0,
                               interpret=True)
    bn = pallas_block_occluded_chunked(o, d, grid, tmin=1e-4, tmax=6.0,
                                       interpret=True, num_chunks=3)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(bn))


def test_num_chunks_for_budget(monkeypatch):
    """num_chunks_for sizes chunks under the budget and the integrator
    renders >VMEM scenes identically through the chunked kernels."""
    import raytracinginonesemester_tpu.ops.pallas_kernels as pk

    rs = np.random.RandomState(2)
    tris = jnp.asarray(
        (rs.uniform(-4, 4, (1024, 1, 3)) + rs.uniform(-0.4, 0.4, (1024, 3, 3)))
        .astype(np.float32))
    grid = build_block_grid(tris, jnp.asarray(1024), block_size=128)
    assert pk.num_chunks_for(grid) == 1
    # shrink the budget so this 8-block grid needs several launches
    one_block = pk._grid_bytes(1, 128)
    monkeypatch.setattr(pk, "_VMEM_TRI_BUDGET_BYTES", 3 * one_block)
    n = pk.num_chunks_for(grid)
    assert n >= 3 and pk._grid_bytes(-(-8 // n), 128) < 3 * one_block


def test_render_scene_chunked_identical(monkeypatch):
    """Full render through the integrator with a forced-tiny VMEM budget.

    Chunk-count invariance must be EXACT (same staged shadow path, merge
    by (t, global id)).  Against the unchunked base the comparison is
    near-exact: the unchunked kernel fuses its shadow rays in-kernel
    while the chunked path stages a separate occlusion pass, and a
    grazing shadow ray may flip visibility at isolated boundary pixels
    (ulp-level t differences at the occluder's silhouette).
    """
    import raytracinginonesemester_tpu.ops.pallas_kernels as pk
    from conftest import REPO
    from raytracinginonesemester_tpu.render.renderer import render_scene
    from raytracinginonesemester_tpu.scene.build import load_scene

    scene = load_scene(str(REPO / "tests/assets/scenes/gpu_spheres.json"),
                       accel="blocks")
    # force the Pallas path (interpret mode on CPU) + tiny budget
    import dataclasses
    scene = dataclasses.replace(scene, use_pallas=True, terminal_only=False)
    base = np.asarray(render_scene(scene, jitter_mode="center",
                                   spp_override=1))
    one_block = pk._grid_bytes(1, 128)
    monkeypatch.setattr(pk, "_VMEM_TRI_BUDGET_BYTES", 4 * one_block)
    n_auto = pk.num_chunks_for(scene.accel)
    assert n_auto > 1
    # the budget is read at TRACE time — force a retrace or the cached
    # unchunked executable would run and the test would prove nothing
    jax.clear_caches()
    chunked = np.asarray(render_scene(scene, jitter_mode="center",
                                      spp_override=1))
    monkeypatch.setattr(pk, "_VMEM_TRI_BUDGET_BYTES", 2 * one_block)
    assert pk.num_chunks_for(scene.accel) > n_auto
    jax.clear_caches()
    chunked2 = np.asarray(render_scene(scene, jitter_mode="center",
                                       spp_override=1))
    jax.clear_caches()  # don't leak tiny-budget executables to other tests

    np.testing.assert_array_equal(chunked, chunked2)  # chunk-count invariant
    diff_px = (np.abs(base - chunked).max(-1) > 1e-5).sum()
    assert diff_px <= 3, f"{diff_px} pixels differ vs unchunked base"


def test_streamed_kernels_match_xla_block_path():
    """The HBM-streamed (double-buffered DMA) kernels must be
    bit-identical to the XLA block path: same _mt_block math, same
    (t, global id) tie-break — streaming only changes WHERE the planes
    live, never which winner a ray picks."""
    import jax.numpy as jnp

    from raytracinginonesemester_tpu.ops.accel import (block_closest,
                                                       block_occluded,
                                                       build_block_grid)
    from raytracinginonesemester_tpu.ops.pallas_kernels import (
        pallas_block_closest_streamed, pallas_block_occluded_streamed)

    rs = np.random.RandomState(7)
    t = 4096
    tris = jnp.asarray(rs.uniform(-1, 1, (t, 3, 3)).astype(np.float32))
    grid = build_block_grid(tris, jnp.asarray(t), block_size=128)
    r = 1024
    o = jnp.asarray(np.tile([0.0, -3.0, 0.0], (r, 1)).astype(np.float32))
    d = rs.uniform(-1, 1, (r, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    ref = block_closest(o, d, grid, tmin=1e-4, det_eps=1e-8)
    st = pallas_block_closest_streamed(o, d, grid, tmin=1e-4,
                                       det_eps=1e-8, interpret=True)
    assert int(np.sum(np.asarray(ref.hit))) > 0
    np.testing.assert_array_equal(np.asarray(ref.tri_idx),
                                  np.asarray(st.tri_idx))
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(ref.t)[hit],
                                  np.asarray(st.t)[hit])
    np.testing.assert_array_equal(np.asarray(ref.u)[hit],
                                  np.asarray(st.u)[hit])

    tmax = jnp.full(r, 2.5)
    occ_ref = block_occluded(o, d, grid, tmin=1e-4, tmax=tmax, det_eps=1e-8)
    occ_st = pallas_block_occluded_streamed(o, d, grid, tmin=1e-4,
                                            tmax=tmax, det_eps=1e-8,
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(occ_ref), np.asarray(occ_st))


def test_blockmajor_kernels_match_xla_block_path():
    """Block-major streaming (scene slabs swept over resident ray
    chunks, ``pallas_block_closest_blockmajor``) must be bit-identical
    to the XLA block path: winner selection is order-invariant, so
    sweeping slab-major instead of plan-order never shifts a bit.
    Small chunk/slab sizes exercise the multi-chunk x multi-slab grid
    and the (I, J) gate."""
    import jax.numpy as jnp

    from raytracinginonesemester_tpu.ops.accel import (block_closest,
                                                       block_occluded,
                                                       build_block_grid)
    from raytracinginonesemester_tpu.ops.pallas_kernels import (
        pallas_block_closest_blockmajor, pallas_block_occluded_blockmajor)

    rs = np.random.RandomState(11)
    t = 4096
    tris = jnp.asarray(rs.uniform(-1, 1, (t, 3, 3)).astype(np.float32))
    grid = build_block_grid(tris, jnp.asarray(t), block_size=128)
    r = 4096  # > chunk_tiles * RAY_TILE so I > 1
    # coherent-ish origins so the chunk gate has structure to skip
    o = jnp.asarray((np.tile([0.0, -3.0, 0.0], (r, 1))
                     + 0.1 * rs.uniform(-1, 1, (r, 3))).astype(np.float32))
    d = rs.uniform(-1, 1, (r, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    ref = block_closest(o, d, grid, tmin=1e-4, det_eps=1e-8)
    bm = pallas_block_closest_blockmajor(
        o, d, grid, tmin=1e-4, det_eps=1e-8, interpret=True,
        chunk_tiles=4, slab_blocks=8)
    assert int(np.sum(np.asarray(ref.hit))) > 0
    np.testing.assert_array_equal(np.asarray(ref.tri_idx),
                                  np.asarray(bm.tri_idx))
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(ref.t)[hit],
                                  np.asarray(bm.t)[hit])
    np.testing.assert_array_equal(np.asarray(ref.u)[hit],
                                  np.asarray(bm.u)[hit])
    np.testing.assert_array_equal(np.asarray(ref.v)[hit],
                                  np.asarray(bm.v)[hit])

    tmax = jnp.full(r, 2.5)
    occ_ref = block_occluded(o, d, grid, tmin=1e-4, tmax=tmax, det_eps=1e-8)
    occ_bm = pallas_block_occluded_blockmajor(
        o, d, grid, tmin=1e-4, tmax=tmax, det_eps=1e-8, interpret=True,
        chunk_tiles=4, slab_blocks=8)
    np.testing.assert_array_equal(np.asarray(occ_ref), np.asarray(occ_bm))


def test_quarter_gating_closest_occluded_bit_identical(monkeypatch):
    """RT_QUARTER gating in the standalone closest/occluded kernels
    must not shift a bit: quarters combine through the same
    lexicographic (t, id) take rule (closest) / order-independent
    max-accumulation (occluded).  conftest pins RT_BLOCK_SIZE=128
    (nq == 1 there), so this test rebuilds at 512-lane blocks."""
    import numpy as np

    import raytracinginonesemester_tpu.ops.pallas_kernels as pk
    from raytracinginonesemester_tpu.io.obj import load_obj
    from raytracinginonesemester_tpu.ops.accel import build_block_grid

    mesh, _ = load_obj("tests/assets/meshes/frog.obj")
    tris = mesh.positions[mesh.indices.reshape(-1, 3)].astype(np.float32)
    pad = (-len(tris)) % 512
    tris_p = np.concatenate(
        [tris, np.broadcast_to(tris[0, 0], (pad, 3, 3))]).astype(np.float32)
    norms = np.broadcast_to(
        np.array([0, 0, 1], np.float32), tris_p.shape).copy()
    grid = build_block_grid(
        jnp.asarray(tris_p), jnp.asarray(len(tris)),
        normals=jnp.asarray(norms), block_size=512)
    # gating defaults OFF for these kernels (RT_PK_QUARTER, measured
    # slower on the grad bench); force it on for the equivalence check
    monkeypatch.setattr(pk, "_PK_QUARTER_LANES", 128)
    pk.pallas_block_closest.clear_cache()
    pk.pallas_block_occluded.clear_cache()
    assert pk.pk_quarters_for(grid.tri_index.shape[1]) > 1

    rs = np.random.RandomState(3)
    R = 2048
    o = jnp.asarray(np.tile(np.array([0.0, -0.5, 0.2], np.float32),
                            (R, 1)))
    # half the rays at triangles, half scattered (misses exercised)
    at = tris[rs.randint(0, len(tris), R // 2)].mean(1) - np.asarray(o)[:R // 2]
    away = rs.standard_normal((R - R // 2, 3)).astype(np.float32)
    d0 = np.concatenate([at, away])
    d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    d = jnp.asarray(d0.astype(np.float32))
    lights = jnp.asarray(np.array([[-3.0, 0.0, 1.0]], np.float32))

    def render_all():
        h, n, vis = pk.pallas_block_closest(
            o, d, grid, tmin=1e-4, det_eps=1e-8, interpret=True,
            shadow_lights=lights)
        occ = pk.pallas_block_occluded(
            o, d, grid, tmin=1e-4, tmax=10.0, det_eps=1e-8,
            interpret=True)
        return h, n, vis, occ

    h1, n1, v1, occ1 = render_all()
    monkeypatch.setattr(pk, "_PK_QUARTER_LANES", 0)
    pk.pallas_block_closest.clear_cache()
    pk.pallas_block_occluded.clear_cache()
    h0, n0, v0, occ0 = render_all()
    pk.pallas_block_closest.clear_cache()
    pk.pallas_block_occluded.clear_cache()
    for a, b in ((h1.t, h0.t), (h1.u, h0.u), (h1.v, h0.v),
                 (h1.tri_idx, h0.tri_idx), (n1, n0), (v1, v0),
                 (occ1, occ0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert 0 < int(jnp.sum(h1.hit)) < R  # both hits and misses seen
