"""Wavefront (emit / sort-compact / resume) vs monolithic megakernel.

The wavefront path (``ops.wavefront``) must produce bit-identical
images to ``megakernel.render_tiles``: all per-ray math is the same
code, state rides verbatim through the compaction sorts, and radiance
accumulates in the same order.  This is an instance of the framework's
ordering-invariance contract (images never depend on ray placement).
"""
import dataclasses
import os

import numpy as np
import pytest

from raytracinginonesemester_tpu.ops.megakernel import (
    _ST_ROWS,
    RAY_TILE,
    _pad_tiles,
    emit_tiles,
    render_tiles,
)
from raytracinginonesemester_tpu.ops.wavefront import render_tiles_wavefront
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

from test_megakernel import _two_frog_scene


@pytest.mark.parametrize(
    "diffuse,depth,spp",
    [(True, 3, 1), (False, 4, 1), (True, 2, 2)],
)
def test_wavefront_bit_identical(diffuse, depth, spp):
    scene = _two_frog_scene(width=64, height=32, diffuse_bounce=diffuse,
                            max_bounces=depth)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(64, 32)
    a = np.asarray(render_tiles(scene, xs, ys, spp, interpret=True))
    b = np.asarray(
        render_tiles_wavefront(scene, xs, ys, spp, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_wavefront_sky_tiles_bit_identical():
    """Frames with all-sky tiles: their dead rays flow through the sort
    into the alive/dead boundary tile of the resume kernel.  Regression
    for the zero-direction poisoning that NaN'd the boundary tile (the
    monolithic kernel can never produce a zero ray direction; the emit
    kernel's no-work branch must not either)."""
    scene = _two_frog_scene(width=128, height=64, diffuse_bounce=True,
                            max_bounces=3)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(128, 64)
    a = np.asarray(render_tiles(scene, xs, ys, 1, interpret=True))
    b = np.asarray(
        render_tiles_wavefront(scene, xs, ys, 1, interpret=True))
    assert np.isfinite(b).all()
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize(
    "diffuse,depth,spp,cap",
    [(True, 3, 1, 4), (False, 4, 1, 4), (True, 2, 2, 8),
     (True, 4, 1, 2)],  # cap=2 is intentionally tight (overflow cond)
)
def test_staged_wavefront_bit_identical(diffuse, depth, spp, cap):
    """The STAGED scheduler (per-bounce plan + kernel + re-sort at a
    static alive-wavefront capacity) must also be bit-identical: per-ray
    math is the same bounce builder, plans are conservative (closest-hit
    ties break on (t, id) so visit sets don't matter), and sorts only
    permute.  Includes a too-small capacity, which must take the
    in-graph overflow fallback rather than drop rays."""
    scene = _two_frog_scene(width=128, height=64, diffuse_bounce=diffuse,
                            max_bounces=depth)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(128, 64)
    a = np.asarray(render_tiles(scene, xs, ys, spp, interpret=True))
    b = np.asarray(render_tiles_wavefront(
        scene, xs, ys, spp, interpret=True, capacity_tiles=cap))
    np.testing.assert_array_equal(a, b)


def test_bounce_tile_plan_conservative():
    """Every block a tile's alive rays can hit must appear in the plan
    with an entry that lower-bounds the true hit t: brute-force compare
    per-ray slab hits against the tile-hull plan."""
    import jax.numpy as jnp
    from raytracinginonesemester_tpu.ops.accel import SUPER, super_aabbs
    from raytracinginonesemester_tpu.ops.megakernel import emit_tiles
    from raytracinginonesemester_tpu.ops.wavefront import bounce_tile_plan

    scene = _two_frog_scene(width=128, height=64, diffuse_bounce=True,
                            max_bounces=4)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(128, 64)
    xs_p, ys_p, _, np_rays = _pad_tiles(xs, ys)
    st, _ = emit_tiles(scene, xs_p, ys_p, 0, interpret=True)
    nt = np_rays // RAY_TILE
    order, entry = bounce_tile_plan(st, scene.accel)
    order, entry = np.asarray(order), np.asarray(entry)

    stv = np.asarray(st).reshape(nt, _ST_ROWS, RAY_TILE)
    saabb = np.asarray(super_aabbs(scene.accel))
    ls = saabb.shape[1]
    alive = stv[:, 12] > 0
    for ti in range(nt):
        if not alive[ti].any():
            continue
        o = stv[ti, 0:3][:, alive[ti]]  # (3, A)
        d = stv[ti, 3:6][:, alive[ti]]
        planned = {int(order[ti, k]): float(entry[ti, k])
                   for k in range(ls) if np.isfinite(entry[ti, k])}
        for s in range(ls):
            if saabb[0, s] > saabb[3, s]:
                continue  # padded empty superblock
            with np.errstate(divide="ignore", invalid="ignore"):
                t1 = (saabb[0:3, s][:, None] - o) / d
                t2 = (saabb[3:6, s][:, None] - o) / d
            near = np.nanmax(np.minimum(t1, t2), axis=0)
            far = np.nanmin(np.maximum(t1, t2), axis=0)
            hits = (near <= far) & (far >= 0.0)
            if not hits.any():
                continue
            assert s in planned, f"tile {ti}: superblock {s} missing"
            true_entry = np.maximum(near[hits], 0.0).min()
            assert planned[s] <= true_entry + 1e-5, (
                f"tile {ti} super {s}: plan entry {planned[s]} > "
                f"true {true_entry}")


def test_emit_state_rows_always_written():
    """Every state row must be defined for every tile (sky tiles
    included): dead rays carry a unit direction and the miss radiance."""
    scene = _two_frog_scene(width=128, height=64, diffuse_bounce=True,
                            max_bounces=3)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(128, 64)
    xs_p, ys_p, _, np_rays = _pad_tiles(xs, ys)
    st, rng = emit_tiles(scene, xs_p, ys_p, 0, interpret=True)
    nt = np_rays // RAY_TILE
    stv = np.asarray(st).reshape(nt, _ST_ROWS, RAY_TILE)
    assert np.isfinite(stv).all()
    # directions are unit-length everywhere, dead lanes included
    d = stv[:, 3:6]
    norms = np.sqrt((d * d).sum(axis=1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


@pytest.mark.parametrize(
    "diffuse,radius,samples,spp",
    [(True, 0.0, 1, 1), (False, 0.15, 4, 1), (True, 0.15, 2, 2)],
)
def test_wavefront_cpuonly_matches_monolithic(diffuse, radius, samples, spp):
    """CPUOnly dialect through the wavefront scheduler: emit/sort/resume
    reproduce the monolithic cpuonly megakernel's RNG streams and
    branches lane for lane — but NOT always the exact bits: the sky
    lerp ((1-t) + t*c) is an FMA-contraction site, and the compiler
    contracts it differently in the two programs (~1 ulp on the few %
    of rays whose paths saw sky after a bounce; the gpu dialect's
    constant miss color has no such site, hence its exact test above).
    Within EITHER backend, images stay bit-identical across shardings
    (same program -> same contraction), so the framework invariant is
    per-backend and intact.  Assert: almost all rays exactly equal,
    every ray within a few ulps."""
    from test_megakernel_cpuonly import _cpuonly_scene

    from raytracinginonesemester_tpu.ops.megakernel import (
        megakernel_kwargs,
        render_tiles,
    )

    scene = _cpuonly_scene(width=64, height=32, spp=spp, max_bounces=3,
                           diffuse_bounce=diffuse, radius=radius,
                           shadow_samples=samples,
                           kr_ball=0.0 if diffuse else 0.6)
    scene = dataclasses.replace(scene, terminal_only=False)
    kw = megakernel_kwargs(scene, "wang")
    kw["interpret"] = True
    xs, ys, _ = _swizzled_grid(64, 32)
    a = np.asarray(render_tiles(scene, xs, ys, spp, **kw))
    b = np.asarray(render_tiles_wavefront(scene, xs, ys, spp, **kw))
    assert np.isfinite(b).all()
    exact = np.all(a == b, axis=1)
    assert exact.mean() > 0.98, f"only {exact.mean():.4%} rays exact"
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_wavefront_spp_scan_branch_bit_identical():
    """spp>4 routes through the lax.scan pipeline (one traced
    emit/sort/resume per sample instead of spp copies); the fold must
    accumulate in the same order as the monolithic kernel's in-kernel
    sample loop.  No other test exercises the scan branch."""
    scene = _two_frog_scene(width=48, height=16, diffuse_bounce=True,
                            max_bounces=2)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(48, 16)
    a = np.asarray(render_tiles(scene, xs, ys, 5, interpret=True))
    b = np.asarray(
        render_tiles_wavefront(scene, xs, ys, 5, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_capacity_calibration_gated_on_eligibility():
    """The default-dispatch auto calibration must not run (and populate
    its cache) for scenes that cannot take the wavefront fast path —
    e.g. use_pallas=False, where the calibration emit would be pure
    wasted work (review finding, round 2)."""
    from raytracinginonesemester_tpu.ops import wavefront as wf
    from raytracinginonesemester_tpu.render.renderer import render_scene

    scene = _two_frog_scene(width=32, height=32, diffuse_bounce=True,
                            max_bounces=2)
    scene = dataclasses.replace(scene, terminal_only=False,
                                use_pallas=False)
    saved = dict(wf._CAP_CACHE)
    wf._CAP_CACHE.clear()
    try:
        render_scene(scene)
        assert wf._CAP_CACHE == {}, (
            "calibration ran for a non-pallas scene")
    finally:
        wf._CAP_CACHE.update(saved)


def test_auto_capacity_none_without_accel():
    """Accel-less (brute-force differentiable) scenes cannot stage."""
    from raytracinginonesemester_tpu.ops.wavefront import auto_capacity_tiles

    scene = _two_frog_scene(width=32, height=32, diffuse_bounce=True,
                            max_bounces=2)
    scene = dataclasses.replace(scene, accel=None)
    assert auto_capacity_tiles(scene) is None


def test_planned_traversal_matches_flat():
    """Scenes above MK_FLAT_MAX_BLOCKS keep the planned front-to-back
    walk; it must stay bit-identical to the default flat scan (ties
    break on (t, id), so visit order cannot matter).  Forced via the
    import-time env mirrors since the test scenes are all below the
    threshold; the jit caches must be cleared around the flip — the
    traversal order is a trace-time choice outside the cache key."""
    import jax

    from raytracinginonesemester_tpu.ops import megakernel as mk

    scene = _two_frog_scene(width=64, height=32, diffuse_bounce=True,
                            max_bounces=3)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(64, 32)
    flat = np.asarray(
        render_tiles_wavefront(scene, xs, ys, 1, interpret=True,
                               capacity_tiles=8))
    old = mk._EMIT_FLAT_ENV, mk._STAGED_FLAT_ENV
    try:
        mk._EMIT_FLAT_ENV, mk._STAGED_FLAT_ENV = "0", "0"
        jax.clear_caches()
        planned = np.asarray(
            render_tiles_wavefront(scene, xs, ys, 1, interpret=True,
                                   capacity_tiles=8))
    finally:
        mk._EMIT_FLAT_ENV, mk._STAGED_FLAT_ENV = old
        jax.clear_caches()
    np.testing.assert_array_equal(flat, planned)


@pytest.mark.parametrize("chunk", [64, 256])
def test_staged_chunked_bounce_bit_identical(chunk):
    """Sublane-chunked dense visits in the staged bounce kernels
    (``RT_STAGED_CHUNK`` / ``staged_chunk``) must be bit-identical to
    full-tile visits: a skipped chunk had no slab-passing lane, so the
    block provably cannot improve any of its rays' (t, id) winners, and
    the per-ray reductions inside a visit are row-independent.  Winner
    attributes resolve through the same deferred pass either way."""
    scene = _two_frog_scene(width=128, height=64, diffuse_bounce=True,
                            max_bounces=4)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(128, 64)
    a = np.asarray(render_tiles_wavefront(
        scene, xs, ys, 1, interpret=True, capacity_tiles=4,
        staged_chunk=0))
    b = np.asarray(render_tiles_wavefront(
        scene, xs, ys, 1, interpret=True, capacity_tiles=4,
        staged_chunk=chunk))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize(
    "spp,group,cap",
    [(4, 2, 4), (4, 4, 4), (2, 2, 2),  # cap=2 forces the in-group
                                        # overflow fallback
     (6, 4, 4)],  # group 4 does not divide 6 -> reduced to 2
)
def test_merged_sample_groups_bit_identical(spp, group, cap):
    """The MERGED sample-group scheduler (``_render_group``: all G
    samples' alive subsets through ONE compaction sort + staged ladder)
    must be bit-identical to the per-sample staged path: pixel keys are
    offset per sample so the final unsort separates samples exactly,
    dead lanes pass through kernels verbatim, and accumulation stays in
    sample order per pixel.  Includes a too-tight capacity (the
    overflow fallback now runs INSIDE the emit scan and parks the
    sample's subset dead through the merged ladder)."""
    scene = _two_frog_scene(width=128, height=64, diffuse_bounce=True,
                            max_bounces=3)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(128, 64)
    a = np.asarray(render_tiles_wavefront(
        scene, xs, ys, spp, interpret=True, capacity_tiles=cap,
        sample_group=1))
    b = np.asarray(render_tiles_wavefront(
        scene, xs, ys, spp, interpret=True, capacity_tiles=cap,
        sample_group=group))
    np.testing.assert_array_equal(a, b)


def test_frames_api_matches_individual_frames():
    """``render_tiles_wavefront_frames`` (F spp-1 frames, one merged
    bounce phase per dispatch) must return each frame bit-identical to
    rendering that sample offset alone through the staged path."""
    from raytracinginonesemester_tpu.ops.wavefront import (
        render_tiles_wavefront_frames)

    scene = _two_frog_scene(width=128, height=64, diffuse_bounce=True,
                            max_bounces=3)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(128, 64)
    batch = np.asarray(render_tiles_wavefront_frames(
        scene, xs, ys, 3, 0, interpret=True, capacity_tiles=4))
    assert batch.shape[0] == 3
    for off in range(3):
        single = np.asarray(render_tiles_wavefront(
            scene, xs, ys, 1, sample_offset=off, interpret=True,
            capacity_tiles=4))
        np.testing.assert_array_equal(batch[off], single)


def test_render_scene_frames_driver_matches_single_frames():
    """``render_scene_frames`` (driver level): each frame of the batched
    dispatch must equal ``render_scene(..., spp_override=1,
    sample_offset=f)`` bit-exactly, on both the merged-wavefront fast
    path and the in-graph scan fallback."""
    import os

    from raytracinginonesemester_tpu.render.renderer import (
        render_scene, render_scene_frames)

    scene = _two_frog_scene(width=64, height=32, diffuse_bounce=True,
                            max_bounces=3)
    scene = dataclasses.replace(scene, terminal_only=False,
                                use_pallas=True)
    old = os.environ.get("RT_WAVEFRONT_CAP")
    os.environ["RT_WAVEFRONT_CAP"] = "4"
    try:
        batch = np.asarray(render_scene_frames(scene, 2))
        for f in range(2):
            single = np.asarray(render_scene(
                scene, spp_override=1, sample_offset=f))
            np.testing.assert_array_equal(batch[f], single)
        # fallback (XLA block path): scan of single frames
        scene2 = dataclasses.replace(scene, use_pallas=False)
        batch2 = np.asarray(render_scene_frames(scene2, 2))
        for f in range(2):
            single = np.asarray(render_scene(
                scene2, spp_override=1, sample_offset=f))
            np.testing.assert_array_equal(batch2[f], single)
    finally:
        if old is None:
            os.environ.pop("RT_WAVEFRONT_CAP", None)
        else:
            os.environ["RT_WAVEFRONT_CAP"] = old
