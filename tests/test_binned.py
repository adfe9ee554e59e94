"""Binned candidate-list traversal (``ops.binned``) vs the block walk.

The binned camera plan must be a conservative superset of every
jittered primary ray's reachable triangle set, and the binned emit
kernel must match the block-walk emit kernel exactly in interpret
semantics: same winners ((t, global id) selection is order-invariant
and min reductions are exact), same radiance, same alive masks, and
bit-identical per-ray state for every ALIVE lane.  Dead lanes written
by the tighter candidate-count shortcut carry the canonical dead state
instead of the full path's incidental values — the downstream contract
(sorts key on aliveness, images read radiance rows) never consumes
those rows.
"""
import dataclasses
import os

import numpy as np
import pytest

import raytracinginonesemester_tpu as rt
from raytracinginonesemester_tpu.ops.binned import (
    build_camera_candidate_plan,
    candidate_plan_stats,
)
from raytracinginonesemester_tpu.ops.megakernel import (
    _ST_ROWS,
    RAY_TILE,
    _pad_tiles,
    emit_tiles,
    quarters_for,
)
from raytracinginonesemester_tpu.ops.wavefront import render_tiles_wavefront
from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

from test_megakernel import _two_frog_scene


def _plan_for(scene, w, h, chunk=256):
    xs, ys, _ = _swizzled_grid(w, h)
    xs_p, ys_p, _, _ = _pad_tiles(xs, ys)
    nq = quarters_for(int(scene.accel.tri_index.shape[1]))
    return build_camera_candidate_plan(
        scene.camera, xs_p, ys_p, scene.accel, RAY_TILE, nq=nq,
        chunk=chunk)


def _emit_pair(scene, w, h, chunk, **kw):
    xs, ys, _ = _swizzled_grid(w, h)
    plan = _plan_for(scene, w, h, chunk)
    st0, rng0 = emit_tiles(scene, xs, ys, 0, interpret=True, **kw)
    st1, rng1 = emit_tiles(scene, xs, ys, 0, interpret=True,
                           cand_plan=plan, **kw)
    nt = st0.shape[0] // _ST_ROWS
    sv0 = np.asarray(st0).reshape(nt, _ST_ROWS, RAY_TILE)
    sv1 = np.asarray(st1).reshape(nt, _ST_ROWS, RAY_TILE)
    rv0 = np.asarray(rng0).reshape(nt, 8, RAY_TILE)[:, 0]
    rv1 = np.asarray(rng1).reshape(nt, 8, RAY_TILE)[:, 0]
    return sv0, sv1, rv0, rv1, plan


def _assert_emit_equivalent(sv0, sv1, rv0, rv1):
    # aliveness and radiance match bit for bit everywhere
    np.testing.assert_array_equal(sv0[:, 12], sv1[:, 12])
    for r in (9, 10, 11):
        np.testing.assert_array_equal(sv0[:, r], sv1[:, r])
    # alive lanes carry identical full state + rng
    alive = sv0[:, 12] > 0.0
    for r in range(13):
        np.testing.assert_array_equal(
            np.where(alive, sv0[:, r], 0.0), np.where(alive, sv1[:, r], 0.0))
    np.testing.assert_array_equal(
        np.where(alive, rv0, 0), np.where(alive, rv1, 0))


@pytest.mark.parametrize("chunk", [128, 256])
def test_binned_emit_matches_block_walk(chunk):
    scene = _two_frog_scene(width=128, height=64, diffuse_bounce=True,
                            max_bounces=3)
    scene = dataclasses.replace(scene, terminal_only=False)
    sv0, sv1, rv0, rv1, plan = _emit_pair(scene, 128, 64, chunk)
    stats = candidate_plan_stats(plan, RAY_TILE)
    assert stats["nonempty_tiles"] > 0  # the plan actually engaged
    _assert_emit_equivalent(sv0, sv1, rv0, rv1)


def test_binned_emit_cpuonly_dialect():
    """cpuonly keeps has_work True (sky gradient); the binned walk must
    still produce identical winners through the soft-shadow shade."""
    scene = rt.load_scene(os.path.join(
        os.path.dirname(__file__), "assets/scenes/cpuonly_point.json"))
    scene = dataclasses.replace(scene, terminal_only=False)
    from raytracinginonesemester_tpu.ops.megakernel import megakernel_kwargs

    kw = megakernel_kwargs(scene, "center")
    w, h = int(scene.camera.width), int(scene.camera.height)
    sv0, sv1, rv0, rv1, _ = _emit_pair(scene, w, h, 128, **kw)
    _assert_emit_equivalent(sv0, sv1, rv0, rv1)


def test_binned_wavefront_image_identical():
    """Full wavefront render (emit + sort + resume) with the plan
    threaded through every emit: images bit-identical."""
    scene = _two_frog_scene(width=128, height=64, diffuse_bounce=True,
                            max_bounces=4)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(128, 64)
    plan = _plan_for(scene, 128, 64)
    a = np.asarray(render_tiles_wavefront(scene, xs, ys, 2, interpret=True))
    b = np.asarray(render_tiles_wavefront(scene, xs, ys, 2, interpret=True,
                                          cand_plan=plan))
    np.testing.assert_array_equal(a, b)


def test_binned_staged_frames_image_identical():
    """The production headline shape: staged scheduler + merged frame
    groups with the binned emit."""
    scene = _two_frog_scene(width=128, height=64, diffuse_bounce=True,
                            max_bounces=3)
    scene = dataclasses.replace(scene, terminal_only=False)
    from raytracinginonesemester_tpu.ops.wavefront import (
        render_tiles_wavefront_frames)

    xs, ys, _ = _swizzled_grid(128, 64)
    plan = _plan_for(scene, 128, 64)
    a = np.asarray(render_tiles_wavefront_frames(
        scene, xs, ys, 3, capacity_tiles=8, interpret=True))
    b = np.asarray(render_tiles_wavefront_frames(
        scene, xs, ys, 3, capacity_tiles=8, interpret=True,
        cand_plan=plan))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("terminal", [True, False])
def test_binned_monolithic_render_tiles(terminal):
    """The monolithic megakernel's depth-0 binned walk (terminal V1 and
    full-bounce V2) matches the block walk bit for bit."""
    from raytracinginonesemester_tpu.ops.megakernel import render_tiles

    scene = _two_frog_scene(width=128, height=64,
                            diffuse_bounce=not terminal, max_bounces=3)
    scene = dataclasses.replace(scene, terminal_only=terminal)
    xs, ys, _ = _swizzled_grid(128, 64)
    plan = _plan_for(scene, 128, 64)
    a = np.asarray(render_tiles(scene, xs, ys, 2, interpret=True))
    b = np.asarray(render_tiles(scene, xs, ys, 2, interpret=True,
                                cand_plan=plan))
    np.testing.assert_array_equal(a, b)


def test_binned_with_quarter_gating(monkeypatch):
    """nq > 1: the binned walk's per-candidate home QUARTER rows must
    feed the deferred attr resolve correctly when the triangle-axis
    gate splits 512-lane blocks into 128-lane quarter rows."""
    import jax
    import jax.numpy as jnp

    import raytracinginonesemester_tpu.ops.megakernel as mk
    from raytracinginonesemester_tpu.ops.accel import build_block_grid

    scene = _two_frog_scene(width=64, height=32, diffuse_bounce=True,
                            max_bounces=3)
    scene = dataclasses.replace(scene, terminal_only=False)
    g = scene.geometry
    t = int(g.padded_triangles)
    pad = (-t) % 512
    verts = jnp.concatenate(
        [g.vertices, jnp.broadcast_to(g.vertices[:1], (pad, 3, 3))]) \
        if pad else g.vertices
    norms = jnp.concatenate(
        [g.normals, jnp.zeros((pad, 3, 3))]) if pad else g.normals
    objs = jnp.concatenate(
        [g.obj_id, jnp.zeros(pad, jnp.int32)]) if pad else g.obj_id
    grid512 = build_block_grid(verts, jnp.asarray(g.num_triangles),
                               normals=norms, obj_ids=objs,
                               block_size=512)
    scene = dataclasses.replace(scene, accel=grid512)
    monkeypatch.setattr(mk, "_QUARTER_LANES", 128)
    jax.clear_caches()
    assert mk.quarters_for(512) == 4
    sv0, sv1, rv0, rv1, _ = _emit_pair(scene, 64, 32, 128)
    _assert_emit_equivalent(sv0, sv1, rv0, rv1)


def test_narrow_ladder_width_bit_identical(monkeypatch):
    """RT_LADDER_WIDTH=128: re-tiled staged-ladder bounces produce the
    identical image (flat ray order preserved; per-sample math is
    width-agnostic in exact semantics)."""
    import jax

    import raytracinginonesemester_tpu.ops.wavefront as wf

    scene = _two_frog_scene(width=128, height=64, diffuse_bounce=True,
                            max_bounces=4)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(128, 64)
    a = np.asarray(render_tiles_wavefront(
        scene, xs, ys, 2, interpret=True, capacity_tiles=8))
    monkeypatch.setattr(wf, "_LADDER_WIDTH", 128)
    jax.clear_caches()
    b = np.asarray(render_tiles_wavefront(
        scene, xs, ys, 2, interpret=True, capacity_tiles=8))
    np.testing.assert_array_equal(a, b)


def test_plan_conservative_covers_brute_winners():
    """Every pixel's brute-force closest-hit winner must appear in its
    tile's candidate list (conservativeness — the property the walk's
    correctness rests on)."""
    scene = _two_frog_scene(width=64, height=32, diffuse_bounce=False,
                            max_bounces=1)
    xs, ys, _ = _swizzled_grid(64, 32)
    xs_p, ys_p, _, npad = _pad_tiles(xs, ys)
    plan = _plan_for(scene, 64, 32)
    import jax.numpy as jnp

    from raytracinginonesemester_tpu.ops.intersect import intersect_closest

    px = np.asarray(xs_p, np.float32) + 0.5
    py = np.asarray(ys_p, np.float32) + 0.5
    o, d = scene.camera.get_rays(jnp.asarray(px), jnp.asarray(py))
    hits = intersect_closest(o, d, scene.geometry.vertices, tmin=1e-4)
    win = np.asarray(hits.tri_idx)
    hit = np.asarray(hits.hit)
    # per-tile candidate GLOBAL ids from the stream's id rows
    meta = np.asarray(plan.meta)
    stream = np.asarray(plan.stream).reshape(-1, 16, plan.chunk)
    nt = meta.shape[0]
    for ti in range(nt):
        rays = slice(ti * RAY_TILE, (ti + 1) * RAY_TILE)
        winners = set(win[rays][hit[rays]].tolist())
        if not winners:
            continue
        s, c = meta[ti, 0], meta[ti, 1]
        cand = set(stream[s:s + c, 9].reshape(-1).astype(np.int64).tolist())
        missing = winners - cand
        assert not missing, f"tile {ti} missing winners {missing}"


def test_resolve_candidate_plan_gating(monkeypatch):
    """RT_BINNED=0 disables; tracers and ineligible scenes return None."""
    from raytracinginonesemester_tpu.render.renderer import (
        resolve_candidate_plan)

    scene = _two_frog_scene(width=64, height=32, diffuse_bounce=True,
                            max_bounces=3)
    # use_pallas=True: resolve_wavefront gates on the fused path, which
    # defaults off on the CPU test backend
    scene = dataclasses.replace(scene, terminal_only=False,
                                use_pallas=True)
    monkeypatch.setenv("RT_BINNED", "0")
    assert resolve_candidate_plan(scene, "wang", 1) is None
    monkeypatch.setenv("RT_BINNED", "1")
    monkeypatch.setenv("RT_WAVEFRONT", "1")
    plan = resolve_candidate_plan(scene, "wang", 1)
    assert plan is not None and plan.total_chunks > 0
    # cache hit returns the same object
    assert resolve_candidate_plan(scene, "wang", 1) is plan
