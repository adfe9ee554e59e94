"""Fused detached oracle (``ops.diff_oracle``) vs standalone kernels.

The oracle mode replaces the detached-diff path's standalone
closest/occlusion launches with fused bounce kernels that RETURN the
detached residuals.  The DISCRETE residuals (winner ids, visibility,
decisions) match the standalone kernels exactly — winner selection is
order-invariant — and the gradient-carrying recompute is the same
code.  The float primal t/u/v differ in the LAST ULP between the two
kernel programs (XLA contraction is per-compiled-program, even in
interpret mode; docs/DESIGN.md round 3), so losses/gradients are
compared at tight tolerances and the winner ids exactly.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytracinginonesemester_tpu as rt
import raytracinginonesemester_tpu.ops.integrator as integrator
from raytracinginonesemester_tpu.core.camera import Camera
from raytracinginonesemester_tpu.diff.inverse import (
    apply_params, extract_params, render_loss)


def _diff_scene(w=96, h=64, bounces=2):
    scene = rt.load_scene(os.path.join(
        os.path.dirname(__file__), "assets/scenes/gpu_spheres.json"),
        accel="blocks")
    cam = Camera.create(
        position=(0.0, -2.5, 1.2), look_at=(0.0, 0.0, 0.5), up=(0, 0, 1),
        focal_length_mm=24.0, width=w, height=h,
    )
    return dataclasses.replace(
        scene, camera=cam, differentiable=True, max_bounces=bounces,
        spp=1, use_pallas=True)


def _vg(scene, params, target):
    return jax.value_and_grad(
        lambda p: render_loss(p, scene, target, jitter_mode="center",
                              spp_override=1))(params)


@pytest.mark.parametrize("bounces", [1, 2, 3])
def test_oracle_gradients_match_detached(monkeypatch, bounces):
    scene = _diff_scene(bounces=bounces)
    params = extract_params(
        scene, keys=("albedo", "light_intensity", "vertices"))
    rs = np.random.RandomState(0)
    params = {
        k: jnp.asarray(np.asarray(v) * (1.0 + 0.05 * rs.standard_normal(
            np.asarray(v).shape).astype(np.float32)))
        for k, v in params.items()
    }
    target = rt.render_scene(scene, jitter_mode="center", spp_override=1)

    monkeypatch.setattr(integrator, "_DIFF_ORACLE", False)
    jax.clear_caches()
    loss0, g0 = _vg(scene, params, target)
    monkeypatch.setattr(integrator, "_DIFF_ORACLE", True)
    jax.clear_caches()
    loss1, g1 = _vg(scene, params, target)

    assert np.isfinite(float(loss0))
    np.testing.assert_allclose(np.asarray(loss0), np.asarray(loss1),
                               rtol=2e-3, atol=1e-7)
    for k in params:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        assert np.abs(a).max() > 0, f"grad {k} is identically zero"
        # the two kernel programs differ in the last ulp of primal t
        # (per-program contraction), which can toggle the lit/facing
        # gate on a handful of silhouette pixels — a discrete boundary
        # set, not a systematic bias (the oracle-vs-BRUTE test below
        # pins correctness at rtol 2e-5).  Tolerance sized for a few
        # per-pixel toggles in the MSE gradient.
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, rtol=0, atol=5e-2 * scale,
                                   err_msg=f"grad {k}")


def test_oracle_forward_image_matches(monkeypatch):
    """Primal render through the differentiable path: oracle vs
    standalone detached kernels — within last-ulp accumulation (the
    two kernel programs contract differently; winners are exact)."""
    scene = _diff_scene(bounces=2)
    monkeypatch.setattr(integrator, "_DIFF_ORACLE", False)
    jax.clear_caches()
    a = np.asarray(rt.render_scene(scene, jitter_mode="center",
                                   spp_override=1))
    monkeypatch.setattr(integrator, "_DIFF_ORACLE", True)
    jax.clear_caches()
    b = np.asarray(rt.render_scene(scene, jitter_mode="center",
                                   spp_override=1))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)


def test_oracle_residuals_match_standalone_kernels():
    """The DISCRETE oracle rows equal the standalone kernels' outputs
    exactly: winner ids (order-invariant selection) and per-light
    visibility bits (same facing rule, same any-hit walk)."""
    import jax.numpy as jnp

    from raytracinginonesemester_tpu.core import rng as rnglib
    from raytracinginonesemester_tpu.ops import shading
    from raytracinginonesemester_tpu.ops.diff_oracle import (
        fused_bounce_oracle)
    from raytracinginonesemester_tpu.ops.intersect import make_hit_frame
    from raytracinginonesemester_tpu.ops.pallas_kernels import (
        pallas_block_closest, pallas_block_occluded)

    scene = _diff_scene(bounces=1)
    w, h = int(scene.camera.width), int(scene.camera.height)
    ys, xs = np.mgrid[0:h, 0:w]
    o, d = scene.camera.get_rays(
        jnp.asarray(xs.ravel() + 0.5, jnp.float32),
        jnp.asarray(ys.ravel() + 0.5, jnp.float32))
    seeds = rnglib.make_rng_seed(jnp.asarray(xs.ravel(), jnp.int32),
                                 jnp.asarray(ys.ravel(), jnp.int32), 0)
    orc = fused_bounce_oracle(
        o, d, seeds, scene, 1, interpret=True, det_eps=1e-8, tmin=1e-4,
        shadow_eps=shading.RT_EPS_GPU, shadow_tmin=1e-4)
    hits = pallas_block_closest(o, d, scene.accel, tmin=1e-4,
                                det_eps=1e-8, interpret=True)
    hits = hits[0] if isinstance(hits, tuple) else hits
    np.testing.assert_array_equal(np.asarray(orc["idx"][0]),
                                  np.asarray(hits.tri_idx))
    # t/u/v at last-ulp tolerance (per-program contraction)
    hm = np.asarray(hits.hit)
    np.testing.assert_allclose(np.asarray(orc["t"][0])[hm],
                               np.asarray(hits.t)[hm], rtol=1e-6)

    p, n, _ = make_hit_frame(o, d, hits, scene.geometry.vertices,
                             scene.geometry.normals, mode="gpu")
    n_unit = n / jnp.sqrt(jnp.maximum(
        jnp.sum(n * n, -1, keepdims=True), 1e-24))
    lpos = scene.lights.position[0]
    to = lpos[None] - (p + n_unit * shading.RT_EPS_GPU)
    dist = jnp.sqrt(jnp.maximum(jnp.sum(to * to, -1), 1e-38))
    ldir = to / dist[:, None]
    blocked = pallas_block_occluded(
        p + n_unit * shading.RT_EPS_GPU, ldir, scene.accel, tmin=1e-4,
        tmax=dist, det_eps=1e-8, interpret=True)
    ndotl = jnp.maximum(jnp.sum(n_unit * ldir, -1), 0.0)
    ndotv = jnp.maximum(jnp.sum(n_unit * -d, -1), 0.0)
    facing = hits.hit & (ndotl > 0) & (ndotv > 0)
    vis_chain = np.asarray(facing & ~blocked)
    vis_orc = (np.asarray(orc["vis"][0]) & 1) > 0
    np.testing.assert_array_equal(vis_chain, vis_orc)


def test_oracle_two_lights(monkeypatch):
    """Multi-light visibility bits: gradients with 2 lights match the
    standalone detached mode (each light's bit decoded independently)."""
    scene = rt.load_scene(os.path.join(
        os.path.dirname(__file__), "assets/scenes/gpu_diffuse.json"),
        accel="blocks")
    cam = Camera.create(
        position=(0.0, -2.5, 1.2), look_at=(0.0, 0.0, 0.5), up=(0, 0, 1),
        focal_length_mm=24.0, width=64, height=48,
    )
    scene = dataclasses.replace(
        scene, camera=cam, differentiable=True, max_bounces=2, spp=1,
        use_pallas=True)
    assert int(scene.lights.intensity.shape[0]) == 2
    params = extract_params(scene, keys=("albedo", "light_intensity"))
    target = rt.render_scene(scene, jitter_mode="center", spp_override=1)
    params = {k: v * 1.03 for k, v in params.items()}

    monkeypatch.setattr(integrator, "_DIFF_ORACLE", False)
    jax.clear_caches()
    loss0, g0 = _vg(scene, params, target)
    monkeypatch.setattr(integrator, "_DIFF_ORACLE", True)
    jax.clear_caches()
    loss1, g1 = _vg(scene, params, target)
    np.testing.assert_allclose(np.asarray(loss0), np.asarray(loss1),
                               rtol=2e-3, atol=1e-7)
    for k in params:
        a, b = np.asarray(g0[k]), np.asarray(g1[k])
        assert np.abs(a).max() > 0
        np.testing.assert_allclose(b, a, rtol=0,
                                   atol=5e-2 * np.abs(a).max(),
                                   err_msg=f"grad {k}")


def test_oracle_matches_brute_gradients(monkeypatch):
    """End-to-end: oracle-mode gradients vs the brute-force O(R*T)
    differentiable intersector (the reference estimator) — the same
    contract the detached mode already honors (test_diff)."""
    monkeypatch.setattr(integrator, "_DIFF_ORACLE", True)
    jax.clear_caches()
    scene = _diff_scene(w=48, h=32, bounces=2)
    brute = dataclasses.replace(scene, accel=None, use_pallas=False)
    params = extract_params(scene, keys=("albedo", "light_intensity"))
    target = rt.render_scene(brute, jitter_mode="center", spp_override=1)
    _, g_oracle = _vg(scene, params, target)
    _, g_brute = _vg(brute, params, target)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_oracle[k]), np.asarray(g_brute[k]),
            rtol=2e-5, atol=1e-7, err_msg=f"grad {k}")


def test_oracle_binned_depth0_matches(monkeypatch):
    """Binned depth-0 oracle (camera_candidate_context) vs the plain
    oracle: the plan is a conservative superset and the winner rule is
    order-invariant, so the loss is bit-identical and gradients equal
    in exact (interpret) semantics — including after the vertices MOVE
    within the plan's slack (the on-device refresh_stream regather)."""
    from raytracinginonesemester_tpu.diff.inverse import (
        camera_candidate_context)

    monkeypatch.setattr(integrator, "_DIFF_ORACLE", True)
    scene = _diff_scene(w=96, h=64, bounces=2)
    params = extract_params(
        scene, keys=("albedo", "light_intensity", "vertices"))
    target = rt.render_scene(scene, jitter_mode="center", spp_override=1)
    # move vertices WITHIN the slack after the plan is built
    rs = np.random.RandomState(1)
    moved = dict(params)
    moved["vertices"] = jnp.asarray(
        np.asarray(params["vertices"])
        + 0.01 * rs.standard_normal(params["vertices"].shape)
        .astype(np.float32))

    jax.clear_caches()
    loss0, g0 = _vg(scene, moved, target)
    jax.clear_caches()
    ctx = camera_candidate_context(apply_params(scene, params),
                                   slack=0.05)
    with ctx:
        loss1, g1 = _vg(scene, moved, target)
    assert np.asarray(loss0) == np.asarray(loss1), \
        "binned oracle changed the loss (plan not conservative?)"
    for k in moved:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g0[k]),
                                   rtol=0, atol=0, err_msg=f"grad {k}")
