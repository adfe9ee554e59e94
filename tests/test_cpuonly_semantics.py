"""CPUOnly-dialect semantics that the GPU oracle can't cover.

The CPUOnly reference renderer can't be built offline (its CMake fetches
Polyscope), so its *distinct* behaviors — sky-gradient miss shading
(``CPUOnly/include/raytracer.h:226-229``) and disk-sampled soft shadows
(``raytracer.h:121-168``) — are verified against hand-computed
expectations here.
"""

import dataclasses
import json

import numpy as np
import pytest

import jax.numpy as jnp

from raytracinginonesemester_tpu.render.renderer import render_scene
from raytracinginonesemester_tpu.scene.build import build_scene
from raytracinginonesemester_tpu.scene.config import load_scene_config

from conftest import REPO


def _write_scene(tmp_path, name, payload):
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    return str(p)


def _plane_scene(tmp_path, light, extra_nodes=(), spp=1, bounces=1,
                 width=48, height=32):
    payload = {
        "settings": {"max_bounces": bounces, "samples_per_pixel": spp,
                      "diffuse_bounce": False},
        "camera": {
            "focal_length_mm": 24.0, "sensor_width_mm": 36.0,
            "pixel_width": width, "pixel_height": height,
            "position": [0.0, -2.5, 1.2], "look_at": [0.0, 0.0, 0.3],
            "up": [0.0, 0.0, 1.0],
        },
        "light": light,
        "scene": [
            {
                "name": "ground", "type": "mesh",
                "path": str(REPO / "tests/assets/meshes/plane_5x5.obj"),
                "material": {"albedo": [0.6, 0.55, 0.5], "kd": 1, "ks": 0,
                              "shininess": 1, "kr": 0},
            },
            *extra_nodes,
        ],
    }
    return _write_scene(tmp_path, "scene.json", payload)


def test_sky_gradient_miss(tmp_path):
    """cpuonly dialect: miss pixels must equal the sky gradient computed
    from the primary ray direction (raytracer.h:226-229)."""
    path = _plane_scene(
        tmp_path, {"position": [0, 0, 5], "color": [1, 1, 1], "intensity": 1.0}
    )
    scene = build_scene(load_scene_config(path), scene_path=path)
    assert scene.dialect == "cpuonly" and scene.background_kind == "sky"
    img = np.asarray(render_scene(scene, jitter_mode="center", spp_override=1))

    # top rows look above the ground plane -> pure sky
    cam = scene.camera
    ii, jj = np.meshgrid(np.arange(48) + 0.5, np.arange(32) + 0.5)
    _, dirs = cam.get_rays(jnp.asarray(ii), jnp.asarray(jj))
    dirs = np.asarray(dirs)
    t = 0.5 * (dirs[..., 2] + 1.0)
    sky = (1 - t)[..., None] * np.ones(3) + t[..., None] * np.array([0.5, 0.7, 1.0])
    top = slice(0, 8)
    np.testing.assert_allclose(img[top], sky[top], atol=1e-5)


def _shadow_scene(tmp_path, radius, samples):
    blocker = {
        "name": "blocker", "type": "mesh",
        "path": str(REPO / "tests/assets/meshes/cube.obj"),
        "transform": {"position": [0.0, 0.0, 1.2], "scale": [0.5, 0.5, 0.05]},
        "material": {"albedo": [0.2, 0.2, 0.2], "kd": 1, "ks": 0, "kr": 0},
    }
    return _plane_scene(
        tmp_path,
        {"position": [0.0, 0.0, 3.0], "color": [1, 1, 1], "intensity": 3.0,
         "radius": radius, "shadow_samples": samples},
        extra_nodes=[blocker],
    )


def test_soft_shadow_penumbra(tmp_path):
    """Area light (radius > 0): the shadow has a penumbra — visibility
    values strictly between umbra and lit; a point light (radius 0) has
    only binary visibility."""
    hard = build_scene(
        load_scene_config(_shadow_scene(tmp_path, 0.0, 1)),
        scene_path=str(tmp_path / "scene.json"),
    )
    img_hard = np.asarray(render_scene(hard, jitter_mode="center", spp_override=1))

    soft = build_scene(
        load_scene_config(_shadow_scene(tmp_path, 0.8, 16)),
        scene_path=str(tmp_path / "scene.json"),
    )
    img_soft = np.asarray(render_scene(soft, jitter_mode="center", spp_override=1))

    # ground-plane pixels (bottom 2/3 of frame)
    gh = img_hard[12:]
    gs = img_soft[12:]
    # hard shadows: (near-)bimodal red channel — count distinct mid levels
    def mid_fraction(img):
        r = img[..., 0]
        lit = r.max()
        shadowed = r.min()
        mid = (r > shadowed + 0.15 * (lit - shadowed)) & (
            r < lit - 0.15 * (lit - shadowed)
        )
        return mid.mean()

    assert mid_fraction(gs) > mid_fraction(gh) + 0.02
    # energy ordering: soft shadow never darker than umbra, never brighter
    # than fully lit
    assert gs[..., 0].min() >= gh[..., 0].min() - 1e-4
    assert gs[..., 0].max() <= gh[..., 0].max() + 1e-4


def test_shadow_samples_deterministic(tmp_path):
    """Same scene, same seeds -> identical soft-shadow image."""
    path = _shadow_scene(tmp_path, 0.5, 8)
    scene = build_scene(load_scene_config(path), scene_path=path)
    a = np.asarray(render_scene(scene, jitter_mode="center", spp_override=1))
    b = np.asarray(render_scene(scene, jitter_mode="center", spp_override=1))
    np.testing.assert_array_equal(a, b)


def test_scalar_scale_parsing(tmp_path):
    """CPUOnly accepts scalar transform.scale (scene_loader.cpp:39-46)."""
    payload = {
        "settings": {"samples_per_pixel": 1},
        "scene": [{
            "name": "s", "type": "mesh",
            "path": str(REPO / "tests/assets/meshes/cube.obj"),
            "transform": {"scale": 2.0},
        }],
    }
    path = _write_scene(tmp_path, "sc.json", payload)
    config = load_scene_config(path)
    np.testing.assert_array_equal(config.nodes[0].transform.scale, [2, 2, 2])
