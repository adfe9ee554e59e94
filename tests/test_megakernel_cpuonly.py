"""CPUOnly-dialect megakernel vs the staged integrator.

The fused Pallas path now covers the CPUOnly dialect (recursive
``TraceRay`` semantics, ``raytracer.h``: sky-gradient misses, soft
disk-sampled shadows, FLT_EPSILON intersection eps, RT_EPS 1e-4, the
(kd+kr)-weighted throughput rules, no per-sample clamp).  Every test
renders the same scene through the megakernel (use_pallas=True,
interpret on CPU) and the staged XLA path (use_pallas=False) — RNG
streams are bit-compatible so the images must agree except for
float-associativity noise on a vanishing fraction of pixels.
"""

import dataclasses
import os

import numpy as np

from raytracinginonesemester_tpu.render.renderer import render_scene
from raytracinginonesemester_tpu.scene.build import build_scene
from raytracinginonesemester_tpu.scene.config import SceneConfig, SceneNodeConfig
from raytracinginonesemester_tpu.scene.transform import Transform

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpuonly_scene(width=64, height=32, spp=1, max_bounces=3,
                   diffuse_bounce=False, radius=0.0, shadow_samples=1,
                   kr_ball=0.0):
    config = SceneConfig(
        max_bounces=max_bounces,
        spp=spp,
        diffuse_bounce=diffuse_bounce,
        camera_position=(0.0, -0.25, 0.18),
        camera_look_at=(0.0, 0.1, 0.0),
        camera_up=(0.0, 0.0, 1.0),
        focal_length_mm=35.0,
        sensor_height_mm=24.0,
        sensor_width_mm=None,
        pixel_width=width,
        pixel_height=height,
        background=("sky", None),
        lights=[
            dict(position=(-2.0, -1.0, 1.5), color=(1.0, 1.0, 1.0),
                 intensity=5.0, radius=radius,
                 shadow_samples=shadow_samples),
        ],
        nodes=[
            SceneNodeConfig(
                name="frog",
                type="mesh",
                path=os.path.join(REPO, "tests/assets/meshes/frog.obj"),
                transform=Transform(),
                material=dict(albedo=(0.7, 0.3, 0.2), kd=0.9, ks=0.4,
                              specular_color=(0.1, 0.1, 0.1),
                              shininess=16.0, kr=0.0),
            ),
            SceneNodeConfig(
                name="ball",
                type="mesh",
                path=os.path.join(REPO, "tests/assets/meshes/sphere.obj"),
                transform=Transform(position=(0.05, 0.05, 0.02),
                                    scale=(0.04, 0.04, 0.04)),
                material=dict(albedo=(0.2, 0.6, 0.4), kd=0.8, ks=0.3,
                              specular_color=(0.4, 0.4, 0.4),
                              shininess=8.0, kr=kr_ball),
            ),
        ],
        dialect="cpuonly",
    )
    return build_scene(config)


def _compare(scene, jitter="auto", frac=2e-3, atol=2e-3):
    from raytracinginonesemester_tpu.ops.megakernel import megakernel_eligible
    from raytracinginonesemester_tpu.render.renderer import resolve_jitter_mode

    fused = dataclasses.replace(scene, use_pallas=True)
    staged = dataclasses.replace(scene, use_pallas=False)
    mode = resolve_jitter_mode(scene, jitter, scene.spp)
    assert megakernel_eligible(fused, mode)
    img_f = np.asarray(render_scene(fused, jitter_mode=jitter))
    img_s = np.asarray(render_scene(staged, jitter_mode=jitter))
    assert np.isfinite(img_f).all()
    bad = np.abs(img_f - img_s) > atol
    assert bad.mean() < frac, f"{bad.mean():.4%} pixels diverge"
    assert img_f.std() > 0.02  # scene content actually rendered
    return img_f


def test_cpuonly_point_light_center_jitter():
    """spp==1 cpuonly resolves to deterministic pixel centers
    (render.cpp:127-128); hard point-light shadows."""
    _compare(_cpuonly_scene(spp=1))


def test_cpuonly_sky_background():
    """Misses shade with the sky gradient, not a constant; the fused
    no-work (all-sky) tile branch must produce the same gradient."""
    scene = _cpuonly_scene(width=96, height=48, spp=1)
    img = _compare(scene)
    # top rows of this framing are sky: blue-ish gradient, not constant
    sky = img[0, :, :]
    assert sky[:, 2].mean() > sky[:, 0].mean()


def test_cpuonly_soft_shadows_area_light():
    """radius>0 area light: shadow_samples disk-sampled occlusion walks
    per hit, rng streams matching core.rng.random_in_unit_disk."""
    scene = _cpuonly_scene(width=48, height=24, spp=2, radius=0.15,
                           shadow_samples=4)
    _compare(scene, jitter="wang")


def test_cpuonly_diffuse_bounces():
    """RR diffuse split with the CPUOnly (kd+kr)*2*N.L throughput."""
    scene = _cpuonly_scene(width=48, height=24, spp=1, diffuse_bounce=True,
                           max_bounces=3)
    _compare(scene)


def test_cpuonly_mirror_kr_gate():
    """CPUOnly mirrors only when kr > 0 (raytracer.h:249); kr scales by
    kr (diffuse off)."""
    scene = _cpuonly_scene(width=48, height=24, spp=1, kr_ball=0.7,
                           max_bounces=4)
    scene = dataclasses.replace(scene, terminal_only=False)
    _compare(scene)


def test_cpuonly_unclamped_radiance():
    """No per-sample clamp in this dialect: intensity-5 highlights may
    exceed 1.0 in the linear image on both paths."""
    scene = _cpuonly_scene(width=48, height=24, spp=1)
    fused = dataclasses.replace(scene, use_pallas=True)
    img = np.asarray(render_scene(fused))
    assert img.max() > 1.0
