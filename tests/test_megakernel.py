"""Megakernel (fused render) equivalence vs the wavefront integrator.

The fused path must produce the same image as the staged XLA-block path
for eligible scenes — the analog of testing ``renderBatchCUDA`` against
the reference's CPU fallback loop (``query.cu:130-166``).
"""

import dataclasses
import os

import numpy as np
import pytest

import jax.numpy as jnp

from raytracinginonesemester_tpu.render.renderer import render_scene
from raytracinginonesemester_tpu.scene.build import build_scene
from raytracinginonesemester_tpu.scene.config import SceneConfig, SceneNodeConfig
from raytracinginonesemester_tpu.scene.transform import Transform

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _two_frog_scene(width=64, height=32, spp=1, **settings):
    config = SceneConfig(
        max_bounces=settings.pop("max_bounces", 4),
        spp=spp,
        diffuse_bounce=settings.pop("diffuse_bounce", False),
        camera_position=(0.0, -0.2, 0.2),
        camera_look_at=(0.0, 0.1, 0.0),
        camera_up=(0.0, 0.0, 1.0),
        focal_length_mm=45.0,
        sensor_height_mm=24.0,
        sensor_width_mm=None,
        pixel_width=width,
        pixel_height=height,
        background=("miss", (0.25, 0.45, 0.9)),
        lights=[
            dict(position=(-3.0, 0.0, 1.0), color=(1.0, 1.0, 0.0),
                 intensity=5.0, radius=0.0, shadow_samples=1),
            dict(position=(2.0, -1.0, 2.0), color=(0.2, 0.6, 1.0),
                 intensity=2.0, radius=0.0, shadow_samples=1),
        ],
        nodes=[
            SceneNodeConfig(
                name="frog",
                type="mesh",
                path=os.path.join(REPO, "tests/assets/meshes/frog.obj"),
                transform=Transform(),
                material=dict(albedo=(0.8, 0.2, 0.2), kd=1.0, ks=0.5,
                              specular_color=(0.04, 0.04, 0.04),
                              shininess=32.0, kr=0.0),
            ),
            SceneNodeConfig(
                name="ball",
                type="mesh",
                path=os.path.join(REPO, "tests/assets/meshes/sphere.obj"),
                transform=Transform(position=(0.05, 0.05, 0.02),
                                    scale=(0.04, 0.04, 0.04)),
                material=dict(albedo=(0.2, 0.7, 0.3), kd=0.8, ks=0.2,
                              specular_color=(0.5, 0.5, 0.5),
                              shininess=8.0, kr=0.0),
            ),
        ],
        dialect="gpu",
        **settings,
    )
    return build_scene(config)


def test_megakernel_matches_wavefront():
    from raytracinginonesemester_tpu.ops.megakernel import megakernel_eligible

    scene = _two_frog_scene()
    assert scene.terminal_only
    fused = dataclasses.replace(scene, use_pallas=True)
    staged = dataclasses.replace(scene, use_pallas=False)
    assert megakernel_eligible(fused, "wang")

    img_f = np.asarray(render_scene(fused, jitter_mode="wang"))
    img_s = np.asarray(render_scene(staged, jitter_mode="wang"))
    np.testing.assert_allclose(img_f, img_s, atol=2e-3)
    # shadows and both materials must actually appear in the test frame
    assert img_f.std() > 0.05


def test_megakernel_spp_accumulation_and_offset():
    scene = _two_frog_scene(width=48, height=16, spp=2)
    fused = dataclasses.replace(scene, use_pallas=True)
    staged = dataclasses.replace(scene, use_pallas=False)
    img_f = np.asarray(render_scene(fused, jitter_mode="wang", sample_offset=3))
    img_s = np.asarray(render_scene(staged, jitter_mode="wang", sample_offset=3))
    np.testing.assert_allclose(img_f, img_s, atol=2e-3)


def test_megakernel_ineligible_falls_back():
    from raytracinginonesemester_tpu.ops.megakernel import megakernel_eligible

    # oracle-parity jitter keeps the staged path
    assert not megakernel_eligible(_two_frog_scene(), "reference_cpu")


def test_megakernel_diffuse_bounces_match_wavefront():
    """V2: the in-kernel RR diffuse bounce loop must reproduce the
    staged integrator image — bit-compatible RNG means every lane takes
    the same branch with the same hemisphere samples."""
    from raytracinginonesemester_tpu.ops.megakernel import megakernel_eligible

    scene = _two_frog_scene(width=64, height=32, diffuse_bounce=True,
                            max_bounces=3)
    fused = dataclasses.replace(scene, use_pallas=True)
    staged = dataclasses.replace(scene, use_pallas=False)
    assert megakernel_eligible(fused, "wang")
    img_f = np.asarray(render_scene(fused, jitter_mode="wang"))
    img_s = np.asarray(render_scene(staged, jitter_mode="wang"))
    bad = np.abs(img_f - img_s) > 2e-3
    assert bad.mean() < 2e-3, f"{bad.mean():.4%} pixels diverge"


def test_megakernel_mirror_bounces_match_wavefront():
    """V2 mirror branch (kr > 0, diffuse off): deterministic bounce
    chains must match the staged integrator."""
    scene = _two_frog_scene(width=64, height=32)
    # make the sphere a mirror
    mats = scene.materials
    kr = mats.kr.at[1].set(0.8)
    mirror = dataclasses.replace(
        scene, materials=dataclasses.replace(mats, kr=kr),
        terminal_only=False, max_bounces=4,
    )
    fused = dataclasses.replace(mirror, use_pallas=True)
    staged = dataclasses.replace(mirror, use_pallas=False)
    img_f = np.asarray(render_scene(fused, jitter_mode="wang"))
    img_s = np.asarray(render_scene(staged, jitter_mode="wang"))
    bad = np.abs(img_f - img_s) > 2e-3
    assert bad.mean() < 2e-3, f"{bad.mean():.4%} pixels diverge"


def test_qsel_bf16_split_reconstructs_attributes_bitexact():
    """The MXU winner-attribute selection matrix (``_build_qsel``)
    stores each f32 attribute as three bf16 parts (hi/mid/lo); the
    production TPU path (mm_attrs mode 1) reconstructs the attribute as
    the f32 sum (hi + mid) + lo after the one-hot bf16 matmul.  That
    reconstruction must be BIT-EXACT for every real triangle attribute
    in the grid — the invariant the on-TPU bf16 dot relies on
    (scripts/probe_mm_select.py measured it for |q| in
    [1e-32, 3.38e38]); this asserts it off-TPU for the actual scene
    data, covering the mode-1 split that interpret-mode tests (which
    compile mode 2, f32 dot) never exercise."""
    from raytracinginonesemester_tpu.ops.megakernel import (_QSEL_F,
                                                            _build_qsel)

    scene = _two_frog_scene(width=16, height=16)
    grid = scene.accel
    qsel = np.asarray(_build_qsel(grid))  # (L*B, 128) bf16 -> f32 by np
    l, b = grid.tri_index.shape
    feats = np.concatenate([
        np.asarray(grid.tri),
        np.asarray(grid.norm),
        np.asarray(grid.obj)[None].astype(np.float32),
    ]).reshape(_QSEL_F, l * b).T  # (L*B, 22)
    valid = (np.asarray(grid.tri_index) >= 0).reshape(l * b)

    hi = qsel[:, 0:_QSEL_F].astype(np.float32)
    mid = qsel[:, 32:32 + _QSEL_F].astype(np.float32)
    lo = qsel[:, 64:64 + _QSEL_F].astype(np.float32)
    recon = (hi + mid) + lo  # the kernel's exact summation order
    np.testing.assert_array_equal(recon[valid], feats[valid])
    # padding triangles are zeroed so they contribute nothing to dots
    assert not np.any(qsel[~valid])


def test_monolithic_chunked_visits_bit_identical():
    """The MK_CHUNK sublane-gated dense visits of the monolithic kernel
    (now sharing the deferred winner-attribute resolve with the
    unchunked path) must be bit-identical to full-tile visits."""
    from raytracinginonesemester_tpu.ops.megakernel import render_tiles
    from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

    scene = _two_frog_scene(width=64, height=32, diffuse_bounce=True,
                            max_bounces=3)
    scene = dataclasses.replace(scene, terminal_only=False)
    xs, ys, _ = _swizzled_grid(64, 32)
    a = np.asarray(render_tiles(scene, xs, ys, 1, interpret=True, chunk=0))
    b = np.asarray(render_tiles(scene, xs, ys, 1, interpret=True, chunk=64))
    np.testing.assert_array_equal(a, b)


def _many_object_scene(n_objects=36, width=48, height=24, **settings):
    """A scene with more objects than MAX_OBJECTS: a grid of small
    spheres with per-object materials (varied albedo/ks/shininess, a
    few emissive, a few mirrors) — drives the one-hot MXU material
    selection (``mats_mm_mode`` != 0)."""
    nodes = []
    for o in range(n_objects):
        gx, gy = o % 6, o // 6
        mirror = o % 7 == 3
        nodes.append(SceneNodeConfig(
            name=f"ball{o}",
            type="mesh",
            path=os.path.join(REPO, "tests/assets/meshes/sphere.obj"),
            transform=Transform(
                position=(-0.12 + 0.05 * gx, 0.0 + 0.02 * gy,
                          -0.05 + 0.05 * gy),
                scale=(0.02, 0.02, 0.02)),
            material=dict(
                albedo=(0.2 + 0.02 * (o % 8), 0.7 - 0.01 * o,
                        0.3 + 0.015 * (o % 5)),
                kd=0.0 if mirror else (0.6 + 0.01 * (o % 4)),
                ks=0.1 + 0.02 * (o % 3),
                specular_color=(0.5, 0.4 + 0.01 * (o % 6), 0.5),
                shininess=float(4 << (o % 4)),
                kr=0.9 if mirror else 0.0,
                emission=((0.0, 0.4, 0.1) if o % 11 == 5
                          else (0.0, 0.0, 0.0)),
            ),
        ))
    config = SceneConfig(
        max_bounces=settings.pop("max_bounces", 3),
        spp=settings.pop("spp", 1),
        diffuse_bounce=settings.pop("diffuse_bounce", True),
        camera_position=(0.0, -0.35, 0.1),
        camera_look_at=(0.0, 0.05, 0.0),
        camera_up=(0.0, 0.0, 1.0),
        focal_length_mm=45.0,
        sensor_height_mm=24.0,
        sensor_width_mm=None,
        pixel_width=width,
        pixel_height=height,
        background=("miss", (0.25, 0.45, 0.9)),
        lights=[
            dict(position=(-3.0, -1.0, 2.0), color=(1.0, 1.0, 0.8),
                 intensity=5.0, radius=0.0, shadow_samples=1),
            dict(position=(2.0, -2.0, 1.0), color=(0.3, 0.5, 1.0),
                 intensity=2.0, radius=0.0, shadow_samples=1),
        ],
        nodes=nodes,
        dialect="gpu",
        **settings,
    )
    return build_scene(config)


def test_megakernel_many_objects_matches_wavefront():
    """Scenes beyond MAX_OBJECTS stay on the fused path: per-lane
    material selection switches from the unrolled masked loops to the
    one-hot matmul over the mats table (``_mat_lanes_mm``) and must
    reproduce the staged integrator image."""
    from raytracinginonesemester_tpu.ops.megakernel import (
        MAX_OBJECTS, mats_mm_mode, megakernel_eligible)

    scene = _many_object_scene()
    n_obj = int(scene.materials.kd.shape[0])
    assert n_obj > MAX_OBJECTS
    assert mats_mm_mode(n_obj, interpret=True) == 2
    assert mats_mm_mode(n_obj, interpret=False) == 1
    fused = dataclasses.replace(scene, use_pallas=True)
    staged = dataclasses.replace(scene, use_pallas=False)
    assert megakernel_eligible(fused, "wang")

    img_f = np.asarray(render_scene(fused, jitter_mode="wang"))
    img_s = np.asarray(render_scene(staged, jitter_mode="wang"))
    bad = np.abs(img_f - img_s) > 2e-3
    assert bad.mean() < 2e-3, f"{bad.mean():.4%} pixels diverge"
    # several distinct materials must actually be visible
    assert img_f.std() > 0.05


def test_mats_qsel_bf16_split_reconstructs_bitexact():
    """``_build_mats_qsel`` stores each f32 material feature as three
    bf16 parts; the kernel reconstructs hi + mid + lo after the one-hot
    dot.  The reconstruction must be bit-exact for every object row
    (mode 1's on-TPU invariant, asserted off-TPU on real scene data)."""
    from raytracinginonesemester_tpu.ops.megakernel import (
        _MM_OBJ_F, _build_mats_qsel)

    scene = _many_object_scene(width=16, height=16)
    mats = scene.materials
    n = int(mats.kd.shape[0])
    mats_rows = np.concatenate([
        np.asarray(mats.albedo), np.asarray(mats.kd)[:, None],
        np.asarray(mats.specular_color), np.asarray(mats.ks)[:, None],
        np.asarray(mats.shininess)[:, None], np.asarray(mats.kr)[:, None],
        np.asarray(mats.emission), np.zeros((n, 3), np.float32),
    ], axis=1)
    q = np.asarray(_build_mats_qsel(jnp.asarray(mats_rows)))
    hi = q[:n, 0:_MM_OBJ_F].astype(np.float32)
    mid = q[:n, 32:32 + _MM_OBJ_F].astype(np.float32)
    lo = q[:n, 64:64 + _MM_OBJ_F].astype(np.float32)
    recon = hi + mid + lo  # the kernel's exact summation order
    np.testing.assert_array_equal(recon, mats_rows[:, :_MM_OBJ_F])
    # padding rows must be zero so out-of-range one-hots select nothing
    assert not np.any(q[n:])


def test_quarter_gating_bit_identical(monkeypatch):
    """Triangle-axis quarter gating (RT_QUARTER) must not shift a bit:
    quarters combine through the same lexicographic (t, id) take rule
    and min is an exact reduction, so the winner — and the image — is
    identical to the ungated dense visit."""
    import raytracinginonesemester_tpu.ops.megakernel as mk
    from raytracinginonesemester_tpu.ops.accel import build_block_grid
    from raytracinginonesemester_tpu.render.renderer import _swizzled_grid

    scene = _two_frog_scene(width=64, height=32, diffuse_bounce=True,
                            max_bounces=3)
    # conftest pins RT_BLOCK_SIZE=128 (gating disabled there); rebuild
    # the grid at the production 512-lane blocks so the gate compiles
    geom = scene.geometry
    grid = build_block_grid(
        geom.vertices, jnp.asarray(geom.num_triangles),
        normals=geom.normals, obj_ids=geom.obj_id, block_size=512)
    scene = dataclasses.replace(scene, terminal_only=False, accel=grid)
    xs, ys, _ = _swizzled_grid(64, 32)
    # gating defaults OFF since round 4 (RT_QUARTER, measured slower on
    # the driver bench); force it on for the equivalence check
    monkeypatch.setattr(mk, "_QUARTER_LANES", 128)
    mk.render_tiles.clear_cache()
    assert mk.quarters_for(scene.accel.tri_index.shape[1]) > 1
    a = np.asarray(mk.render_tiles(scene, xs, ys, 1, interpret=True))
    monkeypatch.setattr(mk, "_QUARTER_LANES", 0)
    mk.render_tiles.clear_cache()  # nq is read inside the traced fn
    b = np.asarray(mk.render_tiles(scene, xs, ys, 1, interpret=True))
    mk.render_tiles.clear_cache()
    np.testing.assert_array_equal(a, b)


def test_block_layouts_bit_identical():
    """Morton-run and LBVH-treelet block layouts must render the SAME
    image bit for bit: the winner selection ties break on (t, global
    triangle id), which is partition-invariant, and per-pair math never
    depends on lane placement."""
    import os

    from raytracinginonesemester_tpu.ops.accel import (
        build_block_grid, build_block_grid_treelet)

    scene = _two_frog_scene(width=64, height=32, diffuse_bounce=True,
                            max_bounces=3)
    scene = dataclasses.replace(scene, terminal_only=False)
    geom = scene.geometry
    runs = build_block_grid(
        geom.vertices, jnp.asarray(geom.num_triangles),
        normals=geom.normals, obj_ids=geom.obj_id, block_size=512)
    tree = build_block_grid_treelet(
        geom.vertices, geom.num_triangles,
        normals=geom.normals, obj_ids=geom.obj_id, block_size=512)
    assert tree.num_blocks >= runs.num_blocks
    # every real triangle appears exactly once in each layout
    ids_r = np.sort(np.asarray(runs.tri_index).ravel())
    ids_t = np.sort(np.asarray(tree.tri_index).ravel())
    np.testing.assert_array_equal(ids_r[ids_r >= 0], ids_t[ids_t >= 0])

    img_r = np.asarray(render_scene(
        dataclasses.replace(scene, accel=runs), jitter_mode="wang"))
    img_t = np.asarray(render_scene(
        dataclasses.replace(scene, accel=tree), jitter_mode="wang"))
    np.testing.assert_array_equal(img_r, img_t)
