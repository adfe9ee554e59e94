"""Visualization + CLI tests."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from raytracinginonesemester_tpu.ops.accel import build_block_grid
from raytracinginonesemester_tpu.ops.lbvh import build_lbvh
from raytracinginonesemester_tpu.viz.bvh_export import (
    export_aabbs_to_obj,
    export_block_grid_to_obj,
    export_lbvh_to_obj,
)
from raytracinginonesemester_tpu.viz.view_bvh import load_wireframe_obj

from conftest import REPO


def _random_tris(n, seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(
        (rs.uniform(-4, 4, (n, 1, 3)) + rs.uniform(-0.4, 0.4, (n, 3, 3)))
        .astype(np.float32)
    )


def test_export_aabbs_roundtrip(tmp_path):
    """8 verts + 12 lines per box (visualizer.h:40-75); inverted boxes
    skipped."""
    amin = np.array([[0, 0, 0], [5, 5, 5], [2, 2, 2]], np.float32)
    amax = np.array([[1, 1, 1], [4, 4, 4], [3, 3, 3]], np.float32)  # box 1 inverted
    path = str(tmp_path / "boxes.obj")
    n = export_aabbs_to_obj(path, amin, amax)
    assert n == 2
    verts, lines = load_wireframe_obj(path)
    assert verts.shape == (16, 3)
    assert lines.shape == (24, 2)
    # box corners span exactly min..max
    assert verts[:8].min(axis=0).tolist() == [0, 0, 0]
    assert verts[:8].max(axis=0).tolist() == [1, 1, 1]


def test_export_lbvh(tmp_path):
    tris = _random_tris(64)
    bvh = build_lbvh(tris)
    path = str(tmp_path / "bvh.obj")
    n = export_lbvh_to_obj(path, bvh)
    assert n == 2 * 64 - 1  # every node has a valid AABB after refit


def test_export_block_grid(tmp_path):
    tris = _random_tris(256)
    grid = build_block_grid(tris, jnp.asarray(256), block_size=128)
    path = str(tmp_path / "blocks.obj")
    n = export_block_grid_to_obj(path, grid)
    assert n == 2


def test_cli_scene_render(tmp_path):
    from raytracinginonesemester_tpu.render.cli import main

    out = str(tmp_path / "out.png")
    rc = main([
        str(REPO / "tests/assets/scenes/gpu_diffuse.json"),
        "-o", out, "--spp", "1", "--width", "64", "--height", "36",
    ])
    assert rc == 0 and os.path.exists(out)
    from raytracinginonesemester_tpu.io.image import read_png

    img = read_png(out)
    assert img.shape == (36, 64, 3)


def test_cli_obj_render(tmp_path):
    from raytracinginonesemester_tpu.render.cli import main

    out = str(tmp_path / "obj.png")
    rc = main([
        str(REPO / "tests/assets/meshes/plane_5x5.obj"),
        "-o", out, "--width", "32", "--height", "18",
    ])
    assert rc == 0 and os.path.exists(out)


def test_stage_preview(tmp_path):
    from raytracinginonesemester_tpu.scene.config import load_scene_config
    from raytracinginonesemester_tpu.viz.stage_preview import stage_preview

    scene_path = str(REPO / "tests/assets/scenes/gpu_spheres.json")
    config = load_scene_config(scene_path)
    out = str(tmp_path / "stage.png")
    stage_preview(config, scene_path=scene_path, out_png=out, grid_step=32)
    assert os.path.getsize(out) > 10000


def test_show_headless_fallback(tmp_path):
    """viz.show(): the interactive window analog of viz::show
    (HW1/include/visualization.h:31) must fall back to the
    stage-preview PNG on a headless machine."""
    from raytracinginonesemester_tpu.scene.config import load_scene_config
    from raytracinginonesemester_tpu.viz.show import show

    scene_path = str(REPO / "tests/assets/scenes/gpu_spheres.json")
    config = load_scene_config(scene_path)
    out = str(tmp_path / "stage_show.png")
    res = show(config, scene_path=scene_path, out_png=out, headless=True)
    assert res == out and os.path.getsize(out) > 10000


def test_cli_progressive_render(tmp_path):
    """--progressive chunked render matches the one-shot CLI render
    byte-for-byte (chunk=1 replays the kernel accumulation order) and
    persists a resumable state file."""
    from raytracinginonesemester_tpu.render.cli import main

    scene = str(REPO / "tests/assets/scenes/gpu_diffuse.json")
    one = str(tmp_path / "one.png")
    rc = main([scene, "-o", one, "--spp", "2", "--width", "48",
               "--height", "32"])
    assert rc == 0
    prog = str(tmp_path / "prog.png")
    state = str(tmp_path / "state")
    rc = main([scene, "-o", prog, "--spp", "2", "--width", "48",
               "--height", "32", "--progressive", "1",
               "--state-dir", state])
    assert rc == 0
    with open(one, "rb") as a, open(prog, "rb") as b:
        assert a.read() == b.read()
    assert os.path.exists(os.path.join(state, "render_state.npz"))
