"""Golden-image tests: the HW1 pipeline vs the reference C++ renderer.

Goldens in ``tests/goldens/hw1_{sphere,frog}.png`` were produced by
building the reference ``HW1`` renderer (g++ -O2, unmodified sources) and
running it on the reference meshes.  Note the checked-in
``HW1/sphere_output.png`` does NOT match what the current HW1 code
produces (stale artifact), so freshly-rendered oracle outputs are the
goldens.  Scene parameters mirror ``HW1/src/render.cpp:42-60``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from raytracinginonesemester_tpu.core.camera import Camera
from raytracinginonesemester_tpu.io.image import quantize, read_png
from raytracinginonesemester_tpu.io.obj import load_obj, mesh_to_triangles
from raytracinginonesemester_tpu.render.renderer import render_hw1
from raytracinginonesemester_tpu.scene.build import geometry_from_mesh

from conftest import REPO, assert_images_close


def _render(mesh_path: str) -> np.ndarray:
    mesh, _ = load_obj(mesh_path)
    verts, normals = mesh_to_triangles(mesh)
    geom = geometry_from_mesh(verts, normals)
    cam = Camera.create(
        position=(0.0, -1.0, 1.0),
        look_at=(0.0, 0.15, 0.0),
        up=(0.0, 0.0, 1.0),
        focal_length_mm=255.0,
        sensor_height_mm=24.0,
        width=320,
        height=180,
    )
    img = render_hw1(
        geom.vertices,
        geom.normals,
        cam,
        jnp.asarray([-3.0, 0.0, 1.0]),
        jnp.asarray([1.0, 0.0, 1.0]),
        320,
        180,
        spp=1,
    )
    return quantize(np.asarray(img), "hw1")


def test_hw1_sphere_golden(sphere_mesh_path):
    ours = _render(sphere_mesh_path)
    golden = read_png(str(REPO / "tests/goldens/hw1_sphere.png"))
    assert_images_close(ours, golden, context="hw1 sphere")


@pytest.mark.slow
def test_hw1_frog_golden(frog_mesh_path):
    ours = _render(frog_mesh_path)
    golden = read_png(str(REPO / "tests/goldens/hw1_frog.png"))
    assert_images_close(ours, golden, context="hw1 frog")
