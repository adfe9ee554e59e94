"""OBJ loader and image codec tests."""

import numpy as np
import pytest

from raytracinginonesemester_tpu.io.image import (
    quantize,
    read_ppm_p6,
    write_ppm_p6,
)
from raytracinginonesemester_tpu.io.obj import append_mesh, load_obj, mesh_to_triangles


def test_load_sphere_counts(sphere_mesh_path):
    """Vertex/triangle counts must match the reference loader's output
    (printed by HW1 renderer: 1026 verts / 960 tris for sphere)."""
    mesh, next_id = load_obj(sphere_mesh_path)
    assert mesh.num_triangles == 960
    assert next_id == 1


def test_load_frog_counts(frog_mesh_path):
    """HW1 renderer prints: Vertices 11874, Triangles 19858."""
    mesh, _ = load_obj(frog_mesh_path)
    assert mesh.num_vertices == 11874
    assert mesh.num_triangles == 19858
    assert mesh.has_normals()


def test_quads_triangulated(tmp_path):
    """cube.obj-style quads split fan-wise into 2 triangles
    (MeshOBJ.cpp:252-262)."""
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n"
    )
    mesh, _ = load_obj(str(p))
    assert mesh.num_triangles == 2
    idx = mesh.indices.reshape(-1, 3)
    np.testing.assert_array_equal(idx, [[0, 1, 2], [0, 2, 3]])


def test_negative_indices(tmp_path):
    """Relative indices count back from the current list end
    (GPUandCPU/include/MeshOBJ.h:172-218)."""
    p = tmp_path / "neg.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    mesh, _ = load_obj(str(p))
    assert mesh.num_triangles == 1
    np.testing.assert_allclose(mesh.positions[mesh.indices.reshape(3)],
                               [[0, 0, 0], [1, 0, 0], [0, 1, 0]])


def test_object_group_ids(tmp_path):
    """o/g tags bump object ids per MeshOBJ.h:292-311."""
    p = tmp_path / "objs.obj"
    p.write_text(
        "o first\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "f 1 2 3\n"
        "o second\n"
        "v 0 0 1\nv 1 0 1\nv 0 1 1\n"
        "f 4 5 6\n"
    )
    mesh, next_id = load_obj(str(p), next_object_id=5)
    np.testing.assert_array_equal(mesh.triangle_obj_ids, [5, 6])
    assert next_id == 7


def test_object_id_default_before_first_tag(tmp_path):
    """Faces before the first o/g tag keep the incoming id; a tag after
    faces starts a new object."""
    p = tmp_path / "mix.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
        "o named\nv 0 0 1\nv 1 0 1\nv 0 1 1\nf 4 5 6\n"
    )
    mesh, next_id = load_obj(str(p))
    np.testing.assert_array_equal(mesh.triangle_obj_ids, [0, 1])
    assert next_id == 2


def test_vertex_dedup(tmp_path):
    """Shared (v, vt, vn) references collapse to one vertex
    (MeshOBJ.cpp:105-141)."""
    p = tmp_path / "dedup.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "f 1 2 3\nf 2 4 3\n"
    )
    mesh, _ = load_obj(str(p))
    assert mesh.num_vertices == 4  # not 6


def test_append_mesh_padding(tmp_path):
    a = tmp_path / "a.obj"
    a.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    b = tmp_path / "b.obj"
    b.write_text("v 0 0 1\nv 1 0 1\nv 0 1 1\nvn 0 0 1\nf 1//1 2//1 3//1\n")
    ma, nid = load_obj(str(a), 0)
    mb, nid = load_obj(str(b), nid)
    merged = append_mesh(ma, mb)
    assert merged.num_vertices == 6
    assert merged.num_triangles == 2
    # a had no normals -> zero padded (AppendMesh, MeshOBJ.h:440-452)
    np.testing.assert_array_equal(merged.normals[:3], 0.0)
    np.testing.assert_array_equal(merged.triangle_obj_ids, [0, 1])
    # indices offset correctly
    np.testing.assert_array_equal(merged.indices.reshape(-1, 3)[1], [3, 4, 5])


def test_mesh_to_triangles_zero_normals(tmp_path):
    p = tmp_path / "nonorm.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    mesh, _ = load_obj(str(p))
    verts, normals = mesh_to_triangles(mesh)
    assert verts.shape == (1, 3, 3)
    np.testing.assert_array_equal(normals, 0.0)


# ----------------------------------------------------------------------
# image codecs
# ----------------------------------------------------------------------


def test_quantize_modes():
    img = np.array([[[0.5, 1.2, -0.1]]], np.float32)
    np.testing.assert_array_equal(quantize(img, "cpuonly"), [[[127, 255, 0]]])
    # gpu mode: no lower clamp, uint8 cast of negative saturates via C
    # semantics; we only assert the in-range channels
    g = quantize(np.array([[[0.5, 1.2, 0.0]]], np.float32), "gpu")
    np.testing.assert_array_equal(g, [[[127, 255, 0]]])


@pytest.mark.parametrize("maxval", [255, 65535])
@pytest.mark.parametrize("gamma2", [False, True])
@pytest.mark.parametrize("flip_y", [False, True])
def test_ppm_roundtrip(tmp_path, maxval, gamma2, flip_y):
    """8/16-bit round trip like the reference example
    (ppm_p6_lib/examples/ppm_p6_test.cpp:40-87)."""
    rng = np.random.RandomState(0)
    img = rng.rand(5, 7, 3)
    path = str(tmp_path / "t.ppm")
    write_ppm_p6(path, img, maxval=maxval, clamp=True, gamma2=gamma2, flip_y=flip_y)
    back, got_maxval = read_ppm_p6(path)
    assert got_maxval == maxval
    expect = np.sqrt(img) if gamma2 else img
    if flip_y:
        back = back[::-1]
    tol = 1.0 / maxval
    np.testing.assert_allclose(back, expect, atol=tol * 0.51)


def test_ppm_header_comments(tmp_path):
    path = tmp_path / "c.ppm"
    body = bytes([10, 20, 30])
    path.write_bytes(b"P6 # comment\n# another\n1 1\n# more\n255\n" + body)
    img, maxval = read_ppm_p6(str(path))
    assert maxval == 255
    np.testing.assert_allclose(img[0, 0], np.array([10, 20, 30]) / 255.0)


def test_fast_loader_matches_python(sphere_mesh_path, frog_mesh_path, tmp_path):
    """The native (C/ctypes) loader must be byte-equivalent to the Python
    reference implementation on every construct."""
    from raytracinginonesemester_tpu.io.fast_obj import load_obj_fast, native_available

    if not native_available():
        pytest.skip("no C compiler available")

    quad = tmp_path / "q.obj"
    quad.write_text(
        "o first\nv 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nvn 0 0 1\n"
        "f 1//1 2//1 3//1 4//1\n"
        "g second\nv 0 0 1\nv 1 0 1\nv 0 1 1\nf -3 -2 -1\n"
    )
    for path in (sphere_mesh_path, frog_mesh_path, str(quad)):
        a, na = load_obj(path, 2)
        b, nb = load_obj_fast(path, 2)
        assert na == nb, path
        np.testing.assert_array_equal(a.positions, b.positions, err_msg=path)
        np.testing.assert_array_equal(a.indices, b.indices, err_msg=path)
        np.testing.assert_array_equal(a.triangle_obj_ids, b.triangle_obj_ids, err_msg=path)
        if a.normals is not None:
            np.testing.assert_array_equal(a.normals, b.normals, err_msg=path)


def test_native_png_writer_roundtrip(tmp_path):
    """The native C PNG writer (io.fast_image, the stb_image_write
    analog) must decode byte-identical to the Pillow encoder."""
    import numpy as np
    from raytracinginonesemester_tpu.io.fast_image import (
        native_available, write_png_native)
    from raytracinginonesemester_tpu.io.image import read_png, write_png

    assert native_available(), "C compiler expected in this environment"
    rs = np.random.RandomState(0)
    for shape in ((7, 5, 3), (180, 320, 3), (64, 64, 3)):
        data = rs.randint(0, 256, shape, dtype=np.uint8)
        p_native = str(tmp_path / "n.png")
        p_pil = str(tmp_path / "p.png")
        assert write_png_native(p_native, data)
        from PIL import Image

        Image.fromarray(data, mode="RGB").save(p_pil)
        np.testing.assert_array_equal(read_png(p_native), data)
        np.testing.assert_array_equal(read_png(p_native), read_png(p_pil))
    # the public write_png routes through the native writer and must
    # stay decode-identical for float input too
    img = rs.uniform(0, 1.2, (33, 47, 3)).astype(np.float32)
    p = str(tmp_path / "f.png")
    write_png(p, img, mode="gpu")
    from raytracinginonesemester_tpu.io.image import quantize

    np.testing.assert_array_equal(read_png(p), quantize(img, "gpu"))
