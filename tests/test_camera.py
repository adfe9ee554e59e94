"""Camera tests, re-expressing the reference's Catch2 suite in pytest.

Mirrors ``HW1/tests/test_camera.cpp:10-79`` (and the CPUOnly variant with
an explicit sensor width, ``CPUOnly/tests/test_camera.cpp``): invalid
dimensions raise; a 1x1 camera's pixel sits on the optical axis at focal
distance; the pixel grid lies in a plane perpendicular to the view
direction, in front of the camera.
"""

import numpy as np
import pytest

from raytracinginonesemester_tpu.core.camera import Camera


def test_invalid_dimensions_raise():
    with pytest.raises(ValueError):
        Camera.create(width=0, height=100)
    with pytest.raises(ValueError):
        Camera.create(width=100, height=0)


def test_single_pixel_on_optical_axis():
    """test_camera.cpp:29-51: with a 1x1 image the sole pixel center must
    lie exactly on the optical axis, focal_length in front of the camera."""
    pos = np.array([1.0, 2.0, 3.0])
    look = np.array([4.0, 5.0, 9.0])
    cam = Camera.create(
        position=pos, look_at=look, up=(0, 0, 1),
        focal_length_mm=50.0, sensor_height_mm=24.0, width=1, height=1,
    )
    pixel = np.asarray(cam.pixel_position(0, 0))
    fwd = (look - pos) / np.linalg.norm(look - pos)
    expected = pos + 0.05 * fwd
    np.testing.assert_allclose(pixel, expected, atol=1e-6)


def test_pixel_grid_planar_and_in_front():
    """test_camera.cpp:54-79: all pixel positions are coplanar, the plane
    normal is the view direction, and the plane sits in front."""
    pos = np.array([0.5, -1.0, 2.0])
    look = np.array([3.0, 4.0, 0.0])
    cam = Camera.create(
        position=pos, look_at=look, up=(0, 0, 1),
        focal_length_mm=35.0, sensor_height_mm=24.0, width=16, height=9,
    )
    ii, jj = np.meshgrid(np.arange(16), np.arange(9))
    pts = np.asarray(cam.pixel_position(ii.ravel(), jj.ravel()))
    fwd = (look - pos) / np.linalg.norm(look - pos)
    d = pts @ fwd  # signed distance along view dir
    np.testing.assert_allclose(d, d[0], atol=1e-5)  # coplanar wrt fwd
    assert np.all((pts - pos) @ fwd > 0)  # in front


def test_sensor_width_override_matches_aspect_derivation():
    """CPUOnly's explicit sensor_width equals HW1's aspect-derived width
    when width_mm = height_mm * W/H (camera.h:79 vs CPUOnly camera.h:91)."""
    kw = dict(position=(0, 0, 0), look_at=(0, 1, 0), up=(0, 0, 1),
              focal_length_mm=50.0, sensor_height_mm=24.0, width=320, height=180)
    cam_a = Camera.create(**kw)
    cam_b = Camera.create(sensor_width_mm=24.0 * 320 / 180, **kw)
    np.testing.assert_allclose(
        np.asarray(cam_a.pixel_delta_u), np.asarray(cam_b.pixel_delta_u), atol=1e-7
    )


def test_get_rays_normalized():
    cam = Camera.create(width=8, height=4)
    o, d = cam.image_rays()
    assert o.shape == (4, 8, 3) and d.shape == (4, 8, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-6)


def test_degenerate_up_vector_fallback():
    """unit_vector fallback (HW1/include/camera.h:48-53): parallel up and
    forward must not produce NaNs."""
    cam = Camera.create(position=(0, 0, 0), look_at=(0, 0, 5), up=(0, 0, 1),
                        width=4, height=4)
    _, d = cam.image_rays()
    assert np.isfinite(np.asarray(d)).all()
