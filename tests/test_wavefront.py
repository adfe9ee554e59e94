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
