"""Bit-exactness of the device RNG against the reference C++.

Expected values were produced by compiling the exact routines from
``GPUandCPU/include/query.h:32-48`` / ``antialias.h:30-37`` with g++ and
printing their outputs (see docstrings); the mt19937 stream values match
``std::mt19937`` seeded identically.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from raytracinginonesemester_tpu.core import rng as rnglib


def test_wang_hash_float_bit_exact():
    # printf("%.9e", wang_hash_float(seed)) for these seeds:
    seeds = np.array([0, 1, 42, 123456789, 0xDEADBEEF], dtype=np.uint32)
    expected = np.array(
        [7.525830865e-01, 1.545741856e-01, 3.405693173e-01,
         6.925978661e-01, 3.405530453e-01],
        dtype=np.float32,
    )
    got = np.asarray(rnglib.wang_hash_float(jnp.asarray(seeds)))
    np.testing.assert_array_equal(got, expected)


def test_rng_next_stream_bit_exact():
    # rng_next chain from state 42 (C++ oracle output).
    expected_vals = np.array(
        [6.702406406e-01, 2.198389471e-01, 7.468290925e-01,
         4.856483638e-01, 7.729647160e-01, 8.566825390e-01],
        dtype=np.float32,
    )
    expected_states = np.array(
        [1083814273, 378494188, 2479403867, 955863294, 1613448261],
        dtype=np.uint32,
    )
    state = jnp.asarray(np.uint32(42))
    vals = []
    states = []
    for _ in range(6):
        state, v = rnglib.rng_next(state)
        vals.append(np.asarray(v))
        states.append(np.asarray(state))
    np.testing.assert_array_equal(np.array(vals, np.float32), expected_vals)
    np.testing.assert_array_equal(np.array(states[:5], np.uint32), expected_states)


def test_make_rng_seed_bit_exact():
    assert int(rnglib.make_rng_seed(3, 7, 11)) == 865854867
    assert int(rnglib.make_rng_seed(1919, 1079, 127)) == 1538605251


def test_jittered_samples_matches_mt19937():
    # std::mt19937(42) + uniform_real_distribution<float> yields
    # draw * 2^-32; first four draws via libstdc++ (verified by g++ run).
    offs = rnglib.jittered_samples(2, seed=42, centered=False)
    expected = np.array(
        [[0.37454012, 0.796543], [0.95071429, 0.18343478]], dtype=np.float32
    )
    np.testing.assert_allclose(offs, expected, rtol=0, atol=1e-7)
    centered = rnglib.jittered_samples(2, seed=42, centered=True)
    np.testing.assert_allclose(centered, expected - 0.5, rtol=0, atol=1e-7)


def test_random_unit_vector_properties():
    state = jnp.arange(4096, dtype=jnp.uint32)
    new_state, v = rnglib.random_unit_vector(state)
    v = np.asarray(v)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # roughly uniform: mean near 0
    assert np.abs(v.mean(axis=0)).max() < 0.05
    # states advanced by a multiple of 3 LCG steps per lane
    assert not np.array_equal(np.asarray(new_state), np.asarray(state))


def test_random_on_hemisphere_sides():
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (512, 3))
    _, v = rnglib.random_on_hemisphere(n, jnp.arange(512, dtype=jnp.uint32))
    assert float(np.asarray(v)[:, 2].min()) >= 0.0


def test_random_in_unit_disk():
    _, d = rnglib.random_in_unit_disk(jnp.arange(512, dtype=jnp.uint32))
    r2 = np.asarray(d[:, 0] ** 2 + d[:, 1] ** 2)
    assert r2.max() <= 1.0
    assert r2.min() > 0.0


def test_pixel_jitter_matches_kernel_sequence():
    """pixel_jitter must reproduce renderBatchCUDA's jitter recipe
    (query.cu:36-43): jx = wang(h)-0.5; h = LCG(h); jy = wang(h)-0.5."""
    x, y, s = 7, 13, 3
    pixel_seed = np.uint32(np.uint32(7) * np.uint32(73856093) ^ np.uint32(13) * np.uint32(19349663))
    h = np.uint32(pixel_seed ^ np.uint32(3) * np.uint32(83492791))
    jx_expected = np.float32(np.asarray(rnglib.wang_hash_float(jnp.asarray(h)))) - np.float32(0.5)
    with np.errstate(over="ignore"):
        h2 = np.uint32(h * np.uint32(1664525) + np.uint32(1013904223))
    jy_expected = np.float32(np.asarray(rnglib.wang_hash_float(jnp.asarray(h2)))) - np.float32(0.5)
    jx, jy = rnglib.pixel_jitter(jnp.asarray(x), jnp.asarray(y), jnp.asarray(s))
    assert float(jx) == pytest.approx(float(jx_expected), abs=0)
    assert float(jy) == pytest.approx(float(jy_expected), abs=0)
