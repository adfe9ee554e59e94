"""Counter-free stateless RNG, bit-compatible with the reference renderer.

The reference GPU path tracer keeps one ``unsigned int`` RNG state per ray
and advances it with an LCG + xorshift mix (``GPUandCPU/include/query.h:32-48``),
seeds it with a spatial hash of ``(x, y, sample)`` (``query.h:44-48``) and
jitters sub-pixel positions with a Wang hash (``GPUandCPU/include/antialias.h:30-37``).

These functions reproduce those exact uint32 bit patterns, vectorized over
arbitrary array shapes, so a deterministic scene renders the *same image*
here as in the reference CPU build — the strongest possible parity gate.
All state is data (uint32 arrays threaded through ``lax`` loops); nothing is
stateful, which is what makes the scheme reshard-safe: seeding by
``(pixel, sample)`` means resharding the pixel axis never changes the image.

Host-side jitter (``jittered_samples``, ``HW1/include/antialias.h:12-27`` /
``GPUandCPU/include/antialias.h:12-27``) is reproduced via numpy's MT19937,
whose raw 32-bit stream for integer seeds is identical to ``std::mt19937``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

__all__ = [
    "wang_hash_float",
    "rng_next",
    "make_rng_seed",
    "jittered_samples",
    "random_unit_vector",
    "random_on_hemisphere",
    "random_in_unit_disk",
    "make_basis",
    "SAMPLES_PER_BATCH",
]

# Register-batch size of the reference render kernel
# (GPUandCPU/include/antialias.h:39).
SAMPLES_PER_BATCH = 32

_U32 = jnp.uint32
_INV_U32_MAX = np.float32(1.0) / np.float32(0xFFFFFFFF)  # == 2**-32 in f32


def _u32(x) -> Array:
    return jnp.asarray(x).astype(_U32)


def _mix(h: Array) -> Array:
    """Wang-hash style avalanche shared by ``rng_next`` and ``wang_hash_float``."""
    h = (h ^ _u32(61)) ^ (h >> 16)
    h = h * _u32(9)
    h = h ^ (h >> 4)
    h = h * _u32(0x27D4EB2D)
    h = h ^ (h >> 15)
    return h


def wang_hash_float(seed: Array) -> Array:
    """uint32 -> float32 in [0, 1). Bit-exact ``wang_hash_float``
    (``GPUandCPU/include/antialias.h:30-37``)."""
    h = _mix(_u32(seed))
    # float(h) / float(0xFFFFFFFFu): the divisor rounds to 2**32 in f32.
    return h.astype(jnp.float32) * _INV_U32_MAX


def rng_next(state: Array) -> Tuple[Array, Array]:
    """Advance LCG state and return (new_state, float32 in [0,1)).

    Bit-exact ``rng_next`` (``GPUandCPU/include/query.h:32-42``): the state
    update is the numerical-recipes LCG; the output is a Wang-hash mix of the
    *new* state.
    """
    state = _u32(state) * _u32(1664525) + _u32(1013904223)
    h = _mix(state)
    return state, h.astype(jnp.float32) * _INV_U32_MAX


def make_rng_seed(x: Array, y: Array, sample: Array) -> Array:
    """Spatial-hash seed by (pixel_x, pixel_y, sample index).

    Bit-exact ``make_rng_seed`` (``GPUandCPU/include/query.h:44-48``).
    """
    return (
        _u32(x) * _u32(73856093)
        ^ _u32(y) * _u32(19349663)
        ^ _u32(sample) * _u32(83492791)
    )


def pixel_jitter(x: Array, y: Array, sample: Array) -> Tuple[Array, Array]:
    """Per-(pixel, sample) sub-pixel jitter in [-0.5, 0.5).

    Bit-exact port of the jitter sequence in ``renderBatchCUDA``
    (``GPUandCPU/include/query.cu:36-43``): wang hash for jx, one LCG step,
    wang hash for jy.
    """
    pixel_seed = _u32(x) * _u32(73856093) ^ _u32(y) * _u32(19349663)
    h = pixel_seed ^ (_u32(sample) * _u32(83492791))
    jx = wang_hash_float(h) - 0.5
    h = h * _u32(1664525) + _u32(1013904223)
    jy = wang_hash_float(h) - 0.5
    return jx, jy


def jittered_samples(spp: int, seed: int = 12345, centered: bool = True) -> np.ndarray:
    """Host-side per-sample jitter offsets, shape (spp, 2) float32.

    Stream-exact port of ``jittered_samples``: numpy's legacy
    ``RandomState(seed)`` raw 32-bit draws match ``std::mt19937(seed)``, and
    libstdc++'s ``uniform_real_distribution<float>`` maps each draw to
    ``draw * 2**-32``.  ``centered=True`` gives the GPU-repo variant in
    [-0.5, 0.5) (``GPUandCPU/include/antialias.h:22-25``); ``centered=False``
    the HW1 variant in [0, 1) (``HW1/include/antialias.h:20-24``).
    """
    rs = np.random.RandomState(seed)
    draws = rs.randint(0, 2**32, size=2 * spp, dtype=np.uint32)
    vals = (draws.astype(np.float64) * 2.0**-32).astype(np.float32)
    offsets = vals.reshape(spp, 2)
    if centered:
        offsets = offsets - np.float32(0.5)
    return offsets


def random_unit_vector(state: Array) -> Tuple[Array, Array]:
    """Uniform point on the unit sphere via per-lane rejection sampling.

    Stream-exact, vectorized port of ``random_unit_vector``
    (``GPUandCPU/include/query.h:51-62``): each lane keeps consuming 3 draws
    per round until its candidate lands in the unit ball; accepted lanes stop
    advancing their state, exactly like the scalar loop.  The while-loop is a
    ``lax.while_loop`` so it stays jittable; acceptance probability per round
    is pi/6 so a handful of rounds suffice for any wavefront.

    ``state`` is a uint32 array of any shape; returns (new_state, (...,3)).
    """
    state = _u32(state)

    def cond(carry):
        _, _, accepted = carry
        return ~jnp.all(accepted)

    def body(carry):
        st, vec, accepted = carry
        s1, x = rng_next(st)
        s2, y = rng_next(s1)
        s3, z = rng_next(s2)
        x = 2.0 * x - 1.0
        y = 2.0 * y - 1.0
        z = 2.0 * z - 1.0
        lensq = x * x + y * y + z * z
        ok = (lensq > 1e-10) & (lensq <= 1.0)
        inv = jax.lax.rsqrt(jnp.maximum(lensq, 1e-10))
        cand = jnp.stack([x * inv, y * inv, z * inv], axis=-1)
        take = ok & ~accepted
        vec = jnp.where(take[..., None], cand, vec)
        st = jnp.where(accepted, st, s3)
        return st, vec, accepted | ok

    zeros = jnp.zeros(state.shape + (3,), dtype=jnp.float32)
    accepted0 = jnp.zeros(state.shape, dtype=bool)
    state, vec, _ = jax.lax.while_loop(cond, body, (state, zeros, accepted0))
    return state, vec


def random_on_hemisphere(normal: Array, state: Array) -> Tuple[Array, Array]:
    """Uniform direction on the hemisphere around ``normal``.

    Port of ``random_on_hemisphere`` (``GPUandCPU/include/query.h:66-71``).
    """
    state, v = random_unit_vector(state)
    flip = jnp.sum(v * normal, axis=-1, keepdims=True) > 0.0
    return state, jnp.where(flip, v, -v)


def random_in_unit_disk(state: Array) -> Tuple[Array, Array]:
    """Uniform point in the unit disk (z=0), per-lane rejection.

    Stream-exact port of ``random_in_unit_disk``
    (``CPUOnly/include/raytracer.h:77-85``); two draws per round.
    Returns (new_state, (...,2)).
    """
    state = _u32(state)

    def cond(carry):
        _, _, accepted = carry
        return ~jnp.all(accepted)

    def body(carry):
        st, vec, accepted = carry
        s1, x = rng_next(st)
        s2, y = rng_next(s1)
        x = 2.0 * x - 1.0
        y = 2.0 * y - 1.0
        r2 = x * x + y * y
        ok = (r2 > 1e-10) & (r2 <= 1.0)
        cand = jnp.stack([x, y], axis=-1)
        take = ok & ~accepted
        vec = jnp.where(take[..., None], cand, vec)
        st = jnp.where(accepted, st, s2)
        return st, vec, accepted | ok

    zeros = jnp.zeros(state.shape + (2,), dtype=jnp.float32)
    accepted0 = jnp.zeros(state.shape, dtype=bool)
    state, vec, _ = jax.lax.while_loop(cond, body, (state, zeros, accepted0))
    return state, vec


def make_basis(w: Array) -> Tuple[Array, Array]:
    """Orthonormal (T, B) around unit direction ``w``.

    Port of ``make_basis`` (``CPUOnly/include/raytracer.h:88-93``): helper
    axis is +Y when |w.x| > 0.9 else +X.
    """
    use_y = jnp.abs(w[..., 0]) > 0.9
    a = jnp.where(
        use_y[..., None],
        jnp.array([0.0, 1.0, 0.0], dtype=w.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=w.dtype),
    )
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    t = jnp.stack(
        [a1 * w2 - a2 * w1, a2 * w0 - a0 * w2, a0 * w1 - a1 * w0], axis=-1
    )
    t = t / jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True))
    t0, t1, t2 = t[..., 0], t[..., 1], t[..., 2]
    b = jnp.stack(
        [w1 * t2 - w2 * t1, w2 * t0 - w0 * t2, w0 * t1 - w1 * t0], axis=-1
    )
    return t, b
