"""ops.diff_gather: the Pallas one-hot MXU accumulate used as the
vertex-gather VJP in the detached-diff backward pass.

The kernel replaces XLA's scatter-add (TPUs have no scatter hardware;
the transpose of a one-hot gather is a one-hot matmul).  Gradient
values must match ``zeros.at[idx].add(ct)`` up to f32 summation-order
tolerance; the forward is an exact gather.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from raytracinginonesemester_tpu.ops.diff_gather import (
    _TC, gather_rows, segment_accum_rows)


@pytest.mark.parametrize("t,r", [
    (100, 3000),       # single chunk, unpadded ray count
    (_TC + 123, 700),  # multiple table chunks
    (7, 512),          # tiny table, exact ray tile
])
def test_segment_accum_matches_scatter_add(t, r):
    rs = np.random.RandomState(t + r)
    idx = jnp.asarray(rs.randint(0, t, r).astype(np.int32))
    ct = jnp.asarray(rs.standard_normal((r, 9)).astype(np.float32))
    acc = np.asarray(segment_accum_rows(idx, ct, t, interpret=True))
    ref = np.asarray(jnp.zeros((t, 9)).at[idx].add(ct))
    np.testing.assert_allclose(acc, ref, atol=1e-4, rtol=1e-5)


def test_segment_accum_drops_out_of_range():
    """Padding / masked rays use idx=-1 (or >= rows) and must not
    contribute anywhere."""
    rs = np.random.RandomState(0)
    t, r = 50, 900
    idx = rs.randint(0, t, r).astype(np.int32)
    idx[::7] = -1
    idx[::11] = t + 5
    ct = rs.standard_normal((r, 9)).astype(np.float32)
    acc = np.asarray(segment_accum_rows(
        jnp.asarray(idx), jnp.asarray(ct), t, interpret=True))
    keep = (idx >= 0) & (idx < t)
    ref = np.asarray(jnp.zeros((t, 9)).at[
        jnp.asarray(np.where(keep, idx, 0))].add(
        jnp.asarray(np.where(keep[:, None], ct, 0.0))))
    np.testing.assert_allclose(acc, ref, atol=1e-4, rtol=1e-5)


def test_gather_rows_forward_exact_backward_close():
    rs = np.random.RandomState(1)
    t, r = 300, 2000
    table = jnp.asarray(rs.standard_normal((t, 3, 3)).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, t, r).astype(np.int32))
    w = jnp.asarray(rs.standard_normal((r, 3, 3)).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(gather_rows(t, True, table, idx)),
        np.asarray(table[idx]))

    g_kernel = np.asarray(jax.grad(
        lambda tb: jnp.sum(gather_rows(t, True, tb, idx) * w))(table))
    g_xla = np.asarray(jax.grad(
        lambda tb: jnp.sum(tb[idx] * w))(table))
    np.testing.assert_allclose(g_kernel, g_xla, atol=1e-4, rtol=1e-5)


def test_mxu_gather_bit_exact():
    """The bf16 3-part-split MXU gather must reproduce table[idx] BIT
    EXACTLY (one-hot selection is exact; hi+mid+lo reconstructs f32
    for |q| in [1e-32, 3.38e38] — same trick as the megakernel qsel)."""
    import numpy as np
    import jax.numpy as jnp

    from raytracinginonesemester_tpu.ops.diff_gather import _mxu_gather

    rs = np.random.RandomState(7)
    # wide magnitude range incl. tiny/huge/negative/zero, within the
    # guaranteed window (values right at ~1e-32 can lose the lo part
    # to bf16 underflow — 2/27k hits at uniform(-30, 30) exponents;
    # geometry coordinates live many orders inside the window)
    mag = rs.uniform(-20, 20, (3072, 9)).astype(np.float32)
    tab = (rs.standard_normal((3072, 9)).astype(np.float32)
           * (10.0 ** mag).astype(np.float32))
    tab[0] = 0.0
    idx = rs.randint(0, 3072, 4096).astype(np.int32)
    out = np.asarray(_mxu_gather(jnp.asarray(tab), jnp.asarray(idx)))
    np.testing.assert_array_equal(out, tab[idx])


def test_bf16_split3_exact_under_jit():
    """The integer-mask split must reconstruct f32 bit-exactly UNDER
    JIT — the convert-based split it replaced was folded to identity
    by XLA:TPU (mid/lo zeroed; round-4 finding), so this invariant is
    pinned at the jitted level on every backend."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracinginonesemester_tpu.ops.bf16_split import bf16_split3

    rs = np.random.RandomState(11)
    x = jnp.asarray((rs.standard_normal((512, 9)) *
                     10.0 ** rs.uniform(-18, 18, (512, 9))
                     ).astype(np.float32))
    h, m, l = jax.jit(bf16_split3)(x)
    rec = jax.jit(lambda h, m, l: (h.astype(jnp.float32)
                                   + m.astype(jnp.float32)
                                   + l.astype(jnp.float32)))(h, m, l)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))
    # parts really are 3-way: mid/lo carry information for full-width
    # mantissas
    assert bool(jnp.any(m != 0)) and bool(jnp.any(l != 0))
