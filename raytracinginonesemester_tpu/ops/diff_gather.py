"""Differentiable winner-triangle gather with a Pallas scatter-accum VJP.

The detached-traversal differentiable mode (``ops.integrator``,
``Scene.differentiable``) gathers each ray's winner triangle
(``vertices[idx]``, (R, 3, 3)) and backpropagates pixel gradients into
the vertex table.  The gather's standard VJP is an XLA scatter-add of R
(3, 3) updates into (T, 3, 3) — measured ~37 ms per bounce at R=518k
on v5e (scripts/probe_grad_cost.py), the single largest term of the
backward pass (the reference has no backward pass at all; this is the
BASELINE "differentiable w.r.t. vertex positions" requirement).

TPUs have no scatter hardware, but the transpose of a one-hot gather is
a one-hot MATMUL: grad_table[t, f] = sum_r [idx_r == t] * ct[r, f] —
an MXU contraction over rays.  ``segment_accum_rows`` tiles rays into
512-lane blocks and triangles into 2048-row chunks, builds the (chunk,
512) one-hot mask in VMEM via an iota compare, and accumulates
(chunk, 16) f32 partials into a revisited output block across the
sequential TPU grid — deterministic accumulation order (ray tiles in
ascending order), no atomics (the lesson of the reference's atomicCAS
refit, ``bvh.cu:180-205``, restated as a race-free reduction).

``gather_rows`` wraps table[idx] in a ``jax.custom_vjp`` that routes
the table cotangent through this kernel; the index cotangent is None
(integers).  Numerics: f32 one-hot dot accumulates in f32 on the MXU —
same dtype as XLA's scatter-add, different (but fixed) addition order,
well inside the FD tolerances of tests/test_diff*.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_rows", "segment_accum_rows"]

_RT = 512    # rays per tile (lane-major blocks of 4 x 128)
_TC = 2048   # table rows per output chunk


def _segment_accum_kernel(idx_ref, ct_ref, out_ref):
    """One (table-chunk, ray-tile) grid step of the one-hot accumulate.

    idx_ref (8, RT) i32: this tile's row indices, LOCAL to the chunk
    (callers pre-subtract the chunk base; out-of-chunk rows are any
    negative / >= _TC value and match no iota row).  All 8 sublanes
    are copies — Mosaic requires a sublane-divisible block, and the
    (nc*8, Rp) replicated host array is tiny.
    ct_ref (16, RT) f32: feature rows (features x rays).
    out_ref (_TC, 16) f32: revisited across the ray-tile grid axis.
    """
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[pl.ds(0, 1), :]  # (1, RT)
    rows = jax.lax.broadcasted_iota(jnp.int32, (_TC, _RT), 0)
    oh = jnp.where(rows == idx, 1.0, 0.0)  # (TC, RT)
    ct = ct_ref[:]  # (16, RT)
    out_ref[:] += jax.lax.dot_general(
        oh, ct, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (TC, 16)


@partial(jax.jit, static_argnames=("rows", "interpret"))
def segment_accum_rows(idx: Array, ct: Array, rows: int,
                       interpret: bool = False) -> Array:
    """sum-scatter ``ct`` (R, F<=16) into ``rows`` bins -> (rows, F).

    ``idx`` (R,) int32 bin per row; entries outside [0, rows) are
    dropped (the wrapper uses -1 for padding / masked rays).
    Deterministic: bins accumulate ray tiles in ascending order.
    """
    r, f = ct.shape
    assert f <= 16, f
    rp = -(-r // _RT) * _RT
    tp = -(-rows // _TC) * _TC
    idx_p = jnp.full((rp,), -1, jnp.int32).at[:r].set(idx.astype(jnp.int32))
    # (16, Rp) feature-major: rows of R lanes, the native VPU layout
    ct_p = jnp.zeros((16, rp), jnp.float32).at[:f, :r].set(ct.T)

    nc = tp // _TC
    nr = rp // _RT

    # per-chunk LOCAL indices: subtract the chunk base so the kernel's
    # iota compare is chunk-relative (grid dim 0 = chunk); the (nc*8,
    # rp) matrix replicates each chunk's row 8x for Mosaic's
    # sublane-divisible block requirement — still small (nc is 1-10)
    local = idx_p[None, :] - (jnp.arange(nc, dtype=jnp.int32) * _TC)[:, None]
    local = jnp.repeat(local, 8, axis=0)

    out = pl.pallas_call(
        _segment_accum_kernel,
        out_shape=jax.ShapeDtypeStruct((tp, 16), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(nc, nr),
            in_specs=[
                pl.BlockSpec((8, _RT), lambda c, rr: (c, rr),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, _RT), lambda c, rr: (0, rr),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_TC, 16), lambda c, rr: (c, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(local, ct_p)
    return out[:rows, :f]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def gather_rows(rows: int, interpret: bool, table: Array, idx: Array):
    """``table[idx]`` with the table cotangent routed through the
    Pallas one-hot accumulate instead of XLA's scatter-add.

    ``rows`` must equal ``table.shape[0]`` (passed statically so the
    backward rule needs no shape residuals); trailing dims of ``table``
    must total <= 16 elements; idx (R,) int32 in [0, rows).
    """
    return table[idx]


def _gather_fwd(rows, interpret, table, idx):
    return table[idx], idx


def _gather_bwd(rows, interpret, idx, ct):
    r = idx.shape[0]
    trail = ct.shape[1:]
    f = int(np.prod(trail)) if trail else 1
    grad = segment_accum_rows(idx, ct.reshape(r, f), rows,
                              interpret=interpret)
    return grad.reshape((rows,) + trail), None


gather_rows.defvjp(_gather_fwd, _gather_bwd)
