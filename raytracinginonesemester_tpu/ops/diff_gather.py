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


# XLA's row gather lowers to a ~4 ms/call kCustom gather fusion at
# R=518k on v5e (effective ~5 GB/s — scalar-unit driven), and the diff
# integrator pays 6-8 of them per step (tri + normals x bounces;
# profiled, docs/DESIGN.md round 4).  For small tables the MXU does the
# same selection at streaming rate: one-hot(idx) @ [hi|mid|lo] bf16
# splits of the table, f32-accumulated — bit-exact reconstruction for
# |q| in [1e-32, 3.38e38] (same 3-part trick as the megakernel's qsel
# winner-attr matmul; scripts/probe_mm_select.py).  The one-hot is
# fused into the dot by XLA, never materialized.  Above the row bound
# the O(R*T) MACs stop paying; XLA's gather wins.
import os as _os

_MXU_GATHER_MAX_ROWS = int(_os.environ.get("RT_MXU_GATHER_MAX", "8192"))


def _mxu_gather(table2d: Array, idx: Array) -> Array:
    """Exact ``table2d[idx]`` ((T, F) f32, (R,) i32 -> (R, F) f32)
    through one bf16 MXU matmul of the 3-part-split table.

    RANGE CONTRACT: exact for |value| in {0} U [~1e-32, 3.38e38] — below
    that the lo bf16 part underflows subnormals and low-order bits are
    lost (ops.bf16_split docstring).  Vertex/normal/material tables
    satisfy this for any sanely-scaled scene."""
    from .bf16_split import bf16_split3

    t, f = table2d.shape
    hi, mid, lo = bf16_split3(table2d)  # fold-proof (see bf16_split)
    parts = jnp.concatenate([hi, mid, lo], axis=1)  # (T, 3F) bf16
    oh = jax.nn.one_hot(idx, t, dtype=jnp.bfloat16)  # (R, T), fused
    out = jnp.dot(oh, parts, preferred_element_type=jnp.float32)
    return out[:, :f] + out[:, f:2 * f] + out[:, 2 * f:]


def _gather_impl(rows, interpret, table, idx):
    # clamp BOTH paths to the same semantics: XLA's table[idx] clamps
    # out-of-range indices, while one_hot yields an all-zero row (a 0
    # result) — without this, the TPU small-table and CPU/large-table
    # paths diverge for any idx >= rows (round-4 advisor finding)
    idx = jnp.clip(idx, 0, rows - 1)
    if interpret or rows > _MXU_GATHER_MAX_ROWS:
        return table[idx]
    trail = table.shape[1:]
    f = int(np.prod(trail)) if trail else 1
    out = _mxu_gather(table.reshape(rows, f), idx)
    return out.reshape((idx.shape[0],) + trail)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def gather_rows(rows: int, interpret: bool, table: Array, idx: Array):
    """``table[idx]`` with the table cotangent routed through the
    Pallas one-hot accumulate instead of XLA's scatter-add, and (for
    tables up to ``_MXU_GATHER_MAX_ROWS`` rows) the forward selection
    through an exact bf16-split MXU matmul instead of XLA's gather.

    ``rows`` must equal ``table.shape[0]`` (passed statically so the
    backward rule needs no shape residuals); trailing dims of ``table``
    must total <= 16 elements; idx (R,) int32 in [0, rows).
    """
    return _gather_impl(rows, interpret, table, idx)


def _gather_fwd(rows, interpret, table, idx):
    return _gather_impl(rows, interpret, table, idx), idx


def _gather_bwd(rows, interpret, idx, ct):
    r = idx.shape[0]
    trail = ct.shape[1:]
    f = int(np.prod(trail)) if trail else 1
    grad = segment_accum_rows(idx, ct.reshape(r, f), rows,
                              interpret=interpret)
    return grad.reshape((rows,) + trail), None


gather_rows.defvjp(_gather_fwd, _gather_bwd)


def gather_int_rows(table: Array, idx: Array, interpret: bool) -> Array:
    """``table[idx]`` for an int32 row vector (e.g. per-triangle object
    ids) through the MXU one-hot selection — XLA's s32 gather fusion
    measured 3.7 ms/call at R=518k on v5e (round 4).  Exact for
    |values| <= 2^24 (integers are exact in f32; the 3-part split is
    exact; the round-trip cast is exact)."""
    rows = table.shape[0]
    idx = jnp.clip(idx, 0, rows - 1)  # match XLA gather's clamp (see above)
    if interpret or rows > _MXU_GATHER_MAX_ROWS:
        return table[idx]
    out = _mxu_gather(table.astype(jnp.float32).reshape(rows, 1), idx)
    return out.reshape(idx.shape).astype(jnp.int32)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def gather_table_small(rows: int, table: Array, idx: Array) -> Array:
    """``table[clip(idx)]`` for a SMALL (rows, F) table whose table
    cotangent is a one-hot MXU contraction instead of XLA's scatter-add
    (the scatter fusion measured 4.5 ms/call at R=518k on v5e — the
    albedo gradient was one of the two largest backward terms)."""
    return table[jnp.clip(idx, 0, rows - 1)]


def _gts_fwd(rows, table, idx):
    i = jnp.clip(idx, 0, rows - 1)
    return table[i], i


def _gts_bwd(rows, i, ct):
    oh = jax.nn.one_hot(i, rows, dtype=ct.dtype)
    grad = jax.lax.dot_general(
        oh, ct, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    return grad, None


gather_table_small.defvjp(_gts_fwd, _gts_bwd)
