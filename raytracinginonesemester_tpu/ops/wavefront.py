"""Wavefront bounce scheduling: sort-compacted bounce wavefronts.

The monolithic megakernel (``ops.megakernel.render_tiles``) keeps each
camera tile's rays together for the whole path.  After one diffuse
bounce only ~3% of the frog frame's rays are alive, scattered across
~5% of the tiles, so bounce traversal wastes >90% of its dense
arithmetic on dead or slab-failing lanes (measured: bounce 1 of 8 costs
~89 ms of a 216 ms 1080p frame; scripts/probe_bounce_stats.py).

This module is the TPU restatement of wavefront path tracing (the
stream-compaction design of Laine et al. 2013, "Megakernels Considered
Harmful" — the reference's ``TraceRayIterative`` is the megakernel
form, ``query.h:156-220``):

  1. ``emit_tiles`` runs depth 0 fused (jitter, camera rays, planned
     traversal, direct light, RR bounce decision) and writes per-ray
     bounce state;
  2. ONE ``lax.sort`` over the flat ray axis packs alive rays to the
     front and orders them by (direction octant, origin morton) —
     on TPU a multi-operand sort is fast (~18 ms for 2M x 16 at 1080p)
     while gathers/scatters are catastrophically slow
     (scripts/probe_compact_glue.py), so compaction IS a sort;
  3. ``resume_tiles`` runs bounce depths 1..max on the packed tiles:
     dense occupancy, coherent slab behavior, and dead tiles form a
     suffix that exits at one scalar test;
  4. a second 4-operand sort returns per-ray radiance to pixel order.

Per-ray math is bit-identical to the monolithic kernel (state rides
verbatim through the sorts; radiance accumulates in the same order),
so images match lane-for-lane — the ordering-invariance the whole
framework maintains (images must not depend on ray placement).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from .accel import super_aabbs
from .lbvh import _bit_expand
from .megakernel import (
    _ST_ALIVE_ROW,
    _ST_LIVE_ROWS,
    _ST_ROWS,
    RAY_TILE,
    _pad_plan_rows,
    _pad_tiles,
    bounce_step_tiles,
    camera_tile_plan,
    emit_tiles,
    resume_tiles,
)

__all__ = ["bounce_tile_plan", "render_tiles_wavefront",
           "render_tiles_wavefront_frames", "sort_bounce_state"]

_I32_MAX = np.int32(2**31 - 1)

# Sublane-chunk gating for the staged bounce kernels: the compaction
# sort clusters slab-passing lanes, so chunks of dead rows can skip
# their share of the dense Moller-Trumbore (megakernel.
# visit_block_chunked, deferred-attr form).  Rows per chunk; 0 = off.
# Measured on frog 1080p depth-8 (scripts/probe_staged_chunk.py,
# single dispatch): 0 -> 87.0 ms, 64 -> 87.8, 128 -> 90.1, 256 -> 84.7,
# all bit-identical — half-tile chunks win ~2.3 ms (the round-1
# chunk=8 experiment lost because 64 scalar preds/visit cost more than
# the skipped ops; at 256 it is 2 preds).  Read once at import like
# every perf knob (env reads at trace time would be masked by the jit
# cache).
import os as _os

_STAGED_CHUNK = int(_os.environ.get("RT_STAGED_CHUNK", "256"))

# Samples per MERGED bounce group (see _render_group): the staged spp
# loop gathers this many samples' alive subsets into ONE compaction
# sort + bounce ladder.  The TPU analog of the reference's 32-sample
# register batching (GPUandCPU/include/query.cu:39-65, antialias.h:39):
# there registers amortize per-launch state, here the shared sort packs
# G samples' alive rays into tiles with ~G x narrower key ranges
# (tighter hulls -> fewer dense visits per ray) and the ladder's fixed
# costs are paid once per group.  1 disables merging.
_SAMPLE_GROUP = int(_os.environ.get("RT_SAMPLE_GROUP", "8"))

# Tile width for the staged LADDER kernels (bounces 1+): narrower
# tiles have tighter (octant, morton) hulls after the compaction sort
# — fewer firing blocks per ray — at the cost of 512/width more
# per-tile fixed work (scan iterations, grid steps).  512 (= RAY_TILE)
# disables re-tiling; 128 is the round-4 verdict's re-measurement
# request (task #5a — the round-2-era "128-ray experiments lost"
# refutation predates sorted-tile chunking).  The re-tile preserves
# the flat (tile-major, lane) ray order, so pixel keys and the
# alive-prefix structure are untouched; per-sample math is width-
# agnostic (bit-identical in exact semantics, the usual last-ulp
# static-shape caveat on TPU).
_LADDER_WIDTH = int(_os.environ.get("RT_LADDER_WIDTH", "512"))


def _retile(rows_arr, rows_per_tile, new_width):
    """(nt*rows, W) -> (nt*f*rows, new_width) splitting each tile into
    f = W // new_width subtiles; flat ray order is preserved."""
    w = rows_arr.shape[1]
    f = w // new_width
    nt = rows_arr.shape[0] // rows_per_tile
    return (rows_arr.reshape(nt, rows_per_tile, f, new_width)
            .transpose(0, 2, 1, 3)
            .reshape(nt * f * rows_per_tile, new_width))


def _sort_key(bo, bd, alive, lo, span):
    """(direction octant << 24) | 24-bit origin morton; dead rays get
    INT32_MAX so they pack to the tail of the sorted stream.  Bit
    interleave via ``lbvh._bit_expand`` (``bitExpansion``, bvh.h:131-140;
    the quantized inputs here use 8 of its 10 bits)."""
    oct_ = (
        (jnp.where(bd[0] < 0.0, 4, 0))
        | (jnp.where(bd[1] < 0.0, 2, 0))
        | (jnp.where(bd[2] < 0.0, 1, 0))
    ).astype(jnp.int32)
    q = [
        jnp.clip((bo[c] - lo[c]) / span[c] * 256.0, 0.0, 255.0).astype(
            jnp.uint32
        )
        for c in range(3)
    ]
    morton = (
        _bit_expand(q[0])
        | (_bit_expand(q[1]) << 1)
        | (_bit_expand(q[2]) << 2)
    ).astype(jnp.int32)
    key = (oct_ << 24) | morton
    return jnp.where(alive, key, _I32_MAX)


def sort_bounce_state(state: Array, rng_state: Array, pix: Array,
                      lo, span):
    """Globally sort per-ray bounce state by the compaction key.

    ``state`` is the (nt*16, RAY_TILE) row layout of ``emit_tiles``;
    returns (sorted state, sorted rng, sorted pixel ids).

    The sort is deliberately UNSTABLE: per-ray math never depends on a
    ray's tile placement (the framework's ordering-invariance contract)
    and the unsort keys (pixel ids) are unique, so stability would only
    add a hidden iota tiebreak operand to the hot ~2M-row multi-operand
    sort for nothing.
    """
    nt = state.shape[0] // _ST_ROWS
    rt = state.shape[1]  # RAY_TILE, or the narrower ladder width
    nr = nt * rt
    stv = state.reshape(nt, _ST_ROWS, rt)

    def plane(k):
        return stv[:, k, :].reshape(nr)

    planes = [plane(k) for k in range(_ST_LIVE_ROWS)]
    rng_flat = rng_state.reshape(nt, 8, rt)[:, 0, :].reshape(nr)
    key = _sort_key(planes[0:3], planes[3:6],
                    planes[_ST_ALIVE_ROW] > 0.0, lo, span)

    out = jax.lax.sort(
        tuple([key, pix, rng_flat] + planes), dimension=0, num_keys=1,
    )
    pix_s, rng_s = out[1], out[2]
    planes_s = list(out[3:])

    rows = planes_s + (
        [jnp.zeros(nr, jnp.float32)] * (_ST_ROWS - _ST_LIVE_ROWS))
    st_s = jnp.stack(
        [r.reshape(nt, rt) for r in rows], axis=1
    ).reshape(nt * _ST_ROWS, rt)
    rng_rows = jnp.concatenate(
        [rng_s.reshape(nt, 1, rt),
         jnp.zeros((nt, 7, rt), jnp.int32)], axis=1
    ).reshape(nt * 8, rt)
    return st_s, rng_rows, pix_s


def bounce_tile_plan(state: Array, grid):
    """Per-tile front-to-back superblock plan from packed bounce state.

    The interval generalization of ``camera_tile_plan``: each tile's
    alive rays span an origin box [o_lo, o_hi] and a direction box
    [d_lo, d_hi] (tight after the compaction sort groups rays by
    direction octant and origin morton).  An interval slab test of that
    hull against the superblock AABBs gives a conservative candidate
    set for EVERY alive ray in the tile, and — directions being unit
    here — the slab entry is already a t lower bound, so the kernel's
    front-to-back early exit stays exact.

    Returns (order, entry) padded via ``_pad_plan_rows``.
    """
    nt = state.shape[0] // _ST_ROWS
    rt = state.shape[1]
    stv = state.reshape(nt, _ST_ROWS, rt)
    alive = stv[:, _ST_ALIVE_ROW] > 0.0  # (nt, RT)
    big = np.float32(3e38)

    def hull(k):
        v = stv[:, k]
        return (jnp.min(jnp.where(alive, v, big), axis=1, keepdims=True),
                jnp.max(jnp.where(alive, v, -big), axis=1, keepdims=True))

    o_iv = [hull(c) for c in range(3)]
    d_iv = [hull(3 + c) for c in range(3)]

    saabb = super_aabbs(grid)  # (6, LS)
    ls = saabb.shape[1]
    near_all = jnp.zeros((nt, 1), jnp.float32)
    far_all = jnp.full((nt, 1), jnp.inf, jnp.float32)
    for axis in range(3):
        blo = saabb[axis][None, :]
        bhi = saabb[axis + 3][None, :]
        olo, ohi = o_iv[axis]
        dlo, dhi = d_iv[axis]
        spans0 = (dlo <= 0.0) & (dhi >= 0.0)
        inv_a, inv_b = 1.0 / dhi, 1.0 / dlo  # same-sign interval recip
        # numerator intervals for both slab planes
        ca_lo, ca_hi = blo - ohi, blo - olo
        cb_lo, cb_hi = bhi - ohi, bhi - olo
        cands = [ca_lo * inv_a, ca_lo * inv_b, ca_hi * inv_a, ca_hi * inv_b,
                 cb_lo * inv_a, cb_lo * inv_b, cb_hi * inv_a, cb_hi * inv_b]
        near = cands[0]
        far = cands[0]
        for c in cands[1:]:
            near = jnp.minimum(near, c)
            far = jnp.maximum(far, c)
        near = near - jnp.abs(near) * 4e-7  # rounding slack, conservative
        far = far + jnp.abs(far) * 4e-7
        bad = spans0 | jnp.isnan(near) | jnp.isnan(far)
        near_all = jnp.maximum(near_all, jnp.where(bad, -jnp.inf, near))
        far_all = jnp.minimum(far_all, jnp.where(bad, jnp.inf, far))

    valid_box = (saabb[0] <= saabb[3])[None, :]
    any_alive = jnp.any(alive, axis=1, keepdims=True)
    hit = (near_all <= far_all) & (far_all >= 0.0) & valid_box & any_alive
    entry = jnp.where(hit, jnp.maximum(near_all, 0.0), jnp.inf)
    order = jnp.argsort(entry, axis=1).astype(jnp.int32)
    sorted_entry = jnp.take_along_axis(entry, order, axis=1).astype(
        jnp.float32)
    return _pad_plan_rows(order, sorted_entry)


def _staged_ladder(scene, h_st, h_rng, h_pix, cap, lo, span,
                   staged_chunk, mb, kw):
    """Per-bounce kernel + re-sort on packed tiles with a SHRINKING
    capacity ladder; radiance rides in the state's rd rows.

    The alive wavefront collapses fast after the first bounce
    (frog: 131 alive tiles -> 14 -> 3 -> ...), so bounce 1 runs at
    the full capacity and bounces 2+ on the re-sorted alive PREFIX
    at cap/8 — kernels and re-sorts shrink with the wavefront.  If
    bounce 1 leaves more alive tiles than the small capacity (a
    scene with little decay), a ``lax.cond`` keeps the full width;
    either way the dead suffix rides through unchanged, so output
    is identical.
    """
    from .megakernel import staged_flat

    grid = scene.accel
    # the flat-scan bounce kernel never reads the plan (see
    # megakernel traversal-order notes); hand it zeros instead of
    # building the hull/slab/argsort plan every bounce
    flat = staged_flat(grid.num_blocks)
    ls = -(-grid.num_blocks // 8)  # accel.SUPER

    # optional narrow-ladder re-tile (RT_LADDER_WIDTH; see _retile):
    # the flat ray order is preserved, so pixel keys and the sorted
    # alive-prefix structure carry over unchanged
    lw = _LADDER_WIDTH
    retiled = (lw < RAY_TILE and lw >= 128 and RAY_TILE % lw == 0)
    if retiled:
        f = RAY_TILE // lw
        h_st = _retile(h_st, _ST_ROWS, lw)
        h_rng = _retile(h_rng, 8, lw)
        cap = cap * f
    else:
        lw = RAY_TILE

    def finish(h_st, h_pix):
        if retiled:
            nt0 = cap // f
            h_st = (h_st.reshape(nt0, f, _ST_ROWS, lw)
                    .transpose(0, 2, 1, 3)
                    .reshape(nt0 * _ST_ROWS, RAY_TILE))
        return h_st, h_pix

    def one_bounce(h_st, h_rng, h_pix, c):
        if flat:
            c8 = -(-c // 8) * 8
            order = jnp.zeros((c8, ls), jnp.int32)
            entry = jnp.zeros((c8, ls), jnp.float32)
        else:
            order, entry = bounce_tile_plan(h_st, grid)
        h_st, h_rng = bounce_step_tiles(scene, h_st, h_rng,
                                        order, entry,
                                        chunk=staged_chunk, **kw)
        return sort_bounce_state(h_st, h_rng, h_pix, lo, span)

    def while_bounces(h_st, h_rng, h_pix, c, d0):
        def cond(carry):
            d, st, _, _ = carry
            a = st.reshape(c, _ST_ROWS, lw)[:, _ST_ALIVE_ROW]
            return (d < mb) & jnp.any(a > 0.0)

        def body(carry):
            d, st, rng, pix_ = carry
            st, rng, pix_ = one_bounce(st, rng, pix_, c)
            return d + 1, st, rng, pix_

        _, h_st, _, h_pix = jax.lax.while_loop(
            cond, body, (jnp.int32(d0), h_st, h_rng, h_pix))
        return h_st, h_pix

    cap2 = max(8, cap // 8)
    if mb <= 2 or cap2 >= cap:
        return finish(*while_bounces(h_st, h_rng, h_pix, cap, 1))

    # bounce depth 1 at the full capacity (guarded: the gathered
    # wavefront can be entirely dead)
    a0 = h_st.reshape(cap, _ST_ROWS, lw)[:, _ST_ALIVE_ROW]
    h_st, h_rng, h_pix = jax.lax.cond(
        jnp.any(a0 > 0.0),
        lambda op: one_bounce(*op, cap),
        lambda op: op,
        (h_st, h_rng, h_pix))

    stv = h_st.reshape(cap, _ST_ROWS, lw)
    overflow2 = jnp.any(stv[cap2:, _ST_ALIVE_ROW] > 0.0)

    def full_width(op):
        h_st, h_rng, h_pix = op
        return while_bounces(h_st, h_rng, h_pix, cap, 2)

    def small_width(op):
        h_st, h_rng, h_pix = op
        p_st, p_pix = while_bounces(
            h_st[:cap2 * _ST_ROWS], h_rng[:cap2 * 8],
            h_pix[:cap2 * lw], cap2, 2)
        return (jnp.concatenate([p_st, h_st[cap2 * _ST_ROWS:]]),
                jnp.concatenate([p_pix, h_pix[cap2 * lw:]]))

    return finish(*jax.lax.cond(overflow2, full_width, small_width,
                                (h_st, h_rng, h_pix)))


def _render_group(scene, xs_p, ys_p, plan, lo, span, cap, group, s0,
                  staged_chunk, jitter, kw, cand_plan=None):
    """Render ``group`` consecutive samples with a MERGED bounce phase.

    Phase A (a scan over the group) runs each sample's emit and gathers
    its alive-tile subset (at most ``cap`` tiles).  Phase B concatenates
    the subsets, compaction-sorts ALL of them together — samples share
    the key space, so the merged tiles span ~group x narrower
    (octant, morton) ranges than per-sample tiles, which tightens every
    bounce tile's hull and cuts dense visits per ray — and runs ONE
    staged ladder at ``group * cap`` width, paying the ladder's fixed
    costs once.  The TPU analog of the reference's 32-sample register
    batching (``GPUandCPU/include/query.cu:39-65``).

    Per-sample results are bit-identical to the unmerged staged path in
    interpret/CPU semantics: per-ray math never depends on ray placement
    (the framework's ordering-invariance contract), pixel keys are
    offset by ``j * np_rays`` so the final unsort separates samples
    exactly, and each sample's radiance frame is reconstituted before
    any cross-sample accumulation.  (On real TPU hardware, kernels at a
    different static width may differ in the last ulp — Mosaic FMA
    contraction is per-compiled-program; see docs/DESIGN.md round 3.)

    A sample whose alive tiles overflow ``cap`` falls back to the
    full-width single-sort resume INSIDE phase A; its subset rides
    through phase B dead (parked radiance, passthrough lanes), so the
    scatter-back restores its exact fallback values.

    Returns (r, g, b), each ``(group, np_rays)`` — per-sample FINAL
    radiance frames, unclipped.
    """
    grid = scene.accel
    np_rays = xs_p.size
    nt = np_rays // RAY_TILE
    mb = int(scene.max_bounces)
    pix = jnp.arange(np_rays, dtype=jnp.int32)

    def emit_one(_, j):
        st, rng = emit_tiles(scene, xs_p, ys_p, s0 + j, jitter=jitter,
                             plan=plan, cand_plan=cand_plan, **kw)
        stv = st.reshape(nt, _ST_ROWS, RAY_TILE)
        alive_t = jnp.any(stv[:, _ST_ALIVE_ROW] > 0.0, axis=1)
        overflow = jnp.sum(alive_t.astype(jnp.int32)) > cap
        iota_t = jnp.arange(nt, dtype=jnp.int32)
        key_t = jnp.where(alive_t, iota_t, iota_t + nt)
        idx = jnp.sort(jnp.argsort(key_t)[:cap])
        rng_g = rng.reshape(nt, 8 * RAY_TILE)[idx].reshape(
            cap * 8, RAY_TILE)
        pix_g = (idx[:, None] * RAY_TILE
                 + jnp.arange(RAY_TILE, dtype=jnp.int32)[None, :]
                 ).reshape(cap * RAY_TILE)

        def no_ovf(op):
            st, rng = op
            stv = st.reshape(nt, _ST_ROWS, RAY_TILE)
            st_g = st.reshape(nt, _ST_ROWS * RAY_TILE)[idx].reshape(
                cap * _ST_ROWS, RAY_TILE)
            base = tuple(stv[:, r].reshape(np_rays) for r in (9, 10, 11))
            return (st_g,) + base

        def ovf(op):
            # miscalibrated capacity: finish this sample at full width
            # (identical to the unmerged global path) and PARK its
            # subset — final radiance in the rd rows, alive 0 — so the
            # merged ladder passes it through and the scatter-back
            # restores these exact values
            st, rng = op
            st_s, rng_s, pix_s = sort_bounce_state(st, rng, pix, lo, span)
            r, g, b = resume_tiles(scene, st_s, rng_s, **kw)
            _, r2, g2, b2 = jax.lax.sort(
                (pix_s, r.reshape(np_rays), g.reshape(np_rays),
                 b.reshape(np_rays)), dimension=0, num_keys=1)
            st_g = st.reshape(nt, _ST_ROWS * RAY_TILE)[idx].reshape(
                cap, _ST_ROWS, RAY_TILE)
            for row_, fr in zip((9, 10, 11), (r2, g2, b2)):
                st_g = st_g.at[:, row_].set(fr.reshape(nt, RAY_TILE)[idx])
            st_g = st_g.at[:, _ST_ALIVE_ROW].set(0.0)
            return (st_g.reshape(cap * _ST_ROWS, RAY_TILE), r2, g2, b2)

        st_g, er, eg, eb = jax.lax.cond(overflow, ovf, no_ovf, (st, rng))
        return 0, (idx, st_g, rng_g, pix_g + j * np_rays, er, eg, eb)

    _, (idxs, st_gs, rng_gs, pix_gs, ers, egs, ebs) = jax.lax.scan(
        emit_one, 0, jnp.arange(group, dtype=jnp.int32))

    cap_g = cap * group
    h_st, h_rng, h_pix = sort_bounce_state(
        st_gs.reshape(cap_g * _ST_ROWS, RAY_TILE),
        rng_gs.reshape(cap_g * 8, RAY_TILE),
        pix_gs.reshape(cap_g * RAY_TILE), lo, span)
    h_st, h_pix = _staged_ladder(scene, h_st, h_rng, h_pix, cap_g,
                                 lo, span, staged_chunk, mb, kw)
    fv = h_st.reshape(cap_g, _ST_ROWS, RAY_TILE)
    # one sort by the offset pixel keys both unsorts within each sample
    # and separates samples: sample j's keys live in
    # [j * np_rays, (j + 1) * np_rays) and are exactly cap * RAY_TILE
    # many, so its rows land contiguously, in gathered-tile order
    _, r_s, g_s, b_s = jax.lax.sort(
        (h_pix,
         fv[:, 9].reshape(cap_g * RAY_TILE),
         fv[:, 10].reshape(cap_g * RAY_TILE),
         fv[:, 11].reshape(cap_g * RAY_TILE)),
        dimension=0, num_keys=1)

    def scatter_one(frame, sub, idx):
        return frame.reshape(nt, RAY_TILE).at[idx].set(
            sub.reshape(cap, RAY_TILE)).reshape(np_rays)

    return tuple(
        jax.vmap(scatter_one)(frames, sub.reshape(group, cap * RAY_TILE),
                              idxs)
        for frames, sub in zip((ers, egs, ebs), (r_s, g_s, b_s)))


@partial(jax.jit, static_argnames=("spp", "interpret", "det_eps", "tmin",
                                   "shadow_eps", "shadow_tmin",
                                   "dialect", "jitter", "shadow_samples",
                                   "capacity_tiles", "staged_chunk",
                                   "sample_group"))
def render_tiles_wavefront(
    scene,
    xs: Array,
    ys: Array,
    spp: int,
    sample_offset=0,
    *,
    interpret: bool = False,
    det_eps: float = 1e-8,
    tmin: float = 1e-4,
    shadow_eps: float = 1e-3,
    shadow_tmin: float = 1e-4,
    dialect: str = "gpu",
    jitter: str = "wang",
    shadow_samples: int = 1,
    capacity_tiles: int | None = None,
    staged_chunk: int | None = None,
    sample_group: int | None = None,
    cand_plan=None,
) -> Array:
    """Wavefront render of swizzled pixel tiles -> (N, 3) radiance SUM
    over spp samples; drop-in for ``megakernel.render_tiles`` on
    non-terminal scenes of either dialect (bit-identical output).

    ``cand_plan``: optional binned camera-candidate plan
    (``ops.binned``) threaded to every emit — must have been built for
    exactly this (scene, camera, padded tile stream).

    ``capacity_tiles``: static alive-wavefront capacity enabling the
    STAGED scheduler — the tiles holding depth-0 survivors (at most
    ``capacity_tiles`` of them) are gathered into a compact subset,
    compaction-sorted there, and each bounce runs one planned kernel
    over just those tiles, re-sorting them (cheap at this width) to
    re-pack lane-level deaths and refresh the per-tile traversal
    plans.  If more tiles survive than the capacity (a
    miscalibration), a ``lax.cond`` falls back to the global
    single-sort multi-bounce resume — output is identical either way.
    ``None`` (default) always uses the single-sort resume.

    ``staged_chunk``: sublane rows per gated dense-visit chunk in the
    staged bounce kernels (``megakernel.visit_block_chunked``); None
    defaults to the ``RT_STAGED_CHUNK`` env knob, 0 disables.

    ``sample_group``: samples per MERGED bounce group (``_render_group``)
    when the staged scheduler is active and spp > 1; None defaults to
    the ``RT_SAMPLE_GROUP`` env knob, 1 disables merging.  Reduced to
    the largest divisor of spp at or below the requested size."""
    if staged_chunk is None:
        staged_chunk = _STAGED_CHUNK
    if sample_group is None:
        sample_group = _SAMPLE_GROUP
    grid = scene.accel
    xs_p, ys_p, n, np_rays = _pad_tiles(xs, ys)
    nt = np_rays // RAY_TILE
    mb = int(scene.max_bounces)
    staged_cap = capacity_tiles if (capacity_tiles is not None
                                    and capacity_tiles < nt
                                    and mb > 1) else None

    # scene bounds for morton quantization (any monotone map works;
    # block AABBs cover all real triangles)
    lo = [jnp.min(grid.aabb[c]) for c in range(3)]
    span = [jnp.maximum(jnp.max(grid.aabb[3 + c]) - lo[c], 1e-20)
            for c in range(3)]
    pix = jnp.arange(np_rays, dtype=jnp.int32)

    # the camera plan is sample-independent: build it ONCE and hand it
    # to every emit (otherwise each sample re-traces the O(nt x LS)
    # hull/slab/argsort build — duplicated spp times in the unrolled
    # graph, or left to while-loop LICM in the scan branch).  With a
    # binned candidate plan the superblock plan is dead — emit builds
    # dummies itself.
    plan = None if cand_plan is not None else _pad_plan_rows(
        *camera_tile_plan(scene.camera, xs_p, ys_p, grid, RAY_TILE))

    kw = dict(interpret=interpret, det_eps=det_eps, tmin=tmin,
              shadow_eps=shadow_eps, shadow_tmin=shadow_tmin,
              dialect=dialect, shadow_samples=shadow_samples)

    def resume_monolithic(op):
        """Single-sort path: one multi-bounce resume over all tiles."""
        st_s, rng_s, pix_s = op
        r, g, b = resume_tiles(scene, st_s, rng_s, **kw)
        # radiance back to pixel order: one more (cheap) 4-operand sort
        _, r2, g2, b2 = jax.lax.sort(
            (pix_s, r.reshape(np_rays), g.reshape(np_rays),
             b.reshape(np_rays)),
            dimension=0, num_keys=1,
        )
        return r2, g2, b2

    def _staged_loop(h_st, h_rng, h_pix, cap):
        return _staged_ladder(scene, h_st, h_rng, h_pix, cap, lo, span,
                              staged_chunk, mb, kw)

    def one_sample(s):
        st, rng = emit_tiles(scene, xs_p, ys_p, s, jitter=jitter,
                             plan=plan, cand_plan=cand_plan, **kw)
        if staged_cap is None:
            st_s, rng_s, pix_s = sort_bounce_state(st, rng, pix, lo, span)
            r2, g2, b2 = resume_monolithic((st_s, rng_s, pix_s))
        else:
            # Tile-gather compaction: the expensive reorder primitive is
            # the ~2M-row 16-operand sort (~20 ms at 1080p), yet every
            # alive ray lives in a handful of tiles.  Gather the alive
            # tiles (a tiny argsort + a cap-row gather), run the SAME
            # compaction sort on just that subset (~cap*RAY_TILE rows),
            # stage the bounces there, and scatter the subset's radiance
            # tiles over the emit-pass radiance at the end.  Bit-exact
            # vs the global sort: every alive ray gets the same packing
            # key and per-ray math never depends on ray placement (the
            # framework's ordering-invariance contract).
            cap = staged_cap
            stv = st.reshape(nt, _ST_ROWS, RAY_TILE)
            alive_t = jnp.any(stv[:, _ST_ALIVE_ROW] > 0.0, axis=1)  # (nt,)
            overflow = jnp.sum(alive_t.astype(jnp.int32)) > cap

            def global_path(op):
                st, rng = op
                return resume_monolithic(
                    sort_bounce_state(st, rng, pix, lo, span))

            def subset_path(op):
                st, rng = op
                iota_t = jnp.arange(nt, dtype=jnp.int32)
                key_t = jnp.where(alive_t, iota_t, iota_t + nt)
                # ascending tile ids so the post-loop pix sort lands the
                # subset's rows back in idx order
                idx = jnp.sort(jnp.argsort(key_t)[:cap])
                st_g = st.reshape(nt, _ST_ROWS * RAY_TILE)[idx].reshape(
                    cap * _ST_ROWS, RAY_TILE)
                rng_g = rng.reshape(nt, 8 * RAY_TILE)[idx].reshape(
                    cap * 8, RAY_TILE)
                pix_g = (
                    idx[:, None] * RAY_TILE
                    + jnp.arange(RAY_TILE, dtype=jnp.int32)[None, :]
                ).reshape(cap * RAY_TILE)
                h_st, h_rng, h_pix = sort_bounce_state(
                    st_g, rng_g, pix_g, lo, span)
                h_st, h_pix = _staged_loop(h_st, h_rng, h_pix, cap)
                fv = h_st.reshape(cap, _ST_ROWS, RAY_TILE)
                _, r_s, g_s, b_s = jax.lax.sort(
                    (h_pix,
                     fv[:, 9].reshape(cap * RAY_TILE),
                     fv[:, 10].reshape(cap * RAY_TILE),
                     fv[:, 11].reshape(cap * RAY_TILE)),
                    dimension=0, num_keys=1,
                )
                outs = []
                for row, sub in zip((9, 10, 11), (r_s, g_s, b_s)):
                    full = stv[:, row].at[idx].set(
                        sub.reshape(cap, RAY_TILE))
                    outs.append(full.reshape(np_rays))
                return tuple(outs)

            r2, g2, b2 = jax.lax.cond(
                overflow, global_path, subset_path, (st, rng))
        if dialect == "cpuonly":
            # no per-sample clamp in this dialect (clamped at PNG)
            return r2, g2, b2
        # per-sample clamp (query.h:219), same point in the op order as
        # the monolithic kernel's accumulation
        return (jnp.clip(r2, 0.0, 1.0), jnp.clip(g2, 0.0, 1.0),
                jnp.clip(b2, 0.0, 1.0))

    off = jnp.asarray(sample_offset, jnp.int32)

    group = 1
    if staged_cap is not None and spp > 1 and sample_group > 1:
        group = min(int(sample_group), spp)
        while spp % group:
            group -= 1
    if group > 1:
        def add_group(acc, s0g):
            r3 = _render_group(scene, xs_p, ys_p, plan, lo, span,
                               staged_cap, group, s0g, staged_chunk,
                               jitter, kw, cand_plan=cand_plan)
            # accumulate per sample IN ORDER: each pixel sees the same
            # addition sequence as the unmerged spp loop
            for j in range(group):
                sample = tuple(c[j] for c in r3)
                if dialect != "cpuonly":
                    sample = tuple(jnp.clip(c, 0.0, 1.0) for c in sample)
                acc = tuple(a + c for a, c in zip(acc, sample))
            return acc

        zeros3 = tuple(jnp.zeros(np_rays, jnp.float32) for _ in range(3))
        if spp == group:
            acc = add_group(zeros3, off)
        else:
            acc, _ = jax.lax.scan(
                lambda c, g: (add_group(c, off + g), None),
                zeros3, jnp.arange(0, spp, group, dtype=jnp.int32))
        return jnp.stack([a[:n] for a in acc], axis=1)  # (N, 3) sums

    if spp <= 4:
        acc = [jnp.zeros(np_rays, jnp.float32) for _ in range(3)]
        for s in range(spp):
            sample = one_sample(off + s)
            acc = [a + c for a, c in zip(acc, sample)]
    else:
        # one traced pipeline, scanned over samples (the HLO would
        # otherwise contain spp copies of emit/sort/resume)
        def step(carry, s):
            sample = one_sample(off + s)
            return tuple(a + c for a, c in zip(carry, sample)), None

        acc, _ = jax.lax.scan(
            step,
            tuple(jnp.zeros(np_rays, jnp.float32) for _ in range(3)),
            jnp.arange(spp, dtype=jnp.int32),
        )
    return jnp.stack([a[:n] for a in acc], axis=1)  # (N, 3) sums


@partial(jax.jit, static_argnames=("frames", "spp", "interpret", "det_eps",
                                   "tmin", "shadow_eps", "shadow_tmin",
                                   "dialect", "jitter", "shadow_samples",
                                   "capacity_tiles", "staged_chunk"))
def render_tiles_wavefront_frames(
    scene,
    xs: Array,
    ys: Array,
    frames: int,
    sample_offset=0,
    *,
    spp: int = 1,
    interpret: bool = False,
    det_eps: float = 1e-8,
    tmin: float = 1e-4,
    shadow_eps: float = 1e-3,
    shadow_tmin: float = 1e-4,
    dialect: str = "gpu",
    jitter: str = "wang",
    shadow_samples: int = 1,
    capacity_tiles: int | None = None,
    staged_chunk: int | None = None,
    cand_plan=None,
) -> Array:
    """``frames`` whole spp-1 frames in ONE dispatch with a merged
    bounce phase -> (frames, N, 3) per-frame radiance.

    The batched-serving form of the staged wavefront: frame f renders
    sample ``sample_offset + f * spp .. + spp - 1``, all frames' bounce
    wavefronts share ONE compaction sort + staged ladder per sample
    index (``_render_group``), amortizing the ladder's fixed costs and
    tightening bounce-tile hulls exactly like the reference's 32-sample
    register batching amortizes per-launch state
    (``GPUandCPU/include/query.cu:39-65``).  Each returned frame is the
    complete, independently-usable render for its sample offset —
    per-sample math identical to ``render_tiles_wavefront`` (see
    ``_render_group`` for the exact bit-equivalence contract).

    Requires a calibrated ``capacity_tiles`` (see
    ``auto_capacity_tiles``); spp must be 1 for now (the per-frame spp
    loop lives in the caller)."""
    if spp != 1:
        raise NotImplementedError("batched frames are spp-1 per frame")
    if staged_chunk is None:
        staged_chunk = _STAGED_CHUNK
    if capacity_tiles is None:
        raise ValueError("render_tiles_wavefront_frames requires a "
                         "calibrated capacity_tiles")
    grid = scene.accel
    xs_p, ys_p, n, np_rays = _pad_tiles(xs, ys)
    nt = np_rays // RAY_TILE
    cap = min(int(capacity_tiles), nt)

    lo = [jnp.min(grid.aabb[c]) for c in range(3)]
    span = [jnp.maximum(jnp.max(grid.aabb[3 + c]) - lo[c], 1e-20)
            for c in range(3)]
    plan = None if cand_plan is not None else _pad_plan_rows(
        *camera_tile_plan(scene.camera, xs_p, ys_p, grid, RAY_TILE))
    kw = dict(interpret=interpret, det_eps=det_eps, tmin=tmin,
              shadow_eps=shadow_eps, shadow_tmin=shadow_tmin,
              dialect=dialect, shadow_samples=shadow_samples)

    off = jnp.asarray(sample_offset, jnp.int32)
    r3 = _render_group(scene, xs_p, ys_p, plan, lo, span, cap, frames,
                       off, staged_chunk, jitter, kw, cand_plan=cand_plan)
    if dialect != "cpuonly":
        r3 = tuple(jnp.clip(c, 0.0, 1.0) for c in r3)
    return jnp.stack([c[:, :n] for c in r3], axis=2)  # (frames, N, 3)


@partial(jax.jit, static_argnames=("interpret", "det_eps", "tmin",
                                   "shadow_eps", "shadow_tmin",
                                   "dialect", "jitter", "shadow_samples"))
def _emit_alive_tiles(scene, xs_p, ys_p, **kw):
    st, _ = emit_tiles(scene, xs_p, ys_p, 0, **kw)
    stv = st.reshape(-1, _ST_ROWS, RAY_TILE)
    return jnp.sum(
        jnp.any(stv[:, _ST_ALIVE_ROW] > 0.0, axis=1).astype(jnp.int32))


# scene-identity -> calibrated staged capacity (None = don't stage).
# Correctness never depends on this cache: a stale/wrong capacity only
# flips the staged scheduler's lax.cond to the single-sort fallback.
_CAP_CACHE: dict = {}

# On-disk twin of _CAP_CACHE so repeated driver/bench runs skip the
# calibration emit dispatch (and, with a warm XLA compile cache, the
# emit kernel compile).  Keyed by the scene fingerprint below; same
# correctness story — a wrong capacity only costs the overflow cond.
_CAP_CACHE_DIR = _os.environ.get(
    "RT_CAP_CACHE", _os.path.join("/tmp", "rt_capacity_cache"))


def _disk_cache_load(key: str):
    """Return the cached value for ``key``, or the sentinel ``()``.

    One file per fingerprint (not one shared JSON): concurrent stores
    from different processes (bench + probe) are then commutative —
    each os.replace lands its own key, nothing is read-modify-written.
    """
    import json
    try:
        with open(_os.path.join(_CAP_CACHE_DIR, f"{key}.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return ()


def _disk_cache_store(key: str, value) -> None:
    import json
    try:
        _os.makedirs(_CAP_CACHE_DIR, exist_ok=True)
        path = _os.path.join(_CAP_CACHE_DIR, f"{key}.json")
        tmp = f"{path}.{_os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(value, f)
        _os.replace(tmp, path)
    except OSError:
        pass  # cache is best-effort


def _scene_fingerprint(scene, key) -> str:
    """Static scene identity for the on-disk capacity cache: the static
    key tuple plus a hash of the block-grid AABBs (geometry identity —
    cheap to fetch, and any geometry change that could shift the alive
    wavefront moves some block AABB)."""
    import hashlib
    h = hashlib.sha1(repr(key).encode())
    h.update(np.asarray(scene.accel.aabb).tobytes())
    return h.hexdigest()[:16]


def auto_capacity_tiles(scene, margin: float = 1.2, **kw) -> int | None:
    """Calibrate the staged scheduler's alive-wavefront capacity.

    One emit dispatch (host round trip) counts the tiles holding
    depth-0 survivors; the capacity is that count with ``margin``
    headroom, rounded up to a power of two (so compile caching works
    across scenes of similar occupancy).  Returns None when staging
    cannot help (alive wavefront ~ the whole frame, or the scene never
    bounces).  The result is cached per scene identity; jitter varies
    the survivor count only marginally between samples, and the staged
    path's overflow cond guarantees a correct image regardless.
    """
    if scene.accel is None or int(scene.max_bounces) <= 1:
        return None
    # key on static scene attributes (not object identity) so a cache
    # warmed by an eager render also serves the same scene traced
    # inside an outer jit (where the pytree is rebuilt from tracers);
    # a collision costs nothing but perf — the staged path's overflow
    # cond guarantees a correct image at any capacity
    key = (int(scene.camera.width), int(scene.camera.height),
           int(scene.geometry.padded_triangles), int(scene.max_bounces),
           int(scene.spp), scene.dialect)
    if key in _CAP_CACHE:
        return _CAP_CACHE[key]
    if isinstance(scene.accel.tri, jax.core.Tracer):
        # render_scene is being traced inside an outer jit (e.g. a
        # bench/serving loop): the calibration emit cannot dispatch
        # eagerly here.  Return None (single-sort resume) — callers
        # that want staging warm the cache with one eager render first.
        return None
    fp = _scene_fingerprint(scene, key)
    cached = _disk_cache_load(fp)
    if cached != ():
        _CAP_CACHE[key] = cached
        return cached
    from ..render.renderer import _swizzled_grid

    w, h = int(scene.camera.width), int(scene.camera.height)
    xs, ys, _ = _swizzled_grid(w, h)
    xs_p, ys_p, _, np_rays = _pad_tiles(xs, ys)
    nt = np_rays // RAY_TILE
    tiles = int(int(_emit_alive_tiles(scene, xs_p, ys_p, **kw)) * margin)
    cap = 8
    while cap < tiles:
        cap *= 2
    result = None if cap * 2 >= nt else cap
    _CAP_CACHE[key] = result
    _disk_cache_store(fp, result)
    return result
