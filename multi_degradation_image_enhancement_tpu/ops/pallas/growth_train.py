"""Pallas TPU kernels: trainable fused DenseBlock growth layer (custom VJP).

The serving DenseBlock kernels (``dense_block_cm.py``) are inference-only:
BN is folded to a per-channel affine and there is no backward.  Training
therefore runs the canonical Flax module, whose NHWC elementwise/conv work
at C ∈ {3..67} wastes up to 42/43 of every lane — the measured reason a
train step is ~14× slower per image than a serving step (PERF.md).

This module makes the hot piece of that path trainable:

    g = conv3x3_{c→16}( relu(x·a + b) )          (one DenseBlock layer)

as a channel-major Pallas kernel pair wrapped in ``jax.custom_vjp``.
``a, b`` are the *batch-stat* BatchNorm affine coefficients — computed by
XLA outside the kernel (they are cheap per-channel reductions), so Flax
BatchNorm semantics (biased batch variance, f32 stats, momentum-0.9 running
updates) stay exactly where autodiff can see them; the kernel only ever
sees an affine.

Forward: identical machinery to ``dense_block_cm._kernel2`` — features as
``[C, L]`` with channels on sublanes and flattened pixels on lanes, the
3×3 conv as three ``A_dx[48, c] @ v[c, L]`` matmuls whose dx taps are ±1
lane rolls of the *output* and dy taps ±W rolls of the combined rows.

Backward: one rolled tap-stack ``dgs[144, L]`` (rows (dy, dx, o) =
``roll(dg, (dy-1)·W + (dx-1))`` with W-edge masks) feeds BOTH gradients as
single big-K matmuls —

    dv[c, L]    = A_bwd[c, 144] @ dgs            (then dx = dv·1[z>0]·a)
    dA[144, c]  = dgs @ vᵀ                        (K = L: ideal MXU shape)

plus per-channel reductions for da/db.  dA/da/db accumulate across the
sequential TPU grid (one revisited output block).

Reference workload: the training loop over ``models/cdan.py:22-53``
DenseBlocks (``/root/reference/models/model.py:138-227``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import (
    _ceil16,
    _roll,
)

GROWTH = 16
HALO_ROWS = 2  # one 3×3 conv: support is ±(W+1) lanes; 2 rows cover it

# Backward working set is the planner's binding case (dgs + vs + dv + I/O).
_VMEM_TARGET_BYTES = 96 * 1024 * 1024
# Backward-pass planning target (see _bwd_call): the bwd kernel's real
# Mosaic stack runs ~2.3× the _plan_n per-lane estimate.
_VMEM_TARGET_BWD_BYTES = 40 * 1024 * 1024
# Hard scoped-VMEM cap passed to Mosaic (and the ceiling growth_supported
# gates against).  v5e VMEM is 128 MiB; 110 leaves headroom for the
# enclosing program's own double buffering.
_VMEM_LIMIT_BYTES = 110 * 1024 * 1024

# Forward growth layers at/below this padded width run as ONE K-stacked
# ``A[48, 3cp] @ [roll(v,+1)·m; v; roll(v,-1)·m]`` matmul instead of three
# K=cp taps — tiny-K taps run at ~cp/128 MXU utilisation (see
# dense_block_cm._K_STACK_MAX_CI; same rationale, same A/B gating).  The
# backward is already big-K (dv: K=144, dA: K=L) and is unchanged.
# Default 0 until benchmarks/profile_train.py A/Bs it on hardware.
_K_STACK_MAX_CI = 0


def pack_growth(kernel: jax.Array, c_pad: int) -> jax.Array:
    """HWIO ``[3, 3, c, 16]`` → ``[48, 3·c_pad]`` (rows (dy, o), col-blocks dx).

    Pure jnp so autodiff maps the packed-weight gradient back to HWIO.
    """
    _, _, c, _ = kernel.shape
    k = jnp.pad(kernel, ((0, 0), (0, 0), (0, c_pad - c), (0, 0)))
    return k.transpose(0, 3, 1, 2).reshape(3 * GROWTH, 3 * c_pad)


def _fwd_kernel(
    x_ref,  # [n, c, HW]
    a_ref,  # [cp, 1] f32
    b_ref,  # [cp, 1] f32
    A_ref,  # [48, 3cp] bf16
    bias_ref,  # [16, 1] f32
    out_ref,  # [n, 16, HW]
    vs,  # scratch [cp, n*l_img] bf16 — inside-masked ReLU activations
    *,
    c_in: int,
    c0p: int,
    w_img: int,
    halo: int,
    hw: int,
    l_img: int,
    n_img: int,
    out_dtype,
    k_stack: bool,
    interpret: bool,
):
    L = n_img * l_img
    q = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    col = q % w_img
    has_next = jnp.where(col == w_img - 1, 0.0, 1.0)
    has_prev = jnp.where(col == 0, 0.0, 1.0)

    # v = relu(x·a + b), zero outside image interiors (exact SAME padding).
    vs[...] = jnp.zeros((c0p, L), jnp.bfloat16)
    for j in range(n_img):
        z = (
            x_ref[j].astype(jnp.float32) * a_ref[0:c_in, :] + b_ref[0:c_in, :]
        )
        vs[0:c_in, j * l_img + halo : j * l_img + halo + hw] = jnp.maximum(
            z, 0.0
        ).astype(jnp.bfloat16)

    v = vs[...]

    if k_stack:
        # K-stacked tiny-K form (lane rolls are 32-bit only, so the bf16
        # activations round-trip through f32 for the ±1 rolls — numerically
        # identical to rolling the matmul output of the same bf16 v).
        vf = v.astype(jnp.float32)
        stack = jnp.concatenate(
            [
                _roll(vf, 1, interpret=interpret) * has_prev,
                vf,
                _roll(vf, -1, interpret=interpret) * has_next,
            ],
            axis=0,
        ).astype(jnp.bfloat16)
        u = jax.lax.dot_general(
            A_ref[:],
            stack,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [48, L]
    else:

        # dy-combine first per dx block (see dense_block_cm._kernel): the
        # W-periodic column masks commute with ±W rolls, so the dx roll+mask
        # runs on [16,L] instead of [48,L].
        def tap_dy(blk):
            t = jax.lax.dot_general(
                A_ref[:, blk * c0p : (blk + 1) * c0p],
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [48, L]
            return (
                _roll(t[0:GROWTH, :], w_img, interpret=interpret)
                + t[GROWTH : 2 * GROWTH, :]
                + _roll(t[2 * GROWTH : 3 * GROWTH, :], -w_img, interpret=interpret)
            )

        gd = tap_dy(1)
        gd = gd + _roll(tap_dy(0), 1, interpret=interpret) * has_prev
        gd = gd + _roll(tap_dy(2), -1, interpret=interpret) * has_next
        g = (gd + bias_ref[:]).astype(out_dtype)
        for j in range(n_img):
            out_ref[j, :, :] = g[:, j * l_img + halo : j * l_img + halo + hw]
        return
    g = (
        _roll(u[0:GROWTH, :], w_img, interpret=interpret)
        + u[GROWTH : 2 * GROWTH, :]
        + _roll(u[2 * GROWTH : 3 * GROWTH, :], -w_img, interpret=interpret)
    ) + bias_ref[:]
    g = g.astype(out_dtype)
    for j in range(n_img):
        out_ref[j, :, :] = g[:, j * l_img + halo : j * l_img + halo + hw]


def _bwd_kernel(
    x_ref,  # [n, c, HW]
    dg_ref,  # [n, 16, HW]
    a_ref,  # [cp, 1] f32
    b_ref,  # [cp, 1] f32
    Ab_ref,  # [cp, 144] bf16 — backward-packed weights
    dx_ref,  # [n, c, HW] out
    dA_ref,  # [144, cp] f32 out, accumulated across grid
    da_ref,  # [cp, 1] f32 out, accumulated
    db_ref,  # [cp, 1] f32 out, accumulated
    vs,  # scratch [cp, L] bf16
    dgs,  # scratch [144, L] bf16
    dgps,  # scratch [16, L] f32 — halo-packed incoming gradient
    *,
    c_in: int,
    c0p: int,
    w_img: int,
    halo: int,
    hw: int,
    l_img: int,
    n_img: int,
    out_dtype,
    interpret: bool,
):
    L = n_img * l_img
    q = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    col = q % w_img
    has_next = jnp.where(col == w_img - 1, 0.0, 1.0)
    has_prev = jnp.where(col == 0, 0.0, 1.0)
    ones = jnp.ones((1, L), jnp.float32)

    # Recompute v (cheap; x is the saved residual).
    vs[...] = jnp.zeros((c0p, L), jnp.bfloat16)
    for j in range(n_img):
        z = (
            x_ref[j].astype(jnp.float32) * a_ref[0:c_in, :] + b_ref[0:c_in, :]
        )
        vs[0:c_in, j * l_img + halo : j * l_img + halo + hw] = jnp.maximum(
            z, 0.0
        ).astype(jnp.bfloat16)

    # dg packed with zero halos, f32 for the lane rolls.  Built in a
    # scratch ref with *static* slice writes — a functional
    # ``lax.dynamic_update_slice`` does not lower in Mosaic (TC kernels),
    # even with constant start indices.
    dgps[...] = jnp.zeros((GROWTH, L), jnp.float32)
    for j in range(n_img):
        dgps[:, j * l_img + halo : j * l_img + halo + hw] = dg_ref[j].astype(
            jnp.float32
        )
    dgp = dgps[...]

    # dgs rows (i, j, o): roll(dg, (i-1)·W + (j-1)) with the dx mask applied
    # at the destination (j=0 ⇒ has_next, j=2 ⇒ has_prev — the W-periodic
    # image of the forward's source-side mask).
    masks = (has_next, ones, has_prev)
    for i in range(3):
        for jj in range(3):
            s = (i - 1) * w_img + (jj - 1)
            blk = (i * 3 + jj) * GROWTH
            dgs[blk : blk + GROWTH, :] = (
                _roll(dgp, s, interpret=interpret) * masks[jj]
            ).astype(jnp.bfloat16)

    dgs_all = dgs[...]
    v = vs[...]

    # dv = A_bwd @ dgs  (K = 144)
    dv = jax.lax.dot_general(
        Ab_ref[:],
        dgs_all,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [cp, L]
    # vs > 0 ⟺ z > 0 ∧ inside.  Compare in f32: Mosaic on v5e cannot lower
    # a bf16 vector compare (arith.cmpf on vector<..xbf16> → "Target does
    # not support this comparison").
    m = (v.astype(jnp.float32) > 0).astype(jnp.float32)
    dvm = dv * m
    dx_full = dvm * a_ref[:]

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dA_ref[...] = jnp.zeros_like(dA_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    # dA[144, cp] += dgs @ vᵀ  (K = L: the MXU-friendly contraction)
    dA_ref[...] += jax.lax.dot_general(
        dgs_all,
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_ref[...] += jnp.sum(dvm, axis=1, keepdims=True)

    da = jnp.zeros((c_in, 1), jnp.float32)
    for j in range(n_img):
        sl = dvm[0:c_in, j * l_img + halo : j * l_img + halo + hw]
        da = da + jnp.sum(
            sl * x_ref[j].astype(jnp.float32), axis=1, keepdims=True
        )
        dx_ref[j, :, :] = dx_full[
            0:c_in, j * l_img + halo : j * l_img + halo + hw
        ].astype(out_dtype)
    da_ref[0:c_in, :] += da


def _fwd_kernel_tiled(
    x_ref,  # [1, 1, c, l_tile] — halo'd row-tile, REAL neighbour rows
    a_ref,  # [cp, 1] f32
    b_ref,  # [cp, 1] f32
    A_ref,  # [48, 3cp] bf16
    bias_ref,  # [16, 1] f32
    out_ref,  # [1, 16, rows*W]
    vs,  # scratch [cp, l_tile] bf16
    *,
    c_in: int,
    c0p: int,
    w_img: int,
    h_img: int,
    rows: int,
    out_dtype,
    interpret: bool,
):
    """Row-tiled forward: one tile of ``rows`` image rows plus HALO_ROWS real
    rows per side (zero-padded by XLA at the image top/bottom).  Lane rolls
    that wrap around the tile edge only ever pollute halo-row outputs, which
    the interior slice discards — so no zero-lane halos are needed."""
    t = pl.program_id(1)
    L = (rows + 2 * HALO_ROWS) * w_img
    q = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    col = q % w_img
    has_next = jnp.where(col == w_img - 1, 0.0, 1.0)
    has_prev = jnp.where(col == 0, 0.0, 1.0)
    # global image row of each lane; SAME zero padding = v forced to 0 there
    grow = q // w_img + t * rows - HALO_ROWS
    inside = jnp.where((grow >= 0) & (grow < h_img), 1.0, 0.0)

    z = x_ref[0, 0].astype(jnp.float32) * a_ref[0:c_in, :] + b_ref[0:c_in, :]
    vs[...] = jnp.zeros((c0p, L), jnp.bfloat16)
    vs[0:c_in, :] = (jnp.maximum(z, 0.0) * inside).astype(jnp.bfloat16)
    v = vs[...]

    def tap_dy(blk):
        tt = jax.lax.dot_general(
            A_ref[:, blk * c0p : (blk + 1) * c0p],
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (
            _roll(tt[0:GROWTH, :], w_img, interpret=interpret)
            + tt[GROWTH : 2 * GROWTH, :]
            + _roll(tt[2 * GROWTH : 3 * GROWTH, :], -w_img, interpret=interpret)
        )

    gd = tap_dy(1)
    gd = gd + _roll(tap_dy(0), 1, interpret=interpret) * has_prev
    gd = gd + _roll(tap_dy(2), -1, interpret=interpret) * has_next
    g = (gd + bias_ref[:]).astype(out_dtype)
    halo = HALO_ROWS * w_img
    out_ref[0, :, :] = g[:, halo : halo + rows * w_img]


def _bwd_kernel_tiled(
    x_ref,  # [1, 1, c, l_tile]
    dg_ref,  # [1, 1, 16, l_tile] — halo'd incoming gradient (0 past edges)
    a_ref,  # [cp, 1] f32
    b_ref,  # [cp, 1] f32
    Ab_ref,  # [cp, 144] bf16
    dx_ref,  # [1, c, rows*W] out
    dA_ref,  # [144, cp] f32 out, accumulated across the whole grid
    da_ref,  # [cp, 1] f32 out, accumulated
    db_ref,  # [cp, 1] f32 out, accumulated
    vs,  # scratch [cp, l_tile] bf16
    dgs,  # scratch [144, l_tile] bf16
    *,
    c_in: int,
    c0p: int,
    w_img: int,
    h_img: int,
    rows: int,
    out_dtype,
    interpret: bool,
):
    """Row-tiled backward.  dx at a tile's interior rows needs dg from ±1
    row (inside the 2-row halo), so interior dv is complete; halo-row dv is
    incomplete AND wrap-polluted, so every output (dx/dA/da/db) is masked to
    the tile interior — tile interiors partition the image, giving each
    pixel's contribution exactly once across the grid."""
    t = pl.program_id(1)
    L = (rows + 2 * HALO_ROWS) * w_img
    q = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    col = q % w_img
    has_next = jnp.where(col == w_img - 1, 0.0, 1.0)
    has_prev = jnp.where(col == 0, 0.0, 1.0)
    halo = HALO_ROWS * w_img
    interior = jnp.where((q >= halo) & (q < halo + rows * w_img), 1.0, 0.0)
    grow = q // w_img + t * rows - HALO_ROWS
    inside = jnp.where((grow >= 0) & (grow < h_img), 1.0, 0.0)

    z = x_ref[0, 0].astype(jnp.float32) * a_ref[0:c_in, :] + b_ref[0:c_in, :]
    vs[...] = jnp.zeros((c0p, L), jnp.bfloat16)
    vs[0:c_in, :] = (jnp.maximum(z, 0.0) * inside).astype(jnp.bfloat16)

    dgp = dg_ref[0, 0].astype(jnp.float32)  # [16, L]
    ones = jnp.ones((1, L), jnp.float32)
    masks = (has_next, ones, has_prev)
    for i in range(3):
        for jj in range(3):
            s = (i - 1) * w_img + (jj - 1)
            blk = (i * 3 + jj) * GROWTH
            dgs[blk : blk + GROWTH, :] = (
                _roll(dgp, s, interpret=interpret) * masks[jj]
            ).astype(jnp.bfloat16)

    dgs_all = dgs[...]
    v = vs[...]

    dv = jax.lax.dot_general(
        Ab_ref[:],
        dgs_all,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m = (v.astype(jnp.float32) > 0).astype(jnp.float32)
    dvm = dv * m
    dvi = dvm * interior

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dA_ref[...] = jnp.zeros_like(dA_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    # dA contracts the lane axis of dgs and v at the SAME pixel, so masking
    # either factor restricts the sum to interior pixels; v is 1 row vs 9.
    vi = (v.astype(jnp.float32) * interior).astype(jnp.bfloat16)
    dA_ref[...] += jax.lax.dot_general(
        dgs_all,
        vi,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_ref[...] += jnp.sum(dvi, axis=1, keepdims=True)
    da_ref[0:c_in, :] += jnp.sum(
        dvi[0:c_in, :] * x_ref[0, 0].astype(jnp.float32), axis=1, keepdims=True
    )
    dx_ref[0, :, :] = (dvm * a_ref[:])[
        0:c_in, halo : halo + rows * w_img
    ].astype(out_dtype)


def _tile_halod(arr_cm: jax.Array, h: int, w: int, rows: int) -> jax.Array:
    """``[B, C, HW]`` → ``[B, T, C, (rows+2·HALO)·W]`` overlapping row-tiles.

    Real neighbour rows fill the halos (zeros past the image edges), so the
    kernels' lane rolls see exactly the SAME-padding context.  XLA runs this
    as pad+strided-gather at bandwidth speed; HBM duplication is
    ``(rows+4)/rows``.
    """
    B, C, _ = arr_cm.shape
    x4 = arr_cm.reshape(B, C, h, w)
    xp = jnp.pad(x4, ((0, 0), (0, 0), (HALO_ROWS, HALO_ROWS), (0, 0)))
    T = h // rows
    tiles = jnp.stack(
        [xp[:, :, t * rows : t * rows + rows + 2 * HALO_ROWS] for t in range(T)],
        axis=1,
    )
    return tiles.reshape(B, T, C, (rows + 2 * HALO_ROWS) * w)


def _bwd_bytes(c_in: int, w_img: int, lanes: int, itemsize: int, out_lanes: int) -> int:
    """Backward scoped-VMEM model for a block of ``lanes`` total lanes
    (windows double-buffered + scratch + ~4 live f32[cp, L] Mosaic stack;
    calibration: c=51@256² bf16 whole-image → model 129.6 MiB vs the
    compiler's reported 123.27 MiB)."""
    cp = _ceil16(c_in)
    windows = 2 * itemsize * (c_in * lanes + GROWTH * lanes + c_in * out_lanes)
    scratch = lanes * (2 * cp + 2 * 144 + 4 * GROWTH)
    stack = 4 * 4 * cp * lanes
    return windows + scratch + stack


def _fwd_bytes(c_in: int, w_img: int, lanes: int, itemsize: int, out_lanes: int) -> int:
    """Forward model: x window + g output + vs scratch + ~3 live f32[48, L]
    tap transients and one f32[cp, L].  (``w_img`` unused; uniform call.)"""
    cp = _ceil16(c_in)
    windows = 2 * itemsize * (c_in * lanes + GROWTH * out_lanes)
    scratch = lanes * 2 * cp
    stack = (3 * 4 * 3 * GROWTH + 4 * cp) * lanes
    return windows + scratch + stack


def _mode_rows(h_img: int, w_img: int, c_in: int, itemsize: int, forward: bool) -> int:
    """0 = whole-image mode fits; R>0 = largest row-tile that fits;
    -1 = nothing fits (no divisor of H small enough)."""
    hw = h_img * w_img
    l_img = hw + 2 * HALO_ROWS * w_img
    fits = _fwd_bytes if forward else _bwd_bytes
    if fits(c_in, w_img, l_img, itemsize, hw) <= _VMEM_LIMIT_BYTES:
        return 0
    for rows in range(h_img // 2, 0, -1):
        if h_img % rows:
            continue
        lt = (rows + 2 * HALO_ROWS) * w_img
        if fits(c_in, w_img, lt, itemsize, rows * w_img) <= _VMEM_LIMIT_BYTES:
            return rows
    return -1


def _plan_n(
    b: int,
    c_in: int,
    hw: int,
    l_img: int,
    stack_bytes: int = 0,
    target_bytes: int = 0,
) -> int:
    """Images per grid step so the backward working set fits VMEM."""
    cp = _ceil16(c_in)
    bytes_per_lane = (
        2 * cp  # vs
        + 2 * 144  # dgs
        + 4 * cp  # dv transient
        + 4 * 48  # fwd tap transients (fwd bound is looser; keep one budget)
        + stack_bytes  # f32 K-stack transient (stacked forward only)
        + (2 * 2 * c_in + 2 * 2 * GROWTH) * hw // l_img  # x/dx/dg/out blocks
    )
    l_max = (target_bytes or _VMEM_TARGET_BYTES) // bytes_per_lane
    n = 1
    for cand in range(min(max(l_max // l_img, 1), b), 0, -1):
        if b % cand == 0:
            n = cand
            break
    return n


def growth_supported(h_img: int, w_img: int, c_in: int, itemsize: int = 2) -> bool:
    """Whether forward AND backward have a compilable mode at this shape.

    The binding constraint is each pallas_call's total scoped VMEM —
    Mosaic refuses to compile past ``vmem_limit_bytes`` (``Scoped
    allocation ... exceeded scoped vmem limit``), so an optimistic gate
    crashes the whole train-step compile instead of falling back.  Each
    pass independently picks whole-image packing or row-tiling
    (:func:`_mode_rows`; backward model calibrated against the compiler's
    own report for ``c_in=51 @ 256×256`` bf16 — measured 123.27 MiB, model
    129.6 MiB, ~5% conservative).  ``itemsize`` is the DB input's dtype
    size: f32 in training (train-mode BN runs f32), bf16 in eval.  With
    row-tiling available this only returns False when no divisor of H
    yields a small-enough tile (pathological W·c)."""
    return (
        _mode_rows(h_img, w_img, c_in, itemsize, forward=True) >= 0
        and _mode_rows(h_img, w_img, c_in, itemsize, forward=False) >= 0
    )


# Test hook: force the row-tiled path at this tile height (None = auto).
_FORCE_TILE_ROWS = None


@functools.partial(
    jax.jit, static_argnames=("c_in", "hw_shape", "k_stack", "interpret")
)
def _fwd_call(x_cm, a, b, A_pack, bias, *, c_in, hw_shape, k_stack, interpret):
    bsz, _, hw = x_cm.shape
    h_img, w_img = hw_shape
    halo = HALO_ROWS * w_img
    l_img = hw + 2 * halo
    c0p = _ceil16(c_in)
    rows = _FORCE_TILE_ROWS or _mode_rows(
        h_img, w_img, c_in, jnp.dtype(x_cm.dtype).itemsize, forward=True
    )
    if rows > 0:
        return _fwd_call_tiled(
            x_cm, a, b, A_pack, bias,
            c_in=c_in, hw_shape=hw_shape, rows=rows, interpret=interpret,
        )
    # The f32 tap-stack transient adds 4·3·c0p bytes/lane; degrade to the
    # unstacked form rather than exceed the VMEM target on one image.
    if k_stack and l_img * (4 * 3 * c0p) > _VMEM_TARGET_BYTES // 2:
        k_stack = False
    n = _plan_n(bsz, c_in, hw, l_img, stack_bytes=4 * 3 * c0p if k_stack else 0)
    g = bsz // n

    a2 = jnp.pad(a.astype(jnp.float32), (0, c0p - c_in))[:, None]
    b2 = jnp.pad(b.astype(jnp.float32), (0, c0p - c_in))[:, None]
    A2 = A_pack.astype(jnp.bfloat16)
    bias2 = bias.astype(jnp.float32)[:, None]

    kernel = functools.partial(
        _fwd_kernel,
        c_in=c_in,
        c0p=c0p,
        w_img=w_img,
        halo=halo,
        hw=hw,
        l_img=l_img,
        n_img=n,
        out_dtype=x_cm.dtype,
        k_stack=k_stack,
        interpret=interpret,
    )
    const2 = lambda i: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((n, c_in, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(a2.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(A2.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(bias2.shape, const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n, GROWTH, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, GROWTH, hw), x_cm.dtype),
        scratch_shapes=[pltpu.VMEM((c0p, n * l_img), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(x_cm, a2, b2, A2, bias2)
    return out


@functools.partial(
    jax.jit, static_argnames=("c_in", "hw_shape", "rows", "interpret")
)
def _fwd_call_tiled(x_cm, a, b, A_pack, bias, *, c_in, hw_shape, rows, interpret):
    bsz, _, hw = x_cm.shape
    h_img, w_img = hw_shape
    c0p = _ceil16(c_in)
    T = h_img // rows
    l_tile = (rows + 2 * HALO_ROWS) * w_img

    a2 = jnp.pad(a.astype(jnp.float32), (0, c0p - c_in))[:, None]
    b2 = jnp.pad(b.astype(jnp.float32), (0, c0p - c_in))[:, None]
    A2 = A_pack.astype(jnp.bfloat16)
    bias2 = bias.astype(jnp.float32)[:, None]
    x_t = _tile_halod(x_cm, h_img, w_img, rows)

    kernel = functools.partial(
        _fwd_kernel_tiled,
        c_in=c_in,
        c0p=c0p,
        w_img=w_img,
        h_img=h_img,
        rows=rows,
        out_dtype=x_cm.dtype,
        interpret=interpret,
    )
    const2 = lambda i, t: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, T),
        in_specs=[
            pl.BlockSpec(
                (1, 1, c_in, l_tile), lambda i, t: (i, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(a2.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(A2.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(bias2.shape, const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, GROWTH, rows * w_img), lambda i, t: (i, 0, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, GROWTH, hw), x_cm.dtype),
        scratch_shapes=[pltpu.VMEM((c0p, l_tile), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(x_t, a2, b2, A2, bias2)
    return out


@functools.partial(
    jax.jit, static_argnames=("c_in", "hw_shape", "rows", "interpret")
)
def _bwd_call_tiled(x_cm, dg, a, b, A_pack, *, c_in, hw_shape, rows, interpret):
    bsz, _, hw = x_cm.shape
    h_img, w_img = hw_shape
    c0p = _ceil16(c_in)
    T = h_img // rows
    l_tile = (rows + 2 * HALO_ROWS) * w_img

    a2 = jnp.pad(a.astype(jnp.float32), (0, c0p - c_in))[:, None]
    b2 = jnp.pad(b.astype(jnp.float32), (0, c0p - c_in))[:, None]
    Ab = (
        A_pack.reshape(3, GROWTH, 3, c0p)
        .transpose(3, 0, 2, 1)
        .reshape(c0p, 9 * GROWTH)
        .astype(jnp.bfloat16)
    )
    x_t = _tile_halod(x_cm, h_img, w_img, rows)
    dg_t = _tile_halod(dg, h_img, w_img, rows)

    kernel = functools.partial(
        _bwd_kernel_tiled,
        c_in=c_in,
        c0p=c0p,
        w_img=w_img,
        h_img=h_img,
        rows=rows,
        out_dtype=x_cm.dtype,
        interpret=interpret,
    )
    const2 = lambda i, t: (0, 0)
    dx, dA_all, da, db = pl.pallas_call(
        kernel,
        grid=(bsz, T),
        in_specs=[
            pl.BlockSpec(
                (1, 1, c_in, l_tile), lambda i, t: (i, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, GROWTH, l_tile), lambda i, t: (i, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(a2.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(Ab.shape, const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, c_in, rows * w_img), lambda i, t: (i, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9 * GROWTH, c0p), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c0p, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c0p, 1), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c_in, hw), x_cm.dtype),
            jax.ShapeDtypeStruct((9 * GROWTH, c0p), jnp.float32),
            jax.ShapeDtypeStruct((c0p, 1), jnp.float32),
            jax.ShapeDtypeStruct((c0p, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c0p, l_tile), jnp.bfloat16),
            pltpu.VMEM((9 * GROWTH, l_tile), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(x_t, dg_t, a2, b2, Ab)

    dA_pack = (
        dA_all.reshape(3, 3, GROWTH, c0p)
        .transpose(0, 2, 1, 3)
        .reshape(3 * GROWTH, 3 * c0p)
    )
    return dx, dA_pack, da[0:c_in, 0], db[0:c_in, 0]


@functools.partial(
    jax.jit, static_argnames=("c_in", "hw_shape", "interpret")
)
def _bwd_call(x_cm, dg, a, b, A_pack, *, c_in, hw_shape, interpret):
    bsz, _, hw = x_cm.shape
    h_img, w_img = hw_shape
    halo = HALO_ROWS * w_img
    l_img = hw + 2 * halo
    c0p = _ceil16(c_in)
    rows = _FORCE_TILE_ROWS or _mode_rows(
        h_img, w_img, c_in, jnp.dtype(x_cm.dtype).itemsize, forward=False
    )
    if rows > 0:
        return _bwd_call_tiled(
            x_cm, dg, a, b, A_pack,
            c_in=c_in, hw_shape=hw_shape, rows=rows, interpret=interpret,
        )
    # The backward plans against a much smaller target than the per-lane
    # estimate suggests: Mosaic's measured scoped-stack usage runs ~2.3×
    # the estimate (the dv→mask→dvm→dx chain keeps several [cp, L] f32
    # transients live, plus double-buffered blocks) — dense3 @b16·32×48
    # planned at 96 MiB compiled to a 120 MiB stack and OOM'd the 110 MiB
    # cap.  stack_bytes covers the dgps f32 packing scratch.
    n = _plan_n(
        bsz, c_in, hw, l_img, stack_bytes=4 * GROWTH,
        target_bytes=_VMEM_TARGET_BWD_BYTES,
    )
    g = bsz // n

    a2 = jnp.pad(a.astype(jnp.float32), (0, c0p - c_in))[:, None]
    b2 = jnp.pad(b.astype(jnp.float32), (0, c0p - c_in))[:, None]
    # A_bwd[c, (i,j,o)] = A_pack[(i, o), (j, c)]
    Ab = (
        A_pack.reshape(3, GROWTH, 3, c0p)
        .transpose(3, 0, 2, 1)
        .reshape(c0p, 9 * GROWTH)
        .astype(jnp.bfloat16)
    )

    kernel = functools.partial(
        _bwd_kernel,
        c_in=c_in,
        c0p=c0p,
        w_img=w_img,
        halo=halo,
        hw=hw,
        l_img=l_img,
        n_img=n,
        out_dtype=x_cm.dtype,
        interpret=interpret,
    )
    const2 = lambda i: (0, 0)
    dx, dA_all, da, db = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((n, c_in, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, GROWTH, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(a2.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, const2, memory_space=pltpu.VMEM),
            pl.BlockSpec(Ab.shape, const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, c_in, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * GROWTH, c0p), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c0p, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((c0p, 1), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c_in, hw), x_cm.dtype),
            jax.ShapeDtypeStruct((9 * GROWTH, c0p), jnp.float32),
            jax.ShapeDtypeStruct((c0p, 1), jnp.float32),
            jax.ShapeDtypeStruct((c0p, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c0p, n * l_img), jnp.bfloat16),
            pltpu.VMEM((9 * GROWTH, n * l_img), jnp.bfloat16),
            pltpu.VMEM((GROWTH, n * l_img), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(x_cm, dg, a2, b2, Ab)

    # dA back to the forward packing [48, 3cp]: rows (i,j,o) → [(i,o),(j,c)]
    dA_pack = (
        dA_all.reshape(3, 3, GROWTH, c0p)
        .transpose(0, 2, 1, 3)
        .reshape(3 * GROWTH, 3 * c0p)
    )
    da_out = da[0:c_in, 0]
    db_out = db[0:c_in, 0]
    return dx, dA_pack, da_out, db_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def growth_layer_cm(x_cm, a, b, A_pack, bias, c_in, hw_shape, interpret=False):
    """Fused ``conv3x3_{c→16}(relu(x·a+b))`` on channel-major ``[B, c, HW]``.

    ``a, b``: per-channel affine (batch-stat BN), f32 ``[c]``.
    ``A_pack``: :func:`pack_growth` output ``[48, 3·ceil16(c)]``.
    Returns ``[B, 16, HW]`` in ``x_cm.dtype``.  Differentiable in
    ``x_cm, a, b, A_pack, bias`` via hand-written Pallas backward.

    The forward's tap form follows ``_K_STACK_MAX_CI`` (read at trace
    time — benches that patch it must build fresh jitted callers).
    """
    return _fwd_call(
        x_cm, a, b, A_pack, bias, c_in=c_in, hw_shape=hw_shape,
        k_stack=_ceil16(c_in) <= _K_STACK_MAX_CI, interpret=interpret,
    )


def _vjp_fwd(x_cm, a, b, A_pack, bias, c_in, hw_shape, interpret):
    g = _fwd_call(
        x_cm, a, b, A_pack, bias, c_in=c_in, hw_shape=hw_shape,
        k_stack=_ceil16(c_in) <= _K_STACK_MAX_CI, interpret=interpret,
    )
    return g, (x_cm, a, b, A_pack, bias)


def _vjp_bwd(c_in, hw_shape, interpret, res, dg):
    x_cm, a, b, A_pack, bias = res
    dx, dA_pack, da, db = _bwd_call(
        x_cm, dg, a, b, A_pack, c_in=c_in, hw_shape=hw_shape, interpret=interpret
    )
    dbias = jnp.sum(dg.astype(jnp.float32), axis=(0, 2))
    return (
        dx,
        da.astype(a.dtype),
        db.astype(b.dtype),
        dA_pack.astype(A_pack.dtype),
        dbias.astype(bias.dtype),
    )


growth_layer_cm.defvjp(_vjp_fwd, _vjp_bwd)
