"""Pallas TPU kernel: channel-major fused 3×3 conv + folded-BN + ReLU.

The single-layer sibling of ``dense_block_cm._kernel2`` for CDAN's
ConvBlocks and decoder convs (reference ``models/cdan.py:8-19,100-159``):
one 3×3 SAME conv with the inference BatchNorm folded into kernel/bias,
then ReLU — computed entirely in channel-major ``[B, C, H·W]`` layout so a
chain of these kernels (and the DenseBlock kernels) never leaves CM and
never pays an NHWC boundary transpose.

Same machinery as the DenseBlock kernel: per-dx-tap matmuls
``A_dx[3·c_out, c_in] @ x[c_in, L]`` with the 16-wide-friendly M-axis
(rows are (dy, out_channel)), dx as ±1 lane rolls of the matmul output with
image-edge masks, dy as ±W rolls of the combined rows.  Packed whole-image
blocking with a 1-row zero halo per side (single conv ⇒ 1-pixel support).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block_cm import (
    _ceil16,
    _roll,
)

_VMEM_TARGET_BYTES = 64 * 1024 * 1024


def pack_conv(kernel: jax.Array, bias: jax.Array) -> Dict[str, jax.Array]:
    """Pack an HWIO 3×3 kernel (+bias) for the CM conv kernel.

    ``kernel`` is the BN-folded conv weight ``[3, 3, c_in, c_out]``; rows of
    the packed matrix are (dy, out_channel), column blocks are the dx taps.
    """
    _, _, c_in, c_out = kernel.shape
    c_outp = _ceil16(c_out)
    k = jnp.pad(kernel, ((0, 0), (0, 0), (0, 0), (0, c_outp - c_out)))
    a = k.transpose(0, 3, 1, 2).reshape(3 * c_outp, 3 * c_in).astype(jnp.bfloat16)
    b = jnp.pad(bias, (0, c_outp - c_out))[:, None].astype(jnp.float32)
    return {"A": a, "bias": b}


def _kernel(
    x_ref,  # [n, c_in, HW]
    a_ref,  # [1, 3*c_h, 3*c_in] (this split's row block)
    b_ref,  # [1, c_h, 1]
    out_ref,  # [n, c_h, HW] (this split's channel block)
    xpad,  # scratch [c_in, n*l_img] f32 (rolled — Mosaic lane rotate is f32)
    x3,  # scratch [3*c_in, n*l_img] bf16 (dx-tap stack)
    *,
    c_in: int,
    c_outp: int,
    w_img: int,
    hw: int,
    l_img: int,
    n_img: int,
    relu: bool,
    out_dtype,
    interpret: bool,
):
    """Input-side dx taps: the stack x3 = [roll(x,+1)·mask; x; roll(x,−1)·mask]
    turns the 3×3 conv into ONE matmul ``A[3c_h, 3c_in] @ x3[3c_in, L]`` (dy
    rides the M axis, combined by two ±W lane rolls of c_h rows).  Versus the
    original output-side dx formulation (three K=c_in matmuls + rolls/masks
    on [3c_h, L] f32), the per-lane VPU work drops from ~6·3c_out rows to
    ~4·c_in + 4·c_h rows and the matmul K widens 3× — measured 2,944 →
    (see PERF.md round 3) at the serving shape."""
    L = n_img * l_img
    halo = w_img
    q = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    col = q % w_img
    has_next = jnp.where(col == w_img - 1, 0.0, 1.0)
    has_prev = jnp.where(col == 0, 0.0, 1.0)

    # The halo'd input + tap stack are shared by every c_out split of this
    # image block (the split axis is the innermost grid dim) — build once.
    @pl.when(pl.program_id(1) == 0)
    def _build():
        xpad[:, :] = jnp.zeros((c_in, L), jnp.float32)
        for j in range(n_img):
            xpad[:, j * l_img + halo : j * l_img + halo + hw] = x_ref[j].astype(
                jnp.float32
            )
        v = xpad[:, :]
        x3[0:c_in, :] = (_roll(v, 1, interpret=interpret) * has_prev).astype(jnp.bfloat16)
        x3[c_in : 2 * c_in, :] = v.astype(jnp.bfloat16)
        x3[2 * c_in :, :] = (_roll(v, -1, interpret=interpret) * has_next).astype(
            jnp.bfloat16
        )

    u = jax.lax.dot_general(
        a_ref[0],
        x3[:, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [3*c_h, L]
    g = (
        _roll(u[0:c_outp, :], w_img, interpret=interpret)
        + u[c_outp : 2 * c_outp, :]
        + _roll(u[2 * c_outp : 3 * c_outp, :], -w_img, interpret=interpret)
    )
    y = g + b_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y.astype(out_dtype)
    for j in range(n_img):
        out_ref[j, :, :] = y[:, j * l_img + halo : j * l_img + halo + hw]


def _bytes_per_lane(c_in: int, c_h: int, c_outp: int, hw: int, l_img: int) -> int:
    # xpad f32 + x3 stack bf16 + U/g f32 [3c_h]/[c_h] + in/out HBM blocks
    return 4 * c_in + 2 * 3 * c_in + 4 * 3 * c_h + 4 * c_h + (
        2 * c_in + 2 * c_outp
    ) * hw // l_img


def _pick_split(c_outp: int, c_in: int, hw: int, l_img: int) -> int:
    """Smallest c_out split (power of two, 16-aligned halves) whose VMEM
    working set fits; 0 if none does."""
    for s in (1, 2, 4, 8):
        if c_outp % (16 * s):
            continue
        if l_img <= _VMEM_TARGET_BYTES // _bytes_per_lane(c_in, c_outp // s, c_outp, hw, l_img):
            return s
    return 0


def conv_supported(h_img: int, w_img: int, c_in: int, c_out: int) -> bool:
    hw = h_img * w_img
    l_img = hw + 2 * w_img
    return _pick_split(_ceil16(c_out), c_in, hw, l_img) > 0


@functools.partial(jax.jit, static_argnames=("hw_shape", "relu", "interpret"))
def conv3x3_cm(
    x_cm: jax.Array,
    packed: Dict[str, jax.Array],
    *,
    hw_shape: Tuple[int, int],
    relu: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """CM fused conv: ``[B, c_in, H·W] -> [B, c_outp, H·W]`` (pads c_out to 16)."""
    b, c_in, hw = x_cm.shape
    h_img, w_img = hw_shape
    assert h_img * w_img == hw
    l_img = hw + 2 * w_img
    c_outp = packed["bias"].shape[0]

    s = _pick_split(c_outp, c_in, hw, l_img)
    if s == 0:
        raise ValueError("grid too large for packed CM conv")
    c_h = c_outp // s
    l_max = _VMEM_TARGET_BYTES // _bytes_per_lane(c_in, c_h, c_outp, hw, l_img)
    n = 1
    for cand in range(min(l_max // l_img, b), 0, -1):
        if b % cand == 0:
            n = cand
            break
    g = b // n

    # Row order of packed A is (dy, c_out); regroup to (split, dy, c_out_in_split)
    # so each split's rows are one contiguous block.  Bias likewise.
    a_split = (
        packed["A"].reshape(3, s, c_h, 3 * c_in).transpose(1, 0, 2, 3).reshape(s, 3 * c_h, 3 * c_in)
    )
    b_split = packed["bias"].reshape(s, c_h, 1)

    kernel = functools.partial(
        _kernel,
        c_in=c_in,
        c_outp=c_h,
        w_img=w_img,
        hw=hw,
        l_img=l_img,
        n_img=n,
        relu=relu,
        out_dtype=x_cm.dtype,
        interpret=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(g, s),
        in_specs=[
            pl.BlockSpec((n, c_in, hw), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c_h, 3 * c_in), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_h, 1), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, c_h, hw), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_outp, hw), x_cm.dtype),
        scratch_shapes=[
            pltpu.VMEM((c_in, n * l_img), jnp.float32),
            pltpu.VMEM((3 * c_in, n * l_img), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_cm, a_split, b_split)
