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
    a_ref,  # [3*c_outp, 3*c_in]
    b_ref,  # [c_outp, 1]
    out_ref,  # [n, c_outp, HW]
    xpad,  # scratch [c_in, n*l_img] bf16
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
    L = n_img * l_img
    halo = w_img
    q = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    col = q % w_img
    has_next = jnp.where(col == w_img - 1, 0.0, 1.0)
    has_prev = jnp.where(col == 0, 0.0, 1.0)

    xpad[:, :] = jnp.zeros((c_in, L), jnp.bfloat16)
    for j in range(n_img):
        xpad[:, j * l_img + halo : j * l_img + halo + hw] = x_ref[j].astype(jnp.bfloat16)

    v = xpad[:, :]

    def tap(dx_block):
        return jax.lax.dot_general(
            a_ref[:, dx_block * c_in : (dx_block + 1) * c_in],
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [3*c_outp, L]

    u = tap(1)
    u = u + _roll(tap(0), 1, interpret=interpret) * has_prev
    u = u + _roll(tap(2), -1, interpret=interpret) * has_next
    g = (
        _roll(u[0:c_outp, :], w_img, interpret=interpret)
        + u[c_outp : 2 * c_outp, :]
        + _roll(u[2 * c_outp : 3 * c_outp, :], -w_img, interpret=interpret)
    )
    y = g + b_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y.astype(out_dtype)
    for j in range(n_img):
        out_ref[j, :, :] = y[:, j * l_img + halo : j * l_img + halo + hw]


def conv_supported(h_img: int, w_img: int, c_in: int, c_out: int) -> bool:
    hw = h_img * w_img
    l_img = hw + 2 * w_img
    c_outp = _ceil16(c_out)
    bytes_per_lane = 2 * c_in + 3 * 4 * 3 * c_outp + (2 * c_in + 2 * c_outp) * hw // l_img
    return l_img <= _VMEM_TARGET_BYTES // bytes_per_lane


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

    bytes_per_lane = 2 * c_in + 3 * 4 * 3 * c_outp + (2 * c_in + 2 * c_outp) * hw // l_img
    l_max = _VMEM_TARGET_BYTES // bytes_per_lane
    if l_img > l_max:
        raise ValueError("grid too large for packed CM conv")
    n = 1
    for cand in range(min(l_max // l_img, b), 0, -1):
        if b % cand == 0:
            n = cand
            break
    g = b // n

    kernel = functools.partial(
        _kernel,
        c_in=c_in,
        c_outp=c_outp,
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
        grid=(g,),
        in_specs=[
            pl.BlockSpec((n, c_in, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(packed["A"].shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(packed["bias"].shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, c_outp, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_outp, hw), x_cm.dtype),
        scratch_shapes=[pltpu.VMEM((c_in, n * l_img), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_cm, packed["A"], packed["bias"])
