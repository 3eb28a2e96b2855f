"""Pallas TPU kernel: channel-major fused conv3×3 + BN + ReLU + 2×2 maxpool.

The encoder's ``ConvBlock → max_pool`` pairs (reference
``models/cdan.py:70-98``) are the base path's top cost on TPU: XLA's
``reduce_window`` runs ~3× over its bandwidth floor and the conv output
(537 MB at conv1/B=128) makes a full HBM round trip before pooling.  This
kernel computes both in one VMEM pass.

Two ideas carry it:

* **Column-polyphase layout.**  The operand arrives with each image's even
  and odd columns deinterleaved into two half-width fields
  (``deinterleave_cols``, one cheap XLA pass).  The 2×2 pool's column-pair
  max then becomes an elementwise max of the two conv-output fields (no
  lane shuffles); the row-pair max is one aligned W/2-lane roll; row
  compaction is static 128-lane block stores (measured at copy speed).
* **Full (dy, dx) K-stacking.**  With only 3–8 input channels, per-tap
  matmuls would drown in MXU tile-op overhead (M=3·c_out, K=8 → 5× the
  tile-ops of the stacked form).  Instead all 9 taps ride the contraction
  axis: per output field one ``A[c_out, 9·c_inp] @ stack[9·c_inp, L]``
  matmul, where the stack's nine 8-row groups are lane-rolled copies of the
  padded input (rolls by multiples of W/2 are vreg-aligned; only the two
  cross-column tap groups pay a ±1-lane roll, with image-edge masks applied
  to the 8-row stack groups, not the c_out-row outputs).

Output is the pooled map in standard channel-major ``[B, c_outp, H/2·W/2]``
layout — it chains into the channel-major DenseBlock kernel transpose-free.
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


def _ceil8(n: int) -> int:
    return ((n + 7) // 8) * 8


def deinterleave_cols(x_cm: jax.Array, hw_shape: Tuple[int, int]) -> jax.Array:
    """[B, C, H·W] → [B, C, H·W] with even columns first, odd columns second.

    Each half is row-major [H, W/2].  One XLA gather pass; cheap for the
    small-channel tensors this kernel targets.
    """
    b, c, hw = x_cm.shape
    h, w = hw_shape
    x = x_cm.reshape(b, c, h, w)
    xe = x[:, :, :, 0::2].reshape(b, c, hw // 2)
    xo = x[:, :, :, 1::2].reshape(b, c, hw // 2)
    return jnp.concatenate([xe, xo], axis=-1)


# Stack-group source kinds, per output field.  ``dxk`` selects the original
# dx tap; ``fld`` the source field; ``extra`` an additional ±1 lane shift
# with its edge mask ("prev" masks output column 0, "next" column W/2−1).
# Output field E sits at even original columns (2k), O at odd (2k+1).
_KINDS_E = (("E", 0, None), ("O", 1, None), ("O", -1, "prev"))
_KINDS_O = (("O", 0, None), ("E", -1, None), ("E", 1, "next"))


def pack_conv_pool(kernel: jax.Array, bias: jax.Array) -> Dict[str, jax.Array]:
    """Pack a BN-folded HWIO 3×3 kernel for the polyphase conv+pool kernel.

    ``A_E``/``A_O``: [c_outp, 9·c_inp]; column groups are ordered
    (kind, dy) per ``_KINDS_*`` × dy∈(−1,0,+1), matching the in-kernel
    stack build.
    """
    _, _, c_in, c_out = kernel.shape
    c_outp = _ceil16(c_out)
    c_inp = _ceil8(c_in)
    k = jnp.pad(kernel, ((0, 0), (0, 0), (0, c_inp - c_in), (0, c_outp - c_out)))

    def build(kinds):
        groups = []
        for _, dxk, _ in kinds:
            for dy_idx in range(3):
                groups.append(k[dy_idx, dxk + 1].T)  # [c_outp, c_inp]
        return jnp.concatenate(groups, axis=1).astype(jnp.bfloat16)

    return {
        "A_E": build(_KINDS_E),
        "A_O": build(_KINDS_O),
        "bias": jnp.pad(bias, (0, c_outp - c_out))[:, None].astype(jnp.float32),
    }


def _kernel(
    x_ref,  # [n, c_inp, HW] column-deinterleaved
    ae_ref,  # [c_outp, 9*c_inp]
    ao_ref,
    b_ref,  # [c_outp, 1]
    out_ref,  # [n, c_outp, HW/4]
    xpad,  # scratch [c_inp, n*2*lf] f32
    stack,  # scratch [9*c_inp, n*2*lf] bf16
    *,
    c_inp: int,
    c_outp: int,
    wf: int,  # W/2 — field width in lanes; halo is one field row (wf lanes)
    hwf: int,  # H·W/2 — field interior lanes
    lf: int,  # hwf + 2*wf
    h_img: int,
    n_img: int,
    out_dtype,
    interpret: bool,
):
    l_img = 2 * lf
    L = n_img * l_img
    q = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    col = q % wf
    masks = {
        "prev": jnp.where(col == 0, 0.0, 1.0),
        "next": jnp.where(col == wf - 1, 0.0, 1.0),
        None: None,
    }

    xpad[:, :] = jnp.zeros((c_inp, L), jnp.float32)
    for j in range(n_img):
        base = j * l_img
        xpad[:, base + wf : base + wf + hwf] = x_ref[j, :, 0:hwf].astype(jnp.float32)
        xpad[:, base + lf + wf : base + lf + wf + hwf] = x_ref[
            j, :, hwf : 2 * hwf
        ].astype(jnp.float32)

    xf = xpad[:, :]

    def build_stack(kinds, out_field_is_e: bool):
        """Write the nine rolled/masked groups of this field's K-stack.

        roll semantics: roll(x, s)[p] = x[p − s].  A source at lane
        p + off needs s = −off.  Field O sits +lf lanes from field E.
        """
        row = 0
        for fld, _, extra in kinds:
            fld_off = 0
            if out_field_is_e and fld == "O":
                fld_off = lf
            if not out_field_is_e and fld == "E":
                fld_off = -lf
            x_off = -1 if extra == "prev" else (1 if extra == "next" else 0)
            # "prev": source is original col−1 → O col k−1 → lane (…−1):
            # off = fld_off − 1.  "next": original col+1 on field E at k+1:
            # off = fld_off + 1.
            for dyoff in (-1, 0, 1):
                off = fld_off + x_off + dyoff * wf
                g = _roll(xf, -off, interpret=interpret)
                if masks[extra] is not None:
                    g = g * masks[extra]
                stack[row : row + c_inp, :] = g.astype(jnp.bfloat16)
                row += c_inp

    def field_out(a_ref):
        pre = jax.lax.dot_general(
            a_ref[:],
            stack[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(pre + b_ref[:], 0.0)

    build_stack(_KINDS_E, True)
    y_e = field_out(ae_ref)
    build_stack(_KINDS_O, False)
    y_o = field_out(ao_ref)

    # 2×2 maxpool: column pairs = (E, O) at equal field coordinates — align O
    # onto E lanes (−lf), elementwise max; then row pairs via an aligned
    # wf-lane roll; then keep even rows with static block stores.
    m1 = jnp.maximum(y_e, _roll(y_o, -lf, interpret=interpret))
    m2 = jnp.maximum(m1, _roll(m1, -wf, interpret=interpret)).astype(out_dtype)

    for j in range(n_img):
        base = j * l_img + wf  # E-field interior start
        for r in range(h_img // 2):
            out_ref[j, :, r * wf : (r + 1) * wf] = m2[
                :, base + (2 * r) * wf : base + (2 * r + 1) * wf
            ]


def conv_pool_supported(h_img: int, w_img: int, c_in: int, c_out: int) -> bool:
    hwf = h_img * w_img // 2
    lf = hwf + w_img
    l_img = 2 * lf
    c_inp = _ceil8(c_in)
    c_outp = _ceil16(c_out)
    bytes_per_lane = _bytes_per_lane(c_inp, c_outp)
    return w_img % 16 == 0 and h_img % 2 == 0 and l_img <= _VMEM_TARGET_BYTES // bytes_per_lane


def _bytes_per_lane(c_inp: int, c_outp: int) -> int:
    # xpad f32 + stack bf16 + y_e/y_o/m f32 transients (~3 live c_outp rows)
    return 4 * c_inp + 2 * 9 * c_inp + 3 * 4 * c_outp


@functools.partial(jax.jit, static_argnames=("hw_shape", "interpret"))
def conv3x3_pool_cm(
    x_deint: jax.Array,
    packed: Dict[str, jax.Array],
    *,
    hw_shape: Tuple[int, int],
    interpret: bool = False,
) -> jax.Array:
    """Fused conv+BN+ReLU+2×2-maxpool: column-deinterleaved ``[B, c_inp, H·W]``
    (see :func:`deinterleave_cols`) → pooled CM ``[B, c_outp, H/2·W/2]``."""
    b, c_inp, hw = x_deint.shape
    h_img, w_img = hw_shape
    assert h_img * w_img == hw
    wf = w_img // 2
    hwf = hw // 2
    lf = hwf + 2 * wf
    l_img = 2 * lf
    c_outp = packed["bias"].shape[0]

    l_max = _VMEM_TARGET_BYTES // _bytes_per_lane(c_inp, c_outp)
    if l_img > l_max:
        raise ValueError("grid too large for fused conv+pool")
    n = 1
    for cand in range(min(l_max // l_img, b), 0, -1):
        if b % cand == 0:
            n = cand
            break
    g = b // n

    kernel = functools.partial(
        _kernel,
        c_inp=c_inp,
        c_outp=c_outp,
        wf=wf,
        hwf=hwf,
        lf=lf,
        h_img=h_img,
        n_img=n,
        out_dtype=x_deint.dtype,
        interpret=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((n, c_inp, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(packed["A_E"].shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(packed["A_O"].shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(packed["bias"].shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n, c_outp, hw // 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, c_outp, hw // 4), x_deint.dtype),
        scratch_shapes=[
            pltpu.VMEM((c_inp, n * l_img), jnp.float32),
            pltpu.VMEM((9 * c_inp, n * l_img), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x_deint, packed["A_E"], packed["A_O"], packed["bias"])
