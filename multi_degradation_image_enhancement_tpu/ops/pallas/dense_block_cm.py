"""Pallas TPU kernel: channel-major fused CDAN DenseBlock (inference).

Second-generation fused DenseBlock.  The first kernel
(``ops/pallas/dense_block.py``) kept the row-major ``[pixels, channels]``
layout and lost to XLA at the big grids: with channels on the 128-lane axis,
C∈{3..67} tiles waste up to 42/43 of every VPU op and the 16-column growth
matmuls leave 7/8 of the MXU idle — the same structural wall XLA sits on
(PERF.md roofline).

This kernel transposes the problem.  Features live as ``[C, P]`` — channels
on the 8/16-deep *sublane* axis, flattened pixels on the 128-lane axis:

* the growth conv becomes three ``A_dx[48, C] @ X[C, P]`` matmuls (one per
  dx ∈ {-1,0,+1} tap): the 16 output channels (×3 dy taps = 48) ride the
  matmul's M axis, which merely streams through the systolic array — small
  M costs nothing, unlike small N;
* every elementwise op (BN affine, ReLU, masks) runs on ``[C, P]`` tiles —
  sublane padding wastes at most 16/C instead of 128/C;
* dx=±1 neighbour taps are 1-lane rotations OF THE MATMUL OUTPUT (rolling
  the [48, P] result with an image-edge mask is exact — per-lane ops
  commute with the channel contraction) so no shifted input copies are ever
  materialised; the dy reduction is three W-lane rotations of the combined
  48-row output.  A first version staged a ``[3C, P]`` dx tap-stack through
  scratch instead; at large C its rolls/masks/writes dominated the kernel
  (VPU-bound), which this formulation removes.

Spatial handling: each image is flattened to ``HW`` lanes with a ``5W`` zero
halo on both sides (four chained 3×3 convs eat 4·(W+1) lanes of context;
5W covers it and keeps every mask W-periodic).  Activations are masked to
the image interior each layer, which reproduces zero-SAME-padding exactly —
rotation wrap-around only ever pollutes lanes the validity analysis already
discards.  Small grids pack several whole images side-by-side in one kernel
block; large grids split an image into whole-row tiles with overlapping
halos (materialised copies, so Pallas double-buffers the loads).

Scope: inference (BN folded to per-channel affine), like its predecessor.
Reference workload: ``/root/reference/models/cdan.py:22-53`` (DenseBlock).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_degradation_image_enhancement_tpu.ops.pallas.dense_block import fold_bn

GROWTH = 16
NUM_LAYERS = 4
HALO_ROWS = 5  # rows of zero halo per side; ≥ 4 + 4/W for the chained convs

# Working-set target per kernel invocation (feats + tap-stack + transients).
# v5e has 128 MiB VMEM; a generous target keeps the 5W-per-side halo
# overcompute (and grid-step count) small.  Measured A/B at B=128:
# 8 MiB → DB(64)@128² 12.0 ms; 64 MiB → see PERF.md.
_VMEM_TARGET_BYTES = 64 * 1024 * 1024

# The fused-I/O (v2) kernel has no halo-overcompute/tiling trade-off, so it
# can run closer to the 128 MiB VMEM ceiling; 96 MiB admits whole 256×384
# images (the training/eval resolution) in packed mode — e.g. DB(3)@256×384
# works out to a ~79 MB set (feats 16 MB + three [48,L] f32 transients 59 MB
# + I/O blocks), measured safe under the 110 MB compiler limit.
_VMEM_TARGET_BYTES_V2 = 96 * 1024 * 1024

# Layers whose (padded) input width ci is at or below this run the growth
# conv as ONE K-stacked matmul ``A[48, 3ci] @ [roll(v,+1)·m; v; roll(v,-1)·m]``
# instead of three K=ci taps with output-side rolls.  Tiny-K matmuls drown
# the MXU in tile-ops (a K=ci tap runs at ~ci/128 utilisation, so
# final_dense's ci ∈ {16,32,48} taps all cost the same wall-clock as a
# full-width matmul 3× their FLOPs); stacking triples K for a small
# input-side roll/mask cost that only dominates at large ci (the reason the
# roll-after-matmul form exists — see the module docstring).  0 disables.
# Default stays 0 until the in-context A/B on real hardware lands
# (benchmarks/ab_kstack.py — standalone kernel wins can be in-context
# losses); flip to 48 when measured ahead.
_K_STACK_MAX_CI = 0


def _stack_rows(c0p: int, k_max: int) -> int:
    """Largest f32 ``[3ci, L]`` tap-stack any K-stacked layer materialises."""
    rows = 0
    for i in range(NUM_LAYERS):
        ci = c0p + GROWTH * i
        if ci <= k_max:
            rows = max(rows, 3 * ci)
    return rows


def _transient_lane_bytes(c0p: int, k_max: int) -> int:
    """f32 transient bytes/lane: max(roll-after live set, K-stack live set)."""
    return 4 * max(3 * 48, _stack_rows(c0p, k_max) + 48)


def _ceil16(n: int) -> int:
    return ((n + 15) // 16) * 16


def _roll(x: jax.Array, shift: int, *, interpret: bool) -> jax.Array:
    """Static circular shift along the lane (last) axis."""
    if shift == 0:
        return x
    if interpret:  # pltpu.roll has no interpreter lowering
        return jnp.roll(x, shift, axis=1)
    return pltpu.roll(x, shift=shift % x.shape[1], axis=1)


def _kernel(
    x_ref,  # [1, 1, c0p, L]
    *refs,
    c0p: int,
    w_img: int,
    halo: int,
    hw: int,
    l_img: int,
    tile_lanes: int,
    segments: Tuple[Tuple[int, int, int], ...],
    out_dtype,
    bf16_act: bool,
    k_stack_max_ci: int,
    interpret: bool,
):
    """refs: (a,b,A,bias)×4 layers, (at,bt,At,biast), out_ref, feats scratch."""
    (a0, b0, A0, p0, a1, b1, A1, p1, a2, b2, A2, p2, a3, b3, A3, p3,
     at, bt, At, pt, out_ref, feats) = refs
    layers = [(a0, b0, A0, p0), (a1, b1, A1, p1), (a2, b2, A2, p2), (a3, b3, A3, p3)]

    L = x_ref.shape[-1]
    # Global lane coordinate of each local lane.  Tiled mode: tile t covers
    # [t·T, t·T+L) of one image's padded axis.  Packed mode: the block holds
    # whole images, L_img-periodic.  One formula serves both.
    base = pl.program_id(1) * tile_lanes
    q = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) + base
    pos = q % l_img
    inside = ((pos >= halo) & (pos < halo + hw)).astype(jnp.float32)
    col = q % w_img
    # Neighbour masks: a ±1 lane rotation crosses a row boundary at the
    # image's W edges — zero it there (SAME-conv zero padding).  Masks stay
    # f32: Mosaic lane rotation only supports 32-bit data.
    has_next = jnp.where(col == w_img - 1, 0.0, 1.0)
    has_prev = jnp.where(col == 0, 0.0, 1.0)

    feats[0:c0p, :] = x_ref[0, 0].astype(jnp.bfloat16)

    if bf16_act:
        inside_act = inside.astype(jnp.bfloat16)

        def activate(rows, a_ref, b_ref):
            # All-bf16 affine+ReLU+mask: feats is bf16 already and the matmul
            # consumes bf16, so no per-element casts at all; the [C,1] param
            # casts are free.  Precision cost bounded by the bf16-class
            # tolerance the kernel already carries (tests assert it).
            a = a_ref[:].astype(jnp.bfloat16)
            b = b_ref[:].astype(jnp.bfloat16)
            z = jnp.zeros((), jnp.bfloat16)
            return jnp.maximum(feats[0:rows, :] * a + b, z) * inside_act
    else:

        def activate(rows, a_ref, b_ref):
            f = feats[0:rows, :].astype(jnp.float32)
            return jnp.maximum(f * a_ref[:] + b_ref[:], 0.0) * inside

    for i in range(NUM_LAYERS):
        a_ref, b_ref, A_ref, bias_ref = layers[i]
        ci = c0p + GROWTH * i
        if ci <= k_stack_max_ci:
            # K-stacked form for tiny-K layers: a K=ci tap matmul runs at
            # ~ci/128 MXU utilisation, so three of them cost the wall-clock
            # of a full-width matmul 3× their FLOPs; stacking the dx taps
            # input-side triples K for ~7·ci rows of roll/mask/cast work.
            # Rolling the INPUT with the edge mask is exact for the same
            # commutation reason as rolling the output (per-lane ops commute
            # with the channel contraction).  Activations compute in f32
            # regardless of bf16_act: Mosaic lane rolls are 32-bit only.
            f = feats[0:ci, :].astype(jnp.float32)
            vf = jnp.maximum(f * a_ref[:] + b_ref[:], 0.0) * inside
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
            )  # [48, L] — rows are (dy, out_channel)
        else:
            v = activate(ci, a_ref, b_ref).astype(jnp.bfloat16)
            # One matmul per dx tap against the UNSHIFTED activations, dx
            # applied as a ±1 lane roll of the matmul result.  Rolling after
            # the matmul is exact (the roll/mask are per-lane and commute
            # with the channel contraction) and replaces the [3ci, L]
            # tap-stack: the per-layer VPU traffic drops from ~8·ci row-ops
            # (2 f32 rolls + 2 masks on [ci,L] + three [ci,L] bf16 scratch
            # writes) to rolls/masks on the matmul output — the kernel's hot
            # cost at large ci.  The dy-combine runs FIRST, per dx block:
            # the column masks are W-periodic so they commute with the ±W dy
            # rolls, and collapsing [48,L] → [16,L] before the dx roll+mask
            # saves 4 [16,L] row-op units per layer.  A's column blocks are
            # the dx∈{-1,0,+1} taps (pack_params_cm).
            def tap_dy(dx_block):
                t = jax.lax.dot_general(
                    A_ref[:, dx_block * ci : (dx_block + 1) * ci],
                    v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [48, L] — rows are (dy, out_channel)
                return (
                    _roll(t[0:GROWTH, :], w_img, interpret=interpret)
                    + t[GROWTH : 2 * GROWTH, :]
                    + _roll(t[2 * GROWTH : 3 * GROWTH, :], -w_img, interpret=interpret)
                )  # [16, L]

            g = tap_dy(1)
            g = g + _roll(tap_dy(0), 1, interpret=interpret) * has_prev
            g = g + _roll(tap_dy(2), -1, interpret=interpret) * has_next
            feats[ci : ci + GROWTH, :] = (g + bias_ref[:]).astype(jnp.bfloat16)
            continue
        g = (
            _roll(u[0:GROWTH, :], w_img, interpret=interpret)
            + u[GROWTH : 2 * GROWTH, :]
            + _roll(u[2 * GROWTH : 3 * GROWTH, :], -w_img, interpret=interpret)
        )
        feats[ci : ci + GROWTH, :] = (g + bias_ref[:]).astype(jnp.bfloat16)

    vt = activate(feats.shape[0], at, bt).astype(jnp.bfloat16)
    ot = jax.lax.dot_general(
        At[:].astype(jnp.bfloat16),
        vt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + pt[:]  # [C_outp, L]
    ot = ot.astype(out_dtype)
    for src, dst, ln in segments:
        out_ref[0, 0, :, dst : dst + ln] = ot[:, src : src + ln]


def _plan(h_img: int, w_img: int, c0p: int, k_stack_max_ci: int = 0):
    """Pick packed-images vs row-tiled blocking to fit the VMEM target."""
    hw = h_img * w_img
    halo = HALO_ROWS * w_img
    l_img = hw + 2 * halo
    c_total = c0p + NUM_LAYERS * GROWTH
    # bytes/lane: feats (bf16) + live f32 matmul/roll/stack transients
    # + one extra [48,L] f32 in flight + double-buffered input block (bf16)
    bytes_per_lane = (
        2 * c_total
        + _transient_lane_bytes(c0p, k_stack_max_ci)
        + 4 * 48
        + 2 * 2 * c0p
    )
    l_max = _VMEM_TARGET_BYTES // bytes_per_lane
    if l_img <= l_max:
        return {"mode": "packed", "n_max": max(l_max // l_img, 1)}
    # Row-tiled: largest whole-row tile T = r·W with r | H and T + 2·halo ≤ l_max
    for r in range(h_img, 0, -1):
        if h_img % r == 0 and r * w_img + 2 * halo <= l_max:
            return {"mode": "tiled", "rows": r}
    return {"mode": "tiled", "rows": 1}


def _pad_head(arr: jax.Array, c_in: int, c_pad: int, axis: int = 0) -> jax.Array:
    """Zero-pad the first ``c_in`` entries of a concat-channel axis to ``c_pad``."""
    if c_in == c_pad:
        return arr
    head = jax.lax.slice_in_dim(arr, 0, c_in, axis=axis)
    tail = jax.lax.slice_in_dim(arr, c_in, arr.shape[axis], axis=axis)
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, c_pad - c_in)
    return jnp.concatenate([jnp.pad(head, pad_width), tail], axis=axis)


def pack_params_cm(
    params: Dict[str, Any], batch_stats: Dict[str, Any], c_in: int
) -> Dict[str, jax.Array]:
    """Fold BN + repack conv weights for the channel-major kernel.

    Accepts the {bn_i, conv_i, bn_t, conv_t} layout of ``models.cdan.DenseBlock``.
    """
    c0p = _ceil16(c_in)
    packed: Dict[str, jax.Array] = {}
    for i in range(NUM_LAYERS):
        bn, st = params[f"bn_{i}"], batch_stats[f"bn_{i}"]
        a, b = fold_bn(bn["scale"], bn["bias"], st["mean"], st["var"])
        ci_p = c0p + GROWTH * i
        packed[f"a{i}"] = _pad_head(a, c_in, c0p)[:, None].astype(jnp.float32)
        packed[f"b{i}"] = _pad_head(b, c_in, c0p)[:, None].astype(jnp.float32)
        k = _pad_head(params[f"conv_{i}"]["kernel"], c_in, c0p, axis=2)  # [3,3,ci_p,16]
        # rows (dy, o), cols (dx, c)
        packed[f"A{i}"] = (
            k.transpose(0, 3, 1, 2).reshape(3 * GROWTH, 3 * ci_p).astype(jnp.bfloat16)
        )
        packed[f"bias{i}"] = params[f"conv_{i}"]["bias"][:, None].astype(jnp.float32)
    bn, st = params["bn_t"], batch_stats["bn_t"]
    a, b = fold_bn(bn["scale"], bn["bias"], st["mean"], st["var"])
    packed["at"] = _pad_head(a, c_in, c0p)[:, None].astype(jnp.float32)
    packed["bt"] = _pad_head(b, c_in, c0p)[:, None].astype(jnp.float32)
    wt = params["conv_t"]["kernel"][0, 0]  # [ct, C_out]
    wt = _pad_head(wt, c_in, c0p, axis=0).T  # [C_out, ct_p]
    c_out = wt.shape[0]
    c_outp = _ceil16(c_out)
    packed["At"] = jnp.pad(wt, ((0, c_outp - c_out), (0, 0))).astype(jnp.bfloat16)
    packed["biast"] = jnp.pad(
        params["conv_t"]["bias"], (0, c_outp - c_out)
    )[:, None].astype(jnp.float32)
    return packed


def _run_cm(
    x: jax.Array,
    packed: Dict[str, jax.Array],
    *,
    c_in: int,
    bf16_act: bool = False,
    k_stack_max_ci: int | None = None,
    interpret: bool,
):
    """Resolve the K-stack default OUTSIDE jit so benches that patch the
    module constant (or pass an explicit value) always get a fresh trace."""
    k = _K_STACK_MAX_CI if k_stack_max_ci is None else k_stack_max_ci
    return _run_cm_jit(
        x, packed, c_in=c_in, bf16_act=bf16_act, k_stack_max_ci=k,
        interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("c_in", "bf16_act", "k_stack_max_ci", "interpret")
)
def _run_cm_jit(
    x: jax.Array,
    packed: Dict[str, jax.Array],
    *,
    c_in: int,
    bf16_act: bool,
    k_stack_max_ci: int,
    interpret: bool,
):
    b, h_img, w_img, _ = x.shape
    hw = h_img * w_img
    halo = HALO_ROWS * w_img
    l_img = hw + 2 * halo
    c0p = _ceil16(c_in)
    c_outp = packed["At"].shape[0]
    c_total = c0p + NUM_LAYERS * GROWTH
    plan = _plan(h_img, w_img, c0p, k_stack_max_ci)

    # NHWC → [B, c0p, halo + HW + halo] channel-major with zero halos
    xcm = x.transpose(0, 3, 1, 2).reshape(b, c_in, hw)
    xcm = jnp.pad(xcm, ((0, 0), (0, c0p - c_in), (halo, halo)))

    if plan["mode"] == "packed":
        n = 1
        for cand in range(min(plan["n_max"], b), 0, -1):
            if b % cand == 0:
                n = cand
                break
        g = b // n
        xt = xcm.reshape(g, n, c0p, l_img).transpose(0, 2, 1, 3).reshape(g, 1, c0p, n * l_img)
        grid = (g, 1)
        tile_lanes = 0
        segments = tuple((j * l_img + halo, j * hw, hw) for j in range(n))
        out_lanes = n * hw
        l_block = n * l_img
    else:
        rows = plan["rows"]
        tile_lanes = rows * w_img
        n_tiles = h_img // rows
        l_block = tile_lanes + 2 * halo
        xt = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(xcm, t * tile_lanes, l_block, axis=2)
                for t in range(n_tiles)
            ],
            axis=1,
        )  # [B, n_tiles, c0p, L]
        grid = (b, n_tiles)
        segments = ((halo, 0, tile_lanes),)
        out_lanes = tile_lanes
        n = 1
        g = b

    const = lambda i, j: (0, 0)
    args: List[jax.Array] = []
    in_specs = [
        pl.BlockSpec((1, 1, c0p, l_block), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    ]
    names = [f"{nm}{i}" for i in range(NUM_LAYERS) for nm in ("a", "b", "A", "bias")]
    names += ["at", "bt", "At", "biast"]
    for nm in names:
        args.append(packed[nm])
        in_specs.append(pl.BlockSpec(packed[nm].shape, const, memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _kernel,
        c0p=c0p,
        w_img=w_img,
        halo=halo,
        hw=hw,
        l_img=l_img,
        tile_lanes=tile_lanes,
        segments=segments,
        out_dtype=x.dtype,
        bf16_act=bf16_act,
        k_stack_max_ci=k_stack_max_ci,
        interpret=interpret,
    )
    if plan["mode"] == "packed":
        out_index = lambda i, j: (i, j, 0, 0)
        out_shape = (g, 1, c_outp, out_lanes)
    else:
        out_index = lambda i, j: (i, 0, 0, j)
        out_shape = (b, 1, c_outp, hw)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, c_outp, out_lanes), out_index, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((c_total, l_block), jnp.bfloat16),
        ],
        # 120 MiB (of the 128 MiB physical): the K-stack transients can run
        # ~1.3 MiB past the _plan estimate at wide-W shapes (observed
        # 101.29M kernel-stack demand at c0p=128, l_block=32K under the old
        # 100 MiB cap).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(xt, *args)

    if plan["mode"] == "packed":
        out = out.reshape(g, c_outp, n, hw).transpose(0, 2, 1, 3).reshape(b, c_outp, hw)
    else:
        out = out.reshape(b, c_outp, hw)
    return out


def _eye(n: int, dtype) -> jax.Array:
    """Identity matrix built from iota compares (Mosaic-safe jnp.eye)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(dtype)


def _kernel2(
    x_ref,  # [n, c_in, HW] channel-major — or [n, HW, c_in] when nhwc_io
    *refs,
    c_in: int,
    c0p: int,
    w_img: int,
    halo: int,
    hw: int,
    l_img: int,
    n_img: int,
    out_dtype,
    bf16_act: bool,
    k_stack_max_ci: int,
    nhwc_io: bool,
    interpret: bool,
):
    """Fused-I/O variant: halo packing and interior extraction happen here.

    The v1 kernel required the caller to pre-pad, pre-pack and post-slice in
    XLA — ~6 HBM bandwidth passes per DenseBlock in context.  Here the
    operand is the natural channel-major tensor and the only XLA glue left
    is one transpose on each side (measured at bandwidth).

    ``nhwc_io=True`` removes even those: the operand is the flattened NHWC
    tensor ``[n, HW, c]`` (a free reshape for the caller) and the CM
    transposes run in VMEM as identity matmuls — exact value copies whose
    MXU cost (K=c contraction over HW lanes) is far below the ~2.4 ms an
    XLA-materialised HBM transpose measures at the big grids (PERF.md).
    Only worth it at c ≥ 64: a small-c NHWC Pallas operand pays lane
    padding on the whole block, which is why ``final_dense`` stays CM.
    """
    (a0, b0, A0, p0, a1, b1, A1, p1, a2, b2, A2, p2, a3, b3, A3, p3,
     at, bt, At, pt, out_ref, feats) = refs
    layers = [(a0, b0, A0, p0), (a1, b1, A1, p1), (a2, b2, A2, p2), (a3, b3, A3, p3)]

    L = n_img * l_img
    q = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    pos = q % l_img
    inside = ((pos >= halo) & (pos < halo + hw)).astype(jnp.float32)
    col = q % w_img
    has_next = jnp.where(col == w_img - 1, 0.0, 1.0)
    has_prev = jnp.where(col == 0, 0.0, 1.0)

    # Build the halo'd channel-major input in VMEM: zero the x rows once,
    # then drop each image's interior into its slot.
    feats[0:c0p, :] = jnp.zeros((c0p, L), jnp.bfloat16)
    if nhwc_io:
        eye_in = _eye(c_in, jnp.bfloat16)
    for j in range(n_img):
        if nhwc_io:
            # [HW, c] → [c, HW] on the MXU: T[c, p] = Σ_k I[c,k]·X[p,k]
            blk = jax.lax.dot_general(
                eye_in,
                x_ref[j].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            blk = x_ref[j]
        feats[0:c_in, j * l_img + halo : j * l_img + halo + hw] = blk.astype(
            jnp.bfloat16
        )

    if bf16_act:
        inside_act = inside.astype(jnp.bfloat16)

        def activate(rows, a_ref, b_ref):
            a = a_ref[:].astype(jnp.bfloat16)
            b = b_ref[:].astype(jnp.bfloat16)
            z = jnp.zeros((), jnp.bfloat16)
            return jnp.maximum(feats[0:rows, :] * a + b, z) * inside_act
    else:

        def activate(rows, a_ref, b_ref):
            f = feats[0:rows, :].astype(jnp.float32)
            return jnp.maximum(f * a_ref[:] + b_ref[:], 0.0) * inside

    for i in range(NUM_LAYERS):
        a_ref, b_ref, A_ref, bias_ref = layers[i]
        ci = c0p + GROWTH * i
        if ci <= k_stack_max_ci:
            # K-stacked tiny-K form — see _kernel for the rationale.
            f = feats[0:ci, :].astype(jnp.float32)
            vf = jnp.maximum(f * a_ref[:] + b_ref[:], 0.0) * inside
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
            )
        else:
            v = activate(ci, a_ref, b_ref).astype(jnp.bfloat16)

            # dy-combine first per dx block (see _kernel): the W-periodic
            # column masks commute with ±W rolls, so the dx roll+mask runs
            # on [16,L] instead of [48,L].
            def tap_dy(dx_block):
                t = jax.lax.dot_general(
                    A_ref[:, dx_block * ci : (dx_block + 1) * ci],
                    v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return (
                    _roll(t[0:GROWTH, :], w_img, interpret=interpret)
                    + t[GROWTH : 2 * GROWTH, :]
                    + _roll(t[2 * GROWTH : 3 * GROWTH, :], -w_img, interpret=interpret)
                )

            g = tap_dy(1)
            g = g + _roll(tap_dy(0), 1, interpret=interpret) * has_prev
            g = g + _roll(tap_dy(2), -1, interpret=interpret) * has_next
            feats[ci : ci + GROWTH, :] = (g + bias_ref[:]).astype(jnp.bfloat16)
            continue
        g = (
            _roll(u[0:GROWTH, :], w_img, interpret=interpret)
            + u[GROWTH : 2 * GROWTH, :]
            + _roll(u[2 * GROWTH : 3 * GROWTH, :], -w_img, interpret=interpret)
        )
        feats[ci : ci + GROWTH, :] = (g + bias_ref[:]).astype(jnp.bfloat16)

    vt = activate(feats.shape[0], at, bt).astype(jnp.bfloat16)
    ot = jax.lax.dot_general(
        At[:].astype(jnp.bfloat16),
        vt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + pt[:]
    ot = ot.astype(out_dtype)
    if nhwc_io:
        c_outp = ot.shape[0]
        eye_out = _eye(c_outp, jnp.bfloat16)
        for j in range(n_img):
            seg = ot[:, j * l_img + halo : j * l_img + halo + hw]
            # [c, HW] → [HW, c] on the MXU: T[p, c] = Σ_k S[k,p]·I[k,c]
            out_ref[j, :, :] = jax.lax.dot_general(
                seg.astype(jnp.bfloat16),
                eye_out,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_dtype)
    else:
        for j in range(n_img):
            out_ref[j, :, :] = ot[:, j * l_img + halo : j * l_img + halo + hw]


def _lane128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _cm2_lane_bytes(
    c_in: int, c_outp: int, hw: int, l_img: int, k: int, nhwc_io: bool = False
) -> int:
    """VMEM bytes/lane for the fused-I/O kernel: feats (bf16) + live f32
    matmul/roll/stack transients + the in/out blocks (hw lanes per image).

    NHWC-I/O blocks put the channel width on the 128-lane axis, so each
    block pays lane padding to the next multiple of 128 (the reason this
    mode is only offered at c ≥ 64)."""
    c0p = _ceil16(c_in)
    c_total = c0p + NUM_LAYERS * GROWTH
    cin_eff = _lane128(c_in) if nhwc_io else c_in
    cout_eff = _lane128(c_outp) if nhwc_io else c_outp
    return (
        2 * c_total
        + _transient_lane_bytes(c0p, k)
        + (2 * cin_eff + 2 * cout_eff) * hw // l_img
    )


def _run_cm2(
    x_cm: jax.Array,
    packed: Dict[str, jax.Array],
    *,
    c_in: int,
    hw_shape: Tuple[int, int],
    bf16_act: bool = False,
    k_stack_max_ci: int | None = None,
    nhwc_io: bool = False,
    interpret: bool,
):
    """Fused-I/O channel-major DenseBlock: ``[B, c_in, H*W] -> [B, c_outp, H*W]``.

    With ``nhwc_io=True`` the contract is ``[B, H*W, c_in] -> [B, H*W,
    c_outp]`` instead (flattened NHWC both ways — free reshapes for an NHWC
    caller); the CM transposes run inside the kernel as identity matmuls.

    Requires the packed plan to fit whole images (the common case for CDAN's
    grids at the 64 MiB VMEM target — check :func:`cm2_supported`); callers
    fall back to :func:`_run_cm` (tiled mode) otherwise.

    The K-stack width degrades (48 → 32 → 16 → 0) until the tap-stack
    transient fits the VMEM ceiling, so enabling stacking can never turn a
    previously-supported grid into a compile-time VMEM OOM.
    """
    k = _K_STACK_MAX_CI if k_stack_max_ci is None else k_stack_max_ci
    h_img, w_img = hw_shape
    hw = h_img * w_img
    l_img = hw + 2 * HALO_ROWS * w_img
    c_outp = packed["At"].shape[0]
    while k > 0 and l_img > _VMEM_TARGET_BYTES_V2 // _cm2_lane_bytes(
        c_in, c_outp, hw, l_img, k, nhwc_io
    ):
        k -= GROWTH
    return _run_cm2_jit(
        x_cm, packed, c_in=c_in, hw_shape=hw_shape, bf16_act=bf16_act,
        k_stack_max_ci=max(k, 0), nhwc_io=nhwc_io, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "c_in", "hw_shape", "bf16_act", "k_stack_max_ci", "nhwc_io", "interpret"
    ),
)
def _run_cm2_jit(
    x_cm: jax.Array,
    packed: Dict[str, jax.Array],
    *,
    c_in: int,
    hw_shape: Tuple[int, int],
    bf16_act: bool,
    k_stack_max_ci: int,
    nhwc_io: bool = False,
    interpret: bool,
):
    b = x_cm.shape[0]
    hw = x_cm.shape[1] if nhwc_io else x_cm.shape[2]
    h_img, w_img = hw_shape
    assert h_img * w_img == hw
    halo = HALO_ROWS * w_img
    l_img = hw + 2 * halo
    c0p = _ceil16(c_in)
    c_outp = packed["At"].shape[0]
    c_total = c0p + NUM_LAYERS * GROWTH

    bytes_per_lane = _cm2_lane_bytes(c_in, c_outp, hw, l_img, k_stack_max_ci, nhwc_io)
    # n-packing stays under the conservative 64 MiB budget (larger packs
    # measured to blow VMEM through register-allocator spill slots); a
    # single whole image may use the raised v2 ceiling.
    l_max = _VMEM_TARGET_BYTES // bytes_per_lane
    if l_img > _VMEM_TARGET_BYTES_V2 // bytes_per_lane:
        raise ValueError("image too large for fused-I/O packed mode")
    n = 1
    for cand in range(min(max(l_max // l_img, 1), b), 0, -1):
        if b % cand == 0:
            n = cand
            break
    g = b // n

    names = [f"{nm}{i}" for i in range(NUM_LAYERS) for nm in ("a", "b", "A", "bias")]
    names += ["at", "bt", "At", "biast"]
    const = lambda i: (0, 0)
    in_block = (n, hw, c_in) if nhwc_io else (n, c_in, hw)
    in_specs = [pl.BlockSpec(in_block, lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
    args: List[jax.Array] = []
    for nm in names:
        args.append(packed[nm])
        in_specs.append(pl.BlockSpec(packed[nm].shape, const, memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _kernel2,
        c_in=c_in,
        c0p=c0p,
        w_img=w_img,
        halo=halo,
        hw=hw,
        l_img=l_img,
        n_img=n,
        out_dtype=x_cm.dtype,
        bf16_act=bf16_act,
        k_stack_max_ci=k_stack_max_ci,
        nhwc_io=nhwc_io,
        interpret=interpret,
    )
    out_block = (n, hw, c_outp) if nhwc_io else (n, c_outp, hw)
    out_shape = (b, hw, c_outp) if nhwc_io else (b, c_outp, hw)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(out_block, lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, x_cm.dtype),
        scratch_shapes=[
            pltpu.VMEM((c_total, n * l_img), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(x_cm, *args)
    return out


def cm2_supported(
    h_img: int, w_img: int, c_in: int, c_out: int, nhwc_io: bool = False
) -> bool:
    """Whether the fused-I/O packed path fits this grid at the VMEM target.

    Evaluated at K-stack width 0 — :func:`_run_cm2` degrades its stack width
    to fit, so any grid supported without stacking stays supported.

    ``nhwc_io`` additionally requires c_in ≥ 64: below that the NHWC block's
    lane padding (channels on the 128-lane axis) costs more DMA than the
    XLA boundary transposes it removes.
    """
    hw = h_img * w_img
    l_img = hw + 2 * HALO_ROWS * w_img
    if nhwc_io and c_in < 64:
        return False
    bytes_per_lane = _cm2_lane_bytes(c_in, _ceil16(c_out), hw, l_img, 0, nhwc_io)
    return l_img <= _VMEM_TARGET_BYTES_V2 // bytes_per_lane


def fused_dense_block_cm(
    x: jax.Array,
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    *,
    interpret: bool = False,
) -> jax.Array:
    """Inference DenseBlock, channel-major fused in VMEM.

    Drop-in equivalent of ``models.cdan.DenseBlock(...).apply(vars, x,
    train=False)`` (tested against it); NHWC in, NHWC out.
    """
    c_in = x.shape[-1]
    packed = pack_params_cm(params, batch_stats, c_in)
    c_out = params["conv_t"]["kernel"].shape[-1]
    out = _run_cm(x, packed, c_in=c_in, interpret=interpret)
    b, _, hw = out.shape
    h_img, w_img = x.shape[1], x.shape[2]
    return out[:, :c_out, :].transpose(0, 2, 1).reshape(b, h_img, w_img, c_out)
