#!/usr/bin/env python
"""Headline benchmark: end-to-end degrade→restore throughput on one chip.

Measures 256×256 images/sec/chip through the full on-device pipeline —
synthetic degradation (``ops.degradations``) + CDAN restoration forward
(bf16 on TPU) — against the ≥5,000 img/s/chip v5e north star in
/root/repo/BASELINE.json (the PyTorch reference publishes no numbers;
BASELINE.md).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N/5000}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_SEC = 5000.0


def build_pipeline(batch: int, size: int, dtype):
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.models.cdan_fast import build_serving_apply
    from multi_degradation_image_enhancement_tpu.ops.degradations import apply_degradation

    model = CDAN(dtype=dtype)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, size, size, 3), jnp.float32), train=False
    )
    if jax.default_backend() == "cpu":  # smoke mode: interpreter kernels are too slow
        forward = lambda z: model.apply(variables, z, train=False)
    else:
        # The serving path: all-channel-major Pallas forward (DenseBlocks,
        # convs, CBAM, pool/upsample all in [B, C, H·W]) with per-shape
        # fallback to the per-DenseBlock fused path.
        forward = build_serving_apply(variables, dtype)

    use_fused_noise, fused_noise_dtype = False, jnp.float32
    if jax.default_backend() != "cpu":
        import os as _os

        from multi_degradation_image_enhancement_tpu.ops.pallas import noise as _noise

        _tpath = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)),
            "multi_degradation_image_enhancement_tpu", "config", "serving_tuning.json",
        )
        try:
            with open(_tpath) as _f:
                _tcfg = json.load(_f)
            use_fused_noise = bool(_tcfg.get("fused_noise", False))
            if _tcfg.get("fused_noise_bf16", False):
                fused_noise_dtype = dtype
        except Exception:
            use_fused_noise = False
        use_fused_noise = use_fused_noise and _noise.supported((batch, size, size, 3))

    def step(clean255, key):
        if use_fused_noise:
            # measured-on: hardware-PRNG fused degrade (exp_noise_kernel.py)
            degraded, _ = _noise.degrade_noise_batch_fast(
                clean255, key, out_dtype=fused_noise_dtype
            )
        else:
            degraded = apply_degradation("noise", clean255, key) / 255.0
        restored = forward(degraded)
        return restored

    clean = (
        jnp.abs(jnp.sin(jnp.arange(batch * size * size * 3, dtype=jnp.float32) * 0.001))
        .reshape(batch, size, size, 3)
        * 255.0
    )
    return jax.jit(step), clean


def time_pipeline(batch: int, size: int, dtype, iters: int = 20,
                  scan_mode: bool = False) -> float:
    """Throughput with forced execution.

    ``block_until_ready`` is unreliable on the axon-tunneled TPU backend
    (it returns before execution completes, yielding impossible numbers);
    instead every iteration's output feeds a device-side accumulator and the
    timer closes over a host readback of the final scalar, so no step can be
    elided or outrun the clock.

    ``scan_mode`` chains the iterations inside one jitted ``lax.scan`` and
    fits per-step time as the slope between two scan lengths — used when the
    tunnel's per-call dispatch RTT is degraded (observed ~120 ms vs healthy
    ~1.7 ms), where a host loop would measure the tunnel, not this code.  On
    a healthy tunnel the two methods agree (async dispatch hides RTT behind
    the ~36 ms step).
    """
    step, clean = build_pipeline(batch, size, dtype)
    # Serving uses the TPU-native RBG PRNG (XLA RngBitGenerator) for the
    # degradation draws: same N(0,σ) noise semantics, measured ~0.75 ms/step
    # cheaper than threefry at B=128·256² (3.81 → 3.06 ms degrade stage).
    # Training keeps threefry (bit-reproducible key-derivation story).
    impl = "rbg" if jax.default_backend() != "cpu" else "threefry2x32"
    key = jax.random.key(0, impl=impl)

    if scan_mode:
        def scanned(n):
            @jax.jit
            def run(c, k):
                def body(acc, i):
                    return acc + jnp.mean(step(c, jax.random.fold_in(k, i))), None
                acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n))
                return acc
            return run

        def time_len(n):
            run = scanned(n)
            float(run(clean, key))  # compile + warm
            best = float("inf")
            for r in range(3):
                t0 = time.perf_counter()
                float(run(clean, jax.random.fold_in(key, 1000 + r)))
                best = min(best, time.perf_counter() - t0)
            return best

        n1, n2 = max(iters // 4, 2), iters
        per_step = (time_len(n2) - time_len(n1)) / (n2 - n1)
        return batch / per_step

    reduce_mean = jax.jit(lambda acc, out: acc + jnp.mean(out))
    # warmup / compile (forced via readback)
    acc = reduce_mean(jnp.zeros(()), step(clean, key))
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(iters):
        acc = reduce_mean(acc, step(clean, jax.random.fold_in(key, i)))
    float(acc)  # forces completion of every chained step
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _sanity_anchor_tflops() -> float:
    """Chained 4096³ bf16 matmul (forced execution) — the chip-health
    anchor.  Historical healthy reading on this v5e ≈ 107 TF/s; readings
    of ~50 TF/s (observed 2026-08-19 ~00:00Z) mean the shared axon host /
    tunnel is degraded and every wall-clock on it is inflated ~2-3×."""
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda x, y: x @ y)
    acc = jnp.mean(f(a, a)).astype(jnp.float32)
    float(acc)  # warm
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(10):
        acc = acc + jnp.mean(f(a, a)).astype(jnp.float32)
    float(acc)
    dt = (time.perf_counter() - t0) / 10
    return 2 * 4096**3 / dt / 1e12


def _compute_anchor_tflops() -> float:
    """Device-side chained matmuls (one dispatch): isolates chip compute
    from tunnel dispatch RTT — the two degrade independently on this host."""
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def big(x):
        def body(c, _):
            return jnp.tanh(c @ x), None
        c, _ = jax.lax.scan(body, x, None, length=20)
        return jnp.mean(c)

    float(big(a))  # warm
    t0 = time.perf_counter()
    float(big(a))
    dt = time.perf_counter() - t0
    return 20 * 2 * 4096**3 / dt / 1e12


def main() -> None:
    on_tpu = jax.default_backend() != "cpu"
    size = 256
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    scan_mode = False
    anchor_tf = None
    if on_tpu:
        # Gate on chip health: if the anchor reads degraded, wait (bounded)
        # for the shared host to recover rather than recording a number
        # that measures the neighbor's workload instead of this code.
        for attempt in range(6):
            tf = _sanity_anchor_tflops()
            anchor_tf = tf
            print(f"[bench] sanity anchor: {tf:.1f} TF/s", file=sys.stderr)
            if tf >= 85.0:
                break
            if attempt < 5:
                print("[bench] chip degraded (healthy ≈107); waiting 120 s",
                      file=sys.stderr)
                time.sleep(120)
        else:
            # Anchor never recovered.  Two distinct failure axes (2026-08-19
            # diagnosis): per-call dispatch RTT (~120 ms degraded vs 1.7 ms)
            # and device compute (neighbor load).  If device-side compute is
            # healthy, measure with the scan-chained method (per-step slope
            # between two scan lengths — dispatch cancels exactly) instead of
            # recording a tunnel-latency artifact as the headline.
            ctf = _compute_anchor_tflops()
            print(f"[bench] device-side compute anchor: {ctf:.1f} TF/s",
                  file=sys.stderr)
            if ctf >= 85.0:
                scan_mode = True
                print("[bench] dispatch degraded but compute healthy -> "
                      "scan-chained timing", file=sys.stderr)

    if on_tpu:
        candidates = [128, 256]
        iters = 20
    else:  # smoke mode on CPU
        candidates = [2]
        iters = 2
        size = 64

    best = 0.0
    # The axon-tunneled backend's remote compiles occasionally 500/hang
    # transiently; a failed attempt is retried (fresh sweep) before the
    # bench concedes a 0 — but OOM-style failures still just fall through
    # to the next batch size within a sweep.
    for attempt in range(3 if on_tpu else 1):
        for batch in candidates:
            try:
                rate = time_pipeline(batch, size, dtype, iters, scan_mode=scan_mode)
            except Exception as e:  # OOM etc. — try the next batch size
                print(f"[bench] batch={batch} failed: {e}", file=sys.stderr)
                continue
            print(f"[bench] batch={batch}: {rate:.1f} img/s", file=sys.stderr)
            best = max(best, rate)
        if best > 0.0:
            break
        if attempt < 2 and on_tpu:
            print(f"[bench] sweep {attempt + 1} produced nothing; retrying", file=sys.stderr)
            time.sleep(30)

    out = {
        "metric": "256px_images_per_sec_per_chip_degrade_restore",
        "value": round(best, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(best / BASELINE_IMG_PER_SEC, 4),
    }
    if anchor_tf is not None:
        # Self-describing chip health: the shared axon host intermittently
        # runs the chip at a fraction of its ~107 TF/s anchor; a reading
        # well below that marks this bench value as neighbor-degraded
        # rather than a code regression.
        out["chip_anchor_tflops"] = round(anchor_tf, 1)
        out["chip_anchor_healthy_tflops"] = 107.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
