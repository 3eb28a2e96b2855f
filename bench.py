#!/usr/bin/env python
"""Headline benchmark: end-to-end degrade→restore throughput on one chip.

Measures 256×256 images/sec/chip through the full on-device pipeline —
synthetic degradation (``ops.degradations``) + CDAN restoration forward
(bf16 on TPU) — against the ≥5,000 img/s/chip v5e north star in
/root/repo/BASELINE.json (the PyTorch reference publishes no numbers;
BASELINE.md).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N/5000}

Deadline-proof by construction (round-3 postmortem: rc=124, parsed null —
the health gate burned the whole driver budget):
  * best-so-far result is emitted from an ``atexit`` hook AND from
    SIGTERM/SIGINT/SIGHUP handlers, so an external ``timeout`` kill still
    yields a parseable JSON line (annotated, possibly value 0.0);
  * exactly ONE bounded health probe (~<=90 s incl. one optional wait),
    then measurement proceeds REGARDLESS of chip health — degraded
    readings are annotated, never withheld;
  * a hard wall-clock budget (env BENCH_BUDGET_S, default 1500 s) is
    checked between phases and batch candidates, and a SIGALRM fires
    30 s before it to abandon whatever is in flight and emit;
  * a persistent XLA compilation cache (/root/scratch/jaxcache) makes
    repeat runs skip the ~20-40 s compiles entirely.
"""

from __future__ import annotations

import atexit
import json
import os
import signal
import sys
import time

BASELINE_IMG_PER_SEC = 5000.0

_T0 = time.monotonic()
# Generous default: the SIGTERM handler emits best-so-far under any tighter
# external timeout, so the internal budget only needs to beat hangs.
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
_DEADLINE = _T0 + _BUDGET_S

# ---------------------------------------------------------------- emit-on-exit
_RESULT = {
    "metric": "256px_images_per_sec_per_chip_degrade_restore",
    "value": 0.0,
    "unit": "img/s/chip",
    "vs_baseline": 0.0,
    "note": "no measurement completed",
}
_EMITTED = False


def _emit() -> None:
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    try:
        sys.stdout.write(json.dumps(_RESULT) + "\n")
        sys.stdout.flush()
    except Exception:
        pass


def _record(rate: float, **annotations) -> None:
    """Update the best-so-far result the exit hooks will print.

    Annotations only apply when this rate is the new best (ties included),
    so ``timing_method`` always describes the value actually reported."""
    if rate < _RESULT["value"]:
        return
    if rate > 0.0:
        _RESULT["value"] = round(rate, 1)
        _RESULT["vs_baseline"] = round(rate / BASELINE_IMG_PER_SEC, 4)
        if _RESULT.get("note") == "no measurement completed":
            _RESULT.pop("note")
    _RESULT.update(annotations)


def _sig_handler(signum, frame):  # noqa: ANN001
    print(f"[bench] signal {signum} -> emitting best-so-far", file=sys.stderr)
    _emit()
    os._exit(0)


class _BudgetExpired(Exception):
    pass


def _alarm_handler(signum, frame):  # noqa: ANN001
    raise _BudgetExpired()


atexit.register(_emit)
for _sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
    try:
        signal.signal(_sig, _sig_handler)
    except (ValueError, OSError):
        pass
signal.signal(signal.SIGALRM, _alarm_handler)
# Abandon in-flight work 30 s before the external budget so the normal
# emit path still runs even if a compile/readback hangs.  For budgets too
# small for a 30 s margin, fall back to 90% of the budget so the alarm
# still fires BEFORE the deadline (a flat -30 would invert past it).
signal.alarm(max(int(_BUDGET_S) - 30, int(_BUDGET_S * 0.9), 1))


def _time_left() -> float:
    return _DEADLINE - time.monotonic()


# Persistent compilation cache: repeat runs (driver re-invocations, retries)
# skip the 20-40 s XLA compiles entirely.  /root/scratch survives VM resets.
# Exported as the ENV VAR, not just jax.config: the package __init__ only
# respects an existing JAX_COMPILATION_CACHE_DIR — without the export its
# TPU branch would re-point the config at the (cold) ~/.jax_cache when
# build_pipeline imports it, silently dropping the warm cache.
_CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/scratch/jaxcache")
try:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _CACHE_DIR
except OSError:
    _CACHE_DIR = None

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if _CACHE_DIR:
    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


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
        from multi_degradation_image_enhancement_tpu.ops.pallas import noise as _noise

        _tpath = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
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


class PipelineTimer:
    """Throughput with forced execution; one compiled pipeline, two methods.

    ``block_until_ready`` is unreliable on the axon-tunneled TPU backend
    (it returns before execution completes, yielding impossible numbers);
    instead every iteration's output feeds a device-side accumulator and the
    timer closes over a host readback of the final scalar, so no step can be
    elided or outrun the clock.

    ``host_loop`` dispatches iterations from the host — the honest method on
    a healthy tunnel (async dispatch hides the ~1.7 ms RTT behind the ~36 ms
    step), a *lower bound* when per-call dispatch RTT is degraded (observed
    ~120 ms), where it partly measures the tunnel.  ``scan_chain`` chains the
    iterations inside one jitted ``lax.scan`` and fits per-step time as the
    slope between two scan lengths — dispatch cancels exactly, at the cost
    of two extra (slow, cacheable) compiles.  On a healthy tunnel the two
    methods agree.
    """

    def __init__(self, batch: int, size: int, dtype):
        self.batch = batch
        self.step, self.clean = build_pipeline(batch, size, dtype)
        # Serving uses the TPU-native RBG PRNG (XLA RngBitGenerator) for the
        # degradation draws: same N(0,σ) noise semantics, measured ~0.75 ms/
        # step cheaper than threefry at B=128·256² (3.81 → 3.06 ms degrade).
        # Training keeps threefry (bit-reproducible key-derivation story).
        impl = "rbg" if jax.default_backend() != "cpu" else "threefry2x32"
        self.key = jax.random.key(0, impl=impl)

    def host_loop(self, iters: int = 10) -> float:
        step, clean, key = self.step, self.clean, self.key
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
        return self.batch * iters / dt

    def scan_chain(self, iters: int = 20, reps: int = 3) -> float:
        step, clean, key = self.step, self.clean, self.key

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
            for r in range(reps):
                t0 = time.perf_counter()
                float(run(clean, jax.random.fold_in(key, 1000 + r)))
                best = min(best, time.perf_counter() - t0)
            return best

        n1, n2 = max(iters // 4, 2), iters
        per_step = (time_len(n2) - time_len(n1)) / (n2 - n1)
        return self.batch / per_step


def _dispatch_rtt_ms() -> float:
    """Per-call dispatch round-trip of the (possibly tunneled) backend:
    time a trivial jitted readback.  Healthy ≈1.7 ms; degraded ≈120 ms."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def _compute_anchor_tflops() -> float:
    """Device-side chained matmuls (one dispatch): isolates chip compute
    from tunnel dispatch RTT — the two degrade independently on this host.
    Historical healthy reading on this v5e ≈107 TF/s."""
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

    dispatch_degraded = False
    if on_tpu:
        # ONE bounded health probe — never a gate.  Both axes measured
        # (dispatch RTT and device compute); if compute reads degraded and
        # there is budget to spare, wait ONCE (60 s) and re-probe, then
        # measure regardless and annotate.
        try:
            rtt = _dispatch_rtt_ms()
            ctf = _compute_anchor_tflops()
            print(f"[bench] dispatch rtt: {rtt:.1f} ms; compute anchor: "
                  f"{ctf:.1f} TF/s (healthy ≈1.7 ms / ≈107 TF/s)", file=sys.stderr)
            if ctf < 85.0 and _time_left() > 900:
                print("[bench] compute degraded; one 60 s wait", file=sys.stderr)
                time.sleep(60)
                ctf = _compute_anchor_tflops()
                rtt = _dispatch_rtt_ms()
                print(f"[bench] re-probe: rtt {rtt:.1f} ms, compute "
                      f"{ctf:.1f} TF/s", file=sys.stderr)
            # Degraded dispatch RTT makes host-loop timing a lower bound;
            # the scan-chain refinement below then upgrades it.  Round-3
            # lesson: refine whenever dispatch is bad, not only when
            # compute is healthy — and annotate both axes either way.
            dispatch_degraded = rtt > 10.0
            _record(0.0, chip_anchor_tflops=round(ctf, 1),
                    chip_anchor_healthy_tflops=107.0,
                    dispatch_rtt_ms=round(rtt, 2))
            if ctf < 85.0:
                _RESULT["note"] = (
                    "chip compute anchor degraded (neighbor load on shared "
                    "axon host); value is a lower bound for healthy silicon")
        except _BudgetExpired:
            print("[bench] budget expired during health probe", file=sys.stderr)
            _emit()
            return
        except Exception as e:
            print(f"[bench] health probe failed: {e}", file=sys.stderr)

    if not on_tpu:  # smoke mode on CPU
        try:
            timer = PipelineTimer(2, 64, dtype)
            _record(timer.host_loop(iters=2), timing_method="host_loop")
        except Exception as e:
            print(f"[bench] cpu smoke failed: {e}", file=sys.stderr)
        signal.alarm(0)
        _emit()
        return

    # Measurement ladder, cheapest-first so best-so-far is populated early
    # (an external kill then still reports a real number):
    #   1. b128 host-loop (one step compile; honest when healthy, annotated
    #      lower bound when dispatch RTT is degraded);
    #   2. b128 scan-chain refinement when dispatch is degraded (dispatch
    #      cancels in the two-length slope; two extra cacheable compiles);
    #   3. b256 repeat while budget remains.
    # Remote compiles occasionally 500/hang transiently — each rung retries
    # once; every success immediately updates the emit-on-exit result.
    def attempt(fn, label, record_kwargs, tries=2):
        for t in range(tries):
            if _time_left() < 45:
                return
            try:
                rate = fn()
            except _BudgetExpired:
                raise
            except Exception as e:  # OOM / transient compile failure
                print(f"[bench] {label} attempt {t + 1} failed: {e}",
                      file=sys.stderr)
                continue
            print(f"[bench] {label}: {rate:.1f} img/s", file=sys.stderr)
            _record(rate, **record_kwargs)
            return

    try:
        for batch in (128, 256):
            try:
                timer = PipelineTimer(batch, size, dtype)
            except _BudgetExpired:
                raise
            except Exception as e:
                print(f"[bench] batch={batch} build failed: {e}", file=sys.stderr)
                continue
            hl_note = (
                {"timing_method": "host_loop_lower_bound"}
                if dispatch_degraded else {"timing_method": "host_loop"}
            )
            attempt(lambda: timer.host_loop(iters=10), f"b{batch} host_loop", hl_note)
            if dispatch_degraded and _time_left() > 120:
                attempt(lambda: timer.scan_chain(iters=20, reps=2),
                        f"b{batch} scan_chain", {"timing_method": "scan_chain"})
            if _time_left() < 180:
                print("[bench] budget low; stopping ladder", file=sys.stderr)
                break
    except _BudgetExpired:
        print("[bench] budget expired mid-measurement; emitting best-so-far",
              file=sys.stderr)

    signal.alarm(0)
    _emit()


if __name__ == "__main__":
    main()
