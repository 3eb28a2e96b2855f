"""Train/eval engine: functional, jit-compiled, donate-buffered.

Behavioral parity with the reference engine (``models/base.py:11-55`` and
``models/model.py:25-363`` in /root/reference):

  * same constructor contract (``Model(network, config=…, dataloader=…,
    logger=…)``) and config keys (loss/metrics/post_processing/evaluation/
    save_outputs/logging/checkpoints/train/test);
  * Adam at ``train.lr``, best-checkpoint-by-train-loss to
    ``model_path/model_name``, optional periodic epoch checkpoints, best-copy
    into the run dir;
  * test phase: paired loop with PRE (raw) / POST (post-processed) dual
    evaluation, per-batch-averaged losses+metrics (matching the reference's
    batch-mean-of-batches averaging, ``models/model.py:289-295``), PNG output
    saving with the same ``save_outputs`` knobs, unpaired branch;
  * identical logger row schemas (type/epoch/epoch_time_sec/lr/…,
    ``loss_*``/``metric_*`` columns).

TPU-first differences:
  * the train step is one jitted function (forward + loss + backward + Adam
    + BN-stats update) with donated state — no per-batch host sync; epoch
    losses accumulate as device scalars and sync once per epoch (the
    reference calls ``loss.item()`` every batch, ``models/model.py:168``);
  * mixed precision is bf16 compute (no GradScaler — bf16 needs no loss
    scaling), controlled by ``train.precision`` ("bf16"|"fp32", default bf16
    on TPU);
  * full-state resume via Orbax (``train.resume`` → checkpoint dir), a
    capability the reference lacks;
  * optional data-parallel sharding over a device mesh (``train.mesh``),
    see ``parallel.mesh``.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from multi_degradation_image_enhancement_tpu.engine import checkpoint as ckpt
from multi_degradation_image_enhancement_tpu.engine.state import TrainState
from multi_degradation_image_enhancement_tpu.ops.losses import build_loss_pipeline
from multi_degradation_image_enhancement_tpu.ops.metrics import build_metrics_pipeline
from multi_degradation_image_enhancement_tpu.ops.post_processing import apply_postprocessing

try:
    from tqdm import tqdm
except Exception:  # pragma: no cover
    def tqdm(x, **kwargs):
        return x


def make_train_step(network, loss_pipe, remat: bool = False):
    """One SGD step as a pure function: forward + loss + backward + Adam + BN.

    Shared by the engine and by sharded/multi-chip entry points: under
    ``jit`` with a sharded batch and replicated params, XLA inserts the
    gradient all-reduce (and makes BatchNorm effectively sync-BN, since batch
    reductions span the global batch) — no hand-written collectives.

    ``remat=True`` rematerializes the forward during backward
    (``jax.checkpoint``) — trades FLOPs for activation memory, enabling
    larger per-chip batches.
    """

    if remat and hasattr(network, "remat"):
        # Per-block rematerialization inside the model (nn.checkpoint around
        # every ConvBlock/DenseBlock/CBAM) — this is what actually lowers
        # peak activation memory.  Parameter tree is unchanged.
        import dataclasses

        network = dataclasses.replace(network, remat=True)

    def forward(params, batch_stats, inputs, dropout_key):
        return network.apply(
            {"params": params, "batch_stats": batch_stats},
            inputs,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_key},
        )

    if remat and not hasattr(network, "remat"):
        # Fallback for networks without a remat switch: whole-forward
        # checkpoint (weaker — saves only cross-boundary residuals).
        forward = jax.checkpoint(forward)

    def step(state: TrainState, inputs, targets, dropout_key, mask=None):
        def loss_fn(params):
            outputs, mutated = forward(params, state.batch_stats, inputs, dropout_key)
            loss_dict = loss_pipe(
                outputs, targets=targets, inputs=inputs, is_paired=True, mask=mask,
                training=True,
            )
            return loss_dict["total"], (loss_dict, mutated)

        (_, (loss_dict, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads).replace(batch_stats=mutated["batch_stats"])
        return new_state, loss_dict

    return step


def _unpack_paired(batch):
    """(inputs, targets[, mask]) -> (inputs, targets, mask-or-None).

    Accepts both the padded-loader 3-tuple and legacy 2-tuples (tests,
    external iterables).
    """
    if isinstance(batch, (tuple, list)) and len(batch) == 3:
        return batch[0], batch[1], batch[2]
    inputs, targets = batch
    return inputs, targets, None


def _unpack_single(batch):
    """inputs or (inputs, mask) -> (inputs, mask-or-None)."""
    if isinstance(batch, (tuple, list)) and len(batch) == 2:
        return batch[0], batch[1]
    return batch, None


def _n_valid(x, mask) -> int:
    return int(x.shape[0]) if mask is None else int(np.sum(np.asarray(mask)))


def _mean_of_dicts(dicts: List[Dict[str, jax.Array]]) -> Dict[str, float]:
    """Average a list of device-scalar dicts; one host sync total."""
    if not dicts:
        return {}
    keys = dicts[0].keys()
    stacked = {k: jnp.stack([d[k] for d in dicts]) for k in keys}
    means = jax.device_get({k: jnp.mean(v) for k, v in stacked.items()})
    return {k: float(v) for k, v in means.items()}


class BaseModel:
    """Config plumbing shared by engines (reference ``models/base.py:11-55``)."""

    def __init__(self, config, dataloader, logger=None):
        self.config = config
        self.phase = config["phase"]

        # Device strings like "cuda" are accepted for config compatibility;
        # placement is decided by JAX (TPU when present).
        self.device = config[self.phase]["device"]
        self.batch_size = config[self.phase]["dataloader"]["args"]["batch_size"]
        self.epoch = config["train"]["n_epoch"]
        self.lr = config["train"]["lr"]

        test_cfg = config.get("test", {}) or {}
        test_dataset_cfg = test_cfg.get("dataset", {}) or {}
        self.is_dataset_paired = bool(
            True if test_dataset_cfg.get("is_paired") is None else test_dataset_cfg["is_paired"]
        )
        self.dataloader = dataloader

        self.model_path = config[self.phase]["model_path"]
        self.model_name = config[self.phase]["model_name"]
        self.output_images_path = test_cfg.get("output_images_path", "outputs/")
        self.logger = logger

    def train(self):
        since = time.time()
        self.train_step()
        t = time.time() - since
        print(f"Training completed in {t//60:.0f}m {t%60:.0f}s")

    def test(self):
        self.test_step()

    def train_step(self):
        raise NotImplementedError

    def val_step(self):
        raise NotImplementedError

    def save_model(self, params, batch_stats):
        path = os.path.join(self.model_path, self.model_name)
        ckpt.save_weights(path, params, batch_stats)


class Model(BaseModel):
    """The restoration engine (reference ``models/model.py:25-363``)."""

    def __init__(self, network, **kwargs):
        super().__init__(**kwargs)
        cfg = self.config

        # ---- precision policy ----
        precision = (cfg.get("train", {}) or {}).get("precision")
        if precision is None:
            precision = "bf16" if jax.default_backend() not in ("cpu",) else "fp32"
        self.precision = precision
        if precision == "bf16" and hasattr(network, "dtype"):
            network = network.clone(dtype=jnp.bfloat16)
        # train.fused_dense routes DenseBlocks through the trainable
        # channel-major Pallas kernel (custom VJP, ops/pallas/growth_train.py)
        if (cfg.get("train", {}) or {}).get("fused_dense") and hasattr(
            network, "fused_dense"
        ):
            network = network.clone(fused_dense=True)
        self.network = network

        # ---- optimizer: Adam at train.lr, optionally under a decay schedule.
        # The reference trains at a constant lr for the whole recipe
        # (/root/reference/models/model.py:30, config n_epoch=80 lr=1e-3);
        # ``train.lr_schedule`` is a framework extension (off by default —
        # every shipped config matches the reference's constant-lr recipe).
        # Accepted: "cosine" | {"name": "cosine", "args": {"alpha": 0.01,
        # "decay_steps": N}} — decay_steps defaults to the full run length.
        lr_or_schedule = self.lr
        sched_cfg = (cfg.get("train", {}) or {}).get("lr_schedule")
        if sched_cfg:
            name = sched_cfg if isinstance(sched_cfg, str) else sched_cfg.get("name")
            args = {} if isinstance(sched_cfg, str) else dict(sched_cfg.get("args") or {})
            try:
                total_steps = self.epoch * max(len(self.dataloader), 1)
            except TypeError:  # unsized loader: fall back to epoch count
                total_steps = self.epoch
            decay_steps = int(args.get("decay_steps", total_steps))
            if name == "cosine":
                lr_or_schedule = optax.cosine_decay_schedule(
                    init_value=self.lr,
                    decay_steps=decay_steps,
                    alpha=float(args.get("alpha", 0.01)),
                )
            elif name == "linear":
                lr_or_schedule = optax.linear_schedule(
                    init_value=self.lr,
                    end_value=float(args.get("end_value", self.lr * 0.01)),
                    transition_steps=decay_steps,
                )
            else:
                raise ValueError(f"unknown train.lr_schedule: {name!r}")

        grad_clip = (cfg.get("train", {}) or {}).get("grad_clip")
        if grad_clip:
            self.tx = optax.chain(
                optax.clip_by_global_norm(float(grad_clip)), optax.adam(lr_or_schedule)
            )
        else:
            self.tx = optax.adam(lr_or_schedule)

        # ---- pipelines from config ----
        self.loss_cfg = cfg.get("loss", {}) or {}
        self.metrics_cfg = cfg.get("metrics", {"enabled": False}) or {"enabled": False}
        self.loss_pipe = build_loss_pipeline(self.loss_cfg, device=self.device)
        self.metrics_pipe = build_metrics_pipeline(self.metrics_cfg, device=self.device)
        self.postproc_cfg = cfg.get("post_processing", {"enabled": False}) or {"enabled": False}

        # ---- output saving ----
        self.save_cfg = dict(cfg.get("save_outputs", {}) or {})
        self.save_cfg.setdefault("output_dir", self.output_images_path)
        self.save_cfg.setdefault("save_raw", False)
        self.save_cfg.setdefault("save_postprocessed", True)
        self.save_cfg.setdefault("raw_prefix", "raw_")
        self.save_cfg.setdefault("post_prefix", self.save_cfg.get("prefix", "output_"))

        # ---- evaluation controls ----
        eval_cfg = cfg.get("evaluation", {}) or {}
        self.eval_on_raw = bool(True if eval_cfg.get("raw") is None else eval_cfg["raw"])
        post_default = bool(self.postproc_cfg.get("enabled", False))
        self.eval_on_post = bool(
            post_default if eval_cfg.get("postprocessed") is None else eval_cfg["postprocessed"]
        )

        # ---- logging / checkpoints ----
        log_cfg = cfg.get("logging", {}) or {}
        self.logging_enabled = bool(log_cfg.get("enabled", False))
        self.train_log_every = int((log_cfg.get("train", {}) or {}).get("log_every_n_batches", 0) or 0)
        ckpt_cfg = log_cfg.get("checkpoints", {}) or {}
        self.ckpt_enabled = bool(ckpt_cfg.get("enabled", False))
        self.ckpt_every = int(ckpt_cfg.get("every_n_epochs", 10) or 10)

        self.seed = int((cfg.get("train", {}) or {}).get("seed", 42) or 42)
        self.best_loss = float("inf")

        # ---- profiling (jax.profiler trace; SURVEY §5 "tracing: none" gap) ----
        prof_cfg = log_cfg.get("profiler", {}) or {}
        self.profile_epochs = set(prof_cfg.get("trace_epochs", []) or []) if bool(
            prof_cfg.get("enabled", False)
        ) else set()

        # train.scan_chunk: K>1 chains K optimizer steps inside ONE jitted
        # lax.scan (device-side loop, TrainState carry) so per-step host
        # dispatch overhead amortizes K-fold.  Off by default (K<=1).
        self.scan_chunk = int((cfg.get("train", {}) or {}).get("scan_chunk", 0) or 0)

        self.state: Optional[TrainState] = None
        self._jit_train_step = None
        self._jit_eval_step = None
        self._scan_train_fn = None
        self._writer_pool = None
        self._writer_futures: List[Any] = []

        # Results must be self-describing about perceptual-weight parity:
        # record which feature nets run on converted pretrained weights vs
        # seeded random frozen features (ops/perceptual.py fallback), now
        # that the loss/metric pipelines above have instantiated them.
        from multi_degradation_image_enhancement_tpu.ops.perceptual import weight_status

        status = weight_status()
        if status and self.logging_enabled and self.logger is not None:
            self.logger.set_summary({"pretrained_weights": status})

    # ------------------------------------------------------------------ #
    # state init
    # ------------------------------------------------------------------ #

    def _init_state(self, sample_inputs: jax.Array) -> TrainState:
        variables = self.network.init(
            {"params": jax.random.key(self.seed), "dropout": jax.random.key(self.seed + 1)},
            jnp.zeros_like(sample_inputs),
            train=True,
        )
        params = variables["params"]
        if (self.config.get("train", {}) or {}).get("torch_init"):
            # Parity knob: re-draw conv/dense weights with torch-default
            # statistics (kaiming_uniform a=√5 + uniform bias) — see
            # models/torch_init.py for the measured rationale.
            from multi_degradation_image_enhancement_tpu.models.torch_init import (
                torch_reinit,
            )

            params = torch_reinit(params, jax.random.key(self.seed + 2))
            print("[ENGINE] torch-default re-initialization applied")
        return TrainState.create(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            tx=self.tx,
        )

    def _build_train_step(self):
        remat = bool((self.config.get("train", {}) or {}).get("remat", False))
        step = make_train_step(self.network, self.loss_pipe, remat=remat)
        mesh_cfg = (self.config.get("train", {}) or {}).get("mesh")
        if mesh_cfg:
            from multi_degradation_image_enhancement_tpu.parallel.mesh import (
                create_mesh,
                shard_train_step,
            )

            mesh = create_mesh(mesh_cfg)
            return shard_train_step(step, mesh)
        return jax.jit(step, donate_argnums=(0,))

    def _build_scan_train_step(self, chunk: int):
        """``chunk`` optimizer steps chained inside one jitted ``lax.scan``.

        The carry is the full (donated) TrainState; xs are the stacked batch
        tensors, dropout keys, masks, and a per-step ``valid`` flag.  Invalid
        (tail-padding) steps where-merge the old state back so they are exact
        no-ops — one program compiles per (batch-shape, chunk) regardless of
        dataset length, and semantics match the host loop bit-for-bit (same
        ``make_train_step``, same key schedule, same step order).

        TPU-first rationale: the host loop pays one dispatch round-trip per
        optimizer step; the reference's torch loop has the same shape
        (``/root/reference/models/model.py:175-227``).  On a remote/tunneled
        device that round-trip can exceed the step itself, and even locally
        a device-side loop lets XLA overlap the next step's prologue —
        chaining in ``lax.scan`` makes epoch time pure device time
        (methodology validated in benchmarks/profile_train_scan.py).
        """
        remat = bool((self.config.get("train", {}) or {}).get("remat", False))
        step = make_train_step(self.network, self.loss_pipe, remat=remat)

        def chunk_fn(state: TrainState, xs):
            def body(st, x):
                inputs, targets, key, mask, valid = x
                new_state, loss_dict = step(st, inputs, targets, key, mask)
                merged = jax.tree.map(
                    lambda n, o: jnp.where(valid, n, o), new_state, st
                )
                return merged, loss_dict

            return jax.lax.scan(body, state, xs)

        mesh_cfg = (self.config.get("train", {}) or {}).get("mesh")
        if mesh_cfg:
            from multi_degradation_image_enhancement_tpu.parallel.mesh import (
                create_mesh,
                shard_scan_train_step,
            )

            return shard_scan_train_step(chunk_fn, create_mesh(mesh_cfg))
        return jax.jit(chunk_fn, donate_argnums=(0,))

    def _train_epoch_scan(self, epoch: int, root_key, resume_dir, iterator):
        """One training epoch in scan-chunk mode.

        Collects ``self.scan_chunk`` batches, stacks them host-side (one
        transfer per chunk), runs the chained scan, and unstacks the per-step
        loss dicts for logging.  The final partial chunk is padded with the
        last batch under ``valid=0`` (state where-merges to a no-op), so the
        scan program compiles exactly once.
        """
        K = self.scan_chunk
        pend: List[Any] = []
        batch_dicts: List[Dict[str, Any]] = []
        n_images = 0

        def flush():
            if not pend:
                return
            n_real = len(pend)
            while len(pend) < K:
                i_l, t_l, k_l, m_l, _, idx_l = pend[-1]
                pend.append((i_l, t_l, k_l, np.zeros_like(m_l), False, idx_l))
            xs = (
                jnp.stack([p[0] for p in pend]),
                jnp.stack([p[1] for p in pend]),
                jnp.stack([p[2] for p in pend]),
                jnp.stack([p[3] for p in pend]),
                jnp.asarray([p[4] for p in pend]),
            )
            self.state, stacked = self._scan_train_fn(self.state, xs)
            host = jax.device_get(stacked)
            for j in range(n_real):
                d = {k: float(v[j]) for k, v in host.items()}
                batch_dicts.append(d)
                step_i = pend[j][5]
                if (
                    self.logging_enabled
                    and self.logger is not None
                    and self.train_log_every > 0
                    and (step_i + 1) % self.train_log_every == 0
                ):
                    row = {"type": "batch", "epoch": epoch + 1, "step": step_i + 1}
                    for k, v in d.items():
                        row[f"loss_{k}"] = v
                    self.logger.log_train(row)
            pend.clear()

        for step_i, batch in iterator:
            inputs, targets, mask = _unpack_paired(batch)
            if mask is None:
                mask = np.ones((inputs.shape[0],), np.float32)
            if self.state is None:
                self.state = self._init_state(inputs)
                if resume_dir:
                    self.state = ckpt.restore_train_state(resume_dir, self.state)
                    print(
                        f"[CKPT] Resumed from {resume_dir} at step {int(self.state.step)}"
                    )
                self._scan_train_fn = self._build_scan_train_step(self.scan_chunk)
            key = jax.random.fold_in(root_key, epoch * 100003 + step_i)
            pend.append((inputs, targets, key, mask, True, step_i))
            n_images += int(np.sum(np.asarray(mask)))
            if len(pend) == K:
                flush()
        flush()
        return batch_dicts, n_images

    def _fused_eval_forward(self, params, batch_stats):
        """Fused serving forward (Pallas DenseBlocks + BN-folded convs), or None.

        Controlled by ``test.fused_kernels`` / ``model.fused_kernels``:
        ``true`` forces it (interpreter-mode kernels on CPU — slow, tests
        only), ``false`` disables, absent/"auto" enables it on TPU whenever
        the network is the CDAN tree it understands.
        """
        flag = (self.config.get("test", {}) or {}).get("fused_kernels")
        if flag is None:
            flag = (self.config.get("model", {}) or {}).get("fused_kernels", "auto")
        on_cpu = jax.default_backend() == "cpu"
        if flag is False or (flag == "auto" and on_cpu):
            return None
        try:
            from multi_degradation_image_enhancement_tpu.models.cdan_fast import (
                build_serving_apply,
            )

            dtype = jnp.bfloat16 if self.precision == "bf16" else jnp.float32
            return build_serving_apply(
                {"params": params, "batch_stats": batch_stats}, dtype, interpret=on_cpu
            )
        except (KeyError, AttributeError) as e:
            if flag is True:
                raise RuntimeError(
                    f"fused_kernels=true but the network tree is not CDAN-shaped: {e}"
                )
            return None  # auto: non-CDAN network — keep the module path

    def _build_eval_step(self, params=None, batch_stats=None):
        network = self.network
        loss_pipe = self.loss_pipe
        metrics_pipe = self.metrics_pipe
        postproc_cfg = self.postproc_cfg
        eval_on_raw = self.eval_on_raw
        eval_on_post = self.eval_on_post and bool(postproc_cfg.get("enabled", False))

        fused_fwd = None
        if params is not None:
            fused_fwd = self._fused_eval_forward(params, batch_stats)
            if fused_fwd is not None:
                print("[ENGINE] fused inference kernels active (Pallas DenseBlocks)")

        def step(params, batch_stats, inputs, targets, mask=None):
            if fused_fwd is not None:
                outputs = fused_fwd(inputs)
            else:
                outputs = network.apply(
                    {"params": params, "batch_stats": batch_stats}, inputs, train=False
                )
            pp_outputs = apply_postprocessing(outputs, postproc_cfg)
            result = {"raw": outputs, "post": pp_outputs}
            if targets is not None:
                if eval_on_raw:
                    result["pre_loss"] = loss_pipe(
                        outputs, targets=targets, inputs=inputs, mask=mask
                    )
                    result["pre_metric"] = metrics_pipe(
                        outputs, targets=targets, inputs=inputs, mask=mask
                    )
                if eval_on_post:
                    result["post_loss"] = loss_pipe(
                        pp_outputs, targets=targets, inputs=inputs, mask=mask
                    )
                    result["post_metric"] = metrics_pipe(
                        pp_outputs, targets=targets, inputs=inputs, mask=mask
                    )
            return result

        return jax.jit(step, static_argnames=())

    # ------------------------------------------------------------------ #
    # training
    # ------------------------------------------------------------------ #

    def train_step(self):
        root_key = jax.random.key(self.seed)
        train_fn = None
        resume_dir = (self.config.get("train", {}) or {}).get("resume")
        scan_mode = self.scan_chunk > 1

        for epoch in range(self.epoch):
            t0 = time.time()
            batch_dicts: List[Dict[str, jax.Array]] = []
            n_images = 0

            trace_ctx = None
            if (epoch + 1) in self.profile_epochs and self.logger and self.logger.run_dir():
                trace_dir = os.path.join(self.logger.run_dir(), "profile")
                trace_ctx = jax.profiler.trace(trace_dir)
                trace_ctx.__enter__()
                print(f"[PROFILER] tracing epoch {epoch+1} -> {trace_dir}")

            iterator = tqdm(
                enumerate(self.dataloader),
                desc=f"Training... Epoch: {epoch+1}/{self.epoch}",
                total=len(self.dataloader),
            )
            if scan_mode:
                batch_dicts, n_images = self._train_epoch_scan(
                    epoch, root_key, resume_dir, iterator
                )
            else:
                for step_i, batch in iterator:
                    inputs, targets, mask = _unpack_paired(batch)
                    if self.state is None:
                        self.state = self._init_state(inputs)
                        if resume_dir:
                            self.state = ckpt.restore_train_state(resume_dir, self.state)
                            print(f"[CKPT] Resumed from {resume_dir} at step {int(self.state.step)}")
                        train_fn = self._build_train_step()

                    dropout_key = jax.random.fold_in(root_key, epoch * 100003 + step_i)
                    self.state, loss_dict = train_fn(
                        self.state, inputs, targets, dropout_key, mask
                    )
                    batch_dicts.append(loss_dict)
                    n_images += (
                        int(inputs.shape[0]) if mask is None else int(np.sum(np.asarray(mask)))
                    )

                    if (
                        self.logging_enabled
                        and self.logger is not None
                        and self.train_log_every > 0
                        and (step_i + 1) % self.train_log_every == 0
                    ):
                        row = {"type": "batch", "epoch": epoch + 1, "step": step_i + 1}
                        for k, v in jax.device_get(loss_dict).items():
                            row[f"loss_{k}"] = float(v)
                        self.logger.log_train(row)

            if trace_ctx is not None:
                trace_ctx.__exit__(None, None, None)

            avg_comps = _mean_of_dicts(batch_dicts)
            epoch_loss = avg_comps.get("total", float("nan"))
            epoch_time = time.time() - t0

            # ---- best checkpoint (train-loss policy, reference parity) ----
            if epoch_loss < self.best_loss:
                self.best_loss = epoch_loss
                self.save_model(self.state.params, self.state.batch_stats)
                self._maybe_copy_best_to_run_dir()

            if self.logging_enabled and self.logger is not None:
                row = {
                    "type": "epoch",
                    "epoch": epoch + 1,
                    "epoch_time_sec": float(epoch_time),
                    "images_per_sec": float(n_images / max(epoch_time, 1e-9)),
                    "lr": float(self.lr),
                    "best_loss_so_far": float(self.best_loss),
                }
                for k, v in avg_comps.items():
                    row[f"loss_{k}"] = float(v)
                self.logger.log_train(row)
                self.logger.set_summary(
                    {
                        "best_train_loss": float(self.best_loss),
                        "epochs_completed": int(epoch + 1),
                    }
                )

            self._maybe_save_epoch_checkpoint(epoch)

            comps_str = ", ".join(
                f"{k}: {v:.4f}" for k, v in avg_comps.items() if k != "total"
            )
            print(
                f"Epoch [{epoch+1}/{self.epoch}] Train total: {epoch_loss:.4f}"
                + (f" | {comps_str}" if comps_str else "")
                + f" | best: {self.best_loss:.4f}"
            )

        self._maybe_recalibrate_bn()

    # ------------------------------------------------------------------ #
    # BatchNorm recalibration ("precise BN")
    # ------------------------------------------------------------------ #

    def _maybe_recalibrate_bn(self):
        recal = (self.config.get("train", {}) or {}).get("bn_recalibration")
        if not recal:
            return
        passes = int(recal.get("passes", 3)) if isinstance(recal, dict) else 3
        self.recalibrate_bn(passes=passes)

    def recalibrate_bn(self, passes: int = 3) -> None:
        """Re-estimate BN running statistics for the served checkpoint.

        The training EMA (momentum 0.9, ~10-step time constant) tracks
        batch statistics of a *moving* network; the stats stored with the
        best checkpoint therefore lag its final weights.  This runs
        ``passes`` frozen-weight, dropout-free forward sweeps over the
        training data in ``stats_refresh`` mode (batch-stats BN with EMA
        updates) and rewrites the checkpoint with the re-centered stats.
        Parameters are untouched.

        Effect is task-dependent (measured on the parity protocol:
        low_light +4.6 dB test PSNR, noise +0.6, blur −1.1 — PARITY.md),
        hence opt-in via ``train.bn_recalibration`` (``true`` or
        ``{"passes": N}``).  The reference has no equivalent.
        """
        if not hasattr(self.network, "stats_refresh"):
            print("[BN-RECAL] network has no stats_refresh mode; skipped")
            return
        def batch_inputs(batch):
            # loaders yield (inputs, targets, mask) / (inputs, mask) / bare
            return batch[0] if isinstance(batch, (tuple, list)) else batch

        if self.state is None:
            for batch in self.dataloader:
                self.state = self._init_state(batch_inputs(batch))
                break
            if self.state is None:
                raise RuntimeError("BN recalibration needs a non-empty dataloader")

        path = os.path.join(self.model_path, self.model_name)
        if not os.path.isfile(path):
            # e.g. every epoch loss was NaN, so save_model never fired
            print(f"[BN-RECAL] no checkpoint at {path} to recalibrate; skipped")
            return
        # Keep the stock stats recoverable: the refresh is task-dependent
        # (blur regresses −0.83 dB, PARITY.md), so an enabled-but-unmeasured
        # config must not destroy the only copy of the original stats.
        try:
            shutil.copyfile(path, path + ".prerecal")
        except Exception:
            pass
        w = ckpt.load_weights(path, self.state.params, self.state.batch_stats)
        refresh_net = self.network.clone(stats_refresh=True)

        @jax.jit
        def refresh(params, batch_stats, inputs):
            _, upd = refresh_net.apply(
                {"params": params, "batch_stats": batch_stats},
                inputs,
                train=False,
                mutable=["batch_stats"],
            )
            return upd["batch_stats"]

        bs = w["batch_stats"]
        for _ in range(passes):
            for batch in self.dataloader:
                bs = refresh(w["params"], bs, batch_inputs(batch))
        self.save_model(w["params"], bs)
        self._maybe_copy_best_to_run_dir()
        if self.logging_enabled and self.logger is not None:
            self.logger.set_summary({"bn_recalibration_passes": int(passes)})
        print(f"[BN-RECAL] checkpoint stats re-estimated ({passes} passes) -> {path}")

    def _maybe_save_epoch_checkpoint(self, epoch_idx_0based: int):
        if not (self.logging_enabled and self.ckpt_enabled and self.logger is not None):
            return
        if self.ckpt_every <= 0:
            return
        epoch_num = epoch_idx_0based + 1
        if epoch_num % self.ckpt_every != 0:
            return
        run_dir = self.logger.run_dir()
        if not run_dir:
            return
        ckpt_dir = os.path.join(run_dir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        ckpt.save_weights(
            os.path.join(ckpt_dir, f"epoch_{epoch_num:03d}.pt"),
            self.state.params,
            self.state.batch_stats,
        )
        # full-state (resumable) checkpoint alongside the weights file
        ckpt.save_train_state(os.path.join(ckpt_dir, f"state_{epoch_num:03d}"), self.state)

    def _maybe_copy_best_to_run_dir(self):
        if not (self.logging_enabled and self.logger is not None):
            return
        run_dir = self.logger.run_dir()
        if not run_dir:
            return
        src = os.path.join(self.model_path, self.model_name)
        if os.path.isfile(src):
            try:
                shutil.copyfile(src, os.path.join(run_dir, "best.pt"))
            except Exception:
                pass

    # ------------------------------------------------------------------ #
    # testing
    # ------------------------------------------------------------------ #

    def _load_for_eval(self):
        """Load weights from model_path/model_name into fresh variables."""
        sample_hw = self.dataloader.dataset.transform.target_hw or (256, 384)
        dummy = jnp.zeros((1, sample_hw[0], sample_hw[1], 3), jnp.float32)
        variables = self.network.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, dummy, train=False
        )
        path = os.path.join(self.model_path, self.model_name)
        loaded = ckpt.load_weights(path, variables["params"], variables.get("batch_stats", {}))
        return loaded["params"], loaded["batch_stats"]

    def _save_batch_outputs(self, outputs: np.ndarray, start_index: int, prefix: str):
        """Queue one batch of outputs for PNG encoding on the writer pool.

        Encoding/writing runs on background threads (same design as the
        serving CLI's ``data/streaming.py`` writer pool) so the next device
        batch never waits on PIL; only the D2H readback happens here.
        ``_drain_writers`` at the end of the test loop surfaces the first
        writer failure.  Reference analogue: the serialized per-image loop in
        ``/root/reference/models/model.py:70-91``.
        """
        if not self.save_cfg.get("enabled", True):
            return
        out_dir = self.save_cfg.get("output_dir", "outputs/")
        os.makedirs(out_dir, exist_ok=True)
        resize_hw = self.save_cfg.get("resize_hw")
        fmt = self.save_cfg.get("format", "png")
        arr = np.clip(np.asarray(outputs) * 255.0, 0, 255).astype(np.uint8)

        def encode(frame, path):
            if resize_hw is not None:
                img = Image.fromarray(frame).resize(
                    (resize_hw[1], resize_hw[0]), Image.BILINEAR
                )
                img.save(path)
                return
            # libpng engine when available (native/mdie_io.cpp; ~1.6× PIL,
            # lossless either way); PIL covers non-PNG formats + fallback.
            if fmt.lower() == "png":
                from multi_degradation_image_enhancement_tpu.data import io_native

                if io_native.encode_png(path, frame):
                    return
            Image.fromarray(frame).save(path)

        if self._writer_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._writer_pool = ThreadPoolExecutor(max_workers=4)
        for i in range(arr.shape[0]):
            self._writer_futures.append(
                self._writer_pool.submit(
                    encode, arr[i], os.path.join(out_dir, f"{prefix}{start_index + i + 1}.{fmt}")
                )
            )

    def _drain_writers(self):
        futures, self._writer_futures = self._writer_futures, []
        for f in futures:
            f.result()

    def test_step(self):
        params, batch_stats = self._load_for_eval()
        eval_fn = self._build_eval_step(params, batch_stats)

        out_counter = 0
        max_save = self.save_cfg.get("max_images")
        pre_loss_sums: Dict[str, float] = {}
        pre_metric_sums: Dict[str, float] = {}
        post_loss_sums: Dict[str, float] = {}
        post_metric_sums: Dict[str, float] = {}
        n_batches = 0
        post_enabled = bool(self.postproc_cfg.get("enabled", False))

        def accumulate(sums: Dict[str, float], d: Dict[str, jax.Array]):
            for k, v in jax.device_get(d).items():
                sums[k] = sums.get(k, 0.0) + float(v)

        if self.is_dataset_paired:
            for batch in tqdm(self.dataloader, desc="Testing..."):
                inputs, targets, mask = _unpack_paired(batch)
                result = eval_fn(params, batch_stats, inputs, targets, mask)
                nv = _n_valid(inputs, mask)

                if self.eval_on_raw:
                    accumulate(pre_loss_sums, result["pre_loss"])
                    accumulate(pre_metric_sums, result["pre_metric"])
                if self.eval_on_post and post_enabled:
                    accumulate(post_loss_sums, result["post_loss"])
                    accumulate(post_metric_sums, result["post_metric"])

                if self.save_cfg.get("enabled", True) and (
                    max_save is None or out_counter < max_save
                ):
                    if self.save_cfg.get("save_raw", False):
                        self._save_batch_outputs(
                            result["raw"][:nv], out_counter, self.save_cfg.get("raw_prefix", "raw_")
                        )
                    if self.save_cfg.get("save_postprocessed", True):
                        self._save_batch_outputs(
                            result["post"][:nv], out_counter, self.save_cfg.get("post_prefix", "output_")
                        )

                out_counter += nv
                n_batches += 1
                if max_save is not None and out_counter >= max_save:
                    break

            self._drain_writers()  # surface any PNG writer failure
            denom = max(1, n_batches)
            pre_loss_avg = {k: v / denom for k, v in pre_loss_sums.items()}
            pre_met_avg = {k: v / denom for k, v in pre_metric_sums.items()}
            post_loss_avg = {k: v / denom for k, v in post_loss_sums.items()}
            post_met_avg = {k: v / denom for k, v in post_metric_sums.items()}

            if self.eval_on_raw:
                print("[PRE]  Losses -> " + ", ".join(f"{k}: {v:.4f}" for k, v in pre_loss_avg.items()))
                if pre_met_avg:
                    print("[PRE]  Metrics -> " + ", ".join(f"{k}: {v:.4f}" for k, v in pre_met_avg.items()))
            if self.eval_on_post and post_enabled:
                print("[POST] Losses -> " + ", ".join(f"{k}: {v:.4f}" for k, v in post_loss_avg.items()))
                if post_met_avg:
                    print("[POST] Metrics -> " + ", ".join(f"{k}: {v:.4f}" for k, v in post_met_avg.items()))

            if self.logging_enabled and self.logger is not None:
                if self.eval_on_raw:
                    row = {"type": "test", "stage": "pre", "batches": int(n_batches)}
                    row.update({f"loss_{k}": v for k, v in pre_loss_avg.items()})
                    row.update({f"metric_{k}": v for k, v in pre_met_avg.items()})
                    self.logger.log_test(row)
                if self.eval_on_post and post_enabled:
                    row = {"type": "test", "stage": "post", "batches": int(n_batches)}
                    row.update({f"loss_{k}": v for k, v in post_loss_avg.items()})
                    row.update({f"metric_{k}": v for k, v in post_met_avg.items()})
                    self.logger.log_test(row)
                self.logger.set_summary(
                    {
                        "best_train_loss": float(self.best_loss),
                        "test_batches": int(n_batches),
                        "post_processing_enabled": post_enabled,
                    }
                )
        else:
            for batch in tqdm(self.dataloader, desc="Testing..."):
                inputs, mask = _unpack_single(batch)
                result = eval_fn(params, batch_stats, inputs, None, mask)
                nv = _n_valid(inputs, mask)
                if self.save_cfg.get("enabled", True) and (
                    max_save is None or out_counter < max_save
                ):
                    if self.save_cfg.get("save_raw", False):
                        self._save_batch_outputs(
                            result["raw"][:nv], out_counter, self.save_cfg.get("raw_prefix", "raw_")
                        )
                    if self.save_cfg.get("save_postprocessed", True):
                        self._save_batch_outputs(
                            result["post"][:nv], out_counter, self.save_cfg.get("post_prefix", "output_")
                        )
                out_counter += nv
                n_batches += 1
                if max_save is not None and out_counter >= max_save:
                    break

            self._drain_writers()  # surface any PNG writer failure
            if self.logging_enabled and self.logger is not None:
                self.logger.log_test({"type": "test", "stage": "unpaired", "batches": int(n_batches)})
                self.logger.set_summary(
                    {
                        "best_train_loss": float(self.best_loss),
                        "test_batches": int(n_batches),
                        "post_processing_enabled": post_enabled,
                    }
                )
