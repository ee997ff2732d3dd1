"""Generic functional trainer + task protocol.

Re-design of the reference's NATSpeech-style ``Trainer``/``BaseTask`` pair
(``utils/commons/trainer.py:45-563``, ``utils/commons/base_task.py:24-256``):
one generic loop drives every model family; the per-workload code is a Task
subclass named in the config key ``task_cls`` and resolved by reflection
(``tasks/run.py:10-13``).

Differences from the torch design, deliberate for TPU:
- No DDP process spawning: data parallelism is a ``jax.sharding.Mesh`` inside
  the task's jitted ``train_step`` (gradient psum emitted by XLA; SURVEY §2.9).
- No mutable module state: the task owns an explicit ``state`` pytree
  (params, optimizer state, occupancy grids, step), checkpointed whole.
- AMP/GradScaler is unnecessary: bf16 compute needs no loss scaling.
"""

from __future__ import annotations

import importlib
import os
import time
from typing import Any, Iterator

import jax
import numpy as np

from geneface_tpu.config import Config, save_config
from geneface_tpu.utils import CheckpointManager, MeterBank, MetricsLogger

__all__ = ["Task", "Trainer", "resolve_task"]


def resolve_task(task_cls_path: str):
    """``pkg.module.Class`` → class (reference ``tasks/run.py:10-13``)."""
    module, cls = task_cls_path.rsplit(".", 1)
    return getattr(importlib.import_module(module), cls)


class Task:
    """Base task: subclass and implement the four core methods.

    Lifecycle (mirrors ``BaseTask`` hooks): ``build()`` once →
    ``train_step(state, batch, rng)`` per step → periodic
    ``val_step(state, batch, rng)`` sweeps → ``on_save/on_restore`` around
    checkpoints.
    """

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.mesh = None

    # -- mesh / sharding -------------------------------------------------------
    #: batch keys whose LEADING axis is the data axis (rays / frames / clips);
    #: tasks override. Everything else in the batch is replicated.
    data_batch_keys: tuple = ()

    def setup_mesh(self):
        """Build the training mesh: all chips on the ``data`` axis.

        The production replacement for the reference's DDP spawn
        (``utils/commons/trainer.py:117-118,478-498``): every task's
        ``_device_batch`` shards its ray/frame axis over this mesh and XLA
        emits the gradient all-reduce. Disable with ``use_mesh: false``.
        """
        from geneface_tpu.parallel import make_mesh

        if self.cfg.get("use_mesh", True) and len(jax.devices()) > 1:
            self.mesh = make_mesh()
        return self.mesh

    def place_batch(self, batch: dict) -> dict:
        """Shard ``data_batch_keys`` leaves over the mesh, replicate the rest."""
        if self.mesh is None:
            import jax.numpy as jnp

            return {k: jnp.asarray(v) for k, v in batch.items()}
        from geneface_tpu.parallel import put_sharded, replicated, shard_batch

        sharded = shard_batch(
            self.mesh, {k: batch[k] for k in self.data_batch_keys if k in batch}
        )
        rep = replicated(self.mesh)
        for k, v in batch.items():
            if k not in sharded:
                sharded[k] = put_sharded(self.mesh, v, rep)
        return sharded

    def place_state(self, state):
        """Replicate the train state (params/opt/aux grids) over the mesh."""
        if self.mesh is None:
            return state
        from geneface_tpu.parallel import put_sharded, replicated

        rep = replicated(self.mesh)
        return jax.tree_util.tree_map(
            lambda x: put_sharded(self.mesh, x, rep) if hasattr(x, "ndim") else x,
            state,
        )

    # -- required ------------------------------------------------------------
    def build(self) -> Any:
        """Create model/optimizer/datasets; return the initial state pytree."""
        raise NotImplementedError

    def train_step(self, state, batch, rng):
        """→ (new_state, metrics dict of scalars)."""
        raise NotImplementedError

    def val_step(self, state, batch, rng):
        """→ metrics dict; must include ``total_loss`` (val selection key)."""
        raise NotImplementedError

    def train_batches(self, start_step: int) -> Iterator:
        raise NotImplementedError

    def val_batches(self) -> Iterator:
        raise NotImplementedError

    # -- optional hooks ------------------------------------------------------
    def on_train_start(self, state):
        return state

    def on_save(self, state) -> dict:
        """Extra host-side payload to checkpoint alongside the state."""
        return {}

    def on_restore(self, state, extra: dict):
        return state

    def on_validation_end(self, state, step: int, logger) -> None:
        """Called after each logged validation sweep — tasks may render
        human-checkable artifacts (e.g. a full val frame) to ``logger``."""

    @classmethod
    def start(cls, cfg: Config):
        """CLI entry (reference ``BaseTask.start``/``tasks/run.py``):
        ``--infer`` dispatches to the task family's inference pipeline,
        otherwise train."""
        if cfg.get("infer", False):
            return cls.run_inference(cfg)
        trainer = Trainer(cls(cfg))
        trainer.fit()
        return trainer

    @classmethod
    def run_inference(cls, cfg: Config):
        """Run this task family's inference pipeline (reference
        ``inference/*/..._infer.example_run``). Overridden per task."""
        raise NotImplementedError(
            f"{cls.__name__} has no inference pipeline; see "
            "geneface_tpu.inference for the available drivers"
        )


def tee_terminal_logs(work_dir: str):
    """Mirror stdout/stderr to ``work_dir/terminal_logs/log_<ts>.txt``
    (reference ``utils/commons/trainer.py:27-43,541-544``). Returns the tee
    object; safe to call multiple times (later calls stack)."""
    import sys
    from datetime import datetime

    log_dir = os.path.join(work_dir, "terminal_logs")
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(
        log_dir, f"log_{datetime.now().strftime('%Y%m%d%H%M%S')}.txt"
    )
    f = open(path, "a", buffering=1)

    class _Tee:
        def __init__(self, stream):
            self.stream = stream

        def write(self, data):
            self.stream.write(data)
            f.write(data)

        def flush(self):
            self.stream.flush()
            f.flush()

    sys.stdout = _Tee(sys.stdout)
    sys.stderr = _Tee(sys.stderr)
    return f


def snapshot_code(work_dir: str, src_root: str | None = None):
    """Copy the framework sources into ``work_dir/codes/<ts>/`` for experiment
    provenance (reference ``trainer.py:546-562`` rsyncs the repo). Only
    ``.py``/``.yaml`` files are copied."""
    import shutil
    from datetime import datetime

    if src_root is None:
        src_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(
        work_dir, "codes", datetime.now().strftime("%Y%m%d%H%M%S")
    )
    for root, _dirs, files in os.walk(src_root):
        if any(p in root for p in ("__pycache__", ".git", "checkpoints")):
            continue
        rel = os.path.relpath(root, src_root)
        for name in files:
            if not name.endswith((".py", ".yaml", ".yml", ".cpp")):
                continue
            os.makedirs(os.path.join(dst, rel), exist_ok=True)
            shutil.copy2(
                os.path.join(root, name), os.path.join(dst, rel, name)
            )
    return dst


class Trainer:
    def __init__(self, task: Task):
        from geneface_tpu import _enable_persistent_compile_cache

        _enable_persistent_compile_cache(_force=True)
        self.task = task
        self.cfg = task.cfg
        self.work_dir = self.cfg.get("work_dir") or os.path.join(
            "checkpoints", self.cfg.get("exp_name", "default")
        )
        os.makedirs(self.work_dir, exist_ok=True)
        save_config(self.cfg, self.work_dir)
        if self.cfg.get("tee_logs", False):
            tee_terminal_logs(self.work_dir)
        if self.cfg.get("save_codes", False):
            snapshot_code(self.work_dir)
        self.logger = MetricsLogger(self.work_dir)
        self.ckpt = CheckpointManager(
            self.work_dir,
            num_keep=self.cfg.get("num_ckpt_keep", 2),
            save_best=self.cfg.get("save_best", True),
            mode=self.cfg.get("valid_monitor_mode", "min"),
        )

    # ------------------------------------------------------------------ fit --
    def fit(self):
        cfg = self.cfg
        self.task.setup_mesh()
        state = self.task.build()
        step = 0

        restored = self.ckpt.restore(cfg.get("resume_from_checkpoint", 0) or None)
        if restored is not None:
            step = int(restored["step"])
            state = jax.tree_util.tree_map(
                lambda t, s: jax.numpy.asarray(s) if hasattr(t, "dtype") else s,
                state,
                restored["state"],
            )
            state = self.task.on_restore(state, restored.get("extra", {}))
            print(f"| resumed from step {step}")

        state = self.task.place_state(state)
        state = self.task.on_train_start(state)
        rng = jax.random.PRNGKey(cfg.get("seed", 9999))

        # sanity validation (trainer.py:259-261)
        n_sanity = cfg.get("num_sanity_val_steps", 2)
        if n_sanity and restored is None:
            self._validate(state, rng, max_batches=n_sanity, step=step, log=False)

        max_updates = int(cfg.get("max_updates", 10000))
        val_interval = int(cfg.get("val_check_interval", 2000))
        log_interval = int(cfg.get("tb_log_interval", 100))
        # device-trace hook (SURVEY §5 tracing/profiling): profile_steps > 0
        # captures a jax.profiler trace of steps [profile_start_step,
        # profile_start_step + profile_steps) to <work_dir>/profile
        # (viewable in TensorBoard / xprof).
        prof_steps = int(cfg.get("profile_steps", 0))
        prof_start = int(cfg.get("profile_start_step", 10))
        meters = MeterBank()
        t_last = time.time()
        train_iter = self.task.train_batches(step)

        while step < max_updates:
            if prof_steps and step == prof_start:
                jax.profiler.start_trace(os.path.join(self.work_dir, "profile"))
            batch = next(train_iter)
            rng, step_rng = jax.random.split(rng)
            state, metrics = self.task.train_step(state, batch, step_rng)
            step += 1
            if prof_steps and step == prof_start + prof_steps:
                jax.block_until_ready(
                    [v for v in metrics.values() if hasattr(v, "block_until_ready")]
                )
                jax.profiler.stop_trace()
                print(f"| wrote device trace to {self.work_dir}/profile")
            meters.update(metrics)

            if step % log_interval == 0:
                avgs = meters.averages()
                meters.reset()
                dt = time.time() - t_last
                t_last = time.time()
                avgs["steps_per_sec"] = log_interval / max(dt, 1e-9)
                self.logger.log_scalars(avgs, step, prefix="tr/")
                loss_str = ", ".join(
                    f"{k}={v:.4g}" for k, v in sorted(avgs.items())
                )
                print(f"| step {step}: {loss_str}", flush=True)

            if step % val_interval == 0 or step == max_updates:
                rng, val_rng = jax.random.split(rng)
                val_loss = self._validate(state, val_rng, step=step)
                payload = {
                    "step": step,
                    "state": state,
                    "extra": self.task.on_save(state),
                }
                self.ckpt.save(step, payload, val_metric=val_loss)
        return state

    def _validate(self, state, rng, step=0, max_batches=None, log=True):
        cfg = self.cfg
        max_batches = max_batches or cfg.get("eval_max_batches", 100)
        meters = MeterBank()
        for i, batch in enumerate(self.task.val_batches()):
            if i >= max_batches:
                break
            rng, k = jax.random.split(rng)
            metrics = self.task.val_step(state, batch, k)
            meters.update(metrics)
        avgs = meters.averages()
        if log and avgs:
            self.logger.log_scalars(avgs, step, prefix="val/")
            print(
                f"| validation @ {step}: "
                + ", ".join(f"{k}={v:.4g}" for k, v in sorted(avgs.items())),
                flush=True,
            )
            self.task.on_validation_end(state, step, self.logger)
        key = cfg.get("valid_monitor_key", "total_loss")
        return avgs.get(key, avgs.get("total_loss", float("nan")))
