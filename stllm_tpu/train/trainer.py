"""Training driver: one jitted step + a thin Python loop.

Replaces both reference trainers (reference: stllm/runners/runner_base.py
epoch loop + stllm/train/stllm_trainer.py HF Trainer subclass). Everything the
reference scattered across DeepSpeed configs, HF TrainingArguments and the
LAVIS runner reduces to:

  - optimizer with LR schedule baked in (optax; per-step schedule like
    optims.py:13-95 — no mutate-param-group dance);
  - the jitted train step (CE + MVM, grad accumulation inside — train/step.py);
  - FSDP x TP sharding applied once to state + every batch (parallel/);
  - MetricLogger with iter/data timing + ETA (common/logging.py mirrors
    logger.py:122-181);
  - orbax checkpoint save/auto-resume (train/checkpoint.py);
  - stats appended as JSON lines to output_dir/log.txt
    (reference: runner_base.py:655-667).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from stllm_tpu.common.logging import MetricLogger, SmoothedValue
from stllm_tpu.parallel.sharding import batch_shardings, stllm_param_shardings
from stllm_tpu.train.checkpoint import CheckpointManager
from stllm_tpu.train.step import (
    TrainState,
    create_train_state,
    default_trainable,
    make_optimizer,
    make_train_step,
    partition_params,
)

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(
        self,
        cfg,                            # STLLMConfig
        params,
        optimizer=None,
        *,
        output_dir: str = "output",
        mesh=None,
        accum_steps: int = 1,
        trainable_fn: Optional[Callable[[str], bool]] = None,
        learning_rate=1e-4,
        weight_decay: float = 0.05,
        max_grad_norm: Optional[float] = 1.0,
        log_freq: int = 10,
        save_freq: int = 1000,
        max_keep: int = 3,
        profile_dir: Optional[str] = None,
        profile_steps: tuple = (2, 5),
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.output_dir = output_dir
        self.log_freq = log_freq
        self.save_freq = save_freq
        os.makedirs(output_dir, exist_ok=True)

        optimizer = optimizer or make_optimizer(
            learning_rate, weight_decay=weight_decay, max_grad_norm=max_grad_norm)
        self.optimizer = optimizer
        trainable_fn = trainable_fn or default_trainable()
        self.state = create_train_state(params, optimizer, trainable_fn)

        if mesh is not None:
            p_sh = stllm_param_shardings(mesh, params)
            t_sh, f_sh = partition_params(p_sh, trainable_fn)
            self.state = self.state._replace(
                params=jax.device_put(self.state.params, t_sh),
                frozen=jax.device_put(self.state.frozen, f_sh),
            )
        _jitted = jax.jit(make_train_step(cfg, optimizer, accum_steps))
        if mesh is not None:
            from stllm_tpu.ops.spmd import kernel_sharding

            # Pallas kernels can't be GSPMD-auto-partitioned; the kernel
            # mesh context makes the dispatchers wrap them in shard_map
            # over the 'data' axis at trace time (ops/spmd.py).
            def _step_fn(state, batch):
                with kernel_sharding(mesh):
                    return _jitted(state, batch)

            self._step_fn = _step_fn
        else:
            self._step_fn = _jitted
        self.ckpt = CheckpointManager(output_dir, max_to_keep=max_keep)
        # profiling (SURVEY §5: the reference has only wall-clock metering;
        # here a jax.profiler trace window captures device timelines)
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps

    # ------------------------------------------------------------------

    def resume_if_available(self) -> int:
        step = self.ckpt.latest_step()
        if step is not None:
            logger.info("Resuming from checkpoint step %d", step)
            self.state = self.ckpt.restore(self.state)
        return int(self.state.step)

    def _put(self, batch: Dict) -> Dict:
        import jax.numpy as jnp

        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            batch = jax.device_put(batch, batch_shardings(self.mesh, batch))
        return batch

    def log_stats(self, stats: Dict) -> None:
        with open(os.path.join(self.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps(stats) + "\n")

    def train(
        self,
        loader: Iterable,
        max_steps: int,
        start_step: Optional[int] = None,
        eval_fn: Optional[Callable[[], float]] = None,
        eval_freq: Optional[int] = None,
        best_mode: str = "max",
    ) -> Dict[str, float]:
        """Run up to ``max_steps`` optimizer steps; returns final averages.

        ``eval_fn`` (returns a scalar metric) runs every ``eval_freq`` steps
        and at the end; when the metric improves, the checkpoint is ALSO
        recorded as the best step in output_dir/best.json (the reference
        runner's valid-split best-checkpoint logic, runner_base.py:366-424,
        without a separate checkpoint_best.pth copy — orbax keeps the step)."""
        start = int(self.state.step) if start_step is None else start_step
        metric_logger = MetricLogger()
        metric_logger.add_meter("loss", SmoothedValue(fmt="{value:.4f}"))

        best = None

        def run_eval(step: int) -> None:
            nonlocal best
            metric = float(eval_fn())
            improved = (best is None
                        or (metric > best if best_mode == "max" else metric < best))
            logger.info("eval @%d: %.5f%s", step, metric,
                        " (best)" if improved else "")
            self.log_stats({"step": step, "eval_metric": metric,
                            "best": improved})
            if improved:
                best = metric
                self.ckpt.save(self.state)
                with open(os.path.join(self.output_dir, "best.json"), "w") as f:
                    json.dump({"step": step, "metric": metric}, f)

        it = iter(loader)
        data_t0 = time.perf_counter()
        for step in range(start, max_steps):
            if self.profile_dir and step == self.profile_steps[0]:
                jax.profiler.start_trace(self.profile_dir)
            batch = self._put(next(it))
            data_time = time.perf_counter() - data_t0
            self.state, metrics = self._step_fn(self.state, batch)
            if self.profile_dir and step + 1 == self.profile_steps[1]:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()
            # async dispatch: only block when we actually print
            if (step + 1) % self.log_freq == 0 or step + 1 == max_steps:
                host = {k: float(v) for k, v in metrics.items()}
                metric_logger.update(data_time=data_time, **host)
                logger.info("step %d/%d  %s", step + 1, max_steps, metric_logger)
                self.log_stats({"step": step + 1, **host})
            if (step + 1) % self.save_freq == 0 or step + 1 == max_steps:
                self.ckpt.save(self.state)
            if eval_fn is not None and eval_freq and (step + 1) % eval_freq == 0:
                run_eval(step + 1)
            data_t0 = time.perf_counter()
        if eval_fn is not None and not (
                eval_freq and max_steps > start and max_steps % eval_freq == 0):
            run_eval(max_steps)
        return {k: m.global_avg for k, m in metric_logger.meters.items()}
