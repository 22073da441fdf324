"""Reranker trainer: pairwise cross-encoder training over the mesh.

Reference: RRTrainer (/root/reference/src/openmatch/trainer/reranker_trainer.py:15-74)
— pos/neg pair batches through RRModel with the mr/smr/bce/ce registry.
Pairwise losses have no cross-example coupling, so data sharding is the
whole story: loss is pmean over the data axis, gradient-identical to DDP.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TrainingArguments
from ..models.rr_model import RRModel
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh, shard_batch
from .state import latest_checkpoint, load_train_state, make_replicated_state, save_train_state

logger = logging.getLogger(__name__)


class RRTrainer:
    def __init__(
        self,
        model: RRModel,
        params: Any,
        train_args: TrainingArguments,
        total_steps: int,
        mesh: Optional[Mesh] = None,
    ):
        self.model = model
        self.args = train_args
        self.mesh = mesh if mesh is not None else make_mesh(train_args.dp_size, train_args.tp_size)
        if self.mesh.shape.get(MODEL_AXIS, 1) > 1:
            raise ValueError(
                "RRTrainer does not implement tensor parallelism: params "
                "would be fully replicated and tp_size would only shrink "
                "the data axis — train with tp_size=1 (DRTrainer is the "
                "TP-capable trainer)")
        self.total_steps = total_steps
        _, self.state = make_replicated_state(
            params, train_args, total_steps, self.mesh)
        self._step_fn = self._build_step()

    def _build_step(self):
        mesh = self.mesh
        base_key = jax.random.PRNGKey(self.args.seed)
        use_dropout = getattr(self.model, "dropout_active", False)

        def loss_fn(params, batch, rng):
            loss, _ = self.model.loss(params, batch["pos_pairs"],
                                      batch["neg_pairs"], dropout_rng=rng)
            return loss

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            rng = (jax.random.fold_in(base_key, state.step)
                   if use_dropout else None)
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
            return state.apply_gradients(grads), loss

        return step

    def train_step(self, batch) -> float:
        with self.mesh:
            batch = shard_batch(batch, self.mesh)
            self.state, loss = self._step_fn(self.state, batch)
        return loss

    def train(self, data_iter: Iterable) -> Dict[str, Any]:
        args = self.args
        losses, log_loss, t0 = [], 0.0, time.time()
        # host-side step mirror: train_step advances state.step by exactly
        # 1, so per-step int(self.state.step)/float(loss) readbacks (a
        # device->host sync each, ~27 ms through the tunnel) are avoided;
        # the loss accumulates as a device value and syncs only at the
        # logging boundary, divided by the ACTUAL window size (a resume
        # mid-window no longer under-reports the first average)
        step, window = int(self.state.step), 0
        for batch in data_iter:
            if self.total_steps > 0 and step >= self.total_steps:
                break
            log_loss = log_loss + self.train_step(batch)
            step += 1
            window += 1
            if step % args.logging_steps == 0:
                avg = float(log_loss) / window
                logger.info(f"step {step}/{self.total_steps} loss {avg:.4f}")
                losses.append(avg)
                log_loss, window, t0 = 0.0, 0, time.time()
            if args.save_steps and step % args.save_steps == 0:
                self.save_checkpoint()
        return {"losses": losses, "final_step": int(self.state.step)}

    def save_checkpoint(self, output_dir: Optional[str] = None):
        step = int(self.state.step)
        out = output_dir or os.path.join(self.args.output_dir, f"checkpoint-{step}")
        self.model.save(jax.device_get(self.state.params), out)
        save_train_state(self.state, out)
        return out

    def save_model(self, output_dir: Optional[str] = None):
        out = output_dir or self.args.output_dir
        self.model.save(jax.device_get(self.state.params), out)
        return out

    def maybe_resume(self) -> bool:
        ckpt = latest_checkpoint(self.args.output_dir)
        if ckpt is None:
            return False
        with self.mesh:
            self.state = load_train_state(ckpt, self.state)
        return True
