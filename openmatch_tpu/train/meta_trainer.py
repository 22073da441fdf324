"""Meta learning-to-reweight trainer (Meta-LTR) for the v1 ranker family.

Reference: /root/reference/v1/meta_dist_train.py:1-563 — per source batch,
a MagicModule shadow model takes one virtual SGD step on the eps-weighted
source loss, the TARGET-domain batch's loss is backpropagated to eps, and
relu(-grad_eps)/sum becomes the per-pair weight for the real update
(steps [0]-[5] at meta_dist_train.py:416-477); the target loader cycles
independently of the source loader (RecurrDataLoader,
meta_dist_train.py:55-72); per-step weights can be logged to weights.txt
(-log_weights, meta_dist_train.py:506-509); dev evaluation keeps the best
checkpoint (-eval_during_train, meta_dist_train.py:519-553).

TPU-native: the whole [0]-[5] pipeline is ONE jitted step —
``research.meta_ltr.make_meta_train_step`` differentiates through the
virtual update by function composition (no shadow-module machinery), and
the virtual lr follows the live warmup schedule exactly as the reference
uses the scheduler's current lr (meta_dist_train.py:436).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

import numpy as np
import optax
from jax.sharding import Mesh

from ..config import TrainingArguments
from ..parallel.mesh import shard_batch
from ..research.meta_ltr import make_meta_train_step
from .reinfoselect_trainer import per_pair_ranking_loss
from .state import linear_warmup_schedule, make_replicated_state, save_train_state
from .v1_trainer import _default_pos_neg_split

logger = logging.getLogger(__name__)


class CyclingIterator:
    """Endless target-batch source (reference RecurrDataLoader,
    meta_dist_train.py:55-72): restarts the underlying factory on
    exhaustion."""

    def __init__(self, make_iter: Callable[[], Iterator]):
        self._make = make_iter
        self._it = make_iter()

    def __next__(self):
        try:
            return next(self._it)
        except StopIteration:
            self._it = self._make()
            try:
                return next(self._it)
            except StopIteration:
                # a bare StopIteration would escape the training loop as
                # an inscrutable traceback (e.g. a -target file smaller
                # than -target_batch_size with drop_last)
                raise ValueError(
                    "the target-batch source yielded no batches — is the "
                    "-target set smaller than -target_batch_size?"
                ) from None


class MetaLTRTrainer:
    """Source batches reweighted by the meta-gradient of the target loss.

    ``score_fn(params, batch) -> [B] or [B, 2]`` scores pairs; ranking
    batches are split into pos/neg views by ``pos_neg_split``.
    """

    def __init__(
        self,
        score_fn: Callable,
        params: Any,
        train_args: TrainingArguments,
        total_steps: int,
        task: str = "ranking",
        ranking_loss_kind: str = "margin_loss",
        mesh: Optional[Mesh] = None,
        pos_neg_split: Optional[Callable] = None,
        log_weights_path: Optional[str] = None,
    ):
        self.score_fn = score_fn
        self.args = train_args
        self.task = task
        self.loss_kind = ranking_loss_kind
        self.total_steps = total_steps
        self.pos_neg_split = pos_neg_split or _default_pos_neg_split
        self.log_weights_path = log_weights_path
        self.mesh, self.state = make_replicated_state(
            params, train_args, total_steps, mesh)

        warmup = train_args.warmup_steps or int(train_args.warmup_ratio * total_steps)
        schedule = linear_warmup_schedule(train_args.learning_rate, total_steps, warmup)
        self._step_fn = make_meta_train_step(
            self._per_example_loss, self._target_loss, schedule=schedule
        )

    def _per_example_loss(self, params, batch):
        if self.task == "ranking":
            pos_batch, neg_batch = self.pos_neg_split(batch)
            pos = self.score_fn(params, pos_batch)
            neg = self.score_fn(params, neg_batch)
            return per_pair_ranking_loss(pos, neg, self.loss_kind, self.args.margin)
        batch = dict(batch)
        labels = batch.pop("label")
        logits = self.score_fn(params, batch)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels)

    def _target_loss(self, params, target_batch):
        # target mean loss, meta_dist_train.py:450-451
        return self._per_example_loss(params, target_batch).mean()

    def train_step(self, batch: Dict, target_batch: Dict):
        batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        target_batch = {k: v for k, v in target_batch.items() if not isinstance(v, list)}
        with self.mesh:
            batch = shard_batch(batch, self.mesh)
            target_batch = shard_batch(target_batch, self.mesh)
            self.state, loss, weights = self._step_fn(self.state, batch, target_batch)
        return loss, weights

    def train(self, data_iter: Iterable, target_iter: CyclingIterator,
              eval_fn: Optional[Callable] = None) -> Dict[str, Any]:
        losses, log_loss = [], 0.0
        best_metric = -np.inf
        weight_history = []
        for batch in data_iter:
            if self.total_steps > 0 and int(self.state.step) >= self.total_steps:
                break
            loss, weights = self.train_step(batch, next(target_iter))
            w = np.asarray(weights, np.float32)
            weight_history.append(w)
            step = int(self.state.step)
            if self.log_weights_path:
                with open(self.log_weights_path, "a", encoding="utf-8") as f:
                    f.write(str(step) + "\t" + "\t".join(str(x) for x in w.tolist()) + "\n")
            log_loss += float(loss)
            if step % self.args.logging_steps == 0 and step > 0:
                avg = log_loss / self.args.logging_steps
                logger.info(f"step {step}/{self.total_steps} weighted loss {avg:.4f}")
                losses.append(avg)
                log_loss = 0.0
            if eval_fn is not None and self.args.eval_steps and step > 0 and step % self.args.eval_steps == 0:
                metric = eval_fn(self)
                if metric > best_metric:
                    best_metric = metric
                    self.save_checkpoint(os.path.join(self.args.output_dir, "best"))
        return {
            "losses": losses,
            "final_step": int(self.state.step),
            "best_metric": best_metric,
            "weights": weight_history,
        }

    def save_checkpoint(self, output_dir: Optional[str] = None):
        out = output_dir or os.path.join(self.args.output_dir, f"checkpoint-{int(self.state.step)}")
        os.makedirs(out, exist_ok=True)
        save_train_state(self.state, out)
        return out
