"""Trainer for the v1 model family (KNRM/ConvKNRM/TK/EDRM/Bert rankers).

Reference: the training loop in /root/reference/v1/train.py:270-420 — tasks
ranking/classification, ranking losses margin_loss (on tanh'd scores),
CE_loss (BCE on sigmoid(pos - neg)), triplet_loss (log-softmax over
[pos, neg]); per-N-step dev evaluation writing TREC and keeping the best
checkpoint by metric.

Here the model is any callable ``apply(params, **tensors) -> (score, feats)``
and the step is one jitted function over the mesh (data-sharded batch).
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from ..config import TrainingArguments
from ..parallel.mesh import shard_batch
from .state import make_replicated_state, save_train_state

logger = logging.getLogger(__name__)


def ranking_loss(pos_scores, neg_scores, kind: str, margin: float = 1.0):
    if kind == "margin_loss":
        # torch MarginRankingLoss(margin=1) on tanh'd scores (train.py:333-335)
        return jnp.mean(jax.nn.relu(margin - jnp.tanh(pos_scores) + jnp.tanh(neg_scores)))
    if kind == "CE_loss":
        # BCE(sigmoid(pos - neg), 1)  (train.py:336-337)
        p = jax.nn.sigmoid(pos_scores - neg_scores)
        return jnp.mean(-jnp.log(jnp.clip(p, 1e-10, 1.0)))
    if kind == "triplet_loss":
        logits = jnp.stack([pos_scores, neg_scores], axis=1)
        return jnp.mean(-jax.nn.log_softmax(logits, axis=1)[:, 0])
    raise ValueError(f"Unknown ranking loss {kind}")


class V1Trainer:
    def __init__(
        self,
        score_fn: Callable,  # (params, batch_dict) -> scores [B] or [B, 2]
        params: Any,
        train_args: TrainingArguments,
        total_steps: int,
        task: str = "ranking",
        ranking_loss_kind: str = "margin_loss",
        mesh: Optional[Mesh] = None,
        pos_neg_split: Optional[Callable] = None,
    ):
        """pos_neg_split(batch) -> (pos_batch, neg_batch) for ranking mode;
        defaults to splitting on doc_pos_* / doc_neg_* key prefixes."""
        self.score_fn = score_fn
        self.args = train_args
        self.task = task
        self.loss_kind = ranking_loss_kind
        self.total_steps = total_steps
        self.pos_neg_split = pos_neg_split or _default_pos_neg_split
        self.mesh, self.state = make_replicated_state(
            params, train_args, total_steps, mesh)
        self._step_fn = self._build_step()

    def _build_step(self):
        task, loss_kind, margin = self.task, self.loss_kind, self.args.margin

        def loss_fn(params, batch):
            if task == "ranking":
                pos_batch, neg_batch = self.pos_neg_split(batch)
                pos = self.score_fn(params, pos_batch)
                neg = self.score_fn(params, neg_batch)
                return ranking_loss(pos, neg, loss_kind, margin)
            labels = batch.pop("label")
            logits = self.score_fn(params, batch)
            return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
            return state.apply_gradients(grads), loss

        return step

    def train_step(self, batch: Dict[str, jnp.ndarray]) -> float:
        batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        with self.mesh:
            batch = shard_batch(batch, self.mesh)
            self.state, loss = self._step_fn(self.state, batch)
        return loss

    def train(self, data_iter: Iterable, eval_fn=None) -> Dict[str, Any]:
        losses, log_loss = [], 0.0
        best_metric = -np.inf
        for batch in data_iter:
            if self.total_steps > 0 and int(self.state.step) >= self.total_steps:
                break
            loss = self.train_step(batch)
            log_loss += float(loss)
            step = int(self.state.step)
            if step % self.args.logging_steps == 0 and step > 0:
                avg = log_loss / self.args.logging_steps
                logger.info(f"step {step}/{self.total_steps} loss {avg:.4f}")
                losses.append(avg)
                log_loss = 0.0
            if eval_fn is not None and self.args.eval_steps and step > 0 and step % self.args.eval_steps == 0:
                metric = eval_fn(self)
                if metric > best_metric:
                    best_metric = metric
                    self.save_checkpoint(os.path.join(self.args.output_dir, "best"))
        return {"losses": losses, "final_step": int(self.state.step), "best_metric": best_metric}

    def save_checkpoint(self, output_dir: Optional[str] = None):
        out = output_dir or os.path.join(self.args.output_dir, f"checkpoint-{int(self.state.step)}")
        os.makedirs(out, exist_ok=True)
        save_train_state(self.state, out)
        return out


def _default_pos_neg_split(batch):
    pos = {}
    neg = {}
    for k, v in batch.items():
        if "pos" in k:
            pos[k.replace("doc_pos", "doc").replace("pos_", "")] = v
        elif "neg" in k:
            neg[k.replace("doc_neg", "doc").replace("neg_", "")] = v
        else:
            pos[k] = v
            neg[k] = v
    return pos, neg


def predict_scores(score_fn, params, batches: Iterable[Dict], task: str = "ranking"):
    """Batch scoring to a {qid: {did: score}} dict (v1/inference.py behavior:
    classification scores are softmax P(class 1))."""
    jit_score = jax.jit(score_fn)
    result: Dict[str, Dict[str, float]] = {}
    for batch in batches:
        qids = batch.pop("query_id")
        dids = batch.pop("doc_id")
        batch.pop("retrieval_score", None)
        batch.pop("label", None)
        tensors = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
        scores = jit_score(params, tensors)
        if scores.ndim == 2:  # classification -> P(relevant)
            scores = jax.nn.softmax(scores, axis=-1)[:, 1]
        scores = np.asarray(scores, np.float32)
        for qid, did, s in zip(qids, dids, scores):
            bucket = result.setdefault(qid, {})
            if did not in bucket or s > bucket[did]:
                bucket[did] = float(s)
    return result
