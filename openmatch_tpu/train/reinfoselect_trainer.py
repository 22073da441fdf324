"""ReInfoSelect training mode for the v1 ranker family.

Reference: /root/reference/v1/train.py:55-265 (train_reinfoselect), the
``-reinfoselect`` mode of the v1 train.py CLI (flag at train.py:423,
dispatch at :784-785): per batch, a classification-task policy model
scores the positive pair, gumbel-softmax(tau)+Categorical samples a
keep/drop action per pair, the ranker trains on the kept pairs, and each
``eval_every`` steps the dev metric is evaluated, the best checkpoint
kept, and the policy REINFORCE-updated with reward = metric delta
(optionally resetting the ranker to the best checkpoint, ``-reset``,
train.py:259-262).

TPU-native design (vs. the reference's dynamic ``index_select`` batches):
one jitted fixed-shape step that masks the per-pair loss by the sampled
actions and gates the optimizer update on kept > 0 with ``lax.cond``, so
XLA compiles exactly two programs (step + refresh) for the whole run.
Selection-step state for the REINFORCE refresh is buffered as
``(policy_inputs, rng, actions)`` and replayed under the current policy
params — see research/reinfoselect.py for why this is gradient-exact.
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
from ..research.reinfoselect import make_policy_refresh, select_pairs
from .state import make_replicated_state, save_train_state
from .v1_trainer import _default_pos_neg_split

logger = logging.getLogger(__name__)


def per_pair_ranking_loss(pos_scores, neg_scores, kind: str, margin: float = 1.0):
    """Elementwise [B] version of v1_trainer.ranking_loss (reference loss
    construction at /root/reference/v1/train.py:333-341)."""
    if kind == "margin_loss":
        return jax.nn.relu(margin - jnp.tanh(pos_scores) + jnp.tanh(neg_scores))
    if kind == "CE_loss":
        p = jax.nn.sigmoid(pos_scores - neg_scores)
        return -jnp.log(jnp.clip(p, 1e-10, 1.0))
    if kind == "triplet_loss":
        logits = jnp.stack([pos_scores, neg_scores], axis=1)
        return -jax.nn.log_softmax(logits, axis=1)[:, 0]
    raise ValueError(f"Unknown ranking loss {kind}")


def policy_inputs_from_batch(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """The policy scores the POSITIVE pair (train.py:80-109): cross-encoder
    inputs for bert batches (train.py:80), word-channel query/doc tensors
    for word models and EDRM (the reference's ConvKNRM policy consumes
    only the word channel, train.py:94-98)."""
    if "pos_input_ids" in batch:  # bert ranking batch
        return {
            "input_ids": batch["pos_input_ids"],
            "input_mask": batch["pos_input_mask"],
            "segment_ids": batch["pos_segment_ids"],
        }
    if "input_ids" in batch:  # bert classification batch (train.py:82)
        return {
            "input_ids": batch["input_ids"],
            "input_mask": batch["input_mask"],
            "segment_ids": batch["segment_ids"],
        }
    if "query_wrd_idx" in batch:  # EDRM batch
        # classification EDRM batches carry a single doc channel
        # (doc_wrd_*), ranking batches the pos/neg pair (doc_pos_wrd_*)
        doc = "doc_pos_wrd" if "doc_pos_wrd_idx" in batch else "doc_wrd"
        return {
            "query_idx": batch["query_wrd_idx"],
            "query_mask": batch["query_wrd_mask"],
            "doc_idx": batch[f"{doc}_idx"],
            "doc_mask": batch[f"{doc}_mask"],
        }
    if "doc_pos_idx" in batch:  # ranking word batch
        return {
            "query_idx": batch["query_idx"],
            "query_mask": batch["query_mask"],
            "doc_idx": batch["doc_pos_idx"],
            "doc_mask": batch["doc_pos_mask"],
        }
    # classification batch: the single pair (train.py:104-107)
    return {
        "query_idx": batch["query_idx"],
        "query_mask": batch["query_mask"],
        "doc_idx": batch["doc_idx"],
        "doc_mask": batch["doc_mask"],
    }


class ReInfoSelectTrainer:
    """select → masked-train → dev-eval → REINFORCE loop.

    ``score_fn(params, batch) -> [B] or [B, 2]`` scores the ranker;
    ``policy_score_fn(policy_params, inputs) -> [B, 2]`` scores the
    keep/drop policy over ``policy_inputs_from_batch`` tensors.
    """

    def __init__(
        self,
        score_fn: Callable,
        params: Any,
        policy_score_fn: Callable,
        policy_params: Any,
        train_args: TrainingArguments,
        total_steps: int,
        task: str = "ranking",
        ranking_loss_kind: str = "margin_loss",
        tau: float = 1.0,
        reset: bool = False,
        mesh: Optional[Mesh] = None,
        pos_neg_split: Optional[Callable] = None,
    ):
        self.score_fn = score_fn
        self.policy_score_fn = policy_score_fn
        self.args = train_args
        self.task = task
        self.loss_kind = ranking_loss_kind
        self.tau = tau
        self.reset = reset
        self.total_steps = total_steps
        self.pos_neg_split = pos_neg_split or _default_pos_neg_split
        self.mesh, self.state = make_replicated_state(
            params, train_args, total_steps, mesh)
        # plain Adam for the policy, reference train.py:776
        self.policy_tx = optax.adam(train_args.learning_rate)
        self.policy_params = jax.tree.map(lambda x: jnp.array(x, copy=True), policy_params)
        self.policy_opt_state = self.policy_tx.init(self.policy_params)

        self._step_fn = self._build_step()
        self._refresh_fn = make_policy_refresh(policy_score_fn, self.policy_tx, tau)
        self._buffer = []  # (policy_inputs, rng, actions) per selection step
        self.keep_rates = []  # fraction kept per step, for observability

    def _build_step(self):
        task, loss_kind, margin, tau = self.task, self.loss_kind, self.args.margin, self.tau

        def masked_loss(params, batch, mask):
            kept = jnp.maximum(mask.sum(), 1.0)
            if task == "ranking":
                pos_batch, neg_batch = self.pos_neg_split(batch)
                pos = self.score_fn(params, pos_batch)
                neg = self.score_fn(params, neg_batch)
                per = per_pair_ranking_loss(pos, neg, loss_kind, margin)
            else:
                batch = dict(batch)
                labels = batch.pop("label")
                logits = self.score_fn(params, batch)
                per = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            return (per * mask).sum() / kept

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, policy_params, batch, rng):
            logits = self.policy_score_fn(policy_params, policy_inputs_from_batch(batch))
            actions = select_pairs(rng, logits, tau)
            mask = actions.astype(jnp.float32)
            loss, grads = jax.value_and_grad(masked_loss)(state.params, batch, mask)
            # the reference `continue`s on a zero-kept batch (train.py:114)
            new_state = jax.lax.cond(
                mask.sum() > 0,
                lambda: state.apply_gradients(grads),
                lambda: state.replace(step=state.step + 1),
            )
            return new_state, actions, loss

        return step

    def train(self, data_iter: Iterable, eval_fn: Callable[["ReInfoSelectTrainer"], float],
              rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        """eval_fn(trainer) -> dev metric; called before training (the
        reference's initial dev pass, train.py:57-72) and every
        ``args.eval_steps`` steps for the REINFORCE reward."""
        rng = jax.random.PRNGKey(self.args.seed) if rng is None else rng
        best_dir = os.path.join(self.args.output_dir, "best")
        best_mes = last_mes = eval_fn(self)
        self.save_checkpoint(best_dir)
        logger.info(f"initial dev metric {best_mes:.4f}")
        # COPY: the jitted step donates the TrainState (donate_argnums),
        # deleting the buffers self.state.params aliases — a snapshot
        # that shares them would hold deleted arrays one step later
        snap = partial(jax.tree.map, lambda x: jnp.array(x, copy=True))
        best_params = snap(self.state.params)

        losses = []
        for batch in data_iter:
            if self.total_steps > 0 and int(self.state.step) >= self.total_steps:
                break
            batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
            rng, step_rng = jax.random.split(rng)
            with self.mesh:
                batch = shard_batch(batch, self.mesh)
                self.state, actions, loss = self._step_fn(
                    self.state, self.policy_params, batch, step_rng
                )
                self._buffer.append(
                    (policy_inputs_from_batch(batch), step_rng, actions)
                )
            losses.append(float(loss))
            self.keep_rates.append(float(jnp.mean(actions.astype(jnp.float32))))
            step = int(self.state.step)
            if self.args.eval_steps and step % self.args.eval_steps == 0 and self._buffer:
                mes = eval_fn(self)
                if mes >= best_mes:
                    best_mes = mes
                    best_params = snap(self.state.params)
                    self.save_checkpoint(best_dir)
                reward = mes - last_mes
                last_mes = mes
                self.refresh_policy(reward)
                logger.info(
                    f"step {step}: dev {mes:.4f} (best {best_mes:.4f}), "
                    f"reward {reward:+.4f}, keep-rate "
                    f"{np.mean(self.keep_rates[-self.args.eval_steps:]):.2f}"
                )
                if self.reset:  # train.py:259-262
                    # copy again: the restored params enter the donated
                    # state, so sharing them would delete the snapshot
                    self.state = self.state.replace(params=snap(best_params))
                    last_mes = best_mes
        return {
            "losses": losses,
            "final_step": int(self.state.step),
            "best_metric": best_mes,
            "keep_rates": self.keep_rates,
        }

    def refresh_policy(self, reward: float):
        """Stack the buffered selection steps and REINFORCE-update the
        policy (train.py:245-257); clears the buffer."""
        if not self._buffer:
            return
        buf_inputs = jax.tree.map(lambda *xs: jnp.stack(xs), *[b[0] for b in self._buffer])
        buf_rngs = jnp.stack([b[1] for b in self._buffer])
        buf_actions = jnp.stack([b[2] for b in self._buffer])
        self.policy_params, self.policy_opt_state = self._refresh_fn(
            self.policy_params, self.policy_opt_state,
            buf_inputs, buf_rngs, buf_actions, reward,
        )
        self._buffer = []

    def save_checkpoint(self, output_dir: Optional[str] = None):
        out = output_dir or os.path.join(self.args.output_dir, f"checkpoint-{int(self.state.step)}")
        os.makedirs(out, exist_ok=True)
        save_train_state(self.state, out)
        return out
