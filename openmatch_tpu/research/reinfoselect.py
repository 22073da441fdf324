"""ReInfoSelect: reinforcement data selection for weak supervision.

Reference: /root/reference/v1/train.py:55-265 (train_reinfoselect) — a
POLICY MODEL (a classification-task ranker over the positive pair: Bert
for -model bert, train.py:637-642; ConvKNRM otherwise, train.py:691-698)
scores each candidate training pair, gumbel-softmax(tau) relaxes the
2-class score into keep/drop probabilities, an action is sampled per
pair, the ranker trains on the KEPT pairs only, and every ``eval_every``
steps the policy is updated by REINFORCE with reward = change in the dev
metric: reward >= 0 reinforces the chosen actions of kept pairs, reward
< 0 reinforces their flips (train.py:245-257).

TPU-native differences from the torch loop:

- The reference drops unselected pairs with ``index_select`` (a dynamic
  batch size per step, train.py:153-219). Here the ranker step keeps the
  FULL fixed-shape batch and weights the per-pair loss by the sampled
  keep mask, so XLA compiles exactly one step program; a zero-kept batch
  gates the optimizer update with ``lax.cond`` (the reference
  ``continue``s, train.py:114-151).
- torch retains the autograd graph of every selection step until the
  refresh backward (train.py:241-243). JAX is functional, so the loop
  buffers ``(policy_inputs, rng, actions)`` per step — all fixed shapes —
  and the refresh RECOMPUTES the log-probs under the current policy
  params from the same gumbel noise (same rng), which is gradient-
  equivalent because the reference never updates the policy between
  refreshes.
"""

from __future__ import annotations

from typing import Any, Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


class DataSelectionPolicy(nn.Module):
    """2-layer MLP over per-pair state features → keep probability."""

    hidden_dim: int = 64

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        x = nn.tanh(nn.Dense(self.hidden_dim, name="fc1")(features))
        logits = nn.Dense(2, name="fc2")(x)  # [B, 2] = [drop, keep]
        return jax.nn.log_softmax(logits, axis=-1)


def sample_actions(rng, log_probs: jnp.ndarray) -> jnp.ndarray:
    """Sample keep(1)/drop(0) per example from the policy."""
    return jax.random.categorical(rng, log_probs, axis=-1)


def policy_loss(log_probs: jnp.ndarray, actions: jnp.ndarray, reward: jnp.ndarray) -> jnp.ndarray:
    """REINFORCE: -reward * log pi(action)."""
    chosen = jnp.take_along_axis(log_probs, actions[:, None], axis=1)[:, 0]
    return -(reward * chosen).mean()


def reinfoselect_round(
    policy_params,
    policy: DataSelectionPolicy,
    policy_opt_state,
    policy_tx: optax.GradientTransformation,
    pair_features: jnp.ndarray,   # [B, F] state features for each pair
    train_on_selected: Callable[[jnp.ndarray], None],  # mask [B] -> trains ranker
    eval_metric: Callable[[], float],
    last_metric: float,
    rng: jax.Array,
) -> Tuple[Any, Any, float, jnp.ndarray]:
    """One select→train→evaluate→REINFORCE cycle. Returns updated
    (policy_params, policy_opt_state, new_metric, actions)."""
    log_probs = policy.apply({"params": policy_params}, pair_features)
    actions = sample_actions(rng, log_probs)
    train_on_selected(actions)
    new_metric = eval_metric()
    reward = jnp.asarray(new_metric - last_metric, jnp.float32)

    def loss_fn(p):
        lp = policy.apply({"params": p}, pair_features)
        return policy_loss(lp, actions, reward)

    grads = jax.grad(loss_fn)(policy_params)
    updates, policy_opt_state = policy_tx.update(grads, policy_opt_state, policy_params)
    policy_params = optax.apply_updates(policy_params, updates)
    return policy_params, policy_opt_state, new_metric, actions


# ---------------------------------------------------------------------------
# Reference-matching training mode (policy = classification model over the
# positive pair), used by drivers/train_v1.py --reinfoselect.
# ---------------------------------------------------------------------------


def gumbel_keep_log_probs(rng: jax.Array, logits: jnp.ndarray, tau: float) -> jnp.ndarray:
    """log of F.gumbel_softmax(logits, tau) (train.py:111): the 2-class
    policy scores relaxed with fresh gumbel noise. Deterministic in
    ``rng`` so the REINFORCE refresh can recompute the identical
    distribution later."""
    g = jax.random.gumbel(rng, logits.shape, logits.dtype)
    return jax.nn.log_softmax((logits + g) / tau, axis=-1)


def select_pairs(rng: jax.Array, logits: jnp.ndarray, tau: float) -> jnp.ndarray:
    """Sample keep(1)/drop(0) per pair from Categorical(gumbel_softmax)
    (train.py:111-113). ``rng`` is split exactly as the refresh expects:
    fold 0 → gumbel noise, fold 1 → the categorical draw."""
    g_rng, a_rng = jax.random.split(rng)
    log_p = gumbel_keep_log_probs(g_rng, logits, tau)
    return jax.random.categorical(a_rng, log_p, axis=-1)


def make_policy_refresh(
    policy_score_fn: Callable[[Any, Any], jnp.ndarray],
    policy_tx: optax.GradientTransformation,
    tau: float,
):
    """Jitted REINFORCE refresh over a buffer of selection steps.

    ``buf_inputs`` is a pytree of stacked policy inputs [T, B, ...],
    ``buf_rngs`` the per-step selection rngs [T, key], ``buf_actions``
    the sampled actions [T, B]. Matches train.py:245-257: only KEPT
    pairs contribute; reward >= 0 pushes up log pi(action), reward < 0
    pushes up log pi(1 - action).

    The total loss is a plain sum over the T buffered steps, so the
    gradient is accumulated one step at a time under ``lax.scan``
    (memory = one policy forward+backward, not T of them — with the
    BERT policy and the default eval_every=1000 a whole-buffer vmap
    would need hundreds of GiB of activations, and over-ceiling HBM
    requests through the tunnel HANG rather than raise)."""

    def refresh(policy_params, opt_state, buf_inputs, buf_rngs, buf_actions, reward):
        reward = jnp.asarray(reward, jnp.float32)

        def step_loss(params, inputs, rng, actions):
            logits = policy_score_fn(params, inputs)
            g_rng, _ = jax.random.split(rng)
            log_p = gumbel_keep_log_probs(g_rng, logits, tau)
            mask = actions.astype(log_p.dtype)  # kept pairs only
            lp_a = jnp.take_along_axis(log_p, actions[:, None], axis=1)[:, 0]
            lp_flip = jnp.take_along_axis(log_p, (1 - actions)[:, None], axis=1)[:, 0]
            return jnp.where(reward >= 0,
                             -(lp_a * mask).sum() * reward,
                             (lp_flip * mask).sum() * reward)

        def body(acc, xs):
            inputs, rng, actions = xs
            g = jax.grad(step_loss)(policy_params, inputs, rng, actions)
            return jax.tree.map(jnp.add, acc, g), None

        zero = jax.tree.map(jnp.zeros_like, policy_params)
        grads, _ = jax.lax.scan(body, zero, (buf_inputs, buf_rngs, buf_actions))
        updates, opt_state = policy_tx.update(grads, opt_state, policy_params)
        return optax.apply_updates(policy_params, updates), opt_state

    return jax.jit(refresh)
