"""ReInfoSelect: reinforcement data selection for weak supervision.

Reference: /root/reference/v1/train.py:55-265 (train_reinfoselect) — a
policy network scores each candidate training pair from the ranker's
current representations, pairs are sampled to keep/drop, the ranker trains
on kept pairs, and the policy is updated by REINFORCE with reward =
change in dev metric between refreshes.
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
