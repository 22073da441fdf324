"""Training losses, JAX-native.

Reference semantics (/root/reference/src/openmatch/loss.py:7-74 and
/root/reference/src/openmatch/modeling/dense_retrieval_model.py:113-125):

- Contrastive: softmax cross-entropy over ``q @ p.T`` where each query's
  positive sits at column ``i * (n_p / n_q)`` (the ``train_n_passages``
  stride).
- Pairwise reranker losses: margin ranking, softplus margin, BCE
  (pos→1/neg→0), and 2-class CE over ``[neg, pos]`` logits.

TPU note on ``negatives_x_device``: the reference all-gathers reps on every
rank, re-inserts the local tensor to keep its gradient, computes the *global*
loss on every rank, multiplies by world_size, and divides again at the
training step — a dance to cancel DDP's gradient averaging. In JAX the whole
batch lives in one jitted program sharded over the mesh: computing this loss
on the globally-sharded reps (or reps explicitly all-gathered inside the
GradCache path, see train/dr_trainer.py) gives the mathematically identical
gradient with no rescaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def contrastive_targets(n_queries: int, n_passages: int) -> jnp.ndarray:
    """Positive-column index for each query: stride = n_passages // n_queries."""
    stride = n_passages // n_queries
    return jnp.arange(n_queries, dtype=jnp.int32) * stride


def simple_contrastive_loss(
    q_reps: jnp.ndarray,
    p_reps: jnp.ndarray,
    targets: jnp.ndarray = None,
    reduction: str = "mean",
    temperature: float = 1.0,
) -> jnp.ndarray:
    """In-batch softmax contrastive loss over the full score matrix.

    q_reps: [n_q, d]; p_reps: [n_q * n_psg, d]. Scores accumulate in fp32
    regardless of input dtype (MXU-friendly: bf16 in, fp32 out).
    ``temperature`` divides the scores before the softmax — required for
    useful gradients when reps are L2-normalized (cosine scores in [-1, 1]).
    """
    if targets is None:
        targets = contrastive_targets(q_reps.shape[0], p_reps.shape[0])
    scores = jnp.dot(q_reps, p_reps.T, preferred_element_type=jnp.float32)
    if temperature != 1.0:
        scores = scores / temperature
    losses = optax.softmax_cross_entropy_with_integer_labels(scores, targets)
    if reduction == "mean":
        return losses.mean()
    if reduction == "sum":
        return losses.sum()
    return losses


def contrastive_loss_with_scores(q_reps, p_reps, targets=None):
    """Same as simple_contrastive_loss but also returns the score matrix."""
    if targets is None:
        targets = contrastive_targets(q_reps.shape[0], p_reps.shape[0])
    scores = jnp.dot(q_reps, p_reps.T, preferred_element_type=jnp.float32)
    loss = optax.softmax_cross_entropy_with_integer_labels(scores, targets).mean()
    return loss, scores


def dual_contrastive_loss(
    q_reps: jnp.ndarray,
    p_reps: jnp.ndarray,
    dual_weight: float = 0.1,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """DANCE-style dual learning (reference v1/retrievers/DANCE): the usual
    query→passage contrastive loss plus a passage→query direction, where
    each POSITIVE passage must retrieve its query against all other
    queries. Encourages a bi-directionally aligned embedding space.
    ``temperature`` divides BOTH directions' scores (essential with
    --normalize, exactly like simple_contrastive_loss)."""
    n_q = q_reps.shape[0]
    stride = p_reps.shape[0] // n_q
    q2p = simple_contrastive_loss(q_reps, p_reps, temperature=temperature)
    positives = p_reps[::stride]  # [n_q, d]
    scores = jnp.dot(positives, q_reps.T, preferred_element_type=jnp.float32)
    scores = scores / temperature
    targets = jnp.arange(n_q, dtype=jnp.int32)
    p2q = optax.softmax_cross_entropy_with_integer_labels(scores, targets).mean()
    return q2p + dual_weight * p2q


def margin_ranking_loss(pos_scores, neg_scores, margin: float = 1.0):
    return jnp.mean(jax.nn.relu(margin - pos_scores + neg_scores))


def soft_margin_ranking_loss(pos_scores, neg_scores, margin: float = 1.0):
    return jnp.mean(jax.nn.softplus(margin - pos_scores + neg_scores))


def binary_cross_entropy_loss(pos_scores, neg_scores):
    """BCE-with-logits; reference sums the two means (loss.py:57-60)."""
    pos = optax.sigmoid_binary_cross_entropy(pos_scores, jnp.ones_like(pos_scores))
    neg = optax.sigmoid_binary_cross_entropy(neg_scores, jnp.zeros_like(neg_scores))
    return pos.mean() + neg.mean()


def cross_entropy_loss(pos_scores, neg_scores):
    """2-class CE over [neg, pos] logit pairs; pos rows labeled 1, neg rows 0
    (loss.py:63-66). Inputs: [batch, 2]."""
    n_pos = pos_scores.shape[0]
    n_neg = neg_scores.shape[0]
    pos = optax.softmax_cross_entropy_with_integer_labels(
        pos_scores, jnp.ones((n_pos,), dtype=jnp.int32)
    )
    neg = optax.softmax_cross_entropy_with_integer_labels(
        neg_scores, jnp.zeros((n_neg,), dtype=jnp.int32)
    )
    return pos.mean() + neg.mean()


rr_loss_functions = {
    "mr": margin_ranking_loss,
    "smr": soft_margin_ranking_loss,
    "bce": binary_cross_entropy_loss,
    "ce": cross_entropy_loss,
}
