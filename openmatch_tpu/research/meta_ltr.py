"""Meta learning-to-reweight training pairs using target-domain data.

Reference: /root/reference/v1/magic_module.py + v1/meta_dist_train.py
(docs/meta-learning-to-rank.md) — learn per-example weights by
differentiating the TARGET-domain (dev) loss through one virtual SGD step
on the weighted SOURCE loss (Ren et al., "Learning to Reweight Examples").
The reference needs MagicModule, a shadow model with buffer parameters,
because torch autograd cannot differentiate through optimizer updates;
in JAX the virtual step is just function composition under jax.grad, so
the entire mechanism is ~20 lines with no shadow machinery.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def meta_reweight_step(
    params,
    per_example_loss_fn: Callable,  # (params, batch) -> [B] losses
    dev_loss_fn: Callable,          # (params, dev_batch) -> scalar
    train_batch,
    dev_batch,
    virtual_lr: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (weights [B], weighted_loss) for the real update.

    weights = normalized relu(-d dev_loss / d eps) where eps are per-example
    loss multipliers at 0 — examples whose gradient direction helps the
    target domain get positive weight, harmful ones get zero.
    """
    losses = per_example_loss_fn(params, train_batch)
    B = losses.shape[0]

    def dev_after_virtual_step(eps):
        def weighted(p):
            return (eps * per_example_loss_fn(p, train_batch)).sum()

        grads = jax.grad(weighted)(params)
        virtual = jax.tree.map(lambda p, g: p - virtual_lr * g, params, grads)
        return dev_loss_fn(virtual, dev_batch)

    eps0 = jnp.zeros((B,), losses.dtype)
    grad_eps = jax.grad(dev_after_virtual_step)(eps0)
    weights = jax.nn.relu(-grad_eps)
    # normalize to sum 1; if NO example helps the target domain, the batch
    # weight is zero (skip), NOT uniform — uniform would reintroduce the
    # harmful examples exactly when the model has fit the clean ones.
    norm = weights.sum()
    weights = jnp.where(norm > 0, weights / jnp.clip(norm, 1e-8, None), jnp.zeros((B,)))
    # the real update treats the weights as constants (Ren et al. eq. 12);
    # without stop_gradient the second-order term through the virtual step
    # destabilizes training
    weights = jax.lax.stop_gradient(weights)
    return weights, (weights * losses).sum()


def make_meta_train_step(
    per_example_loss_fn: Callable,
    dev_loss_fn: Callable,
    virtual_lr: float = 1e-3,
    schedule: Callable = None,
):
    """Build a jittable (state, train_batch, dev_batch) -> (state, loss, w)
    step applying the reweighted gradient.

    ``schedule(step) -> lr`` overrides ``virtual_lr`` with the live
    learning rate, matching the reference's virtual step at the
    scheduler's current lr (meta_dist_train.py:436,
    ``convert2delta(..., lr=m_scheduler.get_last_lr()[0])``)."""

    def step(state, train_batch, dev_batch):
        vlr = schedule(state.step) if schedule is not None else virtual_lr

        def loss_fn(p):
            weights, weighted = meta_reweight_step(
                p, per_example_loss_fn, dev_loss_fn, train_batch, dev_batch, vlr
            )
            return weighted, weights

        (loss, weights), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss, weights

    return jax.jit(step, donate_argnums=(0,))
