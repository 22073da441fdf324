"""Train state, optimizer, and checkpoint/resume.

Replaces the HF Trainer's optimizer/scheduler plumbing with optax:
AdamW + linear warmup→linear decay (the HF default the reference trains
with; warmup_ratio=0.1 per arguments.py:158). Checkpoints are msgpack
pytrees with a json sidecar — the same idempotent-artifact philosophy the
reference uses for resume (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import serialization
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def linear_warmup_schedule(
    learning_rate: float, total_steps: int, warmup_steps: int
) -> optax.Schedule:
    """Linear 0→lr over warmup, then linear lr→0 over the remainder."""
    warmup_steps = max(warmup_steps, 1)
    decay_steps = max(total_steps - warmup_steps, 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, learning_rate, warmup_steps),
            optax.linear_schedule(learning_rate, 0.0, decay_steps),
        ],
        boundaries=[warmup_steps],
    )


def make_optimizer(train_args, total_steps: int) -> optax.GradientTransformation:
    warmup = train_args.warmup_steps or int(train_args.warmup_ratio * total_steps)
    schedule = linear_warmup_schedule(train_args.learning_rate, total_steps, warmup)
    components = []
    if train_args.max_grad_norm and train_args.max_grad_norm > 0:
        components.append(optax.clip_by_global_norm(train_args.max_grad_norm))
    name = getattr(train_args, "optimizer", "adamw")
    if name == "lamb":
        # Layer-wise adaptive large-batch optimizer: the reference ANCE
        # recipe trains with LAMB (v1/retrievers/ANCE/utils/lamb.py,
        # drivers/run_ann.py --optimizer lamb).
        components.append(
            optax.lamb(
                learning_rate=schedule,
                b1=train_args.adam_beta1,
                b2=train_args.adam_beta2,
                eps=train_args.adam_epsilon,
                weight_decay=train_args.weight_decay,
            )
        )
    elif name == "adamw":
        components.append(
            optax.adamw(
                learning_rate=schedule,
                b1=train_args.adam_beta1,
                b2=train_args.adam_beta2,
                eps=train_args.adam_epsilon,
                weight_decay=train_args.weight_decay,
            )
        )
    else:
        raise ValueError(f"Unknown optimizer '{name}' (expected adamw | lamb)")
    return optax.chain(*components)


def make_replicated_state(params, train_args, total_steps: int,
                          mesh=None):
    """(mesh, TrainState) with a COPIED param tree replicated across the
    mesh — the construction every v1-family trainer (V1Trainer,
    ReInfoSelectTrainer, MetaLTRTrainer) shares. Kept in one place so a
    future placement change (e.g. sharded params) lands everywhere."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import make_mesh

    if mesh is None:
        mesh = make_mesh(train_args.dp_size, train_args.tp_size)
    tx = make_optimizer(train_args, total_steps)
    with mesh:
        state = TrainState.create(
            jax.tree.map(lambda x: jnp.array(x, copy=True), params), tx)
        rep = NamedSharding(mesh, P())
        state = jax.tree.map(
            lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x,
            state)
    return mesh, state


def save_train_state(state: TrainState, output_dir: str):
    os.makedirs(output_dir, exist_ok=True)
    payload = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    }
    with open(os.path.join(output_dir, "train_state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(payload))
    with open(os.path.join(output_dir, "train_state.json"), "w") as f:
        json.dump({"step": int(jax.device_get(state.step))}, f)


def load_train_state(ckpt_dir: str, template: TrainState) -> TrainState:
    with open(os.path.join(ckpt_dir, "train_state.msgpack"), "rb") as f:
        payload = serialization.from_bytes(
            {
                "step": jax.device_get(template.step),
                "params": jax.device_get(template.params),
                "opt_state": jax.device_get(template.opt_state),
            },
            f.read(),
        )
    def _restore(host_leaf, template_leaf):
        # place each restored leaf with the TEMPLATE's sharding: a plain
        # jnp.asarray would materialize the whole tree on the single
        # default device — wrong for TP-sharded params (an over-ceiling
        # allocation for models big enough to need TP hangs the tunnel)
        # and unusable on multi-host meshes
        sharding = getattr(template_leaf, "sharding", None)
        if sharding is not None:
            return jax.device_put(jnp.asarray(host_leaf), sharding)
        return jnp.asarray(host_leaf)

    return template.replace(
        step=_restore(payload["step"], template.step),
        params=jax.tree.map(_restore, payload["params"], template.params),
        opt_state=jax.tree.map(_restore, payload["opt_state"],
                               template.opt_state),
    )


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Find the newest ``checkpoint-N`` dir (reference resume convention)."""
    if not os.path.isdir(output_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(output_dir):
        if name.startswith("checkpoint-"):
            try:
                step = int(name.split("-")[1])
            except (IndexError, ValueError):
                continue
            if step > best_step and os.path.exists(
                os.path.join(output_dir, name, "train_state.msgpack")
            ):
                best, best_step = os.path.join(output_dir, name), step
    return best
