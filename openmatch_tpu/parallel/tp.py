"""Tensor-parallel parameter partition specs (Megatron-style) for the
"model" mesh axis.

The reference has no tensor parallelism (SURVEY.md §2d: encoders are
<= large); this is the TPU-native extension for >1B encoders promised by
the §2d plan. Column-parallel first matmuls (attention QKV, FFN up) and
row-parallel second matmuls (attention out, FFN down) mean XLA/GSPMD
inserts exactly one all-reduce per block — no manual collectives, no model
rewrite: the specs below are the entire mechanism.

Spec rules keyed on the module names in models/bert.py and models/t5.py:

BERT (BertSelfAttention / BertLayer):
  qkv.kernel   [d, 3, H, hd]  -> shard heads        P(None, None, M, None)
  qkv.bias     [3, H, hd]     ->                     P(None, M, None)
  out.kernel   [H, hd, d]     -> row-parallel        P(M, None, None)
  intermediate.kernel [d, f]  -> column-parallel     P(None, M)
  intermediate.bias   [f]     ->                     P(M)
  output.kernel [f, d]        -> row-parallel        P(M, None)

T5 (T5Attention / T5FeedForward):
  q/k/v.kernel [d, H, hd]     -> shard heads         P(None, M, None)
  o.kernel     [H, hd, d]     -> row-parallel        P(M, None, None)
  wi/wi_0/wi_1.kernel [d, f]  -> column-parallel     P(None, M)
  wo.kernel    [f, d]         -> row-parallel        P(M, None)

Row-parallel output biases and everything else (embeddings, layernorms,
heads) stay replicated. Biases of column-parallel layers are sharded with
their output dimension.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (module name, param name) -> sharded dim index, keyed further by ndim to
# disambiguate bias/kernel layouts.
_COLUMN_MODULES_BERT = {"intermediate"}
_ROW_MODULES_BERT = {"output"}
_HEAD_MODULES_T5 = {"q", "k", "v"}
_COLUMN_MODULES_T5 = {"wi", "wi_0", "wi_1"}
_ROW_MODULES_T5 = {"wo"}


def _spec_for(path, leaf) -> P:
    names = [p.key for p in path if hasattr(p, "key")]
    if len(names) < 2:
        return P()
    module, param = names[-2], names[-1]
    nd = getattr(leaf, "ndim", 0)
    if module == "qkv":
        if param == "kernel" and nd == 4:  # [d, 3, H, hd]
            return P(None, None, MODEL_AXIS, None)
        if param == "bias" and nd == 3:  # [3, H, hd]
            return P(None, MODEL_AXIS, None)
    if module == "out" and param == "kernel" and nd == 3:  # [H, hd, d]
        return P(MODEL_AXIS, None, None)
    if module in _COLUMN_MODULES_BERT:
        if param == "kernel" and nd == 2:
            return P(None, MODEL_AXIS)
        if param == "bias" and nd == 1:
            return P(MODEL_AXIS)
    if module in _ROW_MODULES_BERT and param == "kernel" and nd == 2:
        return P(MODEL_AXIS, None)
    if module in _HEAD_MODULES_T5 and param == "kernel" and nd == 3:  # [d, H, hd]
        return P(None, MODEL_AXIS, None)
    if module == "o" and param == "kernel" and nd == 3:  # [H, hd, d]
        return P(MODEL_AXIS, None, None)
    if module in _COLUMN_MODULES_T5 and param == "kernel" and nd == 2:
        return P(None, MODEL_AXIS)
    if module in _ROW_MODULES_T5 and param == "kernel" and nd == 2:
        return P(MODEL_AXIS, None)
    return P()


def param_partition_specs(params: Any) -> Any:
    """Pytree of PartitionSpecs (same structure as ``params``)."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def validate_tp(params: Any, specs: Any, tp_size: int):
    """Every sharded dim must divide by tp_size; raise naming the leaf."""
    if tp_size <= 1:
        return

    def check(path, leaf, spec):
        for dim, axis in enumerate(spec):
            if axis == MODEL_AXIS and leaf.shape[dim] % tp_size:
                name = "/".join(str(getattr(p, "key", p)) for p in path)
                raise ValueError(
                    f"tensor-parallel axis size {tp_size} does not divide "
                    f"dim {dim} of param '{name}' (shape {leaf.shape}); "
                    "pick tp_size dividing num_heads and the FFN width"
                )

    jax.tree_util.tree_map_with_path(check, params, specs)


def place_params(params: Any, mesh: Mesh) -> Any:
    """device_put each param with its TP spec. Meshes without a model axis
    (or with model axis size 1) get plain replication — the specs would be
    equivalent anyway, and 1D data meshes don't know the axis name."""
    if mesh.shape.get(MODEL_AXIS, 1) == 1:
        rep = NamedSharding(mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, rep), params)
    specs = param_partition_specs(params)
    validate_tp(params, specs, mesh.shape[MODEL_AXIS])
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
