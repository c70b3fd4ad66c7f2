"""Device mesh + sharding rules.

The reference is strictly single-GPU (SURVEY.md §5: every device string is a
hard-coded "cuda:0"); scale-out here is TPU-native by design:

- **data axis**: the frame/window batch dimension shards over ICI. Inference
  and training batches are embarrassingly parallel; XLA inserts the psum for
  the loss/grad all-reduce.
- **model axis**: tensor parallelism for the wav2vec2 encoder (the only
  >100M-param component): attention q/k/v/out heads and FFN
  intermediate/output matrices shard column-/row-wise, following the
  Megatron pattern expressed as PartitionSpecs — XLA inserts the
  all-reduces.

Everything is expressed as NamedSharding over a ``jax.sharding.Mesh``; no
explicit collectives in model code.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Create a (data, model) mesh. data=-1 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = devices[: data * model].reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


# path-regex -> PartitionSpec for the wav2vec2 encoder under tensor parallelism
_TP_RULES: list[tuple[str, P]] = [
    # column-parallel: out dim sharded
    (r".*attention_[qkv]_proj/kernel$", P(None, "model")),
    (r".*attention_[qkv]_proj/bias$", P("model")),
    (r".*intermediate_dense/kernel$", P(None, "model")),
    (r".*intermediate_dense/bias$", P("model")),
    # row-parallel: in dim sharded
    (r".*attention_out_proj/kernel$", P("model", None)),
    (r".*output_dense/kernel$", P("model", None)),
    # custom head transformer layers
    (r".*self_attention/(query_w|keys_w|values_w)/kernel$", P(None, "model")),
    (r".*self_attention/ff_layer_after_concat/kernel$", P("model", None)),
    (r".*feed_forward/layer_1/kernel$", P(None, "model")),
    (r".*feed_forward/layer_1/bias$", P("model")),
    (r".*feed_forward/layer_2/kernel$", P("model", None)),
]


def _spec_for_path(path: str, leaf: Any) -> P:
    for pattern, spec in _TP_RULES:
        if re.match(pattern, path):
            # only shard if the dimension divides evenly; replicate otherwise
            return spec
    return P()  # replicate


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(variables: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a variables pytree under the TP rules; specs
    that do not divide the dimension fall back to replication."""
    model_size = mesh.shape.get("model", 1)

    def assign(key_path, leaf):
        path = _path_str(key_path)
        spec = _spec_for_path(path, leaf)
        if spec != P() and model_size > 1:
            # validate divisibility
            dims = spec
            ok = True
            for axis_idx, axis_name in enumerate(dims):
                if axis_name == "model":
                    if leaf.shape[axis_idx] % model_size != 0:
                        ok = False
            if not ok:
                spec = P()
        elif model_size == 1:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, variables)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs shard on the leading batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_variables(variables: Any, mesh: Mesh) -> Any:
    """Place a variables pytree onto the mesh per the TP rules."""
    shardings = param_shardings(variables, mesh)
    return jax.tree.map(jax.device_put, variables, shardings)
