"""Device mesh + sharding specs.

The reference's only parallelism is data-parallel DDP with NCCL all-reduce
plus manual codebook broadcasts (SURVEY.md §2.4; encoder/distrib.py).  The
TPU-native equivalents:

* **dp**: batch sharded over the 'data' mesh axis; gradients/EMA statistics
  become global automatically because the loss/statistics are computed on
  the logically-global batch under jit — XLA inserts the psums (the faithful
  upgrade of DDP all-reduce + codebook broadcast).
* **tp** (additive, not in the reference): the ConvNeXt MLP weights
  (dim x intermediate_dim, the FLOPs bulk of the decoder) shard over the
  'model' axis; XLA turns pwconv1/pwconv2 into sharded matmuls with one
  all-reduce per block.
* **sp** (additive): bulk feature extraction shards long audio over time
  chunks (see api.streaming / tools).

All sharding is expressed with NamedSharding constraints on the inputs;
jit propagates the rest.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """2-D mesh ('data', 'model').  model_parallel=1 -> pure DP."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % model_parallel == 0, (n_devices, model_parallel)
    grid = devices.reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def shard_batch(mesh: Mesh, batch):
    """Shard leading batch axis over 'data'."""
    s = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def _convnext_block_sharding(mesh: Mesh, block: dict) -> dict:
    """Tensor-shard the ConvNeXt MLP: pwconv1 (D, I) cols, pwconv2 (I, D) rows."""
    out = {}
    for k, v in block.items():
        if k == "pwconv1":
            out[k] = {"weight": NamedSharding(mesh, P(None, "model")),
                      "bias": NamedSharding(mesh, P("model"))}
        elif k == "pwconv2":
            out[k] = {"weight": NamedSharding(mesh, P("model", None)),
                      "bias": NamedSharding(mesh, P())}
        else:
            out[k] = jax.tree.map(lambda x: NamedSharding(mesh, P()), v)
    return out


def shard_generator_params(mesh: Mesh, params: dict):
    """Place generator params: ConvNeXt MLPs tensor-sharded over 'model',
    everything else replicated.  Works for both the inference pytree
    (backbone at params['backbone']) and the training gen pytree."""
    def place(tree, shardings):
        return jax.tree.map(jax.device_put, tree, shardings)

    shardings = jax.tree.map(lambda x: NamedSharding(mesh, P()), params)
    bb = params.get("backbone", params)
    bb_shard = jax.tree.map(lambda x: NamedSharding(mesh, P()), bb)
    bb_shard = dict(bb_shard)
    bb_shard["convnext"] = [_convnext_block_sharding(mesh, blk)
                            for blk in bb["convnext"]]
    if "backbone" in params:
        shardings = dict(shardings)
        shardings["backbone"] = bb_shard
    else:
        shardings = bb_shard
    return place(params, shardings)


def shard_train_state(mesh: Mesh, state: dict):
    """Training-state placement: replicated except the tensor-parallel
    ConvNeXt MLP weights (mirrored inside the optimizer state by sharding
    the whole state with the same tree transform where shapes line up)."""
    # Replicate everything first (correct, if not maximally sharded), then
    # re-place the generator with TP annotations.  Optimizer moments follow
    # the same sharding as their params through jit propagation.
    state = replicate(mesh, state)
    state = dict(state)
    state["gen"] = dict(state["gen"])
    state["gen"]["backbone"] = shard_generator_params(
        mesh, state["gen"]["backbone"])
    return state
