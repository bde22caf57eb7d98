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


def generator_shardings(mesh: Mesh, params: dict):
    """Sharding tree (same structure as ``params``): ConvNeXt MLPs
    tensor-sharded over 'model', everything else replicated.  Works for
    both the inference pytree (backbone at params['backbone']) and the
    training gen pytree."""
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
    return shardings


def shard_generator_params(mesh: Mesh, params: dict):
    """Place generator params per :func:`generator_shardings`."""
    return jax.tree.map(jax.device_put, params,
                        generator_shardings(mesh, params))


def _reshard_subtrees_like(opt_state, ref_struct, ref_shardings):
    """Re-place every sub-pytree of an optax state whose STRUCTURE equals
    the reference tree's (AdamW's mu/nu mirror the param tree exactly)
    with the reference shardings; leave everything else (counts, clip
    state) untouched."""
    from jax.tree_util import tree_structure

    def rec(node):
        try:
            if tree_structure(node) == ref_struct:
                return jax.tree.map(jax.device_put, node, ref_shardings)
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[rec(c) for c in node])
        if isinstance(node, tuple):
            return tuple(rec(c) for c in node)
        if isinstance(node, list):
            return [rec(c) for c in node]
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(opt_state)


def shard_train_state(mesh: Mesh, state: dict):
    """Training-state placement: replicated except the tensor-parallel
    ConvNeXt MLP weights — applied to the generator params AND to the AdamW
    moments that mirror them (opt_gen's mu/nu), so TP genuinely shards
    optimizer memory instead of replicating it (r1 left the moments 'to
    jit propagation', which keeps committed inputs replicated)."""
    from jax.tree_util import tree_structure

    state = replicate(mesh, state)
    state = dict(state)
    gen_shardings = generator_shardings(mesh, state["gen"])
    state["gen"] = jax.tree.map(jax.device_put, state["gen"], gen_shardings)
    if "opt_gen" in state:
        # AdamW's mu/nu are sub-pytrees with exactly the gen structure
        state["opt_gen"] = _reshard_subtrees_like(
            state["opt_gen"], tree_structure(state["gen"]), gen_shardings)
    return state
