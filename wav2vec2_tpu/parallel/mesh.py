"""Device mesh + sharding specs.

The reference is single-device (SURVEY.md §2.8); scale-out here is the
idiomatic JAX recipe: a `Mesh` with ('data', 'model') axes, NamedShardings
on the batch and on the encoder weights, and XLA inserting the collectives.

Tensor-parallel layout (Megatron-style, per stacked layer [L, ...]):
- q/k/v kernels [L, H, H] shard the OUTPUT feature axis over 'model' (heads
  split across chips); out_proj [L, H, H] shards the INPUT axis → the
  attention block ends in one psum (XLA-inserted);
- FFN intermediate [L, H, F] shards F; output [L, F, H] shards F → one psum;
- everything else (norms, convs, embeddings, lm_head) is replicated —
  wav2vec2-base is 95 M params, TP only pays off for -large/XLSR
  (SURVEY.md §2.8 TP row).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, data: int | None = None, model: int = 1
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.array(devices[:n]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params: dict, mesh: Mesh) -> dict:
    """PartitionSpec pytree for the wav2vec2 parameter tree: TP over the
    encoder matmuls, everything else replicated."""

    def spec_for(path: tuple, leaf) -> NamedSharding:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "layers" in keys:
            if {"q_proj", "k_proj", "v_proj", "out_proj"} & set(keys):
                # only the four projections TP-shard; other attention params
                # (WavLM gru_rel_pos_*) replicate
                if "out_proj" in keys:
                    # kernel [L, H, H]: shard input axis; bias replicated
                    pspec = P(None, "model", None) if leaf.ndim == 3 else P()
                elif "kernel" in keys:
                    pspec = P(None, None, "model")
                else:  # q/k/v bias [L, H]
                    pspec = P(None, "model")
            elif {"linear_q", "linear_k", "linear_v", "linear_pos"} & set(keys):
                # conformer attention: q/k/v and the rel-pos projection all
                # shard the head-output axis (pos_bias_u/v shard heads below)
                if "kernel" in keys:
                    pspec = P(None, None, "model")
                else:
                    pspec = P(None, "model")
            elif "linear_out" in keys:
                # attention output projection: shard the input axis → the
                # block ends in one psum
                pspec = P(None, "model", None) if leaf.ndim == 3 else P()
            elif {"pos_bias_u", "pos_bias_v"} & set(keys):
                # [L, num_heads, head_dim]: heads split like q/k/v outputs
                pspec = P(None, "model", None)
            elif {"query_proj", "key_proj", "value_proj"} & set(keys):
                # SEW-D DeBERTa attention: same Megatron split, different
                # names (q/k/v shard the head-output axis; share_att_key
                # means the rel-pos projections shard with them for free)
                if "kernel" in keys:
                    pspec = P(None, None, "model")
                else:
                    pspec = P(None, "model")
            elif "feed_forward" in keys or (
                "attention" not in keys and
                {"intermediate_dense", "output_dense"} & set(keys)
            ):
                # wav2vec2 FFN lives under feed_forward.*; SEW-D's BERT-style
                # FFN (intermediate_dense/output_dense) sits at layer level
                if "intermediate_dense" in keys:
                    pspec = (
                        P(None, None, "model") if leaf.ndim == 3 else P(None, "model")
                    )
                elif "output_dense" in keys and "kernel" in keys:
                    pspec = P(None, "model", None)
                else:
                    pspec = P()
            elif "output_dense" in keys and "attention" in keys:
                # SEW-D attention output projection: shard the input axis →
                # the attention block ends in one psum
                pspec = P(None, "model", None) if "kernel" in keys else P()
            else:
                pspec = P()
        else:
            pspec = P()
        return NamedSharding(mesh, pspec)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place the parameter tree onto the mesh with TP shardings."""
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
