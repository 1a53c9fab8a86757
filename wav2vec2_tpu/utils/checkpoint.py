"""Checkpoint save/restore (orbax) for parameters and train state.

The reference is inference-only with operational resume only (perf JSONL
append, TextGrid skip — SURVEY.md §5 checkpoint/resume). The TPU framework
adds real compute checkpointing for the training path: orbax for sharded
pytrees (restores onto any mesh), plus safetensors export for
HF-interoperable inference weights.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save_params(path: str | Path, params: dict) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def restore_params(path: str | Path, like: dict | None = None) -> dict:
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        target = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like
        )
        return ckptr.restore(path, target)
    return ckptr.restore(path)


def params_to_hf_flat_dict(params: dict, cfg) -> dict[str, np.ndarray]:
    """Inverse of models.params.params_from_flat_dict: pytree → HF-named flat
    tensors (safetensors-exportable; linear kernels transposed back to
    torch [out, in]; pos-conv exported as a plain folded weight)."""
    out: dict[str, np.ndarray] = {}

    def put(name, arr):
        # transposed views must be materialized — safetensors serializes the
        # underlying buffer, not the strided view
        out[name] = np.ascontiguousarray(np.asarray(arr))

    fe = params["feature_extractor"]["conv_layers"]
    for i, layer in enumerate(fe):
        p = f"wav2vec2.feature_extractor.conv_layers.{i}"
        put(p + ".conv.weight", layer["conv"]["weight"])
        if "bias" in layer["conv"]:
            put(p + ".conv.bias", layer["conv"]["bias"])
        if "layer_norm" in layer:
            put(p + ".layer_norm.weight", layer["layer_norm"]["weight"])
            put(p + ".layer_norm.bias", layer["layer_norm"]["bias"])

    fp = params["feature_projection"]
    put("wav2vec2.feature_projection.layer_norm.weight", fp["layer_norm"]["weight"])
    put("wav2vec2.feature_projection.layer_norm.bias", fp["layer_norm"]["bias"])
    put("wav2vec2.feature_projection.projection.weight",
        np.asarray(fp["projection"]["kernel"]).T)
    put("wav2vec2.feature_projection.projection.bias", fp["projection"]["bias"])

    enc = params["encoder"]
    put("wav2vec2.encoder.pos_conv_embed.conv.weight", enc["pos_conv_embed"]["weight"])
    put("wav2vec2.encoder.pos_conv_embed.conv.bias", enc["pos_conv_embed"]["bias"])
    put("wav2vec2.encoder.layer_norm.weight", enc["layer_norm"]["weight"])
    put("wav2vec2.encoder.layer_norm.bias", enc["layer_norm"]["bias"])

    stacked = enc["layers"]
    n_layers = int(np.asarray(
        stacked["attention"]["q_proj"]["kernel"]
    ).shape[0])
    for i in range(n_layers):
        p = f"wav2vec2.encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put(f"{p}.attention.{proj}.weight",
                np.asarray(stacked["attention"][proj]["kernel"][i]).T)
            put(f"{p}.attention.{proj}.bias",
                stacked["attention"][proj]["bias"][i])
        put(f"{p}.layer_norm.weight", stacked["layer_norm"]["weight"][i])
        put(f"{p}.layer_norm.bias", stacked["layer_norm"]["bias"][i])
        put(f"{p}.final_layer_norm.weight", stacked["final_layer_norm"]["weight"][i])
        put(f"{p}.final_layer_norm.bias", stacked["final_layer_norm"]["bias"][i])
        for name in ("intermediate_dense", "output_dense"):
            put(f"{p}.feed_forward.{name}.weight",
                np.asarray(stacked["feed_forward"][name]["kernel"][i]).T)
            put(f"{p}.feed_forward.{name}.bias",
                stacked["feed_forward"][name]["bias"][i])

    put("lm_head.weight", np.asarray(params["lm_head"]["kernel"]).T)
    put("lm_head.bias", params["lm_head"]["bias"])
    return out


def save_safetensors(path: str | Path, params: dict, cfg) -> None:
    from safetensors.numpy import save_file

    flat = params_to_hf_flat_dict(params, cfg)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    save_file(flat, str(path))
