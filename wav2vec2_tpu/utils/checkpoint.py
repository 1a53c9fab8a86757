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


def hf_weight_prefix(cfg, family: str | None = None) -> str:
    """Top-level HF weight prefix for the model family: transformers'
    WavLMForCTC / Data2VecAudioForCTC / HubertForCTC expect `wavlm.` /
    `data2vec_audio.` / `hubert.` instead of `wav2vec2.`. WavLM and
    data2vec are detected from cfg (attention_style / pos_conv_style);
    HuBERT shares wav2vec2's graph exactly, so it must be requested
    explicitly via `family="hubert"`."""
    if family is not None:
        prefixes = {
            "wav2vec2": "wav2vec2", "hubert": "hubert",
            "data2vec-audio": "data2vec_audio", "wavlm": "wavlm",
            "sew": "sew", "sew-d": "sew_d",
            "wav2vec2-conformer": "wav2vec2_conformer",
            "wav2vec2-bert": "wav2vec2_bert",
            # UniSpeech/-SAT share wav2vec2's graph; like HuBERT they are
            # only reachable via an explicit family= (cfg is identical)
            "unispeech": "unispeech", "unispeech-sat": "unispeech_sat",
        }
        if family not in prefixes:
            raise ValueError(
                f"unknown model family {family!r} (expected one of "
                f"{sorted(prefixes)})"
            )
        return prefixes[family]
    if getattr(cfg, "encoder_style", "wav2vec2") == "conformer":
        return "wav2vec2_conformer"
    if getattr(cfg, "encoder_style", "wav2vec2") == "conformer_bert":
        return "wav2vec2_bert"
    if getattr(cfg, "encoder_style", "wav2vec2") == "sew":
        if getattr(cfg, "attention_style", "wav2vec2") == "deberta":
            return "sew_d"
        return "sew"
    if getattr(cfg, "attention_style", "wav2vec2") == "wavlm":
        return "wavlm"
    if getattr(cfg, "pos_conv_style", "wav2vec2") == "data2vec":
        return "data2vec_audio"
    return "wav2vec2"


def params_to_hf_flat_dict(
    params: dict, cfg, family: str | None = None
) -> dict[str, np.ndarray]:
    """Inverse of models.params.params_from_flat_dict: pytree → HF-named flat
    tensors (safetensors-exportable; linear kernels transposed back to
    torch [out, in]; pos-conv exported as a plain folded weight). The
    top-level prefix follows the model family (hf_weight_prefix) so the
    exports load into the matching transformers *ForCTC class, not just
    this repo's own loader."""
    root = hf_weight_prefix(cfg, family)
    out: dict[str, np.ndarray] = {}

    def put(name, arr):
        # transposed views must be materialized — safetensors serializes the
        # underlying buffer, not the strided view
        out[name] = np.ascontiguousarray(np.asarray(arr))

    fe = params.get("feature_extractor", {}).get("conv_layers", [])
    for i, layer in enumerate(fe):
        p = f"{root}.feature_extractor.conv_layers.{i}"
        put(p + ".conv.weight", layer["conv"]["weight"])
        if "bias" in layer["conv"]:
            put(p + ".conv.bias", layer["conv"]["bias"])
        if "layer_norm" in layer:
            put(p + ".layer_norm.weight", layer["layer_norm"]["weight"])
            put(p + ".layer_norm.bias", layer["layer_norm"]["bias"])

    fp = params["feature_projection"]
    if getattr(cfg, "encoder_style", "wav2vec2") == "sew":
        # SEW/SEW-D: the post-extractor LayerNorm is a model-level tensor
        # and the projection is a bare Linear present only when
        # conv_dim[-1] != hidden_size (SEWModel.project_features)
        put(f"{root}.layer_norm.weight", fp["layer_norm"]["weight"])
        put(f"{root}.layer_norm.bias", fp["layer_norm"]["bias"])
        if "projection" in fp:
            put(f"{root}.feature_projection.weight",
                np.asarray(fp["projection"]["kernel"]).T)
            put(f"{root}.feature_projection.bias", fp["projection"]["bias"])
    else:
        if "layer_norm" in fp:  # absent for HuBERT feat_proj_layer_norm=false
            put(f"{root}.feature_projection.layer_norm.weight",
                fp["layer_norm"]["weight"])
            put(f"{root}.feature_projection.layer_norm.bias",
                fp["layer_norm"]["bias"])
        put(f"{root}.feature_projection.projection.weight",
            np.asarray(fp["projection"]["kernel"]).T)
        put(f"{root}.feature_projection.projection.bias",
            fp["projection"]["bias"])

    enc = params["encoder"]
    pce = enc.get("pos_conv_embed")  # absent for conformer (unused in HF)
    if pce is None:
        pass
    elif "layers" in pce:
        # data2vec-audio stacked positional convs (leading axis L)
        n_pos = int(np.asarray(pce["layers"]["weight"]).shape[0])
        for i in range(n_pos):
            p = f"{root}.encoder.pos_conv_embed.layers.{i}.conv"
            put(p + ".weight", pce["layers"]["weight"][i])
            put(p + ".bias", pce["layers"]["bias"][i])
    else:
        put(f"{root}.encoder.pos_conv_embed.conv.weight", pce["weight"])
        put(f"{root}.encoder.pos_conv_embed.conv.bias", pce["bias"])
        if "batch_norm" in pce:
            # the folded affine re-exported as an inference BatchNorm with
            # mean=0 and var=1-eps (so sqrt(var+eps)=1 exactly): weight and
            # bias then equal the folded scale and shift
            scale = np.asarray(pce["batch_norm"]["scale"])
            shift = np.asarray(pce["batch_norm"]["shift"])
            p = f"{root}.encoder.pos_conv_embed.batch_norm"
            put(p + ".weight", scale)
            put(p + ".bias", shift)
            put(p + ".running_mean", np.zeros_like(scale))
            put(p + ".running_var",
                np.full_like(scale, 1.0 - 1e-5))
            put(p + ".num_batches_tracked",
                np.asarray(0, dtype=np.int64))
    if "layer_norm" in enc:  # absent for SEW-D's DeBERTa encoder
        put(f"{root}.encoder.layer_norm.weight", enc["layer_norm"]["weight"])
        put(f"{root}.encoder.layer_norm.bias", enc["layer_norm"]["bias"])
    if "upsample" in enc:
        # SEW/SEW-D upsampler back to the conv frame rate
        put(f"{root}.encoder.upsample.projection.weight",
            np.asarray(enc["upsample"]["projection"]["kernel"]).T)
        put(f"{root}.encoder.upsample.projection.bias",
            enc["upsample"]["projection"]["bias"])
    if "rel_embeddings" in enc:
        # SEW-D shared relative-position embedding (+ its LayerNorm when
        # norm_rel_ebd includes layer_norm)
        put(f"{root}.encoder.encoder.rel_embeddings.weight",
            enc["rel_embeddings"])
        if "rel_embeddings_layer_norm" in enc:
            put(f"{root}.encoder.encoder.LayerNorm.weight",
                enc["rel_embeddings_layer_norm"]["weight"])
            put(f"{root}.encoder.encoder.LayerNorm.bias",
                enc["rel_embeddings_layer_norm"]["bias"])

    stacked = enc["layers"]
    if "ffn1" in stacked:
        # conformer blocks; pointwise matmul kernels are re-expanded to the
        # torch [out, in, 1] conv weights, the folded BatchNorm affine is
        # re-exported as inference running stats (mean=0, var=1-eps so
        # sqrt(var+eps)=1 exactly, weight=scale, bias=shift)
        n_layers = int(np.asarray(
            stacked["self_attn"]["linear_q"]["kernel"]).shape[0])
        for i in range(n_layers):
            p = f"{root}.encoder.layers.{i}"
            for proj in ("linear_q", "linear_k", "linear_v", "linear_out"):
                put(f"{p}.self_attn.{proj}.weight",
                    np.asarray(stacked["self_attn"][proj]["kernel"][i]).T)
                put(f"{p}.self_attn.{proj}.bias",
                    stacked["self_attn"][proj]["bias"][i])
            if "linear_pos" in stacked["self_attn"]:
                put(f"{p}.self_attn.linear_pos.weight",
                    np.asarray(
                        stacked["self_attn"]["linear_pos"]["kernel"][i]).T)
                put(f"{p}.self_attn.pos_bias_u",
                    stacked["self_attn"]["pos_bias_u"][i])
                put(f"{p}.self_attn.pos_bias_v",
                    stacked["self_attn"]["pos_bias_v"][i])
            if "distance_embedding" in stacked["self_attn"]:
                # w2v-BERT relative_key clamped-distance embedding
                put(f"{p}.self_attn.distance_embedding.weight",
                    stacked["self_attn"]["distance_embedding"][i])
            for ffn in ("ffn1", "ffn2"):
                put(f"{p}.{ffn}_layer_norm.weight",
                    stacked[f"{ffn}_layer_norm"]["weight"][i])
                put(f"{p}.{ffn}_layer_norm.bias",
                    stacked[f"{ffn}_layer_norm"]["bias"][i])
                for name in ("intermediate_dense", "output_dense"):
                    put(f"{p}.{ffn}.{name}.weight",
                        np.asarray(stacked[ffn][name]["kernel"][i]).T)
                    put(f"{p}.{ffn}.{name}.bias", stacked[ffn][name]["bias"][i])
            for lnn in ("self_attn_layer_norm", "final_layer_norm"):
                put(f"{p}.{lnn}.weight", stacked[lnn]["weight"][i])
                put(f"{p}.{lnn}.bias", stacked[lnn]["bias"][i])
            cm = stacked["conv_module"]
            put(f"{p}.conv_module.layer_norm.weight",
                cm["layer_norm"]["weight"][i])
            put(f"{p}.conv_module.layer_norm.bias", cm["layer_norm"]["bias"][i])
            put(f"{p}.conv_module.pointwise_conv1.weight",
                np.asarray(cm["pointwise_conv1"]["kernel"][i]).T[:, :, None])
            put(f"{p}.conv_module.pointwise_conv2.weight",
                np.asarray(cm["pointwise_conv2"]["kernel"][i]).T[:, :, None])
            put(f"{p}.conv_module.depthwise_conv.weight",
                cm["depthwise_conv"]["weight"][i])
            if "depthwise_layer_norm" in cm:
                # w2v-BERT conv module: LayerNorm after the causal conv
                put(f"{p}.conv_module.depthwise_layer_norm.weight",
                    cm["depthwise_layer_norm"]["weight"][i])
                put(f"{p}.conv_module.depthwise_layer_norm.bias",
                    cm["depthwise_layer_norm"]["bias"][i])
            else:
                scale = np.asarray(cm["batch_norm"]["scale"][i])
                shift = np.asarray(cm["batch_norm"]["shift"][i])
                bn = f"{p}.conv_module.batch_norm"
                put(bn + ".weight", scale)
                put(bn + ".bias", shift)
                put(bn + ".running_mean", np.zeros_like(scale))
                put(bn + ".running_var", np.full_like(scale, 1.0 - 1e-5))
                put(bn + ".num_batches_tracked",
                    np.asarray(0, dtype=np.int64))
        if "intermediate_ffn" in params:
            for name in ("intermediate_dense", "output_dense"):
                put(f"{root}.intermediate_ffn.{name}.weight",
                    np.asarray(params["intermediate_ffn"][name]["kernel"]).T)
                put(f"{root}.intermediate_ffn.{name}.bias",
                    params["intermediate_ffn"][name]["bias"])
        if "adapter" in params and "residual_conv" in params["adapter"]["layers"]:
            a = params["adapter"]
            if "proj" in a:
                put(f"{root}.adapter.proj.weight",
                    np.asarray(a["proj"]["kernel"]).T)
                put(f"{root}.adapter.proj.bias", a["proj"]["bias"])
                put(f"{root}.adapter.proj_layer_norm.weight",
                    a["proj_layer_norm"]["weight"])
                put(f"{root}.adapter.proj_layer_norm.bias",
                    a["proj_layer_norm"]["bias"])
            al = a["layers"]
            n_a = int(np.asarray(al["residual_conv"]["weight"]).shape[0])
            for i in range(n_a):
                p = f"{root}.adapter.layers.{i}"
                for lnn in ("residual_layer_norm", "self_attn_layer_norm",
                            "ffn_layer_norm"):
                    put(f"{p}.{lnn}.weight", al[lnn]["weight"][i])
                    put(f"{p}.{lnn}.bias", al[lnn]["bias"][i])
                for conv in ("residual_conv", "self_attn_conv"):
                    put(f"{p}.{conv}.weight", al[conv]["weight"][i])
                    put(f"{p}.{conv}.bias", al[conv]["bias"][i])
                for proj in ("linear_q", "linear_k", "linear_v",
                             "linear_out"):
                    put(f"{p}.self_attn.{proj}.weight",
                        np.asarray(al["self_attn"][proj]["kernel"][i]).T)
                    put(f"{p}.self_attn.{proj}.bias",
                        al["self_attn"][proj]["bias"][i])
                for name in ("intermediate_dense", "output_dense"):
                    put(f"{p}.ffn.{name}.weight",
                        np.asarray(al["ffn"][name]["kernel"][i]).T)
                    put(f"{p}.ffn.{name}.bias", al["ffn"][name]["bias"][i])
        put("lm_head.weight", np.asarray(params["lm_head"]["kernel"]).T)
        put("lm_head.bias", params["lm_head"]["bias"])
        return out
    if "query_proj" in stacked["attention"]:
        # SEW-D DeBERTa layers live under encoder.encoder.layer.N with
        # BERT-style inner names (attention.self / attention.output /
        # intermediate / output)
        att = stacked["attention"]
        n_layers = int(np.asarray(att["query_proj"]["kernel"]).shape[0])
        for i in range(n_layers):
            p = f"{root}.encoder.encoder.layer.{i}"
            for ours, theirs in (("query_proj", "self.query_proj"),
                                 ("key_proj", "self.key_proj"),
                                 ("value_proj", "self.value_proj"),
                                 ("output_dense", "output.dense")):
                put(f"{p}.attention.{theirs}.weight",
                    np.asarray(att[ours]["kernel"][i]).T)
                put(f"{p}.attention.{theirs}.bias", att[ours]["bias"][i])
            put(f"{p}.attention.output.LayerNorm.weight",
                att["output_norm"]["weight"][i])
            put(f"{p}.attention.output.LayerNorm.bias",
                att["output_norm"]["bias"][i])
            put(f"{p}.intermediate.dense.weight",
                np.asarray(stacked["intermediate_dense"]["kernel"][i]).T)
            put(f"{p}.intermediate.dense.bias",
                stacked["intermediate_dense"]["bias"][i])
            put(f"{p}.output.dense.weight",
                np.asarray(stacked["output_dense"]["kernel"][i]).T)
            put(f"{p}.output.dense.bias", stacked["output_dense"]["bias"][i])
            put(f"{p}.output.LayerNorm.weight",
                stacked["output_norm"]["weight"][i])
            put(f"{p}.output.LayerNorm.bias", stacked["output_norm"]["bias"][i])
        put("lm_head.weight", np.asarray(params["lm_head"]["kernel"]).T)
        put("lm_head.bias", params["lm_head"]["bias"])
        return out

    n_layers = int(np.asarray(
        stacked["attention"]["q_proj"]["kernel"]
    ).shape[0])
    for i in range(n_layers):
        p = f"{root}.encoder.layers.{i}"
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
        if "adapter_layer" in stacked:
            a = stacked["adapter_layer"]
            put(f"{p}.adapter_layer.norm.weight", a["norm"]["weight"][i])
            put(f"{p}.adapter_layer.norm.bias", a["norm"]["bias"][i])
            for lin in ("linear_1", "linear_2"):
                put(f"{p}.adapter_layer.{lin}.weight",
                    np.asarray(a[lin]["kernel"][i]).T)
                put(f"{p}.adapter_layer.{lin}.bias", a[lin]["bias"][i])
        if "gru_rel_pos_const" in stacked["attention"]:
            put(f"{p}.attention.gru_rel_pos_const",
                stacked["attention"]["gru_rel_pos_const"][i])
            put(f"{p}.attention.gru_rel_pos_linear.weight",
                np.asarray(stacked["attention"]["gru_rel_pos_linear"]["kernel"][i]).T)
            put(f"{p}.attention.gru_rel_pos_linear.bias",
                stacked["attention"]["gru_rel_pos_linear"]["bias"][i])
            if i == 0 and "rel_attn_embed" in enc:
                # WavLM: the shared bias embedding belongs to layer 0 in the
                # HF layout
                put(f"{p}.attention.rel_attn_embed.weight",
                    enc["rel_attn_embed"])

    if "adapter" in params:
        a = params["adapter"]
        if "proj" in a:
            put(f"{root}.adapter.proj.weight",
                np.asarray(a["proj"]["kernel"]).T)
            put(f"{root}.adapter.proj.bias", a["proj"]["bias"])
            put(f"{root}.adapter.proj_layer_norm.weight",
                a["proj_layer_norm"]["weight"])
            put(f"{root}.adapter.proj_layer_norm.bias",
                a["proj_layer_norm"]["bias"])
        n_a = int(np.asarray(a["layers"]["weight"]).shape[0])
        for i in range(n_a):
            put(f"{root}.adapter.layers.{i}.conv.weight",
                a["layers"]["weight"][i])
            put(f"{root}.adapter.layers.{i}.conv.bias", a["layers"]["bias"][i])

    put("lm_head.weight", np.asarray(params["lm_head"]["kernel"]).T)
    put("lm_head.bias", params["lm_head"]["bias"])
    return out


def save_safetensors(
    path: str | Path, params: dict, cfg, family: str | None = None
) -> None:
    from safetensors.numpy import save_file

    flat = params_to_hf_flat_dict(params, cfg, family=family)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    save_file(flat, str(path))
