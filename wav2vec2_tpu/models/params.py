"""Parameter pytree construction: random init, HF safetensors loading, and
torch state-dict conversion.

The HF weight-name map matches what the reference's Candle loader consumes
(/root/reference/src/pipeline/model_runtime.rs + SURVEY.md §3.3):
`wav2vec2.feature_extractor.conv_layers.N.*`,
`wav2vec2.feature_projection.*`, `wav2vec2.encoder.pos_conv_embed.conv.*`
(weight-norm: weight_g/weight_v, both layouts, or the newer torch
parametrizations aliases), `wav2vec2.encoder.layers.N.{attention,
feed_forward, layer_norm, final_layer_norm}.*`, `wav2vec2.encoder.layer_norm`,
and `lm_head`.

Layout decisions (TPU-first):
- Linear weights are pre-transposed to [in, out] kernels at load time.
- Encoder layers are STACKED along a leading L axis for `lax.scan` and for
  one-array-per-parameter sharding.
- The weight-normalized pos-conv is folded into a plain conv weight at load
  (feature_extractor.rs:113-133 semantics via layers.fold_weight_norm).
"""

from __future__ import annotations

import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Wav2Vec2ModelConfig
from ..errors import RuntimeBackendError
from .layers import fold_weight_norm


def init_params(
    cfg: Wav2Vec2ModelConfig, rng: jax.Array, dtype=jnp.float32
) -> dict:
    """Random-init parameter pytree (shape-identical to loaded checkpoints)."""
    k_it = _key_iter(rng)

    def dense(n_in, n_out):
        scale = (2.0 / (n_in + n_out)) ** 0.5
        return {
            "kernel": (jax.random.normal(next(k_it), (n_in, n_out)) * scale).astype(dtype),
            "bias": jnp.zeros((n_out,), dtype),
        }

    def ln(n):
        return {"weight": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}

    conv_layers = []
    in_c = 1
    for i, (out_c, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        conv = {
            "weight": (
                jax.random.normal(next(k_it), (out_c, in_c, k))
                * (1.0 / (in_c * k)) ** 0.5
            ).astype(dtype)
        }
        if cfg.conv_bias:
            conv["bias"] = jnp.zeros((out_c,), dtype)
        layer = {"conv": conv}
        if cfg.feat_extract_norm == "layer" or (
            cfg.feat_extract_norm == "group" and i == 0
        ):
            layer["layer_norm"] = ln(out_c)
        conv_layers.append(layer)
        in_c = out_c

    h, ffn = cfg.hidden_size, cfg.intermediate_size
    g = cfg.num_conv_pos_embedding_groups
    if getattr(cfg, "encoder_style", "wav2vec2") in (
        "conformer", "conformer_bert"
    ):
        pos_conv = None  # no (used) positional conv in these encoders
    elif cfg.pos_conv_style == "data2vec":
        kpos = cfg.conv_pos_kernel_size
        n_l = cfg.num_conv_pos_embeddings
        pos_conv = {"layers": {
            "weight": (
                jax.random.normal(next(k_it), (n_l, h, h // g, kpos))
                * (1.0 / (h // g * kpos)) ** 0.5
            ).astype(dtype),
            "bias": jnp.zeros((n_l, h), dtype),
        }}
    else:
        kpos = cfg.num_conv_pos_embeddings
        pos_conv = {
            "weight": (
                jax.random.normal(next(k_it), (h, h // g, kpos)) * (1.0 / (h // g * kpos)) ** 0.5
            ).astype(dtype),
            "bias": jnp.zeros((h,), dtype),
        }
        if getattr(cfg, "conv_pos_batch_norm", False):
            pos_conv["batch_norm"] = {
                "scale": jnp.ones((h,), dtype),
                "shift": jnp.zeros((h,), dtype),
            }

    def enc_layer():
        layer = {
            "attention": {
                "q_proj": dense(h, h), "k_proj": dense(h, h),
                "v_proj": dense(h, h), "out_proj": dense(h, h),
            },
            "layer_norm": ln(h),
            "feed_forward": {
                "intermediate_dense": dense(h, ffn),
                "output_dense": dense(ffn, h),
            },
            "final_layer_norm": ln(h),
        }
        if cfg.adapter_attn_dim:
            layer["adapter_layer"] = {
                "norm": ln(h),
                "linear_1": dense(h, cfg.adapter_attn_dim),
                "linear_2": dense(cfg.adapter_attn_dim, h),
            }
        if getattr(cfg, "attention_style", "wav2vec2") == "wavlm":
            hd = h // cfg.num_attention_heads
            layer["attention"]["gru_rel_pos_const"] = jnp.ones(
                (1, cfg.num_attention_heads, 1, 1), dtype
            )
            layer["attention"]["gru_rel_pos_linear"] = dense(hd, 8)
        return layer

    def sewd_enc_layer():
        return {
            "attention": {
                "query_proj": dense(h, h), "key_proj": dense(h, h),
                "value_proj": dense(h, h), "output_dense": dense(h, h),
                "output_norm": ln(h),
            },
            "intermediate_dense": dense(h, ffn),
            "output_dense": dense(ffn, h),
            "output_norm": ln(h),
        }

    def conformer_enc_layer():
        k = cfg.conv_depthwise_kernel_size
        self_attn = {
            "linear_q": dense(h, h), "linear_k": dense(h, h),
            "linear_v": dense(h, h), "linear_out": dense(h, h),
        }
        if getattr(cfg, "position_embeddings_type", "relative") == "relative":
            hd = h // cfg.num_attention_heads
            self_attn["linear_pos"] = {
                "kernel": (jax.random.normal(next(k_it), (h, h))
                           * (1.0 / h) ** 0.5).astype(dtype)
            }
            self_attn["pos_bias_u"] = jnp.zeros(
                (cfg.num_attention_heads, hd), dtype)
            self_attn["pos_bias_v"] = jnp.zeros(
                (cfg.num_attention_heads, hd), dtype)
        return {
            "ffn1_layer_norm": ln(h),
            "ffn1": {"intermediate_dense": dense(h, ffn),
                     "output_dense": dense(ffn, h)},
            "self_attn_layer_norm": ln(h),
            "self_attn": self_attn,
            "conv_module": {
                "layer_norm": ln(h),
                "pointwise_conv1": {"kernel": (
                    jax.random.normal(next(k_it), (h, 2 * h))
                    * (1.0 / h) ** 0.5).astype(dtype)},
                "depthwise_conv": {"weight": (
                    jax.random.normal(next(k_it), (h, 1, k))
                    * (1.0 / k) ** 0.5).astype(dtype)},
                # BatchNorm running stats fold to an identity affine at init
                "batch_norm": {"scale": jnp.ones((h,), dtype),
                               "shift": jnp.zeros((h,), dtype)},
                "pointwise_conv2": {"kernel": (
                    jax.random.normal(next(k_it), (h, h))
                    * (1.0 / h) ** 0.5).astype(dtype)},
            },
            "ffn2_layer_norm": ln(h),
            "ffn2": {"intermediate_dense": dense(h, ffn),
                     "output_dense": dense(ffn, h)},
            "final_layer_norm": ln(h),
        }

    def conformer_bert_enc_layer():
        # w2v-BERT block: conformer shape with a causal depthwise conv +
        # LayerNorm (no BatchNorm) and optional relative_key distance
        # embedding (Wav2Vec2BertEncoderLayer)
        k = cfg.conv_depthwise_kernel_size
        hd = h // cfg.num_attention_heads
        self_attn = {
            "linear_q": dense(h, h), "linear_k": dense(h, h),
            "linear_v": dense(h, h), "linear_out": dense(h, h),
        }
        style = getattr(cfg, "position_embeddings_type", "relative_key")
        if style == "relative":
            self_attn["linear_pos"] = {
                "kernel": (jax.random.normal(next(k_it), (h, h))
                           * (1.0 / h) ** 0.5).astype(dtype)
            }
            self_attn["pos_bias_u"] = jnp.zeros(
                (cfg.num_attention_heads, hd), dtype)
            self_attn["pos_bias_v"] = jnp.zeros(
                (cfg.num_attention_heads, hd), dtype)
        elif style == "relative_key":
            n_pos = (cfg.left_max_position_embeddings
                     + cfg.right_max_position_embeddings + 1)
            self_attn["distance_embedding"] = (
                jax.random.normal(next(k_it), (n_pos, hd)) * 0.02
            ).astype(dtype)
        return {
            "ffn1_layer_norm": ln(h),
            "ffn1": {"intermediate_dense": dense(h, ffn),
                     "output_dense": dense(ffn, h)},
            "self_attn_layer_norm": ln(h),
            "self_attn": self_attn,
            "conv_module": {
                "layer_norm": ln(h),
                "pointwise_conv1": {"kernel": (
                    jax.random.normal(next(k_it), (h, 2 * h))
                    * (1.0 / h) ** 0.5).astype(dtype)},
                "depthwise_conv": {"weight": (
                    jax.random.normal(next(k_it), (h, 1, k))
                    * (1.0 / k) ** 0.5).astype(dtype)},
                "depthwise_layer_norm": ln(h),
                "pointwise_conv2": {"kernel": (
                    jax.random.normal(next(k_it), (h, h))
                    * (1.0 / h) ** 0.5).astype(dtype)},
            },
            "ffn2_layer_norm": ln(h),
            "ffn2": {"intermediate_dense": dense(h, ffn),
                     "output_dense": dense(ffn, h)},
            "final_layer_norm": ln(h),
        }

    deberta = getattr(cfg, "attention_style", "wav2vec2") == "deberta"
    conformer = getattr(cfg, "encoder_style", "wav2vec2") == "conformer"
    conformer_bert = (
        getattr(cfg, "encoder_style", "wav2vec2") == "conformer_bert"
    )
    layer_builder = (
        sewd_enc_layer if deberta
        else conformer_enc_layer if conformer
        else conformer_bert_enc_layer if conformer_bert
        else enc_layer
    )
    layers = [layer_builder() for _ in range(cfg.num_hidden_layers)]
    if layers:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    else:
        # num_hidden_layers == 0 (conv-only CTC heads — e.g. the local-
        # emission models the signal-regime stitching validation trains):
        # lax.scan over a length-0 leading axis runs zero iterations
        template = layer_builder()
        stacked = jax.tree.map(
            lambda x: jnp.zeros((0,) + x.shape, x.dtype), template
        )

    if conformer_bert:
        # mel frontend (models/mel.py) replaces the conv stack; the
        # projection consumes the stacked 2×80 log-mel features
        in_dim = getattr(cfg, "feature_projection_input_dim", 160)
        feature_projection = {"layer_norm": ln(in_dim),
                              "projection": dense(in_dim, h)}
    elif getattr(cfg, "encoder_style", "wav2vec2") == "sew":
        feature_projection = {"layer_norm": ln(cfg.conv_dim[-1])}
        if cfg.conv_dim[-1] != h:
            feature_projection["projection"] = dense(cfg.conv_dim[-1], h)
    else:
        feature_projection = {"projection": dense(cfg.conv_dim[-1], h)}
        if cfg.feat_proj_layer_norm:
            feature_projection["layer_norm"] = ln(cfg.conv_dim[-1])
    tree = {
        **({} if conformer_bert
           else {"feature_extractor": {"conv_layers": conv_layers}}),
        "feature_projection": feature_projection,
        "encoder": {
            # the conformer encoders have no (used) positional conv — HF's
            # wav2vec2-conformer constructs one but never calls it in
            # forward; w2v-BERT has none at all
            **({} if conformer or conformer_bert
               else {"pos_conv_embed": pos_conv}),
            # SEW-D's DeBERTa encoder and w2v-BERT have no encoder-level
            # LayerNorm (each w2v-BERT block ends in its own final LN)
            **({} if deberta or conformer_bert else {"layer_norm": ln(h)}),
            "layers": stacked,
            **({"rel_attn_embed": (
                jax.random.normal(
                    next(k_it), (cfg.num_buckets, cfg.num_attention_heads)
                ) * 0.02
            ).astype(dtype)}
               if getattr(cfg, "attention_style", "wav2vec2") == "wavlm"
               else {}),
            **({"upsample": {"projection": dense(
                h, h * cfg.squeeze_factor)}}
               if getattr(cfg, "encoder_style", "wav2vec2") == "sew"
               else {}),
            **({"rel_embeddings": (
                jax.random.normal(
                    next(k_it), (2 * cfg.position_buckets, h)
                ) * 0.02
            ).astype(dtype),
                "rel_embeddings_layer_norm": ln(h)}
               if deberta else {}),
        },
        "lm_head": dense(h, cfg.vocab_size),
    }
    if getattr(cfg, "use_intermediate_ffn_before_adapter", False):
        tree["intermediate_ffn"] = {"intermediate_dense": dense(h, ffn),
                                    "output_dense": dense(ffn, h)}
    if getattr(cfg, "add_adapter", False) and conformer_bert:
        out_h = cfg.output_hidden_size or h
        k = cfg.adapter_kernel_size

        def bert_adapter_layer():
            return {
                "residual_layer_norm": ln(out_h),
                "residual_conv": {
                    "weight": (jax.random.normal(
                        next(k_it), (2 * out_h, out_h, k))
                        * (1.0 / (out_h * k)) ** 0.5).astype(dtype),
                    "bias": jnp.zeros((2 * out_h,), dtype),
                },
                "self_attn_layer_norm": ln(out_h),
                "self_attn_conv": {
                    "weight": (jax.random.normal(
                        next(k_it), (2 * out_h, out_h, k))
                        * (1.0 / (out_h * k)) ** 0.5).astype(dtype),
                    "bias": jnp.zeros((2 * out_h,), dtype),
                },
                "self_attn": {
                    "linear_q": dense(out_h, out_h),
                    "linear_k": dense(out_h, out_h),
                    "linear_v": dense(out_h, out_h),
                    "linear_out": dense(out_h, out_h),
                },
                "ffn_layer_norm": ln(out_h),
                "ffn": {"intermediate_dense": dense(out_h, ffn),
                        "output_dense": dense(ffn, out_h)},
            }

        adapter = {}
        if out_h != h:
            adapter["proj"] = dense(h, out_h)
            adapter["proj_layer_norm"] = ln(out_h)
        a_layers = [bert_adapter_layer()
                    for _ in range(cfg.num_adapter_layers)]
        adapter["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *a_layers)
        tree["adapter"] = adapter
        tree["lm_head"] = dense(out_h, cfg.vocab_size)
    elif getattr(cfg, "add_adapter", False):
        out_h = cfg.output_hidden_size or h
        k = cfg.adapter_kernel_size
        adapter = {}
        if out_h != h:
            adapter["proj"] = dense(h, out_h)
            adapter["proj_layer_norm"] = ln(out_h)
        adapter["layers"] = {
            "weight": (
                jax.random.normal(
                    next(k_it), (cfg.num_adapter_layers, 2 * out_h, out_h, k)
                ) * (1.0 / (out_h * k)) ** 0.5
            ).astype(dtype),
            "bias": jnp.zeros((cfg.num_adapter_layers, 2 * out_h), dtype),
        }
        tree["adapter"] = adapter
        tree["lm_head"] = dense(out_h, cfg.vocab_size)
    return tree


def _key_iter(rng):
    while True:
        rng, sub = jax.random.split(rng)
        yield sub


# --- flat HF tensor dict → pytree ---

_POS_CONV_ALIASES = {
    "wav2vec2.encoder.pos_conv_embed.conv.parametrizations.weight.original0":
        "wav2vec2.encoder.pos_conv_embed.conv.weight_g",
    "wav2vec2.encoder.pos_conv_embed.conv.parametrizations.weight.original1":
        "wav2vec2.encoder.pos_conv_embed.conv.weight_v",
}


def params_from_flat_dict(
    tensors: dict[str, np.ndarray],
    cfg: Wav2Vec2ModelConfig,
    dtype=jnp.float32,
    compute_weights_dtype=None,
) -> dict:
    """Build the parameter pytree from a flat {hf_name: array} mapping
    (safetensors file contents or a torch state_dict converted to numpy).

    The whole tree is assembled host-side in numpy and shipped with ONE
    jax.device_put at the end: per-tensor eager device ops would pay a
    dispatch round-trip for each of the ~200 checkpoint tensors (~10 s of
    pure latency on a remote-TPU link)."""
    t = {}
    for name, arr in tensors.items():
        # HuBERT checkpoints share the graph; only the weight prefix differs
        # (transformers HubertForCTC: `hubert.*` + `lm_head`)
        if name.startswith("hubert."):
            name = "wav2vec2." + name[len("hubert."):]
        elif name.startswith("data2vec_audio."):
            name = "wav2vec2." + name[len("data2vec_audio."):]
        elif name.startswith("wavlm."):
            name = "wav2vec2." + name[len("wavlm."):]
        elif name.startswith("sew_d."):
            name = "wav2vec2." + name[len("sew_d."):]
        elif name.startswith("sew."):
            name = "wav2vec2." + name[len("sew."):]
        elif name.startswith("wav2vec2_conformer."):
            name = "wav2vec2." + name[len("wav2vec2_conformer."):]
        elif name.startswith("wav2vec2_bert."):
            name = "wav2vec2." + name[len("wav2vec2_bert."):]
        elif name.startswith("unispeech_sat."):
            # UniSpeech / UniSpeech-SAT share wav2vec2's CTC graph exactly
            # (transformers modular_unispeech{,_sat}.py)
            name = "wav2vec2." + name[len("unispeech_sat."):]
        elif name.startswith("unispeech."):
            name = "wav2vec2." + name[len("unispeech."):]
        t[_POS_CONV_ALIASES.get(name, name)] = np.asarray(arr)

    def get(name):
        if name not in t:
            raise RuntimeBackendError("load weights", f"missing tensor {name!r}")
        return np.asarray(t[name], dtype=dtype)

    def has(name):
        return name in t

    def dense(prefix):
        w = get(prefix + ".weight")
        return {"kernel": w.T, "bias": get(prefix + ".bias")}

    def ln(prefix):
        return {"weight": get(prefix + ".weight"), "bias": get(prefix + ".bias")}

    conv_layers = []
    n_conv = (0 if getattr(cfg, "frontend_style", "conv") == "mel"
              else len(cfg.conv_dim))
    for i in range(n_conv):
        p = f"wav2vec2.feature_extractor.conv_layers.{i}"
        conv = {"weight": get(p + ".conv.weight")}
        if has(p + ".conv.bias"):
            conv["bias"] = get(p + ".conv.bias")
        layer = {"conv": conv}
        if has(p + ".layer_norm.weight"):
            layer["layer_norm"] = ln(p + ".layer_norm")
        conv_layers.append(layer)

    if getattr(cfg, "encoder_style", "wav2vec2") in (
        "conformer", "conformer_bert"
    ):
        # no used positional conv (see tree assembly below); checkpoints may
        # or may not carry the unused HF weights — never read either way
        pos_conv = None
    elif has("wav2vec2.encoder.pos_conv_embed.layers.0.conv.weight"):
        # data2vec-audio: stacked positional convs (no weight norm),
        # leading axis L for the lax.scan in pos_conv_stack_forward
        stack = []
        i = 0
        while has(f"wav2vec2.encoder.pos_conv_embed.layers.{i}.conv.weight"):
            p = f"wav2vec2.encoder.pos_conv_embed.layers.{i}.conv"
            stack.append({"weight": get(p + ".weight"),
                          "bias": get(p + ".bias")})
            i += 1
        pos_conv = {"layers": jax.tree.map(lambda *xs: np.stack(xs), *stack)}
    else:
        pos_p = "wav2vec2.encoder.pos_conv_embed.conv"
        if has(pos_p + ".weight_v"):
            pos_weight = fold_weight_norm(
                get(pos_p + ".weight_g"), get(pos_p + ".weight_v")
            ).astype(dtype)
        else:
            pos_weight = get(pos_p + ".weight")
        pos_conv = {"weight": pos_weight, "bias": get(pos_p + ".bias")}
        bn_p = "wav2vec2.encoder.pos_conv_embed.batch_norm"
        if getattr(cfg, "conv_pos_batch_norm", False):
            # gated by CONFIG, not tensor presence — a conv_pos_batch_norm
            # checkpoint missing the BN stats must fail loudly (get raises)
            # conv_pos_batch_norm (mHuBERT-147 style): inference-mode
            # BatchNorm1d on the conv INPUT is a per-channel affine of the
            # running stats — folded here so the graph stays one conv
            # (HubertPositionalConvEmbedding parity; torch BN eps = 1e-5)
            gamma = get(bn_p + ".weight")
            beta = get(bn_p + ".bias")
            mean = get(bn_p + ".running_mean")
            var = get(bn_p + ".running_var")
            scale = gamma / np.sqrt(var + 1e-5)
            pos_conv["batch_norm"] = {
                "scale": scale.astype(dtype),
                "shift": (beta - mean * scale).astype(dtype),
            }

    def enc_layer(i):
        p = f"wav2vec2.encoder.layers.{i}"
        layer = {
            "attention": {
                k: dense(f"{p}.attention.{k}")
                for k in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "layer_norm": ln(p + ".layer_norm"),
            "feed_forward": {
                "intermediate_dense": dense(p + ".feed_forward.intermediate_dense"),
                "output_dense": dense(p + ".feed_forward.output_dense"),
            },
            "final_layer_norm": ln(p + ".final_layer_norm"),
        }
        if has(p + ".adapter_layer.norm.weight"):
            # MMS attention adapter (per-language weights merged at export)
            layer["adapter_layer"] = {
                "norm": ln(p + ".adapter_layer.norm"),
                "linear_1": dense(p + ".adapter_layer.linear_1"),
                "linear_2": dense(p + ".adapter_layer.linear_2"),
            }
        if has(p + ".attention.gru_rel_pos_const"):
            # WavLM gated relative-position-bias parameters (per layer)
            layer["attention"]["gru_rel_pos_const"] = get(
                p + ".attention.gru_rel_pos_const"
            )
            layer["attention"]["gru_rel_pos_linear"] = dense(
                p + ".attention.gru_rel_pos_linear"
            )
        return layer

    def sewd_layer(i):
        # SEW-D DeBERTa layer (sew_d.encoder.encoder.layer.N.*)
        p = f"wav2vec2.encoder.encoder.layer.{i}"
        return {
            "attention": {
                "query_proj": dense(p + ".attention.self.query_proj"),
                "key_proj": dense(p + ".attention.self.key_proj"),
                "value_proj": dense(p + ".attention.self.value_proj"),
                "output_dense": dense(p + ".attention.output.dense"),
                "output_norm": ln(p + ".attention.output.LayerNorm"),
            },
            "intermediate_dense": dense(p + ".intermediate.dense"),
            "output_dense": dense(p + ".output.dense"),
            "output_norm": ln(p + ".output.LayerNorm"),
        }

    def conformer_layer(i):
        p = f"wav2vec2.encoder.layers.{i}"
        self_attn = {
            k: dense(f"{p}.self_attn.{k}")
            for k in ("linear_q", "linear_k", "linear_v", "linear_out")
        }
        if has(p + ".self_attn.linear_pos.weight"):
            # Transformer-XL relative attention extras (linear_pos has no
            # bias; pos_bias_u/v are [num_heads, head_dim] parameters)
            self_attn["linear_pos"] = {
                "kernel": get(p + ".self_attn.linear_pos.weight").T
            }
            self_attn["pos_bias_u"] = get(p + ".self_attn.pos_bias_u")
            self_attn["pos_bias_v"] = get(p + ".self_attn.pos_bias_v")
        cm = f"{p}.conv_module"
        # inference BatchNorm folds to a per-channel affine (torch eps 1e-5)
        gamma = get(cm + ".batch_norm.weight")
        beta = get(cm + ".batch_norm.bias")
        mean = get(cm + ".batch_norm.running_mean")
        var = get(cm + ".batch_norm.running_var")
        scale = gamma / np.sqrt(var + 1e-5)
        return {
            "ffn1_layer_norm": ln(p + ".ffn1_layer_norm"),
            "ffn1": {
                "intermediate_dense": dense(p + ".ffn1.intermediate_dense"),
                "output_dense": dense(p + ".ffn1.output_dense"),
            },
            "self_attn_layer_norm": ln(p + ".self_attn_layer_norm"),
            "self_attn": self_attn,
            "conv_module": {
                "layer_norm": ln(cm + ".layer_norm"),
                # kernel-1 convs fold to [in, out] matmul kernels
                "pointwise_conv1": {"kernel": get(
                    cm + ".pointwise_conv1.weight")[:, :, 0].T},
                "depthwise_conv": {"weight": get(
                    cm + ".depthwise_conv.weight")},
                "batch_norm": {
                    "scale": scale.astype(dtype),
                    "shift": (beta - mean * scale).astype(dtype),
                },
                "pointwise_conv2": {"kernel": get(
                    cm + ".pointwise_conv2.weight")[:, :, 0].T},
            },
            "ffn2_layer_norm": ln(p + ".ffn2_layer_norm"),
            "ffn2": {
                "intermediate_dense": dense(p + ".ffn2.intermediate_dense"),
                "output_dense": dense(p + ".ffn2.output_dense"),
            },
            "final_layer_norm": ln(p + ".final_layer_norm"),
        }

    def conformer_bert_layer(i):
        # w2v-BERT block (Wav2Vec2BertEncoderLayer): conformer shape with a
        # causal depthwise conv + LayerNorm and (optionally) a relative_key
        # distance embedding per layer
        p = f"wav2vec2.encoder.layers.{i}"
        self_attn = {
            k: dense(f"{p}.self_attn.{k}")
            for k in ("linear_q", "linear_k", "linear_v", "linear_out")
        }
        if has(p + ".self_attn.linear_pos.weight"):
            self_attn["linear_pos"] = {
                "kernel": get(p + ".self_attn.linear_pos.weight").T
            }
            self_attn["pos_bias_u"] = get(p + ".self_attn.pos_bias_u")
            self_attn["pos_bias_v"] = get(p + ".self_attn.pos_bias_v")
        if has(p + ".self_attn.distance_embedding.weight"):
            self_attn["distance_embedding"] = get(
                p + ".self_attn.distance_embedding.weight")
        cm = f"{p}.conv_module"
        return {
            "ffn1_layer_norm": ln(p + ".ffn1_layer_norm"),
            "ffn1": {
                "intermediate_dense": dense(p + ".ffn1.intermediate_dense"),
                "output_dense": dense(p + ".ffn1.output_dense"),
            },
            "self_attn_layer_norm": ln(p + ".self_attn_layer_norm"),
            "self_attn": self_attn,
            "conv_module": {
                "layer_norm": ln(cm + ".layer_norm"),
                "pointwise_conv1": {"kernel": get(
                    cm + ".pointwise_conv1.weight")[:, :, 0].T},
                "depthwise_conv": {"weight": get(
                    cm + ".depthwise_conv.weight")},
                "depthwise_layer_norm": ln(cm + ".depthwise_layer_norm"),
                "pointwise_conv2": {"kernel": get(
                    cm + ".pointwise_conv2.weight")[:, :, 0].T},
            },
            "ffn2_layer_norm": ln(p + ".ffn2_layer_norm"),
            "ffn2": {
                "intermediate_dense": dense(p + ".ffn2.intermediate_dense"),
                "output_dense": dense(p + ".ffn2.output_dense"),
            },
            "final_layer_norm": ln(p + ".final_layer_norm"),
        }

    deberta = getattr(cfg, "attention_style", "wav2vec2") == "deberta"
    conformer = getattr(cfg, "encoder_style", "wav2vec2") == "conformer"
    conformer_bert = (
        getattr(cfg, "encoder_style", "wav2vec2") == "conformer_bert"
    )
    if deberta and has("wav2vec2.encoder.encoder.conv.conv.weight"):
        raise RuntimeBackendError(
            "load weights",
            "SEW-D checkpoints with a DeBERTa ConvLayer (conv_kernel_size>0) "
            "are not supported; no released SEW-D speech checkpoint uses one",
        )
    layer_builder = (
        sewd_layer if deberta
        else conformer_layer if conformer
        else conformer_bert_layer if conformer_bert
        else enc_layer
    )
    layers = [layer_builder(i) for i in range(cfg.num_hidden_layers)]
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)

    if getattr(cfg, "encoder_style", "wav2vec2") == "sew":
        # SEW/SEW-D: the post-extractor LayerNorm is a MODEL-level tensor
        # (sew.layer_norm) and the projection is a bare Linear present only
        # when conv_dim[-1] != hidden_size (SEWModel.project_features)
        feature_projection = {"layer_norm": ln("wav2vec2.layer_norm")}
        if cfg.conv_dim[-1] != cfg.hidden_size:
            feature_projection["projection"] = dense(
                "wav2vec2.feature_projection")
    else:
        feature_projection = {
            # gated by CONFIG, not tensor presence: a checkpoint missing a
            # required projection LN must fail loudly (get raises), not
            # silently skip the norm
            **({"layer_norm": ln("wav2vec2.feature_projection.layer_norm")}
               if getattr(cfg, "feat_proj_layer_norm", True) else {}),
            "projection": dense("wav2vec2.feature_projection.projection"),
        }
    tree = {
        **({} if conformer_bert
           else {"feature_extractor": {"conv_layers": conv_layers}}),
        "feature_projection": feature_projection,
        "encoder": {
            # conformer checkpoints carry pos_conv_embed weights that the HF
            # forward never uses (Wav2Vec2ConformerEncoder constructs but
            # does not call it) — dropped here rather than shipped to
            # device; w2v-BERT has none at all
            **({} if pos_conv is None else {"pos_conv_embed": pos_conv}),
            # required for every family except SEW-D (its DeBERTa encoder
            # has no encoder-level LayerNorm) and w2v-BERT (each block ends
            # in its own final LN) — config-gated so a broken checkpoint
            # fails loudly instead of silently skipping the norm
            **({"layer_norm": ln("wav2vec2.encoder.layer_norm")}
               if getattr(cfg, "attention_style", "wav2vec2") != "deberta"
               and not conformer_bert
               else {}),
            "layers": stacked,
            # WavLM: layer 0 owns the shared bucketed bias embedding; it is
            # lifted to the encoder level so the layer stack stays uniform
            # for lax.scan
            **({"rel_attn_embed": get(
                "wav2vec2.encoder.layers.0.attention.rel_attn_embed.weight")}
               if has("wav2vec2.encoder.layers.0.attention.rel_attn_embed.weight")
               else {}),
            # SEW/SEW-D upsampler back to the conv frame rate
            **({"upsample": {"projection": dense(
                "wav2vec2.encoder.upsample.projection")}}
               if has("wav2vec2.encoder.upsample.projection.weight") else {}),
            # SEW-D shared relative-position embedding (+ its LayerNorm when
            # norm_rel_ebd includes layer_norm)
            **({"rel_embeddings": get(
                "wav2vec2.encoder.encoder.rel_embeddings.weight")}
               if deberta else {}),
            **({"rel_embeddings_layer_norm": ln(
                "wav2vec2.encoder.encoder.LayerNorm")}
               if deberta and "layer_norm" in
               getattr(cfg, "norm_rel_ebd", "layer_norm") else {}),
        },
        "lm_head": dense("lm_head"),
    }
    if getattr(cfg, "use_intermediate_ffn_before_adapter", False):
        # w2v-BERT use_intermediate_ffn_before_adapter (relu, half-step) —
        # gated by CONFIG: a checkpoint missing the tensors fails loudly
        tree["intermediate_ffn"] = {
            "intermediate_dense": dense(
                "wav2vec2.intermediate_ffn.intermediate_dense"),
            "output_dense": dense("wav2vec2.intermediate_ffn.output_dense"),
        }
    if getattr(cfg, "add_adapter", False) and not (
        has("wav2vec2.adapter.layers.0.residual_conv.weight")
        or has("wav2vec2.adapter.layers.0.conv.weight")
    ):
        raise RuntimeBackendError(
            "load weights",
            "config has add_adapter=true but the checkpoint carries no "
            "adapter weights (wav2vec2.adapter.layers.*)",
        )
    if has("wav2vec2.adapter.layers.0.residual_conv.weight"):
        # w2v-BERT conformer-style downsampling adapter
        # (Wav2Vec2BertAdapterLayer): strided GLU convs + position-free
        # attention + FFN per layer, stacked on a leading L axis
        adapter = {}
        if has("wav2vec2.adapter.proj.weight"):
            adapter["proj"] = dense("wav2vec2.adapter.proj")
            adapter["proj_layer_norm"] = ln("wav2vec2.adapter.proj_layer_norm")
        a_layers = []
        i = 0
        while has(f"wav2vec2.adapter.layers.{i}.residual_conv.weight"):
            p = f"wav2vec2.adapter.layers.{i}"
            a_layers.append({
                "residual_layer_norm": ln(p + ".residual_layer_norm"),
                "residual_conv": {"weight": get(p + ".residual_conv.weight"),
                                  "bias": get(p + ".residual_conv.bias")},
                "self_attn_layer_norm": ln(p + ".self_attn_layer_norm"),
                "self_attn_conv": {
                    "weight": get(p + ".self_attn_conv.weight"),
                    "bias": get(p + ".self_attn_conv.bias")},
                "self_attn": {
                    k: dense(f"{p}.self_attn.{k}")
                    for k in ("linear_q", "linear_k", "linear_v",
                              "linear_out")
                },
                "ffn_layer_norm": ln(p + ".ffn_layer_norm"),
                "ffn": {
                    "intermediate_dense": dense(
                        p + ".ffn.intermediate_dense"),
                    "output_dense": dense(p + ".ffn.output_dense"),
                },
            })
            i += 1
        adapter["layers"] = jax.tree.map(lambda *xs: np.stack(xs), *a_layers)
        tree["adapter"] = adapter
    elif has("wav2vec2.adapter.layers.0.conv.weight"):
        # add_adapter GLU conv stack (transformers Wav2Vec2Adapter); layers
        # stacked on a leading L axis like the encoder layers
        adapter = {}
        if has("wav2vec2.adapter.proj.weight"):
            adapter["proj"] = dense("wav2vec2.adapter.proj")
            adapter["proj_layer_norm"] = ln("wav2vec2.adapter.proj_layer_norm")
        convs = []
        i = 0
        while has(f"wav2vec2.adapter.layers.{i}.conv.weight"):
            p = f"wav2vec2.adapter.layers.{i}.conv"
            convs.append({"weight": get(p + ".weight"),
                          "bias": get(p + ".bias")})
            i += 1
        adapter["layers"] = jax.tree.map(lambda *xs: np.stack(xs), *convs)
        tree["adapter"] = adapter
    if compute_weights_dtype is not None:
        # cast HOST-side so the single device_put ships the small dtype
        # (casting after upload would transfer f32 and transiently hold
        # both copies in HBM)
        from .quantize import cast_compute_weights_bf16

        assert compute_weights_dtype in ("bfloat16", jnp.bfloat16)
        tree = cast_compute_weights_bf16(tree)
    return jax.device_put(tree)


def load_safetensors_params(
    path: str | Path, cfg: Wav2Vec2ModelConfig, dtype=jnp.float32,
    compute_weights_dtype=None,
) -> dict:
    """Load an HF safetensors checkpoint into the parameter pytree
    (replaces the reference's VarBuilder::from_buffered_safetensors path,
    model_runtime.rs:120-129). compute_weights_dtype="bfloat16" casts the
    compute weights host-side before upload (half the transfer/HBM;
    bit-identical under bf16 compute — models/quantize.py)."""
    from safetensors import safe_open

    tensors = {}
    with safe_open(str(path), framework="numpy") as f:
        for name in f.keys():
            tensors[name] = f.get_tensor(name)
    return params_from_flat_dict(tensors, cfg, dtype=dtype,
                                 compute_weights_dtype=compute_weights_dtype)


def params_from_torch_model(torch_model, cfg: Wav2Vec2ModelConfig, dtype=jnp.float32) -> dict:
    """Convert a transformers Wav2Vec2ForCTC torch module (used in parity
    tests — no pretrained weights exist in this environment)."""
    sd = {k: v.detach().cpu().numpy() for k, v in torch_model.state_dict().items()}
    sd.pop("wav2vec2.masked_spec_embed", None)
    return params_from_flat_dict(sd, cfg, dtype=dtype)


_LAYER_RE = re.compile(r"wav2vec2\.encoder\.layers\.(\d+)\.")
