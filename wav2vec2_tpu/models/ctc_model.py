"""Wav2Vec2ForCTC: the full acoustic model graph.

Pipeline (reference: /root/reference/src/model/ctc_model.rs:9-33):
audio [B, N] → feature extractor (conv stack, [B, C, T]) → transpose →
feature projection ([B, T, H]) → encoder → lm_head (Linear H → V) →
logits [B, T, V].

The single jitted forward replaces BOTH reference runtimes (Candle and ONNX
Runtime — SURVEY.md §7: they collapse into one XLA graph). Compute dtype is
a parameter: float32 for bit-parity testing, bfloat16 for TPU throughput
(norms/softmax/log-softmax stay f32 inside the layer implementations).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import Wav2Vec2ModelConfig
from .encoder import (
    adapter_forward,
    bert_adapter_forward,
    conformer_bert_encoder_forward,
    conformer_encoder_forward,
    encoder_forward,
    sew_encoder_forward,
)
from .feature_extractor import feature_extractor_forward, feature_projection_forward
from .layers import linear


def wav2vec2_forward(
    params: dict,
    audio: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    audio_lens: jnp.ndarray | None = None,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """audio: [B, N] normalized waveform → logits [B, T, V] (float32).

    `audio_lens` [B] enables padding-exact batch execution: masked GroupNorm
    statistics, zeroed padded frames, masked attention keys.

    f32 compute runs with matmul precision HIGHEST (XLA's DEFAULT f32
    conv/matmul uses reduced-precision passes that cost ~1e-2 logit error);
    bf16 compute uses DEFAULT — bf16 inputs are MXU-native.
    """
    precision = "highest" if compute_dtype == jnp.float32 else "default"
    with jax.default_matmul_precision(precision):
        x = audio.astype(compute_dtype)
        if getattr(cfg, "frontend_style", "conv") == "mel":
            # w2v-BERT: log-mel frontend (models/mel.py) → LN+projection
            from .mel import mel_frontend

            feats, _ = mel_frontend(x, cfg, audio_lens=audio_lens)
            hidden = feature_projection_forward(
                params["feature_projection"], feats.astype(compute_dtype), cfg
            )
        else:
            feats = feature_extractor_forward(
                params["feature_extractor"], x, cfg, audio_lens=audio_lens
            )
            hidden = feature_projection_forward(
                params["feature_projection"], feats.transpose(0, 2, 1), cfg
            )

        frame_mask = None
        conv_lens = None
        if audio_lens is not None:
            t = hidden.shape[1]
            conv_lens = conv_frame_lengths(cfg, audio_lens)
            frame_mask = jnp.arange(t)[None, :] < conv_lens[:, None]

        style = getattr(cfg, "encoder_style", "wav2vec2")
        if style == "sew":
            hidden = sew_encoder_forward(
                params["encoder"], hidden, cfg, frame_mask=frame_mask
            )
        elif style == "conformer":
            hidden = conformer_encoder_forward(
                params["encoder"], hidden, cfg, frame_mask=frame_mask
            )
        elif style == "conformer_bert":
            hidden = conformer_bert_encoder_forward(
                params["encoder"], hidden, cfg, frame_mask=frame_mask
            )
        else:
            hidden = encoder_forward(
                params["encoder"], hidden, cfg, frame_mask=frame_mask
            )
        if "intermediate_ffn" in params:
            # w2v-BERT use_intermediate_ffn_before_adapter (relu, half-step)
            p = params["intermediate_ffn"]
            up = jnp.maximum(
                linear(hidden, p["intermediate_dense"]["kernel"],
                       p["intermediate_dense"]["bias"]), 0)
            hidden = hidden + 0.5 * linear(
                up, p["output_dense"]["kernel"], p["output_dense"]["bias"])
        if cfg.add_adapter:
            if style == "conformer_bert":
                hidden, _ = bert_adapter_forward(
                    params["adapter"], hidden, cfg, frame_lens=conv_lens
                )
            else:
                hidden = adapter_forward(
                    params["adapter"], hidden, cfg, frame_lens=conv_lens
                )
        logits = linear(hidden, params["lm_head"]["kernel"], params["lm_head"]["bias"])
        return logits.astype(jnp.float32)


def conv_frame_lengths(
    cfg: Wav2Vec2ModelConfig, audio_lens: jnp.ndarray
) -> jnp.ndarray:
    """Feature-extractor output lengths (pre-adapter) — the rate the encoder
    runs at, used for its frame mask."""
    if getattr(cfg, "frontend_style", "conv") == "mel":
        return jnp.maximum(1 + (audio_lens - 400) // 160, 0) // 2
    lens = audio_lens
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        lens = (lens - k) // s + 1
    return jnp.maximum(lens, 0)


def frame_lengths(cfg: Wav2Vec2ModelConfig, audio_lens: jnp.ndarray) -> jnp.ndarray:
    """Vector version of Wav2Vec2ModelConfig.conv_output_length: the MODEL
    output frame count (includes the add_adapter downsampling)."""
    lens = conv_frame_lengths(cfg, audio_lens)
    if getattr(cfg, "add_adapter", False):
        for _ in range(cfg.num_adapter_layers):
            if getattr(cfg, "frontend_style", "conv") == "mel":
                # w2v-BERT adapter convs: pad stride//2, kernel
                # adapter_kernel_size (Wav2Vec2BertAdapter sub-sample rule)
                lens = (
                    lens + 2 * (cfg.adapter_stride // 2)
                    - cfg.adapter_kernel_size
                ) // cfg.adapter_stride + 1
            else:
                lens = (lens - 1) // cfg.adapter_stride + 1
    return lens


def log_softmax_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """Max-shifted log-softmax over the vocab axis in float32 — the "post"
    stage of the reference (model_runtime.rs:137: candle log_softmax;
    model_runtime.rs:640-655: host row-wise max-shift version)."""
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"))
def _forward_jit(params, audio, cfg, audio_lens, compute_dtype):
    return wav2vec2_forward(
        params, audio, cfg, audio_lens=audio_lens, compute_dtype=compute_dtype
    )


def make_forward_fn(cfg: Wav2Vec2ModelConfig, compute_dtype=jnp.float32):
    """Returns a jitted forward(params, audio, audio_lens) → logits.

    `cfg` must be hashable for the jit cache — dataclass instances are used
    as static args via their id-stable tuple form."""
    frozen = _freeze_cfg(cfg)

    def fn(params, audio, audio_lens=None):
        return _forward_jit(params, audio, frozen, audio_lens, compute_dtype)

    return fn


class _FrozenCfg:
    """Hashable, immutable view of Wav2Vec2ModelConfig for jit static args.

    `flash_spmd` (an optional `jax.sharding.AbstractMesh`) rides along as a
    serving-time static: under a device mesh the encoder's fused-attention
    launch must run inside `jax.shard_map` (ops/flash_attention.py SPMD
    note), and the mesh is part of the compiled program's identity, so it
    belongs in the jit key — but NOT in the serializable model config."""

    __slots__ = ("_cfg", "_key", "flash_spmd")

    def __init__(self, cfg: Wav2Vec2ModelConfig, flash_spmd=None):
        object.__setattr__(self, "_cfg", cfg)
        object.__setattr__(self, "flash_spmd", flash_spmd)
        object.__setattr__(
            self,
            "_key",
            (
                cfg.hidden_size, cfg.num_hidden_layers, cfg.num_attention_heads,
                cfg.intermediate_size, tuple(cfg.conv_dim), tuple(cfg.conv_kernel),
                tuple(cfg.conv_stride), cfg.num_conv_pos_embeddings,
                cfg.num_conv_pos_embedding_groups, cfg.do_stable_layer_norm,
                cfg.layer_norm_eps, cfg.pad_token_id, cfg.vocab_size,
                cfg.feat_extract_norm, cfg.conv_bias,
                getattr(cfg, "feat_proj_layer_norm", True),
                getattr(cfg, "pos_conv_style", "wav2vec2"),
                getattr(cfg, "conv_pos_kernel_size", 19),
                getattr(cfg, "adapter_attn_dim", None),
                getattr(cfg, "attention_style", "wav2vec2"),
                getattr(cfg, "num_buckets", 320),
                getattr(cfg, "max_bucket_distance", 800),
                getattr(cfg, "conv_pos_batch_norm", False),
                getattr(cfg, "add_adapter", False),
                getattr(cfg, "adapter_kernel_size", 3),
                getattr(cfg, "adapter_stride", 2),
                getattr(cfg, "num_adapter_layers", 3),
                getattr(cfg, "output_hidden_size", None),
                getattr(cfg, "encoder_style", "wav2vec2"),
                getattr(cfg, "squeeze_factor", 1),
                getattr(cfg, "feature_layer_norm_eps", None),
                getattr(cfg, "position_buckets", 256),
                getattr(cfg, "max_position_embeddings", 512),
                getattr(cfg, "share_att_key", True),
                tuple(getattr(cfg, "pos_att_type", ("p2c", "c2p"))),
                getattr(cfg, "norm_rel_ebd", "layer_norm"),
                getattr(cfg, "position_embeddings_type", "relative"),
                getattr(cfg, "rotary_embedding_base", 10000),
                getattr(cfg, "conv_depthwise_kernel_size", 31),
                getattr(cfg, "hidden_act", "gelu"),
                getattr(cfg, "frontend_style", "conv"),
                getattr(cfg, "feature_projection_input_dim", 160),
                getattr(cfg, "left_max_position_embeddings", 64),
                getattr(cfg, "right_max_position_embeddings", 8),
                getattr(cfg, "use_intermediate_ffn_before_adapter", False),
                getattr(cfg, "adapter_act", "relu"),
                getattr(cfg, "use_flash_attention", False),
                flash_spmd,
            ),
        )

    def __getattr__(self, name):
        return getattr(self._cfg, name)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _FrozenCfg) and self._key == other._key


def _freeze_cfg(cfg: Wav2Vec2ModelConfig, flash_spmd=None) -> _FrozenCfg:
    if isinstance(cfg, _FrozenCfg):
        if cfg.flash_spmd is flash_spmd or flash_spmd is None:
            return cfg
        return _FrozenCfg(cfg._cfg, flash_spmd=flash_spmd)
    return _FrozenCfg(cfg, flash_spmd=flash_spmd)
