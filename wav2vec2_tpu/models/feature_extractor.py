"""wav2vec2 conv feature extractor + feature projection.

Behavioral parity with /root/reference/src/model/feature_extractor.rs:7-140
and feature_projection.rs:7-24, following HF transformers semantics:

- stack of `len(conv_dim)` Conv1d layers (in_c = 1 for layer 0), per-layer
  kernel/stride from config, optional bias, VALID padding;
- `feat_extract_norm == "layer"`: LayerNorm over channels at every layer
  (transpose → LN → transpose);
- `feat_extract_norm == "group"`: GroupNorm(groups = channels) on layer 0
  only — here with masked statistics so batches match unpadded runs;
- erf-GELU after every conv;
- projection: LayerNorm(conv_dim[-1]) → Linear(conv_dim[-1] → hidden).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import Wav2Vec2ModelConfig
from .layers import feature_conv1d, gelu, group_norm_1d, layer_norm, linear


def feature_extractor_forward(
    params: dict,
    audio: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    audio_lens: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """audio: [B, N] → features [B, C_last, T].

    `audio_lens` [B] enables masked GroupNorm statistics so padded batch
    outputs equal per-utterance outputs on the valid frames.
    """
    x = audio[:, None, :]  # [B, 1, N]
    lens = audio_lens
    # SEW-D keeps 1e-5 norms in the feature path while its encoder runs at
    # 1e-7 (SEWDConfig.feature_layer_norm_eps); every other family has one
    # epsilon for both
    eps = getattr(cfg, "feature_layer_norm_eps", None) or cfg.layer_norm_eps
    for i, (out_c, k, s) in enumerate(
        zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
    ):
        layer = params["conv_layers"][i]
        x = feature_conv1d(x, layer["conv"]["weight"], layer["conv"].get("bias"), stride=s)
        if lens is not None:
            lens = (lens - k) // s + 1
            t = x.shape[2]
            frame_idx = jnp.arange(t)[None, :]
            time_mask = frame_idx < lens[:, None]
        else:
            time_mask = None

        if cfg.feat_extract_norm == "layer":
            ln = layer["layer_norm"]
            x = layer_norm(
                x.transpose(0, 2, 1), ln["weight"], ln["bias"], eps
            ).transpose(0, 2, 1)
        elif cfg.feat_extract_norm == "group" and i == 0:
            gn = layer["layer_norm"]
            x = group_norm_1d(
                x, gn["weight"], gn["bias"],
                num_groups=out_c, eps=eps, time_mask=time_mask,
            )
        x = gelu(x)
    return x


def feature_projection_forward(
    params: dict, features: jnp.ndarray, cfg: Wav2Vec2ModelConfig
) -> jnp.ndarray:
    """features [B, T, C_last] → hidden [B, T, H]. The pre-projection
    LayerNorm is skipped for HuBERT configs with feat_proj_layer_norm=false
    (transformers HubertFeatureProjection parity); SEW/SEW-D instead skip
    the PROJECTION when conv_dim[-1] == hidden_size (SEWModel
    project_features) and norm with feature_layer_norm_eps."""
    x = features
    eps = getattr(cfg, "feature_layer_norm_eps", None) or cfg.layer_norm_eps
    if "layer_norm" in params:
        ln = params["layer_norm"]
        x = layer_norm(x, ln["weight"], ln["bias"], eps)
    if "projection" in params:
        x = linear(x, params["projection"]["kernel"], params["projection"]["bias"])
    return x
