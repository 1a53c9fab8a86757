"""Random-weight HF checkpoint dirs for every supported model family.

Builds the exact on-disk layout real exported checkpoints have
(config.json written by transformers itself, model.safetensors, vocab.json)
so BOTH implementations under comparison consume the identical artifact:
the main framework's CLI loads it through its production config/params
path, and the independent torch driver (torch_reference_driver.py) loads
it through transformers' AutoModelForCTC. Geometries mirror the released
checkpoints each preset in wav2vec2_tpu/models/presets.py names; weights
are seeded-random (no pretrained checkpoints exist in this environment —
zero egress — and a cross-IMPLEMENTATION comparison only needs both sides
to read the same weights).
"""

from __future__ import annotations

import json
from pathlib import Path

_CONV_7 = dict(
    conv_dim=[512] * 7,
    conv_kernel=[10, 3, 3, 3, 3, 2, 2],
    conv_stride=[5, 2, 2, 2, 2, 2, 2],
    num_conv_pos_embeddings=128,
    num_conv_pos_embedding_groups=16,
)

_BASE = dict(
    hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
    intermediate_size=3072, do_stable_layer_norm=False,
    feat_extract_norm="group", conv_bias=False, **_CONV_7,
)

_LARGE = dict(
    hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
    intermediate_size=4096, do_stable_layer_norm=True,
    feat_extract_norm="layer", conv_bias=True, **_CONV_7,
)

_SEW_FE = dict(
    conv_dim=[64, 128, 128, 128, 128, 256, 256, 256, 256, 512, 512, 512, 512],
    conv_kernel=[10, 3, 1, 3, 1, 3, 1, 3, 1, 2, 1, 2, 1],
    conv_stride=[5, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1],
    num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
)

# model_type + HF config kwargs per family (geometry of the released
# checkpoint the name points at; see presets.py for citations)
FAMILY_SPECS: dict[str, dict] = {
    "wav2vec2-base-960h": dict(model_type="wav2vec2", **_BASE),
    "wav2vec2-large-960h-lv60": dict(model_type="wav2vec2", **_LARGE),
    "hubert-base-ls960": dict(
        model_type="hubert", feat_proj_layer_norm=True, **_BASE,
    ),
    "mhubert-147": dict(
        model_type="hubert", feat_proj_layer_norm=True,
        conv_pos_batch_norm=True, **_BASE,
    ),
    "data2vec-audio-base-960h": dict(
        model_type="data2vec-audio",
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, conv_dim=[512] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2], conv_stride=[5, 2, 2, 2, 2, 2, 2],
        num_conv_pos_embeddings=19, num_conv_pos_embedding_groups=16,
        conv_pos_kernel_size=19, feat_extract_norm="layer", conv_bias=False,
    ),
    "wavlm-base-plus": dict(model_type="wavlm", **_BASE),
    "sew-base": dict(
        model_type="sew", squeeze_factor=2,
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, feat_extract_norm="group", conv_bias=False,
        **_SEW_FE,
    ),
    "sew-d-base": dict(
        model_type="sew-d", squeeze_factor=2,
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, feat_extract_norm="group", conv_bias=False,
        layer_norm_eps=1e-7, position_buckets=256,
        max_position_embeddings=512, **_SEW_FE,
    ),
    "unispeech-sat-base-100h": dict(model_type="unispeech-sat", **_BASE),
    "unispeech-large": dict(model_type="unispeech", **_LARGE),
    "wav2vec2-large-adapter": dict(
        model_type="wav2vec2", add_adapter=True, adapter_kernel_size=3,
        adapter_stride=2, num_adapter_layers=3, **_LARGE,
    ),
    "mms-1b": dict(
        model_type="wav2vec2", adapter_attn_dim=16,
        hidden_size=1280, num_hidden_layers=48, num_attention_heads=16,
        intermediate_size=5120, do_stable_layer_norm=True,
        feat_extract_norm="layer", conv_bias=True, **_CONV_7,
    ),
    "wav2vec2-conformer-rope-large-960h": dict(
        model_type="wav2vec2-conformer",
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, feat_extract_norm="layer", conv_bias=True,
        position_embeddings_type="rotary", hidden_act="swish",
        conv_depthwise_kernel_size=31, **_CONV_7,
    ),
    "wav2vec2-conformer-rel-pos-large-960h": dict(
        model_type="wav2vec2-conformer",
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, feat_extract_norm="layer", conv_bias=True,
        position_embeddings_type="relative", hidden_act="swish",
        conv_depthwise_kernel_size=31, max_source_positions=5000, **_CONV_7,
    ),
    "w2v-bert-2.0": dict(
        model_type="wav2vec2-bert",
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, position_embeddings_type="relative_key",
        left_max_position_embeddings=64, right_max_position_embeddings=8,
        conv_depthwise_kernel_size=31, hidden_act="swish",
        feature_projection_input_dim=160, add_adapter=True,
        adapter_kernel_size=3, adapter_stride=2, num_adapter_layers=1,
    ),
}


def build_model_dir(family: str, root: Path, seed: int = 0,
                    vocab_size: int = 32,
                    overrides: dict | None = None) -> Path:
    """Materialize `root/model-{family}/` (reusable across runs).
    `overrides` shrink the geometry for fast tests; full-size otherwise."""
    import torch
    import transformers
    from safetensors.numpy import save_file

    spec = dict(FAMILY_SPECS[family])
    if overrides:
        spec.update(overrides)
    model_type = spec.pop("model_type")
    d = Path(root) / f"model-{family}"
    d.mkdir(parents=True, exist_ok=True)
    # the spec fingerprint makes reuse safe across crashes and changed
    # overrides: weights (the slow part) are written before the sentinel
    fingerprint = json.dumps(
        {"spec": spec, "model_type": model_type, "seed": seed,
         "vocab_size": vocab_size},
        sort_keys=True, default=str,
    )
    sentinel = d / "fixture.json"
    if sentinel.exists() and sentinel.read_text() == fingerprint:
        return d

    cfg = transformers.AutoConfig.for_model(
        model_type, pad_token_id=0, vocab_size=vocab_size, **spec
    )
    torch.manual_seed(seed)
    tm = transformers.AutoModelForCTC.from_config(cfg).eval()
    sd = {
        k: v.detach().numpy()
        for k, v in tm.state_dict().items()
        if not k.endswith("masked_spec_embed")
    }
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(cfg.to_json_string())
    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i
    (d / "vocab.json").write_text(json.dumps(vocab))
    sentinel.write_text(fingerprint)
    return d
