"""Checkpoint round-trips: orbax pytree save/restore and safetensors
export/import inverse."""

import numpy as np
import pytest

from wav2vec2_tpu.config import Wav2Vec2ModelConfig


@pytest.fixture(scope="module")
def tiny():
    import jax

    from wav2vec2_tpu.models.params import init_params

    cfg = Wav2Vec2ModelConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    return cfg, init_params(cfg, jax.random.PRNGKey(0))


def assert_trees_equal(a, b):
    import jax

    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        key = None
        import jax.tree_util as jtu

        key = jtu.keystr(path)
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[key]), atol=1e-6, err_msg=key
        )


def test_orbax_roundtrip(tiny, tmp_path):
    from wav2vec2_tpu.utils.checkpoint import restore_params, save_params

    cfg, params = tiny
    save_params(tmp_path / "ckpt", params)
    restored = restore_params(tmp_path / "ckpt", like=params)
    assert_trees_equal(params, restored)


def test_safetensors_export_import_inverse(tiny, tmp_path):
    """params → HF flat dict → params must be the identity (and the HF
    naming must be loadable by params_from_flat_dict)."""
    from wav2vec2_tpu.models.params import params_from_flat_dict
    from wav2vec2_tpu.utils.checkpoint import params_to_hf_flat_dict

    cfg, params = tiny
    flat = params_to_hf_flat_dict(params, cfg)
    assert "wav2vec2.encoder.layers.0.attention.q_proj.weight" in flat
    assert "lm_head.weight" in flat
    reloaded = params_from_flat_dict(flat, cfg)
    assert_trees_equal(params, reloaded)


def test_safetensors_file_roundtrip(tiny, tmp_path):
    from wav2vec2_tpu.models.params import load_safetensors_params
    from wav2vec2_tpu.utils.checkpoint import save_safetensors

    cfg, params = tiny
    path = tmp_path / "model.safetensors"
    save_safetensors(path, params, cfg)
    reloaded = load_safetensors_params(path, cfg)
    assert_trees_equal(params, reloaded)


@pytest.mark.parametrize(
    "family", ["wavlm_adapter", "data2vec", "hubert_no_ln", "hubert_bn_pos",
               "conv_adapter", "conformer_rel", "conformer_rotary",
               "w2v_bert"])
def test_safetensors_roundtrip_new_families(tmp_path, family):
    """params_to_hf_flat_dict must invert params_from_flat_dict for every
    model family (WavLM gates/bias embed, MMS adapters, data2vec pos-conv
    stack, HuBERT without projection LN) — a dropped tensor would reload
    silently as a plain wav2vec2 graph."""
    import jax
    import numpy as np

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params, load_safetensors_params
    from wav2vec2_tpu.utils.checkpoint import save_safetensors

    base = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=4,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    if family == "wavlm_adapter":
        base.update(attention_style="wavlm", num_buckets=16,
                    max_bucket_distance=50, adapter_attn_dim=4)
    elif family == "data2vec":
        base.update(pos_conv_style="data2vec", conv_pos_kernel_size=19,
                    feat_extract_norm="layer")
    elif family == "hubert_bn_pos":
        base.update(conv_pos_batch_norm=True)
    elif family == "conv_adapter":
        base.update(add_adapter=True, adapter_kernel_size=3,
                    adapter_stride=2, num_adapter_layers=2,
                    output_hidden_size=24)
    elif family in ("conformer_rel", "conformer_rotary"):
        base.update(model_type="wav2vec2-conformer",
                    position_embeddings_type=family.split("_")[1].replace(
                        "rel", "relative"),
                    hidden_act="swish", conv_depthwise_kernel_size=7)
    elif family == "w2v_bert":
        base.update(model_type="wav2vec2-bert",
                    position_embeddings_type="relative_key",
                    left_max_position_embeddings=8,
                    right_max_position_embeddings=2,
                    hidden_act="swish", conv_depthwise_kernel_size=7,
                    add_adapter=True, adapter_kernel_size=3,
                    adapter_stride=2, num_adapter_layers=1,
                    output_hidden_size=24,
                    use_intermediate_ffn_before_adapter=True)
    else:
        base.update(feat_proj_layer_norm=False)
    cfg = Wav2Vec2ModelConfig.from_dict(base)
    params = init_params(cfg, jax.random.PRNGKey(0))
    p = tmp_path / "model.safetensors"
    save_safetensors(p, params, cfg)
    back = load_safetensors_params(p, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        key = jax.tree_util.keystr(k)
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_b[key]),
                                   rtol=1e-6, atol=1e-6, err_msg=key)

    # transformers' per-family ForCTC classes expect their own top-level
    # prefix (wavlm./data2vec_audio./hubert.), not wav2vec2.*
    from wav2vec2_tpu.utils.checkpoint import params_to_hf_flat_dict

    expected = {"wavlm_adapter": "wavlm.", "data2vec": "data2vec_audio.",
                "hubert_no_ln": "wav2vec2.",
                "hubert_bn_pos": "wav2vec2.",
                "conv_adapter": "wav2vec2.",
                "conformer_rel": "wav2vec2_conformer.",
                "conformer_rotary": "wav2vec2_conformer.",
                "w2v_bert": "wav2vec2_bert."}[family]
    flat = params_to_hf_flat_dict(params, cfg)
    assert all(k.startswith((expected, "lm_head.")) for k in flat), sorted(flat)[:3]
    assert any(k.startswith(expected) for k in flat)


def test_hf_prefix_family_override(tiny):
    """HuBERT shares wav2vec2's graph, so its prefix needs the explicit
    family= override; unknown families are rejected."""
    from wav2vec2_tpu.utils.checkpoint import (
        hf_weight_prefix,
        params_to_hf_flat_dict,
    )

    cfg, params = tiny
    assert hf_weight_prefix(cfg) == "wav2vec2"
    flat = params_to_hf_flat_dict(params, cfg, family="hubert")
    assert all(k.startswith(("hubert.", "lm_head.")) for k in flat)
    assert hf_weight_prefix(cfg, family="sew-d") == "sew_d"
    with pytest.raises(ValueError, match="unknown model family"):
        hf_weight_prefix(cfg, family="whisper")


def test_conformer_export_loads_into_transformers():
    """The conformer export must load into transformers'
    Wav2Vec2ConformerForCTC (BatchNorm re-expanded to running stats,
    pointwise matmul kernels back to [out, in, 1] conv weights) and produce
    the same logits — the only acceptable missing keys are the encoder's
    pos_conv_embed, which the HF forward never uses."""
    import jax
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.ctc_model import make_forward_fn
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.utils.checkpoint import params_to_hf_flat_dict

    d = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=4,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    cfg = Wav2Vec2ModelConfig.from_dict(
        {**d, "model_type": "wav2vec2-conformer",
         "position_embeddings_type": "relative", "hidden_act": "swish",
         "conv_depthwise_kernel_size": 7})
    params = init_params(cfg, jax.random.PRNGKey(0))
    flat = {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in params_to_hf_flat_dict(params, cfg).items()}

    hf_cfg = transformers.Wav2Vec2ConformerConfig(
        **d, hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, conformer_conv_dropout=0.0,
        activation_dropout=0.0, position_embeddings_type="relative",
        hidden_act="swish", conv_depthwise_kernel_size=7,
        max_source_positions=512,
    )
    tm = transformers.Wav2Vec2ConformerForCTC(hf_cfg).eval()
    missing, unexpected = tm.load_state_dict(flat, strict=False)
    assert not unexpected, unexpected
    allowed = {"wav2vec2_conformer.masked_spec_embed"}
    assert all(
        m in allowed or ".pos_conv_embed." in m for m in missing
    ), missing

    rng = np.random.default_rng(3)
    audio = rng.normal(size=(1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(audio)).logits.numpy()
    got = np.asarray(make_forward_fn(cfg)(params, audio))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
