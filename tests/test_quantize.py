"""Int8 quantized serving mode (models/quantize.py): numerics of the
quantized linear, encoder output closeness, and end-to-end boundary
agreement with the bf16 path on a tiny model."""

import numpy as np
import jax
import jax.numpy as jnp

from wav2vec2_tpu.config import Wav2Vec2ModelConfig
from wav2vec2_tpu.models.params import init_params
from wav2vec2_tpu.models.ctc_model import wav2vec2_forward
from wav2vec2_tpu.models.quantize import (
    linear_int8,
    quantize_encoder_int8,
    quantize_linear_int8,
)

CFG = Wav2Vec2ModelConfig.from_dict(
    dict(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, conv_dim=[32, 32], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=32,
        do_stable_layer_norm=False, feat_extract_norm="group",
        conv_bias=False,
    )
)


def test_quantize_linear_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.05, size=(64, 128)).astype(np.float32)
    q = quantize_linear_int8({"kernel": jnp.asarray(w), "bias": jnp.zeros(128)})
    assert q["kernel_q"].dtype == jnp.int8
    assert q["scale"].shape == (128,)
    # dequantized weight within half a quantization step per channel
    deq = np.asarray(q["kernel_q"], np.float32) * np.asarray(q["scale"])
    step = np.asarray(q["scale"])
    assert np.all(np.abs(deq - w) <= 0.5 * step + 1e-9)


def test_linear_int8_matches_f32_linear():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, size=(7, 33, 64)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, size=(64, 128)), dtype=jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.01, size=(128,)), dtype=jnp.float32)
    q = quantize_linear_int8({"kernel": w, "bias": b})
    y_q = linear_int8(x, q["kernel_q"], q["scale"], q["bias"])
    y_f = x @ w + b
    # int8 dynamic quant keeps ~1% relative error at these scales
    err = float(jnp.max(jnp.abs(y_q - y_f)))
    ref = float(jnp.max(jnp.abs(y_f)))
    assert err <= 0.03 * ref, (err, ref)


def test_quantized_stacked_layers_shapes():
    params = init_params(CFG, jax.random.PRNGKey(0))
    qp = quantize_encoder_int8(params)
    lq = qp["encoder"]["layers"]["attention"]["q_proj"]
    assert lq["kernel_q"].shape == (3, 64, 64) and lq["kernel_q"].dtype == jnp.int8
    assert lq["scale"].shape == (3, 64)
    # originals untouched
    assert "kernel" in params["encoder"]["layers"]["attention"]["q_proj"]
    # non-projection params alias the originals
    assert qp["feature_extractor"] is params["feature_extractor"]


def test_int8_forward_close_and_boundaries_agree():
    from wav2vec2_tpu.parallel.batching import BatchAligner

    vocab = {"|": 4}
    for i, c in enumerate("ETAONIHSRDLUMWCFGYPBVKXJQZ"):
        vocab[c] = 5 + i

    params = init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    audio = rng.normal(0, 1, size=(2, 8000)).astype(np.float32)

    lp_bf = np.asarray(
        wav2vec2_forward(params, jnp.asarray(audio), CFG,
                         compute_dtype=jnp.bfloat16)
    )
    qp = quantize_encoder_int8(params)
    lp_q = np.asarray(
        wav2vec2_forward(qp, jnp.asarray(audio), CFG,
                         compute_dtype=jnp.bfloat16)
    )
    assert lp_q.shape == lp_bf.shape
    # logits stay close in absolute terms (random-init scale)
    assert float(np.max(np.abs(lp_q - lp_bf))) < 0.25 * float(
        np.max(np.abs(lp_bf))
    ) + 0.1

    # end-to-end: word boundaries agree within one frame vs bf16
    transcripts = ["HELLO WORLD", "THE CAT"]
    audios = [audio[0], audio[1]]
    base = BatchAligner(CFG, params, vocab, compute_dtype="bfloat16")
    quant = BatchAligner(CFG, params, vocab, compute_dtype="bfloat16",
                         quantize_int8=True)
    out_base = base.align_utterances(audios, transcripts)
    out_q = quant.align_utterances(audios, transcripts)
    stride = CFG.frame_stride_ms(16000)
    for ob, oq in zip(out_base, out_q):
        assert [w.word for w in ob.words] == [w.word for w in oq.words]
        for wb, wq in zip(ob.words, oq.words):
            assert abs(wb.start_ms - wq.start_ms) <= stride
            assert abs(wb.end_ms - wq.end_ms) <= stride


def test_bf16_weight_storage_bit_identical(setup_aligners=None):
    """bf16 weight STORAGE under bf16 compute must be bit-identical to f32
    storage (every consumption site casts to the compute dtype anyway)."""
    import jax

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.ctc_model import _freeze_cfg, wav2vec2_forward
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.models.quantize import cast_compute_weights_bf16
    import jax.numpy as jnp

    # cover the feature-richest variant: wavlm attention + adapters
    cfg = _freeze_cfg(Wav2Vec2ModelConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
        attention_style="wavlm", num_buckets=16, max_bucket_distance=50,
        adapter_attn_dim=4,
    ))
    params = init_params(cfg, jax.random.PRNGKey(0))
    cast = cast_compute_weights_bf16(params)
    # norms / f32-consumed leaves untouched
    assert cast["encoder"]["layer_norm"]["weight"].dtype == jnp.float32
    assert cast["encoder"]["rel_attn_embed"].dtype == jnp.float32
    assert cast["encoder"]["layers"]["attention"]["gru_rel_pos_const"].dtype == jnp.float32
    assert cast["encoder"]["layers"]["attention"]["q_proj"]["kernel"].dtype == jnp.bfloat16
    assert cast["lm_head"]["kernel"].dtype == jnp.bfloat16

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(2, 4000)).astype(np.float32)
    lens = jnp.asarray([4000, 3200], jnp.int32)
    a = wav2vec2_forward(params, jnp.asarray(audio), cfg, audio_lens=lens,
                         compute_dtype=jnp.bfloat16)
    b = wav2vec2_forward(cast, jnp.asarray(audio), cfg, audio_lens=lens,
                         compute_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_weight_storage_bit_identical_new_families():
    """Same bit-identity contract for the round-3 families' f32-consumed
    params: SEW-D's rel_embeddings (+ its LN) and per-layer output_norm,
    the conformer/w2v-BERT depthwise_layer_norm, the BERT adapter's
    residual/ffn LNs, and the folded BN pos-conv affine."""
    import jax
    import jax.numpy as jnp

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.ctc_model import _freeze_cfg, wav2vec2_forward
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.models.quantize import cast_compute_weights_bf16

    rng = np.random.default_rng(0)

    sewd = _freeze_cfg(Wav2Vec2ModelConfig.from_dict(dict(
        model_type="sew-d", hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, conv_dim=[16] * 13,
        conv_kernel=[10, 3, 1, 3, 1, 3, 1, 3, 1, 2, 1, 2, 1],
        conv_stride=[5, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        pad_token_id=0, vocab_size=8, feat_extract_norm="group",
        conv_bias=False, squeeze_factor=2, position_buckets=16,
        max_position_embeddings=64,
    )))
    bert = _freeze_cfg(Wav2Vec2ModelConfig.from_dict(dict(
        model_type="wav2vec2-bert", hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, pad_token_id=0,
        vocab_size=8, position_embeddings_type="relative_key",
        left_max_position_embeddings=8, right_max_position_embeddings=2,
        conv_depthwise_kernel_size=7, hidden_act="swish",
        add_adapter=True, num_adapter_layers=1,
    )))
    mhubert = _freeze_cfg(Wav2Vec2ModelConfig.from_dict(dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
        conv_pos_batch_norm=True,
    )))

    for cfg in (sewd, bert, mhubert):
        params = init_params(cfg, jax.random.PRNGKey(0))
        cast = cast_compute_weights_bf16(params)
        enc = cast["encoder"]
        if "rel_embeddings" in enc:
            assert enc["rel_embeddings"].dtype == jnp.float32
            assert enc["rel_embeddings_layer_norm"]["weight"].dtype == jnp.float32
            assert enc["layers"]["output_norm"]["weight"].dtype == jnp.float32
        if "conv_module" in enc.get("layers", {}):
            assert (enc["layers"]["conv_module"]["depthwise_layer_norm"]
                    ["weight"].dtype == jnp.float32)
        if "batch_norm" in enc.get("pos_conv_embed", {}):
            assert (enc["pos_conv_embed"]["batch_norm"]["scale"].dtype
                    == jnp.float32)
        if "adapter" in cast:
            layer = cast["adapter"]["layers"]
            assert layer["residual_layer_norm"]["weight"].dtype == jnp.float32
            assert layer["ffn_layer_norm"]["weight"].dtype == jnp.float32

        audio = rng.normal(size=(2, 4000)).astype(np.float32)
        lens = jnp.asarray([4000, 3200], jnp.int32)
        a = wav2vec2_forward(params, jnp.asarray(audio), cfg,
                             audio_lens=lens, compute_dtype=jnp.bfloat16)
        b = wav2vec2_forward(cast, jnp.asarray(audio), cfg,
                             audio_lens=lens, compute_dtype=jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
