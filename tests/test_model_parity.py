"""Model forward parity vs HF transformers (torch CPU).

No pretrained weights exist in this environment (zero egress), so parity is
checked with randomly-initialized weights copied from a torch
Wav2Vec2ForCTC into the JAX pytree — logits must match to f32 tolerance.
This replaces the reference's cross-runtime validation (Candle vs ONNX,
SURVEY.md §4) with JAX-vs-torch.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from wav2vec2_tpu.config import Wav2Vec2ModelConfig
from wav2vec2_tpu.models.ctc_model import make_forward_fn, frame_lengths
from wav2vec2_tpu.models.params import params_from_torch_model


def make_cfg(do_stable_layer_norm=False, feat_extract_norm="group"):
    return dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        conv_dim=[16, 16],
        conv_kernel=[10, 3],
        conv_stride=[5, 2],
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        pad_token_id=0,
        vocab_size=12,
        do_stable_layer_norm=do_stable_layer_norm,
        feat_extract_norm=feat_extract_norm,
        conv_bias=feat_extract_norm == "layer",
    )


def build_pair(**kwargs):
    d = make_cfg(**kwargs)
    hf_cfg = transformers.Wav2Vec2Config(
        **d,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    tm = transformers.Wav2Vec2ForCTC(hf_cfg).eval()
    cfg = Wav2Vec2ModelConfig.from_dict(d)
    params = params_from_torch_model(tm, cfg)
    return tm, cfg, params


@pytest.mark.parametrize(
    "stable,norm",
    [(False, "group"), (True, "layer")],
    ids=["base-postnorm-groupnorm", "large-prenorm-layernorm"],
)
def test_logits_match_transformers(stable, norm):
    tm, cfg, params = build_pair(do_stable_layer_norm=stable, feat_extract_norm=norm)
    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 1600)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(audio)).logits.numpy()

    fwd = make_forward_fn(cfg)
    got = np.asarray(fwd(params, audio))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_padded_batch_matches_unpadded():
    """Masked batch execution must equal per-utterance execution on valid
    frames — the batching the reference lacks (SURVEY.md §2.8 DP row)."""
    import jax.numpy as jnp

    tm, cfg, params = build_pair(do_stable_layer_norm=False, feat_extract_norm="group")
    rng = np.random.default_rng(2)
    lens = [1600, 1100, 731]
    n_pad = max(lens)
    audios = [rng.normal(size=(n,)).astype(np.float32) for n in lens]

    batch = np.zeros((len(lens), n_pad), np.float32)
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a

    fwd = make_forward_fn(cfg)
    batched = np.asarray(fwd(params, batch, jnp.asarray(lens)))

    for i, a in enumerate(audios):
        single = np.asarray(fwd(params, a[None, :]))
        t_i = cfg.conv_output_length(lens[i])
        assert t_i == single.shape[1]
        np.testing.assert_allclose(
            batched[i, :t_i], single[0], rtol=2e-4, atol=2e-4,
            err_msg=f"utterance {i} (len {lens[i]})",
        )


def test_frame_lengths_matches_config():
    import jax.numpy as jnp

    cfg = Wav2Vec2ModelConfig.from_dict(make_cfg())
    lens = jnp.asarray([1600, 1100, 731, 10])
    got = np.asarray(frame_lengths(cfg, lens))
    expected = [cfg.conv_output_length(int(n)) for n in [1600, 1100, 731, 10]]
    assert list(got) == expected


@pytest.mark.parametrize(
    "stable,norm,proj_ln",
    [(False, "group", True), (True, "layer", True), (False, "group", False)],
    ids=["hubert-base", "hubert-large", "hubert-no-proj-ln"],
)
def test_hubert_logits_match_transformers(stable, norm, proj_ln):
    """HuBERT family: same CTC graph, `hubert.*` weight prefix, optional
    pre-projection LayerNorm (HubertConfig.feat_proj_layer_norm)."""
    from wav2vec2_tpu.models.params import params_from_flat_dict

    d = make_cfg(do_stable_layer_norm=stable, feat_extract_norm=norm)
    d["feat_proj_layer_norm"] = proj_ln
    hf_cfg = transformers.HubertConfig(
        **d,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    tm = transformers.HubertForCTC(hf_cfg).eval()
    cfg = Wav2Vec2ModelConfig.from_dict(d)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("hubert.masked_spec_embed", None)
    params = params_from_flat_dict(sd, cfg)
    assert ("layer_norm" in params["feature_projection"]) == proj_ln

    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(audio)).logits.numpy()
    fwd = make_forward_fn(cfg)
    got = np.asarray(fwd(params, audio))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_hubert_full_pipeline_alignment():
    """HuBERT checkpoint through the full batch pipeline end to end."""
    from wav2vec2_tpu.models.params import params_from_flat_dict
    from wav2vec2_tpu.parallel.batching import BatchAligner

    d = make_cfg(do_stable_layer_norm=False, feat_extract_norm="group")
    d["vocab_size"] = 8
    hf_cfg = transformers.HubertConfig(
        **d, hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    tm = transformers.HubertForCTC(hf_cfg).eval()
    cfg = Wav2Vec2ModelConfig.from_dict(d)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("hubert.masked_spec_embed", None)
    params = params_from_flat_dict(sd, cfg)

    vocab = {"a": 1, "b": 2, "|": 3, "c": 4}
    aligner = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                           use_pallas=False)
    rng = np.random.default_rng(3)
    audios = [rng.normal(size=3000).astype(np.float32) for _ in range(2)]
    outs = aligner.align_utterances(audios, ["ab ca", "ba"],
                                    audio_multiple=500, token_multiple=16)
    assert [w.word for w in outs[0].words] == ["ab", "ca"]
    assert [w.word for w in outs[1].words] == ["ba"]
    for o in outs:
        for w in o.words:
            assert 0 <= w.start_ms < w.end_ms


def test_data2vec_audio_logits_match_transformers():
    """data2vec-audio: stacked positional convs (non-affine LN + GELU per
    layer) replace wav2vec2's single weight-normed conv; LayerNorm on every
    extractor conv; post-norm encoder."""
    from wav2vec2_tpu.models.params import params_from_flat_dict

    d = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=3,
        num_conv_pos_embedding_groups=4, conv_pos_kernel_size=19,
        pad_token_id=0, vocab_size=12,
    )
    hf_cfg = transformers.Data2VecAudioConfig(
        **d, hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    tm = transformers.Data2VecAudioForCTC(hf_cfg).eval()
    cfg = Wav2Vec2ModelConfig.from_dict(
        {**d, "model_type": "data2vec-audio", "feat_extract_norm": "layer",
         "conv_bias": False}
    )
    assert cfg.pos_conv_style == "data2vec"
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("data2vec_audio.masked_spec_embed", None)
    params = params_from_flat_dict(sd, cfg)
    assert params["encoder"]["pos_conv_embed"]["layers"]["weight"].shape[0] == 3

    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(audio)).logits.numpy()
    fwd = make_forward_fn(cfg)
    got = np.asarray(fwd(params, audio))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_data2vec_padded_batch_matches_unpadded():
    """The pos-conv stack re-zeroes padded frames between layers — without
    that, padded activations leak back into valid frames via conv taps."""
    import jax.numpy as jnp

    from wav2vec2_tpu.models.params import init_params

    cfg = Wav2Vec2ModelConfig.from_dict(dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=3,
        num_conv_pos_embedding_groups=4, conv_pos_kernel_size=19,
        pad_token_id=0, vocab_size=12, model_type="data2vec-audio",
        feat_extract_norm="layer", conv_bias=False,
    ))
    import jax

    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    lens = [1600, 900]
    n_pad = max(lens)
    batch = np.zeros((2, n_pad), np.float32)
    audios = [rng.normal(size=(n,)).astype(np.float32) for n in lens]
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a
    fwd = make_forward_fn(cfg)
    batched = np.asarray(fwd(params, batch, jnp.asarray(lens)))
    for i, a in enumerate(audios):
        single = np.asarray(fwd(params, a[None, :]))
        t_i = cfg.conv_output_length(lens[i])
        np.testing.assert_allclose(
            batched[i, :t_i], single[0], rtol=2e-4, atol=2e-4,
        )


def test_mms_adapter_logits_match_transformers():
    """MMS-style attention adapters (adapter_attn_dim): LN → down → ReLU →
    up, residual at the end of every encoder layer (the per-language
    adapter mechanism of facebook/mms-1b-all)."""
    from wav2vec2_tpu.models.params import params_from_torch_model

    d = make_cfg(do_stable_layer_norm=True, feat_extract_norm="layer")
    hf_cfg = transformers.Wav2Vec2Config(
        **d, adapter_attn_dim=8,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    tm = transformers.Wav2Vec2ForCTC(hf_cfg).eval()
    cfg = Wav2Vec2ModelConfig.from_dict({**d, "adapter_attn_dim": 8})
    params = params_from_torch_model(tm, cfg)
    assert "adapter_layer" in jax_layer_keys(params)

    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(audio)).logits.numpy()
    fwd = make_forward_fn(cfg)
    got = np.asarray(fwd(params, audio))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def jax_layer_keys(params):
    return set(params["encoder"]["layers"].keys())


@pytest.mark.parametrize(
    "stable,norm",
    [(False, "group"), (True, "layer")],
    ids=["wavlm-base", "wavlm-large"],
)
def test_wavlm_logits_match_transformers(stable, norm):
    """WavLM: gated relative-position-bias attention (T5-style buckets;
    layer 0's embedding shared across layers, per-layer query gates)."""
    from wav2vec2_tpu.models.params import params_from_flat_dict

    d = make_cfg(do_stable_layer_norm=stable, feat_extract_norm=norm)
    hf_cfg = transformers.WavLMConfig(
        **d, num_buckets=32, max_bucket_distance=100,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    tm = transformers.WavLMForCTC(hf_cfg).eval()
    cfg = Wav2Vec2ModelConfig.from_dict(
        {**d, "model_type": "wavlm", "num_buckets": 32,
         "max_bucket_distance": 100}
    )
    assert cfg.attention_style == "wavlm"
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("wavlm.masked_spec_embed", None)
    params = params_from_flat_dict(sd, cfg)
    assert "rel_attn_embed" in params["encoder"]
    assert "gru_rel_pos_linear" in params["encoder"]["layers"]["attention"]

    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(audio)).logits.numpy()
    fwd = make_forward_fn(cfg)
    got = np.asarray(fwd(params, audio))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_hubert_batch_norm_pos_conv_matches_transformers():
    """conv_pos_batch_norm=True (mHuBERT-147 style): inference BatchNorm on
    the pos-conv input, folded into a per-channel affine at load time. The
    running stats are randomized so the fold is actually exercised (fresh
    torch BN stats are mean=0/var=1, which a missing fold would also pass)."""
    from wav2vec2_tpu.models.params import params_from_flat_dict

    d = make_cfg(do_stable_layer_norm=False, feat_extract_norm="group")
    hf_cfg = transformers.HubertConfig(
        **d, conv_pos_batch_norm=True,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    tm = transformers.HubertForCTC(hf_cfg).eval()
    bn = tm.hubert.encoder.pos_conv_embed.batch_norm
    with torch.no_grad():
        bn.running_mean.normal_(0.1, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_(1.0, 0.3)
        bn.bias.normal_(0.0, 0.3)
    cfg = Wav2Vec2ModelConfig.from_dict({**d, "conv_pos_batch_norm": True})
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("hubert.masked_spec_embed", None)
    params = params_from_flat_dict(sd, cfg)
    assert "batch_norm" in params["encoder"]["pos_conv_embed"]

    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(audio)).logits.numpy()
    fwd = make_forward_fn(cfg)
    got = np.asarray(fwd(params, audio))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_batch_norm_pos_conv_padded_batch_matches_unpadded():
    """The folded BN shift moves padded positions off zero; they must be
    re-masked before the pos-conv or they leak into valid tail frames."""
    import jax.numpy as jnp

    from wav2vec2_tpu.models.params import init_params
    import jax

    d = make_cfg(do_stable_layer_norm=False, feat_extract_norm="group")
    cfg = Wav2Vec2ModelConfig.from_dict({**d, "conv_pos_batch_norm": True})
    params = init_params(cfg, jax.random.PRNGKey(0))
    # a nonzero shift is what makes this test meaningful
    params["encoder"]["pos_conv_embed"]["batch_norm"]["shift"] = (
        jnp.full((cfg.hidden_size,), 0.37, jnp.float32))

    rng = np.random.default_rng(2)
    lens = [1600, 1100]
    audios = [rng.normal(size=(n,)).astype(np.float32) for n in lens]
    batch = np.zeros((len(lens), max(lens)), np.float32)
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a

    fwd = make_forward_fn(cfg)
    batched = np.asarray(fwd(params, batch, jnp.asarray(lens)))
    for i, a in enumerate(audios):
        single = np.asarray(fwd(params, a[None, :]))
        t_i = cfg.conv_output_length(lens[i])
        np.testing.assert_allclose(
            batched[i, :t_i], single[0], rtol=2e-4, atol=2e-4,
            err_msg=f"utterance {i}",
        )


def test_add_adapter_logits_match_transformers():
    """add_adapter=True: GLU conv stack after the encoder downsamples the
    frame rate by adapter_stride**num_adapter_layers; with
    output_hidden_size != hidden_size the stack is preceded by a
    projection + LayerNorm and the lm_head reads the adapter width."""
    d = make_cfg(do_stable_layer_norm=False, feat_extract_norm="group")
    d.update(add_adapter=True, adapter_kernel_size=3, adapter_stride=2,
             num_adapter_layers=2, output_hidden_size=24)
    hf_cfg = transformers.Wav2Vec2Config(
        **d, hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    tm = transformers.Wav2Vec2ForCTC(hf_cfg).eval()
    cfg = Wav2Vec2ModelConfig.from_dict(d)
    params = params_from_torch_model(tm, cfg)
    assert "adapter" in params and "proj" in params["adapter"]

    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 3200)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(audio)).logits.numpy()
    fwd = make_forward_fn(cfg)
    got = np.asarray(fwd(params, audio))
    assert got.shape == ref.shape
    # the adapter halves T per layer: 3200 samples -> 9 conv frames -> 3
    assert got.shape[1] == cfg.conv_output_length(3200)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_add_adapter_padded_batch_matches_unpadded():
    """Padded frames must be re-zeroed before every adapter conv, or the
    stride-2 taps read junk where the unpadded conv saw zero padding."""
    import jax.numpy as jnp

    d = make_cfg(do_stable_layer_norm=False, feat_extract_norm="group")
    d.update(add_adapter=True, adapter_kernel_size=3, adapter_stride=2,
             num_adapter_layers=2, output_hidden_size=24)
    hf_cfg = transformers.Wav2Vec2Config(
        **d, hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    tm = transformers.Wav2Vec2ForCTC(hf_cfg).eval()
    cfg = Wav2Vec2ModelConfig.from_dict(d)
    params = params_from_torch_model(tm, cfg)

    rng = np.random.default_rng(2)
    lens = [3200, 2100]
    audios = [rng.normal(size=(n,)).astype(np.float32) for n in lens]
    batch = np.zeros((len(lens), max(lens)), np.float32)
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a
    fwd = make_forward_fn(cfg)
    batched = np.asarray(fwd(params, batch, jnp.asarray(lens)))
    for i, a in enumerate(audios):
        single = np.asarray(fwd(params, a[None, :]))
        t_i = cfg.conv_output_length(lens[i])
        assert t_i == single.shape[1]
        np.testing.assert_allclose(
            batched[i, :t_i], single[0], rtol=2e-4, atol=2e-4,
            err_msg=f"utterance {i}",
        )


def test_add_adapter_frame_stride():
    """frame_stride_ms must reflect the adapter's extra downsampling — the
    grouping/report layers convert frames to ms through it."""
    d = make_cfg()
    d.update(add_adapter=True, adapter_stride=2, num_adapter_layers=2)
    cfg = Wav2Vec2ModelConfig.from_dict(d)
    base = Wav2Vec2ModelConfig.from_dict(make_cfg())
    assert cfg.frame_stride_ms(16000) == base.frame_stride_ms(16000) * 4


def _sew_pair(project_features=True, squeeze_factor=2, n=1600):
    from wav2vec2_tpu.models.params import params_from_flat_dict

    d = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64,
        conv_dim=[16, 32 if not project_features else 16],
        conv_kernel=[10, 3], conv_stride=[5, 2],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        squeeze_factor=squeeze_factor, pad_token_id=0, vocab_size=12,
    )
    hf_cfg = transformers.SEWConfig(
        **d, hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, hidden_act="gelu",
        feat_extract_norm="group", conv_bias=False,
    )
    torch.manual_seed(0)
    tm = transformers.SEWForCTC(hf_cfg).eval()
    cfg = Wav2Vec2ModelConfig.from_dict(
        {**d, "model_type": "sew", "feat_extract_norm": "group",
         "conv_bias": False}
    )
    assert cfg.encoder_style == "sew"
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("sew.masked_spec_embed", None)
    params = params_from_flat_dict(sd, cfg)
    return tm, cfg, params


@pytest.mark.parametrize("project", [True, False],
                         ids=["projected", "no-projection"])
def test_sew_logits_match_transformers(project):
    """SEW: squeeze_factor-pooled encoder (strided pos-conv + avg pool),
    model-level post-extractor LayerNorm, optional bare-Linear projection
    (only when conv_dim[-1] != hidden_size), linear upsampler back to the
    conv frame rate with a zero-padded tail."""
    tm, cfg, params = _sew_pair(project_features=project)
    assert ("projection" in params["feature_projection"]) == project
    assert "upsample" in params["encoder"]

    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(audio)).logits.numpy()
    fwd = make_forward_fn(cfg)
    got = np.asarray(fwd(params, audio))
    assert got.shape == ref.shape
    # output is back at the conv frame rate (squeeze/upsample cancel)
    assert got.shape[1] == cfg.conv_output_length(1600)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_sew_padded_batch_matches_unpadded():
    """Pooled-rate attention masks + zeroed upsampled tails must reproduce
    the unpadded forward on every valid frame."""
    import jax.numpy as jnp

    tm, cfg, params = _sew_pair()
    rng = np.random.default_rng(2)
    lens = [1600, 1100, 731]
    audios = [rng.normal(size=(n,)).astype(np.float32) for n in lens]
    batch = np.zeros((len(lens), max(lens)), np.float32)
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a
    fwd = make_forward_fn(cfg)
    batched = np.asarray(fwd(params, batch, jnp.asarray(lens)))
    for i, a in enumerate(audios):
        single = np.asarray(fwd(params, a[None, :]))
        t_i = cfg.conv_output_length(lens[i])
        assert t_i == single.shape[1]
        np.testing.assert_allclose(
            batched[i, :t_i], single[0], rtol=2e-4, atol=2e-4,
            err_msg=f"utterance {i} (len {lens[i]})",
        )


def _sewd_pair():
    from wav2vec2_tpu.models.params import params_from_flat_dict

    d = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 32], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, squeeze_factor=2,
        position_buckets=32, max_position_embeddings=64,
        layer_norm_eps=1e-7, pad_token_id=0, vocab_size=12,
    )
    hf_cfg = transformers.SEWDConfig(
        **d, hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, hidden_act="gelu",
        feat_extract_norm="group", conv_bias=False, share_att_key=True,
    )
    torch.manual_seed(0)
    tm = transformers.SEWDForCTC(hf_cfg).eval()
    cfg = Wav2Vec2ModelConfig.from_dict(
        {**d, "model_type": "sew-d", "feat_extract_norm": "group",
         "conv_bias": False}
    )
    assert cfg.encoder_style == "sew" and cfg.attention_style == "deberta"
    assert cfg.feature_layer_norm_eps == 1e-5  # HF SEWDConfig default
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("sew_d.masked_spec_embed", None)
    params = params_from_flat_dict(sd, cfg)
    return tm, cfg, params


def test_sew_d_logits_match_transformers():
    """SEW-D: SEW's squeeze/upsample plumbing around a DeBERTa-v2 encoder —
    disentangled c2p/p2c attention over a shared LayerNormed log-bucketed
    relative-position embedding (share_att_key), post-norm BERT layers at
    layer_norm_eps=1e-7 while the feature path keeps 1e-5, and no
    encoder-level LayerNorm."""
    tm, cfg, params = _sewd_pair()
    assert "rel_embeddings" in params["encoder"]
    assert "layer_norm" not in params["encoder"]

    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(audio)).logits.numpy()
    fwd = make_forward_fn(cfg)
    got = np.asarray(fwd(params, audio))
    assert got.shape == ref.shape
    assert got.shape[1] == cfg.conv_output_length(1600)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_sew_d_padded_batch_matches_unpadded():
    """DeBERTa attention masks (keys only) + zeroed upsampled tails must
    reproduce the unpadded forward on every valid frame."""
    import jax.numpy as jnp

    tm, cfg, params = _sewd_pair()
    rng = np.random.default_rng(2)
    lens = [1600, 1100]
    audios = [rng.normal(size=(n,)).astype(np.float32) for n in lens]
    batch = np.zeros((len(lens), max(lens)), np.float32)
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a
    fwd = make_forward_fn(cfg)
    batched = np.asarray(fwd(params, batch, jnp.asarray(lens)))
    for i, a in enumerate(audios):
        single = np.asarray(fwd(params, a[None, :]))
        t_i = cfg.conv_output_length(lens[i])
        assert t_i == single.shape[1]
        np.testing.assert_allclose(
            batched[i, :t_i], single[0], rtol=2e-4, atol=2e-4,
            err_msg=f"utterance {i} (len {lens[i]})",
        )


def test_rel_shift_matches_index_oracle():
    """`_rel_shift` (the flatten/slice/reshape skew that replaces the SEW-D
    c2p/p2c advanced-index gathers) must realign diagonals exactly:
    y[..., r, c] == z[..., r, c + (T−1) − r]."""
    import jax.numpy as jnp

    from wav2vec2_tpu.models.encoder import _rel_shift

    rng = np.random.default_rng(7)
    for t in (1, 2, 3, 5, 16):
        z = rng.normal(size=(2, 3, t, 2 * t - 1)).astype(np.float32)
        got = np.asarray(_rel_shift(jnp.asarray(z)))
        ref = np.empty((2, 3, t, t), np.float32)
        for r in range(t):
            for c in range(t):
                ref[..., r, c] = z[..., r, c + (t - 1) - r]
        np.testing.assert_array_equal(got, ref, err_msg=f"T={t}")


def test_sew_d_diagonal_selection_matches_bucket_grid():
    """The per-diagonal bucket indices driving the factorized c2p/p2c terms
    must agree with the [T, T] bucket grid torch gathers with: for every
    (q, k), sel[(T−1) − (q−k) reversed through the shift] == grid[q, k]."""
    from wav2vec2_tpu.models.encoder import _deberta_log_bucket_positions

    t, span, max_pos = 13, 4, 64
    rel = np.arange(t)[:, None] - np.arange(t)[None, :]
    grid = _deberta_log_bucket_positions(rel, span, max_pos)
    diag = _deberta_log_bucket_positions(
        np.arange(t - 1, -t, -1), span, max_pos
    )
    for q in range(t):
        for k in range(t):
            # wide column e holds offset q−k = (t−1) − e; after _rel_shift,
            # (q, k) reads column e = k + (t−1) − q of row q.
            e = k + (t - 1) - q
            assert diag[e] == grid[q, k], (q, k)


def test_factorized_bias_terms_match_gather_oracle_across_t():
    """The factorized SEW-D c2p/p2c and w2v-BERT relative_key position terms
    must equal the direct advanced-index-gather formulation for every T,
    including T=1/2, bucket-identity T, and clip-saturated T."""
    import jax.numpy as jnp

    from wav2vec2_tpu.models.encoder import (
        _deberta_log_bucket_positions,
        _rel_shift,
    )

    rng = np.random.default_rng(11)
    span, max_pos = 4, 32
    left, right = 3, 2
    hd = 8
    for t in (1, 2, 3, 4, 9, 17):
        q = rng.normal(size=(2, 2, t, hd)).astype(np.float32)
        k = rng.normal(size=(2, 2, t, hd)).astype(np.float32)
        pos_k = rng.normal(size=(2, 2 * span, hd)).astype(np.float32)
        dist_emb = rng.normal(size=(left + right + 1, hd)).astype(np.float32)

        rel = np.arange(t)[:, None] - np.arange(t)[None, :]
        grid = _deberta_log_bucket_positions(rel, span, max_pos)
        c2p_idx = np.clip(grid + span, 0, 2 * span - 1)
        p2c_idx = np.clip(-grid + span, 0, 2 * span - 1)
        row = np.arange(t)[:, None]

        # oracle: torch-style gathers
        c2p_pre = np.einsum("bhqd,hsd->bhqs", q, pos_k)
        c2p_ref = c2p_pre[:, :, row, c2p_idx]
        p2c_pre = np.einsum("bhkd,hsd->bhks", k, pos_k)
        p2c_ref = p2c_pre[:, :, row, p2c_idx].swapaxes(-1, -2)
        relkey_ref = np.einsum(
            "bhld,lrd->bhlr", q,
            dist_emb[np.clip(rel * -1, -left, right) + left],
        )

        # factorized: per-diagonal tables + _rel_shift
        diag_bucket = _deberta_log_bucket_positions(
            np.arange(t - 1, -t, -1), span, max_pos
        )
        pos_k_c2p = pos_k[:, np.clip(diag_bucket + span, 0, 2 * span - 1)]
        pos_k_p2c = pos_k[:, np.clip(-diag_bucket + span, 0, 2 * span - 1)]
        c2p_got = np.asarray(_rel_shift(jnp.einsum(
            "bhqd,hed->bhqe", jnp.asarray(q), jnp.asarray(pos_k_c2p))))
        p2c_got = np.asarray(_rel_shift(jnp.einsum(
            "bhkd,hed->bhke", jnp.asarray(k),
            jnp.asarray(pos_k_p2c)))).swapaxes(-1, -2)
        e_diag = dist_emb[np.clip(np.arange(-(t - 1), t), -left, right) + left]
        relkey_got = np.asarray(_rel_shift(jnp.einsum(
            "bhld,ed->bhle", jnp.asarray(q), jnp.asarray(e_diag))))

        np.testing.assert_allclose(c2p_got, c2p_ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"c2p T={t}")
        np.testing.assert_allclose(p2c_got, p2c_ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"p2c T={t}")
        np.testing.assert_allclose(relkey_got, relkey_ref, rtol=1e-5,
                                   atol=1e-5, err_msg=f"relative_key T={t}")


def test_sew_d_layers_forward_edge_t_vs_numpy_oracle():
    """Production `sew_d_layers_forward` at degenerate/clip-saturated T
    (1, 2, 3, 9 with position_buckets=2) against a numpy oracle that uses
    torch's [T, T]-grid advanced-index gathers — guards the factorized
    path's edge geometry, which the single-T HF parity test can't."""
    import math
    import types

    import jax
    import jax.numpy as jnp

    from wav2vec2_tpu.models.encoder import (
        _deberta_log_bucket_positions,
        sew_d_layers_forward,
    )

    rng = np.random.default_rng(3)
    hdim, nh, inter, span, max_pos = 8, 2, 16, 2, 16
    hd = hdim // nh
    eps = 1e-7
    cfg = types.SimpleNamespace(
        hidden_size=hdim, num_attention_heads=nh, position_buckets=span,
        max_position_embeddings=max_pos, layer_norm_eps=eps,
        pos_att_type=("p2c", "c2p"), share_att_key=True,
    )

    def dense(shape):
        return rng.normal(size=shape, scale=0.4).astype(np.float32)

    def lin(i, o):
        return {"kernel": dense((i, o)), "bias": dense((o,))}

    def norm(n):
        return {"weight": dense((n,)) + 1.0, "bias": dense((n,))}

    layer = {
        "attention": {
            "query_proj": lin(hdim, hdim), "key_proj": lin(hdim, hdim),
            "value_proj": lin(hdim, hdim), "output_dense": lin(hdim, hdim),
            "output_norm": norm(hdim),
        },
        "intermediate_dense": lin(hdim, inter),
        "output_dense": lin(inter, hdim),
        "output_norm": norm(hdim),
    }
    params = {
        "rel_embeddings": dense((2 * span, hdim)),
        "layers": jax.tree.map(lambda x: x[None], layer),
    }

    def np_layer_norm(x, w, b):
        mu = x.mean(-1, keepdims=True)
        c = x - mu
        v = (c * c).mean(-1, keepdims=True)
        return c / np.sqrt(v + eps) * w + b

    erf = np.vectorize(math.erf)

    def np_split(y):  # [..., S, hdim] -> [..., nh, S, hd]
        return y.reshape(*y.shape[:-1], nh, hd).swapaxes(-3, -2)

    def oracle(x):
        t = x.shape[1]
        a = layer["attention"]
        scale = (hd * 3) ** 0.5
        qh = np_split(x @ a["query_proj"]["kernel"] + a["query_proj"]["bias"])
        kh = np_split(x @ a["key_proj"]["kernel"] + a["key_proj"]["bias"])
        vh = np_split(x @ a["value_proj"]["kernel"] + a["value_proj"]["bias"])
        scores = np.einsum("bhqd,bhkd->bhqk", qh, kh / np.float32(scale))
        rel = params["rel_embeddings"]
        grid = _deberta_log_bucket_positions(
            np.arange(t)[:, None] - np.arange(t)[None, :], span, max_pos
        )
        c2p_idx = np.clip(grid + span, 0, 2 * span - 1)
        p2c_idx = np.clip(-grid + span, 0, 2 * span - 1)
        row = np.arange(t)[:, None]
        pos_k = np_split(rel @ a["key_proj"]["kernel"] + a["key_proj"]["bias"])
        pos_q = np_split(rel @ a["query_proj"]["kernel"]
                         + a["query_proj"]["bias"])
        c2p = np.einsum("bhqd,hsd->bhqs", qh, pos_k)[:, :, row, c2p_idx]
        scores = scores + c2p / scale
        p2c = np.einsum("bhkd,hsd->bhks", kh, pos_q)[:, :, row, p2c_idx]
        scores = scores + p2c.swapaxes(-1, -2) / scale
        attn = np.exp(scores - scores.max(-1, keepdims=True))
        attn = attn / attn.sum(-1, keepdims=True)
        out = np.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.swapaxes(-3, -2).reshape(x.shape)
        out = out @ a["output_dense"]["kernel"] + a["output_dense"]["bias"]
        x = np_layer_norm(out + x, a["output_norm"]["weight"],
                          a["output_norm"]["bias"])
        up = x @ layer["intermediate_dense"]["kernel"] \
            + layer["intermediate_dense"]["bias"]
        up = 0.5 * up * (1.0 + erf(up / np.sqrt(2.0)))
        down = up @ layer["output_dense"]["kernel"] \
            + layer["output_dense"]["bias"]
        return np_layer_norm(down + x, layer["output_norm"]["weight"],
                             layer["output_norm"]["bias"])

    for t in (1, 2, 3, 9):
        x = rng.normal(size=(2, t, hdim)).astype(np.float32)
        got = np.asarray(sew_d_layers_forward(params, jnp.asarray(x), cfg,
                                              None))
        np.testing.assert_allclose(got, oracle(x), rtol=2e-5, atol=2e-5,
                                   err_msg=f"T={t}")


def _conformer_pair(position_embeddings_type="relative", hidden_act="swish"):
    d = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=12,
    )
    hf_cfg = transformers.Wav2Vec2ConformerConfig(
        **d,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, conformer_conv_dropout=0.0,
        activation_dropout=0.0,
        position_embeddings_type=position_embeddings_type,
        hidden_act=hidden_act, conv_depthwise_kernel_size=7,
        feat_extract_norm="group", conv_bias=False,
        max_source_positions=512,
    )
    torch.manual_seed(0)
    tm = transformers.Wav2Vec2ConformerForCTC(hf_cfg).eval()
    cfg = Wav2Vec2ModelConfig.from_dict(
        {**d, "model_type": "wav2vec2-conformer",
         "position_embeddings_type": position_embeddings_type,
         "hidden_act": hidden_act, "conv_depthwise_kernel_size": 7,
         "feat_extract_norm": "group", "conv_bias": False}
    )
    assert cfg.encoder_style == "conformer"
    params = params_from_torch_model(tm, cfg)
    return tm, cfg, params


@pytest.mark.parametrize("pos,act", [
    ("relative", "swish"), ("rotary", "swish"), (None, "gelu"),
], ids=["rel-pos-swish", "rotary-swish", "no-pos-gelu"])
def test_conformer_logits_match_transformers(pos, act):
    """Wav2Vec2-Conformer: half-step FFNs, rotary/Transformer-XL-relative
    attention, depthwise-conv module with folded inference BatchNorm, final
    per-layer LN + encoder-level LN after the layers. The HF encoder's
    pos_conv_embed exists but is never called in its forward — the loader
    drops those weights (params.py)."""
    tm, cfg, params = _conformer_pair(position_embeddings_type=pos,
                                      hidden_act=act)
    assert "pos_conv_embed" not in params["encoder"]
    if pos == "relative":
        assert "linear_pos" in params["encoder"]["layers"]["self_attn"]
    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(audio)).logits.numpy()
    fwd = make_forward_fn(cfg)
    got = np.asarray(fwd(params, audio))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pos", ["relative", "rotary"])
def test_conformer_padded_batch_matches_unpadded(pos):
    """Attention key masks + the re-zeroing before each depthwise conv must
    reproduce the unpadded forward on valid frames (the conv module is the
    only cross-frame op in the block)."""
    import jax.numpy as jnp

    tm, cfg, params = _conformer_pair(position_embeddings_type=pos)
    rng = np.random.default_rng(2)
    lens = [1600, 1100, 731]
    audios = [rng.normal(size=(n,)).astype(np.float32) for n in lens]
    batch = np.zeros((len(lens), max(lens)), np.float32)
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a
    fwd = make_forward_fn(cfg)
    batched = np.asarray(fwd(params, batch, jnp.asarray(lens)))
    for i, a in enumerate(audios):
        single = np.asarray(fwd(params, a[None, :]))
        t_i = cfg.conv_output_length(lens[i])
        np.testing.assert_allclose(
            batched[i, :t_i], single[0], rtol=2e-4, atol=2e-4,
            err_msg=f"utterance {i} (len {lens[i]})",
        )


@pytest.mark.parametrize("family,cls_name,prefix", [
    ("unispeech", "UniSpeechForCTC", "unispeech"),
    ("unispeech-sat", "UniSpeechSatForCTC", "unispeech_sat"),
])
def test_unispeech_logits_match_transformers(family, cls_name, prefix):
    """UniSpeech / UniSpeech-SAT share wav2vec2's CTC graph exactly
    (transformers modular_unispeech{,_sat}.py inherits every module) — only
    the checkpoint prefix differs. Loaded through the same pipeline."""
    d = make_cfg()
    cfg_cls = {"unispeech": transformers.UniSpeechConfig,
               "unispeech-sat": transformers.UniSpeechSatConfig}[family]
    hf_cfg = cfg_cls(
        **d, hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    tm = getattr(transformers, cls_name)(hf_cfg).eval()
    from wav2vec2_tpu.models.params import params_from_flat_dict

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    assert any(k.startswith(prefix + ".") for k in sd)
    cfg = Wav2Vec2ModelConfig.from_dict({**d, "model_type": family})
    params = params_from_flat_dict(sd, cfg)
    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(audio)).logits.numpy()
    fwd = make_forward_fn(cfg)
    got = np.asarray(fwd(params, audio))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
