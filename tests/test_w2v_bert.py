"""Wav2Vec2-BERT (w2v-BERT 2.0) parity: mel frontend vs
SeamlessM4TFeatureExtractor, end-to-end logits vs transformers
Wav2Vec2BertForCTC (raw waveform in on our side, HF extractor + model on
the other), padded-batch exactness, and the downsampling adapter."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from wav2vec2_tpu.config import Wav2Vec2ModelConfig
from wav2vec2_tpu.models.ctc_model import frame_lengths, make_forward_fn
from wav2vec2_tpu.models.params import params_from_flat_dict

# T_mel = 1 + (N-400)//160 = 102 (even: no HF multiple-of-2 pad frame)
N_SAMPLES = 400 + 160 * 101


def test_mel_frontend_matches_seamless_extractor():
    from transformers import SeamlessM4TFeatureExtractor

    from wav2vec2_tpu.models.mel import kaldi_mel_filter_bank, mel_frontend

    fe = SeamlessM4TFeatureExtractor()
    np.testing.assert_allclose(kaldi_mel_filter_bank(), fe.mel_filters,
                               rtol=1e-10, atol=1e-12)

    rng = np.random.default_rng(0)
    audio = (rng.normal(size=N_SAMPLES) * 0.1).astype(np.float32)
    ref = fe([audio], sampling_rate=16000, return_tensors="np",
             padding=True)["input_features"][0]
    cfg = Wav2Vec2ModelConfig.from_dict(_cfg_dict())
    got = np.asarray(mel_frontend(audio[None], cfg)[0][0])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4)


def _cfg_dict(**over):
    d = dict(
        model_type="wav2vec2-bert",
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, pad_token_id=0, vocab_size=12,
        position_embeddings_type="relative_key",
        left_max_position_embeddings=8, right_max_position_embeddings=2,
        conv_depthwise_kernel_size=7, hidden_act="swish",
    )
    d.update(over)
    return d


def _bert_pair(**over):
    d = _cfg_dict(**over)
    hf_kwargs = {k: v for k, v in d.items() if k != "model_type"}
    hf_cfg = transformers.Wav2Vec2BertConfig(
        **hf_kwargs,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, conformer_conv_dropout=0.0,
        activation_dropout=0.0, max_source_positions=512,
        # apply_spec_augment off ⇒ no masked_spec_embed in the state dict
        apply_spec_augment=False, mask_time_prob=0.0, mask_feature_prob=0.0,
    )
    torch.manual_seed(0)
    tm = transformers.Wav2Vec2BertForCTC(hf_cfg).eval()
    cfg = Wav2Vec2ModelConfig.from_dict(d)
    assert cfg.encoder_style == "conformer_bert"
    assert cfg.frontend_style == "mel"
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("wav2vec2_bert.masked_spec_embed", None)
    params = params_from_flat_dict(sd, cfg)
    return tm, cfg, params


def _hf_logits(tm, audio):
    from transformers import SeamlessM4TFeatureExtractor

    fe = SeamlessM4TFeatureExtractor()
    feats = fe([np.asarray(a) for a in audio], sampling_rate=16000,
               return_tensors="pt", padding=True)
    with torch.no_grad():
        return tm(feats["input_features"],
                  attention_mask=feats["attention_mask"]).logits.numpy()


@pytest.mark.parametrize("pos", ["relative_key", "relative", "rotary", None])
def test_w2v_bert_logits_match_transformers(pos):
    """Raw waveform → our jitted mel frontend + conformer-bert encoder must
    match HF's SeamlessM4TFeatureExtractor + Wav2Vec2BertForCTC across all
    four position-embedding modes (relative_key is the w2v-BERT 2.0
    default: a clamped-distance embedding per layer)."""
    tm, cfg, params = _bert_pair(position_embeddings_type=pos)
    assert "feature_extractor" not in params
    assert "pos_conv_embed" not in params["encoder"]
    assert "layer_norm" not in params["encoder"]
    rng = np.random.default_rng(1)
    audio = (rng.normal(size=(1, N_SAMPLES)) * 0.1).astype(np.float32)
    ref = _hf_logits(tm, audio)
    got = np.asarray(make_forward_fn(cfg)(params, audio))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_w2v_bert_adapter_and_intermediate_ffn():
    """add_adapter + use_intermediate_ffn_before_adapter: the conformer-
    style downsampling adapter (strided GLU convs + position-free
    attention) halves the frame rate; frame_lengths/conv_output_length
    follow the HF sub-sampling rule."""
    tm, cfg, params = _bert_pair(
        add_adapter=True, adapter_kernel_size=3, adapter_stride=2,
        num_adapter_layers=1, use_intermediate_ffn_before_adapter=True,
        adapter_act="relu",
    )
    assert "intermediate_ffn" in params
    assert "residual_conv" in params["adapter"]["layers"]
    rng = np.random.default_rng(2)
    audio = (rng.normal(size=(1, N_SAMPLES)) * 0.1).astype(np.float32)
    ref = _hf_logits(tm, audio)
    got = np.asarray(make_forward_fn(cfg)(params, audio))
    assert got.shape == ref.shape
    assert got.shape[1] == cfg.conv_output_length(N_SAMPLES)
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
    assert cfg.frame_stride_ms(16000) == pytest.approx(40.0)


def test_w2v_bert_padded_batch_matches_unpadded():
    """Masked mel statistics + attention key masks + causal depthwise convs
    must reproduce the per-utterance forward on valid frames."""
    import jax.numpy as jnp

    tm, cfg, params = _bert_pair(add_adapter=True, num_adapter_layers=1)
    rng = np.random.default_rng(3)
    lens = [N_SAMPLES, 400 + 160 * 61]
    audios = [(rng.normal(size=(n,)) * 0.1).astype(np.float32) for n in lens]
    batch = np.zeros((len(lens), max(lens)), np.float32)
    for i, a in enumerate(audios):
        batch[i, : len(a)] = a
    fwd = make_forward_fn(cfg)
    batched = np.asarray(fwd(params, batch, jnp.asarray(lens)))
    got_lens = np.asarray(frame_lengths(cfg, jnp.asarray(lens)))
    for i, a in enumerate(audios):
        single = np.asarray(fwd(params, a[None, :]))
        t_i = cfg.conv_output_length(lens[i])
        assert t_i == single.shape[1] == got_lens[i]
        np.testing.assert_allclose(
            batched[i, :t_i], single[0], rtol=5e-4, atol=5e-4,
            err_msg=f"utterance {i} (len {lens[i]})",
        )


def test_w2v_bert_export_loads_into_transformers():
    """The export must load into transformers' Wav2Vec2BertForCTC with no
    unexpected keys and produce the same logits (masked_spec_embed is the
    only tolerated missing key)."""
    import jax

    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.utils.checkpoint import params_to_hf_flat_dict

    d = _cfg_dict(add_adapter=True, adapter_kernel_size=3, adapter_stride=2,
                  num_adapter_layers=1,
                  use_intermediate_ffn_before_adapter=True)
    cfg = Wav2Vec2ModelConfig.from_dict(d)
    params = init_params(cfg, jax.random.PRNGKey(0))
    flat = {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in params_to_hf_flat_dict(params, cfg).items()}

    hf_kwargs = {k: v for k, v in d.items() if k != "model_type"}
    hf_cfg = transformers.Wav2Vec2BertConfig(
        **hf_kwargs,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        final_dropout=0.0, layerdrop=0.0, conformer_conv_dropout=0.0,
        activation_dropout=0.0, max_source_positions=512,
        apply_spec_augment=False, mask_time_prob=0.0, mask_feature_prob=0.0,
    )
    tm = transformers.Wav2Vec2BertForCTC(hf_cfg).eval()
    missing, unexpected = tm.load_state_dict(flat, strict=False)
    assert not unexpected, unexpected
    assert all(m == "wav2vec2_bert.masked_spec_embed" for m in missing), missing

    rng = np.random.default_rng(4)
    audio = (rng.normal(size=(1, N_SAMPLES)) * 0.1).astype(np.float32)
    ref = _hf_logits(tm, audio)
    got = np.asarray(make_forward_fn(cfg)(params, audio))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_w2v_bert_tensor_parallel_specs():
    """TP specs: encoder + adapter attention linear_q/k/v shard head
    outputs, linear_out the input axis, FFNs Megatron-style; the
    relative_key distance embedding and conv modules replicate."""
    import jax

    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.mesh import make_mesh, param_shardings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = Wav2Vec2ModelConfig.from_dict(
        _cfg_dict(add_adapter=True, num_adapter_layers=1))
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(8, model=2)
    specs = param_shardings(params, mesh)
    P = jax.sharding.PartitionSpec
    sa = specs["encoder"]["layers"]["self_attn"]
    assert sa["linear_q"]["kernel"].spec == P(None, None, "model")
    assert sa["linear_out"]["kernel"].spec == P(None, "model", None)
    assert sa["distance_embedding"].spec == P()
    asa = specs["adapter"]["layers"]["self_attn"]
    assert asa["linear_q"]["kernel"].spec == P(None, None, "model")
    assert specs["adapter"]["layers"]["residual_conv"]["weight"].spec == P()
    ffn = specs["encoder"]["layers"]["ffn2"]
    assert ffn["intermediate_dense"]["kernel"].spec == P(None, None, "model")
    assert ffn["output_dense"]["kernel"].spec == P(None, "model", None)


def test_w2v_bert_batch_aligner_and_cli(tmp_path):
    """Full-pipeline integration: a w2v-BERT checkpoint dir (HF layout,
    model_type=wav2vec2-bert) drives BatchAligner and the CLI end to end —
    the mel frontend replaces the conv stack transparently behind the same
    bucketing/grouping machinery."""
    import json

    import jax

    from wav2vec2_tpu.cli.alignment_report import run as cli_run
    from wav2vec2_tpu.data.flac_encoder import write_flac
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner
    from wav2vec2_tpu.utils.checkpoint import save_safetensors

    d = _cfg_dict(add_adapter=True, num_adapter_layers=1)
    cfg = Wav2Vec2ModelConfig.from_dict(d)
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"<pad>": 0, "|": 4, "a": 5, "b": 6, "c": 7}

    aligner = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                           use_pallas=False)
    rng = np.random.default_rng(0)
    audios = [rng.normal(size=16640).astype(np.float32) for _ in range(3)]
    transcripts = ["ab ca", "ba", "ab ab"]
    outs = aligner.align_utterances(audios, transcripts,
                                    audio_multiple=2000, token_multiple=16)
    for out, t in zip(outs, transcripts):
        assert [w.word for w in out.words] == t.split()
        for w in out.words:
            assert w.end_ms > w.start_ms
            # 40 ms frames (mel 20 ms × adapter stride 2)
            assert w.start_ms % 1 == 0

    # CLI over the same checkpoint written to an HF-layout dir
    mdir = tmp_path / "model"
    mdir.mkdir()
    save_safetensors(mdir / "model.safetensors", params, cfg)
    (mdir / "config.json").write_text(json.dumps(d))
    (mdir / "vocab.json").write_text(json.dumps(vocab))
    root = tmp_path / "data" / "LibriSpeech" / "test-clean" / "1" / "2"
    root.mkdir(parents=True)
    lines = []
    for i, text in enumerate(["AB CA", "BA CB"]):
        uid = f"1-2-{i:04d}"
        x = np.clip(np.cumsum(rng.integers(-80, 80, size=16640)),
                    -30000, 30000)
        write_flac(root / f"{uid}.flac", x.astype(np.int64), 16000)
        lines.append(f"{uid} {text}")
    (root / "1-2.trans.txt").write_text("\n".join(lines))
    rc = cli_run([
        "--model-dir", str(mdir), "--dataset-root", str(tmp_path / "data"),
        "--compute-dtype", "float32", "--device", "cpu",
        "--output-format", "textgrid", "--batch",
    ])
    assert rc == 0
    tgs = sorted(root.glob("*.TextGrid"))
    assert len(tgs) == 2
    assert '"ab"' in tgs[0].read_text()


def test_w2v_bert_longform_and_online():
    """The mel frontend's 320-sample frame stride flows through
    frame_stride_samples() into the long-form chunker and the online
    aligner (both previously derived it from prod(conv_stride), which is
    empty for w2v-BERT)."""
    import jax

    from wav2vec2_tpu.align.longform import align_longform
    from wav2vec2_tpu.align.online import OnlineAligner
    from wav2vec2_tpu.models.params import init_params

    cfg = Wav2Vec2ModelConfig.from_dict(_cfg_dict())
    assert cfg.frame_stride_samples() == 320
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"a": 1, "b": 2, "|": 4}
    rng = np.random.default_rng(0)
    audio = rng.normal(size=48000).astype(np.float32)

    out = align_longform(audio, "ab ba ab", params, cfg, vocab,
                         chunk_sec=1.0, overlap_sec=0.25, sample_rate=16000)
    assert [w.word for w in out.words] == ["ab", "ba", "ab"]
    for w, v in zip(out.words, out.words[1:]):
        assert w.start_ms <= v.start_ms

    ol = OnlineAligner(cfg, params, vocab, "ab ba ab",
                       chunk_sec=1.0, overlap_sec=0.25,
                       finalize_margin_sec=0.5)
    for i in range(0, len(audio), 8000):
        ol.push(audio[i: i + 8000])
    words = ol.flush().words
    assert [w.word for w in words] == ["ab", "ba", "ab"]

    # adapter variant: 640-sample frames (mel 320 × adapter stride 2)
    cfg_a = Wav2Vec2ModelConfig.from_dict(
        _cfg_dict(add_adapter=True, num_adapter_layers=1))
    assert cfg_a.frame_stride_samples() == 640
