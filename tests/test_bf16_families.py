"""bf16 production-path regression for every encoder family.

Throughput serving runs `compute_dtype="bfloat16"` (the configuration
`bench.py` / `scripts/bench_models.py` measure and the daemon defaults to),
but the cross-implementation parity suite exercises f32 only. Each family's
bf16 branch carries real policy code — score accumulation dtypes
(`acc = f32 if h.dtype == f32 else h.dtype` in models/encoder.py), bf16
weight storage (`cast_compute_weights_bf16`), f32 islands for pos-conv and
log-softmax — so a dtype-policy regression (e.g. an f32 upcast silently
dropped, or a bf16 tensor leaking into the DP) would otherwise only show up
in dataset-scale TPU sweeps.

This locks, per family, on CPU: identical word sequences between f32 and
bf16 compute, word boundaries within BOUNDARY_TOL_FRAMES, and finite
calibrated confidences. Everything is deterministic (fixed seeds, XLA CPU),
so these are exact regression locks, not tolerances hiding flake.

Reference analog: the reference validates its one f16 excursion by output
comparison too (ONNX cuda-safe-fp16, reference
scripts/export_ctc_model_to_onnx.py:261-281); here bf16 is the *default*
serving dtype, so it gets the same treatment in-suite.
"""

from __future__ import annotations

import numpy as np
import pytest

from wav2vec2_tpu.config import Wav2Vec2ModelConfig

# ±2 frames: bf16 rounds ~3 decimal digits of the logits, which can move a
# Viterbi boundary by a frame either way on a random tiny model; a policy
# bug (wrong accumulation dtype, missing f32 island) shifts whole words.
BOUNDARY_TOL_FRAMES = 2

_CONV = dict(
    conv_dim=[16, 16], conv_kernel=[10, 3], conv_stride=[5, 2],
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    feat_extract_norm="group", conv_bias=False,
)
_BASE = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64, pad_token_id=0, vocab_size=8, **_CONV,
)

FAMILIES: dict[str, dict] = {
    # wav2vec2-base: post-norm, GroupNorm layer 0
    "wav2vec2-post-norm": dict(_BASE),
    # wav2vec2-large/XLSR: pre-norm, per-layer LayerNorm conv stack
    "wav2vec2-stable-ln": dict(
        _BASE, do_stable_layer_norm=True, feat_extract_norm="layer",
        conv_bias=True,
    ),
    # WavLM: gated relative-position-bias attention
    "wavlm": dict(
        _BASE, model_type="wavlm", num_buckets=16, max_bucket_distance=40,
    ),
    # data2vec-audio: stacked pos-conv
    "data2vec": dict(
        _BASE, model_type="data2vec-audio", feat_extract_norm="layer",
        conv_bias=False,
    ),
    # mHuBERT: batch-norm pos-conv (folded to an affine at load)
    "hubert-bn-posconv": dict(
        _BASE, model_type="hubert", conv_pos_batch_norm=True,
    ),
    # SEW: squeeze_factor-pooled encoder
    "sew": dict(_BASE, model_type="sew", squeeze_factor=2),
    # SEW-D: DeBERTa disentangled attention — the bf16 score-dtype policy
    # (c2p/p2c diagonal terms kept in bf16) landed late in round 3
    "sew-d": dict(
        _BASE, model_type="sew-d", squeeze_factor=2, position_buckets=8,
        max_position_embeddings=16,
    ),
    # MMS/-large adapter stack after the encoder
    "add-adapter": dict(
        _BASE, add_adapter=True, adapter_kernel_size=3, adapter_stride=2,
        num_adapter_layers=1,
    ),
    # conformer, Transformer-XL relative attention (factorized position term)
    "conformer-rel-pos": dict(
        _BASE, model_type="wav2vec2-conformer",
        position_embeddings_type="relative", hidden_act="swish",
        conv_depthwise_kernel_size=7,
    ),
    # conformer, rotary attention
    "conformer-rope": dict(
        _BASE, model_type="wav2vec2-conformer",
        position_embeddings_type="rotary", hidden_act="swish",
        conv_depthwise_kernel_size=7,
    ),
    # w2v-BERT: mel frontend + relative_key conformer (HF gather form)
    "w2v-bert": dict(
        model_type="wav2vec2-bert", hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, pad_token_id=0,
        vocab_size=8, position_embeddings_type="relative_key",
        left_max_position_embeddings=8, right_max_position_embeddings=2,
        conv_depthwise_kernel_size=7, hidden_act="swish",
    ),
}

VOCAB = {"<pad>": 0, "a": 1, "b": 2, "|": 3, "c": 4}


def _align(cfg, params, dtype):
    from wav2vec2_tpu.parallel.batching import BatchAligner

    rng = np.random.default_rng(11)
    # mel frontend: 10 ms hops ×2-stacked — 8000 samples → T≈24; conv
    # families get T≈199-399. Both clear T ≥ ceil(S/2) for these scripts.
    n = 8000 if cfg.frontend_style == "mel" else 4000
    audios = [rng.normal(size=n).astype(np.float32) for _ in range(3)]
    transcripts = ["ab ca", "ba c", "cab"]
    aligner = BatchAligner(cfg, params, VOCAB, compute_dtype=dtype,
                           use_pallas=False)
    return aligner.align_utterances(audios, transcripts,
                                    audio_multiple=500, token_multiple=16)


def test_bf16_longform_matches_f32():
    """The chunk+stitch long-form path has its own forward plumbing
    (make_forward_fn over chunk batches + stitched single DP) — gate its
    bf16 configuration the same way."""
    import jax

    from wav2vec2_tpu.align.longform import align_longform
    from wav2vec2_tpu.models.params import init_params

    cfg = Wav2Vec2ModelConfig.from_dict(dict(FAMILIES["wav2vec2-post-norm"]))
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    audio = rng.normal(size=48_000).astype(np.float32)
    transcript = "ab ba ab ca ab"

    outs = {
        d: align_longform(audio, transcript, params, cfg, VOCAB,
                          chunk_sec=1.0, overlap_sec=0.25,
                          sample_rate=16000, compute_dtype=d)
        for d in ("float32", "bfloat16")
    }
    tol_ms = BOUNDARY_TOL_FRAMES * cfg.frame_stride_ms(16000)
    ref, got = outs["float32"].words, outs["bfloat16"].words
    assert [w.word for w in got] == [w.word for w in ref] == transcript.split()
    for wr, wg in zip(ref, got):
        assert abs(wg.start_ms - wr.start_ms) <= tol_ms, (wr, wg)
        assert abs(wg.end_ms - wr.end_ms) <= tol_ms, (wr, wg)


def test_bf16_online_matches_f32():
    """The incremental aligner re-runs the DP over a growing window with
    its own adopted-frontier logic; bf16 must finalize the same words at
    boundaries within the same budget."""
    import jax

    from wav2vec2_tpu.align.online import OnlineAligner
    from wav2vec2_tpu.models.params import init_params

    cfg = Wav2Vec2ModelConfig.from_dict(dict(FAMILIES["wav2vec2-post-norm"]))
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    audio = rng.normal(size=48_000).astype(np.float32)
    transcript = "ab ba ab ca ab"

    words = {}
    for d in ("float32", "bfloat16"):
        online = OnlineAligner(cfg, params, VOCAB, transcript,
                               chunk_sec=1.0, overlap_sec=0.25,
                               finalize_margin_sec=0.5, normalize="none",
                               compute_dtype=d)
        pos, piece = 0, 3100
        while pos < len(audio):
            online.push(audio[pos: pos + piece])
            pos += piece
        words[d] = online.flush().words
    tol_ms = BOUNDARY_TOL_FRAMES * cfg.frame_stride_ms(16000)
    ref, got = words["float32"], words["bfloat16"]
    assert [w.word for w in got] == [w.word for w in ref] == transcript.split()
    for wr, wg in zip(ref, got):
        assert abs(wg.start_ms - wr.start_ms) <= tol_ms, (wr, wg)
        assert abs(wg.end_ms - wr.end_ms) <= tol_ms, (wr, wg)


@pytest.mark.parametrize("family", sorted(FAMILIES), ids=sorted(FAMILIES))
def test_bf16_matches_f32_boundaries(family):
    import jax

    from wav2vec2_tpu.models.params import init_params

    cfg = Wav2Vec2ModelConfig.from_dict(dict(FAMILIES[family]))
    params = init_params(cfg, jax.random.PRNGKey(0))
    ref = _align(cfg, params, "float32")
    got = _align(cfg, params, "bfloat16")

    stride = cfg.frame_stride_ms(16000)
    # SEW/SEW-D run the transformer at squeeze_factor-pooled rate and the
    # upsampler duplicates frames, so one *decision* step spans
    # squeeze_factor conv frames — scale the budget accordingly.
    tol_ms = BOUNDARY_TOL_FRAMES * stride * getattr(cfg, "squeeze_factor", 1)
    n_words = 0
    for r, g in zip(ref, got):
        assert [w.word for w in g.words] == [w.word for w in r.words], family
        for wr, wg in zip(r.words, g.words):
            assert abs(wg.start_ms - wr.start_ms) <= tol_ms, (family, wr, wg)
            assert abs(wg.end_ms - wr.end_ms) <= tol_ms, (family, wr, wg)
            assert 0.0 <= wg.confidence <= 1.0 and np.isfinite(wg.confidence)
        n_words += len(r.words)
    assert n_words > 0, family
