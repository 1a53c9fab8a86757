"""BatchAligner vs per-utterance ForcedAligner equivalence: the bucketed,
padded, masked batch path must produce the same words and boundaries as the
single-utterance pipeline (padding-exactness end to end)."""

import numpy as np
import pytest

from wav2vec2_tpu import AlignmentInput, ForcedAligner
from wav2vec2_tpu.config import Wav2Vec2ModelConfig
from wav2vec2_tpu.pipeline.defaults import (
    CaseAwareTokenizer,
    DefaultWordGrouper,
    ViterbiSequenceAligner,
)
from wav2vec2_tpu.pipeline.model_runtime import JaxRuntimeBackend


@pytest.fixture(scope="module")
def setup():
    import jax

    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner

    cfg = Wav2Vec2ModelConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"a": 1, "b": 2, "|": 3, "c": 4}

    batch = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                         use_pallas=False)
    backend = JaxRuntimeBackend(cfg, params, compute_dtype="float32",
                                pad_multiple=500)
    single = ForcedAligner(
        runtime_backend=backend, vocab=vocab, blank_id=0, word_sep_id=3,
        frame_stride_ms=cfg.frame_stride_ms(16000),
        expected_sample_rate_hz=16000,
        tokenizer=CaseAwareTokenizer(),
        sequence_aligner=ViterbiSequenceAligner(),
        word_grouper=DefaultWordGrouper(),
    )
    return batch, single


def test_batch_matches_single(setup):
    batch, single = setup
    rng = np.random.default_rng(0)
    lens = [4000, 2600, 3333]
    audios = [rng.normal(size=n).astype(np.float32) for n in lens]
    transcripts = ["ab ca", "ba", "ab ba ca"]

    batch_out = batch.align_utterances(
        audios, transcripts, audio_multiple=500, token_multiple=16, max_batch=8
    )
    for audio, transcript, got in zip(audios, transcripts, batch_out):
        expected = single.align(AlignmentInput(16000, audio, transcript))
        assert [w.word for w in got.words] == [w.word for w in expected.words]
        for gw, ew in zip(got.words, expected.words):
            assert gw.start_ms == ew.start_ms, (transcript, gw.word)
            assert gw.end_ms == ew.end_ms, (transcript, gw.word)
            assert gw.confidence == pytest.approx(ew.confidence, abs=1e-6)


def test_batch_empty_and_active_mix(setup):
    batch, _ = setup
    rng = np.random.default_rng(1)
    audios = [rng.normal(size=3000).astype(np.float32),
              np.zeros(0, np.float32),
              rng.normal(size=3000).astype(np.float32)]
    outs = batch.align_utterances(audios, ["ab", "ab", "   "],
                                  audio_multiple=500, token_multiple=16)
    assert len(outs[0].words) > 0
    assert outs[1].words == []
    assert outs[2].words == []


def test_presets_geometry():
    from wav2vec2_tpu.models.presets import PRESETS

    base = PRESETS["wav2vec2-base-960h"]()
    assert base.hidden_size == 768 and not base.do_stable_layer_norm
    assert base.frame_stride_ms(16000) == pytest.approx(20.0)
    large = PRESETS["wav2vec2-large-960h-lv60"]()
    assert large.hidden_size == 1024 and large.do_stable_layer_norm
    xlsr = PRESETS["xlsr-53"](vocab_size=54)
    assert xlsr.vocab_size == 54


def test_batch_aligner_sharded_over_mesh(setup):
    """Data-parallel serving: BatchAligner with an 8-device mesh must produce
    the same words as the unsharded path (XLA inserts the collectives)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp  # noqa: F401

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner
    from wav2vec2_tpu.parallel.mesh import make_mesh, replicated

    cfg = Wav2Vec2ModelConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"a": 1, "b": 2, "|": 3, "c": 4}

    mesh = make_mesh(8, model=1)  # pure data parallel for serving
    sharded_params = jax.device_put(params, replicated(mesh))
    plain = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                         use_pallas=False)
    sharded = BatchAligner(cfg, sharded_params, vocab, compute_dtype="float32",
                           use_pallas=False, mesh=mesh)

    rng = np.random.default_rng(0)
    audios = [rng.normal(size=3000).astype(np.float32) for _ in range(8)]
    transcripts = ["ab ca", "ba", "ab", "ca ab", "ab ba", "ca", "ba ab", "ab ca ba"]
    out_plain = plain.align_utterances(audios, transcripts,
                                       audio_multiple=500, token_multiple=16)
    out_sharded = sharded.align_utterances(audios, transcripts,
                                           audio_multiple=500, token_multiple=16)
    for a, b in zip(out_plain, out_sharded):
        assert [w.word for w in a.words] == [w.word for w in b.words]
        for wa, wb in zip(a.words, b.words):
            assert wa.start_ms == wb.start_ms and wa.end_ms == wb.end_ms


def test_device_resident_batch_padded_to_mesh_multiple(setup):
    """Regression: a PRE-STAGED device batch whose batch dim is not a
    multiple of the 'data' axis must be padded inside submit_padded_batch —
    round 1 only padded the host-staging path (batching.py:191-199)."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner
    from wav2vec2_tpu.parallel.mesh import make_mesh, replicated
    from wav2vec2_tpu.align.tokenization import build_token_sequence_case_aware
    from wav2vec2_tpu.pipeline.runtime import normalize_audio

    cfg = Wav2Vec2ModelConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"a": 1, "b": 2, "|": 3, "c": 4}
    mesh = make_mesh(8, model=1)
    sharded_params = jax.device_put(params, replicated(mesh))
    aligner = BatchAligner(cfg, sharded_params, vocab, compute_dtype="float32",
                           use_pallas=False, mesh=mesh)
    plain = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                         use_pallas=False)

    rng = np.random.default_rng(2)
    b = 5  # deliberately NOT a multiple of 8
    n_pad, s_pad = 3000, 16
    audio = np.stack([
        normalize_audio(rng.normal(size=n_pad).astype(np.float32))
        for _ in range(b)
    ])
    seqs = [
        build_token_sequence_case_aware(t, vocab, 0, 3)
        for t in ["ab ca", "ba", "ab", "ca", "ab ba"]
    ]
    tokens = np.zeros((b, s_pad), np.int32)
    s_lens = np.asarray([len(s.tokens) for s in seqs], np.int32)
    for i, s in enumerate(seqs):
        tokens[i, : len(s.tokens)] = s.tokens
    lens = np.full((b,), n_pad, np.int32)

    # pre-stage ON DEVICE (jnp arrays) — exercises the on_device branch
    dev = (jnp.asarray(audio), jnp.asarray(lens),
           jnp.asarray(tokens), jnp.asarray(s_lens))
    got = tuple(np.asarray(x) for x in aligner.submit_padded_batch(*dev))
    want = plain.align_padded_batch(audio, lens, tokens, s_lens)
    # padded replica rows beyond b are ignored; real rows must match exactly
    np.testing.assert_array_equal(got[0][:b], want[0][:b])  # paths
    np.testing.assert_array_equal(got[1][:b], want[1][:b])  # t_lens


def test_batch_aligner_concurrent_submit_thread_safety(setup):
    """Two threads driving one BatchAligner concurrently must both get
    results identical to serial execution (the shared-state discipline the
    reference gets from Rust ownership; JAX dispatch is thread-safe and the
    engine holds no mutable per-call state)."""
    import threading

    batch, _ = setup
    rng = np.random.default_rng(7)
    audios = [rng.normal(size=3000).astype(np.float32) for _ in range(4)]
    transcripts = ["ab ca", "ba", "ab ba", "ca"]

    serial = batch.align_utterances(audios, transcripts,
                                    audio_multiple=500, token_multiple=16)
    results = {}
    errors = []

    def worker(tag):
        try:
            results[tag] = batch.align_utterances(
                audios, transcripts, audio_multiple=500, token_multiple=16)
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append((tag, e))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    for tag, outs in results.items():
        for a, b in zip(serial, outs):
            assert [w.word for w in a.words] == [w.word for w in b.words], tag
            for wa, wb in zip(a.words, b.words):
                assert (wa.start_ms, wa.end_ms) == (wb.start_ms, wb.end_ms)
                assert wa.confidence == wb.confidence


def test_stable_layer_norm_family_full_pipeline():
    """The -large/XLSR architecture variant (pre-norm encoder, per-layer
    LayerNorm feature extractor, conv biases) through BOTH the single and
    batch pipelines — words and boundaries must agree exactly. The base
    family covers the other branch everywhere else."""
    import jax

    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner

    cfg = Wav2Vec2ModelConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        do_stable_layer_norm=True, feat_extract_norm="layer", conv_bias=True,
    )
    params = init_params(cfg, jax.random.PRNGKey(1))
    vocab = {"a": 1, "b": 2, "|": 3, "c": 4}
    batch = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                         use_pallas=False)
    backend = JaxRuntimeBackend(cfg, params, compute_dtype="float32",
                                pad_multiple=500)
    single = ForcedAligner(
        runtime_backend=backend, vocab=vocab, blank_id=0, word_sep_id=3,
        frame_stride_ms=cfg.frame_stride_ms(16000),
        expected_sample_rate_hz=16000,
        tokenizer=CaseAwareTokenizer(),
        sequence_aligner=ViterbiSequenceAligner(),
        word_grouper=DefaultWordGrouper(),
    )
    rng = np.random.default_rng(3)
    lens = [4000, 2600, 3333]
    audios = [rng.normal(size=n).astype(np.float32) for n in lens]
    transcripts = ["ab ca", "ba", "ab ba ca"]
    batch_out = batch.align_utterances(
        audios, transcripts, audio_multiple=500, token_multiple=16)
    for audio, transcript, got in zip(audios, transcripts, batch_out):
        expected = single.align(AlignmentInput(16000, audio, transcript))
        assert [w.word for w in got.words] == [w.word for w in expected.words]
        assert len(got.words) == len(transcript.split())
        for gw, ew in zip(got.words, expected.words):
            assert (gw.start_ms, gw.end_ms) == (ew.start_ms, ew.end_ms)
            assert gw.confidence == pytest.approx(ew.confidence, abs=1e-6)


def test_align_stream_matches_align_utterances(setup):
    """The streaming API must produce the same outputs as the list API,
    tagged with input indices, while reading inputs lazily."""
    batch, _ = setup
    rng = np.random.default_rng(11)
    lens = [4000, 2600, 3333, 4000, 0, 2600]
    audios = [rng.normal(size=n).astype(np.float32) for n in lens]
    transcripts = ["ab ca", "ba", "ab ba ca", "ca", "ab", "   "]

    want = batch.align_utterances(audios, transcripts,
                                  audio_multiple=500, token_multiple=16)

    consumed = []

    def lazy_items():
        for i, (a, t) in enumerate(zip(audios, transcripts)):
            consumed.append(i)
            yield a, t

    got = dict(batch.align_stream(lazy_items(), audio_multiple=500,
                                  token_multiple=16, max_batch=2))
    assert sorted(got) == list(range(len(audios)))
    assert consumed == list(range(len(audios)))
    for i, exp in enumerate(want):
        assert [w.word for w in got[i].words] == [w.word for w in exp.words]
        for wa, wb in zip(got[i].words, exp.words):
            assert (wa.start_ms, wa.end_ms) == (wb.start_ms, wb.end_ms)
            assert wa.confidence == pytest.approx(wb.confidence, abs=1e-6)


def test_align_stream_bounded_in_flight(setup):
    """With max_batch=1 and max_in_flight=1 every submit forces a drain —
    results must still be complete and correct."""
    batch, _ = setup
    rng = np.random.default_rng(12)
    audios = [rng.normal(size=3000).astype(np.float32) for _ in range(4)]
    transcripts = ["ab", "ba", "ca", "ab ba"]
    got = dict(batch.align_stream(zip(audios, transcripts), audio_multiple=500,
                                  token_multiple=16, max_batch=1,
                                  max_in_flight=1))
    assert sorted(got) == [0, 1, 2, 3]
    for i, t in enumerate(transcripts):
        assert [w.word for w in got[i].words] == t.split()


def test_align_stream_flushes_partial_buckets_at_pending_cap(setup):
    """Live-feed safety: diverse-length utterances must not wait forever in
    partially-filled buckets — the fullest bucket flushes at max_pending."""
    batch, _ = setup
    rng = np.random.default_rng(13)
    # lengths chosen so every utterance lands in its own bucket
    lens = [1000, 1600, 2100, 2600, 3100, 3600]
    audios = [rng.normal(size=n).astype(np.float32) for n in lens]
    transcripts = ["ab"] * len(lens)
    got = dict(batch.align_stream(
        zip(audios, transcripts), audio_multiple=500, token_multiple=16,
        max_batch=64, max_in_flight=1, max_pending=3,
    ))
    assert sorted(got) == list(range(len(lens)))
    for i in range(len(lens)):
        assert [w.word for w in got[i].words] == ["ab"]


def test_bucket_scheme_pow2_bounds_shape_count():
    """pow2 bucketing keeps the shape vocabulary O(log length-spread) and
    pad_batch rounds the batch dim to powers of two — the shape-budget
    controls that bound per-process XLA program loads (each distinct
    (B, N_pad, S_pad) is a separately compiled program)."""
    from wav2vec2_tpu.parallel.batching import (
        _pad_len,
        _round_up_pow2,
        bucket_utterances,
    )

    rng = np.random.default_rng(0)
    audio_lens = [int(rng.uniform(4, 8) * 16000) for _ in range(200)]
    token_lens = [int(rng.uniform(40, 120)) for _ in range(200)]

    linear = bucket_utterances(audio_lens, token_lens, scheme="linear")
    pow2 = bucket_utterances(audio_lens, token_lens, scheme="pow2")
    n_shapes = lambda bs: len({(b.n_pad, b.s_pad) for b in bs})
    assert n_shapes(pow2) <= 2  # 64000/128000 × 128
    assert n_shapes(pow2) < n_shapes(linear)
    # every utterance still fits its bucket
    for b in pow2:
        for i in b.indices:
            assert audio_lens[i] <= b.n_pad and token_lens[i] <= b.s_pad

    assert _round_up_pow2(3, 1) == 4
    assert _round_up_pow2(64, 1) == 64
    assert _pad_len(70000, 16000, "pow2") == 128000
    assert _pad_len(70000, 16000, "linear") == 80000
    with pytest.raises(ValueError):
        _pad_len(1, 1, "fib")


def test_pad_batch_output_equivalence(setup):
    """pad_batch + pow2 bucketing must not change any output (padded rows
    are discarded duplicates; length padding was already exact)."""
    batch, _ = setup
    rng = np.random.default_rng(7)
    lens = [4000, 2600, 3333, 2100, 4400]
    audios = [rng.normal(size=n).astype(np.float32) for n in lens]
    transcripts = ["ab ca", "ba", "ab ba ca", "ca", "ab ab"]

    tight = batch.align_utterances(
        audios, transcripts, audio_multiple=500, token_multiple=16,
        bucket_scheme="linear", pad_batch=False,
    )
    budgeted = batch.align_utterances(
        audios, transcripts, audio_multiple=500, token_multiple=16,
        bucket_scheme="pow2", pad_batch=True,
    )
    for a, b in zip(tight, budgeted):
        assert [w.word for w in a.words] == [w.word for w in b.words]
        for wa, wb in zip(a.words, b.words):
            assert (wa.start_ms, wa.end_ms) == (wb.start_ms, wb.end_ms)
            # different padded shapes retile XLA reductions → last-ulp f32
            # drift in the forward (same as any bucket-size change)
            assert wa.confidence == pytest.approx(wb.confidence, abs=1e-6)


def test_align_stream_pad_batch_equivalence(setup):
    batch, _ = setup
    rng = np.random.default_rng(11)
    lens = [4000, 2600, 3333]
    audios = [rng.normal(size=n).astype(np.float32) for n in lens]
    transcripts = ["ab ca", "ba", "ab"]
    want = batch.align_utterances(audios, transcripts, audio_multiple=500,
                                  token_multiple=16, bucket_scheme="linear",
                                  pad_batch=False)
    got = dict(batch.align_stream(zip(audios, transcripts), audio_multiple=500,
                                  token_multiple=16, bucket_scheme="pow2",
                                  pad_batch=True))
    for i, w in enumerate(want):
        assert [x.word for x in got[i].words] == [x.word for x in w.words]
        for wa, wb in zip(w.words, got[i].words):
            assert (wa.start_ms, wa.end_ms) == (wb.start_ms, wb.end_ms)


def test_normalize_on_device_equivalence(setup):
    """normalize_on_device=True (bench.py's and the daemon's path) must
    match host normalize_audio to word-identical boundaries."""
    import jax

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner

    host_norm, _ = setup
    cfg = host_norm.cfg
    dev_norm = BatchAligner(cfg, host_norm.params, host_norm.vocab,
                            compute_dtype="float32", use_pallas=False,
                            normalize_on_device=True)
    rng = np.random.default_rng(21)
    lens = [4000, 2600, 3333]
    audios = [(rng.normal(size=n) * 0.3).astype(np.float32) for n in lens]
    transcripts = ["ab ca", "ba", "ab ba"]
    a = host_norm.align_utterances(audios, transcripts,
                                   audio_multiple=500, token_multiple=16)
    b = dev_norm.align_utterances(audios, transcripts,
                                  audio_multiple=500, token_multiple=16)
    n_words = 0
    for x, y in zip(a, b):
        assert [w.word for w in x.words] == [w.word for w in y.words]
        for wx, wy in zip(x.words, y.words):
            assert (wx.start_ms, wx.end_ms) == (wy.start_ms, wy.end_ms)
            assert wx.confidence == pytest.approx(wy.confidence, abs=1e-5)
        n_words += len(x.words)
    assert n_words > 0


def test_wavlm_mms_tensor_parallel_sharding(setup):
    """Regression: TP param specs must replicate the new families' extra
    attention params (WavLM gru gates, MMS adapters) — the q/k/v-bias
    branch used to catch gru_rel_pos_* and mis-shard them."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner
    from wav2vec2_tpu.parallel.mesh import make_mesh, shard_params

    cfg = Wav2Vec2ModelConfig.from_dict(dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False, model_type="wavlm",
        num_buckets=16, max_bucket_distance=50, adapter_attn_dim=4,
    ))
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"a": 1, "b": 2, "|": 3, "c": 4}
    mesh = make_mesh(8, model=2)  # DP×TP
    sharded_params = shard_params(params, mesh)
    plain = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                         use_pallas=False)
    sharded = BatchAligner(cfg, sharded_params, vocab, compute_dtype="float32",
                           use_pallas=False, mesh=mesh)
    rng = np.random.default_rng(5)
    audios = [rng.normal(size=3000).astype(np.float32) for _ in range(4)]
    transcripts = ["ab ca", "ba", "ab", "ca ab"]
    a = plain.align_utterances(audios, transcripts,
                               audio_multiple=500, token_multiple=16)
    b = sharded.align_utterances(audios, transcripts,
                                 audio_multiple=500, token_multiple=16)
    n = 0
    for x, y in zip(a, b):
        assert [w.word for w in x.words] == [w.word for w in y.words]
        for wx, wy in zip(x.words, y.words):
            assert (wx.start_ms, wx.end_ms) == (wy.start_ms, wy.end_ms)
        n += len(x.words)
    assert n > 0


def test_batch_dp_hbm_tier_equivalence(setup, monkeypatch):
    """Batch shapes beyond the VMEM backpointer budget must route to the
    HBM-backpointer Pallas tier, NOT silently downgrade to the lax.scan DP
    (VERDICT r2: parallel/batching.py fits_vmem gate). Shrinking the budget
    makes a small batch take the long-transcript route; outputs must match
    the scan path exactly."""
    import wav2vec2_tpu.ops.viterbi_pallas as vp
    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner

    import jax

    # a tiny budget forces every tier decision down to HBM backpointers
    monkeypatch.setattr(vp, "VMEM_BUDGET_BYTES", 1)
    assert not vp.fits_vmem(10, 10)

    cfg = Wav2Vec2ModelConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    params = init_params(cfg, jax.random.PRNGKey(7))
    vocab = {"a": 1, "b": 2, "|": 3, "c": 4}
    # odd audio_multiple => distinct padded shapes from every other test,
    # so the monkeypatched budget can't hit a stale jit-cache entry
    kw = dict(audio_multiple=530, token_multiple=16, max_batch=4)

    pallas = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                          use_pallas=True)   # interpret mode off-TPU
    scan = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                        use_pallas=False)
    rng = np.random.default_rng(11)
    audios = [rng.normal(size=n).astype(np.float32) for n in (4100, 2650)]
    transcripts = ["ab ca ba", "ca ab"]
    a = pallas.align_utterances(audios, transcripts, **kw)
    b = scan.align_utterances(audios, transcripts, **kw)
    n = 0
    for x, y in zip(a, b):
        assert [w.word for w in x.words] == [w.word for w in y.words]
        for wx, wy in zip(x.words, y.words):
            assert (wx.start_ms, wx.end_ms) == (wy.start_ms, wy.end_ms)
            assert wx.confidence == pytest.approx(wy.confidence, abs=1e-6)
        n += len(x.words)
    assert n == 5


def test_sew_d_and_adapter_tensor_parallel_sharding(setup):
    """SEW-D's DeBERTa layers (query_proj/key_proj/value_proj, BERT-style
    intermediate/output denses) TP-shard under their own spec branch, and
    add_adapter conv stacks replicate: sharded alignment must equal
    unsharded for both families."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner
    from wav2vec2_tpu.parallel.mesh import make_mesh, param_shardings, shard_params
    from jax.sharding import PartitionSpec as P

    base = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    families = {
        "sew-d": dict(model_type="sew-d", squeeze_factor=2,
                      position_buckets=8, max_position_embeddings=16),
        "adapter": dict(add_adapter=True, adapter_kernel_size=3,
                        adapter_stride=2, num_adapter_layers=1),
    }
    for name, extra in families.items():
        cfg = Wav2Vec2ModelConfig.from_dict({**base, **extra})
        params = init_params(cfg, jax.random.PRNGKey(0))
        mesh = make_mesh(8, model=2)
        specs = param_shardings(params, mesh)
        if name == "sew-d":
            att = specs["encoder"]["layers"]["attention"]
            assert att["query_proj"]["kernel"].spec == P(None, None, "model")
            assert att["output_dense"]["kernel"].spec == P(None, "model", None)
            lay = specs["encoder"]["layers"]
            assert lay["intermediate_dense"]["kernel"].spec == P(None, None, "model")
            assert lay["output_dense"]["kernel"].spec == P(None, "model", None)
            assert lay["output_norm"]["weight"].spec == P()
            assert specs["encoder"]["rel_embeddings"].spec == P()
        else:
            assert specs["adapter"]["layers"]["weight"].spec == P()
        sharded_params = shard_params(params, mesh)
        vocab = {"a": 1, "b": 2, "|": 3, "c": 4}
        plain = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                             use_pallas=False)
        sharded = BatchAligner(cfg, sharded_params, vocab,
                               compute_dtype="float32", use_pallas=False,
                               mesh=mesh)
        rng = np.random.default_rng(6)
        audios = [rng.normal(size=4000).astype(np.float32) for _ in range(4)]
        transcripts = ["ab ca", "ba", "ab", "ca ab"]
        a = plain.align_utterances(audios, transcripts,
                                   audio_multiple=500, token_multiple=16)
        b = sharded.align_utterances(audios, transcripts,
                                     audio_multiple=500, token_multiple=16)
        n = 0
        for x, y in zip(a, b):
            assert [w.word for w in x.words] == [w.word for w in y.words], name
            for wx, wy in zip(x.words, y.words):
                assert (wx.start_ms, wx.end_ms) == (wy.start_ms, wy.end_ms)
            n += len(x.words)
        assert n > 0, name



def test_conformer_tensor_parallel_sharding(setup):
    """Conformer TP: linear_q/k/v/pos shard the head-output axis,
    linear_out the input axis, pos_bias_u/v the head axis; the conv module
    replicates. Sharded alignment must equal unsharded."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner
    from wav2vec2_tpu.parallel.mesh import make_mesh, param_shardings, shard_params

    cfg = Wav2Vec2ModelConfig.from_dict(dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
        model_type="wav2vec2-conformer", position_embeddings_type="relative",
        hidden_act="swish", conv_depthwise_kernel_size=7,
    ))
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(8, model=2)
    specs = param_shardings(params, mesh)
    sa = specs["encoder"]["layers"]["self_attn"]
    assert sa["linear_q"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, None, "model")
    assert sa["linear_out"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, "model", None)
    assert sa["pos_bias_u"].spec == jax.sharding.PartitionSpec(
        None, "model", None)
    ffn = specs["encoder"]["layers"]["ffn1"]
    assert ffn["intermediate_dense"]["kernel"].spec == \
        jax.sharding.PartitionSpec(None, None, "model")

    vocab = {"a": 1, "b": 2, "|": 3, "c": 4}
    sharded_params = shard_params(params, mesh)
    plain = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                         use_pallas=False)
    sharded = BatchAligner(cfg, sharded_params, vocab,
                           compute_dtype="float32", use_pallas=False,
                           mesh=mesh)
    rng = np.random.default_rng(6)
    audios = [rng.normal(size=3000).astype(np.float32) for _ in range(4)]
    transcripts = ["ab ca", "ba", "ab", "ca ab"]
    a = plain.align_utterances(audios, transcripts,
                               audio_multiple=500, token_multiple=16)
    b = sharded.align_utterances(audios, transcripts,
                                 audio_multiple=500, token_multiple=16)
    n = 0
    for x, y in zip(a, b):
        assert [w.word for w in x.words] == [w.word for w in y.words]
        for wx, wy in zip(x.words, y.words):
            assert (wx.start_ms, wx.end_ms) == (wy.start_ms, wy.end_ms)
        n += len(x.words)
    assert n > 0


def test_submit_return_log_probs_audit_variant(setup):
    """bench.py's correctness audit uses submit_padded_batch(...,
    return_log_probs=True): the extra output must be the same graph's
    log-probs (oracle DP on them reproduces the returned paths bit-exactly)
    and the other outputs must match the default call."""
    import jax

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.ops.viterbi_ref import viterbi_numpy
    from wav2vec2_tpu.parallel.batching import BatchAligner

    cfg = Wav2Vec2ModelConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    params = init_params(cfg, jax.random.PRNGKey(3))
    vocab = {"a": 1, "b": 2, "|": 3, "c": 4}
    aligner = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                           use_pallas=False, normalize_on_device=True)
    rng = np.random.default_rng(5)
    audio = rng.normal(size=(2, 3000)).astype(np.float32)
    a_l = np.array([3000, 2600], np.int32)
    tokens = np.zeros((2, 16), np.int32)
    tokens[0, :7] = [0, 1, 0, 2, 0, 4, 0]
    tokens[1, :5] = [0, 4, 0, 1, 0]
    s_l = np.array([7, 5], np.int32)

    plain = [np.asarray(x) for x in
             aligner.submit_padded_batch(audio, a_l, tokens, s_l)]
    audited = [np.asarray(x) for x in
               aligner.submit_padded_batch(audio, a_l, tokens, s_l,
                                           return_log_probs=True)]
    assert len(audited) == len(plain) + 1
    for a, b in zip(plain, audited[:-1]):
        np.testing.assert_array_equal(a, b)
    lp = audited[-1]
    paths, t_lens = audited[0], audited[1]
    for j in range(2):
        t_i = int(t_lens[j])
        oracle = viterbi_numpy(lp[j, :t_i], tokens[j, : s_l[j]])
        assert [s for s, _ in oracle] == list(paths[j, :t_i])
