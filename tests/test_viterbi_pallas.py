"""Pallas kernel vs numpy oracle — bit-identical path equivalence
(the reference's gpu_matches_cpu discipline, viterbi_gpu.rs:328-347).
Runs in interpret mode on CPU; compiled on TPU."""

import numpy as np
import pytest
import jax.numpy as jnp

from wav2vec2_tpu.ops.viterbi_pallas import (
    on_tpu,
    viterbi_pallas_batch,
    viterbi_pallas_host,
    viterbi_pallas_single,
)
from wav2vec2_tpu.ops.viterbi_ref import viterbi_numpy

INTERPRET = not on_tpu()


@pytest.mark.parametrize("seed", range(6))
def test_pallas_matches_numpy_random(seed):
    rng = np.random.default_rng(seed)
    t_len = int(rng.integers(3, 50))
    vocab = int(rng.integers(4, 12))
    s_len = int(rng.integers(1, min(2 * t_len, 24)))
    tokens = rng.integers(0, vocab, size=s_len)
    lp = rng.normal(size=(t_len, vocab)).astype(np.float32)
    assert viterbi_pallas_host(lp, tokens) == viterbi_numpy(lp, tokens)


def test_pallas_padded_matches_unpadded():
    rng = np.random.default_rng(42)
    t_len, vocab, s_len = 23, 8, 9
    tokens = rng.integers(0, vocab, size=s_len)
    lp = rng.normal(size=(t_len, vocab)).astype(np.float32)

    t_pad = t_len + 10
    lp_padded = np.zeros((t_pad, vocab), np.float32)
    lp_padded[:t_len] = lp
    tok_padded = np.zeros(s_len + 5, np.int64)
    tok_padded[:s_len] = tokens

    path = viterbi_pallas_single(
        jnp.asarray(lp_padded), jnp.asarray(tok_padded, jnp.int32),
        jnp.int32(t_len), jnp.int32(s_len), interpret=INTERPRET,
    )
    ref = viterbi_numpy(lp, tokens)
    assert [s for s, _ in ref] == list(np.asarray(path)[:t_len])


def test_pallas_batch_matches_per_sample():
    rng = np.random.default_rng(7)
    B, t_pad, vocab, s_pad = 3, 30, 8, 12
    lp = rng.normal(size=(B, t_pad, vocab)).astype(np.float32)
    tokens = rng.integers(0, vocab, size=(B, s_pad)).astype(np.int32)
    t_lens = np.array([30, 21, 11], np.int32)
    s_lens = np.array([12, 7, 3], np.int32)

    batch_paths = np.asarray(
        viterbi_pallas_batch(
            jnp.asarray(lp), jnp.asarray(tokens),
            jnp.asarray(t_lens), jnp.asarray(s_lens), interpret=INTERPRET,
        )
    )
    for b in range(B):
        ref = viterbi_numpy(lp[b, : t_lens[b]], tokens[b, : s_lens[b]])
        assert [s for s, _ in ref] == list(batch_paths[b, : t_lens[b]]), f"sample {b}"


def test_pallas_repeated_tokens_no_illegal_skip():
    tokens = np.array([0, 1, 0, 1, 0])
    rng = np.random.default_rng(3)
    lp = rng.normal(size=(12, 3)).astype(np.float32)
    assert viterbi_pallas_host(lp, tokens) == viterbi_numpy(lp, tokens)


@pytest.mark.parametrize("seed", range(4))
def test_hbm_kernel_matches_numpy(seed):
    """Long-form (HBM-streamed backpointer) kernel — same oracle contract."""
    from wav2vec2_tpu.ops.viterbi_pallas import viterbi_pallas_single_hbm

    rng = np.random.default_rng(200 + seed)
    t_len = int(rng.integers(3, 60))
    vocab = int(rng.integers(4, 12))
    s_len = int(rng.integers(1, min(2 * t_len, 24)))
    tokens = rng.integers(0, vocab, size=s_len)
    lp = rng.normal(size=(t_len, vocab)).astype(np.float32)
    path = viterbi_pallas_single_hbm(
        jnp.asarray(lp), jnp.asarray(tokens, jnp.int32),
        jnp.int32(t_len), jnp.int32(s_len), interpret=INTERPRET,
    )
    ref = viterbi_numpy(lp, tokens)
    assert [s for s, _ in ref] == list(np.asarray(path)[:t_len])


def test_hbm_kernel_padded_matches(seed=0):
    from wav2vec2_tpu.ops.viterbi_pallas import viterbi_pallas_single_hbm

    rng = np.random.default_rng(42)
    t_len, vocab, s_len = 23, 8, 9
    tokens = rng.integers(0, vocab, size=s_len)
    lp = rng.normal(size=(t_len, vocab)).astype(np.float32)
    t_pad = t_len + 10
    lp_padded = np.zeros((t_pad, vocab), np.float32)
    lp_padded[:t_len] = lp
    tok_padded = np.zeros(s_len + 5, np.int64)
    tok_padded[:s_len] = tokens
    path = viterbi_pallas_single_hbm(
        jnp.asarray(lp_padded), jnp.asarray(tok_padded, jnp.int32),
        jnp.int32(t_len), jnp.int32(s_len), interpret=INTERPRET,
    )
    ref = viterbi_numpy(lp, tokens)
    assert [s for s, _ in ref] == list(np.asarray(path)[:t_len])


def test_all_four_backends_agree_via_pipeline():
    """Pipeline-level equivalence of every SequenceAligner backend
    (numpy / scan / pallas / pallas-hbm) on the same forward output."""
    from wav2vec2_tpu.pipeline.defaults import ViterbiSequenceAligner
    from wav2vec2_tpu.pipeline.traits import ForwardOutput

    rng = np.random.default_rng(11)
    t_len, vocab, s_len = 40, 8, 15
    lp = rng.normal(size=(t_len, vocab)).astype(np.float32)
    tokens = list(rng.integers(0, vocab, size=s_len))
    fo = ForwardOutput(log_probs=lp, t_len=t_len, vocab_size=vocab)

    paths = {}
    for backend in ("numpy", "scan", "pallas", "pallas-hbm"):
        aligner = ViterbiSequenceAligner(force_backend=backend)
        paths[backend] = list(aligner.align_path(fo, tokens))
    ref = paths["numpy"]
    for name, p in paths.items():
        assert p == ref, name


def test_hbm_kernel_large_vocab_falls_back_to_pregathered():
    """Wide vocab + SHORT transcript: v_pad >= 2*s_pad means the
    pre-gathered [T, S] emission path wins HBM traffic (_use_onehot_gather
    dispatch); it must still produce oracle-identical output."""
    from wav2vec2_tpu.ops.viterbi_pallas import viterbi_pallas_single_hbm

    rng = np.random.default_rng(5)
    t_len, vocab, s_len = 48, 200, 17
    lp = rng.normal(size=(t_len, vocab)).astype(np.float32)
    tokens = np.asarray(rng.integers(0, vocab, size=s_len), np.int32)
    path = viterbi_pallas_single_hbm(
        jnp.asarray(lp), jnp.asarray(tokens),
        jnp.int32(t_len), jnp.int32(s_len), interpret=INTERPRET,
    )
    ref = viterbi_numpy(lp, tokens)
    assert [s for s, _ in ref] == list(np.asarray(path)[:t_len])


def test_hbm_gather_tier_phoneme_vocab():
    """vocab > 128 (phoneme-CTC scale, V=392 -> v_pad=512) keeps the
    in-kernel one-hot gather tier: the MXU contraction tiles over
    ceil(V/128)=4 lane chunks and stays bit-exact vs the oracle
    (VERDICT r3 item 5 — the halved-HBM path must not silently cap at 128
    symbols)."""
    from wav2vec2_tpu.ops.viterbi_pallas import (
        _use_onehot_gather,
        viterbi_pallas_single_hbm,
    )

    t_len, vocab, s_len = 168, 392, 301
    assert _use_onehot_gather(vocab, s_len)  # dispatch really takes gather
    rng = np.random.default_rng(17)
    lp = rng.normal(size=(t_len, vocab)).astype(np.float32)
    tokens = np.asarray(rng.integers(0, vocab, size=s_len), np.int32)
    path = viterbi_pallas_single_hbm(
        jnp.asarray(lp), jnp.asarray(tokens),
        jnp.int32(t_len), jnp.int32(s_len), interpret=INTERPRET,
    )
    ref = viterbi_numpy(lp, tokens)
    assert [s for s, _ in ref] == list(np.asarray(path)[:t_len])


def test_batch_hbm_gather_tier_phoneme_vocab(monkeypatch):
    """Grid-over-batch HBM tier with vocab > 128: the batched one-hot
    gather ([B, v_pad, s_pad] blocks) must match the per-sample oracle."""
    import wav2vec2_tpu.ops.viterbi_pallas as vp

    monkeypatch.setattr(vp, "VMEM_BUDGET_BYTES", 1)  # force the HBM tier
    b, t_len, vocab, s_len = 2, 72, 392, 261
    assert vp._use_onehot_gather(vocab, s_len)
    rng = np.random.default_rng(23)
    lp = rng.normal(size=(b, t_len, vocab)).astype(np.float32)
    tokens = np.stack([
        rng.integers(0, vocab, size=s_len).astype(np.int32) for _ in range(b)
    ])
    t_lens = np.asarray([t_len, t_len - 9], np.int32)
    s_lens = np.asarray([s_len, s_len - 24], np.int32)
    paths = vp.viterbi_pallas_batch(
        jnp.asarray(lp), jnp.asarray(tokens),
        jnp.asarray(t_lens), jnp.asarray(s_lens), interpret=INTERPRET,
    )
    for i in range(b):
        ref = viterbi_numpy(lp[i, :t_lens[i]], tokens[i, :s_lens[i]])
        assert [s for s, _ in ref] == list(np.asarray(paths)[i, :t_lens[i]])


def test_use_onehot_gather_dispatch_rule():
    """Traffic + VMEM-budget dispatch: char vocabs always gather; wide
    vocab with short transcripts pre-gathers; an s_pad so large the one-hot
    exceeds its VMEM budget pre-gathers."""
    from wav2vec2_tpu.ops.viterbi_pallas import _use_onehot_gather

    assert _use_onehot_gather(32, 5000)        # char-level CTC
    assert _use_onehot_gather(392, 301)        # phoneme CTC, 30 s window
    assert not _use_onehot_gather(392, 17)     # v_pad=512 >= 2*s_pad=256
    assert _use_onehot_gather(392, 8000)       # 512*8064*4 = 15.8 MB: fits
    # the hour × phoneme shape (T=180 000, S=12 599): one-hot 25.9 MB must
    # still dispatch to the gather tier — the pre-gathered alternative
    # needs ~9.1 GB emissions + 9.1 GB backpointers, which cannot fit HBM
    # (regression: reports/longform_phoneme_60min.json)
    assert _use_onehot_gather(397, 12599)
    assert not _use_onehot_gather(392, 21000)  # one-hot above 40 MB budget
