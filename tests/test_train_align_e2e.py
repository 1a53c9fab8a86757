"""End-to-end train→align validation on synthetic audio with known
ground-truth boundaries: fine-tune the tiny model with the CTC train step,
then check the aligner recovers every word in order and boundaries correlate
with the truth.

This is the only quality validation possible without pretrained checkpoints
(zero-egress environment). Gated behind RUN_SLOW_TESTS=1 (~4 min on CPU);
the fast suites cover each stage's correctness separately.
"""

import os

import numpy as np
import pytest

if os.environ.get("RUN_SLOW_TESTS") != "1":
    pytest.skip("set RUN_SLOW_TESTS=1 to run the train→align e2e test",
                allow_module_level=True)

SR = 16000
CHAR_N = 1600  # 100 ms per synthetic "phoneme"
N_PAD = 24000
TONES = {1: 440.0, 2: 880.0, 4: 1320.0, 5: 1760.0}


def synth(label_seq, rng):
    wav, bounds, t = [], [], 0
    for word in label_seq:
        start = t
        for lid in word:
            seg = (
                0.3 * np.sin(2 * np.pi * TONES[lid] * np.arange(CHAR_N) / SR)
                + rng.normal(size=CHAR_N) * 0.01
            )
            wav.append(seg)
            t += CHAR_N
        bounds.append((start, t))
        sil = int(rng.integers(800, 2400))
        wav.append(rng.normal(size=sil) * 0.01)
        t += sil
    x = np.concatenate(wav).astype(np.float32)
    return x[:N_PAD], [(a, b) for a, b in bounds if b <= N_PAD]


@pytest.fixture(scope="module")
def trained():
    """Train the tiny CTC model once; shared by the align-recovery and
    long-form stitch-error tests."""
    import jax
    import jax.numpy as jnp

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = Wav2Vec2ModelConfig(
        hidden_size=48, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=96, conv_dim=[24, 24], conv_kernel=[10, 4],
        conv_stride=[5, 4], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    rng = np.random.default_rng(0)

    def sample():
        return [
            list(rng.choice([1, 2, 4, 5], size=int(rng.integers(2, 4))))
            for _ in range(int(rng.integers(2, 4)))
        ]

    def make_batch(bs):
        audio = np.zeros((bs, N_PAD), np.float32)
        a_l = np.zeros(bs, np.int32)
        labels = np.zeros((bs, 16), np.int32)
        l_l = np.zeros(bs, np.int32)
        metas = []
        for i in range(bs):
            s = sample()
            w, b = synth(s, rng)
            audio[i, : len(w)] = w / max(w.std(), 1e-6)
            a_l[i] = len(w)
            flat = [lid for word in s for lid in (word + [3])][:-1][:16]
            labels[i, : len(flat)] = flat
            l_l[i] = len(flat)
            metas.append((s, b))
        return (audio, a_l, labels, l_l), metas

    params = init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(learning_rate=2e-3)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    first_loss = None
    for _ in range(120):
        batch, _ = make_batch(8)
        state, loss = step(state, *map(jnp.asarray, batch))
        if first_loss is None:
            first_loss = float(loss)
    assert float(loss) < first_loss / 5, "CTC training failed to converge"
    return cfg, state.params, rng, sample, make_batch


def test_train_then_align_recovers_ground_truth(trained):
    from wav2vec2_tpu.parallel.batching import BatchAligner

    cfg, trained_params, rng, sample, make_batch = trained
    id2ch = {1: "a", 2: "b", 4: "c", 5: "d"}
    vocab = {"a": 1, "b": 2, "|": 3, "c": 4, "d": 5}
    aligner = BatchAligner(
        cfg, trained_params, vocab, compute_dtype="float32", use_pallas=False
    )
    errs = []
    for _ in range(5):
        (audio, a_l, _, _), metas = make_batch(1)
        s, bounds = metas[0]
        transcript = " ".join("".join(id2ch[l] for l in word) for word in s)
        out = aligner.align_utterances(
            [audio[0, : a_l[0]]], [transcript],
            audio_multiple=N_PAD, token_multiple=16,
        )[0]
        # every word recovered, in order
        assert [w.word for w in out.words] == transcript.split()
        for w, (s0, s1) in zip(out.words, bounds):
            errs.append(abs(w.start_ms - s0 / 16))
            errs.append(abs(w.end_ms - s1 / 16))
    median = float(np.median(errs))
    # an undertrained CTC model is not frame-sharp; the bar here is "clearly
    # correlated boundaries", the per-ms parity bars live in compare_textgrids
    assert median < 300.0, f"median boundary error {median} ms"

