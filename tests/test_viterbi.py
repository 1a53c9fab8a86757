"""Viterbi DP tests.

Mirrors the reference's CPU Viterbi unit tests
(/root/reference/src/alignment/viterbi.rs:158-280) plus the backend
equivalence discipline (gpu_matches_cpu, viterbi_gpu.rs:328-347): the
vectorized lax.scan implementation must produce bit-identical paths to the
scalar numpy oracle, including on padded shapes.
"""

import numpy as np
import pytest

from wav2vec2_tpu.ops.viterbi_ref import (
    viterbi_jnp_host,
    viterbi_numpy,
    viterbi_single,
)


def make_log_probs(t_len, vocab_size, path, tokens, low=-10.0, high=0.0):
    lp = np.full((t_len, vocab_size), low, dtype=np.float32)
    for s, t in path:
        if t < t_len and s < len(tokens):
            tid = tokens[s]
            if tid < vocab_size:
                lp[t, tid] = high
    return lp


def test_empty_log_probs_returns_empty_path():
    assert viterbi_numpy(np.zeros((0, 4), np.float32), np.array([0])) == []
    assert viterbi_jnp_host(np.zeros((0, 4), np.float32), np.array([0])) == []


def test_empty_tokens_returns_empty_path():
    lp = np.zeros((1, 4), np.float32)
    assert viterbi_numpy(lp, np.array([], np.int32)) == []
    assert viterbi_jnp_host(lp, np.array([], np.int32)) == []


def test_single_frame_single_token():
    lp = np.array([[0.0, -10.0, -10.0]], np.float32)
    path = viterbi_numpy(lp, [0])
    assert path == [(0, 0)]


def test_two_frames_two_tokens_straight_path():
    lp = np.array([[0.0, -10.0, -10.0], [-10.0, 0.0, -10.0]], np.float32)
    path = viterbi_numpy(lp, [0, 1])
    assert path == [(0, 0), (1, 1)]


def test_s_len_one():
    tokens = [0]
    lp = make_log_probs(4, 4, [(0, 0), (0, 1), (0, 2), (0, 3)], tokens)
    path = viterbi_numpy(lp, tokens)
    assert path == [(0, t) for t in range(4)]


def test_backtrack_step_two():
    tokens = [0, 1, 2]
    lp = np.array(
        [[0.0, -10.0, -10.0], [0.0, -10.0, -10.0], [-10.0, -10.0, 0.0]],
        np.float32,
    )
    path = viterbi_numpy(lp, tokens)
    assert path == [(0, 0), (0, 1), (2, 2)]


def test_final_state_prefer_s_len_minus_2():
    # reference viterbi.rs:254-270 — last state prefers S-2 when strictly better
    tokens = [0, 1, 2]
    lp = np.array(
        [
            [0.0, -10.0, -10.0],
            [-10.0, 0.0, -10.0],
            [-10.0, 0.0, -10.0],
            [-100.0, 0.0, -100.0],
        ],
        np.float32,
    )
    path = viterbi_numpy(lp, tokens)
    assert len(path) == 4
    assert path[3] == (1, 3)


def test_repeated_tokens_no_skip():
    # tokens[s] == tokens[s-2] must block the skip transition
    tokens = [0, 1, 0, 1, 0]  # blank-interleaved 'aa' style: skip s-2 illegal
    rng = np.random.default_rng(0)
    lp = rng.normal(size=(8, 3)).astype(np.float32)
    path_np = viterbi_numpy(lp, tokens)
    # monotone, steps in {0,1,2}, never skipping over equal tokens
    for (s0, _), (s1, _) in zip(path_np, path_np[1:]):
        assert s1 - s0 in (0, 1, 2)
        if s1 - s0 == 2:
            assert tokens[s1] != tokens[s1 - 2]


@pytest.mark.parametrize("seed", range(8))
def test_jnp_matches_numpy_random(seed):
    rng = np.random.default_rng(seed)
    t_len = int(rng.integers(3, 40))
    vocab = int(rng.integers(4, 12))
    s_len = int(rng.integers(1, min(2 * t_len, 20)))
    tokens = rng.integers(0, vocab, size=s_len)
    lp = rng.normal(size=(t_len, vocab)).astype(np.float32)
    path_np = viterbi_numpy(lp, tokens)
    path_jnp = viterbi_jnp_host(lp, tokens)
    assert path_np == path_jnp


@pytest.mark.parametrize("seed", range(4))
def test_jnp_padded_matches_unpadded(seed):
    """Padding T and S must not perturb the path (SURVEY §7 hard part #1)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(100 + seed)
    t_len = int(rng.integers(5, 30))
    vocab = 8
    s_len = int(rng.integers(2, min(2 * t_len, 15)))
    tokens = rng.integers(0, vocab, size=s_len)
    lp = rng.normal(size=(t_len, vocab)).astype(np.float32)

    t_pad, s_pad = t_len + 13, s_len + 7
    lp_padded = np.zeros((t_pad, vocab), np.float32)
    lp_padded[:t_len] = lp
    tok_padded = np.zeros(s_pad, np.int64)
    tok_padded[:s_len] = tokens

    path_ref = viterbi_numpy(lp, tokens)
    path_pad = viterbi_single(
        jnp.asarray(lp_padded),
        jnp.asarray(tok_padded, dtype=jnp.int32),
        jnp.int32(t_len),
        jnp.int32(s_len),
    )
    path_pad = np.asarray(path_pad)[:t_len]
    assert [s for s, _ in path_ref] == list(path_pad)


def test_one_hot_forced_path_recovered():
    """A deliberately planted monotone path is recovered exactly."""
    tokens = [0, 3, 0, 5, 0, 4, 0]  # blank c1 blank c2 blank c3 blank
    planted = [(0, 0), (1, 1), (1, 2), (2, 3), (3, 4), (3, 5), (5, 6), (6, 7)]
    lp = make_log_probs(8, 8, planted, tokens)
    path = viterbi_numpy(lp, tokens)
    assert path == planted
    assert viterbi_jnp_host(lp, tokens) == planted
