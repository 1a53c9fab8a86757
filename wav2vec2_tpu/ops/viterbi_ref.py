"""Banded CTC Viterbi forced alignment — reference implementations.

Two implementations with identical output:

- `viterbi_numpy`: a scalar host oracle mirroring the reference CPU backend
  (/root/reference/src/alignment/viterbi.rs:50-156) cell for cell. Used as
  the correctness oracle in tests (the reference's own gpu_matches_cpu
  pattern, viterbi_gpu.rs:328-347).
- `viterbi_single` / `viterbi_batch`: vectorized `lax.scan` over time with
  the per-state wavefront mapped onto vector lanes — the XLA path. Supports
  padded (T_pad, S_pad) shapes with real (t_len, s_len) passed as scalars so
  it jits once per bucket and `vmap`s over the batch.

DP semantics (must be preserved bit-for-bit — SURVEY.md §7 "hard parts" #2):

- init (viterbi.rs:62-65): prev[0] = lp[0][tok[0]]; prev[1] = lp[0][tok[1]]
  if S > 1; all else -inf.
- reachability band (viterbi.rs:71-77): at time t, only states in
  [curr_start, curr_end] are computed, where
  curr_start = max(0, (S-2) - 2*(T-1-t)) and curr_end = min(2t+1, S-1).
- transitions (viterbi.rs:136-156): stay (step 0), s-1 (step 1), and s-2
  (step 2, only when tokens[s] != tokens[s-2]); candidates outside the
  previous band are skipped; strict `>` comparison means ties prefer
  stay > s-1 > s-2 in that order.
- final state (viterbi.rs:90-93): s = S-1 unless S >= 2 and
  prev[S-2] > prev[S-1] strictly, then S-2.
- backtrace (viterbi.rs:95-113): O(T) walk over stored 1-byte backpointers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float("-inf")


def viterbi_numpy(log_probs: np.ndarray, tokens: np.ndarray) -> list[tuple[int, int]]:
    """Scalar oracle. log_probs: [T, V] float32, tokens: [S] int.

    Returns the path as a list of (state, frame) pairs of length T
    (empty if T == 0 or S == 0)."""
    t_len = int(log_probs.shape[0]) if log_probs.ndim else 0
    s_len = int(len(tokens))
    if t_len == 0 or s_len == 0:
        return []

    lp = np.asarray(log_probs, dtype=np.float32)
    tok = [int(t) for t in tokens]

    prev = np.full(s_len, NEG_INF, dtype=np.float32)
    curr = np.full(s_len, NEG_INF, dtype=np.float32)
    bp = np.zeros((t_len, s_len), dtype=np.uint8)

    prev[0] = lp[0, tok[0]]
    if s_len > 1:
        prev[1] = lp[0, tok[1]]

    prev_start, prev_end = 0, (1 if s_len > 1 else 0)
    final_floor_state = max(s_len - 2, 0)

    for t in range(1, t_len):
        remaining = t_len - 1 - t
        curr_start = max(final_floor_state - 2 * remaining, 0)
        curr_end = min(2 * t + 1, s_len - 1)
        for s in range(curr_start, curr_end + 1):
            emit = lp[t, tok[s]]
            best = np.float32(NEG_INF)
            step = 0
            if prev_start <= s <= prev_end and prev[s] > best:
                best, step = prev[s], 0
            if s >= 1 and prev_start <= s - 1 <= prev_end and prev[s - 1] > best:
                best, step = prev[s - 1], 1
            if (
                s >= 2
                and tok[s] != tok[s - 2]
                and prev_start <= s - 2 <= prev_end
                and prev[s - 2] > best
            ):
                best, step = prev[s - 2], 2
            curr[s] = best + emit
            bp[t, s] = step
        prev, curr = curr, prev
        prev_start, prev_end = curr_start, curr_end

    s = s_len - 1
    if s_len >= 2 and prev[s_len - 2] > prev[s_len - 1]:
        s = s_len - 2

    path = [(s, t_len - 1)]
    for t in range(t_len - 1, 0, -1):
        step = int(bp[t, s])
        if step == 1:
            s -= 1
        elif step == 2:
            s -= 2
        path.append((s, t - 1))
    path.reverse()
    return path


def _shift_down(row: jnp.ndarray, k: int) -> jnp.ndarray:
    """row[s] -> row[s-k], with -inf entering at the bottom."""
    s_idx = jax.lax.broadcasted_iota(jnp.int32, row.shape, 0)
    return jnp.where(s_idx >= k, jnp.roll(row, k), -jnp.inf)


def viterbi_single(
    log_probs: jnp.ndarray,
    tokens: jnp.ndarray,
    t_len: jnp.ndarray,
    s_len: jnp.ndarray,
) -> jnp.ndarray:
    """Vectorized banded Viterbi over padded shapes.

    log_probs: [T_pad, V] float32 (already log-softmaxed)
    tokens:    [S_pad] int32 (padded arbitrarily past s_len)
    t_len, s_len: scalars (actual sizes; traced values, static shapes)

    Returns path: [T_pad] int32 — state index per frame. Frames >= t_len
    hold the final state (pad frames backtrack through "stay" pointers);
    callers slice [:t_len].
    """
    t_pad, _ = log_probs.shape
    s_pad = tokens.shape[0]
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (s_pad,), 0)
    neg = jnp.float32(-jnp.inf)

    emit0 = log_probs[0, tokens]
    prev0 = jnp.where(s_idx == 0, emit0, neg)
    prev0 = jnp.where((s_idx == 1) & (s_len > 1), emit0, prev0)

    final_floor = jnp.maximum(s_len - 2, 0)
    # tokens[s] != tokens[s-2]; rows s<2 never use this (cand2 masked there)
    tok_neq2 = tokens != jnp.roll(tokens, 2)

    def step(prev, t):
        remaining = t_len - 1 - t
        curr_start = jnp.maximum(final_floor - 2 * remaining, 0)
        curr_end = jnp.minimum(2 * t + 1, s_len - 1)
        emit = log_probs[t, tokens]

        cand1 = _shift_down(prev, 1)
        cand2 = jnp.where(tok_neq2, _shift_down(prev, 2), neg)
        # strict > replication of best_transition tie-breaking
        best = prev
        step_sel = jnp.zeros((s_pad,), dtype=jnp.int32)
        m1 = cand1 > best
        best = jnp.where(m1, cand1, best)
        step_sel = jnp.where(m1, 1, step_sel)
        m2 = cand2 > best
        best = jnp.where(m2, cand2, best)
        step_sel = jnp.where(m2, 2, step_sel)

        in_band = (s_idx >= curr_start) & (s_idx <= curr_end)
        curr = jnp.where(in_band, best + emit, neg)
        bp_row = jnp.where(in_band, step_sel, 0)

        active = t < t_len
        curr = jnp.where(active, curr, prev)
        bp_row = jnp.where(active, bp_row, 0)
        return curr, bp_row

    ts = jnp.arange(1, t_pad, dtype=jnp.int32)
    last, bp = jax.lax.scan(step, prev0, ts)  # bp: [T_pad-1, S_pad]

    idx_last = jnp.maximum(s_len - 1, 0)
    idx_prev = jnp.maximum(s_len - 2, 0)
    final_s = jnp.where(
        (s_len >= 2) & (last[idx_prev] > last[idx_last]), idx_prev, idx_last
    ).astype(jnp.int32)

    def back_step(s, bp_row):
        s_prev = s - bp_row[s]
        return s_prev, s_prev

    _, path_head = jax.lax.scan(back_step, final_s, bp, reverse=True)
    return jnp.concatenate([path_head, final_s[None]])


viterbi_batch = jax.vmap(viterbi_single, in_axes=(0, 0, 0, 0))


def viterbi_jnp_host(log_probs: np.ndarray, tokens: np.ndarray) -> list[tuple[int, int]]:
    """Convenience host wrapper over viterbi_single for a single utterance
    (no padding). Returns (state, frame) pairs like viterbi_numpy."""
    t_len = int(log_probs.shape[0])
    s_len = int(len(tokens))
    if t_len == 0 or s_len == 0:
        return []
    path = viterbi_single(
        jnp.asarray(log_probs, dtype=jnp.float32),
        jnp.asarray(tokens, dtype=jnp.int32),
        jnp.int32(t_len),
        jnp.int32(s_len),
    )
    states = np.asarray(jax.device_get(path))
    return [(int(s), t) for t, s in enumerate(states[:t_len])]
