"""On-device per-frame evidence extraction.

The reference copies the full [T, V] log-prob matrix to host for grouping
(cuda_forward.rs:50-69 D2H). Here the three per-frame reductions grouping
actually needs (SURVEY.md §3.2 note) are computed next to the log-softmax on
device, so the host transfer is 4 T-length vectors (path, emission log-prob,
top-2 margin, blank prob) instead of T×V:

    emit_lp[t]    = log_probs[t, tokens[path[t]]]
    margin[t]     = top1 - top2 of log_probs[t, :]  (0 if non-finite)
    blank_prob[t] = exp(log_probs[t, blank_id])     (f32 exp, matching
                    blank_prob_at_frame candidate_selector.rs:236-240)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..align.grouping.path_to_words import FrameEvidence


@jax.jit
def _evidence_kernel(log_probs, tokens, path, blank_id):
    t_pad = log_probs.shape[0]
    emit_lp = log_probs[jnp.arange(t_pad), tokens[path]]
    top2, _ = jax.lax.top_k(log_probs, 2)
    margin = jnp.where(
        jnp.isfinite(top2).all(axis=1), top2[:, 0] - top2[:, 1], jnp.float32(0.0)
    )
    blank_prob = jnp.exp(log_probs[:, blank_id])
    # per-frame token entropy (nats) — feeds the report's token_entropy_mean,
    # a field the reference declares but never fills (report.rs blank/entropy
    # placeholders)
    probs = jnp.exp(log_probs)
    entropy = -jnp.sum(probs * log_probs, axis=1)
    return emit_lp, margin, blank_prob, entropy


@partial(jax.jit, static_argnames=("backend", "interpret"))
def _fused_dp_evidence_kernel(log_probs, tokens, t_len, s_len, blank_id,
                              backend, interpret):
    """Viterbi DP + evidence extraction in ONE jitted graph — the
    single-utterance latency path: one dispatch + one fetch instead of two
    synced stages (each stage boundary costs a host round-trip; ~30 ms each
    through this machine's TPU tunnel)."""
    if backend == "pallas":
        from .viterbi_pallas import viterbi_pallas_single

        path = viterbi_pallas_single(log_probs, tokens, t_len, s_len,
                                     interpret=interpret)
    elif backend == "pallas-hbm":
        from .viterbi_pallas import viterbi_pallas_single_hbm

        path = viterbi_pallas_single_hbm(log_probs, tokens, t_len, s_len,
                                         interpret=interpret)
    else:
        from .viterbi_ref import viterbi_single

        path = viterbi_single(log_probs, tokens, t_len, s_len)
    emit_lp, margin, blank_prob, entropy = _evidence_kernel(
        log_probs, tokens, path, blank_id
    )
    return path, emit_lp, margin, blank_prob, entropy


def fused_path_evidence(
    log_probs: jnp.ndarray,
    tokens: jnp.ndarray,
    t_len: int,
    s_len: int,
    blank_id: int,
    backend: str,
    interpret: bool = False,
) -> tuple[np.ndarray, FrameEvidence]:
    """One device round-trip: (path [t_len], FrameEvidence)."""
    path, emit_lp, margin, blank_prob, entropy = jax.device_get(
        _fused_dp_evidence_kernel(
            log_probs, tokens, jnp.int32(t_len), jnp.int32(s_len),
            jnp.int32(blank_id), backend, interpret,
        )
    )
    return path[:t_len], FrameEvidence(
        emit_lp=emit_lp[:t_len],
        margin=margin[:t_len],
        blank_prob=blank_prob[:t_len].astype(np.float64),
        entropy=entropy[:t_len],
    )


def compute_frame_evidence_device(
    log_probs: jnp.ndarray,
    tokens: jnp.ndarray,
    path: jnp.ndarray,
    blank_id: int,
    t_len: int,
) -> FrameEvidence:
    """log_probs [T_pad, V] (device), tokens [S_pad] int32, path [T_pad]
    int32 → host FrameEvidence sliced to t_len."""
    # single device_get: one host round-trip for all four vectors
    emit_lp, margin, blank_prob, entropy = jax.device_get(
        _evidence_kernel(log_probs, tokens, path, jnp.int32(blank_id))
    )
    return FrameEvidence(
        emit_lp=emit_lp[:t_len],
        margin=margin[:t_len],
        blank_prob=blank_prob[:t_len].astype(np.float64),
        entropy=entropy[:t_len],
    )
