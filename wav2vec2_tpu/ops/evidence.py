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


@partial(jax.jit, static_argnames=())
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
