"""CTC fine-tuning: sharded train step (data-parallel × tensor-parallel).

The reference is inference-only; training is the natural TPU extension of
the same graph: wav2vec2 forward (bf16 compute) → f32 log-softmax →
optax.ctc_loss → AdamW, jitted over a ('data', 'model') mesh with
NamedShardings (parallel/mesh.py). XLA inserts the gradient all-reduce over
'data' and the TP collectives over 'model'; no hand-written communication.
`jax.checkpoint` on the encoder scan body trades FLOPs for HBM when
sequence/batch grow.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..config import Wav2Vec2ModelConfig
from ..models.ctc_model import (
    _freeze_cfg,
    frame_lengths,
    wav2vec2_forward,
)


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(
    learning_rate: float = 1e-4, weight_decay: float = 0.01
) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, weight_decay=weight_decay)


def ctc_loss_from_logits(
    logits: jnp.ndarray,
    t_lens: jnp.ndarray,
    labels: jnp.ndarray,
    label_lens: jnp.ndarray,
    blank_id: int,
) -> jnp.ndarray:
    """Mean CTC loss over the batch. logits [B, T, V] (f32),
    labels [B, L] vocab ids (NOT blank-interleaved)."""
    # raw logits go straight to optax.ctc_loss, which log-softmaxes
    # internally — normalizing here first is idempotent but pays an extra
    # [B, T, V] logsumexp pass in forward AND backward
    log_probs = logits.astype(jnp.float32)
    t_pad = logits.shape[1]
    l_pad = labels.shape[1]
    logit_paddings = (
        jnp.arange(t_pad)[None, :] >= t_lens[:, None]
    ).astype(jnp.float32)
    label_paddings = (
        jnp.arange(l_pad)[None, :] >= label_lens[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        log_probs, logit_paddings, labels, label_paddings, blank_id=blank_id
    )
    return jnp.mean(per_seq)


def make_train_step(
    model_cfg: Wav2Vec2ModelConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    compute_dtype=jnp.bfloat16,
):
    """Returns jitted step(state, audio, audio_lens, labels, label_lens) →
    (state, loss).

    Sharding contract (the idiomatic jax.sharding recipe): placements are
    carried by the INPUTS — put params on the mesh with
    parallel.mesh.shard_params (TP specs) and the batch with
    batch_sharding BEFORE calling; jit propagates the placements and XLA
    inserts the DP grad all-reduce + TP collectives. The `mesh` argument
    is accepted for call-site symmetry but places nothing itself."""
    cfg = _freeze_cfg(model_cfg)
    blank_id = model_cfg.pad_token_id

    def loss_fn(params, audio, audio_lens, labels, label_lens):
        logits = wav2vec2_forward(
            params, audio, cfg, audio_lens=audio_lens, compute_dtype=compute_dtype
        )
        t_lens = frame_lengths(cfg, audio_lens)
        return ctc_loss_from_logits(logits, t_lens, labels, label_lens, blank_id)

    def step(state: TrainState, audio, audio_lens, labels, label_lens):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, audio, audio_lens, labels, label_lens
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    # Sharding is carried by the INPUTS, the idiomatic jax.sharding recipe:
    # place params with parallel.mesh.shard_params (TP specs) and the batch
    # with batch_sharding before calling; jit propagates the placements and
    # XLA inserts the data-parallel grad all-reduce + TP collectives.
    return jax.jit(step)


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.int32(0))


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)
