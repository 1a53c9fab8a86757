"""Acoustic model runtime backends.

The reference has two runtimes (Candle + ONNX Runtime,
/root/reference/src/pipeline/model_runtime.rs) and a zero-copy CUDA bridge;
here one XLA-compiled backend covers all of it (SURVEY.md §7): safetensors
weights load straight into the JAX pytree, the forward+log-softmax runs as
one jitted graph on the TPU, and the log-probs stay device-resident for the
Viterbi kernel — the generalization of the reference's ONNX-CUDA zero-copy
path (model_runtime.rs:508-541).

Audio is padded to a bucket multiple so XLA compiles once per bucket instead
of once per utterance length; padding is exact (masked GroupNorm + masked
attention), so padded results equal unpadded ones.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from ..config import Wav2Vec2Config, Wav2Vec2ModelConfig
from ..errors import RuntimeBackendError
from .traits import ForwardOutput

DEFAULT_PAD_MULTIPLE = 4000  # 0.25 s at 16 kHz


class JaxRuntimeBackend:
    """XLA-compiled wav2vec2 forward (replaces CandleRuntimeBackend +
    OnnxRuntimeBackend, model_runtime.rs:46-339)."""

    def __init__(
        self,
        model_cfg: Wav2Vec2ModelConfig,
        params: dict,
        compute_dtype: str = "float32",
        pad_multiple: int = DEFAULT_PAD_MULTIPLE,
    ):
        import jax
        import jax.numpy as jnp

        from ..models.ctc_model import log_softmax_logits, make_forward_fn

        if compute_dtype not in ("float32", "bfloat16"):
            # same contract as the reference's f32/f16-only gate
            # (model_runtime.rs:120-129)
            raise RuntimeBackendError(
                "load model", f"unsupported compute dtype {compute_dtype!r}"
            )
        self.model_cfg = model_cfg
        self.params = params
        self.compute_dtype = compute_dtype
        self.pad_multiple = int(pad_multiple)
        self._jnp = jnp
        self._jax = jax
        dtype = jnp.float32 if compute_dtype == "float32" else jnp.bfloat16
        self._forward = make_forward_fn(model_cfg, compute_dtype=dtype)
        self._log_softmax = jax.jit(log_softmax_logits)
        self._last = None

    @classmethod
    def from_config(cls, config: Wav2Vec2Config, model_cfg: Wav2Vec2ModelConfig, **kw):
        from ..models.params import load_safetensors_params

        path = Path(config.model_path)
        if not path.exists():
            raise RuntimeBackendError("load model", f"weights not found: {path}")
        dtype = model_cfg.dtype or "float32"
        if dtype in ("float16", "f16", "bf16"):
            dtype = "bfloat16"
        params = load_safetensors_params(path, model_cfg)
        return cls(model_cfg, params, compute_dtype=kw.pop("compute_dtype", dtype), **kw)

    # -- RuntimeBackend protocol --

    def infer(self, normalized: np.ndarray) -> ForwardOutput:
        jnp = self._jnp
        n = int(np.shape(normalized)[-1])
        n_pad = -(-n // self.pad_multiple) * self.pad_multiple
        audio = jnp.zeros((1, n_pad), jnp.float32)
        audio = audio.at[0, :n].set(jnp.asarray(normalized, dtype=jnp.float32))
        logits = self._forward(self.params, audio, jnp.asarray([n], jnp.int32))
        log_probs = self._log_softmax(logits)[0]  # [T_pad, V] device
        self._last = log_probs
        t_len = self.model_cfg.conv_output_length(n)
        return ForwardOutput(
            log_probs=log_probs,
            t_len=t_len,
            vocab_size=self.model_cfg.vocab_size,
            dtype=self.compute_dtype,
        )

    def infer_profiled(self, normalized: np.ndarray) -> ForwardOutput:
        jnp = self._jnp
        n = int(np.shape(normalized)[-1])
        n_pad = -(-n // self.pad_multiple) * self.pad_multiple
        audio = jnp.zeros((1, n_pad), jnp.float32)
        audio = audio.at[0, :n].set(jnp.asarray(normalized, dtype=jnp.float32))
        audio.block_until_ready()

        t0 = time.perf_counter()
        logits = self._forward(self.params, audio, jnp.asarray([n], jnp.int32))
        logits.block_until_ready()
        forward_ms = (time.perf_counter() - t0) * 1000.0

        t0 = time.perf_counter()
        log_probs = self._log_softmax(logits)[0]
        log_probs.block_until_ready()
        post_ms = (time.perf_counter() - t0) * 1000.0

        self._last = log_probs
        t_len = self.model_cfg.conv_output_length(n)
        return ForwardOutput(
            log_probs=log_probs,
            t_len=t_len,
            vocab_size=self.model_cfg.vocab_size,
            dtype=self.compute_dtype,
            forward_ms=forward_ms,
            post_ms=post_ms,
        )

    def synchronize(self) -> None:
        if self._last is not None:
            self._last.block_until_ready()

    def device_label(self) -> str:
        d = self._jax.devices()[0]
        return f"{d.platform}:{d.device_kind}"


def build_runtime_backend(
    config: Wav2Vec2Config, model_cfg: Wav2Vec2ModelConfig, **kw
) -> JaxRuntimeBackend:
    """Runtime factory (model_runtime.rs:15-24 analog; RuntimeKind collapsed
    to the single XLA backend)."""
    return JaxRuntimeBackend.from_config(config, model_cfg, **kw)
