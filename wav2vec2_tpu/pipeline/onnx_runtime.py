"""Optional ONNX Runtime backend.

Parity with the reference's second model runtime
(/root/reference/src/pipeline/model_runtime.rs:198-655 OnnxRuntimeBackend):
consumes the ONNX files its exporter produces (the reference's
scripts/export_ctc_model_to_onnx.py), input `[1, num_samples]` f32, output
`[1, T, V]` or `[T, V]` logits (batch must be 1), precision-aware extraction
(f16/bf16/f64 converted to f32), then row-wise max-shift log-softmax with
f64 accumulation on host (model_runtime.rs:640-655).

The XLA backend is the primary runtime on TPU; this backend exists for
environments serving exported ONNX graphs on CPU/GPU through onnxruntime.
Gated import: a clear RuntimeBackendError when onnxruntime is absent (the
reference's "onnx feature disabled ⇒ runtime error" behavior,
model_runtime.rs:15-44).
"""

from __future__ import annotations

import threading
import time
from pathlib import Path

import numpy as np

from ..config import Wav2Vec2ModelConfig
from ..errors import RuntimeBackendError
from .traits import ForwardOutput


def parse_onnx_output_shape(shape: tuple[int, ...]) -> tuple[int, int]:
    """Accepts [1, T, V] or [T, V]; batch must be 1
    (model_runtime.rs:586-618)."""
    if len(shape) == 3:
        if shape[0] != 1:
            raise RuntimeBackendError(
                "onnx output", f"batch dimension must be 1, got {shape[0]}"
            )
        return int(shape[1]), int(shape[2])
    if len(shape) == 2:
        return int(shape[0]), int(shape[1])
    raise RuntimeBackendError("onnx output", f"unexpected logits shape {shape}")


def raw_logits_to_log_probs(logits: np.ndarray) -> np.ndarray:
    """Row-wise max-shift log-softmax with f64 accumulation
    (model_runtime.rs:640-655)."""
    x = np.asarray(logits, dtype=np.float64)
    m = x.max(axis=-1, keepdims=True)
    shifted = x - m
    logsum = np.log(np.exp(shifted).sum(axis=-1, keepdims=True))
    return (shifted - logsum).astype(np.float32)


class OnnxRuntimeBackend:
    """RuntimeBackend over an onnxruntime InferenceSession (held behind a
    lock like the reference's Mutex, model_runtime.rs:200-202)."""

    def __init__(self, model_path: str | Path, model_cfg: Wav2Vec2ModelConfig,
                 providers: list[str] | None = None):
        try:
            import onnxruntime as ort
        except ImportError as e:
            raise RuntimeBackendError(
                "onnx runtime",
                "onnxruntime is not installed; install it or use the default "
                "XLA backend (JaxRuntimeBackend)",
            ) from e
        if not Path(model_path).exists():
            raise RuntimeBackendError("onnx runtime", f"model not found: {model_path}")
        self.model_cfg = model_cfg
        self._lock = threading.Lock()
        self._session = ort.InferenceSession(
            str(model_path),
            providers=providers or ["CPUExecutionProvider"],
        )
        self._input_name = self._session.get_inputs()[0].name
        self._last_forward_ms = 0.0

    def infer(self, normalized: np.ndarray) -> ForwardOutput:
        audio = np.asarray(normalized, dtype=np.float32)[None, :]
        t0 = time.perf_counter()
        with self._lock:
            (logits,) = self._session.run(None, {self._input_name: audio})
        forward_ms = (time.perf_counter() - t0) * 1000.0

        t_len, vocab = parse_onnx_output_shape(np.shape(logits))
        logits2d = np.asarray(logits, dtype=np.float32).reshape(t_len, vocab)
        t0 = time.perf_counter()
        log_probs = raw_logits_to_log_probs(logits2d)
        post_ms = (time.perf_counter() - t0) * 1000.0
        return ForwardOutput(
            log_probs=log_probs, t_len=t_len, vocab_size=vocab,
            dtype="float32", forward_ms=forward_ms, post_ms=post_ms,
        )

    def infer_profiled(self, normalized: np.ndarray) -> ForwardOutput:
        return self.infer(normalized)

    def synchronize(self) -> None:
        pass  # onnxruntime.run is synchronous

    def device_label(self) -> str:
        providers = self._session.get_providers()
        return f"onnx:{providers[0] if providers else 'unknown'}"
