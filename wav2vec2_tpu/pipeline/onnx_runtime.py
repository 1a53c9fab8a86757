"""Optional ONNX Runtime backend.

Parity with the reference's second model runtime
(/root/reference/src/pipeline/model_runtime.rs:198-655 OnnxRuntimeBackend):
consumes the ONNX files its exporter produces (the reference's
scripts/export_ctc_model_to_onnx.py), input `[1, num_samples]` f32, output
`[1, T, V]` or `[T, V]` logits (batch must be 1), precision-aware extraction
(f16/bf16/f64 converted to f32, model_runtime.rs:350-470), then row-wise
max-shift log-softmax with f64 accumulation on host (:640-655). The
execution-provider chain mirrors onnx_execution_providers (:490-506):
"cpu" -> CPU only, "cuda" -> CUDA with CPU fallback.

The XLA backend is the primary runtime on TPU; this backend exists for
environments serving exported ONNX graphs on CPU/GPU through onnxruntime.
When onnxruntime is absent the session falls back to the in-repo numpy
evaluator (onnx/reference_runtime.py) so the path still executes;
`allow_embedded=False` restores the reference's "onnx feature disabled ⇒
runtime error" behavior (model_runtime.rs:15-44).
"""

from __future__ import annotations

import logging
import threading
import time
from pathlib import Path

import numpy as np

from ..config import Wav2Vec2ModelConfig
from ..errors import RuntimeBackendError
from .traits import ForwardOutput

logger = logging.getLogger(__name__)

_PRECISION_LABELS = {
    "float16": "f16", "f16": "f16", "fp16": "f16", "half": "f16",
    "bfloat16": "bf16", "bf16": "bf16",
    "float32": "f32", "f32": "f32", "fp32": "f32", "float": "f32",
    "float64": "f64", "f64": "f64", "fp64": "f64", "double": "f64",
}


def normalize_precision_label(dtype: str) -> str:
    """Trim/lowercase/strip separators (model_runtime.rs
    normalize_precision_label)."""
    return dtype.strip().lower().replace("-", "").replace("_", "")


def precision_from_config(dtype: str | None) -> str | None:
    """Config `dtype` → canonical label, or None when unspecified
    (OnnxTensorPrecision::from_config, model_runtime.rs:358-375)."""
    if dtype is None:
        return None
    label = _PRECISION_LABELS.get(normalize_precision_label(dtype))
    if label is None:
        raise RuntimeBackendError(
            "onnx precision",
            f"unsupported ONNX model dtype '{dtype}', expected f32, f16, "
            f"bf16, or f64",
        )
    return label


def extract_raw_logits_f32(logits) -> tuple[np.ndarray, str]:
    """ONNX output tensor → (float32 array, precision label).

    Mirrors extract_onnx_raw_logits + the f16/bf16/f64→f32 converters
    (model_runtime.rs:408-487). bfloat16 outputs arrive as ml_dtypes.bfloat16
    arrays (onnxruntime's numpy binding) — converted via f32 cast."""
    arr = np.asarray(logits)
    if arr.dtype == np.float32:
        return arr, "f32"
    if arr.dtype == np.float16:
        return arr.astype(np.float32), "f16"
    if arr.dtype == np.float64:
        return arr.astype(np.float32), "f64"
    try:
        import ml_dtypes

        if arr.dtype == ml_dtypes.bfloat16:
            return arr.astype(np.float32), "bf16"
    except ImportError:
        pass
    raise RuntimeBackendError(
        "onnx extract logits",
        f"unsupported ONNX logits dtype '{arr.dtype}', expected f32, f16, "
        f"bf16, or f64",
    )


def execution_providers(device: str) -> list[str]:
    """EP chain with fallback (onnx_execution_providers,
    model_runtime.rs:490-506): cpu → CPU; cuda → CUDA then CPU."""
    dev = device.strip().lower()
    if dev == "cpu":
        return ["CPUExecutionProvider"]
    if dev == "cuda":
        return ["CUDAExecutionProvider", "CPUExecutionProvider"]
    raise RuntimeBackendError(
        "onnx device", f"unsupported ONNX device '{device}', expected 'cpu' or 'cuda'"
    )


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
                 device: str = "cpu", providers: list[str] | None = None,
                 allow_embedded: bool = True):
        if not Path(model_path).exists():
            raise RuntimeBackendError("onnx runtime", f"model not found: {model_path}")
        self.model_cfg = model_cfg
        self.configured_precision = precision_from_config(
            getattr(model_cfg, "dtype", None)
        )
        self._device = device
        self._lock = threading.Lock()
        try:
            import onnxruntime as ort
        except ImportError as e:
            # last link in the EP fallback chain: the in-repo numpy
            # evaluator (onnx/reference_runtime.py) executes exported
            # graphs wherever onnxruntime is absent — the second runtime
            # always infers instead of erroring out
            if not allow_embedded:
                raise RuntimeBackendError(
                    "onnx runtime",
                    "onnxruntime is not installed; install it or use the "
                    "default XLA backend (JaxRuntimeBackend)",
                ) from e
            execution_providers(device)  # validate the device label
            from ..onnx.reference_runtime import EmbeddedOnnxSession

            try:
                self._session = EmbeddedOnnxSession(model_path)
            except Exception as emb_err:
                raise RuntimeBackendError(
                    "onnx runtime",
                    f"onnxruntime is not installed and the embedded "
                    f"evaluator cannot run this model: {emb_err}",
                ) from emb_err
            logger.info(
                "onnxruntime not installed; using the embedded numpy "
                "evaluator (CPU, correctness-grade throughput)"
            )
        else:
            self._session = ort.InferenceSession(
                str(model_path),
                providers=providers if providers is not None
                else execution_providers(device),
            )
        self._input_name = self._session.get_inputs()[0].name
        self._warned_precision_mismatch = False
        logger.info(
            "wav2vec2 ONNX runtime loaded: model=%s device=%s providers=%s "
            "configured_precision=%s",
            model_path, device, self._session.get_providers(),
            self.configured_precision or "unspecified",
        )

    def _run(self, normalized: np.ndarray, profiled: bool) -> ForwardOutput:
        audio = np.asarray(normalized, dtype=np.float32)[None, :]
        t0 = time.perf_counter() if profiled else 0.0
        with self._lock:
            (logits,) = self._session.run(None, {self._input_name: audio})
        forward_ms = (time.perf_counter() - t0) * 1000.0 if profiled else 0.0

        t0 = time.perf_counter() if profiled else 0.0
        raw_f32, precision = extract_raw_logits_f32(logits)
        if (
            self.configured_precision is not None
            and precision != self.configured_precision
            and not self._warned_precision_mismatch
        ):
            logger.warning(
                "ONNX logits precision %s does not match configured dtype %s",
                precision, self.configured_precision,
            )
            self._warned_precision_mismatch = True
        t_len, vocab = parse_onnx_output_shape(raw_f32.shape)
        log_probs = raw_logits_to_log_probs(raw_f32.reshape(t_len, vocab))
        post_ms = (time.perf_counter() - t0) * 1000.0 if profiled else 0.0
        return ForwardOutput(
            log_probs=log_probs, t_len=t_len, vocab_size=vocab,
            dtype=precision, forward_ms=forward_ms, post_ms=post_ms,
        )

    def infer(self, normalized: np.ndarray) -> ForwardOutput:
        return self._run(normalized, profiled=False)

    def infer_profiled(self, normalized: np.ndarray) -> ForwardOutput:
        """Timed variant: forward_ms wraps session.run, post_ms wraps the
        precision extraction + host log-softmax (model_runtime.rs:319-338;
        onnxruntime.run is synchronous, so no device sync is needed)."""
        return self._run(normalized, profiled=True)

    def synchronize(self) -> None:
        pass  # onnxruntime.run is synchronous

    def device_label(self) -> str:
        providers = self._session.get_providers()
        return f"onnx:{providers[0] if providers else 'unknown'}"
