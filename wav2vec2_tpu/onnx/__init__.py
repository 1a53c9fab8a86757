"""Self-contained ONNX subsystem: protobuf codec, CTC-graph exporter, and
an embedded numpy evaluator with onnxruntime's session surface.

Gives the second model runtime (pipeline/onnx_runtime.py — the analog of
the reference's ORT backend, model_runtime.rs:198-339) an execution path
in every environment: exported files run under stock onnxruntime where
installed, and under EmbeddedOnnxSession everywhere else."""

from .export import export_ctc_model
from .proto import Model, load_model, save_model
from .reference_runtime import EmbeddedOnnxSession

__all__ = [
    "EmbeddedOnnxSession",
    "Model",
    "export_ctc_model",
    "load_model",
    "save_model",
]
