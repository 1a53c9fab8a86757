"""ONNX backend tests: pure helpers always, session paths only when
onnxruntime is installed (it is not part of this image — the graceful-error
contract is what matters, mirroring the reference's onnx-feature gate)."""

import numpy as np
import pytest

from wav2vec2_tpu.config import Wav2Vec2ModelConfig
from wav2vec2_tpu.errors import RuntimeBackendError
from wav2vec2_tpu.pipeline.onnx_runtime import (
    OnnxRuntimeBackend,
    parse_onnx_output_shape,
    raw_logits_to_log_probs,
)

CFG = Wav2Vec2ModelConfig(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64, conv_dim=[16], conv_kernel=[10], conv_stride=[5],
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    pad_token_id=0, vocab_size=8,
)


def test_parse_output_shape():
    assert parse_onnx_output_shape((1, 100, 32)) == (100, 32)
    assert parse_onnx_output_shape((100, 32)) == (100, 32)
    with pytest.raises(RuntimeBackendError, match="batch"):
        parse_onnx_output_shape((2, 100, 32))
    with pytest.raises(RuntimeBackendError):
        parse_onnx_output_shape((2, 3, 4, 5))


def test_log_softmax_f64_accumulation():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(7, 32)).astype(np.float32) * 10
    lp = raw_logits_to_log_probs(logits)
    assert lp.dtype == np.float32
    np.testing.assert_allclose(np.exp(lp.astype(np.float64)).sum(-1), 1.0, atol=1e-6)
    # matches direct f64 computation
    x = logits.astype(np.float64)
    expected = x - x.max(-1, keepdims=True)
    expected = expected - np.log(np.exp(expected).sum(-1, keepdims=True))
    np.testing.assert_allclose(lp, expected.astype(np.float32), atol=1e-6)


def test_missing_onnxruntime_or_model_gives_clear_error(tmp_path):
    try:
        import onnxruntime  # noqa: F401

        has_ort = True
    except ImportError:
        has_ort = False
    if has_ort:
        with pytest.raises(RuntimeBackendError, match="not found"):
            OnnxRuntimeBackend(tmp_path / "missing.onnx", CFG)
    else:
        with pytest.raises(RuntimeBackendError, match="onnxruntime"):
            OnnxRuntimeBackend(tmp_path / "missing.onnx", CFG)
