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
    with pytest.raises(RuntimeBackendError, match="not found"):
        OnnxRuntimeBackend(tmp_path / "missing.onnx", CFG)
    if not has_ort:
        # garbage file without onnxruntime: the embedded-evaluator fallback
        # must explain itself, and allow_embedded=False keeps the
        # reference's hard "onnx disabled" error (model_runtime.rs:15-44)
        bad = tmp_path / "bad.onnx"
        bad.write_bytes(b"not-an-onnx-file")
        with pytest.raises(RuntimeBackendError, match="embedded"):
            OnnxRuntimeBackend(bad, CFG)
        with pytest.raises(RuntimeBackendError, match="onnxruntime"):
            OnnxRuntimeBackend(bad, CFG, allow_embedded=False)


# --- precision-aware extraction + EP chain (model_runtime.rs:350-506) ---

from wav2vec2_tpu.pipeline.onnx_runtime import (  # noqa: E402
    execution_providers,
    extract_raw_logits_f32,
    precision_from_config,
)


def test_precision_from_config_labels():
    for raw, want in [("float16", "f16"), ("FP16", "f16"), ("bf-16", "bf16"),
                      ("bfloat16", "bf16"), ("float32", "f32"), ("f32", "f32"),
                      ("Float_64", "f64"), ("double", "f64")]:
        assert precision_from_config(raw) == want
    assert precision_from_config(None) is None
    with pytest.raises(RuntimeBackendError, match="unsupported"):
        precision_from_config("int8")


def test_extract_raw_logits_precisions():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(1, 5, 8)).astype(np.float32)
    for dtype, label in [(np.float32, "f32"), (np.float16, "f16"),
                         (np.float64, "f64")]:
        out, got = extract_raw_logits_f32(base.astype(dtype))
        assert got == label and out.dtype == np.float32
        np.testing.assert_allclose(out, base.astype(dtype).astype(np.float32))
    import ml_dtypes

    out, got = extract_raw_logits_f32(base.astype(ml_dtypes.bfloat16))
    assert got == "bf16" and out.dtype == np.float32
    with pytest.raises(RuntimeBackendError, match="unsupported"):
        extract_raw_logits_f32(base.astype(np.int32))


def test_execution_provider_chain():
    assert execution_providers("cpu") == ["CPUExecutionProvider"]
    assert execution_providers("CUDA") == [
        "CUDAExecutionProvider", "CPUExecutionProvider"
    ]
    with pytest.raises(RuntimeBackendError, match="unsupported ONNX device"):
        execution_providers("tpu")


# --- backend + CLI through a stub onnxruntime session ---

class _FakeTensor:
    def __init__(self, name):
        self.name = name


class _FakeSession:
    """Stands in for onnxruntime.InferenceSession: deterministic logits at a
    configurable output dtype, shaped by the wav2vec2 conv geometry."""

    out_dtype = np.float32
    cfg = CFG

    def __init__(self, path, providers=None):
        self.path = path
        self.providers = providers or ["CPUExecutionProvider"]

    def get_inputs(self):
        return [_FakeTensor("input_values")]

    def get_providers(self):
        return self.providers

    def run(self, _out, feeds):
        audio = feeds["input_values"]
        assert audio.ndim == 2 and audio.shape[0] == 1
        t = self.cfg.conv_output_length(audio.shape[1])
        rng = np.random.default_rng(abs(int(audio.sum() * 1000)) % (2**32))
        logits = rng.normal(size=(1, t, self.cfg.vocab_size)).astype(np.float64)
        return [logits.astype(self.out_dtype)]


@pytest.fixture
def fake_ort(monkeypatch):
    import sys
    import types

    mod = types.ModuleType("onnxruntime")
    mod.InferenceSession = _FakeSession
    monkeypatch.setitem(sys.modules, "onnxruntime", mod)
    return mod


def test_backend_with_stub_session_f16(fake_ort, tmp_path, monkeypatch):
    monkeypatch.setattr(_FakeSession, "out_dtype", np.float16)
    model = tmp_path / "model.onnx"
    model.write_bytes(b"stub")
    backend = OnnxRuntimeBackend(model, CFG, device="cpu")
    fo = backend.infer(np.zeros(4000, np.float32))
    assert fo.dtype == "f16"
    assert fo.vocab_size == CFG.vocab_size
    assert fo.t_len == CFG.conv_output_length(4000)
    np.testing.assert_allclose(
        np.exp(fo.log_probs.astype(np.float64)).sum(-1), 1.0, atol=1e-3
    )
    # infer() skips stage timing; infer_profiled fills it
    assert fo.forward_ms == 0.0 and fo.post_ms == 0.0
    prof = backend.infer_profiled(np.zeros(4000, np.float32))
    assert prof.forward_ms > 0.0 and prof.post_ms > 0.0
    assert backend.device_label() == "onnx:CPUExecutionProvider"


def test_backend_warns_on_precision_mismatch(fake_ort, tmp_path, monkeypatch, caplog):
    import dataclasses

    monkeypatch.setattr(_FakeSession, "out_dtype", np.float16)
    cfg = dataclasses.replace(CFG, dtype="float32")
    model = tmp_path / "model.onnx"
    model.write_bytes(b"stub")
    backend = OnnxRuntimeBackend(model, cfg, device="cpu")
    assert backend.configured_precision == "f32"
    with caplog.at_level("WARNING", logger="wav2vec2_tpu.pipeline.onnx_runtime"):
        backend.infer(np.zeros(4000, np.float32))
    assert any("does not match" in r.message for r in caplog.records)


def test_cli_runtime_onnx_end_to_end(fake_ort, tmp_path, monkeypatch):
    """--runtime onnx drives the full CLI (textgrid mode) through the ONNX
    backend on a synthetic dataset; forced alignment recovers the transcript
    words whatever the (random) logits are."""
    import json

    from wav2vec2_tpu.cli.alignment_report import run
    from wav2vec2_tpu.data.flac_encoder import write_flac

    cfg_dict = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16], conv_kernel=[10], conv_stride=[5],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        pad_token_id=0, vocab_size=8,
    )
    monkeypatch.setattr(
        _FakeSession, "cfg", Wav2Vec2ModelConfig.from_dict(cfg_dict)
    )
    monkeypatch.setattr(_FakeSession, "out_dtype", np.float16)
    d = tmp_path / "model"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg_dict))
    (d / "vocab.json").write_text(json.dumps(
        {"<pad>": 0, "|": 1, "A": 2, "B": 3, "C": 4}))
    (d / "model.onnx").write_bytes(b"stub")

    base = tmp_path / "data" / "LibriSpeech" / "test-clean" / "1" / "2"
    base.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i, text in enumerate(["AB CA", "BA CB"]):
        uid = f"1-2-{i:04d}"
        x = np.clip(np.cumsum(rng.integers(-80, 80, size=8000)), -30000, 30000)
        write_flac(base / f"{uid}.flac", x.astype(np.int64), 16000)
        lines.append(f"{uid} {text}")
    (base / "1-2.trans.txt").write_text("\n".join(lines))

    rc = run([
        "--model-dir", str(d), "--dataset-root", str(tmp_path / "data"),
        "--runtime", "onnx", "--device", "cpu",
        "--output-format", "textgrid",
    ])
    assert rc == 0
    grids = sorted(base.glob("*.TextGrid"))
    assert len(grids) == 2
    assert '"AB"' in grids[0].read_text() or "AB" in grids[0].read_text()
