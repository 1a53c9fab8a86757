"""Remaining reference-test mirrors: config loading (config.rs:121-185),
builder failure paths (builder.rs tests), error types (error.rs), and
runtime edge cases (runtime.rs:562-716)."""

import json

import numpy as np
import pytest

from wav2vec2_tpu.config import (
    DEFAULT_SAMPLE_RATE_HZ,
    Wav2Vec2Config,
    Wav2Vec2ModelConfig,
    load_vocab,
)
from wav2vec2_tpu.errors import (
    InvalidInputError,
    IoError,
    JsonError,
    RuntimeBackendError,
)
from wav2vec2_tpu.pipeline.builder import ForcedAlignerBuilder
from wav2vec2_tpu.types import AlignmentInput

CONFIG = dict(
    hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
    intermediate_size=3072, conv_dim=[512], conv_kernel=[10],
    conv_stride=[2, 2, 2, 2, 2], num_conv_pos_embeddings=128,
    num_conv_pos_embedding_groups=16, pad_token_id=0, vocab_size=32,
)


def test_wav2vec2_config_default():
    cfg = Wav2Vec2Config()
    assert cfg.model_path == "" and cfg.config_path == "" and cfg.vocab_path == ""
    assert cfg.expected_sample_rate_hz == DEFAULT_SAMPLE_RATE_HZ == 16_000


def test_model_config_frame_stride_ms():
    cfg = Wav2Vec2ModelConfig.from_dict(CONFIG)
    # stride product 32 → 32/16000*1000 = 2.0 ms (config.rs:99-118)
    assert cfg.frame_stride_ms(16_000) == pytest.approx(2.0)


def test_model_config_deserialize_defaults():
    cfg = Wav2Vec2ModelConfig.from_dict(CONFIG)
    assert not cfg.do_stable_layer_norm
    assert cfg.layer_norm_eps == pytest.approx(1e-5)
    assert cfg.feat_extract_norm == "layer"
    assert cfg.conv_bias is True


def test_model_config_load_missing_file():
    with pytest.raises(IoError):
        Wav2Vec2ModelConfig.load("/nonexistent/path/config.json")


def test_model_config_load_invalid_json(tmp_path):
    p = tmp_path / "config.json"
    p.write_text("not valid json")
    with pytest.raises(JsonError):
        Wav2Vec2ModelConfig.load(p)


def test_model_config_missing_required_field(tmp_path):
    p = tmp_path / "config.json"
    d = dict(CONFIG)
    del d["hidden_size"]
    p.write_text(json.dumps(d))
    with pytest.raises(JsonError, match="hidden_size"):
        Wav2Vec2ModelConfig.load(p)


def test_build_fails_on_invalid_config_path(tmp_path):
    cfg = Wav2Vec2Config(config_path=str(tmp_path / "nope.json"),
                         vocab_path=str(tmp_path / "vocab.json"))
    with pytest.raises(IoError):
        ForcedAlignerBuilder(cfg).build()


def test_build_fails_on_invalid_vocab_path(tmp_path):
    (tmp_path / "config.json").write_text(json.dumps(CONFIG))
    cfg = Wav2Vec2Config(config_path=str(tmp_path / "config.json"),
                         vocab_path=str(tmp_path / "nope.json"))
    with pytest.raises(IoError):
        ForcedAlignerBuilder(cfg).build()


def test_vocab_filters_multi_char_keys(tmp_path):
    p = tmp_path / "vocab.json"
    p.write_text(json.dumps({"<pad>": 0, "|": 1, "a": 2, "</s>": 3}))
    assert load_vocab(p) == {"|": 1, "a": 2}


def test_error_types_display():
    assert "while reading x" in str(IoError("reading x", "boom")) or "reading x" in str(IoError("reading x", "boom"))
    assert "parse y" in str(JsonError("parse y", "bad"))
    e = RuntimeBackendError("ctx", "msg")
    assert "ctx" in str(e) and "msg" in str(e)
    assert "nope" in str(InvalidInputError("nope"))


def _mock_aligner(tmp_path, t_frames=10):
    from tests.test_pipeline import CONFIG as PIPE_CONFIG, VOCAB, MockBackend

    (tmp_path / "config.json").write_text(json.dumps(PIPE_CONFIG))
    (tmp_path / "vocab.json").write_text(json.dumps(VOCAB))
    cfg = Wav2Vec2Config(config_path=str(tmp_path / "config.json"),
                         vocab_path=str(tmp_path / "vocab.json"))
    return (
        ForcedAlignerBuilder(cfg)
        .with_runtime_backend(MockBackend(np.zeros((t_frames, 6), np.float32)))
        .build()
    )


def test_align_profiled_empty_input_returns_empty(tmp_path):
    aligner = _mock_aligner(tmp_path)
    p = aligner.align_profiled(AlignmentInput(16000, np.array([], np.float32), "a"))
    assert p.output.words == []
    assert p.num_frames_t == 0 and p.timings.total_ms == 0.0


def test_align_sample_rate_mismatch_still_returns_ok(tmp_path, caplog):
    import logging

    aligner = _mock_aligner(tmp_path)
    with caplog.at_level(logging.WARNING, logger="wav2vec2_tpu"):
        out = aligner.align(AlignmentInput(8000, np.ones(100, np.float32), "a"))
    # warns but does not fail (runtime.rs:81-87)
    assert out is not None
    assert any("Hz" in r.message for r in caplog.records)


def test_compute_dtype_aliases(tmp_path):
    """The backend maps HF dtype aliases (f16/bf16 → bfloat16) and rejects
    unknowns (model_runtime precision tests)."""
    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.errors import RuntimeBackendError
    from wav2vec2_tpu.pipeline.model_runtime import JaxRuntimeBackend

    import jax

    from wav2vec2_tpu.models.params import init_params

    cfg = Wav2Vec2ModelConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16], conv_kernel=[10], conv_stride=[5],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        pad_token_id=0, vocab_size=8, feat_extract_norm="group", conv_bias=False,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    JaxRuntimeBackend(cfg, params, compute_dtype="bfloat16")
    with pytest.raises(RuntimeBackendError, match="dtype"):
        JaxRuntimeBackend(cfg, params, compute_dtype="float16")


def test_ensure_backend_falls_back_to_cpu(monkeypatch):
    """Platform init failure degrades to CPU with a warning instead of
    crashing (SURVEY §5 failure-detection chain, viterbi.rs:13-30 analog)."""
    import jax

    import wav2vec2_tpu.utils.device as dev

    calls = {"n": 0}

    class _FakeDev:
        platform = "cpu"

    def fake_devices():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("plugin exploded")
        return [_FakeDev()]

    monkeypatch.setattr(dev, "_checked", False)
    monkeypatch.setattr(jax, "devices", fake_devices)
    assert dev.ensure_backend() == "cpu"
    assert calls["n"] == 2


def test_ensure_backend_reraises_after_first_success(monkeypatch):
    """Once a backend initialized, later RuntimeErrors are real errors, not
    initialization failures — they must propagate."""
    import jax

    import wav2vec2_tpu.utils.device as dev

    monkeypatch.setattr(dev, "_checked", True)

    def fake_devices():
        raise RuntimeError("device lost")

    monkeypatch.setattr(jax, "devices", fake_devices)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="device lost"):
        dev.ensure_backend()


def test_device_init_watchdog_warns_then_cancel_silences(caplog):
    """A hung backend init (wedged TPU worker — hangs, never errors) must
    produce an operator-visible warning with a remediation hint; a
    completed init cancels the watchdog before it fires."""
    import logging
    import time

    import wav2vec2_tpu.utils.device as dev

    with caplog.at_level(logging.WARNING, logger="wav2vec2_tpu.utils.device"):
        cancel = dev._init_watchdog(warn_after=0.05)
        time.sleep(0.3)
        cancel()
    assert any("unresponsive" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="wav2vec2_tpu.utils.device"):
        cancel = dev._init_watchdog(warn_after=0.2)
        cancel()
        time.sleep(0.4)
    assert not caplog.records


def test_device_init_watchdog_hard_abort_in_subprocess():
    """WAV2VEC2_DEVICE_INIT_TIMEOUT_S aborts an unattended run whose
    backend init never returns (exit code 3, like bench.py's watchdog)."""
    import os
    import subprocess
    import sys

    code = (
        "import time\n"
        "from wav2vec2_tpu.utils.device import _init_watchdog\n"
        "_init_watchdog(warn_after=0.05)\n"
        "time.sleep(30)\n"
    )
    env = dict(os.environ, WAV2VEC2_DEVICE_INIT_TIMEOUT_S="0.3")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=120,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 3, (r.returncode, r.stderr)
    assert "watchdog" in r.stderr


def test_package_lazy_attrs():
    """__init__ loads heavy subsystems lazily (keeps bare import light)."""
    import wav2vec2_tpu

    assert wav2vec2_tpu.BatchAligner.__name__ == "BatchAligner"
    assert callable(wav2vec2_tpu.align_longform)
    with pytest.raises(AttributeError, match="no attribute"):
        wav2vec2_tpu.does_not_exist
