"""scripts/export_hf_model.py: HF checkpoint dir → framework model dir for
both precision policies, reloadable by the framework (the ONNX-exporter
parity tool; precision islands per the reference's fp16 incident lesson)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = Path(__file__).resolve().parent.parent
CONFIG = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
    conv_stride=[5, 2], num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=32,
    do_stable_layer_norm=False, feat_extract_norm="group", conv_bias=False,
)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf_model")
    torch.manual_seed(0)
    transformers.Wav2Vec2ForCTC(transformers.Wav2Vec2Config(**CONFIG)).save_pretrained(d)
    vocab = {"<pad>": 0, "|": 4, "A": 5, "B": 6}
    (d / "vocab.json").write_text(json.dumps(vocab))
    return d


@pytest.mark.parametrize("precision,expected_dtype", [
    ("fp32", "float32"), ("tpu-safe-bf16", "bfloat16"),
])
def test_export_and_reload(hf_dir, tmp_path, precision, expected_dtype):
    out = tmp_path / precision
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "export_hf_model.py"),
         "--model", str(hf_dir), "--out", str(out), "--precision", precision],
        capture_output=True, text=True, cwd=REPO,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/local/bin:/usr/bin:/bin",
             "HOME": "/root"},
    )
    assert r.returncode == 0, r.stderr[-500:]

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig, load_vocab
    from wav2vec2_tpu.models.params import load_safetensors_params

    mc = Wav2Vec2ModelConfig.load(out / "config.json")
    assert mc.dtype == expected_dtype
    params = load_safetensors_params(out / "model.safetensors", mc)
    assert params["lm_head"]["kernel"].shape == (32, 32)
    assert load_vocab(out / "vocab.json")["|"] == 4


def test_export_onnx_gated_without_onnx_package(hf_dir, tmp_path):
    """--format onnx needs the `onnx` package; when absent (this image) the
    safetensors export completes and the ONNX step fails with a clear,
    actionable error + distinct exit code (the reference's feature gate).
    When onnx IS installed, the graph must be written."""
    out = tmp_path / "onnx"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "export_hf_model.py"),
         "--model", str(hf_dir), "--out", str(out), "--format", "onnx"],
        capture_output=True, text=True,
    )
    assert (out / "model.safetensors").exists()
    try:
        import onnx  # noqa: F401

        assert r.returncode == 0, r.stderr
        assert (out / "model.onnx").exists()
    except ImportError:
        assert r.returncode == 2, r.stderr
        assert "requires the 'onnx' package" in r.stderr
