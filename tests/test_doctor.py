"""Diagnostics command (wav2vec2_tpu/doctor.py)."""

import json



def test_doctor_healthy_without_model(capsys):
    from wav2vec2_tpu.doctor import main

    rc = main([])
    out = capsys.readouterr().out
    assert "accelerator" in out and "compile cache" in out
    assert "native flac decoder" in out
    assert rc == 0
    assert out.strip().endswith("healthy")


def test_doctor_reports_hung_device_init(capsys, monkeypatch):
    """A wedged TPU worker hangs jax.devices(); doctor must stay responsive
    and FAIL with a remediation hint instead of blocking forever."""
    import time

    import jax

    from wav2vec2_tpu.doctor import check_jax

    monkeypatch.setattr(jax, "devices", lambda *a: time.sleep(30))
    t0 = time.monotonic()
    ok = check_jax(timeout_s=0.3)
    assert time.monotonic() - t0 < 5
    out = capsys.readouterr().out
    assert not ok and "wedged" in out and "--device cpu" in out


def test_doctor_model_dir_checks(tmp_path, capsys):
    from wav2vec2_tpu.doctor import main

    # missing files → FAIL
    rc = main(["--model-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 1 and "missing" in out

    # valid dir → healthy, reports family prefix
    import jax

    from wav2vec2_tpu.config import Wav2Vec2ModelConfig
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.utils.checkpoint import save_safetensors

    cfgd = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
                conv_stride=[5, 2], num_conv_pos_embeddings=16,
                num_conv_pos_embedding_groups=4, pad_token_id=0,
                vocab_size=8, feat_extract_norm="group", conv_bias=False)
    cfg = Wav2Vec2ModelConfig.from_dict(cfgd)
    save_safetensors(tmp_path / "model.safetensors",
                     init_params(cfg, jax.random.PRNGKey(0)), cfg)
    (tmp_path / "config.json").write_text(json.dumps(cfgd))
    (tmp_path / "vocab.json").write_text(json.dumps({"a": 1, "|": 2}))
    rc = main(["--model-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0 and "wav2vec2" in out
