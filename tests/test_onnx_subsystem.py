"""The self-contained ONNX subsystem (wav2vec2_tpu/onnx/): protobuf codec
round-trips, exporter ↔ JAX-forward parity, the embedded numpy session, and
the full second-runtime pipeline (export → OnnxRuntimeBackend →
ForcedAligner) actually executing — the reference's ONNX runtime infers
(model_runtime.rs:198-339), so must this one. When onnxruntime is
installed (CI leg), the same exported file is cross-checked under stock
ORT."""

import json

import numpy as np
import pytest

from wav2vec2_tpu.config import Wav2Vec2ModelConfig

CFG_KW = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
    conv_stride=[5, 2], num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
)


@pytest.fixture(scope="module", params=["group_postnorm", "layer_prenorm"])
def exported(request):
    import jax

    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.onnx import export_ctc_model

    extra = (
        dict(feat_extract_norm="group", conv_bias=False)
        if request.param == "group_postnorm"
        else dict(feat_extract_norm="layer", conv_bias=True,
                  do_stable_layer_norm=True)
    )
    cfg = Wav2Vec2ModelConfig(**CFG_KW, **extra)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params, export_ctc_model(cfg, params)


def test_proto_roundtrip(exported):
    """encode → decode is lossless for nodes, attrs, and initializers."""
    from wav2vec2_tpu.onnx.proto import Model

    _cfg, _params, model = exported
    back = Model.decode(model.encode())
    assert back.opset_version == model.opset_version
    assert back.graph.input_names == ["audio"]
    assert back.graph.output_names == ["logits"]
    assert len(back.graph.nodes) == len(model.graph.nodes)
    for a, b in zip(model.graph.nodes, back.graph.nodes):
        assert (a.op_type, a.inputs, a.outputs) == (b.op_type, b.inputs, b.outputs)
        for name, attr in a.attributes.items():
            got = b.attributes[name].value
            if isinstance(attr.value, float):
                # floats store as f32 on the wire (AttributeProto.f)
                assert got == pytest.approx(attr.value, rel=1e-6)
            else:
                assert got == attr.value, (a.op_type, name)
    assert set(back.graph.initializers) == set(model.graph.initializers)
    for k, arr in model.graph.initializers.items():
        got = back.graph.initializers[k]
        assert got.dtype == arr.dtype and got.shape == arr.shape
        np.testing.assert_array_equal(got, arr, err_msg=k)


def test_proto_negative_and_scalar_fields():
    from wav2vec2_tpu.onnx.proto import (
        Attribute,
        ATTR_INTS,
        decode_tensor,
        encode_tensor,
    )

    a = Attribute("ends", type=ATTR_INTS, ints=[-1, 0, 7])
    assert Attribute.decode(a.encode()).ints == [-1, 0, 7]
    name, arr = decode_tensor(encode_tensor("x", np.int64([-5, 3])))
    assert name == "x" and arr.tolist() == [-5, 3]


def test_embedded_session_matches_jax_forward(exported):
    import jax.numpy as jnp

    from wav2vec2_tpu.models.ctc_model import wav2vec2_forward
    from wav2vec2_tpu.onnx import EmbeddedOnnxSession

    cfg, params, model = exported
    sess = EmbeddedOnnxSession(model.encode())
    assert sess.get_inputs()[0].name == "audio"
    assert sess.get_providers() == ["EmbeddedCPUExecutionProvider"]
    rng = np.random.default_rng(1)
    for n in (1600, 2000):  # dynamic time axis: one file, any length
        audio = rng.normal(size=(1, n)).astype(np.float32)
        (logits,) = sess.run(None, {"audio": audio})
        ref = np.asarray(wav2vec2_forward(params, jnp.asarray(audio), cfg))
        assert logits.shape == ref.shape
        np.testing.assert_allclose(logits, ref, atol=2e-5)


@pytest.mark.skipif(
    not pytest.importorskip("importlib.util").find_spec("onnxruntime"),
    reason="onnxruntime not installed (exercised on the CI onnx leg)",
)
def test_exported_file_runs_under_stock_onnxruntime(exported, tmp_path):
    """The wire format is real ONNX: stock ORT loads and agrees."""
    import onnxruntime as ort

    from wav2vec2_tpu.onnx import EmbeddedOnnxSession, save_model

    cfg, _params, model = exported
    path = tmp_path / "model.onnx"
    save_model(path, model)
    sess = ort.InferenceSession(str(path),
                                providers=["CPUExecutionProvider"])
    audio = np.random.default_rng(2).normal(size=(1, 1600)).astype(np.float32)
    (ort_logits,) = sess.run(None, {"audio": audio})
    (emb_logits,) = EmbeddedOnnxSession(path).run(None, {"audio": audio})
    np.testing.assert_allclose(ort_logits, emb_logits, atol=2e-5)


def test_export_declines_unsupported_families():
    import jax

    from wav2vec2_tpu.errors import RuntimeBackendError
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.onnx import export_ctc_model

    for extra, msg in [
        (dict(attention_style="wavlm", num_buckets=16,
              max_bucket_distance=50), "WavLM"),
        (dict(pos_conv_style="data2vec", feat_extract_norm="layer"), "data2vec"),
        (dict(adapter_attn_dim=4), "MMS"),
    ]:
        cfg = Wav2Vec2ModelConfig(**CFG_KW, **extra)
        params = init_params(cfg, jax.random.PRNGKey(0))
        with pytest.raises(RuntimeBackendError, match=msg):
            export_ctc_model(cfg, params)


def test_embedded_session_rejects_unknown_ops():
    from wav2vec2_tpu.onnx import EmbeddedOnnxSession, Model
    from wav2vec2_tpu.onnx.proto import Graph, Node

    g = Graph(nodes=[Node(op_type="LSTM", inputs=["x"], outputs=["y"])])
    with pytest.raises(ValueError, match="LSTM"):
        EmbeddedOnnxSession(Model(graph=g).encode())


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """Full model dir with an exported ONNX file for the pipeline tests."""
    import jax

    from safetensors.numpy import save_file

    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.onnx import export_ctc_model, save_model
    from wav2vec2_tpu.utils.checkpoint import params_to_hf_flat_dict

    d = tmp_path_factory.mktemp("onnx_model_dir")
    cfg_kw = dict(CFG_KW, vocab_size=8, feat_extract_norm="group",
                  conv_bias=False)
    cfg = Wav2Vec2ModelConfig(**cfg_kw)
    params = init_params(cfg, jax.random.PRNGKey(3))
    save_file(params_to_hf_flat_dict(params, cfg),
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(cfg_kw))
    (d / "vocab.json").write_text(json.dumps(
        {"<pad>": 0, "a": 1, "b": 2, "|": 3, "c": 4}))
    save_model(d / "model.onnx", export_ctc_model(cfg, params))
    return d


def test_exporter_script_and_verify(model_dir, capsys):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import export_onnx_model

    rc = export_onnx_model.main([
        "--model-dir", str(model_dir),
        "--out", str(model_dir / "exported.onnx"), "--verify",
    ])
    assert rc == 0
    assert "verify: max|onnx - jax|" in capsys.readouterr().out
    assert (model_dir / "exported.onnx").exists()


def test_onnx_backend_pipeline_end_to_end(model_dir):
    """The second runtime INFERS through the whole pipeline: ONNX session →
    log-softmax → Viterbi → grouped words, and agrees with the XLA backend
    word for word and millisecond for millisecond."""
    from wav2vec2_tpu import AlignmentInput, Wav2Vec2Config
    from wav2vec2_tpu.pipeline.builder import ForcedAlignerBuilder
    from wav2vec2_tpu.pipeline.onnx_runtime import OnnxRuntimeBackend

    model_cfg = Wav2Vec2ModelConfig.load(model_dir / "config.json")
    backend = OnnxRuntimeBackend(model_dir / "model.onnx", model_cfg,
                                 device="cpu")
    cfg = Wav2Vec2Config(
        model_path=str(model_dir / "model.onnx"),
        config_path=str(model_dir / "config.json"),
        vocab_path=str(model_dir / "vocab.json"), device="cpu",
    )
    onnx_aligner = (
        ForcedAlignerBuilder(cfg).with_runtime_backend(backend).build()
    )
    xla_cfg = Wav2Vec2Config(
        model_path=str(model_dir / "model.safetensors"),
        config_path=str(model_dir / "config.json"),
        vocab_path=str(model_dir / "vocab.json"), device="cpu",
    )
    xla_aligner = (
        ForcedAlignerBuilder(xla_cfg)
        .with_backend_options(compute_dtype="float32").build()
    )
    rng = np.random.default_rng(4)
    audio = rng.normal(size=4000).astype(np.float32)
    inp = AlignmentInput(16000, audio, "ab ca")
    got = onnx_aligner.align(inp)
    ref = xla_aligner.align(inp)
    assert [w.word for w in got.words] == ["ab", "ca"]
    assert [w.word for w in got.words] == [w.word for w in ref.words]
    assert [(w.start_ms, w.end_ms) for w in got.words] == [
        (w.start_ms, w.end_ms) for w in ref.words
    ]

    profiled = onnx_aligner.align_profiled(inp)
    assert profiled.timings.forward_ms > 0


def test_cli_runtime_onnx_with_embedded_session(model_dir, tmp_path):
    """CLI --runtime onnx end to end over a real exported model (no stub,
    no onnxruntime needed)."""
    from wav2vec2_tpu.cli.alignment_report import run as cli_run
    from wav2vec2_tpu.data.flac_encoder import write_flac

    base = tmp_path / "data" / "LibriSpeech" / "test-clean" / "9" / "9"
    base.mkdir(parents=True)
    rng = np.random.default_rng(5)
    x = np.clip(np.cumsum(rng.integers(-100, 100, size=4000)),
                -30000, 30000).astype(np.int64)
    write_flac(base / "9-9-0000.flac", x, 16000)
    (base / "9-9.trans.txt").write_text("9-9-0000 AB CA")
    rc = cli_run([
        "--model-dir", str(model_dir),
        "--dataset-root", str(tmp_path / "data"),
        "--runtime", "onnx", "--device", "cpu",
        "--output-format", "textgrid", "--textgrid-suffix", "_onnx",
    ])
    assert rc == 0
    assert (base / "9-9-0000_onnx.TextGrid").exists()


def test_proto_decodes_packed_repeated_fields():
    """proto3 serializers (onnx, torch.onnx) PACK repeated scalars into one
    length-delimited blob; the decoder must accept both packed and unpacked
    encodings (review finding: packed dims crashed decode_tensor)."""
    import numpy as np

    from wav2vec2_tpu.onnx.proto import (
        Attribute,
        decode_tensor,
        write_int,
        write_len_delimited,
        write_string,
        _write_varint,
    )

    # TensorProto with PACKED dims [2, 3] + raw_data
    buf = bytearray()
    packed = bytearray()
    _write_varint(packed, 2)
    _write_varint(packed, 3)
    write_len_delimited(buf, 1, bytes(packed))      # dims, packed
    write_int(buf, 2, 1)                            # data_type FLOAT
    write_string(buf, 8, "t")
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    write_len_delimited(buf, 9, arr.tobytes())
    name, got = decode_tensor(bytes(buf))
    assert name == "t" and got.shape == (2, 3)
    np.testing.assert_array_equal(got, arr)

    # AttributeProto with PACKED ints [0, -1, 7] (e.g. Slice axes)
    abuf = bytearray()
    write_string(abuf, 1, "ends")
    packed = bytearray()
    for v in (0, (1 << 64) - 1, 7):  # -1 as two's-complement varint
        _write_varint(packed, v)
    write_len_delimited(abuf, 8, bytes(packed))
    write_int(abuf, 20, 7)  # INTS
    a = Attribute.decode(bytes(abuf))
    assert a.ints == [0, -1, 7]

    # packed floats
    fbuf = bytearray()
    write_string(fbuf, 1, "fs")
    write_len_delimited(
        fbuf, 7, np.asarray([1.5, -2.0], np.float32).tobytes())
    write_int(fbuf, 20, 6)  # FLOATS
    f = Attribute.decode(bytes(fbuf))
    assert f.floats == [1.5, -2.0]


def test_embedded_session_cast_op():
    """Cast executes a real dtype conversion (review finding: it used to be
    an Identity alias, silently wrong for foreign graphs)."""
    import numpy as np

    from wav2vec2_tpu.onnx import EmbeddedOnnxSession, Model
    from wav2vec2_tpu.onnx.proto import (
        ATTR_INT,
        FLOAT,
        INT64,
        Attribute,
        Graph,
        Node,
    )

    g = Graph()
    g.add_input("x", FLOAT, [2])
    g.add_output("y", INT64, [2])
    g.nodes.append(Node(op_type="Cast", inputs=["x"], outputs=["y"],
                        attributes={"to": Attribute("to", type=ATTR_INT,
                                                    i=INT64)}))
    sess = EmbeddedOnnxSession(Model(graph=g).encode())
    (y,) = sess.run(None, {"x": np.asarray([1.9, -2.2], np.float32)})
    assert y.dtype == np.int64 and y.tolist() == [1, -2]


@pytest.mark.skipif(
    not pytest.importorskip("importlib.util").find_spec("onnx"),
    reason="onnx package not installed (exercised on the CI onnx leg)",
)
def test_foreign_torch_exported_file_parses(tmp_path):
    """Files from the standard torch exporter (packed protobuf fields,
    Constant nodes, ...) must PARSE with the in-repo codec; execution may
    legitimately decline with the clear unsupported-op error (stock
    onnxruntime serves those files — the embedded session is scoped to
    this repo's primitive-op exports)."""
    import torch
    import torch.nn as nn

    from wav2vec2_tpu.onnx import EmbeddedOnnxSession, load_model

    m = nn.Sequential(nn.Conv1d(1, 4, 3), nn.ReLU(), nn.Conv1d(4, 2, 3))
    path = tmp_path / "torch.onnx"
    torch.onnx.export(m, torch.randn(1, 1, 32), str(path),
                      opset_version=17, dynamo=False)
    model = load_model(path)  # packed dims etc. decode
    assert model.graph.nodes
    convs = [n for n in model.graph.nodes if n.op_type == "Conv"]
    assert convs and convs[0].attr("kernel_shape") == [3]
    assert any(a.ndim == 3 for a in model.graph.initializers.values())
    try:
        sess = EmbeddedOnnxSession(path)
    except ValueError as e:
        assert "unsupported ops" in str(e)
    else:
        (y,) = sess.run(None, {model.graph.input_names[0]:
                               np.ones((1, 1, 32), np.float32)})
        ref = m(torch.ones(1, 1, 32)).detach().numpy()
        np.testing.assert_allclose(y, ref, atol=1e-5)


def test_embedded_session_eager_shape_ops():
    """The dynamic-shape machinery torch.onnx emits (Shape/Gather/Concat/
    Gemm/ReduceMean...) evaluates eagerly."""
    from wav2vec2_tpu.onnx import EmbeddedOnnxSession, Model
    from wav2vec2_tpu.onnx.proto import (
        ATTR_INT,
        FLOAT,
        INT64,
        Attribute,
        Graph,
        Node,
    )

    g = Graph()
    g.add_input("x", FLOAT, [2, 3])
    g.initializers["idx"] = np.asarray(0, np.int64)
    g.initializers["w"] = np.random.default_rng(0).normal(
        size=(3, 4)).astype(np.float32)
    g.initializers["b"] = np.zeros(4, np.float32)
    g.nodes += [
        Node("Shape", ["x"], ["shp"]),
        Node("Gather", ["shp", "idx"], ["b0"],
             attributes={"axis": Attribute("axis", type=ATTR_INT, i=0)}),
        Node("Gemm", ["x", "w", "b"], ["y"]),
        Node("ReduceMean", ["y"], ["m"],
             attributes={"axes": Attribute("axes", type=7, ints=[-1]),
                         "keepdims": Attribute("keepdims", type=ATTR_INT,
                                               i=0)}),
    ]
    g.add_output("b0", INT64, [])
    g.add_output("m", FLOAT, [2])
    sess = EmbeddedOnnxSession(Model(graph=g).encode())
    x = np.ones((2, 3), np.float32)
    b0, m = sess.run(None, {"x": x})
    assert int(b0) == 2
    np.testing.assert_allclose(m, (x @ g.initializers["w"]).mean(-1),
                               rtol=1e-6)


def test_export_declines_sew_and_adapter_families():
    import jax

    from wav2vec2_tpu.errors import RuntimeBackendError
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.onnx import export_ctc_model

    for extra, msg in [
        (dict(encoder_style="sew", squeeze_factor=2), "SEW"),
        (dict(add_adapter=True, adapter_kernel_size=3, adapter_stride=2,
              num_adapter_layers=1), "add_adapter"),
    ]:
        cfg = Wav2Vec2ModelConfig(**CFG_KW, **extra)
        params = init_params(cfg, jax.random.PRNGKey(0))
        with pytest.raises(RuntimeBackendError, match=msg):
            export_ctc_model(cfg, params)


def test_batch_norm_pos_conv_exports_and_matches_jax():
    """conv_pos_batch_norm checkpoints stay inside the ONNX surface: the
    folded per-channel affine is emitted as Mul/Add before the pos-conv and
    must match the JAX forward. The shift is set off zero so a dropped
    affine cannot pass."""
    import jax
    import jax.numpy as jnp

    from wav2vec2_tpu.models.ctc_model import wav2vec2_forward
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.onnx import EmbeddedOnnxSession, export_ctc_model

    cfg = Wav2Vec2ModelConfig(**CFG_KW, conv_pos_batch_norm=True)
    params = init_params(cfg, jax.random.PRNGKey(0))
    bn = params["encoder"]["pos_conv_embed"]["batch_norm"]
    bn["scale"] = bn["scale"] * 1.3
    bn["shift"] = bn["shift"] + 0.21
    sess = EmbeddedOnnxSession(export_ctc_model(cfg, params).encode())
    rng = np.random.default_rng(3)
    audio = rng.normal(size=(1, 1600)).astype(np.float32)
    (logits,) = sess.run(None, {"audio": audio})
    ref = np.asarray(wav2vec2_forward(params, jnp.asarray(audio), cfg))
    np.testing.assert_allclose(logits, ref, atol=2e-5)
