"""Fused-attention kernel equivalence (ops/flash_attention.py).

Contract (the bit-identical-backends discipline the Viterbi kernel follows,
reference viterbi_cuda.rs:197-216, applied at attention granularity):
the kernel must match a direct jnp oracle — including the Transformer-XL
relative-position term in its per-diagonal definition
bd[i, k] = q_pos[i]·(pe_{i−k}·W_pos) — and the encoder forward with the
`use_flash_attention` config flag on must match the XLA path with it off.
CPU CI runs the kernel in interpreter mode (conftest forces the CPU
backend); real-TPU execution is gated in scripts/bench_models.py +
bench.py's correctness pass.
"""

import functools
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wav2vec2_tpu.ops.flash_attention import (
    flash_attention,
    pad_len,
    rel_table_rev,
    use_flash,
)


def _oracle(q, k, v, mask, q_pos=None, w_pos=None, scale=1.0):
    """Direct jnp attention with the per-diagonal rel-pos definition."""
    b, nh, t, hd = q.shape
    h = nh * hd
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    if q_pos is not None:
        d_all = np.arange(-(t - 1), t, dtype=np.float64)
        inv = np.exp(np.arange(0, h, 2) * (-math.log(10000.0) / h))
        ang = d_all[:, None] * inv[None, :]
        pe = np.stack([np.sin(ang), np.cos(ang)], -1).reshape(len(d_all), h)
        r = (pe @ np.asarray(w_pos, np.float64)).reshape(
            len(d_all), nh, hd
        )  # [2t-1, nh, hd]
        idx = np.arange(t)[:, None] - np.arange(t)[None, :] + (t - 1)
        bd = jnp.einsum(
            "bhid,ikhd->bhik",
            q_pos.astype(jnp.float32),
            jnp.asarray(r[idx], jnp.float32),
            preferred_element_type=jnp.float32,
        )
        s = s + bd
    s = s * scale
    if mask is not None:
        s = s + mask[:, None, None, :]
    attn = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _case(b, nh, t, hd, rel, masked, dtype, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, nh, t, hd)), dtype)
    k = jnp.asarray(rng.normal(size=(b, nh, t, hd)), dtype)
    v = jnp.asarray(rng.normal(size=(b, nh, t, hd)), dtype)
    mask = None
    if masked:
        lens = rng.integers(t // 2, t + 1, size=b)
        mask = jnp.asarray(
            np.where(np.arange(t)[None] < lens[:, None], 0.0, -np.inf),
            jnp.float32,
        )
    kw, okw = {}, {}
    if rel:
        h = nh * hd
        w_pos = (rng.normal(size=(h, h)) * 0.1).astype(np.float32)
        q_pos = jnp.asarray(rng.normal(size=(b, nh, t, hd)), dtype)
        kw = dict(q_pos=q_pos,
                  rel_r=rel_table_rev(jnp.asarray(w_pos), nh, pad_len(t),
                                      dtype))
        okw = dict(q_pos=q_pos, w_pos=w_pos)
    scale = hd ** -0.5
    got = flash_attention(q, k, v, mask, scale=scale, **kw)
    want = _oracle(q, k, v, mask, scale=scale, **okw)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) or 1.0
    return err / ref


@pytest.mark.parametrize("t", [128, 200, 499])
def test_kernel_matches_oracle_plain(t):
    assert _case(2, 2, t, 64, rel=False, masked=True,
                 dtype=jnp.float32) < 2e-5


@pytest.mark.parametrize("t", [128, 200, 384])
def test_kernel_matches_oracle_rel(t):
    # per-diagonal Transformer-XL term: shear + reversed-window alignment
    assert _case(2, 2, t, 64, rel=True, masked=True,
                 dtype=jnp.float32) < 2e-5


def test_kernel_rel_unmasked_small_heads():
    assert _case(1, 2, 160, 32, rel=True, masked=False,
                 dtype=jnp.float32) < 2e-5


def test_kernel_bf16_within_rounding():
    # bf16 inputs, f32 in-kernel softmax: agreement bounded by bf16
    # operand rounding (the XLA path rounds the stored scores too)
    assert _case(2, 2, 256, 64, rel=True, masked=True,
                 dtype=jnp.bfloat16) < 3e-2


def test_dispatch_caps(monkeypatch):
    # measured win table: rel-pos only by default (flash_ab_r5.jsonl)
    assert use_flash(499, 64, rel=True)
    assert use_flash(2048, 64, rel=True)
    assert not use_flash(2561, 64, rel=True)  # VMEM byte budget
    assert not use_flash(499, 64)       # plain: XLA measured faster
    assert not use_flash(499, 64, dtype=jnp.float32)
    assert not use_flash(499, 256, rel=True)  # head_dim beyond one lane
    # the budget is dtype-aware: f32 doubles k/v residency (ADVICE r4)
    assert use_flash(499, 64, rel=True, dtype=jnp.float32)
    assert not use_flash(2048, 64, rel=True, dtype=jnp.float32)

    # the A/B escape hatch forces the kernel where legal, but never past
    # the VMEM budget — and the budget is dtype-aware (an f32/hd=128
    # launch at T_pad=4096 would exceed VMEM in Mosaic)
    monkeypatch.setenv("WAV2VEC2_FLASH_FORCE", "1")
    assert use_flash(499, 64)
    assert not use_flash(4865, 64)
    assert use_flash(4096, 64, dtype=jnp.bfloat16)
    assert not use_flash(4096, 128, dtype=jnp.float32)


def _tiny_wav2vec2(**over):
    from wav2vec2_tpu.config import Wav2Vec2ModelConfig

    d = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[10, 3],
        conv_stride=[5, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, pad_token_id=0, vocab_size=8,
        feat_extract_norm="group", conv_bias=False,
    )
    d.update(over)
    return Wav2Vec2ModelConfig.from_dict(d)


def _flag_vs_xla_logits(cfg, seed=0, batch=2, n=4000):
    import dataclasses

    from wav2vec2_tpu.models.ctc_model import wav2vec2_forward
    from wav2vec2_tpu.models.params import init_params

    params = init_params(cfg, jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    audio = jnp.asarray(rng.normal(size=(batch, n)), jnp.float32)
    lens = jnp.asarray([n, n - 700], jnp.int32)[:batch]
    base = wav2vec2_forward(params, audio, cfg, audio_lens=lens,
                            compute_dtype=jnp.float32)
    cfg_on = dataclasses.replace(cfg, use_flash_attention=True)
    flash = wav2vec2_forward(params, audio, cfg_on, audio_lens=lens,
                             compute_dtype=jnp.float32)
    scale = float(jnp.max(jnp.abs(base))) or 1.0
    return float(jnp.max(jnp.abs(base - flash))) / scale


def test_encoder_flag_equivalence_wav2vec2(monkeypatch):
    # plain attention only dispatches to the kernel when forced (the
    # measured winner at serving shapes is XLA) — force it here so the
    # flag-on path actually exercises the kernel
    monkeypatch.setenv("WAV2VEC2_FLASH_FORCE", "1")
    assert _flag_vs_xla_logits(_tiny_wav2vec2()) < 1e-4


def test_encoder_flag_equivalence_conformer_rel():
    cfg = _tiny_wav2vec2(
        model_type="wav2vec2-conformer", position_embeddings_type="relative",
        hidden_act="swish", conv_depthwise_kernel_size=7,
    )
    # the flash path evaluates sin((i−k)·w) directly from an f64 host
    # table while the factorized XLA path combines f32 sin(i·w)/cos(k·w);
    # both sit within f32-sin error of the true value
    assert _flag_vs_xla_logits(cfg) < 1e-3


def test_encoder_flag_equivalence_conformer_rotary(monkeypatch):
    monkeypatch.setenv("WAV2VEC2_FLASH_FORCE", "1")
    cfg = _tiny_wav2vec2(
        model_type="wav2vec2-conformer", position_embeddings_type="rotary",
        hidden_act="swish", conv_depthwise_kernel_size=7,
    )
    assert _flag_vs_xla_logits(cfg) < 1e-4


def test_batch_aligner_auto_flag():
    import dataclasses

    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner

    cfg = _tiny_wav2vec2()
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"a": 1, "b": 2, "|": 3}
    ba = BatchAligner(cfg, params, vocab, compute_dtype="float32")
    # conftest forces the CPU backend: auto must stay on the XLA path
    assert not ba.cfg.use_flash_attention
    ba_on = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                         use_flash_attention=True)
    assert ba_on.cfg.use_flash_attention
    # symmetric override: explicit False clears a cfg that arrived flagged
    cfg_flagged = dataclasses.replace(cfg, use_flash_attention=True)
    ba_off = BatchAligner(cfg_flagged, params, vocab,
                          compute_dtype="float32",
                          use_flash_attention=False)
    assert not ba_off.cfg.use_flash_attention


def _mesh_2d():
    import numpy as np
    from jax.sharding import Mesh

    n = len(jax.devices())
    if n < 4:
        pytest.skip("needs the forced 8-device CPU mesh")
    return Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("data", "model"))


@pytest.mark.parametrize("rel", [False, True])
def test_kernel_shard_map_matches_unsharded(rel):
    """Under a ('data', 'model') mesh the launch runs inside jax.shard_map
    (batch over 'data', heads over 'model'); per-shard results must equal
    the unsharded kernel bit-for-bit (same program, smaller grid)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh_2d()
    b, nh, t, hd = 4, 4, 200, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, nh, t, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, nh, t, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, nh, t, hd)), jnp.float32)
    lens = rng.integers(t // 2, t + 1, size=b)
    mask = jnp.asarray(
        np.where(np.arange(t)[None] < lens[:, None], 0.0, -np.inf),
        jnp.float32,
    )
    kw = {}
    if rel:
        h = nh * hd
        w_pos = jnp.asarray((rng.normal(size=(h, h)) * 0.1), jnp.float32)
        kw = dict(q_pos=jnp.asarray(rng.normal(size=(b, nh, t, hd)),
                                    jnp.float32),
                  rel_r=rel_table_rev(w_pos, nh, pad_len(t), jnp.float32))

    want = flash_attention(q, k, v, mask, scale=hd ** -0.5, **kw)

    sh = NamedSharding(mesh, P("data", "model"))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    ms = jax.device_put(mask, NamedSharding(mesh, P("data")))
    if rel:
        kw = dict(q_pos=jax.device_put(kw["q_pos"], sh),
                  rel_r=jax.device_put(
                      kw["rel_r"], NamedSharding(mesh, P("model"))))
    fn = jax.jit(functools.partial(
        flash_attention, scale=hd ** -0.5, spmd_mesh=mesh.abstract_mesh,
        interpret=True,
    ))
    got = fn(qs, ks, vs, ms, **kw)
    assert float(jnp.max(jnp.abs(got - want))) == 0.0


def test_batch_aligner_flash_under_mesh():
    """End-to-end: a conformer rel-pos BatchAligner with a mesh and flash
    forced on must produce the same paths as the unsharded flash aligner
    (the shard_map wrapper is transparent)."""
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.parallel.batching import BatchAligner
    from wav2vec2_tpu.parallel.mesh import shard_params

    mesh = _mesh_2d()
    cfg = _tiny_wav2vec2(
        model_type="wav2vec2-conformer", position_embeddings_type="relative",
        hidden_act="swish", conv_depthwise_kernel_size=7,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    vocab = {"|": 1, "a": 2, "b": 3, "c": 4}
    rng = np.random.default_rng(1)
    audio = (rng.normal(size=(4, 8000)) * 0.1).astype(np.float32)
    transcripts = ["ab cab", "ba abc", "cc ba", "abc a"]

    base = BatchAligner(cfg, params, vocab, compute_dtype="float32",
                        use_flash_attention=True)
    assert base.cfg.flash_spmd is None
    want = base.align_utterances(list(audio), transcripts)

    sharded = BatchAligner(cfg, shard_params(params, mesh), vocab,
                           compute_dtype="float32", mesh=mesh,
                           use_flash_attention=True)
    assert sharded.cfg.flash_spmd is not None
    got = sharded.align_utterances(list(audio), transcripts)
    for w_out, g_out in zip(want, got):
        assert [ (w.word, w.start_ms, w.end_ms) for w in w_out.words ] == \
               [ (g.word, g.start_ms, g.end_ms) for g in g_out.words ]
