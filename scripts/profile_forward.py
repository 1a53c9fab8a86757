"""Forward-pass profiling harness (TPU).

Measures where the batch forward time goes, component by component, and
A/B-tests layout/kernel variants (NHC channels-last feature extractor,
NHC pos-conv, attention variants). Run one experiment per process —
a hung remote compile then only loses that run:

    python scripts/profile_forward.py full fe enc head
    python scripts/profile_forward.py fe_nhc posconv posconv_nhc
    python scripts/profile_forward.py trace   # jax.profiler trace capture

Timing protocol: stage inputs on device once, warmup with fetch, then K
pipelined dispatches with a single forced fetch at the end — wall/K
approximates on-chip time (standalone per-call timing here measures the
~20-30 ms tunnel dispatch latency instead of the kernel).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str]) -> None:
    import jax
    import jax.numpy as jnp

    from wav2vec2_tpu.models.ctc_model import wav2vec2_forward
    from wav2vec2_tpu.models.encoder import encoder_forward, pos_conv_forward
    from wav2vec2_tpu.models.feature_extractor import (
        feature_extractor_forward,
        feature_projection_forward,
    )
    from wav2vec2_tpu.models.layers import linear
    from wav2vec2_tpu.models.params import init_params
    from wav2vec2_tpu.models.presets import wav2vec2_base_960h
    from wav2vec2_tpu.utils.device import ensure_backend

    platform = ensure_backend()
    print(f"platform: {platform}", flush=True)

    cfg = wav2vec2_base_960h()
    params = init_params(cfg, jax.random.PRNGKey(0))

    B, N = 32, 160_000  # 32 x 10 s
    rng = np.random.default_rng(0)
    audio_h = rng.normal(0, 1, size=(B, N)).astype(np.float32)
    audio = jnp.asarray(audio_h)
    audio_lens = jnp.full((B,), N, dtype=jnp.int32)
    dt = jnp.bfloat16

    T = 499
    H, FF, NHeads = cfg.hidden_size, cfg.intermediate_size, cfg.num_attention_heads
    hidden_h = rng.normal(0, 1, size=(B, T, H)).astype(np.float32)
    hidden = jnp.asarray(hidden_h, dtype=dt)
    feats = jnp.asarray(rng.normal(0, 1, size=(B, T, 512)), dtype=dt)

    def bench(name, fn, *args, k=20, warmup=2):
        fn_j = jax.jit(fn)
        t0 = time.perf_counter()
        out = fn_j(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        compile_s = time.perf_counter() - t0
        for _ in range(warmup):
            out = fn_j(*args)
            _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn_j(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt_ms = (time.perf_counter() - t0) * 1000.0 / k
        print(f"{name:28s} {dt_ms:9.2f} ms/call   (compile {compile_s:.1f}s)",
              flush=True)
        return dt_ms

    experiments = argv or ["full", "fe", "enc", "head"]

    for exp in experiments:
        if exp == "full":
            def full(p, a, al):
                return wav2vec2_forward(p, a, cfg, audio_lens=al, compute_dtype=dt)
            bench("full forward bf16", full, params, audio, audio_lens)
        elif exp == "full_nolens":
            def full_nl(p, a):
                return wav2vec2_forward(p, a, cfg, audio_lens=None, compute_dtype=dt)
            bench("full forward (no lens)", full_nl, params, audio)
        elif exp == "fe":
            def fe(p, a, al):
                with jax.default_matmul_precision("default"):
                    return feature_extractor_forward(
                        p["feature_extractor"], a.astype(dt), cfg, audio_lens=al)
            bench("feature extractor NCH", fe, params, audio, audio_lens)
        elif exp == "enc":
            def enc(p, h):
                with jax.default_matmul_precision("default"):
                    return encoder_forward(p["encoder"], h, cfg)
            bench("encoder (12L, T=499)", enc, params, hidden)
        elif exp == "head":
            def head(p, f):
                with jax.default_matmul_precision("default"):
                    h = feature_projection_forward(p["feature_projection"], f, cfg)
                    lg = linear(h, p["lm_head"]["kernel"], p["lm_head"]["bias"])
                    return jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
            bench("proj+lm_head+logsm", head, params, feats)
        elif exp == "posconv":
            def pc(p, h):
                with jax.default_matmul_precision("default"):
                    return pos_conv_forward(p["encoder"]["pos_conv_embed"], h, cfg)
            bench("pos-conv NCH", pc, params, hidden)
        elif exp == "attn":
            def attn_block(p, h):
                from wav2vec2_tpu.models.encoder import _self_attention
                with jax.default_matmul_precision("default"):
                    lp = jax.tree.map(lambda a: a[0], p["encoder"]["layers"])
                    return _self_attention(lp["attention"], h, None, NHeads)
            bench("1-layer attention", attn_block, params, hidden)
        elif exp == "ffn":
            def ffn_block(p, h):
                from wav2vec2_tpu.models.encoder import _feed_forward
                with jax.default_matmul_precision("default"):
                    lp = jax.tree.map(lambda a: a[0], p["encoder"]["layers"])
                    return _feed_forward(lp["feed_forward"], h)
            bench("1-layer FFN", ffn_block, params, hidden)
        elif exp == "fe_nhc":
            # channels-last variant: audio [B, N, 1] -> convs in NHC -> [B, T, C]
            def fe_nhc(p, a):
                fe_p = p["feature_extractor"]
                x = a.astype(dt)[:, :, None]  # [B, N, 1]
                for i, (out_c, k_, s_) in enumerate(
                    zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
                ):
                    w = fe_p["conv_layers"][i]["conv"]["weight"]  # [O, I, K]
                    w_nhc = w.transpose(2, 1, 0).astype(x.dtype)  # [K, I, O]
                    x = jax.lax.conv_general_dilated(
                        x, w_nhc, window_strides=(s_,), padding=[(0, 0)],
                        dimension_numbers=("NHC", "HIO", "NHC"),
                    )
                    if cfg.feat_extract_norm == "group" and i == 0:
                        from wav2vec2_tpu.models.layers import group_norm_1d
                        x = group_norm_1d(
                            x.transpose(0, 2, 1),
                            fe_p["conv_layers"][0]["layer_norm"]["weight"],
                            fe_p["conv_layers"][0]["layer_norm"]["bias"],
                            num_groups=out_c, eps=cfg.layer_norm_eps,
                        ).transpose(0, 2, 1)
                    x = jax.nn.gelu(x, approximate=False)
                return x  # [B, T, C]
            with jax.default_matmul_precision("default"):
                bench("feature extractor NHC", fe_nhc, params, audio)
        elif exp == "posconv_nhc":
            def pc_nhc(p, h):
                pp = p["encoder"]["pos_conv_embed"]
                w = pp["weight"]  # [O, I/G, K]
                w_nhc = w.transpose(2, 1, 0).astype(h.dtype)  # [K, I/G, O]
                pad = cfg.num_conv_pos_embeddings // 2
                out = jax.lax.conv_general_dilated(
                    h, w_nhc, window_strides=(1,), padding=[(pad, pad)],
                    dimension_numbers=("NHC", "HIO", "NHC"),
                    feature_group_count=cfg.num_conv_pos_embedding_groups,
                )
                out = out[:, : h.shape[1], :] + pp["bias"].astype(h.dtype)
                return jax.nn.gelu(out, approximate=False)
            with jax.default_matmul_precision("default"):
                bench("pos-conv NHC", pc_nhc, params, hidden)
        elif exp == "cost":
            def full(p, a, al):
                return wav2vec2_forward(p, a, cfg, audio_lens=al, compute_dtype=dt)
            compiled = jax.jit(full).lower(params, audio, audio_lens).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = ca.get("flops", 0)
            bytes_ = ca.get("bytes accessed", 0)
            print(f"XLA cost analysis: {flops/1e12:.3f} TFLOP, "
                  f"{bytes_/1e9:.2f} GB accessed, "
                  f"arithmetic intensity {flops/max(bytes_,1):.1f} flop/byte",
                  flush=True)
            for key in sorted(ca):
                if key.startswith("bytes accessed") and ca[key] > 1e8:
                    print(f"  {key}: {ca[key]/1e9:.2f} GB", flush=True)
        elif exp == "fe_nogn":
            def fe_nogn(p, a):
                fe_p = p["feature_extractor"]
                x = a.astype(dt)[:, None, :]
                from wav2vec2_tpu.models.layers import conv1d
                for i, (out_c, k_, s_) in enumerate(
                    zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
                ):
                    w = fe_p["conv_layers"][i]["conv"]["weight"]
                    x = conv1d(x, w, None, stride=s_)
                    x = jax.nn.gelu(x, approximate=False)
                return x
            with jax.default_matmul_precision("default"):
                bench("FE without GroupNorm", fe_nogn, params, audio)
        elif exp == "fe_nogelu":
            def fe_nogelu(p, a):
                fe_p = p["feature_extractor"]
                x = a.astype(dt)[:, None, :]
                from wav2vec2_tpu.models.layers import conv1d
                for i, (out_c, k_, s_) in enumerate(
                    zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
                ):
                    w = fe_p["conv_layers"][i]["conv"]["weight"]
                    x = conv1d(x, w, None, stride=s_)
                return x
            with jax.default_matmul_precision("default"):
                bench("FE conv-only (no GN/GELU)", fe_nogelu, params, audio)
        elif exp == "attn_bf16sm":
            def attn_bf16(p, h):
                lp = jax.tree.map(lambda a: a[0], p["encoder"]["layers"])["attention"]
                b, t, hh = h.shape
                hd = hh // NHeads
                scale = jnp.asarray(hd ** -0.5, dtype=h.dtype)
                def sh(y):
                    return y.reshape(b, t, NHeads, hd).transpose(0, 2, 1, 3)
                q = sh(linear(h, lp["q_proj"]["kernel"], lp["q_proj"]["bias"]) * scale)
                k = sh(linear(h, lp["k_proj"]["kernel"], lp["k_proj"]["bias"]))
                v = sh(linear(h, lp["v_proj"]["kernel"], lp["v_proj"]["bias"]))
                # scores stay bf16; softmax reductions still accumulate f32
                s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                               preferred_element_type=h.dtype)
                attn = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                               preferred_element_type=h.dtype)
                o = o.transpose(0, 2, 1, 3).reshape(b, t, hh)
                return linear(o, lp["out_proj"]["kernel"], lp["out_proj"]["bias"])
            with jax.default_matmul_precision("default"):
                bench("1-layer attn bf16 softmax", attn_bf16, params, hidden)
        elif exp == "attn_flash":
            try:
                from jax.experimental.pallas.ops.tpu.flash_attention import (
                    flash_attention,
                )
            except Exception as e:
                print(f"flash attention import failed: {e}", flush=True)
                continue
            def attn_fl(p, h):
                lp = jax.tree.map(lambda a: a[0], p["encoder"]["layers"])["attention"]
                b, t, hh = h.shape
                hd = hh // NHeads
                scale = jnp.asarray(hd ** -0.5, dtype=h.dtype)
                def sh(y):
                    return y.reshape(b, t, NHeads, hd).transpose(0, 2, 1, 3)
                q = sh(linear(h, lp["q_proj"]["kernel"], lp["q_proj"]["bias"]) * scale)
                k = sh(linear(h, lp["k_proj"]["kernel"], lp["k_proj"]["bias"]))
                v = sh(linear(h, lp["v_proj"]["kernel"], lp["v_proj"]["bias"]))
                # pad T to a 128 multiple; mask padded keys via additive bias
                tp = (t + 127) // 128 * 128
                pad = [(0, 0), (0, 0), (0, tp - t), (0, 0)]
                qp, kp, vp = (jnp.pad(y, pad) for y in (q, k, v))
                ab = jnp.zeros((b, NHeads, tp, tp), dtype=jnp.float32)
                ab = ab.at[:, :, :, t:].set(-1e9)
                o = flash_attention(qp, kp, vp, ab=ab, causal=False, sm_scale=1.0)
                o = o[:, :, :t, :].transpose(0, 2, 1, 3).reshape(b, t, hh)
                return linear(o, lp["out_proj"]["kernel"], lp["out_proj"]["bias"])
            with jax.default_matmul_precision("default"):
                bench("1-layer flash attention", attn_fl, params, hidden)
        elif exp in ("full_b16", "full_b64"):
            b2 = 16 if exp == "full_b16" else 64
            audio2 = jnp.asarray(rng.normal(0, 1, size=(b2, N)), dtype=jnp.float32)
            lens2 = jnp.full((b2,), N, dtype=jnp.int32)
            def full2(p, a, al):
                return wav2vec2_forward(p, a, cfg, audio_lens=al, compute_dtype=dt)
            ms = bench(f"full forward B={b2}", full2, params, audio2, lens2)
            print(f"  -> {b2 * 10.0 / (ms / 1000.0):.0f}x realtime forward-only",
                  flush=True)
        elif exp in ("enc_bf16sm", "enc_fusedqkv", "enc_both"):
            from wav2vec2_tpu.models.layers import gelu as gelu_fn, layer_norm
            bf16_sm = exp in ("enc_bf16sm", "enc_both")
            fused_qkv = exp in ("enc_fusedqkv", "enc_both")

            def attn_var(lp, x):
                b, t, hh = x.shape
                hd = hh // NHeads
                scale = jnp.asarray(hd ** -0.5, dtype=x.dtype)
                def sh(y):
                    return y.reshape(b, t, NHeads, hd).transpose(0, 2, 1, 3)
                if fused_qkv:
                    wqkv = jnp.concatenate(
                        [lp["q_proj"]["kernel"], lp["k_proj"]["kernel"],
                         lp["v_proj"]["kernel"]], axis=1)
                    bqkv = jnp.concatenate(
                        [lp["q_proj"]["bias"], lp["k_proj"]["bias"],
                         lp["v_proj"]["bias"]])
                    qkv = linear(x, wqkv, bqkv)
                    q, k, v = jnp.split(qkv, 3, axis=-1)
                    q = sh(q * scale); k = sh(k); v = sh(v)
                else:
                    q = sh(linear(x, lp["q_proj"]["kernel"], lp["q_proj"]["bias"]) * scale)
                    k = sh(linear(x, lp["k_proj"]["kernel"], lp["k_proj"]["bias"]))
                    v = sh(linear(x, lp["v_proj"]["kernel"], lp["v_proj"]["bias"]))
                if bf16_sm:
                    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                   preferred_element_type=x.dtype)
                    attn = jax.nn.softmax(s, axis=-1)
                else:
                    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                   preferred_element_type=jnp.float32)
                    attn = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
                o = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                               preferred_element_type=x.dtype)
                o = o.transpose(0, 2, 1, 3).reshape(b, t, hh)
                return linear(o, lp["out_proj"]["kernel"], lp["out_proj"]["bias"])

            def enc_var(p, h):
                eps = cfg.layer_norm_eps
                def body(x, lp):
                    hh = layer_norm(
                        x + attn_var(lp["attention"], x),
                        lp["layer_norm"]["weight"], lp["layer_norm"]["bias"], eps)
                    up = gelu_fn(linear(hh, lp["feed_forward"]["intermediate_dense"]["kernel"],
                                        lp["feed_forward"]["intermediate_dense"]["bias"]))
                    y = layer_norm(
                        hh + linear(up, lp["feed_forward"]["output_dense"]["kernel"],
                                    lp["feed_forward"]["output_dense"]["bias"]),
                        lp["final_layer_norm"]["weight"],
                        lp["final_layer_norm"]["bias"], eps)
                    return y, None
                out, _ = jax.lax.scan(body, h, p["encoder"]["layers"])
                return out
            with jax.default_matmul_precision("default"):
                bench(f"encoder 12L [{exp}]", enc_var, params, hidden)
        elif exp in ("fe_im2col", "fe_im2col_nogn"):
            from wav2vec2_tpu.models.layers import (
                conv1d_im2col,
                gelu as gelu_fn,
                group_norm_1d,
            )
            use_gn = exp == "fe_im2col"
            def fe_i2c(p, a):
                fe_p = p["feature_extractor"]
                x = a.astype(dt)[:, None, :]
                for i, (out_c, k_, s_) in enumerate(
                    zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
                ):
                    w = fe_p["conv_layers"][i]["conv"]["weight"]
                    x = conv1d_im2col(x, w, None, stride=s_)
                    if use_gn and cfg.feat_extract_norm == "group" and i == 0:
                        x = group_norm_1d(
                            x, fe_p["conv_layers"][0]["layer_norm"]["weight"],
                            fe_p["conv_layers"][0]["layer_norm"]["bias"],
                            num_groups=out_c, eps=cfg.layer_norm_eps)
                    x = gelu_fn(x)
                return x
            with jax.default_matmul_precision("default"):
                bench(f"FE im2col{' +GN' if use_gn else ''}", fe_i2c, params, audio)
        elif exp in ("fe_evenodd", "fe_evenodd_nogelu"):
            from wav2vec2_tpu.models.layers import (
                conv1d, gelu as gelu_fn, group_norm_1d,
            )
            with_gelu = exp == "fe_evenodd"
            def conv_k3s2(x, w):
                # x [B, C, T] -> out [B, O, (T-3)//2+1] via even/odd split:
                # out[t] = W0 x[2t] + W1 x[2t+1] + W2 x[2t+2]
                t = x.shape[2]
                t_out = (t - 3) // 2 + 1
                xe = x[:, :, 0::2]   # x[2t]
                xo = x[:, :, 1::2]   # x[2t+1]
                w0, w1, w2 = w[:, :, 0], w[:, :, 1], w[:, :, 2]
                y = (jnp.einsum("oc,bct->bot", w0, xe[:, :, :t_out],
                                preferred_element_type=x.dtype)
                     + jnp.einsum("oc,bct->bot", w1, xo[:, :, :t_out],
                                  preferred_element_type=x.dtype)
                     + jnp.einsum("oc,bct->bot", w2, xe[:, :, 1:t_out + 1],
                                  preferred_element_type=x.dtype))
                return y
            def conv_k2s2(x, w):
                t = x.shape[2]
                t_out = t // 2
                xe = x[:, :, 0:2*t_out:2]
                xo = x[:, :, 1:2*t_out:2]
                return (jnp.einsum("oc,bct->bot", w[:, :, 0], xe,
                                   preferred_element_type=x.dtype)
                        + jnp.einsum("oc,bct->bot", w[:, :, 1], xo,
                                     preferred_element_type=x.dtype))
            def fe_eo(p, a):
                fe_p = p["feature_extractor"]
                x = a.astype(dt)[:, None, :]
                for i, (out_c, k_, s_) in enumerate(
                    zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
                ):
                    w = fe_p["conv_layers"][i]["conv"]["weight"].astype(dt)
                    if k_ == 3 and s_ == 2:
                        x = conv_k3s2(x, w)
                    elif k_ == 2 and s_ == 2:
                        x = conv_k2s2(x, w)
                    else:
                        x = conv1d(x, w, None, stride=s_)
                    if cfg.feat_extract_norm == "group" and i == 0:
                        x = group_norm_1d(
                            x, fe_p["conv_layers"][0]["layer_norm"]["weight"],
                            fe_p["conv_layers"][0]["layer_norm"]["bias"],
                            num_groups=out_c, eps=cfg.layer_norm_eps)
                    if with_gelu:
                        x = gelu_fn(x)
                return x
            with jax.default_matmul_precision("default"):
                bench(f"FE even/odd{'' if with_gelu else ' (no gelu)'}",
                      fe_eo, params, audio)
        elif exp == "gelu_bench":
            big = jnp.asarray(rng.normal(0, 1, size=(32, 512, 31999)), dtype=dt)
            bench("gelu erf (exact)",
                  lambda x: jax.nn.gelu(x, approximate=False), big)
            bench("gelu tanh (approx)",
                  lambda x: jax.nn.gelu(x, approximate=True), big)
            bench("gelu sigmoid (x*sig(1.702x))",
                  lambda x: x * jax.nn.sigmoid(1.702 * x), big)
            bench("erf f32 then cast",
                  lambda x: (0.5 * x.astype(jnp.float32) *
                             (1 + jax.lax.erf(x.astype(jnp.float32) / np.sqrt(2))
                              )).astype(dt), big)
            bench("relu (floor)", jax.nn.relu, big)
        elif exp == "fe_gnfold":
            # GroupNorm statistics computed from the RAW AUDIO via lag
            # products (y = w ⊛ x ⇒ E[y], E[y²] are bilinear in the 10x10
            # window-product matrix R), so the 1 GB layer-0 activation is
            # never re-read for stats and the normalize+GELU folds into the
            # conv epilogue as a per-channel affine.
            def fe_gnfold(p, a, al):
                fe_p = p["feature_extractor"]
                gn = fe_p["conv_layers"][0]["layer_norm"]
                w1 = fe_p["conv_layers"][0]["conv"]["weight"]  # [C,1,K]
                k1, s1 = cfg.conv_kernel[0], cfg.conv_stride[0]
                xf = a.astype(jnp.float32)
                t1 = (N - k1) // s1 + 1
                X = jnp.stack(
                    [xf[:, j : j + s1 * t1 : s1] for j in range(k1)], axis=-1
                )  # [B, T1, K]
                t_lens1 = (al - k1) // s1 + 1
                tm = (jnp.arange(t1)[None, :] < t_lens1[:, None]).astype(
                    jnp.float32)
                cnt = jnp.maximum(tm.sum(1), 1.0)
                Xm = X * tm[:, :, None]
                w2 = w1[:, 0, :].astype(jnp.float32)
                hi = jax.lax.Precision.HIGHEST
                m = Xm.sum(axis=1) / cnt[:, None]
                R = jnp.einsum("btk,btj->bkj", Xm, X, precision=hi) / cnt[:, None, None]
                mean_c = jnp.einsum("bk,ck->bc", m, w2, precision=hi)
                e2 = jnp.einsum("ck,cj,bkj->bc", w2, w2, R, precision=hi)
                var_c = jnp.maximum(e2 - mean_c**2, 0.0)
                ga = gn["weight"].astype(jnp.float32)
                be = gn["bias"].astype(jnp.float32)
                aff_a = ga[None] * jax.lax.rsqrt(var_c + cfg.layer_norm_eps)
                aff_b = be[None] - mean_c * aff_a

                from wav2vec2_tpu.models.layers import conv1d, gelu as _gelu
                x = a.astype(dt)[:, None, :]
                lens = al
                for i, (out_c, k_, s_) in enumerate(
                    zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
                ):
                    wgt = fe_p["conv_layers"][i]["conv"]["weight"]
                    x = conv1d(x, wgt, None, stride=s_)
                    lens = (lens - k_) // s_ + 1
                    if i == 0:
                        x = (x.astype(jnp.float32) * aff_a[:, :, None]
                             + aff_b[:, :, None])
                        x = x * tm[:, None, :]
                        x = x.astype(dt)
                    x = _gelu(x)
                return x
            with jax.default_matmul_precision("default"):
                bench("FE (GN stats from input)", fe_gnfold, params, audio,
                      audio_lens)
        elif exp == "fe_matmul":
            # whole conv stack as channels-last matmuls: in NHC the
            # stride-aligned window split is a FREE reshape ([B, T, C] →
            # [B, T/2, 2C]), each layer becomes 1-2 dot_generals, and the
            # GELU / GN-affine epilogues fuse into the matmuls — each
            # activation is written once instead of (conv write + GELU
            # read/write). GN stats come from the audio via lag products
            # (see fe_gnfold).
            def fe_matmul(p, a, al):
                fe_p = p["feature_extractor"]
                hi = jax.lax.Precision.HIGHEST
                k1, s1 = cfg.conv_kernel[0], cfg.conv_stride[0]
                n = a.shape[1]
                t1 = (n - k1) // s1 + 1
                xf = a.astype(jnp.float32)
                X = jnp.stack(
                    [xf[:, j : j + s1 * t1 : s1] for j in range(k1)], -1)
                tl1 = (al - k1) // s1 + 1
                tm = (jnp.arange(t1)[None, :] < tl1[:, None]).astype(
                    jnp.float32)
                cnt = jnp.maximum(tm.sum(1), 1.0)
                Xm = X * tm[:, :, None]
                w1f = fe_p["conv_layers"][0]["conv"]["weight"][:, 0, :].astype(
                    jnp.float32)
                m = Xm.sum(1) / cnt[:, None]
                R = jnp.einsum("btk,btj->bkj", Xm, X, precision=hi) / cnt[:, None, None]
                mean_c = jnp.einsum("bk,ck->bc", m, w1f, precision=hi)
                e2 = jnp.einsum("ck,cj,bkj->bc", w1f, w1f, R, precision=hi)
                var_c = jnp.maximum(e2 - mean_c**2, 0.0)
                gn = fe_p["conv_layers"][0]["layer_norm"]
                aff_a = (gn["weight"].astype(jnp.float32)[None]
                         * jax.lax.rsqrt(var_c + cfg.layer_norm_eps))
                aff_b = gn["bias"].astype(jnp.float32)[None] - mean_c * aff_a

                from wav2vec2_tpu.models.layers import gelu as _gelu
                w = fe_p["conv_layers"][0]["conv"]["weight"]
                W1 = w[:, 0, :5].T.astype(dt)
                W2 = w[:, 0, 5:].T.astype(dt)
                blk = a.astype(dt)[:, : s1 * (t1 + 1)].reshape(B, t1 + 1, s1)
                y = blk[:, :t1] @ W1 + blk[:, 1 : t1 + 1] @ W2
                y = y.astype(jnp.float32) * aff_a[:, None, :] + aff_b[:, None, :]
                y = (y * tm[:, :, None]).astype(dt)
                y = _gelu(y)
                for i in range(1, len(cfg.conv_dim)):
                    k_, s_ = cfg.conv_kernel[i], cfg.conv_stride[i]
                    wi = fe_p["conv_layers"][i]["conv"]["weight"]
                    T_ = y.shape[1]
                    t_out = (T_ - k_) // s_ + 1
                    O, I = wi.shape[0], wi.shape[1]
                    if k_ == 2 and s_ == 2:
                        Wf = wi.transpose(2, 1, 0).reshape(2 * I, O).astype(dt)
                        y = y[:, : 2 * t_out].reshape(B, t_out, 2 * I) @ Wf
                    elif k_ == 3 and s_ == 2:
                        W01 = wi[:, :, :2].transpose(2, 1, 0).reshape(
                            2 * I, O).astype(dt)
                        W2_ = wi[:, :, 2].T.astype(dt)
                        pairs = y[:, : 2 * t_out].reshape(B, t_out, 2 * I)
                        ev_next = y[:, 2 : 2 * t_out + 1 : 2]
                        y = pairs @ W01 + ev_next @ W2_
                    else:
                        raise NotImplementedError((k_, s_))
                    y = _gelu(y)
                return y  # [B, T, C] channels-last
            with jax.default_matmul_precision("default"):
                bench("FE as fused matmuls", fe_matmul, params, audio,
                      audio_lens)
        elif exp == "fe_gelu_bf16":
            # does the f32 cast inside gelu() block conv-output fusion?
            def fe_gb(p, a):
                fe_p = p["feature_extractor"]
                x = a.astype(dt)[:, None, :]
                from wav2vec2_tpu.models.layers import conv1d
                for i, (out_c, k_, s_) in enumerate(
                    zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
                ):
                    w = fe_p["conv_layers"][i]["conv"]["weight"]
                    x = conv1d(x, w, None, stride=s_)
                    x = jax.nn.gelu(x, approximate=False)  # bf16 erf
                return x
            with jax.default_matmul_precision("default"):
                bench("FE + bf16-erf GELU", fe_gb, params, audio)
        elif exp == "fe_gelu_tanh":
            def fe_gt(p, a):
                fe_p = p["feature_extractor"]
                x = a.astype(dt)[:, None, :]
                from wav2vec2_tpu.models.layers import conv1d
                for i, (out_c, k_, s_) in enumerate(
                    zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
                ):
                    w = fe_p["conv_layers"][i]["conv"]["weight"]
                    x = conv1d(x, w, None, stride=s_)
                    x = jax.nn.gelu(x, approximate=True)  # fusion behavior probe
                return x
            with jax.default_matmul_precision("default"):
                bench("FE + tanh GELU (probe)", fe_gt, params, audio)
        elif exp == "fe_relu":
            def fe_rl(p, a):
                fe_p = p["feature_extractor"]
                x = a.astype(dt)[:, None, :]
                from wav2vec2_tpu.models.layers import conv1d
                for i, (out_c, k_, s_) in enumerate(
                    zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
                ):
                    w = fe_p["conv_layers"][i]["conv"]["weight"]
                    x = conv1d(x, w, None, stride=s_)
                    x = jnp.maximum(x, 0)  # cheapest epilogue: fusion floor
                return x
            with jax.default_matmul_precision("default"):
                bench("FE + relu (fusion floor)", fe_rl, params, audio)
        elif exp == "fe_gelu_as":
            # Abramowitz–Stegun 7.1.26 erf (max err 1.5e-7) evaluated in
            # f32: cheap fusable ops (rcp + exp + 6 FMA) instead of XLA's
            # expensive erf lowering
            def gelu_as(x):
                xf = x.astype(jnp.float32)
                z = xf * jnp.float32(0.7071067811865476)
                s = jnp.sign(z)
                za = jnp.abs(z)
                u = 1.0 / (1.0 + jnp.float32(0.3275911) * za)
                poly = ((((jnp.float32(1.061405429) * u
                           + jnp.float32(-1.453152027)) * u
                          + jnp.float32(1.421413741)) * u
                         + jnp.float32(-0.284496736)) * u
                        + jnp.float32(0.254829592)) * u
                erf = s * (1.0 - poly * jnp.exp(-za * za))
                return (jnp.float32(0.5) * xf * (1.0 + erf)).astype(x.dtype)

            def fe_as(p, a):
                fe_p = p["feature_extractor"]
                x = a.astype(dt)[:, None, :]
                from wav2vec2_tpu.models.layers import conv1d
                for i, (out_c, k_, s_) in enumerate(
                    zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
                ):
                    w = fe_p["conv_layers"][i]["conv"]["weight"]
                    x = conv1d(x, w, None, stride=s_)
                    x = gelu_as(x)
                return x
            with jax.default_matmul_precision("default"):
                bench("FE + A&S-erf GELU", fe_as, params, audio)
        elif exp == "trace":
            def full(p, a, al):
                return wav2vec2_forward(p, a, cfg, audio_lens=al, compute_dtype=dt)
            fn_j = jax.jit(full)
            out = fn_j(params, audio, audio_lens)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            import jax.profiler
            trace_dir = "/root/repo/profiles/forward_trace"
            try:
                with jax.profiler.trace(trace_dir):
                    for _ in range(3):
                        out = fn_j(params, audio, audio_lens)
                    _ = float(jnp.sum(out.astype(jnp.float32)))
                print(f"trace written to {trace_dir}", flush=True)
            except Exception as e:
                print(f"trace capture FAILED: {type(e).__name__}: {e}", flush=True)
        else:
            print(f"unknown experiment: {exp}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
