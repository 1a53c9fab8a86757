"""Int8 quantized serving mode for the encoder's projection matmuls.

TPU-native rationale: the v5e MXU executes int8×int8→int32 at ~2× its bf16
rate, and the encoder's six projections per layer (q/k/v/out + FFN up/down)
carry ~85% of the encoder FLOPs. This module provides:

- `quantize_encoder_int8(params)` — offline per-output-channel symmetric
  weight quantization of the scan-stacked encoder layers (and optionally
  the feature projection). Weights become {kernel_q: int8 [.., in, out],
  scale: f32 [.., out]}; biases / LayerNorms / pos-conv stay untouched.
- `linear_maybe_quantized(x, p)` — dispatch used by the encoder: dynamic
  per-row symmetric activation quantization (abs-max → int8), int8 MXU
  matmul with int32 accumulation, dequantize in the epilogue.

This is an OPT-IN serving mode (`compute_dtype="int8"` keeps the rest of
the pipeline in bf16): alignment is an argmax path, which is robust to
~1e-2 logit perturbation, but the parity contract vs the reference
(±20 ms boundaries) is validated for f32/bf16 — int8 is for throughput
serving where the operator accepts the quality trade. Boundary agreement
vs bf16 is asserted on synthetic models in tests/test_quantize.py.

Reference scope note: the reference has no quantized path (its fp16 ONNX
attempt is the closest analog, scripts/export_ctc_model_to_onnx.py
cuda-safe-fp16); this is a beyond-parity TPU feature.

MEASURED RESULT on v5e through this XLA stack (scripts/probe_int8.py +
full-encoder A/B at B=128, T=499): pure int8 matmuls run 1.24-1.65x bf16
(141-253 TOP/s), but the dynamic quantize/dequantize VPU passes serialize
against the MXU inside XLA fusions (the same ceiling documented in
BENCHMARKS.md for matmul epilogues), so the real encoder is a WASH:
150.1 ms bf16 vs 148.8 ms int8. The mode stays available (correct,
boundary-safe to ±1 frame on synthetic models) for stacks where quant
epilogues fuse better; it is NOT enabled by default and bench.py does not
use it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# projections quantized inside each encoder layer
_LAYER_PROJ_KEYS = (
    ("attention", "q_proj"),
    ("attention", "k_proj"),
    ("attention", "v_proj"),
    ("attention", "out_proj"),
    ("feed_forward", "intermediate_dense"),
    ("feed_forward", "output_dense"),
)


def quantize_linear_int8(p: dict) -> dict:
    """{kernel: f32/bf16 [.., in, out], bias} → {kernel_q, scale, bias}.

    Per-output-channel symmetric: scale[o] = amax(|W[:, o]|) / 127 (computed
    in f32), kernel_q = round(W / scale) clipped to [-127, 127]. Works on
    scan-stacked kernels ([L, in, out]) — the reduction is over the `in`
    axis only."""
    w = jnp.asarray(p["kernel"], dtype=jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # [.., 1, out]
    scale = jnp.maximum(amax / 127.0, 1e-12)
    kernel_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"kernel_q": kernel_q, "scale": scale.squeeze(-2)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_encoder_int8(params: dict) -> dict:
    """Returns a new full-model params pytree with the encoder layer
    projections quantized to int8 (everything else aliased unchanged)."""
    params = dict(params)
    enc = dict(params["encoder"])
    layers = {k: dict(v) if isinstance(v, dict) else v
              for k, v in enc["layers"].items()}
    for group, name in _LAYER_PROJ_KEYS:
        layers[group] = dict(layers[group])
        layers[group][name] = quantize_linear_int8(layers[group][name])
    enc["layers"] = layers
    params["encoder"] = enc
    return params


def linear_int8(x: jnp.ndarray, kernel_q: jnp.ndarray, scale: jnp.ndarray,
                bias: jnp.ndarray | None) -> jnp.ndarray:
    """Dynamic-activation int8 matmul: per-row abs-max quantization of x,
    int8×int8→int32 on the MXU, f32 dequant epilogue, output in x.dtype.

    x: [..., in]; kernel_q: [in, out] int8; scale: [out] f32."""
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)  # [..., 1]
    xscale = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
    y32 = jax.lax.dot_general(
        xq, kernel_q,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y32.astype(jnp.float32) * xscale * scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def linear_maybe_quantized(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Dispatch: int8 path when the params entry carries quantized weights,
    else the plain bf16/f32 linear."""
    if "kernel_q" in p:
        return linear_int8(x, p["kernel_q"], p["scale"], p.get("bias"))
    from .layers import linear

    return linear(x, p["kernel"], p.get("bias"))


def cast_compute_weights_bf16(params: dict):
    """Store compute weights (matmul kernels/biases, conv weights) in bf16.

    Under bf16 compute every consumption site casts weights with
    `astype(x.dtype)` anyway (layers.linear, feature_conv1d,
    pos_conv_forward, the data2vec stack), so bf16 STORAGE is bit-identical
    to f32 storage — while halving weight HBM (4 GB → 2 GB for mms-1b) and
    checkpoint→device transfer. Normalization parameters, int8 dequant
    scales AND int8-quantized layers' biases (linear_int8 consumes its
    bias in f32), and the WavLM f32-consumed leaves (rel_attn_embed,
    gru_rel_pos_const) stay f32. Only valid with compute_dtype bfloat16
    (exactness is asserted in tests/test_quantize.py). Works on host
    (numpy) and device trees alike — cast HOST-side before device_put to
    actually halve the transfer (params_from_flat_dict's
    compute_weights_dtype does this)."""
    KEEP_F32_KEYS = {"layer_norm", "final_layer_norm", "norm",
                     "ffn1_layer_norm", "ffn2_layer_norm",
                     "self_attn_layer_norm",  # conformer LNs (f32-consumed)
                     "depthwise_layer_norm", "output_norm",  # sew/conformer
                     "rel_embeddings", "rel_embeddings_layer_norm",  # sew-d
                     "residual_layer_norm", "ffn_layer_norm",  # bert adapter
                     "proj_layer_norm", "batch_norm",  # adapter/BN pos-conv
                     "rel_attn_embed", "gru_rel_pos_const",
                     "scale"}  # int8 dequant scales stay f32

    def walk(node):
        if isinstance(node, dict):
            quantized = "kernel_q" in node
            return {
                k: (v if (k in KEEP_F32_KEYS or (quantized and k == "bias"))
                    else walk(v))
                for k, v in node.items()
            }
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        if hasattr(node, "dtype") and node.dtype == jnp.float32:
            return node.astype(jnp.bfloat16)
        return node

    return walk(params)
