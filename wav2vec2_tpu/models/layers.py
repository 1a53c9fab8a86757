"""Normalization / conv primitives for the wav2vec2 graph.

Functional JAX equivalents of the reference's hand-rolled layers
(/root/reference/src/model/layers.rs:4-96): LayerNorm with biased variance
over the last dim, and PyTorch-equivalent GroupNorm over (C/G, T) — here
extended with optional time masking so a padded batch produces bit-identical
statistics to per-utterance execution (the reference is single-utterance and
never faces this; HF torch simply degrades on padded GroupNorm).

Norm statistics are always computed in float32 regardless of the compute
dtype — the TPU analog of the reference's "pos-conv stays f32" precision
lesson (SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Erf-GELU, matching HF transformers' `gelu` activation used by
    wav2vec2 (torch nn.functional.gelu default).

    f32 inputs use the exact erf (the cross-implementation parity path).
    bf16 compute uses an Abramowitz–Stegun 7.1.26 erf evaluated in f32
    (rcp + exp + 6 FMAs, max |erf err| 1.5e-7 ⇒ max GELU err 2.1e-7 —
    two orders below bf16's own 2^-9 rounding, so outputs differ from the
    exact form by at most one bf16 ulp). The win: XLA's erf lowering costs
    ~14 ms of VPU time across the feature extractor's 1.0B activations and
    defeats conv-epilogue fusion, while the A&S form fuses — measured
    25.9 → 15.1 ms for the whole conv stack at B=32 × 10 s
    (scripts/profile_forward.py fe / fe_gelu_as / fe_relu)."""
    if x.dtype == jnp.float32:
        return jax.nn.gelu(x, approximate=False)
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


def silu(x: jnp.ndarray) -> jnp.ndarray:
    """SiLU / swish (x · sigmoid(x)) — transformers ACT2FN["swish"], the
    activation released Wav2Vec2-Conformer checkpoints use for the FFN and
    conv-module. Evaluated in f32 (one exp + rcp; fuses into conv/matmul
    epilogues under XLA, no erf-style lowering problem)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def act_fn(name: str):
    """ACT2FN analog for the activations the supported families ship with."""
    try:
        return {"gelu": gelu, "swish": silu, "silu": silu,
                "relu": lambda x: jnp.maximum(x, 0)}[name]
    except KeyError:
        raise NotImplementedError(
            f"hidden_act {name!r} is not supported (expected gelu/swish/relu)"
        ) from None


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """LayerNorm over the last dim with biased variance (layers.rs:17-27)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    centered = xf - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    normed = centered * jax.lax.rsqrt(var + jnp.float32(eps))
    out = normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def group_norm_1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float,
    time_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """PyTorch-equivalent GroupNorm over a [B, C, T] tensor, normalizing over
    (channels_per_group, time) (layers.rs:61-89).

    `time_mask` [B, T] (1 = valid) restricts the statistics to valid frames so
    padded batches match unpadded execution exactly; padded positions are
    zeroed on output.
    """
    b, c, t = x.shape
    assert c % num_groups == 0
    cpg = c // num_groups
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, num_groups, cpg, t)

    # One-pass statistics (var = E[x^2] - E[x]^2): both reductions share a
    # single traversal of the input, which XLA fuses into one kernel — the
    # mean-then-centered-variance form costs two full reads of the layer-0
    # activation (~1 GB at B=32 x 10 s). f32 accumulation keeps the
    # cancellation error ~1e-6 at these activation scales (tested vs the
    # two-pass form and vs torch GroupNorm).
    if time_mask is None:
        s1 = jnp.mean(xf, axis=(2, 3), keepdims=True)
        s2 = jnp.mean(xf * xf, axis=(2, 3), keepdims=True)
        mean = s1
        var = jnp.maximum(s2 - s1 * s1, 0.0)
        centered = xf - mean
    else:
        m = time_mask.astype(jnp.float32).reshape(b, 1, 1, t)
        denom = jnp.maximum(jnp.sum(m, axis=(2, 3), keepdims=True) * cpg, 1.0)
        xm = xf * m
        s1 = jnp.sum(xm, axis=(2, 3), keepdims=True) / denom
        s2 = jnp.sum(xm * xf, axis=(2, 3), keepdims=True) / denom
        mean = s1
        var = jnp.maximum(s2 - s1 * s1, 0.0)
        centered = (xf - mean) * m

    normed = centered * jax.lax.rsqrt(var + jnp.float32(eps))
    out = normed.reshape(b, c, t)
    out = out * weight.astype(jnp.float32).reshape(1, c, 1) + bias.astype(
        jnp.float32
    ).reshape(1, c, 1)
    if time_mask is not None:
        out = out * time_mask.astype(jnp.float32).reshape(b, 1, t)
    return out.astype(orig_dtype)


def conv1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: int,
    padding: int = 0,
    groups: int = 1,
    precision=None,
) -> jnp.ndarray:
    """1-D convolution on [B, C_in, T] with torch-layout weight [C_out,
    C_in/groups, K]. Uses lax.conv_general_dilated so XLA tiles it onto the
    MXU. Pass precision=HIGHEST for f32 parity runs — XLA's DEFAULT f32
    conv/matmul uses reduced-precision passes."""
    out = jax.lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        precision=precision,
    )
    if bias is not None:
        out = out + bias.astype(x.dtype).reshape(1, -1, 1)
    return out


def feature_conv1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: int,
) -> jnp.ndarray:
    """VALID 1-D convolution for the feature-extractor stack, dispatched per
    platform: the native lax.conv on TPU (fastest — XLA tiles it onto the
    MXU directly), the im2col formulation elsewhere, which works around an
    XLA-CPU miscompile where a conv fused with upstream producers returns a
    wrong LAST output frame for specific input lengths (regression test:
    tests/test_conv_im2col.py)."""
    if jax.default_backend() == "tpu":
        return conv1d(x, weight, bias, stride=stride)
    return conv1d_im2col(x, weight, bias, stride)


def conv1d_im2col(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: int,
) -> jnp.ndarray:
    """VALID 1-D convolution via K strided slices + one contraction
    (im2col): the contraction maps onto the MXU as a plain matmul, and the
    math is deterministic across platforms (see feature_conv1d)."""
    _, _, t = x.shape
    _, _, k = weight.shape
    t_out = (t - k) // stride + 1
    cols = [
        jax.lax.slice_in_dim(x, j, j + stride * (t_out - 1) + 1, stride=stride, axis=2)
        for j in range(k)
    ]
    patches = jnp.stack(cols, axis=2)  # [B, C_in, K, T_out]
    out = jnp.einsum(
        "oik,bikt->bot",
        weight.astype(x.dtype),
        patches,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias.astype(x.dtype).reshape(1, -1, 1)
    return out


def linear(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, precision=None
) -> jnp.ndarray:
    """Dense layer; kernel stored [in, out] (pre-transposed from torch's
    [out, in] at load time for TPU-friendly layouts)."""
    out = jnp.dot(
        x, kernel.astype(x.dtype), preferred_element_type=x.dtype,
        precision=precision,
    )
    return out + bias.astype(x.dtype)


def fold_weight_norm(
    weight_g: jnp.ndarray, weight_v: jnp.ndarray
) -> jnp.ndarray:
    """Reconstruct a weight-normalized conv weight from (weight_g, weight_v).

    Handles both weight_g layouts the reference handles
    (feature_extractor.rs:113-133): `(1, 1, K)` (torch weight_norm dim=2, the
    HF pos-conv) normalizes per kernel position over (out, in); `(out, 1, 1)`
    normalizes per output channel over (in, K).
    """
    import numpy as np

    # host-side numpy: this is a load-time transform, and eager device ops
    # here would cost one dispatch round-trip per checkpoint tensor
    wv = np.asarray(weight_v, dtype=np.float32)
    wg = np.asarray(weight_g, dtype=np.float32)
    if wg.shape == (1, 1, wv.shape[2]):
        norm = np.sqrt(np.sum(wv * wv, axis=(0, 1), keepdims=True))
        return wv / norm * wg
    if wg.shape == (wv.shape[0], 1, 1):
        norm = np.sqrt(np.sum(wv * wv, axis=(1, 2), keepdims=True))
        return wv / norm * wg
    raise ValueError(f"unsupported weight_g shape {wg.shape} for weight_v {wv.shape}")
