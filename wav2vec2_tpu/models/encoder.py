"""wav2vec2 transformer encoder.

Parity target: HF transformers `Wav2Vec2Encoder` /
`Wav2Vec2EncoderStableLayerNorm` semantics, covering the same surface as the
reference's encoder (/root/reference/src/model/encoder.rs:8-179):

- PosConvEmbed: grouped Conv1d (kernel = num_conv_pos_embeddings,
  pad = K/2, groups = num_conv_pos_embedding_groups) with weight-norm folded
  at load time, output narrowed back to seq_len (encoder.rs:31-37), GELU,
  residual add;
- per-layer MHSA with the query pre-scaled by head_dim^-0.5 (encoder.rs:72),
  f32 softmax, out proj; FFN up(GELU)/down;
- both norm orders (encoder.rs:136-150): `do_stable_layer_norm` ⇒ pre-norm
  with the encoder-level LayerNorm applied AFTER the layers; post-norm
  (wav2vec2-base) ⇒ encoder-level LayerNorm applied after the pos-conv
  residual, BEFORE the layers. NOTE: the reference applies the encoder-level
  LN after the layers in both modes (encoder.rs:172-178); we follow the HF
  order instead, which is what real checkpoints were trained with — verified
  against transformers' torch implementation in tests/test_model_parity.py.

TPU-native design: the N encoder layers are STACKED (leading axis L) and
iterated with `lax.scan`, so compile time is depth-independent and the layer
weights form a single sharded array per parameter (clean tensor-parallel
pjit specs later). Attention key masking makes padded batches equal
per-utterance execution.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import Wav2Vec2ModelConfig
from .layers import gelu, layer_norm, linear
from .quantize import linear_maybe_quantized


def pos_conv_forward(
    params: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    frame_mask: jnp.ndarray | None = None,
    stride: int = 1,
) -> jnp.ndarray:
    """x: [B, T, H] → positional embeddings [B, T, H] (or [B, ~T/stride, H]
    for SEW's strided variant).

    Runs in NHC (channels-last) layout: [B, T, H] is already channels-last,
    so the grouped conv needs no activation transposes, and channels map to
    TPU lanes (measured 5.0 ms vs 7.6 ms for the NCH formulation at
    B=32, T=499 — scripts/profile_forward.py posconv/posconv_nhc). The
    torch-layout weight [O, I/G, K] is transposed to [K, I/G, O] in-graph
    (one small weight reshuffle, folded into the conv by XLA)."""
    seq_len = x.shape[1]
    pad = cfg.num_conv_pos_embeddings // 2
    if "batch_norm" in params:
        # conv_pos_batch_norm (mHuBERT-147): folded inference BatchNorm on
        # the conv input. The affine shifts padded positions off zero, so
        # they are re-masked to keep padded batch == unpadded forward (the
        # unpadded conv sees its own zero padding there).
        bn = params["batch_norm"]
        x = x * bn["scale"].astype(x.dtype) + bn["shift"].astype(x.dtype)
        if frame_mask is not None:
            x = x * frame_mask[:, :, None].astype(x.dtype)
    w = params["weight"].transpose(2, 1, 0).astype(x.dtype)  # [K, I/G, O]
    h = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=cfg.num_conv_pos_embedding_groups,
    )
    if cfg.num_conv_pos_embeddings % 2 == 0:
        # SamePad: an even kernel with pad=K/2 produces one extra output
        # position; torch drops the LAST one (for stride=1 this equals
        # narrowing back to seq_len)
        h = h[:, :-1, :]
    assert stride > 1 or h.shape[1] == seq_len
    h = h + params["bias"].astype(x.dtype)
    return gelu(h)


def pos_conv_stack_forward(
    params: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    frame_mask: jnp.ndarray | None,
) -> jnp.ndarray:
    """data2vec-audio positional embedding: a stack of
    cfg.num_conv_pos_embeddings grouped convs (kernel
    cfg.conv_pos_kernel_size, odd → length-preserving), each followed by a
    NON-affine LayerNorm over channels and GELU (transformers
    Data2VecAudioPositionalConvLayer parity; no weight norm).

    Padding-exactness: unlike the single wav2vec2 conv, a multi-layer stack
    lets padded positions' (nonzero) intermediate activations leak back into
    valid frames at the next conv — so padded frames are re-zeroed after
    every layer, reproducing the zero padding the unpadded conv would see.
    """
    pad = cfg.conv_pos_kernel_size // 2
    seq_len = x.shape[1]

    def body(h, lp):
        w = lp["weight"].transpose(2, 1, 0).astype(h.dtype)  # [K, I/G, O]
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=cfg.num_conv_pos_embedding_groups,
        )
        h = h[:, :seq_len, :]  # even kernels produce T+1 (HF pad-layer trim)
        h = h + lp["bias"].astype(h.dtype)
        mean = jnp.mean(h.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(h.astype(jnp.float32), axis=-1, keepdims=True)
        h = ((h.astype(jnp.float32) - mean)
             * jax.lax.rsqrt(var + cfg.layer_norm_eps)).astype(h.dtype)
        h = gelu(h)
        if frame_mask is not None:
            h = h * frame_mask[:, :, None].astype(h.dtype)
        return h, None

    # layers are STACKED (leading axis L) and iterated with lax.scan, like
    # the encoder layers — 19 unrolled convs made the HLO (and compiles)
    # depth-proportional
    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def _self_attention(
    p: dict,
    x: jnp.ndarray,
    mask_bias: jnp.ndarray | None,
    num_heads: int,
    position_bias: jnp.ndarray | None = None,
    use_flash: bool = False,
    flash_spmd=None,
) -> jnp.ndarray:
    b, t, h = x.shape
    head_dim = h // num_heads
    scale = jnp.asarray(head_dim ** -0.5, dtype=x.dtype)

    if position_bias is not None:
        # WavLM gated relative position bias (WavLMAttention parity): the
        # shared [H, T, T] bucketed bias is scaled per (batch, head, query
        # position) by gates computed from the layer input
        g = x.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)
        proj = linear_maybe_quantized(g, p["gru_rel_pos_linear"])
        proj = proj.reshape(b, num_heads, t, 2, 4).sum(-1).astype(jnp.float32)
        gates = jax.nn.sigmoid(proj)  # [B, H, T, 2]
        ga, gb = gates[..., 0:1], gates[..., 1:2]
        const = p["gru_rel_pos_const"].reshape(1, num_heads, 1, 1)
        gate_out = ga * (gb * const.astype(jnp.float32) - 1.0) + 2.0
        gated_bias = gate_out * position_bias[None].astype(jnp.float32)
        mask_bias = gated_bias if mask_bias is None else gated_bias + mask_bias

    def split_heads(y):
        return y.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)

    q = split_heads(linear_maybe_quantized(x, p["q_proj"]) * scale)
    k = split_heads(linear_maybe_quantized(x, p["k_proj"]))
    v = split_heads(linear_maybe_quantized(x, p["v_proj"]))

    if use_flash and position_bias is None:
        from ..ops import flash_attention as fa

        if fa.use_flash(t, head_dim, dtype=x.dtype):
            # fused kernel: no [B, H, T, T] score tensor in HBM, f32
            # softmax in VMEM (ops/flash_attention.py). Measured dispatch:
            # XLA's fused attention wins for this plain style at every
            # serving shape (use_flash returns False unless forced —
            # reports/flash_ab_r5.jsonl). mask_bias is the [B, 1, 1, T]
            # additive key mask here (the gated WavLM bias is excluded by
            # `position_bias is None`).
            mb = None if mask_bias is None else mask_bias.reshape(b, t)
            out = fa.flash_attention(q, k, v, mb, scale=1.0,
                                     spmd_mesh=flash_spmd)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, h)
            return linear_maybe_quantized(out, p["out_proj"])

    if x.dtype == jnp.float32:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        if mask_bias is not None:
            scores = scores + mask_bias
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    else:
        # bf16 compute: keep the [B, H, T, T] score tensor in bf16 — it is
        # the largest activation in the layer and f32 scores double its HBM
        # traffic (measured 47.4 -> 34.4 ms for the 12-layer encoder at
        # B=32, T=499 — scripts/profile_forward.py enc_bf16sm). The MXU
        # still accumulates the QK^T products in f32 internally; only the
        # stored scores round to bf16 (~2^-8 relative, inside bf16 noise).
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=x.dtype)
        if mask_bias is not None:
            scores = scores + mask_bias.astype(x.dtype)
        attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, h)
    return linear_maybe_quantized(out, p["out_proj"])


def _feed_forward(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    up = gelu(linear_maybe_quantized(x, p["intermediate_dense"]))
    return linear_maybe_quantized(up, p["output_dense"])


def wavlm_position_bias(
    rel_attn_embed: jnp.ndarray, t: int, num_buckets: int, max_distance: int
) -> jnp.ndarray:
    """WavLM's shared relative position bias [H, T, T] (T5-style buckets,
    WavLMAttention.compute_bias parity). Computed ONCE per forward from
    layer 0's embedding and reused by every layer (each applies its own
    gates)."""
    import math

    ctx = jnp.arange(t)[:, None]
    mem = jnp.arange(t)[None, :]
    rel = mem - ctx
    n = num_buckets // 2
    buckets = (rel > 0).astype(jnp.int32) * n
    rel = jnp.abs(rel)
    max_exact = n // 2
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, n - 1)
    buckets = buckets + jnp.where(rel < max_exact, rel, large)
    values = rel_attn_embed[buckets]  # [T, T, H]
    return values.transpose(2, 0, 1)


def _attn_adapter(lp: dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """MMS-style attention adapter (transformers Wav2Vec2AttnAdapterLayer):
    LN → down-proj → ReLU → up-proj, residual-added at the end of each
    encoder layer. The per-language adapter weights are what
    `facebook/mms-1b-all` swaps per target language (merged into the
    checkpoint at export time by --target-lang)."""
    a = lp["adapter_layer"]
    h = layer_norm(x, a["norm"]["weight"], a["norm"]["bias"], eps)
    h = linear_maybe_quantized(h, a["linear_1"])
    h = jnp.maximum(h, 0)
    return linear_maybe_quantized(h, a["linear_2"])


def _encoder_layer(
    lp: dict,
    x: jnp.ndarray,
    mask_bias: jnp.ndarray | None,
    cfg: Wav2Vec2ModelConfig,
    position_bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    eps = cfg.layer_norm_eps
    nh = cfg.num_attention_heads
    flash = getattr(cfg, "use_flash_attention", False)
    if cfg.do_stable_layer_norm:
        # pre-norm: h = x + attn(ln1(x)); y = h + ff(ln2(h))
        h = x + _self_attention(
            lp["attention"],
            layer_norm(x, lp["layer_norm"]["weight"], lp["layer_norm"]["bias"], eps),
            mask_bias,
            nh,
            position_bias,
            use_flash=flash,
            flash_spmd=getattr(cfg, "flash_spmd", None),
        )
        y = h + _feed_forward(
            lp["feed_forward"],
            layer_norm(h, lp["final_layer_norm"]["weight"], lp["final_layer_norm"]["bias"], eps),
        )
    else:
        # post-norm (wav2vec2-base): h = ln1(x + attn(x)); y = ln2(h + ff(h))
        h = layer_norm(
            x + _self_attention(lp["attention"], x, mask_bias, nh,
                                position_bias, use_flash=flash,
                                flash_spmd=getattr(cfg, "flash_spmd", None)),
            lp["layer_norm"]["weight"],
            lp["layer_norm"]["bias"],
            eps,
        )
        y = layer_norm(
            h + _feed_forward(lp["feed_forward"], h),
            lp["final_layer_norm"]["weight"],
            lp["final_layer_norm"]["bias"],
            eps,
        )
    if "adapter_layer" in lp:
        y = y + _attn_adapter(lp, y, eps)
    return y


def _deberta_log_bucket_positions(
    rel, bucket_size: int, max_position: int
):
    """DeBERTa-v2 signed log-bucketed relative positions (transformers
    build_relative_position/make_log_bucket_position parity) for an arbitrary
    numpy array of q−k offsets. Shape-only data — computed host-side in numpy
    at trace time."""
    import numpy as np

    rel = np.asarray(rel, dtype=np.int64)
    mid = bucket_size // 2
    abs_pos = np.where(
        (rel < mid) & (rel > -mid), float(mid - 1), np.abs(rel).astype(np.float64)
    )
    with np.errstate(divide="ignore"):
        log_pos = (
            np.ceil(
                np.log(abs_pos / mid) / np.log((max_position - 1) / mid)
                * (mid - 1)
            )
            + mid
        )
    bucket = np.where(abs_pos <= mid, rel.astype(np.float64),
                      log_pos * np.sign(rel))
    return bucket.astype(np.int64)


def _rel_shift(z: jnp.ndarray) -> jnp.ndarray:
    """Diagonal realignment y[..., r, c] = z[..., r, c + (T−1) − r] for
    z of shape [..., T, 2T−1] — the Transformer-XL/Music-Transformer skew,
    expressed as flatten → contiguous slice → free reshape → slice, so XLA
    lowers it to one bandwidth-bound copy (no gather, no [T, T] index
    tensor). This is what turns a relative-position term laid out per
    diagonal into the per-(q, k) score grid."""
    *lead, t, w = z.shape
    assert w == 2 * t - 1, (t, w)
    if t == 1:
        return z
    flat = z.reshape(*lead, t * w)
    flat = jax.lax.slice_in_dim(flat, t - 1, t - 1 + t * (2 * t - 2), axis=-1)
    return flat.reshape(*lead, t, 2 * t - 2)[..., :t]


def sew_d_layers_forward(
    params: dict,
    h: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    mask_bias: jnp.ndarray | None,
) -> jnp.ndarray:
    """SEW-D transformer stack (transformers SEWDTransformerEncoder /
    DisentangledSelfAttention parity): post-norm BERT layers whose attention
    adds DeBERTa-v2 content→position (c2p) and position→content (p2c) biases
    computed from a shared LayerNormed relative-position embedding, with
    share_att_key=True (the layer's own query/key projections embed the
    positions). Scores are scaled by sqrt(head_dim · (1 + |pos_att_type|)).

    TPU notes: the bucket index bucket(q−k) depends only on the diagonal
    q−k, so instead of torch's advanced-index gather over a
    [B, H, T, 2·buckets] bias tensor (an XLA gather with a [T, T] index
    grid), each layer projects the [2S, H] embedding table (bucket-sized
    matmul, T-independent), a static [2T−1]-row selector lays the projected
    rows onto the diagonals, q/k contract against that table on the MXU,
    and `_rel_shift` realigns the result to the (q, k) grid with one
    contiguous copy. Bit-identical to the gather formulation — the same
    dot products, with projected rows duplicated per diagonal. Layers are
    stacked and scanned like the wav2vec2 encoder.
    """
    import numpy as np

    if not getattr(cfg, "share_att_key", True):
        raise NotImplementedError(
            "SEW-D with share_att_key=false (separate pos_key/pos_query "
            "projections) is not supported; all released SEW-D checkpoints "
            "share the attention keys"
        )
    t = h.shape[1]
    nh = cfg.num_attention_heads
    hd = cfg.hidden_size // nh
    span = cfg.position_buckets
    pos_att = tuple(getattr(cfg, "pos_att_type", ("p2c", "c2p")))
    scale_factor = 1 + len(pos_att)
    scale = jnp.float32((hd * scale_factor) ** 0.5)

    # Diagonal e of the wide tensors carries offset q−k = (T−1) − e (the
    # reversal is baked in so `_rel_shift`'s positive-slope skew applies).
    diag_bucket = _deberta_log_bucket_positions(
        np.arange(t - 1, -t, -1), span, cfg.max_position_embeddings
    )
    c2p_sel = np.clip(diag_bucket + span, 0, 2 * span - 1)
    p2c_sel = np.clip(-diag_bucket + span, 0, 2 * span - 1)

    rel_emb = params["rel_embeddings"].astype(jnp.float32)  # [2S, H]
    if "rel_embeddings_layer_norm" in params:
        ln = params["rel_embeddings_layer_norm"]
        rel_emb = layer_norm(rel_emb, ln["weight"], ln["bias"],
                             cfg.layer_norm_eps)
    rel_emb = rel_emb.astype(h.dtype)
    # static row-selectors applied AFTER each layer's projection, so the
    # per-layer projection matmul stays [2S, H] (bucket-count-sized, not
    # T-sized); the [2T−1]-row gather of the projected table is trivial
    c2p_sel_j = jnp.asarray(c2p_sel) if "c2p" in pos_att else None
    p2c_sel_j = jnp.asarray(p2c_sel) if "p2c" in pos_att else None

    def split_heads(y):  # [..., T, H] -> [..., H_heads, T, hd]
        return y.reshape(*y.shape[:-1], nh, hd).swapaxes(-3, -2)

    eps = cfg.layer_norm_eps
    # Same score-dtype policy as _self_attention/_conformer_attention: f32
    # compute stays exactly f32 (the parity/quality path); bf16 compute keeps
    # the three [B, H, T(q), ·] wide tensors (content scores + the 2T−1-wide
    # c2p/p2c diagonal terms and their `_rel_shift` copies) in bf16 — they
    # dominate the stack's HBM traffic and f32 doubles it.
    acc = jnp.float32 if h.dtype == jnp.float32 else h.dtype
    # torch divides the position terms by scale (kept as a division, not a
    # reciprocal multiply, for f32 bit-identity with the HF implementation)
    scale_acc = scale.astype(acc)

    def one_layer(x, lp):
        a = lp["attention"]
        qh = split_heads(linear(x, a["query_proj"]["kernel"],
                                a["query_proj"]["bias"]))
        kh = split_heads(linear(x, a["key_proj"]["kernel"],
                                a["key_proj"]["bias"]))
        vh = split_heads(linear(x, a["value_proj"]["kernel"],
                                a["value_proj"]["bias"]))
        # content-content, with the key pre-divided by the full scale
        # (torch op order, kept for f32 bit-closeness)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh / scale.astype(x.dtype),
            preferred_element_type=acc,
        )
        # share_att_key: the positions go through this layer's own q/k
        # projections (applied to the per-diagonal embedding table)
        if c2p_sel_j is not None:
            pos_k = split_heads(linear(rel_emb, a["key_proj"]["kernel"],
                                       a["key_proj"]["bias"]))  # [H, 2S, hd]
            c2p = jnp.einsum("bhqd,hed->bhqe", qh, pos_k[:, c2p_sel_j, :],
                             preferred_element_type=acc)
            scores = scores + _rel_shift(c2p) / scale_acc  # [B,H,T(q),T(k)]
        if p2c_sel_j is not None:
            pos_q = split_heads(linear(rel_emb, a["query_proj"]["kernel"],
                                       a["query_proj"]["bias"]))
            p2c = jnp.einsum("bhkd,hed->bhke", kh, pos_q[:, p2c_sel_j, :],
                             preferred_element_type=acc)
            # [B, H, T(k), T(q)] → transpose onto the (q, k) grid
            scores = scores + _rel_shift(p2c).swapaxes(-1, -2) / scale_acc
        if mask_bias is not None:
            scores = scores + mask_bias.astype(scores.dtype)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(x.dtype), vh,
                         preferred_element_type=x.dtype)
        out = out.swapaxes(-3, -2).reshape(x.shape)
        out = linear(out, a["output_dense"]["kernel"],
                     a["output_dense"]["bias"])
        x = layer_norm(out + x, a["output_norm"]["weight"],
                       a["output_norm"]["bias"], eps)
        up = gelu(linear(x, lp["intermediate_dense"]["kernel"],
                         lp["intermediate_dense"]["bias"]))
        down = linear(up, lp["output_dense"]["kernel"],
                      lp["output_dense"]["bias"])
        return layer_norm(down + x, lp["output_norm"]["weight"],
                          lp["output_norm"]["bias"], eps)

    def scan_body(x, lp):
        return one_layer(x, lp), None

    h, _ = jax.lax.scan(scan_body, h, params["layers"])
    return h


def sew_encoder_forward(
    params: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SEW / SEW-D squeezed encoder (transformers SEWEncoder / SEWDEncoder
    parity): positional conv with stride=squeeze_factor + avg-pooled hidden
    states are added at the pooled rate, the transformer runs at that rate,
    and a linear upsampler (H → H·sf, GELU, fold channels into time)
    restores the conv frame rate, zero-padding the tail back to T.

    x: [B, T, H] → [B, T, H]. SEW runs wav2vec2's post-norm layers;
    SEW-D (cfg.attention_style == "deberta") runs DeBERTa-v2 disentangled-
    attention layers (sew_d_layers_forward).

    Padded batches: pooled lengths are conv_len // sf (the HF formula);
    encoder output at pooled positions beyond them is junk (attention only
    masks KEYS), and those positions map exactly onto upsampled frames at or
    beyond pooled_len·sf — zeroing those frames removes the junk AND mirrors
    the zeros torch's F.pad appends in the unpadded run.
    """
    sf = cfg.squeeze_factor
    b, t_in, h_dim = x.shape
    if frame_mask is not None:
        x = x * frame_mask[:, :, None].astype(x.dtype)

    pos = pos_conv_forward(params["pos_conv_embed"], x, cfg, stride=sf)
    t_pool = t_in // sf
    pooled = x[:, : t_pool * sf, :].reshape(b, t_pool, sf, h_dim)
    pooled = jnp.mean(pooled.astype(jnp.float32), axis=2).astype(x.dtype)
    min_len = min(pos.shape[1], t_pool)
    h = pooled[:, :min_len] + pos[:, :min_len]

    enc_lens = None
    mask_bias = None
    if frame_mask is not None:
        enc_lens = jnp.sum(frame_mask.astype(jnp.int32), axis=1) // sf
        enc_valid = jnp.arange(min_len)[None, :] < enc_lens[:, None]
        mask_bias = jnp.where(
            enc_valid[:, None, None, :], 0.0, -jnp.inf
        ).astype(jnp.float32)

    if getattr(cfg, "attention_style", "wav2vec2") == "deberta":
        h = sew_d_layers_forward(params, h, cfg, mask_bias)
    else:
        h = layer_norm(
            h, params["layer_norm"]["weight"], params["layer_norm"]["bias"],
            cfg.layer_norm_eps,
        )

        def scan_body(hh, lp):
            return _encoder_layer(lp, hh, mask_bias, cfg), None

        h, _ = jax.lax.scan(scan_body, h, params["layers"])

    up = params["upsample"]["projection"]
    h = gelu(linear(h, up["kernel"], up["bias"]))  # [B, t_enc, H*sf]
    h = h.reshape(b, min_len * sf, h.shape[-1] // sf)
    if enc_lens is not None:
        valid = jnp.arange(h.shape[1])[None, :] < (enc_lens * sf)[:, None]
        h = h * valid[:, :, None].astype(h.dtype)
    if h.shape[1] < t_in:
        h = jnp.pad(h, ((0, 0), (0, t_in - h.shape[1]), (0, 0)))
    return h


def _conformer_rotary(t: int, head_dim: int, base: float):
    """Rotary cos/sin tables [T, head_dim] (Wav2Vec2ConformerRotary-
    PositionalEmbedding parity: emb = concat(freqs, freqs))."""
    inv = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = jnp.arange(t, dtype=jnp.float32)[:, None] * inv[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _conformer_attention(
    p: dict,
    x: jnp.ndarray,
    mask_bias: jnp.ndarray | None,
    cfg: Wav2Vec2ModelConfig,
    pos: tuple | jnp.ndarray | None,
    style: str | None = None,
) -> jnp.ndarray:
    """Wav2Vec2ConformerSelfAttention / Wav2Vec2BertSelfAttention parity.
    `pos` is (cos, sin) tables for rotary, None otherwise ("relative"
    builds its factorized sinusoid tables inline; "relative_key" carries
    its clamped-distance embedding in the params). Unlike the wav2vec2
    attention, the query is
    NOT pre-scaled — scores divide by sqrt(head_dim) after the position
    terms are added (torch op order, kept for f32 bit-closeness).
    `style` overrides cfg.position_embeddings_type (the w2v-BERT adapter
    attention runs position-free)."""
    b, t, h = x.shape
    nh = cfg.num_attention_heads
    hd = h // nh
    if style is None:
        style = cfg.position_embeddings_type

    qk_states = x
    if style == "rotary":
        # rotation happens in the full hidden space BEFORE the q/k
        # projections (HF quirk); values attend from the UNROTATED states
        cos, sin = pos
        cos = cos.astype(x.dtype)[None, :, None, :]
        sin = sin.astype(x.dtype)[None, :, None, :]
        hh = x.reshape(b, t, nh, hd)
        rot = jnp.concatenate([-hh[..., hd // 2:], hh[..., : hd // 2]], axis=-1)
        qk_states = (hh * cos + rot * sin).reshape(b, t, h)

    def split_heads(y):
        return y.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)

    q = split_heads(linear_maybe_quantized(qk_states, p["linear_q"]))
    k = split_heads(linear_maybe_quantized(qk_states, p["linear_k"]))
    v = split_heads(linear_maybe_quantized(x, p["linear_v"]))

    if getattr(cfg, "use_flash_attention", False) and style != "relative_key":
        # fused kernel (ops/flash_attention.py): for style="relative" the
        # Transformer-XL term runs in its per-diagonal form — one extra
        # [BLOCK_Q, hd]·[hd, T+BLOCK_Q] MXU matmul per query tile + an
        # in-VMEM shear — instead of the factorized U·G contraction whose
        # inner dimension H costs nh/2× the FLOPs (and whose [B, nh, T, H]
        # intermediates cost ~0.5 GB each at B=32, T=499). This is the one
        # measured flash win (880→1238× realtime on TPU v5e,
        # reports/flash_ab_r5.jsonl); rotary/none keep XLA's fused
        # attention and relative_key keeps the measured-winner XLA gather
        # form (see below) — use_flash encodes that table.
        from ..ops import flash_attention as fa

        rel = style == "relative"
        if fa.use_flash(t, hd, rel=rel, dtype=x.dtype):
            spmd = getattr(cfg, "flash_spmd", None)
            mb = None if mask_bias is None else mask_bias.reshape(b, t)
            if rel:
                bias_u = p["pos_bias_u"].astype(x.dtype)[None, :, None, :]
                bias_v = p["pos_bias_v"].astype(x.dtype)[None, :, None, :]
                rel_r = fa.rel_table_rev(
                    p["linear_pos"]["kernel"], nh, fa.pad_len(t), x.dtype
                )
                out = fa.flash_attention(
                    q + bias_u, k, v, mb, q_pos=q + bias_v, rel_r=rel_r,
                    scale=hd ** -0.5, spmd_mesh=spmd,
                )
            else:
                out = fa.flash_attention(q, k, v, mb, scale=hd ** -0.5,
                                         spmd_mesh=spmd)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, h)
            return linear_maybe_quantized(out, p["linear_out"])

    acc = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    if style == "relative":
        # Transformer-XL scores (1901.02860 §3.3): content term with bias u,
        # position term with bias v against the projected encodings.
        #
        # The position term is FACTORIZED instead of materialized: since the
        # encodings are sinusoidal (pe[d, 2m] = sin(d·w_m), pe[d, 2m+1] =
        # cos(d·w_m)) and linear_pos is linear, the angle-difference
        # identities sin((i-k)w) = sin(iw)cos(kw) - cos(iw)sin(kw) and
        # cos((i-k)w) = cos(iw)cos(kw) + sin(iw)sin(kw) split bd[i, k] =
        # (q_i + v)·W_pos·pe_{i-k} exactly into U[i, :] · G[k, :] with inner
        # dimension H — one ordinary MXU matmul. This removes the
        # [B, H, T, 2T-1] score tensor (~3.8 GB/layer HBM traffic at B=32,
        # T=499) AND the Transformer-XL shift entirely; the reference's
        # implementations (torch view trick / pad+reshape here before) all
        # pay that tensor. Matches HF Wav2Vec2ConformerSelfAttention to fp
        # reassociation (~1e-6 relative; parity-tested).
        bias_u = p["pos_bias_u"].astype(x.dtype)[None, :, None, :]
        bias_v = p["pos_bias_v"].astype(x.dtype)[None, :, None, :]
        ac = jnp.einsum(
            "bhqd,bhkd->bhqk", q + bias_u, k, preferred_element_type=acc
        )
        # ā[b,h,i,C] = Σ_d' (q+v)[b,h,i,d'] · W_pos[C, h·hd+d']  ∈ R^H
        w_pos = p["linear_pos"]["kernel"].astype(x.dtype).reshape(h, nh, hd)
        a_bar = jnp.einsum(
            "bhid,chd->bhic", q + bias_v, w_pos, preferred_element_type=x.dtype
        ).reshape(b, nh, t, h // 2, 2)
        inv = jnp.exp(
            jnp.arange(0, h, 2, dtype=jnp.float32)
            * (-math.log(10000.0) / h)
        )
        ang = jnp.arange(t, dtype=jnp.float32)[:, None] * inv[None, :]
        sin_t = jnp.sin(ang).astype(x.dtype)  # [T, H/2]
        cos_t = jnp.cos(ang).astype(x.dtype)
        a_sin, a_cos = a_bar[..., 0], a_bar[..., 1]  # pe even=sin, odd=cos
        u = jnp.concatenate(
            [a_sin * sin_t + a_cos * cos_t,    # pairs with cos(k·w)
             a_cos * sin_t - a_sin * cos_t],   # pairs with sin(k·w)
            axis=-1,
        )  # [B, nh, T, H]
        g = jnp.concatenate([cos_t, sin_t], axis=-1)  # [T, H]
        bd = jnp.einsum("bhim,km->bhik", u, g, preferred_element_type=acc)
        scores = (ac + bd) / jnp.asarray(hd**0.5, acc)
    else:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=acc
        ) / jnp.asarray(hd**0.5, acc)

    if style == "relative_key":
        # w2v-BERT: an embedding over clamped relative distances
        # (Wav2Vec2BertSelfAttention, distance ∈ [-left_max, right_max]).
        # This keeps HF's gather formulation ON PURPOSE: the [T, T, hd]
        # clamped-distance embedding is BATCH-INDEPENDENT (~32 MB at T=499)
        # and the position term lands directly on the [B, H, T, T] score
        # grid. The per-diagonal `_rel_shift` rewrite that wins for the
        # Transformer-XL/DeBERTa styles LOSES here — it introduces a
        # [B, H, T, 2T−1] intermediate plus its shift copy (~1 GB/layer
        # at B=32) where this form has none, and measured 554 ms vs
        # 221 ms per batch end-to-end (BENCHMARKS.md, round 3).
        left = cfg.left_max_position_embeddings
        right = cfg.right_max_position_embeddings
        dist = jnp.clip(
            jnp.arange(t)[None, :] - jnp.arange(t)[:, None], -left, right
        )
        posemb = p["distance_embedding"][dist + left].astype(x.dtype)
        rel = jnp.einsum("bhld,lrd->bhlr", q, posemb,
                         preferred_element_type=acc)
        scores = scores + rel / jnp.asarray(hd**0.5, acc)

    if mask_bias is not None:
        scores = scores + mask_bias.astype(scores.dtype)
    # bf16 compute keeps the [B, H, T, T] scores in bf16 (same HBM-traffic
    # rationale as _self_attention); f32 stays exact for the parity path
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, h)
    return linear_maybe_quantized(out, p["linear_out"])


def _conformer_conv_module(
    p: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    frame_mask: jnp.ndarray | None,
) -> jnp.ndarray:
    """Wav2Vec2ConformerConvolutionModule parity: LN → pointwise (H→2H, no
    bias) → GLU over channels → depthwise conv (kernel
    conv_depthwise_kernel_size, SAME) → BatchNorm (running stats folded to a
    per-channel affine at load) → act → pointwise (H→H, no bias).

    The pointwise convs are kernel-1, i.e. plain matmuls in NHC layout (the
    [2H, H, 1] torch weights were folded to [H, 2H] kernels at load). The
    depthwise conv is the only cross-frame op: padded frames are re-zeroed
    right before it so its taps see the zeros the unpadded run's own SAME
    padding provides — padded batch == unpadded forward on valid frames.

    w2v-BERT variant (Wav2Vec2BertConvolutionModule, `bert=True`): the
    depthwise conv is CAUSAL (left pad K-1, no right pad) and followed by a
    LayerNorm over channels instead of BatchNorm; all LNs use the config
    epsilon. Causality means the padded tail cannot leak left, but masking
    is kept for exact zero parity with HF's masked_fill.
    """
    from .layers import act_fn

    bert = getattr(cfg, "encoder_style", "") == "conformer_bert"
    # conformer's intra-layer norms are torch nn.LayerNorm defaults
    # (eps 1e-5, Wav2Vec2ConformerConvolutionModule.__init__); w2v-BERT
    # passes config.layer_norm_eps everywhere
    eps = cfg.layer_norm_eps if bert else 1e-5
    h_dim = x.shape[-1]
    x = layer_norm(x, p["layer_norm"]["weight"], p["layer_norm"]["bias"], eps)
    if bert and frame_mask is not None:
        # HF masks at module entry (conv_attention_mask) — before the
        # pointwise conv rather than before the depthwise conv
        x = x * frame_mask[:, :, None].astype(x.dtype)
    x = jnp.dot(
        x, p["pointwise_conv1"]["kernel"].astype(x.dtype),
        preferred_element_type=x.dtype,
    )
    gate = jax.nn.sigmoid(x[..., h_dim:].astype(jnp.float32)).astype(x.dtype)
    x = x[..., :h_dim] * gate
    if not bert and frame_mask is not None:
        x = x * frame_mask[:, :, None].astype(x.dtype)
    k = cfg.conv_depthwise_kernel_size
    w = p["depthwise_conv"]["weight"].transpose(2, 1, 0).astype(x.dtype)  # [K, 1, H]
    pad = (k - 1, 0) if bert else ((k - 1) // 2, (k - 1) // 2)
    x = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[pad],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=h_dim,
    )
    if bert:
        ln = p["depthwise_layer_norm"]
        x = layer_norm(x, ln["weight"], ln["bias"], eps)
    else:
        bn = p["batch_norm"]
        x = x * bn["scale"].astype(x.dtype) + bn["shift"].astype(x.dtype)
    x = act_fn(cfg.hidden_act)(x)
    return jnp.dot(
        x, p["pointwise_conv2"]["kernel"].astype(x.dtype),
        preferred_element_type=x.dtype,
    )


def _conformer_layer(
    lp: dict,
    x: jnp.ndarray,
    mask_bias: jnp.ndarray | None,
    cfg: Wav2Vec2ModelConfig,
    pos,
    frame_mask: jnp.ndarray | None,
) -> jnp.ndarray:
    """One conformer block (Wav2Vec2ConformerEncoderLayer /
    Wav2Vec2BertEncoderLayer parity):
    half-step FFN → self-attention → conv module → half-step FFN → LN."""
    from .layers import act_fn

    act = act_fn(cfg.hidden_act)
    eps = (cfg.layer_norm_eps
           if getattr(cfg, "encoder_style", "") == "conformer_bert" else 1e-5)

    def ff(fp, y):
        up = act(linear_maybe_quantized(y, fp["intermediate_dense"]))
        return linear_maybe_quantized(up, fp["output_dense"])

    def ln(name, y):
        return layer_norm(y, lp[name]["weight"], lp[name]["bias"], eps)

    half = jnp.asarray(0.5, x.dtype)
    x = x + half * ff(lp["ffn1"], ln("ffn1_layer_norm", x))
    x = x + _conformer_attention(
        lp["self_attn"], ln("self_attn_layer_norm", x), mask_bias, cfg, pos
    )
    x = x + _conformer_conv_module(lp["conv_module"], x, cfg, frame_mask)
    x = x + half * ff(lp["ffn2"], ln("ffn2_layer_norm", x))
    return ln("final_layer_norm", x)


def conformer_encoder_forward(
    params: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Wav2Vec2-Conformer encoder (transformers Wav2Vec2ConformerEncoder
    parity): position embeddings (rotary / Transformer-XL relative / none)
    computed once, conformer blocks, encoder-level LayerNorm AFTER the
    layers. HF constructs a pos_conv_embed for this encoder but never calls
    it in forward — checkpoints carry those weights unused; the loader
    ignores them (models/params.py).

    Layers are stacked and lax.scan-iterated like the other families."""
    x = _conformer_stack(
        params, x, cfg, frame_mask, allowed_styles=("relative", "rotary", "none")
    )
    return layer_norm(
        x, params["layer_norm"]["weight"], params["layer_norm"]["bias"],
        cfg.layer_norm_eps,
    )


def conformer_bert_encoder_forward(
    params: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """w2v-BERT encoder (transformers Wav2Vec2BertEncoder parity): conformer
    blocks with relative_key / relative / rotary / no position embeddings,
    NO positional conv and NO encoder-level LayerNorm after the layers
    (each block ends in its own final LN)."""
    return _conformer_stack(
        params, x, cfg, frame_mask,
        allowed_styles=("relative_key", "relative", "rotary", "none"),
    )


def _conformer_stack(
    params: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    frame_mask: jnp.ndarray | None,
    allowed_styles: tuple[str, ...],
) -> jnp.ndarray:
    """Shared conformer trunk: mask, position embeddings computed once
    (relative_key reads its distance embedding per layer instead), scanned
    conformer blocks. The callers differ only in allowed position styles
    and the trailing encoder-level LayerNorm."""
    mask_bias = None
    if frame_mask is not None:
        x = x * frame_mask[:, :, None].astype(x.dtype)
        mask_bias = jnp.where(
            frame_mask[:, None, None, :].astype(bool), 0.0, -jnp.inf
        ).astype(jnp.float32)

    t = x.shape[1]
    style = cfg.position_embeddings_type
    if style not in allowed_styles:
        raise NotImplementedError(
            f"position_embeddings_type {style!r} is not supported "
            f"(expected {'/'.join(allowed_styles)})"
        )
    if style == "rotary":
        pos = _conformer_rotary(
            t, cfg.hidden_size // cfg.num_attention_heads,
            float(cfg.rotary_embedding_base),
        )
    else:  # relative builds its factorized tables in-attention;
        pos = None  # relative_key reads its distance embedding per layer

    def scan_body(h, lp):
        return _conformer_layer(lp, h, mask_bias, cfg, pos, frame_mask), None

    x, _ = jax.lax.scan(scan_body, x, params["layers"])
    return x


def bert_adapter_forward(
    params: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    frame_lens: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """w2v-BERT downsampling adapter (transformers Wav2Vec2BertAdapter /
    Wav2Vec2BertAdapterLayer parity): per layer, a strided GLU conv on the
    residual branch and another feeding a position-free self-attention,
    then a full-step FFN (adapter_act). Each layer downsamples time by
    adapter_stride (kernel adapter_kernel_size, pad stride//2).

    Returns (hidden, new_frame_lens). Padded batches re-zero before every
    conv so taps match the unpadded run's own zero padding; attention masks
    keys by the sub-sampled lengths (HF _compute_new_attention_mask)."""
    from .layers import act_fn, linear

    if "proj" in params:
        x = linear(x, params["proj"]["kernel"], params["proj"]["bias"])
        ln = params["proj_layer_norm"]
        x = layer_norm(x, ln["weight"], ln["bias"], cfg.layer_norm_eps)

    eps = cfg.layer_norm_eps
    stride = cfg.adapter_stride
    k = cfg.adapter_kernel_size
    pad = stride // 2
    act = act_fn(getattr(cfg, "adapter_act", "relu"))
    lens = frame_lens

    def mask(z, lens_):
        valid = jnp.arange(z.shape[1])[None, :] < lens_[:, None]
        return z * valid[:, :, None].astype(z.dtype)

    def glu_conv(z, p):  # p["weight"]: torch [2H, H, K], p["bias"]: [2H]
        wt = p["weight"].transpose(2, 1, 0).astype(z.dtype)  # [K, H, 2H]
        z = jax.lax.conv_general_dilated(
            z, wt, window_strides=(stride,), padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        z = z + p["bias"].astype(z.dtype)
        o = z.shape[-1] // 2
        gate = jax.nn.sigmoid(z[..., o:].astype(jnp.float32)).astype(z.dtype)
        return z[..., :o] * gate

    layers = params["layers"]
    n_layers = layers["residual_conv"]["weight"].shape[0]
    for i in range(n_layers):
        lp = jax.tree.map(lambda a: a[i], layers)
        new_lens = None if lens is None else (
            (lens + 2 * pad - k) // stride + 1
        )
        # the convs' inputs are masked AFTER the LayerNorms (LN of a zeroed
        # padded row is its bias, nonzero) so the strided taps see the
        # zeros the unpadded run's own conv padding provides
        res = layer_norm(x, lp["residual_layer_norm"]["weight"],
                         lp["residual_layer_norm"]["bias"], eps)
        if lens is not None:
            res = mask(res, lens)
        res = glu_conv(res, lp["residual_conv"])
        h = layer_norm(x, lp["self_attn_layer_norm"]["weight"],
                       lp["self_attn_layer_norm"]["bias"], eps)
        if lens is not None:
            h = mask(h, lens)
        h = glu_conv(h, lp["self_attn_conv"])
        mask_bias = None
        if new_lens is not None:
            valid = jnp.arange(h.shape[1])[None, :] < new_lens[:, None]
            mask_bias = jnp.where(
                valid[:, None, None, :], 0.0, -jnp.inf
            ).astype(jnp.float32)
        lens = new_lens
        h = _conformer_attention(
            lp["self_attn"], h, mask_bias, cfg, None, style="none"
        )
        x = h + res
        r2 = x
        h = layer_norm(x, lp["ffn_layer_norm"]["weight"],
                       lp["ffn_layer_norm"]["bias"], eps)
        up = act(linear_maybe_quantized(h, lp["ffn"]["intermediate_dense"]))
        x = linear_maybe_quantized(up, lp["ffn"]["output_dense"]) + r2
    return x, lens


def adapter_forward(
    params: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    frame_lens: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """wav2vec2 conv adapter (transformers Wav2Vec2Adapter parity,
    add_adapter=true): optional down-projection + LayerNorm, then
    num_adapter_layers kernel-`adapter_kernel_size` pad-1
    stride-`adapter_stride` convs with a GLU over channels — each layer
    downsamples the frame rate by adapter_stride.

    x: [B, T, H] encoder output → [B, T', O] with
    T' = T after num_adapter_layers applications of (T-1)//stride + 1.

    `frame_lens` [B] keeps padded batches exact: padded frames are re-zeroed
    before every conv so its taps see the zeros the unpadded conv's own
    padding would provide.
    """
    if "proj" in params:
        x = linear(x, params["proj"]["kernel"], params["proj"]["bias"])
        ln = params["proj_layer_norm"]
        # torch nn.LayerNorm default eps (the adapter does not read
        # config.layer_norm_eps)
        x = layer_norm(x, ln["weight"], ln["bias"], 1e-5)

    lens = frame_lens

    def mask(z, lens):
        valid = jnp.arange(z.shape[1])[None, :] < lens[:, None]
        return z * valid[:, :, None].astype(z.dtype)

    if lens is not None:
        x = mask(x, lens)
    convs = params["layers"]
    for i in range(convs["weight"].shape[0]):
        w = convs["weight"][i].transpose(2, 1, 0).astype(x.dtype)  # [K, O, 2O]
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(cfg.adapter_stride,), padding=[(1, 1)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        x = x + convs["bias"][i].astype(x.dtype)
        o = x.shape[-1] // 2
        gate = jax.nn.sigmoid(x[..., o:].astype(jnp.float32)).astype(x.dtype)
        x = x[..., :o] * gate
        if lens is not None:
            lens = (lens - 1) // cfg.adapter_stride + 1
            x = mask(x, lens)
    return x


def encoder_forward(
    params: dict,
    x: jnp.ndarray,
    cfg: Wav2Vec2ModelConfig,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x: [B, T, H] hidden states → [B, T, H].

    `frame_mask` [B, T] (1 = valid) zeroes padded frames before the pos-conv
    and masks attention keys — padded batch == unpadded forward on valid
    frames (HF does the same zeroing in Wav2Vec2Encoder.forward)."""
    mask_bias = None
    if frame_mask is not None:
        x = x * frame_mask[:, :, None].astype(x.dtype)
        mask_bias = jnp.where(
            frame_mask[:, None, None, :].astype(bool), 0.0, -jnp.inf
        ).astype(jnp.float32)

    if "layers" in params["pos_conv_embed"]:
        x = x + pos_conv_stack_forward(
            params["pos_conv_embed"], x, cfg, frame_mask
        )
    else:
        x = x + pos_conv_forward(params["pos_conv_embed"], x, cfg, frame_mask)
    enc_ln = params["layer_norm"]
    if not cfg.do_stable_layer_norm:
        x = layer_norm(x, enc_ln["weight"], enc_ln["bias"], cfg.layer_norm_eps)
        if frame_mask is not None:
            x = x * frame_mask[:, :, None].astype(x.dtype)

    position_bias = None
    if "rel_attn_embed" in params:
        position_bias = wavlm_position_bias(
            params["rel_attn_embed"], x.shape[1],
            getattr(cfg, "num_buckets", 320),
            getattr(cfg, "max_bucket_distance", 800),
        )

    def scan_body(h, lp):
        return _encoder_layer(lp, h, mask_bias, cfg, position_bias), None

    x, _ = jax.lax.scan(scan_body, x, params["layers"])

    if cfg.do_stable_layer_norm:
        x = layer_norm(x, enc_ln["weight"], enc_ln["bias"], cfg.layer_norm_eps)
    return x
