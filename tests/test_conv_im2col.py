"""conv1d_im2col correctness + regression coverage for the XLA-CPU conv bug.

Observed on jax 0.9.0 / XLA CPU (oneDNN): a VALID conv (kernel 3, stride 2)
fused with upstream producers (conv → groupnorm → gelu) returns a wrong LAST
output frame when the intermediate length is 65 or 66 (error ~0.7, not
rounding). conv1d_im2col is the workaround used by the feature extractor;
this test pins its correctness on exactly those shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wav2vec2_tpu.models.layers import conv1d_im2col, gelu, group_norm_1d


def np_conv(x, w, stride):
    t_out = (x.shape[2] - w.shape[2]) // stride + 1
    out = np.zeros((x.shape[0], w.shape[0], t_out), np.float64)
    for t in range(t_out):
        seg = x[:, :, t * stride : t * stride + w.shape[2]].astype(np.float64)
        out[:, :, t] = np.einsum("oik,bik->bo", w.astype(np.float64), seg)
    return out


@pytest.mark.parametrize("n", [331, 336, 500, 347])
def test_conv_chain_last_frame_exact(n):
    rng = np.random.default_rng(0)
    w0 = (rng.normal(size=(16, 1, 10)) * 0.3).astype(np.float32)
    w1 = (rng.normal(size=(16, 16, 3)) * 0.2).astype(np.float32)
    gnw = rng.normal(size=(16,)).astype(np.float32)
    gnb = rng.normal(size=(16,)).astype(np.float32)

    @jax.jit
    def chain(x):
        with jax.default_matmul_precision("highest"):
            c0 = conv1d_im2col(x, jnp.asarray(w0), None, stride=5)
            g0 = gelu(group_norm_1d(c0, jnp.asarray(gnw), jnp.asarray(gnb), 16, 1e-5))
            return g0, conv1d_im2col(g0, jnp.asarray(w1), None, stride=2)

    x = rng.normal(size=(1, 1, n)).astype(np.float32)
    g0, c1 = map(np.asarray, chain(jnp.asarray(x)))
    gt = np_conv(g0, w1, 2)
    assert np.abs(c1 - gt).max() < 1e-5


@pytest.mark.parametrize("stride,k", [(5, 10), (2, 3), (1, 4), (2, 2)])
def test_im2col_matches_naive(stride, k):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 57)).astype(np.float32)
    w = rng.normal(size=(6, 4, k)).astype(np.float32)
    b = rng.normal(size=(6,)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(conv1d_im2col(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride))
    expected = np_conv(x, w, stride) + b.reshape(1, -1, 1)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
