"""Primitive-level numerical parity vs torch (CPU).

The reference stack is torch; silent-quality bugs come from norm/conv/
attention semantics (SURVEY.md §7.3). Each primitive is checked against
its torch counterpart with shared weights, NCHW<->NHWC transposed.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from video_style_transfer_tpu.models import layers  # noqa: E402
from video_style_transfer_tpu.models.attention import feed_forward  # noqa: E402
from video_style_transfer_tpu.models.embeddings import (  # noqa: E402
    sinusoidal_embedding, temporal_positional_encoding)
from video_style_transfer_tpu.models.resnet import (  # noqa: E402
    downsample, init_downsample, upsample, init_upsample)
from video_style_transfer_tpu.ops.attention import sdpa  # noqa: E402

RTOL, ATOL = 2e-5, 2e-5


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def test_linear_parity():
    rng = np.random.RandomState(0)
    w = rng.randn(8, 12).astype(np.float32)  # (in, out)
    b = rng.randn(12).astype(np.float32)
    x = rng.randn(3, 5, 8).astype(np.float32)
    got = layers.linear({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
                        jnp.asarray(x))
    want = torch.nn.functional.linear(_t(x), _t(w.T), _t(b)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_conv2d_parity():
    rng = np.random.RandomState(1)
    w_oihw = rng.randn(6, 4, 3, 3).astype(np.float32) * 0.2
    b = rng.randn(6).astype(np.float32)
    x_nchw = rng.randn(2, 4, 9, 9).astype(np.float32)
    # HWIO <- OIHW
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    got = layers.conv2d({"kernel": jnp.asarray(w_hwio), "bias": jnp.asarray(b)},
                        jnp.asarray(x_nhwc))
    want = torch.nn.functional.conv2d(_t(x_nchw), _t(w_oihw), _t(b),
                                      padding=1).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=RTOL, atol=ATOL)


def test_group_norm_parity():
    rng = np.random.RandomState(2)
    c, g = 12, 4
    scale = rng.randn(c).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    x_nchw = rng.randn(2, c, 5, 5).astype(np.float32)
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    got = layers.group_norm({"scale": jnp.asarray(scale),
                             "bias": jnp.asarray(bias)},
                            jnp.asarray(x_nhwc), num_groups=g)
    want = torch.nn.functional.group_norm(_t(x_nchw), g, _t(scale), _t(bias),
                                          eps=1e-5).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=RTOL, atol=ATOL)


def test_group_norm_large_mean_parity():
    """Shifted single-pass variance must survive mean^2 >> var (the
    naive E[x^2]-E[x]^2 form cancelled catastrophically here) at the
    VAE's eps=1e-6 and realistic activation scales."""
    rng = np.random.RandomState(7)
    c, g = 16, 4
    scale = np.ones(c, np.float32)
    bias = np.zeros(c, np.float32)
    # per-channel means up to ~400 with unit-ish variance: mean^2/var ~ 1e5
    offsets = rng.uniform(-400, 400, size=(1, c, 1, 1)).astype(np.float32)
    x_nchw = (rng.randn(2, c, 8, 8) * 0.5 + offsets).astype(np.float32)
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    got = layers.group_norm({"scale": jnp.asarray(scale),
                             "bias": jnp.asarray(bias)},
                            jnp.asarray(x_nhwc), num_groups=g, eps=1e-6)
    want = torch.nn.functional.group_norm(
        _t(x_nchw.astype(np.float64)), g, _t(scale.astype(np.float64)),
        _t(bias.astype(np.float64)), eps=1e-6).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=1e-3, atol=1e-3)


def test_layer_norm_parity():
    rng = np.random.RandomState(3)
    d = 16
    scale = rng.randn(d).astype(np.float32)
    bias = rng.randn(d).astype(np.float32)
    x = rng.randn(2, 7, d).astype(np.float32)
    got = layers.layer_norm({"scale": jnp.asarray(scale),
                             "bias": jnp.asarray(bias)}, jnp.asarray(x))
    want = torch.nn.functional.layer_norm(_t(x), (d,), _t(scale), _t(bias),
                                          eps=1e-5).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_sdpa_parity():
    rng = np.random.RandomState(4)
    b, s, h, d = 2, 10, 3, 8
    q = rng.randn(b, s, h, d).astype(np.float32)
    k = rng.randn(b, s, h, d).astype(np.float32)
    v = rng.randn(b, s, h, d).astype(np.float32)
    got = sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla")
    # torch expects (B, H, S, D)
    tq, tk, tv = (_t(a).permute(0, 2, 1, 3) for a in (q, k, v))
    want = torch.nn.functional.scaled_dot_product_attention(
        tq, tk, tv).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_geglu_parity():
    rng = np.random.RandomState(5)
    d, inner = 8, 32
    w1 = rng.randn(d, inner * 2).astype(np.float32) * 0.2
    b1 = rng.randn(inner * 2).astype(np.float32)
    w2 = rng.randn(inner, d).astype(np.float32) * 0.2
    b2 = rng.randn(d).astype(np.float32)
    x = rng.randn(2, 5, d).astype(np.float32)
    p = {"proj": {"kernel": jnp.asarray(w1), "bias": jnp.asarray(b1)},
         "out": {"kernel": jnp.asarray(w2), "bias": jnp.asarray(b2)}}
    got = feed_forward(p, jnp.asarray(x))
    h = torch.nn.functional.linear(_t(x), _t(w1.T), _t(b1))
    hh, gate = h.chunk(2, dim=-1)
    want = torch.nn.functional.linear(
        hh * torch.nn.functional.gelu(gate), _t(w2.T), _t(b2)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_silu_gelu_quickgelu():
    rng = np.random.RandomState(6)
    x = rng.randn(100).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(layers.silu(jnp.asarray(x))),
        torch.nn.functional.silu(_t(x)).numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(layers.gelu(jnp.asarray(x))),
        torch.nn.functional.gelu(_t(x)).numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(layers.quick_gelu(jnp.asarray(x))),
        (_t(x) * torch.sigmoid(1.702 * _t(x))).numpy(), rtol=RTOL, atol=ATOL)


def test_downsample_asymmetric_padding():
    """Diffusers Downsample2D pads (0,1,0,1) then uses a stride-2 VALID
    conv; verify against torch with the same explicit padding."""
    rng = np.random.RandomState(7)
    c = 4
    p = init_downsample(jax.random.PRNGKey(0), c)
    w_hwio = np.asarray(p["conv"]["kernel"])
    b = np.asarray(p["conv"]["bias"])
    x_nchw = rng.randn(1, c, 8, 8).astype(np.float32)
    got = downsample(p, jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))))
    tx = torch.nn.functional.pad(_t(x_nchw), (0, 1, 0, 1))
    want = torch.nn.functional.conv2d(
        tx, _t(np.transpose(w_hwio, (3, 2, 0, 1))), _t(b), stride=2).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=RTOL, atol=ATOL)


def test_upsample_nearest():
    rng = np.random.RandomState(8)
    c = 4
    p = init_upsample(jax.random.PRNGKey(0), c)
    w_hwio = np.asarray(p["conv"]["kernel"])
    b = np.asarray(p["conv"]["bias"])
    x_nchw = rng.randn(1, c, 5, 5).astype(np.float32)
    got = upsample(p, jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))))
    tx = torch.nn.functional.interpolate(_t(x_nchw), scale_factor=2,
                                         mode="nearest")
    want = torch.nn.functional.conv2d(
        tx, _t(np.transpose(w_hwio, (3, 2, 0, 1))), _t(b), padding=1).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=RTOL, atol=ATOL)


def test_sinusoidal_embedding_matches_diffusers_formula():
    """flip_sin_to_cos=True, freq_shift=0 — the SDXL configuration."""
    t = jnp.array([0.0, 1.0, 50.0, 999.0])
    dim = 32
    got = np.asarray(sinusoidal_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_temporal_positional_encoding_matches_reference_spec():
    """Sinusoidal PE laid out sin-at-even / cos-at-odd indices
    (spec: animatediff/temporal_transformer.py:13-17)."""
    f, d = 8, 16
    got = np.asarray(temporal_positional_encoding(f, d))
    position = np.arange(32)[:, None]
    div = np.exp(np.arange(0, d, 2) * (-np.log(10000.0) / d))
    want = np.zeros((32, d), np.float32)
    want[:, 0::2] = np.sin(position * div)
    want[:, 1::2] = np.cos(position * div)
    np.testing.assert_allclose(got, want[:f], rtol=1e-5, atol=1e-6)


def test_motion_module_diffusers_parity():
    """Full motion module vs a hand-written torch mirror of the
    diffusers AnimateDiffTransformer3D semantics (the structure the
    guoyww/animatediff-motion-adapter-sdxl-beta weights load into):
    frame-pooled GroupNorm (eps 1e-6) -> proj_in -> [norm1 +PE attn1 |
    norm2 +PE attn2 | norm3 ff] -> proj_out -> residual."""
    import math

    from video_style_transfer_tpu.models.motion import (
        init_motion_module, motion_module)

    c, heads, groups, f, b, hh, ww = 32, 4, 8, 4, 2, 4, 4
    p = init_motion_module(jax.random.PRNGKey(0), c, num_layers=1,
                           heads=heads, norm_num_groups=groups)
    x = jax.random.normal(jax.random.PRNGKey(1), (b * f, hh, ww, c))
    got = motion_module(p, x, num_frames=f, heads=heads,
                        norm_num_groups=groups)

    x_nchw = _t(x).permute(0, 3, 1, 2)
    residual = x_nchw
    hs = x_nchw.reshape(b, f, c, hh, ww).permute(0, 2, 1, 3, 4)
    hs = torch.nn.functional.group_norm(
        hs, groups, _t(p["norm"]["scale"]), _t(p["norm"]["bias"]),
        eps=1e-6)
    hs = hs.permute(0, 3, 4, 2, 1).reshape(b * hh * ww, f, c)
    hs = hs @ _t(p["proj_in"]["kernel"]) + _t(p["proj_in"]["bias"])

    blk = jax.tree.map(lambda a: a[0], p["transformer_blocks"])
    position = torch.arange(32).unsqueeze(1).float()
    div_term = torch.exp(torch.arange(0, c, 2).float()
                         * (-math.log(10000.0) / c))
    pe = torch.zeros(1, 32, c)
    pe[0, :, 0::2] = torch.sin(position * div_term)
    pe[0, :, 1::2] = torch.cos(position * div_term)
    pe = pe[:, :f]

    def ln(h_, q):
        return torch.nn.functional.layer_norm(
            h_, (c,), _t(q["scale"]), _t(q["bias"]))

    def attn(h_, q):
        qq, kk, vv = (h_ @ _t(q[n]["kernel"])
                      for n in ("to_q", "to_k", "to_v"))
        bb = h_.shape[0]

        def sh(z):
            return z.reshape(bb, f, heads, c // heads).transpose(1, 2)

        o = torch.nn.functional.scaled_dot_product_attention(
            sh(qq), sh(kk), sh(vv))
        o = o.transpose(1, 2).reshape(bb, f, c)
        return o @ _t(q["to_out"]["kernel"]) + _t(q["to_out"]["bias"])

    def ff(h_, q):
        proj = h_ @ _t(q["proj"]["kernel"]) + _t(q["proj"]["bias"])
        a, g = proj.chunk(2, dim=-1)
        return (a * torch.nn.functional.gelu(g)) \
            @ _t(q["out"]["kernel"]) + _t(q["out"]["bias"])

    hs = hs + attn(ln(hs, blk["norm1"]) + pe, blk["attn1"])
    hs = hs + attn(ln(hs, blk["norm2"]) + pe, blk["attn2"])
    hs = hs + ff(ln(hs, blk["norm3"]), blk["ff"])
    hs = hs @ _t(p["proj_out"]["kernel"]) + _t(p["proj_out"]["bias"])
    hs = hs.reshape(b, hh, ww, f, c).permute(0, 3, 4, 1, 2) \
        .reshape(b * f, c, hh, ww)
    want = (hs + residual).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               want, rtol=2e-4, atol=2e-4)


def test_conv2d_strip_path_matches_plain():
    """3x3 SAME convs at H >= 512 dispatch to the strip-batched form
    (layers._conv3x3_strips — the VAE-decode space-to-batch fix); it
    must equal the plain conv exactly and not leak rows across samples."""
    import jax
    import jax.numpy as jnp

    for (n, h, w, c, co) in [(1, 512, 40, 6, 4), (2, 1024, 24, 4, 4),
                             (1, 576, 32, 3, 5)]:
        kk, kx = jax.random.split(jax.random.PRNGKey(n))
        p = layers.init_conv(kk, c, co, 3)
        x = jax.random.normal(kx, (n, h, w, c), jnp.float32)
        assert h >= layers._STRIP_MIN_H and h % layers._STRIP_H == 0
        got = layers.conv2d(p, x)
        want = jax.lax.conv_general_dilated(
            x, p["kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # cross-sample isolation: perturbing sample 0 leaves sample 1 bitwise
    p = layers.init_conv(jax.random.PRNGKey(9), 4, 4, 3)
    x = jax.random.normal(jax.random.PRNGKey(10), (2, 512, 16, 4),
                          jnp.float32)
    y0 = layers.conv2d(p, x)
    y1 = layers.conv2d(p, x.at[0].add(100.0))
    np.testing.assert_array_equal(np.asarray(y0[1]), np.asarray(y1[1]))
