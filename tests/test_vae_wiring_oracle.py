"""Full-VAE wiring oracle: vae_encode_moments / vae_decode vs an
independent torch mirror.

Companion to tests/test_unet_wiring_oracle.py for the AutoencoderKL
graph the reference uses unmodified (diffusers AutoencoderKL via
train_unziplora.py:1240-1287; fp32 decode insisted on at
train_unziplora.py:52-57). Per-layer parity tests can't catch a wiring
transposition in models/vae.py — encoder down/mid ordering, the
decoder's mid-FIRST-then-up order (opposite of the UNet), the
(layers_per_block + 1) decoder resnet count, the single-head GN(1e-6)
mid attention with its residual add, quant/post_quant convs, or the
logvar clip. The mirror hand-writes the diffusers structure in torch
NCHW; the tiny converter helpers only transpose shared random-init
weights, so agreement is evidence about graph shape.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from video_style_transfer_tpu.config import VAEConfig  # noqa: E402
from video_style_transfer_tpu.models.vae import (  # noqa: E402
    init_vae, vae_decode, vae_encode_moments)

VAE_EPS = 1e-6


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def L(q, x):
    w = _t(q["kernel"]).T.contiguous()
    b = _t(q["bias"]) if "bias" in q else None
    return torch.nn.functional.linear(x, w, b)


def conv(q, x, *, stride=1, padding=None):
    w = _t(q["kernel"]).permute(3, 2, 0, 1).contiguous()  # HWIO -> OIHW
    if padding is None:
        padding = w.shape[-1] // 2
    return torch.nn.functional.conv2d(x, w, _t(q["bias"]), stride=stride,
                                      padding=padding)


def gn(q, x, groups):
    return torch.nn.functional.group_norm(x, groups, _t(q["scale"]),
                                          _t(q["bias"]), eps=VAE_EPS)


def silu(x):
    return torch.nn.functional.silu(x)


def resnet(q, x, groups):
    """diffusers ResnetBlock2D, temb-free VAE form."""
    h = conv(q["conv1"], silu(gn(q["norm1"], x, groups)))
    h = conv(q["conv2"], silu(gn(q["norm2"], h, groups)))
    if "conv_shortcut" in q:
        x = conv(q["conv_shortcut"], x, padding=0)
    return x + h


def mid(q, x, groups):
    """diffusers UNetMidBlock2D (VAE form): resnet -> single-head
    Attention (GN eps 1e-6, q/k/v biases, residual_connection=True) ->
    resnet."""
    x = resnet(q["resnets"][0], x, groups)
    a = q["attentions"][0]
    b, c, hh, ww = x.shape
    h = gn(a["group_norm"], x, groups)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    qq, kk, vv = L(a["to_q"], h), L(a["to_k"], h), L(a["to_v"], h)
    o = torch.nn.functional.scaled_dot_product_attention(
        qq[:, None], kk[:, None], vv[:, None])[:, 0]
    h = L(a["to_out"], o)
    x = x + h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    return resnet(q["resnets"][1], x, groups)


def torch_encode_moments(p, cfg: VAEConfig, x):
    """diffusers Encoder.forward + AutoencoderKL.encode: conv_in ->
    DownEncoderBlock2D* (resnets then asymmetric-pad downsample) -> mid
    -> GN/silu/conv_out -> quant_conv -> split -> clamp logvar."""
    g = cfg.norm_num_groups
    enc = p["encoder"]
    h = conv(enc["conv_in"], x)
    for block in enc["down_blocks"]:
        for rq in block["resnets"]:
            h = resnet(rq, h, g)
        if "downsamplers" in block:
            h = torch.nn.functional.pad(h, (0, 1, 0, 1))
            h = conv(block["downsamplers"][0]["conv"], h, stride=2,
                     padding=0)
    h = mid(enc["mid_block"], h, g)
    h = conv(enc["conv_out"], silu(gn(enc["conv_norm_out"], h, g)))
    moments = conv(p["quant_conv"], h, padding=0)
    mean, logvar = moments.chunk(2, dim=1)
    return mean, torch.clamp(logvar, -30.0, 20.0)


def torch_decode(p, cfg: VAEConfig, z):
    """diffusers Decoder.forward + AutoencoderKL.decode: unscale ->
    post_quant_conv -> conv_in -> mid FIRST -> UpDecoderBlock2D*
    (layers_per_block + 1 resnets, then nearest-2x + conv upsampler) ->
    GN/silu/conv_out."""
    g = cfg.norm_num_groups
    dec = p["decoder"]
    h = conv(p["post_quant_conv"], z / cfg.scaling_factor, padding=0)
    h = conv(dec["conv_in"], h)
    h = mid(dec["mid_block"], h, g)
    for block in dec["up_blocks"]:
        assert len(block["resnets"]) == cfg.layers_per_block + 1
        for rq in block["resnets"]:
            h = resnet(rq, h, g)
        if "upsamplers" in block:
            h = torch.nn.functional.interpolate(h, scale_factor=2,
                                                mode="nearest")
            h = conv(block["upsamplers"][0]["conv"], h)
    return conv(dec["conv_out"], silu(gn(dec["conv_norm_out"], h, g)))


@pytest.mark.parametrize("cfg,seed", [
    (VAEConfig.tiny(), 0),
    # 3-level asymmetric topology: distinct per-level channels exercise
    # the first-resnet conv_shortcut at every level boundary and two
    # down/upsamplers
    pytest.param(VAEConfig.tiny(block_out_channels=(8, 16, 32),
                                layers_per_block=2, norm_num_groups=4), 1,
                 marks=pytest.mark.slow),
])
def test_vae_decode_wiring(cfg, seed):
    params = init_vae(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    z = rng.randn(2, 8, 8, cfg.latent_channels).astype(np.float32)

    got = vae_decode(params, cfg, jnp.asarray(z))
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    with torch.no_grad():
        want = torch_decode(params, cfg,
                            _t(np.transpose(z, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(got_nchw, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("cfg,seed", [
    (VAEConfig.tiny(), 2),
    pytest.param(VAEConfig.tiny(block_out_channels=(8, 16, 32),
                                layers_per_block=2, norm_num_groups=4), 3,
                 marks=pytest.mark.slow),
])
def test_vae_encode_wiring(cfg, seed):
    params = init_vae(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    sf = 2 ** (len(cfg.block_out_channels) - 1)
    res = 8 * sf
    x = rng.randn(2, res, res, cfg.in_channels).astype(np.float32)

    mean, logvar = vae_encode_moments(params, cfg, jnp.asarray(x))
    with torch.no_grad():
        w_mean, w_logvar = torch_encode_moments(
            params, cfg, _t(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(mean), (0, 3, 1, 2)), w_mean.numpy(),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.transpose(np.asarray(logvar), (0, 3, 1, 2)), w_logvar.numpy(),
        rtol=2e-4, atol=2e-4)


def test_vae_decode_wiring_mutation_detected():
    """The oracle has teeth: swapping the decoder's mid/up order (a
    plausible wiring mistake — the ENCODER runs blocks first) must
    fail. Equal per-level channels keep the mutated graph shape-valid,
    so the failure is numeric, not a shape error."""
    cfg = VAEConfig.tiny(block_out_channels=(16, 16))
    params = init_vae(jax.random.PRNGKey(4), cfg)
    rng = np.random.RandomState(4)
    z = rng.randn(1, 8, 8, cfg.latent_channels).astype(np.float32)

    def torch_decode_mutated(p, cfg, z):
        g = cfg.norm_num_groups
        dec = p["decoder"]
        h = conv(p["post_quant_conv"], z / cfg.scaling_factor, padding=0)
        h = conv(dec["conv_in"], h)
        for block in dec["up_blocks"]:          # blocks BEFORE mid: wrong
            for rq in block["resnets"]:
                h = resnet(rq, h, g)
            if "upsamplers" in block:
                h = torch.nn.functional.interpolate(h, scale_factor=2,
                                                    mode="nearest")
                h = conv(block["upsamplers"][0]["conv"], h)
        h = mid(dec["mid_block"], h, g)
        return conv(dec["conv_out"], silu(gn(dec["conv_norm_out"], h, g)))

    got = np.transpose(np.asarray(vae_decode(params, cfg, jnp.asarray(z))),
                       (0, 3, 1, 2))
    with torch.no_grad():
        bad = torch_decode_mutated(params, cfg,
                                   _t(np.transpose(z, (0, 3, 1, 2)))).numpy()
    assert not np.allclose(got, bad, rtol=2e-4, atol=2e-4)
