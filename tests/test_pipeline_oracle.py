"""Whole-pipeline torch oracle: text-encode -> CFG denoise -> decode.

Every piece has its own parity test (CLIP vs transformers in
test_clip.py, the UNet graph in test_unet_wiring_oracle.py, the VAE in
test_vae_wiring_oracle.py, scheduler tables vs golden fixtures in
test_schedulers.py) — but none of them test the COMPOSITION the
reference integrates at its pipeline surface
(pipeline_stable_diffusion_xl.py:145-649 __call__;
inference_animatediff.py:53-151 generate_video): CFG combine +
guidance rescale, the scheduler-step/UNet interleave, init-noise
scaling, latent->decode scaling, and the triple-prompt conditioning
threading end to end.

This file runs the FULL pipeline twice from shared tiny random weights:

  torch side   transformers CLIPTextModel(+WithProjection) penultimate
               hidden states -> a Python denoise loop with CFG as TWO
               SEQUENTIAL UNet calls (the reference video form,
               inference_animatediff.py:109-122) through the
               independent torch UNet mirror -> the torch VAE mirror.
               Euler and DPM++ 2M tables are re-derived here from the
               beta schedule, not imported from the repo.

  jax side     pipelines/image.generate_latents + decode_images /
               pipelines/video counterparts — scan-compiled sampler,
               CFG as one BATCHED pair, precomputed cross-attn k/v.

Agreement therefore also certifies the batched-CFG-pair ==
two-sequential-calls equivalence cross-framework, and the video
variant covers motion modules plus the both/content/style mode switch
(unziplora_set_forward_type analog).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import test_unet_wiring_oracle as unet_mirror  # noqa: E402
import test_vae_wiring_oracle as vae_mirror  # noqa: E402

from video_style_transfer_tpu.config import (  # noqa: E402
    CLIPConfig, UNetConfig, VAEConfig)
from video_style_transfer_tpu.lora.surgery import insert_unziplora  # noqa: E402
from video_style_transfer_tpu.models.clip import encode_sdxl_prompt  # noqa: E402
from video_style_transfer_tpu.models.unet import init_unet, unet_apply  # noqa: E402
from video_style_transfer_tpu.models.vae import init_vae  # noqa: E402
from video_style_transfer_tpu.pipelines.image import (  # noqa: E402
    decode_images, default_time_ids, generate_latents)
from video_style_transfer_tpu.pipelines.sampling import (  # noqa: E402
    Conditioning, make_cfg_denoiser)
from video_style_transfer_tpu.pipelines.video import (  # noqa: E402
    decode_video, generate_video_latents)

VOCAB, EOS, SEQ = 99, 98, 16  # EOS must be the max id (HF pooled argmax)
T_TRAIN = 1000


# ---------------------------------------------------------------------------
# Text encoders: tiny HF models as the torch oracle, converted weights
# as the jax side's params (the conversion itself is pinned by
# test_clip.py; here it only shares weights)
# ---------------------------------------------------------------------------

def _hf_clip(seed, *, with_projection, hidden_act, projection_dim=8):
    cfg = transformers.CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act=hidden_act,
        eos_token_id=EOS, bos_token_id=0, pad_token_id=1,
        projection_dim=projection_dim)
    cls = (transformers.CLIPTextModelWithProjection if with_projection
           else transformers.CLIPTextModel)
    torch.manual_seed(seed)
    return cls(cfg).eval()


def _convert_clip(hf_model, n_layers, *, with_projection):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    pre = "text_model."
    p = {
        "token_embedding": jnp.asarray(
            sd[pre + "embeddings.token_embedding.weight"]),
        "position_embedding": jnp.asarray(
            sd[pre + "embeddings.position_embedding.weight"]),
        "final_layer_norm": {
            "scale": jnp.asarray(sd[pre + "final_layer_norm.weight"]),
            "bias": jnp.asarray(sd[pre + "final_layer_norm.bias"])},
    }
    per_layer = []
    for i in range(n_layers):
        lp = {}
        base = f"{pre}encoder.layers.{i}."
        for ln_ in ("layer_norm1", "layer_norm2"):
            lp[ln_] = {"scale": jnp.asarray(sd[base + ln_ + ".weight"]),
                       "bias": jnp.asarray(sd[base + ln_ + ".bias"])}
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lp[proj] = {
                "kernel": jnp.asarray(
                    sd[base + "self_attn." + proj + ".weight"].T),
                "bias": jnp.asarray(
                    sd[base + "self_attn." + proj + ".bias"])}
        for fc in ("fc1", "fc2"):
            lp[fc] = {"kernel": jnp.asarray(sd[base + "mlp." + fc
                                               + ".weight"].T),
                      "bias": jnp.asarray(sd[base + "mlp." + fc + ".bias"])}
        per_layer.append(lp)
    p["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    if with_projection:
        p["text_projection"] = {
            "kernel": jnp.asarray(sd["text_projection.weight"].T)}
    return p


def _torch_encode(hf_l, hf_g, ids):
    """SDXL dual-encoder conditioning in torch: concat penultimate
    hidden states, pooled = big encoder's projected embedding
    (reference pipeline_stable_diffusion_xl.py:400-463)."""
    tid = torch.from_numpy(np.asarray(ids))
    with torch.no_grad():
        out_l = hf_l(tid, output_hidden_states=True)
        out_g = hf_g(tid, output_hidden_states=True)
    ehs = torch.cat([out_l.hidden_states[-2], out_g.hidden_states[-2]],
                    dim=-1)
    return ehs, out_g.text_embeds


# ---------------------------------------------------------------------------
# Schedulers, re-derived in numpy/torch from the beta schedule
# ---------------------------------------------------------------------------

def _acp():
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, T_TRAIN,
                        dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def _euler_tables(steps):
    """diffusers EulerDiscreteScheduler, 'leading' spacing, offset 1."""
    acp = _acp()
    sig_full = np.sqrt((1 - acp) / acp)
    ratio = T_TRAIN // steps
    ts = (np.arange(steps) * ratio).round()[::-1].astype(np.float64) + 1
    sig = np.interp(ts, np.arange(T_TRAIN), sig_full)
    sig = np.append(sig, 0.0)
    init_sigma = float(np.sqrt(sig.max() ** 2 + 1))
    return ts, sig, init_sigma


def _rescale_cfg(eps, eps_text, g):
    dims = tuple(range(1, eps.ndim))
    std_t = eps_text.std(dim=dims, keepdim=True)
    std_c = eps.std(dim=dims, keepdim=True)
    return g * (eps * (std_t / std_c)) + (1 - g) * eps


def _euler_sample(eps_fn, noise, steps, *, cfg_scale, rescale=0.0):
    """Python Euler loop with sequential-CFG (reference
    inference_animatediff.py:104-131 / pipeline :564-626)."""
    ts, sig, init_sigma = _euler_tables(steps)
    x = noise * init_sigma
    for i in range(steps):
        xin = x / float(np.sqrt(sig[i] ** 2 + 1))
        eps_u = eps_fn(xin, float(ts[i]), False)
        eps_c = eps_fn(xin, float(ts[i]), True)
        eps = eps_u + cfg_scale * (eps_c - eps_u)
        if rescale > 0:
            eps = _rescale_cfg(eps, eps_c, rescale)
        denoised = x - float(sig[i]) * eps
        x = x + (x - denoised) / float(sig[i]) * float(sig[i + 1] - sig[i])
    return x


def _dpm_sample(eps_fn, noise, steps, *, cfg_scale, rescale=0.0):
    """DPM-Solver++ 2M (midpoint), diffusers conventions: leading
    spacing divides by steps+1, final_sigmas_type='zero', first and
    terminal updates first-order."""
    acp = _acp()
    ratio = T_TRAIN // (steps + 1)
    ts = (np.arange(steps + 1) * ratio).round()[::-1][:-1].astype(int) + 1
    a = np.append(np.sqrt(acp[ts]), 1.0)
    s = np.append(np.sqrt(1 - acp[ts]), 0.0)
    lam = np.log(a) - np.log(np.maximum(s, 1e-30))
    x = noise
    prev_x0, prev_lam = None, None
    for i in range(steps):
        eps_u = eps_fn(x, float(ts[i]), False)
        eps_c = eps_fn(x, float(ts[i]), True)
        eps = eps_u + cfg_scale * (eps_c - eps_u)
        if rescale > 0:
            eps = _rescale_cfg(eps, eps_c, rescale)
        x0 = (x - float(s[i]) * eps) / float(a[i])
        if i == steps - 1:          # terminal sigma 0 -> return x0
            x = x0
        elif prev_x0 is None:       # first step: first order
            h = lam[i + 1] - lam[i]
            x = float(s[i + 1] / s[i]) * x \
                - float(a[i + 1] * np.expm1(-h)) * x0
        else:                       # 2M midpoint
            h = lam[i + 1] - lam[i]
            r = (lam[i] - prev_lam) / h
            d = x0 + 0.5 * (x0 - prev_x0) / float(r)
            x = float(s[i + 1] / s[i]) * x \
                - float(a[i + 1] * np.expm1(-h)) * d
        prev_x0, prev_lam = x0, lam[i]
    return x


def _torch_postprocess(img_nchw):
    img = torch.clamp(img_nchw.float() / 2 + 0.5, 0.0, 1.0)
    return torch.round(img * 255.0).to(torch.uint8)


# ---------------------------------------------------------------------------
# Shared model/state builders
# ---------------------------------------------------------------------------

def _randomize_lora(params, state, seed):
    """Non-trivial mergers + active random column masks so the oracle
    exercises the full gate math, not the all-ones defaults."""
    rng = np.random.RandomState(seed)

    def fix_params(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k in ("merge_content", "merge_style"):
                    out[k] = jnp.asarray(
                        rng.uniform(0.2, 0.9, np.shape(v)), v.dtype)
                else:
                    out[k] = fix_params(v)
            return out
        if isinstance(node, list):
            return [fix_params(v) for v in node]
        return node

    def fix_state(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if isinstance(k, str) and k.startswith("mask_"):
                    out[k] = jnp.asarray(rng.rand(*np.shape(v)) > 0.4)
                elif isinstance(k, str) and k.startswith("use_mask_"):
                    out[k] = jnp.ones(np.shape(v), jnp.bool_)
                else:
                    out[k] = fix_state(v)
            return out
        return node

    return fix_params(params), fix_state(state)


def _build(seed, *, motion=False):
    ucfg = UNetConfig.tiny(use_motion_modules=motion,
                           motion_mid_block=motion)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = init_unet(k1, ucfg, dtype=jnp.float32)
    params, state = insert_unziplora(params, k2, rank=4)
    params, state = _randomize_lora(params, state, seed + 10)
    vcfg = VAEConfig.tiny()
    vae = init_vae(jax.random.PRNGKey(seed + 1), vcfg)

    hf_l = _hf_clip(seed + 2, with_projection=False, hidden_act="quick_gelu")
    hf_g = _hf_clip(seed + 3, with_projection=True, hidden_act="gelu",
                    projection_dim=32)
    cl = CLIPConfig(vocab_size=VOCAB, hidden_size=16, intermediate_size=32,
                    num_layers=2, num_heads=2, hidden_act="quick_gelu")
    cg = CLIPConfig(vocab_size=VOCAB, hidden_size=16, intermediate_size=32,
                    num_layers=2, num_heads=2, hidden_act="gelu",
                    projection_dim=32)
    pl = _convert_clip(hf_l, 2, with_projection=False)
    pg = _convert_clip(hf_g, 2, with_projection=True)
    return ucfg, params, state, vcfg, vae, (hf_l, hf_g, cl, cg, pl, pg)


def _ids(rng):
    ids = rng.randint(2, EOS - 1, size=(1, SEQ)).astype(np.int32)
    ids[0, -1] = EOS
    return ids


def _encode_both(clips, prompts):
    """Encode each prompt's ids on both frameworks; returns
    (jax_embeds, jax_pooled), (torch_embeds, torch_pooled) lists."""
    hf_l, hf_g, cl, cg, pl, pg = clips
    jx, tx = [], []
    for ids in prompts:
        e_j, p_j = encode_sdxl_prompt(pl, cl, pg, cg,
                                      jnp.asarray(ids), jnp.asarray(ids),
                                      eos_l=EOS, eos_g=EOS)
        e_t, p_t = _torch_encode(hf_l, hf_g, ids)
        jx.append((e_j, p_j))
        tx.append((e_t, p_t))
    return jx, tx


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc, np.float32)) \
        .permute(0, 3, 1, 2).contiguous()


def _nhwc(t_nchw):
    return t_nchw.permute(0, 2, 3, 1).numpy()


# ---------------------------------------------------------------------------
# Image pipeline oracle (config #2: triple-prompt UnZipLoRA SDXL)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sampler,rescale", [
    ("euler", 0.0),
    ("euler", 0.7),   # guidance_rescale path (pipeline :591-597)
    ("dpm", 0.0),
])
def test_image_pipeline_oracle(sampler, rescale):
    steps, cfg_scale, res = 3, 4.0, 16
    ucfg, params, state, vcfg, vae, clips = _build(0)
    rng = np.random.RandomState(7)
    prompts = [_ids(rng) for _ in range(4)]  # combined/content/style/neg
    jx, tx = _encode_both(clips, prompts)

    cond = Conditioning(ctx=(jx[0][0], jx[1][0], jx[2][0]),
                        pooled=jx[0][1],
                        time_ids=default_time_ids(res, res, 1))
    uncond = Conditioning(ctx=(jx[3][0], jx[3][0], jx[3][0]),
                          pooled=jx[3][1],
                          time_ids=default_time_ids(res, res, 1))

    key = jax.random.PRNGKey(11)
    lat = generate_latents(
        params, ucfg, uncond, cond, key, height=res, width=res,
        num_steps=steps, cfg_scale=cfg_scale, guidance_rescale=rescale,
        sampler=sampler, mode="both", state=state, impl="xla",
        dtype=jnp.float32, vae_scale_factor=2)
    imgs = decode_images(vae, vcfg, lat)

    # torch mirror: same init noise, sequential CFG, python step loop
    noise = np.asarray(jax.random.normal(key, (1, res // 2, res // 2,
                                               ucfg.in_channels),
                                         jnp.float32))
    t_ids = torch.from_numpy(np.asarray(default_time_ids(res, res, 1)))

    def eps_fn(x_nchw, t, is_cond):
        e, e_c, e_s, p = ((tx[0][0], tx[1][0], tx[2][0], tx[0][1])
                          if is_cond else
                          (tx[3][0], tx[3][0], tx[3][0], tx[3][1]))
        with torch.no_grad():
            return unet_mirror.torch_unet(
                params, ucfg, x_nchw, torch.tensor(float(t)), e, p, t_ids,
                ehs_c=e_c, ehs_s=e_s, mode="both", state=state)

    run = _euler_sample if sampler == "euler" else _dpm_sample
    want_lat = run(eps_fn, _nchw(noise), steps, cfg_scale=cfg_scale,
                   rescale=rescale)
    with torch.no_grad():
        want_img = _torch_postprocess(
            vae_mirror.torch_decode(vae, vcfg, want_lat))

    got_lat = np.transpose(np.asarray(lat), (0, 3, 1, 2))
    np.testing.assert_allclose(got_lat, want_lat.numpy(),
                               rtol=2e-4, atol=2e-4)
    diff = np.abs(np.asarray(imgs, np.int32)
                  - _nhwc(want_img).astype(np.int32))
    assert diff.max() <= 1, f"uint8 image diff {diff.max()}"


# ---------------------------------------------------------------------------
# Video pipeline oracle (config #3: motion UNet + mode switch)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["both", "content", "style"])
def test_video_pipeline_oracle(mode):
    steps, cfg_scale, res, frames = 2, 7.5, 16, 4
    ucfg, params, state, vcfg, vae, clips = _build(1, motion=True)
    rng = np.random.RandomState(13)
    prompts = [_ids(rng) for _ in range(2)]  # combined / negative
    jx, tx = _encode_both(clips, prompts)

    # stage-2 serving conditions spatial cross-attn with the COMBINED
    # prompt on every stream; separation comes from the mode switch
    # (reference AnimateDiffAttnProcessor2_0 absorbs the content/style
    # kwargs, animatediff/attention_processor.py:26,63-66)
    cond = Conditioning(ctx=(jx[0][0], None, None), pooled=jx[0][1],
                        time_ids=default_time_ids(res, res, 1))
    uncond = Conditioning(ctx=(jx[1][0], None, None), pooled=jx[1][1],
                          time_ids=default_time_ids(res, res, 1))

    key = jax.random.PRNGKey(17)
    lat = generate_video_latents(
        params, ucfg, uncond, cond, key, num_frames=frames, height=res,
        width=res, num_steps=steps, cfg_scale=cfg_scale, mode=mode,
        state=state, impl="xla", dtype=jnp.float32, vae_scale_factor=2)
    video = decode_video(vae, vcfg, lat, chunk=1)

    noise = np.asarray(jax.random.normal(
        key, (frames, res // 2, res // 2, ucfg.in_channels), jnp.float32))
    t_ids = torch.from_numpy(np.asarray(default_time_ids(res, res, 1)))

    def eps_fn(x_nchw, t, is_cond):
        e, p = tx[0] if is_cond else tx[1]
        with torch.no_grad():
            return unet_mirror.torch_unet(
                params, ucfg, x_nchw, torch.tensor(float(t)), e, p, t_ids,
                num_frames=frames, mode=mode, state=state)

    want_lat = _euler_sample(eps_fn, _nchw(noise), steps,
                             cfg_scale=cfg_scale)
    with torch.no_grad():
        want_frames = _torch_postprocess(
            vae_mirror.torch_decode(vae, vcfg, want_lat))

    got_lat = np.transpose(np.asarray(lat), (0, 3, 1, 2))
    np.testing.assert_allclose(got_lat, want_lat.numpy(),
                               rtol=2e-4, atol=2e-4)
    diff = np.abs(np.asarray(video, np.int32)
                  - _nhwc(want_frames).astype(np.int32))
    assert diff.max() <= 1, f"uint8 frame diff {diff.max()}"


# ---------------------------------------------------------------------------
# Batched CFG pair == two sequential UNet calls (jax-level, exact):
# the reference's video CFG form (inference_animatediff.py:109-122)
# ---------------------------------------------------------------------------

def test_batched_cfg_pair_equals_sequential_calls():
    ucfg, params, state, _, _, _ = _build(2, motion=True)
    d = ucfg.cross_attention_dim
    rng = np.random.RandomState(3)
    frames, res = 2, 8
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))  # noqa: E731
    cond = Conditioning(ctx=(mk(1, SEQ, d), None, None),
                        pooled=mk(1, 32),
                        time_ids=default_time_ids(res, res, 1))
    uncond = Conditioning(ctx=(mk(1, SEQ, d), None, None),
                          pooled=mk(1, 32),
                          time_ids=default_time_ids(res, res, 1))
    cfg_scale = 7.5
    eps_fn = make_cfg_denoiser(params, ucfg, uncond, cond,
                               cfg_scale=cfg_scale, mode="both",
                               state=state, num_frames=frames, impl="xla",
                               dtype=jnp.float32)
    lat = mk(frames, res // 2, res // 2, ucfg.in_channels)
    t = jnp.float32(321.0)
    got = eps_fn(lat, t)

    def one(c):
        return unet_apply(params, ucfg, lat, t, c.ctx, c.pooled,
                          c.time_ids, mode="both", state=state,
                          num_frames=frames, impl="xla")

    eps_u, eps_c = one(uncond), one(cond)
    want = eps_u + cfg_scale * (eps_c - eps_u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
