"""Generate golden key-name + SHAPE inventories for the real checkpoints
the reference loads (train_unziplora.py:1240-1287,
animatediff/utils.py:13-45):

  keys_sdxl_unet.txt      stabilityai/stable-diffusion-xl-base-1.0 unet/
  keys_sdxl_vae.txt       .../vae/
  keys_clip_l.txt         .../text_encoder/    (CLIPTextModel)
  keys_clip_g.txt         .../text_encoder_2/  (CLIPTextModelWithProjection)
  keys_motion_adapter_sdxl_beta.txt
                          guoyww/animatediff-motion-adapter-sdxl-beta

Line format: ``<key>\t<shape tuple>`` in torch checkpoint convention
(linear (out, in), conv OIHW); ``OPTIONAL:``-prefixed entries may be
absent from a checkpoint.

The checkpoints themselves are not in this environment; these tables are
written LONGHAND from the diffusers/transformers module structures (each
``add`` call spells out a torch parameter path AND its shape: channel
flow through the resnet chain, skip-concat input channels on the up
path, attention inner/cross dims), deliberately NOT via
utils/hf_convert's pytree walk — tests/test_key_inventory.py checks the
two independent encodings agree on both names and shapes, so a naming
OR transposed/mis-sized expectation in either fails there instead of at
first real-weight load.

CAVEAT (verify at first real-weight load): CLIP naming/shapes are
machine-checked against a real transformers.CLIPTextModel
(tests/test_clip.py), but the UNet/VAE/motion inventories are
single-sourced — both encodings were written by the same author from
the diffusers structure, so a shared misconception would pass the
agreement test. The full-UNet/VAE torch wiring oracles pin the GRAPH
independently; the literal diffusers spellings/shapes still deserve one
diff against a real checkpoint's state_dict when one is available
(cli/verify_parity.py step 1 does exactly that).

Run:  python tests/fixtures/gen_key_inventory.py
"""
import os

OUT_DIR = os.path.dirname(os.path.abspath(__file__))

# ---------------------------------------------------------------------------
# SDXL UNet (config of stabilityai/stable-diffusion-xl-base-1.0)
# ---------------------------------------------------------------------------
CH = [320, 640, 1280]
TRANSFORMER_LAYERS = [1, 2, 10]          # per block level (level 0 unused)
LAYERS_PER_BLOCK = 2
CROSS_DIM = 2048
TIME_DIM = 4 * CH[0]                     # 1280
ADD_IN = 1280 + 6 * 256                  # pooled + 6 time-id sinusoids


def _resnet(prefix, in_c, out_c, time_emb=True):
    """diffusers ResnetBlock2D: GN/conv3x3 ×2 (+time proj, +1x1 shortcut
    when in_c != out_c)."""
    e = {
        f"{prefix}.norm1.weight": (in_c,), f"{prefix}.norm1.bias": (in_c,),
        f"{prefix}.conv1.weight": (out_c, in_c, 3, 3),
        f"{prefix}.conv1.bias": (out_c,),
        f"{prefix}.norm2.weight": (out_c,), f"{prefix}.norm2.bias": (out_c,),
        f"{prefix}.conv2.weight": (out_c, out_c, 3, 3),
        f"{prefix}.conv2.bias": (out_c,),
    }
    if time_emb:
        e[f"{prefix}.time_emb_proj.weight"] = (out_c, TIME_DIM)
        e[f"{prefix}.time_emb_proj.bias"] = (out_c,)
    if in_c != out_c:
        e[f"{prefix}.conv_shortcut.weight"] = (out_c, in_c, 1, 1)
        e[f"{prefix}.conv_shortcut.bias"] = (out_c,)
    return e


def _transformer_block(prefix, c, cross_dim):
    """BasicTransformerBlock at inner dim c; attn2 keys/values project
    from cross_dim (== c for the motion modules' double self-attention)."""
    e = {}
    for norm in ("norm1", "norm2", "norm3"):
        e[f"{prefix}.{norm}.weight"] = (c,)
        e[f"{prefix}.{norm}.bias"] = (c,)
    for attn, kv_dim in (("attn1", c), ("attn2", cross_dim)):
        e[f"{prefix}.{attn}.to_q.weight"] = (c, c)         # bias-free
        e[f"{prefix}.{attn}.to_k.weight"] = (c, kv_dim)
        e[f"{prefix}.{attn}.to_v.weight"] = (c, kv_dim)
        e[f"{prefix}.{attn}.to_out.0.weight"] = (c, c)
        e[f"{prefix}.{attn}.to_out.0.bias"] = (c,)
    e[f"{prefix}.ff.net.0.proj.weight"] = (8 * c, c)       # GEGLU: 2*4c
    e[f"{prefix}.ff.net.0.proj.bias"] = (8 * c,)
    e[f"{prefix}.ff.net.2.weight"] = (c, 4 * c)
    e[f"{prefix}.ff.net.2.bias"] = (c,)
    return e


def _transformer_2d(prefix, c, num_layers):
    """Transformer2DModel with use_linear_projection=True (SDXL):
    proj_in/out are LINEAR (c, c), not 1x1 convs."""
    e = {f"{prefix}.norm.weight": (c,), f"{prefix}.norm.bias": (c,),
         f"{prefix}.proj_in.weight": (c, c), f"{prefix}.proj_in.bias": (c,)}
    for k in range(num_layers):
        e.update(_transformer_block(f"{prefix}.transformer_blocks.{k}",
                                    c, CROSS_DIM))
    e[f"{prefix}.proj_out.weight"] = (c, c)
    e[f"{prefix}.proj_out.bias"] = (c,)
    return e


def sdxl_unet_entries():
    e = {"conv_in.weight": (CH[0], 4, 3, 3), "conv_in.bias": (CH[0],)}
    e.update({
        "time_embedding.linear_1.weight": (TIME_DIM, CH[0]),
        "time_embedding.linear_1.bias": (TIME_DIM,),
        "time_embedding.linear_2.weight": (TIME_DIM, TIME_DIM),
        "time_embedding.linear_2.bias": (TIME_DIM,),
        "add_embedding.linear_1.weight": (TIME_DIM, ADD_IN),
        "add_embedding.linear_1.bias": (TIME_DIM,),
        "add_embedding.linear_2.weight": (TIME_DIM, TIME_DIM),
        "add_embedding.linear_2.bias": (TIME_DIM,),
    })

    # down: DownBlock2D, CrossAttnDownBlock2D, CrossAttnDownBlock2D.
    # Skip stack recorded for the up path's concat channel accounting.
    skips = [CH[0]]                      # conv_in output
    in_c = CH[0]
    for i in range(3):
        out_c = CH[i]
        for j in range(LAYERS_PER_BLOCK):
            rin = in_c if j == 0 else out_c
            e.update(_resnet(f"down_blocks.{i}.resnets.{j}", rin, out_c))
            if i > 0:
                e.update(_transformer_2d(f"down_blocks.{i}.attentions.{j}",
                                         out_c, TRANSFORMER_LAYERS[i]))
            skips.append(out_c)
        if i < 2:
            e[f"down_blocks.{i}.downsamplers.0.conv.weight"] = \
                (out_c, out_c, 3, 3)
            e[f"down_blocks.{i}.downsamplers.0.conv.bias"] = (out_c,)
            skips.append(out_c)
        in_c = out_c

    # mid: UNetMidBlock2DCrossAttn at 1280
    c = CH[2]
    e.update(_resnet("mid_block.resnets.0", c, c))
    e.update(_transformer_2d("mid_block.attentions.0", c,
                             TRANSFORMER_LAYERS[2]))
    e.update(_resnet("mid_block.resnets.1", c, c))

    # up: CrossAttnUpBlock2D, CrossAttnUpBlock2D, UpBlock2D. Every
    # up-resnet input = prev output + popped skip (so in != out always
    # and every resnet carries a conv_shortcut).
    rev = list(reversed(CH))             # [1280, 640, 320]
    prev = CH[2]                         # from mid
    for i in range(3):
        out_c = rev[i]
        for j in range(LAYERS_PER_BLOCK + 1):
            rin = prev + skips.pop()
            e.update(_resnet(f"up_blocks.{i}.resnets.{j}", rin, out_c))
            if i < 2:
                e.update(_transformer_2d(f"up_blocks.{i}.attentions.{j}",
                                         out_c, TRANSFORMER_LAYERS[2 - i]))
            prev = out_c
        if i < 2:
            e[f"up_blocks.{i}.upsamplers.0.conv.weight"] = \
                (out_c, out_c, 3, 3)
            e[f"up_blocks.{i}.upsamplers.0.conv.bias"] = (out_c,)

    e.update({"conv_norm_out.weight": (CH[0],),
              "conv_norm_out.bias": (CH[0],),
              "conv_out.weight": (4, CH[0], 3, 3), "conv_out.bias": (4,)})
    return e


# ---------------------------------------------------------------------------
# SDXL VAE (AutoencoderKL, block_out_channels 128/256/512/512, latent 4)
# ---------------------------------------------------------------------------
VAE_CH = [128, 256, 512, 512]


def _vae_mid(prefix):
    c = VAE_CH[-1]
    e = _resnet(f"{prefix}.resnets.0", c, c, time_emb=False)
    e[f"{prefix}.attentions.0.group_norm.weight"] = (c,)
    e[f"{prefix}.attentions.0.group_norm.bias"] = (c,)
    for proj in ("to_q", "to_v", "to_k"):  # VAE attention carries biases
        e[f"{prefix}.attentions.0.{proj}.weight"] = (c, c)
        e[f"{prefix}.attentions.0.{proj}.bias"] = (c,)
    e[f"{prefix}.attentions.0.to_out.0.weight"] = (c, c)
    e[f"{prefix}.attentions.0.to_out.0.bias"] = (c,)
    e.update(_resnet(f"{prefix}.resnets.1", c, c, time_emb=False))
    return e


def sdxl_vae_entries():
    e = {"encoder.conv_in.weight": (VAE_CH[0], 3, 3, 3),
         "encoder.conv_in.bias": (VAE_CH[0],)}
    in_c = VAE_CH[0]
    for i in range(4):
        out_c = VAE_CH[i]
        for j in range(2):
            rin = in_c if j == 0 else out_c
            e.update(_resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                             rin, out_c, time_emb=False))
        if i < 3:
            e[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = \
                (out_c, out_c, 3, 3)
            e[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = (out_c,)
        in_c = out_c
    e.update(_vae_mid("encoder.mid_block"))
    e.update({"encoder.conv_norm_out.weight": (VAE_CH[-1],),
              "encoder.conv_norm_out.bias": (VAE_CH[-1],),
              "encoder.conv_out.weight": (8, VAE_CH[-1], 3, 3),
              "encoder.conv_out.bias": (8,)})   # 2 * latent (mean‖logvar)

    e.update({"decoder.conv_in.weight": (VAE_CH[-1], 4, 3, 3),
              "decoder.conv_in.bias": (VAE_CH[-1],)})
    e.update(_vae_mid("decoder.mid_block"))
    rev = list(reversed(VAE_CH))         # [512, 512, 256, 128]
    in_c = rev[0]
    for i in range(4):
        out_c = rev[i]
        for j in range(3):
            rin = in_c if j == 0 else out_c
            e.update(_resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                             rin, out_c, time_emb=False))
        if i < 3:
            e[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = \
                (out_c, out_c, 3, 3)
            e[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = (out_c,)
        in_c = out_c
    e.update({"decoder.conv_norm_out.weight": (VAE_CH[0],),
              "decoder.conv_norm_out.bias": (VAE_CH[0],),
              "decoder.conv_out.weight": (3, VAE_CH[0], 3, 3),
              "decoder.conv_out.bias": (3,),
              "quant_conv.weight": (8, 8, 1, 1), "quant_conv.bias": (8,),
              "post_quant_conv.weight": (4, 4, 1, 1),
              "post_quant_conv.bias": (4,)})
    return e


# ---------------------------------------------------------------------------
# CLIP text encoders (transformers naming)
# ---------------------------------------------------------------------------

def clip_entries(num_layers, d, inter, *, vocab=49408, max_pos=77,
                 projection_dim=None):
    pre = "text_model."
    e = {pre + "embeddings.token_embedding.weight": (vocab, d),
         pre + "embeddings.position_embedding.weight": (max_pos, d)}
    for i in range(num_layers):
        base = f"{pre}encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            e[base + ln + ".weight"] = (d,)
            e[base + ln + ".bias"] = (d,)
        for proj in ("k_proj", "v_proj", "q_proj", "out_proj"):
            e[base + "self_attn." + proj + ".weight"] = (d, d)
            e[base + "self_attn." + proj + ".bias"] = (d,)
        e[base + "mlp.fc1.weight"] = (inter, d)
        e[base + "mlp.fc1.bias"] = (inter,)
        e[base + "mlp.fc2.weight"] = (d, inter)
        e[base + "mlp.fc2.bias"] = (d,)
    e[pre + "final_layer_norm.weight"] = (d,)
    e[pre + "final_layer_norm.bias"] = (d,)
    if projection_dim is not None:
        e["text_projection.weight"] = (projection_dim, d)  # no bias
    return e


# ---------------------------------------------------------------------------
# MotionAdapter (guoyww/animatediff-motion-adapter-sdxl-beta:
# block_out_channels [320, 640, 1280], motion_layers_per_block 2,
# use_motion_mid_block false, 1 transformer block per module, 8 heads).
# The motion transformer runs DOUBLE self-attention, so attn2 k/v
# project from c (not a cross dim). pos_embed.pe sinusoidal buffers are
# persistent in the diffusers module; importers must tolerate their
# presence OR absence — listed with an OPTIONAL: prefix, shape
# (1, 32, c) (max 32 frames).
# ---------------------------------------------------------------------------

def motion_adapter_entries():
    e = {}

    def module(prefix, c):
        e[f"{prefix}.norm.weight"] = (c,)
        e[f"{prefix}.norm.bias"] = (c,)
        e[f"{prefix}.proj_in.weight"] = (c, c)
        e[f"{prefix}.proj_in.bias"] = (c,)
        e.update(_transformer_block(
            f"{prefix}.transformer_blocks.0", c, c))
        e[f"OPTIONAL:{prefix}.transformer_blocks.0.pos_embed.pe"] = \
            (1, 32, c)
        e[f"{prefix}.proj_out.weight"] = (c, c)
        e[f"{prefix}.proj_out.bias"] = (c,)

    for i in range(3):
        for j in range(2):
            module(f"down_blocks.{i}.motion_modules.{j}", CH[i])
    rev = list(reversed(CH))
    for i in range(3):
        for j in range(3):
            module(f"up_blocks.{i}.motion_modules.{j}", rev[i])
    return e


def main():
    outputs = {
        "keys_sdxl_unet.txt": sdxl_unet_entries(),
        "keys_sdxl_vae.txt": sdxl_vae_entries(),
        "keys_clip_l.txt": clip_entries(12, 768, 3072),
        "keys_clip_g.txt": clip_entries(32, 1280, 5120,
                                        projection_dim=1280),
        "keys_motion_adapter_sdxl_beta.txt": motion_adapter_entries(),
    }
    for name, entries in outputs.items():
        path = os.path.join(OUT_DIR, name)
        with open(path, "w") as f:
            for k in sorted(entries):
                f.write(f"{k}\t{tuple(entries[k])}\n")
        print(f"{name}: {len(entries)} keys")


if __name__ == "__main__":
    main()
