"""Generate golden key-name inventories for the real checkpoints the
reference loads (train_unziplora.py:1240-1287, animatediff/utils.py:13-45):

  keys_sdxl_unet.txt      stabilityai/stable-diffusion-xl-base-1.0 unet/
  keys_sdxl_vae.txt       .../vae/
  keys_clip_l.txt         .../text_encoder/    (CLIPTextModel)
  keys_clip_g.txt         .../text_encoder_2/  (CLIPTextModelWithProjection)
  keys_motion_adapter_sdxl_beta.txt
                          guoyww/animatediff-motion-adapter-sdxl-beta

The checkpoints themselves are not in this environment; these lists are
written LONGHAND from the diffusers/transformers module structures (each
``add`` call spells out a torch parameter path), deliberately NOT via
utils/hf_convert's pytree walk — tests/test_key_inventory.py checks the
two independent encodings agree, so a naming bug in either fails there
instead of at first real-weight load.

CAVEAT (verify at first real-weight load): CLIP naming is machine-
checked against a real transformers.CLIPTextModel (tests/test_clip.py),
but the UNet/VAE/motion inventories are single-sourced — both encodings
were written by the same author from memory of the diffusers structure,
so a shared misconception would pass the agreement test. The full-UNet
torch wiring oracle (tests/test_unet_wiring_oracle.py) pins the GRAPH
independently; the literal diffusers key spellings still deserve one
diff against a real checkpoint's state_dict when one is available.

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


def _resnet(prefix, has_shortcut, time_emb=True):
    keys = []
    for name in ("norm1", "conv1", "norm2", "conv2"):
        keys += [f"{prefix}.{name}.weight", f"{prefix}.{name}.bias"]
    if time_emb:
        keys += [f"{prefix}.time_emb_proj.weight",
                 f"{prefix}.time_emb_proj.bias"]
    if has_shortcut:
        keys += [f"{prefix}.conv_shortcut.weight",
                 f"{prefix}.conv_shortcut.bias"]
    return keys


def _transformer_block(prefix, cross_attn=True):
    keys = []
    for norm in ("norm1", "norm2", "norm3"):
        keys += [f"{prefix}.{norm}.weight", f"{prefix}.{norm}.bias"]
    for attn in ("attn1", "attn2"):
        for proj in ("to_q", "to_k", "to_v"):
            keys.append(f"{prefix}.{attn}.{proj}.weight")  # bias-free
        keys += [f"{prefix}.{attn}.to_out.0.weight",
                 f"{prefix}.{attn}.to_out.0.bias"]
    keys += [f"{prefix}.ff.net.0.proj.weight", f"{prefix}.ff.net.0.proj.bias",
             f"{prefix}.ff.net.2.weight", f"{prefix}.ff.net.2.bias"]
    return keys


def _transformer_2d(prefix, num_layers):
    """Transformer2DModel with use_linear_projection=True (SDXL)."""
    keys = [f"{prefix}.norm.weight", f"{prefix}.norm.bias",
            f"{prefix}.proj_in.weight", f"{prefix}.proj_in.bias"]
    for k in range(num_layers):
        keys += _transformer_block(f"{prefix}.transformer_blocks.{k}")
    keys += [f"{prefix}.proj_out.weight", f"{prefix}.proj_out.bias"]
    return keys


def sdxl_unet_keys():
    keys = ["conv_in.weight", "conv_in.bias"]
    for emb in ("time_embedding", "add_embedding"):
        for lin in ("linear_1", "linear_2"):
            keys += [f"{emb}.{lin}.weight", f"{emb}.{lin}.bias"]

    # down: DownBlock2D, CrossAttnDownBlock2D, CrossAttnDownBlock2D
    in_c = CH[0]
    for i in range(3):
        out_c = CH[i]
        for j in range(LAYERS_PER_BLOCK):
            keys += _resnet(f"down_blocks.{i}.resnets.{j}",
                            has_shortcut=(j == 0 and in_c != out_c))
            if i > 0:
                keys += _transformer_2d(f"down_blocks.{i}.attentions.{j}",
                                        TRANSFORMER_LAYERS[i])
        if i < 2:
            keys += [f"down_blocks.{i}.downsamplers.0.conv.weight",
                     f"down_blocks.{i}.downsamplers.0.conv.bias"]
        in_c = out_c

    # mid: UNetMidBlock2DCrossAttn
    keys += _resnet("mid_block.resnets.0", has_shortcut=False)
    keys += _transformer_2d("mid_block.attentions.0", TRANSFORMER_LAYERS[2])
    keys += _resnet("mid_block.resnets.1", has_shortcut=False)

    # up: CrossAttnUpBlock2D, CrossAttnUpBlock2D, UpBlock2D.
    # Every SDXL up-resnet concatenates a skip, so in != out always.
    rev = list(reversed(CH))
    for i in range(3):
        for j in range(LAYERS_PER_BLOCK + 1):
            keys += _resnet(f"up_blocks.{i}.resnets.{j}", has_shortcut=True)
            if i < 2:
                keys += _transformer_2d(f"up_blocks.{i}.attentions.{j}",
                                        TRANSFORMER_LAYERS[2 - i])
        if i < 2:
            keys += [f"up_blocks.{i}.upsamplers.0.conv.weight",
                     f"up_blocks.{i}.upsamplers.0.conv.bias"]

    keys += ["conv_norm_out.weight", "conv_norm_out.bias",
             "conv_out.weight", "conv_out.bias"]
    return keys


# ---------------------------------------------------------------------------
# SDXL VAE (AutoencoderKL, block_out_channels 128/256/512/512)
# ---------------------------------------------------------------------------
VAE_CH = [128, 256, 512, 512]


def _vae_mid(prefix):
    keys = _resnet(f"{prefix}.resnets.0", False, time_emb=False)
    keys += [f"{prefix}.attentions.0.group_norm.weight",
             f"{prefix}.attentions.0.group_norm.bias"]
    for proj in ("to_q", "to_k", "to_v"):  # VAE attention carries biases
        keys += [f"{prefix}.attentions.0.{proj}.weight",
                 f"{prefix}.attentions.0.{proj}.bias"]
    keys += [f"{prefix}.attentions.0.to_out.0.weight",
             f"{prefix}.attentions.0.to_out.0.bias"]
    keys += _resnet(f"{prefix}.resnets.1", False, time_emb=False)
    return keys


def sdxl_vae_keys():
    keys = ["encoder.conv_in.weight", "encoder.conv_in.bias"]
    in_c = VAE_CH[0]
    for i in range(4):
        out_c = VAE_CH[i]
        for j in range(2):
            keys += _resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                            has_shortcut=(j == 0 and in_c != out_c),
                            time_emb=False)
        if i < 3:
            keys += [f"encoder.down_blocks.{i}.downsamplers.0.conv.weight",
                     f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"]
        in_c = out_c
    keys += _vae_mid("encoder.mid_block")
    keys += ["encoder.conv_norm_out.weight", "encoder.conv_norm_out.bias",
             "encoder.conv_out.weight", "encoder.conv_out.bias"]

    keys += ["decoder.conv_in.weight", "decoder.conv_in.bias"]
    keys += _vae_mid("decoder.mid_block")
    rev = list(reversed(VAE_CH))
    in_c = rev[0]
    for i in range(4):
        out_c = rev[i]
        for j in range(3):
            keys += _resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                            has_shortcut=(j == 0 and in_c != out_c),
                            time_emb=False)
        if i < 3:
            keys += [f"decoder.up_blocks.{i}.upsamplers.0.conv.weight",
                     f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"]
        in_c = out_c
    keys += ["decoder.conv_norm_out.weight", "decoder.conv_norm_out.bias",
             "decoder.conv_out.weight", "decoder.conv_out.bias",
             "quant_conv.weight", "quant_conv.bias",
             "post_quant_conv.weight", "post_quant_conv.bias"]
    return keys


# ---------------------------------------------------------------------------
# CLIP text encoders (transformers naming)
# ---------------------------------------------------------------------------

def clip_keys(num_layers, with_projection):
    pre = "text_model."
    keys = [pre + "embeddings.token_embedding.weight",
            pre + "embeddings.position_embedding.weight"]
    for i in range(num_layers):
        base = f"{pre}encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            keys += [base + ln + ".weight", base + ln + ".bias"]
        for proj in ("k_proj", "v_proj", "q_proj", "out_proj"):
            keys += [base + "self_attn." + proj + ".weight",
                     base + "self_attn." + proj + ".bias"]
        for fc in ("fc1", "fc2"):
            keys += [base + "mlp." + fc + ".weight",
                     base + "mlp." + fc + ".bias"]
    keys += [pre + "final_layer_norm.weight", pre + "final_layer_norm.bias"]
    if with_projection:
        keys.append("text_projection.weight")  # no bias
    return keys


# ---------------------------------------------------------------------------
# MotionAdapter (guoyww/animatediff-motion-adapter-sdxl-beta:
# block_out_channels [320, 640, 1280], motion_layers_per_block 2,
# use_motion_mid_block false, 1 transformer block per module).
# pos_embed.pe sinusoidal buffers are persistent in the diffusers module;
# importers must tolerate their presence OR absence — listed with an
# OPTIONAL: prefix.
# ---------------------------------------------------------------------------

def motion_adapter_keys():
    keys = []

    def module(prefix):
        keys.extend([f"{prefix}.norm.weight", f"{prefix}.norm.bias",
                     f"{prefix}.proj_in.weight", f"{prefix}.proj_in.bias"])
        keys.extend(_transformer_block(f"{prefix}.transformer_blocks.0"))
        keys.append(
            f"OPTIONAL:{prefix}.transformer_blocks.0.pos_embed.pe")
        keys.extend([f"{prefix}.proj_out.weight", f"{prefix}.proj_out.bias"])

    for i in range(3):
        for j in range(2):
            module(f"down_blocks.{i}.motion_modules.{j}")
    for i in range(3):
        for j in range(3):
            module(f"up_blocks.{i}.motion_modules.{j}")
    return keys


def main():
    outputs = {
        "keys_sdxl_unet.txt": sdxl_unet_keys(),
        "keys_sdxl_vae.txt": sdxl_vae_keys(),
        "keys_clip_l.txt": clip_keys(12, with_projection=False),
        "keys_clip_g.txt": clip_keys(32, with_projection=True),
        "keys_motion_adapter_sdxl_beta.txt": motion_adapter_keys(),
    }
    for name, keys in outputs.items():
        path = os.path.join(OUT_DIR, name)
        with open(path, "w") as f:
            f.write("\n".join(sorted(keys)) + "\n")
        print(f"{name}: {len(keys)} keys")


if __name__ == "__main__":
    main()
