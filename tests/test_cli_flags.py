"""Round-2 CLI parity flags: gradient accumulation, 8-bit Adam,
scheduler variants, crop coords, validation knobs, reference flag
aliases — all exercised through the real CLIs in smoke mode."""
import os

import numpy as np
import pytest


@pytest.mark.slow
@pytest.mark.e2e
def test_stage1_new_flags_smoke(tmp_path):
    out1 = str(tmp_path / "stage1")
    from video_style_transfer_tpu.cli.train_unziplora import main as train1
    state = train1([
        "--smoke", "--smoke_steps", "3", "--num_instance_frames", "2",
        "--instance_prompt", "a sbu horse in szn style",
        "--content_forward_prompt", "a sbu horse",
        "--style_forward_prompt", "in szn style",
        "--output_dir", out1, "--name", "horse",
        "--checkpointing_steps", "100",
        # round-2 parity surface
        "--gradient_accumulation_steps", "2",
        "--use_8bit_adam",
        "--lr_scheduler", "cosine_with_restarts", "--lr_num_cycles", "2",
        "--lr_warmup_steps", "1",
        "--scale_lr",
        "--adam_beta1", "0.85", "--adam_weight_decay", "0.02",
        "--crops_coords_top_left_h", "2", "--crops_coords_top_left_w", "3",
        "--num_validation_images", "2",
        "--with_accumulate_cone", "--with_one_shot",
        "--enable_xformers_memory_efficient_attention", "--allow_tf32",
        "--num_train_epochs", "3",
        "--repeats", "2",
    ])
    assert int(state.step) == 3  # smoke_steps wins over epoch accounting
    assert os.path.exists(os.path.join(
        out1, "horse_content", "pytorch_lora_weights.safetensors"))


@pytest.mark.slow
@pytest.mark.e2e
def test_stage1_train_text_encoder_raises():
    from video_style_transfer_tpu.cli.train_unziplora import main as train1
    with pytest.raises(NotImplementedError):
        train1(["--smoke", "--train_text_encoder",
                "--instance_prompt", "x",
                "--content_forward_prompt", "x",
                "--style_forward_prompt", "x"])


@pytest.mark.slow
@pytest.mark.e2e
def test_stage2_and_infer_video_aliases(tmp_path):
    out1 = str(tmp_path / "stage1")
    out2 = str(tmp_path / "stage2")
    out3 = str(tmp_path / "videos")

    from video_style_transfer_tpu.cli.train_unziplora import main as train1
    train1(["--smoke", "--smoke_steps", "2", "--num_instance_frames", "1",
            "--instance_prompt", "a sbu horse in szn style",
            "--content_forward_prompt", "a sbu horse",
            "--style_forward_prompt", "in szn style",
            "--output_dir", out1, "--name", "horse",
            "--checkpointing_steps", "100"])

    from video_style_transfer_tpu.cli.train_animatediff import main as train2
    # reference spellings: --instance_prompt + explicit artifact paths +
    # --adam_weight_decay alias + accumulation
    train2(["--smoke", "--smoke_steps", "2",
            "--instance_prompt", "a sbu horse",
            "--unziplora_content_path", os.path.join(out1, "horse_content"),
            "--unziplora_style_path", os.path.join(out1, "horse_style"),
            "--unziplora_content_weight_path",
            os.path.join(out1, "horse_merger_content.pth"),
            "--unziplora_style_weight_path",
            os.path.join(out1, "horse_merger_style.pth"),
            "--gradient_accumulation_steps", "2",
            "--adam_weight_decay", "0.02",
            "--lr_scheduler", "constant_with_warmup",
            "--optimizer", "adamw8bit",
            "--enable_gradient_checkpointing",
            "--output_dir", out2, "--lr_warmup_steps", "1",
            "--checkpointing_steps", "100"])
    motion = os.path.join(out2, "motion_modules.safetensors")
    assert os.path.exists(motion)

    from video_style_transfer_tpu.cli.infer_video import main as infer
    outs = infer(["--smoke", "--instance_prompt", "a sbu horse in szn style",
                  "--content_prompt", "a sbu horse",
                  "--motion_adapter_path", motion,
                  "--unziplora_content_path",
                  os.path.join(out1, "horse_content"),
                  "--unziplora_style_path",
                  os.path.join(out1, "horse_style"),
                  "--unziplora_content_weight_path",
                  os.path.join(out1, "horse_merger_content.pth"),
                  "--unziplora_style_weight_path",
                  os.path.join(out1, "horse_merger_style.pth"),
                  "--modes", "both", "content",
                  "--save_dir", out3])
    assert len(outs) == 2
    for p in outs:
        assert os.path.getsize(p) > 0


def test_load_image_dir_crop_modes(tmp_path):
    from PIL import Image
    from video_style_transfer_tpu.data.video import load_image_dir
    # non-square source: 32x16 gradient
    arr = np.tile(np.arange(32, dtype=np.uint8)[None, :, None] * 8,
                  (16, 1, 3))
    Image.fromarray(arr).save(tmp_path / "a.png")

    sq = load_image_dir(str(tmp_path), 16, crop="squish")
    ce = load_image_dir(str(tmp_path), 16, crop="center")
    ra = load_image_dir(str(tmp_path), 16, crop="random", seed=3)
    for out in (sq, ce, ra):
        assert out.shape == (1, 16, 16, 3)
        assert out.min() >= -1.0 and out.max() <= 1.0
    # center crop of the horizontal gradient keeps the middle columns:
    # mean equals the full-row mean; squish also keeps the full range.
    # The three modes must actually differ on a non-square source
    assert not np.allclose(sq, ce)
    # random with a different seed can hit the center; just check shape +
    # determinism
    ra2 = load_image_dir(str(tmp_path), 16, crop="random", seed=3)
    np.testing.assert_array_equal(ra, ra2)
