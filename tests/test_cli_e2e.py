"""Full-chain CLI integration: stage-1 training -> reference-format
artifacts -> stage-2 training (re-importing the artifacts) -> three-mode
video inference (re-importing both stages). This is the TPU analog of the
reference's final reload + inference smoke pass
(train_unziplora.py:2428-2509)."""
import os

import pytest


@pytest.mark.slow
@pytest.mark.e2e
def test_full_pipeline_chain(tmp_path):
    out1 = str(tmp_path / "stage1")
    out2 = str(tmp_path / "stage2")
    out3 = str(tmp_path / "videos")

    from video_style_transfer_tpu.cli.train_unziplora import main as train1
    train1(["--smoke", "--smoke_steps", "4", "--num_instance_frames", "2",
            "--instance_prompt", "a sbu horse in szn style",
            "--content_forward_prompt", "a sbu horse",
            "--style_forward_prompt", "in szn style",
            "--with_period_column_separation", "--sample_times", "2",
            "--output_dir", out1, "--name", "horse",
            "--checkpointing_steps", "100"])
    assert os.path.exists(os.path.join(
        out1, "horse_content", "pytorch_lora_weights.safetensors"))
    assert os.path.exists(os.path.join(out1, "horse_merger_style.pth"))

    from video_style_transfer_tpu.cli.train_animatediff import main as train2
    train2(["--smoke", "--smoke_steps", "2", "--prompt", "a sbu horse",
            "--unziplora_name_or_path", out1, "--unziplora_name", "horse",
            "--output_dir", out2, "--lr_warmup_steps", "1",
            "--checkpointing_steps", "100"])
    motion = os.path.join(out2, "motion_modules.safetensors")
    assert os.path.exists(motion)

    from video_style_transfer_tpu.cli.infer_video import main as infer
    outs = infer(["--smoke", "--prompt", "a sbu horse in szn style",
                  "--motion_checkpoint", motion,
                  "--unziplora_name_or_path", out1,
                  "--unziplora_name", "horse",
                  "--modes", "both", "content",
                  "--output_dir", out3])
    assert len(outs) == 2
    for p in outs:
        assert os.path.getsize(p) > 0


@pytest.mark.slow
@pytest.mark.e2e
def test_stage1_resume(tmp_path):
    """Train 4 steps with checkpointing every 2, then resume from latest
    and confirm the step counter continues (the reference's resume flag
    raises NotImplementedError, train_unziplora.py:1985-1986)."""
    out = str(tmp_path / "resume")
    from video_style_transfer_tpu.cli.train_unziplora import main as train1
    args = ["--smoke", "--num_instance_frames", "1",
            "--instance_prompt", "p", "--content_forward_prompt", "c",
            "--style_forward_prompt", "s", "--output_dir", out,
            "--checkpointing_steps", "2"]
    train1(args + ["--smoke_steps", "4"])
    assert os.path.isdir(os.path.join(out, "checkpoints", "checkpoint-4"))
    state = train1(args + ["--smoke_steps", "6",
                           "--resume_from_checkpoint", "latest"])
    assert int(state.step) == 6


@pytest.mark.slow
@pytest.mark.e2e
def test_prior_preservation_class_image_generation(tmp_path):
    """--with_prior_preservation tops up a short class dir by sampling
    the base model before training (reference
    train_unziplora.py:1166-1227: `{index}-{sha1}.jpg` names, existing
    images count toward --num_class_images) and the generated images
    then feed the prior loss."""
    out = str(tmp_path / "stage1")
    cls_dir = tmp_path / "class_imgs"
    cls_dir.mkdir()
    # one pre-existing image: only the shortfall should be generated
    import numpy as np
    from PIL import Image
    Image.fromarray(
        np.zeros((16, 16, 3), np.uint8)).save(cls_dir / "existing.jpg")

    from video_style_transfer_tpu.cli.train_unziplora import main as train1
    train1(["--smoke", "--smoke_steps", "2", "--num_instance_frames", "1",
            "--instance_prompt", "p", "--content_forward_prompt", "c",
            "--style_forward_prompt", "s", "--output_dir", out,
            "--with_prior_preservation", "--class_data_dir", str(cls_dir),
            "--class_prompt", "a horse", "--prior_loss_weight", "0.5",
            "--num_class_images", "3", "--sample_batch_size", "2",
            "--prior_generation_steps", "2",
            "--checkpointing_steps", "100"])
    files = sorted(cls_dir.iterdir())
    assert len(files) == 3
    generated = [f for f in files if f.name != "existing.jpg"]
    assert len(generated) == 2
    for f in generated:
        # reference naming: {index}-{sha1}.jpg
        idx, digest = f.stem.split("-", 1)
        assert idx.isdigit() and len(digest) == 40
        assert f.stat().st_size > 0


def test_prior_preservation_flag_validation():
    """--with_prior_preservation without a class dir/prompt exits with an
    error (reference train_unziplora.py:840-848)."""
    import pytest as _pytest
    from video_style_transfer_tpu.cli.train_unziplora import main as train1
    base = ["--smoke", "--smoke_steps", "1", "--num_instance_frames", "1",
            "--instance_prompt", "p", "--content_forward_prompt", "c",
            "--style_forward_prompt", "s", "--with_prior_preservation"]
    with _pytest.raises(SystemExit):
        train1(base)
