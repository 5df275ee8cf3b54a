"""LR schedules (training/schedules.py) vs the transformers/diffusers
get_scheduler oracle the reference uses (train_unziplora.py:1894-1900)."""
import numpy as np
import pytest

from video_style_transfer_tpu.training.schedules import (NAMES,
                                                         make_lr_schedule)


@pytest.mark.parametrize("name", NAMES)
def test_matches_transformers_get_scheduler(name):
    torch = pytest.importorskip("torch")
    from transformers import optimization as hf_opt

    lr, warmup, total = 0.01, 10, 60
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    kw = {}
    if name == "cosine_with_restarts":
        kw["num_cycles"] = 3
    if name == "polynomial":
        kw["power"] = 2.0
    ref = hf_opt.get_scheduler(
        name, opt, num_warmup_steps=warmup, num_training_steps=total,
        scheduler_specific_kwargs=kw)
    ours = make_lr_schedule(name, lr, warmup=warmup, total_steps=total,
                            num_cycles=kw.get("num_cycles", 1),
                            power=kw.get("power", 1.0))

    for step in range(total + 5):
        want = ref.get_last_lr()[0]
        got = float(ours(step))
        assert abs(got - want) < 1e-6, (name, step, got, want)
        opt.step()
        ref.step()


def test_unknown_name_raises():
    with pytest.raises(ValueError):
        make_lr_schedule("nope", 1.0)
