"""Data layer tests: video decode, frame extraction, tokenizer parity vs
transformers.CLIPTokenizer on a synthetic vocab, mp4 writer."""
import json
import os

import numpy as np
import pytest

from video_style_transfer_tpu.data.tokenizer import CLIPTokenizer
from video_style_transfer_tpu.data.video import (
    VideoClipDataset, extract_frames, list_videos)
from video_style_transfer_tpu.data.video_io import save_video

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    """Synthesize two tiny mp4s (frame index encoded in pixel value)."""
    root = tmp_path_factory.mktemp("videos")
    for name, n_frames in [("a.mp4", 12), ("b.mp4", 6)]:
        path = str(root / name)
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8,
                            (32, 32))
        for i in range(n_frames):
            frame = np.full((32, 32, 3), i * 10, np.uint8)
            w.write(frame)
        w.release()
    return str(root)


def test_list_and_index(video_dir):
    vids = list_videos(video_dir)
    assert len(vids) == 2
    ds = VideoClipDataset(video_dir, num_frames=4, resolution=16)
    # a: 12-4+1=9 starts, b: 6-4+1=3 starts
    assert len(ds) == 12


def test_clip_loading_consecutive(video_dir):
    ds = VideoClipDataset(video_dir, num_frames=4, resolution=16)
    clip = ds[0]
    assert clip.shape == (4, 16, 16, 3)
    assert clip.min() >= -1.0 and clip.max() <= 1.0
    # frame brightness increases by ~10/127.5 per frame (codec-lossy)
    means = clip.mean(axis=(1, 2, 3))
    assert np.all(np.diff(means) > 0.02)


def test_short_video_pads(video_dir):
    ds = VideoClipDataset(video_dir, num_frames=8, resolution=16)
    # video b has 6 frames -> start 0 needs padding
    path_b = [i for i, (p, s) in enumerate(ds.index) if p.endswith("b.mp4")]
    clip = ds[path_b[0]]
    assert clip.shape == (8, 16, 16, 3)
    np.testing.assert_array_equal(clip[-1], clip[-2])  # repeated last


def test_sample_batch_deterministic(video_dir):
    ds = VideoClipDataset(video_dir, num_frames=2, resolution=16)
    b1 = ds.sample_batch(2, seed=42)
    b2 = ds.sample_batch(2, seed=42)
    np.testing.assert_array_equal(b1, b2)
    assert b1.shape == (2, 2, 16, 16, 3)


def test_extract_frames_even_spacing(video_dir):
    path = os.path.join(video_dir, "a.mp4")
    one = extract_frames(path, 1, resolution=16)
    assert one.shape == (1, 16, 16, 3)
    five = extract_frames(path, 5, resolution=16)
    assert five.shape == (5, 16, 16, 3)
    means = five.mean(axis=(1, 2, 3))
    assert np.all(np.diff(means) > 0)  # evenly spaced across the ramp


def test_save_video_roundtrip(tmp_path, video_dir):
    frames = [np.full((16, 16, 3), i * 20, np.uint8) for i in range(4)]
    out = save_video(frames, str(tmp_path / "out.mp4"), fps=4)
    assert os.path.exists(out)
    assert os.path.getsize(out) > 0


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

WORDS = ["a", "photo", "of", "cat", "dog", "in", "the", "style",
         "watercolor", "painting", "sks", "ohwx"]


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    """Build a small but real CLIP-style vocab: bytes + common merges."""
    root = tmp_path_factory.mktemp("tok")
    from video_style_transfer_tpu.data.tokenizer import bytes_to_unicode
    byte_syms = list(bytes_to_unicode().values())
    vocab = {}
    for s in byte_syms:
        vocab[s] = len(vocab)
    for s in byte_syms:
        vocab[s + "</w>"] = len(vocab)
    merges = []
    for w in WORDS:
        # build left-to-right merges for each word, ending with </w>
        if len(w) == 1:
            continue
        prefix = w[0]
        for ch in w[1:-1]:
            pair = (prefix, ch)
            if pair not in merges:
                merges.append(pair)
            prefix += ch
        pair = (prefix, w[-1] + "</w>")
        if pair not in merges:
            merges.append(pair)
        for i in range(2, len(w)):
            sub = w[:i]
            if sub not in vocab:
                vocab[sub] = len(vocab)
        if w + "</w>" not in vocab:
            vocab[w + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(root / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(root / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(f"{a} {b}" for a, b in merges))
    return str(root)


def test_tokenizer_matches_transformers(tok_dir):
    transformers = pytest.importorskip("transformers")
    hf = transformers.CLIPTokenizer(
        os.path.join(tok_dir, "vocab.json"),
        os.path.join(tok_dir, "merges.txt"))
    mine = CLIPTokenizer.from_dir(tok_dir)
    prompts = [
        "a photo of cat",
        "watercolor painting of sks dog, in the style of ohwx",
        "A PHOTO OF DOG!!",
        "cat... dog?? unknownword",
    ]
    for p in prompts:
        want = hf(p, padding="max_length", max_length=77,
                  truncation=True)["input_ids"]
        got = mine(p)[0].tolist()
        assert got == want, (p, got[:12], want[:12])


def test_tokenizer_pad_token_override(tok_dir):
    mine = CLIPTokenizer.from_dir(tok_dir, pad_token_id=0)
    ids = mine("cat")[0]
    assert ids[0] == mine.bos_token_id
    assert 0 in ids[3:]  # padded with 0 (tokenizer_2 behavior)


def test_extract_first_frames_consecutive(video_dir):
    from video_style_transfer_tpu.data.video import extract_first_frames
    path = os.path.join(video_dir, "a.mp4")
    clip = extract_first_frames(path, 4, 16)
    assert clip.shape == (4, 16, 16, 3)
    means = clip.mean(axis=(1, 2, 3))
    # strictly consecutive: uniform brightness increments
    diffs = np.diff(means)
    assert np.all(diffs > 0.02) and np.all(diffs < 0.12)


def test_tokenizer_decode_roundtrip(tok_dir):
    tok = CLIPTokenizer.from_dir(tok_dir)
    ids = tok("a photo of cat")[0]
    text = tok.decode([i for i in ids
                       if i not in (tok.bos_token_id, tok.pad_token_id,
                                    tok.eos_token_id)])
    assert text.strip() == "a photo of cat"


def test_native_bpe_matches_python(tok_dir):
    """The C++ BPE merge loop must match the Python implementation (and
    therefore transformers) token-for-token."""
    tok = CLIPTokenizer.from_dir(tok_dir)
    if tok._native is None:
        pytest.skip("native tokenizer unavailable")
    prompts = ["a photo of cat", "watercolor painting of sks dog",
               "DOG!! cat... unknownword q5x"]
    for p in prompts:
        native_ids = tok(p)[0].tolist()
        tok._native = None  # force python path
        py_ids = tok(p)[0].tolist()
        tok._init_native()
        assert native_ids == py_ids, p


def test_frame_ids_and_meta(video_dir):
    """frame_ids clamps the pad-repeat tail to the last real frame, and
    sample_batch_meta pairs each sampled clip with its ids."""
    ds = VideoClipDataset(video_dir, num_frames=8, resolution=16)
    # b.mp4 has 6 frames -> its single clip pads frames 6,7 to id 5
    bi = [k for k, (p, s) in enumerate(ds.index) if p.endswith("b.mp4")]
    assert len(bi) == 1
    vid_b = ds.videos.index([p for p in ds.videos if p.endswith("b.mp4")][0])
    ids = ds.frame_ids(bi[0])
    assert ids == [(vid_b, i) for i in [0, 1, 2, 3, 4, 5, 5, 5]]
    frames, metas = ds.sample_batch_meta(3, seed=7)
    assert frames.shape == (3, 8, 16, 16, 3)
    assert len(metas) == 3 and all(len(m) == 8 for m in metas)
    # meta must be consistent with a plain sample at the same seed
    frames2 = ds.sample_batch(3, seed=7)
    np.testing.assert_array_equal(frames, frames2)


def test_latent_moment_cache_matches_direct_encode(video_dir):
    """Cached latents equal the direct stochastic encode (same key, same
    draw shape), and cache hits skip the encoder."""
    import jax
    import jax.numpy as jnp
    from video_style_transfer_tpu.cli import common
    from video_style_transfer_tpu.config import VAEConfig
    from video_style_transfer_tpu.models.vae import init_vae

    vcfg = VAEConfig.tiny()
    vae = init_vae(jax.random.PRNGKey(0), vcfg)
    bundle = common.ModelBundle(
        unet=None, unet_cfg=None, vae=vae, vae_cfg=vcfg,
        clip_l=None, clip_l_cfg=None, clip_g=None, clip_g_cfg=None)

    ds = VideoClipDataset(video_dir, num_frames=4, resolution=16)
    frames, ids = ds.sample_batch_meta(2, seed=3)
    key = jax.random.PRNGKey(11)

    cache = common.LatentMomentCache(bundle)
    got = cache.latents(frames, ids, key)
    want = common.encode_latents(
        bundle, frames.reshape(-1, 16, 16, 3), key=key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # second call with the same clips: no new encoder invocations
    calls = []
    orig = cache._enc
    cache._enc = lambda p, x: (calls.append(1), orig(p, x))[1]
    got2 = cache.latents(frames, ids, jax.random.PRNGKey(12))
    assert calls == []
    assert got2.shape == got.shape
