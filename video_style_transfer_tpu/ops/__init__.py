from video_style_transfer_tpu.ops.attention import sdpa  # noqa: F401
