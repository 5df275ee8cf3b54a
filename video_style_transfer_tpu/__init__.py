"""video_style_transfer_tpu — TPU-native UnZipLoRA + AnimateDiff-XL framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
`tanmud/video_style_transfer` (UnZipLoRA content/style LoRA separation on
SDXL + AnimateDiff temporal-LoRA video stylization), built TPU-first:

- pure functional params pytrees (no module mutation; the reference's
  ``set_forward_type`` walks become a static ``mode`` argument),
- NHWC layouts, bf16 MXU compute with fp32 LoRA branches,
- factored rank-space LoRA application instead of materialized d_in x d_out
  deltas (reference: unziplora_unet/unziplora_linear_layer.py:233-245),
- jit-scanned samplers, mesh-sharded frames/batch via jax.sharding.

Subpackages:
    models      SDXL UNet / VAE / CLIP / motion modules as init+apply fns
    lora        UnZipLoRA dual-branch + temporal LoRA math, masks, cone
    ops         attention + fused kernels (Pallas TPU with XLA fallback)
    schedulers  DDPM / EulerDiscrete / DPM-Solver++ as pure functions
    pipelines   image & video generation (lax.scan denoise loops)
    training    stage-1 (UnZipLoRA) and stage-2 (temporal LoRA) trainers
    parallel    device mesh + sharding rules
    data        image / video datasets (host-side decode)
    utils       HF checkpoint conversion, artifact interop, logging
"""

__version__ = "0.1.0"
