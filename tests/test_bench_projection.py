"""Pins bench.py's v5e-8 projection model and analytic FLOPs so the
headline record's arithmetic is tamper-evident (the constants carry
measurement provenance in PERF.md round 5)."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import bench


def test_projection_formula():
    # denoise * slowdown / 8 + steps * per-call-ICI * F/16
    got = bench.project_v5e8_denoise(60.69, steps=30, frames=16)
    want = 60.69 * bench.SHARD_COMPUTE_SLOWDOWN / 8 + 30 * \
        bench.ICI_S_PER_UNET_CALL_16F
    np.testing.assert_allclose(got, want)
    # ICI bytes scale with the frame count
    f32 = bench.project_v5e8_denoise(60.69, steps=30, frames=32)
    np.testing.assert_allclose(
        f32 - 60.69 * bench.SHARD_COMPUTE_SLOWDOWN / 8,
        2 * 30 * bench.ICI_S_PER_UNET_CALL_16F)
    # the correction must never be more optimistic than the naive /8
    # MINUS the measured faster-per-row margin (sanity band)
    assert bench.SHARD_COMPUTE_SLOWDOWN >= 1.0


def test_analytic_pallas_flops_matches_round1_cost_analysis():
    """Round 1's full-graph compiled cost analysis (attention via XLA,
    so everything visible) read 112.6 TFLOP/step at the 16f video
    workload; the analytic Pallas model + the 24 TFLOP XLA-visible
    remainder must land within a few percent."""
    pallas = bench.pallas_flops_per_step(1024, rows=2 * 16, frames=16)
    total = pallas + 24e12  # measured XLA-visible flops/step (round 5)
    assert abs(total - 112.6e12) / 112.6e12 < 0.05, total / 1e12


def test_vae_attn_flops():
    # (res/8)^2 tokens, 512ch single head, 4*S^2*D per frame
    np.testing.assert_allclose(bench.vae_attn_flops(1024, 16),
                               16 * 4.0 * 16384 ** 2 * 512)
