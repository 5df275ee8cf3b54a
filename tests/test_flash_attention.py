"""Flash-attention kernel equivalence vs the XLA reference path
(SURVEY.md §4 test plan item b). Runs in pallas interpreter mode on the
CPU test mesh; the same kernel compiles for TPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_style_transfer_tpu.ops.attention import sdpa_xla
from video_style_transfer_tpu.ops.flash_attention import flash_attention


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


@pytest.mark.parametrize("b,s,h,d", [
    (2, 128, 2, 64),     # block-aligned
    (1, 384, 3, 64),     # multiple kv blocks when block=128
    (2, 200, 2, 64),     # ragged seq -> kv tail masking
])
def test_matches_xla(b, s, h, d):
    q = _rand((b, s, h, d), 0)
    k = _rand((b, s, h, d), 1)
    v = _rand((b, s, h, d), 2)
    got = flash_attention(q, k, v, block_q=128, block_k=128)
    want = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_cross_attention_shapes():
    """kv shorter than q (77-token text cross-attn shape)."""
    q = _rand((2, 256, 2, 64), 3)
    k = _rand((2, 77, 2, 64), 4)
    v = _rand((2, 77, 2, 64), 5)
    got = flash_attention(q, k, v, block_q=128, block_k=128)
    want = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_bf16_io():
    q = _rand((1, 128, 2, 64), 6, jnp.bfloat16)
    k = _rand((1, 128, 2, 64), 7, jnp.bfloat16)
    v = _rand((1, 128, 2, 64), 8, jnp.bfloat16)
    got = flash_attention(q, k, v, block_q=128, block_k=128)
    want = sdpa_xla(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)


def test_gradients_match_xla():
    q = _rand((1, 128, 2, 64), 9)
    k = _rand((1, 128, 2, 64), 10)
    v = _rand((1, 128, 2, 64), 11)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128,
                                       block_k=128) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_gradients_ragged_and_crossattn():
    """Backward kernels with ragged kv tail and kv != q lengths."""
    q = _rand((1, 200, 2, 64), 12)
    k = _rand((1, 77, 2, 64), 13)
    v = _rand((1, 77, 2, 64), 14)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128,
                                       block_k=128) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert bool(jnp.all(jnp.isfinite(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_large_head_dim_vae_shape():
    """VAE mid-block attention shape: 1 head, d=512 (smaller blocks)."""
    q = _rand((1, 256, 1, 512), 20)
    k = _rand((1, 256, 1, 512), 21)
    v = _rand((1, 256, 1, 512), 22)
    got = flash_attention(q, k, v)
    want = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_numerical_stability_large_logits():
    """Logits ~ +-900: naive exp would overflow; online softmax must
    stay finite and match the (stable) XLA reference."""
    q = _rand((1, 128, 1, 64), 30) * 30.0
    k = _rand((1, 128, 1, 64), 31) * 30.0
    v = _rand((1, 128, 1, 64), 32)
    got = flash_attention(q, k, v, block_q=64, block_k=64)
    assert bool(jnp.all(jnp.isfinite(got)))
    want = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("sq,sk,bq,bk", [
    (64, 640, 128, 256),    # q smaller than block, ragged kv
    (300, 300, 128, 128),   # both ragged
    (129, 64, 64, 128),     # tiny kv, ragged q
])
def test_shape_fuzz(sq, sk, bq, bk):
    q = _rand((2, sq, 2, 64), sq)
    k = _rand((2, sk, 2, 64), sk + 1)
    v = _rand((2, sk, 2, 64), sk + 2)
    got = flash_attention(q, k, v, block_q=bq, block_k=bk)
    want = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


class TestShortKv:
    """sdpa_shortkv: the lane-native (B,S,H,K)-logits path that serves
    cross-attention (kv = 77 << one flash kv block)."""

    def test_matches_xla(self):
        from video_style_transfer_tpu.ops.attention import sdpa_shortkv
        q = _rand((2, 256, 4, 64), 40)
        k = _rand((2, 77, 4, 64), 41)
        v = _rand((2, 77, 4, 64), 42)
        got = sdpa_shortkv(q, k, v)
        want = sdpa_xla(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)

    def test_bf16_io_and_grads(self):
        from video_style_transfer_tpu.ops.attention import sdpa_shortkv
        q = _rand((1, 128, 2, 64), 43, jnp.bfloat16)
        k = _rand((1, 77, 2, 64), 44, jnp.bfloat16)
        v = _rand((1, 77, 2, 64), 45, jnp.bfloat16)
        out = sdpa_shortkv(q, k, v)
        assert out.dtype == jnp.bfloat16
        g = jax.grad(lambda q, k, v: jnp.sum(
            sdpa_shortkv(q, k, v).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(lambda q, k, v: jnp.sum(
            sdpa_xla(q, k, v).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, gx):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=5e-2, atol=5e-2)

    def test_auto_dispatch_routes_short_kv(self):
        """auto must pick shortkv for seq_k <= 128 regardless of seq_q,
        and never hand cross-attention to the flash kernel."""
        from video_style_transfer_tpu.ops import attention as A
        calls = []
        orig = A.sdpa_shortkv
        try:
            A.sdpa_shortkv = lambda q, k, v, **kw: (
                calls.append("shortkv") or orig(q, k, v, **kw))
            q = _rand((1, 2048, 2, 64), 46)
            k = _rand((1, 77, 2, 64), 47)
            v = _rand((1, 77, 2, 64), 48)
            out = A.sdpa(q, k, v, impl="auto")
            assert calls == ["shortkv"]
            assert out.shape == q.shape
        finally:
            A.sdpa_shortkv = orig


class TestFusedQkv:
    """flash_attention_qkv: the fused-projection entry that addresses the
    q/k/v segments of one (B, S, 3*H*D) matmul output in place (three
    BlockSpec lane-group index maps — no split copies on the serving
    path)."""

    def _qkv(self, b, s, h, d, dtype=jnp.float32):
        q = _rand((b, s, h * d), 60, dtype)
        k = _rand((b, s, h * d), 61, dtype)
        v = _rand((b, s, h * d), 62, dtype)
        return q, k, v, jnp.concatenate([q, k, v], axis=-1)

    @pytest.mark.parametrize("b,s,h,d", [
        (2, 256, 4, 64),    # pack=2 lane groups
        (1, 200, 4, 32),    # pack=4, ragged seq -> kv tail masking
        (1, 256, 1, 128),   # single unpacked head (VAE-attention form)
    ])
    def test_matches_separate_kernel_bitwise(self, b, s, h, d):
        from video_style_transfer_tpu.ops.flash_attention import (
            flash_attention_qkv)
        q, k, v, qkv = self._qkv(b, s, h, d)
        got = flash_attention_qkv(qkv, h, block_q=128, block_k=128)
        want = flash_attention(
            q.reshape(b, s, h, d), k.reshape(b, s, h, d),
            v.reshape(b, s, h, d), block_q=128,
            block_k=128).reshape(b, s, h * d)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_gradients_match_split_path(self):
        from video_style_transfer_tpu.ops.flash_attention import (
            flash_attention_qkv)
        b, s, h, d = 2, 256, 4, 64
        _, _, _, qkv = self._qkv(b, s, h, d, jnp.bfloat16)

        def loss_fused(qkv):
            return jnp.sum(flash_attention_qkv(
                qkv, h, block_q=128, block_k=128).astype(jnp.float32) ** 2)

        def loss_split(qkv):
            q, k, v = jnp.split(qkv, 3, axis=-1)
            o = flash_attention(
                q.reshape(b, s, h, d), k.reshape(b, s, h, d),
                v.reshape(b, s, h, d), block_q=128, block_k=128)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        gf = jax.grad(loss_fused)(qkv)
        gs = jax.grad(loss_split)(qkv)
        np.testing.assert_allclose(np.asarray(gf, np.float32),
                                   np.asarray(gs, np.float32),
                                   rtol=1e-3, atol=1e-3)

    def test_dispatch_split_fallback_matches(self):
        """sdpa_fused_qkv must produce flash-identical math on the
        split/XLA route (non-packable or off-TPU shapes)."""
        from video_style_transfer_tpu.ops.attention import sdpa_fused_qkv
        b, s, h, d = 2, 128, 2, 64
        q, k, v, qkv = self._qkv(b, s, h, d)
        got = sdpa_fused_qkv(qkv, h, impl="xla")
        want = sdpa_xla(q.reshape(b, s, h, d), k.reshape(b, s, h, d),
                        v.reshape(b, s, h, d)).reshape(b, s, h * d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)


class TestSinglePass:
    """The scratch-free single-kv-block kernel (_attn_kernel_packed_single)
    must be BITWISE identical to the general online-softmax kernel at
    nk == 1 — at one kv block the general kernel's correction factor is
    exactly 0 and both paths execute the same op sequence."""

    def _fwd(self, fn, *args, multipass: bool, **kw):
        import os
        old = os.environ.get("VST_FLASH_MULTIPASS")
        os.environ["VST_FLASH_MULTIPASS"] = "1" if multipass else "0"
        try:
            return fn(*args, **kw)
        finally:
            if old is None:
                del os.environ["VST_FLASH_MULTIPASS"]
            else:
                os.environ["VST_FLASH_MULTIPASS"] = old

    @pytest.mark.parametrize("b,s,h,d,dtype", [
        (2, 256, 2, 64, jnp.float32),
        (2, 256, 4, 64, jnp.bfloat16),   # serving dtype, packed heads
        (1, 200, 2, 64, jnp.float32),    # ragged q blocks (block_q=128)
    ])
    def test_single_pass_matches_general(self, b, s, h, d, dtype):
        from video_style_transfer_tpu.ops.flash_attention import (
            _flash_fwd_bs_hd)
        q = _rand((b, s, h * d), 50, dtype)
        k = _rand((b, s, h * d), 51, dtype)
        v = _rand((b, s, h * d), 52, dtype)
        kw = dict(num_heads=h, scale=0.125, block_q=128, block_k=s)
        o1, lse1 = self._fwd(_flash_fwd_bs_hd, q, k, v,
                             multipass=False, **kw)
        o2, lse2 = self._fwd(_flash_fwd_bs_hd, q, k, v,
                             multipass=True, **kw)
        assert np.array_equal(np.asarray(o1, np.float32),
                              np.asarray(o2, np.float32))
        assert np.array_equal(np.asarray(lse1), np.asarray(lse2))

    def test_single_pass_matches_general_fused_qkv(self):
        from video_style_transfer_tpu.ops.flash_attention import (
            _flash_fwd_qkv_packed)
        b, s, h, d = 2, 256, 2, 64
        qkv = _rand((b, s, 3 * h * d), 53, jnp.bfloat16)
        kw = dict(num_heads=h, scale=0.125, block_q=128, block_k=s)
        o1, lse1 = self._fwd(_flash_fwd_qkv_packed, qkv,
                             multipass=False, **kw)
        o2, lse2 = self._fwd(_flash_fwd_qkv_packed, qkv,
                             multipass=True, **kw)
        assert np.array_equal(np.asarray(o1, np.float32),
                              np.asarray(o2, np.float32))
        assert np.array_equal(np.asarray(lse1), np.asarray(lse2))

    def test_single_pass_vpu_rowsum_mode(self):
        """The VPU-rowsum A/B mode must agree with XLA on the
        single-pass path too."""
        import os
        from video_style_transfer_tpu.ops.flash_attention import (
            _flash_fwd_bs_hd)
        b, s, h, d = 1, 128, 2, 64
        q = _rand((b, s, h * d), 54)
        k = _rand((b, s, h * d), 55)
        v = _rand((b, s, h * d), 56)
        os.environ["VST_FLASH_VPU_ROWSUM"] = "1"
        try:
            got, _ = _flash_fwd_bs_hd(q, k, v, num_heads=h, scale=0.125,
                                      block_q=128, block_k=s)
        finally:
            del os.environ["VST_FLASH_VPU_ROWSUM"]
        want = sdpa_xla(q.reshape(b, s, h, d), k.reshape(b, s, h, d),
                        v.reshape(b, s, h, d),
                        scale=0.125).reshape(b, s, h * d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)


class TestFusedBwd:
    """The fused dq+dk+dv backward kernel (nk == 1) must be BITWISE
    identical to the split dq / dkv kernels: it uses the same
    _recompute_p_ds helper and accumulation order, recomputing p/ds once
    instead of twice."""

    def _grads(self, split: bool, b=2, sq=300, sk=256, d=64,
               dtype=jnp.bfloat16):
        import os
        from video_style_transfer_tpu.ops.flash_attention import (
            _flash_bwd_bhsd, _flash_fwd_bhsd)
        q = _rand((b, sq, d), 60, dtype)
        k = _rand((b, sk, d), 61, dtype)
        v = _rand((b, sk, d), 62, dtype)
        do = _rand((b, sq, d), 63, dtype)
        o, lse = _flash_fwd_bhsd(q, k, v, scale=0.125, block_q=128,
                                 block_k=sk)
        old = os.environ.get("VST_FLASH_SPLIT_BWD")
        os.environ["VST_FLASH_SPLIT_BWD"] = "1" if split else "0"
        try:
            return _flash_bwd_bhsd(q, k, v, do, o, lse, scale=0.125,
                                   block_q=128, block_k=sk)
        finally:
            if old is None:
                del os.environ["VST_FLASH_SPLIT_BWD"]
            else:
                os.environ["VST_FLASH_SPLIT_BWD"] = old

    def test_fused_matches_split_bitwise(self):
        # ragged q blocks (300 % 128 != 0) exercise the q-tail masking
        dq1, dk1, dv1 = self._grads(split=False)
        dq2, dk2, dv2 = self._grads(split=True)
        for a, b_ in ((dq1, dq2), (dk1, dk2), (dv1, dv2)):
            assert np.array_equal(np.asarray(a, np.float32),
                                  np.asarray(b_, np.float32))

    def test_gradients_still_match_xla(self):
        """End-to-end grad check through the public API at an nk == 1
        shape (the fused kernel's dispatch condition)."""
        q = _rand((1, 256, 2, 64), 64)
        k = _rand((1, 256, 2, 64), 65)
        v = _rand((1, 256, 2, 64), 66)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, block_q=128,
                                           block_k=256) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(sdpa_xla(q, k, v) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-4)
