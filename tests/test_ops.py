"""Parity tests of the numerical ops against torch-CPU ground truth.

The reference (CUDA/torch) semantics are re-derived here in torch on CPU —
channel orderings, normalizations and window rules must match exactly or
checkpoint/behavior parity is lost.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from selfc_tpu.ops import conv as C  # noqa: E402
from selfc_tpu.ops import haar as H  # noqa: E402
from selfc_tpu.ops import resize as R  # noqa: E402
from selfc_tpu.ops import shuffle as S  # noqa: E402
from selfc_tpu.ops.quantize import quantize_ste  # noqa: E402

RNG = np.random.default_rng(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def nhwc(t_nchw):
    return t_nchw.permute(0, 2, 3, 1).numpy()


def rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


class TestShuffle:
    def test_space_to_depth_matches_reference_custom_unshuffle(self):
        x = rand(2, 8, 12, 3)
        got = np.asarray(S.space_to_depth(jnp.asarray(x), 4))
        # reference PixelUnshuffle (SelfC_GMM_arch_inv.py:46-60)
        t = nchw(x)
        N, Cc, Hh, Ww = t.shape
        r = (
            t.view(N, Cc, Hh // 4, 4, Ww // 4, 4)
            .permute(0, 3, 5, 1, 2, 4)
            .contiguous()
            .view(N, Cc * 16, Hh // 4, Ww // 4)
        )
        np.testing.assert_allclose(got, nhwc(r), rtol=0, atol=0)

    def test_depth_to_space_std_matches_torch_pixel_shuffle(self):
        x = rand(2, 4, 6, 48)
        got = np.asarray(S.depth_to_space_std(jnp.asarray(x), 4))
        ref = nhwc(TF.pixel_shuffle(nchw(x), 4))
        np.testing.assert_allclose(got, ref, rtol=0, atol=0)

    def test_space_to_depth_std_matches_torch_pixel_unshuffle(self):
        x = rand(2, 8, 12, 3)
        got = np.asarray(S.space_to_depth_std(jnp.asarray(x), 2))
        ref = nhwc(TF.pixel_unshuffle(nchw(x), 2))
        np.testing.assert_allclose(got, ref, rtol=0, atol=0)

    def test_custom_roundtrip_identity(self):
        x = jnp.asarray(rand(1, 8, 8, 5))
        y = S.depth_to_space(S.space_to_depth(x, 2), 2)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))


class TestResize:
    def test_area_down_matches_torch(self):
        x = rand(2, 8, 12, 3)
        got = np.asarray(R.area_down(jnp.asarray(x), 4))
        ref = nhwc(TF.interpolate(nchw(x), scale_factor=0.25, mode="area"))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_area_up_matches_torch(self):
        x = rand(2, 4, 3, 3)
        got = np.asarray(R.area_up(jnp.asarray(x), 4))
        ref = nhwc(TF.interpolate(nchw(x), scale_factor=4.0, mode="area"))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("hw", [(32, 32), (36, 44), (33, 35)])
    def test_adaptive_avg_pool_matches_torch(self, hw):
        x = rand(2, *hw, 3)
        got = np.asarray(R.adaptive_avg_pool2d(jnp.asarray(x), (32, 32)))
        ref = nhwc(TF.adaptive_avg_pool2d(nchw(x), (32, 32)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("scale", [2, 4])
    def test_gaussian_downsample_matches_reference(self, scale):
        # reference models/Guassian.py:7-52 re-derived in torch
        sigma = 0.4 * scale
        radius = min(int(4.0 * sigma + 0.5), 6)
        w = np.zeros(13)
        for i in range(-radius, radius + 1):
            w[6 + i] = np.exp(-0.5 * (i / sigma) ** 2)
        w /= w.sum()
        k2d = torch.from_numpy(np.outer(w, w).astype(np.float32))[None, None]

        x = rand(2, 64, 64, 3)
        t = nchw(x).reshape(-1, 1, 64, 64)
        pad = 6 + scale * 2
        t = TF.pad(t, [pad, pad, pad, pad], "reflect")
        ref = TF.conv2d(t, k2d, stride=scale)[:, :, 2:-2, 2:-2]
        ref = ref.reshape(2, 3, ref.shape[-2], ref.shape[-1])
        got = np.asarray(R.gaussian_downsample(jnp.asarray(x), scale))
        np.testing.assert_allclose(
            got, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
        )


class TestHaar:
    def _torch_haar(self, x_nchw, rev=False):
        Cin = x_nchw.shape[1] if not rev else x_nchw.shape[1] // 4
        w = torch.ones(4, 1, 2, 2)
        w[1, 0, 0, 1] = w[1, 0, 1, 1] = -1
        w[2, 0, 1, 0] = w[2, 0, 1, 1] = -1
        w[3, 0, 1, 0] = w[3, 0, 0, 1] = -1
        w = torch.cat([w] * Cin, 0)
        if not rev:
            out = TF.conv2d(x_nchw, w, stride=2, groups=Cin) / 4.0
            N, _, h, ww = out.shape
            out = out.reshape(N, Cin, 4, h, ww).transpose(1, 2).reshape(N, 4 * Cin, h, ww)
            return out
        N, C4, h, ww = x_nchw.shape
        out = x_nchw.reshape(N, 4, Cin, h, ww).transpose(1, 2).reshape(N, C4, h, ww)
        return TF.conv_transpose2d(out, w, stride=2, groups=Cin)

    def test_forward_matches_reference(self):
        x = rand(2, 8, 10, 3)
        got = np.asarray(H.haar_forward(jnp.asarray(x)))
        ref = nhwc(self._torch_haar(nchw(x)))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_inverse_matches_reference(self):
        y = rand(2, 4, 5, 12)
        got = np.asarray(H.haar_inverse(jnp.asarray(y)))
        ref = nhwc(self._torch_haar(nchw(y), rev=True))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_roundtrip_identity(self):
        x = jnp.asarray(rand(1, 16, 16, 3))
        np.testing.assert_allclose(
            np.asarray(H.haar_inverse(H.haar_forward(x))), np.asarray(x),
            rtol=1e-6, atol=1e-6,
        )


class TestConv:
    def test_temporal_conv3_matches_torch_conv3d(self):
        B, T, Hh, Ww, Ci, Co = 2, 5, 4, 6, 7, 3
        x = rand(B, T, Hh, Ww, Ci)
        w = rand(3, Ci, Co)
        b = rand(Co)
        got = np.asarray(C.temporal_conv3(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
        # torch: Conv3d weight (Co, Ci, 3, 1, 1), input (B, C, T, H, W)
        tw = torch.from_numpy(w).permute(2, 1, 0)[:, :, :, None, None]
        tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        ref = TF.conv3d(tx, tw, torch.from_numpy(b), padding=(1, 0, 0))
        ref = ref.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_temporal_conv3_dilated_matches_torch(self):
        B, T, Ci, Co, d = 1, 7, 4, 4, 2
        x = rand(B, T, 3, 3, Ci)
        w = rand(3, Ci, Co)
        got = np.asarray(C.temporal_conv3(jnp.asarray(x), jnp.asarray(w), dilation=d))
        tw = torch.from_numpy(w).permute(2, 1, 0)[:, :, :, None, None]
        tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        ref = TF.conv3d(tx, tw, padding=(d, 0, 0), dilation=(d, 1, 1))
        np.testing.assert_allclose(got, ref.permute(0, 2, 3, 4, 1).numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_spatial_conv_matches_torch(self):
        x = rand(2, 3, 8, 8, 5)
        w = rand(3, 3, 5, 4)
        b = rand(4)
        got = np.asarray(
            C.spatial_conv_video(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
        )
        tw = torch.from_numpy(w).permute(3, 2, 0, 1)
        tx = torch.from_numpy(x.reshape(6, 8, 8, 5)).permute(0, 3, 1, 2)
        ref = TF.conv2d(tx, tw, torch.from_numpy(b), padding=1)
        ref = ref.permute(0, 2, 3, 1).numpy().reshape(2, 3, 8, 8, 4)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestQuantize:
    def test_forward(self):
        x = jnp.asarray([[-0.1, 0.5, 0.2501, 1.7]])
        y = quantize_ste(x)
        # XLA may lower /255 to multiply-by-reciprocal: allow 1 ULP
        np.testing.assert_allclose(
            np.asarray(y),
            np.round(np.clip(np.asarray(x), 0, 1) * 255) / 255,
            atol=1e-6,
        )

    def test_straight_through_gradient(self):
        g = jax.grad(lambda x: jnp.sum(quantize_ste(x) ** 2))(jnp.asarray([0.4, 2.0]))
        # identity backward: d/dx sum(q(x)^2) -> 2*q(x)
        q = np.round(np.clip([0.4, 2.0], 0, 1) * 255) / 255
        np.testing.assert_allclose(np.asarray(g), 2 * q, rtol=1e-6)


class TestFreqFastPath:
    """The einsum/matmul freq formulation must match the original
    repeat/subtract/shuffle composition exactly (both k=2 codec and k=4
    rescaling, incl. the deliberate fwd/rev shuffle-order asymmetry)."""

    def test_forward_matches_reference_composition(self):
        import numpy as np
        import jax.numpy as jnp
        from selfc_tpu.ops.freq import freq_forward, _freq_forward_ref

        rng = np.random.default_rng(0)
        for k in (2, 4):
            x = jnp.asarray(rng.normal(0, 1, (2, 3, 16, 24, 3)), jnp.float32)
            np.testing.assert_allclose(
                np.asarray(freq_forward(x, k)),
                np.asarray(_freq_forward_ref(x, k)),
                atol=1e-5,
            )

    def test_inverse_matches_reference_composition(self):
        import numpy as np
        import jax.numpy as jnp
        from selfc_tpu.ops.freq import freq_inverse, _freq_inverse_ref

        rng = np.random.default_rng(1)
        for k in (2, 4):
            y = jnp.asarray(
                rng.normal(0, 1, (2, 3, 8, 12, 3 * (k * k + 1))), jnp.float32
            )
            np.testing.assert_allclose(
                np.asarray(freq_inverse(y, k)),
                np.asarray(_freq_inverse_ref(y, k)),
                atol=1e-5,
            )
