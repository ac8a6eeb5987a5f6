"""Dense convolutional building blocks (the reference's "subnets").

Every class here mirrors one block family from the reference
Subnet_constructor.py, re-expressed channels-last on ``(B, T, H, W, C)``
videos (or ``(N, H, W, C)`` images for the 2-D blocks):

  =====================  ============================================
  reference              here
  =====================  ============================================
  DenseBlock             DenseBlock2D        (Subnet_constructor.py:8-34)
  DenseBlockVideoInput   D2D                 (:37-62)   [same math as D2DInput]
  D2DTInput              D2DT                (:98-133)
  D2DLTInput             D2DLT               (:134-170)
  ResD2DTInput           ResD2DT             (:171-207)
  D2DInput               D2D                 (:209-238)
  FeatureCalapseBlock    FeatureCollapse     (:280-324)
  FeatureCalapseBlock2D  FeatureCollapse2D   (:325-362)
  _SmallC / _Fast        FeatureCollapseSmallC / Fast (:363-439)
  HighOrderTNet          HighOrderTNet       (:441-511)
  HighOrderTNet1         HighOrderTNet1      (:572-614, the surviving def)
  D2DTEnhanceInput       D2DTEnhance         (:617-658)
  DenseBlock3D           DenseBlock3D        (:660-687)
  DenseBlock3DPartial    DenseBlock3DPartial (:688-715)
  subnet() factory       subnet()            (:719-788)
  =====================  ============================================

All five-conv chains share one pattern: 4 growing concat convs with
LeakyReLU(0.2) + a final projection conv; kernel flavors differ only for
conv1/conv5 ('s' = spatial (1,3,3), 't' = temporal (3,1,1), 'f' = full
(3,3,3)). Initialization follows the reference exactly:

  * INN blocks: conv1-4 xavier_normal x0.1 (biases 0), conv5 all-zero
    (module_util.py:27-44 + Subnet_constructor.py:17-24);
  * prior/surrogate blocks (INN_init=False): xavier_normal x1 on all five.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv import (
    conv2d,
    conv3d,
    kaiming_normal,
    leaky_relu,
    pointwise,
    spatial_conv_video,
    temporal_conv3,
    xavier_normal,
    zeros_init,
)
from ..ops.shuffle import depth_to_space_std, space_to_depth


def _w_init(mode: str, layer: str):
    """Weight initializer for ('inn_xavier'|'inn_kaiming'|'plain_xavier')."""
    if mode == "inn_xavier":
        return zeros_init if layer == "proj" else xavier_normal(0.1)
    if mode == "inn_kaiming":
        return zeros_init if layer == "proj" else kaiming_normal(0.1)
    if mode == "plain_xavier":
        return xavier_normal(1.0)
    raise ValueError(mode)


_KIND_SHAPES = {
    "s": lambda ci, co: (3, 3, ci, co),
    "f": lambda ci, co: (3, 3, 3, ci, co),
    "t": lambda ci, co: (3, ci, co),
    "p": lambda ci, co: (ci, co),
}


class _ConvP(nn.Module):
    """One conv parameter pair with a given kernel flavor.

    kind: 's' -> (3,3) spatial conv folded over T; 'f' -> (3,3,3) 3-D conv;
    't' -> (3,1,1) temporal conv lowered to shifted matmuls; 'p' -> 1x1.
    """

    c_in: int
    c_out: int
    kind: str = "s"
    w_init: object = None
    dilation: int = 1

    def setup(self):
        wi = self.w_init if self.w_init is not None else xavier_normal(1.0)
        self.w = self.param(
            "weight", wi, _KIND_SHAPES[self.kind](self.c_in, self.c_out)
        )
        self.b = self.param("bias", zeros_init, (self.c_out,))

    def weights(self):
        """Raw (w, b) — lets DenseChain route them into the fused kernel."""
        return self.w, self.b

    def __call__(self, x):
        # activations dictate the compute dtype: fp32 master params cast
        # down when the caller runs the net in bf16
        w, b = self.w.astype(x.dtype), self.b.astype(x.dtype)
        if self.kind == "s":
            if x.ndim == 5:
                return spatial_conv_video(x, w, b)
            return conv2d(x, w, b)
        if self.kind == "f":
            return conv3d(x, w, b)
        if self.kind == "t":
            if self.dilation == 1:
                from ..ops.pallas_kernels import pallas_enabled, temporal_conv3_pallas

                if pallas_enabled():
                    return temporal_conv3_pallas(x, w, b)
            return temporal_conv3(x, w, b, dilation=self.dilation)
        if self.kind == "p":
            return pointwise(x, w, b)
        raise ValueError(self.kind)


class DenseChain(nn.Module):
    """The shared 5-conv growing-dense chain."""

    c_in: int
    c_out: int
    gc: int = 32
    k1: str = "s"
    k5: str = "t"
    init_mode: str = "inn_xavier"
    is_res: bool = False
    early_3d: bool = False  # D2DLTInput's zero-init full-3D conv after conv1
    kmid: str = "s"  # conv2-4 flavor ('f' for DenseBlock3D)

    @nn.compact
    def __call__(self, x, ep=None):
        """ep: optional fused coupling epilogue ``(mode, clamp, a, m)``
        applied to the chain output (see ops.pallas_chain.ep_apply) — used
        by InvBlockExp to keep the coupling arithmetic inside the kernel.
        Only valid for non-residual chains."""
        grow = _w_init(self.init_mode, "grow")
        proj = _w_init(self.init_mode, "proj")
        cin, gc, km = self.c_in, self.gc, self.kmid
        convs = [
            _ConvP(cin + i * gc, gc, self.k1 if i == 0 else km, grow,
                   name=f"conv{i + 1}")
            for i in range(4)
        ]
        conv5 = _ConvP(cin + 4 * gc, self.c_out, self.k5, proj, name="conv5")
        if ep is not None and self.is_res:
            raise ValueError("ep epilogue requires is_res=False")

        if ep == "weights":
            # raw-weight collection: InvBlockExp routes an H/G pair of
            # chains into ONE fused kernel (ops.pallas_chain.fused_hg_pair)
            # — params are created here exactly as in the compute path
            ws, bs = zip(*(c.weights() for c in convs))
            w5, b5 = conv5.weights()
            return tuple(ws), tuple(bs), w5, b5

        if ep is not None and self._fused_v2_ok(x, conv5):
            from ..ops.pallas_chain import fused_dense_chain_t_ep

            ws, bs = zip(*(c.weights() for c in convs))
            w5, b5 = conv5.weights()
            mode, clamp, a, m = ep
            return fused_dense_chain_t_ep(
                x, tuple(ws), tuple(bs), w5, b5, mode, clamp, a, m
            )

        # v2 handles shapes the v1 spatial kernel cannot (arbitrary W via
        # in-kernel pad-column zeroing), so it gets its own chance here
        if self._fused_ok(x) or self._fused_v2_ok(x, conv5):
            x5 = self._fused(x, convs, conv5)
        else:
            x1 = leaky_relu(convs[0](x))
            if self.early_3d:
                x1 = x1 + _ConvP(gc, gc, "f", zeros_init,
                                 name="early_3d_layer")(x1)
            x2 = leaky_relu(convs[1](jnp.concatenate([x, x1], -1)))
            x3 = leaky_relu(convs[2](jnp.concatenate([x, x1, x2], -1)))
            x4 = leaky_relu(convs[3](jnp.concatenate([x, x1, x2, x3], -1)))
            x5 = conv5(jnp.concatenate([x, x1, x2, x3, x4], -1))
        if self.is_res:
            x5 = x5 + x
        if ep is not None:
            from ..ops.pallas_chain import ep_apply

            mode, clamp, a, m = ep
            x5 = ep_apply(x5, mode, clamp, a, m)
        return x5

    def _fused_ok(self, x) -> bool:
        from ..ops.pallas_chain import chain_fused_enabled, chain_shapes_ok

        return (
            self.k1 == "s"
            and self.kmid == "s"
            and self.gc == 32
            and not self.early_3d
            and x.ndim in (4, 5)
            and chain_fused_enabled()
            and chain_shapes_ok(x.shape[-3], x.shape[-2], x.shape[-1])
        )

    def _fused_v2_ok(self, x, conv5) -> bool:
        """Whole-chain v2 kernel: in-kernel temporal conv5 over a rotating
        3-slot VMEM buffer — the (x, x1..x4) concat never leaves HBM."""
        from ..ops.pallas_chain import chain_v2_enabled, chain_v2_shapes_ok

        return (
            self.k1 == "s"
            and self.kmid == "s"
            and self.k5 == "t"
            and conv5.dilation == 1
            # gc < 32 (codec STP gc=12) rides the kernel via zero-padded
            # growth segments (ops.pallas_chain.pad_gc_params)
            and self.gc <= 32
            and not self.early_3d
            and x.ndim == 5
            and chain_v2_enabled()
            and chain_v2_shapes_ok(
                x.shape[1], x.shape[2], x.shape[3], x.shape[4], self.c_out
            )
        )

    def _fused(self, x, convs, conv5):
        """Pallas-fused spatial chain + concat-free conv5 on (x, x1..x4)."""
        from ..ops.pallas_chain import fused_dense_chain_t, fused_dense_spatial

        if self._fused_v2_ok(x, conv5):
            ws, bs = zip(*(c.weights() for c in convs))
            w5, b5 = conv5.weights()
            return fused_dense_chain_t(x, tuple(ws), tuple(bs), w5, b5)

        squeeze = x.ndim == 4
        xv = x[:, None] if squeeze else x  # (N,H,W,C) -> (N,1,H,W,C)
        ws, bs = zip(*(c.weights() for c in convs))
        x1234 = fused_dense_spatial(xv, tuple(ws), tuple(bs))
        w5, b5 = conv5.weights()
        w5 = w5.astype(x.dtype)
        b5 = b5.astype(x.dtype)
        cin = self.c_in
        if self.k5 == "t":
            y = (temporal_conv3(xv, w5[:, :cin], None,
                                dilation=conv5.dilation)
                 + temporal_conv3(x1234, w5[:, cin:], b5,
                                  dilation=conv5.dilation))
        elif self.k5 == "s":
            y = (spatial_conv_video(xv, w5[:, :, :cin], None)
                 + spatial_conv_video(x1234, w5[:, :, cin:], b5))
        elif self.k5 == "p":
            y = pointwise(xv, w5[:cin], None) + pointwise(x1234, w5[cin:], b5)
        else:  # 'f'
            y = (conv3d(xv, w5[:, :, :, :cin], None)
                 + conv3d(x1234, w5[:, :, :, cin:], b5))
        return y[:, 0] if squeeze else y


# ---------------------------------------------------------------------------
# Named block families (thin configurations of DenseChain)
# ---------------------------------------------------------------------------


class DenseBlock2D(nn.Module):
    """2-D dense block on images (reference DenseBlock, :8-34)."""

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"
    is_res: bool = False

    @nn.compact
    def __call__(self, x):  # (N,H,W,C)
        return DenseChain(
            self.c_in, self.c_out, self.gc, "s", "s", self.init_mode, self.is_res,
            name="chain",
        )(x)


class D2DT(nn.Module):
    """2D-spatial + 1D-temporal dense block (reference D2DTInput, :98-133)."""

    SUPPORTS_EP = True  # InvBlockExp may pass a fused coupling epilogue

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"
    is_res: bool = False

    @nn.compact
    def __call__(self, x, ep=None):  # (B,T,H,W,C)
        return DenseChain(
            self.c_in, self.c_out, self.gc, "s", "t", self.init_mode, self.is_res,
            name="chain",
        )(x, ep=ep)


class ResD2DT(nn.Module):
    """D2DT with residual output (reference ResD2DTInput, :171-207)."""

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"

    @nn.compact
    def __call__(self, x):
        return DenseChain(
            self.c_in, self.c_out, self.gc, "s", "t", self.init_mode, True,
            name="chain",
        )(x)


class D2DLT(nn.Module):
    """D2DT + early zero-init full-3D conv (reference D2DLTInput, :134-170)."""

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"

    @nn.compact
    def __call__(self, x):
        return DenseChain(
            self.c_in, self.c_out, self.gc, "s", "t", self.init_mode,
            early_3d=True, name="chain",
        )(x)


class D2D(nn.Module):
    """All-spatial video dense block (reference D2DInput /
    DenseBlockVideoInput, :209-238 / :37-62)."""

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"
    is_res: bool = False

    @nn.compact
    def __call__(self, x):
        return DenseChain(
            self.c_in, self.c_out, self.gc, "s", "s", self.init_mode, self.is_res,
            name="chain",
        )(x)


class DenseBlock3D(nn.Module):
    """Full 3x3x3 dense block (reference DenseBlock3D, :660-687)."""

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"

    @nn.compact
    def __call__(self, x):
        return DenseChain(
            self.c_in, self.c_out, self.gc, "f", "f", self.init_mode,
            kmid="f", name="chain",
        )(x)


class DenseBlock3DPartial(nn.Module):
    """conv1/conv5 full-3D, middle spatial (reference :688-715)."""

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"

    @nn.compact
    def __call__(self, x):
        return DenseChain(
            self.c_in, self.c_out, self.gc, "f", "f", self.init_mode, name="chain"
        )(x)


class FeatureCollapse(nn.Module):
    """Space-to-depth -> 3D dense chain -> pixel-shuffle
    (reference FeatureCalapseBlock, :280-324).

    NB the downshuffle uses the custom (s_h,s_w,c) order and the upshuffle
    the standard PixelShuffle order, exactly like the reference.
    """

    c_in: int
    c_out: int
    scale: int = 4
    gc: int = 32
    init_mode: str = "inn_xavier"
    is_res: bool = False

    @nn.compact
    def __call__(self, x):  # (B,T,H,W,C)
        res = x
        s = self.scale
        y = space_to_depth(x, s) if s > 1 else x
        y = DenseChain(
            (s * s) * self.c_in, (s * s) * self.c_out, s * self.gc,
            "f", "f", self.init_mode, name="chain",
        )(y)
        y = depth_to_space_std(y, s) if s > 1 else y
        if self.is_res:
            y = y + res
        return y


class FeatureCollapse2D(nn.Module):
    """All-spatial collapse block (reference FeatureCalapseBlock2D, :325-362)."""

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"

    @nn.compact
    def __call__(self, x):
        s = 4
        y = space_to_depth(x, s)
        y = DenseChain(
            16 * self.c_in, 16 * self.c_out, s * self.gc, "s", "s", self.init_mode,
            name="chain",
        )(y)
        return depth_to_space_std(y, s)


class FeatureCollapseSmallC(nn.Module):
    """reference FeatureCalapseBlock_SmallC (:363-400): gc = 2*gc."""

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"

    @nn.compact
    def __call__(self, x):
        s = 4
        y = space_to_depth(x, s)
        y = DenseChain(
            16 * self.c_in, 16 * self.c_out, 2 * self.gc, "f", "f", self.init_mode,
            name="chain",
        )(y)
        return depth_to_space_std(y, s)


class FeatureCollapseFast(nn.Module):
    """reference FeatureCalapseBlock_Fast (:402-439): gc = 3*gc, temporal tail."""

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"

    @nn.compact
    def __call__(self, x):
        s = 4
        y = space_to_depth(x, s)
        y = DenseChain(
            16 * self.c_in, 16 * self.c_out, 3 * self.gc, "s", "t", self.init_mode,
            name="chain",
        )(y)
        return depth_to_space_std(y, s)


class D2DTEnhance(nn.Module):
    """Multi-dilation temporal tail (reference D2DTEnhanceInput, :617-658)."""

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"

    @nn.compact
    def __call__(self, x):
        grow = _w_init(self.init_mode, "grow")
        cin, gc = self.c_in, self.gc
        x1 = leaky_relu(_ConvP(cin, gc, "s", grow, name="conv1")(x))
        x2 = leaky_relu(
            _ConvP(cin + gc, gc, "s", grow, name="conv2")(jnp.concatenate([x, x1], -1))
        )
        x3 = leaky_relu(
            _ConvP(cin + 2 * gc, gc, "s", grow, name="conv3")(
                jnp.concatenate([x, x1, x2], -1)
            )
        )
        x4 = leaky_relu(
            _ConvP(cin + 3 * gc, gc, "s", grow, name="conv4")(
                jnp.concatenate([x, x1, x2, x3], -1)
            )
        )
        sp = jnp.concatenate([x, x1, x2, x3, x4], -1)
        cm = cin + 4 * gc
        x51 = leaky_relu(_ConvP(cm, self.c_out, "t", grow, 1, name="conv51")(sp))
        x52 = leaky_relu(_ConvP(cm, self.c_out, "t", grow, 2, name="conv52")(sp))
        x53 = leaky_relu(_ConvP(cm, self.c_out, "t", grow, 3, name="conv53")(sp))
        tf = jnp.concatenate([x51, x52, x53], -1)
        return _ConvP(3 * self.c_out, self.c_out, "p", zeros_init, name="conv6")(tf)


class HighOrderTNet(nn.Module):
    """3-level spatial U-Net with D2DT inner blocks (reference :441-511)."""

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"

    @nn.compact
    def __call__(self, x):  # (B,T,H,W,C)
        M = 16
        xav = xavier_normal(0.1)

        def down(cout, name):
            return nn.Conv(
                cout, (3, 3), strides=(2, 2), padding="SAME",
                kernel_init=xav, name=name,
            )

        B, T = x.shape[:2]

        def fold(z):
            return z.reshape(B * T, *z.shape[2:])

        def unfold(z):
            return z.reshape(B, T, *z.shape[1:])

        x1 = leaky_relu(_ConvP(self.c_in, M, "p", xav, name="head")(x))
        d1 = unfold(down(2 * M, "down1")(fold(x1)))
        d1t = D2DT(2 * M, 2 * M, 32, "inn_xavier", name="inner1_block")(d1)
        d2 = unfold(down(4 * M, "down2")(fold(d1t)))
        d2t = D2DT(4 * M, 4 * M, 32, "inn_xavier", name="inner2_block")(d2)
        d3 = unfold(down(8 * M, "down3")(fold(d2t)))
        d3t = D2DT(8 * M, 8 * M, 32, "inn_xavier", name="inner3_block")(d3)

        def up(z, cout, name):
            z = jnp.repeat(jnp.repeat(z, 2, axis=-3), 2, axis=-2)
            return leaky_relu(
                _ConvP(z.shape[-1], cout, "s", xav, name=name)(z)
            )

        u0 = up(d3t, 4 * M, "up0") + d2t
        u1 = up(u0, 2 * M, "up1") + d1t
        u2 = up(u1, M, "up2") + x1
        return _ConvP(M, self.c_out, "p", zeros_init, name="tail")(u2)


class HighOrderTNet1(nn.Module):
    """1-level variant (the surviving duplicate def, reference :572-614)."""

    c_in: int
    c_out: int
    gc: int = 32
    init_mode: str = "inn_xavier"

    @nn.compact
    def __call__(self, x):
        M = 16
        xav = xavier_normal(0.1)
        B, T = x.shape[:2]

        def fold(z):
            return z.reshape(B * T, *z.shape[2:])

        def unfold(z):
            return z.reshape(B, T, *z.shape[1:])

        x1 = leaky_relu(_ConvP(self.c_in, M, "p", xav, name="head")(x))
        d1 = unfold(
            nn.Conv(2 * M, (3, 3), strides=(2, 2), padding="SAME",
                    kernel_init=xav, name="down1")(fold(x1))
        )
        d1t = D2DT(2 * M, 2 * M, 64, "inn_xavier", name="inner1_block")(d1)
        z = jnp.repeat(jnp.repeat(d1t, 2, axis=-3), 2, axis=-2)
        u = leaky_relu(_ConvP(2 * M, M, "s", xav, name="up2")(z)) + x1
        return _ConvP(M, self.c_out, "p", zeros_init, name="tail")(u)


def subnet(net_structure: str, init_mode: str = "xavier"):
    """Constructor factory mirroring reference subnet() (:719-788).

    Returns ``ctor(c_in, c_out, gc=32, name=...) -> nn.Module``.
    """
    mode = "inn_xavier" if init_mode == "xavier" else "inn_kaiming"
    table = {
        "DBNet": lambda ci, co, gc, name: DenseBlock2D(ci, co, 32, mode, name=name),
        "DB3DNet": lambda ci, co, gc, name: DenseBlock3D(ci, co, 32, mode, name=name),
        "DB3DNet_P": lambda ci, co, gc, name: DenseBlock3DPartial(ci, co, 32, mode, name=name),
        "D2DTNet": lambda ci, co, gc, name: D2DT(ci, co, gc, mode, name=name),
        "ResD2DTInput": lambda ci, co, gc, name: ResD2DT(ci, co, gc, mode, name=name),
        "D2DNet": lambda ci, co, gc, name: D2D(ci, co, 32, mode, name=name),
        "D2DLTInput": lambda ci, co, gc, name: D2DLT(ci, co, 32, mode, name=name),
        "D2DTEnhanceInput": lambda ci, co, gc, name: D2DTEnhance(ci, co, 32, mode, name=name),
        "HighOrderTNet": lambda ci, co, gc, name: HighOrderTNet(ci, co, 32, mode, name=name),
        "FeatureCalapseBlock": lambda ci, co, gc, name: FeatureCollapse(ci, co, 4, 32, mode, name=name),
        "FeatureCalapseBlock_SmallC": lambda ci, co, gc, name: FeatureCollapseSmallC(ci, co, 32, mode, name=name),
        "FeatureCalapseBlock_Fast": lambda ci, co, gc, name: FeatureCollapseFast(ci, co, 32, mode, name=name),
    }
    if net_structure not in table:
        raise KeyError(f"unknown subnet type {net_structure!r}")

    def ctor(c_in, c_out, gc=32, name=None):
        return table[net_structure](c_in, c_out, gc, name)

    return ctor
