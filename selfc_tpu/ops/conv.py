"""Convolution primitives and torch-compatible initializers.

Everything here operates on channels-last tensors:
  * images:  ``(N, H, W, C)``
  * videos:  ``(B, T, H, W, C)`` — T is a static (trace-time) dimension.

The reference framework's building blocks are Conv2d / Conv3d in NCHW
(reference: Subnet_constructor.py). On TPU we keep NHWC so XLA tiles the
channel dim onto the 128-lane axis, and we lower the ``(3,1,1)`` temporal
convolutions to three shifted ``(Cin, Cout)`` matmuls which run on the MXU
instead of as a thin 3-D convolution.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Initializers (match torch.nn.init semantics so behaviour/scale parity holds;
# reference: models/modules/module_util.py:7-44)
# ---------------------------------------------------------------------------


def _fans(shape):
    """fan_in/fan_out for a conv kernel ``(*spatial, Cin, Cout)`` or a dense
    kernel ``(in, out)``."""
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    return fan_in, fan_out


def xavier_normal(scale: float = 1.0, gain: float = 1.0):
    """torch.nn.init.xavier_normal_ followed by ``weight *= scale``."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return scale * std * jax.random.normal(key, shape, dtype)

    return init


def kaiming_normal(scale: float = 1.0):
    """torch.nn.init.kaiming_normal_(a=0, mode='fan_in') * scale."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans(shape)
        std = math.sqrt(2.0 / fan_in)
        return scale * std * jax.random.normal(key, shape, dtype)

    return init


zeros_init = jax.nn.initializers.zeros


def torch_default_w(key, shape, dtype=jnp.float32):
    """torch default Conv/Linear weight init: kaiming_uniform(a=sqrt(5))
    == U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Used for reference modules that
    are never explicitly re-initialized (e.g. STPNet tail convs, GlobalAgg)."""
    fan_in, _ = _fans(shape)
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_b(fan_in: int):
    """torch default bias init U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# Functional convs
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("stride", "padding", "groups"))
def conv2d(x, w, b=None, stride=(1, 1), padding="SAME", groups=1):
    """2-D conv, x: (N,H,W,C), w: (kh,kw,Cin/groups,Cout)."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b
    return y


def conv3d(x, w, b=None, stride=(1, 1, 1), padding="SAME"):
    """3-D conv, x: (B,T,H,W,C), w: (kt,kh,kw,Cin,Cout)."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if b is not None:
        y = y + b
    return y


def conv3x3_shift(x, w, b=None):
    """Stride-1 SAME 3x3 conv on (..., H, W, C) as 9 shifted matmuls.

    On TPU this beats ``lax.conv`` for the small channel counts this
    framework lives in (C in 3..179): XLA lowers each tap to an MXU matmul
    with contraction C instead of a channel-padded direct convolution
    (measured ~1.5-1.9x at the coupling-subnet shapes, bf16). ``w`` is HWIO
    ``(3, 3, Cin, Cout)``.
    """
    H, W = x.shape[-3], x.shape[-2]
    pad = [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pad)
    y = 0.0 if b is None else b
    for dy in range(3):
        for dx in range(3):
            tap = lax.slice_in_dim(
                lax.slice_in_dim(xp, dy, dy + H, axis=-3), dx, dx + W, axis=-2
            )
            y = y + jnp.einsum("...c,co->...o", tap, w[dy, dx])
    return y


def spatial_conv_video(x, w, b=None, stride=(1, 1), padding="SAME"):
    """A Conv3d with kernel (1,kh,kw) applied to video (B,T,H,W,C).

    Equivalent to the reference's ``nn.Conv3d(c_in, c_out, (1,3,3),
    padding=(0,1,1))`` (Subnet_constructor.py:102-105). The stride-1 SAME
    3x3 case lowers to shifted matmuls (see conv3x3_shift); anything else
    folds T into the batch for a plain XLA 2-D conv.
    """
    if stride == (1, 1) and padding == "SAME" and w.shape[:2] == (3, 3):
        return conv3x3_shift(x, w, b)
    B, T, H, W, C = x.shape
    y = conv2d(x.reshape(B * T, H, W, C), w, b, stride=stride, padding=padding)
    return y.reshape(B, T, *y.shape[1:])


def temporal_conv3(x, w, b=None, dilation: int = 1):
    """A Conv3d with kernel (3,1,1) on (B,T,H,W,C), zero-padded along T.

    ``w`` has shape (3, Cin, Cout).  Lowered to three shifted matmuls that
    map straight onto the MXU instead of a thin 3-D convolution.
    Equivalent to the reference's ``nn.Conv3d(cin, cout, (3,1,1),
    padding=(d,0,0), dilation=(d,1,1))`` (Subnet_constructor.py:106,624-626).
    """
    d = dilation
    pad = [(0, 0), (d, d), (0, 0), (0, 0), (0, 0)]
    xp = jnp.pad(x, pad)
    T = x.shape[1]
    y = (
        jnp.einsum("bthwc,cd->bthwd", lax.dynamic_slice_in_dim(xp, 0, T, 1), w[0])
        + jnp.einsum("bthwc,cd->bthwd", lax.dynamic_slice_in_dim(xp, d, T, 1), w[1])
        + jnp.einsum("bthwc,cd->bthwd", lax.dynamic_slice_in_dim(xp, 2 * d, T, 1), w[2])
    )
    if b is not None:
        y = y + b
    return y


def pointwise(x, w, b=None):
    """1x1(x1) conv as a matmul on the last axis. w: (Cin, Cout)."""
    y = jnp.einsum("...c,cd->...d", x, w)
    if b is not None:
        y = y + b
    return y


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, negative_slope * x)
