"""Learned differentiable codec surrogate (correlation-augmented).

Reference: Quantization_h265_suggrogate_correlation1.py:10-156. The
surrogate net predicts the codec's reconstruction; training uses
  mimick = MSE(codec, sug) - lambda_corr * Pearson(codec, sug)
and the forward-value/backward-surrogate swap ``sug.data = codec_out``,
re-expressed functionally as  ``sug + stop_grad(codec - sug)``.

The real codec runs on the host inside the jitted loss via a zero-gradient
``pure_callback`` op (the reference's H265_xxx autograd.Function with no
backward, :10-59).
"""

from __future__ import annotations

import os
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import leaky_relu
from .h265 import encode_decode_clip, ffmpeg_available
from ..models.blocks import DenseBlock2D, FeatureCollapse


class SurrogateNet(nn.Module):
    """suggrogate_net stack (reference :91-104) on (B,T,h,w,4) video."""

    mid_c: int = 24

    @nn.compact
    def __call__(self, x):
        m = self.mid_c
        x = DenseBlock2D(4, m, init_mode="plain_xavier", name="net_0")(x)
        x = DenseBlock2D(m, m, init_mode="plain_xavier", is_res=True, name="net_1")(x)
        x = FeatureCollapse(m, m, 4, init_mode="inn_xavier", is_res=True, name="net_2")(x)
        x = FeatureCollapse(m, m, 4, init_mode="inn_xavier", is_res=True, name="net_3")(x)
        x = DenseBlock2D(m, m, init_mode="plain_xavier", is_res=True, name="net_4")(x)
        return DenseBlock2D(m, 3, init_mode="plain_xavier", name="net_5")(x)


class H265Surrogate(nn.Module):
    """Surrogate prediction given the quantized LR video and the codec q.

    dynamic_q=True adds the (t, q/30) token MLP indicator fusion
    (reference :105-135)."""

    dynamic_q: bool = False

    @nn.compact
    def __call__(self, lr, q_value):
        B, T, h, w, _ = lr.shape
        t_ind = jnp.linspace(0.0, 1.0, T)
        if not self.dynamic_q:
            ind = jnp.broadcast_to(t_ind[None, :, None, None, None], (B, T, h, w, 1))
        else:
            q_ind = jnp.full((T,), q_value / 30.0)
            tok = jnp.stack([t_ind, q_ind], axis=1)  # (T, 2)
            tok = nn.Dense(256, name="fuser_0")(tok)
            tok = nn.relu(tok)
            tok = nn.Dense(256, name="fuser_1")(tok)
            tok = nn.relu(tok)
            tok = nn.Dense(1, name="fuser_2")(tok)  # (T, 1)
            ind = jnp.broadcast_to(
                tok[None, :, None, None, :], (B, T, h, w, 1)
            )
        x = jnp.concatenate([lr, ind], axis=-1)
        return SurrogateNet(name="suggrogate_net")(x) + lr


class SurrogateNetPlain(nn.Module):
    """The plain variant's 10-block stack (reference
    Quantization_h265_suggrogate.py:84-97): Dense(3,m), Dense(m,m),
    6x FeatureCalapse(m,m), Dense(m,m), Dense(m,3) — INN_init=False
    everywhere, no residual connections, 3-channel input (no indicator)."""

    mid_c: int = 24

    @nn.compact
    def __call__(self, x):
        m = self.mid_c
        x = DenseBlock2D(3, m, init_mode="plain_xavier", name="net_0")(x)
        x = DenseBlock2D(m, m, init_mode="plain_xavier", name="net_1")(x)
        for i in range(6):
            x = FeatureCollapse(
                m, m, 4, init_mode="plain_xavier", name=f"net_{2 + i}"
            )(x)
        x = DenseBlock2D(m, m, init_mode="plain_xavier", name="net_8")(x)
        return DenseBlock2D(m, 3, init_mode="plain_xavier", name="net_9")(x)


class H265SurrogatePlain(nn.Module):
    """Plain (no-indicator) surrogate — reference
    Quantization_h265_suggrogate.py:8-103: fixed q only, no temporal/q
    indicator plane, no residual add, and the mimick loss is plain MSE with
    NO Pearson term and NO forward-value swap (the reference returns the raw
    surrogate output; contrast correlation1's ``sug_out.data = codec``).
    Select with ``network_G.h265_sug_variant: plain``. The q_value argument
    is accepted for API symmetry with H265Surrogate and ignored."""

    @nn.compact
    def __call__(self, lr, q_value=None):
        return SurrogateNetPlain(name="suggrogate_net")(lr)


def mimick_plain(sug, codec_out):
    """Plain-variant loss: MSE against the detached codec output; the
    forward value stays the surrogate prediction (no swap) — reference
    Quantization_h265_suggrogate.py:98-103."""
    mimick = jnp.mean((jax.lax.stop_gradient(codec_out) - sug) ** 2)
    return sug, mimick


def h265_host_roundtrip(lr: np.ndarray, q: int, keyint: int, scale_times: int,
                        h265_all_default: bool = False,
                        stand_in: str | None = None):
    """Host-side codec roundtrip: (B,T,h,w,3) float [0,1] ->
    (decoded, mean_bpp).

    Runs BETWEEN the jitted encode and loss steps — the axon TPU runtime
    does not support host callbacks inside jit (verified: axon_pjrt
    raises UNIMPLEMENTED for io_callback/pure_callback), so the training
    graph is split at the codec (same structure as the reference's blocking
    mid-forward ffmpeg call, Quantization_video_compression.py:9-91).
    Falls back to 8-bit quantization when ffmpeg is absent, and to the
    input itself if the codec returns short (reference
    SelfC_Codec_arch_inv.py:473-476). The measured bpp feeds the train-time
    rate logging (reference logs img_bpp, SelfC_Codec_model.py:174)."""
    lr = np.asarray(lr)
    B, T = lr.shape[:2]
    if stand_in is None:
        stand_in = os.environ.get("SELFC_TPU_STANDIN_CODEC", "zlib")

    def one(b):
        if ffmpeg_available():
            dec, bpp = encode_decode_clip(
                np.clip(lr[b], 0, 1), int(q), keyint, scale_times,
                h265_all_default,
            )
            if dec.shape[0] < T:
                dec = np.clip(lr[b], 0, 1)
        elif str(stand_in).lower() == "zlib":
            # measured-rate stand-in (codec/standin.py): train-time
            # img_bpp logging gets a real byte count, not a hard zero
            from .standin import zlib_encode_decode_clip

            dec, bpp = zlib_encode_decode_clip(
                np.clip(lr[b], 0, 1), int(q), keyint, scale_times,
                h265_all_default,
            )
        else:
            dec = (np.clip(lr[b], 0, 1) * 255.0).round() / 255.0
            bpp = 0.0
        return dec.astype(np.float32), bpp

    # Per-clip roundtrips are independent encoder subprocesses — run them
    # concurrently (threads just babysit pipes) so the host-codec span of
    # the split-at-codec train step shrinks ~min(B, workers)x. Results
    # come back in batch order; numbers are identical to the serial loop.
    # SELFC_TPU_CODEC_WORKERS=1 restores serial (e.g. for timing studies).
    workers = int(os.environ.get("SELFC_TPU_CODEC_WORKERS") or 0) or min(
        B, max(1, (os.cpu_count() or 8) - 2)
    )
    if B > 1 and workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(workers, B)) as ex:
            results = list(ex.map(one, range(B)))
    else:
        results = [one(b) for b in range(B)]
    outs = [r[0] for r in results]
    bpps = [r[1] for r in results]
    return np.stack(outs, axis=0), float(np.mean(bpps))


def mimick_and_swap(sug, codec_out, lambda_corr: float):
    """mimick loss + value swap (reference :141-156).

    Pearson correlation is computed per-element over the flattened frame
    axis (torch dim 0 of (B*T,C,H,W)) then meaned."""
    x = jax.lax.stop_gradient(codec_out)
    y = sug
    B, T = y.shape[:2]
    xf = x.reshape(B * T, *x.shape[2:])
    yf = y.reshape(B * T, *y.shape[2:])
    mimick = jnp.mean((xf - yf) ** 2)
    vx = xf - xf.mean(axis=0, keepdims=True)
    vy = yf - yf.mean(axis=0, keepdims=True)
    corr = jnp.sum(vx * vy, axis=0, keepdims=True) / (
        jnp.sqrt(jnp.sum(vx ** 2, axis=0, keepdims=True))
        * jnp.sqrt(jnp.sum(vy ** 2, axis=0, keepdims=True))
        + 1e-8
    )
    loss = mimick - lambda_corr * corr.mean()
    swapped = sug + jax.lax.stop_gradient(codec_out - sug)
    return swapped, loss
