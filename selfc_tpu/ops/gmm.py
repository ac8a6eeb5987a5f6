"""Gaussian-mixture head math for the self-conditioned prior (STPNet).

The reference keeps TWO distinct parameterizations of the same conv output
and we reproduce both faithfully (they are not typo-corrected on purpose —
the trained networks depend on them):

* sample path (SelfC_GMM_arch_inv.py:383-394): from params reshaped to
  (b, hf, K, 3, t, h, w):  pi = softmax over the *hf* axis of [...,0],
  log_scale = clip([...,1], -7, 7), mean = [...,2];
  sample = sum_K pi * (mean + eps * exp(log_scale)).
* likelihood path (:396-411): pi = softmax over *K* of [...,0],
  mean = [...,1], log_var = clip([...,2], -7, 7);
  log_prob = logsumexp_K(log pi + Normal(mean, exp(log_var)).log_prob(x)).

The small Haar variant (SelfC_arch_inv.py:178-185) uses std=exp(0.5*logvar)
in the sample path — selected by ``half_logvar=True``.

Layout here: params (..., hf_dim, K, 3), channels split from the tail conv
whose channel index was ((f*K + k)*3 + j), identical to the torch reshape.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp


def split_params(raw, hf_dim: int, K: int):
    """(..., hf_dim*K*3) -> (..., hf_dim, K, 3)."""
    return raw.reshape(*raw.shape[:-1], hf_dim, K, 3)


def _fast_rng_enabled() -> bool:
    v = os.environ.get("SELFC_TPU_FAST_RNG", "auto")
    if v == "1":
        return True
    if v == "0":
        return False
    return jax.default_backend() != "cpu"


def _to_rbg(rng):
    """Re-key an arbitrary PRNG key as an 'rbg' key (XLA RngBitGenerator).

    Deterministic given the input key; only the *implementation* of the
    bit stream changes.
    """
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(rng)
    else:
        data = rng
    data = jnp.asarray(data, jnp.uint32).reshape(-1)
    reps = -(-4 // data.shape[0])
    data = jnp.tile(data, reps)[:4]
    return jax.random.wrap_key_data(data, impl="rbg")


def sample_normal(rng, shape, dtype):
    """N(0,1) draw for the reparameterized GMM sample.

    The flagship decode draws ~42M normals per clip; threefry burns VPU
    cycles generating them, while the 'rbg' impl rides the hardware
    RngBitGenerator. Noise is noise — the reference draws torch CUDA RNG
    here (SelfC_GMM_arch_inv.py:389) so there is no cross-stack stream to
    preserve. Auto-on off-CPU; SELFC_TPU_FAST_RNG=0/1 forces.
    """
    if _fast_rng_enabled():
        rng = _to_rbg(rng)
    return jax.random.normal(rng, shape, dtype)


def gmm_sample(params, rng, half_logvar: bool = False):
    """Reparameterized 'sample' used on the reverse pass.

    params: (..., hf, K, 3). Returns (..., hf).
    NB: pi is softmaxed over the hf axis (reference dim=1), and index 1 is
    the log-scale / index 2 the mean — exactly as in the reference.
    """
    pi = jax.nn.softmax(params[..., 0], axis=-2)  # over hf
    log_scale = jnp.clip(params[..., 1], -7.0, 7.0)
    mean = params[..., 2]
    std = jnp.exp(0.5 * log_scale) if half_logvar else jnp.exp(log_scale)
    eps = sample_normal(rng, mean.shape, mean.dtype)
    return jnp.sum(pi * (mean + eps * std), axis=-1)  # over K


def gmm_neg_log_likelihood(params, hf):
    """Mean negative log-likelihood of hf under the mixture.

    params: (..., hf, K, 3); hf: (..., hf). Matches the reference NLL
    parameterization (pi softmax over K; index 1 = mean, 2 = log-sigma).
    Reference returns the elementwise -log_prob vector then the caller
    .mean()s it (SelfC_model.py:154); we fold the mean in.
    """
    pi = jax.nn.softmax(params[..., 0], axis=-1)  # over K
    mean = params[..., 1]
    log_sigma = jnp.clip(params[..., 2], -7.0, 7.0)
    sigma = jnp.exp(log_sigma)
    x = hf[..., None]
    comp_logp = (
        -0.5 * ((x - mean) / sigma) ** 2
        - log_sigma
        - 0.5 * math.log(2.0 * math.pi)
    )
    logp = jax.scipy.special.logsumexp(jnp.log(pi + 1e-38) + comp_logp, axis=-1)
    return -jnp.mean(logp)
