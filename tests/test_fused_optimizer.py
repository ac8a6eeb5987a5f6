"""train.fused_optimizer: flat-vector clip/Adam/guard must be numerically
equivalent to the per-leaf optax path, and tree-format .state files must
resume into the flat layout (the 400k run flips the flag mid-run)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selfc_tpu.config import dict_to_nonedict
from selfc_tpu.train.rescale_model import RescaleModel

SHAPE = (1, 3, 32, 32, 3)


def _opt(fused: bool):
    return dict_to_nonedict({
        "is_train": True, "model": "SelfC_GMM", "distortion": "sr_bd",
        "scale": 4,
        "datasets": {"train": {"video_len": SHAPE[1], "GT_size": SHAPE[2]}},
        "network_G": {
            "which_model_G": {"subnet_type": "D2DTNet"},
            "in_nc": 3, "out_nc": 3, "block_num": [1], "scale": 4,
            "init": "xavier", "global_module": "nonlocal", "stp_blk_num": 2,
            "fh_loss": "gmm", "gmm_k": 2,
        },
        "path": {},
        "train": {
            "fused_optimizer": fused,
            "lr_G": 1e-3, "beta1": 0.9, "beta2": 0.999,
            "lr_scheme": "MultiStepLR", "lr_steps": [], "lr_gamma": 0.5,
            "pixel_criterion_forw": "l2", "pixel_criterion_back": "l1",
            "lambda_fit_forw": 1.0, "lambda_rec_back": 1.0,
            "weight_decay_G": 1e-14, "gradient_clipping": 10.0,
        },
    })


def _run_steps(model, hr, n=3):
    p, s = model.params, model.opt_state
    for i in range(n):
        p, s, _ = jax.jit(model._train_step)(
            p, s, hr, jnp.float32(1e-3), jnp.int32(i)
        )
    return p, s


@pytest.fixture(scope="module")
def models():
    return RescaleModel(_opt(False)), RescaleModel(_opt(True))


def test_fused_matches_tree(models):
    m_tree, m_flat = models
    # identical init (same seed) — sanity-check before comparing steps
    l0t = jax.tree_util.tree_leaves(m_tree.params)
    l0f = jax.tree_util.tree_leaves(m_flat.params)
    for a, b in zip(l0t, l0f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    hr = jnp.asarray(np.random.default_rng(0).random(SHAPE), jnp.float32)
    pt, _ = _run_steps(m_tree, hr)
    pf, _ = _run_steps(m_flat, hr)
    flat_t = jax.tree_util.tree_leaves(pt)
    flat_f = jax.tree_util.tree_leaves(pf)
    assert len(flat_t) == len(flat_f)
    for a, b in zip(flat_t, flat_f):
        # only fp difference source: reassociated sum in the global norm
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-7
        )


def test_tree_state_resumes_into_flat(models, tmp_path):
    from selfc_tpu.train import checkpoint as ckpt

    m_tree, m_flat = models
    hr = jnp.asarray(np.random.default_rng(1).random(SHAPE), jnp.float32)
    p, s = _run_steps(m_tree, hr, n=2)
    state_path = ckpt.save_training_state(str(tmp_path), 0, 2, s)

    m_flat.resume_training(state_path)
    # converted moments: single flat vectors matching the live layout
    adam = [e for e in m_flat.opt_state if hasattr(e, "mu")][0]
    assert adam.mu.ndim == 1
    total = sum(
        int(np.prod(np.shape(leaf)))
        for leaf in jax.tree_util.tree_leaves(m_flat.params)
    )
    assert adam.mu.shape == (total,)
    assert int(adam.count) == 2
    # converted moments are numerically the raveled tree moments
    from jax.flatten_util import ravel_pytree

    adam_tree = [e for e in s if hasattr(e, "mu")][0]
    np.testing.assert_allclose(
        np.asarray(adam.mu), np.asarray(ravel_pytree(adam_tree.mu)[0]),
        rtol=0, atol=0,
    )
    # and the resumed state steps without error
    p2, s2, _ = jax.jit(m_flat._train_step)(
        m_flat.params, m_flat.opt_state, hr, jnp.float32(1e-3), jnp.int32(2)
    )
    assert all(
        bool(np.isfinite(np.asarray(leaf)).all())
        for leaf in jax.tree_util.tree_leaves(p2)
    )
