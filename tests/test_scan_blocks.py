"""scan_blocks=True (one lax.scan over stacked coupling params) must be
numerically identical to the per-block loop after param conversion."""

import numpy as np

import jax
import jax.numpy as jnp

from selfc_tpu.models.inv_nets import SelfCNetGMM
from selfc_tpu.utils.torch_import import stack_block_params


def test_scan_matches_loop():
    loop_net = SelfCNetGMM(block_num=(2, 2), stp_blk_num=2, gmm_k=2)
    scan_net = SelfCNetGMM(block_num=(2, 2), stp_blk_num=2, gmm_k=2,
                           scan_blocks=True)
    x = jnp.asarray(np.random.default_rng(0).random((1, 3, 32, 32, 3)),
                    jnp.float32)
    v = loop_net.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x, method=loop_net.roundtrip,
    )["params"]
    v_scan = stack_block_params(jax.device_get(v), 4)

    y_loop, _ = loop_net.apply({"params": v}, x, method=loop_net.encode)
    y_scan, _ = scan_net.apply({"params": v_scan}, x, method=scan_net.encode)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_loop),
                               rtol=1e-5, atol=1e-6)

    lr, hf = y_loop[..., :3], y_loop[..., 3:]
    back_loop, _ = loop_net.apply(
        {"params": v}, lr, hf, method=loop_net.decode_with_hf
    )
    back_scan, _ = scan_net.apply(
        {"params": v_scan}, lr, hf, method=scan_net.decode_with_hf
    )
    np.testing.assert_allclose(np.asarray(back_scan), np.asarray(back_loop),
                               rtol=1e-5, atol=1e-6)

    # structure sanity: scanned init produces the same stacked tree shape
    v_init = scan_net.init(
        {"params": jax.random.PRNGKey(2), "sample": jax.random.PRNGKey(3)},
        x, method=scan_net.roundtrip,
    )["params"]
    assert (
        jax.tree_util.tree_structure(v_init)
        == jax.tree_util.tree_structure(jax.tree.map(jnp.asarray, v_scan))
    )
