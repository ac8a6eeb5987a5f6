"""Round-3 additions: the val.eval_dtype precision knob.

The reference eval runs fp32 throughout (SelfC_model.py:185-250) while the
PERF.md throughput headline benches bf16 — `val.eval_dtype: bfloat16`
makes that serving mode a first-class config choice. These tests pin the
contract: bf16 eval casts only INSIDE the jitted encode/decode (params
stay fp32 masters), outputs come back fp32 so STE quantization and the
HIGHEST-precision metrics are unaffected, and the result stays close to
the fp32 roundtrip (the measured delta on a trained checkpoint lives in
docs/PERF.md "Eval precision").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selfc_tpu.config import dict_to_nonedict

from test_round2 import _gmm_opt


class TestEvalDtype:
    def _run(self, eval_dtype, gt, fh_loss="l2"):
        from selfc_tpu.train.rescale_model import RescaleModel

        opt = _gmm_opt()
        opt["network_G"]["fh_loss"] = fh_loss
        opt["val"] = dict_to_nonedict({"eval_dtype": eval_dtype})
        m = RescaleModel(opt)
        m.feed_data({"GT": gt})
        m.test(gop=7)
        return m

    def test_bf16_eval_returns_fp32_close_to_fp32_eval(self):
        gt = np.random.default_rng(7).random((1, 7, 32, 32, 3)).astype(
            np.float32
        )
        m32 = self._run("float32", gt)
        mbf = self._run("bfloat16", gt)
        for name in ("fake_H", "forw_L"):
            a, b = getattr(m32, name), getattr(mbf, name)
            assert jnp.asarray(b).dtype == jnp.float32
            a, b = np.asarray(a), np.asarray(b)
            assert np.all(np.isfinite(b))
            # bf16 has ~3 significant decimal digits; through the 8-block
            # exp(-s) reverse chain of a RANDOM-INIT net (s far from the
            # trained near-identity regime) the pixel error envelope is
            # loose — pin it; the trained-ckpt dB delta is the real
            # acceptance number (PERF.md "Eval precision")
            assert np.abs(a - b).mean() < 0.03, name

    def test_params_stay_fp32_masters(self):
        from selfc_tpu.train.rescale_model import RescaleModel

        opt = _gmm_opt()
        opt["val"] = dict_to_nonedict({"eval_dtype": "bfloat16"})
        m = RescaleModel(opt)
        gt = np.random.default_rng(8).random((1, 3, 32, 32, 3)).astype(
            np.float32
        )
        m.feed_data({"GT": gt})
        m.test(gop=7)
        assert all(
            leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(m.params)
        )

    def test_invalid_eval_dtype_raises(self):
        gt = np.random.default_rng(9).random((1, 3, 32, 32, 3)).astype(
            np.float32
        )
        with pytest.raises(ValueError, match="eval_dtype"):
            self._run("float16", gt)


class _CountingDataset:
    """Tiny dataset that counts __getitem__ materializations (for the
    prefetch-bound test)."""

    def __init__(self, n):
        self.n = n
        import threading

        self._lock = threading.Lock()
        self.produced = 0

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        with self._lock:
            self.produced += 1
        return {"GT": np.full((4, 4, 3), float(i), np.float32)}


class TestLoaderPrefetchBound:
    """The 400k run was host-OOM-killed at 131 GB RSS ~90 min in: the
    thread loader submitted EVERY batch of the epoch to its pool up front
    and kept the futures list, so each consumed batch's result stayed
    referenced until epoch end (~22 GB live per 6k-iter epoch), and the
    per-epoch executor churn ratcheted glibc arenas. The fix bounds
    in-flight futures at 2*num_workers, drops each future as its batch is
    queued, and keeps ONE executor for the loader's lifetime."""

    def test_producer_never_races_ahead_unboundedly(self):
        import time

        from selfc_tpu.data.loader import DataLoader

        ds = _CountingDataset(256)
        nw, bs = 2, 4
        dl = DataLoader(ds, batch_size=bs, num_workers=nw)
        consumed = 0
        max_outstanding = 0
        for batch in dl:
            consumed += bs
            time.sleep(0.005)  # slow consumer: producer is much faster
            max_outstanding = max(max_outstanding, ds.produced - consumed)
        dl.close()
        assert consumed == 256
        # bound: in-flight futures (2*nw) + queue (2*nw) + running (nw)
        # + 1 yielded, in batches; anything near the epoch size means the
        # unbounded-futures bug is back
        assert max_outstanding <= (5 * nw + 2) * bs, max_outstanding

    def test_epochs_reuse_one_pool_and_order_is_deterministic(self):
        from selfc_tpu.data.loader import DataLoader

        ds = _CountingDataset(16)
        dl = DataLoader(ds, batch_size=4, num_workers=2)
        e1 = [b["GT"][0, 0, 0, 0] for b in dl]
        pool = dl._pool
        assert pool is not None
        e2 = [b["GT"][0, 0, 0, 0] for b in dl]
        assert dl._pool is pool  # no per-epoch executor churn
        assert e1 == e2 == [0.0, 4.0, 8.0, 12.0]
        dl.close()
        assert dl._pool is None

    def test_early_break_does_not_deadlock_next_epoch(self):
        from selfc_tpu.data.loader import DataLoader

        ds = _CountingDataset(64)
        dl = DataLoader(ds, batch_size=4, num_workers=2)
        for i, _ in enumerate(dl):
            if i == 1:
                break  # producer parked on a full queue must unblock
        out = [b["GT"][0, 0, 0, 0] for b in dl]
        assert out[:2] == [0.0, 4.0] and len(out) == 16
        dl.close()


class TestKernelPrecisionPolicy:
    def test_kernel_dots_ignore_global_highest_for_bf16(self):
        """test_rescaling.py pins jax_default_matmul_precision='highest'
        (reference-grade fp32 eval); in-kernel Pallas dots must not
        inherit that onto bf16 operands — Mosaic rejects
        contract_precision<fp32> on bf16 ('Bad lhs type' at the 576x704
        eval shape). bf16 dots pin DEFAULT; f32 dots inherit (None).
        Functional coverage: every mixed-precision chain oracle test runs
        under conftest's global 'highest' already."""
        from selfc_tpu.ops.pallas_chain import _mxu_precision

        assert (_mxu_precision(jnp.zeros((2, 2), jnp.bfloat16))
                is jax.lax.Precision.DEFAULT)
        assert _mxu_precision(jnp.zeros((2, 2), jnp.float32)) is None
