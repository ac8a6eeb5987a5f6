"""Round-2 verdict items: nll_enabled exposure (lambda_cond_prob no longer
silently dead), MultiStepLR restart optimizer-state clearing, and the
deart-net (GroupedGlobalDeformAgg) checkpoint import path."""

import logging
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selfc_tpu.config import dict_to_nonedict


def _gmm_opt(nll_enabled=None, lambda_cond_prob=None, train_extra=None):
    train = {
        "lr_G": 1e-4, "beta1": 0.9, "beta2": 0.999,
        "lr_scheme": "MultiStepLR", "lr_steps": [], "lr_gamma": 0.5,
        "pixel_criterion_forw": "l2", "pixel_criterion_back": "l1",
        "lambda_fit_forw": 4.0, "lambda_rec_back": 1.0,
        "gradient_clipping": 10.0,
    }
    if lambda_cond_prob is not None:
        train["lambda_cond_prob"] = lambda_cond_prob
    if train_extra:
        train.update(train_extra)
    net = {
        "which_model_G": {"subnet_type": "D2DTNet"},
        "in_nc": 3, "out_nc": 3, "block_num": [1, 1], "scale": 4,
        "init": "xavier", "global_module": "nonlocal", "stp_blk_num": 2,
        "fh_loss": "gmm", "gmm_k": 2,
    }
    if nll_enabled is not None:
        net["nll_enabled"] = nll_enabled
    return dict_to_nonedict({
        "is_train": True, "model": "SelfC_GMM", "distortion": "sr_bd",
        "scale": 4,
        "datasets": {"train": {"video_len": 3, "GT_size": 32}},
        "network_G": net, "path": {}, "train": train,
    })


class TestNllEnabled:
    def test_loss_c_active_when_enabled(self):
        """network_G.nll_enabled: true makes roundtrip()['loss_c'] the real
        conditional NLL instead of the snapshot's hard zero (reference
        SelfC_GMM_arch_inv.py:466-468)."""
        from selfc_tpu.models import define_G

        x = jnp.asarray(
            np.random.default_rng(0).random((1, 3, 32, 32, 3)), jnp.float32
        )
        outs = {}
        for flag in (True, False):
            net = define_G(_gmm_opt(nll_enabled=flag, lambda_cond_prob=1.0))
            variables = net.init(
                {"params": jax.random.PRNGKey(0),
                 "sample": jax.random.PRNGKey(1)},
                x, method=net.roundtrip,
            )
            out = net.apply(variables, x, method=net.roundtrip,
                            rngs={"sample": jax.random.PRNGKey(2)})
            outs[flag] = float(out["loss_c"])
        assert outs[False] == 0.0
        assert outs[True] != 0.0 and np.isfinite(outs[True])

    def test_warns_when_lambda_set_but_disabled(self, caplog):
        from selfc_tpu.models import define_G

        with caplog.at_level(logging.WARNING, logger="base"):
            define_G(_gmm_opt(lambda_cond_prob=1.0))
        assert any("nll_enabled" in r.message for r in caplog.records)

    def test_no_warning_when_enabled(self, caplog):
        from selfc_tpu.models import define_G

        with caplog.at_level(logging.WARNING, logger="base"):
            define_G(_gmm_opt(nll_enabled=True, lambda_cond_prob=1.0))
        assert not any("nll_enabled" in r.message for r in caplog.records)


class TestClearState:
    @pytest.mark.parametrize("clear", [True, False])
    def test_adam_moments_reset_at_restart(self, clear):
        """train.clear_state resets optimizer state at restart milestones
        (reference lr_scheduler.py:21-29)."""
        from selfc_tpu.train.rescale_model import RescaleModel

        opt = _gmm_opt(train_extra={
            "restarts": [3], "restart_weights": [1], "clear_state": clear,
        })
        model = RescaleModel(opt)
        clip = np.random.default_rng(1).random((1, 3, 32, 32, 3)).astype(
            np.float32
        )
        model.feed_data({"GT": clip})
        for step in range(1, 4):  # steps 1, 2, 3 — restart fires at 3
            model.optimize_parameters(step)
        count = int(np.asarray(model.opt_state[-1].count))
        if clear:
            assert count == 1  # fresh state + the restart step's update
        else:
            assert count == 3


class TestLQGTVIDAug:
    def _make_vids(self, root, n_vids=2, n_frames=7, hw=48):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(0)
        names = []
        for v in range(n_vids):
            d = root / f"vid{v:03d}"
            d.mkdir(parents=True, exist_ok=True)
            base = rng.integers(0, 255, (hw, hw, 3), np.uint8)
            for i in range(1, n_frames + 1):
                cv2.imwrite(str(d / f"im{i}.png"), np.roll(base, i, axis=1))
            names.append(f"vid{v:03d}")
        (root / "list.txt").write_text("\n".join(names))

    def test_elastic_deform_changes_pixels(self):
        from selfc_tpu.data.datasets import _elastic_deform_np

        img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
        out = _elastic_deform_np(img, np.random.default_rng(1))
        assert out.shape == img.shape and out.dtype == img.dtype
        assert not np.allclose(out, img)

    def test_aug_dataset_registered_and_samples(self, tmp_path):
        from selfc_tpu.data.loader import create_dataset

        self._make_vids(tmp_path)
        ds = create_dataset(dict_to_nonedict({
            "mode": "LQGTVID_Aug", "phase": "train",
            "dataroot_GT": str(tmp_path),
            "dataroot_list": str(tmp_path / "list.txt"),
            "video_len": 5, "GT_size": 32, "use_flip": True,
            "use_rot": True, "use_elastic_deform": True,
            "use_multi_scale": True, "color": "RGB", "scale": 4,
        }))
        assert len(ds) == 2
        item = ds[0]
        assert item["GT"].shape == (5, 32, 32, 3)  # monotone 5 of first 7
        assert item["GT"].dtype == np.float32
        assert 0.0 <= item["GT"].min() and item["GT"].max() <= 1.0 + 1e-3

        # test phase returns every frame
        ds_test = create_dataset(dict_to_nonedict({
            "mode": "LQGTVID_Aug", "phase": "val",
            "dataroot_GT": str(tmp_path),
            "dataroot_list": str(tmp_path / "list.txt"),
            "video_len": 5, "GT_size": 32, "color": "RGB", "scale": 4,
        }))
        assert ds_test[0]["GT"].shape == (7, 48, 48, 3)


class TestProcessLoader:
    def test_matches_thread_loader_order_and_content(self, tmp_path):
        from selfc_tpu.data.loader import (
            DataLoader, ProcessDataLoader, create_dataset,
        )

        TestLQGTVIDAug._make_vids(TestLQGTVIDAug(), tmp_path, n_vids=4)
        ds_opt = dict_to_nonedict({
            "mode": "LQGTVID", "phase": "val",
            "dataroot_GT": str(tmp_path),
            "dataroot_list": str(tmp_path / "list.txt"),
            # video_len 7 -> deterministic first-7 selection (T=3/5 sample
            # random monotone indices, reference LQGTVID_dataset.py:188-214)
            "video_len": 7, "GT_size": 32, "color": "RGB", "scale": 4,
        })
        ds = create_dataset(ds_opt)
        want = list(DataLoader(ds, batch_size=2, num_workers=2))
        got = list(ProcessDataLoader(ds, batch_size=2, num_workers=2))
        assert len(got) == len(want) == 2
        for w, g in zip(want, got):
            np.testing.assert_array_equal(w["GT"], g["GT"])
            assert w["GT_path"] == g["GT_path"]

    def test_create_dataloader_selects_process_loader(self, tmp_path):
        from selfc_tpu.data.loader import ProcessDataLoader, create_dataloader

        TestLQGTVIDAug._make_vids(TestLQGTVIDAug(), tmp_path, n_vids=2)
        ds_opt = dict_to_nonedict({
            "mode": "LQGTVID", "phase": "train",
            "dataroot_GT": str(tmp_path),
            "dataroot_list": str(tmp_path / "list.txt"),
            "video_len": 3, "GT_size": 32, "color": "RGB", "scale": 4,
            "batch_size": 2, "n_workers": 1, "use_shuffle": True,
            "use_process_loader": True,
        })
        from selfc_tpu.data.loader import create_dataset

        loader = create_dataloader(create_dataset(ds_opt), ds_opt)
        assert isinstance(loader, ProcessDataLoader)
        batch = next(iter(loader))
        assert batch["GT"].shape == (2, 3, 32, 32, 3)
        loader.close()

    def test_workers_persist_across_epochs_and_early_exit(self, tmp_path):
        """persistent_workers semantics: one spawn serves many epochs; a
        mid-epoch break leaves no stale batches in the next epoch."""
        from selfc_tpu.data.loader import ProcessDataLoader, create_dataset

        TestLQGTVIDAug._make_vids(TestLQGTVIDAug(), tmp_path, n_vids=4)
        ds_opt = dict_to_nonedict({
            "mode": "LQGTVID", "phase": "val",
            "dataroot_GT": str(tmp_path),
            "dataroot_list": str(tmp_path / "list.txt"),
            "video_len": 7, "GT_size": 32, "color": "RGB", "scale": 4,
        })
        loader = ProcessDataLoader(create_dataset(ds_opt), batch_size=1,
                                   num_workers=2)
        try:
            first = list(loader)
            procs = loader._procs
            assert procs is not None and all(p.is_alive() for p in procs)

            # early exit mid-epoch (train.py's `break` at niter)
            it = iter(loader)
            next(it)
            it.close()

            # next full epoch: same workers, same deterministic content
            again = list(loader)
            assert loader._procs is procs  # no respawn
            assert len(again) == len(first) == 4
            for a, b in zip(first, again):
                np.testing.assert_array_equal(a["GT"], b["GT"])
        finally:
            loader.close()
        assert loader._procs is None


_DIST_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
sys.path.insert(0, os.environ["SELFC_REPO"])
from selfc_tpu.parallel.mesh import init_distributed

pi, pc = init_distributed()  # reads RANK/WORLD_SIZE/MASTER_ADDR/MASTER_PORT
assert pc == 2, pc
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = np.asarray(jax.devices())
assert devs.size == 2, devs  # one CPU device per process, globally visible
mesh = Mesh(devs, ("dp",))
world = np.arange(2 * 4, dtype=np.float32).reshape(2, 4)
local = world[pi : pi + 1]
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp")), local, global_shape=(2, 4)
)
total = jax.jit(jnp.sum)(arr)  # cross-process all-reduce
assert float(total) == float(world.sum()), float(total)
print("DIST_OK", pi, pc, flush=True)
"""


class TestMultiHostInit:
    def test_two_process_cpu_init_distributed(self, tmp_path):
        """init_distributed maps torch-launcher env (RANK/WORLD_SIZE/
        MASTER_*) onto jax.distributed.initialize; two CPU processes form
        one 2-device world and all-reduce across it (the reference's NCCL
        init_dist equivalent, train.py:19-27)."""
        import socket
        import subprocess
        import sys as _sys

        child = tmp_path / "dist_child.py"
        child.write_text(_DIST_CHILD)
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        procs = []
        for rank in range(2):
            env = dict(os.environ)
            env.update({
                "RANK": str(rank), "WORLD_SIZE": "2",
                "MASTER_ADDR": "127.0.0.1", "MASTER_PORT": str(port),
                "SELFC_REPO": repo, "JAX_PLATFORMS": "cpu",
                # a fresh XLA_FLAGS: the parent's virtual-8-device flag
                # would give each process 8 local devices
                "XLA_FLAGS": "",
                # drop the axon PJRT site hook: it initializes the backend
                # at interpreter start, before jax.distributed.initialize
                "PYTHONPATH": repo,
            })
            procs.append(subprocess.Popen(
                [_sys.executable, str(child)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            ))
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append(out)
        for rank, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"rank {rank} failed:\n{out}"
            assert f"DIST_OK {rank} 2" in out, out


class TestDeartImport:
    def test_deart_state_dict_round_trips(self):
        """A reference codec checkpoint with deart_net: true imports into
        our tree with every GroupedGlobalDeformAgg field mapped (reference
        SelfC_Codec_arch_inv.py:395-401, :134-185)."""
        torch = pytest.importorskip("torch")
        from conftest import install_reference_stubs

        install_reference_stubs()
        import global_var

        global_var.GlobalVar.set_Temporal_LEN(3)
        global_var.GlobalVar.set_Istrain(True)
        from models.modules.SelfC_Codec_arch_inv import SelfCInvNet as RefCodec

        from selfc_tpu.models.inv_nets import SelfCNetCodec
        from selfc_tpu.utils.torch_import import import_state_dict

        opt = {"global_module": "nonlocal", "stp_blk_num": 2, "fh_loss": "l2",
               "scale": 2, "gmm_k": 5, "stp_hidden_c": 8,
               "stp_denseblock_innerc": 4, "deart_net": True,
               "h265_q": 16, "h265_keyint": 12, "h265_all_default": False}
        all_opt = {"network_G": opt, "scale": 2, "train": None,
                   "datasets": {"train": {"video_len": 3}}}
        torch.manual_seed(3)
        tnet = RefCodec(opt, 3, 3, "D2DTNet", [1], 1, all_opt=all_opt).eval()
        imported = import_state_dict(tnet.state_dict(), "codec", (1,))

        jnet = SelfCNetCodec(block_num=(1,), stp_blk_num=2, stp_hidden_c=8,
                             stp_denseblock_innerc=4, deart_net=True)
        x = jnp.zeros((1, 3, 16, 16, 3))
        template = jnet.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            x, method=jnet.roundtrip,
        )["params"]

        # every imported deart leaf must exist in the template at the same
        # shape (no silent None-drop: unmapped deart keys now raise)
        t_flat = {
            "/".join(str(p.key) for p in path): leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(template)[0]
        }
        i_flat = {
            "/".join(str(p.key) for p in path): leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(imported)[0]
        }
        deart_keys = [k for k in i_flat if k.startswith("deart_")]
        assert any("deart_1/offset_w" in k for k in deart_keys)
        assert any("deart_1/realloc1_w" in k for k in deart_keys)
        assert any("deart_1/regular_w" in k for k in deart_keys)
        for k in deart_keys:
            assert k in t_flat, f"imported {k} missing from template"
            assert i_flat[k].shape == t_flat[k].shape, k
        # and the full imported tree covers the template's deart subtree
        for k in t_flat:
            if k.startswith("deart_"):
                assert k in i_flat, f"template {k} not imported"

        # forward runs with the imported deart params merged in
        merged = dict(template)
        for k in imported:
            merged[k] = imported[k]
        lr = jnp.asarray(
            np.random.default_rng(2).random((1, 3, 8, 8, 3)), jnp.float32
        )
        hr, _ = jnet.apply({"params": merged}, lr, method=jnet.decode,
                           rngs={"sample": jax.random.PRNGKey(4)})
        assert hr.shape == (1, 3, 16, 16, 3)
        assert np.isfinite(np.asarray(hr)).all()


class TestCodecSingleEncode:
    """VERDICT #5: the codec train step must run the encode forward ONCE.

    jit A runs the encode and hoists its VJP residuals out as arrays
    (closure_convert); the update jit consumes them instead of re-encoding.
    """

    def _model(self, tmp_path):
        import sys

        from selfc_tpu.train.codec_model import CodecModel

        sys.modules.pop("_tiny", None)
        from tests.test_codec import _tiny_codec_opt

        opt = _tiny_codec_opt(tmp_path, str(tmp_path))
        opt["train"]["h265_sug"] = False  # plain STE: grads comparable
        return CodecModel(opt)

    def test_split_grads_match_monolithic(self, tmp_path):
        """The residual-chained gradients equal a single value_and_grad
        over a loss that re-runs the encode (the round-1 formulation)."""
        m = self._model(tmp_path)
        rng = np.random.default_rng(0)
        hr = jnp.asarray(rng.random((1, 3, 32, 32, 3)), jnp.float32)
        fwd_jit, _ = m._split_for_shape(tuple(hr.shape))
        lf, lr_q, consts = fwd_jit(m.params, hr)
        codec_out = jnp.asarray(
            np.clip(np.asarray(lr_q) + rng.normal(0, 0.01, lr_q.shape), 0, 1),
            jnp.float32,
        )
        ref_l = m.degrade(hr)
        key = jax.random.fold_in(m._step_key, 1)
        q = jnp.float32(16)

        # split path: grads wrt (params, lf), chained through residuals
        (_, _), (g_p, g_lf) = jax.value_and_grad(
            m._loss, argnums=(0, 1), has_aux=True
        )(m.params, lf, hr, ref_l, codec_out, key, q)
        captured = {}

        from selfc_tpu.train.codec_model import flatten_vjp

        def capture(params, x):
            y, f_vjp = jax.vjp(m._encode_lf, params, x)
            consts_, treedef = flatten_vjp(f_vjp)
            captured["td"] = treedef
            return y, tuple(consts_)

        jax.eval_shape(capture, m.params,
                       jax.ShapeDtypeStruct(hr.shape, jnp.float32))
        vjp_fn = jax.tree_util.tree_unflatten(captured["td"], list(consts))
        g_enc, _ = vjp_fn(g_lf)
        g_split = jax.tree.map(jnp.add, g_p, g_enc)

        # monolithic path (round-1 style): encode inside the loss
        def mono_loss(params):
            lf_ = m._encode_lf(params, hr)
            return m._loss(params, lf_, hr, ref_l, codec_out, key, q)[0]

        g_mono = jax.grad(mono_loss)(m.params)
        flat_s, _ = jax.flatten_util.ravel_pytree(g_split)
        flat_m, _ = jax.flatten_util.ravel_pytree(g_mono)
        np.testing.assert_allclose(
            np.asarray(flat_s), np.asarray(flat_m), rtol=2e-4, atol=1e-6
        )

    def test_step_flops_exclude_second_encode(self, tmp_path):
        """cost_analysis: the update jit's FLOPs stay below the monolithic
        step's by at least half an encode-forward."""
        m = self._model(tmp_path)
        hr = jnp.zeros((1, 3, 32, 32, 3), jnp.float32)
        fwd_jit, step_jit = m._split_for_shape(tuple(hr.shape))
        lf, lr_q, consts = fwd_jit(m.params, hr)
        args = (m.params, m.opt_state, hr, lf, consts, jnp.zeros_like(lr_q),
                jnp.float32(1e-4), jnp.int32(1), jnp.float32(16))

        def flops(jitted, *a):
            c = jitted.lower(*a).compile().cost_analysis()
            c = c[0] if isinstance(c, list) else c
            return float(c["flops"])

        f_enc = flops(jax.jit(m._encode_lf), m.params, hr)
        f_step = flops(step_jit, *args)

        def mono(params, opt_state, hr, codec_out, lrv, it, q):
            lf_ = m._encode_lf(params, hr)
            cs = tuple(jnp.zeros_like(c) for c in consts)

            def enc_bwd(ct, *_):
                return jax.vjp(m._encode_lf, params, hr)[1](ct)

            return m._train_step(params, opt_state, hr, lf_, cs,
                                 codec_out, lrv, it, q, enc_bwd)

        f_mono = flops(
            jax.jit(mono), m.params, m.opt_state, hr,
            jnp.zeros_like(lr_q), jnp.float32(1e-4), jnp.int32(1),
            jnp.float32(16),
        )
        assert f_step <= f_mono - 0.5 * f_enc, (f_step, f_mono, f_enc)

    def test_reencode_fallback_matches_residual(self, tmp_path):
        """train.codec_split: reencode (the public-API fallback for a jax
        where VJP-residual transfer breaks) must produce the same updated
        params as the default residual step — the re-run encode is
        deterministic, so only the step structure differs."""
        import sys

        from selfc_tpu.train.codec_model import CodecModel

        sys.modules.pop("_tiny", None)
        from tests.test_codec import _tiny_codec_opt

        clip = np.random.default_rng(4).random((1, 3, 32, 32, 3)).astype(
            np.float32
        )
        outs = {}
        for mode in ("residual", "reencode"):
            opt = _tiny_codec_opt(tmp_path, str(tmp_path))
            opt["train"]["h265_sug"] = False
            opt["train"]["codec_split"] = mode
            m = CodecModel(opt)
            m.feed_data({"GT": clip})
            m.optimize_parameters(1)
            assert np.isfinite(m.get_current_log()["loss"])
            outs[mode] = np.asarray(
                jax.flatten_util.ravel_pytree(m.params)[0]
            )
        np.testing.assert_allclose(
            outs["residual"], outs["reencode"], rtol=2e-4, atol=1e-6
        )

    def test_dynamic_q_stream_survives_resume(self, tmp_path):
        """The dynamic-q draw is a pure function of (seed, step): a model
        constructed fresh (= a resumed run) replays the identical q
        sequence; the global `random` module state is irrelevant."""
        import random as _random
        import sys

        from selfc_tpu.train.codec_model import CodecModel

        sys.modules.pop("_tiny", None)
        from tests.test_codec import _tiny_codec_opt

        def build():
            opt = _tiny_codec_opt(tmp_path, str(tmp_path))
            opt["network_G"]["h265_q"] = [8, 35]
            return CodecModel(opt)

        m1 = build()
        _random.seed(123)
        seq1 = [m1._draw_q(s) for s in range(50)]
        m2 = build()  # "resumed" process
        _random.seed(999)  # global RNG state must not matter
        seq2 = [m2._draw_q(s) for s in range(50)]
        assert seq1 == seq2
        assert all(8 <= v <= 35 for v in seq1)
        assert len(set(seq1)) > 5  # actually varies


class TestTorchExport:
    """export_state_dict is the exact inverse of import_state_dict, so
    weights trained here can drive the reference stack (parity protocol)."""

    def test_import_export_roundtrip(self):
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from conftest import install_reference_stubs

        install_reference_stubs()
        import global_var

        global_var.GlobalVar.set_Temporal_LEN(3)
        global_var.GlobalVar.set_Istrain(True)
        from models.modules.SelfC_GMM_arch_inv import SelfCInvNet

        from selfc_tpu.utils.torch_import import (
            export_state_dict,
            import_state_dict,
        )

        opt = {"global_module": "nonlocal", "stp_blk_num": 3,
               "fh_loss": "gmm", "scale": 4, "gmm_k": 2}
        tnet = SelfCInvNet(opt, 3, 3, "D2DTNet", [1, 1], 2).eval()
        sd = tnet.state_dict()
        params = import_state_dict(sd, "gmm", (1, 1))
        back = export_state_dict(params, sd, "gmm", (1, 1))
        assert set(back) == set(sd)
        for k, v in sd.items():
            np.testing.assert_array_equal(back[k], v.detach().numpy(), err_msg=k)


class TestRematRoundtrip:
    def test_remat_step_matches_plain(self):
        """network_G.remat (per-coupling-block rematerialization -- needed
        to fit the fp32 training backward in 16G HBM at the reference
        config) must leave gradients and the resulting step identical to
        the non-remat step."""
        from selfc_tpu.train.rescale_model import RescaleModel

        hr = jnp.asarray(
            np.random.default_rng(0).random((1, 3, 32, 32, 3)), jnp.float32
        )
        stepped = {}
        for remat in (False, True):
            opt = _gmm_opt()
            opt["network_G"]["remat"] = remat
            m = RescaleModel(opt)
            p, s, logs = m._train_step(
                m.params, m.opt_state, hr,
                jnp.float32(1e-4), jnp.int32(0),
            )
            stepped[remat] = (p, m._unpack_logs(logs)["loss"])
        assert np.isfinite(stepped[True][1])
        assert abs(stepped[True][1] - stepped[False][1]) < 1e-3
        for a, b in zip(jax.tree.leaves(stepped[True][0]),
                        jax.tree.leaves(stepped[False][0])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )


class TestVGG19Import:
    def test_feature_extractor_matches_torch_replica(self):
        """import_vgg19_features: a torchvision-layout vgg19 state_dict
        (replicated in plain torch, random weights) drives our
        VGGFeatureExtractor to the same layer-34 features the reference's
        torchvision-based extractor would produce
        (discriminator_vgg_arch.py:60-88)."""
        import pytest

        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        from selfc_tpu.models.discriminator import VGGFeatureExtractor
        from selfc_tpu.utils.torch_import import import_vgg19_features

        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
        layers, c = [], 3
        for v in cfg:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(c, v, 3, padding=1))
                layers.append(tnn.ReLU(inplace=False))
                c = v
        torch.manual_seed(5)
        features = tnn.Sequential(*layers).eval()
        sd = {f"features.{i}.{k}": p.detach().numpy()
              for i, m in enumerate(features)
              if isinstance(m, tnn.Conv2d)
              for k, p in (("weight", m.weight), ("bias", m.bias))}

        params = import_vgg19_features(sd)
        assert len(params) == 16  # all conv5_4-and-earlier convs mapped

        rng = np.random.default_rng(0)
        x = rng.random((1, 32, 32, 3), np.float32)
        mean = np.asarray([0.485, 0.456, 0.406], np.float32)
        std = np.asarray([0.229, 0.224, 0.225], np.float32)
        xt = torch.from_numpy(
            ((x - mean) / std).transpose(0, 3, 1, 2)
        ).float()
        with torch.no_grad():
            # reference: features.children()[:35] -> output of the
            # layer-34 conv (conv5_4, pre-ReLU)
            want = tnn.Sequential(*layers[:35])(xt).numpy()

        net = VGGFeatureExtractor()
        out = net.apply({"params": params}, jnp.asarray(x))
        got = np.asarray(out).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestMixedPrecisionTrain:
    def test_bf16_step_trains_and_tracks_fp32(self):
        """train.mixed_precision: bf16 activations / fp32 master params.
        The step must run finite, update fp32 params, and land near the
        fp32 step's loss."""
        from selfc_tpu.train.rescale_model import RescaleModel

        hr = jnp.asarray(
            np.random.default_rng(0).random((1, 3, 32, 32, 3)), jnp.float32
        )
        losses = {}
        for mp in (False, True):
            opt = _gmm_opt(train_extra={"mixed_precision": mp})
            m = RescaleModel(opt)
            p0 = jax.device_get(m.params)
            p, s, logs = m._train_step(
                m.params, m.opt_state, hr, jnp.float32(1e-4), jnp.int32(0)
            )
            logs = m._unpack_logs(logs)
            assert jax.tree.leaves(p)[0].dtype == jnp.float32
            assert float(logs["skipped_nonfinite"]) == 0.0
            moved = max(
                float(np.max(np.abs(np.asarray(a) - b)))
                for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p0))
            )
            assert moved > 0.0
            losses[mp] = float(logs["loss"])
        assert np.isfinite(losses[True])
        assert abs(losses[True] - losses[False]) < 0.1 * abs(losses[False])


class TestMixedPrecisionDtypeHygiene:
    def test_roundtrip_stays_bf16(self):
        """A bf16 input must come back bf16: flax-free modules (GlobalAgg,
        STP tail pointwise) cast their fp32 masters down instead of letting
        einsum promotion silently upgrade the decode path to fp32."""
        from selfc_tpu.models.inv_nets import SelfCNetGMM

        net = SelfCNetGMM(block_num=(1, 1), stp_blk_num=2, gmm_k=2)
        x32 = jnp.asarray(
            np.random.default_rng(0).random((1, 2, 32, 32, 3)), jnp.float32
        )
        variables = net.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            x32, method=net.roundtrip,
        )
        out = net.apply(
            variables, x32.astype(jnp.bfloat16), method=net.roundtrip,
            rngs={"sample": jax.random.PRNGKey(2)},
        )
        assert out["hr"].dtype == jnp.bfloat16
        assert out["lr"].dtype == jnp.bfloat16

    def test_bf16_step_with_fused_kernels(self, monkeypatch):
        """Mixed-precision grad step THROUGH the fused Pallas chains:
        bf16 activations with fp32 master params must not trip the
        custom-VJP aval check (params/aux are cast before the custom_vjp —
        regression for the train-shape padded-W rollout)."""
        monkeypatch.setenv("SELFC_TPU_PALLAS", "1")
        from selfc_tpu.train.rescale_model import RescaleModel

        hr = jnp.asarray(
            np.random.default_rng(0).random((1, 2, 32, 32, 3)), jnp.float32
        )
        opt = _gmm_opt(train_extra={"mixed_precision": True})
        m = RescaleModel(opt)
        p, s, logs = m._train_step(
            m.params, m.opt_state, hr, jnp.float32(1e-4), jnp.int32(0)
        )
        logs = m._unpack_logs(logs)
        assert float(logs["skipped_nonfinite"]) == 0.0
        assert np.isfinite(float(logs["loss"]))


class TestSTPBackboneTailSplit:
    def test_call_equals_tail_of_backbone(self):
        """STPNet.__call__ == tail(backbone(.)) with identical param names
        (the split exists so the profiler can time the phases separately)."""
        from selfc_tpu.models.stp import STPNet

        net = STPNet(scale=4, stp_blk_num=3, fh_loss="gmm", gmm_k=2)
        lr = jnp.asarray(
            np.random.default_rng(1).random((1, 3, 8, 8, 3)), jnp.float32
        )
        params = net.init(jax.random.PRNGKey(0), lr)["params"]
        # legacy @nn.compact layout names must survive the setup() split
        assert "local_m1" in params and "tail_0" in params
        full = net.apply({"params": params}, lr)
        feats = net.apply({"params": params}, lr, method=net.backbone)
        tail = net.apply({"params": params}, feats, method=net.tail)
        np.testing.assert_allclose(np.asarray(full), np.asarray(tail),
                                   rtol=1e-6, atol=1e-6)


class TestFastRng:
    def test_rbg_path_samples_standard_normal(self, monkeypatch):
        """SELFC_TPU_FAST_RNG=1 swaps the eps stream to the rbg impl; the
        draw must stay deterministic-per-key and ~N(0,1)."""
        monkeypatch.setenv("SELFC_TPU_FAST_RNG", "1")
        from selfc_tpu.ops.gmm import sample_normal

        k = jax.random.PRNGKey(7)
        a = np.asarray(sample_normal(k, (200_000,), jnp.float32))
        b = np.asarray(sample_normal(k, (200_000,), jnp.float32))
        np.testing.assert_array_equal(a, b)
        assert abs(a.mean()) < 0.02 and abs(a.std() - 1.0) < 0.02
        monkeypatch.setenv("SELFC_TPU_FAST_RNG", "0")
        c = np.asarray(sample_normal(k, (200_000,), jnp.float32))
        assert not np.array_equal(a, c)  # different bit stream
        assert abs(c.mean()) < 0.02 and abs(c.std() - 1.0) < 0.02

    def test_gmm_sample_respects_flag(self, monkeypatch):
        from selfc_tpu.ops.gmm import gmm_sample, split_params

        raw = jnp.asarray(
            np.random.default_rng(0).random((2, 4, 4, 8 * 2 * 3)),
            jnp.float32,
        )
        p = split_params(raw, 8, 2)
        k = jax.random.PRNGKey(3)
        monkeypatch.setenv("SELFC_TPU_FAST_RNG", "1")
        fast = np.asarray(gmm_sample(p, k))
        monkeypatch.setenv("SELFC_TPU_FAST_RNG", "0")
        slow = np.asarray(gmm_sample(p, k))
        assert fast.shape == slow.shape == (2, 4, 4, 8)
        # same distribution family, different streams
        assert np.all(np.isfinite(fast)) and np.all(np.isfinite(slow))


class TestGopBatchEval:
    def test_batched_gops_match_sequential(self):
        """val.gop_batch folds independent GOPs into the batch axis of one
        encode/decode call; with the deterministic l2 prior the output
        must equal the sequential reference loop exactly (incl. the
        trailing partial GOP and the group-level padding)."""
        from selfc_tpu.train.rescale_model import RescaleModel

        gt = np.random.default_rng(5).random((1, 18, 32, 32, 3)).astype(
            np.float32
        )
        outs = {}
        for n_batch in (1, 2):
            opt = _gmm_opt()
            opt["network_G"]["fh_loss"] = "l2"
            opt["val"] = dict_to_nonedict({"gop_batch": n_batch})
            m = RescaleModel(opt)
            m.feed_data({"GT": gt})
            m.test(gop=7)
            outs[n_batch] = (m.fake_H, m.forw_L, m.forw_H)
        for a, b in zip(outs[1], outs[2]):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=2e-5)

    def test_batched_gops_match_sequential_gmm_stream(self):
        """With the STOCHASTIC gmm prior the batched path must reproduce
        the sequential sample stream exactly (not just statistically):
        the vmapped decode consumes one subkey per real GOP, split from
        self.rng in the same order as gop_batch=1 (round-2 ADVICE)."""
        from selfc_tpu.train.rescale_model import RescaleModel

        gt = np.random.default_rng(6).random((1, 18, 32, 32, 3)).astype(
            np.float32
        )
        outs = {}
        for n_batch in (1, 2):
            opt = _gmm_opt()
            opt["network_G"]["fh_loss"] = "gmm"
            opt["val"] = dict_to_nonedict({"gop_batch": n_batch})
            m = RescaleModel(opt)
            m.feed_data({"GT": gt})
            m.test(gop=7)
            outs[n_batch] = (m.fake_H, m.forw_L, m.sample_H)
        for a, b in zip(outs[1], outs[2]):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=1e-4)


class TestNolocalGlobalModule:
    def test_unrecognized_global_module_disables_aggs(self):
        """The reference's vimeo90/spmc30 test configs set
        `global_module: nolocal` — an unrecognized value its STPNet treats
        as 'construct no global modules' but then crashes on in forward
        (`if self.global_module:` is truthy for any string,
        SelfC_GMM_arch_inv.py:369-372). Here the mode must build and run
        with the aggregation modules cleanly disabled."""
        from selfc_tpu.models.factory import define_G

        opt = _gmm_opt()
        opt["network_G"]["global_module"] = "nolocal"
        net = define_G(opt)
        x = jnp.asarray(
            np.random.default_rng(0).random((1, 3, 16, 16, 3)), jnp.float32
        )
        var = net.init(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
            x, method=net.roundtrip,
        )
        flat = "/".join(
            "/".join(p) if isinstance(p, tuple) else str(p)
            for p in jax.tree_util.tree_flatten_with_path(var["params"])[0]
            for p in [tuple(getattr(k, "key", str(k)) for k in p[0])]
        )
        assert "global" not in flat.lower()
        out = net.apply(var, x, method=net.roundtrip,
                        rngs={"sample": jax.random.PRNGKey(2)})
        assert np.all(np.isfinite(np.asarray(out["hr"])))
