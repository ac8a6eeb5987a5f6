"""Rescaling model wrapper — the reference SelfCModel API
(feed_data / optimize_parameters / test / get_current_visuals /
get_current_log / save / load / resume_training; SelfC_model.py:27-322)
re-built around jitted functional steps on a device mesh.

All host I/O is channels-last numpy ``(B, T, H, W, 3)``.
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import define_G
from ..ops.quantize import quantize_ste
from ..ops.resize import area_down, gaussian_downsample, imresize_matlab
from ..parallel.mesh import (
    auto_batch_sharding,
    dp_sharding,
    make_mesh,
    put_frames,
    replicated,
)
from . import checkpoint as ckpt
from .losses import reconstruction_loss
from .lr_schedule import cosine_restart, multistep_restart

logger = logging.getLogger("base")


def make_degrade(distortion: str, scale: int):
    if distortion == "pytorch_bicubic":
        return lambda x: area_down(x, scale)
    if distortion == "sr_bd":
        return lambda x: gaussian_downsample(x, scale)
    if distortion == "matlab":
        return lambda x: imresize_matlab(x, 1.0 / scale)
    raise ValueError(f"distortion {distortion!r}")


class RescaleModel:
    """Training/eval wrapper for SelfC_GMM / SelfC / IRN model types."""

    def __init__(self, opt, mesh=None, rng_seed: int = 0):
        import os as _os

        # val.sample_seed varies the sample-PRNG stream (the GMM prior
        # draws at eval; reference used CUDA-global noise) so eval noise
        # can be bounded by repeated runs. The SELFC_TPU_EVAL_SEED env var
        # is kept as a CLI-side override for sweeping without config edits.
        cfg_seed = (opt["val"] or {}).get("sample_seed") if opt["val"] else None
        if cfg_seed is not None:
            rng_seed = int(cfg_seed)
        rng_seed = int(_os.environ.get("SELFC_TPU_EVAL_SEED", rng_seed))
        self.opt = opt
        self.is_train = bool(opt["is_train"])
        self.train_opt = opt["train"] or {}
        self.scale = opt["scale"]
        self.net = define_G(opt)
        # mesh_sp > 1 shards image width across chips (XLA SPMD inserts the
        # conv halo exchanges); batch stays on dp.
        self.mesh = mesh if mesh is not None else make_mesh(sp=opt["mesh_sp"] or 1)
        self._spatial_axis = 3 if self.mesh.shape["sp"] > 1 else None
        self.degrade = make_degrade(opt["distortion"] or "sr_bd", self.scale)
        self._arch = {
            "SelfC_GMM": "gmm",
            "SelfC_GMM_Codec": "codec",
            "SelfC": "haar",
            "IRN": "irn",
        }.get(opt["model"], "gmm")

        self.rng = jax.random.PRNGKey(rng_seed)
        self.rng, self._step_key = jax.random.split(self.rng)
        self.params = self._init_params()
        self.log_dict = OrderedDict()
        self.start_iter = 0
        self.start_epoch = 0

        if self.is_train:
            self._build_optimizer()
        # train.gan_weight switches on the adversarial branch (netD + GAN /
        # perceptual losses; reference components loss.py:69-124,
        # discriminator_vgg_arch.py, networks.py:90-113)
        self.gan = None
        if self.is_train and self.train_opt["gan_weight"]:
            if getattr(self, "_fused_opt", False):
                raise ValueError(
                    "train.fused_optimizer is not supported with the GAN "
                    "branch (gan.train_step drives tx.update on the param "
                    "tree); unset one of the two"
                )
            from .gan import AdversarialBranch

            self.gan = AdversarialBranch(self)
        self.load()

        # jitted steps, specialized per input shape on first call
        self._jit_train_step = jax.jit(self._train_step, donate_argnums=(0, 1))
        if self.gan is not None:
            self._jit_gan_step = jax.jit(
                partial(self.gan.train_step, self),
                donate_argnums=(0, 1, 2, 3, 4),
            )
        self._jit_encode = jax.jit(self._encode)
        self._jit_decode = jax.jit(self._decode)
        # gop_batch > 1 eval: vmap over the GOP-group axis with one PRNG
        # key per group, so the sample stream equals the sequential path
        self._jit_decode_batched = jax.jit(
            jax.vmap(self._decode, in_axes=(None, 0, 0))
        )

    # ------------------------------------------------------------------
    def _init_params(self):
        t = self.opt["datasets"]["train"]["video_len"] if (
            self.opt["datasets"] and self.opt["datasets"]["train"]
        ) else 3
        gt = (
            self.opt["datasets"]["train"]["GT_size"]
            if (self.opt["datasets"] and self.opt["datasets"]["train"])
            else 16 * self.scale
        ) or 16 * self.scale
        x = jnp.zeros((1, t or 3, gt, gt, 3), jnp.float32)
        self.rng, k1, k2 = jax.random.split(self.rng, 3)
        variables = self.net.init(
            {"params": k1, "sample": k2}, x, method=self.net.roundtrip
        )
        params = variables["params"]
        return jax.device_put(params, replicated(self.mesh))

    def _build_optimizer(self):
        to = self.train_opt
        wd = to["weight_decay_G"] or 0.0
        clip = to["gradient_clipping"]
        chain = []
        if clip:
            chain.append(optax.clip_by_global_norm(clip))
        if wd:
            # torch Adam couples weight decay into the gradient
            chain.append(optax.add_decayed_weights(wd))
        chain.append(
            optax.scale_by_adam(b1=to["beta1"] or 0.9, b2=to["beta2"] or 0.999)
        )
        self.tx = optax.chain(*chain)
        # train.fused_optimizer: run clip / Adam / the non-finite guard on
        # ONE flattened fp32 parameter vector instead of per-leaf ops over
        # ~600 arrays. Identical math (clip's global norm and Adam are
        # elementwise/global either way, modulo fp reassociation of the
        # norm's sum); the win is launch count — per-leaf reduces, moment
        # updates and where-selects collapse into a handful of fused
        # kernels on a 3.4M-element vector. Tree-format .state files are
        # converted on resume (resume_training), so the flag can be
        # flipped mid-run.
        self._fused_opt = bool(self.train_opt["fused_optimizer"])
        if self._fused_opt:
            from jax.flatten_util import ravel_pytree

            flat, unravel = ravel_pytree(self.params)
            self._unravel = unravel
            self.opt_state = self.tx.init(flat)
        else:
            self.opt_state = self.tx.init(self.params)
        # reference MultiStepLR_Restart clears Adam moments at restart
        # milestones when train.clear_state is set (lr_scheduler.py:21-29)
        self._clear_state_steps = (
            tuple(int(r) for r in (to["restarts"] or []))
            if to["clear_state"] else ()
        )
        base_lr = to["lr_G"] or 1e-4
        if (to["lr_scheme"] or "MultiStepLR") == "MultiStepLR":
            self.lr_fn = multistep_restart(
                base_lr,
                to["lr_steps"] or [],
                to["lr_gamma"] or 0.5,
                to["restarts"],
                to["restart_weights"],
                to["warmup_iter"] or -1,
            )
        elif to["lr_scheme"] == "CosineAnnealingLR_Restart":
            self.lr_fn = cosine_restart(
                base_lr,
                to["T_period"],
                to["eta_min"] or 1e-7,
                to["restarts"],
                to["restart_weights"],
                to["warmup_iter"] or -1,
            )
        else:
            raise NotImplementedError(to["lr_scheme"])

    # ------------------------------------------------------------------
    # jitted bodies
    # ------------------------------------------------------------------
    def _pixel_losses(self, params, hr, ref_l, rng):
        to = self.train_opt
        # train.mixed_precision: bf16 activations / fp32 master params.
        # Parameters stay fp32 (Adam runs on fp32 grads); each conv casts
        # its weights down to the activation dtype, so feeding a bf16
        # batch makes every MXU op bf16. Losses accumulate in fp32; the
        # 255-level STE quantization always rounds in fp32 (ops/quantize).
        x_in = hr.astype(jnp.bfloat16) if to["mixed_precision"] else hr
        out = self.net.apply(
            {"params": params}, x_in, method=self.net.roundtrip,
            rngs={"sample": rng},
        )
        l_forw_fit = (to["lambda_fit_forw"] or 1.0) * reconstruction_loss(
            out["lr_pre_quant"].astype(jnp.float32), ref_l,
            to["pixel_criterion_forw"] or "l2"
        )
        l_back_rec = (to["lambda_rec_back"] or 1.0) * reconstruction_loss(
            out["hr"].astype(jnp.float32), hr,
            to["pixel_criterion_back"] or "l1"
        )
        loss_c = (to["lambda_cond_prob"] or 0.0) * out["loss_c"].astype(
            jnp.float32
        )
        # reference scales the total by 144*144*3 (SelfC_model.py:169)
        loss = (l_forw_fit + l_back_rec + loss_c) * 144 * 144 * 3
        logs = {
            "l_forw_fit": l_forw_fit,
            "l_back_rec": l_back_rec,
            "loss_c": loss_c,
            "loss": loss,
        }
        return loss, logs, out

    def _loss(self, params, hr, ref_l, rng):
        loss, logs, _ = self._pixel_losses(params, hr, ref_l, rng)
        return loss, logs

    def _train_step(self, params, opt_state, hr, lr_value, step):
        # derive the step RNG on device: no host-side key churn per step
        rng = jax.random.fold_in(self._step_key, step)
        fused = getattr(self, "_fused_opt", False)
        if fused:
            from jax.flatten_util import ravel_pytree
        if self._clear_state_steps:
            # clear optimizer state at LR-restart milestones
            # (reference lr_scheduler.py:21-29, train.clear_state)
            at_restart = jnp.isin(step, jnp.asarray(self._clear_state_steps))
            fresh = self.tx.init(
                ravel_pytree(params)[0] if fused else params
            )
            opt_state = jax.tree.map(
                lambda f, o: jnp.where(at_restart, f, o), fresh, opt_state
            )
        ref_l = jax.lax.stop_gradient(self.degrade(hr))
        (loss, logs), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, hr, ref_l, rng
        )
        # skip the update entirely on a non-finite loss (the reference has
        # no such guard; a blown-up coupling exp() would poison the run)
        ok = jnp.isfinite(loss)
        if fused:
            flat_g = ravel_pytree(grads)[0]
            flat_p = ravel_pytree(params)[0]
            updates, new_opt_state = self.tx.update(flat_g, opt_state, flat_p)
            params = self._unravel(
                jnp.where(ok, flat_p - lr_value * updates, flat_p)
            )
            opt_state = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state
            )
        else:
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            new_params = jax.tree.map(
                lambda p, u: p - lr_value * u, params, updates
            )
            params = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_params, params
            )
            opt_state = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o), new_opt_state, opt_state
            )
        logs = dict(logs)
        logs["skipped_nonfinite"] = (~ok).astype(jnp.float32)
        # pack the log scalars into ONE device vector: each separate
        # scalar readback costs a full tunnel roundtrip (~30 ms) at every
        # print_freq sync — one buffer makes it one roundtrip
        self._log_keys = tuple(sorted(logs))
        log_vec = jnp.stack(
            [logs[k].astype(jnp.float32) for k in self._log_keys]
        )
        return params, opt_state, log_vec

    def _eval_dtype(self):
        """val.eval_dtype: bfloat16 switches the EVAL roundtrip to bf16
        activations (the serving-throughput mode PERF.md benches — ~2.2x
        the fp32 fps). Params stay fp32 masters; casts happen inside the
        jitted fns; outputs return as fp32 so the STE quantization and the
        (HIGHEST-precision) metrics are unaffected. Default fp32 = the
        reference eval precision (SelfC_model.py:185-250)."""
        val_opt = self.opt["val"] if self.opt["val"] else {}
        name = str(val_opt.get("eval_dtype") or "float32").lower()
        if name in ("bf16", "bfloat16"):
            return jnp.bfloat16
        if name in ("f32", "fp32", "float32"):
            return None
        raise ValueError(f"val.eval_dtype {name!r}")

    def _encode(self, params, x):
        dt = self._eval_dtype()
        if dt is not None:
            params = jax.tree.map(lambda a: a.astype(dt), params)
            x = x.astype(dt)
        y, _ = self.net.apply({"params": params}, x, method=self.net.encode)
        return y.astype(jnp.float32)

    def _decode(self, params, lr, rng):
        dt = self._eval_dtype()
        if dt is not None:
            params = jax.tree.map(lambda a: a.astype(dt), params)
            lr = lr.astype(dt)
        hr, hf = self.net.apply(
            {"params": params}, lr, method=self.net.decode,
            rngs={"sample": rng},
        )
        if hf is None:  # IRN samples uniform HF and returns no latents
            hf = jnp.zeros_like(lr)
        return hr.astype(jnp.float32), hf.astype(jnp.float32)

    # ------------------------------------------------------------------
    # reference-compatible API
    # ------------------------------------------------------------------
    def feed_data(self, data):
        """data['GT']: numpy (B, T, H, W, 3) RGB in [0,1]; pads the clip to
        the configured video_len by repeating the last frame
        (reference SelfC_model.py:102-109)."""
        gt = np.asarray(data["GT"])  # float32 [0,1] or uint8 (packed loader)
        t_cfg = (
            self.opt["datasets"]["train"]["video_len"]
            if self.opt["datasets"] and self.opt["datasets"]["train"]
            else None
        )
        clip_length = gt.shape[1]
        if t_cfg and clip_length < t_cfg:
            pad = np.repeat(gt[:, -1:], t_cfg - clip_length, axis=1)
            gt = np.concatenate([gt, pad], axis=1)
        self.real_H = put_frames(
            gt, auto_batch_sharding(self.mesh, gt.shape[0], self._spatial_axis)
        )
        return clip_length

    def optimize_parameters(self, step: int):
        lr_value = self.lr_fn(step)
        if self.gan is not None:
            g = self.gan
            (self.params, self.opt_state, g.d_params, g.d_stats,
             g.d_opt_state, logs) = self._jit_gan_step(
                self.params, self.opt_state, g.d_params, g.d_stats,
                g.d_opt_state, g.f_params, self.real_H,
                jnp.asarray(lr_value, jnp.float32),
                jnp.asarray(g.lr_d_fn(step), jnp.float32),
                jnp.asarray(step, jnp.int32),
            )
            self._raw_logs = logs
            self._raw_logs_lr = lr_value
            return
        self.params, self.opt_state, logs = self._jit_train_step(
            self.params, self.opt_state, self.real_H,
            jnp.asarray(lr_value, jnp.float32), jnp.asarray(step, jnp.int32),
        )
        # keep logs on device; get_current_log() syncs only when printing
        self._raw_logs = logs
        self._raw_logs_lr = lr_value

    def test(self, gop: int = 7):
        """GOP-chunked eval roundtrip (reference SelfC_model.test,
        :185-250): encode -> split -> quantize -> decode per 7-frame group,
        last group padded by repeating the final frame.

        ``val.gop_batch: N`` (opt-in, default 1 = reference behavior) folds
        N independent GOPs into the batch axis of ONE encode + ONE decode
        call — the GOPs are independent by construction (the reference
        processes them sequentially), so batching them is pure serving
        throughput: fewer dispatches (each costs ~30 ms on a tunneled
        chip) and better device occupancy. The trailing group is padded
        with repeats of its last GOP so every call compiles once.

        The batched decode is a vmap over the GOP-group axis with one
        PRNG subkey per real group, split from ``self.rng`` in the same
        order as the sequential path — so the GMM sample stream is
        IDENTICAL to gop_batch=1, not just statistically equivalent.
        Because of that equivalence the batching is AUTO-ENABLED for long
        clips (up to 4 GOPs per call) when val.gop_batch is unset; set
        ``val.gop_batch: 1`` to force the reference's sequential calls."""
        x = self.real_H
        B, T, H, W, _ = x.shape
        val_opt = self.opt["val"] if self.opt["val"] else {}
        n_groups = -(-T // gop)
        n_batch = val_opt.get("gop_batch")
        if n_batch is None:
            n_batch = max(1, min(4, n_groups))  # auto: deliver the win
        n_batch = int(n_batch)

        groups = []
        for start in range(0, T, gop):
            idx = list(range(start, min(start + gop, T)))
            orig = len(idx)
            idx += [T - 1] * (gop - orig)
            groups.append((np.asarray(idx), orig))

        fake_H, forw_L, forw_Hf, sample_H = [], [], [], []
        for i in range(0, len(groups), n_batch):
            grp = groups[i:i + n_batch]
            # pad the trailing call with repeats of the last GOP so every
            # call compiles once; padding lives only in pad_grp and is
            # never read back out
            pad_grp = grp + [grp[-1]] * (n_batch - len(grp))
            keys = []
            for _ in grp:  # same split order as the sequential path
                self.rng, k = jax.random.split(self.rng)
                keys.append(k)
            keys += [keys[-1]] * (n_batch - len(grp))
            if len(pad_grp) == 1:
                y = self._jit_encode(self.params, x[:, pad_grp[0][0]])
                lr = quantize_ste(y[..., :3])
                hr, hf = self._jit_decode(self.params, lr, keys[0])
                hr, lr = np.asarray(hr)[None], np.asarray(lr)[None]
                hfq, hfs = np.asarray(y[..., 3:])[None], np.asarray(hf)[None]
            else:
                # GOP groups stack on axis 0 — shard them over the mesh's
                # dp devices (collective-free eval parallelism; encode
                # outputs stay sharded through quantize into the vmapped
                # decode, whose group axis inherits the same placement)
                chunk = jax.device_put(
                    jnp.concatenate([x[:, g[0]] for g in pad_grp], axis=0),
                    dp_sharding(self.mesh, len(pad_grp) * B),
                )
                y = self._jit_encode(self.params, chunk)
                lr = quantize_ste(y[..., :3])
                grp_shape = (len(pad_grp), B) + lr.shape[1:]
                hr, hf = self._jit_decode_batched(
                    self.params,
                    jax.device_put(
                        lr.reshape(grp_shape),
                        dp_sharding(self.mesh, len(pad_grp)),
                    ),
                    jnp.stack(keys),
                )
                hr = np.asarray(hr)
                lr = np.asarray(lr).reshape(grp_shape)
                hfq = np.asarray(y[..., 3:]).reshape(
                    (len(pad_grp), B) + y.shape[1:-1] + (y.shape[-1] - 3,)
                )
                hfs = np.asarray(hf)
            for j, (_, orig) in enumerate(grp):
                fake_H.append(hr[j][:, :orig])
                forw_L.append(lr[j][:, :orig])
                forw_Hf.append(hfq[j][:, :orig])
                sample_H.append(hfs[j][:, :orig])
        self.fake_H = np.concatenate(fake_H, axis=1)
        self.forw_L = np.concatenate(forw_L, axis=1)
        self.forw_H = np.concatenate(forw_Hf, axis=1)
        self.sample_H = np.concatenate(sample_H, axis=1)

    def downscale(self, hr):
        y = self._jit_encode(self.params, jnp.asarray(hr))
        return np.asarray(quantize_ste(y[..., :3]))

    def upscale(self, lr):
        self.rng, k = jax.random.split(self.rng)
        hr, _ = self._jit_decode(self.params, jnp.asarray(lr), k)
        return np.asarray(hr)

    def _unpack_logs(self, log_vec) -> OrderedDict:
        """Packed log vector (one device buffer) -> {name: float}."""
        vals = np.asarray(log_vec)
        return OrderedDict(
            (k_, float(v)) for k_, v in zip(self._log_keys, vals)
        )

    def get_current_log(self):
        if getattr(self, "_raw_logs", None) is not None:
            raw = self._raw_logs
            if isinstance(raw, dict):  # GAN branch: per-key device scalars
                self.log_dict = OrderedDict(
                    (k_, float(v)) for k_, v in raw.items()
                )
            else:  # packed log vector: ONE device->host readback
                self.log_dict = self._unpack_logs(raw)
            self.log_dict["lr"] = float(self._raw_logs_lr)
            self._raw_logs = None
        return self.log_dict

    def get_current_visuals(self):
        out = OrderedDict()
        out["SR"] = self.fake_H
        out["LR"] = self.forw_L
        out["LR_ref"] = np.asarray(self.degrade(self.real_H))
        out["GT"] = np.asarray(self.real_H)
        out["forw_H"] = self.forw_H
        return out

    # ------------------------------------------------------------------
    def load(self):
        path = (self.opt["path"] or {}).get("pretrain_model_G")
        if path:
            logger.info("Loading model for G [%s] ...", path)
            block_num = tuple(self.opt["network_G"]["block_num"] or (4, 4))
            self.params = jax.device_put(
                ckpt.load_network(path, jax.device_get(self.params),
                                  self._arch, block_num),
                replicated(self.mesh),
            )
        d_path = (self.opt["path"] or {}).get("pretrain_model_D")
        if d_path and self.gan is not None:
            logger.info("Loading model for D [%s] ...", d_path)
            self.gan.d_params = jax.device_put(
                ckpt.load_network(d_path, jax.device_get(self.gan.d_params)),
                replicated(self.mesh),
            )

    def save(self, iter_label):
        path = ckpt.save_network(
            self.params, self.opt["path"]["models"], iter_label
        )
        if self.gan is not None:
            ckpt.save_network(
                self.gan.d_params, self.opt["path"]["models"], iter_label, "D"
            )
        return path

    def save_training_state(self, epoch, it):
        extra = None
        if self.gan is not None:
            extra = {
                "d_opt_state": jax.device_get(self.gan.d_opt_state),
                "d_stats": jax.device_get(self.gan.d_stats),
            }
        return ckpt.save_training_state(
            self.opt["path"]["training_state"], epoch, it, self.opt_state,
            extra=extra,
        )

    def _adapt_opt_state(self, loaded):
        """Convert a tree-format optax state (per-leaf Adam moments) to the
        flat-vector layout when train.fused_optimizer is on — so the 400k
        run's existing .state files resume across the flag flip. Moment
        trees share the params' tree structure, so ravel_pytree gives the
        identical element order as the live flat vector. No-op otherwise
        (and for already-flat states).

        Also handles the REVERSE flip (ADVICE r4): a flat-saved .state
        resumed with fused_optimizer OFF is unraveled back into the
        params' tree structure instead of crashing inside tx.update."""
        from jax.flatten_util import ravel_pytree

        fused = getattr(self, "_fused_opt", False)
        if not fused:
            _, unravel = ravel_pytree(self.params)

        def conv(elem):
            if fused:
                if hasattr(elem, "mu") and isinstance(elem.mu, dict):
                    return elem._replace(
                        mu=ravel_pytree(elem.mu)[0], nu=ravel_pytree(elem.nu)[0]
                    )
            elif (
                hasattr(elem, "mu")
                and not isinstance(elem.mu, dict)
                and getattr(elem.mu, "ndim", None) == 1
            ):
                return elem._replace(mu=unravel(elem.mu), nu=unravel(elem.nu))
            return elem
        return type(loaded)(conv(e) for e in loaded)

    def resume_training(self, state_path: str, restore_optimizer: bool = True):
        """NB: the reference's optimizer restore is commented out
        (base_model.py:119-128); pass restore_optimizer=False to match."""
        payload = ckpt.load_training_state(state_path)
        self.start_epoch = payload["epoch"]
        self.start_iter = payload["iter"]
        if restore_optimizer and self.is_train:
            self.opt_state = self._adapt_opt_state(
                jax.tree.map(jnp.asarray, payload["opt_state"])
            )
            extra = payload.get("extra") or {}
            if self.gan is not None and "d_opt_state" in extra:
                self.gan.d_opt_state = jax.tree.map(
                    jnp.asarray, extra["d_opt_state"]
                )
                self.gan.d_stats = jax.tree.map(
                    jnp.asarray, extra["d_stats"]
                )
        return payload
