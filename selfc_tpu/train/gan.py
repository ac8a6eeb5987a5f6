"""Adversarial training branch for the rescaling model.

The reference ships the GAN components — ``GANLoss``/``GradientPenaltyLoss``
(loss.py:69-124), ``Discriminator_VGG_128``/``VGGFeatureExtractor``
(discriminator_vgg_arch.py:6-88) and the ``define_D``/``define_F``
factories (networks.py:90-113) — but no shipped model wires them (they
back the BasicSR/SRGAN-style config schema: ``train.gan_type``,
``gan_weight``, ``feature_weight``, ``lr_D``, ``D_update_ratio``,
``D_init_iters``). This module closes that loop the TPU way: one jitted
step that updates G (pixel + perceptual + adversarial) and D
(real/fake, with relativistic-average and WGAN-GP variants) together,
with the BasicSR update gating expressed as on-device ``where`` masks so
the step stays a single compiled program.

Enabled by setting ``train.gan_weight`` in the config; everything here is
inert otherwise.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.discriminator import define_D, define_F
from ..parallel.mesh import replicated
from .losses import gan_loss, gradient_penalty, reconstruction_loss
from .lr_schedule import cosine_restart, multistep_restart

logger = logging.getLogger("base")


def _flat_frames(v):
    """(B, T, H, W, C) video -> (B*T, H, W, C) frame batch for D/F."""
    return v.reshape((-1,) + v.shape[2:])


class AdversarialBranch:
    """Holds netD (+ optional netF), their params/optimizer, and builds the
    combined G+D train step around the model's pixel losses."""

    def __init__(self, model):
        opt = model.opt
        to = model.train_opt
        self.gan_type = to["gan_type"] or "gan"
        self.gan_w = float(to["gan_weight"])
        self.fea_w = float(to["feature_weight"] or 0.0)
        self.fea_crit = to["feature_criterion"] or "l1"
        self.gp_w = float(to["gp_weight"] or 10.0)
        # BasicSR semantics: G updates every D_update_ratio steps once past
        # D_init_iters; D updates every step.
        self.d_update_ratio = int(to["D_update_ratio"] or 1)
        self.d_init_iters = int(to["D_init_iters"] or 0)

        if not opt["network_D"]:
            opt["network_D"] = type(opt)(
                {"which_model_D": "discriminator_vgg_128", "in_nc": 3,
                 "nf": 64}
            )
        self.netD = define_D(opt)
        self.netF = define_F(opt) if self.fea_w else None

        gt = (
            opt["datasets"]["train"]["GT_size"]
            if (opt["datasets"] and opt["datasets"]["train"])
            else 16 * model.scale
        ) or 16 * model.scale
        dummy = jnp.zeros((1, gt, gt, 3), jnp.float32)
        model.rng, kd, kf = jax.random.split(model.rng, 3)
        var_d = self.netD.init(kd, dummy, train=True)
        rep = replicated(model.mesh)
        self.d_params = jax.device_put(var_d["params"], rep)
        self.d_stats = jax.device_put(var_d["batch_stats"], rep)
        if self.netF is not None:
            f_params = self.netF.init(kf, dummy)["params"]
            f_path = (opt["path"] or {}).get("pretrain_model_F")
            if f_path:
                f_params = self._load_f(f_path, f_params)
            # netF is a frozen feature extractor — params are inputs to the
            # step, never touched by an optimizer
            self.f_params = jax.device_put(f_params, rep)
        else:
            self.f_params = {}

        clip = to["gradient_clipping"]
        chain = []
        if clip:
            chain.append(optax.clip_by_global_norm(clip))
        chain.append(
            optax.scale_by_adam(
                b1=to["beta1_D"] or to["beta1"] or 0.9,
                b2=to["beta2_D"] or to["beta2"] or 0.999,
            )
        )
        self.txD = optax.chain(*chain)
        self.d_opt_state = self.txD.init(self.d_params)

        lr_d = to["lr_D"] or to["lr_G"] or 1e-4
        if (to["lr_scheme"] or "MultiStepLR") == "MultiStepLR":
            self.lr_d_fn = multistep_restart(
                lr_d, to["lr_steps"] or [], to["lr_gamma"] or 0.5,
                to["restarts"], to["restart_weights"],
                to["warmup_iter"] or -1,
            )
        else:
            self.lr_d_fn = cosine_restart(
                lr_d, to["T_period"], to["eta_min"] or 1e-7,
                to["restarts"], to["restart_weights"],
                to["warmup_iter"] or -1,
            )
        logger.info(
            "Adversarial branch on: gan_type=%s gan_w=%g fea_w=%g "
            "D_update_ratio=%d D_init_iters=%d",
            self.gan_type, self.gan_w, self.fea_w,
            self.d_update_ratio, self.d_init_iters,
        )

    @staticmethod
    def _load_f(path, template):
        from ..utils.torch_import import import_vgg19_features

        if path.endswith(".pth"):
            import torch

            sd = torch.load(path, map_location="cpu")
        else:
            with open(path, "rb") as f:
                import pickle

                sd = pickle.load(f)
        imported = import_vgg19_features(sd)
        out = dict(template)
        out.update({k: v for k, v in imported.items() if k in template})
        return out

    # ------------------------------------------------------------------
    def _d_logits(self, d_params, d_stats, x, train: bool):
        variables = {"params": d_params, "batch_stats": d_stats}
        if train:
            logits, mut = self.netD.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            return logits, mut["batch_stats"]
        return self.netD.apply(variables, x, train=False), d_stats

    def _adv_loss(self, pred_fake, pred_real, for_g: bool):
        """Generator/discriminator adversarial loss incl. the relativistic
        average variant (BasicSR SRGAN_model semantics for 'ragan')."""
        gt = self.gan_type
        if gt == "ragan":
            rf = pred_real - jnp.mean(pred_fake)
            fr = pred_fake - jnp.mean(pred_real)
            if for_g:
                return 0.5 * (gan_loss(rf, False, "gan")
                              + gan_loss(fr, True, "gan"))
            return 0.5 * (gan_loss(rf, True, "gan")
                          + gan_loss(fr, False, "gan"))
        if for_g:
            return gan_loss(pred_fake, True, gt)
        return gan_loss(pred_real, True, gt) + gan_loss(pred_fake, False, gt)

    # ------------------------------------------------------------------
    def train_step(self, model, g_params, g_opt_state, d_params, d_stats,
                   d_opt_state, f_params, hr, lr_g, lr_d, step):
        """One combined G+D step. All gating (D warm-up, G update cadence,
        non-finite guard) runs on device so the program never branches on
        host values."""
        rng = jax.random.fold_in(model._step_key, step)
        ref_l = jax.lax.stop_gradient(model.degrade(hr))
        real = _flat_frames(hr.astype(jnp.float32))

        # ---- G update --------------------------------------------------
        def g_loss_fn(gp):
            loss_pix, logs, out = model._pixel_losses(gp, hr, ref_l, rng)
            fake = _flat_frames(out["hr"].astype(jnp.float32))
            l_total = loss_pix
            if self.fea_w:
                fea_real = jax.lax.stop_gradient(
                    self.netF.apply({"params": f_params}, real)
                )
                fea_fake = self.netF.apply({"params": f_params}, fake)
                l_fea = self.fea_w * reconstruction_loss(
                    fea_fake, fea_real, self.fea_crit
                )
                l_total = l_total + l_fea
                logs = dict(logs, l_g_fea=l_fea)
            pred_fake, _ = self._d_logits(d_params, d_stats, fake, False)
            if self.gan_type == "ragan":
                pred_real, _ = self._d_logits(d_params, d_stats, real, False)
                pred_real = jax.lax.stop_gradient(pred_real)
            else:
                pred_real = pred_fake  # unused
            l_gan = self.gan_w * self._adv_loss(pred_fake, pred_real, True)
            logs = dict(logs, l_g_gan=l_gan)
            return l_total + l_gan, (logs, fake)

        (g_loss, (logs, fake)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_params)
        updates, new_g_opt = model.tx.update(g_grads, g_opt_state, g_params)
        new_g = jax.tree.map(lambda p, u: p - lr_g * u, g_params, updates)
        g_on = jnp.logical_and(
            step % self.d_update_ratio == 0, step > self.d_init_iters
        )
        g_ok = jnp.logical_and(g_on, jnp.isfinite(g_loss))
        g_params = jax.tree.map(
            lambda n, o: jnp.where(g_ok, n, o), new_g, g_params
        )
        g_opt_state = jax.tree.map(
            lambda n, o: jnp.where(g_ok, n, o), new_g_opt, g_opt_state
        )

        # ---- D update --------------------------------------------------
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(dp):
            pred_real, stats1 = self._d_logits(dp, d_stats, real, True)
            pred_fake, stats2 = self._d_logits(dp, stats1, fake_sg, True)
            l_d = self._adv_loss(pred_fake, pred_real, False)
            aux = {
                "l_d_real": jnp.mean(pred_real),
                "l_d_fake": jnp.mean(pred_fake),
            }
            if self.gan_type == "wgan-gp":
                eps = jax.random.uniform(
                    jax.random.fold_in(rng, 1),
                    (real.shape[0],) + (1,) * (real.ndim - 1),
                )
                interp = eps * real + (1.0 - eps) * fake_sg

                def disc(x):
                    return self._d_logits(dp, d_stats, x, False)[0]

                l_d = l_d + self.gp_w * gradient_penalty(disc, interp)
            return l_d, (stats2, aux)

        (d_loss, (new_stats, d_aux)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_params)
        d_updates, new_d_opt = self.txD.update(d_grads, d_opt_state, d_params)
        new_d = jax.tree.map(lambda p, u: p - lr_d * u, d_params, d_updates)
        d_ok = jnp.isfinite(d_loss)
        d_params = jax.tree.map(
            lambda n, o: jnp.where(d_ok, n, o), new_d, d_params
        )
        d_opt_state = jax.tree.map(
            lambda n, o: jnp.where(d_ok, n, o), new_d_opt, d_opt_state
        )
        d_stats = jax.tree.map(
            lambda n, o: jnp.where(d_ok, n, o), new_stats, d_stats
        )

        logs = dict(logs)
        logs["l_d"] = d_loss
        logs["D_real"] = d_aux["l_d_real"]
        logs["D_fake"] = d_aux["l_d_fake"]
        logs["skipped_nonfinite"] = (~jnp.isfinite(g_loss)).astype(
            jnp.float32
        )
        return g_params, g_opt_state, d_params, d_stats, d_opt_state, logs
