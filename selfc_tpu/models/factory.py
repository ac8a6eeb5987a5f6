"""Network factory — the reference's define_G (codes/models/networks.py:12-86)
mapped onto the TPU-native modules.

Takes the full option dict (see selfc_tpu/config.py for the YAML-compatible
schema) and returns an un-initialized flax module.
"""

from __future__ import annotations

import logging

from .inv_nets import InvRescaleNet, SelfCNetCodec, SelfCNetGMM, SelfCNetHaar

logger = logging.getLogger("base")


def define_G(opt):
    net = opt["network_G"]
    model_type = opt["model"]
    init = net["init"] or "xavier"
    which = net["which_model_G"] or {}
    subnet_type = which.get("subnet_type", "D2DTNet")
    block_num = tuple(net["block_num"] or (4, 4))
    scale = net["scale"] or opt["scale"]

    if model_type in ("IRN", "IRN_Contra_UP"):
        return InvRescaleNet(
            scale=scale, block_num=block_num, subnet_type=subnet_type, init_mode=init
        )
    if model_type in ("SelfC", "SelfC_shell"):
        return SelfCNetHaar(
            scale=scale,
            block_num=block_num,
            subnet_type=subnet_type,
            init_mode=init,
            stp_temporal_c=net["stp_temporal_c"] or 32,
            fh_loss=net["fh_loss"] or "gmm",
            gmm_mixture_num=net["gmm_mixture_num"] or 5,
            condition_func=net["condition_func"] or "D2DTNet",
        )
    if model_type in ("SelfC_GMM", "SelfC_SR", "SelfC_Contra_UP"):
        # The reference snapshot hard-disables the forward conditional NLL
        # (SelfC_GMM_arch_inv.py:466-468: loss_c = out.mean()*0) even though
        # the train yml sets lambda_cond_prob. Default matches the snapshot;
        # set network_G.nll_enabled: true to restore the paper's loss_c.
        nll_enabled = bool(net["nll_enabled"])
        lam_cond = (opt["train"] or {}).get("lambda_cond_prob") if opt["train"] else None
        if lam_cond and not nll_enabled:
            logger.warning(
                "train.lambda_cond_prob=%s is set but network_G.nll_enabled "
                "is false: the forward conditional NLL (loss_c) is hard-zero, "
                "matching the reference snapshot (SelfC_GMM_arch_inv.py:468). "
                "Set network_G.nll_enabled: true to activate it.", lam_cond,
            )
        return SelfCNetGMM(
            scale=scale,
            block_num=block_num,
            subnet_type=subnet_type,
            init_mode=init,
            stp_blk_num=net["stp_blk_num"] or 6,
            fh_loss=net["fh_loss"] or "gmm",
            gmm_k=net["gmm_k"] or 5,
            global_module=net["global_module"] or "nonlocal",
            deform_radius=net["deform_radius"],
            nll_enabled=nll_enabled,
            remat=bool(net["remat"]),
            scan_blocks=bool(net["scan_blocks"]),
        )
    if model_type == "SelfC_GMM_Codec":
        return SelfCNetCodec(
            scale=scale,
            block_num=block_num,
            subnet_type=subnet_type,
            init_mode=init,
            stp_blk_num=net["stp_blk_num"] or 4,
            fh_loss=net["fh_loss"] or "l2",
            gmm_k=net["gmm_k"] or 5,
            global_module=net["global_module"] or "nonlocal",
            stp_hidden_c=net["stp_hidden_c"] or 24,
            stp_denseblock_innerc=net["stp_denseblock_innerc"] or 12,
            deart_net=bool(net["deart_net"]),
            deform_radius=net["deform_radius"],
        )
    raise NotImplementedError(f"model type {model_type!r} not supported")
