"""Import reference PyTorch ``.pth`` state-dicts into flax param trees.

The reference checkpoints (``{iter}_G.pth``, reference base_model.py:77-85)
are NCHW torch tensors; our layout is channels-last with temporal convs
stored as ``(3, Cin, Cout)`` matmuls. Kernel conversion is decided purely by
tensor shape; name mapping is per-architecture regex rules.

Mirrors reference load semantics: strips a ``module.`` DDP prefix and skips
``Quantization_H265_Suggrogate`` keys (base_model.py:87-107).
"""

from __future__ import annotations

import re

import numpy as np


def convert_tensor(name: str, w: np.ndarray) -> np.ndarray:
    """torch kernel -> our kernel, by shape."""
    w = np.asarray(w)
    if w.ndim == 5:  # Conv3d (Co, Ci, kt, kh, kw)
        kt, kh, kw = w.shape[2:]
        if (kt, kh, kw) == (1, 1, 1):
            return w[:, :, 0, 0, 0].T  # pointwise (Ci, Co)
        if kh == 1 and kw == 1:  # temporal (3,1,1)
            return w[:, :, :, 0, 0].transpose(2, 1, 0)  # (kt, Ci, Co)
        if kt == 1:  # spatial (1,kh,kw)
            return w[:, :, 0].transpose(2, 3, 1, 0)  # (kh, kw, Ci, Co)
        return w.transpose(2, 3, 4, 1, 0)  # full (kt,kh,kw,Ci,Co)
    if w.ndim == 4:  # Conv2d (Co, Ci, kh, kw)
        if w.shape[2] == 1 and w.shape[3] == 1:
            return w[:, :, 0, 0].T  # pointwise (Ci, Co)
        return w.transpose(2, 3, 1, 0)
    if w.ndim == 2:  # Linear (Co, Ci)
        return w.T
    return w  # biases etc.


def _set(tree: dict, path: list, value):
    d = tree
    for k in path[:-1]:
        d = d.setdefault(k, {})
    d[path[-1]] = value


_GLOBALAGG_FIELDS = {
    "fc.weight": "fc_w",
    "fc.bias": "fc_b",
    "proj1.weight": "proj1_w",
    "proj1.bias": "proj1_b",
    "proj2.weight": "proj2_w",
    "proj2.bias": "proj2_b",
    "proj3.weight": "proj3_w",
    "proj3.bias": "proj3_b",
}


def _map_globalagg(rest: str):
    return [_GLOBALAGG_FIELDS[rest]]


_DEFORM_AGG_FIELDS = {
    "global_context_reallocator.0.weight": "realloc1_w",
    "global_context_reallocator.0.bias": "realloc1_b",
    "global_context_reallocator.2.weight": "realloc2_w",
    "global_context_reallocator.2.bias": "realloc2_b",
    "offset_conv.weight": "offset_w",
    "offset_conv.bias": "offset_b",
    "modulator_conv.weight": "modulator_w",
    "modulator_conv.bias": "modulator_b",
    "regular_conv.weight": "regular_w",
    "regular_conv.bias": "regular_b",
}


def _map_dense(rest: str):
    # "conv3.weight" -> ["chain", "conv3", "weight"]
    conv, leaf = rest.split(".")
    return ["chain", conv, leaf]


def map_reference_key(key: str, arch: str, block_num=(4, 4)):
    """reference state-dict key -> path in our param tree (list of str),
    or None to skip. arch: 'gmm' | 'codec' | 'haar' | 'irn'."""
    key = re.sub(r"^module\.", "", key)
    if "Quantization_H265_Suggrogate" in key or "Quantization_H265" in key:
        return None  # reference skips surrogate keys on load (base_model.py:94)
    if "haar_weights" in key:
        return None  # fixed buffers, not parameters here

    m = re.match(r"operations\.(\d+)\.([FGH])\.(.*)", key)
    if m:
        idx, sub, rest = int(m.group(1)), m.group(2), m.group(3)
        if arch in ("gmm", "codec"):
            # operations.0 is the (param-free) FrequencyAnalyzer
            return [f"inv_blocks_{idx - 1}", sub] + _map_dense(rest)
        # haar/irn: ops = [haar, b0..b_{n0-1}, haar, b...] — haar has params
        # (haar_weights) handled above; blocks sit at running indices.
        level_sizes = list(block_num)
        pos = 0
        for level, n in enumerate(level_sizes):
            start = pos + 1  # skip the haar module at `pos`
            if start <= idx < start + n:
                return [
                    f"level_blocks_{level}_{idx - start}",
                    sub,
                ] + _map_dense(rest)
            pos = start + n - 1 + 1
        raise KeyError(f"cannot place {key}")

    m = re.match(r"stp_net\.(local_m\d)\.(.*)", key)
    if m:
        return ["stp_net", m.group(1)] + _map_dense(m.group(2))
    m = re.match(r"stp_net\.(global_m\d)\.(.*)", key)
    if m:
        return ["stp_net", m.group(1)] + _map_globalagg(m.group(2))
    m = re.match(r"stp_net\.other_stp_modules\.(\d+)\.(.*)", key)
    if m:
        n, rest = int(m.group(1)), m.group(2)
        if rest.startswith("conv"):
            return ["stp_net", f"other_local_{n // 2}"] + _map_dense(rest)
        return ["stp_net", f"other_global_{n // 2}"] + _map_globalagg(rest)
    m = re.match(r"stp_net\.(?:tail_gmm|tail)\.(\d+)\.(.*)", key)
    if m:
        seq_idx, leaf = int(m.group(1)), m.group(2)
        return ["stp_net", f"tail_{(seq_idx - 1) // 2}", leaf]
    # small Haar-variant STPNet
    m = re.match(r"stp_net\.blk1\.(\d+)\.(.*)", key)
    if m:
        return ["stp_net", f"blk1_{m.group(1)}"] + _map_dense(m.group(2))
    m = re.match(r"stp_net\.blk2\.(.*)", key)
    if m:
        return ["stp_net", "blk2"] + _map_dense(m.group(1))
    m = re.match(r"deart_net\.(\d+)\.(.*)", key)
    if m:
        n, rest = int(m.group(1)), m.group(2)
        if rest.startswith("conv"):
            return [f"deart_{n}"] + _map_dense(rest)
        # GroupedGlobalDeformAgg (reference SelfC_Codec_arch_inv.py:134-185)
        if rest in _DEFORM_AGG_FIELDS:
            return [f"deart_{n}", _DEFORM_AGG_FIELDS[rest]]
        raise KeyError(f"unmapped deart_net key: {key}")
    raise KeyError(f"unmapped reference key: {key}")


def import_state_dict(state_dict, arch: str, block_num=(4, 4)) -> dict:
    """torch state_dict (name -> array-like) -> flax params dict."""
    tree: dict = {}
    for k, v in state_dict.items():
        path = map_reference_key(k, arch, block_num)
        if path is None:
            continue
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        _set(tree, path, np.asarray(convert_tensor(k, arr), np.float32))
    return tree


def stack_block_params(params: dict, n_blocks: int) -> dict:
    """Convert per-block ``inv_blocks_{i}`` param trees into the stacked
    ``scan_chain/blocks`` layout used by scan_blocks=True models."""
    import jax

    blocks = [params[f"inv_blocks_{i}"] for i in range(n_blocks)]
    stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)
    out = {k: v for k, v in params.items() if not k.startswith("inv_blocks_")}
    out["scan_chain"] = {"blocks": stacked}
    return out


def invert_tensor(torch_shape, w: np.ndarray) -> np.ndarray:
    """our kernel -> torch kernel of ``torch_shape`` (convert_tensor^-1)."""
    w = np.asarray(w)
    if len(torch_shape) == 5:  # Conv3d (Co, Ci, kt, kh, kw)
        kt, kh, kw = torch_shape[2:]
        if (kt, kh, kw) == (1, 1, 1):
            return w.T[:, :, None, None, None]
        if kh == 1 and kw == 1:  # temporal: ours (kt, Ci, Co)
            return w.transpose(2, 1, 0)[:, :, :, None, None]
        if kt == 1:  # spatial: ours (kh, kw, Ci, Co)
            return w.transpose(3, 2, 0, 1)[:, :, None]
        return w.transpose(4, 3, 0, 1, 2)
    if len(torch_shape) == 4:  # Conv2d
        if torch_shape[2] == 1 and torch_shape[3] == 1:
            return w.T[:, :, None, None]
        return w.transpose(3, 2, 0, 1)
    if len(torch_shape) == 2:  # Linear
        return w.T
    return w


def _get(tree: dict, path: list):
    d = tree
    for k in path:
        d = d[k]
    return d


def export_state_dict(params: dict, template: dict, arch: str,
                      block_num=(4, 4)) -> dict:
    """flax params -> torch-layout state_dict (numpy values).

    ``template`` gives the target key set and tensor shapes — take it from
    a freshly constructed reference net's ``state_dict()``. Keys that the
    import path skips (fixed haar buffers, surrogate subtrees) are passed
    through from the template unchanged. This is the inverse of
    ``import_state_dict`` and lets the reference stack run with weights
    trained here (parity protocol, reference README.md:61-78).
    """
    out = {}
    for k, tv in template.items():
        tshape = tuple(tv.shape)
        path = map_reference_key(k, arch, block_num)
        if path is None:
            out[k] = np.asarray(
                tv.detach().cpu().numpy() if hasattr(tv, "detach") else tv
            )
            continue
        ours = np.asarray(_get(params, path), np.float32)
        conv = np.asarray(invert_tensor(tshape, ours), np.float32)
        if conv.shape != tshape:
            raise ValueError(
                f"{k}: exported shape {conv.shape} != template {tshape}"
            )
        out[k] = conv
    return out


def load_pth(path: str, arch: str, block_num=(4, 4)) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return import_state_dict(sd, arch, block_num)


# ---------------------------------------------------------------------------
# VGG-19 feature-extractor import (reference VGGFeatureExtractor loads
# torchvision.models.vgg19(pretrained=True).features[:35],
# discriminator_vgg_arch.py:60-88). torchvision isn't present in this
# environment, so the perceptual path takes a torchvision-format
# state_dict file instead: keys ``features.N.weight/bias`` with convs at
# the standard vgg19 indices.
# ---------------------------------------------------------------------------

_VGG19_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34)


def import_vgg19_features(state_dict) -> dict:
    """torchvision vgg19 ``features.*`` state_dict -> VGGFeatureExtractor
    params ({'conv_i': {'kernel', 'bias'}}, OIHW -> HWIO)."""
    out = {}
    for i, idx in enumerate(_VGG19_CONV_IDX):
        wk, bk = f"features.{idx}.weight", f"features.{idx}.bias"
        if wk not in state_dict:
            break
        w = np.asarray(state_dict[wk], np.float32)
        out[f"conv_{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": np.asarray(state_dict[bk], np.float32),
        }
    if not out:
        raise KeyError("no vgg19 'features.N.weight' keys found")
    return out
