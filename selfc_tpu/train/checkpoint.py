"""Checkpointing with the reference's naming discipline.

Reference base_model.py:77-117: ``{iter}_G.pth`` network state-dicts and
``{iter}.state`` training state. Here: ``{iter}_G.msgpack`` flax params and
``{iter}.state`` (msgpack opt-state + counters). ``load_network`` accepts
either our msgpack files or reference ``.pth`` checkpoints (imported via
utils/torch_import).

NB the reference's resume_training never actually restores optimizer
state (body commented out, base_model.py:119-128); ours does restore it,
with a flag to reproduce the reference behavior.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
from flax import serialization


def save_network(params, model_dir: str, iter_label, network_label: str = "G"):
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, f"{iter_label}_{network_label}.msgpack")
    params = jax.tree.map(np.asarray, jax.device_get(params))
    # Atomic publish: the crash-proof run loop snapshots {iter}_G.msgpack /
    # {iter}.state pairs while training continues; a rename means it can
    # never observe a half-written checkpoint.
    with open(path + ".tmp", "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    os.replace(path + ".tmp", path)
    return path


def load_network(path: str, template_params, arch: str = "gmm", block_num=(4, 4)):
    """Load our msgpack or a reference .pth into the template's structure."""
    if path.endswith(".pth"):
        from ..utils.torch_import import load_pth

        imported = load_pth(path, arch, block_num)
        return _merge(template_params, imported)
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return _merge(template_params, raw)


def _merge(template, loaded):
    """Fill template structure from loaded tree; missing keys keep template
    values (mirrors strict_load=False), extra keys error."""
    flat_t = _flatten(template)
    flat_l = _flatten(loaded)
    unknown = set(flat_l) - set(flat_t)
    if unknown:
        raise KeyError(f"checkpoint keys not in model: {sorted(unknown)[:5]} ...")
    out = dict(flat_t)
    for k, v in flat_l.items():
        if tuple(np.shape(v)) != tuple(np.shape(flat_t[k])):
            raise ValueError(
                f"shape mismatch at {k}: ckpt {np.shape(v)} vs model "
                f"{np.shape(flat_t[k])}"
            )
        out[k] = np.asarray(v)
    return _unflatten(out)


def _flatten(tree, prefix=()):
    flat = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        d = tree
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v
    return tree


def save_training_state(
    state_dir: str, epoch: int, it: int, opt_state, extra=None
):
    os.makedirs(state_dir, exist_ok=True)
    path = os.path.join(state_dir, f"{it}.state")
    payload = {
        "epoch": epoch,
        "iter": it,
        "opt_state": jax.tree.map(np.asarray, jax.device_get(opt_state)),
        "extra": extra or {},
    }
    with open(path + ".tmp", "wb") as f:
        pickle.dump(payload, f)
    os.replace(path + ".tmp", path)
    return path


def load_training_state(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
