"""Model wrapper factory (reference codes/models/__init__.py:5-15)."""

from __future__ import annotations


def create_model(opt, mesh=None, rng_seed: int = 0):
    model = opt["model"]
    if model in ("SelfC", "SelfC_VRN", "SelfC_GMM", "IRN"):
        from .rescale_model import RescaleModel

        return RescaleModel(opt, mesh=mesh, rng_seed=rng_seed)
    if model == "SelfC_GMM_Codec":
        from .codec_model import CodecModel

        return CodecModel(opt, mesh=mesh, rng_seed=rng_seed)
    raise NotImplementedError(f"Model [{model}] not recognized.")
