"""Model wrapper factory (reference codes/models/__init__.py:5-15)."""

from __future__ import annotations


def create_model(opt):
    model = opt["model"]
    if model in ("SelfC", "SelfC_VRN", "SelfC_GMM", "IRN"):
        from .rescale_model import RescaleModel

        return RescaleModel(opt)
    if model == "SelfC_GMM_Codec":
        from .codec_model import CodecModel

        return CodecModel(opt)
    raise NotImplementedError(f"Model [{model}] not recognized.")
