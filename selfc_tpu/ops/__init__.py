from . import conv, deform, freq, gmm, haar, quantize, resize, shuffle  # noqa: F401
