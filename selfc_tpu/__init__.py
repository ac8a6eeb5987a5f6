"""selfc_tpu: a TPU-native JAX/XLA/Pallas framework for self-conditioned
probabilistic video rescaling and compression.

Re-designed from scratch for TPU (not a port): provides the same capabilities
as the reference SelfC research framework (video rescaling with invertible
networks + spatio-temporal GMM priors, and video compression through a real
H.265 codec), built on:

  * channels-last ``(B, T, H, W, C)`` video layout — T is a static shape so
    every module is jit-traceable (the reference used a process-global
    ``GlobalVar`` for T; see /root/reference/codes/global_var.py:3-31),
  * XLA convolutions + Pallas kernels on the hot path,
  * ``jax.sharding.Mesh`` + ``shard_map`` data/sequence parallelism over ICI
    (the reference used NCCL DDP; see /root/reference/codes/train.py:19-27),
  * a host-side FFmpeg bridge for the codec span (the reference shelled out
    via skvideo; see Quantization_h265_rgb_stream.py:91-96).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SELFC_TPU_CACHE", "1") != "0":
    # Persistent XLA compilation cache: full-model (and especially grad)
    # compiles take minutes; cache them across processes. Opt out with
    # SELFC_TPU_CACHE=0, relocate with SELFC_TPU_CACHE_DIR.
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("SELFC_TPU_CACHE_DIR", "/tmp/selfc_jax_cache"),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
