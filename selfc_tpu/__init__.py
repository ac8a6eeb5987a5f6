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
