"""Test config: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware.

On-TPU kernel regression lane (docs/STATUS.md): ``SELFC_TPU_TEST_TPU=1
pytest -m tpu`` keeps the real backend (axon/TPU) instead of forcing CPU
and runs the tests marked ``tpu`` — the Pallas chain fwd/adjoint/epilogue/
W-packing oracles and the SSIM-precision pin — COMPILED on the chip (the
kernels' interpret=True fallback only fires on the CPU backend). This is
the repeatable lane for chip-numerics regressions (the round-2 SSIM
corruption class of bug), since CPU emulation demonstrably diverges from
chip numerics.
"""

import os

import pytest

TPU_LANE = os.environ.get("SELFC_TPU_TEST_TPU") == "1"

if not TPU_LANE:
    # Force CPU: the driver environment pins JAX_PLATFORMS=axon (real TPU),
    # but tests must exercise the virtual multi-device mesh.
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not TPU_LANE:
    # the axon TPU plugin can win over the env var; force the platform too
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: model compiles dominate test time on the
# single-core CPU host; cache them across test processes/runs. (The env-var
# spelling of these options is not honored in this jax build — use config.)
jax.config.update("jax_compilation_cache_dir", "/tmp/selfc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def pytest_collection_modifyitems(config, items):
    if not TPU_LANE:
        return
    # the TPU lane only makes sense with the marked subset on a real chip
    if jax.default_backend() not in ("tpu",):
        pytest.exit(
            "SELFC_TPU_TEST_TPU=1 but backend is %r — run with "
            "PYTHONPATH including /root/.axon_site" % jax.default_backend()
        )
    skip = pytest.mark.skip(reason="not part of the on-TPU lane (-m tpu)")
    for item in items:
        if "tpu" not in item.keywords:
            item.add_marker(skip)


def install_reference_stubs():
    """Stub the reference's unavailable native deps so its modules import
    on CPU (torchvision incl. .utils, skvideo); add the reference to
    sys.path and patch the CUDA tensor type. Shared by parity tests."""
    import sys
    import types

    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvo = types.ModuleType("torchvision.ops")
        tvu = types.ModuleType("torchvision.utils")

        def _no_deform(*a, **k):
            raise RuntimeError("deform_conv2d not exercised in these tests")

        tvt = types.ModuleType("torchvision.transforms")
        tvo.deform_conv2d = _no_deform
        tvu.make_grid = lambda *a, **k: a[0]
        tvt.ToPILImage = lambda *a, **k: (lambda x: x)
        tvt.ToTensor = lambda *a, **k: (lambda x: x)
        tv.ops = tvo
        tv.utils = tvu
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tvo
        sys.modules["torchvision.utils"] = tvu
        sys.modules["torchvision.transforms"] = tvt
    for m in ("skvideo", "skvideo.io"):
        sys.modules.setdefault(m, types.ModuleType(m))
    ref = "/root/reference/codes"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    torch.cuda.FloatTensor = torch.FloatTensor
