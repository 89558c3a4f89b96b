"""Test configuration: run everything on CPU with a virtual 8-device mesh.

The reference's distributed tests need real multi-GPU + NCCL (SURVEY.md
section 4); the TPU rebuild instead tests kernels via the Pallas
interpreter and multi-chip sharding via XLA's virtual CPU devices --
capabilities the reference lacks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    )
