"""Test configuration: run everything on CPU with a virtual 8-device mesh.

The reference's distributed tests need real multi-GPU + NCCL (SURVEY.md
section 4); the TPU rebuild instead tests kernels via the Pallas
interpreter and multi-chip sharding via XLA's virtual CPU devices --
capabilities the reference lacks.

Environment note: this machine boots with a remote-TPU PJRT plugin
("axon") that registers itself at interpreter startup and hijacks
platform selection, so setting ``JAX_PLATFORMS=cpu`` alone still yields
the TPU. Tests deregister the plugin's backend factory and force the
plain CPU client with 8 devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
