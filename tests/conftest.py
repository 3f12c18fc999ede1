"""Test configuration: CPU backend with 8 virtual devices.

Must set environment before jax initializes; this is the TPU-native analogue
of a fake backend (SURVEY.md §4): pjit/psum data-parallel tests run on an
8-device virtual CPU mesh.
"""

import os
import sys

# The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel);
# tests must run on the virtual-device CPU backend, so override outright.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_TPU_GEN"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax

# A platform plugin in this image force-updates jax_platforms to 'axon,cpu'
# at import time, ignoring JAX_PLATFORMS — override it back to pure CPU so
# the 8 virtual devices from XLA_FLAGS are what tests see.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# The reference modules are pure NumPy and serve as parity oracles in tests.
# They use the removed np.float / np.int / np.bool aliases.
for _name, _alias in (("float", float), ("int", int), ("bool", bool)):
    if not hasattr(np, _name):
        setattr(np, _name, _alias)

REFERENCE_ROOT = "/root/reference"
if os.path.isdir(REFERENCE_ROOT) and REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference repo not mounted"
)
