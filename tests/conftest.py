"""Test configuration: run JAX on a virtual 8-device CPU platform.

Per SURVEY.md §4: kernels and sharding logic must be testable without TPU
hardware.  JAX runs the same XLA programs on CPU, and
``--xla_force_host_platform_device_count=8`` emulates an 8-chip mesh for
``shard_map``/``pjit`` tests.  Must run before jax is imported anywhere.
"""

import os

# force-override: the host image exports JAX_PLATFORMS=axon,cpu (real TPU)
os.environ["JAX_PLATFORMS"] = "cpu"
# the suite must never probe the real backend (dryrun_multichip's bounded
# device-count probe would hit the tunneled chip — and burn its full 90 s
# timeout during an outage)
os.environ["UPSCALE_TPU_DRYRUN_FORCE_VIRTUAL"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A pytest plugin in this image imports jax before conftest runs, so the env
# var alone is too late; backends initialize lazily, so the config API works.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


REFERENCE_MODELS = "/root/reference/models"


def reference_models_available() -> bool:
    return os.path.isdir(REFERENCE_MODELS)
