"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the env before jax is first imported anywhere in the test process.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compile cache: two XLA-compile-bound tests dominate the suite
# (~15 min each cold); cached re-runs cut the wall time drastically
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
)

import jax

# the image's sitecustomize force-registers the axon TPU backend regardless of
# JAX_PLATFORMS; override it so tests run on the virtual 8-device CPU mesh
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)
