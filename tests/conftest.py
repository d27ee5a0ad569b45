"""Test harness: force an 8-virtual-device CPU backend BEFORE jax imports.

Multi-chip sharding logic is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count=8``); the real-TPU path is exercised
by bench.py / __graft_entry__.py.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the image pre-sets axon (TPU); force CPU
# Drop the axon (remote-TPU) plugin from the import path entirely: its
# get_backend hook initializes the tunnel client even under
# JAX_PLATFORMS=cpu, and when the remote worker is down that initialization
# BLOCKS indefinitely — a pure-CPU test tier must not depend on tunnel health.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p
    for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped with a fixed seed: each test draws the same values
    # whether run alone or in the full suite (reproducible failures)
    return np.random.default_rng(1234)
