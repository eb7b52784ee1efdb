"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (the driver separately dry-runs the multi-chip
path via __graft_entry__.dryrun_multichip).

Note: this image's sitecustomize imports jax and pins JAX_PLATFORMS=axon (the
tunneled TPU) in every interpreter, so env vars set here are too late —
``jax.config.update`` is the only override that works.  XLA_FLAGS is still
read lazily at first backend init, so setting it here is in time as long as
no test imports trigger device access at module scope.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(666)
