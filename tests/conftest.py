"""Test harness config: force an 8-device virtual CPU mesh.

This is the JAX-idiomatic "multi-node without a cluster" setup (SURVEY.md §4):
sharded code paths are exercised on 8 virtual host devices.

NOTE: the environment's sitecustomize imports jax and registers the TPU
plugin at interpreter start, so setting ``JAX_PLATFORMS`` in the environment
here is too late — the value was already latched. ``jax.config.update``
takes effect as long as no backend has been initialized yet.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
