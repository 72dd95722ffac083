"""Test harness config: force an 8-device virtual CPU mesh before jax import.

This is the JAX-idiomatic "multi-node without a cluster" setup (SURVEY.md §4):
sharded code paths are exercised on 8 virtual host devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
