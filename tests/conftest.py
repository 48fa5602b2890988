"""Test configuration: run on CPU with a virtual 8-device mesh.

Mirrors the driver's multi-chip dry-run environment: sharding/collective code is
validated on `xla_force_host_platform_device_count=8` CPU devices (the real TPU
path is exercised by bench.py / the driver on actual hardware).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xB15C0)
