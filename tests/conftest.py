"""Test configuration: run on 8 virtual CPU devices.

Multi-device data parallelism is tested without TPU hardware by forcing the
CPU backend to expose 8 devices (SURVEY.md §4.3).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
