"""Test configuration: run on 2 virtual CPU devices.

Multi-device data parallelism is tested without TPU hardware by exposing 2
virtual CPU devices (the machine has a single core; more device threads starve
XLA collective rendezvous) (SURVEY.md §4.3). CPU is forced unconditionally: tests
must be deterministic and must not contend for the (single-tenant) TPU chip.
``jax.config.update`` is used instead of env vars because the test harness may
import jax before this conftest runs.
"""

import os
import sys

# On this single-core host a partition thread can occasionally be scheduled
# >40s late on a loaded box, tripping XLA's CPU collective termination timeout.
# A modest raise absorbs scheduling jitter; true pipelining deadlocks are
# prevented at the source (OnPolicyRunner bounds in-flight programs on CPU).
# These flags have no jax.config equivalent, so the env var is the only
# channel. XLA_FLAGS is read lazily at backend-client creation (jax itself is
# already imported here by pytest plugins — that is fine); guard against a
# plugin having CREATED a backend before this conftest ran, which would make
# the flags silently inert.
if "jax" in sys.modules:
    _bridge = sys.modules.get("jax._src.xla_bridge")
    assert _bridge is None or not getattr(_bridge, "_backends", {}), (
        "an XLA backend was initialized before tests/conftest.py;"
        " XLA_FLAGS and jax.config settings below would not apply."
    )
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_collective_timeout_seconds=120"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=120"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
