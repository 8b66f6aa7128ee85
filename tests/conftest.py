"""Test configuration: run on 2 virtual CPU devices.

Multi-device data parallelism is tested without TPU hardware by exposing 2
virtual CPU devices (the machine has a single core; more device threads starve
XLA collective rendezvous) (SURVEY.md §4.3). CPU is forced unconditionally: tests
must be deterministic and must not contend for the (single-tenant) TPU chip.
``jax.config.update`` is used instead of env vars because the test harness may
import jax before this conftest runs.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
