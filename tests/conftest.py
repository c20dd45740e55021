"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on host-platform virtual devices
(SURVEY.md §4 "distributed" bullet); real-TPU benchmarking happens in
bench.py, not under pytest.

The session's sitecustomize registers the remote-TPU "axon" backend and
forcibly sets jax_platforms="axon,cpu" at interpreter start, so an env var
alone is not enough — we must update the jax config back to cpu before any
backend initialises.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after XLA_FLAGS is set)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
