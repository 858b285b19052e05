"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests use XLA's
host-platform device virtualization (the standard JAX substitute for
fake backends — SURVEY.md §4). The container's sitecustomize registers
an ``axon`` TPU backend and sets JAX_PLATFORMS=axon, so we must override
the platform *after* import via jax.config (env vars alone are ignored).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
