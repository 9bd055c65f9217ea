"""Test harness configuration.

Runs the whole suite on a virtual 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4's "distributed tests
without a real cluster" analog).

Note: this image's sitecustomize registers the axon TPU plugin and overrides
JAX_PLATFORMS via jax.config, so env vars alone don't stick — we must call
jax.config.update after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # This image's jaxlib prefers AVX512/AMX codegen that intermittently
    # SEGFAULTS the XLA:CPU compile/load pipeline on some hosts (two full
    # suite runs died mid-compile, round 3). Capping the ISA to AVX2 avoids
    # the unstable codegen at a small CPU-test speed cost.
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Declare CPU via env (not just the config.update below): mrt_tpu/__init__
# keys the compilation-cache location on it — CPU AOT executables must go to
# a machine-local cache, not the shared .jax_cache (a cached CPU executable
# from a different host's feature set segfaults on load), and subprocess
# tests inherit the choice.
# FORCE (not setdefault): the image's ambient environment exports
# JAX_PLATFORMS=axon, which would leave the segfaulting CPU persistent
# cache enabled. The suite is CPU-only by definition.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
