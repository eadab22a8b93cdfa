"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX-idiomatic fake-cluster mechanism (SURVEY.md §4): sharding tests
exercise real collectives without TPU hardware.  x64 is enabled so the f64
parity-oracle configs work; f32 paths construct f32 arrays explicitly.
"""

import os

from softbody_tpu.utils.hostmem import enable_heap_reuse

enable_heap_reuse()

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env var alone can be overridden by preinstalled platform plugins; the
# config flag always wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
