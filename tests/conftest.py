"""Test config: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 testing strategy).

NOTE: the axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME is the
override that actually forces the CPU backend in this image.
"""

import os

# Force (not setdefault): the image exports JAX_PLATFORMS=axon globally,
# which would silently route "CPU" tests through the TPU tunnel. The axon
# sitecustomize imports jax at interpreter start, so flipping the env here
# is not enough — re-initialize the backend too.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the encoder jits are large; caching across
# pytest processes cuts suite time dramatically.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

if jax.default_backend() != "cpu":
    # sitecustomize already initialized the axon backend; re-init on CPU.
    jax.config.update("jax_platforms", "cpu")
    import jax.extend.backend

    jax.extend.backend.clear_backends()
assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; axon plugin override failed")
