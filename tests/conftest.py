import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware. XLA_FLAGS must be set before backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment's axon sitecustomize force-registers the tunneled TPU
# backend (JAX_PLATFORMS=axon in env); per-sync round trips through the
# tunnel are ~100ms, which makes move-by-move engine tests crawl. Force CPU.
jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent XLA compilation cache (jax_compilation_cache_dir)
# was tried here and reverted: the CPU AOT loader records stricter
# machine features than the host reports, spamming feature-mismatch
# errors and risking SIGILL on reload. Re-evaluate on real TPU runtimes.


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-executable caches after each test module.

    One pytest process compiles many hundreds of XLA CPU programs across
    the suite; with all of them held live, the compiler eventually
    segfaults inside backend_compile (reproducibly at ~the 18th module,
    test_loop's selfplay program — fine in isolation). Dropping the
    caches between modules keeps the process's compiler state bounded.
    Cross-module executable reuse is rare, so this costs little.
    """
    yield
    jax.clear_caches()
    gc.collect()
