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

# Persistent XLA compilation cache: jit compiles dominate suite wall-clock
# (test_search alone spends ~10 min compiling); caching them on disk makes
# re-runs start warm. Keyed by HLO hash, so stale entries are impossible.
import os as _os  # noqa: E402
_cache_dir = _os.environ.get("KATAGO_JAX_CACHE",
                             "/tmp/katago_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
