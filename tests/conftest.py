"""Test environment: force JAX onto a virtual 8-device CPU mesh.

Must run before any `import jax` (pytest loads conftest first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Single-core CI box: avoid thread oversubscription.
os.environ.setdefault("XLA_CPU_MULTI_THREAD_EIGEN", "false")
# Persistent compile cache: the suite is dominated by jit compiles (the
# fast tier is ~15 min cold, ~4 min warm on one core); keyed on HLO+flags,
# so edits to model code invalidate exactly the affected entries.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.05")

import jax

# The env var alone can be overridden by platform plugins registered from
# sitecustomize; the config update always wins. (Same for the cache vars
# above: sitecustomize imports jax before conftest runs, so they must be
# re-applied through the config.)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
)
# XLA CPU's default fp32 GEMM is reduced precision (bf16-ish); tests compare
# float32 numerics, so force full precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


def _map_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no /proc, nothing to bound
        return 0


@pytest.fixture(autouse=True)
def _bound_jit_mappings():
    """Keep the process under the kernel's vm.max_map_count (65530).

    XLA:CPU JIT-compiles every jitted program through LLVM ORC, which
    allocates ~3 tiny anonymous mappings (code/rodata/data) PER COMPILED
    FUNCTION, and JAX's in-process executable caches retain them for the
    process lifetime. The full suite compiles enough programs to cross
    the default vm.max_map_count, after which mmap fails and XLA
    segfaults (observed deterministically at ~78% of the suite, inside
    persistent-cache executable deserialization). Dropping the caches
    unmaps the JIT regions (measured: 10,102 maps -> 583); re-jit of
    still-live callables is transparent and cheap via the persistent
    compile cache above.
    """
    yield
    if _map_count() > 30_000:
        import gc

        jax.clear_caches()
        gc.collect()


@pytest.fixture(scope="session")
def tokenizer():
    from fish_speech_tpu.tokenizer import build_test_tokenizer

    return build_test_tokenizer()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
