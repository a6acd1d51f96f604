"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference CI's approach of exercising device code paths without
device hardware (the reference compile-tests its GPU backends; we actually
*run* the sharded paths on fake devices).
"""

import os
import resource

# XLA's CPU compiler can blow the default 8 MB stack on worker threads
# when compiling large nested-while programs (observed as segfaults in
# backend_compile); raise the soft limit for threads spawned after this
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    # raise the soft limit as far as the hard limit allows (observed:
    # 64 MB still segfaulted on some finalize-program compiles)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ValueError, OSError):
    _want = 64 * 1024 * 1024
    try:
        if _hard == resource.RLIM_INFINITY or _hard >= _want:
            resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
    except (ValueError, OSError):
        pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Keep the test run's compilation cache OUT of the user-level persistent
# cache (~/.cache/scs_tpu/jax_cache): CPU-test entries would pollute it,
# and a corrupted entry there (e.g. from an interrupted concurrent
# writer) segfaults jax's cache deserializer — a crash that would
# otherwise take down the whole test session.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join("/tmp", "scs_tpu_test_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_programs():
    """Free compiled executables between test modules.

    XLA's CPU compiler segfaults after a few hundred compilations in one
    process on this box (crash point moves with test order; always inside
    backend_compile). Releasing executables + tracing caches between
    modules keeps the compiler's cumulative state bounded.
    """
    yield
    jax.clear_caches()
    gc.collect()


_TESTS_SINCE_CLEAR = [0]


@pytest.fixture(autouse=True)
def _bound_compiler_state():
    """Clear caches every N tests WITHIN a module too.

    The between-module clear above is not enough for the largest modules
    (test_solve: observed a deterministic XLA CPU segfault in
    backend_compile at the ~67th test of a combined run, reproducible
    with stack rlimit raised to the hard max — the crash tracks
    cumulative compiled-program count, not any single test)."""
    yield
    _TESTS_SINCE_CLEAR[0] += 1
    if _TESTS_SINCE_CLEAR[0] >= 40:
        _TESTS_SINCE_CLEAR[0] = 0
        jax.clear_caches()
        gc.collect()
