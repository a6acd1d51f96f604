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
    _want = 64 * 1024 * 1024
    if _hard == resource.RLIM_INFINITY or _hard >= _want:
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
except (ValueError, OSError):
    pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
