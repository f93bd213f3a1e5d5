import os

# Tests validate numerics in f64 on CPU with a virtual 8-device mesh for
# sharding tests (the standard JAX way to test multi-chip code without a pod).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-selects jax_platforms="axon,cpu"
# at interpreter start; override back to CPU before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _bound_compiler_state():
    """Drop the jit caches after every test module. With the round-5 test
    volume, accumulated in-process XLA:CPU compiler state deterministically
    segfaulted a LATE large compile (test_trace_chunk's _step_chunked)
    when the whole suite ran in one process; per-module cache clearing
    bounds that state. Costs some recompilation (modules mostly build
    distinct scenes anyway)."""
    yield
    import jax as _jax
    _jax.clear_caches()
