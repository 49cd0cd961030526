import os

# Force an 8-device virtual CPU mesh for sharding tests, before jax imports.
# (The session environment sets JAX_PLATFORMS=axon — the real TPU tunnel —
# which must not be used by the test suite: it is slow to initialise and
# wedges under concurrent processes.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: the engine's scan-of-steps graphs take tens
# of seconds to compile on CPU the first time; cached runs are seconds.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(123)
