import os
import sys

# Force an 8-device virtual CPU mesh for sharding tests.  (The session
# environment sets JAX_PLATFORMS=axon — the real TPU tunnel — which must
# not be used by the test suite: it is slow to initialise and wedges under
# concurrent processes.)  When PALLAS_AXON_POOL_IPS is set, the axon
# sitecustomize has ALREADY imported jax and registered the TPU backend at
# interpreter start — env changes here come too late — so re-exec pytest
# with the tunnel disabled.  The exec happens in pytest_configure (not at
# import) so global output capture can be released first: pytest has
# already pointed fd 1/2 at capture temp files by the time any conftest
# loads, and an exec'd child would write its entire report into them.
_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


def pytest_configure(config):
    if not _REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    # stash the tunnel env so tests/test_tpu_compiled.py can restore it in a
    # subprocess (the compiled-Mosaic selftest needs the real TPU)
    env["IR_SGMCMC_TUNNEL_POOL_IPS"] = env.get("PALLAS_AXON_POOL_IPS", "")
    env["IR_SGMCMC_TUNNEL_PLATFORMS"] = env.get("JAX_PLATFORMS", "")
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


if not _REEXEC:
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
