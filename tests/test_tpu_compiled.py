"""Compiled-mode (Mosaic) kernel parity on real TPU hardware.

VERDICT r3 missing #4: interpret-mode tests validate kernel logic, not the
Mosaic lowering.  This test subprocess-runs scripts/tpu_selftest.py with the
TPU tunnel env restored (the CPU-forced conftest stashes it before re-exec)
so all three Pallas kernel families run COMPILED against the XLA oracles.

Marked ``tpu``: excluded from the default quick tier (pytest.ini) — run
with ``pytest -m tpu tests/test_tpu_compiled.py`` on a TPU-attached host,
or directly: ``python scripts/tpu_selftest.py``.  Do NOT run concurrently
with another process using the tunnel (it wedges).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _tunnel_env():
    pool = os.environ.get("IR_SGMCMC_TUNNEL_POOL_IPS",
                          os.environ.get("PALLAS_AXON_POOL_IPS", ""))
    plat = os.environ.get("IR_SGMCMC_TUNNEL_PLATFORMS",
                          os.environ.get("JAX_PLATFORMS", ""))
    if not pool:
        return None
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = pool
    env["JAX_PLATFORMS"] = plat or "axon"
    env.pop("XLA_FLAGS", None)  # no virtual-CPU device forcing on the TPU
    return env


@pytest.mark.tpu
def test_compiled_kernels_match_xla_oracles():
    env = _tunnel_env()
    if env is None:
        pytest.skip("no TPU tunnel env (PALLAS_AXON_POOL_IPS unset)")
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "tpu_selftest.py")],
        cwd=str(REPO), env=env, capture_output=True, text=True, timeout=2400,
    )
    sys.stderr.write(out.stderr[-4000:])
    assert out.returncode in (0, 1), out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result.get("platform") == "tpu", result
    assert result["ok"], f"compiled kernel parity failed: {result['checks']}"
