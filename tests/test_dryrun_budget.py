"""Wall-budget guard for the driver's multi-chip artifact.

Round 2 regressed silently: the enlarged dryrun geometry compiled for
~10.5 min on the 1-core driver host and tripped the driver timeout
(MULTICHIP_r02.json rc=124) because nothing in the suite bounded its wall
time. This test runs `__graft_entry__.dryrun_multichip(8)` exactly the way
the driver does (subprocess, 8 virtual CPU devices) and fails if it
exceeds the budget — warm (persistent compile cache) it runs in ~75 s,
cold in ~230 s; the round-2 regression was 632 s.
"""
import os
import subprocess
import sys
import time

BUDGET_S = 280  # above a cold run (~230 s), far below the 632 s regression

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_within_wall_budget():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        ).strip() + " --xla_force_host_platform_device_count=8"
    ).strip()
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=ROOT, env=env, capture_output=True, text=True,
        timeout=BUDGET_S + 60,
    )
    wall = time.time() - t0
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
    assert wall < BUDGET_S, (
        f"dryrun_multichip(8) took {wall:.0f}s (budget {BUDGET_S}s) — "
        "compile cost regressed; trim the geometry or check the persistent "
        "compile cache (pbe_tpu/utils/cache.py)"
    )
