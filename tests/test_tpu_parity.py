"""On-chip fused-kernel parity (opt-in: the suite itself is pinned to
CPU by conftest, so the real-TPU check runs in a SUBPROCESS with the
session's TPU env restored).

Enable with FGNN_TPU_PARITY=1; the verify-skill/bench flow can instead
run ``python benchmarks/tpu_parity_check.py`` directly.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("FGNN_TPU_PARITY") != "1",
                    reason="set FGNN_TPU_PARITY=1 (needs the TPU tunnel; "
                           "adds minutes of remote compiles)")
def test_on_chip_fused_parity():
    env = dict(os.environ)
    # undo the conftest CPU pin for the child; the session default
    # (axon sitecustomize) then claims the real chip
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks",
                                      "tpu_parity_check.py")],
        env=env, capture_output=True, text=True, timeout=1200)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no output; stderr tail: {out.stderr[-500:]}"
    summary = json.loads(lines[-1])
    if "skipped" in summary:
        pytest.skip(f"no TPU: {summary}")
    assert summary["all_ok"], "\n".join(lines)
