"""Pytest face of the physical-plan audit.

`tools/plan_audit.py` pins the plan SHAPE of scale-sensitive queries
(broadcast vs nested-loop, partial aggregation, pruned ReadSchema,
in-plan stack unpivot, …). Those invariants are invisible to the value
gates: round 8 shipped a value-correct change that silently broke the
pinned `table_profile` plan because only selfcheck and pytest ran.
Running the audit inside the suite (~50 s, one subprocess session)
makes that class of regression impossible to miss.
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plan_audit_all_green():
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "plan_audit.py")],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"plan audit failed:\n{tail}"
    assert "0 failed check(s)" in proc.stdout, tail
