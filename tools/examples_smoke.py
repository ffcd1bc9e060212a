"""Smoke gate for every script under examples/: each runs at sf0.001
from a FOREIGN cwd (a temp dir, not the checkout) in its own
subprocess, and must exit 0. One command proves all seven demos are
runnable by a user who cloned the repo anywhere — the portability
property the r13 close fixed (`__file__`-derived repo roots, commit
8dd2bf6) but only spot-checked on one script. Wired into the
pre-driver checklist (README / memory workflow).

    python tools/examples_smoke.py [sf_dir]

Exit 0 iff every example exits 0. Each example gets its own temp
workdir; examples that take an sf_dir get sf0.001 so the whole gate
runs in a few minutes on local[8].
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES_DIR = os.path.join(REPO, "examples")

# argv contract per script (see each script's docstring):
#   sf_first  → [sf_dir, workdir]
#   work_only → [workdir]
_ARG_SHAPE = {
    "run_ann_search.py": "sf_first",
    "run_cdc_mirror.py": "sf_first",
    "run_compliance_pipeline.py": "sf_first",
    "run_corpus_pipeline.py": "sf_first",
    "run_incremental_dedup.py": "sf_first",
    "run_cooling.py": "work_only",
    "run_schema_lifecycle.py": "work_only",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    scripts = sorted(
        f for f in os.listdir(EXAMPLES_DIR) if f.endswith(".py")
    )
    unknown = [s for s in scripts if s not in _ARG_SHAPE]
    if unknown:
        # a new example must declare its argv shape here, so the gate
        # can never silently skip it
        print(f"FAIL  unknown example(s) not in _ARG_SHAPE: {unknown}")
        return 1

    env = dict(os.environ)
    # keep each subprocess small and fast; examples build their own
    # sessions via build_session(), which honors these
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    foreign_cwd = tempfile.mkdtemp(prefix="examples_smoke_cwd_")
    failures = []
    for name in scripts:
        workdir = tempfile.mkdtemp(prefix=f"smoke_{name[:-3]}_")
        args = [sys.executable, os.path.join(EXAMPLES_DIR, name)]
        if _ARG_SHAPE[name] == "sf_first":
            args += [sf_dir, workdir]
        else:
            args += [workdir]
        t0 = time.time()
        proc = subprocess.run(
            args,
            cwd=foreign_cwd,  # NOT the checkout: pins path portability
            env=env,
            capture_output=True,
            text=True,
            timeout=900,
        )
        dt = time.time() - t0
        status = "PASS" if proc.returncode == 0 else "FAIL"
        print(f"{status}  {name:32s} [{dt:5.1f}s]")
        if proc.returncode != 0:
            failures.append(name)
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-15:]
            for line in tail:
                print(f"      {line}")
    print(f"{len(failures)} failure(s) of {len(scripts)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
