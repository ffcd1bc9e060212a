"""Deterministic single-thread host-speed canary.

Boot-to-boot host-speed drift is real on this rig: round 12 measured
the SAME committed code at 304.9 s on one boot and 410.8 s on the next
(+34.7% with zero code delta). A wall-only budget guard cannot tell
that apart from a plan regression, so every wall measurement we
compare across epochs (the bench sidecar AND each suite-wall record)
carries this canary, and `tools/wall_budget.py` normalizes each
metric by its OWN epoch's canary — measured attribution instead of
judgment calls (r12 ADVICE: the bench canary must not be applied to a
suite wall measured on a different boot).

The probe is sha256 over 256 MiB of a reused buffer, best of 2 —
pure CPU, no I/O, no allocation churn, deterministic work."""

from __future__ import annotations

import hashlib
import time


def machine_canary_sec() -> float:
    buf = b"\xa5" * (64 << 20)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        h = hashlib.sha256()
        for _i in range(4):
            h.update(buf)
        h.hexdigest()
        best = min(best, time.time() - t0)
    return round(best, 3)
