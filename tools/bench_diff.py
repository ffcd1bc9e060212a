"""Diff two bench records on plan STRUCTURE first, wall time second.

This sandbox shows 2-5x CPU jitter, so a wall-time delta alone is not
a regression signal; a new exchange or a shuffle-bytes jump is. This
tool encodes that triage: structure changes are reported as REAL,
wall-only swings as JITTER?.

Accepts either the full sidecar (``bench_structure.json``, has
"structure") or a driver ``BENCH_r{N}.json`` / compact stdout line
(timings only).

Usage: python tools/bench_diff.py OLD.json NEW.json [--wall-factor 2.0]
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    # driver BENCH_r{N}.json wraps the bench stdout in {"tail": "..."}
    # holding only the LAST few KB — find the first "{" from which the
    # remainder parses (a truncated tail has no such point)
    try:
        rec = json.loads(text)
    except json.JSONDecodeError:
        rec = None
    if isinstance(rec, dict) and "tail" in rec and "queries" not in rec:
        tail = rec["tail"]
        pos = tail.find("{")
        while pos != -1:
            try:
                return json.loads(tail[pos:])
            except json.JSONDecodeError:
                pos = tail.find("{", pos + 1)
        raise SystemExit(
            f"{path}: driver tail is truncated mid-JSON — diff against "
            "the bench_structure.json sidecar of that round instead"
        )
    if isinstance(rec, dict):
        return rec
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return json.loads(text)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        return 2
    wall_factor = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--wall-factor"):
            wall_factor = float(a.split("=", 1)[1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    os_, ns = old.get("structure", {}), new.get("structure", {})

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    real, jitter = [], []
    for name in sorted(set(oq) & set(nq)):
        ot, nt = oq[name], nq[name]
        so, sn = os_.get(name), ns.get(name)
        struct_msgs = []
        if so and sn:
            if so["stages"] != sn["stages"]:
                struct_msgs.append(f"stages {so['stages']}→{sn['stages']}")
            for k, label in (
                ("shuffle_write_bytes", "shuf_w"),
                ("shuffle_read_bytes", "shuf_r"),
            ):
                a, b = so.get(k, 0), sn.get(k, 0)
                if max(a, b) > 1 << 20 and (
                    a == 0 or b == 0 or max(a, b) / max(min(a, b), 1) > 1.2
                ):
                    struct_msgs.append(f"{label} {a}→{b}")
        slow = ot > 0.2 and nt > 0.2 and max(ot, nt) / min(ot, nt) > wall_factor
        if struct_msgs:
            real.append(f"  {name}: {'; '.join(struct_msgs)} (wall {ot}s→{nt}s)")
        elif slow:
            jitter.append(f"  {name}: wall {ot}s→{nt}s, structure unchanged")

    print(f"\ntotal wall: {old.get('value')}s → {new.get('value')}s")
    print(f"\nREAL (plan structure changed): {len(real)}")
    print("\n".join(real) if real else "  none")
    print(f"\nJITTER? (wall >{wall_factor}x moved, structure flat): {len(jitter)}")
    print("\n".join(jitter) if jitter else "  none")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
