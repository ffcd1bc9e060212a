"""Reserved-internal-tag guard, shared by every operator that stamps
temp columns onto a USER frame and drops them later (join tags, the
CDC collapse's row number, the z-order sort key, the deletion-vector
position keys). Without the guard, a data column named like an
internal tag is silently replaced by the operator's expression and
then dropped from the output — the same failure class twice fixed ad
hoc (_f/_pos → __dv_f/__dv_pos, __zkey); one helper keeps the rule
and its message from drifting across call sites."""

from __future__ import annotations


def reserve_tags(op: str, columns, *tags: str) -> None:
    """Raise when any of ``tags`` collides with ``columns`` (a
    DataFrame's ``.columns`` list or any iterable of names)."""
    clash = sorted(set(tags) & set(columns))
    if clash:
        raise ValueError(
            f"{op}: column(s) {clash} are reserved internal tags — "
            "rename them before calling"
        )
