"""Persistent pipeline watermark — the reference's Airflow Variable
``EXP_DATE`` (yq_dag.py:13-14,31-33): a manually-advanced low
watermark marking the start of the next unexported window, moved
forward only after a successful reconcile.

A single JSON file gives the same at-least-once contract as the
Variable (the pipeline is idempotent per window thanks to dynamic
partition overwrite, so replaying an already-advanced window is
harmless — exactly the reference's crash-recovery story)."""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import tempfile
from dataclasses import dataclass
from datetime import datetime


class PipelineBusyError(RuntimeError):
    """A second concurrent run attempted to take the pipeline lock."""


@dataclass
class PipelineState:
    path: str

    @contextlib.contextmanager
    def lock(self):
        """``max_active_runs=1`` (yq_dag.py:50) as an OS-level lock:
        at most one pipeline run per state file, non-blocking — a
        second runner fails fast instead of double-processing the
        window."""
        lock_path = self.path + ".lock"
        os.makedirs(os.path.dirname(lock_path) or ".", exist_ok=True)
        fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
        try:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except BlockingIOError:
                raise PipelineBusyError(
                    f"another pipeline run holds {lock_path}"
                ) from None
            yield
        finally:
            os.close(fd)  # releases the flock

    def get_watermark(self, default: str) -> datetime:
        """Read EXP_DATE; ``default`` is 'YYYY-MM-DD' (the reference
        seeds the Variable manually, README_en.md walkthrough)."""
        if os.path.exists(self.path):
            with open(self.path) as f:
                return datetime.strptime(json.load(f)["exp_date"], "%Y-%m-%d")
        return datetime.strptime(default, "%Y-%m-%d")

    def set_watermark(self, value: datetime) -> None:
        """Advance EXP_DATE (yq_dag.py:31-33) — atomic rename so a
        crash mid-write never corrupts the watermark."""
        d = os.path.dirname(self.path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d)
        with os.fdopen(fd, "w") as f:
            json.dump({"exp_date": value.strftime("%Y-%m-%d")}, f)
        os.replace(tmp, self.path)
