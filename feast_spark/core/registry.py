"""Registry: JSON-file catalog of views + materialization intervals.

Stands in for feast's registry (``sdk/python/feast/infra/registry/``):
object catalog + per-view ``materialization_intervals`` checkpoints
(``feature_view.py:157,482-490,783-789``; ``apply_materialization`` at
``infra/registry/registry.py:1016``). ``materialize_incremental`` resumes
from ``most_recent_end_time`` (``feature_store.py:2546``).

At production scale this would be an Iceberg/Delta metadata table with
snapshot isolation; a JSON file keeps the same contract for the sandbox
(atomic replace via os.replace).
"""

from __future__ import annotations

import json
import os
import tempfile
from datetime import datetime


def _iso(dt: datetime) -> str:
    return dt.isoformat()


class Registry:
    def __init__(self, path: str):
        self.path = path
        self._state: dict = {"views": {}, "materialization_intervals": {}, "lineage": []}
        if os.path.exists(path):
            with open(path) as f:
                self._state = json.load(f)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(self._state, f, indent=1, default=str)
        os.replace(tmp, self.path)

    # -- object catalog -----------------------------------------------------
    def apply_view(self, name: str, spec: dict) -> None:
        self._state["views"][name] = spec
        self._save()

    def get_view(self, name: str) -> dict | None:
        return self._state["views"].get(name)

    def list_views(self) -> list[str]:
        return sorted(self._state["views"])

    # -- materialization checkpoints (registry.py:1016) ---------------------
    def apply_materialization(
        self, view: str, start: datetime, end: datetime, run_id: str = ""
    ) -> None:
        self._state["materialization_intervals"].setdefault(view, []).append(
            {"start": _iso(start), "end": _iso(end), "run_id": run_id}
        )
        self._save()

    def materialization_intervals(self, view: str) -> list[dict]:
        return self._state["materialization_intervals"].get(view, [])

    def most_recent_end_time(self, view: str) -> datetime | None:
        """Resume point for materialize_incremental (feature_view.py:795-804)."""
        iv = self.materialization_intervals(view)
        if not iv:
            return None
        return max(datetime.fromisoformat(x["end"]) for x in iv)

    # -- partition-granular lineage (our generalization) ---------------------
    def append_lineage(self, rows: list[dict]) -> None:
        self._state["lineage"].extend(rows)
        self._save()

    def completed_partitions(self, run_id: str) -> set[int]:
        return {
            r["partition_id"]
            for r in self._state["lineage"]
            if r.get("run_id") == run_id
        }
