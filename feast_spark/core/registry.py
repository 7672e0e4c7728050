"""Registry: JSON-file catalog of views + materialization intervals.

Stands in for feast's registry (``sdk/python/feast/infra/registry/``):
object catalog + per-view ``materialization_intervals`` checkpoints
(``feature_view.py:157,482-490,783-789``; ``apply_materialization`` at
``infra/registry/registry.py:1016``). ``materialize_incremental`` resumes
from ``most_recent_end_time`` (``feature_store.py:2546``).

At production scale this would be an Iceberg/Delta metadata table with
snapshot isolation; a JSON file keeps the same contract for the sandbox:
every mutation runs RELOAD -> MODIFY -> atomic-replace under an exclusive
``flock`` on a sidecar lockfile, so concurrent writers (two
``materialize()`` drivers, round-2 finding #5) serialize instead of
clobbering each other's read-modify-write.
"""

from __future__ import annotations

import fcntl
import json
import os
import tempfile
from contextlib import contextmanager
from datetime import datetime


def _iso(dt: datetime) -> str:
    return dt.isoformat()


_EMPTY: dict = {"views": {}, "materialization_intervals": {}, "lineage": []}


class Registry:
    def __init__(self, path: str):
        self.path = path
        self._state: dict = {k: type(v)() for k, v in _EMPTY.items()}
        if os.path.exists(path):
            with open(path) as f:
                self._state = json.load(f)

    @contextmanager
    def _locked(self):
        """Exclusive cross-process lock + reload: mutations observe every
        committed write, including other processes' (lost-update-free)."""
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path + ".lock", "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            try:
                if os.path.exists(self.path):
                    with open(self.path) as f:
                        self._state = json.load(f)
                yield
                self._save()
            finally:
                fcntl.flock(lockf, fcntl.LOCK_UN)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        with os.fdopen(fd, "w") as f:
            json.dump(self._state, f, indent=1, default=str)
        os.replace(tmp, self.path)

    # -- object catalog -----------------------------------------------------
    def apply_view(self, name: str, spec: dict) -> None:
        with self._locked():
            self._state["views"][name] = spec

    def delete_view(self, name: str) -> None:
        with self._locked():
            self._state["views"].pop(name, None)

    def _reload(self) -> None:
        """Reads observe other processes' committed writes (the file is
        replaced atomically, so an unlocked read is always consistent)."""
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._state = json.load(f)

    def get_view(self, name: str) -> dict | None:
        self._reload()
        return self._state["views"].get(name)

    def list_views(self) -> list[str]:
        self._reload()
        return sorted(self._state["views"])

    # -- materialization checkpoints (registry.py:1016) ---------------------
    def apply_materialization(
        self, view: str, start: datetime, end: datetime, run_id: str = ""
    ) -> None:
        with self._locked():
            self._state["materialization_intervals"].setdefault(view, []).append(
                {"start": _iso(start), "end": _iso(end), "run_id": run_id}
            )

    def materialization_intervals(self, view: str) -> list[dict]:
        self._reload()
        return self._state["materialization_intervals"].get(view, [])

    def most_recent_end_time(self, view: str) -> datetime | None:
        """Resume point for materialize_incremental (feature_view.py:795-804)."""
        iv = self.materialization_intervals(view)
        if not iv:
            return None
        return max(datetime.fromisoformat(x["end"]) for x in iv)

    # -- partition-granular lineage (our generalization) ---------------------
    def append_lineage(self, rows: list[dict]) -> None:
        with self._locked():
            self._state["lineage"].extend(rows)

    def completed_partitions(self, run_id: str) -> set[int]:
        self._reload()
        return {
            r["partition_id"]
            for r in self._state["lineage"]
            if r.get("run_id") == run_id
        }
