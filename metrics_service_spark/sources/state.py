"""Application K/V state (SURVEY.md F22 / db_metadata table).

Reference: arbitrary pickled values in Postgres `db_metadata`
(00-metrics-tables.sql:84-87; metricsdatabase.py:199-274
setMetadataValue/getMetadataValue) — pickle ties state to the Python
process that wrote it.

Engine replacement: JSON state document per namespace, written
atomically (tmp + rename).  JSON, not pickle: language-neutral,
diffable, and safe to read from any job.  Streaming queries keep their
own offsets in Spark checkpoints; this store is for job-level facts
(last processed date, report cursors — the reference's usage).
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path
from typing import Any


class JsonState:
    """get/set/delete on a single JSON file; atomic replace on save."""

    def __init__(self, path: str):
        self.path = Path(path)

    def _load(self) -> dict[str, Any]:
        if not self.path.exists():
            return {}
        return json.loads(self.path.read_text() or "{}")

    def get(self, key: str, default: Any = None) -> Any:
        return self._load().get(key, default)

    def set(self, key: str, value: Any) -> None:
        data = self._load()
        data[key] = value
        self._save(data)

    def delete(self, key: str) -> None:
        data = self._load()
        data.pop(key, None)
        self._save(data)

    def all(self) -> dict[str, Any]:
        return self._load()

    def _save(self, data: dict[str, Any]) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            dir=str(self.path.parent), prefix=self.path.name, suffix=".tmp"
        )
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(data, fh, sort_keys=True, indent=1)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
