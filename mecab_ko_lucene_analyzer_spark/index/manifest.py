"""Build manifest: per-stage checkpoints, lineage and counters (I6).

The reference tracks per-run counters in its bulk indexer
(``DanawaBulkTextIndexer.java:90-113``: docs indexed, flush batches) and
relies on ES for idempotence. Here every build stage is a checkpointed
unit: a stage whose output parquet carries a ``_SUCCESS`` marker AND a
matching manifest entry (same config fingerprint) is skipped on rerun —
docIDs are deterministic (I1), so a resumed build produces byte-
identical tables. Counters are exact row counts read back from the
written parquet footers (metadata-only scans).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

__all__ = ["BuildManifest"]

MANIFEST_NAME = "manifest.json"


@dataclass
class BuildManifest:
    base_path: str
    config: dict[str, Any] = field(default_factory=dict)
    stages: dict[str, dict] = field(default_factory=dict)

    @property
    def path(self) -> str:
        return os.path.join(self.base_path, MANIFEST_NAME)

    @classmethod
    def load_or_create(cls, base_path: str, config: dict[str, Any]) -> "BuildManifest":
        m = cls(base_path=base_path, config=config)
        p = os.path.join(base_path, MANIFEST_NAME)
        if os.path.exists(p):
            with open(p) as f:
                data = json.load(f)
            if data.get("config") == config:
                m.stages = data.get("stages", {})
            # config changed → stale stages are not reusable
        return m

    def stage_complete(self, name: str) -> bool:
        st = self.stages.get(name)
        if not st or st.get("status") != "complete":
            return False
        out = st.get("output")
        if out and not os.path.exists(os.path.join(out, "_SUCCESS")):
            return False
        return True

    def record(self, name: str, output: str | None, counters: dict[str, Any], seconds: float) -> None:
        self.stages[name] = {
            "status": "complete",
            "output": output,
            "counters": counters,
            "seconds": round(seconds, 3),
        }
        self.save()

    def save(self) -> None:
        os.makedirs(self.base_path, exist_ok=True)
        with open(self.path, "w") as f:
            json.dump({"config": self.config, "stages": self.stages}, f, indent=2)


def run_stage(manifest: BuildManifest, name: str, output: str | None, fn) -> bool:
    """Run ``fn()`` unless the stage is already checkpointed. Returns
    True if the stage executed, False if skipped (resume)."""
    if manifest.stage_complete(name):
        return False
    t0 = time.perf_counter()
    counters = fn() or {}
    manifest.record(name, output, counters, time.perf_counter() - t0)
    return True
