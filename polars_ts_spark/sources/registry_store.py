"""Model registry + experiment tracking (SURVEY §2.1).

Reference parity:
- ModelRegistry -> polars_ts/registry/registry.py:16 (save/load fitted
  models to a directory: pickle + json metadata)
- Experiment    -> polars_ts/registry/experiment.py:14-47 (named runs
  with params + metrics, json-per-run)

Same file-based layout; works against any shared filesystem path (on
a cluster: a mounted volume or object-store fuse mount).
"""

from __future__ import annotations

import json
import pickle
import time
from pathlib import Path
from typing import Any


class ModelRegistry:
    """Directory of versioned pickled models with json metadata."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def save(self, name: str, model: Any, metadata: dict | None = None) -> int:
        versions = self.versions(name)
        v = (max(versions) + 1) if versions else 1
        d = self.root / name / f"v{v}"
        d.mkdir(parents=True, exist_ok=True)
        with open(d / "model.pkl", "wb") as f:
            pickle.dump(model, f)
        meta = dict(metadata or {})
        meta.setdefault("saved_at", time.strftime("%Y-%m-%dT%H:%M:%S"))
        meta["version"] = v
        (d / "meta.json").write_text(json.dumps(meta, indent=2, default=str))
        return v

    def load(self, name: str, version: int | None = None) -> Any:
        v = version or max(self.versions(name))
        with open(self.root / name / f"v{v}" / "model.pkl", "rb") as f:
            return pickle.load(f)

    def metadata(self, name: str, version: int | None = None) -> dict:
        v = version or max(self.versions(name))
        return json.loads((self.root / name / f"v{v}" / "meta.json").read_text())

    def versions(self, name: str) -> list[int]:
        d = self.root / name
        if not d.exists():
            return []
        return sorted(int(p.name[1:]) for p in d.iterdir() if p.name.startswith("v"))

    def list_models(self) -> list[str]:
        return sorted(p.name for p in self.root.iterdir() if p.is_dir())


class Experiment:
    """Named experiment: log_run(params, metrics) -> json rows;
    best_run(metric) retrieves the winner."""

    def __init__(self, root: str | Path, name: str):
        self.dir = Path(root) / name
        self.dir.mkdir(parents=True, exist_ok=True)

    def log_run(self, params: dict, metrics: dict[str, float], tag: str | None = None) -> str:
        run_id = f"run_{len(self.runs()):04d}"
        payload = {
            "run_id": run_id,
            "tag": tag,
            "params": params,
            "metrics": metrics,
            "logged_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        (self.dir / f"{run_id}.json").write_text(json.dumps(payload, indent=2, default=str))
        return run_id

    def runs(self) -> list[dict]:
        return [
            json.loads(p.read_text())
            for p in sorted(self.dir.glob("run_*.json"))
        ]

    def best_run(self, metric: str, mode: str = "min") -> dict:
        runs = [r for r in self.runs() if metric in r["metrics"]]
        key = lambda r: r["metrics"][metric]  # noqa: E731
        return min(runs, key=key) if mode == "min" else max(runs, key=key)
