"""Config load/save (reference: src/phenoqc/configuration.py:5-50).

YAML or JSON by extension; returns a plain dict used to build the
TermResolver, imputation config, and quality-metric toggles.  Driver-side
only (job parameters, never shipped to executors except via broadcast).
"""

from __future__ import annotations

import json
import os


def load_config(path: str) -> dict:
    ext = os.path.splitext(path)[1].lower()
    if ext not in (".yaml", ".yml", ".json"):
        raise ValueError(f"Unsupported config format: {ext} (use .yaml/.yml/.json)")
    with open(path, "r", encoding="utf-8") as fh:
        if ext in (".yaml", ".yml"):
            import yaml

            return yaml.safe_load(fh) or {}
        return json.load(fh)


def save_config(config: dict, path: str) -> None:
    ext = os.path.splitext(path)[1].lower()
    with open(path, "w", encoding="utf-8") as fh:
        if ext in (".yaml", ".yml"):
            import yaml

            yaml.safe_dump(config, fh)
        elif ext == ".json":
            json.dump(config, fh, indent=2)
        else:
            raise ValueError(f"Unsupported config format: {ext}")
