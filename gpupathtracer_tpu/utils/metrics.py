"""Structured metrics / logging (SURVEY.md §5 observability).

JSONL event stream (one dict per line) for the benchmark harness and
progressive renders; host-0 gated on multi-host runs. Replaces the
reference's ad-hoc printf/cout logging (kernel.cu:168-172 etc.)."""

from __future__ import annotations

import json
import os
import time


def is_host0() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def log_event(path: str, record: dict) -> None:
    if not is_host0():
        return
    record = {"ts": round(time.time(), 3), **record}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def read_events(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
