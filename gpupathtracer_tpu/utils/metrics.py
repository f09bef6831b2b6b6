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


# Process-level runtime observability (VERDICT r4 item 8): silent auto-
# degradations (traced-scene sort/narrowing fallbacks, bench detail-write
# failures) emit here so they are visible in JSONL instead of only as a
# perf mystery. Events land in an in-memory tail (tests/inspection) and,
# when FIREFLY_METRICS names a file, in that JSONL stream too.
RUNTIME_EVENTS: list = []
_MAX_RUNTIME_EVENTS = 256
_ONCE_KEYS: set = set()


def log_runtime_event(record: dict, once_key: str | None = None) -> None:
    """Emit a runtime observability event.

    ``once_key`` dedupes per process — auto-fallback notices fire once per
    distinct cause, not once per trace.
    """
    if once_key is not None:
        if once_key in _ONCE_KEYS:
            return
        _ONCE_KEYS.add(once_key)
    record = {"ts": round(time.time(), 3), **record}
    RUNTIME_EVENTS.append(record)
    del RUNTIME_EVENTS[:-_MAX_RUNTIME_EVENTS]
    path = os.environ.get("FIREFLY_METRICS")
    if path:
        try:
            log_event(path, record)
        except OSError:
            pass


def read_events(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
