"""Uniform result envelope.

Every reference task returns `{"query_id": ..., <payload>}` where query_id
is Snowflake's `cursor.sfqid` (reference: snowflake_query_client.py:154,200,
245,287,331 — A29), and failures are logged then re-raised wrapped in
`RuntimeError` (snowflake_query_client.py:160-161 et al.). Spark has no
server-side query id for an arbitrary DataFrame, so the engine mints a UUID
per call; empty results map to explicit `None`/empty payloads (A30,
snowflake_tasks.py:200-211).
"""

from __future__ import annotations

import uuid
from collections.abc import Callable
from typing import Any, TypeVar

from sample_data_pipeline_project_spark.log_utils import LogBlock

_T = TypeVar("_T")

_default_log = LogBlock("sdpp_spark.envelope")


def new_query_id() -> str:
    return uuid.uuid4().hex


def run_task(
    op: str,
    fn: Callable[[], _T],
    logger: LogBlock | None = None,
    **context: Any,
) -> _T:
    """Run `fn` inside the reference's lifecycle-logging + error contract:
    log start -> run -> log complete, or log failure and re-raise wrapped in
    RuntimeError (reference: snowflake_tasks.py:97-137 pattern)."""
    log = logger or _default_log
    started = log.log_start(op, **context)
    try:
        result = fn()
    except Exception as exc:  # noqa: BLE001 - uniform contract
        log.log_failure(op, exc, **context)
        raise RuntimeError(f"{op} failed: {exc}") from exc
    log.log_complete(op, started, **context)
    return result
