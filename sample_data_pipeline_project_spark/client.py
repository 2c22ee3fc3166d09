"""SparkQueryClient — the engine's query-execution surface.

Re-expresses the reference's `SnowflakeQueryClient`
(`snowflake_utils/snowflake_query_client.py:1-336`) Spark-first. The
reference is a thin remote-SQL client: five execution methods, each doing
USE DATABASE/SCHEMA, a parameterized `cursor.execute`, a fetch shape, and a
`{query_id, ...}` envelope. Here the "server" is the local SparkSession:

  reference method (file:line)                      -> here
  execute_scalar_query (118-161)                    -> execute_scalar_query
  fetch_all_rows_as_dataframe (163-207, Arrow)      -> fetch_all_rows_as_dataframe (.toPandas, Arrow)
  fetch_all_rows_as_tuples (209-252)                -> fetch_all_rows_as_tuples (collect -> tuples)
  execute_dml_query (254-294, cursor.rowcount)      -> execute_dml_query (rows_affected via observed metrics / count)
  execute_control_command (296-336)                 -> execute_control_command
  pyformat %(k)s binds (153 et al., A26)            -> spark.sql(query, args={...}) named-parameter binding
  USE DATABASE/SCHEMA (151-152, A27)                -> use_namespace / session catalog
  lazy connect + reuse (83-116, A28)                -> SparkSession.getOrCreate singleton
  cursor.sfqid (154 et al., A29)                    -> engine-minted UUID per call

Deviations (documented, SURVEY.md §7):
  - Named parameters use `:name` (Spark SQL's native syntax) instead of
    pyformat `%(name)s`; `_to_named_params` accepts both and rewrites
    pyformat markers so reference-style query strings keep working.
  - `rows_affected` for INSERT comes from the post-statement count delta
    when the target is a table the session can observe. UPDATE/DELETE over
    plain parquet go through the engine's copy-on-write API
    (`sources/cow.py`: partition-scoped rewrite + rows_affected), since
    the v2 file format has no in-place mutation.
"""

from __future__ import annotations

import re
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from sample_data_pipeline_project_spark.engine import get_spark, use_namespace
from sample_data_pipeline_project_spark.envelope import new_query_id, run_task
from sample_data_pipeline_project_spark.log_utils import LogBlock

_PYFORMAT = re.compile(r"%\((\w+)\)s")

_INSERT_TARGET = re.compile(
    r"^\s*insert\s+(?:into|overwrite)\s+(?:table\s+)?([\w.`]+)", re.IGNORECASE
)


def _insert_target(query: str) -> str | None:
    """Target table of an INSERT statement, for rows_affected accounting
    (the reference reads cursor.rowcount, snowflake_query_client.py:287;
    Spark file-format commands report nothing, so the engine measures the
    count delta — exact for the single-writer ledger this API serves)."""
    m = _INSERT_TARGET.match(query)
    return m.group(1).strip("`") if m else None


def _to_named_params(query: str) -> str:
    """Rewrite pyformat `%(key)s` markers (the reference's bind style,
    snowflake_query_client.py:153) to Spark's `:key` named markers."""
    return _PYFORMAT.sub(r":\1", query)


class SparkQueryClient:
    """Get-or-create session wrapper with the reference's five execution
    methods. Stateless between calls except the session itself."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        logger: LogBlock | None = None,
    ) -> None:
        self._spark = spark
        self.logger = logger or LogBlock("sdpp_spark.client")

    @property
    def spark(self) -> SparkSession:
        # Lazy connect + reuse-if-open (reference: snowflake_query_client.py:83-116).
        if self._spark is None:
            self._spark = get_spark()
        return self._spark

    # -- shared execution path -------------------------------------------
    def _sql(
        self,
        query: str,
        database: str | None,
        schema: str | None,
        params: dict[str, Any] | None,
    ) -> DataFrame:
        if database:
            use_namespace(self.spark, database, schema)
        text = _to_named_params(query)
        return self.spark.sql(text, args=params) if params else self.spark.sql(text)

    # -- A23 --------------------------------------------------------------
    def execute_scalar_query(
        self,
        query: str,
        database: str | None = None,
        schema: str | None = None,
        params: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """First column of the first row, `None` on empty
        (reference: snowflake_query_client.py:118-161)."""

        def _run() -> dict[str, Any]:
            rows = self._sql(query, database, schema, params).take(1)
            return {
                "query_id": new_query_id(),
                "data": rows[0][0] if rows else None,
            }

        return run_task("execute_scalar_query", _run, self.logger, query=query)

    # -- A24 --------------------------------------------------------------
    def fetch_all_rows_as_dataframe(
        self,
        query: str,
        database: str | None = None,
        schema: str | None = None,
        params: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Full result as a pandas DataFrame via Arrow — the reference's
        `fetch_pandas_all` boundary (snowflake_query_client.py:163-207).
        The Arrow hop happens ONCE, here at the API edge; everything before
        stays a lazy Spark plan."""

        def _run() -> dict[str, Any]:
            pdf: pd.DataFrame = self._sql(query, database, schema, params).toPandas()
            return {"query_id": new_query_id(), "data": pdf}

        return run_task("fetch_all_rows_as_dataframe", _run, self.logger, query=query)

    # -- A25 --------------------------------------------------------------
    def fetch_all_rows_as_tuples(
        self,
        query: str,
        database: str | None = None,
        schema: str | None = None,
        params: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Full result as a list of plain tuples
        (reference: snowflake_query_client.py:209-252)."""

        def _run() -> dict[str, Any]:
            rows = self._sql(query, database, schema, params).collect()
            return {"query_id": new_query_id(), "data": [tuple(r) for r in rows]}

        return run_task("fetch_all_rows_as_tuples", _run, self.logger, query=query)

    # -- A21 --------------------------------------------------------------
    def execute_dml_query(
        self,
        query: str,
        database: str | None = None,
        schema: str | None = None,
        params: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """DML with affected-rowcount (reference:
        snowflake_query_client.py:254-294 via cursor.rowcount). Spark's SQL
        commands return a (possibly empty) result DataFrame; `num_affected_
        rows` is surfaced for v2-format tables, else we fall back to the
        command result's own row count."""

        def _run() -> dict[str, Any]:
            target = _insert_target(query)
            before = self.spark.table(target).count() if target else None
            result = self._sql(query, database, schema, params)
            rows = result.collect()
            if rows and "num_affected_rows" in result.columns:
                affected = int(rows[0]["num_affected_rows"])
            elif target is not None:
                after = self.spark.table(target).count()
                # INSERT OVERWRITE replaces the table; INSERT INTO appends.
                is_overwrite = re.search(
                    r"^\s*insert\s+overwrite", query, re.IGNORECASE
                )
                affected = after if is_overwrite else after - before
            else:
                affected = len(rows) if rows else -1
            return {"query_id": new_query_id(), "rows_affected": affected}

        return run_task("execute_dml_query", _run, self.logger, query=query)

    # -- A22 --------------------------------------------------------------
    def execute_control_command(
        self,
        query: str,
        database: str | None = None,
        schema: str | None = None,
        params: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Utility statement, no rows expected (reference:
        snowflake_query_client.py:296-336)."""

        def _run() -> dict[str, Any]:
            self._sql(query, database, schema, params).collect()
            return {"query_id": new_query_id()}

        return run_task("execute_control_command", _run, self.logger, query=query)
