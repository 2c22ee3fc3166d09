"""SparkQueryClient contract tests (reference client surface A21-A27)."""

from __future__ import annotations

import pandas as pd
import pytest

from sample_data_pipeline_project_spark.client import SparkQueryClient, _to_named_params


@pytest.fixture(scope="module")
def client(spark, ledger):
    ledger.createOrReplaceTempView("pipeline_runs")
    return SparkQueryClient(spark)


def test_pyformat_rewrite():
    q = "SELECT * FROM t WHERE a = %(x)s AND b = %(y_2)s AND c = ':kept'"
    assert _to_named_params(q) == "SELECT * FROM t WHERE a = :x AND b = :y_2 AND c = ':kept'"


def test_scalar_query(client):
    out = client.execute_scalar_query(
        "SELECT COUNT(*) FROM pipeline_runs WHERE pipeline_status = %(status)s",
        params={"status": "completed"},
    )
    assert set(out) == {"query_id", "data"}
    assert out["data"] == 10


def test_scalar_empty_is_none(client):
    out = client.execute_scalar_query(
        "SELECT run_id FROM pipeline_runs WHERE pipeline_name = 'missing'"
    )
    assert out["data"] is None


def test_fetch_dataframe(client):
    out = client.fetch_all_rows_as_dataframe(
        "SELECT run_id, pipeline_status FROM pipeline_runs "
        "WHERE pipeline_name = :p ORDER BY run_id",
        params={"p": "rep"},
    )
    df = out["data"]
    assert isinstance(df, pd.DataFrame)
    assert list(df["run_id"]) == [13, 14, 15, 16, 17]


def test_fetch_tuples(client):
    out = client.fetch_all_rows_as_tuples(
        "SELECT run_id FROM pipeline_runs WHERE run_id <= :n ORDER BY run_id",
        params={"n": 3},
    )
    assert out["data"] == [(1,), (2,), (3,)]


def test_control_and_dml_roundtrip(client, spark, tmp_path):
    client.execute_control_command(
        f"CREATE TABLE IF NOT EXISTS runs_copy USING parquet "
        f"LOCATION '{tmp_path}/runs_copy' AS SELECT * FROM pipeline_runs LIMIT 0"
    )
    out = client.execute_dml_query(
        "INSERT INTO runs_copy SELECT * FROM pipeline_runs WHERE pipeline_name = 'etl'"
    )
    assert set(out) == {"query_id", "rows_affected"}
    assert out["rows_affected"] == 12
    assert spark.table("runs_copy").count() == 12
    spark.sql("DROP TABLE runs_copy")


def test_errors_wrapped_as_runtime_error(client):
    with pytest.raises(RuntimeError, match="execute_scalar_query failed"):
        client.execute_scalar_query("SELECT * FROM no_such_table_xyz")
