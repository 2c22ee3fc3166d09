"""table_diff (operators/diff.py): row-fingerprint reconciliation."""

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.diff import table_diff


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_diff_classes(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k int, s string, v double",
    )
    right = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, "", 40.0), (5, "e", 50.0)],
        "k int, s string, v double",
    )
    out = table_diff(left, right, ["k"], ["k", "s", "v"])
    assert _rows(out) == {
        (1, "D"),  # only in left
        (3, "U"),  # value changed
        (4, "U"),  # NULL vs empty string must differ
        (5, "I"),  # only in right
    }  # k=2 unchanged -> absent


def test_diff_identical_is_empty(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k int, s string")
    assert table_diff(df, df, ["k"], ["k", "s"]).count() == 0


def test_diff_composite_key_and_boundary(spark):
    # "ab","c" vs "a","bc" must not collide (separator injectivity)
    left = spark.createDataFrame([(1, 1, "ab", "c")], "k1 int, k2 int, a string, b string")
    right = spark.createDataFrame([(1, 1, "a", "bc")], "k1 int, k2 int, a string, b string")
    out = table_diff(left, right, ["k1", "k2"], ["a", "b"])
    assert _rows(out) == {(1, 1, "U")}


def test_diff_change_volume_projection(spark):
    # output carries only key + change_type (fingerprints never escape)
    df1 = spark.createDataFrame([(1, "x")], "k int, s string")
    df2 = spark.createDataFrame([(1, "y")], "k int, s string")
    out = table_diff(df1, df2, ["k"], ["s"])
    assert out.columns == ["k", "change_type"]
    assert out.filter(F.col("change_type") == "U").count() == 1
