"""Reusable column-expression builders (intervals, time, vectors, text).

All helpers return `pyspark.sql.Column` objects or SQL fragments that stay
JVM-side (whole-stage codegen); nothing here drops into Python row loops.
"""
