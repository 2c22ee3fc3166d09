"""Pipeline-run ledger: the reference's core domain, re-expressed Spark-first.

`tasks.py`  — the six task functions (A8, A11 x2, A13, A14, A15) plus DDL
`derive.py` — deterministic ledger view derived from the `events` testdata
              table, with a matching ANSI-SQL CTE for the DuckDB oracle.
"""
