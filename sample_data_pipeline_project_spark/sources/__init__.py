"""Table sources: testdata catalog, ledger Parquet IO, synthetic fixtures."""
