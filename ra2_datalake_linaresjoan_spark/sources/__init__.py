"""Sources & sinks (SURVEY.md §2.1 S1-S12)."""

from ra2_datalake_linaresjoan_spark.sources.readers import load_tables, read_table

__all__ = ["load_tables", "read_table"]
