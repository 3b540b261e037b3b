"""Query-surface conformance modules (SURVEY.md section 2 inventory).

Each module registers named queries plus DuckDB oracle SQL via
``ushas_spark.registry.query``. The queries double as the engine's
documentation of idiomatic, scale-conscious PySpark patterns.
"""
