"""ushas_spark — a PySpark-native analytics engine.

A ground-up rebuild of the query and data-processing capabilities of the
reference engine (frankyu8/ushas, a Spark 2.4.0 fork whose novel feature is
column-level lineage; see /root/repo/SURVEY.md). Architecture is Spark-first:

- Query surface: the PySpark DataFrame / SQL API, verified against a DuckDB
  oracle (SURVEY.md section 5 item 4 -- golden-result strategy).
- Lineage engine: a pure-Python walk of the analyzed logical plan
  (``ushas_spark.lineage``), re-implementing the reference's
  ``catalyst/lineage/Column.scala`` semantics without forking Spark.
- Scale extensions: dedup / similarity-search / text-analysis operators for
  large training-data pipelines (``ushas_spark.operators``).

All heavy lifting stays JVM-side (Catalyst + Tungsten); Python UDFs appear
only where DataFrame ops genuinely cannot express the semantics, and then as
Arrow-batched pandas UDFs.
"""

from ushas_spark.durability import materialize, set_reliable
from ushas_spark.io import load_table, load_tables, register_views
from ushas_spark.lineage import lineage
from ushas_spark.session import get_spark


def __getattr__(name):
    """Lazy top-level access to the flagship operator entry points
    (kept lazy so ``import ushas_spark`` stays cheap)."""
    _OPERATORS = {
        "zorder_by": ("ushas_spark.operators.layout", "zorder_by"),
        "compact_files": ("ushas_spark.operators.layout", "compact_files"),
        "scd2_merge": ("ushas_spark.operators.mergeop", "scd2_merge"),
        "kmeans_assign": ("ushas_spark.operators.clustering", "kmeans_assign"),
        "pagerank": ("ushas_spark.operators.graph", "pagerank"),
        "random_walks": ("ushas_spark.operators.graph", "random_walks"),
        "bpe_train": ("ushas_spark.operators.bpe", "bpe_train"),
    }
    if name in _OPERATORS:
        import importlib

        mod, attr = _OPERATORS[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'ushas_spark' has no attribute {name!r}")


__all__ = [
    "bpe_train",
    "compact_files",
    "get_spark",
    "kmeans_assign",
    "lineage",
    "load_table",
    "load_tables",
    "materialize",
    "pagerank",
    "random_walks",
    "register_views",
    "scd2_merge",
    "set_reliable",
    "zorder_by",
]
__version__ = "0.3.0"
