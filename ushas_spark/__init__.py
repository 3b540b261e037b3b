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

__all__ = [
    "get_spark",
    "lineage",
    "load_table",
    "load_tables",
    "materialize",
    "register_views",
    "set_reliable",
]
__version__ = "0.3.0"
