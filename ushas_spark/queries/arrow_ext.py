"""Arrow-native UDTF coverage (Spark 4.1 `arrow_udtf`).

Kept in its own module WITHOUT `from __future__ import annotations`:
the arrow decorators dispatch on the eval signature's REAL pyarrow type
hints (pa.RecordBatch vs pa.Array), which postponed evaluation would
stringify into unresolvable 'pa.RecordBatch' literals.
"""

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ushas_spark.io import load_table
from ushas_spark.registry import query

_ARROW_UDTF_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_x100
FROM orders
WHERE o_orderkey <= 2000
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("udf_arrow_udtf", oracle=_ARROW_UDTF_ORACLE)
def udf_arrow_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-NATIVE table function (Spark 4.1 @arrow_udtf) consuming a
    TABLE argument as pyarrow RecordBatches and yielding pyarrow
    Tables -- true vectorized Python table functions, no per-row and
    no pandas hop (the @udtf analog is udf_python_udtf). The function
    emits per-batch partial (status, n, sum_x100) rollups; the outer
    DataFrame aggregation combines the partials, so the whole thing
    stays map-side-combinable and the result gates exactly."""
    from pyspark.sql.functions import arrow_udtf

    @arrow_udtf(returnType="o_orderstatus string, n bigint, sum_x100 bigint")
    class PartialRollup:
        def eval(self, batch: pa.RecordBatch):
            tbl = pa.table(
                {
                    "o_orderstatus": batch.column("o_orderstatus"),
                    "price_x100": pc.cast(
                        pc.round(
                            pc.multiply(batch.column("o_totalprice"), 100.0)
                        ),
                        pa.int64(),
                    ),
                }
            )
            grouped = tbl.group_by("o_orderstatus").aggregate(
                [("price_x100", "count"), ("price_x100", "sum")]
            )
            yield pa.table(
                {
                    "o_orderstatus": grouped.column("o_orderstatus"),
                    "n": grouped.column("price_x100_count"),
                    "sum_x100": grouped.column("price_x100_sum"),
                }
            )

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderstatus", "o_totalprice")
    )
    partials = PartialRollup(o.asTable())
    return (
        partials.groupBy("o_orderstatus")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_x100").alias("total_x100"),
        )
        .orderBy("o_orderstatus")
    )
