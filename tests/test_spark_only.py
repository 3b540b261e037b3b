"""Pin Spark-only functions (no DuckDB twin) with golden values.

These cover the rows-only batteries: values are deterministic within
Spark, so regressions are caught without a cross-engine oracle.
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_spark_only_battery_deterministic(spark, sf_dir):
    q = entrymod.queries()["expr_spark_only_battery"]
    a = q(spark, sf_dir).collect()
    b = q(spark, sf_dir).collect()
    assert a == b
    assert len(a) > 0


def test_spark_only_golden_literals(spark):
    """Hand-checked golden values for functions with no oracle."""
    row = spark.sql(
        """
        SELECT soundex('Robert') AS sdx,
               initcap('hello world') AS icap,
               crc32(cast('abc' AS BINARY)) AS crc,
               sha1(cast('abc' AS BINARY)) AS sha,
               hex(255) AS hx,
               conv('255', 10, 16) AS cv,
               base64(cast('abc' AS BINARY)) AS b64,
               months_between(timestamp'1997-02-28 10:30:00',
                              timestamp'1996-10-30') AS mb,
               date_format(next_day(date'2015-01-14', 'TU'),
                           'yyyy-MM-dd') AS nd,
               format_string('%05d', 42) AS fmt
        """
    ).collect()[0]
    assert row.sdx == "R163"
    assert row.icap == "Hello World"
    assert row.crc == 891568578
    assert row.sha == "a9993e364706816aba3e25717850c26c9cd0d89d"
    assert row.hx == "FF"
    assert row.cv == "FF"
    assert row.b64 == "YWJj"
    assert abs(row.mb - 3.94959677) < 1e-6
    assert row.nd == "2015-01-20"
    assert row.fmt == "00042"


def test_xpath_url_golden(spark):
    """Golden values for the xpath/URL battery (no DuckDB twin)."""
    row = spark.sql(
        """
        SELECT xpath_string('<a><b>hi</b></a>', '//b') AS xs,
               xpath_long('<a><n>7</n></a>', '//n') AS xl,
               xpath('<a><b>1</b><b>2</b></a>', '//b/text()') AS xall,
               parse_url('https://h.example/p/q?id=42', 'HOST') AS host,
               parse_url('https://h.example/p/q?id=42', 'PATH') AS path,
               parse_url('https://h.example/p/q?id=42', 'QUERY', 'id') AS qid,
               url_encode('a b&c') AS enc,
               url_decode('a%20b%26c') AS dec
        """
    ).collect()[0]
    assert row.xs == "hi"
    assert row.xl == 7
    assert row.xall == ["1", "2"]
    assert row.host == "h.example"
    assert row.path == "/p/q"
    assert row.qid == "42"
    assert row.enc == "a+b%26c"
    assert row.dec == "a b&c"


def test_xpath_url_battery_query_shape(spark, sf_dir):
    """The REGISTERED query's output must be driver-canonicalizer safe.

    r09's only-ever red driver row: the raw ``xpath()`` array<string>
    column crashed the gate's pandas canonicalization. The query now
    serializes it via array_join -- pin both the atomic-only schema and
    the joined value so the fix can't regress."""
    from tests.oracle_harness import driver_canon_problems
    from ushas_spark.queries.misc import expr_xpath_url_battery

    df = expr_xpath_url_battery(spark, sf_dir)
    assert not driver_canon_problems(df.schema)
    row = df.limit(1).collect()[0]
    # xp_all = "<id>|<lang>" for the synthesized <doc> xml.
    assert row.xp_all == f"{row.doc_id}|{row.xp_lang}"
    assert row.xp_id == row.doc_id


def test_cache_uses_in_memory_relation(spark, sf_dir):
    """df.cache() substitutes InMemoryRelation into later plans
    (reference: execution/CacheManager.scala, columnar cache)."""
    from ushas_spark.io import load_table

    n = load_table(spark, sf_dir, "nation")
    cached = n.cache()
    try:
        cached.count()  # materialise
        agg = cached.groupBy("n_regionkey").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan, plan[:2000]
        assert agg.count() == 5
    finally:
        cached.unpersist()


def test_approx_sketches_bounded_error(spark, sf_dir):
    """approx_count_distinct within documented HLL++ error vs exact."""
    from pyspark.sql import functions as F

    from ushas_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.10


def test_bernoulli_sample_seeded(spark, sf_dir):
    """df.sample with a seed is reproducible and roughly the right size.

    PITFALL (verified here): the seed must be passed with fraction as a
    KEYWORD -- ``df.sample(0.2, seed=42)`` hits PySpark's positional-arg
    shuffling (fraction lands in the withReplacement slot) and the seed is
    silently regenerated per call, making results non-reproducible."""
    from pyspark.sql import functions as F

    from ushas_spark.io import load_table

    o = load_table(spark, sf_dir, "orders")
    n1 = o.sample(fraction=0.2, seed=42).count()
    n2 = o.sample(fraction=0.2, seed=42).count()
    total = o.count()
    assert n1 == n2
    assert 0.1 * total < n1 < 0.3 * total


def test_rand_randn_seeded(spark, sf_dir):
    """Seeded rand/randn (reference: randomExpressions.scala, seeds fixed
    by ResolveRandomSeed): reproducible across runs, correct ranges.
    Excluded from the DuckDB gate by nature (engine-specific PRNG)."""
    from pyspark.sql import functions as F

    from ushas_spark.io import load_table

    o = load_table(spark, sf_dir, "orders").limit(500)
    a = [r.u for r in o.select(F.rand(seed=7).alias("u")).collect()]
    b = [r.u for r in o.select(F.rand(seed=7).alias("u")).collect()]
    assert a == b
    assert all(0.0 <= x < 1.0 for x in a)
    n = [r.z for r in o.select(F.randn(seed=7).alias("z")).collect()]
    assert abs(sum(n) / len(n)) < 0.3  # loose CLT sanity bound
