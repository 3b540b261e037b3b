"""Scale-stress checks on synthetic in-memory data (spark.range), far
above the parquet fixtures' row counts. The sf* parquet files are single
row-groups (scan parallelism 1 locally), so these are the only tests
that exercise the operators' *distributed* shape on this machine:
32-partition inputs, real shuffles, no driver collects of bulk data.

They assert correctness properties (planted near-dup recall, session
count invariants), not wall-time -- timing belongs to bench.py.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ushas_spark.operators.dedup import lsh_candidates, minhash_signatures

import pytest

# r13 (VERDICT r12 item 2): scale-stress twins run in the slow lane;
# the driver's default pytest invocation deselects them (opt in with
# USHAS_RUN_SLOW=1 -- the builder's round-close run).
pytestmark = pytest.mark.slow

N_DOCS = 120_000  # 60k planted near-dup pairs
N_EVENTS = 2_000_000
N_USERS = 50_000


def test_minhash_lsh_planted_neardup_recall(spark):
    """120k synthetic docs: ids (2k, 2k+1) share a 30-token text, the odd
    one appends one extra token (Jaccard ~ 30/31). MinHash-LSH candidate
    generation must recover nearly all planted pairs while staying far
    below the O(N^2) pair space."""
    base = spark.range(N_DOCS, numPartitions=32)
    text0 = F.concat_ws(
        " ",
        F.expr(
            "transform(sequence(1, 30), "
            "i -> substring(md5(concat(string((id DIV 2) * 2), ':', string(i))), 1, 6))"
        ),
    )
    docs = base.select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 1,
            F.concat(text0, F.lit(" "), F.substring(F.md5(F.col("id").cast("string")), 1, 6)),
        )
        .otherwise(text0)
        .alias("text"),
    )
    cand = lsh_candidates(minhash_signatures(docs))
    n_cand = cand.count()
    # planted pair (2k, 2k+1) appears as doc_a=2k, doc_b=2k+1
    hits = cand.filter(
        (F.col("doc_a") % 2 == 0) & (F.col("doc_b") == F.col("doc_a") + 1)
    ).count()
    recall = hits / (N_DOCS / 2)
    assert recall >= 0.8, f"planted near-dup recall {recall:.3f}"
    # candidate set must stay near-linear, nowhere near the 7.2e9 pair space
    assert n_cand < N_DOCS * 20, n_cand


def test_gap_sessionization_invariants_2m_events(spark):
    """2M synthetic events over 50k users: the lag -> boundary -> running
    sum sessionization must satisfy the structural invariants (one
    session per user minimum, session count equals boundary count, no
    session longer than its user's event count) with the corpus shuffled
    across 32 partitions."""
    ev = spark.range(N_EVENTS, numPartitions=32).select(
        (F.col("id") % N_USERS).alias("user_id"),
        F.timestamp_micros(
            (F.lit(1_600_000_000_000_000) + (F.xxhash64("id") % 864_000) * 1_000_000)
        ).alias("ts"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "user_id")
    gap_s = 1800
    with_gap = ev.withColumn(
        "new_session",
        (
            F.coalesce(
                (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > gap_s,
                F.lit(True),
            )
        ).cast("int"),
    )
    sess = with_gap.withColumn(
        "session_idx", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    agg = sess.groupBy("user_id", "session_idx").agg(F.count("*").alias("n_events"))
    per_user = agg.groupBy("user_id").agg(
        F.max("session_idx").alias("n_sessions"), F.sum("n_events").alias("n_ev")
    )
    row = per_user.agg(
        F.count("*").alias("users"),
        F.sum("n_ev").alias("total_events"),
        F.min("n_sessions").alias("min_sessions"),
    ).collect()[0]
    assert row.users == N_USERS
    assert row.total_events == N_EVENTS
    assert row.min_sessions >= 1


def test_ngram_jaccard_hot_shingle_bucket_bounded(spark):
    """Planted skew: 5k docs that all share one ubiquitous trigram
    ("the quick brown" prefix) plus distinct tails. Without the
    NGRAM_DF_CAP stop-shingle filter the inverted-index self-join would
    emit ~12.5M pairs from that single shingle; with it, the shared
    shingle's document frequency (5000 > cap) removes it from the index
    and the candidate pair count stays near-linear."""
    from ushas_spark.operators.dedup import NGRAM_DF_CAP, shingles

    n_docs = 5_000
    docs = spark.range(n_docs, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown "),
            F.expr(
                "concat_ws(' ', transform(sequence(1, 6), "
                "i -> substring(md5(concat(string(id), ':', string(i))), 1, 6)))"
            ),
        ).alias("text"),
    )
    sh_all = docs.select("doc_id", F.explode(shingles()).alias("shingle"))
    hot = (
        sh_all.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > NGRAM_DF_CAP)
    )
    # the planted stop-shingle is over the cap...
    assert hot.filter(F.col("shingle") == "the quick brown").count() == 1
    sh = sh_all.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .count()
    )
    # ...and without it the capped join stays near-linear: the uncapped
    # version would have >= C(5000,2)*[pairs per hot shingle] ~ 12.5M+.
    assert pairs < n_docs * 10, pairs


def test_salted_join_salt_is_deterministic_across_runs(spark):
    """The salt must be identical on re-execution (task retry /
    speculation safety): two independent evaluations of the salted big
    side must assign every row the same salt."""
    from ushas_spark.operators.skew import _row_salt

    big = spark.range(10_000, numPartitions=16).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    salted = big.withColumn("_salt", _row_salt(big, 8, None))
    a = salted.groupBy("k").agg(F.first("_salt").alias("s1"))
    b = salted.groupBy("k").agg(F.first("_salt").alias("s2"))
    diff = a.join(b, "k").filter(F.col("s1") != F.col("s2")).count()
    assert diff == 0


def test_salt_spreads_duplicate_rows(spark):
    """A hot key made of IDENTICAL rows (the count-aggregation workload
    salting targets) must still fan out: a pure content hash would give
    every copy the same salt, making the mitigation a silent no-op. With
    the partition-id mix, copies in different input partitions draw
    different salts; with a stable id column, the spread is per-row."""
    from ushas_spark.operators.skew import _row_salt

    # 32 partitions of the SAME row content (k='hot', v=1).
    dup = spark.range(32_000, numPartitions=32).select(
        F.lit("hot").alias("k"), F.lit(1).alias("v")
    )
    n_content = (
        dup.withColumn("_salt", _row_salt(dup, 8, None))
        .select("_salt").distinct().count()
    )
    assert n_content > 1, "content+partition salt collapsed duplicate rows"

    # With a unique id column the spread is uniform regardless of content.
    with_id = spark.range(32_000, numPartitions=32).select(
        F.col("id").alias("rid"), F.lit("hot").alias("k")
    )
    n_id = (
        with_id.withColumn("_salt", _row_salt(with_id, 8, "rid"))
        .select("_salt").distinct().count()
    )
    assert n_id == 8


def test_quota_sample_bounded_under_dominant_source(spark):
    """Planted source skew: one source holds 96% of a 500k-doc corpus.
    The quota sampler's hash pre-filter must bound the ranked (window)
    partition for EVERY source to ~oversample*quota rows -- the naive
    rank-everything formulation would put 480k rows on one reducer."""
    from ushas_spark.operators.pipeline import (
        QUOTA_PER_SOURCE,
        _QUOTA_MOD,
        _QUOTA_OVERSAMPLE_X1000,
        _quota_hash,
    )

    n_docs = 500_000
    docs = spark.range(n_docs, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 25 == 0, F.concat(F.lit("minor_"), (F.col("id") % 7).cast("string")))
        .otherwise(F.lit("dominant"))
        .alias("source"),
    )
    counts = docs.groupBy("source").agg(F.count("*").alias("n_src"))
    pre = (
        docs.join(F.broadcast(counts), "source")
        .withColumn("_h", _quota_hash())
        .filter(
            F.col("_h") % _QUOTA_MOD
            < (
                _QUOTA_OVERSAMPLE_X1000
                * QUOTA_PER_SOURCE
                * float(_QUOTA_MOD // 1000)
            )
            / F.col("n_src")
        )
    )
    per_source = pre.groupBy("source").agg(F.count("*").alias("n_pre")).collect()
    assert len(per_source) == 8  # dominant + 7 minor
    for r in per_source:
        # each window partition is a few dozen rows, never corpus-scale
        assert r.n_pre <= QUOTA_PER_SOURCE * 10, (r.source, r.n_pre)
    # and the sampler still fills its quota from the dominant source
    w = W.partitionBy("source").orderBy("_h", "doc_id")
    sampled = (
        pre.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= QUOTA_PER_SOURCE)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert all(r.n == QUOTA_PER_SOURCE for r in sampled), sampled


def test_kmeans_loop_200k_vectors(spark):
    """200k synthetic 16-dim vectors through 2 Lloyd rounds using the
    production assign/update path: the assignment stage must stay
    shuffle-free (broadcast centroid row) and every cluster must stay
    populated -- the shape that holds at 100 TB where only the K x DIM
    update cells ever shuffle."""
    from ushas_spark.durability import materialize
    from ushas_spark.operators import clustering as C

    n, dim, k = 200_000, 16, 8
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.sin(F.col("id") * (d + 1) * 0.7).cast("double"),
        ).alias("e"),
    )
    cents = emb.filter(
        F.col("vec_id").isin([c * C.INIT_STRIDE for c in range(k)])
    ).select(
        (F.col("vec_id") / C.INIT_STRIDE).cast("int").alias("cid"),
        F.col("e").alias("ce"),
    )
    for _ in range(2):
        cents = materialize(C._update(C._assign(emb, cents)))
    final = C._assign(emb, cents)
    plan = final._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange (hash|range)partitioning", plan)) == 0
    sizes = final.groupBy("cid").count().collect()
    assert len(sizes) == k
    assert sum(r["count"] for r in sizes) == n


def test_pagerank_rounds_500k_edges(spark):
    """~500k-edge synthetic power-law-ish graph, 3 synchronous rounds
    with the exact-scaled contribution sums: mass stays conserved to
    rounding tolerance and no rank goes nonpositive. Proves the
    iterative path at ~200x the oracle's edge count."""
    from ushas_spark.durability import materialize
    from ushas_spark.operators.graph import RANK_SCALE

    # hub-heavy bipartite-ish edges: dst = id % 701 (hot), src uniform
    edges_one = spark.range(500_000).select(
        (F.col("id") % 9973).alias("src"), (F.col("id") % 701 + 100_000).alias("dst")
    ).distinct()
    edges = edges_one.unionAll(
        edges_one.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ewd = materialize(edges.join(deg, "src").repartition("src"))
    nodes = ewd.groupBy("src").agg(F.first("deg")).select(F.col("src").alias("node"))
    n_nodes = materialize(nodes.agg(F.count(F.lit(1)).alias("n")))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("n").cast("double")).alias("rank"), "n"
    )
    for _ in range(3):
        contrib = ranks.join(ewd, ranks.node == ewd.src).select(
            F.col("dst").alias("node"),
            F.round((F.col("rank") / F.col("deg").cast("double")) * RANK_SCALE)
            .cast("long")
            .alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("sc"))
        ranks = summed.crossJoin(F.broadcast(n_nodes)).select(
            "node",
            (
                F.lit(0.15) / F.col("n").cast("double")
                + F.lit(0.85) * (F.col("sc").cast("double") / F.lit(float(RANK_SCALE)))
            ).alias("rank"),
            "n",
        )
    row = ranks.agg(
        F.sum(F.round(F.col("rank") * RANK_SCALE).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("nn"),
        F.min("rank").alias("mn"),
    ).collect()[0]
    n_edges = ewd.count()
    assert row.mn > 0
    assert abs(row.s - RANK_SCALE) <= n_edges * 3 / 2 + row.nn, (row.s, n_edges)


def test_triangle_count_planted_cliques_200k_edges(spark):
    """Planted ground truth at scale: 2,000 disjoint 10-cliques =
    90k edges, exactly 2000 * C(10,3) = 240,000 triangles and
    2000 * 10 * C(9,2) = 720,000 wedges. The degree-oriented counter
    must get every one -- no sampling, no approximation."""
    from pyspark.sql import functions as F

    from ushas_spark.operators.graph import triangle_summary

    n_cliques, csize = 2000, 10
    nodes = spark.range(n_cliques * csize).select(
        (F.col("id") / csize).cast("long").alias("c"),
        (F.col("id") % csize).alias("i"),
        F.col("id").alias("node"),
    )
    a, b = nodes.alias("a"), nodes.alias("b")
    edges = a.join(
        b,
        (F.col("a.c") == F.col("b.c")) & (F.col("a.i") < F.col("b.i")),
    ).select(F.col("a.node").alias("u"), F.col("b.node").alias("v"))
    row = triangle_summary(edges).collect()[0]
    assert row.n_vertices == n_cliques * csize
    assert row.n_edges == n_cliques * csize * (csize - 1) // 2
    assert row.n_wedges == n_cliques * csize * 36
    assert row.n_triangles == n_cliques * 120


def test_triangle_count_celebrity_hub_50k_star(spark):
    """Skew stress for the r10 adjacency-intersection formulation: a
    degree-50k hub (star) whose leaves also form one 50k-cycle. Exact
    ground truth: every cycle edge closes with the hub -> N triangles;
    wedges = C(N,2) at the hub + C(3,2) per leaf. The degree
    orientation must point every star edge AT the hub (highest degree),
    so the hub's out-adjacency is EMPTY and every N+ array stays <= 3
    -- the celebrity node cannot reintroduce a quadratic row or a giant
    collect_list row past the orientation. Completing at all (vs the
    naive hub-wedge blowup of C(50k,2) ~ 1.25e9 rows) is the point."""
    from ushas_spark.operators.graph import triangle_summary

    n = 50_000
    hub = n  # leaves are 0..n-1
    star = spark.range(n).select(
        F.col("id").alias("u"), F.lit(hub).alias("v")
    )
    cycle = spark.range(n).select(
        F.col("id").alias("u"), ((F.col("id") + 1) % n).alias("v")
    )
    row = triangle_summary(star.unionAll(cycle)).collect()[0]
    assert row.n_vertices == n + 1
    assert row.n_edges == 2 * n
    assert row.n_wedges == n * (n - 1) // 2 + 3 * n
    assert row.n_triangles == n


def test_kcore_celebrity_hub_50k_star(spark):
    """Giant-row envelope stress for the r11 adjacency-array peeling:
    a degree-50k hub whose FULL adjacency array is built (k-core has no
    degree cap -- core members ARE the high-degree nodes), leaves in a
    cycle (degree 3), plus a disjoint 12-clique. Exact ground truth at
    k=4: leaves (d=3) die in round 1; the hub SURVIVES round 1's degree
    test (it is counted in keep_1) but all its neighbors died, so it
    drops from the round-1 adjacency with zero residual edges and is
    gone from round 2 on -- the keep-vs-residual semantic subtlety the
    edge-list formulation had, preserved exactly. The clique (d=11) is
    the fixpoint core. Completing the 50k-element collect_list build
    and the hub's 50k-row explode is the envelope claim under test."""
    from ushas_spark.operators.graph import kcore_summary

    n = 50_000
    hub = n  # leaves are 0..n-1
    star = spark.range(n).select(F.col("id").alias("u"), F.lit(hub).alias("v"))
    cycle = spark.range(n).select(
        F.col("id").alias("u"), ((F.col("id") + 1) % n).alias("v")
    )
    c0, csize = n + 1, 12
    ids = spark.range(csize)
    clique = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a.id") < F.col("b.id"))
        .select((F.col("a.id") + c0).alias("u"), (F.col("b.id") + c0).alias("v"))
    )
    edges = star.unionAll(cycle).unionAll(clique)
    row = kcore_summary(edges, k=4, rounds=3).collect()[0]
    assert row.k == 4
    assert row.n_nodes_initial == n + 1 + csize
    assert row.n_edges_initial == 2 * n + csize * (csize - 1) // 2
    assert row.n_core_nodes == csize
    assert row.n_core_edges == csize * (csize - 1) // 2
    assert row.min_core_degree == csize - 1


def test_fuzzy_blocking_50k_names_planted_typos(spark):
    """Blocking at scale: 50k two-token names with 500 planted
    single-edit typo pairs. The two-pass blocker must (a) recover every
    planted pair -- each typo edits ONE token, so the other token's
    block catches it -- and (b) never fall back to an all-pairs
    product (plan check)."""
    from pyspark.sql import functions as F

    base = spark.range(50_000).select(
        F.col("id"),
        F.concat(
            F.lit("tok"), (F.col("id") % 997).cast("string"),
            F.lit("a "),
            F.lit("suf"), (F.col("id") % 1009).cast("string"), F.lit("b"),
        ).alias("name"),
    )
    # 500 planted typos: append one char to the FIRST token only.
    typos = base.filter(F.col("id") % 100 == 0).select(
        (F.col("id") + 1_000_000).alias("id"),
        F.regexp_replace("name", r"a ", "ax ").alias("name"),
    )
    names = base.unionByName(typos).select("name").distinct()
    keyed = names.select(
        "name",
        F.regexp_extract("name", r"^(\S+)", 1).alias("tok_first"),
        F.regexp_extract("name", r"(\S+)$", 1).alias("tok_last"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")

    def block(key):
        return a.join(
            b,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col("a.name") < F.col("b.name")),
        ).select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )

    cand = block("tok_first").union(block("tok_last")).distinct()
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    verified = cand.filter(F.levenshtein("name_a", "name_b") <= 1)
    # Recall check on the PLANTED pairs specifically (the synthetic
    # name space also contains natural lev-1 pairs, e.g. single-digit
    # suffix differences -- those are true positives, not noise).
    planted = set()
    for i in range(0, 50_000, 100):
        orig = f"tok{i % 997}a suf{i % 1009}b"
        typo = f"tok{i % 997}ax suf{i % 1009}b"
        planted.add((min(orig, typo), max(orig, typo)))
    got = {
        (r.name_a, r.name_b)
        for r in verified.filter(
            F.col("name_a").contains("ax ") | F.col("name_b").contains("ax ")
        ).collect()
    }
    missing = planted - got
    assert not missing, f"{len(missing)} planted pairs missed"


def test_bucketed_rank_ntile_equivalence_500k(spark):
    """The distributed quintile machinery (fixed-width range buckets +
    per-bucket row_number + broadcast theta-join prefix sums,
    queries/analytics.py _bucketed_rank/_ntile_from_rank) must
    reproduce the global NTILE contract EXACTLY at volume, on a skewed
    key with heavy ties -- the case where rank arithmetic subtly
    drifting by one row would silently misplace a whole tie-group."""
    from pyspark.sql import Window as W

    from ushas_spark.queries.analytics import _bucketed_rank, _ntile_from_rank

    n = 500_000
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("o_custkey"),
            # Zipf-ish skewed, heavily tied metric.
            (F.pow(F.col("id") % 1000 + 1, 2.0)).cast("long").alias("metric"),
        )
    )
    ranked = _bucketed_rank(base, "metric", 50_000, asc=True, out="rn")
    n_df = base.agg(F.count(F.lit(1)).alias("n_rows"))
    got = (
        ranked.crossJoin(F.broadcast(n_df))
        .select(
            "o_custkey",
            _ntile_from_rank("rn", "n_rows", 5).alias("bucket"),
        )
    )
    expect = base.select(
        "o_custkey",
        F.ntile(5)
        .over(W.orderBy("metric", "o_custkey"))
        .cast("long")
        .alias("bucket"),
    )
    diff = got.join(expect, "o_custkey").filter(
        got.bucket != expect.bucket
    )
    assert diff.count() == 0
    # And the machinery itself must not plan a global window.
    import json

    nodes = json.loads(got._jdf.queryExecution().optimizedPlan().toJSON())
    assert not any(
        nd["class"].endswith(".Window") and not nd.get("partitionSpec")
        for nd in nodes
    )


def test_repeated_ngram_spans_hot_shingle_linear(spark):
    """Planted skew for span dedup: 50k synthetic docs that ALL contain
    one ubiquitous 5-gram ('the same old boiler plate'), plus unique
    filler. Unlike pair-generating dedup (where a hot shingle is an
    O(df^2) bucket), span coverage is LINEAR in positions by
    construction -- the hot shingle contributes one hit row per
    position, never a pair blowup. The check: the op completes with
    output rows == docs (every doc has the duplicated span), coverage
    counts the planted span exactly, and the hit row count equals the
    number of duplicated positions (linear, not quadratic)."""
    from pyspark.sql import functions as F

    from ushas_spark.operators.dedup import (
        SPAN_MIN_COUNT,
        SPAN_WIDTH,
        _positional_shingles,
    )

    n = 50_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the same old boiler plate "),
            # Unique filler words so nothing else repeats corpus-wide.
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"u{k}w"), F.col("id").cast("string"))
                    for k in range(5)
                ],
            ),
        ).alias("text"),
    )
    sh = docs.select(
        "doc_id", F.posexplode(_positional_shingles(SPAN_WIDTH))
    ).select("doc_id", (F.col("pos") + 1).alias("pos"), F.col("col").alias("shingle"))
    dup = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= SPAN_MIN_COUNT)
        .select("shingle")
    )
    hits = sh.join(dup, "shingle", "left_semi")
    n_hits = hits.count()
    # Exactly one duplicated 5-gram position per doc: linear in corpus.
    assert n_hits == n, n_hits
    win = __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
        "doc_id"
    ).orderBy("pos")
    contrib = F.when(F.lag("pos").over(win).isNull(), F.lit(SPAN_WIDTH)).otherwise(
        F.least(F.lit(SPAN_WIDTH), F.col("pos") - F.lag("pos").over(win))
    )
    cov = hits.withColumn("c", contrib).groupBy("doc_id").agg(
        F.sum("c").alias("covered")
    )
    got = cov.agg(
        F.count("*").alias("docs"), F.min("covered").alias("mn"),
        F.max("covered").alias("mx"),
    ).collect()[0]
    assert got.docs == n and got.mn == SPAN_WIDTH and got.mx == SPAN_WIDTH, got


def test_mmr_fold_scales_in_queries(spark):
    """20k packed query rows through mmr_greedy_select: the r09 map-side
    MMR operator's scale claim is that selection adds ZERO shuffles of
    its own (each packed row folds independently), so query volume is a
    pure map dimension. Synthesizes candidates entirely JVM-side
    (hash-derived sims/vectors, no driver loop), checks the invariants
    every greedy MMR output must satisfy, and asserts the plan really
    is shuffle-free."""
    from ushas_spark.durability import plan_counts
    from ushas_spark.operators.similarity import mmr_greedy_select

    n_q, n_cand, k = 20_000, 10, 5
    cand = F.expr(
        f"""array_sort(transform(sequence(0, {n_cand - 1}), i -> struct(
          -CAST(pmod(xxhash64(id, i), 2000001) - 1000000 AS BIGINT) AS neg_sim,
          CAST(i AS BIGINT) AS cand_id,
          CAST(pmod(xxhash64(id, i), 2000001) - 1000000 AS BIGINT) AS sim_x1m,
          transform(sequence(0, 5), j ->
            (CAST(pmod(xxhash64(id, i, j), 2001) AS DOUBLE) - 1000.0) / 1000.0
          ) AS ce)))"""
    )
    packed = spark.range(n_q, numPartitions=32).select(
        F.col("id").alias("qid"), cand.alias("cands")
    )
    out = mmr_greedy_select(packed, k)
    assert plan_counts(out._jdf.queryExecution().executedPlan())["shuffles"] == 0
    rows = out.groupBy("qid").agg(
        F.count("*").alias("n"),
        F.countDistinct("cand_id").alias("n_ids"),
        F.min("mmr_rank").alias("r0"),
        F.max("mmr_rank").alias("rk"),
        # Rank 0 takes the max-similarity candidate, so no later pick can
        # carry a larger sim_x1m (scores CAN exceed rank 0's when the
        # diversity penalty goes negative -- random vectors anticorrelate).
        F.max(F.when(F.col("mmr_rank") == 0, F.col("sim_x1m"))).alias("sim0"),
        F.max("sim_x1m").alias("sim_max"),
        # And rank 0's score is exactly 7x its similarity (no penalty yet).
        F.max(
            F.when(
                F.col("mmr_rank") == 0,
                F.col("score") - 7 * F.col("sim_x1m"),
            )
        ).alias("s0_resid"),
    )
    bad = rows.filter(
        (F.col("n") != k)
        | (F.col("n_ids") != k)
        | (F.col("r0") != 0)
        | (F.col("rk") != k - 1)
        | (F.col("sim0") != F.col("sim_max"))
        | (F.col("s0_resid") != 0)
    )
    assert rows.count() == n_q
    assert bad.count() == 0
