"""Property-based cross-engine tests (hypothesis), mirroring the
reference's randomized expression testing (SURVEY.md section 5 item 2:
LiteralGenerator.scala / checkConsistencyBetweenInterpretedAndCodegen).
Here the two "evaluation paths" are Spark and DuckDB plus the exact
Python result, and the properties pin the portability contracts that
every oracle-gated query relies on:

- scaled-integer SUM is exact and partition-order independent;
- the md5-based 60-bit portable hash agrees across engines;
- word-shingle construction agrees across engines.

Each example spins one tiny Spark job, so example counts stay small --
these are contract checks, not fuzz farms.
"""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from ushas_spark.operators.dedup import hash60, shingles, sql_hash60, sql_shingles
from ushas_spark.oracle_exact import SCALE, dec_sum, sql_dec_sum

# 2-dp "money" doubles, the domain the scaled-integer pattern is built for.
money = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
).map(float)

words = st.text(alphabet="abcdef", min_size=1, max_size=5)


@settings(max_examples=6, deadline=None)
@given(st.lists(money, min_size=1, max_size=50))
def test_dec_sum_exact_and_engine_portable(spark, vals):
    """dec_sum == DuckDB mirror == exact Decimal arithmetic, regardless
    of row order or partitioning."""
    pdf = pd.DataFrame({"x": vals})
    sdf = spark.createDataFrame(pdf)
    got = {
        n: sdf.repartition(n).agg(dec_sum(F.col("x"), "s")).collect()[0]["s"]
        for n in (1, 7)
    }
    con = duckdb.connect()
    con.register("t", pdf)
    oracle = con.sql(f"SELECT {sql_dec_sum('x', 's')} FROM t").fetchone()[0]
    exact = float(sum(Decimal(str(round(v, 2))) for v in vals))
    assert got[1] == got[7] == oracle
    assert abs(got[1] - exact) < 10 ** (-SCALE) * len(vals)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.text(alphabet="abc xyz", min_size=0, max_size=30), min_size=1, max_size=20))
def test_hash60_engine_portable(spark, texts):
    """The 60-bit md5 hash (split/dedup/bucketing primitive) must yield
    identical longs in both engines for identical strings."""
    pdf = pd.DataFrame({"t": texts})
    sdf = spark.createDataFrame(pdf)
    got = [r.h for r in sdf.select(hash60(F.col("t")).alias("h")).collect()]
    con = duckdb.connect()
    con.register("t", pdf)
    want = [r[0] for r in con.sql(f"SELECT {sql_hash60('t')} FROM t").fetchall()]
    assert got == want


@settings(max_examples=6, deadline=None)
@given(st.lists(words, min_size=1, max_size=12))
def test_shingles_engine_portable(spark, toks):
    """Word-shingle sets (the MinHash/Jaccard input) agree across
    engines, including the under-width edge case."""
    text = " ".join(toks)
    pdf = pd.DataFrame({"text": [text]})
    sdf = spark.createDataFrame(pdf)
    got = sorted(sdf.select(shingles().alias("s")).collect()[0]["s"])
    con = duckdb.connect()
    con.register("d", pdf)
    want = sorted(con.sql(f"SELECT {sql_shingles('text')} FROM d").fetchone()[0])
    assert got == want


def test_quota_sample_never_exceeds_quota(spark, sf_dir):
    """Structural invariants of the quota sampler at gate scale: no
    source exceeds QUOTA_PER_SOURCE; every source with >= quota docs in
    the oversampled pre-filter reaches it exactly."""
    from ushas_spark.operators.pipeline import QUOTA_PER_SOURCE
    from ushas_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["pipeline_quota_sample"](spark, sf_dir).collect()
    assert rows, "sampler must emit sources"
    for r in rows:
        assert 1 <= r.n_sampled <= QUOTA_PER_SOURCE, r


def test_filter_funnel_is_monotonic(spark, sf_dir):
    """Each cumulative stage can only shrink the survivor set."""
    from ushas_spark.registry import QUERIES, load_all

    load_all()
    (r,) = QUERIES["pipeline_filter_funnel"](spark, sf_dir).collect()
    seq = [r.n_total, r.n_after_len, r.n_after_lang, r.n_after_tok, r.n_after_rep]
    assert all(a >= b for a, b in zip(seq, seq[1:])), seq
    assert seq[-1] > 0, "funnel must not annihilate the gate corpus"


def test_source_mix_kept_bounded_by_total(spark, sf_dir):
    """Mix invariants: kept <= total per source, and the mix keeps a
    nontrivial fraction overall (weights are 20-79%)."""
    from ushas_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["pipeline_source_mix"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_kept <= r.n_total, r
        assert 20 <= r.weight_pct <= 79, r
    total = sum(r.n_total for r in rows)
    kept = sum(r.n_kept for r in rows)
    assert 0.1 * total < kept < 0.9 * total, (kept, total)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=200),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_any_pcm(samples, rate):
    """WAV encode->decode is the identity on arbitrary 16-bit PCM."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    with wave.open(io.BytesIO(buf.getvalue()), "rb") as r:
        assert r.getframerate() == rate
        n = r.getnframes()
        got = list(struct.unpack(f"<{n}h", r.readframes(n)))
    assert got == samples


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=1, max_value=12), st.integers(min_value=1, max_value=12), st.randoms())
def test_png_roundtrip_any_pixels(w, h, rnd):
    """PNG encode->decode preserves arbitrary RGB pixel grids (container
    write, zlib, filter-0 scanlines, CRC, unfilter)."""
    import struct
    import zlib

    from ushas_spark.operators.multimodal import _decode_png_pixels, _png_chunk

    pixels = [
        [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256)) for _ in range(w)]
        for _ in range(h)
    ]
    raw = b"".join(
        bytes([0] + [c for px in row for c in px]) for row in pixels
    )
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    got = _decode_png_pixels(payload)
    assert got["width"] == w and got["height"] == h
    assert got["pixels"] == pixels


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 65535), st.integers(0, 65535))
def test_zvalue_interleave_bijective(x, y):
    """Morton interleave is a bijection on 16-bit pairs: the Python
    reference de-interleave recovers (x, y) from the operator's bit
    formula (evaluated in pure Python -- same arithmetic as the JVM
    expression, which test_layout pins against Spark)."""
    from ushas_spark.operators.layout import _SPREAD

    def part1by1(v):
        v &= 0xFFFF
        for shift, mask in _SPREAD:
            v = (v | (v << shift)) & mask
        return v

    z = part1by1(x) | (part1by1(y) << 1)
    rx = ry = 0
    for i in range(16):
        rx |= ((z >> (2 * i)) & 1) << i
        ry |= ((z >> (2 * i + 1)) & 1) << i
    assert (rx, ry) == (x, y)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12),
       st.sampled_from([("a", "b"), ("a", "a"), ("b", "c")]))
def test_bpe_merge_fold_engine_portable(spark, syms, pair):
    """The string-encoded greedy merge fold gives identical results in
    Spark and DuckDB for arbitrary symbol sequences and pairs,
    including overlapping self-pairs (aa in aaa)."""
    import duckdb as _duck

    from ushas_spark.operators import bpe

    a, b = pair
    df = spark.createDataFrame([("w", 1)], "word string, n long").select(
        "word", "n", F.array(*[F.lit(s) for s in syms]).alias("s")
    )
    best = spark.createDataFrame([(a, b, 1)], "ba string, bb string, bcnt long")
    got_spark = bpe._apply_merge(df, best).collect()[0].s
    lst = "[" + ", ".join(f"'{s}'" for s in syms) + "]"
    sql = "SELECT " + bpe._sql_fold(lst, f"'{a}'", f"'{b}'")
    got_duck = _duck.sql(sql).fetchone()[0]
    assert got_spark == got_duck


def test_ntile_from_rank_formula_matches_contract():
    """The integer NTILE formula in queries/analytics.py (first n%k
    buckets get n//k+1 rows, rest n//k) must agree with the SQL NTILE
    contract for EVERY rank at a sweep of (n, k) shapes -- including
    n < k (each row its own bucket) and heavy-remainder cases. The
    reference implementation assigns bucket b to ranks in
    (sum of sizes of buckets < b, sum through b]."""

    def reference_buckets(n: int, k: int) -> list[int]:
        q, r = divmod(n, k)
        sizes = [q + 1] * r + [q] * (k - r)
        out = []
        for b, size in enumerate(sizes, start=1):
            out.extend([b] * size)
        return out

    def formula(rn: int, n: int, k: int) -> int:
        q, r = divmod(n, k)
        cut = r * (q + 1)
        if rn <= cut:
            return (rn + q) // (q + 1)
        return r + (rn - cut + q - 1) // q

    for n in [1, 2, 3, 4, 5, 6, 7, 9, 10, 11, 49, 50, 51, 99, 100, 1000]:
        for k in [1, 2, 3, 4, 5, 7, 10]:
            if n < k:
                # NTILE with n < k: ranks 1..n land in buckets 1..n.
                ref = list(range(1, n + 1))
            else:
                ref = reference_buckets(n, k)
            got = [formula(rn, n, k) for rn in range(1, n + 1)]
            assert got == ref, f"n={n} k={k}: {got[:12]} != {ref[:12]}"


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=25),
    st.integers(min_value=2, max_value=7),
)
def test_span_interval_union_sweep_matches_bruteforce(spark, positions, width):
    """The lag-window interval-union sweep in dedup_repeated_ngram_spans
    (contribution = w for the first hit, min(w, pos - prev) after) must
    equal the brute-force union of [pos, pos+w-1] ranges for ANY
    position multiset."""
    uniq = sorted(set(positions))
    expected = len({p for s in uniq for p in range(s, s + width)})
    pdf = pd.DataFrame({"doc_id": [1] * len(uniq), "pos": uniq})
    sdf = spark.createDataFrame(pdf)
    from pyspark.sql import Window as W

    win = W.partitionBy("doc_id").orderBy("pos")
    contrib = F.when(F.lag("pos").over(win).isNull(), F.lit(width)).otherwise(
        F.least(F.lit(width), F.col("pos") - F.lag("pos").over(win))
    )
    got = (
        sdf.withColumn("c", contrib)
        .groupBy("doc_id")
        .agg(F.sum("c").alias("covered"))
        .collect()[0]["covered"]
    )
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # cluster id
            st.integers(min_value=0, max_value=999999), # similarity x1m
        ),
        min_size=2,
        max_size=20,
    )
)
def test_semdedup_drop_rule_matches_definition(spark, rows):
    """dedup_semantic_clusters' drop rule (drop b iff a same-cluster
    pair (a < b) has sim >= tau) on arbitrary pair structures: the
    DataFrame pipeline's per-cluster n_dropped must equal the literal
    set-comprehension over the same pairs."""
    tau = 500_000
    # Build vectors 0..n-1 with cluster labels, pair (i, j) sims from the
    # generated list (pairs keyed deterministically).
    members = [(i, cid) for i, (cid, _) in enumerate(rows)]
    pairs = [
        (ca, a, b, sim)
        for a, (ca, sim) in enumerate(rows)
        for b, (cb, _) in enumerate(rows)
        if a < b and ca == cb
    ]
    expected = {}
    for cid, _a, b, sim in pairs:
        if sim >= tau:
            expected.setdefault(cid, set()).add(b)
    exp_counts = {cid: len(s) for cid, s in expected.items()}
    if not pairs:
        return
    pdf = pd.DataFrame(pairs, columns=["cid", "id_a", "id_b", "sim_x1m"])
    sdf = spark.createDataFrame(pdf)
    got = {
        r["cid"]: r["n_dropped"]
        for r in sdf.filter(F.col("sim_x1m") >= tau)
        .select("cid", "id_b")
        .distinct()
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
        .collect()
    }
    assert got == exp_counts


def test_mmr_fold_matches_python_greedy_reference(spark, tmp_path):
    """The r09 map-side MMR fold vs an independent pure-Python greedy.

    The DuckDB oracle covers the shipped testdata; this drives the
    HOF fold through the cases that data never hits: exact-duplicate
    vectors (cosine ties -> cand_id tie-break inside array_min) and a
    corpus smaller than MMR_K picks (the empty-remainder guard must
    stop early, not emit null entries). Arithmetic mirrors bit-for-bit:
    sequential left-fold dot products, IEEE sqrt/div, and Spark Round's
    half-away-from-zero via Decimal(float) -- exact binary -- HALF_UP.
    """
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import types as T

    from ushas_spark.operators.similarity import (
        MMR_K,
        N_QUERIES,
        TOP_K,
        sim_mmr_rerank,
    )

    def simx1m(a, b):
        def dot(x, y):
            acc = 0.0
            for u, v in zip(x, y):
                acc += u * v
            return acc

        c = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
        return int(
            Decimal(c * 1_000_000).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    def ref_mmr(vecs):
        rows = []
        for qid in sorted(vecs):
            if qid >= N_QUERIES:
                continue
            scored = sorted(
                ((simx1m(vecs[qid], vecs[c]), c) for c in vecs if c != qid),
                key=lambda t: (-t[0], t[1]),
            )[:TOP_K]
            sel = [(scored[0][1], scored[0][0], 0, 7 * scored[0][0])]
            for r in range(1, MMR_K):
                chosen = {c for c, _, _, _ in sel}
                rem = [(s, c) for s, c in scored if c not in chosen]
                if not rem:
                    break
                neg, cand, sim = min(
                    (
                        -(
                            7 * s
                            - 3
                            * max(
                                simx1m(vecs[c], vecs[sc])
                                for sc, _, _, _ in sel
                            )
                        ),
                        c,
                        s,
                    )
                    for s, c in rem
                )
                sel.append((cand, sim, r, -neg))
            rows += [(qid, r, c, s, sc) for c, s, r, sc in sel]
        return sorted(rows)

    rng = random.Random(97)
    grid = [i / 16 for i in range(-16, 17) if i]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    scenarios = []
    # (a) duplicates force cosine ties (identical vectors AND scaled
    # copies, which tie under cosine despite different coordinates).
    base = [[rng.choice(grid) for _ in range(6)] for _ in range(8)]
    dup = [base[i % 8] if i % 3 else [2 * x for x in base[i % 8]] for i in range(24)]
    scenarios.append({i: v for i, v in enumerate(dup)})
    # (b) corpus smaller than the pick count: 3 candidates per query.
    scenarios.append(
        {i: [rng.choice(grid) for _ in range(6)] for i in range(4)}
    )
    for idx, vecs in enumerate(scenarios):
        d = tmp_path / f"sf_case{idx}"
        d.mkdir()
        spark.createDataFrame(
            [(i, v) for i, v in vecs.items()], schema
        ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
        got = sorted(
            tuple(r) for r in sim_mmr_rerank(spark, str(d)).collect()
        )
        assert got == ref_mmr(vecs), f"scenario {idx}"


def test_mmr_fold_degenerate_k_and_empty_candidates(spark):
    """Reusable-operator edge cases: k=1 must return exactly the rank-0
    pick (Spark's sequence(1, 0) DESCENDS, so an unguarded fold would run
    two bogus rounds), k<=0 must raise ValueError (the fold seeds rank 0
    unconditionally, so it would otherwise silently return one pick per
    query against the documented contract -- ADVICE r09), and an empty
    candidate array must yield zero picks for that query instead of
    throwing ANSI INVALID_ARRAY_INDEX on cands[0]."""
    import pytest
    from pyspark.sql import functions as F

    from ushas_spark.operators.similarity import mmr_greedy_select

    cands = F.expr(
        """CASE WHEN id = 2 THEN
             CAST(array() AS
               array<struct<neg_sim:bigint,cand_id:bigint,
                            sim_x1m:bigint,ce:array<double>>>)
           ELSE
             array_sort(transform(sequence(0, 3), i -> struct(
               CAST(-100 * (10 - i) AS BIGINT) AS neg_sim,
               CAST(i AS BIGINT) AS cand_id,
               CAST(100 * (10 - i) AS BIGINT) AS sim_x1m,
               array(CAST(i AS DOUBLE), 1.0d) AS ce)))
           END"""
    )
    packed = spark.range(3).select(F.col("id").alias("qid"), cands.alias("cands"))
    got = sorted(tuple(r) for r in mmr_greedy_select(packed, 1).collect())
    assert got == [(0, 0, 0, 1000, 7000), (1, 0, 0, 1000, 7000)], got
    for k in (0, -3):
        with pytest.raises(ValueError, match="k must be >= 1"):
            mmr_greedy_select(packed, k)
    full = mmr_greedy_select(packed, 4)
    assert full.filter(F.col("qid") == 2).count() == 0
    assert full.filter(F.col("qid") == 0).count() == 4
