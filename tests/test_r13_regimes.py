"""Regime twins + plan pins for the r13 restructures.

Three restructures (probes tools/probe_{walks,ppr,bloom}_r13.py, all
winners of 4/4 interleaved isolated sf0.1 pairings, hash-identical at
three SFs):

- graph_random_walks: size-gated adjacency regime -- array-packed
  per-src neighbor lists + explicit broadcast of the walk table per hop
  + in-row argmin; the merge regime (r10 driver-green shape) runs
  byte-unchanged past WALKS_BROADCAST_MAX_V.
- graph_personalized_pagerank: size-gated broadcast regime with the
  seed membership join collapsed to the provable ``node < PPR_SEED_CAP``
  predicate; the merge regime (r04-r12 driver-green shape, join-based)
  runs byte-unchanged past PAGERANK_BROADCAST_MAX_V.
- pipeline_bloom_prefilter: gram table materialized once (was evaluated
  3x), probe-side bit explode + (doc_id, ng) min-agg replaced by
  BLOOM_HASHES broadcast word joins + in-row AND; no regime gate (every
  broadcast is constant-size or pre-existing).

The twins prove the gate only changes physical strategy, never values;
the plan pins prove the shape the restructure bought, via the same
tree-walk counter PLANS.md uses (never text grep -- cached relations
re-print their stored plans).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ushas_spark import durability
from ushas_spark.durability import plan_counts
from ushas_spark.operators import graph

SF_DIR = os.environ.get("USHAS_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from ushas_spark.session import get_spark

    return get_spark("test-r13-regimes")


def _release(spark):
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


def _counts(df):
    return plan_counts(df._jdf.queryExecution().executedPlan())


def test_walks_regimes_bit_identical(spark, monkeypatch):
    def rows():
        out = [
            tuple(r)
            for r in graph.graph_random_walks(spark, SF_DIR).collect()
        ]
        _release(spark)
        return out

    adjacency_rows = rows()  # every test SF is small-V
    monkeypatch.setattr(graph, "WALKS_BROADCAST_MAX_V", 0)  # force merge
    merge_rows = rows()
    assert adjacency_rows == merge_rows
    assert len(adjacency_rows) > 0
    assert len(adjacency_rows[0]) == graph.WALK_LEN + 1  # n0..n{len}


def test_walks_adjacency_plan_no_smj_one_exchange(spark):
    """Small-V final fragment: one BHJ per hop against the checkpointed
    adjacency, zero SMJ, and the only planned exchange is the final
    orderBy (the per-hop groupBy(walker) argmin exchanges are gone)."""
    counts = _counts(graph.graph_random_walks(spark, SF_DIR))
    _release(spark)
    assert counts["smj"] == 0, counts
    assert counts["bhj"] == graph.WALK_LEN, counts
    assert counts["shuffles"] == 1, counts


def test_ppr_regimes_bit_identical(spark, monkeypatch):
    def rows():
        out = [
            tuple(r)
            for r in graph.graph_personalized_pagerank(
                spark, SF_DIR
            ).collect()
        ]
        _release(spark)
        return out

    broadcast_rows = rows()
    monkeypatch.setattr(graph, "PAGERANK_BROADCAST_MAX_V", 0)  # force merge
    merge_rows = rows()
    assert broadcast_rows == merge_rows
    assert 0 < len(broadcast_rows) <= graph.TOP_N


def test_ppr_broadcast_plan_no_smj_rounds_exchange_free(spark):
    """Small-V final fragment: the ITERS nested rounds plan zero
    exchanges (dst-pinned edges + explicit ranks broadcast; the seed
    membership is a WHEN predicate, not a join) -- only the top-N sort
    exchange remains, and no SMJ anywhere."""
    counts = _counts(graph.graph_personalized_pagerank(spark, SF_DIR))
    _release(spark)
    assert counts["smj"] == 0, counts
    assert counts["shuffles"] <= 1, counts


def test_bloom_single_documents_scan_and_four_shuffles(spark):
    """The gram table is materialized once (pre-r13: the documents scan
    + 3-gram explode + two md5 hashes ran 3x), the words table once
    (BLOOM_HASHES broadcast instances would otherwise each re-plan the
    build), and the probe side plans no explode/min-agg exchange:
    audited totals are 4 shuffles (words build; truth distinct; final
    per-doc agg; orderBy), zero SMJ."""
    from ushas_spark.operators.pipeline import pipeline_bloom_prefilter

    durability.begin_plan_audit()
    df = pipeline_bloom_prefilter(spark, SF_DIR)
    segments = durability.end_plan_audit()
    final_counts = _counts(df)
    total = dict(final_counts)
    for seg in segments:
        for k, v in seg["counts"].items():
            total[k] = total.get(k, 0) + v
    plans = [seg["pre"] for seg in segments] + [
        df._jdf.queryExecution().executedPlan().toString()
    ]
    _release(spark)
    scans = sum("documents" in p for p in plans)
    assert scans == 1, f"{scans} plans scan the documents parquet"
    assert total["shuffles"] == 4, total
    assert total["smj"] == 0, total
