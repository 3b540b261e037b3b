"""Regime twin for graph_hits_hub_authority (r12 restructure).

The operator picks its per-round join strategy by a size gate
(HITS_BROADCAST_MAX_V): broadcast regime (pins on groupBy keys,
explicit broadcast score side) below it, merge regime (pins on join
keys, unhinted join -- the 100 TB shape) above it. Both regimes must
produce bit-identical rows: same integer sums, same rounding points,
same top-10. The gate only changes physical strategy, never values.

The merge regime is the pre-r12 shipped formulation, so this twin also
pins the restructure against the r04-r11 driver-green evidence.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ushas_spark.operators import graph

SF_DIR = os.environ.get("USHAS_TEST_SF", "/root/testdata/sf0.001")


def _release(spark):
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


@pytest.fixture(scope="module")
def spark():
    from ushas_spark.session import get_spark

    return get_spark("test-hits-regimes")


def _rows(spark, sf_dir):
    out = [
        tuple(r)
        for r in graph.graph_hits_hub_authority(spark, sf_dir).collect()
    ]
    _release(spark)
    return out


def test_regimes_bit_identical(spark, monkeypatch):
    broadcast_rows = _rows(spark, SF_DIR)  # every test SF is small-V
    monkeypatch.setattr(graph, "HITS_BROADCAST_MAX_V", 0)  # force merge
    merge_rows = _rows(spark, SF_DIR)
    assert broadcast_rows == merge_rows
    assert len(broadcast_rows) == 20  # top-10 per role, both roles present


def test_pagerank_regimes_bit_identical(spark, monkeypatch):
    """Same gate pattern transferred to global PageRank (r12 probe #2,
    tools/probe_pagerank_r12.py): broadcast regime won both interleaved
    sf0.1 pairings; the personalized variant measured NEGATIVE and
    stays on the merge shape (adjudicated in pagerank()'s docstring)."""

    def rows():
        out = [
            tuple(r)
            for r in graph.graph_pagerank_top(spark, SF_DIR).collect()
        ]
        _release(spark)
        return out

    broadcast_rows = rows()
    monkeypatch.setattr(graph, "PAGERANK_BROADCAST_MAX_V", 0)
    merge_rows = rows()
    assert broadcast_rows == merge_rows
    assert len(broadcast_rows) == graph.TOP_N


def test_cc_regimes_bit_identical(spark, monkeypatch):
    """connected_components' r12 folded-broadcast regime (self-loops
    baked into a d-pinned edge list + explicit labels broadcast) must
    equal the merge loop row-for-row -- checked through BOTH the
    seeded/incremental caller and a plain dedup caller (probe
    tools/probe_cc_r12.py won all four sf0.1 head-to-heads)."""
    from ushas_spark.operators import dedup

    for fn in (
        graph.graph_components_incremental,
        dedup.dedup_cluster_components,
    ):
        def rows():
            out = [tuple(r) for r in fn(spark, SF_DIR).collect()]
            _release(spark)
            return out

        broadcast_rows = rows()
        monkeypatch.setattr(dedup, "CC_BROADCAST_MAX_V", 0)
        merge_rows = rows()
        monkeypatch.undo()
        assert broadcast_rows == merge_rows
        assert len(broadcast_rows) > 0


def test_triangle_regimes_bit_identical(spark, monkeypatch):
    """triangle_summary's r12 broadcast regime (probe
    tools/probe_triangle_r12.py; won all three interleaved isolated
    sf0.1 pairings 3.50/2.69/2.72 vs 3.95/2.77/5.79 s) must equal the
    r10 shuffle shape row-for-row. The shuffle shape is the r10-r11
    driver-green formulation, so this twin pins the restructure against
    that evidence the same way the HITS/CC/k-core twins do."""

    def rows():
        out = [
            tuple(r)
            for r in graph.graph_triangle_count(spark, SF_DIR).collect()
        ]
        _release(spark)
        return out

    broadcast_rows = rows()
    monkeypatch.setattr(graph, "TRIANGLE_BROADCAST_MAX_E", 0)
    merge_rows = rows()
    assert broadcast_rows == merge_rows
    assert len(broadcast_rows) == 1  # one-row summary


def test_triangle_broadcast_plan_no_smj(spark):
    """Win condition of the triangle broadcast regime: the degree
    orientation and the closing intersection all join as broadcast
    BHJs -- no sort-merge join anywhere, and the E-row array-carrying
    exchange on t is gone (summed shuffles 8 -> 6). Audited via the
    same tree-walk counter PLANS.md uses."""
    from ushas_spark import durability

    durability.begin_plan_audit()
    df = graph.graph_triangle_count(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    segments = durability.end_plan_audit()
    _release(spark)
    totals = {}
    for seg in segments:
        for k, v in seg["counts"].items():
            totals[k] = totals.get(k, 0) + v
    assert totals["smj"] == 0, totals
    assert totals["bhj"] >= 3, totals
    assert totals["shuffles"] <= 6, totals


def test_kcore_regimes_bit_identical(spark, monkeypatch):
    """k-core's r12 broadcast-anti peel regime (probe
    tools/probe_kcore_r12.py; won both interleaved isolated sf0.1
    pairings 4.96/4.69 vs 5.86/5.69 s) must equal the r11 semi-join
    merge shape row-for-row. The merge shape is the r11 driver-green
    formulation, so this twin pins the restructure against that
    evidence the same way the HITS twin does."""
    def rows():
        out = [
            tuple(r) for r in graph.graph_kcore_summary(spark, SF_DIR).collect()
        ]
        _release(spark)
        return out

    broadcast_rows = rows()
    monkeypatch.setattr(graph, "KCORE_BROADCAST_MAX_V", 0)
    merge_rows = rows()
    assert broadcast_rows == merge_rows
    assert len(broadcast_rows) == 1  # one-row core summary


def test_kcore_broadcast_rounds_plan_one_exchange_no_smj(spark):
    """Win condition of the kcore broadcast regime: every peel round
    plans exactly one (groupBy) hash exchange, a broadcast anti BHJ,
    and no sort-merge join -- vs the merge shape's two exchanges + semi
    SMJ. Audited via the same tree-walk counter PLANS.md uses."""
    from ushas_spark import durability

    durability.begin_plan_audit()
    df = graph.graph_kcore_summary(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    segments = durability.end_plan_audit()
    _release(spark)
    round_segs = segments[-graph.KCORE_ROUNDS:]
    assert len(round_segs) == graph.KCORE_ROUNDS
    for seg in round_segs:
        assert seg["counts"]["shuffles"] == 1, seg["counts"]
        assert seg["counts"]["smj"] == 0, seg["counts"]
        assert seg["counts"]["bhj"] == 1, seg["counts"]


def test_small_v_regime_plans_zero_round_exchanges(spark):
    """The broadcast regime's win condition: each half-round segment
    (score join + groupBy over the groupBy-key-pinned pairs) plans no
    hash exchange at all -- the explicit broadcast plus co-partitioned
    partial agg finish in place. Segments audited via the same
    tree-walk counter PLANS.md uses."""
    from ushas_spark import durability

    durability.begin_plan_audit()
    df = graph.graph_hits_hub_authority(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    segments = durability.end_plan_audit()
    _release(spark)
    # Round segments = the non-pin segments (pin segments have no
    # executed post plan). The FIRST round segment carries the one-time
    # initial-hubs distinct (one |V|-row exchange); every later round
    # segment must plan zero.
    round_segs = [s for s in segments if s["post"] is not None]
    assert len(round_segs) == 2 * graph.HITS_ITERS
    assert round_segs[0]["counts"]["shuffles"] <= 1
    for seg in round_segs[1:]:
        assert seg["counts"]["shuffles"] == 0, seg["counts"]
