"""Bottom-up lineage resolution over the analyzed logical plan (py4j).

Re-implements the reference's two Analyzer rules as one post-hoc walk
(reference: analysis/ResolveLineage.scala):

- ``ResolveRelation`` (:120-136): every leaf node's output attributes
  become RelationColumns.
- ``ResolveExpression`` (:29-118): Project builds an ExpressionColumn per
  project-list entry, matching each referenced attribute to the child's
  lineage column with the same exprId via a hash map (``fetchRelation``
  :32-43, ``findAllChildren`` :51-74 -- which flattens intermediate
  expression structure, so ``substr(a+1,0,1) AS c`` yields ``c <- a``);
  Union zips branch lineages into UnionColumns (:96-107); every other
  non-leaf concatenates its children's lineage (:108-116).

Deliberate extensions over the reference (SURVEY.md section 2.11 "fix, not
copy"): Aggregate aggregateExpressions, Window windowExpressions, and
Generate generatorOutput are treated like project lists (the reference
passes them through, losing column-level precision); Union is n-ary; no
debug printlns; literal-only expressions don't crash (the reference's
ExpressionColumn throws MatchError on non-named leaves, :41-53).

Everything here is driver-side plan metadata: cost is O(plan size),
independent of data scale (BASELINE.md target <100ms/query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ushas_spark.lineage.model import (
    ExpressionColumn,
    LineageColumn,
    LineageGraph,
    RelationColumn,
    UnionColumn,
)


def lineage(df: DataFrame) -> LineageGraph:
    """Compute the per-output-column provenance forest of ``df``.

    The user-facing equivalent of the reference's
    ``df.queryExecution.analyzed.lineageChildren`` (README 效果展示 4).
    """
    jplan = df._jdf.queryExecution().analyzed()
    cols = _resolve(jplan)
    # The root's lineage list can be wider than the visible output (e.g.
    # Window appends internal duplicates); restrict to df.output order.
    out = jplan.output()
    by_id = _index_by_expr_id(cols)
    result = []
    for i in range(out.size()):
        attr = out.apply(i)
        eid = attr.exprId().id()
        col = by_id.get(eid)
        if col is None:  # unseen: conservatively a free relation column
            col = RelationColumn(attr.name(), eid, source="")
        result.append(col)
    return LineageGraph(result)


# ---------------------------------------------------------------- helpers


def _seq(jseq) -> list:
    return [jseq.apply(i) for i in range(jseq.size())]


def _index_by_expr_id(cols: list[LineageColumn]) -> dict[int, LineageColumn]:
    """exprId -> lineage column; first occurrence wins (stable under the
    duplicated attrs a Window/self-join plan can carry)."""
    by_id: dict[int, LineageColumn] = {}
    for c in cols:
        by_id.setdefault(c.expr_id, c)
    return by_id


def _refs_of(jexpr) -> list[tuple[str, int]]:
    """All attribute references inside an expression -- the flattened
    ``collectLeaves`` semantics of the reference's findAllChildren."""
    refs = jexpr.references().toSeq()
    return [(a.name(), a.exprId().id()) for a in _seq(refs)]


def _sql_of(jexpr) -> str:
    try:
        return jexpr.sql()
    except Exception:
        return ""


def _named_to_column(jne, by_id: dict[int, LineageColumn]) -> ExpressionColumn:
    """One named output entry -> ExpressionColumn linked to the child
    lineage columns it references (reference ResolveLineage.scala:76-94)."""
    name = jne.name()
    eid = jne.exprId().id()
    children: list[LineageColumn] = []
    seen: set[int] = set()
    for _, ref_id in _refs_of(jne):
        if ref_id in seen:
            continue
        seen.add(ref_id)
        child = by_id.get(ref_id)
        if child is not None:
            children.append(child)
    cls_name = jne.getClass().getSimpleName()
    expression = "" if cls_name == "AttributeReference" else _sql_of(jne)
    return ExpressionColumn(name, eid, children, expression=expression)


def _leaf_source(jnode) -> str:
    """Best-effort identity of a leaf relation (reference attributes Hive
    tables via catalogTable -- ResolveHiveRelation.scala:11-39; we also
    cover file relations, ranges, local/RDD relations, streaming)."""
    cls = jnode.getClass().getSimpleName()
    try:
        if cls == "LogicalRelation":
            ct = jnode.catalogTable()
            if ct.isDefined():
                return str(ct.get().identifier().unquotedString())
            rel = jnode.relation()
            try:
                paths = rel.location().rootPaths()
                return ",".join(str(p) for p in _seq(paths))
            except Exception:
                rel_cls = str(rel.getClass().getSimpleName())
                if rel_cls == "JDBCRelation":
                    # JDBCRelation(tbl) [numPartitions=N] -- keep the
                    # table identity, drop the partitioning suffix.
                    return str(rel.toString()).split(" [")[0]
                return rel_cls
        if cls in ("HiveTableRelation", "UnresolvedCatalogRelation"):
            return str(jnode.tableMeta().identifier().unquotedString())
        if cls == "StreamingRelation":
            return f"Streaming:{jnode.sourceName()}"
        if cls == "StreamingRelationV2":
            return f"Streaming:{jnode.sourceName()}"
        if cls == "DataSourceV2Relation":
            return str(jnode.name())
    except Exception:
        pass
    return cls  # Range, LocalRelation, LogicalRDD, OneRowRelation, ...


# ---------------------------------------------------------------- resolver


def _resolve(jnode, cte_env: dict[int, list[LineageColumn]] | None = None) -> list[LineageColumn]:
    """Bottom-up lineage of one plan node (list aligned with the node's
    attribute surface, keyed by exprId). ``cte_env`` maps cteId -> the
    defining subplan's lineage, threaded through WithCTE scopes (Spark 3.2+
    analyzes CTEs to WithCTE/CTERelationDef/CTERelationRef rather than
    inlining -- a plan shape the reference, on 2.4, never sees)."""
    cte_env = cte_env or {}
    jchildren = _seq(jnode.children())
    name = jnode.nodeName()

    if name == "WithCTE":
        # children: CTERelationDef*, then the main plan. Defs can reference
        # earlier defs, so extend the env left to right.
        env = dict(cte_env)
        for jc in jchildren[:-1]:
            if jc.nodeName() == "CTERelationDef":
                env[jc.id()] = _resolve(jc, env)
        return _resolve(jchildren[-1], env)

    if name == "CTERelationRef":
        defs = cte_env.get(jnode.cteId())
        out_attrs = _seq(jnode.output())
        if defs is None:
            return [
                RelationColumn(a.name(), a.exprId().id(), source="CTERelationRef")
                for a in out_attrs
            ]
        cols: list[LineageColumn] = []
        for i, a in enumerate(out_attrs):
            # ref attrs align positionally with the def's output (fresh
            # exprIds when the CTE is referenced more than once).
            if i < len(defs):
                d = defs[i]
                if d.expr_id == a.exprId().id():
                    cols.append(d)
                else:
                    cols.append(ExpressionColumn(a.name(), a.exprId().id(), [d]))
            else:
                cols.append(RelationColumn(a.name(), a.exprId().id(), source="CTERelationRef"))
        return cols

    if not jchildren:  # ResolveRelation (reference :120-136)
        source = _leaf_source(jnode)
        return [
            RelationColumn(a.name(), a.exprId().id(), source=source)
            for a in _seq(jnode.output())
        ]

    child_lists = [_resolve(jc, cte_env) for jc in jchildren]
    child_lineage: list[LineageColumn] = [c for lst in child_lists for c in lst]
    by_id = _index_by_expr_id(child_lineage)

    if name == "Project":
        return [_named_to_column(ne, by_id) for ne in _seq(jnode.projectList())]

    if name == "Aggregate":
        # Extension: reference passes Aggregate through (README 你可以做的事 1).
        return [
            _named_to_column(ne, by_id) for ne in _seq(jnode.aggregateExpressions())
        ]

    if name == "Window":
        # Window output = child output ++ window expressions.
        return child_lineage + [
            _named_to_column(ne, by_id) for ne in _seq(jnode.windowExpressions())
        ]

    if name == "Generate":
        # Generated attrs derive from the generator's references; the
        # child's columns pass through alongside.
        gen_refs: list[LineageColumn] = []
        seen: set[int] = set()
        for _, rid in _refs_of(jnode.generator()):
            if rid not in seen and rid in by_id:
                seen.add(rid)
                gen_refs.append(by_id[rid])
        gen_expr = _sql_of(jnode.generator())
        generated = [
            ExpressionColumn(a.name(), a.exprId().id(), list(gen_refs), expression=gen_expr)
            for a in _seq(jnode.generatorOutput())
        ]
        return child_lineage + generated

    if name == "Union":
        # n-ary zip (reference :96-107 handles exactly 2 branches).
        branches = child_lists
        width = min(len(b) for b in branches)
        out_attrs = _seq(jnode.output())
        cols = []
        for i in range(width):
            aligned = [b[i] for b in branches]
            lead = out_attrs[i] if i < len(out_attrs) else None
            nm = lead.name() if lead is not None else aligned[0].name
            eid = lead.exprId().id() if lead is not None else aligned[0].expr_id
            cols.append(UnionColumn(nm, eid, aligned))
        return cols

    # Everything else (Filter, Join, Sort, Limit, SubqueryAlias, Distinct,
    # Repartition, EventTimeWatermark, ...) passes through: concat of
    # children's lineage (reference :108-116).
    return child_lineage
