"""Lineage column tree model.

Mirrors the reference's ``catalyst.lineage.Column`` hierarchy (reference:
sql/catalyst/.../catalyst/lineage/Column.scala:23-45 -- a TreeNode with
``childrenInternal``, ``name``, ``exprId``):

- :class:`ExpressionColumn` -- a named expression output (project-list /
  aggregate / window entry); reference ExpressionColumn.scala:22.
- :class:`RelationColumn` -- a leaf attribute of a source relation,
  carrying the relation's identity (catalog table or file path); reference
  RelationColumn.scala:22 (``source`` = catalogTable for Hive, "" otherwise
  -- we always record the best identity we can extract).
- :class:`UnionColumn` -- one output position of a Union, pairing the
  aligned columns of every branch (reference UnionColumn.scala:22 handles
  exactly 2 branches; ours is n-ary).

``tree_string`` reproduces Catalyst's ``TreeNode.treeString`` layout
(`+-`/`:-` branches) so output shapes are comparable with the reference
README's examples (效果展示 section 2).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Iterator


@dataclass
class LineageColumn:
    """Base lineage node: a column with provenance children."""

    name: str
    expr_id: int
    children: list["LineageColumn"] = field(default_factory=list)

    @property
    def kind(self) -> str:
        return type(self).__name__

    def _label(self, ids: dict[int, int] | None) -> str:
        eid = self.expr_id if ids is None else ids.setdefault(self.expr_id, len(ids))
        return f"{self.kind}({self.name}#{eid})"

    def leaves(self) -> Iterator["RelationColumn"]:
        if isinstance(self, RelationColumn):
            yield self
        for c in self.children:
            yield from c.leaves()

    def tree_string(self, normalize_ids: bool = False) -> str:
        """Catalyst-style tree rendering. ``normalize_ids`` renumbers
        exprIds in visit order (stable across sessions -- for golden
        tests; raw ids are fresh per analysis like the reference's)."""
        ids: dict[int, int] | None = {} if normalize_ids else None
        lines: list[str] = []
        self._render(lines, "", "", ids)
        return "\n".join(lines)

    def _render(
        self,
        lines: list[str],
        prefix: str,
        child_prefix: str,
        ids: dict[int, int] | None,
    ) -> None:
        lines.append(prefix + self._label(ids))
        n = len(self.children)
        for i, c in enumerate(self.children):
            last = i == n - 1
            branch = "+- " if last else ":- "
            extend = "   " if last else ":  "
            c._render(lines, child_prefix + branch, child_prefix + extend, ids)

    def to_dict(self) -> dict:
        d: dict = {"kind": self.kind, "name": self.name, "exprId": self.expr_id}
        if isinstance(self, RelationColumn):
            d["source"] = self.source
        if isinstance(self, ExpressionColumn) and self.expression:
            d["expression"] = self.expression
        if self.children:
            d["children"] = [c.to_dict() for c in self.children]
        return d


@dataclass
class ExpressionColumn(LineageColumn):
    """Named expression output; ``expression`` holds the SQL form when the
    entry is more than a bare attribute reference."""

    expression: str = ""

    def _label(self, ids: dict[int, int] | None) -> str:
        base = super()._label(ids)
        return f"{base} = {self.expression}" if self.expression else base


@dataclass
class RelationColumn(LineageColumn):
    """Leaf: an attribute of a source relation. ``source`` identifies the
    relation: catalog table name, file path(s), 'Range', 'LogicalRDD',
    'Streaming:<source>', ... (reference keeps catalogTable for Hive and ""
    otherwise; we record an identity for every leaf type)."""

    source: str = ""

    def _label(self, ids: dict[int, int] | None) -> str:
        base = super()._label(ids)
        return f"{base} <- {self.source}" if self.source else base


@dataclass
class UnionColumn(LineageColumn):
    """One output position of a Union: children are the aligned columns
    from each branch (n-ary; reference pairs exactly two)."""


class LineageGraph:
    """Per-output-column provenance forest for one DataFrame.

    The reference exposes ``plan.lineageChildren: Seq[Column]`` on every
    node (LineageEntity.scala:22-35); the user-facing unit is the analyzed
    root's seq, which is what this wraps.
    """

    def __init__(self, columns: list[LineageColumn]):
        self.columns = columns

    def __len__(self) -> int:
        return len(self.columns)

    def column(self, name: str) -> LineageColumn:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    def tree_string(self, normalize_ids: bool = False) -> str:
        ids: dict[int, int] | None = {} if normalize_ids else None
        lines: list[str] = []
        for c in self.columns:
            c._render(lines, "", "", ids)
        return "\n".join(lines)

    def to_json(self, indent: int | None = None) -> str:
        return json.dumps([c.to_dict() for c in self.columns], indent=indent)

    def edges(self, short_source: bool = True) -> list[tuple[str, str, str]]:
        """Flat provenance edges (output_column, source, source_column),
        deduplicated + sorted -- the queryable/storable form the reference
        README leaves as an open extension (你可以做的事 section 2)."""
        out = set()
        for col in self.columns:
            for leaf in col.leaves():
                src = _short_source(leaf.source) if short_source else leaf.source
                out.add((col.name, src, leaf.name))
        return sorted(out)


def _short_source(source: str) -> str:
    """'file:/data/sf0.01/nation.parquet' -> 'nation'."""
    if not source:
        return source
    last = source.rstrip("/").split("/")[-1]
    return last.split(".")[0] if "." in last else last
