"""Data lineage tracker: source→target edges, traversal, impact analysis.

Parity target: src/utils/data_lineage_tracker.py:92-580 (edges stored in
DB; upstream/downstream traversal; impact analysis = transitive
downstream closure).
"""

from __future__ import annotations

from collections import deque
from typing import Any


class LineageTracker:
    def __init__(self, store):
        self.store = store

    def add_edge(self, run_id: int | None, src: str, dst: str,
                 transform: str | None = None) -> int:
        return self.store.insert(
            "LINEAGE_EDGES",
            {"run_id": run_id, "src": src, "dst": dst, "transform": transform},
        )

    def _edges(self) -> list[dict[str, Any]]:
        return self.store.query("SELECT * FROM LINEAGE_EDGES")

    def downstream(self, node: str) -> list[str]:
        return self._traverse(node, forward=True)

    def upstream(self, node: str) -> list[str]:
        return self._traverse(node, forward=False)

    def impact_analysis(self, node: str) -> dict[str, Any]:
        """Everything that would be affected if ``node`` changed."""
        affected = self.downstream(node)
        return {"node": node, "affected": affected, "count": len(affected)}

    def _traverse(self, start: str, forward: bool) -> list[str]:
        adj: dict[str, set[str]] = {}
        for e in self._edges():
            a, b = (e["src"], e["dst"]) if forward else (e["dst"], e["src"])
            adj.setdefault(a, set()).add(b)
        seen: set[str] = set()
        order: list[str] = []
        q = deque([start])
        while q:
            n = q.popleft()
            for nxt in sorted(adj.get(n, ())):
                if nxt not in seen:
                    seen.add(nxt)
                    order.append(nxt)
                    q.append(nxt)
        return order

    def export_graph(self) -> dict[str, Any]:
        edges = self._edges()
        nodes = sorted({e["src"] for e in edges} | {e["dst"] for e in edges})
        return {"nodes": nodes, "edges": [
            {"src": e["src"], "dst": e["dst"], "transform": e["transform"]}
            for e in edges
        ]}

    # -------------------------------------------------------- column level
    # Reference: record_column_derivation / get_column_lineage
    # (data_lineage_tracker.py:158-176, 397-428). Column nodes reuse the
    # same edge table with "table.column" node ids, so table- and
    # column-level graphs traverse with ONE mechanism.

    @staticmethod
    def _col_node(table: str, column: str) -> str:
        return f"{table}.{column}"

    def add_column_derivation(
        self,
        run_id: int | None,
        target_table: str,
        target_column: str,
        sources: list[tuple[str, str]],
        expression: str | None = None,
    ) -> None:
        """Record that target_table.target_column derives from the given
        (table, column) sources via ``expression``."""
        dst = self._col_node(target_table, target_column)
        for src_table, src_col in sources:
            self.add_edge(
                run_id, self._col_node(src_table, src_col), dst, expression
            )

    def column_lineage(self, table: str, column: str) -> dict[str, Any]:
        """Full upstream derivation chain of one column (transitive)."""
        node = self._col_node(table, column)
        ups = self.upstream(node)
        exprs = {
            e["dst"]: e["transform"]
            for e in self._edges()
            if e["transform"] is not None
        }
        return {
            "column": node,
            "upstream_columns": ups,
            "expression": exprs.get(node),
        }
