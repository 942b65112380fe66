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
