"""Derived-table DAG ordering.

The reference wires the DAG through ``input_tables``/``output_tables``
(database_manager.rs:83-95) and evaluates it by recursive hook fan-out
(transform_hook.rs:46-55). We evaluate it as an explicit topological
schedule per commit — same result, but batch-oriented so each node is one
distributed DataFrame computation instead of a per-row recursion.
"""

from __future__ import annotations

from reactivedb_spark.errors import ConfigError


def topo_order(edges: dict[str, list[str]]) -> list[str]:
    """Kahn's algorithm over table -> downstream-tables edges; raises on
    cycles (the reference would infinitely recurse on a cyclic config)."""
    nodes = set(edges)
    for outs in edges.values():
        nodes.update(outs)
    indeg = {n: 0 for n in nodes}
    for outs in edges.values():
        for o in outs:
            indeg[o] += 1
    ready = sorted(n for n, d in indeg.items() if d == 0)
    order: list[str] = []
    while ready:
        n = ready.pop(0)
        order.append(n)
        for o in edges.get(n, []):
            indeg[o] -= 1
            if indeg[o] == 0:
                # sorted insertion keeps the order deterministic
                import bisect

                bisect.insort(ready, o)
    if len(order) != len(nodes):
        raise ConfigError(f"cycle in derived-table DAG: {sorted(nodes - set(order))}")
    return order
