"""Self-contained interactive schema HTML (SURVEY.md §2.6).

The reference renders the type-level schema graph as an interactive HTML
document via gravis/d3 (kgw/_shared/load.py:84-184 ``sqlite_to_schema`` and
:187-283 ``sqlite_to_schema_compact``). Neither gravis nor a JS runtime is
available here, so this sink renders an equivalent **dependency-free**
document: one HTML file with an inline SVG — circle layout, node size
normalized by instance count (the reference's
``use_node_size_normalization`` 10→50), edge width normalized by triple
count (``edge_size_normalization_max=4``), hover tooltips via native SVG
``<title>`` elements carrying the reference's exact hover strings, and a
legend table. Fully offline, no external assets.

The aggregates underneath are the oracle-verified distributed pipelines
(``type_histogram``, ``schema_graph``, ``schema_graph_compact`` —
stages/graph.py); only the final tiny type-level table reaches the driver
for rendering.
"""

from __future__ import annotations

import html
import math
import os

import ray.data as rd

# gravis-like defaults (reference load.py:169-184)
_NODE_R_MIN, _NODE_R_MAX = 10.0, 50.0
_EDGE_W_MIN, _EDGE_W_MAX = 1.0, 4.0
_W, _H = 900, 800

_PALETTE = [
    "#4c78a8", "#f58518", "#54a24b", "#e45756", "#72b7b2",
    "#eeca3b", "#b279a2", "#ff9da6", "#9d755d", "#bab0ac",
]


def _norm(vals, lo: float, hi: float) -> list[float]:
    """sqrt-area normalization of counts into [lo, hi] (degenerate range →
    midpoint), matching gravis' size normalization behavior."""
    if not vals:
        return []
    r = [math.sqrt(max(v, 0)) for v in vals]
    rmin, rmax = min(r), max(r)
    if rmax <= rmin:
        return [(lo + hi) / 2.0] * len(r)
    return [lo + (x - rmin) * (hi - lo) / (rmax - rmin) for x in r]


def _esc(s) -> str:
    return html.escape(str(s), quote=True)


def write_schema_html(
    nodes: rd.Dataset,
    edges: rd.Dataset,
    path: str,
    *,
    compact: bool = False,
    node_type_to_color: dict | None = None,
    schema_rows=None,
) -> None:
    """Render the type-level schema graph to a self-contained HTML file.

    ``compact=False``: one arrow per (source_type, edge_type, target_type)
    with its triple count (reference sqlite_to_schema). ``compact=True``:
    parallel arrows condensed per (source_type, target_type) with edge and
    edge-type counts (reference sqlite_to_schema_compact).

    ``schema_rows`` optionally supplies the already-computed edge aggregate
    (a pandas frame in ``schema_graph[_compact]`` layout) so callers that
    need the rows anyway (e.g. the schema.json sidecar) don't run the
    distributed aggregate twice.
    """
    from kgw_ray.stages.graph import (
        schema_graph,
        schema_graph_compact,
        type_histogram,
    )

    colors = dict(node_type_to_color or {})
    node_rows = type_histogram(nodes).to_pandas()  # (type, n) count DESC, type ASC
    if "type" not in node_rows.columns:  # empty pulls drop their schema
        node_rows = node_rows.reindex(columns=["type", "n"])
    ntypes = list(node_rows["type"])
    counts = list(node_rows["n"])
    for i, t in enumerate(ntypes):
        colors.setdefault(t, _PALETTE[i % len(_PALETTE)])

    if compact:
        df = (
            schema_rows
            if schema_rows is not None
            else schema_graph_compact(nodes, edges).to_pandas()
        )
        edge_items = [
            {
                "source": r.source_type,
                "target": r.target_type,
                "label": f"{int(r.n_edge_types)} edge types",
                "count": int(r.n_edges),
                "hover": (
                    f"Source: {r.source_type}\n"
                    f"Target: {r.target_type}\n\n"
                    f"Number of edges: {int(r.n_edges)}\n"
                    f"Number of edge types: {int(r.n_edge_types)}"
                ),
                "key": f"{r.source_type}|*|{r.target_type}",
            }
            for r in df.itertuples()
        ]
    else:
        df = (
            schema_rows
            if schema_rows is not None
            else schema_graph(nodes, edges).to_pandas()
        )
        edge_items = [
            {
                "source": r.source_type,
                "target": r.target_type,
                "label": r.edge_type,
                "count": int(r.n),
                "hover": (
                    f"Edge type: {r.edge_type}\n"
                    f"Source: {r.source_type}\n"
                    f"Target: {r.target_type}\n\n"
                    f"Number of instances: {int(r.n)}"
                ),
                "key": f"{r.source_type}|{r.edge_type}|{r.target_type}",
            }
            for r in df.itertuples()
        ]

    # circle layout (deterministic): histogram order around the circle
    n = max(len(ntypes), 1)
    cx0, cy0 = _W / 2.0, _H / 2.0
    ring = min(_W, _H) / 2.0 - _NODE_R_MAX - 40
    pos = {}
    for i, t in enumerate(ntypes):
        ang = 2 * math.pi * i / n - math.pi / 2
        pos[t] = (cx0 + ring * math.cos(ang), cy0 + ring * math.sin(ang))
    radii = dict(zip(ntypes, _norm(counts, _NODE_R_MIN, _NODE_R_MAX)))
    widths = _norm([e["count"] for e in edge_items], _EDGE_W_MIN, _EDGE_W_MAX)

    # parallel-edge curvature offsets (reference edge_curvature=0.1)
    seen_pairs: dict[tuple, int] = {}
    svg_edges = []
    for e, w in zip(edge_items, widths):
        s, t = e["source"], e["target"]
        x1, y1 = pos[s]
        x2, y2 = pos[t]
        color = colors.get(s, "#888888")
        k = seen_pairs.get((s, t), 0)
        seen_pairs[(s, t)] = k + 1
        if s == t:
            r = radii[s]
            d = (
                f"M {x1:.1f} {y1 - r:.1f} "
                f"a {r * 0.8 + 6 * k:.1f} {r * 0.8 + 6 * k:.1f} 0 1 1 1 0.5"
            )
        else:
            mx, my = (x1 + x2) / 2.0, (y1 + y2) / 2.0
            dx, dy = x2 - x1, y2 - y1
            norm = math.hypot(dx, dy) or 1.0
            off = 0.1 * norm + 14 * k
            qx, qy = mx - dy / norm * off, my + dx / norm * off
            d = f"M {x1:.1f} {y1:.1f} Q {qx:.1f} {qy:.1f} {x2:.1f} {y2:.1f}"
        svg_edges.append(
            f'<g class="edge" data-edge="{_esc(e["key"])}">'
            f'<path d="{d}" fill="none" stroke="{_esc(color)}" '
            f'stroke-width="{w:.2f}" marker-end="url(#arrow)" opacity="0.55">'
            f"<title>{_esc(e['hover'])}</title></path></g>"
        )

    svg_nodes = []
    for t, c in zip(ntypes, counts):
        x, y = pos[t]
        r = radii[t]
        hover = f"Node type: {t}\n\nNumber of instances: {int(c)}"
        svg_nodes.append(
            f'<g class="node" data-type="{_esc(t)}">'
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="{r:.1f}" '
            f'fill="{_esc(colors[t])}" stroke="#333333" stroke-width="1">'
            f"<title>{_esc(hover)}</title></circle>"
            f'<text x="{x:.1f}" y="{y + r + 14:.1f}" text-anchor="middle" '
            f'font-size="12">{_esc(t)}</text></g>'
        )

    legend = "".join(
        f'<tr><td><span style="color:{_esc(colors[t])}">&#9679;</span></td>'
        f"<td>{_esc(t)}</td><td>{int(c)}</td></tr>"
        for t, c in zip(ntypes, counts)
    )
    title = "Schema (compact)" if compact else "Schema"
    doc = f"""<!DOCTYPE html>
<html xmlns="http://www.w3.org/1999/xhtml">
<head>
<meta charset="utf-8"/>
<title>{title}</title>
<style>
body {{ font-family: sans-serif; margin: 16px; }}
svg {{ border: 1px solid #dddddd; background: #fcfcfc; }}
.node:hover circle {{ stroke-width: 3; }}
.edge:hover path {{ opacity: 1.0; }}
table {{ border-collapse: collapse; margin-top: 12px; }}
td {{ padding: 2px 10px; }}
</style>
</head>
<body>
<h2>{title}: {len(ntypes)} node types, {len(edge_items)} arrows</h2>
<svg width="{_W}" height="{_H}" viewBox="0 0 {_W} {_H}" xmlns="http://www.w3.org/2000/svg">
<defs>
<marker id="arrow" viewBox="0 0 10 10" refX="9" refY="5" markerWidth="7" markerHeight="7" orient="auto-start-reverse">
<path d="M 0 0 L 10 5 L 0 10 z" fill="#666666"/>
</marker>
</defs>
{''.join(svg_edges)}
{''.join(svg_nodes)}
</svg>
<table><thead><tr><th></th><th>node type</th><th>instances</th></tr></thead>
<tbody>{legend}</tbody></table>
</body>
</html>
"""
    tmp = f"{path}.partial"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(doc)
    os.replace(tmp, path)
