"""Graph visualization sink (ref S11: pyvis HTML export,
/root/reference/knowledge_graph_builder.py:586-673).

Visualization is not a distributed concern (SURVEY.md §2.1/S11): the engine
materializes `nodes`/`triples` tables; this module exports a bounded sample
to a single self-contained HTML file with an inline force-layout (no pyvis /
vis.js dependency — zero-install, works offline). Reference visual semantics
preserved: edge width = weight * 5 (ref :621), node size (ref :517, :493),
topic nodes colored #ff7f0e (ref :496), concepts #1f77b4.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>knowledge graph</title>
<style>
 body {{ margin:0; font:12px sans-serif; }}
 svg {{ width:100vw; height:100vh; }}
 line {{ stroke:#999; stroke-opacity:.6; }}
 circle {{ stroke:#fff; stroke-width:1.5px; cursor:grab; }}
 text {{ pointer-events:none; font-size:10px; }}
</style></head>
<body><svg></svg>
<script>
const data = {data};
// minimal force simulation (Fruchterman-Reingold-ish), dependency-free
const W = innerWidth, H = innerHeight;
const nodes = data.nodes.map((n,i) => ({{...n,
  x: W/2 + 200*Math.cos(2*Math.PI*i/data.nodes.length),
  y: H/2 + 200*Math.sin(2*Math.PI*i/data.nodes.length), vx:0, vy:0}}));
const byId = Object.fromEntries(nodes.map(n => [n.id, n]));
const links = data.links.filter(l => byId[l.source] && byId[l.target]);
for (let it = 0; it < 300; it++) {{
  for (const a of nodes) for (const b of nodes) {{
    if (a === b) continue;
    let dx = a.x-b.x, dy = a.y-b.y, d2 = dx*dx+dy*dy+0.01, f = 800/d2;
    a.vx += dx*f; a.vy += dy*f;
  }}
  for (const l of links) {{
    const s = byId[l.source], t = byId[l.target];
    let dx = t.x-s.x, dy = t.y-s.y, d = Math.sqrt(dx*dx+dy*dy)+0.01;
    const f = (d-80)*0.02;
    s.vx += dx/d*f; s.vy += dy/d*f; t.vx -= dx/d*f; t.vy -= dy/d*f;
  }}
  for (const n of nodes) {{
    n.x = Math.max(20, Math.min(W-20, n.x + n.vx*0.5));
    n.y = Math.max(20, Math.min(H-20, n.y + n.vy*0.5));
    n.vx *= 0.6; n.vy *= 0.6;
  }}
}}
const svg = document.querySelector('svg');
const ns = 'http://www.w3.org/2000/svg';
for (const l of links) {{
  const s = byId[l.source], t = byId[l.target];
  const e = document.createElementNS(ns, 'line');
  e.setAttribute('x1', s.x); e.setAttribute('y1', s.y);
  e.setAttribute('x2', t.x); e.setAttribute('y2', t.y);
  e.setAttribute('stroke-width', Math.max(0.5, l.width));
  const ti = document.createElementNS(ns, 'title');
  ti.textContent = l.label; e.appendChild(ti);
  svg.appendChild(e);
}}
for (const n of nodes) {{
  const c = document.createElementNS(ns, 'circle');
  c.setAttribute('cx', n.x); c.setAttribute('cy', n.y);
  c.setAttribute('r', Math.max(4, Math.sqrt(n.size)));
  c.setAttribute('fill', n.color);
  const ti = document.createElementNS(ns, 'title');
  ti.textContent = n.id + ' (' + n.type + ')'; c.appendChild(ti);
  svg.appendChild(c);
  const t = document.createElementNS(ns, 'text');
  t.setAttribute('x', n.x + 8); t.setAttribute('y', n.y + 3);
  t.textContent = n.id.length > 24 ? n.id.slice(0, 24) + '…' : n.id;
  svg.appendChild(t);
}}
</script></body></html>
"""

NODE_COLORS = {"topic": "#ff7f0e", "concept": "#1f77b4"}  # ref :496, default


def export_html(
    nodes: DataFrame, triples: DataFrame, out_path: str, limit: int = 200
) -> str:
    """Write a bounded-sample interactive HTML of the graph; returns path.

    Samples the top-`limit` nodes by size (importance-weighted, ref :517)
    and the edges among them — a driver-side O(limit) operation regardless
    of graph scale.
    """
    nrows = (
        nodes.select("node_id", "node_type", "size")
        .orderBy("size", ascending=False)
        .limit(limit)
        .collect()
    )
    keep = {r["node_id"] for r in nrows}
    erows = [
        r
        for r in triples.select("subj", "pred", "obj", "weight").limit(limit * 20).collect()
        if r["subj"] in keep and r["obj"] in keep
    ]
    data = {
        "nodes": [
            {
                "id": r["node_id"],
                "type": r["node_type"],
                "size": float(r["size"] or 10.0),
                "color": NODE_COLORS.get(r["node_type"], "#1f77b4"),
            }
            for r in nrows
        ],
        "links": [
            {
                "source": r["subj"],
                "target": r["obj"],
                "label": r["pred"],
                "width": float(r["weight"] or 0.1) * 5,  # ref :621
            }
            for r in erows
        ],
    }
    html = _TEMPLATE.format(data=json.dumps(data))
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(html)
    return out_path
