"""HTML graph visualization sink (driver-side utility, not a Ray stage).

Reference analogue: the pyvis interactive-HTML visualizer
(reference: src/services/graph_visualizer.py:91-236). Re-implemented without
third-party viz dependencies: a self-contained HTML file embedding the
node/edge JSON and a minimal canvas force layout. Color/size by node type,
edge width by confidence, labels truncated at 30 chars — mirroring the
reference's visual encoding (graph_visualizer.py:67,181).
"""

from __future__ import annotations

import json

TYPE_COLORS = {
    "paper": "#4f8cc9", "concept": "#65b265", "method": "#d98b48",
    "dataset": "#9a6fb8", "metric": "#c94f6d", "author": "#808a46",
    "task": "#4fb8b0",
}

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>knowledge graph</title>
<style>body{margin:0;background:#111}canvas{display:block}</style></head>
<body><canvas id="c"></canvas><script>
const DATA = %s;
const cv = document.getElementById('c'); const ctx = cv.getContext('2d');
cv.width = innerWidth; cv.height = innerHeight;
const N = DATA.nodes, E = DATA.edges;
const idx = {}; N.forEach((n,i)=>{idx[n.id]=i; n.x=Math.random()*cv.width; n.y=Math.random()*cv.height;});
for (let it=0; it<200; it++) {
  N.forEach(a=>{N.forEach(b=>{if(a===b)return; let dx=a.x-b.x, dy=a.y-b.y, d2=dx*dx+dy*dy+0.01;
    let f=800/d2; a.x+=dx*f; a.y+=dy*f;});});
  E.forEach(e=>{const a=N[idx[e.s]], b=N[idx[e.t]]; if(!a||!b)return;
    const dx=b.x-a.x, dy=b.y-a.y; a.x+=dx*0.01; a.y+=dy*0.01; b.x-=dx*0.01; b.y-=dy*0.01;});
  N.forEach(n=>{n.x=Math.min(cv.width-20,Math.max(20,n.x)); n.y=Math.min(cv.height-20,Math.max(20,n.y));});
}
ctx.clearRect(0,0,cv.width,cv.height);
E.forEach(e=>{const a=N[idx[e.s]], b=N[idx[e.t]]; if(!a||!b)return;
  ctx.strokeStyle='rgba(200,200,200,0.35)'; ctx.lineWidth=Math.max(0.5, e.w*2);
  ctx.beginPath(); ctx.moveTo(a.x,a.y); ctx.lineTo(b.x,b.y); ctx.stroke();});
N.forEach(n=>{ctx.fillStyle=n.c; ctx.beginPath();
  ctx.arc(n.x,n.y,4+Math.min(10,n.s),0,7); ctx.fill();
  ctx.fillStyle='#ddd'; ctx.font='10px sans-serif'; ctx.fillText(n.l, n.x+8, n.y+3);});
</script></body></html>
"""


def graph_to_html(nodes, edges, path: str, max_nodes: int = 300) -> str:
    """Write a self-contained HTML rendering of the graph.

    ``nodes``: iterable of dicts with node_id/node_type/label/n_docs;
    ``edges``: dicts with src_id/dst_id/confidence. Nodes beyond ``max_nodes``
    are dropped (reference: nodes[:limit], graph_visualizer.py:72-73)."""
    nodes = list(nodes)[:max_nodes]
    keep = {n["node_id"] for n in nodes}
    payload = {
        "nodes": [
            {
                "id": n["node_id"],
                "l": (n["label"][:30] + "…") if len(n["label"]) > 30 else n["label"],
                "c": TYPE_COLORS.get(n["node_type"], "#999999"),
                "s": int(n.get("n_docs", 1)),
            }
            for n in nodes
        ],
        "edges": [
            {"s": e["src_id"], "t": e["dst_id"], "w": float(e.get("confidence", 0.5))}
            for e in edges
            if e["src_id"] in keep and e["dst_id"] in keep
        ],
    }
    with open(path, "w") as f:
        f.write(_TEMPLATE % json.dumps(payload))
    return path
