"""HTML graph visualization sink (driver-side utility, not a Ray stage).

Reference analogue: the pyvis interactive-HTML visualizer
(reference: src/services/graph_visualizer.py:91-236) and its BFS subgraph
view (graph_visualizer.py:266-330). Re-implemented without third-party viz
dependencies as a self-contained HTML file embedding the node/edge JSON and
a live canvas force simulation. Parity surface:

- physics simulation with a toggle (graph_visualizer.py:135-156)
- color by node type, size 25/15 paper/other, paper drawn as a box and
  everything else as a dot (graph_visualizer.py:167-186)
- hover tooltip with type/label + first properties (graph_visualizer.py:170-175)
- directed arrows, edge color by edge type, width by confidence, optional
  edge-type labels, edge hover title with type + confidence
  (graph_visualizer.py:188-231)
- node_type_filter / limit options (graph_visualizer.py:92-121)
- 30-char label truncation (graph_visualizer.py:181)
"""

from __future__ import annotations

import json

TYPE_COLORS = {
    "paper": "#4f8cc9", "concept": "#65b265", "method": "#d98b48",
    "dataset": "#9a6fb8", "metric": "#c94f6d", "author": "#808a46",
    "task": "#4fb8b0",
}

# Per-edge-type palette mirroring the reference's EDGE_COLORS map
# (graph_visualizer.py:30-40), extended with this engine's cross-doc
# predicates (stages/link.py vocabulary).
EDGE_COLORS = {
    "IMPROVES_ON": "#E74C3C",
    "INTRODUCES": "#3498DB",
    "USES_DATASET": "#F39C12",
    "EVALUATES_ON": "#9B59B6",
    "EVALUATES_WITH": "#1ABC9C",
    "CITES": "#34495E",
    "RELATED_TO": "#95A5A6",
    "COMPARES_WITH": "#5D8AA8",
    "COMPARES_TO": "#5D8AA8",
    "EXTENDS": "#2ECC71",
    "REFINES_CONCEPT": "#E67E22",
    "default": "#7F8C8D",
}

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>knowledge graph</title>
<style>body{margin:0;background:#222;font:12px sans-serif}canvas{display:block}
#tip{position:fixed;display:none;background:#111;color:#eee;border:1px solid #555;
  padding:6px 8px;border-radius:4px;pointer-events:none;max-width:320px;white-space:pre}
#legend{position:fixed;top:8px;right:8px;background:rgba(20,20,20,.85);color:#ddd;
  padding:8px 10px;border-radius:4px}
#legend span{display:inline-block;width:10px;height:10px;border-radius:5px;margin-right:6px}
</style></head>
<body><canvas id="c"></canvas><div id="tip"></div><div id="legend"></div><script>
// Interactive physics + hover/drag — the pyvis parity surface
// (reference graph_visualizer.py:91-236) without the dependency: a live
// force simulation (repulsion + spring + centering), node drag, hover
// tooltips for BOTH nodes and edges, directed arrowheads, per-type edge
// colors and optional edge-type labels.
const DATA = %s;
const PHYSICS = DATA.physics, EDGE_LABELS = DATA.edge_labels;
const cv = document.getElementById('c'); const ctx = cv.getContext('2d');
const tip = document.getElementById('tip');
cv.width = innerWidth; cv.height = innerHeight;
const N = DATA.nodes, E = DATA.edges;
const idx = {}; let seed = 42;
const rnd = () => (seed = (seed * 1103515245 + 12345) %% 2147483648) / 2147483648;
N.forEach((n,i)=>{idx[n.id]=i; n.x=rnd()*cv.width; n.y=rnd()*cv.height; n.vx=0; n.vy=0;
  n.r=(n.t==='paper'?12:6)+Math.min(8, Math.sqrt(n.s));});
const legend = {}; N.forEach(n=>legend[n.t]=n.c);
document.getElementById('legend').innerHTML = Object.entries(legend)
  .map(([t,c])=>`<div><span style="background:${c}"></span>${t}</div>`).join('');
let dragging=null, mouse={x:0,y:0}, hot=1.0;
function step(){
  if(!PHYSICS && hot < 0.999) return;
  N.forEach(a=>{N.forEach(b=>{if(a===b)return; let dx=a.x-b.x, dy=a.y-b.y,
    d2=dx*dx+dy*dy+0.01; let f=Math.min(2000/d2, 5); a.vx+=dx*f*0.01; a.vy+=dy*f*0.01;});});
  E.forEach(e=>{const a=N[idx[e.s]], b=N[idx[e.t]]; if(!a||!b)return;
    const dx=b.x-a.x, dy=b.y-a.y;
    a.vx+=dx*0.002*e.w; a.vy+=dy*0.002*e.w; b.vx-=dx*0.002*e.w; b.vy-=dy*0.002*e.w;});
  N.forEach(n=>{n.vx+=(cv.width/2-n.x)*1e-4; n.vy+=(cv.height/2-n.y)*1e-4;
    if(n===dragging){n.x=mouse.x; n.y=mouse.y; n.vx=n.vy=0; return;}
    n.vx*=0.85; n.vy*=0.85; n.x+=n.vx*hot; n.y+=n.vy*hot;
    n.x=Math.min(cv.width-15,Math.max(15,n.x)); n.y=Math.min(cv.height-15,Math.max(15,n.y));});
  hot=Math.max(PHYSICS?0.05:0.0, hot*0.999);
}
function arrow(a,b,color,w){
  const dx=b.x-a.x, dy=b.y-a.y, d=Math.hypot(dx,dy)||1;
  const tx=b.x-dx/d*(b.r+3), ty=b.y-dy/d*(b.r+3);
  ctx.strokeStyle=color; ctx.globalAlpha=0.55; ctx.lineWidth=w;
  ctx.beginPath(); ctx.moveTo(a.x,a.y); ctx.lineTo(tx,ty); ctx.stroke();
  const ah=5+w; ctx.fillStyle=color;
  ctx.beginPath(); ctx.moveTo(tx,ty);
  ctx.lineTo(tx-dx/d*ah-dy/d*ah*0.5, ty-dy/d*ah+dx/d*ah*0.5);
  ctx.lineTo(tx-dx/d*ah+dy/d*ah*0.5, ty-dy/d*ah-dx/d*ah*0.5);
  ctx.closePath(); ctx.fill(); ctx.globalAlpha=1.0;
}
function draw(){
  ctx.clearRect(0,0,cv.width,cv.height);
  E.forEach(e=>{const a=N[idx[e.s]], b=N[idx[e.t]]; if(!a||!b)return;
    arrow(a,b,e.c,Math.max(1, e.w*5));
    if(EDGE_LABELS && e.l){ctx.fillStyle='#aaa'; ctx.font='9px sans-serif';
      ctx.fillText(e.l, (a.x+b.x)/2+4, (a.y+b.y)/2-2);}});
  N.forEach(n=>{ctx.fillStyle=n.c;
    if(n.t==='paper'){ctx.fillRect(n.x-n.r,n.y-n.r*0.6,n.r*2,n.r*1.2);}
    else{ctx.beginPath(); ctx.arc(n.x,n.y,n.r,0,7); ctx.fill();}
    ctx.fillStyle='#ddd'; ctx.font='10px sans-serif'; ctx.fillText(n.l, n.x+n.r+3, n.y+3);});
}
function loop(){ step(); draw(); requestAnimationFrame(loop); } loop();
function hit(x,y){ for(const n of N){ const dx=n.x-x, dy=n.y-y;
  if(dx*dx+dy*dy<=(n.r+3)*(n.r+3)) return n; } return null; }
function hitEdge(x,y){ for(const e of E){ const a=N[idx[e.s]], b=N[idx[e.t]];
  if(!a||!b) continue; const dx=b.x-a.x, dy=b.y-a.y, L2=dx*dx+dy*dy||1;
  let t=((x-a.x)*dx+(y-a.y)*dy)/L2; t=Math.max(0,Math.min(1,t));
  const px=a.x+t*dx-x, py=a.y+t*dy-y;
  if(px*px+py*py<=16) return e; } return null; }
cv.addEventListener('mousemove', ev=>{
  mouse={x:ev.clientX, y:ev.clientY};
  const n = dragging || hit(ev.clientX, ev.clientY);
  const e = n ? null : hitEdge(ev.clientX, ev.clientY);
  if(n){ tip.style.display='block'; tip.style.left=(ev.clientX+12)+'px';
    tip.style.top=(ev.clientY+12)+'px'; tip.textContent=n.title;
    cv.style.cursor='pointer'; }
  else if(e){ tip.style.display='block'; tip.style.left=(ev.clientX+12)+'px';
    tip.style.top=(ev.clientY+12)+'px'; tip.textContent=e.title;
    cv.style.cursor='pointer'; }
  else { tip.style.display='none'; cv.style.cursor='default'; }});
cv.addEventListener('mousedown', ev=>{dragging=hit(ev.clientX,ev.clientY); hot=1.0;});
addEventListener('mouseup', ()=>{dragging=null;});
</script></body></html>
"""


def _truncate(label: str) -> str:
    return (label[:30] + "…") if len(label) > 30 else label


def _node_payload(n: dict) -> dict:
    ntype = n.get("node_type", "default")
    title = [f"Type: {ntype}", f"Label: {n['label']}"]
    props = n.get("properties") or {}
    if isinstance(props, str):
        try:
            props = json.loads(props)
        except (ValueError, TypeError):
            props = {}
    for k, v in list(props.items())[:3]:  # first 3 props, graph_visualizer.py:172
        title.append(f"{k}: {v}")
    return {
        "id": n["node_id"],
        "l": _truncate(n["label"]),
        "c": TYPE_COLORS.get(ntype, "#999999"),
        "t": ntype,
        "s": int(n.get("n_docs", 1)),
        "title": "\n".join(title),
    }


def _edge_payload(e: dict) -> dict:
    etype = e.get("edge_type", "default")
    conf = float(e.get("confidence", 0.5))
    return {
        "s": e["src_id"],
        "t": e["dst_id"],
        "w": conf,
        "c": EDGE_COLORS.get(etype, EDGE_COLORS["default"]),
        "l": etype,
        "title": f"Type: {etype}\nConfidence: {conf:.2f}",
    }


def graph_to_html(
    nodes,
    edges,
    path: str,
    max_nodes: int = 300,
    node_type_filter: str | None = None,
    physics: bool = True,
    show_edge_labels: bool = True,
) -> str:
    """Write a self-contained interactive HTML rendering of the graph.

    ``nodes``: iterable of dicts with node_id/node_type/label (+ optional
    n_docs/properties); ``edges``: dicts with src_id/dst_id (+ optional
    edge_type/confidence). Nodes beyond ``max_nodes`` are dropped and an
    optional ``node_type_filter`` keeps only one type, mirroring the
    reference's limit/filter options (graph_visualizer.py:92-121,72-73)."""
    nodes = list(nodes)
    if node_type_filter is not None:
        nodes = [n for n in nodes if n.get("node_type") == node_type_filter]
    nodes = nodes[:max_nodes]
    keep = {n["node_id"] for n in nodes}
    payload = {
        "physics": bool(physics),
        "edge_labels": bool(show_edge_labels),
        "nodes": [_node_payload(n) for n in nodes],
        "edges": [
            _edge_payload(e)
            for e in edges
            if e["src_id"] in keep and e["dst_id"] in keep
        ],
    }
    with open(path, "w") as f:
        f.write(_TEMPLATE % json.dumps(payload))
    return path


def subgraph_to_html(
    nodes,
    edges,
    root_id: str,
    path: str,
    max_depth: int = 2,
    **kwargs,
) -> str:
    """BFS from ``root_id`` up to ``max_depth`` hops over OUTGOING edges and
    render the collected subgraph (reference: visualize_subgraph's BFS over
    get_edges_from_node, graph_visualizer.py:266-330)."""
    nodes = list(nodes)
    edges = list(edges)
    out_adj: dict[str, list[dict]] = {}
    for e in edges:
        out_adj.setdefault(e["src_id"], []).append(e)
    visited: set[str] = set()
    frontier = [(root_id, 0)]
    sub_edges: list[dict] = []
    while frontier:
        nid, depth = frontier.pop(0)
        if nid in visited or depth > max_depth:
            continue
        visited.add(nid)
        if depth < max_depth:
            for e in out_adj.get(nid, []):
                sub_edges.append(e)
                frontier.append((e["dst_id"], depth + 1))
    sub_nodes = [n for n in nodes if n["node_id"] in visited]
    sub_ids = {n["node_id"] for n in sub_nodes}
    sub_edges = [
        e for e in sub_edges if e["src_id"] in sub_ids and e["dst_id"] in sub_ids
    ]
    return graph_to_html(sub_nodes, sub_edges, path, max_nodes=len(sub_nodes) or 1,
                         **kwargs)
