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
<style>body{margin:0;background:#111;font:12px sans-serif}canvas{display:block}
#tip{position:fixed;display:none;background:#222;color:#eee;border:1px solid #555;
  padding:6px 8px;border-radius:4px;pointer-events:none;max-width:320px}
#legend{position:fixed;top:8px;right:8px;background:rgba(20,20,20,.85);color:#ddd;
  padding:8px 10px;border-radius:4px}
#legend span{display:inline-block;width:10px;height:10px;border-radius:5px;margin-right:6px}
</style></head>
<body><canvas id="c"></canvas><div id="tip"></div><div id="legend"></div><script>
// Interactive physics + hover/drag — the pyvis parity surface
// (reference graph_visualizer.py:91-236) without the dependency: a live
// force simulation (repulsion + spring + centering), node drag, and a hover
// tooltip carrying the node's type/label/doc-count metadata.
const DATA = %s;
const cv = document.getElementById('c'); const ctx = cv.getContext('2d');
const tip = document.getElementById('tip');
cv.width = innerWidth; cv.height = innerHeight;
const N = DATA.nodes, E = DATA.edges;
const idx = {}; let seed = 42;
const rnd = () => (seed = (seed * 1103515245 + 12345) %% 2147483648) / 2147483648;
N.forEach((n,i)=>{idx[n.id]=i; n.x=rnd()*cv.width; n.y=rnd()*cv.height; n.vx=0; n.vy=0;
  n.r=4+Math.min(10, Math.sqrt(n.s));});
const legend = {}; N.forEach(n=>legend[n.t]=n.c);
document.getElementById('legend').innerHTML = Object.entries(legend)
  .map(([t,c])=>`<div><span style="background:${c}"></span>${t}</div>`).join('');
let dragging=null, mouse={x:0,y:0}, hot=1.0;
function step(){
  N.forEach(a=>{N.forEach(b=>{if(a===b)return; let dx=a.x-b.x, dy=a.y-b.y,
    d2=dx*dx+dy*dy+0.01; let f=Math.min(900/d2, 5); a.vx+=dx*f*0.01; a.vy+=dy*f*0.01;});});
  E.forEach(e=>{const a=N[idx[e.s]], b=N[idx[e.t]]; if(!a||!b)return;
    const dx=b.x-a.x, dy=b.y-a.y;
    a.vx+=dx*0.002*e.w; a.vy+=dy*0.002*e.w; b.vx-=dx*0.002*e.w; b.vy-=dy*0.002*e.w;});
  N.forEach(n=>{n.vx+=(cv.width/2-n.x)*1e-4; n.vy+=(cv.height/2-n.y)*1e-4;
    if(n===dragging){n.x=mouse.x; n.y=mouse.y; n.vx=n.vy=0; return;}
    n.vx*=0.85; n.vy*=0.85; n.x+=n.vx*hot; n.y+=n.vy*hot;
    n.x=Math.min(cv.width-15,Math.max(15,n.x)); n.y=Math.min(cv.height-15,Math.max(15,n.y));});
  hot=Math.max(0.05, hot*0.999);
}
function draw(){
  ctx.clearRect(0,0,cv.width,cv.height);
  E.forEach(e=>{const a=N[idx[e.s]], b=N[idx[e.t]]; if(!a||!b)return;
    ctx.strokeStyle='rgba(200,200,200,0.3)'; ctx.lineWidth=Math.max(0.5, e.w*2);
    ctx.beginPath(); ctx.moveTo(a.x,a.y); ctx.lineTo(b.x,b.y); ctx.stroke();});
  N.forEach(n=>{ctx.fillStyle=n.c; ctx.beginPath();
    ctx.arc(n.x,n.y,n.r,0,7); ctx.fill();
    ctx.fillStyle='#ddd'; ctx.font='10px sans-serif'; ctx.fillText(n.l, n.x+n.r+3, n.y+3);});
}
function loop(){ step(); draw(); requestAnimationFrame(loop); } loop();
function hit(x,y){ for(const n of N){ const dx=n.x-x, dy=n.y-y;
  if(dx*dx+dy*dy<=(n.r+3)*(n.r+3)) return n; } return null; }
cv.addEventListener('mousemove', ev=>{
  mouse={x:ev.clientX, y:ev.clientY};
  const n = dragging || hit(ev.clientX, ev.clientY);
  if(n){ tip.style.display='block'; tip.style.left=(ev.clientX+12)+'px';
    tip.style.top=(ev.clientY+12)+'px';
    tip.innerHTML=`<b>${n.l}</b><br>type: ${n.t}<br>docs: ${n.s}`;
    cv.style.cursor='pointer'; }
  else { tip.style.display='none'; cv.style.cursor='default'; }});
cv.addEventListener('mousedown', ev=>{dragging=hit(ev.clientX,ev.clientY); hot=1.0;});
addEventListener('mouseup', ()=>{dragging=null;});
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
                "t": n["node_type"],
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
