package graft.graph

/** Minimal self-contained HTML viewer for the force/radial graph JSON —
  * parity for the reference's openable output layout (the reference's `--out`
  * pairs its JSON folders with a d3js viewing page; see
  * arelight/backend/d3js/ui_web.py:5-10 for the folder contract and the
  * project's hosted template for the look). Written from scratch with zero
  * external dependencies (no CDN — the artifact must open offline): a ~60-line
  * vanilla-JS spring simulation for the force view and a deterministic circle
  * layout for the radial view.
  *
  * The page fetches `force/<name>.json` and `radial/<name>.json` relative to
  * itself, so `<out>/index.html` works from any static file server (or
  * file:// in browsers that allow same-directory fetch).
  */
object Viewer {

  /** HTML-entity escape for element text (the <title>). */
  private[graph] def escHtml(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }

  /** JS string-literal escape; also encodes angle brackets so a name
    * containing `</script>` cannot terminate the inline script block. */
  private[graph] def escJs(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '<'  => "\\u003c"
      case '>'  => "\\u003e"
      case '&'  => "\\u0026"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c    => c.toString
    }

  def html(name: String): String = {
    val nHtml = escHtml(name)
    val n = escJs(name)
    s"""<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>graft graph — $nHtml</title>
<style>
  body { margin: 0; font: 13px system-ui, sans-serif; background: #111; color: #ddd; }
  #bar { padding: 8px 12px; background: #1b1b1b; border-bottom: 1px solid #333; }
  #bar button { margin-right: 6px; }
  svg { display: block; width: 100vw; height: calc(100vh - 40px); }
  line { stroke-opacity: 0.55; }
  circle { fill: #6baed6; stroke: #eee; stroke-width: 0.5; }
  text { fill: #ccc; font-size: 10px; pointer-events: none; }
  .pos { stroke: #2ca02c; } .neg { stroke: #d62728; } .neu { stroke: #888; }
</style>
</head>
<body>
<div id="bar">
  <button onclick="show('force')">force</button>
  <button onclick="show('radial')">radial</button>
  <span id="status"></span>
</div>
<svg id="g"></svg>
<script>
"use strict";
const NAME = "$n";
const svg = document.getElementById("g");
const W = () => svg.clientWidth, H = () => svg.clientHeight;
let timer = null;

function cls(sent) {
  const s = (sent || "").toUpperCase();
  return s.includes("POS") ? "pos" : s.includes("NEG") ? "neg" : "neu";
}

function clear() { if (timer) cancelAnimationFrame(timer); svg.innerHTML = ""; }

function el(tag, attrs) {
  const e = document.createElementNS("http://www.w3.org/2000/svg", tag);
  for (const k in attrs) e.setAttribute(k, attrs[k]);
  svg.appendChild(e);
  return e;
}

function draw(graph, layout) {
  clear();
  const nodes = graph.nodes.map((d, i) => ({...d, i}));
  const index = {}; nodes.forEach(d => index[d.id] = d);
  const links = graph.links.map(l => ({...l,
    s: index[l.source] || index[l.source_id], t: index[l.target] || index[l.target_id]}));
  document.getElementById("status").textContent =
    " " + NAME + ": " + nodes.length + " nodes, " + links.length + " links (" + layout + ")";
  if (layout === "radial") {
    const R = Math.min(W(), H()) / 2 - 60, cx = W() / 2, cy = H() / 2;
    nodes.forEach((d, i) => {
      const a = 2 * Math.PI * i / nodes.length - Math.PI / 2;
      d.x = cx + R * Math.cos(a); d.y = cy + R * Math.sin(a);
    });
    render(nodes, links, false);
  } else {
    // spring simulation: link springs + pairwise repulsion + centering
    nodes.forEach((d, i) => { // deterministic spiral seed — no Math.random
      const a = i * 2.39996; const r = 12 * Math.sqrt(i + 1);
      d.x = W() / 2 + r * Math.cos(a); d.y = H() / 2 + r * Math.sin(a);
      d.vx = 0; d.vy = 0;
    });
    let ticks = 0;
    const parts = render(nodes, links, true);
    const step = () => {
      for (const l of links) {
        if (!l.s || !l.t) continue;
        const dx = l.t.x - l.s.x, dy = l.t.y - l.s.y;
        const d = Math.max(Math.hypot(dx, dy), 1e-3);
        const f = 0.01 * (d - 120) / d;
        l.s.vx += f * dx; l.s.vy += f * dy; l.t.vx -= f * dx; l.t.vy -= f * dy;
      }
      for (let i = 0; i < nodes.length; i++) for (let j = i + 1; j < nodes.length; j++) {
        const a = nodes[i], b = nodes[j];
        const dx = b.x - a.x, dy = b.y - a.y;
        const d2 = Math.max(dx * dx + dy * dy, 25);
        const f = 1200 / d2, d = Math.sqrt(d2);
        a.vx -= f * dx / d; a.vy -= f * dy / d; b.vx += f * dx / d; b.vy += f * dy / d;
      }
      for (const n of nodes) {
        n.vx += (W() / 2 - n.x) * 0.002; n.vy += (H() / 2 - n.y) * 0.002;
        n.vx *= 0.85; n.vy *= 0.85; n.x += n.vx; n.y += n.vy;
      }
      parts.update();
      if (++ticks < 300) timer = requestAnimationFrame(step);
    };
    timer = requestAnimationFrame(step);
  }
}

function render(nodes, links, dynamic) {
  const ls = links.filter(l => l.s && l.t).map(l => ({l,
    e: el("line", {class: cls(l.sent), "stroke-width": 0.5 + 3 * (l.c || 0)})}));
  const ns = nodes.map(d => ({d, e: el("circle", {r: 4 + 8 * Math.min(d.c || 0, 1)})}));
  const ts = nodes.map(d => ({d, e: el("text", {})}));
  ts.forEach(t => t.e.textContent = t.d.id);
  const update = () => {
    ls.forEach(({l, e}) => { e.setAttribute("x1", l.s.x); e.setAttribute("y1", l.s.y);
      e.setAttribute("x2", l.t.x); e.setAttribute("y2", l.t.y); });
    ns.forEach(({d, e}) => { e.setAttribute("cx", d.x); e.setAttribute("cy", d.y); });
    ts.forEach(({d, e}) => { e.setAttribute("x", d.x + 8); e.setAttribute("y", d.y + 3); });
  };
  update();
  return {update};
}

function show(layout) {
  fetch(layout + "/" + NAME + ".json")
    .then(r => r.json())
    .then(g => draw(g, layout))
    .catch(e => document.getElementById("status").textContent = " load failed: " + e);
}
show("force");
</script>
</body>
</html>
"""
  }

  /** Write `<outDir>/index.html` next to the force/ radial/ JSON folders. */
  def save(outDir: String, name: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(outDir, "index.html")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, html(name).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    p
  }
}
