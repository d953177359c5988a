"""Self-contained candlestick UI for the ``/ohlcv`` endpoint.

Functional parity with the reference's frontend
(/root/reference/frontend/src/entry.jsx:296-331): a form takes (table,
symbols, from, to), fetches ``/ohlcv/{table}/{from}/{to}?symbols=...``,
and renders one candlestick-plus-volume chart per symbol from the
``{results: {SYM: {t,o,h,l,c,v}}, min_date, max_date}`` payload,
nanosecond timestamps scaled for the x-axis exactly as the reference
does (``t / 1e9``).

The reference uses React + uPlot from npm; this container has no node
toolchain, so the same behavior is one dependency-free HTML page with a
canvas renderer, served by the Python server at ``GET /ui``.  The data
contract is identical — this page is a real consumer of the same JSON
the reference's UI consumes.
"""

from __future__ import annotations

__all__ = ["UI_HTML"]

UI_HTML = b"""<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>zdb-spark candlesticks</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 1.5rem; background: #fafafa; }
  form { display: flex; gap: .75rem; flex-wrap: wrap; align-items: end; }
  label { display: flex; flex-direction: column; font-size: .8rem; color: #444; }
  input { padding: .3rem .5rem; font-size: .95rem; }
  button { padding: .4rem 1rem; }
  .chart { margin-top: 1.25rem; background: #fff; border: 1px solid #ddd;
           padding: .5rem; }
  .chart h3 { margin: .25rem 0 .5rem; font-size: 1rem; }
  #err { color: #b00020; margin-top: 1rem; white-space: pre-wrap; }
</style>
</head>
<body>
<h1>zdb-spark</h1>
<form id="f">
  <label>Table <input id="table" value="bars"></label>
  <label>Symbols <input id="symbols" value="AAPL,MSFT"></label>
  <label>From <input id="from" value="2024-01-01"></label>
  <label>To <input id="to" value="2024-02-01"></label>
  <button type="submit">Load</button>
</form>
<div id="err"></div>
<div id="charts"></div>
<script>
"use strict";
const W = 900, H = 320, VOLH = 70, PAD = 48;

function drawChart(sym, res, minT, maxT) {
  // nanosecond timestamps scaled like the reference UI (t / 1e9)
  const t = res.t.map(x => x / 1e9);
  const lo = Math.min(...res.l), hi = Math.max(...res.h);
  const vmax = Math.max(...res.v, 1);
  const x0 = minT / 1e9, x1 = maxT / 1e9;
  const sx = v => PAD + (W - 2 * PAD) * (x1 > x0 ? (v - x0) / (x1 - x0) : .5);
  const sy = v => 12 + (H - VOLH - 24) * (hi > lo ? (hi - v) / (hi - lo) : .5);
  const sv = v => H - 4 - (VOLH - 8) * v / vmax;

  const div = document.createElement("div");
  div.className = "chart";
  const h3 = document.createElement("h3");
  h3.textContent = sym;
  const cv = document.createElement("canvas");
  cv.width = W; cv.height = H;
  div.appendChild(h3); div.appendChild(cv);
  document.getElementById("charts").appendChild(div);

  const g = cv.getContext("2d");
  g.strokeStyle = "#ccc";
  g.strokeRect(PAD, 8, W - 2 * PAD, H - VOLH - 16);
  g.fillStyle = "#444"; g.font = "11px sans-serif";
  g.fillText(hi.toFixed(2), 4, 18);
  g.fillText(lo.toFixed(2), 4, H - VOLH - 8);

  const bw = Math.max(2, (W - 2 * PAD) / Math.max(t.length, 1) * 0.6);
  for (let i = 0; i < t.length; i++) {
    const x = sx(t[i]);
    const up = res.c[i] >= res.o[i];
    g.strokeStyle = g.fillStyle = up ? "#1a7f37" : "#cf222e";
    g.beginPath();                       // high-low wick
    g.moveTo(x, sy(res.h[i])); g.lineTo(x, sy(res.l[i])); g.stroke();
    const yo = sy(res.o[i]), yc = sy(res.c[i]);  // open-close body
    g.fillRect(x - bw / 2, Math.min(yo, yc),
               bw, Math.max(1, Math.abs(yc - yo)));
    g.globalAlpha = 0.45;                // volume pane
    g.fillRect(x - bw / 2, sv(res.v[i]), bw, H - 4 - sv(res.v[i]));
    g.globalAlpha = 1.0;
  }
}

document.getElementById("f").addEventListener("submit", ev => {
  ev.preventDefault();
  const v = id => document.getElementById(id).value.trim();
  document.getElementById("charts").textContent = "";
  document.getElementById("err").textContent = "";
  fetch(`/ohlcv/${v("table")}/${v("from")}/${v("to")}?symbols=${v("symbols")}`)
    .then(r => r.ok ? r.json()
                    : r.text().then(t => { throw new Error(t); }))
    .then(data => {
      const syms = Object.keys(data.results);
      if (!syms.length) {
        document.getElementById("err").textContent = "no rows in range";
        return;
      }
      syms.forEach(s =>
        drawChart(s, data.results[s], data.min_date, data.max_date));
    })
    .catch(e => { document.getElementById("err").textContent = e.message; });
});
</script>
</body>
</html>
"""
