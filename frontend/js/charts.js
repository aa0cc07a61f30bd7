// Minimal SVG chart toolkit: scales, axes, lines, bands, bars, tooltips.
// No dependencies; colors come from CSS variables so themes apply live.

const SVG_NS = "http://www.w3.org/2000/svg";

export function cssVar(name) {
  return getComputedStyle(document.documentElement).getPropertyValue(name).trim();
}

export function el(tag, attrs = {}, children = []) {
  const node = document.createElementNS(SVG_NS, tag);
  for (const [k, v] of Object.entries(attrs)) node.setAttribute(k, v);
  for (const c of children) node.appendChild(c);
  return node;
}

export function fmtMoney(v) {
  const abs = Math.abs(v);
  if (abs >= 1e9) return `$${(v / 1e9).toFixed(2)}B`;
  if (abs >= 1e6) return `$${(v / 1e6).toFixed(2)}M`;
  if (abs >= 1e3) return `$${(v / 1e3).toFixed(0)}k`;
  return `$${v.toFixed(0)}`;
}

export function linScale(domain, range) {
  const [d0, d1] = domain;
  const [r0, r1] = range;
  const span = d1 - d0 || 1;
  const f = (x) => r0 + ((x - d0) / span) * (r1 - r0);
  f.invert = (y) => d0 + ((y - r0) / (r1 - r0)) * span;
  f.domain = domain;
  return f;
}

export function ticks(domain, count = 5) {
  const [a, b] = domain;
  const span = b - a || 1;
  const step0 = span / count;
  const mag = 10 ** Math.floor(Math.log10(step0));
  const norm = step0 / mag;
  const step = (norm >= 5 ? 10 : norm >= 2 ? 5 : norm >= 1 ? 2 : 1) * mag;
  const out = [];
  for (let t = Math.ceil(a / step) * step; t <= b + 1e-9; t += step) out.push(t);
  return out;
}

// Chart frame: svg + plot area + axes. Returns helpers to add marks.
export function makeChart(container, { width = 720, height = 300, margin } = {}) {
  margin = margin || { top: 12, right: 14, bottom: 28, left: 56 };
  container.innerHTML = "";
  const wrap = document.createElement("div");
  wrap.className = "chart-wrap";
  const svg = el("svg", { viewBox: `0 0 ${width} ${height}` });
  const tooltip = document.createElement("div");
  tooltip.className = "chart-tooltip";
  wrap.appendChild(svg);
  wrap.appendChild(tooltip);
  container.appendChild(wrap);
  const plot = {
    svg, wrap, tooltip, width, height, margin,
    innerW: width - margin.left - margin.right,
    innerH: height - margin.top - margin.bottom,
  };
  plot.g = el("g", { transform: `translate(${margin.left},${margin.top})` });
  svg.appendChild(plot.g);
  return plot;
}

export function drawAxes(plot, x, y, { xFmt = (v) => v, yFmt = (v) => v, xTicks, yTicks } = {}) {
  const grid = cssVar("--grid");
  const muted = cssVar("--muted");
  for (const t of yTicks ?? ticks(y.domain)) {
    const yy = y(t);
    plot.g.appendChild(el("line", {
      x1: 0, x2: plot.innerW, y1: yy, y2: yy, stroke: grid, "stroke-width": 1,
    }));
    const label = el("text", {
      x: -8, y: yy + 4, "text-anchor": "end", "font-size": 10, fill: muted,
    });
    label.textContent = yFmt(t);
    plot.g.appendChild(label);
  }
  for (const t of xTicks ?? ticks(x.domain, 8)) {
    const xx = x(t);
    const label = el("text", {
      x: xx, y: plot.innerH + 18, "text-anchor": "middle", "font-size": 10, fill: muted,
    });
    label.textContent = xFmt(t);
    plot.g.appendChild(label);
  }
  plot.g.appendChild(el("line", {
    x1: 0, x2: plot.innerW, y1: plot.innerH, y2: plot.innerH,
    stroke: cssVar("--border"), "stroke-width": 1,
  }));
}

function pathFrom(points) {
  return points
    .map(([px, py], i) => `${i === 0 ? "M" : "L"}${px.toFixed(1)},${py.toFixed(1)}`)
    .join("");
}

export function drawLine(plot, xs, ys, x, y, { stroke, width = 2, dash } = {}) {
  const pts = [];
  for (let i = 0; i < xs.length; i++) {
    if (ys[i] === null || ys[i] === undefined || Number.isNaN(ys[i])) continue;
    pts.push([x(xs[i]), y(ys[i])]);
  }
  if (!pts.length) return;
  const attrs = {
    d: pathFrom(pts), fill: "none", stroke: stroke || cssVar("--accent"),
    "stroke-width": width,
  };
  if (dash) attrs["stroke-dasharray"] = dash;
  plot.g.appendChild(el("path", attrs));
}

export function drawBand(plot, xs, lo, hi, x, y, { fill } = {}) {
  const up = [], down = [];
  for (let i = 0; i < xs.length; i++) {
    if ([lo[i], hi[i]].some((v) => v === null || v === undefined || Number.isNaN(v))) continue;
    up.push([x(xs[i]), y(hi[i])]);
    down.push([x(xs[i]), y(lo[i])]);
  }
  if (!up.length) return;
  const d = pathFrom(up) + pathFrom(down.reverse()).replace(/^M/, "L") + "Z";
  plot.g.appendChild(el("path", { d, fill: fill || cssVar("--band-outer"), stroke: "none" }));
}

export function drawVLine(plot, xv, x, { stroke, dash = "4 3", label } = {}) {
  const xx = x(xv);
  plot.g.appendChild(el("line", {
    x1: xx, x2: xx, y1: 0, y2: plot.innerH,
    stroke: stroke || cssVar("--bad"), "stroke-width": 1.2, "stroke-dasharray": dash,
  }));
  if (label) {
    const text = el("text", {
      x: xx + 4, y: 12, "font-size": 10, fill: stroke || cssVar("--bad"),
    });
    text.textContent = label;
    plot.g.appendChild(text);
  }
}

export function drawHLine(plot, yv, y, { stroke, dash = "5 4", label } = {}) {
  const yy = y(yv);
  plot.g.appendChild(el("line", {
    x1: 0, x2: plot.innerW, y1: yy, y2: yy,
    stroke: stroke || cssVar("--warn"), "stroke-width": 1.2, "stroke-dasharray": dash,
  }));
  if (label) {
    const text = el("text", {
      x: plot.innerW - 4, y: yy - 4, "text-anchor": "end", "font-size": 10,
      fill: stroke || cssVar("--warn"),
    });
    text.textContent = label;
    plot.g.appendChild(text);
  }
}

export function drawBars(plot, bins, x, y, { fill } = {}) {
  for (const b of bins) {
    const x0 = x(b.x0), x1 = x(b.x1);
    const h = plot.innerH - y(b.count);
    if (b.count <= 0) continue;
    plot.g.appendChild(el("rect", {
      x: x0 + 0.5, y: y(b.count), width: Math.max(1, x1 - x0 - 1), height: h,
      fill: fill || cssVar("--accent"), opacity: 0.8, rx: 1,
    }));
  }
}

export function drawMarker(plot, xv, x, n, { color } = {}) {
  const xx = x(xv);
  plot.g.appendChild(el("line", {
    x1: xx, x2: xx, y1: 0, y2: plot.innerH,
    stroke: color || cssVar("--good"), "stroke-width": 1, "stroke-dasharray": "2 3",
  }));
  const g = el("g");
  g.appendChild(el("circle", { cx: xx, cy: 8, r: 7, fill: color || cssVar("--good") }));
  const t = el("text", {
    x: xx, y: 11, "text-anchor": "middle", "font-size": 9, fill: "#fff",
  });
  t.textContent = String(n);
  g.appendChild(t);
  plot.g.appendChild(g);
}

// Hover layer: nearest-x tooltip. rows(xValue) -> array of strings.
export function attachHover(plot, xs, x, rowsFor) {
  const overlay = el("rect", {
    x: 0, y: 0, width: plot.innerW, height: plot.innerH, fill: "transparent",
  });
  const cursor = el("line", {
    y1: 0, y2: plot.innerH, stroke: cssVar("--muted"), "stroke-width": 1,
    "stroke-dasharray": "2 2", opacity: 0,
  });
  plot.g.appendChild(cursor);
  plot.g.appendChild(overlay);
  overlay.addEventListener("mousemove", (ev) => {
    const rect = plot.svg.getBoundingClientRect();
    const scale = plot.width / rect.width;
    const px = (ev.clientX - rect.left) * scale - plot.margin.left;
    const xv = x.invert(px);
    let best = 0, bestDist = Infinity;
    xs.forEach((v, i) => {
      const d = Math.abs(v - xv);
      if (d < bestDist) { bestDist = d; best = i; }
    });
    const rows = rowsFor(best);
    if (!rows || !rows.length) return;
    cursor.setAttribute("x1", x(xs[best]));
    cursor.setAttribute("x2", x(xs[best]));
    cursor.setAttribute("opacity", 1);
    plot.tooltip.innerHTML = rows.join("<br>");
    plot.tooltip.style.opacity = 1;
    const tipX = ((x(xs[best]) + plot.margin.left) / scale);
    plot.tooltip.style.left = `${Math.min(tipX + 12, rect.width - 150)}px`;
    plot.tooltip.style.top = `${(ev.clientY - rect.top) - 10}px`;
  });
  overlay.addEventListener("mouseleave", () => {
    plot.tooltip.style.opacity = 0;
    cursor.setAttribute("opacity", 0);
  });
}
