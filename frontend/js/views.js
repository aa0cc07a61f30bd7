// Result cards: summary, search curve, trajectory fan, withdrawal rate,
// ruin histogram, final-balance histogram.

import {
  attachHover, cssVar, drawAxes, drawBand, drawBars, drawHLine, drawLine,
  drawMarker, drawVLine, el, fmtMoney, linScale, makeChart, ticks,
} from "./charts.js";

function card(title, sub) {
  const div = document.createElement("div");
  div.className = "card";
  const h = document.createElement("h3");
  h.textContent = title;
  div.appendChild(h);
  if (sub) {
    const s = document.createElement("div");
    s.className = "sub";
    s.textContent = sub;
    div.appendChild(s);
  }
  return div;
}

function pct(v, digits = 1) {
  return v === null || v === undefined ? "—" : `${v.toFixed(digits)}%`;
}

// Loop-based extrema: Math.min(...arr) throws RangeError past the engine's
// argument limit (~65k), and per-path arrays can exceed it when
// MCRT_MAX_RAW_PATHS is raised.
function arrMin(arr) {
  let m = Infinity;
  for (const v of arr) if (v < m) m = v;
  return m;
}
function arrMax(arr) {
  let m = -Infinity;
  for (const v of arr) if (v > m) m = v;
  return m;
}

// Escape user-controlled text (income-stream names) before HTML
// interpolation: a name like "Pension <Joint>" must render literally.
function esc(text) {
  const d = document.createElement("div");
  d.textContent = String(text);
  return d.innerHTML;
}

// ---------------------------------------------------------------- summary
export function summaryCard(result) {
  const s = result.summary;
  const div = card("Summary", `Scenario: ${result.scenario}`);
  const grid = document.createElement("div");
  grid.className = "metrics";
  const okClass = s.success_probability >= s.target_probability ? "good" : "bad";
  const items = [
    [
      s.working_period_is_estimate ? "Estimated working period" : "Working period",
      `${s.required_working_months} mo (${s.required_working_years} yrs)`,
    ],
    ["Retirement age", s.retirement_age !== null ? s.retirement_age.toFixed(1) : "—"],
    [
      "Success probability",
      // ± one-sigma Monte Carlo error when the server provides it (additive
      // field; older/reference servers omit it and the suffix disappears).
      pct(s.success_probability, 2) +
        (s.success_probability_sigma ? ` ± ${s.success_probability_sigma.toFixed(2)}` : ""),
      okClass,
    ],
    ["Target", pct(s.target_probability, 1)],
    ["First-year withdrawal rate", s.swr !== null ? pct(s.swr, 2) : "—"],
    ["Median balance at retirement", fmtMoney(s.median_start_balance)],
    ["Median final (successful)", fmtMoney(s.median_final_balance_successful)],
  ];
  for (const [k, v, cls] of items) {
    const m = document.createElement("div");
    m.className = "metric";
    m.innerHTML = `<div class="k">${k}</div><div class="v ${cls || ""}">${v}</div>`;
    grid.appendChild(m);
  }
  div.appendChild(grid);

  const details = document.createElement("details");
  const sum = document.createElement("summary");
  sum.textContent = "Final balance percentiles";
  sum.style.cursor = "pointer";
  sum.style.marginTop = "10px";
  details.appendChild(sum);
  const table = document.createElement("table");
  table.className = "pct-table";
  const keys = Object.keys(s.final_balance_percentiles);
  table.innerHTML =
    `<tr>${keys.map((k) => `<th>${k.toUpperCase()}</th>`).join("")}</tr>` +
    `<tr>${keys.map((k) => `<td>${fmtMoney(s.final_balance_percentiles[k])}</td>`).join("")}</tr>`;
  details.appendChild(table);
  div.appendChild(details);
  return div;
}

// ----------------------------------------------------------- search curve
export function searchCurveCard(sc) {
  const div = card("Success probability vs working months",
    `search probes: ${sc.points.length}`);
  const holder = document.createElement("div");
  div.appendChild(holder);
  const plot = makeChart(holder, { height: 260 });
  const xs = sc.points.map((p) => p.working_months);
  const ys = sc.points.map((p) => p.probability);
  const x = linScale([Math.min(...xs), Math.max(...xs) || 1], [0, plot.innerW]);
  const y = linScale([0, 100], [plot.innerH, 0]);
  drawAxes(plot, x, y, { yFmt: (v) => `${v}%`, xFmt: (v) => `${Math.round(v)}m` });
  drawHLine(plot, sc.target_probability, y, {
    stroke: cssVar("--warn"), label: `target ${sc.target_probability}%`,
  });
  drawVLine(plot, sc.selected_working_months, x, {
    stroke: cssVar("--good"), label: `${sc.selected_working_months} mo`,
  });
  drawLine(plot, xs, ys, x, y, {});
  attachHover(plot, xs, x, (i) => [
    `<b>${xs[i]} months</b> (${(xs[i] / 12).toFixed(1)} yrs)`,
    `probability ${ys[i].toFixed(2)}%`,
  ]);
  return div;
}

// ------------------------------------------------------------- trajectory
// Survives re-renders (theme toggles rebuild the card): a user who picked
// "Real (today's $)" must not be flipped back to nominal silently.
let trajMode = "nominal";

export function trajectoryCard(result) {
  const hasReal = !!result.trajectory_real;
  const div = card("Portfolio trajectory",
    "Percentile fan over all paths; grey lines are individual sample paths");
  let mode = hasReal ? trajMode : "nominal";
  const toggles = document.createElement("div");
  toggles.className = "toggle-row";
  const chartHolder = document.createElement("div");
  const legend = document.createElement("div");
  legend.className = "chart-legend";

  const render = () => {
    const data = mode === "real" ? result.trajectory_real : result.trajectory;
    if (!data) return;
    const plot = makeChart(chartHolder, { height: 340 });
    const xs = data.years;
    const p = data.percentiles;
    const allVals = [
      ...(p.p95 || []), ...(p.p5 || []), ...(p.p50 || []),
      ...data.sample_paths.flat(),
    ].filter((v) => v !== null && !Number.isNaN(v));
    const ymax = Math.max(...allVals, 1);
    const x = linScale([0, xs[xs.length - 1] || 1], [0, plot.innerW]);
    const y = linScale([0, ymax * 1.05], [plot.innerH, 0]);
    drawAxes(plot, x, y, { yFmt: fmtMoney, xFmt: (v) => `${Math.round(v)}y` });
    if (p.p5 && p.p95) drawBand(plot, xs, p.p5, p.p95, x, y, { fill: cssVar("--band-outer") });
    if (p.p25 && p.p75) drawBand(plot, xs, p.p25, p.p75, x, y, { fill: cssVar("--band-inner") });
    for (const sample of data.sample_paths) {
      drawLine(plot, xs, sample, x, y, { stroke: cssVar("--sample"), width: 0.8 });
    }
    if (p.p50) drawLine(plot, xs, p.p50, x, y, { width: 2.2 });
    // Like the reference chart: only markers inside the plotted horizon,
    // numbered in year order.
    const maxYear = xs[xs.length - 1] || 0;
    const refLines = (result.reference_lines || [])
      .filter((ref) => ref.year <= maxYear)
      .sort((a, b) => a.year - b.year);
    refLines.forEach((ref, i) => {
      drawMarker(plot, ref.year, x, i + 1, {});
    });
    attachHover(plot, xs, x, (i) => {
      const rows = [`<b>year ${xs[i].toFixed(2)}</b>`];
      for (const key of ["p95", "p75", "p50", "p25", "p5"]) {
        if (p[key]) rows.push(`${key.toUpperCase()}: ${fmtMoney(p[key][i])}`);
      }
      return rows;
    });
    legend.innerHTML =
      `<span><span class="key" style="background:${cssVar("--band-outer")}"></span>P5–P95</span>` +
      `<span><span class="key" style="background:${cssVar("--band-inner")}"></span>P25–P75</span>` +
      `<span><span class="key" style="background:${cssVar("--accent")}"></span>Median</span>` +
      refLines
        .map((ref, i) => `<span class="ref-chip"><span class="n">${i + 1}</span>${esc(ref.name)} (${ref.year.toFixed(1)}y)</span>`)
        .join("");
  };

  if (hasReal) {
    for (const m of ["nominal", "real"]) {
      const b = document.createElement("button");
      b.textContent = m === "nominal" ? "Nominal $" : "Real (today's $)";
      if (m === mode) b.className = "active";
      b.onclick = () => {
        mode = m;
        trajMode = m;
        toggles.querySelectorAll("button").forEach((x) => x.classList.remove("active"));
        b.classList.add("active");
        render();
      };
      toggles.appendChild(b);
    }
    div.appendChild(toggles);
  }
  div.appendChild(chartHolder);
  div.appendChild(legend);
  render();
  return div;
}

// -------------------------------------------------------- withdrawal rate
export function withdrawalRateCard(wr) {
  const div = card("Real withdrawal rate by retirement year",
    `inflation-adjusted withdrawals as % of the retirement-date balance · ${wr.total_paths} paths`);
  const holder = document.createElement("div");
  div.appendChild(holder);
  const rows = wr.years
    .map((yr, i) => ({ yr, i }))
    .filter(({ i }) => wr.percentiles.p50 && wr.percentiles.p50[i] !== null);
  if (!rows.length) {
    holder.textContent = "No full retirement years observed.";
    return div;
  }
  const xs = rows.map((r) => r.yr);
  const take = (key) => rows.map((r) => wr.percentiles[key]?.[r.i] ?? null);
  const p5 = take("p5"), p25 = take("p25"), p50 = take("p50"),
    p75 = take("p75"), p95 = take("p95");
  const plot = makeChart(holder, { height: 260 });
  const vals = [...p5, ...p95, ...p50, 4.5].filter((v) => v !== null);
  const x = linScale([xs[0], xs[xs.length - 1] || 1], [0, plot.innerW]);
  const y = linScale([0, Math.max(...vals) * 1.1], [plot.innerH, 0]);
  drawAxes(plot, x, y, { yFmt: (v) => `${v.toFixed(1)}%`, xFmt: (v) => `${Math.round(v)}y` });
  drawBand(plot, xs, p5, p95, x, y, { fill: cssVar("--band-outer") });
  drawBand(plot, xs, p25, p75, x, y, { fill: cssVar("--band-inner") });
  drawLine(plot, xs, p50, x, y, { width: 2 });
  drawHLine(plot, 4.0, y, { label: "4% rule" });
  attachHover(plot, xs, x, (i) => [
    `<b>year ${xs[i].toFixed(1)}</b>`,
    `P95 ${p95[i]?.toFixed(2)}% · P50 ${p50[i]?.toFixed(2)}% · P5 ${p5[i]?.toFixed(2)}%`,
    `${wr.observation_counts[rows[i].i] ?? "?"} full-year paths`,
  ]);
  return div;
}

// ----------------------------------------------------------- ruin histogram
export function ruinCard(rh) {
  const div = card("Years to ruin (failed paths)",
    `${rh.failure_count} of ${rh.total_paths} paths failed`);
  const holder = document.createElement("div");
  div.appendChild(holder);
  if (!rh.failure_count) {
    holder.innerHTML = `<div style="color:var(--good)">No failures 🎉</div>`;
    return div;
  }
  let bins;
  if (rh.year_counts && rh.year_counts.length) {
    // Server pre-binned (large runs serve bounded payloads).
    bins = rh.year_counts.map((c, b) => ({ x0: b, x1: b + 1, count: c }));
  } else {
    const maxYear = Math.ceil(Math.max(arrMax(rh.years_to_ruin), 1));
    bins = [];
    for (let b = 0; b < maxYear; b++) bins.push({ x0: b, x1: b + 1, count: 0 });
    for (const v of rh.years_to_ruin) {
      const i = Math.min(bins.length - 1, Math.floor(v));
      bins[i].count += 1;
    }
    while (bins.length && bins[bins.length - 1].count === 0) bins.pop();
  }
  const plot = makeChart(holder, { height: 220 });
  const x = linScale([0, bins.length], [0, plot.innerW]);
  const y = linScale([0, Math.max(...bins.map((b) => b.count)) * 1.1], [plot.innerH, 0]);
  drawAxes(plot, x, y, { xFmt: (v) => `${Math.round(v)}y`, yFmt: (v) => v.toFixed(0) });
  drawBars(plot, bins, x, y, { fill: cssVar("--bad") });
  attachHover(plot, bins.map((b) => (b.x0 + b.x1) / 2), x, (i) => [
    `<b>year ${bins[i].x0}–${bins[i].x1}</b>`, `${bins[i].count} paths`,
  ]);
  return div;
}

// ------------------------------------------------- final balance histogram
export function histogramCard(h) {
  const preBinned = h.binned || null;
  const successFinals = preBinned
    ? null
    : h.final_balances.filter((_, i) => h.success_flags[i]);
  const successCount = preBinned ? preBinned.success_count : successFinals.length;
  const totalPaths = preBinned ? preBinned.total_paths : h.success_flags.length;
  const rate = totalPaths ? (successCount / totalPaths) * 100 : 0;
  const div = card("Final balance distribution",
    `successful paths only (${rate.toFixed(1)}%), including $0 income-funded outcomes`);
  const holder = document.createElement("div");
  div.appendChild(holder);
  if (!successCount) {
    holder.textContent = "No successful outcomes.";
    return div;
  }
  let bins, lo, hi, median;
  if (preBinned) {
    // Server pre-binned (large runs serve bounded payloads).
    const e = preBinned.bin_edges;
    bins = preBinned.counts.map((c, i) => ({ x0: e[i], x1: e[i + 1], count: c }));
    lo = e[0]; hi = e[e.length - 1];
    median = preBinned.median;
  } else {
    lo = arrMin(successFinals); hi = arrMax(successFinals);
    const nbins = 60;
    const width = (hi - lo) / nbins || 1;
    bins = Array.from({ length: nbins }, (_, i) => ({
      x0: lo + i * width, x1: lo + (i + 1) * width, count: 0,
    }));
    for (const v of successFinals) {
      const i = Math.min(nbins - 1, Math.floor((v - lo) / width));
      bins[i].count += 1;
    }
    const sorted = [...successFinals].sort((a, b) => a - b);
    median = sorted[Math.floor(sorted.length / 2)];
  }
  const plot = makeChart(holder, { height: 260 });
  const x = linScale([lo, hi === lo ? lo + 1 : hi], [0, plot.innerW]);
  const y = linScale([0, Math.max(...bins.map((b) => b.count)) * 1.08], [plot.innerH, 0]);
  drawAxes(plot, x, y, { xFmt: fmtMoney, yFmt: (v) => v.toFixed(0) });
  drawBars(plot, bins, x, y, {});
  drawVLine(plot, median, x, { stroke: cssVar("--warn"), label: `median ${fmtMoney(median)}` });
  attachHover(plot, bins.map((b) => (b.x0 + b.x1) / 2), x, (i) => [
    `<b>${fmtMoney(bins[i].x0)} – ${fmtMoney(bins[i].x1)}</b>`,
    `${bins[i].count} paths`,
  ]);
  return div;
}

// Significant-digit formatting shared by the sensitivity and optimize
// cards — derivatives and parameter values span many decades.
function fmtSig(v) {
  if (v === null || v === undefined) return "—";
  if (v === 0) return "0";
  const a = Math.abs(v);
  if (a >= 1e5 || a < 1e-3) return v.toExponential(2);
  return Number(v.toPrecision(4)).toString();
}

// ------------------------------------------------------------ tornado chart
// Sensitivity results: one row per probed parameter, ordered by how much
// one practical step moves the success probability. The diverging bar pair
// (left = hurts, right = helps) is the tornado; exact derivatives sit in
// the numeric columns.
export function sensitivityCard(sens) {
  const rows = sens.rows;
  const div = card(
    "Sensitivity (tornado)",
    `${rows.length} parameters × ${sens.num_paths.toLocaleString()} paths at `
      + `${sens.working_months} working months · base success `
      + `${pct(rows.length ? rows[0].success_base : null, 2)}`
      + (rows.length ? ` ±${rows[0].success_sigma.toFixed(2)}` : ""),
  );
  const wrap = document.createElement("div");
  wrap.className = "grid-scroll";
  const table = document.createElement("table");
  table.className = "grid-table tornado-table";
  const hasAd = rows.some((r) => r.ad_d_mean_final !== undefined
    && r.ad_d_mean_final !== null);
  const maxAbs = Math.max(...rows.map((r) => Math.abs(r.success_per_step)), 1e-12);
  const header = `<tr><th>parameter</th><th>value</th>
    <th class="tornado-col">Δ success / step</th><th></th>
    <th>d success / unit</th><th>d mean $ / unit</th>
    <th>d p5 $ / unit</th><th>step</th>
    ${hasAd ? "<th>AD d mean $</th>" : ""}</tr>`;
  const body = rows.map((r) => {
    const v = r.success_per_step;
    const w = Math.min(100, (Math.abs(v) / maxAbs) * 100);
    const bar = `<div class="grid-bar ${v < 0 ? "grid-bar-bad" : "grid-bar-good"}"
      style="width:${w}%"></div>`;
    return `<tr>
      <td class="grid-name">${esc(r.param)}</td>
      <td>${fmtSig(r.base_value)}</td>
      <td class="tornado-col"><div class="tornado-track">
        <div class="tornado-half tornado-left">${v < 0 ? bar : ""}</div>
        <div class="tornado-half tornado-right">${v >= 0 ? bar : ""}</div>
      </div></td>
      <td class="${v < 0 ? "bad" : "good"}">${v >= 0 ? "+" : ""}${v.toFixed(3)}%</td>
      <td>${fmtSig(r.d_success)}</td>
      <td>${fmtSig(r.d_mean_final)}</td>
      <td>${fmtSig(r.d_p5_final)}</td>
      <td>${fmtSig(r.practical_step)}</td>
      ${hasAd ? `<td>${fmtSig(r.ad_d_mean_final)}</td>` : ""}
    </tr>`;
  }).join("");
  table.innerHTML = header + body;
  wrap.appendChild(table);
  div.appendChild(wrap);
  return div;
}

// ------------------------------------------------------------ optimize card
// Optimizer result: best point metrics, the round-1 coarse sweep as an
// objective-vs-value curve with the refined optimum marked, and the final
// bracket.
export function optimizeCard(opt) {
  const div = card(
    "Optimize: " + opt.param,
    `maximize ${opt.objective} · ${opt.evaluations} evaluations × `
      + `${opt.num_paths.toLocaleString()} paths at ${opt.working_months} `
      + `working months`,
  );
  const grid = document.createElement("div");
  grid.className = "metrics";
  const items = [
    ["Best value", fmtSig(opt.best.value)],
    ["At base value", fmtSig(opt.base_value)],
    ["Success at best", `${pct(opt.best.success_probability, 2)} ±${opt.success_sigma.toFixed(2)}`],
    ["Median final", fmtMoney(opt.best.median_final_balance)],
    ["Mean final", fmtMoney(opt.best.mean_final_balance)],
    ["Refined bracket", `${fmtSig(opt.interval[0])} – ${fmtSig(opt.interval[1])}`],
  ];
  for (const [k, v] of items) {
    const m = document.createElement("div");
    m.className = "metric";
    m.innerHTML = `<div class="k">${k}</div><div class="v">${v}</div>`;
    grid.appendChild(m);
  }
  div.appendChild(grid);

  const holder = document.createElement("div");
  div.appendChild(holder);
  drawObjectiveCurve(
    holder, opt, opt.param,
    opt.curve.map((p) => toCurvePoint(p, p.value, opt.objective)),
    opt.best.value,
  );
  return div;
}

// Adapt a response point (scalar `value` or joint `values[0]`) for the
// objective curve: prefer the explicit objective_value, falling back to
// the named field for payloads predating it.
function toCurvePoint(p, value, objective) {
  return {
    value,
    success_probability: p.success_probability,
    median_final_balance: p.median_final_balance,
    objective_value: p.objective_value !== undefined
      ? p.objective_value : p[objective],
  };
}

// Round-1 coarse sweep as an objective-vs-value curve with the refined
// optimum marked; shared by the scalar card and the 1-field joint card.
function drawObjectiveCurve(holder, opt, paramName, points, bestValue) {
  const plot = makeChart(holder, { height: 240 });
  const xs = points.map((p) => p.value);
  // Plot the REQUESTED objective — a median/mean-optimal marker must land
  // on the peak of the curve it is drawn over.
  const isSuccess = opt.objective === "success_probability";
  const ys = points.map((p) => p.objective_value);
  const x = linScale(
    [xs[0], xs[xs.length - 1] === xs[0] ? xs[0] + 1 : xs[xs.length - 1]],
    [0, plot.innerW],
  );
  const y = isSuccess
    ? linScale([0, 100], [plot.innerH, 0])
    : linScale([0, Math.max(...ys, 1) * 1.05], [plot.innerH, 0]);
  drawAxes(plot, x, y, {
    yFmt: isSuccess ? (v) => `${v}%` : fmtMoney,
    xFmt: fmtSig,
  });
  drawVLine(plot, bestValue, x, {
    stroke: cssVar("--good"), label: `best ${fmtSig(bestValue)}`,
  });
  drawLine(plot, xs, ys, x, y, {});
  attachHover(plot, xs, x, (i) => [
    `<b>${paramName} = ${fmtSig(xs[i])}</b>`,
    ...(isSuccess ? [] : [`${opt.objective} ${fmtMoney(ys[i])}`]),
    `success ${points[i].success_probability.toFixed(2)}%`,
    `median ${fmtMoney(points[i].median_final_balance)}`,
  ]);
}

// ------------------------------------------------ joint optimize card
// Joint optimizer result (1 or 2 fields): best point metrics per field
// plus the round-1 product grid — a sequential single-hue success heatmap
// for two fields (cells carry hover tooltips; the ringed cell is the
// refined optimum), or the same objective curve as the scalar card for
// one.
export function optimizeJointCard(opt) {
  const names = opt.params;
  const div = card(
    "Optimize: " + names.join(" × "),
    `maximize ${opt.objective} · ${opt.evaluations} evaluations × `
      + `${opt.num_paths.toLocaleString()} paths at ${opt.working_months} `
      + `working months`,
  );
  const grid = document.createElement("div");
  grid.className = "metrics";
  const items = [];
  names.forEach((name, d) => {
    items.push([`Best ${name}`,
      `${fmtSig(opt.best.values[d])} (base ${fmtSig(opt.base_values[d])})`]);
  });
  items.push(
    ["Success at best",
     `${pct(opt.best.success_probability, 2)} ±${opt.success_sigma.toFixed(2)}`],
    ["Median final", fmtMoney(opt.best.median_final_balance)],
    ["Mean final", fmtMoney(opt.best.mean_final_balance)],
  );
  names.forEach((name, d) => {
    items.push([`${name} bracket`,
      `${fmtSig(opt.intervals[d][0])} – ${fmtSig(opt.intervals[d][1])}`]);
  });
  for (const [k, v] of items) {
    const m = document.createElement("div");
    m.className = "metric";
    m.innerHTML = `<div class="k">${esc(k)}</div><div class="v">${esc(v)}</div>`;
    grid.appendChild(m);
  }
  div.appendChild(grid);

  const holder = document.createElement("div");
  div.appendChild(holder);
  if (names.length === 1) {
    drawObjectiveCurve(
      holder, opt, names[0],
      opt.surface.map((p) => toCurvePoint(p, p.values[0], opt.objective)),
      opt.best.values[0],
    );
  } else {
    drawSurfaceHeatmap(holder, opt);
  }
  return div;
}

// K x K round-1 surface: x = second field, y = first field (C-order rows
// of the response), one accent hue ramped light→dark by objective value.
function drawSurfaceHeatmap(holder, opt) {
  const K = opt.points_per_axis;
  const [name0, name1] = opt.params;
  const plot = makeChart(holder, { height: 300 });
  const vals0 = [];
  const vals1 = [];
  for (let i = 0; i < K; i++) {
    vals0.push(opt.surface[i * K].values[0]);
    vals1.push(opt.surface[i].values[1]);
  }
  const isSuccess = opt.objective === "success_probability";
  const zs = opt.surface.map((p) => (
    p.objective_value !== undefined ? p.objective_value : p[opt.objective]
  ));
  const zLo = arrMin(zs);
  const zHi = arrMax(zs);
  // Cells are uniform in value space (linspace grids), so value scales
  // with half-step edges place them exactly.
  const step0 = (vals0[K - 1] - vals0[0]) / Math.max(K - 1, 1) || 1;
  const step1 = (vals1[K - 1] - vals1[0]) / Math.max(K - 1, 1) || 1;
  const x = linScale(
    [vals1[0] - step1 / 2, vals1[K - 1] + step1 / 2], [0, plot.innerW],
  );
  const y = linScale(
    [vals0[0] - step0 / 2, vals0[K - 1] + step0 / 2], [plot.innerH, 0],
  );
  drawAxes(plot, x, y, { xFmt: fmtSig, yFmt: fmtSig });
  const accent = cssVar("--accent");
  const cw = plot.innerW / K;
  const ch = plot.innerH / K;
  const fmtZ = (v) => (isSuccess ? `${v.toFixed(2)}%` : fmtMoney(v));
  opt.surface.forEach((p, idx) => {
    const i = Math.floor(idx / K);
    const j = idx % K;
    // 2px surface gap between cells; opacity ramps the single hue so the
    // surface reads light→dark in both themes.
    const frac = zHi > zLo ? (zs[idx] - zLo) / (zHi - zLo) : 1;
    const rect = el("rect", {
      x: x(vals1[j] - step1 / 2) + 1,
      y: y(vals0[i] + step0 / 2) + 1,
      width: Math.max(cw - 2, 1),
      height: Math.max(ch - 2, 1),
      rx: 2,
      fill: accent,
      opacity: (0.08 + 0.87 * frac).toFixed(3),
    });
    const tip = el("title");
    tip.textContent =
      `${name0} = ${fmtSig(p.values[0])}, ${name1} = ${fmtSig(p.values[1])}`
      + ` → ${fmtZ(zs[idx])}`;
    rect.appendChild(tip);
    plot.g.appendChild(rect);
  });
  // Ring the refined optimum's cell center.
  plot.g.appendChild(el("circle", {
    cx: x(opt.best.values[1]), cy: y(opt.best.values[0]), r: 5,
    fill: "none", stroke: cssVar("--good"), "stroke-width": 2,
  }));
  const note = document.createElement("div");
  note.className = "sub";
  note.textContent =
    `${name1} across, ${name0} up; darker = higher ${opt.objective}; `
    + `ring = refined optimum (${fmtZ(zLo)} – ${fmtZ(zHi)})`;
  holder.appendChild(note);
}

// -------------------------------------------------------------- grid table
// Scenario-grid results: one row per config variant with success ± MC
// error, median/mean finals and the p5–p95 band. A success-colored inline
// bar makes the sweep's shape readable without a chart.
export function gridCard(grid) {
  const div = card(
    "Scenario grid",
    `${grid.total_scenarios} variants × ${grid.num_paths.toLocaleString()} paths · base: ${grid.scenario}`,
  );
  const wrap = document.createElement("div");
  wrap.className = "grid-scroll";
  const table = document.createElement("table");
  table.className = "grid-table";
  const header = `<tr><th>variant</th><th>months</th><th>success</th>
    <th class="grid-bar-col"></th><th>p5</th><th>p25</th><th>median</th>
    <th>p75</th><th>p95</th><th>mean</th></tr>`;
  const rows = grid.rows.map((r) => {
    const p = r.final_balance_percentiles;
    const good = r.success_probability >= 90;
    const barW = Math.max(1, Math.min(100, r.success_probability));
    return `<tr>
      <td class="grid-name">${esc(r.name)}</td>
      <td>${r.working_months}</td>
      <td class="${good ? "good" : "bad"}">${r.success_probability.toFixed(2)}%
        <span class="sub">±${r.success_sigma.toFixed(2)}</span></td>
      <td class="grid-bar-col"><div class="grid-bar ${good ? "grid-bar-good" : "grid-bar-bad"}"
        style="width:${barW}%"></div></td>
      <td>${fmtMoney(p.p5)}</td><td>${fmtMoney(p.p25)}</td>
      <td>${fmtMoney(p.p50)}</td><td>${fmtMoney(p.p75)}</td>
      <td>${fmtMoney(p.p95)}</td><td>${fmtMoney(r.mean_final_balance)}</td>
    </tr>`;
  }).join("");
  table.innerHTML = header + rows;
  wrap.appendChild(table);
  div.appendChild(wrap);
  return div;
}
