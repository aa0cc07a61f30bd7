// App shell: theme, SSE orchestration, progress panel, result rendering.

import {
  getAnalysisMeta, getDefaultConfig, hasOverride, runGridStream,
  runOptimizeStream, runSensitivity, runSensitivityStream,
  runSimulationStream, validateConfig,
} from "./api.js";
import { ConfigEditor } from "./editor.js";
import {
  gridCard, histogramCard, optimizeCard, optimizeJointCard, ruinCard,
  searchCurveCard,
  sensitivityCard, summaryCard, trajectoryCard, withdrawalRateCard,
} from "./views.js";

// ---------------------------------------------------------------- theme
const THEME_KEY = "mc-retirement-theme";

// localStorage throws SecurityError when storage is blocked (embedded
// webviews, "block all cookies"); the theme preference is optional, the app
// booting is not.
function storageGet(key) {
  try { return localStorage.getItem(key); } catch { return null; }
}
function storageSet(key, value) {
  try { localStorage.setItem(key, value); } catch { /* preference lost */ }
}

function applyTheme(theme) {
  document.documentElement.setAttribute("data-theme", theme);
  storageSet(THEME_KEY, theme);
}

function initTheme() {
  const saved = storageGet(THEME_KEY);
  const prefersDark = window.matchMedia("(prefers-color-scheme: dark)").matches;
  applyTheme(saved || (prefersDark ? "dark" : "light"));
  document.getElementById("theme-toggle").onclick = () => {
    const current = document.documentElement.getAttribute("data-theme");
    applyTheme(current === "dark" ? "light" : "dark");
    if (lastRenderFn) lastRenderFn();  // re-pick CSS colors
  };
}

// ------------------------------------------------------------- progress
const progressPanel = document.getElementById("progress-panel");
let iterations = [];
let phase = null;
let startedAt = null;
let timer = null;
let gridProgress = null; // {done, total} while a grid sweep runs
let optRound = null; // {round, rounds, best_value} while an optimize runs

function elapsedText() {
  return startedAt ? ((Date.now() - startedAt) / 1000).toFixed(1) : "0.0";
}

// The 500 ms timer only refreshes the elapsed counter — rebuilding the
// whole panel each tick restarted the spinner animation mid-cycle and reset
// the iteration table's scroll position.
function tickProgress() {
  const span = document.getElementById("progress-elapsed");
  if (span) span.textContent = `${elapsedText()}s elapsed`;
  else renderProgress();
}

function renderProgress() {
  if (!phase) { progressPanel.classList.add("hidden"); return; }
  progressPanel.classList.remove("hidden");
  const last = iterations[iterations.length - 1];
  const headline = phase === "search"
    ? "Searching for the minimum working period…"
    : phase === "grid"
      ? "Running scenario grid…"
      : phase === "sensitivity"
        ? "Probing parameter sensitivities…"
        : phase === "optimize"
          ? "Refining the optimum…"
          : "Running final simulations…";
  let bar = "";
  if (phase === "optimize" && optRound) {
    const frac = optRound.rounds
      ? (optRound.round / optRound.rounds) * 100
      : 0;
    bar = `
      <div class="progress-bar-track">
        <div class="progress-bar-fill" style="width:${frac}%"></div>
      </div>
      <div class="sub">round ${optRound.round} / ${optRound.rounds} ·
        best so far ${optRound.best_value}</div>`;
  } else if ((phase === "grid" || phase === "sensitivity") && gridProgress) {
    const frac = gridProgress.total
      ? (gridProgress.done / gridProgress.total) * 100
      : 0;
    const noun = phase === "grid" ? "variants" : "probe rows";
    bar = `
      <div class="progress-bar-track">
        <div class="progress-bar-fill" style="width:${frac}%"></div>
      </div>
      <div class="sub">${gridProgress.done} / ${gridProgress.total} ${noun}</div>`;
  } else if (last) {
    // target 0 is legal and always met — show a full bar, not prob/100.
    const frac = last.target === 0
      ? 100
      : Math.min(100, (last.probability / last.target) * 100);
    bar = `
      <div class="progress-bar-track">
        <div class="progress-bar-fill" style="width:${frac}%"></div>
      </div>
      <div class="sub">latest probe: ${last.working_months} months →
        ${last.probability.toFixed(2)}% (target ${last.target}%)</div>`;
  }
  const rows = iterations.slice(-12).reverse().map((it) => `
    <tr><td>${it.iteration}</td><td>${it.working_months}</td>
        <td>${it.working_years}</td><td>${it.probability.toFixed(2)}%</td></tr>`
  ).join("");
  progressPanel.innerHTML = `
    <div class="card">
      <div class="progress-head">
        <h3><span class="spinner" aria-hidden="true"></span>${headline}</h3>
        <span class="sub" id="progress-elapsed">${elapsedText()}s elapsed</span>
      </div>
      ${bar}
      ${iterations.length ? `
        <div class="iter-scroll"><table class="iter-table">
          <tr><th>#</th><th>months</th><th>years</th><th>probability</th></tr>
          ${rows}
        </table></div>` : ""}
    </div>`;
}

// --------------------------------------------------------------- results
const resultsDiv = document.getElementById("results");
const emptyState = document.getElementById("empty-state");
let lastResult = null;
let lastRenderFn = null; // re-invoked on theme flips to re-pick CSS colors

function showBanner(message) {
  let banner = document.getElementById("error-banner");
  if (!message) { if (banner) banner.remove(); return; }
  if (!banner) {
    banner = document.createElement("div");
    banner.id = "error-banner";
    banner.className = "error-banner";
    resultsDiv.parentNode.insertBefore(banner, resultsDiv);
  }
  banner.textContent = `Simulation failed: ${message}`;
}

function renderResult(result) {
  lastResult = result;
  // Verification hook: scripts/browser_verify.py reads this to assert the
  // rendered DOM against the exact payload the cards were built from.
  window.__mcrtLastResult = result;
  lastRenderFn = () => renderResult(result);
  emptyState.classList.add("hidden");
  resultsDiv.innerHTML = "";
  resultsDiv.appendChild(summaryCard(result));
  if (result.search_curve) resultsDiv.appendChild(searchCurveCard(result.search_curve));
  if (result.trajectory) resultsDiv.appendChild(trajectoryCard(result));
  if (result.withdrawal_rate) resultsDiv.appendChild(withdrawalRateCard(result.withdrawal_rate));
  if (result.ruin_histogram) resultsDiv.appendChild(ruinCard(result.ruin_histogram));
  if (result.histogram) resultsDiv.appendChild(histogramCard(result.histogram));
}

function renderGridResult(grid) {
  lastRenderFn = () => renderGridResult(grid);
  emptyState.classList.add("hidden");
  resultsDiv.innerHTML = "";
  resultsDiv.appendChild(gridCard(grid));
}

function renderSensitivityResult(sens) {
  lastRenderFn = () => renderSensitivityResult(sens);
  emptyState.classList.add("hidden");
  resultsDiv.innerHTML = "";
  resultsDiv.appendChild(sensitivityCard(sens));
}

function renderOptimizeResult(opt) {
  lastRenderFn = () => renderOptimizeResult(opt);
  emptyState.classList.add("hidden");
  resultsDiv.innerHTML = "";
  resultsDiv.appendChild(
    opt.params ? optimizeJointCard(opt) : optimizeCard(opt),
  );
}

// ------------------------------------------------------------------ run
const editor = new ConfigEditor(document.getElementById("config-editor"), {
  onRun: async (config, override) => {
    // One run at a time: the progress globals (phase, timer, iterations)
    // are shared by the simulate / grid / sensitivity flows, and a second
    // writer would orphan the first run's timer and hide its progress.
    if (phase) {
      editor.showError("Another run is already in progress.");
      return;
    }
    editor.setRunning(true);
    editor.showError("");
    showBanner("");
    // Pre-flight via /api/validate. The stream endpoint validates too, but
    // failing here keeps the progress panel and elapsed timer untouched —
    // the error lands in the editor before any "running" UI appears.
    try {
      await validateConfig(config);
    } catch (err) {
      editor.showError(String(err.message || err));
      editor.setRunning(false);
      return;
    }
    iterations = [];
    // An override of 0 is valid (skip search, retire immediately).
    phase = hasOverride(override) ? "final_sim" : "search";
    startedAt = Date.now();
    renderProgress();
    timer = setInterval(tickProgress, 500);

    try {
      await runSimulationStream(config, override, {
        onProgress: (event) => {
          if (event.type === "phase") phase = event.phase;
          else if (event.type === "search_iter") iterations.push(event);
          renderProgress();
        },
        onResult: (data) => {
          renderResult(data);
        },
        onError: (message) => {
          editor.showError(message);
          showBanner(message);
        },
      });
    } catch (err) {
      editor.showError(String(err));
      showBanner(String(err));
    } finally {
      clearInterval(timer);
      phase = null;
      renderProgress();
      editor.setRunning(false);
    }
  },
});

// --------------------------------------------------- shared panel plumbing
// The grid / sensitivity / optimize panels validate the same inputs and
// drive the same progress lifecycle — one definition each.

function panelError(boxId) {
  const box = document.getElementById(boxId);
  return (message) => {
    box.textContent = message || "";
    box.classList.toggle("hidden", !message);
  };
}

// An empty field coerces to 0 via Number("") — require explicit input.
// Returns the month count, or null after surfacing the error (0 is valid).
function readMonths(inputId, showError) {
  const raw = document.getElementById(inputId).value.trim();
  const months = Number(raw);
  if (raw === "" || !Number.isInteger(months) || months < 0) {
    showError("Working months must be a nonnegative integer.");
    return null;
  }
  return months;
}

// Optional path-count override; returns false after surfacing the error.
function readOptionalPaths(inputId, body, showError) {
  const raw = document.getElementById(inputId).value;
  if (raw === "") return true;
  const n = Number(raw);
  if (!Number.isInteger(n) || n < 1) {
    showError("Paths must be a positive integer.");
    return false;
  }
  body.num_paths = n;
  return true;
}

// Run one analysis under the shared progress globals: set the phase, tick
// the elapsed timer, and ALWAYS tear down (the run() closure handles its
// own errors; teardown must not depend on it).
async function runAnalysisPanel(runBtn, startPhase, run) {
  runBtn.disabled = true;
  iterations = [];
  phase = startPhase;
  startedAt = Date.now();
  renderProgress();
  timer = setInterval(tickProgress, 500);
  try {
    await run();
  } finally {
    clearInterval(timer);
    phase = null;
    gridProgress = null;
    optRound = null;
    renderProgress();
    runBtn.disabled = false;
  }
}

// ----------------------------------------------------------- scenario grid
// Sweep many config variants in one batched device run (POST
// /api/grid/stream). The base scenario is whatever the editor holds; each
// variant is {"name": ..., "overrides": {field: value}}.
const GRID_EXAMPLE = [
  { name: "base", overrides: {} },
  { name: "spend +20%", overrides: { monthly_expenses: 6000 } },
  { name: "equity 6%", overrides: { inv1_returns_mean: 0.06 } },
];

function initGridPanel() {
  const holder = document.getElementById("grid-panel");
  if (!holder) return;
  holder.innerHTML = `
    <details class="grid-setup">
      <summary>Scenario grid</summary>
      <div class="sub">One batched sweep over config variants — each entry
        is {"name": …, "overrides": {field: value}} applied to the current
        scenario.</div>
      <textarea id="grid-variants" rows="8" spellcheck="false"></textarea>
      <div class="grid-run-row">
        <label class="field">Working months
          <input id="grid-months" type="number" min="0" step="1" value="240" />
        </label>
        <label class="field">Paths
          <input id="grid-paths" type="number" min="1" step="1"
            placeholder="(main sims)" />
        </label>
        <button id="grid-run" class="btn">Run grid</button>
      </div>
      <div id="grid-error" class="error-box hidden"></div>
    </details>`;
  document.getElementById("grid-variants").value =
    JSON.stringify(GRID_EXAMPLE, null, 1);
  const showGridError = panelError("grid-error");
  const runBtn = document.getElementById("grid-run");
  runBtn.onclick = async () => {
    showGridError("");
    showBanner("");
    if (phase) { showGridError("Another run is already in progress."); return; }
    const config = editor.getConfig();
    if (!config) { showGridError("Load a scenario first."); return; }
    let variants;
    try {
      variants = JSON.parse(document.getElementById("grid-variants").value);
      if (!Array.isArray(variants) || !variants.length) {
        throw new Error("expected a non-empty JSON array");
      }
    } catch (err) {
      showGridError(`Variants: ${err.message}`);
      return;
    }
    const months = readMonths("grid-months", showGridError);
    if (months === null) return;
    const body = { config, variants, working_months: months };
    if (!readOptionalPaths("grid-paths", body, showGridError)) return;
    gridProgress = { done: 0, total: variants.length };
    await runAnalysisPanel(runBtn, "grid", async () => {
      try {
        await runGridStream(body, {
          onProgress: (event) => {
            if (event.type === "grid_chunk") {
              gridProgress = { done: event.done, total: event.total };
            }
            renderProgress();
          },
          onResult: (data) => renderGridResult(data),
          onError: (message) => {
            showGridError(message);
            showBanner(message);
          },
        });
      } catch (err) {
        showGridError(String(err));
        showBanner(String(err));
      }
    });
  };
}

// ------------------------------------------------------------ sensitivity
// Tornado analysis: probe each parameter theta ± h around the current
// scenario (one batched device dispatch, common random numbers) and rank
// by how much one practical step moves the success probability.
function initSensitivityPanel() {
  const holder = document.getElementById("sensitivity-panel");
  if (!holder) return;
  holder.innerHTML = `
    <details class="grid-setup">
      <summary>Sensitivity</summary>
      <div class="sub">Which lever moves the plan most: finite differences
        over a common-random-numbers grid around the current scenario.
        Leave parameters empty for the default tornado set.</div>
      <label class="field">Parameters (comma-separated config fields)
        <input id="sens-params" type="text" placeholder="(default set)" />
      </label>
      <div class="grid-run-row">
        <label class="field">Working months
          <input id="sens-months" type="number" min="0" step="1" value="240" />
        </label>
        <label class="field">Paths
          <input id="sens-paths" type="number" min="1" step="1"
            placeholder="(main sims)" />
        </label>
        <button id="sens-run" class="btn">Run sensitivity</button>
      </div>
      <div id="sens-error" class="error-box hidden"></div>
    </details>`;
  const showSensError = panelError("sens-error");
  const runBtn = document.getElementById("sens-run");
  runBtn.onclick = async () => {
    showSensError("");
    showBanner("");
    if (phase) { showSensError("Another run is already in progress."); return; }
    const config = editor.getConfig();
    if (!config) { showSensError("Load a scenario first."); return; }
    const months = readMonths("sens-months", showSensError);
    if (months === null) return;
    const body = { config, working_months: months };
    const raw = document.getElementById("sens-params").value.trim();
    if (raw !== "") {
      body.params = raw.split(",").map((s) => s.trim()).filter((s) => s);
    }
    if (!readOptionalPaths("sens-paths", body, showSensError)) return;
    gridProgress = { done: 0, total: 0 };
    await runAnalysisPanel(runBtn, "sensitivity", async () => {
      try {
        await runSensitivityStream(body, {
          onProgress: (event) => {
            if (event.type === "grid_chunk") {
              gridProgress = { done: event.done, total: event.total };
            }
            renderProgress();
          },
          onResult: (data) => renderSensitivityResult(data),
          onError: (message) => {
            showSensError(message);
            showBanner(message);
          },
        });
      } catch (err) {
        showSensError(String(err));
        showBanner(String(err));
      }
    });
  };
}

// --------------------------------------------------------------- optimize
// Maximize success probability over one config field — or two jointly
// via a K x K product grid: each refinement round is one batched CRN
// grid dispatch, zooming every axis into the argmax neighborhood.
function initOptimizePanel() {
  const holder = document.getElementById("optimize-panel");
  if (!holder) return;
  holder.innerHTML = `
    <details class="grid-setup">
      <summary>Optimize</summary>
      <div class="sub">Find the value of one config field — or of two
        jointly over a product grid — that maximizes the success
        probability (batched grid refinement around the current scenario;
        bounds default to each field's hard limits).</div>
      <label class="field">Parameter (config field)
        <input id="opt-param" type="text" value="allocation_inv1_pct" />
      </label>
      <div class="grid-run-row">
        <label class="field">Lower bound
          <input id="opt-lo" type="number" step="any" placeholder="(field min)" />
        </label>
        <label class="field">Upper bound
          <input id="opt-hi" type="number" step="any" placeholder="(field max)" />
        </label>
      </div>
      <label class="field">Second parameter (optional — joint 2-D grid)
        <input id="opt-param2" type="text" placeholder="(none)" />
      </label>
      <div class="grid-run-row">
        <label class="field">Lower bound
          <input id="opt-lo2" type="number" step="any" placeholder="(field min)" />
        </label>
        <label class="field">Upper bound
          <input id="opt-hi2" type="number" step="any" placeholder="(field max)" />
        </label>
      </div>
      <div class="grid-run-row">
        <label class="field">Objective
          <select id="opt-objective">
            <option value="success_probability" selected>success probability</option>
            <option value="median_final_balance">median final balance</option>
            <option value="mean_final_balance">mean final balance</option>
            <option value="p5_final_balance">p5 final balance (downside)</option>
            <option value="p25_final_balance">p25 final balance</option>
          </select>
        </label>
        <label class="field">Points / axis
          <input id="opt-points" type="number" min="3" max="257" step="1"
            placeholder="(17; 13 joint)" />
        </label>
        <label class="field">Rounds
          <input id="opt-rounds" type="number" min="1" max="8" step="1"
            placeholder="(3)" />
        </label>
      </div>
      <div class="grid-run-row">
        <label class="field">Working months
          <input id="opt-months" type="number" min="0" step="1" value="240" />
        </label>
        <label class="field">Paths
          <input id="opt-paths" type="number" min="1" step="1"
            placeholder="(main sims)" />
        </label>
        <button id="opt-run" class="btn">Optimize</button>
      </div>
      <div id="opt-error" class="error-box hidden"></div>
    </details>`;
  const showOptError = panelError("opt-error");
  const runBtn = document.getElementById("opt-run");
  runBtn.onclick = async () => {
    showOptError("");
    showBanner("");
    if (phase) { showOptError("Another run is already in progress."); return; }
    const config = editor.getConfig();
    if (!config) { showOptError("Load a scenario first."); return; }
    const param = document.getElementById("opt-param").value.trim();
    if (!param) { showOptError("Name a config field to optimize."); return; }
    const months = readMonths("opt-months", showOptError);
    if (months === null) return;
    const readBound = (id, key, into) => {
      const raw = document.getElementById(id).value.trim();
      if (raw === "") return true;
      const v = Number(raw);
      if (!Number.isFinite(v)) {
        showOptError(`${key} must be a number.`);
        return false;
      }
      into[key] = v;
      return true;
    };
    const param2 = document.getElementById("opt-param2").value.trim();
    const body = { config, working_months: months };
    if (param2) {
      // Joint 2-D form: one product-grid dispatch per round.
      const spec1 = { name: param };
      const spec2 = { name: param2 };
      if (!readBound("opt-lo", "lo", spec1)) return;
      if (!readBound("opt-hi", "hi", spec1)) return;
      if (!readBound("opt-lo2", "lo", spec2)) return;
      if (!readBound("opt-hi2", "hi", spec2)) return;
      body.params = [spec1, spec2];
    } else {
      body.param = param;
      if (!readBound("opt-lo", "lo", body)) return;
      if (!readBound("opt-hi", "hi", body)) return;
    }
    if (!readOptionalPaths("opt-paths", body, showOptError)) return;
    body.objective = document.getElementById("opt-objective").value;
    for (const [id, key, lo, hi] of [["opt-points", "points", 3, 257],
                                     ["opt-rounds", "rounds", 1, 8]]) {
      const raw = document.getElementById(id).value.trim();
      if (raw === "") continue;
      const v = Number(raw);
      if (!Number.isInteger(v) || v < lo || v > hi) {
        showOptError(`${key} must be an integer in [${lo}, ${hi}].`);
        return;
      }
      body[key] = v;
    }
    await runAnalysisPanel(runBtn, "optimize", async () => {
      try {
        await runOptimizeStream(body, {
          onProgress: (event) => {
            if (event.type === "optimize_round") {
              optRound = {
                round: event.round,
                rounds: event.rounds,
                best_value: event.best_value !== undefined
                  ? event.best_value
                  : (event.best_values || []).join(", "),
              };
            }
            renderProgress();
          },
          onResult: (data) => renderOptimizeResult(data),
          onError: (message) => {
            showOptError(message);
            showBanner(message);
          },
        });
      } catch (err) {
        showOptError(String(err));
        showBanner(String(err));
      }
    });
  };
}

initTheme();
initGridPanel();
initSensitivityPanel();
initOptimizePanel();
// Parameter-name completion for the analysis panels (discovery endpoint;
// the panels keep working as plain text inputs if it is unavailable).
getAnalysisMeta()
  .then((meta) => {
    const dl = document.createElement("datalist");
    dl.id = "param-names";
    for (const p of meta.parameters) {
      const o = document.createElement("option");
      o.value = p.name;
      dl.appendChild(o);
    }
    document.body.appendChild(dl);
    for (const id of ["opt-param", "opt-param2"]) {
      const el = document.getElementById(id);
      if (el) el.setAttribute("list", "param-names");
    }
  })
  .catch(() => {});
getDefaultConfig()
  .then((config) => editor.setDefault(config))
  .catch((err) => {
    document.getElementById("config-editor").textContent =
      `Could not load default config: ${err.message}`;
  });
