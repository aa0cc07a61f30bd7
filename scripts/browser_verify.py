"""Real-browser verification of the dashboard — the executable handoff.

The one surface this build environment cannot exercise is a real browser
rendering the SPA (no Chrome/Chromium/node in the image; everything else is
executed in CI under tools/jsmini, including the reference's own api.js).
This script makes that verification a 5-minute task on ANY machine with a
browser:

    python scripts/browser_verify.py [--port 8080] [--config config.json] \
        [--override 240] [--out-dir /tmp/mcrt_browser] [--timeout 600]

Behavior:
  1. Boots the HTTP server as a subprocess and waits for /api/health.
  2. If playwright + a chromium build are importable (pip install playwright;
     playwright install chromium), it loads "/", fills the working-months
     override, clicks "Run simulation", waits for every result card, asserts
     the expected card titles, and screenshots the full page plus each card
     into --out-dir. Exit 0 = the dashboard rendered end-to-end for real.
  3. Otherwise it degrades to an HTTP smoke (index + every referenced asset +
     a full SSE simulation consumed like the browser would) and prints the
     manual checklist, exiting 3 so CI can tell "verified in a browser"
     from "only smoked over HTTP".

The card list below mirrors frontend/js/views.js (one card per reference
component — reference: frontend/src/App.jsx renders the same set).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Card titles views.js renders, keyed by the payload field that gates each
# card (renderResult in frontend/js/app.js): a card must be rendered IFF its
# field is present/truthy in the result payload. The search-curve card, for
# example, is absent on --override runs (no search ran), and the ruin
# histogram is absent when no path failed.
CARD_FOR_FIELD = {
    "summary": "Summary",
    "search_curve": "Success probability vs working months",
    "trajectory": "Portfolio trajectory",
    "withdrawal_rate": "Real withdrawal rate by retirement year",
    "ruin_histogram": "Years to ruin (failed paths)",
    "histogram": "Final balance distribution",
}
EXPECTED_CARDS = list(CARD_FOR_FIELD.values())

# First-level response fields those cards read (frontend contract — kept in
# sync by tests/test_utils_and_frontend.py; this is the handoff's own check).
RESULT_FIELDS = [
    "summary", "trajectory", "trajectory_real", "withdrawal_rate",
    "search_curve", "ruin_histogram", "histogram", "reference_lines",
]


def _get(url: str, timeout: float = 10.0) -> bytes:
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        if resp.status != 200:
            raise RuntimeError(f"GET {url} -> {resp.status}")
        return resp.read()


def boot_server(port: int, config: str) -> subprocess.Popen:
    env = dict(os.environ)
    env["MCRT_DEFAULT_CONFIG"] = os.path.abspath(config)
    env["MCRT_PORT"] = str(port)
    proc = subprocess.Popen(
        [sys.executable, "-m", "monte_carlo_retirement_tpu.hosts.server"],
        cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError("server exited during boot")
        try:
            if json.loads(_get(f"http://localhost:{port}/api/health", 2)):
                return proc
        except Exception:
            time.sleep(0.5)
    proc.terminate()
    raise RuntimeError(
        f"server did not answer /api/health on port {port} within 120 s "
        "(is the port free?)"
    )


# JS snippet run once after the cards render: extracts everything the
# contract checks need (per-card SVG geometry + summary metric texts + the
# exact payload the app rendered from) in a single page.evaluate round trip.
_EXTRACT_JS = """
() => {
  const cards = [...document.querySelectorAll('#results .card')].map((c) => {
    const svg = c.querySelector('svg');
    const paths = svg ? [...svg.querySelectorAll('path')] : [];
    const isBand = (p) =>
      p.getAttribute('stroke') === 'none' && p.getAttribute('fill') !== 'none';
    return {
      title: (c.querySelector('h3') || c).innerText.trim(),
      // Point count per filled band polygon (the stacked-band render):
      // number of M/L commands in its path data.
      bands: paths.filter(isBand)
        .map((p) => (p.getAttribute('d').match(/[ML]/g) || []).length),
      lines: paths.filter((p) => p.getAttribute('fill') === 'none').length,
      bars: svg ? svg.querySelectorAll('rect[opacity]').length : 0,
      markers: svg ? svg.querySelectorAll('circle').length : 0,
      svgText: svg
        ? [...svg.querySelectorAll('text')].map((t) => t.textContent).join('|')
        : '',
    };
  });
  const metrics = {};
  document.querySelectorAll('#results .metric').forEach((m) => {
    metrics[m.querySelector('.k').innerText.trim()] =
      m.querySelector('.v').innerText.trim();
  });
  return {
    cards,
    metrics,
    pctHeaders: [...document.querySelectorAll('#results .pct-table th')]
      .map((t) => t.innerText.trim()),
    errorBanner: document.getElementById('error-banner')?.innerText ?? null,
    payload: window.__mcrtLastResult ?? null,
  };
}
"""


def _parse_money(text: str):
    """Invert charts.js fmtMoney ('$7.33M' -> 7.33e6) + its rounding unit."""
    m = re.fullmatch(r"\$(-?[\d.]+)([BMk]?)", text.strip())
    if not m:
        return None, None
    unit = {"B": 1e9, "M": 1e6, "k": 1e3, "": 1.0}[m.group(2)]
    decimals = {"B": 2, "M": 2, "k": 0, "": 0}[m.group(2)]
    return float(m.group(1)) * unit, 0.51 * unit / 10**decimals


def _band_points(xs, lo, hi):
    """Mirror charts.js drawBand: 2 polygon points per non-null (lo, hi)
    pair, 0 points = band not drawn at all."""
    n = sum(
        1 for i in range(len(xs))
        if lo[i] is not None and hi[i] is not None
        and lo[i] == lo[i] and hi[i] == hi[i]  # NaN guard
    )
    return 2 * n if n else None


def contract_failures(state: dict, override: int) -> list:
    """Assert the rendered DOM against the payload it was built from.

    Returns a list of human-readable failure strings (empty = contract
    holds). Every check compares DOM content to the SSE payload the page
    itself received (window.__mcrtLastResult), so a pass means the cards
    show the API's numbers — not merely that cards exist.
    """
    fails: list = []
    payload = state["payload"]
    if payload is None:
        return ["window.__mcrtLastResult is unset — renderResult never ran"]
    if state["errorBanner"]:
        fails.append(f"error banner shown: {state['errorBanner']!r}")

    titles = [c["title"].split("\n")[0] for c in state["cards"]]
    by_title = {c["title"].split("\n")[0]: c for c in state["cards"]}

    # 1. Card set == payload fields (both directions).
    for field, title in CARD_FOR_FIELD.items():
        if payload.get(field) and title not in titles:
            fails.append(f"payload has {field} but card {title!r} not rendered")
        if not payload.get(field) and title in titles:
            fails.append(f"card {title!r} rendered without payload {field}")

    # 2. Summary numbers == payload.summary.
    s = payload["summary"]
    metrics = state["metrics"]

    def metric(name):
        return metrics.get(name)

    sp_text = metric("Success probability") or ""
    m = re.match(r"(-?[\d.]+)%", sp_text)
    if not m or abs(float(m.group(1)) - s["success_probability"]) > 0.006:
        fails.append(
            f"summary success probability {sp_text!r} != "
            f"{s['success_probability']:.4f}"
        )
    wp_key = (
        "Estimated working period"
        if s["working_period_is_estimate"] else "Working period"
    )
    wp_text = metric(wp_key) or ""
    # :g matches JS number rendering (18, not 18.0) whatever the JSON type.
    if not wp_text.startswith(f"{s['required_working_months']:g} mo"):
        fails.append(
            f"summary {wp_key!r} {wp_text!r} != "
            f"{s['required_working_months']:g} mo"
        )
    if s["required_working_months"] != override:
        fails.append(
            f"required_working_months {s['required_working_months']} != "
            f"the override {override} that was submitted"
        )
    for name, want in [
        ("Median balance at retirement", s["median_start_balance"]),
        ("Median final (successful)", s["median_final_balance_successful"]),
    ]:
        got, tol = _parse_money(metric(name) or "")
        if want is None:
            continue
        if got is None or abs(got - want) > tol:
            fails.append(f"summary {name!r} {metric(name)!r} != {want:.0f}")
    tgt = re.match(r"(-?[\d.]+)%", metric("Target") or "")
    if not tgt or abs(float(tgt.group(1)) - s["target_probability"]) > 0.051:
        fails.append(
            f"summary Target {metric('Target')!r} != {s['target_probability']}"
        )
    want_headers = [k.upper() for k in s["final_balance_percentiles"]]
    if state["pctHeaders"] != want_headers:
        fails.append(
            f"percentile table headers {state['pctHeaders']} != {want_headers}"
        )

    # 3. Trajectory card: stacked-band geometry (the render trick CI cannot
    # pixel-verify — reference TrajectoryChart.jsx stacks an invisible base
    # series; here each band must be a closed polygon with exactly
    # 2 points per non-null percentile pair), sample-path and median line
    # counts, and one numbered marker per in-horizon reference line.
    traj = payload.get("trajectory")
    card = by_title.get(CARD_FOR_FIELD["trajectory"])
    if traj and card:
        p = traj["percentiles"]
        xs = traj["years"]
        want_bands = sorted(
            b for b in (
                _band_points(xs, p.get("p5"), p.get("p95")),
                _band_points(xs, p.get("p25"), p.get("p75")),
            ) if b
        )
        if sorted(card["bands"]) != want_bands:
            fails.append(
                f"trajectory bands {sorted(card['bands'])} != {want_bands} "
                "(2 polygon points per year, one polygon per band)"
            )
        want_lines = len(traj["sample_paths"]) + (1 if p.get("p50") else 0)
        if card["lines"] != want_lines:
            fails.append(
                f"trajectory line paths {card['lines']} != {want_lines} "
                f"({len(traj['sample_paths'])} samples + median)"
            )
        max_year = xs[-1] if xs else 0
        want_markers = sum(
            1 for r in payload.get("reference_lines") or []
            if r["year"] <= max_year
        )
        if card["markers"] != want_markers:
            fails.append(
                f"trajectory stream markers {card['markers']} != "
                f"{want_markers}"
            )

    # 4. Withdrawal-rate card: the 4% rule line + both bands over the rows
    # whose median is observed.
    wr = payload.get("withdrawal_rate")
    card = by_title.get(CARD_FOR_FIELD["withdrawal_rate"])
    if wr and card:
        if "4% rule" not in card["svgText"]:
            fails.append("withdrawal-rate card: '4% rule' line label missing")
        p = wr["percentiles"]
        rows = [
            i for i in range(len(wr["years"]))
            if p.get("p50") and p["p50"][i] is not None
        ]
        if rows:
            sub = lambda key: [p[key][i] for i in rows] if p.get(key) else None
            want_bands = sorted(
                b for b in (
                    _band_points(rows, sub("p5"), sub("p95")),
                    _band_points(rows, sub("p25"), sub("p75")),
                ) if b
            )
            if sorted(card["bands"]) != want_bands:
                fails.append(
                    f"withdrawal-rate bands {sorted(card['bands'])} != "
                    f"{want_bands}"
                )

    # 5. Histograms: one drawn bar per non-empty bin (server-binned runs).
    rh = payload.get("ruin_histogram")
    card = by_title.get(CARD_FOR_FIELD["ruin_histogram"])
    if rh and card and rh.get("failure_count"):
        if rh.get("year_counts"):
            want = sum(1 for c in rh["year_counts"] if c > 0)
            if card["bars"] != want:
                fails.append(f"ruin histogram bars {card['bars']} != {want}")
        elif card["bars"] < 1:
            fails.append("ruin histogram rendered no bars")
    h = payload.get("histogram")
    card = by_title.get(CARD_FOR_FIELD["histogram"])
    if h and card:
        binned = h.get("binned")
        if binned and binned.get("success_count"):
            want = sum(1 for c in binned["counts"] if c > 0)
            if card["bars"] != want:
                fails.append(f"balance histogram bars {card['bars']} != {want}")
        elif not binned and card["bars"] < 1:
            fails.append("balance histogram rendered no bars")

    return fails


def browser_pass(base: str, override: int, out_dir: str, timeout: float) -> None:
    """The real verification: drive chromium through playwright, then assert
    the rendered DOM against the payload it was rendered from (pass/fail —
    a nonzero exit means a card is missing or shows the wrong numbers)."""
    from playwright.sync_api import sync_playwright  # noqa: deferred import

    os.makedirs(out_dir, exist_ok=True)
    with sync_playwright() as p:
        browser = p.chromium.launch()
        page = browser.new_page(viewport={"width": 1600, "height": 1000})
        page.goto(base, wait_until="networkidle")

        # Editor booted = default config loaded through GET /api/config/default.
        page.wait_for_selector("#run-btn", timeout=30_000)
        page.screenshot(path=os.path.join(out_dir, "00_editor.png"),
                        full_page=True)

        # Skip the search so a cold host doesn't wait through every probe
        # compile; the SSE path and all result cards are identical.
        page.fill("#override-input", str(override))
        page.click("#run-btn")

        # First run on a fresh host may include kernel compilation. The run
        # is done when renderResult publishes the payload it drew from.
        page.wait_for_function(
            "window.__mcrtLastResult !== undefined"
            " && window.__mcrtLastResult !== null",
            timeout=timeout * 1000,
        )
        page.screenshot(path=os.path.join(out_dir, "01_results.png"),
                        full_page=True)

        state = page.evaluate(_EXTRACT_JS)
        fails = contract_failures(state, override)

        for i, card in enumerate(page.query_selector_all("#results .card")):
            title = (card.query_selector("h3") or card).inner_text()
            slug = re.sub(r"[^a-z0-9]+", "_", title.lower())[:40]
            card.screenshot(path=os.path.join(out_dir, f"card_{i:02d}_{slug}.png"))

        browser.close()
    if fails:
        for f in fails:
            print(f"CONTRACT FAIL: {f}")
        raise AssertionError(f"{len(fails)} contract check(s) failed")
    print(
        f"BROWSER PASS — {len(state['cards'])} cards match the payload; "
        f"screenshots in {out_dir}"
    )


def http_smoke(base: str, override: int) -> None:
    """No browser available: verify everything HTTP can see, like a browser
    would fetch it, and print the remaining manual checklist."""
    index = _get(base + "/").decode()
    queue = [
        a.lstrip("/")
        for a in re.findall(r'(?:href|src)="([^"]+)"', index)
        if not a.startswith(("data:", "http"))
    ]
    fetched: set = set()
    while queue:
        a = queue.pop()
        if a in fetched:
            continue
        body = _get(base + "/" + a)
        fetched.add(a)
        if a.endswith(".js"):
            # Chase the static-import graph the way a module browser would.
            for rel in re.findall(
                r'from\s+"\./([^"]+)"', body.decode(), re.M
            ):
                queue.append(os.path.normpath(
                    os.path.join(os.path.dirname(a), rel)))
    print(f"index + {len(fetched)} assets fetched OK: {sorted(fetched)}")

    config = json.loads(_get(base + "/api/config/default"))
    body = json.dumps(
        {"config": config, "working_months_override": override}
    ).encode()
    req = urllib.request.Request(
        base + "/api/simulate/stream", data=body,
        headers={"content-type": "application/json"},
    )
    result = None
    with urllib.request.urlopen(req, timeout=600) as resp:
        buf = b""
        while True:
            chunk = resp.read(4096)
            if not chunk:
                break
            buf += chunk
            while b"\n\n" in buf:
                frame, buf = buf.split(b"\n\n", 1)
                if frame.startswith(b"data: "):
                    event = json.loads(frame[6:])
                    if event.get("type") == "result":
                        result = event["data"]
                    elif event.get("type") == "error":
                        raise RuntimeError(event.get("message"))
    assert result is not None, "SSE stream ended without a result event"
    missing = [f for f in RESULT_FIELDS if f not in result]
    assert not missing, f"result payload missing card fields: {missing}"
    print(f"SSE simulate OK: success={result['summary']['success_probability']:.2f}%"
          f", {len(result['trajectory']['years'])} trajectory points")

    print(
        "\nHTTP SMOKE PASS — no browser found on this host.\n"
        "To finish the real-browser pass on a machine with Chrome:\n"
        "  pip install playwright && playwright install chromium\n"
        f"  python scripts/browser_verify.py --override {override}\n"
        "Manual checklist (if driving by hand instead):\n"
        "  1. open the printed URL; the editor form renders on the left\n"
        "  2. set 'Working months override', click 'Run simulation'\n"
        "  3. progress panel streams phases, then six result cards render:\n"
        + "".join(f"       - {t}\n" for t in EXPECTED_CARDS)
        + "  4. trajectory card: percentile bands + median + sample paths;\n"
        "     Nominal/Real toggle redraws; theme toggle keeps charts legible"
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--port", type=int, default=int(os.environ.get("PORT", 8080)))
    ap.add_argument("--config", default=os.path.join(REPO, "config.json"))
    ap.add_argument("--override", type=int, default=240,
                    help="working months override (skips the search)")
    ap.add_argument("--out-dir", default="/tmp/mcrt_browser")
    ap.add_argument("--timeout", type=float, default=600,
                    help="seconds to wait for the first (possibly cold) run")
    ap.add_argument("--no-server", action="store_true",
                    help="attach to an already-running server on --port")
    args = ap.parse_args()

    base = f"http://localhost:{args.port}"
    proc = None if args.no_server else boot_server(args.port, args.config)
    try:
        try:
            import playwright.sync_api  # noqa: F401
            have_browser = True
        except ImportError:
            have_browser = False
        if have_browser:
            browser_pass(base, args.override, args.out_dir, args.timeout)
            return 0
        http_smoke(base, args.override)
        return 3  # smoked, not browser-verified
    finally:
        if proc is not None:
            proc.terminate()
            proc.wait(timeout=30)


if __name__ == "__main__":
    sys.exit(main())
