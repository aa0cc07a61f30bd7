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

# Card titles views.js renders after one successful /api/simulate/stream run.
EXPECTED_CARDS = [
    "Summary",
    "Success probability vs working months",
    "Portfolio trajectory",
    "Real withdrawal rate by retirement year",
    "Years to ruin (failed paths)",
    "Final balance distribution",
]

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


def browser_pass(base: str, override: int, out_dir: str, timeout: float) -> None:
    """The real verification: drive chromium through playwright."""
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

        # First run on a fresh host may include kernel compilation.
        page.wait_for_function(
            "document.querySelectorAll('#results .card').length >= 5",
            timeout=timeout * 1000,
        )
        page.screenshot(path=os.path.join(out_dir, "01_results.png"),
                        full_page=True)

        body_text = page.inner_text("#results")
        missing = [t for t in EXPECTED_CARDS if t not in body_text]
        if missing:
            raise AssertionError(f"cards missing from #results: {missing}")

        for i, card in enumerate(page.query_selector_all("#results .card")):
            title = (card.query_selector("h3") or card).inner_text()
            slug = re.sub(r"[^a-z0-9]+", "_", title.lower())[:40]
            card.screenshot(path=os.path.join(out_dir, f"card_{i:02d}_{slug}.png"))

        # The trajectory chart's stacked bands are the one rendering trick
        # never pixel-verified in CI (reference:
        # frontend/src/components/TrajectoryChart.jsx:24-44) — require real
        # drawn SVG geometry, not just the card shell.
        n_paths = page.evaluate(
            "document.querySelectorAll('#results svg path').length")
        assert n_paths >= 6, f"expected chart SVG paths, found {n_paths}"
        browser.close()
    print(f"BROWSER PASS — screenshots in {out_dir}")


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
