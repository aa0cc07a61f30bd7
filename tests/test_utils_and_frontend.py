"""Coverage for profiling utilities, mesh helpers and frontend integrity."""

import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_retirement_tpu.parallel.mesh import (
    make_mesh,
    pad_to_devices,
    shard_paths,
)
from monte_carlo_retirement_tpu.utils.profiling import (
    device_timer,
    phase_timings,
    trace_to,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_device_timer_accumulates_phases():
    x = jnp.ones((64,))
    with device_timer("unit-phase", result=x):
        y = x * 2
    with device_timer("unit-phase", result=y):
        _ = y + 1
    stats = phase_timings()["unit-phase"]
    assert stats["calls"] >= 2
    assert stats["total_s"] >= 0.0
    assert stats["mean_ms"] >= 0.0


def test_trace_to_noop_without_dir():
    with trace_to(None):
        pass  # must not start the profiler


def test_shard_paths_places_leading_axis():
    mesh = make_mesh()
    n = pad_to_devices(100, len(jax.devices()))
    arr = shard_paths(mesh, jnp.arange(n, dtype=jnp.float32))
    assert len(arr.sharding.device_set) == len(jax.devices())
    np.testing.assert_allclose(np.asarray(arr), np.arange(n, dtype=np.float32))


def test_frontend_dom_contract():
    """Every element id the JS queries must exist in index.html, and every
    module referenced via import must ship."""
    html = open(os.path.join(ROOT, "frontend", "index.html")).read()
    js_dir = os.path.join(ROOT, "frontend", "js")
    sources = {
        fn: open(os.path.join(js_dir, fn)).read() for fn in os.listdir(js_dir)
    }
    queried = set()
    for src in sources.values():
        queried |= set(re.findall(r'getElementById\("([\w-]+)"\)', src))
    declared = set(re.findall(r'id="([\w-]+)"', html))
    missing = {i for i in queried if i not in declared}
    # ids created dynamically by the editor itself are exempt
    dynamic = {"run-btn", "override-input", "json-editor"}
    assert not (missing - dynamic), f"JS queries unknown ids: {missing - dynamic}"

    for src in sources.values():
        for mod in re.findall(r'from "\./(\w+)\.js"', src):
            assert f"{mod}.js" in sources, f"missing module {mod}.js"
    assert 'src="js/app.js"' in html
    assert 'href="styles.css"' in html
