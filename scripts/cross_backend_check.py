"""Cross-backend statistical parity check (runs on the TPU).

Runs the same scenarios through the XLA scan kernel (threefry RNG) and the
Pallas kernel (core-local PRNG) and reports success probabilities with
binomial standard errors — the two must agree within Monte Carlo error
(BASELINE parity criterion: ±0.5% at matched path counts).
"""
import os, sys, math

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp
import numpy as np

from monte_carlo_retirement_tpu.config import Config, load_config_from_json
from monte_carlo_retirement_tpu.engine.kernel import simulate_paths
from monte_carlo_retirement_tpu.engine.pallas_kernel import pallas_simulate, statics_from_config
from monte_carlo_retirement_tpu.engine.runner import enable_persistent_compilation_cache
from monte_carlo_retirement_tpu.models.retirement import SimParams
from monte_carlo_retirement_tpu.ops.shocks import stream_keys

enable_persistent_compilation_cache()

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 131_072

cases = [
    ("config.json @ W=231", "config.json", 231, 50),
    ("config.json @ W=216", "config.json", 216, 50),
    ("jorge.json  @ W=76", "jorge.json", 76, 40),
]

print(f"{'case':24s} {'scan %':>8} {'pallas %':>9} {'diff':>7} {'3σ':>6}")
for name, fname, W, R in cases:
    raw = load_config_from_json(os.path.join(ROOT, fname))
    raw["retirement_years"] = R
    config = Config(**raw)
    params = SimParams.from_config(config, dtype=jnp.float32)
    _, key = stream_keys(2026)
    t_scan = ((W + 12 * R + 59) // 60) * 60

    outs = simulate_paths(
        params, jnp.int32(W), key, n_paths=N, t_scan=t_scan,
        retirement_years=R, traj_len=0, dtype=jnp.float32,
    )
    p_scan = float(np.asarray(outs.success).mean()) * 100.0

    s, _f = pallas_simulate(
        params, W, 2026, n_paths=N, retirement_years=R,
        n_streams=params.n_streams, statics=statics_from_config(config),
    )
    p_pallas = float(np.asarray(s)[:N].mean()) * 100.0

    p = (p_scan + p_pallas) / 200.0
    se3 = 3.0 * math.sqrt(2 * p * (1 - p) / N) * 100.0
    flag = "" if abs(p_scan - p_pallas) <= max(se3, 0.5) else "  <-- MISMATCH"
    print(f"{name:24s} {p_scan:8.3f} {p_pallas:9.3f} "
          f"{p_scan - p_pallas:7.3f} {se3:6.3f}{flag}")
