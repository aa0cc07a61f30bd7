"""Dev harness: pallas kernel (interpret, CPU) vs scan kernel parity."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from monte_carlo_retirement_tpu.config import Config, load_config_from_json
from monte_carlo_retirement_tpu.engine.kernel import simulate_paths
from monte_carlo_retirement_tpu.engine.pallas_kernel import (
    BLOCK_PATHS, BLOCK_ROWS, pallas_simulate, statics_from_config,
)
from monte_carlo_retirement_tpu.models.retirement import SimParams
from monte_carlo_retirement_tpu.ops.shocks import stream_keys

raw = load_config_from_json("/root/repo/config.json")
raw["retirement_years"] = 5
config = Config(**raw)
params = SimParams.from_config(config, dtype=jnp.float32)
_, key = stream_keys(2026)

W = 235
R = 5
T = W + 12 * R

# Raw independent normals, identical to the scan path's draws.
z = jnp.stack(
    [
        jax.random.normal(jax.random.fold_in(key, m), (BLOCK_PATHS, 3),
                          dtype=jnp.float32)
        for m in range(1, T + 1)
    ]
)  # (T, BLOCK_PATHS, 3)
shocks = jnp.transpose(z, (0, 2, 1)).reshape(T, 3, BLOCK_ROWS, 128)

print("running pallas interpret...")
t0 = time.time()
succ_p, final_p = pallas_simulate(
    params, W, 0,
    n_paths=BLOCK_PATHS, retirement_years=R, n_streams=params.n_streams,
    statics=statics_from_config(config),
    shocks=shocks, with_shocks=True, interpret=True,
)
print(f"  {time.time()-t0:.1f}s")

print("running scan...")
t0 = time.time()
outs = simulate_paths(
    params, jnp.int32(W), key,
    n_paths=BLOCK_PATHS, t_scan=T, retirement_years=R, traj_len=0,
    dtype=jnp.float32,
)
print(f"  {time.time()-t0:.1f}s")

succ_s = np.asarray(outs.success)
final_s = np.asarray(outs.final_balance)
succ_p = np.asarray(succ_p) > 0.5
final_p = np.asarray(final_p)

mismatch = (succ_p != succ_s).mean()
print(f"success rate scan={succ_s.mean()*100:.2f}% pallas={succ_p.mean()*100:.2f}% "
      f"mismatch={mismatch*100:.4f}%")
rel = np.abs(final_p - final_s) / np.maximum(np.abs(final_s), 1.0)
print(f"final balance rel err: max={rel.max():.2e} mean={rel.mean():.2e}")
assert mismatch < 3e-3
assert rel.max() < 5e-3
print("PALLAS PARITY OK")
