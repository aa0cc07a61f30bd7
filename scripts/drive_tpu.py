"""End-to-end drive on the default (TPU) runtime through the public API:
load scenario JSON -> validate -> search working months -> final run."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import monte_carlo_retirement_tpu as mcrt

print("devices:", jax.devices())

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cfg_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, "config.json")
raw = mcrt.load_config_from_json(cfg_path)
config = mcrt.Config(**raw)
print("scenario:", config.Nickname)

sim = mcrt.RetirementMonteCarloSimulator(config, main_seed_override=2026)

t0 = time.time()
months, prob, curve = sim.find_minimum_working_months(verbose=False)
t1 = time.time()
if months == -1:
    print(f"search: target {config.target_probability}% NOT reachable within "
          f"the cap; best {prob:.2f}% [{len(curve)} probes, {t1-t0:.1f}s]")
    sys.exit(1)
print(f"search: {months} months ({months/12:.1f} yrs) @ {prob:.2f}% "
      f"[{len(curve)} probes, {t1-t0:.1f}s]")

sim.use_final_seeds()
t2 = time.time()
summary, traj, samples, wr, real_traj, real_samples, counts = (
    sim.run_monte_carlo_simulations(months, config.num_simulations_main)
)
t3 = time.time()
final_prob = sim._success_probability(summary)
swr = mcrt.median_first_year_withdrawal_rate(summary)
print(f"final run: {len(summary)} paths in {t3-t2:.1f}s")
print(f"success={final_prob:.2f}% (target {config.target_probability}%)  "
      f"median_start=${summary['Start Balance'].median():,.0f}  "
      f"median_final_successful=${summary.loc[summary['Success'],'Final Balance'].median():,.0f}  "
      f"SWR={swr:.2f}%")
print("trajectory table:", traj.shape, "wr table:", wr.shape,
      "samples:", len(samples), "wr_counts[0:5]:", counts[:5])
