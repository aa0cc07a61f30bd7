"""Microbench the chunked-run bracket pass variants on chip.

The r5 warm-start bracket (_band_bracket_jit) measured ~2.1 s per 4M-path
chunk inside the 16M run — ~10x over its HBM/VPU roofline (~0.2 s). This
isolates the search cost from the kernel and tries variants.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_retirement_tpu.engine.runner import (
    enable_persistent_compilation_cache,
)
from monte_carlo_retirement_tpu.ops.quantiles import (
    _search_floor_values_parts,
)

enable_persistent_compilation_cache()

N = 4 * 2**20
rng = np.random.default_rng(0)
traj = jnp.asarray(rng.normal(1e6, 1e5, size=(N, 51)).astype(np.float32))
real = jnp.asarray(rng.normal(8e5, 1e5, size=(N, 51)).astype(np.float32))
wr = jnp.asarray(rng.normal(0.04, 0.01, size=(N, 50)).astype(np.float32))


def _fetch(out):
    # Through the axon tunnel block_until_ready returns before compute
    # finishes (docs/NOTES.md "Timing through the tunnel lies"): FETCH.
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]


def timeit(label, fn):
    _fetch(fn(0))  # compile
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        _fetch(fn(1 + i))  # varied input every call, outputs fetched
        times.append(time.perf_counter() - t0)
    print(f"{label}: {min(times)*1000:.1f} ms", flush=True)


def search_k(K, bits):
    needs = [
        jnp.asarray(rng.integers(1, N, size=(152, K)).astype(np.int32))
        for _ in range(6)
    ]

    @jax.jit
    def run(t, r, w, nd):
        return _search_floor_values_parts([t, r, w], nd, bits_per_pass=bits)

    return lambda i: run(traj, real, wr, needs[i])


for K in (7, 14):
    for bits in (1, 2, 4):
        timeit(f"search K={K} bits={bits}", search_k(K, bits))

# The per-round count pass for comparison (K*E = 224 edges per column).
def edge_set(_):
    return (
        jnp.asarray(np.sort(rng.normal(1e6, 1e5, size=(51, 224))
                            .astype(np.float32), axis=1)),
        jnp.asarray(np.sort(rng.normal(8e5, 1e5, size=(51, 224))
                            .astype(np.float32), axis=1)),
        jnp.asarray(np.sort(rng.normal(0.04, 0.01, size=(50, 160))
                            .astype(np.float32), axis=1)),
    )


edge_sets = [edge_set(i) for i in range(6)]


@jax.jit
def count_pass(t, r, w, et, er, ew):
    def count(x, e):
        return jnp.sum((x[:, :, None] <= e[None, :, :]).astype(jnp.int32),
                       axis=0)
    return count(t, et), count(r, er), count(w, ew)


timeit("count pass (224/160 edges)", lambda i: count_pass(
    traj, real, wr, *edge_sets[i]))
