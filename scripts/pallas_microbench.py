"""Micro-benchmark of per-op cost inside a Pallas TPU kernel.

Times a kernel that loops N iterations of a single vector op on one
(256, 128) block, isolating which ops are vectorized vs scalarized by
Mosaic. Every timing fetches the output (queue-proof).
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monte_carlo_retirement_tpu.engine.runner import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

SHAPE = (256, 128)
ITERS = 2000


def make(op_name):
    def kernel(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        zero = (
            lax.broadcasted_iota(jnp.int32, SHAPE, 0)
            + lax.broadcasted_iota(jnp.int32, SHAPE, 1)
        ).astype(jnp.float32) * 0.0

        def body(i, x):
            if op_name == "exp":
                return jnp.exp(-jnp.abs(x) * 1e-3) + x * 0.001
            if op_name == "log":
                return jnp.log(jnp.abs(x) + 1.5) + x * 0.001
            if op_name == "cos":
                return jnp.cos(x) + x * 0.001
            if op_name == "erfinv":
                u = jnp.clip(jnp.abs(x) * 1e-3, 0.0, 0.9)
                return x * 0.5 + lax.erf_inv(u)
            if op_name == "rng":
                bits = pltpu.prng_random_bits(SHAPE)
                r = lax.shift_right_logical(
                    pltpu.bitcast(bits, jnp.int32), jnp.int32(8)
                )
                return x * 0.5 + r.astype(jnp.float32) * 1e-8
            if op_name == "mul":
                return x * 1.0001 + 0.001
            raise ValueError(op_name)

        out_ref[:] = lax.fori_loop(0, ITERS, body, zero + 0.5)

    return kernel


def run(op_name, seed):
    return pl.pallas_call(
        make(op_name),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
    )(jnp.asarray([seed], jnp.int32))


if __name__ == "__main__":
    ops = sys.argv[1:] or ["mul", "exp", "log", "erfinv", "rng"]
    for op_name in ops:
        try:
            _ = np.asarray(run(op_name, 1))  # compile+run+fetch
            # Tunnel rule (CLAUDE.md): vary inputs, fetch outputs, min-of-N —
            # a single dispatch carries ~26 ms of relay variance.
            times = []
            val = None
            for rep in range(5):
                t0 = time.perf_counter()
                val = np.asarray(run(op_name, 2 + rep))
                times.append((time.perf_counter() - t0) * 1000)
            dt = min(times)
            ns_per_elem = dt * 1e6 / (ITERS * SHAPE[0] * SHAPE[1])
            print(f"{op_name:8s}: {dt:8.1f} ms for {ITERS} iters "
                  f"({ns_per_elem:.3f} ns/elem/iter)  sample={val[0,0]:.4f}")
        except Exception as exc:
            print(f"{op_name:8s}: FAILED {type(exc).__name__}: {str(exc)[:200]}")
