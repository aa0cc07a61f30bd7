"""Pallas TPU fast path: the full path lifetime in one on-chip kernel.

Why this exists: the XLA-scan kernel streams its ~10-vector carry through HBM
on every one of 600 scan steps (~100 GB of traffic for 1M paths), which caps
it around 400 ms/run. This kernel keeps ALL per-path state resident on chip
for the whole lifetime — the only HBM traffic is the final per-path outputs —
and generates shocks with the core-local PRNG (`pltpu.prng_random_bits`), so
the month loop is pure VPU compute.

Round-2 architecture (measured on v5e, 1M x 600 months):

  * paths tile into blocks of (32, 128) = 4096 — the register-pressure sweet
    spot (256-row blocks spilled the carry and ran 1.35x slower);
  * the accumulation and retirement phases are SEPARATE dynamic-bound
    `fori_loop`s with a straight-line retirement snapshot between them — no
    per-month `m <= w` dispatch and no horizon-guard cond (those two scalar
    branches cost ~54 ms/run at round-1 block sizes), and no horizon
    bucketing: executables no longer depend on the scan length at all;
  * structural config facts (which tax system each asset uses, whether any
    annual mark-to-market bill can exist, which streams are CPI-indexed /
    duration-capped) are compile-time `Statics` — editing *rates/amounts*
    never recompiles, flipping a tax *system* recompiles in seconds;
  * the tax algebra exploits the average-cost-basis invariant (gain fraction
    is unchanged by proportional sales), so one per-asset sale profile
    serves the capacity check, the withdrawal AND the rebalance, and
    realized tax is exactly `gross * eff` — no taxable-gain max() chains.
    Pro-rata-by-net-capacity sales collapse further: with nc_i = b_i*nf_i
    the withdrawal and the annual-tax bill each reduce to ONE shared sale
    fraction (target/tnc) applied to both balances and bases, snapped to
    exactly 1 in the capacity-limited branch so full liquidation zeroes
    state bit-exactly;
  * divisions lower to `pl.reciprocal(approx) + one Newton step` (~1.5e-5
    relative, inside the engine's f32 `fail_rtol` tolerance budget);
  * normals use a degree-9 single-branch polynomial quantile (coefficients
    fitted against scipy erfinv over the full 23-bit uniform grid: max rel
    err 1.4e-4, variance 0.9999994, kurtosis 3.000002, tail probabilities
    match enumeration truth to 1e-6 — see scripts/perf_ablation.py).

Layout: the grid iterates path blocks (and, for candidate/scenario grids, a
leading candidate axis whose rows select per-candidate parameters from
SMEM). `working_months` stays a traced SMEM scalar, so candidates never
recompile.

RNG: the per-core PRNG is seeded per (stream_seed, path-block) — candidate
axes never enter the seed — and each month draws three normals in a fixed
order (equity, inflation-independent, premium). Draws depend only on
(stream, block, month, lane): common random numbers across working-month
candidates and scenario grids hold structurally, like the XLA path. The bit
streams differ from XLA's threefry, so cross-backend parity is statistical
(Monte Carlo); the month *logic* matches the scan kernel and is pinned by
injected-shocks parity tests.

Probe mode and full mode share the (32, 128) tiling, but search and final
runs use independent stream seeds by design, so CRN is relied on only
*within* an entry point (across candidate months), never across entry
points.

Entry points: `pallas_simulate` (per-path success/final), `pallas_probe`
(candidate-parallel success probabilities for the search),
`pallas_simulate_full` (adds retirement snapshots and the yearly
trajectory/price/withdrawal-rate series via in-ref stores), and
`pallas_scenario_grid` (per-row parameter sweeps).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MONTHS_PER_YEAR, SMALL_EPSILON
from ..models.retirement import SimParams
from ..ops.tax import fail_rtol

EPS = SMALL_EPSILON
FAIL_RTOL = fail_rtol(jnp.float32)  # shared with the scan kernel

BLOCK_ROWS = 32  # paths per block = 32 * 128 = 4096 (register-resident carry)
BLOCK_PATHS = BLOCK_ROWS * 128
FULL_BLOCK_ROWS = 32  # full mode: series buffers also fit VMEM at 32 rows
# Full mode keeps two (traj_len, 32, 128) f32 series plus the WR buffer in
# VMEM: 16 KiB per trajectory slot per series. 256 slots (~8.4 MiB for both)
# leaves comfortable headroom; wider horizons fall back to the scan backend
# (engine/runner.py) rather than risk a Mosaic VMEM failure.
PALLAS_MAX_TRAJ_LEN = 256

# fparams vector layout (float32, SMEM). The use_real/bill flags are NOT
# here: the tax system is compile-time Statics, never a traced parameter —
# grid rows that disagree with the Statics are rejected before dispatch
# (_check_grid_statics), not read per row.
(
    F_MU1_M, F_S1_M, F_MUI_M, F_SI_M, F_MUP_M, F_SP_M,
    F_RHO, F_RHO_C,
    F_ALLOC1, F_INIT_BAL, F_CONTRIB0, F_LOG1P_GROWTH, F_EXPENSES,
    F_R_REAL1, F_R_ANN1,
    F_R_REAL2, F_R_ANN2,
    F_ALLOC1_F,
    F_GR_UP, F_GR_LO, F_GR_ADJ, F_GR_FLOOR, F_GR_CAP,
    F_JP, F_JMU, F_JSIG, F_JBETA, F_JC1, F_JC2,
    F_MORT_G0, F_MORT_B12, F_MORT_CAP,
    NUM_FPARAMS,
) = range(33)

# iparams vector layout (int32, SMEM). I_BLOCK_OFF shifts the per-block PRNG
# seed index: on a sharded mesh every device passes its global block offset,
# so shard-local block 0 on device d draws the stream of global block
# d * blocks_per_shard — device count never changes which streams exist.
I_W, I_T_END, I_SEED, I_BLOCK_OFF, NUM_IPARAMS = range(5)

_INV_2_22 = 1.0 / float(1 << 22)
_X_OFFSET = 1.0 / float(1 << 23) - 1.0

# z = sqrt(2)*erfinv(x) = x * P(s), s = sqrt(-log1p(-x^2)); single minimax
# branch over the whole reachable range (23-bit uniforms => |x| <= 1-2^-23,
# s <= 3.905). Descending Horner order; sqrt(2) folded into the fit.
# Accuracy over the full input grid: max rel 1.43e-4; moments/tails in the
# module docstring. Fitted in scripts/perf_ablation.py against scipy.
_ZPOLY = (
    0.0001782477551054519, -0.0028148533007281555,
    0.016944312865490738, -0.04569300513968381,
    0.04307398034973402, 0.014180894039555763,
    -0.028215645346410155, 0.3470778790734455,
    -0.003963483920460122, 1.2534926535177795,
)


class Statics(NamedTuple):
    """Compile-time structure of a scenario: which tax *systems* are active
    and the shape of the income-stream table. Rates/amounts/ages stay traced
    (editing them reuses the executable); flipping any of these flags builds
    a new kernel (seconds)."""

    use_real1: bool
    use_real2: bool
    # An annual mark-to-market bill can exist (not realized-system AND a
    # nonzero annual rate). When neither asset can ever owe one, the whole
    # boundary/settle subgraph and both gain accumulators vanish: a second
    # rebalance right after the monthly one is an exact no-op.
    bill1: bool
    bill2: bool
    stream_indexed: Tuple[bool, ...]
    stream_capped: Tuple[bool, ...]
    # Antithetic sampling (config.antithetic, default off): global path
    # block 2k+1 replays block 2k's PRNG stream with every normal negated.
    # Compile-time so the sign multiply vanishes from the default kernel.
    antithetic: bool = False
    # Allocation glide path (config.allocation_inv1_final_pct is not None):
    # the rebalance target interpolates alloc1 -> alloc1_final over the
    # working months. Compile-time so the non-glide kernel reads neither
    # the second endpoint nor the per-month interpolation.
    glide: bool = False
    # Dynamic spending guardrails (config.spending_guardrails is not None):
    # a per-path spending multiplier adjusts at retirement-year starts when
    # the planned WR crosses a band. Compile-time: off drops the multiplier
    # carry slot and every year-start band op from the kernel.
    guardrails: bool = False
    # Market-crash jumps (config.market_crashes is not None): each month
    # draws one extra uniform + normal for the compensated jump factor.
    # Compile-time because the flag changes the PRNG draw COUNT per month —
    # the crash-free kernel's bit stream (and executable) is untouched.
    # Like `antithetic`, one grid dispatch cannot mix it (grid_statics
    # enforces uniformity); p=0 sentinel rows inside a jumps-on executable
    # are exact no-ops of THAT executable's (shifted) stream.
    jumps: bool = False
    # Longevity (config.longevity is not None): one extra uniform per path
    # (drawn from a salted re-seed BEFORE the base stream is seeded, so the
    # base month stream is untouched) becomes a remaining lifetime at the
    # retirement date; expired months zero the spending need while the
    # estate keeps evolving. Compile-time because the flag changes the PRNG
    # draw structure; grid dispatches cannot mix it (grid_statics), and
    # sentinel rows (mort_b12 = 0) inside a mortality-on executable never
    # expire by the d = +inf override.
    mortality: bool = False


def statics_from_config(config) -> Statics:
    """Derive kernel Statics from a validated Config. Streams are pruned by
    the SAME helper that builds the SimParams stream arrays, so the per-stream
    flag indices here always align with the kernel's stream table."""
    from ..models.retirement import prune_streams

    streams = prune_streams(config)
    use1 = bool(config.inv1_use_realized_gains_tax_system)
    use2 = bool(config.inv2_use_realized_gains_tax_system)
    return Statics(
        use_real1=use1,
        use_real2=use2,
        bill1=(not use1) and config.inv1_annual_tax_on_gains_rate > 0.0,
        bill2=(not use2) and config.inv2_annual_tax_on_gains_rate > 0.0,
        stream_indexed=tuple(bool(s.inflation_indexed) for s in streams),
        stream_capped=tuple(s.duration_years is not None for s in streams),
        antithetic=bool(getattr(config, "antithetic", False)),
        glide=getattr(config, "allocation_inv1_final_pct", None) is not None,
        guardrails=getattr(config, "spending_guardrails", None) is not None,
        jumps=getattr(config, "market_crashes", None) is not None,
        mortality=getattr(config, "longevity", None) is not None,
    )


def _local_blocks(n_paths: int, n_dev: int, block_paths: int) -> int:
    """Blocks each device runs: ceil(ceil(n_paths / n_dev) / block_paths)."""
    per_dev = (n_paths + n_dev - 1) // n_dev
    return max(1, (per_dev + block_paths - 1) // block_paths)


def _check_grid_statics(params_batch: SimParams, statics: Statics) -> None:
    """Best-effort guard: when the batched parameters are concrete, verify
    every row matches the compile-time ``statics`` — the kernel ignores the
    per-row tax-system and stream-structure data and branches solely on the
    static flags, so a mismatched row would silently simulate under another
    row's structure. Traced inputs skip the check (callers validate configs
    via engine.scenario_batch.grid_statics)."""
    try:
        import numpy as _np

        u1 = _np.asarray(params_batch.use_real1) > 0.5
        u2 = _np.asarray(params_batch.use_real2) > 0.5
        a1 = _np.asarray(params_batch.ann_tax1) > 0.0
        a2 = _np.asarray(params_batch.ann_tax2) > 0.0
        # (K, S) per-row stream structure vs the static per-stream flags
        s_idx = _np.asarray(params_batch.stream_indexed) > 0.5
        s_cap = _np.isfinite(_np.asarray(params_batch.stream_duration_months))
        # Without the glide flag the kernel never reads alloc1_final: a row
        # with a real glide endpoint would silently simulate constant-alloc.
        glide_rows = _np.asarray(params_batch.alloc1_final) != _np.asarray(
            params_batch.alloc1
        )
        # Same for guardrails: adjustment > 0 marks a row with a live rule.
        gr_rows = _np.asarray(params_batch.gr_adjust) > 0.0
        # And for jumps: p > 0 marks a live crash rule. The flag changes
        # the PRNG draw structure, so a live row under a jumps-off
        # executable would silently simulate crash-free.
        jump_rows = _np.asarray(params_batch.jump_p) > 0.0
        # And for longevity: b12 > 0 marks a live lifespan rule; a live
        # row under a mortality-off executable would silently simulate the
        # fixed horizon.
        mort_rows = _np.asarray(params_batch.mort_b12) > 0.0
    except Exception:
        return  # tracers: cannot inspect values here
    want_idx = _np.asarray(statics.stream_indexed, dtype=bool)
    want_cap = _np.asarray(statics.stream_capped, dtype=bool)
    ok = (
        bool((u1 == statics.use_real1).all())
        and bool((u2 == statics.use_real2).all())
        and bool(((~u1 & a1) == statics.bill1).all())
        and bool(((~u2 & a2) == statics.bill2).all())
        and (statics.glide or not bool(glide_rows.any()))
        and (statics.guardrails or not bool(gr_rows.any()))
        and (statics.jumps or not bool(jump_rows.any()))
        and (statics.mortality or not bool(mort_rows.any()))
    )
    if ok and want_idx.size:
        # Fail loudly on a stream-count mismatch — reshape would otherwise
        # regroup rows and compare the wrong (row, stream) pairs.
        ok = (
            s_idx.shape[-1] == want_idx.size
            and bool((s_idx.reshape(-1, want_idx.size) == want_idx).all())
            and bool((s_cap.reshape(-1, want_cap.size) == want_cap).all())
        )
    if not ok:
        raise ValueError(
            "scenario batch mixes tax-system/annual-bill/stream structure "
            "that conflicts with the compile-time Statics; all rows of one "
            "Pallas grid dispatch must share them (see "
            "engine.scenario_batch.grid_statics). Use the XLA scan path "
            "(run_scenario_batch) for mixed batches."
        )


def _rdiv(a, b):
    """a / b via approximate reciprocal + one Newton step (~1.5e-5 relative,
    inside the f32 fail_rtol budget; pinned by the f32-vs-f64 parity test)."""
    r = pl.reciprocal(b, approx=True)
    return a * (r * (2.0 - b * r))


def _normal(shape):
    """One standard-normal-times-sqrt(2)-quantile per lane.

    23 random bits -> x uniform on [-1+2^-23, 1-2^-23] (never +-1, so the
    quantile stays finite; tails reach ~5.4 sigma) -> z = x * P(s) with the
    single-branch polynomial above. Returns sqrt(2)*erfinv(x), i.e. a
    standard normal.
    """
    bits = pltpu.prng_random_bits(shape)
    r = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.int32), jnp.int32(9)
    ).astype(jnp.float32)
    x = r * _INV_2_22 + _X_OFFSET
    s = jnp.sqrt(-jnp.log1p(-(x * x)))
    acc = jnp.full(shape, _ZPOLY[0], jnp.float32)
    for c in _ZPOLY[1:]:
        acc = acc * s + c
    return acc * x


def _uniform(shape):
    """One uniform on [0, 1 - 2^-23] per lane (23 random bits, exact f32)."""
    bits = pltpu.prng_random_bits(shape)
    r = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.int32), jnp.int32(9)
    ).astype(jnp.float32)
    return r * jnp.float32(1.0 / (1 << 23))


class _PackedView:
    """A leading-axis window of the packed full-mode output ref.

    Full mode historically used ten separate output refs; Mosaic gives each
    its own VMEM window and per-grid-step copy-out. Packing them into one
    ``(7 + 2*traj_len + R, rows, 128)`` ref collapses those windows into a
    single DMA stream; this view translates the kernel body's historical
    indexing (``[:]``, ``[int]``, ``[pl.ds(...)]``) onto the packed leading
    axis so the month-loop code is shared verbatim between layouts —
    bit-identity between the layouts holds by construction.
    """

    def __init__(self, ref, offset, length, vec=False):
        self.ref, self.offset, self.length, self.vec = ref, offset, length, vec

    @property
    def shape(self):
        base = tuple(self.ref.shape[1:])
        return base if self.vec else (self.length,) + base

    def _key(self, key):
        if isinstance(key, slice):
            assert key == slice(None), "packed views take full slices only"
            return self.offset if self.vec else pl.ds(self.offset, self.length)
        if isinstance(key, int):
            return self.offset + key
        # pl.ds(...) — a pallas Slice (static or dynamic start)
        return pl.ds(key.start + self.offset, key.size)

    def __getitem__(self, key):
        return self.ref[self._key(key)]

    def __setitem__(self, key, value):
        self.ref[self._key(key)] = value


def _make_kernel(
    n_streams: int,
    retirement_years: int,
    with_shocks: bool,
    statics: Statics,
    block_axis: int = 0,
    cand_axis=None,
    rows: int = BLOCK_ROWS,
    traj_len: int = 0,
    multi_params: bool = False,
    interpret: bool = False,
    packed: int = 0,
):
    """Build the block kernel for one (streams, R, statics) combination.

    ``interpret`` swaps the hardware PRNG for a threefry stream keyed by
    (block seed, month) — `pltpu.prng_*` has no CPU lowering — so the
    global-block seeding structure (CRN, shard offsets) is testable on CPU;
    bit streams differ from the device PRNG, which is already true across
    backends.

    The month loop is two dynamic-bound fori_loops (accumulation, then
    retirement) around a straight-line retirement snapshot; per-candidate
    `working_months` lives in SMEM so candidates share one executable.
    """
    R = retirement_years
    shape = (rows, 128)
    track = traj_len > 0
    st_ = statics
    any_bills = st_.bill1 or st_.bill2
    # fixed-nominal slots exist only for non-CPI-indexed streams
    fixed_slot = {}
    for s in range(n_streams):
        if not st_.stream_indexed[s]:
            fixed_slot[s] = len(fixed_slot)
    n_fixed = len(fixed_slot)

    # carry layout ---------------------------------------------------------
    # 0..5: b1, c1, b2, c2, infl, alive_f
    # [g1a, g2a, preret_f] when any_bills
    # n_fixed fixed-nominal slots
    # [spending multiplier] when guardrails
    # [ytr, start_bal, infl_ret, yg, yr, fy_g, fy_r] when track
    i_bills = 6
    i_fixed = i_bills + (3 if any_bills else 0)
    i_spend = i_fixed + n_fixed
    i_track = i_spend + (1 if st_.guardrails else 0)

    def kernel(iparams, fparams, *rest):
        rest = list(rest)
        if n_streams:
            s_amount, s_from_t0, s_duration, s_indexed, s_tax = rest[:5]
            rest = rest[5:]
        if with_shocks:
            shocks_ref = rest.pop(0)
        track_refs = track and packed == 2
        if track and packed:
            (out_full,) = rest
            (out_success, out_final, out_start, out_ytr, out_fyg, out_fyr,
             out_inflret) = (
                _PackedView(out_full, i, 1, vec=True) for i in range(7)
            )
            # packed=2: the per-month track accumulators (yg, yr; ytr lives
            # in its own output slot) move from loop carries to VMEM scratch
            # rows of the packed buffer — 3 fewer carries in BOTH month
            # loops at the cost of a ref load+store per month.
            base = 9 if track_refs else 7
            if track_refs:
                yg_view = _PackedView(out_full, 7, 1, vec=True)
                yr_view = _PackedView(out_full, 8, 1, vec=True)
            out_traj = _PackedView(out_full, base, traj_len)
            out_price = _PackedView(out_full, base + traj_len, traj_len)
            out_wr = _PackedView(out_full, base + 2 * traj_len, R)
        elif track:
            (out_success, out_final, out_start, out_ytr, out_fyg, out_fyr,
             out_inflret, out_traj, out_price, out_wr) = rest
        else:
            out_success, out_final = rest

        row = pl.program_id(cand_axis) if cand_axis is not None else 0
        w = iparams[row, I_W]
        t_end = iparams[row, I_T_END]
        if multi_params:
            # Scenario grids: every float parameter (and stream table) is a
            # per-candidate row. Read the row ONCE here — per-use SMEM reads
            # inside the month loop defeat loop-invariant hoisting (~25x).
            fvals = [fparams[row, i] for i in range(NUM_FPARAMS)]
            f = lambda i: fvals[i]
            _cells = {}

            def stream_cell(arr, s):
                key = (id(arr), s)
                if key not in _cells:
                    _cells[key] = arr[row, s]
                return _cells[key]
        else:
            fvals = [fparams[i] for i in range(NUM_FPARAMS)]
            f = lambda i: fvals[i]
            if n_streams:
                _svals = {
                    id(arr): [arr[s] for s in range(n_streams)]
                    for arr in (s_amount, s_from_t0, s_duration, s_indexed,
                                s_tax)
                }
                stream_cell = lambda arr, s: _svals[id(arr)][s]
            else:
                stream_cell = lambda arr, s: arr[s]
        w_f = w.astype(jnp.float32)
        # Loop-invariant residue: (w + k) % 12 == 0  <=>  k % 12 ==
        # boundary_k, so the retirement loop derives ALL its calendar
        # predicates from the single k % 12 below (integer mod lowers to
        # a multi-op divide sequence; dropping two of the three distinct
        # per-month mods measured -1.9 ms at 1M x 600 full mode).
        boundary_k = (
            MONTHS_PER_YEAR - w % MONTHS_PER_YEAR
        ) % MONTHS_PER_YEAR
        # Injected-shock runs (tests) supply their own z — antithetic applies
        # only to in-kernel PRNG draws.
        antithetic = st_.antithetic and not with_shocks

        if not with_shocks:
            # Per-(stream, GLOBAL path-block) seed: golden-ratio mix keeps
            # block streams decorrelated; int32 overflow wraps, which is
            # fine for mixing. Candidate grid axes do NOT enter the seed
            # (CRN); on a sharded mesh the block offset makes local block
            # ids globally unique.
            gblock = pl.program_id(block_axis) + iparams[row, I_BLOCK_OFF]
            if antithetic:
                # Antithetic pairing at block granularity: blocks (2k, 2k+1)
                # share PRNG stream k; the odd member negates every normal.
                # Global ids keep the pairing invariant under sharding and
                # path chunking, and even blocks bit-match an iid run's
                # block k (pinned in tests/test_antithetic.py).
                z_sign = (1 - 2 * (gblock % 2)).astype(jnp.float32)
                gblock = gblock // 2
            block_seed = iparams[row, I_SEED] ^ (
                gblock * jnp.int32(-1640531527)
            )
            if interpret:
                # bit-exact reinterpretation: abs() would alias seed pairs
                # (x, -x) onto one stream and leaves INT32_MIN negative
                sw_key = jax.random.key(
                    jax.lax.bitcast_convert_type(block_seed, jnp.uint32)
                )
            else:
                pltpu.prng_seed(block_seed)

        def draw_normals(m):
            if interpret:
                z = jax.random.normal(
                    jax.random.fold_in(sw_key, m), (3,) + shape, jnp.float32
                )
                z0, z1, z2 = z[0], z[1], z[2]
            else:
                z0, z1, z2 = _normal(shape), _normal(shape), _normal(shape)
            if antithetic:
                return z0 * z_sign, z1 * z_sign, z2 * z_sign
            return z0, z1, z2

        def draw_jump(m):
            """Crash draws (u, z_j); the device PRNG consumes them right
            after the month's three base normals (fixed order). Interpret
            mode folds months at a disjoint offset, mirroring the scan
            kernel's jump stream structure."""
            if with_shocks:
                return shocks_ref[m - 1, 3], shocks_ref[m - 1, 4]
            if interpret:
                kj = jax.random.fold_in(sw_key, m + (1 << 20))
                u = jax.random.uniform(kj, shape, jnp.float32)
                zj = jax.random.normal(
                    jax.random.fold_in(kj, 1), shape, jnp.float32
                )
            else:
                u = _uniform(shape)
                zj = _normal(shape)
            if antithetic:
                # Mirror the pair: z negates, u reflects (occurrences
                # anti-correlate; both stay marginally correct).
                u = jnp.where(z_sign > 0, u, 1.0 - u)
                zj = zj * z_sign
            return u, zj

        if st_.mortality:
            # Longevity (config.longevity): ONE uniform per path, turned
            # into a remaining lifetime at the retirement date. Hardware
            # mode draws it from a salted re-seed and then restores the
            # base seed, so the month stream below is bit-identical to a
            # mortality-off executable; interpret mode folds at the same
            # disjoint offset the scan kernel uses.
            if with_shocks:
                u_mort = shocks_ref[0, 5]
            elif interpret:
                u_mort = jax.random.uniform(
                    jax.random.fold_in(sw_key, 1 << 21), shape, jnp.float32
                )
            else:
                pltpu.prng_seed(block_seed ^ jnp.int32(668265261))
                u_mort = _uniform(shape)
                pltpu.prng_seed(block_seed)
            if antithetic:
                # u -> 1-u mirrors the longevity percentile: paired paths
                # anti-correlate lifespans (small u = long life).
                u_mort = jnp.where(z_sign > 0, u_mort, 1.0 - u_mort)
            from ..ops.shocks import gompertz_remaining_months

            d_mort = gompertz_remaining_months(
                u_mort, f(F_MORT_G0), f(F_MORT_B12), f(F_MORT_CAP), w_f,
                jnp.float32,
            )

        alloc1 = f(F_ALLOC1)
        if st_.glide:
            # Linear target glide a0 -> af over the working months; the
            # retirement phase holds af exactly. Scalar ops on SMEM values —
            # the per-month interpolation costs two flops on the scalar core.
            alloc1_ret = f(F_ALLOC1_F)
            glide_scale = (alloc1_ret - alloc1) / jnp.maximum(w_f, 1.0)
        else:
            alloc1_ret = alloc1
        r1 = f(F_R_REAL1)
        r2 = f(F_R_REAL2)

        if n_streams:
            stream_start = [
                jnp.maximum(
                    0.0,
                    jnp.ceil(
                        jnp.maximum(0.0, stream_cell(s_from_t0, s) - w_f) - EPS
                    ),
                )
                for s in range(n_streams)
            ]

        # ------------------------------------------------------------------
        # shared per-asset sale profiles: eff (tax per gross dollar), nf
        # (net per gross dollar) and nc (full-liquidation net capacity).
        # Gain fraction is invariant under proportional-basis sales, so one
        # profile per month serves capacity check, withdrawal and rebalance.
        # ------------------------------------------------------------------
        def profile(b, c, use, rate):
            if not use:
                one = jnp.ones(shape, jnp.float32)
                return jnp.zeros(shape, jnp.float32), one, jnp.where(
                    b > EPS, b, 0.0
                )
            safe = jnp.where(b > EPS, b, 1.0)
            gf = _rdiv(jnp.maximum(0.0, b - c), safe)
            eff = gf * rate
            nf = 1.0 - eff
            nc = jnp.where(b > EPS, b * nf, 0.0)
            return eff, nf, nc

        def rebalance_lite(b1, c1, b2, c2, eff1, eff2, a1, extra_noop=None):
            """Tax-aware exact-post-tax rebalance toward target ``a1``.
            drift2 == -drift1, so the seller's drift is |drift1|; realized
            tax is gross*eff exactly."""
            total = b1 + b2
            drift1 = b1 - total * a1
            adrift = jnp.abs(drift1)
            sell1 = drift1 > 0
            noop = (total <= EPS) | (adrift <= EPS)
            if extra_noop is not None:
                noop = noop | extra_noop
            bal_s = jnp.where(sell1, b1, b2)
            basis_s = jnp.where(sell1, c1, c2)
            eff_s = jnp.where(sell1, eff1, eff2)
            alloc_s = jnp.where(sell1, a1, 1.0 - a1)
            denom = jnp.maximum(EPS, 1.0 - alloc_s * eff_s)
            gross_s = jnp.minimum(bal_s, _rdiv(adrift, denom))
            frac_s = _rdiv(gross_s, jnp.where(bal_s > EPS, bal_s, 1.0))
            net_p = gross_s * (1.0 - eff_s)
            new_sb = bal_s - gross_s
            new_sc = basis_s - basis_s * frac_s
            bal_b = jnp.where(sell1, b2, b1) + net_p
            basis_b = jnp.where(sell1, c2, c1) + net_p
            ob1 = jnp.where(sell1, new_sb, bal_b)
            oc1 = jnp.where(sell1, new_sc, basis_b)
            ob2 = jnp.where(sell1, bal_b, new_sb)
            oc2 = jnp.where(sell1, basis_b, new_sc)
            z1 = ob1 <= EPS
            z2 = ob2 <= EPS
            ob1 = jnp.where(z1, 0.0, ob1)
            oc1 = jnp.where(z1, 0.0, oc1)
            ob2 = jnp.where(z2, 0.0, ob2)
            oc2 = jnp.where(z2, 0.0, oc2)
            return (
                jnp.where(noop, b1, ob1),
                jnp.where(noop, c1, oc1),
                jnp.where(noop, b2, ob2),
                jnp.where(noop, c2, oc2),
            )

        def monthly_rebalance(b1, c1, b2, c2, a1, extra_noop=None):
            eff1, _, _ = profile(b1, c1, st_.use_real1, r1)
            eff2, _, _ = profile(b2, c2, st_.use_real2, r2)
            return rebalance_lite(b1, c1, b2, c2, eff1, eff2, a1, extra_noop)

        def annual_tax(b1, c1, b2, c2, g1a, g2a, a1):
            """Mark-to-market settlement for one completed tax period; only
            built when a bill can exist (any_bills). Bill paid pro-rata by
            net capacity; ends with an exact-post-tax rebalance."""
            due1 = (
                jnp.maximum(0.0, g1a) * f(F_R_ANN1)
                if st_.bill1 else jnp.zeros(shape, jnp.float32)
            )
            due2 = (
                jnp.maximum(0.0, g2a) * f(F_R_ANN2)
                if st_.bill2 else jnp.zeros(shape, jnp.float32)
            )
            total_due = due1 + due2
            eff1, nf1, nc1 = profile(b1, c1, st_.use_real1, r1)
            eff2, nf2, nc2 = profile(b2, c2, st_.use_real2, r2)
            tnc = nc1 + nc2
            payment = jnp.minimum(total_due, tnc)
            tol = EPS + FAIL_RTOL * (total_due + tnc)
            do_pay = (tnc > EPS) & (payment > 0)
            pay_f = jnp.where(do_pay, 1.0, 0.0)
            # _rdiv carries ~1.5e-5 relative error, so just below the
            # capacity boundary the fraction could exceed 1 and transiently
            # drive balances negative; the minimum makes 0 <= frac <= 1 hold
            # by construction (free on the VPU) instead of relying on the
            # downstream <= EPS zeroing clamp.
            frac_t = jnp.minimum(1.0, jnp.where(
                total_due >= tnc, 1.0, _rdiv(total_due, jnp.maximum(tnc, EPS))
            )) * pay_f
            keep_t = 1.0 - frac_t
            ok1 = nc1 > 0
            ok2 = nc2 > 0
            g1 = jnp.where(ok1, b1 * frac_t, 0.0)
            g2 = jnp.where(ok2, b2 * frac_t, 0.0)
            c1 = jnp.where(ok1, c1 * keep_t, c1)
            c2 = jnp.where(ok2, c2 * keep_t, c2)
            b1 = b1 - g1
            b2 = b2 - g2
            e1 = b1 <= EPS
            e2 = b2 <= EPS
            b1 = jnp.where(e1, 0.0, b1)
            c1 = jnp.where(e1, 0.0, c1)
            b2 = jnp.where(e2, 0.0, b2)
            c2 = jnp.where(e2, 0.0, c2)
            tfail = payment < total_due - tol
            b1, c1, b2, c2 = monthly_rebalance(b1, c1, b2, c2, a1)
            return b1, c1, b2, c2, tfail

        # A zero vector with a materialized (non-replicated) layout: loop
        # carries seeded from replicated constants would force the body's
        # computed vectors into an invalid relayout under Mosaic.
        zero_v = (
            jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        ).astype(jnp.float32) * 0.0
        b1_0 = zero_v + f(F_INIT_BAL) * alloc1
        b2_0 = zero_v + f(F_INIT_BAL) - b1_0
        if track:
            out_traj[:] = jnp.zeros((traj_len, rows, 128), jnp.float32)
            out_traj[0] = zero_v + f(F_INIT_BAL)
            out_price[:] = jnp.ones((traj_len, rows, 128), jnp.float32)
            out_wr[:] = jnp.full((R, rows, 128), jnp.nan, jnp.float32)
            # First-year withdrawals accumulate by read-modify-write on the
            # output refs (their cap window is the first retirement year
            # only); start_balance / inflation_at_retirement are stored once
            # at the snapshot. Keeping all four OUT of the loop carry trims
            # register pressure in the 600-iteration retirement loop.
            out_fyg[:] = zero_v
            out_fyr[:] = zero_v
            if track_refs:
                out_ytr[:] = zero_v
                yg_view[:] = zero_v
                yr_view[:] = zero_v

        init = [b1_0, b1_0, b2_0, b2_0, zero_v + 1.0, zero_v + 1.0]
        if any_bills:
            init += [zero_v, zero_v, zero_v]  # g1a, g2a, preret_f
        init += [zero_v - 1.0] * n_fixed
        if st_.guardrails:
            init += [zero_v + 1.0]  # spending multiplier, year 0 = the plan
        if track and not track_refs:
            init += [
                zero_v,                      # alive-months counter: +1 per
                                             # retirement month the path is
                                             # alive at month start; at the
                                             # kernel end /12 = years_to_
                                             # ruin (survivors -> NaN). One
                                             # add/month where the old
                                             # death-month select cost
                                             # mul+add+select (measured
                                             # -2.1 ms at 1M x 600).
                zero_v,                      # yg (year gross)
                zero_v,                      # yr (year gross in ret-$,
                                             #     deflated; x infl_ret
                                             #     applied at consumption)
            ]
        init = tuple(init)

        full_wy = w // MONTHS_PER_YEAR
        partial_wy = (w % MONTHS_PER_YEAR != 0).astype(jnp.int32)

        def draw(m):
            if with_shocks:
                z_eq = shocks_ref[m - 1, 0]
                z_ind = shocks_ref[m - 1, 1]
                z_prem = shocks_ref[m - 1, 2]
            else:
                z_eq, z_ind, z_prem = draw_normals(m)
            z_inf = f(F_RHO) * z_eq + f(F_RHO_C) * z_ind
            if st_.jumps:
                # Compensated market-crash jump (config.market_crashes):
                # folded into the exponents, so a crash month costs two
                # extra draws and a handful of VPU flops — no extra exps.
                u, z_j = draw_jump(m)
                jl = jnp.where(u < f(F_JP), f(F_JMU) + f(F_JSIG) * z_j, 0.0)
                g1 = jnp.exp(
                    f(F_MU1_M) + f(F_S1_M) * z_eq + (jl - f(F_JC1))
                )
                gi = jnp.exp(f(F_MUI_M) + f(F_SI_M) * z_inf)
                gp = jnp.exp(
                    f(F_MUP_M) + f(F_SP_M) * z_prem
                    + (f(F_JBETA) * jl - f(F_JC2))
                )
            else:
                g1 = jnp.exp(f(F_MU1_M) + f(F_S1_M) * z_eq)
                gi = jnp.exp(f(F_MUI_M) + f(F_SI_M) * z_inf)
                gp = jnp.exp(f(F_MUP_M) + f(F_SP_M) * z_prem)
            return g1, gi, gi * gp

        # ------------------------------------------------------------------
        # accumulation month (1 <= m <= W): no deaths, no masks
        # ------------------------------------------------------------------
        def accum_month(m, st):
            st = list(st)
            b1, c1, b2, c2, infl = st[0], st[1], st[2], st[3], st[4]
            g1, gi, g2 = draw(m)
            if any_bills:
                st[i_bills] = st[i_bills] + b1 * (g1 - 1.0)
                st[i_bills + 1] = st[i_bills + 1] + b2 * (g2 - 1.0)
            b1 = b1 * g1
            b2 = b2 * g2
            infl = infl * gi

            years = ((m - 1) // MONTHS_PER_YEAR).astype(jnp.float32)
            contrib = f(F_CONTRIB0) * jnp.exp(f(F_LOG1P_GROWTH) * years)
            if st_.glide:
                # Month-m target: a0 + (af - a0) * m / W (m <= W inside this
                # loop, so no clamp); retirement holds af exactly.
                al = alloc1 + glide_scale * m.astype(jnp.float32)
            else:
                al = alloc1
            ca1 = contrib * al
            ca2 = contrib - ca1
            b1, c1 = b1 + ca1, c1 + ca1
            b2, c2 = b2 + ca2, c2 + ca2

            b1, c1, b2, c2 = monthly_rebalance(b1, c1, b2, c2, al)

            if any_bills:
                def on_boundary(args):
                    bb1, cc1, bb2, cc2, gg1, gg2, pf = args
                    tb1, tc1, tb2, tc2, tfail = annual_tax(
                        bb1, cc1, bb2, cc2, gg1, gg2, al
                    )
                    return (tb1, tc1, tb2, tc2, gg1 * 0.0, gg2 * 0.0,
                            jnp.where(tfail, 1.0, pf))

                b1, c1, b2, c2, st[i_bills], st[i_bills + 1], st[i_bills + 2] = (
                    lax.cond(
                        m % MONTHS_PER_YEAR == 0,
                        on_boundary,
                        lambda a: a,
                        (b1, c1, b2, c2, st[i_bills], st[i_bills + 1],
                         st[i_bills + 2]),
                    )
                )
            if track:
                # Record-only work lives INSIDE the when: 11 of 12 months
                # skip it entirely instead of computing-then-discarding.
                @pl.when(m % MONTHS_PER_YEAR == 0)
                def _():
                    slot = jnp.clip(
                        m // MONTHS_PER_YEAR, 0, traj_len - 1
                    ).astype(jnp.int32)
                    out_traj[pl.ds(slot, 1)] = (b1 + b2)[None]
                    out_price[pl.ds(slot, 1)] = infl[None]

            st[0], st[1], st[2], st[3], st[4] = b1, c1, b2, c2, infl
            return tuple(st)

        # ------------------------------------------------------------------
        # retirement snapshot (straight-line, once, right after month W)
        # ------------------------------------------------------------------
        def snapshot(st):
            st = list(st)
            if any_bills:
                killed = st[i_bills + 2] > 0.5  # pre-ret tax failure
                st[5] = jnp.where(killed, 0.0, st[5])
            # (Pre-retirement failures need no years_to_ruin bookkeeping:
            # their alive flag drops here, so the alive-months counter
            # simply never increments and the final /12 yields 0.)
            if track:
                total_rec = st[0] + st[2]
                infl_rec = st[4]
                # Retirement-start constants live in their output refs from
                # here on; the retirement loop reads them back only on the
                # rare record months.
                out_start[:] = total_rec
                out_inflret[:] = infl_rec
                slot = jnp.clip(full_wy + 1, 0, traj_len - 1).astype(jnp.int32)

                @pl.when(partial_wy == 1)
                def _():
                    out_traj[pl.ds(slot, 1)] = total_rec[None]
                    out_price[pl.ds(slot, 1)] = infl_rec[None]
            return tuple(st)

        # ------------------------------------------------------------------
        # retirement month (W < m <= t_end)
        # ------------------------------------------------------------------
        def ret_month(m, st):
            st = list(st)
            b1, c1, b2, c2, infl, alive_f = (
                st[0], st[1], st[2], st[3], st[4], st[5]
            )
            alive = alive_f > 0.5
            alive0_f = alive_f
            k = m - w
            ret_idx = k - 1
            ret_idx_f = ret_idx.astype(jnp.float32)
            # The month's ONE calendar mod; every year-boundary predicate
            # below is an equality against it (see boundary_k above).
            k_mod = k % MONTHS_PER_YEAR
            if track:
                if track_refs:
                    ytr, yg, yr = out_ytr[:], yg_view[:], yr_view[:]
                else:
                    ytr, yg, yr = st[i_track:]
                new_year = k_mod == 1  # ret_idx % 12 == 0, k = ret_idx+1
                yg = jnp.where(new_year, 0.0, yg)
                yr = jnp.where(new_year, 0.0, yr)

            # --- income waterfall & net spending need
            price0 = infl
            if st_.guardrails:
                # Year-start guardrail check (years 1+; year 0 spends the
                # plan): planned WR against the balance entering the month.
                # Straight-line wheres — per-month scalar conds are the
                # measured ~54 ms landmine in this loop.
                smult = st[i_spend]
                planned = 12.0 * f(F_EXPENSES) * smult * price0
                wr_now = _rdiv(planned, jnp.maximum(b1 + b2, EPS))
                s_new = jnp.where(
                    wr_now > f(F_GR_UP), smult * (1.0 - f(F_GR_ADJ)), smult
                )
                s_new = jnp.where(
                    wr_now < f(F_GR_LO), smult * (1.0 + f(F_GR_ADJ)), s_new
                )
                s_new = jnp.minimum(
                    jnp.maximum(s_new, f(F_GR_FLOOR)), f(F_GR_CAP)
                )
                at_year_start = ((ret_idx % MONTHS_PER_YEAR) == 0) & (
                    ret_idx > 0
                )
                smult = jnp.where(at_year_start & alive, s_new, smult)
                st[i_spend] = smult
                expenses_eff = f(F_EXPENSES) * smult
            else:
                expenses_eff = f(F_EXPENSES)
            net_income = None
            for s in range(n_streams):
                amount_s = stream_cell(s_amount, s)
                active = ret_idx_f >= stream_start[s]
                if st_.stream_capped[s]:
                    active = active & (
                        ret_idx_f < stream_start[s]
                        + stream_cell(s_duration, s)
                    )
                if st_.stream_indexed[s]:
                    nominal = amount_s * price0
                else:
                    slot_f = i_fixed + fixed_slot[s]
                    fixed_s = jnp.where(
                        active & (ret_idx_f == stream_start[s])
                        & (st[slot_f] < 0),
                        amount_s * price0,
                        st[slot_f],
                    )
                    st[slot_f] = fixed_s
                    nominal = fixed_s
                inc = jnp.where(
                    active, nominal * (1.0 - stream_cell(s_tax, s)), 0.0
                )
                net_income = inc if net_income is None else net_income + inc
            if net_income is None:
                need = expenses_eff * price0
            else:
                need = jnp.maximum(0.0, expenses_eff * price0 - net_income)
            if st_.mortality:
                # Spending (and the income offsetting it) ends with the
                # owner: zero need = no withdrawal and no possible ruin,
                # while the estate below keeps evolving (growth, rebalance,
                # annual taxes) so the final balance is the bequest.
                living = ret_idx_f < d_mort
                need = jnp.where(living, need, 0.0)

            # --- ruin check A: broke before the month begins
            total0 = b1 + b2
            dies_a = alive & (total0 <= EPS) & (need > EPS)

            # --- market growth & inflation (dead/ruined paths freeze)
            g1, gi, g2 = draw(m)
            gmask = alive & ~dies_a
            if any_bills:
                st[i_bills] = st[i_bills] + jnp.where(
                    gmask, b1 * (g1 - 1.0), 0.0
                )
                st[i_bills + 1] = st[i_bills + 1] + jnp.where(
                    gmask, b2 * (g2 - 1.0), 0.0
                )
            b1 = jnp.where(gmask, b1 * g1, b1)
            b2 = jnp.where(gmask, b2 * g2, b2)
            infl = jnp.where(gmask, infl * gi, infl)

            # --- ruin check B: growth alone cannot fund the month (balances
            # are nonnegative after growth, so no clamp is needed)
            total1 = b1 + b2
            dies_b = gmask & (total1 <= EPS) & (need > EPS)
            wmask = gmask & ~dies_b
            wmask_f = jnp.where(wmask, 1.0, 0.0)

            # --- capacity-limited withdrawal, split pro-rata by net capacity
            eff1, nf1, nc1 = profile(b1, c1, st_.use_real1, r1)
            eff2, nf2, nc2 = profile(b2, c2, st_.use_real2, r2)
            tnc = nc1 + nc2
            ftol = EPS + FAIL_RTOL * (need + total1)
            # minimum: see frac_t — _rdiv error must not push frac above 1.
            frac_w = jnp.minimum(1.0, jnp.where(
                need >= tnc, 1.0, _rdiv(need, jnp.maximum(tnc, EPS))
            )) * wmask_f
            keep_w = 1.0 - frac_w
            ok1 = nc1 > 0
            ok2 = nc2 > 0
            gross1 = jnp.where(ok1, b1 * frac_w, 0.0)
            gross2 = jnp.where(ok2, b2 * frac_w, 0.0)
            nw = gross1 * nf1 + gross2 * nf2
            c1 = jnp.where(ok1, c1 * keep_w, c1)
            c2 = jnp.where(ok2, c2 * keep_w, c2)
            b1 = b1 - gross1
            b2 = b2 - gross2
            e1 = b1 <= EPS
            e2 = b2 <= EPS
            b1 = jnp.where(e1, 0.0, b1)
            c1 = jnp.where(e1, 0.0, c1)
            b2 = jnp.where(e2, 0.0, b2)
            c2 = jnp.where(e2, 0.0, c2)
            fail_net = wmask & (need > EPS) & (nw < need - ftol)
            if track:
                gw = gross1 + gross2  # zero where target was masked off
                yg = yg + gw
                # Deflated to T=0 dollars; the constant infl_ret factor
                # (retirement-$ conversion) is applied where yr is consumed,
                # saving a multiply per month and the infl_ret carry.
                yr = yr + _rdiv(gw, jnp.maximum(price0, EPS))

            # --- monthly rebalance (gain fractions unchanged by the
            # proportional sale above, so the profiles are reusable)
            b1, c1, b2, c2 = rebalance_lite(
                b1, c1, b2, c2, eff1, eff2, alloc1_ret, extra_noop=~wmask
            )

            # --- annual taxes at absolute boundaries / terminal settle
            dies_pre = dies_a | dies_b | fail_net
            if any_bills:
                tmask_ok = wmask & ~fail_net
                is_boundary = (m % MONTHS_PER_YEAR) == 0
                is_settle = (m == t_end) & ((w % MONTHS_PER_YEAR) != 0)

                def apply_tax(args):
                    bb1, cc1, bb2, cc2, gg1, gg2 = args
                    tb1, tc1, tb2, tc2, tfail = annual_tax(
                        bb1, cc1, bb2, cc2, gg1, gg2, alloc1_ret
                    )
                    mask = (is_boundary & tmask_ok) | (
                        ~is_boundary & alive & ~dies_pre
                    )
                    return (
                        jnp.where(mask, tb1, bb1),
                        jnp.where(mask, tc1, cc1),
                        jnp.where(mask, tb2, bb2),
                        jnp.where(mask, tc2, cc2),
                        jnp.where(mask & is_boundary, 0.0, gg1),
                        jnp.where(mask & is_boundary, 0.0, gg2),
                        jnp.where(mask & tfail, 1.0, gg1 * 0.0),
                    )

                b1, c1, b2, c2, st[i_bills], st[i_bills + 1], tfail_f = (
                    lax.cond(
                        is_boundary | is_settle,
                        apply_tax,
                        lambda a: a + (a[4] * 0.0,),
                        (b1, c1, b2, c2, st[i_bills], st[i_bills + 1]),
                    )
                )
                dies = dies_pre | (tfail_f > 0.5)
                settle_failed = is_settle & (tfail_f > 0.5)
                dies_regular = dies & ~settle_failed
            else:
                dies = dies_pre
                settle_failed = jnp.zeros(shape, bool)
                dies_regular = dies

            alive_f = jnp.where(dies, 0.0, alive_f)
            if track:
                # Alive-months counter: a ruined path was alive at the start
                # of its death month, so the count freezes at exactly
                # ret_idx + 1 — including the settle-month tax failure,
                # where it freezes at R*12 (the final /12 gives R, the
                # value the old select wrote). Survivors and mortality
                # deaths (the estate keeps living) count to R*12 and are
                # mapped to NaN at the kernel end. One add replaces the
                # old per-month death-month select chain.
                ytr = ytr + alive0_f

                # First-year withdrawal capture: k <= 12 IS the year-0
                # window (ret_idx <= 11), so the whole subgraph is skipped
                # for the other ~588 months of a 50-year retirement.
                @pl.when(k <= MONTHS_PER_YEAR)
                def _():
                    year_end = (k % MONTHS_PER_YEAR) == 0
                    cap_fy = (alive0_f > 0.5) & (dies_regular | year_end)
                    out_fyg[:] = jnp.where(cap_fy, yg, out_fyg[:])
                    out_fyr[:] = jnp.where(
                        cap_fy, yr * out_inflret[:], out_fyr[:]
                    )

                # Record-only work (slots, death bookkeeping, recorded
                # values) lives INSIDE the when: 11 of 12 months skip it.
                @pl.when((k % MONTHS_PER_YEAR) == 0)
                def _():
                    slot = jnp.clip(
                        full_wy + partial_wy
                        + (k + MONTHS_PER_YEAR - 1) // MONTHS_PER_YEAR,
                        0, traj_len - 1,
                    ).astype(jnp.int32)
                    yslot = jnp.clip(
                        k // MONTHS_PER_YEAR - 1, 0, R - 1
                    ).astype(jnp.int32)
                    total2 = b1 + b2
                    # Dead paths froze at death, so total2 is the at-death
                    # balance for deaths this year; older deaths pad zero.
                    # The alive-months counter IS the death month for dead
                    # paths; for still-alive paths it equals k, which
                    # passes the died_this_year window but is absorbed by
                    # the alive_now branch of the mask/value selects below.
                    death_k = ytr
                    y_f = (k // MONTHS_PER_YEAR - 1).astype(jnp.float32)
                    died_this_year = (
                        death_k > y_f * MONTHS_PER_YEAR + 0.5
                    ) & (death_k < k.astype(jnp.float32) + 0.5)
                    alive_now = alive_f > 0.5
                    wmask_rec = alive_now | died_this_year
                    value_rec = jnp.where(
                        wmask_rec,
                        jnp.where(
                            alive_now, total2, jnp.maximum(0.0, total2)
                        ),
                        0.0,
                    )
                    start_bal = out_start[:]
                    wr_mask = (alive0_f > 0.5) & ~dies_regular
                    if st_.mortality:
                        # WR observations exist only for fully-lived years
                        # (at year end, ret_idx is the year's last month).
                        wr_mask = wr_mask & living
                    wr_value = jnp.where(
                        start_bal > EPS,
                        yr * out_inflret[:]
                        / jnp.maximum(start_bal, EPS) * 100.0,
                        0.0,
                    )
                    old_t = out_traj[pl.ds(slot, 1)][0]
                    out_traj[pl.ds(slot, 1)] = jnp.where(
                        wmask_rec, value_rec, old_t
                    )[None]
                    # Unconditional: dead paths' infl froze at death, so this
                    # carries the at-death price level into post-death slots
                    # (reference padding, backend/simulation.py:902-937).
                    out_price[pl.ds(slot, 1)] = infl[None]
                    old_w = out_wr[pl.ds(yslot, 1)][0]
                    out_wr[pl.ds(yslot, 1)] = jnp.where(
                        wr_mask, wr_value, old_w
                    )[None]

                if track_refs:
                    out_ytr[:], yg_view[:], yr_view[:] = ytr, yg, yr
                else:
                    st[i_track:] = [ytr, yg, yr]

            st[0], st[1], st[2], st[3], st[4], st[5] = (
                b1, c1, b2, c2, infl, alive_f
            )
            return tuple(st)

        state = lax.fori_loop(1, w + 1, accum_month, init)
        state = snapshot(state)
        final = lax.fori_loop(w + 1, t_end + 1, ret_month, state)

        out_success[:] = final[5].reshape(out_success.shape)
        out_final[:] = jnp.maximum(0.0, final[0] + final[2]).reshape(
            out_final.shape
        )
        if track:
            # start/inflret were stored at the snapshot; fy_g/fy_r
            # accumulated in their refs during the year-0 window.
            # years_to_ruin from the alive-months counter: still-alive
            # paths (survivors AND mortality deaths, whose estate lived
            # on) -> NaN; ruined paths -> death month / 12 (pre-retirement
            # kills counted zero months -> 0.0, the reference's value).
            if track_refs:
                ytr = out_ytr[:]
            else:
                ytr, _yg, _yr = final[i_track:]
            ytr = jnp.where(
                final[5] > 0.5, jnp.float32(jnp.nan),
                ytr / MONTHS_PER_YEAR,
            )
            out_ytr[:] = ytr.reshape(out_ytr.shape)

    return kernel


def _pack_params(
    params: SimParams, seed: int, working_months, retirement_years,
    block_offset=0,
):
    sq = math.sqrt(MONTHS_PER_YEAR)
    f32 = jnp.float32
    fp = jnp.stack(
        [
            params.mu1.astype(f32) / MONTHS_PER_YEAR,
            params.sigma1.astype(f32) / sq,
            params.mu_inf.astype(f32) / MONTHS_PER_YEAR,
            params.sigma_inf.astype(f32) / sq,
            params.mu_prem.astype(f32) / MONTHS_PER_YEAR,
            params.sigma_prem.astype(f32) / sq,
            params.rho.astype(f32),
            jnp.sqrt(jnp.maximum(0.0, 1.0 - params.rho.astype(f32) ** 2)),
            params.alloc1.astype(f32),
            params.initial_balance.astype(f32),
            params.monthly_contribution.astype(f32),
            jnp.log1p(params.contribution_growth.astype(f32)),
            params.monthly_expenses.astype(f32),
            params.real_tax1.astype(f32),
            params.ann_tax1.astype(f32),
            params.real_tax2.astype(f32),
            params.ann_tax2.astype(f32),
            params.alloc1_final.astype(f32),
            params.gr_upper.astype(f32),
            params.gr_lower.astype(f32),
            params.gr_adjust.astype(f32),
            params.gr_floor.astype(f32),
            params.gr_cap.astype(f32),
            params.jump_p.astype(f32),
            params.jump_mu.astype(f32),
            params.jump_sigma.astype(f32),
            params.jump_beta.astype(f32),
            params.jump_comp1.astype(f32),
            params.jump_comp2.astype(f32),
            params.mort_g0.astype(f32),
            params.mort_b12.astype(f32),
            params.mort_cap.astype(f32),
        ]
    )
    w = jnp.asarray(working_months, jnp.int32).reshape(-1)  # (K,) candidates
    seeds = jnp.broadcast_to(jnp.asarray(seed, jnp.int32), w.shape)
    offs = jnp.broadcast_to(jnp.asarray(block_offset, jnp.int32), w.shape)
    ip = jnp.stack(
        [w, w + jnp.int32(MONTHS_PER_YEAR * retirement_years), seeds, offs],
        axis=1,
    )  # (K, NUM_IPARAMS)
    return ip, fp


def _stream_inputs(params, in_specs, inputs):
    f32 = jnp.float32
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
    inputs += [
        params.stream_amount.astype(f32),
        params.stream_months_from_t0.astype(f32),
        jnp.minimum(
            params.stream_duration_months.astype(f32), jnp.float32(3.0e7)
        ),
        params.stream_indexed.astype(f32),
        params.stream_tax.astype(f32),
    ]


@partial(
    jax.jit,
    static_argnames=("n_paths", "retirement_years", "n_streams", "statics",
                     "with_shocks", "interpret", "t_scan"),
)
def pallas_simulate(
    params: SimParams,
    working_months,
    seed,
    *,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    statics: Statics,
    shocks: Optional[jnp.ndarray] = None,
    with_shocks: bool = False,
    interpret: bool = False,
    t_scan: int = 0,  # accepted for API compatibility; loops are dynamic now
    block_offset=0,
):
    """Probe-mode simulation on the Pallas TPU kernel.

    Returns (success_f32, final_balance) of shape (n_padded,); the caller
    slices [:n_paths]. ``shocks`` (debug/parity only): (T, 3, BLOCK_ROWS, 128)
    pre-drawn independent normals for a single block.
    """
    del t_scan
    assert n_streams == params.n_streams
    n_blocks = max(1, -(-n_paths // BLOCK_PATHS))
    ip, fp = _pack_params(
        params, seed, working_months, retirement_years,
        block_offset=block_offset,
    )
    if ip.shape[0] != 1:
        raise ValueError(
            f"pallas_simulate takes ONE working_months value, got "
            f"{ip.shape[0]} rows; use pallas_probe for candidate batches"
        )

    kernel = _make_kernel(
        n_streams, retirement_years, with_shocks, statics,
        interpret=interpret,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # iparams
        pl.BlockSpec(memory_space=pltpu.SMEM),  # fparams
    ]
    inputs = [ip, fp]
    if n_streams:
        _stream_inputs(params, in_specs, inputs)
    if with_shocks:
        assert n_blocks == 1, "injected shocks support a single block only"
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        inputs.append(shocks.astype(jnp.float32))

    out_shape = [
        jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, 128), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]

    success, final = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    return success.reshape(-1), final.reshape(-1)


@partial(
    jax.jit,
    static_argnames=("n_candidates", "n_paths", "retirement_years",
                     "n_streams", "statics", "t_scan", "interpret"),
)
def pallas_probe(
    params: SimParams,
    months,
    seed,
    *,
    n_candidates: int,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    statics: Statics,
    t_scan: int = 0,  # accepted for API compatibility
    interpret: bool = False,
    block_offset=0,
):
    """Candidate-parallel probe: one dispatch for a whole candidate batch.

    The grid is (candidates, path-blocks); iparams is blocked per candidate
    so every grid step simulates its own working_months, while the PRNG seed
    depends only on the path-block axis — all candidates therefore see
    identical shock draws (common random numbers), exactly like the XLA
    probe path. Returns per-candidate success probabilities in percent,
    shape (n_candidates,).
    """
    del t_scan
    assert n_streams == params.n_streams
    n_blocks = max(1, -(-n_paths // BLOCK_PATHS))
    ip, fp = _pack_params(
        params, seed, months, retirement_years, block_offset=block_offset
    )
    if ip.shape[0] != n_candidates:
        raise ValueError(
            f"months supplies {ip.shape[0]} candidate rows but the grid has "
            f"n_candidates={n_candidates}; each grid step reads its own row, "
            "so the counts must match exactly"
        )

    kernel = _make_kernel(
        n_streams, retirement_years, with_shocks=False, statics=statics,
        block_axis=1, cand_axis=0, interpret=interpret,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # full (K, NUM_IPARAMS); row = pid(0)
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    inputs = [ip, fp]
    if n_streams:
        _stream_inputs(params, in_specs, inputs)
    out_shape = [
        jax.ShapeDtypeStruct(
            (n_candidates, n_blocks * BLOCK_ROWS, 128), jnp.float32
        ),
        jax.ShapeDtypeStruct(
            (n_candidates, n_blocks * BLOCK_ROWS, 128), jnp.float32
        ),
    ]
    out_specs = [
        pl.BlockSpec((1, BLOCK_ROWS, 128), lambda c, b: (c, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_ROWS, 128), lambda c, b: (c, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    success, _final = pl.pallas_call(
        kernel,
        grid=(n_candidates, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    flat = success.reshape(n_candidates, -1)[:, :n_paths]
    return jnp.mean(flat, axis=1) * 100.0


@partial(
    jax.jit,
    static_argnames=("n_paths", "retirement_years", "n_streams", "statics",
                     "traj_len", "t_scan", "with_shocks", "interpret",
                     "packed"),
)
def pallas_simulate_full(
    params: SimParams,
    working_months,
    seed,
    *,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    statics: Statics,
    traj_len: int,
    t_scan: int = 0,  # accepted for API compatibility
    shocks=None,
    with_shocks: bool = False,
    interpret: bool = False,
    block_offset=0,
    packed: int = 0,
):
    """Full-statistics simulation on the Pallas kernel.

    Returns a dict of per-path arrays: success/final/start/ytr/fy_g/fy_r/
    infl_ret of shape (n_padded,), trajectory/price (n_padded, traj_len) and
    wr (n_padded, R). Same semantics as the XLA scan kernel's tracked mode
    (pinned by the injected-shocks parity suite).

    ``packed`` selects the output-window layout (all bit-identical, pinned
    on CPU and on device — see docs/NOTES.md §r5-window-packing):
    0 = ten separate output refs (production default), 1 = one fused
    (7+2L+R, rows, 128) window, 2 = fused window plus the track
    accumulators (yg/yr/ytr) moved from loop carries into VMEM rows.
    Layout 1 measured perf-NEUTRAL vs 0 on chip at 1M×600; kept with the
    A/B harness `scripts/packed_ab.py` (numbers in NOTES).
    """
    del t_scan
    assert n_streams == params.n_streams
    rows = FULL_BLOCK_ROWS
    block_paths = rows * 128
    n_blocks = max(1, -(-n_paths // block_paths))
    ip, fp = _pack_params(
        params, seed, working_months, retirement_years,
        block_offset=block_offset,
    )
    if ip.shape[0] != 1:
        raise ValueError(
            f"pallas_simulate_full takes ONE working_months value, got "
            f"{ip.shape[0]} rows; use pallas_probe for candidate batches"
        )
    R = retirement_years

    kernel = _make_kernel(
        n_streams, retirement_years, with_shocks=with_shocks,
        statics=statics, rows=rows, traj_len=traj_len, interpret=interpret,
        packed=packed,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    inputs = [ip, fp]
    if n_streams:
        _stream_inputs(params, in_specs, inputs)
    if with_shocks:
        assert n_blocks == 1, "injected shocks support a single block only"
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        inputs.append(shocks.astype(jnp.float32))

    n_pad = n_blocks * rows
    if packed:
        # One fused output window: [0:7] per-path vectors (success, final,
        # start, ytr, fy_g, fy_r, infl_ret), then traj, price, wr slabs.
        # packed=2 adds two scratch rows (yg, yr accumulators) at [7:9] so
        # the month loops carry three fewer values.
        base = 9 if packed == 2 else 7
        C = base + 2 * traj_len + R
        out_shape = [jax.ShapeDtypeStruct((C, n_pad, 128), jnp.float32)]
        out_specs = [
            pl.BlockSpec((C, rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
        ]
    else:
        vec = jax.ShapeDtypeStruct((n_pad, 128), jnp.float32)
        vec_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        series = lambda L: jax.ShapeDtypeStruct((L, n_pad, 128), jnp.float32)
        series_spec = pl.BlockSpec(
            (traj_len, rows, 128), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM
        )
        wr_spec = pl.BlockSpec(
            (R, rows, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        out_shape = [vec] * 7 + [series(traj_len), series(traj_len),
                                 series(R)]
        out_specs = [vec_spec] * 7 + [series_spec, series_spec, wr_spec]

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    if packed:
        out_full = outs[0]
        succ, final, start, ytr, fy_g, fy_r, infl_ret = (
            out_full[i] for i in range(7)
        )
        base = 9 if packed == 2 else 7
        traj = out_full[base:base + traj_len]
        price = out_full[base + traj_len:base + 2 * traj_len]
        wr = out_full[base + 2 * traj_len:]
    else:
        (succ, final, start, ytr, fy_g, fy_r, infl_ret, traj, price,
         wr) = outs
    flat = lambda x: x.reshape(-1)
    # (L, rows, 128) -> (path, L) with path = row * 128 + lane, matching the
    # flattening of the per-path vectors above.
    per_path_series = lambda x: jnp.transpose(x, (1, 2, 0)).reshape(
        n_pad * 128, -1
    )
    return {
        "success": flat(succ),
        "final_balance": flat(final),
        "start_balance": flat(start),
        "years_to_ruin": flat(ytr),
        "first_year_gross": flat(fy_g),
        "first_year_real_gross": flat(fy_r),
        "inflation_at_retirement": flat(infl_ret),
        "trajectory": per_path_series(traj),
        "price_levels": per_path_series(price),
        "withdrawal_rates": per_path_series(wr),
    }


def pallas_scenario_grid(
    params_batch: SimParams,
    months,
    seed,
    **kwargs,
):
    """Public scenario-grid entry: validates (when values are concrete) that
    every row matches the compile-time ``statics`` before dispatching — a
    mixed batch would silently simulate rows under the wrong tax system.
    See ``_pallas_scenario_grid_jit`` for the full docstring."""
    _check_grid_statics(params_batch, kwargs["statics"])
    return _pallas_scenario_grid_jit(params_batch, months, seed, **kwargs)


def pallas_scenario_grid_raw(
    params_batch: SimParams,
    months,
    seed,
    **kwargs,
):
    """Scenario grid returning the raw per-path outputs: (success, final)
    of shape (n_scenarios, n_padded) f32, caller slices [:, :n_paths].
    Same validation, grid layout and CRN seeding as pallas_scenario_grid."""
    _check_grid_statics(params_batch, kwargs["statics"])
    return _pallas_scenario_grid_raw_jit(params_batch, months, seed, **kwargs)


def _scenario_grid_call(
    params_batch: SimParams,
    months,
    seed,
    *,
    n_scenarios: int,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    statics: Statics,
    interpret: bool = False,
    block_offset=0,
):
    """Shared tracer for the scenario-grid dispatch: every (config,
    working_months) pair in one Pallas call.

    ``params_batch`` is a struct-of-arrays SimParams (leading scenario axis,
    see engine.scenario_batch.stack_params); the kernel grid is
    (scenarios, path-blocks) with per-row parameters and path-block-only PRNG
    seeding, so the whole grid shares shock draws (CRN across scenarios).
    All scenarios in a batch MUST share ``statics`` (same tax systems and
    stream structure) — the kernel bakes them into the executable, so a
    mixed batch would silently simulate rows under the wrong tax system or
    stream-indexing structure. Use
    ``engine.scenario_batch.grid_statics(configs)``, which validates and
    returns the shared value; the concrete-value guard in the public
    entries (``_check_grid_statics``) rejects mismatched rows as a second
    line of defense. Returns (success, final) of shape
    (n_scenarios, n_padded) f32.
    """
    # Batched SimParams carry streams as (K, S); n_streams is the last axis.
    assert n_streams == int(params_batch.stream_amount.shape[-1])
    n_blocks = max(1, -(-n_paths // BLOCK_PATHS))
    ip, fp_rows = _pack_params(
        params_batch, seed, months, retirement_years,
        block_offset=block_offset,
    )
    # _pack_params stacks per-parameter vectors of shape (K,) -> fp (NF, K);
    # the kernel wants rows per scenario: (K, NF).
    fp = jnp.transpose(fp_rows)
    if ip.shape[0] != n_scenarios or fp.shape[0] != n_scenarios:
        raise ValueError(
            f"scenario grid of n_scenarios={n_scenarios} needs one months "
            f"row and one SimParams row per scenario; got {ip.shape[0]} "
            f"months rows and {fp.shape[0]} parameter rows"
        )

    kernel = _make_kernel(
        n_streams, retirement_years, with_shocks=False, statics=statics,
        block_axis=1, cand_axis=0, multi_params=True, interpret=interpret,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # iparams (K, NUM_IPARAMS)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # fparams (K, NF)
    ]
    inputs = [ip, fp]
    if n_streams:
        _stream_inputs(params_batch, in_specs, inputs)
    out_shape = [
        jax.ShapeDtypeStruct(
            (n_scenarios, n_blocks * BLOCK_ROWS, 128), jnp.float32
        ),
        jax.ShapeDtypeStruct(
            (n_scenarios, n_blocks * BLOCK_ROWS, 128), jnp.float32
        ),
    ]
    out_specs = [
        pl.BlockSpec((1, BLOCK_ROWS, 128), lambda c, b: (c, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_ROWS, 128), lambda c, b: (c, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    success, final = pl.pallas_call(
        kernel,
        grid=(n_scenarios, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    return (
        success.reshape(n_scenarios, -1),
        final.reshape(n_scenarios, -1),
    )


@partial(
    jax.jit,
    static_argnames=("n_scenarios", "n_paths", "retirement_years",
                     "n_streams", "statics", "t_scan", "interpret"),
)
def _pallas_scenario_grid_jit(
    params_batch: SimParams,
    months,
    seed,
    *,
    n_scenarios: int,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    statics: Statics,
    t_scan: int = 0,  # accepted for API compatibility
    interpret: bool = False,
    block_offset=0,
):
    """Scenario-grid probe (see ``_scenario_grid_call``): returns success
    probabilities in percent, shape (n_scenarios,)."""
    del t_scan
    success, _final = _scenario_grid_call(
        params_batch, months, seed,
        n_scenarios=n_scenarios, n_paths=n_paths,
        retirement_years=retirement_years, n_streams=n_streams,
        statics=statics, interpret=interpret, block_offset=block_offset,
    )
    return jnp.mean(success[:, :n_paths], axis=1) * 100.0


@partial(
    jax.jit,
    static_argnames=("n_scenarios", "n_paths", "retirement_years",
                     "n_streams", "statics", "t_scan", "interpret"),
)
def _pallas_scenario_grid_raw_jit(
    params_batch: SimParams,
    months,
    seed,
    *,
    n_scenarios: int,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    statics: Statics,
    t_scan: int = 0,  # accepted for API compatibility
    interpret: bool = False,
    block_offset=0,
):
    """Scenario grid returning raw (success, final) per-path arrays of
    shape (n_scenarios, n_padded); see ``_scenario_grid_call``."""
    del t_scan
    return _scenario_grid_call(
        params_batch, months, seed,
        n_scenarios=n_scenarios, n_paths=n_paths,
        retirement_years=retirement_years, n_streams=n_streams,
        statics=statics, interpret=interpret, block_offset=block_offset,
    )


# ---------------------------------------------------------------------------
# Multi-chip: the Pallas kernels under shard_map over a 'paths' mesh axis
# ---------------------------------------------------------------------------

_SHARDED_CACHE: dict = {}


def pallas_probe_sharded(
    params: SimParams,
    months,
    seed,
    *,
    mesh,
    n_candidates: int,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    statics: Statics,
    interpret: bool = False,
    block_offset=0,
):
    """Candidate probe data-parallel over a device mesh's first axis.

    Each device runs ``local_blocks`` path blocks whose PRNG seeds are
    indexed by GLOBAL block id (device_index * local_blocks + local block),
    so the set of shock streams is a pure function of the seed — common
    random numbers across candidates hold exactly as on one chip, and an
    n-device run reproduces the single-chip run that uses the same global
    block count (pinned by test_pallas_parity). The path count rounds up to
    whole blocks per device; probabilities average over all simulated paths.
    Per-candidate success means reduce with a psum over ICI.

    ``block_offset`` (traced) shifts every device's global block ids so
    Engine.probe can chunk a beyond-budget path count into mesh-sized
    dispatches that together cover the same global block sequence.
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = int(mesh.shape[axis])
    local_blocks = _local_blocks(n_paths, n_dev, BLOCK_PATHS)
    local_pad = local_blocks * BLOCK_PATHS

    key = (
        "probe", mesh, n_candidates, local_blocks, retirement_years,
        n_streams, statics, interpret,
    )
    fn = _SHARDED_CACHE.get(key)
    if fn is None:

        def shard_fn(params, months, seed, base_offset):
            offset = base_offset + (
                jax.lax.axis_index(axis).astype(jnp.int32)
                * jnp.int32(local_blocks)
            )
            local = pallas_probe(
                params, months, seed,
                n_candidates=n_candidates,
                n_paths=local_pad,
                retirement_years=retirement_years,
                n_streams=n_streams,
                statics=statics,
                interpret=interpret,
                block_offset=offset,
            )
            # equal local path counts on every shard: global mean = mean of
            # shard means
            return jax.lax.pmean(local, axis)

        fn = jax.jit(
            jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(), P(), P(), P()),
                out_specs=P(),
                check_vma=False,
            )
        )
        _SHARDED_CACHE[key] = fn
    return fn(
        params,
        jnp.asarray(months, jnp.int32),
        jnp.asarray(seed, jnp.int32),
        jnp.asarray(block_offset, jnp.int32),
    )


def pallas_simulate_sharded(
    params: SimParams,
    working_months,
    seed,
    *,
    mesh,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    statics: Statics,
    interpret: bool = False,
):
    """Probe-mode simulation sharded over a 'paths' mesh: returns
    (success_f32, final_balance) with the leading axis sharded across
    devices (n_dev * local_pad entries; caller slices [:n_paths]). Seeds are
    global-block-indexed exactly like ``pallas_probe_sharded``."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = int(mesh.shape[axis])
    local_blocks = _local_blocks(n_paths, n_dev, BLOCK_PATHS)
    local_pad = local_blocks * BLOCK_PATHS

    key = (
        "simulate", mesh, local_blocks, retirement_years, n_streams,
        statics, interpret,
    )
    fn = _SHARDED_CACHE.get(key)
    if fn is None:

        def shard_fn(params, w, seed):
            offset = (
                jax.lax.axis_index(axis).astype(jnp.int32)
                * jnp.int32(local_blocks)
            )
            return pallas_simulate(
                params, w, seed,
                n_paths=local_pad,
                retirement_years=retirement_years,
                n_streams=n_streams,
                statics=statics,
                interpret=interpret,
                block_offset=offset,
            )

        fn = jax.jit(
            jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(), P(), P()),
                out_specs=P(axis),
                check_vma=False,
            )
        )
        _SHARDED_CACHE[key] = fn
    return fn(
        params,
        jnp.asarray(working_months, jnp.int32),
        jnp.asarray(seed, jnp.int32),
    )


def pallas_scenario_grid_sharded(
    params_batch: SimParams,
    months,
    seed,
    *,
    mesh,
    n_scenarios: int,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    statics: Statics,
    interpret: bool = False,
):
    """Scenario-grid probe data-parallel over a 'paths' mesh: every device
    simulates its share of paths for ALL scenarios (global-block PRNG
    seeding preserves CRN across the grid), per-scenario success means
    reduce with a pmean over ICI. Path count rounds up to whole blocks per
    device."""
    from jax.sharding import PartitionSpec as P

    _check_grid_statics(params_batch, statics)
    axis = mesh.axis_names[0]
    n_dev = int(mesh.shape[axis])
    local_blocks = _local_blocks(n_paths, n_dev, BLOCK_PATHS)
    local_pad = local_blocks * BLOCK_PATHS

    key = (
        "grid", mesh, n_scenarios, local_blocks, retirement_years,
        n_streams, statics, interpret,
    )
    fn = _SHARDED_CACHE.get(key)
    if fn is None:

        def shard_fn(params_batch, months, seed):
            offset = (
                jax.lax.axis_index(axis).astype(jnp.int32)
                * jnp.int32(local_blocks)
            )
            local = pallas_scenario_grid(
                params_batch, months, seed,
                n_scenarios=n_scenarios,
                n_paths=local_pad,
                retirement_years=retirement_years,
                n_streams=n_streams,
                statics=statics,
                interpret=interpret,
                block_offset=offset,
            )
            return jax.lax.pmean(local, axis)

        fn = jax.jit(
            jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(), P(), P()),
                out_specs=P(),
                check_vma=False,
            )
        )
        _SHARDED_CACHE[key] = fn
    return fn(
        params_batch,
        jnp.asarray(months, jnp.int32),
        jnp.asarray(seed, jnp.int32),
    )


def pallas_scenario_grid_raw_sharded(
    params_batch: SimParams,
    months,
    seed,
    *,
    mesh,
    n_scenarios: int,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    statics: Statics,
    interpret: bool = False,
):
    """Scenario grid over a 'paths' mesh returning raw per-path arrays:
    (success, final) of shape (n_scenarios, n_dev * local_pad) sharded on
    the path axis. Downstream reductions (means, the selection-based
    percentiles) run under jit with sharding propagation, so their path-axis
    sums lower to ICI psums — no host gather. Global-block PRNG seeding
    keeps the grid's CRN and makes an n-device run reproduce 1-device."""
    from jax.sharding import PartitionSpec as P

    _check_grid_statics(params_batch, statics)
    axis = mesh.axis_names[0]
    n_dev = int(mesh.shape[axis])
    local_blocks = _local_blocks(n_paths, n_dev, BLOCK_PATHS)
    local_pad = local_blocks * BLOCK_PATHS

    key = (
        "grid_raw", mesh, n_scenarios, local_blocks, retirement_years,
        n_streams, statics, interpret,
    )
    fn = _SHARDED_CACHE.get(key)
    if fn is None:

        def shard_fn(params_batch, months, seed):
            offset = (
                jax.lax.axis_index(axis).astype(jnp.int32)
                * jnp.int32(local_blocks)
            )
            return _pallas_scenario_grid_raw_jit(
                params_batch, months, seed,
                n_scenarios=n_scenarios,
                n_paths=local_pad,
                retirement_years=retirement_years,
                n_streams=n_streams,
                statics=statics,
                interpret=interpret,
                block_offset=offset,
            )

        fn = jax.jit(
            jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(), P(), P()),
                out_specs=(P(None, axis), P(None, axis)),
                check_vma=False,
            )
        )
        _SHARDED_CACHE[key] = fn
    return fn(
        params_batch,
        jnp.asarray(months, jnp.int32),
        jnp.asarray(seed, jnp.int32),
    )


def pallas_simulate_full_sharded(
    params: SimParams,
    working_months,
    seed,
    *,
    mesh,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    statics: Statics,
    traj_len: int,
    interpret: bool = False,
    block_offset=0,
):
    """Full-statistics simulation sharded over a 'paths' mesh.

    Per-path vectors come back sharded on their leading axis and the yearly
    series on their path axis (same dict layout as ``pallas_simulate_full``,
    n_dev * local_pad entries; caller slices [:n_paths]). Global-block PRNG
    seeding makes an n-device run reproduce the 1-device run bit-for-bit.

    ``block_offset`` (traced, so it reuses the executable) shifts every
    device's global block ids — Engine._run_chunked uses it to split a
    beyond-HBM-budget run into mesh-sized chunks whose union is the
    unchunked run path for path (chunk sizes are multiples of
    n_dev * block, so per-device padding never interleaves real blocks).
    """
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = int(mesh.shape[axis])
    rows = FULL_BLOCK_ROWS
    local_blocks = _local_blocks(n_paths, n_dev, rows * 128)
    local_pad = local_blocks * rows * 128

    key = (
        "full", mesh, local_blocks, retirement_years, n_streams, statics,
        traj_len, interpret,
    )
    fn = _SHARDED_CACHE.get(key)
    if fn is None:
        out_specs = {
            name: (P(axis) if name not in
                   ("trajectory", "price_levels", "withdrawal_rates")
                   else P(axis, None))
            for name in (
                "success", "final_balance", "start_balance", "years_to_ruin",
                "first_year_gross", "first_year_real_gross",
                "inflation_at_retirement", "trajectory", "price_levels",
                "withdrawal_rates",
            )
        }

        def shard_fn(params, w, seed, base_offset):
            offset = base_offset + (
                jax.lax.axis_index(axis).astype(jnp.int32)
                * jnp.int32(local_blocks)
            )
            return pallas_simulate_full(
                params, w, seed,
                n_paths=local_pad,
                retirement_years=retirement_years,
                n_streams=n_streams,
                statics=statics,
                traj_len=traj_len,
                interpret=interpret,
                block_offset=offset,
            )

        fn = jax.jit(
            jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(P(), P(), P(), P()),
                out_specs=out_specs,
                check_vma=False,
            )
        )
        _SHARDED_CACHE[key] = fn
    return fn(
        params,
        jnp.asarray(working_months, jnp.int32),
        jnp.asarray(seed, jnp.int32),
        jnp.asarray(block_offset, jnp.int32),
    )
