"""Pallas gather prototype vs XLA's native gather (VERDICT round-1 #8).

Round 1 concluded (by analysis) that a Pallas kernel cannot beat XLA's
dynamic-gather for the footprint-packed row gathers that dominate the VM
field evaluation, because TPU row gathers are served by dedicated hardware
at a fixed row rate while Pallas random-access HBM reads must be expressed
as per-row DMAs. This prototype backs that with numbers: gather N random
rows of a [R, C] f32 table resident in HBM.

  * XLA path: jnp.take(table, idx, axis=0)
  * Pallas path: grid over index tiles; per tile, a scalar-prefetch index
    ref drives one async DMA per row from the HBM-resident table into a
    VMEM tile, double-buffered across rows (the recommended dynamic-gather
    pattern — pallas_guide.md "Async DMA").

Timing: the axon relay defers/elides dispatches whose outputs are never
pulled, so wall-clocking a Python loop of dispatches under-counts (it can
even go negative after the round-trip subtraction). Both paths therefore
run REPS iterations inside one jitted fori_loop with a data dependence
between iterations (idx is rotated by the carry) and a scalar reduction
pulled at the end — the bench.py pattern.

Run alone on the TPU: python extra/pallas_gather_bench.py
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iffnerf_tpu.runtime import setup as _runtime_setup

_runtime_setup()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_gather(table, idx, tile: int = 512, depth: int = 8):
    """Gather table[idx] via per-row async DMA, ``depth`` copies in flight.

    Toolchain constraint (measured by bisection on this image): Mosaic
    crashes on any DMA whose sublane extent is below the f32 tile (8 rows)
    — a true per-row [1, C] copy cannot compile. Each gather therefore
    DMAs the aligned 8-row GROUP containing the target row (8x the
    payload) and extracts the row from VMEM. This inflates the Pallas
    path's HBM traffic by 8x, which is itself part of the answer: the
    hardware-served XLA gather moves only the payload.
    """
    n = idx.shape[0]
    r, c = table.shape
    assert n % tile == 0 and r % 8 == 0

    # Index delivery constraint (also bisected): the indices must arrive
    # via scalar prefetch — an in-kernel HBM->SMEM index DMA crashes the
    # compile helper too. Prefetch lands the whole array in SMEM, which
    # caps n (2M indices = 8 MB blows SMEM; ~64k compiles). The bench
    # therefore measures ns/row at an n the Pallas path can run at and
    # compares XLA at the same n.
    def kernel(idx_ref, table_ref, out_ref):
        def body(scratch, sems):
            def get_dma(slot, row_i):
                # scalar read from the prefetched (SMEM) index array
                row = idx_ref[pl.program_id(0), row_i]
                group = (row // 8) * 8
                return pltpu.make_async_copy(
                    table_ref.at[pl.ds(group, 8), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            for j in range(depth - 1):  # prologue: fill the pipeline
                get_dma(j, j).start()

            def loop(i, _):
                slot = i % depth

                @pl.when(i + depth - 1 < tile)
                def _():
                    get_dma((i + depth - 1) % depth, i + depth - 1).start()

                get_dma(slot, i).wait()
                row = idx_ref[pl.program_id(0), i]
                sub = row - (row // 8) * 8
                out_ref[pl.ds(i, 1), :] = scratch[slot, pl.ds(sub, 1), :]
                return 0

            jax.lax.fori_loop(0, tile, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((depth, 8, c), table.dtype),
            sems=pltpu.SemaphoreType.DMA((depth,)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table in HBM
        out_specs=pl.BlockSpec((tile, c), lambda i, idx_ref: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c), table.dtype),
    )(idx.reshape(n // tile, tile), table)


def make_looped(gather_fn, rows: int, reps: int):
    """REPS gathers inside one program, serialised by a carry-dependent
    index rotation so the relay can neither elide nor overlap them."""

    @jax.jit
    def run(table, idx):
        def body(i, acc):
            # rotate indices by the (data-dependent) carry: defeats CSE and
            # chains iteration k+1 on iteration k's output
            shift = (acc.astype(jnp.int32) & 0x7) + i
            idx_i = (idx + shift) % rows
            out = gather_fn(table, idx_i)
            return acc + out[0, 0]

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    return run


def median_time(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=90000,
                    help="table rows (300^2 packed plane)")
    ap.add_argument("--cols", type=int, default=256,
                    help="row width (4 texels x 64 packed channels)")
    ap.add_argument("--n", type=int, default=1 << 21,
                    help="gathered rows (a 2M-slot compaction buffer)")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (args.rows, args.cols), jnp.float32)
    idx = jax.random.randint(key, (args.n,), 0, args.rows, jnp.int32)

    # round-trip floor
    @jax.jit
    def empty(x):
        return x + 1.0

    float(empty(jnp.float32(0)))
    rtt = median_time(lambda: float(empty(jnp.float32(0))), reps=10)
    print(f"relay round trip: {rtt * 1e3:.1f} ms")

    def report(label, run):
        run_c = float(run(table, idx))  # compile + warm
        total = median_time(lambda: float(run(table, idx)), reps=3)
        dt = max(total - rtt, 0.0) / args.reps
        print(f"{label}: {dt * 1e3:8.2f} ms/gather "
              f"({dt / args.n * 1e9:6.2f} ns/row, "
              f"{args.n * args.cols * 4 / dt / 1e9:6.1f} GB/s) "
              f"[checksum {run_c:.1f}]")
        return dt

    def report_n(label, run, n_eff, reps):
        run_c = float(run(table, idx[:n_eff]))  # compile + warm
        total = median_time(lambda: float(run(table, idx[:n_eff])), reps=3)
        dt = max(total - rtt, 0.0) / reps
        print(f"{label}: {dt * 1e3:8.3f} ms/gather "
              f"({dt / n_eff * 1e9:6.2f} ns/row, "
              f"{n_eff * args.cols * 4 / dt / 1e9:6.1f} GB/s) "
              f"[checksum {run_c:.1f}]")
        return dt

    xla_run = make_looped(lambda t, i: jnp.take(t, i, axis=0),
                          args.rows, args.reps)
    report_n(f"XLA take n={args.n}", xla_run, args.n, args.reps)

    # the Pallas path's scalar-prefetch indices cap n (SMEM); find a size
    # it compiles at and compare XLA at the SAME n
    ref_out = np.asarray(jax.jit(lambda t, i: jnp.take(t, i, axis=0))(
        table, idx[:4096]))
    n_p, reps_p = 1 << 15, 64
    xla_small = make_looped(lambda t, i: jnp.take(t, i, axis=0),
                            args.rows, reps_p)
    dt_x = report_n(f"XLA take n={n_p}", xla_small, n_p, reps_p)

    for tile, depth in ((512, 2), (512, 8), (2048, 8)):
        pg = functools.partial(pallas_gather, tile=tile, depth=depth)
        try:
            got = np.asarray(jax.jit(pg)(table, idx[:4096]))
            ok = np.allclose(got, ref_out)
            run_p = make_looped(pg, args.rows, reps_p)
            dt_p = report_n(f"Pallas t={tile:4d} d={depth}", run_p, n_p,
                            reps_p)
            print(f"   correct={ok}  vs XLA same-n: {dt_p / dt_x:.2f}x")
        except Exception as e:  # noqa: BLE001
            print(f"Pallas tile={tile} depth={depth}: FAILED "
                  f"{type(e).__name__}:\n{str(e)[:1500]}")


if __name__ == "__main__":
    main()
