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


def pallas_gather(table, idx, tile: int = 512):
    """Gather table[idx] via per-row DMA, double-buffered, tiled over idx."""
    n = idx.shape[0]
    r, c = table.shape
    assert n % tile == 0

    def kernel(idx_ref, table_ref, out_ref):
        def body(scratch, sems):
            def get_dma(slot, row_i):
                # scalar read from the prefetched (SMEM) index array: must
                # index down to a single element, not an SMEM vector
                row = idx_ref[pl.program_id(0), row_i]
                return pltpu.make_async_copy(
                    table_ref.at[row],
                    scratch.at[slot],
                    sems.at[slot],
                )

            get_dma(0, 0).start()

            def loop(i, _):
                slot = i % 2

                @pl.when(i + 1 < tile)
                def _():
                    get_dma((i + 1) % 2, i + 1).start()

                get_dma(slot, i).wait()
                out_ref[i, :] = scratch[slot]
                return 0

            jax.lax.fori_loop(0, tile, loop, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2, c), table.dtype),
            sems=pltpu.SemaphoreType.DMA((2,)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table in HBM
        out_specs=pl.BlockSpec((tile, c), lambda i, idx_ref: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c), table.dtype),
    )(idx.reshape(n // tile, tile), table)


def timeit(fn, *args, n=10, label=""):
    def pull(o):  # force completion: block_until_ready is unreliable
        return float(jnp.sum(o[:8, :8]))  # through the axon relay

    out = fn(*args)
    pull(out)
    x = jnp.ones((8,))
    float(jnp.sum(x))
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.sum(x + 1.0))
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    pull(out)  # same-stream ordering: all n executions completed
    dt = ((time.perf_counter() - t0) - rtt) / n
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=90000,
                    help="table rows (300^2 packed plane)")
    ap.add_argument("--cols", type=int, default=256,
                    help="row width (4 texels x 64 packed channels)")
    ap.add_argument("--n", type=int, default=1 << 21,
                    help="gathered rows (a 2M-slot compaction buffer)")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (args.rows, args.cols), jnp.float32)
    idx = jax.random.randint(key, (args.n,), 0, args.rows, jnp.int32)

    xla = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    out_x, dt_x = timeit(xla, table, idx, label="xla")
    print(f"XLA take:      {dt_x * 1e3:8.2f} ms "
          f"({dt_x / args.n * 1e9:6.2f} ns/row, "
          f"{args.n * args.cols * 4 / dt_x / 1e9:6.1f} GB/s)")

    for tile in (512, 2048):
        pg = jax.jit(functools.partial(pallas_gather, tile=tile))
        try:
            out_p, dt_p = timeit(pg, table, idx, n=3)
        except Exception as e:  # noqa: BLE001
            print(f"Pallas tile={tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        ok = bool(jnp.allclose(out_p[:4096], out_x[:4096]))
        print(f"Pallas tile={tile}: {dt_p * 1e3:8.2f} ms "
              f"({dt_p / args.n * 1e9:6.2f} ns/row) correct={ok}")


if __name__ == "__main__":
    main()
