"""Split gather_rows per-row cost: DMA issue vs dynamic lane-roll vs write."""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from jrc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jrc_tpu.ops import cplx as cx

GROUP = 32
LANE = 128
B = 3072
N = (1 << 23) + 8192
WIDTH = 3328


def make(variant, width):
    w_out = -(-width // LANE) * LANE
    w_fetch = w_out + LANE

    def kern(starts_ref, x_ref, out_ref, scratch, sems):
        i = pl.program_id(0)
        copies = []
        for g in range(GROUP):
            s = starts_ref[i * GROUP + g]
            s0 = pl.multiple_of((s // LANE) * LANE, LANE)
            if variant == "noroll_nodma":
                continue
            dma = pltpu.make_async_copy(
                x_ref.at[:, pl.ds(s0, w_fetch)], scratch.at[g], sems.at[g])
            dma.start()
            copies.append(dma)
        for g in range(GROUP):
            if variant != "noroll_nodma":
                copies[g].wait()
            if variant == "full":
                r = starts_ref[i * GROUP + g] % LANE
                rolled = pltpu.roll(scratch[g], shift=w_fetch - r, axis=1)
                out_ref[g] = rolled[:, :w_out]
            elif variant == "noroll":
                out_ref[g] = scratch[g][:, :w_out]
            elif variant == "noroll_nodma":
                out_ref[g] = scratch[g][:, :w_out]

    def f(x, starts):
        starts = jnp.clip(starts.astype(jnp.int32), 0, N - width)
        b_pad = -(-B // GROUP) * GROUP
        starts_p = jnp.pad(starts, (0, b_pad - B))
        xs = jnp.stack([x.re, x.im])
        xs = jnp.pad(xs, ((0, 0), (0, w_fetch)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b_pad // GROUP,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((GROUP, 2, w_out), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((GROUP, 2, w_fetch), jnp.float32),
                pltpu.SemaphoreType.DMA((GROUP,)),
            ],
        )
        out = pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b_pad, 2, w_out), jnp.float32),
        )(starts_p, xs)
        return out[:, 0, :8].sum().reshape(1, 1)

    return jax.jit(f)


def main():
    dev = jax.devices()[0]
    probe = jax.device_put(np.ones((1, 1), np.float32), dev)
    np.asarray(jax.jit(lambda v: v + 1.0)(probe))
    rng = np.random.default_rng(0)
    x = jax.device_put(cx.CArray(
        rng.normal(0, 1, N).astype(np.float32),
        rng.normal(0, 1, N).astype(np.float32)), dev)
    starts = jax.device_put(rng.integers(0, N - 4000, B).astype(np.int32), dev)

    for variant in ("full", "noroll", "noroll_nodma"):
        f = make(variant, WIDTH)
        t0 = time.time()
        jax.block_until_ready(f(x, starts))
        tc = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(10):
                o = f(x, starts)
            jax.block_until_ready(o)
            times.append((time.time() - t0) / 10)
        print(f"{variant:14s} {min(times)*1e3:8.2f} ms  compile {tc:.1f}s")


if __name__ == "__main__":
    main()
