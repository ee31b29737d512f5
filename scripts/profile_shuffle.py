"""Cost of candidate sublane-shuffle primitives inside a pallas kernel:
repeat vs stack-interleave vs concat vs roll, 864 iterations on (64, 3072)."""
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

B = 3072
STEPS = 864
CHUNK = 32


def make(variant):
    def kern(x_ref, out_ref, pm_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            pm_ref[:, :] = x_ref[:, :]

        def body(t, _):
            pm = pm_ref[:, :]
            if variant == "baseline":
                y = pm + 1.0
            elif variant == "repeat2":
                y = (jnp.repeat(pm[0:32, :], 2, axis=0)
                     + jnp.repeat(pm[32:64, :], 2, axis=0))
            elif variant == "interleave":
                a = pm[0:16, :]
                bq = pm[16:32, :]
                y0 = jnp.stack([a, bq], axis=1).reshape(32, B)
                a2 = pm[32:48, :]
                b2 = pm[48:64, :]
                y1 = jnp.stack([a2, b2], axis=1).reshape(32, B)
                y = jnp.concatenate([y0, y1], axis=0)
            elif variant == "concat":
                y = jnp.concatenate([pm[32:64, :], pm[0:32, :]], axis=0)
            elif variant == "halves":
                # pure half-plane elementwise (the Pease inner math)
                a = pm[0:32, :]
                bq = pm[32:64, :]
                e = jnp.minimum(a + 1.0, bq + 2.0)
                o = jnp.minimum(a - 1.0, bq - 2.0)
                y = jnp.concatenate([e, o], axis=0)
            elif variant == "roll8":
                y = pltpu.roll(pm, shift=8, axis=0)
            pm_ref[:, :] = y * 0.5
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0, unroll=CHUNK)

        @pl.when(i == STEPS // CHUNK - 1)
        def _():
            out_ref[:, :] = pm_ref[:, :]

    def f(x):
        return pl.pallas_call(
            kern,
            grid=(STEPS // CHUNK,),
            in_specs=[pl.BlockSpec((64, B), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((64, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64, B), jnp.float32),
            scratch_shapes=[pltpu.VMEM((64, B), jnp.float32)],
        )(x).sum().reshape(1, 1)

    return jax.jit(f)


def main():
    dev = jax.devices()[0]
    probe = jax.device_put(np.ones((1, 1), np.float32), dev)
    np.asarray(jax.jit(lambda v: v + 1.0)(probe))
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(0, 1, (64, B)).astype(np.float32), dev)

    for variant in ("baseline", "repeat2", "interleave", "concat", "halves", "roll8"):
        f = make(variant)
        t0 = time.time()
        jax.block_until_ready(f(x))
        tc = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(10):
                o = f(x)
            jax.block_until_ready(o)
            times.append((time.time() - t0) / 10)
        print(f"{variant:12s} {min(times)*1e3:8.2f} ms ({STEPS} steps)  compile {tc:.1f}s")


if __name__ == "__main__":
    main()
