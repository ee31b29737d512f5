"""Standalone timing of the two suspect kernels: gather_rows, viterbi_pallas."""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from jrc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from jrc_tpu.ops import cplx as cx
from jrc_tpu.ops.gather_pallas import gather_rows
from jrc_tpu.ops.viterbi_pallas import viterbi_decode_pallas
from jrc_tpu.ops.viterbi import viterbi_decode

N = (1 << 23) + 8192
B = 3072


def timeit(name, f, *args, n_iter=10):
    t0 = time.time()
    out = jax.block_until_ready(f(*args))
    tc = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(n_iter):
            o = f(*args)
        jax.block_until_ready(o)
        times.append((time.time() - t0) / n_iter)
    dt = min(times)
    print(f"{name:36s} {dt*1e3:8.2f} ms  compile {tc:.1f}s")
    return out


def main():
    dev = jax.devices()[0]
    probe = jax.device_put(np.ones((1, 1), np.float32), dev)
    np.asarray(jax.jit(lambda v: v + 1.0)(probe))
    rng = np.random.default_rng(0)

    x = jax.device_put(cx.CArray(
        rng.normal(0, 1, N).astype(np.float32),
        rng.normal(0, 1, N).astype(np.float32)), dev)
    starts = jax.device_put(
        rng.integers(0, N - 4000, B).astype(np.int32), dev)

    for width in (511, 976, 3328):
        f = jax.jit(lambda xx, ss, w=width: gather_rows(xx, ss, w).re.sum().reshape(1, 1))
        timeit(f"gather_rows B={B} width={width}", f, x, starts)

    for t_bits in (576, 864):
        vals = jax.device_put(
            rng.normal(0, 1, (B, 2 * t_bits)).astype(np.float32), dev)
        f = jax.jit(lambda v: viterbi_decode_pallas(v).astype(jnp.float32).sum().reshape(1, 1))
        timeit(f"viterbi_pallas B={B} T={t_bits}", f, vals)


if __name__ == "__main__":
    main()
