"""Is per-execution overhead or bandwidth dominating? Time an elementwise
pass at several sizes, plus an empty-ish program."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from jrc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def timeit(name, f, x, n_iter=50):
    t0 = time.time()
    out = jax.block_until_ready(f(x))
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(n_iter):
        o = f(x)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / n_iter
    print(f"{name:28s} {dt*1e3:8.3f} ms  compile {tc:.1f}s")


def main():
    dev = jax.devices()[0]
    probe = jax.device_put(np.ones((1, 1), np.float32), dev)
    np.asarray(jax.jit(lambda v: v + 1.0)(probe))

    tiny = jax.device_put(np.ones((8, 128), np.float32), dev)
    timeit("tiny add", jax.jit(lambda v: v + 1.0), tiny)

    for logn in (18, 20, 21, 23):
        n = 1 << logn
        x = jax.device_put(np.ones(n, np.float32), dev)
        timeit(f"sum reduce n=2^{logn}", jax.jit(lambda v: (v * 2).sum().reshape(1, 1)), x)

    # chained: 10 dependent executions inside one jit vs 10 dispatches
    x = jax.device_put(np.ones(1 << 21, np.float32), dev)

    def chain(v):
        s = jnp.float32(0)
        for k in range(10):
            s = s + (v * (k + 1.0)).sum()
        return s.reshape(1, 1)

    timeit("10 passes in ONE jit", jax.jit(chain), x)


if __name__ == "__main__":
    main()
