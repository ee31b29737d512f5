"""Microbenchmark the detection front-end components on the TPU."""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from jrc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from jrc_tpu.config import OFDMConfig
from jrc_tpu.ops import cplx as cx, sync
from jrc_tpu.ops.detect_pallas import detect_front_end

N = (1 << 21) + 8192  # ~ capture size
BLOCK_LEN = 1 << 15
N_BLOCKS = 64


def timeit(name, f, x, n_iter=20):
    t0 = time.time()
    out = jax.block_until_ready(f(x))
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(n_iter):
        o = f(x)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / n_iter
    print(f"{name:28s} {dt*1e3:8.3f} ms ({N/dt/1e6:8.1f} Msps) compile {tc:.1f}s")
    return out


def main():
    cfg = OFDMConfig()
    dev = jax.devices()[0]
    probe = jax.device_put(np.ones((1, 1), np.float32), dev)
    np.asarray(jax.jit(lambda v: v + 1.0)(probe))

    rng = np.random.default_rng(0)
    xr = rng.normal(0, 1, N).astype(np.float32)
    xi = rng.normal(0, 1, N).astype(np.float32)
    x = jax.device_put(cx.CArray(xr, xi), dev)

    # raw memory floor: one elementwise pass
    timeit("1-pass elementwise", jax.jit(lambda v: (v.re * 2 + v.im).sum().reshape(1, 1)), x)

    # pallas front-end alone
    fe = jax.jit(lambda v: [o.sum().reshape(1, 1) for o in detect_front_end(
        v.re, v.im, threshold=0.6, min_n_peaks=10,
        max_peak_distance=2 * cfg.sym_len, lag=cfg.fft_len // 4,
        win=cfg.fft_len // 2, pwin=int(1.5 * (cfg.fft_len // 2)),
    )][0])
    timeit("pallas detect_front_end", fe, x)

    # full detect_frames_stream
    own_lo = 512
    def det(v):
        d = sync.detect_frames_stream(cfg, v, BLOCK_LEN, N_BLOCKS, own_lo, max_frames=12)
        return jnp.sum(d.start.astype(jnp.float32)).reshape(1, 1)
    timeit("detect_frames_stream", jax.jit(det), x)

    # XLA (non-pallas) formulation for comparison: autocorrelation
    def auto(v):
        a, cor = sync.autocorrelation(cfg, v)
        return (a.re.sum() + cor.sum()).reshape(1, 1)
    timeit("XLA autocorrelation", jax.jit(auto), x)


if __name__ == "__main__":
    main()
