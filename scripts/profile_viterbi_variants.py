"""Isolate the cost of each piece of the viterbi_pallas forward kernel.

Variants (same grid/IO structure, different bodies — results are wrong for
all but 'full'; timing only):
  full      — current production body
  nopack    — skip decision packing (no w0/w1 sublane sums)
  norepeat  — replace sublane repeat with a plain slice (wrong but cheap)
  noacs     — only streams va/vb in and writes constants out (IO floor)
"""
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
from jrc_tpu.ops.viterbi import N_STATES
from jrc_tpu.ops.viterbi_pallas import _sign_tables, LANE
CHUNK_T = 32

B = 3072
T = 864


def make_kernel(variant, chunk_t, n_chunks):
    def kern(va_ref, vb_ref, sa_ref, sb_ref, w0_ref, w1_ref, pm_out_ref, pm_ref):
        i = pl.program_id(0)
        b = pm_ref.shape[1]

        @pl.when(i == 0)
        def _():
            pm_ref[:, :] = jnp.full((N_STATES, b), 1e9, jnp.float32)
            pm_ref[0:1, :] = jnp.zeros((1, b), jnp.float32)

        sa0 = sa_ref[:, 0:1]
        sb0 = sb_ref[:, 0:1]
        sa1 = sa_ref[:, 1:2]
        sb1 = sb_ref[:, 1:2]
        srow = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, b), 0)
        weights = jnp.left_shift(jnp.int32(1), srow % 32)

        def body(t, _):
            va = va_ref[pl.ds(t, 1), :]
            vb = vb_ref[pl.ds(t, 1), :]
            if variant == "noacs":
                w0_ref[pl.ds(t, 1), :] = jax.lax.bitcast_convert_type(
                    jnp.sum(va + vb, axis=0, keepdims=True).astype(jnp.int32), jnp.uint32)
                w1_ref[pl.ds(t, 1), :] = w0_ref[pl.ds(t, 1), :]
                return 0
            bm0 = -(sa0 * va + sb0 * vb)
            bm1 = -(sa1 * va + sb1 * vb)
            pm = pm_ref[:, :]
            if variant == "norepeat":
                cand0 = pm + bm0
                cand1 = pm + bm1
            else:
                cand0 = jnp.repeat(pm[0:32, :], 2, axis=0) + bm0
                cand1 = jnp.repeat(pm[32:64, :], 2, axis=0) + bm1
            dec = cand1 < cand0
            pm_ref[:, :] = jnp.minimum(cand0, cand1)
            if variant == "nopack":
                w0_ref[pl.ds(t, 1), :] = jax.lax.bitcast_convert_type(
                    jnp.sum(jnp.where(dec, 1, 0)[0:1, :], axis=0, keepdims=True), jnp.uint32)
                w1_ref[pl.ds(t, 1), :] = w0_ref[pl.ds(t, 1), :]
                return 0
            bits = jnp.where(dec, weights, 0)
            w0_ref[pl.ds(t, 1), :] = jax.lax.bitcast_convert_type(
                jnp.sum(bits[0:32, :], axis=0, keepdims=True), jnp.uint32)
            w1_ref[pl.ds(t, 1), :] = jax.lax.bitcast_convert_type(
                jnp.sum(bits[32:64, :], axis=0, keepdims=True), jnp.uint32)
            return 0

        jax.lax.fori_loop(0, chunk_t, body, 0, unroll=chunk_t)
        pm_ref[:, :] = pm_ref[:, :] - pm_ref[0:1, :]

        @pl.when(i == n_chunks - 1)
        def _():
            pm_out_ref[:, :] = pm_ref[:, :]

    return kern


def run_variant(variant, va, vb, chunk_t=CHUNK_T):
    t_steps = va.shape[0]
    n_chunks = t_steps // chunk_t
    b_pad = va.shape[1]
    sa, sb = _sign_tables()

    def spec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    def f(va, vb):
        w0, w1, pm = pl.pallas_call(
            make_kernel(variant, chunk_t, n_chunks),
            grid=(n_chunks,),
            in_specs=[
                spec((chunk_t, b_pad), lambda i: (i, 0)),
                spec((chunk_t, b_pad), lambda i: (i, 0)),
                spec((N_STATES, 2), lambda i: (0, 0)),
                spec((N_STATES, 2), lambda i: (0, 0)),
            ],
            out_specs=[
                spec((chunk_t, b_pad), lambda i: (i, 0)),
                spec((chunk_t, b_pad), lambda i: (i, 0)),
                spec((N_STATES, b_pad), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((t_steps, b_pad), jnp.uint32),
                jax.ShapeDtypeStruct((t_steps, b_pad), jnp.uint32),
                jax.ShapeDtypeStruct((N_STATES, b_pad), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((N_STATES, b_pad), jnp.float32)],
        )(va, vb, jnp.asarray(sa), jnp.asarray(sb))
        return pm.sum().reshape(1, 1)

    return jax.jit(f)


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
    print(f"{name:34s} {dt*1e3:8.2f} ms  compile {tc:5.1f}s")


def main():
    dev = jax.devices()[0]
    probe = jax.device_put(np.ones((1, 1), np.float32), dev)
    np.asarray(jax.jit(lambda v: v + 1.0)(probe))
    rng = np.random.default_rng(0)
    t_pad = -(-T // CHUNK_T) * CHUNK_T
    va = jax.device_put(rng.normal(0, 1, (t_pad, B)).astype(np.float32), dev)
    vb = jax.device_put(rng.normal(0, 1, (t_pad, B)).astype(np.float32), dev)

    for variant in ("noacs", "norepeat", "nopack", "full"):
        timeit(f"fwd[{variant}] T={t_pad} B={B}", run_variant(variant, va, vb), va, vb)
    for chunk_t in (16, 64):
        t_pad2 = -(-T // chunk_t) * chunk_t
        va2 = jax.device_put(rng.normal(0, 1, (t_pad2, B)).astype(np.float32), dev)
        vb2 = jax.device_put(rng.normal(0, 1, (t_pad2, B)).astype(np.float32), dev)
        timeit(f"fwd[full] chunk_t={chunk_t}", run_variant("full", va2, vb2, chunk_t), va2, vb2)


if __name__ == "__main__":
    main()
