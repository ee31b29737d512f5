"""Pallas TPU kernel for the Viterbi add-compare-select recursion.

The XLA `lax.scan` formulation (ops/viterbi.py) pays per-step dispatch
overhead; this kernel keeps the whole trellis walk in VMEM — path metrics in
registers/VMEM, branch metrics streamed, decisions written as packed words —
one grid program per batch element.

Gather-free butterfly formulation: predecessors of next-state s' are
(s'>>1) and (s'>>1)+32, so the two candidate metric vectors are element-
repeats of the two halves of the current metric vector:

    cand0 = repeat(pm[0:32], 2)   # pm[prev0(s')] for s' = 0..63
    cand1 = repeat(pm[32:64], 2)  # pm[prev1(s')]

The kernel is validated in interpreter mode on CPU (tests) and is the
drop-in TPU fast path for `viterbi_decode`'s forward pass.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from jrc_tpu.ops.viterbi import N_STATES, _trellis


@lru_cache(maxsize=1)
def _sign_tables():
    _, sa, sb = _trellis()
    return np.asarray(sa, np.float32), np.asarray(sb, np.float32)  # (64, 2)


def _acs_kernel(v_ref, sa_ref, sb_ref, pm_ref, dec_ref, *, t_steps: int):
    """One batch element: v (T, 2) → final metrics (1, 64) + decisions (T, 64) uint8."""
    import jax.numpy as jnp

    pm0 = jnp.full((1, N_STATES), 1e9, jnp.float32).at[0, 0].set(0.0)
    sa = sa_ref[:, :]  # (64, 2)
    sb = sb_ref[:, :]

    def body(t, pm):
        va = v_ref[t, 0]
        vb = v_ref[t, 1]
        bm = -(sa * va + sb * vb)  # (64, 2)
        low = pm[0, :32]
        high = pm[0, 32:]
        cand0 = jnp.repeat(low, 2, total_repeat_length=N_STATES) + bm[:, 0]
        cand1 = jnp.repeat(high, 2, total_repeat_length=N_STATES) + bm[:, 1]
        dec = cand1 < cand0
        new = jnp.where(dec, cand1, cand0)
        new = new - jnp.min(new)
        dec_ref[t, :] = dec.astype(jnp.uint8)
        return new[None, :]

    pm_ref[:, :] = jax.lax.fori_loop(0, t_steps, body, pm0)


def acs_forward_pallas(values: jax.Array, interpret: bool = False):
    """Forward ACS for (B, 2T) channel values → (pm_final (B, 64),
    decisions (B, T, 64) uint8). Grid = batch."""
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except ImportError:  # pragma: no cover
        vmem = None

    B = values.shape[0]
    t_steps = values.shape[-1] // 2
    v = values.reshape(B, t_steps, 2).astype(jnp.float32)
    sa, sb = _sign_tables()

    kernel = partial(_acs_kernel, t_steps=t_steps)

    def mk_spec(shape, index_map):
        if vmem is None or interpret:
            return pl.BlockSpec(shape, index_map)
        return pl.BlockSpec(shape, index_map, memory_space=vmem)

    pm, dec = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            mk_spec((None, t_steps, 2), lambda b: (b, 0, 0)),
            mk_spec((N_STATES, 2), lambda b: (0, 0)),
            mk_spec((N_STATES, 2), lambda b: (0, 0)),
        ],
        out_specs=[
            mk_spec((None, 1, N_STATES), lambda b: (b, 0, 0)),
            mk_spec((None, t_steps, N_STATES), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, N_STATES), jnp.float32),
            jax.ShapeDtypeStruct((B, t_steps, N_STATES), jnp.uint8),
        ],
        interpret=interpret,
    )(v, jnp.asarray(sa), jnp.asarray(sb))
    return pm[:, 0, :], dec


def viterbi_decode_pallas(
    values: jax.Array, n_out: int | None = None, interpret: bool = False
) -> jax.Array:
    """Full decode using the Pallas forward pass + XLA traceback.

    Bit-identical to ops.viterbi.viterbi_decode.
    """
    batch_shape = values.shape[:-1]
    t_steps = values.shape[-1] // 2
    v = values.reshape(-1, 2 * t_steps)
    pm_final, dec = acs_forward_pallas(v, interpret=interpret)
    end_state = jnp.argmin(pm_final, axis=-1).astype(jnp.int32)

    dec_t = jnp.moveaxis(dec, 1, 0)  # (T, B, 64)

    def traceback(state, dec_step):
        d = jnp.take_along_axis(dec_step, state[:, None], axis=-1)[:, 0]
        bit = (state & 1).astype(jnp.uint8)
        prev_state = (state >> 1) + 32 * d.astype(jnp.int32)
        return prev_state, bit

    _, bits_rev = jax.lax.scan(traceback, end_state, dec_t, reverse=True, unroll=8)
    bits = jnp.moveaxis(bits_rev, 0, 1).reshape(*batch_shape, t_steps)
    if n_out is not None:
        bits = bits[..., :n_out]
    return bits
