"""Pallas TPU kernels for the Viterbi decoder.

The XLA `lax.scan` formulation (ops/viterbi.py) is latency-bound: the ACS
body is ~100 KFLOP but each of the T sequential steps pays ~2.4 µs of
per-step kernel overhead (measured on TPU v5e), putting a ~1.4 ms floor on a
576-step trellis regardless of formulation — and the traceback scan pays the
same floor again. Here the whole decode runs as TWO kernels whose sequential
grids keep all state in VMEM:

* forward ACS: path metrics in a (64, B) VMEM scratch (states on sublanes,
  batch on lanes), branch values streamed in and per-step decisions packed
  in-kernel into two uint32 words per lane (a sublane sum of disjoint bit
  weights) and streamed out — 8× less HBM than byte planes;
* traceback: runs the survivor walk backwards over the packed words with a
  reversed grid; every op is a (1, B) elementwise (the word select is a
  where(), the decision extraction a per-lane variable shift), the decoded
  bits are packed into one uint32 word per 32-step chunk.

Gather-free butterfly: predecessors of next-state s' are (s'>>1) and
(s'>>1)+32, so candidate planes are sublane-repeats of the two halves of the
current metric plane:

    cand0 = repeat(pm[0:32, :], 2, axis=0) + bm0   # pm[prev0(s')], s'=0..63
    cand1 = repeat(pm[32:64, :], 2, axis=0) + bm1

A register-exchange design (survivor bit histories exchanged alongside the
metrics, no traceback at all) was measured at 3.6 ms — the per-step exchange
of all 18 packed history words costs ~20× the metric work; the
packed-decision + traceback pair keeps the serial inner loops minimal.

Replaces the reference's sample-serial SSE2 decoder
(lib/viterbi_decoder.cc:99-294) as the TPU fast path; bit-identical to
ops.viterbi.viterbi_decode (tests/test_viterbi.py).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jrc_tpu.ops.viterbi import N_STATES, _trellis

LANE = 128
CHUNK_T = 32  # trellis steps per grid iteration = bits per packed word


@lru_cache(maxsize=1)
def _sign_tables():
    _, sa, sb = _trellis()
    return np.asarray(sa, np.float32), np.asarray(sb, np.float32)  # (64, 2)


def _fwd_kernel(va_ref, vb_ref, sa_ref, sb_ref, w0_ref, w1_ref, pm_out_ref,
                pm_ref, *, chunk_t: int, n_chunks: int):
    """Grid step i: advance pm (64, B) through chunk_t trellis steps,
    emitting packed decision words w0/w1 (chunk_t, B) uint32."""
    i = pl.program_id(0)
    b = pm_ref.shape[1]

    @pl.when(i == 0)
    def _():
        pm_ref[:, :] = jnp.full((N_STATES, b), 1e9, jnp.float32)
        pm_ref[0:1, :] = jnp.zeros((1, b), jnp.float32)

    sa0 = sa_ref[:, 0:1]  # (64, 1) expected-output signs, branch j=0
    sb0 = sb_ref[:, 0:1]
    sa1 = sa_ref[:, 1:2]
    sb1 = sb_ref[:, 1:2]
    # bit weight of state s within its half-word: 1 << (s % 32), as int32
    # (sum of disjoint powers of two == bitwise OR, sign bit included)
    srow = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, b), 0)
    weights = jnp.left_shift(jnp.int32(1), srow % 32)

    def body(t, _):
        va = va_ref[pl.ds(t, 1), :]  # (1, B)
        vb = vb_ref[pl.ds(t, 1), :]
        # branch cost: −(2e−1)·v  (negative when the value agrees with e)
        bm0 = -(sa0 * va + sb0 * vb)  # (64, B)
        bm1 = -(sa1 * va + sb1 * vb)
        pm = pm_ref[:, :]
        cand0 = jnp.repeat(pm[0:32, :], 2, axis=0) + bm0
        cand1 = jnp.repeat(pm[32:64, :], 2, axis=0) + bm1
        dec = cand1 < cand0  # True ⇒ take branch j=1
        pm_ref[:, :] = jnp.minimum(cand0, cand1)
        bits = jnp.where(dec, weights, 0)
        w0_ref[pl.ds(t, 1), :] = jax.lax.bitcast_convert_type(
            jnp.sum(bits[0:32, :], axis=0, keepdims=True), jnp.uint32
        )
        w1_ref[pl.ds(t, 1), :] = jax.lax.bitcast_convert_type(
            jnp.sum(bits[32:64, :], axis=0, keepdims=True), jnp.uint32
        )
        return 0

    jax.lax.fori_loop(0, chunk_t, body, 0, unroll=chunk_t)
    # renormalize once per chunk: a uniform shift never changes decisions
    pm_ref[:, :] = pm_ref[:, :] - pm_ref[0:1, :]

    @pl.when(i == n_chunks - 1)
    def _():
        pm_out_ref[:, :] = pm_ref[:, :]


def _tb_kernel(state0_ref, w0_ref, w1_ref, bits_ref, state_ref,
               *, chunk_t: int, n_chunks: int):
    """Reversed grid step i walks trellis chunk j = n_chunks−1−i backwards:
    per step all ops are (1, B) elementwise. Emits one packed uint32 word of
    decoded bits per chunk (bit t of word j = data bit j·chunk_t + t)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        state_ref[:, :] = state0_ref[:, :]

    def body(u, word):
        t = chunk_t - 1 - u
        state = state_ref[:, :]  # (1, B) int32
        w = jnp.where(state < 32, w0_ref[pl.ds(t, 1), :],
                      w1_ref[pl.ds(t, 1), :])
        amt = (state % 32).astype(jnp.uint32)
        j = (jnp.right_shift(w, amt) & 1).astype(jnp.int32)
        bit = (state & 1).astype(jnp.uint32)
        word = word | jnp.left_shift(bit, jnp.uint32(t))
        state_ref[:, :] = (state >> 1) + 32 * j
        return word

    b = state_ref.shape[1]
    word = jax.lax.fori_loop(
        0, chunk_t, body, jnp.zeros((1, b), jnp.uint32), unroll=chunk_t
    )
    bits_ref[pl.ds(n_chunks - 1 - i, 1), :] = word


def viterbi_decode_pallas(
    values: jax.Array, n_out: int | None = None, interpret: bool = False
) -> jax.Array:
    """Full Viterbi decode via the Pallas forward + traceback kernel pair.

    (…, 2T) channel values → (…, T) bits; same conventions and output as
    ops.viterbi.viterbi_decode (bit-identical modulo equal-metric ties).
    The trellis is zero-padded (zero = erasure) to a CHUNK_T multiple and
    the batch to a lane multiple; erasure steps leave optimal path metrics
    and the decoded bits of real steps intact.
    """
    batch_shape = values.shape[:-1]
    t_steps = values.shape[-1] // 2
    v = values.reshape(-1, 2 * t_steps).astype(jnp.float32)
    B = v.shape[0]
    n_chunks = -(-t_steps // CHUNK_T)
    t_pad = n_chunks * CHUNK_T
    b_pad = -(-B // LANE) * LANE

    v = v.reshape(B, t_steps, 2)
    v = jnp.pad(v, ((0, b_pad - B), (0, t_pad - t_steps), (0, 0)))
    va = jnp.transpose(v[:, :, 0])  # (T', B')
    vb = jnp.transpose(v[:, :, 1])
    sa, sb = _sign_tables()

    def spec(shape, index_map):
        if interpret:
            return pl.BlockSpec(shape, index_map)
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    w0, w1, pm = pl.pallas_call(
        partial(_fwd_kernel, chunk_t=CHUNK_T, n_chunks=n_chunks),
        grid=(n_chunks,),
        in_specs=[
            spec((CHUNK_T, b_pad), lambda i: (i, 0)),
            spec((CHUNK_T, b_pad), lambda i: (i, 0)),
            spec((N_STATES, 2), lambda i: (0, 0)),
            spec((N_STATES, 2), lambda i: (0, 0)),
        ],
        out_specs=[
            spec((CHUNK_T, b_pad), lambda i: (i, 0)),
            spec((CHUNK_T, b_pad), lambda i: (i, 0)),
            spec((N_STATES, b_pad), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b_pad), jnp.uint32),
            jax.ShapeDtypeStruct((t_pad, b_pad), jnp.uint32),
            jax.ShapeDtypeStruct((N_STATES, b_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N_STATES, b_pad), jnp.float32)],
        interpret=interpret,
    )(va, vb, jnp.asarray(sa), jnp.asarray(sb))

    end_state = jnp.argmin(pm, axis=0).astype(jnp.int32)[None, :]  # (1, B')

    words = pl.pallas_call(
        partial(_tb_kernel, chunk_t=CHUNK_T, n_chunks=n_chunks),
        grid=(n_chunks,),
        in_specs=[
            spec((1, b_pad), lambda i: (0, 0)),
            spec((CHUNK_T, b_pad), lambda i: (n_chunks - 1 - i, 0)),
            spec((CHUNK_T, b_pad), lambda i: (n_chunks - 1 - i, 0)),
        ],
        # the (n_chunks, B) word table stays resident; rows are written by
        # dynamic index (a (1, B) block would violate the 8-sublane rule)
        out_specs=spec((n_chunks, b_pad), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_chunks, b_pad), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((1, b_pad), jnp.int32)],
        interpret=interpret,
    )(end_state, w0, w1)

    # unpack words (n_chunks, B') → bits (B, T)
    w = jnp.transpose(words[:, :B])  # (B, n_chunks)
    shifts = jnp.arange(CHUNK_T, dtype=jnp.uint32)
    bits = ((w[:, :, None] >> shifts[None, None, :]) & 1).astype(jnp.uint8)
    bits = bits.reshape(B, n_chunks * CHUNK_T)[:, :t_steps]
    bits = bits.reshape(*batch_shape, t_steps)
    if n_out is not None:
        bits = bits[..., :n_out]
    return bits
