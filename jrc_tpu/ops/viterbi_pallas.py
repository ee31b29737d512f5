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

Shuffle-light butterfly: predecessors of next-state s' are (s'>>1) and
(s'>>1)+32, and the output pair (2u, 2u+1) shares the input pair
(pm[u], pm[u+32]) — so the ACS runs on half-planes with PLAIN slices as
inputs (lo = pm[0:32], hi = pm[32:64]) producing separate even/odd output
planes, and pays ONE write-side sublane interleave to restore state order:

    new_e = min(lo + bm0_even, hi + bm1_even)   # states 0,2,…,62
    new_o = min(lo + bm0_odd,  hi + bm1_odd)    # states 1,3,…,63
    pm    = interleave(new_e, new_o)

The earlier formulation used two read-side `jnp.repeat`s over sublanes,
which Mosaic lowers as per-sublane selects — measured ~40% of kernel
runtime; the single interleave halves that shuffle traffic. A
register-exchange design (survivor bit histories exchanged alongside the
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
GRID_T = 16  # trellis steps per grid iteration = bits used per packed
#              uint32 word (body is fully unrolled — 16 keeps Mosaic
#              compile ~3× faster than 32 at equal runtime)


@lru_cache(maxsize=1)
def _sign_tables():
    _, sa, sb = _trellis()
    return np.asarray(sa, np.float32), np.asarray(sb, np.float32)  # (64, 2)


@lru_cache(maxsize=1)
def _halfplane_tables():
    """Even/odd-output sign tables + packing weights for the half-plane ACS.

    Output states are computed as two (32, B) planes — evens (s'=2u) and
    odds (s'=2u+1); both read the SAME input planes pm[0:32] / pm[32:64]
    (plain slices, no sublane repeat — the two `jnp.repeat`s were ~40% of the
    forward kernel's runtime). The stacked [evens; odds] decision plane has
    row u ↔ state 2u and row 32+u ↔ state 2u+1, so bit weights/group sums
    are taken against that permuted state order.
    """
    sa, sb = _sign_tables()
    cols = []
    for plane, sel in (("e", slice(0, 64, 2)), ("o", slice(1, 64, 2))):
        for j in (0, 1):
            cols.append(sa[sel, j])
            cols.append(sb[sel, j])
    # column order: sa0e, sb0e, sa1e, sb1e, sa0o, sb0o, sa1o, sb1o
    tabs = np.stack(cols, axis=1).astype(np.float32)  # (32, 8)
    # row r of the stacked decision plane corresponds to this state:
    state_of_row = np.concatenate(
        [np.arange(32) * 2, np.arange(32) * 2 + 1]
    ).astype(np.int32)
    lo_rows = np.where(state_of_row < 32)[0]  # rows feeding word w0
    # states 0..31 ↔ rows 0..15 (evens) and 32..47 (odds); 32..63 ↔ the rest
    assert lo_rows.tolist() == list(range(16)) + list(range(32, 48))
    return tabs


def _fwd_kernel(va_ref, vb_ref, tabs_ref, w0_ref, w1_ref, pm_out_ref,
                pm_ref, *, chunk_t: int, n_chunks: int):
    """Grid step i: advance pm (64, B) through chunk_t trellis steps,
    emitting packed decision words w0/w1 (chunk_t, B) uint32 (w0 = states
    0..31, w1 = 32..63)."""
    i = pl.program_id(0)
    b = pm_ref.shape[1]

    @pl.when(i == 0)
    def _():
        pm_ref[:, :] = jnp.full((N_STATES, b), 1e9, jnp.float32)
        pm_ref[0:1, :] = jnp.zeros((1, b), jnp.float32)

    names = ("sa0e", "sb0e", "sa1e", "sb1e", "sa0o", "sb0o", "sa1o", "sb1o")
    c = {k: tabs_ref[:, j : j + 1] for j, k in enumerate(names)}
    srow = jax.lax.broadcasted_iota(jnp.int32, (N_STATES, b), 0)
    state_of_row = jnp.where(srow < 32, 2 * srow, 2 * (srow - 32) + 1)
    weights = jnp.left_shift(jnp.int32(1), state_of_row % 32)

    def body(t, _):
        va = va_ref[pl.ds(t, 1), :]  # (1, B)
        vb = vb_ref[pl.ds(t, 1), :]
        pm = pm_ref[:, :]
        lo = pm[0:32, :]  # pm[s'>>1] for every output pair (2u, 2u+1)
        hi = pm[32:64, :]  # pm[(s'>>1)+32]
        # branch cost: −(2e−1)·v  (negative when the value agrees with e)
        cand0e = lo - (c["sa0e"] * va + c["sb0e"] * vb)
        cand1e = hi - (c["sa1e"] * va + c["sb1e"] * vb)
        cand0o = lo - (c["sa0o"] * va + c["sb0o"] * vb)
        cand1o = hi - (c["sa1o"] * va + c["sb1o"] * vb)
        dec_e = cand1e < cand0e  # True ⇒ take branch j=1
        dec_o = cand1o < cand0o
        new_e = jnp.minimum(cand0e, cand1e)  # states 0,2,…,62 in u-order
        new_o = jnp.minimum(cand0o, cand1o)  # states 1,3,…,63
        # one write-side interleave replaces the two read-side repeats
        pm_ref[:, :] = jnp.stack([new_e, new_o], axis=1).reshape(N_STATES, b)
        dec = jnp.concatenate([dec_e, dec_o], axis=0)  # row r ↔ state_of_row
        bits = jnp.where(dec, weights, 0)
        # states 0..31 live in rows [0:16] ∪ [32:48] of the stacked plane
        w0 = (jnp.sum(bits[0:16, :], axis=0, keepdims=True)
              + jnp.sum(bits[32:48, :], axis=0, keepdims=True))
        w1 = (jnp.sum(bits[16:32, :], axis=0, keepdims=True)
              + jnp.sum(bits[48:64, :], axis=0, keepdims=True))
        w0_ref[pl.ds(t, 1), :] = jax.lax.bitcast_convert_type(w0, jnp.uint32)
        w1_ref[pl.ds(t, 1), :] = jax.lax.bitcast_convert_type(w1, jnp.uint32)
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
    The trellis is zero-padded (zero = erasure) to a GRID_T multiple and
    the batch to a lane multiple; erasure steps leave optimal path metrics
    and the decoded bits of real steps intact.
    """
    batch_shape = values.shape[:-1]
    t_steps = values.shape[-1] // 2
    v = values.reshape(-1, 2 * t_steps).astype(jnp.float32)
    B = v.shape[0]
    n_chunks = -(-t_steps // GRID_T)
    t_pad = n_chunks * GRID_T
    b_pad = -(-B // LANE) * LANE

    v = v.reshape(B, t_steps, 2)
    v = jnp.pad(v, ((0, b_pad - B), (0, t_pad - t_steps), (0, 0)))
    va = jnp.transpose(v[:, :, 0])  # (T', B')
    vb = jnp.transpose(v[:, :, 1])

    def spec(shape, index_map):
        if interpret:
            return pl.BlockSpec(shape, index_map)
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    w0, w1, pm = pl.pallas_call(
        partial(_fwd_kernel, chunk_t=GRID_T, n_chunks=n_chunks),
        grid=(n_chunks,),
        in_specs=[
            spec((GRID_T, b_pad), lambda i: (i, 0)),
            spec((GRID_T, b_pad), lambda i: (i, 0)),
            spec((32, 8), lambda i: (0, 0)),
        ],
        out_specs=[
            spec((GRID_T, b_pad), lambda i: (i, 0)),
            spec((GRID_T, b_pad), lambda i: (i, 0)),
            spec((N_STATES, b_pad), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b_pad), jnp.uint32),
            jax.ShapeDtypeStruct((t_pad, b_pad), jnp.uint32),
            jax.ShapeDtypeStruct((N_STATES, b_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N_STATES, b_pad), jnp.float32)],
        interpret=interpret,
    )(va, vb, jnp.asarray(_halfplane_tables()))

    # the write-side interleave keeps pm in standard state order
    end_state = jnp.argmin(pm, axis=0).astype(jnp.int32)[None, :]  # (1, B')

    words = pl.pallas_call(
        partial(_tb_kernel, chunk_t=GRID_T, n_chunks=n_chunks),
        grid=(n_chunks,),
        in_specs=[
            spec((1, b_pad), lambda i: (0, 0)),
            spec((GRID_T, b_pad), lambda i: (n_chunks - 1 - i, 0)),
            spec((GRID_T, b_pad), lambda i: (n_chunks - 1 - i, 0)),
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
    shifts = jnp.arange(GRID_T, dtype=jnp.uint32)
    bits = ((w[:, :, None] >> shifts[None, None, :]) & 1).astype(jnp.uint8)
    bits = bits.reshape(B, n_chunks * GRID_T)[:, :t_steps]
    bits = bits.reshape(*batch_shape, t_steps)
    if n_out is not None:
        bits = bits[..., :n_out]
    return bits
