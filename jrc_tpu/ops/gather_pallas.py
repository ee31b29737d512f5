"""Pallas TPU kernel for batched frame-window extraction.

The flat-stream RX extracts, for every detected frame, a contiguous window
``x[s_b : s_b + width]`` at a data-dependent trigger ``s_b``. Under ``vmap``
that lowers to an XLA gather, which runs ~two orders of magnitude off HBM
bandwidth on TPU (measured: the dominant cost of the frame path). Each row
is contiguous though, so the right tool is the DMA engine: this kernel
scalar-prefetches the start indices, issues one async HBM→VMEM copy per row
from the 128-aligned superset ``[s−s%128, …)`` (Mosaic requires lane-tile
alignment for minor-dim DMA offsets), overlaps the copies within a group,
and aligns each row with a dynamic lane roll.

CPU / interpreter fallback: the vmapped dynamic-slice formulation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jrc_tpu.ops import cplx as cx

GROUP = 32  # rows gathered per grid step (DMAs issued together)
LANE = 128


def _gather_kernel(starts_ref, x_ref, out_ref, scratch, sems, *, group: int,
                   w_fetch: int, w_out: int):
    """Grid step i: DMA + lane-align rows i·group..i·group+group−1.

    x_ref: (2, N) in HBM; scratch (group, 2, w_fetch) VMEM;
    out block (group, 2, w_out) VMEM; starts scalar-prefetched (B_pad,).
    """
    i = pl.program_id(0)
    copies = []
    for g in range(group):
        s = starts_ref[i * group + g]
        s0 = pl.multiple_of((s // LANE) * LANE, LANE)
        dma = pltpu.make_async_copy(
            x_ref.at[:, pl.ds(s0, w_fetch)],
            scratch.at[g],
            sems.at[g],
        )
        dma.start()
        copies.append(dma)
    for g, dma in enumerate(copies):
        dma.wait()
        r = starts_ref[i * group + g] % LANE
        # lane-align: circular left-roll by r expressed as the positive
        # right-roll Mosaic requires (negative traced shifts are silently
        # mis-lowered on this toolchain)
        rolled = pltpu.roll(scratch[g], shift=w_fetch - r, axis=1)
        out_ref[g] = rolled[:, :w_out]


def gather_rows(
    x: cx.CArray, starts: jax.Array, width: int, interpret: bool = False
) -> cx.CArray:
    """(2-channel) row gather: out[b] = x[starts[b] : starts[b] + width].

    ``starts`` are clamped to [0, N − width] (dynamic-slice semantics).
    Uses the DMA kernel on TPU (``interpret=True`` forces the kernel through
    the Pallas interpreter for CPU-side validation); falls back to vmapped
    dynamic slices on CPU.
    """
    n = x.shape[-1]
    b = starts.shape[0]
    if n < width:
        raise ValueError(
            f"gather_rows: stream length {n} < requested width {width} — "
            "jnp.clip would drive the DMA from a negative offset")
    starts = jnp.clip(starts.astype(jnp.int32), 0, n - width)

    if not cx.on_tpu() and not interpret:
        return jax.vmap(
            lambda s: cx.dynamic_slice_in_dim(x, s, width, axis=-1)
        )(starts)

    w_out = -(-width // LANE) * LANE
    w_fetch = w_out + LANE
    b_pad = -(-b // GROUP) * GROUP
    starts_p = jnp.pad(starts, (0, b_pad - b))
    # tail-pad the stream so an aligned fetch from any clamped start fits
    xs = jnp.stack([x.re, x.im])  # (2, N)
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
        partial(_gather_kernel, group=GROUP, w_fetch=w_fetch, w_out=w_out),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, 2, w_out), jnp.float32),
        interpret=interpret,
    )(starts_p, xs)
    return cx.CArray(out[:b, 0, :width], out[:b, 1, :width])
