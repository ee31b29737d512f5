"""Pallas TPU kernel for the fused frame-detection front-end.

Computes, in ONE pass over the IQ stream, everything ``detect_frames_stream``
needs: the lag-16 STF autocorrelation, its power normalizer, the
threshold mask, the gap-tolerant SEARCH-counter trigger
(= "≥ min_n_peaks+1 peaks in the trailing max_peak_distance window",
lib/frame_detector_impl.cc:89-134), the one-candidate-per-cluster sparsify,
and the per-128-sample-segment first-trigger/count reductions. The XLA
formulation is ~10 fused elementwise passes over the stream plus reduce
stages; here all intermediates stay in VMEM and HBM traffic is one read of
the stream plus the autocorrelation write-back (needed for the per-frame
coarse-CFO readout).

Layout: the stream is viewed as (rows, 128) with 128 consecutive samples
per row — one row per candidate segment (sync.SEG == 128). A trailing-window
shift by k becomes two circular rolls + a lane select; moving sums build by
binary doubling. Each grid step processes CHUNK_ROWS rows, fetching a left
margin by DMA sized to the trigger chain's worst-case lookback (365 samples
→ 3 rows for the default fft_len=64 numerology; derived per parameters) —
so no cross-chunk carry is needed.

CPU / interpreter fallback: the XLA formulation in ops/sync.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# Chunk size is NOT latency-critical: a 512/1024/2048-row sweep on the TPU
# measured 2.4-2.5 ms for the front end regardless (the kernel is VPU-bound
# on the ~30 elementwise passes of the moving-sum chains, 3.5 Gsps — ~18%
# of full-chain time), so the smallest VMEM footprint wins.
CHUNK_ROWS = 512


def _margin_rows(lag: int, win: int, pwin: int, max_peak_distance: int) -> int:
    """DMA margin (rows) covering the trigger chain's worst-case lookback:
    the sparsify stage reads the mask back max_peak_distance−1 samples, the
    mask's peaks_in_window another max_peak_distance−1, the autocorrelation
    max(win+lag, pwin)−1 more. 3 rows (384 samples ≥ 365 = 2·159 + 48 − 1)
    for the default fft_len=64 numerology; derived, not fixed, so larger
    numerologies (e.g. fft_len=128 → 733 samples → 6 rows) stay correct."""
    lookback = 2 * (max_peak_distance - 1) + max(win + lag, pwin) - 1
    return -(-lookback // LANE)


def _shift_r(arr, k: int):
    """Trailing shift within the (rows, 128) row-major sample view:
    out[i, j] = arr[i·128 + j − k] (garbage in the first ceil(k/128) rows —
    always inside the fetched margin)."""
    rows = 0
    while k >= LANE:
        arr = pltpu.roll(arr, shift=1, axis=0)
        k -= LANE
        rows += 1
    if k == 0:
        return arr
    a = pltpu.roll(arr, shift=k, axis=1)
    b = pltpu.roll(a, shift=1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1)
    return jnp.where(lane >= k, a, b)


def _moving_sum(x, win: int):
    """out[n] = Σ_{k<win} x[n−k] by binary shift-and-add doubling."""
    acc = None
    shift = 0
    s = x
    w = 1
    while True:
        if win & w:
            part = _shift_r(s, shift) if shift else s
            acc = part if acc is None else acc + part
            shift += w
        w *= 2
        if w > win:
            break
        s = s + _shift_r(s, w // 2)
    return acc


def _detect_kernel(xr_ref, xi_ref, are_ref, aim_ref, first_ref, count_ref,
                   *, chunk_rows: int, n_chunks: int, margin_rows: int,
                   threshold: float, min_n_peaks: int,
                   max_peak_distance: int, lag: int, win: int, pwin: int):
    i = pl.program_id(0)

    # the wrapper top-pads the stream with margin_rows zero rows, so the
    # fetch of [i·chunk, i·chunk + chunk + margin) padded rows is always in
    # bounds and chunk 0 sees the zero history the XLA form assumes
    def fetch(dst, src, sem):
        return pltpu.make_async_copy(
            src.at[pl.ds(i * chunk_rows, chunk_rows + margin_rows)],
            dst,
            sem,
        )

    def body(xr_s, xi_s, sems):
        c1 = fetch(xr_s, xr_ref, sems.at[0])
        c2 = fetch(xi_s, xi_ref, sems.at[1])
        c1.start()
        c2.start()
        c1.wait()
        c2.wait()
        xr = xr_s[:, :]
        xi = xi_s[:, :]
        xdr = _shift_r(xr, lag)
        xdi = _shift_r(xi, lag)
        # c = x · conj(x_delayed)
        cre = xr * xdr + xi * xdi
        cim = xi * xdr - xr * xdi
        are = _moving_sum(cre, win)
        aim = _moving_sum(cim, win)
        p = _moving_sum(xr * xr + xi * xi, pwin) * (1.0 / 1.5)
        cor = jnp.sqrt(are * are + aim * aim) / jnp.maximum(p, 1e-12)
        mask = (cor > threshold) & (cor < 2.0)
        maskf = mask.astype(jnp.float32)
        peaks_in_window = _moving_sum(maskf, max_peak_distance)
        trig = mask & (peaks_in_window > min_n_peaks)
        trigf = trig.astype(jnp.float32)
        recent = _moving_sum(trigf, max_peak_distance)
        trig = trig & (recent - trigf == 0.0)

        sl = slice(margin_rows, margin_rows + chunk_rows)
        are_ref[:, :] = are[sl]
        aim_ref[:, :] = aim[sl]
        lane = jax.lax.broadcasted_iota(jnp.int32, trig.shape, 1)
        first = jnp.min(
            jnp.where(trig, lane, LANE), axis=1, keepdims=True
        )
        first_ref[:, :] = first[sl]
        count_ref[:, :] = jnp.sum(
            trig.astype(jnp.int32), axis=1, keepdims=True
        )[sl]

    pl.run_scoped(
        body,
        pltpu.VMEM((chunk_rows + margin_rows, LANE), jnp.float32),
        pltpu.VMEM((chunk_rows + margin_rows, LANE), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    )


def detect_front_end(
    xr: jax.Array,
    xi: jax.Array,
    *,
    threshold: float,
    min_n_peaks: int,
    max_peak_distance: int,
    lag: int,
    win: int,
    pwin: int,
    interpret: bool = False,
):
    """Fused detection front-end over a flat stream (n,) pair.

    Returns (a_re (n',), a_im (n',), seg_first (n_rows,) int32 with LANE =
    "no trigger in segment", seg_count (n_rows,) int32), n' = n rounded up
    to a row multiple. Bit-equivalent to the ops.sync formulation up to
    float summation order in the moving sums.
    """
    n = xr.shape[-1]
    margin_rows = _margin_rows(lag, win, pwin, max_peak_distance)
    n_rows = -(-n // LANE)
    n_chunks = -(-n_rows // CHUNK_ROWS)
    rows_pad = n_chunks * CHUNK_ROWS
    pad = rows_pad * LANE - n
    margin = margin_rows * LANE
    xr = jnp.pad(xr, (margin, pad)).reshape(rows_pad + margin_rows, LANE)
    xi = jnp.pad(xi, (margin, pad)).reshape(rows_pad + margin_rows, LANE)

    kernel = partial(
        _detect_kernel, chunk_rows=CHUNK_ROWS, n_chunks=n_chunks,
        margin_rows=margin_rows,
        threshold=threshold, min_n_peaks=min_n_peaks,
        max_peak_distance=max_peak_distance, lag=lag, win=win, pwin=pwin,
    )
    are, aim, first, count = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK_ROWS, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_ROWS, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_ROWS, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(xr, xi)
    return (
        are.reshape(-1), aim.reshape(-1), first[:, 0], count[:, 0]
    )
