"""OFDM symbol-level ops: carrier allocation, IFFT/CP, CP-strip/FFT.

Replaces the reference's per-antenna chains of stock GNU Radio blocks
(``fft_vxx`` + ``digital_ofdm_cyclic_prefixer`` on TX, ``stream_to_vector`` +
``fft_vxx`` on RX, and ``lib/ofdm_cyclic_prefix_remover_impl.cc``) with batched
array ops over a (..., n_sym, fft_len) frequency grid.

Conventions:
* frequency grids are **fft-shifted** (DC at index fft_len/2), matching the
  reference's shifted fft_vxx blocks and carrier index tables
  (lib/mimo_precoder_impl.cc:126-152);
* transforms are unitary (norm="ortho"). The reference's absolute scaling
  (unnormalized FFTW + 1/sqrt(64) window) differs by a constant factor only,
  which washes out in channel estimation/equalization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jrc_tpu.config import OFDMConfig


def allocate_carriers(
    cfg: OFDMConfig,
    data_syms: jax.Array,
    pilot_row0: int = 0,
) -> jax.Array:
    """Scatter data symbols + scheduled pilots into the shifted FFT grid.

    ``data_syms``: (..., n_sym, n_data_carriers) → (..., n_sym, fft_len).
    Pilot for OFDM symbol k is schedule row ``(pilot_row0 + k) % 127``
    (reference lib/mimo_precoder_impl.cc data/pilot copy loops).
    """
    n_sym = data_syms.shape[-2]
    grid = jnp.zeros((*data_syms.shape[:-1], cfg.fft_len), data_syms.dtype)
    grid = grid.at[..., jnp.asarray(cfg.data_carrier_idx)].set(data_syms)
    sched = jnp.asarray(cfg.pilot_symbols)  # (127, n_pilot)
    rows = (pilot_row0 + jnp.arange(n_sym)) % sched.shape[0]
    pilots = sched[rows]  # (n_sym, n_pilot)
    grid = grid.at[..., jnp.asarray(cfg.pilot_carrier_idx)].set(
        jnp.broadcast_to(pilots, (*grid.shape[:-1], cfg.n_pilot_carriers))
    )
    return grid


def extract_data_carriers(cfg: OFDMConfig, grid: jax.Array) -> jax.Array:
    """(..., fft_len) → (..., n_data_carriers)."""
    return grid[..., jnp.asarray(cfg.data_carrier_idx)]


def extract_pilot_carriers(cfg: OFDMConfig, grid: jax.Array) -> jax.Array:
    return grid[..., jnp.asarray(cfg.pilot_carrier_idx)]


def ofdm_modulate(cfg: OFDMConfig, grid: jax.Array) -> jax.Array:
    """Shifted frequency grid → time samples with cyclic prefix.

    (..., n_sym, fft_len) → (..., n_sym·(fft_len+cp_len)) flattened time
    stream per leading index. Equivalent of the reference's shifted IFFT
    ``fft_vxx`` + ``digital_ofdm_cyclic_prefixer`` per antenna.
    """
    x = jnp.fft.ifft(jnp.fft.ifftshift(grid, axes=-1), axis=-1, norm="ortho")
    with_cp = jnp.concatenate([x[..., -cfg.cp_len :], x], axis=-1)
    return with_cp.reshape(*grid.shape[:-2], grid.shape[-2] * cfg.sym_len).astype(
        jnp.complex64
    )


def ofdm_demodulate(cfg: OFDMConfig, samples: jax.Array, n_sym: int) -> jax.Array:
    """Time samples → shifted frequency grid, dropping each symbol's CP.

    (..., n_sym·sym_len) → (..., n_sym, fft_len). Equivalent of
    ``ofdm_cyclic_prefix_remover`` (lib/ofdm_cyclic_prefix_remover_impl.cc:69)
    + shifted forward ``fft_vxx``.
    """
    x = samples[..., : n_sym * cfg.sym_len].reshape(
        *samples.shape[:-1], n_sym, cfg.sym_len
    )
    x = x[..., cfg.cp_len :]
    return jnp.fft.fftshift(
        jnp.fft.fft(x, axis=-1, norm="ortho"), axes=-1
    ).astype(jnp.complex64)


def zero_pad(
    samples: jax.Array, pad_front: int, pad_tail: int, rng_key=None, noise_std: float = 0.1
) -> jax.Array:
    """Pad a frame with low-power complex Gaussian noise samples front/tail
    (reference zero_pad, lib/zero_pad_impl.cc:61-94; N(0, 1e-2) variance ⇒
    std 0.1 per quadrature pair)."""
    import jax.random as jr

    shape_f = (*samples.shape[:-1], pad_front)
    shape_t = (*samples.shape[:-1], pad_tail)
    if rng_key is None:
        front = jnp.zeros(shape_f, samples.dtype)
        tail = jnp.zeros(shape_t, samples.dtype)
    else:
        k1, k2, k3, k4 = jr.split(rng_key, 4)
        s = noise_std / np.sqrt(2.0)
        front = s * (jr.normal(k1, shape_f) + 1j * jr.normal(k2, shape_f))
        tail = s * (jr.normal(k3, shape_t) + 1j * jr.normal(k4, shape_t))
    return jnp.concatenate([front, samples, tail], axis=-1).astype(jnp.complex64)


def fft_symbols(cfg: OFDMConfig, sym_samples: jax.Array) -> jax.Array:
    """CP-less (..., fft_len) symbol samples → shifted spectrum (as the RX
    chain's forward fft_vxx after frame_sync already stripped CPs)."""
    return jnp.fft.fftshift(
        jnp.fft.fft(sym_samples, axis=-1, norm="ortho"), axes=-1
    ).astype(jnp.complex64)
