"""Micro-benchmark the fused Pallas detection front-end in isolation.

Splits the `detect` stage of scripts/profile_dynamic.py into the Pallas
kernel proper vs the XLA candidate/suppression machinery around it, to see
whether DMA/compute overlap inside the kernel is worth pursuing.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from jrc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from jrc_tpu.config import MCS, OFDMConfig, PacketType
from jrc_tpu.models import streaming
from jrc_tpu.ops import cplx as cx, sync
from jrc_tpu.ops.detect_pallas import detect_front_end
from jrc_tpu.ops.encoder import FrameSpec
from bench import build_capture

BLOCK_LEN = 1 << 15
NB = int(os.environ.get("NB", 256))
MF = 12


def main():
    cfg = OFDMConfig()
    spec = FrameSpec(MCS.QPSK_3_4, payload_bytes=64, packet_type=PacketType.DATA)
    n = BLOCK_LEN * NB
    cap, n_frames = build_capture(cfg, spec, n)
    dev = jax.devices()[0]
    probe = jax.device_put(np.ones((1, 1), np.float32), dev)
    np.asarray(jax.jit(lambda v: v + 1.0)(probe))

    lh = streaming.left_history_samples(cfg)
    capp = np.concatenate([np.zeros(lh, np.complex64), cap])
    xp = jax.device_put(
        cx.CArray(
            np.ascontiguousarray(capp.real).astype(np.float32),
            np.ascontiguousarray(capp.imag).astype(np.float32),
        ),
        dev,
    )

    lag = cfg.fft_len // 4
    win = cfg.fft_len // 2
    pwin = int(1.5 * win)
    mpd = 2 * cfg.sym_len

    def fe_only(x):
        are, aim, first, count = detect_front_end(
            x.re, x.im, threshold=0.6, min_n_peaks=10,
            max_peak_distance=mpd, lag=lag, win=win, pwin=pwin,
        )
        return (jnp.sum(count).astype(jnp.float32)
                + jnp.sum(are[:8]) * 0).reshape(1, 1)

    def detect_full(x):
        det = sync.detect_frames_stream(
            cfg, x, BLOCK_LEN, NB, lh, max_frames=MF)
        return jnp.sum(det.valid.astype(jnp.float32)).reshape(1, 1)

    for name, fn in [("front_end_only", fe_only), ("detect_full", detect_full)]:
        f = jax.jit(fn)
        t0 = time.time()
        out = np.asarray(f(xp))
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(20):
            o = f(xp)
        np.asarray(o)
        dt = (time.time() - t0) / 20
        print(f"{name:16s} {dt*1e3:7.2f} ms ({n/dt/1e6:7.0f} Msps) "
              f"compile {tc:.1f}s out={out.ravel()}")


if __name__ == "__main__":
    main()
