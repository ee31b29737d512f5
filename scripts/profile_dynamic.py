"""Stage-by-stage timing of the SIG-driven dynamic RX path on the TPU.

Times jitted prefixes of flat_rx_dynamic's pipeline so optimization targets
the real hotspot instead of a guess. Each stage function consumes the same
device-resident capture; outputs are reduced to a tiny float32 so d2h cost
stays off the clock.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from jrc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from jrc_tpu.config import MCS, OFDMConfig, PacketType
from jrc_tpu.models import streaming
from jrc_tpu.ops import cplx as cx, dynamic_rx, equalizer, ofdm, sync
from jrc_tpu.ops.encoder import FrameSpec
from bench import build_capture

MAX_PAYLOAD = 96
BLOCK_LEN = 1 << 15
import os
N_BLOCKS = int(os.environ.get("NB", 64))
MAX_FRAMES = 12


def main():
    cfg = OFDMConfig()
    spec = FrameSpec(MCS.QPSK_3_4, payload_bytes=64, packet_type=PacketType.DATA)
    n_samples = BLOCK_LEN * N_BLOCKS
    cap, n_frames = build_capture(cfg, spec, n_samples)
    print(f"capture {n_samples} samples, {n_frames} frames", file=sys.stderr)

    dev = jax.devices()[0]
    probe = jax.device_put(np.ones((1, 1), np.float32), dev)
    np.asarray(jax.jit(lambda v: v + 1.0)(probe))

    left_hist = streaming.left_history_samples(cfg)
    capp = np.concatenate([np.zeros(left_hist, np.complex64), cap])
    xp = jax.device_put(
        cx.CArray(
            np.ascontiguousarray(capp.real).astype(np.float32),
            np.ascontiguousarray(capp.imag).astype(np.float32),
        ),
        dev,
    )
    own_lo = left_hist
    n_sym_total = 2 + 1 + cfg.n_ltf + dynamic_rx.max_symbols(MAX_PAYLOAD)

    def s1_detect(xx):
        det = sync.detect_frames_stream(
            cfg, xx, BLOCK_LEN, N_BLOCKS, own_lo, max_frames=MAX_FRAMES
        )
        return jnp.sum(det.valid.astype(jnp.float32)).reshape(1, 1)

    def _extract(xx):
        det = sync.detect_frames_stream(
            cfg, xx, BLOCK_LEN, N_BLOCKS, own_lo, max_frames=MAX_FRAMES
        )
        trig = jnp.where(det.valid, det.start, 0).reshape(-1)
        cfo = det.coarse_cfo.reshape(-1)
        syms, total_cfo, found = sync.extract_frames_batch(
            cfg, xx, trig, cfo, n_sym_total
        )
        return det, syms, total_cfo, found

    def s2_extract(xx):
        det, syms, total_cfo, found = _extract(xx)
        return jnp.sum(syms.re).reshape(1, 1)

    def s3_fft(xx):
        det, syms, total_cfo, found = _extract(xx)
        def one(sym, tc):
            grid = ofdm.fft_symbols(cfg, sym)
            grid = equalizer.sampling_offset_compensate(cfg, grid, tc)
            return jnp.sum(grid.re)
        return jnp.sum(jax.vmap(one)(syms, total_cfo)).reshape(1, 1)

    def s4_values(xx):
        det, syms, total_cfo, found = _extract(xx)
        pre = jax.vmap(
            lambda sym, tc: dynamic_rx.rx_frame_dynamic_values_from_syms(
                cfg, sym, tc, max_payload=MAX_PAYLOAD
            )
        )(syms, total_cfo)
        return jnp.sum(pre.values).reshape(1, 1)

    def s5_full(xx):
        res = streaming.scan_rx_dynamic(
            cfg, xx[..., own_lo:], BLOCK_LEN, N_BLOCKS,
            max_frames_per_block=MAX_FRAMES, max_payload=MAX_PAYLOAD,
        )
        return jnp.stack([
            jnp.sum(res.valid.astype(jnp.float32)),
            jnp.sum(res.crc_ok.astype(jnp.float32)),
        ]).reshape(1, 2)

    # static reference for comparison
    def s6_static(xx):
        res = streaming.scan_rx(
            cfg, spec, xx[..., own_lo:], BLOCK_LEN, N_BLOCKS,
            max_frames_per_block=MAX_FRAMES,
        )
        return jnp.stack([
            jnp.sum(res.valid.astype(jnp.float32)),
            jnp.sum(res.crc_ok.astype(jnp.float32)),
        ]).reshape(1, 2)

    stages = [
        ("detect", s1_detect),
        ("detect+extract", s2_extract),
        ("detect+extract+fft", s3_fft),
        ("..+equalize+demod(values)", s4_values),
        ("full dynamic", s5_full),
        ("full static", s6_static),
    ]
    for name, fn in stages:
        f = jax.jit(fn)
        t0 = time.time()
        out = np.asarray(f(xp))
        tc = time.time() - t0
        n_iter = 10
        t0 = time.time()
        for _ in range(n_iter):
            o = f(xp)
        np.asarray(o)
        dt = (time.time() - t0) / n_iter
        print(f"{name:30s} {dt*1e3:8.2f} ms  ({n_samples/dt/1e6:7.1f} Msps)"
              f"  compile {tc:.1f}s  out={out.ravel()[:2]}")


if __name__ == "__main__":
    main()
