"""Scaling of chain time vs capture size: fixed overhead or real work?"""
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
from jrc_tpu.ops import cplx as cx
from jrc_tpu.ops.encoder import FrameSpec
from bench import build_capture

BLOCK_LEN = 1 << 15
MAX_FRAMES = 12


def main():
    cfg = OFDMConfig()
    spec = FrameSpec(MCS.QPSK_3_4, payload_bytes=64, packet_type=PacketType.DATA)
    dev = jax.devices()[0]
    probe = jax.device_put(np.ones((1, 1), np.float32), dev)
    np.asarray(jax.jit(lambda v: v + 1.0)(probe))

    for n_blocks in (32, 64, 128, 256):
        n_samples = BLOCK_LEN * n_blocks
        cap, n_frames = build_capture(cfg, spec, n_samples)
        x = jax.device_put(
            cx.CArray(np.ascontiguousarray(cap.real).astype(np.float32),
                      np.ascontiguousarray(cap.imag).astype(np.float32)), dev)

        def counts(xx):
            res = streaming.scan_rx(cfg, spec, xx, BLOCK_LEN, n_blocks,
                                    max_frames_per_block=MAX_FRAMES)
            return jnp.stack([jnp.sum(res.valid.astype(jnp.float32)),
                              jnp.sum(res.crc_ok.astype(jnp.float32))]).reshape(1, 2)

        f = jax.jit(counts)
        t0 = time.time()
        out0 = np.asarray(f(x))
        tc = time.time() - t0
        n_iter = 10
        t0 = time.time()
        for _ in range(n_iter):
            o = f(x)
        np.asarray(o)
        dt = (time.time() - t0) / n_iter
        print(f"n_blocks={n_blocks:4d} n={n_samples/1e6:5.1f}M  {dt*1e3:8.2f} ms "
              f"({n_samples/dt/1e6:7.1f} Msps) crc={out0[0,1]:.0f}/{n_frames} "
              f"compile {tc:.1f}s")


if __name__ == "__main__":
    main()
