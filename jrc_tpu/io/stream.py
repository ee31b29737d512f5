"""Host streaming driver: native IQ ring → jitted block RX.

The control loop that replaces the GNU Radio scheduler for continuous
operation on one host: a producer thread pushes IQ into the native SPSC ring
(jrc_tpu/runtime); the consumer loop pops overlapped blocks
``[left_hist | block | halo]`` and feeds them to the compiled RX kernel.
Congestion drops whole ring pushes (bounded loss) instead of blocking the
producer — the behavior the reference hacks into matrix_transpose
(lib/matrix_transpose_impl.cc:86-89).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Iterator

import numpy as np

from jrc_tpu.config import OFDMConfig
from jrc_tpu.models import streaming as block_rx
from jrc_tpu.ops.encoder import FrameSpec
from jrc_tpu.runtime import IQRing


@dataclass
class StreamStats:
    blocks: int = 0
    frames: int = 0
    crc_ok: int = 0
    dropped_samples: int = 0


class BlockStreamer:
    """Pop-and-process loop over a ring with a compiled RX kernel."""

    def __init__(
        self,
        cfg: OFDMConfig,
        spec: FrameSpec | None,
        *,
        block_len: int = 1 << 17,
        max_frames: int = 64,
        max_payload: int = 256,
        ring_capacity: int | None = None,
        jit: bool = True,
    ):
        """``spec=None`` selects the SIG-driven dynamic kernel: each frame's
        MCS/length/type is discovered from its SIG field (mixed traffic),
        bounded by ``max_payload``. A concrete ``spec`` compiles the faster
        static-geometry kernel."""
        import jax

        self.cfg = cfg
        self.spec = spec
        self.block_len = block_len
        if spec is None:
            self.halo = (
                block_rx.frame_window_samples_dynamic(cfg, max_payload)
                + cfg.fft_len
            )
            fn = partial(
                block_rx.rx_block_dynamic, cfg,
                block_len=block_len, own_lo=block_rx.left_history_samples(cfg),
                max_frames=max_frames, max_payload=max_payload,
            )
        else:
            self.halo = block_rx.frame_window_samples(cfg, spec) + cfg.fft_len
            fn = partial(
                block_rx.rx_block, cfg, spec,
                block_len=block_len, own_lo=block_rx.left_history_samples(cfg),
                max_frames=max_frames,
            )
        self.left_hist = block_rx.left_history_samples(cfg)
        self.ring = IQRing(ring_capacity or 4 * block_len)
        self._rx = jax.jit(fn) if jit else fn
        self.stats = StreamStats()

    def push(self, samples: np.ndarray) -> int:
        return self.ring.push(samples)

    def process_available(self) -> Iterator[block_rx.BlockRxResult]:
        """Process every complete block currently buffered."""
        while True:
            blk = self.ring.pop_block(self.block_len, self.halo, self.left_hist)
            if blk is None:
                return
            res = self._rx(x=blk)
            valid = np.asarray(res.valid)
            self.stats.blocks += 1
            self.stats.frames += int(valid.sum())
            self.stats.crc_ok += int(np.asarray(res.crc_ok).sum())
            self.stats.dropped_samples = self.ring.dropped()
            yield res

    def flush(self) -> Iterator[block_rx.BlockRxResult]:
        """Zero-pad the tail so trailing partial data forms a final block."""
        missing = self.block_len + self.halo - self.ring.available()
        if 0 < missing <= self.block_len + self.halo:
            self.ring.push(np.zeros(missing, np.complex64))
        yield from self.process_available()
