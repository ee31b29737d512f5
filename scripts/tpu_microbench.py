"""On-device microbenchmarks for the hot RX kernels (axon TPU or CPU).

Times each stage of the RX chain at the bench's real shapes so optimization
effort goes where the time is. Prints one JSON line per experiment.

Usage: python scripts/tpu_microbench.py [cpu]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    from jrc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from jrc_tpu.config import MCS, OFDMConfig, PacketType
    from jrc_tpu.ops import cplx as cx
    from jrc_tpu.ops.encoder import FrameSpec
    from jrc_tpu.ops import viterbi

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr, flush=True)

    # warm the d2h channel (axon quirk: first transfer is minutes-slow and
    # block_until_ready doesn't actually block before it happens)
    t0 = time.time()
    probe = jax.device_put(np.ones((1, 1), np.float32), dev)
    np.asarray(jax.jit(lambda v: v + 1.0)(probe))
    print(f"d2h warm-up {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    results = []

    def bench(name, fn, *args, n_iter=20):
        f = jax.jit(fn)
        t0 = time.time()
        out = jax.block_until_ready(f(*args))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(n_iter):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n_iter
        rec = {"name": name, "ms": round(dt * 1e3, 3), "compile_s": round(compile_s, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        return dt

    cfg = OFDMConfig()
    spec = FrameSpec(MCS.QPSK_3_4, payload_bytes=64, packet_type=PacketType.DATA)
    B = 32 * 12  # n_blocks × max_frames in the bench
    T = spec.packet_params.n_data_bits  # trellis steps after depuncture

    rng = np.random.default_rng(0)
    values = jax.device_put(
        rng.standard_normal((B, 2 * T)).astype(np.float32), dev
    )

    only = set(sys.argv[2:]) if len(sys.argv) > 2 else None

    def want(tag):
        return only is None or tag in only

    if want("viterbi"):
        for unroll in (8, 16, 32):
            bench(
                f"viterbi_scan_B{B}_T{T}_u{unroll}",
                lambda v, u=unroll: viterbi.viterbi_decode(v, unroll=u),
                values,
            )
    if want("viterbi_chunked"):
        for chunk in (32, 64, 144):
            bench(
                f"viterbi_chunked_B{B}_T{T}_c{chunk}",
                lambda v, c=chunk: viterbi.viterbi_decode_chunked(v, chunk_len=c),
                values,
            )

    # full RX chain at bench shapes, batched vs sequential-scan block axis
    from bench import build_capture
    from jrc_tpu.models import streaming

    block_len, n_blocks = 1 << 15, 32
    cap, n_frames = build_capture(cfg, spec, block_len * n_blocks)
    x = jax.device_put(
        cx.CArray(
            np.ascontiguousarray(cap.real).astype(np.float32),
            np.ascontiguousarray(cap.imag).astype(np.float32),
        ),
        dev,
    )

    def chain(xx, batched):
        res = streaming.scan_rx(
            cfg, spec, xx, block_len, n_blocks,
            max_frames_per_block=12, batched=batched,
        )
        return jnp.stack(
            [jnp.sum(res.valid.astype(jnp.float32)),
             jnp.sum(res.crc_ok.astype(jnp.float32))]
        ).reshape(1, 2)

    if want("chain"):
        for batched in (True,):
            dt = bench(
                f"scan_rx_{'batched' if batched else 'seq'}",
                lambda xx, b=batched: chain(xx, b),
                x, n_iter=10,
            )
            sps = block_len * n_blocks / dt
            print(json.dumps({"name": "throughput", "batched": batched,
                              "Msps": round(sps / 1e6, 1)}), flush=True)

    # stage-level: detection only vs full chain
    def det_only(xx):
        from jrc_tpu.ops import sync
        halo = streaming.frame_window_samples(cfg, spec) + cfg.fft_len
        lh = streaming.left_history_samples(cfg)
        xp = cx.concatenate([cx.zeros(lh), xx], axis=-1)
        window = lh + block_len + halo
        starts = jnp.arange(n_blocks, dtype=jnp.int32) * block_len
        idx = starts[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :]
        blocks = xp[idx]
        det = jax.vmap(
            lambda b: sync.detect_frames(cfg, b, max_frames=12)
        )(blocks)
        return jnp.sum(det.valid.astype(jnp.float32)).reshape(1, 1)

    if want("detect"):
        bench("detect_only_batched", det_only, x, n_iter=10)

    if want("detstages"):
        from jrc_tpu.ops import sync

        halo = streaming.frame_window_samples(cfg, spec) + cfg.fft_len
        lh = streaming.left_history_samples(cfg)
        window = lh + block_len + halo

        def blocks_of(xx):
            xp = cx.concatenate([cx.zeros(lh), xx], axis=-1)
            starts = jnp.arange(n_blocks, dtype=jnp.int32) * block_len
            idx = starts[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :]
            return xp[idx]

        def autocorr_only(xx):
            a, cor = jax.vmap(lambda b: sync.autocorrelation(cfg, b))(
                cx.from_complex(blocks_of(xx))
            )
            return jnp.sum(cor).reshape(1, 1)

        def gather_only(xx):
            return jnp.sum(blocks_of(xx).re).reshape(1, 1)

        def trig_only(xx):
            def per_block(b):
                a, cor = sync.autocorrelation(cfg, cx.from_complex(b))
                mask = (cor > 0.6) & (cor < 2.0)
                t = sync._gap_tolerant_triggers(mask, 10, 2 * cfg.sym_len)
                return jnp.sum(t.astype(jnp.float32))
            return jnp.sum(jax.vmap(per_block)(blocks_of(xx))).reshape(1, 1)

        bench("det_gather_only", gather_only, x, n_iter=10)
        bench("det_autocorr", autocorr_only, x, n_iter=10)
        bench("det_autocorr_trig", trig_only, x, n_iter=10)
    return 0


if __name__ == "__main__":
    sys.exit(main())
