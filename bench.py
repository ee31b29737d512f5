"""Benchmark: IQ samples/s/chip through the full JRC RX chain.

Builds a long IQ capture containing many complete frames (TX generated on the
CPU backend), then times the jitted block RX pipeline — frame detection,
LTF sync, CP-strip/FFT, channel estimation/equalization, Viterbi decode, CRC —
on the accelerator. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE north-star target of
100 Msamples/s/chip through the full RX chain (the reference's own operating
point is 125 Msps real-time on a host CPU for the streaming graph).

Robustness: the axon TPU runtime in this environment intermittently fails at
execution or device→host transfer ("Unimplemented", with ~20 min terminal
recovery). The bench therefore (a) keeps all compute in one jit, (b) only
transfers a small float32 array, (c) falls back to the CPU backend — with the
device recorded honestly in the JSON — if the accelerator path fails.
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def build_capture(cfg, spec, n_samples: int, gap: int = 2111):
    """TX side on the CPU backend → numpy capture with frames + trailing halo."""
    import jax
    import jax.numpy as jnp

    from jrc_tpu.models import comm_link, streaming
    from jrc_tpu.ops import channel
    from jrc_tpu.ops.encoder import make_payload

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        payload = jnp.asarray(make_payload(spec, bytes([2]) + b"bench frame"))
        tx_samples = jax.jit(
            lambda p: comm_link.tx_frame(cfg, spec, p, 1).samples
        )(payload)
        frame = np.asarray(
            jax.jit(
                lambda s: channel.comm_channel(
                    s, angle_deg=0.0, path_loss=5.0, noise_var=0.0
                )
            )(tx_samples)
        )
    rng = np.random.default_rng(0)
    cap = (
        rng.normal(0, 1e-4, (n_samples, 2)).view(np.complex128)[:, 0]
    ).astype(np.complex64)
    pos, n_frames = 500, 0
    while pos + len(frame) < n_samples - 100:
        cap[pos : pos + len(frame)] += frame
        pos += len(frame) + gap
        n_frames += 1
    halo = streaming.frame_window_samples(cfg, spec) + cfg.fft_len
    cap = np.concatenate([cap, np.zeros(halo, np.complex64)])
    return cap, n_frames


def run_on_device(dev, cap, n_frames, cfg, spec, block_len, n_blocks, max_frames,
                  n_iter=10):
    """Compile + verify + time on one device. Raises on any failure."""
    import jax
    import jax.numpy as jnp

    from jrc_tpu.models import streaming

    n_samples = block_len * n_blocks
    x = jax.device_put(cap, dev)

    def counts(xx):
        res = streaming.scan_rx(
            cfg, spec, xx, block_len, n_blocks,
            max_frames_per_block=max_frames,
        )
        # small float32 array out: scalar/int/complex transfers are
        # unimplemented on some TPU runtimes
        return jnp.stack(
            [
                jnp.sum(res.valid.astype(jnp.float32)),
                jnp.sum(res.crc_ok.astype(jnp.float32)),
            ]
        ).reshape(1, 2)

    f = jax.jit(counts)
    t0 = time.time()
    out0 = jax.block_until_ready(f(x))
    compile_s = time.time() - t0
    host = np.asarray(out0)  # raises if the runtime poisoned the buffers
    n_valid, n_crc = int(host[0, 0]), int(host[0, 1])

    t0 = time.time()
    for _ in range(n_iter):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_iter
    return {
        "sps": n_samples / dt,
        "compile_s": compile_s,
        "n_valid": n_valid,
        "n_crc": n_crc,
        "correct": n_valid == n_frames and n_crc == n_frames,
    }


def main():
    import jax

    # persistent compile cache: the axon remote compiler has variable latency
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jrc_tpu.config import MCS, OFDMConfig, PacketType
    from jrc_tpu.ops.encoder import FrameSpec

    block_len = 1 << 15
    n_blocks = 32
    n_samples = block_len * n_blocks
    cfg = OFDMConfig()
    spec = FrameSpec(MCS.QPSK_3_4, payload_bytes=64, packet_type=PacketType.DATA)
    cap, n_frames = build_capture(cfg, spec, n_samples)
    max_frames = 12

    result = None
    device_used = None
    error = None
    run = partial(run_on_device, cap=cap, n_frames=n_frames, cfg=cfg, spec=spec,
                  block_len=block_len, n_blocks=n_blocks, max_frames=max_frames)

    accel = jax.devices()[0]
    if accel.platform != "cpu":
        try:
            result = run(accel)
            device_used = str(accel)
        except Exception as e:  # noqa: BLE001 — fall back, record why
            error = f"{type(e).__name__}: {str(e)[:120]}"
    if result is None:
        cpu = jax.devices("cpu")[0]
        result = run(cpu, n_iter=3)
        device_used = str(cpu)

    sps = result["sps"]
    out = {
        "metric": "jrc_rx_chain_throughput",
        "value": round(sps, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / 100e6, 3),
        "frames_per_capture": n_frames,
        "frames_decoded": result["n_valid"],
        "crc_ok": result["n_crc"],
        "correct": result["correct"],
        "compile_s": round(result["compile_s"], 1),
        "device": device_used,
    }
    if error:
        out["accel_error"] = error
    print(json.dumps(out))
    return 0 if result["correct"] else 1


if __name__ == "__main__":
    sys.exit(main())
