"""Benchmark: IQ samples/s/chip through the full JRC RX chain.

Builds a long IQ capture containing many complete frames (TX generated on the
CPU backend), then times the jitted block RX pipeline — frame detection,
LTF sync, CP-strip/FFT, channel estimation/equalization, Viterbi decode, CRC —
on the accelerator. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE north-star target of
100 Msamples/s/chip through the full RX chain (the reference's own operating
point is 125 Msps real-time on a host CPU for the streaming graph,
examples/usrp/mimo_ofdm_jrc_TRX.grc `samp_rate`).

Robustness contract (this environment's axon TPU tunnel):
  * any PJRT call can hang for ~minutes if the tile is wedged — so the
    accelerator attempt runs in a SUBPROCESS with a hard deadline and the
    parent always prints a JSON line;
  * complex64 buffers are UNIMPLEMENTED on the device — the capture is
    shipped as a float32 (re, im) pair (the CArray layout the whole compute
    path uses);
  * device→host transfers are ~KB/s — only a (1, 2) float32 result array
    ever crosses back;
  * the sitecustomize force-sets jax_platforms="axon,cpu", so the CPU
    fallback must explicitly select the cpu platform (env vars are ignored).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_SPS = 100e6  # north-star: 100 Msamples/s/chip full RX chain
ACCEL_DEADLINE_S = 420
CPU_DEADLINE_S = 420
RESULT_TAG = "BENCH_RESULT:"


def build_capture(cfg, spec, n_samples: int, gap: int = 2111):
    """TX side on the CPU backend → numpy capture with frames + trailing halo."""
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    import numpy as np

    from jrc_tpu.models import streaming
    from jrc_tpu.ops import cplx as cx

    n_samples = block_len * n_blocks
    # ship as float32 (re, im) pair: complex64 h2d is unimplemented on axon
    x = jax.device_put(
        cx.CArray(
            np.ascontiguousarray(cap.real).astype(np.float32),
            np.ascontiguousarray(cap.imag).astype(np.float32),
        ),
        dev,
    )

    def counts(xx):
        res = streaming.scan_rx(
            cfg, spec, xx, block_len, n_blocks,
            max_frames_per_block=max_frames,
        )
        # small float32 array out: scalar/int/complex transfers are
        # unimplemented or pathologically slow on some TPU runtimes
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


def worker(kind: str) -> int:
    """Run one benchmark attempt; print RESULT_TAG + JSON on success."""
    import jax

    from jrc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if kind == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from jrc_tpu.config import MCS, OFDMConfig, PacketType
    from jrc_tpu.ops.encoder import FrameSpec

    dev = jax.devices()[0]
    if kind == "accel" and dev.platform == "cpu":
        print(RESULT_TAG + json.dumps({"error": "no accelerator"}))
        return 1

    block_len = 1 << 15
    n_blocks = 32 if kind == "accel" else 8
    n_samples = block_len * n_blocks
    cfg = OFDMConfig()
    spec = FrameSpec(MCS.QPSK_3_4, payload_bytes=64, packet_type=PacketType.DATA)
    cap, n_frames = build_capture(cfg, spec, n_samples)
    res = run_on_device(
        dev, cap, n_frames, cfg, spec, block_len, n_blocks,
        max_frames=12, n_iter=10 if kind == "accel" else 2,
    )
    res["device"] = str(dev)
    res["n_frames"] = n_frames
    print(RESULT_TAG + json.dumps(res))
    return 0


def attempt(kind: str, deadline_s: float) -> dict | None:
    """Run one worker in a subprocess with a hard deadline."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", kind],
            capture_output=True, text=True, timeout=deadline_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return {"error": f"{kind} worker exceeded {deadline_s}s deadline"}
    for line in proc.stdout.splitlines():
        if line.startswith(RESULT_TAG):
            return json.loads(line[len(RESULT_TAG):])
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
    return {"error": f"{kind} worker rc={proc.returncode}: "
                     + " | ".join(tail[-2:])[:300]}


def main() -> int:
    result = attempt("accel", ACCEL_DEADLINE_S)
    accel_error = result.get("error") if result else "no output"
    if accel_error is not None:
        result = attempt("cpu", CPU_DEADLINE_S)
    if result is None or "error" in result:
        print(json.dumps({
            "metric": "jrc_rx_chain_throughput", "value": 0.0,
            "unit": "samples/s/chip", "vs_baseline": 0.0,
            "error": (result or {}).get("error", "no output"),
            "accel_error": accel_error,
        }))
        return 1

    sps = result["sps"]
    out = {
        "metric": "jrc_rx_chain_throughput",
        "value": round(sps, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / BASELINE_SPS, 3),
        "frames_per_capture": result["n_frames"],
        "frames_decoded": result["n_valid"],
        "crc_ok": result["n_crc"],
        "correct": result["correct"],
        "compile_s": round(result["compile_s"], 1),
        "device": result["device"],
    }
    if accel_error:
        out["accel_error"] = accel_error
    print(json.dumps(out))
    return 0 if result["correct"] else 1


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--worker":
        sys.exit(worker(sys.argv[2]))
    sys.exit(main())
