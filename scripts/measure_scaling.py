"""Scaling measurement for the time-block sharded streaming RX
(VERDICT r3 item 2 → SCALING_r04.json).

Weak scaling on the virtual CPU mesh: one 32k-sample block per device, so
ideal scaling keeps step time constant as devices are added. Each mesh size
runs in its own subprocess (the CPU device count is fixed at backend init).

## Method (what each number means)

This host has 2 physical cores, so WALL-clock time beyond 2 virtual devices
measures scheduler time-sharing, not hardware scaling — wall columns are
reported for transparency but are not the headline.

The headline is derived from per-device WORK time, which time-sharing cannot
distort because CPU time is additive across time-shared threads:

* ``cpu_single_ms`` — process CPU time of the IDENTICAL per-device program
  (flat_rx over one ``[left-hist | block | halo]`` window, i.e. exactly the
  shard_map body minus ppermute/psum) run standalone on one device.
* ``cpu_sharded_ms`` — process CPU time of the full N-device sharded step.
* ``cpu_per_device_ms = cpu_sharded_ms / N`` — the work one device performs
  inside the mesh, including its share of halo exchange and psum.
* ``work_efficiency = cpu_single_ms / cpu_per_device_ms`` — weak-scaling
  efficiency net of time-sharing (1.0 = the mesh adds no per-device work).
* ``collective_halo_share = 1 − N·cpu_single_ms / cpu_sharded_ms`` — the
  fraction of sharded CPU time spent on collectives/halo machinery rather
  than per-device decode work (can be slightly negative from measurement
  noise / better fusion inside shard_map).

Caveat: XLA:CPU worker threads spin-wait at collective barriers, so waiting
time is COUNTED as work here — collective_halo_share and therefore
1 − work_efficiency are upper bounds on the true mesh cost; on real
multi-chip hardware the exchange rides ICI while the core computes.

Usage: python scripts/measure_scaling.py            # driver, writes JSON
       python scripts/measure_scaling.py --one N    # single mesh size
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK_LEN = 1 << 15
N_ITER = 16


def run_one(n_dev: int) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_dev)

    import numpy as np
    import jax.numpy as jnp

    from jrc_tpu.config import MCS, OFDMConfig, PacketType
    from jrc_tpu.models import comm_link, streaming
    from jrc_tpu.ops import channel, cplx as cx
    from jrc_tpu.ops.encoder import FrameSpec, make_payload
    from jrc_tpu.parallel import streaming as pstream
    from jrc_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cfg = OFDMConfig()
    spec = FrameSpec(MCS.QPSK_3_4, payload_bytes=64, packet_type=PacketType.DATA)
    payload = jnp.asarray(make_payload(spec, bytes([2]) + b"scaling"))
    tx = comm_link.tx_frame(cfg, spec, payload, 1)
    frame = np.asarray(
        channel.comm_channel(tx.samples, angle_deg=0.0, path_loss=5.0, noise_var=0.0)
    )
    rng = np.random.default_rng(0)
    cap = (
        rng.normal(0, 1e-4, (n_dev * BLOCK_LEN, 2)).view(np.complex128)[:, 0]
    ).astype(np.complex64)
    for d in range(n_dev):  # 3 frames per block
        for k in range(3):
            pos = d * BLOCK_LEN + 600 + k * ((BLOCK_LEN - len(frame) - 700) // 3)
            cap[pos : pos + len(frame)] += frame

    mesh = pstream.make_time_mesh(n_dev)
    x = jnp.asarray(cap)

    # sharded step (halo exchange + psum over the mesh)
    res = pstream.sharded_rx(cfg, spec, mesh, x, max_frames_per_block=6)
    assert int(np.asarray(res.n_frames)) == 3 * n_dev, int(np.asarray(res.n_frames))
    assert int(np.asarray(res.n_crc_ok)) == 3 * n_dev
    t_sharded = cpu_sharded = float("inf")
    for _ in range(3):  # best-of-3 batches: 2-core host noise is ±15%
        t0, c0 = time.time(), time.process_time()
        for _ in range(N_ITER):
            res = pstream.sharded_rx(cfg, spec, mesh, x, max_frames_per_block=6)
        jax.block_until_ready(res.n_frames)
        t_sharded = min(t_sharded, (time.time() - t0) / N_ITER)
        cpu_sharded = min(cpu_sharded, (time.process_time() - c0) / N_ITER)

    # matched unsharded baseline: the IDENTICAL per-device program — the
    # shard_map body's flat_rx over one [left-hist | block | halo] window —
    # without ppermute/psum, on ONE device
    halo = streaming.frame_window_samples(cfg, spec) + cfg.fft_len
    lh = streaming.left_history_samples(cfg)
    blk = np.concatenate(
        [np.zeros(lh, np.complex64), cap[:BLOCK_LEN],
         np.zeros(halo, np.complex64)]
    )
    fn = jax.jit(
        lambda v: streaming.flat_rx(
            cfg, spec, v, BLOCK_LEN, 1, lh, max_frames=6,
        ).crc_ok.sum()
    )
    xb = cx.from_complex(jnp.asarray(blk))
    assert int(np.asarray(fn(xb))) == 3
    t_single = cpu_single = float("inf")
    for _ in range(3):
        t0, c0 = time.time(), time.process_time()
        for _ in range(N_ITER):
            out = fn(xb)
        jax.block_until_ready(out)
        t_single = min(t_single, (time.time() - t0) / N_ITER)
        cpu_single = min(cpu_single, (time.process_time() - c0) / N_ITER)

    print(json.dumps({
        "n_devices": n_dev,
        "t_sharded_ms": round(t_sharded * 1e3, 2),
        "cpu_sharded_ms": round(cpu_sharded * 1e3, 2),
        "t_single_block_ms": round(t_single * 1e3, 2),
        "cpu_single_ms": round(cpu_single * 1e3, 2),
        "samples_per_s": round(n_dev * BLOCK_LEN / t_sharded, 1),
        "frames": 3 * n_dev,
    }))
    return 0


def main() -> int:
    rows = []
    for n in (1, 2, 4, 8):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(n)],
            capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(json.dumps({"n_devices": n, "error": p.stderr[-300:]}))
            continue
        row = json.loads(line[-1])
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = rows[0]
    for r in rows:
        n = r["n_devices"]
        r["cpu_per_device_ms"] = round(r["cpu_sharded_ms"] / n, 2)
        r["work_efficiency"] = round(
            r["cpu_single_ms"] / max(r["cpu_per_device_ms"], 1e-9), 3
        )
        r["collective_halo_share"] = round(
            1.0 - n * r["cpu_single_ms"] / max(r["cpu_sharded_ms"], 1e-9), 3
        )
        # wall columns kept for transparency (time-shared beyond 2 cores)
        r["weak_scaling_wall"] = round(
            base["t_sharded_ms"] / r["t_sharded_ms"], 3
        )
    out = {
        "metric": "sharded_rx_weak_scaling",
        "block_len": BLOCK_LEN,
        "physical_cores": os.cpu_count(),
        "method": (
            "headline work_efficiency = cpu_single / (cpu_sharded / N): "
            "process-CPU-time of the identical per-device flat_rx program "
            "standalone vs inside the N-device shard_map step — additive "
            "across time-shared threads, so oversubscription of the "
            "{}-core host cannot distort it; spin-waits at collective "
            "barriers count as work, making the reported mesh cost an "
            "upper bound. Wall-clock columns included for transparency "
            "only.".format(os.cpu_count())
        ),
        "points": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "SCALING_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--one":
        sys.exit(run_one(int(sys.argv[2])))
    sys.exit(main())
