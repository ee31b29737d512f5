#!/usr/bin/env python3
"""Receive-only app — mirrors examples/usrp/mimo_ofdm_comm_RX.grc.

Streams an IQ capture (complex64 file, or a self-generated demo capture)
through the native ring + block RX pipeline and reports decoded frames.

    python apps/comm_rx.py --iq capture.c64 --mcs QPSK_3_4 --payload-bytes 100
    python apps/comm_rx.py --demo          # generate and decode a demo capture
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iq", help="complex64 IQ capture file")
    p.add_argument("--demo", action="store_true")
    p.add_argument("--mcs", default="QPSK_3_4")
    p.add_argument("--payload-bytes", type=int, default=64)
    p.add_argument("--dynamic", action="store_true",
                   help="SIG-driven RX: discover each frame's MCS/length/"
                        "type from its SIG field (mixed traffic); --mcs/"
                        "--payload-bytes then only shape the demo capture")
    p.add_argument("--max-payload", type=int, default=256,
                   help="length envelope of the dynamic kernel")
    p.add_argument("--block-len", type=int, default=1 << 16)
    p.add_argument("--udp-out", type=int, default=0,
                   help="forward decoded payloads to this UDP port")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from jrc_tpu.config import MCS, OFDMConfig, PacketType
    from jrc_tpu.io.stream import BlockStreamer
    from jrc_tpu.ops.encoder import FrameSpec, make_payload

    cfg = OFDMConfig()
    spec = FrameSpec(MCS[args.mcs], payload_bytes=args.payload_bytes,
                     packet_type=PacketType.DATA)

    if args.dynamic and args.payload_bytes > args.max_payload:
        p.error(f"--payload-bytes {args.payload_bytes} exceeds the dynamic "
                f"kernel's --max-payload {args.max_payload} envelope — such "
                "frames can never decode")
    if args.demo:
        from jrc_tpu.models import comm_link
        from jrc_tpu.ops import channel

        payload = jnp.asarray(make_payload(spec, bytes([2]) + b"comm_rx demo"))
        tx = comm_link.tx_frame(cfg, spec, payload, 1)
        frame = np.asarray(channel.comm_channel(tx.samples, angle_deg=0.0,
                                                path_loss=5.0, noise_var=0.0))
        rng = np.random.default_rng(0)
        cap = (rng.normal(0, 1e-4, (4 * args.block_len, 2))
               .view(np.complex128)[:, 0]).astype(np.complex64)
        pos = 700
        while pos + len(frame) < len(cap) - 100:
            cap[pos : pos + len(frame)] += frame
            pos += len(frame) + 3000
    elif args.iq:
        cap = np.fromfile(args.iq, np.complex64)
    else:
        p.error("--iq or --demo required")
        return 2

    sink = None
    if args.udp_out:
        from jrc_tpu.io.udp import UdpPduSink

        sink = UdpPduSink(args.udp_out)

    streamer = BlockStreamer(
        cfg, None if args.dynamic else spec, block_len=args.block_len,
        max_frames=32, max_payload=args.max_payload)
    chunk = 1 << 15
    for i in range(0, len(cap), chunk):
        streamer.push(cap[i : i + chunk])
        for res in streamer.process_available():
            _report(res, sink)
    for res in streamer.flush():
        _report(res, sink)
    s = streamer.stats
    print(f"blocks={s.blocks} frames={s.frames} crc_ok={s.crc_ok} "
          f"dropped_samples={s.dropped_samples}")
    return 0


def _report(res, sink):
    import numpy as np

    valid = np.asarray(res.valid)
    crc = np.asarray(res.crc_ok)
    snr = np.asarray(res.snr_db)
    payload = np.asarray(res.payload)
    mcs = np.asarray(res.mcs) if hasattr(res, "mcs") else None
    for k in np.nonzero(valid)[0]:
        extra = f" mcs={int(mcs[k])}" if mcs is not None else ""
        print(f"  frame @ {int(np.asarray(res.start)[k])}: crc={bool(crc[k])} "
              f"snr={float(snr[k]):.1f} dB{extra}")
        if sink is not None and crc[k]:
            sink.send(payload[k])


if __name__ == "__main__":
    sys.exit(main())
