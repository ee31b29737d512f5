#!/usr/bin/env python3
"""Full JRC transceiver session — mirrors examples/usrp/mimo_ofdm_jrc_TRX.grc
with the simulated backend: radar-assisted precoded DATA frames + periodic
NDP sounding, simultaneous target tracking and link statistics.

    python apps/jrc_trx.py --dwells 10 --target 12:0:25:10 --radar-aided
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dwells", type=int, default=8)
    p.add_argument("--target", default="12:0:25:10",
                   help="range:velocity:azimuth:rcs")
    p.add_argument("--mcs", default="QPSK_3_4")
    p.add_argument("--payload-bytes", type=int, default=80)
    p.add_argument("--radar-aided", action="store_true", default=True)
    p.add_argument("--no-radar-aided", dest="radar_aided", action="store_false")
    p.add_argument("--phased", action="store_true", default=True)
    p.add_argument("--svd", dest="phased", action="store_false")
    p.add_argument("--radar-streams", action="store_true")
    p.add_argument("--ndp-every", type=int, default=4)
    p.add_argument("--comm-noise-var", type=float, default=1e-4)
    p.add_argument("--radar-log", default="radar_log.csv")
    p.add_argument("--comm-log", default="comm_log.csv")
    p.add_argument("--heatmap", default="jrc_range_angle.png")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from jrc_tpu.config import MCS, OFDMConfig, PacketType
    from jrc_tpu.models import jrc_trx
    from jrc_tpu.ops import channel
    from jrc_tpu.ops.encoder import FrameSpec, make_payload
    from jrc_tpu.utils.logging import CommLog, RadarLog
    from jrc_tpu.viz.heatmap import render_heatmap

    cfg = OFDMConfig()
    r, v, az, rcs = (float(x) for x in args.target.split(":"))
    targets = channel.Targets((r,), (v,), (az,), (rcs,))
    data_spec = FrameSpec(MCS[args.mcs], payload_bytes=args.payload_bytes,
                          packet_type=PacketType.DATA)
    ndp_spec = FrameSpec(MCS.QPSK_1_2, payload_bytes=24, packet_type=PacketType.NDP)
    data_payload = jnp.asarray(make_payload(data_spec, bytes([2]) + b"jrc data"))
    ndp_payload = jnp.asarray(make_payload(ndp_spec, bytes([1])))

    state = jrc_trx.init_state(cfg)
    rlog, clog = RadarLog(args.radar_log), CommLog(args.comm_log)
    last_map = None
    n_ok = 0
    n_data = 0
    for d in range(args.dwells):
        is_ndp = args.ndp_every > 0 and d % args.ndp_every == args.ndp_every - 1
        spec = ndp_spec if is_ndp else data_spec
        pl = ndp_payload if is_ndp else data_payload
        res = jrc_trx.jrc_step(
            cfg, state, spec, pl, targets, key=jax.random.PRNGKey(d),
            radar_aided=args.radar_aided, phased_steering=args.phased,
            use_radar_streams=args.radar_streams,
            comm_noise_var=args.comm_noise_var,
        )
        state = res.state
        est = res.radar_est
        det = bool(np.asarray(est.detected))
        crc = bool(np.asarray(res.comm.decoded.crc_ok))
        if not is_ndp:
            n_data += 1
            n_ok += crc
        if det:
            rlog.log_detection(float(est.power), float(est.snr_db),
                               float(est.range_m), float(est.angle_deg))
        clog.log_frame(crc, int(spec.packet_type),
                       float(np.asarray(res.comm.eq.snr_legacy)),
                       float(np.asarray(res.comm.eq.snr_data)),
                       100.0 * (1 - n_ok / max(n_data, 1)))
        kind = "NDP " if is_ndp else "DATA"
        print(f"dwell {d} [{kind}]: crc={crc} radar det={det} "
              f"range={float(est.range_m):.2f} angle={float(est.angle_deg):.1f} "
              f"steer_angle={float(np.asarray(state.radar_angle)):.1f}")
        last_map = res.ra_map
    if last_map is not None and args.heatmap:
        rb = np.linspace(0, channel.C_LIGHT * cfg.fft_len / (2 * cfg.sample_rate), 512)
        power = np.asarray(jax.jit(lambda m: jnp.abs(m) ** 2)(last_map))
        render_heatmap(power, rb, cfg.angle_axis(16), path=args.heatmap)
    print(f"PER: {100.0 * (1 - n_ok / max(n_data, 1)):.1f}% over {n_data} DATA frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
