"""System configurations composed from ops kernels — the framework's "model
families", mirroring the reference's five flowgraph applications:

    comm_link   — SISO/MIMO OFDM communication loopback (configs 1-2)
    radar_chain — radar-only path: NDP → channel est → range-angle map (config 3)
    jrc_trx     — full JRC with radar-assisted precoding closed loop (config 4)
    streaming   — time-block sharded continuous RX (config 5)
"""
