"""UDP packet-generator ingress → TX apps → decoded PDU egress.

The reference's traffic source is UDP PDUs on port 52001 into
stream_encoder (README.md:45-46, lib/stream_encoder_impl.cc:109-118); the
decoded payloads leave through socket_pdu. This drives the same loop
end-to-end: an external sender's datagrams arrive decoded at the RX socket,
type byte honored, exact lengths preserved (the pdu_len contract).
"""
import socket
import threading
import time

import numpy as np


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class _Sender:
    """Resends the datagram set until stopped — robust to the app binding
    its ingress socket a moment after the thread starts (UDP pre-bind sends
    are silently lost; the app dedups nothing, but it only consumes
    ``frames`` datagrams, in arrival order)."""

    def __init__(self, port: int, datagrams):
        self.addr = ("127.0.0.1", port)
        self.datagrams = datagrams
        self.stop = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)

    def _loop(self):
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        while not self.stop.is_set():
            for d in self.datagrams:
                sock.sendto(d, self.addr)
                time.sleep(0.05)
            time.sleep(0.4)
        sock.close()

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.stop.set()
        self.thread.join(timeout=2)


def _recv_all(sock, n, deadline_s=15.0):
    out = []
    t0 = time.monotonic()
    while len(out) < n and time.monotonic() - t0 < deadline_s:
        try:
            data, _ = sock.recvfrom(65536)
            out.append(data)
        except socket.timeout:
            pass
    return out


def test_comm_sim_udp_end_to_end(tmp_path):
    """comm_sim --udp-in/--udp-out: 3 externally-sent datagrams (mixed DATA
    lengths + one NDP) come back decoded, byte-exact."""
    from apps import comm_sim

    in_port, out_port = _free_port(), _free_port()
    listener = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    listener.bind(("127.0.0.1", out_port))
    listener.settimeout(0.5)
    datagrams = [
        bytes([2]) + b"udp data frame one",
        bytes([2]) + b"a longer udp data frame with a different length!",
        bytes([1]) + b"ndp sounding pdu",
    ]
    try:
        with _Sender(in_port, datagrams):
            rc = comm_sim.main([
                "--cpu", "--frames", "3", "--snr-db", "30",
                "--steering", "none", "--ndp-every", "0",
                "--udp-in", str(in_port), "--udp-out", str(out_port),
                "--udp-timeout", "60",
                "--comm-log", str(tmp_path / "comm_log.csv"),
            ])
        assert rc == 0
        got = _recv_all(listener, 3)
    finally:
        listener.close()
    # arrival order can rotate (pre-bind sends are lost) — compare as sets
    assert sorted(got) == sorted(datagrams), got


def test_jrc_trx_udp_end_to_end(tmp_path):
    """jrc_trx --udp-in/--udp-out: UDP payloads ride the full JRC dwell loop
    (TRX cadence + radar leg + comm leg) and come back decoded. Frame 0 is
    allowed to miss: the radar-aided steering loop has not closed yet on the
    first dwell (the tests/test_jrc.py steady-state contract)."""
    from apps import jrc_trx

    in_port, out_port = _free_port(), _free_port()
    listener = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    listener.bind(("127.0.0.1", out_port))
    listener.settimeout(0.5)
    pdu = bytes([2]) + b"jrc over udp"
    try:
        with _Sender(in_port, [pdu]):
            rc = jrc_trx.main([
                "--cpu", "--frames", "3", "--heatmap", "",
                "--udp-in", str(in_port), "--udp-out", str(out_port),
                "--udp-timeout", "120",
                "--radar-log", str(tmp_path / "radar_log.csv"),
                "--comm-log", str(tmp_path / "comm_log.csv"),
            ])
        assert rc == 0
        got = _recv_all(listener, 2)
    finally:
        listener.close()
    assert len(got) >= 2, got  # steady-state frames all decode
    assert all(g == pdu for g in got), got
