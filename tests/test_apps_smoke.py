"""CLI surface smoke tests: every app entry point runs end-to-end with tiny
arguments and produces its contract outputs. (comm_rx / jrc_trx / comm_sim
are exercised more deeply in test_udp_apps.py and the verify drives; this
file pins the remaining surface + new round-5 flags.)"""
import numpy as np


def test_alignment_app(capsys):
    from apps import alignment

    rc = alignment.main(["--cpu", "--n-samples", "2048"])
    assert rc == 0
    out = capsys.readouterr().out
    # one calibration line per (tx, rx) pair, each with a resolved phase
    assert out.count("phase=") >= 8


def test_ber_sweep_app(tmp_path, capsys):
    from apps import ber_sweep

    csv = tmp_path / "ber.csv"
    rc = ber_sweep.main([
        "--cpu", "--snrs", "25", "--frames", "4",
        "--mcs", "QPSK_1_2", "--payload-bytes", "32",
        "--csv", str(csv),
    ])
    assert rc == 0
    lines = csv.read_text().strip().splitlines()
    assert len(lines) >= 2  # header + one point
    # at 25 dB QPSK-1/2 must be error-free
    out = capsys.readouterr().out
    assert "per=0.000" in out


def test_radar_sim_app_round5_flags(tmp_path, capsys):
    from apps import radar_sim

    rc = radar_sim.main([
        "--cpu", "--dwells", "1", "--heatmap", "",
        "--window-range", "hann", "--cfar", "--max-targets", "2",
        "--radar-log", str(tmp_path / "radar_log.csv"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "detected=True" in out
    assert "cfar:" in out and "peak bin detected=True" in out


def test_comm_sim_app_sta_soft(tmp_path, capsys):
    from apps import comm_sim

    rc = comm_sim.main([
        "--cpu", "--frames", "3", "--snr-db", "28", "--steering", "none",
        "--ndp-every", "0", "--estimator", "sta", "--soft",
        "--comm-log", str(tmp_path / "comm_log.csv"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("crc=True") == 3


def test_comm_rx_mesh_mode(capsys):
    """--mesh N: the whole demo capture decodes in one time-block sharded
    step over a virtual mesh (config 5 from the CLI), static and dynamic."""
    from apps import comm_rx

    for extra in ([], ["--dynamic", "--max-payload", "96"]):
        rc = comm_rx.main(["--cpu", "--demo", "--mesh", "4",
                           "--block-len", "16384"] + extra)
        assert rc == 0
        out = capsys.readouterr().out
        line = [l for l in out.splitlines() if l.startswith("mesh=")][-1]
        frames = int(line.split("frames=")[1].split()[0])
        crc_ok = int(line.split("crc_ok=")[1].split()[0])
        assert frames == crc_ok > 0, line
