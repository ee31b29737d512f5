"""Radar path: channel estimation, periodogram, detection (BASELINE config 3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jrc_tpu.config import MCS, OFDMConfig, PacketType
from jrc_tpu.ops import channel, radar
from jrc_tpu.ops.encoder import FrameSpec
from jrc_tpu.models import radar_chain

CFG = OFDMConfig()
SPEC = FrameSpec(MCS.QPSK_1_2, payload_bytes=50, packet_type=PacketType.NDP)
PAYLOAD = jnp.zeros(50, jnp.uint8).at[0].set(1)


def _run(targets, **kw):
    return radar_chain.radar_frame(CFG, SPEC, PAYLOAD, targets, key=jax.random.key(0), **kw)


@pytest.mark.parametrize("r,a", [(15.0, 20.0), (8.0, -30.0), (25.0, 0.0), (5.0, 45.0)])
def test_single_target_position(r, a):
    res = _run(channel.Targets((r,), (0.0,), (a,), (10.0,)))
    est = res.estimate
    assert bool(est.detected)
    assert abs(float(est.range_m) - r) < 0.6  # within half a native range bin
    assert abs(float(est.angle_deg) - a) < 2.0  # within an interp angle bin


def test_two_targets_both_visible():
    """The reference overwrites per-target (only the last visible); we sum —
    both targets must appear in the map."""
    res = _run(channel.Targets((8.0, 22.0), (0.0, 0.0), (-30.0, 35.0), (10.0, 10.0)))
    p = np.abs(np.asarray(res.ra_map)) ** 2
    rb = np.linspace(0, channel.C_LIGHT * 64 / (2 * CFG.sample_rate), 512)
    ab = CFG.angle_axis(16)
    r1 = np.argmin(np.abs(rb - 8.0)); a1 = np.argmin(np.abs(ab - (-30.0)))
    r2 = np.argmin(np.abs(rb - 22.0)); a2 = np.argmin(np.abs(ab - 35.0))
    peak = p.max()
    # both local neighborhoods carry the expected power: target 2 is ~ (8/22)^4
    # of target 1 by the radar equation (amplitude ∝ 1/R²)
    assert p[r1 - 4 : r1 + 5, a1 - 3 : a1 + 4].max() > 0.5 * peak
    ratio = p[r2 - 4 : r2 + 5, a2 - 3 : a2 + 4].max() / peak
    expect = (8.0 / 22.0) ** 4
    assert 0.3 * expect < ratio < 3.0 * expect


def test_detection_threshold_no_target_noise_only():
    """Pure-noise input must not produce a >=15 dB detection."""
    key = jax.random.key(3)
    h = jax.random.normal(key, (8, 64), jnp.float32) + 1j * jax.random.normal(
        jax.random.key(4), (8, 64), jnp.float32
    )
    ra = radar.range_angle_map(h.astype(jnp.complex64))
    rb = jnp.asarray(np.linspace(0, 76.8, 512), jnp.float32)
    ab = jnp.asarray(CFG.angle_axis(16), jnp.float32)
    est = radar.range_angle_estimate(ra, rb, ab)
    assert not bool(est.detected)


def test_background_removal_suppresses_static_clutter():
    clutter = channel.Targets((12.0,), (0.0,), (10.0,), (100.0,))
    bg = radar.init_background(8, CFG.n_virtual, CFG.fft_len)
    # fill background with the static scene
    for i in range(4):
        res = radar_chain.radar_frame(
            CFG, SPEC, PAYLOAD, clutter, key=jax.random.key(i), background=bg
        )
        bg = res.background
    res = radar_chain.radar_frame(
        CFG, SPEC, PAYLOAD, clutter, key=jax.random.key(9), background=bg
    )
    # after removal the static target power collapses
    cleaned_peak = float(abs(res.ra_map).max())
    res_nobg = radar_chain.radar_frame(CFG, SPEC, PAYLOAD, clutter, key=jax.random.key(9))
    raw_peak = float(abs(res_nobg.ra_map).max())
    assert cleaned_peak < 0.05 * raw_peak


def test_channel_estimate_orthogonality():
    """With the P-matrix LTFs, a single-TX-path channel separates cleanly:
    per-(tx,rx) estimates reproduce per-antenna phases."""
    res = _run(channel.Targets((10.0,), (0.0,), (25.0,), (10.0,)))
    h = np.asarray(res.chan)  # (8 rx-major, 64)
    # phase progression across the virtual array at the active carriers
    active = CFG.active_carrier_idx
    ph = np.angle(np.sum(h[1:, active] * np.conj(h[:-1, active]), axis=1))
    expect = np.pi * np.sin(np.deg2rad(25.0))
    np.testing.assert_allclose(ph, expect, atol=0.15)


def test_fft_peak_detect_tone():
    n = 256
    fs = 1000.0
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * 125.0 * t)
    spec = jnp.fft.fft(jnp.asarray(x))
    pk = radar.fft_peak_detect(spec, fs, samp_protect=2)
    assert bool(pk.detected)
    assert abs(float(pk.freq) - 125.0) < fs / n
    # negative frequency side
    x2 = np.exp(-2j * np.pi * 200.0 * t)
    pk2 = radar.fft_peak_detect(jnp.fft.fft(jnp.asarray(x2)), fs, samp_protect=2)
    assert abs(float(pk2.freq) + 200.0) < fs / n


def test_doppler_phase_progression():
    """A moving target imposes the expected Doppler phase ramp across time."""
    v = 30.0
    tx = jnp.ones((1, 4000), jnp.complex64)
    pos = channel.virtual_positions(1, 1, channel.C_LIGHT / CFG.center_freq)
    rx = channel.apply_targets(
        tx, channel.Targets((10.0,), (v,), (0.0,), (10.0,)),
        sample_rate=CFG.sample_rate, center_freq=CFG.center_freq, pos_virtual=pos,
    )
    y = np.asarray(rx[0])
    f_d = 2 * v * CFG.center_freq / channel.C_LIGHT
    # interior samples only: the circular delay wraps the block edges
    inst = np.angle(y[1000:3000] * np.conj(y[999:2999])).mean() * CFG.sample_rate / (2 * np.pi)
    assert abs(inst - f_d) < 0.05 * f_d + 1.0


def test_background_record_toggle_clutter_suppression():
    """Reference set_background_record semantics: calibrate the clutter
    buffer with the static scene, freeze it, then a target that appears is
    detected while the static clutter stays suppressed."""
    from jrc_tpu.models import jrc_trx
    from jrc_tpu.ops.encoder import make_payload

    SPEC_D = FrameSpec(MCS.QPSK_3_4, payload_bytes=64, packet_type=PacketType.DATA)
    PAYLOAD_D = jnp.asarray(make_payload(SPEC_D, bytes([2]) + b"clutter test"))
    clutter = channel.Targets(ranges=(25.0,), velocities=(0.0,),
                              azimuths=(-20.0,), rcs=(40.0,))
    both = channel.Targets(ranges=(25.0, 10.0), velocities=(0.0, 0.0),
                           azimuths=(-20.0, 15.0), rcs=(40.0, 10.0))
    st = jrc_trx.init_state(CFG, record_len=4)

    # calibration: record the clutter-only scene
    for d in range(4):
        r = jrc_trx.jrc_step(CFG, st, SPEC_D, PAYLOAD_D, clutter,
                             key=jax.random.key(50 + d), radar_aided=False,
                             background_record=True, comm_noise_var=1e-4)
        st = r.state
    # operation: recording frozen, new target appears
    r = jrc_trx.jrc_step(CFG, st, SPEC_D, PAYLOAD_D, both,
                         key=jax.random.key(60), radar_aided=False,
                         background_record=False, comm_noise_var=1e-4)
    assert bool(r.radar_est.detected)
    # the strong static clutter (40 m2 at 25 m / -20 deg) is suppressed; the
    # weak new target (10 m2 at 10 m / +15 deg) wins the argmax
    assert abs(float(r.radar_est.range_m) - 10.0) < 0.7, float(r.radar_est.range_m)
    assert abs(float(r.radar_est.angle_deg) - 15.0) < 2.5, float(r.radar_est.angle_deg)


def test_multi_target_range_angle_estimate():
    """CLEAN-style iteration resolves BOTH simulated targets (the single-
    peak estimator — reference parity — reports only the stronger one)."""
    from jrc_tpu.models import radar_chain
    from jrc_tpu.ops.encoder import FrameSpec, make_payload
    from jrc_tpu.config import MCS, PacketType

    targets = channel.Targets((12.0, 5.0), (0.0, 0.0), (25.0, -20.0),
                              (10.0, 10.0))
    spec = FrameSpec(MCS.QPSK_1_2, payload_bytes=30, packet_type=PacketType.NDP)
    payload = jnp.asarray(make_payload(spec, bytes([1]) + bytes(26)))
    res = radar_chain.radar_frame(CFG, spec, payload, targets,
                                  key=jax.random.PRNGKey(0))
    est = radar.range_angle_estimate_multi(
        res.ra_map,
        jnp.asarray(radar.range_axis(CFG.fft_len, CFG.sample_rate)),
        jnp.asarray(CFG.angle_axis(16), jnp.float32),
        max_targets=3,
    )
    det = np.asarray(est.detected)
    assert det[0] and det[1]
    found = {(round(float(r)), round(float(a)))
             for r, a, d in zip(np.asarray(est.range_m),
                                np.asarray(est.angle_deg), det) if d}
    assert any(abs(r - 12) <= 1 and abs(a - 25) <= 3 for r, a in found)
    assert any(abs(r - 5) <= 1 and abs(a + 20) <= 3 for r, a in found)


# ---------------------------------------------------------------------------
# 2-D CA-CFAR (beyond the reference's fixed-threshold global-peak detector)
# ---------------------------------------------------------------------------


def test_cfar_false_alarm_rate_pinned():
    """On pure exponential noise the measured false-alarm rate tracks the
    designed pfa (the whole point of CFAR: threshold adapts to the local
    floor so pfa is held regardless of the absolute noise level)."""
    rng = np.random.default_rng(0)
    for scale in (1.0, 1e6):  # absolute level must not matter
        pwr = rng.exponential(scale, (512, 128)).astype(np.float32)
        res = radar.cfar_detect(jnp.asarray(pwr), pfa=1e-3)
        n = int(res.n_detections)
        n_cells = 512 * 128
        # E[alarms] = 65.5; CA-CFAR's estimation loss widens the spread a
        # little — accept a generous but still order-pinning band
        assert 15 <= n <= 260, (scale, n)


def test_cfar_detects_weak_target_next_to_strong():
    """Two point responses 30 dB apart in a uniform noise floor: the
    adaptive threshold detects both, where a global fixed threshold set for
    the strong return would bury the weak one."""
    rng = np.random.default_rng(1)
    pwr = rng.exponential(1.0, (512, 128)).astype(np.float32)
    pwr[100, 40] += 1e5  # strong target
    pwr[400, 90] += 1e2  # weak target, 30 dB down, still ~20 dB over noise
    res = radar.cfar_detect(jnp.asarray(pwr), pfa=1e-6)
    det = np.asarray(res.detections)
    assert det[100, 40] and det[400, 90]
    # localized: no blanket of detections
    assert int(res.n_detections) < 20


def test_cfar_guard_cells_protect_target_skirt():
    """A target's own energy inside the guard window must not raise its
    noise estimate: a peak spread over a few cells is still detected."""
    rng = np.random.default_rng(2)
    pwr = rng.exponential(1.0, (256, 128)).astype(np.float32)
    # peak with skirt (3x3) well inside the default guard window
    for dr in (-1, 0, 1):
        for da in (-1, 0, 1):
            pwr[60 + dr, 60 + da] += 3e3 if (dr, da) == (0, 0) else 3e2
    res = radar.cfar_detect(jnp.asarray(pwr), pfa=1e-6)
    assert bool(np.asarray(res.detections)[60, 60])


def test_cfar_edge_cells_normalized():
    """Corner cells have a truncated training ring; the per-cell count
    normalization keeps thresholds finite and detection alive at the edge."""
    rng = np.random.default_rng(3)
    pwr = rng.exponential(1.0, (128, 64)).astype(np.float32)
    pwr[0, 0] += 1e4
    pwr[127, 63] += 1e4
    res = radar.cfar_detect(jnp.asarray(pwr), pfa=1e-6)
    det = np.asarray(res.detections)
    assert det[0, 0] and det[127, 63]
    assert np.isfinite(np.asarray(res.threshold)).all()


def test_cfar_on_real_radar_map():
    """End-to-end: range-direction CFAR (train cells along range only) on
    the radar chain's own map flags the injected target's range at its
    beam, and detections stay local to the target's range ring.

    The angle dimension is excluded from the training ring on purpose: with
    8 virtual elements and no taper, the angle sidelobe skirt sits only
    ~8 dB below the peak across the whole axis, so 2-D training cells are
    target-contaminated — a physical property of the unwindowed map, not of
    the detector (the synthetic tests above pin the 2-D behavior)."""
    res = _run(channel.Targets((12.0,), (0.0,), (25.0,), (10.0,)),
               noise_var=1e-8)
    from jrc_tpu.ops import cplx as cx

    pwr = np.asarray(cx.abs2(res.ra_map))
    cf = radar.cfar_detect(jnp.asarray(pwr), guard=(8, 0), train=(24, 0),
                           pfa=1e-4)
    est = res.estimate
    ri = int(est.range_idx)
    det = np.asarray(cf.detections)
    assert det[ri, int(est.angle_idx)]
    # the mask is sparse (target ridge + the guard-band picket-fence range
    # sidelobes that are genuinely part of this map), not a blanket
    assert int(cf.n_detections) < 0.03 * det.size, int(cf.n_detections)
    # and the strongest detected cell IS the target's range bin
    masked = np.where(det, pwr, 0.0)
    assert int(np.unravel_index(np.argmax(masked), pwr.shape)[0]) == ri


def test_range_window_suppresses_sidelobes():
    """Aperture taper folded into the range DFT matrix: on a clean
    flat-spectrum point response, hann pushes the first range sidelobe
    from the rectangular −13 dB to below −30 dB, peak within one bin."""
    from jrc_tpu.ops import cplx as cx

    tau_bins = 20.25  # off-grid delay so sidelobes are exercised
    sc = np.arange(CFG.fft_len)
    h = np.exp(-2j * np.pi * sc * tau_bins / CFG.fft_len)
    hv = np.broadcast_to(h, (CFG.n_virtual, CFG.fft_len)).astype(np.complex64)

    def col(window_range):
        m = radar.range_angle_map(cx.from_complex(jnp.asarray(hv)),
                                  window_range=window_range)
        pwr = np.asarray(cx.abs2(m))
        ai = int(pwr.max(axis=0).argmax())
        return pwr[:, ai]

    for win, max_sl_db in [(None, -12.0), ("hann", -30.0)]:
        c = col(win)
        ri = int(c.argmax())
        assert abs(ri - 20.25 * 8) <= 8, (win, ri)  # peak within 1 native bin
        sk = c.copy()
        lo, hi = max(0, ri - 24), ri + 25
        sk[lo:hi] = 0
        sl_db = 10 * np.log10(sk.max() / c[ri])
        assert sl_db < max_sl_db, (win, sl_db)


def test_window_is_parity_neutral_by_default():
    """window=None reproduces the reference-parity map bit-exactly."""
    from jrc_tpu.ops import cplx as cx

    rng = np.random.default_rng(0)
    h = (rng.normal(size=(CFG.n_virtual, CFG.fft_len, 2)) @ [1, 1j]
         ).astype(np.complex64)
    a = np.asarray(radar.range_angle_map(cx.from_complex(jnp.asarray(h))))
    b = np.asarray(radar.range_angle_map(
        cx.from_complex(jnp.asarray(h)), window_range=None, window_angle=None))
    np.testing.assert_array_equal(a, b)


def test_angle_axis_unbiased():
    """The axis matches the shifted angle DFT's bin mapping (slot k holds
    bin k − n/2): clean point-target angle errors are zero-mean
    quantization, not one-sided (the reference GUI's +0.5-bin offset is a
    deliberate deviation documented in config.angle_axis)."""
    errs = []
    for az in (-40.0, -25.0, -10.0, 0.0, 10.0, 25.0, 40.0):
        res = _run(channel.Targets((12.0,), (0.0,), (az,), (10.0,)))
        errs.append(float(res.estimate.angle_deg) - az)
    errs = np.asarray(errs)
    bin_deg = 0.9  # ~interp bin at broadside
    assert np.abs(errs).max() < bin_deg, errs
    assert abs(errs.mean()) < 0.35 * bin_deg, errs  # zero-mean, not biased
