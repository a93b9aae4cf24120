"""CFO/STO estimation and compensation against injected impairments —
the reference's fault-injection surface (SURVEY.md §5.3) closed into a
loop: inject (apply_offsets semantics) -> estimate_offsets ->
compensate_offsets -> demodulate."""

import numpy as np
import pytest
import jax

from lora_phy_tpu.models import modem
from lora_phy_tpu.ops.impair import (
    apply_awgn,
    apply_cfo,
    apply_cfo_continuous,
    apply_time_shift,
)
from lora_phy_tpu.utils.params import LoraParams


def _dechirped(p, payload_len=16, seed=0):
    rng = np.random.RandomState(seed)
    payload = rng.randint(0, 256, payload_len).astype(np.uint8)
    syms = modem.encode(payload)
    iq = modem.modulate(syms, p)
    return payload, np.asarray(modem.dechirp(iq, p))


def test_estimate_offsets_clean():
    p = LoraParams(sf=7)
    _, dech = _dechirped(p)
    cfo, to = modem.estimate_offsets(dech[: 2 * p.step], p)
    # clean sync symbols: estimate dominated by the sync bins
    # (sw0=8, sw1=16 at SF7 -> avg 12/128 = 0.094, the reference's own
    # measured value on clean loopback)
    np.testing.assert_allclose(float(cfo), 0.0903, atol=5e-3)
    assert abs(float(to)) < 1.0


# 0.45 bins sits at the argmax half-bin decision boundary, where symbol
# flips are expected (same in the reference); stay inside the pull-in range
@pytest.mark.parametrize("cfo_frac", [-0.3, 0.2])
def test_cfo_estimate_compensate_loop(cfo_frac):
    """The estimator's coarse and fine terms interact (the reference adds
    both, double-counting continuous rotations), so its absolute value is
    not linear in the injection — but closed-loop behaviour must hold:
    estimate -> compensate -> the residual estimate returns to the clean
    baseline within a fraction of a bin, and the payload decodes."""
    p = LoraParams(sf=7)
    payload, dech = _dechirped(p)
    base_cfo, _ = modem.estimate_offsets(dech[: 2 * p.step], p)
    rotated = np.asarray(apply_cfo_continuous(dech, cfo_frac, p.n, p.osr))

    cfo, to = modem.estimate_offsets(rotated[: 2 * p.step], p)
    fixed = np.asarray(modem.compensate_offsets(rotated, p, cfo - base_cfo, to))
    resid, _ = modem.estimate_offsets(fixed[: 2 * p.step], p)
    assert abs(float(resid) - float(base_cfo)) <= abs(float(cfo) - float(base_cfo)) + 0.3 / p.n

    res = modem.demodulate(rotated, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payload)


def test_compensate_inverts_cfo():
    p = LoraParams(sf=7)
    payload, dech = _dechirped(p)
    impaired = np.asarray(apply_cfo_continuous(dech, 0.3, p.n, p.osr))
    # compensate with the known injected offset
    fixed = np.asarray(modem.compensate_offsets(impaired, p, 0.3, 0.0))
    np.testing.assert_allclose(fixed, dech, atol=1e-4)


def test_compensate_inverts_time_shift():
    p = LoraParams(sf=7)
    payload, dech = _dechirped(p)
    shifted = np.asarray(apply_time_shift(dech, 5))
    fixed = np.asarray(modem.compensate_offsets(shifted, p, 0.0, 5.0))
    # interior samples restored exactly (edges zero-filled)
    np.testing.assert_allclose(fixed[8:-8], dech[8:-8], atol=1e-6)


@pytest.mark.parametrize("shift", [-3, 2, 6])
def test_demod_resilient_to_small_timing_shift(shift):
    """The demodulator's own TO estimate + guarded shift recovers payloads
    under small injected timing offsets (reference apply_offsets range)."""
    p = LoraParams(sf=7)
    payload, dech = _dechirped(p, payload_len=12)
    impaired = np.asarray(apply_time_shift(dech, shift))
    res = modem.demodulate(impaired, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payload)


def test_demod_resilient_to_fractional_cfo_with_noise():
    p = LoraParams(sf=8)
    payload, dech = _dechirped(p, payload_len=12)
    impaired = np.asarray(apply_cfo_continuous(dech, 0.25, p.n, p.osr))
    impaired = np.asarray(apply_awgn(jax.random.PRNGKey(3), impaired, 15.0))
    res = modem.demodulate(impaired, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payload)


def test_per_symbol_cfo_wrap_matches_reference_injector():
    """apply_cfo (per-symbol phase wrap, lora_phy_vector_generate.cpp:101-107)
    differs from the continuous injector only at symbol boundaries."""
    p = LoraParams(sf=7)
    _, dech = _dechirped(p, payload_len=4)
    a = np.asarray(apply_cfo(dech, 1.5, p.n, p.osr))
    b = np.asarray(apply_cfo_continuous(dech, 1.5, p.n, p.osr))
    np.testing.assert_allclose(a[: p.step], b[: p.step], atol=1e-5)
    assert not np.allclose(a[p.step: 2 * p.step], b[p.step: 2 * p.step])


def test_continuous_chirp_fixes_reference_osr2_fold():
    """TX intra-symbol fold convention (ops/chirp._chirp_phase,
    docs/SEMANTICS.md): the reference modulator's frequency fold
    (ChirpGenerator.hpp:38-41) triggers one sample early, leaving the
    post-fold segment a constant spurious phase of ``2*pi*bw_scale/osr``
    mod 2*pi. Invisible at osr=1 (=== 0 mod 2*pi), but at osr=2 it is a
    pi jump: the dechirped tone decimated at the NATURAL phase splits
    into equal twin peaks at sym +/- 1 — wrong-bin argmax for most
    symbols on a clean channel (the exact tone migrates to decimation
    phase 1, i.e. the waveform carries a built-in one-sample skew).
    ``continuous_chirp=True`` folds one sample later: bit-identical IQ
    at osr=1, and a mathematically exact zero-leakage single-bin tone at
    the natural decimation phase for every symbol at any osr — what a
    phase-continuous Semtech radio actually emits."""
    syms = np.arange(128, dtype=np.int32)

    # osr=1: the two conventions are bit-identical (spurious constant === 0)
    for sf in (7, 9):
        a = np.asarray(modem.modulate(syms, LoraParams(sf=sf, osr=1)))
        b = np.asarray(modem.modulate(
            syms, LoraParams(sf=sf, osr=1, continuous_chirp=True)))
        np.testing.assert_array_equal(a, b)

    def phase0_spectra(cont):
        p = LoraParams(sf=7, osr=2, continuous_chirp=cont)
        iq = np.asarray(modem.modulate(syms, p))
        dech = np.asarray(modem.dechirp(iq, p)).reshape(-1, p.n * p.osr)[2:]
        return np.abs(np.fft.fft(dech[:, :: p.osr], axis=-1))  # [S, N]

    # reference fold: natural-phase decimation misdetects ~half the
    # alphabet; the tone splits into equal half-power peaks at sym +/- 1
    spec = phase0_spectra(False)
    assert (spec.argmax(-1) != syms).sum() > 50
    s = spec[100]
    assert s[99] > 0.35 * 128 and abs(s[99] - s[101]) < 1e-2
    assert s[100] < 0.6 * 128

    # continuous fold: exact single-bin tone, zero leakage, every symbol
    spec = phase0_spectra(True)
    np.testing.assert_array_equal(spec.argmax(-1), syms)
    peak = spec[np.arange(128), syms]
    np.testing.assert_allclose(peak, 128.0, atol=1e-3)
    spec[np.arange(128), syms] = 0.0
    assert float(spec.max()) < 1e-2


def test_sro_tolerance_and_per_frame_resync():
    """Sample-rate offset (crystal mismatch, ops.impair.apply_sro — no
    counterpart in the reference's channel model): the block receiver
    re-syncs per frame, so the UNBOUNDED inter-frame drift is absorbed
    and only the intra-frame drift matters. Tolerance bound: the last
    payload window must stay within half a bin (= osr/2 samples), i.e.
    |ppm| < 0.5e6 * osr / frame_samples — ~32 ppm for these SF9 osr=2
    frames (30720 samples). +/-10 ppm (typical LoRa crystal spec) must
    decode every frame of a multi-frame stream cleanly.

    SF9 because all 8-bit simple-chain codewords are valid bins (at SF7
    the aliased codewords >= 128 put the intra-symbol fold mid-window,
    inherently fractional-delay-sensitive); osr=2 with
    continuous_chirp=True (at osr=1 the chirp sweeps to Nyquist where
    the resampler's linear interpolation is meaningless, and the
    reference fold convention is osr>1-defective — see
    test_continuous_chirp_fixes_reference_osr2_fold)."""
    import numpy as np

    from lora_phy_tpu.models import modem, stream, sync
    from lora_phy_tpu.ops import planar
    from lora_phy_tpu.ops.impair import apply_sro
    from lora_phy_tpu.utils.params import LoraParams

    p = LoraParams(sf=9, osr=2, continuous_chirp=True)
    rng = np.random.RandomState(17)
    pls = [rng.randint(0, 256, 8).astype(np.uint8) for _ in range(3)]
    # place each frame at a sub-symbol phase of +16 samples (well inside
    # the scan's +/- step/2 timing-correction range; a phase near step/2
    # sits on the tau wrap boundary and missyncs even without SRO)
    parts, pos = [], 0
    for pl in pls:
        gap = 800 + (16 - pos) % p.step
        parts.append(np.zeros(gap, np.complex64))
        pos += gap
        fr = np.asarray(stream.frame_modulate(
            np.asarray(modem.encode(pl), np.int32), p))
        parts.append(fr)
        pos += fr.size
    parts.append(np.zeros(1500, np.complex64))
    sig = np.concatenate(parts)

    for ppm in (10.0, -10.0):
        drifted = np.asarray(apply_sro(sig, ppm))
        re, im = planar.split_complex(drifted)
        blk = sync.receive_block_planar(re, im, p, 16, max_frames=4,
                                        min_power_db=-30.0)
        found = np.flatnonzero(np.asarray(blk.found))
        assert len(found) == 3, (ppm, found)
        for k, pl in zip(found, pls):
            dec = np.asarray(modem.decode(np.asarray(blk.symbols)[k]))
            np.testing.assert_array_equal(dec, pl, err_msg=f"ppm={ppm}")


@pytest.mark.parametrize("sf,osr,cont,ppm", [
    (9, 2, True, 30.0), (9, 2, True, -30.0),
    (9, 2, False, 30.0),          # reference fold -> phase osr-1 track
    (10, 4, True, -30.0),
    (9, 1, True, 60.0),
    (12, 2, True, 10.0),
])
def test_estimate_sro_accuracy(sf, osr, cont, ppm):
    """Decode-directed SRO estimator (planar.estimate_sro_planar /
    modem.estimate_sro — no reference counterpart): estimate within 15%
    of the injected drift, data-blind, for both TX fold conventions."""
    from lora_phy_tpu.ops import planar
    from lora_phy_tpu.ops.impair import apply_sro

    p = LoraParams(sf=sf, osr=osr, continuous_chirp=cont)
    rng = np.random.RandomState(3)
    payload = rng.randint(0, 256, 16).astype(np.uint8)
    iq = np.asarray(modem.modulate(modem.encode(payload), p))
    dech = modem.dechirp(apply_sro(iq, ppm), p)
    est = float(modem.estimate_sro(dech, p))
    assert abs(est - ppm) < 0.15 * abs(ppm), (est, ppm)
    # planar twin gets the identical number from split planes
    re, im = planar.split_complex(np.asarray(dech))
    est_p = float(planar.estimate_sro_planar(re, im, p))
    np.testing.assert_allclose(est_p, est, rtol=1e-5)
    # and a clean channel estimates ~0
    clean = modem.dechirp(iq, p)
    assert abs(float(modem.estimate_sro(clean, p))) < 0.5


def test_sro_closed_loop_compensation():
    """estimate_sro + compensate_sro close the crystal-mismatch loop:
    +/-60 ppm is ~2x beyond the SF9 no-tracking tolerance (~32 ppm —
    see test_sro_tolerance_and_per_frame_resync) and corrupts symbols;
    one estimate/compensate round restores an exact decode."""
    from lora_phy_tpu.ops.impair import apply_sro, compensate_sro

    p = LoraParams(sf=9, osr=2, continuous_chirp=True)
    rng = np.random.RandomState(5)
    payload = rng.randint(0, 256, 16).astype(np.uint8)
    syms = np.asarray(modem.encode(payload), np.int32)
    iq = np.asarray(modem.modulate(syms, p))

    for ppm in (60.0, -60.0):
        drifted = np.asarray(apply_sro(iq, ppm))
        raw = np.asarray(modem.demodulate(modem.dechirp(drifted, p), p).symbols)
        assert (raw != syms).sum() > 0, "60 ppm should corrupt w/o tracking"
        est = float(modem.estimate_sro(modem.dechirp(drifted, p), p))
        fixed = modem.dechirp(compensate_sro(drifted, est), p)
        out = np.asarray(modem.demodulate(fixed, p).symbols)
        np.testing.assert_array_equal(out, syms, err_msg=f"ppm={ppm}")
        dec = np.asarray(modem.decode(out))
        np.testing.assert_array_equal(dec, payload)


# --- multipath channel (no reference counterpart: its model is CFO +
# integer shift + AWGN only, lora_phy_vector_generate.cpp:88-124) -------


def test_multipath_planar_matches_complex():
    from lora_phy_tpu.ops.impair import apply_multipath, apply_multipath_planar

    rng = np.random.RandomState(5)
    x = (rng.randn(2, 300) + 1j * rng.randn(2, 300)).astype(np.complex64)
    taps = np.array([0.8, 0, 0.4 - 0.3j, 0.1j], np.complex64)
    ref = np.asarray(apply_multipath(x, taps))
    yr, yi = apply_multipath_planar(
        x.real.astype(np.float32), x.imag.astype(np.float32),
        taps.real.astype(np.float32), taps.imag.astype(np.float32))
    np.testing.assert_allclose(np.asarray(yr), ref.real, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yi), ref.imag, atol=1e-5)
    # causality: first output sample is tap0 * first input only
    np.testing.assert_allclose(ref[:, 0], 0.8 * x[:, 0], atol=1e-6)


def test_demod_survives_two_ray_multipath():
    """A strong echo (-6 dB, 3-sample excess delay — a severe outdoor
    profile at 125 kHz) leaves every symbol decision intact: CSS tones
    stay tones under LTI channels, each bin just picks up H(f)."""
    from lora_phy_tpu.models import stream, sync
    from lora_phy_tpu.ops import planar
    from lora_phy_tpu.ops.impair import apply_multipath

    p = LoraParams(sf=7)
    rng = np.random.RandomState(6)
    payload = rng.randint(0, 256, 16).astype(np.uint8)
    syms = np.asarray(modem.encode(payload), np.int32)
    frame = np.asarray(stream.frame_modulate(syms, p))
    sig = np.zeros(frame.size + 6 * p.step, np.complex64)
    sig[2 * p.step: 2 * p.step + frame.size] = frame
    taps = np.array([1.0, 0, 0, 0.5 * np.exp(1j * 2.1)], np.complex64)
    y = np.asarray(apply_multipath(sig, taps))

    re, im = planar.split_complex(y)
    blk = sync.receive_block_planar(re, im, p, payload.size * 2)
    found = np.flatnonzero(np.asarray(blk.found))
    assert found.size == 1
    k = int(found[0])
    np.testing.assert_array_equal(
        np.asarray(modem.decode(np.asarray(blk.symbols)[k])), payload)


def test_rayleigh_ensemble_mostly_decodes():
    """Random Rayleigh draws on an exponential power-delay profile:
    most channel realisations decode (deep flat fades cost the rest —
    at 20 dB SNR the failures are the faded-draw tail, not the demod)."""
    from lora_phy_tpu.models import stream, sync
    from lora_phy_tpu.ops import planar
    from lora_phy_tpu.ops.impair import apply_awgn, apply_multipath, rayleigh_taps

    p = LoraParams(sf=7)
    rng = np.random.RandomState(7)
    payload = rng.randint(0, 256, 8).astype(np.uint8)
    syms = np.asarray(modem.encode(payload), np.int32)
    frame = np.asarray(stream.frame_modulate(syms, p))
    sig = np.zeros(frame.size + 6 * p.step, np.complex64)
    sig[2 * p.step: 2 * p.step + frame.size] = frame

    ok = 0
    trials = 12
    for i in range(trials):
        key = jax.random.PRNGKey(100 + i)
        taps = rayleigh_taps(key, delays=(0, 1, 3, 6),
                             pdp_db=(0.0, -3.0, -6.0, -9.0))
        y = apply_multipath(sig, taps)
        y = np.asarray(apply_awgn(jax.random.PRNGKey(500 + i), y, 20.0))
        re, im = planar.split_complex(y)
        blk = sync.receive_block_planar(re, im, p, payload.size * 2,
                                        min_power_db=-30.0)
        for k in np.flatnonzero(np.asarray(blk.found)):
            if np.array_equal(
                    np.asarray(modem.decode(np.asarray(blk.symbols)[k])),
                    payload):
                ok += 1
                break
    assert ok >= trials - 2, f"only {ok}/{trials} Rayleigh draws decoded"


# --- analog front-end defects (DC offset / IQ imbalance): no reference
# counterpart — its channel model has no front end at all ---------------


def test_frontend_estimate_compensate_loop():
    """Blind estimation recovers injected front-end parameters from the
    signal statistics, and compensation inverts the defect to the
    linear-algebra floor."""
    from lora_phy_tpu.models import stream
    from lora_phy_tpu.ops.impair import (apply_frontend,
                                         compensate_frontend_planar,
                                         estimate_frontend_planar)

    p = LoraParams(sf=7)
    rng = np.random.RandomState(8)
    pl = rng.randint(0, 256, 8).astype(np.uint8)
    syms = np.asarray(modem.encode(pl), np.int32)
    s = np.asarray(stream.frame_modulate(syms, p))
    bad = np.asarray(apply_frontend(s, dc=0.08 - 0.05j,
                                    gain_imbalance=1.25,
                                    phase_skew_deg=8.0))
    re = bad.real.astype(np.float32)
    im = bad.imag.astype(np.float32)
    dc_i, dc_q, g, sin_phi = estimate_frontend_planar(re, im)
    assert abs(float(g) - 1.25) < 0.01
    assert abs(float(sin_phi) - np.sin(np.radians(8.0))) < 0.01
    # DC precision is limited by the signal's own mean (partial sweeps in
    # the 2.25-downchirp SFD and payload don't integrate to exactly zero)
    assert abs(float(dc_i) - 0.08) < 0.03
    assert abs(float(dc_q) + 0.05) < 0.03
    cr, ci = compensate_frontend_planar(re, im, dc_i, dc_q, g, sin_phi)
    err = max(float(np.max(np.abs(np.asarray(cr) - s.real))),
              float(np.max(np.abs(np.asarray(ci) - s.imag))))
    assert err < 0.05


def test_frontend_correction_rescues_deep_sic():
    """An IQ imbalance leaks a mirrored image of every chirp at
    |1 - g*e^{j*phi}|/2 (~ -19 dB here); a weak colliding frame below
    that image floor is unrecoverable by SIC until the front end is
    blindly corrected."""
    from lora_phy_tpu.models import sic, stream
    from lora_phy_tpu.ops.impair import (apply_frontend,
                                         compensate_frontend_planar,
                                         estimate_frontend_planar)

    p = LoraParams(sf=7)
    rng = np.random.RandomState(2)
    pay_a = rng.randint(0, 256, 6).astype(np.uint8)
    pay_b = rng.randint(0, 256, 6).astype(np.uint8)
    fa = np.asarray(stream.frame_modulate(
        np.asarray(modem.encode(pay_a), np.int32), p))
    fb = 0.07 * np.asarray(stream.frame_modulate(
        np.asarray(modem.encode(pay_b), np.int32), p))
    s = np.zeros(7 * p.step + fb.size + 4 * p.step, np.complex64)
    s[2 * p.step: 2 * p.step + fa.size] += fa
    s[7 * p.step: 7 * p.step + fb.size] += fb.astype(np.complex64)
    bad = np.asarray(apply_frontend(s, dc=0.05 - 0.03j,
                                    gain_imbalance=1.2,
                                    phase_skew_deg=6.0))
    re = bad.real.astype(np.float32)
    im = bad.imag.astype(np.float32)

    def weak_ok(r, i):
        frames, _ = sic.receive_sic_planar(np.asarray(r), np.asarray(i),
                                           p, 12)
        return any(np.array_equal(
            np.asarray(modem.decode(f["symbols"])), pay_b) for f in frames)

    assert not weak_ok(re, im)
    cr, ci = compensate_frontend_planar(
        re, im, *estimate_frontend_planar(re, im))
    assert weak_ok(cr, ci)


def test_sro_zero_ppm_is_identity():
    """apply_sro(x, 0) must be exact identity including the LAST sample
    (ADVICE r2: the old validity mask required a right neighbour even at
    frac == 0, zeroing the endpoint of every identity resample)."""
    from lora_phy_tpu.ops.impair import apply_sro

    rng = np.random.RandomState(3)
    x = (rng.randn(257) + 1j * rng.randn(257)).astype(np.complex64)
    y = np.asarray(apply_sro(x, 0.0))
    np.testing.assert_array_equal(y, x)
    # planar (float) path too
    yr = np.asarray(apply_sro(x.real.copy(), 0.0))
    np.testing.assert_array_equal(yr, x.real)
