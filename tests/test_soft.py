"""Soft-decision decoding: noiseless equivalence with the hard chain and
a statistical AWGN advantage gate (soft ML corrects what the hard
detect-only parity codes cannot)."""

import jax
import numpy as np
import pytest

from lora_phy_tpu.models import coded, soft
from lora_phy_tpu.models.coded import CodedConfig
from lora_phy_tpu.ops import planar
from lora_phy_tpu.ops.impair import apply_awgn
from lora_phy_tpu.utils.params import LoraParams


def _spectra_for(bins, params):
    """Modulate coded bins (with sync) and come back through the
    demodulator's spectrum path."""
    re, im = planar.modulate_planar(np.asarray(bins, np.int32), params)
    dr, di = planar.dechirp_planar(re, im, params)
    mag2, sync, _, _ = planar.demodulate_spectrum_planar(dr, di, params)
    return np.asarray(mag2), sync


@pytest.mark.parametrize("cr", [1, 2, 3, 4])
@pytest.mark.parametrize("ldro", [False, True])
def test_soft_matches_hard_noiseless(cr, ldro):
    p = LoraParams(sf=8)
    cfg = CodedConfig(sf=8, cr=cr, ldro=ldro)
    rng = np.random.RandomState(cr)
    payload = rng.randint(0, 256, 24).astype(np.uint8)
    bins = np.asarray(coded.encode_payload(payload, cfg))

    mag2, sync = _spectra_for(bins, p)
    assert int(np.asarray(sync)) == p.sync_word
    out, crc_ok, margin = soft.decode_payload_soft(mag2, len(payload), cfg)
    assert np.array_equal(np.asarray(out), payload)
    assert bool(np.asarray(crc_ok))
    assert float(np.asarray(margin)) > 0.0

    hard, hard_ok, _ = coded.decode_payload(
        np.argmax(mag2, axis=-1).astype(np.uint16), len(payload), cfg)
    assert np.array_equal(np.asarray(hard), payload)


def _per(cr, snr_db, n_frames, soft_path, sf=7, payload_len=12, seed=0):
    p = LoraParams(sf=sf)
    cfg = CodedConfig(sf=sf, cr=cr)
    rng = np.random.RandomState(seed)
    payloads = rng.randint(0, 256, (n_frames, payload_len)).astype(np.uint8)
    bins = np.asarray(coded.encode_payload(payloads, cfg))
    re, im = planar.modulate_planar(bins.astype(np.int32), p)
    iq = np.asarray(re) + 1j * np.asarray(im)
    noisy = np.asarray(apply_awgn(jax.random.PRNGKey(seed), iq, snr_db))
    nr = np.ascontiguousarray(noisy.real.astype(np.float32))
    ni = np.ascontiguousarray(noisy.imag.astype(np.float32))
    dr, di = planar.dechirp_planar(nr, ni, p)
    if soft_path:
        mag2, _, _, _ = planar.demodulate_spectrum_planar(dr, di, p)
        out, _, _ = soft.decode_payload_soft(np.asarray(mag2),
                                             payload_len, cfg)
    else:
        res = planar.demodulate_planar(dr, di, p)
        out, _, _ = coded.decode_payload(np.asarray(res.symbols),
                                         payload_len, cfg)
    errors = np.any(np.asarray(out) != payloads, axis=-1)
    return int(errors.sum())


def test_soft_beats_hard_under_awgn():
    """Near the SF7 waterfall knee, soft ML decoding loses strictly fewer
    frames than hard decisions — for the Hamming CR 4/8 (soft margin) and
    for the detect-only parity CR 4/5 (hard can't correct at all)."""
    for cr, snr in ((4, -11.0), (1, -10.0)):
        hard = _per(cr, snr, 150, soft_path=False)
        sft = _per(cr, snr, 150, soft_path=True)
        # identical noise realisations: soft can only remove errors
        assert sft <= hard, (cr, hard, sft)
        assert hard - sft >= 3, (cr, hard, sft)   # a real, visible gain
        assert hard >= 5, (cr, hard)              # operating near the knee


def test_adaptive_soft_stream_roundtrip():
    """The header-driven receiver with soft=True recovers self-describing
    frames under noise and reports a positive soft margin; bins==argmax
    consistency between the spectra and hard decisions is implied by the
    shared pipeline."""
    from lora_phy_tpu.models import stream
    from lora_phy_tpu.models.stream import AdaptiveStreamDemodulator

    p = LoraParams(sf=7)
    cfg = CodedConfig(sf=7, cr=2)
    payloads = [b"soft adaptive frame one", b"and a second, longer frame!!"]
    bursts = [np.asarray(stream.frame_encode(
        np.frombuffer(b, np.uint8), cfg, p)) for b in payloads]
    sig = np.concatenate(
        [np.zeros(500, np.complex64), bursts[0],
         np.zeros(1200, np.complex64), bursts[1],
         np.zeros(2000, np.complex64)])
    noisy = np.asarray(apply_awgn(jax.random.PRNGKey(5), sig, 2.0))

    demod = AdaptiveStreamDemodulator(p, soft=True)
    state = demod.init_state()
    got = []
    for i in range(0, noisy.size, 16384):
        state, frames = demod.process(state, noisy[i:i + 16384])
        got.extend(frames)
    assert [f[1] for f in got] == payloads
    for _, _, info in got:
        assert info["crc_ok"] and info["soft_margin"] > 0.0


def test_gr_soft_decode_real_capture():
    """soft=True decodes the real gr-lora_sdr OTA capture bit-exactly
    (CRC verified) using gr's bin conventions for the LLR masks."""
    import pathlib

    from lora_phy_tpu.models import gr_interop
    from lora_phy_tpu.utils.iqio import read_iq

    path = pathlib.Path(
        "/root/reference/vectors_binary/"
        "bw_125k_sf_7_cr_1_ldro_false_crc_true_implheader_false.unknown")
    if not path.exists():
        pytest.skip("capture missing")
    cap = read_iq(path)
    frame = gr_interop.decode_frame(cap, LoraParams(sf=7, osr=2), soft=True)
    assert frame is not None and frame.header_ok
    assert frame.payload == b"hello world: 0"
    assert frame.crc_ok


@pytest.mark.parametrize("sf", [8, 9, 10, 11, 12])
@pytest.mark.parametrize("ldro,implicit", [(False, False), (False, True),
                                           (True, False), (True, True)])
def test_gr_soft_loopback_cells(sf, ldro, implicit):
    """gr SOFT decoding round-trips own gr-encoded frames under noise
    across all four ldro x implheader cells, SF8-12 and every CR — the
    soft-path counterpart of test_e2e's hard-decision cell matrix."""
    from lora_phy_tpu.models import gr_interop

    p = LoraParams(sf=sf)
    payload = bytes(range(40, 58))
    for cr in (1, 2, 3, 4):
        iq = np.asarray(gr_interop.encode_frame(
            payload, p, cr=cr, ldro=ldro, implicit=implicit))
        sig = np.concatenate([np.zeros(700, np.complex64), iq,
                              np.zeros(700, np.complex64)])
        noisy = np.asarray(apply_awgn(jax.random.PRNGKey(cr), sig, 6.0))
        kw = dict(length=len(payload), cr=cr, crc=True) if implicit else {}
        frame = gr_interop.decode_frame(noisy, p, ldro=ldro,
                                        implicit=implicit, soft=True,
                                        tx_phase_step=None, **kw)
        assert frame is not None, cr
        assert frame.payload == payload and frame.crc_ok, cr


def test_soft_decode_composes_with_robust_spectra():
    """pre_acc=3 ``with_spectra`` returns noncoherent-combining SCORES
    whose near-zero bins can round negative in f32; the soft path must
    clamp before its sqrt (a single negative bin used to poison every
    masked max with NaN). Gate: a clean two-ray frame received in robust
    mode soft-decodes from its returned scores, finite LLRs throughout."""
    import dataclasses

    import jax
    import numpy as np

    from lora_phy_tpu.models import coded, stream, sync
    from lora_phy_tpu.models import soft as softmod
    from lora_phy_tpu.ops import impair
    from lora_phy_tpu.utils.params import LoraParams

    p = LoraParams(sf=7)
    cfg = coded.CodedConfig(sf=7, cr=4, crc=True)
    payload = b"robust+soft"
    nsym = coded.payload_symbol_count(len(payload), cfg)
    n_pay = 8 + nsym
    iq = np.asarray(stream.frame_encode(
        np.frombuffer(payload, np.uint8), cfg, p))
    off = 3 * p.step
    total = off + iq.size + 4 * p.step
    xr = np.zeros(total, np.float32)
    xi = np.zeros(total, np.float32)
    xr[off: off + iq.size] = iq.real
    xi[off: off + iq.size] = iq.imag
    taps_re = np.zeros(4, np.float32)
    taps_re[0], taps_re[3] = 1.0, 0.95
    xr, xi = impair.apply_multipath_planar(xr, xi, taps_re,
                                           np.zeros(4, np.float32))
    rng = np.random.RandomState(2)
    xr = np.asarray(xr) + rng.randn(total).astype(np.float32) * 0.05
    xi = np.asarray(xi) + rng.randn(total).astype(np.float32) * 0.05

    blk, spec = sync.receive_block_planar(
        xr, xi, p, n_pay, max_frames=2, min_power_db=-30.0, pre_acc=3,
        with_spectra=True)
    ks = [int(k) for k in np.flatnonzero(np.asarray(blk.found))
          if abs(int(np.asarray(blk.start)[k]) - off) <= p.step]
    assert ks, "robust sync failed on clean two-ray frame"
    rows = np.asarray(spec)[ks[0], 8: 8 + nsym]
    llrs = np.asarray(softmod.symbol_llrs(rows, cfg))
    assert np.isfinite(llrs).all(), "NaN/inf LLRs from robust scores"
    pay, crc_ok, _ = softmod.decode_payload_soft(rows, len(payload), cfg)
    assert bool(np.asarray(crc_ok))
    assert np.asarray(pay).tobytes() == payload


def test_hamming84_ml_decode_clean_and_gain():
    """ML detection for the simple Hamming84 chain: exact on clean
    spectra, and statistically FEWER byte errors than the hard
    argmax+syndrome path at the waterfall knee (identical noise)."""
    import jax
    import numpy as np

    from lora_phy_tpu.models import modem
    from lora_phy_tpu.models import soft as softmod
    from lora_phy_tpu.ops import planar
    from lora_phy_tpu.ops.impair import apply_awgn
    from lora_phy_tpu.utils.params import LoraParams

    p = LoraParams(sf=7)
    rng = np.random.RandomState(4)
    payloads = rng.randint(0, 256, (300, 12)).astype(np.uint8)
    syms = modem.encode(payloads)
    re, im = planar.modulate_planar(np.asarray(syms, np.int32), p)
    iq = np.asarray(re) + 1j * np.asarray(im)

    # clean: bit-exact with the hard path
    dr, di = planar.dechirp_planar(
        np.ascontiguousarray(iq.real.astype(np.float32)),
        np.ascontiguousarray(iq.imag.astype(np.float32)), p)
    mag2, _, _, _ = planar.demodulate_spectrum_planar(dr, di, p)
    out = np.asarray(softmod.hamming84_ml_decode(np.asarray(mag2)))
    np.testing.assert_array_equal(out, payloads)

    # at the knee: identical noise, ML <= hard byte errors, and a real
    # margin (the seeded realisation is deterministic)
    noisy = np.asarray(apply_awgn(jax.random.PRNGKey(5), iq, -11.0))
    dr, di = planar.dechirp_planar(
        np.ascontiguousarray(noisy.real.astype(np.float32)),
        np.ascontiguousarray(noisy.imag.astype(np.float32)), p)
    mag2, _, _, _ = planar.demodulate_spectrum_planar(dr, di, p)
    mag2 = np.asarray(mag2)
    hard = np.asarray(modem.decode(np.argmax(mag2, -1).astype(np.uint16)))
    soft_out = np.asarray(softmod.hamming84_ml_decode(mag2))
    e_hard = int((hard != payloads).sum())
    e_soft = int((soft_out != payloads).sum())
    assert e_soft < e_hard, (e_soft, e_hard)


def test_hamming84_ml_decode_bw_alias():
    """BW250/500 aliases demodulated bins by ``scale`` (docs/SEMANTICS
    "BW250/500 bin aliasing"); the ML detector's codeword->bin map must
    follow (scale=2/4 keeps the 16 bins distinct because Hamming(8,4)'s
    minimum distance is 4 > the 2-3 bits the modular fold can erase)."""
    import dataclasses

    import numpy as np

    from lora_phy_tpu.models import modem, stream, sync
    from lora_phy_tpu.models import soft as softmod
    from lora_phy_tpu.utils.params import LoraParams, Bandwidth

    for bw in (Bandwidth.BW_250, Bandwidth.BW_500):
        p = dataclasses.replace(LoraParams(sf=7), bw=bw)
        scale = int(round(p.scale))
        rng = np.random.RandomState(scale)
        pl = rng.randint(0, 256, 6).astype(np.uint8)
        # arrivals inside the slope-s timing envelope (q*s < N/2 —
        # docs/SEMANTICS "Frame sync at BW250/500"); q*s >= N/2 is a
        # fundamental magnitude-domain ambiguity, not a decoder defect
        for off in (256, 261, 268):
            fr, fi = stream.frame_modulate_planar(
                np.asarray(modem.encode(pl), np.int32), p)
            total = 6144
            xr = np.zeros(total, np.float32)
            xi = np.zeros(total, np.float32)
            xr[off: off + fr.shape[-1]] = np.asarray(fr)
            xi[off: off + fi.shape[-1]] = np.asarray(fi)
            blk, spec = sync.receive_block_planar(
                xr, xi, p, pl.size * 2, max_frames=2, with_spectra=True)
            k = int(np.flatnonzero(np.asarray(blk.found))[0])
            assert int(np.asarray(blk.start)[k]) == off
            # bins now follow the aligned-demod convention (v*scale)%N
            np.testing.assert_array_equal(
                np.asarray(blk.symbols)[k].astype(int),
                (np.asarray(modem.encode(pl)).astype(int) * scale) % p.n)
            out = np.asarray(softmod.hamming84_ml_decode(
                np.asarray(spec)[k], scale=scale))
            np.testing.assert_array_equal(out, pl)
