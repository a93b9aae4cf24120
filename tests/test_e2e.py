"""End-to-end loopback tests mirroring the reference's working contract
(reference: tests/e2e_chain_test.cpp:54-117): encode -> modulate -> external
dechirp -> demodulate -> decode, byte-exact, sync word recovered — extended
beyond the reference's 3-profile matrix to SF7–SF12 and osr {1, 2, 4}."""

import numpy as np
import pytest

from lora_phy_tpu.models import modem
from lora_phy_tpu.utils.params import Bandwidth, LoraParams, Window
from lora_phy_tpu.utils.profiles import DEFAULT_PROFILES, load_profiles


def _roundtrip(p: LoraParams, payload: np.ndarray):
    syms = modem.encode(payload)
    iq = modem.modulate(syms, p)
    dech = modem.dechirp(iq, p)
    res = modem.demodulate(dech, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    return out, res


@pytest.mark.parametrize("profile", DEFAULT_PROFILES, ids=lambda p: p.name)
def test_reference_profiles(profile):
    """The reference's exact profile matrix (tests/profiles.yaml)."""
    p = profile.params()
    payload = np.arange(32, dtype=np.uint8)
    out, res = _roundtrip(p, payload)
    np.testing.assert_array_equal(out, payload)
    assert int(res.sync_word) == 0x12


def test_profiles_yaml_loader(reference_dir):
    profiles = load_profiles(reference_dir / "tests" / "profiles.yaml")
    assert [p.name for p in profiles] == [p.name for p in DEFAULT_PROFILES]
    assert profiles[0].sf == 7 and profiles[0].bw == 125000
    assert profiles[1].cr_index == 3 and profiles[2].sf == 8


@pytest.mark.parametrize("sf", [7, 8, 9, 10, 11, 12])
def test_all_sf(sf):
    p = LoraParams(sf=sf)
    payload = (np.arange(32, dtype=np.uint8) * 7 + 3).astype(np.uint8)
    out, res = _roundtrip(p, payload)
    np.testing.assert_array_equal(out, payload)
    assert int(res.sync_word) == 0x12


@pytest.mark.parametrize("osr", [1, 2, 4])
def test_oversampling(osr):
    p = LoraParams(sf=7, osr=osr)
    payload = np.arange(16, dtype=np.uint8)
    out, res = _roundtrip(p, payload)
    np.testing.assert_array_equal(out, payload)
    assert int(res.sync_word) == 0x12


def test_hann_window():
    p = LoraParams(sf=7, window=Window.HANN)
    payload = np.arange(16, dtype=np.uint8)
    out, res = _roundtrip(p, payload)
    np.testing.assert_array_equal(out, payload)


@pytest.mark.parametrize("sync,expected", [(0x12, 0x12), (0x34, 0x34),
                                           (0xAB, 0x9A), (0xFF, 0xEE)])
def test_sync_words(sync, expected):
    """Sync-only frame behaviour of the reference's (crashing) sync_word_test
    (tests/sync_word_test.cpp:31-64, fixed-fixture reproduction per
    SURVEY.md §2.3 finding 4): zero data symbols produced, 256 samples
    emitted, sync byte recovered.

    Note the recovery parity quirk: large sync nibbles inflate the 2-symbol
    CFO estimate, whose derotation shifts the sync bins down — the
    reference binary itself recovers 0xAB as 0x9A and 0xFF as 0xEE
    (verified by running ``lora_modulate``+``lora_demodulate``), so the
    crashing test's stated intent is unachievable with this estimator;
    we match the real behaviour bit-for-bit."""
    p = LoraParams(sf=7, sync_word=sync)
    iq = modem.modulate(np.zeros((0,), np.uint16), p)
    assert iq.shape[-1] == 2 * p.step  # 256 samples, the corrected fixture size
    dech = modem.dechirp(iq, p)
    res = modem.demodulate(dech, p)
    assert res.symbols.shape[-1] == 0
    assert int(res.sync_word) == expected


def test_batched_roundtrip():
    """Frame-batched demodulation (vmap-free, leading batch dim)."""
    p = LoraParams(sf=7)
    payloads = np.stack([
        np.arange(16, dtype=np.uint8),
        np.arange(16, dtype=np.uint8)[::-1].copy(),
        np.full(16, 0xA5, np.uint8),
        np.zeros(16, np.uint8),
    ])
    syms = modem.encode(payloads)
    iq = modem.modulate(syms, p)
    dech = modem.dechirp(iq, p)
    res = modem.demodulate(dech, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payloads)
    np.testing.assert_array_equal(np.asarray(res.sync_word), [0x12] * 4)


def test_amplitude_normalisation():
    """Inputs above the canonical [-1, 1] range are rescaled before
    detection (reference: src/phy/LoRaDemod.cpp:59-77)."""
    p = LoraParams(sf=7)
    payload = np.arange(8, dtype=np.uint8)
    syms = modem.encode(payload)
    iq = modem.modulate(syms, p)
    dech = np.asarray(modem.dechirp(iq, p)) * 3.5
    res = modem.demodulate(dech, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payload)


def test_equal_power_tie_break():
    """Equal-power bins resolve to the lowest index: the reference's SF2
    fixture [(1,0), (0,0), (1,0), (0,0)] has equal power at bins 0 and 2;
    symbol must be 0 (reference: tests/equal_power_bin_test.cpp:31-55)."""
    p = LoraParams(sf=2)
    # four samples = one SF2 symbol; demodulate() needs 2 sync symbols, so
    # exercise the detector path directly
    from lora_phy_tpu.ops.detect import detect

    samples = np.array([1, 0, 1, 0], dtype=np.complex64)
    det = detect(samples)
    assert int(det.index) == 0


def test_crc_metrics():
    """CRC verification of decode: payload[2:-2] checked against trailing
    little-endian CRC (reference: src/phy/phy.cpp:241-256)."""
    from lora_phy_tpu.ops.coding import crc16_sx1272

    data = np.array([0x01, 0x02, 0xDE, 0xAD, 0xBE, 0xEF], dtype=np.uint8)
    crc = int(crc16_sx1272(data[2:]))
    framed = np.concatenate([data, [crc & 0xFF, crc >> 8]]).astype(np.uint8)
    syms = modem.encode(framed)
    res = modem.decode_with_crc(np.asarray(syms))
    assert bool(res.crc_ok)
    np.testing.assert_array_equal(np.asarray(res.payload), framed)

    bad = framed.copy()
    bad[3] ^= 0xFF
    res2 = modem.decode_with_crc(np.asarray(modem.encode(bad)))
    assert not bool(res2.crc_ok)


def test_integrated_demodulate_roundtrip():
    """The fixed integrated path (dechirped offset estimation) round-trips;
    the reference's integrated path does not (SURVEY.md §2.3 finding 2)."""
    p = LoraParams(sf=7)
    payload = np.arange(16, dtype=np.uint8)
    syms = modem.encode(payload)
    iq = modem.modulate(syms, p)
    res = modem.demodulate_integrated(iq, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payload)
    assert int(res.sync_word) == 0x12


def test_integrated_demodulate_quirk_compat():
    """quirk_compat=True reproduces the reference defect: offset estimation
    on raw chirps corrupts the decisions (documented divergence gate)."""
    p = LoraParams(sf=7)
    payload = np.frombuffer(bytes.fromhex("deadbeef"), dtype=np.uint8)
    syms = modem.encode(payload)
    iq = modem.modulate(syms, p)
    res = modem.demodulate_integrated(iq, p, quirk_compat=True)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    # the broken estimator yields a large bogus CFO, exactly as the
    # reference does (verified: tx_runner | rx_runner decodes 50f27003)
    assert abs(float(res.cfo)) > 0.2
    assert not np.array_equal(out, payload)


def test_gr_lora_sdr_interop(reference_dir):
    """Demodulate the gr-lora_sdr capture fixture: sync 0x29, payload
    BE E7 82 75 E0 (reference: tests/gr_lora_sdr_interop.cpp:21-53)."""
    from lora_phy_tpu.utils.iqio import read_iq

    path = reference_dir / "test_output.iq"
    if not path.exists():
        pytest.skip("fixture missing")
    samples = read_iq(path)
    p = LoraParams(sf=7, osr=2)
    res = modem.demodulate(samples, p)
    assert int(res.sync_word) == 0x29
    decoded = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(decoded[:5], [0xBE, 0xE7, 0x82, 0x75, 0xE0])


def test_gr_lora_sdr_capture_blind_decode(reference_dir):
    """Full blind decode of the real gr-lora_sdr over-the-air capture
    (267k samples, vectors_binary/bw_125k_sf_7_cr_1_ldro_false_crc_true_
    implheader_false.unknown): frame sync + header + payload recover
    b"hello world: 0" — further than the reference's own capture-forensics
    scripts got (their decoded_message.bin is garbage)."""
    from lora_phy_tpu.models import gr_interop
    from lora_phy_tpu.utils.iqio import read_iq

    path = (reference_dir / "vectors_binary" /
            "bw_125k_sf_7_cr_1_ldro_false_crc_true_implheader_false.unknown")
    if not path.exists():
        pytest.skip("capture missing")
    cap = read_iq(path)
    frame = gr_interop.decode_frame(cap, LoraParams(sf=7, osr=2))
    assert frame is not None
    assert frame.header_ok
    assert (frame.length, frame.cr, frame.has_crc) == (14, 1, True)
    assert frame.payload == b"hello world: 0"
    assert frame.crc_ok       # gr CRC convention verified against trailer
    assert frame.fec_errors == 0
    assert frame.cfo_bins == 0


def test_gr_interop_tx_rx_roundtrip():
    """Our gr-convention TX -> our gr RX: full bidirectional interop,
    CRC verified, across coding rates."""
    from lora_phy_tpu.models import gr_interop

    for cr in (1, 2, 3, 4):
        p = LoraParams(sf=7)
        payload = b"gr interop \x00\xff!"
        iq = np.asarray(gr_interop.encode_frame(payload, p, cr=cr))
        sig = np.concatenate([np.zeros(200, np.complex64), iq,
                              np.zeros(3 * p.step, np.complex64)])
        # our encode_frame TX rides the lattice phase convention
        frame = gr_interop.decode_frame(sig, p, tx_phase_step=None)
        assert frame is not None and frame.header_ok
        assert frame.cr == cr and frame.length == len(payload)
        assert frame.payload == payload
        assert frame.crc_ok
        assert frame.fec_errors == 0


@pytest.mark.parametrize("sf", [5, 6])
def test_small_sf_loopback(sf):
    """Sub-SF7 configurations (the reference supports SF>=2 via its plan
    sizes; sync shift clamps at sf<=4 per LoRaMod.cpp:20). At SF<=4 the
    2-symbol estimator's sync bias is a large fraction of a bin and the
    derotation flips symbols — inherent to the estimator design (the
    reference never exercises sub-SF7 loopback either); the SF2 detector
    path is covered by the equal-power tie-break test."""
    p = LoraParams(sf=sf)
    payload = np.arange(4, dtype=np.uint8)
    # keep codeword symbols inside the alphabet for tiny N
    syms = np.asarray(modem.encode(payload)) % (1 << sf)
    iq = modem.modulate(syms.astype(np.uint16), p)
    dech = modem.dechirp(iq, p)
    res = modem.demodulate(dech, p)
    np.testing.assert_array_equal(np.asarray(res.symbols), syms)


def test_demodulate_truncates_partial_symbols():
    """Inputs that are not a whole number of symbol periods: the reference
    integrated API rejects them (phy.cpp:186); our array API truncates to
    whole symbols (documented divergence — shapes must be static under
    jit), which the runners guard the same way the reference does."""
    p = LoraParams(sf=7)
    payload = np.arange(8, dtype=np.uint8)
    dech = np.asarray(modem.dechirp(modem.modulate(modem.encode(payload), p), p))
    ragged = np.concatenate([dech, dech[:37]])
    res = modem.demodulate(ragged, p)
    out = np.asarray(modem.decode(np.asarray(res.symbols)))
    np.testing.assert_array_equal(out, payload)


def test_gr_capture_all_frames(reference_dir):
    """Every frame in the OTA capture decodes: a repeating
    "hello world: N" sequence, all CRC-verified, zero FEC errors."""
    from lora_phy_tpu.models import gr_interop
    from lora_phy_tpu.utils.iqio import read_iq

    path = (reference_dir / "vectors_binary" /
            "bw_125k_sf_7_cr_1_ldro_false_crc_true_implheader_false.unknown")
    if not path.exists():
        pytest.skip("capture missing")
    samples = read_iq(path)
    p = LoraParams(sf=7, osr=2)
    step = p.step
    overhead = 12 * step + step // 4

    payloads = []
    offset = 0
    while samples.size - offset > 16 * step and len(payloads) < 20:
        frame = gr_interop.decode_frame(samples[offset:], p)
        if frame is None:
            break
        if not frame.header_ok:
            offset += frame.start + step
            continue
        assert frame.crc_ok and frame.fec_errors == 0
        payloads.append(frame.payload)
        nibbles = (frame.length + 2) * 2
        blocks = -(-nibbles // p.sf)
        offset += frame.start + overhead + (8 + blocks * (4 + frame.cr)) * step

    assert len(payloads) >= 10
    for i, payload in enumerate(payloads):
        assert payload == f"hello world: {i}".encode()


def test_gr_capture_batched_device_receiver(reference_dir):
    """The whole OTA capture through the DEVICE-SIDE batched block
    receiver in one call (vs the serial host loop above): every frame
    found by the scan, bins decoded by the shared gr coding pipeline
    (``gr_interop.decode_bins``), all CRC-verified. gr TX is a true
    continuous oversampled chirp, so the receiver dechirps with the
    unfolded lattice (``continuous_chirp=True``) and the estimator gets
    ``tx_phase_step=0.0`` — with the folded default, half the capture's
    bins land +1 across the rounding boundary."""
    from lora_phy_tpu.models import gr_interop, sync
    from lora_phy_tpu.ops import planar
    from lora_phy_tpu.utils.iqio import read_iq

    path = (reference_dir / "vectors_binary" /
            "bw_125k_sf_7_cr_1_ldro_false_crc_true_implheader_false.unknown")
    if not path.exists():
        pytest.skip("capture missing")
    cap = read_iq(path)
    p = LoraParams(sf=7, osr=2, continuous_chirp=True)
    _, _, n_rest, _ = gr_interop.payload_block_plan(7, 1, 14, True,
                                                    False, False)
    re, im = planar.split_complex(cap)
    blk = sync.receive_block_planar(re, im, p, 8 + n_rest * 5,
                                    max_frames=16, min_power_db=-30.0,
                                    tx_phase_step=0.0)
    ks = np.flatnonzero(np.asarray(blk.found))
    assert ks.size >= 12
    for i, k in enumerate(ks):
        fr = gr_interop.decode_bins(np.asarray(blk.symbols)[k], 7)
        assert fr is not None and fr.header_ok and fr.crc_ok
        assert fr.fec_errors == 0
        assert fr.payload == b"hello world: %d" % i


@pytest.mark.parametrize("sf", [7, 8, 9, 10, 11, 12])
@pytest.mark.parametrize("ldro", [False, True])
@pytest.mark.parametrize("implicit", [False, True])
def test_gr_interop_cell_matrix(sf, ldro, implicit):
    """All four ldro x implheader cells of the gr-lora_sdr capture naming
    convention (reference: vectors_binary/ 'ldro_false..._implheader_false'
    naming), across every SF 7-12 and every CR 4/5..4/8: TX -> RX round
    trip with CRC verification. SF>7 explicit headers carry payload
    spillover nibbles in the reduced-rate first block, as gr does.
    Generalizes the gr TX/RX claim beyond the single SF7/BW125 capture
    (the only real capture the reference ships)."""
    from lora_phy_tpu.models import gr_interop

    p = LoraParams(sf=sf)
    payload = b"cell \x00matrix\xff!"
    for cr in (1, 2, 3, 4):
        iq = np.asarray(gr_interop.encode_frame(
            payload, p, cr=cr, crc=True, ldro=ldro, implicit=implicit))
        sig = np.concatenate([np.zeros(3 * p.step, np.complex64), iq,
                              np.zeros(3 * p.step, np.complex64)])
        kw = (dict(length=len(payload), cr=cr, crc=True)
              if implicit else {})
        frame = gr_interop.decode_frame(sig, p, ldro=ldro,
                                        implicit=implicit,
                                        tx_phase_step=None, **kw)
        assert frame is not None and frame.header_ok
        assert frame.length == len(payload) and frame.cr == cr
        assert frame.payload == payload
        assert frame.crc_ok
        assert frame.fec_errors == 0


@pytest.mark.parametrize("sf,osr", [(7, 2), (8, 2)])
def test_integrated_demodulate_oversampled(sf, osr):
    """The fixed integrated path at osr > 1: the offset estimator must
    dechirp the sync symbols with the PROPER oversampled downchirp — a
    sample-repeated osr=1 chirp is misaligned by half a bin, fabricating
    a time_offset of frac*N*osr (~ -23 samples at sf8/osr2) that shifted
    every symbol window (every decision wrong, sync 0x1)."""
    p = LoraParams(sf=sf, osr=osr)
    rng = np.random.RandomState(1)
    pay = rng.randint(0, 256, 6).astype(np.uint8)
    syms = np.asarray(modem.encode(pay))
    iq = modem.modulate(syms.astype(np.int32), p)
    out = modem.demodulate_integrated(iq, p)
    assert int(np.asarray(out.sync_word)) == p.sync_word
    assert abs(float(np.asarray(out.time_offset))) < 2.0
    np.testing.assert_array_equal(np.asarray(modem.decode(out.symbols)), pay)


def test_gr_decode_bins_short_input_returns_none():
    """decode_bins's documented "None when the bins run out" covers the
    8-symbol header block too (a truncated BlockFrames row, or a caller
    with n_payload_symbols < 8) — not just the payload region."""
    from lora_phy_tpu.models import gr_interop

    assert gr_interop.decode_bins(np.zeros(5, np.int64), 7) is None
    assert gr_interop.decode_bins(
        np.zeros(5, np.int64), 7, soft=True,
        mag2=np.zeros((5, 32), np.float32)) is None
