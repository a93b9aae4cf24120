"""Bit-exactness of every coding primitive against exhaustive truth tables
dumped from the reference implementation (tools/gen_coding_truth.cpp run
against /root/reference include/lora_phy/LoRaCodes.hpp)."""

import pathlib

import numpy as np
import pytest

from lora_phy_tpu.ops import coding

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def truth():
    return np.load(FIXTURES / "coding_truth.npz")


def test_hamming84_encode(truth):
    got = np.asarray(coding.hamming84_encode(np.arange(16)))
    np.testing.assert_array_equal(got, truth["h84_enc"])


def test_hamming84_decode(truth):
    nib, err, bad = coding.hamming84_decode(np.arange(256))
    np.testing.assert_array_equal(np.asarray(nib), truth["h84_dec"])
    np.testing.assert_array_equal(np.asarray(err).astype(np.uint8), truth["h84_err"])
    np.testing.assert_array_equal(np.asarray(bad).astype(np.uint8), truth["h84_bad"])


def test_hamming84_single_error_correction(truth):
    codes = np.asarray(coding.hamming84_encode(np.arange(16)))
    for bit in range(8):
        nib, err, bad = coding.hamming84_decode(codes ^ (1 << bit))
        np.testing.assert_array_equal(np.asarray(nib), np.arange(16))
        assert np.all(np.asarray(err)) and not np.any(np.asarray(bad))


def test_hamming74(truth):
    got = np.asarray(coding.hamming74_encode(np.arange(16)))
    np.testing.assert_array_equal(got, truth["h74_enc"])
    nib, err = coding.hamming74_decode(np.arange(128))
    np.testing.assert_array_equal(np.asarray(nib), truth["h74_dec"])
    np.testing.assert_array_equal(np.asarray(err).astype(np.uint8), truth["h74_err"])


def test_parity54(truth):
    np.testing.assert_array_equal(
        np.asarray(coding.parity54_encode(np.arange(16))), truth["p54_enc"]
    )
    nib, err = coding.parity54_check(np.arange(32))
    np.testing.assert_array_equal(np.asarray(nib), truth["p54_chk"])
    np.testing.assert_array_equal(np.asarray(err).astype(np.uint8), truth["p54_err"])


def test_parity64(truth):
    np.testing.assert_array_equal(
        np.asarray(coding.parity64_encode(np.arange(16))), truth["p64_enc"]
    )
    nib, err = coding.parity64_check(np.arange(64))
    np.testing.assert_array_equal(np.asarray(nib), truth["p64_chk"])
    np.testing.assert_array_equal(np.asarray(err).astype(np.uint8), truth["p64_err"])


def test_gray_16bit_exhaustive(truth):
    x = np.arange(65536, dtype=np.uint16)
    np.testing.assert_array_equal(np.asarray(coding.binary_to_gray(x)), truth["gray_enc"])
    np.testing.assert_array_equal(np.asarray(coding.gray_to_binary(x)), truth["gray_dec"])
    np.testing.assert_array_equal(
        np.asarray(coding.gray_to_binary(coding.binary_to_gray(x))), x
    )


def test_whitening_sx1232(truth):
    zeros = np.zeros(600, dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(coding.whiten_sx1232(zeros)), truth["wh_sx1232"])
    data = np.arange(600, dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(coding.whiten_sx1232(coding.whiten_sx1232(data))), data
    )


@pytest.mark.parametrize("rdd", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ofs", [0, 1, 7, 100])
def test_whitening_sx1272_seq(truth, rdd, ofs):
    zeros = np.zeros(600, dtype=np.uint8)
    got = np.asarray(coding.whiten_sx1272_seq(zeros, bit_ofs=ofs, rdd=rdd))
    np.testing.assert_array_equal(got, truth[f"wh_seq_r{rdd}_o{ofs}"])


@pytest.mark.parametrize("rdd", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ofs", [0, 1, 7, 100])
def test_whitening_sx1272_lfsr(truth, rdd, ofs):
    zeros = np.zeros(600, dtype=np.uint8)
    got = np.asarray(coding.whiten_sx1272_lfsr(zeros, bit_ofs=ofs, rdd=rdd))
    np.testing.assert_array_equal(got, truth[f"wh_lfsr_r{rdd}_o{ofs}"])


def test_whitening_fixture_roundtrip():
    """The reference's whitening unit fixture: DE AD BE EF 70 0D <->
    21 52 90 10 2C F2 with a valid trailing CRC
    (reference: tests/whitening_test.cpp:30-49)."""
    plain = np.array([0xDE, 0xAD, 0xBE, 0xEF, 0x70, 0x0D], dtype=np.uint8)
    expect = np.array([0x21, 0x52, 0x90, 0x10, 0x2C, 0xF2], dtype=np.uint8)
    whitened = np.asarray(coding.whiten_sx1272_lfsr(plain, 0, 4))
    np.testing.assert_array_equal(whitened, expect)
    np.testing.assert_array_equal(np.asarray(coding.whiten_sx1272_lfsr(expect, 0, 4)), plain)
    crc = int(coding.crc16_sx1272(plain[:-2]))
    assert crc == (int(plain[-2]) | (int(plain[-1]) << 8))


def test_crc16_all_lengths(truth):
    blob = truth["crc_input"]
    expected = truth["crc_by_len"]
    for length in range(0, 256):
        got = int(coding.crc16_sx1272(blob[:length]))
        assert got == expected[length], f"len={length}: {got:04x} != {expected[length]:04x}"


def test_crc16_batched(truth):
    blob = truth["crc_input"]
    batch = np.stack([blob[:16], blob[16:32], blob[32:48]])
    got = np.asarray(coding.crc16_sx1272(batch))
    ref = [int(coding.crc16_sx1272(b)) for b in batch]
    np.testing.assert_array_equal(got, ref)


def test_header_checksum(truth):
    i = np.arange(256, dtype=np.uint8)
    h = np.stack([i, (i.astype(np.int64) * 37 + 11).astype(np.uint8)], axis=-1)
    np.testing.assert_array_equal(np.asarray(coding.header_checksum(h)), truth["header_chk"])


def test_checksum8(truth):
    blob = truth["crc_input"]
    for length in range(0, 256, 17):
        assert coding.checksum8(blob[:length]) == truth["checksum8"][length]


@pytest.mark.parametrize("ppm", [7, 8, 10, 12])
@pytest.mark.parametrize("rdd", [0, 1, 2, 3, 4])
def test_interleaver(truth, ppm, rdd):
    cw = truth[f"il_cw_p{ppm}_r{rdd}"]
    sym = truth[f"il_sym_p{ppm}_r{rdd}"]
    got_sym = np.asarray(coding.diagonal_interleave(cw, ppm, rdd))
    np.testing.assert_array_equal(got_sym, sym)
    got_cw = np.asarray(coding.diagonal_deinterleave(sym, ppm, rdd))
    np.testing.assert_array_equal(got_cw, truth[f"il_cwback_p{ppm}_r{rdd}"])


@pytest.mark.parametrize("ppm", [7, 8, 10, 12])
@pytest.mark.parametrize("rdd", [0, 1, 2, 3, 4])
def test_deinterleaver_v2(truth, ppm, rdd):
    sym = truth[f"il_sym_p{ppm}_r{rdd}"]
    got = np.asarray(coding.diagonal_deinterleave_v2(sym, ppm, rdd))
    ref = truth[f"il_cwback2_p{ppm}_r{rdd}"]
    nb = 4 + rdd
    if ppm > nb:
        # the reference's final block reads past the symbol array (UB);
        # compare only the deterministic prefix (SURVEY-documented quirk)
        nblk = len(sym) // nb
        got, ref = got[: (nblk - 1) * ppm], ref[: (nblk - 1) * ppm]
    np.testing.assert_array_equal(got, ref)


def test_roundtrip_symbol_fixture():
    """The reference's encode fixture: 0xDEADBEEF ->
    [0x8D, 0x2E, 0x9A, 0x8D, 0x4B, 0x2E, 0x2E, 0xFF]
    (reference: tests/roundtrip_test.cpp:30-50, base64 constants decoded)."""
    from lora_phy_tpu.models import modem

    payload = np.array([0xDE, 0xAD, 0xBE, 0xEF], dtype=np.uint8)
    expected = np.array([0x8D, 0x2E, 0x9A, 0x8D, 0x4B, 0x2E, 0x2E, 0xFF], dtype=np.uint16)
    syms = np.asarray(modem.encode(payload))
    np.testing.assert_array_equal(syms, expected)
    decoded = np.asarray(modem.decode(expected))
    np.testing.assert_array_equal(decoded, payload)
