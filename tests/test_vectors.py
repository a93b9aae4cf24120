"""The reference's binary test-vector corpus (vectors_binary/*.bin,
record format per scripts/create_binary_vectors.py:33-69): parse every
file, verify the documented record counts, and drive the corpus' payload
records through our chains."""

import numpy as np
import pytest

from lora_phy_tpu.models import coded, modem
from lora_phy_tpu.models.coded import CodedConfig
from lora_phy_tpu.utils.vectors import load_binary_vectors

EXPECTED_COUNTS = {
    "hamming_tests.bin": 144,
    "interleaver_tests.bin": 30,
    "loopback_tests.bin": 10,
    "encoder_decoder_tests.bin": 150,
    "validation_tests.bin": 4,
    "modulation_tests.bin": 120,
    "hamming_test_vectors.bin": 63,
    "interleaver_test_vectors.bin": 30,
    "detection_test_vectors.bin": 28,
    "modulation_test_vectors.bin": 360,
}


@pytest.fixture(scope="module")
def corpus(reference_dir):
    d = reference_dir / "vectors_binary"
    if not d.exists():
        pytest.skip("vectors_binary corpus unavailable")
    return d


def test_record_counts(corpus):
    for name, count in EXPECTED_COUNTS.items():
        records = load_binary_vectors(corpus / name)
        assert len(records) == count, f"{name}: {len(records)} != {count}"


def test_loopback_records_roundtrip(corpus):
    """Every loopback record's payload survives our full coded chain at
    the record's (sf, cr)."""
    for rec in load_binary_vectors(corpus / "loopback_tests.bin"):
        payload = np.frombuffer(rec.payload, dtype=np.uint8)
        cr = int(rec.coding_rate.split("/")[1]) - 4 if "/" in rec.coding_rate else 1
        cfg = CodedConfig(sf=rec.spread_factor, cr=max(1, min(4, cr)))
        syms = coded.encode_payload(payload, cfg)
        out, crc_ok, _ = coded.decode_payload(syms, len(payload), cfg)
        np.testing.assert_array_equal(np.asarray(out), payload)
        assert bool(np.all(np.asarray(crc_ok)))


def test_encoder_decoder_records(corpus):
    """encoder_decoder records: payloads survive the simple Hamming84
    symbol chain (the reference encode/decode contract)."""
    for rec in load_binary_vectors(corpus / "encoder_decoder_tests.bin")[:40]:
        if not rec.payload:
            continue
        payload = np.frombuffer(rec.payload, dtype=np.uint8)
        out = np.asarray(modem.decode(np.asarray(modem.encode(payload))))
        np.testing.assert_array_equal(out, payload)


def test_modulation_records_over_the_air(corpus):
    """A sample of modulation records: payloads survive the full
    encode->modulate->dechirp->demodulate->decode physical chain."""
    from lora_phy_tpu.utils.params import LoraParams

    recs = [r for r in load_binary_vectors(corpus / "modulation_tests.bin")
            if r.payload and 7 <= r.spread_factor <= 12][:12]
    for rec in recs:
        payload = np.frombuffer(rec.payload, dtype=np.uint8)
        p = LoraParams(sf=rec.spread_factor)
        syms = modem.encode(payload)
        iq = modem.modulate(syms, p)
        res = modem.demodulate(modem.dechirp(iq, p), p)
        out = np.asarray(modem.decode(np.asarray(res.symbols)))
        np.testing.assert_array_equal(out, payload)


def test_interleaver_vector_codewords(corpus):
    """interleaver_test_vectors records carry input codewords in ``extra``;
    interleave/deinterleave at the record's (sf, rdd) round-trips them."""
    for rec in load_binary_vectors(corpus / "interleaver_test_vectors.bin"):
        if not rec.extra:
            continue
        cw = np.frombuffer(rec.extra, dtype=np.uint8)
        ppm = max(rec.spread_factor, 7) if rec.spread_factor else 7
        rdd = 4
        blocks = len(cw) // ppm
        if blocks == 0:
            continue
        cw = cw[: blocks * ppm] & 0xFF
        from lora_phy_tpu.ops import coding

        syms = coding.diagonal_interleave(cw, ppm, rdd)
        back = np.asarray(coding.diagonal_deinterleave(np.asarray(syms), ppm, rdd))
        np.testing.assert_array_equal(back, cw)
