"""Full coded LoRa chain — whitening + FEC + diagonal interleaving + Gray
mapping + CRC framing, batched.

The reference ships all the primitives (LoRaCodes.hpp) but never wires the
complete chain: its runners use bare Hamming84 codewords as symbols and
apply a deinterleave that the TX side never did, so their ``decoded.bin``
goldens don't match ``payload.bin`` (SURVEY.md §2.3 finding 3). This module
implements the chain *correctly* (SURVEY.md §7 step 4) on top of the
bit-exact primitives:

TX:  payload -> [CRC16 append] -> whiten (Sx1272 LFSR, RDD-aware)
     -> nibbles -> FEC (parity54/64 | Hamming74/84 by CR)
     -> diagonal interleave (PPM = sf, or sf-2 with LDRO)
     -> Gray demap (bin = grayToBinary(word)) -> chirp bins
RX:  exact inverse, with single-error correction for CR 4/7, 4/8 and
     CRC verification.

Gray placement follows the upstream LoRa-SDR convention the reference was
extracted from (TX ``grayToBinary16``, RX ``binaryToGray16`` — adjacent-bin
demod errors then cost exactly one codeword bit). With LDRO the interleaver
runs at PPM = sf-2 and bins are scaled by 4 (the two LSBs carry no data),
the standard low-data-rate robustness trade.
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp
import numpy as np

from ..ops import coding

_CR_WIDTH = {1: 5, 2: 6, 3: 7, 4: 8}


@dataclasses.dataclass(frozen=True)
class CodedConfig:
    """Static coded-chain options (gr-lora_sdr capture naming convention:
    ``bw_125k_sf_7_cr_1_ldro_false_crc_true_implheader_false``)."""

    sf: int = 7
    cr: int = 1          # 1..4 -> CR 4/5..4/8 (RDD index)
    ldro: bool = False   # low-data-rate optimisation: PPM = sf-2, bins << 2
    crc: bool = True     # append/verify trailing CRC16
    whiten: bool = True  # Sx1272 LFSR whitening over the payload bytes

    @property
    def ppm(self) -> int:
        return self.sf - 2 if self.ldro else self.sf

    @property
    def rdd(self) -> int:
        return self.cr

    @property
    def bits_per_symbol(self) -> int:
        return self.ppm


def _fec_encode(nibbles, cr: int):
    if cr == 1:
        return coding.parity54_encode(nibbles)
    if cr == 2:
        return coding.parity64_encode(nibbles)
    if cr == 3:
        return coding.hamming74_encode(nibbles)
    if cr == 4:
        return coding.hamming84_encode(nibbles)
    raise ValueError(f"cr must be 1..4, got {cr}")


def _fec_decode(codewords, cr: int):
    """Returns (nibbles, error_flag)."""
    if cr == 1:
        return coding.parity54_check(codewords)
    if cr == 2:
        return coding.parity64_check(codewords)
    if cr == 3:
        return coding.hamming74_decode(codewords)
    if cr == 4:
        nib, err, bad = coding.hamming84_decode(codewords)
        return nib, err
    raise ValueError(f"cr must be 1..4, got {cr}")


def payload_symbol_count(nbytes: int, cfg: CodedConfig) -> int:
    """Symbols needed for ``nbytes`` payload (+CRC if enabled)."""
    total = nbytes + (2 if cfg.crc else 0)
    nibbles = total * 2
    blocks = -(-nibbles // cfg.ppm)
    return blocks * (4 + cfg.rdd)


def encode_payload(payload, cfg: CodedConfig):
    """[..., B] payload bytes -> [..., S] chirp-bin symbols (uint16).

    Pads the nibble stream with zeros to a whole interleaver block, exactly
    invertible by :func:`decode_payload` given ``B``.
    """
    payload = jnp.asarray(payload, dtype=jnp.uint8)
    nbytes = payload.shape[-1]
    if cfg.crc:
        crc = coding.crc16_sx1272(payload)
        framed = jnp.concatenate(
            [payload, (crc & 0xFF).astype(jnp.uint8)[..., None],
             (crc >> 8).astype(jnp.uint8)[..., None]], axis=-1,
        )
    else:
        framed = payload
    if cfg.whiten:
        # full-width (rdd=4) keystream: whitening here runs over packed
        # *bytes*, where the reference's codeword-width mask 0xff>>(4-RDD)
        # (LoRaCodes.hpp:176-189) would leave the top payload bits of every
        # byte unwhitened for CR 4/5..4/7 and defeat the spectral purpose
        framed = coding.whiten_sx1272_lfsr(framed, 0, 4)

    nibbles = coding.bytes_to_nibbles(framed)
    ncw = nibbles.shape[-1]
    blocks = -(-ncw // cfg.ppm)
    pad = blocks * cfg.ppm - ncw
    if pad:
        nibbles = jnp.concatenate(
            [nibbles, jnp.zeros(nibbles.shape[:-1] + (pad,), nibbles.dtype)], axis=-1
        )
    codewords = _fec_encode(nibbles, cfg.cr)
    words = coding.diagonal_interleave(codewords, cfg.ppm, cfg.rdd)
    bins = coding.gray_to_binary(words.astype(jnp.uint16))
    if cfg.ldro:
        bins = bins << 2
    return bins.astype(jnp.uint16)


def decode_payload(symbols, nbytes: int, cfg: CodedConfig):
    """[..., S] chirp bins -> (payload [..., nbytes], crc_ok, fec_errors).

    ``crc_ok`` is all-True when CRC is disabled; ``fec_errors`` counts
    codewords with detected parity errors (corrected where the code can).
    """
    symbols = jnp.asarray(symbols, dtype=jnp.uint16)
    if cfg.ldro:
        # round(bin/4), not truncation: a -1 bin drift still demaps to the
        # right word (truncation costs a codeword bit that CR 4/5-4/6 can
        # only detect, not correct) — the drift tolerance LDRO exists for
        half_n = 1 << (cfg.sf - 2)
        symbols = ((symbols + 2) >> 2) % half_n
    words = coding.binary_to_gray(symbols)
    codewords = coding.diagonal_deinterleave(words, cfg.ppm, cfg.rdd)
    nibbles, err = _fec_decode(codewords, cfg.cr)
    total = nbytes + (2 if cfg.crc else 0)
    nibbles = nibbles[..., : total * 2]
    framed = coding.nibbles_to_bytes(nibbles)
    if cfg.whiten:
        # full-width (rdd=4) keystream: whitening here runs over packed
        # *bytes*, where the reference's codeword-width mask 0xff>>(4-RDD)
        # (LoRaCodes.hpp:176-189) would leave the top payload bits of every
        # byte unwhitened for CR 4/5..4/7 and defeat the spectral purpose
        framed = coding.whiten_sx1272_lfsr(framed, 0, 4)
    payload = framed[..., :nbytes]
    if cfg.crc:
        provided = framed[..., -2].astype(jnp.uint16) | (
            framed[..., -1].astype(jnp.uint16) << 8
        )
        crc_ok = provided == coding.crc16_sx1272(payload)
    else:
        crc_ok = jnp.ones(payload.shape[:-1], dtype=bool)
    fec_errors = jnp.sum(err, axis=-1)
    return payload, crc_ok, fec_errors


# ---------------------------------------------------------------------------
# Explicit header (reference: LoRaCodes.hpp:16-18, 43-67 — HEADER_RDD=4)
# ---------------------------------------------------------------------------

HEADER_RDD = 4       # headers always use CR 4/8 (LoRaCodes.hpp:16-18)


def encode_header(nbytes: int, cfg: CodedConfig):
    """Explicit header, standard LoRa 5-nibble layout in the first
    interleaver block at PPM = sf-2, CR 4/8:
    ``[len_hi, len_lo, flags, chk_hi(1b), chk_lo]`` with
    ``flags = cr<<1 | crc_en`` and the reference's 5-bit header checksum
    over ``h = [len, flags]`` (LoRaCodes.hpp:43-67).
    LDRO is channel configuration (derived from SF/BW), not signalled.
    Returns [8] header symbols (one PPM=sf-2 block at CR 4/8)."""
    flags = ((cfg.cr & 0x7) << 1) | int(cfg.crc)
    h = np.array([nbytes & 0xFF, flags & 0x0F], dtype=np.uint8)
    chk = int(np.asarray(coding.header_checksum(h)))
    ppm = cfg.sf - 2
    nibbles = np.zeros(ppm, dtype=np.uint8)
    stream = [h[0] >> 4, h[0] & 0xF, h[1] & 0xF, (chk >> 4) & 0x1, chk & 0xF]
    nibbles[:5] = stream
    codewords = coding.hamming84_encode(nibbles)
    words = coding.diagonal_interleave(codewords, ppm, HEADER_RDD)
    bins = coding.gray_to_binary(words.astype(jnp.uint16)) << 2
    return bins.astype(jnp.uint16)


def decode_header(symbols, sf: int):
    """Inverse of :func:`encode_header`. Returns (nbytes, cr, crc_en, ok)."""
    ppm = sf - 2
    words = coding.binary_to_gray(jnp.asarray(symbols, jnp.uint16) >> 2)
    codewords = coding.diagonal_deinterleave(words, ppm, HEADER_RDD)
    nibbles, _, _ = coding.hamming84_decode(codewords)
    nib = np.asarray(nibbles).reshape(-1)
    h = np.array([(nib[0] << 4) | nib[1], nib[2] & 0x0F], dtype=np.uint8)
    chk = ((nib[3] & 0x1) << 4) | (nib[4] & 0xF)
    ok = chk == int(np.asarray(coding.header_checksum(h)))
    nbytes = int(h[0])
    flags = int(h[1])
    return nbytes, (flags >> 1) & 0x7, bool(flags & 1), ok
