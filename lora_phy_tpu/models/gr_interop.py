"""gr-lora_sdr interoperability receiver.

Decodes real over-the-air frames produced by the public GNU Radio
gr-lora_sdr TX — the implementation the reference's golden captures come
from (reference: vectors_binary/bw_125k_sf_7_cr_1_ldro_false_crc_true_
implheader_false.unknown, scripts/make_golden_vectors.py). The reference
repo ships several exploratory scripts that try to decode that capture
(scripts/full_lora_decoder.py etc.) without arriving at the plaintext;
this module's chain recovers it end-to-end:

  frame_sync (two-sided dechirp)             -> start, integer CFO
  header block: 8 symbols, PPM = sf-2, CR4/8 -> [len, flags, checksum]
  payload: bins -> (bin - 1) -> Gray-encode -> diagonal deinterleave
           (PPM = sf, RDD = cr) -> FEC check -> nibbles (low-high order)
           -> gr whitening LFSR (x^8+x^6+x^5+x^4+1, seed 0xFF)

Validated against the 267k-sample capture: header (len=14, CR 4/5,
CRC on) and payload b"hello world: 0" recover exactly.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..ops import coding
from ..utils.params import LoraParams
from . import stream


@functools.lru_cache(maxsize=4)
def _gr_whitening_seq(n: int = 255) -> np.ndarray:
    """gr-lora_sdr whitening keystream: Fibonacci LFSR, polynomial
    x^8 + x^6 + x^5 + x^4 + 1 (taps 7,5,4,3 on the state byte), seed 0xFF,
    one byte consumed per payload byte."""
    s = 0xFF
    out = np.empty(n, np.uint8)
    for i in range(n):
        out[i] = s
        fb = ((s >> 7) ^ (s >> 5) ^ (s >> 4) ^ (s >> 3)) & 1
        s = ((s << 1) | fb) & 0xFF
    return out


def whiten_gr_lora(data):
    """XOR with the gr-lora_sdr keystream (involutive)."""
    data = np.asarray(data, np.uint8)
    return data ^ _gr_whitening_seq(max(255, data.shape[-1]))[: data.shape[-1]]


def crc16_gr_lora(payload: bytes) -> int:
    """gr-lora_sdr payload CRC: CRC16-CCITT (poly 0x1021, init 0) over
    ``payload[:-2]``, then XOR with the last two payload bytes
    (``^ payload[-1] ^ (payload[-2] << 8)``). Identified by matching the
    reference capture's trailer (0xd411 for b"hello world: 0")."""
    crc = 0
    for b in payload[:-2]:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    if len(payload) >= 2:
        crc ^= payload[-1] | (payload[-2] << 8)
    return crc


@dataclasses.dataclass
class GrFrame:
    payload: bytes
    length: int
    cr: int                # 1..4 -> 4/5..4/8
    has_crc: bool
    crc_bytes: bytes       # raw trailer
    crc_ok: bool           # trailer == crc16_gr_lora(payload)
    header_ok: bool
    fec_errors: int
    start: int
    cfo_bins: int


def decode_frame(samples, params: LoraParams, preamble_len: int = 8):
    """Detect and decode one gr-lora_sdr frame from a continuous stream.

    Returns ``GrFrame`` or ``None`` when no frame is found.
    """
    sf = params.sf
    n = params.n

    res = stream.frame_sync(samples, params, preamble_len)
    if not res.found:
        return None

    # demodulate enough symbols for header + max payload
    avail = (np.asarray(samples).shape[-1] - res.payload_start) // params.step
    if avail < 8:
        return None
    out, _ = stream.frame_demodulate(samples, params, int(avail), preamble_len)
    if out is None:
        return None
    bins = np.asarray(out.symbols).astype(np.int64)

    # --- header: first 8 symbols, reduced rate (PPM = sf-2), CR 4/8 ------
    hv = ((bins[:8] - 0) % n) >> 2      # low 2 bits carry no data
    hw = np.asarray(coding.binary_to_gray(hv.astype(np.uint16)))
    hcw = np.asarray(coding.diagonal_deinterleave(hw.astype(np.uint16), sf - 2, 4))
    hnib, _, _ = coding.hamming84_decode(hcw)
    hnib = np.asarray(hnib)
    length = int((hnib[0] << 4) | hnib[1])
    flags = int(hnib[2])
    cr = (flags >> 1) & 0x7
    has_crc = bool(flags & 1)
    chk = ((int(hnib[3]) & 0x1) << 4) | int(hnib[4])
    h = np.array([length & 0xFF, flags & 0x0F], dtype=np.uint8)
    header_ok = chk == int(np.asarray(coding.header_checksum(h)))
    if cr < 1 or cr > 4 or length == 0:
        return GrFrame(b"", length, cr, has_crc, b"", False, header_ok, 0,
                       res.start, res.cfo_bins)

    # --- payload: full rate, PPM = sf, RDD = cr --------------------------
    total_bytes = length + (2 if has_crc else 0)
    nibble_count = total_bytes * 2
    blocks = -(-nibble_count // sf)
    nsym = blocks * (4 + cr)
    pay_bins = bins[8: 8 + nsym]
    if pay_bins.shape[-1] < nsym:
        return None
    v = (pay_bins - 1) % n
    w = np.asarray(coding.binary_to_gray(v.astype(np.uint16)))
    cw = np.asarray(coding.diagonal_deinterleave(w.astype(np.uint16), sf, cr))
    if cr == 1:
        nib, err = coding.parity54_check(cw)
    elif cr == 2:
        nib, err = coding.parity64_check(cw)
    elif cr == 3:
        nib, err = coding.hamming74_decode(cw)
    else:
        nib, err, _ = coding.hamming84_decode(cw)
    nib = np.asarray(nib)[:nibble_count]
    fec_errors = int(np.asarray(err).sum())

    # gr nibble order is low-then-high within each byte
    swapped = nib.reshape(-1, 2)[:, ::-1].reshape(-1)
    data = np.asarray(coding.nibbles_to_bytes(swapped))
    payload = whiten_gr_lora(data[:length]).tobytes()
    crc_bytes = data[length:total_bytes].tobytes() if has_crc else b""
    crc_ok = bool(
        has_crc and len(crc_bytes) == 2
        and (crc_bytes[0] | (crc_bytes[1] << 8)) == crc16_gr_lora(payload)
    )
    return GrFrame(payload, length, cr, has_crc, crc_bytes, crc_ok,
                   header_ok, fec_errors, res.start, res.cfo_bins)


def encode_frame(payload: bytes, params: LoraParams, cr: int = 1,
                 crc: bool = True, preamble_len: int = 8):
    """Build a gr-lora_sdr-convention frame for ``payload``: the exact
    inverse of :func:`decode_frame` (header block at PPM=sf-2/CR4/8,
    payload whitened with the gr LFSR, low-high nibble order, Gray +1 bin
    mapping), wrapped in the standard preamble/sync/2.25-downchirp frame.

    Returns complex64 IQ samples.
    """
    sf = params.sf
    n = params.n
    length = len(payload)

    # --- header block ----------------------------------------------------
    flags = ((cr & 0x7) << 1) | int(crc)
    h = np.array([length & 0xFF, flags & 0x0F], dtype=np.uint8)
    chk = int(np.asarray(coding.header_checksum(h)))
    hnib = np.zeros(sf - 2, dtype=np.uint8)
    hnib[:5] = [length >> 4, length & 0xF, flags & 0xF, (chk >> 4) & 0x1,
                chk & 0xF]
    hcw = np.asarray(coding.hamming84_encode(hnib))
    hw = np.asarray(coding.diagonal_interleave(hcw, sf - 2, 4))
    hbins = (np.asarray(coding.gray_to_binary(hw.astype(np.uint16))) << 2) % n

    # --- payload block(s) ------------------------------------------------
    data = np.frombuffer(payload, dtype=np.uint8)
    if crc:
        c = crc16_gr_lora(payload)
        trailer = np.array([c & 0xFF, c >> 8], dtype=np.uint8)
    else:
        trailer = np.zeros(0, np.uint8)
    whitened = whiten_gr_lora(data)
    framed = np.concatenate([whitened, trailer])
    nibbles = np.asarray(coding.bytes_to_nibbles(framed))
    # gr nibble order: low then high
    nibbles = nibbles.reshape(-1, 2)[:, ::-1].reshape(-1)
    blocks = -(-len(nibbles) // sf)
    pad = blocks * sf - len(nibbles)
    if pad:
        nibbles = np.concatenate([nibbles, np.zeros(pad, np.uint8)])
    if cr == 1:
        cw = coding.parity54_encode(nibbles)
    elif cr == 2:
        cw = coding.parity64_encode(nibbles)
    elif cr == 3:
        cw = coding.hamming74_encode(nibbles)
    else:
        cw = coding.hamming84_encode(nibbles)
    w = np.asarray(coding.diagonal_interleave(np.asarray(cw), sf, cr))
    pbins = (np.asarray(coding.gray_to_binary(w.astype(np.uint16))) + 1) % n

    symbols = np.concatenate([hbins, pbins]).astype(np.uint16)
    return stream.frame_modulate(symbols, params, preamble_len=preamble_len)
