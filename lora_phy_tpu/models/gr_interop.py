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


# --- gr bin <-> interleaver-word maps (capture-validated conventions) ----
# reduced-rate blocks (the first block, and every block under LDRO): the
# two LSBs carry no data, no bin offset; full-rate blocks carry the gr
# demodulator's -1 bin offset.

def _rx_words_reduced(bins, n):
    # gr-lora_sdr demaps reduced-rate blocks with round(bin/4), not
    # truncation: a -1 bin drift (4w-1) still demaps to w, preserving the
    # drift tolerance LDRO exists for (truncation would cost one codeword
    # bit — only DETECTED, not corrected, at CR 4/5-4/6)
    w = (((bins % n) + 2) >> 2) % (n >> 2)
    return np.asarray(coding.binary_to_gray(w.astype(np.uint16)))


def _tx_bins_reduced(words, n):
    return (np.asarray(coding.gray_to_binary(words.astype(np.uint16))) << 2) % n


def _rx_words_full(bins, n):
    return np.asarray(coding.binary_to_gray(((bins - 1) % n).astype(np.uint16)))


def _tx_bins_full(words, n):
    return (np.asarray(coding.gray_to_binary(words.astype(np.uint16))) + 1) % n


# FEC dispatch is shared with the coded chain (models/coded.py) — one
# source for the CR->code mapping, and invalid cr raises there instead of
# silently falling through to Hamming84.
from .coded import _fec_decode, _fec_encode  # noqa: E402


def payload_block_plan(sf: int, cr: int, length: int, crc: bool,
                       ldro: bool, implicit: bool):
    """gr-lora_sdr frame geometry: the first block is always reduced rate
    (PPM = sf-2, CR 4/8, 8 symbols) and carries either the 5 header
    nibbles plus ``sf-7`` payload nibbles (explicit header) or ``sf-2``
    payload nibbles (implicit); subsequent blocks run at PPM = sf (sf-2
    under LDRO) and 4+cr symbols. Returns
    ``(nibbles_in_first, ppm_rest, n_rest_blocks, total_payload_nibbles)``."""
    total_nibbles = 2 * (length + (2 if crc else 0))
    in_first = (sf - 2) if implicit else (sf - 2 - 5)
    in_first = max(0, min(in_first, total_nibbles))
    ppm_rest = (sf - 2) if ldro else sf
    rest = total_nibbles - in_first
    n_rest_blocks = -(-rest // ppm_rest) if rest else 0
    return in_first, ppm_rest, n_rest_blocks, total_nibbles


def decode_frame(samples, params: LoraParams, preamble_len: int = 8,
                 ldro: bool = False, implicit: bool = False,
                 length: int | None = None, cr: int | None = None,
                 crc: bool | None = None, soft: bool = False,
                 tx_phase_step: float | None = 0.0):
    """Detect and decode one gr-lora_sdr frame from a continuous stream.

    ``ldro``/``implicit`` select the capture-naming cells
    (``ldro_{false,true}...implheader_{false,true}``, reference:
    vectors_binary/ naming). Implicit-header mode has no in-band header,
    so ``length``/``cr``/``crc`` must be supplied (the gr receiver is
    configured the same way). ``soft=True`` decodes header and payload
    from the symbol spectra by ML codeword correlation (models.soft, with
    gr's bin conventions) — ~1 dB extra link margin on real captures.
    Returns ``GrFrame`` or ``None``.
    """
    sf = params.sf
    n = params.n
    if implicit and (length is None or cr is None or crc is None):
        raise ValueError("implicit header needs length, cr and crc")

    res = stream.frame_sync(samples, params, preamble_len)
    if not res.found:
        return None
    avail = (np.asarray(samples).shape[-1] - res.payload_start) // params.step
    if avail < 8:
        return None
    # TX phase convention for the fine-CFO estimator: real gr-lora_sdr
    # frames carry no per-symbol phase step (the default 0.0); frames
    # synthesized by :func:`encode_frame` ride the phase-continuous
    # lattice whose step is pi per symbol — pass ``tx_phase_step=None``
    # for those (the estimator then derives the lattice value). The
    # wrong convention parks the fractional-CFO estimate at exactly
    # half a bin, where every hard decision is an ULP coin flip.
    dm = stream.frame_demodulate(samples, params, int(avail), preamble_len,
                                 tx_phase_step=tx_phase_step,
                                 return_spectra=soft,
                                 sync_result=res)
    out = dm[0]
    if out is None:
        return None
    return decode_bins(np.asarray(out.symbols), sf,
                       ldro=ldro, implicit=implicit, length=length, cr=cr,
                       crc=crc, soft=soft,
                       mag2=np.asarray(dm[2]) if soft else None,
                       start=res.start, cfo_bins=res.cfo_bins)


def decode_bins(bins, sf: int, ldro: bool = False, implicit: bool = False,
                length: int | None = None, cr: int | None = None,
                crc: bool | None = None, soft: bool = False, mag2=None,
                start: int = 0, cfo_bins: int = 0):
    """Decode one gr-lora_sdr frame from already-demodulated symbol bins
    (header first): the coding half of :func:`decode_frame`, split out so
    ANY demodulator that yields raw bins — the serial
    ``stream.frame_demodulate`` path above, or the device-side batched /
    mesh-sharded block and wideband receivers (``models.sync.
    receive_block_planar`` / ``receive_wideband_planar`` with
    ``tx_phase_step=0.0``, whose BlockFrames.symbols rows feed here
    directly) — shares one gr coding pipeline. ``soft=True`` needs the
    matching ``mag2`` spectra. Returns ``GrFrame`` or ``None`` when the
    bins run out before the header-declared payload ends."""
    n = 1 << sf
    if implicit and (length is None or cr is None or crc is None):
        raise ValueError("implicit header needs length, cr and crc")
    bins = np.asarray(bins).astype(np.int64)
    if soft and mag2 is None:
        raise ValueError("soft=True requires the matching mag2 spectra")
    if mag2 is not None:
        mag2 = np.asarray(mag2)
    # the docstring's "None when the bins run out" must also cover the
    # 8-symbol first block (a truncated BlockFrames row, or a caller
    # with n_payload_symbols < 8), not just the payload region below
    if bins.shape[0] < 8 or (soft and mag2.shape[0] < 8):
        return None

    # --- first block: 8 symbols, reduced rate (PPM = sf-2), CR 4/8 -------
    if soft:
        from . import soft as softmod

        llr0 = softmod.bin_llrs(mag2[:8], sf - 2, shift=2)
        nib0, _ = softmod.ml_decode(
            softmod.deinterleave_llrs(llr0, sf - 2, 4), 4)
        nib0 = np.asarray(nib0)
        fec_errors = 0
    else:
        w0 = _rx_words_reduced(bins[:8], n)
        cw0 = np.asarray(
            coding.diagonal_deinterleave(w0.astype(np.uint16), sf - 2, 4))
        nib0, err0 = _fec_decode(cw0, 4)
        nib0 = np.asarray(nib0)
        fec_errors = int(np.asarray(err0).sum())

    header_ok = True
    if implicit:
        has_crc = bool(crc)
        first_payload_nib = nib0
    else:
        length = int((nib0[0] << 4) | nib0[1])
        flags = int(nib0[2])
        cr = (flags >> 1) & 0x7
        has_crc = bool(flags & 1)
        chk = ((int(nib0[3]) & 0x1) << 4) | int(nib0[4])
        h = np.array([length & 0xFF, flags & 0x0F], dtype=np.uint8)
        header_ok = chk == int(np.asarray(coding.header_checksum(h)))
        first_payload_nib = nib0[5:]
        if cr < 1 or cr > 4 or length == 0:
            return GrFrame(b"", length, cr, has_crc, b"", False, header_ok, 0,
                           start, cfo_bins)

    in_first, ppm_rest, n_rest, total_nibbles = payload_block_plan(
        sf, cr, length, has_crc, ldro, implicit
    )

    # --- remaining blocks: PPM = sf (sf-2 under LDRO), RDD = cr ----------
    nsym = n_rest * (4 + cr)
    pay_bins = bins[8: 8 + nsym]
    if pay_bins.shape[-1] < nsym:
        return None
    if soft and mag2.shape[0] < 8 + nsym:
        return None                     # truncated spectra, not short LLRs
    if nsym and soft:
        from . import soft as softmod

        llrp = softmod.bin_llrs(mag2[8: 8 + nsym], ppm_rest,
                                shift=2 if ldro else 0,
                                offset=0 if ldro else 1)
        nibp, _ = softmod.ml_decode(
            softmod.deinterleave_llrs(llrp, ppm_rest, cr), cr)
        nibp = np.asarray(nibp)
    elif nsym:
        w = (_rx_words_reduced(pay_bins, n) if ldro
             else _rx_words_full(pay_bins, n))
        cwp = np.asarray(
            coding.diagonal_deinterleave(w.astype(np.uint16), ppm_rest, cr)
        )
        nibp, errp = _fec_decode(cwp, cr)
        nibp = np.asarray(nibp)
        fec_errors += int(np.asarray(errp).sum())
    else:
        nibp = np.zeros(0, np.uint8)

    nib = np.concatenate([first_payload_nib[:in_first], nibp])[:total_nibbles]
    # gr nibble order is low-then-high within each byte
    swapped = nib.reshape(-1, 2)[:, ::-1].reshape(-1)
    data = np.asarray(coding.nibbles_to_bytes(swapped))
    total_bytes = length + (2 if has_crc else 0)
    payload = whiten_gr_lora(data[:length]).tobytes()
    crc_bytes = data[length:total_bytes].tobytes() if has_crc else b""
    crc_ok = bool(
        has_crc and len(crc_bytes) == 2
        and (crc_bytes[0] | (crc_bytes[1] << 8)) == crc16_gr_lora(payload)
    )
    return GrFrame(payload, length, cr, has_crc, crc_bytes, crc_ok,
                   header_ok, fec_errors, start, cfo_bins)


def encode_frame(payload: bytes, params: LoraParams, cr: int = 1,
                 crc: bool = True, preamble_len: int = 8,
                 ldro: bool = False, implicit: bool = False):
    """Build a gr-lora_sdr-convention frame for ``payload``: the exact
    inverse of :func:`decode_frame` across all four
    ``ldro`` x ``implheader`` cells (reduced-rate first block carrying
    header+payload or pure payload, gr whitening LFSR, low-high nibble
    order, per-block bin maps), wrapped in the standard
    preamble/sync/2.25-downchirp frame. Returns complex64 IQ samples.
    """
    sf = params.sf
    n = params.n
    length = len(payload)

    # --- payload nibble stream (whitened payload + raw CRC trailer) ------
    data = np.frombuffer(payload, dtype=np.uint8)
    if crc:
        c = crc16_gr_lora(payload)
        trailer = np.array([c & 0xFF, c >> 8], dtype=np.uint8)
    else:
        trailer = np.zeros(0, np.uint8)
    framed = np.concatenate([whiten_gr_lora(data), trailer])
    nibbles = np.asarray(coding.bytes_to_nibbles(framed))
    nibbles = nibbles.reshape(-1, 2)[:, ::-1].reshape(-1)   # low then high

    in_first, ppm_rest, n_rest, total_nibbles = payload_block_plan(
        sf, cr, length, crc, ldro, implicit
    )

    # --- first block (reduced rate, CR 4/8) ------------------------------
    nib0 = np.zeros(sf - 2, dtype=np.uint8)
    if implicit:
        nib0[:in_first] = nibbles[:in_first]
    else:
        flags = ((cr & 0x7) << 1) | int(crc)
        h = np.array([length & 0xFF, flags & 0x0F], dtype=np.uint8)
        chk = int(np.asarray(coding.header_checksum(h)))
        nib0[:5] = [length >> 4, length & 0xF, flags & 0xF, (chk >> 4) & 0x1,
                    chk & 0xF]
        nib0[5:5 + in_first] = nibbles[:in_first]
    cw0 = np.asarray(coding.hamming84_encode(nib0))
    w0 = np.asarray(coding.diagonal_interleave(cw0, sf - 2, 4))
    bins0 = _tx_bins_reduced(w0, n)

    # --- remaining blocks ------------------------------------------------
    rest = nibbles[in_first:]
    pad = n_rest * ppm_rest - rest.size
    if pad:
        rest = np.concatenate([rest, np.zeros(pad, np.uint8)])
    if rest.size:
        cw = np.asarray(_fec_encode(rest, cr))
        w = np.asarray(coding.diagonal_interleave(cw, ppm_rest, cr))
        pbins = _tx_bins_reduced(w, n) if ldro else _tx_bins_full(w, n)
    else:
        pbins = np.zeros(0, np.int64)

    symbols = np.concatenate([bins0, pbins]).astype(np.uint16)
    # gr BINS on OUR phase-continuous lattice TX. The phase conventions
    # genuinely differ: gr-lora_sdr builds each symbol chirp
    # independently (zero per-symbol phase step, pi DISCONTINUITIES at
    # chirp boundaries), while the lattice TX is phase-continuous with
    # a pi step per symbol. Emitting the gr trajectory here was built
    # and measured WORSE: the boundary jumps cancel the dechirped tone
    # of every straddling scan window (10/10 sync misses at +6 dB for
    # mid-window arrivals), while the pi step is a per-symbol constant
    # any magnitude receiver ignores. Decode frames from here with
    # ``decode_frame(..., tx_phase_step=None)`` (the lattice
    # convention); the 0.0 default is for real gr captures — with 0.0
    # the estimator reads the pi step as exactly half a bin and hard
    # decisions become ULP coin flips.
    return stream.frame_modulate(symbols, params, preamble_len=preamble_len)
