"""Device-side batched frame sync (models/sync.py): the whole scan in one
jit over [channels, windows]; host keeps only frame bookkeeping."""

import numpy as np
import pytest

from lora_phy_tpu.models import modem, stream, sync
from lora_phy_tpu.ops import planar
from lora_phy_tpu.ops.impair import apply_cfo_continuous
from lora_phy_tpu.utils.params import LoraParams


def _frame(p, payload, preamble_len=8):
    syms = modem.encode(payload)
    return np.asarray(stream.frame_modulate(syms, p, preamble_len))


def _place(frames_and_offsets, total):
    out = np.zeros(total, np.complex64)
    for iq, off in frames_and_offsets:
        out[off: off + iq.size] = iq
    return out


def test_multichannel_batched_scan():
    """One scan call over [C, T]; each channel's frame at a different
    offset is found where frame_sync finds it."""
    p = LoraParams(sf=7)
    rng = np.random.RandomState(0)
    offsets = [0, 131, 517, 1024]
    total = 6000
    chans = []
    for c, off in enumerate(offsets):
        payload = rng.randint(0, 256, 4).astype(np.uint8)
        chans.append(_place([(_frame(p, payload), off)], total))
    streams = np.stack(chans)

    re, im = planar.split_complex(streams)
    scan = sync.frame_sync_scan_planar(re, im, p)
    assert scan.valid.shape == (4, total // p.step)
    for c, off in enumerate(offsets):
        single = stream.frame_sync(streams[c], p)
        assert single.found
        row = sync.SyncScan(*(np.asarray(f)[c] for f in scan))
        got = stream.first_candidate(row)
        assert got is not None
        assert got[0] == single.start
        assert got[1] == single.cfo_bins


def test_multi_frame_candidates_in_one_stream():
    p = LoraParams(sf=7)
    rng = np.random.RandomState(1)
    f1 = _frame(p, rng.randint(0, 256, 4).astype(np.uint8))
    f2 = _frame(p, rng.randint(0, 256, 4).astype(np.uint8))
    off2 = f1.size + 3 * p.step
    s = _place([(f1, 0), (f2, off2)], off2 + f2.size + p.step)

    re, im = planar.split_complex(s)
    scan = sync.frame_sync_scan_planar(re, im, p)
    valid = np.asarray(scan.valid)
    starts = np.asarray(scan.start)[valid]
    assert starts.size >= 2
    assert starts[0] == 0
    assert off2 in starts.tolist()


# step/2 (=64 here) is the degenerate point of the two-sided split
# (tau=+/-step/2 aliases cfo=-/+n/2); the receivers resolve it with the
# 2-window SFD probe (models/sync.py tau-disambiguation), so it is IN
# the matrix
@pytest.mark.parametrize("offset", [0, 1, 63, 64, 65, 127])
def test_scan_offset_matches_host_sync(offset):
    p = LoraParams(sf=7)
    rng = np.random.RandomState(2)
    payload = rng.randint(0, 256, 6).astype(np.uint8)
    iq = _frame(p, payload)
    s = _place([(iq, offset)], iq.size + offset + p.step)
    res = stream.frame_sync(s, p)
    assert res.found
    # the sync point feeds the demodulator: the frame must decode
    out, r2 = stream.frame_demodulate(s, p, payload.size * 2)
    assert out is not None
    np.testing.assert_array_equal(
        np.asarray(modem.decode(np.asarray(out.symbols))), payload
    )


@pytest.mark.parametrize("cfo_bins", [-3, 2])
def test_scan_integer_cfo_recovered(cfo_bins):
    p = LoraParams(sf=7)
    rng = np.random.RandomState(3)
    payload = rng.randint(0, 256, 4).astype(np.uint8)
    iq = _frame(p, payload)
    rot = np.asarray(apply_cfo_continuous(iq, float(cfo_bins), p.n, p.osr))
    s = _place([(rot, 2 * p.step)], rot.size + 4 * p.step)
    res = stream.frame_sync(s, p)
    assert res.found
    assert res.cfo_bins == cfo_bins


def test_no_frame_no_candidates():
    p = LoraParams(sf=7)
    rng = np.random.RandomState(4)
    noise = (0.1 * (rng.randn(4000) + 1j * rng.randn(4000))).astype(np.complex64)
    re, im = planar.split_complex(noise)
    scan = sync.frame_sync_scan_planar(re, im, p)
    # random noise: no preamble-length equal-bin run followed by a
    # downchirp pair should validate (probabilistically safe at this seed)
    assert not np.asarray(scan.valid).any()
    assert not stream.frame_sync(noise, p).found


def test_receive_block_multiframe_multichannel():
    """The one-jit block receiver finds and demodulates every frame in a
    [channels, T] block, matching the serial per-frame receiver."""
    p = LoraParams(sf=7)
    rng = np.random.RandomState(7)
    n_payload = 8                      # payload symbols per frame
    chans, starts, wants = [], [], []
    total = 14000
    for c in range(3):
        offs = [100 + 400 * c, 7000 + 150 * c]
        frames, pls = [], []
        for off in offs:
            pl = rng.randint(0, 256, n_payload // 2).astype(np.uint8)
            pls.append(pl)
            frames.append((_frame(p, pl), off))
        chans.append(_place(frames, total))
        starts.append(offs)
        wants.append(pls)
    streams = np.stack(chans)
    re, im = planar.split_complex(streams)

    blk = sync.receive_block_planar(re, im, p, n_payload, max_frames=3)
    found = np.asarray(blk.found)
    assert found[:, :2].all() and not found[:, 2].any()
    np.testing.assert_array_equal(np.asarray(blk.start)[:, :2], np.asarray(starts))
    assert (np.asarray(blk.sync)[:, :2] == p.sync_word).all()
    for c in range(3):
        for k in range(2):
            dec = np.asarray(modem.decode(np.asarray(blk.symbols)[c, k]))
            np.testing.assert_array_equal(dec, wants[c][k])


def test_receive_block_matches_serial_receiver():
    """Bit-parity with the serial frame_demodulate path, including under
    integer CFO."""
    p = LoraParams(sf=7)
    rng = np.random.RandomState(8)
    pl = rng.randint(0, 256, 5).astype(np.uint8)
    iq = _frame(p, pl)
    rot = np.asarray(apply_cfo_continuous(iq, 2.0, p.n, p.osr))
    s = _place([(rot, 3 * p.step)], rot.size + 6 * p.step)

    out, res = stream.frame_demodulate(s, p, 10)
    assert out is not None

    re, im = planar.split_complex(s[None])
    blk = sync.receive_block_planar(re, im, p, 10, max_frames=2)
    assert np.asarray(blk.found)[0, 0] and not np.asarray(blk.found)[0, 1]
    np.testing.assert_array_equal(
        np.asarray(blk.symbols)[0, 0], np.asarray(out.symbols)
    )
    assert int(np.asarray(blk.cfo_bins)[0, 0]) == res.cfo_bins
    assert int(np.asarray(blk.sync)[0, 0]) == int(np.asarray(out.sync_word))


def test_receive_block_frame_past_end_not_reported():
    p = LoraParams(sf=7)
    rng = np.random.RandomState(9)
    pl = rng.randint(0, 256, 4).astype(np.uint8)
    iq = _frame(p, pl)
    # truncate mid-payload: sync section present, payload runs past T
    cut = iq.size - 4 * p.step
    s = _place([(iq[:cut], 0)], cut)
    re, im = planar.split_complex(s[None])
    blk = sync.receive_block_planar(re, im, p, 8, max_frames=2)
    assert not np.asarray(blk.found).any()


def test_batch_stream_demodulator_matches_serial():
    """BatchStreamDemodulator (one device program per block) finds the
    same frames as the serial StreamDemodulator across block seams."""
    p = LoraParams(sf=7)
    rng = np.random.RandomState(10)
    n_payload = 10
    payloads = [rng.randint(0, 256, n_payload // 2).astype(np.uint8)
                for _ in range(5)]
    frames = []
    pos = 300
    for pl in payloads:
        iq = _frame(p, pl)
        frames.append((iq, pos))
        pos += iq.size + 5 * p.step + int(rng.randint(0, p.step))
    total = pos + 4 * p.step
    s = _place(frames, total)

    serial = stream.StreamDemodulator(p, n_payload)
    st = serial.init_state()
    got_serial = []
    block = 2 * serial.frame_len
    for off in range(0, total, block):
        st, out = serial.process(st, s[off:off + block])
        got_serial.extend(out)

    re, im = planar.split_complex(s)
    batch = stream.BatchStreamDemodulator(p, n_payload, max_frames=4)
    bst = batch.init_state()
    got_batch = []
    for off in range(0, total, block):
        bst, out = batch.process(bst, re[off:off + block], im[off:off + block])
        got_batch.extend(out)

    assert len(got_serial) == len(got_batch) == len(payloads)
    for (s_start, s_res), (b_start, b_syms, b_sync, b_cfo), pl in zip(
            got_serial, got_batch, payloads):
        assert s_start == b_start
        np.testing.assert_array_equal(np.asarray(s_res.symbols), b_syms)
        assert b_sync == p.sync_word
        np.testing.assert_array_equal(
            np.asarray(modem.decode(b_syms)), pl
        )


def test_batch_stream_demodulator_overflow_frames_carry():
    """More frames in a block than max_frames: the remainder carries to
    the next process call instead of being dropped."""
    p = LoraParams(sf=7)
    rng = np.random.RandomState(11)
    n_payload = 8
    payloads = [rng.randint(0, 256, n_payload // 2).astype(np.uint8)
                for _ in range(4)]
    frames, pos = [], 50
    for pl in payloads:
        iq = _frame(p, pl)
        frames.append((iq, pos))
        pos += iq.size + 2 * p.step
    s = _place(frames, pos + 2 * p.step)
    re, im = planar.split_complex(s)

    batch = stream.BatchStreamDemodulator(p, n_payload, max_frames=2)
    st = batch.init_state()
    st, out1 = batch.process(st, re, im)
    assert len(out1) == 2
    st, out2 = batch.process(st, np.zeros(0, np.float32), np.zeros(0, np.float32))
    assert len(out2) == 2
    decs = [np.asarray(modem.decode(o[1])) for o in out1 + out2]
    for d, pl in zip(decs, payloads):
        np.testing.assert_array_equal(d, pl)


def test_block_frames_snr_observable():
    """receive_block_planar reports a sane per-frame SNR: high on a clean
    frame, ~the injected channel SNR under noise."""
    import jax

    from lora_phy_tpu.models import modem, stream
    from lora_phy_tpu.ops.impair import apply_awgn

    p = LoraParams(sf=7)
    syms = np.asarray(modem.encode(np.arange(16, dtype=np.uint8)), np.int32)
    fr = np.asarray(stream.frame_modulate(syms, p))
    sig = np.concatenate([np.zeros(400, np.complex64), fr,
                          np.zeros(400, np.complex64)])

    def snr_of(x):
        blk = sync.receive_block_planar(
            np.ascontiguousarray(x.real.astype(np.float32)),
            np.ascontiguousarray(x.imag.astype(np.float32)),
            p, syms.shape[-1], max_frames=1)
        assert bool(np.asarray(blk.found)[0])
        return float(np.asarray(blk.snr_db)[0])

    clean = snr_of(sig)
    assert clean > 40.0
    noisy = snr_of(np.asarray(apply_awgn(jax.random.PRNGKey(0), sig, 5.0)))
    # detector SNR ~ channel SNR + processing margin; must sit well below
    # the clean reading and above the no-signal floor
    assert 5.0 < noisy < clean - 10.0


def test_blind_sf_receive_mixed_stream():
    """SF7 and SF9 frames in ONE stream: receive_blind_planar finds each
    at exactly its own SF (wrong-SF dechirp spreads the energy, so the
    equal-bin run + SFD test rejects cross-SF candidates), with correct
    starts, sync words and decoded payloads."""
    rng = np.random.RandomState(12)
    base = LoraParams(sf=7)
    pl7 = rng.randint(0, 256, 4).astype(np.uint8)
    pl9 = rng.randint(0, 256, 4).astype(np.uint8)
    f7 = _frame(LoraParams(sf=7), pl7)
    f9 = _frame(LoraParams(sf=9), pl9)
    off7 = 3 * 128
    off9 = off7 + f7.size + 5 * 128
    total = off9 + f9.size + 14 * 512          # room for an SF9+ scan tail
    s = _place([(f7, off7), (f9, off9)], total)

    re, im = planar.split_complex(s)
    res = sync.receive_blind_planar(re, im, base, n_payload_symbols=8,
                                    sfs=(7, 8, 9, 10))
    rows = sync.blind_frames(res)
    assert [r["sf"] for r in rows] == [7, 9]
    assert rows[0]["start"] == off7 and rows[1]["start"] == off9
    for r, pl in zip(rows, (pl7, pl9)):
        assert r["sync"] == 0x12
        dec = np.asarray(modem.decode(r["symbols"]))
        np.testing.assert_array_equal(dec, pl)


def test_blind_sf_rejects_noise_and_skips_short_sfs():
    """Noise-only stream: no SF fires; SFs whose preamble cannot fit in
    the block are omitted from the result dict."""
    rng = np.random.RandomState(13)
    noise = (rng.randn(9000) + 1j * rng.randn(9000)).astype(np.complex64) * 0.05
    re, im = planar.split_complex(noise)
    res = sync.receive_blind_planar(re, im, LoraParams(sf=7), 8,
                                    sfs=(7, 8, 9, 12))
    assert 12 not in res                        # 9000 < (8+4)*4096
    assert sync.blind_frames(res) == []


def test_block_frames_sro_observable():
    """receive_block_planar reports a per-frame clock-drift estimate
    (sro_ppm, from the contiguous payload section): ~0 on a clean frame,
    ~the injected drift under SRO, for both osr 1 and 2."""
    from lora_phy_tpu.ops.impair import apply_sro, compensate_sro

    rng = np.random.RandomState(11)
    payload = rng.randint(0, 256, 8).astype(np.uint8)
    # osr=2 uses the exact (continuous-chirp) fold: under the reference
    # fold's pi discontinuity the double linear resample (inject +
    # compensate) leaves boundary symbols slipping +/-1 bin
    for osr, cont, ppm in ((1, False, 40.0), (2, True, -40.0)):
        p = LoraParams(sf=7, osr=osr, continuous_chirp=cont)
        syms = np.asarray(modem.encode(payload), np.int32)
        fr = np.asarray(stream.frame_modulate(syms, p))
        sig = np.concatenate([np.zeros(5 * p.step, np.complex64), fr,
                              np.zeros(5 * p.step, np.complex64)])

        def receive(x):
            re, im = planar.split_complex(np.asarray(x, np.complex64))
            blk = sync.receive_block_planar(re, im, p, syms.shape[-1],
                                            max_frames=1)
            assert bool(np.asarray(blk.found)[0])
            return blk

        clean = receive(sig)
        assert abs(float(np.asarray(clean.sro_ppm)[0])) < 1.0, (osr, ppm)
        np.testing.assert_array_equal(
            np.asarray(modem.decode(np.asarray(clean.symbols)[0])), payload)
        drifted_iq = np.asarray(apply_sro(sig, ppm), np.complex64)
        drifted = receive(drifted_iq)
        est = float(np.asarray(drifted.sro_ppm)[0])
        assert abs(est - ppm) < 0.25 * abs(ppm), (osr, ppm, est)
        # closed loop: compensating the stream with the frame's own
        # estimate restores an exact decode (40 ppm corrupts raw symbols
        # at SF7 — bin slips on top of the >=128 codeword aliasing
        # exceed Hamming's single-bit correction)
        fixed = receive(compensate_sro(drifted_iq, est))
        dec = np.asarray(modem.decode(np.asarray(fixed.symbols)[0]))
        np.testing.assert_array_equal(dec, payload, err_msg=f"{osr},{ppm}")


def test_cross_sf_collision_both_decode():
    """Two frames transmitted SIMULTANEOUSLY at different SFs (7 and 9,
    equal power, fully overlapping in time): blind receive decodes both
    without any cancellation — cross-SF chirps are quasi-orthogonal, so
    each SF's dechirp spreads the other frame into the noise floor. The
    same-SF case needs SIC (tests/test_sic.py); the cross-SF case is
    free."""
    rng = np.random.RandomState(21)
    pl7 = rng.randint(0, 256, 4).astype(np.uint8)
    pl9 = rng.randint(0, 256, 4).astype(np.uint8)
    f7 = _frame(LoraParams(sf=7), pl7)
    f9 = _frame(LoraParams(sf=9), pl9)
    off9 = 2 * 512
    off7 = off9 + 3 * 512                       # inside the SF9 frame
    total = max(off7 + f7.size, off9 + f9.size) + 14 * 512
    s = np.zeros(total, np.complex64)           # additive: true collision
    s[off7: off7 + f7.size] += f7
    s[off9: off9 + f9.size] += f9
    # the SF7 frame sits entirely inside the SF9 frame's span
    assert off9 < off7 and off7 + f7.size < off9 + f9.size

    re, im = planar.split_complex(s)
    res = sync.receive_blind_planar(re, im, LoraParams(sf=7),
                                    n_payload_symbols=8, sfs=(7, 8, 9, 10))
    rows = sync.blind_frames(res)
    assert sorted(r["sf"] for r in rows) == [7, 9]
    by_sf = {r["sf"]: r for r in rows}
    assert by_sf[7]["start"] == off7 and by_sf[9]["start"] == off9
    np.testing.assert_array_equal(
        np.asarray(modem.decode(by_sf[7]["symbols"])), pl7)
    np.testing.assert_array_equal(
        np.asarray(modem.decode(by_sf[9]["symbols"])), pl9)


def test_cad_activity_gate():
    """cad_planar: the SX126x-style listen primitive. Chirps anywhere in
    the probed windows fire it (any CFO); silence and sub-threshold noise
    do not. Batched over leading dims."""
    p = LoraParams(sf=7)
    rng = np.random.RandomState(22)
    payload = rng.randint(0, 256, 4).astype(np.uint8)
    frame = _frame(p, payload)
    total = frame.size + 12 * p.step

    silent = np.zeros(total, np.complex64)
    noise = (0.005 * (rng.randn(total) + 1j * rng.randn(total))
             ).astype(np.complex64)
    active = _place([(frame, 5 * p.step)], total)
    cfo_active = _place(
        [(np.asarray(apply_cfo_continuous(frame, 3.7, p.n, p.osr)),
          5 * p.step)], total)

    batch = np.stack([silent, noise, active, cfo_active])
    re, im = planar.split_complex(batch)
    act, peak_db = sync.cad_planar(re, im, p)
    assert np.asarray(act).tolist() == [False, False, True, True]
    assert float(np.asarray(peak_db)[2]) > -1.0       # full-scale chirp ~ 0 dB


@pytest.mark.parametrize("off_in_window", [64, 192 + 64])
def test_receive_block_degenerate_half_window_offset(off_in_window):
    """A frame landing at exactly step/2 modulo the block's window grid
    hits the two-sided split's sign ambiguity; the SFD probe inside
    receive_block_planar resolves it to the exact start (it used to come
    out one symbol early and demodulate garbage)."""
    p = LoraParams(sf=7)
    rng = np.random.RandomState(23)
    pl = rng.randint(0, 256, 6).astype(np.uint8)
    iq = _frame(p, pl)
    off = 2 * p.step + off_in_window
    s = _place([(iq, off)], off + iq.size + 4 * p.step)
    re, im = planar.split_complex(s)
    blk = sync.receive_block_planar(re, im, p, pl.size * 2)
    found = np.flatnonzero(np.asarray(blk.found))
    assert found.size == 1
    k = int(found[0])
    assert int(np.asarray(blk.start)[k]) == off
    np.testing.assert_array_equal(
        np.asarray(modem.decode(np.asarray(blk.symbols)[k])), pl)


def test_degenerate_offset_sync_survives_noise():
    """The tau=+/-step/2 probe is asymmetric (up-window 9 + down-window
    10), so noise cannot coin-flip a correct start one symbol late (a
    single SFD-window probe would tie at the true start: windows 10 and
    11 are both downchirps)."""
    from lora_phy_tpu.ops.impair import apply_awgn
    import jax

    p = LoraParams(sf=7)
    rng = np.random.RandomState(30)
    pl = rng.randint(0, 256, 6).astype(np.uint8)
    iq = _frame(p, pl)
    for trial in range(6):
        off = 3 * p.step + (64 if trial % 2 == 0 else 0)   # degenerate/not
        s = _place([(iq, off)], off + iq.size + 4 * p.step)
        y = np.asarray(apply_awgn(jax.random.PRNGKey(600 + trial), s, 15.0))
        re, im = planar.split_complex(y)
        blk = sync.receive_block_planar(re, im, p, pl.size * 2,
                                        min_power_db=-30.0)
        rows = sync.block_rows(blk)
        assert rows and rows[0]["start"] == off, (trial, rows)
        np.testing.assert_array_equal(
            np.asarray(modem.decode(rows[0]["symbols"])), pl)


def test_sync_skips_unrescued_negative_start_candidate():
    """A frame whose true start precedes the buffer (cut mid-preamble at
    the degenerate half-window phase) must not mask a later full frame:
    frame_sync skips the negative-start candidate and finds the real one."""
    p = LoraParams(sf=7)
    rng = np.random.RandomState(31)
    pl = rng.randint(0, 256, 4).astype(np.uint8)
    head = _frame(p, rng.randint(0, 256, 4).astype(np.uint8))[64:]
    good = _frame(p, pl)
    off_good = head.size + 5 * p.step
    s = _place([(head, 0), (good, off_good)],
               off_good + good.size + 4 * p.step)
    res = stream.frame_sync(s, p)
    assert res.found
    assert res.start >= 0
    out, _ = stream.frame_demodulate(s[res.start:], p, pl.size * 2)
    assert out is not None


def test_cad_short_buffers_no_crash():
    """cad_planar handles buffers shorter than its stride (down to
    sub-symbol, where there is nothing to listen to)."""
    p = LoraParams(sf=7)
    frame = _frame(p, np.arange(4, dtype=np.uint8))
    for t in (p.step // 2, p.step, 2 * p.step, 3 * p.step):
        silent = np.zeros(t, np.complex64)
        act, _ = sync.cad_planar(*planar.split_complex(silent), p)
        assert not bool(np.asarray(act))
        if t >= p.step:
            act, _ = sync.cad_planar(*planar.split_complex(frame[:t]), p)
            assert bool(np.asarray(act))


@pytest.mark.parametrize("sf", [11, 12])
def test_receive_block_high_sf_four_step_path(sf):
    """The rewritten extraction (row gather + barrel shift + static-slice
    probes) at N=2048/4096, where the DFT and the probes ride the
    four-step factorisation; off-grid start exercises the barrel."""
    p = LoraParams(sf=sf)
    rng = np.random.RandomState(24)
    pl = rng.randint(0, 256, 3).astype(np.uint8)
    iq = _frame(p, pl)
    off = p.step + 777                       # arbitrary sub-window phase
    s = _place([(iq, off)], off + iq.size + 5 * p.step)
    re, im = planar.split_complex(s)
    blk = sync.receive_block_planar(re, im, p, pl.size * 2, max_frames=2)
    rows = sync.block_rows(blk)
    assert len(rows) == 1 and rows[0]["start"] == off
    assert rows[0]["sync"] == p.sync_word
    np.testing.assert_array_equal(
        np.asarray(modem.decode(rows[0]["symbols"])), pl)


def test_robust_mode_clean_parity():
    """pre_acc=3 matches the default receiver exactly on a clean frame
    (same start, same symbols, same sync)."""
    p = LoraParams(sf=7)
    rng = np.random.RandomState(25)
    pl = rng.randint(0, 256, 8).astype(np.uint8)
    iq = _frame(p, pl)
    s = _place([(iq, 3 * p.step + 50)], iq.size + 8 * p.step)
    re, im = planar.split_complex(s)
    r1 = sync.block_rows(sync.receive_block_planar(
        re, im, p, 16, min_power_db=-30.0))
    r3 = sync.block_rows(sync.receive_block_planar(
        re, im, p, 16, min_power_db=-30.0, pre_acc=3))
    assert len(r1) == len(r3) == 1
    assert r3[0]["start"] == r1[0]["start"] == 3 * p.step + 50
    np.testing.assert_array_equal(r3[0]["symbols"], r1[0]["symbols"])
    assert r3[0]["sync"] == r1[0]["sync"] == p.sync_word


def test_robust_mode_decodes_two_ray_channel():
    """The near-equal-power two-ray channel that defeats the default
    receiver (per-window argmax alternation — docs/SEMANTICS.md): the
    robust mode (accumulated-spectrum sync, common-bin CFO, noncoherent
    path combining) decodes the large majority where plain decodes
    almost nothing."""
    import jax
    from lora_phy_tpu.ops.impair import apply_awgn, apply_multipath

    p = LoraParams(sf=7)
    rng = np.random.RandomState(26)
    pl = rng.randint(0, 256, 8).astype(np.uint8)
    iq = _frame(p, pl)
    s = np.zeros(3 * p.step + iq.size + 4 * p.step, np.complex64)
    s[3 * p.step: 3 * p.step + iq.size] = iq
    taps = np.array([1.0, 0, 0, 0.95 * np.exp(2.0j)], np.complex64)

    got = {1: 0, 3: 0}
    trials = 15
    for t in range(trials):
        y = apply_multipath(s, taps)
        y = np.asarray(apply_awgn(jax.random.PRNGKey(4000 + t), y, 5.0))
        re, im = planar.split_complex(y)
        for acc in (1, 3):
            for r in sync.block_rows(sync.receive_block_planar(
                    re, im, p, 16, min_power_db=-30.0, pre_acc=acc)):
                if (abs(r["start"] - 3 * p.step) <= p.step
                        and np.array_equal(
                            np.asarray(modem.decode(r["symbols"])), pl)):
                    got[acc] += 1
                    break
    assert got[3] >= 11, got     # robust recovers the large majority
    assert got[1] <= 4, got      # the default receiver cannot


def test_robust_mode_rejects_loud_noise():
    """Accumulated sums correlate across windows (overlapping summands),
    so loud noise forms long equal-bin runs — the concentration gate must
    reject them."""
    import jax
    from lora_phy_tpu.ops.impair import apply_awgn

    p = LoraParams(sf=7)
    noise = np.asarray(apply_awgn(
        jax.random.PRNGKey(99), np.zeros(20000, np.complex64), 0.0))
    re, im = planar.split_complex(noise)
    blk = sync.receive_block_planar(re, im, p, 16, min_power_db=-30.0,
                                    pre_acc=3)
    assert sync.block_rows(blk) == []


def test_robust_mode_composes_with_sic_and_wideband():
    """pre_acc=3 plumbs through the SIC and wideband receivers (clean
    signals: parity with their default-mode answers)."""
    from lora_phy_tpu.models import sic
    from lora_phy_tpu.ops.channelizer import synthesize_channels_planar

    p = LoraParams(sf=7)
    rng = np.random.RandomState(27)
    pay_a = rng.randint(0, 256, 4).astype(np.uint8)
    pay_b = rng.randint(0, 256, 4).astype(np.uint8)
    fa = _frame(p, pay_a)
    fb = 0.3 * _frame(p, pay_b)
    s = np.zeros(2 * p.step + fb.size + 5 * p.step + fb.size, np.complex64)
    s[2 * p.step: 2 * p.step + fa.size] += fa
    s[7 * p.step: 7 * p.step + fb.size] += fb
    re, im = planar.split_complex(s)
    frames, _ = sic.receive_sic_planar(re, im, p, 8, pre_acc=3)
    assert [f["start"] for f in frames] == [2 * p.step, 7 * p.step]
    for f, pay in zip(frames, (pay_a, pay_b)):
        np.testing.assert_array_equal(
            np.asarray(modem.decode(f["symbols"])), pay)

    k = 4
    chans = np.zeros((k, fa.size + 4000), np.complex64)
    chans[1, 700: 700 + fa.size] = fa
    wr, wi = synthesize_channels_planar(
        chans.real.astype(np.float32), chans.imag.astype(np.float32), k,
        taps_per_branch=15)
    blk = sync.receive_wideband_planar(
        np.asarray(wr), np.asarray(wi), k, p, 8, taps_per_branch=15,
        min_power_db=-15.0, pre_acc=3)
    found = np.asarray(blk.found)
    assert found[1].any() and not found[[0, 2, 3]].any()
    kk = int(np.flatnonzero(found[1])[0])
    assert int(np.asarray(blk.start)[1, kk]) == 700
    np.testing.assert_array_equal(
        np.asarray(modem.decode(np.asarray(blk.symbols)[1, kk])), pay_a)


@pytest.mark.parametrize("sf", range(7, 13))
@pytest.mark.parametrize("osr", [2, 4])
def test_reference_fold_osr_block_receive(sf, osr):
    """continuous_chirp=False (the reference's default one-sample-early
    fold, ChirpGenerator.hpp:30-48) at osr>1 round-trips through
    receive_block_planar at ARBITRARY arrival offsets — including the
    half-bin worst case (arrival = osr/2 mod osr), where the dechirped
    tones sit exactly between bins and the scan's start is quantized to
    the osr lattice. Covers: fold-aware decimation phase (scan + demod),
    the +-1-bin tolerant preamble run at osr>1, and the two-sided
    sub-osr timing refinement (docs/SEMANTICS.md §TX fold)."""
    p = LoraParams(sf=sf, osr=osr, continuous_chirp=False)
    rng = np.random.RandomState(100 * sf + osr)
    pay = rng.randint(0, 256, 6).astype(np.uint8)
    syms = modem.encode(pay)
    fr, fi = stream.frame_modulate_planar(syms, p)
    fr, fi = np.asarray(fr), np.asarray(fi)
    L = fr.shape[-1]
    # one mid-window aligned arrival and the half-bin worst case
    for off in (p.step // 2 + p.osr, p.step // 3 + osr // 2):
        re = np.zeros(off + L + 5 * p.step, np.float32)
        im = np.zeros_like(re)
        re[off:off + L] = fr
        im[off:off + L] = fi
        blk = sync.receive_block_planar(re[None], im[None], p,
                                        int(syms.shape[-1]), max_frames=1)
        assert bool(np.asarray(blk.found)[0, 0]), off
        assert abs(int(np.asarray(blk.start)[0, 0]) - off) <= 1, off
        dec = np.asarray(modem.decode(np.asarray(blk.symbols)[0, 0]))
        np.testing.assert_array_equal(dec, pay, err_msg=f"off={off}")


def test_circular_extraction_matches_barrel_path(monkeypatch):
    """The shift-free circular fast path and the general barrel-shift
    path are twins: on the same noisy CFO'd frames at arbitrary arrival
    offsets they must produce identical discrete outputs (found, start,
    sync, symbols) and matching estimates (cfo/snr/sro to float
    tolerance — complex DFT values differ by per-frame constant phases,
    so floats agree to rounding, docs/SEMANTICS.md)."""
    p = LoraParams(sf=7)
    rng = np.random.RandomState(17)
    pay = rng.randint(0, 256, 10).astype(np.uint8)
    syms = modem.encode(pay)
    fr, fi = stream.frame_modulate_planar(syms, p)
    fr, fi = np.asarray(fr), np.asarray(fi)
    L = fr.shape[-1]
    re = np.zeros((3, 700 + L + 5 * p.step), np.float32)
    im = np.zeros_like(re)
    for ch, off in enumerate((0, 333, 97)):
        re[ch, off:off + L] = fr
        im[ch, off:off + L] = fi
    # CFO + noise (same realization for both paths)
    cfo = 3.7
    ph = 2 * np.pi * cfo / p.n * np.arange(re.shape[-1])
    c, s = np.cos(ph, dtype=np.float32), np.sin(ph, dtype=np.float32)
    re, im = re * c - im * s, re * s + im * c
    re = re + rng.normal(0, 0.02, re.shape).astype(np.float32)
    im = im + rng.normal(0, 0.02, im.shape).astype(np.float32)

    fast = sync.receive_block_planar(re, im, p, int(syms.shape[-1]),
                                     max_frames=2, min_power_db=-30.0)
    fast = type(fast)(*(np.asarray(f) for f in fast))
    # the dispatch happens at trace time: drop the cached trace so the
    # monkeypatched gate actually routes the second call to the barrel
    monkeypatch.setattr(sync, "_circ_wrap_const", lambda _p: (1.0, False))
    sync.receive_block_planar.clear_cache()
    try:
        slow = sync.receive_block_planar(re, im, p, int(syms.shape[-1]),
                                         max_frames=2, min_power_db=-30.0)
        slow = type(slow)(*(np.asarray(f) for f in slow))
    finally:
        # drop the barrel-path trace once the patch reverts, or later
        # tests with the same static signature silently reuse it and the
        # shipped circular fast path loses their coverage
        sync.receive_block_planar.clear_cache()
    np.testing.assert_array_equal(np.asarray(fast.found),
                                  np.asarray(slow.found))
    f0 = np.asarray(fast.found)
    assert f0[:, 0].all()          # one frame per channel actually found
    # not-found lanes carry unspecified garbage on both paths; compare
    # the found frames' discrete outputs exactly
    np.testing.assert_array_equal(np.asarray(fast.start)[f0],
                                  np.asarray(slow.start)[f0])
    np.testing.assert_array_equal(np.asarray(fast.sync)[f0],
                                  np.asarray(slow.sync)[f0])
    np.testing.assert_array_equal(np.asarray(fast.symbols)[f0],
                                  np.asarray(slow.symbols)[f0])
    np.testing.assert_allclose(np.asarray(fast.cfo)[f0],
                               np.asarray(slow.cfo)[f0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(fast.snr_db)[f0],
                               np.asarray(slow.snr_db)[f0], atol=0.1)
    np.testing.assert_allclose(np.asarray(fast.sro_ppm)[f0],
                               np.asarray(slow.sro_ppm)[f0], atol=0.5)


@pytest.mark.parametrize("osr", [1, 2])
def test_block_receive_with_spectra_decision_consistent(osr):
    """``with_spectra=True`` returns payload spectra in TRUE bin order on
    both extraction paths (circular osr=1, barrel osr=2): the spectra's
    argmax equals the reported symbols, and the BlockFrames outputs are
    identical to the decision-only call."""
    import dataclasses

    p = dataclasses.replace(LoraParams(sf=7), osr=osr)
    rng = np.random.RandomState(9)
    payload = rng.randint(0, 256, 5).astype(np.uint8)
    syms = modem.encode(payload)
    n_pay = syms.shape[-1]
    fr, fi = stream.frame_modulate_planar(np.asarray(syms, np.int32), p)
    total = 8192 * osr
    off = 517 * osr                     # non-grid arrival: q != 0
    xr = np.zeros(total, np.float32)
    xi = np.zeros(total, np.float32)
    xr[off: off + fr.shape[-1]] = np.asarray(fr)
    xi[off: off + fi.shape[-1]] = np.asarray(fi)
    xr += rng.randn(total).astype(np.float32) * 0.05
    xi += rng.randn(total).astype(np.float32) * 0.05

    blk, spec = sync.receive_block_planar(xr, xi, p, n_pay, max_frames=2,
                                          with_spectra=True)
    plain = sync.receive_block_planar(xr, xi, p, n_pay, max_frames=2)
    np.testing.assert_array_equal(np.asarray(blk.found),
                                  np.asarray(plain.found))
    np.testing.assert_array_equal(np.asarray(blk.symbols),
                                  np.asarray(plain.symbols))
    k = int(np.flatnonzero(np.asarray(blk.found))[0])
    assert int(np.asarray(blk.start)[k]) == off
    sp = np.asarray(spec)[k]
    assert sp.shape == (n_pay, p.n)
    np.testing.assert_array_equal(np.argmax(sp, axis=-1),
                                  np.asarray(blk.symbols)[k])
    np.testing.assert_array_equal(
        np.asarray(modem.decode(np.asarray(blk.symbols)[k])), payload)
