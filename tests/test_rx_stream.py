"""Streaming RX CLI: native-ingest block receiver over files/stdin with
overlap carry, dedupe, and checkpoint/resume."""

import io
import sys

import numpy as np
import pytest

from lora_phy_tpu.models import modem, stream
from lora_phy_tpu.runners import rx_stream
from lora_phy_tpu.utils.params import LoraParams


def _make_stream(payloads, p, gaps):
    """Frames at increasing offsets separated by silence gaps; returns
    (complex stream, true start indices)."""
    parts, starts, pos = [], [], 0
    for pay, gap in zip(payloads, gaps):
        parts.append(np.zeros(gap, np.complex64))
        pos += gap
        syms = np.asarray(modem.encode(pay), np.int32)
        fr = np.asarray(stream.frame_modulate(syms, p))
        starts.append(pos)
        parts.append(fr)
        pos += fr.size
    parts.append(np.zeros(1500, np.complex64))
    return np.concatenate(parts), starts


def _interleave(x):
    out = np.empty(x.size * 2, np.float32)
    out[0::2] = x.real
    out[1::2] = x.imag
    return out.tobytes()


@pytest.fixture
def frames_fixture():
    p = LoraParams(sf=7)
    rng = np.random.RandomState(3)
    payloads = [rng.randint(0, 256, 16).astype(np.uint8) for _ in range(3)]
    sig, starts = _make_stream(payloads, p, gaps=[700, 900, 1100])
    return p, payloads, sig, starts


def test_rx_stream_file(tmp_path, capfd, frames_fixture):
    p, payloads, sig, starts = frames_fixture
    path = tmp_path / "s.iq"
    path.write_bytes(_interleave(sig))
    # small blocks force frames to span block boundaries
    rc = rx_stream.main([f"--in={path}", "--sf=7", "--payload-len=16",
                         "--block=8192"])
    out, err = capfd.readouterr()
    assert rc == 0
    lines = [l for l in out.splitlines() if l.startswith("frame @")]
    assert len(lines) == 3 and "3 frames" in err
    for line, pay, s in zip(lines, payloads, starts):
        assert f"@{s} " in line
        assert f"payload={pay.tobytes().hex()}" in line
        assert "sync=0x12" in line


def test_rx_stream_stdin_ci16(capfd, frames_fixture, monkeypatch):
    p, payloads, sig, starts = frames_fixture
    scaled = np.empty(sig.size * 2, np.int16)
    scaled[0::2] = np.round(sig.real * 32767).astype(np.int16)
    scaled[1::2] = np.round(sig.imag * 32767).astype(np.int16)
    class _Stdin:
        buffer = io.BytesIO(scaled.tobytes())

    monkeypatch.setattr(sys, "stdin", _Stdin())
    # int formats are normalized to [-1, 1] natively; scale is a further
    # multiplier (runtime/lora_runtime.cpp:36-44), so the default 1.0 is
    # right for full-scale captures
    rc = rx_stream.main(["--sf=7", "--payload-len=16", "--block=8192",
                         "--format=ci16"])
    out, _ = capfd.readouterr()
    assert rc == 0
    lines = [l for l in out.splitlines() if l.startswith("frame @")]
    assert len(lines) == 3
    for line, pay in zip(lines, payloads):
        assert f"payload={pay.tobytes().hex()}" in line


def test_rx_stream_checkpoint_resume(tmp_path, capfd, frames_fixture):
    p, payloads, sig, starts = frames_fixture
    raw = _interleave(sig)
    # split INSIDE the second frame so resume must carry it across runs
    split_sample = starts[1] + 400
    a, b = tmp_path / "a.iq", tmp_path / "b.iq"
    a.write_bytes(raw[: split_sample * 8])
    b.write_bytes(raw[split_sample * 8:])
    ck = tmp_path / "ck.npz"

    assert rx_stream.main([f"--in={a}", "--sf=7", "--payload-len=16",
                           "--block=8192", f"--checkpoint={ck}"]) == 0
    out1, _ = capfd.readouterr()
    assert rx_stream.main([f"--in={b}", "--sf=7", "--payload-len=16",
                           "--block=8192", f"--checkpoint={ck}"]) == 0
    out2, _ = capfd.readouterr()
    lines = [l for l in (out1 + out2).splitlines() if l.startswith("frame @")]
    assert len(lines) == 3                      # each frame exactly once
    got_starts = sorted(int(l.split()[1][1:]) for l in lines)
    assert got_starts == starts
    for line, pay in zip(lines, payloads):
        assert f"payload={pay.tobytes().hex()}" in line


def test_tx_stream_to_rx_stream_roundtrip(tmp_path, capfd):
    """lora-tx-stream output round-trips through lora-rx-stream,
    frame-for-frame, in both cf32 and ci8 wire formats."""
    from lora_phy_tpu.runners import tx_stream

    payloads = ["deadbeefcafef00d" * 2, "0102030405060708" * 2,
                "a5a5a5a5a5a5a5a5" * 2]
    plist = tmp_path / "p.txt"
    plist.write_text("\n".join(payloads) + "\n")

    for fmt in ("cf32", "ci8"):
        sfile = tmp_path / f"s_{fmt}.iq"
        rc = tx_stream.main([f"--payloads={plist}", f"--out={sfile}",
                             "--sf=7", "--gap=900", f"--format={fmt}"])
        _, err = capfd.readouterr()
        assert rc == 0 and "3 frames" in err
        rc = rx_stream.main([f"--in={sfile}", "--sf=7", "--payload-len=16",
                             "--block=16384", f"--format={fmt}"])
        out, _ = capfd.readouterr()
        lines = [l for l in out.splitlines() if l.startswith("frame @")]
        assert [l.split("payload=")[1] for l in lines] == payloads, fmt

    # bad hex is a clean usage error
    bad = tmp_path / "bad.txt"
    bad.write_text("zzzz\n")
    assert tx_stream.main([f"--payloads={bad}", f"--out={tmp_path/'x.iq'}"]) == 1


def test_rx_stream_wideband_channels(tmp_path, capfd):
    """--channels=K: wideband stream with two occupied sub-channels is
    channelized and both frames decode with channel indices and wideband
    sample positions."""
    from lora_phy_tpu.ops.channelizer import synthesize_channels_planar

    p = LoraParams(sf=7)
    k = 4
    rng = np.random.RandomState(9)
    pays = [rng.randint(0, 256, 16).astype(np.uint8) for _ in range(2)]
    frames = [np.asarray(stream.frame_modulate(
        np.asarray(modem.encode(pv), np.int32), p)) for pv in pays]
    L = max(f.size for f in frames) + 3000
    chans = np.zeros((k, L), np.complex64)
    chans[1, 600:600 + frames[0].size] = frames[0]
    chans[3, 1400:1400 + frames[1].size] = frames[1]
    wr, wi = synthesize_channels_planar(
        chans.real.astype(np.float32), chans.imag.astype(np.float32), k,
        taps_per_branch=15)
    wide = np.asarray(wr) + 1j * np.asarray(wi)
    path = tmp_path / "wb.iq"
    path.write_bytes(_interleave(wide))

    rc = rx_stream.main([f"--in={path}", "--sf=7", "--payload-len=16",
                         f"--channels={k}", "--block=65536"])
    out, err = capfd.readouterr()
    assert rc == 0 and "2 frames" in err
    lines = [l for l in out.splitlines() if l.startswith("frame ")]
    assert len(lines) == 2
    by_ch = {int(l.split("ch=")[1].split()[0]): l for l in lines}
    assert set(by_ch) == {1, 3}
    assert f"payload={pays[0].tobytes().hex()}" in by_ch[1]
    assert f"payload={pays[1].tobytes().hex()}" in by_ch[3]
    # wideband positions ~ channel offset * K (filter group delay = 0)
    assert abs(int(by_ch[1].split("@")[1].split()[0]) - 600 * k) <= k
    assert abs(int(by_ch[3].split("@")[1].split()[0]) - 1400 * k) <= k


def test_rx_stream_blind_sf(tmp_path, capfd):
    """--sf=auto: an SF7 and an SF9 frame in one stream are both decoded,
    each line tagged with its detected SF."""
    rng = np.random.RandomState(21)
    pls = {7: rng.randint(0, 256, 8).astype(np.uint8),
           9: rng.randint(0, 256, 8).astype(np.uint8)}
    parts, pos, starts = [], 0, {}
    for sf in (7, 9):
        p = LoraParams(sf=sf)
        gap = 5 * 128
        parts.append(np.zeros(gap, np.complex64))
        pos += gap
        fr = np.asarray(stream.frame_modulate(
            np.asarray(modem.encode(pls[sf]), np.int32), p))
        starts[sf] = pos
        parts.append(fr)
        pos += fr.size
    parts.append(np.zeros(4096, np.complex64))
    sig = np.concatenate(parts)
    path = tmp_path / "mix.iq"
    path.write_bytes(_interleave(sig))

    rc = rx_stream.main([f"--in={path}", "--sf=auto", "--payload-len=8",
                         "--quiet"])
    assert rc == 0
    out = capfd.readouterr().out.strip().splitlines()
    assert len(out) == 2
    got = {}
    for line in out:
        fields = dict(kv.split("=", 1) for kv in line.split()[1:]
                      if "=" in kv)
        at = int(line.split("@")[1].split()[0])
        got[int(fields["sf"])] = (at, fields["payload"])
    assert set(got) == {7, 9}
    for sf in (7, 9):
        assert got[sf][0] == starts[sf]
        assert got[sf][1] == pls[sf].tobytes().hex()


def test_rx_stream_sic_collision(tmp_path, capfd):
    """--sic: two overlapping same-SF frames (12 dB apart) both decode;
    the plain receiver on the same file loses the weak one."""
    p = LoraParams(sf=7)
    rng = np.random.RandomState(11)
    pay_a = rng.randint(0, 256, 8).astype(np.uint8)
    pay_b = rng.randint(0, 256, 8).astype(np.uint8)
    fa = np.asarray(stream.frame_modulate(np.asarray(modem.encode(pay_a)), p))
    fb = 0.25 * np.asarray(
        stream.frame_modulate(np.asarray(modem.encode(pay_b)), p))
    off_a, off_b = 2 * p.step, 2 * p.step + 5 * p.step
    sig = np.zeros(off_b + fb.size + 6 * p.step, np.complex64)
    sig[off_a: off_a + fa.size] += fa.astype(np.complex64)
    sig[off_b: off_b + fb.size] += fb.astype(np.complex64)
    path = tmp_path / "collision.iq"
    path.write_bytes(_interleave(sig))

    args = [f"--in={path}", "--sf=7", "--payload-len=8"]
    assert rx_stream.main(args) == 0
    plain, _ = capfd.readouterr()
    assert f"payload={pay_b.tobytes().hex()}" not in plain

    assert rx_stream.main(args + ["--sic"]) == 0
    out, err = capfd.readouterr()
    lines = [l for l in out.splitlines() if l.startswith("frame @")]
    assert len(lines) == 2 and "2 frames" in err
    assert f"@{off_a} " in lines[0] and "sic=0" in lines[0]
    assert f"payload={pay_a.tobytes().hex()}" in lines[0]
    assert f"@{off_b} " in lines[1] and "sic=1" in lines[1]
    assert f"payload={pay_b.tobytes().hex()}" in lines[1]


def test_rx_stream_sic_flag_conflicts(capfd):
    assert rx_stream.main(["--sic", "--sf=auto"]) == 1
    _, err = capfd.readouterr()
    assert "--sic requires" in err


def test_rx_stream_sic_wideband(tmp_path, capfd):
    """--sic composes with --channels: a same-SF collision INSIDE one
    sub-channel of a wideband stream — both frames decode with ch= tags
    and power-ordered sic= passes."""
    from lora_phy_tpu.ops.channelizer import synthesize_channels_planar

    p = LoraParams(sf=7)
    k = 4
    rng = np.random.RandomState(33)
    pay_a = rng.randint(0, 256, 6).astype(np.uint8)
    pay_b = rng.randint(0, 256, 6).astype(np.uint8)
    fa = np.asarray(stream.frame_modulate(
        np.asarray(modem.encode(pay_a), np.int32), p))
    fb = 0.25 * np.asarray(stream.frame_modulate(
        np.asarray(modem.encode(pay_b), np.int32), p))
    L = fa.size + 14 * p.step
    chans = np.zeros((k, L), np.complex64)
    chans[2, 2 * p.step: 2 * p.step + fa.size] += fa
    chans[2, 7 * p.step: 7 * p.step + fb.size] += fb.astype(np.complex64)
    wr, wi = synthesize_channels_planar(
        chans.real.astype(np.float32), chans.imag.astype(np.float32), k,
        taps_per_branch=15)
    path = tmp_path / "wbsic.iq"
    path.write_bytes(_interleave(np.asarray(wr) + 1j * np.asarray(wi)))

    rc = rx_stream.main([f"--in={path}", "--sf=7", "--payload-len=6",
                         f"--channels={k}", "--taps=15", "--sic",
                         "--thresh=-15", "--block=131072"])
    out, err = capfd.readouterr()
    assert rc == 0 and "2 frames" in err
    lines = [l for l in out.splitlines() if l.startswith("frame ")]
    assert len(lines) == 2 and all("ch=2" in l for l in lines)
    assert f"payload={pay_a.tobytes().hex()}" in lines[0]
    assert "sic=0" in lines[0]
    assert f"payload={pay_b.tobytes().hex()}" in lines[1]
    assert "sic=1" in lines[1]


def test_invert_iq_downlink_roundtrip(tmp_path, capfd):
    """--invert-iq on both sides round-trips (LoRaWAN downlink
    convention); a plain receiver never locks on inverted frames, and
    vice versa (uplink/downlink isolation)."""
    from lora_phy_tpu.runners import tx_stream

    pay = bytes(range(16)).hex()
    sfile = tmp_path / "down.iq"
    assert tx_stream.main([f"--payload={pay}", "--count=2", "--gap=900",
                           f"--out={sfile}", "--invert-iq"]) == 0
    capfd.readouterr()

    assert rx_stream.main([f"--in={sfile}", "--sf=7",
                           "--payload-len=16"]) == 0
    plain, _ = capfd.readouterr()
    assert "frame @" not in plain

    assert rx_stream.main([f"--in={sfile}", "--sf=7", "--payload-len=16",
                           "--invert-iq"]) == 0
    out, err = capfd.readouterr()
    lines = [l for l in out.splitlines() if l.startswith("frame @")]
    assert len(lines) == 2 and "2 frames" in err
    assert all(f"payload={pay}" in l for l in lines)


def test_rx_stream_cad_gate(tmp_path, capfd, frames_fixture):
    """--cad: same frames as the plain run, and the mostly-silent leading
    blocks are skipped by the activity gate."""
    p, payloads, sig, starts = frames_fixture
    sig = np.concatenate([np.zeros(40000, np.complex64), sig])
    path = tmp_path / "sparse.iq"
    path.write_bytes(_interleave(sig))
    args = [f"--in={path}", "--sf=7", "--payload-len=16", "--block=8192"]

    assert rx_stream.main(args) == 0
    plain, _ = capfd.readouterr()
    assert rx_stream.main(args + ["--cad"]) == 0
    gated, err = capfd.readouterr()

    # gated output == plain output (CAD must never cost a frame), all
    # payloads intact, and the leading silence was actually skipped
    frame_lines = [l for l in plain.splitlines() if l.startswith("frame @")]
    gated_lines = [l for l in gated.splitlines() if l.startswith("frame @")]
    assert gated_lines == frame_lines
    assert len(gated_lines) == 3
    for line, pay in zip(gated_lines, payloads):
        assert f"payload={pay.tobytes().hex()}" in line
    import re as _re
    m = _re.search(r"\((\d+) buffers CAD-skipped\)", err)
    assert m and int(m.group(1)) >= 2


def test_adaptive_gateway_mode(tmp_path, capfd):
    """tx --coded -> rx --adaptive: self-describing frames of different
    lengths in one stream, CRC-verified, across block seams; --soft path
    agrees; flag conflicts error."""
    from lora_phy_tpu.runners import tx_stream

    plist = tmp_path / "plist.txt"
    pays = ["deadbeef", "cafebabe001122334455667788", "0102"]
    plist.write_text("".join(h + "\n" for h in pays))
    sfile = tmp_path / "coded.iq"
    assert tx_stream.main([f"--payloads={plist}", "--coded", "--cr=2",
                           "--crc", "--gap=1200", f"--out={sfile}"]) == 0
    capfd.readouterr()

    # small blocks force frames to straddle the adaptive tail carry
    args = [f"--in={sfile}", "--sf=7", "--adaptive", "--block=4096"]
    assert rx_stream.main(args) == 0
    out, err = capfd.readouterr()
    lines = [l for l in out.splitlines() if l.startswith("frame @")]
    assert len(lines) == 3 and "3 frames" in err
    for line, hx in zip(lines, pays):
        assert f"len={len(hx) // 2}" in line
        assert "cr=4/6 crc=ok" in line
        assert f"payload={hx}" in line

    assert rx_stream.main(args + ["--soft"]) == 0
    soft_out, _ = capfd.readouterr()
    soft_lines = [l for l in soft_out.splitlines() if l.startswith("frame @")]
    assert len(soft_lines) == 3
    assert all("margin=" in l for l in soft_lines)

    assert rx_stream.main(["--adaptive", "--sic"]) == 1
    # bare --soft is now the plain-path Hamming84 ML mode (valid); the
    # invalid combos are --sic / --sf=auto
    assert rx_stream.main(["--soft", "--sic"]) == 1


def test_adaptive_checkpoint_resume(tmp_path, capfd):
    """--adaptive --checkpoint: a frame split across two invocations is
    decoded exactly once on resume, and the frame count carries over."""
    from lora_phy_tpu.runners import tx_stream
    from lora_phy_tpu.models.coded import CodedConfig

    plist = tmp_path / "p.txt"
    pays = ["aabbccdd", "00112233445566"]
    plist.write_text("".join(h + "\n" for h in pays))
    sfile = tmp_path / "c.iq"
    assert tx_stream.main([f"--payloads={plist}", "--coded", "--crc",
                           "--gap=1000", f"--out={sfile}"]) == 0
    capfd.readouterr()
    raw = sfile.read_bytes()
    # split inside the SECOND frame
    cut = (1000 + 6000 + 1000 + 800) * 8
    a, b = tmp_path / "a.iq", tmp_path / "b.iq"
    a.write_bytes(raw[:cut])
    b.write_bytes(raw[cut:])
    ck = tmp_path / "ck.npz"

    assert rx_stream.main([f"--in={a}", "--sf=7", "--adaptive",
                           f"--checkpoint={ck}"]) == 0
    out1, _ = capfd.readouterr()
    assert rx_stream.main([f"--in={b}", "--sf=7", "--adaptive",
                           f"--checkpoint={ck}"]) == 0
    out2, err2 = capfd.readouterr()
    lines = [l for l in (out1 + out2).splitlines()
             if l.startswith("frame @")]
    assert len(lines) == 2 and "2 frames" in err2
    for line, hx in zip(lines, pays):
        assert f"payload={hx}" in line and "crc=ok" in line


def test_tx_coded_validation(tmp_path, capfd):
    from lora_phy_tpu.runners import tx_stream

    big = "ab" * 256
    assert tx_stream.main([f"--payload={big}", "--coded",
                           f"--out={tmp_path/'x.iq'}"]) == 1
    assert tx_stream.main(["--payload=0102", "--coded", "--cr=5",
                           f"--out={tmp_path/'x.iq'}"]) == 1
    _, err = capfd.readouterr()
    assert "too long" in err and "--cr in 1..4" in err


def test_adaptive_gateway_under_cfo_and_noise(tmp_path, capfd):
    """Gateway mode survives a real channel: continuous fractional CFO
    (1.7 bins) + 15 dB AWGN on coded frames — both decode with crc=ok."""
    import jax
    from lora_phy_tpu.ops.impair import apply_awgn, apply_cfo_continuous
    from lora_phy_tpu.runners import tx_stream

    plist = tmp_path / "p.txt"
    pays = ["deadbeefcafe", "001122334455667788"]
    plist.write_text("".join(h + "\n" for h in pays))
    clean = tmp_path / "clean.iq"
    assert tx_stream.main([f"--payloads={plist}", "--coded", "--crc",
                           "--gap=1100", f"--out={clean}"]) == 0
    capfd.readouterr()

    raw = np.frombuffer(clean.read_bytes(), np.float32)
    sig = (raw[0::2] + 1j * raw[1::2]).astype(np.complex64)
    p = LoraParams(sf=7)
    y = apply_cfo_continuous(sig, 1.7, p.n, p.osr)
    y = np.asarray(apply_awgn(jax.random.PRNGKey(77), y, 15.0))
    path = tmp_path / "noisy.iq"
    path.write_bytes(_interleave(y))

    assert rx_stream.main([f"--in={path}", "--sf=7", "--adaptive"]) == 0
    out, err = capfd.readouterr()
    lines = [l for l in out.splitlines() if l.startswith("frame @")]
    assert len(lines) == 2 and "2 frames" in err
    for line, hx in zip(lines, pays):
        assert "crc=ok" in line and f"payload={hx}" in line
        assert "cfo_bins=2" in line     # 1.7 bins rounds to integer 2


def test_rx_stream_wideband_blind_sf_compose(tmp_path, capfd):
    """--channels=K composes with --sf=auto: an SF7 frame on one
    sub-channel and an SF8 frame on another, both found blind with the
    right sf= and ch= tags."""
    from lora_phy_tpu.ops.channelizer import synthesize_channels_planar

    k = 4
    rng = np.random.RandomState(17)
    pay7 = rng.randint(0, 256, 8).astype(np.uint8)
    pay8 = rng.randint(0, 256, 8).astype(np.uint8)
    f7 = np.asarray(stream.frame_modulate(
        np.asarray(modem.encode(pay7), np.int32), LoraParams(sf=7)))
    f8 = np.asarray(stream.frame_modulate(
        np.asarray(modem.encode(pay8), np.int32), LoraParams(sf=8)))
    L = max(f7.size, f8.size) + 16 * 256
    chans = np.zeros((k, L), np.complex64)
    chans[0, 500:500 + f7.size] = f7
    chans[2, 900:900 + f8.size] = f8
    wr, wi = synthesize_channels_planar(
        chans.real.astype(np.float32), chans.imag.astype(np.float32), k,
        taps_per_branch=15)
    wide = np.asarray(wr) + 1j * np.asarray(wi)
    path = tmp_path / "wbblind.iq"
    path.write_bytes(_interleave(wide))

    # --thresh=-15: the 15-branch-tap analysis bank leaves adjacent-
    # channel images near -20 dB; a real frame sits at 0 dB
    rc = rx_stream.main([f"--in={path}", "--sf=auto", "--payload-len=8",
                         f"--channels={k}", "--block=131072",
                         "--taps=15", "--thresh=-15"])
    out, err = capfd.readouterr()
    assert rc == 0 and "2 frames" in err
    lines = [l for l in out.splitlines() if l.startswith("frame ")]
    tags = {(l.split("sf=")[1].split()[0], l.split("ch=")[1].split()[0])
            for l in lines}
    assert tags == {("7", "0"), ("8", "2")}
    assert any(f"payload={pay7.tobytes().hex()}" in l for l in lines)
    assert any(f"payload={pay8.tobytes().hex()}" in l for l in lines)


def test_preamble_length_flag_roundtrip(tmp_path, capfd):
    """--preamble=N on both CLIs: long-preamble frames (12 upchirps, a
    common LoRaWAN beacon setting) round-trip in both plain and gateway
    modes."""
    from lora_phy_tpu.runners import tx_stream

    pay = "c0ffee00112233"
    for mode in ("plain", "coded"):
        sfile = tmp_path / f"lp_{mode}.iq"
        args = [f"--payload={pay}", "--preamble=12", "--gap=1000",
                f"--out={sfile}"]
        if mode == "coded":
            args += ["--coded", "--crc"]
        assert tx_stream.main(args) == 0
        capfd.readouterr()
        if mode == "coded":
            rx = [f"--in={sfile}", "--sf=7", "--adaptive", "--preamble=12"]
        else:
            rx = [f"--in={sfile}", "--sf=7", "--payload-len=7",
                  "--preamble=12"]
        assert rx_stream.main(rx) == 0
        out, err = capfd.readouterr()
        lines = [l for l in out.splitlines() if l.startswith("frame @")]
        assert len(lines) == 1 and f"payload={pay}" in lines[0], (mode, out)
        assert "@1000 " in lines[0]


def test_rx_stream_json_output(tmp_path, capfd, frames_fixture):
    """--json: one parseable JSON object per frame, both plain and
    adaptive modes."""
    import json as jsonlib
    from lora_phy_tpu.runners import tx_stream

    p, payloads, sig, starts = frames_fixture
    path = tmp_path / "s.iq"
    path.write_bytes(_interleave(sig))
    assert rx_stream.main([f"--in={path}", "--sf=7", "--payload-len=16",
                           "--json"]) == 0
    out, _ = capfd.readouterr()
    recs = [jsonlib.loads(l) for l in out.splitlines() if l.strip()]
    assert [r["start"] for r in recs] == starts
    assert [r["payload"] for r in recs] == [
        pay.tobytes().hex() for pay in payloads]
    assert all(r["sync"] == 0x12 and "snr_db" in r for r in recs)

    coded = tmp_path / "c.iq"
    assert tx_stream.main(["--payload=beef", "--coded", "--crc",
                           f"--out={coded}"]) == 0
    capfd.readouterr()
    assert rx_stream.main([f"--in={coded}", "--sf=7", "--adaptive",
                           "--json"]) == 0
    out, _ = capfd.readouterr()
    (rec,) = [jsonlib.loads(l) for l in out.splitlines() if l.strip()]
    assert rec["payload"] == "beef" and rec["crc"] == "ok"
    assert rec["len"] == 2 and rec["cr"] == "4/5"


def test_rx_stream_frontend_correct(tmp_path, capfd):
    """--frontend-correct: an IQ-imbalanced + DC-offset capture whose
    SIC-buried weak frame only decodes after blind correction."""
    from lora_phy_tpu.ops.impair import apply_frontend

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
    path = tmp_path / "fe.iq"
    path.write_bytes(_interleave(bad))
    args = [f"--in={path}", "--sf=7", "--payload-len=6", "--sic"]

    assert rx_stream.main(args) == 0
    raw_out, _ = capfd.readouterr()
    assert f"payload={pay_b.tobytes().hex()}" not in raw_out

    assert rx_stream.main(args + ["--frontend-correct"]) == 0
    out, _ = capfd.readouterr()
    assert f"payload={pay_a.tobytes().hex()}" in out
    assert f"payload={pay_b.tobytes().hex()}" in out


def test_adaptive_gateway_ldro(tmp_path, capfd):
    """--ldro on both sides: low-data-rate payloads (PPM = sf-2,
    bins << 2) round-trip in gateway mode; an rx without --ldro sees the
    header (LDRO never applies to it) but fails the payload CRC —
    exactly real LoRa, where LDRO is channel configuration."""
    from lora_phy_tpu.runners import tx_stream

    pay = "0badc0de51"
    sfile = tmp_path / "ldro.iq"
    assert tx_stream.main([f"--payload={pay}", "--coded", "--crc",
                           "--ldro", "--cr=2", f"--out={sfile}"]) == 0
    capfd.readouterr()

    assert rx_stream.main([f"--in={sfile}", "--sf=7", "--adaptive",
                           "--ldro"]) == 0
    out, err = capfd.readouterr()
    lines = [l for l in out.splitlines() if l.startswith("frame @")]
    assert len(lines) == 1 and "1 frames" in err
    assert f"payload={pay}" in lines[0] and "crc=ok" in lines[0]

    assert rx_stream.main([f"--in={sfile}", "--sf=7", "--adaptive"]) == 0
    out, _ = capfd.readouterr()
    assert f"payload={pay}" not in out


def test_rx_stream_mesh_mode(tmp_path, capfd, frames_fixture):
    """--mesh=T: the CLI's time-sharded path (MeshStreamDemodulator under
    the hood) finds and decodes the same frames as the single-device run,
    including across fed-block boundaries, and checkpoints/resumes."""
    p, payloads, sig, starts = frames_fixture
    path = tmp_path / "s.iq"
    path.write_bytes(_interleave(sig))

    rc = rx_stream.main([f"--in={path}", "--sf=7", "--payload-len=16",
                         "--mesh=4", "--block=16384", "--quiet"])
    assert rc == 0
    out = capfd.readouterr().out.strip().splitlines()
    assert len(out) == len(payloads)
    for line, pay, s0 in zip(out, payloads, starts):
        assert f"@{s0} " in line
        assert line.endswith(pay.tobytes().hex())

    # mutually exclusive with the single-channel-only modes
    assert rx_stream.main([f"--in={path}", "--sf=auto", "--mesh=2"]) == 1
    assert rx_stream.main([f"--in={path}", "--sf=7", "--mesh=2",
                           "--sic"]) == 1
    capfd.readouterr()

    # checkpoint/resume: split the stream at an arbitrary byte boundary,
    # resume from the saved mesh carry — same frames, exactly once
    ck = tmp_path / "mesh.ckpt"
    cut = (len(sig) // 3) * 8
    a, b = tmp_path / "a.iq", tmp_path / "b.iq"
    raw = _interleave(sig)
    a.write_bytes(raw[:cut])
    b.write_bytes(raw[cut:])
    assert rx_stream.main([f"--in={a}", "--sf=7", "--payload-len=16",
                           "--mesh=4", f"--checkpoint={ck}",
                           "--quiet"]) == 0
    assert rx_stream.main([f"--in={b}", "--sf=7", "--payload-len=16",
                           "--mesh=4", f"--checkpoint={ck}",
                           "--quiet"]) == 0
    out2 = capfd.readouterr().out.strip().splitlines()
    assert len(out2) == len(payloads)


def test_rx_stream_soft_block_mode(tmp_path, capfd, frames_fixture):
    """--soft on the plain block path: Hamming84 ML detection from the
    receiver's spectra — exact on clean frames, and composes with
    --mesh; still rejected with --sic / --sf=auto."""
    p, payloads, sig, starts = frames_fixture
    path = tmp_path / "s.iq"
    path.write_bytes(_interleave(sig))

    rc = rx_stream.main([f"--in={path}", "--sf=7", "--payload-len=16",
                         "--soft", "--quiet"])
    assert rc == 0
    out = capfd.readouterr().out.strip().splitlines()
    assert len(out) == len(payloads)
    for line, pay in zip(out, payloads):
        assert line.endswith(pay.tobytes().hex())

    rc = rx_stream.main([f"--in={path}", "--sf=7", "--payload-len=16",
                         "--soft", "--mesh=2", "--block=16384", "--quiet"])
    assert rc == 0
    out = capfd.readouterr().out.strip().splitlines()
    assert len(out) == len(payloads)
    for line, pay in zip(out, payloads):
        assert line.endswith(pay.tobytes().hex())

    assert rx_stream.main([f"--in={path}", "--sf=7", "--sic",
                           "--soft"]) == 1
    capfd.readouterr()

    # blind-SF + soft: the per-SF loop rides the same spectra branch
    rc = rx_stream.main([f"--in={path}", "--sf=auto", "--payload-len=16",
                         "--soft", "--quiet"])
    assert rc == 0
    out = capfd.readouterr().out.strip().splitlines()
    assert len(out) == len(payloads)
    for line, pay in zip(out, payloads):
        assert "sf=7" in line and line.endswith(pay.tobytes().hex())
