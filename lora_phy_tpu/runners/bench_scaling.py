"""Scaling-efficiency harness for the sharded streaming demodulator.

The BASELINE north star asks for IQ-samples/s scaling efficiency measured
at 1 chip, 1 host, and N>=2 hosts (>= 90%). This harness runs the planar
time/channel-sharded streaming demod (parallel/stream.py) over growing
device counts and reports, per device count:

* wall time + aggregate samples/s for the FULL sharded program,
* the same program with every cross-shard collective stubbed
  (``demodulate_stream_planar(..., comm=False)``) — the difference is
  the measured **collective cost** of the mesh program,
* efficiency vs the 1-device run (strong: fixed global work; weak:
  fixed per-device work).

    python -m lora_phy_tpu.runners.bench_scaling --mode=weak \
        --devices=1,2,4,8 [--sf=7] [--frames=32] [--out=PATH]

On a real pod slice the same command measures ICI/DCN scaling (initialize
multi-host first via parallel.multihost). On this single-chip image it
runs on the virtual CPU mesh (tests pin CPU; the conftest sets
--xla_force_host_platform_device_count). **Virtual CPU devices share the
host's physical cores** (4 on this image), and XLA-CPU already gives one
device the whole intra-op thread pool — so wall-clock efficiency on the
virtual mesh is bounded by core count, NOT by the mesh program, and is
not a hardware claim. The transferable number from the virtual mesh is
the collective fraction: compute parallelizes on real chips, while the
collective pattern (2x ppermute halo + 3x psum/pmax per step) is what
the mesh program itself adds. Both are reported separately so the
artifact is interpretable without a caveat paragraph.
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

from ..models import modem
from ..ops import planar
from ..parallel import mesh as meshlib
from ..parallel.stream import demodulate_stream_planar
from ..utils.params import LoraParams
from ._cli import parse_flags


def _time_pair(fn_a, fn_b, iters: int, repeats: int = 3):
    """Best-of-``repeats`` per-call time for two program variants, with
    the batches INTERLEAVED (a, b, a, b, ...) so scheduler/turbo drift on
    an oversubscribed host hits both variants alike — the pair is
    differenced downstream (collective cost), so correlated noise matters
    more than absolute noise."""
    besties = []
    for fn in (fn_a, fn_b):
        out = fn()
        np.asarray(out[0][0, :2])       # compile + completion barrier
        besties.append(float("inf"))
    for _ in range(repeats):
        for j, fn in enumerate((fn_a, fn_b)):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            np.asarray(out[0][0, :2])
            besties[j] = min(besties[j], (time.perf_counter() - t0) / iters)
    return besties[0], besties[1]


def measure(n_devices: int, params: LoraParams, payload_len: int,
            frames_per_device: int, mode: str, channels: int,
            iters: int = 4) -> dict:
    """One mesh point: build a (channel x time) mesh over ``n_devices``,
    run the planar sharded streaming demod with and without collectives,
    and verify the full run's decoded payloads bit-exactly."""
    import jax

    devices = jax.devices()[:n_devices]
    n_time = 2 if n_devices % 2 == 0 else 1
    n_channel = n_devices // n_time
    m = meshlib.make_mesh(n_channel=n_channel, n_time=n_time, devices=devices)

    if mode == "weak":
        channels = n_channel
        frames_per_channel = frames_per_device * n_time
    else:                               # strong: fixed global work
        frames_per_channel = frames_per_device

    rng = np.random.RandomState(0)
    payloads = rng.randint(
        0, 256, (channels * frames_per_channel, payload_len)
    ).astype(np.uint8)
    syms = modem.encode(payloads)
    re, im = planar.modulate_planar(np.asarray(syms, np.int32), params)
    dr, di = planar.dechirp_planar(re, im, params)
    dr = np.asarray(dr).reshape(channels, -1)
    di = np.asarray(di).reshape(channels, -1)
    sh = meshlib.stream_sharding(m)
    xr = jax.device_put(dr, sh)
    xi = jax.device_put(di, sh)

    t_full, t_nocomm = _time_pair(
        lambda: demodulate_stream_planar(xr, xi, params, m),
        lambda: demodulate_stream_planar(xr, xi, params, m, comm=False),
        iters)

    # correctness of the timed program (full path only; comm=False is a
    # measurement stub, wrong at seams by design)
    out_syms, sync, _, _ = demodulate_stream_planar(xr, xi, params, m)
    # each frame is 2 sync symbols + the encoded payload symbols
    got = np.asarray(out_syms).reshape(-1, syms.shape[-1] + 2)
    assert np.array_equal(
        np.asarray(modem.decode(got[:, 2:])), payloads
    ), "sharded demod decode mismatch"

    total = dr.size
    return {
        "devices": n_devices,
        "mesh": f"{n_channel}x{n_time}",
        "mode": mode,
        "global_samples": int(total),
        "samples_per_device": int(total // n_devices),
        "t_full_ms": round(t_full * 1e3, 3),
        "t_nocomm_ms": round(t_nocomm * 1e3, 3),
        "collective_ms": round((t_full - t_nocomm) * 1e3, 3),
        "collective_frac": round(max(0.0, 1.0 - t_nocomm / t_full), 4),
        "samples_per_s": total / t_full,
    }


def main(argv=None) -> int:
    import jax

    flags = parse_flags(sys.argv[1:] if argv is None else argv, {
        "devices": (str, "1,2,4,8"),
        "sf": (int, 7),
        "payload-bytes": (int, 32),
        "frames": (int, 32),
        "mode": (str, "weak"),
        "iters": (int, 4),
        "out": (str, "-"),
    })
    if flags["mode"] not in ("weak", "strong"):
        print("--mode must be weak or strong", file=sys.stderr)
        return 1
    params = LoraParams(sf=flags["sf"])
    counts = [int(x) for x in flags["devices"].split(",") if x]
    avail = len(jax.devices())
    counts = [c for c in counts if c <= avail]
    platform = jax.default_backend()
    # strong mode shards ONE fixed global array over every mesh: channels
    # must divide by every n_channel (= N odd, N/2 even) — lcm, not
    # max//2, or non-power-of-two sweeps (e.g. --devices=4,6) fail to
    # shard in device_put mid-sweep
    if flags["mode"] == "strong":
        n_chans = [c // 2 if c % 2 == 0 else c for c in counts]
        channels = math.lcm(*n_chans) if n_chans else 1
    else:
        channels = 0

    rows = []
    base = None
    for c in counts:
        row = measure(c, params, flags["payload-bytes"], flags["frames"],
                      flags["mode"], channels, flags["iters"])
        if base is None:
            base = row
        if flags["mode"] == "weak":
            # constant per-device work: ideal is flat per-device time
            row["efficiency"] = round(base["t_full_ms"] / row["t_full_ms"], 4)
        else:
            # anchor the first measured row at 1.0 (like weak mode) so a
            # sweep not starting at 1 device still self-normalizes
            row["efficiency"] = round(
                (row["samples_per_s"] / base["samples_per_s"])
                / (c / base["devices"]), 4)
        rows.append(row)
        print(
            f"devices={c} mesh={row['mesh']}: {row['t_full_ms']:.1f} ms "
            f"({row['samples_per_s']/1e6:.1f} Msamples/s aggregate), "
            f"collectives {row['collective_ms']:.2f} ms "
            f"({row['collective_frac']*100:.1f}%), "
            f"efficiency={row['efficiency']*100:.0f}%",
            file=sys.stderr,
        )

    import os

    doc = {
        "mode": flags["mode"],
        "platform": platform,
        "host_cores": os.cpu_count(),
        "virtual_mesh": platform == "cpu",
        "interpretation": (
            "collective_frac is the mesh program's own communication cost "
            "and transfers to real hardware; wall-clock efficiency on a "
            "virtual CPU mesh is bounded by host_cores shared across all "
            "virtual devices and is NOT a hardware claim"
            if platform == "cpu" else
            "hardware run: efficiency is the scaling claim"
        ),
        "rows": rows,
    }
    text = json.dumps(doc, indent=1)
    if flags["out"] in ("", "-"):
        print(text)
    else:
        with open(flags["out"], "w") as f:
            f.write(text + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
