"""Scaling-efficiency harness for the sharded streaming demodulator.

The BASELINE north star asks for IQ-samples/s scaling efficiency measured
at 1 chip, 1 host, and N>=2 hosts (>= 90%). This harness runs the
time/channel-sharded streaming demod (parallel/stream.py) over growing
device counts and reports throughput + efficiency vs linear scaling:

  python -m lora_phy_tpu.runners.bench_scaling --devices=1,2,4,8

On a real pod slice the same command measures ICI/DCN scaling (initialize
multi-host first via parallel.multihost). On this single-chip image it
runs on the virtual CPU mesh (set JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count) to validate the harness and the
collective path; CPU numbers are labelled as such and are NOT hardware
claims.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from ..models import modem
from ..parallel import mesh as meshlib
from ..parallel.multihost import scaling_report
from ..parallel.stream import demodulate_stream
from ..utils.params import LoraParams
from ._cli import parse_flags


def measure(n_devices: int, params: LoraParams, payload_len: int,
            frames_per_channel: int, iters: int = 4) -> float:
    """Samples/s for the sharded streaming demod on ``n_devices`` devices
    arranged (channel x time) as square as possible."""
    import jax

    devices = jax.devices()[:n_devices]
    n_time = 2 if n_devices % 2 == 0 else 1
    n_channel = n_devices // n_time
    m = meshlib.make_mesh(n_channel=n_channel, n_time=n_time, devices=devices)

    rng = np.random.RandomState(0)
    payloads = rng.randint(
        0, 256, (n_channel * frames_per_channel, payload_len)
    ).astype(np.uint8)
    syms = modem.encode(payloads)
    dech = np.asarray(modem.dechirp(modem.modulate(syms, params), params))
    # concatenate each channel's frames into one continuous stream
    stream = dech.reshape(n_channel, -1)
    sharded = __import__("jax").device_put(stream, meshlib.stream_sharding(m))

    out = demodulate_stream(sharded, params, m)
    np.asarray(out[0][0, :2])           # compile + completion barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = demodulate_stream(sharded, params, m)
        np.asarray(out[0][0, :2])
    dt = (time.perf_counter() - t0) / iters
    return stream.size / dt


def main(argv=None) -> int:
    import jax

    flags = parse_flags(sys.argv[1:] if argv is None else argv, {
        "devices": (str, "1,2,4,8"),
        "sf": (int, 7),
        "payload-bytes": (int, 32),
        "frames": (int, 32),
    })
    params = LoraParams(sf=flags["sf"])
    counts = [int(x) for x in flags["devices"].split(",") if x]
    avail = len(jax.devices())
    counts = [c for c in counts if c <= avail]
    platform = jax.default_backend()

    base = None
    rows = []
    for c in counts:
        sps = measure(c, params, flags["payload-bytes"], flags["frames"])
        if base is None:
            base = sps
        rep = scaling_report(base, sps, c)
        rep["platform"] = platform
        rows.append(rep)
        print(
            f"devices={c}: {sps/1e6:.1f} Msamples/s "
            f"efficiency={rep['efficiency']*100:.0f}%",
            file=sys.stderr,
        )
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
