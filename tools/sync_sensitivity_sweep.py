"""Regenerate logs/sync_sensitivity_r4.csv: streaming-receiver sync +
decode rate vs SNR (the full path: scan through block demod — the
reference's AWGN tests assume frame-aligned buffers and never exercise
sync).

    python tools/sync_sensitivity_sweep.py [--trials=40] [--out=PATH]
           [--robust]

CSV: ``sf,snr_db,trials,synced,decoded``. ``--robust`` sweeps the
pre_acc=3 multipath-robust mode instead (expect ~1 dB worse AWGN-only
knees — the signature carries preamble noise; docs/SEMANTICS.md).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from lora_phy_tpu.models import modem, stream, sync  # noqa: E402
from lora_phy_tpu.ops import planar  # noqa: E402
from lora_phy_tpu.ops.impair import apply_awgn  # noqa: E402
from lora_phy_tpu.utils.params import LoraParams  # noqa: E402


def main(argv=None) -> int:
    args = sys.argv[1:] if argv is None else argv
    trials = 40
    out = "logs/sync_sensitivity_r4.csv"
    pre_acc = 1
    for a in args:
        if a.startswith("--trials="):
            trials = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a == "--robust":
            pre_acc = 3
        else:
            print(f"unknown flag {a}", file=sys.stderr)
            return 1

    rows = ["sf,snr_db,trials,synced,decoded"]
    for sf in (7, 9, 12):
        p = LoraParams(sf=sf)
        rng = np.random.RandomState(sf)
        pl = rng.randint(0, 256, 8).astype(np.uint8)
        iq = np.asarray(stream.frame_modulate(
            np.asarray(modem.encode(pl), np.int32), p))
        s = np.zeros(3 * p.step + iq.size + 4 * p.step, np.complex64)
        s[3 * p.step: 3 * p.step + iq.size] = iq
        for snr in (-3, -6, -9, -12, -15, -18):
            synced = decoded = 0
            for t in range(trials):
                y = np.asarray(apply_awgn(
                    jax.random.PRNGKey(sf * 10000 + t), s, float(snr)))
                re, im = planar.split_complex(y)
                blk = sync.receive_block_planar(
                    re, im, p, 16, min_power_db=-30.0, pre_acc=pre_acc)
                rr = [r for r in sync.block_rows(blk)
                      if abs(r["start"] - 3 * p.step) <= p.step]
                if rr:
                    synced += 1
                    if np.array_equal(
                            np.asarray(modem.decode(rr[0]["symbols"])), pl):
                        decoded += 1
            rows.append(f"{sf},{snr},{trials},{synced},{decoded}")
            print(rows[-1], file=sys.stderr, flush=True)
    pathlib.Path(out).write_text("\n".join(rows) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
