"""Worker process for the real multi-process distributed test
(tests/test_multihost.py). Each process owns half of the time axis of a
continuous stream, joins the jax.distributed runtime, builds the global
(channel, time) mesh spanning both processes, runs the planar streaming
demodulator (cross-process ppermute halos + psum broadcast), and checks
bit-parity against the locally-computed single-device reference.

Usage: python tests/_mh_worker.py <process_id> <num_processes> <coordinator>
"""

import os
import sys

proc_id, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=4"]
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lora_phy_tpu.models import modem  # noqa: E402
from lora_phy_tpu.ops import planar  # noqa: E402
from lora_phy_tpu.parallel import mesh as meshlib  # noqa: E402
from lora_phy_tpu.parallel import multihost  # noqa: E402
from lora_phy_tpu.parallel.stream import demodulate_stream_planar  # noqa: E402
from lora_phy_tpu.utils.params import LoraParams  # noqa: E402


def main() -> int:
    multihost.initialize(coordinator_address=coord, num_processes=nproc,
                         process_id=proc_id)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()
    assert jax.local_device_count() == 4

    p = LoraParams(sf=7)
    n_channels = 2
    rng = np.random.RandomState(7)  # same data in every process
    payloads = rng.randint(0, 256, (n_channels, 31)).astype(np.uint8)
    syms_tx = modem.encode(payloads)
    re, im = planar.modulate_planar(syms_tx, p)
    dr, di = planar.dechirp_planar(re, im, p)
    dr, di = np.asarray(dr), np.asarray(di)

    # global mesh across both processes; the time axis spans processes so
    # the halo ppermute and the estimate psum cross the process boundary
    m = meshlib.make_mesh(n_channel=1, n_time=4 * nproc)

    t_total = dr.shape[-1]
    t_local = t_total // nproc
    sl = slice(proc_id * t_local, (proc_id + 1) * t_local)
    xr = multihost.global_stream_array(m, dr[:, sl])
    xi = multihost.global_stream_array(m, di[:, sl])
    assert xr.shape == (n_channels, t_total)

    out_syms, sync, cfo, to = demodulate_stream_planar(xr, xi, p, m)

    # single-device reference, computed locally from the full stream
    ref = modem.demodulate(
        (dr + 1j * di).astype(np.complex64), p
    )

    from jax.experimental import multihost_utils

    all_syms = np.asarray(multihost_utils.process_allgather(
        out_syms, tiled=True
    ))
    all_sync = np.asarray(multihost_utils.process_allgather(sync, tiled=True))
    np.testing.assert_array_equal(all_syms[:, 2:], np.asarray(ref.symbols))
    np.testing.assert_array_equal(all_sync, np.asarray(ref.sync_word))
    decoded = np.asarray(modem.decode(all_syms[:, 2:]))
    np.testing.assert_array_equal(decoded, payloads)

    print(f"PARITY OK process {proc_id}/{nproc}", flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
