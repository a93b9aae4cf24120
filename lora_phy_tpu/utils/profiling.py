"""Tracing / roofline accounting.

The reference's observability is rdtsc cycle counting around the packet
loop (reference: tests/performance_test.cpp:103-133). The TPU equivalents
here (SURVEY.md §5.1):

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-readable trace directory;
* :func:`demod_roofline` — analytic FLOP/byte accounting for the
  dechirp-detection pipeline, reporting the compute- and bandwidth-bound
  time floors and the attained fraction for a measured runtime.
"""

from __future__ import annotations

import contextlib
import dataclasses

from .params import LoraParams


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lora_tpu_trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class Roofline:
    flops: float
    bytes: float
    t_compute_s: float
    t_memory_s: float
    bound: str

    def attained(self, measured_s: float) -> float:
        """Fraction of the speed-of-light floor achieved."""
        return max(self.t_compute_s, self.t_memory_s) / measured_s


# v5e single-chip peaks (public numbers)
V5E_F32_FLOPS = 4.9e13      # MXU fp32 (~1/4 of 197 TFLOPs bf16)
V5E_BF16_FLOPS = 1.97e14
V5E_HBM_BPS = 8.2e11        # ~820 GB/s


def demod_roofline(params: LoraParams, n_symbols: int,
                   peak_flops: float = V5E_F32_FLOPS,
                   peak_bw: float = V5E_HBM_BPS) -> Roofline:
    """Speed-of-light floors for demodulating ``n_symbols`` symbol windows.

    Counts the fused pipeline's intrinsic work: planar DFT as real matmuls
    (8*N per output point after splitting into <=128-wide stages), the
    derotation transcendentals, and the unavoidable HBM traffic (planar
    input in, one int per symbol out).
    """
    n = params.n
    if n <= 128:
        mm_flops = 8.0 * n * n          # 4 matmuls, 2 flops/MAC
    else:
        from ..ops.fft import _split

        n1, n2 = _split(n)              # the REAL four-step factorisation
        mm_flops = 8.0 * n * (n1 + n2)
    flops = n_symbols * (mm_flops + 10.0 * n)     # + derot/mag/argmax
    bytes_ = n_symbols * (n * 8.0 + 4.0)          # planar in + bin out
    t_c = flops / peak_flops
    t_m = bytes_ / peak_bw
    return Roofline(flops, bytes_, t_c, t_m,
                    "compute" if t_c > t_m else "memory")
