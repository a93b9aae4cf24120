"""FFT backends for the dechirp-detection path.

The reference carries a statically-planned KISS FFT fork
(reference: include/lora_phy/kissfft.hh:43-319). On TPU we do not port an
FFT — we pick the formulation that maps best onto the hardware:

* ``xla``    — ``jnp.fft.fft`` (XLA's native FFT). Correct everywhere,
               good on CPU, decent on TPU.
* ``dft``    — four-step Cooley–Tukey with the two small stages evaluated
               as dense DFT matmuls on the MXU (N = n1*n2, both <= 128).
               More FLOPs than an FFT but they are MXU FLOPs; on TPU the
               detection path is HBM-bound, so trading scalar shuffles for
               systolic matmuls wins. Used by the Pallas fused kernel too.

All backends take [..., N] complex64 (N = 2**sf, 4..4096) and return the
unnormalised DFT, matching kissfft's convention.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _cmatmul(a, b):
    """Complex matmul over the last two axes as four real MXU matmuls."""
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    dot = functools.partial(jnp.matmul, preferred_element_type=jnp.float32)
    return jax.lax.complex(dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br))


def fft(x, backend: str = "auto"):
    if backend == "auto":
        # XLA:CPU has a native FFT; the axon TPU backend does not lower
        # jnp.fft (verified UNIMPLEMENTED), and the MXU formulation is the
        # right call on TPU anyway.
        backend = "xla" if jax.default_backend() == "cpu" else "dft"
    if backend == "xla":
        return jnp.fft.fft(x)
    if backend == "dft":
        return fft_dft_matmul(x)
    raise ValueError(f"unknown fft backend {backend!r}")


def _split(n: int) -> tuple[int, int]:
    """Factor N = n1*n2 with both factors <= 128 and as square as possible."""
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    while n2 > 128:
        n1 *= 2
        n2 //= 2
    return n1, n2


@functools.lru_cache(maxsize=16)
def _dft_mats(n: int):
    """(W1 [n1,n1], W2 [n2,n2], twiddle [n1,n2]) complex64 NumPy constants.

    NumPy (not jnp) on purpose: the cache must never capture arrays created
    under a jit trace (tracer leak); conversion happens at the use site.
    """
    n1, n2 = _split(n)
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    w1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1).astype(np.complex64)
    w2 = np.exp(-2j * np.pi * np.outer(k2, k2) / n2).astype(np.complex64)
    tw = np.exp(-2j * np.pi * np.outer(k1, k2) / n).astype(np.complex64)
    return w1, w2, tw, n1, n2


def fft_dft_matmul(x):
    """Four-step DFT: reshape [.., n2, n1] -> DFT cols (n1) -> twiddle ->
    DFT rows (n2) -> transpose-flatten. Exact same output as jnp.fft.fft
    up to float rounding, but expressed as two dense matmuls that XLA
    places on the MXU.

    Derivation: with n = n1*n2, index split  i = i2*n1 + i1 (input),
    k = k1*n2 + k2 (output):
      X[k1*n2+k2] = sum_{i1} W1[k1,i1] * ( tw[i1,k2] * sum_{i2} x[i2*n1+i1] * W2[k2,i2] )
    """
    n = x.shape[-1]
    if n <= 128:
        k = np.arange(n)
        w = jnp.asarray(np.exp(-2j * np.pi * np.outer(k, k) / n).astype(np.complex64))
        return _cmatmul(x, w.T)
    w1np, w2np, twnp, n1, n2 = _dft_mats(n)
    w1, w2, tw = jnp.asarray(w1np), jnp.asarray(w2np), jnp.asarray(twnp)
    lead = x.shape[:-1]
    xm = x.reshape(*lead, n2, n1)                    # x[i2, i1]
    inner = _cmatmul(xm.swapaxes(-1, -2), w2.T)      # [.., i1, k2] = sum_i2 x[i2,i1] W2[k2,i2]
    inner = inner * tw                               # twiddle [i1, k2] ≡ [n1, n2]
    outer = _cmatmul(inner.swapaxes(-1, -2), w1.T)   # [.., k2, k1] = sum_i1 W1[k1,i1] inner[i1,k2]
    return outer.swapaxes(-1, -2).reshape(*lead, n)  # [.., k1, k2] -> k
