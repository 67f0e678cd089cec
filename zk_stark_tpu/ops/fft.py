"""Classic complex-valued DFT/FFT (pedagogical tier).

Parity with the reference's float32 Fourier components, which sit alongside
the NTT as teaching material and are not on the proving path
(ref: /root/reference/src/fft/dft.rs:4-24, fft/fft_recursive.rs:4-54,
 fft/fft.rs:5-33, utils/complex.rs:4-89; SURVEY §1 "dead/experimental").

TPU-native rendering: complex64 jnp arrays; the O(n^2) DFT is a single
matrix product, the iterative FFT runs vectorized butterfly stages; the
recursive variant is kept host-side numpy for pedagogy.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils.bits import bit_reverse_indices, next_pow2


def dft(inputs) -> np.ndarray:
    """O(n^2) discrete Fourier transform of a real signal
    (ref: fft/dft.rs:4-24)."""
    x = jnp.asarray(inputs, dtype=jnp.float32)
    n = x.shape[0]
    f = jnp.arange(n, dtype=jnp.float32)
    angles = -2.0 * jnp.pi * jnp.outer(f, f) / n
    matrix = jnp.exp(1j * angles.astype(jnp.complex64))
    return np.asarray(matrix @ x.astype(jnp.complex64))


def fft_recursive(inputs) -> np.ndarray:
    """Recursive radix-2 Cooley-Tukey (ref: fft/fft_recursive.rs:4-54)."""
    x = np.asarray(inputs, dtype=np.complex64)
    n = len(x)
    if n == 1:
        return x
    even = fft_recursive(x[0::2])
    odd = fft_recursive(x[1::2])
    k = np.arange(n // 2)
    omega = np.exp(-2j * np.pi * k / n).astype(np.complex64)
    t = omega * odd
    return np.concatenate([even + t, even - t]).astype(np.complex64)


def fft(inputs) -> np.ndarray:
    """Iterative radix-2 FFT, vectorized butterfly stages on device
    (ref: fft/fft.rs:5-33; pads to the next power of two with zeros)."""
    x = np.asarray(inputs, dtype=np.complex64)
    n = next_pow2(len(x)) if len(x) > 1 else len(x)
    if n != len(x):
        x = np.concatenate([x, np.zeros(n - len(x), dtype=np.complex64)])
    if n < 2:
        return x
    y = jnp.asarray(x)[bit_reverse_indices(n)]
    log2n = n.bit_length() - 1
    for s in range(log2n):
        half = 1 << s
        k = jnp.arange(half, dtype=jnp.float32)
        omega = jnp.exp(
            (-2j * jnp.pi / (2 * half)) * k.astype(jnp.complex64)
        )
        yr = y.reshape(-1, 2, half)
        even = yr[:, 0]
        odd = yr[:, 1] * omega[None, :]
        y = jnp.concatenate([even + odd, even - odd], axis=1).reshape(n)
    return np.asarray(y)
