"""Complex FFT parity (ref: fft/fft.rs:35-91 golden vector)."""

import numpy as np

from zk_stark_tpu.ops.fft import dft, fft, fft_recursive

SIGNAL = [1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0]
CORRECT = [
    (4.000, 0.000),
    (1.000, -2.414),
    (0.000, 0.000),
    (1.000, -0.414),
    (0.000, 0.000),
    (1.000, 0.414),
    (0.000, 0.000),
    (1.000, 2.414),
]


def _check(freqs):
    for got, (re, im) in zip(freqs, CORRECT):
        # round(x, 3) + 0.0 normalizes negative zero
        gre, gim = round(float(got.real), 3) + 0.0, round(float(got.imag), 3) + 0.0
        assert (gre, gim) == (re, im)


def test_fft_iterative_golden():
    _check(fft([complex(v) for v in SIGNAL]))


def test_fft_recursive_golden():
    _check(fft_recursive([complex(v) for v in SIGNAL]))


def test_dft_golden():
    _check(dft(SIGNAL))


def test_variants_agree_random():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64).astype(np.float32)
    a = dft(x)
    b = fft_recursive(x.astype(np.complex64))
    c = fft(x.astype(np.complex64))
    np.testing.assert_allclose(a, b, atol=1e-3)
    np.testing.assert_allclose(b, c, atol=1e-3)
