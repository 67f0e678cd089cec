"""Integer helpers: gcd / extended gcd on host Python ints.

Capability-equivalent of the reference utils (ref: /root/reference/src/utils/gcd.rs:1-10,
/root/reference/src/utils/xgcd.rs:22-48).  Python ints are arbitrary precision so the
unsigned-overflow dance of the reference is unnecessary; results agree.
"""

from __future__ import annotations

from math import gcd  # noqa: F401  (re-exported)


def xgcd(a: int, b: int) -> tuple[int, int, int]:
    """Extended Euclid: returns ``(x, y, g)`` with ``a*x + b*y == g == gcd(a, b)``.

    Matches the return convention of the reference ``u_xgcd`` (x, y, g).
    """
    old_r, r = a, b
    old_s, s = 1, 0
    old_t, t = 0, 1
    while r != 0:
        q = old_r // r
        old_r, r = r, old_r - q * r
        old_s, s = s, old_s - q * s
        old_t, t = t, old_t - q * t
    return old_s, old_t, old_r


def multiplicative_inverse(x: int, y: int, m: int) -> int:
    """x * y^-1 mod m (ref: utils/xgcd.rs:50-57)."""
    a, _, _ = xgcd(y, m)
    if a < 0:
        return (m - x) * (-a) % m
    return x * a % m
