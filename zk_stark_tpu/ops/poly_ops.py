"""Device polynomial toolkit over Montgomery limb arrays.

TPU-native replacement for the reference NTT-accelerated polynomial ops
(ref: /root/reference/src/fft/ntt_arithmetics.rs:5-310).  Key redesigns:

* ``fast_multiply`` / ``fast_coset_evaluate`` / ``fast_coset_divide`` keep the
  reference's degree bookkeeping (root-order halving, result truncation) but
  run as device NTT pipelines.
* The reference's O(n log^2 n) recursive subproduct trees for zerofiers and
  interpolation over "first k powers of omega" domains (the only structured
  domains the prover ever uses: trace interpolation stark.rs:305-326,
  transition zerofier stark.rs:188-196, round-constant polynomials
  rescue_prime.rs:206-242) are replaced by closed-form O(n log n) NTT
  identities:

  - zerofier values on the full domain via the sliding-window product
    ``prod_{i<k}(w^j - w^i) = w^{jk} * G_j / G_{j-k}`` with
    ``G_j = prod_{t=1..j}(1 - w^{-t})`` (a single cumulative product), then
    one iNTT for coefficients;
  - interpolation via barycentric form: off-domain values are
    ``Z(w^j) * sum_i u_i/(w^j - w^i)`` where the sum is a cyclic convolution
    (two NTTs) using ``1/(w^j - w^i) = w^{-i} / (w^{j-i} - 1)``.

Results are exact field elements, so they agree with the reference algorithms
coefficient-for-coefficient (interpolants and zerofiers are unique).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bits import next_pow2
from . import limbs as L
from .ntt import intt_mont, ntt_mont, powers_mont, scalar_mul_mont

P = L.P


# -----------------------------------------------------------------------------
# Reductions / scans (compile-friendly shapes)
# -----------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _reduce_sum_kernel(n: int):
    def kernel(x):
        while x.shape[0] > 1:
            m = x.shape[0]
            if m % 2:
                x = jnp.concatenate(
                    [x, jnp.zeros((1, L.NLIMB), dtype=jnp.uint32)], axis=0
                )
                m += 1
            x = L.add_mod(x[0::2], x[1::2])
        return x[0]

    return jax.jit(kernel)


def reduce_sum_mont(x: jax.Array) -> jax.Array:
    """Sum of all elements along axis 0 -> [8]."""
    if x.shape[0] == 0:
        return jnp.zeros((L.NLIMB,), dtype=jnp.uint32)
    return _reduce_sum_kernel(x.shape[0])(x)


@functools.lru_cache(maxsize=None)
def _cumprod_kernel(n: int, cols: int):
    rows = (n + cols - 1) // cols
    m = rows * cols

    def kernel(x):
        pad = jnp.broadcast_to(jnp.asarray(L.ONE_MONT), (m - n, L.NLIMB))
        grid = jnp.concatenate([x, pad], axis=0).reshape(rows, cols, L.NLIMB)

        # inclusive prefix within each row: scan over columns
        def col_body(carry, col):
            new = L.mont_mul(carry, col)
            return new, new

        init = jnp.broadcast_to(jnp.asarray(L.ONE_MONT), (rows, L.NLIMB))
        _, within = jax.lax.scan(col_body, init, jnp.swapaxes(grid, 0, 1))
        within = jnp.swapaxes(within, 0, 1)  # [rows, cols, 8] inclusive

        # exclusive prefix over row totals: scan over rows
        row_totals = within[:, -1]

        def row_body(carry, tot):
            return L.mont_mul(carry, tot), carry

        _, row_excl = jax.lax.scan(
            row_body, jnp.asarray(L.ONE_MONT), row_totals
        )
        out = L.mont_mul(row_excl[:, None, :], within)
        return out.reshape(m, L.NLIMB)[:n]

    return jax.jit(kernel)


def cumprod_mont(x: jax.Array) -> jax.Array:
    """Inclusive cumulative product along axis 0 (blocked two-level scan)."""
    n = x.shape[0]
    if n <= 1:
        return x
    cols = max(1, int(np.sqrt(n)))
    return _cumprod_kernel(n, cols)(x)


def degree_device(c):
    """Traceable degree scan: [n, 8] -> int32 scalar, -1 for the zero poly."""
    n = c.shape[0]
    mask = jnp.any(c != 0, axis=-1)
    deg = jnp.int32(n - 1) - jnp.argmax(mask[::-1]).astype(jnp.int32)
    return jnp.where(jnp.any(mask), deg, jnp.int32(-1))


@functools.lru_cache(maxsize=None)
def _degree_kernel(n: int):
    def kernel(x):
        mask = jnp.any(x != 0, axis=-1)
        any_nz = jnp.any(mask)
        deg = n - 1 - jnp.argmax(mask[::-1])
        return jnp.where(any_nz, deg, -1)

    return jax.jit(kernel)


# -----------------------------------------------------------------------------
# DPoly: device-resident dense polynomial
# -----------------------------------------------------------------------------


class DPoly:
    """Dense polynomial with device-resident Montgomery coefficients.

    The prover pipeline operates on these; conversion to host ints happens
    only at hashing/serialization boundaries.
    """

    __slots__ = ("c", "_degree")

    def __init__(self, c: jax.Array, degree: Optional[int] = "unknown"):
        self.c = jnp.asarray(c)
        self._degree = degree

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_ints(cls, vals: Sequence[int]) -> "DPoly":
        return cls(L.ints_to_mont(list(vals)))

    @classmethod
    def zero(cls) -> "DPoly":
        return cls(jnp.zeros((0, L.NLIMB), dtype=jnp.uint32), None)

    def to_ints(self) -> list[int]:
        if self.c.shape[0] == 0:
            return []
        return list(L.mont_to_ints(self.c))

    # -- inspection ----------------------------------------------------------

    def __len__(self) -> int:
        return int(self.c.shape[0])

    def degree(self) -> Optional[int]:
        if self._degree == "unknown":
            if self.c.shape[0] == 0:
                self._degree = None
            else:
                d = int(_degree_kernel(self.c.shape[0])(self.c))
                self._degree = None if d < 0 else d
        return self._degree

    def is_zero(self) -> bool:
        return self.degree() is None

    # -- shape helpers -------------------------------------------------------

    def padded(self, n: int) -> jax.Array:
        m = self.c.shape[0]
        assert m <= n, f"polynomial of length {m} does not fit order {n}"
        if m == n:
            return self.c
        return jnp.concatenate(
            [self.c, jnp.zeros((n - m, L.NLIMB), dtype=jnp.uint32)], axis=0
        )

    def truncated(self, n: int) -> "DPoly":
        if self.c.shape[0] <= n:
            return self
        return DPoly(self.c[:n])

    # -- arithmetic ----------------------------------------------------------

    def __add__(self, other: "DPoly") -> "DPoly":
        n = max(len(self), len(other))
        if n == 0:
            return DPoly.zero()
        return DPoly(L.add_mod_jit(self.padded(n), other.padded(n)))

    def __sub__(self, other: "DPoly") -> "DPoly":
        n = max(len(self), len(other))
        if n == 0:
            return DPoly.zero()
        return DPoly(L.sub_mod_jit(self.padded(n), other.padded(n)))

    def __neg__(self) -> "DPoly":
        if len(self) == 0:
            return self
        return DPoly(L.neg_mod_jit(self.c))

    def scale(self, factor_int: int) -> "DPoly":
        """x -> factor*x substitution (ref: polynomial.rs:109-121)."""
        n = len(self)
        if n == 0:
            return self
        return DPoly(
            L.mont_mul_jit(self.c, powers_mont(factor_int, n)), self._degree
        )

    def shift(self, k: int) -> "DPoly":
        """Multiply by x^k (exact monomial product)."""
        if k == 0 or len(self) == 0:
            return self
        z = jnp.zeros((k, L.NLIMB), dtype=jnp.uint32)
        d = self._degree
        return DPoly(
            jnp.concatenate([z, self.c], axis=0),
            None if d == "unknown" or d is None else d + k,
        )

    def const_mul(self, scalar_int: int) -> "DPoly":
        if len(self) == 0:
            return self
        return DPoly(scalar_mul_mont(self.c, scalar_int))

    def evaluate(self, x_int: int) -> int:
        """Evaluate at a host scalar (powers table + multiply + tree sum)."""
        n = len(self)
        if n == 0:
            return 0
        prods = L.mont_mul_jit(self.c, powers_mont(x_int, n))
        return int(L.mont_to_ints(reduce_sum_mont(prods)[None, :])[0])


# -----------------------------------------------------------------------------
# Reference-parity fast ops (ref: ntt_arithmetics.rs)
# -----------------------------------------------------------------------------


def _halve_root(degree: int, root_int: int, order: int) -> tuple[int, int]:
    """Reference root-order reduction: halve while degree < order/2
    (ref: ntt_arithmetics.rs:38-41, 277-281)."""
    while degree < order // 2:
        root_int = root_int * root_int % P
        order //= 2
    return root_int, order


def _engine(engine):
    if engine is not None:
        return engine
    from ..parallel.engine import DEFAULT

    return DEFAULT


def fast_multiply(
    lhs: DPoly, rhs: DPoly, root_int: int, root_order: int, engine=None
) -> DPoly:
    """NTT polynomial product (ref: ntt_arithmetics.rs:5-64)."""
    eng = _engine(engine)
    if lhs.is_zero() or rhs.is_zero():
        return DPoly.zero()
    degree = lhs.degree() + rhs.degree()
    result_len = degree + 1
    root, order = _halve_root(degree, root_int, root_order)
    assert degree < order, "product degree exceeds available root order"
    la = eng.ntt(lhs.truncated(lhs.degree() + 1).padded(order), root)
    lb = eng.ntt(rhs.truncated(rhs.degree() + 1).padded(order), root)
    coeffs = eng.intt(L.mont_mul_jit(la, lb), root)
    out = DPoly(coeffs, degree).truncated(result_len)
    return out


def fast_coset_evaluate(
    poly: DPoly, offset_int: int, root_int: int, order: int, engine=None
) -> jax.Array:
    """Evaluate on the coset ``offset * root^i`` (ref: ntt_arithmetics.rs:161-170).

    Returns the codeword as a device array [order, 8].
    """
    eng = _engine(engine)
    scaled = poly.scale(offset_int)
    return eng.ntt(scaled.padded(order), root_int)


def fast_coset_divide(
    lhs: DPoly,
    rhs: DPoly,
    offset_int: int,
    root_int: int,
    root_order: int,
    lhs_degree: Optional[int] = None,
    rhs_degree: Optional[int] = None,
    engine=None,
) -> DPoly:
    """Exact division via coset NTT (ref: ntt_arithmetics.rs:239-310).

    Matches the reference even on inexact inputs (truncation to
    ``deg(lhs) - deg(rhs) + 1`` coefficients), which the prover's degree
    sanity check relies on.  ``lhs_degree``/``rhs_degree`` may be passed when
    statically known (e.g. generic randomized-trace degrees) so the call is
    traceable inside jit without a device sync.
    """
    eng = _engine(engine)
    if lhs_degree is None:
        assert not rhs.is_zero(), "cannot divide by zero polynomial"
        if lhs.is_zero():
            return DPoly.zero()
        lhs_degree = lhs.degree()
    if rhs_degree is None:
        rhs_degree = rhs.degree()
    assert lhs_degree >= rhs_degree, "cannot divide by higher-degree polynomial"

    degree = max(lhs_degree, rhs_degree)
    result_len = lhs_degree - rhs_degree + 1
    root, order = _halve_root(degree, root_int, root_order)

    lhs = lhs.truncated(lhs_degree + 1)
    rhs = rhs.truncated(rhs_degree + 1)
    la = eng.ntt(lhs.scale(offset_int).padded(order), root)
    lb = eng.ntt(rhs.scale(offset_int).padded(order), root)
    quot = L.mont_mul_jit(la, eng.batch_inv(lb))
    coeffs = eng.intt(quot, root)
    scaled = DPoly(coeffs).truncated(result_len)
    return scaled.scale(pow(offset_int, -1, P))


# -----------------------------------------------------------------------------
# Arbitrary-domain toolkit (API parity with ntt_arithmetics.rs)
# -----------------------------------------------------------------------------


def fast_zerofier(
    domain: jax.Array, root_int: int, root_order: int
) -> DPoly:
    """Zerofier over an arbitrary device domain [k, 8]
    (ref: ntt_arithmetics.rs:66-108).

    Pairwise product tree with NTT multiplies; identical coefficients to the
    reference recursion (polynomial products are unique).  For the prover's
    structured first-k-powers domains use :func:`zerofier_first_k`, which is
    O(n log n) in a single fused computation.
    """
    k = domain.shape[0]
    if k == 0:
        return DPoly.zero()
    neg = L.neg_mod_jit(domain)
    ones = jnp.broadcast_to(jnp.asarray(L.ONE_MONT), (k, L.NLIMB))
    level = [
        DPoly(jnp.stack([neg[i], ones[i]]), 1) for i in range(k)
    ]
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level) - 1, 2):
            nxt.append(
                fast_multiply(level[i], level[i + 1], root_int, root_order)
            )
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
    return level[0]


#: both dimensions at/above this size dispatch arbitrary-domain evaluation
#: to the O(n log^2 n) batched subproduct tree (ops.multipoint); below it
#: the O(n*k) vectorized Horner wins — the tree pays O(log^2 k) dependent
#:  batched-NTT stages (~30 dispatches at ~28 ms each over the remote
#: transport) while Horner is one dispatch of embarrassingly parallel work
#: (measured crossover analysis: tools/multipoint_bench.py)
_TREE_EVAL_MIN = 4096
#: unstructured-domain interpolation switches from O(k^2) host Lagrange to
#: the device tree here (Lagrange is host bigint math: ~30 s at k=4096)
_TREE_INTERP_MIN = 2048


def fast_evaluate_domain(
    poly: DPoly, domain: jax.Array
) -> jax.Array:
    """Evaluate a polynomial on an arbitrary device domain [k, 8]
    (capability of ref: ntt_arithmetics.rs:110-159).

    Small/medium problems run a batched Horner scan — O(n*k) arithmetic but
    fully vectorized in one dispatch, which beats tree-walking below the
    crossover.  Large problems (both dims >= _TREE_EVAL_MIN, k a power of
    two) dispatch to the batched remainder tree (ops.multipoint), the
    device-shaped counterpart of the reference's O(n log^2 n) recursion.
    Results are identical field elements either way.
    """
    from ..utils.bits import is_pow2

    k = int(domain.shape[0])
    n = int(poly.c.shape[0])
    if is_pow2(k) and k >= _TREE_EVAL_MIN and n >= _TREE_EVAL_MIN:
        from .multipoint import evaluate_tree

        return evaluate_tree(poly.c, domain)
    return evaluate_many(poly.c, domain)


def fast_interpolate_domain(
    field_order_unused,
    domain_ints: Sequence[int],
    values_ints: Sequence[int],
    root_int: int,
    root_order: int,
) -> DPoly:
    """Interpolate over an arbitrary host domain
    (capability of ref: ntt_arithmetics.rs:172-237).

    Dispatches: first-k-powers domains go to the O(n log n) device
    barycentric algorithm; large power-of-two general domains go to the
    batched subproduct tree (ops.multipoint, the device counterpart of
    ref ntt_arithmetics.rs:172-237); the rest use exact host Lagrange
    (interpolation is unique, so coefficients match the reference recursion
    in every branch).
    """
    from ..utils.bits import is_pow2

    k = len(domain_ints)
    assert k == len(values_ints)
    if k == 0:
        return DPoly.zero()
    expected = 1
    structured = True
    for d in domain_ints:
        if d % P != expected % P:
            structured = False
            break
        expected = expected * root_int % P
    if structured and k <= root_order:
        return interpolate_first_k(
            root_int, root_order, k, L.ints_to_mont(list(values_ints))
        )
    if is_pow2(k) and k >= _TREE_INTERP_MIN:
        from .multipoint import interpolate_tree

        coeffs = interpolate_tree(
            L.ints_to_mont(list(domain_ints)),
            L.ints_to_mont(list(values_ints)),
        )
        return DPoly(coeffs)
    from ..field import Field
    from ..poly import Polynomial

    host = Polynomial.interpolate_domain(
        Field(), list(domain_ints), list(values_ints)
    )
    return DPoly.from_ints(host.coeffs)


# -----------------------------------------------------------------------------
# Structured domains: first k powers of a primitive n-th root
# -----------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _one_minus_invpow_cumprod(root_int: int, n: int):
    """G[j] = prod_{t=1..j} (1 - w^-t) for j in [0, n); G[0] = 1.

    Returns (G, G_inv) device arrays [n, 8].  The impl runs as ONE pooled
    jit: the former eager op-by-op build cost a ~0.4 s XLA compile plus a
    multi-second transport dispatch *per op* on the remote backend (the
    dominant share of the r4 cold-start wall time, measured via
    jax_log_compiles).
    """
    from .constpool import build_pooled

    return build_pooled(lambda: _one_minus_invpow_cumprod_impl(root_int, n))


def _one_minus_invpow_cumprod_impl(root_int: int, n: int):
    root_inv = pow(root_int, -1, P)
    invpows = powers_mont(root_inv, n)  # w^{-t} for t in [0, n)
    one = jnp.broadcast_to(jnp.asarray(L.ONE_MONT), invpows.shape)
    terms = L.sub_mod(one, invpows)  # [1-1, 1-w^-1, ...]; index 0 is 0
    terms = terms.at[0].set(jnp.asarray(L.ONE_MONT))  # G starts at 1
    g = cumprod_mont(terms)
    g_inv = L.batch_inv(g)
    return g, g_inv


@functools.lru_cache(maxsize=None)
def _idx_mont_cached(k: int) -> jax.Array:
    """Montgomery [k, 8] of the integers 1..k (derivative multipliers)."""
    with jax.ensure_compile_time_eval():
        return jnp.asarray(
            L.ints_to_limbs([i * L.R_INT % P for i in range(1, k + 1)])
        )


@functools.lru_cache(maxsize=None)
def _h_table_ntt(root_int: int, n: int):
    """NTT of h where h[d] = 1/(w^d - 1) for d != 0, h[0] = 0 (cached;
    built as one pooled program, see constpool.build_pooled)."""
    from .constpool import build_pooled

    return build_pooled(lambda: _h_table_ntt_impl(root_int, n))


def _h_table_ntt_impl(root_int: int, n: int):
    pows = powers_mont(root_int, n)
    one = jnp.broadcast_to(jnp.asarray(L.ONE_MONT), pows.shape)
    diffs = L.sub_mod(pows, one)  # index 0 -> 0
    h = L.batch_inv(diffs)  # inv(0) == 0 keeps h[0] = 0
    return ntt_mont(h, root_int)


@functools.lru_cache(maxsize=None)
def _zerofier_first_k_cached(root_int: int, n: int, k: int):
    """Returns (coeffs DPoly of degree k, zvals [n,8] on the full domain)."""
    assert 0 < k <= n
    if k == n:
        # Z = x^n - 1
        coeffs = [P - 1] + [0] * (n - 1) + [1]
        with jax.ensure_compile_time_eval():
            zvals = jnp.zeros((n, L.NLIMB), dtype=jnp.uint32)
        return DPoly.from_ints(coeffs), zvals

    from .constpool import build_pooled

    coeffs_c, zvals = build_pooled(
        lambda: _zerofier_first_k_impl(root_int, n, k)
    )
    return DPoly(coeffs_c, k), zvals


def _zerofier_first_k_impl(root_int: int, n: int, k: int):
    g, g_inv = _cumprod_interned(root_int, n)
    wk = powers_mont(pow(root_int, k, P), n)  # w^{jk}
    # Q_j = G_j / G_{j-k}; only used for j >= k.  Static-shift concatenate,
    # NOT jnp.roll: the eager roll compiled a 61 s `_roll_static` program on
    # the remote backend (measured r5, jax_log_compiles).
    g_shift = jnp.concatenate([g_inv[n - k :], g_inv[: n - k]], axis=0)
    zvals = L.mont_mul(wk, L.mont_mul(g, g_shift))
    mask = (jnp.arange(n) >= k)[:, None]
    zvals = jnp.where(mask, zvals, jnp.zeros_like(zvals))
    coeffs = intt_mont(zvals, root_int)[: k + 1]
    return coeffs, zvals


def _cumprod_interned(root_int: int, n: int):
    """The cached cumprod tables, routed through the constant pool so
    callers tracing over them (zerofier build, pooled prover segments) take
    them as runtime arguments."""
    from .constpool import intern

    g, g_inv = _one_minus_invpow_cumprod(root_int, n)
    return (
        intern(("cumprod_g", root_int, n), g),
        intern(("cumprod_gi", root_int, n), g_inv),
    )


def zerofier_first_k(root_int: int, n: int, k: int) -> DPoly:
    """Z(x) = prod_{i<k} (x - w^i), w a primitive n-th root (0 < k <= n).

    O(n log n) on device; replaces the reference subproduct tree
    (ref: ntt_arithmetics.rs:66-108) for the structured domains used by the
    prover (transition zerofier, stark.rs:188-196).
    """
    from .constpool import intern

    coeffs, _ = _zerofier_first_k_cached(root_int, n, k)
    return DPoly(intern(("zerofier", root_int, n, k), coeffs.c), coeffs._degree)


def interpolate_first_k(
    root_int: int, n: int, k: int, values: jax.Array, engine=None
) -> DPoly:
    """Interpolate values over the first k powers of w (primitive n-th root).

    Returns the unique polynomial of degree < k; identical coefficients to
    the reference ``fast_interpolate_domain`` (ref: ntt_arithmetics.rs:172-237)
    because interpolation is unique.  O(n log n) barycentric/NTT algorithm.
    """
    eng = _engine(engine)
    assert 0 < k <= n and values.shape[0] == k
    if k == n:
        return DPoly(eng.intt(values, root_int), "unknown")
    if k == 1:
        return DPoly(values, "unknown")

    from .constpool import intern

    zc_raw, zv_raw = _zerofier_first_k_cached(root_int, n, k)
    zcoeffs = DPoly(
        intern(("zerofier", root_int, n, k), zc_raw.c), zc_raw._degree
    )
    zvals = eng.constrain(intern(("zvals", root_int, n, k), zv_raw))

    # Z'(w^i) for i < k: derivative coefficients, evaluated by NTT.
    idx_mont = intern(("idxmont", k), _idx_mont_cached(k))
    dz = L.mont_mul_jit(zcoeffs.c[1:], idx_mont)  # degree k-1, length k
    dz_vals = eng.ntt(DPoly(dz).padded(n), root_int)[:k]

    # u_i = v_i / Z'(w^i), weighted by w^{-i} for the convolution kernel.
    u = L.mont_mul_jit(values, L.batch_inv_jit(dz_vals))
    root_inv = pow(root_int, -1, P)
    a = L.mont_mul_jit(u, powers_mont(root_inv, k))
    a_full = jnp.concatenate(
        [a, jnp.zeros((n - k, L.NLIMB), dtype=jnp.uint32)], axis=0
    )

    # S_j = sum_i u_i/(w^j - w^i) as a cyclic convolution with h.
    h_ntt = eng.constrain(intern(("htable", root_int, n), _h_table_ntt(root_int, n)))
    s = eng.intt(
        L.mont_mul_jit(eng.ntt(a_full, root_int), h_ntt),
        root_int,
    )

    off_domain = L.mont_mul_jit(zvals, s)
    v_full = jnp.concatenate(
        [values, jnp.zeros((n - k, L.NLIMB), dtype=jnp.uint32)], axis=0
    )
    mask = (jnp.arange(n) < k)[:, None]
    ivals = jnp.where(mask, v_full, off_domain)
    return DPoly(eng.intt(ivals, root_int)).truncated(k)


@functools.lru_cache(maxsize=None)
def _evaluate_many_kernel(n: int):
    """Horner evaluation of an n-coefficient polynomial at many points."""

    def kernel(coeffs, points):
        # coeffs [n, 8]; points [k, 8]
        zero = jnp.zeros_like(points)

        def body(acc, c):
            return L.add_mod(L.mont_mul(acc, points), jnp.broadcast_to(c, acc.shape)), None

        acc, _ = jax.lax.scan(body, zero, coeffs[::-1])
        return acc

    return jax.jit(kernel)


def evaluate_many(coeffs: jax.Array, points: jax.Array) -> jax.Array:
    """Evaluate a dense polynomial [n, 8] at points [k, 8] -> [k, 8].

    Scan-based Horner: one multiply body, n sequential steps over a k-wide
    batch — the device-batched replacement for the verifier's per-index
    host evaluations (ref: stark.rs:676-770).  Long polynomials dispatch to
    the log-depth parallel kernel instead (no serial multiply chain)."""
    if coeffs.shape[0] == 0:
        return jnp.zeros_like(points)
    if coeffs.shape[0] >= _PARALLEL_EVAL_MIN:
        return _evaluate_parallel_kernel(int(coeffs.shape[0]), 1)(
            coeffs[None], points
        )[0]
    return _evaluate_many_kernel(coeffs.shape[0])(coeffs, points)


def evaluate_many_batched(coeffs: jax.Array, points: jax.Array) -> jax.Array:
    """Batched Horner: coeffs [B, n, 8] at points [B, k, 8] -> [B, k, 8].

    One scan of n steps evaluates B different polynomials at B point sets
    simultaneously (used for periodic round-constant polynomials in
    long-trace AIRs, where n can be ~10^5)."""
    zero = jnp.zeros_like(points)

    def body(acc, c):
        # c: [B, 8]
        return (
            L.add_mod(L.mont_mul(acc, points), c[:, None, :]),
            None,
        )

    acc, _ = jax.lax.scan(body, zero, jnp.swapaxes(coeffs, 0, 1)[::-1])
    return acc


#: coefficient count above which the log-depth parallel evaluator replaces
#: the sequential Horner scan (the scan issues one *dependent* Montgomery
#: multiply per coefficient — ~14k serial steps for a long-trace zerofier,
#: the verifier's former O(T) hot path; the parallel kernel is O(n*k) work
#: at O(log n) depth)
_PARALLEL_EVAL_MIN = 513


@functools.lru_cache(maxsize=None)
def _evaluate_parallel_kernel(n: int, nb: int):
    """Log-depth evaluation of ``nb`` n-coefficient polynomials at shared
    points: coeffs [nb, n, 8], points [k, 8] -> [nb, k, 8].

    Powers x^0..x^{n-1} are built by doubling (log2 n concatenation steps,
    each one batched Montgomery multiply), then every coefficient-power
    product is computed at once and tree-reduced — no sequential dependency
    chains, unlike Horner.
    """
    levels = max(1, (n - 1).bit_length())

    def kernel(coeffs, points):
        k = points.shape[0]
        # x^(2^j) for j < levels, via one same-shape scan body
        def sq(c, _):
            return L.mont_mul(c, c), c

        _, xps = jax.lax.scan(sq, points, None, length=levels)

        pows = jnp.broadcast_to(
            jnp.asarray(L.ONE_MONT), (k, 1, L.NLIMB)
        ).astype(jnp.uint32)
        cur = 1
        for j in range(levels):
            if cur >= n:
                break
            block = L.mont_mul(pows, xps[j][:, None, :])
            pows = jnp.concatenate([pows, block], axis=1)
            cur = pows.shape[1]
        pows = pows[:, :n]

        prods = L.mont_mul(pows[None], coeffs[:, None, :, :])  # [nb,k,n,8]
        while prods.shape[2] > 1:
            m = prods.shape[2]
            if m % 2:
                prods = jnp.concatenate(
                    [prods, jnp.zeros_like(prods[:, :, :1])], axis=2
                )
            prods = L.add_mod(prods[:, :, 0::2], prods[:, :, 1::2])
        return prods[:, :, 0]

    return jax.jit(kernel)


def evaluate_polys_shared(coeffs: jax.Array, points: jax.Array) -> jax.Array:
    """Evaluate B polynomials (coeffs [B, n, 8]) at shared points [k, 8].

    Dispatches to the log-depth parallel kernel for long polynomials (the
    verifier's transition zerofier and periodic constant columns,
    ref: stark.rs:676-770) and to the batched Horner scan otherwise.
    """
    nb, n = int(coeffs.shape[0]), int(coeffs.shape[1])
    if n >= _PARALLEL_EVAL_MIN:
        return _evaluate_parallel_kernel(n, nb)(coeffs, points)
    pts = jnp.broadcast_to(points[None], (nb,) + points.shape)
    return evaluate_many_batched(coeffs, pts)


# -----------------------------------------------------------------------------
# Multivariate constraint evaluation over codewords
# -----------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _var_powers_kernel(max_e: int):
    """Powers 0..max_e of a pointwise array via scan: [max_e+1, N, 8]."""

    def kernel(x):
        ones = jnp.broadcast_to(jnp.asarray(L.ONE_MONT), x.shape)

        def body(carry, _):
            nxt = L.mont_mul(carry, x)
            return nxt, nxt

        _, pows = jax.lax.scan(body, ones, None, length=max_e)
        return jnp.concatenate([ones[None], pows], axis=0)

    return jax.jit(kernel)


@functools.lru_cache(maxsize=None)
def _term_combine_kernel(nvars: int):
    def kernel(coeffs, selected):
        # coeffs [T, 8]; selected [V][T, N, 8]
        term = jnp.broadcast_to(coeffs[:, None, :], selected[0].shape)
        for v in range(nvars):
            term = L.mont_mul(term, selected[v])
        # tree-reduce over terms
        while term.shape[0] > 1:
            t = term.shape[0]
            if t % 2:
                term = jnp.concatenate(
                    [term, jnp.zeros_like(term[:1])], axis=0
                )
            term = L.add_mod(term[0::2], term[1::2])
        return term[0]

    return jax.jit(kernel)


def mpoly_evaluate_codewords(
    dictionary: dict[tuple[int, ...], int], points: Sequence[jax.Array]
) -> jax.Array:
    """Evaluate a sparse multivariate polynomial pointwise over codewords.

    ``points[v]`` is the codeword [N, 8] (Montgomery) of variable v.  Returns
    the constraint codeword [N, 8].  This is the prover-side replacement for
    symbolic composition (ref: m_polynomial.rs:124-139 via stark.rs:388-406):
    evaluating the AIR on the coset domain and interpolating back yields the
    identical transition polynomial, at NTT cost instead of symbolic
    polynomial powers.

    Vectorized over dictionary terms: per-variable power tensors are built by
    one scan each, terms gather their powers, multiply across variables and
    tree-reduce — no per-term unrolling, so compile cost stays flat in the
    dictionary size.
    """
    items = [(k, v) for k, v in dictionary.items() if v % P != 0]
    n = points[0].shape[0]
    if not items:
        return jnp.zeros((n, L.NLIMB), dtype=jnp.uint32)
    nvars = len(points)
    exps = np.zeros((len(items), nvars), dtype=np.int32)
    for t, (k, _) in enumerate(items):
        for v, e in enumerate(k):
            if v < nvars:
                exps[t, v] = e
            else:
                assert e == 0, "exponent on missing variable"
    coeffs = L.ints_to_mont([v for _, v in items])

    selected = []
    for v in range(nvars):
        max_e = int(exps[:, v].max())
        pows = _var_powers_kernel(max_e)(points[v])
        selected.append(pows[jnp.asarray(exps[:, v])])
    return _term_combine_kernel(nvars)(coeffs, selected)
