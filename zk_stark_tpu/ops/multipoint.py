"""Arbitrary-domain multipoint evaluation / interpolation (subproduct tree).

Capability parity with the reference's O(n log^2 n) remainder-tree
evaluation and recursive split interpolation
(ref: /root/reference/src/fft/ntt_arithmetics.rs:110-159 and :172-237),
redesigned for the device: the reference walks its trees node-by-node with
scalar polynomial arithmetic; here every tree LEVEL is one batch —
``[nodes, coeffs, 8]`` arrays — so each level costs a constant number of
batched NTT multiplies regardless of node count:

* zerofier tree: pairwise batched products bottom-up;
* evaluation: top-down batched remainder sweep, where the remainder by the
  (monic) child zerofiers uses reversed-polynomial Newton series inversion
  (log-depth, batched) instead of the reference's schoolbook long division
  per node;
* interpolation: barycentric form — weights v_i / Z'(x_i) (one evaluation
  sweep of the zerofier derivative) followed by a bottom-up batched combine
  r_parent = r_left * Z_right + r_right * Z_left, algebraically identical
  to the reference recursion (interpolation is unique).

Domains must be power-of-two sized here (level batches stay uniform);
other sizes use the Horner / Lagrange fallbacks in ops.poly_ops, which win
below the dispatch-overhead crossover anyway (see tools/multipoint_bench.py).

Execution mode: on accelerators the per-(n, k) driver is jitted (one
dispatch); on CPU it runs eagerly with the unrolled NTT body, because
XLA-CPU pays ~3 s per fused Montgomery-multiply instance and the tree has
O(log^2 k) distinct shapes — eager per-op kernels are cached and cheap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.bits import is_pow2, next_pow2
from . import limbs as L
from .ntt import _brev, ntt_body, ntt_body_unrolled, powers_mont

P = L.P


@functools.lru_cache(maxsize=None)
def _root_for(m: int) -> int:
    from ..field import Field

    return Field().primitive_nth_root(m).value


def _use_jit() -> bool:
    return jax.default_backend() != "cpu"


def _bntt(x, root_int: int):
    """Batched NTT along axis 1 of [B, m, 8] (m power of two)."""
    m = x.shape[1]
    xt = jnp.swapaxes(x, 0, 1)  # [m, B, 8]
    body = ntt_body if _use_jit() else ntt_body_unrolled
    y = body(xt, powers_mont(root_int, m // 2), _brev(m), m)
    return jnp.swapaxes(y, 0, 1)


def _bintt(x, root_int: int):
    m = x.shape[1]
    y = _bntt(x, pow(root_int, -1, P))
    n_inv = L.int_to_mont(pow(m, -1, P))
    return L.mont_mul(y, jnp.broadcast_to(n_inv, y.shape))


def _pad_axis1(x, m: int):
    if x.shape[1] >= m:
        return x[:, :m]
    pad = jnp.zeros((x.shape[0], m - x.shape[1], L.NLIMB), jnp.uint32)
    return jnp.concatenate([x, pad], axis=1)


def _bmul(a, b, out_len: int):
    """Batched polynomial product: [B, na, 8] x [B, nb, 8] -> [B, out_len, 8]
    (same pad -> NTT -> Hadamard -> iNTT pipeline as the reference
    fast_multiply, ref: ntt_arithmetics.rs:5-64, batched over nodes)."""
    m = next_pow2(max(2, a.shape[1] + b.shape[1] - 1))
    root = _root_for(m)
    ya = _bntt(_pad_axis1(a, m), root)
    yb = _bntt(_pad_axis1(b, m), root)
    prod = _bintt(L.mont_mul(ya, yb), root)
    return _pad_axis1(prod, out_len)


def _bseries_inv(q, prec: int):
    """Batched power-series inverse mod x^prec of q with q[:, 0] == 1
    (monic reversed): Newton iteration v <- v * (2 - q v), log2(prec) steps.
    """
    B = q.shape[0]
    v = jnp.broadcast_to(jnp.asarray(L.ONE_MONT), (B, 1, L.NLIMB)).astype(
        jnp.uint32
    )
    cur = 1
    two = L.int_to_mont(2)
    while cur < prec:
        cur = min(2 * cur, prec)
        qv = _bmul(q[:, :cur], v, cur)
        corr = L.neg_mod(qv)
        corr = corr.at[:, 0].set(
            L.add_mod(corr[:, 0], jnp.broadcast_to(two, (B, L.NLIMB)))
        )
        v = _bmul(v, corr, cur)
    return v


def _brem(p, q):
    """Batched remainder of p [B, np, 8] by MONIC q [B, d+1, 8] -> [B, d, 8].

    Fast division: rev(u) = rev(p) * rev(q)^-1 mod x^(np-d), then
    r = p - q*u truncated to d coefficients.  Exact field arithmetic, so the
    result equals the reference's long-division remainder
    (ref: polynomial.rs:179-224) on every node.
    """
    d = q.shape[1] - 1
    n_p = p.shape[1]
    if n_p <= d:
        return _pad_axis1(p, d)
    nu = n_p - d
    inv_rq = _bseries_inv(q[:, ::-1], nu)
    ru = _bmul(p[:, ::-1][:, :nu], inv_rq, nu)
    u = ru[:, ::-1]
    qu = _bmul(q, u, n_p)
    return L.sub_mod(p, qu)[:, :d]


def _zerofier_levels(domain):
    """Bottom-up batched zerofier tree for a [k, 8] Montgomery domain
    (k power of two).  Returns levels[l] = [k >> l, 2^l + 1, 8] monic
    zerofiers of consecutive 2^l-point blocks; levels[-1][0] is the full
    domain zerofier (identical coefficients to ref ntt_arithmetics.rs:66-108
    — polynomial products are unique)."""
    k = domain.shape[0]
    ones = jnp.broadcast_to(jnp.asarray(L.ONE_MONT), (k, L.NLIMB)).astype(
        jnp.uint32
    )
    lvl = jnp.stack([L.neg_mod(domain), ones], axis=1)  # x - d_i
    levels = [lvl]
    while lvl.shape[0] > 1:
        m_out = 2 * (lvl.shape[1] - 1) + 1
        lvl = _bmul(lvl[0::2], lvl[1::2], m_out)
        levels.append(lvl)
    return levels


def _eval_sweep(coeffs, levels):
    """Top-down remainder sweep: [n, 8] coefficients -> [k, 8] evaluations
    at the tree's domain (in domain order)."""
    r = _brem(coeffs[None], levels[-1])  # p mod Z -> [1, k, 8]
    for lvl in reversed(levels[:-1]):
        r = _brem(jnp.repeat(r, 2, axis=0), lvl)
    return r[:, 0]


def _evaluate_impl(coeffs, domain):
    return _eval_sweep(coeffs, _zerofier_levels(domain))


def _interpolate_impl(domain, values):
    k = domain.shape[0]
    levels = _zerofier_levels(domain)
    z = levels[-1][0]  # [k+1, 8]
    # Z'(x): coefficient j of Z' is (j+1) * z_{j+1}
    mult = L.ints_to_mont([(j + 1) % P for j in range(k)])
    dz = L.mont_mul(z[1:], mult)
    zp_vals = _eval_sweep(dz, levels)
    w = L.mont_mul(values, L.batch_inv(zp_vals))
    r = w[:, None, :]  # [k, 1, 8] constant interpolants
    for lvl in levels[:-1]:
        m_out = lvl.shape[1] + r.shape[1] - 1
        left = _bmul(r[0::2], lvl[1::2], m_out)
        right = _bmul(r[1::2], lvl[0::2], m_out)
        r = L.add_mod(left, right)
    return r[0]  # [k, 8] coefficients, degree <= k-1


@functools.lru_cache(maxsize=None)
def _evaluate_jit(n: int, k: int):
    return jax.jit(_evaluate_impl)


@functools.lru_cache(maxsize=None)
def _interpolate_jit(k: int):
    return jax.jit(_interpolate_impl)


def evaluate_tree(coeffs, domain):
    """Evaluate [n, 8] Montgomery coefficients on an arbitrary [k, 8]
    Montgomery domain (k a power of two) -> [k, 8] Montgomery values."""
    k = domain.shape[0]
    assert is_pow2(k), "tree evaluation requires a power-of-two domain"
    if _use_jit():
        return _evaluate_jit(int(coeffs.shape[0]), k)(coeffs, domain)
    return _evaluate_impl(coeffs, domain)


def interpolate_tree(domain, values):
    """Interpolate values over an arbitrary [k, 8] Montgomery domain
    (k a power of two, distinct points) -> [k, 8] Montgomery coefficients."""
    k = domain.shape[0]
    assert is_pow2(k), "tree interpolation requires a power-of-two domain"
    assert values.shape[0] == k
    if _use_jit():
        return _interpolate_jit(k)(domain, values)
    return _interpolate_impl(domain, values)
