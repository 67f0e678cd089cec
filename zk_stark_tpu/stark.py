"""STARK prover and verifier.

Protocol-identical to the reference (ref: /root/reference/src/stark/stark.rs:17-771):
same transcript bytes, same degree bookkeeping, same proof format.  The
prover's compute is redesigned TPU-first:

* trace interpolation over the first-k powers of omicron runs as the
  O(n log n) device barycentric/NTT algorithm (ops.poly_ops.interpolate_first_k)
  instead of the reference's recursive subproduct tree (stark.rs:305-326);
* transition polynomials are obtained by evaluating the AIR *pointwise* on the
  FRI coset (vectorized over constraint terms) and interpolating back with one
  iNTT — mathematically identical to symbolic composition
  (stark.rs:388-406) because the composition degree fits the coset size,
  but it replaces symbolic polynomial powers with batched elementwise work;
* codeword commitments, shifts and the weighted combination are device
  elementwise ops; Merkle trees are built once and opened in O(log n).

The verifier is host-side Python ints (it touches only O(checks * log n)
field elements).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from . import merkle
from .field import Field
from .fri import FRI
from .ops import limbs as L
from .ops.ntt import powers_mont
from .ops.poly_ops import (
    DPoly,
    degree_device,
    fast_coset_divide,
    fast_coset_evaluate,
    interpolate_first_k,
    mpoly_evaluate_codewords,
    zerofier_first_k,
)
from .poly import MPolynomial, Polynomial
from .proof_stream import Path, ProofStream, Root, Value
from .utils.bits import bit_count
from .utils.hashing import PROOF_BYTES


class ProvingError(Exception):
    """Raised when the prover cannot produce a valid proof (e.g. the degree
    sanity check rejects a false witness, ref: stark.rs:451-464)."""


class VerificationError(Exception):
    """Raised when a proof is rejected."""


Boundary = Sequence[tuple[int, int, int]]  # (cycle, register, value)


class Stark:
    """(ref: stark.rs:70-114)"""

    def __init__(
        self,
        field: Field,
        expansion_factor: int,
        num_collinearity_checks: int,
        security_level: int,
        num_registers: int,
        num_cycles: int,
        transition_constraints_degree: int,
        rng: Callable[[int], bytes] = os.urandom,
        engine=None,
    ):
        assert bit_count(field.order) >= security_level, (
            f"field order must be at least {security_level} bits"
        )
        assert expansion_factor & (expansion_factor - 1) == 0, (
            "expansion factor must be a power of 2"
        )
        assert expansion_factor >= 4, "expansion factor must be at least 4"
        assert num_collinearity_checks * 2 >= security_level, (
            f"number of collinearity checks must be at least half of "
            f"{security_level}"
        )

        from .parallel.engine import DEFAULT

        self.field = field
        self.expansion_factor = expansion_factor
        self.num_registers = num_registers
        self.original_trace_length = num_cycles
        self.num_randomizers = 4 * num_collinearity_checks
        self._rng = rng
        #: execution engine (parallel.engine): single-device by default; a
        #: DistEngine runs the prover's device segments sharded over a mesh
        #: with byte-identical output (SURVEY §7 step 9)
        self.engine = engine if engine is not None else DEFAULT
        #: optional utils.profiling.StageTimer; when set, prove() accumulates
        #: per-stage wall times into it (aux tracing subsystem)
        self.timer = None

        randomized_trace_length = num_cycles + self.num_randomizers
        # quirk kept: 1 << bit_count(v) is strictly greater than v even for
        # exact powers of two (ref: stark.rs:87 + utils/bits.py)
        self.omicron_domain_length = 1 << bit_count(
            randomized_trace_length * transition_constraints_degree
        )
        fri_domain_length = self.omicron_domain_length * expansion_factor

        self.generator = field.generator().value
        self.omega = field.primitive_nth_root(fri_domain_length).value
        self.omicron = field.primitive_nth_root(
            self.omicron_domain_length
        ).value
        self.fri = FRI(
            field,
            self.generator,
            self.omega,
            fri_domain_length,
            expansion_factor,
            num_collinearity_checks,
            engine=self.engine,
        )

    # -- degree bookkeeping (ref: stark.rs:116-186) --------------------------

    def transition_degree_bounds(self, transition_constraints) -> list[int]:
        from .models.air import as_air

        point_degrees = [1] + [
            self.original_trace_length + self.num_randomizers - 1
        ] * (2 * self.num_registers)
        return as_air(transition_constraints).degree_bounds(point_degrees)

    def transition_quotient_degree_bounds(
        self, transition_constraints: Sequence[MPolynomial]
    ) -> list[int]:
        return [
            d - (self.original_trace_length - 1)
            for d in self.transition_degree_bounds(transition_constraints)
        ]

    def max_degree(self, transition_constraints) -> int:
        md = max(self.transition_degree_bounds(transition_constraints))
        return (1 << bit_count(md)) - 1

    # -- zerofiers / interpolants (ref: stark.rs:188-260) --------------------

    def transition_zerofier(self) -> DPoly:
        """Zerofier over omicron^0..^(T-2) (ref: stark.rs:188-196)."""
        return zerofier_first_k(
            self.omicron,
            self.omicron_domain_length,
            self.original_trace_length - 1,
        )

    def boundary_zerofiers(self, boundary: Boundary) -> list[Polynomial]:
        p = self.field.order
        out = []
        for s in range(self.num_registers):
            domain = [
                pow(self.omicron, c, p) for c, r, _ in boundary if r == s
            ]
            out.append(Polynomial.zerofier_domain(self.field, domain))
        return out

    def boundary_interpolants(self, boundary: Boundary) -> list[Polynomial]:
        p = self.field.order
        out = []
        for s in range(self.num_registers):
            domain = [
                pow(self.omicron, c, p) for c, r, _ in boundary if r == s
            ]
            values = [v for _, r, v in boundary if r == s]
            if not domain:
                # register with no boundary conditions: zero interpolant
                # (the reference's fast_interpolate_domain on an empty
                # domain returns the empty polynomial)
                out.append(Polynomial.zero(self.field))
            else:
                out.append(
                    Polynomial.interpolate_domain(self.field, domain, values)
                )
        return out

    def boundary_quotient_degree_bounds(
        self, randomized_trace_length: int, boundary: Boundary
    ) -> list[int]:
        randomized_trace_degree = randomized_trace_length - 1
        return [
            randomized_trace_degree - bz.degree()
            for bz in self.boundary_zerofiers(boundary)
        ]

    def sample_weights(self, number: int, randomness: bytes) -> list[int]:
        """(ref: stark.rs:262-274).  Quirk kept: the i-zero-byte prefix does
        not change the 128-bit fold, so all weights coincide — reproduced
        faithfully for transcript compatibility."""
        return [
            self.field.sample(bytes(i) + randomness).value
            for i in range(number)
        ]

    def _stage(self, name: str):
        import contextlib

        if self.timer is None:
            return contextlib.nullcontext()
        return self.timer.stage(name)

    # -- prover (ref: stark.rs:276-563) --------------------------------------
    #
    # The protocol is identical to the reference, but the device work is
    # fused into two jitted segments separated only by the transcript's
    # mandatory host syncs (Fiat-Shamir):
    #   segment 1: trace interpolation -> boundary quotients + codewords,
    #              transition quotients (pointwise AIR on the coset + iNTT),
    #              randomizer codeword, quotient degrees    [one dispatch]
    #   ... host: Merkle roots, weights sampling, degree check ...
    #   segment 2: weighted combination -> combined codeword [one dispatch]
    #   ... FRI: one fused dispatch per fold round ...
    # This matters because every dispatch pays host<->device latency; the
    # unfused pipeline spent most of its wall time on ~100 small dispatches.

    def _build_seg1(self, key, air, bi_lens, bz_lens):
        p = self.field.order
        m = self.num_registers
        odl = self.omicron_domain_length
        fri_dl = self.fri.domain_length
        omicron, omega, g = self.omicron, self.omega, self.generator
        g_inv = pow(g, -1, p)
        orig_t = self.original_trace_length
        tdb = self.transition_degree_bounds(air)

        eng = self.engine

        def seg1(trace_cols, bi_arrs, bz_arrs, rand_coeffs):
            T = trace_cols.shape[1]
            tps = [
                interpolate_first_k(
                    omicron, odl, T, trace_cols[s], engine=eng
                )
                for s in range(m)
            ]

            bqs, bq_cws = [], []
            for s in range(m):
                bp = tps[s] - DPoly(bi_arrs[s])
                bq = fast_coset_divide(
                    bp,
                    DPoly(bz_arrs[s]),
                    g,
                    omicron,
                    odl,
                    lhs_degree=T - 1,
                    rhs_degree=bz_lens[s] - 1,
                    engine=eng,
                )
                bqs.append(bq)
                bq_cws.append(
                    fast_coset_evaluate(bq, g, omega, fri_dl, engine=eng)
                )

            x_cw = eng.constrain(powers_mont(omega, fri_dl, scale_int=g))
            cur = [
                fast_coset_evaluate(tp, g, omega, fri_dl, engine=eng)
                for tp in tps
            ]
            nxt = [
                fast_coset_evaluate(
                    tp.scale(omicron), g, omega, fri_dl, engine=eng
                )
                for tp in tps
            ]
            point = [x_cw] + cur + nxt

            tz = zerofier_first_k(omicron, odl, orig_t - 1)
            tqs, tq_degs = [], []
            for i, cw in enumerate(air.evaluate_codewords(point)):
                tpoly = DPoly(eng.intt(cw, omega)).scale(g_inv)
                tq = fast_coset_divide(
                    tpoly,
                    tz,
                    g,
                    omicron,
                    odl,
                    lhs_degree=tdb[i],
                    rhs_degree=orig_t - 1,
                    engine=eng,
                )
                tqs.append(tq)
                tq_degs.append(degree_device(tq.c))

            rand_cw = fast_coset_evaluate(
                DPoly(rand_coeffs), g, omega, fri_dl, engine=eng
            )

            from .ops.limbs import from_mont

            bq_canon = from_mont(jnp.stack([cw for cw in bq_cws]))
            rand_canon = from_mont(rand_cw)
            # pack the m boundary-quotient codewords, the randomizer
            # codeword AND the quotient degrees into ONE array: the host
            # reads everything it needs from segment 1 in a single fetch
            # (each dispatch+fetch round trip costs ~28 ms on the remote
            # transport)
            deg_row = jnp.zeros((fri_dl, L.NLIMB), dtype=jnp.uint32)
            deg_row = deg_row.at[: len(tq_degs), 0].set(
                jnp.stack(tq_degs).astype(jnp.uint32)
            )
            packed = jnp.concatenate(
                [bq_canon, rand_canon[None], deg_row[None]], axis=0
            )
            return (
                packed,
                tuple(tq.c for tq in tqs),
                tuple(bq.c for bq in bqs),
            )

        from .ops.constpool import pooled_jit

        return pooled_jit(seg1)

    def _build_seg2(self, key, shifts, lengths):
        p = self.field.order
        fri_dl = self.fri.domain_length
        omega, g = self.omega, self.generator
        max_len = max(ln + sh for ln, sh in zip(lengths, shifts))

        eng = self.engine

        def seg2(weights_arr, term_arrs):
            comb = jnp.zeros((max_len, L.NLIMB), dtype=jnp.uint32)
            for idx, arr in enumerate(term_arrs):
                w = weights_arr[idx]
                contrib = L.mont_mul(arr, jnp.broadcast_to(w, arr.shape))
                sh = shifts[idx]
                ln = arr.shape[0]
                seg = L.add_mod(comb[sh : sh + ln], contrib)
                comb = comb.at[sh : sh + ln].set(seg)

            combined = fast_coset_evaluate(
                DPoly(comb), g, omega, fri_dl, engine=eng
            )
            from .ops.limbs import from_mont

            return combined, from_mont(combined)

        from .ops.constpool import pooled_jit

        return pooled_jit(seg2)

    #: compiled prover segments shared across Stark instances with the same
    #: configuration (XLA jit caches are per function object; without this,
    #: every Stark instance recompiles identical programs)
    _SEG_CACHE: dict = {}

    def _config_key(self) -> tuple:
        return (
            self.field.order,
            self.expansion_factor,
            self.num_registers,
            self.original_trace_length,
            self.num_randomizers,
            self.omicron_domain_length,
            self.fri.domain_length,
            self.engine.cache_key,
        )

    def _seg_cache_get(self, name, key, builder, *args):
        full_key = (name, self._config_key()) + key
        cache = Stark._SEG_CACHE
        if full_key not in cache:
            cache[full_key] = builder(key, *args)
        return cache[full_key]

    def prove(
        self,
        trace: Sequence[Sequence[int]],
        transition_constraints: Sequence[MPolynomial],
        boundary: Boundary,
        proof_stream: Optional[ProofStream] = None,
    ) -> bytes:
        p = self.field.order
        ps = proof_stream if proof_stream is not None else ProofStream(self.field)

        # concatenate randomizers - induces zero knowledge (stark.rs:286-301)
        trace = [list(row) for row in trace]
        for _ in range(self.num_randomizers):
            trace.append(
                [
                    self.field.sample(self._rng(17)).value
                    for _ in range(self.num_registers)
                ]
            )
        randomized_trace_length = len(trace)

        # host-side setup: boundary polynomials, randomizer coefficients
        boundary_interpolants = self.boundary_interpolants(boundary)
        boundary_zerofiers = self.boundary_zerofiers(boundary)
        transition_constraints_degree = self.max_degree(transition_constraints)
        randomizer_ints = [
            self.field.sample(self._rng(17)).value
            for _ in range(transition_constraints_degree + 1)
        ]

        with self._stage("host_inputs"):
            trace_cols = L.ints_to_mont(
                [v for s in range(self.num_registers) for v in
                 (row[s] for row in trace)]
            ).reshape(self.num_registers, randomized_trace_length, L.NLIMB)
            bi_arrs = tuple(
                L.ints_to_mont(bi.coeffs if bi.coeffs else [0])
                for bi in boundary_interpolants
            )
            bz_arrs = tuple(
                L.ints_to_mont(bz.coeffs) for bz in boundary_zerofiers
            )
            rand_arr = L.ints_to_mont(randomizer_ints)

        from .models.air import as_air

        air = as_air(transition_constraints)
        tcs_fp = air.fingerprint()
        bi_lens = tuple(a.shape[0] for a in bi_arrs)
        bz_lens = tuple(a.shape[0] for a in bz_arrs)
        seg1 = self._seg_cache_get(
            "seg1",
            (randomized_trace_length, bi_lens, bz_lens, tcs_fp),
            self._build_seg1,
            air,
            bi_lens,
            bz_lens,
        )

        with self._stage("segment1"):
            packed, tq_stack, bq_stack = seg1(
                trace_cols, bi_arrs, bz_arrs, rand_arr
            )

        def _decode_degs(cells) -> list[int]:
            out = []
            for v in cells[: air.num_constraints]:
                d = int(v)
                out.append(d - (1 << 32) if d >= (1 << 31) else d)
            return out

        # commit to boundary quotients + randomizer (stark.rs:362-386,422-445)
        # — ONE host fetch brings back the tree tops (or host codewords) AND
        # the quotient degrees packed by segment 1
        with self._stage("commit_roots"):
            m = self.num_registers
            fri_dl = self.fri.domain_length
            if merkle.device_policy(fri_dl):
                trees, deg_np = merkle.build_device_trees(
                    [packed[s] for s in range(m + 1)],
                    extra=packed[m + 1, : air.num_constraints, 0],
                )
                tq_degrees = _decode_degs(deg_np)
            else:
                packed_np = np.asarray(packed)  # one fetch for everything
                tq_degrees = _decode_degs(packed_np[m + 1, :, 0])
                trees = [
                    merkle.HostCodewordTree(
                        packed_np[s],
                        merkle.tree_from_canonical_limbs(packed_np[s]),
                    )
                    for s in range(m + 1)
                ]
            boundary_quotient_trees = trees[:m]
            randomizer_tree = trees[m]
            for tree in trees:
                ps.push(Root(tree.root))

        # weights + degree sanity check (stark.rs:447-464)
        weights = self.sample_weights(
            1 + 2 * air.num_constraints + 2 * self.num_registers,
            ps.fiat_shamir_prover(PROOF_BYTES),
        )
        if any(d < 0 for d in tq_degrees):
            raise ProvingError("failed to get degree of transition quotient")
        if tq_degrees != self.transition_quotient_degree_bounds(
            transition_constraints
        ):
            raise ProvingError(
                "transition quotient degrees do not match with expectation"
            )

        # weighted combination (stark.rs:466-519)
        tq_bounds = self.transition_quotient_degree_bounds(
            transition_constraints
        )
        bq_bounds = self.boundary_quotient_degree_bounds(
            randomized_trace_length, boundary
        )
        term_arrs = [rand_arr]
        shifts = [0]
        for i, tq in enumerate(tq_stack):
            term_arrs.extend([tq, tq])
            shifts.extend([0, transition_constraints_degree - tq_bounds[i]])
        for i, bq in enumerate(bq_stack):
            term_arrs.extend([bq, bq])
            shifts.extend([0, transition_constraints_degree - bq_bounds[i]])
        lengths = tuple(int(a.shape[0]) for a in term_arrs)

        seg2 = self._seg_cache_get(
            "seg2",
            (tuple(shifts), lengths),
            self._build_seg2,
            tuple(shifts),
            lengths,
        )
        with self._stage("segment2"):
            weights_arr = L.ints_to_mont(weights)
            combined_dev, combined_canon = seg2(weights_arr, tuple(term_arrs))

        # FRI low-degree proof (stark.rs:522)
        with self._stage("fri_prove"):
            indices = self.fri.prove(combined_dev, ps, combined_canon)

        # open boundary quotients and randomizer (stark.rs:524-560)
        fri_dl = self.fri.domain_length
        duplicated_indices = indices + [
            (i + self.expansion_factor) % fri_dl for i in indices
        ]
        quadrupled_indices = sorted(
            duplicated_indices
            + [(i + fri_dl // 2) % fri_dl for i in duplicated_indices]
        )

        with self._stage("openings"):
            # all m+1 trees opened in one device dispatch + one host fetch
            opened = merkle.open_many(
                [
                    (boundary_quotient_trees[s], quadrupled_indices)
                    for s in range(self.num_registers)
                ]
                + [(randomizer_tree, quadrupled_indices)]
            )
            for vals, paths in opened:
                for j, i in enumerate(quadrupled_indices):
                    ps.push(Value(vals[j]))
                    ps.push(Path(tuple(paths[j])))

        with self._stage("serialize"):
            return ps.serialize()


    # -- verifier (ref: stark.rs:565-770) ------------------------------------

    def _build_verify_seg(
        self, key, air, orig_t, shifts_tq, shifts_bq, K, W, bz_lens, bi_lens
    ):
        """Fused verifier combination check: ONE pooled jit.

        The reference verifier loops per queried index on the host
        (stark.rs:676-770).  Round 3 batched each per-index evaluation into
        [K]-wide kernels but still issued ~50 small dispatches + ~10
        host->device transfers — at ~28 ms per transport round trip that
        overhead dominated chain-scale verify wall time.  Here every input
        (points, leafs, randomizer values, weights, boundary polynomials)
        arrives packed in a single [total, 8] upload, the entire check runs
        as one dispatch, and one canonical [K, 8] fetch returns.
        """
        m = self.num_registers
        odl = self.omicron_domain_length
        omicron = self.omicron

        def seg(packed):
            off = 0

            def take(n):
                nonlocal off
                out = packed[off : off + n]
                off += n
                return out

            x_cur = take(K)
            x_next = take(K)
            leaf_cur = [take(K) for _ in range(m)]
            leaf_next = [take(K) for _ in range(m)]
            rand_vals = take(K)
            weights = take(W)
            bz = [take(n) for n in bz_lens]
            bi = [take(n) for n in bi_lens]

            from .ops.poly_ops import evaluate_many

            # trace = leaf * zerofier(x) + interpolant(x) (stark.rs:684-703)
            trace_current, trace_next = [], []
            for s in range(m):
                trace_current.append(
                    L.add_mod(
                        L.mont_mul(leaf_cur[s], evaluate_many(bz[s], x_cur)),
                        evaluate_many(bi[s], x_cur),
                    )
                )
                trace_next.append(
                    L.add_mod(
                        L.mont_mul(leaf_next[s], evaluate_many(bz[s], x_next)),
                        evaluate_many(bi[s], x_next),
                    )
                )

            point = [x_cur] + trace_current + trace_next
            tz = zerofier_first_k(omicron, odl, orig_t - 1)
            tz_inv = L.batch_inv(evaluate_many(tz.c, x_cur))

            terms = [rand_vals]
            for s, tcv in enumerate(air.evaluate_codewords(point)):
                quotient = L.mont_mul(tcv, tz_inv)
                terms.append(quotient)
                terms.append(
                    L.mont_mul(quotient, L.mont_pow(x_cur, shifts_tq[s]))
                )
            for s in range(m):
                bqv = leaf_cur[s]
                terms.append(bqv)
                terms.append(
                    L.mont_mul(bqv, L.mont_pow(x_cur, shifts_bq[s]))
                )

            comb = jnp.zeros_like(x_cur)
            for i, term in enumerate(terms):
                comb = L.add_mod(
                    comb,
                    L.mont_mul(
                        term, jnp.broadcast_to(weights[i], term.shape)
                    ),
                )
            from .ops.limbs import from_mont

            return from_mont(comb)

        from .ops.constpool import pooled_jit

        return pooled_jit(seg)

    def verify(
        self,
        transition_constraints: Sequence[MPolynomial],
        boundary: Boundary,
        proof_stream: ProofStream,
    ) -> None:
        """Raises VerificationError on rejection."""
        p = self.field.order
        ps = proof_stream

        original_trace_length = 1 + max(c for c, _, _ in boundary)
        randomized_trace_length = (
            original_trace_length + self.num_randomizers
        )

        boundary_quotient_roots = [
            ps.pull_root() for _ in range(self.num_registers)
        ]
        randomizer_root = ps.pull_root()

        from .models.air import as_air

        air = as_air(transition_constraints)
        boundary_interpolants = self.boundary_interpolants(boundary)
        weights = self.sample_weights(
            1 + 2 * air.num_constraints + 2 * len(boundary_interpolants),
            ps.fiat_shamir_verifier(PROOF_BYTES),
        )

        points: list[tuple[int, int]] = []
        with self._stage("v_fri"):
            self.fri.timer = self.timer
            try:
                self.fri.verify(ps, points)
            except ValueError as e:
                raise VerificationError(
                    f"FRI verification failed: {e}"
                ) from e
            finally:
                self.fri.timer = None
        points.sort(key=lambda t: t[0])
        indices = [i for i, _ in points]
        values = [v for _, v in points]

        duplicated_indices = sorted(
            indices
            + [
                (i + self.expansion_factor) % self.fri.domain_length
                for i in indices
            ]
        )

        with self._stage("v_openings"):
            # boundary quotient leafs (stark.rs:637-658)
            leafs: list[dict[int, int]] = []
            for bqr in boundary_quotient_roots:
                reg_leafs: dict[int, int] = {}
                for i in duplicated_indices:
                    leaf = ps.pull_value()
                    path = ps.pull_path()
                    if not merkle.verify_int(bqr, i, path, leaf):
                        raise VerificationError(
                            f"boundary quotient root {i} is not verified"
                        )
                    reg_leafs[i] = leaf
                leafs.append(reg_leafs)

            # randomizer leafs (stark.rs:660-674)
            randomizers: dict[int, int] = {}
            for i in duplicated_indices:
                leaf = ps.pull_value()
                path = ps.pull_path()
                if not merkle.verify_int(randomizer_root, i, path, leaf):
                    raise VerificationError(
                        f"randomizer leaf {i} not verified"
                    )
                randomizers[i] = leaf

        # combination check (semantics of stark.rs:676-770): all inputs
        # packed into one upload, one fused dispatch, one fetch — see
        # _build_verify_seg
        if not indices:
            return
        with self._stage("v_comb_host"):
            boundary_zerofiers = self.boundary_zerofiers(boundary)
            transition_constraints_degree = self.max_degree(
                transition_constraints
            )
            tq_bounds = self.transition_quotient_degree_bounds(
                transition_constraints
            )
            bq_bounds = self.boundary_quotient_degree_bounds(
                randomized_trace_length, boundary
            )
            shifts_tq = tuple(
                transition_constraints_degree - b for b in tq_bounds
            )
            shifts_bq = tuple(
                transition_constraints_degree - b for b in bq_bounds
            )

            idx_next = [
                (i + self.expansion_factor) % self.fri.domain_length
                for i in indices
            ]
            bz_ints = [
                bz.coeffs if bz.coeffs else [0]
                for bz in boundary_zerofiers
            ]
            bi_ints = [
                bi.coeffs if bi.coeffs else [0]
                for bi in boundary_interpolants
            ]
            flat: list[int] = []
            flat += [
                self.fri.offset * pow(self.fri.omega, i, p) % p
                for i in indices
            ]
            flat += [
                self.fri.offset * pow(self.fri.omega, i, p) % p
                for i in idx_next
            ]
            for s in range(self.num_registers):
                flat += [leafs[s][i] for i in indices]
            for s in range(self.num_registers):
                flat += [leafs[s][i] for i in idx_next]
            flat += [randomizers[i] for i in indices]
            flat += weights
            for c in bz_ints:
                flat += c
            for c in bi_ints:
                flat += c

        K = len(indices)
        W = len(weights)
        bz_lens = tuple(len(c) for c in bz_ints)
        bi_lens = tuple(len(c) for c in bi_ints)
        # the transition zerofier uses the CONFIGURED trace length
        # (ref: stark.rs:728 calls self.transition_zerofier(), which spans
        # omicron^0..^(self.original_trace_length-2) per stark.rs:188-196);
        # the boundary-derived original_trace_length above only feeds
        # randomized_trace_length / boundary-quotient degree bounds
        # (stark.rs:572-577).  Using the boundary-derived value here would
        # reject valid proofs for any AIR whose boundary leaves the final
        # cycle unconstrained.
        orig_t = self.original_trace_length
        seg = self._seg_cache_get(
            "verify_seg",
            (K, W, orig_t, shifts_tq, shifts_bq, bz_lens, bi_lens,
             air.fingerprint()),
            self._build_verify_seg,
            air,
            orig_t,
            shifts_tq,
            shifts_bq,
            K,
            W,
            bz_lens,
            bi_lens,
        )
        with self._stage("v_comb_seg"):
            packed = L.ints_to_mont(flat)  # ONE host->device transfer
            combination = seg(packed)
            got = [int(v) for v in L.limbs_to_ints(np.asarray(combination))]
        if got != values:
            raise VerificationError(
                "combination does not match with polynomial value"
            )
