"""FRI low-degree proofs: commit / fold / query / verify.

Same protocol as the reference (ref: /root/reference/src/fri.rs:13-417) —
identical transcript bytes, index sampling, and colinearity checks — with the
compute redesigned TPU-first:

* the split-and-fold round
  ``cw'[i] = 1/2 * ((1 + a/(o*w^i)) * cw[i] + (1 - a/(o*w^i)) * cw[i+n/2])``
  runs as one fused elementwise device kernel using the algebraic form
  ``1/2 * ((L + R) + f_i * (L - R))`` with a precomputed inverse power table
  (no per-element division);
* Merkle layers are built once per round and queries answered in O(log n)
  (the reference re-hashes the whole codeword per opening).

The host drives the round loop (Fiat-Shamir is inherently sequential).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import merkle
from .field import Field
from .ops import limbs as L
from .ops.ntt import intt_mont, ntt_mont, powers_mont, scalar_mul_mont
from .ops.poly_ops import DPoly
from .poly import Polynomial
from .proof_stream import Codeword, Leafs, Path, ProofStream, Root
from .utils.bits import bit_index
from .utils.hashing import PROOF_BYTES, blake2b512


@functools.lru_cache(maxsize=None)
def _fold_kernel(n: int):
    half = n // 2

    def kernel(cw, factors, two_inv):
        lo, hi = cw[:half], cw[half:]
        s = L.add_mod(lo, hi)
        d = L.sub_mod(lo, hi)
        folded = L.add_mod(s, L.mont_mul(factors, d))
        return L.mont_mul(jnp.broadcast_to(two_inv, folded.shape), folded)

    return jax.jit(kernel)


def _fold_round_kernel(n: int, engine=None):
    from .parallel.engine import DEFAULT

    eng = engine if engine is not None else DEFAULT
    if not eng.is_distributed:
        from .ops import fold_pallas

        if fold_pallas.fold_supported(n):
            # single-chip TPU: the fused Pallas round (limb-plane layout,
            # VMEM-resident temporaries) — bit-exact vs the jnp kernel
            return fold_pallas.fold_round_pallas(n)
    return _fold_round_kernel_cached(n, eng)


@functools.lru_cache(maxsize=None)
def _fold_round_kernel_cached(n: int, engine):
    """Fused FRI round: fold + canonical (non-Montgomery) conversion.

    One device dispatch per round — the transcript forces a host sync every
    round anyway (the next alpha depends on this round's Merkle root), so
    the goal is exactly one round-trip per round.

    Under a DistEngine the codeword stays block-sharded: the lo/hi halves
    live on disjoint device groups and GSPMD inserts the collective permute
    for the pairing; everything else is local elementwise work.
    """
    half = n // 2
    one = L.int_to_limbs(1)

    def kernel(cw, invpows, ao_scalar, two_inv):
        cw = engine.constrain(cw)
        factors = L.mont_mul(jnp.broadcast_to(ao_scalar, invpows.shape), invpows)
        lo, hi = cw[:half], cw[half:]
        s = L.add_mod(lo, hi)
        d = L.sub_mod(lo, hi)
        folded = L.add_mod(s, L.mont_mul(factors, d))
        folded = L.mont_mul(jnp.broadcast_to(two_inv, folded.shape), folded)
        folded = engine.constrain(folded)
        canon = L.mont_mul(folded, jnp.broadcast_to(jnp.asarray(one), folded.shape))
        return folded, canon

    return jax.jit(kernel)


@functools.lru_cache(maxsize=None)
def _lowdeg_kernel(n: int, last_omega: int, last_offset: int, p: int):
    """Fused FRI last-codeword check (ref: fri.rs:281-328) in ONE dispatch.

    iNTT -> scale by offset^-1 -> device degree scan -> scale back ->
    re-evaluate; returns [1 + n, 8] with row 0 carrying the degree (two's
    complement in limb 0) and rows 1.. the canonical re-evaluated codeword.
    Replaces 3 dispatches + 2 fetches — each transport round trip costs
    ~28 ms, which dominated warm verify at chain scale.
    """
    from .ops.poly_ops import degree_device

    offset_inv = pow(last_offset, -1, p)

    def kernel(cw_mont):
        coeffs = intt_mont(cw_mont, last_omega)
        poly = DPoly(coeffs).scale(offset_inv)
        d = degree_device(poly.c)
        reeval = ntt_mont(poly.scale(last_offset).c, last_omega)
        canon = L.from_mont(reeval)
        deg_row = jnp.zeros((1, L.NLIMB), dtype=jnp.uint32)
        deg_row = deg_row.at[0, 0].set(d.astype(jnp.uint32))
        return jnp.concatenate([deg_row, canon], axis=0)

    return jax.jit(kernel)


class FRI:
    """(ref: fri.rs:13-38)"""

    def __init__(
        self,
        field: Field,
        offset: int,
        omega: int,
        domain_length: int,
        expansion_factor: int,
        num_colinearity_tests: int,
        engine=None,
    ):
        from .parallel.engine import DEFAULT

        self.field = field
        self.offset = offset
        self.omega = omega
        self.domain_length = domain_length
        self.expansion_factor = expansion_factor
        self.num_colinearity_tests = num_colinearity_tests
        self.engine = engine if engine is not None else DEFAULT
        #: optional utils.profiling.StageTimer (set by Stark.verify)
        self.timer = None

    def _stage(self, name: str):
        import contextlib

        if self.timer is None:
            return contextlib.nullcontext()
        return self.timer.stage(name)

    def num_rounds(self) -> int:
        """(ref: fri.rs:40-50)"""
        codeword_length = self.domain_length
        num = 0
        while (
            codeword_length > self.expansion_factor
            and codeword_length > 4 * self.num_colinearity_tests
        ):
            codeword_length //= 2
            num += 1
        return num

    def evaluate_domain(self) -> list[int]:
        """Host list of coset points offset * omega^i (ref: fri.rs:52-58)."""
        p = self.field.order
        out, cur = [], self.offset % p
        for _ in range(self.domain_length):
            out.append(cur)
            cur = cur * self.omega % p
        return out

    # -- index sampling (ref: fri.rs:60-113) ---------------------------------

    def sample_index(self, data: bytes, size: int) -> int:
        assert size != 0, "modulo zero is impossible"
        bytes_num = bit_index(size) // 8 + 1
        tail = data[-bytes_num:] if bytes_num <= len(data) else data
        acc = 0
        for b in tail:
            acc = (acc << 8) ^ b
        return acc % size

    def sample_indices(
        self, seed: bytes, size: int, reduced_size: int, number: int
    ) -> list[int]:
        assert number <= 2 * reduced_size, (
            "not enough entropy in indices wrt last codeword"
        )
        assert number <= reduced_size, (
            "cannot sample more indices than available in last codeword"
        )
        indices: list[int] = []
        reduced_indices: list[int] = []
        counter = 0
        while len(indices) < number:
            # quirk kept from the reference: the counter appends that many
            # zero BYTES, not a counter value (ref: fri.rs:100)
            index = self.sample_index(
                blake2b512(seed + bytes(counter)), size
            )
            reduced = index % reduced_size
            counter += 1
            if reduced not in reduced_indices:
                indices.append(index)
                reduced_indices.append(reduced)
        return indices

    # -- prover --------------------------------------------------------------

    def _fold(self, cw_dev: jax.Array, alpha: int, offset: int, omega: int):
        n = cw_dev.shape[0]
        p = self.field.order
        scale = alpha * pow(offset, -1, p) % p
        factors = scalar_mul_mont(
            powers_mont(pow(omega, -1, p), n // 2), scale
        )
        two_inv = L.int_to_mont(pow(2, -1, p))
        return _fold_kernel(n)(cw_dev, factors, two_inv)

    def commit(
        self,
        codeword_dev: jax.Array,
        proof_stream: ProofStream,
        codeword_canon=None,
    ):
        """(ref: fri.rs:115-172).  Returns the list of per-round codeword
        trees (merkle.DeviceMerkleTree / merkle.HostCodewordTree).

        Each round is a single fused device dispatch (fold + canonical
        conversion); ``codeword_canon`` lets the caller supply the initial
        round's canonical form to avoid an extra conversion.  On
        accelerators the Merkle trees hash on device and only the 64-byte
        root crosses to the host per round; queried values/paths are
        gathered later.
        """
        p = self.field.order
        omega, offset = self.omega, self.offset
        num_rounds = self.num_rounds()

        committed = []
        cw_dev = codeword_dev
        two_inv = L.int_to_mont(pow(2, -1, p))

        last = None
        for r in range(num_rounds):
            n = cw_dev.shape[0]
            assert pow(omega, n - 1, p) == pow(omega, -1, p), (
                "error in commit: omega does not have the right order"
            )
            if codeword_canon is None:
                codeword_canon = L._from_mont_jit(cw_dev)
            tree = merkle.tree_for_codeword(codeword_canon)
            proof_stream.push(Root(tree.root))

            if r == num_rounds - 1:
                last = tree
                break

            alpha = self.field.sample(
                proof_stream.fiat_shamir_prover(PROOF_BYTES)
            ).value
            committed.append(tree)

            ao = L.int_to_mont(alpha * pow(offset, -1, p) % p)
            invpows = powers_mont(pow(omega, -1, p), n // 2)
            cw_dev, codeword_canon = _fold_round_kernel(n, self.engine)(
                cw_dev, invpows, ao, two_inv
            )
            omega = omega * omega % p
            offset = offset * offset % p

        proof_stream.push(Codeword(tuple(last.all_values())))
        committed.append(last)
        return committed

    def query(
        self,
        current,
        nxt,
        indices_c: list[int],
        proof_stream: ProofStream,
    ) -> list[int]:
        """(ref: fri.rs:174-208).  Single-round form kept for API parity;
        :meth:`prove` batches every round's gathers into one device fetch."""
        half = current.n // 2
        indices_a = list(indices_c)
        indices_b = [i + half for i in indices_c]
        (ab_vals, ab_paths), (c_vals, c_paths) = merkle.open_many(
            [(current, indices_a + indices_b), (nxt, indices_c)]
        )
        self._push_round_queries(
            proof_stream, ab_vals, ab_paths, c_vals, c_paths, len(indices_c)
        )
        return indices_a + indices_b

    @staticmethod
    def _push_round_queries(
        proof_stream, ab_vals, ab_paths, c_vals, c_paths, k: int
    ) -> None:
        """Transcript pushes for one query round: k Leafs then k*(3 Paths),
        byte-identical to the reference order (ref: fri.rs:189-206)."""
        a_vals, b_vals = ab_vals[:k], ab_vals[k:]
        a_paths, b_paths = ab_paths[:k], ab_paths[k:]
        for s in range(k):
            proof_stream.push(Leafs((a_vals[s], b_vals[s], c_vals[s])))
        for s in range(k):
            proof_stream.push(Path(tuple(a_paths[s])))
            proof_stream.push(Path(tuple(b_paths[s])))
            proof_stream.push(Path(tuple(c_paths[s])))

    def prove(
        self,
        codeword_dev: jax.Array,
        proof_stream: ProofStream,
        codeword_canon=None,
    ) -> list[int]:
        """(ref: fri.rs:210-248)"""
        assert self.domain_length == codeword_dev.shape[0], (
            "domain length does not match initial codeword length"
        )
        committed = self.commit(codeword_dev, proof_stream, codeword_canon)

        top_level_indices = self.sample_indices(
            proof_stream.fiat_shamir_prover(PROOF_BYTES),
            committed[1].n,
            committed[-1].n,
            self.num_colinearity_tests,
        )
        indices = list(top_level_indices)

        # Gather every round's queried values + sibling paths in ONE device
        # dispatch + ONE host fetch (the index derivation is pure host math,
        # and the query pushes do not feed any further Fiat-Shamir draw).
        specs = []
        for i in range(len(committed) - 1):
            cur = committed[i]
            half = cur.n // 2
            indices = [idx % half for idx in indices]
            specs.append((cur, indices + [x + half for x in indices]))
            specs.append((committed[i + 1], list(indices)))
        opened = merkle.open_many(specs)
        for i in range(len(committed) - 1):
            (ab_vals, ab_paths) = opened[2 * i]
            (c_vals, c_paths) = opened[2 * i + 1]
            self._push_round_queries(
                proof_stream, ab_vals, ab_paths, c_vals, c_paths,
                self.num_colinearity_tests,
            )

        return top_level_indices

    # -- verifier (host) -----------------------------------------------------

    def verify(
        self,
        proof_stream: ProofStream,
        polynomial_values: list[tuple[int, int]],
    ) -> None:
        """Raises ValueError on rejection (ref: fri.rs:250-416)."""
        p = self.field.order
        omega, offset = self.omega, self.offset
        num_rounds = self.num_rounds()

        roots, alphas = [], []
        for _ in range(num_rounds):
            roots.append(proof_stream.pull_root())
            alphas.append(
                self.field.sample(
                    proof_stream.fiat_shamir_verifier(PROOF_BYTES)
                ).value
            )

        last_codeword = list(proof_stream.pull_codeword())
        with self._stage("v_fri_last_root"):
            if merkle.commit_ints(last_codeword) != roots[-1]:
                raise ValueError("last codeword is not well formed")

        # low-degree check (ref: fri.rs:281-328)
        degree = len(last_codeword) // self.expansion_factor - 1
        last_omega, last_offset = omega, offset
        for _ in range(num_rounds - 1):
            last_omega = last_omega * last_omega % p
            last_offset = last_offset * last_offset % p

        if pow(last_omega, -1, p) != pow(last_omega, len(last_codeword) - 1, p):
            raise ValueError("omega does not have the right order")

        with self._stage("v_fri_lowdeg"):
            # one upload, one fused dispatch (iNTT -> scale -> degree ->
            # re-evaluation), one fetch of [1+n, 8]
            packed = _lowdeg_kernel(
                len(last_codeword), last_omega, last_offset, p
            )(L.ints_to_mont(last_codeword))
            packed_np = np.asarray(packed)
            d = int(packed_np[0, 0])
            poly_degree = d - (1 << 32) if d >= (1 << 31) else d
            if poly_degree < 0:
                # zero polynomial: the reference's degree() returns None
                raise ValueError("received none instead of polynomial degree")
            if poly_degree > degree:
                raise ValueError(
                    f"last codeword does not correspond to polynomial of low "
                    f"enough degree (it is {poly_degree} but should be "
                    f"<= {degree})"
                )
            reeval = [int(v) for v in L.limbs_to_ints(packed_np[1:])]
            if reeval != last_codeword:
                raise ValueError(
                    "re-evaluated codeword does not match original"
                )

        top_level_indices = self.sample_indices(
            proof_stream.fiat_shamir_verifier(PROOF_BYTES),
            self.domain_length >> 1,
            self.domain_length >> (num_rounds - 1),
            self.num_colinearity_tests,
        )

        for r in range(num_rounds - 1):
            indices_c = [
                i % (self.domain_length >> (r + 1)) for i in top_level_indices
            ]
            indices_a = list(indices_c)
            indices_b = [
                i + (self.domain_length >> (r + 1)) for i in indices_a
            ]

            with self._stage("v_fri_colinearity"):
                aa, bb, cc = [], [], []
                for s in range(self.num_colinearity_tests):
                    ay, by, cy = proof_stream.pull_leafs()
                    aa.append(ay)
                    bb.append(by)
                    cc.append(cy)
                    if r == 0:
                        polynomial_values.append((indices_a[s], ay))
                        polynomial_values.append((indices_b[s], by))
                    ax = offset * pow(omega, indices_a[s], p) % p
                    bx = offset * pow(omega, indices_b[s], p) % p
                    cx = alphas[r]
                    if not Polynomial.test_colinearity(
                        self.field, [(ax, ay), (bx, by), (cx, cy)]
                    ):
                        raise ValueError("colinearity check failure")

            with self._stage("v_fri_paths"):
                for i in range(self.num_colinearity_tests):
                    path = proof_stream.pull_path()
                    if not merkle.verify_int(
                        roots[r], indices_a[i], path, aa[i]
                    ):
                        raise ValueError(
                            "Merkle auth path verification failed for aa"
                        )
                    path = proof_stream.pull_path()
                    if not merkle.verify_int(
                        roots[r], indices_b[i], path, bb[i]
                    ):
                        raise ValueError(
                            "Merkle auth path verification failed for bb"
                        )
                    path = proof_stream.pull_path()
                    if not merkle.verify_int(
                        roots[r + 1], indices_c[i], path, cc[i]
                    ):
                        raise ValueError(
                            "Merkle auth path verification failed for cc"
                        )

            omega = omega * omega % p
            offset = offset * offset % p
