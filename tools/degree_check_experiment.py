"""Empirical experiment: does the reference's prover degree check
(stark.rs:451-464) reject a perturbed trace?

Reproduces the reference's exact pipeline on the host with Python ints:
trace -> fast_interpolate (exact Lagrange; interpolation is unique) ->
symbolic composition -> fast_coset_divide semantics (pointwise divide on
the generator coset of size omicron_domain_length, interpolate, truncate to
lhs_deg - rhs_deg + 1 coefficients) -> degree vs transition_quotient bound.
"""
import random
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from zk_stark_tpu.field import Field
from zk_stark_tpu.models.rescue_prime import RescuePrime
from zk_stark_tpu.poly import Polynomial

F = Field()
p = F.order

rp = RescuePrime(F, 2, 1, 2, 27)
# reference test config: Stark(F, 4, 2, 2, m, N+1, 2)
expansion = 4
num_checks = 2
num_registers = rp.m
num_cycles = rp.N + 1  # 28
num_randomizers = 4 * num_checks  # 8
tc_degree = 2

randomized_trace_length = num_cycles + num_randomizers  # 36
from zk_stark_tpu.utils.bits import bit_count
odl = 1 << bit_count(randomized_trace_length * tc_degree)  # 128
omicron = F.primitive_nth_root(odl).value
g = F.generator().value

air = rp.transition_constraints(omicron, odl)
# air may be an AIR object; get the MPolynomial list
try:
    mps = list(air)
except TypeError:
    mps = air.constraints

# degree bounds (stark.rs:116-160)
point_degrees = [1] + [randomized_trace_length - 1] * (2 * num_registers)
def deg_bound(mp):
    mx = 0
    for k in mp.dictionary:
        s = 0
        for pd, e in zip(point_degrees, k):
            s += pd * e
        mx = max(mx, s)
    return mx

tdb = [deg_bound(mp) for mp in mps]
tq_bounds = [d - (num_cycles - 1) for d in tdb]
print("tdb:", tdb, "tq_bounds:", tq_bounds)

def coset_divide_ref(lhs: Polynomial, rhs: Polynomial, order: int):
    """Reference fast_coset_divide semantics (ntt_arithmetics.rs:239-310)."""
    if lhs.is_zero():
        return Polynomial.zero(F)
    ld, rd = lhs.degree(), rhs.degree()
    assert ld >= rd
    degree = max(ld, rd)
    result_len = ld - rd + 1
    root = pow(omicron, 1, p)
    o = order
    while degree < o // 2:
        root = root * root % p
        o //= 2
    # evaluate on coset g * root^i, i < o
    xs = []
    cur = g % p
    for _ in range(o):
        xs.append(cur)
        cur = cur * root % p
    lv = [lhs.evaluate(x) for x in xs]
    rv = [rhs.evaluate(x) for x in xs]
    qv = [l * pow(r, -1, p) % p for l, r in zip(lv, rv)]
    # interpolate exactly on the o points (unique degree < o polynomial)
    q = Polynomial.interpolate_domain(F, xs, qv)
    coeffs = (q.coeffs + [0] * o)[:result_len]
    return Polynomial(F, coeffs)

def run_trial(seed: int, perturb: bool):
    random.seed(seed)
    inp = F.sample(seed.to_bytes(4, "big")).value
    output = rp.hash(inp)
    trace = rp.trace(inp)
    if perturb:
        cycle = random.randrange(len(trace))
        register = random.randrange(rp.m)
        err = F.sample(random.randbytes(17)).value
        trace[cycle][register] = (trace[cycle][register] + err) % p
    # randomizers
    for _ in range(num_randomizers):
        trace.append([F.sample(random.randbytes(17)).value
                      for _ in range(num_registers)])
    domain = [pow(omicron, i, p) for i in range(len(trace))]
    tps = [
        Polynomial.interpolate_domain(F, domain, [row[s] for row in trace])
        for s in range(num_registers)
    ]
    point = [Polynomial.x(F)] + tps + [tp.scale(omicron) for tp in tps]
    tz_domain = domain[: num_cycles - 1]
    tz = Polynomial.zerofier_domain(F, tz_domain)
    degs = []
    for mp in mps:
        tp = mp.evaluate_symbolic(point)
        q = coset_divide_ref(tp, tz, odl)
        degs.append(q.degree())
    return degs

for seed in range(4):
    honest = run_trial(seed, False)
    bad = run_trial(seed, True)
    print(
        f"seed {seed}: honest degs {honest} "
        f"{'==' if honest == tq_bounds else '!='} bounds; "
        f"perturbed degs {bad} "
        f"{'== bounds -> CHECK PASSES (prove succeeds)' if bad == tq_bounds else '!= bounds -> PROVE REJECTS'}"
    )
