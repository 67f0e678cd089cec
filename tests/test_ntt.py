"""Device NTT parity with the reference golden vectors
(ref: /root/reference/src/fft/ntt.rs:77-130)."""

import random

from zk_stark_tpu.field import FIELD_PRIME, Field
from zk_stark_tpu.ops import limbs as L
from zk_stark_tpu.ops import ntt as N

F = Field()

INPUT_16 = [
    10350860596407318609598574026175964133, 60692809610834653822383343680910625982,
    223446197944610152228521360138425742723, 123599176902523769876954930401435714041,
    233214499950980668770362073427851594143, 197530481770421435151547222505733630031,
    6028204552208455457232478170590637777, 129106051215868132791440857107220454376,
    46875137253396986423834480299002499296, 40573479539486208028801437611599580111,
    177627388180112816822358878396956962568, 63754231379381382860231899477157171256,
    213977912421556511151382836938765186268, 247295448209556494808801789962732329479,
    198078312580458497833840274756537503682, 140348661180454074099943144751461445367,
]
VALUES_16 = [
    219013573292644897785762424283206192714, 28020178707455534238013018981848447223,
    125720672179066355667363683873634014638, 9544075888957995047526079628773702483,
    236214009288214032104373542256167121711, 203576991437594049347129945434757211067,
    161303837601531457486430204397030363075, 8066037348193233635957451882263404827,
    106698173671205255857026330656055139947, 205516443913240407551582667880265743260,
    132452175458644240344865798387130681692, 14403130148933356826258737037147692544,
    103258398926149853393925877736501914903, 241567637358481607032146874821122458208,
    184640833807669488035490783312852642403, 79102880510147994351196921219409543952,
]


def test_ntt_16_golden():
    root = F.primitive_nth_root(16).value
    got = list(L.mont_to_ints(N.ntt_mont(L.ints_to_mont(INPUT_16), root)))
    assert got == VALUES_16


def test_ntt_matches_evaluate_domain():
    # NTT == evaluate polynomial at root powers (ref: ntt.rs:98-104)
    root = F.primitive_nth_root(16)
    got = L.mont_to_ints(N.ntt_mont(L.ints_to_mont(INPUT_16), root.value))
    for i, g in enumerate(got):
        x = root**i
        acc = F(0)
        for c in reversed(INPUT_16):
            acc = acc * x + F(c)
        assert acc.value == g


def test_intt_16_golden():
    # (ref: ntt.rs:108-130)
    vals = [159, 179, 197, 143, 198, 82, 100, 153, 45, 158, 154, 238, 46, 121, 148, 200]
    coeffs = [
        2321, 46679697743149797158402415879589215379,
        85767599764045409871854383990500128680, 170048455543476672374689900824216177289,
        56517926799859326797837626323965682333, 150718635918560071455504820257610329093,
        149093701728889244918633279335367822666, 266977550113122771518657412035427200127,
        270497897142230380135924736767050120990, 63434915687244166391766073758524869310,
        261359683971832165794823307314869483630, 172866549451408128829178953127270691728,
        213979970342371053338087110443084438582, 83513730222590766426030683639871516493,
        44774808819693939686538502893362807298, 127752053889369146389468687545690486361,
    ]
    root = F.primitive_nth_root(16).value
    assert list(L.mont_to_ints(N.ntt_mont(L.ints_to_mont(vals), root))) == coeffs
    assert list(L.mont_to_ints(N.intt_mont(L.ints_to_mont(coeffs), root))) == vals


def test_roundtrip_1024():
    random.seed(7)
    n = 1024
    vals = [random.randrange(FIELD_PRIME) for _ in range(n)]
    root = F.primitive_nth_root(n).value
    y = N.ntt_mont(L.ints_to_mont(vals), root)
    back = list(L.mont_to_ints(N.intt_mont(y, root)))
    assert back == vals


def test_pad_to_pow2():
    # reference ntt pads inputs to the next power of two with zeros
    random.seed(8)
    vals = [random.randrange(FIELD_PRIME) for _ in range(10)]
    root = F.primitive_nth_root(16).value
    got = list(L.mont_to_ints(N.ntt_mont(L.ints_to_mont(vals), root)))
    want = list(L.mont_to_ints(N.ntt_mont(L.ints_to_mont(vals + [0] * 6), root)))
    assert got == want


def test_four_step_matches_flat():
    # the large-size path decomposes into a [R, C] matrix transform; force it
    # on a small size and compare against the flat kernel
    from zk_stark_tpu.ops import ntt as ntt_mod

    random.seed(9)
    n = 1 << 6
    vals = [random.randrange(FIELD_PRIME) for _ in range(n)]
    root = F.primitive_nth_root(n).value
    want = list(L.mont_to_ints(N.ntt_mont(L.ints_to_mont(vals), root)))

    kernel, r, c = ntt_mod._four_step_kernel(n)
    got_arr = kernel(
        L.ints_to_mont(vals),
        ntt_mod.powers_mont(pow(root, c, FIELD_PRIME), r // 2),
        ntt_mod._brev(r),
        ntt_mod.powers_mont(pow(root, r, FIELD_PRIME), c // 2),
        ntt_mod._brev(c),
        ntt_mod._twiddle_matrix(root, r, c),
    )
    assert list(L.mont_to_ints(got_arr)) == want


def test_powers_mont():
    base = 12345678901234567890
    n = 37
    got = list(L.mont_to_ints(N.powers_mont(base, n)))
    assert got == [pow(base, i, FIELD_PRIME) for i in range(n)]
    got = list(L.mont_to_ints(N.powers_mont(base, n, scale_int=7)))
    assert got == [7 * pow(base, i, FIELD_PRIME) % FIELD_PRIME for i in range(n)]
