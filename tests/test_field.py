"""Host field parity tests.

Golden vectors lifted from the reference test suite
(ref: /root/reference/src/field/field.rs:172-257 and
 /root/reference/src/field/field_element.rs:145-299).
"""

from zk_stark_tpu.field import FIELD_PRIME, Field


F = Field()


def test_prime_value():
    assert FIELD_PRIME == 270497897142230380135924736767050121217


def test_mul():
    assert (F(2) * F(3)).value == 6
    assert (F(FIELD_PRIME) * F(3)).value == 0
    assert (F(FIELD_PRIME - 1) * F(3)).value == FIELD_PRIME - 3
    assert (
        F(49789714223038013592473676705012096123)
        * F(6534789852937546098347957826345234)
    ).value == 105250150227149389100670877502232671566


def test_div():
    assert (
        F(74658620945386735627456854792784352353)
        / F(85408008396924667383611388730472331217)
    ).value == 120557879365253444230411244907275635216
    assert (F(12) / F(4)).value == 3
    assert (
        F(270497897142230380135924736767050121215) / F(5)
    ).value == 54099579428446076027184947353410024243
    assert (
        F(5012096123) / F(6534789852937546098347957826345234)
    ).value == 109071144973379706934869779239844248849
    # non-prime modulus quirk (ref: field_element.rs:192-198)
    f8 = Field(8)
    assert (f8(2) / f8(7)).value == 6


def test_inverse():
    assert F(256).inverse().value == 269441264731518542713518780764053831681
    for v in (8, 270497897142230380135924736767050121215):
        assert (F(v) * F(v).inverse()).value == 1
    assert F(0).inverse().value == 0  # reference convention (field.rs:160-169)


def test_add_sub_neg():
    assert (
        F(270497897142230380135924736767050120961) + F(300)
    ).value == 44
    assert (F(44) - F(200)).value == 270497897142230380135924736767050121061
    assert (-F(6534789852937546098)).value == 270497897142230380129389946914112575119
    assert (-F(256)).value == 270497897142230380135924736767050120961
    f100 = Field(100)
    assert (f100(20) + (-f100(19))).value == 1
    assert (f100(80) + f100(21)).value == 1


def test_pow():
    assert (
        F(6534789852937546098) ** 501209126122
    ).value == 256557788041265930815463337858691703671
    assert (F(15) ** 4).value == 50625
    assert (
        F(270497897142230380135) ** 8
    ).value == 79016866124691016201920330826259043252
    # ^ operator alias used throughout the reference
    assert (F(15) ^ 4) == F(15) ** 4


def test_primitive_nth_root():
    assert (
        F.primitive_nth_root(256).value
        == 178902808384765167578311106676137348214
    )
    assert (
        F.primitive_nth_root(2).value
        == 270497897142230380135924736767050121216
    )
    z = F.primitive_nth_root(256)
    assert (z ** 256).value == 1
    assert (z ** 128).value != 1


def test_generator():
    g = F.generator()
    assert g.value == 85408008396924667383611388730472331217
    assert F.smallest_generator().value == 3  # alpha for Rescue-Prime


def test_sample():
    # (ref: field/field.rs:219-241)
    assert F.sample(bytes.fromhex("6c9c4992")).value == 1822181778
    assert F.sample(bytes.fromhex("ac4cd3be")).value == 2890716094
    # only the last 16 bytes matter (128-bit overflowing fold)
    long = bytes(range(40))
    assert F.sample(long) == F.sample(long[-16:])


def test_neg_mod_golden():
    assert (-F(256)).value == 270497897142230380135924736767050120961
    f100 = Field(100)
    assert (f100(20) + (-f100(20))).value == 0
    assert (f100(20) + (-f100(19))).value == 1
