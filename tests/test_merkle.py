"""Merkle commitment golden vectors (ref: merkle_root.rs:106-244)."""

from zk_stark_tpu import merkle

ROOT4 = bytes.fromhex(
    "b36f5edab7ea2100fc298d9811bf1a745745282e80243e3a919e71ef6c30f690"
    "606b445557ad7843d3251c8e92b83b584d94b738334ffa7d88babd6e47471ac5"
)


def test_commit_one():
    assert merkle.commit_ints([11]).hex() == (
        "7aa7e388f8145d395ac616bb526eaa35b10069f49e2b36d7327157d1d4af360d"
        "fbbfea805aa7e405ed025ce5eadd56c27c40b92991727a5a16b51df5604ad006"
    )
    assert merkle.commit_ints([5462]).hex() == (
        "1f069c52b4f26c7714dbd9babacbff542d1333190e3246dec47ee9f30bb64904"
        "6406f3e0ae8f4cafd52bc1a1305061b451a8746ad3ad240c2524a82a3fcd28c0"
    )


def test_commit_two():
    assert merkle.commit_ints([5462, 456]).hex() == (
        "e79bb3f920912c56d27de11b3aaedf523d75877d7ec34d7b5819142ba69ce421"
        "e665b176fbbbd7b81e90dce61b1f629830eec87c3f7d0644c412af12f47548fe"
    )
    assert merkle.commit_ints([652, 23409]).hex() == (
        "9b70e42c4b3aea3efddaeda6c1883b38c8969e40ca17566d612156c0457961e7"
        "c30d811e2adefd941da7b5329d24ecf015dcffb3e39e379dc988564d588a2341"
    )


def test_commit_four_open_verify():
    leaves = [5462, 456, 652, 23409]
    assert merkle.commit_ints(leaves) == ROOT4
    path = merkle.open_ints(1, leaves)
    assert [e.hex()[:8] for e in path] == ["1f069c52", "9b70e42c"]
    assert merkle.verify_int(ROOT4, 1, path, 456)
    assert not merkle.verify_int(ROOT4, 1, path, 5462)
    assert not merkle.verify_int(ROOT4, 0, path, 456)


def test_tree_open_all_indices():
    leaves = list(range(16))
    tree = merkle.MerkleTree.from_ints(leaves)
    for i, v in enumerate(leaves):
        assert merkle.verify_int(tree.root, i, tree.open(i), v)
        assert not merkle.verify_int(tree.root, i, tree.open(i), v + 1)
