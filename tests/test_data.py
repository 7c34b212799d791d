"""Data-layer tests: parsers, .dat interchange, dataset layouts."""

import numpy as np
import pytest

from topk_rec_tpu.data import (
    Interactions,
    load_id_map,
    load_inverse_id_map,
    parse_ratings,
    read_dat,
    synthetic_interactions,
    write_dat,
)


@pytest.fixture()
def fold_files(tmp_path):
    (tmp_path / "uid").write_text("10\n20\n30\n")
    (tmp_path / "vid").write_text("a\nb\nc\nd\n")
    # user 10: likes a, dislikes b; user 20: likes d; user 30 absent;
    # unknown user 99 and unknown item z must be ignored.
    (tmp_path / "f0tr.txt").write_text(
        "10,a:1,b:0\n20,d:1,z:1\n99,a:1\n"
    )
    return tmp_path


def test_id_maps(fold_files):
    uids = load_id_map(str(fold_files / "uid"))
    assert uids == {"10": 0, "20": 1, "30": 2}
    ivt = load_inverse_id_map(str(fold_files / "vid"))
    assert ivt == {0: "a", 1: "b", 2: "c", 3: "d"}


def test_parse_ratings(fold_files):
    uids = load_id_map(str(fold_files / "uid"))
    iids = load_id_map(str(fold_files / "vid"))
    pos_u, pos_i, seen_u, seen_i = parse_ratings(
        str(fold_files / "f0tr.txt"), uids, iids
    )
    assert list(zip(pos_u, pos_i)) == [(0, 0), (1, 3)]
    assert list(zip(seen_u, seen_i)) == [(0, 0), (0, 1), (1, 3)]


def test_dat_roundtrip(tmp_path):
    mat = np.array([[1.5, -2.25], [0.0, 3.125]], dtype=np.float32)
    path = tmp_path / "m" / "final-U.dat"
    write_dat(str(path), mat)
    # Byte format parity with reference export_embed_to_file (utils.py:47-55):
    # "%f"-formatted values, space separated, trailing space before newline.
    assert path.read_text() == "1.500000 -2.250000 \n0.000000 3.125000 \n"
    back = read_dat(str(path))
    np.testing.assert_array_equal(back, mat)


def test_dat_vector_written_as_column(tmp_path):
    path = tmp_path / "final-B.dat"
    write_dat(str(path), np.array([1.0, 2.0], dtype=np.float32))
    assert read_dat(str(path)).shape == (2, 1)


def test_interactions_layouts(tiny_inter: Interactions):
    indptr, items = tiny_inter.user_csr
    assert list(indptr) == [0, 2, 5, 6, 6]
    assert sorted(items[0:2]) == [0, 2]
    assert sorted(items[2:5]) == [1, 3, 5]
    assert list(tiny_inter.user_deg) == [2, 3, 1, 0]
    assert list(tiny_inter.rated_users) == [0, 1, 2]
    # item CSR inverse relationship
    iptr, users = tiny_inter.item_csr
    assert list(np.diff(iptr)) == [1, 1, 2, 1, 0, 1]
    assert sorted(users[iptr[2]:iptr[3]]) == [0, 2]
    assert list(tiny_inter.rated_items) == [0, 1, 2, 3, 5]


def test_bitmaps(tiny_inter: Interactions):
    bm = tiny_inter.pos_bitmap
    assert bm.shape == (4, 1)
    for u in range(4):
        for i in range(6):
            expected = (u, i) in set(zip(tiny_inter.pos_u, tiny_inter.pos_i))
            assert bool((bm[u, i >> 5] >> (i & 31)) & 1) == expected
    sbm = tiny_inter.seen_bitmap
    assert bool((sbm[0, 0] >> 4) & 1)  # browsed-but-disliked item 4
    assert not bool((bm[0, 0] >> 4) & 1)


def test_synthetic_properties():
    inter = synthetic_interactions(50, 40, 300, seed=3)
    assert inter.nnz == 300
    pairs = set(zip(inter.pos_u, inter.pos_i))
    assert len(pairs) == 300  # no duplicate positives
    assert inter.pos_u.max() < 50 and inter.pos_i.max() < 40
    # determinism
    inter2 = synthetic_interactions(50, 40, 300, seed=3)
    np.testing.assert_array_equal(inter.pos_u, inter2.pos_u)


def test_interactions_from_files(fold_files):
    inter, uids, iids = Interactions.from_files(
        str(fold_files / "uid"), str(fold_files / "vid"),
        str(fold_files / "f0tr.txt"),
    )
    assert inter.n_users == 3 and inter.n_items == 4
    assert inter.nnz == 2
    assert list(inter.seen_u) == [0, 0, 1]


def test_mfp_roundtrip(tmp_path):
    from topk_rec_tpu.data.io import read_mfp, write_mfp

    indptr = np.array([0, 2, 2, 5], dtype=np.int32)
    flat = np.array([3, 1, 0, 2, 4], dtype=np.int32)
    p = tmp_path / "users.mfp"
    write_mfp(str(p), indptr, flat)
    assert p.read_text() == "2 3 1\n0\n3 0 2 4\n"
    back_indptr, back_flat = read_mfp(str(p))
    np.testing.assert_array_equal(back_indptr, indptr)
    np.testing.assert_array_equal(back_flat, flat)
