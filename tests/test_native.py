"""Native C++ runtime tests: built lib == Python spec == device ALS."""

import subprocess
import sys

import numpy as np
import pytest

from topk_rec_tpu.native import als_native, io_native

needs_native = pytest.mark.skipif(
    not io_native.available(),
    reason="libtkr_native.so not built (make -C topk_rec_tpu/native)",
)


@needs_native
def test_native_parse_matches_python(tmp_path):
    # build reference-format fold with unknown ids and dislikes
    (tmp_path / "uid").write_text("10\n20\n30\n")
    (tmp_path / "vid").write_text("a\nb\nc\nd\n")
    content = "10,a:1,b:0,z:1\n99,a:1\n20,d:1\n30\n20,c:0\n"
    (tmp_path / "tr.txt").write_text(content)
    from topk_rec_tpu.data.io import load_id_map

    uids = load_id_map(str(tmp_path / "uid"))
    iids = load_id_map(str(tmp_path / "vid"))
    got = io_native.parse_ratings(str(tmp_path / "tr.txt"), uids, iids)
    # pure-python spec (force fallback by calling the internal impl)
    import topk_rec_tpu.data.io as dio

    old = dio._NATIVE, dio._NATIVE_CHECKED
    dio._NATIVE, dio._NATIVE_CHECKED = None, True
    try:
        want = dio.parse_ratings(str(tmp_path / "tr.txt"), uids, iids)
    finally:
        dio._NATIVE, dio._NATIVE_CHECKED = old
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@needs_native
def test_native_write_dat_byte_compatible(tmp_path):
    mat = np.array([[1.5, -2.25], [0.0, 3.125]], dtype=np.float32)
    p = tmp_path / "out.dat"
    assert io_native.write_dat(str(p), mat)
    assert p.read_text() == "1.500000 -2.250000 \n0.000000 3.125000 \n"


@needs_native
def test_native_als_matches_device(small_inter):
    import jax.numpy as jnp

    from topk_rec_tpu.ops.als import weighted_als_user_update

    rng = np.random.default_rng(0)
    k = 6
    U = rng.normal(size=(small_inter.n_users, k)).astype(np.float32)
    V = rng.normal(size=(small_inter.n_items, k)).astype(np.float32)
    indptr, flat = small_inter.user_csr
    native = als_native.als_half_sweep(
        U, V, indptr, flat, small_inter.rated_items, 1.0, 0.01, 0.05
    )
    device = weighted_als_user_update(
        U, V, small_inter, 1.0, 0.01, 0.05, block_size=32
    )
    np.testing.assert_allclose(native, device, rtol=3e-3, atol=3e-4)


@needs_native
def test_native_als_prior(small_inter):
    import jax.numpy as jnp

    from topk_rec_tpu.ops.als import ALSPlan, half_sweep

    rng = np.random.default_rng(1)
    k = 5
    U = rng.normal(size=(small_inter.n_users, k)).astype(np.float32)
    V = rng.normal(size=(small_inter.n_items, k)).astype(np.float32)
    prior = rng.normal(size=(small_inter.n_items, k)).astype(np.float32)
    indptr, flat = small_inter.item_csr
    native = als_native.als_half_sweep(
        V, U, indptr, flat, small_inter.rated_users, 1.0, 0.01, 10.0,
        prior=prior,
    )
    plan = ALSPlan(indptr, flat, small_inter.n_items, block_size=64)
    device, _ = half_sweep(
        plan, V, U, jnp.asarray(small_inter.rated_users), 1.0, 0.01, 10.0,
        prior=prior,
    )
    np.testing.assert_allclose(native, device, rtol=3e-3, atol=3e-4)


def test_build_from_clean(tmp_path):
    """The library builds with plain make (toolchain sanity)."""
    rc = subprocess.run(
        ["make", "-C", "topk_rec_tpu/native", "-n"],
        capture_output=True, text=True,
    )
    assert rc.returncode == 0


def test_native_parse_dat_matches_python(tmp_path):
    """Native .dat parse is BITWISE-identical to the Python spec path
    (numpy float32 parse), including the strtof fallback for exponent
    tokens, and raises on non-numeric garbage."""
    import pytest

    from topk_rec_tpu.data.io import read_dat, write_dat
    from topk_rec_tpu.native import io_native

    if not io_native.available():
        pytest.skip("native lib not built")

    rng = np.random.default_rng(3)
    mat = rng.normal(scale=10.0, size=(37, 9)).astype(np.float32)
    p = str(tmp_path / "m.dat")
    write_dat(p, mat)
    got = read_dat(p)
    with open(p) as f:
        ref = np.array(f.read().split(), dtype=np.float32).reshape(37, 9)
    np.testing.assert_array_equal(
        got.view(np.int32), ref.view(np.int32)
    )

    # exponent / special tokens route through strtof, same values
    p2 = str(tmp_path / "e.dat")
    with open(p2, "w") as f:
        f.write("1e-3 -2.5E2 \n0.125 +4 \n")
    got2 = read_dat(p2)
    np.testing.assert_array_equal(
        got2, np.array([[1e-3, -2.5e2], [0.125, 4.0]], np.float32)
    )

    # non-numeric -> ValueError("malformed")
    p3 = str(tmp_path / "bad.dat")
    with open(p3, "w") as f:
        f.write("1.0 abc \n")
    with pytest.raises(ValueError, match="malformed"):
        read_dat(p3)

    # ragged rows -> rectangularity error (shared validation)
    p4 = str(tmp_path / "ragged.dat")
    with open(p4, "w") as f:
        f.write("1.0 2.0 \n3.0 \n")
    with pytest.raises(ValueError, match="malformed"):
        read_dat(p4)


def test_native_parse_dat_blank_line_parity(tmp_path):
    """Blank-line row accounting must match the Python spec path exactly
    (interior/leading blanks fail rectangularity IDENTICALLY whether or
    not the .so is built; trailing blanks and a missing final newline
    parse identically)."""
    import pytest

    import topk_rec_tpu.data.io as io_mod
    from topk_rec_tpu.data.io import read_dat
    from topk_rec_tpu.native import io_native

    if not io_native.available():
        pytest.skip("native lib not built")

    cases = {
        "interior_blank": "1.0 2.0\n\n3.0 4.0\n",
        "leading_blank": "\n1.0 2.0\n",
        "trailing_blanks": "1.0 2.0 \n3.0 4.0 \n\n\n",
        "no_final_newline": "1.0 2.0 \n3.0 4.0",
    }
    for name, content in cases.items():
        p = str(tmp_path / f"{name}.dat")
        with open(p, "w") as f:
            f.write(content)

        def attempt(use_native):
            orig = io_mod._native_lib
            if not use_native:
                io_mod._native_lib = lambda: None
            try:
                return ("ok", read_dat(p).tolist())
            except ValueError:
                return ("err",)
            finally:
                io_mod._native_lib = orig

        assert attempt(True) == attempt(False), name


def test_native_parse_dat_partial_token_rejected(tmp_path):
    """Corrupt tokens that strtof would partially consume ('0.5.5',
    '1-2') must raise like the Python spec path, not silently split
    into fabricated values."""
    import pytest

    from topk_rec_tpu.data.io import read_dat
    from topk_rec_tpu.native import io_native

    if not io_native.available():
        pytest.skip("native lib not built")
    for bad in ("0.5.5 1.0 \n", "1-2 3.0 \n", "1.0 2.0x \n"):
        p = str(tmp_path / "bad.dat")
        with open(p, "w") as f:
            f.write(bad)
        with pytest.raises(ValueError, match="malformed"):
            read_dat(p)


def test_native_parse_dat_hex_and_cr_parity(tmp_path):
    """Hex tokens are rejected like the Python path; a lone '\\r' is a
    line break (splitlines semantics), not whitespace."""
    import pytest

    import topk_rec_tpu.data.io as io_mod
    from topk_rec_tpu.data.io import read_dat
    from topk_rec_tpu.native import io_native

    if not io_native.available():
        pytest.skip("native lib not built")

    p1 = str(tmp_path / "hex.dat")
    with open(p1, "w") as f:
        f.write("0x10 1.0 \n")
    with pytest.raises(ValueError, match="malformed"):
        read_dat(p1)

    p2 = str(tmp_path / "cr.dat")
    with open(p2, "wb") as f:
        f.write(b"1 2\r3 4\r")
    native = read_dat(p2)
    orig = io_mod._native_lib
    io_mod._native_lib = lambda: None
    try:
        python = read_dat(p2)
    finally:
        io_mod._native_lib = orig
    np.testing.assert_array_equal(native, python)
    assert native.shape == (2, 2)
