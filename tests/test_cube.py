import numpy as np
import pytest

from lut_renderer_tpu.colorcore import (
    Lut3D,
    parse_cube,
    parse_cube_file,
    write_cube_file,
)
from lut_renderer_tpu.colorcore.cube import CubeParseError


def _cube_text_from_table(n, fn, title="t"):
    """Build .cube text where entry for (r,g,b) indices = fn(ri, gi, bi).
    Red index varies fastest per the .cube spec."""
    lines = [f'TITLE "{title}"', f"LUT_3D_SIZE {n}"]
    for bi in range(n):
        for gi in range(n):
            for ri in range(n):
                r, g, b = fn(ri, gi, bi)
                lines.append(f"{r:.6f} {g:.6f} {b:.6f}")
    return "\n".join(lines) + "\n"


def test_parse_identity_layout():
    n = 5
    text = _cube_text_from_table(
        n, lambda ri, gi, bi: (ri / (n - 1), gi / (n - 1), bi / (n - 1))
    )
    lut = parse_cube(text)
    assert lut.size == n
    assert lut.title == "t"
    # table[r, g, b] indexing: red along axis 0.
    np.testing.assert_allclose(lut.table[4, 0, 0], [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(lut.table[0, 4, 0], [0.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(lut.table[0, 0, 4], [0.0, 0.0, 1.0], atol=1e-6)
    ident = Lut3D.identity(n)
    np.testing.assert_allclose(lut.table, ident.table, atol=1e-6)


def test_parse_comments_domain_and_blank_lines():
    text = (
        "# a comment\n\n"
        "LUT_3D_SIZE 2\n"
        "DOMAIN_MIN 0.0 0.0 0.0\n"
        "DOMAIN_MAX 2.0 2.0 2.0\n"
        "0 0 0\n1 0 0\n0 1 0\n1 1 0\n0 0 1\n1 0 1\n0 1 1\n1 1 1\n"
    )
    lut = parse_cube(text)
    assert lut.size == 2
    assert not lut.has_unit_domain
    np.testing.assert_allclose(lut.domain_max, [2.0, 2.0, 2.0])


def test_parse_errors():
    with pytest.raises(CubeParseError):
        parse_cube("0 0 0\n")  # no size
    with pytest.raises(CubeParseError):
        parse_cube("LUT_1D_SIZE 4\n0\n0\n0\n0\n")
    with pytest.raises(CubeParseError):
        parse_cube("LUT_3D_SIZE 2\n0 0 0\n")  # wrong count
    with pytest.raises(CubeParseError):
        parse_cube("LUT_3D_SIZE 1000\n")


def test_roundtrip_file(tmp_path, random_lut):
    path = write_cube_file(tmp_path / "x.cube", random_lut)
    lut2 = parse_cube_file(path)
    assert lut2.size == random_lut.size
    np.testing.assert_allclose(lut2.table, random_lut.table, atol=1e-5)


def test_identity_helper():
    lut = Lut3D.identity(3)
    np.testing.assert_allclose(lut.table[2, 2, 2], [1, 1, 1])
    np.testing.assert_allclose(lut.table[1, 0, 2], [0.5, 0.0, 1.0])


def test_parse_degenerate_domain_rejected():
    text = (
        "LUT_3D_SIZE 2\n"
        "DOMAIN_MIN 0.0 0.5 0.0\n"
        "DOMAIN_MAX 1.0 0.5 1.0\n"  # zero span on green
        "0 0 0\n1 0 0\n0 1 0\n1 1 0\n0 0 1\n1 0 1\n0 1 1\n1 1 1\n"
    )
    with pytest.raises(CubeParseError):
        parse_cube(text)


def test_parse_file_keeps_title_on_native_path(tmp_path):
    lut = Lut3D.identity(3)
    lut.title = "My Look v2"
    path = write_cube_file(tmp_path / "titled.cube", lut)
    parsed = parse_cube_file(path)  # native fast path when available
    assert parsed.title == "My Look v2"


def test_parse_cube_fuzz_never_crashes(rng):
    """Garbage inputs must raise CubeParseError (or parse), never crash with
    an unrelated exception — the parser fronts untrusted user files."""
    corpora = [
        "",
        "\x00\x01\x02",
        "LUT_3D_SIZE\n",
        "LUT_3D_SIZE -5\n",
        "LUT_3D_SIZE 2\nTITLE\n0 0 0\n" * 3,
        "LUT_3D_SIZE 2\nDOMAIN_MIN 0 0\n" + "0 0 0\n" * 8,
        "LUT_3D_SIZE 2\n" + "nan nan nan\n" * 8,
        "LUT_3D_SIZE 2\n" + "1e400 0 0\n" * 8,
        "DOMAIN_MAX a b c\nLUT_3D_SIZE 2\n" + "0 0 0\n" * 8,
        "LUT_3D_SIZE 2\n" + "0 0\n" * 8,          # short rows
        "TITLE \"x\"\nLUT_3D_SIZE 3\n" + "0 0 0\n" * 5,  # wrong count
    ]
    # plus random byte soup
    for seed in range(8):
        r = np.random.default_rng(seed)
        corpora.append(bytes(r.integers(32, 127, 200, dtype=np.uint8))
                       .decode("ascii"))
    for text in corpora:
        try:
            parse_cube(text)
        except CubeParseError:
            pass  # the contract
