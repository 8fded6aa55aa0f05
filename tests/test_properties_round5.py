"""Property-based tests (hypothesis) for the round-5 portable
expression builders: evaluated in DuckDB (the oracle engine) against
independent pure-Python references, for ARBITRARY inputs — the
test_properties.py discipline applied to the fusion/TransE/winnowing
formulas."""

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from deepref_spark import portable

CON = duckdb.connect()


def _duck1(expr: str):
    return CON.sql(f"SELECT {expr} AS v").fetchall()[0][0]


def _md5_slice_mod_py(s: str, offset: int, m: int) -> int:
    h = hashlib.md5(s.encode()).hexdigest()
    return (ord(h[offset]) * 131071 + ord(h[offset + 1]) * 8191
            + ord(h[offset + 2]) * 127 + ord(h[offset + 3])) % m


PPM = st.integers(min_value=0, max_value=999_999)


@settings(max_examples=60, deadline=None)
@given(st.lists(PPM, min_size=1, max_size=5))
def test_noisy_or_matches_python_fold_and_bounds(ps):
    expr = portable.noisy_or_ppm_expr([str(p) for p in ps], portable.DUCK)
    got = _duck1(expr)
    acc = 1_000_000 - ps[0]
    for p in ps[1:]:
        acc = (acc * (1_000_000 - p)) // 1_000_000
    assert got == 1_000_000 - acc
    # belief never drops below the strongest extractor; it CAN reach
    # exactly 1e6 when the complement product floors to 0 on the grid
    assert max(ps) <= got <= 1_000_000


@settings(max_examples=40, deadline=None)
@given(st.lists(PPM, min_size=2, max_size=4), PPM)
def test_noisy_or_monotone_in_each_input(ps, bump):
    base = _duck1(portable.noisy_or_ppm_expr([str(p) for p in ps], portable.DUCK))
    for i in range(len(ps)):
        raised = list(ps)
        raised[i] = min(999_999, raised[i] + bump)
        got = _duck1(portable.noisy_or_ppm_expr(
            [str(p) for p in raised], portable.DUCK))
        assert got >= base  # more evidence never lowers fused belief


NAME = st.text(alphabet="abcdefgh|:/ ", min_size=1, max_size=12)


@settings(max_examples=40, deadline=None)
@given(NAME, NAME, NAME)
def test_transe_energy_duckdb_matches_python(s, p, o):
    expr = portable.transe_energy_expr("hh", "rh", "th")
    got = CON.sql(
        "SELECT " + expr + " AS v FROM (SELECT md5('e|' || $1) AS hh, "
        "md5('r|' || $2) AS rh, md5('e|' || $3) AS th)",
        params=[s, p, o],
    ).fetchall()[0][0]
    expect = sum(
        abs(_md5_slice_mod_py(f"e|{s}", 4 * j, 1000)
            + _md5_slice_mod_py(f"r|{p}", 4 * j, 1000)
            - _md5_slice_mod_py(f"e|{o}", 4 * j, 1000))
        for j in range(8)
    )
    assert got == expect
    assert 0 <= got <= 8 * 2 * 999  # per-dim |h + r - t| bound


def _winnow_py(hv: list[int], w: int) -> set:
    """Pure-Python robust winnowing reference: per window, min value,
    rightmost position on ties."""
    out = set()
    n = len(hv)
    for i in range(max(1, n - w + 1)):
        win = hv[i:i + w]
        m = min(win)
        j = len(win) - 1 - win[::-1].index(m)  # rightmost min
        out.add((i + j + 1, m))  # 1-based global position
    return out


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 7), min_size=1, max_size=24),
       st.integers(2, 5))
def test_winnow_selection_matches_python_reference(vals, w):
    # small value alphabet forces frequent ties -> exercises the
    # rightmost rule; evaluate the oracle's list expression in DuckDB
    hv = "[" + ", ".join(str(v) for v in vals) + "]"
    sl = f"list_slice(hv, i, i + {w - 1})"
    got = set(CON.sql(f"""
      WITH sel AS (
        SELECT unnest(list_transform(
          generate_series(1, greatest(1, len(hv) - {w - 1})), i ->
          struct_pack(
            fp := list_min({sl}),
            pos := i + len({sl})
                   - list_position(list_reverse({sl}), list_min({sl}))
          ))) AS s
        FROM (SELECT {hv} AS hv)
      )
      SELECT DISTINCT s.pos, s.fp FROM sel
    """).fetchall())
    assert got == _winnow_py(vals, w)


@settings(max_examples=40, deadline=None)
@given(st.integers(-10**12, 10**12), st.integers(1, 10**6))
def test_idiv_truncates_toward_zero_in_duckdb(a, b):
    # BOTH engines truncate toward zero on negatives (Spark `div` has
    # Java integral-divide semantics; DuckDB `//` matches) — NOT
    # Python's floor. Repo grids divide non-negative quantities only,
    # where trunc == floor; this pins the actual cross-engine contract.
    got = _duck1(portable.idiv(str(a), str(b), portable.DUCK))
    import math
    assert got == math.trunc(a / b) if abs(a) < 2**52 else True
    assert got == (abs(a) // b) * (1 if a >= 0 else -1)
