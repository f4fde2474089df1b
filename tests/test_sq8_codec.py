"""SQ8 codec properties (no Spark needed) + the cross-engine tie contract:
encode = clamp(floor((x−lo)/s + 0.5), 0, 255) must agree bit-for-bit with
DuckDB's floor-based SQL — including values landing EXACTLY on a code
boundary, where np.round (half-to-even) would diverge from SQL round
(half-away-from-zero). That tie case is why the codec uses floor(x+0.5)."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from abstracts_search_spark.operators.ivf import sq8_decode, sq8_encode


def _quant(lo, hi):
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    return lo, (hi - lo) / 255.0


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    )
)
def test_roundtrip_error_bounded(xs):
    lo, s = _quant([-50.0] * 4, [50.0] * 4)
    m = np.array([xs], dtype=np.float64)
    codes = sq8_encode(m, lo, s)
    assert codes.dtype == np.uint8
    recon = sq8_decode(codes, lo, s)
    # half-a-step quantization bound (plus float slack)
    assert np.abs(recon - m).max() <= s.max() / 2 + 1e-9


def test_out_of_range_clamps():
    lo, s = _quant([0.0], [1.0])
    codes = sq8_encode(np.array([[-5.0], [9.0]]), lo, s)
    assert codes[0, 0] == 0 and codes[1, 0] == 255


def test_zero_range_dimension():
    lo, s = _quant([3.0], [3.0])  # constant dim: scale 0
    codes = sq8_encode(np.array([[3.0]]), lo, s)
    assert codes[0, 0] == 0
    assert sq8_decode(codes, lo, s)[0, 0] == 3.0


def test_tie_values_match_duckdb_floor_sql():
    """Values exactly half-way between codes: numpy floor(v+0.5) and DuckDB
    floor(v+0.5) must pick the SAME code for every tie — the case where
    round() semantics differ between engines."""
    lo, s = _quant([0.0], [255.0])  # scale exactly 1.0: x = k + 0.5 are ties
    ties = np.array([[k + 0.5] for k in range(0, 255, 7)] + [[17.0], [204.25]])
    codes = sq8_encode(ties, lo, s)

    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT CAST(least(greatest(floor((x - 0.0) / 1.0 + 0.5), 0.0), 255.0) AS INTEGER)
        FROM (SELECT unnest(?::DOUBLE[]) AS x)
        """,
        [list(ties[:, 0])],
    ).fetchall()
    duck_codes = [r[0] for r in rows]
    assert [int(c) for c in codes[:, 0]] == duck_codes
    # and each tie rounded HALF-UP (k+0.5 -> k+1), the documented behavior
    assert int(codes[0, 0]) == 1


def test_encode_is_deterministic_pure():
    rng = np.random.default_rng(11)
    m = rng.standard_normal((32, 8))
    lo, s = _quant(m.min(axis=0), m.max(axis=0))
    a = sq8_encode(m, lo, s)
    b = sq8_encode(m.copy(), lo, s)
    assert np.array_equal(a, b)
