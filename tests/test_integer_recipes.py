"""Property tests for the exact-integer machinery the oracle parity rests
on: the cents conversion's no-ambiguity assumption, the pure-BIGINT
quality_e4 rational recipe, and the completeness of the neighbor-union
bucket blocking used by the fuzzy-match and interval-overlap joins.

Pure-Python properties (no Spark session) — they pin the MATH the plans
and oracles share, so a future refactor that bends a recipe fails here in
milliseconds instead of as a cross-engine hash flip.
"""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


# --- cents conversion ------------------------------------------------------


@given(
    st.decimals(
        min_value=Decimal("-10000000.00"),
        max_value=Decimal("10000000.00"),
        places=2,
        allow_nan=False,
        allow_infinity=False,
    )
)
def test_cents_round_is_unambiguous_for_two_decimal_values(d):
    """CAST(round(x*100) AS BIGINT) recovers the exact cents of ANY
    2-decimal value stored as a double: float(d)*100 lands within a
    half-ulp of the true integer, never at a rounding tie — so Spark's
    HALF_UP and DuckDB's half-away agree bit-for-bit."""
    true_cents = int(d * 100)
    via_double = round(float(d) * 100)  # Python round is half-EVEN — if even
    # this agrees with half-away here, the value wasn't at a tie at all
    assert via_double == true_cents


# --- quality_e4 rational recipe -------------------------------------------


def _quality_e4_int(stop: int, n: int, sl: int) -> int:
    """The shared Spark/DuckDB integer recipe (functions/text.py)."""
    den = n + abs(sl - 5 * n)
    return (2 * (5000 * stop * den + 5000 * n * n) + n * den) // (2 * n * den)


@given(
    st.integers(min_value=1, max_value=10_000),
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=0, max_value=200_000),
)
def test_quality_e4_recipe_is_exact_round_half_up(n, stop, sl):
    """The BIGINT recipe equals round_half_up(1e4 * (0.5*stop/n +
    0.5*n/(n + |sl - 5n|))) computed in EXACT rational arithmetic — the
    float formula it replaced, with no float anywhere."""
    stop = min(stop, n)  # stopword hits cannot exceed token count
    den = n + abs(sl - 5 * n)
    q = Fraction(5000 * stop, n) + Fraction(5000 * n, den)
    expected = (q + Fraction(1, 2)).__floor__()
    assert _quality_e4_int(stop, n, sl) == expected


# --- neighbor-union bucket blocking completeness ---------------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 400)),  # (key, day)
        min_size=2,
        max_size=60,
    )
)
@settings(max_examples=200)
def test_interval_bucket_blocking_is_complete(rows):
    """Bucket width == interval length L: any same-key pair with
    |day diff| < L shares an equi-key (a's probe set {b-1,b,b+1} hits b's
    bucket) on EXACTLY one key — no loss, no double count. Mirrors
    q_interval_overlap's candidate generation."""
    L = 30
    items = [(i, k, d) for i, (k, d) in enumerate(rows)]
    naive = {
        (a[0], b[0])
        for a in items
        for b in items
        if a[0] < b[0] and a[1] == b[1] and abs(a[2] - b[2]) < L
    }
    hits = {}
    for a in items:
        for b in items:
            if a[0] >= b[0] or a[1] != b[1] or abs(a[2] - b[2]) >= L:
                continue
            # equi-key join: a probes {bkt-1, bkt, bkt+1}, b offers bkt
            n_keys = sum(
                1 for off in (-1, 0, 1) if a[2] // L + off == b[2] // L
            )
            hits[(a[0], b[0])] = n_keys
    assert set(hits) == naive
    assert all(v == 1 for v in hits.values()), hits


@given(
    st.lists(st.integers(min_value=1, max_value=120), min_size=2, max_size=40)
)
@settings(max_examples=200)
def test_length_bucket_blocking_is_complete_for_lev2(lengths):
    """Fuzzy-match blocking: bucket width 4 > lev_max 2 guarantees any pair
    with |len diff| <= 2 shares exactly one probe key (q_fuzzy_match's
    candidate generation)."""
    W, D = 4, 2
    items = list(enumerate(lengths))
    naive = {
        (a[0], b[0])
        for a in items
        for b in items
        if a[0] < b[0] and abs(a[1] - b[1]) <= D
    }
    hits = {}
    for a in items:
        for b in items:
            if a[0] >= b[0] or abs(a[1] - b[1]) > D:
                continue
            n_keys = sum(1 for off in (-1, 0, 1) if a[1] // W + off == b[1] // W)
            hits[(a[0], b[0])] = n_keys
    assert set(hits) == naive
    assert all(v == 1 for v in hits.values()), hits


# --- volume-independent daily-mean series (r11 int64 audit) -----------------

# The TPC-H price domain: o_totalprice is bounded by part count x max price;
# the generator never exceeds ~555k. The envelope below uses 600k dollars.
PRICE_DOLLARS_MAX = 600_000
CENTURY_DAYS = 36_500


@given(
    st.lists(
        st.tuples(
            # s = sum of rounded whole-dollar prices for one day,
            # n = order count for that day — n is UNBOUNDED volume
            # (up to 1e12 orders/day here), s respects the price domain
            st.integers(min_value=1, max_value=10**12),
            st.data(),
        ),
        min_size=2,
        max_size=30,
    )
)
@settings(max_examples=100)
def test_daily_mean_series_is_volume_independent(day_specs):
    """q_autocorr_lag1 / q_changepoint_cusum (round 11): the round-half-up
    daily MEAN (2s+n)//(2n) is bounded by the PRICE DOMAIN for any order
    volume, so sum(dv^2) over a century of days and the CUSUM n*cum_k
    product both stay far inside int64 at ANY corpus scale — the property
    the r11 series switch rests on (a daily-TOTAL series broke at sf0.1)."""
    ys = []
    for n, data in day_specs:
        # each order's rounded whole-dollar price is in [1, domain max]
        s = data.draw(
            st.integers(min_value=n, max_value=n * PRICE_DOLLARS_MAX)
        )
        y = (2 * s + n) // (2 * n)
        assert 1 <= y <= PRICE_DOLLARS_MAX  # volume never widens the mean
        ys.append(y)

    # autocorr: deviations from the round-half-up integer mean of the series
    D = len(ys)
    s_tot = sum(ys)
    m = (2 * s_tot + D) // (2 * D)
    dvs = [y - m for y in ys]
    # per-day dv^2 <= domain^2, so a CENTURY of days stays ~1e3 x inside
    assert sum(dv * dv for dv in dvs) <= D * PRICE_DOLLARS_MAX**2
    assert CENTURY_DAYS * PRICE_DOLLARS_MAX**2 < 2**63 / 500

    # cusum: |n*cum_k - k*S| <= 2 * D^2 * domain, century-safe by ~7e4x
    cum = 0
    for k, y in enumerate(ys, 1):
        cum += y
        assert abs(D * cum - k * s_tot) <= 2 * D * D * PRICE_DOLLARS_MAX
    assert 2 * CENTURY_DAYS**2 * PRICE_DOLLARS_MAX < 2**63 / 1000
