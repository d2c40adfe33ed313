"""Property-based reference invariants (SURVEY §5.2) via hypothesis:

* F1 _fix_ptags: the Spark column expression agrees with an independent
  pure-Python implementation of the reference semantics on arbitrary text;
* U1 merge: for random present/absent update rows, the engine merge agrees
  with a pure-Python fold of the reference's insert_item policy.

Each example set is evaluated in ONE Spark job (hypothesis drives the data,
not the job count) to keep runtime sane.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from hnarchive_spark.functions.scalars import fix_ptags
from hnarchive_spark.operators.merge import COALESCE_COLS, merge_items
from hnarchive_spark.plans import fixtures as FX

TEXT = st.text(
    alphabet=st.sampled_from(list("ab<p> &;/")), min_size=0, max_size=40
)


@settings(max_examples=3, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=30))
def test_fix_ptags_matches_python_reference(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["fixed"]
        for r in df.select("id", fix_ptags("text").alias("fixed")).collect()
    }
    for i, t in rows:
        expected = "<p>" + t.replace("<p>", "</p><p>") + "</p>"  # hnarchive.py:294-304
        assert got[i] == expected, (t, got[i], expected)


_maybe_str = st.one_of(st.none(), st.text(alphabet="xyz", min_size=1, max_size=5))
_maybe_int = st.one_of(st.none(), st.integers(min_value=0, max_value=99))

UPDATE_ROW = st.fixed_dictionaries(
    {
        "author": _maybe_str,
        "text": _maybe_str,
        "poll": _maybe_int,
        "url": _maybe_str,
        "score": _maybe_int,
        "title": _maybe_str,
        "parent": _maybe_int,
        "descendants": _maybe_int,
        "deleted": st.booleans(),
        "dead": st.booleans(),
    }
)


@settings(max_examples=3, deadline=None)
@given(st.lists(UPDATE_ROW, min_size=1, max_size=12))
def test_merge_matches_python_reference(spark, upd_dicts):
    base_rows = [
        FX._item(
            100 + i, "story", author="a0", text="t0", poll=1, url="u0",
            score=0, title="T0", parent=50, descendants=3,
            time=FX.T0, retrieved=FX.T0 + 1,
        )
        for i in range(len(upd_dicts))
    ]
    upd_rows = [
        FX._item(100 + i, "story", time=FX.T0 + 2, retrieved=FX.T0 + 9, **d)
        for i, d in enumerate(upd_dicts)
    ]
    got = {
        r["id"]: r.asDict()
        for r in merge_items(
            FX.items_df(spark, base_rows), FX.items_df_with_seq(spark, upd_rows), seq_col="seq"
        ).collect()
    }
    for b, u in zip(base_rows, upd_rows):
        expect = dict(u)  # overwrite cols take the incoming value
        for c in COALESCE_COLS:
            if u[c] is None:
                expect[c] = b[c]  # reference: data.get(k, existing[k])
        actual = got[b["id"]]
        for c in FX.ITEM_COLS:
            assert actual[c] == expect[c], (b["id"], c)


# --- rankselect operators vs a pure-Python reference fold ---

_RS_ROW = st.tuples(
    st.sampled_from(["a", "b", "c"]),                 # key
    st.integers(min_value=-50, max_value=50),         # order value (incl. neg)
    st.integers(min_value=0, max_value=20),           # summand
)


@settings(max_examples=3, deadline=None)
@given(st.lists(_RS_ROW, min_size=1, max_size=40))
def test_grouped_prefix_sum_matches_python_fold(spark, rows):
    """grouped_prefix_sum must equal the per-key ordered running sum for
    ARBITRARY data: negative order values, heavy ties, single-row keys,
    all values inside one bucket and spread across many (width 4)."""
    from hnarchive_spark.operators.rankselect import grouped_prefix_sum

    data = [(k, v, i, x) for i, (k, v, x) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, v long, id long, x long")
    got = {
        r.id: r.cum
        for r in grouped_prefix_sum(df, "k", "v", "id", "x", bucket_width=4).collect()
    }
    by_key: dict[str, list] = {}
    for k, v, i, x in data:
        by_key.setdefault(k, []).append((v, i, x))
    for k, items in by_key.items():
        items.sort(key=lambda t: (-t[0], t[1]))  # v desc, id asc
        run = 0
        for v, i, x in items:
            run += x
            assert got[i] == run, (k, i, got[i], run)


@settings(max_examples=3, deadline=None)
@given(st.lists(_RS_ROW, min_size=1, max_size=40))
def test_grouped_global_rank_with_count_matches_python_sort(spark, rows):
    from hnarchive_spark.operators.rankselect import grouped_global_rank

    data = [(k, v, i) for i, (k, v, _) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, v long, id long")
    got = {
        r.id: (r.rank, r.nn)
        for r in grouped_global_rank(
            df, "k", "v", "id", descending=False, bucket_width=4, with_count=True
        ).collect()
    }
    by_key: dict[str, list] = {}
    for k, v, i in data:
        by_key.setdefault(k, []).append((v, i))
    for k, items in by_key.items():
        items.sort()  # v asc, id asc
        for rank0, (v, i) in enumerate(items):
            assert got[i] == (rank0 + 1, len(items)), (k, i, got[i])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=200), min_size=0, max_size=120),
    st.integers(min_value=1, max_value=160),
)
def test_ffd_segment_tree_matches_naive_first_fit(lengths, budget):
    """pack_fold_ffd's O(n log n) segment-tree lookup must assign the
    EXACT bins the textbook O(n^2) first-fit scan assigns (leftmost
    open bin with room, else a new bin), for any length mix including
    oversized items — the tree is an optimization, never a semantics
    change.  Pure Python: no SparkSession."""
    from hnarchive_spark.plans.textops import ffd_assign

    ordered = sorted(lengths, reverse=True)  # the fold's DESC order
    got = ffd_assign(ordered, budget)

    rems: list[int] = []
    want = []
    for t in ordered:
        for i, r in enumerate(rems):
            if r >= t:
                rems[i] -= t
                want.append(i)
                break
        else:
            rems.append(budget - t)
            want.append(len(rems) - 1)
    assert got == want

    # validity: no bin over budget unless it holds a single oversized item
    loads: dict[int, list[int]] = {}
    for t, b in zip(ordered, got):
        loads.setdefault(b, []).append(t)
    for b, items in loads.items():
        assert sum(items) <= budget or len(items) == 1
