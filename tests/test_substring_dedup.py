"""Semantic tests for the exact-substring-dedup family: a pure-Python
reference implementation of the declared semantics (overlapping L-grams,
>=2-distinct-doc duplication, maximal-interval merge, min-doc_id
first-gram ownership, excision) run over the real sf0.001 corpus and
compared row-for-row against the Spark plans.  This is a THIRD,
engine-independent witness — the DuckDB oracle proves Spark==SQL, this
proves both equal the documented algorithm (a shared misreading of the
spec in both SQL dialects would pass the oracle but fail here)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from hnarchive_spark.plans.dedup import SUBSTR_L as L
from hnarchive_spark.plans.registry import all_queries
from hnarchive_spark.tables import load

SF = "/root/testdata/sf0.001"


def _gram_docs(docs: dict[int, str]) -> dict[str, set[int]]:
    out: dict[str, set[int]] = defaultdict(set)
    for doc_id, text in docs.items():
        for i in range(len(text) - L + 1):
            out[text[i : i + L]].add(doc_id)
    return out


def _spans(docs: dict[int, str], dup: set[str]) -> dict[int, list[tuple[int, int, str]]]:
    """Per doc: maximal merged spans of duplicated grams, 1-based
    (start, end, first_gram).  Island break when the position gap > L."""
    spans: dict[int, list[tuple[int, int, str]]] = {}
    for doc_id, text in docs.items():
        ps = [i + 1 for i in range(len(text) - L + 1) if text[i : i + L] in dup]
        islands: list[list[int]] = []
        cur: list[int] | None = None
        for p in ps:
            if cur is None or p - cur[-1] > L:
                if cur is not None:
                    islands.append(cur)
                cur = [p]
            else:
                cur.append(p)
        if cur is not None:
            islands.append(cur)
        spans[doc_id] = [
            (isl[0], isl[-1] + L - 1, text[isl[0] - 1 : isl[0] - 1 + L]) for isl in islands
        ]
    return spans


def _reference(docs: dict[int, str]):
    """The documented algorithm, straight-line Python: returns the audit
    rows (q_substring_dedup), the clean rows (q_substring_dedup_clean),
    and the cleaned corpus text."""
    gram_docs = _gram_docs(docs)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    owner = {g: min(gram_docs[g]) for g in dup}
    spans = _spans(docs, dup)

    audit = {}
    for doc_id, sp in spans.items():
        if not sp:
            continue
        dup_chars = sum(e - s + 1 for s, e, _ in sp)
        audit[doc_id] = (
            len(sp),
            dup_chars,
            max(e - s + 1 for s, e, _ in sp),
            (1_000_000 * dup_chars) // len(docs[doc_id]),
        )

    clean, cleaned_corpus = {}, dict(docs)
    for doc_id, sp in spans.items():
        removed = [(s, e) for s, e, g0 in sp if owner[g0] != doc_id]
        if not removed:
            continue
        text, kept, prev_end = docs[doc_id], [], 0
        for s, e in removed:  # sorted and disjoint by construction
            kept.append(text[prev_end : s - 1])
            prev_end = e
        kept.append(text[prev_end:])
        ct = "".join(kept)
        cleaned_corpus[doc_id] = ct
        removed_chars = sum(e - s + 1 for s, e in removed)
        clean[doc_id] = (
            len(removed),
            removed_chars,
            len(text) - removed_chars,
            hashlib.md5(ct.encode()).hexdigest()[:16],
        )
    return audit, clean, cleaned_corpus


def _corpus(spark):
    rows = load(spark, SF, "documents").select("doc_id", "text").collect()
    return {r.doc_id: r.text for r in rows if r.text is not None and len(r.text) >= L}


def test_audit_matches_pure_python_reference(spark):
    docs = _corpus(spark)
    audit, _, _ = _reference(docs)
    got = {
        r.doc_id: (r.n_spans, r.dup_chars, r.longest_span, r.dup_frac_e6)
        for r in all_queries()["q_substring_dedup"](spark, SF).collect()
    }
    assert got == audit


def test_clean_matches_pure_python_reference(spark):
    docs = _corpus(spark)
    _, clean, _ = _reference(docs)
    got = {
        r.doc_id: (r.n_removed, r.removed_chars, r.clean_chars, r.clean_fp)
        for r in all_queries()["q_substring_dedup_clean"](spark, SF).collect()
    }
    assert got == clean
    # the fully-emptied-doc edge: at least one doc must fingerprint ''
    empty_fp = hashlib.md5(b"").hexdigest()[:16]
    assert any(v[3] == empty_fp and v[2] == 0 for v in clean.values())


def test_clean_collapses_duplicated_mass(spark):
    """Property: one clean pass removes the overwhelming bulk of cross-doc
    duplicated mass.  The contract is QUANTIFIED, not absolute, because
    char-range excision with span-granular ownership cannot be perfect —
    the same two artifacts Lee et al.'s suffix-array cut has: (1) cut
    seams mint NEW grams, identical across identically-cut copies; (2) a
    doc keeps its whole span when it owns the span's FIRST gram, so a
    later gram inside that span can survive in two keepers while the
    gram's own min-doc owner excised its copy via a differently-shaped
    span.  Measured on sf0.001: one pass kills 94.3% of duplicated
    (gram, doc) pairs and the owner-less leak is 0.17%."""
    docs = _corpus(spark)
    pre = _gram_docs(docs)
    owner = {g: min(ds) for g, ds in pre.items() if len(ds) >= 2}
    pre_pairs = sum(len(ds) for ds in pre.values() if len(ds) >= 2)
    _, _, cleaned = _reference(docs)
    post = _gram_docs(cleaned)
    post_pairs = sum(len(ds) for ds in post.values() if len(ds) >= 2)
    leak_pairs = sum(
        len(ds) for g, ds in post.items() if len(ds) >= 2 and owner.get(g) not in ds
    )
    assert post_pairs <= 0.10 * pre_pairs, (post_pairs, pre_pairs)
    assert leak_pairs <= 0.005 * pre_pairs, (leak_pairs, pre_pairs)
