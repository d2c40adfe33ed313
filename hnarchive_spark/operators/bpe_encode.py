"""Arrow-kernel BPE APPLY — the production encode path for trained
vocabularies (VERDICT r16 #1).

``q_bpe_encode``'s canonical apply is one literal Java ``regexp_replace``
per merge rule, chained: exact, hash-checkable, and fine at the fixture's
10 rules — but a real tokenizer carries 30-50k merges, and 30k chained
regexp nodes is a Catalyst plan-size/codegen killer while 30k full corpus
passes is not a viable encode cost.  This module is the scale twin: ONE
``mapInPandas`` stage applying the whole broadcast rule list per document
inside an Arrow batch kernel, locked ROW-IDENTICAL to the regexp chain
(tests/test_bpe_kernel.py — fixture corpus + seeded-fuzz corpora, the
``test_udtf_chunking.py`` twin discipline).

Exact-equivalence argument (why the kernel reproduces the chain bit for
bit):

* The chain applies rules in induction order, each rule as ONE greedy
  leftmost non-overlapping ``replaceAll`` over the chr(1)-joined token
  stream with token-boundary lookarounds.  Per rule ``(a, b)`` that is
  precisely one left-to-right fold: walk the tokens, and whenever the
  accumulator's last token == ``a`` and the next token == ``b``, replace
  the last token with ``a+b`` (the merged token can never re-match inside
  the same pass — ``a+b != a`` and ``a+b != b`` since both sides are
  non-empty, which also covers the ``a == b`` run case exactly as Java's
  resume-after-replacement scan does).
* Rules whose pair is ABSENT from the current stream are identity passes,
  so the kernel may skip them.  It therefore keeps a cursor (the next
  rule index the chain would run) and repeatedly applies the LOWEST
  not-yet-passed rule whose pair is currently adjacent somewhere in the
  doc; pairs belonging to rules BELOW the cursor are dead (their pass
  already happened — the chain does not revisit), matching the chain's
  strict one-pass-per-rule-in-order semantics even when a later merge
  re-creates an earlier rule's pair.

Scale shape: per document the cost is O(doc_tokens x log doc_tokens),
independent of BOTH the vocabulary size and the number of applied
passes (ADVICE r17: the earlier per-pass full rescan was
O(applied_passes x doc_tokens) — quadratic on one pathological long,
pair-diverse document inside an Arrow batch).  :func:`encode_tokens`
tracks candidate pairs incrementally (linked-list stream + per-pair
occurrence sets + a min-heap keyed by rule index), so each pass touches
only its own pair's occurrences and each merge does O(log) bookkeeping;
a 30k-merge rule list costs a dict lookup per adjacent pair, never 30k
corpus scans, and contributes exactly one plan node.  The rule list
rides to executors once per task as a broadcast-sized Python closure
(vocabulary-sized metadata, the centroid-list convention).  The chain
stays the oracle twin; this kernel is what a 100 TB encode runs.
"""

from __future__ import annotations

import hashlib
import heapq
from bisect import bisect_left
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hnarchive_spark.functions import text as T

_DELIM = "\x01"  # textops._BPE_DELIM (kept literal: no circular import)


def _fold_pass(ts: list[str], a: str, b: str, merged: str) -> list[str]:
    """ONE greedy left-to-right merge pass of rule ``(a, b)`` — the exact
    fold Java's leftmost non-overlapping replaceAll performs over the
    delimiter-joined stream (see module docstring)."""
    out: list[str] = []
    append = out.append
    for tok in ts:
        if tok == b and out and out[-1] == a:
            out[-1] = merged
        else:
            append(tok)
    return out


def build_rank(rules: list[tuple[str, str]]) -> dict[tuple[str, str], list[int]]:
    """(left, right) -> ASCENDING rule indices.  A list, not a scalar:
    the trainer can legitimately re-induce a pair at a later round (a
    later merge re-creates adjacencies of an already-passed rule), and
    the chain then runs BOTH passes at their own positions — a
    last-index-wins dict would jump the cursor over live rules."""
    rank: dict[tuple[str, str], list[int]] = {}
    for i, p in enumerate(rules):
        rank.setdefault(p, []).append(i)
    return rank


def encode_tokens_scan(
    ts: list[str],
    rules: list[tuple[str, str]],
    rank: dict[tuple[str, str], list[int]],
) -> list[str]:
    """The STRAIGHTFORWARD per-pass rescan implementation of the chain's
    sequential one-pass-per-rule semantics — O(applied_passes x
    doc_tokens): each iteration rescans the whole stream for the lowest
    live rule, then folds it.  Kept as the readable reference twin for
    :func:`encode_tokens` (the incremental O(n log n) path — ADVICE
    r17: one pathological long, pair-diverse document made the rescan
    quadratic); tests lock the two identical on fuzz streams."""
    cursor = 0
    while True:
        best = -1
        prev = None
        for tok in ts:
            if prev is not None:
                idxs = rank.get((prev, tok))
                if idxs is not None:
                    j = bisect_left(idxs, cursor)
                    if j < len(idxs) and (best < 0 or idxs[j] < best):
                        best = idxs[j]
            prev = tok
        if best < 0:
            return ts
        a, b = rules[best]
        ts = _fold_pass(ts, a, b, a + b)
        cursor = best + 1


def encode_tokens(
    ts: list[str],
    rules: list[tuple[str, str]],
    rank: dict[tuple[str, str], list[int]],
) -> list[str]:
    """Apply the trained rule list to one token stream with the chain's
    EXACT sequential one-pass-per-rule semantics, skipping absent rules.
    ``rank`` is :func:`build_rank`'s index (precompute once per batch).

    Incremental O(n log n) implementation (ADVICE r17 — the per-pass
    full rescan of :func:`encode_tokens_scan` is O(passes x tokens),
    quadratic on a long document where most adjacent pairs merge):

    * the stream is a doubly-linked list over the ORIGINAL positions
      (a merge keeps the left node, so position order is stable);
    * ``occ[pair]`` tracks the live left-positions of every adjacent
      pair, updated only in the merged neighborhoods;
    * a min-heap over candidate rule indices finds the lowest
      not-yet-passed rule whose pair is currently adjacent.  Entries
      are pushed as ``first index in rank[pair] >= cursor`` at push
      time; because the cursor only grows, a live entry's index is
      always <= the pair's CURRENT first-live index, so the popped
      minimum (once stale entries are refreshed/skipped) is exactly
      the rule the rescan would have chosen;
    * one greedy left-to-right fold pass of the chosen rule touches
      only that pair's occurrences (ascending original position ==
      Java replaceAll's leftmost scan; within a pass the merged token
      ``a+b`` can never re-create the pair, so the pass-start
      occurrence snapshot is complete).

    Total cost: every pair creation/destruction is O(log) heap work,
    creations are bounded by n + 2*merges <= 3n, refresh pops by
    |rules| — never O(passes x tokens)."""
    n = len(ts)
    if n < 2 or not rules:
        return list(ts)
    tok = list(ts)
    nxt = list(range(1, n)) + [-1]
    prv = [-1] + list(range(n - 1))
    alive = [True] * n
    occ: dict[tuple[str, str], set[int]] = {}
    for i in range(n - 1):
        occ.setdefault((tok[i], tok[i + 1]), set()).add(i)

    heap: list[tuple[int, tuple[str, str]]] = []
    entry_live: dict[tuple[str, str], int] = {}
    cursor = 0

    def _push(pair: tuple[str, str]) -> None:
        idxs = rank.get(pair)
        if not idxs:
            return
        j = bisect_left(idxs, cursor)
        if j < len(idxs):
            heapq.heappush(heap, (idxs[j], pair))
            entry_live[pair] = entry_live.get(pair, 0) + 1

    for pair in occ:
        _push(pair)

    def _add_pair(i: int) -> None:
        p = (tok[i], tok[nxt[i]])
        s = occ.get(p)
        if s is None:
            s = occ[p] = set()
        s.add(i)
        if not entry_live.get(p):
            _push(p)

    while heap:
        r, pair = heapq.heappop(heap)
        entry_live[pair] -= 1
        s = occ.get(pair)
        if not s:
            continue  # every occurrence was consumed since the push
        if r < cursor:
            _push(pair)  # rule already passed: refresh to the next live index
            continue
        a, b = rules[r]
        merged = a + b
        cursor = r + 1
        # ONE greedy left-to-right pass over the pass-start occurrences
        for i in sorted(s):
            if not alive[i] or tok[i] != a:
                continue
            j = nxt[i]
            if j == -1 or tok[j] != b:
                continue
            p_left = prv[i]
            k = nxt[j]
            # destroy the pairs the merge invalidates
            if p_left != -1:
                occ[(tok[p_left], a)].discard(p_left)
            if k != -1:
                occ[(b, tok[k])].discard(j)
            s.discard(i)
            # splice: left node keeps the merged token, right node dies
            tok[i] = merged
            alive[j] = False
            nxt[i] = k
            if k != -1:
                prv[k] = i
            # register the pairs the merge creates (never (a, b) itself:
            # merged != a and merged != b since both sides are non-empty)
            if p_left != -1:
                _add_pair(p_left)
            if k != -1:
                _add_pair(i)

    out: list[str] = []
    i = 0  # node 0 is never a merge's right side, so it is always alive
    while i != -1:
        out.append(tok[i])
        i = nxt[i]
    return out


def encode_stream(
    st: list[str],
    rules: list[tuple[str, str]],
    rank: dict[tuple[str, str], list[int]],
) -> list[str]:
    """Encode ONE raw subtoken array: round-trip through the chain's
    delimiter representation, then apply the rule list.  The round-trip
    matters for row-identity: if a token itself contains chr(1)
    (possible — the subtoken pattern's punctuation class admits it),
    the chain sees spurious segment boundaries in the joined stream,
    and the kernel must see the SAME segments.  For control-char-free
    corpora (the fixture and any sane corpus) this is the identity
    function.  ONE definition shared by every kernel variant
    (encode/ids/counts — review discipline: no verbatim copies)."""
    return encode_tokens(_DELIM.join(st).split(_DELIM), rules, rank)


def _subtoken_frame(docs: DataFrame, id_col: str) -> DataFrame:
    """The kernels' shared JVM-side input prep: subtokenize (the same
    regexp_extract_all the chain uses, so every variant sees identical
    token streams) and drop zero-subtoken docs (they have no tokens
    under the tokenizer — the metering contract)."""
    return docs.select(
        id_col, T.subtokens(F.col("text")).alias("st")
    ).filter(F.size("st") > 0)


def encode_bpe_kernel(
    docs: DataFrame, rules: list[tuple[str, str]], id_col: str = "doc_id"
) -> DataFrame:
    """The q_bpe_encode result frame (doc_id, n_subtokens, n_bpe_tokens,
    compression_e4, enc_fp) computed by the Arrow kernel instead of the
    chained-regexp projection.  Subtokenization stays JVM-side
    (``T.subtokens`` — the same regexp_extract_all the chain uses), so
    the kernel sees identical input token streams; the fingerprint is
    md5 over the same chr(1)-joined UTF-8 encoding the JVM hashes."""
    rules = [(a, b) for a, b in rules]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rank = build_rank(rules)
        for pdf in it:
            ids, n_sub, n_bpe, comp, fp = [], [], [], [], []
            for doc_id, st in zip(pdf[id_col], pdf["st"]):
                n_raw = len(st)
                enc = encode_stream(st, rules, rank)
                e = _DELIM.join(enc)
                ids.append(doc_id)
                # n_subtokens is the RAW array length (the chain reports
                # F.size(st), not the delimiter-segment count)
                n_sub.append(n_raw)
                n_bpe.append(len(enc))
                comp.append((len(enc) * 10000) // n_raw)
                fp.append(hashlib.md5(e.encode("utf-8")).hexdigest()[:16])
            yield pd.DataFrame(
                {
                    # explicit dtypes: an EMPTY batch would otherwise
                    # infer object columns and fail the Arrow cast
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_subtokens": pd.Series(n_sub, dtype="int64"),
                    "n_bpe_tokens": pd.Series(n_bpe, dtype="int64"),
                    "compression_e4": pd.Series(comp, dtype="int64"),
                    "enc_fp": pd.Series(fp, dtype="object"),
                }
            )

    return _subtoken_frame(docs, id_col).mapInPandas(
        _batches,
        schema=(
            f"{id_col} long, n_subtokens long, n_bpe_tokens long, "
            "compression_e4 long, enc_fp string"
        ),
    )


def encode_bpe_ids_kernel(
    docs: DataFrame,
    rules: list[tuple[str, str]],
    tok2id: dict[str, int],
    id_col: str = "doc_id",
) -> DataFrame:
    """TOKEN-ID encode — (doc_id, n_tokens, token_ids array<int>): the
    Arrow kernel's encode mapped through the tokenizer store's
    token->id vocabulary (sources/tokenizer_store.load_tokenizer_id_map
    — base snapshot ids + one id per merge, unknowns to 0/<unk>).  This
    is what a training run actually consumes (VERDICT r17 #6): the
    release's ``--emit-tokens`` mode writes these arrays into the
    packed shards.  Same single-MapInPandas plan shape as
    :func:`encode_bpe_kernel`; the id map rides with the rules as a
    broadcast-sized closure (vocabulary-sized metadata).  Zero-subtoken
    docs are excluded (they have no tokens — the metering contract)."""
    rules = [(a, b) for a, b in rules]
    lookup = dict(tok2id)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rank = build_rank(rules)
        get = lookup.get
        for pdf in it:
            ids, n_tok, seqs = [], [], []
            for doc_id, st in zip(pdf[id_col], pdf["st"]):
                enc = encode_stream(st, rules, rank)
                ids.append(doc_id)
                n_tok.append(len(enc))
                seqs.append([get(t, 0) for t in enc])
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_tokens": pd.Series(n_tok, dtype="int64"),
                    "token_ids": pd.Series(seqs, dtype="object"),
                }
            )

    return _subtoken_frame(docs, id_col).mapInPandas(
        _batches,
        schema=f"{id_col} long, n_tokens long, token_ids array<int>",
    )


def bpe_token_counts_kernel(
    docs: DataFrame, rules, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens) under the trained tokenizer via the Arrow
    kernel — the metering twin of ``textops.bpe_token_count`` for
    production vocabularies (release --tokenizer / budget selection).
    ``rules`` accepts the tokenizer store's 4-tuples or bare pairs.
    Empty-subtoken docs are EXCLUDED (the registered
    q_select_token_budget_bpe contract: a doc with no subtokens has no
    tokens under the tokenizer and cannot be budgeted)."""
    pairs = [(r[-3], r[-2]) if len(r) == 4 else (r[0], r[1]) for r in rules]
    return encode_bpe_kernel(docs, pairs, id_col=id_col).select(
        id_col, F.col("n_bpe_tokens").alias("n_tokens")
    )
