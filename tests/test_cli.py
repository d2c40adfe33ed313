"""CLI surface tests (E6): drive the argparse entry points in-process with a
mock-data transport file, against a temp store."""

from __future__ import annotations

import json

import pytest

# Multi-minute CLI lifecycle verbs integration sweeps (10-43 s per test): excluded
# from the DRIVER-SIZED default run, executed round-closing via
# `-m exhaustive` (pytest.ini; VERDICT r18 #1 suite-budget split).
pytestmark = pytest.mark.exhaustive

from hnarchive_spark import cli

T0 = 1_700_000_000

WORLD = {
    "items": {
        "1": {"id": 1, "type": "story", "by": "alice", "time": T0, "title": "S", "score": 4, "descendants": 1},
        "2": {"id": 2, "type": "comment", "by": "bob", "parent": 1, "time": T0 + 60, "text": "c<p>d"},
        "3": {"id": 3, "type": "comment", "by": "eve", "parent": 2, "time": T0 + 90, "text": "deep"},
    },
    "max_id": 3,
}


@pytest.fixture
def env(tmp_path, spark, monkeypatch):
    # reuse the test session instead of building a fresh one per command
    monkeypatch.setattr(cli, "get_spark", lambda *_a, **_k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    mock = tmp_path / "world.json"
    mock.write_text(json.dumps(WORLD))
    return {
        "store": str(tmp_path / "store"),
        "mock": str(mock),
        "tmp": tmp_path,
    }


def _run(env, *argv):
    return cli.main(["--store", env["store"], "--mock-data", env["mock"], *argv])


def test_get_then_update_then_render(env, capsys):
    assert _run(env, "get", "--lower", "1", "--upper", "2") == 0
    assert "store now 2 rows" in capsys.readouterr().out

    assert _run(env, "update") == 0
    assert "latest id 3" in capsys.readouterr().out

    out_tpl = str(env["tmp"] / "page_{id}.html")
    assert _run(env, "html_render", "1", "--output", out_tpl) == 0
    page = (env["tmp"] / "page_1.html").read_text()
    assert 'class="story" id="1"' in page and 'id="3"' in page

    # stdout mode (no --output) prints the page, reference behavior
    assert _run(env, "html_render", "2") == 0
    assert 'class="comment" id="2"' in capsys.readouterr().out


def test_update_items_and_livestream(env, capsys):
    _run(env, "get", "--lower", "1", "--upper", "3")
    capsys.readouterr()
    assert _run(env, "update_items", "--days", "30") == 0
    world = json.loads(open(env["mock"]).read())
    world["items"]["4"] = {"id": 4, "type": "comment", "by": "zed", "parent": 1, "time": T0 + 120, "text": "new"}
    world["max_id"] = 4
    open(env["mock"], "w").write(json.dumps(world))
    assert _run(env, "livestream", "--polls", "2") == 0
    assert "latest id 4" in capsys.readouterr().out


def test_livestream_streaming_once_resumes_from_checkpoint(env, capsys):
    """--streaming --once: a real checkpointed streaming drain; a second
    invocation resumes from the committed maxitem offset."""
    ckpt = str(env["tmp"] / "ls_ckpt")
    assert _run(env, "livestream", "--streaming", "--once", "--checkpoint", ckpt) == 0
    assert "latest id 3" in capsys.readouterr().out

    world = json.loads(open(env["mock"]).read())
    world["items"]["4"] = {"id": 4, "type": "comment", "by": "zed", "parent": 1,
                           "time": T0 + 120, "text": "new"}
    world["max_id"] = 4
    open(env["mock"], "w").write(json.dumps(world))
    assert _run(env, "livestream", "--streaming", "--once", "--checkpoint", ckpt) == 0
    assert "latest id 4" in capsys.readouterr().out


def test_sigint_between_chunks_commits_prefix(env, capsys, monkeypatch):
    """K3 graceful shutdown: a SIGINT during a chunked backfill lets the
    in-flight chunk commit, then exits 1 — the store holds the committed
    prefix, not a torn state (reference ctrlc_commit, hnarchive.py:82-89)."""
    import signal as _signal

    from hnarchive_spark.sources.items_store import ItemsStore

    real_merge = ItemsStore.merge_batch
    calls = []

    def merge_then_sigint(self, updates, seq_col=None):
        real_merge(self, updates, seq_col=seq_col)
        calls.append(1)
        if len(calls) == 1:  # interrupt arrives after the first chunk commit
            _signal.raise_signal(_signal.SIGINT)

    monkeypatch.setattr(ItemsStore, "merge_batch", merge_then_sigint)
    # commit_period=2 -> chunks [1,2] and [3,3]; SIGINT after chunk 1
    rc = _run(env, "get", "--lower", "1", "--upper", "3", "--commit_period", "2")
    assert rc == 1
    assert "interrupted: committed through id 2" in capsys.readouterr().out
    assert len(calls) == 1  # second chunk never ran

    monkeypatch.setattr(ItemsStore, "merge_batch", real_merge)
    store = ItemsStore(cli.get_spark(), env["store"])
    assert store.latest_id() == 2  # committed prefix, durable
    # the run can resume and complete cleanly
    assert _run(env, "update") == 0
    assert store.latest_id() == 3


def test_notify_file_records_success_and_failure(env, capsys, tmp_path):
    """E6 operatornotify analog: every run appends a JSON summary line;
    failures are captured with the exception, not swallowed."""
    notify = str(tmp_path / "notify.jsonl")
    assert cli.main(["--store", env["store"], "--mock-data", env["mock"],
                     "--notify-file", notify, "get", "--lower", "1",
                     "--upper", "2"]) == 0
    # a bad mock-data path fails the command but still notifies
    assert cli.main(["--store", env["store"], "--mock-data", "/nonexistent.json",
                     "--notify-file", notify, "update"]) == 1
    capsys.readouterr()
    lines = [json.loads(ln) for ln in open(notify)]
    assert [ln["command"] for ln in lines] == ["get", "update"]
    assert lines[0]["status"] == "ok"
    assert lines[1]["status"].startswith("error: FileNotFoundError")
    assert all(ln["elapsed_s"] >= 0 for ln in lines)


def test_export_to_duckdb(env, capsys):
    import duckdb

    _run(env, "get", "--lower", "1", "--upper", "3")
    db = str(env["tmp"] / "archive.duckdb")
    assert _run(env, "export", "--to", db) == 0
    assert "exported 3 rows" in capsys.readouterr().out
    con = duckdb.connect(db)
    assert con.execute("SELECT count(*) FROM items").fetchone()[0] == 3
    # the store's typed schema round-trips, including the partition column
    row = con.execute(
        "SELECT author, type, parent FROM items WHERE id = 2"
    ).fetchone()
    assert row == ("bob", "comment", 1)
    con.close()


def test_export_to_sqlite_reference_schema_roundtrip(env, capsys):
    """The .sqlite export must carry the reference's exact physical schema
    (hnarchive.py:34-60: items DDL + six indexes + user_version=1) and
    round-trip the store snapshot value-for-value."""
    import sqlite3

    _run(env, "get", "--lower", "1", "--upper", "3")
    db = str(env["tmp"] / "hnarchive.db")
    assert _run(env, "export", "--to", db) == 0
    assert "exported 3 rows" in capsys.readouterr().out

    con = sqlite3.connect(db)
    assert con.execute("PRAGMA user_version").fetchone()[0] == 1
    idx = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type = 'index' AND name LIKE 'index_items_%'"
    )}
    assert idx == {
        "index_items_id", "index_items_parent", "index_items_poll",
        "index_items_time", "index_items_type_time",
        "index_items_age_at_retrieval",
    }
    cols = [r[1] for r in con.execute("PRAGMA table_info(items)")]
    assert cols == [
        "id", "deleted", "type", "author", "time", "text", "dead",
        "parent", "poll", "url", "score", "title", "descendants", "retrieved",
    ]
    # value round-trip vs the store snapshot (parent lands in a TEXT-affinity
    # column, exactly like the reference's own INSERT path)
    rows = con.execute(
        "SELECT id, author, type, parent, time, deleted FROM items ORDER BY id"
    ).fetchall()
    assert rows == [
        (1, "alice", "story", None, T0, 0),
        (2, "bob", "comment", "1", T0 + 60, 0),
        (3, "eve", "comment", "2", T0 + 90, 0),
    ]
    # the expression index is usable (the reference's staleness-scan path)
    plan = con.execute(
        "EXPLAIN QUERY PLAN SELECT id FROM items WHERE retrieved - time > 100"
    ).fetchall()
    assert any("index_items_age_at_retrieval" in str(r) for r in plan), plan
    con.close()

    # multi-batch streaming path produces the identical file contents
    import sqlite3 as _sq

    from hnarchive_spark.sources.export import export_to_sqlite
    from hnarchive_spark.sources.items_store import ItemsStore

    store = ItemsStore(cli.get_spark(), env["store"])
    db2 = str(env["tmp"] / "hnarchive_b2.db")
    assert export_to_sqlite(store, db2, batch_rows=1) == 3
    c2 = _sq.connect(db2)
    assert (
        c2.execute("SELECT * FROM items ORDER BY id").fetchall()
        == _sq.connect(db).execute("SELECT * FROM items ORDER BY id").fetchall()
    )
    c2.close()


def test_cli_query_lists_and_runs(spark, tmp_path, capsys):
    from hnarchive_spark import cli

    args = cli.build_parser().parse_args(["query"])
    assert cli.cmd_query(spark, args) == 0
    listing = capsys.readouterr().out
    assert "q_flagship" in listing and "q_pagerank" in listing

    args = cli.build_parser().parse_args(
        ["query", "q_groupby_agg", "--sf-dir", "/root/testdata/sf0.001", "--json"]
    )
    assert cli.cmd_query(spark, args) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out and out[0].startswith("{")


def test_cli_oracle_check(spark, tmp_path, capsys, monkeypatch):
    from hnarchive_spark import cli

    monkeypatch.setattr(cli, "get_spark", lambda *_a, **_k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    rc = cli.main([
        "--store", str(tmp_path / "s"), "oracle_check",
        "q_point_lookup", "q_max_key",
        "--sf-dir", "/root/testdata/sf0.001",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "q_point_lookup\tMATCH" in out and "q_max_key\tMATCH" in out


def test_cli_compact(env, capsys):
    from hnarchive_spark.sources.items_store import ItemsStore

    _run(env, "get", "--lower", "1", "--upper", "3")
    capsys.readouterr()
    assert _run(env, "compact", "--bucket-size", "1000000") == 0
    out = capsys.readouterr().out
    assert "compacted to bucket_size=1000000" in out and "3 rows" in out
    store = ItemsStore(cli.get_spark(), env["store"])
    assert store.count() == 3 and store.latest_id() == 3


def test_cli_index_lifecycle(spark, tmp_path, capsys):
    """The index lifecycle verbs: compact-text bumps the version pointer,
    recover-text reports a clean index, prune drops the superseded tree,
    and rebuild-ivfpq retrains + republishes an aged index."""
    from pyspark.sql import functions as F

    from hnarchive_spark import cli
    from hnarchive_spark.sources.ann_index import build_ivfpq_index
    from hnarchive_spark.sources.index_version import current_index_version
    from hnarchive_spark.sources.text_index import (
        append_text_index,
        build_text_index,
    )
    from hnarchive_spark.tables import load

    sf = "/root/testdata/sf0.001"
    d = load(spark, sf, "documents")
    tpath = str(tmp_path / "text")
    build_text_index(d.filter(F.col("doc_id") % 2 == 0), tpath)
    append_text_index(spark, d.filter(F.col("doc_id") % 2 == 1), tpath)

    args = cli.build_parser().parse_args(["index", "compact-text", "--path", tpath])
    assert cli.cmd_index(spark, args) == 0
    assert current_index_version(tpath) == 1
    assert "now version 1" in capsys.readouterr().out

    args = cli.build_parser().parse_args(["index", "recover-text", "--path", tpath])
    assert cli.cmd_index(spark, args) == 0
    assert "recover: clean" in capsys.readouterr().out

    args = cli.build_parser().parse_args(["index", "prune", "--path", tpath])
    assert cli.cmd_index(spark, args) == 0
    assert "pruned" in capsys.readouterr().out
    import os as _os

    assert not _os.path.exists(_os.path.join(tpath, "postings"))  # flat tree gone
    assert _os.path.isdir(_os.path.join(tpath, "v1"))

    apath = str(tmp_path / "ivfpq")
    e = load(spark, sf, "embeddings")
    build_ivfpq_index(e.filter(F.col("vec_id") % 2 == 0), apath, 4, 8, 2)
    args = cli.build_parser().parse_args(
        ["index", "rebuild-ivfpq", "--path", apath, "--sf-dir", sf, "--train-mod", "2"]
    )
    assert cli.cmd_index(spark, args) == 0
    assert current_index_version(apath) == 1
    codes = spark.read.parquet(f"{apath}/v1/codes")
    assert codes.select("vec_id").distinct().count() == e.count()


def test_cli_index_compact_lsh(spark, tmp_path, capsys):
    """compact-lsh: appends pile small bucket files; the verb rewrites
    them into v1 behind the pointer and prune drops the flat layout."""
    import os as _os

    from pyspark.sql import functions as F

    from hnarchive_spark import cli
    from hnarchive_spark.sources.ann_index import append_lsh_index, build_index
    from hnarchive_spark.sources.index_version import current_index_version
    from hnarchive_spark.tables import load

    sf = "/root/testdata/sf0.001"
    e = load(spark, sf, "embeddings")
    path = str(tmp_path / "lsh")
    build_index(e.filter(F.col("vec_id") % 2 == 0), path)
    append_lsh_index(spark, e.filter(F.col("vec_id") % 2 == 1), path)

    args = cli.build_parser().parse_args(["index", "compact-lsh", "--path", path])
    assert cli.cmd_index(spark, args) == 0
    assert current_index_version(path) == 1
    assert "now version 1" in capsys.readouterr().out

    args = cli.build_parser().parse_args(["index", "prune", "--path", path])
    assert cli.cmd_index(spark, args) == 0
    capsys.readouterr()
    assert not [d for d in _os.listdir(path) if d.startswith("bucket=")]
    rows = spark.read.parquet(_os.path.join(path, "v1"))
    assert rows.select("vec_id").distinct().count() == e.count()


def test_cli_index_stats(spark, tmp_path, capsys):
    """`index stats` prints the maintenance ledger JSON; --reset clears
    it after printing."""
    import json as _json

    from pyspark.sql import functions as F

    from hnarchive_spark import cli
    from hnarchive_spark.sources.ann_index import build_index
    from hnarchive_spark.streaming.index_maint import maintain_lsh_index
    from hnarchive_spark.tables import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "lsh")
    build_index(e.filter(F.col("vec_id") % 2 == 0), path)
    maintain_lsh_index(path)(e, batch_id=0)

    args = cli.build_parser().parse_args(["index", "stats", "--path", path])
    assert cli.cmd_index(spark, args) == 0
    d = _json.loads(capsys.readouterr().out)
    assert d["batches"] == 1 and d["appended"] > 0 and d["skipped"] > 0

    args = cli.build_parser().parse_args(
        ["index", "stats", "--path", path, "--reset"]
    )
    assert cli.cmd_index(spark, args) == 0
    assert _json.loads(capsys.readouterr().out)["batches"] == 1  # prints, then clears
    args = cli.build_parser().parse_args(["index", "stats", "--path", path])
    assert cli.cmd_index(spark, args) == 0
    assert _json.loads(capsys.readouterr().out) == {
        "appended": 0, "skipped": 0, "batches": 0,
    }


def test_cli_lifecycle_verbs_consume_the_ledger(spark, tmp_path, capsys):
    """A successful compaction consumes the maintenance ledger that
    argued for it — needs_maintenance goes quiet until NEW appends."""
    from pyspark.sql import functions as F

    from hnarchive_spark import cli
    from hnarchive_spark.sources.ann_index import build_index
    from hnarchive_spark.streaming.index_maint import (
        maintain_lsh_index,
        needs_maintenance,
    )
    from hnarchive_spark.tables import load

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "lsh")
    build_index(e.filter(F.col("vec_id") % 2 == 0), path)
    maintain_lsh_index(path)(e, batch_id=0)
    assert needs_maintenance(path, max_batches=1)

    args = cli.build_parser().parse_args(["index", "compact-lsh", "--path", path])
    assert cli.cmd_index(spark, args) == 0
    assert "maintenance ledger consumed" in capsys.readouterr().out
    assert not needs_maintenance(path, max_batches=1)


def test_cli_index_compact_grams(spark, tmp_path, capsys):
    """compact-grams: appends pile small bucket files; the verb rewrites
    them into v1 behind the pointer with probe rows unchanged."""
    import os as _os

    from pyspark.sql import functions as F

    from hnarchive_spark import cli
    from hnarchive_spark.sources.gram_index import (
        append_gram_index,
        build_gram_index,
        probe_substring_spans,
    )
    from hnarchive_spark.sources.index_version import current_index_version
    from hnarchive_spark.tables import load

    sf = "/root/testdata/sf0.001"
    d = load(spark, sf, "documents")
    path = str(tmp_path / "grams")
    build_gram_index(spark, d.filter(F.col("doc_id") % 4 == 0), path)
    append_gram_index(spark, d.filter(F.col("doc_id") % 4 == 2), path)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    want = sorted(tuple(r) for r in probe_substring_spans(spark, batch, path).collect())

    args = cli.build_parser().parse_args(["index", "compact-grams", "--path", path])
    assert cli.cmd_index(spark, args) == 0
    assert current_index_version(path) == 1
    assert "now version 1" in capsys.readouterr().out
    got = sorted(tuple(r) for r in probe_substring_spans(spark, batch, path).collect())
    assert got == want

    args = cli.build_parser().parse_args(["index", "prune", "--path", path])
    assert cli.cmd_index(spark, args) == 0
    capsys.readouterr()
    assert not [f for f in _os.listdir(path) if f.startswith("bucket=")]


def test_cli_scd2_lifecycle(spark, tmp_path, capsys):
    """The scd2 verbs drive the full dimension lifecycle: build a cutoff,
    append the remainder, rebucket behind the pointer, forget users,
    read the ledger."""
    from hnarchive_spark import cli
    from hnarchive_spark.sources.scd2_store import read_scd2

    path = str(tmp_path / "dim")

    def run(argv):
        args = cli.build_parser().parse_args(argv)
        assert args.func(spark, args) == 0
        return capsys.readouterr().out

    base = ["scd2", "--path", path, "--sf-dir", "/root/testdata/sf0.001"]
    out = run(base[:1] + ["build"] + base[1:] + ["--before", "2024-01-20"])
    assert "built" in out
    out = run(base[:1] + ["append"] + base[1:] + ["--since", "2024-01-20"])
    assert "applied" in out and "applied 0" not in out

    # the CLI-maintained dimension equals the full recompute
    from hnarchive_spark.operators.scd2 import close_intervals, scd2_runs
    from hnarchive_spark.tables import load

    e = load(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    want = sorted(tuple(r) for r in close_intervals(scd2_runs(e)).collect())
    assert sorted(tuple(r) for r in read_scd2(spark, path).collect()) == want

    out = run(base[:1] + ["rebucket"] + base[1:] + ["--n-buckets", "8"])
    assert "now version 1" in out
    assert sorted(tuple(r) for r in read_scd2(spark, path).collect()) == want

    out = run(base[:1] + ["delete-users"] + base[1:] + ["--users", "3,35"])
    assert "deleted" in out and "deleted 0" not in out
    left = read_scd2(spark, path)
    from pyspark.sql import functions as F

    assert left.filter(F.col("user_id").isin([3, 35])).count() == 0

    out = run(base[:1] + ["stats"] + base[1:])
    assert out.strip().startswith("{")


def test_cli_maintenance_scheduler(spark, tmp_path, capsys, monkeypatch):
    """`cli maintenance`: detection over mixed index families, threshold-
    gated execution (verbs fire ONLY where the ledger tripped), dry-run
    side-effect-freedom, and ledger consumption after a real run."""
    import json as _json

    from pyspark.sql import functions as F

    from hnarchive_spark import cli
    from hnarchive_spark.sources.gram_index import build_gram_index
    from hnarchive_spark.sources.index_version import current_index_version
    from hnarchive_spark.sources.minhash_index import build_minhash_index
    from hnarchive_spark.streaming.index_maint import maintain_gram_index, maintain_minhash_index
    from hnarchive_spark.tables import load

    monkeypatch.setattr(cli, "get_spark", lambda *_a, **_k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    d = load(spark, "/root/testdata/sf0.001", "documents")
    aged = str(tmp_path / "roots" / "grams_aged")
    quiet = str(tmp_path / "roots" / "mh_quiet")
    build_gram_index(spark, d.filter(F.col("doc_id") % 4 == 0), aged, l=20)
    build_minhash_index(spark, d.filter(F.col("doc_id") % 2 == 0), quiet)

    # age the gram index: 3 maintenance batches (threshold will be 2);
    # the minhash index gets 1 (stays under threshold)
    for k in (1, 2, 3):
        maintain_gram_index(aged)(d.filter(F.col("doc_id") % 8 == k), batch_id=k)
    maintain_minhash_index(quiet)(d.filter(F.col("doc_id") % 2 == 1), batch_id=0)

    def _reports(*argv):
        rc = cli.main(["maintenance", *argv])
        assert rc == 0
        out = capsys.readouterr().out
        return [_json.loads(ln) for ln in out.splitlines() if ln.startswith("{")]

    roots = f"--scan-dir={tmp_path / 'roots'}"
    # dry run: gram due, minhash not; nothing executed, no version bump
    reps = {r["path"].rsplit("/", 1)[-1]: r for r in _reports(roots, "--max-batches=2", "--dry-run")}
    assert reps["grams_aged"]["kind"] == "gram" and reps["grams_aged"]["due"]
    assert not reps["grams_aged"]["executed"]
    assert reps["mh_quiet"]["kind"] == "minhash" and not reps["mh_quiet"]["due"]
    assert current_index_version(aged) is None

    # real run: the gram compaction fires, minhash untouched, ledger consumed
    reps = {r["path"].rsplit("/", 1)[-1]: r for r in _reports(roots, "--max-batches=2")}
    assert reps["grams_aged"]["executed"] and reps["grams_aged"]["result"].endswith("v1")
    assert not reps["mh_quiet"]["executed"]
    assert current_index_version(aged) == 1
    assert current_index_version(quiet) is None

    # the consumed ledger goes quiet: a second pass executes nothing
    reps = {r["path"].rsplit("/", 1)[-1]: r for r in _reports(roots, "--max-batches=2")}
    assert not reps["grams_aged"]["due"] and not reps["grams_aged"]["executed"]


def test_cli_maintenance_reports_tokenizer_drift(spark, tmp_path, capsys, monkeypatch):
    """maintenance --dry-run --corpus (VERDICT r16 #5): a tokenizer store
    whose training snapshot no longer covers the corpus is reported due
    with the `tokenizer extend` recommendation; after the extend the
    report goes quiet."""
    import json as _json

    from hnarchive_spark import cli
    from hnarchive_spark.sources.tokenizer_store import (
        build_tokenizer_store,
        extend_tokenizer_store,
    )
    from hnarchive_spark.tables import load

    monkeypatch.setattr(cli, "get_spark", lambda *_a, **_k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    tok = str(tmp_path / "roots" / "tok")
    build_tokenizer_store(spark, docs, tok, rounds=2)
    drifted = docs.select("doc_id", "text").union(
        spark.createDataFrame(
            [(10_000 + i, " ".join(f"xenoword{i}q{j}" for j in range(40)))
             for i in range(80)],
            "doc_id long, text string",
        )
    )
    corpus = str(tmp_path / "corpus.parquet")
    drifted.write.parquet(corpus)

    def _reports(*argv):
        assert cli.main(["maintenance", *argv]) == 0
        out = capsys.readouterr().out
        return [_json.loads(ln) for ln in out.splitlines() if ln.startswith("{")]

    [rec] = _reports(f"--paths={tok}", "--dry-run", f"--corpus={corpus}")
    assert rec["kind"] == "tokenizer" and rec["due"]
    assert "tokenizer extend" in rec["action"]
    assert rec["coverage"]["coverage_e6"] < 990_000

    extend_tokenizer_store(spark, drifted, tok, extra_rounds=1)
    [rec2] = _reports(f"--paths={tok}", "--dry-run", f"--corpus={corpus}")
    assert not rec2["due"] and rec2["coverage"]["coverage_e6"] == 1_000_000


def test_maintenance_detects_every_family(spark, tmp_path):
    """detect_index_kind: structural detection across the persisted
    families (the scheduler's no-registry claim)."""
    from pyspark.sql import functions as F

    from hnarchive_spark.plans.similarity import KMEANS_ITERS, KMEANS_K
    from hnarchive_spark.sources.contamination_index import build_contamination_index
    from hnarchive_spark.sources.gram_index import build_gram_index
    from hnarchive_spark.sources.maintenance import detect_index_kind
    from hnarchive_spark.sources.minhash_index import build_minhash_index
    from hnarchive_spark.sources.scd2_store import build_scd2_store
    from hnarchive_spark.sources.semdedup_index import build_semdedup_index
    from hnarchive_spark.tables import load

    d = load(spark, "/root/testdata/sf0.001", "documents").limit(40)
    e = load(spark, "/root/testdata/sf0.001", "embeddings").limit(40)
    ev = load(spark, "/root/testdata/sf0.001", "events").limit(200)

    p = {k: str(tmp_path / k) for k in ("gram", "minhash", "contamination", "scd2", "semdedup")}
    build_gram_index(spark, d, p["gram"], l=20)
    build_minhash_index(spark, d, p["minhash"])
    build_contamination_index(spark, d, p["contamination"])
    build_scd2_store(spark, ev.select("user_id", "ts", "event_id", "event_type"), p["scd2"])
    build_semdedup_index(spark, e, p["semdedup"], KMEANS_K, KMEANS_ITERS)

    for kind, path in p.items():
        assert detect_index_kind(path) == kind, (kind, path)
    assert detect_index_kind(str(tmp_path)) is None

    # a membership-bearing SemDeDup index has lists+centroids like plain
    # IVF — the training recipe in _META.json disambiguates it
    p2 = str(tmp_path / "semdedup_m")
    build_semdedup_index(spark, e, p2, KMEANS_K, KMEANS_ITERS,
                         store_assignments=True)
    assert detect_index_kind(p2) == "semdedup"

    # the raw-vector store (vectors/ bucket partitions)
    from hnarchive_spark.sources.vec_store import build_vec_store

    p3 = str(tmp_path / "vecstore")
    build_vec_store(spark, e, p3, n_buckets=4)
    assert detect_index_kind(p3) == "vecstore"

    # the trained-tokenizer store (_RULES.json behind the pointer) —
    # classified retrain-only, never scheduled for compaction
    from hnarchive_spark.sources.maintenance import _ACTIONS
    from hnarchive_spark.sources.tokenizer_store import build_tokenizer_store

    p4 = str(tmp_path / "tokenizer")
    build_tokenizer_store(spark, d, p4, rounds=2)
    assert detect_index_kind(p4) == "tokenizer"
    assert _ACTIONS["tokenizer"][0] is False


def test_cli_quality_model_and_ingest(spark, tmp_path, monkeypatch, capsys):
    """The r15 verbs: quality-model publish/stats (versioned store) and
    the composed gate-before-merge ingest with its per-stage ledger."""
    monkeypatch.setattr(cli, "get_spark", lambda *_a, **_k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    qm = str(tmp_path / "qmodel")
    assert cli.main(["quality-model", "publish", "--path", qm]) == 0
    out = capsys.readouterr().out
    assert "published" in out and out.strip().endswith("v1")
    assert cli.main(["quality-model", "stats", "--path", qm]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["version"] == 1 and st["meta"]["n_buckets"] == 256

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a clean document with several tokens"), (2, "")],
        "doc_id long, text string",
    ).write.parquet(src)
    store = str(tmp_path / "docstore")
    assert cli.main([
        "ingest", "--store", store, "--src", src,
        "--quality-threshold-e4", "0", "--model-path", qm,
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["merged"] == 1  # the empty doc is quarantined (unscored)
    assert rep["ledger"]["ingest_unscored"] == 1
    assert rep["ledger"]["ingest_merged"] == 1


def test_cli_ingest_vectors(spark, tmp_path, monkeypatch, capsys):
    """The composed vector-ingest verb: gate -> vec store -> membership
    -> IVF-PQ with the vingest_* ledger and its conservation law."""
    from pyspark.sql import functions as F

    from hnarchive_spark.sources.semdedup_index import build_semdedup_index
    from hnarchive_spark.sources.vec_store import build_vec_store, read_vec_store
    from hnarchive_spark.tables import load

    monkeypatch.setattr(cli, "get_spark", lambda *_a, **_k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    seed = e.filter(F.col("vec_id") % 2 == 0)
    vs = str(tmp_path / "vs")
    sd = str(tmp_path / "sd")
    build_vec_store(spark, seed, vs, n_buckets=8)
    build_semdedup_index(spark, seed, sd, k=8, iters=2, store_assignments=True)

    src = str(tmp_path / "src")
    novel = e.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 60))
    dup = seed.limit(2).select(
        (F.col("vec_id") + 9_000_001).alias("vec_id"), "embedding", "label"
    )
    novel.unionByName(dup).write.parquet(src)

    assert cli.main([
        "ingest_vectors", "--store", vs, "--src", src,
        "--semdedup-index", sd, "--t-e6", "1000000",
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    led = rep["ledger"]
    assert rep["appended"] == novel.count()
    assert led["vingest_neardup"] == 2
    assert led["vingest_rows"] == (
        led["vingest_neardup"] + led["vingest_appended"] + led["vingest_skipped"]
    )
    assert read_vec_store(spark, vs).count() == seed.count() + novel.count()


def test_cli_release_manifest_crosschecks(spark, tmp_path, monkeypatch, capsys):
    """The release verb (VERDICT r15 #5): one CLI run over the fixture
    tables must write the shard-partitioned selection and a manifest
    whose stage counts (a) obey the conservation law and (b) CROSS-CHECK
    against the oracled queries on the same fixture — stages 0-4 equal
    q_curation_funnel's rows, and the shard audit equals the
    q_shard_assignment recipe (shared shard_assign helper) recomputed
    over the release's own selection."""
    import os

    from pyspark.sql import functions as F

    from hnarchive_spark import cli
    from hnarchive_spark.plans.registry import REGISTRY, _ensure_loaded
    from hnarchive_spark.plans.release import (
        latest_release_manifest,
        release_root,
        shard_assign,
    )

    monkeypatch.setattr(cli, "get_spark", lambda *_a, **_k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "release")
    assert cli.main(["release", "--out", out, "--sf-dir", sf]) == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # releases publish as <out>/v<N> behind the atomic _CURRENT pointer
    # (r17) — readers resolve through release_root, never a raw path
    root = release_root(out)
    assert root == os.path.join(out, "v1")
    manifest = latest_release_manifest(out)
    assert printed == manifest
    assert manifest["version"] == 1
    assert manifest["conservation_ok"]
    # the REAL invariants (the fates' sum telescopes to raw by
    # construction, so summation alone cannot fail — review r16):
    # subset monotonicity (no stage invents rows) and the final fate
    # equal to the independently counted selection
    assert all(v >= 0 for v in manifest["fates"].values())
    assert manifest["fates"]["selected"] == manifest["stages"][-1]["docs"]
    # every stage row carries the same keys (schema-homogeneous manifest)
    assert all(
        set(s) == {"stage", "name", "docs", "tokens"} for s in manifest["stages"]
    )

    # cross-check stages 0-4 against the ORACLED funnel on the same fixture
    _ensure_loaded()
    funnel = {
        r["stage_name"]: (int(r["n_docs"]), int(r["n_tokens"]))
        for r in REGISTRY["q_curation_funnel"].spark(spark, sf).collect()
    }
    for s in manifest["stages"][:5]:
        assert (s["docs"], s["tokens"]) == funnel[s["name"]], s

    # the stage frames are PUBLISHED audit artifacts, and the funnel's
    # domain_cap count equals the written final frame's row count
    final = spark.read.parquet(os.path.join(root, "stages", "final"))
    assert final.count() == funnel["domain_cap"][0]

    # the written selection matches the manifest and the shard audit
    sel = spark.read.parquet(os.path.join(root, "selected"))
    n_sel = manifest["fates"]["selected"]
    assert sel.count() == n_sel == manifest["stages"][-1]["docs"]
    audit = {
        (r["source"], r["shard_id"]): (r["n_docs"], r["shard_tokens"])
        for r in manifest["shards"]
    }
    assert sum(d for d, _t in audit.values()) == n_sel
    assert sum(t for _d, t in audit.values()) == manifest["stages"][-1]["tokens"]

    # shard audit == q_shard_assignment's recipe over the SAME selection
    want = {
        (r["source"], int(r["shard_id"])): (int(r["n_docs"]), int(r["t"]))
        for r in shard_assign(
            sel.select("source", "doc_id", "n_tokens"), manifest["params"]["n_shards"]
        )
        .groupBy("source", "shard_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert audit == want
    # and the written rows agree with their own shard/seq columns
    assert {
        (r["source"], r["shard_id"]): (r["n"], r["t"])
        for r in sel.groupBy("source", "shard_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t"))
        .collect()
    } == audit
    # datacard conservation: per-source totals re-add to the selection
    assert sum(c["n_docs"] for c in manifest["datacard"]) == n_sel


def test_cli_tokenizer_lifecycle(spark, tmp_path, monkeypatch, capsys):
    """tokenizer train -> extend -> stats: the CLI face of the trained-
    tokenizer store; extend's published rules equal training longer from
    scratch (the store-level identity test, driven end to end)."""
    import os

    from hnarchive_spark import cli
    from hnarchive_spark.plans.textops import induce_bpe_rules
    from hnarchive_spark.sources.tokenizer_store import load_tokenizer_rules
    from hnarchive_spark.tables import load

    monkeypatch.setattr(cli, "get_spark", lambda *_a, **_k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    src = "/root/testdata/sf0.001/documents.parquet"
    root = str(tmp_path / "tok")

    assert cli.main(["tokenizer", "train", "--path", root, "--src", src,
                     "--rounds", "3"]) == 0
    assert "3 rules" in capsys.readouterr().out
    assert cli.main(["tokenizer", "extend", "--path", root, "--src", src,
                     "--rounds", "2"]) == 0
    assert "5 rules" in capsys.readouterr().out
    assert cli.main(["tokenizer", "stats", "--path", root]) == 0
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["version"] == 2 and len(stats["rules"]) == 5
    assert load_tokenizer_rules(root) == induce_bpe_rules(
        spark, load(spark, "/root/testdata/sf0.001", "documents"), rounds=5
    )
    # missing-args contracts are loud (main() converts the SystemExit to rc=1)
    assert cli.main(["tokenizer", "extend", "--path", root, "--src", src]) == 1


def test_cli_release_with_trained_tokenizer_unit(spark, tmp_path, monkeypatch, capsys):
    """release --tokenizer: the budget/pack/shard token unit becomes the
    TRAINED tokenizer's token count (the unit training actually
    consumes).  The manifest records the unit + tokenizer version, the
    selection's n_tokens equal an independent q_bpe_encode-style
    recomputation for those doc_ids, and the conservation law holds
    unchanged."""
    import os

    from pyspark.sql import functions as F

    from hnarchive_spark import cli
    from hnarchive_spark.plans.textops import bpe_token_count
    from hnarchive_spark.sources.tokenizer_store import (
        build_tokenizer_store,
        load_tokenizer_rules,
    )
    from hnarchive_spark.tables import load

    monkeypatch.setattr(cli, "get_spark", lambda *_a, **_k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    tok = str(tmp_path / "tok")
    build_tokenizer_store(spark, docs, tok, rounds=3)
    out = str(tmp_path / "release")

    assert cli.main(["release", "--out", out, "--sf-dir", sf,
                     "--tokenizer", tok, "--emit-tokens"]) == 0
    from hnarchive_spark.plans.release import latest_release_manifest, release_root

    manifest = latest_release_manifest(out)
    assert manifest["params"]["token_unit"] == "bpe"
    assert manifest["params"]["emit_tokens"] is True
    assert manifest["params"]["tokenizer_version"] == 1
    assert manifest["params"]["tokenizer_rules"] == 3
    # the unflagged CLI default is the Arrow kernel (VERDICT r17 #1) —
    # and the independent recomputation below uses the CHAIN
    # (bpe_token_count), so this test cross-checks kernel vs chain too
    assert manifest["params"]["tokenizer_encoder"] == "kernel"
    assert manifest["conservation_ok"]

    sel = spark.read.parquet(os.path.join(release_root(out), "selected"))
    rules = load_tokenizer_rules(tok)
    want = docs.select("doc_id", bpe_token_count(rules).alias("bt"))
    diff = sel.join(want, "doc_id").filter(F.col("n_tokens") != F.col("bt"))
    assert sel.count() > 0 and diff.count() == 0
    # --emit-tokens: every shipped row carries its id array, sized
    # exactly to the metered token count (losslessness is locked in
    # tests/test_release_lifecycle.py)
    assert "token_ids" in sel.columns
    assert sel.filter(F.size("token_ids") != F.col("n_tokens")).count() == 0
    # shard audit + datacard still re-add to the selection in the new unit
    assert sum(s["shard_tokens"] for s in manifest["shards"]) == (
        manifest["stages"][-1]["tokens"]
    )


def test_cli_maintenance_executes_tokenizer_extend(spark, tmp_path, capsys, monkeypatch):
    """maintenance --corpus WITHOUT --dry-run (VERDICT r17 #5): a due
    tokenizer extend is EXECUTED — a new version publishes with extra
    merge rounds, the corpus is unioned into the freshness snapshot,
    and the report carries coverage_after proving the recommendation
    cleared in the same pass."""
    import json as _json

    from hnarchive_spark import cli
    from hnarchive_spark.sources.index_version import current_index_version
    from hnarchive_spark.sources.tokenizer_store import (
        build_tokenizer_store,
        load_tokenizer_rules,
    )
    from hnarchive_spark.tables import load

    monkeypatch.setattr(cli, "get_spark", lambda *_a, **_k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    tok = str(tmp_path / "tok")
    build_tokenizer_store(spark, docs, tok, rounds=2)
    n_rules_before = len(load_tokenizer_rules(tok))
    drifted = docs.select("doc_id", "text").union(
        spark.createDataFrame(
            [(20_000 + i, " ".join(f"novoterm{i}z{j}" for j in range(40)))
             for i in range(80)],
            "doc_id long, text string",
        )
    )
    corpus = str(tmp_path / "corpus.parquet")
    drifted.write.parquet(corpus)

    assert cli.main(["maintenance", f"--paths={tok}", f"--corpus={corpus}",
                     "--tokenizer-extend-rounds", "2"]) == 0
    out = capsys.readouterr().out
    [rec] = [_json.loads(ln) for ln in out.splitlines() if ln.startswith("{")]
    assert rec["kind"] == "tokenizer" and rec["due"] and rec["executed"]
    assert rec["coverage"]["coverage_e6"] < 990_000  # the pre-extend audit
    # the recommendation PROVABLY cleared: post-extend coverage is full
    # (the extend unions the audit corpus into the snapshot)
    assert rec["coverage_after"]["coverage_e6"] == 1_000_000
    assert "extended +2 rounds" in rec["result"]
    # a new version published with the extra merges appended
    assert current_index_version(tok) == 2
    assert len(load_tokenizer_rules(tok)) == n_rules_before + 2

    # the next pass is quiet — nothing re-executes
    assert cli.main(["maintenance", f"--paths={tok}", f"--corpus={corpus}"]) == 0
    out2 = capsys.readouterr().out
    [rec2] = [_json.loads(ln) for ln in out2.splitlines() if ln.startswith("{")]
    assert not rec2["due"] and not rec2["executed"]
    assert rec2["coverage"]["coverage_e6"] == 1_000_000
    assert current_index_version(tok) == 2
