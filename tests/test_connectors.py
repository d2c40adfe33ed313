"""Connector round-trip edge cases: the adversarial text shapes the
registered q_jsonl_roundtrip / q_csv_roundtrip queries can't exercise
(the synthetic corpus has no newlines or empty strings)."""

from __future__ import annotations

import tempfile


HARD_ROWS = [
    (1, "plain text"),
    (2, "line one\nline two"),         # embedded newline (multiLine read)
    (3, ""),                            # empty string vs NULL disambiguation
    (4, 'has "quotes", commas, and\ttabs'),
    (5, None),                          # real NULL must stay NULL
    (6, "  leading and trailing  "),
]
SCHEMA = "doc_id long, text string"


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=str)


def test_csv_roundtrip_survives_newlines_empties_nulls(spark):
    d = spark.createDataFrame(HARD_ROWS, SCHEMA)
    path = tempfile.mkdtemp(prefix="csv_hard_") + "/docs"
    (
        d.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("emptyValue", '""')
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
    )
    back = (
        spark.read.schema(SCHEMA)
        .option("header", "true")
        .option("escape", '"')
        .option("multiLine", "true")
        .option("nullValue", "\\N")
        .option("emptyValue", "")
        .csv(path)
    )
    assert _rows(back) == _rows(d)


def test_jsonl_roundtrip_survives_newlines_empties_nulls(spark):
    d = spark.createDataFrame(HARD_ROWS, SCHEMA)
    path = tempfile.mkdtemp(prefix="jsonl_hard_") + "/docs"
    d.write.mode("overwrite").json(path)
    back = spark.read.schema(SCHEMA).json(path)
    assert _rows(back) == _rows(d)
