"""URL canonicalization — the Common-Crawl refetch-collapse rule set,
shared by the registered q_url_dedup query (plans/curation.py), its
DuckDB oracle generator, and the streaming ingest gate's URL-dedup
stage (streaming/ingest.py).

Every regexp is ANCHORED (^ or $), so Spark's replace-ALL and DuckDB's
replace-FIRST semantics coincide, and no pattern uses a backreference —
the two engines' replacement syntaxes differ ($1 vs \\1).  Order
matters: lowercase the scheme+host prefix, force https, drop the
fragment, drop the query, drop the default port, drop www., drop the
trailing slash.  The chain is idempotent (asserted in
tests/test_ingest_gate.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CANON_STEPS: tuple[tuple[str, str], ...] = (
    ("^http://", "https://"),
    ("#.*$", ""),
    ("[?].*$", ""),
    (":443/", "/"),  # plain-string-safe: no colons in any sane path
    (":443$", ""),
    ("^https://www[.]", "https://"),
    ("/$", ""),
)

_PREFIX_RE = "^([a-zA-Z]+://[^/?#]+)"


def canonical_url(url: Column) -> Column:
    """Spark column form: scheme+host lowercased (path case preserved),
    then the CANON_STEPS chain."""
    out = F.concat(
        F.lower(F.regexp_extract(url, _PREFIX_RE, 1)),
        F.regexp_replace(url, F.lit("^[a-zA-Z]+://[^/?#]+"), F.lit("")),
    )
    for pat, rep in CANON_STEPS:
        out = F.regexp_replace(out, F.lit(pat), F.lit(rep))
    return out


def canonical_url_sql(expr: str) -> str:
    """DuckDB SQL form of the SAME chain (oracle side)."""
    out = (
        f"lower(regexp_extract({expr}, '{_PREFIX_RE}', 1)) || "
        f"regexp_replace({expr}, '^[a-zA-Z]+://[^/?#]+', '')"
    )
    for pat, rep in CANON_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{rep}')"
    return out
