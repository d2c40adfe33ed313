"""Z-order (Morton) clustering for multi-dimensional file skipping.

A table range-partitioned and sorted on ONE key prunes scans on that key
only; predicates on a second column hit every file.  Interleaving the bits
of two keys into a single Morton value and laying files out along it gives
every file a tight min/max envelope on BOTH columns, so footer-stats
skipping (parquet row-group / file pruning, Delta-style data skipping)
works for 2-D boxes — the standard layout trick behind Delta OPTIMIZE
ZORDER BY and Iceberg's sort orders.

Everything here is JVM-side Column arithmetic (unrolled shifts/masks — no
UDF) plus a pyarrow footer reader for the skipping estimate; nothing reads
data rows to decide what to skip.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension bits: keys up to 65535 after offsetting


def z_value(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1.  Unrolled into
    2*bits shift/mask terms — whole-stage-codegen friendly, no Python."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(1), 2 * i)
            + F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(1), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int,
    bits: int = Z_BITS,
) -> None:
    """Lay ``df`` out along the Morton curve of (x_col, y_col): range-
    partition by z into ``n_files`` files, sort within each.  Each file
    then covers a compact curve segment => tight per-file min/max on BOTH
    columns in the parquet footer."""
    (
        df.withColumn("_z", z_value(F.col(x_col), F.col(y_col), bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_ranges(path: str, cols: list[str]) -> list[dict]:
    """Per-file (min, max) of ``cols`` from parquet FOOTERS only — the
    exact metadata a skipping scan consults; no row is read."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        ranges = {c: [None, None] for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                cname = col.path_in_schema
                if cname in ranges and col.statistics is not None:
                    lo, hi = col.statistics.min, col.statistics.max
                    cur = ranges[cname]
                    cur[0] = lo if cur[0] is None else min(cur[0], lo)
                    cur[1] = hi if cur[1] is None else max(cur[1], hi)
        out.append({"file": name, **{c: tuple(v) for c, v in ranges.items()}})
    return out


def files_matching_box(path: str, box: dict[str, tuple]) -> tuple[int, int]:
    """(matching, total) file counts for a conjunction of per-column range
    predicates, decided purely from footer stats — the file-skipping a
    min/max-pruning reader achieves on this layout."""
    stats = file_column_ranges(path, list(box))
    total = len(stats)
    matching = 0
    for st in stats:
        hit = True
        for c, (lo, hi) in box.items():
            fmin, fmax = st[c]
            if fmin is None or fmax < lo or fmin > hi:
                hit = False
                break
        matching += hit
    return matching, total
