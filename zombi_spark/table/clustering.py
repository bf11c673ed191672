"""Data-clustering orders for compaction rewrites — the sort / z-order
strategies of Iceberg's ``rewrite_data_files`` (the reference's compaction,
compaction.rs:128-396, only bin-packs; external Iceberg engines offer
``strategy => 'sort'`` / ``sort_order => 'zorder(a, b)'`` on the same
tables, so the parity surface includes them).

Why it matters at 100 TB: file skipping prunes on PER-FILE min/max bounds
(manifests.py `_BOUND_COLS`; scan planning in EventTable.scan_files and
the zombi data source). A bin-packed rewrite sorted by ``(timestamp_ms,
sequence)`` gives every file the full width of every OTHER column — a
``partition = 3`` filter admits every file. Rewriting the same rows
z-ordered on ``(timestamp_ms, partition)`` makes each file a tight
rectangle in that space, so point/range predicates on EITHER column
prune; a plain multi-column sort clusters the leading column perfectly
and the trailing ones within it.

The z-value is the classic bit-interleave of fixed-width normalized
ranks: each column is min/max-normalized into ``bits`` integer buckets
(one tiny agg computes the bounds — O(columns), no shuffle beyond the
scan), then bit *i* of column *j* lands at position ``i·k + j``. All
pure Column arithmetic — shifts and masks inside whole-stage codegen,
no UDF. ``bits=16`` with k ≤ 3 columns stays within a signed 64-bit
long (48 bits used).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# stats-tracked columns (manifests._BOUND_COLS) — clustering on anything
# else would reorder data no reader can prune on; z-order additionally
# needs numeric normalization, so strings sort but don't interleave
CLUSTERABLE_COLUMNS = ("timestamp_ms", "sequence", "partition", "topic")
ZORDERABLE_COLUMNS = ("timestamp_ms", "sequence", "partition")

_DEFAULT_BITS = 16


def _normalized(col: Column, mn, mx, bits: int) -> Column:
    """min/max-normalize into [0, 2^bits) as a long; a constant column
    (mn == mx) maps to 0 — it contributes nothing to the ordering."""
    span = mx - mn
    if span <= 0:
        return F.lit(0).cast("long")
    buckets = (1 << bits) - 1
    scaled = ((col.cast("double") - F.lit(float(mn))) * F.lit(buckets / span)).cast(
        "long"
    )
    return F.greatest(F.lit(0), F.least(F.lit(buckets), scaled))


def zorder_value(
    columns: list[str],
    bounds: dict[str, tuple],
    bits: int = _DEFAULT_BITS,
) -> Column:
    """The interleaved z-value Column for ``columns`` given per-column
    ``bounds[name] = (min, max)``. Deterministic, pure Column arithmetic."""
    k = len(columns)
    if not 2 <= k <= 3:
        raise ValueError(f"z-order wants 2-3 columns, got {k}")
    if bits * k > 62:
        raise ValueError(f"bits={bits} × {k} columns overflows a signed long")
    norms = [
        _normalized(F.col(c), bounds[c][0], bounds[c][1], bits) for c in columns
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, n in enumerate(norms):
            bit = F.shiftright(n, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def column_bounds(df: DataFrame, columns: list[str]) -> dict[str, tuple]:
    """One aggregate job → {col: (min, max)} for normalization. At scale
    this is a single scan-and-reduce over the rewrite's own input (which
    the rewrite reads anyway); manifest stats could substitute when
    every input file carries them."""
    aggs = []
    for c in columns:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))
    row = df.agg(*aggs).first()
    return {
        c: (row[f"__mn_{c}"] or 0, row[f"__mx_{c}"] or 0) for c in columns
    }


def validate_clustering_spec(
    strategy: str,
    sort_columns: list[str] | None,
    extracted_int_columns: tuple[str, ...] | list[str] = (),
    extracted_sortable_columns: tuple[str, ...] | list[str] = (),
) -> None:
    """Static validation of a (strategy, sort_columns) pair — no
    DataFrame, no bounds scan. Shared by :func:`clustering_sort_columns`
    at rewrite time and :class:`~zombi_spark.table.maintenance.
    MaintenancePolicy` at CONSTRUCTION, so a misconfigured scheduled
    recluster (zorder with 1 column, a non-clusterable column) fails
    fast instead of erroring on every tick forever (ADVICE r13).

    ``extracted_int_columns`` are a table's schema-config integer
    columns: since r14 they carry per-file ``col_stats`` bounds
    (event_table._parquet_file_entry), so clustering on them yields
    readable, prunable layout — both as sort leaders and as z-order
    dimensions (integers normalize exactly).
    ``extracted_sortable_columns`` are the remaining stat-bounded
    extracted columns (r15: strings with Iceberg-truncated bounds,
    NaN-guarded doubles, booleans) — valid SORT leaders (their bounds
    prune), but never z-order dimensions (no exact fixed-width
    normalization)."""
    if strategy == "binpack":
        return
    if strategy not in ("sort", "zorder"):
        raise ValueError(f"unknown strategy {strategy!r}: binpack | sort | zorder")
    if not sort_columns:
        raise ValueError(f"strategy {strategy!r} requires sort_columns")
    clusterable = (
        set(CLUSTERABLE_COLUMNS)
        | set(extracted_int_columns)
        | set(extracted_sortable_columns)
    )
    unknown = [c for c in sort_columns if c not in clusterable]
    if unknown:
        raise ValueError(
            f"cannot cluster on {unknown}: per-file bounds exist only for "
            f"{CLUSTERABLE_COLUMNS} (manifests._BOUND_COLS) and the "
            f"table's extracted stat columns "
            f"{tuple(extracted_int_columns) + tuple(extracted_sortable_columns)} "
            "(col_stats) — clustering on anything else would reorder data "
            "no reader can prune on"
        )
    if strategy == "zorder":
        zorderable = set(ZORDERABLE_COLUMNS) | set(extracted_int_columns)
        non_numeric = [c for c in sort_columns if c not in zorderable]
        if non_numeric:
            raise ValueError(
                f"z-order needs numeric columns ({ZORDERABLE_COLUMNS} + "
                f"extracted ints); got {non_numeric} — use strategy='sort' "
                "for strings"
            )
        k = len(sort_columns)
        if not 2 <= k <= 3:
            raise ValueError(f"z-order wants 2-3 columns, got {k}")


def clustering_sort_columns(
    df: DataFrame,
    strategy: str,
    sort_columns: list[str] | None,
    extracted_int_columns: tuple[str, ...] | list[str] = (),
    extracted_sortable_columns: tuple[str, ...] | list[str] = (),
) -> list[Column]:
    """The within-storage-partition sort for a compaction rewrite.

    - ``binpack``: the canonical (timestamp_ms, sequence) order — the
      reference's behavior and the default.
    - ``sort``: the caller's columns, leading-column clustering.
    - ``zorder``: one interleaved z-value over the caller's columns —
      multi-dimensional clustering.

    Every strategy preserves rows exactly; only the LAYOUT (and hence the
    per-file bounds) changes.
    """
    validate_clustering_spec(
        strategy, sort_columns, extracted_int_columns, extracted_sortable_columns
    )
    if strategy == "binpack":
        return [F.col("timestamp_ms"), F.col("sequence")]
    if strategy == "sort":
        return [F.col(c) for c in sort_columns]
    bounds = column_bounds(df, sort_columns)
    return [zorder_value(sort_columns, bounds)]
