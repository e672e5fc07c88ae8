"""Temporal (as-of) table join — the reference's temporal table
functions (``FT/flink-table/flink-table-api-java/.../Table.java:131``
``createTemporalTableFunction``; joined via ``LATERAL TABLE`` /
``FOR SYSTEM_TIME AS OF`` in the planners): each probe row joins the
LATEST version of a versioned table whose version time is at or before
the probe row's time.

Spark-first shape — the tagged-union analytic scan, not a per-row
lookup: version rows and probe rows union into one stream, shuffle ONCE
on the join key, sort within partitions by (time, version-first), and
every probe row picks up the running ``last(..., ignorenulls=True)`` of
the version row carried as ONE struct (so NULL attributes inside the
winning version survive). Cost is one shuffle + one partition sort
regardless of how many probe rows share a key — at 100 TB this is the
plan an interval/point-in-time join needs (a correlated per-row lookup
or a range join would be quadratic in hot keys). Probe rows before the
first version are dropped (inner temporal join, the reference's
semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def temporal_join(
    probe: DataFrame,
    versions: DataFrame,
    on: str,
    probe_time: str,
    version_time: str,
    version_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: ``probe`` rows against the latest ``versions`` row
    per ``on`` key with ``version_time <= probe_time``.

    Version rows sort BEFORE probe rows at equal timestamps (AS OF is
    inclusive). ``tiebreak`` (a column of ``versions``) orders versions
    sharing the same (key, version_time) so the pick is deterministic —
    the last one in (version_time, tiebreak) order wins, mirroring
    "latest write wins" on a versioned history table.

    Output: every surviving probe row with ``version_cols`` appended.
    """
    # The winning version rides as ONE struct, so a NULL in a versioned
    # attribute stays NULL — per-column ignorenulls fills would reach
    # back to an OLDER version for just that column, silently mixing two
    # versions into one output row.
    v_struct = F.struct(*[F.col(c) for c in version_cols])
    p = (
        probe.withColumn("_tj_v", F.lit(0))
        .withColumn("_tj_tb", F.lit(None).cast("long"))
        .withColumn(
            "_tj_row",
            F.lit(None).cast(
                "struct<"
                + ",".join(
                    f"{c}:{versions.schema[c].dataType.simpleString()}"
                    for c in version_cols
                )
                + ">"
            ),
        )
    )
    v = versions.select(
        F.col(on),
        F.col(version_time).alias(probe_time),
        F.lit(1).alias("_tj_v"),
        (
            F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")
        ).alias("_tj_tb"),
        v_struct.alias("_tj_row"),
    )
    probe_cols = [c for c in probe.columns]
    u = p.select(
        on, probe_time, "_tj_v", "_tj_tb", "_tj_row",
        *[c for c in probe_cols if c not in (on, probe_time)],
    ).unionByName(
        v.select(
            on, probe_time, "_tj_v", "_tj_tb", "_tj_row",
            *[F.lit(None).cast(p.schema[c].dataType).alias(c)
              for c in probe_cols if c not in (on, probe_time)],
        )
    )
    # versions first at equal time (_tj_v DESC), then tiebreak order so
    # the running last() sees the winning version most recently
    scan = (
        Window.partitionBy(on)
        .orderBy(F.col(probe_time).asc(), F.col("_tj_v").desc(), F.col("_tj_tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn(
        "_tj_cur",
        F.last(F.when(F.col("_tj_v") == 1, F.col("_tj_row")), ignorenulls=True).over(
            scan
        ),
    )
    return (
        filled.filter((F.col("_tj_v") == 0) & F.col("_tj_cur").isNotNull())
        .select(
            *probe_cols,
            *[F.col(f"_tj_cur.{c}").alias(c) for c in version_cols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | None,
    left_val: str,
    right_val: str,
    lower,
    upper,
) -> DataFrame:
    """Banded range join: rows of ``left`` paired with rows of ``right``
    sharing the equi-key(s) ``on`` where
    ``right_val ∈ [left_val + lower, left_val + upper]`` — the general
    form of the interval join (q22) and the band joins the reference
    expresses as JoinFunction over key-partitioned ranges.

    Scale shape (same argument as q22, generalized): a raw range
    predicate on an equi-key degrades to an O(n²/key) inner scan under
    sort-merge. Instead bucketize the value axis into cells of width
    ``upper - lower``: the right side lands in exactly ONE cell, the
    left target interval spans AT MOST TWO adjacent cells, so exploding
    the left row to its covered cell range turns the join into a plain
    hash join on (key…, cell) whose candidate set is the 2-cell
    neighborhood; the exact band predicate then filters. Every matching
    pair appears exactly once (one cell per right row; each covered
    cell exploded once on the left).

    ``lower``/``upper`` are numeric (``upper > lower``); for event-time
    bands convert with ``unix_timestamp`` first (q22 shows the
    pattern). Columns ``left_val``/``right_val`` must be numeric.
    """
    if not upper > lower:
        raise ValueError("range_join needs upper > lower (a nonempty band)")
    keys = [on] if isinstance(on, str) else list(on or [])
    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"rename columns shared by both sides (ambiguous in the "
            f"output and the band predicate): {sorted(clash)}"
        )
    if "_rj_g" in left.columns or "_rj_g" in right.columns:
        raise ValueError(
            "column name _rj_g is reserved by range_join (it would be "
            "clobbered by the internal cell id) — rename it"
        )
    w = upper - lower
    gmin = F.floor((F.col(left_val) + F.lit(lower)) / F.lit(w))
    gmax = F.floor((F.col(left_val) + F.lit(upper)) / F.lit(w))
    l2 = left.withColumn("_rj_g", F.explode(F.sequence(gmin, gmax)))
    r2 = right.withColumn("_rj_g", F.floor(F.col(right_val) / F.lit(w)))
    band = F.col(right_val).between(
        F.col(left_val) + F.lit(lower), F.col(left_val) + F.lit(upper)
    )
    return l2.join(r2, keys + ["_rj_g"]).filter(band).drop("_rj_g")
