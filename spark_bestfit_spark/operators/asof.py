"""As-of (point-in-time) and range (interval) joins — time-series
operators Spark lacks natively, composed from built-in DataFrame ops
(no UDFs).

``asof_join(left, right, ...)`` attaches to each left row the most
recent right row at-or-before its timestamp (per key). The plan is the
classic union-and-carry-forward construction:

    tag sources -> unionByName -> Window(partitionBy keys,
    orderBy (time, src)) last(right columns, ignorenulls) -> keep left

Shuffle profile: ONE shuffle on the key columns (the window), identical
to what any join on those keys would pay — no range-explosion, no
per-row Python, and whole-stage codegen end to end. Skewed keys can be
pre-salted upstream; tolerance filtering is a map-side predicate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = [
    "asof_join",
    "golden_record",
    "interval_join",
    "range_join",
    "rolling_stats",
    "latest_by_key",
    "scd2_history",
    "snapshot_diff",
    "apply_cdc",
]


def latest_by_key(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Snapshot-latest deduplication: ONE row per key — the row with
    the greatest ``ts_col`` (ties broken by ``tiebreak_col``; pass a
    unique id for a fully deterministic snapshot) — with every input
    column preserved. The compact-a-changelog / latest-record idiom of
    every warehouse.

    Implemented as ``max_by(struct(<all other columns>), struct(ts,
    tiebreak))`` in ONE groupBy: unlike the ``row_number() = 1``
    window idiom this never sorts by timestamp and combines map-side
    (each partition keeps one candidate row per key before the
    shuffle), so the exchange carries at most |keys| rows per
    partition — the right shape when the changelog has many updates
    per key, which is the only time compaction matters. (The struct
    aggregate compiles to a SortAggregate — a partition-local sort by
    the KEY for aggregation, applied to the pre-reduced relation, not
    an ORDER BY ts over data rows.)
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    others = [c for c in df.columns if c not in keys]
    if not others:
        raise ValueError("latest_by_key needs at least one non-key column")
    ord_cols = [F.col(ts_col)]
    if tiebreak_col is not None:
        ord_cols.append(F.col(tiebreak_col))
    return (
        df.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in others]),
                F.struct(*ord_cols),
            ).alias("_r")
        )
        .select(*keys, "_r.*")
    )


def golden_record(
    df: DataFrame,
    entity_col: str,
    attr_col: str,
    value_col: str,
    ts_col: str,
    attributes: list,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Survivorship merge over an EAV changelog: ONE row per entity
    with, for EACH attribute independently, the most recent NON-NULL
    value — the "golden record" idiom of MDM / identity-resolution
    pipelines. Unlike :func:`latest_by_key` (whole latest row), each
    attribute survives from whichever row last set it.

    ``attributes`` is the EXPLICIT attribute domain (the
    ``pivot_counts`` convention — no eager distinct scan to discover
    it). The plan is ONE map-side-combinable groupBy on the entity:
    per attribute a conditional ``max_by(value, when(attr = a AND
    value IS NOT NULL, struct(ts, tiebreak)))`` — rows with a null
    ordering are ignored by the aggregate, so nulls and other
    attributes never displace a survived value. No pivot shuffle, no
    per-attribute pass, no window sort; the exchange carries at most
    |entities| pre-reduced rows per partition.

    Output: entity, one column per attribute (named by the attribute),
    ``last_updated`` (max ts over ALL rows of the entity) and
    ``n_versions`` (changelog length).
    """
    if not attributes:
        raise ValueError("attributes must be a non-empty explicit domain")
    ord_cols = [F.col(ts_col)]
    if tiebreak_col is not None:
        ord_cols.append(F.col(tiebreak_col))
    order = F.struct(*ord_cols)
    aggs = [
        F.max_by(
            F.col(value_col),
            F.when(
                (F.col(attr_col) == F.lit(a))
                & F.col(value_col).isNotNull(),
                order,
            ),
        ).alias(str(a))
        for a in attributes
    ]
    aggs.append(F.max(ts_col).alias("last_updated"))
    aggs.append(F.count(F.lit(1)).alias("n_versions"))
    return df.groupBy(entity_col).agg(*aggs)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: list | None = None,
    bucket_width=None,
    how: str = "inner",
) -> DataFrame:
    """Join points to the intervals containing them
    (``start <= point <= end``), optionally per ``by`` key.

    Without ``bucket_width`` Spark plans an inequality join — a
    broadcast-nested-loop that dies at scale. With it, both sides are
    mapped to coarse time buckets (intervals explode to every bucket
    they span) and the plan becomes an equi-join on (keys..., bucket)
    followed by the exact range filter: one hash shuffle, candidate
    pairs bounded by bucket occupancy. Pick ``bucket_width`` near the
    typical interval length."""
    by = list(by or [])
    if bucket_width is None:
        cond = [points[point_col].between(
            intervals[start_col], intervals[end_col]
        )]
        for k in by:
            cond.append(points[k] == intervals[k])
        return points.join(intervals, on=cond, how=how)

    w = float(bucket_width)
    p = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / F.lit(w)).cast("long")
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(w)).cast("long"),
                F.floor(F.col(end_col) / F.lit(w)).cast("long"),
            )
        ),
    )
    joined = p.join(iv, on=by + ["_bucket"], how="inner").filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("_bucket")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: list | None = None,
    bucket_width=None,
    max_span_buckets: int | None = None,
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair of CLOSED
    intervals that overlap (``left_start <= right_end AND right_start
    <= left_end``), optionally per ``by`` key — the two-sided
    complement of :func:`range_join` (point in interval) and
    :func:`asof_join` (most recent at-or-before).

    Without ``bucket_width`` Spark plans the inequality condition as a
    nested-loop join — fine when one side broadcasts, a scale-killer
    otherwise. With it, BOTH sides explode to the coarse time buckets
    they span and the plan becomes a hash equi-join on
    (keys..., bucket). A pair of overlapping intervals shares every
    bucket their intersection touches, so the naive bucket join emits
    duplicates; instead of a wide ``distinct``, each pair is kept ONLY
    in the one bucket containing ``greatest(left_start, right_start)``
    (the first bucket of the intersection) — exactly-once semantics as
    a map-side predicate, no dedup exchange. Bound columns must be
    numeric (cast timestamps to epoch first) and uniquely named across
    the two inputs.

    ``max_span_buckets`` is the fan-out guard (the ``max_bucket_size``
    convention from MinHash): intervals spanning more than that many
    buckets are EXCLUDED from the join rather than exploded — open-ended
    or pathologically long intervals otherwise multiply the exchange by
    their span. Pick ``bucket_width`` near the typical interval length
    so most intervals land in 1-2 buckets.

    No reference analog — the reference engine has no interval
    algebra; this extends the round-4 as-of/range family
    (``src/frame/asof.*`` parity) to interval-interval overlap.
    """
    by = list(by or [])
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    if bucket_width is None:
        cond = [
            left[left_start] <= right[right_end],
            right[right_start] <= left[left_end],
        ]
        for k in by:
            cond.append(left[k] == right[k])
        return left.join(right, on=cond, how="inner")

    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    def _explode(df, start_col, end_col):
        first = F.floor(F.col(start_col) / F.lit(w)).cast("long")
        last = F.floor(F.col(end_col) / F.lit(w)).cast("long")
        out = df.filter(F.col(start_col) <= F.col(end_col))
        if max_span_buckets is not None:
            out = out.filter(last - first < F.lit(int(max_span_buckets)))
        return out.withColumn("_bucket", F.explode(F.sequence(first, last)))

    lb = _explode(left, left_start, left_end)
    rb = _explode(right, right_start, right_end)
    # exactly-once: keep the pair only in the first bucket of the
    # intersection — a map-side predicate instead of a distinct
    anchor = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / F.lit(w)
    ).cast("long")
    joined = (
        lb.join(rb, on=by + ["_bucket"], how="inner")
        .filter(overlap & (F.col("_bucket") == anchor))
    )
    return joined.drop("_bucket")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by: list | None = None,
    value_cols: list | None = None,
    tolerance=None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join (inclusive), pandas ``merge_asof`` directions:

    * ``"backward"`` (default): latest right row with
      ``right.time <= left.time`` per ``by`` group;
    * ``"forward"``: earliest right row with
      ``right.time >= left.time``;
    * ``"nearest"``: whichever of the two is closer in time (ties go
      to the backward match, pandas semantics).

    value_cols: right columns to carry (default: all non-key,
    non-time columns). tolerance: max allowed |time gap| (same units
    as the column); matches farther than that become nulls — applied
    per direction BEFORE the nearest choice, as pandas does.

    Execution: the union trick — both relations interleave on one
    entity-hash window sorted by (time, side), and the carried
    columns fill by ``last``/``first`` ignorenulls over a running
    frame; "nearest" evaluates both frames over the SAME exchange
    (two sorts, one shuffle) and picks per row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward', or 'nearest'"
        )
    by = list(by or [])
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in by and c != time_col
        ]
    carried = [f"{c}{suffix}" for c in value_cols]
    matched_time = f"{time_col}{suffix}"

    lhs = left
    for c in carried + [matched_time]:
        lhs = lhs.withColumn(c, F.lit(None))
    lhs = lhs.withColumn("_src", F.lit(1))

    rhs = right.select(
        *by,
        F.col(time_col),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn(matched_time, F.col(time_col)).withColumn(
        "_src", F.lit(0)
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    rhs = rhs.select(*lhs.columns)

    unioned = lhs.unionByName(rhs)
    fill_cols = carried + [matched_time]
    # backward: right rows sort BEFORE left rows at equal timestamps,
    # so a simultaneous right row is inside the running frame
    # (inclusive); forward mirrors it — left before right, following
    # frame, first() instead of last().
    wb = (
        Window.partitionBy(*by)
        .orderBy(F.col(time_col).asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(F.col(time_col).asc(), F.col("_src").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def _stale(mt):
        gap = (
            F.col(time_col) - F.col(mt)
            if direction != "forward"
            else F.col(mt) - F.col(time_col)
        )
        return F.col(mt).isNull() | (F.abs(gap) > tolerance)

    if direction in ("backward", "forward"):
        w = wb if direction == "backward" else wf
        agg = F.last if direction == "backward" else F.first
        filled = unioned.select(
            *[
                agg(c, ignorenulls=True).over(w).alias(c)
                if c in fill_cols
                else F.col(c)
                for c in unioned.columns
            ]
        )
        out = filled.filter(F.col("_src") == 1).drop("_src")
        if tolerance is not None:
            stale = _stale(matched_time)
            for c in fill_cols:
                out = out.withColumn(
                    c, F.when(stale, F.lit(None)).otherwise(F.col(c))
                )
        return out

    # nearest: both frames over the same exchange, pick per row
    filled = unioned.select(
        *unioned.columns,
        *[
            F.last(c, ignorenulls=True).over(wb).alias(f"_b_{c}")
            for c in fill_cols
        ],
        *[
            F.first(c, ignorenulls=True).over(wf).alias(f"_f_{c}")
            for c in fill_cols
        ],
    )
    out = filled.filter(F.col("_src") == 1).drop("_src")
    bt, ft = f"_b_{matched_time}", f"_f_{matched_time}"
    b_ok = F.col(bt).isNotNull()
    f_ok = F.col(ft).isNotNull()
    if tolerance is not None:
        b_ok = b_ok & (F.col(time_col) - F.col(bt) <= tolerance)
        f_ok = f_ok & (F.col(ft) - F.col(time_col) <= tolerance)
    # ties go backward (<=), the pandas convention
    use_b = b_ok & (
        ~f_ok
        | (
            F.col(time_col) - F.col(bt)
            <= F.col(ft) - F.col(time_col)
        )
    )
    for c in fill_cols:
        out = out.withColumn(
            c,
            F.when(use_b, F.col(f"_b_{c}")).otherwise(
                F.when(f_ok, F.col(f"_f_{c}"))
            ),
        )
    return out.drop(
        *[f"_b_{c}" for c in fill_cols], *[f"_f_{c}" for c in fill_cols]
    )


def scd2_history(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
    current_sentinel: int | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2 view of a changelog: every row
    becomes a VERSION of its key with an explicit validity interval —
    ``valid_from`` = its own timestamp, ``valid_to`` = the next
    version's timestamp (``current_sentinel`` or null for the latest),
    plus ``is_current`` — the standard warehouse history table that
    :func:`latest_by_key` is the compaction of, and the relation an
    :func:`asof_join` probes.

    One entity-hash window (``lead`` over the key's timeline; ties in
    ``ts_col`` break by ``tiebreak_col`` — pass a unique id for a
    deterministic, engine-independent versioning). All input columns
    are preserved.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    ord_cols = [F.col(ts_col)]
    if tiebreak_col is not None:
        ord_cols.append(F.col(tiebreak_col))
    w = Window.partitionBy(*keys).orderBy(*ord_cols)
    nxt = F.lead(ts_col).over(w)
    out = (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn(
            "valid_to",
            F.coalesce(nxt, F.lit(current_sentinel))
            if current_sentinel is not None
            else nxt,
        )
        .withColumn("is_current", nxt.isNull())
    )
    return out


def rolling_stats(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_col: str,
    window: int = 10,
    min_periods: int = 1,
    with_zscore: bool = False,
    tiebreak_col: str | None = None,
    time_window: int | None = None,
) -> DataFrame:
    """Per-entity rolling statistics over an ordered event stream — the
    moving-window leg of the time-series family (asof_join = point-in-
    time attach, range_join = interval attach, this = trailing-window
    summarize): for each row, mean/stddev/min/max/count over the last
    ``window`` rows of ITS entity, ordered by ``order_col``.

    One hash exchange on the entity key, one window sort — exactly the
    shuffle any per-entity operation pays; frames are row-bounded
    (``rowsBetween(-(window-1), 0)``) so state per entity is O(window)
    and skew is bounded by the hottest entity's row count (pre-salt or
    pre-aggregate upstream for pathological keys). Ties in
    ``order_col`` are broken by ``tiebreak_col`` when given (pass a
    unique id for a fully deterministic, engine-independent frame —
    the SQL-replicable configuration), else by the value column.

    ``with_zscore`` appends the deviation of the CURRENT row from its
    trailing window in stddev units (the streaming-free anomaly
    score); null when the window stddev is 0 or not yet at
    ``min_periods`` rows.

    ``time_window`` switches the frame from row-count to TIME-range:
    all rows whose ``order_col`` lies within ``[ts - time_window,
    ts]`` (inclusive, same units as the numeric ``order_col``) form
    the window — "the last hour", not "the last 10 rows", which is
    what an alerting window actually means when event rates vary.
    Range frames need no tiebreak (the frame is a function of the
    VALUE: ties share one frame, deterministically); ``window``/
    ``tiebreak_col`` are ignored, and ``min_periods`` still gates.
    State per entity is bounded by the densest time_window span —
    pre-aggregate upstream (``resample_events``) if a key can burst
    unboundedly inside one span.

    Output: input columns + rolling_count/mean/stddev/min/max
    (+rolling_z). Rows earlier than ``min_periods`` report null
    mean/stddev/min/max (count still real)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if time_window is None and not 1 <= min_periods <= window:
        raise ValueError("min_periods must be in [1, window]")
    if time_window is not None:
        if time_window <= 0:
            raise ValueError("time_window must be positive")
        if min_periods < 1:
            raise ValueError("min_periods must be >= 1")
        w = (
            Window.partitionBy(partition_col)
            .orderBy(F.col(order_col).cast("long"))
            .rangeBetween(-int(time_window), 0)
        )
    else:
        tb = tiebreak_col if tiebreak_col is not None else value_col
        w = (
            Window.partitionBy(partition_col)
            .orderBy(F.col(order_col), F.col(tb))
            .rowsBetween(-(window - 1), 0)
        )
    cnt = F.count(value_col).over(w)
    ready = cnt >= F.lit(int(min_periods))
    out = (
        df.withColumn("rolling_count", cnt.cast("long"))
        .withColumn(
            "rolling_mean",
            F.when(ready, F.round(F.avg(value_col).over(w), 6)),
        )
        .withColumn(
            "rolling_stddev",
            F.when(ready, F.round(F.stddev(value_col).over(w), 6)),
        )
        .withColumn("rolling_min", F.when(ready, F.min(value_col).over(w)))
        .withColumn("rolling_max", F.when(ready, F.max(value_col).over(w)))
    )
    if with_zscore:
        # z from the RAW window aggregates (not the rounded display
        # columns), so rounding never propagates into the score; same
        # window spec, so Catalyst folds these into the one Window node
        raw_mean = F.avg(value_col).over(w)
        raw_std = F.stddev(value_col).over(w)
        out = out.withColumn(
            "rolling_z",
            F.when(
                ready & (raw_std > 0),
                F.round((F.col(value_col) - raw_mean) / raw_std, 6),
            ),
        )
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: str | list[str],
    compare_cols: list | None = None,
) -> DataFrame:
    """Reconciliation report between two snapshots of the same table:
    how many keys were added, removed, changed, and unchanged — plus a
    per-column changed-count breakdown — the audit a warehouse runs
    after every load before swapping a snapshot live.

    ONE full outer join on the key (each side pre-deduplicated is the
    caller's contract — compose :func:`latest_by_key` upstream for
    changelogs), then ONE conditional-aggregate pass; the per-column
    breakdown rides the same pass and unpivots through a literal
    struct explode, so the join subtree never re-executes. Null-safe
    comparison (``<=>``): null -> value and value -> null both count
    as changes, null -> null does not.

    Returns one row per metric: (metric, n) with metrics
    ``added | removed | changed | unchanged`` and
    ``changed:<column>`` per compare column.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cols = compare_cols
    if cols is None:
        cols = [c for c in new.columns if c not in keys and c in old.columns]
    o = old.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        *[F.col(c).alias(f"_o_{c}") for c in cols],
        F.lit(1).alias("_in_old"),
    )
    nw = new.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        *[F.col(c).alias(f"_n_{c}") for c in cols],
        F.lit(1).alias("_in_new"),
    )
    j = o.join(nw, on=[f"_k{i}" for i in range(len(keys))], how="full")
    col_changed = [
        (
            c,
            F.col("_in_old").isNotNull()
            & F.col("_in_new").isNotNull()
            & ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")),
        )
        for c in cols
    ]
    any_changed = None
    for _, cc in col_changed:
        any_changed = cc if any_changed is None else (any_changed | cc)
    if any_changed is None:
        any_changed = F.lit(False)
    both = F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull()
    agg = j.agg(
        F.sum(
            (F.col("_in_old").isNull()).cast("long")
        ).alias("_added"),
        F.sum(
            (F.col("_in_new").isNull()).cast("long")
        ).alias("_removed"),
        F.sum(any_changed.cast("long")).alias("_changed"),
        F.sum((both & ~any_changed).cast("long")).alias("_unchanged"),
        *[
            F.sum(cc.cast("long")).alias(f"_c_{c}")
            for c, cc in col_changed
        ],
    )
    entries = F.array(
        F.struct(F.lit("added").alias("metric"), F.col("_added").alias("n")),
        F.struct(F.lit("removed").alias("metric"), F.col("_removed").alias("n")),
        F.struct(F.lit("changed").alias("metric"), F.col("_changed").alias("n")),
        F.struct(
            F.lit("unchanged").alias("metric"), F.col("_unchanged").alias("n")
        ),
        *[
            F.struct(
                F.lit(f"changed:{c}").alias("metric"),
                F.col(f"_c_{c}").alias("n"),
            )
            for c in cols
        ],
    )
    return agg.select(F.explode(entries).alias("_e")).select(
        F.col("_e.metric").alias("metric"),
        F.coalesce(F.col("_e.n"), F.lit(0)).cast("long").alias("n"),
    )


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: str | list[str],
    op_col: str = "op",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC changelog to a snapshot — the MERGE every warehouse
    load runs: for each key, the LATEST change wins (``ts``, then
    tiebreak); a latest ``delete_op`` drops the key, any other op
    upserts the change row's columns; untouched snapshot keys pass
    through.

    Plan: the changelog compacts to one row per key via
    :func:`latest_by_key` (map-side pre-reduce, no window sort), the
    snapshot anti-joins the COMPACTED key set (broadcast when small —
    AQE decides), and surviving upserts union in. The snapshot is
    never shuffled on anything but the join key, and the changelog is
    reduced BEFORE it touches the big side — the right shape when the
    snapshot is 1000x the day's changes.

    Returns the new snapshot with the snapshot's columns (the
    changelog must carry the same data columns plus ``op_col``).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    data_cols = [c for c in snapshot.columns if c not in keys]
    latest = latest_by_key(changes, keys, ts_col, tiebreak_col)
    upserts = latest.filter(F.col(op_col) != F.lit(delete_op)).select(
        *keys, *data_cols
    )
    changed_keys = latest.select(*keys)
    untouched = snapshot.join(changed_keys, on=keys, how="left_anti")
    return untouched.select(*keys, *data_cols).unionByName(upserts)


def rolling_quantile(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_col: str,
    window: int = 10,
    q: float = 0.5,
    min_periods: int = 1,
    tiebreak_col: str | None = None,
    output_col: str = "rolling_q",
) -> DataFrame:
    """EXACT rolling quantile (default: median) over the last
    ``window`` rows per entity — the robust companion to
    :func:`rolling_stats`' mean/stddev (one outlier wrecks a trailing
    mean; the trailing median shrugs): per row, the linearly
    interpolated ``q``-quantile (the ``percentile_cont`` convention)
    of the row-bounded frame.

    Same exchange shape as :func:`rolling_stats` — ONE entity-hash
    exchange, one window sort. The frame's values are assembled with
    ``collect_list`` + ``array_sort`` and interpolated with pure
    array arithmetic, all JVM-side: O(window log window) per row and
    O(window) state, so this is for BOUNDED windows (10s-1000s);
    unbounded quantiles belong to approx_quantiles. Ties in
    ``order_col`` break by ``tiebreak_col`` when given (pass a unique
    id for an engine-independent frame).

    Appends ``output_col`` (rounded to 6; null below ``min_periods``
    rows) and ``rolling_q_count``.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    order = [F.col(order_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*order)
        .rowsBetween(-(window - 1), 0)
    )
    vals = F.array_sort(
        F.collect_list(F.col(value_col).cast("double")).over(w)
    )
    n = F.size(vals)
    # percentile_cont: pos = (n - 1) * q, linear interpolation
    pos = (n - F.lit(1)).cast("double") * F.lit(float(q))
    lo = F.floor(pos).cast("int")
    frac = pos - lo.cast("double")
    v_lo = F.element_at(vals, lo + 1)
    v_hi = F.element_at(vals, F.least(lo + 2, n))
    quant = v_lo + frac * (v_hi - v_lo)
    return df.withColumn("rolling_q_count", n.cast("long")).withColumn(
        output_col,
        F.round(
            F.when(n >= int(min_periods), quant), 6
        ),
    )


def hampel_filter(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_col: str,
    window: int = 10,
    n_sigmas: float = 3.0,
    min_periods: int = 3,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Hampel outlier filter — the robust spike detector for metric /
    sensor streams: flag a point when it sits more than ``n_sigmas``
    robust standard deviations (1.4826 x MAD) from the TRAILING
    median of its own entity's last ``window`` rows. The rolling-mean
    z-score misses spikes because the spike inflates its own baseline;
    median + MAD are 50%-breakdown estimators, so one bad point can
    never mask itself.

    Same exchange shape as :func:`rolling_quantile` — ONE entity-hash
    exchange, one window sort; the frame's values ride
    ``collect_list`` + ``array_sort`` and both medians (of the frame,
    then of the absolute deviations) are pure JVM array arithmetic.
    Bounded windows only, by design.

    Appends ``hampel_median``, ``hampel_mad``, ``hampel_score``
    (|x - med| / (1.4826 * MAD), null when MAD = 0 or below
    ``min_periods``) and ``hampel_outlier`` (score > n_sigmas; when
    MAD = 0 a point is an outlier iff it differs from the median —
    the degenerate-window convention). All rounded to 6.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if n_sigmas <= 0:
        raise ValueError("n_sigmas must be > 0")
    order = [F.col(order_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*order)
        .rowsBetween(-(window - 1), 0)
    )
    # materialize the sorted frame FIRST: lambda bodies cannot embed
    # window expressions, so every derived quantity reads the plain
    # array column
    staged = df.withColumn(
        "_hvals",
        F.array_sort(
            F.collect_list(F.col(value_col).cast("double")).over(w)
        ),
    )

    def _median(arr):
        m = F.size(arr)
        pos = (m - F.lit(1)).cast("double") * F.lit(0.5)
        lo = F.floor(pos).cast("int")
        frac = pos - lo.cast("double")
        v_lo = F.element_at(arr, lo + 1)
        v_hi = F.element_at(arr, F.least(lo + 2, m))
        return v_lo + frac * (v_hi - v_lo)

    staged = staged.withColumn("_hmed", _median(F.col("_hvals")))
    staged = staged.withColumn(
        "_hmad",
        _median(
            F.array_sort(
                F.transform(
                    F.col("_hvals"),
                    lambda v: F.abs(v - F.col("_hmed")),
                )
            )
        ),
    )
    n = F.size("_hvals")
    med, mad = F.col("_hmed"), F.col("_hmad")
    x = F.col(value_col).cast("double")
    score = F.when(
        (n >= int(min_periods)) & (mad > 0),
        F.abs(x - med) / (F.lit(1.4826) * mad),
    )
    outlier = F.when(
        n < int(min_periods), F.lit(None).cast("boolean")
    ).otherwise(
        F.when(
            mad > 0,
            F.abs(x - med) / (F.lit(1.4826) * mad)
            > F.lit(float(n_sigmas)),
        ).otherwise(x != med)
    )
    return (
        staged.withColumn(
            "hampel_median",
            F.round(F.when(n >= int(min_periods), med), 6),
        )
        .withColumn(
            "hampel_mad", F.round(F.when(n >= int(min_periods), mad), 6)
        )
        .withColumn("hampel_score", F.round(score, 6))
        .withColumn("hampel_outlier", outlier)
        .drop("_hvals", "_hmed", "_hmad")
    )


def scd2_snapshot(
    history: DataFrame,
    as_of,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time reconstruction from an SCD2 history table — "show
    me the dimension exactly as it stood at time T", the read-side
    complement of :func:`scd2_history` (and the batch analogue of an
    :func:`asof_join` against the history): keep each version whose
    validity interval covers ``as_of`` (``valid_from <= T <
    valid_to``, open-ended current versions via null ``valid_to``).

    Pure map-side filter — at 100 TB this pipelines with the parquet
    scan, and when the history is partitioned/sorted on the validity
    columns the predicate prunes files before reading (the reason to
    reconstruct from SCD2 + filter instead of replaying the changelog
    with a window). Drops the bookkeeping flag ``is_current`` if
    present (it describes NOW, not ``as_of``).
    """
    t = F.lit(as_of)
    out = history.filter(
        (F.col(valid_from_col) <= t)
        & (F.col(valid_to_col).isNull() | (F.col(valid_to_col) > t))
    )
    return out.drop("is_current")
