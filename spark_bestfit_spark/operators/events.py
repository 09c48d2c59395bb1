"""Event-stream analytics operators: funnels, cohort retention,
transition matrices, and regular-grid resampling.

These extend the time-series family in :mod:`.asof` (as-of join = point-
in-time attach, range join = interval attach, rolling_stats = trailing-
window summarize) with the classic product-analytics shapes every event
warehouse query: ordered-step conversion funnels, cohort retention
matrices, event-to-event transition probabilities, and per-entity
regular time grids with gap filling. No reference-repo analog (the
reference is a fitting library); these are first-class pipeline extras.

Scale design (100 TB): every operator pays exactly ONE entity-hash
exchange for its per-entity pass — window frames are either whole-
partition aggregates or row-bounded, and every follow-up aggregation
either rides the same hash partitioning (groupBy on the entity key
after a Window.partitionBy on it) or lands on a small key space
(event-type pairs, cohort x offset, entity x bucket bounds). Nothing
is collected to the driver; scalar corpus totals ride the plan as
broadcast 1-row relations.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = [
    "funnel",
    "cohort_retention",
    "event_transitions",
    "resample_events",
    "sessionize",
    "session_paths",
    "pivot_counts",
    "attribute_conversions",
    "funnel_timing",
    "seasonal_naive_backtest",
    "cohort_values",
    "seasonal_decompose",
    "new_entities_curve",
    "ewma_backtest",
]


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: int = 1800 * 10**9,
    tiebreak_col: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign inactivity-gap session ids: within each entity's
    time-ordered stream, a row starts a NEW session when more than
    ``gap`` (same units as the numeric ``ts_col``) elapsed since the
    previous row. Appends ``session_col`` (1-based per entity) to all
    input columns — the building block under :func:`session_paths`
    and any per-session aggregation.

    One entity-hash window carries both the lag and the running sum
    (same partitioning and order — a single exchange). Ties in
    ``ts_col`` order by ``tiebreak_col`` when given (pass a unique id
    for a deterministic, engine-independent split).
    """
    if gap <= 0:
        raise ValueError("gap must be positive")
    tb = tiebreak_col if tiebreak_col is not None else ts_col
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tb))
    new_sess = F.when(
        F.lag(ts_col).over(w).isNull()
        | (F.col(ts_col) - F.lag(ts_col).over(w) > F.lit(gap)),
        1,
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )


def _floor_div(col_name: str, n: int):
    """Exact integer floor division of a numeric column by ``n``.

    ``F.floor(col / n)`` routes through DOUBLE division, which silently
    loses exactness above 2^53 — epoch-nanosecond timestamps (~1.7e18)
    are well past that, so period ids near bucket boundaries would
    flip. ``a - pmod(a, n)`` is an exact multiple of ``n`` and ``div``
    is integer division, so this is floor division for every sign, in
    pure BIGINT arithmetic."""
    a = f"CAST(`{col_name}` AS BIGINT)"
    return F.expr(f"(({a} - pmod({a}, {int(n)})) div {int(n)})")


def funnel(
    df: DataFrame,
    steps: list[str],
    event_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
    window: int | None = None,
) -> DataFrame:
    """Ordered-step conversion funnel: for each user, the timestamp at
    which each step of ``steps`` was first reached, under the greedy
    earliest-first semantics every SQL funnel uses —

    * ``t1`` = the user's earliest ``steps[0]`` event;
    * ``t(i)`` = the earliest ``steps[i-1]`` event STRICTLY after
      ``t(i-1)`` (strict ``>`` so a single event can never satisfy two
      consecutive steps, and repeated step names need distinct events);
    * with ``window`` set (same units as ``ts_col``), steps 2..k must
      also land within ``window`` of ``t1`` — the conversion deadline
      is measured from funnel ENTRY, the ClickHouse ``windowFunnel``
      convention.

    Greedy-from-first-entry is deliberate: it is deterministic, SQL-
    replicable (each step is a chained conditional ``min`` over the
    user's partition), and the industry-standard reading; it does not
    search later entries that might complete a deeper funnel inside the
    window.

    Execution shape: one hash exchange on ``user_col``, then k
    consecutive whole-partition Window aggregates (each step's
    conditional min references the previous step's materialized
    column), then a groupBy on the SAME key — Spark sees the
    partitioning is already satisfied, so no second exchange. Per-user
    state is O(1) per step; skew is bounded by the hottest user's row
    count.

    Returns one row per user that has at least one event of any kind in
    ``df``: ``(user_col, funnel_level, step1_ts .. stepK_ts)`` where
    ``funnel_level`` counts the completed prefix (0 = never entered).
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if window is not None and window <= 0:
        raise ValueError("window must be positive")
    w = Window.partitionBy(user_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cur = df.select(user_col, ts_col, event_col)
    for i, step in enumerate(steps):
        cond = F.col(event_col) == F.lit(step)
        if i > 0:
            cond = cond & (F.col(ts_col) > F.col(f"_t{i - 1}"))
            if window is not None:
                # elapsed-time form, not t0 + window: the addition can
                # overflow BIGINT at extreme timestamps (ANSI throws)
                cond = cond & (
                    F.col(ts_col) - F.col("_t0") <= F.lit(window)
                )
        cur = cur.withColumn(
            f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
    # _t(i) is a per-user constant; max() just collapses the partition.
    agg = cur.groupBy(user_col).agg(
        *[
            F.max(f"_t{i}").alias(f"step{i + 1}_ts")
            for i in range(len(steps))
        ]
    )
    level = sum(
        F.when(F.col(f"step{i + 1}_ts").isNotNull(), 1).otherwise(0)
        for i in range(len(steps))
    )
    return agg.select(
        user_col,
        level.cast("int").alias("funnel_level"),
        *[f"step{i + 1}_ts" for i in range(len(steps))],
    )


def cohort_retention(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    period: int = 7 * 24 * 3600 * 10**9,
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event (``floor(min(ts) / period)``), and each later
    period's activity is counted as distinct users from that cohort
    active ``offset`` periods after entry.

    ``ts_col`` must be numeric (the engine's events convention is
    epoch-nanos BIGINT); ``period`` is in the same units (default one
    week of nanoseconds).

    Execution shape: one hash exchange on ``user_col`` for the whole-
    partition first-event min, one distinct-count aggregation on the
    small ``(cohort, offset)`` key space, and a broadcast join of the
    per-cohort sizes (one row per cohort — the ``offset = 0`` slice,
    which every cohort member occupies by construction). No driver
    action anywhere.

    Returns ``(cohort_period, period_offset, n_active, cohort_size,
    retention)`` with retention rounded to 6 decimals.
    """
    if period <= 0:
        raise ValueError("period must be positive")
    pid = _floor_div(ts_col, period)
    w = Window.partitionBy(user_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    base = df.select(user_col, pid.alias("_p")).withColumn(
        "_cohort", F.min("_p").over(w)
    )
    active = (
        base.groupBy(
            F.col("_cohort").alias("cohort_period"),
            (F.col("_p") - F.col("_cohort")).alias("period_offset"),
        )
        .agg(F.countDistinct(user_col).cast("long").alias("n_active"))
    )
    if max_offset is not None:
        active = active.filter(F.col("period_offset") <= max_offset)
    sizes = active.filter(F.col("period_offset") == 0).select(
        "cohort_period", F.col("n_active").alias("cohort_size")
    )
    return (
        active.join(F.broadcast(sizes), "cohort_period")
        .withColumn(
            "retention",
            F.round(F.col("n_active") / F.col("cohort_size"), 6),
        )
        .select(
            "cohort_period",
            "period_offset",
            "n_active",
            "cohort_size",
            "retention",
        )
    )


def event_transitions(
    df: DataFrame,
    event_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
    tiebreak_col: str | None = None,
    with_prob: bool = True,
) -> DataFrame:
    """First-order Markov transition counts between consecutive events
    of the same user: for every adjacent pair in each user's time-
    ordered stream, count ``(prev_event, event)`` and (optionally) the
    row-normalized transition probability.

    Ties in ``ts_col`` are broken by ``tiebreak_col`` when given (pass
    a unique id for a deterministic, engine-independent ordering — the
    SQL-replicable configuration), else by the event column itself.

    Execution shape: one hash exchange on ``user_col`` for the lag
    window, then a combiner-friendly groupBy on the tiny
    ``(prev_event, event)`` key space; the probability normalization is
    a window over ``prev_event`` on that already-aggregated relation
    (at most |event types|^2 rows).

    Returns ``(prev_event, event, n_transitions[, p_transition])``.
    """
    tb = tiebreak_col if tiebreak_col is not None else event_col
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tb))
    pairs = (
        df.select(user_col, ts_col, event_col, tb)
        .withColumn("prev_event", F.lag(event_col).over(w))
        .filter(F.col("prev_event").isNotNull())
    )
    out = pairs.groupBy("prev_event", F.col(event_col).alias("event")).agg(
        F.count("*").alias("n_transitions")
    )
    if with_prob:
        wn = Window.partitionBy("prev_event")
        out = out.withColumn(
            "p_transition",
            F.round(
                F.col("n_transitions") / F.sum("n_transitions").over(wn),
                6,
            ),
        )
    return out


def session_paths(
    df: DataFrame,
    event_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: int = 1800 * 10**9,
    tiebreak_col: str | None = None,
    max_len: int = 20,
) -> DataFrame:
    """Top navigation paths: sessionize each user's stream by
    inactivity ``gap`` (same units as the numeric ``ts_col``; default
    30 min of nanoseconds), render each session as its ordered
    event-name sequence (``"view>click>purchase"``), and count how
    many sessions took each path.

    Paths are truncated to the first ``max_len`` events of the session
    — the memory guard for pathological never-idle keys (a bot
    clicking forever is one session), and also what makes the path
    space finite enough to aggregate.

    Execution shape: one entity-hash window (``lag`` + running
    conditional sum assigns session ids in a single exchange), one
    groupBy per (user, session) collecting the session's events —
    per-group state is one session's rows, bounded by the truncation
    only after sort, so the gap parameter is the real bound — then a
    combiner-friendly groupBy on the path string. Ties in ``ts_col``
    order by ``tiebreak_col`` (pass a unique id for the
    SQL-replicable, engine-independent configuration).

    Returns ``(path, n_sessions)``.
    """
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    tb = tiebreak_col if tiebreak_col is not None else event_col
    sess = sessionize(
        df.select(user_col, ts_col, event_col, tb),
        ts_col=ts_col,
        user_col=user_col,
        gap=gap,
        tiebreak_col=tb,
        session_col="_sess",
    )
    paths = sess.groupBy(user_col, "_sess").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(ts_col).alias("t"),
                                F.col(tb).alias("b"),
                                F.col(event_col).alias("e"),
                            )
                        )
                    ),
                    1,
                    int(max_len),
                ),
                lambda x: x["e"],
            ),
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions")
    )


def pivot_counts(
    df: DataFrame,
    row_col: str,
    pivot_col: str,
    values: list[str],
    value_col: str | None = None,
    agg: str = "count",
) -> DataFrame:
    """Crosstab / pivot table: one row per ``row_col``, one column per
    entry of ``values`` (the EXPLICIT pivot domain — passing it keeps
    the plan lazy; Spark's value-inference variant runs an eager
    distinct scan first, which at 100 TB is a full extra pass), cells
    aggregated by ``agg``: ``"count"`` (rows), or ``"sum"``/``"avg"``
    over ``value_col``.

    Count/sum cells with no matching rows read 0; avg cells read null
    (an average of nothing is unknown, not zero).

    Execution: Spark's native pivot compiles to a two-stage aggregate
    — count per ``(row, pivot)`` pair, then ``pivotfirst`` per row —
    so both exchanges carry pre-aggregated rows bounded by
    ``|rows| x |values|``, never data rows, from one scan.
    """
    if not values:
        raise ValueError("values must be a non-empty explicit list")
    if agg not in ("count", "sum", "avg"):
        raise ValueError("agg must be 'count', 'sum', or 'avg'")
    if agg != "count" and value_col is None:
        raise ValueError(f"agg='{agg}' needs value_col")
    gp = df.groupBy(row_col).pivot(pivot_col, values)
    if agg == "count":
        out = gp.agg(F.count(F.lit(1)))
    elif agg == "sum":
        out = gp.agg(F.sum(value_col))
    else:
        out = gp.agg(F.avg(value_col))
    if agg in ("count", "sum"):
        out = out.fillna(0, subset=[str(v) for v in values])
    return out


def resample_events(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    entity_col: str = "user_id",
    bucket: int = 24 * 3600 * 10**9,
    fill: str | None = "ffill",
    max_buckets: int = 1 << 20,
) -> DataFrame:
    """Per-entity regular time grid: bucket each entity's events into
    fixed ``bucket``-sized intervals (``floor(ts / bucket)``), emit one
    row for EVERY bucket between the entity's first and last active
    bucket (gaps included), and optionally forward-fill the value
    across the gaps — the resample + reindex + ffill idiom of every
    time-series store, as one lazy plan.

    ``ts_col`` must be numeric (epoch-nanos by convention); ``bucket``
    is in the same units (default one day of nanoseconds). ``fill`` is
    ``"ffill"`` (carry the last observed per-bucket mean forward),
    ``"zero"`` (gaps read 0.0), or ``None`` (gaps stay null).

    Execution shape: one combiner-friendly groupBy on
    ``(entity, bucket_id)``, a per-entity bounds aggregation over that
    already-small relation, an in-plan ``sequence``/``explode`` spine
    (guarded: any entity spanning more than ``max_buckets`` buckets
    raises in-plan via ``raise_error`` rather than exploding the
    executor), a left join of the spine back to the bucket aggregates,
    and — for ffill — one entity-hash window with an unbounded-
    preceding frame (``last`` over a sorted running frame is O(1) per
    row in whole-stage codegen). No driver action, no collect.

    Returns ``(entity_col, bucket_id, n_events, bucket_value)`` where
    ``bucket_value`` is the per-bucket mean of ``value_col`` (rounded
    to 6 decimals) after gap filling, plus ``is_gap``.
    """
    if bucket <= 0:
        raise ValueError("bucket must be positive")
    if fill not in (None, "ffill", "zero"):
        raise ValueError("fill must be None, 'ffill', or 'zero'")
    bid = _floor_div(ts_col, bucket)
    b = (
        df.select(entity_col, bid.alias("bucket_id"), value_col)
        .groupBy(entity_col, "bucket_id")
        .agg(
            F.count(value_col).cast("long").alias("n_events"),
            F.round(F.avg(value_col), 6).alias("_v"),
        )
    )
    bounds = b.groupBy(entity_col).agg(
        F.min("bucket_id").alias("_mn"), F.max("bucket_id").alias("_mx")
    )
    span_guard = F.when(
        F.col("_mx") - F.col("_mn") >= F.lit(int(max_buckets)),
        F.raise_error(
            F.format_string(
                "resample_events: entity spans more than %d buckets — "
                "raise max_buckets or coarsen the bucket size",
                F.lit(int(max_buckets)),
            )
        ),
    ).otherwise(F.col("_mx"))
    spine = bounds.select(
        entity_col,
        F.explode(F.sequence(F.col("_mn"), span_guard)).alias("bucket_id"),
    )
    out = (
        spine.join(b, [entity_col, "bucket_id"], "left")
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)))
        .withColumn("is_gap", F.col("n_events") == 0)
    )
    if fill == "ffill":
        wf = (
            Window.partitionBy(entity_col)
            .orderBy("bucket_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        val = F.last("_v", ignorenulls=True).over(wf)
    elif fill == "zero":
        val = F.coalesce("_v", F.lit(0.0))
    else:
        val = F.col("_v")
    return out.select(
        entity_col,
        "bucket_id",
        "n_events",
        val.alias("bucket_value"),
        "is_gap",
    )


def attribute_conversions(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    conversion_type: str,
    touch_types: list,
    model: str = "last",
    lookback=None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Marketing-style conversion attribution: each conversion event is
    credited to ONE preceding touch event of the entity — the latest
    (``model="last"``, last-touch) or the earliest (``model="first"``,
    first-touch) within the optional ``lookback`` (same unit as
    ``ts_col``). Touches at the conversion's exact timestamp count
    (at-or-before, value-based range semantics).

    One entity-hash exchange: touches and conversions stay in the same
    relation and a single ``min``/``max`` of ``struct(ts, tiebreak,
    channel)`` over a running (or lookback-bounded RANGE) frame carries
    the winning touch onto every row; conversions are then a map-side
    filter. No self-join, no per-conversion probe.

    Returns one row per conversion: (``entity_col``, ``conv_ts``,
    ``conv_value``, ``channel`` = the touch's ``type_col`` or null when
    no touch qualifies, ``touch_ts``). Aggregate downstream for
    channel-level attributed revenue.
    """
    if model not in ("first", "last"):
        raise ValueError("model must be 'first' or 'last'")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    tb = F.col(tiebreak_col) if tiebreak_col is not None else F.lit(0)
    w = Window.partitionBy(entity_col).orderBy(F.col(ts_col))
    if lookback is None:
        w = w.rangeBetween(Window.unboundedPreceding, 0)
    else:
        w = w.rangeBetween(-int(lookback), 0)
    is_touch = F.col(type_col).isin(list(touch_types))
    touch_struct = F.when(
        is_touch,
        F.struct(
            F.col(ts_col).alias("_ts"),
            tb.alias("_tb"),
            F.col(type_col).alias("_ch"),
        ),
    )
    pick = F.max(touch_struct) if model == "last" else F.min(touch_struct)
    out = df.withColumn("_win", pick.over(w))
    return (
        out.filter(F.col(type_col) == conversion_type)
        .select(
            entity_col,
            F.col(ts_col).alias("conv_ts"),
            F.col(value_col).alias("conv_value"),
            F.col("_win._ch").alias("channel"),
            F.col("_win._ts").alias("touch_ts"),
        )
    )


def funnel_timing(
    df: DataFrame,
    steps: list[str],
    event_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
    window: int | None = None,
    approx: bool = False,
) -> DataFrame:
    """Step-level funnel report on top of :func:`funnel`: per step, how
    many users reached it, the conversion rate from the previous step,
    and the median / p90 latency from the previous step — the numbers
    a growth dashboard actually shows.

    One extra aggregation over the PER-USER funnel relation (already
    one row per user): every step's count and latency percentiles fold
    into a single conditional-aggregate pass, and the per-step rows
    come from one literal struct-array explode — the funnel subtree is
    never re-executed per step. ``approx=True`` swaps exact
    percentiles for Greenwald-Khanna (the 100 TB default when user
    cardinality is extreme).

    Returns one row per step: (step_index, step, n_reached,
    rate_from_prev, p50_latency, p90_latency) — latencies null for
    step 1 and for steps nobody reached; rates rounded to 6.
    """
    fu = funnel(df, steps, event_col, ts_col, user_col, window)
    pctl = "approx_percentile" if approx else "percentile"
    aggs = [
        F.count(F.lit(1)).alias("_n_users"),
    ]
    for i in range(len(steps)):
        aggs.append(
            F.count(F.col(f"step{i + 1}_ts")).alias(f"_r{i}")
        )
        if i > 0:
            lat = F.col(f"step{i + 1}_ts") - F.col(f"step{i}_ts")
            aggs.append(
                F.expr(
                    f"{pctl}(step{i + 1}_ts - step{i}_ts, 0.5)"
                ).alias(f"_p50_{i}")
            )
            aggs.append(
                F.expr(
                    f"{pctl}(step{i + 1}_ts - step{i}_ts, 0.9)"
                ).alias(f"_p90_{i}")
            )
    one = fu.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_index"),
                F.lit(steps[i]).alias("step"),
                F.col(f"_r{i}").cast("long").alias("n_reached"),
                (
                    F.round(
                        F.col(f"_r{i}")
                        / F.when(
                            F.col(f"_r{i - 1}") > 0, F.col(f"_r{i - 1}")
                        ),
                        6,
                    )
                    if i > 0
                    else F.lit(None).cast("double")
                ).alias("rate_from_prev"),
                (
                    F.col(f"_p50_{i}").cast("double")
                    if i > 0
                    else F.lit(None).cast("double")
                ).alias("p50_latency"),
                (
                    F.col(f"_p90_{i}").cast("double")
                    if i > 0
                    else F.lit(None).cast("double")
                ).alias("p90_latency"),
            )
            for i in range(len(steps))
        ]
    )
    return one.select(F.explode(entries).alias("_e")).select("_e.*")


def seasonal_naive_backtest(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    bucket_width: int,
    period: int,
    agg: str = "avg",
) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict this bucket
    = the value one season ago) against the lag-1 naive baseline — the
    sanity floor every real forecasting pipeline reports before
    anything learned:

    per entity: resample to ``bucket_width`` buckets (``agg`` = avg or
    sum of ``value_col``), forecast ``v[t] := v[t - period]``, score
    MAE / MAPE / bias over buckets where both exist, and the same MAE
    for the lag-1 naive; ``skill = 1 - mae / mae_naive1`` (> 0 means
    the seasonality is real).

    One (entity, bucket) map-combinable groupBy, then both lags and
    the per-entity collapse ride ONE entity-hash exchange. Gaps in the
    bucket grid are NOT filled — the lag is by grid position after
    resampling, the standard discrete-season convention; resample
    first with gap filling if the series is sparse.

    Returns (entity_col, n_evals, mae, mape, bias, mae_naive1, skill)
    rounded to 6; entities with no evaluable bucket drop out.
    """
    if agg not in ("avg", "sum"):
        raise ValueError("agg must be 'avg' or 'sum'")
    if period < 1 or bucket_width < 1:
        raise ValueError("period and bucket_width must be >= 1")
    from pyspark.sql import Window as _W

    fn = F.avg if agg == "avg" else F.sum
    b = (F.col(ts_col) / F.lit(int(bucket_width))).cast("long")
    series = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(entity_col), b.alias("_b"))
        .agg(fn(value_col).alias("_v"))
    )
    w = _W.partitionBy(entity_col).orderBy("_b")
    scored = (
        series.withColumn("_f", F.lag("_v", int(period)).over(w))
        .withColumn("_f1", F.lag("_v", 1).over(w))
        .withColumn("_err", F.col("_v") - F.col("_f"))
        .withColumn("_err1", F.col("_v") - F.col("_f1"))
    )
    evals = scored.filter(F.col("_f").isNotNull())
    out = evals.groupBy(entity_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_evals"),
        F.round(F.avg(F.abs("_err")), 6).alias("mae"),
        F.round(
            F.avg(
                F.when(
                    F.col("_v") != 0, F.abs("_err") / F.abs("_v")
                )
            ),
            6,
        ).alias("mape"),
        F.round(F.avg("_err"), 6).alias("bias"),
        F.round(
            F.avg(F.when(F.col("_f1").isNotNull(), F.abs("_err1"))), 6
        ).alias("mae_naive1"),
    )
    return out.withColumn(
        "skill",
        F.round(
            F.when(
                F.col("mae_naive1") > 0,
                F.lit(1.0) - F.col("mae") / F.col("mae_naive1"),
            ),
            6,
        ),
    )


def cohort_values(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    bucket_width: int,
) -> DataFrame:
    """Cohort LTV curves: entities grouped by their FIRST-activity
    bucket (the cohort), revenue accumulated by cohort age — the
    "how much is a January user worth after k periods" relation
    retention dashboards draw next to :func:`cohort_retention`'s
    counts.

    One per-entity first-activity aggregate rejoins the event stream
    on the entity key (the standard cohort shuffle), one
    (cohort, age) rollup, and the running LTV rides a cohort-hash
    window over the tiny per-(cohort, age) relation. Pass an
    integer-exact value column (cents) when cross-engine 6-decimal
    determinism matters — sums of doubles are order-sensitive.

    Returns (cohort, age, n_active, revenue, cum_revenue,
    ltv = cumulative revenue per cohort member, rounded to 6).
    """
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    from pyspark.sql import Window as _W

    b = (F.col(ts_col) / F.lit(int(bucket_width))).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        entity_col, b.alias("_b"), F.col(value_col).alias("_v")
    )
    firsts = base.groupBy(entity_col).agg(F.min("_b").alias("_cohort"))
    sizes = firsts.groupBy("_cohort").agg(
        F.count(F.lit(1)).alias("_size")
    )
    joined = base.join(firsts, on=entity_col)
    per = joined.groupBy(
        F.col("_cohort").alias("cohort"),
        (F.col("_b") - F.col("_cohort")).alias("age"),
    ).agg(
        F.countDistinct(entity_col).cast("long").alias("n_active"),
        F.sum("_v").alias("_rev"),
    )
    w = (
        _W.partitionBy("cohort").orderBy("age")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    out = (
        per.withColumn("_cum", F.sum("_rev").over(w))
        .join(
            F.broadcast(sizes.withColumnRenamed("_cohort", "cohort")),
            on="cohort",
        )
    )
    return out.select(
        "cohort",
        "age",
        "n_active",
        F.col("_rev").alias("revenue"),
        F.col("_cum").alias("cum_revenue"),
        F.round(F.col("_cum") / F.col("_size"), 6).alias("ltv"),
    )


def seasonal_decompose(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: int = 3600 * 10**9,
    period: int = 24,
    agg: str = "sum",
) -> DataFrame:
    """Classical additive seasonal decomposition of an event stream:
    bucket to a regular grid, then ``y = trend + seasonal + resid``
    with trend a centered (period+1)-point moving average, seasonal
    the phase-wise mean of the detrended series (normalized to sum to
    zero over a cycle), and resid the remainder — the first look any
    time-series drift investigation takes ("is this change trend,
    seasonality, or an anomaly?").

    Execution shape: one combiner-friendly (bucket) groupBy collapses
    the data-sized input to a SERIES-LENGTH relation; every later
    step (centered window, phase groupBy, broadcast joins back) runs
    on that small relation — at 100 TB the series is still only
    `span / bucket` rows, so the single-partition ordered window is
    bounded by calendar length, never data size. With an integer
    value column and agg='sum' the bucket values are exact, so the
    decomposition is engine-portable under 6-decimal rounding.

    Trend (and hence resid) is null for the first/last ``period //
    2`` buckets (incomplete centered window — the classic convention)
    and anywhere the bucket grid has a gap inside the window (a
    rows-frame over a gapped grid would average the wrong calendar
    span). ``agg`` is 'sum', 'mean', or 'count'.

    Returns ``(bucket_id, n_events, y, trend, phase, seasonal,
    resid)`` ordered by bucket, numerics rounded to 6.
    """
    from pyspark.sql import Window as _W

    if bucket <= 0 or period < 2:
        raise ValueError("bucket must be > 0 and period >= 2")
    if agg not in ("sum", "mean", "count"):
        raise ValueError("agg must be 'sum', 'mean', or 'count'")
    bid = _floor_div(ts_col, bucket)
    v = F.col(value_col)
    agg_expr = {
        "sum": F.sum(v),
        "mean": F.avg(v),
        "count": F.count(v),
    }[agg].cast("double")
    series = (
        df.filter(v.isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(bid.alias("bucket_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            agg_expr.alias("y"),
        )
    )
    half = period // 2
    wo = _W.orderBy("bucket_id")
    w = wo.rowsBetween(-half, half)
    # full AND contiguous centered window: count alone would accept a
    # gapped grid and average the wrong calendar span
    complete = (F.count(F.lit(1)).over(w) == 2 * half + 1) & (
        F.max("bucket_id").over(w) - F.min("bucket_id").over(w)
        == 2 * half
    )
    if period % 2 == 0:
        # 2 x MA: half-weight endpoints average exactly one cycle
        ma = (
            F.sum("y").over(w)
            - (F.lag("y", half).over(wo) + F.lead("y", half).over(wo))
            / F.lit(2.0)
        ) / F.lit(float(period))
    else:
        ma = F.avg("y").over(w)
    trended = series.withColumn(
        "trend", F.when(complete, ma)
    ).withColumn("phase", F.pmod(F.col("bucket_id"), F.lit(period)))
    phase_mean = (
        trended.filter(F.col("trend").isNotNull())
        .groupBy("phase")
        .agg(F.avg(F.col("y") - F.col("trend")).alias("_pm"))
    )
    center = phase_mean.agg(F.avg("_pm").alias("_c"))
    seasonal = (
        trended.join(F.broadcast(phase_mean), "phase", "left")
        .crossJoin(F.broadcast(center))
        .withColumn("seasonal", F.col("_pm") - F.col("_c"))
    )
    return seasonal.select(
        "bucket_id",
        "n_events",
        F.round("y", 6).alias("y"),
        F.round("trend", 6).alias("trend"),
        "phase",
        F.round("seasonal", 6).alias("seasonal"),
        F.round(
            F.col("y") - F.col("trend") - F.col("seasonal"), 6
        ).alias("resid"),
    ).orderBy("bucket_id")


def new_entities_curve(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    bucket: int = 24 * 3600 * 10**9,
) -> DataFrame:
    """Entity growth curve: per time bucket, how many ACTIVE entities
    were seen, how many were NEW (first activity ever in this
    bucket), how many RETURNING, and the cumulative distinct-entity
    count — the acquisition-vs-retention decomposition every
    DAU/WAU-style dashboard starts from.

    Two combiner-friendly exchanges over data-sized input: one
    (entity) groupBy for first-seen buckets and one (bucket, entity)
    distinct collapsed to per-bucket actives; everything after runs
    on the series-length relation (a full join of the two per-bucket
    rollups plus one cumulative window). Buckets with activity but no
    new entities report 0; the cumulative counts every entity once,
    at its first bucket.

    Returns ``(bucket_id, active, new_entities, returning,
    cum_entities)`` ordered by bucket.
    """
    from pyspark.sql import Window as _W

    if bucket <= 0:
        raise ValueError("bucket must be positive")
    base = df.filter(
        F.col(entity_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(entity_col).alias("_e"),
        _floor_div(ts_col, bucket).alias("bucket_id"),
    )
    first = base.groupBy("_e").agg(F.min("bucket_id").alias("_fb"))
    news = first.groupBy(F.col("_fb").alias("bucket_id")).agg(
        F.count(F.lit(1)).cast("long").alias("new_entities")
    )
    active = base.distinct().groupBy("bucket_id").agg(
        F.count(F.lit(1)).cast("long").alias("active")
    )
    joined = active.join(news, "bucket_id", "full").select(
        "bucket_id",
        F.coalesce("active", F.lit(0)).alias("active"),
        F.coalesce("new_entities", F.lit(0)).alias("new_entities"),
    )
    w = _W.orderBy("bucket_id").rowsBetween(
        _W.unboundedPreceding, 0
    )
    return joined.select(
        "bucket_id",
        "active",
        "new_entities",
        (F.col("active") - F.col("new_entities")).alias("returning"),
        F.sum("new_entities").over(w).cast("long").alias("cum_entities"),
    ).orderBy("bucket_id")


def ewma_backtest(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    bucket_width: int,
    alpha: float = 0.5,
    max_lags: int = 8,
    agg: str = "avg",
) -> DataFrame:
    """Backtest of the truncated-EWMA forecaster (predict this bucket
    from an exponentially weighted average of the last ``max_lags``
    buckets, weights ``(1 - alpha)^(k-1)`` renormalized over the lags
    that exist) against the lag-1 naive baseline — the smoothing rung
    above :func:`seasonal_naive_backtest` on the forecasting-sanity
    ladder; ``skill > 0`` means smoothing beats "yesterday again",
    i.e. the series is noisy rather than a random walk.

    The truncation is what keeps the statistic RELATIONAL: the exact
    recursive EWMA needs unbounded weights ((1-a)^t underflows and
    its reciprocal overflows on long series), while ``max_lags``
    bounded lag terms are one window pass, engine-portable, and
    within (1-alpha)^K of the recursion. With ``alpha = 0.5`` the
    weights are exact binary fractions, so integer-valued series
    score identically on any engine.

    Same execution shape as the seasonal backtest: one (entity,
    bucket) map-combinable groupBy, all lags + the collapse on ONE
    entity-hash exchange; grid gaps are lag-by-position (resample
    with fill first for sparse series).

    Returns ``(entity_col, n_evals, mae, mae_naive1, skill)``
    rounded to 6.
    """
    if agg not in ("avg", "sum"):
        raise ValueError("agg must be 'avg' or 'sum'")
    if bucket_width < 1 or max_lags < 1:
        raise ValueError("bucket_width and max_lags must be >= 1")
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    fn = F.avg if agg == "avg" else F.sum
    b = (F.col(ts_col) / F.lit(int(bucket_width))).cast("long")
    series = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(entity_col), b.alias("_b"))
        .agg(fn(value_col).alias("_v"))
    )
    w = Window.partitionBy(entity_col).orderBy("_b")
    lags = [F.lag("_v", k).over(w) for k in range(1, max_lags + 1)]
    weights = [(1.0 - alpha) ** (k - 1) for k in range(1, max_lags + 1)]
    num = None
    den = None
    for lg, wt in zip(lags, weights):
        term = F.when(lg.isNotNull(), lg * F.lit(wt)).otherwise(
            F.lit(0.0)
        )
        mass = F.when(lg.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = mass if den is None else den + mass
    scored = (
        series.withColumn(
            "_f", F.when(den > 0, num / den)
        )
        .withColumn("_f1", F.lag("_v", 1).over(w))
        .withColumn("_err", F.col("_v") - F.col("_f"))
        .withColumn("_err1", F.col("_v") - F.col("_f1"))
    )
    evals = scored.filter(F.col("_f").isNotNull())
    out = evals.groupBy(entity_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_evals"),
        F.round(F.avg(F.abs("_err")), 6).alias("mae"),
        F.round(
            F.avg(F.when(F.col("_f1").isNotNull(), F.abs("_err1"))), 6
        ).alias("mae_naive1"),
    )
    return out.withColumn(
        "skill",
        F.round(
            F.when(
                F.col("mae_naive1") > 0,
                F.lit(1.0) - F.col("mae") / F.col("mae_naive1"),
            ),
            6,
        ),
    )


def mann_kendall(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str | None = None,
    bucket: str = "day",
) -> DataFrame:
    """Mann-Kendall monotonic-trend test + Sen's slope per group —
    the nonparametric "is this metric drifting?" answer (no linearity
    or normality assumed, robust to outliers; Sen's slope is the
    median pairwise rate of change, the robust twin of the OLS
    slope in ``linear_fit``).

        S     = sum over bucket pairs i<j of sign(v_j - v_i)
        VarS  = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18   (tie term)
        Z     = (S -/+ 1) / sqrt(VarS)  (continuity-corrected, 0 at S=0)
        slope = median over pairs of (v_j - v_i) / (t_j - t_i)

    Data-sized work is ONE (group, bucket) groupBy; the O(n^2)
    pairwise pass runs INSIDE an Arrow batch per group on the
    calendar-bounded bucket series (n = #buckets, fixed by time span,
    independent of row count — the same boundedness argument as
    ``seasonal_decompose``). Bucket means are rounded to 6 decimals
    BEFORE the kernel so sign/median decisions are engine-portable.

    Returns per group: (group, n_buckets, s, var_s, z, sen_slope);
    z is null for degenerate series (n < 2 or all-tied).
    """
    import numpy as np
    import pandas as pd

    gcol = group_col or F.lit("all").alias("_g")
    gname = group_col or "_g"
    daily = (
        df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(
            (F.col(group_col) if group_col else gcol).alias("_g"),
            F.date_trunc(bucket, F.col(ts_col)).alias("_d"),
        )
        .agg(F.round(F.avg(value_col), 6).alias("_v"))
    )
    schema = (
        "group string, n_buckets long, s long, var_s double, "
        "z double, sen_slope double"
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_d")
        v = pdf["_v"].to_numpy(dtype=np.float64)
        t = (
            pdf["_d"].astype("datetime64[ns]").astype("int64").to_numpy()
            / 86400e9
        )
        g = str(pdf["_g"].iloc[0])
        n = len(v)
        if n < 2:
            return pd.DataFrame(
                [[g, n, 0, None, None, None]],
                columns=[
                    "group", "n_buckets", "s", "var_s", "z", "sen_slope"
                ],
            )
        dv = v[None, :] - v[:, None]
        dt = t[None, :] - t[:, None]
        iu = np.triu_indices(n, k=1)
        s = int(np.sign(dv[iu]).sum())
        _, tie_counts = np.unique(v, return_counts=True)
        tt = float(
            (tie_counts * (tie_counts - 1) * (2 * tie_counts + 5)).sum()
        )
        var_s = (n * (n - 1) * (2 * n + 5) - tt) / 18.0
        if var_s > 0:
            if s > 0:
                z = (s - 1) / np.sqrt(var_s)
            elif s < 0:
                z = (s + 1) / np.sqrt(var_s)
            else:
                z = 0.0
            z = round(float(z), 6)
        else:
            z = None
        slope = round(float(np.median(dv[iu] / dt[iu])), 6)
        return pd.DataFrame(
            [[g, n, s, round(var_s, 6), z, slope]],
            columns=["group", "n_buckets", "s", "var_s", "z", "sen_slope"],
        )

    return daily.groupBy("_g").applyInPandas(_kernel, schema)


def pettitt_test(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str | None = None,
    bucket: str = "day",
) -> DataFrame:
    """Pettitt changepoint test per group — the nonparametric "WHEN
    did this metric shift?" companion to :func:`mann_kendall` (MK asks
    whether a monotone drift exists; Pettitt locates a single abrupt
    level change, no distribution assumed — the rank-based alternative
    to the CUSUM detector's known-baseline requirement):

        U_t = sum_{i<=t} sum_{j>t} sign(x_j - x_i),
        K = max_t |U_t|,  p ~= 2 exp(-6 K^2 / (n^3 + n^2))

    computed via the antisymmetry identity ``U_t = sum_{i<=t} V_i``
    with ``V_i = sum_j sign(x_j - x_i)`` (the i,j <= t double sum
    cancels), so the kernel is one O(n^2) pass + a cumsum, confined to
    an Arrow batch over the calendar-bounded bucket series — identical
    execution shape to :func:`mann_kendall`, ONE (group, bucket)
    groupBy of the data. Bucket means rounded to 6 before the kernel
    for engine portability.

    Returns per group: ``(group, n_buckets, k_stat, u_at_k,
    change_bucket, p_approx)`` — ``change_bucket`` is the LAST bucket
    of the pre-change segment (first argmax on ties, as a yyyy-MM-dd
    string); null stats for series shorter than 2 buckets.
    """
    import numpy as np
    import pandas as pd

    gcol = F.col(group_col) if group_col else F.lit("all")
    daily = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .groupBy(
            gcol.alias("_g"),
            F.date_trunc(bucket, F.col(ts_col)).alias("_d"),
        )
        .agg(F.round(F.avg(value_col), 6).alias("_v"))
    )
    schema = (
        "group string, n_buckets long, k_stat long, u_at_k long, "
        "change_bucket string, p_approx double"
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_d")
        v = pdf["_v"].to_numpy(dtype=np.float64)
        g = str(pdf["_g"].iloc[0])
        n = len(v)
        cols = [
            "group", "n_buckets", "k_stat", "u_at_k",
            "change_bucket", "p_approx",
        ]
        if n < 2:
            return pd.DataFrame(
                [[g, n, None, None, None, None]], columns=cols
            )
        vi = np.sign(v[None, :] - v[:, None]).sum(axis=1)
        u = np.cumsum(vi)[:-1]  # splits after positions 1..n-1
        k = int(np.abs(u).max())
        idx = int(np.abs(u).argmax())  # first argmax
        p = min(1.0, 2.0 * np.exp(-6.0 * k * k / (n**3 + n**2)))
        change = pd.Timestamp(pdf["_d"].iloc[idx]).strftime("%Y-%m-%d")
        return pd.DataFrame(
            [[g, n, k, int(u[idx]), change, round(float(p), 6)]],
            columns=cols,
        )

    return daily.groupBy("_g").applyInPandas(_kernel, schema)


def holt_backtest(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_col: str | None = None,
    alpha: float = 0.5,
    beta: float = 0.3,
    bucket: str = "day",
) -> DataFrame:
    """One-step-ahead backtest of Holt's linear-trend smoother (double
    exponential smoothing) against the lag-1 naive — the trend rung of
    the forecasting-sanity ladder above :func:`ewma_backtest` (EWMA
    assumes a level; Holt tracks level + slope, so drifting metrics
    stop lagging):

        l_t = alpha v_t + (1 - alpha)(l_{t-1} + b_{t-1})
        b_t = beta (l_t - l_{t-1}) + (1 - beta) b_{t-1}
        forecast_t = l_{t-1} + b_{t-1}     (init l_1 = v_1, b_1 = 0)

    The genuinely-sequential recursion runs in an Arrow batch per
    group over the calendar-bounded bucket series (the
    :func:`mann_kendall` boundedness argument); data-sized work is
    ONE (group, bucket) groupBy. Bucket means round to 6 first and
    the recursion is written with the exact operation order of the
    oracle's recursive CTE, so the trajectories are engine-identical.

    Returns per group: ``(group, n_evals, mae, mae_naive1, skill)``
    rounded to 6 — ``skill = 1 - mae / mae_naive1`` (> 0: modeling
    the trend beats "yesterday again"); null for series shorter than
    2 buckets or a zero-error naive.
    """
    if not 0 < alpha <= 1 or not 0 <= beta <= 1:
        raise ValueError("alpha in (0, 1], beta in [0, 1] required")
    import numpy as np
    import pandas as pd

    gcol = F.col(group_col) if group_col else F.lit("all")
    daily = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .groupBy(
            gcol.alias("_g"),
            F.date_trunc(bucket, F.col(ts_col)).alias("_d"),
        )
        .agg(F.round(F.avg(value_col), 6).alias("_v"))
    )
    a, bt = float(alpha), float(beta)
    schema = (
        "group string, n_evals long, mae double, "
        "mae_naive1 double, skill double"
    )

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_d")
        v = pdf["_v"].to_numpy(dtype=np.float64)
        g = str(pdf["_g"].iloc[0])
        cols = ["group", "n_evals", "mae", "mae_naive1", "skill"]
        n = len(v)
        if n < 2:
            return pd.DataFrame([[g, 0, None, None, None]], columns=cols)
        l, b = v[0], 0.0
        err = 0.0
        err_naive = 0.0
        for t in range(1, n):
            fc = l + b
            err += abs(v[t] - fc)
            err_naive += abs(v[t] - v[t - 1])
            l_new = a * v[t] + (1 - a) * (l + b)
            b = bt * (l_new - l) + (1 - bt) * b
            l = l_new
        n_ev = n - 1
        mae = err / n_ev
        mae_n = err_naive / n_ev
        skill = round(1.0 - mae / mae_n, 6) if mae_n > 0 else None
        return pd.DataFrame(
            [[g, n_ev, round(mae, 6), round(mae_n, 6), skill]],
            columns=cols,
        )

    return daily.groupBy("_g").applyInPandas(_kernel, schema)
