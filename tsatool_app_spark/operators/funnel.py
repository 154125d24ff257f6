"""Event-sequence analytics: ordered funnels and cohort retention.

The reference's domain is a timestamped event/observation stream per
entity (station, sensor); the two questions every such stream eventually
gets asked are "who progressed through these steps, in order?" (funnel)
and "of the entities first seen in period X, how many were active in
period X+k?" (retention). Both are single-aggregation plans:

- :func:`funnel_counts`: one conditional-min aggregate per step over ONE
  scan (no per-step self-joins — the textbook k-way join formulation is
  O(k) scans and k shuffles; this is 1 and 1), then ordered-timestamp
  comparisons. Per-entity state is k timestamps regardless of event
  volume.
- :func:`cohort_retention`: first-seen period per entity (one aggregate),
  broadcast back onto the entity's active periods, grouped into the
  (cohort, offset) matrix — two shuffles total, both on the entity key /
  cohort key.

Determinism: counts only — no float arithmetic anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    *,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: for each prefix of ``steps``, the number of
    entities whose FIRST occurrence of each step is strictly later than the
    first occurrence of the previous step.

    Returns (step, n_entities) with step index 1..len(steps), monotone
    non-increasing counts.
    """
    firsts = events.where(F.col(type_col).isin(list(steps))).groupBy(entity_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(time_col))).alias(f"t{i}")
            for i, s in enumerate(steps)
        ]
    )
    # reached step i  <=>  t0 < t1 < ... < ti (all present, strictly ordered)
    conds = []
    prior = None
    for i in range(len(steps)):
        c = F.col(f"t{i}").isNotNull()
        if prior is not None:
            c = c & (F.col(f"t{i}") > F.col(f"t{i-1}")) & prior
        conds.append(c)
        prior = conds[-1]
    counts = firsts.agg(
        *[
            F.count(F.when(conds[i], F.lit(1))).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    per_step = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(steps[i]).alias("event_type"),
                F.col(f"n{i}").cast("long").alias("n_entities"),
            )
            for i in range(len(steps))
        ]
    )
    return counts.select(F.explode(per_step).alias("s")).select("s.*")


def cohort_retention(
    events: DataFrame,
    period_seconds: int,
    *,
    entity_col: str = "user_id",
    time_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort × period-offset activity matrix in long form: entities are
    cohorted by the period of their first event; for each later period
    offset k, count how many of the cohort were active.

    Returns (cohort_period, offset, n_active) where cohort_period is the
    epoch-seconds start of the cohort's period.
    """
    period = (F.col(time_col).cast("long") / period_seconds).cast("long")
    active = events.select(
        F.col(entity_col).alias("e"), period.alias("p")
    ).distinct()
    first = active.groupBy("e").agg(F.min("p").alias("p0"))
    joined = active.join(first, "e").select(
        (F.col("p0") * period_seconds).alias("cohort_period"),
        (F.col("p") - F.col("p0")).cast("long").alias("offset"),
        "e",
    )
    if max_offset is not None:
        joined = joined.where(F.col("offset") <= max_offset)
    return joined.groupBy("cohort_period", "offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )


def transition_counts(
    events: DataFrame,
    *,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    order_tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """First-order Markov transition counts: how often does event type A
    immediately precede event type B within an entity's timeline?
    (from_type, to_type, n) — the input for journey diagrams and
    next-event models.

    One lag window per entity + one pair aggregate: two shuffles, O(1)
    window state. Include a unique tiebreak when timestamps can collide.
    """
    w = Window.partitionBy(entity_col).orderBy(
        F.col(time_col), *[F.col(c) for c in order_tiebreak]
    )
    pairs = events.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def first_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    *,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    order_tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """First-touch attribution: for every entity that converted, which
    event type was their FIRST interaction (any type, before or at the
    conversion)? Returns (first_touch_type, n_converted) — the marketing
    'which channel gets credit' rollup.

    One aggregate computes each entity's first event and first conversion
    time together (min over (time, tiebreak, type) structs — no window,
    no second scan); converted = has any conversion.
    """
    tb = [F.col(c) for c in order_tiebreak]
    first_any = F.min(F.struct(F.col(time_col), *tb, F.col(type_col)))
    first_conv = F.min(
        F.when(
            F.col(type_col) == conversion_type,
            F.struct(F.col(time_col), *tb),
        )
    )
    per_entity = events.groupBy(entity_col).agg(
        first_any.alias("_fa"), first_conv.alias("_fc")
    )
    return (
        per_entity.where(F.col("_fc").isNotNull())
        .select(F.col(f"_fa.{type_col}").alias("first_touch_type"))
        .groupBy("first_touch_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_converted"))
    )


def funnel_counts_windowed(
    events: DataFrame,
    steps: list[str],
    max_gap_seconds: int,
    *,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
) -> DataFrame:
    """:func:`funnel_counts` with a completion window: each step's first
    occurrence must follow the previous step's within ``max_gap_seconds``
    (the product-metric form: 'signed up, then purchased within 7 days').
    Same single-aggregate plan; only the step predicate changes.

    Note the semantics inherit funnel_counts' FIRST-occurrence rule: a
    later in-window occurrence of a step does not rescue an entity whose
    first occurrence was out of window."""
    firsts = events.where(F.col(type_col).isin(list(steps))).groupBy(entity_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(time_col))).alias(f"t{i}")
            for i, s in enumerate(steps)
        ]
    )
    conds = []
    prior = None
    for i in range(len(steps)):
        c = F.col(f"t{i}").isNotNull()
        if prior is not None:
            gap_ok = (
                F.col(f"t{i}").cast("long") - F.col(f"t{i-1}").cast("long")
            ) <= max_gap_seconds
            c = c & (F.col(f"t{i}") > F.col(f"t{i-1}")) & gap_ok & prior
        conds.append(c)
        prior = conds[-1]
    counts = firsts.agg(
        *[
            F.count(F.when(conds[i], F.lit(1))).alias(f"n{i}")
            for i in range(len(steps))
        ]
    )
    per_step = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(steps[i]).alias("event_type"),
                F.col(f"n{i}").cast("long").alias("n_entities"),
            )
            for i in range(len(steps))
        ]
    )
    return counts.select(F.explode(per_step).alias("s")).select("s.*")


def active_counts(
    events: DataFrame,
    *,
    entity_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """Engagement rollup: distinct active entities per calendar day (DAU)
    and per ISO week (WAU, repeated on each of its days for joinability).

    The week key is (ISO week, ISO week-YEAR) — pairing weekofyear with
    the CALENDAR year would merge late-December ISO-week-1 days (e.g.
    2024-12-30, ISO week 1 of 2025) into the same group as that year's
    January week 1, over-counting both WAUs.

    Two distinct-aggregates over the (entity, day) de-dup — the exact
    shuffles are on (entity, day) pairs, bounded by activity, not events.
    """
    days = events.select(
        F.col(entity_col).alias("e"),
        F.to_date(time_col).alias("day"),
    ).distinct()
    dau = days.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    weeks = days.select(
        "e",
        "day",
        F.weekofyear("day").alias("wk"),
        F.expr("extract(YEAROFWEEK FROM day)").cast("int").alias("yr"),
    )
    wau = (
        weeks.select("e", "wk", "yr")
        .distinct()
        .groupBy("wk", "yr")
        .agg(F.count(F.lit(1)).cast("long").alias("wau"))
    )
    return (
        dau.join(
            weeks.select("day", "wk", "yr").distinct(), "day"
        )
        .join(wau, ["wk", "yr"])
        .select("day", "dau", "wau")
        .orderBy("day")
    )
