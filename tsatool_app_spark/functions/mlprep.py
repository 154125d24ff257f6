"""ML feature-preparation operators: robust outlier flagging and per-group
standardization.

The last mile before training: flag rows outside the Tukey fences
(quartile-based, robust to the outliers themselves) and scale features to
zero-mean/unit-variance within groups. Both are two-phase plans — a small
per-group statistics aggregate broadcast back onto the scan — so the big
table is never shuffled (the stats side is one row per group).

Exactness rules (same doctrine as the rest of the registry):

- quartiles are PERCENTILE_DISC selections (operators/olap.py) — no
  interpolation, engine-exact;
- means/variances accumulate in DECIMAL (sum and sum-of-squares; the
  squares use a width the engines' 38-digit caps can hold exactly), so
  the only float ops are the final divisions and the sqrt — identical
  IEEE in both engines when written identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsatool_app_spark.operators.olap import percentile_disc_by_group


def iqr_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k: float = 1.5,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Tukey-fence outlier flags per group: a row is an outlier iff its
    value lies outside [q25 - k·IQR, q75 + k·IQR] for its group's discrete
    quartiles. Adds (q25, q75, is_outlier)."""
    q = percentile_disc_by_group(
        df, group_col, value_col, [0.25, 0.75], tiebreak_cols=tiebreak_cols
    ).select(group_col, "p25", "p75")
    joined = df.join(F.broadcast(q), group_col)
    iqr = F.col("p75") - F.col("p25")
    lo = F.col("p25") - F.lit(k) * iqr
    hi = F.col("p75") + F.lit(k) * iqr
    return joined.withColumn(
        "is_outlier", (F.col(value_col) < lo) | (F.col(value_col) > hi)
    ).select(*df.columns, "p25", "p75", "is_outlier")


def zscore_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    out_col: str = "z",
    value_scale: int = 2,
) -> DataFrame:
    """Population z-score within each group: (x - mean) / stddev_pop,
    computed in INTEGER fixed-point units (value × 10^value_scale) so the
    sum and sum-of-squares are exact longs — z-scores are scale-invariant,
    so working in cents changes nothing but removes every accumulation
    rounding. (A decimal sum-of-squares cast to double is NOT safe here:
    DuckDB converts wide decimals via int128→double→÷10^scale, a double
    rounding that drifts an ulp from a correctly-rounded cast and breaks
    bit-equality with the oracle.)

    ``value_scale`` must cover the data's true decimal places (the cast to
    DECIMAL asserts nothing; choose from data contracts). Sums overflow
    long — loudly, under ANSI — around 3e18 fixed-point units per group;
    at that volume switch the accumulators to DECIMAL(38,0) and accept the
    cast caveat above. Groups with zero variance yield NULL z.
    """
    c = (
        (F.col(value_col).cast(f"decimal(18,{value_scale})") * (10 ** value_scale))
        .cast("long")
    )
    stats = df.select(group_col, c.alias("_c")).groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_c").alias("_s"),
        F.sum(F.col("_c") * F.col("_c")).alias("_ss"),
    )
    mean = F.col("_s").cast("double") / F.col("_n")
    var = F.col("_ss").cast("double") / F.col("_n") - mean * mean
    stats = stats.select(
        group_col,
        mean.alias("_mean"),
        F.when(var > 0, F.sqrt(var)).alias("_sd"),
    )
    joined = df.join(F.broadcast(stats), group_col)
    return joined.select(
        *df.columns,
        ((c.cast("double") - F.col("_mean")) / F.col("_sd")).alias(out_col),
    )


def hashed_features(
    docs: DataFrame,
    *,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The hashing trick (Weinberger et al.): bag-of-words folded into a
    fixed n_buckets-dim sparse vector per document, no vocabulary pass.
    Emitted as exploded (id, bucket, weight) triples — the layout a 100 TB
    featurizer wants anyway (dense vectors of hot buckets stay unmaterialized,
    downstream aggregates/joins work per-triple).

    bucket = md5(token) mod n_buckets; sign = ±1 from the next md5 bit so
    collisions cancel in expectation (signed hashing).  md5 keeps the
    mapping engine-portable (same trick as sketches.cms_build), hence
    driver-hash-checkable.

    One explode + one groupBy(id, bucket) with map-side combine; nothing
    else shuffles."""
    from tsatool_app_spark.functions.corpus import _tokens

    h = F.md5(F.concat(F.lit("fh|"), F.col("term")))
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets).cast("int")
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("int") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        docs.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term"))
        .select(F.col(id_col), bucket.alias("bucket"), sign.alias("sign"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").cast("long").alias("weight"))
        .where(F.col("weight") != 0)
        .orderBy(id_col, "bucket")
    )
