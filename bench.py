#!/usr/bin/env python
"""Headline benchmark: runs the driver-contract queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is executed to completion (count + a cheap checksum collect) so
lazy plans can't cheat; per-query wall time includes Catalyst planning.

The same parquet is also timed through DuckDB running each query's oracle SQL
(single process, all cores — the strongest practical single-node baseline),
giving a measured denominator: "queries_duckdb" holds oracle seconds,
"ratio" spark/duckdb per query, "ratio_geomean" the overall factor. Oracles
are best-of-k like the Spark side; a per-oracle budget (interrupt) keeps
brute-force oracles (e.g. the all-pairs Jaccard check) from dominating the
bench wall time. Spark's ~0.2 s fixed per-job overhead dominates the tiny
queries' ratios — the geomean is the honest summary, per-query ratios the
detail.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import threading
import time

ORACLE_BUDGET_S = float(os.environ.get("SPARK_GRAFT_ORACLE_BUDGET_S", "60"))


def time_oracles(sf_dir: str, oracles: dict[str, str], repeats: int) -> dict[str, float]:
    import duckdb

    from tsatool_app_spark.model import TESTDATA_TABLES

    mem_limit = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "24GB")
    out: dict[str, float] = {}
    for name, sql in oracles.items():
        best = None
        for _ in range(repeats):
            # Fresh connection per repeat: Timer.interrupt can fire in the
            # window between fetchall() returning and timer.cancel(), and a
            # poisoned connection would corrupt the NEXT measurement (the
            # r2 timer race).  Views over parquet are metadata-only, so the
            # per-repeat setup cost is negligible.  The whole repeat —
            # INCLUDING connect/view setup — sits in one try: an oracle
            # that OOMs (r12: a clone-dense near-dup replay at sf10 blew
            # DuckDB's allocator and killed the board AFTER the Spark
            # phase, losing every timing) records -1 for ITS row instead
            # of aborting the run, and the per-connection memory_limit
            # keeps one oracle from taking the process down.
            timer = None
            con = None
            t0 = time.time()
            try:
                con = duckdb.connect()
                con.execute(f"SET memory_limit='{mem_limit}'")
                for t in TESTDATA_TABLES:
                    # driver testdata is one file per table; generated
                    # tiers (scripts/gen_sf1.py) are directories of parts
                    p = f"{sf_dir}/{t}.parquet"
                    src = f"{p}/*.parquet" if os.path.isdir(p) else p
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
                    )
                timer = threading.Timer(ORACLE_BUDGET_S, con.interrupt)
                timer.start()
                t0 = time.time()
                con.sql(sql).fetchall()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            except Exception:  # interrupted (budget), OOM, or oracle error
                # Keep an earlier successful timing rather than forcing -1.
                break
            finally:
                if timer is not None:
                    timer.cancel()
                if con is not None:
                    try:
                        con.close()
                    except Exception:  # noqa: BLE001
                        pass
        out[name] = round(best, 3) if best is not None else -1.0
    return out


def calibration_anchor(spark) -> dict:
    """Fixed-work machine-speed anchor, timed at board START and END and
    recorded in the env block (r12 VERDICT #2): a deterministic in-JVM
    Spark aggregate and the same-shape DuckDB aggregate, both independent
    of the scale factor and of any query under test.  When two boards (or
    the two ends of one board) disagree on walls, the anchor ratio says
    how much of the delta is MACHINE state — the r12 32-core driver board
    ran 2-3x slow on 64 untouched rows and needed a whole second 8-core
    board to prove it; with anchors the decomposition is one division.
    Kept additive: anchors live in the full-board env block only; the
    driver-parsed compact line is unchanged."""
    import duckdb

    spark_s = None
    for _ in range(2):  # best-of-2: the first run pays codegen/JIT
        t0 = time.time()
        # avg, not sum: sum(hash) overflows int64 under ANSI mode
        spark.range(0, 50_000_000, 1, 64).selectExpr(
            "avg(xxhash64(id)) AS s"
        ).collect()
        dt = time.time() - t0
        spark_s = dt if spark_s is None else min(spark_s, dt)
    duck_s = None
    con = duckdb.connect()
    try:
        for _ in range(2):
            t0 = time.time()
            con.sql(
                "SELECT sum(i * 2654435761) FROM range(50000000) t(i)"
            ).fetchall()
            dt = time.time() - t0
            duck_s = dt if duck_s is None else min(duck_s, dt)
    finally:
        con.close()
    return {"spark_s": round(spark_s, 3), "duckdb_s": round(duck_s, 3)}


def env_metadata(sf_dir: str, repeats: int) -> dict:
    """Board provenance: engine versions, machine shape, repeat policy,
    tier row counts.  Added after the r10b->r11b denominator shift showed
    round-over-round ratio comparisons are meaningless without pinning
    which duckdb/PySpark/CPU produced the numbers (VERDICT r11 item 1)."""
    import platform

    import duckdb
    import pyspark

    meta = {
        "python": platform.python_version(),
        "pyspark": pyspark.__version__,
        "duckdb": duckdb.__version__,
        "cpus": os.cpu_count(),
        "spark_master": f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]",
        "repeats": repeats,
        "oracle_budget_s": ORACLE_BUDGET_S,
        "timing": "best_of_k",
    }
    try:
        import pyarrow.parquet as pq

        from tsatool_app_spark.model import TESTDATA_TABLES

        counts = {}
        for t in TESTDATA_TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):
                n = sum(
                    pq.ParquetFile(os.path.join(p, f)).metadata.num_rows
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
            elif os.path.exists(p):
                n = pq.ParquetFile(p).metadata.num_rows
            else:
                continue
            counts[t] = n
        meta["table_rows"] = counts
    except Exception:  # noqa: BLE001 - metadata must never fail the board
        pass
    return meta


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from tsatool_app_spark.plans.driver_queries import QUERIES
    from tsatool_app_spark.session import get_spark

    # Optional subset (comma-separated names): used for targeted boards —
    # e.g. the sf10 >2x-adjudication board — where running all 169 rows
    # at a heavy tier would serve nothing.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in QUERIES]
        if unknown:
            raise SystemExit(f"unknown queries in SPARK_GRAFT_BENCH_ONLY: {unknown}")
        QUERIES = {n: QUERIES[n] for n in names}

    spark = get_spark("tsatool-bench")
    # Warm the JVM + parquet footer caches with a trivial job so the first
    # measured query doesn't pay session startup.
    spark.range(1).count()
    anchor_start = calibration_anchor(spark)

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    for name, q in QUERIES.items():
        best = None
        for _ in range(repeats):
            t0 = time.time()
            try:
                df = q.fn(spark, sf_dir)
                df.count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            except Exception as e:  # noqa: BLE001 - report, don't abort the suite
                failures[name] = str(e)[:200]
                best = -1.0
                break
        # best-of-k: per-query wall excludes scheduler noise; plans are
        # rebuilt per run (no cached DataFrames), so Catalyst planning is
        # still included — only OS/JIT jitter is excluded.
        timings[name] = round(best, 3)
        # Drop the query's python refs NOW so ContextCleaner reclaims its
        # localCheckpoint RDD blocks before the next query runs: with 130+
        # queries in one JVM the leaked blocks otherwise pile into storage
        # memory and the late heavy queries pay GC/spill for the whole
        # board (measured: minhash-family queries +30-60% wall at the
        # 133-query board vs the 113-query snapshot).
        df = None
        gc.collect()

    oracle_timings = time_oracles(
        sf_dir, {n: q.oracle for n, q in QUERIES.items() if q.oracle}, repeats
    )
    ratios = {
        n: round(timings[n] / oracle_timings[n], 2)
        for n in oracle_timings
        if timings.get(n, -1) > 0 and oracle_timings[n] > 0
    }
    geomean = None
    geomean_db = None
    n_db = 0
    if ratios:
        import math

        geomean = round(
            math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios)), 3
        )
        # Data-bound subset: rows whose DuckDB oracle takes >= 0.2 s, i.e.
        # where Spark's fixed per-job floor doesn't dominate the ratio.
        # This is the round-over-round headline (VERDICT r3-r11 convention),
        # computed in-board so it can't drift with hand recomputation.
        db = {n: r for n, r in ratios.items() if oracle_timings[n] >= 0.2}
        n_db = len(db)
        if db:
            geomean_db = round(
                math.exp(sum(math.log(r) for r in db.values()) / len(db)), 3
            )

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    env = env_metadata(sf_dir, repeats)
    env["anchor_start"] = anchor_start
    env["anchor_end"] = calibration_anchor(spark)
    full = {
        "metric": "driver_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "queries_duckdb": oracle_timings,
        "ratio": ratios,
        "ratio_geomean": geomean,
        "ratio_geomean_databound": geomean_db,
        "n_databound": n_db,
        "env": env,
    }
    if failures:
        full["failures"] = failures
    # Full detail (duckdb denominators, per-query ratios, 3-decimal timings)
    # goes to a file: the driver captures only the tail of stdout, and the
    # r2 one-line dump overflowed it, losing the Spark timings from the
    # artifact (BENCH_r02 `parsed: null`).
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
    )
    with open(full_path, "w") as f:
        json.dump(full, f, indent=2)
    print(f"full detail: {full_path}", file=sys.stderr)

    # Primary line: compact (minified, 2-decimal) so the LAST stdout line —
    # the one the driver parses — fits its capture window with room to spare.
    compact = {
        "metric": "driver_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": {n: round(t, 2) for n, t in timings.items()},
        "sf": sf,
        "ratio_geomean": geomean,
        "ratio_geomean_databound": geomean_db,
        "n_databound": n_db,
    }
    if failures:
        compact["failed"] = sorted(failures)
    print(json.dumps(compact, separators=(",", ":")))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
