"""Analysis lifecycle orchestration (SURVEY §3).

Reference structure (one level per input granularity):

- AnalysisCollection (workbook) → CondCollection (sheet, one shared
  [time_from, time_until] window) → Condition (row) → Block (term).
- The reference pins each sheet to one DB connection and materializes
  session temp tables, running primaries before secondaries in user row
  order (cond_collection.py:166-187) — secondary-on-secondary correctness
  RELIES on user ordering (`:169-171`).

Spark-first changes (no semantic impact, SURVEY §7.4):

- conditions are lazy DataFrames; "temp tables" are just cached DFs;
- secondary dependencies get a REAL topological sort with cycle detection —
  a strict improvement that preserves all accepted inputs;
- the shared time-windowed observations DF (obs_main, P1) is built once per
  collection and cached; Catalyst pushes the window filter into the scan;
- sheets (collections) are independent Spark jobs, parallelizable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, time, timedelta
from graphlib import CycleError, TopologicalSorter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsatool_app_spark.dsl.condition import ConditionSpec
from tsatool_app_spark.dsl.errors import ErrorCollection
from tsatool_app_spark.operators.combine import combine_blocks
from tsatool_app_spark.operators.ranges import (
    pack_ranges_from_stepped,
    prepare_stepped_obs,
)
from tsatool_app_spark.operators.summary import validity_summary

#: Reading-validity cap in minutes, hard-coded in the reference at
#: block.py:218 (p_maxminutes := 30).
DEFAULT_MAX_MINUTES = 30


@dataclass
class ConditionResult:
    spec: ConditionSpec
    ranges: DataFrame | None = None  # (vfrom, vuntil, vdiff_s, <aliases...>, master)
    summary: DataFrame | None = None  # one-row validity rollup (A3)


@dataclass
class CondCollection:
    """One sheet: conditions sharing a [time_from, time_until] window.

    The sheet window semantics (cond_collection.py:39-45): start date floored
    to 00:00:00, end date extended to 23:59:59, both INCLUSIVE (P1:
    tfrom BETWEEN t0 AND t1).
    """

    name: str
    time_from: datetime
    time_until: datetime
    conditions: "dict[str, ConditionSpec]" = field(default_factory=dict)
    errors: ErrorCollection = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        self.time_from = datetime.combine(self.time_from.date(), time.min)
        self.time_until = datetime.combine(self.time_until.date(), time(23, 59, 59))
        self.errors = ErrorCollection(f"COLLECTION <{self.name}>")

    @classmethod
    def from_rows(
        cls,
        name: str,
        time_from: datetime,
        time_until: datetime,
        rows: list[tuple[str, str, str]],
    ) -> "CondCollection":
        """rows: (site, master_alias, raw_condition) — the sheet shape
        (cond_collection.py:467-517, cells A/B/C from row 4 on)."""
        coll = cls(name, time_from, time_until)
        for i, row in enumerate(rows):
            if len(row) != 3 or any(v is None or str(v).strip() == "" for v in row):
                coll.errors.add(f"Row {i}: empty or missing cell, row skipped")
                continue
            site, alias, raw = row
            try:
                spec = ConditionSpec(
                    site, alias, raw, coll.time_from, coll.time_until, excel_row=i
                )
            except ValueError as e:
                coll.errors.add(f"Row {i}: {e}")
                continue
            if spec.id_string in coll.conditions:
                # Uniqueness of site_masteralias enforced
                # (cond_collection.py:82-87).
                coll.errors.add(
                    f'Duplicate condition id "{spec.id_string}", row skipped'
                )
                continue
            coll.conditions[spec.id_string] = spec
        return coll

    # -- planning --------------------------------------------------------

    def execution_order(self) -> list[str]:
        """Topologically sort conditions by secondary dependencies.

        Unknown references and cycles are recorded as errors and the
        offending conditions dropped (the reference would fail at SQL time;
        we fail at plan time, same inputs rejected plus cycles)."""
        graph: dict[str, set[str]] = {}
        runnable = {
            cid: c for cid, c in self.conditions.items() if c.blocks_made
        }
        for cid, c in runnable.items():
            deps = c.dependencies()
            for dep in deps:
                if dep not in self.conditions:
                    c.errors.add(f'Secondary reference to undefined condition "{dep}"')
                elif dep not in runnable:
                    c.errors.add(f'Secondary reference to invalid condition "{dep}"')
            graph[cid] = deps
        # Drop conditions whose dependencies are unavailable, transitively.
        changed = True
        while changed:
            changed = False
            for cid in list(graph):
                if any(d not in graph for d in graph[cid]):
                    del graph[cid]
                    changed = True
        try:
            order = list(TopologicalSorter(graph).static_order())
        except CycleError as e:
            self.errors.add(f"Cyclic secondary references: {e.args[1]}")
            return []
        return [cid for cid in order if cid in graph]

    # -- execution -------------------------------------------------------

    def run(
        self,
        obs: DataFrame,
        *,
        max_minutes: int = DEFAULT_MAX_MINUTES,
        key_cols: tuple[str, str] = ("statid", "seid"),
        time_col: str = "tfrom",
        sensor_name_to_id: dict[str, int] | None = None,
        cache_results: bool = True,
    ) -> dict[str, ConditionResult]:
        """Execute all runnable conditions against an observations DF.

        ``obs``: observations in the obs_main shape. The collection's time
        window (P1) is applied here once; with date-partitioned storage the
        filter prunes partitions before any shuffle.
        """
        windowed = obs.where(
            F.col(time_col).between(F.lit(self.time_from), F.lit(self.time_until))
        )

        # Sensor name→id resolution (J5) for primary blocks.
        if sensor_name_to_id:
            for c in self.conditions.values():
                for b in c.primary_blocks():
                    b.resolve_sensor_id(sensor_name_to_id)

        results: dict[str, ConditionResult] = {
            cid: ConditionResult(spec=c) for cid, c in self.conditions.items()
        }

        order = self.execution_order()

        # ONE predicate-independent stepping pass (W1+W2) over the union of
        # all sensor keys this sheet needs — one scan + one shuffle of the
        # raw table regardless of block count (the reference instead runs
        # one pack_ranges SQL call per block, rescanning obs_main each
        # time — condition.py:329-354). Cached: every block below derives
        # its ranges from this in-memory slice.
        needed_keys = set()
        for cid in order:
            for b in self.conditions[cid].primary_blocks():
                if len(b.errors):
                    continue  # e.g. failed sensor resolution — skipped below
                seid_val = b.sensor_id if b.sensor_id is not None else b.sensor
                needed_keys.add((b.station_id, seid_val))
        stepped = None
        if needed_keys:
            conds = [
                (F.col(key_cols[0]) == F.lit(sid)) & (F.col(key_cols[1]) == F.lit(sev))
                for sid, sev in needed_keys
            ]
            combined = conds[0]
            for c in conds[1:]:
                combined = combined | c
            stepped = prepare_stepped_obs(
                windowed.where(combined),
                max_minutes,
                key_cols=key_cols,
                time_col=time_col,
            ).cache()

        for cid in order:
            spec = self.conditions[cid]
            block_dfs: dict[str, DataFrame] = {}
            failed = False
            for alias, block in spec.blocks.items():
                if len(block.errors):
                    # e.g. sensor-name resolution failed above (J5): the
                    # reference skips the whole condition at temp-table
                    # creation (condition.py:317-327); same here, at plan
                    # time, with the error already in the block's collection.
                    failed = True
                    break
                if block.secondary:
                    dep = results.get(block.source_condition_id)
                    if dep is None or dep.ranges is None:
                        spec.errors.add(
                            f'Secondary block "{alias}" references unavailable '
                            f'condition "{block.source_condition_id}"'
                        )
                        failed = True
                        break
                    # Secondary block = the referenced condition's master
                    # column over its ranges (block.py:195-207).
                    block_dfs[alias] = dep.ranges.select(
                        "vfrom", "vuntil", F.col("master").alias("istrue")
                    )
                else:
                    sid = block.station_id
                    seid_val = (
                        block.sensor_id if block.sensor_id is not None else block.sensor
                    )
                    block_dfs[alias] = pack_ranges_from_stepped(
                        stepped.where(
                            (F.col(key_cols[0]) == F.lit(sid))
                            & (F.col(key_cols[1]) == F.lit(seid_val))
                        ),
                        block.operator,
                        block.value,
                        key_cols=key_cols,
                    ).select("vfrom", "vuntil", "istrue")
            if failed or not block_dfs:
                continue
            ranges = combine_blocks(block_dfs, spec.alias_condition)
            if cache_results and any(
                other.dependencies() and cid in other.dependencies()
                for other in self.conditions.values()
            ):
                # Cache only DFs that downstream secondaries re-read —
                # replaces the reference's temp-table materialization
                # (condition.py:338) without materializing everything.
                ranges = ranges.cache()
            results[cid].ranges = ranges
            results[cid].summary = validity_summary(ranges)
        return results

    def error_tree(self) -> dict:
        """S9: nested error dict (analysis_collection.py:149-187 shape)."""
        tree = {"collection": self.name, "errors": self.errors.as_tree_value(), "conditions": {}}
        for cid, c in self.conditions.items():
            node = {"errors": c.errors.as_tree_value(), "blocks": {}}
            for alias, b in c.blocks.items():
                if len(b.errors):
                    node["blocks"][alias] = b.errors.as_tree_value()
            if node["errors"] or node["blocks"]:
                tree["conditions"][cid] = node
        return tree


@dataclass
class AnalysisCollection:
    """Workbook level: many sheets, shared sensor/station metadata
    (analysis_collection.py:55-110). Sheets are independent; on a cluster
    they can be submitted as concurrent jobs (the reference notes this
    parallelism but cannot use it — tsabatch.py:129-138)."""

    name: str
    collections: list[CondCollection] = field(default_factory=list)
    errors: ErrorCollection = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        self.errors = ErrorCollection(f"ANALYSIS <{self.name}>")

    def add_collection(self, coll: CondCollection) -> None:
        self.collections.append(coll)

    def dry_validate(
        self,
        known_station_ids: set[int] | frozenset[int],
        sensor_name_to_id: dict[str, int],
    ) -> dict:
        """Entry point 2 (tsabatch.py:89-107): validate without executing.

        Checks sensor names and station ids of every primary block against
        metadata snapshots; returns the error tree; non-empty ⇒ invalid.
        """
        for coll in self.collections:
            for c in coll.conditions.values():
                for b in c.primary_blocks():
                    b.resolve_sensor_id(sensor_name_to_id)
                    b.validate_station(known_station_ids)
        return self.error_tree()

    def run_all(
        self, spark: SparkSession, obs: DataFrame, **kwargs
    ) -> dict[str, dict[str, ConditionResult]]:
        return {coll.name: coll.run(obs, **kwargs) for coll in self.collections}

    def error_tree(self) -> dict:
        return {
            "analysis": self.name,
            "errors": self.errors.as_tree_value(),
            "collections": [c.error_tree() for c in self.collections],
        }
