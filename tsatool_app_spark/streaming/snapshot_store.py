"""Crash-safe versioned snapshot store shared by the streaming folds.

The naive two-rename directory swap (write tmp → rename current away →
rename tmp in) has a crash window between the renames where the snapshot
does not exist: a restart then treats the store as empty and silently
discards all accumulated state, and a leftover ``._old`` directory wedges
every later swap.  This store uses the pointer-file protocol instead
(the shape of Delta's ``_last_checkpoint`` / HDFS checkpointing):

- each fold writes a NEW versioned directory ``v<ts>-<n>/`` (never
  touching the previous one), then atomically publishes it by writing a
  temp pointer file and ``os.rename``-ing it over ``CURRENT`` — a
  single-file rename, atomic on POSIX;
- readers resolve ``CURRENT`` and read that version: at every instant
  the pointer names a fully-written directory, so a crash at ANY point
  leaves the previous state intact and readable;
- superseded versions are pruned best-effort AFTER the publish; a crash
  mid-prune leaves garbage directories, never a broken snapshot.

Keeping one committed version durable at all times costs one extra
version's worth of storage transiently — the standard price of
copy-on-write publication.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_POINTER = "CURRENT"


def _pointer_path(root: str) -> str:
    return os.path.join(root, _POINTER)


def current_version(root: str) -> str | None:
    """Name of the committed version directory, or None if never written."""
    try:
        with open(_pointer_path(root)) as f:
            name = f.read().strip()
    except FileNotFoundError:
        return None
    return name or None


def read_snapshot(spark: SparkSession, root: str) -> DataFrame | None:
    """The committed snapshot as a DataFrame, or None before first publish."""
    name = current_version(root)
    if name is None:
        return None
    return spark.read.parquet(os.path.join(root, name))


def publish_snapshot(df: DataFrame, root: str) -> str:
    """Write ``df`` as a new version and atomically re-point CURRENT at it.
    Returns the published version name."""
    os.makedirs(root, exist_ok=True)
    prev = current_version(root)
    seq = 0 if prev is None else int(prev.rsplit("-", 1)[1]) + 1
    name = f"v-{seq}"
    df.write.mode("overwrite").parquet(os.path.join(root, name))
    tmp = _pointer_path(root) + ".tmp"
    with open(tmp, "w") as f:
        f.write(name)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, _pointer_path(root))  # atomic single-file publish
    # best-effort prune of superseded versions (and crashed partials)
    for entry in os.listdir(root):
        if entry.startswith("v-") and entry != name:
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
    return name
