"""Feature-group writer: append / overwrite / upsert.

(reference: Target.write_mode in raise_/transforms/job.py:41-71,
upsert semantics raise_/PRD.md:1523-1540)

With Delta/Iceberg available, upsert is ``MERGE INTO ... WHEN MATCHED
UPDATE WHEN NOT MATCHED INSERT`` on the key columns — transactional and
able to prune untouched files. This environment has plain parquet only, so
upsert is implemented as the equivalent relational rewrite:

    new_table = old ANTI JOIN updates ON keys  UNION ALL  updates

written into a fresh GENERATION directory (``path__gen_<id>``) and
committed by atomically re-pointing a symlink at ``path``. Generations are
immutable once committed and the previous one is retained until the next
rewrite, which buys SNAPSHOT ISOLATION for readers that pin a generation:
:func:`read_feature_group` resolves the symlink at plan time, so its scan
keeps reading the (unmoved) generation it planned against even if an
upsert commits mid-query — the rename-the-live-directory design this
replaced physically moved the files out from under every in-flight reader
(r6 finding; pinned by test_upsert_concurrent_reader_survives_swap).
A reader that goes through the symlink itself (plain
``spark.read.parquet(path)``) still sees read-committed-latest and can
fail if a swap lands mid-query — that race is only fully closable with a
transaction log (the Delta branch).
The anti-join is a broadcast when the update batch is small (the common
incremental case), so the rewrite cost is one scan of the old table. At
100 TB you would (a) use Delta MERGE, and (b) partition/cluster by the key
so the join prunes files; the helper keeps that contract by requiring
explicit key_columns.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _latest_per_key(updates: DataFrame, key_columns: list[str],
                    sequence_column: str | None) -> DataFrame:
    """One row per key from the update batch.

    With ``sequence_column`` the winner is the row with the greatest
    sequence value (deterministic — the semantics of a sequenced MERGE,
    ties broken arbitrarily). Without it, ``dropDuplicates`` picks an
    ARBITRARY row per key: fine when a batch can't contain two versions of
    one key (e.g. keyed CDC compaction upstream), nondeterministic
    otherwise — an incremental batch whose lookback window re-reads an old
    row alongside its correction MUST pass a sequence column.
    """
    if sequence_column is None:
        return updates.dropDuplicates(key_columns)
    w = Window.partitionBy(*key_columns).orderBy(F.col(sequence_column).desc())
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _current_gen(path: str) -> str:
    """The directory actually holding the data: the symlink target for a
    generation-managed table, the path itself for a legacy plain dir."""
    return os.path.realpath(path) if os.path.islink(path) else path


def read_feature_group(spark, path: str) -> DataFrame:
    """Snapshot-isolated read of a feature-group target: resolves the
    current generation at PLAN time, so a concurrent upsert/overwrite
    commit cannot yank this query's files (the previous generation is
    retained until the commit after next). Use this instead of
    ``spark.read.parquet(path)`` whenever a writer may run concurrently."""
    return spark.read.parquet(_current_gen(path))


def _commit_swap(path: str, gen: str) -> None:
    """Commit a freshly-written generation: atomically re-point the
    ``path`` symlink at it, then prune superseded generations — keeping
    the immediately-previous one so in-flight readers that resolved file
    paths before this commit finish their scans. A legacy real-directory
    target is displaced into a generation dir first (one-time migration;
    the only swap whose pre-existing readers see moved paths)."""
    gen = os.path.abspath(gen)
    # refuse to commit a missing or torn generation: re-pointing the live
    # symlink at one would atomically BREAK the table (r11 finding — a
    # concurrent writer's prune may have removed a staged gen between its
    # write and this commit; failing loudly beats a dangling live link)
    if not os.path.exists(os.path.join(gen, "_SUCCESS")):
        raise FileNotFoundError(
            f"refusing to commit incomplete/missing generation {gen!r} "
            "(no _SUCCESS marker — torn write, or pruned by a concurrent "
            "writer's commit)"
        )
    prev = os.path.realpath(path) if os.path.islink(path) else None
    if os.path.lexists(path) and not os.path.islink(path):
        legacy = os.path.abspath(f"{path}__gen_{uuid.uuid4().hex[:8]}")
        os.rename(path, legacy)
        prev = legacy
    tmp = f"{path}__ln_{uuid.uuid4().hex[:8]}"
    os.symlink(gen, tmp)
    os.replace(tmp, path)  # atomic on POSIX: commit point
    # mark the generation as having been LIVE: only committed-superseded
    # generations may be pruned eagerly. A `__gen_*` dir without this
    # marker is either a concurrent writer's staging mid-upsert (must
    # survive — r11: the prune used to delete it, so that writer's commit
    # dangled the table) or crash debris from a dead writer (swept once
    # older than the grace period, like the `__ln_*` sweep below).
    # Leading-underscore files are invisible to Spark's parquet reader.
    try:
        with open(os.path.join(gen, "_COMMITTED"), "w"):
            pass
    except OSError:
        pass
    # realpath BOTH sides of the keep comparison: prev is already
    # realpath'd, and a symlinked parent of path (symlinked data roots,
    # macOS /tmp) would make abspath(glob entry) never equal it — the
    # prune would delete the generation we just promised to retain
    keep = {os.path.realpath(p) for p in (gen, prev) if p is not None}
    for g in glob.glob(f"{path}__gen_*"):
        if os.path.realpath(g) in keep:
            continue
        committed = os.path.exists(os.path.join(g, "_COMMITTED"))
        try:
            fresh = time.time() - os.lstat(g).st_mtime <= _LN_SWEEP_GRACE_S
        except OSError:
            fresh = False
        if committed or not fresh:
            shutil.rmtree(g, ignore_errors=True)
    for ln in glob.glob(f"{path}__ln_*"):
        # orphan temp links from a crash between symlink() and replace().
        # Grace-period guard (ADVICE r7): a CONCURRENT writer's link is
        # microseconds old between its symlink() and os.replace(); only
        # links plausibly left by a dead process (minutes old) are debris
        # here. Fresh debris is still cleared by the next
        # _recover_interrupted_swap, whose contract is single-writer.
        try:
            if time.time() - os.lstat(ln).st_mtime > _LN_SWEEP_GRACE_S:
                os.unlink(ln)
        except OSError:
            pass


# A temp link older than this inside _commit_swap is crash debris, not a
# concurrent writer mid-commit (symlink->replace is two syscalls apart).
_LN_SWEEP_GRACE_S = 300.0


def write_feature_group(
    df: DataFrame,
    path: str,
    mode: str = "append",
    key_columns: list[str] | None = None,
    partition_by: list[str] | None = None,
    sequence_column: str | None = None,
) -> None:
    writer = df.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if mode == "append":
        # append mutates the CURRENT generation in place (no rewrite, no
        # swap): appended files are new names, so concurrent readers of
        # the same generation are unaffected
        writer.mode("append").parquet(_current_gen(path))
        return
    if mode == "overwrite":
        gen = f"{path}__gen_{uuid.uuid4().hex[:8]}"
        writer.mode("overwrite").parquet(gen)
        _commit_swap(path, gen)
        return
    if mode == "upsert":
        if not key_columns:
            raise ValueError("upsert requires key_columns")
        _upsert(df, path, key_columns, partition_by, sequence_column)
        return
    raise ValueError(f"unknown write mode {mode!r}")


def _try_delta_merge(updates: DataFrame, path: str, key_columns: list[str],
                     sequence_column: str | None) -> bool:
    """Transactional ``MERGE INTO`` when delta-spark is on the classpath AND
    the target is a Delta table (capability-gated — this sandbox has plain
    parquet, so the rewrite below is the tested path). Returns False to fall
    back. At 100 TB this is the right branch: MERGE prunes untouched files
    via the Delta log instead of rewriting the table."""
    try:
        from delta.tables import DeltaTable
    except ImportError:
        return False
    spark = updates.sparkSession
    try:
        if not DeltaTable.isDeltaTable(spark, path):
            return False
        target = DeltaTable.forPath(spark, path)
    except Exception:
        return False
    deduped = _latest_per_key(updates, key_columns, sequence_column)
    cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in key_columns)
    m = target.alias("t").merge(deduped.alias("s"), cond)
    if sequence_column is None:
        m = m.whenMatchedUpdateAll()
    else:
        # sequenced MERGE: a late/replayed batch carrying an OLDER sequence
        # must not regress the stored row; updates win sequence ties
        m = m.whenMatchedUpdateAll(
            condition=f"s.`{sequence_column}` >= t.`{sequence_column}`"
        )
    m.whenNotMatchedInsertAll().execute()
    return True


def _recover_interrupted_swap(path: str) -> None:
    """Self-heal crash debris (the rollup.py pattern, r5 VERDICT item 6).

    Generation layout: the symlink replace IS the commit, so the only
    crash states are (a) a dangling symlink (current generation lost to an
    interrupted prune — repoint at the newest COMPLETE generation) and
    (b) orphan generation dirs never committed (harmless; pruned by the
    next _commit_swap). Legacy rename-swap layouts left by older builds
    are also healed: a missing target with a complete ``__staging_*``
    promotes it (the crash was between the two renames and staging holds
    the full merged result); else the newest ``__old_*`` backup is
    restored (pre-batch state — the caller's retry re-applies the batch,
    idempotent under a sequence column). Without this, the next upsert's
    not-exists branch would re-seed the table from its own batch and
    silently LOSE all prior history."""
    if os.path.islink(path) and not os.path.exists(path):
        gens = [
            g
            for g in glob.glob(f"{path}__gen_*")
            if os.path.exists(os.path.join(g, "_SUCCESS"))
        ]
        if gens:
            gens.sort(key=os.path.getmtime)
            tmp = f"{path}__ln_{uuid.uuid4().hex[:8]}"
            os.symlink(os.path.abspath(gens[-1]), tmp)
            os.replace(tmp, path)
        else:
            os.unlink(path)
        return
    for ln in glob.glob(f"{path}__ln_*"):
        # stale temp links from a crash between symlink() and replace()
        try:
            os.unlink(ln)
        except OSError:
            pass
    if os.path.exists(path):
        # normal state: clear legacy stagings abandoned before their swap
        for leftover in glob.glob(f"{path}__staging_*"):
            shutil.rmtree(leftover, ignore_errors=True)
        return
    complete = [
        s
        for s in glob.glob(f"{path}__staging_*")
        if os.path.exists(os.path.join(s, "_SUCCESS"))
    ]
    if complete:
        complete.sort(key=os.path.getmtime)
        os.rename(complete[-1], path)
        for leftover in complete[:-1]:
            shutil.rmtree(leftover, ignore_errors=True)
        return
    backups = sorted(glob.glob(f"{path}__old_*"), key=os.path.getmtime)
    if backups:
        os.rename(backups[-1], path)


def _upsert(updates: DataFrame, path: str, key_columns: list[str],
            partition_by: list[str] | None, sequence_column: str | None = None) -> None:
    spark = updates.sparkSession
    if _try_delta_merge(updates, path, key_columns, sequence_column):
        return
    _recover_interrupted_swap(path)
    if not os.path.exists(path):
        w = _latest_per_key(updates, key_columns, sequence_column).write
        if partition_by:
            w = w.partitionBy(*partition_by)
        gen = f"{path}__gen_{uuid.uuid4().hex[:8]}"
        w.mode("overwrite").parquet(gen)
        _commit_swap(path, gen)
        return
    # dedupe the batch itself first so the merge is deterministic; no
    # broadcast hint on the key frame — a backfill-sized update batch
    # would blow the broadcast limit, and Catalyst/AQE already broadcasts
    # small sides on its own
    deduped = _latest_per_key(updates, key_columns, sequence_column)
    # read the resolved generation dir, not the symlink: the merge plan's
    # file index must stay pinned to THIS generation while the swap below
    # re-points the link
    old = spark.read.parquet(_current_gen(path))
    if sequence_column is None:
        # updates win on key collision
        kept = old.join(deduped.select(*key_columns), on=key_columns, how="left_anti")
        merged = kept.unionByName(deduped, allowMissingColumns=True)
    else:
        # sequenced upsert across batches: the STORED row wins when its
        # sequence is newer (late/replayed batches must not regress a
        # key); updates win ties. Mirrors the Delta MERGE condition above.
        tagged = old.withColumn("__src", F.lit(0)).unionByName(
            deduped.withColumn("__src", F.lit(1)), allowMissingColumns=True
        )
        w_seq = Window.partitionBy(*key_columns).orderBy(
            F.col(sequence_column).desc(), F.col("__src").desc()
        )
        merged = (
            tagged.withColumn("__rn", F.row_number().over(w_seq))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__src")
        )

    gen = f"{path}__gen_{uuid.uuid4().hex[:8]}"
    w = merged.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").parquet(gen)
    # symlink re-point = the atomic commit; the previous generation's
    # files never move, so in-flight readers finish cleanly (the
    # transactional multi-writer answer remains the Delta MERGE above)
    _commit_swap(path, gen)
