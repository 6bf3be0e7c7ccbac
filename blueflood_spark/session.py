"""SparkSession factory tuned for this engine.

Local test profile runs on local[N]; the same settings (AQE, shuffle
partitions sized to cores, Arrow for the few pandas exchanges) are the
ones we'd set cluster-side at 100 TB — shuffle partition count and
maxPartitionBytes would scale with executor count, not be hardcoded.
"""

from __future__ import annotations

import os
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession


def get_spark(
    app_name: str = "blueflood_spark",
    shuffle_partitions: int | None = None,
    **extra_confs: str,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        env_shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", "")
        if env_shuffle.isdigit():
            shuffle_partitions = int(env_shuffle)
        else:
            shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", os.environ.get("SPARK_GRAFT_AQE", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark 4's per-op origin capture (error call-site tracking)
        # costs ~3 extra py4j round trips on EVERY DataFrame/Column op:
        # PySparkCurrentOrigin.set, a conf.get, and .clear per call
        # (pyspark/errors/utils.py _with_origin). Profiled on the timer
        # ladder: 2850 py4j round trips ≈ 0.5 s of a 1.37 s warm query
        # was plan CONSTRUCTION, most of it this bookkeeping. A query
        # service builds thousands of plans per second — debug origin
        # tracking belongs in dev sessions, not the serving path.
        # Changes no plans; error messages just lose the Python-side
        # call-site annotation. (The process-global cache in
        # is_debugging_enabled() reads this at the FIRST DataFrame op,
        # so it must be set at session build, as here.)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # 16g, measured: 32g was tried to damp the ±15% run-to-run
        # serial drift and made things WORSE — bench calls System.gc()
        # after heavy queries, and an explicit full GC on a 32g heap is
        # a multi-second stop-the-world (the 120 calls blew the bench
        # past its 10-min budget). The drift is ambient, not heap.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # managed tables (bucketed rollup storage) land outside the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/blueflood_spark_warehouse"),
        )
    )
    for k, v in extra_confs.items():
        builder = builder.config(k.replace("__", "."), v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# ---------------------------------------------------------------------------
# loop session: AQE-off clone for iterative fixed-point loops
# ---------------------------------------------------------------------------
#
# Under AQE, `localCheckpoint(eager=False)` is NOT lazy: marking calls
# queryExecution.toRdd, and AQE's toRdd EXECUTES every shuffle stage of
# the subtree right then, one driver-scheduled job each (the r7 finding
# — 85 jobs per connected-components query). Iterative loops therefore
# need AQE off while they mark. r7 toggled spark.sql.adaptive.enabled on
# the CALLER's session (restore in finally) — a session-global mutation
# with two documented costs: a query planned CONCURRENTLY in the same
# session during the loop planned without AQE, and two overlapping
# toggles could each capture the other's "false" and leave AQE off for
# the rest of the session (the r7 ADVICE restore-race). Instead, loops
# now run in a dedicated CLONE of the caller's session whose AQE is
# permanently off: no toggle, no restore, no race — concurrent loops
# simply share the clone, and the caller's session is never mutated.

_LOOP_SESSIONS: dict = {}
_LOOP_LOCK = threading.Lock()

# runtime (conf.set) settings that shape loop plans or row values; the
# clone re-merges builder-level spark.sql.* from the shared SparkConf by
# itself, but RUNTIME overrides are session-scoped and must be copied
# (the driver's vanilla sessions set the timezone at runtime; the
# SPARK_GRAFT_SHUFFLE arm proves plan-shape independence of the width).
_LOOP_CONF_COPY = (
    "spark.sql.shuffle.partitions",
    "spark.sql.session.timeZone",
)


def loop_session(spark: SparkSession) -> SparkSession:
    """AQE-off clone of `spark` for iterative fixed-point loops
    (connected components, PageRank, self-join-subtree checkpoint
    marks). `newSession()` shares the SparkContext, persistent catalog
    and cached RDDs; only SQL conf and temp views are fresh. One clone
    per (application, parent-session) pair, memoized; entries from dead
    applications are evicted on access (same discipline as the
    trained-artifact caches in operators/similarity.py)."""
    app = spark.sparkContext.applicationId
    key = (app, spark._jsparkSession.hashCode())
    with _LOOP_LOCK:
        for stale in [k for k in _LOOP_SESSIONS if k[0] != app]:
            del _LOOP_SESSIONS[stale]
        child = _LOOP_SESSIONS.get(key)
        if child is None:
            child = spark.newSession()
            child.conf.set("spark.sql.adaptive.enabled", "false")
            for conf_key in _LOOP_CONF_COPY:
                try:
                    child.conf.set(conf_key, spark.conf.get(conf_key))
                except Exception:
                    pass
            _LOOP_SESSIONS[key] = child
        return child


def rebind(df: DataFrame, session: SparkSession) -> DataFrame:
    """Re-home a DataFrame's ANALYZED logical plan onto another session
    of the same SparkContext, via public API only: a uniquely-named
    global temp view (global temp views store the analyzed plan and are
    application-scoped, so they resolve from any session), dropped
    before returning — classic Spark analyzes eagerly at Dataset
    construction, so the returned frame and everything derived from it
    never consult the catalog again. The plan is unchanged; only the
    session whose SQL conf governs physical planning switches, which is
    what lets a loop mark lazy checkpoints statically (AQE off) in
    `loop_session()` while the caller keeps AQE for everything else.
    uuid view names make concurrent rebinds collision-free."""
    src = df.sparkSession
    try:
        if src._jsparkSession.equals(session._jsparkSession):
            return df
    except Exception:  # pragma: no cover - connect-mode / mock sessions
        if src is session:
            return df
    name = "bf_rebind_" + uuid.uuid4().hex
    df.createOrReplaceGlobalTempView(name)
    try:
        gdb = session.conf.get("spark.sql.globalTempDatabase", "global_temp")
        return session.table(f"`{gdb}`.`{name}`")
    finally:
        src.catalog.dropGlobalTempView(name)


def lazy_mark(df: DataFrame) -> DataFrame:
    """`localCheckpoint(eager=False)` that actually STAYS lazy under
    AQE: the mark happens in the AQE-off loop-session clone (where
    toRdd compiles the plan without executing its query stages), and
    the RDD-backed frame is handed straight back to the caller's
    session, so every join/aggregate built on top plans under the
    caller's own conf. Use for shared-subtree marks on hot query paths;
    a plain mark on an AQE session executes the whole subtree eagerly
    as separate driver-scheduled jobs at plan-build time (NOTES.md r7).
    Broadcast-exchange prepare futures may still kick 1-2 small async
    jobs — those are collect-to-driver broadcasts, not subtree runs.

    HAZARD (measured r8): do NOT lazy_mark a MID-TREE frame that will
    later be joined against siblings sharing its base relation (e.g.
    marking the probe side of incremental_dedup, whose exact/near
    branches also scan the same docs table). The view round trip remaps
    the marked subtree's exprIds while the siblings keep the originals,
    and Spark's self-join dedup then fails with INTERNAL_ERROR
    "conflicting references in Join". Safe uses: loop-internal frames
    where EVERY participating input was rebound into the clone together
    (connected components, PageRank), and single-lineage subtrees whose
    consumers never re-touch the same base relation (KMV sketch)."""
    caller = df.sparkSession
    return rebind(
        rebind(df, loop_session(caller)).localCheckpoint(eager=False), caller
    )
