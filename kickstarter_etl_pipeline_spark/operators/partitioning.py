"""Partitioning helpers for CPU-heavy per-row operators.

Small fixture tables arrive as a single parquet file → one input
partition → expression-heavy operators (shingling, hashing, vector
math) run single-threaded regardless of cluster size. These helpers
spread such inputs across the available parallelism. At real scale the
inputs already have many partitions and the helpers are no-ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def free_local_checkpoints(spark: SparkSession) -> int:
    """Unpersist locally-checkpointed RDDs — deterministic storage
    reclamation for batch drivers.

    Checkpoint blocks are normally reclaimed by the ContextCleaner once
    the owning frames are garbage-collected, but that path is
    best-effort from Python: py4j's detach of the Java-side reference
    can be silently dropped under load, leaving blocks pinned
    indefinitely. A driver that fully materializes each query before
    moving to the next (ETL schedulers, long sessions) can call this
    between queries for a hard guarantee.

    Scope: ONLY RDDs that are locally checkpointed (the kind this
    library creates via :func:`ensure_min_partitions`) are touched —
    caches the host application created with ``cache()``/``persist()``
    are left alone, so calling this cannot destroy a cache it does not
    own. Blocking (``unpersist(True)``) so reclamation is complete when
    the call returns, not racing the next query's job submission.

    SAFE ONLY between fully-materialized queries: a local checkpoint's
    blocks ARE its data (lineage is truncated), so re-executing a frame
    whose blocks were freed here will fail — don't call it while lazy
    results from earlier operators are still pending.

    Returns the number of RDDs unpersisted.
    """
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for rdd in list(jmap.values()):
        try:
            checkpointed = rdd.rdd().isLocallyCheckpointed()
        except Exception:
            checkpointed = False
        if checkpointed:
            rdd.unpersist(True)
            n += 1
    return n


def ensure_min_partitions(
    df: DataFrame, min_partitions: int | None = None, barrier: bool = True
) -> DataFrame:
    """Repartition only if the plan currently has fewer partitions.

    With ``barrier=True`` the repartition is followed by an eager
    localCheckpoint as an optimizer barrier: without it, Catalyst pushes
    downstream expression-heavy Projects/Filters below the Exchange
    (e.g. the not-empty filter InferFiltersFromGenerate derives from an
    explode, with the full shingle expression inlined), putting all the
    compute back into the single pre-shuffle partition. Measured on the
    5k-doc fixture: 27.6s single-threaded → 3.9s with the barrier on
    local[32]. The checkpoint stores only the raw repartitioned rows.

    Eager (not lazy) on purpose: a lazy localCheckpoint materializes
    mid-job inside whichever action first touches it, and its cleanup
    races DAGScheduler accumulator updates — every bench run ended with
    thousands of "attempted to access non-existent accumulator" ERROR
    lines. Checkpointing in its own tiny job up front is race-free, and
    the checkpoint blocks are released by the ContextCleaner when the
    DataFrame goes out of scope (no unpersist bookkeeping).

    Use ``barrier=False`` when the expensive downstream work is a join
    or aggregation — those can't sink below the exchange, and skipping
    the checkpoint avoids materializing the input.

    On already-parallel input — any real-scale table — this is a no-op.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        out = df.repartition(target)
        return out.localCheckpoint(eager=True) if barrier else out
    return df


def loop_frame(df: DataFrame, n: int | None, *keys: str) -> DataFrame:
    """Pin an iterative loop-carried frame to ``n`` stored partitions
    with a NARROW coalesce, then eagerly localCheckpoint it.

    This replaces the retired ``loop_shuffle_partitions`` context
    manager (round 11): that device scoped a small
    ``spark.sql.shuffle.partitions`` over a loop body by MUTATING
    session-global state — correct for a serial driver, but any query
    planned concurrently on the same SparkSession silently inherited
    the tiny partition count. Per-frame pinning has no shared state.

    r15 (guide §2.4): the pin is a ``coalesce(n)``, not a
    ``repartition(n, keys)``. The round-11 plan probe already
    established that partitioning INFO does not survive the checkpoint
    (the LogicalRDD scan reports unknown partitioning, so next-round
    joins re-exchange at session width regardless) — the hash exchange
    was paying a full shuffle per round for NOTHING but the stored
    partition COUNT, which the narrow coalesce pins for free by
    merging the preceding stage's shuffle-read partitions down to
    ``n``. Interleaved A/B at sf0.1 across the seven graph-loop bench
    queries: every one improved, 1.06×–1.83× (plans/r15/ab_graph2.py;
    results cell-identical). ``keys`` are kept as call-site
    documentation of the loop key — they no longer force an exchange.

    Scope notes: coalesce only SHRINKS — a frame already narrower than
    ``n`` keeps its width (every call site feeds a post-shuffle frame
    at session width; a narrow frame that needs SPREADING is
    ensure_min_partitions' job, not this helper's). The stage feeding
    the checkpoint now runs at ``n`` tasks; ``n`` is the data-sized
    knob the operators document (default 8 fits bench fixtures, a
    billion-vertex graph needs thousands), so that width is the
    intended per-round processing width at any scale. ``n=None``
    skips the pin and just checkpoints (the caller opted out).
    Partition count provably cannot move any result — the iterative
    operators are integer-exact or per-round grid-snapped — and
    partition-invariance is regression-tested.
    """
    if n:
        df = df.coalesce(int(n))
    return df.localCheckpoint(eager=True)


def isolated_session(spark: SparkSession, confs: dict[str, str]) -> SparkSession:
    """Return a child ``SparkSession`` with an ISOLATED SQLConf carrying
    ``confs``, sharing the parent's SparkContext and cached data.

    This is the sanctioned way to run a query under a different
    ``spark.sql.shuffle.partitions`` (or any session conf): Structured
    Streaming pins its state-store partition count from that conf at
    query start and exposes no per-query API, so a right-sized stateful
    query NEEDS a different value than the session default. The retired
    pattern — set/restore on the shared session around a synchronous
    run — was a concurrency trap in miniature: any batch query planned
    on the shared session inside the bracket silently inherited the
    override. ``newSession()`` removes the shared state entirely: the
    child has its own SQLConf and temp-view namespace but shares the
    SparkContext, external catalog, and cached RDDs, so there is no
    second JVM, no second UI, and nothing to restore.

    The conf mutation below targets the FRESH child session only —
    never a session the caller shares — which is why the structural
    tripwire (tests/test_graph_scale.py) whitelists exactly this
    function and nothing else.

    Callers must read any memory-sink table through the RETURNED
    session (temp views are per-session).
    """
    child = spark.newSession()
    for key, value in confs.items():
        child.conf.set(key, value)
    return child
