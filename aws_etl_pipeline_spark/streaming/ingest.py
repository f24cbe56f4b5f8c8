"""Structured Streaming file-source ingest — the Spark-native analog of
the reference's S3-event trigger (R19, `lambda_function.py:14-71`,
trigger config `README.md:155-187`).

Where the reference gets one Lambda invocation per S3 object, the
engine gets one micro-batch per discovered file from a streaming file
source; ``trigger(availableNow=True)`` drains the backlog and stops
(the catch-up/batch mode), a processing-time trigger tails the
directory forever (the cron analog, R26). ``foreachBatch`` carries the
dual-sink dispatch (JSON + upsert, R16+R17) exactly like the handler
body.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.etl import transform_transactions
from ..schemas import TRANSACTIONS_RAW


def read_transaction_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan of a watched directory of transaction CSVs
    (R1+R19). Explicit schema — a streaming source cannot infer."""
    return (
        spark.readStream.format("csv")
        .option("header", True)
        .schema(TRANSACTIONS_RAW)
        .option("maxFilesPerTrigger", 1)  # one file ≈ one Lambda invocation
        .load(path)
    )


def run_pipeline_available_now(
    spark: SparkSession,
    in_path: str,
    json_out: str | None = None,
    upsert_path: str | None = None,
    query_name: str = "etl_ingest",
) -> StreamingQuery:
    """Drain all pending files through the flagship transform (R3-R14),
    dispatching sinks per batch (R16-R18). Returns the started query;
    callers awaitTermination() or processAllAvailable()."""
    stream = read_transaction_stream(spark, in_path)
    transformed = transform_transactions(stream)

    def sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if upsert_path is not None:
            from ..operators.upsert import merge_into_parquet

            merge_into_parquet(batch_df, upsert_path, key="transaction_id")
        if json_out is not None:
            batch_df.write.mode("append").json(f"{json_out}/epoch={epoch_id}")

    writer = transformed.writeStream.trigger(availableNow=True)
    if json_out is None and upsert_path is None:
        # test/smoke mode: land micro-batches in an in-memory table
        return (
            writer.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .start()
        )
    return writer.foreachBatch(sink_batch).outputMode("update").start()


from ..registry import query


def _stage_events(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage the events table as four parquet files for one-file-per-
    micro-batch replay. Keyed on the testdata CONTENT fingerprint
    (``_sf_fingerprint``: path + per-file size/mtime), not just the
    path, so regenerated testdata at the same path gets a fresh stage
    instead of silently replaying stale files against a fresh oracle —
    same staleness guard the batch scan fixtures use."""
    import os
    import shutil
    import tempfile

    from ..catalog import load_table
    from ..sources.scans import _sf_fingerprint

    key = _sf_fingerprint(sf_dir)
    stage_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_streamexec_{key}")
    if not os.path.exists(os.path.join(stage_dir, "_SUCCESS")):
        shutil.rmtree(stage_dir, ignore_errors=True)
        load_table(spark, sf_dir, "events").repartition(4).write.mode(
            "overwrite"
        ).parquet(stage_dir)
    return stage_dir, key


def _stage_events_timesliced(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage the events table as four single-file TIME SLICES for
    watermark-deterministic replay: ``ntile(4)`` over ``(ts,
    event_id)`` splits the table into contiguous time quarters; slices
    2, 3, 4 are written first (in time order) and slice 1 — the
    EARLIEST quarter — last, each file with a strictly increasing
    mtime so the file stream source (which orders by modification
    time) replays them as four micro-batches in exactly that order.
    Result: batches 1–3 are time-monotone (no on-time row ever falls
    behind the advancing watermark), and batch 4 is a deliberately
    LATE delivery whose rows sit far below the watermark — the
    deterministic late-drop fixture ``stream_exec_stream_join_
    watermarked`` needs.  Same content-fingerprint staleness guard as
    ``_stage_events``.  (The global ntile sort is fine for a staging
    fixture; a 100 TB pipeline would time-slice with
    ``repartitionByRange(ts)`` instead — no total order needed.)"""
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ..catalog import load_table
    from ..sources.scans import _sf_fingerprint

    key = _sf_fingerprint(sf_dir)
    stage_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_streamexec_ts_{key}"
    )
    if os.path.exists(os.path.join(stage_dir, "_STAGED")):
        return stage_dir, key
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(stage_dir)
    ev = load_table(spark, sf_dir, "events").withColumn(
        # global-ok: one-time sf-sized test-fixture staging (slices the
        # events table into 4 micro-batch files), not a query path
        "slice", F.ntile(4).over(W.orderBy("ts", "event_id"))
    )
    mtime = 1_000_000_000  # fixed base: only the ORDER matters
    for i, s in enumerate([2, 3, 4, 1]):
        tmp = os.path.join(stage_dir, f"_tmp_{s}")
        ev.filter(F.col("slice") == s).drop("slice").coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dest = os.path.join(stage_dir, f"slice_{i}_{s}.parquet")
        os.rename(part, dest)
        os.utime(dest, (mtime + 10 * i, mtime + 10 * i))
        shutil.rmtree(tmp)
    with open(os.path.join(stage_dir, "_STAGED"), "w") as fh:
        fh.write(key)
    return stage_dir, key


#: State-store partition count for the availableNow drain fixtures.
#: ``spark.sql.shuffle.partitions`` at STREAM START pins the number of
#: state-store instances for the query's lifetime; every micro-batch
#: then pays per-instance task launch + checkpoint commit. The right
#: sizing tracks STATE VOLUME / throughput, not the session core count:
#: these fixtures hold interval-bounded state (thousands of rows), and
#: 32 near-empty state stores per operator per micro-batch measured as
#: 2.5-3x pure overhead at sf0.1 (stream-stream join 11.0 s -> 4.0 s at
#: 8 partitions, identical output). Production deployments size it to
#: their state volume via this knob; results are partition-count
#: independent (exact aggregates/joins, global watermarks).
STREAM_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
)


def _start_state_sized(writer) -> StreamingQuery:
    """``writer.start()`` with ``spark.sql.shuffle.partitions`` set to
    STREAM_STATE_PARTITIONS for the start call (the streaming query
    snapshots the conf at start; the session value is restored
    immediately, so concurrent batch plans never see it)."""
    spark = SparkSession.getActiveSession()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS)
    )
    try:
        return writer.start()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _drain(q: StreamingQuery, timeout_s: int | None = None) -> None:
    """Block until the availableNow drain finishes; a hung stream must
    FAIL loudly, not fall through to reading a partial sink. The 300 s
    default guards the sf0.001-0.01 fixtures; scale-replica
    measurement runs override via $SPARK_GRAFT_STREAM_DRAIN_S (a
    1000x replica legitimately drains for tens of minutes)."""
    import os

    if timeout_s is None:
        timeout_s = int(os.environ.get("SPARK_GRAFT_STREAM_DRAIN_S", "300"))
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not finish within {timeout_s}s"
        )


@query("stream_file_ingest")
def stream_file_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R19 end-to-end as a named query (rows-only: Structured Streaming
    has no SQL oracle): generate two 'uploads', drain them through the
    streaming flagship pipeline with availableNow, return the processed
    rows. Row count is deterministic (seeded generator)."""
    import datetime as dt
    import hashlib
    import os
    import shutil
    import tempfile

    from ..generator import generate_transactions

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_ingest_{key}")
    in_dir = os.path.join(base, "raw-data")
    shutil.rmtree(base, ignore_errors=True)
    for i, (day, n) in enumerate([(dt.date(2024, 3, 14), 60), (dt.date(2024, 3, 15), 40)]):
        generate_transactions(spark, n, day, seed=100 + i).coalesce(1).write.mode(
            "append"
        ).option("header", True).csv(in_dir)
    qname = f"ingest_{key}"
    q = run_pipeline_available_now(spark, in_dir, query_name=qname)
    _drain(q)
    return spark.table(qname)


def windowed_event_counts(events_stream: DataFrame) -> DataFrame:
    """Watermarked tumbling-window counts — the streaming twin of
    batch_windows.stream_tumbling_window; late rows beyond 1 hour are
    dropped (verified with crafted late data in tests)."""
    from pyspark.sql import functions as F

    return (
        events_stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


@query(
    "stream_exec_tumbling",
    oracle="""
SELECT time_bucket(INTERVAL '10 minutes', ts)                    AS window_start,
       time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS window_end,
       event_type,
       count(*)::BIGINT                                          AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)         AS total
FROM events
GROUP BY 1, 2, 3
""",
)
def stream_exec_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming execution, oracle-verified (upgrade
    over the batch twins, whose streaming paths are pytest-driven):
    the events table is staged as four parquet files, consumed by a
    streaming file source one file per micro-batch (four genuine
    micro-batches accumulating window state), aggregated with the same
    tumbling 10-minute window as stream_tumbling_window, and drained
    with availableNow into a complete-mode memory sink. Complete mode
    makes the final state independent of the micro-batch split, so the
    streaming result must hash-equal the batch oracle — verifying the
    incremental-state path itself, not just the plan's batch twin."""
    from pyspark.sql import functions as F

    from ..operators.relational import dsum

    stage_dir, key = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    agg = (
        stream.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )
    qname = f"streamexec_{key}"
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.table(qname)


@query(
    "stream_exec_session",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts)                           AS session_start,
       max(ts) + INTERVAL '30 minutes'   AS session_end,
       count(*)::BIGINT                  AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM sessions
GROUP BY user_id, session_id
""",
)
def stream_exec_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming SESSION-window execution: the staged
    event files replay one per micro-batch, and `session_window` state
    must MERGE sessions across micro-batches (an open session extends
    whenever a later batch delivers an event within the 30-minute
    gap) — the hardest stateful path the engine claims, verified
    against the batch islands oracle. Complete-mode memory sink makes
    the final state split-independent, exactly like
    `stream_exec_tumbling`."""
    from pyspark.sql import functions as F

    from ..operators.relational import dsum

    stage_dir, key = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total",
        )
    )
    qname = f"streamexec_sess_{key}"
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.table(qname)


@query(
    "stream_exec_sliding",
    oracle="""
WITH slid AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts) - (k.k * INTERVAL '5 minutes')
           AS window_start,
         value
  FROM events CROSS JOIN (VALUES (0), (1)) k(k)
)
SELECT window_start,
       window_start + INTERVAL '10 minutes'               AS window_end,
       count(*)::BIGINT                                   AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)  AS total
FROM slid
GROUP BY 1, 2
""",
)
def stream_exec_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming SLIDING-window execution (10-minute
    windows every 5 minutes): each event lands in two overlapping
    window states that accumulate across the four replayed
    micro-batches. Completes the real-execution trio with
    `stream_exec_tumbling` and `stream_exec_session`; complete-mode
    drain must hash-equal the batch self-join oracle."""
    from pyspark.sql import functions as F

    from ..operators.relational import dsum

    stage_dir, key = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    agg = (
        stream.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            "total",
        )
    )
    qname = f"streamexec_slide_{key}"
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.table(qname)


def _latest_per_user(df):
    """Per-user latest event (ties by event_id) — the batch reduce
    under the streaming upsert sinks."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            "event_id",
        )
    )


def _latest_merge_batch_fn(target_dir: str):
    """foreachBatch body for the per-user-LATEST sinks: see
    :func:`_keyed_merge_batch_fn`. Shared by stream_exec_upsert and
    stream_exec_upsert_json."""
    return _keyed_merge_batch_fn(target_dir, _latest_per_user)


def _keyed_merge_batch_fn(target_dir: str, normalize_fn):
    """foreachBatch body: MERGE a micro-batch's per-key winner rows
    into the parquet target (``normalize_fn`` reduces the raw batch to
    normalized per-key winners carrying ``user_id``/``last_ts``/
    ``event_id`` -> full-outer merge with the running target -> atomic
    swap). Keeping the later of (existing, incoming) per key is
    associative AND idempotent: the final state is independent of the
    batch split, and re-delivering the same batch (Structured
    Streaming's at-least-once foreachBatch contract) merges identical
    winners to an identical target. The winner row may carry extra
    payload columns (e.g. a CDC ``op`` tombstone marker) — they ride
    along untouched."""
    import os
    import shutil

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    def merge_batch(batch_df, batch_id: int) -> None:
        import glob

        s = batch_df.sparkSession
        incoming = normalize_fn(batch_df)
        # Crash recovery for the two-step swap below (round-6 advice):
        # rename(target, old) -> rename(tmp, target) is NOT atomic — a
        # crash between the renames leaves the accumulated state only
        # in .old{id}, and the _SUCCESS probe would then silently
        # restart the upsert target from the incoming batch alone.
        # If the target is missing but an .old generation exists,
        # adopt the newest one before probing.
        if not os.path.exists(target_dir):
            olds = sorted(glob.glob(target_dir + ".old*"), key=os.path.getmtime)
            if olds:
                os.rename(olds[-1], target_dir)
        if os.path.exists(os.path.join(target_dir, "_SUCCESS")):
            tgt = s.read.parquet(target_dir)
            # union the two winner sets and re-reduce — associative, so
            # the final state is independent of the batch split.
            merged = (
                tgt.unionByName(incoming)
                .withColumn(
                    "_rn",
                    F.row_number().over(
                        W.partitionBy("user_id").orderBy(
                            F.col("last_ts").desc(), F.col("event_id").desc()
                        )
                    ),
                )
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            merged = incoming
        tmp = target_dir + f".next{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = target_dir + f".old{batch_id}"
        if os.path.exists(target_dir):
            os.rename(target_dir, old)
        os.rename(tmp, target_dir)
        shutil.rmtree(old, ignore_errors=True)

    return merge_batch


@query(
    "stream_exec_upsert",
    oracle="""
SELECT user_id, ts AS last_ts, event_type AS last_type, value AS last_value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
""",
)
def stream_exec_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming-CDC materialization: the replayed event stream
    drives ``foreachBatch``, and every micro-batch MERGEs its per-key
    latest rows into a parquet target table (reduce batch -> full-outer
    merge with the running target -> atomic swap) — the
    readStream → foreachBatch → upsert-sink pipeline the reference's
    Redshift loader approximates (`lambda_function.py:176-271`),
    executed incrementally.

    The final target is the per-user LATEST event (ties by event_id),
    which is batching-invariant — merging per-batch winners is
    associative — so the materialized table must hash-equal the batch
    QUALIFY oracle no matter how the four micro-batches split the log.
    """
    import os
    import shutil
    import tempfile

    stage_dir, key = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema

    target_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_streamupsert_{key}"
    )
    shutil.rmtree(target_dir, ignore_errors=True)
    merge_batch = _latest_merge_batch_fn(target_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = _start_state_sized(
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
    )
    _drain(q)
    return spark.read.parquet(target_dir).select(
        "user_id", "last_ts", "last_type", "last_value"
    )


@query(
    "stream_exec_dedup",
    oracle="""
SELECT event_id, user_id, event_type, value FROM events
""",
)
def stream_exec_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming exact-dedup execution, completing the
    real-incremental matrix (tumbling / sliding / session / upsert /
    dedup): the staged event files are re-staged with every third
    event DUPLICATED VERBATIM into a separate later file, replayed one
    file per micro-batch, and ``dropDuplicates(event_id)`` must
    suppress the copies using state carried ACROSS micro-batches (the
    copy always arrives in a later batch than its original). Because
    the duplicate rows are byte-identical, keep-first is
    value-independent, so the appended sink must hash-equal the plain
    batch projection of the events table — no tolerance needed.

    At 100 TB the state store holds one 16-byte-keyed entry per live
    key; the production variant bounds it with
    ``dropDuplicatesWithinWatermark`` (pytest-verified in
    tests/test_streaming.py), which this availableNow replay of
    bounded files does not need."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..catalog import load_table
    from ..sources.scans import _sf_fingerprint

    key = _sf_fingerprint(sf_dir)
    stage_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_streamdedup_{key}")
    cols = ["event_id", "user_id", "event_type", "value"]
    # Guard on our OWN marker written after BOTH writes — Spark drops
    # _SUCCESS after the first (overwrite) write, so guarding on it
    # would let a crash between the two writes leave a permanently
    # duplicate-free stage: the stream would trivially match the
    # oracle while the cross-batch dedup path went unexercised.
    staged_marker = os.path.join(stage_dir, "_STAGED_WITH_DUPES")
    if not os.path.exists(staged_marker):
        # Stage into a UNIQUE temp dir, then atomically rename into
        # place (the tmp+rename discipline merge_into_parquet uses):
        # two sessions hitting the same sf_dir concurrently each build
        # a complete private stage, and whichever rename wins leaves a
        # fully-staged directory — never an interleaved rmtree/write
        # corrupting a stage the other session is mid-way through.
        import uuid as _uuid

        tmp_dir = f"{stage_dir}.tmp.{_uuid.uuid4().hex[:8]}"
        ev = load_table(spark, sf_dir, "events").select(*cols)
        # originals first (files part-0000x sort before the append's),
        # copies appended as their own file -> a later micro-batch.
        ev.repartition(3).write.mode("overwrite").parquet(tmp_dir)
        ev.filter(F.col("event_id") % 3 == 0).coalesce(1).write.mode(
            "append"
        ).parquet(tmp_dir)
        with open(os.path.join(tmp_dir, "_STAGED_WITH_DUPES"), "w") as fh:
            fh.write("ok")
        # Clear any marker-less (partial, pre-fix) stage, then claim.
        shutil.rmtree(stage_dir, ignore_errors=True)
        try:
            os.rename(tmp_dir, stage_dir)
        except OSError:
            # Another session's complete stage won the rename race —
            # use theirs, discard ours.
            shutil.rmtree(tmp_dir, ignore_errors=True)
            if not os.path.exists(staged_marker):
                raise
    schema = spark.read.parquet(stage_dir).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    deduped = stream.dropDuplicates(["event_id"])
    qname = f"streamexec_dedup_{key}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.table(qname).select(*cols)


@query(
    "stream_exec_dedup_watermarked",
    oracle="""
WITH ranked AS (
  SELECT event_id, ts, user_id, event_type, value,
         ntile(4) OVER (ORDER BY ts, event_id) AS slice
  FROM events
),
thr AS (
  SELECT max(ts) - INTERVAL '13 hours' AS t FROM ranked WHERE slice <= 3
)
SELECT event_id, user_id, event_type, value FROM events
UNION ALL
SELECT r.event_id, r.user_id, r.event_type, r.value
FROM ranked r, thr
WHERE r.slice = 1 AND r.event_id % 3 = 0 AND r.ts < thr.t
""",
)
def stream_exec_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL execution of ``dropDuplicatesWithinWatermark`` — the
    production bounded-state form of stream_exec_dedup (whose
    docstring defers to it): dedup state expires once the watermark
    passes first_ts + delay, so a re-delivery AFTER expiry is
    re-emitted as new — the exact semantic that distinguishes it from
    unbounded dropDuplicates, pinned here as a hash verdict.

    Deterministic construction: the events table replays as four
    time-ordered quarters (monotone, so no original is ever late and
    every within-delay duplicate would be suppressed), then a FIFTH
    file of byte-chosen copies — slice-1 events (every third) whose
    ts sits >= 13 h below max(slices 1-3): their 6 h-delay state is
    provably evicted under EITHER eviction timing (end of batch 4
    with WM = max123 - 6h, or start of batch 5 with WM = gm - 6h —
    the 13 h margin clears both thresholds), and the copies are
    re-stamped to gm + 1 h so they are on time themselves. The oracle
    is therefore closed-form: every event exactly once, plus the copy
    set exactly once more. ts is excluded from the output so the
    re-stamp does not enter the hash; re-emission is visible as the
    duplicated (event_id, ...) rows.

    State bound at 100 TB: live keys are those within the delay
    window of the watermark — stream-length-independent, the reason
    this form exists."""
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ..catalog import load_table
    from ..sources.scans import _sf_fingerprint

    key = _sf_fingerprint(sf_dir)
    stage_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_streamdedup_wm_{key}"
    )
    cols = ["event_id", "user_id", "event_type", "value"]
    if not os.path.exists(os.path.join(stage_dir, "_STAGED")):
        shutil.rmtree(stage_dir, ignore_errors=True)
        os.makedirs(stage_dir)
        ev = load_table(spark, sf_dir, "events").withColumn(
            # global-ok: one-time sf-sized test-fixture staging (slices the
            # events table into 4 micro-batch files), not a query path
            "slice", F.ntile(4).over(W.orderBy("ts", "event_id"))
        )
        gm = ev.agg(F.max("ts")).collect()[0][0]
        thr = ev.filter(F.col("slice") <= 3).agg(
            F.max("ts") - F.expr("INTERVAL 13 HOURS")
        ).collect()[0][0]
        mtime = 1_000_000_000
        for i, s in enumerate([1, 2, 3, 4]):
            tmp = os.path.join(stage_dir, f"_tmp_{s}")
            ev.filter(F.col("slice") == s).drop("slice").coalesce(1).write.parquet(
                tmp
            )
            (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
            dest = os.path.join(stage_dir, f"slice_{i}.parquet")
            os.rename(part, dest)
            os.utime(dest, (mtime + 10 * i, mtime + 10 * i))
            shutil.rmtree(tmp)
        tmp = os.path.join(stage_dir, "_tmp_copies")
        (
            ev.filter(
                (F.col("slice") == 1)
                & (F.col("event_id") % 3 == 0)
                & (F.col("ts") < F.lit(thr))
            )
            .drop("slice")
            .withColumn("ts", F.lit(gm) + F.expr("INTERVAL 1 HOURS"))
            .coalesce(1)
            .write.parquet(tmp)
        )
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dest = os.path.join(stage_dir, "slice_4_copies.parquet")
        os.rename(part, dest)
        os.utime(dest, (mtime + 40, mtime + 40))
        shutil.rmtree(tmp)
        with open(os.path.join(stage_dir, "_STAGED"), "w") as fh:
            fh.write(key)
    schema = spark.read.parquet(stage_dir).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "6 hours")
    )
    deduped = stream.dropDuplicatesWithinWatermark(["event_id"])
    qname = f"streamexec_dedup_wm_{key}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.table(qname).select(*cols)


def _dual_sink_batch_fn(json_dir: str, target_dir: str):
    """foreachBatch body for the reference's FULL event path
    (`lambda_function.py:40-50`: transform -> JSON archive + warehouse
    upsert) as ONE streaming query: each micro-batch is transformed
    once, appended to a JSON archive, and MERGEd into the upsert
    target. Idempotent under foreachBatch's at-least-once re-delivery:
    the JSON side writes a PER-BATCH directory (``batch=<id>``) in
    overwrite mode, so a replayed batch replaces its own output instead
    of appending duplicates, and the merge side's keep-latest union is
    idempotent by construction (see _latest_merge_batch_fn).
    Module-level so tests can re-deliver a batch directly."""
    import os

    from pyspark.sql import functions as F

    merge_batch = _latest_merge_batch_fn(target_dir)

    def dual_sink(batch_df, batch_id: int) -> None:
        out = batch_df.withColumn("value_abs", F.abs(F.col("value")))
        out.persist()  # one compute, two sinks
        out.write.mode("overwrite").json(os.path.join(json_dir, f"batch={batch_id}"))
        merge_batch(out.drop("value_abs"), batch_id)
        out.unpersist()

    return dual_sink


@query(
    "stream_exec_upsert_json",
    oracle="""
SELECT user_id, ts AS last_ts, event_type AS last_type, value AS last_value,
       (SELECT count(*) FROM events)::BIGINT AS json_rows
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
""",
)
def stream_exec_upsert_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full streaming path as a single query:
    event stream -> transform -> BOTH sinks (JSON archive + upsert
    target) from one ``foreachBatch`` — `lambda_function.py:40-50`
    writes each processed batch to S3 as JSON AND upserts it into
    Redshift; this is that fan-out executed incrementally over four
    micro-batches. The result reads BOTH sinks back: the upsert
    target's per-user latest rows (hash-checked against the batch
    QUALIFY oracle) carrying the JSON archive's total row count
    (hash-checked against count(*) of events — a dropped or duplicated
    batch in either sink flips the hash). Idempotent-replay semantics
    are pytest-verified by re-delivering a batch through the same
    foreachBatch body (tests/test_streaming.py)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    stage_dir, key = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema

    base = os.path.join(tempfile.gettempdir(), f"spark_graft_streamdual_{key}")
    json_dir = os.path.join(base, "json")
    target_dir = os.path.join(base, "upsert")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(json_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = _start_state_sized(
        stream.writeStream.foreachBatch(_dual_sink_batch_fn(json_dir, target_dir))
        .trigger(availableNow=True)
    )
    _drain(q)
    # the stream drain necessarily runs at build time (the operator IS
    # "execute the stream, read back the sinks"), but the archive row
    # count joins relationally — a broadcast 1-row aggregate over the
    # JSON sink — so the read-back/verify cost lives in the returned
    # plan, not in an eager count() (round-6 advice).
    jn = spark.read.json(json_dir).agg(
        F.count(F.lit(1)).cast("long").alias("json_rows")
    )
    return (
        spark.read.parquet(target_dir)
        .crossJoin(F.broadcast(jn))
        .select("user_id", "last_ts", "last_type", "last_value", "json_rows")
    )


@query(
    "stream_exec_static_join",
    oracle="""
SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_mktsegment
FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
""",
)
def stream_exec_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-static enrichment join — the lookup pattern every
    production stream runs (events enriched against a slowly-changing
    dimension): the replayed event stream joins the STATIC customer
    table per micro-batch (stateless — no watermark, no join state;
    the static side is re-planned each batch, which is how dimension
    updates become visible mid-stream), appended to a memory sink.
    The drained result must hash-equal the batch LEFT JOIN oracle
    regardless of how the four micro-batches split the events. At
    100 TB the static side is a broadcast or a bucketed layout; the
    stream side never shuffles for the join when the dim broadcasts."""
    from ..catalog import load_table

    stage_dir, key = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema

    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
        .select("event_id", "user_id", "event_type", "value")
    )
    enriched = stream.join(dim, stream.user_id == dim.c_custkey, "left").select(
        "event_id", "user_id", "event_type", "value", "c_mktsegment"
    )
    qname = f"streamexec_staticjoin_{key}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.table(qname)


@query(
    "stream_exec_custom_state",
    oracle="""
SELECT user_id,
       count(*)::BIGINT AS n_events,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS total_cents
FROM events GROUP BY user_id
""",
)
def stream_exec_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL custom-stateful streaming execution, oracle-verified — the
    ``applyInPandasWithState`` escape hatch for operators the built-in
    stateful aggregations can't express (SURVEY §2B UDF/stateful row),
    upgraded from pytest-only to a hash-green driver row now that the
    round-7 probe confirmed the API executes in this container (the
    transformWithStateInPandas twin stays protobuf-gated,
    streaming/stateful.py). Per-user (count, cents) state is carried
    across four genuine micro-batches; every batch emits the key's
    running totals in update mode, and the final per-user emission —
    selected as the max-(n_events) row, which is strictly increasing
    per key — must hash-equal the batch aggregate REGARDLESS of how
    the micro-batches split the events. That verifies the cross-batch
    state arithmetic itself, not a batch twin.

    Determinism: values are rounded to integer cents JVM-side (Spark's
    HALF_UP round, matching the oracle's round()) BEFORE entering the
    Python state function, so the accumulator is exact integer
    arithmetic — no float-summation-order or banker's-rounding
    exposure in pandas. At 100 TB: state is two longs per live key
    partitioned across executors by the group key; input flows Arrow-
    batched into Python per micro-batch — the documented slow-but-
    unbounded path, used only when built-ins genuinely can't express
    the semantics (running_totals_stream's contract)."""
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    stage_dir, key = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
        .select(
            "user_id", F.round(F.col("value") * 100).cast("long").alias("cents")
        )
    )

    def upd(key_, pdfs, state):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["cents"].sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key_[0]], "n_events": [n], "total_cents": [cents]}
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        upd,
        "user_id bigint, n_events bigint, total_cents bigint",
        "n bigint, cents bigint",
        "update",
        GroupStateTimeout.NoTimeout,
    )
    qname = f"streamexec_state_{key}"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return (
        spark.table(qname)
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_cents")).alias("m"))
        .select(
            "user_id",
            F.col("m.n_events").alias("n_events"),
            F.col("m.total_cents").alias("total_cents"),
        )
    )


@query(
    "stream_exec_stream_join",
    oracle="""
SELECT a.event_id AS evt_id, b.event_id AS prior_id, a.user_id
FROM events a JOIN events b
  ON b.user_id = a.user_id
 AND a.event_id % 2 = 0 AND b.event_id % 2 = 1
 AND b.ts BETWEEN a.ts - INTERVAL '6 hours' AND a.ts
""",
)
def stream_exec_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL STREAM-STREAM inner join, oracle-verified — the last
    first-class Structured Streaming join shape (stream-static is
    stream_exec_static_join; this is both sides unbounded): the staged
    event files feed TWO independent streaming sources (even event_ids
    = the fact side, odd = the candidate side), joined on user_id with
    an event-time interval (candidate within the 6 hours before the
    fact event) — the attribution pattern (purchase joined to the
    clicks preceding it) every event pipeline runs. Each side arrives
    in four genuine micro-batches; the join buffers BOTH sides' state
    so a pair whose halves arrive in different batches still matches —
    which is exactly what the oracle hash verifies: the appended
    result must equal the batch interval join REGARDLESS of the
    micro-batch interleaving.

    No watermark ON PURPOSE for the bounded availableNow drain: a
    watermark is state GC, and with replayed files whose timestamps
    are not monotone per batch it would DROP legitimately-matchable
    rows nondeterministically. Unbounded-state inner join is exact;
    the watermarked variant (bounded state, late drops) is pinned
    with crafted timestamps in
    tests/test_stateful_streaming.py::test_stream_stream_interval_join.
    At 100 TB the production form carries watermarks on both sides
    sized to the interval bound, making join state proportional to
    the interval window, not the stream history."""
    from pyspark.sql import functions as F

    stage_dir, key = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema

    def side(parity: int, prefix: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_dir)
            .filter(F.col("event_id") % 2 == parity)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
                F.col("user_id").alias(f"{prefix}_user"),
            )
        )

    facts = side(0, "evt")
    cands = side(1, "prior")
    joined = facts.join(
        cands,
        F.expr(
            "evt_user = prior_user AND "
            "prior_ts BETWEEN evt_ts - INTERVAL 6 HOURS AND evt_ts"
        ),
    ).select(
        F.col("evt_id"),
        F.col("prior_id"),
        F.col("evt_user").alias("user_id"),
    )
    qname = f"streamexec_ssjoin_{key}"
    q = (
        joined.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.table(qname)


@query(
    "stream_exec_stream_join_watermarked",
    oracle="""
WITH ranked AS (
  SELECT event_id, ts, user_id,
         ntile(4) OVER (ORDER BY ts, event_id) AS slice
  FROM events
),
gm AS (SELECT max(ts) AS m FROM events),
kept AS (
  SELECT r.event_id, r.ts, r.user_id
  FROM ranked r, gm
  WHERE r.slice > 1 OR r.ts >= gm.m - INTERVAL '6 hours'
)
SELECT a.event_id AS evt_id, b.event_id AS prior_id, a.user_id
FROM kept a JOIN kept b
  ON b.user_id = a.user_id
 AND a.event_id % 2 = 0 AND b.event_id % 2 = 1
 AND b.ts BETWEEN a.ts - INTERVAL '6 hours' AND a.ts
""",
)
def stream_exec_stream_join_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION form of `stream_exec_stream_join`: both sides
    carry ``withWatermark(ts, 6 hours)`` sized to the join interval,
    so join state is bounded by the interval window instead of the
    stream history — the only form that survives an unbounded 100 TB
    stream (the unwatermarked twin above is exact but its state grows
    forever).

    Determinism is engineered in the staging, not assumed:
    ``_stage_events_timesliced`` replays the events table as four
    micro-batches — time-ordered quarters 2, 3, 4 first, then quarter
    1 (the earliest rows) LAST.  During the monotone prefix no on-time
    row ever falls behind the watermark (each batch's rows are newer
    than everything before), and cross-batch pairs are never lost to
    state eviction: a batch-N fact needs candidates with ``prior_ts >=
    max_ts(batch N-1) - 6h``, which is exactly 6 h ABOVE the candidate
    eviction threshold ``WM - 6h``.  When quarter 1 finally arrives,
    the watermark is already ``global_max_ts - 6h`` (quarter 4 carried
    the global max), so its rows are dropped as late IFF ``ts <
    global_max - 6h`` — a closed-form predicate the DuckDB oracle
    states directly (`kept` CTE).  The hash verdict therefore pins
    BOTH watermark behaviors at once: zero spurious drops on the
    monotone prefix AND the exact late-drop set on the straggler
    batch.

    Scale shape: per-side state after this query's steady state is the
    6 h interval window of rows, independent of stream length; the
    memory-sink drain is the test fixture, not the operator."""
    from pyspark.sql import functions as F

    stage_dir, key = _stage_events_timesliced(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema

    def side(parity: int, prefix: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_dir)
            .filter(F.col("event_id") % 2 == parity)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                # withWatermark rejects TIMESTAMP_NTZ; the session TZ
                # is pinned UTC so the cast preserves the instant.
                F.col("ts").cast("timestamp").alias(f"{prefix}_ts"),
                F.col("user_id").alias(f"{prefix}_user"),
            )
            .withWatermark(f"{prefix}_ts", "6 hours")
        )

    facts = side(0, "evt")
    cands = side(1, "prior")
    joined = facts.join(
        cands,
        F.expr(
            "evt_user = prior_user AND "
            "prior_ts BETWEEN evt_ts - INTERVAL 6 HOURS AND evt_ts"
        ),
    ).select(
        F.col("evt_id"),
        F.col("prior_id"),
        F.col("evt_user").alias("user_id"),
    )
    qname = f"streamexec_ssjoin_wm_{key}"
    q = _start_state_sized(
        joined.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    _drain(q)
    return spark.table(qname)


@query(
    "stream_exec_stream_join_outer_watermarked",
    oracle="""
WITH ranked AS (
  SELECT event_id, ts, user_id,
         ntile(4) OVER (ORDER BY ts, event_id) AS slice
  FROM events
),
wm AS (
  SELECT least(
    (SELECT max(ts) FROM events WHERE event_id % 2 = 0),
    (SELECT max(ts) FROM events WHERE event_id % 2 = 1)
  ) - INTERVAL '6 hours' AS w
),
kept AS (
  SELECT r.event_id, r.ts, r.user_id
  FROM ranked r, wm
  WHERE r.slice > 1 OR r.ts >= wm.w
),
facts AS (
  SELECT event_id AS evt_id, ts AS evt_ts, user_id
  FROM kept WHERE event_id % 2 = 0
),
cands AS (
  SELECT event_id AS prior_id, ts AS prior_ts, user_id AS prior_user
  FROM kept WHERE event_id % 2 = 1
)
SELECT f.evt_id, c.prior_id, f.user_id
FROM facts f JOIN cands c ON c.prior_user = f.user_id
 AND c.prior_ts BETWEEN f.evt_ts - INTERVAL '6 hours' AND f.evt_ts
UNION ALL
SELECT f.evt_id, CAST(NULL AS BIGINT) AS prior_id, f.user_id
FROM facts f, wm
WHERE f.evt_ts < wm.w
  AND NOT EXISTS (
    SELECT 1 FROM cands c
    WHERE c.prior_user = f.user_id
      AND c.prior_ts BETWEEN f.evt_ts - INTERVAL '6 hours' AND f.evt_ts
  )
""",
)
def stream_exec_stream_join_outer_watermarked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join — the last first-class
    Structured Streaming join shape (inner unwatermarked, inner
    watermarked above; this adds the outer-null protocol): an
    unmatched fact may only be emitted with NULL once the watermark
    PROVES no matching candidate can still arrive (candidate-side
    watermark past evt_ts), so outer results trickle out as the
    watermark advances — including Spark's final no-data batch, which
    availableNow runs after the last file (probed empirically this
    round: an evictable unmatched fact IS null-emitted at drain end; a
    fact still inside the watermark window is NOT).

    Same engineered-deterministic staging as the inner form. The
    closed-form oracle adds two facts the inner one didn't need:
    (1) the global watermark is the MIN over both sides' maxima
    (facts = even event_ids, candidates = odd — their maxima differ),
    and (2) the null set is exactly the kept facts with evt_ts below
    that final watermark and no kept-candidate match — facts at or
    above it remain buffered, unemitted, when the stream ends.
    State bound at 100 TB: identical to the inner form (interval
    window per side) plus the unmatched-fact buffer, also
    watermark-bounded."""
    from pyspark.sql import functions as F

    stage_dir, key = _stage_events_timesliced(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema

    def side(parity: int, prefix: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_dir)
            .filter(F.col("event_id") % 2 == parity)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").cast("timestamp").alias(f"{prefix}_ts"),
                F.col("user_id").alias(f"{prefix}_user"),
            )
            .withWatermark(f"{prefix}_ts", "6 hours")
        )

    facts = side(0, "evt")
    cands = side(1, "prior")
    joined = facts.join(
        cands,
        F.expr(
            "evt_user = prior_user AND "
            "prior_ts BETWEEN evt_ts - INTERVAL 6 HOURS AND evt_ts"
        ),
        "leftOuter",
    ).select(
        F.col("evt_id"),
        F.col("prior_id"),
        F.col("evt_user").alias("user_id"),
    )
    qname = f"streamexec_ssjoin_owm_{key}"
    q = (
        joined.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.table(qname)


from ..operators.sketches import THETA_ORACLE as _THETA_ORACLE  # noqa: E402


@query("stream_exec_sketch_merge", oracle=_THETA_ORACLE)
def stream_exec_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming execution of a mergeable sketch: the KMV/theta
    union sample (`sketch_theta_intersect`) maintained ACROSS
    micro-batches. Each micro-batch folds its events to a k-row
    (hash, in_a, in_b) state; foreachBatch merges it with the
    accumulated state by "union, max the flags per key, re-take the k
    smallest" — the associative/commutative sketch merge — staged with
    the same tmp+atomic-rename discipline as stream_exec_dedup. The
    final state must reproduce EXACTLY the batch sketch (the oracle is
    literally `sketch_theta_intersect`'s, imported — one string, two
    execution paths), proving the merge is split-invariant: any
    micro-batch interleaving yields the identical estimate.

    This is the streaming face of the 100 TB sketch story: per-batch
    (or per-executor) states are constant-size, so continuous
    distinct/overlap monitoring over an unbounded stream ships k rows
    per trigger, never the stream. The per-batch state fold is a
    TakeOrdered over THAT BATCH only; nothing corpus-sized crosses a
    batch boundary."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from pyspark.sql import functions as F

    from ..operators.sketches import THETA_K, _EV_A, _EV_B, _H60, _h60_spark

    stage_dir, key = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema
    # per-invocation private state root: the state is rebuilt from the
    # replay every time (it IS the thing under test), so no cross-
    # session reuse and no staleness guard needed.
    state_root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_kmvstate_{_uuid.uuid4().hex[:8]}"
    )
    os.makedirs(state_root, exist_ok=True)
    cur = os.path.join(state_root, "current")

    def merge_batch(batch, _bid: int) -> None:
        part = (
            batch.filter(F.col("event_type").isin(_EV_A, _EV_B))
            .groupBy("user_id")
            .agg(
                F.max(
                    F.when(F.col("event_type") == _EV_A, 1).otherwise(0)
                ).alias("in_a"),
                F.max(
                    F.when(F.col("event_type") == _EV_B, 1).otherwise(0)
                ).alias("in_b"),
            )
            .withColumn("h", _h60_spark(F.col("user_id")))
            .orderBy("h", "user_id")
            .limit(THETA_K)
        )
        if os.path.exists(os.path.join(cur, "_SUCCESS")):
            prev = batch.sparkSession.read.parquet(cur)
            merged = (
                prev.unionByName(part)
                .groupBy("user_id", "h")
                .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
                .orderBy("h", "user_id")
                .limit(THETA_K)
            )
        else:
            merged = part
        tmp = os.path.join(state_root, f"tmp_{_bid}_{_uuid.uuid4().hex[:8]}")
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = os.path.join(state_root, f"old_{_bid}")
        if os.path.exists(cur):
            os.rename(cur, old)
        os.rename(tmp, cur)
        shutil.rmtree(old, ignore_errors=True)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = _start_state_sized(
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
    )
    _drain(q)

    state = spark.read.parquet(cur)
    sk = state.agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).cast("long").alias("kk")
    )
    # exact side from the same staged batch data the stream replayed.
    ev = spark.read.parquet(stage_dir)
    flags = (
        ev.filter(F.col("event_type").isin(_EV_A, _EV_B))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == _EV_A, 1).otherwise(0)).alias(
                "in_a"
            ),
            F.max(F.when(F.col("event_type") == _EV_B, 1).otherwise(0)).alias(
                "in_b"
            ),
        )
    )
    exact = flags.agg(
        F.count(F.lit(1)).cast("long").alias("exact_union"),
        F.count(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1))
        .cast("long")
        .alias("exact_inter"),
    )
    sample = (
        state.crossJoin(F.broadcast(sk))
        .agg(
            F.count(
                F.when(
                    (F.col("h") < F.col("hk"))
                    & (F.col("in_a") == 1)
                    & (F.col("in_b") == 1),
                    1,
                )
            )
            .cast("long")
            .alias("sample_inter"),
            F.first("hk").alias("hk"),
            F.first("kk").alias("kk"),
        )
    )
    est_union = F.when(
        F.col("kk") < THETA_K, F.col("exact_union").cast("double")
    ).otherwise(F.lit(float(THETA_K - 1)) * F.lit(_H60) / F.col("hk"))
    est_inter = F.when(
        F.col("kk") < THETA_K, F.col("exact_inter").cast("double")
    ).otherwise(F.col("sample_inter") * F.lit(_H60) / F.col("hk"))
    return (
        exact.crossJoin(F.broadcast(sample))
        .select(
            "exact_union",
            F.round(est_union, 4).alias("est_union"),
            "exact_inter",
            F.round(est_inter, 4).alias("est_inter"),
        )
    )


def _cdc_normalize_batch(batch_df):
    """Reduce a raw micro-batch to per-user LATEST CDC changes,
    keeping the op marker: error events are DELETE tombstones,
    everything else an upsert."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    return (
        batch_df.select(
            "user_id",
            F.col("ts").alias("last_ts"),
            "event_id",
            F.col("value").alias("last_value"),
            F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(
                    F.col("last_ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@query(
    "stream_exec_cdc",
    oracle="""
WITH feed AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
),
last AS (
  SELECT user_id, ts, value, op,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM feed
)
SELECT user_id, ts AS last_ts, value AS last_value
FROM last WHERE rn = 1 AND op = 'U'
""",
)
def stream_exec_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming CDC apply with DELETE tombstones: the replayed
    event stream is interpreted as a change feed (error = DELETE,
    anything else = upsert) and each micro-batch MERGEs its per-key
    latest CHANGE — including deletes — into the parquet target.

    The CDC subtlety this pins: a delete cannot be applied by
    physically dropping the key on arrival. A later micro-batch can
    carry an EARLIER-timestamped upsert for the same key (out-of-order
    delivery), and with the tombstone discarded that stale upsert
    would resurrect the deleted row. So deletes are retained as
    tombstone STATE rows, merged with the same
    latest-of-(last_ts, event_id) rule as upserts — associative,
    batching-invariant, replay-idempotent — and filtered only at READ
    time. The no-resurrection property is pinned directly in pytest by
    replaying a delete before an older upsert in a later batch; the
    final table must hash-equal the batch oracle (latest change per
    user, deletes excluded) regardless of the 4-way split.
    """
    import os
    import shutil
    import tempfile

    stage_dir, key = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema

    target_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_streamcdc_{key}")
    shutil.rmtree(target_dir, ignore_errors=True)
    merge_batch = _keyed_merge_batch_fn(target_dir, _cdc_normalize_batch)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = _start_state_sized(
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
    )
    _drain(q)
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(target_dir)
        .where(F.col("op") == "U")
        .select("user_id", "last_ts", "last_value")
    )


TOPK_LEADERBOARD_K = 5


@query(
    "stream_exec_topk_merge",
    oracle=f"""
SELECT event_type, rnk, event_id, user_id, round(value, 2) AS value
FROM (
  SELECT event_type, event_id, user_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rnk
  FROM events WHERE value IS NOT NULL
) WHERE rnk <= {TOPK_LEADERBOARD_K}
""",
)
def stream_exec_topk_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming execution of a cross-micro-batch TOP-K
    leaderboard: the K highest-value events per event type, maintained
    over an unbounded stream. Each micro-batch folds to ITS OWN top-K
    per type (a per-batch window, batch-sized input); foreachBatch
    merges with the accumulated K-row state by union + re-rank + keep
    top-K — the classic mergeable-maximum state, associative and
    commutative, so the final board is EXACTLY the batch answer
    regardless of micro-batch interleaving (the
    stream_exec_sketch_merge split-invariance contract; the oracle is
    the plain batch window query).

    Why max-based and not count-based: a top-k BY FREQUENCY is not
    mergeable with k-sized state (a globally-heavy key can be locally
    light everywhere) — that job belongs to count-min + heap
    (`sketch_countmin_heavyhitters`). Attribute-ranked top-k IS, and
    is the shape of real leaderboards (largest transactions, longest
    sessions, slowest requests). Per-trigger output is K x types
    rows; nothing stream-sized ever crosses a batch boundary."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    stage_dir, key = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema
    state_root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_topkstate_{_uuid.uuid4().hex[:8]}"
    )
    os.makedirs(state_root, exist_ok=True)
    cur = os.path.join(state_root, "current")
    w = W.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))

    def topk(df):
        base = df.where(F.col("value").isNotNull()).select(
            "event_type", "event_id", "user_id", "value"
        )
        # two-phase exact top-K (r11, 1000x replica lesson): a single
        # window partitioned by event_type alone bounds parallelism at
        # #types and sorts batch_size/#types rows in ONE task. Phase 1
        # keeps each INPUT partition's top-K per type — window keyed
        # by (type, spark_partition_id), partition-local sorts at full
        # parallelism; the global top-K per type is a subset of the
        # per-partition top-Ks, so phase 2's re-rank over the
        # types x partitions x K survivors (verdict-sized by
        # construction) is exact.
        local = (
            base.withColumn("pid", F.spark_partition_id())
            .withColumn(
                "rnk",
                F.row_number().over(
                    W.partitionBy("event_type", "pid").orderBy(
                        F.desc("value"), F.asc("event_id")
                    )
                ),
            )
            .where(F.col("rnk") <= TOPK_LEADERBOARD_K)
            .drop("pid", "rnk")
        )
        return (
            local.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= TOPK_LEADERBOARD_K)
            .drop("rnk")
        )

    def merge_batch(batch, bid: int) -> None:
        if os.path.exists(os.path.join(cur, "_SUCCESS")):
            prev = batch.sparkSession.read.parquet(cur)
            # threshold pruning (r11, the classic streaming-top-K
            # move): once a type's board holds K entries, any row
            # whose value is strictly below the board's K-th value
            # can never enter — prune it IN THE SCAN PROJECTION,
            # before the fold's exchange. The threshold relation is
            # K x types rows (broadcast); >= keeps boundary ties for
            # the event_id tie-break; types with fewer than K
            # entries prune nothing. At 1000x this collapses the
            # per-batch exchange from batch-sized to
            # above-threshold-sized once the first batch seeds the
            # board.
            thr = prev.groupBy("event_type").agg(
                F.min("value").alias("_thr"),
                F.count(F.lit(1)).alias("_k"),
            )
            pruned = (
                batch.join(F.broadcast(thr), "event_type", "left")
                .where(
                    F.col("_thr").isNull()
                    | (F.col("_k") < TOPK_LEADERBOARD_K)
                    | (F.col("value") >= F.col("_thr"))
                )
                .drop("_thr", "_k")
            )
            merged = topk(prev.unionByName(topk(pruned)))
        else:
            merged = topk(batch)
        tmp = os.path.join(state_root, f"tmp_{bid}_{_uuid.uuid4().hex[:8]}")
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = os.path.join(state_root, f"old_{bid}")
        if os.path.exists(cur):
            os.rename(cur, old)
        os.rename(tmp, cur)
        shutil.rmtree(old, ignore_errors=True)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    q = _start_state_sized(
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
    )
    _drain(q)
    return (
        spark.read.parquet(cur)
        .withColumn("rnk", F.row_number().over(w))
        .select(
            "event_type",
            "rnk",
            "event_id",
            "user_id",
            F.round("value", 2).alias("value"),
        )
    )


@query(
    "stream_exec_asof_join",
    oracle="""
SELECT a.event_id AS evt_id, a.user_id, a.ts AS evt_ts,
       b.event_id AS prior_id, b.ts AS prior_ts
FROM events a JOIN events b
  ON b.user_id = a.user_id
 AND a.event_id % 2 = 0 AND b.event_id % 2 = 1
 AND b.ts BETWEEN a.ts - INTERVAL '6 hours' AND a.ts
QUALIFY row_number() OVER (PARTITION BY a.event_id
                           ORDER BY b.ts DESC, b.event_id DESC) = 1
""",
)
def stream_exec_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL STREAMING AS-OF JOIN — the feature-store enrichment shape
    (each fact gets the LATEST candidate state at-or-before its event
    time, within a 6-hour tolerance) executed incrementally: the
    staged files feed two streaming sources (even event_ids = facts,
    odd = candidate states, the `stream_exec_stream_join` split); the
    stream-stream interval join emits every in-window pairing in
    append mode, and ``foreachBatch`` reduces each micro-batch to its
    per-fact best candidate and MERGEs it into a parquet target
    keeping the max (prior_ts, prior_id) per fact — the
    `stream_exec_upsert` keyed-merge discipline pointed at join
    output. "Latest within window" is an associative, idempotent
    reduction, so the target is batching-invariant and replay-safe,
    and must hash-equal the batch as-of oracle (QUALIFY row_number
    = 1) regardless of how the four micro-batches interleave — the
    exact contract `join_asof_tolerance` verifies in batch, held
    under incremental execution.

    Structured Streaming has no native as-of join; this is the
    documented composition a production feature pipeline runs:
    bounded-lookback interval join (state sized by the tolerance
    window once watermarks are on) + per-key argmax compaction in the
    sink. No watermark here ON PURPOSE, same as
    `stream_exec_stream_join`: replayed fixture files are not
    time-ordered, so a watermark would drop legitimately-matchable
    rows nondeterministically; the production form watermarks both
    sides at the 6-hour tolerance, bounding join state by the window.
    Inner semantics (facts with no candidate in window are absent) —
    the left-outer protocol under streaming lives with
    `stream_exec_stream_join_outer_watermarked`."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    stage_dir, key = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema

    target_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_streamasof_{key}"
    )
    shutil.rmtree(target_dir, ignore_errors=True)

    def best_per_fact(batch_df):
        # normalize to the keyed-merge column protocol: key=user_id
        # (the FACT id here), winner order = (last_ts, event_id) =
        # (prior_ts, prior_id); evt_user/evt_ts ride as payload.
        w = W.partitionBy("user_id").orderBy(
            F.col("last_ts").desc(), F.col("event_id").desc()
        )
        return (
            batch_df.select(
                F.col("evt_id").alias("user_id"),
                F.col("prior_ts").alias("last_ts"),
                F.col("prior_id").alias("event_id"),
                "evt_user",
                "evt_ts",
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    merge_batch = _keyed_merge_batch_fn(target_dir, best_per_fact)

    def side(parity: int, prefix: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_dir)
            .filter(F.col("event_id") % 2 == parity)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
                F.col("user_id").alias(f"{prefix}_user"),
            )
        )

    joined = side(0, "evt").join(
        side(1, "prior"),
        F.expr(
            "evt_user = prior_user AND "
            "prior_ts BETWEEN evt_ts - INTERVAL 6 HOURS AND evt_ts"
        ),
    ).select("evt_id", "evt_ts", "evt_user", "prior_id", "prior_ts")
    q = _start_state_sized(
        joined.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
    )
    _drain(q)
    return spark.read.parquet(target_dir).select(
        F.col("user_id").alias("evt_id"),
        F.col("evt_user").alias("user_id"),
        "evt_ts",
        F.col("event_id").alias("prior_id"),
        F.col("last_ts").alias("prior_ts"),
    )


@query(
    "stream_exec_asof_join_watermarked",
    oracle="""
WITH ranked AS (
  SELECT event_id, ts, user_id,
         ntile(4) OVER (ORDER BY ts, event_id) AS slice
  FROM events
),
wm AS (
  SELECT least(
    (SELECT max(ts) FROM events WHERE event_id % 2 = 0),
    (SELECT max(ts) FROM events WHERE event_id % 2 = 1)
  ) - INTERVAL '6 hours' AS w
),
kept AS (
  SELECT r.event_id, r.ts, r.user_id
  FROM ranked r, wm
  WHERE r.slice > 1 OR r.ts >= wm.w
)
SELECT a.event_id AS evt_id, a.user_id, a.ts AS evt_ts,
       b.event_id AS prior_id, b.ts AS prior_ts
FROM kept a JOIN kept b
  ON b.user_id = a.user_id
 AND a.event_id % 2 = 0 AND b.event_id % 2 = 1
 AND b.ts BETWEEN a.ts - INTERVAL '6 hours' AND a.ts
QUALIFY row_number() OVER (PARTITION BY a.event_id
                           ORDER BY b.ts DESC, b.event_id DESC) = 1
""",
)
def stream_exec_asof_join_watermarked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION form of `stream_exec_asof_join` — the form its
    docstring promises: both sides carry ``withWatermark(ts, 6
    hours)`` sized to the as-of tolerance, so join state is bounded
    by the tolerance window instead of the stream history (the
    unwatermarked twin is exact but its state grows forever — the
    measured 1000x boundary in SCALING.md).

    Composition = the two proven devices, unchanged: the
    ``_stage_events_timesliced`` replay makes the watermark
    trajectory deterministic (time-ordered quarters 2, 3, 4, then
    quarter 1 LAST — on the monotone prefix no on-time row falls
    behind the watermark and no needed candidate is evicted, because
    a surviving fact's candidates sit >= WM - 6h, exactly the
    eviction threshold; the straggler quarter is dropped IFF ts <
    min(max even ts, max odd ts) - 6h, the closed-form `kept`
    predicate the oracle states — Spark's query watermark is the MIN
    across watermarked inputs of max-seen minus delay), and the
    ``foreachBatch`` keyed-merge argmax sink reduces every
    micro-batch's join output to its per-fact latest candidate
    ("latest within window" is associative and idempotent, so the
    target is batching-invariant and replay-safe). The oracle is
    therefore the batch as-of (QUALIFY row_number = 1) over the kept
    set: one hash pins watermark semantics, state retention, AND
    as-of compaction at once.

    Scale shape: per-side state in steady state is the 6 h tolerance
    window of rows — the only as-of form that survives an unbounded
    100 TB stream; on replica scale runs the RocksDB state store
    carries the in-batch join state (SPARK_GRAFT_STATE_STORE=rocksdb,
    the measured r11 boundary)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    stage_dir, key = _stage_events_timesliced(spark, sf_dir)
    schema = spark.read.parquet(stage_dir).schema

    target_dir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_streamasofwm_{key}"
    )
    shutil.rmtree(target_dir, ignore_errors=True)

    def best_per_fact(batch_df):
        # keyed-merge column protocol: key=user_id (the FACT id),
        # winner order = (last_ts, event_id) = (prior_ts, prior_id).
        w = W.partitionBy("user_id").orderBy(
            F.col("last_ts").desc(), F.col("event_id").desc()
        )
        return (
            batch_df.select(
                F.col("evt_id").alias("user_id"),
                F.col("prior_ts").alias("last_ts"),
                F.col("prior_id").alias("event_id"),
                "evt_user",
                "evt_ts",
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    merge_batch = _keyed_merge_batch_fn(target_dir, best_per_fact)

    def side(parity: int, prefix: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_dir)
            .filter(F.col("event_id") % 2 == parity)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                # withWatermark rejects TIMESTAMP_NTZ; the session TZ
                # is pinned UTC so the cast preserves the instant.
                F.col("ts").cast("timestamp").alias(f"{prefix}_ts"),
                F.col("user_id").alias(f"{prefix}_user"),
            )
            .withWatermark(f"{prefix}_ts", "6 hours")
        )

    joined = side(0, "evt").join(
        side(1, "prior"),
        F.expr(
            "evt_user = prior_user AND "
            "prior_ts BETWEEN evt_ts - INTERVAL 6 HOURS AND evt_ts"
        ),
    ).select("evt_id", "evt_ts", "evt_user", "prior_id", "prior_ts")
    q = _start_state_sized(
        joined.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
    )
    _drain(q)
    return spark.read.parquet(target_dir).select(
        F.col("user_id").alias("evt_id"),
        F.col("evt_user").alias("user_id"),
        # back to the events table's NTZ type for oracle comparability
        F.col("evt_ts").cast("timestamp_ntz").alias("evt_ts"),
        F.col("event_id").alias("prior_id"),
        F.col("last_ts").cast("timestamp_ntz").alias("prior_ts"),
    )
