package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import java.sql.Timestamp

/** Structured Streaming surface (SURVEY §2.9).
  *
  * The reference's temporal semantics are a daily full-refresh batch
  * (systemd timer, `jhu-data-parser.timer:5`) — mapped to
  * `Trigger.AvailableNow` run-to-completion. Beyond parity, this module adds
  * the streaming operators a live events pipeline needs: watermarked tumbling
  * windows and stateful sessionization (`flatMapGroupsWithState`).
  *
  * Scale: streaming aggs shuffle by (window, key) like any groupBy; state
  * lives in the state store keyed by group — sessionization state is O(open
  * sessions), bounded by the event-time timeout.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double,
  )

  // Not `private`: the state encoder's generated code must construct it.
  // start/end are epoch MICROSECONDS: `Timestamp.getTime` is ms and would
  // truncate the µs the events table actually carries, shifting session
  // bounds (and, at a gap boundary, membership) off the batch semantics.
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** Watermarked tumbling-window aggregation (event-time). */
  def hourlyAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("hour"),
        col("event_type"),
        col("n"),
        col("total_value"),
      )

  /** Sessionize a stream of events per user with an inactivity `gapMinutes`:
    * emits one [[Session]] row when a session closes (event-time timeout).
    * State per user is a single running summary — O(1) per group.
    * `watermarkMinutes` (default = gap) bounds how out-of-order events may
    * be: with a delay larger than the gap, events from before the open
    * session's window arrive non-late and are emitted as singleton fragment
    * sessions (single-session-per-key state; full out-of-order merging
    * would need multi-fragment state).
    */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermarkMinutes: Option[Int] = None,
  ): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // local defs (not object members): the state-update closure must stay
    // self-contained — an object-method reference would capture the module
    // and fail Spark's closure serialization
    def usOf(t: Timestamp): Long = t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    def tsOf(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000L * 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }

    def update(
        userId: Long,
        batch: Iterator[Event],
        state: GroupState[SessionState],
    ): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(userId, tsOf(s.start), tsOf(s.end), s.n, s.total))
      } else {
        // (ts, event_id) — the id tie-break makes the in-session double
        // accumulation order deterministic (file row order is not)
        val events = batch.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
        var closed = List.empty[Session]
        var cur = state.getOption
        events.foreach { e =>
          val t = usOf(e.ts)
          cur match {
            case Some(s) if t > s.end + gapUs =>
              // gap exceeded: close the current session, start a new one
              closed ::= Session(userId, tsOf(s.start), tsOf(s.end), s.n, s.total)
              cur = Some(SessionState(t, t, 1, e.value))
            case Some(s) if t < s.start - gapUs =>
              // out-of-order event from BEFORE the open session's window:
              // emit as its own singleton session (single-session-per-key
              // state, a documented simplification — full out-of-order
              // merging needs multi-fragment state)
              closed ::= Session(userId, tsOf(t), tsOf(t), 1, e.value)
            case Some(s) =>
              // within [start-gap, end+gap]: extend in either direction
              cur = Some(
                s.copy(start = math.min(s.start, t), end = math.max(s.end, t), n = s.n + 1, total = s.total + e.value)
              )
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // timeout API is ms; floor(end µs) keeps it within 1 ms of exact
          state.setTimeoutTimestamp(s.end / 1000L + gapMinutes * 60L * 1000L)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", s"${watermarkMinutes.getOrElse(gapMinutes)} minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming exact dedup: drop events whose `idCols` were already seen
    * within the watermark horizon — the stream-side of the dedup suite
    * (exactly-once ingestion against at-least-once sources). State is
    * bounded by the watermark: ids older than it are evicted.
    */
  def dedupStream(events: DataFrame, idCols: Seq[String], watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Batch-parity runner: stream the events table through [[hourlyAgg]] with
    * an AvailableNow-style one-shot run into a memory sink and return the
    * result — Structured Streaming's core guarantee (streaming result ==
    * batch result over the same data) made checkable by the DuckDB oracle.
    */
  def hourlyAggOneShot(spark: SparkSession, eventsDf: DataFrame, queryName: String): DataFrame = {
    val stream = spark.readStream
      .schema(eventsDf.schema)
      .parquet(writeTemp(eventsDf, queryName))
    val q = hourlyAgg(stream)
      .writeStream
      .outputMode(OutputMode.Complete)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Batch-parity runner for [[dedupStream]]: one-shot AvailableNow run into
    * a memory sink (append mode — dedup emits first occurrences as they
    * arrive). The temp parquet is written as a SINGLE file so the run is one
    * microbatch: across multiple batches the watermark advanced by batch 1
    * would drop genuinely-late rows of batch 2, making the result depend on
    * nondeterministic file order rather than dedup semantics.
    */
  def dedupOneShot(
      spark: SparkSession,
      eventsDf: DataFrame,
      idCols: Seq[String],
      queryName: String,
      watermark: String = "1 hour",
  ): DataFrame = {
    val stream = spark.readStream
      .schema(eventsDf.schema)
      .parquet(writeTemp(eventsDf, queryName, singleFile = true))
    val q = dedupStream(stream, idCols, watermark)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Batch-parity runner for [[sessionize]]: drive the events table through
    * the stateful flatMapGroupsWithState query with an AvailableNow one-shot
    * run and return EVERY session — proving stream == batch for custom state,
    * the way [[hourlyAggOneShot]] does for windowed aggs.
    *
    * Three ordered microbatches (`maxFilesPerTrigger=1`, mtime-ordered
    * files):
    *   0. ALL real events in one batch — the in-batch (ts, event_id) sort
    *      makes stateful processing equal to batch sessionization (no
    *      cross-batch out-of-order fragments);
    *   1. a sentinel event a day past the last real event — advances the
    *      max event time, so the watermark computed for the NEXT batch
    *      passes every open session's timeout;
    *   2. a second sentinel — the batch in which those timeouts fire
    *      (watermark updates take effect one batch after their data).
    * The sentinel user's own session never closes and is filtered out.
    */
  def sessionizeOneShot(
      spark: SparkSession,
      eventsDf: DataFrame,
      queryName: String,
      gapMinutes: Int = 30,
  ): DataFrame = {
    import spark.implicits._
    val colsInOrder = Seq("event_id", "ts", "user_id", "event_type", "value")
    val ev = eventsDf.select(colsInOrder.map(col): _*)
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val dayMs = 86400000L
    def sentinel(days: Int) =
      Seq(Event(-days.toLong, new Timestamp(maxTs.getTime + days * dayMs), -1L, "sentinel", 0.0))
        .toDF()
        .select(colsInOrder.map(col): _*)
    val dir = java.nio.file.Files.createTempDirectory(s"graft_stream_$queryName")
    Seq(ev.coalesce(1), sentinel(1), sentinel(2)).zipWithIndex.foreach { case (df, i) =>
      val scratch = java.nio.file.Files.createTempDirectory(s"graft_stream_${queryName}_$i")
      df.write.mode("overwrite").parquet(scratch.toString)
      val part = scratch.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = dir.resolve(s"$i.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      // strictly increasing mtimes pin the microbatch order (file sources
      // pick oldest-first); the written mtimes are same-millisecond often
      dst.toFile.setLastModified((i + 1) * 1000000L)
    }
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString)
    val q = sessionize(stream.as[Event], gapMinutes)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName).filter(col("user_id") >= 0)
  }

  private def writeTemp(df: DataFrame, name: String, singleFile: Boolean = false): String = {
    // unique per invocation — a fixed path would let concurrent runs
    // overwrite each other's files mid-scan
    val dir = java.nio.file.Files.createTempDirectory(s"graft_stream_$name").toString
    (if (singleFile) df.coalesce(1) else df).write.mode("overwrite").parquet(dir)
    dir
  }
}
