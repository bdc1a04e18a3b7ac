package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming forms of the event operators.
  *
  * The reference is batch-only (SURVEY §2.9); these are the streaming
  * twins of EventOps: same logical transforms declared over a
  * streaming DataFrame, executed incrementally with watermark-bounded
  * state. At scale, state lives in the state store keyed by
  * (window, event_type) / user_id — partitioned like any shuffle, so a
  * 1000-executor cluster shards state horizontally.
  */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long,
                        session_value: Double)

  case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Tumbling 1-hour windowed counts with a 10-minute watermark: late
    * events beyond the watermark are dropped and their window's state
    * evicted — bounded state regardless of stream length. Append mode
    * emits each window once, when the watermark passes its end. */
  def windowedCounts(events: DataFrame,
                     watermark: String = "10 minutes",
                     window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** The streaming windowed agg run to completion over the events
    * table as a bounded file stream — this is the driver-oracled
    * streaming query: identical output contract to the batch
    * EventOps.timeWindow (1-hour tumbling windows align to epoch
    * hours, exactly date_trunc('hour')), so it verifies against the
    * SAME DuckDB oracle. Complete mode because a bounded stream's
    * final window never passes the watermark in append mode. */
  def windowedCountsOverFiles(spark: org.apache.spark.sql.SparkSession,
                              dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // FileStreamSource wants a DIRECTORY of files (the unit a real
    // deployment tails); stage the single test parquet into one
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val name = s"graft_stream_wc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = windowedCounts(stream, watermark = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(col("window_start").as("hour_ts"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("hour_ts", "event_type")
  }

  /** Gap-based sessionization with explicit state
    * (flatMapGroupsWithState + event-time timeout): a session closes
    * when the watermark passes last-event + gap; closed sessions are
    * emitted downstream, state is dropped. The streaming twin of
    * EventOps.sessionize. */
  def sessionize(events: Dataset[Event],
                 gapMinutes: Int = 30,
                 watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // session_value totals are 2-dp inputs accumulated in double;
          // round at emit so the result matches the batch twin's
          // decimal(18,2) sum regardless of micro-batch boundaries
          def emit(s: SessionState): SessionOut =
            SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last),
              s.n, math.rint(s.total * 100) / 100)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(s))
          } else {
            // merge the batch's events into per-user sessions in event
            // order; emit every session closed by a following event,
            // keep the trailing one in state with a gap timeout
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // a late-but-in-watermark event may predate s.last
                  // (cross-batch reordering): widen the session, never
                  // shrink it — last must stay monotone or a following
                  // in-order event would see a phantom gap
                  cur = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t),
                    n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed += emit(s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
