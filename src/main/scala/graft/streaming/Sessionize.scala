package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Sessionization — the canonical custom-state streaming operator
  * (`flatMapGroupsWithState`, SURVEY.md §2.8): group events per user into
  * sessions separated by >30-minute gaps.
  *
  * Two implementations with identical close-session semantics:
  *  - batch: window lag + cumulative gap count — one shuffle on user_id,
  *    SQL-expressible, DuckDB-oracle-checked;
  *  - streaming: `flatMapGroupsWithState` keeping one open session per user,
  *    emitting a session whenever a gap closes it. Open (last) sessions are
  *    never emitted by either path, so the outputs agree row-for-row — the
  *    batch query doubles as the streaming oracle (asserted in tests).
  */
object Sessionize {

  val GapMinutes = 30L

  /** Batch sessionization: session id = running count of >gap boundaries per
    * user; emitted sessions exclude each user's open (last) session. */
  def batchSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapMicros = GapMinutes * 60L * 1000000L
    val sessions = Tables.events(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      // microsecond-precise gap: must match the streaming variant exactly
      // (second-truncated diffs disagree near the 30-min boundary)
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > gapMicros, 1)
          .otherwise(0))
      .withColumn("sess_no", sum($"new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess_no")
      .agg(
        min($"ts").as("sess_start"),
        max($"ts").as("sess_end"),
        count(lit(1)).as("n_events"))
    val lastSess = sessions.groupBy($"user_id")
      .agg(max($"sess_no").as("open_sess"))
    sessions.join(lastSess, "user_id")
      .filter($"sess_no" < $"open_sess")   // open session never emits
      .select($"user_id", $"sess_no".cast("int").as("sess_no"),
        $"sess_start", $"sess_end", $"n_events")
  }

  val batchSessionsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |         LAG(CAST(ts AS TIMESTAMP), 1) OVER w AS prev_ts
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL
       |                   OR epoch_us(ts) - epoch_us(prev_ts) > ${GapMinutes * 60000000}
       |                 THEN 1 ELSE 0 END AS new_sess
       |  FROM e),
       |numbered AS (
       |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
       |  FROM flagged),
       |sessions AS (
       |  SELECT user_id, sess_no, min(ts) AS sess_start, max(ts) AS sess_end,
       |         count(*) AS n_events
       |  FROM numbered GROUP BY user_id, sess_no)
       |SELECT user_id, CAST(sess_no AS INTEGER) AS sess_no, sess_start, sess_end, n_events
       |FROM sessions s
       |WHERE sess_no < (SELECT max(sess_no) FROM sessions m WHERE m.user_id = s.user_id)""".stripMargin

  // ---- streaming variant ----

  case class Ev(user_id: Long, event_id: Long, tsMicros: Long)
  case class SessState(
      startMicros: Long, endMicros: Long, n: Long, sessNo: Int)
  /** Emitted closed session (timestamps in µs, converted on output). */
  case class Session(
      user_id: Long, sess_no: Int, sess_start: java.sql.Timestamp,
      sess_end: java.sql.Timestamp, n_events: Long)

  /** µs → Timestamp keeping full microsecond precision (the plain ms
    * constructor would truncate and break parity with the batch query). */
  private def microsToTs(micros: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp((micros / 1000000L) * 1000L)
    t.setNanos(((micros % 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming sessionization over the events replay: one `SessState` per
    * user in the state store; a session is emitted when the next event
    * arrives more than the gap after it ends. State is O(users), not
    * O(events) — the 100 TB posture for stateful streams.
    *
    * Ordering contract: events are sorted (ts, event_id) WITHIN each
    * micro-batch; ACROSS batches the file replay must be non-decreasing in
    * event time at session granularity (time-partitioned ingest — the normal
    * layout for event logs; property-tested with a 2-file time-split). An
    * event that lands inside the open session's [start, end] bounds is
    * absorbed without corrupting them (min/max guards below); an event older
    * than a closed gap boundary would still start a spurious session — full
    * disorder tolerance needs watermark-buffered state, which trades away
    * the emit-on-gap latency this operator exists for. */
  def streamSessions(s: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import s.implicits._
    val gapMicros = GapMinutes * 60L * 1000000L

    val reader = s.readStream.schema(graft.Tables.eventsRawSchema(s, dir))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    val events = graft.Tables.normalizeTs(reader.parquet(s"$dir/[e]vents.parquet"))
      .select($"user_id", $"event_id", unix_micros($"ts").as("tsMicros"))
      .as[Ev]

    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          // events within a micro-batch arrive unordered: sort this chunk
          // (cross-batch order is the file replay order, which is ts-ordered)
          val sorted = evs.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          val out = scala.collection.mutable.ListBuffer.empty[Session]
          var st = state.getOption.getOrElse(SessState(-1L, -1L, 0L, 0))
          sorted.foreach { e =>
            if (st.n == 0L) {
              st = SessState(e.tsMicros, e.tsMicros, 1L, 1)
            } else if (e.tsMicros - st.endMicros > gapMicros) {
              out += Session(user, st.sessNo,
                microsToTs(st.startMicros), microsToTs(st.endMicros), st.n)
              st = SessState(e.tsMicros, e.tsMicros, 1L, st.sessNo + 1)
            } else {
              // min/max guards: a cross-batch straggler landing inside (or
              // before) the open session's bounds must not move the end
              // backwards or the start forwards
              st = st.copy(
                startMicros = math.min(st.startMicros, e.tsMicros),
                endMicros = math.max(st.endMicros, e.tsMicros), n = st.n + 1)
            }
          }
          state.update(st)
          out.iterator
      }

    StreamingOps.runToParquet(s, sessions.toDF(), "graft_sessions", mode = "append")
  }

  // ---- native session_window variants (compose-built-ins tier) ----

  /** Batch sessionization via the built-in `session_window` aggregate —
    * the preferred "compose existing ops" form next to the custom-state
    * `flatMapGroupsWithState` twin above. Window end is exclusive:
    * last event + gap. */
  def sessionWindowBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.events(s, dir)
      .groupBy($"user_id", session_window($"ts", s"$GapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("sess_start"), $"w.end".as("sess_end"),
        $"n_events")
  }

  private val sessionWindowSqlCore =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |         LAG(CAST(ts AS TIMESTAMP), 1) OVER w AS prev_ts
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL
       |                   OR epoch_us(ts) - epoch_us(prev_ts) > ${GapMinutes * 60000000}
       |                 THEN 1 ELSE 0 END AS new_sess
       |  FROM e),
       |numbered AS (
       |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
       |  FROM flagged),
       |sessions AS (
       |  SELECT user_id, min(ts) AS sess_start,
       |         max(ts) + INTERVAL ${GapMinutes} MINUTE AS sess_end,
       |         count(*) AS n_events
       |  FROM numbered GROUP BY user_id, sess_no)""".stripMargin

  val sessionWindowBatchSql: String =
    s"""$sessionWindowSqlCore
       |SELECT user_id, sess_start, sess_end, n_events FROM sessions""".stripMargin

  /** Streaming sessionization via native `session_window` + watermark in
    * append mode: sessions emit once the event-time watermark passes their
    * (exclusive) end. The oracle mirrors the emission rule literally:
    * sess_end < max(ts) - watermark delay. */
  def sessionWindowStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = graft.Tables.normalizeTs(
      s.readStream.schema(graft.Tables.eventsRawSchema(s, dir))
        .parquet(s"$dir/[e]vents.parquet"))
      .withWatermark("ts", "2 hours")
      .groupBy($"user_id", session_window($"ts", s"$GapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("sess_start"), $"w.end".as("sess_end"),
        $"n_events")
    StreamingOps.runToParquet(s, agg, "graft_sess_win", mode = "append")
  }

  val sessionWindowStreamSql: String =
    s"""$sessionWindowSqlCore
       |SELECT user_id, sess_start, sess_end, n_events FROM sessions
       |WHERE sess_end < (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL 2 HOUR FROM events)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sessionize" -> ((s, d) => batchSessions(s, d)),
    "q_stream_sessions" -> ((s, d) => streamSessions(s, d)),
    "q_session_window" -> ((s, d) => sessionWindowBatch(s, d)),
    "q_stream_session_window" -> ((s, d) => sessionWindowStream(s, d)),
  )

  val oracle: Map[String, String] = Map(
    "q_sessionize" -> batchSessionsSql,
    // the streaming variant has the same semantics; its µs timestamps lose
    // sub-µs precision in java.sql.Timestamp (ms) + nanos, so it is checked
    // against the batch query in ScalaTest instead of the SQL oracle
    "q_stream_sessions" -> batchSessionsSql,
    "q_session_window" -> sessionWindowBatchSql,
    "q_stream_session_window" -> sessionWindowStreamSql,
  )
}
