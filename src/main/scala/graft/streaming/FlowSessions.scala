package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful session stitching over the flow stream (T5 upgrade): NetFlow
  * exporters split one logical transport session into many flow records
  * (active/inactive timeout splits); this operator re-assembles them with
  * `flatMapGroupsWithState` — keyed by the transport 5-tuple, a session
  * absorbs records until `gapSeconds` of event-time silence, then emits one
  * summary row. The reference pipeline has no equivalent (its rollups are
  * time-bucketed only); this is the custom-state extension point the Spark
  * engine adds on top.
  *
  * Scale: state is one fixed-size record per ACTIVE 5-tuple; event-time
  * timeout + watermark GC closed sessions, so the state store is bounded by
  * concurrent-session cardinality, not stream length. Input records are
  * reduced per micro-batch before touching state.
  */
object FlowSessions {

  /** One flow observation, pre-keyed. `event_time` mirrors `ts` as a
    * timestamp — the watermark column must stay in the plan feeding
    * flatMapGroupsWithState for event-time timeouts to be allowed. */
  final case class FlowObs(key: String, ts: Long, bytes: Long, packets: Long,
      event_time: java.sql.Timestamp)

  /** Accumulating session state. */
  final case class SessionState(start: Long, end: Long, bytes: Long, packets: Long, flows: Long)

  /** Emitted closed session. */
  final case class FlowSession(key: String, start: Long, end: Long,
      bytes: Long, packets: Long, flows: Long, duration: Long)

  /** Key a flow-schema DataFrame by the transport 5-tuple. */
  def keyed(df: DataFrame): Dataset[FlowObs] = {
    import df.sparkSession.implicits._
    df.select(
      concat_ws("|", hex(col("srcAddr")), hex(col("dstAddr")),
        col("srcPort"), col("dstPort"), col("proto")).as("key"),
      col("timeReceived").as("ts"),
      col("bytes"), col("packets"),
      timestamp_seconds(col("timeReceived")).as("event_time"))
      .as[FlowObs]
  }

  private def mergeBatch(key: String, obs: Seq[FlowObs], prior: Option[SessionState],
      gapSeconds: Long): (List[FlowSession], Option[SessionState]) = {
    val sorted = obs.sortBy(_.ts)
    var closed = List.empty[FlowSession]
    // observations older than the live session's era by more than the gap:
    // their own (already-closed) sessions. State for their era is gone — an
    // inherent watermark-bounded divergence from the full-data batch
    // oracle — but several of them within gapSeconds of one another must
    // still merge into ONE session (r7 advisory: emitting each as a
    // singleton diverged more than the lost-state minimum requires)
    var stale = List.empty[FlowObs] // built in descending ts (prepend of sorted input)
    var cur = prior
    sorted.foreach { o =>
      cur match {
        case Some(s) if o.ts >= s.start - gapSeconds && o.ts <= s.end + gapSeconds =>
          // within the session's gap envelope on EITHER side: a late
          // cross-batch observation may precede the recorded start, and
          // the start must lower with it (the r7 review caught the old
          // merge keeping start=2000 for a merged ts=1000 — a session
          // containing bytes from before its own start)
          cur = Some(SessionState(math.min(s.start, o.ts), math.max(s.end, o.ts),
            s.bytes + o.bytes, s.packets + o.packets, s.flows + 1))
        case Some(s) if o.ts > s.end + gapSeconds =>
          closed ::= FlowSession(key, s.start, s.end, s.bytes, s.packets, s.flows, s.end - s.start)
          cur = Some(SessionState(o.ts, o.ts, o.bytes, o.packets, 1))
        case Some(_) =>
          stale ::= o
        case None =>
          cur = Some(SessionState(o.ts, o.ts, o.bytes, o.packets, 1))
      }
    }
    // the same gap merge the live path runs, applied locally to the stale
    // observations (ascending ts): only genuinely gap-separated late data
    // becomes separate sessions
    var staleSessions = List.empty[FlowSession]
    var s: Option[SessionState] = None
    stale.reverse.foreach { o =>
      s match {
        case Some(st) if o.ts <= st.end + gapSeconds =>
          s = Some(SessionState(st.start, math.max(st.end, o.ts),
            st.bytes + o.bytes, st.packets + o.packets, st.flows + 1))
        case other =>
          other.foreach(st => staleSessions ::=
            FlowSession(key, st.start, st.end, st.bytes, st.packets, st.flows, st.end - st.start))
          s = Some(SessionState(o.ts, o.ts, o.bytes, o.packets, 1))
      }
    }
    s.foreach(st => staleSessions ::=
      FlowSession(key, st.start, st.end, st.bytes, st.packets, st.flows, st.end - st.start))
    // staleness was judged against the live start AS IT EVOLVED: a later
    // observation may have lowered that start to within gapSeconds of a
    // "stale" session (r8 review). The state to merge them is present, so
    // fold envelope-adjacent stale sessions into the live session instead
    // of emitting them separately — to a FIXPOINT (r9 advisory): each
    // merge lowers the envelope start, which could make a stale session
    // already judged separate adjacent. Today that cascade is actually
    // unreachable — consecutive stale sessions are > gapSeconds apart by
    // construction, and a fold lowers the start exactly to the absorbed
    // session's start — but the one-shot partition encoded that invariant
    // silently. One pass in descending end order IS the fixpoint
    // regardless: sessions attach only at the envelope's lower edge, and
    // a later-ending session's merge lowers the start before any
    // earlier-ending session is tested.
    val (emitted, finalCur) = cur match {
      case Some(st) =>
        var acc = st
        var separate = List.empty[FlowSession]
        staleSessions.sortBy(x => (-x.end, -x.start)).foreach { x =>
          if (x.end >= acc.start - gapSeconds && x.start <= acc.end + gapSeconds)
            acc = SessionState(
              math.min(acc.start, x.start), math.max(acc.end, x.end),
              acc.bytes + x.bytes, acc.packets + x.packets, acc.flows + x.flows)
          else separate ::= x
        }
        (separate, Some(acc))
      case None => (staleSessions, None)
    }
    (emitted reverse_::: closed.reverse, finalCur)
  }

  /** Sessionize a STREAMING flow DataFrame. Emits a `FlowSession` row when a
    * 5-tuple sees `gapSeconds` of event-time silence (enforced via
    * event-time timeout once the watermark passes session end + gap). */
  def sessionize(stream: DataFrame, gapSeconds: Long = 300,
      lateness: String = "10 minutes"): Dataset[FlowSession] = {
    import stream.sparkSession.implicits._
    keyed(stream)
      .withWatermark("event_time", lateness)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, it: Iterator[FlowObs], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(FlowSession(key, s.start, s.end, s.bytes, s.packets, s.flows, s.end - s.start))
          } else {
            val (closed, cur) = mergeBatch(key, it.toSeq, state.getOption, gapSeconds)
            cur match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp((s.end + gapSeconds) * 1000L)
              case None => state.remove()
            }
            closed.iterator
          }
        })
  }

  /** The gap-sessionization window over any pre-keyed
    * `(key, ts, bytes, packets)` relation — the ONE copy of the
    * lag + prefix-sum algorithm; [[sessionizeBatch]] and the registry's
    * `flow_sessions` query ([[graft.flow.FlowQueries.sessions]]) both
    * build on it, so the two surfaces cannot drift. Output columns:
    * `key, start, end, bytes, packets, flows, duration`. */
  def gapSessions(obs: DataFrame, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy("ts")
    obs
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts") > col("prev_ts") + gapSeconds, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("key", "session_id")
      .agg(min("ts").as("start"), max("ts").as("end"),
        sum("bytes").as("bytes"), sum("packets").as("packets"), count(lit(1)).as("flows"))
      .withColumn("duration", col("end") - col("start"))
      .drop("session_id")
  }

  /** Batch reference implementation — the oracle for the streaming path:
    * classic gap-based sessionization via a lag window. */
  def sessionizeBatch(df: DataFrame, gapSeconds: Long = 300): DataFrame =
    gapSessions(keyed(df).toDF(), gapSeconds)
}
