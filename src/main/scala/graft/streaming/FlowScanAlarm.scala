package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Real-time port-scan alarms over the flow stream — the streaming twin of
  * the batch fan-out screen ([[graft.flow.FlowQueries.portScan]]): keyed by
  * (source address, tumbling window), an alarm fires the FIRST time a
  * source touches `minPorts` distinct destination ports inside the window.
  * The reference pipeline has no alerting path (its consumers are
  * dashboards); this is the stateful extension point the Spark engine adds
  * on top, in the same family as [[FlowSessions]].
  *
  * Scale contract — state is bounded by construction, not by hope:
  *  - per active (src, window) key the state holds at most `minPorts`
  *    distinct ports: the set grows only until the threshold crossing,
  *    then collapses to a 1-bit `fired` marker that absorbs the rest of
  *    the window without re-firing;
  *  - event-time timeout at window end (+ the watermark's lateness) GCs
  *    every key, so the store size is O(active sources × windows in the
  *    lateness horizon), independent of stream length;
  *  - each micro-batch emits at most ONE alarm per key, ever (exactly-once
  *    alert semantics under checkpoint replay come from the sink contract,
  *    same as every Append-mode operator here).
  *
  * Alarm-set parity with the batch screen is exact: a (src, window) fires
  * iff its batch distinct-port count reaches `minPorts` (the spec proves
  * set equality). `fired_at` is the event time of the observation that
  * completed the threshold in ARRIVAL order — a late pre-crossing record
  * admitted by the watermark can mean a hypothetical global-order replay
  * would have crossed earlier; the alarm identity, not its timestamp, is
  * the cross-engine-stable output.
  */
object FlowScanAlarm {

  /** One keyed port observation. `event_time` mirrors `timeReceived` so
    * the watermark column stays in the plan feeding
    * flatMapGroupsWithState. */
  final case class PortObs(src: String, window_start: Long, port: Int, ts: Long,
      event_time: java.sql.Timestamp)

  /** Bounded per-key state: the distinct ports seen so far (≤ minPorts),
    * or the post-crossing marker. */
  final case class ScanState(ports: Set[Int], fired: Boolean)

  /** Emitted alarm: the window's identity plus the crossing instant. */
  final case class ScanAlarm(src: String, window_start: Long, n_ports: Int, fired_at: Long)

  /** Key a flow-schema DataFrame for scan screening. */
  def keyed(df: DataFrame, windowSeconds: Long): Dataset[PortObs] = {
    import df.sparkSession.implicits._
    df.select(
      hex(col("srcAddr")).as("src"),
      (expr(s"timeReceived div $windowSeconds") * windowSeconds).as("window_start"),
      col("dstPort").cast("int").as("port"),
      col("timeReceived").as("ts"),
      timestamp_seconds(col("timeReceived")).as("event_time"))
      .as[PortObs]
  }

  /** Alarm stream over a STREAMING flow DataFrame. */
  def alarms(stream: DataFrame, windowSeconds: Long = 3600, minPorts: Int = 5,
      lateness: String = "10 minutes"): Dataset[ScanAlarm] = {
    import stream.sparkSession.implicits._
    keyed(stream, windowSeconds)
      .withWatermark("event_time", lateness)
      .groupByKey(o => (o.src, o.window_start))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (String, Long), it: Iterator[PortObs], state: GroupState[ScanState]) => {
          if (state.hasTimedOut) {
            // window closed below the threshold (or fired long ago):
            // alarms are emitted at crossing time, nothing to add here
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(ScanState(Set.empty, fired = false))
            val out =
              if (st.fired) {
                // already alarmed this window: absorb silently, no re-fire
                state.update(st)
                Iterator.empty[ScanAlarm]
              } else {
                // Bounded replay of the (ts, port)-sorted crossing WITHOUT
                // materializing the batch: only the `need` earliest
                // first-occurrences of NEW distinct ports can decide the
                // crossing, so keep a size-capped map port -> min (ts).
                // Evicting the max (ts, port) entry from a full map is
                // safe: at eviction `need` entries precede it and entries
                // only shrink, so a reinsertion obs must be below the
                // current max — i.e. below every value the port ever held —
                // making the kept value the true running minimum. Memory is
                // O(minPorts) per key per batch, never O(batch).
                val need = minPorts - st.ports.size
                val firstSeen = scala.collection.mutable.Map.empty[Int, Long]
                it.foreach { o =>
                  if (!st.ports.contains(o.port)) {
                    firstSeen.get(o.port) match {
                      case Some(ts0) => if (o.ts < ts0) firstSeen.update(o.port, o.ts)
                      case None if firstSeen.size < need => firstSeen.update(o.port, o.ts)
                      case None =>
                        // full: admit only if strictly below the max (ts, port)
                        var mp = -1; var mt = Long.MinValue
                        firstSeen.foreach { case (p, t) =>
                          if (t > mt || (t == mt && p > mp)) { mp = p; mt = t }
                        }
                        if (o.ts < mt || (o.ts == mt && o.port < mp)) {
                          firstSeen.remove(mp); firstSeen.update(o.port, o.ts)
                        }
                    }
                  }
                }
                var ports = st.ports
                var firedAt = -1L
                firstSeen.toSeq.sortBy { case (p, t) => (t, p) }.foreach { case (p, t) =>
                  if (firedAt < 0) {
                    ports += p
                    if (ports.size >= minPorts) firedAt = t
                  }
                }
                if (firedAt >= 0) {
                  // collapse the set: the marker is all later batches need
                  state.update(ScanState(Set.empty, fired = true))
                  Iterator.single(ScanAlarm(key._1, key._2, minPorts, firedAt))
                } else {
                  state.update(ScanState(ports, fired = false))
                  Iterator.empty[ScanAlarm]
                }
              }
            // GC once the watermark passes window end — late data beyond
            // the lateness horizon is dropped by the watermark anyway
            state.setTimeoutTimestamp((key._2 + windowSeconds) * 1000L)
            out
          }
        })
  }

  /** Batch reference — the oracle for the streaming alarm SET: every
    * (src, window) whose distinct destination-port count reaches
    * `minPorts`. */
  def alarmsBatch(df: DataFrame, windowSeconds: Long = 3600, minPorts: Int = 5): DataFrame =
    keyed(df, windowSeconds).toDF()
      .groupBy("src", "window_start")
      .agg(countDistinct(col("port")).as("distinct_ports"))
      .filter(col("distinct_ports") >= minPorts)
}
