package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong
import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** S12: operational metrics export — the reference inserter's Prometheus
  * counter endpoint (`/root/reference/inserter/inserter.go:44-49,69-73,210`
  * exposes `insert_count` over HTTP `/metrics`), re-expressed as a
  * StreamingQueryListener feeding a JDK-only HTTP endpoint in the
  * Prometheus text exposition format. No external dependency: counters are
  * AtomicLongs updated from query-progress events; scrape cost is O(1).
  */
object FlowMetrics {

  final class Collector extends StreamingQueryListener {
    /** Rows flushed to the sink — the inserter's insert_count. Incremented
      * at the SINK (see [[FlowStreams.startMicroFlushSink]] writers /
      * `countingWriter`), which is exactly where `inserter.go:69-73` counts;
      * source-side numInputRows is unreliable for some sources (MemoryStream
      * reports 0). */
    val insertCount = new AtomicLong(0)
    val batchCount = new AtomicLong(0)    // micro-batches completed
    val queryStarts = new AtomicLong(0)

    def addInserted(n: Long): Unit = insertCount.addAndGet(n)

    /** Wrap a batch writer so flushed rows feed insert_count.
      *
      * Counting rides the writer's own action via a LongAccumulator
      * incremented in a narrow map pass — zero extra materialization (the
      * earlier cache()+count() ran every micro-batch twice). Accumulator
      * semantics are the right ones for a monitoring counter: a retried
      * task can over-report transiently, but no rows are ever missed and
      * the sink itself (e.g. the idempotent JDBC flush) stays exact. */
    def countingWriter(writer: org.apache.spark.sql.DataFrame => Unit): org.apache.spark.sql.DataFrame => Unit =
      batch => {
        val acc = batch.sparkSession.sparkContext.longAccumulator("graft_insert_rows")
        val counted = batch.mapPartitions { it =>
          it.map { r => acc.add(1L); r }
        }(org.apache.spark.sql.Encoders.row(batch.schema)).toDF()
        writer(counted)
        addInserted(acc.value)
      }

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      queryStarts.incrementAndGet()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      batchCount.incrementAndGet()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    /** Prometheus text exposition format. */
    def render: String =
      s"""# TYPE graft_insert_count counter
         |graft_insert_count ${insertCount.get}
         |# TYPE graft_batch_count counter
         |graft_batch_count ${batchCount.get}
         |# TYPE graft_query_starts counter
         |graft_query_starts ${queryStarts.get}
         |""".stripMargin
  }

  /** Register a collector on the session and serve `/metrics` on `port`
    * (0 = ephemeral; read the bound port off the returned server). Caller
    * stops the server and removes the listener. */
  def start(spark: SparkSession, port: Int = 0): (Collector, HttpServer) = {
    val collector = new Collector
    spark.streams.addListener(collector)
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/metrics", exchange => {
      val body = collector.render.getBytes(StandardCharsets.UTF_8)
      exchange.getResponseHeaders.add("Content-Type", "text/plain; version=0.0.4")
      exchange.sendResponseHeaders(200, body.length.toLong)
      val os = exchange.getResponseBody
      try os.write(body) finally os.close()
    })
    server.start()
    (collector, server)
  }

  def stop(spark: SparkSession, collector: Collector, server: HttpServer): Unit = {
    server.stop(0)
    spark.streams.removeListener(collector)
  }
}
