package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.flow.FlowMessage

/** T7 stand-in: Kafka's partitioned-topic consumption model over a
  * directory layout (no broker or Kafka connector jar in this environment).
  *
  * The reference runs the `flows` topic with 2 partitions
  * (`compose/docker-compose-clickhouse-mock.yml:18`) consumed by
  * independent groups (`inserter/inserter.go:34`,
  * `compose/clickhouse/create.sh:32`). What that buys the pipeline is a
  * CONTRACT, not an implementation: every record carries a
  * `(partition, offset)` coordinate; offsets are dense and totally ordered
  * within a partition; no order exists across partitions; consumers scale
  * by partition assignment.
  *
  * This module reproduces exactly that contract on files: a topic is a
  * directory of `partition=N` subdirectories, each file inside one is a
  * single producer payload of varint-framed protobuf records
  * (`mocker.go:95-106` wire bytes), named by its zero-padded BASE OFFSET so
  * lexicographic order is offset order. The consumer derives each record's
  * offset as base + frame ordinal — per-partition order is carried as DATA,
  * not task scheduling, which is also how Spark's real Kafka source behaves
  * the moment a shuffle intervenes. Swapping in a broker changes only the
  * two read methods (`readStream.format("kafka")` yields the same
  * partition/offset/value columns).
  *
  * Scale posture: payload files fan out across tasks (a superset of the
  * Kafka source's task-per-partition parallelism), `assign` prunes the file
  * listing to one partition directory (consumer assignment), and the
  * decode runs in the scan stage before any shuffle.
  */
object PartitionedTopic {

  /** One consumed record with its Kafka coordinates. */
  case class TopicRecord(partition: Int, offset: Long, msg: FlowMessage)

  /** Producer side: append one payload (a batch of records) to a
    * partition, returning the next base offset to use. Write-then-rename so
    * a concurrently polling consumer never lists a half-written payload.
    */
  def producePayload(dir: String, partition: Int, baseOffset: Long,
      msgs: Seq[FlowMessage]): Long = {
    require(msgs.nonEmpty, "empty payload: a Kafka produce carries >= 1 record")
    val pdir = java.nio.file.Paths.get(dir, s"partition=$partition")
    java.nio.file.Files.createDirectories(pdir)
    val bytes = msgs.iterator.flatMap(ProtoCodec.encodeDelimited).toArray
    val name = f"$baseOffset%020d.bin"
    val target = pdir.resolve(name)
    // a log APPENDS: rename onto an existing base offset would silently
    // replace already-consumed records (Linux rename(2) replaces) — refuse
    if (java.nio.file.Files.exists(target))
      throw new IllegalStateException(
        s"offset $baseOffset already produced to partition $partition — " +
          "base offsets must be the previous produce's return value")
    val tmp = pdir.resolve(s".$name.tmp")
    java.nio.file.Files.write(tmp, bytes)
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    baseOffset + msgs.size
  }

  private val payloadRe = """.*partition=(\d+)/(\d+)\.bin$""".r

  /** Path + payload bytes → records with coordinates. Always throws on a
    * path that is not a partitioned payload (a misattributed partition id
    * corrupts ordering silently); `lenient` applies only to the payload
    * BYTES — a malformed/truncated payload is dropped whole (same
    * dead-letter posture and rationale as [[ProtoCodec.fromWire]]: past
    * the first bad frame no boundary can be trusted, and the dropped
    * offsets stay visible as a per-partition gap for monitoring). */
  def decodePayload(path: String, content: Array[Byte],
      lenient: Boolean = false): Seq[TopicRecord] =
    path match {
      case payloadRe(p, base) =>
        val msgs =
          if (lenient)
            try ProtoCodec.decodeDelimitedStream(content)
            catch {
              case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException =>
                Nil
            }
          else ProtoCodec.decodeDelimitedStream(content)
        msgs.zipWithIndex.map {
          case (m, i) => TopicRecord(p.toInt, base.toLong + i, m)
        }
      case _ => throw new IllegalArgumentException(
        s"not a partition=N/<base-offset>.bin payload path: $path")
    }

  // binaryFile's fixed 4-column shape; recursiveFileLookup below disables
  // directory-partition inference so batch and streaming see the same schema
  private val fileSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
  }

  private def topicPath(dir: String, assign: Option[Int]): String =
    assign.fold(dir)(p => s"$dir/partition=$p")

  /** Batch consumer. `assign` restricts to one partition (Kafka
    * `Consumer.assign`) and prunes at the FILE LISTING — unassigned
    * partitions are never opened. */
  def read(spark: SparkSession, dir: String, assign: Option[Int] = None,
      lenient: Boolean = false): Dataset[TopicRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").schema(fileSchema)
      .option("recursiveFileLookup", "true")
      .load(topicPath(dir, assign))
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, c) => decodePayload(p, c, lenient) }
  }

  /** Streaming consumer: new payload files are new micro-batch input; the
    * file-source checkpoint replaces Kafka's committed offsets (same
    * exactly-once story as [[ProtoCodec.binaryFileStream]]). */
  def readStream(spark: SparkSession, dir: String, assign: Option[Int] = None,
      options: Map[String, String] = Map.empty,
      lenient: Boolean = false): Dataset[TopicRecord] = {
    import spark.implicits._
    spark.readStream.format("binaryFile").schema(fileSchema)
      .option("recursiveFileLookup", "true")
      .options(options)
      .load(topicPath(dir, assign))
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, c) => decodePayload(p, c, lenient) }
  }
}
