package graft.sources.n5

import graft.n5.DatasetAttributes
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** Streaming N5 source: `spark.readStream.format("n5")` emits each block
  * file as one row when it APPEARS (or is rewritten with a newer mtime) —
  * the live-acquisition counterpart of the streaming sink, e.g. a
  * microscope writing blocks while a Spark job derives stats or
  * multiscale levels downstream.
  *
  * Offset design mirrors Spark's file source: a modification-time
  * watermark plus the set of paths AT the watermark (mtime granularity
  * means several blocks can share it). A batch is "files newer than the
  * previous watermark, minus those already seen at it" — exactly-once
  * accounting without an unbounded seen-set: the offset carries only the
  * boundary files. The snapshot backing `latestOffset` is cached and
  * keyed by the offset so `planInputPartitions` never races concurrent
  * writers; blocks are published by atomic rename, so a listed file is
  * always complete.
  */
class N5MicroBatchStream(
    root: String, dataset: String, attrs: DatasetAttributes,
    required: StructType)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  import N5MicroBatchStream._

  @transient private lazy val fs =
    new HPath(root).getFileSystem(new Configuration())

  /** (grid, mtime) of every stored block right now. */
  private def listBlocks(): Seq[(Array[Int], Long)] = {
    val base = new HPath(root, dataset)
    def digits(s: String) = s.nonEmpty && s.forall(_.isDigit)
    def walk(dir: HPath, axis: Int, prefix: List[Int]): Seq[(Array[Int], Long)] =
      if (!fs.exists(dir)) Nil
      else fs.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (!digits(name)) Nil
        else if (axis == attrs.ndim - 1) {
          if (st.isFile) Seq(((prefix :+ name.toInt).toArray,
            st.getModificationTime)) else Nil
        } else if (st.isDirectory) walk(st.getPath, axis + 1, prefix :+ name.toInt)
        else Nil
      }
    walk(base, 0, Nil)
  }

  // snapshot backing the most recent latestOffset(), so a planned batch
  // sees exactly the files its end offset described
  @volatile private var snapshot: Seq[(Array[Int], Long)] = Nil
  // Trigger.AvailableNow: the offset frozen at query start — the run
  // drains up to here and terminates, ignoring later arrivals
  @volatile private var availableNowTarget: Option[Offset] = None

  override def initialOffset(): Offset = N5SourceOffset(Long.MinValue, Nil)

  private def computeLatest(): Offset = {
    snapshot = listBlocks()
    if (snapshot.isEmpty) N5SourceOffset(Long.MinValue, Nil)
    else {
      val wm = snapshot.map(_._2).max
      N5SourceOffset(wm,
        snapshot.filter(_._2 == wm).map(_._1.mkString("/")).sorted)
    }
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(computeLatest())

  override def latestOffset(): Offset =
    availableNowTarget.getOrElse(computeLatest())

  /** Admission-control variant (SupportsTriggerAvailableNow extends
    * SupportsAdmissionControl); no rate limiting — each batch drains to
    * the target/current offset.
    */
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()

  override def deserializeOffset(json: String): Offset =
    N5SourceOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[N5SourceOffset]
    val e = end.asInstanceOf[N5SourceOffset]
    val endSet = e.atWatermark.toSet
    val seen = s.atWatermark.toSet
    // checkpoint recovery replays a committed (start, end) range without a
    // preceding latestOffset() call — re-list when the cached snapshot
    // does not cover the end offset (files past `end` are filtered out)
    val snap0 = snapshot
    val snap =
      if (e.watermark == Long.MinValue) Nil
      else if (snap0.nonEmpty && snap0.map(_._2).max >= e.watermark) snap0
      else listBlocks()
    val grids = snap.filter { case (g, m) =>
      val key = g.mkString("/")
      // within the end snapshot...
      (m < e.watermark || (m == e.watermark && endSet(key))) &&
        // ...and not already delivered by the start offset
        (m > s.watermark || (m == s.watermark && !seen(key)))
    }.map(_._1)
    if (grids.isEmpty) Array.empty
    else Array(N5BlocksPartition(root, dataset, grids.toArray))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new N5ReaderFactory(attrs, required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

object N5MicroBatchStream {
  /** Watermark offset: newest seen mtime + the block paths at that mtime. */
  final case class N5SourceOffset(watermark: Long, atWatermark: Seq[String])
      extends Offset {
    override def json(): String = {
      val files = atWatermark.map(p => "\"" + p + "\"").mkString("[", ",", "]")
      s"""{"watermark":$watermark,"atWatermark":$files}"""
    }
  }

  object N5SourceOffset {
    def fromJson(json: String): N5SourceOffset = {
      val wm = "\"watermark\":(-?\\d+)".r.findFirstMatchIn(json)
        .map(_.group(1).toLong).getOrElse(Long.MinValue)
      val files = "\"([0-9/]+)\"".r.findAllMatchIn(json)
        .map(_.group(1)).toSeq
      N5SourceOffset(wm, files)
    }
  }
}
