package graft.sources.n5

import java.util

import graft.n5._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.{streaming => swrite}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for the N5 chunked-array format — the engine's
  * core novel piece (SURVEY §7 Phase 2-3; reference read/write semantics:
  * `n5_utils.py:6-18`, `n5_utils.py:21-33`).
  *
  * Read: `spark.read.format("n5").option("dataset", "mri/c0/s0").load(root)`
  * yields one row per stored block:
  * (gx,gy,gz INT, x0,y0,z0 LONG, shape ARRAY<INT>, data ARRAY<elem>), with
  * unsigned dtypes widened (uint8→SHORT, uint16→INT, uint32→LONG).
  *
  * Scale design:
  *  - one InputPartition per block file → a 1000-executor cluster reads a
  *    100 TB volume with full parallelism and no driver bottleneck beyond
  *    the block listing (listing is one RPC per grid directory);
  *  - grid predicates (gx/gy/gz =, <, >, IN, ranges) are pushed down and
  *    prune block files BEFORE any I/O — a box read touches only
  *    intersecting chunks, exactly like the reference's zarr slicing
  *    (`n5_to_tif.py:26`);
  *  - column pruning skips payload decode entirely for metadata-only
  *    queries (block counts, grid scans).
  *
  * Write: `df.write.format("n5").option(...)` with rows
  * (gx,gy,gz,shape,data). Blocks are write-disjoint by grid position
  * (Spark partitions never share a block), writes are idempotent blind
  * overwrites (task retry safe — same semantics as `ometif_to_n5.py:205`),
  * and attributes.json is committed AFTER the data by the driver, fixing
  * the reference's metadata-before-data wart (`n5_multiscale.py:133`).
  */
class N5DataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "n5"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = options.get("path")
    val dataset = options.getOrDefault("dataset", "")
    val elementsView = options.getOrDefault("view", "blocks") == "elements"
    if (root != null && options.containsKey("dataset")) {
      val attrs = N5Meta.datasetAttributes(root, dataset)
      if (elementsView) N5Schema.elementSchema(attrs.dataType)
      else N5Schema.blockSchema(attrs.dataType)
    } else {
      // write-only usage where attrs come from options
      N5Schema.blockSchema(
        Dtype.fromName(options.getOrDefault("dataType", "uint8")))
    }
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new N5Table(new CaseInsensitiveStringMap(properties), schema)

  override def supportsExternalMetadata(): Boolean = true
}

object N5Schema {
  def elementType(d: Dtype): DataType = d match {
    case Dtype.UInt8 => ShortType
    case Dtype.Int8 => ByteType
    case Dtype.UInt16 => IntegerType
    case Dtype.Int16 => ShortType
    case Dtype.UInt32 => LongType
    case Dtype.Int32 => IntegerType
    case Dtype.UInt64 | Dtype.Int64 => LongType
    case Dtype.Float32 => FloatType
    case Dtype.Float64 => DoubleType
  }

  def blockSchema(d: Dtype): StructType = StructType(Seq(
    StructField("gx", IntegerType, nullable = false),
    StructField("gy", IntegerType, nullable = false),
    StructField("gz", IntegerType, nullable = false),
    StructField("x0", LongType, nullable = false),
    StructField("y0", LongType, nullable = false),
    StructField("z0", LongType, nullable = false),
    StructField("shape", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("data", ArrayType(elementType(d), containsNull = false), nullable = false)))

  /** Schema of the columnar per-element view (`option("view","elements")`):
    * one row per voxel, emitted as ColumnarBatches directly from the
    * decoded block payload — no posexplode generator, no per-row boxing.
    */
  def elementSchema(d: Dtype): StructType = StructType(Seq(
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false),
    StructField("z", LongType, nullable = false),
    StructField("v", elementType(d), nullable = false)))
}

class N5Table(options: CaseInsensitiveStringMap, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {

  private def root: String = options.get("path")
  private def dataset: String = options.getOrDefault("dataset", "")

  /** Dataset attributes for planner-side rules (None for write-only tables
    * whose attributes.json does not exist yet).
    */
  private[graft] lazy val readAttributes: Option[DatasetAttributes] =
    scala.util.Try(N5Meta.datasetAttributes(root, dataset)).toOption

  override def name(): String = s"n5:`$root`/$dataset"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val attrs = N5Meta.datasetAttributes(root, dataset)
    // merge table options (load-time) over scan options
    val merged = new java.util.HashMap[String, String]()
    o.forEach((k, v) => merged.put(k, v))
    options.forEach((k, v) => merged.put(k, v))
    new N5ScanBuilder(root, dataset, attrs, new CaseInsensitiveStringMap(merged))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new N5WriteBuilder(root, dataset, options, info)
}

// ---------------------------------------------------------------- read path

class N5ScanBuilder(
    root: String, dataset: String, attrs: DatasetAttributes,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val elementsView = options.getOrDefault("view", "blocks") == "elements"
  if (elementsView) require(attrs.ndim == 3,
    s"view=elements requires a 3-D dataset, got ${attrs.ndim}-D")

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType =
    if (elementsView) N5Schema.elementSchema(attrs.dataType)
    else N5Schema.blockSchema(attrs.dataType)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, _) = filters.partition(
      if (elementsView) isElementFilter else isGridFilter)
    pushed = supported
    // we only PRUNE with them; Spark re-evaluates everything for safety
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  private def isGridFilter(f: Filter): Boolean = f match {
    case EqualTo(a, _) => Set("gx", "gy", "gz")(a)
    case GreaterThan(a, _) => Set("gx", "gy", "gz")(a)
    case GreaterThanOrEqual(a, _) => Set("gx", "gy", "gz")(a)
    case LessThan(a, _) => Set("gx", "gy", "gz")(a)
    case LessThanOrEqual(a, _) => Set("gx", "gy", "gz")(a)
    case In(a, _) => Set("gx", "gy", "gz")(a)
    case _ => false
  }

  /** Coordinate predicates on the element view prune block FILES the same
    * way grid predicates prune the block view (conservative per-axis
    * block-range test; row-level trim is re-applied by Spark).
    */
  private def isElementFilter(f: Filter): Boolean = f match {
    case EqualTo(a, _) => Set("x", "y", "z")(a)
    case GreaterThan(a, _) => Set("x", "y", "z")(a)
    case GreaterThanOrEqual(a, _) => Set("x", "y", "z")(a)
    case LessThan(a, _) => Set("x", "y", "z")(a)
    case LessThanOrEqual(a, _) => Set("x", "y", "z")(a)
    case In(a, _) => Set("x", "y", "z")(a)
    case _ => false
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new N5Scan(root, dataset, attrs, pushed, required,
      targetBytes = options.getOrDefault(
        "targetPartitionBytes", N5Scan.DefaultTargetPartitionBytes.toString).toLong,
      maxBlocksPerPartition = options.getOrDefault(
        "maxBlocksPerPartition", Long.MaxValue.toString).toLong,
      maxBlocksPerBatch = options.getOrDefault(
        "maxBlocksPerBatch", "0").toInt,
      elementsView = elementsView,
      elementBatchRows = {
        val n = options.getOrDefault("elementBatchRows", "16384").toInt
        // 0 would make the reader emit empty batches forever
        require(n > 0, s"elementBatchRows must be positive, got $n")
        n
      })
}

object N5Scan {
  /** ~decoded bytes per scan partition (targetPartitionBytes option). */
  val DefaultTargetPartitionBytes: Long = 128L * 1024 * 1024

  /** Group blocks into partitions of ~targetBytes decoded payload.
    * One-partition-per-block would mean tens of millions of tasks on a
    * 100 TB volume; grouping keeps task count = volume size / target,
    * while the walk order preserves grid locality within a task. Shared
    * by the batch scan and the streaming source's batch planning.
    */
  def groupIntoPartitions(
      root: String, dataset: String, grids: Seq[Array[Int]],
      attrs: DatasetAttributes, targetBytes: Long,
      maxBlocksPerPartition: Long = Long.MaxValue): Array[InputPartition] = {
    val blockBytes = math.max(1L,
      attrs.blockSize.map(_.toLong).product * attrs.dataType.bytesPerElement)
    val perPartition = math.min(Int.MaxValue.toLong, math.max(1L,
      math.min(maxBlocksPerPartition, targetBytes / blockBytes))).toInt
    attrs.shard match {
      case Some(_) =>
        // sharded v3 (r19): grids arrive shard-by-shard from the walk;
        // cut partitions only at shard BOUNDARIES so a shard's inner
        // chunks share one reader, whose ShardReadState then opens +
        // index-reads each shard exactly once per scan
        val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
        val cur = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
        var curShard: Seq[Int] = null
        def flush(): Unit = if (cur.nonEmpty) {
          parts += N5BlocksPartition(root, dataset, cur.toArray)
          cur.clear()
        }
        grids.foreach { g =>
          val sg = attrs.shardGrid(g).toSeq
          if (sg != curShard) {
            if (cur.length >= perPartition) flush()
            curShard = sg
          }
          cur += g
        }
        flush()
        parts.toArray
      case None =>
        grids.grouped(perPartition)
          .map(gs => N5BlocksPartition(root, dataset, gs.toArray): InputPartition)
          .toArray
    }
  }
}

/** Per-axis evaluation of pushed gx/gy/gz filters — shared by the batch
  * scan's pruned directory walk and the streaming source.
  */
object N5GridFilters {
  private val axes = Array("gx", "gy", "gz")

  def asInt(v: Any): Int = v match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case o => o.toString.toInt
  }

  /** True when grid value v on `axis` satisfies every pushed filter
    * (null comparison values: keep — same policy as elementAxisOk).
    */
  def axisOk(filters: Array[Filter])(axis: Int, v: Int): Boolean =
    filters.forall {
      case EqualTo(a, x) if a == axes(axis) && x != null => v == asInt(x)
      case GreaterThan(a, x) if a == axes(axis) && x != null => v > asInt(x)
      case GreaterThanOrEqual(a, x) if a == axes(axis) && x != null => v >= asInt(x)
      case LessThan(a, x) if a == axes(axis) && x != null => v < asInt(x)
      case LessThanOrEqual(a, x) if a == axes(axis) && x != null => v <= asInt(x)
      case In(a, xs) if a == axes(axis) && xs.forall(_ != null) =>
        xs.map(asInt).contains(v)
      case _ => true
    }

  private val elemAxes = Array("x", "y", "z")

  def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case o => o.toString.toLong
  }

  /** Conservative block-level test of pushed ELEMENT-coordinate filters:
    * keep grid position g on `axis` when the block's untrimmed coordinate
    * range [g·bs, (g+1)·bs) can satisfy every filter. May keep an edge
    * block a trimmed shape would exclude — Spark re-applies the row-level
    * predicate, so pruning only has to be sound, not exact.
    */
  def elementAxisOk(
      filters: Array[Filter], blockSize: Array[Int])(axis: Int, g: Int): Boolean = {
    val bs = blockSize(axis).toLong
    val lo = g * bs
    val hi = (g + 1) * bs - 1
    // null comparison values (e.g. isin(5, null) arrives as In with a null
    // member) cannot be pruned on — treat the affected filter as
    // non-restrictive (keep the block; Spark re-evaluates row-level)
    filters.forall {
      case EqualTo(a, x) if a == elemAxes(axis) && x != null =>
        val v = asLong(x); v >= lo && v <= hi
      case GreaterThan(a, x) if a == elemAxes(axis) && x != null => hi > asLong(x)
      case GreaterThanOrEqual(a, x) if a == elemAxes(axis) && x != null => hi >= asLong(x)
      case LessThan(a, x) if a == elemAxes(axis) && x != null => lo < asLong(x)
      case LessThanOrEqual(a, x) if a == elemAxes(axis) && x != null => lo <= asLong(x)
      case In(a, xs) if a == elemAxes(axis) && xs.forall(_ != null) =>
        xs.exists(x => { val v = asLong(x); v >= lo && v <= hi })
      case _ => true
    }
  }
}

/** The grid-directory walk shared by the batch scan and the streaming
  * source: digit-named tree traversal applying the per-axis predicate
  * DURING descent (a pruned gx subtree is never listed), yielding
  * (grid, modificationTime) per stored block file.
  */
object N5GridWalk {
  def list(
      fs: FileSystem, base: HPath, ndim: Int,
      axisOk: (Int, Int) => Boolean): Seq[(Array[Int], Long)] = {
    def digits(s: String) = s.nonEmpty && s.forall(_.isDigit)
    def walk(dir: HPath, axis: Int, prefix: List[Int]): Seq[(Array[Int], Long)] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (!digits(name)) Nil
        else {
          val v = name.toInt
          if (!axisOk(axis, v)) Nil
          else if (axis == ndim - 1) {
            if (st.isFile) Seq(((prefix :+ v).toArray, st.getModificationTime))
            else Nil
          } else if (st.isDirectory) walk(st.getPath, axis + 1, prefix :+ v)
          else Nil
        }
      }
    if (fs.exists(base)) walk(base, 0, Nil) else Nil
  }

  /** Container-aware chunk enumeration: N5's nested x/y/z directories,
    * zarr "/"-separated keys (same walk, axes reversed — zarr keys are
    * C-order), or zarr "."-separated flat keys (ONE listing of the
    * dataset dir). Grids return in the engine's x,y,z order either way;
    * `axisOk` is always called with engine axes. Missing chunks simply
    * don't list — the N5 sparse semantics carry over to zarr reads
    * (zarr-side fill_value reconstruction is the reader's caller's
    * choice, exactly as for absent N5 blocks).
    */
  def listChunks(
      fs: FileSystem, base: HPath, attrs: DatasetAttributes,
      axisOk: (Int, Int) => Boolean): Seq[(Array[Int], Long)] =
    if (attrs.isZarr3) listZarr3(fs, base, attrs, axisOk)
    else if (!attrs.isZarr) list(fs, base, attrs.ndim, axisOk)
    else if (attrs.zarrSeparator == "/")
      list(fs, base, attrs.ndim,
        (axis, v) => axisOk(attrs.ndim - 1 - axis, v))
        .map { case (g, m) => (g.reverse, m) }
    else {
      if (!fs.exists(base)) Nil
      else fs.listStatus(base).toSeq.flatMap { st =>
        val parts = st.getPath.getName.split('.')
        if (!st.isFile || parts.length != attrs.ndim ||
          !parts.forall(p => p.nonEmpty && p.forall(_.isDigit))) Nil
        else {
          val g = parts.map(_.toInt).reverse
          if (g.indices.forall(i => axisOk(i, g(i))))
            Seq((g, st.getModificationTime))
          else Nil
        }
      }
    }

  /** zarr v3 chunk enumeration (r18): walk the chunk FILES ("c"-prefixed
    * nested keys for the default encoding, flat dotted keys otherwise),
    * then — for sharded stores — expand each shard file into its
    * in-bounds inner-chunk grids (the engine grid is the inner grid).
    * Pushed per-axis predicates prune during the walk: for shards the
    * axis test passes when ANY contained inner index passes, and the
    * exact per-inner test re-applies after expansion.
    */
  private def listZarr3(
      fs: FileSystem, base: HPath, attrs: DatasetAttributes,
      axisOk: (Int, Int) => Boolean): Seq[(Array[Int], Long)] = {
    val ndim = attrs.ndim
    val cps = attrs.shard.map(_.chunksPerShard)
    def fileAxisOk(axis: Int, v: Int): Boolean = cps match {
      case None => axisOk(axis, v)
      case Some(c) =>
        (0 until c(axis)).exists(l => axisOk(axis, v * c(axis) + l))
    }
    val files: Seq[(Array[Int], Long)] =
      if (attrs.zarrSeparator == "/") {
        val walkBase =
          if (attrs.zarr3ChunkPrefix) new HPath(base, "c") else base
        list(fs, walkBase, ndim, (axis, v) => fileAxisOk(ndim - 1 - axis, v))
          .map { case (g, m) => (g.reverse, m) }
      } else {
        if (!fs.exists(base)) Nil
        else fs.listStatus(base).toSeq.flatMap { st =>
          val partsAll = st.getPath.getName.split('.')
          val parts =
            if (attrs.zarr3ChunkPrefix) {
              if (partsAll.length == ndim + 1 && partsAll.head == "c")
                partsAll.tail
              else Array.empty[String]
            } else partsAll
          if (!st.isFile || parts.length != ndim ||
            !parts.forall(p => p.nonEmpty && p.forall(_.isDigit))) Nil
          else {
            val g = parts.map(_.toInt).reverse
            if (g.indices.forall(i => fileAxisOk(i, g(i))))
              Seq((g, st.getModificationTime))
            else Nil
          }
        }
      }
    cps match {
      case None => files
      case Some(c) =>
        val gd = attrs.gridDims
        val locals = c.map(n => 0 until n)
          .foldRight(Seq(List.empty[Int])) { (r, acc) =>
            for (i <- r; rest <- acc) yield i :: rest
          }
        files.flatMap { case (sg, m) =>
          locals.flatMap { loc =>
            val inner = Array.tabulate(ndim)(i => sg(i) * c(i) + loc(i))
            if (inner.indices.forall(i => inner(i) < gd(i) && axisOk(i, inner(i))))
              Seq((inner, m))
            else Nil
          }
        }
    }
  }
}

/** Shared chunk-file read + decode, container-aware (N5 block header vs
  * zarr headerless full chunk). Both DSv2 readers and the box paths go
  * through here so zarr support is a property of the SOURCE, not of one
  * view.
  */
object N5BlockIO {
  /** java.nio fast path for `file://` (r20): the Hadoop local-FS stack
    * (ProxyLocalFileSystem → ChecksumFileSystem) costs ~8 ms per create
    * (checksum sibling + permission round-trips) and ~27 ms per
    * FileContext rename (measured on this machine), so a 58-chunk zarr
    * write spent 2.2 s of its 2.7 s in filesystem overhead. For the
    * local scheme the same create-temp → write → set-mtime → atomic
    * rename sequence runs through java.nio (~0.14 ms for write+move)
    * with identical semantics: Files.move(ATOMIC_MOVE) is the POSIX
    * rename(2) the Hadoop path used, overwrite included. Non-file
    * schemes (HDFS, object stores) keep the Hadoop path untouched.
    */
  def localPath(fs: FileSystem, p: HPath): java.nio.file.Path =
    if ("file" == fs.getScheme) java.nio.file.Paths.get(p.toUri.getPath)
    else null

  /** Whole-file read: nio for file://, Hadoop stream otherwise. */
  def readAllBytes(fs: FileSystem, p: HPath): Array[Byte] = {
    val lp = localPath(fs, p)
    if (lp != null) java.nio.file.Files.readAllBytes(lp)
    else {
      val in = fs.open(p)
      try in.readAllBytes() finally in.close()
    }
  }

  /** Per-partition-reader cache of the currently-OPEN shard: stream,
    * length, parsed index (r19). Same-shard inner chunks arrive
    * consecutively (the v3 walk emits shard-by-shard and partition
    * grouping cuts only at shard boundaries), so one open + one
    * positioned index read serves every inner chunk of a shard. Owned by
    * a single PartitionReader — not thread-safe, closed with it.
    */
  final class ShardReadState extends AutoCloseable {
    private[N5BlockIO] var path: String = null
    private[N5BlockIO] var in: org.apache.hadoop.fs.FSDataInputStream = null
    private[N5BlockIO] var fileLen: Long = 0L
    private[N5BlockIO] var index: Array[Long] = null
    override def close(): Unit = {
      if (in != null) { in.close(); in = null }
      path = null
      index = null
    }
  }

  def readDecode(
      fs: FileSystem, root: String, dataset: String, g: Array[Int],
      attrs: DatasetAttributes,
      shardState: ShardReadState = null): DecodedBlock = {
    val p = new HPath(root, s"$dataset/${attrs.chunkKey(g)}")
    attrs.shard match {
      case Some(sp) if attrs.isZarr3 =>
        readSharded(fs, p, g, attrs, sp, shardState)
      case _ =>
        val raw = readAllBytes(fs, p)
        if (attrs.isZarr3) {
          val body = if (attrs.zarr3Crc) stripCrc32c(raw, "chunk") else raw
          BlockCodec.decodeZarr(body, attrs.dataType, attrs.compression,
            attrs.blockSize, attrs.blockShape(g), attrs.zarrLittleEndian)
        } else if (attrs.isZarr)
          BlockCodec.decodeZarr(raw, attrs.dataType, attrs.compression,
            attrs.blockSize, attrs.blockShape(g), attrs.zarrLittleEndian)
        else BlockCodec.decode(raw, attrs.dataType, attrs.compression)
    }
  }

  /** Ranged sharded read (r19, closes the r18 whole-shard `weak`): never
    * touch shard bytes beyond this block's inner chunk. The
    * 16·nInner-byte index is positioned-read ONCE per shard — cached with
    * the open stream in `shardState` across a partition's consecutive
    * same-shard blocks — then each inner chunk is a positioned read of
    * exactly [off, off+nbytes). Cost per block: O(chunk) bytes (+ one
    * index per shard), vs r18's whole-file `readAllBytes` which was
    * O(innerChunks × shardBytes) I/O and held a ≥shard-sized byte array
    * per read (2 GB JVM array cap) — real shards are GBs by design.
    * The all-ones index entry means the inner chunk was never written and
    * reconstructs as fill (zeros) — zarr semantics at the INDEX level,
    * while a wholly missing shard file keeps the engine's sparse no-row
    * semantics at the FILE level (it never lists).
    */
  private def readSharded(
      fs: FileSystem, p: HPath, g: Array[Int], attrs: DatasetAttributes,
      sp: ShardSpec, shardState: ShardReadState): DecodedBlock = {
    val st = if (shardState != null) shardState else new ShardReadState
    try {
      val key = p.toString
      if (st.path != key) {
        st.close()
        st.fileLen = fs.getFileStatus(p).getLen
        st.in = fs.open(p)
        st.index = readShardIndex(st.in, st.fileLen, sp)
        st.path = key
      }
      val flat = sp.flatIndex(g)
      val off = st.index(flat * 2)
      val nbytes = st.index(flat * 2 + 1)
      if (off == -1L && nbytes == -1L)
        fillBlock(attrs.blockShape(g), attrs) // never written: fill 0
      else {
        if (off < 0 || nbytes < 0 || off + nbytes > st.fileLen)
          throw new IllegalArgumentException(
            s"zarr3: shard index entry [$off, ${off + nbytes}) outside " +
              s"the ${st.fileLen} B shard")
        if (nbytes > Int.MaxValue - 8) throw new IllegalArgumentException(
          s"zarr3: inner chunk of $nbytes B exceeds the JVM array limit")
        val chunk = new Array[Byte](nbytes.toInt)
        st.in.readFully(off, chunk)
        val body = if (sp.chunkCrc) stripCrc32c(chunk, "inner chunk") else chunk
        BlockCodec.decodeZarr(body, attrs.dataType, sp.innerCompression,
          attrs.blockSize, attrs.blockShape(g), sp.innerLittleEndian)
      }
    } finally if (shardState == null) st.close()
  }

  /** Positioned read + crc-verify + parse of a shard's u64-pair index
    * (C-order over the shard's inner grid, at the declared end/start).
    */
  private def readShardIndex(
      in: org.apache.hadoop.fs.FSDataInputStream, fileLen: Long,
      sp: ShardSpec): Array[Long] = {
    val nInner = sp.chunksPerShard.product
    val idxSize = nInner * 16 + (if (sp.indexCrc) 4 else 0)
    if (fileLen < idxSize) throw new IllegalArgumentException(
      s"zarr3: shard of $fileLen B smaller than its $idxSize B index")
    val idxRaw = new Array[Byte](idxSize)
    in.readFully(if (sp.indexAtEnd) fileLen - idxSize else 0L, idxRaw)
    val idx = if (sp.indexCrc) stripCrc32c(idxRaw, "shard index") else idxRaw
    val bb = java.nio.ByteBuffer.wrap(idx)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](nInner * 2)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  /** Verify and strip a trailing crc32c codec's 4-byte LE checksum. */
  private def stripCrc32c(b: Array[Byte], what: String): Array[Byte] = {
    if (b.length < 4) throw new IllegalArgumentException(
      s"zarr3: $what shorter than its crc32c (${b.length} B)")
    val crc = new java.util.zip.CRC32C()
    crc.update(b, 0, b.length - 4)
    val stored = (b(b.length - 4) & 0xffL) | ((b(b.length - 3) & 0xffL) << 8) |
      ((b(b.length - 2) & 0xffL) << 16) | ((b(b.length - 1) & 0xffL) << 24)
    if (crc.getValue != stored) throw new IllegalArgumentException(
      s"zarr3: $what crc32c mismatch (stored $stored, computed ${crc.getValue})")
    java.util.Arrays.copyOfRange(b, 0, b.length - 4)
  }

  private def fillBlock(shape: Array[Int], attrs: DatasetAttributes): DecodedBlock = {
    val n = shape.product
    if (attrs.dataType == graft.n5.Dtype.Float32 ||
        attrs.dataType == graft.n5.Dtype.Float64)
      DecodedBlock(null, shape, null, new Array[Double](n))
    else DecodedBlock(null, shape, new Array[Long](n), null)
  }

}

class N5Scan(
    root: String, dataset: String, attrs: DatasetAttributes,
    filters: Array[Filter], required: StructType,
    targetBytes: Long,
    maxBlocksPerPartition: Long,
    maxBlocksPerBatch: Int = 0,
    elementsView: Boolean = false,
    elementBatchRows: Int = 16384)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Streaming read: new block files become rows as they appear (see
    * N5MicroBatchStream for the offset design). Pushed grid filters prune
    * the streaming walk exactly like the batch scan's. The elements view
    * is batch-only — the streaming reader factory emits block rows, so
    * accepting the option here would crash on the executor at the first
    * micro-batch (and silently ignore pushed x/y/z filters); fail loudly
    * at plan time instead.
    */
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    if (elementsView) throw new UnsupportedOperationException(
      "n5 view=elements is batch-only; stream the block view and apply " +
        "N5.elements to the result")
    new N5MicroBatchStream(root, dataset, attrs, required, filters, targetBytes,
      maxBlocksPerBatch)
  }

  /** Decoded size estimate from the surviving block list — lets Catalyst
    * broadcast small (or heavily pruned) block tables in joins.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val voxels = survivors.map(g =>
      attrs.blockShape(g).map(_.toLong).product).sum
    // element view: one row per voxel; block view: one row per block
    private val rows = if (elementsView) voxels else survivors.length.toLong
    private val bytes =
      if (elementsView) voxels * (24L + attrs.dataType.bytesPerElement)
      else voxels * attrs.dataType.bytesPerElement + survivors.length * 64L
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  /** Enumerate stored blocks by walking the grid directory tree level by
    * level, applying the pushed per-axis predicates DURING traversal: a
    * pruned gx subtree is never listed at all. One listStatus RPC per
    * surviving directory (vs one exists() per grid position), and sparse
    * volumes (missing blocks) are handled for free. Listed once, shared
    * with the statistics estimate.
    */
  private lazy val survivors: Seq[Array[Int]] = listSurvivors()

  /** Group blocks into partitions of ~targetBytes decoded payload (default
    * 128 MiB). One-partition-per-block would mean tens of millions of
    * tasks on a 100 TB volume; grouping keeps task count = volume size /
    * target, while the walk order preserves grid locality within a task.
    * `maxBlocksPerPartition=1` restores per-block tasks if desired.
    */
  override def planInputPartitions(): Array[InputPartition] =
    N5Scan.groupIntoPartitions(root, dataset, survivors, attrs,
      targetBytes, maxBlocksPerPartition)

  private def listSurvivors(): Seq[Array[Int]] = {
    val rootPath = new HPath(root, dataset)
    val fs = rootPath.getFileSystem(new Configuration())
    val axisOk: (Int, Int) => Boolean =
      if (elementsView) N5GridFilters.elementAxisOk(filters, attrs.blockSize)
      else N5GridFilters.axisOk(filters)
    N5GridWalk.listChunks(fs, rootPath, attrs, axisOk).map(_._1)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    if (elementsView) new N5ElementsReaderFactory(attrs, required, elementBatchRows)
    else new N5ReaderFactory(attrs, required)
}

final case class N5BlocksPartition(
    root: String, dataset: String, grids: Array[Array[Int]]) extends InputPartition

class N5ReaderFactory(attrs: DatasetAttributes, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new N5BlockReader(p.asInstanceOf[N5BlocksPartition], attrs, required)
}

/** Emits one row per block of its partition; payload decode is skipped
  * entirely when the `data` column was pruned away.
  */
class N5BlockReader(
    part: N5BlocksPartition, attrs: DatasetAttributes, required: StructType)
    extends PartitionReader[InternalRow] {

  private var i = -1
  private var row: InternalRow = _
  private val fs: FileSystem =
    new HPath(part.root).getFileSystem(new Configuration())
  private val shardState = new N5BlockIO.ShardReadState

  private def needsData = required.fieldNames.contains("data")

  override def next(): Boolean = {
    i += 1
    if (i >= part.grids.length) return false
    val g = part.grids(i)
    val shape: Array[Int] = attrs.blockShape(g)
    val dataArr: org.apache.spark.sql.catalyst.util.ArrayData =
      if (needsData)
        toSparkArray(N5BlockIO.readDecode(fs, part.root, part.dataset, g,
          attrs, shardState))
      else null
    val values = required.fieldNames.map {
      case "gx" => g(0)
      case "gy" => if (g.length > 1) g(1) else 0
      case "gz" => if (g.length > 2) g(2) else 0
      case "x0" => g(0).toLong * attrs.blockSize(0)
      case "y0" => if (g.length > 1) g(1).toLong * attrs.blockSize(1) else 0L
      case "z0" => if (g.length > 2) g(2).toLong * attrs.blockSize(2) else 0L
      case "shape" => new GenericArrayData(shape.map(i => i: Any))
      case "data" => dataArr
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    row = InternalRow.fromSeq(values.toSeq)
    true
  }

  /** Payload → Spark array without per-element boxing:
    * UnsafeArrayData.fromPrimitiveArray stores the elements contiguously,
    * so a 16M-voxel block costs one primitive-array copy instead of 16M
    * boxed objects (this path dominates every element-view read).
    */
  private def toSparkArray(dec: DecodedBlock): org.apache.spark.sql.catalyst.expressions.UnsafeArrayData = {
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    // every blocks-view consumer (Multiscale, Regroup, export) assumes
    // data.length == shape.product, so a short varlength (mode-1) block
    // must fail here with a diagnostic, not as an index error mid-copy
    require(dec.elementCount >= dec.numElements,
      s"block decodes ${dec.elementCount} elements, expected " +
        s"${dec.numElements} — truncated or varlength-short block")
    val n = dec.numElements
    attrs.dataType match {
      case Dtype.UInt8 | Dtype.Int16 =>
        val a = new Array[Short](n)
        var i = 0; while (i < n) { a(i) = dec.longs(i).toShort; i += 1 }
        UnsafeArrayData.fromPrimitiveArray(a)
      case Dtype.Int8 =>
        val a = new Array[Byte](n)
        var i = 0; while (i < n) { a(i) = dec.longs(i).toByte; i += 1 }
        UnsafeArrayData.fromPrimitiveArray(a)
      case Dtype.UInt16 | Dtype.Int32 =>
        val a = new Array[Int](n)
        var i = 0; while (i < n) { a(i) = dec.longs(i).toInt; i += 1 }
        UnsafeArrayData.fromPrimitiveArray(a)
      case Dtype.UInt32 | Dtype.UInt64 | Dtype.Int64 =>
        UnsafeArrayData.fromPrimitiveArray(dec.longs)
      case Dtype.Float32 =>
        val a = new Array[Float](n)
        var i = 0; while (i < n) { a(i) = dec.doubles(i).toFloat; i += 1 }
        UnsafeArrayData.fromPrimitiveArray(a)
      case Dtype.Float64 =>
        UnsafeArrayData.fromPrimitiveArray(dec.doubles)
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = shardState.close()
}

/** Columnar reader factory for the per-element view (r6 VERDICT #3): the
  * batch scan hands whole-stage codegen primitive column vectors filled
  * straight from the decoded block payload, replacing the block-row →
  * posexplode → per-row unravel pipeline for element consumers.
  */
class N5ElementsReaderFactory(
    attrs: DatasetAttributes, required: StructType, batchRows: Int)
    extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = true
  override def createColumnarReader(
      p: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new N5ElementsReader(p.asInstanceOf[N5BlocksPartition], attrs, required,
      batchRows)
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    throw new UnsupportedOperationException(
      "n5 elements view is columnar-only (supportColumnarReads is true)")
}

/** Emits ColumnarBatches of (x,y,z,v) voxel rows. Coordinates are integer
  * unravel of the flat index (x-fastest within the trimmed block shape,
  * same order as N5.elements); the value vector is filled from the decoded
  * payload with primitive puts — no boxing anywhere. A block larger than
  * `batchRows` spans several batches (vectors are reused across batches);
  * payload decode is skipped entirely when `v` was pruned away (metadata
  * and count-only queries read no bytes).
  */
class N5ElementsReader(
    part: N5BlocksPartition, attrs: DatasetAttributes, required: StructType,
    batchRows: Int)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  private val fs: FileSystem =
    new HPath(part.root).getFileSystem(new Configuration())
  private val shardState = new N5BlockIO.ShardReadState
  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchRows, required)
  private val batch =
    new ColumnarBatch(vectors.map(v => v: ColumnVector).toArray)
  private val needV = required.fieldNames.contains("v")

  // current-block state
  private var bi = -1
  private var dec: DecodedBlock = null
  private var n = 0
  private var off = 0
  private var x0 = 0L; private var y0 = 0L; private var z0 = 0L
  private var sx = 1; private var sy = 1

  private def openNextBlock(): Boolean = {
    bi += 1
    if (bi >= part.grids.length) return false
    val g = part.grids(bi)
    val shape = attrs.blockShape(g)
    sx = shape(0)
    sy = shape(1)
    n = shape.product
    x0 = g(0).toLong * attrs.blockSize(0)
    y0 = g(1).toLong * attrs.blockSize(1)
    z0 = g(2).toLong * attrs.blockSize(2)
    if (needV) {
      dec = N5BlockIO.readDecode(fs, part.root, part.dataset, g, attrs,
        shardState)
      // the coordinate unravel trusts the attrs-derived trimmed shape; a
      // block file whose stored header disagrees (corrupt write, foreign
      // tool) would otherwise be silently misread as the wrong voxels
      require(java.util.Arrays.equals(dec.shape, shape),
        s"block ${g.mkString("/")}: stored shape ${dec.shape.mkString("x")} " +
          s"!= attrs-derived ${shape.mkString("x")}")
      require(dec.elementCount >= n,
        s"block ${g.mkString("/")}: decoded ${dec.elementCount} elements, " +
          s"expected $n — truncated or varlength-short block")
    }
    off = 0
    true
  }

  override def next(): Boolean = {
    while (off >= n) if (!openNextBlock()) return false
    val m = math.min(batchRows, n - off)
    var c = 0
    while (c < vectors.length) {
      val v = vectors(c)
      v.reset()
      required.fields(c).name match {
        case "x" =>
          var i = 0
          while (i < m) { v.putLong(i, x0 + (off + i) % sx); i += 1 }
        case "y" =>
          var i = 0
          while (i < m) { v.putLong(i, y0 + ((off + i) / sx) % sy); i += 1 }
        case "z" =>
          var i = 0
          while (i < m) { v.putLong(i, z0 + (off + i) / (sx * sy)); i += 1 }
        case "v" => attrs.dataType match {
          case Dtype.UInt8 | Dtype.Int16 =>
            var i = 0
            while (i < m) { v.putShort(i, dec.longs(off + i).toShort); i += 1 }
          case Dtype.Int8 =>
            var i = 0
            while (i < m) { v.putByte(i, dec.longs(off + i).toByte); i += 1 }
          case Dtype.UInt16 | Dtype.Int32 =>
            var i = 0
            while (i < m) { v.putInt(i, dec.longs(off + i).toInt); i += 1 }
          case Dtype.UInt32 | Dtype.UInt64 | Dtype.Int64 =>
            var i = 0
            while (i < m) { v.putLong(i, dec.longs(off + i)); i += 1 }
          case Dtype.Float32 =>
            var i = 0
            while (i < m) { v.putFloat(i, dec.doubles(off + i).toFloat); i += 1 }
          case Dtype.Float64 =>
            var i = 0
            while (i < m) { v.putDouble(i, dec.doubles(off + i)); i += 1 }
        }
        case other =>
          throw new IllegalArgumentException(s"unknown element column $other")
      }
      c += 1
    }
    off += m
    batch.setNumRows(m)
    true
  }

  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
  override def close(): Unit = { batch.close(); shardState.close() }
}

// --------------------------------------------------------------- write path

class N5WriteBuilder(
    root: String, dataset: String,
    options: CaseInsensitiveStringMap, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  /** `blockMode` option: `default` (mode-0, dense) or `varlength`
    * (mode-1 header carrying its element count — full-count, so the
    * volume stays dense-complete; the VALUE of mode-1 here is byte-
    * compatible round-trips of label volumes that arrived mode-1).
    */
  private def varlengthMode(): Boolean =
    options.getOrDefault("blockMode", "default") match {
      case "default" => false
      case "varlength" => true
      case other => throw new IllegalArgumentException(
        s"unknown blockMode '$other' (default | varlength)")
    }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val attrs = writeAttrs()
      new N5BatchWrite(root, dataset, attrs, info.schema(), doTruncate,
        varlengthMode())
    }
    /** Streaming sink: each micro-batch writes its block rows with the
      * same idempotent blind-overwrite writers; replayed epochs rewrite
      * identical bytes (at-least-once + idempotent = the declared
      * semantics, SURVEY §2.3 non-goals). Attrs are (re)committed after
      * every epoch so the dataset is readable between batches.
      */
    override def toStreaming: swrite.StreamingWrite = {
      val attrs = writeAttrs()
      // truncate-per-epoch (Complete mode) would have to wipe earlier
      // epochs' blocks; silently ignoring it would leave stale blocks on
      // disk, so reject it up front — the sink is append-only
      if (doTruncate) throw new UnsupportedOperationException(
        "n5 streaming sink supports Append output mode only")
      new swrite.StreamingWrite {
        private val batch =
          new N5BatchWrite(root, dataset, attrs, info.schema(), false,
            varlengthMode())
        override def createStreamingWriterFactory(
            pinfo: PhysicalWriteInfo): swrite.StreamingDataWriterFactory = {
          val f = batch.createBatchWriterFactory(pinfo)
            .asInstanceOf[N5WriterFactory]
          (partitionId: Int, taskId: Long, _: Long) =>
            f.createWriter(partitionId, taskId)
        }
        override def commit(
            epochId: Long, messages: Array[WriterCommitMessage]): Unit =
          batch.commit(messages)
        override def abort(
            epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
      }
    }
  }

  /** Attributes from writer options, falling back to an existing
    * attributes.json (append to an existing dataset). Option
    * `format=zarr` (r14) writes the dataset as a zarr v2 container —
    * C-order fill-padded chunks + `.zarray` metadata — with
    * `zarrSeparator` ("." default | "/") picking the chunk-key layout;
    * the compressor profile is raw/zlib/gzip/blosc, rejected loudly
    * otherwise (the narrow set every zarr v2 reader ships).
    */
  private def writeAttrs(): DatasetAttributes = {
    val fmt = options.getOrDefault("format", "n5") match {
      case f @ ("n5" | "zarr" | "zarr3") => f
      case other => throw new IllegalArgumentException(
        s"unknown container format '$other' (n5 | zarr | zarr3)")
    }
    if (options.containsKey("dimensions")) {
      val blockSize = options.getOrDefault("blockSize",
        options.get("dimensions")).split(",").map(_.trim.toInt)
      val compression = Compression(options.getOrDefault("compression", "gzip"),
        options.getOrDefault("compressionLevel", "-1").toInt)
      val little = options.getOrDefault("zarrLittleEndian", "true").toBoolean
      // v3 chunks stamp a trailing crc32c unless told otherwise
      val crc = fmt == "zarr3" &&
        options.getOrDefault("zarr3Crc", "true").toBoolean
      // sharded v3 write (r19): `shardChunks` = chunks per shard per
      // axis (engine order); blockSize is the INNER chunk shape and
      // chunk FILES are shards of blockSize·shardChunks voxels
      val shard = Option(options.get("shardChunks")).map { s =>
        require(fmt == "zarr3",
          "shardChunks: sharding_indexed is a zarr v3 codec " +
            s"(container format is '$fmt')")
        val cps = s.split(",").map(_.trim.toInt)
        require(cps.length == blockSize.length && cps.forall(_ > 0),
          s"shardChunks '${s}' must give a positive count per axis")
        ShardSpec(cps, compression, little,
          indexAtEnd = true,
          indexCrc = options.getOrDefault("shardIndexCrc", "true").toBoolean,
          chunkCrc = crc)
      }
      DatasetAttributes(
        options.get("dimensions").split(",").map(_.trim.toLong),
        blockSize,
        Dtype.fromName(options.getOrDefault("dataType", "uint8")),
        compression,
        Option(options.get("extraAttrs"))
          .map(parseExtra).getOrElse(Map.empty),
        format = fmt,
        // v3 writes use the spec-default "/"-separated "c/" key
        // encoding unless told otherwise
        zarrSeparator = options.getOrDefault("zarrSeparator",
          if (fmt == "zarr3") "/" else "."),
        zarrLittleEndian = little,
        zarr3ChunkPrefix =
          options.getOrDefault("zarr3ChunkPrefix", "true").toBoolean,
        zarr3Crc = crc,
        shard = shard)
    } else N5Meta.datasetAttributes(root, dataset)
  }

  /** extraAttrs option: `key1=json1;;key2=json2`. */
  private def parseExtra(s: String): Map[String, String] =
    s.split(";;").filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap
}

class N5BatchWrite(
    root: String, dataset: String, attrs: DatasetAttributes,
    inputSchema: StructType, truncate: Boolean,
    varlength: Boolean = false) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // driver-side prep: optional truncate, container root marker
    if (truncate) {
      val p = new HPath(root, dataset)
      val fs = p.getFileSystem(new Configuration())
      if (fs.exists(p)) fs.delete(p, true)
    }
    // a zarr store has no N5 root marker; injecting attributes.json into
    // a foreign container would corrupt it for strict zarr readers
    if (!attrs.isZarrFamily) N5Meta.ensureRoot(root)
    new N5WriterFactory(root, dataset, attrs, inputSchema, varlength)
  }

  /** Metadata commit AFTER data: the dataset only becomes readable once
    * every task has written its blocks. For sharded v3 each task reports
    * the shard FILES it published; a shard spanning two tasks means two
    * partial files raced the same rename — detect it here and fail
    * BEFORE the metadata commit (the store stays unreadable rather than
    * silently half-written). `N5.writeZarr3` prevents it by clustering
    * on the shard key; this guards direct DSv2 writes.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (attrs.shard.isDefined) {
      val all = messages.collect { case ShardCommitMessage(keys) => keys }.flatten
      val dups = all.groupBy(identity).filter(_._2.length > 1).keys
      if (dups.nonEmpty) throw new IllegalStateException(
        s"sharded zarr v3 write: shard(s) ${dups.mkString(", ")} received " +
          "inner chunks from MORE than one task — the published files are " +
          "partial. Cluster the input by shard (repartition on the shard " +
          "grid, as N5.writeZarr3 does) and rewrite.")
    }
    if (attrs.isZarr3) N5Meta.writeZarr3Attributes(root, dataset, attrs)
    else if (attrs.isZarr) N5Meta.writeZarrAttributes(root, dataset, attrs)
    else N5Meta.writeDatasetAttributes(root, dataset, attrs)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class N5WriterFactory(
    root: String, dataset: String, attrs: DatasetAttributes,
    inputSchema: StructType, varlength: Boolean = false) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new N5BlockWriter(root, dataset, attrs, inputSchema, varlength)
}

/** Writes each incoming (gx,gy,gz,shape,data) row as one block file.
  * Each block is written to a hidden temp file and atomically renamed
  * into place (FileContext rename with OVERWRITE — atomic on POSIX and
  * HDFS), so a crashed or speculative task can never leave a torn block
  * behind: readers (including writeBox's read-modify-write) always see
  * either the old complete bytes or the new complete bytes. Blocks are
  * write-disjoint across tasks, so retries are idempotent. Temps are
  * UUID-unique per attempt; an aborted attempt deletes its in-flight temp
  * in abort(), and temps orphaned by a hard crash (no abort callback) are
  * invisible to scans (non-digit names).
  */
class N5BlockWriter(
    root: String, dataset: String, attrs: DatasetAttributes,
    inputSchema: StructType, varlength: Boolean = false)
    extends DataWriter[InternalRow] {

  private val conf = new Configuration()
  private val fs: FileSystem = new HPath(root).getFileSystem(conf)
  private val fc = org.apache.hadoop.fs.FileContext.getFileContext(
    fs.getUri, conf)
  private val idx: Map[String, Int] =
    inputSchema.fieldNames.zipWithIndex.toMap
  private val elemType = N5Schema.elementType(attrs.dataType)

  override def write(r: InternalRow): Unit = {
    val gx = r.getInt(idx("gx"))
    val gy = if (idx.contains("gy")) r.getInt(idx("gy")) else 0
    val gz = if (idx.contains("gz")) r.getInt(idx("gz")) else 0
    val shape = r.getArray(idx("shape")).toIntArray()
    val data = r.getArray(idx("data"))
    val n = shape.product
    require(data.numElements() == n,
      s"block ($gx,$gy,$gz): data has ${data.numElements()} elements, shape needs $n")
    val (longs, doubles) = elemType match {
      case ShortType => (data.toShortArray().map(_.toLong), null)
      case ByteType => (data.toByteArray().map(_.toLong), null)
      case IntegerType => (data.toIntArray().map(_.toLong), null)
      case LongType => (data.toLongArray(), null)
      case FloatType => (null, data.toFloatArray().map(_.toDouble))
      case DoubleType => (null, data.toDoubleArray())
      case other => throw new IllegalArgumentException(s"bad element type $other")
    }
    val bytes =
      if (attrs.isZarrFamily) {
        require(!varlength,
          "zarr chunks have no header; blockMode=varlength is N5-only")
        // sharded inner chunks encode through the SHARD's inner chain
        // (which can differ from the attrs-level mirror on appends)
        val (comp, little, crc) = attrs.shard match {
          case Some(sp) => (sp.innerCompression, sp.innerLittleEndian, sp.chunkCrc)
          case None => (attrs.compression, attrs.zarrLittleEndian,
            attrs.isZarr3 && attrs.zarr3Crc)
        }
        val chunk = BlockCodec.encodeZarr(shape, attrs.blockSize, longs,
          doubles, attrs.dataType, comp, little)
        // v3 chains end with crc32c: checksum of the compressed chunk,
        // 4 bytes little-endian (verified+stripped on read)
        if (crc) withCrc32c(chunk) else chunk
      } else BlockCodec.encode(shape, longs, doubles, attrs.dataType,
        attrs.compression, varlength)
    attrs.shard match {
      case Some(sp) =>
        writeSharded(Array(gx, gy, gz), sp, bytes)
        return
      case None => ()
    }
    val path =
      if (attrs.isZarrFamily)
        new HPath(root, s"$dataset/${attrs.chunkKey(Array(gx, gy, gz))}")
      else new HPath(root, s"$dataset/$gx/$gy/$gz")
    // unique temp per attempt: concurrent speculative attempts must not
    // share a temp file (a truncate under a live fd would corrupt the
    // published inode on POSIX)
    val tmp = new HPath(path.getParent,
      s".${path.getName}.tmp-${java.util.UUID.randomUUID()}")
    val lp = N5BlockIO.localPath(fs, path)
    if (lp != null) {
      // file:// fast path (see N5BlockIO.localPath): same temp-write →
      // publish-mtime → atomic-rename sequence through java.nio
      java.nio.file.Files.createDirectories(lp.getParent)
      val ltmp = lp.getParent.resolve(tmp.getName)
      pending = tmp
      java.nio.file.Files.write(ltmp, bytes)
      java.nio.file.Files.setLastModifiedTime(ltmp,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      java.nio.file.Files.move(ltmp, lp,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      pending = null
      return
    }
    fs.mkdirs(path.getParent)
    pending = tmp
    val out = fs.create(tmp, true)
    try { out.write(bytes); out.close() }
    catch { case e: Throwable => out.close(); fs.delete(tmp, false); throw e }
    // stamp the mtime at PUBLISH time (not temp-close time) so the
    // streaming source's watermark can never advance past a block that
    // is not yet visible — the stamp→rename gap is microseconds, well
    // inside the source's grace window
    fs.setTimes(tmp, System.currentTimeMillis(), -1)
    fc.rename(tmp, path, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    pending = null
  }

  // the one temp that can exist between create and publish-rename; with
  // UUID-unique names a retry never reclaims it by name, so the aborted
  // attempt must clean up after itself
  private var pending: HPath = null

  // ---- sharded v3 write (r19): STREAM the open shard ----------------
  // Inner chunks append to the shard temp file as rows arrive and the
  // u64-pair index goes at the END (the write profile), so memory is
  // O(one encoded chunk + 16·nInner index) however large the shard —
  // GB-scale shards never materialize in the JVM. Requires same-shard
  // rows to arrive consecutively within the task (N5.writeZarr3
  // clusters + sorts to guarantee it; a shard key that REAPPEARS after
  // its flush is a loud reject, and cross-task splits are caught at
  // commit by the shard-key manifest).
  private var shardKey: String = null
  private var shardTmp: HPath = null
  private var shardOut: java.io.OutputStream = null
  private var shardIndex: Array[Long] = null
  private var shardPos: Long = 0L
  private val publishedShards = scala.collection.mutable.ArrayBuffer.empty[String]
  private val publishedSet = scala.collection.mutable.HashSet.empty[String]

  private def withCrc32c(b: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32C()
    crc.update(b, 0, b.length)
    val v = crc.getValue
    b ++ Array[Byte](v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
  }

  private def writeSharded(g: Array[Int], sp: ShardSpec, bytes: Array[Byte]): Unit = {
    val key = attrs.chunkKey(g) // sharded stores key the SHARD file
    if (key != shardKey) {
      flushShard(sp)
      require(sp.indexAtEnd,
        "sharded zarr v3 write streams chunks then the index — an " +
          "index_location=start store cannot be appended to")
      if (publishedSet.contains(key)) throw new IllegalArgumentException(
        s"sharded zarr v3 write: inner chunks for shard $key arrived " +
          "NON-consecutively — the shard was already published by this " +
          "task. Cluster the input by shard (repartition on the shard " +
          "grid + sortWithinPartitions, as N5.writeZarr3 does).")
      val nInner = sp.chunksPerShard.map(_.toLong).product
      require(nInner <= (Int.MaxValue - 8L) / 16L,
        s"shard of $nInner inner chunks: index exceeds the JVM array limit")
      val path = new HPath(root, s"$dataset/$key")
      shardTmp = new HPath(path.getParent,
        s".${path.getName}.tmp-${java.util.UUID.randomUUID()}")
      val lp = N5BlockIO.localPath(fs, path)
      pending = shardTmp
      shardOut =
        if (lp != null) {
          // file:// fast path: stream the shard through java.nio (the
          // Hadoop checksummed create costs ~8 ms per file; the shard
          // keeps streaming semantics — O(chunk) memory — either way)
          java.nio.file.Files.createDirectories(lp.getParent)
          java.nio.file.Files.newOutputStream(
            lp.getParent.resolve(shardTmp.getName))
        } else {
          fs.mkdirs(path.getParent)
          fs.create(shardTmp, true)
        }
      shardIndex = Array.fill(2 * nInner.toInt)(-1L) // all-ones = fill
      shardPos = 0L
      shardKey = key
    }
    val flat = sp.flatIndex(g)
    require(shardIndex(2 * flat) == -1L,
      s"duplicate inner chunk (${g.mkString(",")}) in shard $key")
    shardIndex(2 * flat) = shardPos
    shardIndex(2 * flat + 1) = bytes.length.toLong
    shardOut.write(bytes)
    shardPos += bytes.length
  }

  /** Append the index (+ its crc32c), close, and atomically publish the
    * open shard, if any.
    */
  private def flushShard(sp: ShardSpec): Unit = if (shardOut != null) {
    val bb = java.nio.ByteBuffer.allocate(shardIndex.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    shardIndex.foreach(bb.putLong)
    val idx = bb.array()
    shardOut.write(if (sp.indexCrc) withCrc32c(idx) else idx)
    shardOut.close()
    shardOut = null
    val dest = new HPath(root, s"$dataset/$shardKey")
    val lp = N5BlockIO.localPath(fs, dest)
    if (lp != null) {
      val ltmp = lp.getParent.resolve(shardTmp.getName)
      java.nio.file.Files.setLastModifiedTime(ltmp,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      java.nio.file.Files.move(ltmp, lp,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      fs.setTimes(shardTmp, System.currentTimeMillis(), -1)
      fc.rename(shardTmp, dest,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    publishedShards += shardKey
    publishedSet += shardKey
    pending = null; shardTmp = null; shardKey = null
    shardIndex = null; shardPos = 0L
  }

  override def commit(): WriterCommitMessage = attrs.shard match {
    case Some(sp) =>
      flushShard(sp)
      ShardCommitMessage(publishedShards.toArray)
    case None => N5CommitMessage
  }
  override def abort(): Unit = {
    if (shardOut != null) { shardOut.close(); shardOut = null }
    if (pending != null) {
      val lp = N5BlockIO.localPath(fs, pending)
      if (lp != null) java.nio.file.Files.deleteIfExists(lp)
      else fs.delete(pending, false)
      pending = null
    }
  }
  override def close(): Unit =
    if (shardOut != null) { shardOut.close(); shardOut = null }
}

case object N5CommitMessage extends WriterCommitMessage

/** Shard files this task published (sharded v3): the driver-side commit
  * cross-checks global uniqueness before metadata commit.
  */
final case class ShardCommitMessage(shardKeys: Array[String])
    extends WriterCommitMessage
