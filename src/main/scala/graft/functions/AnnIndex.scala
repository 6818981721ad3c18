package graft.functions

import graft.Tables
import graft.operators.Layout
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted ANN index catalog — the build-once/probe-many lifecycle split.
  *
  * r6 left every ANN query re-training its codebooks in-line, so the bench
  * conflated a fixed build cost with the number that matters at 100 TB:
  * probe latency. This catalog derives the trained artifacts ONCE per
  * dataset and persists all of them next to each other:
  *
  *   - `vectors`      (vec_id, embedding, cell)  bucketed by coarse cell
  *   - `codes`        (vec_id, cell, codes)      bucketed by coarse cell
  *   - `ivf_codebook` (cid, cv)                  k×dim doubles
  *   - `pq_codebook`  (b, cid, cv8)              subspaces×k×(dim/subspaces)
  *
  * Probe-only entry points then load the tiny codebook tables (k rows to
  * the driver) and run nothing but the pruned-scan/ADC plan. This is the
  * relational analogue of the reference persisting its multiscale pyramid
  * once and reading the levels many times (`n5_multiscale.py:121-133` —
  * derive once, read many).
  *
  * Lifecycle: `ensure` is idempotent at three levels — (1) already
  * registered in this session's catalog: no work; (2) a marker file with a
  * matching dataset fingerprint exists on disk: re-register the tables
  * over the existing files (external tables with the same bucket spec —
  * bucket ids are recovered from the file names, so pruning still works);
  * (3) otherwise: train, write, and stamp the marker LAST so a half-built
  * catalog is never recovered. The catalog location is keyed by a hash of
  * the dataset dir, so sf0.001/sf0.01/sf0.1 runs never share an index,
  * and the fingerprint (embeddings file length + mtime) forces a rebuild
  * if the underlying data changes.
  */
object AnnIndex {

  /** Training hyper-parameters — fixed so the DuckDB oracle CTE chains
    * (which replay training from the raw table) reproduce the persisted
    * artifacts exactly. Identical to q100/q103/q104's inline training.
    */
  val CoarseK = 8
  val CoarseIters = 3
  val SampleBuckets = 3
  val PqSubspaces = 8
  val PqK = 16
  val PqIters = 2

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Catalog database name for a dataset dir (content-addressed). */
  def dbFor(dir: String): String = s"graft_ann_catalog_${md5hex(dir).take(8)}"

  private def locFor(db: String): String =
    s"${System.getProperty("java.io.tmpdir")}/${db}_db"

  /** Rebuild trigger: length + mtime of the source embeddings file. */
  private def fingerprint(s: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    s"graft-ann-v1 ${st.getLen} ${st.getModificationTime}"
  }

  /** Idempotent build-or-recover; returns the catalog database name. */
  def ensure(s: SparkSession, dir: String): String = synchronized {
    val db = dbFor(dir)
    if (s.catalog.databaseExists(db) && s.catalog.tableExists(s"$db.vectors"))
      return db
    val loc = locFor(db)
    val hp = new org.apache.hadoop.fs.Path(loc)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(hp, "_GRAFT_INDEX_READY")
    val want = fingerprint(s, dir)
    val recoverable = fs.exists(marker) && {
      val in = fs.open(marker)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt == want
    }
    if (recoverable) register(s, db, loc)
    else build(s, dir, db, loc, fs, marker, want)
    db
  }

  /** Re-register the persisted tables in a fresh session's in-memory
    * catalog. External tables with an explicit bucket spec over the files
    * the build wrote: Spark recovers each file's bucket id from its name,
    * so the probe-side bucket pruning survives the session boundary.
    */
  private def register(s: SparkSession, db: String, loc: String): Unit = {
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    s.sql(
      s"""CREATE TABLE IF NOT EXISTS $db.vectors
         |  (vec_id BIGINT, embedding ARRAY<FLOAT>, cell INT)
         |USING parquet CLUSTERED BY (cell) INTO $CoarseK BUCKETS
         |LOCATION '$loc/vectors'""".stripMargin)
    s.sql(
      s"""CREATE TABLE IF NOT EXISTS $db.codes
         |  (vec_id BIGINT, cell INT, codes ARRAY<INT>)
         |USING parquet CLUSTERED BY (cell) INTO $CoarseK BUCKETS
         |LOCATION '$loc/codes'""".stripMargin)
    s.sql(
      s"""CREATE TABLE IF NOT EXISTS $db.ivf_codebook
         |  (cid INT, cv ARRAY<DOUBLE>)
         |USING parquet LOCATION '$loc/ivf_codebook'""".stripMargin)
    s.sql(
      s"""CREATE TABLE IF NOT EXISTS $db.pq_codebook
         |  (b INT, cid INT, cv8 ARRAY<DOUBLE>)
         |USING parquet LOCATION '$loc/pq_codebook'""".stripMargin)
  }

  private def build(
      s: SparkSession, dir: String, db: String, loc: String,
      fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path, want: String): Unit = {
    buildIndex(s,
      Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
      db, loc)
    // marker LAST: its presence certifies every table above is complete
    val out = fs.create(marker, true)
    try out.write(want.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Train and persist a full index catalog for an ARBITRARY embedding
    * relation (columns vec_id LONG, embedding ARRAY<FLOAT>) at an
    * explicit database/location — the library entry point for corpora
    * that are not a driver testdata dir. Lifecycle (markers,
    * fingerprints, recovery) stays with `ensure`; callers of this raw
    * builder manage their own.
    */
  def buildIndex(
      s: SparkSession, emb: org.apache.spark.sql.DataFrame,
      db: String, loc: String): Unit = synchronized {
    val e = emb.select(col("vec_id"), col("embedding"))
    val cents = VectorSearch.trainIvfCodebook(e, CoarseK, CoarseIters, SampleBuckets)
    val cb = VectorSearch.trainPqCodebook(e, PqSubspaces, PqK, PqIters, SampleBuckets)
    s.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    val hp = new org.apache.hadoop.fs.Path(loc)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) fs.delete(hp, true)
    s.sql(s"CREATE DATABASE $db LOCATION '$loc'")
    val cell = VectorSearch.ivfCellD(VectorFunctions.toDoubles(col("embedding")), cents)
    Layout.writeBucketed(
      e.select(col("vec_id"), col("embedding"), cell.as("cell")),
      s"$db.vectors", "cell", CoarseK)
    Layout.writeBucketed(
      e.select(col("vec_id"), cell.as("cell"),
        NativeExpressions.pqEncode(col("embedding"), cb).as("codes")),
      s"$db.codes", "cell", CoarseK)
    import scala.jdk.CollectionConverters._
    s.createDataFrame(
      cents.map { case (cid, cv) => Row(cid, cv) }.asJava,
      StructType(Seq(
        StructField("cid", IntegerType, nullable = false),
        StructField("cv", ArrayType(DoubleType, containsNull = false)))))
      .coalesce(1).write.mode("overwrite").format("parquet")
      .saveAsTable(s"$db.ivf_codebook")
    val pqRows = for {
      (centers, b) <- cb.zipWithIndex
      (cv8, j) <- centers.zipWithIndex
    } yield Row(b, j, cv8)
    s.createDataFrame(
      pqRows.asJava,
      StructType(Seq(
        StructField("b", IntegerType, nullable = false),
        StructField("cid", IntegerType, nullable = false),
        StructField("cv8", ArrayType(DoubleType, containsNull = false)))))
      .coalesce(1).write.mode("overwrite").format("parquet")
      .saveAsTable(s"$db.pq_codebook")
    // memo invalidation LAST (and the loaders below share this lock):
    // dropping the memo at build START would let a concurrent probe
    // re-cache the pre-rebuild codebooks mid-build and serve them
    // against the post-rebuild index
    ivfMemo.remove(db)
    pqMemo.remove(db)
  }

  // Driver-side codebook memo: a serving process loads each codebook ONCE
  // per index, not once per probe query — the entries are k×dim doubles
  // (a few KB), keyed by catalog db, and dropped whenever that db is
  // rebuilt (`build` invalidates). This removes two small collect jobs
  // from every probe-only query and micro-batch.
  private val ivfMemo =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, Seq[Double])]]
  private val pqMemo =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Seq[Seq[Double]]]]

  /** Load the persisted coarse codebook (k rows to the driver, memoized).
    * Synchronized on the same lock as ensure/build, so a loader can never
    * observe (and cache) a catalog mid-rebuild.
    */
  def ivfCodebook(s: SparkSession, db: String): Seq[(Int, Seq[Double])] =
    synchronized {
      ivfMemo.getOrElseUpdate(db,
        s.table(s"$db.ivf_codebook").orderBy(col("cid").asc).collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq)
    }

  /** Load the persisted PQ codebook (subspaces×k rows, memoized). */
  def pqCodebook(s: SparkSession, db: String): Seq[Seq[Seq[Double]]] =
    synchronized {
      pqMemo.getOrElseUpdate(db, {
        val rows = s.table(s"$db.pq_codebook").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        (0 until PqSubspaces).map { b =>
          val centers = rows.filter(_._1 == b).sortBy(_._2)
          require(centers.length == PqK,
            s"pq_codebook subspace $b has ${centers.length} centers, want $PqK")
          centers.map(_._3).toSeq
        }
      })
    }
}
