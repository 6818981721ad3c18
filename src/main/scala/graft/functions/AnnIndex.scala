package graft.functions

import graft.Tables
import graft.operators.Layout
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One probe-time-consistent view of a catalog: both index tables and both
  * codebooks resolved under the build lock, so a concurrent rebuild can
  * never pair a new codebook with an old index (or vice versa) inside one
  * query. The DataFrames are analyzed eagerly at snapshot time, pinning
  * the generation directory they read even if a rebuild swaps the catalog
  * tables before the query executes (the previous generation's files stay
  * on disk until the NEXT build).
  */
final case class AnnSnapshot(
    vectors: DataFrame, codes: DataFrame,
    ivf: Seq[(Int, Seq[Double])], pq: Seq[Seq[Seq[Double]]])

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
  * registered in this session's catalog AND the memoized fingerprint still
  * matches the dataset: no work (an embeddings file overwritten mid-session
  * therefore forces the rebuild path instead of serving a stale index);
  * (2) a marker file with a matching dataset fingerprint exists on disk:
  * re-register the tables over the existing files (external tables with
  * the same bucket spec — bucket ids are recovered from the file names, so
  * pruning still works); (3) otherwise: train and write a NEW GENERATION
  * directory, swap the serving tables onto it, and stamp the marker LAST
  * so a half-built catalog is never recovered.
  *
  * Generations: each build lands in `<loc>/g<N>` and the serving database
  * holds EXTERNAL tables pointed at the current generation. The previous
  * generation's files are kept until the build after next, so a probe plan
  * that resolved its locations before a rebuild keeps reading a complete,
  * self-consistent index mid-rebuild. Probes that need cross-table
  * atomicity take a [[snapshot]] (resolved under the build lock).
  *
  * Maintenance: [[append]] is the incremental path — delta vectors are
  * assigned against the FROZEN persisted codebooks and appended into the
  * existing cell buckets; no retraining, no rewrite of existing files
  * (mirrors the incremental-dedup-vs-history shape of q99).
  *
  * Scope: the catalog root defaults to `java.io.tmpdir` and can be moved
  * with the `graft.ann.catalog.root` system property (set it to shared
  * storage for a real deployment). The build/probe lock is JVM-local —
  * concurrent builds of the SAME catalog from separate driver processes
  * are not coordinated (last marker wins); the marker-last discipline
  * keeps any single reader consistent, but multi-driver deployments
  * should serialize maintenance externally.
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

  private val tableNames = Seq("vectors", "codes", "ivf_codebook", "pq_codebook")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Catalog database name for a dataset dir (content-addressed). */
  def dbFor(dir: String): String = s"graft_ann_catalog_${md5hex(dir).take(8)}"

  private def locFor(db: String): String = {
    val root = System.getProperty("graft.ann.catalog.root",
      System.getProperty("java.io.tmpdir"))
    s"$root/${db}_db"
  }

  private def genLoc(loc: String, gen: Int): String = s"$loc/g$gen"

  /** Rebuild trigger: length + mtime of the source embeddings file. */
  private def fingerprint(s: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    s"graft-ann-v2 ${st.getLen} ${st.getModificationTime}"
  }

  /** Fingerprint the session fast path checks — what `ensure` last built,
    * recovered, or appended for this db IN THIS JVM.
    */
  private val fpMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  private def markerPath(loc: String) =
    new org.apache.hadoop.fs.Path(loc, "_GRAFT_INDEX_READY")

  /** Marker text is `g<gen>\n<fingerprint>`; absence or an unparsable
    * (pre-generation) marker reads as None → rebuild.
    */
  private def readMarker(
      fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path): Option[(Int, String)] = {
    if (!fs.exists(marker)) return None
    val in = fs.open(marker)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    txt.split("\n", 2) match {
      case Array(g, fp) if g.matches("g\\d+") => Some((g.drop(1).toInt, fp))
      case _ => None
    }
  }

  private def writeMarker(
      fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path, gen: Int, fp: String): Unit = {
    val out = fs.create(marker, true)
    try out.write(s"g$gen\n$fp".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Idempotent build-or-recover; returns the catalog database name. */
  def ensure(s: SparkSession, dir: String): String = synchronized {
    val db = dbFor(dir)
    val registered =
      s.catalog.databaseExists(db) && s.catalog.tableExists(s"$db.vectors")
    val loc = locFor(db)
    val hp = new org.apache.hadoop.fs.Path(loc)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = markerPath(loc)
    // a built catalog is self-contained: if the SOURCE dataset is gone
    // (archived after indexing — nothing left to compare or rebuild
    // from), keep serving the persisted index instead of dying in the
    // fingerprint stat
    val want =
      try fingerprint(s, dir)
      catch {
        case _: java.io.FileNotFoundException =>
          if (registered) return db
          readMarker(fs, marker) match {
            case Some((gen, _)) => register(s, db, loc, gen); return db
            case None => throw new IllegalStateException(
              s"$dir/embeddings.parquet does not exist and no persisted " +
                s"ANN catalog is recoverable at $loc")
          }
      }
    // session fast path: registered AND the dataset is unchanged since the
    // registration (the memoized fingerprint is what this JVM last
    // built/recovered — a mid-session overwrite of the embeddings file
    // falls through to the rebuild branch instead of serving stale data)
    if (registered && fpMemo.get(db).contains(want))
      return db
    readMarker(fs, marker) match {
      case Some((gen, fp)) if fp == want =>
        register(s, db, loc, gen)
      case prior =>
        val gen = prior.map(_._1 + 1).getOrElse(0)
        // pre-generation layouts (or unparsable markers) rebuild at g0;
        // drop their flat table dirs so they don't leak under the root
        if (prior.isEmpty)
          tableNames.foreach(t =>
            fs.delete(new org.apache.hadoop.fs.Path(hp, t), true))
        buildIndex(s, scratchDb(db, gen),
          Tables.load(s, dir, "embeddings")
            .select(col("vec_id"), col("embedding")),
          genLoc(loc, gen))
        register(s, db, loc, gen)
        // marker LAST: its presence certifies every table above is complete
        writeMarker(fs, marker, gen, want)
        dropOldGenerations(s, db, loc, fs, keepFrom = gen - 1)
    }
    fpMemo(db) = want
    db
  }

  /** Incremental maintenance — the alternative to a full rebuild when the
    * corpus GROWS: assign the delta vectors to coarse cells against the
    * FROZEN persisted codebooks (the same narrow argmax a probe runs),
    * encode their PQ codes with the frozen PQ codebook, and append both
    * into the existing cell-bucketed tables. No training jobs, no rewrite
    * of existing files; the appended files carry the same bucket-id
    * naming, so probe-side bucket pruning is unchanged. At 100 TB this
    * turns per-ingest-batch index maintenance from a full retrain+rewrite
    * into two bounded bucketed appends — the q99
    * incremental-dedup-vs-history economics applied to the index.
    *
    * Visibility: the tables are append-only, and a non-partitioned
    * catalog table's file listing is taken when the reading plan is
    * RESOLVED — a probe resolved before the append simply does not see
    * the delta yet (plans are never torn within a table), one resolved
    * after sees all of it. A rerank probe resolving mid-append may see
    * delta codes before delta vectors — benign (the delta candidate is
    * dropped from that probe's rerank). Long-lived readers should
    * re-resolve (fresh [[snapshot]]) per unit of work — see annServe's
    * per-micro-batch snapshot. Rebuilds and compactions, by contrast,
    * are fully snapshot-isolated via the generation swap.
    */
  def append(s: SparkSession, db: String, deltaEmb: DataFrame): Unit =
    synchronized {
      val cents = ivfCodebook(s, db)
      val cb = pqCodebook(s, db)
      val e = deltaEmb.select(col("vec_id"), col("embedding"))
      val cell = VectorSearch.ivfCellD(
        VectorFunctions.toDoubles(col("embedding")), cents)
      Layout.appendBucketed(
        e.select(col("vec_id"), col("embedding"), cell.as("cell")),
        s"$db.vectors", "cell", CoarseK)
      Layout.appendBucketed(
        e.select(col("vec_id"), cell.as("cell"),
          NativeExpressions.pqEncode(col("embedding"), cb).as("codes")),
        s"$db.codes", "cell", CoarseK)
    }

  /** [[append]] for an `ensure`-managed dataset catalog: appends the delta
    * and restamps the marker with the dataset's CURRENT fingerprint, so a
    * later `ensure` (this session or a fresh one) recovers the appended
    * index instead of retraining from scratch. Call it after the delta
    * rows have landed in the dataset's embeddings store.
    */
  def appendToDataset(s: SparkSession, dir: String, deltaEmb: DataFrame): String =
    synchronized {
      val db = dbFor(dir)
      val loc = locFor(db)
      val hp = new org.apache.hadoop.fs.Path(loc)
      val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
      val marker = markerPath(loc)
      val (gen, _) = readMarker(fs, marker).getOrElse(throw new IllegalStateException(
        s"no persisted ANN catalog for $dir at $loc — build with ensure() before appending"))
      if (!(s.catalog.databaseExists(db) && s.catalog.tableExists(s"$db.vectors")))
        register(s, db, loc, gen)
      // fingerprint captured BEFORE the append runs: if another ingest
      // lands in the dataset while the (arbitrarily long) append writes,
      // the marker must NOT certify that later data as indexed — a
      // pre-append stamp leaves the mismatch in place, so the next
      // ensure() conservatively rebuilds instead of silently serving an
      // index that is missing the mid-append arrivals
      val now = fingerprint(s, dir)
      append(s, db, deltaEmb)
      writeMarker(fs, marker, gen, now)
      fpMemo(db) = now
      db
    }

  /** Compaction — the operational tail of the append path: every
    * [[append]] batch adds one file per touched bucket, so a long-lived
    * index accumulates small files per bucket (the classic LSM-ish
    * maintenance debt). `compact` rewrites both index tables into a NEW
    * generation with exactly one file per bucket — no retraining, same
    * fingerprint, and the generation swap keeps concurrent probes
    * consistent exactly like a rebuild does. Cost: one bucketed shuffle
    * of each index table (the codes table is ~32× smaller than the
    * corpus), paid only when maintenance decides to — probes never
    * stop working in between, they just read more files.
    */
  def compact(s: SparkSession, dir: String): String = synchronized {
    val db = dbFor(dir)
    val loc = locFor(db)
    val hp = new org.apache.hadoop.fs.Path(loc)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = markerPath(loc)
    val (gen, fp) = readMarker(fs, marker).getOrElse(throw new IllegalStateException(
      s"no persisted ANN catalog for $dir at $loc — build with ensure() before compacting"))
    if (!(s.catalog.databaseExists(db) && s.catalog.tableExists(s"$db.vectors")))
      register(s, db, loc, gen)
    val gen2 = gen + 1
    val scratch = scratchDb(db, gen2)
    val g2 = genLoc(loc, gen2)
    s.sql(s"DROP DATABASE IF EXISTS $scratch CASCADE")
    val g2p = new org.apache.hadoop.fs.Path(g2)
    if (fs.exists(g2p)) fs.delete(g2p, true)
    s.sql(s"CREATE DATABASE $scratch LOCATION '$g2'")
    // bucket-preserving rewrite. The current generation is read as RAW
    // parquet paths, not through the catalog tables: a source carrying
    // the same bucket spec as the write satisfies the repartition's
    // partitioning, so the optimizer ELIDES the exchange and the "rewrite"
    // degenerates to one output file per input file — exactly the small-
    // file state compaction exists to fix. The raw scan has no bucket
    // metadata, so the one-partition-per-bucket shuffle survives.
    val g1 = genLoc(loc, gen)
    Layout.writeBucketed(s.read.parquet(s"$g1/vectors"), s"$scratch.vectors",
      "cell", CoarseK)
    Layout.writeBucketed(s.read.parquet(s"$g1/codes"), s"$scratch.codes",
      "cell", CoarseK)
    s.read.parquet(s"$g1/ivf_codebook").coalesce(1).write
      .format("parquet").saveAsTable(s"$scratch.ivf_codebook")
    s.read.parquet(s"$g1/pq_codebook").coalesce(1).write
      .format("parquet").saveAsTable(s"$scratch.pq_codebook")
    register(s, db, loc, gen2)
    // same data, new layout: the fingerprint is unchanged by design
    writeMarker(fs, marker, gen2, fp)
    dropOldGenerations(s, db, loc, fs, keepFrom = gen2 - 1)
    db
  }

  /** Probe-time-consistent resolution of the full catalog (see
    * [[AnnSnapshot]]) — use this instead of raw `s.table` calls when a
    * rebuild may run concurrently with serving.
    */
  def snapshot(s: SparkSession, db: String): AnnSnapshot = synchronized {
    AnnSnapshot(s.table(s"$db.vectors"), s.table(s"$db.codes"),
      ivfCodebook(s, db), pqCodebook(s, db))
  }

  private def scratchDb(db: String, gen: Int): String = s"${db}_g$gen"

  /** Drop generation directories (and their scratch databases) older than
    * `keepFrom` — the generation before the current one is deliberately
    * kept so probe plans resolved before the swap finish consistently.
    */
  private def dropOldGenerations(
      s: SparkSession, db: String, loc: String,
      fs: org.apache.hadoop.fs.FileSystem, keepFrom: Int): Unit = {
    val hp = new org.apache.hadoop.fs.Path(loc)
    if (!fs.exists(hp)) return
    fs.listStatus(hp).foreach { st =>
      val n = st.getPath.getName
      if (n.matches("g\\d+") && n.drop(1).toInt < keepFrom) {
        s.sql(s"DROP DATABASE IF EXISTS ${scratchDb(db, n.drop(1).toInt)} CASCADE")
        fs.delete(st.getPath, true)
      }
    }
  }

  /** (Re-)point the serving database's EXTERNAL tables at generation
    * `gen`'s files — used both to recover a persisted catalog in a fresh
    * session and to swap the serving tables after a rebuild. External
    * tables with an explicit bucket spec: Spark recovers each file's
    * bucket id from its name, so probe-side bucket pruning survives the
    * session boundary and the swap. Dropping the previous external tables
    * deletes no data.
    */
  private def register(s: SparkSession, db: String, loc: String, gen: Int): Unit = {
    val g = genLoc(loc, gen)
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    tableNames.foreach(t => s.sql(s"DROP TABLE IF EXISTS $db.$t"))
    s.sql(
      s"""CREATE TABLE $db.vectors
         |  (vec_id BIGINT, embedding ARRAY<FLOAT>, cell INT)
         |USING parquet CLUSTERED BY (cell) INTO $CoarseK BUCKETS
         |LOCATION '$g/vectors'""".stripMargin)
    s.sql(
      s"""CREATE TABLE $db.codes
         |  (vec_id BIGINT, cell INT, codes ARRAY<INT>)
         |USING parquet CLUSTERED BY (cell) INTO $CoarseK BUCKETS
         |LOCATION '$g/codes'""".stripMargin)
    s.sql(
      s"""CREATE TABLE $db.ivf_codebook
         |  (cid INT, cv ARRAY<DOUBLE>)
         |USING parquet LOCATION '$g/ivf_codebook'""".stripMargin)
    s.sql(
      s"""CREATE TABLE $db.pq_codebook
         |  (b INT, cid INT, cv8 ARRAY<DOUBLE>)
         |USING parquet LOCATION '$g/pq_codebook'""".stripMargin)
    // memo invalidation AFTER the swap and under the same lock: a probe
    // loading codebooks can never observe a mid-swap catalog
    ivfMemo.remove(db)
    pqMemo.remove(db)
  }

  /** Train and persist a full index catalog for an ARBITRARY embedding
    * relation (columns vec_id LONG, embedding ARRAY<FLOAT>) at an
    * explicit database/location — the library entry point for corpora
    * that are not a driver testdata dir. Destructive: drops whatever is
    * at `db`/`loc`. Lifecycle (markers, fingerprints, generations,
    * recovery) stays with `ensure`; callers of this raw builder manage
    * their own.
    */
  def buildIndex(
      s: SparkSession, db: String, emb: org.apache.spark.sql.DataFrame,
      loc: String): Unit = synchronized {
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
  // rebuilt or re-pointed (`buildIndex`/`register` invalidate). This
  // removes two small collect jobs from every probe-only query and
  // micro-batch.
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
