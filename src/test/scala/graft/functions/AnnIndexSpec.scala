package graft.functions

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lifecycle contract of the persisted ANN index catalog: idempotent
  * ensure, marker-gated recovery, fingerprint-forced rebuild, and
  * memoized codebook loads. Runs against a COPY of the sf0.001
  * embeddings in a temp dir so the shared catalog other suites probe
  * (PlanAuditSpec, StreamingSpec) is never mutated.
  */
class AnnIndexSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("annidx").toString
    Files.copy(
      Paths.get("/root/testdata/sf0.001/embeddings.parquet"),
      Paths.get(s"$d/embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    d
  }

  private def markerOf(db: String): java.nio.file.Path =
    Paths.get(s"${System.getProperty("java.io.tmpdir")}/${db}_db/_GRAFT_INDEX_READY")

  test("ensure builds once, is a no-op while registered, and probes work") {
    val db = AnnIndex.ensure(spark, dir)
    assert(spark.catalog.tableExists(s"$db.vectors"))
    assert(spark.catalog.tableExists(s"$db.codes"))
    assert(spark.catalog.tableExists(s"$db.ivf_codebook"))
    assert(spark.catalog.tableExists(s"$db.pq_codebook"))
    val stamp = Files.getLastModifiedTime(markerOf(db))
    assert(AnnIndex.ensure(spark, dir) == db)
    assert(Files.getLastModifiedTime(markerOf(db)) == stamp,
      "second ensure must not rebuild")
    // the persisted assignment agrees with re-deriving cells from the
    // persisted codebook — index and codebook were written consistently
    val cents = AnnIndex.ivfCodebook(spark, db)
    val mismatch = spark.table(s"$db.vectors")
      .withColumn("re", VectorSearch.ivfCellD(
        VectorFunctions.toDoubles(col("embedding")), cents))
      .filter(col("cell") =!= col("re")).count()
    assert(mismatch == 0, s"$mismatch vectors disagree with the codebook")
    // codes table rows match vectors rows
    assert(spark.table(s"$db.codes").count()
      == spark.table(s"$db.vectors").count())
  }

  /** Copy the built catalog's on-disk layout to the location a different
    * dataset dir would use — simulates a fresh session finding index
    * files on disk (the session catalog has never heard of db2).
    */
  private def cloneCatalogTo(srcDb: String, dstDb: String): Unit = {
    val tmp = System.getProperty("java.io.tmpdir")
    val src = Paths.get(s"$tmp/${srcDb}_db")
    val dst = Paths.get(s"$tmp/${dstDb}_db")
    if (Files.exists(dst)) {
      Files.walk(dst).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.COPY_ATTRIBUTES)
    }
  }

  test("a matching fingerprint recovers the on-disk catalog without rebuild") {
    val db = AnnIndex.ensure(spark, dir)
    // dataset copy that PRESERVES length+mtime → identical fingerprint
    // (the fingerprint is content-derived, not path-derived)
    val dir2 = Files.createTempDirectory("annidx-recover").toString
    Files.copy(Paths.get(s"$dir/embeddings.parquet"),
      Paths.get(s"$dir2/embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.COPY_ATTRIBUTES)
    val db2 = AnnIndex.dbFor(dir2)
    assert(db2 != db)
    cloneCatalogTo(db, db2)
    val stamp = Files.getLastModifiedTime(markerOf(db2))
    assert(AnnIndex.ensure(spark, dir2) == db2)
    // recovery registered external tables over the copied files — marker
    // untouched, index readable with pruning-capable bucket metadata
    assert(Files.getLastModifiedTime(markerOf(db2)) == stamp,
      "matching fingerprint must recover, not rebuild")
    assert(spark.table(s"$db2.vectors").count()
      == spark.table(s"$db.vectors").count())
    assert(AnnIndex.ivfCodebook(spark, db2) == AnnIndex.ivfCodebook(spark, db))
  }

  test("a stale fingerprint on a recovered catalog forces a rebuild") {
    val db = AnnIndex.ensure(spark, dir)
    // dataset copy WITHOUT preserved attributes → different mtime →
    // different fingerprint than the marker cloned from `dir`'s catalog:
    // ensure must take the rebuild branch even though a marker exists
    val dir3 = Files.createTempDirectory("annidx-stale").toString
    Files.copy(Paths.get(s"$dir/embeddings.parquet"),
      Paths.get(s"$dir3/embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(Paths.get(s"$dir3/embeddings.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(12345000L))
    val db3 = AnnIndex.dbFor(dir3)
    cloneCatalogTo(db, db3)
    val staleMarker = Files.readString(markerOf(db3))
    assert(AnnIndex.ensure(spark, dir3) == db3)
    val fresh = Files.readString(markerOf(db3))
    assert(fresh != staleMarker,
      "rebuild must restamp the marker with the new dataset's fingerprint")
    assert(spark.table(s"$db3.vectors").count() > 0)
  }

  test("codebook loads are memoized per catalog db") {
    val db = AnnIndex.ensure(spark, dir)
    assert(AnnIndex.ivfCodebook(spark, db) eq AnnIndex.ivfCodebook(spark, db))
    assert(AnnIndex.pqCodebook(spark, db) eq AnnIndex.pqCodebook(spark, db))
  }
}
