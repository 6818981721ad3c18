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

  test("a stale fingerprint forces a rebuild; a fresh marker is restored") {
    val db = AnnIndex.ensure(spark, dir)
    val marker = markerOf(db)
    val good = Files.readString(marker)
    // simulate an index built from different data: wrong fingerprint +
    // dropped from the session catalog (as a fresh session would see it)
    Files.writeString(marker, "graft-ann-v1 0 0")
    spark.sql(s"DROP DATABASE $db CASCADE")
    val db2 = AnnIndex.ensure(spark, dir)
    assert(db2 == db)
    assert(Files.readString(marker) == good,
      "rebuild must restamp the marker with the current fingerprint")
    assert(spark.table(s"$db.vectors").count() > 0)
  }

  test("codebook loads are memoized per catalog db") {
    val db = AnnIndex.ensure(spark, dir)
    assert(AnnIndex.ivfCodebook(spark, db) eq AnnIndex.ivfCodebook(spark, db))
    assert(AnnIndex.pqCodebook(spark, db) eq AnnIndex.pqCodebook(spark, db))
  }
}
