package graft

/** Driver-contract invariants — the exact failure mode that zeroed round 1
  * (finished queries never wired into SparkEntry) can never silently
  * recur: the registry must be non-empty, names unique, every oracle key
  * backed by a query, and the flagship entry must produce rows.
  */
class ContractSpec extends SparkSpec {

  test("query registry is populated with unique names") {
    val names = Queries.all.map(_.name)
    assert(names.nonEmpty, "SparkEntry.queries must not be empty")
    assert(names.size == names.distinct.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
    assert(names.size >= 107, s"expected the full surface, got ${names.size}")
  }

  test("every oracle key corresponds to a declared query") {
    val q = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(q)
    assert(missing.isEmpty, s"oracles without queries: $missing")
    assert(SparkEntry.oracleSql.size >= 107)
  }

  test("every declared query is oracle-checked (no rows-only entries)") {
    // Since round 3 the whole surface hash-matches DuckDB — N5 fixture
    // queries via golden constants. A new rows-only entry is a conscious
    // decision, not an accident: update this test when making it.
    val rowsOnly = Queries.all.filter(_.oracle.isEmpty).map(_.name)
    assert(rowsOnly.isEmpty, s"queries without oracles: $rowsOnly")
  }

  test("flagship entry returns rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL is single-statement and names no absolute paths") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains(";"), s"$k: oracle must be a single statement")
      assert(!sql.contains("/root/"), s"$k: oracle must use table names")
    }
  }

  test("Tables.load normalizes TIMESTAMP_NTZ event time to TIMESTAMP") {
    // The corpus writer may encode ts as parquet TIMESTAMP_MICROS with
    // isAdjustedToUTC=0, which Spark 4 reads as TIMESTAMP_NTZ — a type
    // withWatermark and unix_micros both reject. Tables.load is the
    // boundary that guarantees downstream operators a single LTZ type.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val d = java.nio.file.Files.createTempDirectory("ntz").toString
    spark.range(5)
      .select(col("id"),
        timestamp_micros(col("id") * 1000000L).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val raw = spark.read.parquet(s"$d/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      "fixture should round-trip as NTZ for this test to be meaningful")
    val loaded = Tables.load(spark, d, "events")
    assert(loaded.schema("ts").dataType == TimestampType)
    // UTC session => value-preserving cast
    val micros = loaded.select(unix_micros(col("ts"))).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(micros.toSeq == Seq(0L, 1000000L, 2000000L, 3000000L, 4000000L))
  }

  test("no query output contains nested (array/map/struct) columns") {
    // The driver's comparison harness sorts result cells in pandas;
    // numpy arrays are unhashable there, so even rows-only checks die
    // on nested output columns. Every declared query must emit scalars.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Queries.all.foreach { q =>
      val nested = q.build(spark, dir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType]
          || f.dataType.isInstanceOf[MapType]
          || f.dataType.isInstanceOf[StructType] => f.name
      }
      assert(nested.isEmpty,
        s"${q.name}: nested output columns ${nested.mkString(",")}")
    }
  }
}
