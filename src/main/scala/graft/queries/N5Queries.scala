package graft.queries

import graft.QueryDef
import graft.n5.{Multiscale, N5, N5Meta}
import org.apache.spark.sql.functions._

/** N5 array-engine checks over the reference's golden fixture
  * (`/root/reference/data/test.n5`). These are rows-only entries for the
  * driver (DuckDB cannot read N5); the hard numeric assertions — block
  * checksums, per-voxel round-trip equality, windowed-mean equivalence —
  * live in the graft.n5 test suites against independently computed values.
  */
object N5Queries {

  private val fixtureRoot = "/root/reference/data/test.n5"
  private val fixtureDs = "mri/c0/s0"
  /** Scratch container path, wiped first — stale blocks from an earlier
    * run with different geometry must not leak into checks.
    */
  private def tmpRoot(name: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_$name.n5"
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (fs.exists(hp)) fs.delete(hp, true)
    p
  }

  val defs: Seq[QueryDef] = Seq(

    // Block-table scan (R1 surface): per-block shape + checksum.
    QueryDef.rowsOnly("q80_n5_block_scan") { (s, _) =>
      N5.read(s, fixtureRoot, fixtureDs)
        .select(col("gx"), col("gy"), col("gz"),
          // shape flattened to scalars: the oracle harness cannot
          // sort/hash array cells
          element_at(col("shape"), 1).as("sx"),
          element_at(col("shape"), 2).as("sy"),
          element_at(col("shape"), 3).as("sz"),
          size(col("data")).as("n"),
          aggregate(col("data"), lit(0L), (a, x) => a + x).as("checksum"))
        .orderBy(col("gx"), col("gy"), col("gz"))
    },

    // Element view stats (UDTF/generator row: 3-D unravel of block payloads).
    QueryDef.rowsOnly("q81_n5_element_stats") { (s, _) =>
      N5.elements(N5.read(s, fixtureRoot, fixtureDs))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("total"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
    },

    // Ranged box scan with grid pruning (R1, read_n5_block semantics).
    QueryDef.rowsOnly("q82_n5_readbox") { (s, _) =>
      N5.readBox(s, fixtureRoot, fixtureDs,
        Array(100L, 100L, 0L), Array(150L, 180L, 16L))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("total"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"))
    },

    // Write path + round trip (R2/R4 surface): rechunk to 64^3 gzip and
    // verify voxel-sum equality inside the query output.
    QueryDef.rowsOnly("q83_n5_roundtrip") { (s, _) =>
      val out = tmpRoot("rt")
      N5.rechunk(s, fixtureRoot, fixtureDs, out, "vol/s0", Array(64, 64, 64))
      val orig = N5.elements(N5.read(s, fixtureRoot, fixtureDs))
        .agg(sum(col("v")).as("orig_sum"), count(lit(1)).as("orig_n"))
      val rt = N5.elements(N5.read(s, out, "vol/s0"))
        .agg(sum(col("v")).as("rt_sum"), count(lit(1)).as("rt_n"))
      orig.crossJoin(rt)
        .select(col("orig_n"), col("rt_n"), col("orig_sum"), col("rt_sum"),
          (col("orig_sum") === col("rt_sum")
            && col("orig_n") === col("rt_n")).cast("int").as("ok"))
    },

    // Multiscale pyramid (R9): s1 windowed mean, trim boundary.
    QueryDef.rowsOnly("q84_n5_multiscale") { (s, _) =>
      val out = tmpRoot("ms")
      N5.rechunk(s, fixtureRoot, fixtureDs, out, "vol/s0", Array(128, 128, 128))
      val attrs = Multiscale.downsampleLevel(s, out, "vol", 1, Array(2, 2, 2))
      N5.elements(N5.read(s, out, "vol/s1"))
        .agg(count(lit(1)).as("n"), sum(col("v").cast("long")).as("total"))
        .withColumn("dims", lit(attrs.dimensions.mkString("x")))
    },

    // Bulk-volume throughput: synthesize a 256x256x64 (4.2M voxel) volume,
    // write 64^3 blocks, fragment-rechunk to 96^3, derive one multiscale
    // level — the full volume dataflow at a size where per-block work, the
    // fragment shuffle, and the reduction all register in the bench.
    QueryDef.rowsOnly("q85_n5_bulk_pipeline") { (s, _) =>
      import graft.n5.{Compression, DatasetAttributes, Dtype}
      val out = tmpRoot("bulk")
      val dims = Array(256L, 256L, 64L)
      val attrs = DatasetAttributes(dims, Array(64, 64, 64), Dtype.UInt8,
        Compression("gzip"))
      val elems = s.range(dims.product)
        .select((col("id") % dims(0)).as("x"),
          ((col("id") / dims(0)) % dims(1)).cast("long").as("y"),
          (col("id") / (dims(0) * dims(1))).cast("long").as("z"))
        .select(col("x"), col("y"), col("z"),
          ((col("x") * 7 + col("y") * 13 + col("z") * 29) % 256).as("v"))
      N5.write(N5.blocksFromElements(elems, attrs,
        org.apache.spark.sql.types.ShortType), out, "vol/s0", attrs)
      graft.n5.Regroup.rechunkBlocks(s, out, "vol/s0", out, "re/s0",
        Array(96, 96, 96))
      Multiscale.downsampleLevel(s, out, "re", 1, Array(2, 2, 2))
      val a = N5.elements(N5.read(s, out, "re/s0"))
        .agg(count(lit(1)).as("n0"), sum(col("v")).as("sum0"))
      val b = N5.elements(N5.read(s, out, "re/s1"))
        .agg(count(lit(1)).as("n1"), sum(col("v").cast("long")).as("sum1"))
      a.crossJoin(b)
    }
  )
}
