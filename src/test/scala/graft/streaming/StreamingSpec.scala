package graft.streaming

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.n5.N5
import graft.sources.tiff.TiffVolume
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream-equals-batch equivalence (SURVEY §5.5): the same windowed
  * aggregations produce identical results via Structured Streaming
  * (file source, Trigger.AvailableNow, complete/append mode) and plain
  * batch execution.
  */
class StreamingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // a dedicated dir holding only the events table, ts already converted to
  // a proper TIMESTAMP, for the file stream source
  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("evstream").toString
    Tables.load(spark, sfDir, "events").write.mode("overwrite").parquet(s"$d/events")
    s"$d/events"
  }

  private def streamEvents(): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(eventsDir).schema)
      .parquet(eventsDir)

  private def batchEvents(): DataFrame = Tables.load(spark, sfDir, "events")

  private def runComplete(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"stream vs batch mismatch: stream=${a.count()} batch=${b.count()}")
  }

  test("tumbling window agg: stream (AvailableNow) equals batch") {
    val streamed = runComplete(Streams.tumblingAgg(streamEvents()), "tumb")
    val batch = Streams.tumblingAgg(batchEvents())
    assertSameRows(streamed, batch)
  }

  test("sliding window agg: stream equals batch") {
    val streamed = runComplete(Streams.slidingAgg(streamEvents()), "slide")
    val batch = Streams.slidingAgg(batchEvents())
    assertSameRows(streamed, batch)
  }

  test("session window agg: stream equals batch") {
    val streamed = runComplete(Streams.sessionAgg(streamEvents()), "sess")
    val batch = Streams.sessionAgg(batchEvents())
    assertSameRows(streamed, batch)
  }

  test("stateful dedup within watermark drops in-stream duplicates") {
    // duplicate every event, stream the union, dedup on event_id
    val d = Files.createTempDirectory("dup").toString
    val ev = spark.read.parquet(eventsDir)
    ev.union(ev).write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(ev.schema).parquet(d)
    val q = Streams.dedupWithinWatermark(stream)
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("dedup")
    val expected = batchEvents().count()
    assert(got.count() == expected,
      s"dedup kept ${got.count()} of ${2 * expected}, want $expected")
    assert(got.select(col("event_id")).distinct().count() == expected)
  }

  test("watermarked stream-stream join (click attribution) equals batch") {
    // the SAME Streams.clickAttribution plan runs twice: streamed (both
    // sides watermarked; the time bound becomes the state eviction
    // policy; inner-join rows emit in append mode as matches land) and
    // in batch mode (watermarks no-op → plain equi-join + range filter,
    // the q110 oracle form)
    val q = Streams.clickAttribution(streamEvents())
      .writeStream.format("memory").queryName("clickattr")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("clickattr")
    val expected = Streams.clickAttribution(batchEvents())
    assert(expected.count() > 0, "fixture should produce attribution pairs")
    assertSameRows(got, expected)
  }

  test("q110 stream-stream join: watermark evicts join state across micro-batches") {
    // six time-ordered slices streamed one per trigger: the watermark
    // advances between batches, so buffered clicks older than
    // (purchase-watermark - 60 min) and purchases older than the click
    // watermark must LEAVE the state store — this is the property that
    // bounds join state at rate × window on an unbounded stream. The
    // result must still equal the batch run: cross-slice matches are
    // always old-click × newer-purchase, which eviction provably retains
    // (a click lives 60 min + watermark past its own timestamp).
    val d = Files.createTempDirectory("ssjoin").toString
    val ev = spark.read.parquet(eventsDir)
    val sliced = ev.withColumn("slice",
      ((dayofmonth(col("ts")) - 1) / 5).cast("int"))
    (0 until 6).foreach { i =>
      sliced.filter(col("slice") === i).drop("slice")
        .coalesce(1).write.mode("append").parquet(d)
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val q = Streams.clickAttribution(stream)
      .writeStream.format("memory").queryName("clickattr_evict")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assertSameRows(spark.table("clickattr_evict"),
      Streams.clickAttribution(batchEvents()))
    val sides = batchEvents()
      .filter(col("event_type").isin("click", "purchase")).count()
    val finalState = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
      .getOrElse(sys.error("no state operator progress recorded"))
    info(s"final join state: $finalState rows of $sides streamed join inputs")
    assert(finalState < sides / 2,
      s"watermark did not evict: $finalState state rows for $sides inputs " +
        "— join state would grow with stream length, not rate × window")
  }

  test("q112 outer stream-stream join: watermark flushes null-extended rows (prefix-complete)") {
    // same six time-ordered slices; outer rows can only emit once the
    // watermark proves no purchase can still arrive, so the assertion is
    // soundness (streamed ⊆ batch) + prefix-completeness (every click
    // older than the final watermark's flush cutoff HAS emitted, matched
    // or null-extended) — whole-stream equality is impossible by
    // construction: the last ~70 minutes of unmatched clicks are still
    // buffered when the AvailableNow run drains.
    val d = Files.createTempDirectory("ssouter").toString
    val ev = spark.read.parquet(eventsDir)
    val sliced = ev.withColumn("slice",
      ((dayofmonth(col("ts")) - 1) / 5).cast("int"))
    (0 until 6).foreach { i =>
      sliced.filter(col("slice") === i).drop("slice")
        .coalesce(1).write.mode("append").parquet(d)
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val q = Streams.clickAttributionOuter(stream)
      .writeStream.format("memory").queryName("clickattr_outer")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("clickattr_outer")
    val batch = Streams.clickAttributionOuter(batchEvents())
    assert(got.exceptAll(batch).isEmpty,
      "streamed outer join emitted rows the batch join would not")
    assert(got.filter(col("purchase_id").isNull).count() > 0,
      "no null-extended rows flushed — the outer half never fired")
    // flush cutoff: global watermark = min(max click_ts, max purchase_ts)
    // - 10 min delay; an unmatched click flushes once the watermark
    // passes click_ts + 60 min. One extra minute of slack on the bound.
    val maxes = batchEvents()
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type")).agg(max(col("ts")).as("m"))
      .collect().map(_.getTimestamp(1).getTime)
    val cutoff = new java.sql.Timestamp(maxes.min - (10 + 60 + 1) * 60 * 1000L)
    val prefix = batch.filter(col("click_ts") <= lit(cutoff))
    assert(prefix.exceptAll(got).isEmpty,
      s"clicks before $cutoff must all have flushed (matched or null-extended)")
  }

  test("custom mapGroupsWithState user stats equal batch groupBy") {
    val q = Streams.userStats(streamEvents())
      .writeStream.format("memory").queryName("ustats")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // update mode re-emits a row per group per batch; keep the final state
    val got = spark.table("ustats")
      .groupBy(col("user_id")).agg(max(col("n")).as("n"))
    val expected = batchEvents()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assertSameRows(got, expected)
  }

  test("transformWithState user stats equal batch groupBy (RocksDB store)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // Materialize the session's lazy ObservationManager first: once ANY
      // query observes (q157 does), a processor that captured the session
      // would fail Task-not-serializable — but only in suite orders where
      // an observing spec ran earlier. Forcing it here makes that capture
      // bug deterministic instead of order-dependent.
      val warmObs = org.apache.spark.sql.Observation("tws_obs_warm")
      spark.range(1).observe(warmObs, count(lit(1)).as("n")).collect()
      val q = Streams.userStatsTws(streamEvents())
        .writeStream.format("memory").queryName("ustats_tws")
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table("ustats_tws")
        .groupBy(col("user_id")).agg(max(col("n")).as("n"))
      val expected = batchEvents()
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      assertSameRows(got, expected)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming ANN probes against the persisted index equal the batch run") {
    import graft.functions.{AnnIndex, VectorSearch}
    // build (or recover) the index catalog once; the streaming query runs
    // ONLY the probe plan per micro-batch
    val db = AnnIndex.ensure(spark, sfDir)
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val probes = emb.filter(col("vec_id") >= 20 && col("vec_id") < 30)
    // two probe files → two micro-batches under maxFilesPerTrigger=1
    val d = Files.createTempDirectory("annprobes").toString
    probes.filter(col("vec_id") < 25).coalesce(1).write.mode("append").parquet(d)
    probes.filter(col("vec_id") >= 25).coalesce(1).write.mode("append").parquet(d)
    val stream = spark.readStream.schema(probes.schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = Streams.annServe(spark, stream, db, k = 5, c = 50, nProbe = 4) {
      (out, id) =>
        got.synchronized {
          got ++= out.collect().map(_.mkString("|"))
          batches += id
        }
    }
    q.awaitTermination()
    assert(batches.size == 2, s"expected two probe micro-batches, got $batches")
    val batch = VectorSearch.ivfPqTopKRerank(
        spark.table(s"$db.codes"), spark.table(s"$db.vectors"),
        probes, k = 5, c = 50,
        AnnIndex.ivfCodebook(spark, db), AnnIndex.pqCodebook(spark, db),
        nProbe = 4)
      .collect().map(_.mkString("|"))
    assert(got.toSet == batch.toSet,
      s"stream vs batch ANN mismatch: stream=${got.size} batch=${batch.length}")
    assert(got.size == batch.length)
  }

  test("streaming IMI probes against the persisted IMI catalog equal " +
      "the batch run (r14)") {
    import graft.functions.{AnnIndex, VectorSearch}
    val db = AnnIndex.ensureImi(spark, sfDir)
    val (cb1, cb2, half) = AnnIndex.imiCodebooks(spark, db)
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val probes = emb.filter(col("vec_id") >= 20 && col("vec_id") < 30)
    val d = Files.createTempDirectory("imiprobes").toString
    probes.filter(col("vec_id") < 25).coalesce(1).write.mode("append").parquet(d)
    probes.filter(col("vec_id") >= 25).coalesce(1).write.mode("append").parquet(d)
    val stream = spark.readStream.schema(probes.schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = Streams.imiServe(spark, stream, db, k = 3) {
      (out, id) =>
        got.synchronized {
          got ++= out.collect().map(_.mkString("|"))
          batches += id
        }
    }
    q.awaitTermination()
    assert(batches.size == 2, s"expected two probe micro-batches, got $batches")
    val batch = VectorSearch.imiTopKIndexed(
        spark.table(s"$db.vectors"), probes, k = 3, cb1, cb2, half)
      .collect().map(_.mkString("|"))
    assert(got.toSet == batch.toSet,
      s"stream vs batch IMI mismatch: stream=${got.size} batch=${batch.length}")
    assert(got.size == batch.length)
  }

  test("annServe picks up an index append on the next micro-batch") {
    import graft.functions.AnnIndex
    val tmp = System.getProperty("java.io.tmpdir")
    val full = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val db = "graft_ann_serve_maint"
    AnnIndex.buildIndex(spark, db, full.filter(col("vec_id") < 400),
      s"$tmp/${db}_db")
    val probes = full.filter(col("vec_id") < 3)
    // the delta is an exact COPY of the probe vectors under fresh ids
    // (vec_id + 10000): cosine 1.0 against its probe, so once visible it
    // MUST occupy rank 1 — presence/absence per batch is deterministic
    val delta = probes.select((col("vec_id") + 10000).as("vec_id"),
      col("embedding"))
    // two identical probe files → two micro-batches of the same probes
    val d = Files.createTempDirectory("annprobes-maint").toString
    probes.coalesce(1).write.mode("append").parquet(d)
    probes.coalesce(1).write.mode("append").parquet(d)
    val stream = spark.readStream.schema(probes.schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    // batch ids arrive in order and foreachBatch callbacks run
    // sequentially: appending inside batch 0's sink makes "maintenance
    // between micro-batches" deterministic
    val perBatch = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val q = Streams.annServe(spark, stream, db, k = 3, c = 50, nProbe = 4) {
      (out, id) =>
        perBatch.synchronized {
          perBatch(id) = out.collect().map(_.getLong(2)).toSet
        }
        if (id == 0) AnnIndex.append(spark, db, delta)
    }
    q.awaitTermination()
    assert(perBatch.keySet == Set(0L, 1L), s"expected two batches: $perBatch")
    assert(!perBatch(0L).exists(_ >= 10000),
      "delta ids visible before the append happened")
    assert(probes.collect().map(_.getLong(0) + 10000)
      .forall(perBatch(1L).contains),
      s"append not visible to the next micro-batch: ${perBatch(1L)}")
  }

  test("streaming delta ingest appends to the index; equals one-shot append") {
    import graft.functions.{AnnIndex, VectorSearch}
    val tmp = System.getProperty("java.io.tmpdir")
    val full = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = full.filter(col("vec_id") % 10 < 8)
    val delta = full.filter(col("vec_id") % 10 >= 8)
    // streamed catalog: base build, then deltas arrive as two micro-batches
    val db = "graft_ann_stream"
    AnnIndex.buildIndex(spark, db, base, s"$tmp/${db}_db")
    val d = Files.createTempDirectory("anndeltas").toString
    delta.filter(col("vec_id") < 250).coalesce(1).write.mode("append").parquet(d)
    delta.filter(col("vec_id") >= 250).coalesce(1).write.mode("append").parquet(d)
    val stream = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val q = Streams.annIngest(spark, stream, db)
    q.awaitTermination()
    assert(spark.table(s"$db.vectors").count() == full.count())
    assert(spark.table(s"$db.codes").count() == full.count())
    // reference catalog: same base build (identical deterministic
    // training), whole delta appended in one call
    val ref = "graft_ann_stream_ref"
    AnnIndex.buildIndex(spark, ref, base, s"$tmp/${ref}_db")
    AnnIndex.append(spark, ref, delta)
    val probes = full.filter(col("vec_id") % 10 >= 8 && col("vec_id") < 50)
    def topk(cat: String): Seq[String] =
      VectorSearch.ivfPqTopK(spark.table(s"$cat.codes"), probes, 5,
          AnnIndex.ivfCodebook(spark, cat), AnnIndex.pqCodebook(spark, cat),
          nProbe = 2)
        .collect().map(_.mkString("|")).toSeq.sorted
    assert(topk(db) == topk(ref),
      "streamed micro-batch appends diverge from a one-shot append")
  }

  test("self-maintaining ingest stream: per-batch policy folds append " +
      "debt, probe-equivalent to append-only") {
    import graft.functions.{AnnIndex, VectorSearch}
    val tmp = System.getProperty("java.io.tmpdir")
    val full = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = full.filter(col("vec_id") % 10 < 8)
    val delta = full.filter(col("vec_id") % 10 >= 8)
    val db = "graft_ann_stream_mnt"
    AnnIndex.buildIndex(spark, db, base, s"$tmp/${db}_db")
    val d = Files.createTempDirectory("anndeltas-mnt").toString
    delta.filter(col("vec_id") < 250).coalesce(1).write.mode("append").parquet(d)
    delta.filter(col("vec_id") >= 250).coalesce(1).write.mode("append").parquet(d)
    val stream = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    // files-per-bucket = 1.0: every batch append trips the policy and
    // folds, so the stream leaves the index compact
    Streams.annIngest(spark, stream, db,
      maxFilesPerBucket = 1.0).awaitTermination()
    assert(spark.table(s"$db.vectors").count() == full.count())
    def files(t: String): Int = spark.table(s"$db.$t").inputFiles.length
    assert(files("vectors") <= AnnIndex.CoarseK,
      "self-maintaining stream left more than one file per bucket")
    assert(files("codes") <= AnnIndex.CoarseK)
    // probe-equivalent to the append-only reference stream catalog
    // (graft_ann_stream, built by the previous test's identical
    // deterministic training) when both exist; otherwise vs bulk append
    val ref = "graft_ann_stream_mnt_ref"
    AnnIndex.buildIndex(spark, ref, base, s"$tmp/${ref}_db")
    AnnIndex.append(spark, ref, delta)
    val probes = full.filter(col("vec_id") % 10 >= 8 && col("vec_id") < 50)
    def topk(cat: String): Seq[String] =
      VectorSearch.ivfPqTopK(spark.table(s"$cat.codes"), probes, 5,
          AnnIndex.ivfCodebook(spark, cat), AnnIndex.pqCodebook(spark, cat),
          nProbe = 2)
        .collect().map(_.mkString("|")).toSeq.sorted
    assert(topk(db) == topk(ref),
      "maintenance folds changed streaming probe results")
  }

  test("streaming incremental dedup: each digest emits once; history absorbs the stream") {
    val tmp = System.getProperty("java.io.tmpdir")
    val db = "graft_dedup_stream"
    val loc = s"$tmp/${db}_db"
    // fresh store (delete leftovers: saveAsTable refuses a non-empty dir)
    val hp = new org.apache.hadoop.fs.Path(loc)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    if (fs.exists(hp)) fs.delete(hp, true)
    Streams.ensureDedupStore(spark, db, loc)

    // two micro-batches: the corpus, then the same corpus under shifted
    // ids — every row of the second batch is a cross-batch duplicate
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val d = Files.createTempDirectory("dedupstream").toString
    docs.coalesce(1).write.mode("append").parquet(d)
    docs.withColumn("doc_id", col("doc_id") + 100000)
      .coalesce(1).write.mode("append").parquet(d)
    val stream = spark.readStream.schema(spark.read.parquet(d).schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val perBatch = scala.collection.mutable.Map[Long, Array[String]]()
    val q = Streams.dedupIngest(spark, stream, db) { (novel, id) =>
      perBatch(id) = novel.select(col("digest")).collect().map(_.getString(0))
    }
    q.awaitTermination()

    val expected = docs.select(sha2(
        graft.functions.TextFunctions.normalizeText(col("text")), 256))
      .distinct().count()
    val emitted = perBatch.values.flatten.toSeq
    assert(emitted.size.toLong == expected,
      s"emitted ${emitted.size} novel docs, want $expected distinct digests")
    assert(emitted.distinct.size == emitted.size, "a digest was emitted twice")
    assert(perBatch.size == 2 && perBatch.values.exists(_.isEmpty),
      "the all-duplicates batch should emit nothing")
    assert(spark.table(s"$db.history_digests")
      .select(col("digest")).distinct().count() == expected,
      "history must hold exactly the corpus's distinct digests")
  }

  test("streaming CDC apply: incremental state equals full-log reduction; untouched buckets stay untouched") {
    import graft.operators.CdcApply
    val tmp = Files.createTempDirectory("cdcstream").toString
    val statePath = s"$tmp/state"
    val srcDir = s"$tmp/log"
    def withOp(df: DataFrame): DataFrame = df
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"))
    val ev = withOp(Tables.load(spark, sfDir, "events"))
    val cut = "2024-01-15"
    // batch 1: the first half of the log, all users
    ev.filter(col("ts") < cut).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)

    def run(): Unit = {
      val q = Streams.cdcApply(spark,
        spark.readStream.schema(spark.read.parquet(srcDir).schema)
          .parquet(srcDir),
        statePath, keys = Seq("user_id"), orderCols = Seq("ts", "event_id"),
        opCol = "op", buckets = 8, checkpoint = Some(s"$tmp/ckpt"))
      q.awaitTermination()
    }
    run()
    def bucketFiles(): Map[String, Set[String]] = {
      val root = new java.io.File(statePath)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("__kb="))
        .map(d => d.getName -> d.listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).toSet).toMap
    }
    val before = bucketFiles()

    // batch 2 (one file => one micro-batch): user 7's second-half events
    // plus an explicit late tombstone for user 13 — touches <= 2 buckets
    val late = ev.filter(col("ts") >= cut && col("user_id") === 7)
      .unionByName(withOp(Tables.load(spark, sfDir, "events"))
        .filter(col("user_id") === 13).limit(1)
        .select(col("user_id"), lit(999999L).as("event_id"),
          lit(java.sql.Timestamp.valueOf("2024-02-15 00:00:00")).as("ts"),
          lit("error").as("event_type"), lit("D").as("op")))
    late.coalesce(1).write.mode("append").parquet(srcDir)
    run() // checkpointed: only the new file is processed

    // equivalence with the batch reduction of the log THAT WAS STREAMED
    // (first half for everyone + user 7's second half + the tombstone)
    val streamedLog = ev.filter(col("ts") < cut)
      .unionByName(late)
    val expect = CdcApply.currentState(streamedLog, Seq("user_id"),
        Seq("ts", "event_id"), Some("op"))
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toSet
    val got = spark.read.parquet(statePath)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect().toSet
    assert(got == expect, s"state diverged: got=${got.size} want=${expect.size}")
    assert(!got.exists(_._1 == 13L), "tombstoned user survived")

    // incrementality: bucket partitions the second batch did not touch
    // kept their exact file sets
    val after = bucketFiles()
    val touched = Set(7L, 13L).map(u => "__kb=" +
      math.floorMod(org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashLong(u, 42), 8))
    val untouched = before.keySet -- touched
    assert(untouched.nonEmpty, "test setup: every bucket was touched")
    untouched.foreach { d =>
      assert(after(d) == before(d), s"untouched bucket $d was rewritten")
    }
  }

  test("streaming JSONL ingest: explicit schema, malformed lines dead-lettered") {
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("jsonlstream").toString
    val good = (0 until 50).map(i =>
      s"""{"doc_id":$i,"text":"doc number $i","lang":"en"}""")
    val bad = Seq(
      """{"doc_id":999,"text":"unterminated""",
      """not json at all""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/part1.jsonl"),
      (good.take(25) ++ bad.take(1) ++ good.drop(25) ++ bad.drop(1))
        .mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    var rows = Vector.empty[(Long, String)]
    var dead = Vector.empty[String]
    val q = Streams.jsonlIngest(spark, tmp, schema) { (batch, _) =>
      rows ++= batch.select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
    } { (letters, _) =>
      dead ++= letters.collect().map(_.getString(0))
    }
    q.awaitTermination()
    assert(rows.size == 50 && rows.map(_._1).sorted == (0L until 50L),
      s"good rows lost or duplicated: ${rows.size}")
    assert(dead.size == 2 && dead.exists(_.contains("not json at all")),
      s"malformed lines not dead-lettered: $dead")
  }

  test("streaming quality gate equals the batch gate (train offline, serve online)") {
    val w = Array(0.1, 2.0, -1.0, 0.5) // batch-trained weights, as literals
    val tmp = Files.createTempDirectory("qgate").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    docs.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema).parquet(tmp)
    val q = Streams.qualityGate(stream, w)
      .select(col("doc_id"), col("score"))
      .writeStream.format("memory").queryName("qgate_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("qgate_out")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val batch = Streams.qualityGate(docs, w)
      .select(col("doc_id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamed == batch, s"stream gate diverged: " +
      s"${streamed.size} vs ${batch.size} rows")
    assert(batch.nonEmpty && batch.size < docs.count(),
      "gate should filter some but not all docs at these weights")
  }

  test("streaming HTML extraction gate equals the batch extraction " +
      "(crawl-ingest shape)") {
    val tmp = Files.createTempDirectory("hgate").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    graft.functions.HtmlText.documentsAsHtml(docs).toDF()
      .write.mode("overwrite").parquet(tmp)
    val pages = spark.read.parquet(tmp)
    val stream = spark.readStream.schema(pages.schema).parquet(tmp)
    val q = Streams.extractGate(stream, maxLinkDensity = 0.15)
      .writeStream.format("memory").queryName("hgate_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("hgate_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val batch = Streams.extractGate(pages, maxLinkDensity = 0.15).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(streamed == batch,
      s"stream extraction diverged: ${streamed.size} vs ${batch.size} rows")
    assert(batch.nonEmpty && batch.size < docs.count(),
      "link-density gate should drop some but not all pages")
    // the extraction itself must reproduce the source text exactly —
    // the q223 identity, here on the streamed path
    val src = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    streamed.foreach { case (id, clean, _) =>
      assert(clean == src(id), s"doc $id text diverged through the stream")
    }
  }

  test("streaming WARC ingest: .warc.gz files arrive as a stream, records " +
      "walk + extract equal the batch run (the live-crawl shape)") {
    import graft.sources.warc.WarcIO
    import spark.implicits._
    val tmp = Files.createTempDirectory("warcstream").toString
    val docsDf = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val docs = docsDf.collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val htmlById = graft.functions.HtmlText.documentsAsHtml(docsDf)
      .collect().map(h => h.doc_id -> h.html).toMap
    // four real .warc.gz files, each with a warcinfo record up front
    docs.grouped((docs.length + 3) / 4).zipWithIndex.foreach { case (grp, i) =>
      val pages = grp.map { case (id, _) =>
        (s"http://example.test/doc/$id", htmlById(id))
      }
      Files.write(java.nio.file.Paths.get(tmp, s"part-$i.warc.gz"),
        WarcIO.writeWarcGz(pages.toSeq))
    }
    def walk(df: DataFrame): DataFrame =
      df.select(col("content")).as[Array[Byte]]
        .flatMap(bytes => WarcIO.readWarcGz(bytes)
          .filter(_.warcType == "response")
          .map { r =>
            val entity = WarcIO.httpEntity(r.payload)
            assert(entity.status == 200)
            val uri = r.targetUri.get
            (uri.substring(uri.lastIndexOf('/') + 1).toLong,
              graft.functions.HtmlText.extract(entity.text).clean_text)
          })
        .toDF("id", "clean_text")
    val stream = spark.readStream.format("binaryFile")
      .schema(spark.read.format("binaryFile").load(tmp).schema)
      .load(tmp)
    val q = walk(stream)
      .writeStream.format("memory").queryName("warc_stream_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("warc_stream_out").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = walk(spark.read.format("binaryFile").load(tmp)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch, s"${streamed.size} vs ${batch.size}")
    // text identity through gzip + WARC + HTTP + HTML, on the stream
    assert(streamed == docs.toSet, "streamed extraction diverged from source")
  }

  test("streaming PDF extraction: documents arrive as PDFs, per-batch " +
      "extraction equals the batch run AND the source text (q230's " +
      "identity on the streamed path)") {
    import graft.functions.PdfText
    import spark.implicits._
    val tmp = Files.createTempDirectory("pdfstream").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(60)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, text) =>
      val lines = PdfText.layoutLines(text, 60)
      val pages = lines.grouped(math.max(1, (lines.size + 1) / 2)).toSeq
      Files.write(java.nio.file.Paths.get(tmp, f"$id%08d.pdf"),
        PdfText.writePdf(pages))
    }
    def walk(df: DataFrame): DataFrame =
      Streams.pdfExtract(
        df.select(
          regexp_extract(col("path"), "(\\d+)\\.pdf$", 1).cast("long")
            .as("doc_id"),
          col("content").as("bytes")))
    val stream = spark.readStream.format("binaryFile")
      .schema(spark.read.format("binaryFile").load(tmp).schema)
      .load(tmp)
    val q = walk(stream)
      .writeStream.format("memory").queryName("pdf_stream_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("pdf_stream_out").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val batch = walk(spark.read.format("binaryFile").load(tmp)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(streamed == batch, s"${streamed.size} vs ${batch.size}")
    // reassembled text identity through xref + Flate + operators
    val bySrc = docs.toMap
    streamed.foreach { case (id, _, text) =>
      assert(text.replace('\n', ' ') == bySrc(id),
        s"doc $id text diverged through the PDF stream")
    }
  }

  test("streaming MP4 scene cuts: clips arrive as a stream, the container " +
      "walk + MJPEG decode + cut kernel equal the batch run") {
    import spark.implicits._
    val media = graft.functions.Multimodal.embeddingsAsMp4(
      Tables.load(spark, sfDir, "embeddings").limit(80)).toDF()
    val tmp = Files.createTempDirectory("mp4stream").toString
    media.collect().foreach { r =>
      Files.write(
        java.nio.file.Paths.get(tmp, f"${r.getLong(0)}%08d.mp4"),
        r.getAs[Array[Byte]](2))
    }
    def walk(df: DataFrame): DataFrame =
      Streams.mp4CutGate(
        df.select(
          regexp_extract(col("path"), "(\\d+)\\.mp4$", 1).cast("long")
            .as("id"),
          lit("video/mp4").as("media_type"),
          col("content").as("bytes")),
        sumDeltaThreshold = 7680L)
    val stream = spark.readStream.format("binaryFile")
      .schema(spark.read.format("binaryFile").load(tmp).schema)
      .load(tmp)
    val q = walk(stream)
      .writeStream.format("memory").queryName("mp4_stream_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("mp4_stream_out").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5))).toSet
    val batch = walk(spark.read.format("binaryFile").load(tmp)).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5))).toSet
    assert(streamed == batch, s"${streamed.size} vs ${batch.size}")
    assert(streamed.exists(_._2 > 0) && streamed.exists(_._2 == 0),
      "cut counts should be genuinely mixed, not vacuous")
  }

  test("streaming mixture gate equals the q159 batch materialization per domain") {
    // solver offline over the corpus snapshot; rates become literals
    val rates = graft.queries.TrainingPipeline.mixtureRates(spark, sfDir)
      .select(col("source"), col("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val tmp = Files.createTempDirectory("mixgate").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    docs.repartition(3).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema).parquet(tmp)
    val q = Streams.mixtureGate(stream, rates)
      .select(col("doc_id"), col("epoch"))
      .writeStream.format("memory").queryName("mixgate_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("mixgate_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Streams.mixtureGate(docs, rates)
      .select(col("doc_id"), col("epoch"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"stream mixture diverged: ${streamed.size} vs ${batch.size} rows")
    // and the batch transform matches the q159 report's emitted counts
    val report = graft.Queries.byName("q159_mixture_token_budget")
      .build(spark, sfDir)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("rows_emitted")).toMap
    val bySource = Streams.mixtureGate(docs, rates)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    report.foreach { case (src, n) =>
      assert(bySource.getOrElse(src, 0L) == n,
        s"$src: gate emitted ${bySource.getOrElse(src, 0L)}, q159 says $n")
    }
    // upsampling must actually occur (epoch cap 3, budget 2x corpus)
    assert(streamed.exists(_._2 >= 2L), "some doc should repeat (epoch 2+)")
  }

  test("streaming semantic gate flags ingest vectors near the eval set (stream = batch)") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // eval carve-out offline (tiny by construction); vectors become literals
    val evalIds = emb.select(col("vec_id"))
      .orderBy(md5(concat(lit("sg"), col("vec_id").cast("string"))).asc)
      .limit(5).collect().map(_.getLong(0)).toSet
    val evalVecs = emb.filter(col("vec_id").isInCollection(evalIds))
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val ingest = emb.filter(!col("vec_id").isInCollection(evalIds))
    val tmp = Files.createTempDirectory("sgate").toString
    ingest.repartition(3).write.mode("overwrite").parquet(tmp)
    val q = Streams.semanticGate(
        spark.readStream.schema(spark.read.parquet(tmp).schema).parquet(tmp),
        evalVecs)
      .select(col("vec_id"), col("max_cos"), col("keep"))
      .writeStream.format("memory").queryName("sgate_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("sgate_out").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val batch = Streams.semanticGate(ingest, evalVecs)
      .select(col("vec_id"), col("max_cos"), col("keep")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(streamed == batch, s"semantic gate diverged: " +
      s"${streamed.size} vs ${batch.size}")
    assert(streamed.size == ingest.count())
    // cross-check one row against a direct driver-side cosine
    val (vid, got, _) = streamed.head
    val v = emb.filter(col("vec_id") === vid)
      .collect()(0).getSeq[Float](1).map(_.toDouble)
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = evalVecs.map(ev =>
      BigDecimal(cos(v, ev)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble).max
    assert(math.abs(got - want) < 1e-9,
      s"vec $vid: gate max_cos $got vs direct $want")
  }

  test("streaming decontamination equals the q135 batch gate on the same slice") {
    val tmp = Files.createTempDirectory("decontam").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val probe = docs.filter(col("doc_id") < 10)
    val corpus = docs.filter(col("doc_id") >= 10)
    // several parquet files → several micro-batch candidates; the gate
    // is per-doc so batch boundaries cannot change verdicts
    corpus.repartition(4).write.mode("overwrite").parquet(tmp)
    var got = Vector.empty[(Long, Long, Boolean)]
    val q = Streams.decontaminate(
      spark.readStream.schema(spark.read.parquet(tmp).schema).parquet(tmp),
      probe) { (gated, _) =>
      got ++= gated.select(col("doc_id"), col("n_shared"), col("keep"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    }
    q.awaitTermination()
    val oracle = graft.Queries.byName("q135_decontaminate_bloom")
      .build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got.size == got.toSet.size, "a doc was gated twice")
    assert(got.toSet == oracle,
      s"stream gate diverged from q135: ${got.size} vs ${oracle.size} rows")
    assert(oracle.exists(!_._3) && oracle.exists(_._3),
      "slice should contain both contaminated and clean docs")
  }

  test("streaming release gate composes quality + decontamination + split " +
      "per micro-batch (r13)") {
    val w = Array(0.1, 2.0, -1.0, 0.5)
    val tmp = Files.createTempDirectory("relgate").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val probe = docs.filter(col("doc_id") < 10)
    val corpus = docs.filter(col("doc_id") >= 10)
    corpus.repartition(3).write.mode("overwrite").parquet(tmp)
    var got = Vector.empty[(Long, Double, Long, String, Boolean)]
    val q = Streams.releaseGate(
      spark.readStream.schema(spark.read.parquet(tmp).schema).parquet(tmp),
      w, probe) { (gated, _) =>
      got ++= gated.select(col("doc_id"), col("score"), col("n_shared"),
          col("split"), col("keep"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
          r.getString(3), r.getBoolean(4)))
    }
    q.awaitTermination()
    // batch reference: the same three verdicts composed from the batch
    // operators on the same slice
    val scored = Streams.qualityGate(corpus, w, threshold = -1.0) // score all
      .select(col("doc_id"), col("score"))
    val decontamRows = graft.Queries.byName("q135_decontaminate_bloom")
      .build(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
      16, 10).cast("long") % 10
    val expected = scored
      .withColumn("split", when(bucket < 8, "train").otherwise("val"))
      .collect().map { r =>
        val id = r.getLong(0); val sc = r.getDouble(1)
        val ns = decontamRows(id)
        (id, sc, ns, r.getString(2), sc >= 0.5 && ns < 2)
      }.toSet
    assert(got.size == got.toSet.size, "a doc was gated twice")
    assert(got.toSet == expected,
      s"release gate diverged: ${got.size} vs ${expected.size}")
    // all three verdict dimensions must be non-degenerate on this slice
    assert(got.exists(_._5) && got.exists(!_._5), "keep verdict degenerate")
    assert(got.exists(_._4 == "train") && got.exists(_._4 == "val"))
    assert(got.exists(_._3 >= 2), "no contaminated doc in slice")
  }

  test("streaming near-dup ingest equals the q189 batch verdicts; absorb " +
      "catches an intra-stream duplicate") {
    val tmpDocs = Files.createTempDirectory("neardup_in").toString
    val tmpDb = Files.createTempDirectory("neardup_db").toString
    val db = "graft_stream_neardup"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    Streams.ensureNearDupStore(spark, db, tmpDb)
    // seed the store with q189's history split (same salt, same keys)
    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        (conv(substring(md5(concat(lit("mh"), col("doc_id").cast("string"))),
          1, 8), 16, 10).cast("long") % 10).as("g"))
    graft.operators.Layout.appendBucketed(
      base.filter(col("g") < 8)
        .select(explode(graft.queries.LlmPipeline.minhashBandKeys(col("text")))
          .as("bk"), col("doc_id").as("hist_id")).distinct(),
      s"$db.history_bands", "bk", Streams.DedupBuckets, Seq("bk"))
    // incoming = q189's incoming: the g>=8 slice + the injected replays
    val incoming = base.filter(col("g") >= 8)
      .select(col("doc_id"), col("text"))
      .unionAll(base.filter(col("g") < 8 && col("doc_id") % 50 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat(col("text"), lit(" xtra")).as("text")))
    incoming.repartition(3).write.mode("overwrite").parquet(tmpDocs)
    var got = Vector.empty[(Long, Long, Long)]
    val q = Streams.nearDupIngest(spark,
      spark.readStream.schema(spark.read.parquet(tmpDocs).schema)
        .parquet(tmpDocs),
      db, absorb = false) { (v, _) =>
      got ++= v.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    q.awaitTermination()
    val oracle = graft.Queries.byName("q189_dedup_incremental_minhash")
      .build(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.size == got.toSet.size, "a doc was gated twice")
    assert(got.toSet == oracle,
      s"stream verdicts diverged from q189: ${got.size} vs ${oracle.size}")
    assert(oracle.exists(_._2 > 0) && oracle.exists(_._2 == 0),
      "slice should contain both matched and novel docs")
    // absorb: replay the SAME stream with absorb on — second pass sees
    // the first pass's docs as history, so every doc now matches
    val q2 = Streams.nearDupIngest(spark,
      spark.readStream.schema(spark.read.parquet(tmpDocs).schema)
        .parquet(tmpDocs), db) { (_, _) => () }
    q2.awaitTermination()
    var got3 = Vector.empty[(Long, Long)]
    val q3 = Streams.nearDupIngest(spark,
      spark.readStream.schema(spark.read.parquet(tmpDocs).schema)
        .parquet(tmpDocs),
      db, absorb = false) { (v, _) =>
      got3 ++= v.collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    q3.awaitTermination()
    val misses = got3.filter(_._2 == 0)
    info(s"post-absorb rows=${got3.size}, misses=${misses.size}: " +
      misses.take(10).toString)
    info("history_bands rows = " +
      spark.table(s"$db.history_bands").count())
    assert(misses.isEmpty,
      "after absorb, every replayed doc must match itself in history")
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
  }

  test("streaming integrity ledger rolls up to the q185 batch checksums " +
      "across micro-batch boundaries") {
    val tmp = Files.createTempDirectory("ledger").toString
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    // several files → several micro-batch candidates: the rollup must be
    // batch-boundary-independent (modular sums are associative)
    docs.repartition(5).write.mode("overwrite").parquet(tmp)
    var ledger = Vector.empty[(Long, Long, Long, Long)]
    val q = Streams.integrityLedger(
      spark.readStream.schema(spark.read.parquet(tmp).schema).parquet(tmp)) {
      (rows, _) =>
        ledger ++= rows.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }
    q.awaitTermination()
    val P = 1000000007L
    val rolled = ledger.groupBy(_._1).map { case (shard, rs) =>
      (shard, rs.map(_._2).sum, rs.map(_._3).sum, rs.map(_._4).sum % P)
    }.toSet
    val batch = graft.Queries.byName("q185_shard_checksums")
      .build(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(batch.size > 1, "expected multiple shards")
    assert(rolled == batch,
      s"ledger rollup diverged from the batch checksums: $rolled vs $batch")
  }

  test("writeStream.format(n5): native streaming sink commits block rows") {
    val tmp = Files.createTempDirectory("n5sink").toString
    // stream the fixture's 4 block rows (as parquet files) into a new N5
    val blocks = N5.read(spark, "/root/reference/data/test.n5", "mri/c0/s0")
    blocks.write.mode("overwrite").parquet(s"$tmp/rows")
    val stream = spark.readStream.schema(blocks.schema).parquet(s"$tmp/rows")
    val q = stream.writeStream
      .format("n5")
      .option("path", s"$tmp/out.n5")
      .option("dataset", "vol/s0")
      .option("dimensions", "186,226,27")
      .option("blockSize", "128,128,128")
      .option("dataType", "uint8")
      .option("compression", "gzip")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val e = N5.elements(N5.read(spark, s"$tmp/out.n5", "vol/s0"))
    val r = e.agg(count(lit(1)), sum(col("v"))).collect()(0)
    assert(r.getLong(0) == 1134972L)
    assert(r.getLong(1) == 40784917L)
  }

  test("writeStream.format(n5) with format=zarr: streaming sink commits " +
      "zarr chunks + .zarray per epoch (r14)") {
    val tmp = Files.createTempDirectory("zarrsink").toString
    val blocks = N5.read(spark, "/root/reference/data/test.n5", "mri/c0/s0")
    blocks.write.mode("overwrite").parquet(s"$tmp/rows")
    val stream = spark.readStream.schema(blocks.schema).parquet(s"$tmp/rows")
    val q = stream.writeStream
      .format("n5")
      .option("path", s"$tmp/out.zarr")
      .option("dataset", "vol")
      .option("format", "zarr")
      .option("dimensions", "186,226,27")
      .option("blockSize", "128,128,128")
      .option("dataType", "uint8")
      .option("compression", "zlib")
      .option("compressionLevel", "6")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val a = graft.n5.N5Meta.datasetAttributes(s"$tmp/out.zarr", "vol")
    assert(a.isZarr && a.zarrSeparator == ".")
    val e = N5.elements(N5.read(spark, s"$tmp/out.zarr", "vol"))
    val r = e.agg(count(lit(1)), sum(col("v"))).collect()(0)
    assert(r.getLong(0) == 1134972L)
    assert(r.getLong(1) == 40784917L)
  }

  test("streaming TIFF slab ingest equals batch ingest (Phase 6)") {
    val tmp = Files.createTempDirectory("slab").toString
    // slices from the fixture
    val n = TiffVolume.exportSlices(spark,
      "/root/reference/data/test.n5", "mri/c0/s0", s"$tmp/tif")
    assert(n == 27)
    val q = Streams.tiffSlabIngest(spark, s"$tmp/tif",
      s"$tmp/stream.n5", "vol/s0", 186, 226, 27)
    q.awaitTermination()
    val e = N5.elements(N5.read(spark, s"$tmp/stream.n5", "vol/s0"))
    val r = e.agg(count(lit(1)), sum(col("v"))).collect()(0)
    assert(r.getLong(0) == 1134972L)
    assert(r.getLong(1) == 40784917L)
  }
}
