package graft.operators

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}

/** Physical-layout helper: bucketed (and optionally bucket-sorted) parquet
  * tables for exchange-free co-located joins — the "pay the shuffle once
  * at ingest" discipline. Two fact tables written with the same bucket
  * count on the join key satisfy the join's clustered-distribution
  * requirement straight off disk, so every subsequent equi-join on that
  * key plans WITHOUT a shuffle on either side (`BucketedJoinSpec` pins
  * exactly that). At 100 TB this converts the recurring fact⨝fact
  * exchange — the single largest cost in a repeated pipeline — into a
  * one-time layout decision, the relational analogue of the reference
  * aligning writes to N5 block boundaries (`tif_to_n5.py:42-50`).
  */
object Layout {

  /** @param table    catalog table name (qualify with a database whose
    *                 LOCATION you control to direct the files)
    * @param key      bucket/join key column
    * @param buckets  bucket count — both join sides must use the same
    * @param sortCols within-bucket sort columns (lets the sort-merge join
    *                 skip its per-partition sort when files are
    *                 one-per-bucket)
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int,
      sortCols: Seq[String] = Nil): Unit =
    bucketedSave(df, table, key, buckets, sortCols, "overwrite")

  /** [[writeBucketed]] with an explicit file location: the table is
    * created EXTERNAL at `path`, so a later `DROP TABLE` retires the
    * catalog entry without deleting the files. This is the swap
    * discipline index maintenance relies on (AnnIndex.maintain): a
    * reader that pinned the old files at plan-resolution time keeps
    * reading a complete table while a fold repoints the serving name
    * at a freshly-written directory — deletion is deferred, never
    * raced against in-flight scans.
    */
  def writeBucketedAt(
      df: DataFrame, table: String, key: String, buckets: Int,
      path: String, sortCols: Seq[String] = Nil): Unit =
    bucketedSave(df, table, key, buckets, sortCols, "overwrite", Some(path))

  /** Append into an EXISTING bucketed table under the same bucket spec —
    * the incremental-maintenance counterpart of [[writeBucketed]]. Spark
    * validates the declared (buckets, key) against the catalog table, and
    * the same repartition-by-key discipline keeps the append to one new
    * file per touched bucket. Existing files are never rewritten, so an
    * append-only 100 TB table pays only for its delta; bucket pruning and
    * exchange-free joins keep working because every file (old and new)
    * carries its bucket id in its name.
    */
  def appendBucketed(
      df: DataFrame, table: String, key: String, buckets: Int,
      sortCols: Seq[String] = Nil): Unit =
    bucketedSave(df, table, key, buckets, sortCols, "append")

  private def bucketedSave(
      df: DataFrame, table: String, key: String, buckets: Int,
      sortCols: Seq[String], mode: String,
      path: Option[String] = None): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // co-partition the write with the bucket function: without this every
    // task holds rows of every bucket and emits one file PER (task,
    // bucket) — shufflePartitions × buckets small files per table, the
    // classic bucketed-write file explosion. repartition by the key uses
    // the same murmur3-pmod family as the bucket spec, so each task holds
    // exactly one bucket and writes exactly one file. Caveat (see
    // AnnIndex.compact): if `df` itself scans a table carrying this same
    // bucket spec, the optimizer elides this repartition — feed a raw
    // path scan when the one-file-per-bucket guarantee matters.
    val w: DataFrameWriter[Row] = df.repartition(buckets, df.col(key))
      .write.mode(mode)
      .format("parquet").bucketBy(buckets, key)
    val located = path.fold(w)(p => w.option("path", p))
    val sorted = if (sortCols.nonEmpty)
      located.sortBy(sortCols.head, sortCols.tail: _*) else located
    sorted.saveAsTable(table)
  }
}
