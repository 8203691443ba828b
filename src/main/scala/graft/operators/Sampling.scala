package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/sharding primitives — the decision is a pure
  * function of the row KEY (md5 hex prefix), never `rand()`:
  *
  *  - reproducible across engines (the DuckDB oracle computes the same
  *    md5), across runs, and across partitionings — no seed plumbing, no
  *    per-partition RNG state;
  *  - stable across the batch/stream boundary: a row keeps the same shard
  *    whether it arrives in a backfill or through a micro-batch, so
  *    train/val/test membership never flips on replay or reprocessing
  *    (the property a checkpoint-replayed streaming sampler needs);
  *  - auditable: the kept fraction of a stratum is the threshold itself
  *    (hex prefix < "29" keeps 41/256 ≈ 16%).
  *
  * Shared by batch q37 (stratified sample), q39 (mixture construction)
  * and the streaming sampler stage
  * [[graft.streaming.StreamingIngest.startSampler]].
  */
object Sampling {

  /** Two-hex-char uniform hash of the key: 256 deterministic buckets. */
  def keyHash(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  /** Keep-decision: hash < threshold keeps ≈ (number of hex prefixes
    * below `thresholdHex`)/256 of rows. The threshold may be a per-row
    * Column (per-stratum mixtures) or `lit("28")`-style constant.
    */
  def keep(key: Column, thresholdHex: Column): Column =
    keyHash(key) < thresholdHex

  /** Shard assignment from cumulative hex cut points, e.g.
    * `Seq("val" -> "08", "test" -> "10")` with `default = "train"`:
    * hash < "08" → val (~3%), < "10" → test (~3%), else train.
    * Cuts must be ascending; every key lands in exactly one shard.
    */
  def shard(key: Column, cuts: Seq[(String, String)], default: String): Column = {
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cut points must ascend")
    val h = keyHash(key)
    cuts.foldRight(lit(default)) { case ((name, cut), rest) =>
      when(h < cut, lit(name)).otherwise(rest)
    }
  }

  /** Deterministic global training order: every row gets a 16-way shard
    * (first md5 hex char of its key) and a dense 1-based position within
    * that shard, ordered by the next 16 hex chars (a reproducible
    * pseudo-random permutation — the shuffled-shard layout a training
    * run reads).
    *
    * Semantically this is `row_number() OVER (PARTITION BY shard ORDER BY
    * hashkey, id)` — but a direct window would sort each shard in ONE
    * task (16 tasks for 100 TB). Instead the rank is built two-level:
    *
    *  1. micro-bucket = next `bucketChars` hex chars of the hash key
    *     (256 buckets/shard at 2 chars, 4096/shard at 3), so row_number
    *     runs per (shard, bucket) — thousands of parallel sorts;
    *  2. a (shard, bucket) count table (≤ 16·16^bucketChars rows — a
    *     coordination table, never data-sized) turned into per-bucket
    *     prefix-sum offsets with a window over the TINY table, then
    *     broadcast back: pos = bucket offset + within-bucket rank.
    *
    * The two-level order equals the flat order because the bucket is a
    * PREFIX of the order key: (bucket asc, suffix asc) = hashkey asc.
    * Ties on the full 16-char key break on the id, so the permutation is
    * total and engine-reproducible.
    */
  def trainingOrder(df: DataFrame, idCol: String, bucketChars: Int = 2): DataFrame = {
    require(bucketChars >= 1 && bucketChars <= 8, "bucketChars in [1,8]")
    val keyed = df.select(
      col(idCol),
      substring(md5(col(idCol).cast("string")), 1, 1).as("shard"),
      substring(md5(col(idCol).cast("string")), 2, 16).as("okey"))
      .withColumn("bucket", substring(col("okey"), 1, bucketChars))
    val offsets = keyed
      .groupBy(col("shard"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("offset", coalesce(
        sum(col("n")).over(Window.partitionBy(col("shard")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("shard"), col("bucket"), col("offset"))
    val inBucket = Window.partitionBy(col("shard"), col("bucket"))
      .orderBy(col("okey"), col(idCol))
    keyed
      .withColumn("rn", row_number().over(inBucket))
      .join(broadcast(offsets), Seq("shard", "bucket"))
      .select(col(idCol), col("shard"), (col("offset") + col("rn")).as("pos"))
  }
}
