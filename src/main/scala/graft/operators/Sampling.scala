package graft.operators

import org.apache.spark.sql.Column
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
}
