package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten CASCADE — deletion requests propagated across a
  * corpus table AND every derived artifact that carries the subject's
  * rows (chunk tables, fingerprint tables, at-rest index slices): the
  * data-governance primitive a training-data platform must run, because
  * deleting a document from the corpus while its chunks keep feeding the
  * packer is not deletion.
  *
  * Each target table is cleaned by the same partition-pruned machinery
  * every other commit here uses: the id set (request-sized, never
  * corpus-sized) LEFT-SEMI joins the table to recover the doomed rows,
  * and a keyed merge-delete rewrites ONLY the partitions holding them —
  * COW tables rewrite those partitions' dirs, MOR tables land equality
  * tombstones. Untouched partitions survive byte-identical. Replay is
  * idempotent: re-deleting absent keys matches nothing and commits
  * nothing new.
  *
  * Returns per-table deleted-row counts — the audit receipt a deletion
  * request needs (proving "0 rows remained" is as important as the
  * delete itself).
  */
object Forget {

  /** One cascade target: `idCol` is the column carrying the subject id;
    * `keys` identify a row for the merge-delete (default: the id alone —
    * right for one-row-per-subject tables; index tables keyed
    * (id, band/cell/chunk) pass their full key so every slice row dies).
    */
  final case class Target(
      table: graft.table.WarehouseTable,
      idCol: String,
      keys: Seq[String] = Nil) {
    def keyCols: Seq[String] = if (keys.isEmpty) Seq(idCol) else keys
  }

  /** Delete every row of every target whose `idCol` is in `ids` (a
    * one-column frame; column name is irrelevant). Returns
    * table-root → rows deleted there.
    */
  def forget(
      spark: SparkSession,
      ids: DataFrame,
      targets: Seq[Target]): Map[String, Long] = {
    require(ids.columns.length == 1, "ids must be a single-column frame")
    targets.map { t =>
      val keyed = ids.select(col(ids.columns.head).as(t.idCol)).distinct()
      val doomed = t.table.read(spark)
        .join(keyed, Seq(t.idCol), "left_semi")
        .localCheckpoint() // the merge re-reads the table; pin the row set
      val n = doomed.count()
      if (n > 0)
        t.table.merge(spark, doomed, t.keyCols, deleteWhere = Some(lit(true)))
      t.table.root -> n
    }.toMap
  }

  /** PREDICATE-based forget — the cascade for deletion requests that
    * arrive as a condition rather than an id list ("everything from
    * source X", "all docs matching this PII pattern"): no key columns
    * are needed anywhere. Merge-on-read targets take an
    * O(matching-rows) position-delete sidecar
    * ([[graft.table.WarehouseTable.deleteWhereMor]]); copy-on-write
    * targets take the stats-pruned dir-level rewrite
    * ([[graft.table.WarehouseTable.deleteRows]]). Returns the same
    * per-table deleted-row audit receipt as [[forget]]; replaying the
    * same predicate deletes nothing further (the rows are gone, the
    * condition matches nothing).
    *
    * Change-feed completeness: the MOR path's position deletes ARE
    * carried by [[graft.table.WarehouseTable.changesSince]] as labeled
    * `delete` events (resolved from the sidecars), and the COW path's
    * rewrite removals are diffed per keyed commit and carried too — so a
    * downstream CDC mirror replaying the feed drops the forgotten rows
    * on BOTH delete modes. The only remaining caveat is a KEYLESS COW
    * table (no row identity to diff a rewrite on); a mirror started with
    * [[graft.streaming.StreamingIngest.startCdcMirror]] stamps its keys
    * on the source, so mirrored tables are never keyless.
    */
  def forgetWhere(
      spark: SparkSession,
      cond: org.apache.spark.sql.Column,
      tables: Seq[graft.table.WarehouseTable]): Map[String, Long] =
    tables.map { t =>
      // both delete paths return the removed-row count themselves, so the
      // predicate is evaluated exactly once per table — no separate
      // count pass whose answer could drift from the rows actually removed
      val n =
        if (t.properties.get("write.delete.mode").contains("merge-on-read"))
          t.deleteWhereMor(spark, cond)
        else t.deleteRows(spark, cond)
      t.root -> n
    }.toMap
}
