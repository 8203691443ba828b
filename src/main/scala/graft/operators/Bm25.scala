package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** BM25 sparse keyword retrieval — the inverted-index half of a corpus
  * search/decontamination stack (the dense half is the IVF/PQ family in
  * [[SimilaritySearch]]): score documents for a bag-of-terms query by
  * Robertson/Spärck-Jones BM25 and return the top-k. The reference engine
  * (`/root/reference/spark-job/read.py`) has no retrieval at all; this is
  * part of the training-data-pipeline extension surface (finding which
  * corpus documents mention a benchmark phrase, a contaminated entity, a
  * blocklisted term — at 100 TB you RETRIEVE them, you don't rescan).
  *
  * `score(d, q) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
  * with the Lucene-smoothed `idf(t) = ln(1 + (N−df+0.5)/(df+0.5))` (always
  * positive, so a term common to every doc still contributes monotone
  * mass).
  *
  * Cross-engine determinism (the q53 rule): each (doc, term) contribution
  * is quantized to e6 fixed-point — `ln` may differ in the last ulp
  * between libms, but a per-row rounded value survives — and the per-doc
  * score is an exact BIGINT sum of quanta, never an order-dependent
  * floating sum. All double arithmetic is written with explicit casts in
  * a fixed association order, mirrored literally in the DuckDB oracle.
  *
  * Scale shape: fit = one tokenize pass + three hash aggs (postings are
  * corpus-token-bounded, stats/norms vocabulary- and corpus-doc-bounded);
  * scoring touches ONLY the query terms' postings (an `isin` pushed to
  * the scan — or, at rest, partition pruning; see [[indexAtRest]]), and
  * top-k plans as `TakeOrderedAndProject`, never a global sort.
  */
object Bm25 {

  /** Frozen retrieval model: `postings` = (term, doc_id, tf),
    * `stats` = (term, df), `norms` = (doc_id, dl), `global` = 1 row
    * (n_docs, total_tokens). Postings dominate (corpus tokens); the rest
    * are vocabulary/doc-count bounded. None are broadcast-hinted — AQE
    * size-dispatches the query-term slices, which are tiny after the
    * term filter.
    */
  final case class Model(
      postings: DataFrame,
      stats: DataFrame,
      norms: DataFrame,
      global: DataFrame)

  def fit(docs: DataFrame, idCol: String, textCol: String): Model = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val postings = toks.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val stats = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val norms = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val global = norms.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens"))
    Model(postings, stats, norms, global)
  }

  /** The e6-quantized BM25 contribution of one posting row. Inputs are
    * the joined columns (tf, df, dl, n_docs, total_tokens); k1/b are
    * exact-decimal literals spelled identically in the oracle. The
    * association order here is the contract — do not "simplify".
    */
  private def contribE6(k1: Double, b: Double) = {
    val idf = log(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val ratio = col("dl").cast("double") * col("n_docs").cast("double") /
      col("total_tokens").cast("double")
    val num = col("tf").cast("double") * lit(k1 + 1.0)
    val den = col("tf").cast("double") + lit(k1) * (lit(1.0 - b) + lit(b) * ratio)
    floor(idf * num / den * lit(1000000.0) + lit(0.5)).cast("long")
  }

  private def scoreAndRank(hits: DataFrame, k: Int, k1: Double, b: Double) =
    hits
      .withColumn("contrib_e6", contribE6(k1, b))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("contrib_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id").asc)
      .limit(k)

  /** Top-k documents for a bag-of-terms query under a frozen model.
    * Output: `(doc_id, n_terms_hit, score_e6)`, score-desc, doc_id-asc
    * tiebreak — a total deterministic order.
    */
  def topK(
      model: Model,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val q = queryTerms.distinct
    scoreAndRank(
      model.postings.filter(col("term").isin(q: _*))
        .join(model.stats, Seq("term"))
        .join(model.norms, Seq("doc_id"))
        .crossJoin(broadcast(model.global)), // 1-row total — provably bounded
      k, k1, b)
  }

  // ---- at rest ------------------------------------------------------------

  /** Index layout (ONE warehouse table, the q34/q66 at-rest pattern):
    *
    *  - POSTING rows `(term, doc_id, tf, dl, tb)` with
    *    `tb = pmod(xxhash64(term), partBuckets)` — denormalized norms
    *    (the Lucene move of inlining dl into postings), so scoring reads
    *    nothing else. A term's postings live ENTIRELY in its tb
    *    partition, which makes lookup-time df exact over the pruned read.
    *  - NORM rows `(term = '', doc_id, tf = 0, dl, tb = partBuckets +
    *    pmod(xxhash64(doc_id), normBuckets))` — one row per document in
    *    reserved buckets the queries never read; they exist so COMMITS
    *    can maintain the global statistics incrementally.
    *
    * Global (n_docs, total_tokens) lives in table properties as PER-
    * NORM-BUCKET subtotals (`bm25.norm.<i>.nDocs/.totalTokens`). A commit
    * recomputes subtotals ONLY for the norm buckets its arrivals hash
    * into — recompute-from-state, so checkpoint replays are idempotent
    * (the q33 rule) — and a lookup just sums `normBuckets` numbers out of
    * the metadata. Deliberately NOT stored: per-term df, which would go
    * stale on every commit; it is derived at lookup time instead.
    */
  def indexAtRest(
      docs: DataFrame, idCol: String, textCol: String,
      table: graft.table.WarehouseTable,
      partBuckets: Int = 16,
      normBuckets: Int = 8,
      compression: String = "snappy"): Unit = {
    val m = fit(docs, idCol, textCol)
    val idx = indexRows(m, partBuckets, normBuckets)
    // MOR + no stats: a commit batch's terms scatter over every tb
    // partition (COW would rewrite the whole index per batch; MOR deltas
    // are O(batch), threshold compaction folds). tb is a function of the
    // term and the merge key is (term, doc_id), so a key tuple lives in
    // ONE partition — pruned arbitration exact. Probes prune by tb only.
    table.create(idx.schema, partition = Some("tb"),
      properties = graft.table.WarehouseTable.tableProperties("MOR", compression) ++
        Map(
          "stats.mode" -> "none",
          "bm25.partBuckets" -> partBuckets.toString,
          "bm25.normBuckets" -> normBuckets.toString))
    table.append(idx)
    refreshNormSubtotals(table, (0 until normBuckets).map(_ + partBuckets))
  }

  /** The physical rows for a fitted batch — postings with inlined dl,
    * plus the reserved-bucket norm rows.
    */
  private def indexRows(m: Model, partBuckets: Int, normBuckets: Int): DataFrame =
    m.postings
      .join(m.norms, Seq("doc_id"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        pmod(xxhash64(col("term")), lit(partBuckets.toLong)).cast("int").as("tb"))
      .unionByName(m.norms.select(
        lit("").as("term"), col("doc_id"), lit(0L).as("tf"), col("dl"),
        (lit(partBuckets) +
          pmod(xxhash64(col("doc_id")), lit(normBuckets.toLong)).cast("int"))
          .as("tb")))

  /** Recompute-from-state of the per-bucket global subtotals, for the
    * given tb partition values only (pruned read — commit cost scales
    * with the batch's touched buckets, not the corpus).
    */
  private def refreshNormSubtotals(
      table: graft.table.WarehouseTable, tbVals: Seq[Int]): Unit = {
    val spark = SparkSession.active
    val subs = table.read(spark, partitions = Some(tbVals))
      .filter(col("term") === "")
      .groupBy(col("tb"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("tt"))
      .collect()
    val found = subs.map(r => r.getInt(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    table.setProperties(tbVals.flatMap { tb =>
      val (n, tt) = found.getOrElse(tb, (0L, 0L))
      Seq(s"bm25.norm.$tb.nDocs" -> n.toString,
        s"bm25.norm.$tb.totalTokens" -> tt.toString)
    }.toMap)
  }

  /** Commit an arrival batch of NEW documents into the at-rest index —
    * the incremental-maintenance step (q66's `minhashIndexCommit` for
    * keyword retrieval): batch postings + norm rows land via a keyed
    * MERGE on (term, doc_id) — replay-idempotent, partition-local
    * rewrites — then the touched norm buckets' subtotals are recomputed
    * from state. Like the minhash commit, the contract is arrival of NEW
    * docs: re-committing a MODIFIED document would upsert its surviving
    * terms but not delete rows for terms that vanished (that path needs
    * delete+insert semantics, same as every keyed index here).
    */
  def indexCommit(
      spark: SparkSession,
      arrivals: DataFrame, idCol: String, textCol: String,
      table: graft.table.WarehouseTable): Unit = {
    val stored = table.properties
    def param(k: String): Int = stored.getOrElse(s"bm25.$k",
      throw new IllegalArgumentException(
        s"table has no bm25.$k property — not a BM25 index")).toInt
    val partBuckets = param("partBuckets"); val normBuckets = param("normBuckets")
    val m = fit(arrivals, idCol, textCol)
    val rows = indexRows(m, partBuckets, normBuckets).localCheckpoint()
    table.merge(spark, rows, Seq("term", "doc_id"))
    // bounded: ≤ normBuckets distinct values reach the driver
    val touched = rows.filter(col("term") === "")
      .select(col("tb")).distinct().collect().map(_.getInt(0)).toSeq
    refreshNormSubtotals(table, touched)
  }

  /** Query the at-rest index: the query's term hashes decide which `tb`
    * partitions to READ (bounded by |query| distinct values — the same
    * Iceberg-style planning step as q34/q66), the term `isin` inside them
    * selects the postings, df derives from the slice itself (exact: a
    * term's postings are complete within its partition — and never stale,
    * unlike a stored df would be after commits), globals come from the
    * per-bucket subtotal properties, and scoring/top-k proceed exactly as
    * [[topK]]. `partBuckets` is validated against the persisted value so
    * a mismatched lookup fails loudly instead of silently pruning the
    * wrong partitions.
    */
  def lookupAtRest(
      spark: SparkSession,
      table: graft.table.WarehouseTable,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      partBuckets: Int = 16): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val stored = table.properties
    stored.get("bm25.partBuckets").foreach(sv =>
      require(sv == partBuckets.toString,
        s"index was built with partBuckets=$sv but the lookup passed " +
          s"$partBuckets — term hashes would prune the wrong partitions"))
    val normBuckets = stored.getOrElse("bm25.normBuckets",
      throw new IllegalArgumentException(
        "table has no bm25.normBuckets property — not a BM25 index")).toInt
    val (nDocs, totalTokens) = (0 until normBuckets).map(_ + partBuckets)
      .foldLeft((0L, 0L)) { case ((n, tt), tb) =>
        (n + stored.getOrElse(s"bm25.norm.$tb.nDocs", "0").toLong,
          tt + stored.getOrElse(s"bm25.norm.$tb.totalTokens", "0").toLong)
      }
    val q = queryTerms.distinct
    import spark.implicits._
    // query-sized: |q| rows through the same xxhash64 the build used
    val tbVals = q.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(partBuckets.toLong)).cast("int"))
      .distinct().collect().map(_.get(0)).toSeq
    val slice = table.read(spark, partitions = Some(tbVals))
      .filter(col("term").isin(q: _*))
    scoreAndRank(
      slice
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
        .withColumn("n_docs", lit(nDocs))
        .withColumn("total_tokens", lit(totalTokens)),
      k, k1, b)
  }
}
