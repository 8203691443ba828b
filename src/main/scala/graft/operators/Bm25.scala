package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    model.postings.filter(col("term").isin(q: _*))
      .join(model.stats, Seq("term"))
      .join(model.norms, Seq("doc_id"))
      .crossJoin(broadcast(model.global)) // 1-row total — provably bounded
      .withColumn("contrib_e6", contribE6(k1, b))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("contrib_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Materialize the index AT REST (the q34/q66 pattern for keyword
    * retrieval): one DENORMALIZED posting row per (term, doc) —
    * `(term, doc_id, tf, df, dl)`, the Lucene move of inlining norms into
    * postings — partitioned by `tb = pmod(xxhash64(term), partBuckets)`,
    * with the 1-row globals persisted as TABLE PROPERTIES (they are part
    * of the index format, like the banding parameters of q66). A query
    * then reads ONLY the partitions its own terms hash to — manifest-level
    * pruning, no corpus rescan, nothing term-frequency-skewed on the
    * driver.
    */
  def indexAtRest(
      docs: DataFrame, idCol: String, textCol: String,
      table: graft.table.WarehouseTable,
      partBuckets: Int = 16,
      compression: String = "snappy"): Unit = {
    val m = fit(docs, idCol, textCol)
    val g = m.global.head()
    val idx = m.postings
      .join(m.stats, Seq("term"))
      .join(m.norms, Seq("doc_id"))
      .select(col("term"), col("doc_id"), col("tf"), col("df"), col("dl"),
        pmod(xxhash64(col("term")), lit(partBuckets.toLong)).cast("int").as("tb"))
    table.create(idx.schema, partition = Some("tb"),
      properties = graft.table.WarehouseTable.tableProperties("COW", compression) ++
        Map(
          "bm25.partBuckets" -> partBuckets.toString,
          "bm25.nDocs" -> g.getLong(0).toString,
          "bm25.totalTokens" -> g.getLong(1).toString))
    table.append(idx)
  }

  /** Query the at-rest index: the query's term hashes decide which `tb`
    * partitions to READ (bounded by |query| distinct values — the same
    * Iceberg-style planning step as q34/q66), the term `isin` inside them
    * selects the postings, and scoring/top-k proceed exactly as [[topK]].
    * Globals come from the table properties; `partBuckets` is validated
    * against the persisted value so a mismatched lookup fails loudly
    * instead of silently pruning the wrong partitions.
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
    val nDocs = stored.getOrElse("bm25.nDocs",
      throw new IllegalArgumentException(
        "table has no bm25.nDocs property — not a BM25 index")).toLong
    val totalTokens = stored("bm25.totalTokens").toLong
    val q = queryTerms.distinct
    import spark.implicits._
    // query-sized: |q| rows through the same xxhash64 the build used
    val tbVals = q.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(partBuckets.toLong)).cast("int"))
      .distinct().collect().map(_.get(0)).toSeq
    table.read(spark, partitions = Some(tbVals))
      .filter(col("term").isin(q: _*))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("total_tokens", lit(totalTokens))
      .withColumn("contrib_e6", contribE6(k1, b))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("contrib_e6")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id").asc)
      .limit(k)
  }
}
