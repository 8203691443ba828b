package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an sf-N dataset from an existing sf directory by unioning
  * `factor` key-offset copies of each table the gated queries touch —
  * the scale-validation harness VERDICT r3 #7 asks for (no sf1 fixtures
  * exist). runMain graft.tools.ScaleUp <srcSfDir> <dstDir> [factor]
  *
  * Scaling is RELATION-PRESERVING and SIMILARITY-BREAKING:
  *  - join keys offset consistently across tables (orders.o_orderkey and
  *    lineitem.l_orderkey move together; o_custkey with c_custkey), so
  *    join selectivities and per-key group sizes stay constant while key
  *    cardinality grows ×factor — the realistic scale-up;
  *  - dims (nation) stay fixed, exactly as TPC-H scales;
  *  - document copies get a copy-specific token woven in at every 3rd
  *    word position: with 3-gram shingles EVERY shingle of a copy differs
  *    from other copies', so cross-copy Jaccard collapses to 0 while
  *    same-copy planted near-dup pairs keep their similarity — pair
  *    counts scale ×factor (linear), not ×factor² (cliques of identical
  *    texts would quadratically distort every near-dup benchmark);
  *  - embedding copies get fresh deterministic pseudo-random vectors
  *    (xxhash64-seeded), keeping the corpus near-dup-free as the base is.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionByName _)

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1

    // ---- relational tables (consistent key offsets) ----------------------
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    val customer = spark.read.parquet(s"$src/customer.parquet")
    val okStride = stride(orders, "o_orderkey")
    val ckStride = stride(customer, "c_custkey")
    copies(orders) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * okStride))
        .withColumn("o_custkey", col("o_custkey") + lit(i * ckStride))
    }.write.mode("overwrite").parquet(s"$dst/orders.parquet")
    copies(lineitem) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * okStride))
    }.write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    copies(customer) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * ckStride))
    }.write.mode("overwrite").parquet(s"$dst/customer.parquet")
    // dims stay fixed (TPC-H scaling: nation/region are constant-size;
    // part/supplier stay fixed here because lineitem's l_partkey /
    // l_suppkey are NOT offset — per-part/supplier group sizes grow
    // ×factor, which is the interesting stress for the correlated-agg
    // and join shapes that touch them)
    Seq("nation", "region", "part", "supplier").foreach { d =>
      val p = new java.io.File(s"$src/$d.parquet")
      if (p.exists())
        spark.read.parquet(p.toString)
          .write.mode("overwrite").parquet(s"$dst/$d.parquet")
    }

    // ---- events (nanos ts read via explicit long schema) -----------------
    import org.apache.spark.sql.types._
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val events = spark.read.schema(evSchema).parquet(s"$src/events.parquet")
    val eidStride = stride(events, "event_id")
    val uidStride = stride(events, "user_id")
    copies(events) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * eidStride))
        .withColumn("user_id", col("user_id") + lit(i * uidStride))
    }.write.mode("overwrite").parquet(s"$dst/events.parquet")

    // ---- documents (similarity-breaking copy transform) ------------------
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val didStride = stride(docs, "doc_id")
    copies(docs) { (df, i) =>
      val scaled = df.withColumn("doc_id", col("doc_id") + lit(i * didStride))
      if (i == 0) scaled
      else scaled.withColumn("text", expr(
        // weave a copy marker into every 3rd word: every 3-gram shingle of
        // this copy then contains >=1 marked word, so cross-copy shingle
        // sets are disjoint and near-dup pairs stay within-copy only
        s"array_join(transform(split(trim(text), '\\\\s+'), " +
          s"(w, p) -> CASE WHEN p % 3 = 0 THEN concat(w, '#c$i') ELSE w END), ' ')"))
    }.write.mode("overwrite").parquet(s"$dst/documents.parquet")

    // ---- embeddings (fresh pseudo-random vectors per copy) ---------------
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vidStride = stride(emb, "vec_id")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    copies(emb) { (df, i) =>
      val scaled = df.withColumn("vec_id", col("vec_id") + lit(i * vidStride))
      if (i == 0) scaled
      else scaled.withColumn("embedding", expr(
        // deterministic uniform [-1,1) per (vec_id, element) — independent
        // of the base vectors, so the corpus stays near-dup-free
        s"transform(sequence(0, ${dim - 1}), " +
          s"e -> CAST(pmod(xxhash64(vec_id, e, $i), 2000) / 1000.0 - 1.0 AS FLOAT))"))
    }.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    println(s"[scaleup] wrote ${factor}x of $src to $dst")
    spark.stop()
  }
}
