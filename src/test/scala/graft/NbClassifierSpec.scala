package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions.col

import graft.operators.NbClassifier

/** The q70 real-labels seam, end-to-end: `SparkEntry.labeledCorpus`
  * resolves an external labeled parquet (the `graft.labels` JVM property /
  * `SPARK_GRAFT_LABELS` env contract) and the NB classifier trains on a
  * REALISTIC label distribution — the checked-in 50-row sample
  * (`labels_sample.tsv`: 17 `high` encyclopedic-prose rows, 33 `low`
  * boilerplate/spam rows, the skew real quality-gate data shows) — then
  * separates held-out prose from held-out boilerplate. With the property
  * unset the seam must reproduce the synthetic-fixture path bit-for-bit
  * (that is what the driver's q70 oracle certifies).
  */
class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** The checked-in sample, shipped to parquet under the seam's contract
    * schema `(label string, text string)`.
    */
  private lazy val samplePath: String = {
    val lines = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/labels_sample.tsv"),
      StandardCharsets.UTF_8.name()).getLines()
      .filter(_.nonEmpty).map { l =>
        val Array(label, text) = l.split("\t", 2)
        (label, text)
      }.toSeq
    val out = tmpDir("labels") + "/labels.parquet"
    lines.toDF("label", "text").coalesce(1).write.parquet(out)
    out
  }

  test("labels seam: q70 trains on the external sample when graft.labels is set") {
    val sf = "/root/testdata/sf0.001"
    val baseline = SparkEntry.queries("q70_nb_classifier")(spark, sf)
      .select("pred_label").distinct().as[String].collect().toSet
    sys.props("graft.labels") = samplePath
    try {
      val seeded = SparkEntry.queries("q70_nb_classifier")(spark, sf)
      val labels = seeded.select("pred_label").distinct()
        .as[String].collect().toSet
      // predictions now come from the EXTERNAL label set, not the fixture's
      assert(labels.subsetOf(Set("high", "low")), s"got $labels")
      assert(seeded.count() ==
        spark.read.parquet(s"$sf/documents.parquet").count())
      // and the fixture path was genuinely different (langs, not quality)
      assert(baseline.intersect(Set("high", "low")).isEmpty)
    } finally sys.props.remove("graft.labels")
  }

  test("sample-trained model: realistic prior skew and held-out separation") {
    val corpus = spark.read.parquet(samplePath)
    assert(corpus.count() == 50)
    val byLabel = corpus.groupBy(col("label")).count()
      .as[(String, Long)].collect().toMap
    assert(byLabel == Map("high" -> 17L, "low" -> 33L))
    val model = NbClassifier.fit(corpus, "label", "text")
    // priors reflect the 33/17 skew: ln(33/50) > ln(17/50), quantized
    val priors = model.priors.as[(String, Long)].collect().toMap
    assert(priors("low") > priors("high"))
    assert(priors("low") == math.floor(math.log(33.0 / 50.0) * 10000.0 + 0.5).toLong)
    // held-out documents (not in the sample) separate by style
    val held = Seq(
      (1L, "the river carries sediment from the mountains and deposits it across the delta"),
      (2L, "the court ruled that the treaty took effect after the amendment was signed"),
      (3L, "click here now to claim your free prize enter your email address to win"),
      (4L, "buy now best price free shipping limited time offer order in the next ten minutes"))
      .toDF("doc_id", "text")
    val pred = NbClassifier.predict(held, "doc_id", "text", model)
      .select("doc_id", "pred_label").as[(Long, String)].collect().toMap
    assert(pred(1L) == "high" && pred(2L) == "high", s"prose misrouted: $pred")
    assert(pred(3L) == "low" && pred(4L) == "low", s"spam misrouted: $pred")
  }
}
