package graft

import org.apache.spark.sql.functions._

/** The SQL surface of the pipeline expressions, resolved through
  * `spark.sql.extensions=graft.GraftExtensions` injectFunction (the shared
  * test session is built with the extension and never calls registerAll for
  * these names on this path).
  */
class GraftExtensionsSuite extends SparkTestBase {

  test("pipeline expressions are callable from plain SQL via the extension") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    df.createOrReplaceTempView("fn_docs")
    val viaSql = spark.sql(
      """SELECT simhash64(split(text, ' ')) AS sh,
        |  size(minhash_signature(word_shingles(split(text, ' '), 3), 64)) AS sig_len,
        |  lsh_bucket(array(1.0F, -0.5F, 0.25F), 6) AS bucket,
        |  round(cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)), 6) AS cos,
        |  size(winnowed_fingerprints(text, 5, 4)) AS n_fp
        |FROM fn_docs""".stripMargin).head()
    // twins via the DataFrame API must agree exactly
    import graft.functions.{GraftFunctions => F}
    val viaApi = df.select(
      F.simhash64(split(col("text"), " ")).as("sh"),
      size(F.minhash_signature(F.word_shingles(split(col("text"), " "), 3), 64)).as("sig_len"),
      F.lsh_bucket(array(lit(1.0f), lit(-0.5f), lit(0.25f)), 6).as("bucket"),
      round(F.cosine_similarity(array(lit(1.0f), lit(0.0f)), array(lit(1.0f), lit(0.0f))), 6).as("cos"),
      size(F.winnowed_fingerprints(col("text"), 5, 4)).as("n_fp")).head()
    assert(viaSql == viaApi)
    assert(viaSql.getDouble(3) == 1.0 && viaSql.getInt(1) == 64)
  }

  test("sketch aggregate and jaccard compose in SQL") {
    import spark.implicits._
    Seq((1L, "src_a", "the quick brown fox jumps over the lazy dog"),
        (2L, "src_a", "the quick brown fox leaps over a sleepy dog"),
        (3L, "src_b", "entirely different content on another topic"))
      .toDF("id", "src", "text").createOrReplaceTempView("sk_docs")
    val rows = spark.sql(
      """WITH sk AS (
        |  SELECT src, minhash_agg(word_shingles(split(text, ' '), 3), 64) AS sig
        |  FROM sk_docs GROUP BY src
        |)
        |SELECT a.src, b.src, sketch_jaccard(a.sig, b.sig) AS sim
        |FROM sk a JOIN sk b ON a.src < b.src""".stripMargin).collect()
    assert(rows.length == 1)
    val sim = rows.head.getDouble(2)
    assert(sim >= 0.0 && sim <= 1.0)
  }
}
