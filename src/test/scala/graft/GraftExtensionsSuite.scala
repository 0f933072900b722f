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

  test("audio_info is callable from plain SQL via the extension") {
    import spark.implicits._
    // 1-second 8 kHz mono PCM-16 WAV header + silence
    val rate = 8000
    val data = new Array[Byte](rate * 2)
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(data.length).put(data)
    Seq((1L, bb.array()), (2L, "not audio".getBytes)).toDF("id", "bytes")
      .createOrReplaceTempView("au_docs")
    val rows = spark.sql(
      "SELECT id, audio_info(bytes).sample_rate AS r, audio_info(bytes).duration_ms AS d " +
        "FROM au_docs ORDER BY id").collect()
    assert(rows(0).getInt(1) == 8000 && rows(0).getLong(2) == 1000L)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
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

  test("z_value2 SQL function matches Layout.zValue2 bit-for-bit") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i.toLong % 256, (i.toLong * 37) % 256)).toDF("x", "y")
    df.createOrReplaceTempView("zv")
    val viaSql = spark.sql("SELECT x, y, z_value2(x, y, 8) AS z FROM zv ORDER BY x, y")
      .collect().toSeq
    val viaApi = df.select(col("x"), col("y"),
      graft.operators.Layout.zValue2(col("x"), col("y"), bits = 8).as("z"))
      .orderBy("x", "y").collect().toSeq
    assert(viaSql == viaApi)
    // default bits = 16 resolves too
    assert(spark.sql("SELECT z_value2(65535, 0)").head().getLong(0) == 0x55555555L)
  }
}
