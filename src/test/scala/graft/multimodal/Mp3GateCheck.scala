package graft.multimodal

import graft.SparkTestBase

/** The MP3 dedup gate must surface exactly the planted pairs — the same
  * contract its DuckDB oracle states relationally.
  */
class Mp3GateCheck extends SparkTestBase {
  test("multimodal_audio_mp3_dedup surfaces exactly the planted pairs") {
    val rows = graft.SparkEntry.queries("multimodal_audio_mp3_dedup")(
      spark, "/root/testdata/sf0.01").collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = spark.read.parquet("/root/testdata/sf0.01/nation.parquet")
      .where("n_regionkey = 1").select("n_nationkey").collect()
      .map(r => { val k = r.get(0).toString.toLong; (k, k + 100L) }).toSet
    assert(got == want, s"got=$got want=$want")
  }
}
