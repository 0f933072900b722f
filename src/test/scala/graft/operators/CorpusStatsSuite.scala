package graft.operators

import graft.SparkTestBase
import graft.queries.QueryPack

class CorpusStatsSuite extends SparkTestBase {
  test("novelty scans the corpus once (window, not groupBy+join)") {
    val df = graft.operators.CorpusStats.noveltyScores(
      QueryPack.t(spark, sf(), "documents"), "doc_id", "text")
    val p = df.queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("FileScan")) == 1,
      s"single corpus scan expected:\n$p")
  }
}
