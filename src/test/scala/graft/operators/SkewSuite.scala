package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.QueryPack

class SkewSuite extends SparkTestBase {

  private def lineitem = QueryPack.t(spark, sf(), "lineitem")
  private def orders = QueryPack.t(spark, sf(), "orders")

  test("salted sum equals plain groupBy sum") {
    val plain = lineitem.groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSum(lineitem, Seq("l_returnflag"), "l_quantity")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (s, n)) =>
      val (ps, pn) = plain(k)
      assert(n == pn && math.abs(s - ps) < 1e-6, s"key $k: $s/$n vs $ps/$pn")
    }
  }

  test("salted join equals plain join") {
    val l0 = lineitem
    val o0 = orders
    val plain = l0.join(o0, l0("l_orderkey") === o0("o_orderkey")).count()
    val salted = Skew.saltedJoin(
      lineitem.withColumnRenamed("l_orderkey", "k"),
      orders.withColumnRenamed("o_orderkey", "k"), "k").count()
    assert(salted == plain)
  }

  test("split join equals plain join with sampled hot keys") {
    val l = lineitem.withColumnRenamed("l_orderkey", "k")
    val r = orders.withColumnRenamed("o_orderkey", "k")
    val hot = Skew.hotKeys(l, "k", fraction = 0.1, threshold = 20L)
    val got = Skew.splitJoin(l, r, "k", hot).count()
    val want = l.join(r, Seq("k")).count()
    assert(got == want)
  }
}
