package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's synthetic testdata: key-shifted
  * replication of an existing sf directory (default sf0.1 × 10 ≈ sf1),
  * preserving referential integrity — every foreign key shifts by the same
  * per-copy offset as its dimension's primary key, so join fan-outs,
  * group cardinalities per key, and selectivities match a natively
  * generated larger scale factor. `nation`/`region` stay fixed (TPC-H
  * semantics: they do not scale). Output is bench-only input (the DuckDB
  * oracle runs at sf0.01); BASELINE.md records the measured table.
  *
  * Usage: `runMain graft.ScaleData [srcDir] [dstDir] [copies]`.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    Thread.currentThread().setContextClassLoader(getClass.getClassLoader)
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("testdata_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // events.parquet has shipped with TIMESTAMP(NANOS) — read as long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def table(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    /** One offset per shifted key family: maxKey + 1 of the owning table,
      * so copy k shifts every reference to that family by k × offset.
      */
    def offsetOf(df: DataFrame, key: String): Long =
      df.agg(max(col(key).cast("long"))).head().getLong(0) + 1L

    val offsets = Map(
      "orderkey" -> offsetOf(table("orders"), "o_orderkey"),
      "custkey" -> offsetOf(table("customer"), "c_custkey"),
      "partkey" -> offsetOf(table("part"), "p_partkey"),
      "suppkey" -> offsetOf(table("supplier"), "s_suppkey"),
      "docid" -> offsetOf(table("documents"), "doc_id"),
      "vecid" -> offsetOf(table("embeddings"), "vec_id"),
      "eventid" -> offsetOf(table("events"), "event_id"),
      "userid" -> offsetOf(table("events"), "user_id"))

    /** Replicate `copies` times, shifting each (column -> key family). */
    def replicate(name: String, shifts: Map[String, String]): Unit = {
      val base = table(name)
      val out = (0 until copies).map { k =>
        shifts.foldLeft(base) { case (df, (c, fam)) =>
          val dt = base.schema(c).dataType
          df.withColumn(c, (col(c).cast("long") + lit(k.toLong * offsets(fam))).cast(dt))
        }
      }.reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scale] $name: ${base.count()} x $copies rows")
    }

    replicate("lineitem", Map("l_orderkey" -> "orderkey",
      "l_partkey" -> "partkey", "l_suppkey" -> "suppkey"))
    replicate("orders", Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"))
    replicate("customer", Map("c_custkey" -> "custkey"))
    replicate("part", Map("p_partkey" -> "partkey"))
    replicate("supplier", Map("s_suppkey" -> "suppkey"))
    replicate("documents", Map("doc_id" -> "docid"))
    replicate("embeddings", Map("vec_id" -> "vecid"))
    replicate("events", Map("event_id" -> "eventid", "user_id" -> "userid"))
    // fixed dimensions: straight copies
    Seq("nation", "region").foreach { n =>
      table(n).write.mode("overwrite").parquet(s"$dst/$n.parquet")
      println(s"[scale] $n: copied")
    }
    spark.stop()
  }
}
