package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate query: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL over
  * the same parquet tables. Column names MUST match between the two — the
  * driver sorts columns by name and hashes values.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryPack {
  /** Load one testdata table from the given sf directory.
    *
    * The events table's `ts` column has shipped in two physical forms across
    * driver testdata generations: TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects (read as long via the legacy conf, rebuilt with integral
    * division — the data has no sub-micro component), and plain
    * timestamp[us] with isAdjustedToUTC=false, which Spark 4 reads as
    * TIMESTAMP_NTZ. Both normalize to TIMESTAMP (LTZ): every session here
    * pins spark.sql.session.timeZone=UTC, so the NTZ→LTZ cast denotes the
    * same instant the nanos path produced, watermarks/unix_millis (which
    * require LTZ) keep working, and gate outputs keep the dtype the DuckDB
    * comparison has always seen.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case Some(f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
