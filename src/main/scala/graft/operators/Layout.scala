package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-filling-curve data layout: Z-order (Morton) interleaving, the
  * multi-column clustering lever behind Delta's OPTIMIZE ZORDER BY and
  * Iceberg's sort-order curves. Sorting a table by the interleaved bits of
  * several columns makes every one of those columns *locally* clustered, so
  * parquet row-group min/max pruning skips files for predicates on ANY of
  * them — the single-column sort only ever serves its leading column.
  *
  * Scale design: the z-value is a codegen'd arithmetic expression (32 shift/
  * mask/add terms — no UDF), so layout is `repartitionByRange(zval)` + a
  * partition-local sort: ONE range shuffle, the same cost as any global
  * sort, after which the bounding box of each output file is tight in every
  * curve dimension (LayoutSuite measures the shrinkage). At 100 TB the
  * caller supplies the per-column domains from table stats; the curve math
  * itself is scale-free.
  */
object Layout {

  /** Morton z-value of two non-negative integer columns, interleaving the
    * low `bits` bits of each (x gets the even bit positions, y the odd).
    * Values ≥ 2^bits contribute only their low bits — normalize/clamp to
    * the domain first (see [[normalize]]).
    */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1)
    }
  }

  /** Min-max normalize a column into [0, 2^bits): the rank-free domain map
    * used when table stats (or a prior `describe`) supply `lo`/`hi`. Values
    * outside the domain clamp to its edges, so stale stats degrade locality
    * but never correctness.
    */
  def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val maxV = (1L << bits) - 1
    val scaled = (c.cast("double") - lo) / (hi - lo) * maxV
    least(greatest(round(scaled).cast("long"), lit(0L)), lit(maxV))
  }

  /** Rewrite `df` into `numFiles` range-partitions of the 2-D z-curve over
    * `(xCol, yCol)` (domains from the caller, e.g. table stats), each
    * partition sorted by the curve. Write the result with any file sink and
    * every output file has a tight bounding box in BOTH columns.
    */
  def zorder2(df: DataFrame, xCol: String, xLo: Double, xHi: Double,
      yCol: String, yLo: Double, yHi: Double, bits: Int, numFiles: Int): DataFrame = {
    val z = zValue2(normalize(col(xCol), xLo, xHi, bits),
      normalize(col(yCol), yLo, yHi, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
