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
  * curve dimension (DataEngSuite measures the shrinkage). At 100 TB the
  * caller supplies the per-column domains from table stats; the curve math
  * itself is scale-free.
  */
object Layout {

  /** The curve builders stage internal columns via withColumn and drop them
    * after; a same-named caller column would be silently overwritten and
    * then dropped — fail loudly instead.
    */
  private def requireFresh(df: DataFrame, names: Seq[String], op: String): Unit = {
    val clash = df.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"$op(): input already has internal column(s) ${clash.mkString(", ")} — rename them first")
  }

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

  /** Morton z-value of any number of non-negative integer columns: bit `j`
    * of column `c` lands at interleaved position `j * n + c`. Total bits
    * (`bits * cols.length`) must fit a long. [[zValue2]] is the n=2 case
    * (same bit layout; DataEngSuite asserts the identity).
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 1 && bits >= 1 && n.toLong * bits <= 62,
      s"need 1+ columns and bits*cols <= 62, got n=$n bits=$bits")
    val terms = for { i <- 0 until bits; (c, ci) <- cols.zipWithIndex }
      yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(1L), i * n + ci)
    terms.foldLeft(lit(0L))(_ + _)
  }

  /** Min-max normalize a column into [0, 2^bits): the rank-free domain map
    * used when table stats (or a prior `describe`) supply `lo`/`hi`. Values
    * outside the domain clamp to its edges, so stale stats degrade locality
    * but never correctness.
    */
  def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val maxV = (1L << bits) - 1
    val scaled = (c.cast("double") - lo) / (hi - lo) * maxV
    least(greatest(round(scaled).cast("long"), lit(0L)), lit(maxV))
  }

  /** Hilbert curve index of two columns in [0, 2^bits) appended as
    * `outCol`: strictly better 2-D locality than the Morton curve — every
    * step along the curve moves one cell in ONE dimension (no Z-shaped
    * diagonal jumps), so range-partition boundaries cut fewer bounding
    * boxes. The cost is the per-bit rotate/reflect recurrence (the
    * classic xy2d algorithm), built here as `bits` chained projections:
    * each level's (x, y, d) is referenced by ATTRIBUTE, keeping the plan
    * linear in `bits` where a single nested expression would grow
    * exponentially. Still pure codegen'd column ops — no UDF, no shuffle.
    * DataEngSuite proves the curve properties independently: bijective on
    * the full grid, and unit-Manhattan-step adjacency between consecutive
    * indices (the Hilbert property Morton lacks).
    */
  def hilbertValue2(df: DataFrame, xCol: String, yCol: String, bits: Int,
      outCol: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    requireFresh(df, Seq("__hx", "__hy", "__rx", "__ry", "__nx", "__ny"), "hilbertValue2")
    val n1 = (1L << bits) - 1 // reflection constant n-1
    var cur = df
      .withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn(outCol, lit(0L))
    for (i <- bits - 1 to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("__rx", when(col("__hx").bitwiseAND(s) > 0, 1L).otherwise(0L))
        .withColumn("__ry", when(col("__hy").bitwiseAND(s) > 0, 1L).otherwise(0L))
        .withColumn(outCol, col(outCol) +
          lit(s) * lit(s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry")))
        // rotate/reflect the quadrant: when ry==0 { if rx==1 reflect both
        // in n-1; swap x and y } — fused into the two new-coordinate exprs
        .withColumn("__nx",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n1) - col("__hy")).otherwise(col("__hy")))
            .otherwise(col("__hx")))
        .withColumn("__ny",
          when(col("__ry") === 0,
            when(col("__rx") === 1, lit(n1) - col("__hx")).otherwise(col("__hx")))
            .otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
        .withColumn("__hy", col("__ny"))
    }
    cur.drop("__hx", "__hy", "__rx", "__ry", "__nx", "__ny")
  }

  /** [[zorder2]]'s Hilbert twin: range-partition + locally sort by the
    * Hilbert index of the two (stat-normalized) columns.
    */
  def hilbertOrder2(df: DataFrame, xCol: String, xLo: Double, xHi: Double,
      yCol: String, yLo: Double, yHi: Double, bits: Int, numFiles: Int): DataFrame = {
    requireFresh(df, Seq("__cx", "__cy", "__h"), "hilbertOrder2")
    val pre = df
      .withColumn("__cx", normalize(col(xCol), xLo, xHi, bits))
      .withColumn("__cy", normalize(col(yCol), yLo, yHi, bits))
    hilbertValue2(pre, "__cx", "__cy", bits, "__h")
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__cx", "__cy", "__h")
  }

  /** Plan small-file compaction: group `(path, bytes)` listings into bins of
    * at most `targetBytes` via first-fit-decreasing (files larger than the
    * target get their own bin). This is driver-side METADATA work — listings
    * are file-count-sized, not data-sized — and the output feeds a rewrite
    * job per bin (`spark.read.parquet(bin: _*).coalesce(1).write...`), which
    * is the data-scale part and stays fully distributed. FFD packs within
    * 22% of optimal, which is noise next to the goal: turning a
    * millions-of-small-files table back into ~targetBytes row groups so
    * scans stop paying per-file open/footer costs.
    */
  def compactionBins(files: Seq[(String, Long)], targetBytes: Long): Seq[Seq[String]] = {
    require(targetBytes > 0)
    val binSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val binFiles = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[String]]
    files.sortBy(-_._2).foreach { case (path, sz) =>
      val i = binSizes.indexWhere(_ + sz <= targetBytes)
      if (i >= 0) { binSizes(i) += sz; binFiles(i) += path }
      else { binSizes += sz; binFiles += scala.collection.mutable.ArrayBuffer(path) }
    }
    binFiles.map(_.toSeq).toSeq
  }

  /** Rewrite `df` into `numFiles` range-partitions of the 2-D z-curve over
    * `(xCol, yCol)` (domains from the caller, e.g. table stats), each
    * partition sorted by the curve. Write the result with any file sink and
    * every output file has a tight bounding box in BOTH columns.
    */
  def zorder2(df: DataFrame, xCol: String, xLo: Double, xHi: Double,
      yCol: String, yLo: Double, yHi: Double, bits: Int, numFiles: Int): DataFrame =
    zorderN(df, Seq((xCol, xLo, xHi), (yCol, yLo, yHi)), bits, numFiles)

  /** N-column generalization of [[zorder2]]: `cols` is (name, lo, hi) per
    * curve dimension, domains from table stats. `bits * cols.length` must
    * fit the 62-bit curve ([[zValueN]]); more dimensions at fewer bits each
    * trades per-column resolution for multi-column coverage — 3-4 columns
    * at 8-16 bits is the practical sweet spot (beyond that each column's
    * clustering contribution dilutes).
    */
  def zorderN(df: DataFrame, cols: Seq[(String, Double, Double)],
      bits: Int, numFiles: Int): DataFrame = {
    requireFresh(df, Seq("__z"), "zorderN")
    val z = zValueN(cols.map { case (c, lo, hi) => normalize(col(c), lo, hi, bits) }, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
