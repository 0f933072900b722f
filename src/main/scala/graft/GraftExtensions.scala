package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.parser.GraftSparkParser

/** `spark.sql.extensions=graft.GraftExtensions` wires the dialect in
  * (reference: v3.5/.../LightningSparkSessionExtension.scala:34-40 — parser
  * injection only; the reference injects zero optimizer rules and so do we:
  * Catalyst handles pushdown/pruning/reorder on our declarative plans).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new GraftSparkParser(delegate))
  }
}
