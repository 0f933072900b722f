package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.GraftFunctions
import graft.parser.GraftSparkParser

/** `spark.sql.extensions=graft.GraftExtensions` wires the dialect in
  * (reference: v3.5/.../LightningSparkSessionExtension.scala:34-40 — parser
  * injection only; the reference injects zero optimizer rules and so do we:
  * Catalyst handles pushdown/pruning/reorder on our declarative plans).
  *
  * Beyond the reference, the pipeline expressions register as SQL functions
  * too (same builder table as `Graft.install`'s temp-function path, so the
  * surfaces cannot drift): a SQL-only user gets the dedup/ANN primitives
  * without touching the Scala API — `SELECT simhash64(toks),
  * minhash_signature(toks, 128), cosine_similarity(a, b), lsh_bucket(v, 8),
  * word_shingles(toks, 3), winnowed_fingerprints(text, 9, 4),
  * minhash_agg(sh, 128), sketch_jaccard(s1, s2), z_value2(x, y, 16)` all
  * parse and run codegen'd exactly like their DataFrame twins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new GraftSparkParser(delegate))
    // Row-level DML (DELETE/UPDATE/MERGE) over the native lake tables:
    // swap the resolved plan for a copy-on-write command before Spark's
    // SupportsRowLevelOperations machinery would reject the table.
    ext.injectResolutionRule(session => new graft.plans.LakeRowLevelRule(session))
    GraftFunctions.sqlBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (children: Seq[Expression]) => builder(children)))
    }
  }
}
