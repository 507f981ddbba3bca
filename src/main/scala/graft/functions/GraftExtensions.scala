package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library integration point: inject the native graft expressions into any
  * session at build time via
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * — the idiomatic way for a Spark library to ship custom Catalyst
  * expressions (no per-session `GraftFunctions.register` call needed, and
  * unlike temp functions the injection survives into every session cloned
  * from the build). `GraftFunctions.register` remains for notebook-style
  * ad-hoc use on an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim"), // exact cosine similarity of two float vectors
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64"), // 64-bit SimHash over whitespace tokens
      (exprs: Seq[Expression]) => Simhash64(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs"), // 8 seeded-md5 minhashes over 8-gram shingles
      (exprs: Seq[Expression]) => MinhashSigs(exprs(0))))
  }
}
