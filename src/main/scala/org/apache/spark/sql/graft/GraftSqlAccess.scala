package org.apache.spark.sql.graft

import org.apache.spark.sql.errors.QueryExecutionErrors

/** Narrow accessor into `private[sql]` Spark internals — the standard
  * Spark-library technique (a package-qualified shim) for raising the
  * SAME error objects the engine raises, so an optimizer rewrite that
  * must preserve ANSI failure semantics (graft.plans.NativeCosineRule →
  * graft.functions.CosineHof) throws exactly what `Divide` throws. Keep
  * this file minimal: one forwarder per internal touched. */
object GraftSqlAccess {

  /** Divide's ANSI DIVIDE_BY_ZERO, without positional query context (the
    * rewrite site does not retain the SQL text origin). Typed
    * `ArithmeticException` (the concrete type Spark returns) — codegen
    * emits a bare `throw <forwarder>();`, and Janino rejects throwing a
    * checked `Throwable` from generated code, so the unchecked static
    * type is load-bearing for whole-stage codegen. */
  def divideByZeroError(): ArithmeticException =
    QueryExecutionErrors.divideByZeroError(null)
}
