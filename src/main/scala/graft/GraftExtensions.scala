package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FloatCosine, FloatDot, FloatNorm}

/** SparkSessionExtensions entry point: exposes the engine's native
  * codegen vector expressions to the SQL front-end, so
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   spark.sql("SELECT float_cosine(a.emb, b.emb) FROM ...")
  * }}}
  *
  * scores vectors inside WholeStageCodegen with no Scala-API dependence.
  * [[GraftExtensions.register]] does the same injection on an already
  * running session (notebooks, tests — extensions confs only apply at
  * session construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injected.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private val injected: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("float_dot",
      info("float_dot", "_FUNC_(a, b) - dot product of two float vectors"),
      (es: Seq[Expression]) => FloatDot(es(0), es(1))),
    ("float_norm",
      info("float_norm", "_FUNC_(a) - L2 norm of a float vector"),
      (es: Seq[Expression]) => FloatNorm(es.head)),
    ("float_cosine",
      info("float_cosine", "_FUNC_(a, b) - cosine similarity of two float vectors"),
      (es: Seq[Expression]) => FloatCosine(es(0), es(1))))

  /** Register the same functions on a LIVE session (extensions confs are
    * construction-time only).
    */
  def register(spark: SparkSession): Unit =
    injected.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
