package graft

import graft.functions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native functions for the
  * SQL surface:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * or imperatively on a live session via [[GraftFunctions.register]].
  * After registration, `SELECT cosine_similarity(a.embedding,
  * b.embedding)` works from plain SQL — the same Expression instances
  * the Column API uses (graft.functions.VectorFunctions), codegen
  * included.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}

object GraftFunctions {
  type Descriptor = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression)

  val descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))

  /** Imperative registration for an already-built session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
