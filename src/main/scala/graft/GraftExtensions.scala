package graft

import graft.functions.{CanonicalizeJson, CosineSimilarity, DotProduct, MinHashSignature, NfcNormalize, RollingHash, ShingleHashes, SpaceSavingAgg}
import org.apache.spark.sql.catalyst.expressions.Literal
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

  // every builder pattern-matches arity: args(i) indexing would
  // silently DROP extra arguments (plausible wrong results) and throw
  // a bare IndexOutOfBounds on too few
  private def arity2(name: String)(f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case _ => throw new IllegalArgumentException(
      s"$name takes exactly two arguments")
  }
  private def arity1(name: String)(f: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a) => f(a)
    case _ => throw new IllegalArgumentException(
      s"$name takes exactly one argument")
  }

  val descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        "cosine_similarity"),
      arity2("cosine_similarity(a, b)")(CosineSimilarity(_, _))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      arity2("dot_product(a, b)")(DotProduct(_, _))),
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      arity1("rolling_hash(text)")(RollingHash(_))),
    (FunctionIdentifier("canonicalize_json"),
      new ExpressionInfo(classOf[CanonicalizeJson].getName,
        "canonicalize_json"),
      arity1("canonicalize_json(text)")(CanonicalizeJson(_))),
    // optional int arg = shingle width / permutation count; must be a
    // foldable literal, like Spark's own e.g. `round(x, 2)`
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => ShingleHashes(t)
        case Seq(t, Literal(n: Int, _)) => ShingleHashes(t, n)
        case _ => throw new IllegalArgumentException(
          "shingle_hashes(text[, n]) — n must be an integer literal")
      }),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName,
        "minhash_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => MinHashSignature(a)
        case Seq(a, Literal(n: Int, _)) => MinHashSignature(a, n)
        case _ => throw new IllegalArgumentException(
          "minhash_signature(shingles[, perms]) — perms must be an " +
            "integer literal")
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      arity1("nfc_normalize(text)")(NfcNormalize(_))),
    (FunctionIdentifier("space_saving"),
      new ExpressionInfo(classOf[SpaceSavingAgg].getName, "space_saving"),
      (args: Seq[Expression]) => (args match {
        case Seq(item) => SpaceSavingAgg(item)
        case Seq(item, Literal(m: Int, _)) => SpaceSavingAgg(item, m)
        case _ => throw new IllegalArgumentException(
          "space_saving(item[, m]) — m must be an integer literal")
      }).toAggregateExpression()))

  /** Imperative registration for an already-built session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
