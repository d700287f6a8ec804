package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.operators.Dedup

/** SparkSessionExtensions registration so the native expressions are
  * callable from SQL text as well as the Column API:
  *
  *   spark.sql("SELECT graft_simhash(split(text,' ')) FROM docs")
  *
  * Enable with
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * or retrofit a live session with GraftExtensions.registerAll(spark).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", name, usage)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - weighted 64-bit simhash"),
      (args: Seq[Expression]) => native.SimHash64(args.head)),
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - float-array dot product in double"),
      (args: Seq[Expression]) => native.FloatDotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_winnow"),
      info("graft_winnow", "graft_winnow(text, k, w) - winnowing fingerprints"),
      (args: Seq[Expression]) => native.WinnowingFingerprints(args(0),
        intArg(args(1), "k"), intArg(args(2), "w"))),
    (FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles", "graft_word_shingles(text, k) - distinct word k-grams"),
      (args: Seq[Expression]) => native.WordShingles(args(0), intArg(args(1), "k"))),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles) - 64-perm minhash signature"),
      (args: Seq[Expression]) => Dedup.minhashExpression(args.head)),
    (FunctionIdentifier("graft_hyperplane_sig"),
      info("graft_hyperplane_sig",
        "graft_hyperplane_sig(vec, bits, planeOffset) - LSH signature"),
      (args: Seq[Expression]) => native.HyperplaneSignature(args(0),
        intArg(args(1), "bits"), intArg(args(2), "planeOffset"))),
    (FunctionIdentifier("graft_ethiopian_dmy"),
      info("graft_ethiopian_dmy",
        "graft_ethiopian_dmy(date) - Ethiopian calendar 'D/M/Y' string"),
      (args: Seq[Expression]) => native.EthiopianDMY(
        org.apache.spark.sql.catalyst.expressions.Cast(args.head,
          org.apache.spark.sql.types.DateType))))

  /** Retrofit registration into an already-created session. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.graftshim.GraftShim
        .registerFunction(spark, ident, inf, builder)
    }
}
