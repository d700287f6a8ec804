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
    (FunctionIdentifier("graft_sq8_code"),
      info("graft_sq8_code",
        "graft_sq8_code(vec) - per-vector symmetric int8 codes as binary"),
      (args: Seq[Expression]) => native.Sq8Code(args.head)),
    (FunctionIdentifier("graft_sq8_scale"),
      info("graft_sq8_scale",
        "graft_sq8_scale(vec) - dequantization scale (max|x|/127) for graft_sq8_code"),
      (args: Seq[Expression]) => native.Sq8Scale(args.head)),
    (FunctionIdentifier("graft_byte_dot"),
      info("graft_byte_dot",
        "graft_byte_dot(a, b) - signed-byte integer dot of two binary codes"),
      (args: Seq[Expression]) => native.ByteDotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_span_corrupt"),
      info("graft_span_corrupt",
        "graft_span_corrupt(doc_id, text, span_words, rate_ppm) - T5 span " +
          "corruption: struct(n_groups, n_masked, corrupted, targets); " +
          "masking is the md5-prefix draw at rate_ppm/1e6"),
      (args: Seq[Expression]) => native.SpanCorrupt(args(0), args(1),
        intArg(args(2), "span_words"), {
          val ppm = intArg(args(3), "rate_ppm")
          val rate = ppm / 1000000.0
          if (rate >= 1.0) 1L << 32 else (rate * (1L << 32)).toLong
        })),
    (FunctionIdentifier("graft_shared_grams"),
      info("graft_shared_grams",
        "graft_shared_grams(a, b, n) - distinct character n-grams shared by two strings"),
      (args: Seq[Expression]) => native.SharedGramCount(args(0), args(1),
        intArg(args(2), "n"))),
    (FunctionIdentifier("graft_ethiopian_dmy"),
      info("graft_ethiopian_dmy",
        "graft_ethiopian_dmy(date) - Ethiopian calendar 'D/M/Y' string"),
      (args: Seq[Expression]) => native.EthiopianDMY(
        org.apache.spark.sql.catalyst.expressions.Cast(args.head,
          org.apache.spark.sql.types.DateType))),
    // the reference's date-diff family (TIMESTAMPDIFF ×83 /
    // PERIOD_DIFF ×2) as SQL functions. Builders construct the
    // Catalyst trees directly (a composed Column tree returned from a
    // function builder stays an unevaluable ColumnNodeExpression);
    // the arithmetic mirrors graft.functions.DateFns node for node
    // and DateFnsSpec/ExtensionsSpec pin both to the same values.
    (FunctionIdentifier("graft_months_between"),
      info("graft_months_between",
        "graft_months_between(a, b) - MySQL TIMESTAMPDIFF(MONTH, a, b) complete months"),
      (args: Seq[Expression]) => dateExprs.monthsBetween(args(0), args(1))),
    (FunctionIdentifier("graft_weeks_between"),
      info("graft_weeks_between",
        "graft_weeks_between(a, b) - MySQL TIMESTAMPDIFF(WEEK, a, b) complete weeks"),
      (args: Seq[Expression]) => dateExprs.weeksBetween(args(0), args(1))),
    (FunctionIdentifier("graft_years_between"),
      info("graft_years_between",
        "graft_years_between(a, b) - MySQL TIMESTAMPDIFF(YEAR, a, b) complete years"),
      (args: Seq[Expression]) => dateExprs.yearsBetween(args(0), args(1))),
    (FunctionIdentifier("graft_period_diff"),
      info("graft_period_diff",
        "graft_period_diff(b, a) - MySQL PERIOD_DIFF month-index difference"),
      (args: Seq[Expression]) => dateExprs.periodDiff(args(0), args(1))))

  /** Catalyst-tree twins of graft.functions.DateFns. */
  private object dateExprs {
    import org.apache.spark.sql.catalyst.expressions.{Add, And, CaseWhen,
      Cast, DateDiff, DayOfMonth, Divide, GreaterThan, If, LessThan, Month,
      Multiply, Or, Subtract, Year, EqualTo}
    import org.apache.spark.sql.types.{DateType, DoubleType, IntegerType}

    private def d(e: Expression) = Cast(e, DateType)
    private def mi(x: Expression) =
      Add(Multiply(Year(x), Literal(12)), Month(x))

    def monthsBetween(a0: Expression, b0: Expression): Expression = {
      val a = d(a0); val b = d(b0)
      val m = Subtract(mi(b), mi(a))
      Cast(CaseWhen(Seq(
        (And(GreaterThan(m, Literal(0)), LessThan(DayOfMonth(b), DayOfMonth(a))),
          Subtract(m, Literal(1))),
        (And(LessThan(m, Literal(0)), GreaterThan(DayOfMonth(b), DayOfMonth(a))),
          Add(m, Literal(1)))),
        Some(m)), IntegerType)
    }

    def weeksBetween(a0: Expression, b0: Expression): Expression =
      Cast(Divide(Cast(DateDiff(d(b0), d(a0)), DoubleType), Literal(7.0)),
        IntegerType)

    def yearsBetween(a0: Expression, b0: Expression): Expression = {
      val a = d(a0); val b = d(b0)
      val before = Or(LessThan(Month(b), Month(a)),
        And(EqualTo(Month(b), Month(a)), LessThan(DayOfMonth(b), DayOfMonth(a))))
      Cast(Subtract(Subtract(Year(b), Year(a)),
        If(before, Literal(1), Literal(0))), IntegerType)
    }

    def periodDiff(b0: Expression, a0: Expression): Expression =
      Cast(Subtract(mi(d(b0)), mi(d(a0))), IntegerType)
  }

  /** Retrofit registration into an already-created session. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      org.apache.spark.sql.graftshim.GraftShim
        .registerFunction(spark, ident, inf, builder)
    }
}
