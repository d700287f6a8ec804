package graft

import org.apache.spark.sql.functions._
import graft.plans.native

/** The hot native expressions must participate in whole-stage codegen
  * (VERDICT r1 #8): no CodegenFallback in the generated code, and the
  * generated path must agree with the interpreted path bit-for-bit.
  */
class NativeCodegenSpec extends SparkSpec {

  private val P = 4294967311L
  private val as = Seq(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)
  private val bs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)

  private def hotDf = {
    import spark.implicits._
    Seq(
      ("alpha beta gamma delta epsilon zeta", Array(0.1f, -0.4f, 0.9f, 0.2f)),
      ("one two three four five six seven eight", Array(-1.0f, 0.5f, 0.25f, -0.75f)))
      .toDF("text", "vec")
      .select(
        native.minhashSig(split(col("text"), " "), 8, P, as, bs).as("mh"),
        native.simhash64(split(col("text"), " ")).as("sh"),
        native.hyperplaneSig(col("vec"), 12, 24).as("hp"),
        native.wordShingles(col("text"), 3).as("ws"),
        native.wordNgrams(col("text"), 2).as("wn"),
        native.intraDedupText(col("text"), 2).as("idd"),
        native.winnowing(col("text"), 5, 4).as("wf"),
        native.literalCount(col("text"), "e").as("lc"),
        native.sharedGramCount(col("text"), col("text"), 5).as("sg"),
        native.regexpCount(col("text"), "[aeiou]+").as("rc"),
        native.markerScores(lower(col("text")),
          Seq(Seq("one", "two"), Seq("beta", "zeta"))).as("ms"),
        native.byteClassCount(col("text"), Seq(('a', 'f'), ('0', '9'))).as("bc"),
        native.scalarQuantizeCodes(col("vec"),
          array(lit(-1.0), lit(-0.4), lit(0.25), lit(0.2)),
          array(lit(0.1), lit(0.5), lit(0.9), lit(0.2)), 256).as("sq"),
        hex(native.sq8Code(col("vec"))).as("q8"), // hex: Row.toString on raw binary prints the array identity
        native.sq8Scale(col("vec")).as("q8s"),
        native.byteDot(native.sq8Code(col("vec")),
          native.sq8Code(col("vec"))).as("q8d"),
        native.ivfCellSelect(col("vec"), icsCents,
          Array.empty[Float], Array.empty[Int], 4, 2, 2).as("ics"),
        native.ivfCellSelect(col("vec"), icsCents,
          Array(0.25f, 0.25f, 0f, 0f, 0f, 0f, 0.5f, 0.25f),
          Array(0, 0, 1), 4, 1, 2).as("icc"),
        native.benchArgmax(col("vec"), lit(7L), icsCents,
          Array(1L, 7L, 9L), 4).as("ba"))
  }

  // 3 centroids × dim 4, row-major (exhaustive + coarse IvfCellSelect)
  private val icsCents = Array(
    0.5f, 0f, 0f, 0f, 0f, 0.5f, 0f, 0f, 0f, 0f, 0.5f, 0.25f)

  test("sq8 code/scale approximate the float dot within quantization error") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (1 to 50).map(_ => Array.fill(64)(rnd.nextFloat() * 2 - 1))
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "vec")
    val paired = df.as("a").crossJoin(df.as("b"))
      .select(
        graft.functions.VectorFns.dot(col("a.vec"), col("b.vec")).as("exact"),
        (native.sq8Scale(col("a.vec")) * native.sq8Scale(col("b.vec"))
          * native.byteDot(native.sq8Code(col("a.vec")),
            native.sq8Code(col("b.vec"))).cast("double")).as("approx"))
      .collect()
    paired.foreach { r =>
      val (e, a) = (r.getDouble(0), r.getDouble(1))
      // 64 dims × per-term error ≤ scale_a·scale_b·(|qa|+|qb|+0.5)/127:
      // loose bound 0.5 for unit-range vectors — catches sign bugs,
      // scale bugs, and truncation-vs-round regressions
      assert(math.abs(e - a) < 0.5, s"exact $e vs sq8 $a")
    }
  }

  test("minhash/simhash/hyperplane/shingles/winnowing generate code — no fallback marker") {
    val plan = hotDf.queryExecution.executedPlan
    val code = org.apache.spark.sql.execution.debug.codegenString(plan)
    assert(code.contains("WholeStageCodegen"), code.take(500))
    assert(!code.contains("CodegenFallback"), code.take(2000))
  }

  test("byte-scan literalCount matches the replace-length construction on edge inputs") {
    import spark.implicits._
    // multi-byte UTF-8 (é = 2 bytes, 文 = 3), overlap candidates,
    // boundary matches, frequent single-char patterns, no-match
    val rows = Seq(
      ("héllo héllo héllo", "héllo"), ("aaaa", "aa"), ("aaaaa", "aa"),
      ("文字文字文", "文字"), ("a b c d e", " "), ("", "x"),
      ("ab", "abc"), ("xx", "xx"), (" pad pad ", " pad "),
      ("ééé", "é"), ("aéaéa", "éa"))
    rows.foreach { case (text, pat) =>
      val df = Seq(text).toDF("t")
      val got = df.select(native.literalCount(col("t"), pat)).head.getInt(0)
      val ref = df.select(
        ((length(col("t")) - length(regexp_replace(col("t"),
          lit(java.util.regex.Pattern.quote(pat)), lit(""))))
          / lit(pat.length)).cast("int")).head.getInt(0)
      assert(got == ref, s"countLiteral('$text', '$pat'): got $got, replace-length $ref")
    }
  }

  test("wordNgrams keeps repeats and order; short texts yield no grams") {
    import spark.implicits._
    def grams(t: String, k: Int): Seq[String] =
      Seq(t).toDF("t").select(native.wordNgrams(col("t"), k)).head
        .getSeq[String](0)
    assert(grams("a b a b c", 2) == Seq("a b", "b a", "a b", "b c"))
    assert(grams("a b c", 3) == Seq("a b c"))
    assert(grams("a b", 3) == Seq.empty)
    assert(grams("solo", 2) == Seq.empty)
    // double space: split keeps the empty token, same as split(text,' ')
    assert(grams("a  b", 2) == Seq("a ", " b"))
  }

  test("intraDedupText keeps first occurrence per segment, in order") {
    import spark.implicits._
    def dedup(t: String, w: Int): String =
      Seq(t).toDF("t").select(native.intraDedupText(col("t"), w)).head
        .getString(0)
    assert(dedup("a b a b c d", 2) == "a b c d")        // repeat dropped
    assert(dedup("a b c a b c a b", 2) == "a b c a b c") // ["a b","c a","b c","a b"] -> drop last
    assert(dedup("x y z", 5) == "x y z")                 // single short segment
    assert(dedup("q q q q", 1) == "q")
    assert(dedup("", 3) == "")
  }

  test("fused band buckets replay the catalyst xxhash64 banding chain bit-for-bit") {
    import spark.implicits._
    import graft.operators.Dedup
    // streaming dedup checkpoints state keyed by these buckets: the
    // r7 signature/banding fusion must not move a single bucket value
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "entirely different words compose this second document body"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val bands = Dedup.Bands; val rpb = Dedup.RowsPerBand
    val rows = graft.operators.Dedup.minhashSignature(docs, "text", "doc_id")
      .select(col("doc_id"), col("buckets"),
        array((0 until bands).map { j =>
          xxhash64(lit(j) +: (0 until rpb).map(r =>
            element_at(col("sig"), j * rpb + r + 1)): _*)
        }: _*).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("generated code compiles and matches the interpreted evaluation") {
    // forbid silent fallback: a janino compile error must throw, not
    // quietly revert to the interpreted path
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = hotDf.collect()
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = hotDf.collect()
      assert(rows.map(_.toString).toSeq === interpreted.map(_.toString).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("benchArgmax: zero-norm vectors are defined away, not arrival-order-dependent") {
    import spark.implicits._
    // bench entry 0 is a ZERO vector placed FIRST: without the bn==0
    // skip, its NaN grid would win via the bestId<0 branch and then
    // never lose (g > NaN is false) — the winner would depend on
    // arrival order while the DuckDB oracle sorts NaN first. Defined
    // contract instead: zero-norm bench entries are skipped, zero-norm
    // candidates short-circuit to the (−Inf, −1) sentinel.
    val bench = Array(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)
    val ids = Array(100L, 200L, 300L)
    val df = Seq(
      (1L, Array(1f, 0.1f, 0f, 0f)),
      (2L, Array(0f, 0f, 0f, 0f)))
      .toDF("id", "vec")
    val out = df.select(col("id"),
        native.benchArgmax(col("vec"), col("id"), bench, ids, 4).as("ba"))
      .collect().map(r => r.getLong(0) ->
        (r.getStruct(1).getDouble(0), r.getStruct(1).getLong(1))).toMap
    assert(out(1L)._2 == 200L, s"zero-norm bench entry must not win: ${out(1L)}")
    assert(out(2L) == (Double.NegativeInfinity, -1L),
      s"zero-norm candidate must hit the sentinel: ${out(2L)}")
  }
}
