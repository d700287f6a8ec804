package graft

import graft.plans.GraftExtensions

class ExtensionsSpec extends SparkSpec {

  test("native expressions callable from SQL after registration") {
    GraftExtensions.registerAll(spark)
    Tables(spark, sf).documents.createOrReplaceTempView("docs_sql")
    val row = spark.sql(
      """SELECT doc_id,
        graft_simhash(split(lower(text), ' ')) AS sh,
        size(graft_winnow(text, 5, 4)) AS n_fps,
        size(graft_word_shingles(lower(text), 3)) AS n_shingles,
        size(graft_minhash(graft_word_shingles(lower(text), 3))) AS sig_len
        FROM docs_sql ORDER BY doc_id LIMIT 1""").head()
    assert(row.getInt(2) > 0)
    assert(row.getInt(3) > 0)
    assert(row.getInt(4) == 64)
  }

  test("sql simhash equals column-api simhash") {
    GraftExtensions.registerAll(spark)
    import org.apache.spark.sql.functions._
    Tables(spark, sf).documents.createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash(split(lower(text),' ')) AS sh FROM docs_sql")
    val viaCol = Tables(spark, sf).documents
      .select(col("doc_id"), operators.Dedup.simhash(col("text")).as("sh2"))
    val diff = viaSql.join(viaCol, "doc_id")
      .filter(col("sh") =!= col("sh2")).count()
    assert(diff == 0)
  }

  test("graft_ethiopian_dmy usable in SQL") {
    GraftExtensions.registerAll(spark)
    val v = spark.sql("SELECT graft_ethiopian_dmy(DATE '2024-01-21') AS ec").head().getString(0)
    assert(v == "12/5/2016") // Tir 12, 2016 EC
  }

  test("date-diff family usable in SQL with MySQL semantics") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT
        graft_months_between(DATE '2020-01-20', DATE '2020-03-15') AS m,
        graft_months_between(DATE '2020-01-31', DATE '2020-02-29') AS m_eom,
        graft_weeks_between(DATE '2020-01-01', DATE '2020-01-15') AS w,
        graft_years_between(DATE '2019-06-10', DATE '2020-06-09') AS y,
        graft_period_diff(DATE '2020-03-15', DATE '2020-01-20') AS p""").head()
    assert(r.getInt(0) === 1)  // complete months, day-aware
    assert(r.getInt(1) === 0)  // MySQL end-of-month behavior
    assert(r.getInt(2) === 2)
    assert(r.getInt(3) === 0)  // one day short of a complete year
    assert(r.getInt(4) === 2)  // period diff ignores day-of-month
  }

  test("sql date functions equal the DateFns Column API over real data") {
    GraftExtensions.registerAll(spark)
    import org.apache.spark.sql.functions._
    Tables(spark, sf).orders.createOrReplaceTempView("orders_sql")
    val viaSql = spark.sql(
      """SELECT o_orderkey,
        graft_months_between(o_orderdate, DATE '2000-01-01') AS m,
        graft_weeks_between(o_orderdate, DATE '2000-01-01') AS w
        FROM orders_sql""")
    val viaCol = Tables(spark, sf).orders.select(col("o_orderkey"),
      functions.DateFns.monthsBetween(col("o_orderdate"), lit("2000-01-01")).as("m2"),
      functions.DateFns.weeksBetween(col("o_orderdate"), lit("2000-01-01")).as("w2"))
    val bad = viaSql.join(viaCol, "o_orderkey")
      .filter(col("m") =!= col("m2") || col("w") =!= col("w2")).count()
    assert(bad == 0)
  }

  test("graft_dot usable in SQL over embeddings") {
    GraftExtensions.registerAll(spark)
    Tables(spark, sf).embeddings.createOrReplaceTempView("emb_sql")
    val v = spark.sql(
      """SELECT graft_dot(a.embedding, b.embedding) AS d
        FROM emb_sql a JOIN emb_sql b ON a.vec_id = 0 AND b.vec_id = 1""").head().getDouble(0)
    assert(!v.isNaN)
  }

  test("graft_shared_grams matches the Column API and counts planted overlap") {
    GraftExtensions.registerAll(spark)
    import spark.implicits._
    Seq(("abcdefgh zz", "qq abcdefgh")).toDF("a", "b")
      .createOrReplaceTempView("grams_sql")
    // shared region "abcdefgh" = 8 chars -> 4 distinct 5-grams
    val sql = spark.sql(
      "SELECT graft_shared_grams(a, b, 5) AS n FROM grams_sql").head().getInt(0)
    val api = Seq(("abcdefgh zz", "qq abcdefgh")).toDF("a", "b")
      .select(graft.plans.native.sharedGramCount(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"), 5))
      .head().getInt(0)
    assert(sql == 4 && api == 4, s"sql=$sql api=$api")
  }

  test("sq8 SQL functions approximate graft_dot like the Column API") {
    GraftExtensions.registerAll(spark)
    Tables(spark, sf).embeddings.createOrReplaceTempView("emb_sql2")
    val r = spark.sql(
      """SELECT graft_dot(a.embedding, b.embedding) AS exact,
          graft_sq8_scale(a.embedding) * graft_sq8_scale(b.embedding)
            * CAST(graft_byte_dot(graft_sq8_code(a.embedding),
                graft_sq8_code(b.embedding)) AS DOUBLE) AS approx
        FROM emb_sql2 a JOIN emb_sql2 b ON a.vec_id < 20 AND b.vec_id < 20""")
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 0.5,
        s"exact ${row.getDouble(0)} vs sq8 ${row.getDouble(1)}")
    }
  }

  test("graft_span_corrupt matches the operator output from SQL") {
    import graft.operators.TextAnalysis
    val docs = graft.Tables(spark, sf).documents
    docs.createOrReplaceTempView("docs_span_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, sc.n_groups, sc.n_masked, sc.corrupted, sc.targets
        FROM (SELECT doc_id,
          graft_span_corrupt(doc_id, text, 3, 150000) AS sc
          FROM docs_span_sql) ORDER BY doc_id""").collect()
    val viaApi = TextAnalysis.spanCorrupt(docs, spanWords = 3, rate = 0.15)
      .orderBy("doc_id").collect()
    assert(viaSql.length == viaApi.length && viaSql.nonEmpty)
    viaSql.zip(viaApi).foreach { case (a, b) =>
      assert(a.toString == b.toString)
    }
  }

  test("graft_span_corrupt coerces an INT doc id (implicit cast)") {
    // without declared input types, an INT id hit asInstanceOf[Long]
    // in interpreted eval (ClassCastException) while codegen silently
    // widened — behavior differed by execution mode
    val r = spark.sql(
      """SELECT graft_span_corrupt(CAST(7 AS INT), 'a b c d e f', 3,
        500000).n_groups AS g""").collect()
    assert(r.length == 1 && r.head.getLong(0) >= 0L)
  }
}
