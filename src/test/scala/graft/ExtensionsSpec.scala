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

  test("graft_dot usable in SQL over embeddings") {
    GraftExtensions.registerAll(spark)
    Tables(spark, sf).embeddings.createOrReplaceTempView("emb_sql")
    val v = spark.sql(
      """SELECT graft_dot(a.embedding, b.embedding) AS d
        FROM emb_sql a JOIN emb_sql b ON a.vec_id = 0 AND b.vec_id = 1""").head().getDouble(0)
    assert(!v.isNaN)
  }
}
