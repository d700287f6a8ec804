package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Retrieval / corpus-LM scoring for training-data pipelines:
  * BM25 keyword relevance and unigram-frequency rarity (the
  * perplexity-proxy quality filter — CCNet filters on a KenLM
  * perplexity; the exact-arithmetic analog here is mean inverse
  * corpus frequency, which needs no model file and is reproducible
  * bit-for-bit across engines).
  *
  * Cross-engine determinism (the oracle invariant): no
  * transcendentals — BM25's log-idf is replaced by its rational core
  * (N - df + 0.5)/(df + 0.5), monotone in df so rankings are the
  * classic BM25 rankings, and every value is reached by the same
  * IEEE expression tree from exact integers on both engines. Rarity
  * weights are integer-quantized (1e9 div count) so per-document
  * sums are integer sums — order-independent, immune to float
  * summation order across partitions.
  */
object Retrieval {

  // each constant is a parsed decimal literal (never derived
  // arithmetic like K1+1, whose rounding could differ from the SQL
  // twin's parse of "2.2"); the SQL oracle embeds the same strings
  val Bm25K1 = 1.2
  val Bm25K1Plus1 = 2.2
  val Bm25B = 0.75
  val Bm25OneMinusB = 0.25

  /** Per-term whole-word occurrence count in single-spaced text —
    * counts " term " in the space-padded lowered text, the same
    * replace-length-mirrorable construction as TextAnalysis.langScore.
    */
  private def tf(text: Column, term: String): Column =
    TextFns.countOccurrences(
      concat(lit(" "), lower(text), lit(" ")), s" $term ")

  /** BM25 scores for a fixed term set, top `limit` documents.
    *
    * Scale shape: document stats (N, avgdl) and per-term document
    * frequencies come from ONE corpus aggregation with map-side
    * partials (conditional aggregates — a fixed query never needs the
    * inverted-index explode); the single stats row broadcasts back
    * over the corpus; scoring is a narrow codegen map; top-k is
    * orderBy+limit = TakeOrderedAndProject (per-partition heaps, no
    * global sort materialization).
    */
  def bm25(docs: DataFrame, terms: Seq[String], limit: Int = 25,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    val dl = size(TextFns.words(col(textCol)))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      tf(col(textCol), t).as(s"__tf_$i") }
    val base = docs.select(col(idCol).as("doc_id") +: dl.as("__dl") +: tfCols: _*)
    val aggCols = count(lit(1)).as("__n_docs") +:
      sum(col("__dl")).as("__sum_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).as(s"__df_$i"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
      .withColumn("__avgdl",
        col("__sum_dl").cast("double") / col("__n_docs").cast("double"))
    // rational idf (no log — monotone-equivalent for ranking) times the
    // saturating tf term; parenthesization mirrored exactly in the SQL
    // twin so IEEE evaluation agrees to the last bit
    val termScores = terms.indices.map { i =>
      val tfc = col(s"__tf_$i").cast("double")
      val idf = (col("__n_docs").cast("double") - col(s"__df_$i").cast("double")
        + lit(0.5)) / (col(s"__df_$i").cast("double") + lit(0.5))
      idf * ((tfc * lit(Bm25K1Plus1)) /
        (tfc + lit(Bm25K1) * (lit(Bm25OneMinusB)
          + lit(Bm25B) * (col("__dl").cast("double") / col("__avgdl")))))
    }
    val score = termScores.reduceLeft(_ + _)
    scored.select(
        col("doc_id") +: col("__dl").as("dl") +:
          terms.indices.map(i => col(s"__tf_$i").as(s"tf_${terms(i)}")) :+
          round(score, 6).as("bm25"): _*)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(limit)
  }

  /** Corpus-frequency rarity score per document: each token instance
    * contributes weight 1e9 div corpusCount(token) (integer division
    * — exact on both engines), and the document score is the integer
    * sum of its instances' weights. mean_rarity = rarity_sum /
    * n_tokens. High mean rarity = off-distribution / OOV-heavy text,
    * the unigram-LM analog of a perplexity filter.
    *
    * Scale shape: one explode over the corpus feeding BOTH the vocab
    * count (groupBy token, map-side partials collapse each partition
    * to its vocabulary) and the instance stream; instances re-join the
    * (much smaller) vocab on the token key — Zipf skew on hot tokens
    * is bounded because the count side is one row per token and AQE
    * handles the instance-side skew; then one groupBy doc_id with an
    * integer sum. No driver-side model, no floats until the final
    * division.
    */
  def rarity(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextFns.words(lower(col(textCol)))).as("term"))
    val vocab = tok.groupBy("term").agg(count(lit(1)).as("__c"))
    tok.join(vocab, Seq("term"))
      .withColumn("__w", expr("CAST(1000000000 AS BIGINT) div __c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__w")).as("rarity_sum"))
      .select(col("doc_id"), col("n_tokens"), col("rarity_sum"),
        round(col("rarity_sum").cast("double") / col("n_tokens").cast("double"), 4)
          .as("mean_rarity"))
  }
}
