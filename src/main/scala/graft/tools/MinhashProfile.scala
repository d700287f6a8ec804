package graft.tools

import org.apache.spark.sql.functions._

/** Perm-count measurement for the minhash LSH default (VERDICT r3 #7):
  * how much of the 64× d_minhash_lsh wall is the signature pass, and
  * what a 32-perm (8-band × 4-row) variant would cost in RECALL at
  * the correctness scale. The recall check is the decisive one since
  * round 4: the d_dedup_corpus / d_incr_dedup DuckDB oracles compare
  * the LSH-edge connected components against TRUE all-pairs jaccard
  * edges, so the registered default must keep banding recall = 1 at
  * sf0.01 — a cheaper default that misses even one threshold-adjacent
  * pair breaks the hash gate.
  *
  * Usage: MinhashProfile <blowUpDir> <sfDir>
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val Array(blowDir, sfDir) = args.take(2)
    // optional third arg "candgen": skip straight to the candidate-
    // generation A/B (the full sweep costs ~10 min at 256×)
    val candgenOnly = args.length > 2 && args(2) == "candgen"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.GraftSession.local(cpus, "graft-minhash-profile")
    import graft.operators.Dedup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mh] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      Console.flush()
      r
    }

    // ---- cost side (64× blow-up) --------------------------------
    val big = graft.Tables(spark, blowDir).documents
    if (!candgenOnly) time("signature pass only (64 perms)") {
      Dedup.minhashSignature(big, "text", "doc_id")
        .select("doc_id", "sig")
        .write.format("noop").mode("overwrite").save()
    }
    if (!candgenOnly) time("banding only (sig + 16 bands)") {
      Dedup.bandedIds(Dedup.minhashSignature(big, "text", "doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    val stages = new scala.collection.mutable.ArrayBuffer[(String, Double, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val info = sc.stageInfo
          val secs = (for {
            s <- info.submissionTime; c <- info.completionTime
          } yield (c - s) / 1e3).getOrElse(0.0)
          stages.synchronized {
            stages += ((s"stage ${info.stageId} ${info.name.takeWhile(_ != '(')}", secs, info.numTasks))
          }
        }
      })
    if (!candgenOnly) (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      stages.synchronized(stages.clear())
      time(s"full d_minhash_lsh (run $i, cold cache)") {
        graft.SparkEntry.queries("d_minhash_lsh")(spark, blowDir)
          .write.format("noop").mode("overwrite").save()
      }
      stages.synchronized {
        stages.filter(_._2 > 0.5).sortBy(-_._2).take(10).foreach { case (n, s, t) =>
          println(f"[mh]     $s%7.2f s  tasks=$t%-4d $n")
        }
      }
    }
    spark.catalog.clearCache()

    // ---- verify-stage variants (the wall is after banding) -------
    if (!candgenOnly) {
      val signed = Dedup.minhashSignature(big, "text", "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("  signed materialize")(signed.count())
      val banded = Dedup.bandedIds(signed)
      val cands = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
        .join(banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b")),
          Seq("band", "bucket"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates("doc_a", "doc_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("  candidate ids only")(cands.count())
      val sh = signed.select(col("doc_id"), col("shingles"))
      time("  verify: shuffle-join cached shingles") {
        cands
          .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
          .withColumn("jaccard", graft.functions.TextFns.jaccard(col("sh_a"), col("sh_b")))
          .filter(col("jaccard") >= 0.8)
          .write.format("noop").mode("overwrite").save()
      }
      time("  verify: broadcast candidate ids") {
        broadcast(cands)
          .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
          .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
          .withColumn("jaccard", graft.functions.TextFns.jaccard(col("sh_a"), col("sh_b")))
          .filter(col("jaccard") >= 0.8)
          .write.format("noop").mode("overwrite").save()
      }
      val sh64 = signed.select(col("doc_id"),
        array_distinct(transform(col("shingles"), x => xxhash64(x))).as("hs"))
      time("  verify: hashed-shingle (long) jaccard") {
        cands
          .join(sh64.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
            .hint("shuffle_hash"), "doc_a")
          .join(sh64.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
            .hint("shuffle_hash"), "doc_b")
          .withColumn("jaccard",
            size(array_intersect(col("hs_a"), col("hs_b"))).cast("double")
              / size(array_union(col("hs_a"), col("hs_b"))).cast("double"))
          .filter(col("jaccard") >= 0.8)
          .write.format("noop").mode("overwrite").save()
      }
      val texts = big.select(col("doc_id"), col("text"))
      time("  verify: re-derive shingles from text") {
        val shA = graft.functions.TextFns.wordShingles(lower(col("text_a")), 3)
        val shB = graft.functions.TextFns.wordShingles(lower(col("text_b")), 3)
        broadcast(cands)
          .join(texts.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
          .join(texts.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
          .withColumn("jaccard", graft.functions.TextFns.jaccard(shA, shB))
          .filter(col("jaccard") >= 0.8)
          .write.format("noop").mode("overwrite").save()
      }
      // (the round-5 "sig-prefilter two-stage" variant was measured
      // here, REJECTED — 30.5 s vs 25.0 s at 256×, SURVEY §12c — and
      // then removed: its shuffle_hash build over the million-pair
      // candidate set OOM'd under 256× cache pressure in round 6,
      // crashing the profile before the candgen section ran.)
      cands.unpersist(); signed.unpersist()
    }

    // ---- candidate-generation variants (the 256× wall is HERE:
    // 45.5 s of the r5 58.4 s full-query wall was the bucket
    // aggregation; VERDICT r5 #2) --------------------------------
    {
      val signed = Dedup.minhashSignature(big, "text", "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = signed.count()
      val banded = Dedup.bandedIds(signed)
      time("candgen: collect-all (r4 form)") {
        // the old one-pass form: EVERY bucket through collect_list —
        // ObjectHashAggregate falls back to sort-based aggregation
        // past its in-memory group cap, so this is a full sort of
        // the n·bands rows plus one array per (mostly singleton)
        // bucket
        banded.groupBy("band", "bucket")
          .agg(collect_list(col("doc_id")).as("ids"))
          .filter(size(col("ids")) >= 2)
          .select(col("ids"), posexplode(col("ids")).as(Seq("i", "da")))
          .select(col("da"), explode(slice(col("ids"), col("i") + lit(2),
            greatest(size(col("ids")) - col("i") - lit(1), lit(0)))).as("db"))
          .select(least(col("da"), col("db")).as("doc_a"),
            greatest(col("da"), col("db")).as("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
          .write.format("noop").mode("overwrite").save()
      }
      time("candgen: count+semi prefilter (r6)") {
        Dedup.bucketCandidatePairs(banded, Seq("band", "bucket"),
            "doc_id", 0)
          .write.format("noop").mode("overwrite").save()
      }
      // single-key variants: band is already hashed INTO the bucket
      // value (bandedIds hashes lit(j) first), so grouping by bucket
      // alone is pair-equivalent up to 2^-64 cross-band collisions —
      // which only ADD candidates that exact-jaccard verification
      // rejects. One 8-byte key keeps the aggregation in codegen'd
      // long-key hash maps and the semi join on LongHashedRelation.
      time("candgen: collect-all, bucket key only") {
        banded.select("bucket", "doc_id").groupBy("bucket")
          .agg(collect_list(col("doc_id")).as("ids"))
          .filter(size(col("ids")) >= 2)
          .select(col("ids"), posexplode(col("ids")).as(Seq("i", "da")))
          .select(col("da"), explode(slice(col("ids"), col("i") + lit(2),
            greatest(size(col("ids")) - col("i") - lit(1), lit(0)))).as("db"))
          .select(least(col("da"), col("db")).as("doc_a"),
            greatest(col("da"), col("db")).as("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
          .write.format("noop").mode("overwrite").save()
      }
      time("candgen: count+semi, bucket key only") {
        Dedup.bucketCandidatePairs(banded.select("bucket", "doc_id"),
            Seq("bucket"), "doc_id", 0)
          .write.format("noop").mode("overwrite").save()
      }
      // candidate (b), VERDICT r6 #3: ONE shuffle — repartition by
      // bucket, sort within partitions, emit pairs per sorted run.
      // No second (semi-join) exchange, no ObjectHashAggregate
      // buffers; local sorts are per-task (n·bands/partitions rows).
      time("candgen: single-shuffle sorted runs") {
        Dedup.sortedRunCandidatePairs(banded.select("bucket", "doc_id"),
            "bucket", "doc_id", 0, nDocs * Dedup.Bands)
          .write.format("noop").mode("overwrite").save()
      }
      time("candgen: count+semi, bucket key only (2nd)") {
        Dedup.bucketCandidatePairs(banded.select("bucket", "doc_id"),
            Seq("bucket"), "doc_id", 0)
          .write.format("noop").mode("overwrite").save()
      }
      signed.unpersist()
    }

    // ---- recall side (sf0.01, vs TRUE pair set) ------------------
    if (candgenOnly) { spark.stop(); return }
    val docs = graft.Tables(spark, sfDir).documents
    val signed = Dedup.minhashSignature(docs, "text", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // true pairs: all-pairs exact jaccard >= 0.8 (spec scale only)
    val sh = signed.select(col("doc_id"), col("shingles"))
    val truePairs = sh.select(col("doc_id").as("a"), col("shingles").as("sa"))
      .crossJoin(sh.select(col("doc_id").as("b"), col("shingles").as("sb")))
      .filter(col("a") < col("b"))
      .filter(graft.functions.TextFns.jaccard(col("sa"), col("sb")) >= 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[mh] true jaccard>=0.8 pairs at sf0.01: ${truePairs.size}")

    // candidate pairs under (bands × rowsPerBand) banding of the SAME
    // 64-perm signature prefix — band j hashes rows [j*r, (j+1)*r)
    def lshPairs(bands: Int, rowsPerBand: Int): Set[(Long, Long)] = {
      val banded = signed.select(col("doc_id"),
        explode(array((0 until bands).map { j =>
          struct(lit(j).as("band"),
            xxhash64(lit(j) +: (0 until rowsPerBand).map(r =>
              element_at(col("sig"), j * rowsPerBand + r + 1)): _*).as("bucket"))
        }: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
      banded.select(col("band"), col("bucket"), col("doc_id").as("a"))
        .join(banded.select(col("band"), col("bucket"), col("doc_id").as("b")),
          Seq("band", "bucket"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    Seq((16, 4), (8, 4), (16, 2)).foreach { case (b, r) =>
      val cand = lshPairs(b, r)
      val missed = truePairs -- cand
      println(s"[mh] bands=$b rows=$r (${b * r} perms): " +
        s"candidates=${cand.size} recall=" +
        f"${(truePairs.size - missed.size).toDouble / math.max(truePairs.size, 1)}%.4f" +
        s" missed=${missed.size}")
    }
    spark.stop()
  }
}
