package graft

import graft.operators.Similarity
import graft.sources.IvfIndex
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  test("persisted index probes reproduce ivfTopK exactly") {
    val emb = Tables(spark, sf).embeddings
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(emb, dir, nCells = 8)
    // same corpus, same seeded fit, same scan parameters → the
    // index-then-probe path must return ivfTopK's rows bit-for-bit
    val probes = emb.filter(col("vec_id") % 50 === 0)
    val indexed = IvfIndex.topK(spark, dir, probes, k = 5, nProbe = 4)
      .collect().map(_.toString).sorted
    val direct = Similarity.ivfTopK(emb, col("vec_id") % 50 === 0, k = 5,
        nCells = 8, nProbe = 4)
      .collect().map(_.toString).sorted
    assert(indexed.sameElements(direct))
  }

  test("probe scan PRUNES to the probed cell partitions") {
    val emb = Tables(spark, sf).embeddings
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(emb, dir, nCells = 8)
    // a single probe touches nProbe = 2 of the 8 cell directories;
    // the codes scan must carry a PartitionFilters entry on cell —
    // file-level pruning, not a full scan + filter
    val oneProbe = emb.filter(col("vec_id") === emb
      .agg(min("vec_id")).head().getLong(0))
    val (out, pc) = IvfIndex.topKPlan(spark, dir, oneProbe, k = 3, nProbe = 2)
    out.collect()
    pc.unpersist()
    val scans = out.queryExecution.executedPlan.toString
    assert(scans.contains("PartitionFilters: [cell"), scans)
    // and the index layout really is one directory per cell
    val cellDirs = new java.io.File(s"$dir/codes.parquet").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.length == 8, cellDirs.mkString(","))
  }

  test("rebuilding the index is idempotent; probes see the new build") {
    val emb = Tables(spark, sf).embeddings
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(emb, dir, nCells = 4)
    val first = IvfIndex.topK(spark, dir, emb.limit(3), k = 2, nProbe = 2)
      .collect().map(_.toString).sorted
    IvfIndex.build(emb, dir, nCells = 4) // overwrite in place
    val second = IvfIndex.topK(spark, dir, emb.limit(3), k = 2, nProbe = 2)
      .collect().map(_.toString).sorted
    assert(first.sameElements(second))
  }
}
