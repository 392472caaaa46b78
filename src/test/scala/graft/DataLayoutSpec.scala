package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Output layout — the write-side half of the 100-TB story: a corpus
  * written partitioned by a low-cardinality key is PRUNED at read
  * time (a lang-filtered scan touches one directory, not the corpus),
  * and sorting within files gives parquet min/max stats row-group
  * skipping for the secondary key.
  */
class DataLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partitionBy write + partition-pruned read") {
    val out = Files.createTempDirectory("layout").toString + "/docs"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.write.partitionBy("lang").parquet(out)

    val read = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = read.queryExecution.executedPlan.toString

    // the filter must prune partitions at planning time, not scan+filter
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(lang"), plan)
    // and the pruned scan reads only the one lang directory
    val scanned = read.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("lang=en")), scanned.toSeq)
    // correctness: pruned read equals the filtered original
    assert(read.count() == docs.filter(col("lang") === "en").count())
  }

  test("sortWithinPartitions gives monotone doc_id runs per file") {
    val out = Files.createTempDirectory("layout_sorted").toString + "/docs"
    spark.read.parquet(s"$dir/documents.parquet")
      .repartition(2, col("lang"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write.parquet(out)
    // files carry sorted runs -> parquet min/max chunk stats are tight;
    // verify the sort survived the write (read back per file, check
    // monotone within each (file, lang) run)
    val rows = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("lang"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val violations = rows.groupBy(r => (r._1, r._2)).count { case (_, rs) =>
      val ids = rs.map(_._3).toSeq
      ids != ids.sorted
    }
    assert(violations == 0)
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at runtime") {
    // the 100-TB star-join feature: the fact side is partitioned by the
    // join key; a filter on the DIMENSION cannot prune it statically,
    // so the optimizer injects a runtime subquery that collects the
    // surviving keys and prunes fact partitions before the scan
    val out = Files.createTempDirectory("dpp").toString + "/fact"
    spark.read.parquet(s"$dir/documents.parquet")
      .write.partitionBy("lang").parquet(out)
    val fact = spark.read.parquet(out)
    val s = spark
    import s.implicits._
    val dimPath = Files.createTempDirectory("dpp").toString + "/dim"
    Seq(("en", 1L), ("de", 2L), ("fr", 3L), ("es", 4L), ("zh", 5L))
      .toDF("lang", "lang_id").write.parquet(dimPath)
    // dim must be a real scan: a local relation would constant-fold
    // the filter away before the PartitionPruning rule looks for it
    val dim = spark.read.parquet(dimPath)

    val keys = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "false"))
    try {
      val q = fact.join(dim, "lang").filter(col("lang_id") <= 2)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), plan)
      // correctness: only en+de rows survive
      val langs = q.select(col("lang")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(langs === Set("en", "de"))
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
