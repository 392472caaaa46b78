package graft

import org.apache.spark.sql.functions._

/** q223 strict-greedy sequence packing, pinned against a driver-side
  * brute-force replay at sf0.001 (the oracle gate replays the same
  * recurrence in DuckDB at sf0.01 via a recursive CTE; this spec
  * replays it in plain Scala so a failure localizes to the Spark
  * side). Distinct from q62/q159, which gate the concat-then-chunk
  * packer (overflow-allowed, prefix-sum windows): q223 gates
  * ops.packSequences' NEVER-overflow greedy first-fit — the
  * library's one documented mapPartitions last-resort.
  */
class SequencePackSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q223: census equals a driver-side greedy replay; every pack within budget") {
    val out = graft.queries.Curation.q223SequencePack(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap

    // brute force: same shard hash, same doc order, same greedy reset
    val budget = 256L
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def h4(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16)
    }
    val byShard = docs.groupBy { case (id, _) => h4(id.toString) % 8 }
    val expected = byShard.map { case (shard, ds) =>
      var acc = 0L
      val packToks = scala.collection.mutable.ArrayBuffer.empty[Long]
      ds.sortBy(_._1).foreach { case (_, nRaw) =>
        val n = math.min(nRaw, budget)
        if (packToks.isEmpty || acc + n > budget) { packToks += 0L; acc = 0L }
        acc += n
        packToks(packToks.size - 1) += n
      }
      val nPacks = packToks.size.toLong
      val total = packToks.sum
      val fill = ((20000L * total + nPacks * budget) /
        (2L * nPacks * budget)).toDouble / 10000.0
      (shard, (ds.length.toLong, nPacks, total, packToks.max, fill))
    }
    assert(out == expected, s"spark=$out expected=$expected")
    // strictness: no pack's capped total exceeds the budget
    assert(expected.values.forall(_._4 <= budget))
    // non-vacuity: some shard needed more than one pack
    assert(expected.values.exists(_._2 > 1L))
  }
}
