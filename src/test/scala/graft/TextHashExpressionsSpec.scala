package graft

import org.apache.spark.sql.functions._

import graft.functions.texthash
import graft.queries.Hashing._

/** The native SimHash60 / MinHashSig expressions vs their declarative
  * twins (the explode + partial-aggregate forms q23/q24 originally
  * ran) — the two must be bit-identical, since the DuckDB oracles
  * gate on the declarative definition.
  */
class TextHashExpressionsSpec extends SparkSpec {

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "a a a a a"), // heavy duplication
      (4L, "one two"), // fewer words than the shingle width
      (5L, "single"),
      (6L, ""), // empty text -> one empty token
      (7L, "the quick brown fox jumps over the lazy dog") // exact dup of 1
    ).toDF("doc_id", "text")
  }

  test("simhash60 matches the explode + bit-sum declarative form") {
    val native = docs.select(col("doc_id"),
        texthash.simhash60(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wh = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .select(col("doc_id"), hash60(col("w")).as("h"))
    val bitSums = (0 until 60).map { b =>
      sum(when(shiftright(col("h"), b) % 2 === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val declarative = wh.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == declarative)
    assert(native(1L) == native(7L)) // exact dups share a signature
    assert(native(1L) != native(3L))
  }

  test("minhash_sig matches the explode + minhashPerm declarative form") {
    val native = docs.select(col("doc_id"),
        texthash.minhashSig(col("text")).as("ms"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val ex = docs.select(col("doc_id"),
        explode(shingles(col("text"), 3)).as("s"))
      .select(col("doc_id"), hash28(col("s")).as("h"))
    val minAggs = (0 until 12).map(i => minhashPerm(col("h"), i).as(s"m$i"))
    val declarative = ex.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 12).map(r.getLong).toSeq).toMap
    assert(native.view.mapValues(_.toSeq).toMap == declarative)
    // near-dups (1 word differs) agree on most minhash positions
    val agree = native(1L).zip(native(2L)).count { case (a, b) => a == b }
    assert(agree >= 6, s"only $agree/12 positions agree")
  }

  test("kernels match declarative forms on adversarial random strings") {
    // testdata text is clean single-spaced; library inputs are not —
    // cover consecutive/leading/trailing spaces (empty tokens) and
    // short strings, where a tokenizer-mismatch between the JVM kernel
    // and Spark's split(text, " ") would hide
    val rnd = new scala.util.Random(42)
    val alphabet = "ab c"
    val texts = (0 until 60).map { i =>
      val len = rnd.nextInt(12)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val s = spark; import s.implicits._
    val df = texts.toDF("doc_id", "text")
    val native = df.select(col("doc_id"),
        texthash.simhash60(col("text")).as("sig"),
        texthash.minhashSig(col("text")).as("ms"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    val wh = df.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .select(col("doc_id"), hash60(col("w")).as("h"))
    val bitSums = (0 until 60).map { b =>
      sum(when(shiftright(col("h"), b) % 2 === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val declSim = wh.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ex = df.select(col("doc_id"), explode(shingles(col("text"), 3)).as("sh"))
      .select(col("doc_id"), hash28(col("sh")).as("h"))
    val minAggs = (0 until 12).map(i => minhashPerm(col("h"), i).as(s"m$i"))
    val declMin = ex.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 12).map(r.getLong).toSeq).toMap
    texts.foreach { case (id, t) =>
      assert(native(id)._1 == declSim(id), s"simhash mismatch on <$t>")
      assert(native(id)._2.toSeq == declMin(id), s"minhash mismatch on <$t>")
    }
  }

  test("word_shingles matches the declarative split/slice/array_distinct form") {
    // Hashing.shingles now ROUTES through the native kernel, so this
    // is the one place the original declarative HOF chain is still
    // spelled out — order (first occurrence) and the truncated-short-
    // doc rule must stay bit-identical, or every shingle-based oracle
    // silently shifts definition.
    import org.apache.spark.sql.Column
    def declarative(text: Column, n: Int): Column = {
      val ws = split(text, " ")
      array_distinct(transform(
        sequence(lit(0), greatest(size(ws) - lit(n), lit(0))),
        i => concat_ws(" ", slice(ws, i + lit(1), lit(n)))))
    }
    val rnd = new scala.util.Random(7)
    val alphabet = "ab c"
    val s = spark; import s.implicits._
    val extra = (100 until 160).map { i =>
      val len = rnd.nextInt(15)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = docs.select(col("doc_id"), col("text"))
      .union(extra.toDF("doc_id", "text"))
    for (n <- Seq(1, 2, 3, 5)) {
      df.select(col("text"),
          texthash.wordShingles(col("text"), n).as("nat"),
          declarative(col("text"), n).as("decl"))
        .collect().foreach { r =>
          assert(r.getSeq[String](1) == r.getSeq[String](2),
            s"n=$n text=<${r.getString(0)}>")
        }
    }
  }

  test("null text yields null signatures") {
    val d = docs.select(col("doc_id"),
      when(col("doc_id") === 1, null).otherwise(col("text")).as("text"))
    val out = d.select(texthash.simhash60(col("text")).as("s"),
        texthash.minhashSig(col("text")).as("m"))
      .collect()
    assert(out.count(r => r.isNullAt(0) && r.isNullAt(1)) == 1)
  }

  test("SQL function surface: simhash60 / minhash_sig registered") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    docs.createOrReplaceTempView("th_docs")
    val r = spark.sql(
      """SELECT doc_id, simhash60(text) AS sig, minhash_sig(text) AS ms
        |FROM th_docs WHERE doc_id = 1""".stripMargin).collect().head
    val direct = docs.filter(col("doc_id") === 1)
      .select(texthash.simhash60(col("text")),
        texthash.minhashSig(col("text"))).collect().head
    assert(r.getLong(1) == direct.getLong(0))
    assert(r.getSeq[Long](2) == direct.getSeq[Long](1))
  }
}
