package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format breadth beyond parquet: JSON-lines, CSV (with
  * header and explicit schema — never inference in production paths),
  * and ORC all round-trip the documents sample losslessly, and the
  * JSON/CSV readers drop malformed records under PERMISSIVE/DROPMALFORMED
  * the way the wire codecs drop bad payloads.
  */
class FormatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .select("doc_id", "lang", "source", "n_chars") // keep text out: CSV newlines
    .orderBy("doc_id")

  test("json-lines round trip is lossless") {
    val out = Files.createTempDirectory("fmt_json").toString + "/d"
    docs.write.json(out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType)))
    val back = spark.read.schema(schema).json(out)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.select("doc_id", "lang", "source", "n_chars").collect().toSeq)
  }

  test("csv round trip with explicit schema is lossless") {
    val out = Files.createTempDirectory("fmt_csv").toString + "/d"
    docs.write.option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType)))
    val back = spark.read.option("header", "true").schema(schema).csv(out)
    assert(back.orderBy("doc_id").collect().toSeq == docs.collect().toSeq)
  }

  test("orc round trip is lossless") {
    val out = Files.createTempDirectory("fmt_orc").toString + "/d"
    docs.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.orderBy("doc_id").collect().toSeq == docs.collect().toSeq)
  }

  test("parquet schema evolution: mergeSchema unions old and new shards") {
    val s = spark
    import s.implicits._
    val out = Files.createTempDirectory("fmt_evo").toString + "/d"
    // v1 shard: (doc_id, lang); v2 shard adds a quality column
    Seq((1L, "en"), (2L, "fr")).toDF("doc_id", "lang")
      .write.parquet(s"$out/day=1")
    Seq((3L, "de", 0.9), (4L, "en", 0.4)).toDF("doc_id", "lang", "quality")
      .write.parquet(s"$out/day=2")
    val back = spark.read.option("mergeSchema", "true").parquet(out)
    assert(back.columns.toSet == Set("doc_id", "lang", "quality", "day"))
    // old rows surface NULL for the evolved column; new rows keep it
    val rows = back.orderBy("doc_id").collect()
    assert(rows.length == 4)
    assert(rows(0).isNullAt(rows(0).fieldIndex("quality")))
    assert(rows(2).getDouble(rows(2).fieldIndex("quality")) == 0.9)
    // and the partition column still prunes
    assert(spark.read.option("mergeSchema", "true").parquet(out)
      .filter($"day" === 2).count() == 2)
  }

  test("malformed json records are dropped under DROPMALFORMED") {
    val out = Files.createTempDirectory("fmt_bad").toString
    Files.writeString(java.nio.file.Paths.get(s"$out/part.json"),
      """{"doc_id": 1, "lang": "en"}
        |not json at all
        |{"doc_id": 2, "lang": "fr"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType)))
    val back = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED").json(out)
    assert(back.count() == 2)
  }
}
