package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the training-data-pipeline operators on the
  * sf0.001 testdata (the DuckDB oracle gate covers exact values at
  * sf0.01; these pin the semantic invariants).
  */
class ExtOperatorsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q176 winnowing guarantee: a shared >= w+k-1 word run shares a fingerprint") {
    // the property that distinguishes winnowing from random sampling
    // (Schleimer et al. 2003, thm 1): with k=3, w=4 any common run of
    // >= 6 words must contribute at least one common selected
    // fingerprint, whatever surrounds it
    val s = spark
    import s.implicits._
    val shared = "alpha beta gamma delta epsilon zeta" // 6 = w+k-1 words
    val rnd = new scala.util.Random(11)
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast")
    def soup(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val pairs = (0 until 10).map { _ =>
      (s"${soup(8)} $shared ${soup(8)}", s"${soup(12)} $shared ${soup(5)}")
    }
    val fps = pairs.zipWithIndex
      .flatMap { case ((a, b), i) => Seq((i.toLong * 2, a), (i.toLong * 2 + 1, b)) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), queries.Dedup.winnowFps(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    (0 until 10).foreach { i =>
      val common = fps(i.toLong * 2).intersect(fps(i.toLong * 2 + 1))
      assert(common.nonEmpty, s"pair $i shares a 6-word run but no fingerprint")
    }
    // and the selection genuinely samples: far fewer fingerprints
    // than grams (~2/(w+1) of them)
    assert(fps.values.forall(f => f.nonEmpty && f.size <= 16))
  }

  test("q23 minhash-LSH emits only verified pairs with jaccard >= 0.5") {
    val rows = queries.Dedup.q23MinhashLsh(spark, dir).collect()
    assert(rows.forall(r => r.getDouble(2) >= 0.5))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("q24 simhash pairs respect the hamming <= 3 bound") {
    val rows = queries.Dedup.q24SimhashPairs(spark, dir).collect()
    assert(rows.forall(r => r.getInt(2) <= 3 && r.getInt(2) >= 0))
  }

  test("q25 prefix-filtered jaccard stays above threshold and i < j") {
    val rows = queries.Dedup.q25NgramJaccard(spark, dir).collect()
    assert(rows.forall(r => r.getDouble(3) >= 0.2))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("q27 top-k: 5 neighbors per query, ranks 1..5, cosine in [-1,1]") {
    val rows = queries.Vectors.q27EmbedTopk(spark, dir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length == 5))
    byQ.values.foreach { g =>
      assert(g.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      // rounded cosine is non-increasing with rank
      val sims = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(sims.forall(v => v >= -1.0001 && v <= 1.0001))
    }
  }

  test("q28 ANN candidates come from the query's own bucket") {
    val rows = queries.Vectors.q28AnnLsh(spark, dir).collect()
    assert(rows.forall(_.getInt(3) >= 0))
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 3))
  }

  test("q29 language-id covers every language with sane accuracy bounds") {
    val rows = queries.TextAnalysis.q29LangId(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq.sorted == Seq("de", "en", "es", "fr", "zh"))
    assert(rows.forall { r =>
      val acc = r.getDouble(3)
      acc >= 0.0 && acc <= 1.0 && r.getLong(2) <= r.getLong(1)
    })
  }

  test("q34 centroid norm is positive and n sums to the table size") {
    val rows = queries.Vectors.q34CentroidUdaf(spark, dir).collect()
    val total = Tables.embeddings(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.forall(_.getDouble(6) > 0.0))
  }

  test("q35 multimodal features equal a direct computation") {
    val rows = queries.Multimodal.q35MultimodalFeatures(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val text = docs(r.getLong(0))
      val bytes = text.getBytes("UTF-8")
      assert(r.getInt(1) == bytes.length)
      assert(r.getLong(3) == bytes.take(8).map(_.toLong & 0xffL).sum)
    }
  }

  test("q182 MMR: pick 1 is the relevance top-1, picks are distinct, and diversification bites") {
    // sf0.01: 5 queries — large enough that MMR provably disagrees
    // with plain top-3 somewhere (7 of 15 picks at this SF)
    val d01 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q182_mmr_rerank")(spark, d01).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byQ = rows.groupBy(_._1)
    byQ.values.foreach { picks =>
      assert(picks.length == 3, picks.mkString(","))
      assert(picks.map(_._3).distinct.length == 3, "picked a result twice")
      val p1 = picks.find(_._2 == 1).get
      // pick 1 is pure relevance: its mmr2x IS its rel
      assert(p1._4 == p1._5)
      // later picks never beat pick 1 on relevance (it was the max)
      picks.filter(_._2 > 1).foreach(p => assert(p._4 <= p1._4))
    }
    // the diversity term moved at least one pick off the plain top-3
    val e = Tables.embeddings(spark, d01)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("emb").as("qe"))
    val plain = broadcast(q).join(e, col("q_id") =!= col("vec_id"))
      .withColumn("rel", round(graft.functions.vec.arrayDot(
        col("qe"), col("emb")) / sqrt(graft.functions.vec.arrayDot(col("qe"), col("qe")))
        / sqrt(graft.functions.vec.arrayDot(col("emb"), col("emb"))) * 10000).cast("long"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("rel").desc, col("vec_id"))))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mmr = rows.map(r => (r._1, r._3)).toSet
    assert((mmr -- plain).nonEmpty, "MMR never diverged from plain top-3")
  }

  test("q183 Holt: forecast = level + trend within the 4-dp rounding grid") {
    val rows = SparkEntry.queries("q183_holt_trend")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lvl, trd, fc) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // the three rationals share a denominator; each rounds
      // independently, so the identity holds to 2 ulps of the grid
      assert(math.abs(fc - (lvl + trd)) < 0.00021, r.toString)
    }
    // the corpus genuinely exercises both trend signs
    assert(rows.exists(_.getDouble(3) < 0) && rows.exists(_.getDouble(3) > 0))
  }

  test("q184 MAD: the gate never flags a majority (robustness breakdown bound)") {
    val rows = SparkEntry.queries("q184_mad_anomaly")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nAnom) = (r.getLong(3), r.getLong(4))
      // by construction at least half the values sit within the MAD
      // band: dev2 <= mad_x4/2 for the median half; 3*MAD > MAD
      assert(nAnom * 2 < n, s"MAD flagged a majority: $r")
      assert(r.getLong(1) > 0 && r.getLong(2) >= 0) // med_x2, mad_x4
      assert(r.getLong(5) >= 0) // max_dev2
    }
  }

  test("q185 RRF: the fused score IS the fixed-point reciprocal identity") {
    val d01 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q185_rrf_fusion")(spark, d01).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty)
    def rec(rank: Long): Long = if (rank < 0) 0L else 1000000000L / (60L + rank)
    byQ.values.foreach { picks =>
      assert(picks.length == 5)
      assert(picks.map(_._3).distinct.length == 5, "duplicate fused doc")
      picks.foreach { case (_, _, _, rrf, lexR, vecR) =>
        // at least one channel backs every pick, and the score is
        // exactly the sum of the fixed-point reciprocals
        assert(lexR > 0 || vecR > 0)
        assert(rrf == rec(lexR) + rec(vecR), s"rrf=$rrf lex=$lexR vec=$vecR")
      }
      // fused order is non-increasing in rrf
      val sorted = picks.sortBy(_._2).map(_._4)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q188 calibration: deciles cover the corpus evenly and counts are consistent") {
    val rows = SparkEntry.queries("q188_calibration_audit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val total = Tables.documents(spark, dir).count()
    assert(rows.map(_._2).sum == total) // every doc lands in one decile
    // equi-depth within NTILE's remainder rule
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    rows.foreach { case (d, n, pred, actual, correct, lo, hi) =>
      assert(pred <= n && actual <= n && correct <= n, s"decile $d")
      // correct = agree(pred, actual): bounded below by overlap arithmetic
      assert(correct >= (pred + actual - n).max((n - pred) + (n - actual) - n),
        s"decile $d inconsistent: $n $pred $actual $correct")
      assert(lo <= hi)
    }
    // deciles are ordered by margin: bucket ranges never overlap
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._7 <= b._6, s"decile ranges overlap: $a vs $b")
      case _ => ()
    }
  }

  test("q113 testdata invariant: every events.props payload has one physical shape") {
    // q113's oracle hard-codes n_types = 1 (the engines' variant
    // type-string vocabularies aren't cross-comparable — see the
    // scaladoc in Advanced.scala). This pins the invariant the oracle
    // relies on: if the testdata ever grows heterogeneous props, THIS
    // test fails by name instead of q113's hash gate.
    val n = Tables.events(spark, dir)
      .select(expr("schema_of_variant(parse_json(props))").as("t"))
      .distinct().count()
    assert(n == 1L, s"events.props now has $n distinct variant shapes")
  }

  test("q194 CUSUM: argmax matches an in-JVM exact replay of every series") {
    val got = SparkEntry.queries("q194_cusum_changepoint")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.nonEmpty)
    // exact replay: same (ts, event_id) order, same int64 statistic
    val series = Tables.events(spark, dir)
      .select(col("event_type"), col("ts").cast("long").as("tus"),
        col("event_id"), round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    series.foreach { case (et, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3))
      val n = xs.length.toLong
      val tot = xs.map(_._4).sum
      var pfx = 0L
      var bestAbs = -1L; var bestK = 0L; var bestEid = 0L
      xs.zipWithIndex.foreach { case ((_, _, eid, c), i) =>
        pfx += c
        val d = math.abs(n * pfx - (i + 1L) * tot)
        if (d > bestAbs) { bestAbs = d; bestK = i + 1L; bestEid = eid }
      }
      val (gn, gk, geid) = got(et)
      assert(gn == n, s"$et n")
      assert(gk == bestK && geid == bestEid,
        s"$et cp: got ($gk,$geid) expected ($bestK,$bestEid)")
    }
    // the report is self-consistent: a true interior changepoint has
    // a non-null after-mean; cp_idx is in [1, n]
    SparkEntry.queries("q194_cusum_changepoint")(spark, dir).collect()
      .foreach { r =>
        val (nEv, k) = (r.getLong(1), r.getLong(2))
        assert(k >= 1L && k <= nEv)
        if (k < nEv) assert(!r.isNullAt(6), s"interior cp lacks after-mean: $r")
      }
  }

  test("q197 vocab growth: curves are monotone and decile 10 closes the corpus") {
    val rows = SparkEntry.queries("q197_vocab_growth")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_._1)
    // ground truth from an independent aggregate
    val truth = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("toks"), countDistinct(col("w")).as("types"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    bySrc.foreach { case (src, g) =>
      val s10 = g.sortBy(_._2)
      // deciles present and strictly ordered in n_docs (non-strict on
      // tiny sources where floor deciles collide)
      assert(s10.map(_._2).toSeq == (1L to 10L))
      s10.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 <= b._3 && a._4 <= b._4 && a._5 <= b._5,
          s"$src curve not monotone: $a -> $b")
      }
      // the last decile IS the full corpus of the source
      val (toks, types) = truth(src)
      assert(s10.last._4 == toks, s"$src cum_tokens end != corpus tokens")
      assert(s10.last._5 == types, s"$src cum_vocab end != corpus types")
      // vocabulary never exceeds tokens
      s10.foreach(r => assert(r._5 <= r._4))
    }
  }

  test("q198 PCA: the integer kernel nails a planted dominant direction") {
    // the testdata embeddings are near-isotropic (λ₂/λ₁ ≈ 0.99) — no
    // fixed-round power iteration isolates a direction there, so the
    // ALGORITHM is pinned on a corpus with a PLANTED component, the
    // house MiningSpec discipline; the oracle gate pins
    // engine-equality on the real testdata separately.
    val dd = 64
    val rnd = new scala.util.Random(23)
    val u = Array.tabulate(dd)(j => math.sin(j * 1.7 + 0.3))
    val un = math.sqrt(u.map(x => x * x).sum)
    val qs = Array.fill(400) {
      val a = (rnd.nextDouble() * 2 - 1) * 0.9 // strong planted axis
      Array.tabulate(dd) { j =>
        val x = a * u(j) / un + (rnd.nextDouble() * 2 - 1) * 0.05
        math.round(math.max(-1.0, math.min(1.0, x)) * 127)
      }
    }
    val r = new Array[Long](dd * dd)
    val sS = new Array[Long](dd)
    qs.foreach { q =>
      for (j <- 0 until dd) {
        sS(j) += q(j)
        for (k <- 0 until dd) r(j * dd + k) += q(j) * q(k)
      }
    }
    val (v, lam, tr) = queries.Vectors.pcaPowerKernel(r, sS, qs.length.toLong)
    assert(v.map(math.abs).max == 1000L, "renorm invariant broken")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val c = cos(v.map(_.toDouble), u)
    assert(math.abs(c) > 0.995, s"missed the planted direction: cos=$c")
    // the planted axis carries nearly all variance
    assert(lam > 0L && tr > 0L && lam * 10 > tr * 7,
      s"explained share too low: lam=$lam tr=$tr")
    // and on the real (isotropic) testdata the report stays sane:
    // renormalized loads, spectral bounds, correct n
    val out = SparkEntry.queries("q198_pca_power")(spark, dir).collect()
      .map(rr => (rr.getString(0), rr.getLong(1), rr.getLong(2), rr.getLong(3)))
    val loads = out.filter(_._1 == "load")
    assert(loads.length == 64)
    assert(loads.map(x => math.abs(x._3)).max == 1000L)
    val Some((_, _, lam2, tr2)) = out.find(_._1 == "eig")
    assert(lam2 >= 0L && lam2 <= tr2, "Rayleigh outside the spectrum bound")
    val Some((_, _, n2, d2)) = out.find(_._1 == "n")
    assert(d2 == 64L && n2 == Tables.embeddings(spark, dir).count())
  }

  test("q203 PQ-ADC recall histogram matches an exact in-JVM replay") {
    val got = SparkEntry.queries("q203_pq_adc")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replay the whole pipeline: grid, subspaces, md5 codebook,
    // argmin encode, ADC top-10 vs exact top-10
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding").cast("array<double>"),
        x => round(x * 127).cast("long")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def md5h28(s0: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString.take(7), 16)
    }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = vecs.keys.toSeq.sorted
    val book: Map[Int, Seq[(Long, Array[Long])]] = (0 until 8).map { m =>
      val ranked = ids.map(id => (md5h28(s"$m:$id"), id)).sorted.take(16)
      m -> ranked.zipWithIndex.map { case ((_, id), i) =>
        (i + 1L, vecs(id).slice(m * 8, m * 8 + 8)) }
    }.toMap
    val codes = ids.map { id =>
      id -> (0 until 8).map { m =>
        book(m).minBy { case (cr, cv) => (d2(vecs(id).slice(m * 8, m * 8 + 8), cv), cr) }._1
      }.toArray
    }.toMap
    val qids = ids.filter(_ % 100 == 0)
    val hist = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    qids.foreach { q =>
      val qsub = (0 until 8).map(m => vecs(q).slice(m * 8, m * 8 + 8))
      val qd = (0 until 8).map(m =>
        book(m).map { case (cr, cv) => cr -> d2(qsub(m), cv) }.toMap)
      def adc(v: Long): Long =
        (0 until 8).map(m => qd(m)(codes(v)(m))).sum
      val others = ids.filter(_ != q)
      val approx = others.sortBy(v => (adc(v), v)).take(10).toSet
      val exact = others.sortBy(v => (d2(vecs(q), vecs(v)), v)).take(10).toSet
      hist(exact.intersect(approx).size.toLong) += 1L
    }
    assert(got == hist.toMap, s"got=$got expected=${hist.toMap}")
    assert(got.values.sum == qids.length.toLong)
  }

  test("q204 two-stage IVF-PQ: histogram well-formed, deterministic, query-complete") {
    val nQ = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 100 === 0).count()
    val a = SparkEntry.queries("q204_ivf_pq")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(a.map(_._2).sum == nQ, "every query must land in one bucket")
    a.foreach { case (h, n) => assert(h >= 0L && h <= 10L && n > 0L) }
    // the pipeline is a pure function of the corpus: a second run is
    // bit-identical (hash codebooks, deterministic tie-breaks)
    val b = SparkEntry.queries("q204_ivf_pq")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(a.toSeq == b.toSeq)
    // and the q203 full-ADC audit shares the same query population
    val full = SparkEntry.queries("q203_pq_adc")(spark, dir).collect()
      .map(r => r.getLong(1)).sum
    assert(full == nQ)
  }

  test("q207 burstiness matches an exact replay over the zero-filled spine") {
    val got = SparkEntry.queries("q207_burstiness")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got.nonEmpty)
    // one global spine: every type sees the same hour count
    assert(got.map(_._2).distinct.length == 1)
    // replay: hourly counts from the raw events, zero-filled
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("HOUR", col("ts")).as("h"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime))
    val hours = {
      val lo = ev.map(_._2).min; val hi = ev.map(_._2).max
      (lo to hi by 3600000L)
    }
    got.foreach { case (et, nH, nE, mean, fano) =>
      val byH = ev.filter(_._1 == et).groupBy(_._2)
        .map { case (h, xs) => h -> xs.length.toLong }
      val cs = hours.map(h => byH.getOrElse(h, 0L))
      assert(nH == cs.length.toLong && nE == cs.sum, s"$et spine")
      val n = cs.length.toLong; val s1 = cs.sum; val s2 = cs.map(c => c * c).sum
      def r4(num: Long, den: Long) = ((20000L * num + den) / (2L * den)) / 10000.0
      assert(mean == r4(s1, n), s"$et mean")
      assert(fano == r4(n * s2 - s1 * s1, n * s1), s"$et fano")
    }
  }

  test("q205 prefix join is LOSSLESS: equals brute-force all-pairs at tau=0.5") {
    val got = SparkEntry.queries("q205_prefix_join")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // brute force over the SAME shingle sets (collected, all pairs)
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"), queries.Hashing.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .sortBy(_._1)
    val exp = (for {
      ai <- sets.indices; bi <- (ai + 1) until sets.length
      (i, sa) = sets(ai); (j, sb) = sets(bi)
      c = sa.intersect(sb).size.toLong
      uni = sa.size + sb.size - c
      if 10000L * c >= 5000L * uni
    } yield (i, j, c, uni, 10000L * c / uni)).toSet
    assert(got == exp,
      s"missed=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
    assert(exp.nonEmpty || got.isEmpty)
  }

  test("q205 length+positional filters prune candidates below prefix-only") {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), queries.Hashing.shingles(col("text"), 3).as("sh"))
      .withColumn("sz", size(col("sh")).cast("long"))
      .persist()
    // the round-7 candidate generator (prefix filter ALONE), inline:
    // the baseline the full-PPJoin filters must beat
    val ex = d.select(col("doc_id"), col("sz"), explode(col("sh")).as("g"))
    val dfq = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val pfx = ex.join(dfq, "g")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))).cast("long"))
      .withColumn("p", col("sz") - expr("(sz * 5000 + 9999) div 10000") + 1L)
      .filter(col("rk") <= col("p"))
      .select(col("doc_id"), col("g"), col("rk"), col("sz"))
    val prefixOnly = pfx.alias("a").join(pfx.alias("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    var candCount = -1L
    val pairs = queries.Dedup.ssjPairs(d, 5000L,
      c => { candCount = c.count(); c }).count()
    d.unpersist()
    assert(candCount >= 0L)
    assert(candCount < prefixOnly,
      s"filters pruned nothing: $candCount vs prefix-only $prefixOnly")
    // candidates still superset the verified pairs (losslessness is
    // pinned exactly by the brute-force test above)
    assert(candCount >= pairs, s"$candCount candidates < $pairs pairs")
  }

  test("q206 LSH recall: buckets stable, counts consistent, capture bounded") {
    val rows = SparkEntry.queries("q206_lsh_recall")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (5L to 10L))
    rows.foreach { case (_, t, c) => assert(c >= 0L && c <= t) }
    // every caught pair really is a banded candidate and a true pair
    val total = rows.map(_._2).sum
    val truth = SparkEntry.queries("q205_prefix_join")(spark, dir).count()
    assert(total == truth, s"bucketed $total of $truth true pairs")
  }

  test("q200 quantile sketch: estimates are ordered, audited, and sample-consistent") {
    val rows = SparkEntry.queries("q200_quantile_sketch")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty && rows.length % 3 == 0)
    rows.groupBy(_._1).foreach { case (et, g) =>
      val s3 = g.sortBy(_._4)
      assert(s3.map(_._4).toSeq == Seq(50L, 90L, 99L))
      // quantiles are monotone in p, for the sketch AND the truth
      assert(s3(0)._5 <= s3(1)._5 && s3(1)._5 <= s3(2)._5, s"$et est order")
      assert(s3(0)._6 <= s3(1)._6 && s3(1)._6 <= s3(2)._6, s"$et exact order")
      // the audit column IS |est - exact|
      s3.foreach(r => assert(r._7 == math.abs(r._5 - r._6)))
      // the deterministic sample is a genuine ~10% cut (binomial
      // 5-sigma envelope), never empty at testdata scale
      val (n, ns) = (g.head._2, g.head._3)
      assert(ns > 0 && math.abs(ns - n / 10.0) < 5 * math.sqrt(n * 0.1 * 0.9),
        s"$et sample rate off: $ns of $n")
      // and the p50 estimate lands within a generous displacement
      // band of the truth (value range is ~0..50000 cents)
      assert(s3(0)._7 < 5000, s"$et p50 err ${s3(0)._7}")
    }
  }
}
