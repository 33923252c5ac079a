package graft

import graft.operators.{Dedup, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Invariant tests (SURVEY.md §5.3): properties over generated inputs
  * (scalacheck Gen with fixed seeds — the scalatest/scalacheck bridge
  * artifact is not in the offline dependency set), plus invariants over the
  * fixture data that must hold at any SF. */
class PropertySpec extends SparkSuite {

  /** Deterministic samples from a Gen (fixed seed, offline-friendly). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("tumbling window counts sum to the table count (partition property)") {
    val total = Tables.events(spark, sf0001).count()
    val sum = SparkEntry.queries("q_ts_tumbling")(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("cnt")).head().getLong(0)
    assert(sum == total)
  }

  test("sessionization partitions events: session sizes sum to event count") {
    val total = Tables.events(spark, sf0001).count()
    val sum = SparkEntry.queries("q_ts_session")(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    assert(sum == total)
  }

  test("top-k ⊆ full sort prefix") {
    val topk = SparkEntry.queries("q_sort_topk")(spark, sf0001).collect().toSeq
    val full = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100).collect().toSeq
    assert(topk == full)
  }

  test("set ops: |union| = |intersect| + |except_cust| + |except_supp| (inclusion-exclusion)") {
    val u = SparkEntry.queries("q_set_union")(spark, sf0001).count()
    val i = SparkEntry.queries("q_set_intersect")(spark, sf0001).count()
    val e1 = SparkEntry.queries("q_set_except")(spark, sf0001).count()
    val c = Tables.customer(spark, sf0001).select("c_nationkey").distinct().count()
    val s = Tables.supplier(spark, sf0001).select("s_nationkey").distinct().count()
    assert(u == c + s - i)
    assert(e1 == c - i)
  }

  test("minhash agreement estimates jaccard within sampling error (generated docs)") {
    import spark.implicits._
    val wordPool = (1 to 60).map(i => s"tok$i")
    val gen = for {
      keep <- Gen.chooseNum(20, 50)
      mut <- Gen.chooseNum(0, 12)
    } yield (keep, mut)
    samples(gen, 5).foreach { case (keep, mut) =>
      val a = wordPool.take(keep)
      val b = wordPool.take(keep).drop(mut) ++ wordPool.takeRight(mut)
      val df = Seq((1L, a.mkString(" ")), (2L, b.mkString(" "))).toDF("doc_id", "text")
      val sh = Dedup.withShingles(df, "text")
      val sig = Dedup.minHash(sh, numHashes = 64)
        .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
      val grams = sh.select("doc_id", "shingles").as[(Long, Seq[String])].collect().toMap
      val (ga, gb) = (grams(1L).toSet, grams(2L).toSet)
      val trueJac = ga.intersect(gb).size.toDouble / ga.union(gb).size
      val est = sig(1L).zip(sig(2L)).count { case (x, y) => x == y } / 64.0
      assert(math.abs(est - trueJac) < 0.3, s"est=$est true=$trueJac")
    }
  }

  test("gapfill row count = (end-start)/step + 1 and preserves total sum") {
    val gf = SparkEntry.queries("q_ts_gapfill")(spark, sf0001)
    assert(gf.count() == 720)
    val filled = gf.agg(org.apache.spark.sql.functions.sum("sv")).head().getDouble(0)
    val direct = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts"))).agg(expr("round(sum(value), 2)").as("sv"))
      .agg(org.apache.spark.sql.functions.sum("sv")).head().getDouble(0)
    assert(math.abs(filled - direct) < 1e-6)
  }

  test("multimodal decode: mapPartitions path agrees with the columnar features query") {
    import spark.implicits._
    val viaKernel = Multimodal.decodeFeatures(
      Multimodal.documentsAsMedia(spark, sf0001), Multimodal.StubDecoder, 4)
      .select(col("id").as("doc_id"), col("byteLen").as("byte_len"), col("sha"))
    val viaQuery = SparkEntry.queries("q_multimodal_features")(spark, sf0001)
      .select("doc_id", "byte_len", "sha").limit(500)
    assert(viaKernel.except(viaQuery).count() == 0)
  }

  test("multimodal real decode: javax.imageio measures the generated dimensions for PNG and BMP") {
    // the codec really parses the bytes: direct ImageIO round-trip
    for (id <- Seq(0L, 7L, 31L); fmt <- Seq("png", "bmp")) {
      val bytes = Multimodal.encodeImage(id, fmt)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"JDK codec failed to decode $fmt bytes")
      val (w, h) = Multimodal.imageDims(id)
      assert(img.getWidth == w && img.getHeight == h,
        s"$fmt id=$id decoded ${img.getWidth}x${img.getHeight}, generated ${w}x$h")
    }
    // the distributed path reports measured (not stub) dimensions for all rows
    val feats = Multimodal.decodeFeatures(
      Multimodal.syntheticImages(spark, sf0001), Multimodal.ImageIoDecoder, 8)
      .collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      val (w, h) = Multimodal.imageDims(f.id)
      assert(f.width == w && f.height == h && f.frames == 1,
        s"id=${f.id} (${f.kind}): measured ${f.width}x${f.height}, want ${w}x$h")
    }
    // corrupt bytes fall back to the stub instead of failing the partition
    val junk = Multimodal.ImageIoDecoder.decode(
      Multimodal.MediaRow(1L, "mp4", Array.fill[Byte](64)(42)))
    assert(junk.byteLen == 64 && junk.frames == (64 % 16 + 1))
  }

  test("star-contraction CC: equals label propagation on random graphs, survives high-diameter paths") {
    import spark.implicits._
    // a 120-node path: diameter 119 ≫ label propagation's default 20 rounds
    val path = (0L until 119L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] { Dedup.connectedComponents(path).collect() }
    val lbls = Dedup.connectedComponentsStar(path).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(lbls.length == 120 && lbls.forall(_._2 == 0L),
      "path graph must collapse to one component rooted at 0")
    // random graphs (fixed seed): star ≡ propagation on the same edges
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).toDF("id_a", "id_b")
      val a = Dedup.connectedComponentsStar(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = Dedup.connectedComponents(edges, maxIters = 200).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a == b, s"trial $trial: star labels differ from propagation")
    }
  }

  test("multimodal real audio decode: the JDK RIFF parser measures the generated envelope") {
    // direct round-trip: real WAV container in, measured format out
    for (id <- Seq(0L, 7L, 799L, 800L)) {
      val bytes = Multimodal.encodeWav(id)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(ais.getFormat.getSampleRate == 8000f && ais.getFormat.getChannels == 1)
      assert(ais.getFrameLength == Multimodal.wavFrames(id),
        s"id=$id: ${ais.getFrameLength} frames, generated ${Multimodal.wavFrames(id)}")
    }
    // distributed path: every clip's measured envelope matches the generator
    val feats = Multimodal.decodeAudioFeatures(
      Multimodal.syntheticWavs(spark, sf0001), 8).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.sample_rate == 8000 && f.channels == 1 && f.bits == 16 &&
        f.frames == Multimodal.wavFrames(f.id), s"id=${f.id}: $f")
    }
  }

  test("token counts: bpe estimate bounded by [ws_tokens, n_chars]") {
    val out = TextAnalysis.tokenCounts(Tables.documents(spark, sf0001), "text")
    assert(out.filter(col("bpe_tokens") < col("ws_tokens")).count() == 0)
    assert(out.filter(col("bpe_tokens") > col("n_chars")).count() == 0)
  }
}
