package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, MediaFixture, Multimodal, Similarity, TextOps}

/** Semantic assertions for the LLM-data-pipeline operators on PLANTED
  * inputs — duplicates, near-duplicates, language samples, and
  * near-copy vectors with known expected outcomes, independent of the
  * harness tables and the DuckDB oracle.
  */
class LlmOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))

  private val base =
    "the quick brown fox jumps over the lazy dog while seventeen " +
      "green turtles carry heavy stones across a narrow wooden bridge " +
      "under bright winter stars near the old mill"

  test("dedupExact keeps min doc_id per duplicate group") {
    val d = docs(1L -> "aaa", 2L -> "bbb", 3L -> "aaa", 4L -> "aaa")
    val res = TextOps.dedupExact(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res == Map(1L -> 3L, 2L -> 1L))
  }

  test("dedupNear finds planted near-duplicates and nothing else") {
    val nearDup = base.replace("winter", "summer")
    val unrelated = "completely different words about spark catalyst " +
      "optimizer plans shuffles partitions joins aggregates windows " +
      "and the many ways an engine keeps its data moving smoothly along"
    val res = Dedup.dedupNear(docs(1L -> base, 2L -> nearDup, 3L -> unrelated))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(res.toSeq == Seq((1L, 2L)))
  }

  test("dedupNgram finds the planted pair with high char-gram jaccard") {
    val res = Dedup.dedupNgram(
      docs(1L -> base, 2L -> (base + " extra"), 3L -> "zzz yyy xxx www vvv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(res.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L)))
    assert(res.head._3 > 0.9)
  }

  test("decontaminate flags exactly the train docs sharing an 8-gram with the eval slice") {
    // doc 20 is the eval slice (20 % 20 == 0); doc 1 embeds a full
    // 8-token window of it, doc 2 shares only a 7-token prefix (one
    // token short of a shingle), doc 3 is disjoint
    val evalText = "zero one two three four five six seven eight nine"
    val leaked = "intro words then zero one two three four five six seven closing"
    val sevenOnly = "zero one two three four five six STOP different tail words here"
    val clean = "entirely unrelated vocabulary occupying its own distinct space today"
    val res = Dedup.decontaminate(
        docs(20L -> evalText, 1L -> leaked, 2L -> sevenOnly, 3L -> clean))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res == Map(1L -> 1L), s"got $res")
  }

  test("textRepetition scores a degenerate doc and keeps a diverse one") {
    val repetitive = Seq.fill(20)("spam").mkString(" ") // one token, 20×
    val diverse = "every word in this sentence appears exactly once today"
    val res = TextOps.textRepetition(docs(1L -> repetitive, 2L -> diverse))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    // 20× "spam": 1 distinct of 20 tokens, top token 100%, 1 distinct
    // of 19 2-grams (1 - 1/19 = 0.9474)
    assert(res(1L) == ((0.95, 1.0, 0.9474, false)))
    // all-distinct 9-token doc: zero duplication, top token 1/9
    assert(res(2L) == ((0.0, 0.1111, 0.0, true)))
  }

  test("dedupSimhash: near-identical docs collide, unrelated don't") {
    val nearDup = base.replace("stars", "moons")
    val unrelated = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
    val res = Dedup.dedupSimhash(docs(1L -> base, 2L -> nearDup, 3L -> unrelated))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(res.contains((1L, 2L)))
    assert(!res.contains((1L, 3L)) && !res.contains((2L, 3L)))
  }

  test("fingerprint is stable for identical token streams, differs otherwise") {
    val reformatted = "  " + base.replace(" ", "   ") + "  " // same tokens
    val fps = TextOps.fingerprint(
      docs(1L -> base, 2L -> reformatted, 3L -> (base + " tail")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    // determinism: re-evaluating the plan yields identical fingerprints
    val again = TextOps.fingerprint(
      docs(1L -> base, 2L -> reformatted, 3L -> (base + " tail")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == fps)
  }

  test("langId classifies stopword-rich samples") {
    val d = Seq(
      (1L, "the cat is in the house and the dog is there", "en"),
      (2L, "der hund ist nicht in das haus und der garten", "de"),
      (3L, "el gato y los perros es que corren", "es"),
      (4L, "le chat est dans les maisons et une souris", "fr"),
      (5L, "xyzzy plugh quux", "zz"),
    ).toDF("doc_id", "text", "lang")
    val res = TextOps.langId(d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(res == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr", 5L -> "und"))
  }

  test("textQuality gates short and punctuation-heavy docs") {
    val d = docs(
      1L -> base, // long, clean → keep
      2L -> "too short", // < 50 chars → drop
      3L -> ("!@#$%^&*()!@#$%^&*()!@#$%^&*()!@#$%^&*()" +
        " a b c d e f g h i j")) // punct-heavy → drop
    val res = TextOps.textQuality(d).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(res == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("textTokens counts whitespace and BPE-ish tokens") {
    val d = docs(1L -> "hello world, it's 42 degrees")
    val r = TextOps.textTokens(d).head
    assert(r.getLong(1) == 5) // ws tokens
    // hello | world | , | it | ' | s | 42 | degrees
    assert(r.getLong(2) == 8)
  }

  test("ANN finds planted near-copies of the query vector") {
    val rnd = new scala.util.Random(7)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val q = vec()
    def jitter(eps: Double): Array[Double] =
      q.map(x => x + eps * rnd.nextGaussian())
    val rows =
      Seq(0L -> q, 1L -> jitter(0.05), 2L -> jitter(0.05), 3L -> jitter(0.08)) ++
        (4L to 60L).map(_ -> vec())
    val emb = rows.toDF("vec_id", "v")
    val ann = Similarity.annTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    assert(Set(0L, 1L, 2L, 3L).subsetOf(ann),
      s"planted near-copies missing from ANN result: $ann")
    // and the exact baseline agrees on the planted set
    val brute = Similarity.bruteForceTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(Set(0L, 1L, 2L, 3L).subsetOf(brute))
  }

  test("IVF probes the query's cells and finds planted near-copies") {
    val rnd = new scala.util.Random(11)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val q = vec()
    def jitter(eps: Double): Array[Double] =
      q.map(x => x + eps * rnd.nextGaussian())
    // ids 0..7 are the centroid seed set; the planted near-copies of
    // vector 0 land in cells centered on one of 0..3 (mutually similar),
    // all of which the query probes at nProbe=4
    val rows =
      Seq(0L -> q, 1L -> jitter(0.05), 2L -> jitter(0.05), 3L -> jitter(0.08)) ++
        (4L to 80L).map(_ -> vec())
    val emb = rows.toDF("vec_id", "v")
    val ivf = Similarity.ivfTopK(emb, 0L, 10, nCentroids = 8, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(Set(0L, 1L, 2L, 3L).subsetOf(ivf),
      s"planted near-copies missing from IVF result: $ivf")
    // IVF recall vs the exact scan on the harness corpus: ≥ half of
    // the true top-20 with 4 of 16 cells probed
    val hEmb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val brute = Similarity.bruteForceTopK(hEmb, 0L, 20)
      .collect().map(_.getLong(0)).toSet
    val hIvf = Similarity.ivfTopK(hEmb, 0L, 20)
      .collect().map(_.getLong(0)).toSet
    assert((brute & hIvf).size >= 10,
      s"IVF recall too low: ${(brute & hIvf).size}/20")
  }

  test("PQ encode picks each subvector's true argmin codeword; IVF-PQ finds plants") {
    val rnd = new scala.util.Random(17)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    val q = vec()
    val rows = Seq(0L -> q, 1L -> q.map(x => x + 0.05 * rnd.nextGaussian()),
      2L -> q.map(x => x + 0.06 * rnd.nextGaussian())) ++ (3L to 80L).map(_ -> vec())
    val emb = rows.toDF("vec_id", "v")
    val (m, k, sub) = (8, 16, 8)
    // ground truth argmin per (vector, subspace), brute-forced locally
    // against the TRAINED codebook table — the same table the engine
    // encodes against (since round 9 codebooks are k-means-refined, so
    // the raw seed subvectors are no longer the codewords)
    val books = Similarity.pqCodebooks(emb, m, k)
    val cb = books.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
    assert(cb.size == k * m)
    val codes = Similarity.pqEncode(emb, m, k, books = Some(books)).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(codes.size == rows.size * m)
    rows.foreach { case (id, v) =>
      v.grouped(sub).zipWithIndex.foreach { case (sv, si) =>
        val want = (0 until k).minBy { c =>
          val cw = cb((c, si))
          (sv.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum, c)
        }
        assert(codes((id, si)) == want,
          s"vec $id sub $si: encoded ${codes((id, si))}, argmin is $want")
      }
    }
    // the composed path surfaces the planted near-copies and is
    // deterministic run to run
    val top = Similarity.ivfPqTopK(emb, 0L, 10, nCentroids = 8, nProbe = 4)
      .collect().map(_.getLong(0))
    assert(Set(0L, 1L, 2L).subsetOf(top.toSet),
      s"planted near-copies missing from IVF-PQ result: ${top.toSeq}")
    val again = Similarity.ivfPqTopK(emb, 0L, 10, nCentroids = 8, nProbe = 4)
      .collect().map(_.getLong(0))
    assert(top.toSeq == again.toSeq)
    // the ADC pass is candidate-PRUNED: scoring restricted to a given
    // id set emits exactly that set's rows, never the corpus's
    val some = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    val scored = Similarity.pqAdcScores(emb, 0L, within = Some(some))
    assert(scored.count() == some.count() && scored.count() < emb.count())
  }

  test("maskPii redacts every email and phone, counts them pre-redaction") {
    val d = Seq(
      (1L, "write a.b-c_9@mail.example.org or call 555-0134 today"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io z@w.ai and 123-4567 999-0000"),
    ).toDF("doc_id", "raw")
    val res = d.select(col("doc_id"),
      TextOps.maskPii(col("raw")).as("m"),
      regexp_count(col("raw"), lit(TextOps.EmailRe)).as("ne"),
      regexp_count(col("raw"), lit(TextOps.PhoneRe)).as("np"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(res(1L) == ("write [EMAIL] or call [PHONE] today", 1, 1))
    assert(res(2L) == ("no pii here at all", 0, 0))
    assert(res(3L) == ("two mails [EMAIL] [EMAIL] and [PHONE] [PHONE]", 2, 2))
  }

  test("canonicalUrl collapses scheme/www/query/trailing-slash variants") {
    val d = Seq(
      "HTTPS://WWW.Site.Example.com/Articles/4/?utm_source=feed",
      "http://site.example.com/articles/4",
      "https://site.example.com/Articles/4/",
      "site.example.com/articles/4?ref=x",
    ).toDF("url")
    val canon = d.select(TextOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(canon == Set("site.example.com/articles/4"), canon.toString)
  }

  test("saltedJoin returns exactly the plain join's rows on a hot-key input") {
    import graft.operators.Joins
    // one key carries 90% of the rows — the shape salting exists for
    val big = ((1 to 900).map(i => (7L, i)) ++ (1 to 100).map(i => (i.toLong % 5, i)))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("sk", "name")
    val salted = Joins.saltedJoin(big, "k", Seq("payload"), small, "sk")
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = big.join(small, col("k") === col("sk"))
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain && salted("hot") == 900L)
  }

  test("dedupUrl keeps min doc_id per canonical url over the harness corpus") {
    val res = TextOps.dedupUrl(Tables.documents(spark, sf)).collect()
    assert(res.nonEmpty)
    // canonicalization must have stripped scheme, query, and case
    assert(res.forall { r =>
      val u = r.getString(0)
      !u.contains("?") && !u.contains("https") && u == u.toLowerCase
    })
    // groups partition the corpus: multiplicities sum to the doc count
    val total = res.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, sf).count())
  }

  test("brute-force topk: query itself ranks first with sim 1.0") {
    val res = SparkEntry.queries("q_similarity_topk")(spark, sf).head
    assert(res.getLong(0) == 0L && res.getDouble(1) == 1.0)
  }

  test("multimodal features are deterministic and partition-invariant") {
    val d = Tables.documents(spark, sf).limit(50)
    val a = Multimodal.mediaFeatures(d).collect()
      .map(f => f.id -> (f.n_bytes, f.signature)).toMap
    val b = Multimodal.mediaFeatures(d.repartition(7)).collect()
      .map(f => f.id -> (f.n_bytes, f.signature)).toMap
    assert(a == b)
    val meta = Multimodal.mediaMeta(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a.forall { case (id, (n, _)) => meta(id) == n.toLong })
  }

  test("imageFeaturesOf REALLY decodes: PNG/BMP exact, JPEG approximate, garbage refused") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def imgBytes(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no JDK writer for $fmt")
      out.toByteArray
    }
    val solid = (200 << 16) | (100 << 8) | 50
    val rows = Seq(
      (1L, imgBytes("png", 17, 9, solid)),
      (2L, imgBytes("bmp", 5, 31, solid)),
      (3L, imgBytes("jpg", 16, 16, solid)),
      (4L, "definitely not an image".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "payload")
    val f = Multimodal.imageFeaturesOf(df).collect().map(x => x.id -> x).toMap
    // lossless formats: exact dimensions AND exact channel means
    assert(f(1L).decode_ok && (f(1L).width, f(1L).height) == ((17, 9)))
    assert((f(1L).mean_r, f(1L).mean_g, f(1L).mean_b) == ((200.0, 100.0, 50.0)))
    assert(f(2L).decode_ok && (f(2L).width, f(2L).height) == ((5, 31)))
    assert((f(2L).mean_r, f(2L).mean_g, f(2L).mean_b) == ((200.0, 100.0, 50.0)))
    // JPEG is lossy: exact dims, means within a small tolerance
    assert(f(3L).decode_ok && (f(3L).width, f(3L).height) == ((16, 16)))
    assert(math.abs(f(3L).mean_r - 200.0) < 5.0 &&
      math.abs(f(3L).mean_g - 100.0) < 5.0 && math.abs(f(3L).mean_b - 50.0) < 5.0,
      s"jpeg means: ${f(3L)}")
    assert(!f(4L).decode_ok)
    // partition invariance
    val g = Multimodal.imageFeaturesOf(df.repartition(3)).collect()
      .map(x => x.id -> ((x.decode_ok, x.width, x.height, x.mean_r))).toMap
    assert(g == f.map { case (k, v) =>
      k -> ((v.decode_ok, v.width, v.height, v.mean_r)) })
  }

  test("wavFeaturesOf REALLY parses RIFF/PCM: rate, frames, exact RMS; non-PCM refused") {
    import spark.implicits._
    def wav(rate: Int, ch: Int, bits: Int, fmtCode: Int,
        samples: Array[Short]): Array[Byte] = {
      val bytesPerSample = bits / 8
      val dataLen = samples.length * bytesPerSample
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(fmtCode.toShort)
        .putShort(ch.toShort).putInt(rate)
        .putInt(rate * ch * bytesPerSample)
        .putShort((ch * bytesPerSample).toShort).putShort(bits.toShort)
      bb.put("data".getBytes).putInt(dataLen)
      if (bits == 16) samples.foreach(bb.putShort)
      else samples.foreach(s => bb.put(s.toByte))
      bb.array()
    }
    // 100-frame stereo square wave at ±8192 → RMS = 8192/32768 = 0.25
    val sq = Array.tabulate[Short](200)(i => if (i % 2 == 0) 8192 else -8192)
    val rows = Seq(
      (1L, wav(16000, 2, 16, 1, sq)),
      (2L, wav(8000, 1, 16, 3, sq)), // IEEE-float format code: refused
      (3L, "RIFFgarbage".getBytes("UTF-8")))
    val f = Multimodal.wavFeaturesOf(rows.toDF("doc_id", "payload"))
      .collect().map(x => x.id -> x).toMap
    assert(f(1L).decode_ok, s"got ${f(1L)}")
    assert((f(1L).sample_rate, f(1L).n_channels, f(1L).bits_per_sample) ==
      ((16000, 2, 16)))
    assert(f(1L).n_frames == 100L && f(1L).duration_ms == 6.25)
    assert(f(1L).rms == 0.25, s"rms: ${f(1L)}")
    assert(!f(2L).decode_ok && !f(3L).decode_ok)
    // 8-bit mono: unsigned samples 128±64 → RMS = 64/128 = 0.5
    val by8 = Array.tabulate[Short](64)(i => if (i % 2 == 0) 192 else 64)
    val f8 = Multimodal.wavFeaturesOf(
      Seq((9L, wav(8000, 1, 8, 1, by8))).toDF("doc_id", "payload"))
      .collect().head
    assert(f8.decode_ok && f8.bits_per_sample == 8 && f8.n_frames == 64L)
    assert(f8.rms == 0.5, s"rms8: $f8")
  }

  test("mp3FeaturesOf walks MPEG-1 Layer III headers: ID3 skip, VBR, strict refusals") {
    import spark.implicits._
    // 40 CBR frames, 128 kbps @ 44100, stereo, both ID3 tags present
    val cbr = MediaFixture.mp3Bytes(0, 9, mono = false, nFrames = 40,
      id3v2 = true, id3v1 = true)
    // VBR: bitrate varies per frame (rate fixed) — legal mp3; the
    // features report the FIRST frame's bitrate
    val f1 = MediaFixture.mp3Bytes(1, 5, mono = true, nFrames = 1)
    val f2 = MediaFixture.mp3Bytes(1, 9, mono = true, nFrames = 2)
    val vbr = f1 ++ f2
    // mid-stream RATE change is malformed — refused
    val rateFlip = MediaFixture.mp3Bytes(0, 5, mono = true, nFrames = 1) ++
      MediaFixture.mp3Bytes(2, 5, mono = true, nFrames = 1)
    // free-format (bitrate index 0) refused
    val free = {
      val b = MediaFixture.mp3Bytes(0, 5, mono = true, nFrames = 1)
      b(2) = (b(2) & 0x0F).toByte
      b
    }
    val rows = Seq((1L, cbr), (2L, vbr), (3L, rateFlip), (4L, free),
      (5L, "not audio at all".getBytes("UTF-8")))
    val f = Multimodal.mp3FeaturesOf(rows.toDF("doc_id", "payload"))
      .collect().map(x => x.id -> x).toMap
    assert(f(1L).decode_ok, s"cbr: ${f(1L)}")
    assert((f(1L).sample_rate, f(1L).n_channels, f(1L).bitrate_kbps,
      f(1L).n_frames) == ((44100, 2, 128, 40L)))
    assert(f(1L).duration_ms == 40 * 1152000.0 / 44100)
    assert(f(2L).decode_ok && f(2L).n_frames == 3L &&
      f(2L).bitrate_kbps == 64 && f(2L).sample_rate == 48000,
      s"vbr: ${f(2L)}")
    assert(!f(3L).decode_ok && !f(4L).decode_ok && !f(5L).decode_ok)
  }

  test("webpFeaturesOf parses all three variants, strict container refusals") {
    import spark.implicits._
    val vp8 = MediaFixture.webpBytes(0, 640, 480, alpha = false, anim = false)
    val vp8l = MediaFixture.webpBytes(1, 2, 3, alpha = true, anim = false)
    val vp8x = MediaFixture.webpBytes(2, 100, 50, alpha = false, anim = true)
    // bad start code in the VP8 bitstream header
    val badStart = {
      val b = MediaFixture.webpBytes(0, 8, 8, alpha = false, anim = false)
      b(23) = 0x00.toByte
      b
    }
    // container size field disagrees with the byte count
    val badSize = {
      val b = MediaFixture.webpBytes(1, 4, 4, alpha = false, anim = false)
      b(4) = (b(4) + 1).toByte
      b
    }
    // an inner chunk whose declared size runs past the container end
    val badChunk = {
      val b = MediaFixture.webpBytes(2, 4, 4, alpha = false, anim = false)
      b(16) = (b(16) + 40).toByte
      b
    }
    val rows = Seq((1L, vp8), (2L, vp8l), (3L, vp8x), (4L, badStart),
      (5L, badSize), (6L, badChunk),
      (7L, "not an image".getBytes("UTF-8")))
    val f = Multimodal.webpFeaturesOf(rows.toDF("doc_id", "payload"))
      .collect().map(x => x.id -> x).toMap
    assert(f(1L).decode_ok && f(1L).variant == "VP8" &&
      (f(1L).width, f(1L).height) == ((640, 480)) && !f(1L).lossless,
      s"vp8: ${f(1L)}")
    assert(f(2L).decode_ok && f(2L).variant == "VP8L" &&
      (f(2L).width, f(2L).height) == ((2, 3)) && f(2L).lossless &&
      f(2L).has_alpha, s"vp8l: ${f(2L)}")
    assert(f(3L).decode_ok && f(3L).variant == "VP8X" &&
      (f(3L).width, f(3L).height) == ((100, 50)) && f(3L).has_animation &&
      !f(3L).has_alpha, s"vp8x: ${f(3L)}")
    Seq(4L, 5L, 6L, 7L).foreach(i =>
      assert(!f(i).decode_ok && f(i).variant == "", s"$i: ${f(i)}"))
  }

  test("wavFeaturesOf chunk walk terminates on malformed u32 chunk lengths") {
    import spark.implicits._
    // Adversarial RIFF payloads whose chunk length makes the NARROWED
    // Int advance `8 + clen.toInt + (clen.toInt & 1)` zero or negative —
    // before the Long-arithmetic clamp these spun an executor task
    // forever (no exception for try/catch to see). All must come back
    // decode_ok=false, promptly.
    def riff(chunkId: String, clen: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
      bb.put(chunkId.getBytes).putInt((clen & 0xFFFFFFFFL).toInt)
      bb.array()
    }
    val rows = Seq(
      (1L, riff("junk", 0xFFFFFFF8L)), // Int advance exactly 0
      (2L, riff("junk", 0xFFFFFFF7L)), // odd variant, word-align pad -> 0
      (3L, riff("junk", 0x7FFFFFFFL)), // huge but positive: clamps past end
      (4L, riff("fmt ", 0xFFFFFFF8L))) // hostile length on a real chunk id
    val fut = scala.concurrent.Future {
      Multimodal.wavFeaturesOf(rows.toDF("doc_id", "payload")).collect()
    }(scala.concurrent.ExecutionContext.global)
    val out = scala.concurrent.Await.result(fut,
      scala.concurrent.duration.Duration(60, "s"))
    assert(out.length == 4 && out.forall(!_.decode_ok), out.mkString("; "))
  }

  test("stratifiedSample: rates land near target, selection is partition-invariant") {
    import graft.operators.TextOps
    val docs = Tables.documents(spark, sf)
    val kept = TextOps.stratifiedSample(docs, "lang",
      Seq("en" -> 0.5), defaultRate = 0.75, salt = "mix1")
    val byLang = kept.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // realized rate within ±0.15 of target per stratum (n≈70-200)
    totals.foreach { case (lang, n) =>
      val target = if (lang == "en") 0.5 else 0.75
      val realized = byLang.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(realized - target) < 0.15, s"$lang: $realized vs $target")
    }
    // deterministic: identical selection regardless of partitioning
    val a = kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = TextOps.stratifiedSample(docs.repartition(7), "lang",
        Seq("en" -> 0.5), defaultRate = 0.75, salt = "mix1")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
    // a different salt draws a different (overlapping) sample
    val c = TextOps.stratifiedSample(docs, "lang",
        Seq("en" -> 0.5), defaultRate = 0.75, salt = "mix2")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(c != a)
  }

  test("snapshotDiff classifies all four outcomes, null-safely") {
    import graft.operators.Snapshot
    val oldSnap = Seq((1L, "same"), (2L, "was"), (3L, "gone"), (5L, null: String))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "same"), (2L, "now"), (4L, "new"), (5L, null: String))
      .toDF("doc_id", "text")
    val diff = Snapshot.snapshotDiff(oldSnap, newSnap, "doc_id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(1L -> "unchanged", 2L -> "update", 3L -> "delete",
      4L -> "insert", 5L -> "unchanged"))
  }

  test("snapshotApply closes the diff round trip: apply(diff(old,new), old) == new") {
    import graft.operators.Snapshot
    val oldSnap = Seq((1L, "same"), (2L, "was"), (3L, "gone"), (5L, null: String))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "same"), (2L, "now"), (4L, "new"), (5L, null: String))
      .toDF("doc_id", "text")
    val changes = Snapshot.snapshotDiff(oldSnap, newSnap, "doc_id", Seq("text"))
      .filter(col("change") =!= "unchanged")
      .join(newSnap, Seq("doc_id"), "left")
    val merged = Snapshot.snapshotApply(oldSnap, changes, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = newSnap.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged == want)
    // an empty change set is the identity
    val idOut = Snapshot.snapshotApply(oldSnap, changes.limit(0), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(idOut == oldSnap.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
  }

  test("dedupSpans removes cross-doc repeated blocks, keeps order, drops hollow docs") {
    // doc 1/2 share the boilerplate block "aa bb cc" (plus unique tails);
    // doc 3 is entirely that block; doc 4 is untouched unique content
    val d = docs(
      1L -> "aa bb cc one two three",
      2L -> "aa bb cc four five six",
      3L -> "aa bb cc",
      4L -> "seven eight nine ten eleven twelve")
    val res = Dedup.dedupSpans(d, 3, 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(res == Map(
      1L -> "one two three",
      2L -> "four five six",
      4L -> "seven eight nine ten eleven twelve"), s"got $res")
    // a trailing partial block survives independently of the full ones
    val tail = Dedup.dedupSpans(docs(
      1L -> "aa bb cc zz",
      2L -> "aa bb cc yy"), 3, 2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tail == Map(1L -> "zz", 2L -> "yy"), s"got $tail")
  }

  test("mixProportions hits the uniform target: binding stratum whole, replayable") {
    val corpus = Tables.documents(spark, sf)
    val targets = Seq("en" -> 0.2, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.2, "zh" -> 0.2)
    def run(salt: String) = TextOps.mixProportions(corpus, "lang", targets, salt)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val a = run("mixp")
    assert(a.toSeq == run("mixp").toSeq, "same salt must reproduce the mix")
    // local replay of the rate computation + digest predicate
    val byLang = corpus.select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cnt = byLang.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val tMin = cnt.values.map(_ / 0.2).min
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hex8(id: Long) = md.digest(s"$id:mixp".getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    val want = byLang.filter { case (id, g) =>
      val rate = 0.2 * tMin / cnt(g)
      rate >= 1.0 || hex8(id) < f"${math.min(math.floor(rate * 4294967296.0).toLong, 4294967295L)}%08x"
    }.toSet
    assert(a.toSet == want)
    // the binding (rarest) stratum keeps every document; the mix is
    // far closer to uniform than the skewed input (en/fr ~3.4x)
    val keptPerLang = a.groupBy(_._2).view.mapValues(_.length).toMap
    val binding = cnt.minBy(_._2)._1
    assert(keptPerLang(binding).toLong == cnt(binding))
    assert(keptPerLang.values.max.toDouble / keptPerLang.values.min <= 2.0,
      s"mix not rebalanced: $keptPerLang")
    // a different salt draws a different doc set
    assert(a.map(_._1).toSet != run("other").map(_._1).toSet)
  }

  test("upsampleEpochs fans out by stratum factor with contiguous epoch numbers") {
    val d = docs(1L -> "a", 2L -> "b").withColumn("lang",
      when(col("doc_id") === 1L, "en").otherwise("fr"))
    val res = TextOps.upsampleEpochs(d, "lang", Seq("en" -> 1, "fr" -> 3), 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(res.toSet == Set((1L, "en", 1), (2L, "fr", 1), (2L, "fr", 2), (2L, "fr", 3)))
    // unlisted stratum takes the default factor
    val other = docs(3L -> "c").withColumn("lang", lit("zh"))
    val deflt = TextOps.upsampleEpochs(other, "lang", Seq("en" -> 1), 2)
      .collect().map(_.getInt(2)).sorted
    assert(deflt.toSeq == Seq(1, 2))
    // factor 0 EXCLUDES the stratum (no phantom descending epochs);
    // negative factors are rejected up front
    val zero = TextOps.upsampleEpochs(d, "lang", Seq("fr" -> 0), 2).collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    assert(zero.toSet == Set((1L, 1), (1L, 2)), s"got ${zero.toSeq}")
    intercept[IllegalArgumentException] {
      TextOps.upsampleEpochs(d, "lang", Seq("fr" -> -1), 2)
    }
  }

  test("frameSample emits the exact byte slices; resize normalizes every payload") {
    val docs = Tables.documents(spark, sf).limit(30)
    val payloads = Multimodal.withPayload(docs)
    val raw = payloads.select(col("doc_id"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // every 2nd 256-byte frame, bytes identical to a JVM-side slice
    val frames = Multimodal.frameSample(payloads, 256, 2).collect()
    frames.foreach { f =>
      val p = raw(f.id)
      val expect = java.util.Arrays.copyOfRange(p, f.frame_idx * 256,
        math.min((f.frame_idx + 1) * 256, p.length))
      assert(java.util.Arrays.equals(f.frame, expect), s"id=${f.id} idx=${f.frame_idx}")
      assert(f.frame_idx % 2 == 0)
    }
    // fan-out count: ceil(n_frames / 2) sampled frames per doc
    val perDoc = frames.groupBy(_.id).view.mapValues(_.length).toMap
    raw.foreach { case (id, p) =>
      val nFrames = (p.length + 255) / 256
      assert(perDoc(id) == (nFrames + 1) / 2, s"id=$id")
    }
    // partition invariance of the sampled set
    val again = Multimodal.frameSample(payloads.repartition(7), 256, 2)
      .collect().map(f => (f.id, f.frame_idx, f.frame.toSeq)).toSet
    assert(again == frames.map(f => (f.id, f.frame_idx, f.frame.toSeq)).toSet)
    // resize: every payload exactly targetBytes, truncate-or-pad, meta recomputed
    val resized = Multimodal.payloadResize(payloads, 128)
    val rr = resized.select(col("doc_id"), col("payload"), col("meta.n_bytes"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getLong(2)))
    rr.foreach { case (id, p, n) =>
      assert(p.length == 128 && n == 128L)
      assert(java.util.Arrays.equals(p, java.util.Arrays.copyOf(raw(id), 128)), s"id=$id")
    }
  }

  test("binaryFile ingest: file-backed payloads honor the same contract") {
    // deterministic fixture tree: nested dirs, mixed extensions, known bytes
    val root = java.nio.file.Files.createTempDirectory("graft_media").toFile
    val bytesOf = (id: Int) => Array.tabulate[Byte](id * 37 + 5)(j => ((id * 131 + j * 7) % 256).toByte)
    val files = Seq(
      (1, "img_1.png", "image/png"), (2, "clip_2.wav", "audio/wav"),
      (3, "doc_3.txt", "text/plain"), (4, "blob_4", "application/octet-stream"))
    files.foreach { case (id, name, _) =>
      val sub = new java.io.File(root, s"batch${id % 2}"); sub.mkdirs()
      java.nio.file.Files.write(new java.io.File(sub, name).toPath, bytesOf(id))
    }
    try {
      val payloads = Multimodal.filePayloads(spark, root.toString)
      // metadata: id from filename, mime from extension, exact size + sha-256
      val meta = Multimodal.mediaMetaOf(payloads).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getString(3))).toMap
      assert(meta.keySet == files.map(_._1.toLong).toSet)
      val sha = java.security.MessageDigest.getInstance("SHA-256")
      files.foreach { case (id, _, mime) =>
        val (m, n, digest) = meta(id.toLong)
        assert(m == mime, s"id=$id mime")
        assert(n == bytesOf(id).length.toLong, s"id=$id size")
        val expect = sha.digest(bytesOf(id)).map("%02x".format(_)).mkString
        assert(digest == expect, s"id=$id digest")
      }
      // the decoder boundary is partition-invariant on the file path too
      val f1 = Multimodal.mediaFeaturesOf(payloads).collect()
        .map(f => f.id -> (f.n_bytes, f.signature, f.histogram.toSeq)).toMap
      val f2 = Multimodal.mediaFeaturesOf(payloads.repartition(7)).collect()
        .map(f => f.id -> (f.n_bytes, f.signature, f.histogram.toSeq)).toMap
      assert(f1 == f2 && f1.keySet == meta.keySet)
    } finally graft.sources.IO.rmTree(root.toString)
  }

  test("shuffleShards: seed-reproducible order, seed-sensitive, shards balanced") {
    val docs = Tables.documents(spark, sf)
    def run(seed: String) = TextOps.shuffleShards(docs, seed, 16).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    val a = run("s1")
    // same seed → byte-identical order; different seed → different order
    assert(a.toSeq == run("s1").toSeq, "same seed must reproduce the order")
    assert(a.map(_._1).toSeq != run("s2").map(_._1).toSeq,
      "different seed must permute differently")
    // positions are a dense 1..n total order and shards are contiguous
    // slices of it, balanced to within the ceil rounding
    val n = a.length
    assert(a.map(_._2).sorted.toSeq == (1L to n).toSeq)
    val sizes = a.groupBy(_._3).map { case (sh, xs) => sh -> xs.length }
    val shardSize = math.ceil(n / 16.0).toLong
    assert(sizes.keys.min == 0 && sizes.keys.max == (n - 1) / shardSize)
    assert(sizes.values.forall(_ <= shardSize), s"oversized shard: $sizes")
    a.groupBy(_._3).foreach { case (sh, xs) =>
      val ps = xs.map(_._2).sorted
      assert(ps.last - ps.head == ps.length - 1, s"shard $sh not contiguous")
    }
  }

  test("tokenBudgetMix: keep rule, >=1 doc per stratum, bounded overshoot, seeded") {
    val docs = Tables.documents(spark, sf)
    def run(seed: String) = TextOps.tokenBudgetMix(docs, "lang", 2000L, seed)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val a = run("mixb")
    assert(a.toSeq == run("mixb").toSeq, "same seed must reproduce the mix")
    // the kept set is EXACTLY a local replay of the keep rule: per
    // stratum, walk the md5(seed++id) order and keep docs that start
    // under budget
    val keyed = docs.select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n"),
        md5(concat(lit("mixb"), col("doc_id").cast("string"))).as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val want = keyed.groupBy(_._2).flatMap { case (_, xs) =>
      var cum = 0L
      xs.toSeq.sortBy(x => (x._4, x._1)).flatMap { case (id, g, n, _) =>
        val start = cum; cum += n
        if (start < 2000L) Some((id, g, n, cum)) else None
      }
    }.toSet
    assert(a.toSet == want)
    // every stratum in the corpus is represented, overshoot < one doc
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(a.map(_._2).toSet == langs)
    a.groupBy(_._2).foreach { case (g, xs) =>
      assert(xs.map(_._3).sum < 2000L + xs.map(_._3).max, s"overshoot in $g")
    }
    // a different seed draws a different doc set (same budget)
    assert(a.map(_._1).toSet != run("other").map(_._1).toSet)
  }

  test("vocabCoverage: keep rule replay, coverage reached, one-type overshoot bound") {
    val corpus = Tables.documents(spark, sf)
    val a = TextOps.vocabCoverage(corpus, 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // local replay of the keep rule: rank types by (cnt desc, token),
    // keep while the running mass STARTS under half the stream
    val counts = corpus.select(explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val total = counts.map(_._2).sum
    var cum = 0L
    val want = counts.sortBy { case (t, c) => (-c, t) }.flatMap { case (t, c) =>
      val start = cum; cum += c
      if (start < total * 0.5) Some((t, c, cum)) else None
    }
    assert(a.toSeq == want.toSeq, "kept prefix must replay the keep rule in order")
    val kept = a.map(_._2).sum
    assert(kept >= total * 0.5, "coverage target must be reached")
    assert(kept - a.map(_._2).min < total * 0.5,
      "dropping the crossing type must fall back under target (one-type overshoot)")
  }

  test("bm25: exact local replay of the Lucene chain, top-k order, absent term scores zero") {
    val corpus = Tables.documents(spark, sf)
    val terms = Seq("spark", "vector", "hash")
    val a = TextOps.bm25(corpus, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // local replay with the IDENTICAL IEEE operation order. All corpus
    // statistics (N, df, sum of integer-valued dl) are exact integers
    // < 2^53, so partial-aggregation order cannot perturb them; the
    // per-document chain is then a fixed deterministic double sequence.
    val toks = corpus.select(col("doc_id"), col("text")).collect().map { r =>
      r.getLong(0) -> "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toArray
    }
    val n = toks.length.toDouble
    val avgdl = toks.map(_._2.length.toDouble).sum / n
    val dfs = terms.map(t => toks.count(_._2.contains(t)).toDouble)
    def score(ts: Array[String]): Double = terms.indices.map { i =>
      val tf = ts.count(_ == terms(i)).toDouble
      val idf = math.log((n - dfs(i) + 0.5) / (dfs(i) + 0.5) + 1.0)
      idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * ts.length.toDouble / avgdl))
    }.sum
    val want = toks.map { case (id, ts) =>
      id -> BigDecimal(score(ts)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sortBy { case (id, s) => (-s, id) }.take(20).toSeq
    assert(a.toSeq == want, "top-20 must replay the scoring chain bit-exactly")
    assert(a.map(_._2).min > 0.0, "harness terms occur — every kept doc scores")
    // a term absent from every document contributes tf=0 => score 0
    val z = TextOps.bm25(docs(1L -> "nothing here", 2L -> "still nothing"),
      Seq("zebra")).collect().map(_.getDouble(1))
    assert(z.forall(_ == 0.0))
  }

  test("connectedComponents: chains, separate components, long path, empty input") {
    def cc(edges: (Long, Long)*): Map[Long, Long] =
      Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // A~B, B~C transitively cluster even though A~C never surfaced;
    // {5,6} stays separate; edge orientation and duplicates don't matter
    assert(cc(2L -> 1L, 2L -> 3L, 3L -> 2L, 5L -> 6L) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    // a 12-node path (diameter 11) exercises multiple contraction
    // rounds; min id sits at one END of the path (worst case)
    val path = (1L to 11L).map(i => i -> (i + 1))
    assert(cc(path: _*) == (1L to 12L).map(_ -> 1L).toMap)
    assert(cc() == Map.empty)
  }

  test("dedupClusters groups planted near-dup chains; resolve keeps canonicals + untouched docs") {
    // 1~2 and 2~3 are near-dups (one word apart); 3 vs 1 differ by two
    // words — the pair finder may or may not emit (1,3), but the
    // CLUSTER must hold all three either way; 4 is unrelated
    val d = docs(
      1L -> base,
      2L -> base.replace("winter", "summer"),
      3L -> base.replace("winter", "summer").replace("quick", "slow"),
      4L -> ("totally different content about catalyst optimizer rules " +
        "and shuffle exchanges and the joy of pushed down predicates " +
        "living inside a columnar scan far away from everything else"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val clusters = Dedup.dedupClusters(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(clusters.map(c => c._1 -> c._2).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got ${clusters.toSeq}")
    assert(clusters.filter(_._3).map(_._1).toSeq == Seq(1L))
    val kept = Dedup.dedupResolve(d).collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 4L)), s"kept ${kept.toSeq}")
  }

  test("dedupIncremental: new-vs-existing and new-vs-earlier-new drop; existing untouched") {
    val fresh =
      "a completely different passage describing catalyst rules and " +
        "columnar scans where predicates travel downward until they rest " +
        "inside the reader and rows never leave their parquet homes early"
    val existing = docs(
      2L -> base,
      4L -> ("yet another unrelated existing document listing shuffle " +
        "partitions and broadcast thresholds and the gentle art of " +
        "salting hot keys before anyone notices the skew at all"))
    val newDocs = docs(
      1L -> ("an unrelated new document about watermark semantics and " +
        "late arriving events that linger in state stores until the " +
        "clock of the stream finally lets them be forgotten forever"),
      3L -> base.replace("winter", "summer"), // near-dup of EXISTING 2
      5L -> fresh, // kept: first of its run
      7L -> fresh.replace("early", "late")) // near-dup of EARLIER NEW 5
    val kept = Dedup.dedupIncremental(newDocs, existing)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 5L), s"kept $kept")
  }

  test("sessionize splits on gaps > threshold, one shuffle, user-isolated") {
    import org.apache.spark.sql.functions.{timestamp_micros => tsu}
    val min = 60L * 1000000L
    // user 1: events at 0,10,25 min (one session), then 70,75 (second);
    // user 2: single event; boundary: gap of EXACTLY 30 min stays fused
    val rows = Seq(
      (1L, 101L, 0L), (1L, 102L, 10 * min), (1L, 103L, 25 * min),
      (1L, 104L, 70 * min), (1L, 105L, 75 * min),
      (2L, 201L, 5 * min),
      (3L, 301L, 0L), (3L, 302L, 30 * min))
    val ev = rows.toDF("user_id", "event_id", "us0")
      .select(col("user_id"), col("event_id"), tsu(col("us0")).as("ts"))
    val res = graft.operators.Windows.sessionize(ev, gapSec = 1800)
      .orderBy("user_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(res.toSeq == Seq(
      (1L, 1L, 3L, 0L, 25 * min),
      (1L, 2L, 2L, 70 * min, 75 * min),
      (2L, 1L, 1L, 5 * min, 5 * min),
      (3L, 1L, 2L, 0L, 30 * min)), s"got ${res.toSeq}")
    // the session aggregate reuses the window's user_id partitioning:
    // exactly ONE exchange in the whole plan
    val plan = graft.operators.Windows.sessionize(ev, 1800)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected exactly 1 exchange:\n$plan")
  }

  test("weightedSample: without replacement, weight-dominant item always in, replayable") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", 1000000000L), (2L, "en", 1L), (3L, "de", 1L), (4L, "de", 1L),
      (5L, "en", 0L) // zero weight: never sampled
    ).toDF("doc_id", "lang", "n_chars")
    val r1 = graft.operators.TextOps.weightedSample(docs, 2, "tst")
      .collect().map(_.getLong(0)).toSeq
    assert(r1.length == 2 && r1.distinct.length == 2)
    // ln(u)/w for w=1e9 is ~0 — beats every unit-weight draw (ln(u) < -1e-5
    // for any u below 1 - 1e-5; the digest never lands that close to 1)
    assert(r1.contains(1L), s"weight-dominant doc missing: $r1")
    assert(!r1.contains(5L))
    // pure digest function of the id: reruns are identical
    val r2 = graft.operators.TextOps.weightedSample(docs, 2, "tst")
      .collect().map(_.getLong(0)).toSeq
    assert(r1 == r2)
    // a different salt is a different draw of the non-dominant slot —
    // at minimum the contract holds again
    val r3 = graft.operators.TextOps.weightedSample(docs, 4, "tst")
      .collect().map(_.getLong(0)).toSeq
    assert(r3.sorted == Seq(1L, 2L, 3L, 4L), s"k=4 must take all positive-weight docs: $r3")
  }

  test("selectTopP: adaptive prefix, straddler kept, drop after threshold") {
    import spark.implicits._
    val docs = Seq(
      // head-heavy group: 50 covers p=0.5 exactly → only the 50 survives
      (1L, "en", 50L), (2L, "en", 30L), (3L, "en", 20L),
      // flat group with a straddler: 40 (before=0) + 40 (before=40 < 50) kept
      (4L, "de", 40L), (5L, "de", 40L), (6L, "de", 20L)
    ).toDF("doc_id", "lang", "n_chars")
    val res = graft.operators.TextOps.selectTopP(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(res.keySet == Set(1L, 4L, 5L), s"got ${res.keySet}")
    // cumulative masses are exact integers in rank order
    assert(res(1L) == 50L && res(4L) == 40L && res(5L) == 80L)
  }

  test("collocations: hand-computed PMI on a planted corpus, min-count prunes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d b")
    ).toDF("doc_id", "text")
    // N1=8 tokens, N2=4 bigrams; c(a)=3 c(b)=3 c(c)=1 c(d)=1
    val res = graft.operators.TextOps.collocations(docs, 1L, 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    def pmi6(ratio: Double): Double = math.floor(math.log(ratio) * 1e6 + 0.5) / 1e6
    assert(res.keySet == Set(("a", "b"), ("a", "c"), ("d", "b")))
    assert(res(("a", "b")) == ((2L, 3L, 3L, pmi6(2.0 * 8 * 8 / (4.0 * 3 * 3)))))
    assert(res(("a", "c")) == ((1L, 3L, 1L, pmi6(1.0 * 8 * 8 / (4.0 * 3 * 1)))))
    assert(res(("d", "b")) == ((1L, 1L, 3L, pmi6(1.0 * 8 * 8 / (4.0 * 1 * 3)))))
    // min-count 2 prunes the singletons
    val pruned = graft.operators.TextOps.collocations(docs, 2L, 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pruned == Seq(("a", "b")))
  }
}
