package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.{Climate, TextOps}

/** Property-based checks (SURVEY §5.2.3): algebraic equivalences that
  * must hold for ALL inputs, complementing the example-based specs.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  /** Deterministic property driver over the raw scalacheck API (the
    * scalatest-scalacheck bridge isn't in the offline dependency set):
    * evaluates the generator under `trials` fixed seeds. */
  private def forAllSeeded[A](gen: Gen[A], trials: Int = 15)(body: A => Unit): Unit =
    (1 to trials).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val tsGen: Gen[Timestamp] = for {
    y <- Gen.choose(1994, 2002)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
    h <- Gen.choose(0, 23)
  } yield Timestamp.valueOf(f"$y%04d-$m%02d-$d%02d $h%02d:30:00")

  test("timestampRange ≡ the reference's (year,month) boolean tree, for all timestamps") {
    forAllSeeded(Gen.listOfN(40, tsGen)) { (tss: List[Timestamp]) =>
      if (tss.nonEmpty) {
        val df = tss.toDF("ts")
          .withColumn("year", year(col("ts"))).withColumn("month", month(col("ts")))
        val viaRange = df.filter(Climate.timestampRange(col("ts"), 1996, 2, 1999, 10))
          .select("ts").collect().map(_.getTimestamp(0)).toSet
        val viaTree = df.filter(Climate.timeRange(col("year"), col("month"), 1996, 2, 1999, 10))
          .select("ts").collect().map(_.getTimestamp(0)).toSet
        assert(viaRange == viaTree)
      }
    }
  }

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
    .map(_.take(30).mkString(" "))

  test("exact dedup is idempotent and total: groups partition the corpus") {
    forAllSeeded(Gen.listOfN(20, wordGen), trials = 8) { (texts: List[String]) =>
      if (texts.nonEmpty) {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val groups = TextOps.dedupExact(docs).collect()
        // total: multiplicities sum to corpus size
        assert(groups.map(_.getLong(1)).sum == texts.length)
        // one group per distinct text
        assert(groups.length == texts.distinct.length)
        // keep_ids are distinct doc_ids
        val keeps = groups.map(_.getLong(0))
        assert(keeps.distinct.length == keeps.length)
      }
    }
  }

  test("saltedJoin ≡ plain join for all inputs (multiplicities included)") {
    import graft.operators.Joins
    val rowGen = Gen.zip(Gen.choose(0L, 4L), Gen.choose(0, 1000))
    val dimGen = Gen.listOfN(4, Gen.zip(Gen.choose(0L, 6L), Gen.alphaLowerStr.map(_.take(4))))
    forAllSeeded(Gen.zip(Gen.listOfN(50, rowGen), dimGen), trials = 8) {
      case (facts, dims) =>
        if (facts.nonEmpty && dims.nonEmpty) {
          val big = facts.toDF("k", "payload")
          val small = dims.toDF("sk", "name")
          val salted = Joins.saltedJoin(big, "k", Seq("payload"), small, "sk")
            .select(col("k"), col("payload"), col("name"))
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted
          val plain = big.join(small, col("k") === col("sk"))
            .select(col("k"), col("payload"), col("name"))
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted
          assert(salted == plain)
        }
    }
  }

  test("canonicalUrl and maskPii are idempotent for all inputs") {
    val urlGen = for {
      scheme <- Gen.oneOf("http://", "https://", "HTTPS://", "")
      www <- Gen.oneOf("www.", "WWW.", "")
      host <- Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))
      path <- Gen.alphaLowerStr.map(_.take(6))
      slash <- Gen.oneOf("/", "")
      query <- Gen.oneOf("", "?utm=x", "?a=1&b=2")
    } yield s"$scheme$www$host.example.com/$path$slash$query"
    forAllSeeded(Gen.listOfN(25, urlGen), trials = 8) { (urls: List[String]) =>
      if (urls.nonEmpty) {
        val once = urls.toDF("u").select(TextOps.canonicalUrl(col("u")).as("c"))
        val twice = once.select(TextOps.canonicalUrl(col("c")).as("c2"))
        assert(once.collect().map(_.getString(0)).toSeq ==
          twice.collect().map(_.getString(0)).toSeq)
      }
    }
    val piiGen = Gen.oneOf(
      Gen.const("contact a.b@x.io or 555-0134 now"),
      wordGen, Gen.const("dial 123-4567 then 999-0000"))
    forAllSeeded(Gen.listOfN(10, piiGen), trials = 5) { (texts: List[String]) =>
      if (texts.nonEmpty) {
        val once = texts.toDF("t").select(TextOps.maskPii(col("t")).as("m"))
        val twice = once.select(TextOps.maskPii(col("m")).as("m2"))
        assert(once.collect().map(_.getString(0)).toSeq ==
          twice.collect().map(_.getString(0)).toSeq)
      }
    }
  }

  test("haversine: symmetric, zero at identity, non-negative, ≤ half circumference") {
    val ptGen = Gen.zip(Gen.choose(-90.0, 90.0), Gen.choose(-180.0, 180.0))
    forAllSeeded(Gen.listOfN(20, Gen.zip(ptGen, ptGen)), trials = 8) { pairs =>
      if (pairs.nonEmpty) {
        val df = pairs.map { case ((a, b), (c, d)) => (a, b, c, d) }
          .toDF("lat1", "lon1", "lat2", "lon2")
          .select(
            Climate.haversineKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("d12"),
            Climate.haversineKm(col("lat2"), col("lon2"), col("lat1"), col("lon1")).as("d21"),
            Climate.haversineKm(col("lat1"), col("lon1"), col("lat1"), col("lon1")).as("dself"))
        df.collect().foreach { r =>
          val (d12, d21, dself) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
          assert(math.abs(d12 - d21) < 1e-9)
          assert(dself == 0.0)
          assert(d12 >= 0.0 && d12 <= 6371.0 * math.Pi + 1e-6)
        }
      }
    }
  }

  test("histogram buckets partition the non-null rows; lo/hi inside the bucket") {
    forAllSeeded(Gen.listOfN(60, Gen.choose(-100.0, 400.0)), trials = 8) { vs =>
      if (vs.nonEmpty) {
        val df = vs.toDF("value")
        val hist = Climate.valueHistogram(df, "value", 25.0).collect()
        assert(hist.map(_.getLong(1)).sum == vs.length)
        hist.foreach { r =>
          val (b, lo, hi) = (r.getInt(0), r.getDouble(2), r.getDouble(3))
          assert(lo <= hi)
          // rounded lo/hi stay within a half-step of the bucket range
          assert(lo >= b * 25.0 - 0.001 && hi < (b + 1) * 25.0 + 0.001)
        }
      }
    }
  }

  test("CellMask.contains ≡ set membership for all cell sets and probes") {
    val cellGen = for {
      la <- Gen.choose(-40, 40)
      lo <- Gen.choose(-40, 40)
    } yield (la, lo)
    forAllSeeded(Gen.nonEmptyListOf(cellGen)) { (cells: List[(Int, Int)]) =>
      val set = cells.toSet
      val mask = graft.plans.CellMask.fromCells(cells)
      // every probe in a band around the extent (covers inside, edges,
      // and out-of-extent) agrees with plain set membership
      val las = cells.map(_._1)
      val los = cells.map(_._2)
      for {
        la <- (las.min - 2) to (las.max + 2)
        lo <- (los.min - 2) to (los.max + 2)
      } assert(mask.contains(la, lo) == set((la, lo)), s"($la,$lo)")
    }
  }

  test("land semi-join output ⊆ input and ∪ with anti = input") {
    forAllSeeded(Gen.zip(Gen.listOfN(30, Gen.choose(0, 5)),
      Gen.listOfN(5, Gen.choose(0, 5))), trials = 8) {
      case (pts: List[Int], land: List[Int]) =>
        if (pts.nonEmpty) {
          val p = pts.zipWithIndex.map { case (c, i) => (i.toLong, c, 0) }
            .toDF("id", "cell_lat", "cell_lon")
          val l = land.map((_, 0)).toDF("cell_lat", "cell_lon").distinct()
          val semi = Climate.landMask(p, l).select("id")
            .collect().map(_.getLong(0)).toSet
          val landSet = land.toSet
          val expected = pts.zipWithIndex
            .collect { case (c, i) if landSet(c) => i.toLong }.toSet
          assert(semi == expected)
        }
    }
  }

  test("zarr: write→read round-trips the index-space function for all shapes/chunks/codecs") {
    import graft.sources.zarr.Zarr
    val storeGen = for {
      rank <- Gen.choose(1, 3)
      shape <- Gen.listOfN(rank, Gen.choose(1L, 9L))
      // chunks may exceed the shape (one padded chunk) or divide it
      // unevenly (padded edges) — both legal zarr layouts
      chunks <- Gen.sequence[List[Int], Int](shape.map(s =>
        Gen.choose(1, s.toInt + 2)))
      codec <- Gen.oneOf(None, Some("zlib"), Some("gzip"))
      seed <- Gen.choose(1L, 1000L)
    } yield (shape.toArray, chunks.toArray, codec, seed)
    forAllSeeded(storeGen, trials = 12) { case (shape, chunks, codec, seed) =>
      val f = (i: Array[Long]) =>
        i.zipWithIndex.map { case (v, d) => v * math.pow(10, d + 1) }.sum + seed
      val dir = graft.sources.IO.tmp("graft_zarr_prop_") + "/a"
      val dims = shape.indices.map(d => s"d$d").toArray
      Zarr.writeArray(dir, shape, chunks, dims, codec, 0.0, f)
      val got = Zarr.readArray(spark, dir).collect().map { r =>
        shape.indices.map(r.getLong).toArray -> r.getDouble(shape.length)
      }
      // exactly the in-bounds index space, every value exact
      assert(got.length.toLong == shape.product)
      got.foreach { case (idx, v) =>
        assert(v == f(idx.map(_.toLong)), s"${idx.toSeq} -> $v")
      }
      // and an index slice equals the unpruned filter (pruning is an
      // optimization, never a semantics change)
      if (shape(0) > 1) {
        val cut = shape(0) / 2
        val sliced = Zarr.readArray(spark, dir)
          .filter(col("d0") >= cut).collect().length.toLong
        assert(sliced == (shape(0) - cut) * shape.drop(1).product)
      }
    }
  }

  test("chunkDocuments: exact cover with the stride's overlap, for all (text, size, stride)") {
    val cfg = for {
      n <- Gen.choose(0, 4)
      lens <- Gen.listOfN(n, Gen.choose(1, 700))
      size <- Gen.choose(2, 120)
      stride <- Gen.choose(1, size)
    } yield (lens, size, stride)
    forAllSeeded(cfg, trials = 12) { case (lens, size, stride) =>
      val docs = lens.zipWithIndex
        .map { case (l, i) => (i.toLong, ('a' + i % 26).toChar.toString * l) }
        .toDF("doc_id", "text")
      val rows = TextOps.chunkDocuments(docs, size, stride).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val byDoc = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      lens.zipWithIndex.foreach { case (l, i) =>
        val cs = byDoc(i.toLong)
        // chunk indexes are the contiguous 0..k prefix
        assert(cs.map(_._2).toSeq == cs.indices.toSeq)
        // each non-final chunk is full; starts advance by exactly stride
        cs.init.foreach { case (_, _, len) => assert(len == size) }
        // the final chunk reaches the text end exactly — no gap, no overrun
        val (_, lastIdx, lastLen) = cs.last
        assert(lastIdx.toLong * stride + lastLen == l.toLong,
          s"doc $i len $l size $size stride $stride: tail mismatch")
        // no chunk starts at-or-past the end (the ceil bound is tight)
        assert(lastIdx.toLong * stride < l || (l <= size && lastIdx == 0))
      }
    }
  }

  test("asofNearest: the match is never farther than ANY other same-user view") {
    import graft.operators.Joins
    val evGen = for {
      nv <- Gen.choose(0, 6)
      np <- Gen.choose(1, 4)
      users <- Gen.listOfN(nv + np, Gen.choose(1L, 3L))
      secs <- Gen.listOfN(nv + np, Gen.choose(0, 5000))
    } yield (users, secs, nv)
    forAllSeeded(evGen, trials = 10) { case (users, secs, nv) =>
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val rows = users.zip(secs).zipWithIndex.map { case ((u, s), i) =>
        val kind = if (i < nv) "view" else "purchase"
        (i.toLong + 100, u, kind, new java.sql.Timestamp(base + s * 1000L))
      }
      val ev = rows.toDF("event_id", "user_id", "event_type", "ts")
      val got = Joins.asofNearest(ev).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      val views = rows.filter(_._3 == "view")
      rows.filter(_._3 == "purchase").foreach { case (id, u, _, ts) =>
        val dts = views.filter(_._2 == u)
          .map(v => (v._4.getTime - ts.getTime) * 1000L)
        got(id) match {
          case None => assert(dts.isEmpty, s"purchase $id had views but no match")
          case Some(dt) =>
            assert(dts.contains(dt), s"matched Δt $dt is not a real view")
            val m = dts.map(math.abs).min
            assert(math.abs(dt) == m,
              s"purchase $id matched Δt $dt but a closer view exists: $dts")
            // a cross-direction tie resolves to the earlier side
            if (m != 0 && dts.contains(-m) && dts.contains(m))
              assert(dt == -m, s"tie at ±$m must pick the earlier view")
        }
      }
    }
  }

  test("coalesceIntervals ≡ brute-force interval union, for all interval sets") {
    import graft.operators.Windows
    val ivGen = for {
      k <- Gen.choose(1L, 3L)
      s <- Gen.choose(0L, 200L)
      len <- Gen.choose(1L, 40L)
    } yield (k, s, s + len)
    forAllSeeded(Gen.listOfN(30, ivGen), trials = 8) { ivs =>
      if (ivs.nonEmpty) {
        val got = Windows.coalesceIntervals(ivs.toDF("k", "s", "e"),
            col("k"), col("s"), col("e"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(5)))
        // brute force: sort per key, sweep, merge touching-or-overlapping
        val want = ivs.groupBy(_._1).toSeq.flatMap { case (k, xs) =>
          val sorted = xs.map(x => (x._2, x._3)).sorted
          val spans = sorted.tail.foldLeft(List((sorted.head._1, sorted.head._2, 1L))) {
            case ((cs, ce, n) :: rest, (s, e)) =>
              if (s <= ce) (cs, math.max(ce, e), n + 1) :: rest
              else (s, e, 1L) :: (cs, ce, n) :: rest
            case (Nil, _) => Nil
          }.reverse
          spans.map { case (s, e, n) => (k, s, e, n) }
        }.sortBy(x => (x._1, x._2))
        assert(got.toSeq == want,
          s"spans diverge:\n got: ${got.toSeq}\nwant: $want")
      }
    }
  }

  test("asofTolerance ≡ brute-force stale-filtered backward match, for all event sets") {
    import graft.operators.Joins
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val evGen = for {
      u <- Gen.choose(1L, 3L)
      t <- Gen.choose(0, 100)
      kind <- Gen.oneOf("view", "purchase")
    } yield (u, t, kind)
    forAllSeeded(Gen.listOfN(25, evGen), trials = 8) { raw =>
      val rows = raw.zipWithIndex.map { case ((u, t, k), i) =>
        (i.toLong, u, k, new Timestamp(base + t * 1000L)) }
      if (rows.exists(_._3 == "purchase")) {
        val tolUs = 30000000L // 30 s
        val got = Joins.asofTolerance(
            rows.toDF("event_id", "user_id", "event_type", "ts"), tolUs)
          .collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
        val views = rows.filter(_._3 == "view")
        rows.filter(_._3 == "purchase").foreach { case (id, u, _, ts) =>
          val past = views.filter(v => v._2 == u && !v._4.after(ts))
            .map(v => (ts.getTime - v._4.getTime) * 1000L)
          val want = if (past.isEmpty || past.min > tolUs) None else Some(past.min)
          assert(got(id) == want,
            s"purchase $id: got ${got(id)}, brute-force $want (past Δs $past)")
        }
      }
    }
  }

  test("intervalOverlapJoin ≡ brute-force overlap scan, for all interval sets and bucket widths") {
    import graft.operators.Joins
    val ivGen = for {
      k <- Gen.choose(1L, 4L)
      i <- Gen.choose(1L, 5L)
      s <- Gen.choose(0L, 300L)
      len <- Gen.choose(0L, 80L) // zero-length intervals must never match
    } yield (k, i, s, s + len)
    val caseGen = Gen.zip(Gen.listOfN(20, ivGen), Gen.oneOf(7L, 50L, 1000L))
    forAllSeeded(caseGen, trials = 8) { case (raw, width) =>
      // unique (key, id) per interval — ids are the dedup identity
      val ivs = raw.zipWithIndex.map { case ((k, _, s, e), i) => (k, i.toLong, s, e) }
      val got = Joins.intervalOverlapJoin(ivs.toDF("k", "i", "s", "e"),
          col("k"), col("i"), col("s"), col("e"), bucketUs = width)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      // force the hot-bucket SALTED path (every bucket salted 4 ways):
      // exactly-once emission must survive the salt refinement
      val gotSalted = Joins.intervalOverlapJoin(ivs.toDF("k", "i", "s", "e"),
          col("k"), col("i"), col("s"), col("e"), bucketUs = width,
          hotBucketOcc = 1, salt = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(gotSalted == got,
        s"width=$width: salted path diverged from unsalted")
      val want = (for {
        a <- ivs; b <- ivs
        if a._1 < b._1 && a._3 < b._4 && b._3 < a._4
      } yield (a._1, a._2, b._1, b._2,
        math.min(a._4, b._4) - math.max(a._3, b._3)))
        .sortBy(x => (x._1, x._2, x._3, x._4))
      assert(got == want, s"width=$width:\n got ${got.take(5)}…\nwant ${want.take(5)}…")
    }
  }

  test("negativeSample: k-bounded, different-label, formula-exact, for all corpora") {
    import graft.operators.Similarity
    val rowGen = Gen.choose(0, 9) // label
    forAllSeeded(Gen.listOfN(30, rowGen), trials = 8) { labels =>
      val emb = labels.zipWithIndex.map { case (l, i) =>
        (i.toLong, Array(1.0f), l) }.toDF("vec_id", "embedding", "label")
      val n = labels.length.toLong
      val rows = Similarity.negativeSample(emb, k = 4, probes = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      rows.groupBy(_._1).foreach { case (v, rs) =>
        assert(rs.length <= 4, s"anchor $v got ${rs.length} > k negatives")
        rs.foreach { case (vec, j, neg, negLabel) =>
          assert(neg == (vec * 7919L + j * 104729L) % n, "probe formula broken")
          assert(neg != vec, "self-negative")
          assert(negLabel != labels(vec.toInt), "same-label negative")
          assert(negLabel == labels(neg.toInt), "wrong joined label")
        }
      }
    }
  }

  test("rollingActiveUsers ≡ brute-force per-day distinct scans, for all activity sets") {
    import graft.operators.Aggregations
    val actGen = Gen.zip(Gen.choose(1L, 5L), Gen.choose(0, 20))
    forAllSeeded(Gen.listOfN(40, actGen), trials = 8) { acts =>
      if (acts.nonEmpty) {
        val base = java.time.LocalDate.of(2024, 3, 1)
        val rows = acts.map { case (u, d) =>
          (u, Timestamp.valueOf(base.plusDays(d).atTime(8, 0))) }
        val got = Aggregations.rollingActiveUsers(
            rows.toDF("user_id", "ts"), window = 7)
          .collect()
          .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
        val byDay = acts.groupBy(_._2)
        val want = byDay.keys.toSeq.sorted.map { d =>
          val dau = byDay(d).map(_._1).distinct.size.toLong
          val wau = acts.filter(a => a._2 >= d - 6 && a._2 <= d)
            .map(_._1).distinct.size.toLong
          (base.plusDays(d).toString, dau, wau)
        }
        assert(got == want, s"got $got\nwant $want")
      }
    }
  }

  test("businessDaySla's Monday-anchor integer chain ≡ a literal weekday-counting loop, for all date pairs") {
    import graft.operators.Climate
    val pairGen = Gen.listOfN(25, for {
      d1 <- Gen.choose(0L, 4000L)   // order date offset from 2015-01-01
      gap <- Gen.choose(0L, 90L)    // ship 0..90 calendar days later
    } yield (d1, d1 + gap))
    forAllSeeded(pairGen, trials = 8) { (pairs: List[(Long, Long)]) =>
      if (pairs.nonEmpty) {
        val base = java.time.LocalDate.of(2015, 1, 1)
        def bruteBd(a: java.time.LocalDate, b: java.time.LocalDate): Long =
          Iterator.iterate(a)(_.plusDays(1)).takeWhile(_.isBefore(b))
            .count(d => d.getDayOfWeek.getValue <= 5).toLong
        val orders = pairs.zipWithIndex.map { case ((d1, _), i) =>
          (i.toLong, java.sql.Date.valueOf(base.plusDays(d1))) }
          .toDF("o_orderkey", "o_orderdate")
        val items = pairs.zipWithIndex.map { case ((_, d2), i) =>
          (i.toLong, Timestamp.valueOf(base.plusDays(d2).atStartOfDay())) }
          .toDF("l_orderkey", "l_shipdate")
        val got = Climate.businessDaySla(orders, items).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getLong(3), r.getLong(4))).toSeq
        val byYm = pairs.groupBy { case (d1, _) =>
          val od = base.plusDays(d1)
          od.getYear.toLong * 100 + od.getMonthValue }
        val want = byYm.keys.toSeq.sorted.map { ym =>
          val bds = byYm(ym).map { case (d1, d2) =>
            bruteBd(base.plusDays(d1), base.plusDays(d2)) }
          (ym, bds.size.toLong,
            math.floor(bds.sum.toDouble / bds.size.toDouble * 1e4 + 0.5) / 1e4,
            bds.min, bds.max)
        }
        assert(got == want, s"got $got\nwant $want")
      }
    }
  }

  test("skyline2d's preceding-frame window trick ≡ literal pairwise dominance, for all point sets") {
    import graft.operators.Relational
    val ptsGen = Gen.listOfN(30, for {
      p <- Gen.choose(1, 8)   // small domains force ties and duplicates
      s <- Gen.choose(1, 8)
    } yield (p / 2.0, s))
    forAllSeeded(ptsGen, trials = 10) { (pts: List[(Double, Int)]) =>
      if (pts.nonEmpty) {
        val rows = pts.zipWithIndex.map { case ((p, s), i) =>
          (i.toLong, "B", p, s) }
        val got = Relational.skyline2d(
            rows.toDF("p_partkey", "p_brand", "p_retailprice", "p_size"))
          .collect().map(_.getLong(1)).toSet
        val want = rows.filter { case (_, _, p, s) =>
          !rows.exists { case (_, _, q, t) =>
            q <= p && t <= s && (q < p || t < s) }
        }.map(_._1).toSet
        assert(got == want, s"got $got\nwant $want\npts $pts")
      }
    }
  }

  // ---- round-14 inference battery: (user, day, purchase?) streams ----

  private val infEvGen: Gen[(Long, Int, Boolean)] = for {
    u <- Gen.choose(0L, 15L)
    d <- Gen.choose(0, 20)
    p <- Gen.oneOf(true, false)
  } yield (u, d, p)

  private def infEvents(rows: List[(Long, Int, Boolean)]) =
    rows.map { case (u, d, p) =>
      (Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
        if (p) "purchase" else "view", u, 1.0)
    }.toDF("ts", "event_type", "user_id", "value")

  test("wilsonCi: intervals bracket the rate inside [0,1], for all event sets") {
    forAllSeeded(Gen.listOfN(60, infEvGen), trials = 10) { rows =>
      if (rows.nonEmpty) {
        graft.operators.Inference.wilsonCi(infEvents(rows)).collect()
          .foreach { x =>
            val (rate, lo, hi) =
              (x.getDouble(3), x.getDouble(4), x.getDouble(5))
            assert(lo >= 0.0 && hi <= 1.0 && lo <= rate && rate <= hi,
              x.toString)
          }
      }
    }
  }

  test("fisherExact: a mirrored two-arm table sits at the hypergeometric mode -> p = 1, for all event sets") {
    forAllSeeded(Gen.listOfN(25, infEvGen), trials = 8) { rows =>
      // every user cloned into an even/odd twin with identical events:
      // n1 = n0 and a = m1/2 exactly, so pmf(a) is the mode and the
      // two-sided tail is the whole distribution
      val mirrored = rows.flatMap { case (u, d, p) =>
        List((u * 2, d, p), (u * 2 + 1, d, p)) }
      if (mirrored.nonEmpty) {
        val r = graft.operators.Inference.fisherExact(infEvents(mirrored))
          .collect().head
        if (r.getLong(3) > 0)
          assert(r.getDouble(4) == 1.0, r.toString)
      }
    }
  }

  test("fdrBh: adjusted p is within [pval, 1] and monotone in p-rank, for all event sets") {
    forAllSeeded(Gen.listOfN(80, infEvGen), trials = 8) { rows =>
      if (rows.exists(_._3) && rows.exists(!_._3)) { // pooled p in (0,1)
        val r = graft.operators.Inference.fdrBh(infEvents(rows)).collect()
        r.foreach { x =>
          assert(x.getDouble(5) <= x.getDouble(6) && x.getDouble(6) <= 1.0,
            x.toString)
        }
        val inRankOrder = r.sortBy(x => (x.getDouble(5), x.getLong(0)))
          .map(_.getDouble(6))
        inRankOrder.sliding(2).foreach {
          case Array(a, b) => assert(a <= b, inRankOrder.mkString(","))
          case _ => ()
        }
      }
    }
  }

  test("logRank totals ≡ the kaplanMeier curve it tests, for all event sets") {
    forAllSeeded(Gen.listOfN(60, infEvGen), trials = 10) { rows =>
      if (rows.nonEmpty) {
        val ev = infEvents(rows)
        val km = graft.operators.Inference.kaplanMeier(ev).collect()
        if (km.exists(_.getLong(3) > 0)) {
          val lr = graft.operators.Inference.logRank(ev).collect().head
          val o1 = km.filter(_.getLong(0) == 1L).map(_.getLong(3)).sum
          val days = km.map(_.getLong(1)).toSet
          assert(lr.getLong(1) == o1, s"$lr vs KM o1=$o1")
          assert(lr.getLong(0) == days.size, s"$lr vs KM days=$days")
        }
      }
    }
  }

  // ------------------------------------ partitioning invariance
  // The r14 battery's central parity argument: every double that
  // crosses an engine boundary is either an exact integer moment
  // (trend), a 1e-6/1e-4-grid quantized long (ttest_paired), or a
  // 1e-6-grid quantized term (logrank) BEFORE the order-sensitive
  // sum — so the rendered output cannot depend on how the input is
  // partitioned. Property-tested directly: any repartitioning of the
  // same rows renders bit-identical rows.
  private def renderAll(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertPartitionInvariant(
      input: org.apache.spark.sql.DataFrame,
      op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      tag: String): Unit = {
    val base = renderAll(op(input.repartition(1)))
    for (k <- Seq(3, 7, 16)) {
      val got = renderAll(op(input.repartition(k)))
      assert(got == base, s"$tag: $k-partition run diverged\n$got\nvs\n$base")
    }
    // a skewed, key-clustered layout too — not just round-robin
    val clustered = renderAll(op(input.repartition(5, col("user_id"))))
    assert(clustered == base, s"$tag: key-clustered run diverged")
  }

  test("logRank / pairedTTest / fdrBh render identically under ANY partitioning, for all event sets") {
    forAllSeeded(Gen.listOfN(70, infEvGen), trials = 6) { rows =>
      if (rows.nonEmpty) {
        val ev = infEvents(rows)
        assertPartitionInvariant(ev,
          graft.operators.Inference.logRank(_), "logRank")
        assertPartitionInvariant(ev,
          graft.operators.Inference.pairedTTest(_), "pairedTTest")
        if (rows.exists(_._3) && rows.exists(!_._3))
          assertPartitionInvariant(ev,
            graft.operators.Inference.fdrBh(_), "fdrBh")
      }
    }
  }

  test("cochranArmitage renders identically under ANY partitioning, for all order sets") {
    val orderGen = for {
      pri <- Gen.choose(1, 5)
      st <- Gen.oneOf("F", "O", "P")
      price <- Gen.choose(1, 99999)
    } yield (pri, st, price)
    val priNames = Map(1 -> "1-URGENT", 2 -> "2-HIGH", 3 -> "3-MEDIUM",
      4 -> "4-NOT SPECIFIED", 5 -> "5-LOW")
    forAllSeeded(Gen.listOfN(60, orderGen), trials = 6) { rows =>
      if (rows.nonEmpty) {
        val orders = rows.zipWithIndex.map { case ((pri, st, price), i) =>
          (i.toLong, (i % 7).toLong, st, price / 100.0,
            Timestamp.valueOf("2024-01-01 00:00:00"), priNames(pri))
        }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        val base = renderAll(
          graft.operators.Inference.cochranArmitage(orders.repartition(1)))
        for (k <- Seq(4, 11)) {
          val got = renderAll(graft.operators.Inference.cochranArmitage(
            orders.repartition(k)))
          assert(got == base, s"trend: $k-partition run diverged")
        }
        val clustered = renderAll(graft.operators.Inference.cochranArmitage(
          orders.repartition(3, col("o_orderpriority"))))
        assert(clustered == base, "trend: key-clustered run diverged")
      }
    }
  }

  test("mcnemar: reversing the calendar swaps the discordant cells, chi2 invariant") {
    forAllSeeded(Gen.listOfN(50, infEvGen), trials = 10) { rows =>
      if (rows.nonEmpty) {
        val lo = rows.map(_._2).min
        val hi = rows.map(_._2).max
        // a purchase AT the exact midpoint is "first half" under BOTH
        // orientations (the <= tie-break), so exclude that boundary
        val midSafe = rows.forall { case (_, d, p) =>
          !p || 2 * (d - lo) != (hi - lo) }
        if (midSafe) {
          val fwd = graft.operators.Inference.mcnemarPaired(infEvents(rows))
            .collect().head
          val rev = graft.operators.Inference.mcnemarPaired(infEvents(
            rows.map { case (u, d, p) => (u, hi + lo - d, p) }))
            .collect().head
          assert(fwd.getLong(0) == rev.getLong(0) &&
            fwd.getLong(1) == rev.getLong(1), s"$fwd vs $rev")
          assert(fwd.getLong(2) == rev.getLong(3) &&
            fwd.getLong(3) == rev.getLong(2), s"$fwd vs $rev")
          assert((fwd.isNullAt(4) && rev.isNullAt(4)) ||
            fwd.getDouble(4) == rev.getDouble(4), s"$fwd vs $rev")
        }
      }
    }
  }
}
