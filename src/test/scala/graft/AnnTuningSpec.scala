package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Similarity

/** Recall-vs-cost evidence for the tunable ANN surfaces (SRP-LSH and
  * IVF): sweeps the knobs over a corpus of PLANTED near-neighbors on
  * the harness noise background, regenerates `ANN_TUNING.md` with the
  * measured curve, and pins the recall floor at the DEFAULT settings.
  *
  * The harness embedding table is isotropic noise (measured: same-label
  * and cross-label cosine distributions are identical, top-20 sims
  * ≈0.3), so exact-top-k recall there would grade the index on ranking
  * noise — a task no sublinear index can or should win. What the index
  * IS for is surfacing genuinely-near vectors (near-duplicates,
  * jittered copies); the benchmark therefore plants 10 near-copies
  * (cosine ≈0.98–0.92) of each probe query and measures the fraction
  * retrieved at k=20 vs the number of candidates scanned.
  * Deterministic end to end (seeded jitter, seeded hyperplanes,
  * deterministic IVF seed set), so the committed doc reproduces
  * byte-for-byte.
  */
class AnnTuningSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 20
  private val PlantsPerQuery = 10
  private val QueryIds = Seq(0L, 100L, 200L, 300L, 400L)

  /** Harness noise background + planted near-copies of each query.
    * The harness vectors are UNIT-norm, so the jitter direction is
    * normalized before scaling: plant j of query q is q + eps·u with
    * u a unit gaussian direction and eps ∈ [0.20, 0.40] — angle
    * ≈ atan(eps), cosine to the query ≈0.98 down to ≈0.93, the
    * near-duplicate range the index exists to surface. */
  private lazy val (corpus: DataFrame, planted: Map[Long, Set[Long]]) = {
    val base = Similarity.embTable(spark, sf)
    val qVecs = base.filter($"vec_id".isin(QueryIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val rnd = new scala.util.Random(13)
    val plants = for {
      (q, qi) <- QueryIds.zipWithIndex
      j <- 0 until PlantsPerQuery
      eps = 0.20 + 0.022 * j
    } yield {
      val g = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(g.map(x => x * x).sum)
      (10000L + qi * 100 + j, q,
        qVecs(q).zip(g).map { case (x, gi) => x + eps * gi / n })
    }
    val plantDf = plants.map { case (id, _, v) => (id, v.toSeq) }.toDF("vec_id", "v")
    (base.unionByName(plantDf).cache(),
      plants.groupBy(_._2).map { case (q, ps) => q -> ps.map(_._1).toSet })
  }
  private lazy val corpusSize: Long = corpus.count()

  /** Local mirror of the engines' ranking (sim desc, vec_id asc) over a
    * collected candidate set — one job per (config, query) yields both
    * the planted-neighbor recall and the candidate-count cost. */
  private def measure(cand: DataFrame, q: Long): (Double, Long) = {
    val rows = cand.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val topK = rows.sortBy { case (id, sim) => (-sim, id) }.take(K).map(_._1).toSet
    (topK.intersect(planted(q)).size.toDouble / PlantsPerQuery, rows.length.toLong)
  }

  private def sweepRow(label: String, mk: Long => DataFrame): (String, Double, Double) = {
    val perQuery = QueryIds.map(q => measure(mk(q), q))
    val recall = perQuery.map(_._1).sum / QueryIds.length
    val cands = perQuery.map(_._2).sum.toDouble / QueryIds.length
    (label, recall, cands)
  }

  test("recall-vs-cost curves regenerate ANN_TUNING.md; defaults clear the 0.9 floor") {
    // ground truth sanity: the exact scan retrieves every planted
    // neighbor — k has room for all 10 plants, so recall grades the
    // INDEX, not the metric
    QueryIds.foreach { q =>
      val brute = Similarity.bruteForceTopK(corpus, q, K)
        .collect().map(_.getLong(0)).toSet
      assert(planted(q).subsetOf(brute), s"query $q: exact scan missed a plant")
    }

    // bands at fixed 8-bit width (recall rises ~band-linearly, noise
    // admission only 2^-8 per band), plus width variants at 8 bands
    val lshConfigs = Seq((1, 8), (2, 8), (4, 8), (8, 8), (16, 8), (8, 12), (8, 4))
    val lsh = lshConfigs.map { case (b, w) =>
      sweepRow(s"$b×$w", Similarity.annScoredCandidates(corpus, _, b, w))
    }
    // train each model ONCE per config and share it across the sweep —
    // the engine pipelines do the same (one training serves every probe)
    val cents16 = Similarity.centroids(corpus, 16)
    val seedCents = Similarity.centroids(corpus, 16, refineIters = 0)
    val books = Similarity.pqCodebooks(corpus)
    val ivfProbes = Seq(1, 2, 4, 8, 16)
    val ivf = ivfProbes.map { p =>
      sweepRow(s"$p/16",
        Similarity.ivfScoredCandidates(corpus, _, 16, p, Some(cents16)))
    }
    // seeding comparison at the default probes: the k-means refinement
    // must not trade recall away, and the scan cost must not grow
    val ivfSeeded = sweepRow("4/16 raw seeds",
      Similarity.ivfScoredCandidates(corpus, _, 16, 4, Some(seedCents)))
    // IVF-PQ: same cell pruning, but the ADC pass over 8-byte codes
    // picks the exact-scored set — rerankFactor trades exact-scan size
    // against the chance the quantized ranking buries a true neighbor
    val pqFactors = Seq(1, 2, 4, 8)
    val pq = pqFactors.map { f =>
      sweepRow(s"${f}×k", Similarity.ivfPqRerankSet(corpus, _, K,
        rerankFactor = f, cents = Some(cents16), books = Some(books)))
    }

    def fmt(rows: Seq[(String, Double, Double)], knob: String): String =
      (s"| $knob | planted recall@$K | candidates scanned | corpus fraction |\n" +
        "|---|---|---|---|\n") +
        rows.map { case (l, r, c) =>
          f"| $l | $r%.2f | $c%.0f | ${c / corpusSize}%.2f |"
        }.mkString("\n")

    // tables are concatenated OUTSIDE the template: stripMargin would
    // otherwise eat each table row's leading | as a margin marker
    val doc =
      s"""# ANN tunability — recall vs cost
         |
         |Generated by `AnnTuningSpec`, deterministic end to end (seeded
         |jitter, seeded hyperplanes, deterministic IVF seed set). Corpus:
         |the ${corpusSize - QueryIds.length * PlantsPerQuery}-vector harness
         |noise background plus $PlantsPerQuery planted near-copies
         |(cosine ≈0.98–0.93) of each probe query; mean over queries
         |${QueryIds.mkString("{", ", ", "}")}. Recall = fraction of a
         |query's planted near-neighbors retrieved at k=$K by the index;
         |"candidates scanned" is the size of the scored set the knob
         |admits — the cost that stays sublinear at 100 TB while the
         |final ranking is fixed at top-$K. (Exact-top-k recall on the raw
         |harness table is not reported: that table is isotropic noise —
         |same-label and cross-label cosine distributions are identical —
         |so it has no near-neighbor structure for an index to find.)
         |
         |## SRP-LSH (`annTopK`) — knob: bands × bits/band
         |
         |More bands raise recall (a neighbor need match only ONE band)
         |at ~2^-bits extra noise admission per band; narrower bands
         |admit more noise per band. Defaults: 8×8 (the 64-bit SRP
         |signature).
         |
         |""".stripMargin + fmt(lsh, "bands×bits") +
      s"""
         |
         |## IVF (`ivfTopK`) — knob: nProbe of 16 cells
         |
         |Each probed cell adds its members to the scan. Defaults: 4/16.
         |Centroids are k-means refined (2 distributed Lloyd iterations
         |over the deterministic seed set — `kmeansRefine`); the row
         |below the sweep shows the same default config on the RAW
         |seeds, the pre-training behavior.
         |
         |""".stripMargin + fmt(ivf :+ ivfSeeded, "probes") +
      s"""
         |
         |## IVF-PQ (`ivfPqTopK`) — knob: exact-rerank factor
         |
         |Same cell pruning as IVF, but candidates are ranked by ADC
         |over their 8-byte PQ codes (8 subspaces × 16 codewords — ~32×
         |smaller than the raw vectors) and only the top rerankFactor·k
         |get exact cosines. "Candidates scanned" here = the EXACT-scored
         |rerank set; the ADC pass reads only codes. Defaults: 4×k.
         |
         |""".stripMargin + fmt(pq, "rerank") + "\n"

    java.nio.file.Files.writeString(java.nio.file.Paths.get("ANN_TUNING.md"), doc)

    val lshDefault = lsh.find(_._1 == "8×8").get
    val ivfDefault = ivf.find(_._1 == "4/16").get
    val pqDefault = pq.find(_._1 == "4×k").get
    // refinement must pay for itself: recall at the default config at
    // least the seeded baseline's, without growing the scanned set
    assert(ivfDefault._2 >= ivfSeeded._2,
      s"refined recall ${ivfDefault._2} below seeded ${ivfSeeded._2}")
    assert(ivfDefault._3 <= ivfSeeded._3,
      s"refined scan ${ivfDefault._3} larger than seeded ${ivfSeeded._3}")
    assert(lshDefault._2 >= 0.9,
      s"LSH default recall ${lshDefault._2} below 0.9 floor\n$doc")
    assert(ivfDefault._2 >= 0.9,
      s"IVF default recall ${ivfDefault._2} below 0.9 floor\n$doc")
    assert(pqDefault._2 >= 0.9,
      s"IVF-PQ default recall ${pqDefault._2} below 0.9 floor\n$doc")
    // the knob must actually move cost: the strictest config scans
    // fewer candidates than the loosest
    assert(lsh.head._3 < lsh.last._3)
    assert(ivf.head._3 < ivf.last._3)
    assert(pq.head._3 < pq.last._3)
    // and the PQ rerank set must be strictly smaller than the IVF
    // exact-scan it replaces at the same probes — that is the point
    assert(pqDefault._3 < ivfDefault._3,
      s"PQ rerank set ${pqDefault._3} not smaller than IVF scan ${ivfDefault._3}")
  }

  test("k-means training is deterministic run to run") {
    // two INDEPENDENT trainings (separate lineages, separate
    // localCheckpoints) must produce identical models — the property
    // the committed ANN_TUNING.md's byte-stability rests on
    def cents(): Seq[(Long, Seq[Double])] =
      Similarity.centroids(corpus, 16).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).sortBy(_._1).toSeq
    val (c1, c2) = (cents(), cents())
    assert(c1 == c2, "IVF centroid training not deterministic")
    // and the training moved the centroids off the raw seeds
    val seeds = Similarity.centroids(corpus, 16, refineIters = 0).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).sortBy(_._1).toSeq
    assert(c1 != seeds, "refinement was a no-op on the training corpus")
    def books(): Seq[(Int, Int, Seq[Double])] =
      Similarity.pqCodebooks(corpus).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
        .sortBy(t => (t._2, t._1)).toSeq
    assert(books() == books(), "PQ codebook training not deterministic")
  }

  test("knn join: batch equals single probes; IVF at full probes equals exact; plants surface") {
    val qs = corpus.filter($"vec_id".isin(QueryIds: _*))
    val exact = Similarity.knnJoin(corpus, qs, K).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // batch form ≡ N single probes: same neighbor SET and same ranked
    // similarity sequence per query (id order among exact rounding
    // ties may differ — bruteForceTopK ranks on the rounded value to
    // match its own oracle, knnJoin on the raw)
    QueryIds.foreach { q =>
      val single = Similarity.bruteForceTopK(corpus, q, K).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      val batch = exact.filter(_._1 == q).sortBy(_._4)
      assert(batch.map(_._2).toSet == single.map(_._1).toSet,
        s"query $q: batch knn ids != single-probe ids")
      assert(batch.map(_._3).toSeq == single.map(_._2).toSeq,
        s"query $q: ranked similarity sequences differ")
    }
    // IVF with EVERY cell probed degrades to the exact join, row for row
    val cents = Similarity.centroids(corpus, 16)
    val full = Similarity.knnJoinIvf(corpus, qs, K, 16, 16, Some(cents))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(full.sorted.toSeq == exact.sorted.toSeq,
      "full-probe IVF knn join != exact knn join")
    // and at the DEFAULT probes every planted near-neighbor surfaces
    val dflt = Similarity.knnJoinIvf(corpus, qs, K, 16, 4, Some(cents))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    QueryIds.foreach { q =>
      assert(planted(q).subsetOf(dflt(q)),
        s"query $q: plants missing at default probes")
    }
  }

  test("pqAdcScores: duplicate candidate ids cannot skew the ADC scores") {
    // `within` is a SET contract enforced by a semi join: an inner join
    // would multiply a duplicated id's code rows, scaling Σqdot and
    // Σcw2 by the multiplicity and inflating asim by √multiplicity
    val emb = Similarity.embTable(spark, sf)
    val uniq = Seq(1L, 2L, 3L, 7L, 11L).toDF("vec_id")
    val dup = uniq.unionAll(Seq(3L, 3L, 7L).toDF("vec_id"))
    def scored(ids: DataFrame): Seq[(Long, Double)] =
      Similarity.pqAdcScores(emb, 0L, within = Some(ids))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val (u, d) = (scored(uniq), scored(dup))
    assert(u.map(_._1) == Seq(1L, 2L, 3L, 7L, 11L))
    assert(u == d, s"duplicated candidates changed ADC scores:\n  uniq=$u\n  dup =$d")
  }
}
