package graft.llm

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("minhash-LSH pairs equal exact shingle-join pairs at J>=0.8") {
    val docs = Tables.documents(spark, sf)
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 3, 128, 32, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"LSH ${lsh.size} pairs vs exact ${exact.size}")
    assert(exact.nonEmpty, "testdata should contain planted near-duplicates")
  }

  test("containment finds subset docs that Jaccard misses") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val half = (1 to 20).map(i => s"w$i").mkString(" ") // strict prefix
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, half), (3L, other)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq == Seq((1L, 2L, 1.0)), cont.mkString(","))
    // the same pair is INVISIBLE to symmetric Jaccard at 0.8
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect()
    assert(jac.isEmpty, jac.mkString(","))
  }

  test("sorted-neighborhood: offset-zip ranks reproduce a global-window reference") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val sn = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text", 24, 3, 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // test-only reference: the single-partition global window the
    // operator deliberately avoids, same candidates + verify
    val ranked = docs.select(col("doc_id"),
        substring(Dedup.normalizeText(col("text")), 1, 24).as("k"),
        Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("rn", row_number().over(Window.orderBy(col("k"), col("doc_id"))))
    val ref = ranked.select(col("doc_id").as("ida"), col("sh").as("sha"), col("rn"))
      .join(ranked.select(col("doc_id").as("idb"), col("sh").as("shb"),
          col("rn").as("rnb")),
        col("rnb") - col("rn") >= 1 && col("rnb") - col("rn") <= 2)
      .select(least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"),
        Dedup.jaccard(col("sha"), col("shb")).as("j"))
      .filter(col("j") >= 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sn == ref, s"SN ${sn.size} pairs vs window reference ${ref.size}")
  }

  test("sorted-neighborhood finds tail-edited near-dups adjacent by prefix") {
    import spark.implicits._
    val body = (1 to 40).map(i => s"word$i").mkString(" ")
    val tailEdit = (1 to 39).map(i => s"word$i").mkString(" ") + " changed"
    val other = (200 to 240).map(i => s"word$i").mkString(" ")
    val docs = Seq((1L, body), (2L, tailEdit), (3L, other)).toDF("doc_id", "text")
    val sn = Dedup.sortedNeighborhoodPairs(docs, "doc_id", "text", 24, 3, 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sn == Set((1L, 2L)), sn.mkString(","))
  }

  test("prefix-filter pairs equal brute-force shingle Jaccard (no blocking misses)") {
    val docs = Tables.documents(spark, sf)
    val pf = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over ALL pairs: the prefix-filter lemma says nothing may be missed
    val sets = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("s"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
      .filter(_._2.nonEmpty)
    val brute = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.8
    } yield (ia, ib)).toSet
    assert(pf == brute, s"prefix-filter ${pf.size} pairs vs brute ${brute.size}")
    assert(pf.nonEmpty, "testdata should contain planted near-duplicates")
  }

  test("prefix-length ceil stays exact-rational-consistent across the token-count tail") {
    // The prefix bound `n − ⌈t·n − ε⌉ + 1` (ε = 1e-9) runs as a DOUBLE
    // expression in Spark AND in the DuckDB oracle. The superset
    // guarantee needs it to equal the exact-rational `n − ⌈t·n⌉ + 1`
    // for EVERY document size n the corpus can produce: too short
    // voids the lemma (silently dropped true pairs), too long only
    // costs candidates. sf1.0 shingle counts reach the tens of
    // thousands; sweep far past that so the next scale step can't
    // surprise. ε is safe iff it never crosses an integer boundary —
    // i.e. frac(t·n) is never in (0, ~1e-9) — which holds for the
    // rational thresholds used (denominator ≤ 20 ⇒ frac ≥ 1/20).
    for ((tNum, tDen) <- Seq((4, 5), (7, 10), (9, 10), (1, 2), (17, 20))) {
      val t = tNum.toDouble / tDen
      var n = 1L
      while (n <= 2000000L) {
        val exact = n - (tNum * n + tDen - 1) / tDen + 1 // integer ⌈tNum·n/tDen⌉
        val asRun = n - math.ceil(t * n - 1e-9).toLong + 1
        assert(asRun == exact,
          s"ceil drift at n=$n t=$tNum/$tDen: double-form $asRun vs exact $exact")
        n += 1
      }
    }
  }

  test("exact fingerprint collapses case/whitespace variants") {
    import spark.implicits._
    val df = Seq("hello  world", "HELLO WORLD  ", "other doc").toDF("text")
      .select(Dedup.exactFingerprint(col("text")).as("f"))
    assert(df.distinct().count() == 2)
  }

  test("simhash: identical docs at distance 0, near-dups close, finds planted pair") {
    assert(Dedup.simhash64(Seq("a", "b", "c")) == Dedup.simhash64(Seq("a", "b", "c")))
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different content about spark query engines and shuffles"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDistance = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("minhash band keys are deterministic and order-insensitive over the shingle set") {
    Seq("a b c d e", "x y z w", "a b q", "q w e r t y u").foreach { t =>
      val sh = Dedup.shinglesImpl(t, 2)
      assert(Dedup.minhashBandsImpl(sh, 16, 4) == Dedup.minhashBandsImpl(sh, 16, 4))
      assert(Dedup.minhashBandsImpl(sh.reverse, 16, 4) == Dedup.minhashBandsImpl(sh, 16, 4))
    }
  }

  test("winnow sketch+cap pairs equal uncapped complete-blocking pairs at threshold 0.5") {
    // the production path (doc-freq cap 500 + 16-rarest sketch with
    // minShared=2) must return exactly the pairs of the uncapped,
    // complete shingle-join blocking — i.e. neither the cap nor the
    // sketch candidate generation loses (or invents) a pair on the
    // planted testdata clusters
    val docs = Tables.documents(spark, sf)
    def keyed = docs
      .select(col("doc_id").as("__id"),
        explode(TextAnalysis.winnowUdf(Dedup.normalizeText(col("text")), lit(7), lit(4))).as("fp"))
    val production =
      Dedup.winnowNearDupPairs(docs, "doc_id", "text", k = 7, w = 4, threshold = 0.5)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncappedExact =
      Dedup.jaccardPairsViaBlocking(keyed, "fp", 0.5, Int.MaxValue)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(production == uncappedExact,
      s"sketch+cap ${production.size} pairs vs uncapped exact ${uncappedExact.size}")
    assert(production.nonEmpty, "testdata should contain planted near-duplicates")
  }

  test("sketch short-doc guard: docs with a single fingerprint can still pair") {
    import spark.implicits._
    // byte-distinct near-identical short docs: both normalize to the
    // same 7-char string → exactly one winnow fingerprint each, below
    // the default minShared=2 — the per-pair floor min(minShared,
    // sketch sizes) must let them meet (Jaccard 1.0)
    val docs = Seq(
      (1L, "ABCDEFG"), (2L, "abcdefg  "), (3L, "zzzzzzzzzz different pad"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowNearDupPairs(docs, "doc_id", "text", k = 7, w = 4, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("winnow batched-digest path matches per-substring hashing incl. unicode") {
    // ASCII, multi-byte BMP (Vietnamese), and a supplementary char
    // (forces the surrogate fallback) must all hash identically to the
    // definitional per-substring md5.
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "cần tuyển kỹ sư phần mềm tại hà nội lương cao",
      "emoji 😀 inside the document text stream")
    texts.foreach { t =>
      val fast = TextAnalysis.winnow(t, 7, 4)
      val ref = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val n = t.length - 7 + 1
        val hs = (0 until n).map { i =>
          val d = md.digest(t.substring(i, i + 7).getBytes("UTF-8"))
          (0 until 8).foldLeft(0L)((h, b) => (h << 8) | (d(b) & 0xffL))
        }.toArray
        def lt(a: Long, b: Long) = java.lang.Long.compareUnsigned(a, b) < 0
        val out = scala.collection.mutable.LinkedHashSet[Long]()
        (0 to n - 4).foreach { s =>
          out += (s until s + 4).map(hs).reduce((a, b) => if (lt(b, a)) b else a)
        }
        out.toSeq
      }
      // the contract is the SET of selected fingerprints (consumers
      // explode + set-compare; the production path returns them sorted)
      assert(fast.toSet == ref.toSet && fast.length == fast.toSet.size,
        s"mismatch for: $t")
    }
  }

  test("winnowing fingerprints overlap heavily for near-identical docs") {
    val a = TextAnalysis.winnow("the quick brown fox jumps over the lazy dog", 5, 4).toSet
    val b = TextAnalysis.winnow("the quick brown fox jumps over the lazy cat", 5, 4).toSet
    val c = TextAnalysis.winnow("entirely unrelated text with other content!", 5, 4).toSet
    val simAb = a.intersect(b).size.toDouble / a.union(b).size
    val simAc = a.intersect(c).size.toDouble / a.union(c).size
    assert(simAb > 0.5 && simAc < 0.2, s"ab=$simAb ac=$simAc")
    assert(TextAnalysis.winnow(null, 5, 4).isEmpty)
  }

  test("connected components: chain needs multiple propagation rounds, components labeled by min id") {
    import spark.implicits._
    // 9→8→…→1 chain (diameter 8 exercises the loop), a 2-cycle-free
    // triangle sharing no nodes, and an isolated pair
    val chain = (1L to 8L).map(i => (i + 1, i))
    val edges = (chain ++ Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L)))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 9L).forall(cc(_) == 1L), s"chain labels: $cc")
    assert(Seq(20L, 21L, 22L).forall(cc(_) == 20L))
    assert(cc(30L) == 30L && cc(31L) == 30L)
    assert(cc.size == 14)
  }

  test("dedupCorpus keeps cluster minima and unpaired docs, drops the rest") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters {1,2,3} and {7,9}; 4,5,6,8,10 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupCorpus(docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L, 6L, 7L, 8L, 10L), kept.toString)
  }

  test("incremental dedup rejects batch docs matching the corpus, best match wins") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val corpus = Seq(
      (1L, base),                              // exact twin of new doc 100
      (2L, base + " okay"),                    // weaker match for 100
      (3L, "completely unrelated corpus text about catalyst optimizer rules and shuffles"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, base),                            // dup: best match id 1 at J=1.0
      (101L, "fresh unique content that matches nothing in the corpus at all today"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text",
        shingleN = 3, perms = 128, bands = 32, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((100L, 1L, 1.0)), out.mkString(", "))
  }

  test("incremental dedup equals the cross-split slice of all-pairs near-dups") {
    val docs = Tables.documents(spark, sf)
    val inc = Dedup.dedupAgainstCorpus(
        docs.filter(col("doc_id") % 5 === 0), docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", 3, 128, 32, 0.8)
      .select("new_id").collect().map(_.getLong(0)).toSet
    val all = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .filter { case (n, c) => n % 5 == 0 && c % 5 != 0 }.map(_._1).toSet
    assert(inc == all, s"incremental $inc vs all-pairs slice $all")
  }

  test("duplicateSpanStats: overlapping spans union, repeats extend coverage, gaps don't merge") {
    import spark.implicits._
    // docs 1 & 2 share "a b c d e f" (two overlapping dup 5-grams in
    // each: coverage 6, not 10); doc 3 shares nothing (coverage 0);
    // doc 4 repeats the shared gram TWICE with a gap — both
    // occurrences covered (5 + 5), proving repeated grams extend
    // coverage (the shingles-dedup bug this operator must not have)
    val docs = Seq(
      (1L, "a b c d e f x y z"),
      (2L, "q a b c d e f w"),
      (3L, "p q r s t u v"),
      (4L, "a b c d e u1 u2 u3 u4 u5 u6 a b c d e")).toDF("doc_id", "text")
    val got = Dedup.duplicateSpanStats(docs, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc1: grams at 0..4; dup grams "a b c d e"(0), "b c d e f"(1)
    //       -> union [0,6) = 6 of 9 tokens
    assert(got(1L) == (9L, 6L), s"doc1 ${got(1L)}")
    // doc2: same two grams at pos 1,2 -> 6 of 8
    assert(got(2L) == (8L, 6L), s"doc2 ${got(2L)}")
    assert(got(3L) == (7L, 0L), s"doc3 ${got(3L)}")
    // doc4: "a b c d e" at pos 0 and pos 11 -> 5 + 5 = 10 of 16
    assert(got(4L) == (16L, 10L), s"doc4 ${got(4L)}")
  }

  test("duplicateSpans: parity with duplicateSpanStats (the executable spec)") {
    // the fingerprint path must measure EXACTLY the coverage union the
    // gram-string form measures: per doc, sum of maximal span lengths
    // (minSpan = n keeps every island) == duplicateSpanStats.covered —
    // on real data, not a toy (sf0.001 has planted exact duplicates)
    val docs = Tables.documents(spark, sf)
    val n = 5
    val spec = Dedup.duplicateSpanStats(docs, "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fast = Dedup.duplicateSpans(docs, "doc_id", "text", n, minSpan = n)
      .groupBy("doc_id").agg(sum("span_len").as("cov"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc with coverage > 0 must match; docs absent from the
    // span frame have coverage 0 in the spec
    spec.foreach { case (id, cov) =>
      assert(fast.getOrElse(id, 0L) == cov, s"doc $id: fast=${fast.get(id)} spec=$cov")
    }
    assert(fast.keySet.subsetOf(spec.filter(_._2 > 0).keySet), "span for a zero-coverage doc")
    assert(spec.values.sum > 0, "testdata should contain planted duplicates")
  }

  test("duplicateSpans: islands break on gaps, minSpan filters short runs") {
    import spark.implicits._
    // docs 1 & 2 share two regions: "a b c d e f g" (7 tokens -> one
    // span of 7) and, after a gap, "p q r s t" (5 tokens -> span of 5)
    val docs = Seq(
      (1L, "a b c d e f g x1 x2 x3 p q r s t"),
      (2L, "a b c d e f g y1 y2 y3 p q r s t"),
      (3L, "z1 z2 z3 z4 z5 z6 z7")).toDF("doc_id", "text")
    val all = Dedup.duplicateSpans(docs, "doc_id", "text", n = 5, minSpan = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all == Set((1L, 0L, 7L), (1L, 10L, 5L), (2L, 0L, 7L), (2L, 10L, 5L)), all)
    // minSpan = 6 drops the 5-token spans but keeps the 7s
    val cut = Dedup.duplicateSpans(docs, "doc_id", "text", n = 5, minSpan = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cut == Set((1L, 0L, 7L), (2L, 0L, 7L)), cut)
    // API boundary: minSpan below the seed length is a caller bug
    intercept[IllegalArgumentException] {
      Dedup.duplicateSpans(docs, "doc_id", "text", n = 5, minSpan = 4)
    }
  }

  test("semDedup keeps the far-from-centroid member of a duplicate pair") {
    import spark.implicits._
    // k=1, iters=1: one cluster whose centroid is the fixed md5 init —
    // replicate it here to decide which pair member is the "edge" copy
    val cent = Similarity.centroids(4, 1)(0)
    def d2(v: Seq[Double]) =
      v.zip(cent).map { case (x, c) => (x - c) * (x - c) }.sum
    val a = Seq(1f, 0f, 0f, 0f); val b = Seq(3f, 0f, 0f, 0f) // cos = 1.0
    val o = Seq(0f, 5f, 0f, 0f) // orthogonal to both
    val vecs = Seq((1L, a), (2L, b), (3L, o), (10L, o), (11L, o))
      .toDF("vec_id", "embedding")
    val got = Dedup.semDedup(vecs, "vec_id", "embedding",
        k = 1, iters = 1, tau = 0.95, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val farOf12 = if (d2(a.map(_.toDouble)) > d2(b.map(_.toDouble))) 1L else 2L
    assert(got(farOf12) == 1 && got(3L - farOf12) == 0, got.toString)
    // 3/10/11 are identical: distance ties drop the higher ids
    assert(got(3L) == 1 && got(10L) == 0 && got(11L) == 0, got.toString)
  }
}
