package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.load(spark, sf, "documents")

  test("exact dedup keeps one survivor per fingerprint and drops the rest") {
    val withDups = docs.select($"doc_id", $"text")
      .unionByName(docs.select(($"doc_id" + 100000).as("doc_id"), $"text"))
    val surviving = Dedup.exact(withDups, "doc_id", "text")
    assert(surviving.count() == docs.count())
    // survivors are the minimum ids (originals)
    assert(surviving.filter($"doc_id" >= 100000).count() == 0)
    val groups = Dedup.exactDupGroups(withDups, "doc_id", "text")
    assert(groups.filter($"n_docs" =!= 2).count() == 0)
  }

  test("minhash-LSH candidates achieve high recall of exact jaccard >= 0.9 pairs") {
    val subset = docs.filter($"doc_id" % 2 === 0)
    val exact = Dedup.ngramJaccardPairs(subset, "doc_id", "text", 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test corpus should contain near-dup pairs")
    // bands=4 is the production (gate) tuning; bands=8 the high-recall one
    for (bands <- Seq(4, 8)) {
      val found = Dedup.minHashNearDups(subset, "doc_id", "text",
          numHashes = 32, bands = bands, threshold = 0.9)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      // verification step makes found ⊆ exact; banding may miss some pairs
      assert(found.subsetOf(exact))
      val recall = found.size.toDouble / exact.size
      assert(recall >= 0.8,
        s"bands=$bands recall $recall too low (${found.size}/${exact.size})")
    }
  }

  test("scalar minhash signature == aggregate minhash signature, bit for bit") {
    graft.expressions.MinHashAgg.register(spark)
    val tokenSets = docs.select($"doc_id",
      graft.functions.TextFunctions.distinctTokens($"text").as("toks"))
    // the retired explode+aggregate pipeline, stated inline
    val viaAgg = tokenSets
      .select($"doc_id", explode($"toks").as("tok"))
      .withColumn("th", abs(xxhash64($"tok")))
      .groupBy("doc_id")
      .agg(graft.expressions.MinHashAgg.minhashSig($"th", 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val viaScalar = Dedup.signatureFromUnits(tokenSets, 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(viaScalar == viaAgg)
    // and the scalar path computes inside the scan: no Exchange at all
    val plan = Dedup.signatureFromUnits(tokenSets, 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signature plan shuffles:\n$plan")
  }

  test("minhash signature approximates jaccard") {
    val subset = docs.filter($"doc_id" < 60)
    val sigs = Dedup.minHashSignature(subset, "doc_id", "text", numHashes = 64)
    val sigMap = sigs.collect().map { r =>
      r.getLong(0) -> r.getSeq[Long](1).toVector
    }.toMap
    val exact = Dedup.ngramJaccardPairs(subset, "doc_id", "text", 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val errors = exact.toSeq.map { case ((i, j), jac) =>
      val est = sigMap(i).zip(sigMap(j)).count { case (a, b) => a == b } / 64.0
      math.abs(est - jac)
    }
    val meanErr = errors.sum / errors.size
    assert(meanErr < 0.15, s"mean |minhash - jaccard| = $meanErr")
  }

  test("connected components: chains, cliques and singletons-in-graph resolve") {
    // graph: chain 1-2-3, clique 10-11-12 (all pairs), bridge 3-10 joins them;
    // separate pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L),
      (20L, 21L))
      .toDF("id1", "id2")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 10L, 11L, 12L).forall(cc(_) == 1L),
      s"merged component should label to min id 1: $cc")
    assert(cc(20L) == 20L && cc(21L) == 20L)
  }

  test("connected components == driver union-find on random graphs (10 seeds)") {
    // randomized oracle for the pointer-jumping implementation: labels
    // must equal classic union-find's min-id components on every shape
    // random edge sets produce (long chains, stars, dense blobs, isolates)
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nNodes = 60 + rnd.nextInt(60)
      val nEdges = 30 + rnd.nextInt(120)
      val edges = Seq.fill(nEdges) {
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct

      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
      // component label = min node id = the root under min-keeping unions
      val expected = nodes.map(n => n -> find(n)).toMap

      // both strategies must agree with the oracle: the driver-local
      // union-find (default for small graphs) AND the distributed
      // pointer-jumping (forced via localThreshold = 0)
      val local = Dedup.connectedComponents(edges.toDF("id1", "id2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == expected,
        s"seed $seed local: ${local.toSet.diff(expected.toSet).take(5)} vs expected")
      val dist = Dedup.connectedComponents(
          edges.toDF("id1", "id2"), localThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == expected,
        s"seed $seed distributed: ${dist.toSet.diff(expected.toSet).take(5)} vs expected")
    }
  }

  test("dedupCorpusBy keeps the max-priority member per component, min id on ties") {
    val rows = Seq(
      (1L, 10.0), (2L, 30.0), (3L, 20.0),  // component {1,2,3}: 2 wins
      (4L, 5.0), (5L, 5.0),                // component {4,5}: tie -> 4
      (6L, 1.0))                           // unpaired: always kept
      .toDF("doc_id", "pri")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val kept = Dedup.dedupCorpusBy(rows, "doc_id", pairs, $"pri")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 6L))
    // min-id election remains the dedupCorpus default
    val minId = Dedup.dedupCorpus(rows, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(minId == Set(1L, 4L, 6L))
  }

  test("simhash: identical docs distance 0; near-dups closer than random pairs") {
    val sigs = Dedup.simHashSignature(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical token sets -> identical signature
    val selfPair = Dedup.simHashSignature(
      docs.select($"doc_id", $"text")
        .unionByName(docs.select(($"doc_id" + 100000).as("doc_id"), $"text")),
      "doc_id", "text")
    val both = selfPair.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.select("doc_id").as[Long].collect().foreach { id =>
      assert(both(id) == both(id + 100000))
    }
    // near-dup pairs (jaccard>=0.9) hamming < random-pair average hamming
    val near = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9)
      .select("id1", "id2").as[(Long, Long)].collect()
    if (near.nonEmpty) {
      def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
      val nearAvg = near.map { case (i, j) => ham(sigs(i), sigs(j)) }.sum.toDouble / near.length
      val ids = sigs.keys.toVector.sorted
      val randomAvg = (for (i <- ids.indices by 7; j <- (i + 1) until ids.size by 11)
        yield ham(sigs(ids(i)), sigs(ids(j)))).sum.toDouble /
        (for (i <- ids.indices by 7; j <- (i + 1) until ids.size by 11) yield 1).size
      assert(nearAvg < randomAvg,
        s"near-dup avg hamming $nearAvg should beat random $randomAvg")
    }
  }

  test("prefix-filtered jaccard join equals the unfiltered inverted index") {
    // the prefix filter must be LOSSLESS at any threshold: same pairs,
    // same jaccard values, on the real (templated, near-dup-rich) corpus
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val fast = Dedup.ngramJaccardPairs(docs, "doc_id", "text", t)
        .select("id1", "id2", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val naive = Dedup.ngramJaccardPairsNaive(docs, "doc_id", "text", t)
        .select("id1", "id2", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(fast === naive, s"prefix filter diverged at t=$t")
    }
  }

  // ------------------------------------- string hamming neighbors

  /** Driver-side exhaustive hamming ground truth. */
  private def exhaustiveHamming(
      rows: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Int)] =
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows
      if i1 < i2 && s1.length == s2.length
      d = s1.zip(s2).count { case (a, b) => a != b }
      if d <= maxDist
    } yield (i1, i2, d)).toSet

  test("stringHammingNeighbors: hand pairs at distance <= 1") {
    val rows = Seq(
      (1L, "abcdef"), (2L, "abcdeX"),   // dist 1 (last char)
      (3L, "Xbcdef"),                   // dist 1 to #1 (first char), 2 to #2
      (4L, "abcdef"),                   // dist 0 to #1
      (5L, "abcde"),                    // shorter: never matches
      (6L, "zzzzzz"))                   // far from everything
    val out = Dedup.stringHammingNeighbors(rows.toDF("id", "s"), "id", "s")
      .as[(Long, Long, Int)].collect().toSet
    assert(out === Set((1L, 2L, 1), (1L, 3L, 1), (1L, 4L, 0), (2L, 4L, 1),
      (3L, 4L, 1)))
  }

  test("stringHammingNeighbors: blocked equals exhaustive on a random corpus") {
    // random 8-char strings over a 3-letter alphabet: dense enough that
    // many pairs fall at distances 0..2, exercising both accept and cut
    val rnd = new scala.util.Random(42)
    val rows = (1L to 300L).map(i =>
      i -> Array.fill(8)(('a' + rnd.nextInt(3)).toChar).mkString)
    for (d <- Seq(1, 2)) {
      val got = Dedup.stringHammingNeighbors(rows.toDF("id", "s"), "id", "s", d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === exhaustiveHamming(rows, d),
        s"blocked result must equal the exhaustive join at maxDist=$d")
    }
  }

  test("stringHammingNeighbors: correct on the shared-constant-prefix shape") {
    // the id-corpus worst case for segment blocking: a long identical
    // prefix and variance only in the digit tail — deletion-neighborhood
    // keys must stay discriminative here
    val rows = (0L until 400L).map(i => i -> f"Customer#$i%09d")
    val got = Dedup.stringHammingNeighbors(rows.toDF("id", "s"), "id", "s", 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === exhaustiveHamming(rows, 1))
  }

  test("stringHammingNeighbors: unequal lengths never pair, result is layout-invariant") {
    val rows = (1L to 200L).map(i =>
      i -> ("x" * (i % 4).toInt + f"name$i%03d"))
    val df = rows.toDF("id", "s")
    val a = Dedup.stringHammingNeighbors(df.repartition(1), "id", "s", 2)
      .as[(Long, Long, Int)].collect().toSet
    val b = Dedup.stringHammingNeighbors(df.repartition(17), "id", "s", 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(a === b)
    assert(a === exhaustiveHamming(rows, 2))
  }

  test("empty and whitespace-only docs get no signature and flood no buckets") {
    val docs = (Seq((1L, "real content here"), (2L, "more real content here")) ++
      (10L to 60L).map(i => (i, if (i % 2 == 0) "" else "   ")))
      .toDF("doc_id", "text")
    val toks = docs.select($"doc_id",
      array_sort(graft.functions.TextFunctions.distinctTokens(lower($"text"))).as("toks"))
    val sigs = Dedup.signatureFromUnits(toks, 16)
    assert(sigs.count() === 2, "empty docs must not sign") // only the real docs
    // and the full pipeline emits zero candidate pairs among the empties
    val pairs = Dedup.minHashNearDups(docs, "doc_id", "text",
      numHashes = 16, bands = 4, threshold = 0.5)
    assert(pairs.filter($"id1" >= 10L).count() === 0)
  }
}
