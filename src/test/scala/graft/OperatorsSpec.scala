package graft

import core.VecOps
import operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness of the training-data operators (dedup / ANN / multimodal)
  * that have no SQL-expressible DuckDB oracle — each is checked against a
  * plain-Scala computation or an invariance property.
  */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Fixture docs + planted duplicates: every doc_id < 20 is duplicated at
    * doc_id+100000 (exact) and every doc_id < 10 near-duplicated at
    * doc_id+200000 (one word appended — high but non-1.0 Jaccard).
    */
  private def docs = {
    val base = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    base
      .unionByName(base.filter(col("doc_id") < 20)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .unionByName(base.filter(col("doc_id") < 10)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text")))
  }
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("minhash-LSH finds every exact-duplicate pair with jaccard 1.0") {
    val dupPairs = docs.groupBy("text")
      .agg(sort_array(collect_list("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .collect()
      .flatMap { r =>
        val ids = r.getSeq[Long](1)
        for { i <- ids.indices; j <- (i + 1) until ids.length } yield (ids(i), ids(j))
      }.toSet
    info(s"${dupPairs.size} exact-dup pairs in fixture")
    val found = Dedup.nearDuplicates(docs, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dupPairs.subsetOf(found),
      s"missing: ${(dupPairs -- found).take(5)}")
  }

  test("minhash-LSH finds the planted near-duplicates (suffix-mutated)") {
    val found = Dedup.nearDuplicates(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = (0L until 10L).map(i => (i, i + 200000L)).filterNot(found.contains)
    assert(missing.isEmpty, s"missing near-dup pairs: $missing")
  }

  test("incremental dedup: bloom prefilter + confirm equals a plain anti-join") {
    val history = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    // incoming: re-crawls of history (same text, new ids) + genuinely new
    val incoming = history.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 500000).as("doc_id"), col("text"))
      .unionByName(history.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 600000).as("doc_id"),
          concat(col("text"), lit(" rev2")).as("text")))
    val got = Dedup.incrementalNew(history, incoming, expectedItems = 10000)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val want = incoming.join(history.select("text"), Seq("text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want))
    assert(got.nonEmpty && got.forall(_ >= 600000L),
      "only the revised docs are new")
  }

  test("incremental dedup: the bloom prunes the confirm join's input") {
    val history = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val incoming = history
      .select((col("doc_id") + 500000).as("doc_id"), col("text")) // all dups
      .unionByName(history
        .select((col("doc_id") + 600000).as("doc_id"),
          concat(col("text"), lit(" rev2")).as("text"))) // all new
    val bloom = Dedup.historyBloom(history, expectedItems = 10000, fpp = 0.01)
    val hashes = incoming.select(xxhash64(col("text")).as("h"), col("doc_id"))
      .collect()
    val claimed = hashes.count(r => bloom.mightContainLong(r.getLong(0)))
    val dups = hashes.count(_.getLong(1) < 600000L)
    info(s"bloom claims $claimed of ${hashes.length} (true dups: $dups)")
    // every true duplicate is claimed (no false negatives possible), and
    // false positives stay within ~3x the configured 1% fpp
    assert(claimed >= dups)
    assert(claimed - dups <= math.max(5, (hashes.length - dups) * 3 / 100),
      s"false-positive rate far above configured fpp: ${claimed - dups}")
  }

  test("incremental dedup edge cases: empty history, empty incoming") {
    val all = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val none = all.filter(lit(false))
    // empty history: everything is new (the bloom claims nothing)
    assert(Dedup.incrementalNew(none, all, expectedItems = 100).count()
      == all.count())
    // empty incoming: nothing to emit
    assert(Dedup.incrementalNew(all, none, expectedItems = 10000).count() == 0)
  }

  test("incremental dedup: history is semi-pruned on the hash before any shuffle touches its text") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val history = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
      val incoming = history
        .select((col("doc_id") + 500000).as("doc_id"), col("text"))
      val out = Dedup.incrementalNew(history, incoming, expectedItems = 10000)
      val plan = out.queryExecution.executedPlan
      val semis = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(semis.nonEmpty, s"no broadcast LEFT SEMI prune in plan:\n$plan")
      val semi = semis.head
      // the streamed (history) side must reach its parquet scan with ZERO
      // exchange below the prune — the scale invariant: the 100 TB side
      // never shuffles, only the hash-matched sliver after the semi does
      val shufflesBelow = semi.left.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      assert(shufflesBelow.isEmpty,
        s"history side shuffles before the semi prune:\n${semi.left}")
      // and the prune keys on the 8-byte hash, never the text column
      assert(semi.leftKeys.forall(k => !k.toString.contains("text")),
        s"semi prune keyed on text: ${semi.leftKeys}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("bloom persistence: write/read round-trip and cross-batch merge") {
    val all = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val batch1 = all.filter(col("doc_id") % 2 === 0)
    val batch2 = all.filter(col("doc_id") % 2 === 1)
    def hashes(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.select(xxhash64(col("text")).as("h")).collect().map(_.getLong(0))
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    val path = s"$dir/history.bloom"
    val b1 = Dedup.historyBloom(batch1, expectedItems = 10000)
    Dedup.writeBloom(b1, path)
    val r1 = Dedup.readBloom(path)
    assert(hashes(batch1).forall(r1.mightContainLong),
      "round-tripped bloom lost batch-1 keys")
    // merge batch 2 into the persisted state and round-trip again
    Dedup.writeBloom(
      Dedup.mergeBlooms(r1, Dedup.historyBloom(batch2, expectedItems = 10000)),
      path)
    val merged = Dedup.readBloom(path)
    assert(hashes(batch1).forall(merged.mightContainLong)
      && hashes(batch2).forall(merged.mightContainLong),
      "merged bloom lost keys from one batch")
  }

  test("incremental dedup two-batch flow: persisted bloom replaces the history bloom scan") {
    val all = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom2").toString
    val path = s"$dir/history.bloom"
    // batch 1 lands on an empty corpus: everything is new; its bloom is
    // persisted as the carried state
    val batch1 = all.filter(col("doc_id") < 300)
    Dedup.writeBloom(Dedup.historyBloom(batch1, expectedItems = 10000), path)
    // batch 2 = re-crawls of batch 1 + genuinely new rows; the check runs
    // off the PERSISTED bloom — no bloom-build scan of history
    val batch2 = batch1.filter(col("doc_id") < 50)
      .select((col("doc_id") + 700000).as("doc_id"), col("text"))
      .unionByName(all.filter(col("doc_id") >= 300 && col("doc_id") < 400)
        .select((col("doc_id") + 800000).as("doc_id"),
          concat(col("text"), lit(" fresh")).as("text")))
    val got = Dedup.incrementalNewWithBloom(Dedup.readBloom(path), batch1, batch2)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val want = batch2.join(batch1.select("text"), Seq("text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want))
    assert(got.nonEmpty && got.forall(_ >= 800000L), "only the fresh docs are new")
  }

  test("connected components: transitivity, chains, and a union-find oracle") {
    import spark.implicits._
    // hand graph: a 5-chain (diameter 4 — exercises multi-round
    // propagation), two isolated pairs, one duplicate edge
    val hand = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L), (21L, 20L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(hand)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))

    // the iteration cap fails LOUDLY when the graph can't converge in the
    // allotted rounds — a silent partial labeling would merge some
    // clusters and not others (one round can never settle a 7-chain even
    // with the pointer shortcut)
    val deep = (0L until 6L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(deep, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("not converged"))

    // real candidate pairs vs a plain-Scala union-find on the same edges
    val cand = Dedup.minhashCandidates(docs).cache()
    try {
      val es = cand.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(es.nonEmpty)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val vertices = es.flatMap(e => Seq(e._1, e._2)).distinct
      val want = vertices.map(v => v -> find(v)).toMap
      val spark_ = Dedup.connectedComponents(cand)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(spark_ == want)
    } finally cand.unpersist()
  }

  test("connected components: pointer shortcut contracts a deep chain to ~log rounds") {
    import spark.implicits._
    // a 256-deep chain has diameter 255 — plain hash-min label propagation
    // needs 255 rounds; the label(label(v)) shortcut must land well under
    // the default 20-round cap (~log2(255) + propagation slack)
    val chain = (0L until 255L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsRounds(chain, maxIter = 20)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 256 && got.forall(_._2 == 0L),
      "chain must collapse into one component rooted at 0")
    info(s"256-vertex chain converged in $rounds rounds")
    assert(rounds <= 12, s"shortcut regressed: $rounds rounds for a 256-chain")
  }

  test("incremental dedup forced shuffled fallback == broadcast path == plain anti-join") {
    val history = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val incoming = history.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 500000).as("doc_id"), col("text"))
      .unionByName(history.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 600000).as("doc_id"),
          concat(col("text"), lit(" rev2")).as("text")))
    def ids(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).sorted
    // maxBroadcastSuspects = 0 forces the shuffled LEFT SEMI prune (the
    // dup-heavy re-crawl strategy); the output must be row-identical to
    // the broadcast path and to a plain text anti-join
    val forced = Dedup.incrementalNew(history, incoming,
      expectedItems = 10000, maxBroadcastSuspects = 0L)
    val bcast = Dedup.incrementalNew(history, incoming, expectedItems = 10000)
    val want = ids(incoming.join(history.select("text"), Seq("text"), "left_anti"))
    assert(ids(forced).sameElements(want))
    assert(ids(bcast).sameElements(want))
    // and the forced plan really is shuffled: no broadcast LEFT SEMI
    // (AQE off so the static plan is inspectable and un-rewritten)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Dedup.incrementalNew(history, incoming,
        expectedItems = 10000, maxBroadcastSuspects = 0L)
        .queryExecution.executedPlan
      val bSemis = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(bSemis.isEmpty, s"fallback still broadcasts the semi prune:\n$plan")
      val sSemis = plan.collect {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
      }
      assert(sSemis.nonEmpty, s"no shuffled LEFT SEMI in fallback plan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("hashed-history confirm == bloom confirm == plain anti-join, with IN pushdown") {
    val history = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val incoming = history.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 500000).as("doc_id"), col("text"))
      .unionByName(history.filter(col("doc_id") % 3 === 1)
        .select((col("doc_id") + 600000).as("doc_id"),
          concat(col("text"), lit(" rev2")).as("text")))
    // persist the hash column with the history table, as the streaming
    // sink does
    val dir = java.nio.file.Files.createTempDirectory("graft-hashed").toString
    Dedup.withTextHash(history).write.parquet(s"$dir/hist")
    val hist = spark.read.parquet(s"$dir/hist")
    val bloom = Dedup.historyBloom(history, expectedItems = 10000)
    val got = Dedup.incrementalNewHashed(bloom, hist, incoming)
    val want = incoming.join(history.select("text"), Seq("text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(want))
    // the text-bearing history scan carries the matched hashes as a
    // pushed IN(_h) filter — parquet can skip text IO for non-matching
    // row groups; no scan recomputes xxhash64 over history text
    val txt = got.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(txt.contains("PushedFilters") && txt.contains("In(_h"),
      s"no IN(_h) pushdown in:\n$txt")
  }

  test("hashed-history confirm: zero hash matches ⇒ history (and its text) never read") {
    import spark.implicits._
    val history = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(100)
    val dir = java.nio.file.Files.createTempDirectory("graft-hashed0").toString
    Dedup.withTextHash(history).write.parquet(s"$dir/hist")
    val hist = spark.read.parquet(s"$dir/hist")
    // an over-claiming bloom (the crash-window state): it claims texts the
    // history table does NOT contain, so every claimed row is a suspect
    // whose phase-1 probe finds no hash match
    val future = Seq("graft zzz one", "graft zzz two").toDF("text")
    val bloom = Dedup.mergeBlooms(
      Dedup.historyBloom(hist.select("text"), expectedItems = 10000),
      Dedup.historyBloom(future, expectedItems = 10000))
    val incoming = Seq((1L, "graft zzz one"), (2L, "graft zzz two"))
      .toDF("doc_id", "text")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Dedup.incrementalNewHashed(bloom, hist, incoming)
      assert(out.collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L)),
        "bloom-claimed but unmatched rows are new")
      // matched set was empty ⇒ the confirm branch dropped history
      // entirely: the final plan contains NO file scan at all (incoming
      // is in-memory), so the text column was provably never read
      val scans = out.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.isEmpty,
        s"history scanned despite zero hash matches:\n${scans.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("IVF index write/read round-trip: persisted index answers identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val built = Similarity.buildIvfIndex(spark, emb, c = 16, persist = false)
    Similarity.writeIvfIndex(built, s"$dir/ivf")
    val back = Similarity.readIvfIndex(spark, s"$dir/ivf")
    assert(back.centroids.map(_._1).sameElements(built.centroids.map(_._1)))
    assert(back.centroids.zip(built.centroids).forall {
      case ((_, a), (_, b)) => a.sameElements(b)
    }, "centroid sidecar round-trip changed values")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val q = emb.filter(col("vec_id") < 10)
    assert(rows(Similarity.queryIvf(back, q, 5))
      .sameElements(rows(Similarity.queryIvf(built, q, 5))),
      "read-back index must answer identically to the in-memory one")
    // the production layout promise: the assignment is cid-partitioned on disk
    val sub = new java.io.File(s"$dir/ivf/assigned").listFiles()
    assert(sub != null && sub.exists(f => f.isDirectory && f.getName.startsWith("cid=")),
      "assignment table is not partitioned by cid")
  }

  test("dropNearDuplicates keeps one canonical per cluster and all unpaired docs") {
    val kept = Dedup.dropNearDuplicates(docs, 0.5).cache()
    try {
      val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
      // the planted clones (doc_id+100000 exact, doc_id+200000 near) can
      // never be their cluster's min id, so none survives; their originals
      // may themselves duplicate an earlier base doc, so the survivor of
      // each cluster is only guaranteed to be SOME member, checked below
      (0L until 20L).foreach { i =>
        assert(!keptIds.contains(i + 100000), s"exact clone of $i survived")
      }
      (0L until 10L).foreach { i =>
        assert(!keptIds.contains(i + 200000), s"near clone of $i survived")
      }
      // the survivors contain NO near-dup pair at the same tau (two
      // canonical docs with a pair between them would share a component);
      // deterministic signatures make re-detection a subset of the
      // original pairs at this (uncapped) fixture scale
      assert(Dedup.nearDuplicates(kept.select("doc_id", "text"), 0.5).count() == 0)
      // unpaired docs all survive: kept = all - losers
      val losers = Dedup.connectedComponents(
        Dedup.nearDuplicates(docs, 0.5).select("doc_a", "doc_b"))
        .filter(col("doc_id") =!= col("component")).count()
      assert(kept.count() == docs.count() - losers)
    } finally kept.unpersist()
  }

  test("incrementalNewNear == dropNearDuplicates(history ∪ batch) restricted to the batch (monotone ids)") {
    val base = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    // history honors the operator's precondition: it is the accepted
    // output of the same near-dedup at the same tau. Batch ids are all
    // GREATER than history ids (the natural monotone-id ingest) — the
    // regime where history-wins canonicalization coincides with the
    // full-recompute min-id oracle (a mixed component's min id is
    // necessarily a history doc).
    val history = Dedup.dropNearDuplicates(
      base.filter(col("doc_id") % 4 =!= 0), 0.8).localCheckpoint(true)
    val batch = base.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      .unionByName(history.filter(col("doc_id") < 40)
        .select((col("doc_id") + 3000000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text")))
      .localCheckpoint(true)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = ids(Dedup.incrementalNewNear(
      Dedup.bandIndexFor(history), history, batch, 0.8))
    val batchIds = ids(batch).toSet
    val want = ids(Dedup.dropNearDuplicates(history.unionByName(batch), 0.8))
      .filter(batchIds)
    assert(got == want, s"${got.size} vs ${want.size} survivors")
    // the planted near-clones of history docs are all rejected (their
    // history original is always its component's min id)
    assert(got.forall(_ < 3000000L), "a planted near-clone of history survived")
    assert(batchIds.exists(_ >= 3000000L) && got.size < batchIds.size,
      "removal never fired — the planted clones should be dropped")

    // persisted-index round trip: write, read back, identical survivors
    val dir = java.nio.file.Files.createTempDirectory("graft-band").toString
    Dedup.writeBandIndex(history, s"$dir/band", mode = "overwrite")
    val got2 = ids(Dedup.incrementalNewNear(
      Dedup.readBandIndex(spark, s"$dir/band"), history, batch, 0.8))
    assert(got2 == got, "read-back band index must answer identically")

    // the per-batch append flow: accept the survivors, append exactly
    // their keys, and a second batch must again equal the full recompute
    val accepted = batch
      .filter(col("doc_id").isin(got.map(Long.box): _*))
      .localCheckpoint(true)
    Dedup.writeBandIndex(accepted, s"$dir/band") // append
    val history2 = history.unionByName(accepted)
    val batch2 = accepted.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 4000000).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"))
      .localCheckpoint(true)
    val got3 = ids(Dedup.incrementalNewNear(
      Dedup.readBandIndex(spark, s"$dir/band"), history2, batch2, 0.8))
    val batch2Ids = ids(batch2).toSet
    val want3 = ids(Dedup.dropNearDuplicates(history2.unionByName(batch2), 0.8))
      .filter(batch2Ids)
    assert(got3 == want3)
    assert(got3.size < batch2Ids.size,
      "second-batch near-clones of accepted docs must be rejected")
  }

  test("incrementalNewNear interleaved ids == the independent history-wins reference") {
    // batch ids interleaved below/among history ids (the driver fixture's
    // shape): the result must match a reference that computes the FULL
    // pair graph over history ∪ batch and applies history-wins — every
    // batch doc in a component touching history drops, batch-only
    // components keep their min id. (Under the precondition there are no
    // history-history verified edges, so the full graph and the probed
    // graph have identical components.)
    val base = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val history = Dedup.dropNearDuplicates(
      base.filter(col("doc_id") % 4 =!= 0), 0.8).localCheckpoint(true)
    // planted near-clones of history docs at NEGATIVE ids: guaranteed
    // smaller than every history id, so the components they join have a
    // batch min — exactly where min-id and history-wins disagree
    val batch = base.filter(col("doc_id") % 4 === 0)
      .unionByName(history.filter(col("doc_id") < 40)
        .select((-col("doc_id") - 1).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text")))
      .localCheckpoint(true)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = ids(Dedup.incrementalNewNear(
      Dedup.bandIndexFor(history), history, batch, 0.8))
    val batchIds = ids(batch).toSet
    val histIds = ids(history).toSet
    val comp = Dedup.connectedComponents(
      Dedup.nearDuplicates(history.unionByName(batch), 0.8)
        .select("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byComp = comp.groupBy(_._2).values
    val losers = byComp.flatMap { members =>
      val ms = members.map(_._1)
      val batchMs = ms.filter(batchIds)
      if (ms.exists(histIds)) batchMs // history-wins: all batch members drop
      else batchMs.filterNot(_ == batchMs.min) // batch-only: keep min id
    }.toSet
    val want = ids(batch).filterNot(losers)
    assert(got == want, s"${got.size} vs ${want.size} survivors")
    // the fixture must actually exercise the history-wins branch: a mixed
    // component whose MIN id is a batch doc (where min-id canonicalization
    // would have kept the batch doc and poisoned history)
    assert(byComp.exists { members =>
      val ms = members.map(_._1)
      ms.exists(histIds) && batchIds(ms.min)
    }, "no mixed component with a batch min id — the branch never fired")
    assert(got.forall(_ >= 0), "a planted smaller-id near-clone survived")
  }

  test("incrementalNewNear preserves its precondition (the two-batch poisoned-history shape)") {
    import spark.implicits._
    // ADVICE r6 scenario: batch doc x has a SMALLER id than its history
    // near-dup h. Min-id canonicalization kept x, planting the history-
    // history near-pair (x, h) that a later batch never probes; history-
    // wins drops x, so accumulated history stays near-dup-free.
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val history = Seq((10L, textA)).toDF("doc_id", "text")
    val batch1 = Seq((5L, textA + " extra")).toDF("doc_id", "text")
    val acc1 = Dedup.incrementalNewNear(
      Dedup.bandIndexFor(history), history, batch1, 0.8)
    assert(acc1.count() == 0,
      "a batch near-dup of a history doc must drop even with a smaller id")
    // history unchanged (nothing accepted); a second batch near-dup of the
    // same history doc is also dropped, and agrees with the full recompute
    val batch2 = Seq((20L, textA + " more")).toDF("doc_id", "text")
    val acc2 = Dedup.incrementalNewNear(
      Dedup.bandIndexFor(history), history, batch2, 0.8)
    assert(acc2.count() == 0)
    assert(Dedup.dropNearDuplicates(history.unionByName(batch2), 0.8)
      .filter(col("doc_id") === 20L).count() == 0)
    // and an unrelated batch doc still passes
    val batch3 = Seq((21L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    assert(Dedup.incrementalNewNear(
      Dedup.bandIndexFor(history), history, batch3, 0.8).count() == 1)
  }

  test("incrementalNewNear: history text is read only for candidate ids (never for a candidate-free batch)") {
    import spark.implicits._
    val histRows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "lambda mu nu xi omicron pi rho sigma tau upsilon"))
    val histRaw = histRows.toDF("doc_id", "text")
    // candidate-free batch: disjoint vocabulary ⇒ no shared band keys ⇒
    // the poison column must never be evaluated
    val poisonAll = udf { (s: String) =>
      if (s != null) throw new IllegalStateException("history text read")
      s
    }
    val poisoned = histRaw.select(col("doc_id"), poisonAll(col("text")).as("text"))
    val index = Dedup.bandIndexFor(histRaw) // keys from the REAL text, as persisted
    val farBatch = Seq(
      (10L, "one two three four five six seven eight nine ten"),
      (11L, "eleven twelve thirteen fourteen fifteen sixteen seventeen"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNewNear(index, poisoned, farBatch, 0.8)
    assert(out.count() == 2, "candidate-free batch passes through whole")

    // candidate-bearing batch: only the candidate history doc's text may
    // be read — a poison keyed on the NON-candidate id must not fire.
    // History is parquet-backed (the production shape): an in-memory
    // LocalRelation would be constant-folded through the poison UDF at
    // optimization time, which is an optimizer artifact, not a scan.
    val dir = java.nio.file.Files.createTempDirectory("graft-near-poison").toString
    histRaw.write.parquet(s"$dir/hist")
    val poison1 = udf((id: Long, s: String) =>
      if (id == 2L) throw new IllegalStateException(s"non-candidate $id read")
      else s)
    val poisoned1 = spark.read.parquet(s"$dir/hist").select(col("doc_id"),
      poison1(col("doc_id"), col("text")).as("text"))
    val nearBatch = Seq(
      (20L, "alpha beta gamma delta epsilon zeta eta theta iota kappa extra"))
      .toDF("doc_id", "text")
    val out1 = Dedup.incrementalNewNear(index, poisoned1, nearBatch, 0.8)
    assert(out1.count() == 0, "the near-clone of history doc 1 must be dropped")
  }

  test("capPerSource == the window row_number oracle, ties and skew included") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val got = operators.Sampling.capPerSource(d, "source",
        col("n_chars").cast("double"), "doc_id", 5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    val want = d.select(col("source"),
        row_number().over(w).cast("long").as("rank"),
        col("doc_id"), col("n_chars").cast("double").as("score"))
      .filter(col("rank") <= 5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == want)
    assert(got.groupBy(_._1).values.forall(_.size <= 5))
    // explicit tie: equal scores rank by doc_id ASC, deterministically
    import spark.implicits._
    val tied = Seq((3L, "a", 10L), (1L, "a", 10L), (2L, "a", 10L),
      (4L, "b", 7L)).toDF("doc_id", "source", "n_chars")
    val capped = operators.Sampling.capPerSource(tied, "source",
        col("n_chars").cast("double"), "doc_id", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == Set(("a", 1L, 1L), ("a", 2L, 2L), ("b", 1L, 4L)))
    // null scores never rank (not "rank last"): the null-scored doc is
    // excluded even though its source has spare k; an all-null source
    // contributes no rows
    val withNulls = Seq((1L, "a", Some(10L)), (2L, "a", None),
      (3L, "b", None)).toDF("doc_id", "source", "n_chars")
    val cappedN = operators.Sampling.capPerSource(withNulls, "source",
        col("n_chars").cast("double"), "doc_id", 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(cappedN == Set(("a", 1L, 1L)))
  }

  test("dropSemanticDuplicates keeps one canonical per semantic cluster") {
    val base = emb.select("vec_id", "embedding")
    val planted = base.unionByName(base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val kept = Similarity.dropSemanticDuplicates(planted, 0.95).cache()
    try {
      val keptIds = kept.select("vec_id").collect().map(_.getLong(0)).toSet
      // a planted exact clone can never be its cluster's min id
      (0L until 10L).foreach { i =>
        assert(!keptIds.contains(i + 100000), s"exact clone of $i survived")
      }
      // survivors == all - (union-find losers over the verified pair set)
      val pairs = Similarity.embeddingNearDuplicates(planted, 0.95)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      val losers = members.filter(m => find(m) != m)
      val allIds = planted.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(keptIds == allIds -- losers)
    } finally kept.unpersist()
  }

  // ---- corpus-line dedup / repetition signals / decontamination ----

  /** Plain-Scala mirrors of the tokenization the operators use. */
  private def wsToks(t: String): Seq[String] =
    t.split("\\s+").filter(_.nonEmpty).toSeq
  private def chunkLines(toks: Seq[String], k: Int): Seq[String] =
    if (toks.isEmpty) Seq("") else toks.grouped(k).map(_.mkString(" ")).toSeq
  private def ngrams(toks: Seq[String], n: Int): Seq[String] =
    toks.iterator.sliding(n).withPartial(false).map(_.mkString(" ")).toSeq

  test("dedupLinesCorpus == a plain-Scala doc-frequency oracle on the fixture") {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val docLines = rows.map { case (id, t) => id -> chunkLines(wsToks(t), 8) }
    val df = docLines.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val boiler = df.collect { case (l, n) if n > 2 => l }.toSet
    assert(boiler.nonEmpty, "fixture+clones must yield frequent lines")
    val expected = docLines.map { case (id, ls) =>
      val kept = ls.filterNot(boiler.contains)
      (id, ls.size, kept.size, kept.mkString(" "))
    }.sortBy(_._1)
    val got = Dedup.dedupLinesCorpus(docs)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq
    assert(got == expected)
    // the exact clones' shared lines hit df ≥ 3 (base + exact + near dup
    // share the prefix lines) — so removal genuinely fired somewhere
    assert(expected.exists { case (_, nl, nk, _) => nk < nl },
      "no line was removed — planted duplicates should create boilerplate")
  }

  test("dedupLinesCorpus: planted boilerplate is removed everywhere, order kept") {
    import spark.implicits._
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val d = Seq(
      (1L, s"$boiler u1a u1b u1c u1d u1e u1f u1g u1h"),
      (2L, s"u2a u2b u2c u2d u2e u2f u2g u2h $boiler"),
      (3L, boiler), // all-boilerplate doc must survive as an empty row
      (4L, s"$boiler $boiler"), // repeated within one doc: both go
      (5L, "u5a u5b u5c u5d u5e u5f u5g u5h")).toDF("doc_id", "text")
    val out = Dedup.dedupLinesCorpus(d).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 2, 1, "u1a u1b u1c u1d u1e u1f u1g u1h"),
      (2L, 2, 1, "u2a u2b u2c u2d u2e u2f u2g u2h"),
      (3L, 1, 0, ""),
      (4L, 2, 0, ""),
      (5L, 1, 1, "u5a u5b u5c u5d u5e u5f u5g u5h")))
  }

  test("dedupLinesCorpus: a breached frequent-line cap fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupLinesCorpus(docs, maxFrequentLines = 0)
    }
    assert(e.getMessage.contains("frequent lines"))
  }

  test("dedupLinesCorpus: a breached BYTE cap fails loudly before any driver collect") {
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupLinesCorpus(docs, maxFrequentBytes = 1L)
    }
    assert(e.getMessage.contains("bytes"), e.getMessage)
  }

  test("dedupLinesNewline: '\\n' lines detected, removed in order, rejoined with '\\n'") {
    import spark.implicits._
    val boiler = "COOKIE BANNER"
    val d = Seq(
      (1L, s"$boiler\nunique one\nalpha"),
      (2L, s"beta two\n$boiler"),
      (3L, boiler), // all-boilerplate doc survives as an empty row
      (4L, "gamma\ndelta"),
      (5L, s"$boiler\n$boiler")).toDF("doc_id", "text")
    val out = Dedup.dedupLinesNewline(d).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3, 2, "unique one\nalpha"),
      (2L, 2, 1, "beta two"),
      (3L, 1, 0, ""),
      (4L, 2, 2, "gamma\ndelta"),
      (5L, 2, 0, "")))
    // both caps fail loudly under the newline policy too
    assert(intercept[IllegalArgumentException] {
      Dedup.dedupLinesNewline(d, maxFrequentLines = 0)
    }.getMessage.contains("frequent lines"))
    assert(intercept[IllegalArgumentException] {
      Dedup.dedupLinesNewline(d, maxFrequentBytes = 3L)
    }.getMessage.contains("bytes"))
    // null text is one empty line; an empty line shared by > maxDocFreq
    // docs is itself boilerplate
    val withNulls = (Seq((10L, null: String), (11L, ""), (12L, ""),
      (13L, ""), (14L, "solo line")).toDF("doc_id", "text"))
    val outN = Dedup.dedupLinesNewline(withNulls).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(outN.toSeq == Seq(
      (10L, 1, 0, ""), (11L, 1, 0, ""), (12L, 1, 0, ""), (13L, 1, 0, ""),
      (14L, 1, 1, "solo line")))
  }

  test("dedupSpansCorpus == a plain-Scala cover oracle; passage copies removed, short docs whole") {
    import spark.implicits._
    val k = 4
    val passage = "p1 p2 p3 p4 p5" // 5 tokens → two 4-token windows
    val d = Seq(
      (1L, s"a1 a2 $passage a3 a4"),   // passage embedded mid-doc
      (2L, s"$passage b1 b2 b3 b4 b5"), // passage at the head
      (3L, "c1 c2 c3 c4 c5 c6 c7"),     // unique: untouched
      (4L, "d1 d2 d3"),                 // < k tokens: no window, whole
      (5L, passage)).toDF("doc_id", "text") // exactly the passage: emptied
    val got = Dedup.dedupSpansCorpus(d, k = k, maxDocFreq = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 9, 4, "a1 a2 a3 a4"),
      (2L, 10, 5, "b1 b2 b3 b4 b5"),
      (3L, 7, 7, "c1 c2 c3 c4 c5 c6 c7"),
      (4L, 3, 3, "d1 d2 d3"),
      (5L, 5, 0, "")))

    // fixture-level plain-Scala mirror (same window/cover definition)
    val rows = docs.collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse(""))).toSeq
    val kk = 16
    def wins(toks: Seq[String]): Seq[(Int, String)] =
      if (toks.size < kk) Nil
      else (0 to toks.size - kk).map(s => (s, toks.slice(s, s + kk).mkString(" ")))
    val docToks = rows.map { case (id, t) => id -> wsToks(t) }
    val df = docToks.flatMap { case (id, ts) => wins(ts).map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val dup = df.collect { case (w, n) if n > 1 => w }.toSet
    assert(dup.nonEmpty, "fixture+clones must yield duplicated spans")
    val expected = docToks.map { case (id, ts) =>
      val cover = Array.fill(ts.size)(false)
      wins(ts).foreach { case (s, w) =>
        if (dup(w)) (s until s + kk).foreach(cover(_) = true)
      }
      val kept = ts.indices.filterNot(cover)
      (id, ts.size, kept.size, kept.map(ts).mkString(" "))
    }.sortBy(_._1)
    val gotFx = Dedup.dedupSpansCorpus(docs, k = kk, maxDocFreq = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq
    assert(gotFx == expected)
    assert(expected.exists { case (_, nt, nk, _) => nk < nt },
      "no span was removed — planted duplicates should share windows")
    // caps fail loudly
    assert(intercept[IllegalArgumentException] {
      Dedup.dedupSpansCorpus(docs, k = kk, maxFrequentSpans = 0)
    }.getMessage.contains("frequent spans"))
    assert(intercept[IllegalArgumentException] {
      Dedup.dedupSpansCorpus(docs, k = kk, maxFrequentBytes = 1L)
    }.getMessage.contains("bytes"))
  }

  test("repetitionSignals == a plain-Scala word/bigram-mode oracle") {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = rows.flatMap { case (id, t) =>
      val w = t.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
      if (w.isEmpty) None
      else {
        val wc = w.groupBy(identity).view.mapValues(_.size.toLong)
        val bg = ngrams(w, 2).groupBy(identity).view.mapValues(_.size.toLong)
        val (nw, nd, mw) = (w.size.toLong, wc.size.toLong, wc.values.max)
        val mb = if (bg.isEmpty) 0L else bg.values.max
        Some((id, nw, nd, mw, mb, mw * 5 <= nw && mb * 8 <= nw))
      }
    }.sortBy(_._1)
    val got = operators.TextAnalysis.repetitionSignals(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expected)
    // a spam-shaped doc must flip ok_rep without touching the corpus rows
    import spark.implicits._
    val spam = Seq((999L, ("buy now " * 30).trim)).toDF("doc_id", "text")
    val flags = operators.TextAnalysis.repetitionSignals(spam).collect()
    assert(flags.length == 1 && !flags(0).getBoolean(5),
      "a 30x-repeated bigram must fail ok_rep")
    // edge: a single-word doc has no bigram → max_bigram_n = 0, present
    val one = operators.TextAnalysis.repetitionSignals(
      Seq((1L, "solo")).toDF("doc_id", "text")).collect()
    assert(one.length == 1 && one(0).getLong(4) == 0L)
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the bench set") {
    import spark.implicits._
    val bench = Seq((100L, "s1 s2 s3 s4 s5 s6")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x1 x2 s2 s3 s4 s5 s6 x3"), // shares 5-gram s2..s6 → flagged
      (2L, "s1 s2 s3 s4 z9 z8 z7 z6"), // only a 4-gram overlap → clean
      (3L, "y1 y2 y3 y4 y5 y6 y7 y8"),
      (4L, "s2 s3 s4")).toDF("doc_id", "text") // < 5 tokens: no gram → clean
    val got = Dedup.decontaminate(corpus, bench)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(got.toSeq == Seq((1L, true), (2L, false), (3L, false), (4L, false)))
    // and against a plain-Scala oracle on the fixture: bench = the exact
    // clones' originals, so every clone (and the original itself) is hot
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val benchSet = rows.filter(_._1 < 5)
    val benchGrams = benchSet.flatMap(r => ngrams(wsToks(r._2), 5)).toSet
    val expected = rows.map { case (id, t) =>
      (id, ngrams(wsToks(t), 5).exists(benchGrams.contains))
    }.sortBy(_._1)
    val benchDf = docs.filter(col("doc_id") < 5)
    val got2 = Dedup.decontaminate(docs, benchDf).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(got2 == expected)
    assert(expected.count(_._2) >= 10,
      "clones of bench docs must be flagged") // 5 originals + 5 exact clones
  }

  test("tokenDrift == a plain-Scala smoothed KL/JS oracle; identical corpora drift 0") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta beta gamma"), (2L, "alpha delta")).toDF("doc_id", "text")
    val b = Seq((3L, "alpha alpha zeta"), (4L, "beta zeta zeta")).toDF("doc_id", "text")
    def words(rows: Seq[String]): Map[String, Long] =
      rows.flatMap(_.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (ca, cb) = (words(Seq("alpha beta beta gamma", "alpha delta")),
      words(Seq("alpha alpha zeta", "beta zeta zeta")))
    val vocab = ca.keySet ++ cb.keySet
    val (ta, tb, v) = (ca.values.sum, cb.values.sum, vocab.size.toLong)
    val ps = vocab.toSeq.map { w =>
      ((ca.getOrElse(w, 0L) + 1.0) / (ta + v), (cb.getOrElse(w, 0L) + 1.0) / (tb + v))
    }
    val klAb = ps.map { case (pa, pb) => pa * math.log(pa / pb) }.sum
    val klBa = ps.map { case (pa, pb) => pb * math.log(pb / pa) }.sum
    val js = ps.map { case (pa, pb) =>
      val m = (pa + pb) / 2
      pa * math.log(pa / m) / 2 + pb * math.log(pb / m) / 2
    }.sum
    val r = operators.Importance.tokenDrift(a, b).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((ta, tb, v)))
    assert(math.abs(r.getDouble(3) - klAb) < 1e-12)
    assert(math.abs(r.getDouble(4) - klBa) < 1e-12)
    assert(math.abs(r.getDouble(5) - js) < 1e-12)
    assert(r.getDouble(5) >= 0 && r.getDouble(5) <= math.log(2) + 1e-12)
    // identical corpora: every divergence is exactly 0 (log 1 terms)
    val same = operators.Importance.tokenDrift(a, a).head()
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0
      && same.getDouble(5) == 0.0)
  }

  test("bm25Scores == a plain-Scala BM25 oracle; unmatched docs score 0") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark window spark join"),
      (2L, "window table scan"),
      (3L, "zeta eta theta"),
      (4L, null: String)).toDF("doc_id", "text")
    val terms = Seq("spark", "window")
    def words(t: String): Seq[String] =
      Option(t).getOrElse("").toLowerCase
        .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
    val rows = Seq((1L, "spark window spark join"), (2L, "window table scan"),
      (3L, "zeta eta theta"), (4L, null: String))
    val docWords = rows.map { case (id, t) => id -> words(t) }
    val n = docWords.size
    val avgdl = docWords.map(_._2.size).sum.toDouble / n
    def df(t: String) = docWords.count(_._2.contains(t))
    def idf(t: String) = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5))
    val (k1, b) = (1.2, 0.75)
    val expected = docWords.map { case (id, ws) =>
      val dl = ws.size.toDouble
      val s = terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0) 0.0
        else idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
      }.sum
      (id, ws.size.toLong, s)
    }
    val got = operators.TextAnalysis.bm25Scores(corpus, terms)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2)))
    assert(got.map(g => (g._1, g._2)).toSeq == expected.map(e => (e._1, e._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9, s"doc ${g._1}: ${g._3} vs ${e._3}")
    }
    // relevance ordering: the doc with both terms (one twice) outranks the
    // single-term doc; non-matching and null docs are exactly 0
    val byId = got.map(g => g._1 -> g._3).toMap
    assert(byId(1L) > byId(2L) && byId(2L) > 0)
    assert(byId(3L) == 0.0 && byId(4L) == 0.0)
  }

  // ---- corpus mixing plan / DSIR importance scores ----

  test("mixingPlan == a plain-Scala mirror on the fixture sources") {
    val raw = spark.read.parquet(s"$sf/documents.parquet")
    val rows = raw.select("source", "text").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("")))
    val stats = rows.groupBy(_._1).view.mapValues { rs =>
      (rs.size.toLong, rs.map(r => wsToks(r._2).size.toLong).sum)
    }.toMap
    val spw = stats.values.map(v => math.pow(v._2.toDouble, 0.5)).sum
    val expected = stats.toSeq.sortBy(_._1).map { case (s, (nd, nt)) =>
      val w = math.pow(nt.toDouble, 0.5) / spw
      val target = math.round(w * 100000.0)
      val rate = math.min(1.0, target.toDouble / nt)
      (s, nd, nt, math.round(w * 1e6), target, math.round(rate * 1e6))
    }
    val got = operators.Sampling.mixingPlan(raw, "source",
        size(operators.TextAnalysis.wsTokens(col("text"))), 0.5, 100000L)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("weight") * 1000000).cast("long"),
        col("target_tokens"), round(col("rate") * 1000000).cast("long"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // weights are a distribution: ppm values sum to ~1e6
    assert(math.abs(got.map(_._4).sum - 1000000L) <= got.size)
  }

  test("mixingPlan limits: alpha=1 is proportional, full budget keeps rate 1") {
    import spark.implicits._
    val d = (Seq.fill(60)("big") ++ Seq.fill(30)("mid") ++ Seq.fill(10)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s, "w1 w2 w3 w4 w5") }
      .toDF("doc_id", "source", "text")
    val tokens = size(operators.TextAnalysis.wsTokens(col("text")))
    // alpha=1, budget = exactly the corpus (500 tokens): natural
    // proportions, every source keeps everything
    val nat = operators.Sampling.mixingPlan(d, "source", tokens, 1.0, 500L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(4), r.getDouble(5)))).toMap
    assert(nat("big") == (300L, 300L, 1.0))
    assert(nat("small") == (50L, 50L, 1.0))
    // alpha=0: uniform weights regardless of size
    val uni = operators.Sampling.mixingPlan(d, "source", tokens, 0.0, 90L)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(uni.values.forall(w => math.abs(w - 1.0 / 3) < 1e-12))
  }

  test("applyMixingPlan: deterministic, rate-1 intact, sampled near target") {
    import spark.implicits._
    val d = (0L until 4000L).map { i =>
      (i, if (i < 3600) "big" else "rare", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")
    }.toDF("doc_id", "source", "text")
    val tokens = size(operators.TextAnalysis.wsTokens(col("text")))
    // α=0.5 with a 16k budget: weights are exactly 3/4 vs 1/4 (√36000 =
    // 3·√4000), so "rare" (4k tokens) gets target 4000 = rate 1 and
    // "big" (36k tokens) is downsampled to 12k of its tokens (rate 1/3)
    val plan = operators.Sampling.mixingPlan(d, "source", tokens, 0.5, 16000L)
    val rates = plan.collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getDouble(5)))).toMap
    assert(rates("rare")._2 == 1.0, s"rare must keep rate 1: $rates")
    assert(rates("big")._2 < 0.4, s"big must be heavily downsampled: $rates")
    val kept = operators.Sampling.applyMixingPlan(d, plan, "source", "doc_id")
    val again = operators.Sampling.applyMixingPlan(d, plan, "source", "doc_id")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    val bySource = kept.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bySource("rare") == 400L, "rate-1 source must survive whole")
    val wantBig = rates("big")._2 * 3600
    assert(math.abs(bySource("big") - wantBig) < 0.05 * 3600,
      s"big kept ${bySource("big")} vs target $wantBig")
    // a source missing from the plan is passed through untouched
    val noPlan = operators.Sampling.applyMixingPlan(
      d, plan.filter(col("source") =!= "rare"), "source", "doc_id")
    assert(noPlan.filter(col("source") === "rare").count() == 400L)
  }

  test("importanceScores == a plain-Scala smoothed log-ratio oracle") {
    val raw = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val rows = raw.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    def words(t: String): Seq[String] =
      t.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
    val corpus = rows.filter(_._1 % 7 != 0)
    val target = rows.filter(_._1 % 7 == 0)
    val rc = corpus.flatMap(r => words(r._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val tc = target.flatMap(r => words(r._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val vocab = rc.keySet ++ tc.keySet
    val (rTot, tTot, v) = (rc.values.sum, tc.values.sum, vocab.size.toLong)
    def wgt(w: String): Double =
      math.log((tc.getOrElse(w, 0L) + 1.0) / (tTot + v)) -
        math.log((rc.getOrElse(w, 0L) + 1.0) / (rTot + v))
    val expected = corpus.flatMap { case (id, t) =>
      val ws = words(t)
      if (ws.isEmpty) None
      else Some((id, ws.size.toLong, ws.map(wgt).sum / ws.size))
    }.sortBy(_._1).toSeq
    val got = operators.Importance.importanceScores(
        raw.filter(col("doc_id") % 7 =!= 0), raw.filter(col("doc_id") % 7 === 0))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(g => (g._1, g._2)) == expected.map(e => (e._1, e._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9, s"doc ${g._1}: ${g._3} vs ${e._3}")
    }
  }

  test("importanceScores: target-like docs score above off-target docs") {
    import spark.implicits._
    val target = Seq((100L, "alpha beta gamma alpha beta"),
      (101L, "alpha gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta"), // pure target vocabulary
      (2L, "zeta eta theta iota"), // disjoint vocabulary
      (3L, "alpha beta zeta eta")).toDF("doc_id", "text") // mixed
    val s = operators.Importance.importanceScores(corpus, target)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(s(1L) > s(3L) && s(3L) > s(2L), s"ordering wrong: $s")
    assert(s(1L) > 0 && s(2L) < 0, s"signs wrong: $s")
  }

  test("importanceScoresHashed == a plain-Scala unigram+bigram oracle (no collisions)") {
    import spark.implicits._
    val target = Seq((100L, "alpha beta gamma alpha beta"),
      (101L, "alpha gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "zeta eta theta iota"),
      (3L, "alpha beta zeta eta")).toDF("doc_id", "text")
    // plain-Scala mirror of the DSIR unigram+bigram construction; with a
    // 2^30 bucket space this vocabulary sees no collisions, so the hashed
    // scores must equal the uncollided n-gram log-ratio exactly
    def grams(t: String): Seq[String] = {
      val w = t.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
      w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val corpusRows = Seq((1L, "alpha beta gamma delta"),
      (2L, "zeta eta theta iota"), (3L, "alpha beta zeta eta"))
    val targetRows = Seq("alpha beta gamma alpha beta", "alpha gamma delta")
    val rc = corpusRows.flatMap(r => grams(r._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val tc = targetRows.flatMap(grams).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val vocab = rc.keySet ++ tc.keySet
    val (rTot, tTot, v) = (rc.values.sum, tc.values.sum, vocab.size.toLong)
    def wgt(g: String): Double =
      math.log((tc.getOrElse(g, 0L) + 1.0) / (tTot + v)) -
        math.log((rc.getOrElse(g, 0L) + 1.0) / (rTot + v))
    val expected = corpusRows.map { case (id, t) =>
      val gs = grams(t)
      (id, gs.size.toLong, gs.map(wgt).sum / gs.size)
    }
    val h = operators.Importance.importanceScoresHashed(corpus, target, 1 << 30)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(h.map(x => (x._1, x._2)) == expected.map(e => (e._1, e._2)),
      s"feature counts: $h vs $expected")
    h.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9, s"doc ${g._1}: ${g._3} vs ${e._3}")
    }
    // target-likeness ordering survives the bigram extension
    val byId = h.map(x => x._1 -> x._3).toMap
    assert(byId(1L) > byId(3L) && byId(3L) > byId(2L), s"ordering wrong: $byId")
  }

  test("importanceScoresHashed: deterministic and partition-invariant") {
    val raw = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val corpus = raw.filter(col("doc_id") % 7 =!= 0)
    val target = raw.filter(col("doc_id") % 7 === 0)
    def run(c: org.apache.spark.sql.DataFrame) =
      operators.Importance.importanceScoresHashed(c, target, 1 << 16)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = run(corpus.repartition(3))
    val b = run(corpus.repartition(11))
    assert(a.map(x => (x._1, x._2)) == b.map(x => (x._1, x._2)))
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x._3 - y._3) < 1e-12) }
    assert(a.nonEmpty)
  }

  test("decontaminateFuzzy == the plain-Scala band∧Jaccard mirror; catches paraphrase") {
    import core.Shingles
    import spark.implicits._
    // a paraphrase (one mid-doc word swapped) keeps shingle Jaccard ≈ 0.85
    // but shares few exact 5-grams — the case `decontaminate` misses
    val words = (1 to 40).map(i => s"w$i")
    val benchText = words.mkString(" ")
    val para = words.updated(20, "SWAPPED").mkString(" ")
    val far = (1 to 40).map(i => s"z$i").mkString(" ")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val corpus = Seq((1L, para), (2L, far)).toDF("doc_id", "text")
    val got = Dedup.decontaminateFuzzy(corpus, bench, 0.7)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(got.toSeq == Seq((1L, true), (2L, false)))

    // shingle-less docs are trivially clean on both sides: an empty eval
    // item must NOT flag empty/short corpus docs (empty∩empty Jaccard is
    // 1.0 by convention, and all shingle-less docs share the degenerate
    // all-sentinel minhash signature)
    val benchEmpty = Seq((200L, ""), (201L, benchText)).toDF("doc_id", "text")
    val corpusEdge = Seq((10L, ""), (11L, "   "), (12L, "two words"),
      (13L, para)).toDF("doc_id", "text")
    val gotE = Dedup.decontaminateFuzzy(corpusEdge, benchEmpty, 0.7)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(gotE.toSeq == Seq((10L, false), (11L, false), (12L, false),
      (13L, true)))

    // fixture-level EXACT mirror: flag ⟺ (shares a minhash band with some
    // bench doc) ∧ (true shingle-Jaccard ≥ tau) — same signatures, no
    // approximation gap between operator and oracle
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val benchRows = rows.filter(_._1 < 5)
    def bands(t: String): Set[Long] = Shingles.bandKeys(
      Shingles.minhashSignature(Shingles.wordShingles(t, Dedup.ShingleN),
        Dedup.MinhashK), Dedup.Bands, Dedup.Rows).toSet
    val benchBands = benchRows.map { case (id, t) => (id, bands(t)) }
    val benchSh = benchRows.map { case (id, t) =>
      (id, Shingles.wordShingles(t, Dedup.ShingleN)) }
    val expected = rows.map { case (id, t) =>
      val b = bands(t)
      val sh = Shingles.wordShingles(t, Dedup.ShingleN)
      // shingle-less docs on either side never match (the operator's
      // trivially-clean contract; the fixture has none, so this clause
      // is inert here and exists to keep the mirror definitionally exact)
      val hit = sh.nonEmpty && benchBands.exists { case (bid, bb) =>
        benchSh.find(_._1 == bid).get._2.nonEmpty &&
          b.exists(bb.contains) &&
          Shingles.jaccard(sh,
            benchSh.find(_._1 == bid).get._2) >= 0.8
      }
      (id, hit)
    }.sortBy(_._1)
    val benchDf = docs.filter(col("doc_id") < 5)
    val got2 = Dedup.decontaminateFuzzy(docs, benchDf, 0.8).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(got2 == expected)
    // exact clones of bench docs agree on every band — can never be missed
    assert(expected.count(_._2) >= 10, "bench originals + their exact clones")
  }

  test("simhash: exact duplicates have hamming 0") {
    val dupPair = docs.groupBy("text")
      .agg(sort_array(collect_list("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1).limit(1)
      .collect().headOption.map(_.getSeq[Long](1))
    assume(dupPair.nonEmpty)
    val found = Dedup.simhashDuplicates(docs, 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val p = (dupPair.get(0), dupPair.get(1))
    assert(found.get(p).contains(0), s"pair $p not found with hamming 0: $found")
  }

  test("fingerprint groups contain the exact duplicates") {
    val nDupTexts = docs.groupBy("text").count().filter(col("count") > 1).count()
    val groups = Dedup.fingerprintGroups(docs).count()
    assert(groups >= nDupTexts)
  }

  test("brute-force cosine top-k matches a plain-Scala oracle") {
    val all = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val queries = all.filter(_._1 < 10)
    val expected = queries.flatMap { case (q, qv) =>
      all.filter(_._1 != q)
        .map { case (id, v) => (id, VecOps.cosine(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(5).zipWithIndex
        .map { case ((id, _), i) => (q, i + 1, id) }
    }.toSet
    val got = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("brute-force top-k with 200 queries: bounded-heap agg == plain oracle") {
    // the many-queries case the window formulation could not scale to:
    // 200 query vectors, map-side-combined top-k, exact expected output
    val all = emb.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val queries = all.filter(_._1 < 200)
    val expected = queries.flatMap { case (q, qv) =>
      all.filter(_._1 != q)
        .map { case (id, v) => (id, VecOps.cosine(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3).zipWithIndex
        .map { case ((id, _), i) => (q, i + 1, id) }
    }.toSet
    val got = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 200), emb.repartition(7), 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("TopKByScore rejects mistyped score/id at analysis time, not on executors") {
    val df = spark.range(5).toDF("id")
      .select(col("id"), col("id").cast("float").as("s"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(operators.TopKByScore(col("s"), col("id"), 3)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("approx_count_distinct stays inside the advertised HLL error bound") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val rsd = 0.05
    val r = ev.agg(
      approx_count_distinct(col("user_id"), rsd).as("a"),
      countDistinct(col("user_id")).as("e")).head()
    val (a, e) = (r.getLong(0), r.getLong(1))
    info(s"approx=$a exact=$e rsd=$rsd")
    assert(math.abs(a - e) <= 3 * rsd * e, s"approx=$a exact=$e outside 3·rsd bound")
  }

  test("embedding-cosine near-dup finds every planted exact-duplicate pair") {
    val base = emb.select("vec_id", "embedding")
    val planted = base.unionByName(base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    val pairs = Similarity.embeddingNearDuplicates(planted, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 10L).foreach { i =>
      assert(pairs.contains((i, i + 100000)), s"planted dup pair $i missing")
    }
  }

  /** Deterministic near-duplicate of `v`: add orthogonal-ish Lcg noise of
    * relative magnitude delta ⇒ cosine ≈ 1/sqrt(1+delta²) (< 1 strictly).
    */
  private def perturb(v: Array[Float], seed: Long, delta: Double): Array[Float] = {
    val rng = new core.Lcg(core.Lcg.mix(4242L, seed))
    val noise = Array.fill(v.length)((rng.nextDouble() * 2 - 1).toFloat)
    val scale = delta * VecOps.norm(v) / math.max(VecOps.norm(noise), 1e-9)
    v.zip(noise).map { case (a, b) => (a + scale * b).toFloat }
  }

  test("banded embedding-LSH: measured recall on planted NEAR-duplicates (cos < 1)") {
    import spark.implicits._
    val base = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // plant 20 near-dups at relative noise 0.2 ⇒ cos ≈ 0.98, strictly < 1
    val plantedRows = base.filter(_._1 < 20).map { case (id, v) =>
      (id + 300000L, perturb(v, id, 0.2))
    }
    val expected = base.filter(_._1 < 20).map { case (id, v) =>
      (id, id + 300000L, VecOps.cosine(v, plantedRows.find(_._1 == id + 300000L).get._2))
    }
    expected.foreach { case (_, _, c) =>
      assert(c > 0.9 && c < 0.9999, s"planted pair cosine $c not in (0.9, 1)")
    }
    val planted = emb.select("vec_id", "embedding")
      .unionByName(plantedRows.toSeq.toDF("vec_id", "embedding"))
    val found = Similarity.embeddingNearDuplicates(planted, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = expected.count { case (a, b, _) => found.contains((a, b)) }
    val recall = hit.toDouble / expected.length
    info(s"banded LSH near-dup recall @ cos≈0.98 = $recall ($hit/${expected.length})")
    assert(recall >= 0.9, s"recall $recall below 0.9 — banding regressed")
    // single-table ablation: the banded design must not be WORSE than one table
    val single = Similarity.embeddingNearDuplicates(planted, 0.9, tables = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hitSingle = expected.count { case (a, b, _) => single.contains((a, b)) }
    info(s"single-table ablation recall = ${hitSingle.toDouble / expected.length}")
    assert(hit >= hitSingle)
  }

  test("bucket caps are observable (never silent) in all three candidate tiers") {
    import spark.implicits._
    val over = Dedup.MaxBucket + 6
    // text tiers: `over` docs with identical text ⇒ every band/chunk bucket
    // they land in exceeds MaxBucket
    val hotDocs = (0 until over).map(i => (i.toLong, "same boilerplate text everywhere"))
      .toDF("doc_id", "text")
    val mh = Dedup.bucketStats(hotDocs).head()
    assert(mh.getLong(1) >= 1, s"minhash n_capped=${mh.getLong(1)}")
    assert(mh.getLong(2) == over.toLong)
    // simhash has its own (larger) cap — breach THAT one
    val overSim = Dedup.SimhashMaxBucket + 6
    val hotSim = (0 until overSim).map(i => (i.toLong, "same boilerplate text everywhere"))
      .toDF("doc_id", "text")
    val sh = Dedup.simhashBucketStats(hotSim).head()
    assert(sh.getLong(1) >= 1, s"simhash n_capped=${sh.getLong(1)}")
    assert(Dedup.simhashBucketStats(hotDocs).head().getLong(1) == 0,
      s"${over} identical docs must NOT breach the simhash tier's larger cap")
    // embedding tier: `over` identical vectors share every table's bucket
    val v = emb.select("vec_id", "embedding").head().getSeq[Float](1).toArray
    val hotVecs = (0 until over).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
    val eb = Similarity.embeddingBucketStats(hotVecs).head()
    assert(eb.getLong(1) >= Similarity.Tables.toLong,
      s"embedding n_capped=${eb.getLong(1)} — cap must be visible per table")
    assert(eb.getLong(2) == over.toLong)
    // and the capped bucket is indeed dropped by pairsFromKeys ⇒ the stats
    // hook is the ONLY way to see it: candidates from the hot bucket = 0
    assert(Dedup.minhashCandidates(hotDocs).count() == 0)
  }

  test("sampleByCluster over the REAL IVF assignment == the row_number oracle; budget variant balanced + deterministic") {
    val idx = Similarity.buildIvfIndex(spark, emb, c = 8, persist = false)
    val assigned = idx.assigned.select("vec_id", "cid").localCheckpoint(true)
    val score = pmod(col("vec_id") * 2654435761L, lit(1000003L)).cast("double")
    val got = Similarity.sampleByCluster(assigned, 3, score)
      .select("cid", "rank", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cid").orderBy(col("score").desc, col("vec_id"))
    val want = assigned.withColumn("score", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("cid", "rank", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // coverage: every populated cluster is represented, none exceeds the cap
    val perCid = got.groupBy(_._1)
    assert(perCid.values.forall(_.size <= 3))
    assert(perCid.keySet == assigned.select("cid").distinct()
      .collect().map(_.getInt(0)).toSet,
      "a populated cluster contributed no sample — coverage broken")

    // budget variant: reproducible run-over-run, and α = 0 (uniform over
    // clusters) keeps MORE of a small cluster than of a big one
    val s1 = Similarity.sampleByClusterBudget(assigned, 0.0, 100)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val s2 = Similarity.sampleByClusterBudget(assigned, 0.0, 100)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "budgeted sampling must be deterministic")
    assert(s1.nonEmpty && s1.size < assigned.count(),
      s"budget 100 of ${assigned.count()} must actually subsample")
    val sizes = assigned.groupBy("cid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val keptBy = Similarity.sampleByClusterBudget(assigned, 0.0, 100)
      .groupBy("cid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (minCid, _) = sizes.minBy(_._2)
    val (maxCid, _) = sizes.maxBy(_._2)
    if (sizes(minCid) * 2 <= sizes(maxCid)) {
      val rMin = keptBy.getOrElse(minCid, 0L).toDouble / sizes(minCid)
      val rMax = keptBy.getOrElse(maxCid, 0L).toDouble / sizes(maxCid)
      assert(rMin >= rMax - 0.15,
        s"α=0 must up-weight the small cluster: kept $rMin vs $rMax")
    }
  }

  test("tokenDriftHashed: bounded vocab, exact zero on identical snapshots, detects real drift") {
    val d = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val a = d.filter(col("doc_id") % 3 =!= 0)
    val b = d.filter(col("doc_id") % 3 === 0)
    // identical snapshots: hashing cannot invent drift — exactly 0
    val same = operators.Importance.tokenDriftHashed(a, a, 1 << 10).head()
    assert(same.getAs[Double]("kl_ab") == 0.0 && same.getAs[Double]("js") == 0.0)
    // bounded state: the union vocab can never exceed the bucket count
    val small = operators.Importance.tokenDriftHashed(a, b, 64).head()
    assert(small.getAs[Long]("n_vocab") <= 64L)
    // real drift still reads as drift through the hash
    assert(small.getAs[Double]("js") > 0.0)
    // token totals are hash-invariant (mass is merged, never lost)
    val exact = operators.Importance.tokenDrift(a, b).head()
    assert(small.getAs[Long]("n_tokens_a") == exact.getAs[Long]("n_tokens_a"))
    assert(small.getAs[Long]("n_tokens_b") == exact.getAs[Long]("n_tokens_b"))
    // collisions only merge mass: the hashed divergence is a lower bound
    assert(small.getAs[Double]("js") <= exact.getAs[Double]("js") + 1e-12)
  }

  test("compactBandIndex: duplicate keys from replayed appends compact away; probes answer identically") {
    import spark.implicits._
    val hist = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val path = s"$dir/band"
    Dedup.writeBandIndex(hist, path) // initial append
    Dedup.writeBandIndex(hist, path) // replayed append: every key twice
    val dup = Dedup.readBandIndex(spark, path)
    assert(dup.count() == 2L * dup.distinct().count())
    val batch = Seq((9L, "alpha beta gamma delta epsilon zeta eta theta iota kappa tail"))
      .toDF("doc_id", "text")
    val before = Dedup.incrementalNewNear(
      Dedup.readBandIndex(spark, path), hist, batch, 0.8).count()
    Dedup.compactBandIndex(spark, path)
    val compacted = Dedup.readBandIndex(spark, path)
    assert(compacted.count() == compacted.distinct().count(),
      "compaction must leave exactly the distinct key rows")
    assert(compacted.count() == 2L * Dedup.Bands)
    val after = Dedup.incrementalNewNear(compacted, hist, batch, 0.8).count()
    assert(before == after && after == 0L,
      "the near-clone must be rejected before AND after compaction")
    // neither staging dir survives a successful compaction
    assert(!new java.io.File(path + ".old").exists())
    assert(!new java.io.File(path + ".compact").exists())
  }

  test("IVF centroid build under a forced sample cap keeps usable recall") {
    val brute = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // sampleCap 128 << 500 corpus rows forces the deterministic hash sample
    val cents = Similarity.centroids(spark, emb, 16, sampleCap = 128)
    assert(cents.length == 16)
    val ivf = Similarity.ivfTopK(spark, emb.filter(col("vec_id") < 10), emb, 5,
      c = 16, nProbe = 4, sampleCap = 128)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(s"IVF recall@5 with sampled centroids = $recall")
    assert(recall >= 0.4, s"recall $recall")
  }

  test("IVF ANN recall@5 vs brute force is measured and reasonable") {
    val brute = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(spark, emb.filter(col("vec_id") < 10), emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(s"IVF recall@5 = $recall")
    assert(recall >= 0.4, s"recall $recall") // approximate by design; measured, not assumed
  }

  test("IVF build/query split: one persisted assignment serves multiple query batches") {
    val index = Similarity.buildIvfIndex(spark, emb, c = 16)
    try {
      assert(index.assigned.storageLevel.useMemory
        || index.assigned.storageLevel.useDisk,
        "built index's assignment is not persisted")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
      // batch 1 through the shared index equals the one-shot path (same
      // deterministic centroids, same probe selection)
      val b1 = rows(Similarity.queryIvf(index, emb.filter(col("vec_id") < 10), 5))
      val oneShot = rows(Similarity.ivfTopK(spark,
        emb.filter(col("vec_id") < 10), emb, 5))
      assert(b1.sameElements(oneShot))
      // a second, disjoint batch runs against the SAME assignment — no
      // rebuild, full per-query coverage
      val b2 = Similarity.queryIvf(index,
        emb.filter(col("vec_id") >= 10 && col("vec_id") < 20), 5)
      assert(b2.select("q_id").distinct().count() == 10)
    } finally index.assigned.unpersist()
  }

  test("sort-based aggregate fallback (#24) produces identical results") {
    // collect_list normally runs in ObjectHashAggregate; disabling it forces
    // the planner's SortAggregate fallback — results must be identical
    val df = spark.read.parquet(s"$sf/events.parquet")
    def run(): Map[Long, Seq[String]] =
      df.groupBy("user_id")
        .agg(sort_array(collect_list("event_type")).as("types"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val viaHash = run()
    val key = "spark.sql.execution.useObjectHashAggregateExec"
    val old = spark.conf.get(key, "true")
    try {
      spark.conf.set(key, "false")
      val plan = df.groupBy("user_id")
        .agg(collect_list("event_type")).queryExecution.executedPlan.toString
      assert(plan.contains("SortAggregate"), s"expected SortAggregate in:\n$plan")
      assert(run() == viaHash)
    } finally spark.conf.set(key, old)
  }

  test("RuleHitCounts TypedImperativeAggregate == explode+groupBy") {
    val scored = guards.QualityPipeline.score(
      pipeline.SynthStore(3000L).read(spark).toDF()).select("rule_hits").cache()
    try {
      val viaExplode = scored.select(explode(col("rule_hits")).as("rule"))
        .groupBy("rule").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val viaSketch = scored.agg(guards.expr.RuleHitCounts(col("rule_hits")).as("h"))
        .select(explode(col("h"))).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaSketch("_rows") == scored.count())
      val nonZero = viaSketch.filter { case (k, v) => k != "_rows" && v > 0 }
      assert(nonZero == viaExplode, s"sketch=$nonZero explode=$viaExplode")
    } finally scored.unpersist()
  }

  test("multimodal feature extraction: schema, batch shape, determinism") {
    val media = Multimodal.synthesizeMedia(docs)
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length == docs.count())
    assert(feats.forall(_.decode_ok), "every synthesized PNG must decode")
    assert(feats.forall(_.feat.length == Multimodal.FeatureDim))
    assert(feats.forall(f => f.batch_size >= 1 && f.batch_size <= Multimodal.BatchSize))
    // determinism under repartition
    val feats2 = Multimodal.extractFeatures(spark, media.repartition(7)).collect()
    assert(feats.map(f => f.doc_id -> f.feat.toSeq).toMap ==
      feats2.map(f => f.doc_id -> f.feat.toSeq).toMap)
  }

  test("multimodal decode is real: PNG round-trips dims and pixel stats") {
    import javax.imageio.ImageIO
    val media = Multimodal.synthesizeMedia(docs.limit(8)).collect()
    media.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      // genuine PNG magic, decodable by plain ImageIO outside our code path
      assert(payload.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      val meta = r.getStruct(2)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(payload))
      assert(img != null)
      assert(img.getWidth == meta.getInt(1) && img.getHeight == meta.getInt(2),
        s"decoded dims ${img.getWidth}x${img.getHeight} != meta")
    }
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.synthesizeMedia(docs.limit(100))).collect()
    // real pixel statistics: bounded, non-degenerate, content-dependent
    assert(feats.forall(_.feat.forall(v => v >= 0f && v <= 1f)))
    assert(feats.forall(_.feat(3) > 0f), "hash-noise images must have luma variance")
    assert(feats.map(_.feat.toSeq).distinct.length == feats.length,
      "different docs must yield different pixel features")
  }

  test("audio feature extraction: schema, batch shape, determinism") {
    val media = Multimodal.synthesizeAudio(docs)
    val feats = Multimodal.extractAudioFeatures(spark, media).collect()
    assert(feats.length == docs.count())
    assert(feats.forall(_.decode_ok), "every synthesized WAV must decode")
    assert(feats.forall(_.feat.length == Multimodal.FeatureDim))
    assert(feats.forall(f => f.batch_size >= 1 && f.batch_size <= Multimodal.BatchSize))
    val feats2 = Multimodal.extractAudioFeatures(spark, media.repartition(7)).collect()
    assert(feats.map(f => f.doc_id -> f.feat.toSeq).toMap ==
      feats2.map(f => f.doc_id -> f.feat.toSeq).toMap)
  }

  test("audio decode is real: WAV round-trips via plain AudioSystem") {
    val media = Multimodal.synthesizeAudio(docs.limit(8)).collect()
    media.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      // genuine RIFF/WAVE container, decodable by the JDK audio stack
      // outside our code path
      assert(new String(payload.take(4), "US-ASCII") == "RIFF")
      assert(new String(payload.slice(8, 12), "US-ASCII") == "WAVE")
      val meta = r.getStruct(2)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        assert(ais.getFormat.getSampleRate == Multimodal.AudioSampleRate)
        assert(ais.getFrameLength == meta.getInt(2).toLong,
          s"decoded frames ${ais.getFrameLength} != meta n_samples")
      } finally ais.close()
    }
    val feats = Multimodal.extractAudioFeatures(spark,
      Multimodal.synthesizeAudio(docs.limit(100))).collect()
    // real signal statistics: bounded, non-degenerate, content-dependent
    assert(feats.forall(_.feat.forall(v => v >= 0f && v <= 1f)))
    assert(feats.forall(_.feat(0) > 0.1f), "sinusoid mix must have real RMS")
    assert(feats.forall(_.feat(1) > 0f), "sinusoids must cross zero")
    assert(feats.map(_.feat.toSeq).distinct.length == feats.length,
      "different docs must yield different audio features")
  }

  test("audio: a corrupt payload flags decode_ok=false, never kills the job") {
    import spark.implicits._
    val good = Multimodal.synthesizeAudio(docs.limit(3))
    val corrupt = Seq((999999L, Array[Byte](82, 73, 70, 70, 1, 2, 3),
        ("audio/wav", 8000, 16)))
      .toDF("doc_id", "payload", "meta")
      .select(col("doc_id"), col("payload"),
        struct(col("meta._1").as("format"), col("meta._2").as("sample_rate"),
          col("meta._3").as("n_samples")).as("meta"))
    val feats = Multimodal.extractAudioFeatures(spark,
      good.unionByName(corrupt)).collect()
    assert(feats.length == 4)
    val bad = feats.find(_.doc_id == 999999L).get
    assert(!bad.decode_ok && bad.feat.forall(_ == 0f))
    assert(feats.filter(_.doc_id != 999999L).forall(_.decode_ok))
  }

  test("multimodal: a corrupt payload flags decode_ok=false, never kills the job") {
    import spark.implicits._
    val good = Multimodal.synthesizeMedia(docs.limit(3))
    val corrupt = Seq((999999L, Array[Byte](1, 2, 3, 4), ("image/png", 16, 16)))
      .toDF("doc_id", "payload", "meta")
      .select(col("doc_id"), col("payload"),
        struct(col("meta._1").as("format"), col("meta._2").as("width"),
          col("meta._3").as("height")).as("meta"))
    val feats = Multimodal.extractFeatures(spark, good.unionByName(corrupt)).collect()
    assert(feats.length == 4)
    val bad = feats.find(_.doc_id == 999999L).get
    assert(!bad.decode_ok && bad.feat.forall(_ == 0f))
    assert(feats.filter(_.doc_id != 999999L).forall(_.decode_ok))
  }
}
