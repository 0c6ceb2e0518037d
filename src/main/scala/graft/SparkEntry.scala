package graft

import guards.{QualityPipeline, Scoring}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructField, StructType}
import pipeline.{Sessions, SynthStore}

/** Driver contract — see /root/repo/SURVEY.md §8.7 + the builder prompt.
  * Every SQL-expressible operator of SURVEY.md §3 gets a `queries` entry AND
  * a DuckDB-1.0 `oracleSql` entry over the same parquet tables (bare table
  * names; the driver maps them to `<sfDir>/<table>.parquet`). Aggregates
  * avoid float-summation-order traps: money sums go through
  * round(x*100)→BIGINT cents, quantity sums are integral doubles (exact),
  * timestamps are compared as epoch seconds.
  */
object SparkEntry {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Deterministic synthetic transcript count per fixture tier
    * (FIXTURES.md §B sizes: t1 1k · t2 50k · bench 2M). */
  def synthTurns(sfDir: String): Long = {
    val base = new java.io.File(sfDir).getName
    base match {
      case "sf0.1"  => 2000000L
      case "sf0.01" => 50000L
      case _        => 1000L
    }
  }

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100, 0).cast("long")

  /** The q_curate_e2e composition, unwrapped — factored out so
    * PlanShapeSpec can audit the composed physical plan directly (the
    * driver query's LazyFrame hides it from the query sweep). Runs the
    * detection-phase collects eagerly; the driver entry defers via
    * LazyFrame.
    */
  private[graft] def curatePipeline(s: SparkSession, dir: String): DataFrame = {
    // Stage outputs are eagerly localCheckpoint'ed at each phase boundary:
    // the detection operators evaluate their input several times (detect /
    // confirm / remove scans; minhash keys + shingles + the final
    // anti-join), so WITHOUT a materialization each downstream evaluation
    // re-derives the ENTIRE upstream chain — the re-scan count compounds
    // multiplicatively across the seven stages. A checkpoint makes every
    // stage's text pass read a materialized leaf instead (this is what the
    // "text scanned once per detection phase" contract means ACROSS the
    // composition, not just within one operator); blocks are
    // ContextCleaner-reclaimed, nothing stays pinned.
    def ckpt(df: DataFrame): DataFrame = df.localCheckpoint(true)
    val d = t(s, dir, "documents").select("doc_id", "source", "text")
    val bench = d.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select("doc_id", "text")
    val corpus = d.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val q = ckpt(corpus.select("doc_id", "text").join(
      operators.TextAnalysis.qualitySignals(corpus.select("doc_id", "text"))
        .filter(col("ok_quality")).select("doc_id"),
      Seq("doc_id"), "left_semi"))
    val lines = ckpt(operators.Dedup.dedupLinesCorpus(q)
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("text_clean").as("text")))
    val spans = ckpt(operators.Dedup.dedupSpansCorpus(lines, k = 16)
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("text_clean").as("text")))
    val near = ckpt(operators.Dedup.dropNearDuplicates(spans, 0.8))
    val clean = near.join(
      operators.Dedup.decontaminate(near, bench)
        .filter(!col("contaminated")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val toks = size(operators.TextAnalysis.wsTokens(col("text")))
    val withSrc = ckpt(clean
      .join(d.select("doc_id", "source"), Seq("doc_id"))
      .select(col("doc_id"), col("source"), toks.as("n_tokens")))
    val plan = operators.Sampling.mixingPlan(withSrc, "source",
      col("n_tokens"), alpha = 0.5, budgetTokens = 50000L)
    val mixed = ckpt(operators.Sampling.applyMixingPlan(withSrc, plan,
      "source", "doc_id"))
    operators.Packing.chunkTokens(mixed, "doc_id", 64)
      .groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      .join(mixed.select("doc_id", "source", "n_tokens"), Seq("doc_id"))
      .select("doc_id", "source", "n_tokens", "n_chunks")
  }

  /** The q_pipeline_labels composition, unwrapped — factored out (like
    * curatePipeline) so plan captures and audits can inspect the composed
    * physical plan directly; the driver query wraps it in a LazyFrame so
    * the eager windowed-corpus checkpoint runs at first action.
    */
  private[graft] def labelsPipeline(s: SparkSession, dir: String): DataFrame = {
    val sorted = QualityPipeline
      .withWindowClustered(s, SynthStore(synthTurns(dir)).read(s).toDF())
      .localCheckpoint(true)
      .orderBy("conv_id", "turn_idx")
    QualityPipeline.scorePostWindow(sorted)
      .select(col("conv_id"), col("turn_idx"), col("keep"),
        concat_ws("|", col("rule_hits")).as("rule_hits"),
        col("lang"), col("scrubbed_text"))
  }

  /** q_pipeline_mp's composition, unwrapped (see labelsPipeline). */
  private[graft] def mpPipeline(s: SparkSession, dir: String): DataFrame = {
    val sorted = QualityPipeline
      .withWindowClustered(s,
        SynthStore(math.max(1000L, synthTurns(dir) / 4)).read(s).toDF())
      .localCheckpoint(true)
      .orderBy("conv_id", "turn_idx")
    Scoring.scoreBatchedPostWindow(s, sorted)
      .toDF()
      .select(col("conv_id"), col("turn_idx"), col("keep"),
        concat_ws("|", col("rule_hits")).as("rule_hits"))
  }

  /** Flagship: the full quality-filter pipeline on the t1-scale synthetic
    * corpus; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Sessions.tune(spark)
    QualityPipeline.select(
      QualityPipeline.score(SynthStore(1000L).read(spark).toDF()))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- transcript quality-filter pipeline (model-dependent:
    // no DuckDB oracle; gated by the ScalaTest conformance suite §6.3) ----
    "q_pipeline_labels" -> ((s, dir) => {
      Sessions.tune(s)
      // sort BEFORE scoring: the global sort's range-sampling pass
      // re-executes its child, so `score(...).orderBy(...)` paid the whole
      // scoring pass twice (measured 8.3 s vs 4.2 s for the unsorted
      // scored frame). Sorting the windowed rows and scoring after the
      // exchange computes every scorer exactly once, map-side; the
      // projection preserves row order and (conv_id, turn_idx) is unique
      // (the one idx-gap plant lands ABOVE every natural idx), so the
      // output rows AND their order are identical.
      // clustered windowing instead of the conv_id window exchange (the
      // generator is conv-contiguous; same detection contract as score()):
      // the corpus now crosses ONE exchange (the range sort) instead of
      // two. The localCheckpoint materializes the windowed rows so the
      // sort's range-sampling pass scans the checkpoint instead of
      // re-running generation+windowing (same stage-boundary rationale as
      // the curate composition's checkpoints); the LazyFrame defers that
      // eager checkpoint job to first action, so explain-only consumers
      // pay nothing (same convention as q_curate_e2e).
      LazyFrame(s, StructType(Seq(StructField("conv_id", StringType),
        StructField("turn_idx", IntegerType), StructField("keep", BooleanType),
        StructField("rule_hits", StringType), StructField("lang", StringType),
        StructField("scrubbed_text", StringType)))) {
        labelsPipeline(s, dir)
      }
    }),
    "q_pipeline_mp" -> ((s, dir) => {
      Sessions.tune(s)
      // the broadcast-model comparison tier runs at 1/4 corpus size: it
      // exists to prove tier equivalence + amortized model shipping, not to
      // re-benchmark the whole corpus a third time. Sort BEFORE the typed
      // scoring boundary (same rationale as q_pipeline_labels: the global
      // sort's sampling pass re-executes its child, which here is the
      // whole mapPartitions model pass); mapPartitions preserves row
      // order and (conv_id, turn_idx) is unique, so output is identical.
      LazyFrame(s, StructType(Seq(StructField("conv_id", StringType),
        StructField("turn_idx", IntegerType), StructField("keep", BooleanType),
        StructField("rule_hits", StringType)))) {
        mpPipeline(s, dir)
      }
    }),

    // ---------------- aggregation (#23, #25, #26) ----
    "q_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q_distinct" -> ((s, dir) =>
      t(s, dir, "orders").agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n"))),

    // ---------------- joins (#14 broadcast, #15 SMJ, #17-#19, #21) ----
    "q_join_bcast" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"), sum(cents(col("c_acctbal"))).as("bal_cents"))
        .orderBy("r_name")
    }),
    "q_join_smj" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
        .orderBy("o_orderstatus")
    }),
    "q_join_semi" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") > 45),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),
    "q_join_anti" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    }),
    "q_join_outer" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_mktsegment")
        .agg(count(col("o_orderkey")).as("n_orders"), count(lit(1)).as("n_rows"))
        .orderBy("c_mktsegment")
    }),
    "q_join_range" -> ((s, dir) => {
      val a = t(s, dir, "events").alias("a")
      val b = t(s, dir, "events").alias("b")
      a.filter(col("a.event_type") === "purchase")
        .join(b,
          col("a.user_id") === col("b.user_id") &&
            col("b.ts") > col("a.ts") &&
            col("b.ts") <= col("a.ts") + expr("INTERVAL 5 MINUTES"))
        .groupBy(col("b.event_type").as("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),
    "q_join_asof" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "events")
        .withColumn("prev_click_val",
          last(when(col("event_type") === "click", col("value")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), coalesce(col("prev_click_val"), lit(-1.0)).as("prev_click_val"))
        .orderBy("event_id")
    }),

    "q_join_full" -> ((s, dir) => {
      // #21 full_outer: per-user purchase vs signup counts — both sides have
      // unmatched keys, so left-, right- and inner-match paths all exercise
      val e = t(s, dir, "events")
      val a = e.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("n_purchase"))
      val b = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(count(lit(1)).as("n_signup"))
      a.join(b, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("n_signup"), lit(0L)).as("n_signup"))
        .orderBy("user_id")
    }),
    "q_join_cross" -> ((s, dir) =>
      // #22 cartesian: tiny dims only (5 regions × 3 statuses); at scale a
      // cross join is only ever sane between broadcast-size inputs
      t(s, dir, "region").select("r_name")
        .crossJoin(t(s, dir, "orders").select("o_orderstatus").distinct())
        .orderBy("r_name", "o_orderstatus")),
    "q_join_salted" -> ((s, dir) => {
      // #16 dim-explode salted join: the fact side gets a deterministic salt,
      // the dim side is exploded ×S so every (key, salt) pair exists — a
      // mega-key's rows spread over S reducers instead of one straggler.
      // Result must equal the plain unsalted join (the oracle runs that).
      val S = 8
      val fact = t(s, dir, "orders")
        .withColumn("salt", pmod(hash(col("o_orderkey")), lit(S)))
      val dim = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
        .withColumn("salt", explode(array((0 until S).map(lit): _*)))
      // merge hint: at fixture scale the optimizer would broadcast the dim,
      // which hides the thing being demonstrated — salting exists for dims
      // too big to broadcast, where the shuffle keys on (key, salt)
      fact.join(dim.hint("merge"),
          fact("o_custkey") === dim("c_custkey") && fact("salt") === dim("salt"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("price_cents"))
        .orderBy("c_mktsegment")
    }),

    // ---------------- windows / sort / limit / set ops (#32-#42) ----
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
        .orderBy("o_custkey")
    }),
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .withColumn("prev_value", lag("value", 1).over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") > col("prev_value"), 1).otherwise(0)).as("n_up"))
        .orderBy("event_type")
    }),
    "q_rollup" -> ((s, dir) => {
      // rollup via the SQL entry point (also exercises spark.sql + temp views)
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"))
        .createOrReplaceTempView("q_rollup_src")
      s.sql(
        """SELECT coalesce(n_name, '_all') AS n_name, count(*) AS n
          |FROM q_rollup_src GROUP BY ROLLUP(n_name) ORDER BY n_name""".stripMargin)
    }),
    "q_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))),
    "q_set_except" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_custkey"))
        .except(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")))
        .agg(count(lit(1)).as("n"))
    }),
    "q_dropdup" -> ((s, dir) =>
      t(s, dir, "lineitem").dropDuplicates("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("n"))),

    // ---------------- scalar families: json, time, strings, arrays ----
    "q_json" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
        .orderBy("event_type")),
    "q_time_bucket" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
        .orderBy("hour_epoch")),
    // sort-then-project (here and in q_doc_rules/q_tokens/q_quality):
    // a global sort ABOVE a regex-heavy projection re-runs the projection
    // in its range-sampling pass; sorting the raw scan first and
    // projecting after computes each regex exactly once — same rows, same
    // order (doc_id is unique), oracle-identical
    "q_strings" -> ((s, dir) =>
      t(s, dir, "documents")
        .orderBy("doc_id")
        .select(col("doc_id"), length(col("text")).as("n_cp"),
          upper(substring(col("text"), 1, 8)).as("head8"),
          length(regexp_replace(col("text"), " ", "")).as("n_nospace"))),
    "q_array_stats" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), size(col("embedding")).as("dim"),
          array_max(col("embedding")).as("emb_max"),
          array_min(col("embedding")).as("emb_min"))
        .orderBy("vec_id")),

    // ---------------- quality rules over documents (DuckDB-checkable
    // subset of SURVEY.md §3.3; integer arithmetic, no float ratios) ----
    "q_doc_rules" -> ((s, dir) => {
      val txt = col("text")
      val cp = length(txt)
      t(s, dir, "documents").orderBy("doc_id").select(
        col("doc_id"),
        (cp >= 2 && cp <= 8000).as("ok_len"),
        regexp_count(lower(txt), lit("[\\p{L}\\p{N}]+")).between(1, 2000).as("ok_words"),
        (regexp_count(txt, lit("[^\\p{L}\\p{N}\\s]")) * 100 <= cp * 30).as("ok_sym"),
        (regexp_count(txt, lit("[0-9]")) * 100 <= cp * 50).as("ok_digit"))
    }),
    "q_dedup_exact" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("text")).as("n_distinct"))
        .orderBy("source")),
    "q_dedup_first" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy("text").agg(min("doc_id").as("keep_id"))
        .agg(count(lit(1)).as("n"))),
    // incremental (cross-batch) dedup: incoming = planted re-crawls of
    // history (same text, remapped ids) + genuinely new revisions; result
    // is EXACT (bloom prefilter + confirming anti-join), so DuckDB can
    // pin it with a plain NOT EXISTS
    "q_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(7)) === 3)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(col("text"), lit(" v2")).as("text")))
      operators.Dedup.incrementalNew(docs, incoming, expectedItems = 100000L)
        .select("doc_id")
        .orderBy("doc_id")
    }),
    // same incremental dedup over a history table with a PERSISTED
    // xxhash64 column (the production confirm path: history's hash column
    // is scanned, its text only for hash-matched slivers) — same oracle
    "q_dedup_inc_hashed" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(7)) === 3)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(col("text"), lit(" v2")).as("text")))
      operators.Dedup.incrementalNewHashed(
        operators.Dedup.historyBloom(docs, expectedItems = 100000L),
        operators.Dedup.withTextHash(docs), incoming)
        .select("doc_id")
        .orderBy("doc_id")
    }),
    // forced shuffled-semi fallback (maxBroadcastSuspects = 0): the
    // dup-heavy-batch strategy must emit the identical row set — pinned by
    // the same DuckDB NOT-EXISTS oracle
    "q_dedup_inc_fallback" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val incoming = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(7)) === 3)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(col("text"), lit(" v2")).as("text")))
      operators.Dedup.incrementalNew(docs, incoming,
        expectedItems = 100000L, maxBroadcastSuspects = 0L)
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // duplicate GROUPS from pairs: connected components (iterative
    // hash-min) over a deliberately SQL-expressible edge relation —
    // shared 40-char prefix OR shared 40-char suffix — so DuckDB can pin
    // the full transitive closure with a recursive CTE. component = the
    // cluster's min doc_id (the canonical survivor of "keep one").
    // The CC convergence loop is inherent to iterative algorithms, but a
    // LazyFrame defers it to first ACTION: explain-only consumers (plan
    // audits, sweep enumeration) pay nothing (PlanShapeSpec asserts zero
    // jobs at planning time).
    "q_dedup_groups" -> ((s, dir) => {
      // even the parquet scan construction lives inside the thunk: footer/
      // schema reads launch a small job, which the zero-jobs-at-planning
      // contract (PlanShapeSpec) also defers
      LazyFrame(s, StructType(Seq(StructField("doc_id", LongType),
        StructField("component", LongType)))) {
        val d = t(s, dir, "documents")
        def pairsOn(key: org.apache.spark.sql.Column): DataFrame = {
          val l = d.select(col("doc_id").as("doc_a"), key.as("k"))
          val r = d.select(col("doc_id").as("doc_b"), key.as("k"))
          l.join(r, "k").filter(col("doc_a") < col("doc_b"))
            .select("doc_a", "doc_b")
        }
        val pairs = pairsOn(substring(col("text"), 1, 40))
          .unionByName(pairsOn(
            expr("substring(text, greatest(length(text) - 39, 1), 40)")))
          .distinct()
        operators.Dedup.connectedComponents(pairs)
      }.orderBy("doc_id")
    }),

    // corpus-wide duplicate-line removal (RefinedWeb/CCNet boilerplate
    // pass over fixed 8-token lines): heavy-hitter detection shuffles
    // only 16-byte (hash, doc_id) rows, removal is a map-side broadcast-
    // set filter — EXACT, so DuckDB pins it end-to-end. The cap-bounded
    // detection collects are deferred to first action via LazyFrame
    // (same rationale as q_dedup_groups).
    "q_dedup_lines" -> ((s, dir) => {
      LazyFrame(s, StructType(Seq(StructField("doc_id", LongType),
        StructField("n_lines", IntegerType), StructField("n_kept", IntegerType),
        StructField("text_clean", StringType)))) {
        operators.Dedup.dedupLinesCorpus(
          t(s, dir, "documents").select("doc_id", "text"))
      }.orderBy("doc_id")
    }),
    // the same boilerplate pass under the newline-delimited line policy:
    // the corpus is re-lined in-query (every 2 whitespace tokens joined
    // by '\n' via one regexp pass) so real multi-line documents exercise
    // split-on-'\n' detection, removal and '\n' reassembly — DuckDB
    // mirrors the re-lining and the three phases exactly
    "q_dedup_lines_nl" -> ((s, dir) => {
      LazyFrame(s, StructType(Seq(StructField("doc_id", LongType),
        StructField("n_lines", IntegerType), StructField("n_kept", IntegerType),
        StructField("text_clean", StringType)))) {
        operators.Dedup.dedupLinesNewline(
          t(s, dir, "documents").select(col("doc_id"),
            regexp_replace(coalesce(col("text"), lit("")),
              "(\\S+ \\S+) ", "$1\n").as("text")))
      }.orderBy("doc_id")
    }),
    // duplicated-SPAN removal (Lee et al. exact-substring dedup over
    // 16-token windows): detection shuffles only (hash, doc_id) pairs,
    // exact per-string recount rescues collisions, removal is one
    // map-side cover pass — exact string semantics, DuckDB-pinned
    "q_dedup_spans" -> ((s, dir) => {
      LazyFrame(s, StructType(Seq(StructField("doc_id", LongType),
        StructField("n_tokens", IntegerType), StructField("n_kept", IntegerType),
        StructField("text_clean", StringType)))) {
        operators.Dedup.dedupSpansCorpus(
          t(s, dir, "documents").select("doc_id", "text"), k = 16)
      }.orderBy("doc_id")
    }),
    // Gopher-style repetition signals: most-repeated word / word-bigram
    // per doc via exploded two-level partial aggregation (all codegen)
    "q_quality_rep" -> ((s, dir) =>
      operators.TextAnalysis.repetitionSignals(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // benchmark decontamination: every doc sharing a 5-token n-gram with
    // the planted "eval set" (doc_id % 97 = 0) is flagged; bench n-grams
    // broadcast, only 8-byte hit ids shuffle
    "q_decontaminate" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      operators.Dedup.decontaminate(
        d.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(97)) === 0))
        .orderBy("doc_id")
    }),
    // corpus-mixing plan: per-source whitespace-token counts →
    // α=0.5-tempered weights → 100k-token budget targets and sampling
    // rates; doubles exported ppm-rounded so the DuckDB compare is exact
    "q_mix_plan" -> ((s, dir) =>
      operators.Sampling.mixingPlan(
        t(s, dir, "documents"), "source",
        size(operators.TextAnalysis.wsTokens(col("text"))),
        alpha = 0.5, budgetTokens = 100000L)
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("weight") * 1000000).cast("long").as("weight_ppm"),
          col("target_tokens"),
          round(col("rate") * 1000000).cast("long").as("rate_ppm"))
        .orderBy("source")),
    // DSIR-style importance scores: raw corpus = doc_id % 7 ≠ 0, target
    // distribution = doc_id % 7 = 0; per-doc mean log-likelihood ratio
    // exported micro-rounded
    "q_dsir" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      operators.Importance.importanceScores(
        d.filter(pmod(col("doc_id"), lit(7)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(7)) === 0))
        .select(col("doc_id"), col("n_words"),
          round(col("score") * 1000000).cast("long").as("score_u"))
        .orderBy("doc_id")
    }),

    // token-distribution drift between two corpus snapshots (pipeline
    // monitoring): smoothed Jeffreys-KL + Jensen-Shannon over the union
    // vocabulary — two map-combined word aggregates, one vocab join, one
    // one-row reduction; micro-rounded for the exact compare
    "q_drift" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      operators.Importance.tokenDrift(
        d.filter(pmod(col("doc_id"), lit(3)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(3)) === 0))
        .select(col("n_tokens_a"), col("n_tokens_b"), col("n_vocab"),
          round(col("kl_ab") * 1000000).cast("long").as("kl_ab_u"),
          round(col("kl_ba") * 1000000).cast("long").as("kl_ba_u"),
          round(col("js") * 1000000).cast("long").as("js_u"))
    }),

    // BM25 relevance against a fixed query-term set (the relevance-based
    // selection scorer): corpus explode pruned map-side to the 3 query
    // terms, |terms|-sized idf broadcast, doc lengths ride the groupBy
    // key, N/avgdl fold in as a lazy one-row broadcast — text never
    // shuffles and construction runs no job (the LazyFrame defers even
    // the parquet footer read); micro-rounded for the exact compare
    "q_bm25" -> ((s, dir) =>
      LazyFrame(s, StructType(Seq(StructField("doc_id", LongType),
        StructField("n_words", IntegerType), StructField("score_u", LongType)))) {
        operators.TextAnalysis.bm25Scores(
          t(s, dir, "documents").select("doc_id", "text"),
          Seq("spark", "window", "customer"))
          .select(col("doc_id"), col("n_words"),
            round(col("score") * 1000000).cast("long").as("score_u"))
      }.orderBy("doc_id")),

    // cluster-balanced diversity sampling (the coverage complement to
    // SemDeDup): top-5 per embedding cluster by a deterministic
    // id-scramble score, via the same bounded-heap aggregate as
    // q_source_cap. The cid here is a SQL-expressible stand-in
    // assignment (first embedding component, milli-bucketed mod 16) so
    // DuckDB pins the full row_number-per-cid contract end-to-end; the
    // REAL IVF-assignment path is asserted in OperatorsSpec (its cid
    // values are model-derived and not SQL-expressible)
    "q_cluster_sample" -> ((s, dir) => {
      val assigned = t(s, dir, "embeddings").select(col("vec_id"),
        pmod(floor(element_at(col("embedding"), 1).cast("double") * 1000)
          .cast("long"), lit(16L)).as("cid"))
      operators.Similarity.sampleByCluster(assigned, 5,
        pmod(col("vec_id") * 2654435761L, lit(1000003L)).cast("double"),
        "vec_id")
        .orderBy("cid", "rank")
    }),

    // per-source document cap: top-5 docs per source by (n_chars DESC,
    // doc_id ASC) via the bounded-heap TopKByScore agg — each task ships
    // ≤ k entries per source, no window funnel; DuckDB row_number oracle
    "q_source_cap" -> ((s, dir) =>
      operators.Sampling.capPerSource(
        t(s, dir, "documents"), "source",
        col("n_chars").cast("double"), "doc_id", 5)
        .orderBy("source", "rank")),

    // composed corpus-curation pipeline END-TO-END — the round-5/6
    // operators chained the way a production curation job runs them:
    // quality filter → corpus-wide line dedup → duplicated-span removal →
    // whole-doc near-dedup → benchmark decontamination → α-tempered
    // source mixing → chunking into 64-token training sequences, in ONE
    // driver entry. Plan discipline across the composition: the corpus
    // text column is scanned once per detection phase and NEVER shuffled
    // (line/span removal are map-side broadcast-set filters; near-dedup
    // and decontamination shuffle 8-16-byte keys; mixing is a pure
    // bucket-filter projection; chunking is explode over counts) — every
    // corpus-sized exchange in the composed plan carries ids, hashes or
    // counts. Deterministic end-to-end ⇒ golden-pinned; per-doc summary
    // rows (doc_id, source, n_tokens, n_chunks).
    "q_curate_e2e" -> ((s, dir) => {
      LazyFrame(s, StructType(Seq(StructField("doc_id", LongType),
        StructField("source", StringType), StructField("n_tokens", IntegerType),
        StructField("n_chunks", LongType)))) {
        curatePipeline(s, dir)
      }.orderBy("doc_id")
    }),

    // ---------------- training-data ops: dedup / similarity / text /
    // multimodal (model- or hash-dependent: rows-only driver check;
    // gated by OperatorsSpec) ----
    "q_dedup_minhash" -> ((s, dir) =>
      operators.Dedup.nearDuplicates(
        t(s, dir, "documents").select("doc_id", "text"), 0.8)
        .withColumn("jaccard", round(col("jaccard"), 4))
        .orderBy("doc_a", "doc_b")),
    // fuzzy (minhash-Jaccard) decontamination against the same planted
    // eval split as q_decontaminate — catches paraphrased leakage exact
    // n-grams miss (signature-deterministic: golden-pinned)
    "q_decontaminate_fuzzy" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      operators.Dedup.decontaminateFuzzy(
        d.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        d.filter(pmod(col("doc_id"), lit(97)) === 0), 0.8)
        .orderBy("doc_id")
    }),
    "q_dedup_simhash" -> ((s, dir) =>
      operators.Dedup.simhashDuplicates(
        t(s, dir, "documents").select("doc_id", "text"), 3)
        .orderBy("doc_a", "doc_b")),
    "q_dedup_fingerprint" -> ((s, dir) =>
      operators.Dedup.fingerprintGroups(
        t(s, dir, "documents").select("doc_id", "text"))
        .orderBy("fp")),
    // the end-to-end near-dedup most consumers run: minhash-LSH pairs →
    // exact-Jaccard verify → connected components → keep one canonical
    // per cluster + all unpaired docs (signature-deterministic: golden-
    // pinned; rows-only driver check)
    "q_dedup_drop" -> ((s, dir) =>
      operators.Dedup.dropNearDuplicates(
        t(s, dir, "documents").select("doc_id", "text"), 0.8)
        .select("doc_id")
        .orderBy("doc_id")),
    // incremental NEAR-dedup: history = the near-dedup'd 3/4 of the corpus
    // (the operator's precondition), batch = the held-out 1/4 plus planted
    // near-clones of history docs; the batch is probed against history's
    // minhash band-key index WITHOUT re-running LSH over history, and the
    // survivor set equals the full recompute restricted to the batch
    // (asserted in OperatorsSpec; signature-deterministic: golden-pinned)
    "q_dedup_inc_near" -> ((s, dir) => {
      LazyFrame(s, StructType(Seq(StructField("doc_id", LongType)))) {
        val d = t(s, dir, "documents").select("doc_id", "text")
        // history/batch are each evaluated several times downstream (band
        // keys, shingles, candidate-sliver text, the final anti-join) —
        // without a materialization every evaluation re-runs the full
        // dropNearDuplicates chain; the checkpoint makes them leaves
        // (same rows, ContextCleaner-reclaimed)
        val history = operators.Dedup.dropNearDuplicates(
          d.filter(pmod(col("doc_id"), lit(4)) =!= 0), 0.8)
          .localCheckpoint(true)
        val batch = d.filter(pmod(col("doc_id"), lit(4)) === 0)
          .unionByName(history.filter(col("doc_id") < 40)
            .select((col("doc_id") + 3000000).as("doc_id"),
              concat(col("text"), lit(" extra")).as("text")))
          .localCheckpoint(true)
        operators.Dedup.incrementalNewNear(
          operators.Dedup.bandIndexFor(history), history, batch, 0.8)
          .select("doc_id")
      }.orderBy("doc_id")
    }),
    "q_dedup_embedding" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      // plant exact duplicates so the demo provably surfaces pairs
      val planted = emb.unionByName(emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      operators.Similarity.embeddingNearDuplicates(planted, 0.95)
        .withColumn("cos", round(col("cos"), 4))
        .orderBy("doc_a", "doc_b")
    }),
    // SemDeDup-style semantic dedup end-to-end: LSH cosine pairs at 0.95
    // → connected components → one canonical per group; survivor set is
    // plane-deterministic (golden-pinned; rows-only driver check). Same
    // planted duplicates as q_dedup_embedding so removal provably fires.
    "q_semdedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = emb.unionByName(emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      operators.Similarity.dropSemanticDuplicates(planted, 0.95)
        .select("vec_id")
        .orderBy("vec_id")
    }),
    "q_knn_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10), emb, 5).orderBy("q_id", "rank")
    }),
    "q_knn_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      operators.Similarity.ivfTopK(s, emb.filter(col("vec_id") < 10), emb, 5)
        .orderBy("q_id", "rank")
    }),
    "q_lsh_buckets" -> ((s, dir) =>
      operators.Similarity.lshBuckets(t(s, dir, "embeddings"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")),
    // the PNG/WAV RENDER dominates this query (measured 2.3 s render vs
    // 0.6 s decode+featurize, single-threaded) and the one-row-group
    // fixture file scans as ONE task, so the render projection is spread
    // over round-robin partitions first. extractFeatures' batch_size
    // column is partition-layout-dependent by design (it proves the
    // batching), so the payload is brought back to the scan's layout —
    // one partition in doc_id order (= the fixture's file order) — before
    // the batched extract: batch composition, and therefore every output
    // row, is byte-identical to the unpartitioned plan (golden-pinned).
    "q_multimodal" -> ((s, dir) =>
      operators.Multimodal.extractFeatures(s,
        operators.Multimodal.synthesizeMedia(
          t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism))
          .repartition(1).sortWithinPartitions("doc_id"))
        .toDF()
        .select(col("doc_id"), size(col("feat")).as("feat_dim"),
          element_at(col("feat"), 1).as("f0"), col("batch_size"),
          col("decode_ok"))
        // the extract output is ONE partition (pinned above), so a
        // within-partition sort IS the global doc_id order — without the
        // range-sort sampling pass, which re-ran the whole decode
        .sortWithinPartitions("doc_id")),
    "q_multimodal_audio" -> ((s, dir) =>
      operators.Multimodal.extractAudioFeatures(s,
        operators.Multimodal.synthesizeAudio(
          t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism))
          .repartition(1).sortWithinPartitions("doc_id"))
        .toDF()
        .select(col("doc_id"), size(col("feat")).as("feat_dim"),
          element_at(col("feat"), 1).as("rms"), col("batch_size"),
          col("decode_ok"))
        .sortWithinPartitions("doc_id")),
    "q_langid_docs" -> ((s, dir) =>
      operators.TextAnalysis.langIdBreakdown(t(s, dir, "documents"))
        .orderBy("lang_label", "lang_pred")),
    "q_pipeline_rulehits" -> ((s, dir) => {
      Sessions.tune(s)
      QualityPipeline.score(SynthStore(synthTurns(dir)).read(s).toDF())
        .select(explode(col("rule_hits")).as("rule"))
        .groupBy("rule").agg(count(lit(1)).as("hits"))
        .orderBy("rule")
    }),

    // ---------------- more window/set/array/map coverage ----
    "q_window_rolling" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
      t(s, dir, "events")
        .withColumn("roll", sum("value").over(w))
        .select(col("event_id"), cents(col("roll")).as("roll_cents"))
        .orderBy("event_id")
    }),
    "q_intersect" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"))
        .intersect(t(s, dir, "orders").select(col("o_custkey").as("c_custkey")))
        .agg(count(lit(1)).as("n"))),
    "q_word_freq" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(filter(split(lower(col("text")), "[^\\p{L}\\p{N}]+"),
          x => length(x) > 0)).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(25)),
    "q_map_hist" -> ((s, dir) => {
      // MapType round-trip: per-user event_type histogram as a map column,
      // then re-exploded — net result oracle-checkable as a plain groupBy
      t(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("c"))))).as("hist"))
        .select(col("user_id"), explode(col("hist")).as(Seq("event_type", "n")))
        .orderBy("user_id", "event_type")
    }),
    "q_rulehits_sketch" -> ((s, dir) => {
      // ⚙️ TypedImperativeAggregate: one-pass rule-hit map, no explode shuffle
      Sessions.tune(s)
      val scored = QualityPipeline.score(SynthStore(synthTurns(dir)).read(s).toDF())
      scored.agg(guards.expr.RuleHitCounts(col("rule_hits")).as("hits"))
        .select(explode(col("hits")).as(Seq("rule", "hits")))
        .orderBy("rule")
    }),

    // ---------------- typed UDAF / approx / ranking / cube / edit distance ----
    "q_udaf_pricing" -> ((s, dir) => {
      val priceStats = udaf(operators.Aggregators.PriceStats)
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(priceStats(col("o_totalprice")).as("ps"))
        .select(col("o_orderstatus"), col("ps.n").as("n"), col("ps.cents").as("cents"))
        .orderBy("o_orderstatus")
    }),
    "q_udaf_convstats" -> ((s, dir) => {
      // typed-Dataset aggregator path: KeyValueGroupedDataset.agg(toColumn).
      // Built on the generator's OBJECT chain (flatMap → map → groupByKey
      // fuse via EliminateSerialization, zero columnar round trip) — the
      // store's columnar read would re-serialize just to deserialize again
      // for the typed key function.
      SynthStore.genTurns(s, synthTurns(dir))
        .map(_.toTurn)(org.apache.spark.sql.Encoders.product[core.Turn])
        .groupByKey(_.conv_id)(org.apache.spark.sql.Encoders.STRING)
        .agg(operators.Aggregators.ConvStats.toColumn.name("cs"))
        .toDF("conv_id", "cs")
        .select(count(lit(1)).as("n_convs"), sum(col("cs.nTurns")).as("n_turns"),
          max(col("cs.maxIdx")).as("max_idx"))
    }),
    "q_approx_distinct" -> ((s, dir) => {
      // #27 HLL++ with the error bound ASSERTED in the output (|approx-exact|
      // ≤ 3·rsd·exact), so the DuckDB oracle can pin `approx_ok = true`
      val rsd = 0.05
      t(s, dir, "events")
        .agg(
          approx_count_distinct(col("user_id"), rsd).as("a"),
          countDistinct(col("user_id")).as("e"))
        .select(col("e").as("exact_users"),
          (abs(col("a") - col("e")) <= lit(3 * rsd) * col("e")).as("approx_ok"))
    }),
    "q_sort_partitions" -> ((s, dir) => {
      // #37 sortWithinPartitions: per-partition order with NO global sort
      // exchange; sortedness is verified inside each partition and reduced
      import s.implicits._
      val sorted = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"))
        .repartition(col("l_orderkey"))
        .sortWithinPartitions("l_orderkey", "l_linenumber")
      sorted.as[(Long, Int)].mapPartitions { it =>
        var n = 0L
        var ok = true
        var has = false
        var pk = 0L
        var pl = 0
        it.foreach { case (k, l) =>
          if (has && (k < pk || (k == pk && l < pl))) ok = false
          pk = k; pl = l; has = true; n += 1
        }
        Iterator((n, ok))
      }.toDF("np", "okp")
        .agg(sum("np").as("n"), min("okp").as("all_sorted"))
    }),
    "q_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("quartile", ntile(4).over(w))
        .groupBy("lang", "quartile")
        .agg(count(lit(1)).as("n"), max("n_chars").as("max_chars"))
        .orderBy("lang", "quartile")
    }),
    "q_cube" -> ((s, dir) =>
      t(s, dir, "documents")
        .cube("lang", "source")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("lang"), lit("_all")).as("lang"),
          coalesce(col("source"), lit("_all")).as("source"), col("n"))
        .orderBy("lang", "source")),
    "q_levenshtein" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          levenshtein(lower(col("p_name")), lower(col("p_type"))).as("dist"))
        .orderBy("p_partkey")),

    // ---------------- token counting / quality scoring (oracle-checked) ----
    "q_tokens" -> ((s, dir) =>
      operators.TextAnalysis.tokenCounts(
        t(s, dir, "documents").orderBy("doc_id"))),
    "q_quality" -> ((s, dir) =>
      operators.TextAnalysis.qualitySignals(
        t(s, dir, "documents").orderBy("doc_id"))),
    // exact percentiles (linear interpolation — the sequence-length stats a
    // curriculum/packing stage reads); DuckDB quantile_cont is the same
    // definition
    "q_percentile" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy("source")
        .agg(
          round(percentile(col("n_chars"), lit(0.5)) * 100).cast("long").as("p50_c"),
          round(percentile(col("n_chars"), lit(0.9)) * 100).cast("long").as("p90_c"),
          round(percentile(col("n_chars"), lit(0.99)) * 100).cast("long").as("p99_c"),
          count(lit(1)).as("n"))
        .orderBy("source")),
    // sequence packing + deterministic split: hash/partition-layout
    // dependent (rows-only driver check; gated by PackingSpec)
    "q_packing" -> ((s, dir) => {
      // a null text must surface as 0 tokens here, not as a null count
      // (packSequences rejects null/negative counts with a typed error —
      // correct for a data bug, wrong for this demo's null policy). NB
      // coalesce-to-'' would NOT do it: size(split("", "\\s+")) is 1
      val docs = t(s, dir, "documents").select(col("doc_id"),
        when(col("text").isNull, 0)
          .otherwise(size(split(col("text"), "\\s+"))).as("n_tokens"))
      operators.Packing.packingStats(
        operators.Packing.packSequences(docs, maxTokens = 256, numPartitions = 8),
        maxTokens = 256)
    }),
    // oversize-chunking policy (Packing.chunkTokens): deterministic pure
    // projection ⇒ DuckDB-oracled via generate_series
    "q_chunks" -> ((s, dir) => {
      // coalesce on BOTH sides (oracle too): a null text is one empty
      // chunk, not a raise_error here / dropped row in DuckDB
      val docs = t(s, dir, "documents").select(col("doc_id"),
        coalesce(regexp_count(col("text"), lit("\\S+")).cast("int"), lit(0))
          .as("n_tokens"))
      operators.Packing.chunkTokens(docs, "doc_id", 64)
        .orderBy("doc_id", "chunk_idx")
    }),
    "q_split" -> ((s, dir) =>
      operators.Sampling.assignSplit(t(s, dir, "events"), "user_id",
        valPermille = 50, testPermille = 50)
        .groupBy("split")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("split")),
    "q_remix" -> ((s, dir) =>
      operators.Sampling.remix(t(s, dir, "documents"), "source", "doc_id",
        Map("src0" -> 0.4, "src1" -> 2.0, "src2" -> 2.5))
        .groupBy("source")
        .agg(count(lit(1)).as("n"), max("mix_copy").as("max_copy"))
        .orderBy("source")),
    // end-to-end training-data composition: quality filter → conv-level
    // dedup → split → pack (1/4 corpus like q_pipeline_mp; summary row)
    "q_training_e2e" -> ((s, dir) => {
      Sessions.tune(s)
      val kept = QualityPipeline.score(
        SynthStore(math.max(1000L, synthTurns(dir) / 4)).read(s).toDF())
        .filter(col("keep"))
      val (_, res) = pipeline.TrainingDataJob.assign(s, kept, maxTokens = 2048)
      import s.implicits._
      Seq((res.convsIn, res.convsKept,
        res.splitConvs.getOrElse("train", 0L),
        res.splitConvs.getOrElse("val", 0L),
        res.splitConvs.getOrElse("test", 0L),
        res.bins, math.round(res.fillRatio * 10000)))
        .toDF("convs_in", "convs_kept", "n_train", "n_val", "n_test",
          "bins", "fill_bp")
    }))

  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_distinct" ->
      "SELECT count(DISTINCT o_custkey) AS n_cust, count(*) AS n FROM orders",
    "q_join_bcast" ->
      """SELECT r_name, count(*) AS n_cust,
        | CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_join_smj" ->
      """SELECT o_orderstatus, count(*) AS n_lines, sum(l_quantity) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_join_semi" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_outer" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_range" ->
      """SELECT b.event_type AS event_type, count(*) AS n
        |FROM events a JOIN events b ON a.user_id = b.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |WHERE a.event_type = 'purchase'
        |GROUP BY b.event_type ORDER BY event_type""".stripMargin,
    "q_join_asof" ->
      """SELECT event_id, coalesce(prev_click_val, -1) AS prev_click_val FROM (
        |  SELECT event_id, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_val
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q_join_full" ->
      """SELECT coalesce(a.user_id, b.user_id) AS user_id,
        | CAST(coalesce(n_purchase, 0) AS BIGINT) AS n_purchase,
        | CAST(coalesce(n_signup, 0) AS BIGINT) AS n_signup
        |FROM (SELECT user_id, count(*) AS n_purchase FROM events
        |      WHERE event_type = 'purchase' GROUP BY user_id) a
        |FULL JOIN (SELECT user_id, count(*) AS n_signup FROM events
        |      WHERE event_type = 'signup' GROUP BY user_id) b
        |ON a.user_id = b.user_id
        |ORDER BY user_id""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_name, o_orderstatus""".stripMargin,
    "q_join_salted" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_approx_distinct" ->
      """SELECT count(DISTINCT user_id) AS exact_users, true AS approx_ok
        |FROM events""".stripMargin,
    "q_sort_partitions" ->
      "SELECT count(*) AS n, true AS all_sorted FROM lineitem",
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(round(o_totalprice*100) AS BIGINT) AS price_cents FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_window_lag" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CASE WHEN value > prev_value THEN 1 ELSE 0 END) AS BIGINT) AS n_up FROM (
        |  SELECT event_type, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |  FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(n_name, '_all') AS n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name) ORDER BY n_name""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_set_except" ->
      """SELECT count(*) AS n FROM (
        |  SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)""".stripMargin,
    "q_dropdup" ->
      """SELECT count(*) AS n FROM (
        |  SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)""".stripMargin,
    "q_json" ->
      """SELECT event_type,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_time_bucket" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        | count(*) AS n, count(DISTINCT user_id) AS users
        |FROM events GROUP BY 1 ORDER BY hour_epoch""".stripMargin,
    "q_strings" ->
      """SELECT doc_id, length(text) AS n_cp, upper(substring(text, 1, 8)) AS head8,
        | length(replace(text, ' ', '')) AS n_nospace
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_array_stats" ->
      """SELECT vec_id, len(embedding) AS dim,
        | list_aggregate(embedding, 'max') AS emb_max,
        | list_aggregate(embedding, 'min') AS emb_min
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_doc_rules" ->
      """SELECT doc_id,
        | (length(text) BETWEEN 2 AND 8000) AS ok_len,
        | (len(regexp_extract_all(lower(text), '[\p{L}\p{N}]+')) BETWEEN 1 AND 2000) AS ok_words,
        | (100*len(regexp_extract_all(text, '[^\p{L}\p{N}\s]')) <= 30*length(text)) AS ok_sym,
        | (100*len(regexp_extract_all(text, '[0-9]')) <= 50*length(text)) AS ok_digit
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      """SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_distinct
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_dedup_first" ->
      """SELECT count(*) AS n FROM (
        |  SELECT text, min(doc_id) AS keep_id FROM documents GROUP BY text)""".stripMargin,
    "q_dedup_incremental" ->
      """WITH incoming AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text || ' v2' AS text
        |  FROM documents WHERE doc_id % 7 = 3)
        |SELECT i.doc_id FROM incoming i
        |WHERE NOT EXISTS (SELECT 1 FROM documents h WHERE h.text = i.text)
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_inc_hashed" ->
      """WITH incoming AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text || ' v2' AS text
        |  FROM documents WHERE doc_id % 7 = 3)
        |SELECT i.doc_id FROM incoming i
        |WHERE NOT EXISTS (SELECT 1 FROM documents h WHERE h.text = i.text)
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_inc_fallback" ->
      """WITH incoming AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text || ' v2' AS text
        |  FROM documents WHERE doc_id % 7 = 3)
        |SELECT i.doc_id FROM incoming i
        |WHERE NOT EXISTS (SELECT 1 FROM documents h WHERE h.text = i.text)
        |ORDER BY doc_id""".stripMargin,
    // full transitive closure via recursive CTE = the ground truth for the
    // iterative hash-min components (same prefix/suffix edge relation)
    "q_dedup_groups" ->
      """WITH RECURSIVE base AS (
        |  SELECT l.doc_a, r.doc_b FROM
        |    (SELECT doc_id AS doc_a, substr(text, 1, 40) AS k FROM documents) l
        |    JOIN (SELECT doc_id AS doc_b, substr(text, 1, 40) AS k FROM documents) r
        |    USING (k)
        |  WHERE l.doc_a < r.doc_b
        |  UNION
        |  SELECT l.doc_a, r.doc_b FROM
        |    (SELECT doc_id AS doc_a,
        |            substr(text, greatest(length(text) - 39, 1)) AS k FROM documents) l
        |    JOIN (SELECT doc_id AS doc_b,
        |            substr(text, greatest(length(text) - 39, 1)) AS k FROM documents) r
        |    USING (k)
        |  WHERE l.doc_a < r.doc_b
        |),
        |edges AS (SELECT doc_a AS s, doc_b AS d FROM base
        |          UNION SELECT doc_b, doc_a FROM base),
        |reach(s, d) AS (
        |  SELECT s, s FROM edges
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
        |)
        |SELECT s AS doc_id, min(d) AS component FROM reach
        |GROUP BY s ORDER BY doc_id""".stripMargin,
    // corpus-line dedup: the same 8-token line chunking, frequency
    // threshold and in-order reassembly in plain SQL (list slicing is
    // 1-based inclusive = Spark's slice(arr, start, len) element set;
    // generate_series keeps the ≥1-line guard so both sides give every
    // doc at least one (possibly empty) line)
    "q_dedup_lines" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w
        |           FROM documents),
        |lines AS (
        |  SELECT doc_id, i AS line_idx,
        |         array_to_string(w[(i*8+1):((i+1)*8)], ' ') AS line
        |  FROM (SELECT doc_id, w,
        |          unnest(generate_series(0,
        |            greatest(CAST(ceil(len(w)/8.0) AS BIGINT), 1) - 1)) AS i
        |        FROM d)),
        |freq AS (SELECT line FROM lines GROUP BY line
        |         HAVING count(DISTINCT doc_id) > 2),
        |kept AS (SELECT doc_id, line_idx, line FROM lines
        |         WHERE line NOT IN (SELECT line FROM freq)),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |               string_agg(line, ' ' ORDER BY line_idx) AS text_clean
        |        FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
        |SELECT t.doc_id, t.n_lines, coalesce(a.n_kept, 0) AS n_kept,
        |       coalesce(a.text_clean, '') AS text_clean
        |FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // duplicated-span removal: 16-token windows (1-based inclusive array
    // slices), doc-frequency > 1, a token is dropped iff some flagged
    // window of ITS OWN doc covers it, kept tokens re-joined in order
    "q_dedup_spans" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w
        |           FROM documents),
        |wins AS (
        |  SELECT doc_id, s, array_to_string(w[s:s+15], ' ') AS win
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 15)) AS s
        |        FROM d WHERE len(w) >= 16)),
        |freq AS (SELECT win FROM wins GROUP BY win
        |         HAVING count(DISTINCT doc_id) > 1),
        |bad AS (SELECT doc_id, s FROM wins WHERE win IN (SELECT win FROM freq)),
        |toks AS (SELECT doc_id, unnest(generate_series(1, len(w))) AS i FROM d),
        |keptTok AS (
        |  SELECT t.doc_id, t.i FROM toks t
        |  WHERE NOT EXISTS (SELECT 1 FROM bad b
        |                    WHERE b.doc_id = t.doc_id
        |                      AND t.i BETWEEN b.s AND b.s + 15)),
        |agg AS (SELECT k.doc_id, count(*) AS n_kept,
        |               string_agg(dd.w[k.i], ' ' ORDER BY k.i) AS text_clean
        |        FROM keptTok k JOIN d dd ON k.doc_id = dd.doc_id
        |        GROUP BY k.doc_id),
        |tot AS (SELECT doc_id, len(w) AS n_tokens FROM d)
        |SELECT t.doc_id, t.n_tokens, coalesce(a.n_kept, 0) AS n_kept,
        |       coalesce(a.text_clean, '') AS text_clean
        |FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // newline-policy line dedup: the same re-lining regexp (2 ws-tokens
    // per line via backref replacement — RE2 supports \1 in REPLACEMENT,
    // only pattern-side backrefs are unsupported), split on chr(10), the
    // same df > 2 threshold, in-order '\n' reassembly
    "q_dedup_lines_nl" ->
      """WITH d AS (SELECT doc_id,
        |             string_split(regexp_replace(coalesce(text, ''),
        |               '(\S+ \S+) ', '\1' || chr(10), 'g'), chr(10)) AS ls
        |           FROM documents),
        |lines AS (
        |  SELECT doc_id, i AS line_idx, ls[i] AS line
        |  FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i
        |        FROM d)),
        |freq AS (SELECT line FROM lines GROUP BY line
        |         HAVING count(DISTINCT doc_id) > 2),
        |kept AS (SELECT doc_id, line_idx, line FROM lines
        |         WHERE line NOT IN (SELECT line FROM freq)),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |               string_agg(line, chr(10) ORDER BY line_idx) AS text_clean
        |        FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
        |SELECT t.doc_id, t.n_lines, coalesce(a.n_kept, 0) AS n_kept,
        |       coalesce(a.text_clean, '') AS text_clean
        |FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q_quality_rep" ->
      """WITH wds AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\p{L}\p{N}]+')) AS word
        |  FROM documents),
        |wc AS (SELECT doc_id, word, count(*) AS c FROM wds GROUP BY doc_id, word),
        |ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |              count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS max_word_n
        |       FROM wc GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, list_transform(generate_series(1, len(w) - 1),
        |                                i -> array_to_string(w[i:i+1], ' ')) AS grams
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[\p{L}\p{N}]+') AS w
        |        FROM documents)),
        |bgc AS (SELECT doc_id, gram, count(*) AS c
        |        FROM (SELECT doc_id, unnest(grams) AS gram FROM bg)
        |        GROUP BY doc_id, gram),
        |bgs AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS max_bigram_n
        |        FROM bgc GROUP BY doc_id)
        |SELECT ws.doc_id, n_words, n_distinct, max_word_n,
        |       coalesce(max_bigram_n, 0) AS max_bigram_n,
        |       (max_word_n * 5 <= n_words
        |        AND coalesce(max_bigram_n, 0) * 8 <= n_words) AS ok_rep
        |FROM ws LEFT JOIN bgs ON ws.doc_id = bgs.doc_id
        |ORDER BY ws.doc_id""".stripMargin,
    "q_decontaminate" ->
      """WITH g AS (
        |  SELECT doc_id, list_transform(generate_series(1, len(w) - 4),
        |                                i -> array_to_string(w[i:i+4], ' ')) AS grams
        |  FROM (SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS w
        |        FROM documents)),
        |bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
        |hits AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0)
        |  WHERE gram IN (SELECT gram FROM bg))
        |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
        |LEFT JOIN hits h ON d.doc_id = h.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // mixing plan: same α=0.5 tempering, 100k budget, round-then-rate
    // order (rate uses the ROUNDED target, as the Spark side does)
    "q_mix_plan" ->
      """WITH d AS (SELECT source,
        |             len(regexp_extract_all(coalesce(text, ''), '\S+')) AS nt
        |           FROM documents),
        |s AS (SELECT source, count(*) AS n_docs,
        |             CAST(sum(nt) AS BIGINT) AS n_tokens
        |      FROM d GROUP BY source),
        |p AS (SELECT *, pow(CAST(n_tokens AS DOUBLE), 0.5) AS pw FROM s),
        |t AS (SELECT sum(pw) AS spw FROM p),
        |x AS (SELECT source, n_docs, n_tokens,
        |             CAST(round(pw / spw * 1000000) AS BIGINT) AS weight_ppm,
        |             CAST(round(pw / spw * 100000) AS BIGINT) AS target_tokens
        |      FROM p, t)
        |SELECT source, n_docs, n_tokens, weight_ppm, target_tokens,
        |       CAST(round(least(1.0,
        |         CAST(target_tokens AS DOUBLE) / n_tokens) * 1000000)
        |         AS BIGINT) AS rate_ppm
        |FROM x ORDER BY source""".stripMargin,
    // drift: identical smoothing ((c+1)/(T+V)) and ln; one output row
    "q_drift" ->
      """WITH wa AS (
        |  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
        |                '[\p{L}\p{N}]+')) AS word
        |  FROM documents WHERE doc_id % 3 <> 0),
        |wb AS (
        |  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')),
        |                '[\p{L}\p{N}]+')) AS word
        |  FROM documents WHERE doc_id % 3 = 0),
        |ca AS (SELECT word, count(*) AS ca FROM wa GROUP BY word),
        |cb AS (SELECT word, count(*) AS cb FROM wb GROUP BY word),
        |v AS (SELECT coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |      FROM ca FULL JOIN cb USING (word)),
        |t AS (SELECT CAST(sum(ca) AS BIGINT) AS A, CAST(sum(cb) AS BIGINT) AS B,
        |             count(*) AS V FROM v),
        |p AS (SELECT (ca + 1.0) / (A + V) AS pa, (cb + 1.0) / (B + V) AS pb,
        |             A, B, V
        |      FROM v, t)
        |SELECT A AS n_tokens_a, B AS n_tokens_b, V AS n_vocab,
        |       CAST(round(sum(pa * ln(pa / pb)) * 1000000) AS BIGINT) AS kl_ab_u,
        |       CAST(round(sum(pb * ln(pb / pa)) * 1000000) AS BIGINT) AS kl_ba_u,
        |       CAST(round(sum(pa * ln(2 * pa / (pa + pb)) / 2
        |                      + pb * ln(2 * pb / (pa + pb)) / 2) * 1000000)
        |            AS BIGINT) AS js_u
        |FROM p GROUP BY A, B, V""".stripMargin,
    // BM25: same tokenization, idf = ln(1+(N-df+0.5)/(df+0.5)),
    // k1=1.2 b=0.75; unmatched docs score 0
    "q_bm25" ->
      """WITH d AS (SELECT doc_id,
        |             regexp_extract_all(lower(coalesce(text, '')), '[\p{L}\p{N}]+') AS w
        |           FROM documents),
        |dl AS (SELECT doc_id, len(w) AS dl FROM d),
        |stats AS (SELECT count(*) AS n, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, word, count(*) AS tf
        |       FROM (SELECT doc_id, unnest(w) AS word FROM d)
        |       WHERE word IN ('spark', 'window', 'customer')
        |       GROUP BY doc_id, word),
        |idf AS (SELECT word, ln(1 + (n - count(*) + 0.5) / (count(*) + 0.5)) AS idf
        |        FROM tf, stats GROUP BY word, n),
        |sc AS (SELECT tf.doc_id,
        |              sum(idf * tf * 2.2
        |                  / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS score
        |       FROM tf JOIN idf USING (word) JOIN dl USING (doc_id), stats
        |       GROUP BY tf.doc_id)
        |SELECT l.doc_id, l.dl AS n_words,
        |       CAST(round(coalesce(score, 0) * 1000000) AS BIGINT) AS score_u
        |FROM dl l LEFT JOIN sc ON l.doc_id = sc.doc_id
        |ORDER BY l.doc_id""".stripMargin,
    // cluster-balanced sampling: same row_number contract as
    // q_source_cap, partitioned by the SQL-expressible stand-in cid;
    // DuckDB's % can be negative, so the cid mirrors Spark's pmod via
    // ((x % 16) + 16) % 16
    "q_cluster_sample" ->
      """WITH a AS (
        |  SELECT vec_id,
        |         ((CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT)
        |           % 16) + 16) % 16 AS cid,
        |         CAST((vec_id * 2654435761) % 1000003 AS DOUBLE) AS score
        |  FROM embeddings)
        |SELECT cid, rank, vec_id, score FROM (
        |  SELECT cid, CAST(row_number() OVER (PARTITION BY cid
        |           ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
        |         vec_id, score
        |  FROM a)
        |WHERE rank <= 5 ORDER BY cid, rank""".stripMargin,
    // per-source cap: row_number mirrors TopKByScore's ranking order
    // (score DESC, id ASC) exactly; the IS NOT NULL guard pins the
    // operator's null-scores-never-rank contract (no-op on this fixture,
    // where n_chars is never null)
    "q_source_cap" ->
      """SELECT source, rank, doc_id, score FROM (
        |  SELECT source,
        |         CAST(row_number() OVER (PARTITION BY source
        |           ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank,
        |         doc_id, CAST(n_chars AS DOUBLE) AS score
        |  FROM documents WHERE n_chars IS NOT NULL)
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    // DSIR importance: add-one-smoothed unigram log-likelihood ratio over
    // the union vocabulary, averaged per doc occurrence
    "q_dsir" ->
      """WITH dwords AS (
        |  SELECT doc_id,
        |         unnest(regexp_extract_all(lower(text), '[\p{L}\p{N}]+')) AS word
        |  FROM documents WHERE doc_id % 7 <> 0),
        |twords AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[\p{L}\p{N}]+')) AS word
        |  FROM documents WHERE doc_id % 7 = 0),
        |rcnt AS (SELECT word, count(*) AS rc FROM dwords GROUP BY word),
        |tcnt AS (SELECT word, count(*) AS tc FROM twords GROUP BY word),
        |vocab AS (SELECT coalesce(rcnt.word, tcnt.word) AS word,
        |                 coalesce(rc, 0) AS rc, coalesce(tc, 0) AS tc
        |          FROM rcnt FULL JOIN tcnt ON rcnt.word = tcnt.word),
        |tot AS (SELECT CAST(sum(rc) AS BIGINT) AS R,
        |               CAST(sum(tc) AS BIGINT) AS T,
        |               count(*) AS V FROM vocab),
        |w AS (SELECT word, ln((tc + 1.0) / (T + V)) - ln((rc + 1.0) / (R + V)) AS w
        |      FROM vocab, tot)
        |SELECT doc_id, count(*) AS n_words,
        |       CAST(round(avg(w) * 1000000) AS BIGINT) AS score_u
        |FROM dwords JOIN w USING (word)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_window_rolling" ->
      """SELECT event_id, CAST(round(roll*100) AS BIGINT) AS roll_cents FROM (
        |  SELECT event_id, sum(value) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll
        |  FROM events)
        |ORDER BY event_id""".stripMargin,
    "q_intersect" ->
      """SELECT count(*) AS n FROM (
        |  SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)""".stripMargin,
    "q_word_freq" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
        |                            x -> x <> '')) AS word
        |  FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 25""".stripMargin,
    "q_map_hist" ->
      """SELECT user_id, event_type, count(*) AS n FROM events
        |GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin,
    "q_udaf_pricing" ->
      """SELECT o_orderstatus, count(*) AS n,
        | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_ntile" ->
      """SELECT lang, quartile, count(*) AS n, max(n_chars) AS max_chars FROM (
        |  SELECT lang, n_chars,
        |    ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS quartile
        |  FROM documents)
        |GROUP BY lang, quartile ORDER BY lang, quartile""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(lang, '_all') AS lang, coalesce(source, '_all') AS source,
        | count(*) AS n
        |FROM documents GROUP BY CUBE(lang, source) ORDER BY lang, source""".stripMargin,
    "q_levenshtein" ->
      """SELECT p_partkey, levenshtein(lower(p_name), lower(p_type)) AS dist
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_chunks" ->
      """SELECT doc_id, chunk_idx, least(64, n - chunk_idx * 64) AS n_tokens
        |FROM (
        |  SELECT doc_id, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx, n
        |  FROM (
        |    SELECT doc_id, n,
        |           greatest(CAST(ceil(n / 64.0) AS BIGINT), 1) AS n_chunks
        |    FROM (SELECT doc_id,
        |                 coalesce(len(regexp_extract_all(text, '\S+')), 0) AS n
        |          FROM documents)))
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_tokens" ->
      """SELECT doc_id,
        | len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
        | len(regexp_extract_all(lower(text), '[\p{L}\p{N}]+')) AS n_words,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality" ->
      """SELECT doc_id, length(text) AS n_cp,
        | len(regexp_extract_all(lower(text), '[\p{L}\p{N}]+')) AS n_words,
        | len(regexp_extract_all(lower(text), '\b(the|and|for|with|that|this|from|have|are|was)\b')) AS n_stop,
        | (length(text) BETWEEN 20 AND 8000
        |   AND len(regexp_extract_all(lower(text), '[\p{L}\p{N}]+')) >= 5
        |   AND 20*len(regexp_extract_all(lower(text), '\b(the|and|for|with|that|this|from|have|are|was)\b'))
        |       >= len(regexp_extract_all(lower(text), '[\p{L}\p{N}]+'))) AS ok_quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_percentile" ->
      """SELECT source,
        | CAST(round(quantile_cont(n_chars, 0.5) * 100) AS BIGINT) AS p50_c,
        | CAST(round(quantile_cont(n_chars, 0.9) * 100) AS BIGINT) AS p90_c,
        | CAST(round(quantile_cont(n_chars, 0.99) * 100) AS BIGINT) AS p99_c,
        | count(*) AS n
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)
}
