package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Training-data pipeline operators beyond the reference's surface:
  * benchmark decontamination and deterministic data-mixing sampling.
  * (The reference stops at storage/search — these are the corpus-prep
  * steps a 100 TB pretraining pipeline runs on top, per the brief.)
  */
object Decontam {

  /** Benchmark decontamination: for every training document, the fraction
    * of its distinct word n-gram shingles that appear ANYWHERE in the
    * eval/benchmark corpus — the standard n-gram-overlap contamination
    * test (GPT-3 appendix C / PaLM-style 8-gram checks, here over
    * n-grams of the caller's choosing).
    *
    * Scale shape: one shingle-keyed equi-join (the eval side is
    * `distinct` shingles — typically small enough that Spark broadcasts
    * it) followed by one per-doc aggregation; both linear, no cross
    * product. Documents with fewer than n tokens have no shingles and are
    * absent from the output (no 0/0 row).
    *
    * Output: (id, n_shingles, n_hit, overlap_frac), one row per training
    * doc with ≥1 shingle.
    */
  def overlap(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val ts = Dedup.shingles(train, idCol, textCol, n)
    val es = Dedup.shingles(evalSet, idCol, textCol, n)
      .select(col("shingle")).distinct()
      .withColumn("_hit", lit(1L))
    ts.join(es, Seq("shingle"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
      .select(col("id"), col("n_shingles"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_shingles").cast("double"),
          6).as("overlap_frac"))
  }

  /** The removal step after [[overlap]]: drop training documents whose
    * eval-overlap fraction is ≥ `maxFrac`. Documents too short to
    * shingle cannot be contaminated and are KEPT — [[overlap]] emits no
    * row for them, so an inner join on the scores would silently drop
    * them (the classic decontam-clean bug); the anti-join against the
    * FLAGGED set keeps everything else by construction. One extra
    * broadcast-sized anti-join over [[overlap]]'s shape.
    */
  def clean(train: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 3, maxFrac: Double = 0.8): DataFrame = {
    require(maxFrac > 0.0 && maxFrac <= 1.0, s"maxFrac $maxFrac not in (0,1]")
    val flagged = overlap(train, evalSet, idCol, textCol, n)
      .where(col("overlap_frac") >= maxFrac)
      .select(col("id").as(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }
}

/** Deterministic sampling for data mixing. */
object Sampling {

  /** Stratified hash sampling: keep a row iff
    * `md5(id) mod 1000 < round(rate(stratum)·1000)`. Deterministic (same
    * id → same decision on every run and every engine — md5 is portable
    * to the DuckDB oracle), single scan, no shuffle, no state: exactly
    * how a 100 TB mixing pass wants to subsample strata to quota.
    * Thresholds are integer-rounded ONCE on the driver so float
    * representation (0.3·1000 = 299.999…) can never shift a boundary.
    */
  def stratifiedHash(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[Any, Double], defaultRate: Double): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val h = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long"),
      lit(1000L))
    val threshold = rates.foldLeft(lit(math.round(defaultRate * 1000)): Column) {
      case (acc, (k, v)) =>
        when(col(strataCol) === lit(k), lit(math.round(v * 1000))).otherwise(acc)
    }
    df.where(h < threshold)
  }

  /** Weighted hash sampling: keep a row iff
    * `md5(id) mod 1e6 < min(1e6, weight · scalePerUnit)` — i.e. keep
    * probability proportional to an integer weight column (length-
    * proportional corpus sampling), saturating at 1. All-integer
    * threshold math so the decision is bit-identical on every engine
    * (no float rounding at a boundary). Single scan, no shuffle,
    * deterministic — rerunning the pipeline keeps the SAME rows.
    */
  def weightedHash(df: DataFrame, idCol: String, weightCol: Column,
      scalePerUnit: Long): DataFrame = {
    require(scalePerUnit > 0, "scalePerUnit must be positive")
    val h = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long"),
      lit(1000000L))
    val threshold =
      least(lit(1000000L), weightCol.cast("long") * lit(scalePerUnit))
    df.where(h < threshold)
  }

  /** EXACT-size weighted sample without replacement (Efraimidis &
    * Spirakis 2006, A-ES): each row draws a deterministic uniform
    * u ∈ (0,1] from md5(id:seed) and ranks by ln(u)/w — the top-n ranks
    * are a weighted sample of exactly n rows. The quota form a curation
    * pass needs when the downstream budget is firm; [[weightedHash]] is
    * the Bernoulli (expected-size) form. Rank keys are rounded to 6
    * decimals and tie-broken by id, so the selection is bit-reproducible
    * across engines (libm `ln` may differ in the last ulp).
    *
    * Scale shape: one hash projection + a global top-n via
    * TakeOrderedAndProject — bounded per-partition heaps, never a full
    * sort; only n rows per partition move. Rows with non-positive
    * weight are excluded (their keep probability is 0).
    */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: Column,
      n: Int, seed: String): DataFrame = {
    require(n > 0, s"weightedTopK: n must be positive ($n)")
    val h = pmod(
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
        lit(seed))), 1, 15), 16, 10).cast("long"),
      lit(1000000L))
    val u = (h + 1).cast("double") / 1e6
    df.where(weightCol > 0)
      .withColumn("sample_key",
        round(log(u) / weightCol.cast("double"), 6))
      .orderBy(col("sample_key").desc, col(idCol).asc)
      .limit(n)
  }

  /** Deterministic seeded shuffle-and-shard: the global training order a
    * data loader consumes, WITHOUT a global sort. Each row hashes to
    * `(shard, position)` — shard = md5(id:seed) mod nShards, position =
    * rank of the hash within the shard — so the full order is (shard asc,
    * pos asc), reproducible from (data, seed) alone, and changing the
    * seed is a fresh permutation.
    *
    * Scale shape: one hash per row (no shuffle) + one per-shard window
    * (shuffles by shard, sorts WITHIN shards only). At 100 TB you size
    * nShards so a shard is a few GB (e.g. 65536): the sort is
    * per-partition, never global — this is exactly how training-data
    * orders are materialized (shard files + intra-shard order).
    */
  def shuffleShards(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = conv(substring(
      md5(concat(col(idCol).cast("string"), lit(":"), lit(seed))), 1, 15),
      16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h").asc, col(idCol).asc)
    df.select(col(idCol), h.as("h"), pmod(h, lit(nShards.toLong)).as("shard"))
      .withColumn("pos", row_number().over(w))
      .drop("h")
  }

  /** Curriculum length-bucketing: assign every document to a log2 length
    * bucket (bucket b holds docs of 2^b ≤ tokens < 2^(b+1)) plus a
    * deterministic hash position within its bucket — the (bucket asc,
    * pos asc) order is a shortest-first curriculum with intra-bucket
    * shuffling, and bucket-homogeneous batches waste no padding.
    *
    * The bucket is computed in INTEGER space (length of the binary
    * representation) — `floor(log2(x))` in floats can land on either side
    * at exact powers of two depending on the engine's libm, and a
    * boundary flip is a different curriculum.
    *
    * Scale shape: same as [[shuffleShards]] — narrow per-row math, one
    * per-bucket window. Zero-token docs land in bucket 0.
    */
  def curriculumBuckets(df: DataFrame, idCol: String,
      tokenCount: Column): DataFrame = {
    val nt = tokenCount.cast("long")
    val bucket = (length(bin(greatest(nt, lit(1L)))) - 1).cast("long")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("h").asc, col(idCol).asc)
    df.select(col(idCol), nt.as("n_tokens"), bucket.as("bucket"), h.as("h"))
      .withColumn("pos", row_number().over(w))
      .drop("h")
  }

  /** Hard per-key cap (the CCNet/Gopher per-domain limit): keep at most
    * `maxPerKey` rows of each key, chosen deterministically — rank rows
    * within a key by (seeded md5 hash, id) and keep rank <= cap, so the
    * retained subset is a uniform seeded sample, stable across reruns,
    * and changing the seed redraws it.
    *
    * Scale shape: one key-partitioned window (sort WITHIN keys only — the
    * shuffle key is the domain, a hot domain is AQE's skew case). For
    * web-scale hot keys, pre-thin with [[stratifiedHash]] at a rate
    * comfortably above cap/keyRows, then apply the exact cap to the
    * survivors — the window then sorts thousands of rows per key, not
    * millions.
    *
    * Output: the kept rows with their `pos` (1..cap) within the key.
    */
  def capPerKey(df: DataFrame, idCol: String, keyCol: String,
      maxPerKey: Int, seed: String): DataFrame = {
    require(maxPerKey >= 1, "maxPerKey must be >= 1")
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
      lit(seed))), 1, 15), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_h").asc, col(idCol).asc)
    df.withColumn("_h", h)
      .withColumn("pos", row_number().over(w))
      .where(col("pos") <= maxPerKey)
      .drop("_h")
  }

  /** Mix a corpus to target source weights under a token budget (the
    * Pile/Dolma-style mixture step): given per-source mixture weights and
    * a total token budget, each source s gets acceptance rate
    * `min(1, budget · w_s / tokens_s)` (w normalized over the given
    * sources) and rows pass a deterministic md5 gate at that rate —
    * integer-threshold decisions, so membership is bit-identical on every
    * engine and stable across reruns. Rates saturate at 1: a source too
    * small for its target share contributes everything it has (the
    * standard single-epoch mix; oversample by repeating the pass with a
    * different seed downstream if a source must be up-sampled).
    *
    * Scale shape: one per-source token aggregation (sources are the
    * weight map's keys — driver-bounded by construction), broadcast back
    * as a literal rate expression; the gate is a single scan, no shuffle.
    * Sources absent from `weights` are dropped (weight 0).
    *
    * Output: kept rows + (rate_ppm) — parts-per-million acceptance rate
    * of the row's source, for downstream accounting.
    */
  def mixToBudget(df: DataFrame, idCol: String, keyCol: String,
      tokensCol: Column, weights: Map[String, Double], budgetTokens: Long,
      seed: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0) &&
      weights.values.sum > 0, "weights must be non-negative, not all zero")
    require(budgetTokens > 0, "budgetTokens must be positive")
    val wNorm = {
      val tot = weights.values.sum
      weights.view.mapValues(_ / tot).toMap
    }
    val srcTokens: Map[String, Long] = df
      .where(col(keyCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(keyCol)).agg(sum(tokensCol.cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ppm thresholds computed driver-side in one deterministic expression
    // per source: floor(min(1, budget*w/tokens) * 1e6)
    val ppm: Map[String, Long] = srcTokens.map { case (s, t) =>
      val rate = math.min(1.0, budgetTokens.toDouble * wNorm(s) / t.toDouble)
      s -> math.floor(rate * 1000000.0).toLong
    }
    val h = pmod(
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
        lit(seed))), 1, 15), 16, 10).cast("long"),
      lit(1000000L))
    val thr = ppm.foldLeft(lit(0L): Column) { case (acc, (s, p)) =>
      when(col(keyCol) === lit(s), lit(p)).otherwise(acc)
    }
    df.withColumn("rate_ppm", thr).where(h < col("rate_ppm"))
  }

  /** [[mixToBudget]] WITHOUT the rate clamp — the multi-epoch half of the
    * mixture step: a source whose target share exceeds its size is
    * UPSAMPLED, each row emitting `floor(r)` whole copies plus one more
    * iff the integer-ppm md5 gate passes the fractional part (so expected
    * copies = r exactly, and membership/copy-count are bit-identical on
    * every engine). Output rows carry `copy` (0-based) — a downstream
    * seeded shuffle ([[shuffleShards]] keyed on (id, copy)) spreads the
    * repeats apart, the standard way upsampled epochs interleave.
    *
    * Scale shape: identical to [[mixToBudget]] — one driver-bounded
    * per-source token aggregation broadcast back as literal thresholds,
    * then one scan with a per-row `sequence` explode (max copies is
    * ceil(max rate), a small constant by construction).
    */
  def mixToBudgetUpsampling(df: DataFrame, idCol: String, keyCol: String,
      tokensCol: Column, weights: Map[String, Double], budgetTokens: Long,
      seed: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0) &&
      weights.values.sum > 0, "weights must be non-negative, not all zero")
    require(budgetTokens > 0, "budgetTokens must be positive")
    val wNorm = {
      val tot = weights.values.sum
      weights.view.mapValues(_ / tot).toMap
    }
    val srcTokens: Map[String, Long] = df
      .where(col(keyCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(keyCol)).agg(sum(tokensCol.cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // fail LOUDLY on a weighted source with zero total tokens: its
    // unclamped rate would be Infinity, floor(rate).toLong saturates to
    // Long.MaxValue whole copies, and the sequence() explode would then
    // attempt ~2^63 rows per input row instead of surfacing the bad input
    srcTokens.foreach { case (s, t) =>
      require(t > 0 || wNorm(s) == 0.0,
        s"mixToBudgetUpsampling: source '$s' has weight ${wNorm(s)} but " +
          s"zero total tokens — an upsampling rate is undefined; drop the " +
          s"source or give its rows non-empty text")
    }
    // per source: whole copies + fractional ppm gate (UNCLAMPED rate)
    val parts: Map[String, (Long, Long)] = srcTokens.map { case (s, t) =>
      val rate = budgetTokens.toDouble * wNorm(s) / t.toDouble
      val whole = math.floor(rate).toLong
      s -> (whole, math.floor((rate - whole) * 1000000.0).toLong)
    }
    val h = pmod(
      conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
        lit(seed))), 1, 15), 16, 10).cast("long"),
      lit(1000000L))
    val whole = parts.foldLeft(lit(0L): Column) { case (acc, (s, (w, _))) =>
      when(col(keyCol) === lit(s), lit(w)).otherwise(acc)
    }
    val fracPpm = parts.foldLeft(lit(0L): Column) { case (acc, (s, (_, p))) =>
      when(col(keyCol) === lit(s), lit(p)).otherwise(acc)
    }
    val n = whole + when(h < fracPpm, 1L).otherwise(0L)
    df.withColumn("_n_copies", n)
      .where(col("_n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("_n_copies") - 1)))
      .drop("_n_copies")
  }
}

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw-corpus document by how much more
  * likely its hashed-n-gram features are under a TARGET distribution
  * (the domain you want more of) than under the RAW distribution — then
  * resample raw data ∝ exp(weight). This is the standard
  * domain-upweighting pass of LLM pretraining pipelines.
  */
object Dsir {

  /** Per-document DSIR log importance weight over hashed unigram
    * features: tokens hash into `buckets` bins (md5-based — portable to
    * any engine, so the score is reproducible bit-for-bit across stacks),
    * both corpora reduce to `buckets`-sized count vectors, and each raw
    * doc scores
    *
    *   avg over token occurrences of ln p̂_target(b)/p̂_raw(b)
    *
    * with add-one smoothing (p̂(b) = (c(b)+1)/(N+B)). The average (not
    * the sum) keeps the weight length-independent — DSIR's n-gram model
    * normalizes the same way.
    *
    * Scale shape: token explode is a narrow map; BOTH distributions are
    * ≤ `buckets` rows, so the per-occurrence joins are broadcasts; one
    * per-doc aggregation ends the job. No shuffle touches the corpus
    * except the final groupBy(id) — linear at 100 TB.
    *
    * Output: (id, n_tokens, dsir_logratio), one row per raw doc with ≥1
    * token, weights rounded to 6 decimals (cross-engine fp determinism).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame = {
    val m = train(raw, target, idCol, textCol, buckets)
    score(m, raw, idCol, textCol)
  }

  /** The trained pair of hashed-unigram count distributions. Both count
    * frames are ≤ `buckets` rows (broadcast-sized); the totals are plain
    * longs so scoring needs no stream-static cross join.
    */
  final case class Model(cntT: DataFrame, cntR: DataFrame,
      nT: Long, nR: Long, buckets: Int)

  private def occOf(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, withId: Boolean): DataFrame = {
    val tok = explode(graft.text.TextAnalysis.wsTokens(col(textCol))).as("t")
    val base =
      if (withId) df.select(col(idCol).as("id"), tok) else df.select(tok)
    base.withColumn("b",
      pmod(conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"),
        lit(buckets.toLong)))
  }

  /** Estimate both distributions ONCE (the DSIR deployment shape: train
    * on the corpora, then score any number of documents — batch or
    * stream — against the frozen model).
    */
  def train(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): Model = {
    require(buckets > 0, "buckets must be positive")
    val cntT = occOf(target, idCol, textCol, buckets, withId = false)
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val cntR = occOf(raw, idCol, textCol, buckets, withId = true)
      .groupBy("b").agg(count(lit(1)).as("cr"))
    // sum() over an empty frame is SQL NULL — surface "corpus has no
    // tokens" instead of an opaque NPE
    val tRow = cntT.agg(sum(col("ct"))).collect()(0)
    val rRow = cntR.agg(sum(col("cr"))).collect()(0)
    require(!tRow.isNullAt(0), "DSIR target corpus has no tokens")
    require(!rRow.isNullAt(0), "DSIR raw corpus has no tokens")
    Model(cntT, cntR, tRow.getLong(0), rRow.getLong(0), buckets)
  }

  /** Score documents against a frozen [[Model]]. Works unchanged on a
    * STREAMING frame (the count joins are stream-static broadcasts, the
    * totals are literals) — the per-doc weight is a pure function of the
    * doc and the model, so any micro-batching yields the batch result.
    * Buckets absent from a distribution smooth to count 0 (add-one).
    */
  def score(m: Model, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    occOf(docs, idCol, textCol, m.buckets, withId = true)
      .join(broadcast(m.cntT), Seq("b"), "left")
      .join(broadcast(m.cntR), Seq("b"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        round(
          avg(log(coalesce(col("ct"), lit(0L)) + lit(1)) -
              log(coalesce(col("cr"), lit(0L)) + lit(1))) +
            log(lit(m.nR.toDouble) + lit(m.buckets.toDouble)) -
            log(lit(m.nT.toDouble) + lit(m.buckets.toDouble)),
          6).as("dsir_logratio"))
}

/** Per-source corpus report card — the observability step every curation
  * pipeline runs after (and between) its filter/dedup stages: what each
  * source contributes (docs, tokens), its length distribution, and its
  * exact-duplicate fraction. Dashboards and mixing decisions read this,
  * so the numbers must be REPRODUCIBLE — everything here is
  * deterministic, no sampling.
  */
object Profile {

  /** One row per `keyCol` value: doc/token counts, mean token count,
    * p50/p90 char-length, and the fraction of docs whose FULL text is an
    * exact duplicate of some other doc corpus-wide (cross-source dups
    * count in every source holding a copy — that is the number a mixing
    * decision needs).
    *
    * 100 TB shape: one scan computes all per-row scalars (token count is
    * the same codegen'd split the pipeline's other text ops use), the dup
    * flag is one 128-bit-hash groupBy (the `dedup_exact` shuffle) joined
    * back by hash, and the report is a groupBy(source) over scalars.
    * `percentile` is the exact sorted-buffer aggregate — right for
    * report-sized groups at these sfs; at 100 TB swap `percentile` for
    * `approx_percentile(…, 1e-4)` (the report tolerates approximation,
    * the oracle here does not).
    */
  def sourceProfile(df: DataFrame, keyCol: String, textCol: String)
      : DataFrame = {
    val ntok = size(filter(split(lower(col(textCol)), "\\s+"),
      t => length(t) > 0)).cast("long")
    val rows = df.select(col(keyCol), col(textCol),
      ntok.as("_nt"), length(col(textCol)).cast("long").as("_nc"),
      md5(col(textCol)).as("_h"))
    val dups = rows.groupBy(col("_h")).agg(count(lit(1)).as("_cnt"))
      .where(col("_cnt") >= 2).select(col("_h"), lit(1).as("_dup"))
    rows.join(dups, Seq("_h"), "left")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_nt")).as("total_tokens"),
        round(avg(col("_nt")), 6).as("avg_tokens"),
        round(expr("percentile(_nc, 0.5)"), 6).as("p50_chars"),
        round(expr("percentile(_nc, 0.9)"), 6).as("p90_chars"),
        round(avg(coalesce(col("_dup"), lit(0)).cast("double")), 6)
          .as("dup_frac"))
      .orderBy(col(keyCol).asc)
  }
}
