package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Components, Dedup}
import graft.text.TextAnalysis

/** Training-data-pipeline operator coverage (dedup / text analysis /
  * similarity), oracle-checked like [[Queries]].
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def r6(c: Column): Column = round(c, 6)

  /** Scratch dir for the eager dedup pipelines, unique per Spark
    * application AND per input dataset: two concurrent sessions (separate
    * JVMs → distinct applicationIds) or two scale factors in one session
    * can no longer overwrite each other's materialized pairs mid-read.
    * Within one application the path is stable, so repeated runs (bench
    * warm-up + measured iterations) reuse the same dirs in overwrite mode.
    */
  private val cleanupRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def scratch(s: SparkSession, dir: String, name: String): String = {
    val appRoot = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft-${s.sparkContext.applicationId}")
    // one shutdown hook per JVM reclaims this application's scratch tree —
    // per-app paths stop collisions but would otherwise accumulate forever
    if (cleanupRegistered.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(appRoot)
      }))
    val dsetTag = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir))
    s"$appRoot/q_${name}_$dsetTag"
  }

  // ------------------------------------------------------- text analysis

  /** Token counting: whitespace tokens + BPE-ish regex tokens. */
  /** [[t]] round-robin-widened to the session's parallelism
    * ([[graft.functions.spread_input]]): the CPU-heavy row-local text
    * queries otherwise run on the ONE scan task a bench-scale single-file
    * table produces (r12 OptProbe: 2-3x at sf0.1/32 cores); no-op at real
    * scan widths, so the 100 TB plan is unchanged.
    */
  private def tw(s: SparkSession, dir: String, name: String): DataFrame =
    graft.functions.spread_input(t(s, dir, name))

  def tokenCount(s: SparkSession, dir: String): DataFrame =
    tw(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("ws_tokens"),
        TextAnalysis.regexTokenCount(col("text")).cast("long").as("re_tokens"))
      .orderBy(col("doc_id").asc)

  /** PII scrubbing ([[graft.text.Scrub]]): mask emails/URLs/phones and
    * count the masks. The synthetic corpus contains none, so the query
    * INJECTS deterministic PII-shaped suffixes (keyed on doc_id, written
    * identically in the SQL oracle) — the check then covers the real
    * machinery: portable regex masking + match counting on both engines.
    */
  def textScrub(s: SparkSession, dir: String): DataFrame = {
    import graft.text.Scrub
    val aug = tw(s, dir, "documents").select(col("doc_id"), concat(
      col("text"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(" see https://example.org/item/"), col("doc_id"),
          lit(" today"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit(" call +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" soon"))).otherwise(lit(""))).as("aug"))
    aug.select(col("doc_id"),
      Scrub.count(col("aug"), Scrub.EmailRe).cast("long").as("n_email"),
      Scrub.count(col("aug"), Scrub.UrlRe).cast("long").as("n_url"),
      Scrub.count(col("aug"), Scrub.PhoneRe).cast("long").as("n_phone"),
      Scrub.scrub(col("aug")).as("scrubbed"))
      .orderBy(col("doc_id").asc)
  }

  /** The composite keep/drop decision a training pipeline actually ships:
    * length bounds, quality floor ([[TextAnalysis.qualityFromParts]] over
    * once-materialized signals), contact-spam ceiling ([[graft.text.Scrub]]
    * counts over the same deterministic PII injection as `text_scrub`) —
    * first failing rule wins, decisions made on ROUNDED quality so the
    * boundary is reproducible cross-engine. One scan, no shuffle until the
    * output sort.
    */
  def pipelineFilter(s: SparkSession, dir: String): DataFrame = {
    import graft.text.Scrub
    val aug = tw(s, dir, "documents").select(col("doc_id"), col("text"), concat(
      col("text"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(" see https://example.org/item/"), col("doc_id"),
          lit(" today"))).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit(" call +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" soon"))).otherwise(lit(""))).as("aug"))
    aug
      .withColumn("toks", TextAnalysis.wsTokens(col("text")))
      .withColumn("ntok", size(col("toks")).cast("long"))
      .withColumn("quality", round(TextAnalysis.qualityFromParts(
        size(col("toks")).cast("double"),
        TextAnalysis.markerRatio(col("toks"), "en"),
        TextAnalysis.punctRatio(col("text")),
        TextAnalysis.meanWordLen(col("toks"))), 6))
      .withColumn("n_contact",
        (Scrub.count(col("aug"), Scrub.EmailRe) +
          Scrub.count(col("aug"), Scrub.UrlRe) +
          Scrub.count(col("aug"), Scrub.PhoneRe)).cast("long"))
      .withColumn("reason",
        when(col("ntok") < 20, "too_short")
          .when(col("ntok") > 120, "too_long")
          .when(col("quality") < 0.6, "low_quality")
          .when(col("n_contact") >= 3, "contact_spam")
          .otherwise("ok"))
      .select(col("doc_id"), col("ntok"), col("quality"), col("n_contact"),
        (col("reason") === "ok").as("keep"), col("reason"))
      .orderBy(col("doc_id").asc)
  }

  /** Language-ID + quality scoring over the documents corpus. The token
    * array is materialized ONCE into a column — langId/quality reference
    * it ~12 times and Catalyst does not CSE the regex split.
    */
  def langQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = col("toks")
    tw(s, dir, "documents")
      .withColumn("toks", TextAnalysis.wsTokens(col("text")))
      // materialize the shared signal columns ONCE (CollapseProject keeps
      // multiply-referenced non-cheap aliases in their own Project): the
      // lang-score struct feeds argmax + stop_ratio + quality, punct and
      // mean-word-length feed both their output and the quality score
      .withColumn("ls", TextAnalysis.langScores(toks))
      .withColumn("punct", TextAnalysis.punctRatio(col("text")))
      .withColumn("mwl", TextAnalysis.meanWordLen(toks))
      .select(col("doc_id"),
        TextAnalysis.langIdFromScores(col("ls")).as("pred_lang"),
        r6(col("ls.en")).as("stop_ratio"),
        r6(col("punct")).as("punct_ratio"),
        r6(col("mwl")).as("mean_wlen"),
        r6(TextAnalysis.qualityFromParts(size(toks).cast("double"),
          col("ls.en"), col("punct"), col("mwl"))).as("quality"))
      .orderBy(col("doc_id").asc)
  }

  /** Repetition quality signals (the Gopher / RefinedWeb repetition
    * rules, adapted to single-line docs): per document, the fraction of
    * bigram (trigram) occurrences claimed by the single most frequent
    * bigram (trigram), and the fraction of 5-gram occurrences that are
    * duplicates. High values flag boilerplate and degenerate repetition.
    *
    * Shape: the three gram streams are tagged (`2:`/`3:`/`5:` prefixes)
    * and exploded ONCE — one (doc, gram)-keyed count shuffle, one
    * (doc, n) rollup, no per-n re-scan of the corpus.
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.wsTokens(col("text"))
    def tagged(n: Int): Column =
      transform(TextAnalysis.ngrams(col("toks"), n),
        g => concat(lit(s"$n:"), g))
    val exploded = tw(s, dir, "documents")
      .withColumn("toks", toks)
      .select(col("doc_id"),
        explode(concat(tagged(2), tagged(3), tagged(5))).as("g"))
    val perN = exploded.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .withColumn("n", substring(col("g"), 1, 1))
      .groupBy("doc_id", "n")
      .agg(max("c").as("top"), sum("c").as("tot"), count(lit(1)).as("dist"))
    val sig = perN.groupBy("doc_id").agg(
      max(when(col("n") === "2",
        col("top").cast("double") / col("tot").cast("double"))).as("t2"),
      max(when(col("n") === "3",
        col("top").cast("double") / col("tot").cast("double"))).as("t3"),
      max(when(col("n") === "5",
        (col("tot") - col("dist")).cast("double") / col("tot").cast("double"))).as("d5"))
    t(s, dir, "documents").select(col("doc_id"))
      .join(sig, Seq("doc_id"), "left")
      .select(col("doc_id"),
        r6(coalesce(col("t2"), lit(0.0))).as("top2_frac"),
        r6(coalesce(col("t3"), lit(0.0))).as("top3_frac"),
        r6(coalesce(col("d5"), lit(0.0))).as("dup5_frac"))
      .orderBy(col("doc_id").asc)
  }

  /** Canonical-form md5 fingerprint per document. */
  def fingerprintQ(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id").asc)

  // --------------------------------------------------------------- dedup

  /** Exact dedup groups by canonical fingerprint. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")
      .select(col("keep_id"), col("n_dups"), col("fp"))
      .orderBy(col("keep_id").asc)

  /** Exact word-3-gram Jaccard near-dup pairs (>= 0.8). LAZY form: the
    * oracle/bench consumer materializes the frame exactly once, so the
    * single-job lazy plan beats the eager parquet round-trip of
    * [[graft.dedup.Dedup.jaccardPairsTo]] (which exists for pipelines that
    * REUSE the pairs — e.g. cluster closure).
    */
  def dedupJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text", 3, 0.8)
      .select(col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))
      .orderBy(col("id_a").asc, col("id_b").asc)

  /** MinHash+LSH near-dup pipeline, exact-Jaccard-verified candidates.
    * Routed through the eager scoped-cache twin ([[Dedup.minhashLshTo]],
    * the `dedup_clusters` pattern): the lazy form re-derives the whole
    * shingle → md5 → signature pipeline once per band-self-join alias
    * and the candidate pairs three more times (24 corpus scans in one
    * plan; interleaved A/B −35-38%), while the twin's persists are
    * scoped and released in its finally — the cache-hygiene contract a
    * bare localCheckpoint in the lazy plan would break. Same rows; the
    * scratch dir is per-application temp, rewritten every invocation.
    */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshTo(t(s, dir, "documents"), "doc_id", "text",
        scratch(s, dir, "minhash"),
        n = 3, numHashes = 32, rowsPerBand = 4, minJaccard = 0.8)
      .select(col("id_a"), col("id_b"), r6(col("jaccard")).as("jaccard"))
      .orderBy(col("id_a").asc, col("id_b").asc)

  /** Duplicate clusters: exact-fingerprint + MinHash-LSH near-dup
    * relations closed under connectivity (alternating large-star/
    * small-star CC). One row per document; cluster_id = min reachable id.
    */
  def dedupClustersQ(s: SparkSession, dir: String): DataFrame =
    Components.dedupClusters(t(s, dir, "documents"), "doc_id", "text",
        workDir = Some(scratch(s, dir, "clusters")))
      .select(col("id").as("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id").asc)

  /** Portable 60-bit SimHash bit-string per document. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashBits(t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("simhash"))
      .orderBy(col("doc_id").asc)

  /** Embedding cosine near-duplicate pairs via the banded-SRP scale path
    * (bucket join + exact verify — NO cartesian product). The raw
    * embeddings carry no high-cosine pairs (max ≈ 0.60), so the query
    * derives a corpus with PLANTED near-duplicates: every vector is
    * unioned with a perturbed copy (vec_id + 1000000; per-dimension delta
    * from a portable md5 hash, the identical derivation the DuckDB oracle
    * computes). Planted pairs land at cos ≈ 0.99, background stays ≤ 0.62,
    * and the 0.9 threshold separates them with a wide margin at every sf.
    */
  def neardupCosine(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    // NB: rename to src_id BEFORE aliasing vec_id+1000000 as "vec_id" —
    // Spark's lateral-column-alias resolution would otherwise bind the
    // col("vec_id") inside the lambda to the NEW alias, while DuckDB's
    // lambda binds the table column (engines diverge silently).
    val pert = emb.select(col("vec_id").as("src_id"), col("embedding"))
      .select(
        (col("src_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) => {
          val h = Dedup.portableHash(col("src_id"), (i + 1).cast("string"))
          (x.cast("double") + (h % 201 - 100).cast("double") / 4000.0).cast("float")
        }).as("embedding"))
    val corpus = emb.unionByName(pert)
    Dedup.srpNearDups(corpus, "vec_id", "embedding", dim = 64,
        threshold = 0.9)
      .select(col("id_a"), col("id_b"), r6(col("cos")).as("cos"))
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  /** Hard per-source cap ([[graft.pipeline.Sampling.capPerKey]]): at most
    * 10 docs per source, chosen by seeded-hash rank — the CCNet/Gopher
    * per-domain limit.
    */
  def capPerKeyQ(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sampling.capPerKey(t(s, dir, "documents"),
        "doc_id", "source", maxPerKey = 10, seed = "cap0")
      .select(col("doc_id"), col("source"), col("pos"))
      .orderBy(col("doc_id").asc)

  /** Token-budget corpus mixing ([[graft.pipeline.Sampling.mixToBudget]]):
    * mix four sources to binary-exact target weights under a budget of
    * 3/4 of their total chars — src0's 0.5 share saturates (keeps all),
    * the others sample at their computed ppm rate. Weights are powers of
    * two so the normalization and rate doubles are bit-identical in
    * DuckDB regardless of summation order.
    */
  def mixBudgetQ(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val srcs = Seq("src0", "src1", "src2", "src3")
    val weights = Map("src0" -> 0.5, "src1" -> 0.25,
      "src2" -> 0.125, "src3" -> 0.125)
    val total = docs.where(col("source").isin(srcs: _*))
      .agg(sum(col("n_chars"))).collect()(0).getLong(0)
    graft.pipeline.Sampling.mixToBudget(docs, "doc_id", "source",
        col("n_chars"), weights, budgetTokens = total * 3 / 4, seed = "mix0")
      .select(col("doc_id"), col("source"), col("n_chars"), col("rate_ppm"))
      .orderBy(col("doc_id").asc)
  }

  /** Upsampling mixture ([[graft.pipeline.Sampling.mixToBudgetUpsampling]]):
    * same sources/weights as `pipeline_mix_budget` but a budget of 2×
    * the corpus, so the heavy source (w=0.5 over a ~quarter-sized share)
    * must repeat rows: floor(rate) whole copies per row + an md5-ppm
    * gate on the fractional part, each output row tagged with its copy
    * index. One scan + a per-row sequence explode.
    */
  def mixEpochsQ(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val srcs = Seq("src0", "src1", "src2", "src3")
    val weights = Map("src0" -> 0.5, "src1" -> 0.25,
      "src2" -> 0.125, "src3" -> 0.125)
    val total = docs.where(col("source").isin(srcs: _*))
      .agg(sum(col("n_chars"))).collect()(0).getLong(0)
    graft.pipeline.Sampling.mixToBudgetUpsampling(docs, "doc_id", "source",
        col("n_chars"), weights, budgetTokens = total * 2, seed = "mix1")
      .select(col("doc_id"), col("source"), col("n_chars"), col("copy"))
      .orderBy(col("doc_id").asc, col("copy").asc)
  }

  /** SemDeDup ([[graft.dedup.Dedup.semanticDedup]], Abbas et al. 2023):
    * cluster-scoped semantic dedup over the same perturbed-twin corpus as
    * `neardup_cosine`, with `label` as the cluster key (any assignment
    * works — IVF cells at scale; label is the oracle-expressible choice).
    * Each >= 0.9-cosine duplicate group keeps the member farthest from
    * its cluster centroid.
    */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val pert = emb
      .select(col("vec_id").as("src_id"), col("embedding"), col("label"))
      .select(
        (col("src_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) => {
          val h = Dedup.portableHash(col("src_id"), (i + 1).cast("string"))
          (x.cast("double") + (h % 201 - 100).cast("double") / 4000.0)
            .cast("float")
        }).as("embedding"),
        col("label"))
    val corpus = emb.unionByName(pert)
    Dedup.semanticDedup(corpus, "vec_id", "embedding", "label",
        eps = 0.9, dim = 64)
      .select(col("id").as("vec_id"), col("cluster").as("label"),
        col("component"), col("centroid_cos"), col("keep"))
      .orderBy(col("vec_id").asc)
  }

  /** Cluster-dedup RETENTION: the corpus a dedup pass actually ships —
    * exactly one canonical (minimum-id) document per duplicate cluster
    * ([[graft.dedup.Components.keepCanonical]] over the exact+MinHash-LSH
    * cluster relation). Output carries the text length so the oracle
    * checks content identity, not just the id set.
    */
  def dedupRetain(s: SparkSession, dir: String): DataFrame =
    Components.keepCanonical(t(s, dir, "documents"), "doc_id", "text",
        workDir = Some(scratch(s, dir, "retain")))
      .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
      .orderBy(col("doc_id").asc)

  /** Quality-aware retention ([[graft.dedup.Components.keepBest]]): keep
    * the LONGEST copy per duplicate cluster (length as the quality prior
    * — the common curation heuristic; any score column plugs in), ties →
    * lowest id. Same clusters pass as `dedup_retain`, one `max_by` per
    * cluster on top.
    */
  def dedupRetainBest(s: SparkSession, dir: String): DataFrame =
    Components.keepBest(t(s, dir, "documents"), "doc_id", "text",
        length(col("text")).cast("long"),
        workDir = Some(scratch(s, dir, "retainbest")))
      .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
      .orderBy(col("doc_id").asc)

  /** Benchmark decontamination ([[graft.pipeline.Decontam.overlap]]):
    * eval slice = doc_id ≡ 7 (mod 10), training = the rest; per training
    * doc, the fraction of its distinct 3-gram shingles found anywhere in
    * the eval slice. One shingle-keyed join + one per-doc agg — linear.
    */
  def decontamOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.pipeline.Decontam.overlap(
        docs.where(pmod(col("doc_id"), lit(10)) =!= 7),
        docs.where(pmod(col("doc_id"), lit(10)) === 7),
        "doc_id", "text", n = 3)
      .select(col("id").as("doc_id"), col("n_shingles"), col("n_hit"),
        col("overlap_frac"))
      .orderBy(col("doc_id").asc)
  }

  /** Decontamination REMOVAL ([[graft.pipeline.Decontam.clean]]): the
    * step after detection — training docs with ≥ 50% eval-shingle
    * overlap are dropped; docs too short to shingle are KEPT (they
    * cannot be contaminated — the spec-level trap an inner join on the
    * scores would fail).
    */
  def decontamClean(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.pipeline.Decontam.clean(
        docs.where(pmod(col("doc_id"), lit(10)) =!= 7),
        docs.where(pmod(col("doc_id"), lit(10)) === 7),
        "doc_id", "text", n = 3, maxFrac = 0.5)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id").asc)
  }

  /** Deterministic stratified data-mixing sample
    * ([[graft.pipeline.Sampling.stratifiedHash]]): labels 0/1/2 keep
    * 20%/35%/50%, the rest 80% — md5-hash gated, so the SAME rows are
    * kept on every run and in the DuckDB oracle.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sampling.stratifiedHash(t(s, dir, "embeddings"),
        "vec_id", "label",
        Map[Any, Double](0 -> 0.2, 1 -> 0.35, 2 -> 0.5),
        defaultRate = 0.8)
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id").asc)

  /** Deterministic length-weighted sample
    * ([[graft.pipeline.Sampling.weightedHash]]): keep probability
    * ∝ n_chars (saturating at 1 for docs ≥ 556 chars) — the
    * length-proportional corpus subsample a mixing pass uses when long
    * documents should survive at higher rates. All-integer threshold,
    * bit-identical to the DuckDB oracle.
    */
  def sampleWeighted(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sampling.weightedHash(t(s, dir, "documents"),
        "doc_id", col("n_chars"), scalePerUnit = 1800L)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id").asc)

  /** Unigram-LM perplexity scoring ([[graft.text.UnigramLM]]): per-doc
    * mean negative log-likelihood under the corpus's own unigram model —
    * the CCNet-style "how typical is this document" quality signal.
    */
  def unigramPpl(s: SparkSession, dir: String): DataFrame =
    graft.text.UnigramLM.scoreNll(tw(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_tokens"), col("nll"))
      .orderBy(col("doc_id").asc)

  /** Exact-size weighted sample ([[graft.pipeline.Sampling.weightedTopK]]):
    * exactly 120 docs, weight = whitespace token count, A-ES rank keys —
    * the firm-quota counterpart of `sample_weighted`'s Bernoulli form.
    */
  def sampleTopK(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sampling.weightedTopK(
        t(s, dir, "documents")
          .select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", col("n_tokens"), n = 120, seed = "s8")
      .select(col("doc_id"), col("n_tokens"), col("sample_key"))
      .orderBy(col("sample_key").desc, col("doc_id").asc)

  /** Bigram-LM perplexity ([[graft.text.BigramLM.scoreNll]]), add-1
    * smoothing: the conditional-model upgrade of `text_unigram_ppl` —
    * word-order anomalies score badly even when every token is common.
    */
  def bigramPpl(s: SparkSession, dir: String): DataFrame =
    graft.text.BigramLM.scoreNll(tw(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_bigrams"), col("nll"))
      .orderBy(col("doc_id").asc)

  /** Sequence packing ([[graft.pipeline.Packing]]): concat-then-chunk
    * documents (doc_id order, whitespace tokens) into 512-token packs via
    * the distributed exclusive prefix sum — NO global-order window.
    * Output is the per-pack manifest a batch loader reads.
    */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Packing.packSummary(
      graft.pipeline.Packing.packByBudget(
        t(s, dir, "documents"), "doc_id",
        TextAnalysis.tokenCount(col("text")), budget = 512L))

  /** Line-level exact dedup ([[graft.dedup.Dedup.dedupLines]] — the
    * CCNet/RefinedWeb boilerplate pass): drop every token whose exact
    * content repeats in ≥ 400 distinct documents and rebuild each doc in
    * original order. The corpus is single-line synthetic text, so the
    * verify instance runs at WORD granularity (sep = " ") where the
    * ultra-common tokens really do repeat corpus-wide; the operator's
    * default is newline granularity. The reassembly (posexplode →
    * ordered array_sort rebuild) is the part worth hash-checking.
    */
  def dedupLinesQ(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.dedupLines(t(s, dir, "documents"), "doc_id", "text",
        minDocFreq = 400, sep = " ")
      .select(col("id").as("doc_id"), col("text"), col("n_lines"),
        col("n_removed"))
      .orderBy(col("doc_id").asc)

  /** Exact duplicated-substring spans ([[graft.dedup.Dedup.duplicateSpans]],
    * Lee et al. 2022 ExactSubstr): maximal character spans covered by a
    * >=30-char substring occurring at least twice in the corpus.
    */
  def dedupSubstrSpans(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.duplicateSpans(t(s, dir, "documents"),
        "doc_id", "text", minLen = 30, portable = true)
      .select(col("id").as("doc_id"), col("span_start"), col("span_end"),
        col("span_len"))
      .orderBy(col("doc_id").asc, col("span_start").asc)

  /** ExactSubstr removal ([[graft.dedup.Dedup.removeDuplicateSpans]]):
    * every doc with its duplicated spans cut; compared by md5 so the
    * oracle hashes the rebuilt strings, not just counts.
    */
  def dedupSubstrClean(s: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.removeDuplicateSpans(t(s, dir, "documents"),
        "doc_id", "text", minLen = 30, portable = true)
      .select(col("id").as("doc_id"), md5(col("text").cast("binary"))
          .as("clean_md5"),
        length(col("text")).cast("long").as("clean_len"),
        col("n_spans"), col("n_removed"))
      .orderBy(col("doc_id").asc)

  /** DSIR importance weights ([[graft.pipeline.Dsir.importanceWeights]]):
    * target = docs with doc_id ≡ 7 (mod 10), raw = the rest; hashed
    * unigram buckets, add-one smoothing, length-normalized log ratio —
    * the domain-upweighting score a mixing pass resamples by.
    */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.pipeline.Dsir.importanceWeights(
        docs.where(pmod(col("doc_id"), lit(10)) =!= 7),
        docs.where(pmod(col("doc_id"), lit(10)) === 7),
        "doc_id", "text", buckets = 1024)
      .select(col("id").as("doc_id"), col("n_tokens"), col("dsir_logratio"))
      .orderBy(col("doc_id").asc)
  }

  /** Deterministic seeded shuffle-shard
    * ([[graft.pipeline.Sampling.shuffleShards]]): the reproducible
    * training order (shard, pos) a data loader consumes — md5-permuted,
    * re-derivable from (data, seed), no global sort.
    */
  def shuffleShardsQ(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sampling.shuffleShards(
        t(s, dir, "documents").select("doc_id"), "doc_id",
        seed = "epoch0", nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard").asc, col("pos").asc)

  /** Curriculum length buckets
    * ([[graft.pipeline.Sampling.curriculumBuckets]]): log2 token-count
    * buckets + deterministic intra-bucket position — shortest-first
    * curriculum order with padding-free bucket-homogeneous batches.
    */
  def curriculumQ(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sampling.curriculumBuckets(
        t(s, dir, "documents"), "doc_id",
        TextAnalysis.tokenCount(col("text")))
      .select(col("doc_id"), col("n_tokens"), col("bucket"), col("pos"))
      .orderBy(col("bucket").asc, col("pos").asc)

  /** Model-based quality scoring ([[graft.text.QualityClassifier.score]])
    * under a FROZEN linear model whose weights are a deterministic
    * function of the bucket id (`w(b) = ((b·2654435761 mod 1000) − 500)
    * / 1000`), so the DuckDB oracle reproduces the full scoring path —
    * md5 token buckets, L1 tf normalization, margin, sigmoid, the keep
    * threshold — without embedding a trained-float array in SQL. Real
    * training (distributed GD, one aggregate per iteration) is exercised
    * in `QualityClassifierSpec`; this row pins the scoring arithmetic
    * both engines must share. Scoring is row-local: the plan is scan →
    * project → sort, no shuffle before the output ordering.
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val m = graft.text.QualityClassifier.LinearQualityModel(64,
      Array.tabulate(64)(b => ((b * 2654435761L % 1000) - 500) / 1000.0),
      bias = 0.1)
    // spread at the INGEST point, not inside score — the operator itself
    // stays shuffle-free (plan-gated in QualityClassifierSpec); the
    // per-token md5 bucketing otherwise runs on the single scan task a
    // bench-scale file produces (r12: 1.95 s → 0.94 s at sf0.1)
    graft.text.QualityClassifier.score(m,
        graft.functions.spread_input(t(s, dir, "documents")),
        "doc_id", "text", threshold = 0.55)
      .orderBy(col("doc_id").asc)
  }

  /** Per-source corpus report card ([[graft.pipeline.Profile.sourceProfile]]):
    * docs/tokens per source, exact p50/p90 length, corpus-wide
    * exact-duplicate fraction — the observability row a mixing decision
    * reads. One scan for the per-row scalars + the `dedup_exact` hash
    * shuffle for the dup flag + one groupBy(source).
    */
  def sourceProfileQ(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Profile.sourceProfile(t(s, dir, "documents"),
      "source", "text")

  // ------------------------------------------------------------- wiring

  /** CCNet-style normalization ([[graft.text.TextAnalysis.normalizeText]])
    * over deterministically-augmented documents (the synthetic corpus is
    * clean ASCII, so accents, tabs, CRLFs, zero-width spaces and soft
    * hyphens are injected per doc_id — the same fixture-injection move as
    * `text_scrub`): control/format chars → space, explicit accent fold,
    * lowercase, whitespace collapse. One row-local projection.
    */
  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    val docs = tw(s, dir, "documents")
    val aug = concat(col("text"),
      when(col("doc_id") % 4 === 0,
        lit("\tCafé  \u200bRÉSUMÉ naïve\r\n"))
        .otherwise(lit("")),
      when(col("doc_id") % 6 === 0,
        lit(" ÀÉÎÕÜ çñ ÿ\u00ad"))
        .otherwise(lit("")))
    docs.select(col("doc_id"),
        graft.text.TextAnalysis.normalizeText(aug).as("norm_text"))
      .withColumn("n_chars", length(col("norm_text")).cast("long"))
      .orderBy(col("doc_id").asc)
  }

  /** End-to-end curation recipe — the four-stage composition a real
    * pipeline runs, built from the REAL library operators chained (not
    * re-implemented inline): [[graft.text.TextAnalysis.normalizeText]] →
    * token-count quality gate → [[graft.dedup.Dedup.exactDedup]]
    * (keep-min-id on the normalized text) →
    * [[graft.pipeline.Sampling.capPerKey]] (seeded per-source cap). The
    * oracle reproduces every stage, so composition — column threading,
    * dedup-after-normalize, cap-after-dedup ranks — is what this row
    * actually checks; each stage's own row checks it in isolation.
    * Shuffle budget: the dedup hash groupBy + the per-source cap window;
    * normalize and the gate fuse into the first scan.
    */
  def pipelineRecipe(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextAnalysis
    val docs = t(s, dir, "documents")
    val norm = docs.select(col("doc_id"), col("source"),
      TextAnalysis.normalizeText(col("text")).as("norm_text"))
    val kept = norm
      .withColumn("ntok",
        size(TextAnalysis.wsTokens(col("norm_text"))).cast("long"))
      .where(col("ntok") >= 5)
    val deduped = graft.dedup.Dedup.exactDedup(kept, "doc_id", "norm_text")
    val capped = graft.pipeline.Sampling.capPerKey(deduped, "doc_id",
      "source", maxPerKey = 60, seed = "recipe0")
    capped.select(col("doc_id"), col("source"), col("ntok"),
        col("pos").cast("long").as("pos"))
      .orderBy(col("doc_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_count" -> (tokenCount _),
    "text_normalize" -> (textNormalize _),
    "pipeline_recipe" -> (pipelineRecipe _),
    "text_lang_quality" -> (langQuality _),
    "text_fingerprint" -> (fingerprintQ _),
    "text_repetition" -> (textRepetition _),
    "text_scrub" -> (textScrub _),
    "pipeline_filter" -> (pipelineFilter _),
    "dedup_exact" -> (dedupExact _),
    "dedup_jaccard" -> (dedupJaccard _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_clusters" -> (dedupClustersQ _),
    "dedup_retain" -> (dedupRetain _),
    "dedup_retain_best" -> (dedupRetainBest _),
    "decontam_overlap" -> (decontamOverlap _),
    "decontam_clean" -> (decontamClean _),
    "sample_stratified" -> (sampleStratified _),
    "dedup_simhash" -> (dedupSimhash _),
    "neardup_cosine" -> (neardupCosine _),
    "sample_weighted" -> (sampleWeighted _),
    "pipeline_pack_sequences" -> (packSequences _),
    "text_unigram_ppl" -> (unigramPpl _),
    "text_bigram_ppl" -> (bigramPpl _),
    "sample_weighted_topk" -> (sampleTopK _),
    "pipeline_dsir_weights" -> (dsirWeights _),
    "pipeline_shuffle_shards" -> (shuffleShardsQ _),
    "pipeline_curriculum" -> (curriculumQ _),
    "dedup_lines" -> (dedupLinesQ _),
    "dedup_substr_spans" -> (dedupSubstrSpans _),
    "dedup_substr_clean" -> (dedupSubstrClean _),
    "dedup_semantic" -> (dedupSemantic _),
    "pipeline_cap_per_key" -> (capPerKeyQ _),
    "pipeline_mix_budget" -> (mixBudgetQ _),
    "pipeline_mix_epochs" -> (mixEpochsQ _),
    "pipeline_quality_score" -> (qualityScore _),
    "pipeline_source_profile" -> (sourceProfileQ _)
  )

  private val TOK =
    """tok AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
      |                                   x -> len(x) > 0) AS ts
      |        FROM documents)""".stripMargin

  private val SHD =
    s"""$TOK,
       |shd AS (SELECT DISTINCT doc_id AS id, s
       |        FROM tok, unnest(list_transform(range(1, len(ts) - 1),
       |             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) u(s)
       |        WHERE len(ts) >= 3),
       |cnt AS (SELECT id, count(*) AS n_sh FROM shd GROUP BY 1)""".stripMargin

  private val CLUSTERS =
    s"""WITH RECURSIVE $SHD,
       |seeds AS (SELECT unnest(range(0, 32)) AS seed),
       |base AS (SELECT id, s,
       |           CAST('0x' || substring(md5(s), 1, 15) AS BIGINT) % 2147483647 AS h31
       |         FROM shd),
       |mh AS (SELECT id, seed,
       |         min((xor(h31, (seed * 2654435761) % 2147483647) * 1000003) % 2147483647) AS mh
       |       FROM base, seeds GROUP BY id, seed),
       |bands AS (SELECT id, (seed // 4)::INT AS band,
       |            md5(string_agg(mh::VARCHAR, ',' ORDER BY seed)) AS band_key
       |          FROM mh GROUP BY id, (seed // 4)::INT),
       |cands AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |          FROM bands a JOIN bands b
       |            ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
       |inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
       |          FROM cands c
       |          JOIN shd x ON x.id = c.id_a
       |          JOIN shd y ON y.id = c.id_b AND y.s = x.s
       |          GROUP BY 1, 2),
       |mhp AS (SELECT i.id_a, i.id_b
       |        FROM inter i JOIN cnt ca ON ca.id = i.id_a
       |                     JOIN cnt cb ON cb.id = i.id_b
       |        WHERE i.n_inter::DOUBLE / (ca.n_sh + cb.n_sh - i.n_inter)::DOUBLE >= 0.8::DOUBLE),
       |fpp AS (SELECT doc_id AS id,
       |          md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
       |        FROM documents),
       |exd AS (SELECT a.id AS id_a, b.id AS id_b
       |        FROM fpp a JOIN fpp b ON a.fp = b.fp AND a.id < b.id),
       |ap AS (SELECT id_a, id_b FROM mhp UNION SELECT id_a, id_b FROM exd),
       |edges AS (SELECT id_a AS u, id_b AS v FROM ap
       |          UNION SELECT id_b AS u, id_a AS v FROM ap),
       |reach AS (
       |  SELECT doc_id AS a, doc_id AS b FROM documents
       |  UNION
       |  SELECT r.a, e.v AS b FROM reach r JOIN edges e ON e.u = r.b)
       |SELECT a AS doc_id, min(b) AS cluster_id
       |FROM reach GROUP BY a ORDER BY doc_id ASC""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_token_count" ->
      s"""WITH $TOK
         |SELECT d.doc_id, len(k.ts)::BIGINT AS ws_tokens,
         |       len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS re_tokens
         |FROM documents d JOIN tok k ON k.doc_id = d.doc_id
         |ORDER BY d.doc_id ASC""".stripMargin,
    "text_lang_quality" ->
      s"""WITH $TOK,
         |sc AS (SELECT doc_id, ts,
         |  len(list_filter(ts, x -> list_contains(['der','die','das','und','ist','ein'], x)))::DOUBLE / len(ts)::DOUBLE AS s_de,
         |  len(list_filter(ts, x -> list_contains(['the','a','an','of','and','to','in','is'], x)))::DOUBLE / len(ts)::DOUBLE AS s_en,
         |  len(list_filter(ts, x -> list_contains(['el','los','las','una','es','y'], x)))::DOUBLE / len(ts)::DOUBLE AS s_es,
         |  len(list_filter(ts, x -> list_contains(['le','les','une','et','est','du'], x)))::DOUBLE / len(ts)::DOUBLE AS s_fr,
         |  len(list_filter(ts, x -> list_contains(['的','是','在','了','和'], x)))::DOUBLE / len(ts)::DOUBLE AS s_zh
         |  FROM tok),
         |q AS (SELECT d.doc_id, s.ts, s.s_de, s.s_en, s.s_es, s.s_fr, s.s_zh,
         |  greatest(s.s_de, s.s_en, s.s_es, s.s_fr, s.s_zh) AS top,
         |  len(regexp_replace(d.text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE / len(d.text)::DOUBLE AS punct,
         |  list_sum(list_transform(s.ts, x -> len(x)))::DOUBLE / len(s.ts)::DOUBLE AS mwl,
         |  len(s.ts)::DOUBLE AS ntok
         |  FROM documents d JOIN sc s ON s.doc_id = d.doc_id)
         |SELECT doc_id,
         |  CASE WHEN top = 0::DOUBLE THEN 'unknown'
         |       WHEN s_de = top THEN 'de' WHEN s_en = top THEN 'en'
         |       WHEN s_es = top THEN 'es' WHEN s_fr = top THEN 'fr'
         |       WHEN s_zh = top THEN 'zh' ELSE 'unknown' END AS pred_lang,
         |  round(s_en, 6) AS stop_ratio,
         |  round(punct, 6) AS punct_ratio,
         |  round(mwl, 6) AS mean_wlen,
         |  round(least(1.0::DOUBLE, ntok / 100.0::DOUBLE) * 0.3::DOUBLE
         |      + least(1.0::DOUBLE, s_en * 4.0::DOUBLE) * 0.3::DOUBLE
         |      + (1.0::DOUBLE - punct) * 0.2::DOUBLE
         |      + least(1.0::DOUBLE, mwl / 8.0::DOUBLE) * 0.2::DOUBLE, 6) AS quality
         |FROM q ORDER BY doc_id ASC""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id ASC""".stripMargin,
    "pipeline_filter" ->
      s"""WITH $TOK,
         |aug AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id::VARCHAR || '@example.com now' ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN ' see https://example.org/item/' || doc_id::VARCHAR || ' today' ELSE '' END ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' soon' ELSE '' END AS aug
         |  FROM documents),
         |sig AS (SELECT d.doc_id,
         |  len(t.ts)::BIGINT AS ntok,
         |  round(least(1.0::DOUBLE, len(t.ts)::DOUBLE / 100.0::DOUBLE) * 0.3::DOUBLE
         |      + least(1.0::DOUBLE, (len(list_filter(t.ts, x -> list_contains(['the','a','an','of','and','to','in','is'], x)))::DOUBLE / len(t.ts)::DOUBLE) * 4.0::DOUBLE) * 0.3::DOUBLE
         |      + (1.0::DOUBLE - len(regexp_replace(d.text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE / len(d.text)::DOUBLE) * 0.2::DOUBLE
         |      + least(1.0::DOUBLE, (list_sum(list_transform(t.ts, x -> len(x)))::DOUBLE / len(t.ts)::DOUBLE) / 8.0::DOUBLE) * 0.2::DOUBLE, 6) AS quality,
         |  (len(regexp_extract_all(a.aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
         |   + len(regexp_extract_all(a.aug, 'https?://[A-Za-z0-9./_-]+'))
         |   + len(regexp_extract_all(a.aug, '\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')))::BIGINT AS n_contact
         |  FROM documents d JOIN tok t ON t.doc_id = d.doc_id
         |  JOIN aug a ON a.doc_id = d.doc_id),
         |r AS (SELECT doc_id, ntok, quality, n_contact,
         |  CASE WHEN ntok < 20 THEN 'too_short'
         |       WHEN ntok > 120 THEN 'too_long'
         |       WHEN quality < 0.6::DOUBLE THEN 'low_quality'
         |       WHEN n_contact >= 3 THEN 'contact_spam'
         |       ELSE 'ok' END AS reason FROM sig)
         |SELECT doc_id, ntok, quality, n_contact, reason = 'ok' AS keep, reason
         |FROM r ORDER BY doc_id ASC""".stripMargin,
    // the four-stage recipe: normalize → ntok>=5 gate → exact dedup on
    // the normalized text (keep min id) → seeded per-source cap 60
    "pipeline_recipe" ->
      s"""WITH nrm AS (
         |  SELECT doc_id, source,
         |    trim(regexp_replace(lower(translate(
         |      regexp_replace(text, '[\\p{Cc}\\p{Cf}]', ' ', 'g'),
         |      '${graft.text.TextAnalysis.AccentFrom}',
         |      '${graft.text.TextAnalysis.AccentTo}')),
         |      '\\s+', ' ', 'g')) AS nt
         |  FROM documents),
         |kept AS (
         |  SELECT doc_id, source, nt,
         |    len(list_filter(regexp_split_to_array(nt, '\\s+'),
         |        x -> len(x) > 0))::BIGINT AS ntok
         |  FROM nrm),
         |k2 AS (SELECT * FROM kept WHERE ntok >= 5),
         |dd AS (SELECT min(doc_id) AS doc_id FROM k2
         |       GROUP BY md5(regexp_replace(trim(lower(nt)), '\\s+', ' ', 'g'))),
         |r AS (SELECT k2.doc_id, k2.source, k2.ntok,
         |        row_number() OVER (PARTITION BY k2.source ORDER BY
         |          CAST('0x' || substring(md5(k2.doc_id || ':recipe0'), 1, 15)
         |            AS BIGINT) ASC, k2.doc_id ASC) AS pos
         |      FROM k2 JOIN dd USING (doc_id))
         |SELECT doc_id, source, ntok, pos FROM r WHERE pos <= 60
         |ORDER BY doc_id ASC""".stripMargin,
    // same augmentation (chr(9)=\t, chr(8203)=U+200B ZWSP, chr(13/10)=CRLF,
    // chr(173)=U+00AD soft hyphen), same pinned order: Cc/Cf → space,
    // EXPLICIT accent translate (the map is interpolated from the single
    // Scala source of truth), lower, \s+ collapse, trim
    "text_normalize" ->
      s"""WITH aug AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 4 = 0 THEN chr(9) || 'Café  ' ||
         |      chr(8203) || 'RÉSUMÉ naïve' || chr(13) || chr(10)
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 6 = 0 THEN ' ÀÉÎÕÜ çñ ÿ' || chr(173)
         |      ELSE '' END AS aug
         |  FROM documents)
         |SELECT doc_id,
         |       trim(regexp_replace(lower(translate(
         |         regexp_replace(aug, '[\\p{Cc}\\p{Cf}]', ' ', 'g'),
         |         '${graft.text.TextAnalysis.AccentFrom}',
         |         '${graft.text.TextAnalysis.AccentTo}')),
         |         '\\s+', ' ', 'g')) AS norm_text,
         |       length(trim(regexp_replace(lower(translate(
         |         regexp_replace(aug, '[\\p{Cc}\\p{Cf}]', ' ', 'g'),
         |         '${graft.text.TextAnalysis.AccentFrom}',
         |         '${graft.text.TextAnalysis.AccentTo}')),
         |         '\\s+', ' ', 'g')))::BIGINT AS n_chars
         |FROM aug ORDER BY doc_id ASC""".stripMargin,
    "text_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id::VARCHAR || '@example.com now' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' see https://example.org/item/' || doc_id::VARCHAR || ' today' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' soon' ELSE '' END AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
        |  len(regexp_extract_all(aug, 'https?://[A-Za-z0-9./_-]+'))::BIGINT AS n_url,
        |  len(regexp_extract_all(aug, '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}'))::BIGINT AS n_phone,
        |  regexp_replace(regexp_replace(regexp_replace(aug,
        |    'https?://[A-Za-z0-9./_-]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
        |FROM aug ORDER BY doc_id ASC""".stripMargin,
    "text_repetition" ->
      s"""WITH $TOK,
         |gr AS (SELECT doc_id,
         |  CASE WHEN len(ts) >= 2 THEN list_transform(range(1, len(ts)),
         |    i -> '2:' || ts[i] || ' ' || ts[i+1]) ELSE []::VARCHAR[] END ||
         |  CASE WHEN len(ts) >= 3 THEN list_transform(range(1, len(ts) - 1),
         |    i -> '3:' || ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) ELSE []::VARCHAR[] END ||
         |  CASE WHEN len(ts) >= 5 THEN list_transform(range(1, len(ts) - 3),
         |    i -> '5:' || ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3] || ' ' || ts[i+4]) ELSE []::VARCHAR[] END
         |  AS gs FROM tok),
         |cnts AS (SELECT doc_id, g, count(*) AS c
         |         FROM gr, unnest(gs) u(g) GROUP BY 1, 2),
         |per_n AS (SELECT doc_id, substring(g, 1, 1) AS n,
         |            max(c) AS top, sum(c) AS tot, count(*) AS dist
         |          FROM cnts GROUP BY 1, 2),
         |sig AS (SELECT doc_id,
         |  max(CASE WHEN n = '2' THEN top::DOUBLE / tot::DOUBLE END) AS t2,
         |  max(CASE WHEN n = '3' THEN top::DOUBLE / tot::DOUBLE END) AS t3,
         |  max(CASE WHEN n = '5' THEN (tot - dist)::DOUBLE / tot::DOUBLE END) AS d5
         |  FROM per_n GROUP BY 1)
         |SELECT d.doc_id,
         |       round(coalesce(t2, 0::DOUBLE), 6) AS top2_frac,
         |       round(coalesce(t3, 0::DOUBLE), 6) AS top3_frac,
         |       round(coalesce(d5, 0::DOUBLE), 6) AS dup5_frac
         |FROM documents d LEFT JOIN sig s ON s.doc_id = d.doc_id
         |ORDER BY d.doc_id ASC""".stripMargin,
    "dedup_exact" ->
      """WITH g AS (
        |  SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |         min(doc_id) AS keep_id, count(*) AS n_dups
        |  FROM documents GROUP BY 1)
        |SELECT keep_id, n_dups, fp FROM g ORDER BY keep_id ASC""".stripMargin,
    "dedup_jaccard" ->
      s"""WITH $SHD,
         |pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
         |  FROM shd a JOIN shd b ON a.s = b.s AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |       round(n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter)::DOUBLE, 6) AS jaccard
         |FROM pairs JOIN cnt ca ON ca.id = id_a JOIN cnt cb ON cb.id = id_b
         |WHERE n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter)::DOUBLE >= 0.8::DOUBLE
         |ORDER BY id_a ASC, id_b ASC""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $SHD,
         |seeds AS (SELECT unnest(range(0, 32)) AS seed),
         |base AS (SELECT id, s,
         |           CAST('0x' || substring(md5(s), 1, 15) AS BIGINT) % 2147483647 AS h31
         |         FROM shd),
         |mh AS (SELECT id, seed,
         |         min((xor(h31, (seed * 2654435761) % 2147483647) * 1000003) % 2147483647) AS mh
         |       FROM base, seeds GROUP BY id, seed),
         |bands AS (SELECT id, (seed // 4)::INT AS band,
         |            md5(string_agg(mh::VARCHAR, ',' ORDER BY seed)) AS band_key
         |          FROM mh GROUP BY id, (seed // 4)::INT),
         |cands AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |          FROM bands a JOIN bands b
         |            ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id),
         |inter AS (SELECT c.id_a, c.id_b, count(*) AS n_inter
         |          FROM cands c
         |          JOIN shd x ON x.id = c.id_a
         |          JOIN shd y ON y.id = c.id_b AND y.s = x.s
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |       round(n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter)::DOUBLE, 6) AS jaccard
         |FROM inter JOIN cnt ca ON ca.id = id_a JOIN cnt cb ON cb.id = id_b
         |WHERE n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter)::DOUBLE >= 0.8::DOUBLE
         |ORDER BY id_a ASC, id_b ASC""".stripMargin,
    "dedup_clusters" -> CLUSTERS,
    "dedup_retain" ->
      s"""SELECT c.doc_id, length(d.text)::BIGINT AS text_len
         |FROM ($CLUSTERS) c
         |JOIN documents d ON d.doc_id = c.doc_id
         |WHERE c.doc_id = c.cluster_id
         |ORDER BY c.doc_id ASC""".stripMargin,
    // keep the longest member per duplicate cluster, ties -> lowest id
    "dedup_retain_best" ->
      s"""WITH j AS (SELECT c.doc_id, c.cluster_id,
         |             length(d.text)::BIGINT AS len
         |           FROM ($CLUSTERS) c
         |           JOIN documents d ON d.doc_id = c.doc_id),
         |r AS (SELECT doc_id, len,
         |        row_number() OVER (PARTITION BY cluster_id
         |                           ORDER BY len DESC, doc_id ASC) AS rn
         |      FROM j)
         |SELECT doc_id, len AS text_len FROM r WHERE rn = 1
         |ORDER BY doc_id ASC""".stripMargin,

    // removal: drop train docs with rounded overlap >= 0.5; unshingleable
    // docs (absent from j) are kept — they cannot be contaminated
    "decontam_clean" ->
      s"""WITH $SHD,
         |ev AS (SELECT DISTINCT s FROM shd WHERE id % 10 = 7),
         |tr AS (SELECT id, s FROM shd WHERE id % 10 <> 7),
         |j AS (SELECT t.id, count(*) AS n_sh,
         |        sum(CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit
         |      FROM tr t LEFT JOIN ev e ON e.s = t.s GROUP BY t.id),
         |bad AS (SELECT id FROM j
         |        WHERE round(n_hit::DOUBLE / n_sh::DOUBLE, 6) >= 0.5::DOUBLE)
         |SELECT d.doc_id, d.n_chars
         |FROM documents d LEFT JOIN bad b ON b.id = d.doc_id
         |WHERE d.doc_id % 10 <> 7 AND b.id IS NULL
         |ORDER BY d.doc_id ASC""".stripMargin,
    "decontam_overlap" ->
      s"""WITH $SHD,
         |ev AS (SELECT DISTINCT s FROM shd WHERE id % 10 = 7),
         |tr AS (SELECT id, s FROM shd WHERE id % 10 <> 7),
         |j AS (SELECT t.id, count(*) AS n_sh,
         |        sum(CASE WHEN e.s IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit
         |      FROM tr t LEFT JOIN ev e ON e.s = t.s GROUP BY t.id)
         |SELECT id AS doc_id, n_sh AS n_shingles, n_hit,
         |       round(n_hit::DOUBLE / n_sh::DOUBLE, 6) AS overlap_frac
         |FROM j ORDER BY doc_id ASC""".stripMargin,
    "sample_stratified" ->
      """SELECT vec_id, label FROM embeddings
        |WHERE CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000 <
        |  CASE WHEN label = 0 THEN 200 WHEN label = 1 THEN 350
        |       WHEN label = 2 THEN 500 ELSE 800 END
        |ORDER BY vec_id ASC""".stripMargin,
    "dedup_simhash" ->
      s"""WITH $TOK,
         |tf AS (SELECT doc_id AS id, t AS term, count(*)::BIGINT AS tf
         |       FROM tok, unnest(ts) u(t) GROUP BY 1, 2),
         |h AS (SELECT id, term, tf,
         |        CAST('0x' || substring(md5('0:' || term), 1, 15) AS BIGINT) AS h
         |      FROM tf),
         |bits AS (SELECT id, i,
         |           sum(CASE WHEN (h & (1::BIGINT << i)) <> 0 THEN tf ELSE -tf END) AS s
         |         FROM h, (SELECT unnest(range(0, 60)) AS i) GROUP BY 1, 2)
         |SELECT id AS doc_id,
         |       string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY i DESC) AS simhash
         |FROM bits GROUP BY id ORDER BY doc_id ASC""".stripMargin,
    "neardup_cosine" ->
      """WITH pert AS (
        |  SELECT src_id + 1000000 AS vec_id,
        |         list_transform(range(1, 65), i -> CAST(
        |           embedding[i]::DOUBLE +
        |           ((CAST('0x' || substring(md5(src_id || ':' || i), 1, 15) AS BIGINT)
        |             % 201 - 100)::DOUBLE / 4000.0::DOUBLE)
        |         AS FLOAT)) AS embedding
        |  FROM (SELECT vec_id AS src_id, embedding FROM embeddings)),
        |corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM pert),
        |s AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |         (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |          sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cos
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(cos, 6) AS cos
        |FROM s WHERE cos >= 0.9::DOUBLE
        |ORDER BY id_a ASC, id_b ASC""".stripMargin,
    "sample_weighted" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |        % 1000000 < least(1000000, n_chars * 1800)
        |ORDER BY doc_id ASC""".stripMargin,
    // A-ES rank key ln(u)/w, u = (md5(id:seed) mod 1e6 + 1)/1e6, rounded
    // to 6 and tie-broken by id — exactly the Spark side's selection rule.
    // The `+ 0.0` normalizes IEEE -0.0 (DuckDB round preserves the sign of
    // a tiny negative key; Spark's BigDecimal round cannot produce -0.0 and
    // the gate compares stringified values).
    "sample_weighted_topk" ->
      s"""WITH $TOK,
         |w AS (SELECT doc_id, len(ts)::BIGINT AS n_tokens FROM tok
         |      WHERE len(ts) > 0),
         |k AS (SELECT doc_id, n_tokens,
         |        round(ln(((CAST('0x' || substring(md5(doc_id::VARCHAR || ':s8'), 1, 15)
         |                    AS BIGINT) % 1000000) + 1)::DOUBLE / 1000000.0)
         |              / n_tokens::DOUBLE, 6) + 0.0 AS sample_key
         |      FROM w)
         |SELECT doc_id, n_tokens, sample_key FROM k
         |ORDER BY sample_key DESC, doc_id ASC LIMIT 120""".stripMargin,
    "pipeline_pack_sequences" ->
      s"""WITH $TOK,
         |tc AS (SELECT doc_id, len(ts)::BIGINT AS tokens FROM tok),
         |c AS (SELECT doc_id, tokens,
         |        sum(tokens) OVER (ORDER BY doc_id) AS cum FROM tc)
         |SELECT CAST((cum - tokens) // 512 AS BIGINT) AS pack_id,
         |       count(*)::BIGINT AS n_docs, sum(tokens)::BIGINT AS pack_tokens,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1 ORDER BY pack_id ASC""".stripMargin,
    "text_unigram_ppl" ->
      s"""WITH $TOK,
         |occ AS (SELECT doc_id, t FROM tok, unnest(ts) u(t)),
         |counts AS (SELECT t, count(*)::BIGINT AS c FROM occ GROUP BY t),
         |tot AS (SELECT sum(c)::BIGINT AS n FROM counts)
         |SELECT o.doc_id, count(*)::BIGINT AS n_tokens,
         |       round(ln((SELECT n FROM tot)::DOUBLE) - avg(ln(c.c::DOUBLE)), 6) AS nll
         |FROM occ o JOIN counts c ON o.t = c.t
         |GROUP BY o.doc_id ORDER BY o.doc_id ASC""".stripMargin,
    // add-1 smoothed p(t2|t1): c2 = corpus bigram count, c1 = context
    // count (sum of c2 over the context), V = distinct unigram vocab
    "text_bigram_ppl" ->
      s"""WITH $TOK,
         |big AS (SELECT doc_id, unnest(ts[1:len(ts)-1]) AS t1,
         |               unnest(ts[2:len(ts)]) AS t2
         |        FROM tok WHERE len(ts) >= 2),
         |c2 AS (SELECT t1, t2, count(*)::BIGINT AS c2 FROM big GROUP BY 1, 2),
         |c1 AS (SELECT t1, sum(c2)::BIGINT AS c1 FROM c2 GROUP BY 1),
         |v AS (SELECT count(DISTINCT t)::BIGINT AS v
         |      FROM tok, unnest(ts) u(t))
         |SELECT b.doc_id, count(*)::BIGINT AS n_bigrams,
         |       round(-avg(ln((x.c2 + 1.0) /
         |                     (y.c1 + (SELECT v FROM v)::DOUBLE))), 6) AS nll
         |FROM big b JOIN c2 x ON b.t1 = x.t1 AND b.t2 = x.t2
         |           JOIN c1 y ON b.t1 = y.t1
         |GROUP BY b.doc_id ORDER BY b.doc_id ASC""".stripMargin,

    "pipeline_dsir_weights" ->
      s"""WITH $TOK,
         |occ AS (SELECT doc_id,
         |               CAST('0x' || substring(md5(u.t), 1, 15) AS BIGINT) % 1024 AS b
         |        FROM tok, unnest(ts) u(t)),
         |tgt AS (SELECT b, count(*)::BIGINT AS ct FROM occ WHERE doc_id % 10 = 7 GROUP BY 1),
         |rawc AS (SELECT b, count(*)::BIGINT AS cr FROM occ WHERE doc_id % 10 <> 7 GROUP BY 1),
         |nt AS (SELECT sum(ct)::BIGINT AS n FROM tgt),
         |nr AS (SELECT sum(cr)::BIGINT AS n FROM rawc)
         |SELECT o.doc_id, count(*)::BIGINT AS n_tokens,
         |       round(avg(ln((coalesce(t.ct, 0) + 1)::DOUBLE) - ln((r.cr + 1)::DOUBLE))
         |             + ln((nr.n + 1024)::DOUBLE) - ln((nt.n + 1024)::DOUBLE), 6) AS dsir_logratio
         |FROM occ o LEFT JOIN tgt t USING (b) JOIN rawc r USING (b), nt, nr
         |WHERE o.doc_id % 10 <> 7
         |GROUP BY o.doc_id, nt.n, nr.n
         |ORDER BY o.doc_id ASC""".stripMargin,

    "pipeline_shuffle_shards" ->
      """WITH h AS (SELECT doc_id,
        |                  CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':epoch0'), 1, 15) AS BIGINT) AS hv
        |           FROM documents)
        |SELECT doc_id, hv % 8 AS shard,
        |       row_number() OVER (PARTITION BY hv % 8 ORDER BY hv ASC, doc_id ASC) AS pos
        |FROM h
        |ORDER BY shard ASC, pos ASC""".stripMargin,

    "dedup_lines" ->
      """WITH ls AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS arr
        |            FROM documents),
        |lines AS (SELECT doc_id, i AS pos, arr[i] AS line
        |          FROM ls, unnest(range(1, len(arr) + 1)) t(i)),
        |hot AS (SELECT line FROM lines WHERE len(trim(line)) > 0
        |        GROUP BY line HAVING count(DISTINCT doc_id) >= 400),
        |flags AS (SELECT l.doc_id, l.pos, l.line,
        |                 (len(trim(l.line)) > 0 AND h.line IS NOT NULL) AS dropped
        |          FROM lines l LEFT JOIN hot h USING (line))
        |SELECT doc_id,
        |       coalesce(string_agg(CASE WHEN NOT dropped THEN line END, ' '
        |                           ORDER BY pos), '') AS text,
        |       count(*)::BIGINT AS n_lines,
        |       sum(CASE WHEN dropped THEN 1 ELSE 0 END)::BIGINT AS n_removed
        |FROM flags GROUP BY doc_id ORDER BY doc_id ASC""".stripMargin,

    "dedup_substr_spans" ->
      """WITH g AS (
        |  SELECT doc_id AS id, i AS pos,
        |         CAST('0x' || substring(md5('ss:' || substring(text, i, 30)), 1, 15)
        |              AS BIGINT) AS h
        |  FROM documents, unnest(range(1, len(text) - 30 + 2)) t(i)
        |  WHERE len(text) >= 30),
        |d AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
        |m AS (SELECT id, pos, pos + 30 AS e FROM g
        |      WHERE h IN (SELECT h FROM d)),
        |isl AS (SELECT id, pos, e,
        |          CASE WHEN max(e) OVER (PARTITION BY id ORDER BY pos
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |                OR pos > max(e) OVER (PARTITION BY id ORDER BY pos
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |               THEN 1 ELSE 0 END AS nw
        |        FROM m),
        |isl2 AS (SELECT id, pos, e,
        |           sum(nw) OVER (PARTITION BY id ORDER BY pos) AS island
        |         FROM isl)
        |SELECT id AS doc_id, min(pos)::BIGINT AS span_start,
        |       max(e)::BIGINT AS span_end,
        |       (max(e) - min(pos))::BIGINT AS span_len
        |FROM isl2 GROUP BY id, island
        |ORDER BY doc_id ASC, span_start ASC""".stripMargin,

    "dedup_substr_clean" ->
      """WITH g AS (
        |  SELECT doc_id AS id, i AS pos,
        |         CAST('0x' || substring(md5('ss:' || substring(text, i, 30)), 1, 15)
        |              AS BIGINT) AS h
        |  FROM documents, unnest(range(1, len(text) - 30 + 2)) t(i)
        |  WHERE len(text) >= 30),
        |d AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
        |m AS (SELECT id, pos, pos + 30 AS e FROM g
        |      WHERE h IN (SELECT h FROM d)),
        |isl AS (SELECT id, pos, e,
        |          CASE WHEN max(e) OVER (PARTITION BY id ORDER BY pos
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |                OR pos > max(e) OVER (PARTITION BY id ORDER BY pos
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |               THEN 1 ELSE 0 END AS nw
        |        FROM m),
        |isl2 AS (SELECT id, pos, e,
        |           sum(nw) OVER (PARTITION BY id ORDER BY pos) AS island
        |         FROM isl),
        |spans AS (SELECT id, min(pos) AS s, max(e) AS e
        |          FROM isl2 GROUP BY id, island),
        |segs AS (
        |  SELECT id,
        |         coalesce(lag(e) OVER (PARTITION BY id ORDER BY s), 1) AS ks,
        |         s AS ke
        |  FROM spans
        |  UNION ALL
        |  SELECT sp.id, max(sp.e), len(dd.text) + 1
        |  FROM spans sp JOIN documents dd ON dd.doc_id = sp.id
        |  GROUP BY sp.id, len(dd.text)),
        |rebuilt AS (
        |  SELECT sg.id,
        |         string_agg(substring(dd.text, sg.ks, sg.ke - sg.ks), ''
        |                    ORDER BY sg.ks) AS clean,
        |         (SELECT count(*) FROM spans x WHERE x.id = sg.id) AS n_spans,
        |         (SELECT sum(x.e - x.s) FROM spans x WHERE x.id = sg.id) AS n_removed
        |  FROM segs sg JOIN documents dd ON dd.doc_id = sg.id
        |  GROUP BY sg.id)
        |SELECT d.doc_id,
        |       md5(coalesce(r.clean, d.text)) AS clean_md5,
        |       coalesce(len(r.clean), len(d.text))::BIGINT AS clean_len,
        |       coalesce(r.n_spans, 0)::BIGINT AS n_spans,
        |       coalesce(r.n_removed, 0)::BIGINT AS n_removed
        |FROM documents d LEFT JOIN rebuilt r ON r.id = d.doc_id
        |ORDER BY d.doc_id ASC""".stripMargin,

    "pipeline_cap_per_key" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source ORDER BY
        |           CAST('0x' || substring(md5(doc_id || ':cap0'), 1, 15) AS BIGINT) ASC,
        |           doc_id ASC) AS pos
        |  FROM documents)
        |SELECT doc_id, source, pos FROM r WHERE pos <= 10
        |ORDER BY doc_id ASC""".stripMargin,

    // frozen linear quality model: same md5 'tfidf:' token buckets as
    // text_hashed_tfidf, L1-normalized tf, weights w(b) = ((b·2654435761
    // mod 1000) − 500)/1000, bias 0.1, sigmoid, keep at rounded ≥ 0.55
    "pipeline_quality_score" ->
      s"""WITH $TOK,
         |tfx AS (SELECT doc_id,
         |          CAST('0x' || substring(md5('tfidf:' || tk), 1, 15)
         |               AS BIGINT) % 64 AS bucket,
         |          count(*)::DOUBLE / min(n)::DOUBLE AS x
         |        FROM (SELECT doc_id, unnest(ts) AS tk, len(ts) AS n
         |              FROM tok WHERE len(ts) > 0)
         |        GROUP BY 1, 2),
         |mg AS (SELECT doc_id,
         |         0.1::DOUBLE + sum(x * (((bucket * 2654435761) % 1000)
         |           - 500)::DOUBLE / 1000.0::DOUBLE) AS m
         |       FROM tfx GROUP BY 1)
         |SELECT doc_id,
         |       round(1.0::DOUBLE / (1.0::DOUBLE + exp(-m)), 6) AS q_score,
         |       round(1.0::DOUBLE / (1.0::DOUBLE + exp(-m)), 6)
         |         >= 0.55::DOUBLE AS keep
         |FROM mg ORDER BY doc_id ASC""".stripMargin,

    // per-source report card: exact interpolated percentiles
    // (quantile_cont == Spark's exact `percentile`), corpus-wide
    // full-text md5 dup flag counted in EVERY source holding a copy
    "pipeline_source_profile" ->
      """WITH h AS (SELECT doc_id, source, md5(text) AS hh,
        |             len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                             x -> len(x) > 0))::BIGINT AS nt,
        |             length(text)::BIGINT AS nc
        |           FROM documents),
        |d AS (SELECT hh FROM h GROUP BY hh HAVING count(*) >= 2)
        |SELECT source,
        |       count(*)::BIGINT AS n_docs,
        |       sum(nt)::BIGINT AS total_tokens,
        |       round(avg(nt::DOUBLE), 6) AS avg_tokens,
        |       round(quantile_cont(nc, 0.5), 6) AS p50_chars,
        |       round(quantile_cont(nc, 0.9), 6) AS p90_chars,
        |       round(avg(CASE WHEN hh IN (SELECT hh FROM d)
        |                      THEN 1.0 ELSE 0.0 END), 6) AS dup_frac
        |FROM h GROUP BY source ORDER BY source ASC""".stripMargin,

    // upsampling mixture: UNCLAMPED rate → floor(r) whole copies + an
    // integer-ppm md5 gate on the fractional part, copies via range()
    "pipeline_mix_epochs" ->
      """WITH st AS (
        |  SELECT source, sum(n_chars)::BIGINT AS t FROM documents
        |  WHERE source IN ('src0','src1','src2','src3') GROUP BY 1),
        |tot AS (SELECT sum(t) * 2 AS budget FROM st),
        |rates AS (
        |  SELECT source,
        |         (SELECT budget FROM tot)::DOUBLE *
        |         (CASE source WHEN 'src0' THEN 0.5::DOUBLE
        |                      WHEN 'src1' THEN 0.25::DOUBLE
        |                      WHEN 'src2' THEN 0.125::DOUBLE
        |                      ELSE 0.125::DOUBLE END) / t::DOUBLE AS r
        |  FROM st),
        |parts AS (SELECT source, CAST(floor(r) AS BIGINT) AS whole,
        |            CAST(floor((r - floor(r)) * 1000000.0::DOUBLE)
        |              AS BIGINT) AS ppm
        |          FROM rates),
        |n AS (SELECT d.doc_id, d.source, d.n_chars,
        |        p.whole + CASE WHEN
        |          CAST('0x' || substring(md5(d.doc_id || ':mix1'), 1, 15)
        |            AS BIGINT) % 1000000 < p.ppm THEN 1 ELSE 0 END AS nc
        |      FROM documents d JOIN parts p ON p.source = d.source)
        |SELECT doc_id, source, n_chars, unnest(range(nc)) AS copy
        |FROM n WHERE nc > 0
        |ORDER BY doc_id ASC, copy ASC""".stripMargin,
    "pipeline_mix_budget" ->
      """WITH st AS (
        |  SELECT source, sum(n_chars)::BIGINT AS t FROM documents
        |  WHERE source IN ('src0','src1','src2','src3') GROUP BY 1),
        |tot AS (SELECT (sum(t) * 3) // 4 AS budget FROM st),
        |rates AS (
        |  SELECT source,
        |         CAST(floor(least(1.0::DOUBLE,
        |           (SELECT budget FROM tot)::DOUBLE *
        |           (CASE source WHEN 'src0' THEN 0.5::DOUBLE
        |                        WHEN 'src1' THEN 0.25::DOUBLE
        |                        WHEN 'src2' THEN 0.125::DOUBLE
        |                        ELSE 0.125::DOUBLE END) / t::DOUBLE)
        |           * 1000000.0::DOUBLE) AS BIGINT) AS ppm
        |  FROM st)
        |SELECT d.doc_id, d.source, d.n_chars, r.ppm AS rate_ppm
        |FROM documents d JOIN rates r ON r.source = d.source
        |WHERE CAST('0x' || substring(md5(d.doc_id || ':mix0'), 1, 15) AS BIGINT)
        |        % 1000000 < r.ppm
        |ORDER BY d.doc_id ASC""".stripMargin,

    "dedup_semantic" ->
      """WITH RECURSIVE pert AS (
        |  SELECT src_id + 1000000 AS vec_id,
        |         list_transform(range(1, 65), i -> CAST(
        |           embedding[i]::DOUBLE +
        |           ((CAST('0x' || substring(md5(src_id || ':' || i), 1, 15) AS BIGINT)
        |             % 201 - 100)::DOUBLE / 4000.0::DOUBLE)
        |         AS FLOAT)) AS embedding,
        |         label
        |  FROM (SELECT vec_id AS src_id, embedding, label FROM embeddings)),
        |corpus AS (
        |  SELECT vec_id, embedding, label FROM embeddings
        |  UNION ALL SELECT vec_id, embedding, label FROM pert),
        |e0 AS (
        |  SELECT a.vec_id AS u, b.vec_id AS v
        |  FROM corpus a JOIN corpus b
        |    ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |        (sqrt(list_inner_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |         sqrt(list_inner_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
        |        >= 0.9::DOUBLE),
        |edges AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0),
        |reach AS (
        |  SELECT vec_id AS a, vec_id AS b FROM corpus
        |  UNION
        |  SELECT r.a, e.v AS b FROM reach r JOIN edges e ON e.u = r.b),
        |comp AS (SELECT a AS vec_id, min(b) AS component FROM reach GROUP BY a),
        |cen AS (SELECT label, i, CAST(avg(embedding[i]::DOUBLE) AS FLOAT) AS c
        |        FROM corpus, unnest(range(1, 65)) t(i) GROUP BY label, i),
        |cenl AS (SELECT label, list(c ORDER BY i) AS centroid FROM cen GROUP BY label),
        |sc AS (
        |  SELECT c.vec_id, c.label, m.component,
        |         round(list_inner_product(c.embedding::DOUBLE[], l.centroid::DOUBLE[]) /
        |           (sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) *
        |            sqrt(list_inner_product(l.centroid::DOUBLE[], l.centroid::DOUBLE[]))), 6)
        |           AS centroid_cos
        |  FROM corpus c JOIN comp m ON m.vec_id = c.vec_id
        |                JOIN cenl l ON l.label = c.label),
        |k AS (SELECT vec_id, label, component, centroid_cos,
        |        row_number() OVER (PARTITION BY component
        |          ORDER BY centroid_cos ASC, vec_id ASC) AS rn
        |      FROM sc)
        |SELECT vec_id, label, component, centroid_cos, (rn = 1) AS keep
        |FROM k ORDER BY vec_id ASC""".stripMargin,

    "pipeline_curriculum" ->
      s"""WITH $TOK,
         |nt AS (SELECT doc_id, len(ts)::BIGINT AS n_tokens FROM tok),
         |b AS (SELECT doc_id, n_tokens,
         |             (length(bin(greatest(n_tokens, 1))) - 1)::BIGINT AS bucket,
         |             CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
         |      FROM nt)
         |SELECT doc_id, n_tokens, bucket,
         |       row_number() OVER (PARTITION BY bucket ORDER BY hv ASC, doc_id ASC) AS pos
         |FROM b
         |ORDER BY bucket ASC, pos ASC""".stripMargin
  )
}
