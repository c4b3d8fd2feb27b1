package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{vec_cos, vec_sum_double}
import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *
  *  - exact: hash-groupBy on a canonical fingerprint (one shuffle keyed by
  *    a 128-bit hash — uniform, skew-free).
  *  - n-gram Jaccard: shingle-inverted-index self-join for candidate
  *    generation; correct but O(pairs-sharing-a-shingle) — the scale path
  *    is MinHash+LSH below, which bounds the join to band buckets.
  *  - MinHash+LSH: signature = per-seed min over shingle hashes;
  *    band→bucket join yields candidate pairs; exact Jaccard verifies.
  *    Shuffles are keyed by (band, bucket) — bounded and uniform.
  *  - SimHash: 64-bit (fast path, xxhash64) or portable 60-bit bit-string
  *    (md5-based, engine-independent for oracle checks).
  *  - Embedding cosine near-dup: exact pair join at small scale; sign-
  *    random-projection bucketing as the scale path.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup groups: one row per distinct canonical text, with the
    * surviving (minimum) id and the duplicate count.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min("id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** The deduplicated view: keep the minimum id per canonical text. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, idCol)
  }

  // ------------------------------------------------------------- shingles

  /** Spread a narrow source across the cluster when its scan has fewer
    * partitions than cores: a small corpus arrives as ONE parquet split,
    * and everything downstream of a per-doc explode (shingling, hashing,
    * token analysis) then runs in one task. The repartition shuffles only
    * the raw doc rows — cheap at the scales where it fires, and a no-op at
    * 100 TB where file splits already exceed defaultParallelism.
    */
  private def spread(df: DataFrame): DataFrame =
    graft.functions.spread_input(df)

  /** Distinct word n-gram shingles: (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = TextAnalysis.wsTokens(col(textCol))
    val sh = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    spread(df.where(size(toks) >= n))
      .select(col(idCol).as("id"), explode(array_distinct(sh)).as("shingle"))
  }

  /** Exact pairwise word-n-gram Jaccard similarity >= minJaccard with
    * PPJoin-style PREFIX FILTERING (Xiao et al., WWW'08 — public
    * similarity-join literature): under any global total order of
    * shingles, Jaccard(A,B) ≥ t implies A and B share a shingle within
    * each one's first |S| − ⌈t·|S|⌉ + 1 shingles. Ordering rarest-first
    * (document frequency asc) makes the candidate join touch only rare
    * shingles — a shingle shared by d documents no longer contributes d²
    * join pairs unless it is genuinely discriminative, which is what kills
    * the naive inverted-index self-join at corpus scale. Results are
    * EXACT: candidates are verified with a full intersection count.
    * Output: (id_a, id_b, jaccard), id_a < id_b.
    */
  /** Hashed shingle stream: (id, h60) — ONE md5 per (doc, distinct
    * shingle); h60 is the portable 60-bit shingle hash every downstream
    * stage (minhash seeds, prefix filtering, exact set intersection) is
    * derived from, so the expensive text explode + md5 happens exactly
    * once per pipeline. Verification over 60-bit hash sets instead of
    * shingle strings shrinks shuffles ~10× and changes results only on an
    * intra-pair hash collision (P ≈ |S|²/2⁶¹ ≈ 1e-12 for 1k-shingle docs).
    */
  private[graft] def hashedShingles(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    shingles(df, idCol, textCol, n)
      .select(col("id"),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long")
          .as("h60"))

  /** Exact verification of candidate pairs against per-doc hashed shingle
    * sets: jaccard = |A∩B| / |A∪B| over the h60 sets carried on `sets`
    * (columns id, hset). The candidate side is small (bucket collisions),
    * so both joins broadcast-or-shuffle only candidates + per-doc sets —
    * never the shingle stream.
    */
  private def verifyPairs(cands: DataFrame, sets: DataFrame,
      minJaccard: Double): DataFrame =
    // r13 (verdict ask 3): sets arrive SORTED (array_sort at collect time,
    // once per doc), so the per-pair verification is one allocation-free
    // sorted-merge with early exit on the threshold bound — where
    // array_intersect built a hash set + intersection array per pair just
    // to take its size. Pass/fail boundary and surviving jaccard values
    // are identical by construction (the kernel binary-searches the same
    // double-division predicate this filter applies).
    cands
      .join(sets.select(col("id").as("id_a"), col("hset").as("set_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hset").as("set_b")), "id_b")
      .withColumn("jaccard",
        graft.functions.jaccard_ge_sorted(col("set_a"), col("set_b"),
          minJaccard))
      .where(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")

  /** Candidate-restricted verification: collect per-doc h60 sets ONLY for
    * ids that appear in a candidate pair (a left-semi join gates the
    * shingle stream BEFORE `collect_set`), then verify exactly. Candidate
    * populations are a vanishing fraction of the corpus (bucket/prefix
    * collisions), so the wide per-doc set arrays — hundreds of longs each —
    * are built, shuffled and joined for a few ids instead of every
    * document. (Collecting sets for ALL docs and carrying them through
    * both verify joins was measured 3-4× slower at every scale: the
    * round-4 `dedup_minhash_lsh` regression.)
    */
  private[graft] def verifyCandidates(cands: DataFrame, hashed: DataFrame,
      minJaccard: Double): DataFrame = {
    // no .distinct() on the id gate: a left-semi join's right side needs
    // no dedup, and dropping it saves a shuffle of the candidate ids
    val candIds = cands.select(col("id_a").as("id"))
      .unionByName(cands.select(col("id_b").as("id")))
    val sets = hashed.join(candIds, Seq("id"), "left_semi")
      .groupBy("id")
      .agg(array_sort(collect_set(col("h60"))).as("hset"))
    verifyPairs(cands, sets, minJaccard)
  }

  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.8): DataFrame =
    jaccardPairsFrom(hashedShingles(df, idCol, textCol, n), minJaccard)

  /** Eager scale form of [[jaccardPairs]]: the hashed shingle stream is
    * persisted for the pipeline's duration (it feeds document frequencies,
    * both prefix-join sides, and the verification sets — uncached, each
    * consumer would re-run the text explode + md5), the verified pairs are
    * written to `out`, the cache is released in a finally, and the written
    * table is returned. Lazy callers who compose further should use
    * [[jaccardPairs]] and persist the INPUT themselves if it is expensive.
    */
  def jaccardPairsTo(df: DataFrame, idCol: String, textCol: String,
      out: String, n: Int = 3, minJaccard: Double = 0.8): DataFrame = {
    val spark = df.sparkSession
    val hashed = hashedShingles(df, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      jaccardPairsFrom(hashed, minJaccard)
        .write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    } finally { hashed.unpersist(false); () }
  }

  /** PPJoin prefix-filtered exact Jaccard over a hashed shingle stream.
    * The global shingle order is (document frequency asc, h60 asc) —
    * rarest-first, so the candidate self-join touches only discriminative
    * shingles; any total order is valid for the prefix bound (Xiao et al.,
    * WWW'08).
    */
  private def jaccardPairsFrom(hashed: DataFrame,
      minJaccard: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfreq = hashed.groupBy("h60").agg(count(lit(1)).as("df"))
    // per-doc rank under the global (df asc, h60 asc) order; the window
    // partitions by doc id, so no single-task global sort
    val ranked = hashed.join(dfreq, "h60")
      .withColumn("rnk", row_number().over(
        Window.partitionBy("id").orderBy(col("df").asc, col("h60").asc)))
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy("id")))
      .where(col("rnk") <=
        (col("n_sh") - ceil(lit(minJaccard) * col("n_sh")) + 1).cast("int"))
      .select("id", "h60")
    val cands = ranked.as("a")
      .join(ranked.as("b"),
        col("a.h60") === col("b.h60") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyCandidates(cands, hashed, minJaccard)
  }

  // -------------------------------------------------------- minhash + LSH

  /** Portable 60-bit positive hash of a shingle under a seed, identical in
    * Spark and DuckDB: first 15 hex chars of md5("seed:shingle").
    */
  def portableHash(seed: Column, s: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit(":"), s)), 1, 15), 16, 10)
      .cast("long")

  /** 31-bit Mersenne modulus for the seeded minhash family (products stay
    * < 2^52, ANSI-safe; 4-row bands still give 124-bit keys).
    */
  val MinhashMod = 2147483647L

  /** Per-seed xor constant, engine-portable ((seed * Knuth) mod M). */
  def minhashSeedConst(seed: Int): Long =
    (seed.toLong * 2654435761L) % MinhashMod

  /** Seeded 31-bit hash derived arithmetically from one base md5 hash —
    * ONE md5 per shingle feeds all numHashes functions instead of
    * numHashes md5 computations (the md5 was the minhash bottleneck).
    */
  def seededHash31(h31: Column, seed: Int): Column =
    pmod((h31.bitwiseXOR(lit(minhashSeedConst(seed)))) * lit(1000003L),
      lit(MinhashMod))

  /** MinHash signatures, wide form: one aggregation computes ALL
    * numHashes min-hashes per id (columns mh_0..mh_{n-1}) — no seed
    * cross-join (1× not 32× rows through the shuffle), and one md5 per
    * shingle (not per seed).
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val base = sh.withColumn("h31",
      pmod(conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long"),
        lit(MinhashMod)))
    base.groupBy("id").agg(
      min(seededHash31(col("h31"), 0)).as("mh_0"),
      (1 until numHashes).map(s =>
        min(seededHash31(col("h31"), s)).as(s"mh_$s")): _*)
  }

  /** [[minhashSignatures]] over a hashed shingle stream (id, h60): a
    * NARROW aggregate — numHashes long columns per doc, no per-doc set
    * payload (verification sets are built later for candidate ids only,
    * [[verifyCandidates]]). h31 = h60 mod M is value-identical to the
    * classic md5-derived form.
    */
  def minhashSignaturesHashed(hashed: DataFrame, numHashes: Int): DataFrame = {
    val base = hashed.withColumn("h31", pmod(col("h60"), lit(MinhashMod)))
    base.groupBy("id").agg(
      min(seededHash31(col("h31"), 0)).as("mh_0"),
      (1 until numHashes).map(s =>
        min(seededHash31(col("h31"), s)).as(s"mh_$s")): _*)
  }

  /** LSH band keys from the wide signature frame: (id, band, band_key),
    * band_key = md5 of the band's signature values joined in seed order.
    */
  def lshBands(signatures: DataFrame, rowsPerBand: Int): DataFrame = {
    val numHashes = signatures.columns.count(_.startsWith("mh_"))
    val nBands = numHashes / rowsPerBand
    val bandStructs = array((0 until nBands).map { b =>
      val key = md5(concat_ws(",",
        (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(s => col(s"mh_$s").cast("string")): _*))
      struct(lit(b).as("band"), key.as("band_key"))
    }: _*)
    signatures
      .select(col("id"), explode(bandStructs).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** Candidate pairs from LSH buckets (distinct, id_a < id_b). Lazy and
    * cache-free like the rest of the lazy pipeline (the cache-hygiene
    * contract: operators leave no persistent RDD blocks behind — a
    * localCheckpoint here was measured 35-38% faster on the lazy query
    * but leaks its blocks until GC, so the MATERIALIZING twin
    * [[minhashLshTo]] owns that win with a scoped, released cache; the
    * declared `dedup_minhash_lsh` query routes through it).
    */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.as("a"); val b = bands.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band → bucket
    * join → exact-Jaccard verification of candidates. Returns
    * (id_a, id_b, jaccard) for candidates with jaccard >= minJaccard.
    *
    * Lazy and cache-free: the per-doc signature+set aggregate is consumed
    * by the band self-join and both verification joins, so an uncached
    * plan re-derives it per consumer. One-shot pipelines should use
    * [[minhashLshTo]] (scoped cache + materialized output); lazy composers
    * should persist the input themselves when it is expensive.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 4,
      minJaccard: Double = 0.8): DataFrame =
    minhashLshFrom(hashedShingles(df, idCol, textCol, n),
      numHashes, rowsPerBand, minJaccard)

  /** Eager scale form of [[minhashLsh]]: the narrow (id, h60) hashed
    * shingle stream — which feeds the signature aggregate AND the
    * candidate-only verification sets — is persisted for the pipeline's
    * duration, as are the (tiny) candidate pairs; verified pairs are
    * written to `out`; the caches are released in a finally; the written
    * table is returned. This is the shape a 100 TB dedup run wants anyway
    * — near-dup pairs are materialized, not held in a lazy plan.
    */
  def minhashLshTo(df: DataFrame, idCol: String, textCol: String,
      out: String, n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 4,
      minJaccard: Double = 0.8): DataFrame = {
    val spark = df.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val hashed = hashedShingles(df, idCol, textCol, n).persist(lvl)
    // the band SELF-join scans the signature frame twice and Spark does
    // not reuse the aggregation exchange across the two aliases — persist
    // the (tiny: one row per doc) signatures so the agg runs once
    val sigs = minhashSignaturesHashed(hashed, numHashes).persist(lvl)
    // candidates are consumed twice by verifyCandidates (the id gate and
    // the pair join) — persist the tiny pair set so the self-join runs once
    val cands = lshCandidates(lshBands(sigs, rowsPerBand)).persist(lvl)
    try {
      verifyCandidates(cands, hashed, minJaccard)
        .write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    } finally {
      cands.unpersist(false); sigs.unpersist(false); hashed.unpersist(false)
      ()
    }
  }

  /** One INCREMENTAL MinHash+LSH step — the streaming micro-batch form of
    * [[minhashLsh]] (builder brief: new batches must be checkable against
    * the accumulated corpus without a batch re-run). Given the accumulated
    * state of all previously-seen documents (band keys + hashed shingles;
    * `None` on the first batch) and a new batch, returns
    * `(newPairs, batchBands, batchHashed)`:
    *
    *  - `newPairs`: every verified near-dup pair touching the NEW batch on
    *    at least one side — old↔old pairs were emitted by earlier steps,
    *    and a pair can never re-emit later (candidates always require one
    *    side in the current batch), so the union of per-step emissions over
    *    any batch split equals the one-shot batch result exactly.
    *  - `batchBands` / `batchHashed`: the rows the caller appends to its
    *    state store for the next step.
    *
    * 100 TB shape: per step this joins the (tiny) batch band keys against
    * the accumulated band state on (band, band_key) — an equi-join that
    * shuffles only bucket collisions — and verification sets are built for
    * candidate ids only, same as the batch pipeline. State grows as one
    * narrow row per (doc, band) + one per (doc, shingle): both columnar,
    * partitionable, never collected.
    */
  def minhashLshIncrement(batch: DataFrame, idCol: String, textCol: String,
      priorBands: Option[DataFrame], priorHashed: Option[DataFrame],
      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 4,
      minJaccard: Double = 0.8): (DataFrame, DataFrame, DataFrame) = {
    val batchHashed = hashedShingles(batch, idCol, textCol, n)
    val batchBands =
      lshBands(minhashSignaturesHashed(batchHashed, numHashes), rowsPerBand)
    val allBands = priorBands.map(_.unionByName(batchBands)).getOrElse(batchBands)
    val allHashed = priorHashed.map(_.unionByName(batchHashed)).getOrElse(batchHashed)
    val a = allBands.as("a"); val b = batchBands.as("b")
    val cands = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    (verifyCandidates(cands, allHashed, minJaccard), batchBands, batchHashed)
  }

  private def minhashLshFrom(hashed: DataFrame, numHashes: Int,
      rowsPerBand: Int, minJaccard: Double): DataFrame = {
    val cands = lshCandidates(
      lshBands(minhashSignaturesHashed(hashed, numHashes), rowsPerBand))
    verifyCandidates(cands, hashed, minJaccard)
  }

  // -------------------------------------------------------------- simhash

  /** Signed per-token bit-contribution vector: +1 for every set bit of
    * the token's hash, -1 for every clear bit. Summing these over a
    * document's token OCCURRENCES is identical to the classic per-term
    * ±tf formulation (tf = number of occurrences), with no (id, term)
    * pre-aggregation shuffle.
    */
  private def bitContrib(h: Column, nbits: Int): Column =
    array((0 until nbits).map(i =>
      when(shiftright(h, i).bitwiseAND(lit(1L)) =!= 0, lit(1L))
        .otherwise(lit(-1L))): _*)

  /** Portable 60-bit SimHash as a '0'/'1' bit-string (msb first).
    * Per-token 60-bit md5 hash; bit b of the result is 1 iff the signed
    * sum of bit-b contributions over all token occurrences is positive.
    *
    * Single-pass shape: each token row carries its ±1 contribution vector
    * and ONE `groupBy(id)` sums them element-wise in a native partial
    * aggregate ([[graft.functions.vec_sum_long]]) — the shuffle moves one
    * 60-long vector per document per partition, not 60× the token rows.
    */
  def simhashBits(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.vec_sum_long
    val toks = spread(df)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("term"))
      .withColumn("h", portableHash(lit(0), col("term")))
      .withColumn("contrib", bitContrib(col("h"), 60))
    val sums = toks.groupBy("id").agg(vec_sum_long(col("contrib"), 60).as("s"))
    sums.select(col("id"),
      concat((59 to 0 by -1).map(i =>
        when(element_at(col("s"), i + 1) > 0, lit("1")).otherwise(lit("0"))): _*)
        .as("simhash"))
  }

  /** Fast-path 64-bit SimHash (xxhash64) as a single long. Same
    * single-aggregate shape as [[simhashBits]]; engine-internal (not
    * oracle-portable).
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.vec_sum_long
    val toks = spread(df)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.wsTokens(col(textCol))).as("term"))
      .withColumn("h", xxhash64(col("term")))
      .withColumn("contrib", bitContrib(col("h"), 64))
    val sums = toks.groupBy("id").agg(vec_sum_long(col("contrib"), 64).as("s"))
    val word = (0 until 64).map { i =>
      when(element_at(col("s"), i + 1) > 0,
        lit(if (i == 63) Long.MinValue else 1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    sums.select(col("id"), word.as("simhash"))
  }

  // -------------------------------------- embedding cosine near-duplicates

  /** Exact cosine near-duplicate pairs (id_a < id_b, cos >= threshold). */
  def cosineNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.vec_cos
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", vec_cos(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Deterministic ±1 hyperplane for SRP plane index `p`. */
  private def srpPlane(p: Int, dim: Int, seed: Long): Array[Float] =
    Array.tabulate(dim) { d =>
      if ((scala.util.hashing.MurmurHash3.productHash((p, d, seed)) & 1) == 1) 1.0f
      else -1.0f
    }

  /** Sign-random-projection bucket key (nbits planes) for LSH-bucketed
    * cosine near-dup at scale: pairs are only compared within a bucket.
    * Plane weights are deterministic pseudo-random in {-1,+1} derived from
    * MurmurHash3(plane, dimension, seed).
    */
  def srpBucket(vec: Column, dim: Int, nbits: Int, seed: Long = 42L): Column = {
    val bits = (0 until nbits).map { p =>
      val dotSign = (0 until dim).map { d =>
        element_at(vec, d + 1).cast("double") * lit(srpPlane(p, dim, seed)(d).toDouble)
      }.reduce(_ + _)
      when(dotSign > 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat(bits: _*)
  }

  /** All `bands` SRP band keys in ONE kernel call: a single
    * (bands·nbits)×dim matmul ([[graft.functions.vec_matmul]], codegen'd)
    * produces every projection; each band's key is the sign-bit string of
    * its nbits slice. Returns array<struct<band:int, key:string>>.
    *
    * `offsets` (when non-empty) shift each plane's threshold: bit i is
    * `dot(v, plane_i) > offsets(i)`, i.e. a hyperplane through the point
    * with those projections instead of the origin. [[srpNearDups]] passes
    * `dot(mean, plane_i)` — hyperplanes through the data CENTROID. Real
    * embedding corpora are correlated (a dominant direction), so
    * origin-through planes assign most vectors the same sign and the
    * buckets collapse to a handful of huge ones (measured: 7% of ALL
    * pairs became candidates — worse than the cartesian it replaces).
    * Centered planes split the corpus ~evenly per bit while still almost
    * never separating a near-duplicate pair (the pair's projection gap is
    * tiny relative to the corpus spread).
    */
  def srpBandKeys(vec: Column, dim: Int, nbits: Int, bands: Int,
      seed: Long = 42L, offsets: Array[Double] = Array.empty): Column = {
    import graft.functions.vec_srp_keys
    val planes = Array.tabulate(bands * nbits)(p => srpPlane(p, dim, seed))
    val offs = if (offsets.isEmpty) Array.fill(bands * nbits)(0.0) else offsets
    // one native kernel call per row ([[graft.functions.VecSrpKeys]]): a
    // Column-composed `when(element_at(vec_matmul(...), i) > off)` per bit
    // re-evaluates the matmul per BIT (Catalyst doesn't CSE the shared
    // subtree across branches) — quadratic in key width, measured 100+ s
    // where the fused kernel takes milliseconds
    vec_srp_keys(vec, planes, offs, nbits)
  }

  /** Banded-SRP cosine near-dup pipeline — the scale path (same shape as
    * [[minhashLsh]]): candidates = pairs sharing ANY of `bands` nbits-bit
    * sign keys (a bounded (band,key)-bucket join, NO cartesian product),
    * then exact cosine verification of the candidates. Every emitted pair
    * is exact. Output: (id_a, id_b, cos), id_a < id_b, cos >= threshold.
    *
    * Parameter shape (p = 1 - θ/π per bit): a near-dup at cos 0.99 misses
    * all bands with prob (1-p^nbits)^bands ≈ 9e-10 at the 16/32 defaults,
    * while a background pair at cos 0.6 collides somewhere with prob
    * ~0.13 and at cos 0.3 with ~0.008. SHORT keys are the classic trap:
    * at nbits=8, a cos-0.6 pair collides with prob 0.67 and a cos-0.3
    * pair with 0.23 — on a corpus with correlated embeddings that made
    * 7% of ALL pairs candidates, slower than the cartesian it replaces.
    * Longer keys + more bands keep recall while candidates stay ~linear.
    *
    * Recall AT the threshold is the honest number, not the cos-0.99 one:
    * a true pair sitting exactly at cos 0.90 (p ≈ 0.857) is missed with
    * prob (1 - 0.857^16)^32 ≈ 6% under the 16/32 defaults (vs ~0.4% under
    * the old 8/16 shape — the wider keys that cut false candidates also
    * thin near-threshold recall). Candidates are verified exactly, so a
    * missed pair is a RECALL loss, never a false emit — but against an
    * exact-pair oracle a corpus with true pairs near the threshold can
    * nondeterministically drop rows. If near-threshold recall matters,
    * raise `bands` (64 brings the cos-0.90 miss to ~0.4% at nbits=16,
    * doubling candidate-generation cost but not verification cost), or
    * lower `nbits` toward 8 when the corpus is known to be de-correlated.
    */
  def srpNearDups(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double, nbits: Int = 16, bands: Int = 32,
      seed: Long = 42L): DataFrame =
    srpNearDupsFrom(
      spread(df.select(col(idCol).as("id"), col(vecCol).as("v"))),
      dim, threshold, nbits, bands, seed)

  /** Eager scale form of [[srpNearDups]]: the (id, vector) projection is
    * persisted for the pipeline's duration (it feeds the centering pass,
    * the band-key build, and both verification joins), verified pairs are
    * written to `out`, the cache is released in a finally, and the written
    * table is returned.
    */
  def srpNearDupsTo(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double, out: String, nbits: Int = 16, bands: Int = 32,
      seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val vecs = spread(df.select(col(idCol).as("id"), col(vecCol).as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      srpNearDupsFrom(vecs, dim, threshold, nbits, bands, seed)
        .write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    } finally { vecs.unpersist(false); () }
  }

  /** Core banded-SRP pipeline over a canonical (id, v) frame. Lazy and
    * cache-free: `vecs` is scanned by the mean pass, the band-key build,
    * and both verify joins — [[srpNearDupsTo]] gives the scan a scoped
    * cache; lazy composers persist the input themselves when expensive.
    */
  /** Plane-centering offsets from a representative (id, vec) frame: the
    * per-plane projection of the frame's mean vector (one cheap agg pass).
    * The mean only steers CANDIDATE generation — emitted pairs are exact,
    * so float non-determinism in the avg cannot change correctness, and a
    * sample-derived mean (a first micro-batch, a bounded sample at 100 TB)
    * is as good as the full-corpus one.
    */
  def srpCenteringOffsets(df: DataFrame, vecCol: String,
      dim: Int, nbits: Int = 16, bands: Int = 32,
      seed: Long = 42L): Array[Double] = {
    val meanVec = df.agg(array((0 until dim).map(i =>
      avg(element_at(col(vecCol), i + 1))): _*).as("m"))
      .head().getSeq[Double](0).toArray
    Array.tabulate(bands * nbits)(p => srpPlane(p, dim, seed))
      .map(pl => pl.indices.foldLeft(0.0)((s, d) => s + pl(d) * meanVec(d)))
  }

  /** One INCREMENTAL banded-SRP near-dup step — the streaming micro-batch
    * form of [[srpNearDups]] (the embedding twin of
    * [[minhashLshIncrement]]): band keys of the new batch join against the
    * accumulated key state, candidates are exact-cosine-verified against
    * the accumulated vector state, and every emitted pair touches the new
    * batch on at least one side — a pair emits exactly once, in the batch
    * where its second member arrives. `offsets` must stay FIXED across
    * the stream (derive once from a representative batch via
    * [[srpCenteringOffsets]]) so keys are comparable across batches.
    * Returns `(newPairs, batchKeys, batchVecs)` — the caller appends the
    * latter two to its state store.
    */
  def srpNearDupIncrement(batch: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, offsets: Array[Double],
      priorKeys: Option[DataFrame], priorVecs: Option[DataFrame],
      nbits: Int = 16, bands: Int = 32, seed: Long = 42L)
      : (DataFrame, DataFrame, DataFrame) = {
    import graft.functions.vec_cos
    val vecs = spread(batch.select(col(idCol).as("id"), col(vecCol).as("v")))
    val keyed = vecs
      .select(col("id"),
        explode(srpBandKeys(col("v"), dim, nbits, bands, seed, offsets)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val allKeys = priorKeys.map(_.unionByName(keyed)).getOrElse(keyed)
    val allVecs = priorVecs.map(_.unionByName(vecs)).getOrElse(vecs)
    val cands = allKeys.as("a")
      .join(keyed.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    val pairs = cands
      .join(allVecs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(allVecs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("cos", vec_cos(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
    (pairs, keyed, vecs)
  }

  private def srpNearDupsFrom(vecs: DataFrame, dim: Int,
      threshold: Double, nbits: Int, bands: Int, seed: Long): DataFrame = {
    import graft.functions.vec_cos
    // center the hyperplanes on the corpus mean (see srpCenteringOffsets)
    val offsets = srpCenteringOffsets(vecs, "v", dim, nbits, bands, seed)
    // NOT materialized (unlike the minhash band self-join): the SRP key
    // build is one cheap vec scan + bit packing — tools/SrpAbProbe's
    // interleaved A/B read 0.75 s plain vs 1.13 s with keyed+cands
    // localCheckpoints, so re-deriving the aliases beats materializing
    // them here (minhash's aliases re-run md5 + a signature aggregation,
    // which is the expensive case that IS materialized)
    val keyed = vecs
      .select(col("id"),
        explode(srpBandKeys(col("v"), dim, nbits, bands, seed, offsets)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cands = keyed.as("a")
      .join(keyed.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cands
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("cos", vec_cos(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Line-level exact dedup (the CCNet/RefinedWeb boilerplate pass):
    * remove every NON-BLANK line whose exact content appears in at least
    * `minDocFreq` distinct documents — navigation chrome, cookie banners,
    * boilerplate headers repeat verbatim across pages while real prose
    * does not — and rebuild each document from its surviving lines in
    * the original order. Blank/whitespace-only lines are structural, not
    * content: they are kept and never counted.
    *
    * Scale shape: one posexplode (narrow), one line-keyed aggregation for
    * document frequencies (a corpus-wide shuffle — hot boilerplate lines
    * are exactly the frequent keys, so map-side partial counts collapse
    * them before the exchange), one equi-join of lines against the
    * frequent-line set (AQE broadcasts it when it measures small; no
    * forced hint, since at web scale the set is not guaranteed
    * driver-sized), and one per-doc ordered reassembly. Linear end to
    * end; no pairwise anything.
    *
    * Output: (id, text, n_lines, n_removed) — `text` rebuilt with "\n",
    * empty when every line was boilerplate.
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      minDocFreq: Int = 2, sep: String = "\n"): DataFrame = {
    require(minDocFreq >= 2, "minDocFreq must be >= 2")
    val lines = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
    val content = length(trim(col("line"))) > 0
    val hot = lines.where(content)
      .groupBy("line")
      .agg(countDistinct(col("id")).as("df"))
      .where(col("df") >= minDocFreq)
      .select(col("line"), lit(true).as("_hot"))
    // NO broadcast hint: at web scale the >= minDocFreq line set is not
    // guaranteed driver-sized (boilerplate can be a few percent of all
    // distinct lines) — let AQE pick broadcast when it measures small
    lines.join(hot, Seq("line"), "left")
      .withColumn("_drop", content && col("_hot").isNotNull)
      .groupBy("id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("_drop"), 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(when(!col("_drop"),
              struct(col("pos"), col("line"))))),
            x => x("line")),
          sep).as("text"))
      .select(col("id"), col("text"), col("n_lines"), col("n_removed"))
  }

  // ------------------------------------------------------------- SemDeDup

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup scoped
    * to precomputed clusters. Within each cluster, rows whose embeddings
    * are pairwise-similar above `eps` form duplicate groups (connected
    * components of the >= eps graph, [[Components.connectedComponents]]);
    * each group keeps exactly ONE representative — the member with the
    * LOWEST cosine to the cluster centroid (the paper's rule: keep the
    * outlier, drop the redundant near-centroid copies), ties by id.
    *
    * The pairwise pass is deliberately cluster-scoped — that is the
    * paper's own scale design: cluster count grows with the corpus
    * (k ≈ n/target_cluster_size, e.g. the paper's 50k clusters on LAION),
    * so per-cluster work stays bounded and the join is an equi-join on
    * the cluster key, never a corpus cartesian. Callers bring any cluster
    * assignment: an IVF cell ([[graft.index.IVF.Model.assignCol]]), a
    * KMeans label, or an SRP bucket for a cheap sub-linear variant.
    *
    * Centroids are computed from members (per-dim mean, float32
    * round-trip so engines agree), one tiny aggregate per cluster.
    *
    * Output: every input row as (id, cluster, component, centroid_cos,
    * keep) — component = min id of the duplicate group (own id when
    * unduplicated), centroid_cos rounded to 6 decimals, keep = survives
    * the dedup.
    *
    * Skew guard (round-8 verdict, ask 7): the operator TRUSTS the
    * caller's clustering — one huge cluster makes the pairwise pass
    * silently quadratic. `maxPairsPerCluster` bounds what a single
    * cluster may cost: one cheap cluster-keyed count runs first, and a
    * cluster whose n·(n−1)/2 exceeds the budget fails LOUDLY (never a
    * silent cap — re-cluster finer, or raise/disable the budget with
    * `maxPairsPerCluster <= 0` when the quadratic cost is intended).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, eps: Double, dim: Int,
      maxPairsPerCluster: Long = 1L << 31): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("id"), col(clusterCol).as("cluster"),
      col(vecCol).as("v"))
    if (maxPairsPerCluster > 0) {
      // one partial-aggregated count shuffle — negligible next to the
      // pairwise join it guards, and it fails BEFORE that join executes
      val worst = base.groupBy("cluster").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc).limit(1).collect().headOption
      worst.foreach { r =>
        val n = r.getLong(1)
        val pairs = n * (n - 1) / 2
        require(pairs <= maxPairsPerCluster,
          s"semanticDedup: cluster '${r.get(0)}' has $n members = " +
            s"$pairs candidate pairs > budget $maxPairsPerCluster — " +
            "re-cluster finer (more clusters), or raise/disable the " +
            "budget (maxPairsPerCluster <= 0) if the quadratic cost is " +
            "intended")
      }
    }
    val edges = base.select(col("cluster"), col("id").as("u"), col("v").as("va"))
      .join(base.select(col("cluster"), col("id").as("w"), col("v").as("vb")),
        Seq("cluster"))
      .where(col("u") < col("w"))
      .where(vec_cos(col("va"), col("vb")) >= eps)
      .select(col("u"), col("w").as("v"))
    val comp = Components.connectedComponents(edges)
    val cent = base.groupBy("cluster")
      .agg(count(lit(1)).as("n"), vec_sum_double(col("v"), dim).as("vs"))
      .select(col("cluster"),
        transform(col("vs"), x => (x / col("n")).cast("float")).as("c"))
    val scored = base
      .join(comp, Seq("id"), "left")
      .withColumn("component", coalesce(col("component"), col("id")))
      .join(cent, Seq("cluster"))
      .withColumn("centroid_cos", round(vec_cos(col("v"), col("c")), 6))
    val w = Window.partitionBy("component")
      .orderBy(col("centroid_cos").asc, col("id").asc)
    scored
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("id"), col("cluster"), col("component"),
        col("centroid_cos"), col("keep"))
  }

  // ------------------------------------------- exact duplicated substrings

  /** Exact duplicated-substring SPANS — the ExactSubstr pass of Lee et al.
    * 2022 ("Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499), reproduced without the suffix array: a character is
    * duplicated iff it lies inside some substring of length >= `minLen`
    * occurring at least twice in the corpus (any doc, any position,
    * including twice within one doc). That set equals the union of all
    * duplicated length-`minLen` windows — every length-`minLen` window of a
    * longer duplicated substring is itself duplicated — so fixed-length
    * gram marking gives the suffix-array answer with pure dataframe ops:
    *
    *  1. every length-`minLen` window → (id, pos, hash): one narrow
    *     explode, rows = total chars;
    *  2. hashes occurring >= 2 times globally: one hash-keyed aggregation
    *     (map-side partial counts collapse hot grams before the exchange);
    *  3. left-semi join of windows against the duplicated-hash set (AQE
    *     broadcasts it when it measures small) — steps 2+3 are the two
    *     total-chars shuffles this operator honestly costs at 100 TB;
    *  4. per-doc gaps-and-islands merge of marked windows [pos, pos+L)
    *     into maximal spans — one doc-keyed window, no self-join.
    *
    * Grouping on a 64-bit hash keeps the shuffle narrow; a collision can
    * only ADD a false span (P ~ 1e-9 at a billion grams) — swap in the
    * gram itself (or a 128-bit hash) when exactness must be absolute.
    * `portable = true` selects the md5-derived 60-bit hash the DuckDB
    * oracle reproduces (~8× the hashing CPU; oracle queries only —
    * production default is codegen'd xxhash64).
    *
    * Output: (id, span_start, span_end, span_len) — 1-based inclusive
    * start, exclusive end, one row per maximal span.
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      minLen: Int, portable: Boolean = false): DataFrame = {
    val grams = windowGrams(df, idCol, textCol, minLen, portable)
    // ONE total-grams shuffle, ONE gram pass: the per-hash count comes
    // from a window over the hash partition, so a gram row is marked in
    // place. The former groupBy(h)+left_semi shape shuffled the grams
    // TWICE (the count, then the join probe) and re-ran the whole
    // explode+hash pass for the probe side — at 6M docs (~720M gram
    // rows) that doubled both the dominant IO and the dominant CPU.
    // Identical marks: count over (partition by h) >= 2 is exactly
    // "h appears twice or more".
    import org.apache.spark.sql.expressions.Window
    val marked = grams
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("h")))
      .where(col("_n") >= 2)
      .select("id", "pos")
    mergeWindowSpans(marked, minLen)
  }

  /** Every length-`minLen` character window of every doc as
    * (id, pos, h) — pos 1-based; production hash = xxhash64 (codegen'd,
    * ~8x cheaper than md5 and the gram pass hashes every character
    * `minLen` times); portable=true switches to the md5-derived 60-bit
    * hash DuckDB can reproduce (oracle queries).
    */
  def windowGrams(df: DataFrame, idCol: String, textCol: String,
      minLen: Int, portable: Boolean = false): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    val L = minLen
    def gramHash(g: Column): Column =
      if (portable) portableHash(lit("ss"), g) else xxhash64(g)
    // the gram explode hashes every char minLen times — spread a narrow
    // scan first so it never runs single-task (r12: 2.8 s → 0.3 s)
    spread(df.where(length(col(textCol)) >= L))
      .select(col(idCol).as("id"),
        explode(sequence(lit(1), length(col(textCol)) - (L - 1))).as("pos"),
        col(textCol).as("_t"))
      .select(col("id"), col("pos"),
        gramHash(col("_t").substr(col("pos"), lit(L))).as("h"))
  }

  /** Merge marked windows [pos, pos+minLen) into maximal per-doc spans —
    * the gaps-and-islands pass shared by the batch and streaming paths.
    * `marked`: (id, pos). Output: (id, span_start, span_end, span_len).
    */
  def mergeWindowSpans(marked: DataFrame, minLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy("pos")
    val prevMax = max(col("e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .select(col("id"), col("pos"), (col("pos") + minLen).as("e"))
      .withColumn("_new",
        when(prevMax.isNull || col("pos") > prevMax, 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new")).over(w))
      .groupBy(col("id"), col("_island"))
      .agg(min(col("pos")).as("_s"), max(col("e")).as("_e"))
      .select(col("id"), col("_s").cast("long").as("span_start"),
        col("_e").cast("long").as("span_end"),
        (col("_e") - col("_s")).cast("long").as("span_len"))
  }

  /** Streaming increment of the ExactSubstr marking: given a batch of new
    * docs and the ACCUMULATED window-gram state (id, pos, h) of every
    * earlier batch, emit the window positions that become duplicated by
    * this batch — each marked position exactly once across the stream:
    *
    *  - a batch window is marked now iff its hash count over
    *    state ∪ batch is >= 2;
    *  - a STATE window is marked now iff it was previously unique
    *    (state count 1) and this batch collides with it — if its hash was
    *    already duplicated it was emitted when the second copy arrived.
    *
    * The union of emitted positions over all batches equals the batch
    * [[duplicateSpans]] marking of the full corpus, so
    * [[mergeWindowSpans]] over the accumulated marks reproduces the batch
    * spans exactly (the stream-vs-batch hash check in
    * `streaming_dedup_substr`). Joins are hash-keyed equi-joins against
    * the batch's hash set — per-batch work scales with the batch, plus
    * one probe of the state table.
    *
    * @return (marked (id, pos) to append to the marks store,
    *         batch grams (id, pos, h) to append to the gram state)
    */
  def duplicateSpanIncrement(batch: DataFrame, idCol: String,
      textCol: String, minLen: Int, stateGrams: Option[DataFrame],
      portable: Boolean = false): (DataFrame, DataFrame) = {
    val bg = windowGrams(batch, idCol, textCol, minLen, portable)
    val bc = bg.groupBy("h").agg(count(lit(1)).as("_bn"))
    val sc = stateGrams match {
      case Some(st) => st.groupBy("h").agg(count(lit(1)).as("_sn"))
      case None => bc.limit(0).select(col("h"), col("_bn").as("_sn"))
    }
    val tot = bc.join(sc, Seq("h"), "left")
      .select(col("h"), col("_bn"),
        (col("_bn") + coalesce(col("_sn"), lit(0L))).as("_tot"),
        coalesce(col("_sn"), lit(0L)).as("_snv"))
    val dupNow = tot.where(col("_tot") >= 2)
    val markedNew = bg.join(dupNow.select("h"), Seq("h"), "left_semi")
      .select("id", "pos")
    val markedOld = stateGrams match {
      case Some(st) =>
        st.join(dupNow.where(col("_snv") === 1).select("h"),
          Seq("h"), "left_semi").select("id", "pos")
      case None => markedNew.limit(0)
    }
    (markedNew.unionByName(markedOld), bg)
  }

  /** Cut every duplicated span found by [[duplicateSpans]] out of every
    * document — the remove-all-occurrences policy: deterministic, join-free
    * per doc, and the right default for training data, where repeated text
    * is exactly what over-trains (keep-one-occurrence needs a global owner
    * election per span and changes nothing downstream). Spans arrive as a
    * per-doc sorted array; the rebuild is one `aggregate` fold over kept
    * segments — all built-in HOFs, codegen'd, no UDF.
    *
    * Output: every input row as (id, text, n_spans, n_removed) — text with
    * spans cut (unchanged when none), n_removed = characters removed.
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      minLen: Int, portable: Boolean = false): DataFrame = {
    val spans = duplicateSpans(df, idCol, textCol, minLen, portable)
      .groupBy("id")
      .agg(
        sort_array(collect_list(struct(col("span_start"), col("span_end"))))
          .as("_spans"),
        count(lit(1)).as("n_spans"),
        sum(col("span_len")).as("n_removed"))
    val t = col("_t")
    val clean = aggregate(
      col("_spans"),
      struct(lit("").as("acc"), lit(1L).as("last")),
      (st, sp) => struct(
        concat(st("acc"),
          t.substr(st("last").cast("int"),
            (sp("span_start") - st("last")).cast("int"))).as("acc"),
        sp("span_end").as("last")),
      st => concat(st("acc"),
        t.substr(st("last").cast("int"),
          (length(t) - st("last") + 1).cast("int"))))
    df.select(col(idCol).as("id"), col(textCol).as("_t"))
      .join(spans, Seq("id"), "left")
      .select(col("id"),
        when(col("_spans").isNull, t).otherwise(clean).as("text"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }
}
