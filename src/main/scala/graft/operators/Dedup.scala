package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for large text corpora (builder brief /
  * BASELINE.json north_star: dedup as a first-class 100 TB operator,
  * generalizing the reference's exact-hash file identity checks,
  * faexport_db/models/file.py:50–63, to fuzzy document identity).
  *
  * All hashing uses Spark's codegen'd xxhash64 — no UDFs anywhere; the
  * whole family stays inside WholeStageCodegen until the LSH-bucket
  * shuffle.
  *
  * Scale design:
  *  - shingling/signatures are per-row narrow projections (no shuffle);
  *  - LSH banding shuffles once on (band_id, band_hash) — the classic
  *    O(n·bands) candidate generation instead of O(n²) pairs;
  *  - candidate verification joins only within buckets; skewed buckets
  *    (boilerplate shingles) can be salted or capped upstream.
  */
object Dedup {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct w-word shingles (w=3): the unit of MinHash/Jaccard
    * similarity. Texts shorter than w tokens contribute one whole-text
    * shingle (guards element_at under ANSI mode). */
  def shingles(text: Column, w: Int = 3): Column =
    graft.functions.VectorOps.shingles(tokens(text), w)

  /** MinHash signature: k independent permutations; sig[i] = min over
    * shingles of h_i(shingle). Each shingle STRING is hashed exactly
    * once; the k permutations re-hash the resulting long (h, i) —
    * hashing a fixed-width long k times is ~20× cheaper than hashing
    * the string k times, which dominates signature cost at corpus
    * scale. */
  def minhashSignature(sh: Column, k: Int = 32): Column =
    graft.functions.TextHashes.minhashSignature(sh, k)

  /** The pure-functions formulation kept for reference/portability: a
    * single left fold maintaining all k mins at once (an outer
    * per-permutation lambda would re-evaluate the whole upstream
    * shingle subtree per permutation after CollapseProject — measured
    * 20× slower; the native expression above is another ~10× over this
    * because nested higher-order functions evaluate interpreted with
    * per-element boxing). */
  def minhashSignatureHof(sh: Column, k: Int = 32): Column = {
    val base = transform(sh, s => xxhash64(s))
    aggregate(base,
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(
        acc,
        transform(sequence(lit(0), lit(k - 1)), i => xxhash64(h, i)),
        (a, x) => least(a, x)))
  }

  /** LSH band keys: split the signature into `bands` bands of
    * `rows = k/bands` and hash each; docs sharing any (band, hash) are
    * candidates. */
  def bandKeys(sig: Column, k: Int = 32, bands: Int = 8): Column = {
    val r = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      j => struct(j.as("band_id"),
        xxhash64(slice(sig, j * r + 1, lit(r))).as("band_hash")))
  }

  /** Exact Jaccard over two shingle arrays.
    *
    * PRECONDITION: both arrays must be duplicate-free — the identity
    * |A∪B| = |A|+|B|−|A∩B| used here holds only for sets, and a
    * caller passing raw token arrays (with repeats) gets silently
    * deflated similarities. Every in-repo producer satisfies this by
    * construction ([[shingles]]/ShinglesExpr dedupes); external
    * callers with possibly-repeating elements must `array_distinct`
    * first. The identity matters because one array_intersect replaces
    * the intersect+union pair — the verification step over candidate
    * pairs is the CPU hot spot of every sketch-dedup composite
    * (q27/q62/q67), and this halves its set-op work (the repeated
    * `inter` subtree is eliminated by codegen CSE). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / ((size(a) + size(b)).cast("double") - inter)
  }

  /** Lossless prefilter for `jaccard(a, b) >= t`: since
    * |A∩B| <= min(|A|,|B|) and |A∪B| >= max(|A|,|B|), J <= min/max —
    * a length comparison that skips the expensive set ops for the
    * random hash-bucket collisions that dominate candidate sets. */
  def sizeRatioAtLeast(a: Column, b: Column, t: Double): Column =
    least(size(a), size(b)).cast("double") >= lit(t) * greatest(size(a), size(b))

  /** SimHash (64-bit): per-token xxhash64, bit-wise majority vote
    * weighted by token frequency; near-dups have small Hamming
    * distance. Built from bit arithmetic on codegen'd functions. */
  def simhash(text: Column): Column =
    graft.functions.TextHashes.simhash64(tokens(text))

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Rebalance an under-partitioned input before CPU-heavy per-row
    * sketch compute (see [[graft.Tables.spread]]). */
  private[graft] def spread(df: DataFrame): DataFrame =
    graft.Tables.spread(df)

  /** Pin the candidate frame to full task width before the exact-
    * Jaccard verification joins — the [[graft.engine.Spread]] trap, at
    * the OTHER end of the pipeline: the candidate pair list is a few
    * narrow columns (AQE sees KBs and coalesces its exchange to 1–2
    * partitions), but each row then pays an array_intersect over two
    * whole shingle sets — the CPU hot spot of every sketch-dedup
    * composite. Measured at sf0.1 before this existed: the
    * verification stage of q67/q62 ran as 2 tasks of ~1.8 s each on a
    * 32-core session (ProfileQ; ~40% of the warm wall), with the other
    * 30 cores idle. Keyed on the first verification join's key so the
    * exchange doubles as that join's left-side distribution — at any
    * scale the join needed this shuffle anyway. */
  private def spreadForVerify(cands: DataFrame, key: String): DataFrame =
    graft.engine.Spread.spreadForExplosion(cands, col(key))

  /** Bucketed candidate self-join over a (keys..., doc, simhash)
    * sketch table: (doc_a, doc_b) pairs sharing the bucket key, each
    * generated exactly once. With `saltSlices > 1` the left side
    * hashes into sub-buckets and the right side replicates over every
    * slice, spreading a hot bucket's O(n²) pair generation across
    * saltSlices tasks — template-biased fingerprints can put 25%+ of a
    * corpus into single chunk buckets, and AQE skew-join thresholds
    * (hundreds of MB) never fire at sketch sizes. Default 1 adds no
    * salt machinery at all: replication costs more than the skew saves
    * below ~10k-doc buckets (DedupSpec asserts salted == unsalted). */
  private[operators] def bucketSelfJoinPairs(
      chunked: DataFrame, keys: Seq[String], saltSlices: Int): DataFrame = {
    val aBase = chunked.select(keys.map(col) ++ Seq(
      col("doc").as("doc_a"), col("simhash").as("sim_a")): _*)
    val bBase = chunked.select(keys.map(col) ++ Seq(
      col("doc").as("doc_b"), col("simhash").as("sim_b")): _*)
    val joined =
      if (saltSlices <= 1) aBase.join(bBase, keys)
      else aBase
        .withColumn("salt", pmod(xxhash64(col("doc_a")), lit(saltSlices)).cast("int"))
        .join(bBase.withColumn("salt",
          explode(sequence(lit(0), lit(saltSlices - 1)))), keys :+ "salt")
    joined.filter(col("doc_a") < col("doc_b"))
  }

  /** MinHash+LSH candidate pairs with exact-Jaccard verification.
    * Returns (doc_a, doc_b, jaccard) for candidates with
    * jaccard >= threshold.
    */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, threshold: Double = 0.7): DataFrame = {
    // shingles are computed once and persisted: the banding pass and
    // both sides of the candidate verification join reuse this frame
    // (at corpus scale this is the materialized signature table every
    // LSH pipeline keeps; registered for CacheRegistry.releaseAll so
    // long-lived sessions can drop it after materialization)
    val sh = graft.engine.CacheRegistry.retain(
      spread(docs.select(col(idCol), col(textCol))).select(
        col(idCol).as("doc"),
        shingles(col(textCol)).as("sh")))
    // band the ids only — the heavy shingle arrays are joined back in
    // just for the (much smaller) candidate set
    val banded = sh
      .select(col("doc"),
        explode(bandKeys(minhashSignature(col("sh"), k), k, bands)).as("band"))
      .select(col("doc"),
        col("band.band_id").as("band_id"), col("band.band_hash").as("band_hash"))
    val pairs = banded.select(col("band_id"), col("band_hash"), col("doc").as("doc_a"))
      .join(banded.select(col("band_id"), col("band_hash"), col("doc").as("doc_b")),
        Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct() // a pair may collide in several bands
    spreadForVerify(pairs, "doc_a")
      .join(sh.select(col("doc").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .filter(sizeRatioAtLeast(col("sh_a"), col("sh_b"), threshold))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Per-doc sketch frame (doc, sh, sig, simhash) — the table a
    * production deployment persists ONCE per corpus so later ingest
    * batches never re-read or re-hash the corpus text (at 100 TB,
    * additionally persist the exploded band/chunk tables bucketed by
    * their bucket keys; [[incrementalMinhashPairs]] derives them
    * narrowly when absent). Carries BOTH sketch families: single-
    * sketch banding recall is probabilistic (measured at sf0.1:
    * minhash 4×8 misses a few J 0.9+ pairs, simhash chunks miss
    * others, the union misses none — see [[multiSketchPairs]]). */
  def corpusSketch(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 32): DataFrame =
    spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc"), shingles(col(textCol)).as("sh"),
        simhash(col(textCol)).as("simhash"))
      .withColumn("sig", minhashSignature(col("sh"), k))

  /** Incremental cross-batch near-dup detection — the daily-ingest
    * shape of fuzzy dedup at corpus scale: a NEW batch of documents
    * is checked against an EXISTING corpus via the corpus's persisted
    * sketch table ([[corpusSketch]]); text is shingled and sketched
    * only for the batch. Candidates are the UNION of minhash-band and
    * simhash-chunk collisions (the [[multiSketchPairs]] recall
    * argument, applied cross-batch), each generated by broadcasting
    * the batch's bucket keys over the corpus-side table, so the
    * corpus streams with no shuffle and no recompute — cost per
    * ingest is O(batch · buckets) + candidate verification,
    * independent of corpus size. Returns
    * (batch_doc, corpus_doc, jaccard >= threshold).
    *
    * Batch and corpus ids must be DISJOINT (a shared id would emit a
    * degenerate self-pair); the daily-ingest contract guarantees it.
    *
    * The broadcast hint is applied only while the batch holds at most
    * `maxBroadcastBatchDocs` documents (each contributes `bands` +
    * `chunks` narrow key rows to the broadcast tables). A
    * backfill-sized batch above the threshold gets NO hint — the
    * candidate joins then shuffle on the bucket keys (AQE may still
    * choose a broadcast from actual sizes), which is slower but
    * cannot hit Spark's broadcast hard limit. The count that decides
    * this materializes the retained batch sketch, work the candidate
    * joins were about to do anyway.
    */
  def incrementalMinhashPairs(corpusSketch: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, k: Int = 32, bands: Int = 4,
      chunks: Int = 8, threshold: Double = 0.8,
      maxBroadcastBatchDocs: Long = 1000000L): DataFrame = {
    val corpus = graft.engine.CacheRegistry.retain(corpusSketch)
    incrementalMinhashPairsFromStore(
      corpus.select(col("doc"), col("sh")),
      explodedBands(corpus, k, bands), explodedChunks(corpus, chunks),
      batch, idCol, textCol, k, bands, chunks, threshold,
      maxBroadcastBatchDocs)
  }

  /** Exploded minhash band-key table (doc, band_id, band_hash) of a
    * [[corpusSketch]] frame — at rest, persisted bucketed by
    * (band_id, band_hash) so candidate joins read bucket-local data. */
  def explodedBands(sketch: DataFrame, k: Int = 32,
      bands: Int = 4): DataFrame =
    sketch.select(col("doc"),
      explode(bandKeys(col("sig"), k, bands)).as("band"))
      .select(col("doc"), col("band.band_id").as("band_id"),
        col("band.band_hash").as("band_hash"))

  /** Exploded simhash chunk table (doc, simhash, chunk_idx,
    * chunk_value) of a [[corpusSketch]] frame — at rest, persisted
    * bucketed by (chunk_idx, chunk_value). Carries the full simhash so
    * the pigeonhole Hamming filter runs without a join back. */
  def explodedChunks(sketch: DataFrame, chunks: Int = 8): DataFrame = {
    val bits = 64 / chunks
    sketch.select(col("doc"), col("simhash"),
      explode(transform(sequence(lit(0), lit(chunks - 1)), c => struct(
        c.as("chunk_idx"),
        call_function("shiftright", col("simhash"), c * bits)
          .bitwiseAND(lit((1L << bits) - 1)).as("chunk_value")))).as("ch"))
      .select(col("doc"), col("simhash"),
        col("ch.chunk_idx").as("chunk_idx"), col("ch.chunk_value").as("chunk_value"))
  }

  /** [[incrementalMinhashPairs]] against the AT-REST corpus layout:
    * the three corpus-side tables a production deployment writes once
    * per corpus — `corpusShingles` (doc, sh), `corpusBands`
    * ([[explodedBands]]), `corpusChunks` ([[explodedChunks]]) — are
    * read from persisted storage, so an ingest batch never re-reads or
    * re-hashes corpus text even across JVMs (the in-JVM-cache variant
    * above derives them from the sketch frame and delegates here).
    * Same contract: batch/corpus ids disjoint, broadcast hint only
    * under `maxBroadcastBatchDocs`. */
  def incrementalMinhashPairsFromStore(
      corpusShingles: DataFrame, corpusBands: DataFrame,
      corpusChunks: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, k: Int = 32, bands: Int = 4,
      chunks: Int = 8, threshold: Double = 0.8,
      maxBroadcastBatchDocs: Long = 1000000L): DataFrame = {
    val batchSk = graft.engine.CacheRegistry.retain(
      spread(batch.select(col(idCol), col(textCol)))
        .select(col(idCol).as("doc"), shingles(col(textCol)).as("sh"),
          simhash(col(textCol)).as("simhash"))
        .withColumn("sig", minhashSignature(col("sh"), k)))
    val hintBatch: DataFrame => DataFrame =
      if (batchSk.count() <= maxBroadcastBatchDocs) broadcast else identity
    val batchBands = explodedBands(batchSk, k, bands)
      .select(col("doc").as("batch_doc"), col("band_id"), col("band_hash"))
    val batchChunks = explodedChunks(batchSk, chunks)
      .select(col("doc").as("batch_doc"),
        col("simhash").as("sim_a"), col("chunk_idx"), col("chunk_value"))
    val mhCands = pruneToProbeKeys(corpusBands, "band_hash",
        batchBands, "band_hash")
      .join(hintBatch(batchBands), Seq("band_id", "band_hash"))
      .select(col("batch_doc"), col("doc").as("corpus_doc"))
    // pigeonhole: any pair within Hamming < chunks shares a chunk
    val shCands = pruneToProbeKeys(corpusChunks, "chunk_value",
        batchChunks, "chunk_value")
      .join(hintBatch(batchChunks), Seq("chunk_idx", "chunk_value"))
      .filter(hamming(col("sim_a"), col("simhash")) <= chunks - 1)
      .select(col("batch_doc"), col("doc").as("corpus_doc"))
    val cands = graft.engine.CacheRegistry.retain(
      mhCands.unionByName(shCands)
        .distinct()) // a pair may collide in several buckets/sketches
    cands
      .join(batchSk.select(col("doc").as("batch_doc"), col("sh").as("sh_a")),
        Seq("batch_doc"))
      .join(pruneToCandidateDocs(corpusShingles, cands, "corpus_doc")
          .select(col("doc").as("corpus_doc"), col("sh").as("sh_b")),
        Seq("corpus_doc"))
      .filter(sizeRatioAtLeast(col("sh_a"), col("sh_b"), threshold))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_doc"), col("corpus_doc"), col("jaccard"))
  }

  /** The corpus-side shingle frame restricted to a probe's candidate
    * doc ids, pushed into the SCAN: the verification join of the
    * incremental probes is batch-proportional in rows matched but was
    * corpus-proportional in bytes read — it streamed every corpus
    * shingle array to verify a candidate set that names a fraction of
    * a percent of the docs (measured 2.8 s of a 4.4 s probe at 262k
    * docs × 300 tokens). The candidate ids are batch-bounded (batch
    * docs × collisions per sketch family), so collect them — a
    * bounded coordinator read of the same class as the union-find
    * edge collect — and filter the at-rest table with an exact-values
    * IN predicate. [[graft.storage.Storage.appendBucketed]] sorts the
    * shingle store by `doc` inside each bucket, so parquet row-group
    * stats and page indexes skip the non-candidate bulk; the skip
    * fraction grows with corpus size (at gate scale the table is a
    * handful of row groups, at 100 TB it is millions, of which a
    * batch touches thousands). Above `maxIds` — a backfill-sized
    * probe — the prune is skipped and the join reverts to the full
    * stream (AT that batch size the scan amortizes; an unbounded
    * collect would not). */
  private def pruneToCandidateDocs(corpusShingles: DataFrame,
      cands: DataFrame, idCol: String): DataFrame =
    pruneToProbeKeys(corpusShingles, "doc", cands, idCol)

  /** Restrict an at-rest sorted table to the key values a
    * batch-bounded probe frame actually names — the
    * [[graft.engine.ProbePrune]] contract (bounded collect, InSet row
    * filter, range-cover pushdown). Also applied to the
    * candidate-generation scans (bands on `band_hash`, chunks on
    * `chunk_value` — a SUPERSET of the composite join key, which the
    * following equi-join re-tightens, so semantics are unchanged). */
  private def pruneToProbeKeys(table: DataFrame, tableCol: String,
      probe: DataFrame, probeCol: String): DataFrame =
    graft.engine.ProbePrune.pruneToProbeKeys(table, tableCol, probe, probeCol)

  /** [[incrementalMinhashPairsFromStore]] with the BATCH side ALSO in
    * sketch-table form: both ends of the probe are (shingles, bands,
    * chunks) frames, so the operation hashes no text at all. This is
    * the accept-lifecycle shape — acceptSketchBatch persists the
    * batch's sketch before the cluster write-back runs, so
    * [[graft.queries.LlmOps.acceptClusterRelabel]] probes with the
    * partitions just written instead of re-shingling the batch text
    * (which the inline variants do once per call — three sketch
    * passes per accepted batch before this existed). The batch-side
    * frames also come cheap from a single in-memory [[corpusSketch]]
    * via [[explodedBands]]/[[explodedChunks]] (the q123 shape).
    * Candidate generation broadcasts the batch-side key tables while
    * the batch holds at most `maxBroadcastBatchDocs` docs — the same
    * backfill guard, decided by one batch-sized count; verification
    * joins the two shingle tables. Recall contract identical to the
    * inline variant: the union of both sketch families' collisions,
    * each pair verified once by exact Jaccard. Batch and corpus doc
    * ids must be disjoint (the accept id guard enforces it). Returns
    * (batch_doc, corpus_doc, jaccard >= threshold). */
  def incrementalPairsBetweenStores(
      corpusShingles: DataFrame, corpusBands: DataFrame,
      corpusChunks: DataFrame, batchShingles: DataFrame,
      batchBands: DataFrame, batchChunks: DataFrame,
      chunks: Int = 8, threshold: Double = 0.8,
      maxBroadcastBatchDocs: Long = 1000000L): DataFrame = {
    val hintBatch: DataFrame => DataFrame =
      if (batchShingles.count() <= maxBroadcastBatchDocs) broadcast
      else identity
    val mhCands = pruneToProbeKeys(corpusBands, "band_hash",
        batchBands, "band_hash")
      .join(hintBatch(batchBands.select(col("doc").as("batch_doc"),
          col("band_id"), col("band_hash"))),
        Seq("band_id", "band_hash"))
      .select(col("batch_doc"), col("doc").as("corpus_doc"))
    // pigeonhole: any pair within Hamming < chunks shares a chunk
    val shCands = pruneToProbeKeys(corpusChunks, "chunk_value",
        batchChunks, "chunk_value")
      .join(hintBatch(batchChunks.select(col("doc").as("batch_doc"),
          col("simhash").as("sim_a"), col("chunk_idx"), col("chunk_value"))),
        Seq("chunk_idx", "chunk_value"))
      .filter(hamming(col("sim_a"), col("simhash")) <= chunks - 1)
      .select(col("batch_doc"), col("doc").as("corpus_doc"))
    val cands = graft.engine.CacheRegistry.retain(
      mhCands.unionByName(shCands)
        .distinct()) // a pair may collide in several buckets/sketches
    cands
      .join(hintBatch(batchShingles
          .select(col("doc").as("batch_doc"), col("sh").as("sh_a"))),
        Seq("batch_doc"))
      .join(pruneToCandidateDocs(corpusShingles, cands, "corpus_doc")
          .select(col("doc").as("corpus_doc"), col("sh").as("sh_b")),
        Seq("corpus_doc"))
      .filter(sizeRatioAtLeast(col("sh_a"), col("sh_b"), threshold))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_doc"), col("corpus_doc"), col("jaccard"))
  }

  /** [[multiSketchPairs]] against the AT-REST corpus layout: WITHIN-
    * corpus near-dup pairs computed entirely from the persisted sketch
    * tables — `corpusShingles` (doc, sh), `corpusBands`
    * ([[explodedBands]]), `corpusChunks` ([[explodedChunks]]) — so a
    * periodic whole-corpus dedup, or the near-dup stage of a curation
    * run (q119), never re-shingles or re-hashes a byte of corpus text.
    * With the tables bucketed by their bucket keys (the layout
    * [[corpusSketch]] prescribes and q91's store writes), both
    * candidate self-joins can run bucket-local — no Exchange on the
    * n·bands candidate-generation side, which is the whole shuffle
    * cost of the inline path (at gate scale the planner instead picks
    * a broadcast build over one bucketed scan: also Exchange-free, and
    * faster than the inline path even against its warm cache because
    * the sketch compute is gone — the committed BENCH_FULL_latest.json
    * carries the gate-level comparison, q119 vs q67).
    * Verification reads the stored shingle arrays (doc-bucketed, so
    * the verification joins co-partition at corpus scale).
    * Recall contract identical to [[multiSketchPairs]]:
    * the union of both sketch families' candidates, each pair verified
    * exactly once by exact Jaccard. Returns (doc_a, doc_b, jaccard
    * >= threshold) with doc_a < doc_b. */
  def multiSketchPairsFromStore(corpusShingles: DataFrame,
      corpusBands: DataFrame, corpusChunks: DataFrame,
      threshold: Double = 0.8, chunks: Int = 8,
      spreadVerify: Boolean = true): DataFrame = {
    val mhCands = corpusBands
      .select(col("band_id"), col("band_hash"), col("doc").as("doc_a"))
      .join(corpusBands.select(col("band_id"), col("band_hash"),
          col("doc").as("doc_b")),
        Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val shCands = corpusChunks
      .select(col("chunk_idx"), col("chunk_value"),
        col("doc").as("doc_a"), col("simhash").as("sim_a"))
      .join(corpusChunks.select(col("chunk_idx"), col("chunk_value"),
          col("doc").as("doc_b"), col("simhash").as("sim_b")),
        Seq("chunk_idx", "chunk_value"))
      .filter(col("doc_a") < col("doc_b"))
      // pigeonhole: any pair within Hamming < chunks shares a chunk
      .filter(hamming(col("sim_a"), col("sim_b")) <= chunks - 1)
      .select("doc_a", "doc_b")
    // a pair may collide in several buckets/sketches → distinct;
    // spreadVerify=false for BATCH-sized sketch frames (q123's
    // internal-edge call), where the pinned exchange costs more than
    // the 32-way verification buys — the corpus-scale callers (q119)
    // keep the full-width verification
    val dedupedCands = mhCands.unionByName(shCands).distinct()
    (if (spreadVerify) spreadForVerify(dedupedCands, "doc_a")
     else dedupedCands)
      .join(corpusShingles.select(col("doc").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(corpusShingles.select(col("doc").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .filter(sizeRatioAtLeast(col("sh_a"), col("sh_b"), threshold))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Multi-sketch near-dup pair generation: the UNION of the
    * minhash-banding and simhash-chunk candidate sets, verified once
    * by exact Jaccard. Single-sketch recall is probabilistic —
    * measured on the synthetic corpus at sf0.1: minhash (4×8 bands)
    * missed 3 of ~256 true pairs (J 0.91–0.96 banding misses),
    * simhash (Hamming<=7) missed 15 (fingerprint distance above the
    * pigeonhole bound) — while each covered every pair the other
    * missed. Unioning independent sketch families is the production
    * answer for recall at corpus scale.
    *
    * One scan computes shingles, minhash signature, and simhash per
    * doc into a single persisted sketch table; both candidate
    * generators and both sides of the verification join read it, and
    * each candidate pair is verified exactly once. */
  def multiSketchPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, k: Int = 32, bands: Int = 4,
      chunks: Int = 8, saltSlices: Int = 1): DataFrame = {
    val bits = 64 / chunks
    val base = graft.engine.CacheRegistry.retain(
      spread(docs.select(col(idCol), col(textCol)))
        .select(col(idCol).as("doc"),
          shingles(col(textCol)).as("sh"),
          simhash(col(textCol)).as("simhash"))
        .withColumn("sig", minhashSignature(col("sh"), k)))
    val banded = base.select(col("doc"),
      explode(bandKeys(col("sig"), k, bands)).as("band"))
      .select(col("doc"), col("band.band_id").as("kind_key"),
        col("band.band_hash").as("bucket"))
    val chunked = base.select(col("doc"), col("simhash"),
      explode(transform(sequence(lit(0), lit(chunks - 1)), c => struct(
        (c + 1000).as("kind_key"), // offset: never collides with band ids
        call_function("shiftright", col("simhash"), c * bits)
          .bitwiseAND(lit((1L << bits) - 1)).as("bucket")))).as("ch"))
      .select(col("doc"), col("simhash"),
        col("ch.kind_key").as("kind_key"), col("ch.bucket").as("bucket"))
    val mhCands = banded.select(col("kind_key"), col("bucket"), col("doc").as("doc_a"))
      .join(banded.select(col("kind_key"), col("bucket"), col("doc").as("doc_b")),
        Seq("kind_key", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val shCands = bucketSelfJoinPairs(chunked, Seq("kind_key", "bucket"), saltSlices)
      .filter(hamming(col("sim_a"), col("sim_b")) <= chunks - 1)
      .select("doc_a", "doc_b")
    spreadForVerify(mhCands.unionByName(shCands).distinct(), "doc_a")
      .join(base.select(col("doc").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(base.select(col("doc").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .filter(sizeRatioAtLeast(col("sh_a"), col("sh_b"), threshold))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  private def symEdges(e: DataFrame): DataFrame =
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))

  /** m(u) = min(Γ(u) ∪ {u}) over a symmetric adjacency. */
  private def nbrMins(adj: DataFrame): DataFrame =
    adj.groupBy(col("src").as("u")).agg(min(col("dst")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))

  /** Alternating star contraction (the large-star / small-star
    * MapReduce-CC algorithm, Kiveris et al. 2014; also GraphFrames'
    * default): each large-star re-attaches every larger-id neighbor
    * of u to m(u) = min(Γ(u) ∪ u), each small-star the smaller-id
    * neighbors (and u itself); the graph contracts toward
    * min-centered stars in O(log² n) rounds REGARDLESS of component
    * diameter. Input must be a symmetric loop-free adjacency; returns
    * (node, cluster = component-min id) for every node with an edge.
    *
    * Per round: two grouped min-aggregations and two node-keyed joins
    * over a SHRINKING edge table (each undirected edge maps to at
    * most one re-attached edge — no blowup); convergence = edge-set
    * stability (both-direction exceptAll, cheap once stars form). Hot
    * star centers are groupBy keys (map-side partial min) and
    * unique-keyed join build sides, so no shuffle-output skew. */
  private def starContract(adjInit: DataFrame, maxIter: Int): (DataFrame, Int) = {
    var adj = adjInit.localCheckpoint(false)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // LARGE-STAR: every neighbor v > u re-attaches to m(u); each
      // undirected edge is processed from its smaller endpoint only
      val ls = adj.filter(col("dst") > col("src"))
        .join(nbrMins(adj), col("src") === col("u"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
      val adjLs = symEdges(ls).distinct().localCheckpoint(false)
      // SMALL-STAR: the v <= u neighbors (and u itself) attach to m(u)
      val m2 = nbrMins(adjLs)
      val ss = adjLs.filter(col("dst") < col("src"))
        .join(m2, col("src") === col("u"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(m2.select(col("u").as("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
      val next = symEdges(ss).distinct().localCheckpoint(false)
      // a full no-op round means both operations hit their fixpoint —
      // the graph is a forest of min-centered stars (each op strictly
      // shrinks the paper's potential otherwise, so no oscillation)
      done = next.exceptAll(adj).unionByName(adj.exceptAll(next)).isEmpty
      adj = next
      iter += 1
    }
    require(done, s"starContract did not converge in $maxIter rounds")
    (nbrMins(adj).select(col("u").as("node"), col("m").as("cluster")), iter)
  }

  /** Near-dup CLUSTER formation — the step that turns a pair list into
    * dedup decisions (keep one representative per cluster): connected
    * components, HYBRID. Phase 1 runs a few rounds of one-hop
    * min-label propagation — the cheapest possible round (one edge
    * join + one count), and near-dup graphs in the wild are
    * small-diameter clusters that fully converge here. Phase 2, only
    * if labels are still moving, CONTRACTS the graph by the current
    * labels and finishes with [[starContract]] — O(log² n) rounds
    * regardless of diameter.
    *
    * The split exists because each phase loses badly outside its
    * regime, measured at sf0.1: on q102's near-percolation
    * 0.4-threshold graph one-hop alone needs 16 rounds (vs
    * maxIter = 20 — a crash waiting for the next scale factor; label
    * pointer-doubling only trims it to 12), while pure star
    * contraction converges in 4 rounds but its heavier rounds cost
    * ~1.1 s extra on the small-diameter q62/q67 graphs that one-hop
    * finishes in 4. The hybrid keeps the cheap path exactly when it
    * wins and bounds the long-chain case by contraction.
    *
    * 100 TB shape: phase-1 rounds are one shuffle each on the node
    * key (the classic large-graph CC), `localCheckpoint` per round
    * cuts lineage, edge table persisted; the phase-2 contracted graph
    * is label-image-sized (≤ nodes, usually far smaller). Returns
    * (node, cluster) with cluster = min node id in the component.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, oneHopRounds: Int = 4): DataFrame =
    connectedComponentsWithStats(pairs, aCol, bCol, maxIter, oneHopRounds)._1

  /** INCREMENTAL cluster maintenance — the production lifecycle of
    * near-dup clustering: the corpus's (node, cluster = component min
    * id) labels are already materialized (q62's output at rest), a new
    * ingest batch arrives with its cross-edges to the corpus
    * ([[incrementalMinhashPairsFromStore]]) and its internal edges
    * ([[multiSketchPairs]] over just the batch), and the labels are
    * brought up to date WITHOUT re-clustering the corpus.
    *
    * Mechanism: contract every batch↔corpus edge to the corpus
    * endpoint's stored cluster label (a previously edge-less corpus
    * doc rides as itself), union the batch-internal edges, and run
    * [[connectedComponents]] on this CONTRACTED graph — its node set
    * is {touched cluster labels} ∪ {batch docs} ∪ {newly touched
    * corpus docs}, sized by the batch's adjacency, not the corpus.
    * Because a stored label IS the min id of its component, the
    * contracted component min equals the global min over the merged
    * member sets, so relabeling is exact: stored labels whose cluster
    * appears in the contracted result remap to its component min (one
    * broadcast-sized join over the label column — untouched clusters
    * pass through unchanged), and contracted nodes that are real doc
    * ids (batch docs, newly touched corpus docs) take their component
    * min directly. Output schema and semantics equal a full
    * re-clustering over corpus ∪ batch edges — q123 pins this against
    * q62's recursive-CTE oracle, DedupSpec against the operator
    * itself (cluster merges via a batch bridge included).
    *
    * PRECONDITION: batch ids must be DISJOINT from corpus ids (the
    * same daily-ingest contract [[incrementalMinhashPairsFromStore]]
    * documents) — a batch doc sharing an id with a clustered corpus
    * doc would be emitted twice (once remapped, once as a contracted
    * node), and one sharing an id with an untouched cluster's LABEL
    * would hijack that cluster through the remap join. Re-ingesting a
    * corrected version of an existing doc is an upsert, not an
    * accept: route it through a refresh. ENFORCED: both variants fail
    * fast on a collision (broadcast semi-join guard in the shared
    * core; DedupSpec pins the rejection).
    *
    * At 100 TB: the expensive loop runs on the contracted graph
    * (batch-sized); the only corpus-scale work is the narrow label
    * remap join, and nothing re-reads corpus text or re-shuffles
    * corpus edges — in particular the touched-label set used to
    * separate real-doc nodes from label nodes is collected from the
    * contraction join itself (batch-adjacency-sized, broadcastable),
    * never from a corpus-wide distinct. */
  def incrementalConnectedComponents(storedLabels: DataFrame,
      batchCorpusEdges: DataFrame, batchEdges: DataFrame): DataFrame = {
    val (cc, touched) =
      contractedRelabel(storedLabels, batchCorpusEdges, batchEdges)
    val remapped = storedLabels
      .join(cc.withColumnRenamed("cnode", "cluster"), Seq("cluster"), "left")
      .select(col("node"), coalesce(col("cl"), col("cluster")).as("cluster"))
    val newNodes = cc.join(touched, Seq("cnode"), "left_anti")
      .select(col("cnode").as("node"), col("cl").as("cluster"))
    remapped.unionByName(newNodes)
  }

  /** The LABEL-DELTA form of [[incrementalConnectedComponents]]: only
    * rows whose label CHANGED (members of clusters a batch edge merged
    * into a smaller-min component) plus NEW nodes (batch docs and
    * newly-touched edge-less corpus docs) are emitted — untouched
    * clusters stay at rest entirely. The full labeling is `stored
    * labels overridden by delta` (apply deltas latest-batch-wins);
    * DedupSpec pins delta-applied ≡ the full variant ≡ a from-scratch
    * [[connectedComponents]] run.
    *
    * This is what makes per-batch maintenance cost genuinely
    * batch-proportional at 100 TB: the full variant's output (and its
    * store write-back) is corpus-sized per batch, while this delta is
    * sized by the batch's adjacency — the corpus-scale work left is
    * one broadcast-inner-join SCAN of the label store (changed-member
    * lookup; no shuffle, no corpus-wide write), measured in
    * SCALE_EVIDENCE's incremental_clusters sweep. */
  def incrementalConnectedComponentsDelta(storedLabels: DataFrame,
      batchCorpusEdges: DataFrame, batchEdges: DataFrame): DataFrame = {
    val (cc, touched) =
      contractedRelabel(storedLabels, batchCorpusEdges, batchEdges)
    // members of touched clusters whose component min moved: the cc
    // frame is batch-adjacency-sized, so the lookup broadcasts and the
    // stored-label side is a narrow scan, not a shuffle
    val changed = storedLabels
      .join(broadcast(cc.withColumnRenamed("cnode", "cluster")),
        Seq("cluster"))
      .filter(col("cl") =!= col("cluster"))
      .select(col("node"), col("cl").as("cluster"))
    val newNodes = cc.join(touched, Seq("cnode"), "left_anti")
      .select(col("cnode").as("node"), col("cl").as("cluster"))
    changed.unionByName(newNodes)
  }

  /** Shared core of the incremental-CC variants: contract batch edges
    * to stored labels, run CC on the contracted (batch-sized) graph,
    * and return (contracted labels as (cnode, cl), touched stored
    * labels as (cnode)). Enforces the id-disjointness PRECONDITION
    * documented on [[incrementalConnectedComponents]]: batch ids must
    * not collide with stored nodes (stored labels are component-min
    * member ids, so the node check covers labels too) — a collision
    * would silently double-emit the doc or hijack an untouched cluster
    * through the remap join, so it fails fast instead, naming the
    * upsert route. */
  private def contractedRelabel(storedLabels: DataFrame,
      batchCorpusEdges: DataFrame, batchEdges: DataFrame)
      : (DataFrame, DataFrame) = {
    // retained: the contraction join feeds the contracted edge list,
    // the touched-label set, AND the precondition guard below, and its
    // upstream (the batch-corpus edge derivation) is typically the
    // query's most expensive subtree — without the cache Spark
    // re-evaluates it once per consumer. Batch-adjacency-sized,
    // registered for CacheRegistry.releaseAll like sparseTopK's build
    // (callers release at query boundaries; see CacheRegistry's
    // contract). batchEdges likewise (guard + contracted union).
    val bc0 = graft.engine.CacheRegistry.retain(batchCorpusEdges
      .join(storedLabels.withColumnRenamed("node", "corpus_doc"),
        Seq("corpus_doc"), "left"))
    val be = graft.engine.CacheRegistry.retain(
      batchEdges.select(col("doc_a"), col("doc_b")))
    // the guard's collect is the FIRST action, so it also materializes
    // both caches for the main pipeline; limit(5) keeps it a bounded
    // coordinator read (offender sample for the error message)
    val batchIds = bc0.select(col("batch_doc").as("id"))
      .unionByName(be.select(col("doc_a").as("id")))
      .unionByName(be.select(col("doc_b").as("id")))
      .distinct()
    val clash = storedLabels
      .join(broadcast(batchIds), col("node") === col("id"), "left_semi")
      .select(col("node")).limit(5).collect()
    require(clash.isEmpty,
      "incremental CC precondition violated: batch ids " +
        clash.map(_.get(0)).mkString(", ") +
        " already exist in the stored labels — re-ingesting an existing doc " +
        "is an upsert, not an accept; route it through a store refresh " +
        "(StoreAdmin refresh) instead")
    val bc = bc0.select(col("batch_doc").as("a"),
      coalesce(col("cluster"), col("corpus_doc")).as("b"))
    val contracted = bc
      .unionByName(be.select(col("doc_a").as("a"), col("doc_b").as("b")))
    val cc = connectedComponents(contracted, "a", "b")
      .select(col("node").as("cnode"), col("cluster").as("cl"))
    // contracted nodes that are real doc ids, not stored labels: batch
    // docs and corpus docs that had no corpus-internal edge before.
    // Every label in the contracted graph arrived through a bc edge,
    // so the label set to exclude is exactly the contraction join's
    // matched clusters — batch-adjacency-sized, NOT a corpus-wide
    // distinct over the stored labels
    val touchedLabels = bc0.filter(col("cluster").isNotNull)
      .select(col("cluster").as("cnode")).distinct()
    (cc, touchedLabels)
  }

  /** [[connectedComponents]] plus its round counts
    * (one-hop rounds run, star-contraction rounds run) — the numbers
    * `ScaleEvidence`'s convergence sweep records.
    *
    * Scale-adaptive short-circuit: the edge table is counted anyway
    * (to materialize it ahead of the checkpoint loop), and when the
    * count is at or below `localEdgeThreshold` the labels are solved
    * with a driver-side min-id union-find instead of the distributed
    * loop — the same runtime size-switch philosophy as AQE's
    * broadcast decision. Below the threshold the edge list is a
    * dimension-sized table (≤ 16 MB of (long, long) at the 1M
    * default) and the ~10 driver-coordinated label-propagation /
    * star-contraction rounds are pure job-scheduling latency
    * (measured: the CC stage of q102 cost ~3 s at a few hundred
    * edges, all of it round overhead); past the threshold the
    * distributed loop below engages unchanged. This collect is a
    * documented bounded coordinator read — the contract of the k-row
    * landmark and centroid collects — NOT a data-scale collect: the
    * bound is on the near-dup PAIR count, which the callers' banded /
    * celled candidate generation keeps linear in corpus size. The
    * union-find reproduces the loop's labels exactly (component min
    * id, deterministic); ScaleEvidence's convergence sweep passes
    * threshold 0 so it always measures the distributed rounds. */
  private[graft] def connectedComponentsWithStats(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, oneHopRounds: Int = 4,
      localEdgeThreshold: Long = 1L << 20): (DataFrame, Int, Int) = {
    val edges = symEdges(pairs
        .select(col(aCol).as("src"), col(bCol).as("dst"))
        .filter(col("src") =!= col("dst")))
      .distinct().persist()
    // Materialize the edge table through the Dataset path BEFORE the
    // loop: the loop's localCheckpoint compiles its lineage via
    // queryExecution.toRdd, which is statically planned — no AQE — so
    // an unmaterialized pair pipeline would re-run with sort-merge
    // joins and no runtime broadcast/coalescing (measured 3× slower).
    // After this count the loops read only the cached edges.
    val edgeCount = edges.count()
    // the short-circuit only engages for integral id columns: the
    // union-find works on longs, and only an integral input type
    // survives the long roundtrip losslessly — any other id type
    // (string, decimal, ...) takes the distributed loop, which is
    // type-agnostic, instead of risking a silently-corrupting cast
    val idType = edges.schema("src").dataType
    val integralIds = idType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (edgeCount <= localEdgeThreshold && integralIds) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression keeps unions near-linear amortized
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .as[(Long, Long)].collect()
        .foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          // union-by-min: the surviving root is always the smaller id,
          // so every final root is its component's global min — the
          // exact label the distributed loop converges to
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      val labels = parent.keysIterator.map(n => (n, find(n))).toVector
      edges.unpersist()
      // cast back to the INPUT id type so the output schema does not
      // depend on which path the runtime edge count selected
      return (spark.createDataset(labels).toDF("node", "cluster")
        .select(col("node").cast(idType).as("node"),
          col("cluster").cast(idType).as("cluster")), 0, 0)
    }
    // the first propagation round is folded into initialization:
    // label = min(node, neighbors) — identical to one step from
    // label = node, one fewer distributed round
    var labels = edges.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("nl"))
      .select(col("node"), least(col("node"), col("nl")).as("label"))
      .localCheckpoint(false)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < oneHopRounds) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("label").as("dl")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(min(col("dl")).as("nl"))
      // lazy localCheckpoint: the convergence count below is the ONE
      // job that both materializes this round and cuts its lineage
      val stepped = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("label"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("next"))
        .localCheckpoint(false)
      changed = stepped.filter(col("next") =!= col("label")).count()
      labels = stepped.select(col("node"), col("next").as("label"))
      i += 1
    }
    var starRounds = 0
    val out =
      if (changed == 0) labels
      else {
        // contract by current labels: every label value is a node of
        // the SAME component (labels only ever copy reachable ids),
        // so components of the contracted graph are the images of the
        // originals — and each contains its component's min id, whose
        // label is itself. Fully-converged components contract to
        // loops and drop out; the left join falls back to their label.
        val contracted = edges
          .join(labels.select(col("node").as("src"), col("label").as("lsrc")),
            Seq("src"))
          .join(labels.select(col("node").as("dst"), col("label").as("ldst")),
            Seq("dst"))
          .select(col("lsrc").as("src"), col("ldst").as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
        val (star, rounds) = starContract(contracted, maxIter)
        starRounds = rounds
        labels
          .join(star.select(col("node").as("label"), col("cluster")),
            Seq("label"), "left")
          .select(col("node"),
            coalesce(col("cluster"), col("label")).as("label"))
      }
    // `out` flows only through checkpointed frames (labels, and the
    // star loop's materialized adjacency) — no lineage to `edges`
    edges.unpersist()
    (out.select(col("node"), col("label").as("cluster")), i, starRounds)
  }
}

/** SimHash near-duplicate pairing via Hamming-distance LSH: split the
  * 64-bit fingerprint into `chunks` equal chunks; by pigeonhole, any
  * pair within Hamming distance < chunks shares at least one exact
  * chunk, so bucketing on (chunk_idx, chunk_value) finds all such pairs
  * with one shuffle — no O(n²) comparison.
  */
object SimhashPairs {
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.{DataFrame}

  def pairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, chunks: Int = 4, saltSlices: Int = 1): DataFrame = {
    require(64 % chunks == 0, "chunks must divide 64")
    val bits = 64 / chunks
    val sh = Dedup.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc"),
        Dedup.simhash(col(textCol)).as("simhash"))
    val chunked = sh.select(col("doc"), col("simhash"),
      explode(transform(sequence(lit(0), lit(chunks - 1)), c => struct(
        c.as("chunk_idx"),
        call_function("shiftright", col("simhash"), c * bits)
          .bitwiseAND(lit((1L << bits) - 1)).as("chunk_value")))).as("ch"))
      .select(col("doc"), col("simhash"),
        col("ch.chunk_idx").as("chunk_idx"), col("ch.chunk_value").as("chunk_value"))
    // hamming is cheap per-row bit math — cut BEFORE the distinct so
    // the dedup shuffle only carries surviving pairs (salting
    // semantics: Dedup.bucketSelfJoinPairs)
    Dedup.bucketSelfJoinPairs(chunked, Seq("chunk_idx", "chunk_value"), saltSlices)
      .withColumn("hamming", Dedup.hamming(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming").distinct()
  }

  /** SimHash-candidates → exact-Jaccard verification: near-dup pairs
    * whose candidates came from simhash chunk buckets and whose
    * DECISION (jaccard >= threshold) is exact and engine-agnostic —
    * the oracle-checkable form of the simhash family. `chunks = 8`
    * with the Hamming <= chunks-1 cut keeps exactly the
    * pigeonhole-complete candidate region (any pair within Hamming 7
    * shares an untouched chunk), a wide margin over the distance
    * near-identical documents actually reach — and the cheap
    * xor-popcount cut keeps the expensive shingle-array verification
    * off the ~n·(n/2^bits) random chunk collisions. */
  def verifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, chunks: Int = 8): DataFrame = {
    val sh = graft.engine.CacheRegistry.retain(
      Dedup.spread(docs.select(col(idCol), col(textCol)))
        .select(col(idCol).as("doc"),
          Dedup.shingles(col(textCol)).as("sh")))
    val cands = pairs(docs, idCol, textCol, maxHamming = chunks - 1, chunks = chunks)
      .select(col("doc_a"), col("doc_b"))
    graft.engine.Spread.spreadForExplosion(cands, col("doc_a"))
      .join(sh.select(col("doc").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .filter(Dedup.sizeRatioAtLeast(col("sh_a"), col("sh_b"), threshold))
      .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
