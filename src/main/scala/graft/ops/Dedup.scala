package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Document deduplication for web-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard. All stages are declarative
  * DataFrame plans: candidate generation is a shuffle on *bucket keys* (never
  * an all-pairs cross join), so cost scales with bucket occupancy, not n².
  *
  * Reference analogue: Tenzir's `deduplicate` operator is exact/keyed only
  * (`/root/reference/libtenzir/builtins/operators/deduplicate.cpp:107-205`);
  * the near-dup family is the web-scale extension the north star asks for.
  */
object Dedup {

  /** Unordered within-bucket candidate pairs after ONE shuffle.
    *
    * The classic inverted-index *self-join* (a ⋈ b on the bucket key)
    * evaluates the upstream pipeline twice — at web scale that doubles the
    * expensive signature compute (minhash/simhash/shingle expressions) and
    * pays two full exchanges. Instead: `groupBy(bucket) + collect_list`
    * (one exchange, map-side partial), then explode the i<j positional pairs
    * per bucket with codegen'd array HOFs. Bucket size is capped FIRST
    * (`maxBucket`), so the per-row pair array is bounded — the same
    * boilerplate-cluster guard the join path had, now also bounding memory.
    *
    * `payload` must contain the doc id and whatever the verifier needs;
    * output: keyCols ++ a `p: struct(a: payload, b: payload)` column, one row
    * per unordered pair (positional i<j — normalize by id downstream).
    */
  private def bucketPairs(df: DataFrame, keyCols: Seq[String], payload: Column,
      maxBucket: Option[Int]): DataFrame = {
    val grouped = df.groupBy(keyCols.map(col): _*).agg(collect_list(payload).as("docs"))
    val capped = maxBucket.fold(grouped)(m => grouped.filter(size(col("docs")) <= m))
    val pairs = flatten(transform(col("docs"), (x, i) =>
      transform(slice(col("docs"), i + lit(2), size(col("docs")) - i - 1),
        y => struct(x.as("a"), y.as("b")))))
    capped.select(keyCols.map(col) :+ explode(pairs).as("p"): _*)
  }

  /** Order a positional pair struct so `a.id <= b.id` (bucket list order is
    * nondeterministic; downstream dedup/grouping needs a canonical key).
    */
  private def orderPair(p: Column): Column =
    when(p.getField("a").getField("id") <= p.getField("b").getField("id"), p)
      .otherwise(struct(p.getField("b").as("a"), p.getField("a").as("b")))

  // ------------------------------------------------------------------ exact

  /** Exact dedup on a normalized-text fingerprint: keeps the row with the
    * smallest `idCol` per fingerprint group (deterministic survivor).
    * Map-side combine via min_by; one shuffle on the fingerprint.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = Text.fingerprintMd5(col(textCol))
    df.withColumn("fingerprint", fp)
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  // ---------------------------------------------------------------- minhash

  /** Modulus for the minhash permutation family: 2^31 - 1 (prime), so
    * `a*h1 + b*h2 + c` with 31-bit coefficients and 30-bit hash halves stays
    * under 2^63 — exact in both Spark longs and DuckDB BIGINTs (DuckDB errors
    * on 64-bit overflow rather than wrapping, so wrap-around mixing like
    * xxhash is not oracle-checkable; this family is).
    */
  val MinhashP = 2147483647L
  private val Mask30 = (1L << 30) - 1

  /** splitmix64 finalizer (public-domain PRNG) for deterministic coefficients. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-component permutation coefficients (a ∈ [1,p-1], b,c ∈ [0,p-1]),
    * derived from a fixed seed — embedded as literals both in the Spark plan
    * and in the generated DuckDB oracle SQL.
    */
  def minhashCoefs(k: Int, seed: Long = 0x9D5EED42L): IndexedSeq[(Long, Long, Long)] =
    (0 until k).map { i =>
      val a = java.lang.Math.floorMod(mix(seed + 3L * i), MinhashP - 1) + 1
      val b = java.lang.Math.floorMod(mix(seed + 3L * i + 1), MinhashP)
      val c = java.lang.Math.floorMod(mix(seed + 3L * i + 2), MinhashP)
      (a, b, c)
    }

  /** One minhash component over a materialized 60-bit-hash array: the
    * universal-hash permutation `(a*hi + b*lo + c) mod p` of each element's
    * two 30-bit halves, minimized over the set.
    */
  private def minhashComponent(hs: Column, a: Long, b: Long, c: Long): Column =
    array_min(transform(hs, h =>
      pmod(lit(a) * shiftrightunsigned(h, 30) + lit(b) * h.bitwiseAND(lit(Mask30)) + lit(c),
        lit(MinhashP))))

  /** MinHash signature from an already-materialized array of
    * [[graft.functions.Text.md5h60]] shingle hashes. Pure Column logic; one
    * md5 per shingle total (the k permutations are cheap integer mixes).
    *
    * `hs` MUST be a materialized column (a projected attribute), not an
    * inline hash expression: each of the k component branches walks `hs`, so
    * an inline expression would recompute the md5s k times per row.
    */
  def minhashSigFromHashes(hs: Column, k: Int): Column =
    array(minhashCoefs(k).map { case (a, b, c) => minhashComponent(hs, a, b, c) }: _*)

  /** md5h60 of every shingle — project this, then call
    * [[minhashSigFromHashes]] on the materialized column.
    */
  def shingleHashes(sh: Column): Column = transform(sh, s => Text.md5h60(s))

  /** MinHash signature straight from text — convenience for one-off/test use
    * ONLY: inlining the hash expression recomputes the md5s per component.
    * Hot paths must project [[graft.functions.Text.shingles]] then
    * [[shingleHashes]] and call [[minhashSigFromHashes]].
    */
  def minhashSignature(text: Column, k: Int, shingleN: Int = 3): Column =
    minhashSigFromHashes(shingleHashes(Text.shingles(text, shingleN)), k)

  /** Estimated Jaccard from two equal-length signatures: fraction of equal
    * components.
    */
  def estJaccard(sigA: Column, sigB: Column, k: Int): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b)).cast("double") / k.toDouble

  /** MinHash+LSH near-dup candidate pairs.
    *
    * Pipeline: signature → b bands of r rows → hash each band → explode to
    * (band, bandHash) bucket keys → self-join *within buckets only* → distinct
    * pairs → estimated Jaccard from signatures → threshold filter.
    *
    * Scale: the join key (band, bandHash) is high-cardinality, so the shuffle
    * is fine-grained; giant buckets (boilerplate cluster) are the one skew
    * risk — AQE skew-join splits them, and `maxBucket` hard-caps pathological
    * buckets (dropping a bucket of b identical boilerplate docs loses no
    * information a sane dedup needs — it keeps one pair via other bands).
    *
    * Output: (id_a, id_b, est_jaccard) with id_a < id_b.
    */
  /** (id, sig, band, bucket) banded signatures — shared by the candidate
    * join and the dropped-bucket report.
    */
  private def bandedSignatures(df: DataFrame, textCol: String, idCol: String,
      bands: Int, rows: Int, shingleN: Int): DataFrame = {
    val k = bands * rows
    // three projections: shingle once, md5 each shingle once, then the k
    // cheap integer permutations over the materialized hash array
    val withSig = df
      .select(col(idCol).as("id"), Text.shingles(col(textCol), shingleN).as("sh"))
      .select(col("id"), shingleHashes(col("sh")).as("hs"))
      .select(col("id"), minhashSigFromHashes(col("hs"), k).as("sig"))
    withSig.select(
      col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows))): _*)).as(Seq("band", "bucket")))
  }

  /** The buckets `minhashLsh` would DROP under `maxBucket` — (band, bucket,
    * cnt), so the cap is observable instead of silent: alert/log on
    * `minhashLshDroppedBuckets(...).count() > 0`, or inspect the offending
    * boilerplate clusters directly (the ids can be recovered by joining back
    * on (band, bucket)).
    */
  def minhashLshDroppedBuckets(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bands: Int = 16,
      rows: Int = 8,
      shingleN: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    bandedSignatures(df, textCol, idCol, bands, rows, shingleN)
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > maxBucket)

  def minhashLsh(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bands: Int = 16,
      rows: Int = 8,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 1000): DataFrame = {
    val k = bands * rows
    val banded = bandedSignatures(df, textCol, idCol, bands, rows, shingleN)
    // one shuffle on (band, bucket); the signature pipeline evaluates ONCE
    // (the former a ⋈ b self-join ran it twice and shuffled twice)
    bucketPairs(banded, Seq("band", "bucket"),
        struct(col("id"), col("sig")), Some(maxBucket))
      .select(orderPair(col("p")).as("q"))
      .select(col("q.a.id").as("id_a"), col("q.b.id").as("id_b"),
        col("q.a.sig").as("sig_a"), col("q.b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard", estJaccard(col("sig_a"), col("sig_b"), k))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  // ----------------------------------------------------------------- simhash

  /** SimHash width: 60 bits, matching the oracle-checkable
    * [[graft.functions.Text.md5h60]] token-hash family.
    */
  val SimhashBits = 60

  /** 60-bit SimHash from an already-materialized token-hash array column
    * ([[graft.functions.Text.tokenHashes]]): per-bit balance of token-hash
    * bits, sign → bit. 60 folds over the materialized long array — do NOT
    * inline the tokenization here (it would run 60× per row).
    */
  def simhashFromHashes(hashes: Column): Column = {
    val bits = (0 until SimhashBits).map { i =>
      val balance = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(balance > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** SimHash straight from text — convenience; hot paths should materialize
    * [[graft.functions.Text.tokenHashes]] first.
    */
  def simhash(text: Column): Column =
    simhashFromHashes(Text.tokenHashes(text))

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** SimHash near-dup candidates: block on q non-overlapping bit segments
    * (pigeonhole: any pair within `maxHamming < q` differs in at most q-1
    * segments, so at least one segment matches → zero false negatives),
    * verify by exact Hamming distance. One shuffle on segment keys.
    */
  def simhashDup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      segments: Int = 4): DataFrame = {
    val segBits = SimhashBits / segments
    val withSig = df
      .select(col(idCol).as("id"), Text.tokenHashes(col(textCol)).as("th"))
      .select(col("id"), simhashFromHashes(col("th")).as("sim"))
    val seg = withSig.select(
      col("id"), col("sim"),
      posexplode(array((0 until segments).map(s =>
        shiftrightunsigned(col("sim"), s * segBits)
          .bitwiseAND((1L << segBits) - 1L)): _*)).as(Seq("seg", "key")))
    bucketPairs(seg, Seq("seg", "key"), struct(col("id"), col("sim")), None)
      .select(orderPair(col("p")).as("q"))
      .select(col("q.a.id").as("id_a"), col("q.b.id").as("id_b"),
        hamming64(col("q.a.sim"), col("q.b.sim")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  // ---------------------------------------------------------- exact jaccard

  /** Exact word-n-gram Jaccard over all pairs sharing ≥1 shingle, via an
    * inverted-index self-join (shuffle on shingle, then on the pair key —
    * never a cross join). |A∪B| = |A|+|B|−|A∩B| avoids materializing unions.
    *
    * Output: (id_a, id_b, jaccard) for pairs with jaccard ≥ threshold.
    */
  def ngramJaccard(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Option[Long] = None): DataFrame = {
    val sets = df.select(col(idCol).as("id"), Text.shingles(col(textCol), shingleN).as("sh"))
      .withColumn("setsize", size(col("sh")))
    val inv = sets.select(col("id"), col("setsize"), explode(col("sh")).as("shingle"))
    // shingle document-frequency cap: one boilerplate shingle shared by k
    // docs creates a k² bucket — at web scale that is THE skew risk. Hot
    // shingles are dropped whole (pairs whose only overlap is boilerplate
    // stop matching; intersection counts become a lower bound for pairs that
    // shared capped shingles). The cap is a size filter on the grouped
    // bucket — no extra aggregation or anti-join pass.
    bucketPairs(inv, Seq("shingle"),
        struct(col("id"), col("setsize")), maxDocFreq.map(_.toInt))
      .select(orderPair(col("p")).as("q"))
      .select(col("q.a.id").as("id_a"), col("q.b.id").as("id_b"),
        col("q.a.setsize").as("sa0"), col("q.b.setsize").as("sb0"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"), first(col("sa0")).as("sa"), first(col("sb0")).as("sb"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sa") + col("sb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------------ exact substring

  /** Exact-substring near-dup at k-token-window granularity
    * (MassiveText/RefinedWeb-style: two docs sharing ANY verbatim k-token
    * span are near-dups). The literature's suffix-array construction is a
    * single-machine design; at web scale the same predicate is a bounded
    * inverted index — hash every k-token window (distinct per doc), ONE
    * shuffle on the window hash, emit within-bucket pairs. `maxDocFreq`
    * drops boilerplate windows shared by more than that many docs (the k²
    * skew guard), same contract as [[ngramJaccard]]'s shingle cap.
    *
    * Output: (id_a, id_b, shared_windows) — distinct doc pairs plus how many
    * distinct windows they share. Docs shorter than k tokens don't
    * participate (no window exists).
    */
  def windowDup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 8,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val wins = array_distinct(Text.windowsAll(col(textCol), k))
    val inv = df.select(col(idCol).as("id"),
      explode(transform(wins, w => Text.md5h60(w))).as("wh"))
    bucketPairs(inv, Seq("wh"), struct(col("id")), maxDocFreq)
      .select(orderPair(col("p")).as("q"))
      .select(col("q.a.id").as("id_a"), col("q.b.id").as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_windows"))
  }

  // ------------------------------------------------------- embedding cosine

  /** Embedding near-dup: pairs with cosine ≥ threshold, candidates generated
    * by random-hyperplane LSH over the embedding (sign-bit signature bands),
    * verified by exact cosine. Same bucket-join shape as minhashLsh — scales
    * by bucket occupancy.
    */
  def embeddingDup(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      planes: Int = 16,
      bands: Int = 4,
      seed: Long = 42L): DataFrame = {
    val sig = Similarity.hyperplaneSig(col(vecCol), planes, seed)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"), sig.as("sig"))
    val perBand = planes / bands
    val banded = base.select(
      col("id"), col("v"),
      posexplode(array((0 until bands).map(bd =>
        shiftrightunsigned(col("sig"), bd * perBand).bitwiseAND((1L << perBand) - 1L)): _*))
        .as(Seq("band", "bucket")))
    bucketPairs(banded, Seq("band", "bucket"), struct(col("id"), col("v")), None)
      .select(orderPair(col("p")).as("q"))
      .select(col("q.a.id").as("id_a"), col("q.b.id").as("id_b"),
        col("q.a.v").as("v_a"), col("q.b.v").as("v_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", Text.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Line-level dedup (CCNet-style): drop lines whose corpus-wide frequency
    * exceeds `maxFreq` — the standard boilerplate-removal pass (nav menus,
    * cookie banners, footers repeat across a domain; prose doesn't).
    *
    * Output: one row per document with `n_lines`, `n_dropped`, and
    * `clean_text` (surviving lines rejoined in original order).
    *
    * Plan shape at 100 TB: the frequency side shuffles only the 60-bit line
    * hash (never the line text); the hash⋈lines join is shuffle-on-hash with
    * AQE skew-split handling the pathological blank/boilerplate keys — a
    * `Window.partitionBy(line)` would pin each hot line to ONE task, which
    * is exactly the skew this avoids. Map-side partial aggs on both the
    * frequency count and the final per-doc regroup.
    */
  def dedupLines(df: DataFrame, textCol: String, idCol: String,
      maxFreq: Long = 1): DataFrame = {
    require(maxFreq >= 1, "maxFreq must be >= 1")
    // coalesce: a null-text doc must still emit its row (n_lines counts the
    // one empty line; split(NULL) would posexplode to zero rows and the doc
    // would silently vanish from the cleaned corpus)
    val lines = df
      .select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n", -1)).as(Seq("__i", "__ln")))
      .withColumn("__h", Text.md5h60(col("__ln")))
    val freq = lines.groupBy(col("__h")).agg(count(lit(1)).as("__freq"))
    lines.join(freq, Seq("__h"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__freq") > maxFreq, 1L).otherwise(0L)).as("n_dropped"),
        // collect_list drops the nulls from the unmatched `when` branch;
        // array_sort on (idx, line) structs restores original line order
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__freq") <= maxFreq, struct(col("__i"), col("__ln"))))),
            x => x("__ln")),
          "\n").as("clean_text"))
  }

  /** Duplicated-substring SPAN extraction (the per-document half of exact
    * substring dedup, Lee et al. 2022 "Deduplicating Training Data Makes
    * Language Models Better": don't drop whole documents — cut the repeated
    * passages out of them). A position is duplicated iff the k-token window
    * starting there occurs ≥ `minFreq` times corpus-wide; maximal runs of
    * duplicated positions merge into spans (so a repeated 40-token passage
    * under k=5 reports as ONE span of 36 windows, not 36 rows).
    *
    * The paper builds a single-machine suffix array; the distributed
    * equivalent of its "repeated substring of length ≥ k" predicate is the
    * hashed-window inverted index ([[windowDup]]'s candidate structure):
    * window multiplicity is ONE count shuffle on the 60-bit window hash
    * (map-side combine; the window text itself never shuffles), the
    * dup-position join is shuffle-on-hash with AQE skew-split on boilerplate
    * windows, and span merging is a per-document window function (parallel in
    * documents — the gaps-and-islands step is local to each doc's positions).
    *
    * Output: (id, span_start, span_end, n_windows) — token positions on the
    * normalized token sequence, end exclusive, `span_end - span_start ≥ k`.
    */
  def duplicatedSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
      minFreq: Long = 2): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(minFreq >= 2, "minFreq must be >= 2 (1 would mark every position)")
    val wins = df.select(col(idCol),
      posexplode(Text.windowsAll(col(textCol), k)).as(Seq("__pos", "__g")))
      .select(col(idCol), col("__pos"), Text.md5h60(col("__g")).as("__wh"))
    val freq = wins.groupBy(col("__wh")).agg(count(lit(1)).as("__f"))
      .filter(col("__f") >= minFreq)
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    wins.join(freq, Seq("__wh"))
      .withColumn("__isl", col("__pos") - row_number().over(w))
      .groupBy(col(idCol), col("__isl"))
      .agg(
        min(col("__pos")).cast("long").as("span_start"),
        (max(col("__pos")) + k).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("__isl")
  }

  /** Exact substring dedup, removal half: rewrite each document's normalized
    * token sequence with every [[duplicatedSpans]] span cut out. Output is
    * one row per input document: `n_tokens`, `n_removed`, and `clean_text`
    * (surviving tokens rejoined in order; docs with no duplicated span pass
    * through with `n_removed = 0`).
    *
    * Plan shape: covered token positions are the spans re-exploded
    * (`sequence(start, end-1)` — O(duplicated tokens), not O(corpus)), the
    * kept-token side is one posexplode of the token array, and the final
    * regroup is a per-doc sort-free `array_sort(collect_list(struct))` — the
    * same shape [[dedupLines]] uses, skew-safe under AQE.
    */
  def removeDuplicatedSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
      minFreq: Long = 2): DataFrame = {
    val covered = duplicatedSpans(df, textCol, idCol, k, minFreq)
      .select(col(idCol),
        explode(sequence(col("span_start"), col("span_end") - 1)).as("__tp"))
      .distinct()
    val toks = df.select(col(idCol),
      posexplode(coalesce(Text.tokens(Text.normalize(col(textCol))),
        array().cast("array<string>"))).as(Seq("__tp", "__tok")))
      .withColumn("__tp", col("__tp").cast("long"))
    val kept = toks.join(covered, Seq(idCol, "__tp"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("__kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("__tp"), col("__tok")))),
            x => x("__tok")),
          " ").as("clean_text"))
    df.select(col(idCol),
      size(coalesce(Text.tokens(Text.normalize(col(textCol))),
        array().cast("array<string>"))).cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Incremental dedup: flag INCOMING documents that exact- or near-duplicate
    * a document already in the lake — the dedup pass a CDC ingest pipeline
    * runs per micro-batch (new crawl vs everything ingested so far), where
    * re-running old×old comparisons every batch would be quadratic over time.
    * Only new×old pairs are generated: the incoming side is exploded and
    * joined against the existing side's banded minhash signatures, never
    * against itself.
    *
    * Output: one row per incoming document: `is_exact` (normalized
    * fingerprint already present), `near_id` (smallest existing doc id whose
    * estimated Jaccard ≥ `threshold`, null if none), `est_jaccard` for that
    * match.
    *
    * Plan shape at 100 TB: the existing side's signatures are computed once
    * per batch here, but a production loop materializes them incrementally
    * (signatures are per-row and append-only — exactly the lake's MOR
    * columns); both joins shuffle on bounded keys (fingerprint, band
    * buckets), map-side combine on the final per-doc min.
    */
  def dedupIncremental(
      incoming: DataFrame,
      existing: DataFrame,
      textCol: String,
      idCol: String,
      bands: Int = 16,
      rows: Int = 2,
      threshold: Double = 0.5,
      shingleN: Int = 3): DataFrame = {
    val k = bands * rows
    def banded(d: DataFrame, pfx: String): DataFrame =
      bandedSignatures(d, textCol, idCol, bands, rows, shingleN)
        .select(col("id").as(s"${pfx}_id"), col("sig").as(s"${pfx}_sig"),
          col("band").as(s"${pfx}_band"), col("bucket").as(s"${pfx}_bkt"))
    val fpOld = existing.select(
      Text.fingerprintMd5(col(textCol)).as("__fp")).distinct()
    val exact = incoming.select(col(idCol),
      Text.fingerprintMd5(col(textCol)).as("__fp"))
      .join(fpOld.withColumn("__hit", lit(true)), Seq("__fp"), "left")
      .select(col(idCol), coalesce(col("__hit"), lit(false)).as("is_exact"))
    val near = banded(incoming, "n")
      .join(banded(existing, "o"),
        col("n_band") === col("o_band") && col("n_bkt") === col("o_bkt"))
      .select(col("n_id"), col("o_id"),
        estJaccard(col("n_sig"), col("o_sig"), k).as("est"))
      .dropDuplicates("n_id", "o_id")
      .filter(col("est") >= threshold)
      .groupBy(col("n_id"))
      .agg(min_by(struct(col("o_id"), col("est")), col("o_id")).as("m"))
      .select(col("n_id").as(idCol), col("m.o_id").as("near_id"),
        col("m.est").as("est_jaccard"))
    exact.join(near, Seq(idCol), "left")
  }

  /** Benchmark decontamination: flag training documents sharing word-n-gram
    * shingles with an evaluation set (the standard pre-training hygiene step;
    * the reference's pipeline stops at dedup — this extends the same shingle
    * machinery to cross-corpus overlap).
    *
    * Returns one row per document with ≥1 shared shingle: `n_hits` (distinct
    * shared shingles) and `contaminated` (`n_hits >= minHits`). Plan shape:
    * the benchmark shingle set is tiny by construction (eval sets are
    * thousands of docs, not billions) → `broadcast` join against the exploded
    * corpus shingles, then one map-side-combinable count per doc — the corpus
    * is scanned once and never shuffled on the benchmark axis.
    */
  def decontaminate(docs: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, n: Int = 3, minHits: Int = 1): DataFrame = {
    require(minHits >= 1, "minHits must be >= 1")
    val benchSh = bench
      .select(explode(Text.shingles(col(textCol), n)).as("shingle")).distinct()
    docs
      .select(col(idCol), explode(Text.shingles(col(textCol), n)).as("shingle"))
      .join(broadcast(benchSh), Seq("shingle"))
      .groupBy(col(idCol))
      // shingles() is distinct per doc, so this count IS the distinct overlap
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") >= minHits)
  }
}
