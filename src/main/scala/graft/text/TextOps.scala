package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table. Everything is built from codegen'd
  * `functions._` expressions (no UDFs in these paths) so whole-stage
  * codegen spans the scan → project → aggregate pipeline, and the
  * regex/normalization rules are deliberately simple enough to be
  * re-stated in ANSI SQL for the oracle.
  */
object TextOps {

  /** Lowercased alphanumeric tokens. Shared by every operator so the
    * tokenization is consistent engine-wide. */
  val TokenPattern = "[a-z0-9]+"
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokenPattern), lit(0))

  /** Token COUNT via the native [[graft.functions.TokenRunCount]]
    * byte-scan expression — equals size(tokens(text)) exactly (spec-
    * pinned) without materializing a token array per row. Counting is
    * the common case (quality gates, corpus rollups, length stats);
    * the array stays only where the tokens themselves are consumed. */
  def tokenCount(text: Column): Column =
    graft.functions.TokenRunCount(lower(text))

  /** Word n-gram shingles of a token array (space-joined). */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Quality signals: length, token count, punctuation / stopword /
    * uppercase ratios. Ratios are double divisions of exact integer
    * counts — deterministic under any partitioning. */
  private val StopwordRe = "\\b(the|a|an|and|or|of|to|in|is|it|for|on|with|as|at|by)\\b"
  def quality(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("len"),
      tokenCount(col("text")).as("n_tokens"),
      size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long").as("n_punct"),
      size(regexp_extract_all(lower(col("text")), lit(StopwordRe), lit(0))).cast("long").as("n_stop"),
      size(regexp_extract_all(col("text"), lit("[A-Z]"), lit(0))).cast("long").as("n_upper"))
      .withColumn("punct_ratio", col("n_punct").cast("double") / col("len"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1)))
      .withColumn("upper_ratio", col("n_upper").cast("double") / col("len"))

  /** BPE-ish pre-tokenizer pattern (GPT-2 style, ASCII-simplified):
    * letter runs, single digits, punctuation runs. Counts approximate
    * LLM token counts far better than whitespace splitting. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).cast("long").as("n_bpe_tokens"),
      size(array_distinct(tokens(col("text")))).cast("long").as("n_distinct_tokens"))

  /** Tokenizer FERTILITY per source — the compute-planning numbers a
    * training run reads off its tokenizer choice (fertility = subword
    * tokens per whitespace word; bytes per subword token): a corpus
    * whose fertility creeps up (morphology-rich or noisy sources)
    * costs proportionally more training FLOPs for the same text. One
    * map-side counting pass (native byte-scan regex counts), one tiny
    * per-source aggregation of exact LONG sums; the ratios stay raw
    * IEEE divisions of exact counts (§4). */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long").as("ws"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).cast("long").as("bpe"),
        col("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("n_ws_tokens"),
        sum(col("bpe")).as("n_bpe_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("source"), col("n_docs"), col("n_ws_tokens"), col("n_bpe_tokens"),
        col("n_chars"),
        (col("n_bpe_tokens").cast("double") / col("n_ws_tokens").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
          .as("chars_per_token"))

  /** n-gram-marker language ID: count stopword hits per candidate
    * language, argmax with (score desc, lang asc) total order;
    * 'unknown' when nothing matches. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|that|it|was|for)\\b",
    "es" -> "\\b(el|la|de|que|los|las|una|por|con|del)\\b",
    "de" -> "\\b(der|die|und|das|ist|nicht|ein|mit|sich|auf)\\b",
    "fr" -> "\\b(le|la|les|des|est|une|dans|pour|que|qui)\\b")

  /** The [[langId]] argmax as a bare column over `text` — shared by
    * langId (per-doc output) and [[langConfusion]] (matrix grain), so
    * both stay ONE map-side projection with zero joins. */
  private def langBest: Column = {
    // greatest(struct(score, tiebreak, lang)) — the tiebreak field
    // ranks languages in REVERSE alphabetical order so the struct max
    // realizes (score DESC, lang ASC), the same total order a window
    // argmax would use.
    val langsAsc = LangMarkers.map(_._1).sorted
    val candidates = LangMarkers.map { case (lang, re) =>
      struct(
        size(regexp_extract_all(lower(col("text")), lit(re), lit(0))).cast("long").as("score"),
        lit(langsAsc.length - 1 - langsAsc.indexOf(lang)).as("tb"),
        lit(lang).as("lang"))
    }
    greatest(candidates: _*)
  }

  def langId(docs: DataFrame): DataFrame = {
    // ONE projection scores every language and argmaxes — map-side,
    // zero shuffles, one corpus pass (v.s. a per-language unionAll
    // scan + row_number window = 4 passes and a shuffle+sort).
    docs.select(col("doc_id"), langBest.as("best"))
      .select(
        col("doc_id"),
        when(col("best.score") > 0, col("best.lang")).otherwise(lit("unknown")).as("pred_lang"),
        col("best.score").as("score"))
  }

  /** Classifier EVALUATION for [[langId]]: the confusion matrix of
    * predicted vs ground-truth language labels, with each cell's
    * share of its true-language row count — the accuracy/confusion
    * report a pipeline reads before trusting the heuristic to route a
    * corpus. One corpus pass (the langId projection + one hash
    * aggregation); the share window runs over the ALREADY-AGGREGATED
    * matrix — at most |langs|×(|langs|+1) rows whatever the corpus
    * size, so the single-partition window is free by construction. */
  def langConfusion(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = docs
      .select(col("lang"), langBest.as("best"))
      .select(col("lang"),
        when(col("best.score") > 0, col("best.lang"))
          .otherwise(lit("unknown")).as("pred_lang"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang")
    cells.withColumn("frac",
      round(col("n") / sum(col("n")).over(w), 6))
  }

  /** VOCABULARY-GROWTH curve (Heaps'-law profile): cumulative docs,
    * token instances, distinct tokens, and type-token ratio at each
    * id-ordered corpus prefix decile — the dataset-size planning
    * evidence (is vocabulary still growing, or has the corpus
    * saturated?) and a drift check between corpus versions. NO global
    * sort or rank at any size: the bucket is a map-side function of
    * doc_id against the broadcast max-id scalar (prefix = ingestion-id
    * range), first-seen is one min-aggregation per distinct token, and
    * every cumulative window runs over the ALREADY-AGGREGATED ≤
    * `buckets` rows. */
  def heapsCurve(docs: DataFrame, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.agg((max(col("doc_id")) + 1).as("_n"))
    // integer division, not double: at 1e15-scale ids the double
    // quotient's 53-bit mantissa could misbucket a boundary id
    val bucketOf = (c: String) => expr(s"$c * $buckets div _n")
    val perDoc = docs.crossJoin(broadcast(n))
      .select(bucketOf("doc_id").as("b"), tokenCount(col("text")).as("nt"))
      .groupBy("b")
      .agg(count(lit(1)).as("ndocs"), sum(col("nt")).as("ntok"))
    val firstSeen = unigramCounts(docs)
      .select(col("doc_id"), col("term").as("tok"))
      .groupBy("tok").agg(min(col("doc_id")).as("fd"))
      .crossJoin(broadcast(n))
      .groupBy(bucketOf("fd").as("b"))
      .agg(count(lit(1)).as("nd"))
    val w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    perDoc.join(firstSeen, Seq("b"), "left")
      .select(col("b").as("bucket"),
        sum(col("ndocs")).over(w).as("n_docs"),
        sum(col("ntok")).over(w).as("n_tokens"),
        sum(coalesce(col("nd"), lit(0L))).over(w).as("n_distinct"))
      .withColumn("ttr",
        round(col("n_distinct").cast("double") / col("n_tokens"), 6))
  }

  /** PII scrubbing: redact emails and long digit runs (id-like
    * numbers) with typed placeholders, counting each. Pure
    * regexp_replace — codegen'd, streams through the scan, and the
    * patterns are restateable in any engine's regex dialect. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IdNumRe = "[0-9]{6,}"
  def redact(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(IdNumRe), lit(0))).cast("long").as("n_idnums"),
      regexp_replace(regexp_replace(col("text"), EmailRe, "[EMAIL]"), IdNumRe, "[NUM]")
        .as("clean_text"))

  /** Repetition signal (Gopher/MassiveText-style quality filter): the
    * fraction of a doc's word 3-grams taken by its single most
    * repeated 3-gram. Raw (non-distinct) shingles on purpose — the
    * repetition IS the signal. Two hash-aggregations, both map-side
    * partial; ratio is an exact integer division in double. */
  def repetition(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), explode(wordShingles(tokens(col("text")), n)).as("sh"))
      // first-level group key is xxhash64(shingle), not the STRING:
      // this level sees one row per raw shingle occurrence (the
      // hottest shuffle in the operator), and a LONG key keeps both
      // the hash-agg probe and the exchange one word wide. A 64-bit
      // collision would merge two distinct shingles' counts within
      // one doc — negligible odds, never surfaced (only the counts
      // leave this level), so the string-keyed oracle matches exactly.
      .groupBy(col("doc_id"), xxhash64(col("sh")).as("hsh"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_shingles"), max(col("c")).as("max_rep"))
      .withColumn("rep_ratio", col("max_rep").cast("double") / col("n_shingles"))

  /** Corpus-internal novelty: the fraction of a doc's DISTINCT word
    * 8-grams that appear in no other document (corpus df = 1) — the
    * memorization-risk / boilerplate dial a training-data pipeline
    * reads before sampling: novelty ≈ 1 is original text, ≈ 0 is
    * templated or near-duplicated content whose grams the model will
    * see many times. The n-gram complement of [[commonness]] (token
    * df) and the corpus-internal complement of
    * [[graft.text.Dedup.contamination]] (df vs an external benchmark).
    *
    * Plan: per-doc distinct grams map-side (array_distinct before the
    * explode), ONE xxhash64-LONG-keyed df aggregation over the corpus
    * gram set, join back on the LONG key, one per-doc aggregation —
    * the commonness plan shape at 8-gram grain. Docs under n tokens
    * have no grams and emit no row (same rule as fingerprint). */
  def novelty(docs: DataFrame, n: Int = 8): DataFrame = {
    // ONE shingle pass and NO pair-scale join (r13; VERDICT r12 #6 —
    // §2.4): the old shape embedded the tokenize+shingle subtree twice
    // (the df aggregation AND the join probe side) and sort-merge-
    // joined two corpus-scale frames on h. But the per-doc gram count
    // never needed df, and a gram with df = 1 belongs to exactly ONE
    // doc — min(doc_id) inside the same hash aggregation recovers that
    // owner — so both aggregates collapse to doc-sized frames before
    // anything joins. The persist is unpaired (lazy consumers; the
    // dedup-family idiom, Bench clears per family).
    val sh = docs
      .select(col("doc_id"), explode(array_distinct(
        wordShingles(tokens(col("text")), n))).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
      .persist()
    val grams = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val uniq = sh.groupBy(col("h"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc_id"))
      .filter(col("df") === 1L)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_unique"))
    grams.join(uniq, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"))
      .withColumn("novelty", col("n_unique").cast("double") / col("n_grams"))
  }

  /** Mean corpus document-frequency of a doc's distinct tokens — a
    * "commonness" quality signal (rare-vocabulary docs score low, the
    * inverse of boilerplate). Per-doc distinct happens map-side
    * (array_distinct before explode); the doc↔df join runs on
    * xxhash64 LONG keys, the engine-wide discipline for string-keyed
    * shuffles; sums are exact integers, the mean one double division.
    */
  def commonness(docs: DataFrame): DataFrame = {
    val dt = docs
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("term"))
      .select(col("doc_id"), xxhash64(col("term")).as("h"))
    val df_ = dt.groupBy(col("h")).agg(count(lit(1)).as("df"))
    dt.join(df_, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct_terms"), sum(col("df")).as("sum_df"))
      .withColumn("mean_df", col("sum_df").cast("double") / col("n_distinct_terms"))
  }

  /** CCNet-style language-model quality score (Wenzek et al.,
    * LREC'20, filter corpora by LM perplexity; the corpus-trained
    * UNIGRAM model is its deterministic, oracle-restatable analogue):
    * mean log-probability of a doc's token instances under the corpus
    * unigram distribution. Repetitive/boilerplate docs score high
    * (common tokens), rare-vocabulary gibberish scores low — the
    * inverse ranking is the CCNet "keep the head/middle" gate.
    *
    * Plan shape at 100 TB: one token explode (xxhash64 LONG keys —
    * the engine-wide string-shuffle discipline), a partial-aggregated
    * global tf, the ONE-ROW corpus total broadcast back, and the
    * per-instance logprob rounded to 6dp then summed EXACTLY in
    * DECIMAL (order-independent across partitionings; round-then-sum
    * is the engine-wide mean rule — libm log is the one genuinely
    * engine-specific step, which 6dp rounding absorbs). */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    val dt = unigramCounts(docs)
      .select(col("doc_id"), xxhash64(col("term")).as("h"), col("c"))
    val tf = dt.groupBy(col("h")).agg(sum(col("c")).as("tf"))
    val total = tf.agg(sum(col("tf")).cast("double").as("total"))
    dt.join(tf, "h")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("c"),
        round(log(col("tf").cast("double") / col("total")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("lp6"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tokens"),
        // c copies of the same exact decimal: c·lp6 — identical sum
        sum(col("c") * col("lp6")).cast("double").as("sum_logprob"))
      .withColumn("mean_logprob", col("sum_logprob") / col("n_tokens"))
  }

  /** Bigram language-model quality score — the context-aware sibling
    * of [[unigramLogprob]] (one order up the n-gram ladder toward the
    * KenLM models CCNet actually trains): mean over a doc's token
    * TRANSITIONS of ln(c(a,b) / c(a)), the MLE bigram probability
    * with the unigram-instance denominator. Catches locally-scrambled
    * text that unigram frequency cannot (same words, implausible
    * order scores low).
    *
    * Plan: bigrams are the n=2 word shingles (map-side zip — no
    * self-join), pre-aggregated ONCE to per-(doc, bigram) counts and
    * PERSISTED (hb functionally determines ha, so adding ha to the
    * grouping key costs no cardinality). The per-bigram score table
    * then computes at VOCABULARY level — corpus bigram count c2 via a
    * partial-aggregated groupBy(hb), unigram denominator joined at
    * vocab grain — and joins back to the doc-level frame ONCE on hb.
    * Three 100 TB properties drive this shape, replacing the r8
    * window: (1) no `PARTITION BY hb` window — bigram frequencies are
    * Zipf-distributed, so that window puts every ("of the", doc) row
    * in ONE task, a straggler no config fixes (AQE splits skewed
    * JOINS, not skewed window partitions), while here the hot key is
    * absorbed map-side by the partial aggregate and the one skewed
    * doc-level join-back is AQE-skew-splittable; (2) the tokenize+
    * explode pipeline runs ONCE — the persist is the reuse mechanism,
    * because Catalyst prunes different column sets into the two
    * consumer branches, making their subtrees non-identical so
    * exchange/stage reuse can never fire on them (measured: the r7
    * join-back paid a full second explode for exactly this reason);
    * (3) the score table is vocab-sized, so the optimizer/AQE is free
    * to broadcast it when it fits and shuffle when it doesn't — at no
    * recompute risk either way. Per-transition weighting multiplies
    * the 6dp-rounded logprob by the exact instance count in DECIMAL —
    * identical totals to per-instance summing. Docs with fewer than
    * two tokens have no transitions and emit no row.
    *
    * Cache ownership: the persist is deliberately UNPAIRED (the
    * minhashEstimatedPairs session-cache idiom) — unpersisting before
    * the caller's action would defeat the diamond, and the cache also
    * legitimately serves a caller's repeated runs. Long-lived sessions
    * reclaim it at their natural boundaries (Bench clears per family;
    * probes clear between shapes precisely because the cache
    * substitutes into canonically-identical subtrees). */
  def bigramLogprob(docs: DataFrame): DataFrame = {
    val bgc = docs
      .select(col("doc_id"), explode(wordShingles(tokens(col("text")), 2)).as("bg"))
      .select(col("doc_id"), xxhash64(col("bg")).as("hb"),
        xxhash64(substring_index(col("bg"), " ", 1)).as("ha"))
      .groupBy(col("doc_id"), col("hb"), col("ha"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    val uni = unigramCounts(docs)
      .groupBy(xxhash64(col("term")).as("ha")).agg(sum(col("c")).as("c1"))
    // vocab-grain score table: c2 per bigram (map-side partials absorb
    // the Zipf-hot key), ha recovered by max() (functional dependency)
    val lp = bgc.groupBy(col("hb"))
      .agg(sum(col("cnt")).as("c2"), max(col("ha")).as("ha"))
      .join(uni, "ha")
      .select(col("hb"),
        round(log(col("c2").cast("double") / col("c1")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("lp6"))
    bgc.join(lp, "hb")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_transitions"),
        sum(col("lp6") * col("cnt")).cast("double").as("sum_logprob"))
      .withColumn("mean_logprob", col("sum_logprob") / col("n_transitions"))
  }

  /** PMI COLLOCATIONS (Church & Hanks, CL'90 — the multi-word-
    * expression miner a tokenizer/vocab-building pass runs to decide
    * which word pairs deserve merged tokens): top-`k` bigrams by
    * pointwise mutual information ln(p(ab) / (p(a)·p(b))) with an
    * occurrence floor (`minCount` kills the unstable hapax tail that
    * otherwise owns the PMI top — the classic failure of the raw
    * statistic).
    *
    * Scale shape: bigram and unigram counts are hash-aggregations
    * whose map-side partials absorb the Zipf-hot keys (the bigram
    * de-skew lesson — no windows anywhere); the floor then shrinks
    * candidates to stable-vocabulary grain BEFORE the two unigram
    * joins; totals broadcast as single rows; the final top-k is a
    * TakeOrdered (per-partition heads, never a global sort). PMI
    * computes in one fixed IEEE shape and rounds to 6dp; ordering is
    * total via (pmi desc, term_a, term_b). */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5, k: Int = 50): DataFrame = {
    // deliberately UNPAIRED persists: both count tables feed multiple
    // lazy branches (scalar totals + the candidate joins — no
    // unpersist point); session-shared via CacheManager subtree match (the rfm/ppl_bucket idiom: a repeated call or a sibling query with the canonically-identical subtree REUSES this entry — no accumulation; Bench clears per family, long sessions clearCache at job boundaries)
    val bg = docs
      .select(explode(wordShingles(tokens(col("text")), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
      .persist()
    val uni = unigramCounts(docs)
      .select(col("term").as("w"), col("c").as("c0"))
      .groupBy(col("w")).agg(sum(col("c0")).as("c"))
      .persist()
    val t2 = broadcast(bg.agg(sum(col("c_ab")).cast("double").as("t2")))
    val t1 = broadcast(uni.agg(sum(col("c")).cast("double").as("t1")))
    bg.filter(col("c_ab") >= minCount)
      .select(substring_index(col("bg"), " ", 1).as("term_a"),
        substring_index(col("bg"), " ", -1).as("term_b"), col("c_ab"))
      .join(uni.select(col("w").as("term_a"), col("c").as("c_a")), "term_a")
      .join(uni.select(col("w").as("term_b"), col("c").as("c_b")), "term_b")
      .crossJoin(t2).crossJoin(t1)
      .select(col("term_a"), col("term_b"), col("c_ab"),
        round(log((col("c_ab").cast("double") / col("t2")) /
          ((col("c_a").cast("double") / col("t1"))
            * (col("c_b").cast("double") / col("t1")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("term_a").asc, col("term_b").asc)
      .limit(k)
  }

  /** Shannon entropy of each doc's TOKEN distribution — the
    * vocabulary-diversity quality signal (near-zero = one phrase
    * looping; the complement of [[repetition]], which only sees the
    * single worst n-gram). H = −Σ pᵢ ln pᵢ over the doc's token
    * frequencies, computed as −(Σ cᵢ · round(ln(cᵢ/L), 6)) / L so the
    * only engine-specific step (libm log) is rounded per TERM and the
    * weighted sum is an exact integer×decimal aggregation — order-
    * independent, one final double division. Plan: token explode,
    * LONG-keyed per-(doc, token) count, one per-doc aggregation. */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val counts = unigramCounts(docs)
      .select(col("doc_id"), col("term"), col("c").as("c0"))
      .groupBy(col("doc_id"), xxhash64(col("term")).as("h"))
      .agg(sum(col("c0")).as("c"))
    val totals = counts.groupBy(col("doc_id")).agg(sum(col("c")).as("n_tokens"))
    counts.join(totals, "doc_id")
      .select(col("doc_id"), col("n_tokens"),
        (col("c").cast(org.apache.spark.sql.types.DecimalType(18, 0)) *
          round(log(col("c").cast("double") / col("n_tokens")), 6)
            .cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("t"))
      .groupBy(col("doc_id"))
      .agg(
        max(col("n_tokens")).as("n_tokens"),
        sum(col("t")).cast("double").as("st"))
      .select(col("doc_id"), col("n_tokens"),
        (-col("st") / col("n_tokens")).as("entropy"))
  }

  /** α-tempered multi-source mixing weights — the sampling-mixture
    * computation a multi-source pretraining pipeline runs before any
    * doc is drawn (the Pile / GPT-3 recipe: weight ∝ size^α with
    * α < 1 upweights small high-quality sources relative to raw
    * proportion; α = 1 is proportional, α = 0 uniform). Per source:
    * doc count, exact token count (native byte-scan TokenRunCount —
    * no token array materialized), and weight = n_tokens^α
    * normalized. One corpus scan + one tiny aggregation; the libm
    * pow is rounded to 6dp then DECIMAL-summed (the engine-wide
    * round-then-sum rule), final division in double over the
    * broadcast scalar total. */
  def mixWeights(docs: DataFrame, alpha: Double = 0.7): DataFrame = {
    val s = docs
      .select(col("source"), tokenCount(col("text")).as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      .withColumn("w6", round(pow(col("n_tokens").cast("double"), lit(alpha)), 6)
        .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
    val tot = s.agg(sum(col("w6")).as("tw"))
    s.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("w6").cast("double") / col("tw").cast("double")).as("weight"))
  }

  /** Token-budget ALLOCATION across sources — the data-mixing step
    * after [[mixWeights]]: given a total training-token budget, each
    * source gets floor(budget · w_s) tokens capped at what it has,
    * and the shortfall from capped (small) sources redistributes
    * proportionally to the UNSATURATED sources' weights in one
    * deterministic round (the waterfilling first step — one round is
    * the documented contract, not an iterate-to-fixpoint). Reports
    * per source: available tokens, target weight, allocated tokens,
    * achieved share of budget, and fill ratio (allocated/available —
    * 1.0 means the source is exhausted and a bigger budget starts
    * repeating its data).
    *
    * Scale shape: ONE corpus pass (the tokenCount aggregation); all
    * later arithmetic runs on the per-source frame (bounded by source
    * cardinality) with single-row totals broadcast back. Determinism:
    * weights are 6dp-DECIMAL exact sums ([[mixWeights]]' recipe);
    * each allocation is floor(double-ratio × integer) in one fixed
    * association order, then pure integer arithmetic. */
  def budgetAlloc(docs: DataFrame, budget: Long, alpha: Double = 0.7): DataFrame = {
    require(budget > 0, "budget must be positive — a zero budget has no shares to report")
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val s = docs
      .select(col("source"), tokenCount(col("text")).as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("avail_tokens"))
      .withColumn("w6", round(pow(col("avail_tokens").cast("double"), lit(alpha)), 6).cast(dec))
    val tot = s.agg(sum(col("w6")).as("tw"))
    val a1 = s.crossJoin(broadcast(tot))
      .withColumn("weight", col("w6").cast("double") / col("tw").cast("double"))
      .withColumn("alloc1",
        least(col("avail_tokens"),
          floor(lit(budget.toDouble) * col("weight")).cast("long")))
    val left = a1.agg(
      (lit(budget) - sum(col("alloc1"))).as("leftover"),
      sum(when(col("avail_tokens") > col("alloc1"), col("w6"))).as("tw2"))
    a1.crossJoin(broadcast(left))
      .withColumn("alloc2",
        when(col("avail_tokens") > col("alloc1") && col("tw2").isNotNull,
          least(col("avail_tokens") - col("alloc1"),
            floor(col("leftover").cast("double") *
              (col("w6").cast("double") / col("tw2").cast("double"))).cast("long")))
          .otherwise(lit(0L)))
      .withColumn("alloc_tokens", col("alloc1") + col("alloc2"))
      .select(col("source"), col("n_docs"), col("avail_tokens"), col("weight"),
        col("alloc_tokens"),
        (col("alloc_tokens").cast("double") / budget.toDouble).as("share"),
        (col("alloc_tokens").cast("double") / col("avail_tokens")).as("fill_ratio"))
  }

  /** DSIR importance weights — data selection by importance
    * resampling (Xie et al., NeurIPS'23): score every raw document by
    * log p_target(x) − log p_raw(x) under two HASHED-unigram bag
    * models, where the target distribution is fit on the slice a
    * trainer wants more of (`targetPred`, e.g. a trusted source) and
    * the raw model on the whole corpus. High weight = looks like the
    * target; resampling by these weights is the standard corpus
    * up-selection step before training.
    *
    * The hashing IS the scale design (and the paper's): terms bucket
    * by [[graft.functions.Md5Prefix]] mod `buckets`, so both language
    * models are FIXED-SIZE arrays (`buckets` rows) whatever the
    * vocabulary — at 100 TB the model frame still broadcasts, and
    * collisions are the documented bias the bucket count controls.
    * One tokenize pass builds the per-(doc, bucket) counts, persisted
    * into the model/score diamond (the [[bigramLogprob]] idiom —
    * Catalyst prunes the two consumers into non-identical subtrees,
    * so only the cache can reuse the explode); both models fall out
    * of ONE aggregation over it (raw = sum, target = filtered sum);
    * scoring joins the ≤`buckets`-row log-ratio table back broadcast.
    * Laplace +1 smoothing keeps buckets the target never saw finite.
    *
    * Determinism: each bucket's log-ratio rounds to 6dp DECIMAL; a
    * doc's weight is the exact DECIMAL sum of count × ratio6; the
    * per-token ratio stays a RAW IEEE division (a 6dp-decimal ÷ int
    * ratio is an exact ≤7-decimal quantity, where Spark's
    * string-repr round() and DuckDB's binary round() disagree on the
    * tie — identical inputs make the unrounded double bit-identical
    * instead). Docs with zero tokens emit no row. */
  def dsirWeights(docs: DataFrame, targetPred: Column,
                  buckets: Int = 1024, roundTo: Int = 6): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val db = docs
      .select(col("doc_id"), targetPred.as("tgt"),
        explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("tgt"),
        pmod(graft.functions.Md5Prefix(col("term"), 8), lit(buckets.toLong)).as("b"))
      .agg(count(lit(1)).as("n"))
      // deliberately UNPAIRED persist: model build + score join both
      // read it (pruned subtrees) lazily — no unpersist point;
      // session-shared via CacheManager subtree match
      .persist()
    val m = db.groupBy(col("b")).agg(
      sum(col("n")).as("cr"),
      coalesce(sum(when(col("tgt"), col("n"))), lit(0L)).as("ct"))
    val tot = m.agg(sum(col("cr")).cast("double").as("crt"),
      sum(col("ct")).cast("double").as("ctt"))
    val lr = m.crossJoin(broadcast(tot)).select(col("b"),
      round(log((col("ct").cast("double") + 1.0) / (col("ctt") + buckets.toDouble))
          - log((col("cr").cast("double") + 1.0) / (col("crt") + buckets.toDouble)),
        roundTo).cast(dec).as("lr6"))
    db.join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(col("n").cast(dec) * col("lr6")).as("w6"))
      .select(col("doc_id"), col("n_tokens"),
        col("w6").cast("double").as("dsir_weight"),
        (col("w6").cast("double") / col("n_tokens").cast("double")).as("w_per_token"))
  }

  /** Corpus vocabulary top-k: global token counts, highest-count
    * first with a term tiebreak. orderBy+limit plans as
    * TakeOrderedAndProject — per-partition bounded top-k merged on
    * the driver, never a global sort — so the operator is one
    * aggregation + an O(k) merge at any corpus size. */
  /** Vocabulary COVERAGE curve — at each candidate vocab size k, the
    * share of all token INSTANCES the top-k terms cover: the read
    * that sizes a tokenizer's vocab (where the curve flattens, bigger
    * buys nothing) next to [[oovRate]]'s fixed-k per-doc view and
    * [[heapsCurve]]'s type growth. Scale: one instance pass to term
    * frequencies (hash agg), top-maxK via TakeOrdered (bounded heap,
    * never a global sort), and the cumulative window runs over maxK
    * rows whatever the corpus. Shares are raw IEEE ratios of exact
    * counts. */
  def vocabCoverage(docs: DataFrame,
                    ks: Seq[Int] = Seq(1, 2, 4, 8, 16, 32, 64)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxK = ks.max
    val freqs = unigramCounts(docs)
      .groupBy(col("term")).agg(sum(col("c")).as("n"))
    val total = freqs.agg(sum(col("n")).as("total"))
    val top = freqs.orderBy(col("n").desc, col("term").asc).limit(maxK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n").desc, col("term").asc)))
    val kFrame = docs.sparkSession.range(1)
      .select(explode(array(ks.map(lit): _*)).as("k"))
    top.crossJoin(broadcast(kFrame))
      .select(col("k"), col("rnk"), col("n"))
      .filter(col("rnk") <= col("k"))
      .groupBy(col("k"))
      .agg(sum(col("n")).as("covered_tokens"),
        max(col("rnk")).cast("long").as("n_terms"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("n_terms"), col("covered_tokens"),
        col("total").as("total_tokens"),
        (col("covered_tokens").cast("double") / col("total").cast("double"))
          .as("coverage"))
  }

  /** One corpus tokenize pass, pre-aggregated to (doc_id, source,
    * term) → count and shared across a session's unigram consumers
    * (r13; VERDICT r12 #3, §5/§2.4 "aggregate before you shuffle"):
    * the unigram gates (source_kl, drift_curve, entropy_rate's
    * unigram side, simpson, vocab_overlap, heaps_curve, oov_rate,
    * token_entropy, unigram/bigram logprob denominators, vocab_topk/
    * coverage) each re-ran the regex tokenize + explode over every
    * document. Persisting at the COUNT grain — not raw instances —
    * keeps the cache ~tokens/distinct-terms-per-doc times smaller and
    * map-side collapsible, so later gates read a small
    * InMemoryTableScan instead of re-tokenizing (CacheManager subtree
    * match — the gate paths all pass the same docs lineage). Every
    * consumer's aggregate is exact over counts (sum(c) ≡ count of
    * instances; decimal terms scale by c — integer×decimal, exact).
    * Carries whichever of doc_id / source exist so test fixtures
    * without one still work; the declared gates always pass both, so
    * their lineages canonicalize to ONE cache entry. Unpaired persist
    * (the vocabTopK idiom below — consumers read it lazily; Bench
    * clears per family). The BIGRAM passes (wordShingles) stay
    * separate: they need the un-exploded token array. */
  def unigramCounts(docs: DataFrame): DataFrame = {
    val keep = Seq("doc_id", "source").filter(docs.columns.contains)
    docs.select(keep.map(col) :+ explode(tokens(col("text"))).as("term"): _*)
      .groupBy((keep :+ "term").map(col): _*)
      .agg(count(lit(1)).as("c"))
      .persist()
  }

  def vocabTopK(docs: DataFrame, k: Int = 100): DataFrame =
    unigramCounts(docs)
      .groupBy(col("term"))
      .agg(sum(col("c")).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(k)
      // ≤ k rows, but the lineage is a full corpus tokenize pass —
      // persist so every vocab consumer in a session (oov/KL/drift/
      // coverage gates) shares ONE pass via CacheManager subtree match
      // (the dedup-family unpaired-persist idiom; r12 optimization)
      .persist()

  /** TOKENIZER VOCABULARY COVERAGE: per-doc out-of-vocabulary rate
    * against the corpus top-`vocabK` vocabulary — the coverage report
    * a pipeline reads when sizing a tokenizer vocab or checking a
    * pretrained one against a new corpus (a high-OOV tail is either a
    * domain shift or garbage). One instance pass; the k-term vocab is
    * a TakeOrderedAndProject result that broadcasts; docs with zero
    * tokens have no coverage to report and drop (as in the SQL
    * restatement). The bench corpus's ~30-term synthetic vocabulary
    * gates at k=16 so the OOV side is genuinely exercised. */
  def oovRate(docs: DataFrame, vocabK: Int = 16): DataFrame =
    unigramCounts(docs).select(col("doc_id"), col("term"), col("c"))
      .join(broadcast(vocabTopK(docs, vocabK).select(col("term"), lit(1).as("_inv"))),
        Seq("term"), "left")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("_inv").isNull, col("c")).otherwise(lit(0L))).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 6))

  /** SOURCE-vs-CORPUS KL DIVERGENCE (the domain-shift / source-quality
    * diagnostic a mixing pipeline reads next to `corpus_mix_weights`):
    * per source, KL(P_source ‖ Q_corpus) over the event space of the
    * corpus top-`vocabK` vocabulary plus ONE out-of-vocabulary bucket
    * — the bucketing makes both distributions complete and the corpus
    * side everywhere-positive, so the divergence is always finite. A
    * high-KL source either writes a different dialect or is garbage;
    * either way it is the source to inspect before trusting the mix.
    *
    * Scale shape: ONE token-instance pass tagged against the
    * broadcast vocab collapses straight to (source, bucket) counts by
    * a map-side partial aggregate; every later frame is sources ×
    * (vocabK+1) rows — corpus-size-free. Determinism: each of the
    * ≤ vocabK+1 per-source terms p·ln(p/q) computes in fixed IEEE
    * order (cast-divide, divide, ln, multiply), rounds to 6dp DECIMAL
    * and sums exactly — order-independent. Output (source, n_tokens,
    * kl). */
  def sourceKl(docs: DataFrame, vocabK: Int = 16): DataFrame =
    klAgainstCorpus(
      unigramCounts(docs).select(col("source").as("k"), col("term"), col("c")),
      docs, vocabK)
      .withColumnRenamed("k", "source")

  /** SIMPSON diversity per source — the collision-probability view of
    * lexical diversity (the Gini/Herfindahl family): D = Σ n_t(n_t−1)
    * / (N(N−1)) is the chance two tokens drawn without replacement
    * are the SAME type, and 1/D is the "effective vocabulary" — how
    * many equally-common types would produce that collision rate. The
    * corpus-mix complement to [[sourceKl]] (divergence says a source
    * DIFFERS from the pool; Simpson says whether it is internally
    * repetitive — templated/boilerplate sources collapse to a small
    * effective vocabulary long before a KL check notices). EXACT
    * integer arithmetic end to end: per-(source, term) LONG counts,
    * Σ n(n−1) and N(N−1) as DECIMAL(38,0) sums, ONE double division
    * each for D and 1/D (identical operands on any engine — §4, no
    * rounding needed). Two hash-aggregations, both map-side partial. */
  def sourceSimpson(docs: DataFrame): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    unigramCounts(docs)
      .select(col("source"), col("term"), col("c").as("c0"))
      .groupBy(col("source"), col("term"))
      .agg(sum(col("c0")).as("n"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_types"),
        sum(col("n")).cast("long").as("n_tokens"),
        sum((col("n") * (col("n") - 1)).cast(d38)).cast("double").as("coll"))
      .select(col("source"), col("n_types"), col("n_tokens"),
        (col("coll") / (col("n_tokens").cast("double") * (col("n_tokens") - 1)
          .cast("double"))).as("simpson"),
        ((col("n_tokens").cast("double") * (col("n_tokens") - 1).cast("double"))
          / col("coll")).as("effective_vocab"))
  }

  /** Corpus DRIFT curve — the TIME-dimension sibling of [[sourceKl]]
    * (the report a continuously-fed corpus reads to see its token
    * distribution walking away from the pool it started from): docs
    * bucket into id-ordered deciles (ingestion order — the
    * [[heapsCurve]] convention) and each decile's KL(P_decile ‖
    * Q_corpus) computes over the same top-`vocabK`+OOV event space. A
    * rising tail = recent data diverging (new domain, crawl rot, a
    * source gone bad); flat = stationary mix. Same one-tagged-pass /
    * (deciles × 17)-row scale shape as the source variant. */
  def driftKl(docs: DataFrame, buckets: Int = 10, vocabK: Int = 16): DataFrame = {
    val n = docs.agg((max(col("doc_id")) + 1).as("_n"))
    klAgainstCorpus(
      unigramCounts(docs).crossJoin(broadcast(n))
        .select(expr(s"doc_id * $buckets div _n").as("k"), col("term"), col("c")),
      docs, vocabK)
      .withColumnRenamed("k", "decile")
  }

  /** Shared KL(P_key ‖ Q_corpus) core over the corpus top-`vocabK`
    * vocabulary + one OOV bucket (complete distributions,
    * everywhere-positive corpus side ⇒ always finite): one tagged
    * instance pass collapses to (key × vocabK+1) counts; every later
    * frame is corpus-size-free; per-term p·ln(p/q) rounds to 6dp
    * DECIMAL and sums exactly. */
  private def klAgainstCorpus(keyed: DataFrame, docs: DataFrame,
                              vocabK: Int): DataFrame = {
    val vocab = broadcast(vocabTopK(docs, vocabK).select(col("term"), lit(1).as("_inv")))
    val sb = keyed.join(vocab, Seq("term"), "left")
      .select(col("k"),
        when(col("_inv").isNull, lit("__oov__")).otherwise(col("term")).as("bucket"),
        col("c"))
      .groupBy(col("k"), col("bucket"))
      .agg(sum(col("c")).as("cs"))
    val st = sb.groupBy(col("k")).agg(sum(col("cs")).as("ns"))
    val cb = sb.groupBy(col("bucket")).agg(sum(col("cs")).as("cq"))
    val tot = cb.agg(sum(col("cq")).cast("double").as("total"))
    val p = col("cs").cast("double") / col("ns").cast("double")
    val q = col("cq").cast("double") / col("total")
    sb.join(st, "k").join(broadcast(cb), "bucket").crossJoin(broadcast(tot))
      .select(col("k"), col("ns"),
        round(p * log(p / q), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("contrib"))
      .groupBy(col("k"))
      .agg(max(col("ns")).as("n_tokens"),
        sum(col("contrib")).cast("double").as("kl"))
  }

  /** Composite quality gate (the corpus-prep filter as a first-class
    * query): per-doc boolean verdict plus the individual signal flags
    * that produced it — token count, stopword ratio, max 3-gram
    * repetition, and mean token length. One map-side projection per
    * signal family + the repetition hash-aggs; the gate predicate
    * itself is pure codegen. */
  def qualityGate(docs: DataFrame,
                  minTokens: Long = 20, maxTokens: Long = 100000,
                  minStopRatio: Double = 0.01, maxRepRatio: Double = 0.2): DataFrame = {
    val sig = docs.select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      size(regexp_extract_all(lower(col("text")), lit(StopwordRe), lit(0))).cast("long")
        .as("n_stop"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1)))
    val rep = repetition(docs).select(col("doc_id"), col("rep_ratio"))
    sig.join(rep, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"), col("stop_ratio"),
        coalesce(col("rep_ratio"), lit(0.0)).as("rep_ratio"),
        (col("n_tokens") >= minTokens).as("len_ok"),
        (col("n_tokens") <= maxTokens).as("max_len_ok"),
        (col("stop_ratio") >= minStopRatio).as("stop_ok"),
        (coalesce(col("rep_ratio"), lit(0.0)) <= maxRepRatio).as("rep_ok"))
      .withColumn("passed",
        col("len_ok") && col("max_len_ok") && col("stop_ok") && col("rep_ok"))
  }

  /** Document fingerprint: min-md5 over character 5-gram shingles
    * (winnowing-lite; cf. Schleimer et al., SIGMOD'03). Documents
    * shorter than 5 chars have no shingles and are dropped. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs
      .filter(length(col("text")) >= 5)
      // The generator explodes an array of PRE-CUT 5-char grams (one
      // `transform` per doc), not one row per character position with
      // the full text riding along — carrying the text through the
      // explode materializes O(len²) bytes of row traffic per doc,
      // which at 10 KB docs is 100 MB/doc of pure copy. The transform
      // lambda is interpreted (HOFs skip codegen) but touches len×5
      // chars; the hot md5→conv→partial-min pipeline after the
      // explode stays inside whole-stage codegen (min combines
      // map-side, so the shuffle is one row per doc).
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), length(col("text")) - 4),
          i => col("text").substr(i, lit(5)))).as("g"))
      .select(col("doc_id"),
        // 60-bit numeric hash (LONG min ⇒ HashAggregate, not the
        // SortAggregate a string min would force); oracle recomputes
        // it as ('0x' || substr(md5(x),1,15))::BIGINT
        graft.functions.Md5Prefix(col("g"), 15).as("h"))
      .groupBy(col("doc_id"))
      .agg(min(col("h")).as("fp"))

  /** FULL winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the MOSS algorithm; [[fingerprint]] keeps only the
    * global min): every window of `w` consecutive word-`k`-gram
    * positions selects its minimal hash, ties broken to the RIGHTMOST
    * position, and the distinct selected (position, hash) set is the
    * doc's fingerprint. Guarantee: two docs sharing a run of
    * ≥ w+k−1 tokens share ≥1 selected gram.
    *
    * The rightmost-min pick packs (40-bit md5-prefix hash, 20-bit
    * INVERTED position) into ONE long, so the window reduction is a
    * plain min() over a LONG (codegen'd, no struct buffers) and the
    * distinct-of-window-mins collapses map-side before its shuffle.
    * Per-doc positions must fit 20 bits (1M grams ≈ a 10 MB doc) —
    * beyond that the pack would collide, so the explode is clamped
    * and anything larger belongs at [[Dedup.substringSpans]]'s grain
    * anyway. Leading windows shorter than w participate (they only
    * re-select early mins — harmless and engine-identical). */
  def winnow(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = docs
      .select(col("doc_id"),
        posexplode(wordShingles(tokens(col("text")), k)).as(Seq("pos0", "sh")))
      .filter(col("pos0") < 1048576)
      .select(col("doc_id"), col("pos0").cast("long").as("pos"),
        graft.functions.Md5Prefix(col("sh"), 10).as("h"))
    val wn = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    sh
      .select(col("doc_id"),
        min(col("h") * lit(1048576L) + (lit(1048575L) - col("pos"))).over(wn).as("sel"))
      .distinct()
      .select(col("doc_id"),
        (lit(1048575L) - col("sel") % lit(1048576L)).as("pos"),
        expr("sel div 1048576").as("gram_hash"))
  }

  /** Filter-tuning curve — the question every corpus pipeline answers
    * before committing to a threshold: how many documents (and
    * tokens) survive the stopword-ratio filter at each cut? Docs
    * bucket by ratio twentieths (clamped at 10 = ratio ≥ 0.5), one
    * aggregation to per-bucket counts, then a REVERSE cumulative sum
    * over the ≤11 bucket rows — the single-partition window is
    * bounded by construction (11 rows whatever the corpus size), so
    * the curve costs one corpus pass + a driver-trivial fold. Output:
    * (bucket, docs_surviving, tokens_surviving) where bucket b means
    * "threshold 0.05·b"; empty buckets don't emit (the curve is a
    * step function — absent steps repeat the next row's value). */
  def qualitySweep(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = quality(docs)
      .select(col("doc_id"), col("n_tokens"),
        least(floor(col("stop_ratio") / 0.05), lit(10L)).cast("long").as("bucket"))
    val per = q.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_toks"))
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per.select(col("bucket"),
      sum(col("n_docs")).over(w).as("docs_surviving"),
      sum(col("n_toks")).over(w).as("tokens_surviving"))
  }

  /** GPT-style sequence packing — the training-prep step that turns a
    * document corpus into fixed-length training sequences: documents
    * CONCATENATE in a deterministic order and the token stream cuts
    * every `budget` tokens, so each doc maps to a token-offset span
    * [start_off, start_off + n_tokens) and the bins it straddles
    * (bin_first..bin_last). Packing is inherently sequential, so it
    * runs per SHARD — exactly how real pipelines shard corpora into
    * independent input files — with shard = doc_id mod `shards`
    * (deterministic across engines, unlike a hash). The window
    * partition is a shard: bounded at corpus/shards BY CONSTRUCTION,
    * and `shards` is the scale knob (a 100 TB corpus packs with
    * shards sized so one shard ≈ one worker's file; there is no
    * Zipf-style hot key because shards are uniform by residue).
    * Zero-token docs drop (nothing to pack). */
  def pack(docs: DataFrame, budget: Long = 2048, shards: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0 && shards > 0, "pack needs a positive budget and shard count")
    val toks = docs
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    toks
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("start_off"),
        expr(s"start_off div $budget").as("bin_first"),
        expr(s"(end_off - 1) div $budget").as("bin_last"))
  }

  /** Sliding token-window CHUNKING manifest — the retrieval/RAG prep
    * step ([[pack]] concatenates docs into training sequences; this
    * splits each doc into overlapping windows for embedding and
    * indexing): windows of `size` tokens starting every
    * `size − overlap` tokens, the last window clipped to the doc end.
    * Each row carries the window's token span AND the md5 of the
    * space-joined token slice, so the oracle proves token-accurate
    * extraction, not just span arithmetic. One map-side pass — the
    * per-doc explode is bounded by n_tokens/stride; no shuffle at
    * all (chunking is embarrassingly row-local). Zero-token docs
    * emit nothing. */
  def chunkSpans(docs: DataFrame, size: Long = 128, overlap: Long = 32): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "chunkSpans needs size > overlap >= 0 — equal would never advance")
    val stride = size - overlap
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size_(col("toks")))
      .filter(col("n") > 0)
    toks
      .withColumn("n_chunks",
        lit(1L) + floor((greatest(col("n") - size, lit(0L)) + stride - 1) / stride).cast("long"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .withColumn("len", least(lit(size), col("n") - col("start_tok")))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("len").as("n_tokens"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("start_tok") + 1).cast("int"), col("len").cast("int"))))
          .as("chunk_hash"))
  }

  // functions.size clashes with the `size` parameter name above
  private def size_(c: Column): Column =
    org.apache.spark.sql.functions.size(c).cast("long")

  /** Bin manifest for [[pack]] output — what the training-data loader
    * actually consumes: per (shard, bin), how many documents overlap
    * the bin, how many of its `budget` token slots are filled, and the
    * fill ratio (1.0 everywhere except each shard's final bin — the
    * padding the packer will write). Derived by exploding each doc's
    * straddled-bin range (sequence(bin_first, bin_last), bounded by
    * doc_tokens/budget + 1 bins per doc) and clipping the span to the
    * bin edges — pure integer arithmetic, one aggregation. */
  def packBins(docs: DataFrame, budget: Long = 2048, shards: Int = 16): DataFrame =
    pack(docs, budget, shards)
      .withColumn("end_off", col("start_off") + col("n_tokens"))
      .withColumn("bin", explode(sequence(col("bin_first"), col("bin_last"))))
      .withColumn("tok_in_bin",
        least(col("end_off"), (col("bin") + 1) * budget) -
          greatest(col("start_off"), col("bin") * budget))
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok_in_bin")).as("n_tokens"))
      .withColumn("fill_ratio", col("n_tokens").cast("double") / budget.toDouble)

  /** Zipf slope of the corpus vocabulary (α in freq ∝ rank^−α, the
    * sanity dial for "does this corpus look like natural language" —
    * English ≈ 1.0, a flat synthetic vocabulary ≪ 1): least-squares
    * fit of ln(freq) on ln(rank) over the top-`topN` terms. The
    * vocabulary reduces through [[vocabTopK]]'s bounded-heap top-k
    * (never a global sort); the rank window and the regression run
    * over topN rows only. Determinism: the ts_deriv recipe — rounded
    * ln inputs cast to narrow DECIMAL(12,6) (products stay exact at
    * (25,12), never the lossy (38,6)² overflow), exact decimal
    * sufficient statistics, slope computed once in double. */
  def zipfAlpha(docs: DataFrame, topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d6 = org.apache.spark.sql.types.DecimalType(12, 6)
    val ranked = vocabTopK(docs, topN)
      // single-partition window over ≤ topN rows — bounded by design
      .withColumn("rank", row_number().over(Window.orderBy(col("n").desc, col("term").asc)))
      .select(round(log(col("rank")), 6).cast(d6).as("x"),
        round(log(col("n")), 6).cast(d6).as("y"))
    ranked
      .agg(
        count(lit(1)).as("n_terms"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"))
      .select(col("n_terms"),
        (-(col("n_terms") * col("sxy") - col("sx") * col("sy"))
          / (col("n_terms") * col("sxx") - col("sx") * col("sx"))).as("alpha"))
  }

  /** Length-bucketed TRAINING-BATCH assignment with padding-waste
    * accounting — the group-by-length batching every training loader
    * ships (fairseq/HF `group_by_length`): batches built from
    * similar-length docs pad each row only to the BATCH max, so the
    * waste Σ(n·max − Σlen)/Σ(n·max) collapses vs arrival-order
    * batching. Reports both schemes side by side — the measured
    * saving IS the operator's output.
    *
    * Scale: one tokenize pass (cached into the two grouping branches);
    * batch assignment windows partition by COARSE LENGTH BUCKET
    * (nt div bucketWidth), never globally — per-bucket row_numbers
    * keep every sort partition-local; the arrival baseline needs no
    * window at all (doc_id div batchSize). Integer token math until
    * the two final waste ratios (raw IEEE). */
  def lengthBatching(docs: DataFrame, bucketWidth: Int = 16,
                     batchSize: Int = 32): DataFrame = {
    // deliberately UNPAIRED persist (both batching schemes read it
    // lazily — no unpersist point); session-shared via CacheManager
    // subtree match
    val base = docs.select(col("doc_id"), tokenCount(col("text")).as("nt"))
      .persist()
    val bucketed = base
      .withColumn("bucket", expr(s"nt div $bucketWidth"))
      .withColumn("b", expr(s"(row_number() OVER (PARTITION BY bucket ORDER BY nt, doc_id) - 1) div $batchSize"))
      .groupBy(col("bucket"), col("b"))
      .agg(count(lit(1)).as("n"), max(col("nt")).as("mx"), sum(col("nt")).as("sm"))
      .agg(count(lit(1)).as("batches_bucketed"),
        sum(col("n")).as("n_docs"),
        sum(col("n") * col("mx")).as("padded_b"),
        sum(col("sm")).as("real_b"))
    val arrival = base
      .withColumn("b", expr(s"doc_id div $batchSize"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n"), max(col("nt")).as("mx"))
      .agg(count(lit(1)).as("batches_arrival"),
        sum(col("n") * col("mx")).as("padded_a"))
    val wasteB = (col("padded_b") - col("real_b")).cast("double") / col("padded_b").cast("double")
    val wasteA = (col("padded_a") - col("real_b")).cast("double") / col("padded_a").cast("double")
    bucketed.crossJoin(arrival)
      .select(col("n_docs"), col("real_b").as("n_tokens"),
        col("batches_bucketed"), wasteB.as("waste_bucketed"),
        col("batches_arrival"), wasteA.as("waste_arrival"),
        (wasteA - wasteB).as("waste_saving"))
  }

  /** FLESCH READING-EASE per document — the readability gate a
    * curation pipeline runs next to [[qualityScore]]'s surface
    * ratios (a corpus can pass length/punctuation checks while being
    * unreadably dense legalese or SEO keyword soup; Flesch is the
    * 1948 dial every readability stack still anchors on). Counts are
    * REGEX RUN counts both engines restate identically: words =
    * [A-Za-z]+ runs, sentences = [.!?]+ runs (floored at 1 — a
    * fragment is one sentence), syllables = [aeiouy]+ runs lowercased
    * (the standard vowel-group approximation, stated). Score =
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words) with
    * the constants as shared literals and both quotients raw IEEE on
    * exact integers (§4); the band CASE cuts at 90/70/50/30 on the
    * identical computed double. Zero-word docs are reported with NULL
    * score, never dropped. One map-only pass; regex cost ∝ corpus
    * bytes, embarrassingly parallel. */
  def readability(docs: DataFrame): DataFrame = {
    val words = size(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0)))
      .cast("long")
    val sents = greatest(lit(1L),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"))
    val sylls = size(regexp_extract_all(lower(col("text")),
      lit("[aeiouy]+"), lit(0))).cast("long")
    docs
      .select(col("doc_id"), words.as("n_words"), sents.as("n_sentences"),
        sylls.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0,
          lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
            - lit(84.6) * (col("n_syllables").cast("double") / col("n_words"))))
      .withColumn("band",
        when(col("flesch").isNull, "empty")
          .when(col("flesch") >= 90, "very_easy")
          .when(col("flesch") >= 70, "easy")
          .when(col("flesch") >= 50, "medium")
          .when(col("flesch") >= 30, "difficult")
          .otherwise("very_difficult"))
  }

  /** ENTROPY RATE per source — unigram entropy, bigram entropy, and
    * the conditional next-token entropy H(w₂|w₁) ≈ H₂ − H₁ (the
    * REDUNDANCY dial: templated/boilerplate sources read low — each
    * next token is predictable — where organic prose sits near the
    * vocabulary ceiling; the compression-potential read next to
    * corpus_simpson's collision probability). Exact integer counts;
    * each p·ln p term rounds to 9dp DECIMAL before the ORDER-FREE
    * exact sum and the entropy rounds at 6dp (the driftPsi ln
    * discipline, §4); the conditional is one subtraction of the two
    * rounded doubles. Two hash-aggregation pyramids per source. */
  def entropyRate(docs: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    def h(counts: DataFrame, nOut: String, out: String) = {
      val tot = counts.groupBy(col("source")).agg(sum(col("c")).as("tot"))
      counts.join(tot, "source")
        .withColumn("term",
          round((col("c").cast("double") / col("tot"))
            * log(col("c").cast("double") / col("tot")), 9).cast(dec))
        .groupBy(col("source"))
        .agg(max(col("tot")).as(nOut),
          round(-sum(col("term")).cast("double"), 6).as(out))
    }
    val uni = unigramCounts(docs)
      .select(col("source"), col("term").as("w"), col("c").as("c0"))
      .groupBy(col("source"), col("w")).agg(sum(col("c0")).as("c"))
    val bg = docs
      .select(col("source"),
        explode(wordShingles(tokens(col("text")), 2)).as("bg"))
      .groupBy(col("source"), col("bg")).agg(count(lit(1)).as("c"))
    h(uni, "n_tokens", "h_unigram")
      .join(h(bg, "n_bigrams", "h_bigram"), "source")
      .withColumn("h_cond", col("h_bigram") - col("h_unigram"))
  }

  /** TOP-K VOCABULARY OVERLAP between source pairs — "do these two
    * sources even speak the same words?" (the cheap pre-read before
    * corpus_source_kl's distributional verdict: near-zero top-vocab
    * Jaccard between sources that are supposed to be one domain means
    * a scraping or labeling bug). Per source the top `k` terms via
    * the custom TopKPerKey operator (bounded per-partition heaps —
    * never a per-source window sort over the whole vocabulary), then
    * pairwise intersection by term join; pairs with NO shared terms
    * still report (size-frame cross of the tiny source list, zero
    * coalesced). Exact integers, one IEEE division (§4). */
  def vocabOverlap(docs: DataFrame, k: Int = 50): DataFrame = {
    require(k >= 1 && k <= 10000, s"k in [1, 10000], got $k")
    val counts = unigramCounts(docs)
      .select(col("source"), col("term"), col("c").as("c0"))
      .groupBy(col("source"), col("term")).agg(sum(col("c0")).as("n"))
    val top = graft.plans.TopKPerKey(counts, Seq("source"),
      Seq("n" -> graft.plans.TopKPerKey.Desc,
        "term" -> graft.plans.TopKPerKey.Asc), k)
      .select(col("source"), col("term"))
      .persist()
    val sizes = top.groupBy(col("source")).agg(count(lit(1)).as("n_terms"))
    val inter = top.alias("a")
      .join(top.alias("b"),
        col("a.term") === col("b.term") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    broadcast(sizes.select(col("source").as("source_a"), col("n_terms").as("n_a")))
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("n_terms").as("n_b"))), col("source_a") < col("source_b"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        (coalesce(col("n_inter"), lit(0L)).cast("double")
          / (col("n_a") + col("n_b") - coalesce(col("n_inter"), lit(0L)))
            .cast("double")).as("jaccard"))
  }

  /** GINI over document lengths — the corpus-mass concentration dial
    * (a handful of mega-documents carrying most of the bytes skews
    * every per-doc statistic and packing plan; a dashboard reads this
    * next to doc_length_stats' quantiles). Same scale shape as the
    * user-concentration gate: NO global rank over docs — lengths
    * reduce to a VALUE HISTOGRAM, the cumulative runs over that tiny
    * frame, and tied levels contribute their exact average ranks
    * DOUBLED (2Σrₓ = Σ x·t·(2·cum_before + t + 1)) so the rank-sum
    * aggregates as an exact DECIMAL at any scale; G = 2Σrx/(n·Σx) −
    * (n+1)/n as fixed-shape doubles over the exact sums (§4). */
  def lengthGini(docs: DataFrame): DataFrame = {
    val d0 = org.apache.spark.sql.types.DecimalType(38, 0)
    import org.apache.spark.sql.expressions.Window
    val hist = docs.groupBy(col("n_chars").as("x")).agg(count(lit(1)).as("t"))
    val cum = hist.withColumn("cum_before",
      coalesce(sum(col("t")).over(Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    cum.agg(
        sum(col("t")).as("n_docs"),
        sum(col("t") * col("x")).as("total_chars"),
        sum(col("x").cast(d0) * col("t")
          * (lit(2L) * col("cum_before") + col("t") + 1)).as("rx2"))
      .select(col("n_docs"), col("total_chars"),
        (col("rx2").cast("double")
          / (col("n_docs").cast("double") * col("total_chars").cast("double"))
          - (col("n_docs") + 1).cast("double") / col("n_docs").cast("double"))
          .as("gini"))
  }
}
