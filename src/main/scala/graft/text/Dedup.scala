package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard. All hash material
  * derives from md5 (available in every engine → oracle-checkable;
  * uniform → skew-free shuffle keys).
  *
  * Scale notes (100 TB): the quadratic risk in near-dup detection is
  * always the candidate join. Exact Jaccard bounds it with a
  * stop-shingle cap (drop shingles whose doc-frequency exceeds
  * `maxShingleDf` — a shingle shared by thousands of docs carries no
  * discriminating signal but creates O(df²) pairs). MinHash-LSH bounds
  * it structurally: pairs only form inside (band, band-hash) buckets.
  */
object Dedup {

  /** Exact dedup by full text: one row per distinct text with its
    * representative (min doc_id) and multiplicity. */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_copies"))
      .select(md5(col("text")).as("text_md5"), col("rep_doc_id"), col("n_copies"))

  /** Distinct word-`n`-gram shingles per doc: (doc_id, sh). */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), explode(TextOps.wordShingles(TextOps.tokens(col("text")), n)).as("sh"))
      .distinct()

  /** Exact n-gram Jaccard similar pairs (doc_a < doc_b, jaccard ≥
    * threshold). Self-join on the shingle key; `maxShingleDf` caps
    * join fan-out on stop-shingles. */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.3,
                        maxShingleDf: Long = 1000L): DataFrame = {
    val sh = shingles(docs, n)
    val kept = sh
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
      .filter(col("df") <= maxShingleDf)
      .drop("df")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = kept.as("a")
      .join(kept.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("jaccard"))
  }

  /** MinHash signatures: `numPerm` permutations simulated as
    * min(md5(seed || '#' || shingle)) per seed — the min over a keyed
    * cryptographic hash is a valid permutation-min and is reproducible
    * in SQL. Output: (doc_id, seed, minhash). */
  def minhashSignatures(docs: DataFrame, n: Int = 3, numPerm: Int = 16): DataFrame = {
    val seeds = (0 until numPerm).map(i => lit(i)).toArray
    shingles(docs, n)
      .select(col("doc_id"), explode(array(seeds: _*)).as("seed"), col("sh"))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit("#"), col("sh")))).as("minhash"))
  }

  /** MinHash-LSH candidate pairs: signatures grouped into
    * `numPerm / bandSize` bands; a pair is a candidate iff it collides
    * on at least one full band. The band hash is the only join key —
    * candidate generation is a bucket join, never a cross product. */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, numPerm: Int = 16,
                      bandSize: Int = 4): DataFrame = {
    val bands = minhashSignatures(docs, n, numPerm)
      .withColumn("band", expr(s"seed div $bandSize"))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(concat_ws("",
        transform(array_sort(collect_list(struct(col("seed"), col("minhash")))),
          s => s.getField("minhash")))).as("band_hash"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 32-bit SimHash from distinct tokens (Charikar, STOC'02). Bit i of
    * the hash of token t = high bit of hex digit i of md5(t) — 32
    * uniform bits per token with no engine-specific integer hashing.
    * simhash bit i = majority vote over tokens. Returns
    * (doc_id, simhash BIGINT, b0..b3 8-bit block values for bucketing).
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bitIdx = (1 to 32).map(i => lit(i)).toArray
    val votes = toks
      .select(col("doc_id"), explode(array(bitIdx: _*)).as("i"), col("h"))
      .withColumn("bit", when(col("h").substr(col("i"), lit(1)).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L).otherwise(-1L))
      .groupBy(col("doc_id"), col("i"))
      .agg(sum(col("bit")).as("vote"))
      .withColumn("bitval", when(col("vote") > 0, 1L).otherwise(0L))
    votes
      .groupBy(col("doc_id"))
      .agg(sum(expr("shiftleft(bitval, 32 - i)")).as("simhash"))
      .select(
        col("doc_id"), col("simhash"),
        expr("simhash div 16777216").as("b0"),
        expr("(simhash div 65536) % 256").as("b1"),
        expr("(simhash div 256) % 256").as("b2"),
        expr("simhash % 256").as("b3"))
  }

  /** SimHash near-dup candidate pairs within `maxHamming` (≤ 3 with 4
    * blocks: pigeonhole guarantees an identical 8-bit block, so the
    * join is block-bucketed, not all-pairs). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val blocks = Seq("b0", "b1", "b2", "b3").zipWithIndex.map { case (c, i) =>
      sh.select(col("doc_id"), col("simhash"), lit(i).as("blk"), col(c).as("blk_val"))
    }.reduce(_ unionAll _)
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.blk_val") === col("b.blk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(expr("a.simhash ^ b.simhash")).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
