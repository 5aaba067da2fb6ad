package graft

import graft.text.{Dedup, MinhashStore}
import org.apache.spark.sql.functions._

class MinhashStoreSpec extends SparkSpec {
  import spark.implicits._

  private def gen1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different words entirely here now today"),
    (3L, "zebra yak xylophone wombat vulture unicorn"))
    .toDF("doc_id", "text")

  private def gen2 = Seq(
    (10L, "alpha beta gamma delta epsilon zeta eta theta"))
    .toDF("doc_id", "text")

  private def batch = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),   // dup of 1
    (101L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (102L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 10 (gen 2)
    (103L, "nothing here resembles any indexed document at all"))
    .toDF("doc_id", "text")

  private def freshStore(name: String): MinhashStore = {
    // a previous JVM's managed-table LOCATION survives the in-memory
    // catalog, so drop the table AND the warehouse path
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    Seq("sigs", "bands").foreach { s =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$s")
      fs.delete(new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/${name}_$s"), true)
    }
    new MinhashStore(spark, name)
  }

  test("probe finds dups across index generations, not novel docs") {
    val store = freshStore("mh_gen")
    store.write(gen1)
    store.write(gen2) // incremental append — second generation
    val hits = store.probe(batch, minEst = 0.5)
      .select("new_id", "old_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    // the two exact dups hit their generation with full agreement;
    // the dog/cat near-dup is below this toy corpus's band recall
    // (16/4 bands over ~9 shingles — same behavior as the in-session
    // LSH, pinned by the parity test below) and the novel doc is quiet
    assert(hits.map(h => (h._1, h._2)) == Seq((100L, 1L), (102L, 10L)),
      s"unexpected hit set: $hits")
    assert(hits.forall(_._3 == 1.0))
  }

  test("probe candidates == in-session LSH pairs restricted to new×old") {
    val store = freshStore("mh_par")
    store.write(gen1)
    store.write(gen2)
    val viaStore = store.probe(batch, minEst = 0.0)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    val whole = Dedup.minhashLshPairs(gen1.union(gen2).union(batch))
      .as[(Long, Long)].collect().toSet
    val oldIds = Set(1L, 2L, 3L, 10L)
    val expected = whole.collect {
      case (a, b) if oldIds(a) && !oldIds(b) => (b, a)
      case (a, b) if !oldIds(a) && oldIds(b) => (a, b)
    }
    assert(viaStore == expected, s"store=$viaStore vs lsh=$expected")
  }

  test("appending with different parameters fails loudly instead of corrupting") {
    val store = freshStore("mh_guard")
    store.write(gen1)
    // a store with a different permutation count over the same tables:
    // its band hashes are incompatible with generation 1, so append
    // must refuse — probes would silently miss gen-1 dups otherwise
    val mismatched = new MinhashStore(spark, "mh_guard", numPerm = 32, bandSize = 8)
    val err = intercept[IllegalArgumentException] {
      mismatched.write(gen2)
    }
    assert(err.getMessage.contains("numPerm"), err.getMessage)
    // same parameters still append fine (the guard is not a tripwire)
    store.write(gen2)
    assert(store.probe(batch, minEst = 0.5).count() == 2)
  }

  test("the stored bands side joins from its bucket layout without shuffling") {
    // broadcast + AQE off so the sf-agnostic join shape appears: at
    // 100 TB neither index side broadcasts, and the claim under test
    // is "only the NEW batch shuffles into the index's bucket layout"
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val store = freshStore("mh_plan")
      store.write(gen1)
      val probed = store.probe(batch, minEst = 0.0)
      probed.count()
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val plan = probed.queryExecution.executedPlan
      def storedScan(p: SparkPlan): Boolean = p.collect {
        case f: FileSourceScanExec
          if f.tableIdentifier.exists(_.table.startsWith("mh_plan")) => f
      }.nonEmpty
      def hasJoin(p: SparkPlan): Boolean =
        p.toString.contains("Join") // any join below ⇒ the exchange is downstream
      // an offending Exchange sits BETWEEN a stored-table scan and its
      // first join: its subtree reads the index but contains no join
      val offenders = plan.collect {
        case e: ShuffleExchangeExec if storedScan(e.child) && !hasJoin(e.child) => e
      }
      assert(offenders.isEmpty,
        "stored side re-shuffled before its join:\n" + plan.toString.take(2000))
      val bucketScans = "Bucketed: true".r.findAllIn(plan.toString).length
      assert(bucketScans >= 2, "stored tables not scanned as bucketed:\n" +
        plan.toString.take(1500))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("compact bounds files per table, preserves probe results, stamps and appends") {
    val store = freshStore("mh_cpt")
    store.write(gen1)
    store.write(gen2)
    store.write(Seq((20L, "one more generation of text for the file count"))
      .toDF("doc_id", "text"))
    def files(t: String): Int = {
      val d = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + s"/$t")
      d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    val before = files("mh_cpt_sigs") + files("mh_cpt_bands")
    val hitsBefore = store.probe(batch, minEst = 0.5)
      .select("new_id", "old_id", "n_agree", "est_jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    store.compact()
    // one file per non-empty bucket at most, never one per generation
    assert(files("mh_cpt_sigs") <= 8 && files("mh_cpt_bands") <= 8)
    assert(files("mh_cpt_sigs") + files("mh_cpt_bands") < before,
      s"no reduction: $before")
    val hitsAfter = store.probe(batch, minEst = 0.5)
      .select("new_id", "old_id", "n_agree", "est_jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(hitsAfter == hitsBefore)
    // the parameter stamps survived the rename dance: a matching
    // append still works, a mismatched store still refuses
    store.write(Seq((30L, "post compact generation")).toDF("doc_id", "text"))
    val wrong = new MinhashStore(spark, "mh_cpt", n = 5)
    val err = intercept[IllegalArgumentException] {
      wrong.write(Seq((31L, "x")).toDF("doc_id", "text"))
    }
    assert(err.getMessage.contains("graft.minhash.n"), err.getMessage)
  }
}
