package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.functions.{MinHash, Similarity}

/** Scratch stage-level profiler (dev tool, not part of the library surface). */
object Profile {

  private def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (n=$n)")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    // warmup
    spark.read.parquet(s"$dir/nation.parquet").count()

    // ---- llm_embed_neardup_lsh stages
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val injected = e.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001) + lit(0.01)).as("embedding"))
    val base = e.unionByName(injected).cache()
    time("base materialize")(base.count())

    val buckets = base.select(col("vec_id"),
      explode(array((0 until 4).map(t => struct(lit(t).as("table"),
        Similarity.lshBucket(col("embedding"), 8, seed = t).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.table"), col("tb.bucket"))
    time("lshBucket expr (4 tables x 8 bits)")(buckets.count())
    val bucketsCached = buckets.cache()
    time("buckets cache")(bucketsCached.count())

    val a = bucketsCached.select(col("table"), col("bucket"), col("vec_id").as("id_a"))
    val b = bucketsCached.select(col("table"), col("bucket"), col("vec_id").as("id_b"))
    val candidates = a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct().cache()
    time("candidate pairs")(candidates.count())

    val emb = base.select(col("vec_id"), col("embedding"))
    val dups = candidates
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("ea")), "id_a")
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("eb")), "id_b")
      .filter(round(Similarity.cosine(col("ea"), col("eb")), 6) >= 0.99)
      .select(col("id_b").as("__dup")).distinct()
    time("exact-cosine verify + distinct")(dups.count())

    // finer splits of the candidate stage
    val joined = a.join(b, Seq("table", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    time("bucket self-join (no distinct)")(joined.count())
    time("bucket self-join + distinct")(joined.distinct().count())

    spark.catalog.clearCache()

    // the actual registry queries, materialized like Bench does, 4 reps
    def benchLike(name: String): Unit = {
      val fn = graft.queries.Registry.queries(name)
      (1 to 4).foreach { rep =>
        spark.catalog.clearCache()
        time(s"QUERY $name rep$rep") {
          val df = fn(spark, dir)
          val h = xxhash64(df.columns.map(c => col(s"`$c`")): _*)
          df.select(h.as("h")).agg(bit_xor(col("h"))).collect()
          1L
        }
      }
    }
    benchLike("llm_embed_neardup_lsh")
    benchLike("llm_minhash_dedup")
    spark.catalog.clearCache()

    // ---- llm_minhash_dedup stages
    val docs = Tables.documents(spark, dir)
    time("docs materialize")(docs.count())
    val sigs = MinHash.withSignatures(docs).cache()
    time("signatures kernel")(sigs.count())
    val pairs = MinHash.candidatePairs(docs).cache()
    time("candidatePairs (incl resig)")(pairs.count())
    val survivors = MinHash.dedupFuzzyFromPairs(docs, pairs)
    time("dedupFuzzyFromPairs")(survivors.count())
    val verified = MinHash.withExactJaccard(pairs, docs)
    time("withExactJaccard")(verified.count())
    spark.stop()
  }
}
