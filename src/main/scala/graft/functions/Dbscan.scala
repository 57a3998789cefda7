package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Distributed DBSCAN (Ester et al., KDD'96) over a similarity graph.
  *
  * The classical formulation is sequential (region-query + seed-set
  * expansion); the distributed re-expression used here is the standard
  * graph decomposition (cf. MR-DBSCAN, ICPADS'11): a point is CORE iff its
  * ε-neighborhood (including itself) holds ≥ minPts points; clusters are the
  * connected components of the core-core neighbor graph; a non-core point
  * adjacent to a core is BORDER and joins a core neighbor's cluster;
  * everything else is NOISE. The only order-dependence in the original
  * algorithm — which cluster claims a border point adjacent to several — is
  * pinned deterministically to the smallest cluster id, so the result is a
  * pure function of the input (and cross-engine reproducible).
  *
  * Scale shape: the ε-neighbor pair list is an INPUT, not computed here, so
  * the caller picks the candidate generator for the corpus — exact all-pairs
  * ([[Similarity.nearDupPairs]]) as the small-corpus baseline, or any
  * bucketed generator (sign-LSH tables / IVF cells, as
  * [[Similarity.dedupByCosineLsh]] / [[Similarity.semanticDedup]] build) at
  * 100 TB, where ε-recall is the documented knob. Everything downstream is
  * shuffle-bounded: degree count and border assignment are single
  * aggregations keyed by point id, and the component pass is the
  * O(log n)-round large-star/small-star [[ConnectedComponents]] — no
  * driver-side materialization anywhere.
  */
object Dbscan {

  /** Cluster membership from an ε-neighbor pair list.
    *
    * @param pairs  undirected neighbor pairs as (id_a, id_b), each pair once
    *               (any orientation); self-pairs must be absent.
    * @param minPts DBSCAN minPts, counting the point itself (the KDD'96
    *               convention): core ⇔ |N_ε(p)| = neighbors + 1 ≥ minPts.
    * @return (id, cluster, is_core): one row per core or border point;
    *         cluster = smallest core id of the component. Noise points
    *         (neither core nor border) are simply absent — recover them by
    *         anti-joining the universe against this result.
    */
  def cluster(pairs: DataFrame, minPts: Int): DataFrame = {
    // The pair list is the expensive input (its generator may be an
    // all-pairs join) and both `sym` and `core` feed several downstream
    // subtrees — without a cut each subtree would re-run the generator.
    // Eager localCheckpoint = the ConnectedComponents convention: compute
    // once, store node-local, no unpersist bookkeeping.
    val sym = pairs
      .select(col("id_a").as("id"), col("id_b").as("nbr"))
      .unionByName(pairs.select(col("id_b").as("id"), col("id_a").as("nbr")))
      .localCheckpoint(true)
    val core = sym.groupBy(col("id"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") + 1 >= minPts)
      .select(col("id"))
      .localCheckpoint(true)
    // Core-core edges only: border points must NOT glue two clusters
    // together (a border within ε of cores from two clusters belongs to
    // one of them; the clusters stay distinct — the defining difference
    // between DBSCAN and plain single-linkage on the ε-graph).
    val coreEdges = sym
      .join(core.select(col("id").as("__ca")), col("id") === col("__ca"))
      .join(core.select(col("id").as("__cb")), col("nbr") === col("__cb"))
      .select(col("id").as("a"), col("nbr").as("b"))
    val comp = ConnectedComponents.components(coreEdges)
    // A core with no core neighbor is its own singleton cluster (it still
    // has ≥ minPts-1 border neighbors): components() only sees edge
    // endpoints, so re-attach isolated cores as self-components.
    val coreComp = core
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
    val borders = sym
      .join(core, Seq("id"), "left_anti")
      .join(coreComp.select(col("id").as("nbr"), col("cluster")), Seq("nbr"))
      .groupBy(col("id"))
      .agg(min(col("cluster")).as("cluster"))
    coreComp.withColumn("is_core", lit(true))
      .unionByName(borders.withColumn("is_core", lit(false)))
  }

  /** DBSCAN with the exact cosine ε-predicate: neighbors are pairs with
    * round₆(cosine) ≥ threshold — the quadratic exact baseline. At corpus
    * scale, swap [[Similarity.nearDupPairs]] for a bucketed candidate
    * generator and keep the identical downstream.
    */
  def clusterByCosine(vectors: DataFrame, threshold: Double, minPts: Int): DataFrame =
    cluster(Similarity.nearDupPairs(vectors, threshold).select(col("id_a"), col("id_b")),
      minPts)
}
