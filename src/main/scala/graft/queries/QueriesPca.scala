package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.GramPca

/** Embedding PCA query surface — the dimensionality-reduction step of an
  * embedding curation pipeline (project → score redundancy / visualize /
  * cheapen downstream ANN), built on [[graft.functions.GramPca]]:
  * quantized exact-integer Gram (one bounded-state aggregator pass),
  * driver-side fixed-iteration power iteration on the 64×64 model, then a
  * per-row projection expression.
  *
  * The oracle replays the ENTIRE pipeline in DuckDB SQL — integer gram by
  * explode-join (order-free, exact), power iteration as a recursive CTE
  * over a 64-double list state, projections as `list_sum` sequential
  * reductions — every float op in the same IEEE order as the Scala loops,
  * so projections and eigenvalues hash-match at 6 dp with no tolerance.
  * scripts/linear_replay.py carries the same replay in numpy/pure-Python
  * for the sf1+ sweeps where the SQL gram explode gets slow.
  */
object QueriesPca {

  private val Dim = 64
  private val Iters = 40

  /** vec_id, label, p1, p2 (projections on the top-2 principal axes of the
    * uncentered quantized second moment), lam1/lam2 (the eigenvalues, same
    * on every row — the variance-explained witness).
    */
  private def pcaProject(s: SparkSession, dir: String): DataFrame =
    GramPca.projectTopK(
      Tables.embeddings(s, dir).select(col("vec_id"), col("label"), col("embedding")),
      "embedding", Dim, k = 2, iters = Iters)

  /** MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and the
    * recursive power-iteration term references `mat` once per iteration —
    * without materialization every one of the 40 steps would recompute the
    * n×4096 gram explode.
    */
  private val pcaProjectSql = {
    val d = Dim
    val it = Iters
    s"""WITH RECURSIVE
       |qv AS MATERIALIZED (SELECT vec_id, label,
       |  list_transform(embedding, x -> CAST(round(x::DOUBLE * 10000.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |nn AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS nd FROM qv),
       |ij AS (SELECT i, j FROM (SELECT unnest(range(0,$d)) AS i), (SELECT unnest(range(0,$d)) AS j)),
       |g AS MATERIALIZED (SELECT i, j, SUM(q[(i+1)::INTEGER] * q[(j+1)::INTEGER]) AS gs FROM qv, ij GROUP BY i, j),
       |m AS MATERIALIZED (SELECT i, j, (gs::DOUBLE / (SELECT nd FROM nn)) / 100000000.0 AS mv FROM g),
       |mr AS MATERIALIZED (SELECT i, list(mv ORDER BY j) AS mrow FROM m GROUP BY i),
       |mat AS MATERIALIZED (SELECT list(mrow ORDER BY i) AS mm FROM mr),
       |it1(t, v) AS (
       |  SELECT 0, list_transform(range(0,$d), x -> 1.0 / sqrt($d.0))
       |  UNION ALL
       |  SELECT t + 1, list_transform(u, x -> x / nrm) FROM (
       |    SELECT t, u, sqrt(list_sum(list_transform(u, x -> x * x))) AS nrm FROM (
       |      SELECT t, list_transform(range(0,$d),
       |        i -> list_sum(list_transform(range(0,$d),
       |          j -> mm[(i+1)::INTEGER][(j+1)::INTEGER] * v[(j+1)::INTEGER]))) AS u
       |      FROM it1, mat WHERE t < $it))),
       |v1 AS MATERIALIZED (SELECT v AS c1 FROM it1 WHERE t = $it),
       |l1 AS MATERIALIZED (SELECT list_sum(list_transform(range(0,$d),
       |    i -> c1[(i+1)::INTEGER] * list_sum(list_transform(range(0,$d),
       |      j -> mm[(i+1)::INTEGER][(j+1)::INTEGER] * c1[(j+1)::INTEGER])))) AS lam1
       |  FROM v1, mat),
       |mat2 AS MATERIALIZED (SELECT list_transform(range(0,$d),
       |    i -> list_transform(range(0,$d),
       |      j -> mm[(i+1)::INTEGER][(j+1)::INTEGER]
       |           - lam1 * c1[(i+1)::INTEGER] * c1[(j+1)::INTEGER])) AS mm2
       |  FROM mat, v1, l1),
       |it2(t, v) AS (
       |  SELECT 0, list_transform(range(0,$d), x -> 1.0 / sqrt($d.0))
       |  UNION ALL
       |  SELECT t + 1, list_transform(u, x -> x / nrm) FROM (
       |    SELECT t, u, sqrt(list_sum(list_transform(u, x -> x * x))) AS nrm FROM (
       |      SELECT t, list_transform(range(0,$d),
       |        i -> list_sum(list_transform(range(0,$d),
       |          j -> mm2[(i+1)::INTEGER][(j+1)::INTEGER] * v[(j+1)::INTEGER]))) AS u
       |      FROM it2, mat2 WHERE t < $it))),
       |v2 AS MATERIALIZED (SELECT v AS c2 FROM it2 WHERE t = $it),
       |l2 AS MATERIALIZED (SELECT list_sum(list_transform(range(0,$d),
       |    i -> c2[(i+1)::INTEGER] * list_sum(list_transform(range(0,$d),
       |      j -> mm2[(i+1)::INTEGER][(j+1)::INTEGER] * c2[(j+1)::INTEGER])))) AS lam2
       |  FROM v2, mat2)
       |SELECT vec_id, label,
       |  round(list_sum(list_transform(range(0,$d),
       |    i -> q[(i+1)::INTEGER]::DOUBLE / 10000.0 * c1[(i+1)::INTEGER])), 6) AS p1,
       |  round(list_sum(list_transform(range(0,$d),
       |    i -> q[(i+1)::INTEGER]::DOUBLE / 10000.0 * c2[(i+1)::INTEGER])), 6) AS p2,
       |  round((SELECT lam1 FROM l1), 6) AS lam1,
       |  round((SELECT lam2 FROM l2), 6) AS lam2
       |FROM qv, v1, v2""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("emb_pca_project", pcaProject, Some(pcaProjectSql))
  )
}
