package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central query registry: every operator group contributes its declared
  * queries here, and [[graft.SparkEntry]] exposes exactly this list to the
  * driver. Adding an operator = adding a Q to its group's `all`; nothing else
  * to wire.
  */
object Registry {

  def all: Seq[Q] =
    QueriesRelational.all ++
      QueriesDomain.all ++
      QueriesH.all ++
      QueriesIngest.all ++
      QueriesLlm.all ++
      QueriesCorpus.all ++
      QueriesSketch.all ++
      QueriesPca.all ++
      QueriesLayout.all ++
      QueriesQuality.all ++
      QueriesStreaming.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  def headline: Seq[Q] = all.filter(_.headline)
}
