package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** SQL fragments (and the registry entry signature) shared by the
  * per-family registry objects: built once so a Spark expression and its
  * oracle twin cannot drift apart silently across families. */
private[graft] object RegistrySqlParts {

  private[graft] type QFn = (SparkSession, String) => DataFrame

  // ---- shared DuckDB fragments ----------------------------------------------

  /** toks CTE: whitespace tokens of lowercased text. */
  private[graft] val toksCte =
    "SELECT doc_id, text, lang, string_split_regex(lower(text), '\\s+') AS toks FROM documents"

  /** shingled CTE body: distinct word-3-gram shingles, docs with >=3 tokens. */
  private[graft] val shingledCte =
    s"""SELECT doc_id, list_distinct(list_transform(range(1, len(toks)-1),
       |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |FROM ($toksCte) WHERE len(toks) >= 3""".stripMargin

  private[graft] def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> ($a[i]::DOUBLE) * ($b[i]::DOUBLE)))"

  /** Sub-vector dot for the MaxSim late-interaction scorer: ⟨a_i, b_j⟩
    * over the [[Similarity.MaxSimGroups]] contiguous slices. */
  private[graft] def dotSubSql(a: String, ai: Int, b: String, bj: Int): String = {
    val g = s"(len($a)//${Similarity.MaxSimGroups})"
    s"list_sum(list_transform(range(0, $g), " +
      s"t -> ($a[1 + $ai*$g + t]::DOUBLE) * ($b[1 + $bj*$g + t]::DOUBLE)))"
  }

  /** The full MaxSim score Σ_i max_j ⟨a_i, b_j⟩ as one SQL expression. */
  private[graft] def maxSimSql(a: String, b: String): String =
    (0 until Similarity.MaxSimGroups).map { i =>
      (0 until Similarity.MaxSimGroups)
        .map(j => dotSubSql(a, i, b, j))
        .mkString("greatest(", ", ", ")")
    }.mkString(" + ")

  private[graft] def l2Sql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> " +
      s"(($a[i]::DOUBLE) - ($b[i]::DOUBLE)) * (($a[i]::DOUBLE) - ($b[i]::DOUBLE))))"

  private[graft] val stopwordsList = TextAnalysis.StopwordsEn.map(w => s"'$w'").mkString("[", ",", "]")

  /** Unrolled greedy MMR chain (the Lloyd/pagerank oracle pattern), shared
    * by `mmr_rerank` and the composed `rag_retrieval`: expects CTEs
    * `cand(query_id, id, rel, vec)` and
    * `cs(query_id, ia, ib, sim)` upstream; produces s1..sk (per-step
    * picks) and p1..pk (selected sets). λ and its complement are SEPARATE
    * literals — `1 − 0.7` ≠ `0.3` in binary doubles. */
  private[graft] def mmrChainSql(k: Int = 5): String = {
    val L = Similarity.MmrLambda
    val C = Similarity.MmrLambdaComp
    val steps = (2 to k).map { t =>
      s"""sc$t AS (SELECT c.query_id, c.id, c.rel, $L*c.rel - $C*max(cs.sim) AS score
             FROM cand c
             LEFT JOIN p${t - 1} px ON px.query_id = c.query_id AND px.id = c.id
             JOIN cs ON cs.query_id = c.query_id AND cs.ia = c.id
             JOIN p${t - 1} sel ON sel.query_id = cs.query_id AND sel.id = cs.ib
             WHERE px.id IS NULL
             GROUP BY c.query_id, c.id, c.rel),
      s$t AS (SELECT query_id, id, rel, score FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, id ASC) AS rn FROM sc$t) WHERE rn = 1),
      p$t AS (SELECT query_id, id FROM p${t - 1}
              UNION ALL SELECT query_id, id FROM s$t)"""
    }.mkString(",\n      ")
    s"""s1 AS (SELECT query_id, id, rel, $L*rel AS score FROM (
               SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY $L*rel DESC, id ASC) AS rn FROM cand) WHERE rn = 1),
      p1 AS (SELECT query_id, id FROM s1),
      $steps"""
  }

  /** UNION ALL emission of the k MMR picks with 4-dp-rounded scores. */
  private[graft] def mmrEmitSql(k: Int = 5): String =
    (1 to k).map(t =>
      s"SELECT query_id, CAST($t AS BIGINT) AS mmr_rank, id, round(rel, 4) AS rel, round(score, 4) AS score FROM s$t")
      .mkString("\n      UNION ALL ")

}
