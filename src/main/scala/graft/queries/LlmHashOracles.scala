package graft.queries

/** DuckDB oracle SQL for the four production-hash LLM rows that were
  * rows-only until round 9: winnowing fingerprints (xxhash64 k-grams),
  * SimHash near-dup (xxhash64 tokens), MinHash-LSH dedup (xxhash64
  * shingles + Murmur3 band hashes), and LSH ANN recall (xxhash64-derived
  * hyperplanes). Each replay recomputes the ENGINE'S OWN hash values in
  * SQL via [[OracleHash]]'s bit-exact chains, so the driver's DuckDB gate
  * hash-checks the actual production pipelines — closing the scoreboard's
  * `no_oracle` honesty rows with real value checks.
  *
  * Length/ASCII scope: see [[OracleHash]] — out-of-scope input turns the
  * row red (NULL hash), never silently green.
  */
object LlmHashOracles {

  private val normDocs =
    """d AS (SELECT doc_id, source, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
      |  FROM documents)""".stripMargin

  /** llm_fingerprints: per source (n_docs, sum_fingerprints) where each
    * doc's fingerprints are the distinct window-4 minima over xxhash64 of
    * its 8-grams — the production winnowing, value-replayed.
    */
  val fingerprintsSql: String = {
    val (chain, last, hs, _) = OracleHash.xxh64String("g", "fx")
    s"""WITH $normDocs,
       |gr AS (SELECT doc_id, source, t, unnest(range(1, greatest(length(t) - 7, 1) + 1)) AS i FROM d),
       |g AS (SELECT doc_id, source, i, substring(t, i::INTEGER, 8) AS s FROM gr),
       |$chain,
       |gl AS (SELECT doc_id, source, list($hs ORDER BY i) AS grams FROM $last GROUP BY doc_id, source),
       |w AS (SELECT doc_id, source,
       |  list_distinct(list_transform(range(0, greatest(len(grams) - 4, 0) + 1),
       |    i -> list_min(list_slice(grams, (i + 1)::INTEGER, (i + 4)::INTEGER)))) AS fp
       |  FROM gl)
       |SELECT source, COUNT(*) AS n_docs, CAST(SUM(len(fp)) AS BIGINT) AS sum_fingerprints
       |FROM w GROUP BY source""".stripMargin
  }

  private def pow2HugeArray(n: Int, stepBits: Int): String =
    "[" + (0 until n).map(j => s"${BigInt(1) << (stepBits * j)}::HUGEINT").mkString(",") + "]"

  /** llm_simhash_neardup: the (dist, n_pairs) histogram of banded SimHash
    * candidate pairs at Hamming ≤ 7 — token xxhash64, ±1 bit votes, 8×8-bit
    * banding, all value-replayed.
    */
  val simhashSql: String = {
    val (chain, last, _, hu) = OracleHash.xxh64String("tok", "tx")
    val pow64 = pow2HugeArray(64, 1)
    val pow8 = pow2HugeArray(8, 8)
    s"""WITH $normDocs,
       |tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS s FROM d),
       |$chain,
       |bits AS (SELECT doc_id, $hu AS hu, unnest(range(0, 64)) AS j FROM $last),
       |votes AS (SELECT doc_id, j,
       |  SUM(CASE WHEN hu // ($pow64)[(j + 1)::INTEGER] % 2 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM bits GROUP BY doc_id, j),
       |sk AS (SELECT doc_id,
       |  SUM(CASE WHEN v > 0 THEN ($pow64)[(j + 1)::INTEGER] ELSE 0::HUGEINT END) AS shu
       |  FROM votes GROUP BY doc_id),
       |sks AS (SELECT doc_id, shu,
       |  CAST(CASE WHEN shu >= 9223372036854775808 THEN shu - 18446744073709551616 ELSE shu END AS BIGINT) AS sh
       |  FROM sk),
       |banded AS (SELECT doc_id, sh, shu, unnest(range(0, 8)) AS band FROM sks),
       |bchunk AS (SELECT doc_id, sh, band, shu // ($pow8)[(band + 1)::INTEGER] % 256 AS chunk FROM banded),
       |p AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS dist
       |  FROM bchunk a JOIN bchunk b
       |    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.sh, b.sh)) <= 7)
       |SELECT dist, COUNT(*) AS n_pairs FROM p GROUP BY dist""".stripMargin
  }

  /** llm_minhash_dedup: (n_docs, n_survivors, n_candidate_pairs,
    * n_dup_pairs, n_true_dup_pairs) — xxhash64 shingle hashes, the affine
    * signature family, Murmur3 band hashes, estimated and exact Jaccard:
    * the full production LSH pipeline, value-replayed.
    */
  val minhashSql: String = {
    val Prime = 2038074743L
    val (as, bs) = graft.functions.MinHash.affineCoeffs(128)
    val aArr = "[" + as.mkString(",") + "]"
    val bArr = "[" + bs.mkString(",") + "]"
    val (chain, last, hsg, _) = OracleHash.xxh64String("shrow", "mx")
    val elems = (1 to 8).map(i => s"sig[band * 8 + $i]")
    val (mmChain, mmLast, bh) = OracleHash.murmur3LongArray("bandrow", "mm", elems)
    s"""WITH dm AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |  FROM documents),
       |shl AS (SELECT doc_id,
       |    CASE WHEN len(ss) <= 3 THEN [t]
       |         ELSE list_transform(range(1, len(ss) - 1),
       |           i -> array_to_string(list_slice(ss, i, i + 2), ' ')) END AS sh
       |  FROM (SELECT doc_id, t, string_split(t, ' ') AS ss FROM dm)),
       |shrow AS (SELECT doc_id, unnest(list_distinct(sh)) AS s FROM shl),
       |$chain,
       |hm AS (SELECT doc_id, (($hsg % $Prime) + $Prime) % $Prime AS h FROM $last),
       |hset AS (SELECT doc_id, list(DISTINCT h) AS hs FROM hm GROUP BY doc_id),
       |sigs AS (SELECT doc_id,
       |  list_transform(range(0, 128),
       |    q -> list_min(list_transform(hs, h -> ($aArr[(q + 1)::INTEGER] * h + $bArr[(q + 1)::INTEGER]) % $Prime))) AS sig
       |  FROM hset),
       |bandrow AS (SELECT doc_id, sig, unnest(range(0, 16)) AS band FROM sigs),
       |$mmChain,
       |bkey AS (SELECT doc_id, sig, band, $bh AS bh FROM $mmLast),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bkey a JOIN bkey b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |est AS (SELECT id_a, id_b,
       |    len(list_filter(range(0, 128), i -> sa.sig[(i + 1)::INTEGER] = sb.sig[(i + 1)::INTEGER])) / 128.0 AS est_jaccard
       |  FROM cand JOIN sigs sa ON sa.doc_id = id_a JOIN sigs sb ON sb.doc_id = id_b),
       |ver AS (SELECT id_a, id_b,
       |    len(list_intersect(ha.hs, hb.hs))::DOUBLE /
       |      (len(ha.hs) + len(hb.hs) - len(list_intersect(ha.hs, hb.hs))) AS jaccard
       |  FROM cand JOIN hset ha ON ha.doc_id = id_a JOIN hset hb ON hb.doc_id = id_b)
       |SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       |  (SELECT COUNT(*) FROM documents) -
       |    (SELECT COUNT(DISTINCT id_b) FROM est WHERE est_jaccard >= 0.8) AS n_survivors,
       |  (SELECT COUNT(*) FROM est) AS n_candidate_pairs,
       |  (SELECT CAST(SUM(CASE WHEN est_jaccard >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) FROM est) AS n_dup_pairs,
       |  (SELECT CAST(SUM(CASE WHEN jaccard >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) FROM ver) AS n_true_dup_pairs""".stripMargin
  }

  /** llm_ann_recall: both honesty metrics value-replayed — the noise top-5
    * recall through the 4-table 8-bit sign-projection buckets AND the
    * injected-copy near recall through the 8-table family, hyperplanes
    * recomputed from the engine's own xxhash64(plane, dim) construction.
    */
  val annSql: String = {
    val (chain, last, hpd) = OracleHash.xxh64IntPair("pd", "px", "p", "dd")
    s"""WITH pr AS (SELECT unnest(range(0, 64)) AS p),
       |dr AS (SELECT unnest(range(0, 64)) AS dd),
       |pd AS (SELECT p, dd FROM pr, dr),
       |$chain,
       |pl AS (SELECT p, dd, ((($hpd % 2000001) + 2000001) % 2000001 - 1000000)::DOUBLE / 1000000.0 AS comp
       |  FROM $last),
       |plv AS (SELECT p, list(comp ORDER BY dd) AS comps FROM pl GROUP BY p),
       |base AS (SELECT vec_id, embedding FROM embeddings),
       |inj AS (SELECT vec_id + 100000 AS vec_id,
       |    list_transform(embedding, x -> CAST(x * CAST(1.001 AS FLOAT) + CAST(0.01 AS FLOAT) AS FLOAT)) AS embedding
       |  FROM embeddings WHERE vec_id % 50 = 0),
       |allv AS (SELECT * FROM base UNION ALL SELECT * FROM inj),
       |nrm AS (SELECT vec_id, sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
       |    i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nv FROM allv),
       |-- noise path: base vectors, 4 tables x 8 bits (planes 0..31)
       |nproj AS (SELECT v.vec_id, tj.tbl, tj.j,
       |    list_sum(list_transform(range(1, len(v.embedding) + 1),
       |      i -> v.embedding[i]::DOUBLE * pv.comps[i])) AS proj
       |  FROM base v
       |  CROSS JOIN (SELECT t.tbl, b.j FROM (SELECT unnest(range(0, 4)) AS tbl) t,
       |              (SELECT unnest(range(0, 8)) AS j) b) tj
       |  JOIN plv pv ON pv.p = tj.tbl * 8 + tj.j),
       |nbuck AS (SELECT vec_id, tbl,
       |    CAST(SUM(CASE WHEN proj >= 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM nproj GROUP BY vec_id, tbl),
       |ncand AS (SELECT DISTINCT q.vec_id AS query_id, o.vec_id AS neighbor_id
       |  FROM nbuck q JOIN nbuck o ON q.tbl = o.tbl AND q.bucket = o.bucket
       |   AND q.vec_id <> o.vec_id
       |  WHERE q.vec_id < 10),
       |nsc AS (SELECT query_id, neighbor_id,
       |    round(list_sum(list_transform(range(1, len(qe.embedding) + 1),
       |        i -> qe.embedding[i]::DOUBLE * ne.embedding[i]::DOUBLE)) /
       |      (qn.nv * nn.nv), 6) AS cos
       |  FROM ncand
       |  JOIN allv qe ON qe.vec_id = query_id JOIN allv ne ON ne.vec_id = neighbor_id
       |  JOIN nrm qn ON qn.vec_id = query_id JOIN nrm nn ON nn.vec_id = neighbor_id),
       |napprox AS (SELECT query_id, neighbor_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM nsc)
       |  WHERE rnk <= 5),
       |-- exact brute-force top-5 of the first 10 raw vectors
       |exs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(list_sum(list_transform(range(1, len(q.embedding) + 1),
       |        i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)) /
       |      (sqrt(list_sum(list_transform(range(1, len(q.embedding) + 1),
       |        i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))) *
       |       sqrt(list_sum(list_transform(range(1, len(c.embedding) + 1),
       |        i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))), 6) AS cos
       |  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q, embeddings c
       |  WHERE q.vec_id <> c.vec_id),
       |exact AS (SELECT query_id, neighbor_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM exs)
       |  WHERE rnk <= 5),
       |nhits AS (SELECT e.query_id, e.neighbor_id FROM exact e
       |  JOIN napprox a ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id),
       |-- near path: all vectors, 8 tables x 8 bits (planes 0..63)
       |aproj AS (SELECT v.vec_id, tj.tbl, tj.j,
       |    list_sum(list_transform(range(1, len(v.embedding) + 1),
       |      i -> v.embedding[i]::DOUBLE * pv.comps[i])) AS proj
       |  FROM allv v
       |  CROSS JOIN (SELECT t.tbl, b.j FROM (SELECT unnest(range(0, 8)) AS tbl) t,
       |              (SELECT unnest(range(0, 8)) AS j) b) tj
       |  JOIN plv pv ON pv.p = tj.tbl * 8 + tj.j),
       |abuck AS (SELECT vec_id, tbl,
       |    CAST(SUM(CASE WHEN proj >= 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM aproj GROUP BY vec_id, tbl),
       |acand AS (SELECT DISTINCT q.vec_id AS query_id, o.vec_id AS neighbor_id
       |  FROM abuck q JOIN abuck o ON q.tbl = o.tbl AND q.bucket = o.bucket
       |   AND q.vec_id <> o.vec_id
       |  WHERE q.vec_id >= 100000),
       |asc1 AS (SELECT query_id, neighbor_id,
       |    round(list_sum(list_transform(range(1, len(qe.embedding) + 1),
       |        i -> qe.embedding[i]::DOUBLE * ne.embedding[i]::DOUBLE)) /
       |      (qn.nv * nn.nv), 6) AS cos
       |  FROM acand
       |  JOIN allv qe ON qe.vec_id = query_id JOIN allv ne ON ne.vec_id = neighbor_id
       |  JOIN nrm qn ON qn.vec_id = query_id JOIN nrm nn ON nn.vec_id = neighbor_id),
       |ahit AS (SELECT query_id FROM
       |  (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM asc1)
       |  WHERE rnk = 1 AND neighbor_id = query_id - 100000)
       |SELECT
       |  (SELECT COUNT(*) FROM inj) AS n_near_queries,
       |  (SELECT COUNT(*) FROM ahit) AS n_near_hits,
       |  (SELECT COUNT(*) FROM exact) AS n_exact,
       |  (SELECT COUNT(*) FROM nhits) AS n_noise_recalled,
       |  round((SELECT COUNT(*) FROM ahit)::DOUBLE / (SELECT COUNT(*) FROM inj), 4) AS near_recall,
       |  round((SELECT COUNT(*) FROM nhits)::DOUBLE / (SELECT COUNT(*) FROM exact), 4) AS top5_noise_recall""".stripMargin
  }
}
