package graft.queries

/** DuckDB oracle SQL for the pipeline-operator queries (OpsQueries).
  * Each statement replicates the exact Spark computation — same md5-based
  * hashing, same planted-duplicate construction, same rounding — so the
  * driver's DuckDB comparison is bit-exact.
  */
object OpsOracles {

  /** q_zorder: min/max binning to 8 bits then bit interleaving — the
    * same expression tree as Layout.zOrderKey so doubles match bitwise.
    * Column j's bit b lands at position b*2 + j. */
  private def zOrderSql: String = {
    def bin(c: String, mn: String, mx: String) =
      s"least(floor((($c::DOUBLE) - $mn) / ($mx - $mn) * 256), 255)::BIGINT"
    val terms = (for {
      (nm, j) <- Seq("bx" -> 0, "by" -> 1)
      b <- 0 until 8
    } yield s"((($nm >> $b) & 1) << ${b * 2 + j})").mkString(" | ")
    s"""WITH mm AS (SELECT min(o_custkey::DOUBLE) AS mnx, max(o_custkey::DOUBLE) AS mxx,
       |                  min(o_totalprice) AS mny, max(o_totalprice) AS mxy FROM orders),
       |b AS (SELECT o_orderkey,
       |        ${bin("o_custkey", "mnx", "mxx")} AS bx,
       |        ${bin("o_totalprice", "mny", "mxy")} AS by
       |      FROM orders, mm)
       |SELECT o_orderkey, $terms AS z FROM b ORDER BY o_orderkey""".stripMargin.trim
  }

  /** q_profile: one UNION ALL arm per column, mirroring Profile.profile's
    * stat arms (mean only for integral columns, avg_len only for
    * strings — both exact integer sums, so engine-portable). */
  private def profileSql: String = {
    def arm(c: String, mean: Boolean, avgLen: Boolean) =
      s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
         |  (count(*) - count($c))::BIGINT AS n_null,
         |  count(DISTINCT $c)::BIGINT AS n_distinct,
         |  min($c)::VARCHAR AS min_value, max($c)::VARCHAR AS max_value,
         |  ${if (mean) s"round(avg($c), 6)" else "NULL::DOUBLE"} AS mean,
         |  ${if (avgLen) s"round(avg(length($c)), 6)" else "NULL::DOUBLE"} AS avg_len
         |FROM orders""".stripMargin
    Seq(arm("o_orderkey", mean = true, avgLen = false),
      arm("o_custkey", mean = true, avgLen = false),
      arm("o_orderstatus", mean = false, avgLen = true),
      arm("o_totalprice", mean = false, avgLen = false),
      arm("o_orderpriority", mean = false, avgLen = true))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** q_bpe_merges: the BPE merge loop mechanically UNROLLED for the
    * query's fixed `numMerges` — `oracleSql` is generated Scala, so the
    * "iterative" loop is just N chained CTE blocks. Each word's symbol
    * sequence is encoded as a tab-delimited string where every symbol is
    * individually wrapped (`\t s \t`); tab can never appear inside a
    * symbol because words are whitespace-split. That encoding makes the
    * greedy left-to-right non-overlapping merge rewrite EXACTLY SQL
    * `replace()` — `replace` scans left to right and never rematches
    * inside a replacement, the same skip-2-on-match semantics as
    * Tokenizer.trainOnWordCounts. Per iteration: pair counts via
    * unnest(range), argmax with the (count desc, left, right) tiebreak,
    * then the rewrite. CTEs are AS MATERIALIZED so the k-step chain is
    * evaluated once per step (DuckDB would otherwise inline the
    * doubly-referenced w_k/m_k CTEs and blow up exponentially). */
  /** The shared merge-training CTE chain: wc → w0 → (p_k, m_k, w_k+1)
    * for each unrolled merge step. `m{k}` holds merge k's (l, r, cnt)
    * and its wrapped-string rewrite (pat → rep). */
  private def bpeChainCtes(numMerges: Int, maxVocabWords: Int): String = {
    val T = "chr(9)"
    val b = new StringBuilder
    b ++= s"""wc AS MATERIALIZED (
             |  SELECT w, count(*)::BIGINT AS c
             |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
             |        FROM documents)
             |  GROUP BY w ORDER BY c DESC, w LIMIT $maxVocabWords),
             |w0 AS MATERIALIZED (
             |  SELECT regexp_replace(w, '(.)', $T||'\\1'||$T, 'g') AS s, c FROM wc)""".stripMargin
    for (k <- 0 until numMerges) {
      b ++= s""",
               |p$k AS MATERIALIZED (
               |  SELECT syms[i] AS l, syms[i+1] AS r, sum(c)::BIGINT AS cnt
               |  FROM (SELECT syms, c, unnest(range(1, len(syms))) AS i
               |        FROM (SELECT string_split(trim(s, $T), $T||$T) AS syms, c FROM w$k))
               |  GROUP BY 1, 2),
               |m$k AS MATERIALIZED (
               |  SELECT $k::INT AS rank, l, r, cnt,
               |         $T||l||$T||$T||r||$T AS pat, $T||l||r||$T AS rep
               |  FROM p$k ORDER BY cnt DESC, l, r LIMIT 1)""".stripMargin
      // LEFT JOIN ON TRUE + coalesce: when merge step k finds no pair
      // at all (corpus exhausted before numMerges), m_k is empty and a
      // cross join would empty the whole rewrite chain; this passes
      // symbols through unchanged instead — exactly what the Tokenizer
      // does when it stops merging early.
      if (k < numMerges - 1)
        b ++= s""",
                 |w${k + 1} AS MATERIALIZED (
                 |  SELECT coalesce(replace(w.s, m.pat, m.rep), w.s) AS s, w.c
                 |  FROM w$k w LEFT JOIN m$k m ON TRUE)""".stripMargin
    }
    b.result()
  }

  private def bpeMergesSql(numMerges: Int, maxVocabWords: Int): String = {
    val union = (0 until numMerges)
      .map(k => s"SELECT rank, l, r, cnt FROM m$k").mkString(" UNION ALL ")
    s"""WITH ${bpeChainCtes(numMerges, maxVocabWords)}
       |SELECT rank, l AS "left", r AS "right", cnt AS pair_count
       |FROM ($union) ORDER BY rank""".stripMargin
  }

  /** q_bpe_tokens: APPLY the trained merges — each doc's words go
    * through the same wrapped-string encoding, every merge's rewrite
    * runs in rank order (the exact `Tokenizer.encodeWord` semantics via
    * SQL replace), and the surviving symbol count per doc is the BPE
    * token count. Empty-text docs count 0 via the left join + CASE. */
  private def bpeTokensSql(numMerges: Int, maxVocabWords: Int,
                           maxDocId: Int): String = {
    val T = "chr(9)"
    val b = new StringBuilder("WITH ")
    b ++= bpeChainCtes(numMerges, maxVocabWords)
    b ++= s""",
             |dw0 AS MATERIALIZED (
             |  SELECT doc_id, regexp_replace(w, '(.)', $T||'\\1'||$T, 'g') AS s
             |  FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
             |        FROM documents WHERE doc_id < $maxDocId))""".stripMargin
    // same empty-merge-step robustness as the training chain
    for (k <- 0 until numMerges)
      b ++= s""",
               |dw${k + 1} AS MATERIALIZED (
               |  SELECT doc_id, coalesce(replace(d.s, m.pat, m.rep), d.s) AS s
               |  FROM dw$k d LEFT JOIN m$k m ON TRUE)""".stripMargin
    b ++= s"""
             |SELECT d.doc_id, coalesce(t.n, 0)::BIGINT AS bpe_tokens
             |FROM (SELECT doc_id FROM documents WHERE doc_id < $maxDocId) d
             |LEFT JOIN (
             |  SELECT doc_id, sum(CASE WHEN s = '' THEN 0
             |                          ELSE len(string_split(trim(s, $T), $T||$T)) END) AS n
             |  FROM dw$numMerges GROUP BY doc_id) t USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin
    b.result()
  }

  /** q_bpe_encode: the [[bpeTokensSql]] encoding chain, emitting the
    * exploded (doc_id, pos, token) sequence instead of counts — word
    * position and within-word token position come from index lambdas
    * (DuckDB's generate_series cannot laterally reference len()), and
    * the global position is a per-doc row_number over (wpos, tpos). */
  private def bpeEncodeSql(numMerges: Int, maxVocabWords: Int,
                           maxDocId: Int): String = {
    val T = "chr(9)"
    val b = new StringBuilder("WITH ")
    b ++= bpeChainCtes(numMerges, maxVocabWords)
    b ++= s""",
             |dw0 AS MATERIALIZED (
             |  SELECT doc_id, u.x['i'] AS wpos,
             |         regexp_replace(u.x['v'], '(.)', $T||'\\1'||$T, 'g') AS s
             |  FROM (SELECT doc_id,
             |          regexp_split_to_array(lower(trim(text)), '\\s+') AS warr
             |        FROM documents WHERE doc_id < $maxDocId),
             |       unnest(list_transform(warr, (v, i) -> {'i': i, 'v': v})) AS u(x))""".stripMargin
    for (k <- 0 until numMerges)
      b ++= s""",
               |dw${k + 1} AS MATERIALIZED (
               |  SELECT doc_id, wpos, coalesce(replace(d.s, m.pat, m.rep), d.s) AS s
               |  FROM dw$k d LEFT JOIN m$k m ON TRUE)""".stripMargin
    b ++= s"""
             |SELECT doc_id,
             |  row_number() OVER (PARTITION BY doc_id
             |    ORDER BY wpos, tpos) - 1 AS pos,
             |  token
             |FROM (
             |  SELECT doc_id, wpos, u.x['i'] AS tpos, u.x['v'] AS token
             |  FROM (SELECT doc_id, wpos,
             |          string_split(trim(s, $T), $T||$T) AS toks
             |        FROM dw$numMerges WHERE s != ''),
             |       unnest(list_transform(toks, (v, i) -> {'i': i, 'v': v})) AS u(x))
             |ORDER BY doc_id, pos""".stripMargin
    b.result()
  }

  /** Shared near-dup pipeline CTEs (docs ∪ shortened copies → shingles
    * → minhash bands → verified pairs → recursive reachability) —
    * the q_dedup_cluster / q_keeper_table common prefix. */
  private val nearDupClusterCte =
    """
      |WITH RECURSIVE docs AS (
      |  SELECT doc_id AS id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |         array_to_string(list_slice(w, 1, len(w) - 5), ' ')
      |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') w FROM documents)),
      |sh AS (
      |  SELECT id, list_transform(generate_series(0, greatest(len(w) - 3, 0)),
      |           i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) AS shingles
      |  FROM (SELECT id, string_split(lower(trim(text)), ' ') w FROM docs)),
      |mh AS (
      |  SELECT id, s, min(md5(s::varchar || '|' || u.sh2)) AS sig
      |  FROM sh, generate_series(0, 11) AS g(s), unnest(sh.shingles) AS u(sh2)
      |  GROUP BY id, s),
      |sigv AS (SELECT id, array_agg(sig ORDER BY s) AS sigs FROM mh GROUP BY id),
      |bands AS (
      |  SELECT id, b, md5(sigs[b*3+1] || ',' || sigs[b*3+2] || ',' || sigs[b*3+3]) AS bucket
      |  FROM sigv, generate_series(0, 3) AS g(b)),
      |cand AS (
      |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
      |  FROM bands l, bands r
      |  WHERE l.b = r.b AND l.bucket = r.bucket AND l.id < r.id),
      |sets AS (SELECT id, list_distinct(shingles) AS s FROM sh),
      |ver AS (
      |  SELECT id_a, id_b,
      |         len(list_intersect(a.s, b.s))::double AS inter, len(a.s) AS la, len(b.s) AS lb
      |  FROM cand JOIN sets a ON cand.id_a = a.id JOIN sets b ON cand.id_b = b.id),
      |pr AS (SELECT id_a, id_b FROM ver WHERE inter / (la + lb - inter) >= 0.6),
      |e AS (SELECT id_a AS s, id_b AS d FROM pr UNION SELECT id_b, id_a FROM pr),
      |reach AS (
      |  SELECT s AS id, s AS r FROM e
      |  UNION
      |  SELECT e.d, reach.r FROM reach JOIN e ON e.s = reach.id)""".stripMargin.trim

  /** q_kmeans: Lloyd's iterations mechanically UNROLLED into CTEs (the
    * same generated-SQL trick as the BPE chain). Exactness argument,
    * mirrored in [[graft.ops.KMeans.lloyd]]:
    *   - `xm` micro-quantization is integer-exact on both engines;
    *   - centroid updates are HUGEINT sums (DuckDB auto-widens
    *     sum(BIGINT)) divided once in double — bit-identical to Spark's
    *     long sums + one IEEE division;
    *   - the distance is a LEFT-ASSOCIATED `+` chain over dimensions,
    *     term-for-term the kernel's left-to-right loop, so doubles
    *     match bit-for-bit and the argmin (row_number with the
    *     cluster-index tiebreak) picks the same cluster. */
  private def kmeansSql(k: Int, iters: Int, dim: Int): String = {
    def dist(v: String, c: String): String =
      (1 to dim).map(i =>
        s"($v.xm[$i]::DOUBLE - $c.c[$i]) * ($v.xm[$i]::DOUBLE - $c.c[$i])")
        .mkString(" + ")
    val sums = (1 to dim).map(i => s"sum(xm[$i]) AS s$i").mkString(", ")
    val meanList = (1 to dim).map(i => s"u.s$i::DOUBLE / u.n").mkString("[", ", ", "]")
    val b = new StringBuilder
    b ++= s"""WITH v AS MATERIALIZED (
             |  SELECT vec_id,
             |         list_transform(embedding, e -> CAST(round(e::DOUBLE * 1000000.0) AS BIGINT)) AS xm
             |  FROM embeddings),
             |c0 AS MATERIALIZED (
             |  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS k,
             |         list_transform(xm, a -> a::DOUBLE) AS c
             |  FROM (SELECT vec_id, xm FROM v ORDER BY vec_id LIMIT $k))""".stripMargin
    for (t <- 1 to iters) {
      b ++= s""",
               |a$t AS MATERIALIZED (
               |  SELECT vec_id, xm, k AS cluster FROM (
               |    SELECT v.vec_id, v.xm, c.k,
               |           row_number() OVER (PARTITION BY v.vec_id
               |                              ORDER BY ${dist("v", "c")}, c.k) AS rn
               |    FROM v, c${t - 1} c) WHERE rn = 1)""".stripMargin
      if (t < iters)
        b ++= s""",
                 |u$t AS MATERIALIZED (
                 |  SELECT cluster, count(*) AS n, $sums FROM a$t GROUP BY cluster),
                 |c$t AS MATERIALIZED (
                 |  SELECT p.k, CASE WHEN u.cluster IS NULL THEN p.c ELSE $meanList END AS c
                 |  FROM c${t - 1} p LEFT JOIN u$t u ON p.k = u.cluster)""".stripMargin
    }
    b ++= s"""
             |SELECT vec_id, cluster FROM a$iters ORDER BY vec_id""".stripMargin
    b.result()
  }

  /** Shared blocked-Levenshtein chain (ASCII-normalized 30-char keys,
    * right side truncated by doc_id % 5 → distances 0-4, maxDist 3;
    * 8-char normalized-prefix blocking). `withEntities` appends the
    * recursive connected-components tail (entity id = min member,
    * entity size). Pure-ASCII keys keep byte and codepoint Levenshtein
    * identical across engines. */
  private def fuzzyJoinSql(withEntities: Boolean): String = {
    val prefix =
      """
        |WITH RECURSIVE base AS (
        |  SELECT doc_id,
        |         substring(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, 30) AS base
        |  FROM documents WHERE doc_id < 300),
        |l AS (SELECT doc_id AS left_id, base AS k,
        |             substring(regexp_replace(base, '[^a-z]', '', 'g'), 1, 8) AS b
        |      FROM base),
        |r AS (SELECT doc_id + 100000 AS right_id,
        |             substring(base, 1, 30 - (doc_id % 5)::INT) AS k2,
        |             substring(regexp_replace(substring(base, 1, 30 - (doc_id % 5)::INT),
        |                                      '[^a-z]', '', 'g'), 1, 8) AS b
        |      FROM base),
        |p AS (
        |  SELECT l.left_id, r.right_id, levenshtein(l.k, r.k2)::INT AS dist
        |  FROM l JOIN r USING (b) WHERE levenshtein(l.k, r.k2) <= 3)""".stripMargin.trim
    if (!withEntities)
      s"""$prefix
         |SELECT left_id, right_id, dist FROM p
         |ORDER BY left_id, right_id""".stripMargin
    else
      s"""$prefix,
         |e AS (SELECT left_id AS s, right_id AS d FROM p
         |      UNION SELECT right_id, left_id FROM p),
         |reach AS (
         |  SELECT s AS id, s AS rt FROM e
         |  UNION
         |  SELECT e.d, reach.rt FROM reach JOIN e ON e.s = reach.id),
         |cl AS (SELECT id, min(rt) AS entity_id FROM reach GROUP BY id)
         |SELECT cl.id, cl.entity_id, sz.n AS entity_size
         |FROM cl JOIN (SELECT entity_id, count(*) AS n
         |              FROM (SELECT id, min(rt) AS entity_id FROM reach GROUP BY id)
         |              GROUP BY entity_id) sz USING (entity_id)
         |ORDER BY cl.id""".stripMargin
  }

  /** Unrolled k-core peel: `rounds` generated (degree → keep → filter)
    * CTE blocks over the co-purchase edge set — the same mechanical
    * unrolling as [[bpeMergesSql]]; round count matches
    * `Graph.kCore(rounds = ...)` exactly, so convergence timing cannot
    * diverge between the engines. */
  private def kcoreSql(k: Int, rounds: Int): String = {
    // each round references the previous edge CTE 3x — MATERIALIZED
    // stops the inlining from expanding the plan exponentially
    val sb = new StringBuilder(
      """WITH pe AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey % 997 AS p
        |  FROM lineitem WHERE l_orderkey < 3000),
        |e0 AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
        |       FROM pe x JOIN pe y ON x.ok = y.ok AND x.p < y.p)""".stripMargin)
    for (i <- 0 until rounds) {
      sb ++= s""",
        |d$i AS MATERIALIZED (SELECT id, count(*) AS deg
        |        FROM (SELECT a AS id FROM e$i UNION ALL SELECT b FROM e$i)
        |        GROUP BY id),
        |g$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg >= $k),
        |e${i + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e$i e
        |        JOIN g$i ga ON e.a = ga.id JOIN g$i gb ON e.b = gb.id)""".stripMargin
    }
    sb ++= s"""
      |SELECT id, count(*) AS core_deg
      |FROM (SELECT a AS id FROM e$rounds UNION ALL SELECT b FROM e$rounds)
      |GROUP BY id ORDER BY id""".stripMargin
    sb.toString
  }

  /** Brute-force all-pairs n-gram Jaccard on the bounded near-dup
    * slice — the oracle of BOTH q_ngram_jaccard (the all-pairs
    * operator) and q_prefix_jaccard (the prefix-filtered join, which
    * must reproduce it exactly). */
  private val ngramJaccardSql: String =
    """
      |WITH docs AS (
      |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 1000
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |         array_to_string(list_slice(w, 1, len(w) - 5), ' ')
      |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') w
      |        FROM documents WHERE doc_id < 1000)),
      |sets AS (
      |  SELECT id, list_distinct(list_transform(generate_series(0, greatest(len(w) - 3, 0)),
      |           i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
      |  FROM (SELECT id, string_split(lower(trim(text)), ' ') w FROM docs)),
      |inv AS (SELECT id, len(s) AS n, unnest(s) AS g FROM sets),
      |pc AS (
      |  SELECT a.id AS id_a, b.id AS id_b, a.n AS na, b.n AS nb, count(*)::double AS c
      |  FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
      |  GROUP BY 1, 2, 3, 4)
      |SELECT id_a, id_b, round(c / (na + nb - c), 4) AS jaccard
      |FROM pc WHERE c / (na + nb - c) >= 0.6
      |ORDER BY id_a, id_b""".stripMargin.trim

  /** Shared CTE prefix: the bounded co-purchase graph (same edges as
    * the triangle/k-core queries — OpsQueries.coPurchaseEdges). */
  private val coPurchaseCte =
    """WITH pe AS (SELECT DISTINCT l_orderkey AS ok, l_partkey % 997 AS p
      |            FROM lineitem WHERE l_orderkey < 3000),
      |e AS (SELECT DISTINCT x.p AS a, y.p AS b
      |      FROM pe x JOIN pe y ON x.ok = y.ok AND x.p < y.p)""".stripMargin

  val sql: Map[String, String] = Map(
    "q_kcore" -> kcoreSql(k = 30, rounds = 16),

    // quantile_cont shares Spark percentile's linear interpolation
    // (the q_quantiles precedent), grouped
    "q_group_pcts" ->
      """
        |WITH g AS (SELECT l_returnflag,
        |             quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.99]) AS qs
        |           FROM lineitem GROUP BY 1),
        |u AS (SELECT l_returnflag, unnest([0.25, 0.5, 0.75, 0.99]) AS q,
        |             unnest(qs) AS v FROM g)
        |SELECT l_returnflag, q, round(v, 4) AS value
        |FROM u ORDER BY l_returnflag, q""".stripMargin.trim,

    // same quantile_cont semantics as q_group_pcts — the Spark side runs
    // the bounded-state distinct-value prefix-sum path instead of the
    // value-buffering percentile aggregate
    "q_group_pcts_scale" ->
      """
        |WITH g AS (SELECT l_returnflag,
        |             quantile_cont(l_extendedprice, [0.5, 0.95, 0.99]) AS qs
        |           FROM lineitem GROUP BY 1),
        |u AS (SELECT l_returnflag, unnest([0.5, 0.95, 0.99]) AS q,
        |             unnest(qs) AS v FROM g)
        |SELECT l_returnflag, q, round(v, 4) AS value
        |FROM u ORDER BY l_returnflag, q""".stripMargin.trim,

    // exact HUGEINT cent moments (the q_corr discipline), closed-form
    // slope/intercept/r2 with the same IEEE combination as groupedOls
    "q_group_ols" ->
      """
        |WITH m AS (SELECT l_returnflag,
        |    count(*)::HUGEINT AS n,
        |    sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS sx,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS sy,
        |    sum(CAST(round(l_quantity * 100.0) AS BIGINT)
        |      * CAST(round(l_quantity * 100.0) AS BIGINT)) AS sxx,
        |    sum(CAST(round(l_quantity * 100.0) AS BIGINT)
        |      * CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS sxy,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
        |      * CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS syy
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT l_returnflag,
        |    (n * sxy - sx * sy)::DOUBLE AS num,
        |    (n * sxx - sx * sx)::DOUBLE AS den,
        |    (n * syy - sy * sy)::DOUBLE AS dy,
        |    sx::DOUBLE AS sxd, sy::DOUBLE AS syd, n::DOUBLE AS nd
        |  FROM m)
        |SELECT l_returnflag,
        |  round(num / den, 6) AS slope,
        |  round((syd / nd - (num / den) * (sxd / nd)) / 100.0, 6) AS intercept,
        |  round(num * num / (den * dy), 6) AS r2
        |FROM t ORDER BY l_returnflag""".stripMargin.trim,

    // 60-bit md5-prefix row hashes; order-independent HUGEINT sum mod
    // 10^18 per content-addressed shard
    "q_table_digest" ->
      """
        |WITH h AS (SELECT
        |    ('0x' || substr(md5(doc_id::varchar || chr(1) || text), 1, 15))::BIGINT AS hv
        |  FROM documents)
        |SELECT hv % 16 AS shard, count(*) AS n_rows,
        |       (sum(hv) % 1000000000000000000)::BIGINT AS digest
        |FROM h GROUP BY 1 ORDER BY shard""".stripMargin.trim,
    "q_kmeans" -> kmeansSql(k = 8, iters = 3, dim = 64),
    "q_funnel" ->
      """
        |WITH e AS (SELECT user_id, ts, event_type FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
        |       (1 + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END
        |          + CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END)::INT AS steps_completed
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |        LEFT JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id""".stripMargin.trim,
    "q_retention" ->
      """
        |WITH e AS (SELECT user_id, date_trunc('week', ts)::DATE AS week FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, week FROM e)
        |SELECT c.cohort_week, ((a.week - c.cohort_week) // 7)::INT AS week_offset,
        |       count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN c ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.trim,
    "q_corr" -> {
      val pairs = Seq(("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"), ("l_quantity", "l_tax"),
        ("l_extendedprice", "l_discount"), ("l_extendedprice", "l_tax"),
        ("l_discount", "l_tax"))
      def iu(c: String) = s"CAST(round($c * 100.0) AS BIGINT)"
      val moments = pairs.zipWithIndex.flatMap { case ((a, b), i) => Seq(
        s"count(*)::HUGEINT AS n_$i",
        s"sum(${iu(a)}) AS sx_$i", s"sum(${iu(b)}) AS sy_$i",
        s"sum(${iu(a)} * ${iu(a)}) AS sxx_$i",
        s"sum(${iu(b)} * ${iu(b)}) AS syy_$i",
        s"sum(${iu(a)} * ${iu(b)}) AS sxy_$i")
      }.mkString(",\n         ")
      val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
        s"""SELECT '$a' AS col_a, '$b' AS col_b,
           |  round((n_$i * sxy_$i - sx_$i * sy_$i)::DOUBLE /
           |    (sqrt((n_$i * sxx_$i - sx_$i * sx_$i)::DOUBLE)
           |     * sqrt((n_$i * syy_$i - sy_$i * sy_$i)::DOUBLE)), 6) AS corr
           |FROM m""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH m AS MATERIALIZED (
         |  SELECT $moments
         |  FROM lineitem)
         |$rows
         |ORDER BY col_a, col_b""".stripMargin.trim
    },
    "q_mixture_sample" ->
      """
        |WITH cnt AS (
        |  SELECT source, count(*) AS n,
        |         CASE source WHEN 'src0' THEN 5 WHEN 'src1' THEN 12
        |              WHEN 'src2' THEN 100000 WHEN 'src3' THEN 17
        |              WHEN 'src5' THEN 1 ELSE -1 END AS tgt
        |  FROM documents GROUP BY source),
        |thr AS (
        |  SELECT source,
        |         CASE WHEN tgt < 0 THEN -1
        |              ELSE least(4294967296, (tgt * 4294967296) // n) END AS t
        |  FROM cnt)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN thr ON d.source = thr.source
        |WHERE ((d.doc_id % 2147483648) * 2654435761) % 4294967296 < thr.t
        |ORDER BY d.doc_id""".stripMargin.trim,
    "q_interval_join" ->
      """
        |WITH l AS (
        |  SELECT event_id AS left_id, epoch_us(ts) AS s,
        |         epoch_us(ts) + 900000000 AS e
        |  FROM events WHERE event_type = 'error'),
        |r AS (
        |  SELECT event_id AS right_id, epoch_us(ts) - 300000000 AS s2,
        |         epoch_us(ts) AS e2
        |  FROM events WHERE event_type = 'purchase')
        |SELECT left_id, right_id,
        |       greatest(l.s, r.s2) AS overlap_start,
        |       least(l.e, r.e2) AS overlap_end
        |FROM l JOIN r ON l.s <= r.e2 AND r.s2 <= l.e
        |ORDER BY left_id, right_id""".stripMargin.trim,
    "q_rank_deciles" ->
      """
        |WITH r AS (
        |  SELECT doc_id, n_chars,
        |         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank,
        |         count(*) OVER () AS n
        |  FROM documents)
        |SELECT doc_id, n_chars, rank, ((rank - 1) * 10) // n AS bucket
        |FROM r ORDER BY rank""".stripMargin.trim,
    "q_dq_checks" ->
      """
        |WITH m AS (
        |  SELECT count(*) AS n,
        |    sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS v0,
        |    sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END)::BIGINT AS v1,
        |    sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END)::BIGINT AS v2,
        |    sum(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END)::BIGINT AS v3,
        |    sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END)::BIGINT AS v4,
        |    sum(CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END)::BIGINT AS v5
        |  FROM lineitem)
        |SELECT 'l_orderkey_not_null' AS rule, v0 AS n_violations, n AS n_rows FROM m
        |UNION ALL SELECT 'l_quantity_in_1_50', v1, n FROM m
        |UNION ALL SELECT 'l_discount_in_0_0.1', v2, n FROM m
        |UNION ALL SELECT 'l_price_positive', v3, n FROM m
        |UNION ALL SELECT 'l_returnflag_domain', v4, n FROM m
        |UNION ALL SELECT 'l_tax_under_0.05', v5, n FROM m
        |ORDER BY rule""".stripMargin.trim,
    "q_histogram" ->
      """
        |SELECT u // 500000 AS bin, (u // 500000) * 500000 AS lo_units,
        |       count(*) AS n, sum(u)::BIGINT AS sum_units
        |FROM (SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT) AS u
        |      FROM lineitem WHERE l_extendedprice IS NOT NULL)
        |GROUP BY 1 ORDER BY bin""".stripMargin.trim,
    "q_fuzzy_join" -> fuzzyJoinSql(withEntities = false),
    "q_entity_resolution" -> fuzzyJoinSql(withEntities = true),
    "q_export_delta" ->
      """
        |WITH o AS (SELECT doc_id, md5(md5('V' || text)) AS h FROM documents),
        |n AS (
        |  SELECT doc_id,
        |         md5(md5('V' || CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
        |                             ELSE text END)) AS h
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 200000, md5(md5('V' || text))
        |  FROM documents WHERE doc_id < 25)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |       CASE WHEN o.doc_id IS NULL THEN 'added'
        |            WHEN n.doc_id IS NULL THEN 'removed'
        |            WHEN o.h = n.h THEN 'unchanged'
        |            ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin.trim,
    // fixed-point integer PageRank over the shared near-dup pair graph:
    // every rank is nano-unit integral arithmetic (floor divisions,
    // long sums), so the unrolled power iterations reproduce the Spark
    // trajectory BIT-exactly — no float anywhere on either engine
    "q_pagerank" -> {
      val iters = 5
      val b = new StringBuilder
      b ++= s"""$nearDupClusterCte,
               |pn AS MATERIALIZED (
               |  SELECT id FROM (SELECT s AS id FROM e UNION SELECT d FROM e)),
               |pdeg AS MATERIALIZED (SELECT s, count(*) AS deg FROM e GROUP BY s),
               |ped AS MATERIALIZED (
               |  SELECT e.s, e.d, pdeg.deg FROM e JOIN pdeg USING (s)),
               |pcnt AS MATERIALIZED (SELECT count(*)::BIGINT AS nn FROM pn),
               |pp0 AS MATERIALIZED (
               |  SELECT id, (SELECT 1000000000 // nn FROM pcnt)::BIGINT AS pr FROM pn)""".stripMargin
      for (t <- 1 to iters)
        b ++= s""",
                 |pc$t AS MATERIALIZED (
                 |  SELECT ped.d, sum(p.pr // ped.deg)::BIGINT AS s2
                 |  FROM ped JOIN pp${t - 1} p ON ped.s = p.id GROUP BY ped.d),
                 |pp$t AS MATERIALIZED (
                 |  SELECT pn.id,
                 |         ((SELECT (3::BIGINT * 1000000000) // (20 * nn) FROM pcnt)
                 |          + (17::BIGINT * coalesce(c.s2, 0)) // 20)::BIGINT AS pr
                 |  FROM pn LEFT JOIN pc$t c ON pn.id = c.d)""".stripMargin
      b ++= s"""
               |SELECT id AS doc_id, pr AS pr_nano FROM pp$iters ORDER BY doc_id""".stripMargin
      b.result()
    },
    // personalized PageRank: same integral nano-unit recurrence as
    // q_pagerank but teleport mass lands ONLY on the seed set {0, 1}
    "q_ppr" -> {
      val iters = 5
      val b = new StringBuilder
      b ++= s"""$nearDupClusterCte,
               |pn AS MATERIALIZED (
               |  SELECT id FROM (SELECT s AS id FROM e UNION SELECT d FROM e)),
               |pdeg AS MATERIALIZED (SELECT s, count(*) AS deg FROM e GROUP BY s),
               |ped AS MATERIALIZED (
               |  SELECT e.s, e.d, pdeg.deg FROM e JOIN pdeg USING (s)),
               |pp0 AS MATERIALIZED (
               |  SELECT id, CASE WHEN id IN (0, 1)
               |             THEN (1000000000 // 2)::BIGINT
               |             ELSE 0::BIGINT END AS pr FROM pn)""".stripMargin
      for (t <- 1 to iters)
        b ++= s""",
                 |pc$t AS MATERIALIZED (
                 |  SELECT ped.d, sum(p.pr // ped.deg)::BIGINT AS s2
                 |  FROM ped JOIN pp${t - 1} p ON ped.s = p.id GROUP BY ped.d),
                 |pp$t AS MATERIALIZED (
                 |  SELECT pn.id,
                 |         (CASE WHEN pn.id IN (0, 1)
                 |               THEN (3::BIGINT * 1000000000) // (20 * 2)
                 |               ELSE 0 END
                 |          + (17::BIGINT * coalesce(c.s2, 0)) // 20)::BIGINT AS pr
                 |  FROM pn LEFT JOIN pc$t c ON pn.id = c.d)""".stripMargin
      b ++= s"""
               |SELECT id AS doc_id, pr AS ppr_nano FROM pp$iters ORDER BY doc_id""".stripMargin
      b.result()
    },

    // standard-semantics PageRank on the DIRECTED pair graph (id_a ->
    // id_b): sink nodes (no out-edges) pool their mass each iteration
    // and every node receives an equal integral share (sink div n)
    // before damping — same nano-unit long arithmetic, bit-exact
    "q_pagerank_dangling" -> {
      val iters = 5
      val b = new StringBuilder
      b ++= s"""$nearDupClusterCte,
               |ed AS MATERIALIZED (SELECT id_a AS s, id_b AS d FROM pr),
               |pn AS MATERIALIZED (
               |  SELECT id FROM (SELECT s AS id FROM ed UNION SELECT d FROM ed)),
               |pdeg AS MATERIALIZED (SELECT s, count(*) AS deg FROM ed GROUP BY s),
               |ped AS MATERIALIZED (
               |  SELECT ed.s, ed.d, pdeg.deg FROM ed JOIN pdeg USING (s)),
               |psink AS MATERIALIZED (
               |  SELECT id FROM pn WHERE NOT EXISTS
               |    (SELECT 1 FROM pdeg WHERE pdeg.s = pn.id)),
               |pcnt AS MATERIALIZED (SELECT count(*)::BIGINT AS nn FROM pn),
               |pp0 AS MATERIALIZED (
               |  SELECT id, (SELECT 1000000000 // nn FROM pcnt)::BIGINT AS pr FROM pn)""".stripMargin
      for (t <- 1 to iters)
        b ++= s""",
                 |psh$t AS MATERIALIZED (
                 |  SELECT (coalesce(sum(p.pr), 0)::BIGINT
                 |          // (SELECT nn FROM pcnt))::BIGINT AS share
                 |  FROM pp${t - 1} p JOIN psink ON p.id = psink.id),
                 |pc$t AS MATERIALIZED (
                 |  SELECT ped.d, sum(p.pr // ped.deg)::BIGINT AS s2
                 |  FROM ped JOIN pp${t - 1} p ON ped.s = p.id GROUP BY ped.d),
                 |pp$t AS MATERIALIZED (
                 |  SELECT pn.id,
                 |         ((SELECT (3::BIGINT * 1000000000) // (20 * nn) FROM pcnt)
                 |          + (17::BIGINT * (coalesce(c.s2, 0)
                 |                           + (SELECT share FROM psh$t))) // 20)::BIGINT AS pr
                 |  FROM pn LEFT JOIN pc$t c ON pn.id = c.d)""".stripMargin
      b ++= s"""
               |SELECT id AS doc_id, pr AS pr_nano FROM pp$iters ORDER BY doc_id""".stripMargin
      b.result()
    },
    "q_rollup" ->
      """
        |SELECT l_returnflag, l_linestatus,
        |       GROUPING(l_returnflag, l_linestatus)::INT AS gid,
        |       count(*) AS n,
        |       sum(CAST(round(l_quantity * 100.0) AS BIGINT))::BIGINT AS sum_qty_cents,
        |       sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::BIGINT AS sum_price_cents
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin.trim,
    "q_pivot" ->
      """
        |SELECT source,
        |       sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT AS de,
        |       sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS en,
        |       sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END)::BIGINT AS es,
        |       sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)::BIGINT AS fr,
        |       sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END)::BIGINT AS zh
        |FROM documents GROUP BY source ORDER BY source""".stripMargin.trim,
    "q_zorder" -> zOrderSql,
    "q_profile" -> profileSql,
    "q_bpe_merges" -> bpeMergesSql(numMerges = 20, maxVocabWords = 65536),
    "q_bpe_encode" -> bpeEncodeSql(numMerges = 20, maxVocabWords = 65536,
      maxDocId = 30),
    "q_bpe_tokens" -> bpeTokensSql(numMerges = 20, maxVocabWords = 65536,
      maxDocId = 100),
    "q_heavy_tokens" ->
      """
        |SELECT w AS tok, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |      FROM documents)
        |GROUP BY w HAVING count(*) >= 500 ORDER BY tok""".stripMargin.trim,
    "q_budget_select" ->
      """
        |WITH m AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_words,
        |    (len(text) - len(regexp_replace(text, '[^\w\s]', '', 'g')))::double / len(text) AS punct_ratio,
        |    (len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))::double / len(text) AS digit_ratio,
        |    len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')))::double
        |      / len(regexp_split_to_array(trim(lower(text)), '\s+')) AS uniq_word_ratio,
        |    len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS ntok
        |  FROM documents),
        |t AS (SELECT doc_id, ntok,
        |    round(least(n_words / 50.0, 1.0) * 0.4
        |        + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2
        |        + (1.0 - least(digit_ratio * 5.0, 1.0)) * 0.2
        |        + least(uniq_word_ratio * 2.0, 1.0) * 0.2, 6) AS quality
        |  FROM m),
        |c AS (SELECT doc_id, quality, ntok,
        |    coalesce(sum(ntok) OVER (ORDER BY quality DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before
        |  FROM t)
        |SELECT doc_id, quality, ntok AS n_tokens, cum_before
        |FROM c WHERE cum_before + ntok <= 50000 ORDER BY doc_id""".stripMargin.trim,
    "q_shard_manifest" ->
      """
        |WITH s AS (SELECT doc_id, length(text)::BIGINT AS b FROM documents),
        |c AS (SELECT doc_id, b,
        |        coalesce(sum(b) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
        |      FROM s),
        |a AS (SELECT doc_id, b, (off // 65536)::BIGINT AS shard FROM c)
        |SELECT shard, count(*)::BIGINT AS n_docs, sum(b)::BIGINT AS total_bytes,
        |       min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin.trim,
    "q_dup_spans" ->
      """
        |WITH src AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |base AS (
        |  SELECT doc_id, text FROM src
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    'uniq' || doc_id || ' ' || array_to_string(ws[11:50], ' ') || ' ' || 'tail' || doc_id
        |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') ws FROM src)),
        |w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') ws FROM base),
        |g0 AS (SELECT doc_id, unnest(list_transform(generate_series(0, greatest(len(ws)-5, 0)),
        |         i -> {'pos': i, 'gh': md5(array_to_string(ws[i+1 : i+5], ' '))})) AS u FROM w),
        |g AS (SELECT doc_id, u.pos AS pos, u.gh AS gh FROM g0),
        |p AS (SELECT a.doc_id id_a, b.doc_id id_b, a.pos pos_a, b.pos pos_b, a.pos - b.pos AS diag
        |      FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id),
        |i AS (SELECT *, pos_a - row_number() OVER (PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS island
        |      FROM p)
        |SELECT id_a, id_b, min(pos_a)::BIGINT AS start_a, min(pos_b)::BIGINT AS start_b,
        |       (count(*) + 4)::BIGINT AS span_tokens
        |FROM i GROUP BY id_a, id_b, diag, island
        |HAVING span_tokens >= 10
        |ORDER BY id_a, id_b, start_a, start_b""".stripMargin.trim,
    // temperature budgets (same HUGEINT chain as q_temp_budgets at
    // budget=100000) turned into per-language greedy prefix picks
    "q_group_budget" ->
      """
        |WITH dom AS (SELECT lang AS domain, cast(sum(n_chars) AS BIGINT) AS mass
        |             FROM documents GROUP BY 1),
        |w AS (SELECT domain, mass,
        |        cast(floor(sqrt(mass::DOUBLE) * 1e6) AS HUGEINT) AS w FROM dom),
        |t AS (SELECT sum(w) AS tw FROM w),
        |b AS (SELECT domain, (100000::HUGEINT * w) // tw AS base,
        |             (100000::HUGEINT * w) % tw AS rem FROM w, t),
        |l AS (SELECT 100000 - sum(base) AS leftover FROM b),
        |r AS (SELECT domain, base,
        |        row_number() OVER (ORDER BY rem DESC, domain) AS rk FROM b),
        |alloc AS (SELECT domain,
        |            cast(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
        |                 AS BIGINT) AS tokens_alloc
        |          FROM r, l),
        |sel AS (SELECT doc_id, lang, n_chars,
        |          sum(n_chars) OVER (PARTITION BY lang
        |            ORDER BY n_chars DESC, doc_id
        |            ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM documents)
        |SELECT doc_id, lang, n_chars
        |FROM sel JOIN alloc ON sel.lang = alloc.domain
        |WHERE cum <= tokens_alloc ORDER BY doc_id""".stripMargin.trim,

    // per-language percent_rank of document length
    "q_calibrated_rank" ->
      """
        |SELECT doc_id, lang, n_chars,
        |  round(percent_rank() OVER (PARTITION BY lang
        |          ORDER BY n_chars, doc_id), 6) AS pct_rank
        |FROM documents ORDER BY doc_id""".stripMargin.trim,

    // smaller-side containment over the planted-excerpt corpus; the
    // shingle chain mirrors q_ngram_jaccard's construction
    "q_containment" ->
      """
        |WITH docs AS (
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 1000
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    'qa' || doc_id || ' qb' || doc_id || ' '
        |      || coalesce(array_to_string(w[11:25], ' '), '')
        |      || ' qc' || doc_id
        |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') w
        |        FROM documents WHERE doc_id < 1000)),
        |sets AS (
        |  SELECT id, list_distinct(list_transform(generate_series(0, greatest(len(w) - 3, 0)),
        |           i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
        |  FROM (SELECT id, string_split(lower(trim(text)), ' ') w FROM docs)),
        |inv AS (SELECT id, len(s) AS n, unnest(s) AS g FROM sets),
        |pc AS (
        |  SELECT a.id AS id_a, b.id AS id_b, a.n AS na, b.n AS nb, count(*)::double AS c
        |  FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
        |  GROUP BY 1, 2, 3, 4),
        |oriented AS (
        |  SELECT CASE WHEN na <= nb THEN id_a ELSE id_b END AS id_small,
        |         CASE WHEN na <= nb THEN id_b ELSE id_a END AS id_big,
        |         c / least(na, nb) AS containment
        |  FROM pc)
        |SELECT id_small, id_big, round(containment, 4) AS containment
        |FROM oriented WHERE containment >= 0.5
        |ORDER BY id_small, id_big""".stripMargin.trim,

    // substring-dedup removal: the q_dup_spans chain, then covered
    // positions excised from the later doc and the text rebuilt
    "q_span_removal" ->
      """
        |WITH src AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |base AS (
        |  SELECT doc_id, text FROM src
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    'uniq' || doc_id || ' '
        |      || coalesce(array_to_string(ws[11:50], ' '), '')
        |      || ' ' || 'tail' || doc_id
        |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') ws FROM src)),
        |w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') ws FROM base),
        |g0 AS (SELECT doc_id, unnest(list_transform(generate_series(0, greatest(len(ws)-5, 0)),
        |         i -> {'pos': i, 'gh': md5(array_to_string(ws[i+1 : i+5], ' '))})) AS u FROM w),
        |g AS (SELECT doc_id, u.pos AS pos, u.gh AS gh FROM g0),
        |p AS (SELECT a.doc_id id_a, b.doc_id id_b, a.pos pos_a, b.pos pos_b, a.pos - b.pos AS diag
        |      FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id),
        |i AS (SELECT *, pos_a - row_number() OVER (PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS island
        |      FROM p),
        |spans AS (
        |  SELECT id_b, min(pos_b)::BIGINT AS start_b,
        |         (count(*) + 4)::BIGINT AS span_tokens
        |  FROM i GROUP BY id_a, id_b, diag, island
        |  HAVING span_tokens >= 10),
        |drop0 AS (SELECT id_b AS doc_id,
        |            unnest(generate_series(start_b, start_b + span_tokens - 1)) AS pos
        |          FROM spans),
        |dropped AS (SELECT DISTINCT doc_id, pos FROM drop0),
        |toks AS (SELECT doc_id, unnest(generate_series(1, len(ws))) - 1 AS pos,
        |           unnest(ws) AS wd FROM w),
        |kept AS (SELECT t.doc_id, t.pos, t.wd FROM toks t
        |         LEFT JOIN dropped d ON t.doc_id = d.doc_id AND t.pos = d.pos
        |         WHERE d.doc_id IS NULL),
        |rb AS (SELECT doc_id, count(*) AS n_kept,
        |         string_agg(wd, ' ' ORDER BY pos) AS text
        |       FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, len(ws)::BIGINT AS n_tokens FROM w)
        |SELECT tot.doc_id, tot.n_tokens, coalesce(rb.n_kept, 0)::BIGINT AS n_kept,
        |       rb.text
        |FROM tot LEFT JOIN rb ON tot.doc_id = rb.doc_id
        |ORDER BY tot.doc_id""".stripMargin.trim,

    "q_contamination" ->
      """
        |WITH sets AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(0, greatest(len(w) - 3, 0)),
        |           i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
        |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') w FROM documents)),
        |b AS (SELECT DISTINCT unnest(sh) AS g FROM sets WHERE doc_id < 5),
        |d AS (SELECT doc_id, sh, len(sh) AS n FROM sets WHERE doc_id < 200),
        |e AS (SELECT doc_id, n, unnest(sh) AS g FROM d),
        |m AS (SELECT e.doc_id AS mid, count(*) AS c FROM e JOIN b USING (g) GROUP BY 1)
        |SELECT d.doc_id AS doc_id, round(coalesce(m.c, 0)::double / d.n, 6) AS contamination
        |FROM d LEFT JOIN m ON d.doc_id = m.mid ORDER BY doc_id""".stripMargin.trim,

    "q_repetition" ->
      """
        |SELECT doc_id,
        |  len(string_split(text, chr(10))) AS n_lines,
        |  len(list_distinct(string_split(text, chr(10)))) AS n_distinct_lines,
        |  round((len(string_split(text, chr(10))) - len(list_distinct(string_split(text, chr(10)))))::double
        |    / len(string_split(text, chr(10))), 6) AS dup_line_ratio,
        |  round(list_aggregate(list_transform(list_distinct(ws),
        |      w -> len(list_filter(ws, x -> x = w))), 'max')::double / len(ws), 6) AS top_word_conc
        |FROM (SELECT doc_id, text, regexp_split_to_array(lower(trim(text)), '\s+') ws
        |      FROM documents WHERE doc_id < 100)
        |ORDER BY doc_id""".stripMargin.trim,

    "q_pii_scrub" ->
      """
        |WITH injected AS (
        |  SELECT doc_id,
        |    substr(text, 1, 40) || ' contact bob' || doc_id::varchar ||
        |    '@example.com or call +1 (555) 010-' || lpad((doc_id % 10000)::varchar, 4, '0') ||
        |    ' ip 10.0.' || (doc_id % 256)::varchar || '.7 ' || substr(text, 41) AS text
        |  FROM documents WHERE doc_id < 200),
        |scrubbed AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |        '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |      '[0-9][0-9 ()+-]{6,}[0-9]', '<NUMBER>', 'g') AS text
        |  FROM injected),
        |norm AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text FROM scrubbed)
        |SELECT doc_id, md5(text) AS scrubbed_hash,
        |  contains(text, '<email>') AS has_email_mask,
        |  contains(text, '<number>') AS has_number_mask,
        |  contains(text, '<ip>') AS has_ip_mask
        |FROM norm ORDER BY doc_id""".stripMargin.trim,

    "q_pipeline_e2e" ->
      """
        |WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents),
        |keep AS (SELECT min(doc_id) AS doc_id FROM docs GROUP BY md5(text)),
        |deduped AS (SELECT d.doc_id, d.text FROM docs d JOIN keep k ON d.doc_id = k.doc_id),
        |q AS (
        |  SELECT doc_id, text,
        |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_words,
        |    (len(text) - len(regexp_replace(text, '[^\w\s]', '', 'g')))::double / len(text) AS punct_ratio,
        |    (len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))::double / len(text) AS digit_ratio,
        |    len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')))::double
        |      / len(regexp_split_to_array(trim(lower(text)), '\s+')) AS uniq_word_ratio
        |  FROM deduped),
        |scored AS (
        |  SELECT *, round(least(n_words / 50.0, 1.0) * 0.4
        |      + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2
        |      + (1.0 - least(digit_ratio * 5.0, 1.0)) * 0.2
        |      + least(uniq_word_ratio * 2.0, 1.0) * 0.2, 6) AS quality
        |  FROM q),
        |kept AS (SELECT * FROM scored WHERE quality >= 0.8),
        |lid AS (
        |  SELECT doc_id, text,
        |    len(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
        |    len(text) AS nc,
        |    list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS toks,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS ws_toks
        |  FROM kept),
        |unp AS (
        |  SELECT doc_id, cjk, nc, ws_toks, 'de' AS lang,
        |    len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','mit','auf','für'])) AS s FROM lid
        |  UNION ALL SELECT doc_id, cjk, nc, ws_toks, 'en',
        |    len(list_intersect(toks, ['the','a','and','of','to','in','is','it','that','for'])) FROM lid
        |  UNION ALL SELECT doc_id, cjk, nc, ws_toks, 'es',
        |    len(list_intersect(toks, ['el','la','los','y','es','un','una','en','por','para'])) FROM lid
        |  UNION ALL SELECT doc_id, cjk, nc, ws_toks, 'fr',
        |    len(list_intersect(toks, ['le','la','les','et','est','un','une','dans','pour','que'])) FROM lid),
        |best AS (
        |  SELECT doc_id, ws_toks,
        |    CASE WHEN cjk * 2 > nc THEN 'zh' WHEN s = 0 THEN 'und' ELSE lang END AS lang_pred,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang DESC) AS rn
        |  FROM unp)
        |SELECT lang_pred, count(*) AS n_docs, cast(sum(ws_toks) AS BIGINT) AS total_tokens
        |FROM best WHERE rn = 1 GROUP BY 1 ORDER BY lang_pred""".stripMargin.trim,

    "q_dedup_exact" ->
      """
        |WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents)
        |SELECT md5(md5('V' || text)) AS content_key, min(doc_id) AS keep_id,
        |       count(*) AS cluster_size
        |FROM docs GROUP BY md5(md5('V' || text)) ORDER BY keep_id""".stripMargin.trim,

    "q_dedup_minhash" ->
      """
        |WITH docs AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |         array_to_string(list_slice(w, 1, len(w) - 5), ' ')
        |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') w FROM documents)),
        |sh AS (
        |  SELECT id, list_transform(generate_series(0, greatest(len(w) - 3, 0)),
        |           i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) AS shingles
        |  FROM (SELECT id, string_split(lower(trim(text)), ' ') w FROM docs)),
        |mh AS (
        |  SELECT id, s, min(md5(s::varchar || '|' || u.sh2)) AS sig
        |  FROM sh, generate_series(0, 11) AS g(s), unnest(sh.shingles) AS u(sh2)
        |  GROUP BY id, s),
        |sigv AS (SELECT id, array_agg(sig ORDER BY s) AS sigs FROM mh GROUP BY id),
        |bands AS (
        |  SELECT id, b, md5(sigs[b*3+1] || ',' || sigs[b*3+2] || ',' || sigs[b*3+3]) AS bucket
        |  FROM sigv, generate_series(0, 3) AS g(b)),
        |cand AS (
        |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
        |  FROM bands l, bands r
        |  WHERE l.b = r.b AND l.bucket = r.bucket AND l.id < r.id),
        |sets AS (SELECT id, list_distinct(shingles) AS s FROM sh),
        |ver AS (
        |  SELECT id_a, id_b,
        |         len(list_intersect(a.s, b.s))::double AS inter, len(a.s) AS la, len(b.s) AS lb
        |  FROM cand JOIN sets a ON cand.id_a = a.id JOIN sets b ON cand.id_b = b.id)
        |SELECT id_a, id_b, round(inter / (la + lb - inter), 4) AS jaccard
        |FROM ver WHERE inter / (la + lb - inter) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin.trim,

    "q_dedup_simhash" ->
      """
        |WITH docs AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |         array_to_string(list_slice(w, 1, len(w) - 5), ' ')
        |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') w FROM documents)),
        |toks AS (
        |  SELECT id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |  FROM docs),
        |th AS (SELECT id, substr(md5(w), 1, 16) AS h FROM toks),
        |bits AS (
        |  SELECT id, g.b,
        |    sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, 16 - g.b // 4, 1)) - 1)
        |                   >> (g.b % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM th, generate_series(0, 63) AS g(b) GROUP BY id, g.b),
        |sv AS (SELECT id, string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, ''
        |                             ORDER BY b) AS bv
        |       FROM bits GROUP BY id),
        |bands AS (SELECT id, g.band, substr(bv, g.band * 16 + 1, 16) AS bucket
        |          FROM sv, generate_series(0, 3) AS g(band)),
        |cand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
        |         FROM bands l JOIN bands r
        |         ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id),
        |ham AS (SELECT id_a, id_b,
        |          len(list_filter(generate_series(1, 64),
        |                i -> substr(a.bv, i, 1) != substr(b.bv, i, 1))) AS hamming
        |        FROM cand JOIN sv a ON cand.id_a = a.id JOIN sv b ON cand.id_b = b.id)
        |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 6
        |ORDER BY id_a, id_b""".stripMargin.trim,

    // the prefix-filtered join must equal the brute-force all-pairs
    // query EXACTLY — same oracle text as q_ngram_jaccard
    "q_prefix_jaccard" -> ngramJaccardSql,

    "q_ngram_jaccard" -> ngramJaccardSql,

    // reproduces the operator's SRP-LSH bucketing (md5 Rademacher
    // planes, 8 tables x 8 bits) so Spark and oracle agree BY
    // CONSTRUCTION — including any near-threshold pair an exact
    // all-pairs oracle would find but bucketing can miss. Signature
    // signs are normalization-invariant, so raw doubles bucket the
    // same as the operator's normalized vectors.
    "q_dedup_cosine" ->
      """
        |WITH e AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, list_transform(embedding, x -> x * 2.0::float)
        |  FROM embeddings),
        |vec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM e),
        |pl AS (
        |  SELECT g1.t, g2.b, g3.j,
        |    CASE WHEN (strpos('0123456789abcdef',
        |           substr(md5(g1.t::varchar || '|' || g2.b::varchar || '|'
        |                      || g3.j::varchar), 1, 1)) - 1) % 2 = 1
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM generate_series(0, 7) AS g1(t), generate_series(0, 7) AS g2(b),
        |       generate_series(0, 63) AS g3(j)),
        |comp AS (
        |  SELECT vec_id, t, b, sum(v[j + 1] * s) AS dot
        |  FROM vec, pl GROUP BY vec_id, t, b),
        |sigs AS (
        |  SELECT vec_id, t,
        |         sum(CASE WHEN dot > 0 THEN 1::BIGINT << b ELSE 0 END) AS bucket
        |  FROM comp GROUP BY vec_id, t),
        |cand AS (
        |  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
        |  FROM sigs l JOIN sigs r
        |    ON l.t = r.t AND l.bucket = r.bucket AND l.vec_id < r.vec_id)
        |SELECT id_a, id_b,
        |       round(list_cosine_similarity(a.v, b.v), 4) AS cos
        |FROM cand
        |JOIN vec a ON cand.id_a = a.vec_id
        |JOIN vec b ON cand.id_b = b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.95
        |ORDER BY id_a, id_b""".stripMargin.trim,

    "q_embed_project" ->
      """
        |WITH vec AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |             FROM embeddings WHERE vec_id < 100),
        |pl AS (
        |  SELECT g2.b, g3.j,
        |    CASE WHEN (strpos('0123456789abcdef',
        |           substr(md5('0|' || g2.b::varchar || '|'
        |                      || g3.j::varchar), 1, 1)) - 1) % 2 = 1
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM generate_series(0, 7) AS g2(b), generate_series(0, 63) AS g3(j)),
        |proj AS (
        |  SELECT vec_id, b AS i, sum(v[j + 1] * s) / sqrt(8.0) AS value
        |  FROM vec, pl GROUP BY vec_id, b)
        |SELECT vec_id, cast(i AS INT) AS i, round(value, 6) AS value
        |FROM proj ORDER BY vec_id, i""".stripMargin.trim,

    // MMR: greedy diversified selection unrolled to 4 steps — micro-unit
    // relevance/cosines make the objective exact long arithmetic, so the
    // per-step argmax (ties -> smaller doc id) matches the kernel's
    "q_mmr" ->
      """
        |WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 6),
        |c AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |sc AS (SELECT query_id, doc_id,
        |         CAST(round(list_cosine_similarity(qv, cv) * 1000000) AS BIGINT) AS rel_u,
        |         cv,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY list_cosine_similarity(qv, cv) DESC, doc_id) AS rnk
        |       FROM q, c WHERE query_id != doc_id),
        |cand AS (SELECT query_id, doc_id, rel_u, cv FROM sc WHERE rnk <= 8),
        |s1 AS (SELECT query_id, doc_id, cv, 500000 * rel_u AS obj
        |       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |               ORDER BY rel_u DESC, doc_id) AS rn FROM cand)
        |       WHERE rn = 1),
        |r2 AS (SELECT c.query_id, c.doc_id, c.rel_u, c.cv,
        |         CAST(round(list_cosine_similarity(c.cv, s1.cv) * 1000000) AS BIGINT) AS m
        |       FROM cand c JOIN s1 ON c.query_id = s1.query_id
        |         AND c.doc_id != s1.doc_id),
        |s2 AS (SELECT query_id, doc_id, cv,
        |         500000 * rel_u - 500000 * m AS obj
        |       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |               ORDER BY (500000 * rel_u - 500000 * m) DESC, doc_id) AS rn
        |             FROM r2)
        |       WHERE rn = 1),
        |r3 AS (SELECT r2.query_id, r2.doc_id, r2.rel_u, r2.cv,
        |         greatest(r2.m, CAST(round(list_cosine_similarity(r2.cv, s2.cv)
        |           * 1000000) AS BIGINT)) AS m
        |       FROM r2 JOIN s2 ON r2.query_id = s2.query_id
        |         AND r2.doc_id != s2.doc_id),
        |s3 AS (SELECT query_id, doc_id, cv,
        |         500000 * rel_u - 500000 * m AS obj
        |       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |               ORDER BY (500000 * rel_u - 500000 * m) DESC, doc_id) AS rn
        |             FROM r3)
        |       WHERE rn = 1),
        |r4 AS (SELECT r3.query_id, r3.doc_id, r3.rel_u, r3.cv,
        |         greatest(r3.m, CAST(round(list_cosine_similarity(r3.cv, s3.cv)
        |           * 1000000) AS BIGINT)) AS m
        |       FROM r3 JOIN s3 ON r3.query_id = s3.query_id
        |         AND r3.doc_id != s3.doc_id),
        |s4 AS (SELECT query_id, doc_id, cv,
        |         500000 * rel_u - 500000 * m AS obj
        |       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |               ORDER BY (500000 * rel_u - 500000 * m) DESC, doc_id) AS rn
        |             FROM r4)
        |       WHERE rn = 1)
        |SELECT query_id, 1 AS rank, doc_id, obj AS mmr_u FROM s1
        |UNION ALL SELECT query_id, 2, doc_id, obj FROM s2
        |UNION ALL SELECT query_id, 3, doc_id, obj FROM s3
        |UNION ALL SELECT query_id, 4, doc_id, obj FROM s4
        |ORDER BY query_id, rank""".stripMargin.trim,

    // Matryoshka eval: brute-force top-5 on the 32-dim prefix vs the
    // full-dim truth, per-query recall
    "q_matryoshka" ->
      """
        |WITH full_q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |                FROM embeddings WHERE vec_id < 10),
        |full_c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
        |           FROM embeddings),
        |tr_q AS (SELECT query_id, qv[1:32] AS qv FROM full_q),
        |tr_c AS (SELECT neighbor_id, cv[1:32] AS cv FROM full_c),
        |truth AS (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rank
        |  FROM full_q, full_c WHERE query_id != neighbor_id),
        |approx AS (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rank
        |  FROM tr_q, tr_c WHERE query_id != neighbor_id),
        |t5 AS (SELECT query_id, neighbor_id FROM truth WHERE rank <= 5),
        |a5 AS (SELECT query_id, neighbor_id FROM approx WHERE rank <= 5),
        |h AS (SELECT t5.query_id, count(*) AS n_hit
        |      FROM t5 JOIN a5 USING (query_id, neighbor_id)
        |      GROUP BY 1)
        |SELECT t5.query_id, count(*) AS n_true,
        |       coalesce(max(h.n_hit), 0) AS n_hit,
        |       round(coalesce(max(h.n_hit), 0) / 5.0, 6) + 0 AS recall
        |FROM t5 LEFT JOIN h ON t5.query_id = h.query_id
        |GROUP BY t5.query_id
        |ORDER BY t5.query_id""".stripMargin.trim,

    // late-interaction MaxSim: per-dot round to 6dp -> integral
    // micro-units, so the max and sum are order-free on both engines
    "q_maxsim" ->
      """
        |WITH dv AS (SELECT vec_id // 5 AS doc_id, vec_id AS dpos,
        |              embedding::DOUBLE[] AS v FROM embeddings),
        |qv AS (SELECT vec_id // 5 AS query_id, vec_id AS qpos,
        |         embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10),
        |dots AS (SELECT query_id, doc_id, qpos,
        |    CAST(round(round(list_dot_product(qv.v, dv.v), 6) * 1000000)
        |         AS BIGINT) AS u
        |  FROM qv, dv),
        |pm AS (SELECT query_id, doc_id, qpos, max(u) AS m
        |       FROM dots GROUP BY 1, 2, 3),
        |sc AS (SELECT query_id, doc_id, sum(m) AS s FROM pm GROUP BY 1, 2),
        |rk AS (SELECT query_id, doc_id, s,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY s DESC, doc_id) AS rank
        |       FROM sc)
        |SELECT query_id, rank, doc_id,
        |       round(s / 1000000.0, 4) + 0 AS maxsim
        |FROM rk WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin.trim,

    "q_ann_topk" ->
      """
        |WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (
        |  SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cos,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rank
        |  FROM q, c WHERE query_id != neighbor_id)
        |SELECT query_id, rank, neighbor_id, round(cos, 4) AS cos
        |FROM s WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin.trim,

    "q_ann_lsh" ->
      """
        |WITH pl AS (
        |  SELECT g1.t, g2.b, g3.j,
        |    CASE WHEN (strpos('0123456789abcdef',
        |           substr(md5(g1.t::varchar || '|' || g2.b::varchar || '|'
        |                      || g3.j::varchar), 1, 1)) - 1) % 2 = 1
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM generate_series(0, 7) AS g1(t), generate_series(0, 5) AS g2(b),
        |       generate_series(0, 63) AS g3(j)),
        |vec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |comp AS (
        |  SELECT vec_id, t, b, sum(v[j + 1] * s) AS dot
        |  FROM vec, pl GROUP BY vec_id, t, b),
        |sigs AS (
        |  SELECT vec_id, t,
        |         sum(CASE WHEN dot > 0 THEN 1 << b ELSE 0 END) AS bucket
        |  FROM comp GROUP BY vec_id, t),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM sigs q JOIN sigs c ON q.t = c.t AND q.bucket = c.bucket
        |  WHERE q.vec_id < 10 AND q.vec_id != c.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         list_cosine_similarity(a.v, b.v) AS cos,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY list_cosine_similarity(a.v, b.v) DESC, neighbor_id) AS rank
        |  FROM cand JOIN vec a ON cand.query_id = a.vec_id
        |            JOIN vec b ON cand.neighbor_id = b.vec_id)
        |SELECT query_id, rank, neighbor_id, round(cos, 4) AS cos
        |FROM scored WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin.trim,

    // fixed-centroid IVF (centroids = first 16 corpus vectors): argmin
    // cell assignment, nprobe=4 probing, cosine rank — all exact
    // arithmetic; dist sums run in the same j order as the Spark kernel
    "q_ann_ivf" ->
      """
        |WITH vec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |      FROM embeddings WHERE vec_id < 16),
        |d AS (SELECT vec.vec_id, c.cid,
        |        list_aggregate(list_transform(generate_series(1, 64),
        |          j -> (v[j] - cv[j]) * (v[j] - cv[j])), 'sum') AS dist
        |      FROM vec, c),
        |a AS (SELECT vec_id, cid FROM
        |        (SELECT *, row_number() OVER (PARTITION BY vec_id
        |                     ORDER BY dist, cid) AS rn FROM d)
        |      WHERE rn = 1),
        |qp AS (SELECT vec_id AS query_id, cid FROM
        |         (SELECT *, row_number() OVER (PARTITION BY vec_id
        |                      ORDER BY dist, cid) AS rn
        |          FROM d WHERE vec_id < 10)
        |       WHERE rn <= 4),
        |cand AS (SELECT qp.query_id, a.vec_id AS neighbor_id
        |         FROM qp JOIN a ON qp.cid = a.cid
        |         WHERE qp.query_id != a.vec_id),
        |scored AS (SELECT query_id, neighbor_id,
        |             list_cosine_similarity(qv.v, nv.v) AS cos,
        |             row_number() OVER (PARTITION BY query_id
        |               ORDER BY list_cosine_similarity(qv.v, nv.v) DESC,
        |                        neighbor_id) AS rank
        |           FROM cand JOIN vec qv ON cand.query_id = qv.vec_id
        |                     JOIN vec nv ON cand.neighbor_id = nv.vec_id)
        |SELECT query_id, rank, neighbor_id, round(cos, 4) AS cos
        |FROM scored WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin.trim,

    // fixed-codebook PQ (codebook mi = subvectors [mi*8+1, mi*8+8] of the
    // first 16 corpus vectors): argmin encode per subspace, then ADC —
    // each neighbor's distance is the sum of its 8 per-subspace table
    // entries (sum order is ulp-irrelevant: candidates are separated by
    // far more than float noise, exact ties sum identical values)
    "q_ann_pq" ->
      """
        |WITH vec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cb AS (SELECT g.mi, c.vec_id AS code, c.v AS cv
        |       FROM (SELECT vec_id, embedding::DOUBLE[] AS v
        |             FROM embeddings WHERE vec_id < 16) c,
        |            generate_series(0, 7) AS g(mi)),
        |d AS (SELECT vec.vec_id, cb.mi, cb.code,
        |        list_aggregate(list_transform(generate_series(1, 8),
        |          j -> (v[mi*8 + j] - cv[mi*8 + j])
        |             * (v[mi*8 + j] - cv[mi*8 + j])), 'sum') AS dist
        |      FROM vec, cb),
        |enc AS (SELECT vec_id, mi, code FROM
        |          (SELECT *, row_number() OVER (PARTITION BY vec_id, mi
        |                       ORDER BY dist, code) AS rn FROM d)
        |        WHERE rn = 1),
        |qd AS (SELECT vec_id AS query_id, mi, code, dist
        |       FROM d WHERE vec_id < 10),
        |ad AS (SELECT qd.query_id, enc.vec_id AS neighbor_id,
        |         sum(qd.dist) AS adist
        |       FROM enc JOIN qd ON enc.mi = qd.mi AND enc.code = qd.code
        |       WHERE qd.query_id != enc.vec_id
        |       GROUP BY qd.query_id, enc.vec_id),
        |scored AS (SELECT query_id, neighbor_id, adist,
        |             row_number() OVER (PARTITION BY query_id
        |               ORDER BY adist, neighbor_id) AS rank FROM ad)
        |SELECT query_id, rank, neighbor_id, round(adist, 4) AS adist
        |FROM scored WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin.trim,

    // URL canonicalization: same normalization chain (lower scheme/
    // host, strip www./default port/fragment/tracking params, sort
    // surviving params, strip trailing slash) over the same injected
    // variants
    "q_url_dedup" ->
      """
        |WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 6
        |      WHEN 0 THEN 'https://site' || (doc_id%20)::varchar
        |        || '.example.org/p' || (doc_id%50)::varchar
        |      WHEN 1 THEN 'HTTPS://SITE' || (doc_id%20)::varchar
        |        || '.EXAMPLE.ORG/p' || (doc_id%50)::varchar
        |      WHEN 2 THEN 'https://www.site' || (doc_id%20)::varchar
        |        || '.example.org:443/p' || (doc_id%50)::varchar || '/'
        |      WHEN 3 THEN 'https://site' || (doc_id%20)::varchar
        |        || '.example.org/p' || (doc_id%50)::varchar
        |        || '?utm_source=x&utm_campaign=y'
        |      WHEN 4 THEN 'https://site' || (doc_id%20)::varchar
        |        || '.example.org/p' || (doc_id%50)::varchar || '#frag'
        |      ELSE 'https://site' || (doc_id%20)::varchar
        |        || '.example.org/p' || (doc_id%50)::varchar || '?b=2&a=1'
        |    END AS url
        |  FROM documents WHERE doc_id < 300),
        |n AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS nf FROM u),
        |raw AS (
        |  SELECT doc_id, nf,
        |    lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |      AS scheme,
        |    regexp_replace(
        |      lower(regexp_extract(nf,
        |        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
        |      '^www\.', '') AS h
        |  FROM n),
        |parts AS (
        |  SELECT doc_id, scheme,
        |    CASE WHEN scheme = 'http' THEN regexp_replace(h, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(h, ':443$', '')
        |         ELSE h END AS host,
        |    regexp_replace(regexp_extract(nf,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
        |      '/+$', '') AS path,
        |    coalesce(array_to_string(list_sort(list_filter(
        |      string_split(regexp_extract(nf, '\?([^#]*)', 1), '&'),
        |      p -> p <> '' AND NOT regexp_matches(p,
        |             '^(utm_[a-z]+|fbclid|gclid)='))), '&'), '') AS q
        |  FROM raw),
        |c AS (SELECT doc_id, scheme || '://' || host || path ||
        |        CASE WHEN q = '' THEN '' ELSE '?' || q END AS canon_url
        |      FROM parts)
        |SELECT canon_url, min(doc_id) AS keep_id, count(*) AS n_urls
        |FROM c GROUP BY canon_url ORDER BY canon_url""".stripMargin.trim,

    // epoch-salted Knuth-hash global training order
    "q_epoch_shuffle" ->
      """
        |SELECT row_number() OVER (
        |    ORDER BY ((doc_id % 2147483648 + 3 * 40503) * 2654435761)
        |               % 4294967296, doc_id) - 1 AS epoch_pos,
        |       doc_id
        |FROM documents ORDER BY epoch_pos""".stripMargin.trim,

    // PSI over fixed 50-wide bins, shares clamped at 1e-6
    "q_psi" ->
      """
        |WITH t AS (
        |  SELECT value AS v, CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g
        |  FROM events WHERE value IS NOT NULL),
        |binned AS (
        |  SELECT (CASE WHEN v >= 50 THEN 1 ELSE 0 END
        |        + CASE WHEN v >= 100 THEN 1 ELSE 0 END
        |        + CASE WHEN v >= 150 THEN 1 ELSE 0 END
        |        + CASE WHEN v >= 200 THEN 1 ELSE 0 END
        |        + CASE WHEN v >= 250 THEN 1 ELSE 0 END
        |        + CASE WHEN v >= 300 THEN 1 ELSE 0 END
        |        + CASE WHEN v >= 350 THEN 1 ELSE 0 END
        |        + CASE WHEN v >= 400 THEN 1 ELSE 0 END
        |        + CASE WHEN v >= 450 THEN 1 ELSE 0 END) AS bin,
        |    g FROM t),
        |counts AS (SELECT bin, sum(g)::BIGINT AS n_a,
        |             sum(1 - g)::BIGINT AS n_b
        |           FROM binned GROUP BY bin),
        |tot AS (SELECT sum(n_a)::DOUBLE AS ta, sum(n_b)::DOUBLE AS tb
        |        FROM counts)
        |SELECT bin, n_a, n_b,
        |  round((greatest(n_a / ta, 1e-6) - greatest(n_b / tb, 1e-6))
        |    * ln(greatest(n_a / ta, 1e-6) / greatest(n_b / tb, 1e-6)), 6)
        |    AS psi_term
        |FROM counts, tot ORDER BY bin""".stripMargin.trim,

    // two-stage retrieval: the q_ann_pq chain with a 20-candidate
    // shortlist, re-scored by exact cosine and cut to the true top-5
    "q_ann_rerank" ->
      """
        |WITH vec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cb AS (SELECT g.mi, c.vec_id AS code, c.v AS cv
        |       FROM (SELECT vec_id, embedding::DOUBLE[] AS v
        |             FROM embeddings WHERE vec_id < 16) c,
        |            generate_series(0, 7) AS g(mi)),
        |d AS (SELECT vec.vec_id, cb.mi, cb.code,
        |        list_aggregate(list_transform(generate_series(1, 8),
        |          j -> (v[mi*8 + j] - cv[mi*8 + j])
        |             * (v[mi*8 + j] - cv[mi*8 + j])), 'sum') AS dist
        |      FROM vec, cb),
        |enc AS (SELECT vec_id, mi, code FROM
        |          (SELECT *, row_number() OVER (PARTITION BY vec_id, mi
        |                       ORDER BY dist, code) AS rn FROM d)
        |        WHERE rn = 1),
        |qd AS (SELECT vec_id AS query_id, mi, code, dist
        |       FROM d WHERE vec_id < 10),
        |ad AS (SELECT qd.query_id, enc.vec_id AS neighbor_id,
        |         sum(qd.dist) AS adist
        |       FROM enc JOIN qd ON enc.mi = qd.mi AND enc.code = qd.code
        |       WHERE qd.query_id != enc.vec_id
        |       GROUP BY qd.query_id, enc.vec_id),
        |sl AS (SELECT query_id, neighbor_id FROM
        |         (SELECT query_id, neighbor_id,
        |            row_number() OVER (PARTITION BY query_id
        |              ORDER BY adist, neighbor_id) AS rk FROM ad)
        |       WHERE rk <= 20),
        |scored AS (SELECT query_id, neighbor_id,
        |             list_cosine_similarity(qv.v, nv.v) AS cos,
        |             row_number() OVER (PARTITION BY query_id
        |               ORDER BY list_cosine_similarity(qv.v, nv.v) DESC,
        |                        neighbor_id) AS rank
        |           FROM sl JOIN vec qv ON sl.query_id = qv.vec_id
        |                   JOIN vec nv ON sl.neighbor_id = nv.vec_id)
        |SELECT query_id, rank, neighbor_id, round(cos, 4) AS cos
        |FROM scored WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin.trim,

    // paragraph-level dedup: 8-word re-chunking, first global
    // occurrence per md5(paragraph) by (doc_id, pos), ordered rebuild
    "q_para_dedup" ->
      """
        |WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents),
        |wd AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        |       FROM docs),
        |par AS (SELECT doc_id,
        |    list_transform(
        |      generate_series(0,
        |        greatest(cast(ceil(len(w) / 8.0) AS INT), 1) - 1),
        |      i -> array_to_string(list_slice(w, i*8+1, i*8+8), ' ')) AS ps
        |  FROM wd),
        |paras AS (SELECT doc_id,
        |            unnest(generate_series(1, len(ps))) - 1 AS pos,
        |            unnest(ps) AS para
        |          FROM par),
        |fo AS (SELECT doc_id, pos FROM
        |         (SELECT *, row_number() OVER (PARTITION BY md5(para)
        |                      ORDER BY doc_id, pos) AS rn FROM paras)
        |       WHERE rn = 1),
        |kept AS (SELECT p.doc_id, p.pos, p.para FROM paras p
        |         JOIN fo ON p.doc_id = fo.doc_id AND p.pos = fo.pos),
        |rb AS (SELECT doc_id, count(*) AS n_kept,
        |         string_agg(para, chr(10) ORDER BY pos) AS text
        |       FROM kept GROUP BY doc_id),
        |np AS (SELECT doc_id, count(*) AS n_paras FROM paras GROUP BY doc_id)
        |SELECT np.doc_id, np.n_paras, coalesce(rb.n_kept, 0) AS n_kept,
        |       rb.text
        |FROM np LEFT JOIN rb ON np.doc_id = rb.doc_id
        |ORDER BY np.doc_id""".stripMargin.trim,

    // exact-k per-group sample: Knuth-hash rank within language
    "q_group_sample" ->
      """
        |SELECT lang, sample_rank, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296,
        |               doc_id) AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 10 ORDER BY lang, sample_rank""".stripMargin.trim,

    // temperature-scaled (sqrt-mass) budgets with largest-remainder
    // integer apportionment — HUGEINT here, decimal(38,0) on Spark
    "q_temp_budgets" ->
      """
        |WITH dom AS (SELECT lang AS domain, cast(sum(n_chars) AS BIGINT) AS mass
        |             FROM documents GROUP BY 1),
        |w AS (SELECT domain, mass,
        |        cast(floor(sqrt(mass::DOUBLE) * 1e6) AS HUGEINT) AS w FROM dom),
        |t AS (SELECT sum(w) AS tw FROM w),
        |b AS (SELECT domain, mass, (1000000::HUGEINT * w) // tw AS base,
        |             (1000000::HUGEINT * w) % tw AS rem FROM w, t),
        |l AS (SELECT 1000000 - sum(base) AS leftover FROM b),
        |r AS (SELECT domain, mass, base,
        |        row_number() OVER (ORDER BY rem DESC, domain) AS rk FROM b)
        |SELECT domain, mass,
        |       cast(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |         AS tokens_alloc
        |FROM r, l ORDER BY domain""".stripMargin.trim,

    // hourly OHLC bars: open/close by the (ts, event_id) total order,
    // integer-cent volume, bucket by pure epoch-micro arithmetic
    "q_ohlc" ->
      """
        |WITH e AS (SELECT event_type, ts, event_id, value,
        |             epoch_us(ts) - epoch_us(ts) % 3600000000 AS bar_us
        |           FROM events),
        |rn AS (SELECT *,
        |         row_number() OVER (PARTITION BY event_type, bar_us
        |                            ORDER BY ts, event_id) AS rn,
        |         count(*) OVER (PARTITION BY event_type, bar_us) AS cnt
        |       FROM e)
        |SELECT event_type, make_timestamp(bar_us) AS bar_start,
        |  max(CASE WHEN rn = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn = cnt THEN value END) AS close,
        |  cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS vol_cents,
        |  count(*) AS n_events
        |FROM rn GROUP BY event_type, bar_us
        |ORDER BY event_type, bar_start""".stripMargin.trim,

    // composed IVFPQ: coarse centroids = first 4 corpus vectors, residual
    // codebooks = subvectors of the first 16; assign (argmin full-dim),
    // residual-encode per subspace ((v - center) - codebook entry),
    // probe nprobe=2 cells, ADC over residual tables — exact arithmetic
    // in the same association order as the Spark kernel (adist rounds to
    // 4 decimals; candidates separate far beyond float noise)
    "q_ann_ivfpq" ->
      """
        |WITH vec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |      FROM embeddings WHERE vec_id < 4),
        |ad AS (SELECT vec.vec_id, c.cid,
        |         list_aggregate(list_transform(generate_series(1, 64),
        |           j -> (v[j] - cv[j]) * (v[j] - cv[j])), 'sum') AS dist
        |       FROM vec, c),
        |a AS (SELECT vec_id, cid FROM
        |        (SELECT *, row_number() OVER (PARTITION BY vec_id
        |                     ORDER BY dist, cid) AS rn FROM ad)
        |      WHERE rn = 1),
        |cb AS (SELECT g.mi, cc.vec_id AS code, cc.v AS cbv
        |       FROM (SELECT vec_id, embedding::DOUBLE[] AS v
        |             FROM embeddings WHERE vec_id < 16) cc,
        |            generate_series(0, 7) AS g(mi)),
        |encd AS (SELECT vec.vec_id, cb.mi, cb.code,
        |           list_aggregate(list_transform(generate_series(1, 8),
        |             j -> ((v[mi*8 + j] - cv[mi*8 + j]) - cbv[mi*8 + j])
        |                * ((v[mi*8 + j] - cv[mi*8 + j]) - cbv[mi*8 + j])),
        |             'sum') AS dist
        |         FROM vec JOIN a ON vec.vec_id = a.vec_id
        |              JOIN c ON a.cid = c.cid, cb),
        |enc AS (SELECT vec_id, mi, code FROM
        |          (SELECT *, row_number() OVER (PARTITION BY vec_id, mi
        |                       ORDER BY dist, code) AS rn FROM encd)
        |        WHERE rn = 1),
        |qp AS (SELECT vec_id AS query_id, cid FROM
        |         (SELECT *, row_number() OVER (PARTITION BY vec_id
        |                      ORDER BY dist, cid) AS rn
        |          FROM ad WHERE vec_id < 10)
        |       WHERE rn <= 2),
        |qt AS (SELECT qp.query_id, qp.cid, cb.mi, cb.code,
        |         list_aggregate(list_transform(generate_series(1, 8),
        |           j -> ((qv.v[mi*8 + j] - c.cv[mi*8 + j]) - cb.cbv[mi*8 + j])
        |              * ((qv.v[mi*8 + j] - c.cv[mi*8 + j]) - cb.cbv[mi*8 + j])),
        |           'sum') AS dist
        |       FROM qp JOIN vec qv ON qp.query_id = qv.vec_id
        |            JOIN c ON qp.cid = c.cid, cb),
        |adc AS (SELECT qt.query_id, enc.vec_id AS neighbor_id,
        |          sum(qt.dist) AS adist
        |        FROM enc JOIN a ON enc.vec_id = a.vec_id
        |             JOIN qt ON qt.cid = a.cid AND qt.mi = enc.mi
        |                    AND qt.code = enc.code
        |        WHERE qt.query_id != enc.vec_id
        |        GROUP BY qt.query_id, enc.vec_id),
        |scored AS (SELECT query_id, neighbor_id, adist,
        |             row_number() OVER (PARTITION BY query_id
        |               ORDER BY adist, neighbor_id) AS rank FROM adc)
        |SELECT query_id, rank, neighbor_id, round(adist, 4) AS adist
        |FROM scored WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin.trim,

    "q_lang_id" ->
      """
        |WITH sc AS (
        |  SELECT doc_id,
        |    len(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
        |    len(text) AS nc,
        |    list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS toks
        |  FROM documents),
        |unp AS (
        |  SELECT doc_id, cjk, nc, 'de' AS lang,
        |    len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','mit','auf','für'])) AS s FROM sc
        |  UNION ALL SELECT doc_id, cjk, nc, 'en',
        |    len(list_intersect(toks, ['the','a','and','of','to','in','is','it','that','for'])) FROM sc
        |  UNION ALL SELECT doc_id, cjk, nc, 'es',
        |    len(list_intersect(toks, ['el','la','los','y','es','un','una','en','por','para'])) FROM sc
        |  UNION ALL SELECT doc_id, cjk, nc, 'fr',
        |    len(list_intersect(toks, ['le','la','les','et','est','un','une','dans','pour','que'])) FROM sc),
        |best AS (
        |  SELECT doc_id, cjk, nc, lang, s,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang DESC) AS rn
        |  FROM unp)
        |SELECT CASE WHEN cjk * 2 > nc THEN 'zh'
        |            WHEN s = 0 THEN 'und'
        |            ELSE lang END AS lang_pred,
        |       count(*) AS n
        |FROM best WHERE rn = 1 GROUP BY 1 ORDER BY lang_pred""".stripMargin.trim,

    "q_quality_score" ->
      """
        |WITH m AS (
        |  SELECT doc_id, text,
        |    len(text) AS n_chars,
        |    len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_words,
        |    (len(text) - len(regexp_replace(text, '[^\w\s]', '', 'g')))::double / len(text) AS punct_ratio,
        |    (len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))::double / len(text) AS digit_ratio,
        |    len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')))::double
        |      / len(regexp_split_to_array(trim(lower(text)), '\s+')) AS uniq_word_ratio
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id, n_chars, n_words,
        |  round(punct_ratio, 6) AS punct_ratio,
        |  round(uniq_word_ratio, 6) AS uniq_word_ratio,
        |  round(least(n_words / 50.0, 1.0) * 0.4
        |      + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.2
        |      + (1.0 - least(digit_ratio * 5.0, 1.0)) * 0.2
        |      + least(uniq_word_ratio * 2.0, 1.0) * 0.2, 6) AS quality
        |FROM m ORDER BY doc_id""".stripMargin.trim,

    // Gopher rule battery (round 17): the same re-lining + injections
    // as the Spark query, every rule's violation census in DuckDB list
    // arithmetic
    "q_gopher_rules" ->
      """
        |WITH d AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '((\S+ ){6}\S+) ', '\1' || chr(10), 'g') AS t0
        |  FROM documents),
        |d2 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 7 = 0
        |    THEN '- one' || chr(10) || '* two' || chr(10) || '- three' || chr(10) || t0
        |    ELSE t0 END AS t1 FROM d),
        |d3 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 11 = 0
        |    THEN t1 || chr(10) || 'to be continued...'
        |    ELSE t1 END AS t2a FROM d2),
        |d4 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 13 = 0
        |    THEN t2a || ' ### ### ### ### ### ### ### ###'
        |    ELSE t2a END AS t2 FROM d3),
        |m AS (
        |  SELECT doc_id, t2,
        |    regexp_split_to_array(trim(t2), '\s+') AS ws,
        |    string_split(t2, chr(10)) AS lines
        |  FROM d4),
        |r AS (
        |  SELECT doc_id,
        |    len(ws) AS n_words,
        |    list_sum(list_transform(ws, w -> len(w)))::DOUBLE / len(ws) AS mwl,
        |    ((len(t2) - len(replace(t2, '#', '')))
        |      + (len(t2) - len(replace(t2, '...', ''))) / 3)::DOUBLE
        |      / len(ws) AS symbol_ratio,
        |    len(list_filter(lines, ln -> regexp_matches(ln, '^\s*[-*•]')))::DOUBLE
        |      / len(lines) AS bullet_ratio,
        |    len(list_filter(lines, ln -> regexp_matches(ln, '\.\.\.\s*$')))::DOUBLE
        |      / len(lines) AS ellipsis_ratio,
        |    len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
        |      / len(ws) AS alpha_ratio,
        |    (list_contains(list_transform(ws, w -> lower(w)), 'the')::INT
        |     + list_contains(list_transform(ws, w -> lower(w)), 'be')::INT
        |     + list_contains(list_transform(ws, w -> lower(w)), 'to')::INT
        |     + list_contains(list_transform(ws, w -> lower(w)), 'of')::INT
        |     + list_contains(list_transform(ws, w -> lower(w)), 'and')::INT
        |     + list_contains(list_transform(ws, w -> lower(w)), 'that')::INT
        |     + list_contains(list_transform(ws, w -> lower(w)), 'have')::INT
        |     + list_contains(list_transform(ws, w -> lower(w)), 'with')::INT
        |    ) AS stop_hits
        |  FROM m),
        |f AS (
        |  SELECT *,
        |    (n_words >= 20 AND n_words <= 100000) AS g_word_count,
        |    (mwl >= 3.0 AND mwl <= 10.0) AS g_word_len,
        |    (symbol_ratio <= 0.1) AS g_symbols,
        |    (bullet_ratio <= 0.9) AS g_bullets,
        |    (ellipsis_ratio <= 0.3) AS g_ellipsis,
        |    (alpha_ratio >= 0.8) AS g_alpha,
        |    (stop_hits >= 2) AS g_stops
        |  FROM r)
        |SELECT count(*) AS n_docs,
        |  sum(CASE WHEN NOT g_word_count THEN 1 ELSE 0 END)::BIGINT AS f_word_count,
        |  sum(CASE WHEN NOT g_word_len THEN 1 ELSE 0 END)::BIGINT AS f_word_len,
        |  sum(CASE WHEN NOT g_symbols THEN 1 ELSE 0 END)::BIGINT AS f_symbols,
        |  sum(CASE WHEN NOT g_bullets THEN 1 ELSE 0 END)::BIGINT AS f_bullets,
        |  sum(CASE WHEN NOT g_ellipsis THEN 1 ELSE 0 END)::BIGINT AS f_ellipsis,
        |  sum(CASE WHEN NOT g_alpha THEN 1 ELSE 0 END)::BIGINT AS f_alpha,
        |  sum(CASE WHEN NOT g_stops THEN 1 ELSE 0 END)::BIGINT AS f_stops,
        |  sum(CASE WHEN g_word_count AND g_word_len AND g_symbols AND
        |    g_bullets AND g_ellipsis AND g_alpha AND g_stops
        |    THEN 1 ELSE 0 END)::BIGINT AS n_keep,
        |  round(sum(mwl), 4) AS sum_mwl
        |FROM f""".stripMargin.trim,

    // Gopher REPETITION battery (round 17): dup-line fractions + top
    // 2/3/4-gram char fractions (count >= 2 convention, longest
    // tie-break) recomputed per doc in DuckDB list arithmetic
    "q_gopher_repetition" ->
      """
        |WITH d AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '((\S+ ){6}\S+) ', '\1' || chr(10), 'g') AS t0
        |  FROM documents),
        |d2 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 7 = 0
        |    THEN 'copy this line now' || chr(10) || 'copy this line now'
        |      || chr(10) || 'copy this line now' || chr(10) || t0
        |    ELSE t0 END AS t1 FROM d),
        |d3 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 11 = 0
        |    THEN t1 || chr(10) || repeat('the cat ', 14) || 'the cat'
        |    ELSE t1 END AS t2 FROM d2),
        |base AS (
        |  SELECT doc_id, t2,
        |    regexp_split_to_array(trim(t2), '\s+') AS ws,
        |    len(array_to_string(regexp_split_to_array(trim(t2), '\s+'), ' '))
        |      AS tot
        |  FROM d3),
        |ld AS (
        |  SELECT doc_id,
        |    (sum(c) - count(*))::DOUBLE / sum(c) AS dlf,
        |    sum((c - 1) * ll)::DOUBLE / sum(c * ll) AS dlcf
        |  FROM (SELECT doc_id, line, count(*) AS c, len(line) AS ll
        |        FROM (SELECT doc_id, unnest(string_split(t2, chr(10))) AS line
        |              FROM d3)
        |        GROUP BY doc_id, line)
        |  GROUP BY doc_id),
        |c2 AS (SELECT doc_id, g, count(*) AS cnt FROM (
        |  SELECT doc_id, unnest(list_transform(range(len(ws) - 1),
        |    i -> ws[i+1] || ' ' || ws[i+2])) AS g FROM base) GROUP BY 1, 2),
        |c3 AS (SELECT doc_id, g, count(*) AS cnt FROM (
        |  SELECT doc_id, unnest(list_transform(range(len(ws) - 2),
        |    i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS g
        |  FROM base) GROUP BY 1, 2),
        |c4 AS (SELECT doc_id, g, count(*) AS cnt FROM (
        |  SELECT doc_id, unnest(list_transform(range(len(ws) - 3),
        |    i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]))
        |    AS g FROM base) GROUP BY 1, 2),
        |f2 AS (SELECT b.doc_id,
        |    CASE WHEN m.mc < 2 THEN 0.0
        |         ELSE (m.mc * x.ml)::DOUBLE / b.tot END AS frac
        |  FROM base b
        |  JOIN (SELECT doc_id, max(cnt) AS mc FROM c2 GROUP BY 1) m
        |    USING (doc_id)
        |  JOIN (SELECT c2.doc_id, max(len(g)) AS ml FROM c2
        |        JOIN (SELECT doc_id, max(cnt) AS mc FROM c2 GROUP BY 1) mm
        |          USING (doc_id)
        |        WHERE c2.cnt = mm.mc GROUP BY c2.doc_id) x USING (doc_id)),
        |f3 AS (SELECT b.doc_id,
        |    CASE WHEN m.mc < 2 THEN 0.0
        |         ELSE (m.mc * x.ml)::DOUBLE / b.tot END AS frac
        |  FROM base b
        |  JOIN (SELECT doc_id, max(cnt) AS mc FROM c3 GROUP BY 1) m
        |    USING (doc_id)
        |  JOIN (SELECT c3.doc_id, max(len(g)) AS ml FROM c3
        |        JOIN (SELECT doc_id, max(cnt) AS mc FROM c3 GROUP BY 1) mm
        |          USING (doc_id)
        |        WHERE c3.cnt = mm.mc GROUP BY c3.doc_id) x USING (doc_id)),
        |f4 AS (SELECT b.doc_id,
        |    CASE WHEN m.mc < 2 THEN 0.0
        |         ELSE (m.mc * x.ml)::DOUBLE / b.tot END AS frac
        |  FROM base b
        |  JOIN (SELECT doc_id, max(cnt) AS mc FROM c4 GROUP BY 1) m
        |    USING (doc_id)
        |  JOIN (SELECT c4.doc_id, max(len(g)) AS ml FROM c4
        |        JOIN (SELECT doc_id, max(cnt) AS mc FROM c4 GROUP BY 1) mm
        |          USING (doc_id)
        |        WHERE c4.cnt = mm.mc GROUP BY c4.doc_id) x USING (doc_id)),
        |j AS (
        |  -- LEFT joins: a doc with < 2/3/4 words has no c2/c3/c4 rows,
        |  -- and the Spark kernel scores it 0.0 and KEEPS it — so the
        |  -- oracle census must not drop it (n_docs stays the full count)
        |  SELECT ld.doc_id, ld.dlf, ld.dlcf,
        |    coalesce(f2.frac, 0.0) AS t2f,
        |    coalesce(f3.frac, 0.0) AS t3f,
        |    coalesce(f4.frac, 0.0) AS t4f
        |  FROM ld LEFT JOIN f2 USING (doc_id) LEFT JOIN f3 USING (doc_id)
        |    LEFT JOIN f4 USING (doc_id))
        |SELECT count(*) AS n_docs,
        |  sum(CASE WHEN dlf > 0.3::DOUBLE THEN 1 ELSE 0 END)::BIGINT
        |    AS f_dup_line,
        |  sum(CASE WHEN dlcf > 0.2::DOUBLE THEN 1 ELSE 0 END)::BIGINT
        |    AS f_dup_line_char,
        |  sum(CASE WHEN t2f > 0.2::DOUBLE THEN 1 ELSE 0 END)::BIGINT
        |    AS f_top2,
        |  sum(CASE WHEN t3f > 0.18::DOUBLE THEN 1 ELSE 0 END)::BIGINT
        |    AS f_top3,
        |  sum(CASE WHEN t4f > 0.16::DOUBLE THEN 1 ELSE 0 END)::BIGINT
        |    AS f_top4,
        |  round(sum(dlf), 4) AS sum_dlf,
        |  round(sum(t2f), 4) AS sum_top2
        |FROM j""".stripMargin.trim,

    // C4 filter battery (round 17): same re-lining + injections; the
    // kept-line/sentence census and page drops in DuckDB
    "q_c4_filters" ->
      """
        |WITH d AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '((\S+ ){6}\S+) ', '\1.' || chr(10), 'g')
        |      || '.' || chr(10) || 'too short.' AS t0
        |  FROM documents),
        |d2 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 7 = 0
        |    THEN t0 || chr(10) || 'braces are code { nope.'
        |    ELSE t0 END AS t1 FROM d),
        |d3 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 11 = 0
        |    THEN t1 || chr(10) || 'this page is Lorem Ipsum filler text.'
        |    ELSE t1 END AS t2a FROM d2),
        |d4 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 13 = 0
        |    THEN t2a || chr(10) || 'enable JavaScript to view this page.'
        |    ELSE t2a END AS t2 FROM d3),
        |m AS (
        |  SELECT doc_id, t2,
        |    list_filter(string_split(t2, chr(10)), ln ->
        |      regexp_matches(ln, '[.!?"]\s*$')
        |      AND len(regexp_split_to_array(trim(ln), '\s+')) >= 5
        |      AND NOT contains(lower(ln), 'javascript')) AS kept
        |  FROM d4),
        |r AS (
        |  SELECT doc_id,
        |    len(kept) AS n_kept_lines,
        |    list_sum(list_transform(kept, ln ->
        |      len(ln) - len(regexp_replace(ln, '[.!?]', '', 'g'))))
        |      AS n_sentences0,
        |    contains(lower(t2), 'lorem ipsum') AS c4_lorem,
        |    contains(t2, '{') AS c4_brace
        |  FROM m),
        |f AS (
        |  SELECT doc_id, n_kept_lines,
        |    coalesce(n_sentences0, 0) AS n_sentences, c4_lorem, c4_brace,
        |    (coalesce(n_sentences0, 0) >= 3 AND NOT c4_lorem AND NOT c4_brace)
        |      AS c4_keep
        |  FROM r)
        |SELECT count(*) AS n_docs,
        |  sum(CASE WHEN c4_keep THEN 1 ELSE 0 END)::BIGINT AS n_keep,
        |  sum(n_kept_lines)::BIGINT AS kept_lines,
        |  sum(n_sentences)::BIGINT AS sentences,
        |  sum(CASE WHEN c4_lorem THEN 1 ELSE 0 END)::BIGINT AS n_lorem,
        |  sum(CASE WHEN c4_brace THEN 1 ELSE 0 END)::BIGINT AS n_brace
        |FROM f""".stripMargin.trim,

    "q_token_count" ->
      """
        |SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS re_tokens
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin.trim,

    "q_fingerprint" ->
      """
        |SELECT doc_id,
        |  list_aggregate(list_transform(generate_series(1, greatest(len(text) - 7, 1)),
        |    i -> md5(substr(text, i, 8))), 'min') AS fingerprint
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin.trim,

    "q_winnow" ->
      """
        |WITH gh AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, greatest(len(text) - 7, 1)),
        |      i -> md5(substr(text, i, 8))) AS gh
        |  FROM documents WHERE doc_id < 20),
        |wins AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(0, greatest(len(gh) - 4, 0)),
        |      i -> list_aggregate(list_slice(gh, i + 1, i + 4), 'min'))) AS fps
        |  FROM gh)
        |SELECT doc_id, unnest(fps) AS fp FROM wins ORDER BY doc_id, fp""".stripMargin.trim,

    // index-probe incremental dedup: original docs are the index, the
    // shortened copies the new batch; candidates from the band-bucket
    // join, similarity = fraction of agreeing minhash signatures
    "q_dedup_incremental" ->
      """
        |WITH idocs AS (SELECT doc_id AS id, text FROM documents),
        |ndocs AS (
        |  SELECT doc_id + 100000 AS id,
        |         array_to_string(list_slice(w, 1, len(w) - 5), ' ') AS text
        |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') w FROM documents)),
        |ish AS (
        |  SELECT id, list_transform(generate_series(0, greatest(len(w) - 3, 0)),
        |           i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) AS shingles
        |  FROM (SELECT id, string_split(lower(trim(text)), ' ') w FROM idocs)),
        |nsh AS (
        |  SELECT id, list_transform(generate_series(0, greatest(len(w) - 3, 0)),
        |           i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) AS shingles
        |  FROM (SELECT id, string_split(lower(trim(text)), ' ') w FROM ndocs)),
        |imh AS (
        |  SELECT id, s, min(md5(s::varchar || '|' || u.sh2)) AS sig
        |  FROM ish, generate_series(0, 11) AS g(s), unnest(ish.shingles) AS u(sh2)
        |  GROUP BY id, s),
        |nmh AS (
        |  SELECT id, s, min(md5(s::varchar || '|' || u.sh2)) AS sig
        |  FROM nsh, generate_series(0, 11) AS g(s), unnest(nsh.shingles) AS u(sh2)
        |  GROUP BY id, s),
        |isv AS (SELECT id, array_agg(sig ORDER BY s) AS sigs FROM imh GROUP BY id),
        |nsv AS (SELECT id, array_agg(sig ORDER BY s) AS sigs FROM nmh GROUP BY id),
        |ibd AS (
        |  SELECT id, b, md5(sigs[b*3+1] || ',' || sigs[b*3+2] || ',' || sigs[b*3+3]) AS bucket
        |  FROM isv, generate_series(0, 3) AS g(b)),
        |nbd AS (
        |  SELECT id, b, md5(sigs[b*3+1] || ',' || sigs[b*3+2] || ',' || sigs[b*3+3]) AS bucket
        |  FROM nsv, generate_series(0, 3) AS g(b)),
        |cand AS (
        |  SELECT DISTINCT n.id AS new_id, i.id AS index_id
        |  FROM nbd n JOIN ibd i ON n.b = i.b AND n.bucket = i.bucket
        |  WHERE n.id <> i.id),
        |est AS (
        |  SELECT new_id, index_id,
        |    list_sum(list_transform(generate_series(1, 12),
        |      k -> CASE WHEN a.sigs[k] = b.sigs[k] THEN 1.0 ELSE 0.0 END)) / 12
        |      AS ej
        |  FROM cand JOIN nsv a ON cand.new_id = a.id
        |            JOIN isv b ON cand.index_id = b.id)
        |SELECT new_id, index_id, round(ej, 4) AS est_jaccard
        |FROM est WHERE ej >= 0.5 ORDER BY new_id, index_id""".stripMargin.trim,

    "q_dedup_cluster" ->
      s"""$nearDupClusterCte
        |SELECT id AS doc_id, min(r) AS cluster_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin.trim,

    // star-contraction CC computes the SAME min-reachable-id labels on
    // the same pair graph — one reachability oracle covers both
    "q_cc_star" ->
      s"""$nearDupClusterCte
        |SELECT id AS doc_id, min(r) AS cluster_id
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin.trim,

    // leakage-safe split over the same near-dup graph: cluster label =
    // min reachable id (singletons = own id), Knuth-hash thresholds
    // round(0.8*2^32)=3435973837, round(0.9*2^32)=3865470566
    "q_split_leakage" ->
      s"""$nearDupClusterCte,
        |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
        |alld AS (SELECT d.id, coalesce(cl.cluster_id, d.id) AS cluster_id
        |         FROM (SELECT id FROM docs) d LEFT JOIN cl USING (id)),
        |h AS (SELECT id AS doc_id, cluster_id,
        |        ((cluster_id % 2147483648) * 2654435761) % 4294967296 AS b
        |      FROM alld)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN b < 3435973837 THEN 'train'
        |       WHEN b < 3865470566 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM h ORDER BY doc_id""".stripMargin.trim,

    // keeper election over the same clusters: highest score wins, ties
    // to the smallest id — exactly Dedup.keeperTable's
    // max(struct(score, -id)) with score = length(text)
    "q_keeper_table" ->
      s"""$nearDupClusterCte,
        |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
        |sc AS (SELECT id, length(text)::DOUBLE AS s FROM docs),
        |kp AS (
        |  SELECT cluster_id, id AS keeper_id FROM (
        |    SELECT cl.cluster_id, cl.id,
        |           row_number() OVER (PARTITION BY cl.cluster_id
        |                              ORDER BY sc.s DESC, cl.id) AS rn
        |    FROM cl JOIN sc USING (id)) WHERE rn = 1)
        |SELECT cl.id AS doc_id, cl.cluster_id, kp.keeper_id,
        |       cl.id = kp.keeper_id AS keep
        |FROM cl JOIN kp USING (cluster_id) ORDER BY doc_id""".stripMargin.trim,

    "q_boilerplate" ->
      """
        |WITH injected AS (
        |  SELECT doc_id,
        |    'SUBSCRIBE TO OUR NEWSLETTER' || chr(10) || text || chr(10)
        |      || 'COPYRIGHT 2024 EXAMPLE CORP' AS text
        |  FROM documents WHERE doc_id < 300),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS la FROM injected),
        |bset AS (
        |  SELECT coalesce(array_agg(line), []) AS bl FROM (
        |    SELECT line FROM (SELECT doc_id, unnest(la) AS line FROM ls) u
        |    GROUP BY line HAVING count(DISTINCT doc_id) >= 50)),
        |rebuilt AS (
        |  SELECT doc_id, la,
        |         list_filter(la, x -> NOT list_contains(b.bl, x)) AS kept
        |  FROM ls, bset b)
        |SELECT doc_id,
        |       md5(array_to_string(kept, chr(10))) AS clean_hash,
        |       len(la) AS n_lines,
        |       len(la) - len(kept) AS n_removed_lines
        |FROM rebuilt ORDER BY doc_id""".stripMargin.trim,

    "q_sample_strat" ->
      """
        |SELECT l_orderkey, l_linenumber, l_returnflag
        |FROM lineitem
        |WHERE (((l_orderkey * 100 + l_linenumber) % 2147483648) * 2654435761)
        |        % 4294967296
        |      < CASE l_returnflag
        |          WHEN 'A' THEN 429496730 WHEN 'N' THEN 1073741824
        |          WHEN 'R' THEN 214748365 ELSE -1 END
        |ORDER BY l_orderkey, l_linenumber""".stripMargin.trim,

    "q_domain_stats" ->
      """
        |WITH injected AS (
        |  SELECT doc_id, text || ' see https://Site' || (doc_id % 20)::varchar
        |    || '.example.org/p' || doc_id::varchar
        |    || ' or http://www.ref' || (doc_id % 7)::varchar || '.net/x' AS text
        |  FROM documents WHERE doc_id < 300),
        |urls AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^\s]+')) AS url
        |  FROM injected),
        |dom AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(regexp_extract(url, 'https?://([^/\s]+)', 1)),
        |      '^www\.', '') AS domain
        |  FROM urls)
        |SELECT domain, count(DISTINCT doc_id) AS n_docs, count(*) AS n_urls
        |FROM dom GROUP BY domain ORDER BY domain""".stripMargin.trim,

    "q_pack_chunks" ->
      """
        |WITH t AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tok,
        |    coalesce(sum(tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
        |  FROM t)
        |SELECT doc_id, tok AS n_tokens, off AS token_offset,
        |       off // 2048 AS chunk_first,
        |       CASE WHEN tok > 0 THEN (off + tok - 1) // 2048
        |            ELSE off // 2048 END AS chunk_last
        |FROM c ORDER BY doc_id""".stripMargin.trim,

    "q_lm_score" ->
      """
        |WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') ws
        |           FROM documents),
        |bg AS (SELECT doc_id,
        |         unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
        |           i -> ws[i] || ' ' || ws[i + 1])) AS b
        |       FROM w),
        |c2 AS (SELECT b, count(*)::double AS c2 FROM bg GROUP BY b),
        |c1 AS (SELECT split_part(b, ' ', 1) AS w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
        |v AS (SELECT count(DISTINCT u)::double AS v
        |      FROM (SELECT unnest(ws) AS u FROM w)),
        |sc AS (SELECT bg.doc_id,
        |         ln((coalesce(c2.c2, 0) + 1) / (coalesce(c1.c1, 0) + v.v)) AS lp
        |       FROM bg
        |       LEFT JOIN c2 USING (b)
        |       LEFT JOIN c1 ON split_part(bg.b, ' ', 1) = c1.w1, v
        |       WHERE bg.doc_id < 200)
        |SELECT doc_id, count(*) AS n_bigrams, round(avg(-lp), 6) AS nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin.trim,

    "q_vocab" ->
      """
        |SELECT w AS word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |      FROM documents)
        |GROUP BY w ORDER BY word""".stripMargin.trim,

    "q_bm25" ->
      """
        |WITH n AS (SELECT count(*)::double AS n FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |dlen AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY doc_id),
        |al AS (SELECT avg(dl) AS avgl FROM dlen),
        |tf AS (SELECT doc_id, w, count(*)::double AS tf FROM toks
        |       WHERE w IN ('spark', 'query', 'stream') GROUP BY doc_id, w),
        |dfreq AS (SELECT w, count(*)::double AS df FROM tf GROUP BY w),
        |sc AS (
        |  SELECT tf.doc_id,
        |    ln(1.0 + (n.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) * tf.tf * 2.2
        |      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dlen.dl / al.avgl)) AS s
        |  FROM tf JOIN dfreq ON tf.w = dfreq.w
        |          JOIN dlen ON tf.doc_id = dlen.doc_id, n, al)
        |SELECT doc_id, round(sum(s), 6) AS bm25
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin.trim,

    "q_sample_weighted" ->
      """
        |WITH tot AS (SELECT sum(n_chars)::HUGEINT AS t FROM documents)
        |SELECT doc_id, n_chars FROM documents, tot
        |WHERE n_chars > 0
        |  AND ((((doc_id % 2147483648) * 2654435761) % 4294967296) + 1)::HUGEINT * t
        |      <= 1717986918400::HUGEINT * n_chars::HUGEINT
        |ORDER BY doc_id""".stripMargin.trim,

    "q_rrf_fusion" ->
      """
        |WITH n AS (SELECT count(*)::double AS n FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |dlen AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY doc_id),
        |al AS (SELECT avg(dl) AS avgl FROM dlen),
        |tf AS (SELECT doc_id, w, count(*)::double AS tf FROM toks
        |       WHERE w IN ('spark', 'query', 'stream') GROUP BY doc_id, w),
        |dfreq AS (SELECT w, count(*)::double AS df FROM tf GROUP BY w),
        |sc AS (
        |  SELECT tf.doc_id,
        |    ln(1.0 + (n.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) * tf.tf * 2.2
        |      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dlen.dl / al.avgl)) AS s
        |  FROM tf JOIN dfreq ON tf.w = dfreq.w
        |          JOIN dlen ON tf.doc_id = dlen.doc_id, n, al),
        |bm AS (SELECT doc_id, round(sum(s), 6) AS s FROM sc GROUP BY doc_id),
        |lex AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
        |  FROM bm QUALIFY r <= 20),
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
        |sem AS (
        |  SELECT vec_id AS doc_id,
        |         row_number() OVER (ORDER BY list_cosine_similarity(qv, embedding::DOUBLE[]) DESC,
        |                            vec_id) AS r
        |  FROM embeddings, q WHERE vec_id != 7 QUALIFY r <= 20),
        |u AS (SELECT doc_id, r FROM lex UNION ALL SELECT doc_id, r FROM sem),
        |f AS (SELECT doc_id, sum(1.0 / (60 + r)) AS rrf, count(*) AS n_rankers
        |      FROM u GROUP BY doc_id)
        |SELECT 7 AS query_id, doc_id, round(rrf, 6) AS rrf, n_rankers,
        |       row_number() OVER (ORDER BY rrf DESC, doc_id) AS fused_rank
        |FROM f QUALIFY fused_rank <= 10 ORDER BY fused_rank""".stripMargin.trim,

    "q_embed_centroid" ->
      """
        |WITH x AS (
        |  SELECT label, g.x AS pos,
        |         CAST(floor(embedding[g.x + 1]::DOUBLE * 1048576.0) AS BIGINT) AS iv
        |  FROM embeddings, generate_series(0, 63) g(x)
        |  WHERE embedding IS NOT NULL),
        |a AS (SELECT label, pos, sum(iv) AS s, count(*) AS n
        |      FROM x GROUP BY label, pos)
        |SELECT label, pos, round(s::DOUBLE / (n::DOUBLE * 1048576.0), 6) AS mean
        |FROM a ORDER BY label, pos""".stripMargin.trim,

    "q_hard_negatives" ->
      """
        |WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (
        |  SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cos,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rank
        |  FROM q, c WHERE query_id != neighbor_id QUALIFY rank <= 15),
        |pos AS (
        |  SELECT g.x AS query_id, (g.x * 7 + 3) % 100 AS neighbor_id FROM generate_series(0, 4) g(x)
        |  UNION ALL
        |  SELECT g.x, (g.x * 13 + 11) % 100 FROM generate_series(0, 4) g(x)),
        |surv AS (
        |  SELECT s.* FROM s ANTI JOIN pos
        |    ON s.query_id = pos.query_id AND s.neighbor_id = pos.neighbor_id),
        |rr AS (
        |  SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id ORDER BY rank) AS neg_rank
        |  FROM surv QUALIFY neg_rank <= 8)
        |SELECT query_id, neg_rank, neighbor_id, round(cos, 4) AS cos
        |FROM rr ORDER BY query_id, neg_rank""".stripMargin.trim,

    "q_quantiles" ->
      """
        |SELECT u.q, round(u.v, 4) AS value FROM (
        |  SELECT unnest([0.25, 0.5, 0.75, 0.99]) AS q,
        |         unnest(quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.99])) AS v
        |  FROM lineitem) u
        |ORDER BY q""".stripMargin.trim,

    "q_quantiles_approx" ->
      """
        |SELECT u.q, round(u.v, 4) AS value FROM (
        |  SELECT unnest([0.25, 0.5, 0.75, 0.99]) AS q,
        |         unnest(quantile_disc(l_extendedprice, [0.25, 0.5, 0.75, 0.99])::DOUBLE[]) AS v
        |  FROM lineitem) u
        |ORDER BY q""".stripMargin.trim,

    "q_asof_join" ->
      """
        |WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |e AS (SELECT user_id, ts, value FROM events WHERE event_type = 'error')
        |SELECT c.event_id, c.user_id, c.ts, e.ts AS err_ts,
        |       round(e.value, 4) + 0 AS err_value
        |FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.ts >= e.ts
        |ORDER BY c.event_id""".stripMargin.trim,

    "q_multimodal_embed" ->
      """
        |WITH base AS (SELECT doc_id, md5(text) AS b
        |              FROM documents WHERE doc_id < 50),
        |f AS (SELECT doc_id, g.j, md5(g.j::varchar || '|' || b) AS h
        |      FROM base, generate_series(0, 7) AS g(j)),
        |vals AS (SELECT doc_id, j,
        |  list_aggregate(list_transform(generate_series(1, 8),
        |    i -> (strpos('0123456789abcdef', substr(h, i, 1)) - 1)::BIGINT
        |           * (1::BIGINT << (4 * (8 - i)))), 'sum') / 4294967296.0 AS v
        |  FROM f)
        |SELECT doc_id, cast(j AS INT) AS j, round(v, 6) AS value
        |FROM vals ORDER BY doc_id, j""".stripMargin.trim,

    "q_multimodal_meta" ->
      """
        |SELECT doc_id, octet_length(text::blob) AS byte_len,
        |  64 + (octet_length(text::blob) % 577) AS width,
        |  64 + ((octet_length(text::blob) * 31) % 353) AS height,
        |  'png' AS format
        |FROM documents ORDER BY doc_id""".stripMargin.trim,

    "q_tfidf" ->
      """
        |WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        |tok AS (SELECT doc_id,
        |          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        |        FROM d),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1
        |        HAVING count(*) >= 2),
        |n AS (SELECT count(*)::DOUBLE AS nd FROM d)
        |SELECT doc_id, term, tf, df, round(tf * ln(nd / df), 6) AS tfidf
        |FROM tf JOIN dfq USING (term), n
        |ORDER BY doc_id, term""".stripMargin.trim,

    // ranking runs on the 6-dp-rounded quality with a doc_id tiebreak,
    // so row_number agrees across engines
    "q_group_topk" ->
      """
        |WITH m AS (
        |  SELECT doc_id, lang,
        |    round(least(len(regexp_split_to_array(trim(lower(text)), '\s+')) / 50.0, 1.0) * 0.4
        |      + (1.0 - least((len(text) - len(regexp_replace(text, '[^\w\s]', '', 'g')))::double / len(text) * 5.0, 1.0)) * 0.2
        |      + (1.0 - least((len(text) - len(regexp_replace(text, '[0-9]', '', 'g')))::double / len(text) * 5.0, 1.0)) * 0.2
        |      + least(len(list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')))::double
        |          / len(regexp_split_to_array(trim(lower(text)), '\s+')) * 2.0, 1.0) * 0.2, 6) AS quality
        |  FROM documents),
        |r AS (SELECT lang, doc_id, quality,
        |        row_number() OVER (PARTITION BY lang
        |                           ORDER BY quality DESC, doc_id) AS rank
        |      FROM m)
        |SELECT lang, cast(rank AS INT) AS rank, doc_id, quality
        |FROM r WHERE rank <= 3 ORDER BY lang, rank""".stripMargin.trim,

    // cumulative per-side counts are exact integers, so the running
    // ECDF gap is bit-identical to the Spark two-pass rank kernel
    // CvM: per-value gap numerators and the weighted square sum stay
    // exact integers (HUGEINT here, BigInt in the kernel); ONE double
    // division at the end on both engines
    "q_cvm" ->
      """
        |WITH u AS (SELECT l_extendedprice AS v,
        |                  CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS g
        |           FROM lineitem WHERE l_returnflag IN ('A', 'N')),
        |pv AS (SELECT v, sum(g)::BIGINT AS ca, sum(1 - g)::BIGINT AS cb
        |       FROM u GROUP BY v),
        |n AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM pv),
        |c AS (SELECT ca, cb,
        |        sum(ca) OVER w AS cca, sum(cb) OVER w AS ccb FROM pv
        |      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |                   AND CURRENT ROW)),
        |s AS (SELECT sum((cca * nb - ccb * na)::HUGEINT
        |               * (cca * nb - ccb * na)::HUGEINT
        |               * (ca + cb)::HUGEINT) AS sq,
        |             max(na) AS na, max(nb) AS nb
        |      FROM c, n)
        |SELECT na AS n_a, nb AS n_b,
        |  round(sq::DOUBLE /
        |    (na::HUGEINT * nb::HUGEINT * (na + nb)::HUGEINT
        |     * (na + nb)::HUGEINT)::DOUBLE, 6) AS cvm
        |FROM s""".stripMargin.trim,

    "q_ks_drift" ->
      """
        |WITH u AS (SELECT l_extendedprice AS v,
        |                  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g
        |           FROM lineitem),
        |pv AS (SELECT v, sum(g)::DOUBLE AS ca, sum(1 - g)::DOUBLE AS cb
        |       FROM u GROUP BY v),
        |n AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM pv),
        |c AS (SELECT sum(ca) OVER w AS cca, sum(cb) OVER w AS ccb FROM pv
        |      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |                   AND CURRENT ROW))
        |SELECT round(max(abs(cca/na - ccb/nb)), 6) AS ks,
        |       na::BIGINT AS n_a, nb::BIGINT AS n_b
        |FROM c, n GROUP BY na, nb""".stripMargin.trim,

    // centroid assignment replicates the Scala argmin bit-for-bit: the
    // squared-diff sum runs ascending j in both engines, ties break to
    // the lowest centroid id
    "q_semdedup" ->
      """
        |WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding::DOUBLE[] FROM embeddings WHERE vec_id < 200),
        |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |      FROM embeddings WHERE vec_id < 4),
        |d AS (SELECT e.vec_id, e.v, c.cid,
        |        list_aggregate(list_transform(generate_series(1, 64),
        |          j -> (v[j] - cv[j]) * (v[j] - cv[j])), 'sum') AS dist
        |      FROM e, c),
        |a AS (SELECT vec_id, v, cid FROM
        |        (SELECT *, row_number() OVER (PARTITION BY vec_id
        |                     ORDER BY dist, cid) AS rn FROM d)
        |      WHERE rn = 1)
        |SELECT cast(l.cid AS INT) AS cluster, l.vec_id AS id_a, r.vec_id AS id_b,
        |       round(list_cosine_similarity(l.v, r.v), 4) AS cos
        |FROM a l JOIN a r ON l.cid = r.cid AND l.vec_id < r.vec_id
        |WHERE list_cosine_similarity(l.v, r.v) >= 0.99
        |ORDER BY id_a, id_b""".stripMargin.trim,

    // chunk windows: size 180, overlap 30, stride 150; positive-operand
    // integer division floors identically in both engines
    "q_chunk" ->
      """
        |WITH d AS (SELECT doc_id, text, length(text) AS len
        |           FROM documents WHERE length(text) > 0),
        |n AS (SELECT doc_id, text,
        |        CASE WHEN len <= 30 THEN 1 ELSE (len - 31) // 150 + 1 END AS nc
        |      FROM d),
        |s AS (SELECT doc_id, text, unnest(generate_series(0, nc - 1)) AS i FROM n)
        |SELECT doc_id, cast(i AS INT) AS chunk_id,
        |       cast(i * 150 AS INT) AS chunk_start,
        |       length(substring(text, cast(i * 150 + 1 AS INT), 180))::INT AS chunk_len,
        |       md5(substring(text, cast(i * 150 + 1 AS INT), 180)) AS chunk_md5
        |FROM s
        |ORDER BY doc_id, chunk_id""".stripMargin.trim,

    // integer cents make the rolling sums addition-order-free; epoch is
    // floored to whole seconds exactly like Spark's unix_timestamp
    "q_rolling" ->
      """
        |SELECT event_id,
        |  count(*) OVER wrows AS roll_n,
        |  (sum(cents) OVER wrows)::BIGINT AS roll_cents,
        |  count(*) OVER wrange AS range_n,
        |  (sum(cents) OVER wrange)::BIGINT AS range_cents
        |FROM (SELECT event_id, user_id, ts, floor(epoch(ts))::BIGINT AS sec,
        |             floor(value * 100 + 0.5)::BIGINT AS cents FROM events)
        |WINDOW wrows AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
        |       wrange AS (PARTITION BY user_id ORDER BY sec
        |                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin.trim,

    // the salted join must equal the PLAIN join row-for-row: the oracle
    // is the unsalted query
    "q_skew_join" ->
      """
        |WITH e AS (SELECT CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS k,
        |                  user_id FROM events),
        |c AS (SELECT c_custkey AS k, c_mktsegment FROM customer)
        |SELECT c_mktsegment, count(*) AS n, sum(user_id)::BIGINT AS uid_sum
        |FROM e JOIN c USING (k)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin.trim,

    // latest-wins MERGE: the winning change per key by (o_orderdate,
    // o_orderkey) desc; 'D' deletes, otherwise change values override,
    // unmatched base rows pass through
    "q_cdc_merge" ->
      """
        |WITH ch AS (
        |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 100000
        |              ELSE o_custkey END AS c_custkey,
        |    CASE WHEN o_custkey % 97 = 0 THEN 'D' ELSE 'U' END AS op,
        |    o_orderdate, o_orderkey,
        |    'cdc-' || o_orderkey AS c_name,
        |    CAST(o_orderkey % 25 AS INT) AS c_nationkey,
        |    o_totalprice AS c_acctbal, o_orderpriority AS c_mktsegment
        |  FROM orders),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY c_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM ch) WHERE rn = 1)
        |SELECT coalesce(l.c_custkey, b.c_custkey) AS c_custkey,
        |  CASE WHEN l.op IS NOT NULL THEN l.c_name ELSE b.c_name END AS c_name,
        |  CASE WHEN l.op IS NOT NULL THEN l.c_nationkey
        |       ELSE b.c_nationkey END AS c_nationkey,
        |  CASE WHEN l.op IS NOT NULL THEN l.c_acctbal
        |       ELSE b.c_acctbal END AS c_acctbal,
        |  CASE WHEN l.op IS NOT NULL THEN l.c_mktsegment
        |       ELSE b.c_mktsegment END AS c_mktsegment
        |FROM customer b FULL OUTER JOIN latest l ON b.c_custkey = l.c_custkey
        |WHERE NOT coalesce(l.op = 'D', false)
        |ORDER BY c_custkey""".stripMargin.trim,

    "q_cube" ->
      """
        |SELECT l_returnflag, l_linestatus,
        |       GROUPING(l_returnflag, l_linestatus)::INT AS gid,
        |       count(*) AS n,
        |       sum(CAST(round(l_quantity * 100.0) AS BIGINT))::BIGINT AS sum_qty_cents,
        |       sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::BIGINT AS sum_price_cents
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin.trim,

    // exact integer median/MAD in half- and quarter-cent units: lower+
    // upper middle values from prefix sums over DISTINCT cents per group
    // (mirrors Analytics.madOutliers arithmetic step for step)
    "q_mad_outliers" ->
      """
        |WITH c AS (SELECT o_orderpriority AS g,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |vc AS (SELECT g, v, count(*) AS cnt FROM c GROUP BY g, v),
        |cu AS (SELECT g, v, cnt,
        |         (sum(cnt) OVER (PARTITION BY g ORDER BY v))::BIGINT AS cum,
        |         (sum(cnt) OVER (PARTITION BY g))::BIGINT AS n FROM vc),
        |med AS (SELECT g, max(n) AS n,
        |          min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
        |            + min(CASE WHEN cum >= (n + 2) // 2 THEN v END) AS med2
        |        FROM cu GROUP BY g),
        |dv AS (SELECT vc.g, abs(2 * vc.v - m.med2) AS v, sum(cnt)::BIGINT AS cnt
        |       FROM vc JOIN med m ON vc.g = m.g GROUP BY 1, 2),
        |cu2 AS (SELECT g, v, cnt,
        |          (sum(cnt) OVER (PARTITION BY g ORDER BY v))::BIGINT AS cum,
        |          (sum(cnt) OVER (PARTITION BY g))::BIGINT AS n FROM dv),
        |mad AS (SELECT g,
        |          min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
        |            + min(CASE WHEN cum >= (n + 2) // 2 THEN v END) AS mad4
        |        FROM cu2 GROUP BY g),
        |outl AS (SELECT dv.g,
        |           sum(CASE WHEN 2 * dv.v > 3 * mad.mad4 THEN cnt
        |               ELSE 0 END)::BIGINT AS n_outliers
        |         FROM dv JOIN mad ON dv.g = mad.g GROUP BY dv.g)
        |SELECT med.g AS o_orderpriority, med.n, med.med2 / 2.0 AS median,
        |       mad.mad4 / 4.0 AS mad, outl.n_outliers
        |FROM med JOIN mad ON med.g = mad.g JOIN outl ON med.g = outl.g
        |ORDER BY o_orderpriority""".stripMargin.trim,

    // triangle enumeration over id-ordered canonical edges (a<b<c):
    // the per-node participation counts are orientation-invariant, so
    // the degree-oriented Spark join must reproduce them exactly
    "q_triangle_count" ->
      """
        |WITH pe AS (SELECT DISTINCT l_orderkey AS ok, l_partkey % 997 AS p
        |            FROM lineitem WHERE l_orderkey < 3000),
        |e AS (SELECT DISTINCT x.p AS a, y.p AS b
        |      FROM pe x JOIN pe y ON x.ok = y.ok AND x.p < y.p),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e1.b = e2.a
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |nodes AS (SELECT unnest([x, y, z]) AS id FROM tri)
        |SELECT id, count(*) AS n_triangles FROM nodes
        |GROUP BY id ORDER BY id""".stripMargin.trim,

    // windowed collocation PMI: pair instances are (position, position
    // + o <= 5) equi-matches; marginals are unigram occurrence counts
    "q_cooccur" ->
      """
        |WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok,
        |         unnest(generate_series(0,
        |           len(regexp_split_to_array(lower(trim(text)), '\s+')) - 1)) AS pos
        |  FROM documents),
        |nt AS (SELECT count(*)::DOUBLE AS n FROM tok),
        |uni AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
        |pr AS (SELECT least(a.tok, b.tok) AS tok_a,
        |              greatest(a.tok, b.tok) AS tok_b
        |       FROM tok a
        |       JOIN (SELECT unnest(generate_series(1, 5)) AS o) off ON true
        |       JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + off.o),
        |np AS (SELECT count(*)::DOUBLE AS n FROM pr),
        |pc AS (SELECT tok_a, tok_b, count(*) AS n_pair FROM pr
        |       GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT pc.tok_a, pc.tok_b, pc.n_pair, ua.c AS c_a, ub.c AS c_b,
        |       round(ln((pc.n_pair * (nt.n * nt.n))
        |         / (np.n * (ua.c * ub.c))), 6) AS pmi
        |FROM pc
        |JOIN uni ua ON pc.tok_a = ua.tok
        |JOIN uni ub ON pc.tok_b = ub.tok, nt, np
        |ORDER BY tok_a, tok_b""".stripMargin.trim,

    "q_pos_index" ->
      """
        |WITH d AS (SELECT doc_id,
        |             regexp_split_to_array(lower(trim(text)), '\s+') AS l
        |           FROM documents WHERE doc_id < 100),
        |tok AS (SELECT doc_id, unnest(l) AS token,
        |               unnest(generate_series(1, len(l))) AS pos FROM d),
        |post AS (SELECT token, doc_id, count(*) AS n_occur,
        |                min(pos) AS first_pos FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*) AS df FROM post GROUP BY token
        |          HAVING count(*) >= 3)
        |SELECT token, doc_id, n_occur, first_pos, df
        |FROM post JOIN dfreq USING (token)
        |ORDER BY token, doc_id""".stripMargin.trim,

    // DSIR: same md5-bucketed unigram+bigram features (first 4 md5
    // bytes as an unsigned int, mod 4096), same Laplace-smoothed
    // target/raw bucket distributions, same per-doc log-ratio sum
    "q_dsir_weights" ->
      """
        |WITH w AS (SELECT doc_id, source,
        |             regexp_split_to_array(lower(trim(text)), '\s+') ws
        |           FROM documents),
        |f AS (
        |  SELECT doc_id, source, unnest(ws) AS f FROM w
        |  UNION ALL
        |  SELECT doc_id, source,
        |    unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
        |      i -> ws[i] || ' ' || ws[i + 1]))
        |  FROM w),
        |fb AS (SELECT doc_id, source,
        |         ('0x' || substr(md5(f), 1, 8))::BIGINT % 4096 AS b FROM f),
        |cnt AS (SELECT doc_id, b, count(*)::BIGINT AS c FROM fb GROUP BY 1, 2),
        |tcnt AS (SELECT b, count(*)::double AS tb FROM fb
        |         WHERE source = 'src0' GROUP BY 1),
        |qcnt AS (SELECT b, sum(c)::double AS qb FROM cnt GROUP BY 1),
        |tot AS (SELECT (SELECT coalesce(sum(tb), 0) FROM tcnt) AS tt,
        |               (SELECT coalesce(sum(qb), 0) FROM qcnt) AS qt),
        |sc AS (SELECT cnt.doc_id, sum(cnt.c)::BIGINT AS nf,
        |         sum(cnt.c * (ln((coalesce(tcnt.tb, 0) + 1.0) / (tot.tt + 4096.0))
        |                    - ln((qcnt.qb + 1.0) / (tot.qt + 4096.0)))) AS lw
        |       FROM cnt JOIN qcnt USING (b) LEFT JOIN tcnt USING (b), tot
        |       WHERE cnt.doc_id < 400 GROUP BY cnt.doc_id)
        |SELECT doc_id, nf AS n_feats, round(lw, 6) AS logw
        |FROM sc ORDER BY doc_id""".stripMargin.trim,

    // interpolated Kneser-Ney bigram LM: same discounted/backoff
    // arithmetic (D = 0.75, smoothed continuation probability) over the
    // same bigram counts
    "q_kn_lm" ->
      """
        |WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(lower(trim(text)), '\s+') ws
        |           FROM documents),
        |bg AS (SELECT doc_id,
        |         unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
        |           i -> ws[i] || ' ' || ws[i + 1])) AS b
        |       FROM w),
        |c2 AS (SELECT b, count(*)::double AS c2 FROM bg GROUP BY b),
        |pre AS (SELECT split_part(b, ' ', 1) AS w1, sum(c2) AS c1,
        |               count(*)::double AS n1p FROM c2 GROUP BY 1),
        |cont AS (SELECT split_part(b, ' ', 2) AS w2, count(*)::double AS nc
        |         FROM c2 GROUP BY 1),
        |tv AS (SELECT (SELECT count(*)::double FROM c2) AS types,
        |              (SELECT count(DISTINCT u)::double
        |               FROM (SELECT unnest(ws) AS u FROM w)) AS v),
        |sc AS (SELECT bg.doc_id,
        |         CASE WHEN pre.c1 IS NOT NULL THEN
        |           greatest(coalesce(c2.c2, 0) - 0.75, 0) / pre.c1
        |           + 0.75 * pre.n1p / pre.c1
        |             * ((coalesce(cont.nc, 0) + 0.5) / (tv.types + 0.5 * tv.v))
        |         ELSE (coalesce(cont.nc, 0) + 0.5) / (tv.types + 0.5 * tv.v)
        |         END AS p
        |       FROM bg
        |       LEFT JOIN c2 USING (b)
        |       LEFT JOIN pre ON split_part(bg.b, ' ', 1) = pre.w1
        |       LEFT JOIN cont ON split_part(bg.b, ' ', 2) = cont.w2, tv
        |       WHERE bg.doc_id < 200)
        |SELECT doc_id, count(*) AS n_bigrams, round(avg(-ln(p)), 6) AS nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin.trim,

    // CCNet perplexity bucketing: two add-1 bigram LMs (target = en
    // docs, general = full corpus), fixed nll cutoffs 4.0 / 5.0
    "q_ppl_ratio" ->
      """
        |WITH w AS (SELECT doc_id, lang,
        |             regexp_split_to_array(lower(trim(text)), '\s+') ws
        |           FROM documents),
        |bg AS (SELECT doc_id, lang,
        |         unnest(list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
        |           i -> ws[i] || ' ' || ws[i + 1])) AS b
        |       FROM w),
        |gc2 AS (SELECT b, count(*)::double AS c2 FROM bg GROUP BY b),
        |gc1 AS (SELECT split_part(b, ' ', 1) AS w1, sum(c2) AS c1
        |        FROM gc2 GROUP BY 1),
        |gv AS (SELECT count(DISTINCT u)::double AS v
        |       FROM (SELECT unnest(ws) AS u FROM w)),
        |tc2 AS (SELECT b, count(*)::double AS c2 FROM bg
        |        WHERE lang = 'en' GROUP BY b),
        |tc1 AS (SELECT split_part(b, ' ', 1) AS w1, sum(c2) AS c1
        |        FROM tc2 GROUP BY 1),
        |tv AS (SELECT count(DISTINCT u)::double AS v
        |       FROM (SELECT unnest(ws) AS u FROM w WHERE lang = 'en')),
        |sct AS (SELECT bg.doc_id, count(*) AS nb,
        |          avg(-ln((coalesce(tc2.c2, 0) + 1)
        |            / (coalesce(tc1.c1, 0) + tv.v))) AS nll_t
        |        FROM bg LEFT JOIN tc2 USING (b)
        |          LEFT JOIN tc1 ON split_part(bg.b, ' ', 1) = tc1.w1, tv
        |        WHERE bg.doc_id < 200 GROUP BY bg.doc_id),
        |scg AS (SELECT bg.doc_id,
        |          avg(-ln((coalesce(gc2.c2, 0) + 1)
        |            / (coalesce(gc1.c1, 0) + gv.v))) AS nll_g
        |        FROM bg LEFT JOIN gc2 USING (b)
        |          LEFT JOIN gc1 ON split_part(bg.b, ' ', 1) = gc1.w1, gv
        |        WHERE bg.doc_id < 200 GROUP BY bg.doc_id)
        |SELECT sct.doc_id, sct.nb AS n_bigrams, round(sct.nll_t, 6) AS nll_target,
        |       round(sct.nll_t - scg.nll_g, 6) AS delta,
        |       CASE WHEN sct.nll_t < 4.0 THEN 'head'
        |            WHEN sct.nll_t < 5.0 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM sct JOIN scg USING (doc_id) ORDER BY doc_id""".stripMargin.trim,

    // first-occurrence 4-gram novelty: distinct doc shingles, min doc
    // id per gram, integer counts
    "q_novelty" ->
      """
        |WITH w AS (SELECT doc_id,
        |             regexp_split_to_array(lower(trim(text)), '\s+') ws
        |           FROM documents),
        |g AS (SELECT doc_id,
        |        unnest(list_distinct(list_transform(
        |          generate_series(1, greatest(len(ws) - 3, 0)),
        |          i -> array_to_string(ws[i:i + 3], ' ')))) AS g
        |      FROM w),
        |first AS (SELECT g, min(doc_id) AS f FROM g GROUP BY g),
        |per AS (SELECT g.doc_id, count(*)::BIGINT AS total,
        |          sum(CASE WHEN first.f = g.doc_id THEN 1 ELSE 0 END)::BIGINT AS novel
        |        FROM g JOIN first USING (g) GROUP BY 1)
        |SELECT doc_id, total AS total_grams, novel AS novel_grams,
        |       round(novel::double / total, 6) AS novelty
        |FROM per WHERE doc_id < 300 ORDER BY doc_id""".stripMargin.trim,

    // tokenizer fertility per predicted language: the q_lang_id
    // prediction chain feeding integer token/char sums
    "q_tok_fertility" ->
      """
        |WITH d0 AS (SELECT doc_id,
        |              text || ' v' || (doc_id % 10)::varchar || '.x! 数据' AS text
        |            FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |    len(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
        |    len(text) AS nc,
        |    list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS toks
        |  FROM d0),
        |unp AS (
        |  SELECT doc_id, cjk, nc, 'de' AS lang,
        |    len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','mit','auf','für'])) AS s FROM sc
        |  UNION ALL SELECT doc_id, cjk, nc, 'en',
        |    len(list_intersect(toks, ['the','a','and','of','to','in','is','it','that','for'])) FROM sc
        |  UNION ALL SELECT doc_id, cjk, nc, 'es',
        |    len(list_intersect(toks, ['el','la','los','y','es','un','una','en','por','para'])) FROM sc
        |  UNION ALL SELECT doc_id, cjk, nc, 'fr',
        |    len(list_intersect(toks, ['le','la','les','et','est','un','une','dans','pour','que'])) FROM sc),
        |best AS (
        |  SELECT doc_id, cjk, nc, lang, s,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang DESC) AS rn
        |  FROM unp),
        |lp AS (SELECT doc_id,
        |         CASE WHEN cjk * 2 > nc THEN 'zh'
        |              WHEN s = 0 THEN 'und'
        |              ELSE lang END AS lang_pred
        |       FROM best WHERE rn = 1),
        |m AS (SELECT doc_id,
        |        len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS wsn,
        |        len(regexp_extract_all(lower(text),
        |          '[a-z]+|[0-9]|[^a-z0-9\s]'))::BIGINT AS ren,
        |        len(text)::BIGINT AS nc
        |      FROM d0)
        |SELECT lang_pred, count(*) AS n_docs, sum(wsn)::BIGINT AS ws_tokens,
        |       sum(ren)::BIGINT AS regex_tokens, sum(nc)::BIGINT AS chars,
        |       round(sum(ren)::double / sum(wsn), 6) AS fertility,
        |       round(sum(nc)::double / sum(ren), 6) AS chars_per_token
        |FROM lp JOIN m USING (doc_id)
        |GROUP BY 1 ORDER BY lang_pred""".stripMargin.trim,

    // per-nation scaling: one stats pass (quantile_cont == Spark's
    // interpolating percentile), null for degenerate groups
    "q_feature_scale" ->
      """
        |WITH s AS (SELECT c_nationkey AS g, avg(c_acctbal) AS mean,
        |             stddev_pop(c_acctbal) AS sd, min(c_acctbal) AS mn,
        |             max(c_acctbal) AS mx,
        |             quantile_cont(c_acctbal, 0.25) AS p25,
        |             quantile_cont(c_acctbal, 0.5) AS p50,
        |             quantile_cont(c_acctbal, 0.75) AS p75
        |           FROM customer GROUP BY 1)
        |SELECT c_custkey, c_nationkey, c_acctbal,
        |  round(CASE WHEN sd > 0 THEN (c_acctbal - mean) / sd END, 6) AS z,
        |  round(CASE WHEN mx > mn THEN (c_acctbal - mn) / (mx - mn) END, 6) AS minmax,
        |  round(CASE WHEN p75 > p25 THEN (c_acctbal - p50) / (p75 - p25) END, 6) AS robust
        |FROM customer JOIN s ON c_nationkey = s.g
        |WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin.trim,

    // contamination matrix: train domains (source, docs < 400) x eval
    // sets (lang, docs >= 400), 3-gram overlap >= half the eval doc's
    // distinct grams
    "q_contam_matrix" ->
      """
        |WITH w AS (SELECT doc_id, source, lang,
        |             regexp_split_to_array(lower(trim(text)), '\s+') ws
        |           FROM documents),
        |tg AS (SELECT DISTINCT source AS domain, g
        |       FROM (SELECT source,
        |               unnest(list_transform(
        |                 generate_series(1, greatest(len(ws) - 2, 0)),
        |                 i -> array_to_string(ws[i:i + 2], ' '))) AS g
        |             FROM w WHERE doc_id < 400)),
        |ev AS (SELECT doc_id, lang,
        |         unnest(list_distinct(list_transform(
        |           generate_series(1, greatest(len(ws) - 2, 0)),
        |           i -> array_to_string(ws[i:i + 2], ' ')))) AS g
        |       FROM w WHERE doc_id >= 400),
        |en AS (SELECT doc_id, count(*)::BIGINT AS n FROM ev GROUP BY 1),
        |hits AS (SELECT ev.doc_id, ev.lang, tg.domain, count(*)::BIGINT AS c
        |         FROM ev JOIN tg USING (g) GROUP BY 1, 2, 3),
        |cm AS (SELECT domain, lang, count(*)::BIGINT AS contaminated
        |       FROM hits JOIN en USING (doc_id)
        |       WHERE c::double >= n * 0.5 GROUP BY 1, 2),
        |doms AS (SELECT DISTINCT domain FROM tg),
        |per AS (SELECT lang, count(*)::BIGINT AS n_eval FROM documents
        |        WHERE doc_id >= 400 GROUP BY 1)
        |SELECT doms.domain, per.lang AS eval_set, per.n_eval,
        |       coalesce(cm.contaminated, 0)::BIGINT AS contaminated,
        |       round(coalesce(cm.contaminated, 0)::double / per.n_eval, 6) AS rate
        |FROM doms CROSS JOIN per
        |LEFT JOIN cm ON doms.domain = cm.domain AND per.lang = cm.lang
        |ORDER BY doms.domain, eval_set""".stripMargin.trim,

    // per-doc lexical health: integer counts, FP only in the final
    // ratios/entropy (rounded 6)
    "q_lexical_stats" ->
      """WITH w AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |           FROM documents WHERE doc_id < 300),
        |c AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM w GROUP BY doc_id, w)
        |SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
        |  round(count(*)::DOUBLE / sum(c), 6) AS ttr,
        |  round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS hapax_ratio,
        |  round(ln(sum(c)::DOUBLE) - sum(c::DOUBLE * ln(c::DOUBLE)) / sum(c), 6) AS entropy
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin.trim,

    // corpus Zipf fit: same total order (cnt desc, word) and the same
    // closed-form OLS sums over the top-100 rows
    "q_zipf" ->
      """WITH v AS (SELECT w, count(*)::BIGINT AS cnt
        |           FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |                 FROM documents) GROUP BY w),
        |t AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS r
        |      FROM v ORDER BY cnt DESC, w LIMIT 100),
        |x AS (SELECT ln(r::DOUBLE) AS x, ln(cnt::DOUBLE) AS y FROM t),
        |s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x * y) AS sxy, sum(x * x) AS sxx FROM x)
        |SELECT n::BIGINT AS top_k,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n, 6) AS intercept
        |FROM s""".stripMargin.trim,

    // per-source KL vs the corpus mixture over 1024 md5 buckets —
    // dense grid, Laplace s=1, same md5 bucket id as the Spark kernel
    "q_kl_mix" ->
      """WITH w AS (SELECT source AS slice, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |           FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
        |c AS (SELECT slice, ('0x' || substr(md5(w), 1, 8))::BIGINT % 1024 AS b,
        |             count(*)::BIGINT AS c FROM w GROUP BY slice, b),
        |corpus AS (SELECT b, sum(c)::BIGINT AS cb FROM c GROUP BY b),
        |tot AS (SELECT sum(cb)::BIGINT AS t FROM corpus),
        |st AS (SELECT slice, sum(c)::BIGINT AS n_tokens FROM c GROUP BY slice),
        |grid AS (SELECT st.slice, st.n_tokens, g.b
        |         FROM st CROSS JOIN (SELECT unnest(range(0, 1024)) AS b) g),
        |terms AS (SELECT grid.slice, grid.n_tokens,
        |    (coalesce(c.c, 0)::DOUBLE + 1.0) / (grid.n_tokens::DOUBLE + 1024.0) AS p,
        |    (coalesce(corpus.cb, 0)::DOUBLE + 1.0) / ((SELECT t FROM tot)::DOUBLE + 1024.0) AS q
        |  FROM grid LEFT JOIN c ON grid.slice = c.slice AND grid.b = c.b
        |  LEFT JOIN corpus ON grid.b = corpus.b)
        |SELECT slice, n_tokens, round(sum(p * ln(p / q)), 6) AS kl
        |FROM terms GROUP BY slice, n_tokens ORDER BY slice""".stripMargin.trim,

    // suffix-semantics blocklist: same synthetic URLs, same www-strip,
    // dot-suffix explosion joined against the 3-rule list, longest wins
    "q_domain_filter" ->
      """WITH u AS (SELECT doc_id,
        |    'https://' || (CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN 'ads.'
        |                   WHEN 2 THEN 'cdn.media.' ELSE 'www.' END)
        |      || 'site' || (doc_id % 5) || '.example' || (doc_id % 3)
        |      || '.org/p' || doc_id AS url
        |  FROM documents WHERE doc_id < 400),
        |d AS (SELECT doc_id, regexp_replace(lower(regexp_extract(url, 'https?://([^/\s]+)', 1)),
        |                                    '^www\.', '') AS domain FROM u),
        |sfx AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(parts)),
        |          i -> array_to_string(list_slice(parts, i, len(parts)), '.'))) AS sfx
        |        FROM (SELECT doc_id, string_split(domain, '.') AS parts FROM d)),
        |m AS (SELECT doc_id, sfx,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY length(sfx) DESC, sfx DESC) AS rn
        |      FROM sfx
        |      WHERE sfx IN ('example0.org', 'site2.example2.org', 'ads.site1.example1.org'))
        |SELECT d.doc_id, d.domain, b.sfx AS blocked_by
        |FROM d LEFT JOIN (SELECT doc_id, sfx FROM m WHERE rn = 1) b ON d.doc_id = b.doc_id
        |ORDER BY d.doc_id""".stripMargin.trim,

    // NFC hygiene: chr(101)||chr(769) is the same decomposed e+acute the
    // Spark query plants; DuckDB length() counts codepoints like
    // codePointCount
    "q_nfc_norm" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' caf' || chr(101) || chr(769)
        |         ELSE text END AS text
        |  FROM documents WHERE doc_id < 500)
        |SELECT doc_id, coalesce(length(text), 0)::BIGINT AS len_raw,
        |  coalesce(length(nfc_normalize(text)), 0)::BIGINT AS len_nfc,
        |  coalesce(nfc_normalize(text) != text, FALSE) AS changed
        |FROM d ORDER BY doc_id""".stripMargin.trim,

    // per-user EWMA: list_reduce over the SAME (ts, event_id) total
    // order replays the identical FP sequence — bit-exact before the
    // final round
    "q_ewma" ->
      """SELECT user_id, count(*)::BIGINT AS n, max(ts) AS last_ts,
        |  round(list_reduce(list(value ORDER BY ts, event_id),
        |                    (acc, x) -> 0.75 * acc + 0.25 * x), 6) AS ewma
        |FROM events
        |WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        |  AND user_id < 200
        |GROUP BY user_id ORDER BY user_id""".stripMargin.trim,

    "q_hits" -> hitsSql,

    // Luhn PAN scan: same lookaround-free candidate regex (RE2 ==
    // Java semantics here), same digit-position arithmetic over the
    // reversed digit string — all integer
    "q_luhn_scan" ->
      """WITH d AS (SELECT doc_id, text ||
        |    (CASE doc_id % 4 WHEN 0 THEN ' card 4111111111111111 ok'
        |     WHEN 1 THEN ' ref 4111-1111-1111-1112 bad'
        |     WHEN 2 THEN ' num 4539 5787 6362 1486 x'
        |     ELSE ' order 123456789012 none' END) AS text
        |  FROM documents WHERE doc_id < 400),
        |c AS (SELECT doc_id, unnest(regexp_extract_all(text,
        |        '[0-9](?:[ -]?[0-9]){12,18}')) AS candidate FROM d),
        |g AS (SELECT doc_id, candidate,
        |        regexp_replace(candidate, '[ -]', '', 'g') AS digits FROM c),
        |f AS (SELECT doc_id, candidate, digits, reverse(digits) AS rev
        |      FROM g WHERE length(digits) BETWEEN 13 AND 19)
        |SELECT doc_id, candidate, digits,
        |  list_sum(list_transform(generate_series(1, length(rev)),
        |    i -> CASE WHEN i % 2 = 1 THEN substr(rev, i, 1)::INT
        |         ELSE 2 * substr(rev, i, 1)::INT
        |              - CASE WHEN substr(rev, i, 1)::INT >= 5 THEN 9 ELSE 0 END
        |         END)) % 10 = 0 AS luhn_valid
        |FROM f ORDER BY doc_id, candidate""".stripMargin.trim,

    // corpus MinHash sketches: min over every shingle of md5(s|gram)
    // per slot (the established portable hash family), equal-slot
    // fraction as the Jaccard estimate
    "q_sketch_sim" ->
      """WITH wa AS (SELECT string_split(lower(trim(text)), ' ') w
        |            FROM documents WHERE doc_id < 300),
        |sha AS (SELECT unnest(list_transform(generate_series(0, greatest(len(w) - 3, 0)),
        |          i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh FROM wa),
        |wb AS (SELECT string_split(lower(trim(text)), ' ') w
        |       FROM documents WHERE doc_id >= 200),
        |shb AS (SELECT unnest(list_transform(generate_series(0, greatest(len(w) - 3, 0)),
        |          i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh FROM wb),
        |sa AS (SELECT s, min(md5(s::varchar || '|' || sh)) AS sig
        |       FROM sha, generate_series(0, 63) g(s) GROUP BY s),
        |sb AS (SELECT s, min(md5(s::varchar || '|' || sh)) AS sig
        |       FROM shb, generate_series(0, 63) g(s) GROUP BY s)
        |SELECT count(*)::BIGINT AS k,
        |  sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)::BIGINT AS n_equal,
        |  round(sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END)::DOUBLE
        |        / count(*), 6) AS sim
        |FROM sa JOIN sb ON sa.s = sb.s""".stripMargin.trim,

    // per-label dispersion: the q_embed_centroid integer-quantized
    // centroid assembled per label, one cosine pass, grouped average
    "q_embed_dispersion" ->
      """WITH x AS (
        |  SELECT label, g.x AS pos,
        |         CAST(floor(embedding[g.x + 1]::DOUBLE * 1048576.0) AS BIGINT) AS iv
        |  FROM embeddings, generate_series(0, 63) g(x)
        |  WHERE embedding IS NOT NULL),
        |a AS (SELECT label, pos, sum(iv) AS s, count(*) AS n
        |      FROM x GROUP BY label, pos),
        |cent AS (SELECT label, list(s::DOUBLE / (n::DOUBLE * 1048576.0)
        |                            ORDER BY pos) AS c
        |         FROM a GROUP BY label),
        |v AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings
        |      WHERE embedding IS NOT NULL)
        |SELECT v.label AS label, count(*)::BIGINT AS n_vecs,
        |  round(avg(1.0 - list_cosine_similarity(v.v, cent.c)), 6) AS dispersion
        |FROM v JOIN cent ON v.label = cent.label
        |GROUP BY v.label ORDER BY v.label""".stripMargin.trim,

    // code/prose signals: same regex counts (RE2 == Java), same planted
    // code block built from chr(10) lines, integer counts + one ratio
    "q_code_detect" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || chr(10) || 'def f(x):'
        |      || chr(10) || '  return x + 1;' || chr(10) || 'class A {'
        |      || chr(10) || '  int v = 2;' || chr(10) || '}'
        |    ELSE text END AS text
        |  FROM documents WHERE doc_id < 400),
        |s AS (SELECT doc_id, coalesce(text, '') AS t FROM d),
        |m AS (SELECT doc_id,
        |    length(t)::BIGINT AS n_chars,
        |    len(regexp_extract_all(t, '[{}\[\]();=<>]'))::BIGINT AS n_symbols,
        |    len(regexp_extract_all(t,
        |      '\b(def|class|return|import|function|var|val|int|void|if|else|for|while)\b'))::BIGINT AS n_keywords,
        |    len(string_split(t, chr(10)))::BIGINT AS n_lines,
        |    len(list_filter(string_split(t, chr(10)), l ->
        |      regexp_matches(l, '^(  |\t)') OR regexp_matches(l, '[;{}]\s*$')))::BIGINT AS n_marked_lines
        |  FROM s)
        |SELECT doc_id, n_chars, n_symbols, n_keywords, n_lines, n_marked_lines,
        |  round(n_symbols::DOUBLE / greatest(n_chars, 1), 6) AS symbol_ratio,
        |  (n_symbols::DOUBLE / greatest(n_chars, 1) > 0.03 AND n_keywords >= 2)
        |    OR (n_marked_lines::DOUBLE / greatest(n_lines, 1) > 0.3) AS is_code
        |FROM m ORDER BY doc_id""".stripMargin.trim,

    // recall@5: the q_ann_topk chain as truth, the q_ann_lsh chain as
    // approx (both verbatim from their green anchors), joined on
    // (query, neighbor)
    "q_ann_recall" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        |s AS (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rank
        |  FROM q, c WHERE query_id != neighbor_id),
        |truth AS (SELECT query_id, neighbor_id FROM s WHERE rank <= 5),
        |pl AS (
        |  SELECT g1.t, g2.b, g3.j,
        |    CASE WHEN (strpos('0123456789abcdef',
        |           substr(md5(g1.t::varchar || '|' || g2.b::varchar || '|'
        |                      || g3.j::varchar), 1, 1)) - 1) % 2 = 1
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM generate_series(0, 7) AS g1(t), generate_series(0, 5) AS g2(b),
        |       generate_series(0, 63) AS g3(j)),
        |vec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |comp AS (
        |  SELECT vec_id, t, b, sum(v[j + 1] * s) AS dot
        |  FROM vec, pl GROUP BY vec_id, t, b),
        |sigs AS (
        |  SELECT vec_id, t,
        |         sum(CASE WHEN dot > 0 THEN 1 << b ELSE 0 END) AS bucket
        |  FROM comp GROUP BY vec_id, t),
        |cand AS (
        |  SELECT DISTINCT qq.vec_id AS query_id, cc.vec_id AS neighbor_id
        |  FROM sigs qq JOIN sigs cc ON qq.t = cc.t AND qq.bucket = cc.bucket
        |  WHERE qq.vec_id < 10 AND qq.vec_id != cc.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY list_cosine_similarity(a.v, b.v) DESC, neighbor_id) AS rank
        |  FROM cand JOIN vec a ON cand.query_id = a.vec_id
        |            JOIN vec b ON cand.neighbor_id = b.vec_id),
        |approx AS (SELECT query_id, neighbor_id FROM scored WHERE rank <= 5),
        |hits AS (SELECT truth.query_id, count(*)::BIGINT AS n_hit
        |         FROM truth JOIN approx USING (query_id, neighbor_id)
        |         GROUP BY truth.query_id),
        |tt AS (SELECT query_id, count(*)::BIGINT AS n_true
        |       FROM truth GROUP BY query_id)
        |SELECT tt.query_id, tt.n_true,
        |  coalesce(h.n_hit, 0)::BIGINT AS n_hit,
        |  round(coalesce(h.n_hit, 0) / 5.0, 6) AS recall
        |FROM tt LEFT JOIN hits h ON tt.query_id = h.query_id
        |ORDER BY tt.query_id""".stripMargin.trim,

    "q_ranked_eval" -> rankedEvalSql,
    "q_ir_summary" -> irSummarySql,

    // exact PR curve: distinct-score counts then DESC prefix sums; all
    // integer (ppm divisions are integral) so partitioning can't matter
    "q_pr_curve" ->
      """WITH s AS (SELECT l_quantity AS t, count(*)::BIGINT AS n,
        |    sum((l_returnflag = 'R')::BIGINT)::BIGINT AS pos
        |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1),
        |tot AS (SELECT sum(n)::BIGINT AS all_n, sum(pos)::BIGINT AS all_p FROM s),
        |c AS (SELECT t, sum(n) OVER (ORDER BY t DESC)::BIGINT AS cn,
        |        sum(pos) OVER (ORDER BY t DESC)::BIGINT AS cp FROM s)
        |SELECT t AS threshold, cp AS tp, (cn - cp)::BIGINT AS fp,
        |  (all_p - cp)::BIGINT AS fn,
        |  ((all_n - all_p) - (cn - cp))::BIGINT AS tn,
        |  (cp * 1000000 // cn)::BIGINT AS prec_ppm,
        |  CASE WHEN all_p > 0 THEN (cp * 1000000 // all_p)::BIGINT END AS rec_ppm,
        |  CASE WHEN cp + (cn - cp) + (all_p - cp) > 0
        |    THEN (2 * cp * 1000000 // (2 * cp + (cn - cp) + (all_p - cp)))::BIGINT
        |  END AS f1_ppm
        |FROM c, tot ORDER BY threshold DESC""".stripMargin.trim,

    "q_confusion" ->
      """WITH r AS (SELECT (l_quantity >= 25.0)::BIGINT AS p,
        |    (l_returnflag = 'R')::BIGINT AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
        |m AS (SELECT sum(p * y)::BIGINT AS tp, sum(p * (1 - y))::BIGINT AS fp,
        |        sum((1 - p) * y)::BIGINT AS fn,
        |        sum((1 - p) * (1 - y))::BIGINT AS tn FROM r)
        |SELECT tp, fp, fn, tn,
        |  ((tp + tn) * 1000000 // (tp + fp + fn + tn))::BIGINT AS acc_ppm,
        |  CASE WHEN tp + fp > 0 THEN (tp * 1000000 // (tp + fp))::BIGINT END AS prec_ppm,
        |  CASE WHEN tp + fn > 0 THEN (tp * 1000000 // (tp + fn))::BIGINT END AS rec_ppm,
        |  CASE WHEN tp + fp + fn > 0
        |    THEN (2 * tp * 1000000 // (2 * tp + fp + fn))::BIGINT END AS f1_ppm
        |FROM m""".stripMargin.trim,

    // reliability bins over the ppm-quantized toy probability
    // mu = l_quantity/50 — bin index and all bin stats are integral
    "q_calibration" ->
      """WITH b AS (SELECT least(l_quantity::BIGINT * 20000 * 10 // 1000000, 9) AS bin,
        |    l_quantity::BIGINT * 20000 AS mu, (l_returnflag = 'R')::BIGINT AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL)
        |SELECT bin, count(*)::BIGINT AS n,
        |  (sum(mu) // count(*))::BIGINT AS mean_pred_ppm,
        |  (sum(y) * 1000000 // count(*))::BIGINT AS mean_obs_ppm,
        |  (abs(sum(mu) - sum(y) * 1000000) // count(*))::BIGINT AS gap_ppm
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin.trim,

    "q_brier" ->
      """WITH r AS (SELECT l_quantity::BIGINT * 20000 AS mu,
        |    (l_returnflag = 'R')::BIGINT AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |sq AS (SELECT count(*)::BIGINT AS n,
        |    (sum((mu - y * 1000000) * (mu - y * 1000000)) // count(*))::BIGINT AS brier_e12
        |  FROM r),
        |b AS (SELECT least(mu * 10 // 1000000, 9) AS bin, count(*)::BIGINT AS n,
        |    (abs(sum(mu) - sum(y) * 1000000) // count(*))::BIGINT AS gap_ppm
        |  FROM r GROUP BY bin),
        |e AS (SELECT (sum(gap_ppm * n) // sum(n))::BIGINT AS ece_ppm FROM b)
        |SELECT sq.n, sq.brier_e12, e.ece_ppm FROM sq, e""".stripMargin.trim,

    // link prediction on the co-purchase graph: wedge join over capped
    // middles; RA index as integral 1e12 // deg sums
    "q_link_predict" ->
      s"""$coPurchaseCte,
         |adj AS (SELECT a AS id, b AS nb FROM e UNION ALL SELECT b, a FROM e),
         |deg AS (SELECT id, count(*)::BIGINT AS deg FROM adj GROUP BY id),
         |mid AS (SELECT adj.id AS z, adj.nb, deg.deg AS degz
         |        FROM adj JOIN deg ON adj.id = deg.id WHERE deg.deg <= 1000),
         |w AS (SELECT m1.z, m1.nb AS u, m2.nb AS v, m1.degz
         |      FROM mid m1 JOIN mid m2 ON m1.z = m2.z AND m1.nb < m2.nb),
         |pr AS (SELECT u, v, count(*)::BIGINT AS cn,
         |         sum(1000000000000 // degz)::BIGINT AS ra_e12
         |       FROM w GROUP BY u, v)
         |SELECT pr.u, pr.v, pr.cn, pr.ra_e12,
         |  (pr.cn * 1000000 // (du.deg + dv.deg - pr.cn))::BIGINT AS jac_ppm,
         |  coalesce(t.ed, FALSE) AS is_edge
         |FROM pr JOIN deg du ON pr.u = du.id JOIN deg dv ON pr.v = dv.id
         |LEFT JOIN (SELECT a, b, TRUE AS ed FROM e) t
         |  ON t.a = pr.u AND t.b = pr.v
         |WHERE pr.cn >= 10 ORDER BY pr.u, pr.v""".stripMargin.trim,

    "q_clustering_coeff" ->
      s"""$coPurchaseCte,
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |        FROM e e1 JOIN e e2 ON e1.b = e2.a
         |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         |nodes AS (SELECT unnest([x, y, z]) AS id FROM tri),
         |tc AS (SELECT id, count(*)::BIGINT AS n_triangles FROM nodes GROUP BY id),
         |adj AS (SELECT a AS id FROM e UNION ALL SELECT b FROM e),
         |deg AS (SELECT id, count(*)::BIGINT AS deg FROM adj GROUP BY id)
         |SELECT deg.id, deg.deg,
         |  coalesce(tc.n_triangles, 0)::BIGINT AS n_triangles,
         |  CASE WHEN deg.deg >= 2 THEN (2 * coalesce(tc.n_triangles, 0)
         |    * 1000000 // (deg.deg * (deg.deg - 1)))::BIGINT END AS coeff_ppm
         |FROM deg LEFT JOIN tc ON deg.id = tc.id ORDER BY deg.id""".stripMargin.trim,

    // degree assortativity: HUGEINT moment sums over both edge
    // orientations, double conversion last (the q_corr discipline)
    "q_assortativity" ->
      s"""$coPurchaseCte,
         |adj AS (SELECT a AS id FROM e UNION ALL SELECT b FROM e),
         |deg AS (SELECT id, count(*)::BIGINT AS deg FROM adj GROUP BY id),
         |s AS (SELECT da.deg AS x, db.deg AS y
         |      FROM e JOIN deg da ON e.a = da.id JOIN deg db ON e.b = db.id),
         |b AS (SELECT x, y FROM s UNION ALL SELECT y AS x, x AS y FROM s),
         |m AS (SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
         |        sum(y)::HUGEINT AS sy, sum(x*x)::HUGEINT AS sxx,
         |        sum(y*y)::HUGEINT AS syy, sum(x*y)::HUGEINT AS sxy FROM b)
         |SELECT (n // 2)::BIGINT AS n_edges,
         |  round((n * sxy - sx * sy)::DOUBLE /
         |    (sqrt((n * sxx - sx * sx)::DOUBLE)
         |     * sqrt((n * syy - sy * sy)::DOUBLE)), 6) AS assortativity
         |FROM m""".stripMargin.trim,

    // association rules over (user, event_type) baskets — distinct
    // basket-item rows, one self-join, integral conf/lift
    "q_assoc_rules" ->
      """WITH bi AS (SELECT DISTINCT user_id AS bk, event_type AS it
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |nb AS (SELECT count(DISTINCT bk)::BIGINT AS n FROM bi),
        |marg AS (SELECT it, count(*)::BIGINT AS c FROM bi GROUP BY it),
        |pr AS (SELECT x.it AS ante, y.it AS cons, count(*)::BIGINT AS n_ab
        |       FROM bi x JOIN bi y ON x.bk = y.bk AND x.it != y.it
        |       GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT pr.ante, pr.cons, ma.c AS n_a, mb.c AS n_b, pr.n_ab,
        |  (pr.n_ab * 1000000 // ma.c)::BIGINT AS conf_ppm,
        |  (pr.n_ab * nb.n * 1000000 // (ma.c * mb.c))::BIGINT AS lift_ppm
        |FROM pr JOIN marg ma ON pr.ante = ma.it
        |        JOIN marg mb ON pr.cons = mb.it, nb
        |ORDER BY pr.ante, pr.cons""".stripMargin.trim,

    // mojibake scan over planted artifacts: chr() literals build the
    // same corrupted suffixes, counts are regex-class lengths and
    // replace()-length arithmetic — all integral
    "q_mojibake" ->
      """WITH d AS (SELECT doc_id, coalesce(text, '')
        |    || CASE WHEN doc_id % 7 = 0 THEN ' ' || chr(195) || chr(169) ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN ' ' || chr(65533) ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0 THEN chr(133) ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id, length(t)::BIGINT AS n_chars,
        |  len(regexp_extract_all(t, '\x{FFFD}'))::BIGINT AS n_replacement,
        |  len(regexp_extract_all(t, '[\x{80}-\x{9f}]'))::BIGINT AS n_c1,
        |  ((length(t) - length(replace(t, chr(195), ''))) / 1
        |   + (length(t) - length(replace(t, chr(194), ''))) / 1
        |   + (length(t) - length(replace(t, chr(226) || chr(8364), ''))) / 2
        |  )::BIGINT AS n_latin1,
        |  (len(regexp_extract_all(t, '\x{FFFD}'))
        |   + len(regexp_extract_all(t, '[\x{80}-\x{9f}]'))
        |   + ((length(t) - length(replace(t, chr(195), ''))) / 1
        |      + (length(t) - length(replace(t, chr(194), ''))) / 1
        |      + (length(t) - length(replace(t, chr(226) || chr(8364), ''))) / 2)
        |  ) > 0 AS is_mojibake
        |FROM d ORDER BY doc_id""".stripMargin.trim,

    // Flesch-Kincaid: counts are regex-run lengths; the grade is ONE
    // per-row double expression mirrored op for op
    "q_readability" ->
      """WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
        |c AS (SELECT doc_id,
        |    len(regexp_extract_all(lower(t), '[^\s]+'))::BIGINT AS n_words,
        |    greatest(len(regexp_extract_all(t, '[.!?]+'))::BIGINT, 1) AS n_sentences,
        |    len(regexp_extract_all(lower(t), '[aeiouy]+'))::BIGINT AS n_syllables
        |  FROM d)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 THEN
        |    round((0.39::DOUBLE * n_words / n_sentences
        |           + 11.8::DOUBLE * n_syllables / n_words - 15.59::DOUBLE)
        |          * 1000)::BIGINT
        |  END AS fk_grade_milli
        |FROM c ORDER BY doc_id""".stripMargin.trim,

    // RAKE: same lower -> strip -> stopword-split -> squish pipeline,
    // integral deg*1e6//freq word scores summed per distinct phrase
    "q_keyphrase" ->
      """WITH d AS (SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents),
        |c AS (SELECT doc_id, regexp_replace(t, '[^a-z ]', ' ', 'g') AS t FROM d),
        |m AS (SELECT doc_id, regexp_replace(t,
        |    '\b(the|and|of|to|a|in|is|for|on|with)\b', '|', 'g') AS t FROM c),
        |ph0 AS (SELECT doc_id, unnest(string_split(t, '|')) AS raw FROM m),
        |ph AS (SELECT doc_id,
        |    trim(regexp_replace(raw, ' +', ' ', 'g')) AS phrase FROM ph0),
        |phf AS (SELECT doc_id, phrase FROM ph
        |  WHERE length(phrase) > 0 AND len(string_split(phrase, ' ')) >= 2),
        |pw AS (SELECT doc_id, phrase,
        |    len(string_split(phrase, ' '))::BIGINT AS l,
        |    unnest(string_split(phrase, ' ')) AS w FROM phf),
        |ws AS (SELECT w, (sum(l) * 1000000 // count(*))::BIGINT AS wscore
        |       FROM pw GROUP BY w),
        |dp AS (SELECT phrase, count(DISTINCT doc_id)::BIGINT AS n_docs,
        |         count(*)::BIGINT AS n_occurrences FROM phf GROUP BY phrase),
        |pws AS (SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM dp),
        |sc AS (SELECT phrase, sum(wscore)::BIGINT AS score_ppm
        |       FROM pws JOIN ws USING (w) GROUP BY phrase)
        |SELECT dp.phrase, dp.n_docs, dp.n_occurrences, sc.score_ppm
        |FROM dp JOIN sc USING (phrase)
        |WHERE dp.n_occurrences >= 3 ORDER BY dp.phrase""".stripMargin.trim,

    // compaction bins: per-partition integer prefix sums, bin = bytes
    // before // target
    "q_compaction_plan" ->
      """WITH f AS (SELECT source, doc_id, n_chars::BIGINT AS bytes
        |  FROM documents WHERE n_chars IS NOT NULL),
        |p AS (SELECT source, doc_id, bytes,
        |    coalesce(sum(bytes) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM f)
        |SELECT source, (before // 5000)::BIGINT AS bin_id,
        |  count(*)::BIGINT AS n_files, sum(bytes)::BIGINT AS bin_bytes
        |FROM p GROUP BY source, bin_id ORDER BY source, bin_id""".stripMargin.trim,

    // skew report: per-key counts then one distribution summary;
    // percentile <-> quantile_cont parity is the q_group_pcts anchor
    "q_skew_report" ->
      """WITH c AS (SELECT l_suppkey, count(*)::BIGINT AS cnt FROM lineitem
        |  WHERE l_suppkey IS NOT NULL GROUP BY 1),
        |m AS (SELECT count(*)::BIGINT AS n_keys, sum(cnt)::BIGINT AS total_rows,
        |    max(cnt)::BIGINT AS max_cnt,
        |    quantile_cont(cnt, 0.5) AS p50, quantile_cont(cnt, 0.95) AS p95,
        |    quantile_cont(cnt, 0.99) AS p99 FROM c)
        |SELECT n_keys, total_rows, max_cnt,
        |  round(p50, 6) AS p50, round(p95, 6) AS p95, round(p99, 6) AS p99,
        |  CASE WHEN p50 > 0
        |    THEN round(max_cnt::DOUBLE / p50 * 1000)::BIGINT END AS skew_x1000,
        |  CASE WHEN p95 > 0
        |    THEN ceil(max_cnt::DOUBLE / p95)::BIGINT END AS suggested_salt
        |FROM m""".stripMargin.trim,

    // Mann-Whitney U: distinct-value counts, 2x-midrank prefix sums
    // (all BIGINT), one mirrored double expression for z
    "q_mannwhitney" ->
      """WITH t AS (SELECT value AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |    AND value IS NOT NULL),
        |pv AS (SELECT v, sum(g)::BIGINT AS ca, sum(1 - g)::BIGINT AS cb
        |       FROM t GROUP BY v),
        |o AS (SELECT v, ca, cb, ca + cb AS t2,
        |    coalesce(sum(ca + cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM pv),
        |s AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
        |    sum(ca * (2 * cum + t2 + 1))::BIGINT AS r1x2,
        |    sum(t2 * t2 * t2 - t2)::BIGINT AS tie FROM o)
        |SELECT na AS n_a, nb AS n_b,
        |  (r1x2 - na * (na + 1))::BIGINT AS u2, tie AS tie_term,
        |  round(((r1x2 - na * (na + 1)) - na * nb)::DOUBLE
        |    / (2.0 * sqrt(na::DOUBLE * nb / 12.0
        |       * (((na + nb) + 1) - tie::DOUBLE
        |          / ((na + nb)::DOUBLE * ((na + nb) - 1))))), 6) AS z
        |FROM s""".stripMargin.trim,

    // per-group Gini over ascending ranks — pure BIGINT
    "q_gini" ->
      """WITH f AS (SELECT source, n_chars::BIGINT AS x FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars >= 0),
        |r AS (SELECT source, x,
        |    row_number() OVER (PARTITION BY source ORDER BY x) AS i FROM f),
        |g AS (SELECT source, count(*)::BIGINT AS n, sum(x)::BIGINT AS total,
        |    sum(i * x)::BIGINT AS ix FROM r GROUP BY source)
        |SELECT source, n, total,
        |  CASE WHEN total > 0 THEN
        |    ((2 * ix - (n + 1) * total) * 1000000 // (n * total))::BIGINT
        |  END AS gini_ppm
        |FROM g ORDER BY source""".stripMargin.trim,

    // modularity of the CC partition over the near-dup pair graph —
    // HUGEINT arithmetic with the same per-community flooring
    "q_modularity" ->
      s"""$nearDupClusterCte,
         |mem AS (SELECT id, min(r) AS c FROM reach GROUP BY id),
         |e2 AS (SELECT DISTINCT least(id_a, id_b) AS a,
         |         greatest(id_a, id_b) AS b FROM pr WHERE id_a != id_b),
         |mm AS (SELECT count(*)::BIGINT AS m FROM e2),
         |intra AS (SELECT ma.c AS community, count(*)::BIGINT AS e_in
         |  FROM e2 JOIN mem ma ON e2.a = ma.id JOIN mem mb ON e2.b = mb.id
         |  WHERE ma.c = mb.c GROUP BY 1),
         |degs AS (SELECT mem.c AS community, count(*)::BIGINT AS d_sum
         |  FROM (SELECT a AS id FROM e2 UNION ALL SELECT b FROM e2) nd
         |  JOIN mem ON nd.id = mem.id GROUP BY 1)
         |SELECT d.community, coalesce(i.e_in, 0)::BIGINT AS e_in, d.d_sum,
         |  (coalesce(i.e_in, 0)::HUGEINT * 1000000000000 // mm.m
         |   - d.d_sum::HUGEINT * d.d_sum * 1000000000000
         |     // (4::HUGEINT * mm.m * mm.m))::BIGINT AS q_e12
         |FROM degs d LEFT JOIN intra i ON d.community = i.community, mm
         |ORDER BY d.community""".stripMargin.trim,

    "q_bootstrap_ci" -> bootstrapCiSql,

    // mutual information source x lang: per-term round at 1e-9 then
    // DECIMAL(38,9) sums (the PMI-oracle ln discipline)
    "q_mutual_info" ->
      """WITH base AS (SELECT source AS a, lang AS b FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL),
        |nn AS (SELECT count(*)::BIGINT AS n FROM base),
        |j AS (SELECT a, b, count(*)::BIGINT AS n_ab FROM base GROUP BY a, b),
        |ma AS (SELECT a, count(*)::BIGINT AS n_a FROM base GROUP BY a),
        |mb AS (SELECT b, count(*)::BIGINT AS n_b FROM base GROUP BY b),
        |mi AS (SELECT sum(round((n_ab::DOUBLE / n) * ln(n_ab::DOUBLE * n
        |           / (n_a::DOUBLE * n_b)), 9)::DECIMAL(38,9)) AS v
        |       FROM j JOIN ma USING (a) JOIN mb USING (b), nn),
        |ha AS (SELECT -sum(round((n_a::DOUBLE / n) * ln(n_a::DOUBLE / n),
        |           9)::DECIMAL(38,9)) AS v FROM ma, nn),
        |hb AS (SELECT -sum(round((n_b::DOUBLE / n) * ln(n_b::DOUBLE / n),
        |           9)::DECIMAL(38,9)) AS v FROM mb, nn)
        |SELECT nn.n, round(mi.v, 6)::DOUBLE AS mi_nats,
        |  round(ha.v, 6)::DOUBLE AS h_a, round(hb.v, 6)::DOUBLE AS h_b
        |FROM nn, mi, ha, hb""".stripMargin.trim,

    // Holt level+trend: a RECURSIVE-CTE fold replays the identical FP
    // sequence over the identical (ts, event_id) order — bit-exact
    // pre-round. (list_reduce with a struct accumulator miscomputes
    // multi-field recurrences in DuckDB 1.0 — verified against the
    // standalone lambda arithmetic — so the fold is unrolled row by
    // row instead.)
    "q_holt" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, ts, value FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND user_id < 200),
        |seq AS (SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS i FROM ev),
        |cnt AS (SELECT user_id, count(*)::BIGINT AS n, max(ts) AS last_ts
        |        FROM ev GROUP BY user_id),
        |fold AS (
        |  SELECT user_id, i, value::DOUBLE AS l, 0.0::DOUBLE AS b
        |  FROM seq WHERE i = 1
        |  UNION ALL
        |  SELECT s.user_id, s.i,
        |    0.5 * s.value + 0.5 * (fold.l + fold.b),
        |    0.25 * ((0.5 * s.value + 0.5 * (fold.l + fold.b)) - fold.l)
        |      + 0.75 * fold.b
        |  FROM fold JOIN seq s
        |    ON s.user_id = fold.user_id AND s.i = fold.i + 1)
        |SELECT f.user_id, cnt.n, cnt.last_ts,
        |  round(f.l, 6) AS level, round(f.b, 6) AS trend,
        |  round(f.l + f.b, 6) AS forecast
        |FROM fold f JOIN cnt ON f.user_id = cnt.user_id AND f.i = cnt.n
        |ORDER BY f.user_id""".stripMargin.trim,

    // centroid silhouette: D2 = Σ(xq·n − s)² clears the rational
    // centroid denominator — HUGEINT-exact; the only doubles are
    // sqrt(D2)/(n·2^20) and the final ratio, mirrored and
    // micro-rounded; the label mean is a FLOOR of a double ratio
    // (negative sums: trunc-div would disagree between engines)
    "q_silhouette" ->
      """WITH e AS (SELECT vec_id AS id, label, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE embedding IS NOT NULL
        |    AND label IS NOT NULL AND vec_id IS NOT NULL),
        |x AS (SELECT id, label, g.pos,
        |    floor(v[g.pos + 1] * 1048576.0)::BIGINT AS xq
        |  FROM e, generate_series(0, 63) AS g(pos)),
        |mom AS (SELECT label AS clabel, pos, sum(xq)::HUGEINT AS s,
        |    count(*)::BIGINT AS n FROM x GROUP BY 1, 2),
        |d2 AS (SELECT x.id, x.label AS own, mom.clabel, max(mom.n) AS n,
        |    sum((x.xq::HUGEINT * mom.n - mom.s)
        |        * (x.xq::HUGEINT * mom.n - mom.s)) AS dd
        |  FROM x JOIN mom ON x.pos = mom.pos GROUP BY 1, 2, 3),
        |dist AS (SELECT id, own, clabel,
        |    sqrt(dd::DOUBLE) / (n::DOUBLE * 1048576.0) AS d FROM d2),
        |per AS (SELECT id, own,
        |    max(CASE WHEN clabel = own THEN d END) AS a,
        |    min(CASE WHEN clabel != own THEN d END) AS b
        |  FROM dist GROUP BY 1, 2),
        |sm AS (SELECT own, CASE WHEN b IS NOT NULL AND greatest(a, b) > 0
        |    THEN round((b - a) / greatest(a, b) * 1000000)::BIGINT
        |  END AS smx FROM per)
        |SELECT own AS label, count(*)::BIGINT AS n_points,
        |  CASE WHEN count(smx) > 0
        |    THEN floor(sum(smx)::DOUBLE / count(smx))::BIGINT
        |  END AS mean_s_micro
        |FROM sm GROUP BY own ORDER BY label""".stripMargin.trim,

    // freshness decay: power-of-two shift weights on the 2^20 scale —
    // pure BIGINT
    "q_time_decay" ->
      """WITH r AS (SELECT event_type,
        |    greatest(datediff('day', CAST(ts AS DATE), DATE '2024-02-05'),
        |             0) // 7 AS k,
        |    CAST(round(value * 100.0) AS BIGINT) AS xc
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |w AS (SELECT event_type,
        |    CASE WHEN k <= 20 THEN (1::BIGINT << (20 - k)) ELSE 0 END AS w,
        |    xc FROM r)
        |SELECT event_type, count(*)::BIGINT AS n,
        |  sum(w)::BIGINT AS decayed_x20,
        |  sum(w * xc)::BIGINT AS decayed_cents_x20
        |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin.trim,

    // exact equi-join cardinality from per-key histograms
    "q_join_estimate" ->
      """WITH ca AS (SELECT l_partkey AS k, count(*)::BIGINT AS c
        |  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
        |j AS (SELECT x.k, x.c::HUGEINT * cb.c AS cc
        |      FROM ca x JOIN ca cb ON x.k = cb.k)
        |SELECT sum(cc)::BIGINT AS est_rows, count(*)::BIGINT AS n_matched_keys,
        |  max(cc)::BIGINT AS max_key_rows,
        |  (max(cc) * 1000000 // greatest(sum(cc), 1))::BIGINT AS max_key_share_ppm
        |FROM j""".stripMargin.trim,

    // k-anonymity: the two-level distinct (class, sensitive) reduction
    // mirrors the operator (count-distinct semantics INCLUDING null as
    // a value), then one summary row — all BIGINT
    "q_k_anon" ->
      """WITH r AS (SELECT user_id % 500 AS qa, event_type,
        |    CAST(round(value * 100.0) AS BIGINT) // 5000 AS vb
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND value IS NOT NULL),
        |pp AS (SELECT qa, event_type, vb, count(*)::BIGINT AS n
        |       FROM r GROUP BY 1, 2, 3),
        |pc AS (SELECT qa, event_type, sum(n)::BIGINT AS rws,
        |         count(*)::BIGINT AS l FROM pp GROUP BY 1, 2)
        |SELECT sum(rws)::BIGINT AS n_rows, count(*)::BIGINT AS n_groups,
        |  sum(CASE WHEN rws < 5 THEN 1 ELSE 0 END)::BIGINT AS n_groups_lt_k,
        |  sum(CASE WHEN rws < 5 THEN rws ELSE 0 END)::BIGINT AS n_rows_lt_k,
        |  min(rws)::BIGINT AS min_group,
        |  min(l)::BIGINT AS min_l_diversity
        |FROM pc""".stripMargin.trim,

    // banding quality: exact all-pairs Jaccard truth vs minhash-band
    // candidates over the SAME planted corpus, one pair-key join
    "q_dedup_eval" ->
      """WITH docs AS (
        |  SELECT doc_id AS id, text FROM documents WHERE doc_id < 1000
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |         array_to_string(list_slice(w, 1, len(w) - 5), ' ')
        |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') w
        |        FROM documents WHERE doc_id < 1000)),
        |sh AS (
        |  SELECT id, list_transform(generate_series(0, greatest(len(w) - 3, 0)),
        |           i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) AS shingles
        |  FROM (SELECT id, string_split(lower(trim(text)), ' ') w FROM docs)),
        |sets AS (SELECT id, list_distinct(shingles) AS s FROM sh),
        |tok AS (SELECT id, unnest(s) AS g FROM sets),
        |cp AS (SELECT a.id AS ia, b.id AS ib, count(*)::BIGINT AS inter
        |       FROM tok a JOIN tok b ON a.g = b.g AND a.id < b.id
        |       GROUP BY 1, 2),
        |tr AS (SELECT ia, ib FROM cp
        |       JOIN sets sa ON cp.ia = sa.id JOIN sets sb ON cp.ib = sb.id
        |       WHERE inter::DOUBLE / (len(sa.s) + len(sb.s) - inter) >= 0.6),
        |mh AS (SELECT id, s, min(md5(s::varchar || '|' || u.sh2)) AS sig
        |       FROM sh, generate_series(0, 11) AS g(s),
        |            unnest(sh.shingles) AS u(sh2)
        |       GROUP BY id, s),
        |sigv AS (SELECT id, array_agg(sig ORDER BY s) AS sigs FROM mh GROUP BY id),
        |bands AS (SELECT id, b,
        |    md5(sigs[b*3+1] || ',' || sigs[b*3+2] || ',' || sigs[b*3+3]) AS bucket
        |  FROM sigv, generate_series(0, 3) AS g(b)),
        |cand0 AS (SELECT DISTINCT l.id AS ia, r.id AS ib
        |  FROM bands l, bands r
        |  WHERE l.b = r.b AND l.bucket = r.bucket AND l.id < r.id),
        |cd AS (SELECT ia, ib FROM cand0
        |  JOIN sets sa ON cand0.ia = sa.id JOIN sets sb ON cand0.ib = sb.id
        |  WHERE len(list_intersect(sa.s, sb.s))::DOUBLE
        |        / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
        |        >= 0.01),
        |m AS (SELECT (SELECT count(*) FROM tr)::BIGINT AS n_truth,
        |        (SELECT count(*) FROM cd)::BIGINT AS n_cand,
        |        (SELECT count(*) FROM tr JOIN cd USING (ia, ib))::BIGINT AS n_hit)
        |SELECT n_truth, n_cand, n_hit,
        |  CASE WHEN n_cand > 0 THEN (n_hit * 1000000 // n_cand)::BIGINT
        |  END AS prec_ppm,
        |  CASE WHEN n_truth > 0 THEN (n_hit * 1000000 // n_truth)::BIGINT
        |  END AS rec_ppm,
        |  CASE WHEN n_truth + n_cand > 0
        |    THEN (2 * n_hit * 1000000 // (n_truth + n_cand))::BIGINT
        |  END AS f1_ppm
        |FROM m""".stripMargin.trim,

    "q_label_prop" -> labelPropSql,

    "q_embed_int8" -> embedInt8Sql,

    // exact 1-D EMD on the integer-cent grid: HUGEINT
    // Σ|cumA·nB − cumB·nA|·gap over distinct values, integral milli
    "q_emd" ->
      """WITH t AS (SELECT CAST(round(value * 100.0) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |    AND value IS NOT NULL),
        |pv AS (SELECT v, sum(g)::BIGINT AS ca, sum(1 - g)::BIGINT AS cb
        |       FROM t GROUP BY v),
        |nn AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM pv),
        |o AS (SELECT v, sum(ca) OVER (ORDER BY v)::HUGEINT AS cuma,
        |        sum(cb) OVER (ORDER BY v)::HUGEINT AS cumb,
        |        lead(v) OVER (ORDER BY v) AS nv FROM pv),
        |s AS (SELECT sum(abs(cuma * nn.nb - cumb * nn.na)
        |        * (nv - v)::HUGEINT) AS num
        |      FROM o, nn WHERE nv IS NOT NULL)
        |SELECT nn.na AS n_a, nn.nb AS n_b,
        |  (s.num * 1000 // (nn.na::HUGEINT * nn.nb))::BIGINT
        |    AS emd_milli_cents
        |FROM s, nn""".stripMargin.trim,

    // exact DAU / trailing-window distinct: (actor, day) distinct,
    // window explode into covered target days, two-level reduce
    "q_rolling_distinct" ->
      """WITH days AS (SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |dau AS (SELECT d, count(*)::BIGINT AS dau FROM days GROUP BY d),
        |ex AS (SELECT DISTINCT k, d + CAST(o AS INTEGER) AS td
        |       FROM days, generate_series(0, 6) AS g(o)),
        |wau AS (SELECT td AS d, count(*)::BIGINT AS rolling_7
        |        FROM ex GROUP BY td)
        |SELECT dau.d, dau.dau, wau.rolling_7
        |FROM dau JOIN wau ON dau.d = wau.d ORDER BY dau.d""".stripMargin.trim,

    // multi-probe LSH: the q_ann_lsh machinery with two Hamming-1
    // probe buckets per query (xor on the BIGINT signature)
    "q_ann_multiprobe" ->
      """
        |WITH pl AS (
        |  SELECT g1.t, g2.b, g3.j,
        |    CASE WHEN (strpos('0123456789abcdef',
        |           substr(md5(g1.t::varchar || '|' || g2.b::varchar || '|'
        |                      || g3.j::varchar), 1, 1)) - 1) % 2 = 1
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM generate_series(0, 7) AS g1(t), generate_series(0, 5) AS g2(b),
        |       generate_series(0, 63) AS g3(j)),
        |vec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |comp AS (
        |  SELECT vec_id, t, b, sum(v[j + 1] * s) AS dot
        |  FROM vec, pl GROUP BY vec_id, t, b),
        |sigs AS (
        |  SELECT vec_id, t,
        |         sum(CASE WHEN dot > 0 THEN 1 << b ELSE 0 END)::BIGINT AS bucket
        |  FROM comp GROUP BY vec_id, t),
        |qp AS (SELECT vec_id, t, bucket FROM sigs WHERE vec_id < 10
        |  UNION SELECT vec_id, t, xor(bucket, 1) FROM sigs WHERE vec_id < 10
        |  UNION SELECT vec_id, t, xor(bucket, 2) FROM sigs WHERE vec_id < 10),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |  FROM qp q JOIN sigs c ON q.t = c.t AND q.bucket = c.bucket
        |  WHERE q.vec_id != c.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         list_cosine_similarity(a.v, b.v) AS cos,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY list_cosine_similarity(a.v, b.v) DESC, neighbor_id) AS rank
        |  FROM cand JOIN vec a ON cand.query_id = a.vec_id
        |            JOIN vec b ON cand.neighbor_id = b.vec_id)
        |SELECT query_id, rank, neighbor_id, round(cos, 4) AS cos
        |FROM scored WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin.trim,

    // seasonal residuals: hour-of-week cell means (integral floor),
    // integer cent residuals, one rollup
    "q_seasonal_resid" ->
      """WITH c AS (SELECT event_type,
        |    (datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7 AS dow,
        |    hour(ts) AS hour, CAST(round(value * 100.0) AS BIGINT) AS xc
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |g AS (SELECT event_type, dow, hour,
        |        sum(xc) // count(*) AS m FROM c GROUP BY 1, 2, 3),
        |r AS (SELECT c.event_type, c.xc - g.m AS r FROM c
        |      JOIN g ON c.event_type = g.event_type AND c.dow = g.dow
        |            AND c.hour = g.hour)
        |SELECT event_type, count(*)::BIGINT AS n,
        |  max(abs(r))::BIGINT AS max_abs_resid_cents,
        |  sum(CASE WHEN abs(r) > 10000 THEN 1 ELSE 0 END)::BIGINT AS n_beyond
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin.trim,

    // inter-arrival burstiness: integer micro gaps from a keyed lag,
    // HUGEINT moments, one mirrored double for B = (sd-mean)/(sd+mean)
    "q_interarrival" ->
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |g AS (SELECT user_id, us - lag(us) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS gap FROM e),
        |a AS (SELECT user_id, count(*)::BIGINT AS n_events,
        |    count(gap)::BIGINT AS ng,
        |    coalesce(sum(gap), 0)::HUGEINT AS s,
        |    coalesce(sum(gap::HUGEINT * gap), 0)::HUGEINT AS s2
        |  FROM g GROUP BY user_id)
        |SELECT user_id, n_events, ng AS n_gaps,
        |  CASE WHEN ng > 0 THEN (s // ng)::BIGINT END AS mean_gap_us,
        |  CASE WHEN ng > 1 AND s > 0 THEN
        |    round((sqrt((ng * s2 - s * s)::DOUBLE) / ng - s::DOUBLE / ng)
        |      / (sqrt((ng * s2 - s * s)::DOUBLE) / ng + s::DOUBLE / ng), 6)
        |  END AS burstiness
        |FROM a ORDER BY user_id""".stripMargin.trim,

    // degree distribution of the co-purchase graph — all integral
    "q_degree_dist" ->
      s"""$coPurchaseCte,
         |adj AS (SELECT a AS id FROM e UNION ALL SELECT b FROM e),
         |deg AS (SELECT id, count(*)::BIGINT AS deg FROM adj GROUP BY id),
         |nn AS (SELECT count(*)::BIGINT AS n FROM deg)
         |SELECT deg, count(*)::BIGINT AS n_nodes,
         |  (count(*) * 1000000 // nn.n)::BIGINT AS share_ppm
         |FROM deg, nn GROUP BY deg, nn.n ORDER BY deg""".stripMargin.trim,

    // gate co-failure matrix: integral cross-multiplied gate
    // predicates, list_filter-built failure arrays, pair self-join
    "q_gate_matrix" ->
      """WITH d0 AS (SELECT doc_id, coalesce(text, '') AS t0 FROM documents),
        |d1 AS (SELECT doc_id, CASE WHEN doc_id % 6 = 0 THEN '999 999 999 x'
        |    WHEN doc_id % 5 = 0 THEN substr(t0, 1, 15)
        |    ELSE t0 END AS t1 FROM d0),
        |d AS (SELECT doc_id, t1 || CASE WHEN doc_id % 11 = 0
        |    THEN chr(65533) ELSE '' END AS t FROM d1),
        |m AS (SELECT doc_id,
        |    len(string_split(lower(trim(t)), ' '))::BIGINT AS w,
        |    len(list_distinct(string_split(lower(trim(t)), ' ')))::BIGINT AS dw,
        |    length(t)::BIGINT AS ch,
        |    (length(t) - length(regexp_replace(t, '[0-9]', '', 'g')))::BIGINT AS dg,
        |    (length(t) - length(regexp_replace(t, '[^\w\s]', '', 'g')))::BIGINT AS pu,
        |    (len(regexp_extract_all(t, '\x{FFFD}'))
        |     + len(regexp_extract_all(t, '[\x{80}-\x{9f}]')))::BIGINT AS mo
        |  FROM d),
        |f AS (SELECT doc_id, list_filter([
        |    CASE WHEN w < 20 THEN 'short' END,
        |    CASE WHEN w > 300 THEN 'long' END,
        |    CASE WHEN dw * 2 < w THEN 'repetitive' END,
        |    CASE WHEN dg * 5 > ch THEN 'numeric' END,
        |    CASE WHEN pu * 5 > ch THEN 'puncty' END,
        |    CASE WHEN mo > 0 THEN 'mojibake' END], x -> x IS NOT NULL) AS fl
        |  FROM m),
        |u AS (SELECT doc_id, unnest(fl) AS g FROM f),
        |p AS (SELECT a.g AS gate_a, b.g AS gate_b FROM u a
        |      JOIN u b ON a.doc_id = b.doc_id AND a.g <= b.g)
        |SELECT gate_a, gate_b, count(*)::BIGINT AS n_both
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.trim,

    // effective tokens: Dedup.exact's md5-of-md5 content key mirrored,
    // min-id keep, integral dedup ratio
    "q_effective_tokens" ->
      """WITH d AS (SELECT doc_id, source, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, source, text FROM documents),
        |tk AS (SELECT doc_id, source,
        |    len(string_split(trim(text), ' '))::BIGINT AS t
        |  FROM d WHERE text IS NOT NULL),
        |keep AS (SELECT min(doc_id) AS doc_id FROM d
        |  GROUP BY md5(md5(coalesce('V' || text, 'N')))),
        |raw AS (SELECT source, count(*)::BIGINT AS n_docs,
        |    sum(t)::BIGINT AS raw_tokens FROM tk GROUP BY source),
        |kept AS (SELECT tk.source, count(*)::BIGINT AS n_kept,
        |    sum(tk.t)::BIGINT AS effective_tokens FROM tk
        |  WHERE tk.doc_id IN (SELECT doc_id FROM keep) GROUP BY tk.source)
        |SELECT raw.source, raw.n_docs, coalesce(kept.n_kept, 0)::BIGINT AS n_kept,
        |  raw.raw_tokens,
        |  coalesce(kept.effective_tokens, 0)::BIGINT AS effective_tokens,
        |  CASE WHEN raw.raw_tokens > 0 THEN
        |    (coalesce(kept.effective_tokens, 0) * 1000000 // raw.raw_tokens)::BIGINT
        |  END AS dedup_ratio_ppm
        |FROM raw LEFT JOIN kept ON raw.source = kept.source
        |ORDER BY raw.source""".stripMargin.trim,

    // coverage curve: top-k sources with cumulative ppm of the WHOLE
    // corpus (tail mass stays in the denominator)
    "q_coverage_curve" ->
      """WITH c AS (SELECT source, count(*)::BIGINT AS cnt FROM documents
        |  WHERE source IS NOT NULL GROUP BY source),
        |t AS (SELECT sum(cnt)::BIGINT AS total FROM c),
        |top AS (SELECT source, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, source) AS rank
        |  FROM c QUALIFY rank <= 10),
        |cm AS (SELECT rank, source, cnt,
        |    sum(cnt) OVER (ORDER BY rank)::BIGINT AS cum FROM top)
        |SELECT rank, source, cnt, cum,
        |  (cum * 1000000 // t.total)::BIGINT AS share_cum_ppm
        |FROM cm, t ORDER BY rank""".stripMargin.trim,

    // hour-of-week profile: dow as pmod(epoch_days + 4, 7) — integer,
    // convention-free
    "q_seasonality" ->
      """WITH c AS (SELECT event_type,
        |    (datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7 AS dow,
        |    hour(ts) AS hour, CAST(round(value * 100.0) AS BIGINT) AS xc
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |g AS (SELECT event_type, dow, hour, count(*)::BIGINT AS n,
        |        sum(xc)::BIGINT AS sum_cents FROM c GROUP BY 1, 2, 3),
        |t AS (SELECT event_type, sum(n)::BIGINT AS tot FROM g GROUP BY 1)
        |SELECT g.event_type, g.dow, g.hour, g.n, g.sum_cents,
        |  (g.n * 1000000 // t.tot)::BIGINT AS share_ppm
        |FROM g JOIN t ON g.event_type = t.event_type
        |ORDER BY 1, 2, 3""".stripMargin.trim,

    // chi-square independence: per-cell (o-e)^2/e rounded at 1e-9 then
    // DECIMAL(38,9)-summed (the mutual-info ln discipline)
    "q_chi2" ->
      """WITH base AS (SELECT source AS a, lang AS b FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL),
        |nn AS (SELECT count(*)::BIGINT AS n FROM base),
        |j AS (SELECT a, b, count(*)::BIGINT AS n_ab FROM base GROUP BY a, b),
        |ma AS (SELECT a, count(*)::BIGINT AS n_a FROM base GROUP BY a),
        |mb AS (SELECT b, count(*)::BIGINT AS n_b FROM base GROUP BY b),
        |ka AS (SELECT count(*)::BIGINT AS c FROM ma),
        |kb AS (SELECT count(*)::BIGINT AS c FROM mb),
        |chi AS (SELECT sum(round(
        |    n_ab::DOUBLE * n_ab / (n_a::DOUBLE * n_b / n),
        |    9)::DECIMAL(38,9)) - max(n) AS v
        |  FROM j JOIN ma USING (a) JOIN mb USING (b), nn)
        |SELECT nn.n, ((ka.c - 1) * (kb.c - 1))::BIGINT AS dof,
        |  round(chi.v, 6)::DOUBLE AS chi2,
        |  CASE WHEN least(ka.c, kb.c) - 1 > 0 THEN
        |    round(sqrt(chi.v::DOUBLE
        |      / (nn.n::DOUBLE * (least(ka.c, kb.c) - 1))), 6)
        |  END AS cramers_v
        |FROM nn, chi, ka, kb""".stripMargin.trim,

    // winsorized per-group summary: quantile_cont bounds (percentile
    // parity is the q_group_pcts anchor), integral clip counts,
    // cent-sum of the clipped values
    "q_winsorize" ->
      """WITH b AS (SELECT l_returnflag AS g,
        |    quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
        |r AS (SELECT l.l_returnflag AS g, l.l_extendedprice AS x, b.lo, b.hi,
        |    least(greatest(l.l_extendedprice, b.lo), b.hi) AS c
        |  FROM lineitem l JOIN b ON l.l_returnflag = b.g
        |  WHERE l.l_extendedprice IS NOT NULL)
        |SELECT g AS l_returnflag, count(*)::BIGINT AS n,
        |  sum((x < lo)::BIGINT)::BIGINT AS n_clipped_lo,
        |  sum((x > hi)::BIGINT)::BIGINT AS n_clipped_hi,
        |  round(min(lo), 6) AS lo, round(min(hi), 6) AS hi,
        |  sum(CAST(round(c * 100.0) AS BIGINT))::BIGINT AS winsorized_cents
        |FROM r GROUP BY g ORDER BY g""".stripMargin.trim,

    // IBAN mod-97: the same char fold as the Spark aggregate HOF,
    // unrolled as a recursive CTE keyed by a per-candidate ordinal
    "q_iban_scan" ->
      """WITH RECURSIVE d AS (SELECT doc_id, coalesce(text, '')
        |    || CASE WHEN doc_id % 9 = 0
        |         THEN ' DE89370400440532013000' ELSE '' END
        |    || CASE WHEN doc_id % 10 = 0
        |         THEN ' DE89370400440532013001' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0
        |         THEN ' GB82WEST12345698765432' ELSE '' END AS t
        |  FROM documents),
        |c AS (SELECT doc_id, unnest(regexp_extract_all(t,
        |    '\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\b')) AS candidate FROM d),
        |r AS (SELECT doc_id, candidate,
        |    substr(candidate, 5) || substr(candidate, 1, 4) AS s,
        |    row_number() OVER (ORDER BY doc_id, candidate) AS ck FROM c),
        |f AS (
        |  SELECT ck, 1 AS i,
        |    CASE WHEN ascii(substr(s, 1, 1)) BETWEEN 48 AND 57
        |      THEN (ascii(substr(s, 1, 1)) - 48) % 97
        |      ELSE (ascii(substr(s, 1, 1)) - 55) % 97 END AS acc
        |  FROM r
        |  UNION ALL
        |  SELECT f.ck, f.i + 1,
        |    CASE WHEN ascii(substr(r.s, f.i + 1, 1)) BETWEEN 48 AND 57
        |      THEN (f.acc * 10 + ascii(substr(r.s, f.i + 1, 1)) - 48) % 97
        |      ELSE (f.acc * 100 + ascii(substr(r.s, f.i + 1, 1)) - 55) % 97
        |    END
        |  FROM f JOIN r ON r.ck = f.ck WHERE f.i < length(r.s))
        |SELECT r.doc_id, r.candidate,
        |  (length(r.candidate) BETWEEN 15 AND 34 AND fin.acc = 1) AS iban_valid
        |FROM r JOIN (SELECT f.ck, f.acc FROM f
        |             JOIN r ON r.ck = f.ck WHERE f.i = length(r.s)) fin
        |  ON r.ck = fin.ck
        |ORDER BY r.doc_id, r.candidate""".stripMargin.trim,

    // bitext mining: planted reference numbers survive the word-reversed
    // "translation"; cross-language digit-set Jaccard, integral ppm
    "q_bitext_mine" ->
      """WITH base AS (SELECT doc_id, lang, coalesce(text, '')
        |    || ' ref ' || (doc_id * 7 + 11)::VARCHAR
        |    || ' code ' || (doc_id * 13 + 29)::VARCHAR AS t
        |  FROM documents WHERE doc_id < 300),
        |twin AS (SELECT doc_id + 200000 AS doc_id, 'xx' AS lang,
        |    array_to_string(list_reverse(string_split(t, ' ')), ' ') AS t
        |  FROM base),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM twin),
        |sets AS (SELECT doc_id AS id, lang,
        |    list_distinct(regexp_extract_all(t, '[0-9]+')) AS nums FROM u
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL),
        |s2 AS (SELECT id, lang, nums, len(nums)::BIGINT AS n FROM sets
        |       WHERE len(nums) > 0),
        |inv0 AS (SELECT id, lang, n, unnest(nums) AS g FROM s2),
        |ok AS (SELECT g FROM (SELECT g, count(*) AS c FROM inv0 GROUP BY g)
        |       WHERE c <= 1000),
        |inv AS (SELECT * FROM inv0 WHERE g IN (SELECT g FROM ok)),
        |pc AS (SELECT a.id AS id_a, a.lang AS lang_a, b.id AS id_b,
        |    b.lang AS lang_b, a.n AS na, b.n AS nb, count(*)::BIGINT AS n_common
        |  FROM inv a JOIN inv b
        |    ON a.g = b.g AND a.id < b.id AND a.lang != b.lang
        |  GROUP BY 1, 2, 3, 4, 5, 6)
        |SELECT id_a, lang_a, id_b, lang_b, n_common,
        |  (n_common * 1000000 // (na + nb - n_common))::BIGINT AS jac_ppm
        |FROM pc
        |WHERE n_common::DOUBLE >= (na + nb - n_common)::DOUBLE * 0.9
        |ORDER BY id_a, id_b""".stripMargin.trim,

    // Spearman: exact ×2 midranks per distinct value (window prefix in
    // the oracle == two-pass range scan in the engine), Pearson on the
    // integral ranks in HUGEINT, one double finish
    "q_spearman" ->
      """WITH f AS (SELECT l_quantity::DOUBLE AS a, l_extendedprice::DOUBLE AS b
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |pa AS (SELECT a AS v, count(*)::BIGINT AS t FROM f GROUP BY 1),
        |ra AS (SELECT v, 2 * coalesce(sum(t) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
        |  FROM pa),
        |pb AS (SELECT b AS v, count(*)::BIGINT AS t FROM f GROUP BY 1),
        |rb AS (SELECT v, 2 * coalesce(sum(t) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
        |  FROM pb),
        |j AS (SELECT ra.r2 AS x, rb.r2 AS y
        |  FROM f JOIN ra ON f.a = ra.v JOIN rb ON f.b = rb.v),
        |m AS (SELECT count(*)::HUGEINT AS n,
        |    sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
        |    sum(x::HUGEINT * x) AS sxx, sum(y::HUGEINT * y) AS syy,
        |    sum(x::HUGEINT * y) AS sxy FROM j)
        |SELECT n::BIGINT AS n,
        |  round((n * sxy - sx * sy)::DOUBLE
        |    / (sqrt((n * sxx - sx * sx)::DOUBLE)
        |       * sqrt((n * syy - sy * sy)::DOUBLE)), 6) AS rho
        |FROM m""".stripMargin.trim,

    // Kendall tau-b over the bounded (quantity, discount) cell grid:
    // concordant/discordant mass from the cell self-join under strict
    // x order, tie terms from the marginals — all integral; the doubled
    // identities cancel ((nc-nd)*2 / (2*sqrt((n0-n1)(n0-n2))))
    "q_kendall" ->
      """WITH f AS (SELECT CAST(round(l_quantity * 100.0) AS BIGINT) AS x,
        |    CAST(round(l_discount * 100.0) AS BIGINT) AS y FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
        |cells AS (SELECT x, y, count(*)::BIGINT AS cnt FROM f GROUP BY 1, 2),
        |pr AS (SELECT
        |    coalesce(sum(CASE WHEN c1.y < c2.y
        |      THEN c1.cnt::HUGEINT * c2.cnt ELSE 0 END), 0) AS nc,
        |    coalesce(sum(CASE WHEN c1.y > c2.y
        |      THEN c1.cnt::HUGEINT * c2.cnt ELSE 0 END), 0) AS nd
        |  FROM cells c1 JOIN cells c2 ON c1.x < c2.x),
        |mar AS (SELECT sum(cnt)::HUGEINT AS n FROM cells),
        |tx AS (SELECT sum(t::HUGEINT * t) - (SELECT n FROM mar) AS t2
        |  FROM (SELECT x, sum(cnt)::BIGINT AS t FROM cells GROUP BY 1)),
        |ty AS (SELECT sum(t::HUGEINT * t) - (SELECT n FROM mar) AS t2
        |  FROM (SELECT y, sum(cnt)::BIGINT AS t FROM cells GROUP BY 1))
        |SELECT mar.n::BIGINT AS n, pr.nc::BIGINT AS nc, pr.nd::BIGINT AS nd,
        |  round((pr.nc - pr.nd)::DOUBLE * 2.0
        |    / (sqrt((mar.n * (mar.n - 1) - tx.t2)::DOUBLE)
        |       * sqrt((mar.n * (mar.n - 1) - ty.t2)::DOUBLE)), 6) AS tau_b
        |FROM mar, tx, ty, pr""".stripMargin.trim,

    // Welch's t: exact HUGEINT cent moments per group, then the
    // engine's exact closed-form order of operations
    "q_welch_t" ->
      """WITH m AS (SELECT l_returnflag AS g, count(*)::HUGEINT AS n,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::HUGEINT AS s,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)::HUGEINT
        |        * CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS ss
        |  FROM lineitem
        |  WHERE l_returnflag IN ('R', 'A') AND l_extendedprice IS NOT NULL
        |  GROUP BY 1),
        |a AS (SELECT n::DOUBLE AS nd, n::BIGINT AS nl,
        |    s::DOUBLE / 100.0::DOUBLE / n::DOUBLE AS mean,
        |    (n * ss - s * s)::DOUBLE / 10000.0::DOUBLE
        |      / (n::DOUBLE * (n::DOUBLE - 1.0::DOUBLE)) AS v
        |  FROM m WHERE g = 'R'),
        |b AS (SELECT n::DOUBLE AS nd, n::BIGINT AS nl,
        |    s::DOUBLE / 100.0::DOUBLE / n::DOUBLE AS mean,
        |    (n * ss - s * s)::DOUBLE / 10000.0::DOUBLE
        |      / (n::DOUBLE * (n::DOUBLE - 1.0::DOUBLE)) AS v
        |  FROM m WHERE g = 'A')
        |SELECT a.nl AS n_a, b.nl AS n_b,
        |  round(a.mean, 6) AS mean_a, round(b.mean, 6) AS mean_b,
        |  round((a.mean - b.mean)
        |    / sqrt(a.v / a.nd + b.v / b.nd), 6) AS t_stat,
        |  round((a.v / a.nd + b.v / b.nd) * (a.v / a.nd + b.v / b.nd)
        |    / ((a.v / a.nd) * (a.v / a.nd) / (a.nd - 1.0::DOUBLE)
        |       + (b.v / b.nd) * (b.v / b.nd) / (b.nd - 1.0::DOUBLE)), 6)
        |    AS df_welch
        |FROM a, b""".stripMargin.trim,

    // Benford: first digit from the DECIMAL STRING of the cent integer
    // (no log10 on data); expected probabilities are shared 12-digit
    // literals, so the chi terms are identical IEEE trees
    "q_benford" ->
      """WITH c AS (SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT)
        |    AS cents FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |d AS (SELECT CAST(substring(cents::VARCHAR, 1, 1) AS INTEGER) AS digit,
        |    count(*)::BIGINT AS n_obs FROM c WHERE cents > 0 GROUP BY 1),
        |e (digit, p_exp) AS (VALUES
        |  (1, 0.301029995664::DOUBLE), (2, 0.176091259056::DOUBLE),
        |  (3, 0.124938736608::DOUBLE), (4, 0.096910013008::DOUBLE),
        |  (5, 0.079181246048::DOUBLE), (6, 0.066946789631::DOUBLE),
        |  (7, 0.057991946978::DOUBLE), (8, 0.051152522447::DOUBLE),
        |  (9, 0.045757490561::DOUBLE)),
        |t AS (SELECT sum(n_obs)::BIGINT AS n_total FROM d)
        |SELECT e.digit, coalesce(d.n_obs, 0)::BIGINT AS n_obs,
        |  ((coalesce(d.n_obs, 0) * 1000000) // n_total)::BIGINT AS obs_ppm,
        |  round((coalesce(d.n_obs, 0)::DOUBLE - n_total::DOUBLE * e.p_exp)
        |    * (coalesce(d.n_obs, 0)::DOUBLE - n_total::DOUBLE * e.p_exp)
        |    / (n_total::DOUBLE * e.p_exp), 6) AS chi_term
        |FROM e LEFT JOIN d ON e.digit = d.digit, t
        |ORDER BY e.digit""".stripMargin.trim,

    // CUPED: per-user pre/post cent sums split at min-date + 15d,
    // pooled theta from the summed per-variant HUGEINT moments, the
    // engine's exact adjustment order of operations
    "q_cuped" ->
      """WITH base AS (SELECT user_id, ts,
        |    CAST(round(value * 100.0) AS BIGINT) AS vc
        |  FROM events WHERE value IS NOT NULL),
        |md AS (SELECT min(ts::DATE) AS d0 FROM base),
        |users AS (SELECT user_id % 2 AS variant,
        |    sum(CASE WHEN datediff('day', d0, ts::DATE) < 15
        |      THEN vc ELSE 0 END)::BIGINT AS pre_c,
        |    sum(CASE WHEN datediff('day', d0, ts::DATE) >= 15
        |      THEN vc ELSE 0 END)::BIGINT AS post_c
        |  FROM base, md GROUP BY user_id),
        |pv AS (SELECT variant, count(*)::HUGEINT AS n,
        |    sum(pre_c)::HUGEINT AS sx, sum(post_c)::HUGEINT AS sy,
        |    sum(pre_c::HUGEINT * pre_c) AS sxx,
        |    sum(pre_c::HUGEINT * post_c) AS sxy
        |  FROM users GROUP BY 1),
        |tot AS (SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
        |    sum(sxx) AS sxx, sum(sxy) AS sxy FROM pv),
        |th AS (SELECT (n * sxy - sx * sy)::DOUBLE
        |      / (n * sxx - sx * sx)::DOUBLE AS theta,
        |    sx::DOUBLE / n::DOUBLE AS pre_all FROM tot)
        |SELECT pv.variant::BIGINT AS variant, pv.n::BIGINT AS n_users,
        |  round(sy::DOUBLE / pv.n::DOUBLE / 100.0::DOUBLE, 6) AS mean_post,
        |  round((sy::DOUBLE / pv.n::DOUBLE
        |    - th.theta * (sx::DOUBLE / pv.n::DOUBLE - th.pre_all))
        |    / 100.0::DOUBLE, 6) AS mean_adj,
        |  round(th.theta, 6) AS theta
        |FROM pv, th ORDER BY variant""".stripMargin.trim,

    // ACF over the zero-filled daily revenue grid — every moment is a
    // HUGEINT over the bounded calendar series; one double division
    "q_acf" ->
      """WITH pd AS (SELECT o_orderdate::DATE AS d,
        |    sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT AS xc
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
        |  GROUP BY 1),
        |bnd AS (SELECT min(d) AS d0, max(d) AS d1 FROM pd),
        |cal AS (SELECT unnest(range(0, datediff('day', d0, d1) + 1)) AS t
        |  FROM bnd),
        |idx AS (SELECT datediff('day', bnd.d0, pd.d)::BIGINT AS t, xc
        |  FROM pd, bnd),
        |x AS (SELECT cal.t, coalesce(idx.xc, 0)::BIGINT AS xc
        |  FROM cal LEFT JOIN idx ON cal.t = idx.t),
        |g AS (SELECT count(*)::HUGEINT AS n, sum(xc)::HUGEINT AS s,
        |    sum(xc::HUGEINT * xc) AS sxx FROM x),
        |ks AS (SELECT unnest(range(1, 8)) AS k),
        |pk AS (SELECT ks.k::BIGINT AS k,
        |    sum(a.xc::HUGEINT * b.xc) AS sxy,
        |    sum(a.xc)::HUGEINT AS h, sum(b.xc)::HUGEINT AS tt
        |  FROM ks, x a JOIN x b ON b.t = a.t + ks.k GROUP BY 1)
        |SELECT pk.k AS lag, g.n::BIGINT AS n_days,
        |  round((g.n * g.n * pk.sxy - g.n * g.s * (pk.h + pk.tt)
        |      + (g.n - pk.k) * g.s * g.s)::DOUBLE
        |    / (g.n * g.n * g.sxx - g.n * g.s * g.s)::DOUBLE, 6) AS acf
        |FROM pk, g ORDER BY lag""".stripMargin.trim,

    // lexical diversity: integral Simpson/TTR ppm; entropy follows the
    // q_kl_mix ln-sum discipline (one rounded double per slice)
    "q_token_entropy" ->
      """WITH w AS (SELECT source AS slice,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
        |c AS (SELECT slice, w, count(*)::BIGINT AS c FROM w GROUP BY 1, 2),
        |t AS (SELECT slice, sum(c)::BIGINT AS n, count(*)::BIGINT AS vocab,
        |    sum(c * (c - 1))::BIGINT AS rp FROM c GROUP BY 1)
        |SELECT t.slice, t.n AS n_tokens, t.vocab,
        |  (rp * 1000000 // (n * (n - 1)))::BIGINT AS simpson_ppm,
        |  (vocab * 1000000 // n)::BIGINT AS ttr_ppm,
        |  round(sum((c.c::DOUBLE / t.n::DOUBLE)
        |      * ln(t.n::DOUBLE / c.c::DOUBLE)) / ln(2.0::DOUBLE), 6)
        |    AS entropy_bits
        |FROM c JOIN t ON c.slice = t.slice
        |GROUP BY t.slice, t.n, t.vocab, t.rp ORDER BY t.slice""".stripMargin.trim,

    // profile drift: exact per-column null rates and distinct counts
    // on each side of the day-15 split
    "q_profile_drift" ->
      """WITH d0 AS (SELECT min(ts::DATE) AS d FROM events),
        |a AS (SELECT * FROM events, d0 WHERE datediff('day', d0.d, ts::DATE) < 15),
        |b AS (SELECT * FROM events, d0 WHERE datediff('day', d0.d, ts::DATE) >= 15),
        |ma AS (SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT AS nu1,
        |    count(DISTINCT event_type)::BIGINT AS di1,
        |    sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS nu2,
        |    count(DISTINCT value)::BIGINT AS di2,
        |    sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS nu3,
        |    count(DISTINCT props)::BIGINT AS di3 FROM a),
        |mb AS (SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT AS nu1,
        |    count(DISTINCT event_type)::BIGINT AS di1,
        |    sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS nu2,
        |    count(DISTINCT value)::BIGINT AS di2,
        |    sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS nu3,
        |    count(DISTINCT props)::BIGINT AS di3 FROM b),
        |u AS (
        |  SELECT 'event_type' AS "column", ma.n AS n_a, mb.n AS n_b,
        |    ma.nu1 AS nua, mb.nu1 AS nub, ma.di1 AS distinct_a,
        |    mb.di1 AS distinct_b FROM ma, mb
        |  UNION ALL
        |  SELECT 'value', ma.n, mb.n, ma.nu2, mb.nu2, ma.di2, mb.di2
        |  FROM ma, mb
        |  UNION ALL
        |  SELECT 'props', ma.n, mb.n, ma.nu3, mb.nu3, ma.di3, mb.di3
        |  FROM ma, mb)
        |SELECT "column", n_a, n_b,
        |  (nua * 1000000 // n_a)::BIGINT AS null_ppm_a,
        |  (nub * 1000000 // n_b)::BIGINT AS null_ppm_b,
        |  distinct_a, distinct_b,
        |  ((nub * 1000000 // n_b) - (nua * 1000000 // n_a))::BIGINT
        |    AS null_drift_ppm
        |FROM u ORDER BY "column"""".stripMargin.trim,

    // exact quantized covariance: parallel unnest zips (value, index);
    // HUGEINT moments, the engine's double finish
    "q_embed_cov" ->
      """WITH e AS (SELECT vec_id, unnest(embedding) AS v,
        |    unnest(range(1, len(embedding) + 1)) AS i
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |q AS (SELECT vec_id, i,
        |    CAST(round(v::DOUBLE * 1000.0) AS BIGINT) AS qv FROM e),
        |g AS (SELECT count(DISTINCT vec_id)::HUGEINT AS n FROM q),
        |s AS (SELECT i, sum(qv)::HUGEINT AS si FROM q GROUP BY 1),
        |p AS (SELECT a.i AS i, b.i AS j, sum(a.qv::HUGEINT * b.qv) AS pij
        |  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2)
        |SELECT (p.i - 1)::INTEGER AS i, (p.j - 1)::INTEGER AS j,
        |  round((g.n * p.pij - sa.si * sb.si)::DOUBLE
        |    / (g.n::DOUBLE * g.n::DOUBLE) / 1000000.0::DOUBLE, 6)
        |    + 0.0::DOUBLE AS cov
        |FROM p JOIN s sa ON p.i = sa.i JOIN s sb ON p.j = sb.i, g
        |ORDER BY i, j""".stripMargin.trim,

    // LOO target encoding: the distinct (category, y) table with the
    // engine's smoothing formula — counts exact, two double divisions
    "q_target_encode" ->
      """WITH base AS (SELECT l_returnflag AS category,
        |    CASE WHEN CAST(round(l_discount * 100.0) AS BIGINT) >= 6
        |      THEN 1 ELSE 0 END::BIGINT AS y
        |  FROM lineitem WHERE l_returnflag IS NOT NULL),
        |pc AS (SELECT category, count(*)::BIGINT AS n_cat,
        |    sum(y)::BIGINT AS sum_y FROM base GROUP BY 1),
        |gl AS (SELECT count(*)::BIGINT AS n_all, sum(y)::BIGINT AS s_all
        |  FROM base),
        |dv AS (SELECT DISTINCT category, y FROM base)
        |SELECT dv.category, dv.y, pc.n_cat, pc.sum_y,
        |  round((pc.sum_y::DOUBLE - dv.y::DOUBLE
        |      + 10.0::DOUBLE * (gl.s_all::DOUBLE / gl.n_all::DOUBLE))
        |    / (pc.n_cat::DOUBLE - 1.0::DOUBLE + 10.0::DOUBLE), 6) AS enc
        |FROM dv JOIN pc ON dv.category = pc.category, gl
        |ORDER BY dv.category, dv.y""".stripMargin.trim,

    // WoE / IV per quantity bucket: integral counts, each double
    // rounds once (no float-sum ordering anywhere)
    "q_woe_iv" ->
      """WITH base AS (SELECT CAST(round(l_quantity) AS BIGINT) AS bucket,
        |    CASE WHEN CAST(round(l_discount * 100.0) AS BIGINT) >= 6
        |      THEN 1 ELSE 0 END::BIGINT AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |pb AS (SELECT bucket, sum(1 - y)::BIGINT AS good,
        |    sum(y)::BIGINT AS bad FROM base GROUP BY 1),
        |tot AS (SELECT sum(good)::BIGINT AS g_all, sum(bad)::BIGINT AS b_all
        |  FROM pb)
        |SELECT bucket, good, bad,
        |  round(ln((bad::HUGEINT * g_all)::DOUBLE
        |    / (good::HUGEINT * b_all)::DOUBLE), 6) AS woe,
        |  round((bad::DOUBLE / b_all::DOUBLE - good::DOUBLE / g_all::DOUBLE)
        |    * ln((bad::HUGEINT * g_all)::DOUBLE
        |      / (good::HUGEINT * b_all)::DOUBLE), 6) AS iv_term
        |FROM pb, tot WHERE good > 0 AND bad > 0
        |ORDER BY bucket""".stripMargin.trim,

    // Cohen's kappa: joint cells once, marginals from the cells,
    // kappa = (N*diag - sum(ra*rb)) / (N^2 - sum(ra*rb))
    "q_cohen_kappa" ->
      """WITH c0 AS (SELECT CAST(n_chars >= 300 AS INTEGER) AS a,
        |    CAST(length(trim(text)) >= 280 AS INTEGER) AS b FROM documents),
        |cl AS (SELECT a, b, count(*)::BIGINT AS c FROM c0
        |  WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY 1, 2),
        |nn AS (SELECT sum(c)::HUGEINT AS n FROM cl),
        |dg AS (SELECT coalesce(sum(c), 0)::HUGEINT AS diag FROM cl WHERE a = b),
        |ma AS (SELECT a, sum(c)::BIGINT AS m FROM cl GROUP BY 1),
        |mb AS (SELECT b, sum(c)::BIGINT AS m FROM cl GROUP BY 1),
        |sm AS (SELECT coalesce(sum(ma.m::HUGEINT * mb.m), 0)::HUGEINT AS sm
        |  FROM ma JOIN mb ON ma.a = mb.b)
        |SELECT nn.n::BIGINT AS n,
        |  (dg.diag * 1000000 // nn.n)::BIGINT AS agree_ppm,
        |  round((nn.n * dg.diag - sm.sm)::DOUBLE
        |    / (nn.n * nn.n - sm.sm)::DOUBLE, 6) AS kappa
        |FROM nn, dg, sm""".stripMargin.trim,

    // Kaplan-Meier: per-user lifetime + censoring flag, suffix-sum
    // n_risk over the bounded duration grid, ln S(t) as a CUMULATIVE
    // sum both engines evaluate in the same ascending order
    // hour-index lifetimes (floor(epoch/3600) == Spark's
    // floor(unix_timestamp/3600) in the UTC session; NB DuckDB // on
    // DOUBLE does NOT floor and ::BIGINT rounds), 24h churn gap — the
    // day grid is vacuous on this corpus (max gap 2 days)
    "q_kaplan_meier" ->
      """WITH dy AS (SELECT user_id AS u,
        |    floor(epoch(ts) / 3600)::BIGINT AS d FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |bnd AS (SELECT max(d) AS dmax FROM dy),
        |us AS (SELECT (max(d) - min(d))::BIGINT AS t,
        |    CASE WHEN (SELECT dmax FROM bnd) - max(d) > 24
        |      THEN 1 ELSE 0 END::BIGINT AS e
        |  FROM dy GROUP BY u),
        |grid AS (SELECT t, sum(e)::BIGINT AS d, count(*)::BIGINT AS m
        |  FROM us GROUP BY 1),
        |g2 AS (SELECT t, d, sum(m) OVER (ORDER BY t ROWS BETWEEN
        |    CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS n_risk FROM grid),
        |ev AS (SELECT t, d, n_risk,
        |    ln((n_risk - d)::DOUBLE / n_risk::DOUBLE) AS lt
        |  FROM g2 WHERE d > 0 AND n_risk > d)
        |SELECT t AS t_days, n_risk, d AS d_churn,
        |  round(sum(lt) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW), 6) AS ln_surv
        |FROM ev ORDER BY t_days""".stripMargin.trim,

    // Nelson-Aalen: the q_kaplan_meier lifetime construction, reporting
    // cumulative hazard sum(d/n) + variance sum(d/n^2); prefix sums run
    // in t-order on both engines so the double sequences are identical
    "q_nelson_aalen" ->
      """WITH dy AS (SELECT user_id AS u,
        |    floor(epoch(ts) / 3600)::BIGINT AS d FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |bnd AS (SELECT max(d) AS dmax FROM dy),
        |us AS (SELECT (max(d) - min(d))::BIGINT AS t,
        |    CASE WHEN (SELECT dmax FROM bnd) - max(d) > 24
        |      THEN 1 ELSE 0 END::BIGINT AS e
        |  FROM dy GROUP BY u),
        |grid AS (SELECT t, sum(e)::BIGINT AS d, count(*)::BIGINT AS m
        |  FROM us GROUP BY 1),
        |g2 AS (SELECT t, d, sum(m) OVER (ORDER BY t ROWS BETWEEN
        |    CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS n_risk FROM grid),
        |ev AS (SELECT t, d, n_risk, d::DOUBLE / n_risk::DOUBLE AS h,
        |    d::DOUBLE / (n_risk::DOUBLE * n_risk::DOUBLE) AS v
        |  FROM g2 WHERE d > 0)
        |SELECT t AS t_days, n_risk, d AS d_churn,
        |  round(sum(h) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW), 6) AS na_hazard,
        |  round(sum(v) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW), 6) AS na_var
        |FROM ev ORDER BY t_days""".stripMargin.trim,

    // G-test: q_chi2's count shape; one rounded-term decimal sum, zero
    // cells contribute exactly 0 so only observed cells appear
    "q_g_test" ->
      """WITH base AS (SELECT o_orderpriority AS a, o_orderstatus AS b
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL),
        |nn AS (SELECT count(*)::BIGINT AS n FROM base),
        |j AS (SELECT a, b, count(*)::BIGINT AS n_ab FROM base GROUP BY a, b),
        |ma AS (SELECT a, count(*)::BIGINT AS n_a FROM base GROUP BY a),
        |mb AS (SELECT b, count(*)::BIGINT AS n_b FROM base GROUP BY b),
        |ka AS (SELECT count(*)::BIGINT AS c FROM ma),
        |kb AS (SELECT count(*)::BIGINT AS c FROM mb),
        |g AS (SELECT sum(round(
        |    n_ab::DOUBLE * ln(n_ab::DOUBLE * n
        |      / (n_a::DOUBLE * n_b::DOUBLE)),
        |    9)::DECIMAL(38,9)) * 2 AS v
        |  FROM j JOIN ma USING (a) JOIN mb USING (b), nn)
        |SELECT nn.n, ((ka.c - 1) * (kb.c - 1))::BIGINT AS dof,
        |  round(g.v, 6)::DOUBLE AS g_stat
        |FROM nn, g, ka, kb""".stripMargin.trim,

    // Jarque-Bera: exact HUGEINT power sums through x^4; standardized
    // moments are unit-invariant so cents cancel except in the mean
    "q_jarque_bera" ->
      """WITH c AS (SELECT l_returnflag AS g,
        |    CAST(round(l_extendedprice * 100.0) AS BIGINT)::HUGEINT AS xc
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL),
        |m AS (SELECT g, count(*)::HUGEINT AS n, sum(xc)::HUGEINT AS s1,
        |    sum(xc * xc)::HUGEINT AS s2, sum(xc * xc * xc)::HUGEINT AS s3,
        |    sum(xc * xc * xc * xc)::HUGEINT AS s4 FROM c GROUP BY 1),
        |f AS (SELECT g, n::BIGINT AS nl, n::DOUBLE AS nd,
        |    s1::DOUBLE / n::DOUBLE AS m1, s2::DOUBLE / n::DOUBLE AS r2,
        |    s3::DOUBLE / n::DOUBLE AS r3, s4::DOUBLE / n::DOUBLE AS r4
        |  FROM m),
        |k AS (SELECT g, nl, nd, m1, r2 - m1 * m1 AS mu2,
        |    r3 - 3.0::DOUBLE * m1 * r2 + 2.0::DOUBLE * m1 * m1 * m1 AS mu3,
        |    r4 - 4.0::DOUBLE * m1 * r3 + 6.0::DOUBLE * m1 * m1 * r2
        |      - 3.0::DOUBLE * m1 * m1 * m1 * m1 AS mu4 FROM f),
        |z AS (SELECT g, nl, nd, m1, mu2,
        |    mu3 / (mu2 * sqrt(mu2)) AS skew,
        |    mu4 / (mu2 * mu2) - 3.0::DOUBLE AS exk FROM k)
        |SELECT g, nl AS n, round(m1 / 100.0::DOUBLE, 6) AS mean,
        |  round(skew, 6) AS skewness, round(exk, 6) AS ex_kurtosis,
        |  round(nd / 6.0::DOUBLE * (skew * skew + exk * exk / 4.0::DOUBLE),
        |    6) AS jb
        |FROM z ORDER BY g""".stripMargin.trim,

    // Grubbs: deviation ranking on the EXACT integral |x_c*n - s1|;
    // only the closed-form finish converts to double (unit cancels)
    "q_grubbs" ->
      """WITH b AS (SELECT c_mktsegment AS g,
        |    CAST(round(c_acctbal * 100.0) AS BIGINT)::HUGEINT AS xc
        |  FROM customer
        |  WHERE c_acctbal IS NOT NULL AND c_mktsegment IS NOT NULL),
        |st AS (SELECT g, count(*)::HUGEINT AS n, sum(xc)::HUGEINT AS s1,
        |    sum(xc * xc)::HUGEINT AS s2 FROM b GROUP BY 1),
        |d AS (SELECT b.g, abs(b.xc * st.n - st.s1) AS d
        |  FROM b JOIN st USING (g)),
        |mx AS (SELECT g, max(d) AS dmax FROM d GROUP BY 1),
        |am AS (SELECT g, count(*)::BIGINT AS n_at_max
        |  FROM d JOIN mx USING (g) WHERE d = dmax GROUP BY g),
        |f AS (SELECT st.g, st.n::BIGINT AS nl, st.n::DOUBLE AS nd,
        |    st.s1::DOUBLE AS s1d,
        |    (st.n * st.s2 - st.s1 * st.s1)::DOUBLE
        |      / (st.n::DOUBLE * (st.n::DOUBLE - 1.0::DOUBLE)) AS varc,
        |    mx.dmax::DOUBLE AS dmaxd, am.n_at_max
        |  FROM st JOIN mx USING (g) JOIN am USING (g))
        |SELECT g, nl AS n, round(s1d / nd / 100.0::DOUBLE, 6) AS mean,
        |  round(sqrt(varc) / 100.0::DOUBLE, 6) AS sd,
        |  round(dmaxd / nd / sqrt(varc), 6) AS g_stat, n_at_max
        |FROM f ORDER BY g""".stripMargin.trim,

    // BH/Holm: per-event-type two-proportion z (q_ab_test's tree), p =
    // Chernoff bound exp(-z^2/2) of the ROUNDED z; the step-up/step-down
    // envelopes are suffix-min / prefix-max in rank order
    "q_bh_fdr" ->
      """WITH pu AS (SELECT event_type, user_id, count(*)::BIGINT AS c
        |  FROM events GROUP BY 1, 2),
        |cells AS (SELECT event_type,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN user_id % 2 = 0 AND c >= 15 THEN 1 ELSE 0
        |      END)::BIGINT AS conv_a,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN user_id % 2 = 1 AND c >= 15 THEN 1 ELSE 0
        |      END)::BIGINT AS conv_b
        |  FROM pu GROUP BY 1),
        |z AS (SELECT event_type, round(
        |    (conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b) /
        |    sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b))
        |      * (1.0::DOUBLE - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
        |      * (1.0::DOUBLE / n_a + 1.0::DOUBLE / n_b)), 6) AS zv
        |  FROM cells),
        |p AS (SELECT event_type, exp(-0.5::DOUBLE * zv * zv) AS p FROM z),
        |r AS (SELECT event_type, p,
        |    row_number() OVER (ORDER BY p, event_type) AS rank,
        |    count(*) OVER () AS m FROM p),
        |s AS (SELECT event_type, p, rank,
        |    p * m / rank AS q, p * (m - rank + 1) AS h FROM r),
        |adj AS (SELECT event_type, p, rank,
        |    min(q) OVER (ORDER BY rank ROWS BETWEEN CURRENT ROW AND
        |      UNBOUNDED FOLLOWING) AS bh,
        |    max(h) OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS hm
        |  FROM s)
        |SELECT event_type, round(p, 6) AS p_raw, rank,
        |  round(least(bh, 1.0::DOUBLE), 6) AS p_bh,
        |  round(least(hm, 1.0::DOUBLE), 6) AS p_holm
        |FROM adj ORDER BY rank""".stripMargin.trim,

    // mutual-kNN graph: brute all-pairs cosine rank + a reversed-edge
    // self-join for the mutual flag
    "q_knn_graph" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id < 2000),
        |s AS (SELECT a.vec_id AS src, b.vec_id AS dst,
        |    list_cosine_similarity(a.v, b.v) AS cos,
        |    row_number() OVER (PARTITION BY a.vec_id
        |      ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id)
        |      AS rank
        |  FROM c a, c b WHERE a.vec_id != b.vec_id),
        |t AS (SELECT * FROM s WHERE rank <= 3)
        |SELECT t.src, t.dst, t.rank, round(t.cos, 4) AS cos,
        |  (m.src IS NOT NULL) AS mutual
        |FROM t LEFT JOIN t m ON m.src = t.dst AND m.dst = t.src
        |ORDER BY t.src, t.rank""".stripMargin.trim,

    // pre-filtered ANN: exact brute top-k over the label-filtered corpus
    "q_ann_filtered" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
        |  FROM embeddings WHERE label = 1),
        |s AS (SELECT query_id, neighbor_id,
        |    list_cosine_similarity(qv, cv) AS cos,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id)
        |      AS rank
        |  FROM q, c WHERE query_id != neighbor_id)
        |SELECT query_id, rank, neighbor_id, round(cos, 4) AS cos
        |FROM s WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin.trim,

    // LSH band planner: enumerate b*r <= 64, FP+FN S-curve area on the
    // 1% grid with per-term round-9 decimal sums (argmin ties -> b, r),
    // then the winner's S-curve at 5% steps
    "q_lsh_plan" ->
      """WITH cand AS (SELECT g1.b::INT AS b, g2.r::INT AS r
        |  FROM generate_series(1, 64) g1(b), generate_series(1, 64) g2(r)
        |  WHERE g1.b * g2.r <= 64),
        |grid AS (SELECT i FROM generate_series(1, 99) g(i)),
        |terms AS (SELECT b, r, i,
        |    1.0::DOUBLE - power(1.0::DOUBLE
        |      - power(i::DOUBLE / 100.0::DOUBLE, r), b) AS p
        |  FROM cand, grid),
        |obj AS (SELECT b, r, sum(round(CASE
        |      WHEN i::DOUBLE / 100.0::DOUBLE < 0.6::DOUBLE
        |      THEN 0.5::DOUBLE * p
        |      ELSE 0.5::DOUBLE * (1.0::DOUBLE - p) END,
        |    9)::DECIMAL(38,9)) AS o
        |  FROM terms GROUP BY b, r),
        |best AS (SELECT b, r FROM obj ORDER BY o, b, r LIMIT 1)
        |SELECT best.b::BIGINT AS bands, best.r::BIGINT AS rows_per_band,
        |  (best.b * best.r)::BIGINT AS n_hashes, (sp * 5)::BIGINT AS s_pct,
        |  round(1.0::DOUBLE - power(1.0::DOUBLE
        |    - power((sp * 5)::DOUBLE / 100.0::DOUBLE, best.r), best.b), 6)
        |    AS p_candidate
        |FROM best, generate_series(1, 19) g(sp)
        |ORDER BY s_pct""".stripMargin.trim,

    // multi-touch attribution: ppm weights are pure integer arithmetic
    // with remainders to the LAST touch, so credit mass is conserved
    // exactly and every aggregate is order-free
    "q_multi_touch" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS cus,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, min(event_type) AS channel,
        |    epoch_us(ts) AS tus
        |  FROM events WHERE event_type IN ('view', 'click')
        |  GROUP BY user_id, ts),
        |j AS (SELECT p.event_id, p.cents, t.channel, t.tus
        |  FROM p LEFT JOIN t ON p.user_id = t.user_id
        |    AND t.tus <= p.cus AND p.cus - t.tus <= 7200000000),
        |r AS (SELECT event_id, cents, channel, tus,
        |    row_number() OVER (PARTITION BY event_id
        |      ORDER BY tus ASC NULLS FIRST, channel) AS pos,
        |    count(tus) OVER (PARTITION BY event_id) AS n
        |  FROM j),
        |wts AS (SELECT event_id, cents, n,
        |    CASE WHEN n = 0 THEN 'none' ELSE channel END AS channel,
        |    CASE WHEN n = 0 THEN 1000000
        |      ELSE 1000000 // n + CASE WHEN pos = n
        |        THEN 1000000 % n ELSE 0 END END AS lw,
        |    CASE WHEN n = 0 THEN 1000000
        |      WHEN n = 1 THEN 1000000
        |      WHEN n = 2 THEN 500000
        |      WHEN pos = 1 OR pos = n THEN 400000
        |      ELSE 200000 // (n - 2) + CASE WHEN pos = n - 1
        |        THEN 200000 % (n - 2) ELSE 0 END END AS uw
        |  FROM r)
        |SELECT channel,
        |  sum(CASE WHEN n > 0 THEN 1 ELSE 0 END)::BIGINT AS touches,
        |  sum(lw::HUGEINT * cents)::BIGINT AS linear_micro_cents,
        |  sum(uw::HUGEINT * cents)::BIGINT AS ushape_micro_cents
        |FROM wts GROUP BY channel ORDER BY channel""".stripMargin.trim,

    // decision stump: prefix class counts over the distinct-value grid;
    // the Gini ordering is pure +,-,*,/ on exact longs so both engines
    // rank candidates by identical doubles
    "q_stump" ->
      """WITH b AS (SELECT CAST(round(value * 100.0) AS BIGINT) AS x,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END::BIGINT AS y
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT x, count(*)::BIGINT AS n, sum(y)::BIGINT AS p
        |  FROM b GROUP BY 1),
        |t AS (SELECT sum(n)::BIGINT AS nn, sum(p)::BIGINT AS pp FROM g),
        |c AS (SELECT x, sum(n) OVER (ORDER BY x)::BIGINT AS n1,
        |    sum(p) OVER (ORDER BY x)::BIGINT AS p1 FROM g),
        |s AS (SELECT x, n1, p1, nn - n1 AS n2, pp - p1 AS p2, nn, pp
        |  FROM c, t WHERE n1 < nn),
        |e AS (SELECT x, n1, p1, n2, p2, nn, pp,
        |    1.0::DOUBLE - (p1::DOUBLE / n1::DOUBLE) * (p1::DOUBLE / n1::DOUBLE)
        |      - ((n1 - p1)::DOUBLE / n1::DOUBLE)
        |        * ((n1 - p1)::DOUBLE / n1::DOUBLE) AS gl,
        |    1.0::DOUBLE - (p2::DOUBLE / n2::DOUBLE) * (p2::DOUBLE / n2::DOUBLE)
        |      - ((n2 - p2)::DOUBLE / n2::DOUBLE)
        |        * ((n2 - p2)::DOUBLE / n2::DOUBLE) AS gr,
        |    1.0::DOUBLE - (pp::DOUBLE / nn::DOUBLE) * (pp::DOUBLE / nn::DOUBLE)
        |      - ((nn - pp)::DOUBLE / nn::DOUBLE)
        |        * ((nn - pp)::DOUBLE / nn::DOUBLE) AS gp
        |  FROM s),
        |w AS (SELECT x, n1, p1, n2, p2, gp,
        |    (n1::DOUBLE * gl + n2::DOUBLE * gr) / nn::DOUBLE AS wg
        |  FROM e ORDER BY wg, x LIMIT 1)
        |SELECT x AS threshold_cents, n1 AS n_left, p1 AS pos_left,
        |  n2 AS n_right, p2 AS pos_right,
        |  round(wg, 6) AS gini_split, round(gp, 6) AS gini_parent,
        |  round(gp - wg, 6) + 0.0 AS gain
        |FROM w""".stripMargin.trim,

    // hapax/dis legomena: q_vocab's tokenizer, per-source occurrence
    // counts, integral floor-division ratios
    "q_hapax" ->
      """WITH w AS (SELECT source AS slice,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        |c AS (SELECT slice, w, count(*)::BIGINT AS c FROM w GROUP BY 1, 2),
        |a AS (SELECT slice, sum(c)::BIGINT AS n_tokens,
        |    count(*)::BIGINT AS vocab,
        |    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax,
        |    sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS dis
        |  FROM c GROUP BY 1)
        |SELECT slice, n_tokens, vocab, hapax, dis,
        |  (vocab * 1000000 // n_tokens)::BIGINT AS ttr_ppm,
        |  (hapax * 1000000 // vocab)::BIGINT AS hapax_share_ppm
        |FROM a ORDER BY slice""".stripMargin.trim,

    // Theil-Sen: median of all pairwise day-grid slopes; even counts
    // average the two middle values (commutative two-term mean)
    "q_theil_sen" ->
      """WITH pd AS (SELECT o_orderdate::DATE AS d,
        |    sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT AS y
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
        |  GROUP BY 1),
        |bb AS (SELECT min(d) AS d0 FROM pd),
        |idx AS (SELECT datediff('day', bb.d0, pd.d)::BIGINT AS t, y
        |  FROM pd, bb),
        |sl AS (SELECT (b2.y - a2.y)::DOUBLE / (b2.t - a2.t)::DOUBLE AS s
        |  FROM idx a2 JOIN idx b2 ON a2.t < b2.t),
        |r AS (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM sl),
        |st AS (SELECT (SELECT count(*) FROM idx)::BIGINT AS n_days,
        |    count(*)::BIGINT AS n_pairs FROM sl)
        |SELECT st.n_days, st.n_pairs,
        |  round(avg(r.s) / 100.0::DOUBLE, 6) AS slope_per_day
        |FROM r, st
        |WHERE rn = (n_pairs + 1) // 2 OR rn = (n_pairs + 2) // 2
        |GROUP BY st.n_days, st.n_pairs""".stripMargin.trim,

    // HHI: integral share-squared concentration per group
    "q_hhi" ->
      """WITH rr AS (SELECT l_returnflag AS g, l_suppkey AS e,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::BIGINT AS r
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_suppkey IS NOT NULL
        |  GROUP BY 1, 2),
        |h AS (SELECT g, count(*)::BIGINT AS n_entities,
        |    sum(r)::HUGEINT AS tot, sum(r::HUGEINT * r) AS sq,
        |    max(r)::HUGEINT AS top FROM rr GROUP BY 1)
        |SELECT g AS l_returnflag, n_entities, tot::BIGINT AS total_units,
        |  ((sq * 1000000) // (tot * tot))::BIGINT AS hhi_ppm,
        |  ((top * 1000000) // tot)::BIGINT AS top_share_ppm
        |FROM h WHERE tot > 0 ORDER BY g""".stripMargin.trim,

    // JSD between src0 and src1 over the same md5 bucket kernel and
    // +1 smoothing as q_kl_mix; one rounded ln-sum
    "q_jsd" ->
      """WITH w AS (SELECT source AS slice,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |  FROM documents
        |  WHERE source IN ('src0', 'src1') AND text IS NOT NULL),
        |c AS (SELECT slice, ('0x' || substr(md5(w), 1, 8))::BIGINT % 1024 AS b,
        |    count(*)::BIGINT AS c FROM w GROUP BY 1, 2),
        |grid AS (SELECT g.b, coalesce(ca.c, 0)::BIGINT AS ca,
        |    coalesce(cb.c, 0)::BIGINT AS cb
        |  FROM (SELECT unnest(range(0, 1024)) AS b) g
        |  LEFT JOIN (SELECT b, c FROM c WHERE slice = 'src0') ca ON g.b = ca.b
        |  LEFT JOIN (SELECT b, c FROM c WHERE slice = 'src1') cb ON g.b = cb.b),
        |t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM grid),
        |terms AS (SELECT na, nb,
        |    (ca::DOUBLE + 1.0::DOUBLE) / (na::DOUBLE + 1024.0::DOUBLE) AS p,
        |    (cb::DOUBLE + 1.0::DOUBLE) / (nb::DOUBLE + 1024.0::DOUBLE) AS q
        |  FROM grid, t)
        |SELECT na AS n_a, nb AS n_b,
        |  round(sum(0.5 * p * ln(p / ((p + q) * 0.5))
        |      + 0.5 * q * ln(q / ((p + q) * 0.5))) / ln(2.0::DOUBLE), 6)
        |    AS jsd_bits
        |FROM terms GROUP BY na, nb""".stripMargin.trim,

    // Hill tail index from the top-101 order statistics
    "q_hill_tail" ->
      """WITH v AS (SELECT n_chars::BIGINT AS x FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0),
        |t AS (SELECT x, row_number() OVER (ORDER BY x DESC) AS rn FROM v),
        |k1 AS (SELECT x AS xt FROM t WHERE rn = 101),
        |s AS (SELECT sum(ln(t.x::DOUBLE / k1.xt::DOUBLE)) AS sl
        |  FROM t, k1 WHERE rn <= 100)
        |SELECT 100::BIGINT AS k, k1.xt AS x_tail,
        |  round(100.0::DOUBLE / s.sl, 6) AS hill_alpha
        |FROM k1, s""".stripMargin.trim,

    // cluster-size histogram over the shared near-dup CC reachability
    "q_cluster_sizes" ->
      s"""$nearDupClusterCte,
         |mem AS (SELECT id, min(r) AS c FROM reach GROUP BY id),
         |sz AS (SELECT c, count(*)::BIGINT AS size FROM mem GROUP BY 1)
         |SELECT size, count(*)::BIGINT AS n_clusters,
         |  (size * count(*))::BIGINT AS n_docs
         |FROM sz GROUP BY size ORDER BY size""".stripMargin.trim,

    // top movers: exact integer deltas make the top-10 selection
    // deterministic (abs desc, then series/period)
    "q_top_movers" ->
      """WITH per AS (
        |  SELECT event_type AS series, date_trunc('week', ts) AS period,
        |         sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
        |  FROM events GROUP BY 1, 2),
        |prev AS (SELECT series, period + INTERVAL 7 DAY AS period,
        |                sum_cents AS sum_cents_prev FROM per)
        |SELECT p.series, p.period, p.sum_cents, v.sum_cents_prev,
        |  (p.sum_cents - v.sum_cents_prev)::BIGINT AS delta_cents
        |FROM per p JOIN prev v USING (series, period)
        |ORDER BY abs(p.sum_cents - v.sum_cents_prev) DESC, p.series, p.period
        |LIMIT 10""".stripMargin.trim,

    // lateness histogram: exclusive running max over arrival order
    // (the engine's two-pass prefix scan == one ordered window here)
    "q_lateness" ->
      """WITH r AS (SELECT event_id AS seq, floor(epoch(ts))::BIGINT AS t
        |  FROM events WHERE event_id IS NOT NULL AND ts IS NOT NULL),
        |p AS (SELECT t, max(t) OVER (ORDER BY seq ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM r),
        |l AS (SELECT CASE WHEN pm IS NULL THEN 0
        |    ELSE greatest(0, pm - t) END::BIGINT AS lat FROM p)
        |SELECT ((lat // 600) * 600)::BIGINT AS bucket_start_s,
        |  count(*)::BIGINT AS n_events
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin.trim,

    // new-user growth: per-actor first-seen day, cumulative over the
    // bounded day grid
    "q_user_growth" ->
      """WITH fs AS (SELECT user_id, min(ts::DATE) AS d FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
        |nd AS (SELECT d, count(*)::BIGINT AS new_users FROM fs GROUP BY 1)
        |SELECT d, new_users,
        |  sum(new_users) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)::BIGINT AS cum_users
        |FROM nd ORDER BY d""".stripMargin.trim,

    // stickiness: the exact rolling-distinct table + one floored ppm
    "q_stickiness" ->
      """WITH days AS (SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |dau AS (SELECT d, count(*)::BIGINT AS dau FROM days GROUP BY d),
        |ex AS (SELECT DISTINCT k, d + CAST(o AS INTEGER) AS td
        |       FROM days, generate_series(0, 6) AS g(o)),
        |wau AS (SELECT td AS d, count(*)::BIGINT AS rolling_7
        |        FROM ex GROUP BY td)
        |SELECT dau.d, dau.dau, wau.rolling_7,
        |  (dau.dau * 1000000 // wau.rolling_7)::BIGINT AS stickiness_ppm
        |FROM dau JOIN wau ON dau.d = wau.d ORDER BY dau.d""".stripMargin.trim,

    // fairness audit: per-group confusion cells, overall = sum of the
    // group rows; every rate floored ppm, every gap an integer diff
    "q_fairness" ->
      """WITH base AS (SELECT lang AS g,
        |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END::BIGINT AS p,
        |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END::BIGINT AS y
        |  FROM documents
        |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        |    AND doc_id IS NOT NULL),
        |cells AS (SELECT g, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
        |    sum(p)::BIGINT AS n_sel, sum(p * y)::BIGINT AS tp,
        |    sum(p * (1 - y))::BIGINT AS fp FROM base GROUP BY 1),
        |tot AS (SELECT sum(n)::BIGINT AS tn, sum(n_pos)::BIGINT AS tpos,
        |    sum(n_sel)::BIGINT AS tsel, sum(tp)::BIGINT AS ttp,
        |    sum(fp)::BIGINT AS tfp FROM cells)
        |SELECT g, n, n_pos,
        |  (n_sel * 1000000 // n)::BIGINT AS sel_ppm,
        |  (tp * 1000000 // n_pos)::BIGINT AS tpr_ppm,
        |  (fp * 1000000 // (n - n_pos))::BIGINT AS fpr_ppm,
        |  ((n_sel * 1000000 // n) - (tsel * 1000000 // tn))::BIGINT
        |    AS sel_gap_ppm,
        |  ((tp * 1000000 // n_pos) - (ttp * 1000000 // tpos))::BIGINT
        |    AS tpr_gap_ppm,
        |  ((fp * 1000000 // (n - n_pos))
        |    - (tfp * 1000000 // (tn - tpos)))::BIGINT AS fpr_gap_ppm
        |FROM cells, tot WHERE n_pos > 0 AND n_pos < n
        |ORDER BY g""".stripMargin.trim,

    // deterministic contrastive negatives: the Knuth hash draw with
    // positive-collision advance, over the dense vec_id space
    "q_neg_sample" ->
      """WITH nn AS (SELECT count(*)::BIGINT AS n FROM embeddings),
        |pairs AS (SELECT vec_id AS query_id,
        |    (vec_id + 7) % (SELECT n FROM nn) AS pos_id
        |  FROM embeddings WHERE vec_id < 20),
        |draws AS (SELECT unnest(range(1, 5))::BIGINT AS neg_rank),
        |h AS (SELECT query_id, pos_id, neg_rank,
        |    ((query_id % 2147483648) * 2654435761 + neg_rank * 40503)
        |      % 2147483648 % (SELECT n FROM nn) AS hv
        |  FROM pairs, draws)
        |SELECT query_id, pos_id, neg_rank,
        |  CASE WHEN hv = pos_id THEN (hv + 1) % (SELECT n FROM nn)
        |    ELSE hv END::BIGINT AS neg_id
        |FROM h ORDER BY query_id, neg_rank""".stripMargin.trim,

    // empirical-Bayes beta-binomial smoothing: the prior fitted by
    // method of moments on the floored-ppm per-key rates (exact
    // integer moments -> the engine's exact double sequence)
    "q_eb_smooth" ->
      """WITH pk AS (SELECT source AS key, count(*)::BIGINT AS t,
        |    sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)::BIGINT AS s
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
        |pr AS (SELECT key, t, s, (s * 1000000 // t)::BIGINT AS r_ppm FROM pk),
        |m AS (SELECT count(*)::HUGEINT AS k, sum(r_ppm)::HUGEINT AS sr,
        |    sum(r_ppm::HUGEINT * r_ppm) AS srr FROM pr),
        |mo AS (SELECT sr::DOUBLE / k::DOUBLE / 1000000.0::DOUBLE AS mean,
        |    (k * srr - sr * sr)::DOUBLE / (k * k)::DOUBLE
        |      / 1000000000000.0::DOUBLE AS variance FROM m),
        |ab AS (SELECT CASE WHEN variance <= 0.0
        |      OR variance >= mean * (1.0::DOUBLE - mean) THEN 0.0::DOUBLE
        |    ELSE mean * (mean * (1.0::DOUBLE - mean) / variance
        |      - 1.0::DOUBLE) END AS alpha,
        |    CASE WHEN variance <= 0.0
        |      OR variance >= mean * (1.0::DOUBLE - mean) THEN 0.0::DOUBLE
        |    ELSE (1.0::DOUBLE - mean) * (mean * (1.0::DOUBLE - mean)
        |      / variance - 1.0::DOUBLE) END AS beta
        |  FROM mo)
        |SELECT key, t AS trials, s AS successes, r_ppm AS raw_ppm,
        |  round(alpha, 6) AS alpha, round(beta, 6) AS beta,
        |  round((s::DOUBLE + alpha) / (t::DOUBLE + alpha + beta), 6)
        |    AS smoothed
        |FROM pr, ab ORDER BY key""".stripMargin.trim,

    // typed JSON field profile: extract-then-cast on both engines
    "q_json_extract" ->
      """WITH v AS (SELECT event_type AS g,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS v
        |  FROM events WHERE event_type IS NOT NULL)
        |SELECT g AS event_type, count(*)::BIGINT AS n,
        |  sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        |  min(v)::BIGINT AS min_v, max(v)::BIGINT AS max_v,
        |  sum(v)::BIGINT AS sum_v
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin.trim,

    // 3-step behavior paths: double lag over the sessionization order,
    // deterministic top-20 (count desc, path asc)
    "q_session_paths" ->
      """WITH l AS (SELECT user_id, event_type,
        |    lag(event_type, 1) OVER w AS p1, lag(event_type, 2) OVER w AS p2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |p AS (SELECT p2 || '>' || p1 || '>' || event_type AS path FROM l
        |  WHERE p1 IS NOT NULL AND p2 IS NOT NULL)
        |SELECT path, count(*)::BIGINT AS n FROM p GROUP BY 1
        |ORDER BY n DESC, path LIMIT 20""".stripMargin.trim,

    // conversion lag: first 'view' per user, first 'purchase' at or
    // after it; equi-join + filter, integral day histogram
    "q_conversion_lag" ->
      """WITH b AS (SELECT user_id AS u, ts, event_type FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |f AS (SELECT u, min(ts) AS t0 FROM b WHERE event_type = 'view'
        |  GROUP BY 1),
        |c AS (SELECT b.u, f.t0, min(b.ts) AS t1 FROM b JOIN f ON b.u = f.u
        |  WHERE b.event_type = 'purchase' AND b.ts >= f.t0
        |  GROUP BY b.u, f.t0)
        |SELECT datediff('day', t0::DATE, t1::DATE)::BIGINT AS lag_days,
        |  count(*)::BIGINT AS n_users
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin.trim,

    // declared-vs-predicted language confusion: the q_lang_id scorer
    // carried through with the declared label
    "q_lang_confusion" ->
      """WITH sc AS (
        |  SELECT doc_id, lang AS dl,
        |    len(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
        |    len(text) AS nc,
        |    list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS toks
        |  FROM documents WHERE lang IS NOT NULL),
        |unp AS (
        |  SELECT doc_id, dl, cjk, nc, 'de' AS lang,
        |    len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','mit','auf','für'])) AS s FROM sc
        |  UNION ALL SELECT doc_id, dl, cjk, nc, 'en',
        |    len(list_intersect(toks, ['the','a','and','of','to','in','is','it','that','for'])) FROM sc
        |  UNION ALL SELECT doc_id, dl, cjk, nc, 'es',
        |    len(list_intersect(toks, ['el','la','los','y','es','un','una','en','por','para'])) FROM sc
        |  UNION ALL SELECT doc_id, dl, cjk, nc, 'fr',
        |    len(list_intersect(toks, ['le','la','les','et','est','un','une','dans','pour','que'])) FROM sc),
        |best AS (
        |  SELECT doc_id, dl, cjk, nc, lang, s,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lang DESC) AS rn
        |  FROM unp)
        |SELECT dl AS lang_declared,
        |  CASE WHEN cjk * 2 > nc THEN 'zh'
        |       WHEN s = 0 THEN 'und'
        |       ELSE lang END AS lang_pred,
        |  count(*)::BIGINT AS n
        |FROM best WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.trim,

    // revenue Pareto: the coverageCurve shape on summed cent mass
    "q_pareto_curve" ->
      """WITH mass AS (SELECT o_custkey AS k,
        |    sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT AS cents
        |  FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |tot AS (SELECT sum(cents)::BIGINT AS t FROM mass),
        |top AS (SELECT k, cents,
        |    row_number() OVER (ORDER BY cents DESC, k) AS rank
        |  FROM mass ORDER BY cents DESC, k LIMIT 20)
        |SELECT rank, k AS o_custkey, cents,
        |  sum(cents) OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)::BIGINT AS cum,
        |  ((sum(cents) OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)) * 1000000 // (SELECT t FROM tot))::BIGINT
        |    AS share_cum_ppm
        |FROM top ORDER BY rank""".stripMargin.trim,

    // engagement depth: distinct (actor, day) -> per-actor day count
    // -> histogram
    "q_engagement_depth" ->
      """WITH dd2 AS (SELECT DISTINCT user_id AS k, ts::DATE AS d
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |ad AS (SELECT k, count(*)::BIGINT AS active_days FROM dd2 GROUP BY 1)
        |SELECT active_days, count(*)::BIGINT AS n_users
        |FROM ad GROUP BY 1 ORDER BY 1""".stripMargin.trim,

    // weekly PSI vs the first week over the dense (week x bin) grid;
    // per-week sum of <= 10 ln terms rounds once
    "q_psi_series" ->
      """WITH b0 AS (SELECT value::DOUBLE AS v, ts FROM events
        |  WHERE value IS NOT NULL AND ts IS NOT NULL),
        |md AS (SELECT min(ts::DATE) AS d0 FROM b0),
        |r0 AS (SELECT v,
        |    (datediff('day', md.d0, ts::DATE) // 7)::BIGINT AS week
        |  FROM b0, md),
        |binned AS (SELECT week,
        |    (CASE WHEN v >= 50 THEN 1 ELSE 0 END
        |   + CASE WHEN v >= 100 THEN 1 ELSE 0 END
        |   + CASE WHEN v >= 150 THEN 1 ELSE 0 END
        |   + CASE WHEN v >= 200 THEN 1 ELSE 0 END
        |   + CASE WHEN v >= 250 THEN 1 ELSE 0 END
        |   + CASE WHEN v >= 300 THEN 1 ELSE 0 END
        |   + CASE WHEN v >= 350 THEN 1 ELSE 0 END
        |   + CASE WHEN v >= 400 THEN 1 ELSE 0 END
        |   + CASE WHEN v >= 450 THEN 1 ELSE 0 END)::INTEGER AS bin
        |  FROM r0),
        |counts AS (SELECT week, bin, count(*)::BIGINT AS n FROM binned
        |  GROUP BY 1, 2),
        |weeks AS (SELECT DISTINCT week FROM counts),
        |bins AS (SELECT unnest(range(0, 10))::INTEGER AS bin),
        |grid AS (SELECT w.week, bb.bin, coalesce(c.n, 0)::BIGINT AS n
        |  FROM weeks w CROSS JOIN bins bb
        |  LEFT JOIN counts c ON w.week = c.week AND bb.bin = c.bin),
        |base AS (SELECT bin, n AS n0 FROM counts WHERE week = 0),
        |tw AS (SELECT week, sum(n)::BIGINT AS t FROM grid GROUP BY 1),
        |tz AS (SELECT coalesce(sum(n), 0)::BIGINT AS t0 FROM counts
        |  WHERE week = 0),
        |terms AS (SELECT g.week, tw.t,
        |    greatest(g.n::DOUBLE / tw.t::DOUBLE, 1e-6) AS pa,
        |    greatest(coalesce(base.n0, 0)::DOUBLE / tz.t0::DOUBLE, 1e-6) AS pb
        |  FROM grid g LEFT JOIN base ON g.bin = base.bin
        |  JOIN tw ON g.week = tw.week, tz)
        |SELECT week, t AS n_rows,
        |  round(sum((pa - pb) * ln(pa / pb)), 6) AS psi
        |FROM terms GROUP BY week, t ORDER BY week""".stripMargin.trim,

    // RFM: quartiles via the globalRank bucket formula
    // ((rank-1)*4) floor-div n with unique (metric, key) ordering
    "q_rfm" ->
      """WITH base AS (SELECT o_custkey AS k, o_orderdate::DATE AS d,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS vc FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        |    AND o_totalprice IS NOT NULL),
        |mx AS (SELECT max(d) AS md FROM base),
        |pk AS (SELECT k,
        |    datediff('day', max(d), (SELECT md FROM mx))::BIGINT
        |      AS recency_days,
        |    count(*)::BIGINT AS frequency, sum(vc)::BIGINT AS monetary_cents
        |  FROM base GROUP BY 1),
        |nn AS (SELECT count(*)::BIGINT AS n FROM pk),
        |r AS (SELECT k, ((row_number() OVER (ORDER BY recency_days, k) - 1)
        |    * 4) // (SELECT n FROM nn) AS b FROM pk),
        |f AS (SELECT k, ((row_number() OVER (ORDER BY frequency, k) - 1)
        |    * 4) // (SELECT n FROM nn) AS b FROM pk),
        |m AS (SELECT k, ((row_number() OVER (ORDER BY monetary_cents, k) - 1)
        |    * 4) // (SELECT n FROM nn) AS b FROM pk)
        |SELECT pk.k AS o_custkey, recency_days, frequency, monetary_cents,
        |  (4 - r.b)::BIGINT AS r, (f.b + 1)::BIGINT AS f,
        |  (m.b + 1)::BIGINT AS m,
        |  ((4 - r.b) * 100 + (f.b + 1) * 10 + (m.b + 1))::BIGINT AS segment
        |FROM pk JOIN r ON pk.k = r.k JOIN f ON pk.k = f.k
        |  JOIN m ON pk.k = m.k
        |ORDER BY o_custkey""".stripMargin.trim,

    // cluster-downweighted sampling: 1/size division-free Bernoulli
    // over the shared near-dup reachability; singletons always keep
    "q_cluster_downweight" ->
      s"""$nearDupClusterCte,
         |mem AS (SELECT id, min(r) AS c FROM reach GROUP BY id),
         |szs AS (SELECT c, count(*)::BIGINT AS cluster_size FROM mem
         |  GROUP BY 1),
         |lab AS (SELECT docs.id,
         |    coalesce(mem.c, docs.id) AS cluster_id,
         |    coalesce(szs.cluster_size, 1)::BIGINT AS cluster_size
         |  FROM docs LEFT JOIN mem ON docs.id = mem.id
         |  LEFT JOIN szs ON mem.c = szs.c)
         |SELECT id AS doc_id, cluster_id, cluster_size FROM lab
         |WHERE ((id % 2147483648) * 2654435761) % 2147483648
         |    * cluster_size < 2147483648
         |ORDER BY doc_id""".stripMargin.trim,

    // one-way ANOVA from exact per-group HUGEINT moments; SS terms
    // ln-encoded (the nulldev discipline) so rounding is relative
    "q_anova" ->
      """WITH m AS (SELECT l_returnflag AS g, count(*)::HUGEINT AS n,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::HUGEINT AS s,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)::HUGEINT
        |        * CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS ss
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY 1),
        |agg AS (SELECT count(*)::BIGINT AS k, sum(n)::HUGEINT AS nt,
        |    sum(s)::HUGEINT AS st,
        |    sum((s * s)::DOUBLE / n::DOUBLE) AS between_d,
        |    sum(ss::DOUBLE - (s * s)::DOUBLE / n::DOUBLE) AS within_d
        |  FROM m)
        |SELECT k AS k_groups, nt::BIGINT AS n,
        |  round(((between_d - (st * st)::DOUBLE / nt::DOUBLE)
        |      / 10000.0::DOUBLE / (k - 1.0::DOUBLE))
        |    / ((within_d / 10000.0::DOUBLE) / (nt::DOUBLE - k)), 6)
        |    AS f_stat,
        |  round(ln((between_d - (st * st)::DOUBLE / nt::DOUBLE)
        |    / 10000.0::DOUBLE), 6) AS ln_ssb,
        |  round(ln(within_d / 10000.0::DOUBLE), 6) AS ln_ssw
        |FROM agg""".stripMargin.trim,

    // Kruskal-Wallis H: pooled midranks (the mannWhitneyU prefix),
    // per-group integral rank sums, tie-corrected closed form
    "q_kruskal" ->
      """WITH r0 AS (SELECT event_type AS g, value::DOUBLE AS v FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL),
        |pv AS (SELECT v, count(*)::BIGINT AS t FROM r0 GROUP BY 1),
        |rk AS (SELECT v, 2 * coalesce(sum(t) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1
        |    AS r2 FROM pv),
        |j AS (SELECT g, rk.r2 FROM r0 JOIN rk ON r0.v = rk.v),
        |pg AS (SELECT g, count(*)::HUGEINT AS n, sum(r2)::HUGEINT AS r2s
        |  FROM j GROUP BY 1),
        |tie AS (SELECT coalesce(sum(t::HUGEINT * t * t - t), 0) AS tie
        |  FROM pv),
        |nt AS (SELECT sum(n)::HUGEINT AS n, count(*)::BIGINT AS k FROM pg),
        |sr AS (SELECT sum((r2s::DOUBLE / 2.0) * (r2s::DOUBLE / 2.0)
        |    / n::DOUBLE) AS sumr FROM pg)
        |SELECT nt.k AS k_groups, nt.n::BIGINT AS n,
        |  round((12.0::DOUBLE / (nt.n::DOUBLE * (nt.n::DOUBLE + 1.0))
        |      * sr.sumr - 3.0::DOUBLE * (nt.n::DOUBLE + 1.0))
        |    / (1.0::DOUBLE - tie.tie::DOUBLE
        |      / (nt.n::DOUBLE * nt.n::DOUBLE * nt.n::DOUBLE - nt.n::DOUBLE)),
        |    6) AS h_stat
        |FROM nt, sr, tie""".stripMargin.trim,

    // sorted-neighborhood blocking: rank-window pairs over the global
    // (value, id) order
    "q_sorted_neighborhood" ->
      """WITH r AS (SELECT c_custkey AS id,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer
        |  WHERE c_custkey IS NOT NULL AND c_acctbal IS NOT NULL),
        |rk AS (SELECT id, v, row_number() OVER (ORDER BY v, id) AS rn FROM r)
        |SELECT a.id AS id_a, b.id AS id_b, a.v AS v_a, b.v AS v_b,
        |  (b.rn - a.rn)::BIGINT AS rank_dist
        |FROM rk a JOIN rk b ON b.rn > a.rn AND b.rn <= a.rn + 5
        |ORDER BY id_a, id_b""".stripMargin.trim,

    // Monroe log-odds distinctive terms: exact counts, the engine's
    // exact double chain (alpha expanded inline), rounded z ranked
    // with the term tiebreak
    "q_distinctive_terms" ->
      """WITH toks AS (SELECT source AS slice,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
        |sw AS (SELECT slice, w, count(*)::BIGINT AS y_sw FROM toks
        |  GROUP BY 1, 2),
        |wt AS (SELECT w, sum(y_sw)::BIGINT AS y_w FROM sw GROUP BY 1
        |  HAVING sum(y_sw) >= 5),
        |st AS (SELECT slice, sum(y_sw)::BIGINT AS n_s FROM sw GROUP BY 1),
        |ntt AS (SELECT sum(y_sw)::BIGINT AS n FROM sw),
        |sc AS (SELECT sw.slice, sw.w AS term, sw.y_sw,
        |    round((ln((sw.y_sw::DOUBLE
        |        + 100.0::DOUBLE * wt.y_w::DOUBLE / ntt.n::DOUBLE)
        |      / (st.n_s::DOUBLE + 100.0::DOUBLE - sw.y_sw::DOUBLE
        |        - 100.0::DOUBLE * wt.y_w::DOUBLE / ntt.n::DOUBLE))
        |    - ln(((wt.y_w - sw.y_sw)::DOUBLE
        |        + 100.0::DOUBLE * wt.y_w::DOUBLE / ntt.n::DOUBLE)
        |      / (ntt.n::DOUBLE - st.n_s::DOUBLE + 100.0::DOUBLE
        |        - (wt.y_w - sw.y_sw)::DOUBLE
        |        - 100.0::DOUBLE * wt.y_w::DOUBLE / ntt.n::DOUBLE)))
        |    / sqrt(1.0::DOUBLE / (sw.y_sw::DOUBLE
        |        + 100.0::DOUBLE * wt.y_w::DOUBLE / ntt.n::DOUBLE)
        |      + 1.0::DOUBLE / ((wt.y_w - sw.y_sw)::DOUBLE
        |        + 100.0::DOUBLE * wt.y_w::DOUBLE / ntt.n::DOUBLE)), 6)
        |    AS z_score
        |  FROM sw JOIN wt ON sw.w = wt.w JOIN st ON sw.slice = st.slice,
        |    ntt),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY slice
        |    ORDER BY z_score DESC, term) AS rn FROM sc)
        |SELECT slice, term, y_sw, z_score FROM rk WHERE rn <= 5
        |ORDER BY slice, z_score DESC, term""".stripMargin.trim,

    // term bursts: Poisson-standardized (term, week) cells vs the
    // independence expectation; deterministic TakeOrdered top-20
    "q_term_burst" ->
      """WITH src AS (SELECT l_shipdate, p_name FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate IS NOT NULL AND p_name IS NOT NULL),
        |md AS (SELECT min(l_shipdate::DATE) AS d0 FROM src),
        |cells AS (SELECT
        |    (datediff('day', md.d0, l_shipdate::DATE) // 7)::BIGINT AS week,
        |    unnest(regexp_split_to_array(lower(trim(p_name)), '\s+')) AS term,
        |    1 AS one
        |  FROM src, md),
        |cc AS (SELECT week, term, count(*)::BIGINT AS n_obs FROM cells
        |  GROUP BY 1, 2),
        |tt AS (SELECT term, sum(n_obs)::BIGINT AS t_tot FROM cc GROUP BY 1
        |  HAVING sum(n_obs) >= 50),
        |wt AS (SELECT week, sum(n_obs)::BIGINT AS w_tot FROM cc GROUP BY 1),
        |nt AS (SELECT sum(n_obs)::BIGINT AS n FROM cc)
        |SELECT cc.term, cc.week, cc.n_obs,
        |  round((cc.n_obs::DOUBLE
        |      - tt.t_tot::DOUBLE * wt.w_tot::DOUBLE / nt.n::DOUBLE)
        |    / sqrt(tt.t_tot::DOUBLE * wt.w_tot::DOUBLE / nt.n::DOUBLE), 6)
        |    AS z_burst
        |FROM cc JOIN tt ON cc.term = tt.term JOIN wt ON cc.week = wt.week,
        |  nt
        |ORDER BY z_burst DESC, cc.term, cc.week LIMIT 20""".stripMargin.trim,

    // corpus datasheet: two corpus passes, all integral
    "q_corpus_card" ->
      """WITH head AS (SELECT count(*)::BIGINT AS n_docs,
        |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT
        |      AS n_null_text,
        |    count(DISTINCT lang)::BIGINT AS n_langs,
        |    count(DISTINCT source)::BIGINT AS n_sources,
        |    sum(coalesce(n_chars, 0))::BIGINT AS sum_chars FROM documents),
        |toks AS (SELECT count(*)::BIGINT AS n_tokens,
        |    count(DISTINCT w)::BIGINT AS vocab_size
        |  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)),
        |      '\s+')) AS w FROM documents WHERE text IS NOT NULL)),
        |dups AS (SELECT coalesce(sum(c - 1), 0)::BIGINT AS dup_docs
        |  FROM (SELECT md5(text) AS h, count(*)::BIGINT AS c FROM documents
        |        WHERE text IS NOT NULL GROUP BY 1))
        |SELECT n_docs, n_null_text, n_langs, n_sources, n_tokens,
        |  vocab_size,
        |  (dup_docs * 1000000 // n_docs)::BIGINT AS dup_doc_ppm,
        |  (sum_chars * 1000 // n_docs)::BIGINT AS mean_chars_milli
        |FROM head, toks, dups""".stripMargin.trim,

    // vocabulary overlap: distinct type sets, token-keyed pair join
    "q_vocab_overlap" ->
      """WITH types AS (SELECT DISTINCT s, w FROM
        |  (SELECT source AS s,
        |     unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |   FROM documents WHERE source IS NOT NULL AND text IS NOT NULL)),
        |sizes AS (SELECT s, count(*)::BIGINT AS sz FROM types GROUP BY 1),
        |pairs AS (SELECT a.s AS slice_a, b.s AS slice_b,
        |    count(*)::BIGINT AS common
        |  FROM types a JOIN types b ON a.w = b.w AND a.s < b.s
        |  GROUP BY 1, 2)
        |SELECT slice_a, slice_b, common, sa.sz AS size_a, sb.sz AS size_b,
        |  (common * 1000000 // (sa.sz + sb.sz - common))::BIGINT
        |    AS jaccard_ppm
        |FROM pairs JOIN sizes sa ON pairs.slice_a = sa.s
        |  JOIN sizes sb ON pairs.slice_b = sb.s
        |ORDER BY slice_a, slice_b""".stripMargin.trim,

    // difference-in-differences over the four (variant x period)
    // cent-moment cells
    "q_did" ->
      """WITH base AS (SELECT
        |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END::BIGINT AS t,
        |    ts, CAST(round(value * 100.0) AS BIGINT) AS vc
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |md AS (SELECT min(ts::DATE) AS d0 FROM base),
        |cells AS (SELECT t,
        |    CASE WHEN datediff('day', md.d0, ts::DATE) < 15
        |      THEN 1 ELSE 0 END::BIGINT AS pre,
        |    count(*)::HUGEINT AS n, sum(vc)::HUGEINT AS s
        |  FROM base, md GROUP BY 1, 2),
        |m AS (SELECT
        |    max(CASE WHEN t = 1 AND pre = 1 THEN s::DOUBLE / 100.0::DOUBLE
        |      / n::DOUBLE END) AS mtp,
        |    max(CASE WHEN t = 1 AND pre = 0 THEN s::DOUBLE / 100.0::DOUBLE
        |      / n::DOUBLE END) AS mtq,
        |    max(CASE WHEN t = 0 AND pre = 1 THEN s::DOUBLE / 100.0::DOUBLE
        |      / n::DOUBLE END) AS mcp,
        |    max(CASE WHEN t = 0 AND pre = 0 THEN s::DOUBLE / 100.0::DOUBLE
        |      / n::DOUBLE END) AS mcq,
        |    sum(CASE WHEN t = 1 THEN n ELSE 0 END)::BIGINT AS n_t,
        |    sum(CASE WHEN t = 0 THEN n ELSE 0 END)::BIGINT AS n_c
        |  FROM cells)
        |SELECT n_t, n_c, round(mtp, 6) AS m_t_pre, round(mtq, 6) AS m_t_post,
        |  round(mcp, 6) AS m_c_pre, round(mcq, 6) AS m_c_post,
        |  round((mtq - mtp) - (mcq - mcp), 6) AS did
        |FROM m""".stripMargin.trim,

    // CMS audit: deterministic md5-row hashes, min over depth rows,
    // top-k exact tokens probed against the bounded cell table
    "q_cms_audit" ->
      """WITH toks AS (SELECT unnest(regexp_split_to_array(
        |    lower(trim(text)), '\s+')) AS w FROM documents
        |  WHERE text IS NOT NULL),
        |cells AS (SELECT r, ('0x' || substr(md5(r::VARCHAR || ':' || w),
        |    1, 8))::BIGINT % 256 AS cellv, count(*)::BIGINT AS cnt
        |  FROM toks, generate_series(0, 2) AS g(r) GROUP BY 1, 2),
        |exact AS (SELECT w, count(*)::BIGINT AS exact_count FROM toks
        |  GROUP BY 1 ORDER BY exact_count DESC, w LIMIT 20),
        |probes AS (SELECT w, exact_count, g.r,
        |    ('0x' || substr(md5(g.r::VARCHAR || ':' || w), 1, 8))::BIGINT
        |      % 256 AS cellv
        |  FROM exact, generate_series(0, 2) AS g(r)),
        |est AS (SELECT probes.w AS token, probes.exact_count,
        |    min(cells.cnt)::BIGINT AS cms_estimate
        |  FROM probes JOIN cells ON probes.r = cells.r
        |    AND probes.cellv = cells.cellv
        |  GROUP BY 1, 2)
        |SELECT token, exact_count, cms_estimate,
        |  (cms_estimate - exact_count)::BIGINT AS overcount
        |FROM est ORDER BY exact_count DESC, token""".stripMargin.trim,

    // SRM guardrail: exact counts, one double z
    "q_srm" ->
      """WITH c AS (SELECT sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0
        |    END)::BIGINT AS na, count(*)::BIGINT AS n FROM events)
        |SELECT na AS n_a, (n - na)::BIGINT AS n_b,
        |  round((na::DOUBLE - n::DOUBLE * 0.5)
        |    / sqrt(n::DOUBLE * 0.5 * (1.0::DOUBLE - 0.5)), 6) AS z_srm
        |FROM c""".stripMargin.trim,

    // weighted lower quantiles: distinct-value cumulative weights,
    // smallest value whose cumw reaches the integral ceil target
    "q_weighted_quantiles" ->
      """WITH src AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
        |    ::DOUBLE AS v, CAST(round(l_quantity) AS BIGINT) AS w
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
        |    AND CAST(round(l_quantity) AS BIGINT) > 0),
        |pv AS (SELECT v, sum(w)::BIGINT AS wt FROM src GROUP BY 1),
        |cw AS (SELECT v, sum(wt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW)::BIGINT AS cum FROM pv),
        |tot AS (SELECT sum(wt)::BIGINT AS w FROM pv),
        |tg AS (SELECT pm::BIGINT AS p_permille,
        |    ((pm * tot.w + 999) // 1000)::BIGINT AS t_rank, tot.w
        |  FROM tot, (VALUES (250), (500), (750), (950)) p(pm))
        |SELECT p_permille, t_rank, w AS total_weight,
        |  (SELECT min(v) FROM cw WHERE cum >= t_rank) AS value
        |FROM tg ORDER BY p_permille""".stripMargin.trim,

    // quadratic trend: exact HUGEINT Cramer determinants over the
    // weekly moment sums; only the three final divisions are doubles
    "q_quad_trend" ->
      """WITH base AS (SELECT o_orderdate,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS vc FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL),
        |md AS (SELECT min(o_orderdate::DATE) AS d0 FROM base),
        |wk AS (SELECT (datediff('day', md.d0, o_orderdate::DATE) // 7)
        |    ::BIGINT AS x, sum(vc)::BIGINT AS y FROM base, md GROUP BY 1),
        |mm AS (SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
        |    sum(x::HUGEINT * x) AS sx2, sum(x::HUGEINT * x * x) AS sx3,
        |    sum(x::HUGEINT * x * x * x) AS sx4, sum(y)::HUGEINT AS sy,
        |    sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x * y) AS sx2y
        |  FROM wk),
        |dets AS (SELECT n::BIGINT AS n_weeks,
        |    n * (sx2 * sx4 - sx3 * sx3) - sx * (sx * sx4 - sx3 * sx2)
        |      + sx2 * (sx * sx3 - sx2 * sx2) AS det,
        |    sy * (sx2 * sx4 - sx3 * sx3) - sx * (sxy * sx4 - sx3 * sx2y)
        |      + sx2 * (sxy * sx3 - sx2 * sx2y) AS d0,
        |    n * (sxy * sx4 - sx3 * sx2y) - sy * (sx * sx4 - sx3 * sx2)
        |      + sx2 * (sx * sx2y - sxy * sx2) AS d1,
        |    n * (sx2 * sx2y - sxy * sx3) - sx * (sx * sx2y - sxy * sx2)
        |      + sy * (sx * sx3 - sx2 * sx2) AS d2
        |  FROM mm)
        |SELECT n_weeks,
        |  round(d0::DOUBLE / det::DOUBLE / 100.0::DOUBLE, 6) AS c0,
        |  round(d1::DOUBLE / det::DOUBLE / 100.0::DOUBLE, 6) AS c1,
        |  round(d2::DOUBLE / det::DOUBLE / 100.0::DOUBLE, 6) AS c2
        |FROM dets""".stripMargin.trim,

    // Lorenz deciles: the globalRank bucket formula over (cents, key),
    // bounded cumulative window
    "q_lorenz" ->
      """WITH mass AS (SELECT o_custkey AS k,
        |    sum(CAST(round(o_totalprice * 100.0) AS BIGINT))::BIGINT AS cents
        |  FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |nn AS (SELECT count(*)::BIGINT AS n FROM mass),
        |rk AS (SELECT cents,
        |    ((row_number() OVER (ORDER BY cents, k) - 1) * 10)
        |      // (SELECT n FROM nn) AS decile FROM mass),
        |per AS (SELECT decile, count(*)::BIGINT AS n_keys,
        |    sum(cents)::BIGINT AS mass_cents FROM rk GROUP BY 1),
        |tot AS (SELECT sum(mass_cents)::BIGINT AS t FROM per)
        |SELECT decile, n_keys, mass_cents,
        |  ((sum(mass_cents) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW)) * 1000000
        |    // (SELECT t FROM tot))::BIGINT AS cum_share_ppm
        |FROM per ORDER BY decile""".stripMargin.trim,

    // price-volume-mix: floored milli-cent unit prices keep every
    // effect term and the flooring residue engine-exact
    "q_pvm" ->
      """WITH base AS (SELECT l_partkey AS k, l_shipdate,
        |    CAST(round(l_extendedprice * 100.0) AS BIGINT) AS rc,
        |    CAST(round(l_quantity) AS BIGINT) AS qc FROM lineitem
        |  WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_quantity IS NOT NULL),
        |md AS (SELECT min(l_shipdate::DATE) AS d0 FROM base),
        |p1 AS (SELECT k, sum(rc)::BIGINT AS r1, sum(qc)::BIGINT AS q1
        |  FROM base, md
        |  WHERE datediff('day', md.d0, l_shipdate::DATE) < 365 GROUP BY 1),
        |p2 AS (SELECT k, sum(rc)::BIGINT AS r2, sum(qc)::BIGINT AS q2
        |  FROM base, md
        |  WHERE datediff('day', md.d0, l_shipdate::DATE) >= 365 GROUP BY 1),
        |j AS (SELECT coalesce(p1.k, p2.k) AS k, r1, q1, r2, q2
        |  FROM p1 FULL OUTER JOIN p2 ON p1.k = p2.k)
        |SELECT
        |  sum(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL THEN 1 ELSE 0
        |    END)::BIGINT AS n_matched,
        |  sum(CASE WHEN r1 IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_new,
        |  sum(CASE WHEN r2 IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
        |  sum(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL THEN r2 - r1
        |    ELSE 0 END)::BIGINT AS delta_matched_cents,
        |  sum(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL
        |      AND q1 > 0 AND q2 > 0
        |    THEN ((r2 * 1000 // q2) - (r1 * 1000 // q1)) * q1
        |    ELSE 0 END)::BIGINT AS price_effect_milli,
        |  sum(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL
        |      AND q1 > 0 AND q2 > 0
        |    THEN (r1 * 1000 // q1) * (q2 - q1)
        |    ELSE 0 END)::BIGINT AS volume_effect_milli,
        |  sum(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL
        |      AND q1 > 0 AND q2 > 0
        |    THEN ((r2 * 1000 // q2) - (r1 * 1000 // q1)) * (q2 - q1)
        |    ELSE 0 END)::BIGINT AS mix_effect_milli,
        |  sum(CASE WHEN r1 IS NULL THEN r2 ELSE 0 END)::BIGINT
        |    AS new_mass_cents,
        |  sum(CASE WHEN r2 IS NULL THEN r1 ELSE 0 END)::BIGINT
        |    AS dropped_mass_cents,
        |  (sum(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL THEN r2 - r1
        |      ELSE 0 END) * 1000
        |   - sum(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL
        |       AND q1 > 0 AND q2 > 0
        |     THEN ((r2 * 1000 // q2) - (r1 * 1000 // q1)) * q1
        |     ELSE 0 END)
        |   - sum(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL
        |       AND q1 > 0 AND q2 > 0
        |     THEN (r1 * 1000 // q1) * (q2 - q1) ELSE 0 END)
        |   - sum(CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL
        |       AND q1 > 0 AND q2 > 0
        |     THEN ((r2 * 1000 // q2) - (r1 * 1000 // q1)) * (q2 - q1)
        |     ELSE 0 END))::BIGINT AS resid_milli
        |FROM j""".stripMargin.trim,

    // log-rank: kaplanMeier's lifetime construction with a cohort
    // split; per-event-time O-E and variance over the bounded grid
    "q_logrank" ->
      """WITH dy AS (SELECT user_id AS u, ts::DATE AS d,
        |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END::BIGINT AS g
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |bnd AS (SELECT max(d) AS dmax FROM dy),
        |us AS (SELECT min(g) AS g,
        |    datediff('day', min(d), max(d))::BIGINT AS t,
        |    CASE WHEN datediff('day', max(d), (SELECT dmax FROM bnd)) > -1
        |      THEN 1 ELSE 0 END::BIGINT AS e
        |  FROM dy GROUP BY u),
        |grid AS (SELECT t,
        |    sum(CASE WHEN g = 1 THEN e ELSE 0 END)::BIGINT AS d1,
        |    sum(e)::BIGINT AS d,
        |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS m1,
        |    count(*)::BIGINT AS m FROM us GROUP BY 1),
        |g2 AS (SELECT t, d1, d,
        |    sum(m1) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
        |      UNBOUNDED FOLLOWING)::BIGINT AS n1,
        |    sum(m) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
        |      UNBOUNDED FOLLOWING)::BIGINT AS n FROM grid),
        |cells AS (SELECT d1, d,
        |    d::DOUBLE * n1::DOUBLE / n::DOUBLE AS e1,
        |    d::DOUBLE * (n1::DOUBLE / n::DOUBLE)
        |      * (1.0::DOUBLE - n1::DOUBLE / n::DOUBLE)
        |      * (n - d)::DOUBLE / (n - 1)::DOUBLE AS v
        |  FROM g2 WHERE d > 0 AND n > 1),
        |tot AS (SELECT sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS n1u,
        |    sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::BIGINT AS n0u FROM us)
        |SELECT tot.n1u AS n_1, tot.n0u AS n_2,
        |  (SELECT sum(d1) FROM cells)::BIGINT AS d_1,
        |  round((SELECT sum(e1) FROM cells), 6) AS exp_1,
        |  round(((SELECT sum(d1) FROM cells)::DOUBLE
        |      - (SELECT sum(e1) FROM cells))
        |    / sqrt((SELECT sum(v) FROM cells)), 6) AS z_logrank
        |FROM tot""".stripMargin.trim,

    // best-split changepoint: identical double gain formula on the
    // same exact integers -> deterministic argmax (ties: earliest)
    "q_changepoint" ->
      """WITH base AS (SELECT o_orderdate,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS vc FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL),
        |md AS (SELECT min(o_orderdate::DATE) AS d0 FROM base),
        |wk AS (SELECT (datediff('day', md.d0, o_orderdate::DATE) // 7)
        |    ::BIGINT AS x, count(*)::BIGINT AS m, sum(vc)::BIGINT AS y
        |  FROM base, md GROUP BY 1),
        |tot AS (SELECT sum(m)::BIGINT AS n, sum(y)::BIGINT AS s FROM wk),
        |pre AS (SELECT x,
        |    sum(m) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW)::BIGINT AS nl,
        |    sum(y) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW)::BIGINT AS sl,
        |    row_number() OVER (ORDER BY x) AS rn,
        |    count(*) OVER () AS cnt FROM wk),
        |cand AS (SELECT x, nl, sl, tot.n - nl AS nr, tot.s - sl AS sr,
        |    tot.n AS n FROM pre, tot WHERE rn < cnt),
        |g AS (SELECT x, nl, nr, sl, sr,
        |    nl::DOUBLE * nr::DOUBLE / n::DOUBLE
        |      * (sl::DOUBLE / nl::DOUBLE - sr::DOUBLE / nr::DOUBLE)
        |      * (sl::DOUBLE / nl::DOUBLE - sr::DOUBLE / nr::DOUBLE) AS gain
        |  FROM cand)
        |SELECT x AS split_week, nl AS n_l, nr AS n_r,
        |  round(sl::DOUBLE / nl::DOUBLE / 100.0::DOUBLE, 6) AS mean_l,
        |  round(sr::DOUBLE / nr::DOUBLE / 100.0::DOUBLE, 6) AS mean_r,
        |  round(ln(gain / 10000.0::DOUBLE), 6) AS ln_gain
        |FROM g ORDER BY gain DESC, x LIMIT 1""".stripMargin.trim,

    // additive Holt-Winters: 9-column rotating-queue recursive CTE —
    // the engine's exact fold sequence with exact-binary constants
    "q_holt_winters" ->
      """WITH RECURSIVE md AS (SELECT min(ts::DATE) AS d0 FROM events
        |  WHERE value IS NOT NULL AND ts IS NOT NULL),
        |daily AS (SELECT datediff('day', md.d0, ts::DATE)::BIGINT AS t,
        |    sum(CAST(round(value * 100.0) AS BIGINT))::BIGINT AS xc
        |  FROM events, md WHERE value IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |nn AS (SELECT count(*)::BIGINT AS n, max(t) AS mx FROM daily),
        |ini AS (SELECT (SELECT sum(xc) FROM daily WHERE t < 7)::DOUBLE
        |    / 7.0::DOUBLE AS l),
        |fold AS (
        |  SELECT 6::BIGINT AS t, ini.l AS l, 0.0::DOUBLE AS b,
        |    (SELECT xc FROM daily WHERE t = 0)::DOUBLE - ini.l AS s1,
        |    (SELECT xc FROM daily WHERE t = 1)::DOUBLE - ini.l AS s2,
        |    (SELECT xc FROM daily WHERE t = 2)::DOUBLE - ini.l AS s3,
        |    (SELECT xc FROM daily WHERE t = 3)::DOUBLE - ini.l AS s4,
        |    (SELECT xc FROM daily WHERE t = 4)::DOUBLE - ini.l AS s5,
        |    (SELECT xc FROM daily WHERE t = 5)::DOUBLE - ini.l AS s6,
        |    (SELECT xc FROM daily WHERE t = 6)::DOUBLE - ini.l AS s7
        |  FROM ini
        |  UNION ALL
        |  SELECT f.t + 1,
        |    0.5 * (dd.xc::DOUBLE - f.s1) + 0.5 * (f.l + f.b),
        |    0.25 * ((0.5 * (dd.xc::DOUBLE - f.s1) + 0.5 * (f.l + f.b))
        |      - f.l) + 0.75 * f.b,
        |    f.s2, f.s3, f.s4, f.s5, f.s6, f.s7,
        |    0.25 * (dd.xc::DOUBLE
        |      - (0.5 * (dd.xc::DOUBLE - f.s1) + 0.5 * (f.l + f.b)))
        |      + 0.75 * f.s1
        |  FROM fold f JOIN daily dd ON dd.t = f.t + 1)
        |SELECT nn.n AS n_days, round(f.l / 100.0::DOUBLE, 6) AS level,
        |  round(f.b / 100.0::DOUBLE, 6) AS trend,
        |  round((f.l + f.b + f.s1) / 100.0::DOUBLE, 6) AS forecast_next,
        |  round((greatest(f.s1, f.s2, f.s3, f.s4, f.s5, f.s6, f.s7)
        |    - least(f.s1, f.s2, f.s3, f.s4, f.s5, f.s6, f.s7))
        |    / 100.0::DOUBLE, 6) AS seasonal_range
        |FROM fold f, nn WHERE f.t = nn.mx""".stripMargin.trim,

    // conformal band: identical OLS doubles from exact cent moments,
    // cent-quantized residuals, lower-quantile target rank
    "q_conformal" ->
      """WITH m AS (SELECT count(*)::HUGEINT AS n,
        |    sum(CAST(round(l_quantity * 100.0) AS BIGINT))::HUGEINT AS sx,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::HUGEINT
        |      AS sy,
        |    sum(CAST(round(l_quantity * 100.0) AS BIGINT)::HUGEINT
        |      * CAST(round(l_quantity * 100.0) AS BIGINT)) AS sxx,
        |    sum(CAST(round(l_quantity * 100.0) AS BIGINT)::HUGEINT
        |      * CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS sxy
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |cf AS (SELECT (n * sxy - sx * sy)::DOUBLE
        |    / (n * sxx - sx * sx)::DOUBLE AS b FROM m),
        |cf2 AS (SELECT cf.b,
        |    (m.sy::DOUBLE - cf.b * m.sx::DOUBLE) / m.n::DOUBLE
        |      / 100.0::DOUBLE AS a, m.n::BIGINT AS nn FROM cf, m),
        |rc AS (SELECT CAST(round(abs(l_extendedprice::DOUBLE
        |    - (cf2.a + cf2.b * l_quantity::DOUBLE)) * 100.0::DOUBLE)
        |    AS BIGINT) AS r
        |  FROM lineitem, cf2
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |pv AS (SELECT r, count(*)::BIGINT AS wt FROM rc GROUP BY 1),
        |cw AS (SELECT r, sum(wt) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW)::BIGINT AS cum FROM pv),
        |tg AS (SELECT ((900 * nn + 999) // 1000)::BIGINT AS t, nn, a, b
        |  FROM cf2)
        |SELECT nn AS n, round(b, 6) AS slope, round(a, 6) AS intercept,
        |  900::BIGINT AS q_permille,
        |  (SELECT min(r) FROM cw WHERE cum >= tg.t)::DOUBLE
        |    AS q_resid_cents
        |FROM tg""".stripMargin.trim,

    // next-event entropy per predecessor: exact counts, one rounded
    // ln-sum per row (tokenDiversity discipline)
    "q_nav_entropy" ->
      """WITH l AS (SELECT user_id, event_type,
        |    lag(event_type, 1) OVER w AS p FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |pr AS (SELECT p AS from_type, event_type AS to_type,
        |    count(*)::BIGINT AS c FROM l WHERE p IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(c)::BIGINT AS n FROM pr GROUP BY 1)
        |SELECT t.from_type, t.n,
        |  round(sum((pr.c::DOUBLE / t.n::DOUBLE)
        |    * ln(t.n::DOUBLE / pr.c::DOUBLE)), 6) AS h_nats
        |FROM pr JOIN t ON pr.from_type = t.from_type
        |GROUP BY t.from_type, t.n ORDER BY t.from_type""".stripMargin.trim,

    // k-anonymity ladder: per-level group/singleton counts (the
    // engine's one Expand pass == three explicit levels here)
    "q_kanon_ladder" ->
      """WITH d AS (SELECT lang, source, n_chars // 100 AS len_bucket
        |  FROM documents),
        |c3 AS (SELECT count(*)::BIGINT AS c FROM d
        |  GROUP BY lang, source, len_bucket),
        |c2 AS (SELECT count(*)::BIGINT AS c FROM d GROUP BY lang, source),
        |c1 AS (SELECT count(*)::BIGINT AS c FROM d GROUP BY lang),
        |g3 AS (SELECT count(*)::BIGINT AS ng,
        |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS ns FROM c3),
        |g2 AS (SELECT count(*)::BIGINT AS ng,
        |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS ns FROM c2),
        |g1 AS (SELECT count(*)::BIGINT AS ng,
        |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS ns FROM c1)
        |SELECT 3 AS level, ng AS n_groups, ns AS n_singletons,
        |  (ns * 1000000 // ng)::BIGINT AS singleton_ppm FROM g3
        |UNION ALL SELECT 2, ng, ns, (ns * 1000000 // ng)::BIGINT FROM g2
        |UNION ALL SELECT 1, ng, ns, (ns * 1000000 // ng)::BIGINT FROM g1
        |ORDER BY level DESC""".stripMargin.trim,

    // golden record: shared near-dup reachability + field-level
    // survivorship (min id, max len, deterministic modal value)
    "q_golden_record" ->
      s"""$nearDupClusterCte,
         |mem AS (SELECT id, min(r) AS c FROM reach GROUP BY id),
         |dd AS (SELECT docs.id, coalesce(mem.c, docs.id) AS cluster_id,
         |    length(coalesce(docs.text, '')) AS len,
         |    substr(coalesce(docs.text, ''), 1, 1) AS cat
         |  FROM docs LEFT JOIN mem ON docs.id = mem.id),
         |b AS (SELECT cluster_id, min(id)::BIGINT AS rep_id,
         |    count(*)::BIGINT AS n_docs, max(len)::BIGINT AS max_len
         |  FROM dd GROUP BY 1),
         |mo AS (SELECT cluster_id, cat AS mode_cat FROM (
         |    SELECT cluster_id, cat, count(*) AS cnt,
         |      row_number() OVER (PARTITION BY cluster_id
         |        ORDER BY count(*) DESC, cat) AS rn
         |    FROM dd WHERE cat IS NOT NULL GROUP BY cluster_id, cat)
         |  WHERE rn = 1)
         |SELECT b.cluster_id, b.rep_id, b.n_docs, b.max_len, mo.mode_cat
         |FROM b LEFT JOIN mo ON b.cluster_id = mo.cluster_id
         |ORDER BY b.cluster_id""".stripMargin.trim,

    // referential integrity: orphan anti-joins + parent PK duplication
    "q_fk_integrity" -> {
      def rel(name: String, child: String, fk: String, parent: String,
              pk: String) =
        s"""SELECT '$name' AS relation,
           |  (SELECT count(*) FROM $child WHERE $fk IS NOT NULL)::BIGINT
           |    AS n_child,
           |  (SELECT count(*) FROM $child WHERE $fk IS NOT NULL
           |    AND $fk NOT IN (SELECT $pk FROM $parent
           |      WHERE $pk IS NOT NULL))::BIGINT AS n_orphans,
           |  (SELECT count(*) FROM $parent)::BIGINT AS n_parent,
           |  ((SELECT count(*) FROM $parent)
           |    - (SELECT count(DISTINCT $pk) FROM $parent))::BIGINT
           |    AS pk_dup_rows""".stripMargin
      s"""WITH u AS (
         |${rel("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey")}
         |UNION ALL
         |${rel("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey")}
         |UNION ALL
         |${rel("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey")}
         |UNION ALL
         |${rel("orders->customer", "orders", "o_custkey", "customer", "c_custkey")}
         |UNION ALL
         |${rel("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey")})
         |SELECT relation, n_child, n_orphans,
         |  (CASE WHEN n_child = 0 THEN 0
         |    ELSE n_orphans * 1000000 // n_child END)::BIGINT AS orphan_ppm,
         |  n_parent, pk_dup_rows
         |FROM u ORDER BY relation""".stripMargin.trim
    },

    // cohort LTV: first-seen-week cohorts, per-age cent cells,
    // keyed cumulative window over the bounded week grid
    "q_cohort_ltv" ->
      """WITH md AS (SELECT min(ts::DATE) AS d0 FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |ww AS (SELECT user_id AS u,
        |    (datediff('day', md.d0, ts::DATE) // 7)::BIGINT AS w,
        |    CAST(round(value * 100.0) AS BIGINT) AS vc
        |  FROM events, md WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |co AS (SELECT u, min(w) AS cohort_week FROM ww GROUP BY 1),
        |sz AS (SELECT cohort_week, count(*)::BIGINT AS n_users FROM co
        |  GROUP BY 1),
        |cells AS (SELECT co.cohort_week, ww.w - co.cohort_week AS age_week,
        |    sum(ww.vc)::BIGINT AS rev_cents
        |  FROM ww JOIN co ON ww.u = co.u GROUP BY 1, 2),
        |cum AS (SELECT cohort_week, age_week, rev_cents,
        |    sum(rev_cents) OVER (PARTITION BY cohort_week ORDER BY age_week
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
        |      AS cum_rev_cents FROM cells)
        |SELECT cum.cohort_week, cum.age_week, sz.n_users, cum.rev_cents,
        |  cum.cum_rev_cents,
        |  (cum.cum_rev_cents * 10 // sz.n_users)::BIGINT
        |    AS cum_per_user_milli
        |FROM cum JOIN sz ON cum.cohort_week = sz.cohort_week
        |ORDER BY cum.cohort_week, cum.age_week""".stripMargin.trim,

    // exact-dup rate per source over a planted doubled corpus
    "q_dup_rate" ->
      """WITH d AS (SELECT doc_id, source, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, source, text FROM documents
        |    WHERE doc_id % 3 = 0),
        |g AS (SELECT source AS slice, md5(text) AS h,
        |    count(*)::BIGINT AS c FROM d
        |  WHERE source IS NOT NULL AND text IS NOT NULL GROUP BY 1, 2),
        |s AS (SELECT slice, sum(c)::BIGINT AS n_docs,
        |    sum(c - 1)::BIGINT AS n_dup_docs FROM g GROUP BY 1)
        |SELECT slice, n_docs, n_dup_docs,
        |  (n_dup_docs * 1000000 // n_docs)::BIGINT AS dup_ppm
        |FROM s ORDER BY slice""".stripMargin.trim,

    // Cliff's delta rides the Mann–Whitney midrank scan: u2 = 2·U_a is
    // integral, delta = (u2 − na·nb)/(na·nb) with ONE double division
    "q_cliffs_delta" ->
      """WITH t AS (SELECT value AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |    AND value IS NOT NULL),
        |pv AS (SELECT v, sum(g)::BIGINT AS ca, sum(1 - g)::BIGINT AS cb
        |       FROM t GROUP BY v),
        |o AS (SELECT v, ca, cb, ca + cb AS t2,
        |    coalesce(sum(ca + cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM pv),
        |s AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
        |    sum(ca * (2 * cum + t2 + 1))::BIGINT AS r1x2 FROM o)
        |SELECT na AS n_a, nb AS n_b,
        |  (r1x2 - na * (na + 1))::BIGINT AS u2,
        |  round(((r1x2 - na * (na + 1)) - na * nb)::DOUBLE
        |    / (na::DOUBLE * nb), 6) + 0.0 AS cliffs_delta
        |FROM s""".stripMargin.trim,

    // pooled-variance standardized mean difference from the welch
    // moment CTEs; g = d·(1 − 3/(4N − 9))
    "q_effect_size" ->
      """WITH m AS (SELECT l_returnflag AS g, count(*)::HUGEINT AS n,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::HUGEINT AS s,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)::HUGEINT
        |        * CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS ss
        |  FROM lineitem
        |  WHERE l_returnflag IN ('R', 'A') AND l_extendedprice IS NOT NULL
        |  GROUP BY 1),
        |a AS (SELECT n::DOUBLE AS nd, n::BIGINT AS nl,
        |    s::DOUBLE / 100.0::DOUBLE / n::DOUBLE AS mean,
        |    (n * ss - s * s)::DOUBLE / 10000.0::DOUBLE
        |      / (n::DOUBLE * (n::DOUBLE - 1.0::DOUBLE)) AS v
        |  FROM m WHERE g = 'R'),
        |b AS (SELECT n::DOUBLE AS nd, n::BIGINT AS nl,
        |    s::DOUBLE / 100.0::DOUBLE / n::DOUBLE AS mean,
        |    (n * ss - s * s)::DOUBLE / 10000.0::DOUBLE
        |      / (n::DOUBLE * (n::DOUBLE - 1.0::DOUBLE)) AS v
        |  FROM m WHERE g = 'A'),
        |d AS (SELECT a.nl AS na, b.nl AS nb, a.mean AS ma, b.mean AS mb,
        |    (a.mean - b.mean) / sqrt(((a.nd - 1.0::DOUBLE) * a.v
        |      + (b.nd - 1.0::DOUBLE) * b.v)
        |      / (a.nd + b.nd - 2.0::DOUBLE)) AS d0,
        |    a.nd + b.nd AS ntot
        |  FROM a, b)
        |SELECT na AS n_a, nb AS n_b,
        |  round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
        |  round(d0, 6) + 0.0 AS cohens_d,
        |  round(d0 * (1.0::DOUBLE - 3.0::DOUBLE
        |    / (4.0::DOUBLE * ntot - 9.0::DOUBLE)), 6) + 0.0 AS hedges_g
        |FROM d""".stripMargin.trim,

    // Brown–Forsythe: |x − group median| in doubled cents (integral),
    // then the anovaF between/within decomposition
    "q_levene" ->
      """WITH t AS (SELECT event_type AS g,
        |    CAST(round(value * 100.0) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |med AS (SELECT g,
        |    CAST(round(2 * quantile_cont(x, 0.5)) AS BIGINT) AS m2
        |  FROM t GROUP BY g),
        |z AS (SELECT t.g, abs(2 * x - m2)::HUGEINT AS z2
        |  FROM t JOIN med USING (g)),
        |m AS (SELECT g, count(*)::HUGEINT AS n, sum(z2)::HUGEINT AS s,
        |    sum(z2 * z2)::HUGEINT AS ss FROM z GROUP BY g),
        |agg AS (SELECT count(*)::BIGINT AS k, sum(n)::HUGEINT AS ntot,
        |    sum(s)::HUGEINT AS stot,
        |    sum((s * s)::DOUBLE / n::DOUBLE) AS q,
        |    sum(ss::DOUBLE) AS sssum FROM m)
        |SELECT k AS k_groups, ntot::BIGINT AS n,
        |  (k - 1)::BIGINT AS df1, (ntot - k)::BIGINT AS df2,
        |  round((ntot::DOUBLE - k::DOUBLE) / (k::DOUBLE - 1.0::DOUBLE)
        |    * (q - (stot * stot)::DOUBLE / ntot::DOUBLE)
        |    / (sssum - q), 6) AS w_stat
        |FROM agg""".stripMargin.trim,

    // 10%-trimmed mean: drop floor(n·0.1) per tail by rank; the cut is
    // computed in DOUBLE on both engines so the floor agrees bit-exact
    "q_trimmed_mean" ->
      """WITH t AS (SELECT event_type AS g,
        |    CAST(round(value * 100.0) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT g, x,
        |    row_number() OVER (PARTITION BY g ORDER BY x) AS ra,
        |    count(*) OVER (PARTITION BY g)
        |      + 1 - row_number() OVER (PARTITION BY g ORDER BY x) AS rd,
        |    count(*) OVER (PARTITION BY g) AS n FROM t),
        |k AS (SELECT g, x, n FROM r
        |  WHERE ra > floor(n * 0.1::DOUBLE) AND rd > floor(n * 0.1::DOUBLE))
        |SELECT g AS event_type, max(n)::BIGINT AS n,
        |  count(*)::BIGINT AS kept,
        |  round(sum(x)::DOUBLE / count(*)::DOUBLE / 100.0::DOUBLE, 6)
        |    AS trimmed_mean
        |FROM k GROUP BY g ORDER BY g""".stripMargin.trim,

    // Dirichlet query likelihood: integral cf/dl/T moments (double
    // sums of integers are exact, so order-free), one fixed-order
    // three-term ln expression mirrored op for op
    "q_qld" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |dlen AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
        |tot AS (SELECT sum(dl)::BIGINT AS t FROM dlen),
        |cf AS (SELECT
        |    sum(CASE WHEN w = 'spark' THEN 1 ELSE 0 END)::BIGINT AS cf1,
        |    sum(CASE WHEN w = 'query' THEN 1 ELSE 0 END)::BIGINT AS cf2,
        |    sum(CASE WHEN w = 'stream' THEN 1 ELSE 0 END)::BIGINT AS cf3
        |  FROM toks),
        |tf AS (SELECT doc_id,
        |    sum(CASE WHEN w = 'spark' THEN 1 ELSE 0 END)::BIGINT AS tf1,
        |    sum(CASE WHEN w = 'query' THEN 1 ELSE 0 END)::BIGINT AS tf2,
        |    sum(CASE WHEN w = 'stream' THEN 1 ELSE 0 END)::BIGINT AS tf3
        |  FROM toks GROUP BY doc_id),
        |s AS (SELECT tf.doc_id,
        |    ln((tf1::DOUBLE + 2000.0::DOUBLE * cf1::DOUBLE / t::DOUBLE)
        |       / (dl::DOUBLE + 2000.0::DOUBLE))
        |  + ln((tf2::DOUBLE + 2000.0::DOUBLE * cf2::DOUBLE / t::DOUBLE)
        |       / (dl::DOUBLE + 2000.0::DOUBLE))
        |  + ln((tf3::DOUBLE + 2000.0::DOUBLE * cf3::DOUBLE / t::DOUBLE)
        |       / (dl::DOUBLE + 2000.0::DOUBLE)) AS qld,
        |    tf1 + tf2 + tf3 AS m
        |  FROM tf JOIN dlen USING (doc_id), tot, cf)
        |SELECT doc_id, round(qld, 6) AS qld FROM s WHERE m > 0
        |ORDER BY doc_id""".stripMargin.trim,

    // onion overlap: distinct shingle inverted index + df join back,
    // all-integral ppm via floor division (non-negative operands)
    "q_onion" ->
      """WITH docs AS (
        |  SELECT doc_id AS id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |         array_to_string(list_slice(w, 1, len(w) - 5), ' ')
        |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') w
        |        FROM documents)),
        |sets AS (
        |  SELECT id, list_distinct(list_transform(
        |      generate_series(0, greatest(len(w) - 3, 0)),
        |      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
        |  FROM (SELECT id, string_split(lower(trim(text)), ' ') w FROM docs)),
        |inv AS (SELECT id, unnest(s) AS g FROM sets),
        |dfq AS (SELECT g, count(*)::BIGINT AS df FROM inv GROUP BY g),
        |per AS (SELECT id, count(*)::BIGINT AS n_shingles,
        |    sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_common
        |  FROM inv JOIN dfq USING (g) GROUP BY id)
        |SELECT id, n_shingles, n_common,
        |  (n_common * 1000000 // n_shingles)::BIGINT AS common_ppm,
        |  (n_common * 1000000 // n_shingles) < 500000 AS keep
        |FROM per ORDER BY id""".stripMargin.trim,

    // language-mix over planted code-switched docs: the q_chunk window
    // construction + the q_lang_id scorer per chunk + majority pick
    // with the operator's (count desc, lang asc) tiebreak
    "q_lang_mix" ->
      """WITH d0 AS (SELECT a.doc_id AS doc_id, a.text || ' ' || b.text AS text
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
        |d AS (SELECT doc_id, text, length(text) AS len FROM d0
        |  WHERE length(text) > 0),
        |n AS (SELECT doc_id, text, (len - 1) // 120 + 1 AS nc FROM d),
        |s AS (SELECT doc_id, unnest(generate_series(0, nc - 1)) AS i, text
        |  FROM n),
        |cks AS (SELECT doc_id, i,
        |    substring(text, cast(i * 120 + 1 AS INT), 120) AS ck FROM s),
        |sc AS (SELECT doc_id, i,
        |    len(regexp_replace(ck, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
        |    len(ck) AS nch,
        |    list_distinct(regexp_split_to_array(lower(trim(ck)), '\s+')) AS toks
        |  FROM cks),
        |unp AS (
        |  SELECT doc_id, i, cjk, nch, 'de' AS lang,
        |    len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','mit','auf','für'])) AS sco FROM sc
        |  UNION ALL SELECT doc_id, i, cjk, nch, 'en',
        |    len(list_intersect(toks, ['the','a','and','of','to','in','is','it','that','for'])) FROM sc
        |  UNION ALL SELECT doc_id, i, cjk, nch, 'es',
        |    len(list_intersect(toks, ['el','la','los','y','es','un','una','en','por','para'])) FROM sc
        |  UNION ALL SELECT doc_id, i, cjk, nch, 'fr',
        |    len(list_intersect(toks, ['le','la','les','et','est','un','une','dans','pour','que'])) FROM sc),
        |best AS (
        |  SELECT doc_id, i, cjk, nch, lang, sco,
        |         row_number() OVER (PARTITION BY doc_id, i
        |           ORDER BY sco DESC, lang DESC) AS rn
        |  FROM unp),
        |langs AS (SELECT doc_id,
        |    CASE WHEN cjk * 2 > nch THEN 'zh'
        |         WHEN sco = 0 THEN 'und' ELSE lang END AS lang
        |  FROM best WHERE rn = 1),
        |per AS (SELECT doc_id, lang, count(*)::BIGINT AS c
        |  FROM langs GROUP BY 1, 2),
        |maj AS (SELECT doc_id, lang, c,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY c DESC, lang ASC) AS rn FROM per)
        |SELECT doc_id, sum(c)::BIGINT AS n_chunks,
        |  count(*)::BIGINT AS n_langs,
        |  max(CASE WHEN rn = 1 THEN lang END) AS major_lang,
        |  (max(CASE WHEN rn = 1 THEN c END) * 1000000
        |    // sum(c))::BIGINT AS major_ppm
        |FROM maj GROUP BY doc_id ORDER BY doc_id""".stripMargin.trim,

    // gains/lift deciles: the globalRank bucket formula
    // (rank−1)·10 // N, cumulative ppm in HUGEINT floor division
    "q_gains" ->
      """WITH t AS (SELECT l_orderkey * 10 + l_linenumber AS id,
        |    l_extendedprice AS s,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |r AS (SELECT y, (row_number() OVER (ORDER BY s DESC, id) - 1) * 10
        |    // (SELECT count(*) FROM t) AS bucket FROM t),
        |per AS (SELECT bucket, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
        |  FROM r GROUP BY bucket),
        |c AS (SELECT bucket, n, pos,
        |    sum(n) OVER (ORDER BY bucket)::BIGINT AS cum_n,
        |    sum(pos) OVER (ORDER BY bucket)::BIGINT AS cum_pos,
        |    (SELECT sum(n) FROM per)::HUGEINT AS tn,
        |    (SELECT sum(pos) FROM per)::HUGEINT AS tp FROM per)
        |SELECT bucket, n, pos, cum_n, cum_pos,
        |  (cum_pos::HUGEINT * 1000000 // tp)::BIGINT AS capture_ppm,
        |  (cum_pos::HUGEINT * 1000000 * tn
        |    // (cum_n::HUGEINT * tp))::BIGINT AS lift_ppm
        |FROM c ORDER BY bucket""".stripMargin.trim,

    // mean cumulative function of recurrent error events per user
    "q_mcf" ->
      """WITH u AS (SELECT count(DISTINCT user_id)::BIGINT AS nu FROM events),
        |d AS (SELECT ts::DATE AS day, count(*)::BIGINT AS n_events
        |  FROM events WHERE event_type = 'error' GROUP BY 1),
        |c AS (SELECT day, n_events,
        |    sum(n_events) OVER (ORDER BY day)::BIGINT AS cum FROM d)
        |SELECT day, n_events, cum AS cum_events,
        |  (cum * 1000000 // (SELECT nu FROM u))::BIGINT AS mcf_micro
        |FROM c ORDER BY day""".stripMargin.trim,

    // capture-recapture: the minhash catch (pr, from the shared
    // near-dup CTE) x the simhash catch (the q_dedup_simhash pipeline,
    // s-prefixed) -> Chapman estimate, all-integral
    "q_capture_recapture" -> (nearDupClusterCte + """,
        |stoks AS (
        |  SELECT id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        |  FROM docs),
        |sth AS (SELECT id, substr(md5(w), 1, 16) AS h FROM stoks),
        |sbits AS (
        |  SELECT id, g.b,
        |    sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, 16 - g.b // 4, 1)) - 1)
        |                   >> (g.b % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM sth, generate_series(0, 63) AS g(b) GROUP BY id, g.b),
        |ssv AS (SELECT id, string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, ''
        |                              ORDER BY b) AS bv
        |        FROM sbits GROUP BY id),
        |sbands AS (SELECT id, g.band, substr(bv, g.band * 16 + 1, 16) AS bucket
        |           FROM ssv, generate_series(0, 3) AS g(band)),
        |scand AS (SELECT DISTINCT l.id AS id_a, r.id AS id_b
        |          FROM sbands l JOIN sbands r
        |          ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id),
        |sham AS (SELECT id_a, id_b,
        |           len(list_filter(generate_series(1, 64),
        |                 i -> substr(a.bv, i, 1) != substr(b.bv, i, 1))) AS hamming
        |         FROM scand JOIN ssv a ON scand.id_a = a.id
        |              JOIN ssv b ON scand.id_b = b.id),
        |sp AS (SELECT id_a, id_b FROM sham WHERE hamming <= 6),
        |cc AS (SELECT count(*)::BIGINT AS n1 FROM pr),
        |cs AS (SELECT count(*)::BIGINT AS n2 FROM sp),
        |ov AS (SELECT count(*)::BIGINT AS m FROM pr JOIN sp USING (id_a, id_b))
        |SELECT n1 AS n_1, n2 AS n_2, m AS overlap,
        |  ((n1 + 1)::HUGEINT * (n2 + 1) // (m + 1) - 1)::BIGINT AS chapman_est,
        |  (n1 * 1000000
        |    // ((n1 + 1)::HUGEINT * (n2 + 1) // (m + 1) - 1))::BIGINT
        |    AS coverage_1_ppm,
        |  (n2 * 1000000
        |    // ((n1 + 1)::HUGEINT * (n2 + 1) // (m + 1) - 1))::BIGINT
        |    AS coverage_2_ppm
        |FROM cc, cs, ov""".stripMargin.trim),

    // Cronbach's alpha: ONE moment aggregation over cents, mirrored
    // population-variance closed form
    "q_cronbach" ->
      """WITH m AS (SELECT count(*)::HUGEINT AS n,
        |    sum(q)::HUGEINT AS s1, sum(q * q) AS ss1,
        |    sum(d)::HUGEINT AS s2, sum(d * d) AS ss2,
        |    sum(t)::HUGEINT AS s3, sum(t * t) AS ss3,
        |    sum(q + d + t)::HUGEINT AS st,
        |    sum((q + d + t) * (q + d + t)) AS stt
        |  FROM (SELECT
        |      CAST(round(l_quantity * 100.0) AS BIGINT)::HUGEINT AS q,
        |      CAST(round(l_discount * 100.0) AS BIGINT)::HUGEINT AS d,
        |      CAST(round(l_tax * 100.0) AS BIGINT)::HUGEINT AS t
        |    FROM lineitem
        |    WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        |      AND l_tax IS NOT NULL))
        |SELECT n::BIGINT AS n, 3::BIGINT AS k_items,
        |  round(3.0::DOUBLE / 2.0::DOUBLE * (1.0::DOUBLE -
        |    (((n * ss1 - s1 * s1)::DOUBLE / (n * n)::DOUBLE)
        |     + ((n * ss2 - s2 * s2)::DOUBLE / (n * n)::DOUBLE)
        |     + ((n * ss3 - s3 * s3)::DOUBLE / (n * n)::DOUBLE))
        |    / ((n * stt - st * st)::DOUBLE / (n * n)::DOUBLE)), 6)
        |    + 0.0 AS alpha
        |FROM m""".stripMargin.trim,

    // ICC(1): anovaF moment decomposition + unbalanced mean group size
    "q_icc" ->
      """WITH m AS (SELECT l_returnflag AS g, count(*)::HUGEINT AS n,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))::HUGEINT AS s,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)::HUGEINT
        |        * CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS ss
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS k, sum(n)::HUGEINT AS ntot,
        |    sum(s)::HUGEINT AS stot,
        |    sum((s * s)::DOUBLE / n::DOUBLE) AS q,
        |    sum(ss::DOUBLE) AS sssum, sum(n * n)::HUGEINT AS nsq FROM m),
        |b AS (SELECT k, ntot,
        |    q - (stot * stot)::DOUBLE / ntot::DOUBLE AS ssb,
        |    sssum - q AS ssw, nsq FROM a),
        |c AS (SELECT k, ntot,
        |    ssb / (k::DOUBLE - 1.0::DOUBLE) AS msb,
        |    ssw / (ntot::DOUBLE - k::DOUBLE) AS msw,
        |    (ntot::DOUBLE - nsq::DOUBLE / ntot::DOUBLE)
        |      / (k::DOUBLE - 1.0::DOUBLE) AS n0 FROM b)
        |SELECT k AS k_groups, ntot::BIGINT AS n, round(n0, 6) AS n0,
        |  round((msb - msw) / (msb + (n0 - 1.0::DOUBLE) * msw), 6)
        |    + 0.0 AS icc
        |FROM c""".stripMargin.trim,

    // McNemar on paired within-user outcomes (purchase before vs after
    // day 15) — discordant-cell chi-square, integral until one division
    "q_mcnemar" ->
      """WITH per AS (SELECT user_id, ts::DATE AS day,
        |    max(CASE WHEN event_type = 'purchase'
        |        AND extract(hour FROM ts) < 12 THEN 1 ELSE 0 END) AS a,
        |    max(CASE WHEN event_type = 'purchase'
        |        AND NOT (extract(hour FROM ts) < 12)
        |        THEN 1 ELSE 0 END) AS b
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)::BIGINT AS n10,
        |    sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)::BIGINT AS n01
        |  FROM per)
        |SELECT n AS n_pairs, n10, n01,
        |  round(((n10 - n01)::DOUBLE * (n10 - n01)::DOUBLE)
        |    / (n10 + n01)::DOUBLE, 6) AS chi2
        |FROM m""".stripMargin.trim,

    // Wald–Wolfowitz runs test around the exact day-total median
    // (2×-median on the integer grid; equal-to-median days dropped)
    "q_runs_test" ->
      """WITH dd AS (SELECT ts::DATE AS day,
        |    sum(CAST(round(value * 100.0) AS BIGINT))::BIGINT AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |med AS (SELECT CAST(round(2 * quantile_cont(y, 0.5)) AS BIGINT) AS m2
        |  FROM dd),
        |sgn AS (SELECT day, (2 * y > m2) AS s FROM dd, med WHERE 2 * y <> m2),
        |r AS (SELECT s, lag(s) OVER (ORDER BY day) AS ps FROM sgn),
        |agg AS (SELECT sum(CASE WHEN s THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN s THEN 0 ELSE 1 END)::BIGINT AS b,
        |    (1 + sum(CASE WHEN ps IS NOT NULL AND s <> ps
        |       THEN 1 ELSE 0 END))::BIGINT AS runs
        |  FROM r)
        |SELECT a AS n_above, b AS n_below, runs AS n_runs,
        |  round((runs::DOUBLE - (2.0::DOUBLE * a * b / (a + b)::DOUBLE
        |      + 1.0::DOUBLE))
        |    / sqrt(2.0::DOUBLE * a * b * (2.0::DOUBLE * a * b - a - b)
        |      / ((a + b)::DOUBLE * (a + b)::DOUBLE
        |         * ((a + b)::DOUBLE - 1.0::DOUBLE))), 6) + 0.0 AS z
        |FROM agg""".stripMargin.trim,

    // Mann–Kendall: integral S over the calendar-bounded day pairs,
    // tie-corrected 18·Var, continuity-corrected z
    "q_mann_kendall" ->
      """WITH dd AS (SELECT ts::DATE AS day,
        |    sum(CAST(round(value * 100.0) AS BIGINT))::BIGINT AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |n AS (SELECT count(*)::BIGINT AS nd FROM dd),
        |s AS (SELECT sum(CASE WHEN b.y > a.y THEN 1
        |    WHEN b.y < a.y THEN -1 ELSE 0 END)::BIGINT AS st
        |  FROM dd a JOIN dd b ON b.day > a.day),
        |t AS (SELECT coalesce(sum(c * (c - 1) * (2 * c + 5)), 0)::BIGINT AS tie
        |  FROM (SELECT count(*)::BIGINT AS c FROM dd GROUP BY y
        |        HAVING count(*) > 1)),
        |v AS (SELECT nd, st,
        |    (nd * (nd - 1) * (2 * nd + 5) - tie)::BIGINT AS var18
        |  FROM n, s, t)
        |SELECT nd AS n_days, st AS s_stat, var18,
        |  round(CASE WHEN st > 0
        |      THEN (st - 1)::DOUBLE / sqrt(var18::DOUBLE / 18.0::DOUBLE)
        |    WHEN st < 0
        |      THEN (st + 1)::DOUBLE / sqrt(var18::DOUBLE / 18.0::DOUBLE)
        |    ELSE 0.0::DOUBLE END, 6) + 0.0 AS z
        |FROM v""".stripMargin.trim,

    // quantile normalization: within-slice rank -> pooled position by
    // integral floor division; selection (no interpolation), all longs
    "q_quantile_norm" ->
      """WITH t AS (SELECT event_id AS id, event_type AS g,
        |    CAST(round(value * 100.0) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |nc AS (SELECT count(*)::BIGINT AS nn FROM t),
        |r AS (SELECT id, g, x,
        |    row_number() OVER (PARTITION BY g ORDER BY x, id) AS r,
        |    count(*) OVER (PARTITION BY g) AS ns FROM t),
        |p AS (SELECT x AS px, row_number() OVER (ORDER BY x, id) AS pr
        |  FROM t),
        |q AS (SELECT id, g, x,
        |    least(greatest((r * nn) // (ns + 1) + 1, 1), nn) AS pos
        |  FROM r, nc)
        |SELECT q.id AS event_id, q.g AS event_type, q.x AS value_cents,
        |  p.px AS norm_cents
        |FROM q JOIN p ON q.pos = p.pr
        |WHERE q.id < 500 ORDER BY event_id""".stripMargin.trim,

    // 3-hop harmonic centrality, BFS frontier unrolled level by level
    "q_closeness" -> (coPurchaseCte + """,
        |sym AS (SELECT a AS s, b AS d FROM e UNION ALL SELECT b, a FROM e),
        |d1 AS (SELECT DISTINCT s AS v, d AS u FROM sym),
        |d2 AS (SELECT DISTINCT d1.v, sym.d AS u
        |  FROM d1 JOIN sym ON d1.u = sym.s
        |  WHERE sym.d <> d1.v
        |    AND NOT EXISTS (SELECT 1 FROM d1 p WHERE p.v = d1.v AND p.u = sym.d)),
        |d3 AS (SELECT DISTINCT d2.v, sym.d AS u
        |  FROM d2 JOIN sym ON d2.u = sym.s
        |  WHERE sym.d <> d2.v
        |    AND NOT EXISTS (SELECT 1 FROM d1 p WHERE p.v = d2.v AND p.u = sym.d)
        |    AND NOT EXISTS (SELECT 1 FROM d2 p WHERE p.v = d2.v AND p.u = sym.d)),
        |c1 AS (SELECT v, count(*)::BIGINT AS n_1 FROM d1 GROUP BY v),
        |c2 AS (SELECT v, count(*)::BIGINT AS n_2 FROM d2 GROUP BY v),
        |c3 AS (SELECT v, count(*)::BIGINT AS n_3 FROM d3 GROUP BY v)
        |SELECT c1.v AS id, n_1, coalesce(n_2, 0)::BIGINT AS n_2,
        |  coalesce(n_3, 0)::BIGINT AS n_3,
        |  (n_1 * 1000000 + coalesce(n_2, 0) * 500000
        |    + coalesce(n_3, 0) * 333333)::BIGINT AS harmonic_micro
        |FROM c1 LEFT JOIN c2 ON c1.v = c2.v LEFT JOIN c3 ON c1.v = c3.v
        |ORDER BY id""".stripMargin.trim),

    // arbitrary grouping sets in one pass; (all) placeholders keep the
    // schema null-free (the base columns are non-null)
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |  coalesce(l_linestatus, '(all)') AS ls,
        |  sum(l_quantity)::BIGINT AS sum_qty, count(*)::BIGINT AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())
        |ORDER BY rf, ls""".stripMargin.trim,

    // candidate-key audit: per set, grouped distinct/dup counts; a set
    // with NULLs or dups is not a key
    "q_key_detect" ->
      """WITH n AS (SELECT count(*)::BIGINT AS n FROM orders),
        |s1 AS (SELECT count(*)::BIGINT AS dist,
        |    coalesce(sum(c - 1), 0)::BIGINT AS dup FROM (
        |  SELECT count(*)::BIGINT AS c FROM orders
        |  WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)),
        |s2 AS (SELECT count(*)::BIGINT AS dist,
        |    coalesce(sum(c - 1), 0)::BIGINT AS dup FROM (
        |  SELECT count(*)::BIGINT AS c FROM orders
        |  WHERE o_custkey IS NOT NULL GROUP BY o_custkey)),
        |s3 AS (SELECT count(*)::BIGINT AS dist,
        |    coalesce(sum(c - 1), 0)::BIGINT AS dup FROM (
        |  SELECT count(*)::BIGINT AS c FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        |  GROUP BY o_custkey, o_orderdate))
        |SELECT 'o_orderkey' AS column_set, n.n AS n_rows, dist AS n_distinct,
        |  n.n - dist AS n_dup_rows, (dist * 1000000 // n.n)::BIGINT AS unique_ppm,
        |  (dist + dup = n.n AND dup = 0) AS is_key FROM n, s1
        |UNION ALL
        |SELECT 'o_custkey', n.n, dist, n.n - dist,
        |  (dist * 1000000 // n.n)::BIGINT,
        |  (dist + dup = n.n AND dup = 0) FROM n, s2
        |UNION ALL
        |SELECT 'o_custkey,o_orderdate', n.n, dist, n.n - dist,
        |  (dist * 1000000 // n.n)::BIGINT,
        |  (dist + dup = n.n AND dup = 0) FROM n, s3
        |ORDER BY column_set""".stripMargin.trim,

    // missingness co-occurrence over planted correlated nulls — one
    // aggregation, all-integral
    "q_null_pattern" ->
      """WITH e AS (SELECT
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v,
        |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE props END AS p,
        |    CASE WHEN event_id % 35 = 0 THEN NULL ELSE event_type END AS t
        |  FROM events),
        |m AS (SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS nv,
        |    sum(CASE WHEN p IS NULL THEN 1 ELSE 0 END)::BIGINT AS np,
        |    sum(CASE WHEN t IS NULL THEN 1 ELSE 0 END)::BIGINT AS nt,
        |    sum(CASE WHEN v IS NULL AND p IS NULL THEN 1 ELSE 0 END)::BIGINT AS nvp,
        |    sum(CASE WHEN v IS NULL AND t IS NULL THEN 1 ELSE 0 END)::BIGINT AS nvt,
        |    sum(CASE WHEN p IS NULL AND t IS NULL THEN 1 ELSE 0 END)::BIGINT AS npt
        |  FROM e)
        |SELECT 'value' AS col_a, 'props' AS col_b, n, nv AS null_a,
        |  np AS null_b, nvp AS null_both,
        |  (nvp * 1000000 // n)::BIGINT AS both_ppm FROM m
        |UNION ALL
        |SELECT 'value', 'event_type', n, nv, nt, nvt,
        |  (nvt * 1000000 // n)::BIGINT FROM m
        |UNION ALL
        |SELECT 'props', 'event_type', n, np, nt, npt,
        |  (npt * 1000000 // n)::BIGINT FROM m
        |ORDER BY col_a, col_b""".stripMargin.trim,

    // Durbin–Watson on the mean-centered daily series: e' = N·y − S is
    // HUGEINT-exact, DW = Σ(Δe')²/Σe'² with one double division
    "q_dw" ->
      """WITH dd AS (SELECT ts::DATE AS day,
        |    sum(CAST(round(value * 100.0) AS BIGINT))::HUGEINT AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |s AS (SELECT count(*)::HUGEINT AS n, sum(y) AS st FROM dd),
        |e AS (SELECT day, n * y - st AS ev,
        |    lag(n * y - st) OVER (ORDER BY day) AS ep FROM dd, s),
        |f AS (SELECT sum((ev - ep) * (ev - ep)) AS num,
        |    sum(ev * ev) AS den, count(*)::BIGINT AS nd FROM e)
        |SELECT nd AS n_days, round(num::DOUBLE / den::DOUBLE, 6) AS dw
        |FROM f""".stripMargin.trim
  )

  /** q_ranked_eval / q_ir_summary: the DCG discount weights and the
    * lcm(1..k) reciprocal-rank scale are computed ONCE in Scala
    * (graft.ops.Evaluation.dcgWeights / rankLcm) and injected into the
    * SQL as integer literals, so cross-engine log2 agreement is never
    * required — every metric is integral arithmetic on those shared
    * constants. */
  private def rankedEvalCtes: String = {
    val k = 10
    val lcm = graft.ops.Evaluation.rankLcm(k)
    val values = graft.ops.Evaluation.dcgWeights(k).zipWithIndex
      .map { case (wt, i) => s"(${i + 1}, $wt::BIGINT)" }.mkString(", ")
    s"""WITH wt(pos, w) AS (VALUES $values),
       |ev AS (SELECT user_id, event_id, value,
       |    CASE event_type WHEN 'purchase' THEN 3 WHEN 'signup' THEN 2
       |      WHEN 'click' THEN 1 WHEN 'view' THEN 1 ELSE 0 END AS rel
       |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
       |topk AS (SELECT user_id, event_id, rel,
       |    row_number() OVER (PARTITION BY user_id
       |                       ORDER BY value DESC, event_id) AS rnk
       |  FROM ev QUALIFY rnk <= $k),
       |nrel AS (SELECT user_id, count(*)::BIGINT AS n_rel
       |  FROM ev WHERE rel > 0 GROUP BY 1),
       |idcg AS (SELECT user_id, sum(rel * w)::BIGINT AS idcg_e9 FROM (
       |    SELECT user_id, rel, row_number() OVER (PARTITION BY user_id
       |        ORDER BY rel DESC, event_id) AS ir
       |    FROM ev WHERE rel > 0 QUALIFY ir <= $k) t
       |  JOIN wt ON t.ir = wt.pos GROUP BY 1),
       |g AS (SELECT t.user_id, t.rnk, t.rel, (t.rel > 0)::BIGINT AS hit,
       |    sum((t.rel > 0)::BIGINT) OVER (PARTITION BY t.user_id
       |                                   ORDER BY t.rnk) AS hits_at, wt.w
       |  FROM topk t JOIN wt ON t.rnk = wt.pos),
       |pq AS (SELECT user_id, sum(hit)::BIGINT AS hits,
       |    sum(rel * w)::BIGINT AS dcg_e9,
       |    sum(CASE WHEN hit = 1 THEN hits_at * ($lcm // rnk)
       |        ELSE 0 END)::BIGINT AS ap_num,
       |    min(CASE WHEN hit = 1 THEN rnk END) AS first_rel
       |  FROM g GROUP BY 1),
       |ranked AS (SELECT pq.user_id, hits, coalesce(n_rel, 0)::BIGINT AS n_rel,
       |    (hits * 1000000 // $k)::BIGINT AS prec_ppm,
       |    CASE WHEN coalesce(n_rel, 0) > 0
       |      THEN (hits * 1000000 // n_rel)::BIGINT END AS rec_ppm,
       |    coalesce($lcm // first_rel, 0)::BIGINT AS rr_lcm,
       |    CASE WHEN coalesce(n_rel, 0) > 0
       |      THEN (ap_num * 1000000 // ($lcm * least(n_rel, $k)))::BIGINT
       |    END AS ap_ppm,
       |    dcg_e9, coalesce(idcg_e9, 0)::BIGINT AS idcg_e9,
       |    CASE WHEN coalesce(idcg_e9, 0) > 0
       |      THEN (dcg_e9 * 1000000 // idcg_e9)::BIGINT END AS ndcg_ppm
       |  FROM pq LEFT JOIN nrel USING (user_id)
       |          LEFT JOIN idcg USING (user_id))""".stripMargin
  }

  private def rankedEvalSql: String =
    s"$rankedEvalCtes\nSELECT * FROM ranked ORDER BY user_id"

  /** q_bootstrap_ci: the Poisson(1) CDF thresholds come from the SAME
    * driver computation as the Spark plan
    * (graft.ops.Sampling.poissonThresholdsU32), injected as integer
    * literals — weights are pure integral hash arithmetic in both
    * engines. */
  private def bootstrapCiSql: String = {
    val t = graft.ops.Sampling.poissonThresholdsU32(5)
    val cases = t.zipWithIndex
      .map { case (thr, k) => s"WHEN u < $thr THEN $k" }.mkString(" ")
    s"""WITH r AS (SELECT event_id AS id,
       |    CAST(round(value * 100.0) AS BIGINT) AS x
       |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
       |g AS (SELECT id, x, b FROM r, generate_series(0, 39) AS t(b)),
       |h AS (SELECT b, x,
       |    ((id % 2147483648 + b * 40503) * 2654435761) % 4294967296 AS u
       |  FROM g),
       |w AS (SELECT b, x, CASE $cases ELSE 6 END AS w FROM h)
       |SELECT b AS replicate, sum(w)::BIGINT AS n_eff,
       |  CASE WHEN sum(w) > 0
       |    THEN (sum(w * x) * 1000000 // sum(w))::BIGINT
       |  END AS mean_ppm_units
       |FROM w GROUP BY b ORDER BY b""".stripMargin.trim
  }

  private def irSummarySql: String = {
    val lcm = graft.ops.Evaluation.rankLcm(10)
    s"""$rankedEvalCtes
       |SELECT count(*)::BIGINT AS n_queries,
       |  (sum(rr_lcm) * 1000000 // ($lcm * count(*)))::BIGINT AS mrr_ppm,
       |  (sum(ap_ppm) // count(ap_ppm))::BIGINT AS map_ppm,
       |  (sum(ndcg_ppm) // count(ndcg_ppm))::BIGINT AS mean_ndcg_ppm
       |FROM ranked""".stripMargin.trim
  }

  /** q_label_prop: two clamped synchronous rounds unrolled over the
    * near-dup pair graph — per round one labeled-neighbor count and
    * the (count desc, label asc) argmax, seeds override, unlabeled
    * nodes keep their previous state. */
  private def labelPropSql: String = {
    val b = new StringBuilder
    b ++= s"""$nearDupClusterCte,
             |lpn AS (SELECT DISTINCT s AS id FROM e),
             |lps AS (SELECT doc_id, source FROM documents WHERE doc_id < 250),
             |lab0 AS (SELECT lpn.id, lps.source AS lbl
             |         FROM lpn LEFT JOIN lps ON lpn.id = lps.doc_id)""".stripMargin
    for (t <- 1 to 2) {
      val prev = s"lab${t - 1}"
      b ++= s""",
               |c$t AS (SELECT e.s AS id, l.lbl, count(*)::BIGINT AS c
               |        FROM e JOIN $prev l ON e.d = l.id
               |        WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
               |b$t AS (SELECT id, lbl FROM (
               |          SELECT id, lbl, row_number() OVER (PARTITION BY id
               |            ORDER BY c DESC, lbl) AS rn FROM c$t) WHERE rn = 1),
               |lab$t AS (SELECT p.id,
               |            coalesce(lps.source, b$t.lbl, p.lbl) AS lbl
               |          FROM $prev p
               |          LEFT JOIN lps ON p.id = lps.doc_id
               |          LEFT JOIN b$t ON p.id = b$t.id)""".stripMargin
    }
    b ++= "\nSELECT id, lbl AS source FROM lab2 ORDER BY id"
    b.result()
  }

  /** q_embed_int8: the power-of-two exponent comes from an unrolled
    * comparison chain against EXACT `127·2^e` double literals (Scala
    * Double.toString round-trips, so both engines compare the same
    * doubles — no cross-engine log2); the matching scale literal comes
    * from the same generator. round() is half-away-from-zero in both
    * engines (the kernel implements it explicitly). */
  private def embedInt8Sql: String = {
    val eArms = (-40 to 39).map { e =>
      s"WHEN ma <= ${(127.0 * java.lang.Math.scalb(1.0, e)).toString} THEN $e"
    }.mkString("\n    ")
    val sArms = (-40 to 40).map { e =>
      s"WHEN $e THEN ${java.lang.Math.scalb(1.0, e).toString}"
    }.mkString("\n    ")
    s"""WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
       |  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL),
       |m AS (SELECT vec_id, label, v,
       |    coalesce(list_max(list_transform(v, x -> abs(x))), 0) AS ma
       |  FROM e0),
       |ex AS (SELECT vec_id, label, v,
       |    CASE $eArms ELSE 40 END AS e FROM m),
       |sc AS (SELECT vec_id, label, v, e,
       |    CASE e $sArms END::DOUBLE AS s FROM ex),
       |comp AS (SELECT vec_id, label, e, s, unnest(v) AS x FROM sc),
       |qq AS (SELECT vec_id, label, e,
       |    CAST(round((x - round(x / s) * s) * (x - round(x / s) * s)
       |         * 1e15) AS BIGINT) AS t
       |  FROM comp),
       |er AS (SELECT vec_id, label, e, sum(t)::BIGINT AS err
       |       FROM qq GROUP BY 1, 2, 3)
       |SELECT label, count(*)::BIGINT AS n_vecs,
       |  min(e) AS e_min, max(e) AS e_max,
       |  sum(err)::BIGINT AS total_err_e15, max(err)::BIGINT AS max_err_e15
       |FROM er GROUP BY label ORDER BY label""".stripMargin.trim
  }

  /** q_hits: 2 Gauss-Seidel HITS iterations (a ← Σ_in h then h ← Σ_out a,
    * each followed by the power-of-two rescale keeping max < 2^40)
    * mechanically unrolled — pure BIGINT arithmetic, so summation order
    * cannot matter; `floor(log2(max))` equals the engine's
    * `63 − numberOfLeadingZeros(max)` for every max < 2^53 (values stay
    * under ~2^53 whenever max same-key degree < 2^13, far above any
    * planted graph). */
  private def hitsSql: String = {
    val b = new StringBuilder
    b ++= s"""$nearDupClusterCte,
             |hed AS MATERIALIZED (SELECT DISTINCT id_a AS s, id_b AS d FROM pr),
             |hn AS MATERIALIZED (
             |  SELECT DISTINCT id FROM (SELECT s AS id FROM hed UNION ALL SELECT d FROM hed)),
             |hv0 AS (SELECT id, 1::BIGINT AS v FROM hn)""".stripMargin
    // half-steps alternate: odd t aggregates over in-edges (auth from
    // hub), even t over out-edges (hub from auth)
    for (t <- 1 to 4) {
      val (grp, key) = if (t % 2 == 1) ("d", "s") else ("s", "d")
      val prev = if (t == 1) "hv0" else s"hv${t - 1}s"
      b ++= s""",
               |hr$t AS (SELECT hed.$grp AS id, sum(p.v)::BIGINT AS v
               |         FROM hed JOIN $prev p ON hed.$key = p.id GROUP BY hed.$grp),
               |hv$t AS (SELECT hn.id, coalesce(r.v, 0)::BIGINT AS v
               |         FROM hn LEFT JOIN hr$t r ON hn.id = r.id),
               |hk$t AS (SELECT greatest(0, floor(log2(greatest(max(v), 1)))::INT - 39) AS k FROM hv$t),
               |hv${t}s AS (SELECT id, (v >> (SELECT k FROM hk$t))::BIGINT AS v FROM hv$t)""".stripMargin
    }
    b ++= s"""
             |, htot AS (SELECT greatest((SELECT sum(v) FROM hv3s), 1) AS ta,
             |                  greatest((SELECT sum(v) FROM hv4s), 1) AS th)
             |SELECT a.v_id AS doc_id, a.v AS auth, h.v AS hub,
             |  round(a.v::DOUBLE / (SELECT ta FROM htot), 6) AS auth_share,
             |  round(h.v::DOUBLE / (SELECT th FROM htot), 6) AS hub_share
             |FROM (SELECT id AS v_id, v FROM hv3s) a
             |JOIN (SELECT id, v FROM hv4s) h ON a.v_id = h.id
             |ORDER BY doc_id""".stripMargin
    b.result()
  }

  /** Result-identical execution variants share their anchor's oracle:
    * the distributed ANN join probes reproduce the driver-path
    * arithmetic bit-for-bit, and the k-core fixpoint equals the
    * unrolled fixed-round oracle wherever peeling converges within its
    * rounds (spec-proved at every shipped SF). */
  val variants: Map[String, String] = Map(
    "q_ann_ivf_dist" -> sql("q_ann_ivf"),
    "q_ann_ivfpq_dist" -> sql("q_ann_ivfpq"),
    "q_kcore_conv" -> sql("q_kcore"),
    // incremental CC folds the late pair batch into the early batch's
    // labels; labels are connectivity, so the result is exactly the
    // full-recompute clustering
    "q_cc_incremental" -> sql("q_dedup_cluster"),

    // Bradley-Terry MM in INTEGER micro-units: the recursive CTE
    // carries the strength list; every round is two exact floor
    // divisions (denominator terms n*1e12 // (s_i+s_j), normalized
    // update u*k*1e6 // sum u) - bit-identical to the driver loop
    "q_bradley_terry" ->
      """WITH pd AS (
        |  SELECT CASE WHEN d1.n_chars > d2.n_chars THEN d1.source ELSE d2.source END AS w,
        |         CASE WHEN d1.n_chars > d2.n_chars THEN d2.source ELSE d1.source END AS l
        |  FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
        |  WHERE d1.source <> d2.source AND d1.n_chars <> d2.n_chars),
        |wn AS (SELECT w AS item, count(*)::BIGINT AS wins FROM pd GROUP BY 1),
        |gm0 AS (SELECT least(w, l) AS a, greatest(w, l) AS b, count(*)::BIGINT AS n
        |        FROM pd GROUP BY 1, 2),
        |it AS (SELECT item, row_number() OVER (ORDER BY item) AS rn,
        |              coalesce(wn.wins, 0) AS wins
        |       FROM (SELECT DISTINCT item FROM
        |              (SELECT a AS item FROM gm0 UNION SELECT b FROM gm0))
        |       LEFT JOIN wn USING (item)),
        |gm AS (SELECT ia.rn AS ra, ib.rn AS rb, gm0.n
        |       FROM gm0 JOIN it ia ON gm0.a = ia.item JOIN it ib ON gm0.b = ib.item),
        |mm AS (
        |  WITH RECURSIVE rec(iter, ss) AS (
        |    SELECT 0, (SELECT list(1000000::BIGINT ORDER BY rn) FROM it)
        |    UNION ALL
        |    SELECT r.iter + 1,
        |      (SELECT list(CASE WHEN usum > 0
        |                   THEN u * (SELECT count(*)::BIGINT FROM it) * 1000000 // usum
        |                   ELSE u END ORDER BY rn)
        |       FROM (
        |         SELECT i.rn,
        |           CASE WHEN coalesce(d.den, 0) > 0
        |                THEN i.wins * 1000000000000::BIGINT // d.den ELSE 0 END AS u,
        |           sum(CASE WHEN coalesce(d.den, 0) > 0
        |                THEN i.wins * 1000000000000::BIGINT // d.den ELSE 0 END) OVER () AS usum
        |         FROM it i LEFT JOIN (
        |           SELECT rn, sum(t)::BIGINT AS den FROM (
        |             SELECT g.ra AS rn,
        |               CASE WHEN r.ss[g.ra] + r.ss[g.rb] > 0
        |                    THEN g.n * 1000000000000::BIGINT // (r.ss[g.ra] + r.ss[g.rb]) ELSE 0 END AS t
        |             FROM gm g
        |             UNION ALL
        |             SELECT g.rb,
        |               CASE WHEN r.ss[g.ra] + r.ss[g.rb] > 0
        |                    THEN g.n * 1000000000000::BIGINT // (r.ss[g.ra] + r.ss[g.rb]) ELSE 0 END
        |             FROM gm g) GROUP BY rn) d ON i.rn = d.rn))
        |    FROM rec r WHERE r.iter < 15)
        |  SELECT ss FROM rec WHERE iter = 15),
        |gp AS (SELECT rn, sum(n)::BIGINT AS games FROM
        |        (SELECT ra AS rn, n FROM gm UNION ALL SELECT rb, n FROM gm) GROUP BY rn)
        |SELECT it.item, it.wins, gp.games, mm.ss[it.rn] AS strength_ppm
        |FROM it JOIN gp ON it.rn = gp.rn, mm
        |ORDER BY strength_ppm DESC, item""".stripMargin.trim,

    // Good-Turing: frequency-of-frequencies rollup + the r+1 self-join;
    // integral ppm outputs, floor division on both engines.
    // greatest(..., 1), not 0: shingleStream emits ONE partial shingle
    // for docs shorter than the window (the ws[i:i+2] slice clamps to
    // the same joined suffix), so the oracle must too — with 0 a
    // <3-word doc would silently diverge (round-14 ADVICE finding)
    "q_good_turing" ->
      """WITH ws AS (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT unnest(list_transform(
        |    generate_series(1, greatest(len(ws) - 2, 1)),
        |    i -> array_to_string(ws[i:i + 2], ' '))) AS w FROM ws),
        |c AS (SELECT w, count(*)::BIGINT AS r FROM w GROUP BY w),
        |f AS (SELECT r, count(*)::BIGINT AS n_r FROM c GROUP BY r),
        |t AS (SELECT sum(r * n_r)::BIGINT AS n_tokens,
        |        sum(CASE WHEN r = 1 THEN n_r ELSE 0 END)::BIGINT AS n1 FROM f)
        |SELECT f.r, f.n_r, coalesce(f2.n_r, 0)::BIGINT AS n_next,
        |  ((f.r + 1) * coalesce(f2.n_r, 0) * 1000000 // f.n_r)::BIGINT AS r_star_ppm,
        |  (CASE WHEN t.n_tokens > 0 THEN t.n1 * 1000000 // t.n_tokens ELSE 0 END)::BIGINT AS p0_ppm
        |FROM f LEFT JOIN f f2 ON f2.r = f.r + 1, t
        |WHERE f.r <= 8 ORDER BY f.r""".stripMargin.trim,

    // isotonic minimax in integral ppm: floor commutes with min and
    // max, so the floored range-average triangle IS the floor of the
    // exact PAV fit - bit-identical to the driver loop
    "q_isotonic" ->
      """WITH b AS (SELECT least(floor((l_discount * 10.0) * 10)::INT, 9) AS bin,
        |    (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT AS y
        |  FROM lineitem
        |  WHERE (l_discount * 10.0) >= 0 AND (l_discount * 10.0) <= 1),
        |g AS (SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
        |  FROM b GROUP BY bin),
        |p AS (SELECT bin, n, pos,
        |    sum(n) OVER (ORDER BY bin)::BIGINT AS cn,
        |    sum(pos) OVER (ORDER BY bin)::BIGINT AS cp FROM g),
        |tri AS (SELECT pk.bin AS bin, pi.bin AS i,
        |    min((pj.cp - pi.cp + pi.pos) * 1000000
        |        // (pj.cn - pi.cn + pi.n))::BIGINT AS mn
        |  FROM p pk JOIN p pi ON pi.bin <= pk.bin
        |            JOIN p pj ON pj.bin >= pk.bin
        |  GROUP BY pk.bin, pi.bin),
        |iso AS (SELECT bin, max(mn)::BIGINT AS iso_ppm FROM tri GROUP BY bin)
        |SELECT g.bin, g.n, g.pos, (g.pos * 1000000 // g.n)::BIGINT AS rate_ppm,
        |       iso.iso_ppm
        |FROM g JOIN iso USING (bin) ORDER BY g.bin""".stripMargin.trim,

    // Friedman: within-block doubled midranks (2*rank_min + t - 1)
    // keep the tie-corrected statistic an exact integer ratio
    "q_friedman" ->
      """WITH cells AS (SELECT user_id::VARCHAR AS b, event_type AS tr,
        |    sum(CAST(round(value * 100.0) AS BIGINT))::BIGINT AS v
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |    AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |kk AS (SELECT count(DISTINCT tr)::BIGINT AS k FROM cells),
        |sized AS (SELECT cells.*, count(*) OVER (PARTITION BY b) AS cnt
        |  FROM cells),
        |kept AS (SELECT sized.* FROM sized, kk WHERE sized.cnt = kk.k),
        |rk AS (SELECT b, tr, v,
        |    (2 * rank() OVER (PARTITION BY b ORDER BY v)
        |     + count(*) OVER (PARTITION BY b, v) - 1)::BIGINT AS r2
        |  FROM kept),
        |pt AS (SELECT tr, sum(r2)::BIGINT AS r2j FROM rk GROUP BY tr),
        |tot AS (SELECT sum(r2 * r2)::BIGINT AS a2x4,
        |    count(DISTINCT b)::BIGINT AS n FROM rk),
        |dr AS (SELECT count(DISTINCT b)::BIGINT AS nd FROM sized, kk
        |  WHERE sized.cnt <> kk.k),
        |agg AS (SELECT (SELECT k FROM kk) AS k, tot.n, tot.a2x4,
        |    (SELECT nd FROM dr) AS nd,
        |    (SELECT sum((r2j - tot.n * ((SELECT k FROM kk) + 1))
        |              * (r2j - tot.n * ((SELECT k FROM kk) + 1))) FROM pt)
        |      ::HUGEINT AS ss
        |  FROM tot)
        |SELECT n AS n_blocks, k, nd AS n_dropped,
        |  round(((k - 1) * ss)::DOUBLE
        |    / (a2x4 - n * k * (k + 1) * (k + 1))::DOUBLE, 6) + 0 AS chi2
        |FROM agg""".stripMargin.trim,

    // CMH: integer 2x2 cells per stratum, degenerate strata skipped,
    // sorted-stratum ordered fold for the double sums
    "q_cmh" ->
      """WITH cl AS (SELECT (day(ts) % 7)::VARCHAR AS s,
        |    (user_id % 2 = 0) AS e, (event_type = 'purchase') AS o
        |  FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |    AND event_type IS NOT NULL),
        |g AS (SELECT s,
        |    sum(CASE WHEN e AND o THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END)::BIGINT AS c,
        |    sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM cl GROUP BY s),
        |t AS (SELECT s, a, b, c, d,
        |    (a + b)::DOUBLE AS n1, (c + d)::DOUBLE AS n0,
        |    (a + c)::DOUBLE AS m1, (b + d)::DOUBLE AS m0,
        |    (a + b + c + d)::DOUBLE AS nk,
        |    (a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0
        |     AND a + b + c + d >= 2) AS ok
        |  FROM g),
        |f AS (SELECT count(*)::BIGINT AS n_strata,
        |    list_aggregate(list(CASE WHEN ok THEN a::DOUBLE ELSE 0 END
        |      ORDER BY s), 'sum') AS at,
        |    list_aggregate(list(CASE WHEN ok THEN n1 * m1 / nk ELSE 0 END
        |      ORDER BY s), 'sum') AS et,
        |    list_aggregate(list(CASE WHEN ok
        |      THEN n1 * n0 * m1 * m0 / (nk * nk * (nk - 1.0)) ELSE 0 END
        |      ORDER BY s), 'sum') AS vt,
        |    list_aggregate(list(CASE WHEN ok
        |      THEN a::DOUBLE * d::DOUBLE / nk ELSE 0 END
        |      ORDER BY s), 'sum') AS orn,
        |    list_aggregate(list(CASE WHEN ok
        |      THEN b::DOUBLE * c::DOUBLE / nk ELSE 0 END
        |      ORDER BY s), 'sum') AS ord
        |  FROM t)
        |SELECT n_strata, at::BIGINT AS a_total, round(et, 6) + 0 AS e_total,
        |  round(vt, 6) + 0 AS v_total,
        |  round((at - et) * (at - et) / vt, 6) + 0 AS cmh_chi2,
        |  round(orn / ord, 6) + 0 AS or_mh
        |FROM f""".stripMargin.trim,

    // Wilcoxon signed-rank: doubled midranks keep W+ and the tie
    // correction integral; the tie-corrected z is one fixed IEEE
    // expression on exact BIGINTs
    "q_wilcoxon" ->
      """WITH d0 AS (SELECT user_id AS u,
        |    (sum(CASE WHEN event_type = 'purchase'
        |          THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END)
        |     - sum(CASE WHEN event_type = 'click'
        |          THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END))::BIGINT AS d
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |d AS (SELECT u, d, abs(d) AS ad FROM d0 WHERE d <> 0),
        |g AS (SELECT ad, count(*)::BIGINT AS t,
        |    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS pos
        |  FROM d GROUP BY ad),
        |w AS (SELECT ad, t, pos,
        |    (2 * sum(t) OVER (ORDER BY ad) - t + 1)::BIGINT AS mid2 FROM g),
        |a AS (SELECT sum(t)::BIGINT AS n, sum(pos * mid2)::BIGINT AS w2,
        |    sum(t * t * t - t)::BIGINT AS tt FROM w)
        |SELECT n, w2 AS w_plus_x2, tt AS ties_t3,
        |  round((w2::DOUBLE - (n::DOUBLE * (n + 1)::DOUBLE) / 2.0)
        |    / sqrt(n::DOUBLE * (n + 1)::DOUBLE * (2 * n + 1)::DOUBLE / 6.0
        |           - tt::DOUBLE / 12.0), 6) + 0 AS z
        |FROM a""".stripMargin.trim,

    // ratio-metric delta-method CI: exact HUGEINT unit moments, one
    // fixed IEEE sequence for ratio/se/CI
    "q_ratio_ci" ->
      """WITH un AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase'
        |        THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END)::HUGEINT AS x,
        |    count(*)::HUGEINT AS y
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |m AS (SELECT count(*)::BIGINT AS n, sum(x)::HUGEINT AS sx,
        |    sum(y)::HUGEINT AS sy, sum(x * x)::HUGEINT AS sxx,
        |    sum(y * y)::HUGEINT AS syy, sum(x * y)::HUGEINT AS sxy FROM un),
        |e AS (SELECT n, sx, sy,
        |    sx::DOUBLE / sy::DOUBLE AS ratio,
        |    sy::DOUBLE / n::DOUBLE AS my,
        |    (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)
        |      / (n::DOUBLE - 1.0) AS varx,
        |    (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE)
        |      / (n::DOUBLE - 1.0) AS vary,
        |    (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
        |      / (n::DOUBLE - 1.0) AS covxy
        |  FROM m),
        |f AS (SELECT n, sx, sy, ratio,
        |    sqrt((varx - 2.0::DOUBLE * ratio * covxy + ratio * ratio * vary)
        |         / (n::DOUBLE * my * my)) AS se
        |  FROM e)
        |SELECT n AS n_units, sx::BIGINT AS sum_num, sy::BIGINT AS sum_den,
        |  round(ratio, 6) + 0 AS ratio, round(se, 6) + 0 AS se,
        |  round(ratio - 1.96::DOUBLE * se, 6) + 0 AS ci_lo,
        |  round(ratio + 1.96::DOUBLE * se, 6) + 0 AS ci_hi
        |FROM f""".stripMargin.trim,

    // sign-flip randomization test: md5-bit deterministic flips over
    // integral per-user cent diffs - every statistic an exact BIGINT
    "q_sign_flip" ->
      """WITH d AS (SELECT user_id AS u,
        |    (sum(CASE WHEN event_type = 'purchase'
        |          THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END)
        |     - sum(CASE WHEN event_type = 'click'
        |          THEN CAST(round(value * 100.0) AS BIGINT) ELSE 0 END))::BIGINT AS d
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |s AS (SELECT u, d, md5(u::varchar) AS h FROM d),
        |f AS (SELECT g.k,
        |    sum(CASE WHEN ((strpos('0123456789abcdef',
        |          substr(s.h, g.k // 4 + 1, 1)) - 1) >> (g.k % 4)) & 1 = 1
        |        THEN s.d ELSE -s.d END)::BIGINT AS stat
        |  FROM s, generate_series(0, 127) AS g(k) GROUP BY g.k),
        |o AS (SELECT sum(d)::BIGINT AS obs, count(*)::BIGINT AS n FROM d),
        |c AS (SELECT count(*)::BIGINT AS n_ge FROM f, o
        |  WHERE abs(f.stat) >= abs(o.obs))
        |SELECT o.n AS n_keys, 128 AS flips, o.obs AS stat_obs, c.n_ge,
        |  ((c.n_ge + 1) * 1000000 // 129)::BIGINT AS p_ppm
        |FROM o, c""".stripMargin.trim,

    // DoReMi EG step: integral shares, exact integer-avg means, the
    // max-stabilized exp, and a sorted-domain ordered fold for the
    // normalization denominator
    "q_domain_reweight" ->
      """WITH g AS (SELECT source AS domain, count(*)::BIGINT AS n,
        |    avg(n_chars) AS m
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
        |t AS (SELECT sum(n)::BIGINT AS total, max(m) AS mx,
        |    count(*)::BIGINT AS k FROM g),
        |u AS (SELECT domain, n, m, total, k,
        |    (n::DOUBLE / total::DOUBLE)
        |      * exp(0.01::DOUBLE * (m - mx)) AS uu
        |  FROM g, t),
        |ds AS (SELECT list_aggregate(list(uu ORDER BY domain), 'sum') AS den
        |  FROM u)
        |SELECT domain, n AS n_docs, (n * 1000000 // total)::BIGINT AS share_ppm,
        |  round(m, 6) + 0 AS mean_score,
        |  round((1.0::DOUBLE - 0.1::DOUBLE) * (uu / den)
        |    + 0.1::DOUBLE / k::DOUBLE, 6) + 0 AS weight
        |FROM u, ds ORDER BY domain""".stripMargin.trim,

    // HyperLogLog with md5-derived registers: bucket = top 10 bits of
    // the 60-bit md5 prefix, register = max leading-zero rank of the
    // 50-bit rest; harmonic denominator as the exact integer
    // sum(2^(51 - M_j)) over all 1024 buckets (empty -> 2^51), raw
    // estimate alpha * m^2 * 2^51 / S as one fixed IEEE sequence
    "q_hll" ->
      """WITH h AS (SELECT ('0x' || substr(md5(user_id::varchar), 1, 15))::BIGINT AS hv
        |  FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)),
        |b AS (SELECT hv >> 50 AS bucket,
        |    hv & ((1::BIGINT << 50) - 1) AS rest FROM h),
        |r AS (SELECT bucket,
        |    max(CASE WHEN rest = 0 THEN 51
        |        ELSE 50 - (length(bin(rest)) - 1) END)::BIGINT AS mreg
        |  FROM b GROUP BY bucket),
        |allb AS (SELECT g.bucket, coalesce(r.mreg, 0) AS mreg
        |  FROM generate_series(0, 1023) AS g(bucket)
        |  LEFT JOIN r ON g.bucket = r.bucket),
        |agg AS (SELECT sum(1::BIGINT << (51 - mreg))::BIGINT AS s,
        |    sum(CASE WHEN mreg = 0 THEN 1 ELSE 0 END)::BIGINT AS v_zero
        |  FROM allb),
        |e AS (SELECT v_zero, s,
        |    (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 1024.0))
        |      * (1024.0 * 1024.0) * (1::BIGINT << 51)::DOUBLE
        |      / s::DOUBLE AS raw
        |  FROM agg)
        |SELECT 10 AS p, 1024 AS m, v_zero, s AS s_scaled,
        |  round(raw, 4) + 0 AS est_raw,
        |  round(CASE WHEN raw <= 2.5::DOUBLE * 1024.0 AND v_zero > 0
        |        THEN 1024.0 * ln(1024.0 / v_zero::DOUBLE)
        |        ELSE raw END, 4) + 0 AS est
        |FROM e""".stripMargin.trim,

    // per-group HLL: the q_hll register replay PER KEY — occupied
    // buckets only (empty registers counted, never materialized:
    // v_zero = m - occ since occupied registers are always >= 1), same
    // exact-integer harmonic denominator and IEEE estimate sequence
    "q_hll_by" ->
      """WITH h AS (SELECT event_type AS g,
        |    ('0x' || substr(md5(user_id::varchar), 1, 15))::BIGINT AS hv
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |b AS (SELECT g, hv >> 50 AS bucket,
        |    hv & ((1::BIGINT << 50) - 1) AS rest FROM h),
        |r AS (SELECT g, bucket,
        |    max(CASE WHEN rest = 0 THEN 51
        |        ELSE 50 - (length(bin(rest)) - 1) END)::BIGINT AS mreg
        |  FROM b GROUP BY g, bucket),
        |agg AS (SELECT g, count(*)::BIGINT AS occ,
        |    sum(1::BIGINT << (51 - mreg))::BIGINT AS socc
        |  FROM r GROUP BY g),
        |e AS (SELECT g, (1024 - occ)::BIGINT AS v_zero,
        |    (socc + (1024 - occ) * (1::BIGINT << 51))::BIGINT AS s,
        |    (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 1024.0))
        |      * (1024.0 * 1024.0) * (1::BIGINT << 51)::DOUBLE
        |      / (socc + (1024 - occ) * (1::BIGINT << 51))::DOUBLE AS raw
        |  FROM agg)
        |SELECT g AS event_type, 10 AS p, 1024 AS m, v_zero, s AS s_scaled,
        |  round(raw, 4) + 0 AS est_raw,
        |  round(CASE WHEN raw <= 2.5::DOUBLE * 1024.0 AND v_zero > 0
        |        THEN 1024.0 * ln(1024.0 / v_zero::DOUBLE)
        |        ELSE raw END, 4) + 0 AS est
        |FROM e ORDER BY event_type""".stripMargin.trim,

    // Cox score test at beta=0 with Breslow ties: integral grid
    // inputs, suffix-sum risk sets, ascending-t ordered double fold on
    // both engines
    "q_cox_score" ->
      """WITH du AS (SELECT user_id AS u, ts::DATE AS d FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |us AS (SELECT u, date_diff('day', min(d), max(d))::BIGINT AS t,
        |    count(*)::BIGINT AS x FROM du GROUP BY u),
        |g AS (SELECT t, count(*)::BIGINT AS dt, sum(x)::BIGINT AS sx,
        |    sum(x * x)::BIGINT AS sxx FROM us GROUP BY t),
        |s AS (SELECT t, dt, sx,
        |    sum(dt) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
        |      UNBOUNDED FOLLOWING)::BIGINT AS nr,
        |    sum(sx) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
        |      UNBOUNDED FOLLOWING)::BIGINT AS rx,
        |    sum(sxx) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW AND
        |      UNBOUNDED FOLLOWING)::BIGINT AS rxx
        |  FROM g),
        |c AS (SELECT t,
        |    sx::DOUBLE - dt::DOUBLE * (rx::DOUBLE / nr::DOUBLE) AS ut,
        |    dt::DOUBLE * (rxx::DOUBLE / nr::DOUBLE
        |      - (rx::DOUBLE / nr::DOUBLE) * (rx::DOUBLE / nr::DOUBLE)) AS it
        |  FROM s),
        |f AS (SELECT list_aggregate(list(ut ORDER BY t), 'sum') AS u,
        |    list_aggregate(list(it ORDER BY t), 'sum') AS i,
        |    (SELECT sum(dt) FROM g)::BIGINT AS n_users,
        |    (SELECT count(*) FROM g)::BIGINT AS n_times FROM c)
        |SELECT n_users, n_times, round(u, 6) + 0 AS u_score,
        |  round(i, 6) + 0 AS info, round(u / i, 6) + 0 AS beta_1,
        |  round(u / sqrt(i), 6) + 0 AS z_score
        |FROM f""".stripMargin.trim,

    // PCA of the 2-D covariance: quantized-integer moments (the
    // covMoments discipline), closed-form 2x2 eigensystem, unit
    // eigenvectors with the largest-|weight|-positive sign convention
    "q_pca" ->
      """WITH q AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q1,
        |    CAST(round(l_extendedprice) AS BIGINT) AS q2 FROM lineitem),
        |m AS (SELECT count(*)::HUGEINT AS n, sum(q1)::HUGEINT AS s1,
        |    sum(q2)::HUGEINT AS s2, sum(q1::HUGEINT * q1) AS p11,
        |    sum(q1::HUGEINT * q2) AS p12, sum(q2::HUGEINT * q2) AS p22
        |  FROM q),
        |c AS (SELECT
        |    (n * p11 - s1 * s1)::DOUBLE / (n::DOUBLE * n::DOUBLE) AS a,
        |    (n * p12 - s1 * s2)::DOUBLE / (n::DOUBLE * n::DOUBLE) AS b,
        |    (n * p22 - s2 * s2)::DOUBLE / (n::DOUBLE * n::DOUBLE) AS cc
        |  FROM m),
        |e AS (SELECT a, b,
        |    ((a + cc) + sqrt((a - cc) * (a - cc) + 4 * b * b)) / 2 AS l1,
        |    ((a + cc) - sqrt((a - cc) * (a - cc) + 4 * b * b)) / 2 AS l2
        |  FROM c),
        |v AS (SELECT 0 AS comp, l1 AS eig, b AS vx, l1 - a AS vy FROM e
        |      UNION ALL SELECT 1, l2, b, l2 - a FROM e),
        |u AS (SELECT comp, eig, vx / sqrt(vx * vx + vy * vy) AS u1,
        |    vy / sqrt(vx * vx + vy * vy) AS u2 FROM v),
        |s AS (SELECT comp, eig,
        |    CASE WHEN (CASE WHEN abs(u1) >= abs(u2) THEN u1 ELSE u2 END) < 0
        |         THEN -u1 ELSE u1 END AS w_qty,
        |    CASE WHEN (CASE WHEN abs(u1) >= abs(u2) THEN u1 ELSE u2 END) < 0
        |         THEN -u2 ELSE u2 END AS w_price
        |  FROM u)
        |SELECT comp, round(ln(eig), 6) AS ln_eig,
        |  round(w_qty, 6) + 0.0 AS w_qty,
        |  round(w_price, 6) + 0.0 AS w_price
        |FROM s ORDER BY comp""".stripMargin.trim,

    // Fleiss' kappa: all sums integral (agreement numerator, category
    // totals squared); only the final kappa arithmetic is IEEE, on
    // exact-integer operands - engine-deterministic
    "q_fleiss_kappa" ->
      """WITH cells AS (SELECT l_orderkey AS i, l_returnflag AS c,
        |    count(*)::BIGINT AS n FROM lineitem GROUP BY 1, 2),
        |sizes AS (SELECT i, sum(n)::BIGINT AS tot FROM cells GROUP BY i),
        |kept AS (SELECT cells.i, cells.c, cells.n
        |  FROM cells JOIN sizes USING (i) WHERE sizes.tot = 4),
        |a AS (SELECT sum(n * (n - 1))::BIGINT AS s_agree,
        |    count(DISTINCT i)::BIGINT AS n_items FROM kept),
        |c2 AS (SELECT sum(cn * cn)::BIGINT AS s FROM
        |  (SELECT sum(n)::BIGINT AS cn FROM kept GROUP BY c)),
        |d AS (SELECT count(*)::BIGINT AS nd FROM sizes WHERE tot <> 4),
        |f AS (SELECT a.n_items, d.nd,
        |    a.s_agree::DOUBLE / (a.n_items::DOUBLE * 4 * 3) AS p_bar,
        |    c2.s::DOUBLE / ((a.n_items * 4)::DOUBLE * (a.n_items * 4)::DOUBLE) AS p_e
        |  FROM a, c2, d)
        |SELECT n_items, 4 AS n_raters, nd AS n_dropped_items,
        |  round(p_bar, 6) + 0 AS p_bar, round(p_e, 6) + 0 AS p_e,
        |  round((p_bar - p_e) / (1 - p_e), 6) + 0 AS kappa
        |FROM f""".stripMargin.trim)
}
