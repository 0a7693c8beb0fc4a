package graft
package oracles

/** DuckDB oracle SQL — text analysis, BPE, phrase/passage search.
  *
  * Split from SparkEntry.oracleSql (round 12): entry text is verbatim;
  * SparkEntry remains the single-source registry and concatenates the
  * family maps. RegistrationGateSpec enforces key-set equality with
  * `queries`, and the split was verified by a byte-identical
  * oracle_sql.json dump before/after. */
private[graft] object OracleText {
  import graft.SparkEntryOracleUtil._

  /** Shared BPE-recurrence CTE prefix (q116/q117): the bounded
    * word-count cut, then one recursive round per merge — the
    * working-table aggregate picks the argmax pair, the fold applies
    * it. Mirrors Bpe.learnLocal exactly (tie-break (count desc, l, r);
    * stop at NMerges or when no pair remains). */
  private val BpeStateCte: String =
    s"""WITH RECURSIVE wc AS (
       |  SELECT word, count(*)::BIGINT c FROM
       |    (SELECT unnest(regexp_split_to_array(text, ' ')) word FROM documents)
       |  GROUP BY word ORDER BY c DESC, word LIMIT ${Bpe.MaxWords}),
       |state(round, word, syms, c) AS (
       |  SELECT 0, word, regexp_split_to_array(word, ''), c FROM wc
       |  UNION ALL
       |  SELECT round + 1, word,
       |    list_reduce(list_transform(syms, s -> [s]),
       |      (acc, x) -> CASE WHEN acc[-1] = b.l AND x[1] = b.r
       |                  THEN list_append(list_slice(acc, 1, len(acc)-1), b.l || b.r)
       |                  ELSE list_concat(acc, x) END),
       |    c
       |  FROM state, (SELECT syms[i] l, syms[i+1] r, sum(c) pc
       |               FROM state, unnest(generate_series(1, len(syms)-1)) t(i)
       |               GROUP BY 1, 2
       |               ORDER BY pc DESC, l, r LIMIT 1) b
       |  WHERE round < ${Bpe.NMerges}
       |),""".stripMargin

  /** Shared q172 mutual-NN CTE chain (2-round integer Lloyd cells ->
    * within-cell exact cosine top-1 -> reciprocity): `q` through `n1`.
    * Shared by q172 and q336 so the two oracles can never drift. */

  private val NbClassifySql: String =
    """WITH tok AS (SELECT doc_id, lang,
      |             unnest(regexp_split_to_array(text, ' ')) AS w FROM documents),
      |tr AS (SELECT * FROM tok WHERE doc_id % 5 != 0),
      |cnt AS (SELECT lang AS l, w, count(*)::BIGINT c FROM tr GROUP BY 1, 2),
      |tot AS (SELECT lang AS l, count(*)::BIGINT tot FROM tr GROUP BY 1),
      |voc AS (SELECT count(DISTINCT w)::BIGINT v FROM tr),
      |den AS (SELECT l, (tot + v)::BIGINT AS den FROM tot, voc),
      |te AS (SELECT doc_id, lang, w, count(*)::BIGINT m FROM tok
      |       WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
      |sc AS (SELECT te.doc_id, te.lang, den.l,
      |       sum(te.m * ((1000000000000 * (coalesce(cnt.c, 0) + 1)) // den.den))::BIGINT AS score
      |       FROM te CROSS JOIN den LEFT JOIN cnt ON cnt.l = den.l AND cnt.w = te.w
      |       GROUP BY 1, 2, 3),
      |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, l)::BIGINT AS rn FROM sc)
      |SELECT doc_id, lang, l AS pred, score AS pred_score,
      |  (CASE WHEN l = lang THEN 1 ELSE 0 END)::BIGINT AS correct
      |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** DuckDB twin of TextOps.polyHash over a SQL string expression. */

  private def maxPassageSql(psize: Int): String = {
    val stride = psize / 2
    s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |      FROM documents),
        |ds AS (SELECT count(*)::BIGINT n_docs,
        |  count(*) FILTER (len(list_filter(tk, x -> x = 'hash')) > 0)::BIGINT df_hash,
        |  count(*) FILTER (len(list_filter(tk, x -> x = 'join')) > 0)::BIGINT df_join,
        |  count(*) FILTER (len(list_filter(tk, x -> x = 'vector')) > 0)::BIGINT df_vector
        |  FROM t),
        |ti AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) i FROM t),
        |tw AS (SELECT doc_id, (i - 1) // $stride AS w, tk[i] AS tok FROM ti
        |       UNION ALL
        |       SELECT doc_id, (i - 1) // $stride - 1, tk[i] FROM ti
        |       WHERE (i - 1) // $stride - 1 >= 0),
        |pg AS (SELECT doc_id, w, count(*)::BIGINT pl,
        |  sum(CASE WHEN tok = 'hash' THEN 1 ELSE 0 END)::BIGINT tf_hash,
        |  sum(CASE WHEN tok = 'join' THEN 1 ELSE 0 END)::BIGINT tf_join,
        |  sum(CASE WHEN tok = 'vector' THEN 1 ELSE 0 END)::BIGINT tf_vector
        |  FROM tw GROUP BY 1, 2),
        |ps AS (SELECT count(*)::BIGINT n_pass, sum(pl)::BIGINT pass_tokens FROM pg),
        |c AS (SELECT pg.*, ds.*,
        |  250 + (750000 * pl) // ((1000 * pass_tokens) // n_pass) AS norm_milli
        |  FROM pg CROSS JOIN ps CROSS JOIN ds),
        |sc AS (SELECT doc_id, w, pl,
        |  ((((1000 * (2 * (n_docs - df_hash) + 1)) // (2 * df_hash + 1)) *
        |    ((tf_hash * 2200000000) //
        |     (tf_hash * 1000 + (1200 * norm_milli) // 1000))) // 1000
        |  + (((1000 * (2 * (n_docs - df_join) + 1)) // (2 * df_join + 1)) *
        |    ((tf_join * 2200000000) //
        |     (tf_join * 1000 + (1200 * norm_milli) // 1000))) // 1000
        |  + (((1000 * (2 * (n_docs - df_vector) + 1)) // (2 * df_vector + 1)) *
        |    ((tf_vector * 2200000000) //
        |     (tf_vector * 1000 + (1200 * norm_milli) // 1000))) // 1000)::BIGINT
        |  AS score_micro FROM c),
        |hits AS MATERIALIZED (SELECT * FROM sc WHERE score_micro > 0),
        |nh AS (SELECT doc_id, count(*)::BIGINT n_hit_passages FROM hits GROUP BY 1),
        |arg AS (SELECT doc_id, w, pl, score_micro FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_micro DESC, w) rn FROM hits) WHERE rn = 1)
        |SELECT a.doc_id, nh.n_hit_passages, a.w AS best_window,
        |       a.pl AS best_pl, a.score_micro
        |FROM arg a JOIN nh ON nh.doc_id = a.doc_id
        |ORDER BY a.score_micro DESC, a.doc_id LIMIT 10""".stripMargin
  }
  val sql: Map[String, String] = Map(
    "q57_corpus_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') tk FROM documents),
        |m AS (SELECT doc_id, len(tk)::BIGINT n_tok, len(list_distinct(tk)) n_uniq FROM t)
        |SELECT doc_id, n_tok,
        |  CASE WHEN n_tok < 20 THEN 'too_short'
        |       WHEN n_tok > 90 THEN 'too_long'
        |       WHEN n_uniq / n_tok < 0.45 THEN 'repetitive'
        |       ELSE 'keep' END AS verdict
        |FROM m ORDER BY doc_id""".stripMargin,
    "q128_collocations" ->
      """WITH t AS (SELECT regexp_split_to_array(text, ' ') AS tk FROM documents),
        |bi AS (SELECT tk[i] AS w1, tk[i + 1] AS w2
        |       FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i FROM t)),
        |uni AS (SELECT unnest(tk) AS w FROM t),
        |uc AS (SELECT w, count(*)::BIGINT AS cw FROM uni GROUP BY 1),
        |bc AS (SELECT w1, w2, count(*)::BIGINT AS n_pair FROM bi GROUP BY 1, 2
        |       HAVING count(*) >= 5),
        |st AS (SELECT (SELECT count(*) FROM uni)::BIGINT AS n_uni,
        |              (SELECT count(*) FROM bi)::BIGINT AS n_bi)
        |SELECT bc.w1, bc.w2, bc.n_pair, u1.cw AS n_w1, u2.cw AS n_w2,
        |       ((1000::HUGEINT * bc.n_pair * st.n_uni * st.n_uni)
        |         // (st.n_bi::HUGEINT * u1.cw * u2.cw))::BIGINT AS lift_milli
        |FROM bc JOIN uc u1 ON u1.w = bc.w1 JOIN uc u2 ON u2.w = bc.w2, st
        |ORDER BY lift_milli DESC, w1, w2 LIMIT 50""".stripMargin,
    "q119_winnow_overlap" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT doc_id, i::BIGINT - 1 AS pos,
         |       ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |win AS (SELECT a.doc_id, a.pos AS p, b.pos AS q, b.h AS h
         |        FROM sh a JOIN sh b ON b.doc_id = a.doc_id
         |          AND b.pos BETWEEN a.pos - 3 AND a.pos
         |        WHERE a.pos >= 3),
         |m AS (SELECT doc_id, p, min(h) AS wmin FROM win GROUP BY 1, 2),
         |fp AS (SELECT DISTINCT doc_id, wmin AS h FROM m),
         |sz AS (SELECT doc_id, count(*)::BIGINT AS nfp FROM fp GROUP BY 1),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared
         |       FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b, shared, sa.nfp AS nfp_a, sb.nfp AS nfp_b,
         |       ((1000 * shared) // least(sa.nfp, sb.nfp))::BIGINT AS overlap_permille
         |FROM pr JOIN sz sa ON sa.doc_id = pr.doc_a
         |        JOIN sz sb ON sb.doc_id = pr.doc_b
         |WHERE shared >= 3 ORDER BY doc_a, doc_b""".stripMargin,
    // q116/q117: the greedy BPE merge recurrence replayed as a DuckDB
    // recursive CTE. `state` carries the full (bounded, top-MaxWords)
    // word table's symbolization per round; the recursive term picks
    // the (count desc, pair asc) argmax pair by aggregating over the
    // working table and applies it via a left fold (just-merged tokens
    // can never re-match as lhs since lhs||rhs != lhs, so the fold ≡
    // the left-to-right non-overlapping scan in Bpe.applyMerge).
    "q116_bpe_vocab" ->
      s"""$BpeStateCte
         |pairs AS (SELECT round, syms[i] l, syms[i+1] r, sum(c)::BIGINT pc
         |          FROM state, unnest(generate_series(1, len(syms)-1)) t(i)
         |          GROUP BY 1, 2, 3),
         |best AS (SELECT round, l, r, pc,
         |         row_number() OVER (PARTITION BY round ORDER BY pc DESC, l, r) rn
         |         FROM pairs)
         |SELECT round::BIGINT rank, l AS lhs, r AS rhs, l || r AS merged, pc AS pair_count
         |FROM best WHERE rn = 1 AND round < ${Bpe.NMerges} ORDER BY rank""".stripMargin,
    // final-round state IS each vocab word's encoding (learn and encode
    // apply the same merges in the same order); the corpus joins the
    // word -> piece-count relation exactly as Bpe.bpeEncode does. Holds
    // while the corpus vocabulary fits the top-MaxWords cut (it does at
    // every test SF by orders of magnitude).
    "q117_bpe_encode" ->
      s"""$BpeStateCte
         |enc AS (SELECT word, len(syms)::BIGINT n_pieces FROM state
         |        WHERE round = (SELECT max(round) FROM state)),
         |w AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) word FROM documents),
         |agg AS (SELECT doc_id, count(*)::BIGINT n_words, sum(n_pieces)::BIGINT n_bpe,
         |               sum(length(word))::BIGINT n_chars
         |        FROM w JOIN enc USING (word) GROUP BY doc_id)
         |SELECT doc_id, n_words, n_bpe, n_chars,
         |       ((n_bpe * 1000) // n_words)::BIGINT AS pieces_per_word_milli,
         |       ((n_chars * 1000) // n_bpe)::BIGINT AS chars_per_piece_milli
         |FROM agg ORDER BY doc_id""".stripMargin,
    "q118_winnow_fingerprints" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
         |sh AS (SELECT doc_id, i::BIGINT - 1 AS pos,
         |       ${H("array_to_string(tk[i:i+2], ' ')")} AS h
         |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i FROM t)),
         |win AS (SELECT a.doc_id, a.pos AS p, b.pos AS q, b.h AS h
         |        FROM sh a JOIN sh b ON b.doc_id = a.doc_id
         |          AND b.pos BETWEEN a.pos - 3 AND a.pos
         |        WHERE a.pos >= 3),
         |m AS (SELECT doc_id, p, min(h) AS wmin FROM win GROUP BY 1, 2),
         |sel AS (SELECT w.doc_id, w.p, m.wmin AS h, max(w.q) AS pos
         |        FROM win w JOIN m ON m.doc_id = w.doc_id AND m.p = w.p
         |          AND w.h = m.wmin
         |        GROUP BY 1, 2, 3)
         |SELECT DISTINCT doc_id, pos, h FROM sel
         |ORDER BY doc_id, pos""".stripMargin,
    "q114_bm25_search" ->
      """WITH p AS (SELECT doc_id, len(tk)::BIGINT AS dl,
        |  len(list_filter(tk, x -> x = 'hash'))::BIGINT AS tf_hash,
        |  len(list_filter(tk, x -> x = 'join'))::BIGINT AS tf_join,
        |  len(list_filter(tk, x -> x = 'vector'))::BIGINT AS tf_vector
        |  FROM (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents)),
        |s AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS n_tokens,
        |  count(*) FILTER (tf_hash > 0)::BIGINT AS df_hash,
        |  count(*) FILTER (tf_join > 0)::BIGINT AS df_join,
        |  count(*) FILTER (tf_vector > 0)::BIGINT AS df_vector FROM p),
        |c AS (SELECT p.*, s.*,
        |  250 + (750000 * dl) // ((1000 * n_tokens) // n_docs) AS norm_milli
        |  FROM p CROSS JOIN s),
        |sc AS (SELECT doc_id, dl, tf_hash, tf_join, tf_vector,
        |  ((((1000 * (2 * (n_docs - df_hash) + 1)) // (2 * df_hash + 1)) *
        |    ((tf_hash * 2200000000) //
        |     (tf_hash * 1000 + (1200 * norm_milli) // 1000))) // 1000
        |  + (((1000 * (2 * (n_docs - df_join) + 1)) // (2 * df_join + 1)) *
        |    ((tf_join * 2200000000) //
        |     (tf_join * 1000 + (1200 * norm_milli) // 1000))) // 1000
        |  + (((1000 * (2 * (n_docs - df_vector) + 1)) // (2 * df_vector + 1)) *
        |    ((tf_vector * 2200000000) //
        |     (tf_vector * 1000 + (1200 * norm_milli) // 1000))) // 1000)::BIGINT
        |  AS score_micro FROM c)
        |SELECT * FROM sc WHERE score_micro > 0
        |ORDER BY score_micro DESC, doc_id LIMIT 10""".stripMargin,
    "q108_bigram_fluency" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
        |bi AS (SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS bg, tk[i] AS w1
        |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) i FROM t)),
        |c2 AS (SELECT bg, count(*) AS c2 FROM bi GROUP BY bg),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       (sum(c2.c2 * 1000000 // c1.c1) // count(*))::BIGINT AS fluency_micro
        |FROM bi JOIN c2 USING (bg) JOIN c1 USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q61_repetition" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
        |f AS (SELECT doc_id, tk,
        |      CASE WHEN len(tk) >= 5 THEN
        |        list_transform(range(1, len(tk) - 3), i -> array_to_string(tk[i:i+4], ' '))
        |      ELSE []::VARCHAR[] END g FROM t),
        |w AS (SELECT doc_id, len(g)::BIGINT n_5grams,
        |      len(list_distinct(g))::BIGINT n_uniq_5grams, unnest(tk) word FROM f),
        |wc AS (SELECT doc_id, n_5grams, n_uniq_5grams, word, count(*)::BIGINT c
        |       FROM w GROUP BY 1, 2, 3, 4),
        |ds AS (SELECT doc_id, n_5grams, n_uniq_5grams, sum(c)::BIGINT n_words,
        |       count(*)::BIGINT n_uniq_words FROM wc GROUP BY 1, 2, 3),
        |top AS (SELECT doc_id, word, c,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, word) rn FROM wc)
        |SELECT ds.doc_id, n_words, n_uniq_words,
        |       ((n_words - n_uniq_words) * 1000 // n_words)::BIGINT AS dup_word_permille,
        |       top.word AS top_word, top.c AS top_count, n_5grams, n_uniq_5grams,
        |       CASE WHEN n_5grams > 0
        |            THEN (n_5grams - n_uniq_5grams) * 1000 // n_5grams
        |            ELSE 0 END::BIGINT AS dup_5gram_permille
        |FROM ds JOIN top ON top.doc_id = ds.doc_id AND top.rn = 1
        |ORDER BY ds.doc_id""".stripMargin,
    "q62_tfidf_terms" ->
      """WITH w AS (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) word FROM documents),
        |tf AS (SELECT doc_id, word, count(*)::BIGINT tf FROM w GROUP BY 1, 2),
        |df AS (SELECT word, count(*)::BIGINT df FROM tf GROUP BY 1),
        |n AS (SELECT count(*)::BIGINT n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |      tf.tf * ((1000 * n.n_docs) // df.df) AS score
        |      FROM tf JOIN df USING (word) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, word) rank FROM s)
        |SELECT doc_id, rank::BIGINT AS rank, word, tf, df, score::BIGINT AS score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q53_term_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') tk FROM documents),
        |s AS (SELECT doc_id,
        |        len(list_filter(tk, x -> x = 'hash'))::BIGINT tf_hash,
        |        len(list_filter(tk, x -> x = 'join'))::BIGINT tf_join,
        |        len(list_filter(tk, x -> x = 'vector'))::BIGINT tf_vector
        |      FROM t)
        |SELECT doc_id, tf_hash, tf_join, tf_vector,
        |       (tf_hash * 3 + tf_join * 2 + tf_vector)::BIGINT AS score
        |FROM s WHERE tf_hash * 3 + tf_join * 2 + tf_vector > 0
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "q28_text_langid" ->
      """WITH t AS (SELECT doc_id, lang, regexp_split_to_array(text, ' ') tk FROM documents),
        |s AS (SELECT doc_id, lang,
        |  len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT s_en,
        |  len(list_filter(tk, x -> x IN ('der','die','das','und','ist','zu','ein')))::BIGINT s_de,
        |  len(list_filter(tk, x -> x IN ('el','la','de','y','es','un','en')))::BIGINT s_es
        |  FROM t)
        |SELECT doc_id, lang, s_en, s_de, s_es,
        |  CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
        |       WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS pred
        |FROM s ORDER BY doc_id""".stripMargin,
    "q29_text_quality" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk FROM documents),
        |s AS (SELECT doc_id, len(tk)::BIGINT n_tok, len(list_distinct(tk))::BIGINT n_uniq,
        |      len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT n_stop
        |      FROM t)
        |SELECT doc_id, n_tok,
        |  round(n_uniq / n_tok, 6) AS uniq_ratio,
        |  round(n_stop / n_tok, 6) AS stop_ratio,
        |  round((n_uniq / n_tok) * 0.5 + (n_stop / n_tok) * 0.2
        |        + least(n_tok, 200) / 200.0 * 0.3, 6) AS quality
        |FROM s ORDER BY doc_id""".stripMargin,
    "q30_text_token_stats" ->
      """SELECT doc_id, len(tk)::BIGINT AS n_tok, len(list_distinct(tk))::BIGINT AS n_uniq,
        |  length(text)::BIGINT AS n_chars_m,
        |  list_aggregate(list_transform(tk, x -> length(x)), 'max')::BIGINT AS max_tok_len
        |FROM (SELECT doc_id, text, regexp_split_to_array(text, ' ') tk FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q31_text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, text, regexp_split_to_array(text, ' ') tk FROM documents)
         |SELECT doc_id, ${H("text")} AS fp,
         |  list_aggregate(list_transform(generate_series(1, len(tk) - 7),
         |    i -> ${H("array_to_string(tk[i:i+7], ' ')")}), 'min')::BIGINT AS fp_win
         |FROM t ORDER BY doc_id""".stripMargin,
    "q47_text_subwords" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z]+'))::BIGINT AS n_alpha,
        |  len(regexp_extract_all(text, '[0-9]+'))::BIGINT AS n_digit,
        |  len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))::BIGINT AS n_punct,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))::BIGINT AS n_units
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q80_fuzzy_pairs" ->
      """WITH t AS (SELECT doc_id, lang, substring(text, 1, 30) head30,
        |           regexp_split_to_array(text, ' ')[1] tok0,
        |           (len(regexp_split_to_array(text, ' ')) // 10)::BIGINT len_band
        |           FROM documents)
        |SELECT a.doc_id doc_a, b.doc_id doc_b,
        |  levenshtein(a.head30, b.head30)::BIGINT AS edit_dist
        |FROM t a JOIN t b ON a.lang = b.lang AND a.tok0 = b.tok0
        |     AND a.len_band = b.len_band AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.head30, b.head30) <= 20
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q81_array_ops" ->
      """WITH t AS (SELECT doc_id,
        |           list_distinct(regexp_split_to_array(text, ' ')) tk
        |           FROM documents)
        |SELECT doc_id, len(tk)::BIGINT AS n_uniq,
        |  array_to_string(list_sort(tk)[1:3], '|') AS head3_sorted,
        |  len(list_intersect(tk, ['the','a','of','and','is','to','in']))::BIGINT
        |    AS n_stop_uniq,
        |  len(list_distinct(list_concat(tk,
        |    ['the','a','of','and','is','to','in'])))::BIGINT AS n_union_stop,
        |  len(list_intersect(tk, ['the','a','of','and','is','to','in'])) > 0
        |    AS has_stop,
        |  list_sort(tk)[-1] AS max_token
        |FROM t ORDER BY doc_id""".stripMargin,
    "q82_word_map" ->
      """SELECT doc_id, word, count(*) AS n
        |FROM (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) word
        |      FROM documents WHERE doc_id < 50)
        |GROUP BY doc_id, word
        |ORDER BY doc_id, word""".stripMargin,
    "q88_pii_redact" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' contact: user' || doc_id || '@example.com or 555-' ||
        |  lpad((doc_id % 10000)::VARCHAR, 4, '0') AS raw FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(raw, '555-[0-9]{4}'))::BIGINT AS n_phones,
        |  right(regexp_replace(regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g'), 40) AS tail40
        |FROM t ORDER BY doc_id""".stripMargin,
    "q99_repeated_tokens" ->
      """WITH w AS (SELECT doc_id, len(regexp_split_to_array(text, ' '))::BIGINT n_tok,
        |           unnest(regexp_split_to_array(text, ' ')) word
        |           FROM documents WHERE doc_id < 100),
        |c AS (SELECT doc_id, n_tok, word, count(*)::BIGINT c
        |      FROM w GROUP BY doc_id, n_tok, word HAVING count(*) >= 2)
        |SELECT doc_id, word, c AS n, (c * 1000 // n_tok)::BIGINT AS permille
        |FROM c ORDER BY doc_id, word""".stripMargin,
    // q148: fixed-point NB likelihoods term-for-term; argmax ties →
    // lang asc (the window ORDER BY mirrors min(struct(-score, l))).
    "q148_nb_lang_classify" -> NbClassifySql,
    // q159: same integer bucket rule; first-seen = min bucket per
    // (lang, token); cumulative over the ≤20-row per-lang curve.
    "q159_vocab_growth" ->
      """WITH m AS (SELECT max(doc_id) AS mx FROM documents),
        |occ AS (SELECT lang,
        |        least(19, (doc_id * 20) // (mx + 1))::BIGINT AS bucket,
        |        unnest(regexp_split_to_array(text, ' ')) AS tok
        |        FROM documents, m),
        |g AS (SELECT lang, bucket, tok, count(*)::BIGINT AS n
        |      FROM occ GROUP BY 1, 2, 3),
        |vol AS (SELECT lang, bucket, sum(n)::BIGINT AS bucket_tokens
        |        FROM g GROUP BY 1, 2),
        |fresh AS (SELECT lang, bucket, count(*)::BIGINT AS new_types FROM (
        |            SELECT lang, tok, min(bucket) AS bucket FROM g GROUP BY 1, 2)
        |          GROUP BY 1, 2)
        |SELECT v.lang, v.bucket,
        |  coalesce(f.new_types, 0)::BIGINT AS new_types, v.bucket_tokens,
        |  sum(coalesce(f.new_types, 0)) OVER
        |    (PARTITION BY v.lang ORDER BY v.bucket)::BIGINT AS cum_types,
        |  sum(v.bucket_tokens) OVER
        |    (PARTITION BY v.lang ORDER BY v.bucket)::BIGINT AS cum_tokens
        |FROM vol v LEFT JOIN fresh f ON f.lang = v.lang AND f.bucket = v.bucket
        |ORDER BY v.lang, v.bucket""".stripMargin,
    // q169: exact rational concentration indices over per-doc token
    // counts; floors via // match `div`.
    "q169_token_concentration" ->
      """WITH t AS (SELECT doc_id,
        |      unnest(regexp_split_to_array(text, ' ')) AS w FROM documents),
        |c AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM t GROUP BY 1, 2),
        |a AS (SELECT doc_id, sum(c) AS n_tok, count(*) AS n_distinct,
        |      sum(c * c) AS sumsq, max(c) AS top_c FROM c GROUP BY 1)
        |SELECT doc_id, n_tok::BIGINT AS n_tok,
        |  n_distinct::BIGINT AS n_distinct,
        |  ((1000000 * sumsq) // (n_tok * n_tok))::BIGINT AS hhi_ppm,
        |  ((1000 * top_c) // n_tok)::BIGINT AS top_share_pm,
        |  ((1000 * n_distinct) // n_tok)::BIGINT AS ttr_pm
        |FROM a ORDER BY doc_id""".stripMargin,
    // q170: floor(log2 c) exactly as length(bin(c)) - 1 on both
    // engines — no floating log at power-of-two boundaries.
    "q170_freq_spectrum" ->
      """WITH t AS (SELECT unnest(regexp_split_to_array(text, ' ')) AS w
        |           FROM documents),
        |c AS (SELECT w, count(*)::BIGINT AS c FROM t GROUP BY 1),
        |b AS (SELECT w, c, (length(bin(c)) - 1)::BIGINT AS bucket FROM c)
        |SELECT bucket, count(*)::BIGINT AS n_types,
        |  sum(c)::BIGINT AS n_occurrences,
        |  min(w) AS first_type
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    // q177: one unnest + one rollup; ceil(len/4) granules as
    // (len+3)//4; byte totals summed per doc (octet_length).
    "q177_tokenizer_fertility" ->
      """WITH t AS (SELECT lang, source, strlen(text)::BIGINT AS db,
        |      generate_subscripts(regexp_split_to_array(text, ' '), 1) AS p,
        |      unnest(regexp_split_to_array(text, ' ')) AS w
        |      FROM documents),
        |a AS (SELECT lang, source,
        |      sum(CASE WHEN p = 1 THEN 1 ELSE 0 END)::BIGINT AS n_docs,
        |      count(*)::BIGINT AS n_words,
        |      sum((strlen(w) + 3) // 4)::BIGINT AS n_granules,
        |      sum(CASE WHEN p = 1 THEN db ELSE 0 END)::BIGINT AS n_bytes
        |      FROM t GROUP BY 1, 2)
        |SELECT lang, source, n_docs, n_words, n_granules, n_bytes,
        |  ((1000 * n_granules) // n_words)::BIGINT AS fertility_milli,
        |  ((1000 * n_words) // greatest(n_bytes, 1))::BIGINT AS words_per_kb,
        |  ((1000 * n_bytes) // n_words)::BIGINT AS bytes_per_word_milli
        |FROM a ORDER BY lang, source""".stripMargin,
    // q187: replay the positional-postings phrase search — postings as
    // a (term, doc_id, pos) CTE, each phrase as a chain of
    // (doc_id, pos+offset) self-joins, best doc via (count desc, id
    // asc) LIMIT 1 subqueries so empty phrases degrade to NULLs the
    // same way Spark's min(struct) does.
    "q187_phrase_search" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |           FROM documents),
        |post AS (SELECT doc_id, i - 1 AS pos, tk[i] AS term
        |         FROM (SELECT doc_id, tk,
        |               unnest(generate_series(1, len(tk))) i FROM t)),
        |s1 AS (SELECT a.doc_id FROM post a
        |       JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |       WHERE a.term = 'hash' AND b.term = 'join'),
        |p1 AS (SELECT doc_id, count(*)::BIGINT c FROM s1 GROUP BY 1),
        |b1 AS (SELECT doc_id, c FROM p1 ORDER BY c DESC, doc_id LIMIT 1),
        |s2 AS (SELECT a.doc_id FROM post a
        |       JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |       WHERE a.term = 'merge' AND b.term = 'sort'),
        |p2 AS (SELECT doc_id, count(*)::BIGINT c FROM s2 GROUP BY 1),
        |b2 AS (SELECT doc_id, c FROM p2 ORDER BY c DESC, doc_id LIMIT 1),
        |s3 AS (SELECT a.doc_id FROM post a
        |       JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |       JOIN post d ON d.doc_id = a.doc_id AND d.pos = a.pos + 2
        |       WHERE a.term = 'slow' AND b.term = 'hash' AND d.term = 'batch'),
        |p3 AS (SELECT doc_id, count(*)::BIGINT c FROM s3 GROUP BY 1),
        |b3 AS (SELECT doc_id, c FROM p3 ORDER BY c DESC, doc_id LIMIT 1)
        |SELECT * FROM (
        |  SELECT 'hash join' AS phrase,
        |    (SELECT count(*) FROM p1)::BIGINT AS n_docs,
        |    (SELECT coalesce(sum(c), 0) FROM p1)::BIGINT AS n_matches,
        |    (SELECT doc_id FROM b1) AS best_doc,
        |    (SELECT c FROM b1)::BIGINT AS best_matches
        |  UNION ALL
        |  SELECT 'merge sort',
        |    (SELECT count(*) FROM p2)::BIGINT,
        |    (SELECT coalesce(sum(c), 0) FROM p2)::BIGINT,
        |    (SELECT doc_id FROM b2), (SELECT c FROM b2)::BIGINT
        |  UNION ALL
        |  SELECT 'slow hash batch',
        |    (SELECT count(*) FROM p3)::BIGINT,
        |    (SELECT coalesce(sum(c), 0) FROM p3)::BIGINT,
        |    (SELECT doc_id FROM b3), (SELECT c FROM b3)::BIGINT
        |) ORDER BY phrase""".stripMargin,
    // q190: per probe pair, postings rows within |Δpos| <= w — the
    // window membership itself, independent of Spark's rarest-side
    // fan-out rewrite.
    "q190_proximity_search" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |           FROM documents),
        |post AS (SELECT doc_id, i - 1 AS pos, tk[i] AS term
        |         FROM (SELECT doc_id, tk,
        |               unnest(generate_series(1, len(tk))) i FROM t)),
        |h1 AS (SELECT a.doc_id FROM post a
        |       JOIN post b ON b.doc_id = a.doc_id AND abs(b.pos - a.pos) <= 4
        |       WHERE a.term = 'hash' AND b.term = 'join'),
        |p1 AS (SELECT doc_id, count(*)::BIGINT c FROM h1 GROUP BY 1),
        |b1 AS (SELECT doc_id, c FROM p1 ORDER BY c DESC, doc_id LIMIT 1),
        |h2 AS (SELECT a.doc_id FROM post a
        |       JOIN post b ON b.doc_id = a.doc_id AND abs(b.pos - a.pos) <= 4
        |       WHERE a.term = 'sort' AND b.term = 'merge'),
        |p2 AS (SELECT doc_id, count(*)::BIGINT c FROM h2 GROUP BY 1),
        |b2 AS (SELECT doc_id, c FROM p2 ORDER BY c DESC, doc_id LIMIT 1),
        |h3 AS (SELECT a.doc_id FROM post a
        |       JOIN post b ON b.doc_id = a.doc_id AND abs(b.pos - a.pos) <= 6
        |       WHERE a.term = 'slow' AND b.term = 'batch'),
        |p3 AS (SELECT doc_id, count(*)::BIGINT c FROM h3 GROUP BY 1),
        |b3 AS (SELECT doc_id, c FROM p3 ORDER BY c DESC, doc_id LIMIT 1)
        |SELECT * FROM (
        |  SELECT 'hash NEAR/4 join' AS probe,
        |    (SELECT count(*) FROM p1)::BIGINT AS n_docs,
        |    (SELECT coalesce(sum(c), 0) FROM p1)::BIGINT AS n_pairs,
        |    (SELECT doc_id FROM b1) AS best_doc,
        |    (SELECT c FROM b1)::BIGINT AS best_pairs
        |  UNION ALL
        |  SELECT 'sort NEAR/4 merge',
        |    (SELECT count(*) FROM p2)::BIGINT,
        |    (SELECT coalesce(sum(c), 0) FROM p2)::BIGINT,
        |    (SELECT doc_id FROM b2), (SELECT c FROM b2)::BIGINT
        |  UNION ALL
        |  SELECT 'slow NEAR/6 batch',
        |    (SELECT count(*) FROM p3)::BIGINT,
        |    (SELECT coalesce(sum(c), 0) FROM p3)::BIGINT,
        |    (SELECT doc_id FROM b3), (SELECT c FROM b3)::BIGINT
        |) ORDER BY probe""".stripMargin,
    // q191: forward-window-3 ordered pairs; M = total in-window slots
    // = count of all pairs; lift in HUGEINT exactly as Spark's
    // DECIMAL(38,0).
    "q191_skipgram_cooc" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |           FROM documents),
        |post AS (SELECT doc_id, i - 1 AS pos, tk[i] AS term
        |         FROM (SELECT doc_id, tk,
        |               unnest(generate_series(1, len(tk))) i FROM t)),
        |pr AS (SELECT a.term w1, b.term w2, count(*)::BIGINT c_ab
        |       FROM post a JOIN post b ON b.doc_id = a.doc_id
        |            AND b.pos BETWEEN a.pos + 1 AND a.pos + 3
        |       GROUP BY 1, 2),
        |uc AS (SELECT term, count(*)::BIGINT c FROM post GROUP BY 1),
        |st AS (SELECT (SELECT count(*) FROM post)::BIGINT n,
        |              (SELECT sum(c_ab) FROM pr)::BIGINT m)
        |SELECT pr.w1, pr.w2, pr.c_ab,
        |       ((1000::HUGEINT * pr.c_ab * st.n * st.n)
        |         // (st.m::HUGEINT * u1.c * u2.c))::BIGINT AS lift_milli
        |FROM pr JOIN uc u1 ON u1.term = pr.w1
        |        JOIN uc u2 ON u2.term = pr.w2, st
        |ORDER BY pr.c_ab DESC, pr.w1, pr.w2 LIMIT 40""".stripMargin,
    // q192: tf-idf (idfw = 100000 // df, df in [2, cap]) shingle
    // cosine^2 in exact micro units, HUGEINT mirror of the
    // DECIMAL(38,0) floor arithmetic.
    "q192_sparse_cosine" ->
      s"""WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
         |           FROM documents),
         |sh AS (SELECT doc_id, array_to_string(tk[i:i+2], ' ') g
         |       FROM (SELECT doc_id, tk,
         |             unnest(generate_series(1, len(tk) - 2)) i FROM t)
         |       WHERE len(tk) >= 3),
         |tf AS (SELECT doc_id, g, count(*)::BIGINT tf FROM sh GROUP BY 1, 2),
         |df AS (SELECT g, count(*)::BIGINT df FROM tf GROUP BY 1
         |       HAVING count(*) BETWEEN 2 AND ${TextAnalysis.SparseCosineDfCap}),
         |w AS (SELECT tf.doc_id, tf.g, tf.tf * (100000 // df.df) AS wt
         |      FROM tf JOIN df USING (g)),
         |nrm AS (SELECT doc_id, sum(wt::HUGEINT * wt) n2 FROM w GROUP BY 1),
         |dots AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
         |                sum(a.wt::HUGEINT * b.wt) dt
         |         FROM w a JOIN w b ON a.g = b.g AND a.doc_id < b.doc_id
         |         GROUP BY 1, 2)
         |SELECT d.doc_a, d.doc_b,
         |       ((1000000::HUGEINT * d.dt * d.dt) // (na.n2 * nb.n2))::BIGINT
         |         AS cos2_micro
         |FROM dots d JOIN nrm na ON na.doc_id = d.doc_a
         |            JOIN nrm nb ON nb.doc_id = d.doc_b
         |ORDER BY cos2_micro DESC, d.doc_a, d.doc_b LIMIT 30""".stripMargin,
    // q197: (doc, term) tf roll-up; heaviest doc via min over
    // (-tf, doc_id) exactly like Spark's min(struct).
    "q197_term_burstiness" ->
      """WITH tf AS (SELECT doc_id, w, count(*)::BIGINT tf FROM
        |    (SELECT doc_id, unnest(regexp_split_to_array(text, ' ')) w
        |     FROM documents) GROUP BY 1, 2),
        |agg AS (SELECT w, count(*)::BIGINT df, sum(tf)::BIGINT cf
        |        FROM tf GROUP BY 1),
        |top AS (SELECT w, doc_id, tf FROM
        |    (SELECT w, doc_id, tf, row_number() OVER
        |       (PARTITION BY w ORDER BY tf DESC, doc_id) rn FROM tf)
        |    WHERE rn = 1)
        |SELECT agg.w, agg.df, agg.cf,
        |       (1000 * agg.cf) // agg.df AS burstiness_milli,
        |       top.doc_id AS top_doc,
        |       (1000 * top.tf) // agg.cf AS top_doc_share_pm
        |FROM agg JOIN top USING (w)
        |ORDER BY agg.cf DESC, agg.w""".stripMargin,
    // q209: confusion cells over the SHARED q148 prediction oracle.
    "q209_nb_confusion" ->
      s"""WITH p AS ($NbClassifySql),
         |cells AS (SELECT lang, pred, count(*)::BIGINT n FROM p GROUP BY 1, 2),
         |r AS (SELECT lang lg, sum(n)::BIGINT rt FROM cells GROUP BY 1),
         |c AS (SELECT pred pd, sum(n)::BIGINT ct FROM cells GROUP BY 1)
         |SELECT cells.lang, cells.pred, cells.n,
         |       (1000 * cells.n) // r.rt AS recall_share_pm,
         |       (1000 * cells.n) // c.ct AS precision_share_pm
         |FROM cells JOIN r ON r.lg = cells.lang JOIN c ON c.pd = cells.pred
         |ORDER BY cells.lang, cells.pred""".stripMargin,
    // q213: plain window cumsum where Spark runs the two-pass; chunk
    // ids are integer division on the running offset.
    "q213_context_packing" ->
      """WITH t AS (SELECT doc_id, len(regexp_split_to_array(text, ' '))::BIGINT n
        |           FROM documents),
        |o AS (SELECT doc_id, n,
        |        coalesce(sum(n) OVER (ORDER BY doc_id ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT toff
        |      FROM t)
        |SELECT doc_id, n AS n_tok, toff AS tok_offset,
        |       (toff // 128)::BIGINT AS first_chunk,
        |       ((toff + n - 1) // 128)::BIGINT AS last_chunk,
        |       ((toff + n - 1) // 128 - toff // 128 + 1)::BIGINT AS n_chunks
        |FROM o ORDER BY doc_id""".stripMargin,
    // q214: first-occurrence via per-term min doc, running totals via
    // window cumsum.
    // q214: list-slice fingerprints via the shared polyhash macro;
    // per-source winner via row_number on (count desc, hash).
    "q214_boilerplate_audit" ->
      s"""WITH t AS (SELECT doc_id, source, regexp_split_to_array(text, ' ') tk
         |           FROM documents),
         |b AS (SELECT source,
         |        ${H("array_to_string(tk[1:8], ' ')")} pre,
         |        ${H("array_to_string(tk[-8:], ' ')")} suf
         |      FROM t WHERE len(tk) >= 8),
         |n AS (SELECT source, count(*)::BIGINT n_docs FROM b GROUP BY 1),
         |pt AS (SELECT source, h, c FROM
         |        (SELECT source, pre h, count(*)::BIGINT c,
         |           row_number() OVER (PARTITION BY source
         |             ORDER BY count(*) DESC, pre) rn
         |         FROM b GROUP BY 1, 2) WHERE rn = 1),
         |st AS (SELECT source, h, c FROM
         |        (SELECT source, suf h, count(*)::BIGINT c,
         |           row_number() OVER (PARTITION BY source
         |             ORDER BY count(*) DESC, suf) rn
         |         FROM b GROUP BY 1, 2) WHERE rn = 1)
         |SELECT n.source, n.n_docs,
         |       pt.h AS top_prefix_hash, pt.c AS n_prefix,
         |       ((1000 * pt.c) // n.n_docs)::BIGINT AS prefix_share_pm,
         |       st.h AS top_suffix_hash, st.c AS n_suffix,
         |       ((1000 * st.c) // n.n_docs)::BIGINT AS suffix_share_pm
         |FROM n JOIN pt ON pt.source = n.source
         |     JOIN st ON st.source = n.source
         |ORDER BY n.source""".stripMargin,
    // q215: kappa in HUGEINT with the sign decomposed so // (floor)
    // matches Spark's div (truncation) on non-negative operands.
    "q215_classifier_kappa" ->
      s"""WITH hh AS (SELECT doc_id,
         |  CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
         |       WHEN s_de >= s_es THEN 'de' ELSE 'es' END p1
         |  FROM (SELECT doc_id,
         |    len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in')))::BIGINT s_en,
         |    len(list_filter(tk, x -> x IN ('der','die','das','und','ist','zu','ein')))::BIGINT s_de,
         |    len(list_filter(tk, x -> x IN ('el','la','de','y','es','un','en')))::BIGINT s_es
         |   FROM (SELECT doc_id, regexp_split_to_array(text, ' ') tk
         |         FROM documents))),
         |p AS ($NbClassifySql),
         |j AS (SELECT hh.p1, p.pred p2 FROM hh JOIN p ON p.doc_id = hh.doc_id),
         |ag AS (SELECT count(*)::BIGINT n,
         |         sum(CASE WHEN p1 = p2 THEN 1 ELSE 0 END)::BIGINT a FROM j),
         |r AS (SELECT p1 lab, count(*)::BIGINT r FROM j GROUP BY 1),
         |c AS (SELECT p2 lab, count(*)::BIGINT c FROM j GROUP BY 1),
         |sv AS (SELECT coalesce(sum(r.r::HUGEINT * c.c), 0) s
         |       FROM r JOIN c ON c.lab = r.lab)
         |SELECT ag.n AS n_docs, ag.a AS n_agree, sv.s::BIGINT AS s_chance,
         |       (CASE WHEN ag.n::HUGEINT * ag.n - sv.s = 0 THEN NULL
         |         WHEN ag.a::HUGEINT * ag.n - sv.s < 0
         |         THEN -((1000 * (sv.s - ag.a::HUGEINT * ag.n))
         |                // (ag.n::HUGEINT * ag.n - sv.s))
         |         ELSE (1000 * (ag.a::HUGEINT * ag.n - sv.s))
         |              // (ag.n::HUGEINT * ag.n - sv.s)
         |        END)::BIGINT AS kappa_milli
         |FROM ag, sv""".stripMargin,
    // q216: the doc→chunk fan-out via generate_series, then one
    // chunk-keyed agg.
    "q216_chunk_manifest" ->
      """WITH t AS (SELECT doc_id, len(regexp_split_to_array(text, ' '))::BIGINT n
        |           FROM documents),
        |o AS (SELECT doc_id, n,
        |        coalesce(sum(n) OVER (ORDER BY doc_id ROWS BETWEEN
        |          UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT toff
        |      FROM t),
        |x AS (SELECT doc_id, n, toff,
        |        unnest(generate_series(toff // 128, (toff + n - 1) // 128))
        |          AS chunk_id
        |      FROM o)
        |SELECT chunk_id::BIGINT AS chunk_id, count(*)::BIGINT AS n_docs,
        |       min(doc_id)::BIGINT AS first_doc,
        |       max(doc_id)::BIGINT AS last_doc,
        |       sum(CASE WHEN toff // 128 = chunk_id THEN 1 ELSE 0 END)::BIGINT
        |         AS n_starts
        |FROM x GROUP BY 1 ORDER BY chunk_id""".stripMargin,
    // q220: distinct (source, term) then a term-keyed pair join.
    "q220_source_vocab_overlap" ->
      """WITH sv AS (SELECT DISTINCT source, w FROM
        |        (SELECT source, unnest(regexp_split_to_array(text, ' ')) w
        |         FROM documents)),
        |sz AS (SELECT source, count(*)::BIGINT v FROM sv GROUP BY 1),
        |cm AS (SELECT a.source sa, b.source sb, count(*)::BIGINT cm
        |       FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT cm.sa AS source_a, cm.sb AS source_b,
        |       za.v AS vocab_a, zb.v AS vocab_b, cm.cm AS n_common,
        |       ((1000 * cm.cm) // (za.v + zb.v - cm.cm))::BIGINT AS jaccard_pm
        |FROM cm JOIN sz za ON za.source = cm.sa
        |     JOIN sz zb ON zb.source = cm.sb
        |ORDER BY source_a, source_b""".stripMargin,
    // q253: the q28 stopword rule per 64-token chunk, then a per-doc
    // lag window for switches and an argmax for the dominant language
    // (ties DESC-count then ASC-code, matching min(struct(-c, pred))).
    "q253_code_switch_segments" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, ' ') tk
        |      FROM documents),
        |tok AS (SELECT doc_id, (i - 1) // 64 chunk, tk[i] w
        |      FROM (SELECT doc_id, tk,
        |              unnest(generate_series(1, len(tk))) i FROM t)),
        |chk AS (SELECT doc_id, chunk,
        |   sum(CASE WHEN w IN ('the','a','of','and','is','to','in')
        |     THEN 1 ELSE 0 END)::BIGINT s_en,
        |   sum(CASE WHEN w IN ('der','die','das','und','ist','zu','ein')
        |     THEN 1 ELSE 0 END)::BIGINT s_de,
        |   sum(CASE WHEN w IN ('el','la','de','y','es','un','en')
        |     THEN 1 ELSE 0 END)::BIGINT s_es
        |  FROM tok GROUP BY 1, 2),
        |pd AS MATERIALIZED (SELECT doc_id, chunk,
        |   CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
        |        WHEN s_de >= s_es THEN 'de' ELSE 'es' END pred
        |  FROM chk),
        |sw AS (SELECT doc_id, count(*)::BIGINT n_chunks,
        |   sum(CASE WHEN prev IS NOT NULL AND prev != pred
        |     THEN 1 ELSE 0 END)::BIGINT n_switches
        |  FROM (SELECT doc_id, pred,
        |          lag(pred) OVER (PARTITION BY doc_id ORDER BY chunk) prev
        |        FROM pd)
        |  GROUP BY 1),
        |dm AS (SELECT doc_id, pred dom_lang, c FROM (
        |   SELECT doc_id, pred, count(*)::BIGINT c,
        |     row_number() OVER (PARTITION BY doc_id
        |       ORDER BY count(*) DESC, pred) rn
        |   FROM pd GROUP BY 1, 2) WHERE rn = 1)
        |SELECT sw.doc_id, sw.n_chunks, dm.dom_lang,
        |       ((1000 * dm.c) // sw.n_chunks)::BIGINT AS dom_share_pm,
        |       sw.n_switches
        |FROM sw JOIN dm ON dm.doc_id = sw.doc_id
        |ORDER BY sw.doc_id""".stripMargin,
    // q256: q114's integer BM25 over 32-token stride-16 passages —
    // token→(window, window−1) via the two-branch union, doc-level
    // df, passage-length norm against the mean passage length, then
    // per-doc argmax (score desc, window asc) and global top-10.
    "q256_max_passage" -> maxPassageSql(32),
    // q260: full-vocab rank by (count desc, token asc), cumulative
    // head mass over the top-1024, the power-of-two grid via bit
    // shifts; f(2r) LEFT JOINs so past-vocab octaves go NULL exactly
    // like the Spark fold's bounds check.
    "q260_zipf_spectrum" ->
      s"""WITH tok AS (SELECT unnest(regexp_split_to_array(text, ' ')) w
         |      FROM documents),
         |f AS (SELECT w, count(*)::BIGINT c FROM tok GROUP BY 1),
         |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) rk FROM f),
         |cum AS (SELECT rk, c, sum(c) OVER (ORDER BY rk)::BIGINT cm
         |      FROM r WHERE rk <= ${TextAnalysis.ZipfTopN}),
         |tot AS (SELECT sum(c)::BIGINT tt FROM f),
         |g AS (SELECT (1 << i)::BIGINT r FROM generate_series(0, 9) t(i))
         |SELECT g.r AS rank, a.c AS freq_r, b.c AS freq_2r,
         |  (CASE WHEN b.c IS NULL THEN NULL
         |        ELSE (1000 * b.c) // a.c END)::BIGINT AS ratio_milli,
         |  ((1000 * a.cm) // tt)::BIGINT AS head_share_pm
         |FROM g JOIN cum a ON a.rk = g.r
         |  LEFT JOIN cum b ON b.rk = 2 * g.r, tot
         |ORDER BY rank""".stripMargin,
    // q263: the three parameterized q256 chains; rank re-derived by
    // row_number over each 10-row result, overlap/displacement vs the
    // size-32 baseline as scalar subqueries (grid-bounded).
    "q263_passage_ablation" -> {
      val sizes = TextAnalysis.PassageSizeGrid
      val tops = sizes.map(sz =>
        s"""t$sz AS (SELECT doc_id, score_micro,
           |  row_number() OVER (ORDER BY score_micro DESC, doc_id) - 1 AS rk
           |  FROM (${maxPassageSql(sz)}))""".stripMargin).mkString(",\n")
      val rows = sizes.map(sz =>
        s"""SELECT $sz::BIGINT psize,
           |  coalesce((SELECT doc_id FROM t$sz WHERE rk = 0), -1)::BIGINT
           |    AS top1_doc,
           |  coalesce((SELECT score_micro FROM t$sz WHERE rk = 0), 0)::BIGINT
           |    AS top1_score_micro,
           |  (SELECT count(*) FROM t$sz a JOIN t${TextAnalysis.PassageSize} b
           |     USING (doc_id))::BIGINT AS n_common_vs32,
           |  coalesce((SELECT sum(abs(a.rk - b.rk)) FROM t$sz a
           |     JOIN t${TextAnalysis.PassageSize} b USING (doc_id)), 0)::BIGINT
           |    AS rank_delta_sum""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH $tops
         |SELECT * FROM ($rows) ORDER BY psize""".stripMargin
    },
    // q267: the six rule flags as independent integer comparisons, the
    // (rule, flag) unnest, per-rule counts + unique kills, one-row doc
    // totals cross-joined on.
    "q267_rule_audit" ->
      """WITH tk AS (SELECT doc_id, text, string_split(text, ' ') t
        |      FROM documents),
        |s AS (SELECT doc_id,
        |        len(t)::BIGINT n_tok,
        |        len(list_distinct(t))::BIGINT n_uniq,
        |        len(list_filter(t, x -> x IN
        |          ('the','a','of','and','is','to','in')))::BIGINT n_stop,
        |        greatest(len(t) - 4, 0)::BIGINT n5,
        |        len(list_distinct(list_transform(
        |          generate_series(1, greatest(len(t) - 4, 0)),
        |          i -> array_to_string(t[i:i+4], ' '))))::BIGINT u5,
        |        length(text)::BIGINT len,
        |        (length(text) - length(regexp_replace(text,
        |          '[^A-Za-z0-9 ]', '', 'g')))::BIGINT n_punct
        |      FROM tk),
        |f AS MATERIALIZED (SELECT doc_id,
        |        CASE WHEN n_tok < 20 THEN 1 ELSE 0 END::BIGINT f1,
        |        CASE WHEN n_tok > 90 THEN 1 ELSE 0 END::BIGINT f2,
        |        CASE WHEN n_uniq * 100 < n_tok * 45 THEN 1 ELSE 0
        |          END::BIGINT f3,
        |        CASE WHEN (n5 - u5) * 1000 > n5 * 150 THEN 1 ELSE 0
        |          END::BIGINT f4,
        |        CASE WHEN n_stop < 2 THEN 1 ELSE 0 END::BIGINT f5,
        |        CASE WHEN n_punct * 1000 > len * 30 THEN 1 ELSE 0
        |          END::BIGINT f6
        |      FROM s),
        |ff AS (SELECT doc_id, f1, f2, f3, f4, f5, f6,
        |        (f1 + f2 + f3 + f4 + f5 + f6)::BIGINT nf FROM f),
        |d AS (SELECT count(*)::BIGINT n_docs,
        |        sum(CASE WHEN nf > 0 THEN 1 ELSE 0 END)::BIGINT n_killed
        |      FROM ff),
        |r AS (SELECT rule,
        |        CASE rule WHEN 'r1_short' THEN f1 WHEN 'r2_long' THEN f2
        |          WHEN 'r3_low_uniq' THEN f3 WHEN 'r4_dup5gram' THEN f4
        |          WHEN 'r5_no_stop' THEN f5 ELSE f6 END fl, nf
        |      FROM ff, (VALUES ('r1_short'), ('r2_long'), ('r3_low_uniq'),
        |        ('r4_dup5gram'), ('r5_no_stop'), ('r6_symbol')) rules(rule)),
        |a AS (SELECT rule, sum(fl)::BIGINT n_flagged,
        |        sum(CASE WHEN fl = 1 AND nf = 1 THEN 1 ELSE 0 END)
        |          ::BIGINT n_unique
        |      FROM r GROUP BY rule)
        |SELECT a.rule, a.n_flagged,
        |       ((1000 * a.n_flagged) // d.n_docs)::BIGINT AS flag_rate_pm,
        |       a.n_unique, d.n_docs, d.n_killed
        |FROM a, d ORDER BY rule""".stripMargin,
    // q283: per n the window hashes via the q22/q23 H(array_to_string)
    // identity, (source, h) occurrence counts, source re-agg.
    "q283_ngram_diversity" -> {
      val blocks = TextAnalysis.DiversityNs.map { n =>
        val hi = if (n == 1) "tk[i:i]" else s"tk[i:i+${n - 1}]"
        s"""oc$n AS (SELECT source, ${H(s"array_to_string($hi, ' ')")} AS h
           |      FROM (SELECT source, tk,
           |            unnest(generate_series(1, len(tk) - ${n - 1})) i FROM t)),
           |cn$n AS (SELECT source, h, count(*)::BIGINT c FROM oc$n
           |      GROUP BY 1, 2),
           |ag$n AS (SELECT source, $n::BIGINT n, sum(c)::BIGINT total_ngrams,
           |      count(*)::BIGINT distinct_ngrams,
           |      sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT hapax
           |      FROM cn$n GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      val un = TextAnalysis.DiversityNs.map(n => s"SELECT * FROM ag$n")
        .mkString(" UNION ALL ")
      s"""WITH t AS (SELECT doc_id, source,
         |      regexp_split_to_array(text, ' ') tk FROM documents),
         |$blocks
         |SELECT source, n, total_ngrams, distinct_ngrams,
         |       ((1000 * distinct_ngrams) // total_ngrams)::BIGINT
         |         AS distinct_pm,
         |       hapax AS hapax_ngrams,
         |       ((1000 * hapax) // distinct_ngrams)::BIGINT AS hapax_pm
         |FROM ($un) ORDER BY source, n""".stripMargin
    },
    // q300: (source, token) counts -> count-of-counts rollup; Chao1 /
    // Good-Turing floors replayed in plain BIGINT arithmetic.
    "q300_vocab_saturation" ->
      """WITH t AS (SELECT source, unnest(regexp_split_to_array(text, ' ')) AS tok
        |           FROM documents),
        |c AS (SELECT source, tok, count(*)::BIGINT n FROM t GROUP BY 1, 2),
        |a AS (SELECT source, sum(n)::BIGINT n_tokens, count(*)::BIGINT n_types,
        |      count(*) FILTER (n = 1)::BIGINT f1,
        |      count(*) FILTER (n = 2)::BIGINT f2
        |      FROM c GROUP BY 1),
        |k AS (SELECT *, (n_types + (f1 * (f1 - 1)) // (2 * (f2 + 1)))::BIGINT chao1
        |      FROM a)
        |SELECT source, n_tokens, n_types, f1, f2, chao1,
        |  ((1000000 * f1) // n_tokens)::BIGINT AS unseen_ppm,
        |  (1000000 - (1000000 * f1) // n_tokens)::BIGINT AS coverage_ppm,
        |  ((1000 * n_types) // chao1)::BIGINT AS saturation_pm
        |FROM k ORDER BY source""".stripMargin,
    // q309: the q114 scoring chain with BOTH stat sets — raw doc dfs
    // and cluster dfs over the shared recursive near-dup closure.
    "q309_bm25_dedup" ->
      s"""WITH $NearDupClusterCte,
         |pd AS (SELECT p.doc_id, lbl.cluster_id, len(tk)::BIGINT AS dl,
         |  len(list_filter(tk, x -> x = 'hash'))::BIGINT AS tf_hash,
         |  len(list_filter(tk, x -> x = 'join'))::BIGINT AS tf_join,
         |  len(list_filter(tk, x -> x = 'vector'))::BIGINT AS tf_vector
         |  FROM t p JOIN lbl ON lbl.doc_id = p.doc_id),
         |st AS (SELECT count(*)::BIGINT AS n_docs,
         |  count(DISTINCT cluster_id)::BIGINT AS n_clusters,
         |  sum(dl)::BIGINT AS n_tokens,
         |  count(*) FILTER (tf_hash > 0)::BIGINT AS dfr_hash,
         |  count(*) FILTER (tf_join > 0)::BIGINT AS dfr_join,
         |  count(*) FILTER (tf_vector > 0)::BIGINT AS dfr_vector,
         |  count(DISTINCT CASE WHEN tf_hash > 0 THEN cluster_id END)::BIGINT AS dfc_hash,
         |  count(DISTINCT CASE WHEN tf_join > 0 THEN cluster_id END)::BIGINT AS dfc_join,
         |  count(DISTINCT CASE WHEN tf_vector > 0 THEN cluster_id END)::BIGINT AS dfc_vector
         |  FROM pd),
         |c AS (SELECT pd.*, st.*,
         |  250 + (750000 * dl) // ((1000 * n_tokens) // n_docs) AS norm_milli
         |  FROM pd CROSS JOIN st),
         |sc AS (SELECT doc_id, cluster_id, dl,
         |  ((((1000 * (2 * (n_docs - dfr_hash) + 1)) // (2 * dfr_hash + 1)) *
         |    ((tf_hash * 2200000000) //
         |     (tf_hash * 1000 + (1200 * norm_milli) // 1000))) // 1000
         |  + (((1000 * (2 * (n_docs - dfr_join) + 1)) // (2 * dfr_join + 1)) *
         |    ((tf_join * 2200000000) //
         |     (tf_join * 1000 + (1200 * norm_milli) // 1000))) // 1000
         |  + (((1000 * (2 * (n_docs - dfr_vector) + 1)) // (2 * dfr_vector + 1)) *
         |    ((tf_vector * 2200000000) //
         |     (tf_vector * 1000 + (1200 * norm_milli) // 1000))) // 1000)::BIGINT
         |  AS score_raw_micro,
         |  ((((1000 * (2 * (n_clusters - dfc_hash) + 1)) // (2 * dfc_hash + 1)) *
         |    ((tf_hash * 2200000000) //
         |     (tf_hash * 1000 + (1200 * norm_milli) // 1000))) // 1000
         |  + (((1000 * (2 * (n_clusters - dfc_join) + 1)) // (2 * dfc_join + 1)) *
         |    ((tf_join * 2200000000) //
         |     (tf_join * 1000 + (1200 * norm_milli) // 1000))) // 1000
         |  + (((1000 * (2 * (n_clusters - dfc_vector) + 1)) // (2 * dfc_vector + 1)) *
         |    ((tf_vector * 2200000000) //
         |     (tf_vector * 1000 + (1200 * norm_milli) // 1000))) // 1000)::BIGINT
         |  AS score_dedup_micro FROM c)
         |SELECT doc_id, cluster_id, dl, score_raw_micro, score_dedup_micro,
         |  (score_dedup_micro - score_raw_micro)::BIGINT AS shift_micro
         |FROM sc WHERE score_dedup_micro > 0
         |ORDER BY score_dedup_micro DESC, doc_id LIMIT 10""".stripMargin,
    // q326: per-(source, term) document frequency 2x2, q304-style
    // single-floor chi^2, df caps, over-represented side only,
    // deterministic top-k per source.
    "q326_term_keyness" -> {
      val minDf = TextAnalysis.KeynessMinDf
      val topK = TextAnalysis.KeynessTopK
      s"""WITH dt AS (SELECT DISTINCT doc_id, source,
         |      unnest(regexp_split_to_array(text, ' ')) term FROM documents),
         |sdf AS (SELECT source, term, count(*)::BIGINT a FROM dt GROUP BY 1, 2),
         |gdf AS (SELECT term, sum(a)::BIGINT df FROM sdf GROUP BY 1),
         |sn AS (SELECT source, count(*)::BIGINT ns FROM documents GROUP BY 1),
         |t AS (SELECT count(*)::BIGINT nn FROM documents),
         |sc AS (SELECT source, term, a, df, ns, nn,
         |      (a::HUGEINT * ((nn - ns) - (df - a))
         |        - (ns - a)::HUGEINT * (df - a)) adbc
         |      FROM sdf JOIN gdf USING (term) JOIN sn USING (source), t
         |      WHERE df >= $minDf AND df * 2 <= nn),
         |k AS (SELECT source, term, a, df,
         |      ((1000 * nn::HUGEINT * adbc * adbc)
         |        // (ns::HUGEINT * (nn - ns) * df * (nn - df)))::BIGINT chi2_milli
         |      FROM sc WHERE adbc > 0),
         |r AS (SELECT source, term, a, df, chi2_milli,
         |      row_number() OVER (PARTITION BY source
         |        ORDER BY chi2_milli DESC, term)::BIGINT rank FROM k)
         |SELECT source, rank, term, a AS df_in, df, chi2_milli
         |FROM r WHERE rank <= $topK ORDER BY source, rank""".stripMargin
    },
    // q327: integerized LIX (words/sentence + 100*longwords/words),
    // terminator-run sentence count floored at 1, 5-point buckets.
    "q327_lix_readability" ->
      """WITH d AS (SELECT doc_id, source,
        |      greatest(len(regexp_split_to_array(text, ' ')), 1)::BIGINT w,
        |      len(list_filter(regexp_split_to_array(text, ' '),
        |        t -> length(t) > 6))::BIGINT l,
        |      greatest(len(regexp_extract_all(text, '[.!?]+', 0)), 1)::BIGINT s
        |      FROM documents),
        |x AS (SELECT source,
        |      ((1000 * w) // s + (100000 * l) // w)::BIGINT lix_milli, w
        |      FROM d)
        |SELECT source, (lix_milli // 5000)::BIGINT AS lix_bucket,
        |  count(*)::BIGINT AS n_docs, sum(w)::BIGINT AS total_words,
        |  (sum(lix_milli) // count(*))::BIGINT AS mean_lix_milli
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q337: structural-symbol density + keyword hits over the shared
    // token split; the integer decision rule replayed verbatim.
    "q337_code_detect" ->
      """WITH d AS (SELECT doc_id, source, n_chars,
        |      len(regexp_extract_all(text, '[{}();=<>]', 0))::BIGINT sym,
        |      len(list_filter(regexp_split_to_array(text, ' '),
        |        t -> t IN ('def', 'return', 'import', 'class', 'if', 'else', 'for', 'while', 'function', 'var', 'let', 'const', 'void', 'int', 'public', 'static')))::BIGINT kw_hits
        |      FROM documents),
        |x AS (SELECT source, n_chars, sym, kw_hits,
        |      ((1000 * sym) // greatest(n_chars, 1))::BIGINT sym_pm FROM d),
        |f AS (SELECT source, n_chars, sym,
        |      (CASE WHEN sym_pm >= 20 OR kw_hits >= 3 THEN 1 ELSE 0 END)::BIGINT
        |        is_code FROM x)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(is_code)::BIGINT AS n_code,
        |  ((1000 * sum(is_code)) // count(*))::BIGINT AS code_share_pm,
        |  ((1000 * sum(sym)) // greatest(sum(n_chars), 1))::BIGINT
        |    AS sym_density_pm
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    // q338: doc-level df over distinct terms, rare mass via tf join.
    "q338_rare_word_share" -> {
      val rmax = TextAnalysis.RareDfMax
      s"""WITH w AS (SELECT doc_id, source,
         |      unnest(regexp_split_to_array(text, ' ')) term FROM documents),
         |tf AS (SELECT doc_id, source, term, count(*)::BIGINT tf
         |      FROM w GROUP BY 1, 2, 3),
         |df AS (SELECT term, count(*)::BIGINT df FROM tf GROUP BY 1),
         |pd AS (SELECT doc_id, source, sum(tf)::BIGINT n_tok,
         |      sum(CASE WHEN df <= $rmax THEN tf ELSE 0 END)::BIGINT n_rare
         |      FROM tf JOIN df USING (term) GROUP BY 1, 2),
         |px AS (SELECT source, n_tok, n_rare,
         |      ((1000 * n_rare) // n_tok)::BIGINT rare_pm FROM pd)
         |SELECT source, count(*)::BIGINT AS n_docs,
         |  sum(n_tok)::BIGINT AS total_tokens,
         |  sum(n_rare)::BIGINT AS rare_tokens,
         |  ((1000 * sum(n_rare)) // sum(n_tok))::BIGINT AS rare_share_pm,
         |  ((1000 * sum(CASE WHEN rare_pm > 100 THEN 1 ELSE 0 END))
         |    // count(*))::BIGINT AS heavy_doc_share_pm
         |FROM px GROUP BY source ORDER BY source""".stripMargin
    },
    // q345: fixed function-word lexicon counts, bounded self-join on
    // the word key, one squared-cosine floor per source pair.
    "q345_style_cosine" -> {
      val lex = TextAnalysis.StyleLexicon.map(w => s"'$w'").mkString(", ")
      s"""WITH w AS (SELECT source,
         |      unnest(regexp_split_to_array(text, ' ')) tok FROM documents),
         |c AS (SELECT source, tok, count(*)::BIGINT c FROM w
         |      WHERE tok IN ($lex) GROUP BY 1, 2),
         |n AS (SELECT source, sum(c::HUGEINT * c) n2, sum(c)::BIGINT mass
         |      FROM c GROUP BY 1),
         |d AS (SELECT a.source source_a, b.source source_b,
         |      sum(a.c::HUGEINT * b.c) dot FROM c a
         |      JOIN c b ON b.tok = a.tok AND a.source < b.source
         |      GROUP BY 1, 2)
         |SELECT source_a, source_b, x.mass AS mass_a, y.mass AS mass_b,
         |  dot::BIGINT AS dot,
         |  (CASE WHEN x.n2 > 0 AND y.n2 > 0 THEN
         |    (1000000 * dot * dot) // (x.n2 * y.n2) END)::BIGINT AS cos2_ppm
         |FROM d JOIN n x ON x.source = d.source_a
         |JOIN n y ON y.source = d.source_b
         |ORDER BY source_a, source_b""".stripMargin
    },
    // q348: shared-term inner join for the matched mass; a totals-only
    // pair spine restores zero-shared-vocabulary pairs (tv_ppm=10⁶);
    // one ppm floor in HUGEINT.
    "q348_source_tv" ->
      """WITH tok AS (SELECT source,
        |      unnest(regexp_split_to_array(text, ' ')) w FROM documents),
        |cnt AS (SELECT source, w, count(*)::BIGINT c FROM tok GROUP BY 1, 2),
        |tot AS (SELECT source, sum(c)::BIGINT t FROM cnt GROUP BY 1),
        |pairs AS (SELECT a.source src_a, a.t t1, b.source src_b, b.t t2
        |      FROM tot a JOIN tot b ON a.source < b.source),
        |j AS (SELECT a.source sa, b.source sb, a.c ca, b.c cb,
        |      ta.t t1, tb.t t2
        |      FROM cnt a JOIN cnt b ON a.w = b.w AND a.source < b.source
        |      JOIN tot ta ON ta.source = a.source
        |      JOIN tot tb ON tb.source = b.source),
        |s AS (SELECT sa, sb, count(*)::BIGINT ns,
        |      sum(abs(ca::HUGEINT * t2 - cb::HUGEINT * t1)) mabs,
        |      sum(ca)::BIGINT s1, sum(cb)::BIGINT s2
        |      FROM j GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b, coalesce(s.ns, 0)::BIGINT AS n_shared,
        |  ((1000000::HUGEINT * (coalesce(s.mabs, 0::HUGEINT)
        |      + (p.t1 - coalesce(s.s1, 0))::HUGEINT * p.t2
        |      + (p.t2 - coalesce(s.s2, 0))::HUGEINT * p.t1))
        |    // (2::HUGEINT * p.t1 * p.t2))::BIGINT AS tv_ppm
        |FROM pairs p LEFT JOIN s ON s.sa = p.src_a AND s.sb = p.src_b
        |ORDER BY p.src_a, p.src_b""".stripMargin,
  )
}
