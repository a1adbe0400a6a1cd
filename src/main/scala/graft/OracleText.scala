package graft

import OracleHelpers._

/** DuckDB oracle SQL for the QueriesText tier (cross-engine determinism
  * rules in the SparkEntry scaladoc). Moved verbatim from SparkEntry.
  */
private[graft] object OracleText {
  def map: Map[String, String] = Map(
    "q30_exact_dedup" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keep_id
         FROM documents GROUP BY 1 HAVING count(*) > 1""",
    "q31_minhash_lsh" -> minhashSql,
    "q32_simhash" -> simhashSql,
    "q33_ngram_jaccard" ->
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CASE WHEN len(list_distinct(list_concat(
             list_distinct(regexp_split_to_array(trim(a.text), '\\s+')),
             list_distinct(regexp_split_to_array(trim(b.text), '\\s+'))))) = 0 THEN 0.0
         ELSE CAST(len(list_intersect(
             list_distinct(regexp_split_to_array(trim(a.text), '\\s+')),
             list_distinct(regexp_split_to_array(trim(b.text), '\\s+')))) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(
             list_distinct(regexp_split_to_array(trim(a.text), '\\s+')),
             list_distinct(regexp_split_to_array(trim(b.text), '\\s+'))))) AS DOUBLE) END AS jaccard
         FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1""",
    "q34_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(
           regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')) AS fingerprint,
         count(*) AS n_docs, min(doc_id) AS keep_id
         FROM documents GROUP BY 1 HAVING count(*) > 1""",
    "q90_incremental_dedup" ->
      """WITH f AS (SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
             regexp_split_to_array(trim(lower(text)), '\s+'))), ' ')) AS fingerprint
           FROM documents),
         inc AS (SELECT fingerprint, CAST(min(doc_id) AS BIGINT) AS doc_id
           FROM f WHERE doc_id % 10 = 0 GROUP BY fingerprint)
         SELECT doc_id, fingerprint FROM inc
         WHERE NOT EXISTS (SELECT 1 FROM f c
           WHERE c.doc_id % 10 <> 0 AND c.fingerprint = inc.fingerprint)""",
    "q35_lang_id" -> langIdSql,
    "q60_langid_ngram" -> ngramLangSql,
    "q61_winnowing" -> winnowingSql,
    "q62_sql_kernels" -> simhashSql,
    "q36_quality" -> qualitySql,
    "q83_repetition" -> repetitionSql,
    "q143_repetition_gate" ->
      s"""WITH r AS ($repetitionSql)
         SELECT doc_id, n_words,
           CAST(CASE WHEN top_word_frac > 0.3 THEN 1 ELSE 0 END
              + CASE WHEN dup_word_frac > 0.4 THEN 1 ELSE 0 END
              + CASE WHEN top_bigram_frac > 0.2 THEN 1 ELSE 0 END
              + CASE WHEN dup_bigram_frac > 0.6 THEN 1 ELSE 0 END AS INT)
             AS n_violations,
           top_word_frac <= 0.3 AND dup_word_frac <= 0.4
             AND top_bigram_frac <= 0.2 AND dup_bigram_frac <= 0.6 AS keep
         FROM r""",
    "q144_source_overlap" ->
      """WITH tk AS (SELECT source, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
         sh AS (SELECT DISTINCT source, g FROM
           (SELECT source, unnest(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
            FROM tk WHERE len(w) >= 3)),
         cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
         shared AS (SELECT a.source AS sa, b.source AS sb,
             CAST(count(*) AS BIGINT) AS n_shared
           FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
           GROUP BY 1, 2)
         SELECT ca.source AS source_a, cb.source AS source_b,
           CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
           ca.n AS n_a, cb.n AS n_b,
           round(CAST(coalesce(n_shared, 0) AS DOUBLE)
             / (ca.n + cb.n - coalesce(n_shared, 0)), 6) AS jaccard
         FROM cnt ca JOIN cnt cb ON ca.source < cb.source
         LEFT JOIN shared ON shared.sa = ca.source AND shared.sb = cb.source""",
    "q145_boilerplate_prefix" ->
      """WITH g AS (SELECT substr(lower(trim(text)), 1, 30) AS prefix,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             min(doc_id) AS first_doc_id
           FROM documents GROUP BY 1 HAVING count(*) >= 2)
         SELECT prefix, n_docs, n_sources, first_doc_id
         FROM g ORDER BY n_docs DESC, prefix LIMIT 20""",
    "q37_token_count" ->
      """SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpeish_tokens
         FROM documents""",
    "q119_vocab_encode" ->
      """WITH toks AS (
           SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS token,
             generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) - 1 AS pos
           FROM documents),
         vocab AS (
           SELECT token,
             CAST(row_number() OVER (ORDER BY count(*) DESC, token) AS INTEGER) AS token_id
           FROM toks GROUP BY token
           QUALIFY token_id <= 1000)
         SELECT t.doc_id,
           string_agg(CAST(coalesce(v.token_id, 0) AS VARCHAR), ' ' ORDER BY t.pos)
             AS token_ids
         FROM toks t LEFT JOIN vocab v ON t.token = v.token
         GROUP BY t.doc_id""",
    // ExactSubstr removal: canonical occurrence via min(struct) (DuckDB
    // orders structs lexicographically like Spark); the kept text is
    // rebuilt char-by-char with a running max over covered span starts
    // (the engine merges spans in a per-doc fold instead — same result).
    "q118_dedup_spans" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 20),
         occ AS (SELECT doc_id, CAST(g AS INTEGER) AS pos,
             substr(text, CAST(g AS INTEGER), 20) AS gram
           FROM (SELECT doc_id, text,
                   unnest(generate_series(1, length(text) - 19)) AS g
                 FROM d)),
         canon AS (SELECT gram, min(doc_id * 1048576 + pos) AS ck
           FROM occ GROUP BY gram),
         covered AS (SELECT o.doc_id, o.pos
           FROM occ o JOIN canon cn ON o.gram = cn.gram
           WHERE o.doc_id * 1048576 + o.pos != cn.ck),
         chars AS (SELECT doc_id, CAST(cp AS INTEGER) AS cpos,
             substr(text, CAST(cp AS INTEGER), 1) AS ch
           FROM (SELECT doc_id, text,
                   unnest(generate_series(1, length(text))) AS cp
                 FROM d)),
         marked AS (SELECT c.doc_id, c.ch, c.cpos,
             max(cv.pos) OVER (PARTITION BY c.doc_id ORDER BY c.cpos) AS last_start
           FROM chars c LEFT JOIN covered cv
             ON c.doc_id = cv.doc_id AND c.cpos = cv.pos)
         SELECT doc_id,
           coalesce(string_agg(ch, '' ORDER BY cpos)
             FILTER (WHERE last_start IS NULL OR cpos >= last_start + 20), '')
             AS cleaned_text,
           CAST(count(*) FILTER (WHERE last_start IS NOT NULL
             AND cpos < last_start + 20) AS BIGINT) AS removed_chars
         FROM marked GROUP BY doc_id
         UNION ALL
         SELECT doc_id, text AS cleaned_text, CAST(0 AS BIGINT) AS removed_chars
         FROM documents WHERE length(text) < 20""",
    "q94_dup_spans" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 20),
         pos AS (SELECT doc_id, text,
             unnest(generate_series(1, length(text) - 19)) AS g FROM d),
         grams AS (SELECT doc_id, substr(text, CAST(g AS INTEGER), 20) AS gram
           FROM pos),
         dup AS (SELECT gram FROM grams
           GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
         per AS (SELECT g.doc_id, count(*) AS dup_positions
           FROM grams g JOIN dup USING (gram) GROUP BY 1)
         SELECT d.doc_id, CAST(length(d.text) - 19 AS BIGINT) AS total_grams,
                CAST(coalesce(p.dup_positions, 0) AS BIGINT) AS dup_positions
         FROM d LEFT JOIN per p USING (doc_id)""",
    "q100_corpus_mix" ->
      """WITH d AS (SELECT doc_id, lang,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
             / 4294967296.0 AS frac
           FROM documents WHERE lang IN ('en', 'de', 'fr')),
         w(lang, wt) AS (VALUES ('en', CAST(0.5 AS DOUBLE)),
           ('de', CAST(0.3 AS DOUBLE)), ('fr', CAST(0.2 AS DOUBLE))),
         tot AS (SELECT lang, sum(n_tokens) AS t FROM d GROUP BY lang),
         sc AS (SELECT min(CAST(t AS DOUBLE) / wt) AS s FROM tot JOIN w USING (lang)),
         r AS (SELECT lang, (SELECT s FROM sc) * wt / CAST(t AS DOUBLE) AS rate
           FROM tot JOIN w USING (lang))
         SELECT d.lang, count(*) AS n_docs,
                CAST(sum(d.n_tokens) AS BIGINT) AS n_tokens
         FROM d JOIN r ON d.lang = r.lang AND d.frac < r.rate
         GROUP BY d.lang""",
    "q99_sliding_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents),
         s AS (SELECT doc_id, toks,
             unnest(generate_series(0, greatest(len(toks) - 1, 0), 30)) AS st
           FROM t)
         SELECT doc_id, CAST(st // 30 AS INT) AS chunk_idx,
                CAST(least(40, len(toks) - st) AS INT) AS n_chunk_tokens,
                array_to_string(toks[st + 1 : st + 40], ' ') AS chunk_text
         FROM s""",
    "q98_inverted_index" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
           FROM documents),
         p AS (
           SELECT term, count(DISTINCT doc_id) AS df,
                  list_sort(list(DISTINCT doc_id)) AS docs
           FROM toks WHERE term <> '' GROUP BY term)
         SELECT term, df, to_json(docs[1:20]) AS postings
         FROM p WHERE df >= 50""",
    "q86_pii_redaction" ->
      """WITH t AS (SELECT c_custkey,
           c_name || ' <user' || CAST(c_custkey AS VARCHAR) || '@example.com>' ||
           CASE WHEN c_custkey % 3 = 0
             THEN ' tel 555-' || lpad(CAST(c_custkey AS VARCHAR), 7, '0')
             ELSE '' END ||
           CASE WHEN c_custkey % 5 = 0
             THEN ' ip 10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.7'
             ELSE '' END AS text
           FROM customer)
         SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '([0-9]{1,3}\.){3}[0-9]{1,3}', '[IP]', 'g'),
             '[0-9][0-9-]{6,}[0-9]', '[PHONE]', 'g') AS redacted,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text, '[0-9][0-9-]{6,}[0-9]')) AS n_phones,
           len(regexp_extract_all(text,
             '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS n_ips
         FROM t""",
    "q87_salient_terms" ->
      """WITH toks AS (SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (SELECT doc_id, term,
             CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS score
           FROM tf JOIN df USING (term) CROSS JOIN n),
         m AS (SELECT doc_id, min({'neg': -score, 'term': term}) AS ms
           FROM scored GROUP BY doc_id)
         SELECT doc_id, struct_extract(ms, 'term') AS top_term,
           -struct_extract(ms, 'neg') AS tfidf
         FROM m""",
    "q66_bucketed_near_pairs" -> bucketedNearPairsSql,
    // Inverted-index truth (the q173/q196 rewrite): the threshold is
    // positive, so only pairs sharing a distinct shingle can qualify —
    // exactly the pairs the gram-equality self-join generates at Σdf²
    // cost; the r10 form (doc×doc list_intersect) cost ~15 min at sf0.1
    // and would time out the sf1 sweep.
    "q109_jaccard_join" ->
      """WITH toks AS (SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
         t AS MATERIALIZED (SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - 1),
               i -> array_to_string(w[i:i+2], ' '))) AS s
           FROM toks WHERE len(w) >= 3),
         sz AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM t),
         ex AS (SELECT doc_id, unnest(s) AS g FROM t),
         iv AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS inter
           FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, inter, sa.n + sb.n - inter AS uni
         FROM iv JOIN sz sa ON sa.doc_id = iv.id_a
         JOIN sz sb ON sb.doc_id = iv.id_b
         WHERE inter * 9 >= (sa.n + sb.n) * 4""",
    "q123_bm25" -> bm25Sql,
    "q124_dedup_survivors" -> dedupSurvivorsSql,
    "q136_dedup_apply" -> dedupApplySql,
    "q137_sentence_dedup" ->
      """WITH sent AS (SELECT doc_id,
             unnest(regexp_split_to_array(text, '\. ')) AS sent,
             generate_subscripts(regexp_split_to_array(text, '\. '), 1) - 1 AS pos
           FROM documents),
         canon AS (SELECT sent, min({'d': doc_id, 'p': pos}) AS c
           FROM sent GROUP BY sent),
         k AS (SELECT doc_id, pos, sent.sent,
             CASE WHEN struct_extract(c, 'd') = doc_id
                   AND struct_extract(c, 'p') = pos THEN 1 ELSE 0 END AS kept
           FROM sent JOIN canon USING (sent))
         SELECT doc_id, count(*) AS n_sents,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           coalesce(array_to_string(
             list(sent ORDER BY pos) FILTER (WHERE kept = 1), '. '), '')
             AS text_deduped
         FROM k GROUP BY doc_id""",
    // ^ coalesce: a document whose EVERY sentence was deduplicated away
    //   rebuilds to the EMPTY string (Spark's concat over an empty fold),
    //   not NULL — DuckDB's FILTERed list is NULL on zero rows. Invisible
    //   at sf0.01 (no fully-deduplicated doc exists there); flushed by
    //   the one-off sf0.1 oracle sweep (round 9).
    "q125_perplexity_filter" -> perplexityFilterSql,
    "q126_pmi_collocations" -> pmiCollocationsSql,
    "q127_kl_drift" -> klDriftSql,
    "q128_vocab_coverage" -> vocabCoverageSql,
    "q129_ngram_novelty" -> ngramNoveltySql,
    "q130_hash_split" -> hashSplitSql,
    "q131_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
         c AS (SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) AS non_ws,
             CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) AS n_hash,
             CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3.0 AS n_ell,
             CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) AS n_alpha,
             CAST(list_contains(w, 'the') AS INT) + CAST(list_contains(w, 'be') AS INT)
           + CAST(list_contains(w, 'to') AS INT) + CAST(list_contains(w, 'of') AS INT)
           + CAST(list_contains(w, 'and') AS INT) + CAST(list_contains(w, 'that') AS INT)
           + CAST(list_contains(w, 'have') AS INT) + CAST(list_contains(w, 'with') AS INT)
             AS stop_hits
           FROM t)
         SELECT doc_id, n_words,
           round(non_ws / n_words, 4) AS mean_word_len,
           round((n_hash + n_ell) / n_words, 4) AS symbol_ratio,
           round(n_alpha / n_words, 4) AS alpha_ratio,
           stop_hits,
           (n_words BETWEEN 25 AND 100000) AND (non_ws / n_words BETWEEN 3.0 AND 10.0)
             AND ((n_hash + n_ell) / n_words <= 0.1) AND (n_alpha / n_words >= 0.8)
             AND stop_hits >= 2 AS keep
         FROM c""",
    "q132_c4_filters" ->
      """WITH t AS (SELECT doc_id, text, lower(text) AS lt,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words
           FROM documents),
         c AS (SELECT doc_id, n_words,
             CAST(length(text) - length(replace(text, '.', '')) AS BIGINT)
           + CAST(length(text) - length(replace(text, '!', '')) AS BIGINT)
           + CAST(length(text) - length(replace(text, '?', '')) AS BIGINT) AS n_terminal,
             contains(text, '{') AS has_brace,
             contains(lt, 'lorem ipsum') AS has_lorem,
             contains(lt, 'javascript') AS has_javascript
           FROM t)
         SELECT doc_id, n_words, n_terminal, has_brace, has_lorem, has_javascript,
           NOT has_brace AND NOT has_lorem AND n_terminal >= 3 AND n_words >= 5 AS keep
         FROM c""",
    "q133_dsir_weights" ->
      """WITH pos AS (SELECT doc_id, lang,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         tgt AS (SELECT term, count(*) AS tcnt FROM pos WHERE lang = 'en' GROUP BY 1),
         raw AS (SELECT term, count(*) AS rcnt FROM pos WHERE lang <> 'en' GROUP BY 1),
         tot AS (SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ttot,
             CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS rtot,
             CAST(count(DISTINCT term) AS BIGINT) AS v FROM pos),
         lt AS (SELECT vt.term,
             round(ln(((COALESCE(tcnt, 0) + 1) / CAST(ttot + v AS DOUBLE)) /
                      ((COALESCE(rcnt, 0) + 1) / CAST(rtot + v AS DOUBLE))), 6) AS lt
           FROM (SELECT DISTINCT term FROM pos) vt
           LEFT JOIN tgt USING (term) LEFT JOIN raw USING (term) CROSS JOIN tot),
         sc AS (SELECT doc_id, count(*) AS n_tokens,
             sum(CAST(round(lt * 1000000.0) AS BIGINT)) AS lrm
           FROM pos JOIN lt USING (term) GROUP BY doc_id)
         SELECT doc_id, n_tokens,
           CAST(lrm AS DOUBLE) / 1000000.0 AS log_ratio,
           lrm > 0 AS keep FROM sc""",
    "q134_mix_temperature" ->
      """WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens
           FROM (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
                 FROM documents)
           GROUP BY source),
         sw AS (SELECT source, n_tokens, round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS sw
           FROM st),
         tot AS (SELECT list_sum(list(sw ORDER BY source)) AS tot FROM sw)
         SELECT source, n_tokens, round(sw / tot, 6) AS weight,
           round(sw / tot * 1000000.0 / n_tokens, 4) AS expected_epochs
         FROM sw CROSS JOIN tot""",
    "q135_token_shards" ->
      """WITH t AS (SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
             CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
           FROM t)
         SELECT doc_id, source, n_tokens,
           CAST(cum_before // 2000 AS BIGINT) AS shard_id,
           CAST(cum_before % 2000 AS BIGINT) AS shard_offset
         FROM c""",
    "q138_decontaminate" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
         sh AS (SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(w)-1),
               i -> array_to_string(w[i:i+2], ' ')))) AS shingle
           FROM toks WHERE len(w) >= 3),
         ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 50),
         tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 50),
         rare AS (SELECT shingle FROM tr GROUP BY shingle
           HAVING count(DISTINCT doc_id) <= 64),
         shared AS (SELECT tr.doc_id, count(DISTINCT tr.shingle) AS n
           FROM tr JOIN rare USING (shingle) JOIN ev USING (shingle)
           GROUP BY tr.doc_id)
         SELECT d.doc_id,
           CAST(COALESCE(shared.n, 0) AS BIGINT) AS n_shared_shingles,
           COALESCE(shared.n, 0) > 0 AS contaminated
         FROM documents d LEFT JOIN shared ON d.doc_id = shared.doc_id
         WHERE d.doc_id >= 50""",
    "q139_budget_alloc" -> budgetAllocSql,
    "q142_quality_quantile" ->
      s"""WITH qq AS (SELECT doc_id, source, quality_score AS quality
           FROM ($qualityWithSourceSql)),
         thr AS (SELECT source, quantile_cont(quality, 0.75) AS p75
           FROM qq GROUP BY source)
         SELECT doc_id, source, quality, p75
         FROM qq JOIN thr USING (source)
         WHERE quality >= p75""",
    "q146_mad_outliers" ->
      s"""WITH qq AS (SELECT doc_id, source, quality_score AS quality
           FROM ($qualityWithSourceSql)),
         med AS (SELECT source, quantile_cont(quality, 0.5) AS med
           FROM qq GROUP BY source),
         dv AS (SELECT doc_id, qq.source, quality, med,
             abs(quality - med) AS dev
           FROM qq JOIN med USING (source)),
         mad AS (SELECT source, quantile_cont(dev, 0.5) AS mad
           FROM dv GROUP BY source)
         SELECT doc_id, dv.source, round(quality, 6) AS quality,
           round(med, 6) AS med, round(dev, 6) AS dev,
           dev > 3.0 * mad AS is_outlier
         FROM dv JOIN mad USING (source)""",
    "q150_padding_efficiency" ->
      """WITH toks AS (SELECT source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_tok
           FROM documents),
         ex AS (SELECT source, n_tok,
             unnest([128, 512, 2048]) AS seq_len FROM toks),
         ag AS (SELECT source, seq_len,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             CAST(sum(least(n_tok, seq_len)) AS BIGINT) AS kept_tokens,
             CAST(sum(greatest(n_tok - seq_len, 0)) AS BIGINT)
               AS truncated_tokens
           FROM ex GROUP BY source, seq_len)
         SELECT source, CAST(seq_len AS INTEGER) AS seq_len, n_docs,
           n_tokens, kept_tokens, truncated_tokens,
           CAST(n_docs * seq_len - kept_tokens AS BIGINT) AS pad_waste,
           CAST(floor((kept_tokens + seq_len - 1) / seq_len) AS BIGINT)
             AS packed_rows,
           round(CAST(kept_tokens AS DOUBLE) /
             (floor((kept_tokens + seq_len - 1) / seq_len) * seq_len), 6)
             AS pack_efficiency
         FROM ag""",
    "q151_lexical_diversity" ->
      """WITH w AS (SELECT source,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (SELECT source, term, count(*) AS cnt FROM w
                GROUP BY source, term),
         ag AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
           FROM tf GROUP BY source)
         SELECT source, n_tokens, n_types, n_hapax,
           round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
           round(CAST(n_hapax AS DOUBLE) / n_types, 6) AS hapax_frac
         FROM ag""",
    "q152_cluster_sizes" ->
      s"""WITH ${bucketedPairCtes(4, 0.3)},
         edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         ${minLabelCcCtes()},
         cs AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
                FROM cc GROUP BY component)
         SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_vectors
         FROM cs GROUP BY cluster_size""",
    "q153_zipf_head" ->
      """WITH tc AS (SELECT term, count(*) AS cnt
           FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
                   AS term FROM documents)
           GROUP BY term),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM tc),
         top AS (SELECT term, cnt FROM tc ORDER BY cnt DESC, term LIMIT 50),
         r AS (SELECT term, CAST(cnt AS BIGINT) AS cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, term) AS INTEGER)
               AS rank,
             CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM top)
         SELECT rank, term, cnt,
           round(CAST(cum AS DOUBLE) / total, 6) AS cum_frac
         FROM r, tot""",
    "q154_quality_length_corr" ->
      s"""WITH qq AS (SELECT doc_id, source, quality_score
           FROM ($qualityWithSourceSql)),
         base AS (SELECT d.doc_id, qq.source,
             CAST(d.n_chars AS DOUBLE) AS x, quality_score AS y
           FROM documents d JOIN qq ON qq.doc_id = d.doc_id),
         m AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
             list_sum(list(x ORDER BY doc_id)) AS sx,
             list_sum(list(y ORDER BY doc_id)) AS sy,
             list_sum(list(x*y ORDER BY doc_id)) AS sxy,
             list_sum(list(x*x ORDER BY doc_id)) AS sx2,
             list_sum(list(y*y ORDER BY doc_id)) AS sy2
           FROM base GROUP BY source)
         SELECT source, CAST(n AS BIGINT) AS n_docs,
           CASE WHEN (n*sx2 - sx*sx) * (n*sy2 - sy*sy) <= 0
                THEN CAST(NULL AS DOUBLE)
                ELSE round((n*sxy - sx*sy) /
                  (sqrt(n*sx2 - sx*sx) * sqrt(n*sy2 - sy*sy)), 6)
           END AS corr_len_quality
         FROM m""",
    "q157_length_debias" ->
      s"""WITH qq AS (SELECT doc_id, source, quality_score
           FROM ($qualityWithSourceSql)),
         base AS (SELECT d.doc_id, qq.source,
             CAST(d.n_chars AS DOUBLE) AS x, quality_score AS y
           FROM documents d JOIN qq ON qq.doc_id = d.doc_id),
         m AS (SELECT source, CAST(count(*) AS DOUBLE) AS n,
             list_sum(list(x ORDER BY doc_id)) AS sx,
             list_sum(list(y ORDER BY doc_id)) AS sy,
             list_sum(list(x*y ORDER BY doc_id)) AS sxy,
             list_sum(list(x*x ORDER BY doc_id)) AS sx2
           FROM base GROUP BY source),
         ab AS (SELECT source, n, sx, sy,
             CASE WHEN n*sx2 - sx*sx = 0 THEN CAST(NULL AS DOUBLE)
                  ELSE (n*sxy - sx*sy) / (n*sx2 - sx*sx) END AS b
           FROM m),
         ab2 AS (SELECT source, b, (sy - b*sx) / n AS a FROM ab)
         SELECT base.doc_id, base.source,
           round(y, 6) AS quality,
           round(y - (a + b*x), 6) AS debiased_quality
         FROM base JOIN ab2 USING (source)""",
    "q158_bpe_pair_stats" ->
      """WITH toks AS (
           SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
           FROM documents),
         words AS (SELECT word, count(*) AS freq
           FROM toks WHERE word <> '' GROUP BY 1),
         syms AS (SELECT freq,
             list_append(string_split(word, ''), '</w>') AS symbols
           FROM words),
         pairs AS (SELECT symbols[i] AS a, symbols[i+1] AS b, freq
           FROM syms, UNNEST(range(1, len(symbols))) AS t(i))
         SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_count
         FROM pairs GROUP BY 1, 2
         ORDER BY pair_count DESC, a, b LIMIT 20""",
    "q167_bigram_lm" ->
      """WITH tk AS MATERIALIZED (
           SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
         pos AS MATERIALIZED (
           SELECT doc_id, i - 1 AS pos, w[i] AS prev, w[i+1] AS cur
           FROM tk, UNNEST(range(1, len(w))) AS t(i)),
         uni AS (SELECT tok AS term, CAST(count(*) AS BIGINT) AS cu
           FROM (SELECT unnest(w) AS tok FROM tk) GROUP BY 1),
         tu AS (SELECT CAST(sum(cu) AS BIGINT) AS t FROM uni),
         big AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb
           FROM pos GROUP BY 1, 2),
         cs AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cstart
           FROM big GROUP BY 1),
         lp AS (SELECT b.prev, b.cur,
             round(-ln(CAST(0.7 AS DOUBLE) *
                 (CAST(b.cb AS DOUBLE) / CAST(c.cstart AS DOUBLE)) +
               CAST(0.3 AS DOUBLE) *
                 (CAST(u.cu AS DOUBLE) / CAST(t.t AS DOUBLE))), 6) AS lp
           FROM big b JOIN cs c USING (prev)
           JOIN uni u ON u.term = b.cur CROSS JOIN tu t)
         SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           list_sum(list(l.lp ORDER BY p.pos)) / count(*)
             AS avg_neg_logp
         FROM pos p JOIN lp l ON p.prev = l.prev AND p.cur = l.cur
         GROUP BY p.doc_id""",
    "q170_feature_hashing" ->
      """WITH terms AS (
           SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\s+'))
             AS term
           FROM documents),
         loads AS (
           SELECT substr(md5(term), 1, 3) AS bucket,
             CAST(count(*) AS BIGINT) AS ld
           FROM terms GROUP BY 1)
         SELECT CAST(sum(ld) AS BIGINT) AS n_terms,
           CAST(count(*) AS BIGINT) AS n_buckets_used,
           CAST(max(ld) AS BIGINT) AS max_load,
           round(CAST(1.0 AS DOUBLE)
             - CAST(count(*) AS DOUBLE) / CAST(sum(ld) AS DOUBLE), 6)
             AS collision_frac
         FROM loads""",
    // Inverted-index truth, not all-pairs: the r9 oracle joined every doc
    // against every doc and ran list_intersect per pair — O(n² · |g|),
    // the sf0.1 sweep's one TIMEOUT on this surface. Exactness argument
    // for the rewrite: a pair reaches containment ≥ 0.8 > 0 only with
    // inter ≥ 1, i.e. only when the two docs share at least one distinct
    // trigram — exactly the pairs the gram-equality self-join generates;
    // count(*) over shared grams of DISTINCT-gram lists IS
    // len(list_intersect). Cost is Σ_t df(t)² (measured 2.8M at sf0.1,
    // vs 25M·|g| before), the same posting-list bound as the engine's
    // prefix-filter side.
    "q173_containment_join" ->
      """WITH d AS MATERIALIZED (
           SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
               ELSE [] END) AS g
           FROM (SELECT doc_id,
             regexp_split_to_array(trim(text), '\s+') AS w FROM documents)),
         sz AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS sz FROM d),
         ex AS (SELECT doc_id, unnest(g) AS t FROM d),
         iv AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS inter
           FROM ex a JOIN ex b ON a.t = b.t AND a.doc_id <> b.doc_id
           GROUP BY 1, 2)
         SELECT iv.id_a, iv.id_b, iv.inter, sa.sz AS sz_a,
           round(CAST(iv.inter AS DOUBLE) / CAST(sa.sz AS DOUBLE), 6)
             AS containment
         FROM iv JOIN sz sa ON sa.doc_id = iv.id_a
         WHERE CAST(iv.inter AS DOUBLE) / CAST(sa.sz AS DOUBLE) >= 0.8""",
    "q175_weighted_sample" ->
      """SELECT doc_id, source, n_chars,
           round(-ln((CAST(CAST(concat('0x',
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               AS DOUBLE) + 0.5) / 4294967296.0)
             / CAST(n_chars AS DOUBLE), 6) AS clock
         FROM documents ORDER BY clock, doc_id LIMIT 20""",
    "q176_stratified_sample" ->
      """SELECT source, doc_id, hk FROM (
           SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS hk,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents) WHERE rn <= 5""",
    "q178_ks_drift" ->
      """WITH psv AS (SELECT source, n_chars AS x, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
         st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
           FROM psv GROUP BY 1),
         corpus AS (SELECT x, CAST(sum(c) AS BIGINT) AS cc
           FROM psv GROUP BY 1),
         ct AS (SELECT CAST(sum(cc) AS BIGINT) AS nc FROM corpus),
         ccum AS (SELECT x,
             CAST(sum(cc) OVER (ORDER BY x) AS BIGINT) AS ccum
           FROM corpus),
         grid AS (SELECT s.source, s.ns, v.x, coalesce(p.c, 0) AS c
           FROM st s CROSS JOIN (SELECT x FROM corpus) v
           LEFT JOIN psv p ON p.source = s.source AND p.x = v.x),
         scum AS (SELECT source, ns, x,
             CAST(sum(c) OVER (PARTITION BY source ORDER BY x) AS BIGINT)
               AS scum
           FROM grid)
         SELECT source, ns AS n,
           round(max(abs(CAST(scum AS DOUBLE) / CAST(ns AS DOUBLE)
             - CAST(ccum AS DOUBLE) / CAST(nc AS DOUBLE))), 6) AS ks
         FROM scum JOIN ccum USING (x) CROSS JOIN ct
         GROUP BY source, ns""",
    "q464_good_turing" ->
      """WITH tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
           SELECT unnest(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
               ELSE [] END) AS tok
           FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
             AS w FROM documents))
           GROUP BY 1),
         nr AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r
           FROM tf GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
           FROM tf),
         nxt AS (SELECT r - 1 AS r, n_r AS n_r1 FROM nr)
         SELECT nr.r, nr.n_r,
           round(CASE WHEN n_r1 IS NOT NULL
             THEN CAST(nr.r + 1 AS DOUBLE) * CAST(n_r1 AS DOUBLE)
               / CAST(nr.n_r AS DOUBLE) END, 6) AS r_star,
           round(CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS missing_mass
         FROM nr LEFT JOIN nxt ON nr.r = nxt.r CROSS JOIN tot
         WHERE nr.r <= 5""",

    "q461_heaps_fit" -> {
      val folds = Seq("x" -> "sx", "y" -> "sy", "x * x" -> "sxx",
        "x * y" -> "sxy", "y * y" -> "syy").map { case (e, nm) =>
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list($e ORDER BY source)), (p, q) -> p + q) AS $nm"""
      }.mkString(",\n             ")
      s"""WITH per AS (SELECT source, CAST(sum(c) AS BIGINT) AS t,
           CAST(count(*) AS BIGINT) AS v FROM (
             SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM (
               SELECT source, unnest(regexp_split_to_array(
                 trim(lower(text)), '\\s+')) AS tok FROM documents)
             WHERE length(tok) > 0 GROUP BY 1, 2) GROUP BY 1),
         xy AS (SELECT source, round(ln(CAST(t AS DOUBLE)), 6) AS x,
             round(ln(CAST(v AS DOUBLE)), 6) AS y FROM per),
         sums AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             $folds
           FROM xy)
         SELECT CAST(n AS BIGINT) AS n_sources,
           round(CASE WHEN n * sxx - sx * sx > 0
             THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6)
             + CAST(0.0 AS DOUBLE) AS heaps_beta,
           round(CASE WHEN n * sxx - sx * sx > 0
             THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             END, 6) + CAST(0.0 AS DOUBLE) AS ln_k,
           round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
             THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6)
             + CAST(0.0 AS DOUBLE) AS r2
         FROM sums"""
    },

    "q462_contamination_matrix" ->
      """WITH g AS MATERIALIZED (SELECT DISTINCT source, g FROM (
           SELECT source, unnest(CASE WHEN len(w) >= 5
               THEN list_transform(range(1, len(w) - 3),
                 i -> array_to_string(w[i:i+4], ' '))
               ELSE [] END) AS g
           FROM (SELECT source, regexp_split_to_array(trim(lower(text)),
             '\s+') AS w FROM documents))),
         sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS ng
           FROM g GROUP BY 1),
         pairs AS (SELECT a.source AS sa, b.source AS sb,
             CAST(count(*) AS BIGINT) AS shared
           FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
           GROUP BY 1, 2)
         SELECT sa, sb, shared, na.ng AS na, nb.ng AS nb,
           round(CAST(shared AS DOUBLE)
             / CAST(least(na.ng, nb.ng) AS DOUBLE), 6) AS containment
         FROM pairs JOIN sizes na ON sa = na.source
         JOIN sizes nb ON sb = nb.source""",

    "q463_vocab_coverage" ->
      """WITH tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
           SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
             AS tok FROM documents)
           WHERE length(tok) > 0 GROUP BY 1),
         cum AS (SELECT c,
             CAST(sum(c) OVER (ORDER BY c DESC, tok ASC) AS BIGINT) AS cum
           FROM tf),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS v FROM tf)
         SELECT max(v) AS vocab_size, max(t) AS total_tokens,
           CAST(sum(CASE WHEN cum * 100 < t * 50 THEN 1 ELSE 0 END) + 1
             AS BIGINT) AS k50,
           CAST(sum(CASE WHEN cum * 100 < t * 90 THEN 1 ELSE 0 END) + 1
             AS BIGINT) AS k90,
           CAST(sum(CASE WHEN cum * 100 < t * 99 THEN 1 ELSE 0 END) + 1
             AS BIGINT) AS k99
         FROM cum CROSS JOIN tot""",

    "q456_wasserstein_drift" ->
      """WITH psv AS (SELECT source, n_chars AS x, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
         st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
           FROM psv GROUP BY 1),
         corpus AS (SELECT x, CAST(sum(c) AS BIGINT) AS cc
           FROM psv GROUP BY 1),
         ct AS (SELECT CAST(sum(cc) AS BIGINT) AS nc FROM corpus),
         ccum AS (SELECT x,
             CAST(sum(cc) OVER (ORDER BY x) AS BIGINT) AS ccum
           FROM corpus),
         nx AS (SELECT x, lead(x) OVER (ORDER BY x) AS nx FROM corpus),
         grid AS (SELECT s.source, s.ns, v.x, coalesce(p.c, 0) AS c
           FROM st s CROSS JOIN (SELECT x FROM corpus) v
           LEFT JOIN psv p ON p.source = s.source AND p.x = v.x),
         scum AS (SELECT source, ns, x,
             CAST(sum(c) OVER (PARTITION BY source ORDER BY x) AS BIGINT)
               AS scum
           FROM grid),
         terms AS (SELECT source, ns, scum.x,
             abs(CAST(scum AS DOUBLE) / CAST(ns AS DOUBLE)
               - CAST(ccum AS DOUBLE) / CAST(nc AS DOUBLE))
               * CAST(coalesce(nx.nx, scum.x) - scum.x AS DOUBLE) AS t
           FROM scum JOIN ccum USING (x) JOIN nx USING (x) CROSS JOIN ct)
         SELECT source, ns AS n,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(t ORDER BY x)), (p, q) -> p + q), 4)
             + CAST(0.0 AS DOUBLE) AS w1_chars
         FROM terms GROUP BY source, ns""",

    "q182_quantile_normalize" ->
      """WITH d AS (SELECT doc_id, source, n_chars AS x FROM documents),
         ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
           FROM d GROUP BY 1),
         nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
         r AS (SELECT doc_id, source, x,
             CAST(row_number() OVER (PARTITION BY source ORDER BY x, doc_id)
               AS BIGINT) AS r
           FROM d),
         tt AS (SELECT r.doc_id, r.source, r.x,
             (r.r * nt.n + ns.n_s - 1) // ns.n_s AS t
           FROM r JOIN ns USING (source) CROSS JOIN nt),
         grid AS (SELECT x AS gx,
             CAST(sum(c) OVER (ORDER BY x) AS BIGINT) AS ccum,
             CAST(sum(c) OVER (ORDER BY x) - c AS BIGINT) AS pcum
           FROM (SELECT x, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1))
         SELECT doc_id, source, x, gx AS norm_x
         FROM tt JOIN grid ON tt.t > grid.pcum AND tt.t <= grid.ccum""",
    "q194_lang_entropy" ->
      """WITH lc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
           FROM documents GROUP BY 1, 2),
         st AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot
           FROM lc GROUP BY 1),
         terms AS (SELECT lc.source, lc.lang, st.tot,
             round(-((CAST(lc.cnt AS DOUBLE) / CAST(st.tot AS DOUBLE))
               * ln(CAST(lc.cnt AS DOUBLE) / CAST(st.tot AS DOUBLE))), 6)
               AS term
           FROM lc JOIN st USING (source))
         SELECT source, tot AS n_docs, CAST(count(*) AS BIGINT) AS n_langs,
           round(list_sum(list(term ORDER BY lang)), 4) AS entropy
         FROM terms GROUP BY source, tot""",
    "q195_token_gini" ->
      """WITH tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS x
           FROM (SELECT source,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term
             FROM documents) GROUP BY 1, 2),
         idx AS (SELECT source, x,
             CAST(row_number() OVER (PARTITION BY source ORDER BY x, term)
               AS BIGINT) AS i
           FROM tf),
         g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(i * x) AS BIGINT) AS a
           FROM idx GROUP BY 1)
         SELECT source, n AS n_terms, sx AS n_tokens,
           round(CAST(2 * a - (n + 1) * sx AS DOUBLE)
             / CAST(n * sx AS DOUBLE), 6) AS gini
         FROM g""",
    "q155_dedup_impact" ->
      s"""WITH $dedupKeepCtes,
         toks AS (SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tok
           FROM documents),
         kept AS (SELECT t.doc_id, t.source, t.n_tok,
             (cc.vertex IS NULL OR surv.sid IS NOT NULL) AS keep
           FROM toks t
           LEFT JOIN cc ON t.doc_id = cc.vertex
           LEFT JOIN surv ON t.doc_id = surv.sid)
         SELECT source,
           CAST(count(*) AS BIGINT) AS docs_before,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_after,
           CAST(sum(n_tok) AS BIGINT) AS tokens_before,
           CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT)
             AS tokens_after,
           round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS doc_keep_rate,
           round(CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS DOUBLE)
             / sum(n_tok), 6) AS token_keep_rate
         FROM kept GROUP BY source""",
    "q156_contamination_curve" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
         sh AS (SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(w)-1),
               i -> array_to_string(w[i:i+2], ' ')))) AS shingle
           FROM toks WHERE len(w) >= 3),
         ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 50),
         tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 50),
         rare AS (SELECT shingle FROM tr GROUP BY shingle
           HAVING count(DISTINCT doc_id) <= 64),
         shared AS (SELECT tr.doc_id, count(DISTINCT tr.shingle) AS n
           FROM tr JOIN rare USING (shingle) JOIN ev USING (shingle)
           GROUP BY tr.doc_id),
         th AS (SELECT unnest([1, 2, 4, 8]) AS threshold),
         fl AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_flagged
           FROM th JOIN shared ON shared.n >= th.threshold
           GROUP BY threshold),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_train
           FROM documents WHERE doc_id >= 50)
         SELECT CAST(th.threshold AS INTEGER) AS threshold,
           coalesce(n_flagged, 0) AS n_flagged, n_train,
           round(CAST(coalesce(n_flagged, 0) AS DOUBLE) / n_train, 6)
             AS flagged_frac
         FROM th LEFT JOIN fl USING (threshold), tot""",
    "q141_mix_apply" ->
      s"""WITH alloc AS ($budgetAllocSql),
         rates AS (SELECT source, alloc_tokens / n_tokens AS rate FROM alloc)
         SELECT d.doc_id, d.source
         FROM documents d JOIN rates USING (source)
         WHERE CAST(CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
               / 4294967296.0 < rate""",
    "q71_curation" -> curationSql,
    "q72_neardup_components" -> neardupComponentsSql,
    "q78_contamination" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
         sh AS (SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(w)-1),
               i -> array_to_string(w[i:i+2], ' ')))) AS shingle
           FROM toks WHERE len(w) >= 3),
         ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id < 50),
         tr AS (SELECT doc_id AS train_id, shingle FROM sh WHERE doc_id >= 50),
         rare AS (SELECT shingle FROM tr GROUP BY shingle
           HAVING count(DISTINCT train_id) <= 64)
         SELECT eval_id, count(DISTINCT shingle) AS n_shared_shingles,
           count(DISTINCT train_id) AS n_contaminating_docs
         FROM ev JOIN tr USING (shingle) JOIN rare USING (shingle)
         GROUP BY eval_id""",
    "q76_stratified_sample" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang,
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
               / 4294967296.0 AS frac
           FROM documents)
         WHERE frac < CASE WHEN lang = 'en' THEN 0.5 ELSE 0.2 END""",
    "q77_sequence_packing" ->
      """WITH t AS (SELECT doc_id, lang,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
         FROM documents)
         SELECT doc_id, lang, n_tokens,
           CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix_tokens,
           CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS pack_id
         FROM t""",
    "q56_doc_stats_view" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS total_tokens
         FROM documents GROUP BY lang""",

    "q210_tfidf_topk" ->
      """WITH toks AS (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
         df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         scored AS (
           SELECT doc_id, term, tf,
             round(tf * round(ln(CAST(n_docs AS DOUBLE) / df), 6), 6) AS tfidf
           FROM tf JOIN df USING (term) CROSS JOIN n)
         SELECT doc_id, term, tf, tfidf FROM (
           SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY tfidf DESC, term) AS rn
           FROM scored) t
         WHERE rn <= 3""",
    "q224_ks_two_sample" ->
      """WITH d AS (SELECT n_chars, source FROM documents
           WHERE source IN ('src0', 'src1')),
         g AS (SELECT n_chars,
             CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
               AS c0,
             CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
               AS c1
           FROM d GROUP BY 1),
         c AS (SELECT n_chars,
             CAST(sum(c0) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cum0,
             CAST(sum(c1) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1
           FROM g),
         t AS (SELECT CAST(sum(c0) AS BIGINT) AS n0,
             CAST(sum(c1) AS BIGINT) AS n1 FROM g),
         k AS (SELECT n0, n1,
             round(max(abs(CAST(cum0 AS DOUBLE) / CAST(n0 AS DOUBLE)
               - CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE))), 6) AS ks_stat
           FROM c CROSS JOIN t GROUP BY 1, 2)
         SELECT n0, n1, ks_stat,
           round(1.358 * sqrt(CAST(n0 + n1 AS DOUBLE)
             / CAST(n0 * n1 AS DOUBLE)), 6) AS d_crit,
           ks_stat > round(1.358 * sqrt(CAST(n0 + n1 AS DOUBLE)
             / CAST(n0 * n1 AS DOUBLE)), 6) AS reject_h0
         FROM k""",
    "q227_mann_whitney_u" ->
      """WITH d AS (SELECT n_chars, source FROM documents
           WHERE source IN ('src2', 'src3')),
         g AS (SELECT n_chars,
             CAST(sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
             CAST(sum(CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS BIGINT)
               AS c2,
             CAST(count(*) AS BIGINT) AS c
           FROM d GROUP BY 1),
         cc AS (SELECT n_chars, c1, c2, c,
             CAST(sum(c) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cumc
           FROM g),
         t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2,
             CAST(sum(c*c*c - c) AS BIGINT) AS ties FROM g),
         r AS (SELECT CAST(sum(c1 * (2 * (cumc - c) + c + 1)) AS BIGINT)
             AS r1x2 FROM cc),
         f AS (SELECT n1, n2, r1x2 - n1 * (n1 + 1) AS u2,
             CAST(n1 + n2 AS DOUBLE) AS nn, ties FROM r CROSS JOIN t)
         SELECT n1, n2, CAST(u2 AS DOUBLE) / 2.0 AS u_stat,
           round((CAST(u2 AS DOUBLE) / 2.0
               - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
             / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
               * ((nn + 1.0) - CAST(ties AS DOUBLE) / (nn * (nn - 1.0)))), 4)
             AS z_stat
         FROM f""",
    "q245_phrase_proximity" ->
      """WITH t AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
           generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) - 1
             AS pos
           FROM documents),
         a AS (SELECT doc_id, pos AS pa FROM t WHERE tok = 'hash'),
         b AS (SELECT doc_id, pos AS pb FROM t WHERE tok = 'join')
         SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(abs(pa - pb)) AS BIGINT) AS min_dist
         FROM a JOIN b USING (doc_id)
         WHERE abs(pa - pb) <= 3 GROUP BY 1""",
    "q252_collocations_g2" ->
      """WITH t AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
           generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) - 1
             AS pos
           FROM documents),
         big AS (SELECT x.tok AS w1, y.tok AS w2,
             CAST(count(*) AS BIGINT) AS o11
           FROM t x JOIN t y ON x.doc_id = y.doc_id AND y.pos = x.pos + 1
           GROUP BY 1, 2),
         m1 AS (SELECT w1, CAST(sum(o11) AS BIGINT) AS c1 FROM big GROUP BY 1),
         m2 AS (SELECT w2, CAST(sum(o11) AS BIGINT) AS c2 FROM big GROUP BY 1),
         nn AS (SELECT CAST(sum(o11) AS BIGINT) AS nn FROM big),
         sc AS (SELECT w1, w2, o11, c1 - o11 AS o12, c2 - o11 AS o21,
             nn.nn - c1 - c2 + o11 AS o22, c1, c2, nn.nn AS n
           FROM big JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN nn
           WHERE o11 >= 5),
         g AS (SELECT w1, w2, o11,
             round(2.0 * (
               (CASE WHEN o11 > 0 THEN CAST(o11 AS DOUBLE)
                 * ln(CAST(o11 AS DOUBLE) / (CAST(c1 AS DOUBLE)
                   * CAST(c2 AS DOUBLE) / CAST(n AS DOUBLE))) ELSE 0.0 END)
               + (CASE WHEN o12 > 0 THEN CAST(o12 AS DOUBLE)
                 * ln(CAST(o12 AS DOUBLE) / (CAST(c1 AS DOUBLE)
                   * (CAST(n AS DOUBLE) - CAST(c2 AS DOUBLE))
                   / CAST(n AS DOUBLE))) ELSE 0.0 END)
               + (CASE WHEN o21 > 0 THEN CAST(o21 AS DOUBLE)
                 * ln(CAST(o21 AS DOUBLE) / ((CAST(n AS DOUBLE)
                   - CAST(c1 AS DOUBLE)) * CAST(c2 AS DOUBLE)
                   / CAST(n AS DOUBLE))) ELSE 0.0 END)
               + (CASE WHEN o22 > 0 THEN CAST(o22 AS DOUBLE)
                 * ln(CAST(o22 AS DOUBLE) / ((CAST(n AS DOUBLE)
                   - CAST(c1 AS DOUBLE)) * (CAST(n AS DOUBLE)
                   - CAST(c2 AS DOUBLE)) / CAST(n AS DOUBLE))) ELSE 0.0 END)
             ), 4) AS g2
           FROM sc)
         SELECT w1, w2, o11, g2 FROM g
         ORDER BY g2 DESC, w1, w2 LIMIT 20""",
    "q253_rake_keywords" ->
      """WITH t AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
           generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) - 1
             AS pos
           FROM documents),
         nt AS (SELECT doc_id, tok, pos FROM t
           WHERE tok NOT IN ('a', 'the', 'of', 'and', 'to', 'in')
             AND tok <> ''),
         phr AS (SELECT doc_id, tok, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM nt),
         plen AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS plen
           FROM phr GROUP BY 1, 2),
         occ AS (SELECT phr.tok, plen.plen FROM phr
           JOIN plen ON phr.doc_id = plen.doc_id AND phr.grp = plen.grp)
         SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq,
           CAST(sum(plen) AS BIGINT) AS degree,
           round(CAST(CAST(sum(plen) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4) AS rake_score
         FROM occ GROUP BY 1
         ORDER BY rake_score DESC, word LIMIT 15""",

    "q269_burrows_delta" ->
      """WITH toks AS (SELECT source, w
           FROM (SELECT source,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
             FROM documents)
           WHERE length(w) > 0),
         counts AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
           FROM toks GROUP BY 1, 2),
         totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS t
           FROM counts GROUP BY 1),
         top AS (SELECT w FROM (SELECT w, CAST(sum(c) AS BIGINT) AS tc
             FROM counts GROUP BY 1)
           ORDER BY tc DESC, w LIMIT 15),
         grid AS (SELECT totals.source, top.w,
             CAST(coalesce(c, 0) AS DOUBLE) / CAST(t AS DOUBLE) AS f
           FROM totals CROSS JOIN top
           LEFT JOIN counts ON counts.source = totals.source
             AND counts.w = top.w),
         st AS (SELECT w,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(f ORDER BY source)), (acc, x) -> round(acc + x, 10)) AS sf,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(f * f ORDER BY source)), (acc, x) -> round(acc + x, 10))
               AS sf2,
             CAST(count(*) AS BIGINT) AS ns
           FROM grid GROUP BY 1),
         st2 AS (SELECT w, sf / CAST(ns AS DOUBLE) AS mu,
             sqrt((sf2 - CAST(ns AS DOUBLE)
                 * ((sf / CAST(ns AS DOUBLE)) * (sf / CAST(ns AS DOUBLE))))
               / (CAST(ns AS DOUBLE) - 1.0)) AS sigma
           FROM st),
         z AS (SELECT source, grid.w,
             CASE WHEN sigma > 0 THEN (f - mu) / sigma ELSE 0.0 END AS z
           FROM grid JOIN st2 ON grid.w = st2.w)
         SELECT a.source AS source_a, b.source AS source_b,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(abs(a.z - b.z) ORDER BY a.w)),
               (acc, x) -> round(acc + x, 10))
             / CAST(count(*) AS DOUBLE), 6) AS delta
         FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
         GROUP BY 1, 2""",

    "q271_textrank" -> OracleHelpers.textRankSql(iters = 10),

    "q326_flesch_reading" ->
      """WITH d AS (SELECT source,
           len(regexp_extract_all(lower(text), '[a-z]+')) AS w,
           len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y,
           greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS se
         FROM documents),
         f AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(w) AS BIGINT) AS tw, CAST(sum(y) AS BIGINT) AS ty,
             CAST(sum(se) AS BIGINT) AS ts
           FROM d WHERE w > 0 GROUP BY 1)
         SELECT source, n_docs,
           round(206.835 - 1.015 * (CAST(tw AS DOUBLE) / CAST(ts AS DOUBLE))
             - 84.6 * (CAST(ty AS DOUBLE) / CAST(tw AS DOUBLE)), 4) AS fre
         FROM f""",

    "q331_token_fertility" ->
      """WITH d AS (SELECT lang, n_chars,
           len(regexp_split_to_array(trim(text), '\s+')) AS ntok
         FROM documents),
         f AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS tc,
             CAST(sum(ntok) AS BIGINT) AS tt
           FROM d WHERE ntok > 0 GROUP BY 1)
         SELECT lang, n_docs,
           round(CAST(tc AS DOUBLE) / CAST(tt AS DOUBLE), 6)
             AS chars_per_token,
           round(CAST(tt AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
             AS tokens_per_doc
         FROM f""",

    "q343_vocab_richness" ->
      """WITH tk AS MATERIALIZED (
           SELECT source, regexp_split_to_array(trim(lower(text)), '\s+')
             AS w
           FROM documents),
         bg AS (SELECT source, w[i] || ' ' || w[i+1] AS g
           FROM tk, UNNEST(range(1, len(w))) AS t(i)),
         tf AS (SELECT source, g, CAST(count(*) AS BIGINT) AS f
           FROM bg GROUP BY 1, 2),
         agg AS (SELECT source, CAST(count(*) AS BIGINT) AS d_types,
             CAST(sum(f) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
           FROM tf GROUP BY 1)
         SELECT source, d_types, n_tokens, f1, f2,
           CASE WHEN f2 > 0 THEN round(CAST(d_types AS DOUBLE)
             + CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE)
               / (2.0 * CAST(f2 AS DOUBLE)), 2) ELSE NULL END AS chao1,
           round(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
             AS good_coverage
         FROM agg""",

    "q344_good_turing" ->
      """WITH tk AS MATERIALIZED (
           SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS w
           FROM documents),
         bg AS (SELECT w[i] || ' ' || w[i+1] AS g
           FROM tk, UNNEST(range(1, len(w))) AS t(i)),
         fof AS (SELECT f, CAST(count(*) AS BIGINT) AS nr FROM (
           SELECT g, CAST(count(*) AS BIGINT) AS f FROM bg GROUP BY 1)
         GROUP BY 1)
         SELECT a.f AS r, a.nr AS n_r, b.nr AS n_r1,
           round((CAST(a.f AS DOUBLE) + 1.0) * CAST(b.nr AS DOUBLE)
             / CAST(a.nr AS DOUBLE), 6) AS r_star
         FROM fof a JOIN fof b ON a.f + 1 = b.f WHERE a.f <= 5""",

    "q349_kneser_ney" ->
      """WITH tk AS MATERIALIZED (
           SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS wr
           FROM documents),
         bg AS (SELECT wr[i] AS v, wr[i+1] AS w
           FROM tk, UNNEST(range(1, len(wr))) AS t(i)),
         big AS (SELECT v, w, CAST(count(*) AS BIGINT) AS cb
           FROM bg GROUP BY 1, 2),
         cv AS (SELECT v, CAST(sum(cb) AS BIGINT) AS cvv,
             CAST(count(*) AS BIGINT) AS n1v FROM big GROUP BY 1),
         cw AS (SELECT w, CAST(count(*) AS BIGINT) AS n1w
           FROM big GROUP BY 1),
         tb AS (SELECT CAST(count(*) AS BIGINT) AS nbb FROM big),
         p AS (SELECT b.v, b.w,
             greatest(CAST(cb AS DOUBLE) - 0.75, 0.0) / CAST(cvv AS DOUBLE)
             + (0.75 * CAST(n1v AS DOUBLE) / CAST(cvv AS DOUBLE))
               * (CAST(n1w AS DOUBLE) / CAST(nbb AS DOUBLE)) AS pkn
           FROM big b JOIN cv USING (v) JOIN cw USING (w) CROSS JOIN tb),
         r AS (SELECT v, w, pkn, row_number() OVER (PARTITION BY v
             ORDER BY pkn DESC, w ASC) AS rn FROM p)
         SELECT v, w, round(pkn, 6) AS p_kn FROM r WHERE rn <= 3""",

    "q340_kmv_set_ops" ->
      """WITH toks AS MATERIALIZED (SELECT DISTINCT source, tok FROM (
           SELECT source,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
           FROM documents) WHERE length(tok) > 0),
         hashed AS (SELECT source, tok,
             CAST(CAST(concat('0x', substr(md5(concat('kmv_', tok)), 1, 8))
               AS BIGINT) AS DOUBLE) / 4294967296.0 AS h
           FROM toks),
         sk AS (SELECT source, list(h ORDER BY h) AS kmv FROM (
             SELECT source, h, row_number() OVER (PARTITION BY source
               ORDER BY h ASC, tok ASC) AS rn
             FROM hashed) WHERE rn <= 64 GROUP BY 1),
         pe AS (SELECT a.source AS sa, b.source AS sb,
             list_sort(list_distinct(a.kmv || b.kmv))[1:64] AS merged,
             list_intersect(a.kmv, b.kmv) AS common
           FROM sk a JOIN sk b ON a.source < b.source),
         pe2 AS (SELECT sa, sb, merged[64] AS hk,
             CAST(len(list_intersect(merged, common)) AS INT) AS nmatch
           FROM pe),
         est AS (SELECT sa, sb, round(63.0 / hk, 2) AS est_union,
             round(CAST(nmatch AS DOUBLE) / 64.0, 6) AS est_jaccard
           FROM pe2),
         px AS (SELECT a.source AS sa, b.source AS sb,
             CAST(count(*) AS BIGINT) AS n_both
           FROM toks a JOIN toks b ON a.tok = b.tok AND a.source < b.source
           GROUP BY 1, 2),
         sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS nt
           FROM toks GROUP BY 1)
         SELECT e.sb, e.sa, e.est_union, e.est_jaccard,
           round(CAST(x.n_both AS DOUBLE)
             / CAST(na.nt + nb.nt - x.n_both AS DOUBLE), 6) AS exact_jaccard
         FROM est e JOIN px x ON e.sa = x.sa AND e.sb = x.sb
         JOIN sizes na ON e.sa = na.source
         JOIN sizes nb ON e.sb = nb.source""",

    "q368_anagram_groups" ->
      """WITH codes AS (SELECT DISTINCT
           substr(md5('ph_' || CAST(c_custkey AS VARCHAR)), 1, 8) AS w
           FROM customer),
         k AS (SELECT array_to_string(list_sort(string_split(w, '')), '') AS sig,
             w FROM codes)
         SELECT sig, CAST(count(*) AS BIGINT) AS n_words,
           array_to_string(list_sort(list(DISTINCT w)), '|') AS words
         FROM k GROUP BY 1 HAVING count(*) >= 2""",

    "q387_krippendorff_alpha" ->
      s"""WITH la AS ($langIdSql), lb AS ($ngramLangSql),
         labs AS (SELECT la.pred_lang AS a, lb.pred_lang AS b
           FROM la JOIN lb USING (doc_id)),
         coin AS (SELECT c, k, CAST(count(*) AS BIGINT) AS o FROM (
           SELECT a AS c, b AS k FROM labs
           UNION ALL SELECT b AS c, a AS k FROM labs) GROUP BY 1, 2),
         nc AS (SELECT c, CAST(sum(o) AS BIGINT) AS n_c FROM coin GROUP BY 1),
         tot AS (SELECT CAST(sum(o) AS BIGINT) AS bign,
             CAST(sum(CASE WHEN c <> k THEN o ELSE 0 END) AS BIGINT) AS o_off
           FROM coin),
         sq AS (SELECT sum(n_c * n_c) AS sn2 FROM nc)
         SELECT CAST(bign // 2 AS BIGINT) AS n_units,
           CAST(o_off // 2 AS BIGINT) AS n_disagree,
           round(1.0 - CAST(bign - 1 AS DOUBLE) * CAST(o_off AS DOUBLE)
             / (CAST(bign AS DOUBLE) * CAST(bign AS DOUBLE)
               - CAST(sn2 AS DOUBLE)), 6) AS alpha
         FROM tot CROSS JOIN sq""",

    "q375_bcubed_eval" ->
      s"""WITH sh AS (${OracleHelpers.simhashSql}),
         cells AS (SELECT sh.simhash >> 10 AS c, d.lang AS l,
             CAST(count(*) AS BIGINT) AS n_cl
           FROM sh JOIN documents d USING (doc_id) GROUP BY 1, 2),
         nc AS (SELECT c, CAST(sum(n_cl) AS BIGINT) AS n_c
           FROM cells GROUP BY 1),
         nl AS (SELECT l, CAST(sum(n_cl) AS BIGINT) AS n_l
           FROM cells GROUP BY 1),
         tot AS (SELECT CAST(sum(n_cl) AS BIGINT) AS n FROM cells),
         f AS (SELECT n,
             list_sum(list(round(CAST(n_cl AS DOUBLE) * CAST(n_cl AS DOUBLE)
               / CAST(n_c AS DOUBLE), 9) ORDER BY c, l)) AS sp,
             list_sum(list(round(CAST(n_cl AS DOUBLE) * CAST(n_cl AS DOUBLE)
               / CAST(n_l AS DOUBLE), 9) ORDER BY c, l)) AS sr
           FROM cells JOIN nc USING (c) JOIN nl USING (l) CROSS JOIN tot
           GROUP BY n)
         SELECT n AS n_docs,
           round(sp / CAST(n AS DOUBLE), 6) AS bcubed_p,
           round(sr / CAST(n AS DOUBLE), 6) AS bcubed_r,
           round(2.0 * (sp / CAST(n AS DOUBLE)) * (sr / CAST(n AS DOUBLE))
             / (sp / CAST(n AS DOUBLE) + sr / CAST(n AS DOUBLE)), 6)
             AS bcubed_f1
         FROM f""",

    "q369_sparse_cosine_join" ->
      """WITH toks AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
         dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df
           FROM tf GROUP BY 1 HAVING count(*) BETWEEN 2 AND 50),
         w AS (SELECT doc_id, tf.term,
             CAST(tf.tf AS DOUBLE)
               * ln(CAST(nd AS DOUBLE) / CAST(df AS DOUBLE)) AS w
           FROM tf JOIN dft USING (term) CROSS JOIN nd),
         norms AS (SELECT doc_id,
             sqrt(list_sum(list(round(w * w, 9) ORDER BY term))) AS norm
           FROM w GROUP BY 1),
         dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             list_sum(list(round(a.w * b.w, 9) ORDER BY a.term)) AS dot
           FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         c AS (SELECT doc_a, doc_b,
             round(dot / (na.norm * nb.norm), 6) AS cosine
           FROM dots
           JOIN norms na ON na.doc_id = doc_a
           JOIN norms nb ON nb.doc_id = doc_b)
         SELECT doc_a, doc_b, cosine FROM c WHERE cosine >= 0.3""",

    "q395_fleiss_kappa" ->
      """WITH v AS (SELECT
           (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
           + (CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) >= 55
               THEN 1 ELSE 0 END)
           + (CASE WHEN len(list_distinct(
                 regexp_split_to_array(trim(text), '\s+'))) >= 27
               THEN 1 ELSE 0 END) AS m
           FROM documents),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(m) AS BIGINT) AS sm,
             CAST(sum(m * m + (3 - m) * (3 - m)) AS BIGINT) AS sq
           FROM v),
         b AS (SELECT n_docs,
             (CAST(sq AS DOUBLE) - 3.0 * CAST(n_docs AS DOUBLE))
               / (6.0 * CAST(n_docs AS DOUBLE)) AS pbar,
             CAST(sm AS DOUBLE) / (3.0 * CAST(n_docs AS DOUBLE)) AS p1
           FROM a)
         SELECT n_docs, round(pbar, 6) AS p_bar,
           round(p1 * p1 + (1.0 - p1) * (1.0 - p1), 6) AS p_e,
           round((pbar - (p1 * p1 + (1.0 - p1) * (1.0 - p1)))
             / (1.0 - (p1 * p1 + (1.0 - p1) * (1.0 - p1))), 6)
             AS fleiss_kappa
         FROM b""",

    "q404_lexical_richness" ->
      """WITH toks AS (SELECT source,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS cnt
           FROM toks GROUP BY 1, 2),
         a AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS v,
             CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
             CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
             sum(CAST(cnt AS HUGEINT) * CAST(cnt AS HUGEINT)) AS sc2
           FROM tf GROUP BY 1)
         SELECT source, n AS n_tokens, v AS n_types,
           round(10000.0 * (CAST(sc2 AS DOUBLE) - CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 4) AS yules_k,
           round(CAST(v AS DOUBLE) / sqrt(CAST(n AS DOUBLE)), 4)
             AS guiraud_r,
           round(CAST(v2 AS DOUBLE) / CAST(v AS DOUBLE), 6) AS sichel_s,
           CASE WHEN v1 < v THEN
             round(100.0 * ln(CAST(n AS DOUBLE))
               / (1.0 - CAST(v1 AS DOUBLE) / CAST(v AS DOUBLE)), 4)
           ELSE NULL END AS honore_h
         FROM a""",

    "q405_coleman_liau" ->
      """WITH d AS (SELECT source,
           CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
             AS BIGINT) AS l,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w
           FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS n_words,
           round(CAST(sum(l) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 4)
             AS avg_word_len,
           round(0.0588
               * (100.0 * CAST(sum(l) AS DOUBLE) / CAST(sum(w) AS DOUBLE))
             - 0.296
               * (100.0 * CAST(count(*) AS DOUBLE) / CAST(sum(w) AS DOUBLE))
             - 15.8, 4) AS cli
         FROM d GROUP BY 1""",

    "q406_term_dispersion" ->
      """WITH toks AS (SELECT source,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS cnt
           FROM toks GROUP BY 1, 2),
         tok AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS ntok
           FROM tf GROUP BY 1),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tt FROM tf),
         trm AS (SELECT term, CAST(sum(cnt) AS BIGINT) AS ct
           FROM tf GROUP BY 1 HAVING sum(cnt) >= 50),
         d AS (SELECT trm.term, trm.ct, tok.source,
             round(abs(CAST(coalesce(tf.cnt, 0) AS DOUBLE)
                 / CAST(trm.ct AS DOUBLE)
               - CAST(tok.ntok AS DOUBLE) / CAST(tt AS DOUBLE)), 9) AS d
           FROM trm CROSS JOIN tok
           LEFT JOIN tf ON tf.term = trm.term AND tf.source = tok.source
           CROSS JOIN tot)
         SELECT term, ct AS n_occurrences,
           list_sum(list(d ORDER BY source)) / 2.0 AS dp
         FROM d GROUP BY 1, 2""",

    "q414_v_measure" ->
      s"""WITH sh AS (${OracleHelpers.simhashSql}),
         cells AS (SELECT sh.simhash >> 10 AS c, d.lang AS l,
             CAST(count(*) AS BIGINT) AS n_cl
           FROM sh JOIN documents d USING (doc_id) GROUP BY 1, 2),
         nc AS (SELECT c, CAST(sum(n_cl) AS BIGINT) AS n_c
           FROM cells GROUP BY 1),
         nl AS (SELECT l, CAST(sum(n_cl) AS BIGINT) AS n_l
           FROM cells GROUP BY 1),
         tot AS (SELECT CAST(sum(n_cl) AS BIGINT) AS n FROM cells),
         conds AS (SELECT n,
             list_sum(list(round(CAST(n_cl AS DOUBLE) / CAST(n AS DOUBLE)
               * ln(CAST(n_cl AS DOUBLE) / CAST(n_c AS DOUBLE)), 9)
               ORDER BY c, l)) AS fck,
             list_sum(list(round(CAST(n_cl AS DOUBLE) / CAST(n AS DOUBLE)
               * ln(CAST(n_cl AS DOUBLE) / CAST(n_l AS DOUBLE)), 9)
               ORDER BY c, l)) AS fkc
           FROM cells JOIN nc USING (c) JOIN nl USING (l) CROSS JOIN tot
           GROUP BY n),
         hc AS (SELECT list_sum(list(round(CAST(n_l AS DOUBLE)
             / CAST(n AS DOUBLE)
             * ln(CAST(n_l AS DOUBLE) / CAST(n AS DOUBLE)), 9)
             ORDER BY l)) AS fc
           FROM nl CROSS JOIN tot),
         hk AS (SELECT list_sum(list(round(CAST(n_c AS DOUBLE)
             / CAST(n AS DOUBLE)
             * ln(CAST(n_c AS DOUBLE) / CAST(n AS DOUBLE)), 9)
             ORDER BY c)) AS fk
           FROM nc CROSS JOIN tot),
         v AS (SELECT n, 1.0 - (-(fck)) / (-(fc)) AS h,
             1.0 - (-(fkc)) / (-(fk)) AS cm
           FROM conds CROSS JOIN hc CROSS JOIN hk)
         SELECT n AS n_docs, round(h, 6) AS homogeneity,
           round(cm, 6) AS completeness,
           round(2.0 * h * cm / (h + cm), 6) AS v_measure
         FROM v""",

    "q415_umass_coherence" ->
      """WITH dt AS (SELECT DISTINCT source, doc_id, t AS term FROM
           (SELECT source, doc_id,
              unnest(regexp_split_to_array(trim(text), '\s+')) AS t
            FROM documents)),
         tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS df
           FROM dt GROUP BY 1, 2),
         top AS (SELECT source, term, rk, df FROM
             (SELECT source, term, df,
               row_number() OVER (PARTITION BY source
                 ORDER BY df DESC, term ASC) AS rk
             FROM tf)
           WHERE rk <= 5),
         pairs AS (SELECT a.source, a.rk AS ri, b.rk AS rj, b.df AS dfj
           FROM top a JOIN top b ON a.source = b.source AND a.rk < b.rk),
         pres AS (SELECT dt.source, dt.doc_id, top.rk
           FROM dt JOIN top ON dt.source = top.source AND dt.term = top.term),
         co AS (SELECT a.source, a.rk AS ri, b.rk AS rj,
             CAST(count(*) AS BIGINT) AS dij
           FROM pres a JOIN pres b
             ON a.source = b.source AND a.doc_id = b.doc_id AND a.rk < b.rk
           GROUP BY 1, 2, 3),
         sc AS (SELECT p.source, p.ri, p.rj,
             round(ln((CAST(coalesce(co.dij, 0) AS DOUBLE) + 1.0)
               / CAST(p.dfj AS DOUBLE)), 9) AS t
           FROM pairs p LEFT JOIN co
             ON co.source = p.source AND co.ri = p.ri AND co.rj = p.rj)
         SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
           list_sum(list(t ORDER BY ri, rj)) AS coherence
         FROM sc GROUP BY 1""",

    "q421_ess_token_weights" ->
      """WITH d AS (SELECT source,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w
           FROM documents)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS n_tokens,
           round((CAST(sum(w) AS DOUBLE) * CAST(sum(w) AS DOUBLE))
             / CAST(sum(CAST(w AS HUGEINT) * CAST(w AS HUGEINT)) AS DOUBLE),
             4) AS ess,
           round((CAST(sum(w) AS DOUBLE) * CAST(sum(w) AS DOUBLE))
             / CAST(sum(CAST(w AS HUGEINT) * CAST(w AS HUGEINT)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS ess_ratio
         FROM d GROUP BY 1""",

    "q432_chi2_terms" -> {
      val det = """(CAST(a AS HUGEINT) * CAST(nn - nl - df + a AS HUGEINT)
        - CAST(nl - a AS HUGEINT) * CAST(df - a AS HUGEINT))"""
      s"""WITH dt AS (SELECT DISTINCT lang, doc_id, t AS term FROM
           (SELECT lang, doc_id,
              unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
            FROM documents)),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
         langn AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
           FROM documents GROUP BY 1),
         tl AS (SELECT term, lang, CAST(count(*) AS BIGINT) AS a
           FROM dt GROUP BY 1, 2),
         tdf AS (SELECT term, CAST(sum(a) AS BIGINT) AS df
           FROM tl GROUP BY 1),
         grid AS (SELECT tdf.term, langn.lang, langn.nl, tdf.df, nn.nn,
             coalesce(tl.a, 0) AS a
           FROM tdf CROSS JOIN langn
           LEFT JOIN tl ON tl.term = tdf.term AND tl.lang = langn.lang
           CROSS JOIN nn
           WHERE tdf.df >= 20 AND tdf.df < nn.nn),
         scored AS (SELECT lang, term, a AS n_in_lang,
             CAST(nn AS DOUBLE)
               * CAST($det AS DOUBLE) * CAST($det AS DOUBLE)
               / (CAST(nl AS DOUBLE) * CAST(nn - nl AS DOUBLE)
                 * CAST(df AS DOUBLE) * CAST(nn - df AS DOUBLE)) AS chi2
           FROM grid),
         rk AS (SELECT lang, term, n_in_lang, chi2,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY chi2 DESC, term ASC) AS BIGINT) AS rk
           FROM scored)
         SELECT lang, rk, term, n_in_lang, round(chi2, 4) AS chi2
         FROM rk WHERE rk <= 3"""
    },

    // ── Readability / intra-doc-structure tier (round 11) ───────────────

    "q475_readability_suite" ->
      """WITH words AS (SELECT source, doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         FROM documents),
         wc AS (SELECT source, doc_id,
             CAST(count(*) AS BIGINT) AS nw,
             CAST(sum(length(w)) AS BIGINT) AS nl,
             CAST(sum(CASE WHEN len(regexp_extract_all(w, '[aeiouy]+')) >= 3
               THEN 1 ELSE 0 END) AS BIGINT) AS nc
           FROM words GROUP BY 1, 2),
         st AS (SELECT source, doc_id,
             greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS ns
           FROM documents),
         agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nw) AS BIGINT) AS tw, CAST(sum(nl) AS BIGINT) AS tl,
             CAST(sum(nc) AS BIGINT) AS tc, CAST(sum(ns) AS BIGINT) AS ts
           FROM wc JOIN st USING (source, doc_id) GROUP BY 1)
         SELECT source, n_docs,
           round(0.4 * (CAST(tw AS DOUBLE) / CAST(ts AS DOUBLE)
             + 100.0 * CAST(tc AS DOUBLE) / CAST(tw AS DOUBLE)), 4)
             AS gunning_fog,
           round(1.043 * sqrt(CAST(tc AS DOUBLE) * 30.0
             / CAST(ts AS DOUBLE)) + 3.1291, 4) AS smog,
           round(4.71 * CAST(tl AS DOUBLE) / CAST(tw AS DOUBLE)
             + 0.5 * CAST(tw AS DOUBLE) / CAST(ts AS DOUBLE) - 21.43, 4)
             AS ari
         FROM agg""",

    "q478_intra_doc_repeat" ->
      """WITH tk AS (SELECT source, doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS w
         FROM documents),
         grams AS (SELECT source, doc_id,
             array_to_string(w[i:i+7], ' ') AS g8
           FROM tk, UNNEST(range(1, len(w) - 6)) AS t(i)),
         rep AS (SELECT source, doc_id, CAST(max(m) AS BIGINT) AS max_rep
           FROM (SELECT source, doc_id, g8, count(*) AS m
                 FROM grams GROUP BY 1, 2, 3)
           GROUP BY 1, 2)
         SELECT source, CAST(least(max_rep, 4) AS BIGINT) AS rep_level,
           CAST(count(*) AS BIGINT) AS n_docs
         FROM rep GROUP BY 1, 2""",

    "q479_ttr_curve" ->
      """WITH tk AS (SELECT source, doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS w
         FROM documents),
         b AS (SELECT CAST(unnest([50, 100, 200]) AS BIGINT) AS budget),
         perdoc AS (SELECT source, doc_id, budget,
             CAST(len(list_distinct(w[1:CAST(budget AS INT)])) AS BIGINT)
               AS types
           FROM tk CROSS JOIN b WHERE len(w) >= budget)
         SELECT source, budget, CAST(count(*) AS BIGINT) AS n_docs,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(types AS DOUBLE) / CAST(budget AS DOUBLE)
               ORDER BY doc_id)), (p, q) -> p + q)
             / CAST(count(*) AS DOUBLE) AS mean_ttr
         FROM perdoc GROUP BY 1, 2""",

    "q480_bhattacharyya" ->
      """WITH mx AS (SELECT CAST(max(n_chars) AS BIGINT) AS mx
           FROM documents),
         banded AS (SELECT source,
             CAST(least(floor(n_chars * 64 / (mx + 1)), 63) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS c
           FROM documents CROSS JOIN mx GROUP BY 1, 2),
         corp AS (SELECT b, CAST(sum(c) AS BIGINT) AS cc
           FROM banded GROUP BY 1),
         nsrc AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
           FROM banded GROUP BY 1),
         nall AS (SELECT CAST(sum(c) AS BIGINT) AS na FROM banded),
         terms AS (SELECT banded.source, ns, banded.b,
             sqrt((CAST(c AS DOUBLE) / CAST(ns AS DOUBLE))
               * (CAST(cc AS DOUBLE) / CAST(na AS DOUBLE))) AS t
           FROM banded JOIN corp USING (b) JOIN nsrc USING (source)
           CROSS JOIN nall)
         SELECT source, ns AS n_docs,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(t ORDER BY b)), (p, q) -> p + q) AS bhattacharyya_coef,
           round(-ln(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(t ORDER BY b)), (p, q) -> p + q)), 6)
             AS bhattacharyya_dist
         FROM terms GROUP BY 1, 2""",

    // ── Round-12 tier ───────────────────────────────────────────────────

    "q491_pmi_bigrams" ->
      """WITH pos AS (SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS term,
           generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) - 1
             AS pos
         FROM documents),
         uni AS (SELECT term, CAST(count(*) AS BIGINT) AS cu
           FROM pos GROUP BY 1),
         bi AS (SELECT a.term AS w1, b.term AS w2,
             CAST(count(*) AS BIGINT) AS cxy
           FROM pos a JOIN pos b
             ON a.doc_id = b.doc_id AND a.pos = b.pos - 1
           GROUP BY 1, 2 HAVING count(*) >= 5),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM pos),
         nb AS (SELECT CAST(sum(cxy) AS BIGINT) AS nbi FROM bi)
         SELECT w1, w2, cxy,
           round(ln((CAST(cxy AS DOUBLE) / CAST(nbi AS DOUBLE))
             / ((CAST(c1.cu AS DOUBLE) / CAST(nu AS DOUBLE))
               * (CAST(c2.cu AS DOUBLE) / CAST(nu AS DOUBLE)))), 6)
             + CAST(0.0 AS DOUBLE) AS pmi
         FROM bi
         JOIN uni c1 ON bi.w1 = c1.term
         JOIN uni c2 ON bi.w2 = c2.term
         CROSS JOIN tot CROSS JOIN nb
         ORDER BY pmi DESC, w1, w2 LIMIT 20""",

    "q494_cohens_kappa" ->
      """WITH cls AS (SELECT lang = 'en' AS a,
           len(list_filter(['the', 'be', 'to', 'of', 'and', 'that', 'have',
             'with'],
             w -> list_contains(regexp_split_to_array(trim(text), '\s+'), w)))
             >= 2 AS b
         FROM documents),
         t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
               AS n10,
             CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
               AS n01,
             CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
               AS n00
           FROM cls)
         SELECT n AS n_docs, n11, n10, n01, n00,
           ((CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / CAST(n AS DOUBLE)
             - ((CAST(n11 AS DOUBLE) + CAST(n10 AS DOUBLE))
                 * (CAST(n11 AS DOUBLE) + CAST(n01 AS DOUBLE))
               + (CAST(n01 AS DOUBLE) + CAST(n00 AS DOUBLE))
                 * (CAST(n10 AS DOUBLE) + CAST(n00 AS DOUBLE)))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
           / (1.0
             - ((CAST(n11 AS DOUBLE) + CAST(n10 AS DOUBLE))
                 * (CAST(n11 AS DOUBLE) + CAST(n01 AS DOUBLE))
               + (CAST(n01 AS DOUBLE) + CAST(n00 AS DOUBLE))
                 * (CAST(n10 AS DOUBLE) + CAST(n00 AS DOUBLE)))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS kappa
         FROM t""",

    "q496_novelty_rate" ->
      """WITH toks AS (SELECT doc_id,
           regexp_split_to_array(trim(text), '\s+') AS w
         FROM documents),
         sh AS (SELECT DISTINCT CAST(doc_id AS BIGINT) // 100 AS blk,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(w) - 1, 1)),
               i -> array_to_string(w[i:i+2], ' ')))) AS g
           FROM toks WHERE len(w) >= 3),
         firstb AS (SELECT g, CAST(min(blk) AS BIGINT) AS fb
           FROM sh GROUP BY 1),
         per AS (SELECT blk, CAST(count(*) AS BIGINT) AS n_shingles
           FROM sh GROUP BY 1),
         novel AS (SELECT fb AS blk, CAST(count(*) AS BIGINT) AS n_novel
           FROM firstb GROUP BY 1)
         SELECT per.blk AS block, n_shingles,
           CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
           CAST(coalesce(n_novel, 0) AS DOUBLE)
             / CAST(n_shingles AS DOUBLE) AS novelty_rate
         FROM per LEFT JOIN novel ON per.blk = novel.blk""",

    "q497_mcnemar" ->
      """WITH cls AS (SELECT lang = 'en' AS a,
           len(list_filter(['the', 'be', 'to', 'of', 'and', 'that', 'have',
             'with'],
             w -> list_contains(regexp_split_to_array(trim(text), '\s+'), w)))
             >= 2 AS b
         FROM documents),
         t AS (SELECT
             CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
               AS b10,
             CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
               AS c01
           FROM cls)
         SELECT b10 AS n_a_only, c01 AS n_b_only,
           CASE WHEN b10 + c01 > 0 THEN
             (abs(CAST(b10 AS DOUBLE) - CAST(c01 AS DOUBLE)) - 1.0)
               * (abs(CAST(b10 AS DOUBLE) - CAST(c01 AS DOUBLE)) - 1.0)
               / (CAST(b10 AS DOUBLE) + CAST(c01 AS DOUBLE))
           ELSE 0.0 END AS mcnemar_chi2
         FROM t""",
  )
}
