package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data pipelines (extension surface,
  * SURVEY.md §2.11): quality stats, language-ID heuristic, token counting,
  * document fingerprinting. All single-pass, codegen'd column expressions —
  * per-document work with no shuffle except the final aggregations.
  */
object TextAnalysis {
  import TextOps._

  val queries: Map[String, Q] = Map(
    // ---- per-document quality stats
    "x05_text_stats" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("ws", words(col("text")))
        .withColumn("n_words", size(col("ws")).cast(LongType))
        .withColumn("n_stop",
          size(filter(col("ws"), w => w === "the" || w === "a")).cast(LongType))
        .select(
          col("doc_id"),
          col("n_words"),
          col("n_stop"),
          (col("n_stop").cast(DoubleType) / col("n_words")).as("stop_ratio"),
          (length(replace(col("text"), lit(" "), lit(""))).cast(DoubleType) / col("n_words"))
            .as("avg_word_len"))
    },

    // ---- corpus profile per language label
    "x06_lang_profile" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast(LongType).as("total_chars"),
          (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"),
          countDistinct(col("source")).as("n_sources"))
    },

    // ---- language-ID heuristic (stopword-marker scoring; deterministic
    // CASE so the oracle can replay the identical classifier)
    "x07_lang_id" -> { (s, dir) =>
      val padded = concat(lit(" "), col("text"), lit(" "))
      def occurrences(marker: String) =
        ((length(padded) - length(replace(padded, lit(s" $marker "), lit(" "))))
          / (marker.length + 1)).cast(LongType)
      Tables(s, dir, "documents")
        .withColumn("n_the", occurrences("the"))
        .withColumn("n_a", occurrences("a"))
        .withColumn("predicted",
          when(col("n_the") >= 3, "en_like")
            .when(col("n_the") >= 1, "en_trace")
            .when(col("n_a") >= 1, "article_only")
            .otherwise("unknown"))
        .groupBy(col("predicted"))
        .agg(count(lit(1)).as("n_docs"))
    },

    // ---- token counting: whitespace + BPE-ish regex segmentation
    "x08_token_count" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          size(words(col("text"))).cast(LongType).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast(LongType).as("re_tokens"))
    },

    // ---- document fingerprinting: content hash + prefix bucket
    "x09_fingerprint" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          md5(lower(col("text"))).as("fp"),
          substring(md5(lower(col("text"))), 1, 4).as("bucket"))
    },

    // ---- deterministic stratified hash-sampling (training-data mixing):
    // per-stratum rates applied by thresholding a content-derived hash
    // fraction — reproducible across runs, executors, and engines (no RNG
    // state), the only sampling discipline that audits cleanly at 100 TB.
    // TABLESAMPLE-style engine sampling is nondeterministic by design;
    // this is the pipeline-grade alternative, and the oracle replays it.
    "x24_stratified_sample" -> { (s, dir) =>
      val frac = conv(substring(md5(concat(lit("mix-v1:"),
        col("doc_id").cast(StringType))), 1, 8), 16, 10)
        .cast(LongType).cast(DoubleType) / 4294967296.0
      val rate = when(col("lang") === "en", 0.5).otherwise(0.25)
      Tables(s, dir, "documents")
        .withColumn("keep", frac < rate)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("keep"), 1)).as("n_sampled"),
          min(when(col("keep"), col("doc_id"))).as("first_kept"))
    },

    // ---- sequence packing (training-data batch layout): assign every
    // document a global token offset range and a fixed-capacity training
    // bin by cumulative end-offset. The running total is the distributed
    // prefix sum [[graft.ops.Positions.withRunningTotal]] — range-exchange
    // sort + per-partition scan, NOT the `sum(w) OVER (ORDER BY ...)`
    // window, which plans an Exchange SinglePartition and serializes the
    // whole corpus through one task. The oracle replays exactly that
    // window formulation in DuckDB (same math, single-node engine).
    "x37_sequence_pack" -> { (s, dir) =>
      val binTokens = 2048L
      val weighted = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(words(col("text"))).cast(LongType).as("n_tokens"))
      graft.ops.Positions
        .withRunningTotal(weighted, Seq(col("doc_id")), "n_tokens", "seq_end")
        .select(
          col("doc_id"),
          col("n_tokens"),
          (col("seq_end") - col("n_tokens")).as("seq_start"),
          col("seq_end"),
          expr(s"CAST((seq_end - 1) DIV $binTokens AS BIGINT)").as("bin"))
    },

    // ---- winnowing fingerprints (MOSS-style rolling k-gram selection):
    // hash every 8-char gram, keep the MINIMUM of each 4-gram sliding
    // window — the classic near-copy detection fingerprint whose density
    // is position-independent. Gram hash = first 8 md5 hex digits (same
    // portable-hash trick as x03, so the WHOLE pipeline has a SQL oracle).
    // Explode + window-min + distinct: shuffle-bounded per doc_id, scales
    // like any per-document pipeline.
    "x22_winnow_fingerprint" -> { (s, dir) =>
      // winnowing is per-document-local: gram hashes, sliding minima, and
      // the distinct-selection run inside the fused native
      // [[graft.functions.WinnowFingerprints]] expression — zero shuffle,
      // one pass, no per-gram substring/hex/conv allocation (the
      // higher-order-function composition it replaced allocated all three
      // per gram and measured ~2.5× slower; the explode+Window formulation
      // before that also shuffled the whole gram table). Map-only at any SF.
      Tables(s, dir, "documents")
        .filter(length(col("text")) >= 11) // at least one full 4-gram window
        .withColumn("fps", graft.functions.WinnowFingerprints.winnowFps(col("text")))
        .select(
          col("doc_id"),
          size(col("fps")).cast(LongType).as("n_fp"),
          aggregate(col("fps"), lit(0L), (acc, x) => acc + x).as("fp_sum"),
          array_min(col("fps")).as("fp_min"))
    },

    // ---- per-source document caps (the per-domain cap every crawl
    // pipeline applies before mixing: no single domain may contribute more
    // than K documents). Selection order is a salted uniform hash of the
    // doc id — a deterministic "random K of each domain" both engines
    // replay exactly, unlike TABLESAMPLE. Scale shape: the window
    // partitions by source, so parallelism is domain-count-bounded (a
    // 100 TB crawl has millions of domains); for a pathological hot domain
    // the uniform order key admits a lossless-in-practice candidate
    // prefilter (keep hash-fraction < c·K/|domain| before ranking), which
    // this bench-scale corpus doesn't need.
    "x39_source_cap" -> { (s, dir) =>
      val capK = 10
      val w = Window.partitionBy(col("source")).orderBy(
        md5(concat(lit("cap-v1:"), col("doc_id").cast(StringType))).asc_nulls_first,
        col("doc_id").asc_nulls_first)
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= capK)
    },

    // ---- composite quality filter (Gopher-style rules, Rae et al. 2021):
    // word-count band, mean-word-length band, stopword floor, and a
    // distinct-ratio repetition screen, each reported as the FIRST failing
    // rule so downstream can audit drop reasons. Pure per-document column
    // arithmetic — map-only, no shuffle, embarrassingly parallel at any
    // corpus size. All ratios are exact-integer divisions evaluated in
    // DOUBLE on both engines, so the thresholds compare bit-identically.
    "x41_quality_filter" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("ws", words(col("text")))
        .withColumn("n_words", size(col("ws")).cast(LongType))
        .withColumn("n_distinct", size(array_distinct(col("ws"))).cast(LongType))
        .withColumn("n_stop",
          size(filter(col("ws"), w => w === "the" || w === "a")).cast(LongType))
        .withColumn("avg_wl",
          length(replace(col("text"), lit(" "), lit(""))).cast(DoubleType)
            / col("n_words"))
        .withColumn("reason",
          when(col("n_words") < 10 || col("n_words") > 5000, "word_count")
            .when(col("avg_wl") < 2.0 || col("avg_wl") > 12.0, "word_length")
            .when(col("n_stop").cast(DoubleType) / col("n_words") < 0.01, "stopword_ratio")
            .when(col("n_distinct").cast(DoubleType) / col("n_words") < 0.3, "repetition")
            .otherwise("ok"))
        .select(col("doc_id"), col("n_words"), col("reason"),
          (col("reason") === "ok").as("keep"))
    },

    // ---- blocklist scrubbing / PII-shaped redaction: globally rewrite
    // every blocklisted term to a fixed tag, report the per-document hit
    // count, the redacted length delta, and an md5 of the REWRITTEN text so
    // the oracle certifies the rewrite byte-for-byte (not just the counts).
    // The real pipeline swaps the term list for email/phone/SSN patterns —
    // mechanics identical. Pattern discipline: word-boundary anchors plus
    // an alternation of non-overlapping literals, the regex subset where
    // Java's leftmost-first and RE2's leftmost-longest agree. Map-only, no
    // shuffle — embarrassingly parallel at any corpus size.
    "x43_redact" -> { (s, dir) =>
      val pat = "\\b(customer|spark|vector)\\b"
      Tables(s, dir, "documents")
        .withColumn("n_hits",
          size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast(LongType))
        .withColumn("red", regexp_replace(col("text"), pat, "<TERM>"))
        .select(
          col("doc_id"),
          col("n_hits"),
          (length(col("red")) - length(col("text"))).cast(LongType).as("len_delta"),
          md5(col("red")).as("red_fp"))
    })

  val oracles: Map[String, String] = Map(
    "x05_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_filter(string_split(text, ' '),
        |       w -> w = 'the' OR w = 'a')) AS BIGINT) AS n_stop,
        |  CAST(len(list_filter(string_split(text, ' '),
        |       w -> w = 'the' OR w = 'a')) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS stop_ratio,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_word_len
        |FROM documents
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "x06_lang_profile" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        |  COUNT(DISTINCT source) AS n_sources
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang ASC NULLS FIRST""".stripMargin,

    "x07_lang_id" ->
      """WITH scored AS (
        |  SELECT
        |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ' '))) / 4 AS n_the,
        |    (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ' '))) / 2 AS n_a
        |  FROM documents)
        |SELECT CASE WHEN n_the >= 3 THEN 'en_like'
        |            WHEN n_the >= 1 THEN 'en_trace'
        |            WHEN n_a >= 1 THEN 'article_only'
        |            ELSE 'unknown' END AS predicted,
        |  COUNT(*) AS n_docs
        |FROM scored
        |GROUP BY 1
        |ORDER BY predicted ASC NULLS FIRST""".stripMargin,

    "x08_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens
        |FROM documents
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "x09_fingerprint" ->
      """SELECT doc_id, md5(lower(text)) AS fp,
        |  substring(md5(lower(text)), 1, 4) AS bucket
        |FROM documents
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "x37_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seq_end
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  seq_end - n_tokens AS seq_start, seq_end,
        |  CAST((seq_end - 1) // 2048 AS BIGINT) AS bin
        |FROM r
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "x24_stratified_sample" ->
      """WITH f AS (
        |  SELECT doc_id, lang, md5('mix-v1:' || CAST(doc_id AS VARCHAR)) AS hx
        |  FROM documents),
        |s AS (SELECT doc_id, lang,
        |  CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 268435456
        |     + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 16777216
        |     + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 1048576
        |     + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 65536
        |     + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 4096
        |     + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) * 256
        |     + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1) * 16
        |     + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1) AS DOUBLE)
        |    / 4294967296.0 AS frac
        |  FROM f),
        |k AS (SELECT doc_id, lang,
        |  frac < (CASE WHEN lang = 'en' THEN 0.5 ELSE 0.25 END) AS keep FROM s)
        |SELECT lang, COUNT(*) AS n_docs,
        |  COUNT(*) FILTER (WHERE keep) AS n_sampled,
        |  MIN(doc_id) FILTER (WHERE keep) AS first_kept
        |FROM k
        |GROUP BY lang
        |ORDER BY lang ASC NULLS FIRST""".stripMargin,

    "x22_winnow_fingerprint" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(i AS INT) AS pos, len(text) AS L,
        |    md5(substr(text, CAST(i AS INT), 8)) AS hx
        |  FROM (SELECT doc_id, text, unnest(generate_series(1, len(text) - 7)) AS i
        |        FROM documents WHERE len(text) >= 8)),
        |h AS (SELECT doc_id, pos, L, CAST(
        |    (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 268435456
        |  + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 16777216
        |  + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 1048576
        |  + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 65536
        |  + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 4096
        |  + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) * 256
        |  + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1) * 16
        |  + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1) AS BIGINT) AS h
        |  FROM g),
        |m AS (SELECT doc_id, pos, L,
        |  MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS winmin
        |  FROM h)
        |SELECT doc_id, COUNT(DISTINCT winmin) AS n_fp,
        |  CAST(SUM(DISTINCT winmin) AS BIGINT) AS fp_sum,
        |  CAST(MIN(winmin) AS BIGINT) AS fp_min
        |FROM m WHERE pos <= L - 10
        |GROUP BY doc_id
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "x39_source_cap" ->
      """SELECT doc_id, source, rn FROM (
        |  SELECT doc_id, source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5('cap-v1:' || CAST(doc_id AS VARCHAR)) ASC NULLS FIRST,
        |               doc_id ASC NULLS FIRST) AS INT) AS rn
        |  FROM documents)
        |WHERE rn <= 10
        |ORDER BY source ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,

    "x41_quality_filter" ->
      """WITH b AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
        |s AS (SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
        |    CAST(len(list_filter(ws, w -> w = 'the' OR w = 'a')) AS BIGINT) AS n_stop,
        |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(ws) AS avg_wl
        |  FROM b),
        |r AS (SELECT doc_id, n_words,
        |    CASE WHEN n_words < 10 OR n_words > 5000 THEN 'word_count'
        |         WHEN avg_wl < 2.0 OR avg_wl > 12.0 THEN 'word_length'
        |         WHEN CAST(n_stop AS DOUBLE) / n_words < 0.01 THEN 'stopword_ratio'
        |         WHEN CAST(n_distinct AS DOUBLE) / n_words < 0.3 THEN 'repetition'
        |         ELSE 'ok' END AS reason
        |  FROM s)
        |SELECT doc_id, n_words, reason, (reason = 'ok') AS keep
        |FROM r
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    "x43_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(customer|spark|vector)\b'))
        |    AS BIGINT) AS n_hits,
        |  CAST(length(regexp_replace(text, '\b(customer|spark|vector)\b',
        |    '<TERM>', 'g')) - length(text) AS BIGINT) AS len_delta,
        |  md5(regexp_replace(text, '\b(customer|spark|vector)\b',
        |    '<TERM>', 'g')) AS red_fp
        |FROM documents
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)
}
