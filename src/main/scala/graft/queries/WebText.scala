package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.jobs.LinkRank
import graft.util.{QueryDef, Staging, Tables}
import graft.warc.{WarcRead, WarcWrite}

/** Web-text pipeline operators over the documents table — the
  * Common-Crawl-facing half of the north rule (input_hint: pages carry
  * `html BINARY` and the engine must preserve byte-identical extracted
  * text per url). Each gate synthesizes its web-shaped input from
  * `documents` with engine-common SQL (pure integer / string builtins),
  * so the DuckDB oracle re-derives the same bytes and the compare is
  * end-to-end exact.
  *
  * Single-sourcing: the error-prone shared formulas (HTML strip chain,
  * URL canonicalization, BM25 integer scoring) are rendered from ONE
  * template into both engines' dialects via tiny `Dialect` shims
  * (regexp_replace global flag, integer division, list sort) — a tweak
  * cannot desynchronize gate and oracle. Every regex is backslash-free
  * (Spark SQL string literals eat `\`; DuckDB's don't): whitespace is
  * pre-normalized with chr()-based replaces so `.` / `[ ]+` classes
  * suffice, and `?` is escaped as the class `[?]`.
  */
object WebText {

  /** Engine dialect shims for the shared SQL templates. */
  private[queries] final case class Dialect(
      rr: (String, String, String) => String, // global regexp_replace
      idiv: (String, String) => String, // integer division
      sortJoin: String => String) // split on '&', sort, re-join

  private[queries] val sparkD = Dialect(
    rr = (e, p, r) => s"regexp_replace($e, '$p', '$r')",
    idiv = (a, b) => s"($a DIV $b)",
    sortJoin = e => s"array_join(sort_array(split($e, '&')), '&')")

  private[queries] val duckD = Dialect(
    rr = (e, p, r) => s"regexp_replace($e, '$p', '$r', 'g')",
    idiv = (a, b) => s"($a // $b)",
    sortJoin = e => s"array_to_string(list_sort(string_split($e, '&')), '&')")

  /** Stage the HTTP-framed WARC archives (plain + CC per-record-gzip)
    * once per (session, sfDir) — shared by q_warc_http (through-archive
    * extraction over both layouts) and q_warc_cdx (index + random
    * access over the gz layout). */
  private def stagedHttpWarc(s: SparkSession, d: String): (String, String) = {
    val dir = Staging.dir("warc_http", d)
    val marker = dir.resolve("_STAGED")
    val plainDir = dir.resolve("plain").toString
    val gzDir = dir.resolve("gz").toString
    if (!java.nio.file.Files.exists(marker)) {
      val pages = Tables.t(s, d, "documents")
        .select(
          concat(lit("https://example.test/d/"), col("doc_id")).as("url"),
          ((col("doc_id") * 7L + 1700000000L) * 1000000L).as("ts_us"),
          expr(htmlSyn).cast("binary").as("payload"))
        .repartition(4, col("url"))
      WarcWrite.write(pages, plainDir, gzip = false, http = true)
      WarcWrite.write(pages, gzDir, gzip = true, http = true)
      java.nio.file.Files.createFile(marker)
    }
    (plainDir, gzDir)
  }

  /** Deterministic PII-bearing text: each document gains a contact
    * email, a dashed US-style phone, and (doc_id % 3 == 0) a second
    * email mid-sentence. Engine-common SQL. */
  private[queries] val piiSyn: String =
    "text || ' contact user' || CAST(doc_id AS STRING) || '@mail' || " +
      "CAST(doc_id % 7 AS STRING) || '.example or call ' || " +
      "'800-555-0' || CAST(doc_id % 10 AS STRING) || " +
      "CAST(doc_id % 7 AS STRING) || CAST(doc_id % 3 AS STRING) || " +
      "CASE WHEN doc_id % 3 = 0 THEN ' cc admin@ops.example now' " +
      "ELSE '' END"

  // ---------------------------------------------------------------- HTML

  /** Deterministic page markup around each document's text: head noise
    * (script / style / comment, varying by doc_id % 3), body markup and
    * pre-escaped entities. Engine-common SQL. */
  private[queries] val htmlSyn: String = {
    val noise =
      "CASE doc_id % 3 " +
        "WHEN 0 THEN '<script type=\"text/javascript\">var x = 1 && 2; if (x<3) { go(\"now\"); }</script>' " +
        "WHEN 1 THEN '<style>p > a { color: #fff; }</style>' " +
        "ELSE '<!-- hidden <b>comment</b> -->' END"
    "'<html><head><title>Doc ' || CAST(doc_id AS STRING) || '</title>' || " +
      noise +
      " || '</head><body><h1 class=\"t\">Doc ' || CAST(doc_id AS STRING) || " +
      "'</h1><p>' || text || " +
      "'</p><p>&lt;escaped&gt; &amp; &quot;quoted&quot; &#39;s</p></body></html>'"
  }

  /** Pipeline variant of [[htmlSyn]] with a CONSTANT title/heading (no
    * doc_id in the visible text), so byte-identical source documents
    * extract to byte-identical text — the property the pipeline's
    * exact-dedup stage needs. Head noise still varies per doc (and is
    * stripped by extraction). */
  private[queries] val htmlSynPipe: String = {
    val noise =
      "CASE doc_id % 3 " +
        "WHEN 0 THEN '<script type=\"text/javascript\">var x = 1 && 2; if (x<3) { go(\"now\"); }</script>' " +
        "WHEN 1 THEN '<style>p > a { color: #fff; }</style>' " +
        "ELSE '<!-- hidden <b>comment</b> -->' END"
    "'<html><head><title>Page</title>' || " + noise +
      " || '</head><body><h1 class=\"t\">Page</h1><p>' || text || " +
      "'</p><p>&lt;escaped&gt; &amp; &quot;quoted&quot; &#39;s</p></body></html>'"
  }

  /** Stage the pipeline's input archive once per (session, sfDir): the
    * dup-planted corpus (so the dedup stage has real work) as
    * HTTP-framed CC-layout gz shards. */
  private[queries] def stagedPipeWarc(s: SparkSession, d: String): String = {
    val dir = Staging.dir("warc_pipe", d)
    val marker = dir.resolve("_STAGED")
    val gzDir = dir.resolve("gz").toString
    if (!java.nio.file.Files.exists(marker)) {
      val pages = TextOps.corpus(s, d)
        .select(
          concat(lit("https://example.test/d/"), col("doc_id")).as("url"),
          ((col("doc_id") * 7L + 1700000000L) * 1000000L).as("ts_us"),
          expr(htmlSynPipe).cast("binary").as("payload"))
        .repartition(4, col("url"))
      WarcWrite.write(pages, gzDir, gzip = true, http = true)
      java.nio.file.Files.createFile(marker)
    }
    gzDir
  }

  /** The extraction chain: normalize control whitespace (chr-based, no
    * regex), strip script/style/comment blocks, strip tags, decode the
    * five core entities (amp LAST), collapse space runs, trim. Order
    * matters and is identical in both renderings. The leading
    * normalization is what lets every later pattern use `.` safely —
    * after it, the page is one line. */
  private[queries] def htmlTextSql(e0: String, d: Dialect): String = {
    var s = e0
    for (code <- Seq(9, 10, 13)) s = s"replace($s, chr($code), ' ')"
    s = d.rr(s, "<script[^>]*>.*?</script>", " ")
    s = d.rr(s, "<style[^>]*>.*?</style>", " ")
    s = d.rr(s, "<!--.*?-->", " ")
    s = d.rr(s, "<[^>]*>", " ")
    for ((ent, ch) <- Seq("&lt;" -> "'<'", "&gt;" -> "'>'",
        "&quot;" -> "'\"'", "&#39;" -> "chr(39)", "&amp;" -> "'&'"))
      s = s"replace($s, '$ent', $ch)"
    s"trim(${d.rr(s, "  +", " ")})"
  }

  // ----------------------------------------------------------------- URL

  /** Four URL spellings per document; variants 0 and 1 of the same
    * `doc_id DIV 4` base canonicalize to the same URL (case, default
    * port, fragment, query-param order), variants 2 and 3 stay unique
    * (non-default port kept, no query). */
  private[queries] def urlSyn(d: Dialect): String = {
    val base = s"CAST(${d.idiv("doc_id", "4")} AS STRING)"
    val id = "CAST(doc_id AS STRING)"
    s"""CASE doc_id % 4
       | WHEN 0 THEN 'HTTP://Example.COM:80/p/' || $base || '?b=2&a=1#frag'
       | WHEN 1 THEN 'http://example.com/p/' || $base || '?a=1&b=2'
       | WHEN 2 THEN 'https://Other.ORG:8080/x/' || $id || '?z=9&y=8#top'
       | ELSE 'https://other.org/x/' || $id END""".stripMargin
  }

  /** RFC-3986-style canonicalization: lowercase scheme+host, drop
    * default ports (http:80 / https:443), drop the fragment, sort query
    * parameters, default path '/'. Built on regexp_extract (identical
    * signature and leftmost-match semantics in both engines). Assumes
    * single-line URLs (guaranteed by any upstream crawl normalizer —
    * and by urlSyn). */
  private[queries] def urlCanonSql(d: Dialect): String = {
    val nofrag = d.rr("url_raw", "#.*", "")
    val scheme = "lower(regexp_extract(url_raw, '^([A-Za-z]+)://', 1))"
    val hostport = s"regexp_extract($nofrag, '^[A-Za-z]+://([^/?#]+)', 1)"
    val host = s"lower(${d.rr(hostport, ":[0-9]+", "")})"
    val port = "regexp_extract(" + hostport + ", ':([0-9]+)', 1)"
    val portKeep =
      s"""CASE WHEN $port = '' THEN ''
         | WHEN $scheme = 'http' AND $port = '80' THEN ''
         | WHEN $scheme = 'https' AND $port = '443' THEN ''
         | ELSE ':' || $port END""".stripMargin
    val path0 = s"regexp_extract($nofrag, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)"
    val path = s"CASE WHEN $path0 = '' THEN '/' ELSE $path0 END"
    val q = s"regexp_extract($nofrag, '[?](.*)', 1)"
    val qKeep = s"CASE WHEN $q = '' THEN '' ELSE '?' || ${d.sortJoin(q)} END"
    s"$scheme || '://' || $host || $portKeep || $path || $qKeep"
  }

  // ---------------------------------------------------------------- BM25

  private[queries] val Terms = Seq("spark", "hash", "window")

  /** Space-padded non-overlapping token occurrence count (exact when
    * occurrences are non-adjacent; leftmost-non-overlapping `replace`
    * semantics are identical in both engines, so parity always holds). */
  private[queries] def tfSql(term: String, d: Dialect): String = {
    val p = s"(' ' || text || ' ')"
    d.idiv(s"(length($p) - length(replace($p, ' $term ', '')))",
      s"${term.length + 2}")
  }

  /** Whitespace token count (text is single-space separated). */
  private[queries] val dlSql =
    "(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1)"

  // ------------------------------------------------------------- queries

  val defs: Seq[QueryDef] = Seq(

    // WARC archive round trip (ISO 28500 — the web-archive source/sink,
    // the crawl counterpart of the PBF round trip): pages → WARC in
    // BOTH layouts (plain resync-indexable .warc AND the Common-Crawl
    // per-record-gzip-member .warc.gz) → distributed read-back → the
    // SAME extraction chain as q_html_extract. Grouping on (url, ts_us,
    // extracted) with n_copies = 2 proves the two layouts byte-agree,
    // and the DuckDB oracle re-derives everything from `documents`
    // directly — so the whole archive round trip is value-checked
    // end-to-end (byte-identical extracted text per url, the north-rule
    // invariant, THROUGH the archive format). Archives are staged once
    // per session (the first run pays the two sink writes; warm runs
    // time the distributed read of both layouts + extraction).
    QueryDef(
      "q_warc_roundtrip",
      (s, d) => {
        val dir = Staging.dir("warc", d)
        val marker = dir.resolve("_STAGED")
        val plainDir = dir.resolve("plain").toString
        val gzDir = dir.resolve("gz").toString
        if (!java.nio.file.Files.exists(marker)) {
          val pages = Tables.t(s, d, "documents")
            .select(
              concat(lit("https://example.test/d/"), col("doc_id")).as("url"),
              ((col("doc_id") * 7L + 1700000000L) * 1000000L).as("ts_us"),
              expr(htmlSyn).cast("binary").as("payload"))
            .repartition(4, col("url"))
          WarcWrite.write(pages, plainDir, gzip = false)
          WarcWrite.write(pages, gzDir, gzip = true)
          java.nio.file.Files.createFile(marker)
        }
        WarcRead.records(s, plainDir).union(WarcRead.records(s, gzDir))
          .filter(col("warcType") === "response")
          .select(col("url"), col("tsUs").as("ts_us"),
            expr("decode(payload, 'UTF-8')").as("page"))
          .withColumn("extracted", expr(htmlTextSql("page", sparkD)))
          .groupBy("url", "ts_us", "extracted")
          .agg(count(lit(1)).as("n_copies"))
          .orderBy("url")
      },
      Some(s"""WITH pg AS (SELECT doc_id,
              |    'https://example.test/d/' || CAST(doc_id AS STRING) AS url,
              |    (doc_id * 7 + 1700000000) * 1000000 AS ts_us,
              |    $htmlSyn AS page FROM documents)
              |SELECT url, ts_us, ${htmlTextSql("page", duckD)} AS extracted,
              |  CAST(2 AS BIGINT) AS n_copies
              |FROM pg ORDER BY url""".stripMargin)),

    // HTTP-framed WARC round trip — the layout REAL Common-Crawl shards
    // use: each `response` record's block is a full HTTP/1.1 message
    // (status line + headers + CRLFCRLF + body, WARC Content-Type
    // `application/http; msgtype=response`). Pages travel as complete
    // HTTP messages through BOTH archive layouts; the reader splits out
    // (httpStatus, body) and the extraction chain runs on `body` — so
    // an actual CC shard needs no manual header-strip. n_copies = 2
    // proves the two layouts byte-agree on the extracted text AND the
    // parsed status; the DuckDB oracle re-derives everything from
    // `documents`, value-checking body-byte identity through the HTTP
    // framing end-to-end.
    QueryDef(
      "q_warc_http",
      (s, d) => {
        val (plainDir, gzDir) = stagedHttpWarc(s, d)
        WarcRead.records(s, plainDir).union(WarcRead.records(s, gzDir))
          .filter(col("warcType") === "response")
          .select(col("url"), col("tsUs").as("ts_us"),
            col("httpStatus").cast("long").as("http_status"),
            expr("decode(body, 'UTF-8')").as("page"))
          .withColumn("extracted", expr(htmlTextSql("page", sparkD)))
          .groupBy("url", "ts_us", "http_status", "extracted")
          .agg(count(lit(1)).as("n_copies"))
          .orderBy("url")
      },
      Some(s"""WITH pg AS (SELECT doc_id,
              |    'https://example.test/d/' || CAST(doc_id AS STRING) AS url,
              |    (doc_id * 7 + 1700000000) * 1000000 AS ts_us,
              |    $htmlSyn AS page FROM documents)
              |SELECT url, ts_us, CAST(200 AS BIGINT) AS http_status,
              |  ${htmlTextSql("page", duckD)} AS extracted,
              |  CAST(2 AS BIGINT) AS n_copies
              |FROM pg ORDER BY url""".stripMargin)),

    // CDX INDEX + RANDOM ACCESS — the Common-Crawl index contract: a
    // `.warc.gz` archive is indexed once per shard (one sequential
    // member walk, manual gzip framing with CRC/ISIZE verified), each
    // record's row carrying the exact (offset, length) of its OWN gzip
    // member; a consumer then fetches ONE page with a single bounded
    // range read + gunzip. The gate round-trips every page THROUGH the
    // index: build CDX → bounded-fetch each member by (offset, length)
    // → parse → extract text from the HTTP body — a wrong boundary
    // fails loudly (gzip magic/CRC/truncation), so the green row proves
    // the index byte-exact. Scale: indexing is one task per shard
    // (~100k shards at 100 TB saturate any cluster); the fetch side is
    // the serving path — here it runs distributed over the index rows.
    QueryDef(
      "q_warc_cdx",
      (s, d) => {
        import s.implicits._
        val (_, gzDir) = stagedHttpWarc(s, d)
        val conf = new org.apache.spark.util.SerializableConfiguration(
          s.sparkContext.hadoopConfiguration)
        WarcRead.cdxIndex(s, gzDir)
          .filter(col("warcType") === "response")
          .mapPartitions { it =>
            it.map { e =>
              val r = WarcRead.fetchMember(conf.value, e.file, e.offset,
                e.length)
              (e.url, r.tsUs, r.httpStatus.toLong,
                new String(r.body, java.nio.charset.StandardCharsets.UTF_8))
            }
          }
          .toDF("url", "ts_us", "http_status", "page")
          .withColumn("extracted", expr(htmlTextSql("page", sparkD)))
          .select("url", "ts_us", "http_status", "extracted")
          .orderBy("url")
      },
      Some(s"""WITH pg AS (SELECT doc_id,
              |    'https://example.test/d/' || CAST(doc_id AS STRING) AS url,
              |    (doc_id * 7 + 1700000000) * 1000000 AS ts_us,
              |    $htmlSyn AS page FROM documents)
              |SELECT url, ts_us, CAST(200 AS BIGINT) AS http_status,
              |  ${htmlTextSql("page", duckD)} AS extracted
              |FROM pg ORDER BY url""".stripMargin)),

    // END-TO-END RESUMABLE CORPUS PIPELINE (jobs/CorpusPipeline — the
    // webtext counterpart of the geo Pipeline's J9 resumability):
    // crawl archive in, training-set pack report out, through FIVE
    // snapshotted stages (archive scan+extract → perplexity+repetition
    // filter → exact dedup → token-budget packing), each an immutable
    // parquet set + manifest whose lineage key chains back to the input
    // archive — a killed run resumes from the last committed stage, a
    // changed threshold recomputes only from the first affected stage
    // (CorpusPipelineSpec proves both). The input archive is the
    // dup-planted corpus as HTTP-framed CC gz shards with a CONSTANT
    // page title, so exact source dups extract byte-identically and the
    // dedup stage genuinely removes them. The DuckDB oracle replays the
    // ENTIRE chain — extraction template, integer ppl scoring,
    // repetition per-mille, keeper election, recursive-CTE token counts
    // and prefix-sum binning — so crawl-to-pack is value-checked end to
    // end in one gate.
    QueryDef(
      "q_corpus_pipeline",
      (s, d) => {
        val gzDir = stagedPipeWarc(s, d)
        val root = Staging.dir("corpus_pipe_snap", d).toString
        val (pack, _) = graft.util.Scoped.shufflePartitions(s, 8) {
          graft.jobs.CorpusPipeline.run(s, gzDir, root,
            extractSql = htmlTextSql("page", sparkD),
            pplVocab = TextOps.PplVocab, pplOov = TextOps.PplOov,
            pplKeepBelow = TextOps.PplKeepBelow)
        }
        pack.orderBy("shard", "bin")
      },
      Some {
        val vals = TextOps.PplVocab
          .map { case (w, p) => s"('$w', $p)" }.mkString(", ")
        s"""WITH RECURSIVE c0 AS (${TextOps.corpusSql}),
           |pg AS (SELECT doc_id, $htmlSynPipe AS page FROM c0),
           |ex AS (SELECT doc_id, ${htmlTextSql("page", duckD)} AS text
           |  FROM pg),
           |v(w, nlp) AS (VALUES $vals),
           |tkw AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           |  FROM ex),
           |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           |    CAST(sum(coalesce(v.nlp, ${TextOps.PplOov})) AS BIGINT)
           |      AS nll_sum
           |  FROM tkw LEFT JOIN v USING (w) GROUP BY doc_id),
           |tkl AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
           |  FROM ex),
           |rp AS (SELECT doc_id,
           |    CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS t3,
           |    CAST(len(${TextOps.shingleSetSql}) AS BIGINT) AS d3
           |  FROM tkl),
           |fl AS (SELECT e.doc_id, e.text FROM ex e
           |  JOIN sc ON e.doc_id = sc.doc_id
           |  JOIN rp ON e.doc_id = rp.doc_id
           |  WHERE sc.nll_sum // sc.n_words < ${TextOps.PplKeepBelow}
           |    AND (rp.t3 - rp.d3) * 1000 // greatest(rp.t3, 1) <= 100),
           |dd AS (SELECT min(doc_id) AS doc_id, text FROM fl
           |  GROUP BY text),
           |${TextOps.nearDupLosersCte("dd")},
           |nd AS (SELECT doc_id, text FROM dd
           |  WHERE doc_id NOT IN (SELECT doc_id FROM ndl)),
           |src AS (SELECT doc_id, text FROM nd WHERE doc_id % 32 < 4),
           |${TextOps.tokCountCtes},
           |t AS (SELECT s.doc_id, tc.bpe_tokens AS toks, s.doc_id % 32 AS shard
           |  FROM src s JOIN tc ON s.doc_id = tc.doc_id),
           |b AS (SELECT shard, doc_id, toks,
           |    CAST(coalesce(sum(toks) OVER (PARTITION BY shard
           |      ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) // 2048 AS bin
           |  FROM t)
           |SELECT shard, bin, count(*) AS n_docs,
           |  CAST(sum(toks) AS BIGINT) AS fill_toks, min(doc_id) AS first_id
           |FROM b GROUP BY shard, bin ORDER BY shard, bin""".stripMargin
      }),

    // HTML → text extraction (input_hint: html BINARY; "byte-identical
    // extracted text per url"). The page travels as BINARY exactly as a
    // crawl table would store it; the whole strip chain is builtin
    // regexp/replace functions — codegen'd, no UDF, one narrow scan.
    QueryDef(
      "q_html_extract",
      (s, d) => {
        val pages = Tables.t(s, d, "documents")
          .select(col("doc_id"),
            concat(lit("https://example.test/d/"), col("doc_id")).as("url"),
            expr(htmlSyn).cast("binary").as("html"))
        pages
          .withColumn("page", expr("decode(html, 'UTF-8')"))
          .withColumn("extracted", expr(htmlTextSql("page", sparkD)))
          .select(col("doc_id"), col("url"), col("extracted"),
            length(col("extracted")).cast("long").as("n_chars_extracted"))
          .orderBy("doc_id")
      },
      Some(s"""WITH pg AS (SELECT doc_id, $htmlSyn AS page FROM documents),
              |ex AS (SELECT doc_id, ${htmlTextSql("page", duckD)} AS extracted
              |  FROM pg)
              |SELECT doc_id, 'https://example.test/d/' || CAST(doc_id AS STRING) AS url,
              |  extracted, CAST(length(extracted) AS BIGINT) AS n_chars_extracted
              |FROM ex ORDER BY doc_id""".stripMargin)),

    // URL canonicalization + dedup: group pages by canonical URL, keep
    // the earliest doc. Per-row canonicalization then one hash
    // aggregation on the canonical key — the first stage of any crawl
    // dedup at 10^12 rows (no shuffle until the groupBy, and that
    // shuffle carries only (canon, id) after map-side partial agg).
    QueryDef(
      "q_url_canon",
      (s, d) => {
        Tables.t(s, d, "documents")
          .select(col("doc_id"), expr(urlSyn(sparkD)).as("url_raw"))
          .withColumn("canon_url", expr(urlCanonSql(sparkD)))
          .groupBy("canon_url")
          .agg(count(lit(1)).as("n_variants"), min("doc_id").as("keeper"))
          .orderBy("canon_url")
      },
      Some(s"""WITH raw AS (SELECT doc_id, ${urlSyn(duckD)} AS url_raw
              |  FROM documents)
              |SELECT ${urlCanonSql(duckD)} AS canon_url,
              |  count(*) AS n_variants, min(doc_id) AS keeper
              |FROM raw GROUP BY 1 ORDER BY canon_url""".stripMargin)),

    // PII REDACTION — the scrubbing pass every released web corpus
    // runs (emails + phone numbers → placeholder tokens): pure per-row
    // regexp_replace chains, codegen'd, zero shuffle before the output
    // sort — the 100 TB shape is a map-only rewrite. Patterns are
    // backslash-free by the module's convention (character classes
    // only) and rendered through the shared Dialect shim so both
    // engines replace ALL occurrences. PII is synthesized
    // deterministically (an email + a dashed phone per doc, a second
    // email on doc_id % 3 == 0), so redaction counts are exact and the
    // full redacted text value-checks.
    QueryDef(
      "q_pii_redact",
      (s, d) => {
        val redact = {
          var e = "pii"
          e = sparkD.rr(e, "[a-z0-9._]+@[a-z0-9.]+[a-z]", "<EMAIL>")
          e = sparkD.rr(e,
            "[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]", "<PHONE>")
          e
        }
        Tables.t(s, d, "documents")
          .select(col("doc_id"), expr(piiSyn).as("pii"))
          .select(col("doc_id"), expr(redact).as("redacted"),
            expr("size(regexp_extract_all(pii, '[a-z0-9._]+@[a-z0-9.]+[a-z]', 0))")
              .cast("long").as("n_emails"))
          .orderBy("doc_id")
      },
      Some {
        val redact = {
          var e = "pii"
          e = duckD.rr(e, "[a-z0-9._]+@[a-z0-9.]+[a-z]", "<EMAIL>")
          e = duckD.rr(e,
            "[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]", "<PHONE>")
          e
        }
        s"""WITH p AS (SELECT doc_id, $piiSyn AS pii FROM documents)
           |SELECT doc_id, $redact AS redacted,
           |  CAST(len(regexp_extract_all(pii,
           |    '[a-z0-9._]+@[a-z0-9.]+[a-z]')) AS BIGINT) AS n_emails
           |FROM p ORDER BY doc_id""".stripMargin
      }),

    // ANCHOR-TEXT aggregation — the classic link-signal op (search and
    // web-corpus pipelines aggregate the anchor text of a page's
    // in-links as an external description of the page): per target,
    // total in-links, distinct anchors, and the top anchor (most
    // frequent, ties to the lexicographically smallest). Links are
    // synthesized 3 per source doc with a mix of generic anchors
    // ("click here"…) and page-specific text prefixes, hash-spread over
    // a small dst space so real fan-in exists. Scale shape: first a
    // (dst, anchor) groupBy whose map-side partials absorb the
    // celebrity-anchor skew ("click here" at crawl scale is one of the
    // hottest keys there is), then dst-partitioned windows over the
    // already-aggregated (dst, anchor) rows — never over raw links.
    QueryDef(
      "q_anchor_text",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val links = Tables.t(s, d, "documents")
          .select(col("doc_id"), lower(col("text")).as("lt"),
            explode(expr("sequence(0, 2)")).as("slot"))
          .select(
            pmod(col("doc_id") * 2654435761L + col("slot") * 40503L,
              lit(97L)).as("dst_id"),
            when(pmod(col("doc_id") + col("slot"), lit(4)) === 0,
              lit("click here"))
              .when(pmod(col("doc_id") + col("slot"), lit(4)) === 1,
                lit("read more"))
              .when(pmod(col("doc_id") + col("slot"), lit(4)) === 2,
                lit("homepage"))
              .otherwise(substring(col("lt"), 1, 10)).as("anchor"))
        val perAnchor = links.groupBy("dst_id", "anchor")
          .agg(count(lit(1)).as("cnt"))
        val byDst = Window.partitionBy("dst_id")
        perAnchor
          .withColumn("rnk", row_number().over(
            byDst.orderBy(col("cnt").desc, col("anchor"))))
          .withColumn("n_links", sum("cnt").over(byDst))
          .withColumn("n_anchors", count(lit(1)).over(byDst))
          .filter(col("rnk") === 1)
          .select(col("dst_id"), col("n_links"), col("n_anchors"),
            col("anchor").as("top_anchor"), col("cnt").as("top_cnt"))
          .orderBy("dst_id")
      },
      Some("""WITH lk AS (SELECT
             |    (doc_id * 2654435761 + slot * 40503) % 97 AS dst_id,
             |    CASE (doc_id + slot) % 4 WHEN 0 THEN 'click here'
             |      WHEN 1 THEN 'read more' WHEN 2 THEN 'homepage'
             |      ELSE substr(lower(text), 1, 10) END AS anchor
             |  FROM documents, (SELECT unnest(range(0, 3)) AS slot)),
             |pa AS (SELECT dst_id, anchor, CAST(count(*) AS BIGINT) AS cnt
             |  FROM lk GROUP BY dst_id, anchor),
             |rk AS (SELECT dst_id, anchor, cnt,
             |    row_number() OVER (PARTITION BY dst_id
             |      ORDER BY cnt DESC, anchor) AS rnk,
             |    CAST(sum(cnt) OVER (PARTITION BY dst_id) AS BIGINT)
             |      AS n_links,
             |    CAST(count(*) OVER (PARTITION BY dst_id) AS BIGINT)
             |      AS n_anchors
             |  FROM pa)
             |SELECT dst_id, n_links, n_anchors, anchor AS top_anchor,
             |  cnt AS top_cnt
             |FROM rk WHERE rnk = 1 ORDER BY dst_id""".stripMargin)),

    // BM25 top-k retrieval (integer-scaled, rank-exact): per-doc term
    // frequencies + doc length in one scan, corpus stats (N, avgdl,
    // per-term df) as a 1-row broadcast-keyed join, score = Σ_t idf_t ·
    // tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) in fixed-point (k1=1.2,
    // b=0.75, idf surrogate (N−df+1)/(df+1) ×1e6) — all BIGINT, so both
    // engines rank identically; ties broken by doc_id; TakeOrdered, no
    // global sort.
    QueryDef(
      "q_bm25_topk",
      (s, d) => {
        val tf = Terms.zipWithIndex.map { case (t, i) =>
          expr(tfSql(t, sparkD)).as(s"tf$i") }
        val docs = Tables.t(s, d, "documents")
          .select(col("doc_id") +: expr(dlSql).cast("long").as("dl") +: tf: _*)
        val statCols = count(lit(1)).as("n") +: sum("dl").as("sumdl") +:
          Terms.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
        // scalar attach: the 1-row corpus-stats aggregate rides a
        // broadcast nested-loop join — with a single-row build side
        // that IS the optimal plan (each task reads one cached row;
        // an equi-join on a planted constant folds to the same shape)
        val stats = docs.agg(statCols.head, statCols.tail: _*)
        val scored = docs.crossJoin(broadcast(stats))
          .withColumn("avgdl", expr("sumdl DIV n"))
        val perTerm = Terms.indices.map { i =>
          expr(s"(((n - df$i + 1) * 1000000) DIV (df$i + 1)) * tf$i * 2200 " +
            s"DIV (tf$i * 1000 + 300 + (900 * dl) DIV avgdl)")
        }
        scored
          .withColumn("score", perTerm.reduce(_ + _))
          .select("doc_id", "score")
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      Some {
        val tfs = Terms.zipWithIndex.map { case (t, i) =>
          s"${tfSql(t, duckD)} AS tf$i" }.mkString(", ")
        val dfs = Terms.indices.map(i =>
          s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
          .mkString(", ")
        val score = Terms.indices.map(i =>
          s"((((n - df$i + 1) * 1000000) // (df$i + 1)) * tf$i * 2200 " +
            s"// (tf$i * 1000 + 300 + (900 * dl) // avgdl))").mkString(" + ")
        s"""WITH d AS (SELECT doc_id, $dlSql AS dl, $tfs FROM documents),
           |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(dl) AS BIGINT) // CAST(count(*) AS BIGINT) AS avgdl,
           |    $dfs FROM d)
           |SELECT doc_id, $score AS score FROM d, stats
           |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
      }),

    // Link-graph PageRank, 5 damped fixed-point iterations — the
    // iterative-join workload class (LabelProp's weighted cousin).
    // Deterministic synthetic out-links, 3 per doc: one in five points
    // into a 100-page hot head (a real web graph's celebrity skew — a
    // bare affine map would be a bijection per link slot, uniform
    // in-degree, and the rank a trivial fixed point), the rest
    // multiplicative-hash spread. The synthetic dst space assumes
    // doc_ids are 0-based contiguous (dst = hash % n lands on an
    // existing doc) — with a sparse id space those dsts would miss
    // `nodes` and their rank mass drop at the LinkRank left join (a
    // documented LinkRank semantic, mirrored by the oracle either way).
    // All arithmetic in BIGINT fixed-point
    // (scale 1e6, contributions rank DIV outdeg, damping 0.85 as ·850
    // DIV 1000) so five chained DuckDB CTEs reproduce the ranks
    // bit-for-bit.
    QueryDef(
      "q_pagerank",
      (s, d) => {
        val docs = Tables.t(s, d, "documents").select(col("doc_id").as("id"))
        val n = docs.count() // one tiny scalar, mirrored by the oracle's subquery
        val edges = docs
          .withColumn("j", explode(expr("sequence(1, 3)")))
          .select(col("id").as("src"),
            when((col("id") + col("j")) % 5 === 0, (col("id") * 13L) % 100L)
              .otherwise(
                pmod(col("id") * 2654435761L + col("j") * 40503L, lit(n)))
              .as("dst"))
        LinkRank.run(s, docs, edges, iters = 5)
          .select(col("id").as("doc_id"), col("r").as("rank_fp"))
          .orderBy("doc_id")
      },
      Some {
        val base =
          """nodes AS (SELECT doc_id AS id FROM documents),
            |edges AS (SELECT doc_id AS src,
            |    CASE WHEN (doc_id + j) % 5 = 0 THEN (doc_id * 13) % 100
            |      ELSE (doc_id * 2654435761 + j * 40503) %
            |        (SELECT count(*) FROM documents) END AS dst
            |  FROM documents, (SELECT unnest([1, 2, 3]) AS j)),
            |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
            |  FROM edges GROUP BY src),
            |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes)""".stripMargin
        val iters = (1 to 5).map { k =>
          s"""r$k AS (SELECT n.id,
             |    150000 + (850 * COALESCE(s.acc, 0)) // 1000 AS r
             |  FROM nodes n LEFT JOIN (
             |    SELECT e.dst AS id, CAST(sum(r.r // g.outdeg) AS BIGINT) AS acc
             |    FROM edges e JOIN r${k - 1} r ON e.src = r.id
             |    JOIN deg g ON e.src = g.src GROUP BY e.dst) s
             |  ON n.id = s.id)""".stripMargin
        }.mkString(",\n")
        s"WITH $base,\n$iters\nSELECT id AS doc_id, r AS rank_fp FROM r5 ORDER BY doc_id"
      }))
}
