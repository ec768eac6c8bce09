package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The shingle/minhash codegen kernels must be value-identical to the
  * declarative column formulation they replaced (which is also the
  * form the DuckDB oracle mirrors). */
class TextExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 1000000007L

  /** The round-1 declarative formulation, kept as the test oracle. */
  private def shingleSetDecl(text: Column): Column = {
    val t = split(lower(text), " ")
    array_distinct(
      when(size(t) < 3, array().cast("array<bigint>"))
        .otherwise(transform(sequence(lit(1), size(t) - 2),
          i => TextFunctions.str_poly_hash(concat_ws(" ",
            element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))))
  }

  private def minhashSigDecl(shs: Column): Column =
    transform(sequence(lit(0), lit(7)), j =>
      array_min(transform(shs, x =>
        pmod((lit(1) + j * 2) * x % P + j * 17 % P, lit(P)))))

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one two three",
    "too short",
    "single",
    "",
    "trailing space ",       // split keeps trailing empty token
    " leading and  double ", // empty tokens participate in shingles
    "Unicode ÄÖÜ tokens müssen auch funktionieren genau so wie hier",
    "astral 😀 smiley plane code point test okay",
    "repeat repeat repeat repeat repeat repeat")

  test("shingle_hashes kernel ≡ declarative array_distinct/transform formulation") {
    val df = texts.toDF("text")
      .withColumn("fast", TextFunctions.shingle_hashes(lower($"text")))
      .withColumn("decl", shingleSetDecl($"text"))
    for (r <- df.collect()) {
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"text=${r.getString(0)}")
    }
  }

  test("char_gram_hashes kernel ≡ declarative substring/transform formulation") {
    for (n <- Seq(3, 5)) {
      val decl = expr(
        s"CASE WHEN length(text) < $n THEN CAST(array() AS ARRAY<BIGINT>) ELSE " +
          s"array_distinct(transform(sequence(1, length(text) - ${n - 1}), " +
          s"i -> str_poly_hash(substring(text, i, $n)))) END")
      TextFunctions.register(spark)
      val df = texts.toDF("text")
        .withColumn("fast", TextFunctions.char_gram_hashes($"text", n))
        .withColumn("decl", decl)
      for (r <- df.collect())
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n text=${r.getString(0)}")
    }
  }

  test("word_gram_hashes kernel ≡ declarative transform/concat formulation (dups kept)") {
    val n = 8
    val declExpr =
      "CASE WHEN size(toks) >= 8 THEN transform(sequence(1, size(toks) - 7), " +
        "i -> str_poly_hash(concat(" +
        (0 to 7).map(o => s"element_at(toks, i + $o)").mkString(", ' ', ") +
        "))) ELSE CAST(array() AS array<bigint>) END"
    TextFunctions.register(spark)
    val df = (texts :+ ("w " * 20).trim).toDF("text")
      .withColumn("toks", split(lower($"text"), " "))
      .withColumn("fast", TextFunctions.word_gram_hashes(lower($"text"), n))
      .withColumn("decl", expr(declExpr))
    for (r <- df.collect())
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"text=${r.getString(0)}")
  }

  test("minhash_sig kernel ≡ declarative transform/array_min formulation") {
    val df = texts.toDF("text")
      .withColumn("shs", TextFunctions.shingle_hashes(lower($"text")))
      .filter(size($"shs") > 0)
      .withColumn("fast", TextFunctions.minhash_sig($"shs"))
      .withColumn("decl", minhashSigDecl($"shs"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"text=${r.getString(0)}")
    }
  }

  test("simhash16 kernel ≡ the exploded tokens×bits formulation it replaced") {
    val decl = texts.zipWithIndex.toDF("text", "i")
      .select($"i", explode(split(lower($"text"), " ")).as("tok"))
      .select($"i", TextFunctions.str_poly_hash($"tok").as("th"))
      .select($"i", $"th", explode(sequence(lit(0), lit(15))).as("b"))
      .withColumn("sgn", expr("CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END"))
      .groupBy("i", "b").agg(sum($"sgn").as("s"))
      .groupBy("i")
      .agg(sum(expr("CASE WHEN s > 0 THEN 1 << b ELSE 0 END")).as("simhash"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val fast = texts.zipWithIndex.toDF("text", "i")
      .select($"i", TextFunctions.simhash16(lower($"text")).as("simhash"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fast == decl)
  }

  test("tokenize_count: greedy longest-match over a caller-supplied vocab") {
    import graft.expr.SubwordVocab
    // a tiny explicit vocab with entries of many lengths proves the
    // trie picks the LONGEST match at each position, any length
    val v = SubwordVocab(Seq("the", "ment", "ion", "or", "ing", "est",
      "mentionable", "tokenization"))
    def tc(s: String): Long = Seq(0).toDF("ignore")
      .select(TextFunctions.tokenize_count(lit(s), v)).head().getLong(0)
    assert(tc("") === 0L)            // empty text → no tokens
    assert(tc("   ") === 0L)         // spaces are separators, not tokens
    assert(tc("the") === 1L)         // whole-word vocab hit
    assert(tc("mention") === 2L)     // "ment"(4) + "ion"(3)
    assert(tc("mentionable") === 1L) // 11-char entry beats "ment"
    assert(tc("tokenization") === 1L) // 12-char entry
    assert(tc("zzz") === 3L)         // unmatched chars → single-char tokens
    assert(tc("the the") === 2L)     // per-word; the space contributes 0
    // greedy is strictly per-position: "ingest" → "ing" + "est"
    assert(tc("ingest") === 2L)
  }

  test("default vocab: >= 1k entries, len > 4 entries fire; trie == naive") {
    import graft.expr.SubwordVocab
    val v = SubwordVocab.default
    assert(v.entries.length >= 1000, s"vocab has ${v.entries.length} entries")
    assert(v.maxLen > 4, s"maxLen ${v.maxLen} — must exceed the old 4 cap")
    // the long entries genuinely fire on corpus words
    def tc(s: String): Long = Seq(0).toDF("ignore")
      .select(TextFunctions.tokenize_count(lit(s))).head().getLong(0)
    val whole = v.entries.filter(_.length >= 6)
    assert(whole.nonEmpty)
    for (w <- whole.take(3)) assert(tc(w) === 1L, s"'$w' should be 1 token")
    // trie kernel ≡ a naive per-length-Set longest-match reference
    val byLen = v.entries.groupBy(_.length).view.mapValues(_.toSet).toMap
    val lens = byLen.keys.toSeq.sorted.reverse
    def naive(text: String): Long = text.split(" ", -1).map { w =>
      var i = 0; var c = 0L
      while (i < w.length) {
        val step = lens.find(l => i + l <= w.length &&
          byLen(l).contains(w.substring(i, i + l))).getOrElse(1)
        c += 1; i += step
      }
      c
    }.sum
    val samples = Seq(
      "the government mentioned that tokenization matters for training",
      "customer orders shipped in groups", "zzz qqq", "",
      v.entries.take(40).mkString(""), v.entries.takeRight(40).mkString(" "))
    for (s <- samples) assert(tc(s) === naive(s), s"mismatch on '$s'")
  }

  test("tokenize_ids: greedy id stream, ids single-sourced from the vocab") {
    import graft.expr.SubwordVocab
    val v = SubwordVocab(Seq("the", "ment", "ion", "or"))
    def ids(w: String): Seq[Int] = Seq(w).toDF("w")
      .select(TextFunctions.tokenize_ids($"w", v)).collect()
      .head.getSeq[Int](0).toSeq
    val fb = SubwordVocab.FallbackBase
    assert(ids("") === Seq.empty)
    assert(ids("mention") === Seq(1, 2))        // "ment", "ion"
    assert(ids("theory") === Seq(0, 3, fb + 'y'.toInt))
    assert(ids("zq") === Seq(fb + 'z'.toInt, fb + 'q'.toInt))
    // id stream length always equals tokenize_count under the DEFAULT
    // vocab too (stream and count share one greedy walk)
    for (w <- Seq("the", "mention", "ingest", "xtion", "government"))
      assert(Seq(w).toDF("w").select(TextFunctions.tokenize_ids($"w"))
        .head().getSeq[Int](0).length.toLong ===
        Seq(w).toDF("w").select(TextFunctions.tokenize_count($"w"))
          .head().getLong(0))
  }

  test("vocab trie operates on CODE POINTS: multi-byte and " +
      "supplementary-plane entries match exactly") {
    import graft.expr.SubwordVocab
    import org.apache.spark.unsafe.types.UTF8String
    // "ünï" is 3 code points (2-byte UTF-8 each); the gothic letter
    // 𐌰 (U+10330) is supplementary — ONE code point, TWO UTF-16 chars
    val g = new String(Character.toChars(0x10330))
    val v = SubwordVocab(Seq("ünï", "ün", s"$g$g", "ab"))
    def tc(s: String): Long = v.tokenCount(UTF8String.fromString(s))
    def ids(s: String): Seq[Int] =
      (0 until v.tokenIds(UTF8String.fromString(s)).numElements())
        .map(v.tokenIds(UTF8String.fromString(s)).getInt)
    assert(tc("ünï") === 1L)            // longest wins over "ün"
    assert(ids("ünï") === Seq(0))
    assert(tc("ünx") === 2L)            // "ün" + fallback 'x'
    assert(ids("ünx") === Seq(1, SubwordVocab.FallbackBase + 'x'.toInt))
    assert(tc(s"$g$g$g") === 2L)        // "𐌰𐌰" + fallback 𐌰
    assert(ids(s"$g$g$g") === Seq(2, SubwordVocab.FallbackBase + 0x10330))
    // a lone supplementary char falls back by CODE POINT, never by
    // surrogate halves (two surrogate tokens would be corruption)
    assert(tc(g) === 1L)
    assert(ids(g) === Seq(SubwordVocab.FallbackBase + 0x10330))
    // maxLen counts code points, not UTF-16 units
    assert(v.maxLen === 3)
  }

  test("vocab ships as a serialized reference object, trie rebuilds") {
    import graft.expr.SubwordVocab
    val v = SubwordVocab(Seq("ab", "abc"))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(v); oos.close()
    val v2 = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[SubwordVocab]
    assert(v2 === v) // equality on entries
    import org.apache.spark.unsafe.types.UTF8String
    assert(v2.tokenCount(UTF8String.fromString("abcab")) === 2L) // "abc"+"ab"
    intercept[IllegalArgumentException](SubwordVocab(Seq("a b"))) // no spaces
    intercept[IllegalArgumentException](SubwordVocab(Seq("ab", "ab"))) // dups
  }

  test("kernels agree between codegen and interpreted eval") {
    def run(): Seq[(Seq[Long], Long, Long, Seq[Int])] = {
      texts.toDF("text")
        .select(TextFunctions.minhash_sig(
          TextFunctions.shingle_hashes(lower($"text"))).as("sig"),
          TextFunctions.simhash16(lower($"text")).as("sh"),
          TextFunctions.tokenize_count(lower($"text")).as("tok"),
          TextFunctions.tokenize_ids(
            regexp_replace(lower($"text"), " ", "")).as("ids"))
        .collect().map(r => (r.getSeq[Long](0).toSeq, r.getLong(1),
          r.getLong(2), r.getSeq[Int](3).toSeq)).toSeq
    }
    // factoryMode (not the wholeStage flag): CODEGEN_ONLY + fallback
    // off makes a broken doGenCode THROW instead of silently falling
    // back to interpreted eval; NO_CODEGEN forces nullSafeEval
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = run()
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val fused = run()
      assert(interp == fused)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
  }
}
