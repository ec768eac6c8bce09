package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text kernels for the training-data pipeline operators (dedup,
  * fingerprinting). The polynomial hash is defined over UNICODE CODE
  * POINTS with h = (h*31 + cp) mod 1e9+7, seed 7 — chosen so the exact
  * same function is expressible in ANSI SQL for the DuckDB oracle
  * (list_reduce over regexp_split_to_array + unicode()). */
object TextRT {
  val P = 1000000007L
  val Seed = 7L

  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = Seed
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Distinct polyHash values of all word-3-gram shingles of an
    * (already lowercased) text — ≡ array_distinct(transform(...)) over
    * split(text, ' ') but in one tight codegen-callable loop (the
    * interpreted higher-order-function formulation dominated round-1
    * minhash time). First-occurrence order, matching array_distinct. */
  def shingleHashes(lowered: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // split semantics must equal Spark's split(text, " ") = Java regex
    // split with limit -1 (trailing empty tokens kept)
    val toks = lowered.toString.split(" ", -1)
    val n = toks.length
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var i = 0
    while (i + 2 < n) {
      // polyHash of (toks(i) + " " + toks(i+1) + " " + toks(i+2)):
      // code points of the concatenation == concatenation of code points
      var h = Seed
      var t = 0
      while (t < 3) {
        val tok = toks(i + t)
        var ci = 0
        while (ci < tok.length) {
          val cp = tok.codePointAt(ci)
          h = (h * 31 + cp) % P
          ci += Character.charCount(cp)
        }
        if (t < 2) h = (h * 31 + 32L) % P // ' '
        t += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Distinct polyHash values of all CHARACTER n-gram windows of a
    * text (code-point windows — the same character semantics as
    * substring/length in both engines), first-occurrence order.
    * ≡ array_distinct(transform(sequence(1, length-n+1),
    * i -> str_poly_hash(substring(text, i, n)))) — but one fused loop
    * instead of an interpreted HOF with per-window substring copies. */
  def charGramHashes(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cps = text.toString.codePoints().toArray
    if (cps.length < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var i = 0
    while (i + n <= cps.length) {
      var h = Seed
      var j = 0
      while (j < n) { h = (h * 31 + cps(i + j)) % P; j += 1 }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** polyHash of every word n-gram of an (already lowercased) text, in
    * window order, duplicates KEPT — ≡ transform(sequence(1,
    * size(toks)-n+1), i -> str_poly_hash(concat_ws(' ', toks[i..i+n-1])))
    * over split(text, ' '), one fused loop. Fewer than n tokens → empty
    * array (the CASE the interpreted formulation guarded with). */
  def wordGramHashes(lowered: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val toks = lowered.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      var h = Seed
      var t = 0
      while (t < n) {
        val tok = toks(i + t)
        var ci = 0
        while (ci < tok.length) {
          val cp = tok.codePointAt(ci)
          h = (h * 31 + cp) % P
          ci += Character.charCount(cp)
        }
        if (t < n - 1) h = (h * 31 + 32L) % P // ' '
        t += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** k=8 minhash signature over a shingle-hash array:
    * sig(j) = min_x ((1+2j)·x mod P + 17j mod P) mod P — the exact
    * arithmetic of the round-1 column formulation (and of the DuckDB
    * oracle). Empty input → empty signature (callers filter those). */
  def minhashSig(shs: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val n = shs.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](8)
    var j = 0
    while (j < 8) {
      val a = 1L + 2L * j
      val b = (17L * j) % P
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * shs.getLong(i) % P + b) % P
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 16-bit SimHash over whitespace tokens of an (already lowercased)
    * text in ONE per-row loop: per token th = polyHash, each bit b gets
    * +1 if ((th>>b)&1)==1 else −1, output bit b set iff its count > 0.
    * ≡ the explode(tokens)×explode(16 bits)→groupBy formulation (and
    * the DuckDB oracle) but with zero fan-out and zero shuffle; split
    * semantics are Spark's split(text, " ") = Java split(" ", -1)
    * (trailing empty tokens kept, "" yields one empty token → hash 7). */
  def simhash16(lowered: UTF8String): Long = {
    val toks = lowered.toString.split(" ", -1)
    val counts = new Array[Int](16)
    var i = 0
    while (i < toks.length) {
      val tok = toks(i)
      var h = Seed
      var ci = 0
      while (ci < tok.length) {
        val cp = tok.codePointAt(ci)
        h = (h * 31 + cp) % P
        ci += Character.charCount(cp)
      }
      var b = 0
      while (b < 16) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }
}

// The greedy longest-match subword tokenizer lives in
// [[SubwordVocab]] — a parameterized, trie-backed vocab (arbitrary
// size and token length) passed into the kernels below as a codegen
// reference object. The in-repo default is the 1.2k-entry
// resources/graft/subword_vocab.txt (regenerate: graft.tools.VocabGen).

/** str_poly_hash(text) → BIGINT in [0, 1e9+7). Deterministic document
  * fingerprint (SURVEY.md training-data ops); also the shared hash
  * primitive under minhash/simhash. */
case class StrPolyHashExpr(text: Expression) extends UnaryExpression {
  override def child: Expression = text
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any =
    TextRT.polyHash(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextRT.polyHash($c)")
  override protected def withNewChildInternal(c: Expression): StrPolyHashExpr = copy(c)
}

/** shingle_hashes(lowered_text) → ARRAY<BIGINT>: distinct polyHash of
  * word-3-gram shingles (pass text through lower() first). */
case class ShingleHashesExpr(text: Expression) extends UnaryExpression {
  override def child: Expression = text
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any =
    TextRT.shingleHashes(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextRT.shingleHashes($c)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr = copy(c)
}

/** minhash_sig(shingle_hashes) → ARRAY<BIGINT> of the 8 signature minima. */
case class MinhashSigExpr(shs: Expression) extends UnaryExpression {
  override def child: Expression = shs
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    TextRT.minhashSig(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextRT.minhashSig($c)")
  override protected def withNewChildInternal(c: Expression): MinhashSigExpr = copy(c)
}

/** simhash16(lowered_text) → BIGINT 16-bit simhash (pass text through
  * lower() first). */
case class Simhash16Expr(text: Expression) extends UnaryExpression {
  override def child: Expression = text
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any =
    TextRT.simhash16(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextRT.simhash16($c)")
  override protected def withNewChildInternal(c: Expression): Simhash16Expr = copy(c)
}

/** tokenize_ids(lowered_word) → ARRAY<INT>: the greedy longest-match
  * token-ID stream of one word (vocab index, or
  * [[SubwordVocab.FallbackBase]] + code point for single-char fallback
  * tokens). The vocab rides into codegen as a reference object, so any
  * vocab — size and token length unbounded — compiles to the same
  * generated code. */
case class TokenizeIdsExpr(word: Expression, vocab: SubwordVocab)
    extends UnaryExpression {
  override def child: Expression = word
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(w: Any): Any =
    vocab.tokenIds(w.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("subwordVocab", vocab,
      "graft.expr.SubwordVocab")
    defineCodeGen(ctx, ev, c => s"$v.tokenIds($c)")
  }
  override protected def withNewChildInternal(c: Expression): TokenizeIdsExpr =
    copy(word = c)
}

/** tokenize_count(lowered_text) → BIGINT: greedy longest-match subword
  * token count over `vocab` (pass text through lower() first). */
case class TokenizeCountExpr(text: Expression, vocab: SubwordVocab)
    extends UnaryExpression {
  override def child: Expression = text
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any =
    vocab.tokenCount(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("subwordVocab", vocab,
      "graft.expr.SubwordVocab")
    defineCodeGen(ctx, ev, c => s"$v.tokenCount($c)")
  }
  override protected def withNewChildInternal(c: Expression): TokenizeCountExpr =
    copy(text = c)
}

/** char_gram_hashes(text) → ARRAY<BIGINT>: distinct char-n-gram
  * polyHash values ([[TextRT.charGramHashes]]). */
case class CharGramHashesExpr(text: Expression, n: Int) extends UnaryExpression {
  override def child: Expression = text
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any =
    TextRT.charGramHashes(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextRT.charGramHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharGramHashesExpr =
    copy(text = c)
}

/** word_gram_hashes(lowered_text) → ARRAY<BIGINT>: all word n-gram
  * polyHash values, duplicates kept ([[TextRT.wordGramHashes]]). */
case class WordGramHashesExpr(text: Expression, n: Int) extends UnaryExpression {
  override def child: Expression = text
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any =
    TextRT.wordGramHashes(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextRT.wordGramHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordGramHashesExpr =
    copy(text = c)
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.{column, expression}

  def str_poly_hash(text: Column): Column =
    column(StrPolyHashExpr(expression(text)))
  def char_gram_hashes(text: Column, n: Int): Column =
    column(CharGramHashesExpr(expression(text), n))
  def word_gram_hashes(loweredText: Column, n: Int): Column =
    column(WordGramHashesExpr(expression(loweredText), n))
  def tokenize_count(loweredText: Column): Column =
    tokenize_count(loweredText, SubwordVocab.default)
  def tokenize_count(loweredText: Column, vocab: SubwordVocab): Column =
    column(TokenizeCountExpr(expression(loweredText), vocab))
  def tokenize_ids(loweredWord: Column): Column =
    tokenize_ids(loweredWord, SubwordVocab.default)
  def tokenize_ids(loweredWord: Column, vocab: SubwordVocab): Column =
    column(TokenizeIdsExpr(expression(loweredWord), vocab))
  def simhash16(loweredText: Column): Column =
    column(Simhash16Expr(expression(loweredText)))
  def shingle_hashes(loweredText: Column): Column =
    column(ShingleHashesExpr(expression(loweredText)))
  def minhash_sig(shs: Column): Column =
    column(MinhashSigExpr(expression(shs)))

  def register(spark: SparkSession): Unit =
    // register once per session — re-registration is a WARN per call in
    // the function registry, which spammed the round-1 bench logs
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("str_poly_hash")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "str_poly_hash", es => StrPolyHashExpr(es.head), "built-in")
}
