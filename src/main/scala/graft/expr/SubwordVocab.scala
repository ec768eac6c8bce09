package graft.expr

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** A subword vocabulary for greedy longest-match (maximal-munch)
  * tokenization — the WordPiece/BPE inference rule: at each position
  * take the LONGEST vocab entry matching there, else emit a
  * single-character fallback token and advance one code point.
  *
  * Entries are arbitrary strings of any length (no spaces); token id =
  * the entry's position in the vocab file. Matching walks a code-point
  * trie, so a position costs O(longest match at that position) with
  * zero per-probe allocation — NOT one String allocation per candidate
  * length, which is what a per-length HashSet design costs and why it
  * capped the old 51-entry vocab at length 4.
  *
  * Instances are passed into the codegen kernels
  * ([[TokenizeCountExpr]]/[[TokenizeIdsExpr]]) as Catalyst REFERENCE
  * OBJECTS (`ctx.addReferenceObj`) — the vocab is a query parameter,
  * never compiled into the generated source. Serialization ships only
  * `entries`; the trie rebuilds lazily on first use per JVM.
  *
  * Defined over UNICODE CODE POINTS (the DuckDB oracle's substr()/len()
  * count characters, not UTF-16 units).
  */
final class SubwordVocab(val entries: IndexedSeq[String]) extends Serializable {
  require(entries.nonEmpty, "empty subword vocab")
  require(entries.forall(e => e.nonEmpty && !e.contains(' ')),
    "vocab entries must be non-empty and space-free (spaces separate words)")
  require(entries.distinct.length == entries.length, "duplicate vocab entries")

  /** Longest entry in code points (the oracle's recursion bound). */
  val maxLen: Int = entries.iterator.map(e => e.codePointCount(0, e.length)).max

  // -- trie over code points (rebuilt per JVM after deserialization) --
  private final class Node {
    var id: Int = -1
    var kids: java.util.HashMap[Integer, Node] = _
    def kid(cp: Int): Node = if (kids == null) null else kids.get(cp)
    def ensure(cp: Int): Node = {
      if (kids == null) kids = new java.util.HashMap[Integer, Node](4)
      var n = kids.get(cp)
      if (n == null) { n = new Node; kids.put(cp, n) }
      n
    }
  }

  @transient private lazy val root: Node = {
    val r = new Node
    var id = 0
    while (id < entries.length) {
      val e = entries(id)
      var n = r
      var i = 0
      while (i < e.length) {
        val cp = e.codePointAt(i)
        n = n.ensure(cp)
        i += Character.charCount(cp)
      }
      n.id = id
      id += 1
    }
    r
  }

  /** Longest vocab match starting at cps(i): returns (id << 6) | length
    * in code points, or -1 for no match (length < 64 enforced below —
    * vocab entries are subwords, not documents). */
  private def longestAt(cps: Array[Int], i: Int): Long = {
    var n = root
    var j = i
    var best = -1L
    while (j < cps.length && n != null) {
      n = n.kid(cps(j))
      if (n != null) {
        j += 1
        if (n.id >= 0) best = (n.id.toLong << 6) | (j - i).toLong
      }
    }
    best
  }
  require(maxLen < 64, "vocab entry longer than 63 code points")

  /** Greedy token count of a whole (already lowercased) text; spaces
    * separate words and are not tokens. Since no entry contains a
    * space, scanning the text while skipping spaces equals per-word
    * tokenization. */
  def tokenCount(lowered: UTF8String): Long = {
    val cps = lowered.toString.codePoints().toArray
    val n = cps.length
    var i = 0
    var cnt = 0L
    while (i < n) {
      if (cps(i) == ' ') i += 1
      else {
        val m = longestAt(cps, i)
        i += (if (m < 0) 1 else (m & 63L).toInt)
        cnt += 1
      }
    }
    cnt
  }

  /** Greedy token-ID stream of ONE word (no spaces): vocab index for
    * entry matches, [[SubwordVocab.FallbackBase]] + code point for
    * single-character fallbacks. */
  def tokenIds(word: UTF8String): ArrayData = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    val out = new scala.collection.mutable.ArrayBuffer[Int](n)
    var i = 0
    while (i < n) {
      val m = longestAt(cps, i)
      if (m < 0) { out += SubwordVocab.FallbackBase + cps(i); i += 1 }
      else { out += (m >>> 6).toInt; i += (m & 63L).toInt }
    }
    new GenericArrayData(out.toArray)
  }

  override def equals(o: Any): Boolean = o match {
    case v: SubwordVocab => v.entries == entries
    case _ => false
  }
  override def hashCode(): Int = entries.hashCode()
  override def toString: String =
    s"SubwordVocab(${entries.length} entries, maxLen $maxLen)"
}

object SubwordVocab {
  /** Fallback token-id base for single-code-point tokens: FallbackBase
    * + code point. Above any realistic vocab size and below
    * FallbackBase + 0x10FFFF < 2^22, so ids stay small ints disjoint
    * from vocab indices. */
  val FallbackBase = 2000000

  /** The in-repo default vocab (one entry per line, id = line index;
    * regenerate with [[graft.tools.VocabGen]]). */
  lazy val default: SubwordVocab = fromResource("/graft/subword_vocab.txt")

  def fromResource(path: String): SubwordVocab = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"vocab resource $path not on classpath")
    try fromLines(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  def fromLines(lines: Iterator[String]): SubwordVocab =
    new SubwordVocab(lines.filter(_.nonEmpty).toIndexedSeq)

  def apply(entries: Seq[String]): SubwordVocab =
    new SubwordVocab(entries.toIndexedSeq)
}
