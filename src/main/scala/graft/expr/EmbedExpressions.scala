package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Embedding-similarity kernels. All arithmetic is integer-exact over
  * QUANTIZED vectors (round(x*1000) as int64) so the DuckDB oracle can
  * express the same functions bit-for-bit:
  *  - projections fit int64 (|q|≤~10^4, |w|<5.1e5, dim 64 ⇒ |proj|≤2^41)
  *  - and double-exactly (<2^53) on the DuckDB side.
  */
object EmbedRT {
  val Tables = 4
  val Bits = 16
  private val WMod = 1000003L
  private val WShift = 501001L
  private val WMul = 2654435761L

  /** Deterministic integer hyperplane weight for (hyperplane h, dim i). */
  @inline def weight(h: Int, i: Int): Long =
    (WMul * (h.toLong * 64 + i + 1)) % WMod - WShift

  /** LSH bucket per table: bit k of table t = [proj of hyperplane
    * h=t*16+k is > 0]. Returns Tables bucket ids in [0, 2^Bits). */
  def lshBuckets(q: ArrayData): ArrayData = {
    val dim = q.numElements()
    val out = new Array[Long](Tables)
    var t = 0
    while (t < Tables) {
      var bucket = 0L
      var k = 0
      while (k < Bits) {
        val h = t * Bits + k
        var proj = 0L
        var i = 0
        while (i < dim) {
          proj += q.getLong(i) * weight(h, i)
          i += 1
        }
        if (proj > 0) bucket |= (1L << k)
        k += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Integer dot product of two quantized vectors (|q|≤~2·10^4, dim 64
    * ⇒ |dot| ≤ 64·4·10^8 < 2^53 — exact in DuckDB doubles too). */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n, "dimension mismatch")
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Integer squared L2 distance of two quantized vectors. */
  def l2q(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n, "dimension mismatch")
    var s = 0L
    var i = 0
    while (i < n) { val d = a.getLong(i) - b.getLong(i); s += d * d; i += 1 }
    s
  }

  /** Top-`nProbe` centroid ids for q by exact integer squared L2, ties
    * → smallest sid (the IVF coarse-quantizer ranking). `cents` is the
    * row-major flattened k×dim centroid matrix, `sids` the k centroid
    * ids — driver constants referenced from codegen, so the per-row
    * cost is one tight primitive loop (k·dim multiplies + an
    * O(k·nProbe) insertion), no row fan-out, no boxing. */
  def ivfTop(q: ArrayData, cents: Array[Long], sids: Array[Long],
      nProbe: Int): ArrayData = {
    val dim = q.numElements()
    val k = sids.length
    require(cents.length == k * dim, "centroid matrix / dim mismatch")
    val qa = new Array[Long](dim)
    var i = 0
    while (i < dim) { qa(i) = q.getLong(i); i += 1 }
    val keep = math.min(nProbe, k)
    val bestD = Array.fill(keep)(Long.MaxValue)
    val bestS = Array.fill(keep)(Long.MaxValue)
    var c = 0
    while (c < k) {
      var s = 0L
      val off = c * dim
      var j = 0
      while (j < dim) { val d = qa(j) - cents(off + j); s += d * d; j += 1 }
      val sid = sids(c)
      var slot = -1
      var p = keep - 1
      while (p >= 0 && (s < bestD(p) || (s == bestD(p) && sid < bestS(p)))) {
        slot = p; p -= 1
      }
      if (slot >= 0) {
        var n = keep - 1
        while (n > slot) { bestD(n) = bestD(n - 1); bestS(n) = bestS(n - 1); n -= 1 }
        bestD(slot) = s; bestS(slot) = sid
      }
      c += 1
    }
    new GenericArrayData(bestS)
  }

  /** PQ encode: for each of `m` subspaces of width `dsub`, the INDEX
    * (0..k-1) of the nearest sub-centroid by exact integer L2, ties →
    * the smallest index. `cents` is the flat m×k×dsub codebook. With
    * sub-centroids ordered by ascending seed id, index order == seed-id
    * order, so the tie rule matches the SQL mirror's (d2, pid) window.
    * Returns m code indices. */
  def pqEncode(q: ArrayData, cents: Array[Long], m: Int, k: Int,
      dsub: Int): ArrayData = {
    require(q.numElements() == m * dsub, "dim != m*dsub")
    require(cents.length == m * k * dsub, "codebook shape mismatch")
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      out(s) = nearestSub(q, cents, s, k, dsub).toLong
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Nearest sub-centroid index for subspace `s` (ties → smallest). */
  @inline private def nearestSub(q: ArrayData, cents: Array[Long], s: Int,
      k: Int, dsub: Int): Int = {
    var best = Long.MaxValue
    var bestI = 0
    var c = 0
    while (c < k) {
      var d2 = 0L
      val off = (s * k + c) * dsub
      var j = 0
      while (j < dsub) {
        val d = q.getLong(s * dsub + j) - cents(off + j)
        d2 += d * d
        j += 1
      }
      if (d2 < best) { best = d2; bestI = c }
      c += 1
    }
    bestI
  }

  /** PACKED PQ encode: identical indices to [[pqEncode]] but ONE BYTE
    * per subspace (requires k ≤ 256) — the inverted-list layout that
    * fits 10^9 vectors in executor memory: m+8 bytes per code column
    * row instead of m 8-byte longs inside an ArrayData. */
  def pqEncodePacked(q: ArrayData, cents: Array[Long], m: Int, k: Int,
      dsub: Int): Array[Byte] = {
    require(q.numElements() == m * dsub, "dim != m*dsub")
    require(cents.length == m * k * dsub, "codebook shape mismatch")
    require(k <= 256, s"packed codes need k <= 256 (got $k)")
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      out(s) = nearestSub(q, cents, s, k, dsub).toByte
      s += 1
    }
    out
  }

  /** ADC over PACKED codes: Σ_s dtable[s*k + (codes[s] & 0xff)]. */
  def pqAdcPacked(dtable: ArrayData, codes: Array[Byte], k: Int): Long = {
    require(dtable.numElements() == codes.length * k,
      "dtable/codes shape mismatch")
    var acc = 0L
    var s = 0
    while (s < codes.length) {
      acc += dtable.getLong(s * k + (codes(s) & 0xff))
      s += 1
    }
    acc
  }

  /** PQ asymmetric distance table for a QUERY vector: dt[s*k + c] =
    * exact integer L2 between the query's subvector s and sub-centroid
    * c. One table per probe row turns candidate scoring into m array
    * lookups ([[pqAdc]]) — the big (inverted-list) side ships m codes
    * instead of the full vector. */
  def pqDtable(q: ArrayData, cents: Array[Long], m: Int, k: Int,
      dsub: Int): ArrayData = {
    require(q.numElements() == m * dsub, "dim != m*dsub")
    require(cents.length == m * k * dsub, "codebook shape mismatch")
    val out = new Array[Long](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        var d2 = 0L
        val off = (s * k + c) * dsub
        var j = 0
        while (j < dsub) {
          val d = q.getLong(s * dsub + j) - cents(off + j)
          d2 += d * d
          j += 1
        }
        out(s * k + c) = d2
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: Σ_s dtable[s*k + codes[s]] — the PQ approximation of
    * the query↔candidate squared L2. */
  def pqAdc(dtable: ArrayData, codes: ArrayData, k: Int): Long = {
    val m = codes.numElements()
    require(dtable.numElements() == m * k, "dtable/codes shape mismatch")
    var acc = 0L
    var s = 0
    while (s < m) {
      acc += dtable.getLong(s * k + codes.getLong(s).toInt)
      s += 1
    }
    acc
  }
}

/** lsh_buckets(q ARRAY<BIGINT>) → ARRAY<BIGINT> of 4 16-bit bucket ids. */
case class LshBucketsExpr(q: Expression) extends UnaryExpression {
  override def child: Expression = q
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    EmbedRT.lshBuckets(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.EmbedRT.lshBuckets($c)")
  override protected def withNewChildInternal(c: Expression): LshBucketsExpr = copy(c)
}

/** vec_dot(a, b) → BIGINT integer dot product of quantized vectors. */
case class VecDotExpr(a: Expression, b: Expression) extends BinaryExpression {
  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(x: Any, y: Any): Any =
    EmbedRT.dot(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expr.EmbedRT.dot($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotExpr =
    copy(a = l, b = r)
}

/** vec_l2q(a, b) → BIGINT integer squared L2 distance. */
case class VecL2qExpr(a: Expression, b: Expression) extends BinaryExpression {
  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(x: Any, y: Any): Any =
    EmbedRT.l2q(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expr.EmbedRT.l2q($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2qExpr =
    copy(a = l, b = r)
}

/** ivf_top(q) → ARRAY<BIGINT> of the nProbe best centroid sids, rank
  * order; the centroid matrix rides as driver-constant reference
  * objects (NOT literal children — a 256×64 literal bloats plan
  * stringification, canonicalization and codegen constant folding). */
case class IvfTopExpr(q: Expression, cents: Array[Long], sids: Array[Long],
    nProbe: Int) extends UnaryExpression {
  override def child: Expression = q
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    EmbedRT.ivfTop(a.asInstanceOf[ArrayData], cents, sids, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "long[]")
    val sRef = ctx.addReferenceObj("ivfSids", sids, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.EmbedRT.ivfTop($c, $cRef, $sRef, $nProbe)")
  }
  override protected def withNewChildInternal(c: Expression): IvfTopExpr =
    copy(q = c)
}

/** pq_encode(q) → ARRAY<BIGINT>[m] of sub-centroid indices; codebook
  * rides as a codegen reference object (see IvfTopExpr). */
case class PqEncodeExpr(q: Expression, cents: Array[Long], m: Int, k: Int,
    dsub: Int) extends UnaryExpression {
  override def child: Expression = q
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    EmbedRT.pqEncode(a.asInstanceOf[ArrayData], cents, m, k, dsub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCents", cents, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.EmbedRT.pqEncode($c, $cRef, $m, $k, $dsub)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(q = c)
}

/** pq_dtable(q) → ARRAY<BIGINT>[m·k] asymmetric distance table. */
case class PqDtableExpr(q: Expression, cents: Array[Long], m: Int, k: Int,
    dsub: Int) extends UnaryExpression {
  override def child: Expression = q
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    EmbedRT.pqDtable(a.asInstanceOf[ArrayData], cents, m, k, dsub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCents", cents, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.EmbedRT.pqDtable($c, $cRef, $m, $k, $dsub)")
  }
  override protected def withNewChildInternal(c: Expression): PqDtableExpr =
    copy(q = c)
}

/** pq_encode_packed(q) → BINARY[m] — one byte per subspace (k ≤ 256):
  * the billion-scale inverted-list layout ([[EmbedRT.pqEncodePacked]]);
  * same indices as [[PqEncodeExpr]], which the trainer keeps for its
  * per-subspace explode over the bounded sample. */
case class PqEncodePackedExpr(q: Expression, cents: Array[Long], m: Int,
    k: Int, dsub: Int) extends UnaryExpression {
  override def child: Expression = q
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    EmbedRT.pqEncodePacked(a.asInstanceOf[ArrayData], cents, m, k, dsub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCents", cents, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.EmbedRT.pqEncodePacked($c, $cRef, $m, $k, $dsub)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodePackedExpr =
    copy(q = c)
}

/** pq_adc_packed(dtable, codes BINARY) → BIGINT approximate squared L2. */
case class PqAdcPackedExpr(dtable: Expression, codes: Expression, k: Int)
    extends BinaryExpression {
  override def left: Expression = dtable
  override def right: Expression = codes
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(x: Any, y: Any): Any =
    EmbedRT.pqAdcPacked(x.asInstanceOf[ArrayData], y.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expr.EmbedRT.pqAdcPacked($l, $r, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcPackedExpr =
    copy(dtable = l, codes = r)
}

/** pq_adc(dtable, codes) → BIGINT approximate squared L2. */
case class PqAdcExpr(dtable: Expression, codes: Expression, k: Int)
    extends BinaryExpression {
  override def left: Expression = dtable
  override def right: Expression = codes
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(x: Any, y: Any): Any =
    EmbedRT.pqAdc(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.expr.EmbedRT.pqAdc($l, $r, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcExpr =
    copy(dtable = l, codes = r)
}

object EmbedFunctions {
  import org.apache.spark.sql.graftbridge.{column, expression}
  def lsh_buckets(q: Column): Column = column(LshBucketsExpr(expression(q)))
  def vec_dot(a: Column, b: Column): Column =
    column(VecDotExpr(expression(a), expression(b)))
  def vec_l2q(a: Column, b: Column): Column =
    column(VecL2qExpr(expression(a), expression(b)))
  def ivf_top(q: Column, cents: Array[Long], sids: Array[Long],
      nProbe: Int): Column =
    column(IvfTopExpr(expression(q), cents, sids, nProbe))
  def pq_encode(q: Column, cents: Array[Long], m: Int, k: Int,
      dsub: Int): Column =
    column(PqEncodeExpr(expression(q), cents, m, k, dsub))
  def pq_dtable(q: Column, cents: Array[Long], m: Int, k: Int,
      dsub: Int): Column =
    column(PqDtableExpr(expression(q), cents, m, k, dsub))
  def pq_adc(dtable: Column, codes: Column, k: Int): Column =
    column(PqAdcExpr(expression(dtable), expression(codes), k))
  def pq_encode_packed(q: Column, cents: Array[Long], m: Int, k: Int,
      dsub: Int): Column =
    column(PqEncodePackedExpr(expression(q), cents, m, k, dsub))
  def pq_adc_packed(dtable: Column, codes: Column, k: Int): Column =
    column(PqAdcPackedExpr(expression(dtable), expression(codes), k))
}
