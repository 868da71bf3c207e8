package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar SQL forms of the per-document dedup signatures, so the SQL
  * surface can compute exactly what the oracle-checked batch operators
  * compute (`SELECT doc_id, simhash16(text) FROM documents` ≡ q16's
  * signature column). Both are eval-only (CodegenFallback): the BATCH
  * hot paths keep their fused kernels (NibbleHighMask projection,
  * typed shingle flatMap); these exist for API completeness — ad-hoc
  * SQL, views, downstream tools — where per-row eval cost is
  * irrelevant next to having the signature at all.
  */

/** 16-bit frequency-weighted SimHash of whitespace-tokenized text —
  * bit-identical to `ops.Dedup.simhash`'s per-doc value (vote b_k > 0
  * with token multiplicity; high bit of md5 hex nibble k). */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = input.asInstanceOf[UTF8String].toString
      .trim.split("\\s+").filter(_.nonEmpty)
    val votes = new Array[Long](16)
    toks.foreach { t =>
      val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var k = 0
      while (k < 16) {
        // hex nibble k: high half of byte k/2 for even k, low for odd
        val nib = if (k % 2 == 0) (d(k / 2) >> 4) & 0xf else d(k / 2) & 0xf
        votes(k) += (if (nib >= 8) 1L else -1L)
        k += 1
      }
    }
    var hash = 0L
    var k = 0
    while (k < 16) { if (votes(k) > 0L) hash |= (1L << k); k += 1 }
    hash
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** Sorted distinct 3-gram shingle hashes of whitespace-tokenized text
  * at the given bit width — the per-doc primitive under q14/q15/q52/
  * q62/q72/q83, exposed to SQL (`shingle_hashes(text)` defaults to
  * the 64-bit library width; pass 32 for the oracle-mirrorable
  * form). Matches `ops.Dedup.shingleRows` exactly: texts under 3
  * tokens yield an empty array. */
case class ShingleHashes(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val t = input.asInstanceOf[UTF8String].toString
      .trim.split("\\s+").filter(_.nonEmpty)
    val hvs =
      if (t.length < 3) Array.empty[Long]
      else (0 to t.length - 3).map { i =>
        MinhashKernel.packDigest(md.digest(s"${t(i)} ${t(i + 1)} ${t(i + 2)}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)), bits)
      }.distinct.sorted.toArray
    new GenericArrayData(hvs)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Shared per-doc MinHash kernel for the SQL scalars below — the same
  * arithmetic as `ops.Dedup.docShingleSummaryOf` (one md5 per 3-gram
  * shingle, 64-bit hv xor-folded to its unsigned-32 image, 16 affine
  * permutations mod the Mersenne prime), kept in one place so the SQL
  * surface and the batch kernel cannot drift. Returns null for texts
  * under 3 tokens: those documents emit NO summary row in the batch
  * path, and null is the scalar image of "no row" (`WHERE
  * minhash_sig(text) IS NOT NULL` recovers the relation). */
private[functions] object MinhashKernel {
  /** md5-prefix packing at the 32/64-bit widths — ONE copy for both
    * scalar families in this file (mirrors ops.Dedup.packHash, whose
    * agreement the scalar==batch specs pin). */
  def packDigest(d: Array[Byte], bits: Int): Long =
    if (bits == 32)
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    else
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)

  def minhashOf(text: String, bits: Int): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val t = text.trim.split("\\s+").filter(_.nonEmpty)
    if (t.length < 3) return null
    val params = graft.core.Consts.MinhashParams.toArray
    val prime = graft.core.Consts.MinhashPrime
    val mh = Array.fill(params.length)(Long.MaxValue)
    var i = 0
    while (i <= t.length - 3) {
      val hv = packDigest(md.digest(s"${t(i)} ${t(i + 1)} ${t(i + 2)}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)), bits)
      // min over a multiset equals min over the set, so no distinct
      // pass is needed before the permutations
      val h32 = (hv >>> 32) ^ (hv & 0xffffffffL)
      var j = 0
      while (j < params.length) {
        val v = (h32 * params(j)._1 + params(j)._2) % prime
        if (v < mh(j)) mh(j) = v
        j += 1
      }
      i += 1
    }
    mh
  }
}

/** `minhash_sig(text[, bits])` — q14's 16-value MinHash signature as a
  * SQL scalar (array<bigint>, null for <3-token texts). */
case class MinhashSig(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val mh = MinhashKernel.minhashOf(input.asInstanceOf[UTF8String].toString, bits)
    if (mh == null) null else new GenericArrayData(mh)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** `lsh_bands(text[, bits])` — q14's 4 pre-concatenated LSH band
  * strings as a SQL scalar (array<string>, null for <3-token texts).
  * Band b is rows [b*rowsPer, (b+1)*rowsPer) of the signature joined
  * with '|', exactly the banded-summary column the candidate
  * self-equi-join shuffles on. */
case class LshBandStrings(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val mh = MinhashKernel.minhashOf(input.asInstanceOf[UTF8String].toString, bits)
    if (mh == null) return null
    val nBands = graft.core.Consts.LshBands
    val rowsPer = graft.core.Consts.LshRowsPerBand
    val bands = Array.tabulate[AnyRef](nBands) { b =>
      UTF8String.fromString(
        (0 until rowsPer).map(r => mh(b * rowsPer + r)).mkString("|"))
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandStrings =
    copy(child = newChild)
}
