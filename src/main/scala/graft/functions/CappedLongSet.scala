package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `collect_set` with a HARD aggregation-state bound (round-12 ADVICE:
  * q170's cell cap must be a memory guard, not just a semantic rule).
  *
  * `collect_set(x)` + `filter(size(...) <= cap)` materializes the
  * viral group's FULL distinct set — an unbounded, non-spillable
  * ObjectHashAggregate buffer — just to throw it away at the filter. A
  * window pre-count bounds memory (WindowExec spills) but costs an
  * extra distinct + exchange (measured +0.9 s on q170 at sf0.1). This
  * aggregate keeps the r11 single-exchange plan shape and makes the
  * bound physical: a buffer STOPS absorbing at cap+1 distinct values
  * (the saturation marker) and evaluates to NULL — by construction no
  * buffer, partial or merged, ever holds more than cap+1 longs.
  *
  * Exactness of the drop rule: a partial buffer saturates only if it
  * alone saw > cap distinct values (then the group total is > cap —
  * correctly dropped); if the group's true distinct count is <= cap,
  * no partial can saturate and merges reassemble the exact set. The
  * result array is SORTED ascending for deterministic downstream
  * iteration (the q170 pair emission sorts anyway).
  */
case class CappedLongSet(
    child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[Long]]
  with UnaryLike[Expression] {

  require(cap > 0, "cap must be positive")

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long]()

  override def update(buffer: java.util.HashSet[Long],
                      input: InternalRow): java.util.HashSet[Long] = {
    val v = child.eval(input)
    // size <= cap: may grow to cap+1, the saturation marker; beyond
    // that the buffer is inert — the group is already condemned
    if (v != null && buffer.size() <= cap) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: java.util.HashSet[Long],
                     other: java.util.HashSet[Long]): java.util.HashSet[Long] = {
    val it = other.iterator()
    while (it.hasNext && buffer.size() <= cap) buffer.add(it.next())
    buffer
  }

  override def eval(buffer: java.util.HashSet[Long]): Any =
    if (buffer.size() > cap) null
    else {
      val arr = new Array[Long](buffer.size())
      val it = buffer.iterator(); var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

  override def serialize(buffer: java.util.HashSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size())
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.HashSet[Long](Math.max(4, n * 2))
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedLongSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedLongSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedLongSet =
    copy(child = newChild)
  override def prettyName: String = "capped_long_set"
}
