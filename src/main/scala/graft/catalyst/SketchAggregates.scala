package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native KMV (k-minimum-values) sketch aggregate: keeps the k smallest
  * DISTINCT long hashes per group in a bounded buffer — the
  * map-side-combining form of the distinct-cardinality sketch.
  *
  * Why an imperative aggregate and not the window/`collect_set` forms
  * used elsewhere: `row_number() OVER (ORDER BY h) <= k` shuffles every
  * distinct hash to its group's partition before discarding all but k,
  * and `slice(sort_array(collect_set(h)), 1, k)` holds the ENTIRE
  * distinct set in the aggregation buffer — both are cardinality-bound
  * memory/network, the opposite of what a sketch is for. This buffer is
  * ≤ k longs no matter the input, partial aggregation runs map-side
  * (each task contributes at most k values per group to the exchange),
  * and `merge` is the KMV union: k smallest of the concatenation. The
  * result column is the sorted sketch itself, so callers derive the
  * cardinality estimate ((k−1)·2^60 / kth-min for 60-bit draws) AND can
  * merge persisted sketches relationally (union, re-take k smallest) —
  * the incremental-profile shape.
  *
  * Determinism: pure function of the input value SET (TreeSet dedups;
  * insertion order irrelevant), so any deterministic hash column yields
  * an oracle-replayable sketch. */
case class KmvSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k >= 1, s"k must be positive: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) buf.add(v)
    else if (v < buf.last()) { buf.add(v); if (buf.size > k) buf.pollLast() }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // ascending — TreeSet iteration order
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

/** Column face of the sketch aggregates. */
object SketchFunctions {
  /** KMV sketch column: the ≤ k smallest distinct values of a LONG hash
    * column per group, sorted ascending. */
  def kmvSketch(h: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvSketchAgg(Cast(GraftColumnBridge.expression(h), LongType), k)
        .toAggregateExpression())
}
