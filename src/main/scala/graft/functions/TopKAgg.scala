package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-key top-k as an AGGREGATE FUNCTION — the scale-path twin of the
  * `row_number() OVER (PARTITION BY key ORDER BY …) <= k` idiom.
  *
  * Why an aggregate beats the window at 100 TB: the window form must
  * exchange EVERY input row to its key's reducer and then sort each
  * key's whole group, just to throw away all but k rows. An aggregate
  * with a bounded buffer does the same selection with a k-item heap,
  * and — because [[TypedImperativeAggregate]] participates in partial
  * aggregation — the map side already reduces each (key, partition) to
  * at most k rows BEFORE the exchange: the shuffle carries
  * k·partitions rows per key instead of the key's full group, and the
  * reducer merges heaps instead of sorting. Same number of exchanges,
  * a fraction of the bytes, no sort. (The same argument as Spark's own
  * `collect_top_k` used by the dataframe `limit` pushdown — expressed
  * here as a grouping aggregate with a deterministic tie-break.)
  *
  * Ordering contract: items rank by (score DESC, tie ASC) — the exact
  * (`col.desc`, `token` ASC) pair the window twins use — so results
  * are bit-identical to `row_number()`-then-filter for any input with a
  * unique (score, tie) pair per row. Rows with a NULL score, tie, or
  * payload are skipped (a window's frame would rank them; top-k
  * selection over scores has nothing to rank a NULL by).
  *
  * `topk_desc(score DOUBLE, tie STRING, payload ANY, k) →
  * array<payload>` sorted best-first; `posexplode` of the result
  * yields (rank−1, payload).
  */
object TopKFunctions {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_desc",
      exprs => TopKDesc(exprs(0), exprs(1), exprs(2),
        exprs(3).eval().asInstanceOf[Number].intValue()),
      "built-in")

  /** Column API (requires [[register]] on the session). */
  def topk_desc(score: Column, tie: Column, payload: Column, k: Int): Column =
    call_function("topk_desc", score, tie, payload,
      org.apache.spark.sql.functions.lit(k))

  /** Order-preserving STRING tie key matching the window twins'
    * natural-order `ORDER BY idCol` tie-break (ADVICE r9): string ids
    * compare as themselves; integral ids encode as the 16-hex-digit
    * unsigned image of `id XOR Long.MinValue` — flipping the sign bit
    * maps the signed long order onto the unsigned order, and
    * fixed-width uppercase hex compares lexicographically as the
    * unsigned value, so NEGATIVE ids order correctly too (ADVICE r10:
    * the previous decimal lpad zero-padded '-5' and silently
    * misordered it against positive ids). lpad to 16 never truncates
    * (hex of a 64-bit value is ≤ 16 digits). Any other type
    * (fractional, decimal, …) must be encoded by the caller —
    * failing at plan time beats diverging at row time.
    */
  def tieKey(c: Column, dt: DataType): Column = dt match {
    case StringType => c
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
      org.apache.spark.sql.functions.lpad(
        org.apache.spark.sql.functions.hex(
          c.cast("long").bitwiseXOR(org.apache.spark.sql.functions.lit(Long.MinValue))),
        16, "0")
    case other => throw new IllegalArgumentException(
      s"topk tie key: unsupported id type $other — pass a string or integral id, " +
        "or encode an order-preserving string key yourself")
  }
}

/** One buffered candidate: the ordering pair plus the payload as a
  * single-field UnsafeRow (generic over any payload type — the row is
  * the serialization).
  */
private[functions] final class TopKItem(
    val score: Double, val tie: UTF8String, val payload: UnsafeRow)

/** Bounded top-k buffer: a min-heap whose HEAD is the weakest held
  * item (score ASC, tie DESC), so admission is an O(1) compare against
  * the head and O(log k) on replace. Never holds more than k items —
  * executor memory per group is O(k), not group-sized.
  */
private[functions] final class TopKBuffer(val k: Int) {
  // head = worst: "a before b" when a is WORSE (lower score, or equal
  // score and larger tie)
  private val worstFirst: Ordering[TopKItem] = (a: TopKItem, b: TopKItem) => {
    val c = java.lang.Double.compare(b.score, a.score)
    if (c != 0) c else a.tie.compareTo(b.tie)
  }
  val heap: mutable.PriorityQueue[TopKItem] =
    mutable.PriorityQueue.empty[TopKItem](worstFirst)

  private def beats(a: TopKItem, w: TopKItem): Boolean = {
    val c = java.lang.Double.compare(a.score, w.score)
    c > 0 || (c == 0 && a.tie.compareTo(w.tie) < 0)
  }

  def add(it: TopKItem): Unit =
    if (heap.size < k) heap.enqueue(it)
    else if (beats(it, heap.head)) { heap.dequeue(); heap.enqueue(it) }

  /** Best-first (score DESC, tie ASC) — the output order. */
  def sorted: Seq[TopKItem] = heap.toSeq.sortWith { (a, b) =>
    val c = java.lang.Double.compare(a.score, b.score)
    if (c != 0) c > 0 else a.tie.compareTo(b.tie) < 0
  }
}

case class TopKDesc(
    score: Expression, tie: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  @transient private lazy val proj =
    UnsafeProjection.create(Array(payload.dataType))

  override def children: Seq[Expression] = Seq(score, tie, payload)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"topk_desc needs k > 0, got $k")
    else if (score.dataType != DoubleType || tie.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        "topk_desc expects (score DOUBLE, tie STRING, payload, k INT), got " +
          s"(${score.dataType.simpleString}, ${tie.dataType.simpleString}, …)")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_desc"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val t = tie.eval(input)
    val p = payload.eval(input)
    if (s != null && t != null && p != null) {
      // all three copy: eval results alias reused buffers
      b.add(new TopKItem(s.asInstanceOf[Double],
        t.asInstanceOf[UTF8String].clone(),
        proj.apply(InternalRow(p)).copy()))
    }
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach(b.add)
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sorted.map(_.payload.get(0, payload.dataType)).toArray)

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.heap.size)
    b.heap.foreach { it =>
      out.writeDouble(it.score)
      val tb = it.tie.getBytes
      out.writeInt(tb.length); out.write(tb)
      val pb = it.payload.getBytes
      out.writeInt(pb.length); out.write(pb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(k)
    val n = buf.getInt
    var i = 0
    while (i < n) {
      val s = buf.getDouble
      val tb = new Array[Byte](buf.getInt); buf.get(tb)
      val pb = new Array[Byte](buf.getInt); buf.get(pb)
      val row = new UnsafeRow(1)
      row.pointTo(pb, pb.length)
      b.add(new TopKItem(s, UTF8String.fromBytes(tb), row))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDesc =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDesc =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKDesc =
    copy(score = newChildren(0), tie = newChildren(1), payload = newChildren(2))
}
