package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Grouped bounded top-k as a TYPED AGGREGATE — the scalable
  * alternative to `row_number().over(Window.partitionBy(g))` + rank
  * filter for "top m per group over a huge candidate set".
  *
  * Why: a rank window must SORT each task's candidate rows before the
  * group limit applies (WindowGroupLimit walks sorted input), so a
  * candidate scan that emits n rows pays n·log n comparison sort per
  * task — measured as the d_ann_topk wall at the 64× blow-up (the
  * float-dot scan was only a minority of the profile; the partial
  * sort of ~26M candidate rows was the rest). A bounded heap
  * aggregate is O(n·log m) with NO sort, participates in map-side
  * partial aggregation (each task ships at most m entries per group
  * it touched — the shuffle is tasks×groups×m, never n), and its
  * merge is heap-union. This is the standard top-k-by-group shape for
  * scans whose candidate count is quadratic-ish in corpus size.
  *
  * Determinism: the kept set and its order depend only on the
  * (score DESC, id ASC) total order — partitioning-invariant.
  * Returns array<struct<score double, id bigint>> sorted by that
  * order. NaN scores rank above +Inf (java compare semantics) but
  * ties stay total via the id.
  */
case class BoundedTopK(scoreExpr: Expression, idExpr: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedTopK.Heap]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(m > 0, "top-k bound must be positive")

  // declared input types: a mistyped caller (a long count as score, an
  // int id) is coerced — or refused — at ANALYSIS time instead of
  // surfacing as a per-row executor ClassCastException mid-job
  // (GraftShim.AbstractType: Spark 4 made AbstractDataType
  // private[sql], the shim re-exposes it)
  override def inputTypes: Seq[GraftShim.AbstractType] =
    Seq(DoubleType, LongType)

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): BoundedTopK.Heap =
    new BoundedTopK.Heap(m)

  override def update(buf: BoundedTopK.Heap, input: InternalRow): BoundedTopK.Heap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: BoundedTopK.Heap, b: BoundedTopK.Heap): BoundedTopK.Heap = {
    b.foreach(a.offer)
    a
  }

  override def eval(buf: BoundedTopK.Heap): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: BoundedTopK.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.sortedDesc
    out.writeInt(items.length)
    items.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = new BoundedTopK.Heap(m)
    var k = 0
    while (k < n) { heap.offer(in.readDouble(), in.readLong()); k += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object BoundedTopK {

  /** Bounded binary min-heap over (score, id) ranked by the
    * (score DESC, id ASC) total order: the ROOT is the worst kept
    * entry, evicted when a better candidate arrives. Arrays, no
    * boxing.
    */
  final class Heap(m: Int) {
    private val scores = new Array[Double](m)
    private val ids = new Array[Long](m)
    private var n = 0

    // a is strictly WORSE than b in the kept order (score desc, id asc)
    private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
      val c = java.lang.Double.compare(sa, sb)
      c < 0 || (c == 0 && ia > ib)
    }

    def offer(s: Double, i: Long): Unit = {
      if (n < m) {
        var k = n
        scores(k) = s; ids(k) = i; n += 1
        // sift up: parents must be worse-or-equal than children
        while (k > 0) {
          val p = (k - 1) >> 1
          if (worse(scores(k), ids(k), scores(p), ids(p))) {
            swap(k, p); k = p
          } else return
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        siftDown()
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftDown(): Unit = {
      var k = 0
      while (true) {
        val l = 2 * k + 1; val r = l + 1
        var worst = k
        if (l < n && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
        if (r < n && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
        if (worst == k) return
        swap(k, worst); k = worst
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var k = 0
      while (k < n) { f(scores(k), ids(k)); k += 1 }
    }

    /** Kept entries by (score DESC, id ASC). */
    def sortedDesc: Array[(Double, Long)] = {
      val out = Array.tabulate(n)(k => (scores(k), ids(k)))
      scala.util.Sorting.stableSort(out, (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(b._1, a._1)
        c < 0 || (c == 0 && a._2 < b._2)
      })
      out
    }
  }

  /** Column API: top `m` (score, id) pairs per group, sorted by
    * (score DESC, id ASC), as array<struct<score, id>>.
    */
  def boundedTopK(score: Column, id: Column, m: Int): Column =
    GraftShim.column(
      BoundedTopK(GraftShim.expression(score), GraftShim.expression(id), m)
        .toAggregateExpression())
}
