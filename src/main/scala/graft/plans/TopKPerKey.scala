package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator custom plan: top-k rows per key under an ordering,
  * with a dense 1..k rank column appended — the relational shape of
  * "best N detections per stream" (reference: the NMS confidence sort,
  * YOLODetector.java:294, relationalized per SURVEY.md §2 "window
  * functions").
  *
  * Why a custom operator instead of `row_number().over(window)`: the
  * window form sorts EVERY group's full row set after the shuffle
  * (O(n log n) per group, and a straggler on any hot key), and ships
  * all rows through the exchange. This operator keeps a bounded k-heap
  * per key on BOTH sides of the exchange — the map side discards all
  * but k rows per (partition, key) before shuffling, the reduce side
  * merges heaps — so shuffle volume is ≤ k·keys·partitions rows and
  * per-group cost is O(n log k), insensitive to key skew.
  *
  * Memory: the hash phase holds O(distinct keys per partition × k)
  * rows, the same residency class as a hash aggregate's map. Like
  * ObjectHashAggregate, the map is BOUNDED: past
  * `spark.graft.topk.maxKeysInMemory` distinct keys (default 65536)
  * the operator falls back to sort-based evaluation — kept heap rows
  * plus the remaining input go through an `UnsafeExternalRowSorter`
  * (key-first ordering, task-memory-managed, spills to disk), and
  * top-k per key is read off each sorted group. Heap evictions that
  * happened before the switch are safe to discard: an evicted row is
  * dominated by k same-key rows that are all still present.
  *
  * The full custom-operator ladder is exercised: logical UnaryNode →
  * Strategy (injected via SparkSessionExtensions or
  * spark.experimental.extraStrategies) → partial+final physical execs
  * with a required ClusteredDistribution that EnsureRequirements
  * satisfies with a single hash exchange.
  */
case class TopKPerKeyNode(
    keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan,
    keepTies: Boolean = false) extends UnaryNode {

  require(k >= 1, s"TopKPerKeyNode requires k >= 1, got $k")
  // keep-ties is the rank()/dense_rank() = 1 shape: the kept set is
  // the tie group for the best order value, so a k past 1 has no
  // bounded-heap meaning (rank <= k admits more than k rows on ties)
  require(!keepTies || k == 1,
    s"TopKPerKeyNode keep-ties mode requires k == 1, got $k")

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    rankAttr: Option[AttributeReference],
    keepTies: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output ++ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // Observability for the two memory-pressure events this operator can
  // take (mirroring ObjectHashAggregate's "number of sort fallback
  // tasks"): heap evictions are the normal bounded-heap discipline at
  // work; a sort fallback means a partition's key cardinality outgrew
  // spark.graft.topk.maxKeysInMemory and the partition switched to the
  // spillable external sort. Visible in the formatted plan / Spark UI.
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "heapEvictions" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of heap evictions"),
    "sortFallbackTasks" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of sort fallback tasks"),
    "sortFallbackKeys" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of keys handed to sort fallback"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val childSchema = child.schema
    val keyExprs = keys
    val orderExprs = order
    val kk = k
    val isPartial = partial
    val ties = keepTies
    val maxKeys = conf
      .getConfString("spark.graft.topk.maxKeysInMemory", "65536").toInt
    val numOutputRows = longMetric("numOutputRows")
    val heapEvictions = longMetric("heapEvictions")
    val sortFallbackTasks = longMetric("sortFallbackTasks")
    val sortFallbackKeys = longMetric("sortFallbackKeys")
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(orderExprs, childOutput)
      // heap head is the WORST kept row (reverse order) → O(log k) evict
      val reverse = ordering.reversed()
      val heaps = new java.util.LinkedHashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      // pending row that would have created key maxKeys+1 (fallback only)
      var overflowRow: InternalRow = null
      while (it.hasNext && overflowRow == null) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxKeys) overflowRow = row.copy()
          else {
            heap = new java.util.PriorityQueue[InternalRow](kk, reverse)
            heaps.put(key.copy(), heap)
          }
        }
        if (heap != null) {
          if (ties) {
            // keep-ties (k = 1): the heap holds the current tie group
            // for the best order value — every element compares equal,
            // so peek() is a representative. Strictly better row →
            // the whole group evicts; tied → joins; worse → dropped.
            // State is bounded by the tie group, i.e. by the output.
            if (heap.isEmpty) heap.add(row.copy())
            else {
              val cmp = ordering.compare(row, heap.peek())
              if (cmp < 0) {
                heapEvictions += heap.size()
                heap.clear()
                heap.add(row.copy())
              } else if (cmp == 0) heap.add(row.copy())
            }
          } else if (heap.size() < kk) heap.add(row.copy())
          else if (ordering.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
            heapEvictions += 1
          }
        }
      }
      if (overflowRow != null) {
        sortFallbackTasks += 1
        sortFallbackKeys += heaps.size()
        // Sort-based fallback: key-cardinality outgrew the map bound.
        // Everything kept so far + the rest of the input goes through a
        // task-memory-managed external sort on (keys, order); top-k per
        // key is then the first k rows of each sorted group. Constant
        // zero prefix → the sorter always compares with the full
        // ordering (radix off); memory is bounded by the task budget,
        // excess spills to disk.
        val keyFirstOrdering = GenerateOrdering.generate(
          keyExprs.map(SortOrder(_, Ascending)) ++ orderExprs, childOutput)
        val prefixComputer =
          new org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer {
            private val zero =
              new org.apache.spark.sql.execution.UnsafeExternalRowSorter.PrefixComputer.Prefix
            override def computePrefix(row: InternalRow) = zero
          }
        val sorter = org.apache.spark.sql.execution.UnsafeExternalRowSorter.create(
          childSchema, keyFirstOrdering,
          org.apache.spark.util.collection.unsafe.sort.PrefixComparators.LONG,
          prefixComputer, org.apache.spark.sql.GraftSqlBridge.pageSizeBytes,
          false)
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        def insert(r: InternalRow): Unit = r match {
          case u: UnsafeRow => sorter.insertRow(u)
          case other        => sorter.insertRow(toUnsafe(other))
        }
        val heapIt = heaps.values().iterator()
        while (heapIt.hasNext) heapIt.next().forEach(insert(_))
        heaps.clear()
        insert(overflowRow)
        while (it.hasNext) insert(it.next())
        val sorted = sorter.sort()
        val outAttrs =
          if (isPartial) childOutput else childOutput :+ rankAttr.get
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        new Iterator[InternalRow] {
          private var prevKey: UnsafeRow = null
          private var inGroup = 0
          private var groupBest: InternalRow = null
          private var nextRow: InternalRow = null
          private def advance(): Unit = {
            nextRow = null
            while (nextRow == null && sorted.hasNext) {
              val r = sorted.next()
              val key = keyProj(r)
              if (prevKey == null || !key.equals(prevKey)) {
                prevKey = key.copy(); inGroup = 0
                if (ties) groupBest = r.copy()
              }
              if (ties) {
                // keep-ties: the group is sorted best-first, so keep
                // rows while they compare equal to the group head
                // (rank stays 1); once a worse row appears the rest
                // of the group is all worse — scanned only to find
                // the next key boundary
                if (ordering.compare(r, groupBest) == 0) {
                  inGroup = 1; nextRow = r
                }
              } else if (inGroup < kk) { inGroup += 1; nextRow = r }
            }
          }
          advance()
          override def hasNext: Boolean = nextRow != null
          override def next(): InternalRow = {
            val r = nextRow
            val out =
              if (isPartial) proj(r)
              else { rankRow.setInt(0, inGroup); proj(joined(r, rankRow)) }
            numOutputRows += 1
            advance()
            out
          }
        }
      } else if (isPartial) {
        // emit kept rows unranked; the final pass re-ranks after merge
        val entries = heaps.values().iterator()
        new Iterator[InternalRow] {
          private var cur: java.util.Iterator[InternalRow] =
            java.util.Collections.emptyIterator()
          override def hasNext: Boolean = {
            while (!cur.hasNext && entries.hasNext)
              cur = entries.next().iterator()
            cur.hasNext
          }
          override def next(): InternalRow = {
            numOutputRows += 1
            cur.next()
          }
        }
      } else {
        val outAttrs = childOutput :+ rankAttr.get
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        new Iterator[InternalRow] {
          private val outer = heaps.values().iterator()
          private var sorted: Array[InternalRow] = Array.empty
          private var idx = 0
          override def hasNext: Boolean = {
            while (idx >= sorted.length && outer.hasNext) {
              sorted = outer.next().toArray(new Array[InternalRow](0))
              java.util.Arrays.sort(sorted, ordering)
              idx = 0
            }
            idx < sorted.length
          }
          override def next(): InternalRow = {
            val r = sorted(idx)
            idx += 1
            // dense rank 1..k within the key; keep-ties emits the tie
            // group, all at rank 1 (the sort over equal rows is a
            // no-op kept for code unity)
            rankRow.setInt(0, if (ties) 1 else idx)
            numOutputRows += 1
            proj(joined(r, rankRow))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child, keepTies) =>
      val childPlan = planLater(child)
      val part = TopKPerKeyExec(keys, order, k, partial = true, None, keepTies, childPlan)
      TopKPerKeyExec(keys, order, k, partial = false, Some(rankAttr), keepTies, part) :: Nil
    case _ => Nil
  }
}

/** Column-API entry point. */
object TopK {

  /** Ensures the strategy is installed on the session (idempotent and
    * synchronized — concurrent query construction must not lose a
    * check-then-append; complements the GraftExtensions route).
    */
  def ensure(spark: SparkSession): Unit = synchronized {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    if (!exp.extraOptimizations.contains(TopKRewriteRule))
      exp.extraOptimizations = exp.extraOptimizations :+ TopKRewriteRule
  }

  /** Top `k` rows per `keyCols` group under `orderSpec`
    * ((column, ascending) pairs; ties broken by later columns), with a
    * dense rank column `rn` (1..k) appended.
    */
  def perKey(df: DataFrame, keyCols: Seq[String],
      orderSpec: Seq[(String, Boolean)], k: Int,
      rankCol: String = "rn"): DataFrame = {
    require(k >= 1, s"TopK.perKey requires k >= 1, got $k")
    val spark = df.sparkSession
    ensure(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name)}"))
    val keys = keyCols.map(attr)
    val order = orderSpec.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val rank = AttributeReference(rankCol, IntegerType, nullable = false)()
    GraftSqlBridge.ofRows(spark,
      TopKPerKeyNode(keys, order, k, rank, analyzed))
  }
}
