package graft.ml

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.util.LongAccumulator

/** Bucket-cap exemption audit (VERDICT r14 item 3).
  *
  * Every banded-LSH operator drops OVERSIZED buckets wholesale before
  * its pair join (`maxBucketSize` left_anti) — the O(bucket²) guard.
  * That cap is also the family's one SILENT failure mode: under
  * keyspace saturation (a fixed geometry outgrown by the corpus) or a
  * skewed key (one fingerprint dominating), rows pile into buckets
  * that get exempted, and near-dup recall quietly decays toward zero
  * while the job runs green. The operators stay correct-by-contract
  * (the cap is documented), but an operator that cannot SAY it dropped
  * work reads as "covered everything" when it didn't.
  *
  * [[observed]] threads an operator's oversized-bucket frame through a
  * counting pass-through: `exempted_buckets` / `exempted_rows` land in
  * per-operator named [[LongAccumulator]]s, summed into
  * `MetricsRegistry`'s snapshot (and so the Prometheus text) under
  * `stage="cap_<op>"` — a production run's dashboards show exemptions
  * the moment saturation or skew begins, turning the silent recall
  * loss into a visible counter.
  *
  * Why accumulators and not `Dataset.observe`: the exemption frame is
  * consumed by BOTH sides of the operators' band self-joins, and the
  * analyzer's relation deduplication clones any `CollectMetrics` node
  * it reaches — after which `observedMetrics` silently reports NOTHING
  * for the query (measured on Spark 4.1: the identical observe
  * surfaces when its frame is consumed once, at any depth including
  * inside a broadcast branch with its own shuffle, and vanishes as
  * soon as the frame sits under the l/r alias sandwich). Accumulators
  * are plan-shape-independent. The counting pass-through costs one
  * row-codec hop on a frame that is tiny BY DEFINITION (only buckets
  * above the cap survive the filter).
  *
  * Precision, stated honestly: accumulator updates in transformations
  * are at-least-once (task retries, speculative duplicates, and a
  * re-executed plan branch each add again). The counter is an AUDIT
  * (zero vs nonzero, order of magnitude), not an exact accounting —
  * exactly what a recall-loss alarm needs.
  */
object CapAudit {

  /** One accumulator pair per (SparkContext, operator): queries
    * accumulate cumulatively, the `MetricsRegistry` counter semantic.
    * Keyed by context so a restarted session gets live accumulators
    * and the map stays bounded by the operator count.
    */
  private val accs = new java.util.concurrent.ConcurrentHashMap[
    (String, String), (LongAccumulator, LongAccumulator)]()

  /** Thread `oversized` — a (bucket-key..., `nCol`) frame of buckets
    * that breached the cap — through the exemption counters. Call
    * BEFORE the projection that drops `nCol`.
    */
  def observed(oversized: DataFrame, op: String,
               nCol: String = "__n"): DataFrame = {
    val sc = oversized.sparkSession.sparkContext
    val (b, r) = accs.computeIfAbsent((sc.applicationId, op), _ =>
      (sc.longAccumulator(s"graft.cap.$op.exempted_buckets"),
        sc.longAccumulator(s"graft.cap.$op.exempted_rows")))
    val idx = oversized.schema.fieldIndex(nCol)
    val enc = Encoders.row(oversized.schema)
    oversized.mapPartitions { it =>
      it.map { row => b.add(1L); r.add(row.getLong(idx)); row }
    }(enc)
  }

  /** Current exemption totals in `MetricsRegistry.snapshot()` key
    * shape: `(metric, "cap_<op>") -> value`. Dead contexts report
    * their last value; [[reset]] drops everything.
    */
  def snapshot(): Map[(String, String), Long] = {
    import scala.jdk.CollectionConverters._
    accs.asScala.flatMap { case ((_, op), (b, r)) =>
      Seq(("exempted_buckets", s"cap_$op") -> b.value.longValue(),
        ("exempted_rows", s"cap_$op") -> r.value.longValue())
    }.groupMapReduce(_._1)(_._2)(_ + _)
  }

  def reset(): Unit = accs.clear()
}
