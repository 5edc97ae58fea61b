package graft.util

import org.apache.spark.sql.SparkSession

/** Cache lifecycle scope for the dedup family (round-9 review #8).
  *
  * [[graft.operators.Dedup]]'s pair generators persist a reused
  * intermediate (signatures / exploded shingles / cell assignments)
  * because it feeds multiple self-join branches; the returned frame is
  * lazy, so the OPERATOR cannot unpersist what the caller hasn't consumed
  * yet. One-shot drivers (Verify, Bench) `clearCache()` between queries,
  * but a long-lived session calling the `fuzzy_dedup` / `semantic_dedup`
  * builtins repeatedly accumulates dead cached frames — and a blanket
  * `clearCache()` would also evict frames the session cached on purpose.
  *
  * [[withPersisted]] closes the gap: it snapshots the persistent-RDD set,
  * runs the body, and unpersists exactly the entries that APPEARED during
  * the body — never touching pre-existing caches. Non-blocking unpersist:
  * eviction proceeds in the background while the caller continues.
  *
  * CONSUME INSIDE THE SCOPE: the body must materialize what it needs
  * (collect, write, count). A lazy frame returned out of the scope stays
  * CORRECT — Spark recomputes evicted blocks — but silently loses the
  * multi-branch reuse the persist existed for.
  */
object CacheScope {

  def withPersisted[T](spark: SparkSession)(body: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try body
    finally {
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = false)
      }
    }
  }
}
