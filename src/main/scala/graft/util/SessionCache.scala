package graft.util

import org.apache.spark.sql.SparkSession

/** A per-SparkSession memo table for expensive shared fixtures (chain folds,
  * PQ codebooks) that several registered queries would otherwise recompute.
  *
  * Keyed on the session by identity through a [[java.util.WeakHashMap]] so a
  * stopped, GC'd session releases its entries — a plain
  * `identityHashCode(session)` string key (the previous foldCache design)
  * can collide across GC'd sessions in a long-lived driver and would pin the
  * cached values forever.
  */
final class SessionCache[V] {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, V]]()

  def getOrCompute(spark: SparkSession, key: String)(compute: => V): V = {
    val m = bySession.synchronized {
      var inner = bySession.get(spark)
      if (inner == null) {
        inner = new java.util.concurrent.ConcurrentHashMap[String, V]()
        bySession.put(spark, inner)
      }
      inner
    }
    m.computeIfAbsent(key, _ => compute)
  }
}
