package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/**
 * Eviction registry for the per-(application, fixture) control-plane
 * memos the query modules keep in module-level ConcurrentHashMaps
 * (tf-idf frames, covariance stats, k-center picks, logreg weights, …).
 * Keys are "appId@dir"; values reference cache()'d DataFrames and
 * collected arrays that belong to ONE SparkSession — without eviction
 * they outlive a stopped session and accumulate across the many
 * sessions one JVM can host (the test suite; repeated Verify runs).
 *
 * Every memo map routes its key construction through [[key]], which
 * registers the map and installs — once per application — a listener
 * that drops that application's entries from EVERY registered map when
 * its SparkContext stops. Eviction is by key prefix, so a map may key
 * on "appId@dir" plus further qualifiers. Cached DataFrames need no
 * explicit unpersist at that point: their blocks die with the context;
 * the eviction is about dropping the stale driver-side references.
 */
object AppCaches {

  private val maps =
    ConcurrentHashMap.newKeySet[ConcurrentHashMap[String, _]]()
  private val hooked = ConcurrentHashMap.newKeySet[String]()

  /** Memo key for `map` under the session's application + fixture dir —
    * registering the map for stop-time eviction as a side effect. */
  def key(s: SparkSession, dir: String,
      map: ConcurrentHashMap[String, _]): String = {
    maps.add(map)
    val sc = s.sparkContext
    val appId = sc.applicationId
    if (hooked.add(appId)) {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            e: SparkListenerApplicationEnd): Unit = {
          maps.forEach(m => m.keySet.removeIf(_.startsWith(appId + "@")))
          hooked.remove(appId)
        }
      })
    }
    appId + "@" + dir
  }
}
