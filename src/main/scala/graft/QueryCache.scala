package graft

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** Result-cache parity with the reference dashboard's
  * `st.cache_data(ttl=300)` (`dashboard.py:77`): memoize a built
  * DataFrame, persisted, for `ttlSeconds`; rebuilds (and unpersists the
  * stale copy) after expiry. The clock is injectable for tests.
  */
final class QueryCache(ttlSeconds: Long, clock: () => Long = () => System.currentTimeMillis()) {
  private val memo = TrieMap.empty[String, (Long, DataFrame)]
  @volatile private var hitCount = 0L
  @volatile private var missCount = 0L

  def get(key: String)(build: => DataFrame): DataFrame = synchronized {
    val now = clock()
    memo.get(key) match {
      case Some((at, df)) if now - at < ttlSeconds * 1000 =>
        hitCount += 1; df
      case stale =>
        missCount += 1
        stale.foreach { case (_, df) => df.unpersist() }
        val df = build.persist()
        memo.update(key, (now, df))
        df
    }
  }

  def invalidate(key: String): Unit = synchronized {
    memo.remove(key).foreach { case (_, df) => df.unpersist() }
  }

  def hits: Long = hitCount
  def misses: Long = missCount
}
