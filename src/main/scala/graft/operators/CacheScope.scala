package graft.operators

import org.apache.spark.sql.Dataset
import scala.collection.mutable.ArrayBuffer

/** Caller-owned lifecycle for operator-internal `persist()`s.
  *
  * Several operators cache an intermediate that feeds two branches of
  * the returned (lazy) plan — the cache is what keeps the expensive
  * kernel (shingling, minhashing, the neighbor graph) from being
  * recomputed once per branch. The operator cannot unpersist it before
  * returning (the result has not run yet), so the lifecycle belongs to
  * the caller: pass a scope, materialize the result, then `release()`:
  *
  * {{{
  * val scope = new CacheScope
  * val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", scope = scope)
  * pairs.write.parquet(out)   // action — the caches earn their keep here
  * scope.release()            // zero residual cached RDDs
  * }}}
  *
  * After `release()` the returned DataFrame is still valid — a further
  * action simply recomputes from source. The default
  * [[CacheScope.unmanaged]] keeps the legacy behavior (caches live
  * until `spark.catalog.clearCache()`), so one-shot callers — the
  * registered queries, whose driver clears the session cache between
  * runs — are unchanged; long-lived sessions composing operators
  * should pass a scope (CacheScopeSpec asserts the zero-residual
  * contract).
  */
final class CacheScope private[operators] (track: Boolean) {
  def this() = this(true)

  private val owned = ArrayBuffer.empty[Dataset[_]]

  private[graft] def own[T <: Dataset[_]](ds: T): T = {
    if (track) synchronized { owned += ds }
    ds
  }

  /** Unpersist every intermediate cached under this scope (non-blocking).
    * Call after the consuming action; idempotent.
    */
  def release(): Unit = synchronized {
    owned.foreach(_.unpersist())
    owned.clear()
  }
}

object CacheScope {
  /** Scope that tracks nothing — `release()` is a no-op and caches live
    * until the session clears them (the pre-scope behavior).
    */
  val unmanaged: CacheScope = new CacheScope(false)
}
