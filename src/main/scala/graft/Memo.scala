package graft

/** Single-flight memoization for the session-scoped builder caches.
  *
  * `TrieMap.getOrElseUpdate` may evaluate the builder MORE THAN ONCE
  * under concurrency (it is get-then-putIfAbsent, not atomic in the
  * builder). The builders memoized in this codebase have side
  * effects — they CTAS warehouse tables or persist/checkpoint frames
  * — so two concurrent first callers racing the same key would drop
  * and rewrite the same table underneath each other. That was safe
  * while Verify/Bench ran queries strictly sequentially; Verify now
  * overlaps independent queries from a thread pool (guide §2.6), so
  * every builder cache routes through here. Synchronizing on the map
  * serializes builds (a handful per session) and costs one
  * uncontended monitor hop per lookup afterwards.
  */
object Memo {
  def once[K, V](map: scala.collection.concurrent.TrieMap[K, V], key: K)(
      build: => V): V =
    map.synchronized(map.getOrElseUpdate(key, build))
}
