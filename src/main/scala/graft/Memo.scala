package graft

/** One-slot lazy holder for pay-once memo maps whose value is expensive
  * to build (bucketed-table stagings, ANN index training, BPE merge
  * tables): `computeIfAbsent` only CONSTRUCTS the cell, so the
  * ConcurrentHashMap bin lock is held for nanoseconds and unrelated keys
  * hashing to the same bin never block behind a staging run (CHM's
  * contract says mapping functions must be short); the expensive thunk
  * runs under the cell's own lazy-val lock, so concurrent callers of the
  * SAME key still compute exactly once.
  *
  * `done` is the PROBE contract (r16 review): dispatcher probes
  * (isAnnIndexStaged, Layouts.is*LayoutStaged) must count only cells
  * whose staging COMPLETED — a thrown staging leaves the cell in the map
  * (computeIfAbsent has already inserted it), and a probe that counted
  * it would route dispatch onto a layout that was never built. Callers
  * force values through [[force]], which evicts the cell on failure so
  * the next explicit call retries cleanly.
  */
private[graft] final class LazyCell[T](thunk: => T) {
  @volatile var done: Boolean = false
  lazy val value: T = { val v = thunk; done = true; v }
}

private[graft] object LazyCell {

  /** Force `cell.value`; on failure remove it from `map` (only if still
    * this exact cell) so a failed staging never poisons the memo — the
    * pre-LazyCell behavior, where a throw inside computeIfAbsent left no
    * mapping behind.
    */
  def force[K, T](map: java.util.concurrent.ConcurrentHashMap[K, LazyCell[T]],
      key: K, cell: LazyCell[T]): T =
    try cell.value
    catch { case e: Throwable => map.remove(key, cell); throw e }
}

private[graft] object Memo {

  /** q140's stale-generation eviction, generalized (r16 advice): every
    * fingerprint-in-key memo strands the PREVIOUS generation's entry on an
    * in-place regeneration — the old key can never be requested again (its
    * fingerprint cannot recur), so whatever the value pins (a DataFrame
    * plan, a trained index, a merge table) leaks for the process lifetime.
    * Callers invoke this on each memoized access with a predicate matching
    * keys SUPERSEDED by the one about to be used (same logical identity,
    * different fingerprint); `cleanup` releases anything the value pins
    * beyond the reference itself (unpersist, temp-dir delete).
    *
    * Removal races are benign by the memos' own contract: an in-flight
    * query holding the old value keeps it reachable (GC-safe), and a
    * concurrent re-insert of a stale key cannot happen because its
    * fingerprint no longer matches the path contents.
    */
  def evictSuperseded[K, V](
      map: java.util.concurrent.ConcurrentHashMap[K, V],
      isSuperseded: K => Boolean,
      cleanup: V => Unit = (_: V) => ()): Unit = {
    import scala.jdk.CollectionConverters._
    map.entrySet.asScala.filter(e => isSuperseded(e.getKey)).toSeq.foreach { e =>
      if (map.remove(e.getKey, e.getValue)) cleanup(e.getValue)
    }
  }
}
