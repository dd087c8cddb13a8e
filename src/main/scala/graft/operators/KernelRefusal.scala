package graft.operators

/** The columnar/sorted kernels' loud-guard exception — thrown when a
  * kernel detects at RUN time that its input violates a precondition its
  * plan-time validity bound could not see (duplicate build PK, interner id
  * cap, layout descent mid-partition, per-partition state growth past the
  * design regime). [[graft.Exec]] catches exactly this type (anywhere in
  * the cause chain — task-side throws arrive wrapped in SparkException)
  * and falls back to the declarative twin.
  *
  * Subtyping IllegalStateException keeps existing callers' catch blocks
  * and specs working; the dedicated type exists because Spark internals
  * ALSO throw bare IllegalStateException (stopped SparkContext, codegen
  * state errors), and a dispatcher that treated any ISE as "kernel
  * refused" would silently swallow real failures into a slower re-run of
  * the declarative form (r13 advice). Serializable by construction
  * (message-only state) so task-side throws survive executor→driver
  * transport on a real cluster.
  */
class KernelRefusal(msg: String) extends IllegalStateException(msg)
