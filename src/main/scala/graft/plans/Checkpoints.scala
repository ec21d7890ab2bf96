package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for checkpointed DataFrames.
  *
  * `Dataset.localCheckpoint()` pins the materialized rows in the block
  * manager via the INTERNAL row RDD it wraps in a [[LogicalRDD]];
  * `Dataset.unpersist()` only talks to the CacheManager (`.cache()`
  * state) and never frees those blocks. Iterative plans that
  * checkpoint per round (transitive closure, long update scripts)
  * must therefore unpersist at the RDD level or they pin
  * O(rounds × data) storage for the JVM lifetime.
  */
object Checkpoints {

  /** The checkpoint-pinned RDD behind `df`, if `df` is the direct
    * result of a `checkpoint`/`localCheckpoint` call.
    */
  def pinnedRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.logical match {
      case l: LogicalRDD => Some(l.rdd)
      case _             => None
    }

  /** Free the blocks a `localCheckpoint` result pinned. Safe once no
    * live plan reads `df` (a local checkpoint has no lineage to
    * recompute from — a later read would fail, not recompute).
    */
  def unpersist(df: DataFrame, blocking: Boolean = false): Unit =
    pinnedRdd(df).foreach(_.unpersist(blocking))

  private val scope =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[DataFrame]]()

  /** Register a checkpointed frame for release when the enclosing
    * [[withScope]] completes; with no enclosing scope the frame stays
    * pinned for the caller to release (the bench/verify harnesses
    * sweep the block manager between entries). Mirrors the SPARQL
    * engine's closureScope discipline for pipeline operators whose
    * returned plan still reads a checkpoint.
    */
  def register(df: DataFrame): DataFrame = {
    Option(scope.get()).foreach(_ += df)
    df
  }

  /** Run `f` with every [[register]]ed checkpoint on THIS thread freed
    * when `f` completes — the per-request discipline for long-running
    * callers: compile AND consume the result inside `f`.
    */
  def withScope[T](f: => T): T = {
    val outer = scope.get()
    val mine = scala.collection.mutable.ArrayBuffer[DataFrame]()
    scope.set(mine)
    try f
    finally {
      scope.set(outer)
      mine.foreach(unpersist(_))
    }
  }
}
