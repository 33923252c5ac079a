package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Per-invocation localCheckpoint with bounded block-manager residency.
  *
  * ADVICE r17: the r17 pin-the-shared-subtree device (`localCheckpoint()`
  * on a multi-consumer frame — bm25 postings, tfidf tf, lm_score c1,
  * pmi uni/bg, signal loc, markov tt) left every invocation's checkpoint
  * blocks cached forever, so repeated invocations in one session
  * accumulate corpus-derived storage without bound.
  *
  * `rotate(tag)(df)` checkpoints `df` and unpersists the frame the SAME
  * (session, tag) checkpointed on its previous invocation, bounding
  * residency to one live checkpoint per site per session.
  *
  * Contract (the sharp edge, documented): the DataFrame returned by an
  * EARLIER invocation of the same query is invalidated when the query is
  * invoked again in the same session — its checkpoint blocks are gone and
  * its lineage was truncated. Callers that need two generations alive at
  * once must checkpoint outside this helper. Bench/Verify/tests consume
  * each invocation's frame before the next invocation, so the bound is
  * free there.
  */
object Ckpt {
  private val last = TrieMap.empty[(SparkSession, String), DataFrame]

  /** Eager, matching the r17 pin sites this wraps. The pin only pays at
    * sf0.1 when the duplicated subtree is heavy enough to beat the
    * materialization barrier — measured r18: light subtrees (≤ ~0.2 s)
    * LOSE with a pin (eager or lazy) because their duplicated branches
    * overlap inside one job; those sites carry measured-and-rejected
    * notes instead of pins. */
  def rotate(tag: String)(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    last.put((df.sparkSession, tag), ck).foreach { prev =>
      try prev.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    // entries keyed on stopped sessions hold dead frames — sweep them
    last.keys.filter(_._1.sparkContext.isStopped)
      .foreach(last.remove)
    ck
  }
}
