package graft.util

import org.apache.spark.sql.Dataset

/** Central policy for materializing a NARROW derived frame that a plan
  * references several times (sweep event frames, chunk-count frames,
  * shingle tables): one place to choose the checkpoint mechanism, so a
  * deployment can trade speed for fault tolerance with a conf flag
  * instead of a code change (r19 verdict item 7).
  *
  * `spark.graft.checkpoint` modes:
  *
  *  - `local` (default): `Dataset.localCheckpoint` — blocks live on
  *    executor storage, lineage truncated. The right default for
  *    `local[n]` (the executor IS the driver process, so a lost block
  *    already means a lost job) and the fastest option everywhere.
  *  - `reliable`: `Dataset.checkpoint` to the reliable checkpoint dir —
  *    blocks survive executor loss, the 100 TB-with-churn flag. The
  *    frames routed through here are change-point-/pair-/shingle-sized,
  *    far narrower than their lineage's inputs, so the extra write is
  *    small next to recomputing a lost block's full lineage under churn.
  *    (Spark's lazy reliable checkpoint writes by re-running the frame
  *    once after the first job that computes it — the standard
  *    checkpoint-without-persist trade; still one extra pass over a
  *    NARROW frame, paid only by deployments that opt in.)
  *    The checkpoint dir defaults under `spark.graft.scratchDir` (or the
  *    JVM tmpdir) when the deployment has not set one; a real cluster
  *    should point it at durable shared storage.
  *
  * Why not `persist()` (the other lineage-keeping option): persisted
  * plans register with the session's CacheManager, which rewrites EVERY
  * later query's matching subtree to the cached data — two declared
  * keys that derive the same intermediate would silently share one
  * materialization, changing what each bench line measures (an
  * undeclared cross-query cache). The explicitly-memoized standing
  * indexes (graph edges, shingle index, ANN fits) declare that sharing;
  * a per-query temporary must not acquire it by side effect.
  */
object Ckpt {

  /** Lazily checkpoint `df` under the session's configured regime (see
    * object scaladoc). Always lazy: materialization happens inside the
    * first job that executes the frame — never a hidden driver action. */
  def narrow[T](df: Dataset[T]): Dataset[T] = {
    val sess = df.sparkSession
    sess.conf.get("spark.graft.checkpoint", "local") match {
      case "reliable" =>
        val sc = sess.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val base = sess.conf.getOption("spark.graft.scratchDir")
            .getOrElse(sys.props("java.io.tmpdir") + "/graft-scratch")
          sc.setCheckpointDir(s"$base/${sc.applicationId}/ckpt")
        }
        df.checkpoint(eager = false)
      case _ => df.localCheckpoint(eager = false)
    }
  }
}
