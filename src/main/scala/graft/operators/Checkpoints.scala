package graft.operators

import org.apache.spark.sql.DataFrame

/** One switch for every lineage-truncation point in the engine (r10
  * verdict item 3).
  *
  * Iterative and fan-in shapes (connected components, PageRank rounds,
  * the sketch queries' small shared frames) checkpoint EAGERLY at their
  * smallest reusable frame — always eager, because a lazy checkpoint
  * shared by multiple consumers is raced by AQE into redundant
  * recomputation (measured ~9×; see SourceDisciplineSpec).
  *
  * The FLAVOR is deployment-dependent:
  *
  *  - `localCheckpoint()` (the default) writes executor-local block
  *    shuffle files — right for local[n] and cheapest, but on a real
  *    cluster an executor loss destroys the only copy and kills an
  *    iterative job mid-round;
  *  - `SPARK_GRAFT_CHECKPOINT_DIR=<path>` switches every site to RELIABLE
  *    `checkpoint()` against that directory (HDFS/object store on a
  *    cluster) — blocks survive executor loss, at the cost of a
  *    write-through per checkpoint.
  *
  * Both flavors truncate lineage identically, so results are invariant
  * under the switch — CheckpointFaceSpec runs a CC query and a sketch
  * query under both and asserts row-identical output (and that the
  * reliable path actually materialized files under the directory).
  */
object Checkpoints {

  /** Test seam: takes precedence over the environment variable. */
  @volatile private[graft] var dirOverride: Option[String] = None

  /** Last root WE passed to setCheckpointDir. Spark's resolved dir is
    * UUID-suffixed, so comparing against `getCheckpointDir` by substring
    * can be fooled by nested temp paths; tracking our own last root and
    * comparing it exactly cannot.
    */
  @volatile private var lastSetRoot: Option[String] = None

  /** The RESOLVED path of the dir Spark actually created for our last
    * setCheckpointDir (root/UUID, fully qualified) — the comparison anchor
    * for detecting a foreign setCheckpointDir. Comparing against the RAW
    * configured string would mis-fire on relative roots (Spark qualifies
    * them against the fs working dir), re-setting a fresh UUID dir per
    * call.
    */
  @volatile private var lastResolvedDir: Option[String] = None

  private def configuredDir: Option[String] =
    dirOverride.orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").filter(_.nonEmpty))

  /** Path component of a possibly scheme-qualified location (`file:/x`,
    * `hdfs://nn/x` → `/x`), so root comparisons survive Spark's
    * qualification of whatever string we handed to setCheckpointDir.
    */
  private def pathOf(s: String): String =
    try {
      val p = new java.net.URI(s).getPath
      if (p == null || p.isEmpty) s else p
    } catch { case _: java.net.URISyntaxException => s }

  /** Eager checkpoint of `df` in the configured flavor (see class doc). */
  def stable(df: DataFrame): DataFrame = configuredDir match {
    case Some(dir) =>
      val sc = df.sparkSession.sparkContext
      // setCheckpointDir is sticky per context; honor a new override (the
      // test seam) but never re-set an identical root (which would spray a
      // fresh UUID subdir per call). lastSetRoot alone is not enough: it is
      // JVM-global, so foreign code calling sc.setCheckpointDir to another
      // root after us would otherwise silently redirect reliable
      // checkpoints — also require the context's CURRENT dir to still be
      // the exact resolved dir Spark created for OUR last set (captured
      // right after setting, so relative roots compare correctly).
      val stillOurs = (lastResolvedDir, sc.getCheckpointDir) match {
        case (Some(ours), Some(cur)) => pathOf(cur) == ours
        case _ => false
      }
      if (!lastSetRoot.contains(dir) || !stillOurs) {
        sc.setCheckpointDir(dir)
        lastSetRoot = Some(dir)
        lastResolvedDir = sc.getCheckpointDir.map(pathOf)
      }
      df.checkpoint()
    case None => df.localCheckpoint()
  }

  /** `.stableCheckpoint()` postfix syntax, drop-in for `.localCheckpoint()`. */
  implicit class StableOps(private val df: DataFrame) extends AnyVal {
    def stableCheckpoint(): DataFrame = stable(df)
  }
}
