package graft

/** Shared session plumbing for the harness mains. */
object SparkSupport {

  /** Scratch directory for shuffle/spill files (`spark.local.dir`).
    *
    * The bench/verify hosts run on virtualized block storage where small-file
    * metadata operations are slow; shuffle-heavy plans on tiny inputs become
    * latency-bound on shuffle-file creation (measured 3× end-to-end on the
    * dedup suite). Prefer a tmpfs mount when one is present — on a real
    * cluster this maps to provisioning `spark.local.dir` on fast local SSDs,
    * which is standard deployment practice, not a semantics change.
    */
  def scratchDir: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-spark-local")
      d.mkdirs()
      d.getAbsolutePath
    } else System.getProperty("java.io.tmpdir", "/tmp")
  }

  /** Collision-resistant path key for per-corpus scratch artifacts.
    *
    * Scratch layouts (shingle index, gram index, dup/exact pair lists,
    * materialized silver, …) are cached per corpus dir; keying the path by
    * `String.hashCode` would let two distinct dirs silently share one path
    * on a 32-bit collision — the second build overwrites the first and both
    * cache entries read the same (wrong) data with no error. An md5 of the
    * full dir string makes that practically impossible. */
  def pathKey(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
