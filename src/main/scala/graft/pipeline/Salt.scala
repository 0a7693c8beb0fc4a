package graft.pipeline

import java.security.MessageDigest

/** Content-addressed lineage salt.
  *
  * The reference derives a 6-hex-char salt per task from sha256 over the
  * recursive salts of its requirements, the class name, a `__version__`
  * tag and significant params, and embeds it in the output path — so any
  * upstream version bump relocates (invalidates) every downstream output
  * (reference pb_etl/luigi/task.py:83-134).
  *
  * Divergence (intentional): the reference hashes requirements in dict
  * order and its own comment flags that as unstable
  * (pb_etl/luigi/task.py:113-114); we sort dependency salts and param
  * keys before hashing so salts are deterministic across runs and JVMs.
  */
object Salt {
  def sha256Hex(s: String): String =
    MessageDigest
      .getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x")
      .mkString

  def of(
      depSalts: Seq[String],
      name: String,
      version: String,
      params: Seq[(String, String)]): String =
    sha256Hex(
      (depSalts.sorted ++ Seq(name, version) ++
        params.sortBy(_._1).map { case (k, v) => s"$k=$v" }).mkString("|"))
      .take(6)
}
