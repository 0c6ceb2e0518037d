package pipeline

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Checkpoint manifest (SURVEY.md §2.3/§8.6): JSON written via temp file +
  * atomic rename; records which logical partitions have durably committed.
  * Restart = read manifest → skip committed partition ids → process the
  * remainder → publish the union. On a real cluster the same protocol runs
  * over `FileSystem.rename` (atomic on HDFS) or an Iceberg snapshot commit.
  */
final case class Manifest(
    runId: String,
    inputSnapshot: String,
    configSha: String,
    committed: Set[Int])

object Manifest {
  final val FileName = "manifest.json"

  def path(outDir: String): Path = Paths.get(outDir, FileName)

  def read(outDir: String): Option[Manifest] = {
    val p = path(outDir)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), UTF_8)
      Some(parse(s))
    }
  }

  def write(outDir: String, m: Manifest): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val tmp = Paths.get(outDir, FileName + ".tmp")
    Files.write(tmp, render(m).getBytes(UTF_8))
    Files.move(tmp, path(outDir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Tiny hand-rolled JSON (no extra deps; fields are alnum-safe). */
  def render(m: Manifest): String = {
    val ids = m.committed.toSeq.sorted.mkString(",")
    s"""{"run_id":"${m.runId}","input_snapshot":"${m.inputSnapshot}","config_sha":"${m.configSha}","committed":[$ids]}"""
  }

  def parse(s: String): Manifest = {
    def field(name: String): String = {
      val re = ("\"" + name + "\"\\s*:\\s*\"([^\"]*)\"").r
      re.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    }
    val idsRe = "\"committed\"\\s*:\\s*\\[([^\\]]*)\\]".r
    val ids = idsRe.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    val committed =
      if (ids.trim.isEmpty) Set.empty[Int]
      else ids.split(",").map(_.trim.toInt).toSet
    Manifest(field("run_id"), field("input_snapshot"), field("config_sha"), committed)
  }
}
