package graft.ingest

/**
 * Typed run configuration — the reference's JSON config contract
 * (ua2sql.py:15–35, README.md:15–26): same required keys, same optional
 * backup path (ua2sql.py:288–291), same `~` expansion.
 */
final case class GraftConfig(
    projectId: String,
    apiKey: String,
    warehouseRoot: String,
    stagingPath: String,
    ledgerPath: String,
    backupPath: Option[String])

object GraftConfig {

  val RequiredKeys: Seq[String] =
    Seq("projectId", "apiKey", "warehouseRoot", "stagingPath", "ledgerPath")

  /** Parse + validate (missing required key → error listing it, like the
    * reference's key check at ua2sql.py:24–31). */
  def fromJson(json: String): GraftConfig = {
    val fields = parseFlatStrings(json)
    val missing = RequiredKeys.filterNot(fields.contains)
    require(missing.isEmpty, s"config missing required keys: ${missing.mkString(", ")}")
    def expand(p: String) = // ~ expansion, ua2sql.py:33–35
      if (p.startsWith("~")) System.getProperty("user.home") + p.drop(1) else p
    GraftConfig(
      projectId = fields("projectId"),
      apiKey = fields("apiKey"),
      warehouseRoot = expand(fields("warehouseRoot")),
      stagingPath = expand(fields("stagingPath")),
      ledgerPath = expand(fields("ledgerPath")),
      backupPath = fields.get("backupPath").map(expand))
  }

  def load(path: String): GraftConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** Flat string-valued JSON object parse (the config is exactly that). */
  private def parseFlatStrings(json: String): Map[String, String] =
    "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r
      .findAllMatchIn(json).map(m => m.group(1) -> m.group(2)).toMap
}
