package graft.ingest

/**
 * Typed run configuration. Two key dialects are accepted:
 *
 *  - the native keys (`projectId`, `apiKey`, `stagingPath`, `warehouseRoot`,
 *    `ledgerPath`, optional `backupPath` and the `postgres_server`/
 *    `database`/`user`/`password` DB block);
 *  - the reference's exact config contract (README.md:15–26,
 *    ua2sql.py:15–35): `unity_project_id`, `unity_export_api_key`,
 *    `local_collection_path`, `backup_collection_path`, plus the same DB
 *    block — so a verbatim ua2sql `config.json` loads unchanged. Under that
 *    dialect the parquet warehouse/ledger locations (which the reference
 *    doesn't have — PostgreSQL is its only store) default to
 *    `<local_collection_path>/graft-warehouse` and `…/graft-ledger`.
 *
 * `~` expansion applies to every path key (ua2sql.py:33–35).
 */
final case class GraftConfig(
    projectId: String,
    apiKey: String,
    warehouseRoot: String,
    stagingPath: String,
    ledgerPath: String,
    backupPath: Option[String],
    db: Option[DbConfig])

/** PostgreSQL connection block (reference README.md:17–20). */
final case class DbConfig(server: String, database: String, user: String, password: String) {
  def jdbcUrl: String = s"jdbc:postgresql://$server/$database"
}

object GraftConfig {

  val RequiredKeys: Seq[String] =
    Seq("projectId", "apiKey", "warehouseRoot", "stagingPath", "ledgerPath")

  /** reference key → native key (README.md:15–26). */
  private val Aliases = Seq(
    "unity_project_id" -> "projectId",
    "unity_export_api_key" -> "apiKey",
    "local_collection_path" -> "stagingPath",
    "backup_collection_path" -> "backupPath")

  /** Parse + validate (missing required key → error listing it, like the
    * reference's key check at ua2sql.py:24–31). */
  def fromJson(json: String): GraftConfig = {
    val raw = parseFlatStrings(json)
    val aliased = Aliases.foldLeft(raw) { case (acc, (ref, native)) =>
      if (acc.contains(native) || !acc.contains(ref)) acc
      else acc + (native -> acc(ref))
    }
    // A reference-dialect config has no warehouse/ledger concept; root them
    // next to (not inside) the per-feed staging dirs so staging cleanup
    // can't touch them.
    val fields =
      if (!raw.contains("unity_project_id")) aliased
      else aliased
        .updatedWith("warehouseRoot")(v => v.orElse(aliased.get("stagingPath").map(_ + "/graft-warehouse")))
        .updatedWith("ledgerPath")(v => v.orElse(aliased.get("stagingPath").map(_ + "/graft-ledger")))
    val missing = RequiredKeys.filterNot(fields.contains)
    require(missing.isEmpty, s"config missing required keys: ${missing.mkString(", ")}")
    def expand(p: String) = // ~ expansion, ua2sql.py:33–35
      if (p.startsWith("~")) System.getProperty("user.home") + p.drop(1) else p
    val db = for {
      server <- fields.get("postgres_server")
      database <- fields.get("database")
      user <- fields.get("user")
      password <- fields.get("password")
    } yield DbConfig(server, database, user, password)
    GraftConfig(
      projectId = fields("projectId"),
      apiKey = fields("apiKey"),
      warehouseRoot = expand(fields("warehouseRoot")),
      stagingPath = expand(fields("stagingPath")),
      ledgerPath = expand(fields("ledgerPath")),
      backupPath = fields.get("backupPath").map(expand),
      db = db)
  }

  def load(path: String): GraftConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** Flat string-valued JSON object parse (the config is exactly that). */
  private def parseFlatStrings(json: String): Map[String, String] =
    "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r
      .findAllMatchIn(json).map(m => m.group(1) -> m.group(2)).toMap
}
