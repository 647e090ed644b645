package graft.ingest

/** Run configuration for the incremental ingest pipeline — reference O12
  * (`git_etl.ts:262-286`): repo/owner must be present together, the cron
  * schedule must parse, the store path must carry the expected extension,
  * booleans are type-checked at the parse boundary.
  *
  * Unlike the reference (whose validators at `git_etl.ts:208` and
  * `git_etl.ts:226-227` accidentally validate the global config object
  * instead of their argument — SURVEY §2.1 O12 flags it as a quirk not to
  * copy), every check here runs against the actual field.
  */
final case class EtlConfig(
    repo: String,
    owner: String,
    cronSchedule: String = "*/5 * * * *",
    storePath: String = "commits.parquet",
    clearOnStartup: Boolean = false,
    useAuthToken: Boolean = false) {
  require(repo.nonEmpty && owner.nonEmpty,
    "repo and owner must both be provided")
  require(EtlConfig.cronValid(cronSchedule),
    s"invalid cron schedule: '$cronSchedule'")
  require(storePath.endsWith(".parquet"),
    s"storePath must end in .parquet, got '$storePath'")
}

object EtlConfig {

  /** Minimal 5-field cron validation (minute hour dom month dow): each
    * field is a star, a star with step, a number, a range, or a comma list. */
  private val field = """(\*(/\d+)?|\d+(-\d+)?(/\d+)?)(,(\*(/\d+)?|\d+(-\d+)?(/\d+)?))*"""
  private val cronRe = s"^$field $field $field $field $field$$".r
  def cronValid(s: String): Boolean = cronRe.matches(s.trim)

  /** Parse from a string map (e.g. loaded config), with typed boolean
    * checks — `"true"/"false"` only, anything else is an error rather than
    * a silent false (the reference type-checks too, `git_etl.ts:246-255`). */
  def fromMap(m: Map[String, String]): EtlConfig = {
    def bool(k: String, dflt: Boolean): Boolean = m.get(k) match {
      case None          => dflt
      case Some("true")  => true
      case Some("false") => false
      case Some(other)   => throw new IllegalArgumentException(
        s"config '$k' must be true/false, got '$other'")
    }
    EtlConfig(
      repo = m.getOrElse("repo", ""),
      owner = m.getOrElse("owner", ""),
      cronSchedule = m.getOrElse("cronSchedule", "*/5 * * * *"),
      storePath = m.getOrElse("storePath", "commits.parquet"),
      clearOnStartup = bool("clearOnStartup", dflt = false),
      useAuthToken = bool("useAuthToken", dflt = false))
  }
}
