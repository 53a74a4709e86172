package graft.ingest

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/**
 * Raw-dump retention — the reference's step 3 (backup_job_results,
 * ua2sql.py:188–204): copy the ORIGINAL staged export files to
 * `<backupRoot>/<jobType>/<today>/` before staging cleanup deletes them.
 * The normalized parquet warehouse is analytics storage, not raw retention;
 * this keeps the bytes Unity served, re-ingestable from scratch.
 *
 * Matches the reference's shape: non-recursive file listing, no folder for
 * an empty dump, today's date (UTC here — the reference used the local
 * clock) as the partition, copy preserving attributes (shutil.copy2).
 */
object Backup {

  /** Copies staged files; returns the number copied (0 ⇒ no dir created). */
  def copyRawDump(jobType: String, stagingDir: String, backupRoot: String,
                  today: java.time.LocalDate = java.time.LocalDate.now(java.time.ZoneOffset.UTC)): Int = {
    val src = Paths.get(stagingDir)
    if (!Files.isDirectory(src)) return 0
    val files: Seq[Path] = {
      val s = Files.list(src)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
      } finally s.close()
    }
    if (files.isEmpty) return 0 // ua2sql.py:193–194
    val dest = Paths.get(backupRoot, jobType, today.toString)
    Files.createDirectories(dest)
    files.foreach { f =>
      Files.copy(f, dest.resolve(f.getFileName),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.COPY_ATTRIBUTES)
    }
    files.size
  }
}
