package graft.norm

import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermission._

/** PGPASSFILE credential lookup (SURVEY.md §2-G8), matching the
  * reference's observable semantics exactly
  * (/root/reference/src/db/pg.rs:316-354):
  *
  *  - missing file → None (trust connections may still succeed);
  *  - file present with permissions ≠ 0600 → error (refuse to read);
  *  - a line matches when it STARTS WITH `host:port:database:user`
  *    (plain prefix, no trailing colon — quirk included: the reference
  *    does not implement libpq's `*` wildcards or backslash escapes,
  *    and neither does this);
  *  - the LAST matching line wins;
  *  - the password is the last `:`-separated field of that line.
  *
  * This engine never opens a Postgres connection itself (the COPY-text
  * interop in [[PgCopy]] replaces the reference's live-DB round trip),
  * so this is the credential-resolution utility a JDBC-side caller
  * would use — kept for surface parity with the reference CLI. */
object PgPass {

  /** 0600 = owner read+write only. */
  private val Wanted = java.util.EnumSet.of(OWNER_READ, OWNER_WRITE)

  def lookup(host: String, port: String, database: String, user: String,
      pgpassPath: Path): Either[String, Option[String]] = {
    if (!Files.exists(pgpassPath)) return Right(None)
    val perms = Files.getPosixFilePermissions(pgpassPath)
    if (perms != Wanted)
      return Left(s"Found PGPASSFILE at $pgpassPath with wrong permissions " +
        s"$perms — must be exactly 0600")
    val prefix = s"$host:$port:$database:$user"
    var result: Option[String] = None
    val it = Files.lines(pgpassPath)
    try {
      it.forEach { line =>
        if (line.startsWith(prefix)) {
          val parts = line.split(":", -1)
          if (parts.nonEmpty) result = Some(parts.last)
        }
      }
    } finally it.close()
    Right(result)
  }
}
