package graft.norm

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermissions

import org.scalatest.funsuite.AnyFunSuite

/** G8 pgpass semantics — pinned against the reference's
  * read_password_file (pg.rs:316-354): exact-0600 permission gate,
  * plain prefix match, last match wins, password = last `:` field. */
class PgPassSpec extends AnyFunSuite {

  private def write(content: String, mode: String) = {
    val p = Files.createTempFile("graft-pgpass", ".conf")
    Files.writeString(p, content)
    Files.setPosixFilePermissions(p, PosixFilePermissions.fromString(mode))
    p
  }

  test("missing file → None (trust connections may succeed)") {
    assert(PgPass.lookup("h", "5432", "db", "u",
      Paths.get("/tmp/graft-no-such-pgpass")) == Right(None))
  }

  test("wrong permissions → error, file never read") {
    val p = write("h:5432:db:u:secret\n", "rw-r--r--")
    try assert(PgPass.lookup("h", "5432", "db", "u", p).isLeft)
    finally Files.delete(p)
  }

  test("prefix match, last match wins, password = last field") {
    val p = write(
      "other:5432:db:u:no\n" +
      "h:5432:db:u:first\n" +
      "h:5432:db:u:second\n", "rw-------")
    try assert(PgPass.lookup("h", "5432", "db", "u", p) ==
      Right(Some("second")))
    finally Files.delete(p)
  }

  test("no matching line → None; empty password field comes back empty") {
    val p = write("x:1:d:u:pw\nh:5432:db:u:\n", "rw-------")
    try {
      assert(PgPass.lookup("nope", "5432", "db", "u", p) == Right(None))
      assert(PgPass.lookup("h", "5432", "db", "u", p) == Right(Some("")))
    } finally Files.delete(p)
  }
}
