package graft.util

import java.nio.file.{Files, Path}

/** Driver-local staging area for gate FIXTURES (synthetic .osc files,
  * streaming micro-batch inputs): one temp root per JVM, removed by a
  * shutdown hook; subdirectories are keyed on a truncated SHA-256 of
  * the dataset PATH STRING (not its contents — staged fixtures are
  * pure functions of the path, so within-JVM reuse via `_STAGED`
  * markers is sound; a dataset mutating in place under the same path
  * would need a content fingerprint in the key), so distinct dataset
  * paths never collide. Reading these
  * driver-local paths through distributed sources assumes executors
  * share the driver's filesystem — true in local mode, the only mode
  * the gates run in; production inputs arrive on shared storage. */
object Staging {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_stage_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.util.Comparator
      if (Files.exists(r))
        Files.walk(r).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
    }))
    r
  }

  /** Stable sub-directory for (purpose, dataset dir). */
  def dir(purpose: String, datasetDir: String): Path = {
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(datasetDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val d = root.resolve(s"$purpose-$key")
    Files.createDirectories(d)
    d
  }
}
