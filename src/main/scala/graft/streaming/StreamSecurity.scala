package graft.streaming

import java.nio.file.{Files, LinkOption, Path, Paths}

/** Path-safety checks for the watched-folder streaming entry point —
  * the Spark analog of the reference's watched-folder security module
  * (`src/ocrmypdf/_watcher_security.py`): the watched input root, the
  * output sink and the checkpoint dir are operator-supplied strings
  * that may be attacker-influenced on a shared warehouse, so they are
  * validated BEFORE the query starts instead of trusted blindly.
  *
  * Enforced (file:-scheme paths; remote warehouse URIs have no symlink
  * concept and pass through untouched):
  *  - the input root must exist, be a directory, and resolve without
  *    traversing a symlink — a symlinked watched root redirects every
  *    read outside the intended tree (`_watcher_security.py`
  *    `is_safe_regular_file`'s resolved-containment rule);
  *  - no watch loop: the output and checkpoint dirs must not live
  *    inside the watched input root, or every committed micro-batch
  *    file would be re-detected as new input and re-processed endlessly
  *    (`assert_no_watch_loop`); the input root must equally not live
  *    inside the output/checkpoint dirs (data/metadata comingling,
  *    `assert_data_dirs_isolated`'s bidirectional overlap rule);
  *  - `..` traversal is resolved by normalization FIRST, so a
  *    `out/../in` spelling cannot defeat the containment checks.
  *
  * TOCTOU is accepted residual risk, as the reference documents: a dir
  * swapped for a symlink after validation but before the first
  * micro-batch is not portably detectable.
  */
object StreamSecurity {

  /** Filesystem schemes with no local symlink semantics to validate —
    * the KNOWN remote-warehouse set, not "anything with a colon": a
    * local relative path whose first segment contains a colon (e.g.
    * `data:incoming`) must NOT silently bypass the symlink/watch-loop
    * checks this module exists for. */
  private val remoteSchemes = Set(
    "hdfs", "webhdfs", "viewfs", "har", "o3fs", "ofs",
    "s3", "s3a", "s3n", "gs", "oss", "cos", "cosn",
    "abfs", "abfss", "wasb", "wasbs", "adl", "alluxio")

  /** Local-filesystem path of `p` unless it carries a known remote
    * scheme (s3a://, hdfs:/ ...). A scheme is detected Hadoop-Path-style
    * — `scheme:` followed by anything, since `hdfs:/x` (single slash) is
    * a legal Hadoop spelling — but only the closed remote set above is
    * skipped; `file:` forms and everything else (including colon-bearing
    * local names) are validated as local paths. */
  private def localPath(p: String): Option[Path] = {
    val scheme = "^([A-Za-z][A-Za-z0-9+.\\-]+):".r.findFirstMatchIn(p)
      .map(_.group(1))
    scheme match {
      case Some("file") =>
        // accept file:/x, file:///x (URI forms) and a bare file:x
        val rest = p.stripPrefix("file:")
        if (rest.startsWith("//")) Some(Paths.get(java.net.URI.create(p)))
        else Some(Paths.get(rest))
      case Some(s) if remoteSchemes.contains(s.toLowerCase(java.util.Locale.ROOT)) =>
        None // remote warehouse scheme — no symlink semantics here
      case _ => Some(Paths.get(p))
    }
  }

  /** Absolute, `..`-free form for containment comparisons. */
  private def norm(p: Path): Path = p.toAbsolutePath.normalize()

  /** Fully resolved form (symlinks + `..`), tolerating a non-existent
    * tail: the deepest existing ancestor is resolved for real, the
    * not-yet-created remainder appended verbatim — output/checkpoint
    * dirs typically do not exist before the first start. */
  private def realish(p: Path): Path = {
    val abs = norm(p)
    var existing = abs
    var tail = List.empty[String]
    while (existing != null && !Files.exists(existing, LinkOption.NOFOLLOW_LINKS)) {
      tail = existing.getFileName.toString :: tail
      existing = existing.getParent
    }
    if (existing == null) abs
    else tail.foldLeft(existing.toRealPath())((acc, seg) => acc.resolve(seg))
  }

  private def contains(outer: Path, inner: Path): Boolean =
    inner.startsWith(outer)

  /** Validate the (input, output, checkpoint) triple of a watched-folder
    * extraction query. Throws IllegalArgumentException on the first
    * violation; returns unit on a safe configuration. */
  def validateWatchDirs(inDir: String, outDir: String,
      checkpointDir: String): Unit = {
    val in = localPath(inDir).getOrElse(return)
    val inAbs = norm(in)
    require(Files.exists(inAbs, LinkOption.NOFOLLOW_LINKS),
      s"watched input dir does not exist: $inDir")
    require(Files.isDirectory(inAbs, LinkOption.NOFOLLOW_LINKS),
      s"watched input path is not a directory (symlink roots are " +
        s"rejected — a symlinked watch root redirects reads outside " +
        s"the intended tree): $inDir")
    // containment below runs on the RESOLVED root: a symlinked ANCESTOR
    // (macOS /tmp -> /private/tmp, systemd /var/run -> ../run) is a
    // conventional layout and allowed — only a symlink AS the watch
    // root is rejected (the NOFOLLOW directory check above), because
    // that is the redirect an attacker who owns the watch dir can plant
    val inReal = inAbs.toRealPath()
    for ((label, dir) <- Seq("output" -> outDir, "checkpoint" -> checkpointDir);
         p <- localPath(dir)) {
      val r = realish(p)
      require(!contains(inReal, r),
        s"$label dir $dir is inside the watched input dir $inDir: " +
          s"committed micro-batch files would be re-ingested as new " +
          s"input, an endless loop")
      require(!contains(r, inReal),
        s"watched input dir $inDir is inside the $label dir $dir: " +
          s"input data and query $label must not comingle")
    }
  }
}
