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
    // URI schemes are case-insensitive (FILE:/x is the same scheme as
    // file:/x) — lowercase ONCE and use that for both branches, or an
    // uppercase file: spelling falls through to Paths.get("FILE:/x")
    // and is rejected as a nonexistent relative path
    val m = "^([A-Za-z][A-Za-z0-9+.\\-]+):".r.findFirstMatchIn(p)
    val scheme = m.map(_.group(1).toLowerCase(java.util.Locale.ROOT))
    scheme match {
      case Some("file") =>
        // accept file:/x, file:///x (URI forms) and a bare file:x
        val rest = p.substring(m.get.group(1).length + 1)
        if (rest.startsWith("//")) {
          val uri = java.net.URI.create("file:" + rest)
          require(uri.getAuthority == null || uri.getAuthority.isEmpty,
            s"file: URI with a remote authority is not a local path: $p")
          Some(Paths.get(uri))
        }
        else Some(Paths.get(rest))
      case Some(s) if remoteSchemes.contains(s) =>
        None // remote warehouse scheme — no symlink semantics here
      case _ => Some(Paths.get(p))
    }
  }

  /** Fully resolved form (symlinks + `..`), tolerating a non-existent
    * tail: the deepest existing ancestor is resolved for real (the OS
    * walk resolves `..` THROUGH symlinks — a lexical normalize() first
    * would collapse `link/../out` to the wrong directory and let a
    * crafted spelling defeat the containment check), the not-yet-created
    * remainder appended and only THEN normalized (no symlink can exist
    * inside a non-existent tail, so that collapse is purely lexical). */
  private def realish(p: Path): Path = {
    val abs = p.toAbsolutePath
    var existing = abs
    var tail = List.empty[String]
    while (existing != null && !Files.exists(existing, LinkOption.NOFOLLOW_LINKS)) {
      tail = existing.getFileName.toString :: tail
      existing = existing.getParent
    }
    if (existing == null) abs.normalize()
    else tail.foldLeft(existing.toRealPath())((acc, seg) => acc.resolve(seg))
      .normalize()
  }

  private def contains(outer: Path, inner: Path): Boolean =
    inner.startsWith(outer)

  /** Validate the (input, output, checkpoint) triple of a watched-folder
    * extraction query. Throws IllegalArgumentException on the first
    * violation; returns unit on a safe configuration. */
  def validateWatchDirs(inDir: String, outDir: String,
      checkpointDir: String): Unit = {
    val in = localPath(inDir).getOrElse(return)
    // absolute but NOT lexically normalized: the OS resolves any `..`
    // through symlinks during the exists/isDirectory/toRealPath calls,
    // where normalize() first would mislocate across a symlinked segment
    val inAbs = in.toAbsolutePath
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
