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

  /** Local-filesystem path of `p` if it is file-scheme-like, else None
    * (URI schemes such as s3a:// or hdfs:// are remote-warehouse
    * territory with no symlink semantics to validate here). */
  private def localPath(p: String): Option[Path] = {
    if (p.startsWith("file:")) Some(Paths.get(java.net.URI.create(p)))
    else if (p.contains("://")) None
    else Some(Paths.get(p))
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
    val inReal = inAbs.toRealPath()
    require(inReal == inAbs,
      s"watched input dir resolves through a symlink " +
        s"($inAbs -> $inReal): refusing to watch a redirected tree")
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
