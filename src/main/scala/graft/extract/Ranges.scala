package graft.extract

/** Run-length compression of page-number sets, used for skip placeholders
  * in the ordered merge (reference: src/ocrmypdf/_pipeline.py:1274-1304
  * `enumerate_compress_ranges`, consumed by `merge_sidecars` :1307-1327 —
  * skipped pages yield "[OCR skipped on page(s) i-j]" markers instead of
  * silently disappearing). */
object Ranges {

  /** Sorted distinct page numbers → compressed range strings
    * ("3", "5-7"). */
  def compress(pages: Seq[Int]): Seq[String] = {
    if (pages.isEmpty) return Nil
    val sorted = pages.distinct.sorted
    val out = Seq.newBuilder[String]
    var start = sorted.head
    var prev = sorted.head
    def emit(): Unit =
      out += (if (start == prev) s"$start" else s"$start-$prev")
    sorted.tail.foreach { p =>
      if (p == prev + 1) prev = p
      else { emit(); start = p; prev = p }
    }
    emit()
    out.result()
  }

  def describe(pages: Seq[Int]): String = compress(pages).mkString(",")
}
