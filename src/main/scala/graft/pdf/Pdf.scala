package graft.pdf

import scala.collection.mutable.{ArrayBuffer, HashMap}

/** COS (Carousel Object System) value model + tolerant lexer/parser.
  *
  * Scope per SURVEY.md §7.5: Flate streams, text operators, ToUnicode
  * CMaps, standard encodings. Encrypted documents are rejected with a
  * typed outcome (reference: src/ocrmypdf/pdfinfo/info.py:434-436
  * `EncryptedPdfError`). The parser is xref-free: objects are located by
  * scanning for `N G obj` headers, which tolerates broken cross-reference
  * tables the way the reference's box-repair pass tolerates malformed
  * geometry (reference: src/ocrmypdf/_pageboxes.py:117-177).
  */
sealed trait Cos
final case class CosNum(d: Double) extends Cos { def i: Int = d.toInt }
final case class CosStr(bytes: Array[Byte]) extends Cos
final case class CosName(name: String) extends Cos
final case class CosBool(b: Boolean) extends Cos
case object CosNull extends Cos
final case class CosArr(items: Vector[Cos]) extends Cos
final case class CosDict(m: Map[String, Cos]) extends Cos {
  def get(k: String): Option[Cos] = m.get(k)
}
final case class CosRef(num: Int, gen: Int) extends Cos
final case class CosStream(dict: CosDict, raw: Array[Byte]) extends Cos
final case class CosOp(op: String) extends Cos // content-stream operator

final class PdfLexer(val data: Array[Byte], var pos: Int) {
  def this(data: Array[Byte]) = this(data, 0)
  private val n = data.length

  @inline private def b(i: Int): Int = data(i) & 0xff
  @inline def atEnd: Boolean = pos >= n

  private def isWs(c: Int) =
    c == 0x20 || c == 0x0a || c == 0x0d || c == 0x09 || c == 0x0c || c == 0x00
  private def isDelim(c: Int) =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  def skipWs(): Unit = {
    var going = true
    while (going && pos < n) {
      val c = b(pos)
      if (isWs(c)) pos += 1
      else if (c == '%') { // comment to EOL
        while (pos < n && b(pos) != 0x0a && b(pos) != 0x0d) pos += 1
      } else going = false
    }
  }

  /** Next token as a Cos value; operators/keywords come back as CosOp. */
  def next(): Cos = {
    skipWs()
    if (pos >= n) return null
    val c = b(pos)
    c match {
      case '/' => name()
      case '(' => literalString()
      case '[' => pos += 1; CosOp("[")
      case ']' => pos += 1; CosOp("]")
      case '<' =>
        if (pos + 1 < n && b(pos + 1) == '<') { pos += 2; CosOp("<<") }
        else hexString()
      case '>' =>
        if (pos + 1 < n && b(pos + 1) == '>') { pos += 2; CosOp(">>") }
        else { pos += 1; CosOp(">") } // stray: tolerated
      case '{' => pos += 1; CosOp("{")
      case '}' => pos += 1; CosOp("}")
      case ')' => pos += 1; CosOp(")") // stray: tolerated
      case _ if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
        number()
      case _ => keyword()
    }
  }

  private def name(): CosName = {
    pos += 1 // '/'
    val sb = new java.lang.StringBuilder(16)
    while (pos < n && !isWs(b(pos)) && !isDelim(b(pos))) {
      val c = b(pos)
      if (c == '#' && pos + 2 < n) {
        val h = Character.digit(b(pos + 1), 16)
        val l = Character.digit(b(pos + 2), 16)
        if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); pos += 3 }
        else { sb.append(c.toChar); pos += 1 }
      } else { sb.append(c.toChar); pos += 1 }
    }
    CosName(sb.toString)
  }

  private def number(): CosNum = {
    val start = pos
    if (b(pos) == '+' || b(pos) == '-') pos += 1
    while (pos < n && ((b(pos) >= '0' && b(pos) <= '9') || b(pos) == '.')) pos += 1
    val s = new String(data, start, pos - start, java.nio.charset.StandardCharsets.ISO_8859_1)
    val d = try s.toDouble catch { case _: NumberFormatException => 0.0 }
    CosNum(d)
  }

  private def keyword(): Cos = {
    val start = pos
    while (pos < n && !isWs(b(pos)) && !isDelim(b(pos))) pos += 1
    if (pos == start) { pos += 1; return CosOp(b(start).toChar.toString) }
    val s = new String(data, start, pos - start, java.nio.charset.StandardCharsets.ISO_8859_1)
    s match {
      case "true" => CosBool(true)
      case "false" => CosBool(false)
      case "null" => CosNull
      case _ => CosOp(s)
    }
  }

  private def literalString(): CosStr = {
    pos += 1 // '('
    val out = new java.io.ByteArrayOutputStream(32)
    var depth = 1
    while (pos < n && depth > 0) {
      val c = b(pos)
      if (c == '\\' && pos + 1 < n) {
        val e = b(pos + 1)
        e match {
          case 'n' => out.write('\n'); pos += 2
          case 'r' => out.write('\r'); pos += 2
          case 't' => out.write('\t'); pos += 2
          case 'b' => out.write('\b'); pos += 2
          case 'f' => out.write('\f'); pos += 2
          case '(' => out.write('('); pos += 2
          case ')' => out.write(')'); pos += 2
          case '\\' => out.write('\\'); pos += 2
          case 0x0a => pos += 2 // line continuation
          case 0x0d =>
            pos += 2; if (pos < n && b(pos) == 0x0a) pos += 1
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; pos += 1
            while (k < 3 && pos < n && b(pos) >= '0' && b(pos) <= '7') {
              v = v * 8 + (b(pos) - '0'); pos += 1; k += 1
            }
            out.write(v & 0xff)
          case _ => out.write(e); pos += 2
        }
      } else if (c == '(') { depth += 1; out.write(c); pos += 1 }
      else if (c == ')') {
        depth -= 1; if (depth > 0) out.write(c); pos += 1
      } else { out.write(c); pos += 1 }
    }
    CosStr(out.toByteArray)
  }

  private def hexString(): CosStr = {
    pos += 1 // '<'
    val out = new java.io.ByteArrayOutputStream(32)
    var hi = -1
    var going = true
    while (going && pos < n) {
      val c = b(pos)
      if (c == '>') { pos += 1; going = false }
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write((hi << 4) | d); hi = -1 }
        }
        pos += 1
      }
    }
    if (hi >= 0) out.write(hi << 4) // odd digit: trailing zero per spec
    CosStr(out.toByteArray)
  }

  /** Parse a full value (dict/array composition + `R` references). */
  def parseValue(): Cos = {
    val t = next()
    parseFrom(t)
  }

  def parseFrom(t: Cos): Cos = t match {
    case null => CosNull
    case CosOp("<<") =>
      val m = Map.newBuilder[String, Cos]
      var going = true
      while (going) {
        val k = next()
        k match {
          case CosName(nm) => m += nm -> parseValue()
          case CosOp(">>") | null => going = false
          case _ => () // tolerate junk key
        }
      }
      CosDict(m.result())
    case CosOp("[") =>
      val items = Vector.newBuilder[Cos]
      var going = true
      while (going) {
        val v = next()
        v match {
          case CosOp("]") | null => going = false
          case other => items += parseFrom(other)
        }
      }
      // collapse "num num R" triples into refs
      CosArr(collapseRefs(items.result()))
    case CosNum(d) =>
      // lookahead for "gen R"
      val save = pos
      val t2 = next()
      t2 match {
        case CosNum(g) =>
          val save2 = pos
          next() match {
            case CosOp("R") => CosRef(d.toInt, g.toInt)
            case _ => pos = save; CosNum(d)
          }
        case _ => pos = save; CosNum(d)
      }
    case other => other
  }

  private def collapseRefs(items: Vector[Cos]): Vector[Cos] = items
  // refs inside arrays are already collapsed by the CosNum lookahead above
}

/** Parsed document: object map + page list with inherited resources. */
final class PdfDoc(
    val objects: HashMap[Int, Cos],
    val encrypted: Boolean,
    val pages: Vector[PdfPage],
    val parseNotes: List[String],
    val catalog: Option[CosDict]
)
final case class PdfPage(dict: CosDict, inheritedResources: Option[CosDict])

object PdfDoc {
  val maxObjects = 50000
  val maxPageTreeDepth = 64

  /** Read an object body (value + optional stream payload) with the lexer
    * positioned just after the `obj` keyword. Shared by the full scan and
    * the speculative xref path. */
  private def readBody(lx: PdfLexer, data: Array[Byte]): Cos = {
    val n = data.length
    val v = lx.parseValue()
    val save = lx.pos
    lx.next() match {
      case CosOp("stream") =>
        // skip single EOL after 'stream'
        var p = lx.pos
        if (p < n && data(p) == 0x0d) p += 1
        if (p < n && data(p) == 0x0a) p += 1
        val dict = v match { case d: CosDict => d; case _ => CosDict(Map.empty) }
        val len = dict.get("Length") match {
          case Some(CosNum(l)) => l.toInt
          case _ => -1 // ref or missing: scan for endstream
        }
        val end =
          // Long-side compare: a corrupt multi-GB /Length saturates toInt
          // and p + len wraps negative, silently emptying the stream where
          // the endstream fallback would recover it
          if (len >= 0 && p.toLong + len.toLong <= n) p + len
          else indexOf(data, "endstream", p) match {
            case -1 => n
            case e => // trim trailing EOL
              var q = e
              if (q > p && data(q - 1) == 0x0a) q -= 1
              if (q > p && data(q - 1) == 0x0d) q -= 1
              q
          }
        val raw = java.util.Arrays.copyOfRange(data, p, math.max(end, p))
        lx.pos = math.max(end, p) // payload consumed: forward scans must
        // not re-tokenize binary bytes (spurious "N G obj" inside a
        // compressed payload could overwrite a REAL object)
        CosStream(dict, raw)
      case _ =>
        lx.pos = save
        v
    }
  }

  /** Forward-parse `N G obj <body>` at a known byte offset (xref path).
    * Returns (objnum, body) or None if the header doesn't match. */
  def readObjectAt(data: Array[Byte], off: Int): Option[(Int, Cos)] = {
    if (off < 0 || off >= data.length) return None
    val lx = new PdfLexer(data, off)
    (lx.next(), lx.next(), lx.next()) match {
      case (CosNum(num), CosNum(_), CosOp("obj")) if num >= 0 =>
        Some((num.toInt, readBody(lx, data)))
      case _ => None
    }
  }

  def parse(data: Array[Byte]): PdfDoc =
    parseViaXref(data).getOrElse(parseFullScan(data))

  /** Tolerant whole-file scan — the recovery path: finds every `N G obj`
    * header regardless of xref integrity. */
  def parseFullScan(data: Array[Byte]): PdfDoc = {
    val notes = List.newBuilder[String]
    val objects = new HashMap[Int, Cos]
    // scan for "N G obj" headers
    var i = 0
    val n = data.length
    var count = 0
    while (i < n - 3 && count < maxObjects) {
      if (data(i) == 'o' && data(i + 1) == 'b' && data(i + 2) == 'j' &&
        (i + 3 >= n || isDelimOrWs(data(i + 3))) &&
        i > 0 && isWs(data(i - 1))) {
        // walk back: gen num, obj num
        val hdr = parseHeaderBack(data, i - 1)
        if (hdr >= 0) {
          val lx = new PdfLexer(data, i + 3)
          val body = readBody(lx, data)
          objects(hdr) = body
          count += 1
          // skip the consumed payload only for STREAM objects (their
          // binary payloads legitimately contain fake "obj" headers); a
          // corrupt NON-stream body (unterminated dict/string) can
          // swallow the rest of the file — skipping with lx.pos would
          // then hide every later object from the very recovery scan
          // this path exists for
          body match {
            case _: CosStream => i = math.max(i, lx.pos - 1)
            case _ => ()
          }
        }
      }
      i += 1
    }

    // Expand compressed object streams (/Type /ObjStm): modern PDFs keep
    // most objects inside Flate-compressed streams addressed by an xref
    // stream; since this path is xref-free, decode every ObjStm and lift
    // its objects into the map (direct objects win on collision).
    expandObjStms(objects, notes,
      objects.collect { case (num, s: CosStream)
        if s.dict.get("Type").contains(CosName("ObjStm")) => num }.toSet)

    // trailers
    var encrypted = false
    var rootRef: Option[Cos] = None
    var t = indexOf(data, "trailer", 0)
    while (t >= 0) {
      val lx = new PdfLexer(data, t + 7)
      lx.parseValue() match {
        case d: CosDict =>
          if (d.get("Encrypt").isDefined) encrypted = true
          // LAST trailer wins: incremental updates append their trailer
          // (and possibly a rebuilt catalog) at the END of the file
          d.get("Root").foreach(r => rootRef = Some(r))
        case _ => ()
      }
      t = indexOf(data, "trailer", t + 7)
    }
    // xref-stream PDFs carry /Root and /Encrypt in the /Type /XRef stream
    // dict instead of a trailer keyword
    objects.values.foreach {
      case s: CosStream if s.dict.get("Type").contains(CosName("XRef")) =>
        if (s.dict.get("Encrypt").isDefined) encrypted = true
        if (rootRef.isEmpty) rootRef = s.dict.get("Root")
      case _ => ()
    }
    assemble(objects, encrypted, rootRef, notes)
  }

  /** Speculative fast path: follow startxref → xref table / xref stream →
    * parse ONLY the objects the cross-reference addresses, then validate
    * (a catalog must resolve and yield ≥1 page). Any inconsistency —
    * missing/garbled xref, bad offsets, empty page tree, any throw —
    * returns None and the caller falls back to the tolerant whole-file
    * scan. This is the reference's speculative-execute + validate +
    * fallback discipline (reference: src/ocrmypdf/_pipeline.py:1115-1171
    * `try_auto_pdfa`: cheap path, verify, recover), applied to parsing:
    * well-formed files skip the O(file) header scan; damaged files get
    * the recovery parser, never a wrong answer.
    *
    * Incremental updates: /Prev chains are followed newest-first (capped)
    * and earlier revisions never overwrite newer entries — the spec's
    * shadowing rule. */
  def parseViaXref(data: Array[Byte]): Option[PdfDoc] = try {
    val n = data.length
    // locate the LAST startxref in the tail window (spec: last 1024 bytes;
    // be generous)
    val tailFrom = math.max(0, n - 2048)
    var sx = -1
    var probe = indexOf(data, "startxref", tailFrom)
    while (probe >= 0) { sx = probe; probe = indexOf(data, "startxref", probe + 9) }
    if (sx < 0) return None
    val off0 = new PdfLexer(data, sx + 9).next() match {
      case CosNum(v) if v >= 0 && v < n => v.toInt
      case _ => return None
    }
    val notes = List.newBuilder[String]
    val offsets = new HashMap[Int, Int] // objnum → byte offset (newest wins)
    val packed = new HashMap[Int, Int] // objnum → container ObjStm objnum
    val freed = new scala.collection.mutable.HashSet[Int] // type-0 shadow
    var trailers = Vector.empty[CosDict]
    var xrefStreamOffs = Vector.empty[Int]

    def record(num: Int, tpe: Int, f2: Long, f3: Long): Unit = {
      if (num >= 0 && num < maxObjects &&
        !offsets.contains(num) && !packed.contains(num) &&
        !freed.contains(num)) {
        tpe match {
          case 1 if f2 >= 0 && f2 < n => offsets(num) = f2.toInt
          case 2 => packed(num) = f2.toInt
          case _ => freed += num // type 0 = free: the newest revision
          // DELETED this object — older sections' live entries must not
          // resurrect it (spec shadowing)
        }
      }
    }

    var off = off0
    var hops = 0
    while (off >= 0 && hops < 8) {
      hops += 1
      // skip whitespace to see what lives at the offset
      var p = off
      while (p < n && isWs(data(p))) p += 1
      if (p + 4 <= n && data(p) == 'x' && data(p + 1) == 'r' &&
        data(p + 2) == 'e' && data(p + 3) == 'f') {
        // classic table: subsections of `start count` then fixed entries
        val lx = new PdfLexer(data, p + 4)
        var trailerDict: Option[CosDict] = None
        var done = false
        var guard = 0
        while (!done && guard < maxObjects) {
          lx.next() match {
            case CosNum(start) =>
              lx.next() match {
                case CosNum(cnt) =>
                  var k = 0
                  while (k < cnt.toInt && guard < maxObjects) {
                    (lx.next(), lx.next(), lx.next()) match {
                      case (CosNum(o), CosNum(_), CosOp(t))
                        if t == "n" || t == "f" =>
                        record(start.toInt + k, if (t == "n") 1 else 0,
                          o.toLong, 0L)
                      case _ => return None // garbled entry: not a real xref
                    }
                    k += 1; guard += 1
                  }
                case _ => return None
              }
            case CosOp("trailer") =>
              lx.parseValue() match {
                case d: CosDict => trailerDict = Some(d); done = true
                case _ => return None
              }
            case _ => done = true // tolerate missing trailer keyword
          }
        }
        trailerDict match {
          case Some(d) =>
            trailers :+= d
            off = d.get("Prev") match {
              case Some(CosNum(v)) if v >= 0 && v < n => v.toInt
              case _ => -1
            }
          case None => off = -1
        }
      } else {
        // xref STREAM: an object whose stream encodes the table via /W
        readObjectAt(data, p) match {
          case Some((num, s: CosStream))
            if s.dict.get("Type").contains(CosName("XRef")) =>
            offsets.getOrElseUpdate(num, p) // the xref object itself
            xrefStreamOffs :+= p
            val resolveNone: Cos => Cos = identity
            val decoded = decodeStream(s, resolveNone).getOrElse(return None)
            val w = s.dict.get("W") match {
              case Some(CosArr(ws)) => ws.collect { case CosNum(v) => v.toInt }
              case _ => return None
            }
            if (w.length < 3 || w.exists(x => x < 0 || x > 8)) return None
            val rowLen = w.sum
            if (rowLen <= 0) return None
            val size = s.dict.get("Size") match {
              case Some(CosNum(v)) => v.toInt
              case _ => return None
            }
            val index: Vector[(Int, Int)] = s.dict.get("Index") match {
              case Some(CosArr(items)) =>
                val nums = items.collect { case CosNum(v) => v.toInt }
                nums.grouped(2).collect { case Seq(a, b) => (a, b) }.toVector
              case _ => Vector((0, size))
            }
            var r = 0
            index.foreach { case (start, cnt) =>
              var k = 0
              while (k < cnt) {
                val base = r * rowLen
                if (base + rowLen <= decoded.length) {
                  var fi = 0
                  val fields = new Array[Long](3)
                  var pos = base
                  while (fi < 3) {
                    var v = 0L
                    var b = 0
                    while (b < w(fi)) { v = (v << 8) | (decoded(pos) & 0xffL); pos += 1; b += 1 }
                    fields(fi) = if (w(fi) == 0 && fi == 0) 1L else v // W[0]=0 ⇒ type 1
                    fi += 1
                  }
                  record(start + k, fields(0).toInt, fields(1), fields(2))
                }
                r += 1; k += 1
              }
            }
            trailers :+= s.dict
            off = s.dict.get("Prev") match {
              case Some(CosNum(v)) if v >= 0 && v < n => v.toInt
              case _ => -1
            }
          case _ => return None
        }
      }
    }

    // parse every addressed object at its recorded offset
    val objects = new HashMap[Int, Cos]
    offsets.toVector.sortBy(_._1).foreach { case (num, o) =>
      readObjectAt(data, o) match {
        case Some((parsedNum, body)) if parsedNum == num => objects(num) = body
        case Some(_) => return None // offset points at the wrong object: stale xref
        case None => return None
      }
    }
    // expand only the ObjStms that type-2 entries reference
    expandObjStms(objects, notes, packed.values.toSet,
      member = (num, stm) => packed.get(num).contains(stm))
    // packed objects the ObjStm expansion failed to produce ⇒ corrupt
    if (packed.keysIterator.exists(num => !objects.contains(num))) return None

    val encrypted = trailers.exists(_.get("Encrypt").isDefined)
    val rootRef = trailers.flatMap(_.get("Root")).headOption
    if (rootRef.isEmpty && !encrypted) return None
    notes += "xref:fast_path"
    val doc = assemble(objects, encrypted, rootRef, notes)
    // validation gate: the fast path must have produced a usable document
    if (doc.encrypted) Some(doc)
    else if (doc.catalog.isEmpty || doc.pages.isEmpty) None
    else Some(doc)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Lift the member objects of the given /ObjStm streams into the map
    * (objects already present win — direct/newer always beats packed). */
  private def expandObjStms(objects: HashMap[Int, Cos],
      notes: scala.collection.mutable.Builder[String, List[String]],
      stmNums: Set[Int],
      // which (objnum, containerNum) pairs may be lifted: the xref fast
      // path restricts to the container the xref assigns (stale members
      // of older live containers must not shadow newer copies); the
      // xref-free full scan accepts all members
      member: (Int, Int) => Boolean = (_, _) => true): Unit = {
    val resolveEarly: Cos => Cos = {
      case CosRef(num, _) => objects.getOrElse(num, CosNull)
      case other => other
    }
    stmNums.toVector.sorted.foreach { stmNum =>
      objects.get(stmNum) match {
        case Some(s: CosStream)
          if s.dict.get("Type").contains(CosName("ObjStm")) =>
          decodeStream(s, resolveEarly).foreach { data =>
            val nObjs = resolveEarly(s.dict.get("N").getOrElse(CosNull)) match {
              case CosNum(v) => v.toInt
              case _ => 0
            }
            val first = resolveEarly(s.dict.get("First").getOrElse(CosNull)) match {
              case CosNum(v) => v.toInt
              case _ => 0
            }
            val lx = new PdfLexer(data)
            val pairs = Vector.newBuilder[(Int, Int)]
            var k = 0
            var bad = false
            while (k < nObjs && k < 10000 && !bad) {
              (lx.next(), lx.next()) match {
                case (CosNum(num), CosNum(off)) => pairs += ((num.toInt, off.toInt))
                case _ => bad = true; notes += "objstm:bad_header"
              }
              k += 1
            }
            pairs.result().foreach { case (num, off) =>
              if (!objects.contains(num) && member(num, stmNum) &&
                first + off >= 0 && first + off < data.length) {
                val olx = new PdfLexer(data, first + off)
                objects(num) = olx.parseValue()
              }
            }
          }
        case _ => ()
      }
    }
  }

  /** Shared back half of both parse paths: catalog resolution + page-tree
    * walk + tolerant page fallback. */
  private def assemble(objects: HashMap[Int, Cos], encrypted: Boolean,
      rootRef: Option[Cos],
      notes: scala.collection.mutable.Builder[String, List[String]]): PdfDoc = {

    def resolve(c: Cos, depth: Int = 0): Cos = c match {
      case CosRef(num, _) if depth < 16 =>
        resolve(objects.getOrElse(num, CosNull), depth + 1)
      case other => other
    }

    // find catalog
    val catalog: Option[CosDict] = rootRef.map(resolve(_)).collect {
      case d: CosDict => d
    }.orElse {
      objects.valuesIterator.collectFirst {
        case d: CosDict if d.get("Type").contains(CosName("Catalog")) => d
      }
    }

    // walk page tree. The visited set is GLOBAL across the whole walk:
    // a path-local set would re-visit a kid once per duplicate reference
    // (duplicated text, and k^depth walk blowup on adversarial trees
    // whose every node repeats its child k times).
    val pages = Vector.newBuilder[PdfPage]
    val walked = scala.collection.mutable.HashSet.empty[Int]
    def walk(node: Cos, inherited: Option[CosDict], depth: Int): Unit = {
      if (depth > maxPageTreeDepth) { notes += "pagetree:depth_cap"; return }
      val (id, resolved) = node match {
        case CosRef(num, _) => (num, resolve(node))
        case other => (-1, other)
      }
      if (id >= 0 && !walked.add(id)) { notes += "pagetree:cycle"; return }
      resolved match {
        case d: CosDict =>
          val res = d.get("Resources").map(resolve(_)).collect {
            case r: CosDict => r
          }.orElse(inherited)
          d.get("Type") match {
            case Some(CosName("Page")) => pages += PdfPage(d, res)
            case _ =>
              d.get("Kids").map(resolve(_)) match {
                case Some(CosArr(kids)) =>
                  kids.foreach(k => walk(k, res, depth + 1))
                case _ =>
                  if (d.get("Contents").isDefined) pages += PdfPage(d, res)
              }
          }
        case _ => ()
      }
    }
    catalog.flatMap(_.get("Pages")).foreach(walk(_, None, 0))
    val pageVec = pages.result()
    val finalPages =
      if (pageVec.nonEmpty) pageVec
      else // tolerant fallback: any object that looks like a page
        objects.toVector.sortBy(_._1).collect {
          case (_, d: CosDict) if d.get("Type").contains(CosName("Page")) =>
            PdfPage(d, d.get("Resources").map(resolve(_)).collect { case r: CosDict => r })
        }
    new PdfDoc(objects, encrypted, finalPages, notes.result(), catalog)
  }

  def resolveIn(objects: HashMap[Int, Cos])(c: Cos): Cos = c match {
    case CosRef(num, _) => objects.getOrElse(num, CosNull) match {
      case r: CosRef => resolveIn(objects)(r)
      case other => other
    }
    case other => other
  }

  /** Decode a stream's bytes applying /Filter chains: Flate, LZW,
    * ASCIIHex, ASCII85, RunLength (the text-stream filters; image codecs
    * like DCT/JBIG2/JPX are irrelevant — we extract text, not pixels).
    * Unknown filters → None, caller records a note — the reference's
    * conservatism about formats it can't decode
    * (cf. src/ocrmypdf/pdfinfo/layout.py:44-65). */
  def decodeStream(s: CosStream, resolve: Cos => Cos): Option[Array[Byte]] = {
    val filters: Vector[String] = resolve(s.dict.get("Filter").getOrElse(CosNull)) match {
      case CosName(f) => Vector(f)
      case CosArr(fs) => fs.collect { case CosName(f) => f }
      case _ => Vector.empty
    }
    // DecodeParms: single dict, or array parallel to the Filter array
    // (PDF 32000-1 §7.4). /DP is the inline-image abbreviation.
    val parmsRaw = resolve(s.dict.get("DecodeParms")
      .orElse(s.dict.get("DP")).getOrElse(CosNull))
    def parmsFor(i: Int): Option[CosDict] = parmsRaw match {
      case d: CosDict => if (filters.length == 1) Some(d) else if (i == 0) Some(d) else None
      case CosArr(items) => items.lift(i).map(resolve).collect { case d: CosDict => d }
      case _ => None
    }
    def intParm(p: Option[CosDict], k: String, dflt: Int): Int =
      p.flatMap(_.get(k)).map(resolve) match {
        case Some(CosNum(v)) => v.toInt
        case _ => dflt
      }
    var cur = s.raw
    var i = 0
    while (i < filters.length) {
      val p = parmsFor(i)
      filters(i) match {
        case "FlateDecode" | "Fl" | "LZWDecode" | "LZW" =>
          cur =
            if (filters(i).startsWith("F")) inflate(cur)
            else lzwDecode(cur, intParm(p, "EarlyChange", 1))
          // predictor pass (PNG predictors are routine on object streams
          // and xref streams; ignoring them would parse garbage as COS
          // data — reference applies them via pikepdf)
          val pred = intParm(p, "Predictor", 1)
          if (pred > 1) {
            val colors = intParm(p, "Colors", 1)
            val bpc = intParm(p, "BitsPerComponent", 8)
            val columns = intParm(p, "Columns", 1)
            unpredict(cur, pred, colors, bpc, columns) match {
              case Some(u) => cur = u
              case None => return None // unsupported predictor: typed reject
            }
          }
        case "ASCIIHexDecode" | "AHx" => cur = asciiHexDecode(cur)
        case "ASCII85Decode" | "A85" => cur = ascii85Decode(cur)
        case "RunLengthDecode" | "RL" => cur = runLengthDecode(cur)
        case other if other.nonEmpty => return None
        case _ => ()
      }
      i += 1
    }
    Some(cur)
  }

  /** Reverse a PNG (10-15) or TIFF (2) predictor applied before
    * compression (PDF 32000-1 §7.4.4.4; PNG spec §9 filter algorithms).
    * Returns None for predictors we can't honor — the caller records a
    * typed reject instead of parsing garbage. */
  def unpredict(data: Array[Byte], predictor: Int, colors: Int, bpc: Int,
      columns: Int): Option[Array[Byte]] = {
    if (colors < 1 || bpc < 1 || columns < 1) return None
    val bpp = math.max(1, (colors * bpc + 7) / 8) // bytes per pixel
    // divide in LONG, range-check, then narrow: `.toInt / 8` applied the
    // narrowing before the divide, so adversarial colors·bpc·columns
    // near 2^32 wrapped to a small bogus rowBytes and the predictor
    // "succeeded" on garbage instead of hitting the typed reject
    val rowBytesL = (colors.toLong * bpc * columns + 7) / 8
    if (rowBytesL <= 0 || rowBytesL > data.length) return None
    val rowBytes = rowBytesL.toInt
    if (predictor == 2) {
      // TIFF horizontal differencing (8-bit components only — others are
      // not seen on COS data streams)
      if (bpc != 8) return None
      val out = data.clone()
      var r = 0
      while (r + rowBytes <= out.length) {
        var i = r + bpp
        while (i < r + rowBytes && i < out.length) {
          out(i) = (out(i) + out(i - bpp)).toByte
          i += 1
        }
        r += rowBytes
      }
      return Some(out)
    }
    if (predictor < 10 || predictor > 15) return None
    // PNG predictors: each row = 1 filter-type byte + rowBytes payload;
    // the per-row filter byte decides the algorithm (predictor 15 = any)
    val stride = rowBytes + 1
    val nRows = data.length / stride
    val out = new Array[Byte](nRows * rowBytes)
    val prev = new Array[Byte](rowBytes) // zero row above the first
    var r = 0
    while (r < nRows) {
      val ft = data(r * stride) & 0xff
      val src = r * stride + 1
      val dst = r * rowBytes
      var i = 0
      while (i < rowBytes) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = prev(i) & 0xff
        val upLeft = if (i >= bpp) prevAt(prev, i - bpp) else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) / 2)
          case 4 => raw + paeth(left, up, upLeft)
          case _ => return None // invalid per-row filter type
        }
        out(dst + i) = v.toByte
        i += 1
      }
      System.arraycopy(out, dst, prev, 0, rowBytes)
      r += 1
    }
    Some(out)
  }

  @inline private def prevAt(prev: Array[Byte], i: Int): Int = prev(i) & 0xff

  /** PNG Paeth predictor (PNG spec §9.4). */
  def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  def asciiHexDecode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length / 2)
    var hi = -1
    var i = 0
    var done = false
    while (i < in.length && !done) {
      val c = in(i) & 0xff
      if (c == '>') done = true
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
        } // whitespace/junk skipped (tolerance rule)
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd final digit: implied 0
    out.toByteArray
  }

  def ascii85Decode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 4 / 5)
    var tuple = 0L
    var count = 0
    var i = 0
    var done = false
    def flush(n: Int): Unit = {
      var t = tuple
      var k = count
      while (k < 5) { t = t * 85 + 84; k += 1 } // pad with 'u'
      val bytes = Array(((t >> 24) & 0xff).toByte, ((t >> 16) & 0xff).toByte,
        ((t >> 8) & 0xff).toByte, (t & 0xff).toByte)
      out.write(bytes, 0, n)
    }
    while (i < in.length && !done) {
      val c = in(i) & 0xff
      if (c == '~') done = true // "~>" EOD
      else if (c == 'z' && count == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        count += 1
        if (count == 5) { flush(4); tuple = 0; count = 0 }
      } // whitespace/junk skipped
      i += 1
    }
    if (count > 1) flush(count - 1)
    out.toByteArray
  }

  def runLengthDecode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 2)
    var i = 0
    var done = false
    while (i < in.length && !done) {
      val l = in(i) & 0xff
      i += 1
      if (l == 128) done = true
      else if (l < 128) {
        val n = math.min(l + 1, in.length - i)
        out.write(in, i, n); i += n
      } else if (i < in.length) {
        val b = in(i); i += 1
        var k = 0
        while (k < 257 - l) { out.write(b); k += 1 }
      }
    }
    out.toByteArray
  }

  /** PDF-variant LZW (9→12-bit codes, clear=256, EOD=257, EarlyChange). */
  def lzwDecode(in: Array[Byte], earlyChange: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(in.length * 3)
    var dict = new ArrayBuffer[Array[Byte]](4096)
    def resetDict(): Unit = {
      dict = new ArrayBuffer[Array[Byte]](4096)
      var b = 0
      while (b < 256) { dict += Array(b.toByte); b += 1 }
      dict += null; dict += null // 256 clear, 257 eod
    }
    resetDict()
    var codeBits = 9
    var buf = 0L
    var nBits = 0
    var prev: Array[Byte] = null
    var i = 0
    var done = false
    while (i < in.length && !done) {
      buf = (buf << 8) | (in(i) & 0xff)
      nBits += 8
      i += 1
      while (nBits >= codeBits && !done) {
        val code = ((buf >> (nBits - codeBits)) & ((1 << codeBits) - 1)).toInt
        nBits -= codeBits
        if (code == 256) { resetDict(); codeBits = 9; prev = null }
        else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < dict.length && dict(code) != null) dict(code)
            else if (prev != null) prev :+ prev(0)
            else { done = true; null } // corrupt: stop, keep what we have
          if (entry != null) {
            out.write(entry, 0, entry.length)
            if (prev != null && dict.length < 4096) dict += (prev :+ entry(0))
            prev = entry
            // width bump when the NEXT added entry would need more bits
            // (EarlyChange=1 bumps one code early, per the PDF spec); the
            // former `- 1` bumped one entry LATE and garbled every stream
            // crossing the 9→10-bit boundary (reviewed, verified)
            if (dict.length + earlyChange >= (1 << codeBits) && codeBits < 12)
              codeBits += 1
          }
        }
      }
    }
    out.toByteArray
  }

  /** Tolerant zlib inflate: returns everything decodable before any error. */
  def inflate(in: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(in)
    val out = new java.io.ByteArrayOutputStream(math.max(64, in.length * 4))
    val buf = new Array[Byte](8192)
    try {
      var going = true
      while (going && !inf.finished()) {
        val k = inf.inflate(buf)
        if (k > 0) out.write(buf, 0, k)
        else going = false
      }
    } catch { case _: java.util.zip.DataFormatException => () }
    finally inf.end()
    out.toByteArray
  }

  private def isWs(bb: Byte): Boolean = {
    val c = bb & 0xff
    c == 0x20 || c == 0x0a || c == 0x0d || c == 0x09 || c == 0x0c || c == 0x00
  }
  private def isDelimOrWs(bb: Byte): Boolean = {
    val c = bb & 0xff
    isWs(bb) || c == '<' || c == '[' || c == '/' || c == '(' || c == '%'
  }

  /** Walk back over "N G " before an `obj` keyword; returns object number
    * or -1 if the preceding bytes are not a valid header. */
  private def parseHeaderBack(data: Array[Byte], at: Int): Int = {
    var i = at
    while (i >= 0 && isWs(data(i))) i -= 1
    // gen
    val genEnd = i
    while (i >= 0 && data(i) >= '0' && data(i) <= '9') i -= 1
    if (i == genEnd) return -1
    while (i >= 0 && isWs(data(i))) i -= 1
    val numEnd = i
    while (i >= 0 && data(i) >= '0' && data(i) <= '9') i -= 1
    if (i == numEnd) return -1
    val s = new String(data, i + 1, numEnd - i,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    try s.toInt catch { case _: NumberFormatException => -1 }
  }

  def indexOf(data: Array[Byte], pat: String, from: Int): Int = {
    val p = pat.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    var i = math.max(from, 0)
    val last = data.length - p.length
    while (i <= last) {
      var j = 0
      while (j < p.length && data(i + j) == p(j)) j += 1
      if (j == p.length) return i
      i += 1
    }
    -1
  }
}
