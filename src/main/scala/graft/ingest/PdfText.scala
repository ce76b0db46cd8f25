package graft.ingest

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/** Minimal, dependency-free PDF text extraction (SURVEY §7.4 risk item).
  *
  * Handles the common case: page content streams stored raw or compressed
  * with any chain of ISO 32000 §7.4's general-purpose filters (Flate, LZW,
  * ASCIIHex, ASCII85, RunLength — see [[decodeStream]]), text shown with
  * `Tj` / `TJ` / `'` operators using literal `(...)` or hex `<...>`
  * strings, standard encodings; PDF 1.5 object streams (`/ObjStm`) for the
  * structural dicts; and embedded-font `/ToUnicode` CMaps (bfchar/bfrange),
  * so CID/subset-font hex text maps to real characters. This matches the
  * fidelity class of the reference's PyPDF2 extraction (`app.py:186-192`)
  * — best-effort, garbage-in-garbage-out on scanned PDFs and fonts
  * shipping no ToUnicode. Encrypted PDFs using the standard security
  * handler with an empty user password (RC4 `/V 1`/`2` and AES-128
  * `/AESV2`) decrypt via [[PdfCrypt]] — the `reader.decrypt('')` case of
  * the reference; other handlers, non-empty passwords, and the image
  * codecs (DCT/JPX/CCITT/JBIG2) are out of scope.
  *
  * Page splitting: the real page tree is walked — Catalog → /Pages →
  * /Kids (depth-first, the PDF page order) → each /Page's /Contents
  * stream(s), concatenated per page — so multi-stream pages yield ONE
  * record per page exactly like the reference's `reader.pages` loop. PDFs
  * whose object table we can't parse fall back to one record per content
  * stream (equal for single-stream-per-page files).
  */
object PdfText {

  def extractPages(bytes: Array[Byte]): Seq[String] = {
    try {
      pageTreeTexts(bytes).getOrElse(perStreamTexts(bytes))
    } catch { case _: Throwable => Seq.empty }
  }

  private def perStreamTexts(bytes: Array[Byte]): Seq[String] =
    findStreams(bytes).flatMap { s =>
      val t = extractTextOps(decodeStream(s))
      if (t.trim.nonEmpty) Some(t) else None
    }

  /** Page-tree-ordered per-page texts, or None when the structure doesn't
    * parse (encrypted, exotic layouts...). Objects living inside PDF 1.5
    * `/ObjStm` object streams are surfaced by [[objStmObjects]] first, so
    * modern writers' compressed catalogs/page trees walk normally.
    * ISO-8859-1 is byte-bijective, so regex-captured object bodies convert
    * back to the exact original bytes for stream decoding.
    *
    * Incrementally-updated PDFs (ISO 32000 §7.5.6: new object generations
    * appended after the previous `%%EOF`, xref chained via `/Prev`): the
    * linear scan feeds `toMap`, whose duplicate-key rule keeps the LAST
    * definition — i.e. the highest byte offset, which for append-only
    * updates IS the newest generation. That reproduces what PyPDF2's
    * xref-chain walk (`app.py:186-192`) resolves for appended updates
    * without parsing xref tables at all. The generation number in
    * `N G obj` is deliberately unanchored: a free-then-reuse update
    * (`4 1 obj` superseding `4 0 obj`) is still matched and still
    * last-wins; in-body references stay `N 0 R` in every real writer's
    * page tree, so ref resolution is unaffected.
    */
  private def pageTreeTexts(bytes: Array[Byte]): Option[Seq[String]] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val objRe = """(?s)(\d+)\s+\d+\s+obj\b(.*?)\bendobj""".r
    val direct: Map[Int, String] =
      objRe.findAllMatchIn(s).map(m => m.group(1).toInt -> m.group(2)).toMap
    // standard-security-handler decryption (empty user password): dec(num)
    // is the pre-filter stream transform for object `num` — identity when
    // the file is unencrypted or the handler is unsupported
    val dec: Int => Array[Byte] => Array[Byte] =
      PdfCrypt.detect(s, direct) match {
        case Some(d) => d(_)
        case None    => _ => identity
      }
    // direct object definitions win over object-stream copies (the spec
    // forbids the conflict, but be deterministic about it)
    val objs: Map[Int, String] = objStmObjects(bytes, s, dec) ++ direct
    if (objs.isEmpty) return None
    val refRe = """(\d+)\s+0\s+R""".r
    def refsIn(body: String): Seq[Int] =
      refRe.findAllMatchIn(body).map(_.group(1).toInt).toSeq
    // root: Catalog's /Pages ref, else any /Pages node
    val typeRe = (t: String) => ("""(?s).*/Type\s*/""" + t + """\b.*""").r
    val rootPages = objs.collectFirst {
      case (_, body) if typeRe("Catalog").matches(body) =>
        """/Pages\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(body).map(_.group(1).toInt)
    }.flatten.orElse(objs.collectFirst {
      case (num, body) if typeRe("Pages").matches(body) => num
    })
    val pages = ArrayBuffer[Int]()
    val seen = scala.collection.mutable.Set[Int]()
    def walk(num: Int): Unit = objs.get(num).foreach { body =>
      if (seen.add(num)) {
        if (typeRe("Page").matches(body) && !typeRe("Pages").matches(body)) pages += num
        else if (typeRe("Pages").matches(body)) {
          """(?s)/Kids\s*\[([^\]]*)\]""".r.findFirstMatchIn(body)
            .foreach(kids => refsIn(kids.group(1)).foreach(walk))
        }
      }
    }
    rootPages.foreach(walk)
    if (pages.isEmpty) return None
    Some(pages.toSeq.flatMap { p =>
      val body = objs(p)
      val contentRefs =
        """(?s)/Contents\s*\[([^\]]*)\]""".r.findFirstMatchIn(body)
          .map(m => refsIn(m.group(1)))
          .orElse("""/Contents\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(body)
            .map(m => Seq(m.group(1).toInt)))
          .getOrElse(Seq.empty)
      val fonts = pageFonts(body, objs, dec)
      val text = contentRefs.flatMap(r => objs.get(r).map(r -> _)).flatMap {
        case (cNum, cBody) =>
          findStreams(cBody.getBytes(StandardCharsets.ISO_8859_1)).map { st =>
            extractTextOps(decodeStream(st, dec(cNum)), fonts)
          }
      }.mkString
      if (text.trim.nonEmpty) Some(text) else None
    })
  }

  // ------------------------------------------------- ToUnicode CMap support

  /** A font's ToUnicode character map: source code width in bytes and the
    * code → unicode-string mapping (targets are UTF-16BE per the CMap spec;
    * multi-char targets — ligatures — are legal).
    */
  private case class UniMap(codeBytes: Int, map: Map[Int, String])

  /** The page's font-name → ToUnicode map table, resolved through
    * `/Resources → /Font → <name> → /ToUnicode` (dicts may be inline or
    * refs). Fonts without a ToUnicode CMap (standard-encoding fonts) are
    * absent — their strings pass through byte-wise, the pre-CMap behavior.
    */
  private def pageFonts(pageBody: String, objs: Map[Int, String],
                        dec: Int => Array[Byte] => Array[Byte]): Map[String, UniMap] = {
    def deref(body: String, key: String): Option[String] =
      (key + """\s+(\d+)\s+0\s+R""").r.findFirstMatchIn(body)
        .flatMap(m => objs.get(m.group(1).toInt))
        .orElse(balancedDictAfter(body, key))
    (for {
      res <- deref(pageBody, "/Resources").toSeq
      fontDict <- deref(res, "/Font").toSeq
      m <- """/([^\s/<>\[\]()%]+)\s+(\d+)\s+0\s+R""".r.findAllMatchIn(fontDict)
      fontBody <- objs.get(m.group(2).toInt)
      tuRef <- """/ToUnicode\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(fontBody)
      tuNum = tuRef.group(1).toInt
      tuBody <- objs.get(tuNum)
      st <- findStreams(tuBody.getBytes(StandardCharsets.ISO_8859_1)).headOption
      cm <- parseToUnicode(
        new String(decodeStream(st, dec(tuNum)), StandardCharsets.ISO_8859_1))
    } yield m.group(1) -> cm).toMap
  }

  /** The balanced `<< ... >>` dict right after `key`, handling nesting. */
  private def balancedDictAfter(body: String, key: String): Option[String] = {
    val k = body.indexOf(key)
    if (k < 0) return None
    val start = body.indexOf("<<", k + key.length)
    if (start < 0) return None
    var i = start
    var depth = 0
    while (i + 1 < body.length) {
      if (body.startsWith("<<", i)) { depth += 1; i += 2 }
      else if (body.startsWith(">>", i)) {
        depth -= 1; i += 2
        if (depth == 0) return Some(body.substring(start, i))
      }
      else i += 1
    }
    None
  }

  /** Parse a ToUnicode CMap's `beginbfchar`/`beginbfrange` sections.
    * bfrange supports both the increment form (`<lo> <hi> <dstStart>`) and
    * the array form (`<lo> <hi> [<d0> <d1> ...]`).
    */
  private def parseToUnicode(text: String): Option[UniMap] = {
    val m = scala.collection.mutable.Map[Int, String]()
    // the code width comes from the FIRST entry seen (a CMap's codespace
    // is uniform in practice; last-wins would let a trailing 1-byte bfchar
    // re-group every 2-byte code)
    var codeBytes = -1
    def setWidth(srcHex: String): Unit =
      if (codeBytes < 0) codeBytes = math.max(1, srcHex.length / 2)
    def utf16(hex: String): String =
      try new String(hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
        StandardCharsets.UTF_16BE)
      catch { case _: Exception => "" }
    val hexTok = """<([0-9A-Fa-f]+)>|\[|\]""".r
    for (sec <- """(?s)beginbfchar(.*?)endbfchar""".r.findAllMatchIn(text)) {
      val toks = """<([0-9A-Fa-f]+)>""".r.findAllMatchIn(sec.group(1))
        .map(_.group(1)).toSeq
      toks.grouped(2).foreach {
        case Seq(src, dst) =>
          setWidth(src)
          m(Integer.parseInt(src, 16)) = utf16(dst)
        case _ => ()
      }
    }
    for (sec <- """(?s)beginbfrange(.*?)endbfrange""".r.findAllMatchIn(text)) {
      val toks = hexTok.findAllMatchIn(sec.group(1)).map(_.matched).toSeq
      var i = 0
      def hexAt(j: Int): Option[String] =
        if (j < toks.length && toks(j).startsWith("<")) Some(toks(j).drop(1).dropRight(1))
        else None
      while (i < toks.length) {
        (hexAt(i), hexAt(i + 1)) match {
          case (Some(lo), Some(hi)) =>
            setWidth(lo)
            val (loI, hiI) = (Integer.parseInt(lo, 16), Integer.parseInt(hi, 16))
            if (i + 2 < toks.length && toks(i + 2) == "[") {
              // array form: one target per code
              var j = i + 3
              var code = loI
              while (j < toks.length && toks(j) != "]") {
                hexAt(j).foreach { d => m(code) = utf16(d); code += 1 }
                j += 1
              }
              i = j + 1
            } else {
              // increment form: BMP targets step by one (entries that would
              // step past U+FFFF are skipped — toChar would wrap to
              // unrelated characters; supplementary-plane ranges need the
              // array form)
              hexAt(i + 2).foreach { d =>
                val dstI = Integer.parseInt(d, 16)
                if (d.length <= 4 && dstI + (hiI - loI) <= 0xffff) {
                  var c = loI
                  while (c <= hiI) { m(c) = (dstI + (c - loI)).toChar.toString; c += 1 }
                } else if (d.length > 4) m(loI) = utf16(d) // multi-char start: lo only
              }
              i += 3
            }
          case _ => i = toks.length
        }
      }
    }
    if (m.isEmpty) None
    else Some(UniMap(if (codeBytes < 0) 2 else codeBytes, m.toMap))
  }

  /** Map a raw byte-wise string (each char = one source byte) through a
    * font's ToUnicode table. 2-byte codes consume char pairs; unmapped
    * 2-byte codes vanish (the PyPDF2-class convention), unmapped single
    * bytes pass through.
    */
  private def applyUniMap(raw: String, cm: UniMap): String =
    if (cm.codeBytes <= 1)
      raw.map(c => cm.map.getOrElse(c.toInt, c.toString)).mkString
    else {
      val sb = new StringBuilder
      var i = 0
      while (i + 1 < raw.length) {
        val code = ((raw.charAt(i) & 0xff) << 8) | (raw.charAt(i + 1) & 0xff)
        cm.map.get(code).foreach(sb.append)
        i += 2
      }
      sb.toString
    }

  /** `at` = byte offset of the dict's `<<` in the scanned buffer — lets
    * the ObjStm walker recover the container's object number. */
  private case class Stream(data: Array[Byte], dict: String, at: Int = 0)

  // ------------------------------------------------------- stream filters

  /** The stream dict's filter chain, in application order: `/Filter /Name`
    * or `/Filter [/N1 /N2 ...]` (ISO 32000 §7.4, including the short
    * names). */
  private def filtersOf(dict: String): Seq[String] =
    """/Filter\s*\[([^\]]*)\]""".r.findFirstMatchIn(dict)
      .map(m => """/([A-Za-z0-9]+)""".r.findAllMatchIn(m.group(1))
        .map(_.group(1)).toSeq)
      .orElse("""/Filter\s*/([A-Za-z0-9]+)""".r.findFirstMatchIn(dict)
        .map(m => Seq(m.group(1))))
      .getOrElse(Seq.empty)

  /** Per-stage decode parameters: `/DecodeParms` (or the inline-image
    * abbreviation `/DP`) is POSITIONAL with respect to the filter chain
    * (ISO 32000 §7.3.8.2) — the array form `[null << ... >> ...]` pairs
    * element i with filter i (`null` = no parms). The single-dict form is
    * only conformant with a single-name `/Filter`; on a multi-filter
    * chain a lone dict is applied best-effort to the chain's ONE Flate/
    * LZW stage if exactly one exists (ambiguous otherwise — applying it
    * to every stage mis-decodes the stages the writer never predicted).
    * Indirect-reference parms (`N 0 R`) resolve to "no parms", matching
    * the rest of this extractor's best-effort posture. */
  /** End index (exclusive) of the nested `<< ... >>` dictionary starting at
    * `from` (which must point at "<<"), counting nesting depth. Shared by
    * both [[decodeParmsFor]] branches so a future fix (e.g. `>>` inside a
    * string literal) lands in one place.
    */
  private def scanNestedDict(s: String, from: Int): Int = {
    var j = from
    var depth = 0
    while (j < s.length && {
      if (s.startsWith("<<", j)) { depth += 1; j += 2 }
      else if (s.startsWith(">>", j)) { depth -= 1; j += 2 }
      else j += 1
      depth > 0
    }) ()
    j
  }

  private[graft] def decodeParmsFor(dict: String, filters: Seq[String]): Seq[String] = {
    val none = Seq.fill(filters.length)("")
    val at = """/(?:DecodeParms|DP)\b""".r.findFirstMatchIn(dict)
      .map(_.end).getOrElse(return none)
    var i = at
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    if (i >= dict.length) none
    else if (dict.charAt(i) == '[') {
      // scan top-level array elements: nested << >> dicts, null, or
      // indirect refs ("N G R" is ONE element — miscounting it would shift
      // every later stage's parms)
      val elems = scala.collection.mutable.ArrayBuffer.empty[String]
      var j = i + 1
      def skipWs(): Unit =
        while (j < dict.length && dict.charAt(j).isWhitespace) j += 1
      skipWs()
      while (j < dict.length && dict.charAt(j) != ']') {
        if (dict.startsWith("<<", j)) {
          val start = j
          j = scanNestedDict(dict, j)
          elems += dict.substring(start, j)
        } else {
          val start = j
          while (j < dict.length && dict.charAt(j) != ']' &&
            !dict.charAt(j).isWhitespace && !dict.startsWith("<<", j)) j += 1
          val tok = dict.substring(start, j)
          if (tok.nonEmpty && tok.forall(_.isDigit)) {
            // lookahead for the "G R" tail of an indirect reference
            val save = j
            skipWs()
            val g0 = j
            while (j < dict.length && dict.charAt(j).isDigit) j += 1
            val gen = dict.substring(g0, j)
            skipWs()
            if (gen.nonEmpty && j < dict.length && dict.charAt(j) == 'R' &&
              (j + 1 >= dict.length || !dict.charAt(j + 1).isLetterOrDigit))
              j += 1
            else j = save
          }
          elems += "" // null / ref / junk: no inline parms
        }
        skipWs()
      }
      elems.toSeq.padTo(filters.length, "").take(filters.length)
    } else if (dict.startsWith("<<", i)) {
      val parms = dict.substring(i, scanNestedDict(dict, i))
      val predStages = filters.count(f =>
        f == "FlateDecode" || f == "Fl" || f == "LZWDecode" || f == "LZW")
      if (filters.length == 1) Seq(parms)
      else if (predStages == 1) filters.map(f =>
        if (f == "FlateDecode" || f == "Fl" || f == "LZWDecode" || f == "LZW")
          parms else "")
      else none
    } else none
  }

  /** Apply the dict's filter chain: Flate, LZW, ASCIIHex, ASCII85 and
    * RunLength (all of ISO 32000 §7.4's general-purpose filters — the
    * remaining ones are image codecs: DCT/JPX/CCITT/JBIG2). Unknown
    * filters pass the data through — best-effort, like the rest of this
    * extractor. Flate/LZW honour `/DecodeParms /Predictor` (TIFF
    * horizontal differencing and the PNG row filters, §7.4.4.4) — writers
    * apply predictors to xref streams routinely and to content/object
    * streams occasionally, and an unpredicted stream is garbage bytes.
    * Parms are matched to their stage via [[decodeParmsFor]] — positional,
    * so a multi-filter chain where only one stage has a predictor no
    * longer unpredicts the other stages' output.
    * `pre` is the per-object decryption transform — spec order: decrypt
    * first, THEN the filters (ISO 32000 §7.6.2). */
  private def decodeStream(st: Stream,
                           pre: Array[Byte] => Array[Byte] = identity): Array[Byte] = {
    val fs = filtersOf(st.dict)
    val parms = decodeParmsFor(st.dict, fs)
    fs.zip(parms).foldLeft(pre(st.data)) { case (d, (f, pm)) =>
      f match {
        case "FlateDecode" | "Fl"      => unpredict(inflate(d), pm)
        case "LZWDecode" | "LZW"       => unpredict(lzwDecode(d), pm)
        case "ASCIIHexDecode" | "AHx"  => asciiHexDecode(d)
        case "ASCII85Decode" | "A85"   => ascii85Decode(d)
        case "RunLengthDecode" | "RL"  => runLengthDecode(d)
        case _                         => d
      }
    }
  }

  /** First integer value of `/Name N` in the given dict text — callers
    * pass the stage's own `/DecodeParms` sub-dict (see
    * [[decodeParmsFor]]), so the lookup cannot pick up another stage's
    * parameters. */
  private def intParam(dict: String, name: String, default: Int): Int =
    ("/" + name + """\s+(\d+)""").r.findFirstMatchIn(dict)
      .map(_.group(1).toInt).getOrElse(default)

  /** Undo `/DecodeParms /Predictor` on Flate/LZW output (ISO 32000
    * §7.4.4.4). Predictor 2 is TIFF horizontal differencing (applied for
    * 8-bit components; other depths pass through, best-effort). 10–15 are
    * the PNG filters: rows of `ceil(Columns·Colors·BPC / 8)` bytes, each
    * prefixed by a per-row filter-type byte 0–4 (None/Sub/Up/Average/
    * Paeth) reconstructed against the previous row — the tag values 10–15
    * only select the encoder's strategy; decode always dispatches on the
    * per-row byte. A trailing partial row is dropped, corrupt input
    * yields the input unchanged. */
  private[graft] def unpredict(data: Array[Byte], dict: String): Array[Byte] = {
    val predictor = intParam(dict, "Predictor", 1)
    if (predictor < 2 || data.isEmpty) return data
    val colors = intParam(dict, "Colors", 1)
    val bpc = intParam(dict, "BitsPerComponent", 8)
    val columns = intParam(dict, "Columns", 1)
    val bpp = math.max(1, colors * bpc / 8) // bytes per whole pixel
    val rowLen = (columns * colors * bpc + 7) / 8
    if (rowLen <= 0) return data
    if (predictor == 2) {
      if (bpc != 8) return data
      val out = data.clone()
      var base = 0
      while (base < out.length) {
        var i = bpp
        while (i < rowLen && base + i < out.length) {
          out(base + i) = (out(base + i) + out(base + i - bpp)).toByte
          i += 1
        }
        base += rowLen
      }
      out
    } else {
      val stride = rowLen + 1
      val nRows = data.length / stride
      if (nRows == 0) return data
      val out = new Array[Byte](nRows * rowLen)
      var r = 0
      while (r < nRows) {
        val ft = data(r * stride) & 0xff
        val src = r * stride + 1
        val dst = r * rowLen
        var i = 0
        while (i < rowLen) {
          val raw = data(src + i) & 0xff
          val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
          val up = if (r > 0) out(dst - rowLen + i) & 0xff else 0
          val ul = if (r > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xff else 0
          val v = ft match {
            case 0 => raw
            case 1 => raw + left
            case 2 => raw + up
            case 3 => raw + ((left + up) >> 1)
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left)
              val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            case _ => raw // unknown row tag: best-effort passthrough
          }
          out(dst + i) = v.toByte
          i += 1
        }
        r += 1
      }
      out
    }
  }

  /** PDF-variant LZW (ISO 32000 §7.4.4.2 / TIFF): MSB-first bit packing,
    * 9→12-bit codes, 256 = clear table, 257 = EOD, EarlyChange=1 (the
    * default — code width grows one code early). Corrupt input yields
    * empty, never throws. */
  private[graft] def lzwDecode(data: Array[Byte]): Array[Byte] = {
    try {
      val out = new java.io.ByteArrayOutputStream()
      val dict = new ArrayBuffer[Array[Byte]](4096)
      def reset(): Unit = {
        dict.clear()
        var b = 0
        while (b < 256) { dict += Array(b.toByte); b += 1 }
        dict += null; dict += null // 256 = clear, 257 = EOD
      }
      reset()
      var codeLen = 9
      var bitBuf = 0L
      var bits = 0
      var prev: Array[Byte] = null
      var i = 0
      var done = false
      while (!done) {
        while (bits < codeLen && i < data.length) {
          bitBuf = (bitBuf << 8) | (data(i) & 0xff); bits += 8; i += 1
        }
        if (bits < codeLen) done = true // ran out without EOD: keep what we have
        else {
          val code = ((bitBuf >>> (bits - codeLen)) & ((1L << codeLen) - 1)).toInt
          bits -= codeLen
          if (code == 257) done = true
          else if (code == 256) { reset(); codeLen = 9; prev = null }
          else {
            val entry: Array[Byte] =
              if (code < dict.length && dict(code) != null) dict(code)
              else if (code == dict.length && prev != null) prev :+ prev(0)
              else return Array.emptyByteArray // corrupt code
            out.write(entry)
            if (prev != null && dict.length < 4096) dict += (prev :+ entry(0))
            prev = entry
            if (dict.length >= (1 << codeLen) - 1 && codeLen < 12) codeLen += 1
          }
        }
      }
      out.toByteArray
    } catch { case _: Throwable => Array.emptyByteArray }
  }

  /** ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, `>` ends the
    * stream, an odd trailing digit is padded with 0. */
  private[graft] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else {
        val v = Character.digit(c, 16)
        if (v >= 0) {
          if (hi < 0) hi = v
          else { out.write((hi << 4) | v); hi = -1 }
        }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** ASCII85Decode (§7.4.3): 5 chars (each − 33) base-85 → 4 bytes; `z` is
    * shorthand for four zero bytes; `~>` ends the stream; a partial final
    * group of n chars yields n−1 bytes (padded with 'u' = 84). */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    try {
      val out = new java.io.ByteArrayOutputStream()
      val group = new Array[Int](5)
      var n = 0
      var i = 0
      var done = false
      def flush(count: Int): Unit = {
        var v = 0L
        var j = 0
        while (j < 5) { v = v * 85 + (if (j < count) group(j) else 84); j += 1 }
        val keep = count - 1
        var k = 0
        while (k < keep) { out.write(((v >>> (24 - 8 * k)) & 0xff).toInt); k += 1 }
      }
      while (i < data.length && !done) {
        val c = data(i).toChar
        if (c == '~') done = true
        else if (c == 'z' && n == 0) out.write(Array[Byte](0, 0, 0, 0))
        else if (c >= '!' && c <= 'u') {
          group(n) = c - '!'
          n += 1
          if (n == 5) { flush(5); n = 0 }
        } // whitespace and anything else: skipped
        i += 1
      }
      if (n > 1) flush(n)
      out.toByteArray
    } catch { case _: Throwable => Array.emptyByteArray }
  }

  /** RunLengthDecode (§7.4.5): length byte L — 0..127 copies the next L+1
    * bytes literally, 129..255 repeats the next byte 257−L times, 128 is
    * EOD. */
  private[graft] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xff
      if (l == 128) done = true
      else if (l < 128) {
        val take = math.min(l + 1, data.length - i - 1)
        out.write(data, i + 1, take)
        i += take
      } else if (i + 1 < data.length) {
        var k = 0
        while (k < 257 - l) { out.write(data(i + 1)); k += 1 }
        i += 1
      }
      i += 1
    }
    out.toByteArray
  }

  /** Objects stored INSIDE `/Type /ObjStm` compressed object streams
    * (PDF 1.5+ — where modern writers put the catalog / page-tree dicts,
    * which the top-level `N 0 obj` regex cannot see). Layout per spec
    * (ISO 32000 §7.5.7): the decoded stream opens with `/N` pairs of
    * `objnum offset`, then each object's body starts at `/First + offset`
    * (no obj/endobj wrappers; ObjStm entries cannot themselves contain
    * streams, so body slicing by the next offset is exact).
    */
  private def objStmObjects(bytes: Array[Byte], s: String,
                            dec: Int => Array[Byte] => Array[Byte]): Map[Int, String] = {
    // scan the WHOLE byte buffer (an ObjStm payload containing the literal
    // bytes 'endobj' would truncate an objRe body slice); the container's
    // object number — needed for decryption — is the LAST 'N G obj' header
    // before the stream dict (objects cannot nest, so the nearest preceding
    // header is by definition the container; any generation, comments and
    // whitespace between header and dict tolerated). Headers are collected
    // in ONE pass up front — a per-stream prefix rescan would be
    // O(docSize × nObjStms) on header-heavy documents.
    val headers: Array[(Int, Int)] = """(\d+)\s+\d+\s+obj\b""".r
      .findAllMatchIn(s).map(m => (m.start, m.group(1).toInt)).toArray
    def containerOf(at: Int): Option[Int] = {
      var lo = 0
      var hi = headers.length - 1
      var best = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (headers(mid)._1 < at) { best = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (best >= 0) Some(headers(best)._2) else None
    }
    findStreams(bytes).filter(_.dict.contains("/ObjStm")).flatMap { st =>
      val decFn = containerOf(st.at).map(dec).getOrElse(identity[Array[Byte]] _)
      try {
        val text = new String(decodeStream(st, decFn), StandardCharsets.ISO_8859_1)
        val nOpt = """/N\s+(\d+)""".r.findFirstMatchIn(st.dict).map(_.group(1).toInt)
        val firstOpt = """/First\s+(\d+)""".r.findFirstMatchIn(st.dict).map(_.group(1).toInt)
        (nOpt, firstOpt) match {
          case (Some(n), Some(first)) if first <= text.length =>
            val pairs = text.substring(0, first).trim.split("\\s+")
              .filter(_.nonEmpty).grouped(2)
              .collect { case Array(a, b) => (a.toInt, b.toInt) }
              .toSeq.take(n)
            pairs.zipWithIndex.map { case ((num, off), i) =>
              val end =
                if (i + 1 < pairs.length) first + pairs(i + 1)._2 else text.length
              num -> text.substring(math.min(first + off, text.length),
                math.min(math.max(end, first + off), text.length))
            }
          case _ => Seq.empty
        }
      } catch { case _: Exception => Seq.empty }
    }.toMap
  }

  /** Locate `stream ... endstream` blocks, whether the preceding dict
    * mentions FlateDecode, and the dict text itself.
    */
  private def findStreams(bytes: Array[Byte]): Seq[Stream] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = ArrayBuffer[Stream]()
    // net << / >> balance of `seg`, ignoring delimiters inside PDF literal
    // strings — a dict value like `/T (a>>b)` must not unbalance the scan
    // (escapes and nested balanced parens per ISO 32000 §7.3.4.2)
    def netDepth(seg: String): Int = {
      var i = 0
      var net = 0
      var paren = 0
      while (i < seg.length) {
        val c = seg.charAt(i)
        if (paren > 0) c match {
          case '\\' => i += 1
          case '('  => paren += 1
          case ')'  => paren -= 1
          case _    => ()
        } else c match {
          case '(' => paren = 1
          case '<' if i + 1 < seg.length && seg.charAt(i + 1) == '<' =>
            net += 1; i += 1
          case '>' if i + 1 < seg.length && seg.charAt(i + 1) == '>' =>
            net -= 1; i += 1
          case _ => ()
        }
        i += 1
      }
      net
    }
    var idx = s.indexOf("stream")
    while (idx >= 0) {
      // the stream's dict is the ENCLOSING << ... >>: step back past inner
      // dicts (/DecodeParms << ... >>) until << / >> balance. Bounded (4 KB
      // window, 32 steps — stream dicts are small) with fallback to the
      // nearest `<<`, so stray '>>' bytes in preceding binary garbage can't
      // walk the scan into an EARLIER object's dict and attribute that
      // object's /Filter to this stream.
      val nearest = s.lastIndexOf("<<", idx)
      val floor = math.max(0, idx - 4096)
      var dictStart = nearest
      var steps = 0
      while (dictStart > floor && steps < 32 &&
        netDepth(s.substring(dictStart, idx)) < 0) {
        dictStart = s.lastIndexOf("<<", dictStart - 1)
        steps += 1
      }
      if (dictStart < 0 || netDepth(s.substring(math.max(dictStart, 0), idx)) < 0)
        dictStart = nearest
      dictStart = math.max(0, dictStart)
      val dict = s.substring(dictStart, idx)
      var dataStart = idx + "stream".length
      if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
      if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
      val end = s.indexOf("endstream", dataStart)
      if (end < 0) return out.toSeq
      val raw = bytes.slice(dataStart, end)
      // honor a direct /Length (the EOL before `endstream` is not stream
      // data — ciphertexts must be exact for AES padding / RC4 tails);
      // indirect `/Length N 0 R` is excluded by the lookahead, with \b so
      // backtracking can't shrink the number to dodge it ('/Length 745 0 R'
      // must not match as '74')
      val data = """/Length\s+(\d+)\b(?!\s+\d+\s+R)""".r.findFirstMatchIn(dict)
        .map(_.group(1).toInt).filter(l => l >= 0 && l <= raw.length)
        .map(raw.take).getOrElse(raw)
      out += Stream(data, dict, dictStart)
      idx = s.indexOf("stream", end + 9)
    }
    out.toSeq
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n) else if (n == 0 && !inf.finished()) return out.toByteArray
      }
      out.toByteArray
    } catch { case _: Throwable => Array.emptyByteArray }
    finally inf.end()
  }

  /** Walk a content stream, collecting shown text from Tj / ' / TJ.
    * Tracks the current font via `/Name size Tf`; when the selected font
    * has a ToUnicode CMap (`fonts`), shown strings are mapped through it —
    * CID/subset-font hex codes come out as real text instead of garbage.
    */
  private def extractTextOps(data: Array[Byte],
                             fonts: Map[String, UniMap] = Map.empty): String = {
    val s = new String(data, StandardCharsets.ISO_8859_1)
    val sb = new StringBuilder
    var i = 0
    var lastStrings = ArrayBuffer[String]() // strings since last operator
    var current: Option[UniMap] = None
    // PDF name charset is any regular character — font names like
    // '/TT1.0' or '/C2-0' (macOS Quartz style) must match, else a stale
    // CMap would keep mangling the next font's strings
    val tfRe = """/([^\s/<>\[\]()%]+)\s+[\d.]+\s+Tf""".r
    def show(): String = {
      val raw = lastStrings.mkString
      current.map(applyUniMap(raw, _)).getOrElse(raw)
    }
    while (i < s.length) {
      s.charAt(i) match {
        case '(' =>
          val (str, next) = readLiteral(s, i)
          lastStrings += str; i = next
        case '<' if i + 1 < s.length && s.charAt(i + 1) != '<' =>
          val (str, next) = readHex(s, i)
          lastStrings += str; i = next
        case '/' if fonts.nonEmpty =>
          // a font-select op fits well inside 64 chars — bound the probe so
          // name-heavy streams stay O(n)
          tfRe.findPrefixMatchOf(s.substring(i, math.min(i + 64, s.length))) match {
            case Some(m) => current = fonts.get(m.group(1)); i += m.end
            case None => i += 1
          }
        case 'T' if i + 1 < s.length && (s.charAt(i + 1) == 'j' || s.charAt(i + 1) == 'J') =>
          sb.append(show())
          if (s.charAt(i + 1) == 'J') sb.append(' ') else sb.append(' ')
          lastStrings.clear(); i += 2
        case '\'' =>
          sb.append(show()).append('\n'); lastStrings.clear(); i += 1
        case 'B' if s.startsWith("BT", i) => lastStrings.clear(); i += 2
        case 'E' if s.startsWith("ET", i) => lastStrings.clear(); i += 2
        case _ => i += 1
      }
    }
    sb.toString
  }

  /** The literal `(...)` string starting at `start`, bytes-as-chars — the
    * escape-aware parse [[PdfCrypt]] needs for a literal-form `/O` entry.
    */
  private[ingest] def readLiteralString(s: String, start: Int): String =
    readLiteral(s, start)._1

  private def readLiteral(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
            case 't' => sb.append('\t'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case c @ ('(' | ')' | '\\') => sb.append(c)
            case d if d.isDigit => // octal, up to 3 digits
              var j = i + 1; var v = 0; var n = 0
              while (j < s.length && n < 3 && s.charAt(j).isDigit && s.charAt(j) < '8') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1; n += 1
              }
              sb.append(v.toChar); i = j - 2
            case other => sb.append(other)
          }
          i += 2
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' => depth -= 1; if (depth > 0) sb.append(')'); i += 1
        case c => sb.append(c); i += 1
      }
    }
    (sb.toString, i)
  }

  private def readHex(s: String, start: Int): (String, Int) = {
    val end = s.indexOf('>', start)
    if (end < 0) return ("", s.length)
    val hex = s.substring(start + 1, end).replaceAll("\\s", "")
    val sb = new StringBuilder
    var i = 0
    while (i + 1 < hex.length) {
      try sb.append(Integer.parseInt(hex.substring(i, i + 2), 16).toChar)
      catch { case _: NumberFormatException => }
      i += 2
    }
    (sb.toString, end + 1)
  }
}
