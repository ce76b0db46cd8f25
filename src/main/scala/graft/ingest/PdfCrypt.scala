package graft.ingest

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** PDF standard security handler (ISO 32000-1 §7.6.3): RC4 (`/V 1`/`2`,
  * revisions 2–3) and AES-128-CBC (`/V 4` `/AESV2`, revision 4) document
  * decryption with the empty user password — the overwhelmingly common
  * "encrypted but openable" case the reference's PyPDF2 handles
  * (`/root/reference/app.py:186-192` via `reader.decrypt('')`). All
  * algorithms are the public-spec ones (Algorithms 1–5); crypto comes from
  * the JDK alone (MD5 `MessageDigest`, `javax.crypto` AES) plus a 20-line
  * RC4, so the ingest path stays dependency-free.
  *
  * `/V 5` AES-256 (`/AESV3`, revisions 5–6 — the PDF 2.0 scheme) is also
  * handled: the file key comes from `/UE` via the SHA-256 (R5) or
  * hardened Algorithm 2.B (R6) derivation and encrypts streams directly
  * (no per-object keys in V5).
  *
  * Out of scope: non-empty passwords (no password source in a bulk ingest
  * pipeline) and crypt filters other than the standard `/StdCF` stream
  * filter.
  */
object PdfCrypt {

  /** The 32-byte password pad of Algorithm 2 (ISO 32000-1, Table 20 note). */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** Plain RC4 — encrypt and decrypt are the same operation. */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha(bits: Int, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(s"SHA-$bits")
    parts.foreach(d.update)
    d.digest()
  }

  private def aesCbcNoPad(mode: Int, key: Array[Byte], iv: Array[Byte],
                          data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Algorithm 2.B (ISO 32000-2 §7.6.4.3.4), the R6 hardened hash: ≥64
    * AES-CBC + SHA-256/384/512 rounds, continuing until the last cipher
    * byte is ≤ rounds−32. `udata` is the 48-byte `/U` value when hashing
    * owner-password inputs, empty for user-password inputs.
    */
  private[graft] def hash2B(input: Array[Byte], pwd: Array[Byte],
                            udata: Array[Byte]): Array[Byte] = {
    var k = sha(256, input)
    var e: Array[Byte] = Array.emptyByteArray
    var i = 0
    while (i < 64 || (e(e.length - 1) & 0xff) > i - 32) {
      val unit = pwd ++ k ++ udata
      val k1 = new Array[Byte](unit.length * 64)
      var j = 0
      while (j < 64) { System.arraycopy(unit, 0, k1, j * unit.length, unit.length); j += 1 }
      e = aesCbcNoPad(Cipher.ENCRYPT_MODE, k.take(16), k.slice(16, 32), k1)
      (e.take(16).map(_ & 0xff).sum % 3: @unchecked) match {
        case 0 => k = sha(256, e)
        case 1 => k = sha(384, e)
        case 2 => k = sha(512, e)
      }
      i += 1
    }
    k.take(32)
  }

  /** V5 user-password hash: R6 uses [[hash2B]], R5 (the withdrawn Acrobat 9
    * scheme) a single SHA-256. `input` = password ‖ salt [‖ U for owner].
    */
  private def v5Hash(r: Int, input: Array[Byte], pwd: Array[Byte],
                     udata: Array[Byte]): Array[Byte] =
    if (r >= 6) hash2B(input, pwd, udata) else sha(256, input)

  /** Pad-or-truncate a password to exactly 32 bytes (Algorithm 2 step a). */
  private def pad32(pwd: Array[Byte]): Array[Byte] = (pwd.take(32) ++ Pad).take(32)

  private def le4(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  /** Algorithm 3: the `/O` dictionary entry from the two passwords. */
  private[graft] def ownerValue(ownerPwd: Array[Byte], userPwd: Array[Byte],
                                r: Int, keyBytes: Int): Array[Byte] = {
    var h = md5(pad32(ownerPwd))
    if (r >= 3) for (_ <- 0 until 50) h = md5(h)
    val key = h.take(keyBytes)
    var o = rc4(key, pad32(userPwd))
    if (r >= 3) for (i <- 1 to 19) o = rc4(key.map(b => (b ^ i).toByte), o)
    o
  }

  /** Algorithm 2: the file encryption key from the user password. Step f
    * (ISO 32000-1): an R4+ document whose encrypt dict carries
    * `/EncryptMetadata false` mixes 0xFFFFFFFF into the digest — omitting
    * it derives a silently-wrong key and every stream decrypts to garbage.
    */
  private[graft] def fileKey(userPwd: Array[Byte], o: Array[Byte], p: Int,
                             id0: Array[Byte], r: Int, keyBytes: Int,
                             encMeta: Boolean = true): Array[Byte] = {
    val noMetaTail = if (r >= 4 && !encMeta)
      Array(0xff, 0xff, 0xff, 0xff).map(_.toByte) else Array.emptyByteArray
    var h = md5(pad32(userPwd), o.take(32), le4(p), id0, noMetaTail)
    if (r >= 3) for (_ <- 0 until 50) h = md5(h.take(keyBytes))
    h.take(keyBytes)
  }

  /** Algorithms 4 (r=2) / 5 (r≥3): the `/U` entry — written by the fixture
    * builder and usable to verify the empty user password.
    */
  private[graft] def userValue(fk: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(fk, Pad)
    else {
      var u = rc4(fk, md5(Pad, id0))
      for (i <- 1 to 19) u = rc4(fk.map(b => (b ^ i).toByte), u)
      u ++ new Array[Byte](16) // 16 bytes of arbitrary padding per spec
    }

  /** Algorithm 1's per-object key: MD5(fileKey ‖ obj№ low 3 LE ‖ gen low 2
    * LE ‖ "sAlT" for AES), truncated to min(len+5, 16).
    */
  private[graft] def objKey(fk: Array[Byte], num: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val tail = Array(
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val salt = if (aes) Array(0x73, 0x41, 0x6c, 0x54).map(_.toByte)
               else Array.emptyByteArray
    md5(fk, tail, salt).take(math.min(fk.length + 5, 16))
  }

  /** AESV2 stream layout: 16-byte IV prefix, then AES-128-CBC/PKCS#5.
    * Wrong key / truncated data yields empty, never throws (best-effort
    * like every other ingest decoder).
    */
  private[graft] def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] =
    if (data.length < 32) Array.emptyByteArray
    else try {
      val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
        new IvParameterSpec(data.take(16)))
      c.doFinal(data, 16, data.length - 16)
    } catch { case _: Exception => Array.emptyByteArray }

  private[graft] def aesEncrypt(key: Array[Byte], iv: Array[Byte],
                                data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    iv ++ c.doFinal(data)
  }

  /** A parsed standard-security-handler state: `apply(objNum)` is the
    * decryptor for that object's streams (generation 0 — the only
    * generation a regex-table reader ever sees).
    */
  private[graft] final case class Decryptor(fk: Array[Byte], aes: Boolean,
                                            fileKeyDirect: Boolean = false) {
    def apply(num: Int): Array[Byte] => Array[Byte] =
      data =>
        if (fileKeyDirect) aesDecrypt(fk, data) // V5: one key for the whole file
        else if (aes) aesDecrypt(objKey(fk, num, 0, aes = true), data)
        else rc4(objKey(fk, num, 0, aes = false), data)
  }

  /** Detect `/Encrypt` in the file and derive the file key with the EMPTY
    * user password. Returns None for unencrypted files and for handlers /
    * versions outside {V1, V2, V4+AESV2} — callers then read streams raw
    * (best-effort, same as the garbage PyPDF2 emits without the password).
    * `s` is the whole file as ISO-8859-1 (byte-bijective) text; `objs` the
    * direct-object table.
    */
  private[graft] def detect(s: String, objs: Map[Int, String]): Option[Decryptor] =
    for {
      encRef <- """/Encrypt\s+(\d+)\s+0\s+R""".r.findFirstMatchIn(s)
      dict <- objs.get(encRef.group(1).toInt)
      if dict.contains("/Standard")
      v = """/V\s+(\d+)""".r.findFirstMatchIn(dict).fold(0)(_.group(1).toInt)
      r <- """/R\s+(\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt)
      d <- if (v == 5 && dict.contains("/AESV3")) detectV5(dict, r)
           else detectLegacy(s, dict, v, r)
    } yield d

  /** V1/V2 RC4 and V4 AESV2: Algorithm 2 file key, per-object keys. */
  private def detectLegacy(s: String, dict: String, v: Int,
                           r: Int): Option[Decryptor] = {
    val aes = v == 4 && dict.contains("/AESV2")
    if (v != 1 && v != 2 && !aes) return None
    for {
      p <- """/P\s+(-?\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt)
      o <- stringAfter(dict, "/O")
      id0 = """/ID\s*\[\s*<([0-9A-Fa-f]*)>""".r.findFirstMatchIn(s)
        .map(m => hexBytes(m.group(1))).getOrElse(Array.emptyByteArray)
      keyBytes = if (v == 1) 5
                 else """/Length\s+(\d+)""".r.findFirstMatchIn(dict)
                   .fold(5)(_.group(1).toInt / 8)
      // ISO 32000-1 Algorithm 2 step f: R4 dicts may disable metadata
      // encryption, which changes the FILE key, not just metadata handling
      encMeta = """/EncryptMetadata\s+false""".r.findFirstIn(dict).isEmpty
    } yield Decryptor(
      fileKey(Array.emptyByteArray, o, p, id0, r, keyBytes, encMeta), aes)
  }

  /** V5 AESV3: the 48-byte `/U` carries the validation and key salts; the
    * file key decrypts out of `/UE` with the R5/R6 intermediate key
    * (Algorithm 2.A, empty user password). Used directly for every stream.
    */
  private def detectV5(dict: String, r: Int): Option[Decryptor] =
    for {
      u <- stringAfter(dict, "/U") if u.length >= 48
      ue <- stringAfter(dict, "/UE") if ue.length >= 32
      keySalt = u.slice(40, 48)
      ikey = v5Hash(r, keySalt, Array.emptyByteArray, Array.emptyByteArray)
      fk <- try Some(aesCbcNoPad(Cipher.DECRYPT_MODE, ikey,
              new Array[Byte](16), ue.take(32)))
            catch { case _: Exception => None }
    } yield Decryptor(fk, aes = true, fileKeyDirect = true)

  /** The PDF string value right after `key` — hex `<...>` or literal
    * `(...)` with the standard escapes (the two forms `/O` and `/U` are
    * written in). The next char after the key must open a string, so `/O`
    * never matches `/OE` (the V5 key).
    */
  private def stringAfter(dict: String, key: String): Option[Array[Byte]] = {
    val m = (java.util.regex.Pattern.quote(key) + """\s*([(<])""").r
      .findFirstMatchIn(dict)
    m.map { mm =>
      val at = mm.end - 1
      if (mm.group(1) == "<") {
        val end = dict.indexOf('>', at)
        hexBytes(dict.substring(at + 1, if (end < 0) dict.length else end)
          .replaceAll("\\s", ""))
      } else
        PdfText.readLiteralString(dict, at).getBytes(StandardCharsets.ISO_8859_1)
    }
  }

  private def hexBytes(hex: String): Array[Byte] =
    hex.grouped(2).filter(_.length == 2)
      .map(h => Integer.parseInt(h, 16).toByte).toArray

  // --------------------------------------------------- fixture/spec support

  /** Build a complete encrypted PDF (catalog → page tree → one literal-Tj
    * content stream per page) for fixtures and specs: `v` = 2 (RC4-128,
    * R3), 4 (AES-128 AESV2, R4) or 5 (AES-256 AESV3, R6 by default —
    * `rOverride` = 5 exercises the withdrawn Acrobat 9 SHA-256 scheme).
    * Empty user and owner passwords, spec-correct `/O`/`/U` (and
    * `/OE`/`/UE`/`/Perms` for V5). Deterministic throughout: fixed salts,
    * IVs derived from object numbers.
    */
  private[graft] def samplePdf(texts: Seq[String], v: Int,
                               rOverride: Int = 0,
                               encryptMetadata: Boolean = true): Array[Byte] = {
    require(v == 2 || v == 4 || v == 5, s"unsupported sample version $v")
    val r = if (rOverride > 0) rOverride else if (v == 5) 6 else if (v == 4) 4 else 3
    val aes = v >= 4
    val p = -44
    val id0 = Array.tabulate(16)(i => (i * 17 + 3).toByte)
    def hx(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString

    // key material + the encrypt-dict body, per scheme
    val built: ((Int, Array[Byte]) => Array[Byte], String) =
      if (v == 5) {
        val fk = Array.tabulate(32)(i => (i * 7 + 1).toByte)
        val (vSalt, kSalt) = (Array.tabulate(8)(i => (i + 1).toByte),
          Array.tabulate(8)(i => (i + 9).toByte))
        val empty = Array.emptyByteArray
        val u48 = v5Hash(r, vSalt, empty, empty) ++ vSalt ++ kSalt
        val ue = aesCbcNoPad(Cipher.ENCRYPT_MODE,
          v5Hash(r, kSalt, empty, empty), new Array[Byte](16), fk)
        val (oVSalt, oKSalt) = (Array.tabulate(8)(i => (i + 17).toByte),
          Array.tabulate(8)(i => (i + 25).toByte))
        val o48 = v5Hash(r, oVSalt ++ u48, empty, u48) ++ oVSalt ++ oKSalt
        val oe = aesCbcNoPad(Cipher.ENCRYPT_MODE,
          v5Hash(r, oKSalt ++ u48, empty, u48), new Array[Byte](16), fk)
        val permsBlock = le4(p) ++ Array(0xff, 0xff, 0xff, 0xff).map(_.toByte) ++
          "TadbZZZZ".getBytes(StandardCharsets.ISO_8859_1)
        val ecb = Cipher.getInstance("AES/ECB/NoPadding")
        ecb.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(fk, "AES"))
        val perms = ecb.doFinal(permsBlock)
        val enc = (num: Int, pt: Array[Byte]) =>
          aesEncrypt(fk, md5(s"iv$num".getBytes(StandardCharsets.ISO_8859_1)), pt)
        (enc, s"/Filter /Standard /V 5 /R $r /Length 256 /P $p" +
          s" /O <${hx(o48)}> /OE <${hx(oe)}> /U <${hx(u48)}> /UE <${hx(ue)}>" +
          s" /Perms <${hx(perms)}>" +
          " /CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF")
      } else {
        val o = ownerValue(Array.emptyByteArray, Array.emptyByteArray, r, 16)
        val fk = fileKey(Array.emptyByteArray, o, p, id0, r, 16,
          encMeta = encryptMetadata || r < 4)
        val u = userValue(fk, id0, r)
        val cf = if (aes) " /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>" +
                          " /StmF /StdCF /StrF /StdCF" else ""
        val em = if (!encryptMetadata && r >= 4) " /EncryptMetadata false" else ""
        val enc = (num: Int, pt: Array[Byte]) =>
          if (aes) aesEncrypt(objKey(fk, num, 0, aes = true),
            md5(s"iv$num".getBytes(StandardCharsets.ISO_8859_1)), pt)
          else rc4(objKey(fk, num, 0, aes = false), pt)
        (enc, s"/Filter /Standard /V $v /R $r /Length 128 /P $p" +
          s" /O <${hx(o)}> /U <${hx(u)}>$em$cf")
      }

    val (encrypt, encDict) = built
    val nP = texts.length
    val encNum = 3 + 2 * nP
    val sb = new StringBuilder("%PDF-1.4\n")
    sb.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    sb.append(s"2 0 obj << /Type /Pages /Kids [${
      (0 until nP).map(i => s"${3 + i} 0 R").mkString(" ")} ] /Count $nP >> endobj\n")
    texts.indices.foreach { i =>
      sb.append(s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R " +
        s"/Contents ${3 + nP + i} 0 R >> endobj\n")
    }
    texts.zipWithIndex.foreach { case (t, i) =>
      val num = 3 + nP + i
      val pt = s"BT /F1 12 Tf 72 720 Td ($t) Tj ET"
        .getBytes(StandardCharsets.ISO_8859_1)
      val ct = encrypt(num, pt)
      sb.append(s"$num 0 obj << /Length ${ct.length} >>\nstream\n")
      sb.append(new String(ct, StandardCharsets.ISO_8859_1))
      sb.append("\nendstream\nendobj\n")
    }
    sb.append(s"$encNum 0 obj << $encDict >> endobj\n")
    sb.append(s"trailer << /Size ${encNum + 1} /Root 1 0 R " +
      s"/Encrypt $encNum 0 R /ID [<${hx(id0)}> <${hx(id0)}>] >>\n%%EOF\n")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }
}
