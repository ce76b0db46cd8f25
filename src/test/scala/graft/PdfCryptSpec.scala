package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{PdfCrypt, PdfText}

/** Standard-security-handler decryption: RC4 against its published test
  * vector, AES round trip, and full encrypted-PDF extraction through the
  * page tree for both V2/R3 (RC4-128) and V4/R4 (AESV2).
  */
class PdfCryptSpec extends AnyFunSuite {

  test("rc4 matches the published Key/Plaintext vector and round-trips") {
    val key = "Key".getBytes(StandardCharsets.US_ASCII)
    val pt = "Plaintext".getBytes(StandardCharsets.US_ASCII)
    val ct = PdfCrypt.rc4(key, pt)
    assert(ct.map(b => f"${b & 0xff}%02X").mkString == "BBF316E8D940AF0AD3")
    assert(PdfCrypt.rc4(key, ct).sameElements(pt))
  }

  test("aes encrypt/decrypt round-trips and bad input yields empty") {
    val key = Array.tabulate(16)(_.toByte)
    val iv = Array.tabulate(16)(i => (255 - i).toByte)
    val pt = "BT (hello) Tj ET".getBytes(StandardCharsets.US_ASCII)
    val ct = PdfCrypt.aesEncrypt(key, iv, pt)
    assert(PdfCrypt.aesDecrypt(key, ct).sameElements(pt))
    assert(PdfCrypt.aesDecrypt(key, ct.take(20)).isEmpty) // truncated
    assert(PdfCrypt.aesDecrypt(key.reverse, ct).isEmpty)  // wrong key
  }

  test("RC4-encrypted PDF (V2/R3) extracts all pages in tree order") {
    val texts = Seq("Secret alpha", "Secret beta", "Secret gamma")
    val pages = PdfText.extractPages(PdfCrypt.samplePdf(texts, v = 2))
    assert(pages == texts.map(_ + " "))
  }

  test("AES-encrypted PDF (V4/R4 AESV2) extracts all pages in tree order") {
    val texts = Seq("Vault delta", "Vault epsilon")
    val pages = PdfText.extractPages(PdfCrypt.samplePdf(texts, v = 4))
    assert(pages == texts.map(_ + " "))
  }

  test("V4/R4 with /EncryptMetadata false mixes 0xFFFFFFFF into the file key") {
    // Algorithm 2 step f: the flag changes the FILE key. A reader that
    // ignores it derives a wrong key and extracts garbage silently.
    val texts = Seq("Plain-meta iota", "Plain-meta kappa")
    val doc = PdfCrypt.samplePdf(texts, v = 4, encryptMetadata = false)
    assert(PdfText.extractPages(doc) == texts.map(_ + " "))
    // and the flag genuinely changed the key: the same document body built
    // WITH metadata encryption decrypts differently
    val withMeta = PdfCrypt.samplePdf(texts, v = 4)
    assert(!new String(doc, StandardCharsets.ISO_8859_1)
      .equals(new String(withMeta, StandardCharsets.ISO_8859_1)))
  }

  test("AES-256 PDF (V5/R6 AESV3, hardened 2.B derivation) extracts") {
    val texts = Seq("Sealed zeta", "Sealed eta")
    val pages = PdfText.extractPages(PdfCrypt.samplePdf(texts, v = 5))
    assert(pages == texts.map(_ + " "))
  }

  test("AES-256 PDF (V5/R5, withdrawn SHA-256 scheme) extracts") {
    val texts = Seq("Sealed theta")
    val pages = PdfText.extractPages(PdfCrypt.samplePdf(texts, v = 5, rOverride = 5))
    assert(pages == texts.map(_ + " "))
  }

  test("corrupted /O never throws — best-effort garbage like the rest") {
    val bytes = PdfCrypt.samplePdf(Seq("Secret alpha"), v = 2)
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val oAt = s.indexOf("/O <") + 4
    val mangled = (s.substring(0, oAt) + "00" + s.substring(oAt + 2))
      .getBytes(StandardCharsets.ISO_8859_1)
    val pages = PdfText.extractPages(mangled) // wrong file key → garbage
    assert(!pages.contains("Secret alpha "))
  }
}
