package graft.expressions

import scala.collection.mutable

/** Shared text-hashing kernel for the one-pass expressions (ShingleHashes,
  * MinHashSig, SimHash64): FNV-1a over whitespace tokens and the n-gram
  * shingle mixer. Single-sourced so the documented signature-equivalence
  * between the expressions cannot drift.
  */
object TextHashing {

  /** FNV-1a hash of each whitespace-delimited token of UTF-8 `bytes`. */
  def fnvTokenHashes(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val tokenHashes = mutable.ArrayBuffer.empty[Long]
    var h = 0xCBF29CE484222325L
    var inToken = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isSpace = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      if (isSpace) {
        if (inToken) { tokenHashes += h; h = 0xCBF29CE484222325L; inToken = false }
      } else {
        h = (h ^ (b & 0xFFL)) * 0x100000001B3L
        inToken = true
      }
      i += 1
    }
    if (inToken) tokenHashes += h
    tokenHashes
  }

  /** Mix the n token hashes starting at `start` into one shingle hash. */
  def shingleHash(tokenHashes: mutable.ArrayBuffer[Long], start: Int, n: Int): Long = {
    var acc = 0x9E3779B97F4A7C15L
    var j = 0
    while (j < n) {
      acc = java.lang.Long.rotateLeft(acc ^ tokenHashes(start + j), 27) * 0x94D049BB133111EBL
      j += 1
    }
    acc
  }
}
