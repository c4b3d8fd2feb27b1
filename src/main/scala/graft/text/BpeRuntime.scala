package graft.text

import org.apache.spark.unsafe.types.UTF8String

/** JVM runtime for the native BPE encode expression
  * ([[graft.functions.BpeEncode]]): one pass per document — lowercase
  * (via `UTF8String.toLowerCase`, the EXACT routine Spark's `lower()`
  * uses, so native and column-chain bytes cannot diverge on case
  * folding), whitespace tokenize (the same `\s+` Java pattern Spark's
  * `split` compiles), then the driver-side symbol-array merge loop per
  * word ([[Bpe.symbolsOf]] + [[Bpe.applyMerge]] — the loop BpeSpec
  * proves byte-equal to the literal-replace chain). Versus the composed
  * Column chain this avoids materializing the ~2× char-spaced string
  * once per merge (24 full-string scans+copies per document).
  */
object BpeRuntime {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Space-joined BPE tokens of `text`, or null when it has no tokens —
    * byte-identical to [[Bpe.encodeText]].
    */
  def encode(text: UTF8String, merges: Array[Array[String]]): UTF8String = {
    val s = text.toLowerCase.toString
    val words = Ws.split(s)
    val sb = new java.lang.StringBuilder(s.length * 2)
    var w = 0
    var any = false
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        var syms = Bpe.symbolsOf(word)
        var k = 0
        while (k < merges.length) {
          syms = Bpe.applyMerge(syms, merges(k)(0), merges(k)(1))
          k += 1
        }
        var i = 0
        while (i < syms.length) {
          if (any || i > 0) sb.append(' ')
          sb.append(syms(i))
          i += 1
        }
        any = true
      }
      w += 1
    }
    if (!any) null else UTF8String.fromString(sb.toString)
  }
}
