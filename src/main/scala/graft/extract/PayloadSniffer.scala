package graft.extract

/** Payload-type detection for the `text` column: HTML document vs PDF
  * byte stream vs plain text (BASELINE north rule). The reference keeps
  * this decision implicit in `pdf_link` (S3ItemProcessor.java:63); here
  * the content is embedded, so we sniff leading bytes like `file(1)`
  * magic would.
  */
object PayloadSniffer {

  final val Html = "html"
  final val Pdf = "pdf"
  final val Plain = "plain"

  /** Deterministic, order-independent sniff of the payload kind. */
  def sniff(text: String): String = {
    if (text == null) return Plain
    // skip leading whitespace without allocating
    var i = 0
    val n = text.length
    while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
    if (i >= n) return Plain
    if (text.startsWith("%PDF-", i)) return Pdf
    if (text.charAt(i) == '<') {
      // cheap lowercase prefix probe: <!doctype, <html, or any known
      // html container tag within the first 256 chars
      val window = text.substring(i, math.min(n, i + 256)).toLowerCase
      if (window.startsWith("<!doctype") || window.startsWith("<html") ||
          window.contains("<html") || window.startsWith("<head") ||
          window.startsWith("<body") || window.startsWith("<div") ||
          window.startsWith("<p>") || window.startsWith("<p ") ||
          window.startsWith("<article")) return Html
    }
    Plain
  }
}
