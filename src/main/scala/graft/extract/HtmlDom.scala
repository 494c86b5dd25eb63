package graft.extract

import scala.collection.mutable.ArrayBuffer

/** From-scratch HTML tokenizer + DOM-tree builder (no external parser —
  * BASELINE north rule mandates a from-scratch DOM + density heuristic).
  *
  * Scope: the tag soup a transcript payload can contain — nested
  * elements, attributes (only `href`/`class`/`id` are retained),
  * entities, comments, CDATA, script/style raw-text, void elements,
  * unclosed tags. Not a spec-complete HTML5 tree builder; recovery is
  * "pop to nearest matching open tag, else ignore".
  */
object HtmlDom {

  sealed trait Node
  final case class Element(tag: String, attrs: Map[String, String],
      children: ArrayBuffer[Node]) extends Node
  final case class Text(value: String) extends Node

  /** Elements whose content is raw text (never parsed as markup). */
  private val RawText = Set("script", "style", "noscript", "textarea")

  /** Void elements — never pushed on the open stack. */
  private val Void = Set("br", "img", "hr", "meta", "link", "input",
    "area", "base", "col", "embed", "source", "track", "wbr")

  /** Block-level elements auto-close an open <p>/<li> (the common
    * unclosed-tag patterns our fixtures exercise). */
  private val AutoClosesP = Set("p", "div", "ul", "ol", "li", "table",
    "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "aside",
    "nav", "footer", "header", "blockquote", "pre")

  private val RetainedAttrs = Set("href", "class", "id")

  def parse(html: String): Element = {
    val root = Element("#root", Map.empty, ArrayBuffer.empty)
    if (html == null || html.isEmpty) return root
    val stack = ArrayBuffer[Element](root)
    val n = html.length
    var i = 0
    val textBuf = new StringBuilder

    def flushText(): Unit = {
      if (textBuf.nonEmpty) {
        stack.last.children += Text(decodeEntities(textBuf.toString))
        textBuf.clear()
      }
    }

    // pathological nesting cap: beyond this depth new elements are
    // treated as self-closing. Keeps tree depth (and the classifier's
    // recursion) bounded, so a poison page can never stack-overflow a
    // task — extraction must be total (contrast with the reference's
    // fail-the-job-on-poison S3 semantics, which we keep for I/O, not
    // for parse structure).
    val MaxDepth = 256

    def openElement(tag: String, attrs: Map[String, String],
        selfClosed: Boolean): Unit = {
      // implied </p>, </li> before a new block-level open
      if (AutoClosesP.contains(tag)) {
        val top = stack.last.tag
        if ((top == "p" && tag != "p") || (top == "li" && tag == "li") ||
            (top == "p" && tag == "p") || (top == "li" && tag == "ul") ||
            (top == "li" && tag == "ol")) {
          if (stack.length > 1 && (top == "p" || top == "li")) {
            stack.remove(stack.length - 1)
          }
        }
      }
      val el = Element(tag, attrs, ArrayBuffer.empty)
      stack.last.children += el
      if (!selfClosed && !Void.contains(tag) && stack.length < MaxDepth)
        stack += el
    }

    def closeElement(tag: String): Unit = {
      var idx = stack.length - 1
      while (idx > 0 && stack(idx).tag != tag) idx -= 1
      if (idx > 0) stack.remove(idx, stack.length - idx) // pop through match
      // else: stray close tag — ignore
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else if (html.regionMatches(true, i, "<![CDATA[", 0, 9)) {
            val end = html.indexOf("]]>", i + 9)
            if (end < 0) { textBuf.append(html.substring(i + 9)); i = n }
            else { textBuf.append(html.substring(i + 9, end)); i = end + 3 }
          } else { // doctype / other declaration
            val end = html.indexOf('>', i)
            i = if (end < 0) n else end + 1
          }
        } else if (c1 == '?') {
          flushText()
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else if (c1 == '/') {
          flushText()
          val end = html.indexOf('>', i)
          if (end < 0) { i = n }
          else {
            val tag = html.substring(i + 2, end).trim.toLowerCase
            if (tag.nonEmpty && tag.forall(isTagChar)) closeElement(tag)
            i = end + 1
          }
        } else if (isTagStart(c1)) {
          flushText()
          val (tag, attrs, selfClosed, next) = parseTag(html, i)
          i = next
          if (RawText.contains(tag) && !selfClosed) {
            // consume raw text up to the matching close tag
            val closeSeq = "</" + tag
            var j = html.indexOf(closeSeq, i)
            // the close must be followed by '>' or whitespace
            while (j >= 0 && {
              val k = j + closeSeq.length
              k < n && html.charAt(k) != '>' &&
                !Character.isWhitespace(html.charAt(k))
            }) j = html.indexOf(closeSeq, j + 1)
            val el = Element(tag, attrs, ArrayBuffer.empty)
            if (j < 0) {
              el.children += Text(html.substring(i)); i = n
            } else {
              el.children += Text(html.substring(i, j))
              val gt = html.indexOf('>', j)
              i = if (gt < 0) n else gt + 1
            }
            stack.last.children += el
          } else {
            openElement(tag, attrs, selfClosed)
          }
        } else { // stray '<' in text
          textBuf.append(c); i += 1
        }
      } else {
        // bulk-append the whole text run up to the next '<' (one range
        // copy instead of a per-char append call)
        val start = i
        i += 1
        while (i < n && html.charAt(i) != '<') i += 1
        textBuf.underlying.append(html, start, i)
      }
    }
    flushText()
    root
  }

  private def isTagStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isTagChar(c: Char): Boolean =
    isTagStart(c) || (c >= '0' && c <= '9') || c == '-' || c == ':'

  /** Parse `<tag attr="v" ...>` starting at `start` (pointing at '<').
    * Returns (tag, retainedAttrs, selfClosed, indexAfterGt).
    */
  private def parseTag(html: String, start: Int)
      : (String, Map[String, String], Boolean, Int) = {
    val n = html.length
    var i = start + 1
    val t0 = i
    while (i < n && isTagChar(html.charAt(i))) i += 1
    val tag = html.substring(t0, i).toLowerCase
    var attrs = Map.empty[String, String]
    var selfClosed = false
    var done = false
    while (i < n && !done) {
      val c = html.charAt(i)
      if (c == '>') { done = true; i += 1 }
      else if (c == '/' && i + 1 < n && html.charAt(i + 1) == '>') {
        selfClosed = true; done = true; i += 2
      } else if (Character.isWhitespace(c)) i += 1
      else {
        // attribute name — matched region-wise against the retained set
        // first, so non-retained attributes allocate nothing
        val a0 = i
        while (i < n && !Character.isWhitespace(html.charAt(i)) &&
               html.charAt(i) != '=' && html.charAt(i) != '>' &&
               html.charAt(i) != '/') i += 1
        val nameLen = i - a0
        val retainedName =
          if (nameLen == 4 && html.regionMatches(true, a0, "href", 0, 4)) "href"
          else if (nameLen == 5 && html.regionMatches(true, a0, "class", 0, 5)) "class"
          else if (nameLen == 2 && html.regionMatches(true, a0, "id", 0, 2)) "id"
          else null
        while (i < n && Character.isWhitespace(html.charAt(i))) i += 1
        if (i < n && html.charAt(i) == '=') {
          i += 1
          while (i < n && Character.isWhitespace(html.charAt(i))) i += 1
          var v0 = i
          var v1 = i
          if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
            val q = html.charAt(i); i += 1
            v0 = i
            while (i < n && html.charAt(i) != q) i += 1
            v1 = i
            if (i < n) i += 1
          } else {
            v0 = i
            while (i < n && !Character.isWhitespace(html.charAt(i)) &&
                   html.charAt(i) != '>') i += 1
            v1 = i
          }
          if (retainedName != null) {
            attrs = attrs.updated(retainedName,
              decodeEntities(html.substring(v0, v1)))
          }
        } else if (retainedName != null) {
          attrs = attrs.updated(retainedName, "")
        }
      }
    }
    (tag, attrs, selfClosed, i)
  }

  private val NamedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "rsquo" -> "’", "lsquo" -> "‘",
    "rdquo" -> "”", "ldquo" -> "“")

  /** Decode &name;, &#NN; and &#xHH; entities; unknown entities pass
    * through verbatim (frozen behavior for golden equality). */
  def decodeEntities(s: String): String = {
    if (s == null || s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try {
              sb.appendAll(Character.toChars(Integer.parseInt(body.substring(2), 16)))
              i = semi + 1
            } catch { case _: Exception => sb.append(c); i += 1 }
          } else if (body.startsWith("#")) {
            try {
              sb.appendAll(Character.toChars(Integer.parseInt(body.substring(1))))
              i = semi + 1
            } catch { case _: Exception => sb.append(c); i += 1 }
          } else NamedEntities.get(body) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
