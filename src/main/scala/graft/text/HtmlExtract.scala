package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → training text, the extraction stage between crawl ingest
  * ([[graft.sources.Warc]]) and the text-curation operators (M1/M6/…):
  * strip markup, decode entities, and drop boilerplate blocks by link
  * density — the jusText/trafilatura heuristic family (Pomikálek 2011),
  * re-expressed as codegen'd Catalyst expressions so the whole
  * crawl→text chain stays one narrow whole-stage-codegen span with
  * zero shuffles.
  *
  * Two surfaces:
  *  - [[HtmlStripExpr]] `html_strip(html)` — the SQL-mirrorable strip:
  *    a FIXED pipeline of regex removals + entity replaces +
  *    whitespace collapse, chosen so an ANSI-SQL oracle can replay it
  *    step for step (the gate's independent check).
  *  - [[HtmlMainExpr]] `html_main_text(html)` — the real extractor: a
  *    single-pass scanner producing per-block (text, chars, link
  *    chars), keeping blocks under a link-density cap, with script/
  *    style/comment skipping and numeric+named entity decode.
  */
object HtmlExtract {

  // ---- strip mode (SQL-replayable pipeline) ------------------------------

  private val ReComment = java.util.regex.Pattern.compile("(?s)<!--.*?-->")
  private val ReScript =
    java.util.regex.Pattern.compile("(?is)<script\\b[^>]*>.*?</script>")
  private val ReStyle =
    java.util.regex.Pattern.compile("(?is)<style\\b[^>]*>.*?</style>")
  private val ReTag = java.util.regex.Pattern.compile("<[^>]*>")
  private val ReWs = java.util.regex.Pattern.compile("\\s+")

  /** The documented, oracle-replayable pipeline: comments, script and
    * style blocks, then every tag become spaces; the five ubiquitous
    * named entities decode (&amp; LAST, so doubly-escaped text stays
    * escaped, the standard order); whitespace collapses. Each step is
    * one ANSI `regexp_replace`/`replace`. */
  def strip(html: String): String = {
    var s = ReComment.matcher(html).replaceAll(" ")
    s = ReScript.matcher(s).replaceAll(" ")
    s = ReStyle.matcher(s).replaceAll(" ")
    s = ReTag.matcher(s).replaceAll(" ")
    s = s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&nbsp;", " ").replace("&amp;", "&")
    ReWs.matcher(s).replaceAll(" ").trim
  }

  // ---- main-text mode (single-pass block scanner) ------------------------

  /** One rendered block: collapsed text, char count, chars inside
    * `<a>`. */
  final case class Block(text: String, nChars: Int, nLinkChars: Int) {
    def linkDensity: Double =
      if (nChars == 0) 0.0 else nLinkChars.toDouble / nChars
  }

  /** Tags that terminate a text block (HTML's block-level elements plus
    * structural table/list parts). */
  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "tr", "td", "th",
    "thead", "tbody", "blockquote", "pre", "article", "section",
    "header", "footer", "nav", "aside", "main", "form", "fieldset",
    "title", "head", "body", "html")

  /** Raw-text elements whose content never renders. */
  private val SkipTags: Set[String] = Set("script", "style", "noscript", "template")

  /** Single pass over the markup: emits rendered blocks in document
    * order. O(|html|), no allocation beyond the builders. */
  def blocks(html: String): Vector[Block] = {
    val out = Vector.newBuilder[Block]
    val sb = new java.lang.StringBuilder(256)
    var nChars = 0
    var nLink = 0
    var linkDepth = 0
    var pendingSpace = false

    def flush(): Unit = {
      if (nChars > 0) out += Block(sb.toString, nChars, nLink)
      sb.setLength(0); nChars = 0; nLink = 0; pendingSpace = false
    }
    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\u00a0') {
        if (nChars > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c); nChars += 1
        if (linkDepth > 0) nLink += 1
      }
    }

    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          val e = html.indexOf('>', i + 1)
          if (e < 0) { i = n } // truncated tag: drop the tail
          else {
            val inner = html.substring(i + 1, e)
            val closing = inner.startsWith("/")
            val name = tagName(inner)
            if (!closing && SkipTags.contains(name)) {
              // raw-text element: skip to its end tag, case-insensitive
              val end = indexOfIgnoreCase(html, "</" + name, e + 1)
              if (end < 0) { i = n }
              else {
                val gt = html.indexOf('>', end)
                i = if (gt < 0) n else gt + 1
              }
            } else {
              if (name == "a") {
                if (closing) linkDepth = math.max(0, linkDepth - 1)
                else if (!inner.endsWith("/")) linkDepth += 1
              }
              if (BlockTags.contains(name)) flush()
              i = e + 1
            }
          }
        }
      } else if (c == '&') {
        val (decoded, next) = entity(html, i)
        emit(decoded)
        i = next
      } else {
        emit(c)
        i += 1
      }
    }
    flush()
    out.result()
  }

  private def tagName(inner: String): String = {
    val s = if (inner.startsWith("/")) inner.substring(1) else inner
    var e = 0
    while (e < s.length && (s.charAt(e).isLetterOrDigit)) e += 1
    s.substring(0, e).toLowerCase
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    var i = from
    val max = hay.length - needle.length
    while (i <= max) {
      if (hay.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Decode the entity starting at `i` (which points at '&'); returns
    * (char, index after the entity). Unknown entities pass '&' through
    * verbatim. */
  private def entity(html: String, i: Int): (Char, Int) = {
    val semi = html.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ('&', i + 1)
    val name = html.substring(i + 1, semi)
    name match {
      case "amp"  => ('&', semi + 1)
      case "lt"   => ('<', semi + 1)
      case "gt"   => ('>', semi + 1)
      case "quot" => ('"', semi + 1)
      case "apos" => ('\'', semi + 1)
      case "nbsp" => (' ', semi + 1)
      case _ if name.startsWith("#") =>
        val cp =
          try {
            if (name.length > 1 && (name.charAt(1) == 'x' || name.charAt(1) == 'X'))
              Integer.parseInt(name.substring(2), 16)
            else Integer.parseInt(name.substring(1))
          } catch { case _: NumberFormatException => -1 }
        if (cp >= 0 && cp <= 0xffff && !Character.isSurrogate(cp.toChar))
          (cp.toChar, semi + 1)
        else ('&', i + 1)
      case _ => ('&', i + 1)
    }
  }

  /** Keep content blocks (enough chars, link density under the cap),
    * join with '\n'. Returns (main text, n_blocks, n_kept, n_chars_kept,
    * n_link_chars_total). */
  def mainText(html: String, maxLinkDensity: Double, minChars: Int)
      : (String, Int, Int, Int, Int) = {
    val bs = blocks(html)
    val kept = bs.filter(b => b.nChars >= minChars && b.linkDensity <= maxLinkDensity)
    (kept.map(_.text).mkString("\n"), bs.length, kept.length,
      kept.map(_.nChars).sum, bs.map(_.nLinkChars).sum)
  }

  // ---- Catalyst expressions ---------------------------------------------

  /** Static kernels referenced from generated code. */
  def stripKernel(html: UTF8String): UTF8String =
    UTF8String.fromString(strip(html.toString))

  def mainKernel(html: UTF8String, maxLd: Double, minChars: Int): InternalRow = {
    val (text, nb, nk, nc, nl) = mainText(html.toString, maxLd, minChars)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(text), nb, nk, nc, nl))
  }

  val MainSchema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_blocks", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_link_chars", IntegerType, nullable = false)))

  /** Column API. */
  def htmlStrip(c: Column): Column =
    GraftBridge.column(HtmlStripExpr(GraftBridge.expression(c)))
  def htmlMainText(c: Column, maxLinkDensity: Double = 0.33,
      minChars: Int = 2): Column =
    GraftBridge.column(
      HtmlMainExpr(GraftBridge.expression(c), maxLinkDensity, minChars))
}

/** `html_strip(html)` — the oracle-replayable markup strip. */
case class HtmlStripExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_strip"

  override def nullSafeEval(input: Any): Any =
    HtmlExtract.stripKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.HtmlExtract.stripKernel($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlStripExpr =
    copy(child = newChild)
}

/** `html_main_text(html)` — block extraction with the link-density
  * boilerplate filter; returns struct(text, n_blocks, n_kept, n_chars,
  * n_link_chars). */
case class HtmlMainExpr(child: Expression, maxLinkDensity: Double,
    minChars: Int) extends UnaryExpression {
  override def dataType: DataType = HtmlExtract.MainSchema
  override def prettyName: String = "html_main_text"

  override def nullSafeEval(input: Any): Any =
    HtmlExtract.mainKernel(input.asInstanceOf[UTF8String], maxLinkDensity, minChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.text.HtmlExtract.mainKernel($c, " +
        s"${maxLinkDensity}D, $minChars);")

  override protected def withNewChildInternal(newChild: Expression): HtmlMainExpr =
    copy(child = newChild)
}
