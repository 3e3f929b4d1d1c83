package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F4 clean_title, F5 clean_company_name, F11 parse_last_update, F12
  * posted_time — the Phase-2 text-cleaning family.
  *
  * Semantics mirror the reference *code* (not its drifted tests):
  * /root/reference/src/processing/data_processing.py:72-153 and
  * src/crawler/crawler_utils.py:21-57. Goldens were produced by
  * executing that logic (e.g. 'fpt software' → 'Fpt software' — the
  * reference test's 'FPT Software' expectation does not match its own
  * code, which only capitalizes the first word).
  *
  * clean_title and parse_last_update are native column expressions
  * (codegen'd); clean_company_name is a Scala UDF because its
  * capitalize-per-separator-segment loop is genuinely procedural.
  */
object TextFns {

  // ------------------------------------------------------------ F4 clean_title
  /** First `([\w\s./-]+(?:\s*(?:\/|-)\s*[\w\s./-]*)*)` match, then keep
    * the head of a ' - ' split, trimmed; null → "". (?U) makes Java's
    * \w/\s unicode-aware like Python's.
    */
  def cleanTitle(c: Column): Column = {
    val m = regexp_extract(c, "(?U)([\\w\\s./-]+(?:\\s*(?:/|-)\\s*[\\w\\s./-]*)*)", 1)
    when(c.isNull, lit(""))
      .when(m =!= "", trim(split(trim(m), " - ", -1).getItem(0)))
      .otherwise(trim(c))
  }

  // ------------------------------------------------------------ F5 clean_company_name
  private val U = Pattern.UNICODE_CHARACTER_CLASS | Pattern.UNICODE_CASE
  private val PatSpecial = Pattern.compile("[^\\w\\s()\\[\\]\\-/.,&+#]", U)
  private val PatWs      = Pattern.compile("\\s+")
  private val PatSep     = Pattern.compile("\\s*[-/]\\s*")
  private val RemovePats = Seq(
    "tuyển\\s+dụng", "cần\\s+tuyển", "đang\\s+tuyển", "hot", "gấp", "\\bhr\\b")
    .map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE | U))
  // word.upper() ∈ the reference's mixed-case list — only entries that
  // are already uppercase can ever match (data_processing.py:131-139)
  private val TechUpper = Set(
    "PHP", "AWS", "SQL", "C#", "C++", ".NET", "HTML", "CSS", "JS",
    "UI", "UX", "AI", "ML", "API", "QA", "BA")

  /** Python str.capitalize(): first char upper, rest lower. */
  private def pyCapitalize(w: String): String =
    if (w.isEmpty) w
    else w.substring(0, 1).toUpperCase + w.substring(1).toLowerCase

  /** re.split with a captured separator: [text, sep, text, ..., text]. */
  private def splitKeepSep(s: String, p: Pattern): Vector[String] = {
    val m = p.matcher(s)
    val buf = Vector.newBuilder[String]
    var last = 0
    while (m.find()) {
      buf += s.substring(last, m.start()); buf += m.group(); last = m.end()
    }
    buf += s.substring(last)
    buf.result()
  }

  private[functions] def cleanCompanyNameImpl(in: String): String = {
    if (in == null) return ""
    var t = PatSpecial.matcher(in).replaceAll(" ")
    t = PatWs.matcher(t).replaceAll(" ").trim
    RemovePats.foreach(p => t = p.matcher(t).replaceAll(""))
    val parts = splitKeepSep(t, PatSep)
    val sb = new StringBuilder
    parts.zipWithIndex.foreach { case (part, i) =>
      if (i % 2 == 0) {
        val words = part.split("\\s+").filter(_.nonEmpty)
        val fixed = words.zipWithIndex.map { case (w, j) =>
          if (TechUpper.contains(w.toUpperCase)) w.toUpperCase
          else if (j == 0) pyCapitalize(w)
          else w
        }
        sb.append(fixed.mkString(" "))
      } else sb.append(part)
    }
    PatWs.matcher(sb.result().trim).replaceAll(" ").trim
  }

  val cleanCompanyNameUdf = udf(cleanCompanyNameImpl _)
  def cleanCompanyName(c: Column): Column = cleanCompanyNameUdf(c)

  // ------------------------------------------------------------ F11 parse_last_update
  /** "Cập nhật N tháng/tuần/ngày/giờ/phút/giây trước" → seconds
    * (month = 30 days); unparseable/null → 0.
    */
  def parseLastUpdate(c: Column): Column = {
    val t = trim(regexp_replace(c, "Cập nhật", ""))
    val n = regexp_extract(t, "(\\d+)", 1).cast("long")
    val parsed = when(t.contains("tháng"), n * 2592000L)
      .when(t.contains("tuần"), n * 604800L)
      .when(t.contains("ngày"), n * 86400L)
      .when(t.contains("giờ"), n * 3600L)
      .when(t.contains("phút"), n * 60L)
      .when(t.contains("giây"), n)
      .otherwise(lit(0L))
    when(c.isNull || c === "", 0L).otherwise(coalesce(parsed, lit(0L)))
  }

  // ------------------------------------------------------------ F12 posted_time
  /** posted_time = now − seconds_ago (ref parser.py:370-374); `now` is
    * an explicit parameter for deterministic replays.
    */
  def postedTime(secondsAgo: Column, now: Column): Column =
    (now.cast("timestamp").cast("long") - secondsAgo).cast("timestamp")
}
