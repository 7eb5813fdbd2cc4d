package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt crawl-policy filtering (RFC 9309) — the step a compliant
  * crawl pipeline runs BEFORE any content enters the corpus: drop URLs
  * the origin's robots policy disallows for our agent.
  *
  * Parser (from the RFC 9309 grammar): groups of `User-agent` lines
  * followed by `Allow`/`Disallow` rules; `#` comments; empty
  * `Disallow:` means no restriction; group selection picks the group
  * whose agent token exactly matches the product token, else the `*`
  * group. Rule matching is longest-match-wins on octet length of the
  * rule path, `Allow` winning exact ties (§2.2.2); `*` wildcards and
  * the `$` end anchor are supported by compiling rules to SQL LIKE
  * patterns (`*`→`%`, non-anchored rules get a trailing `%`), so
  * matching runs as a codegen'd LIKE, not a per-row regex interpreter.
  *
  * Scale shape: robots rules are metadata (≤ a few k rules per domain ×
  * crawl domain count) — the rules table BROADCASTS; the corpus-sized
  * URL table streams through one broadcast join + one (doc)-keyed
  * aggregate whose tie-break is encoded in a single integer
  * (`rule_len·2 + allow` — longer rule dominates, allow wins ties), so
  * the argmax is an exact `max()` with full map-side combine.
  */
object Robots {

  final case class Rule(agent: String, path: String, allow: Boolean)

  /** Parse one robots.txt body into per-agent rules. */
  def parse(body: String): Seq[Rule] = {
    val rules = Seq.newBuilder[Rule]
    var agents: List[String] = Nil
    var inGroup = false // false while collecting consecutive UA lines
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (inGroup) { agents = Nil; inGroup = false } // new group
            agents = value.toLowerCase :: agents
          case "allow" | "disallow" =>
            inGroup = true
            if (value.nonEmpty) // empty Disallow = no restriction
              agents.foreach(a => rules += Rule(a, value, field == "allow"))
          case _ => () // crawl-delay, sitemap, unknown fields: ignored
        }
      }
    }
    rules.result()
  }

  /** RFC group selection: the exact agent's rules if any group names it,
    * else the `*` group. */
  def resolveAgent(rules: Seq[Rule], agent: String): Seq[Rule] = {
    val a = agent.toLowerCase
    val exact = rules.filter(_.agent == a)
    if (exact.nonEmpty) exact else rules.filter(_.agent == "*")
  }

  /** Compile a robots rule path to a SQL LIKE pattern: `*`→`%`, `$`
    * anchors the end (otherwise a trailing `%` makes it a prefix).
    * Literal `%`/`_` are escaped with `\` (Spark's default LIKE escape). */
  def toLikePattern(rulePath: String): String = {
    val anchored = rulePath.endsWith("$")
    val p = (if (anchored) rulePath.dropRight(1) else rulePath)
      .replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
      .replace("*", "%")
    if (anchored) p else p + "%"
  }

  /** Specificity = octet length of the rule path, `$` excluded (RFC
    * §2.2.2 measures the path expression itself). */
  def ruleLen(rulePath: String): Int =
    if (rulePath.endsWith("$")) rulePath.length - 1 else rulePath.length

  /** Parse per-domain robots bodies and resolve for `agent`:
    * (domain, pattern, rule_len, allow) — the broadcastable policy
    * table [[filterUrls]] consumes. */
  def rulesTable(
      spark: SparkSession,
      robots: Seq[(String, String)],
      agent: String): DataFrame = {
    import spark.implicits._
    robots.flatMap { case (domain, body) =>
      resolveAgent(parse(body), agent).map(r =>
        (domain, toLikePattern(r.path), ruleLen(r.path), if (r.allow) 1 else 0))
    }.toDF("domain", "pattern", "rule_len", "allow")
  }

  /** Apply a rules table to a corpus-scale `(doc_id, url)` frame:
    * returns (doc_id, url, domain, path, best_len, allowed) — allowed=1
    * when no rule matches or the winning (longest, allow-on-tie) rule
    * is an Allow. */
  def filterUrls(urls: DataFrame, rules: DataFrame): DataFrame = {
    val u = urls
      .withColumn("domain", regexp_extract(col("url"), "^https?://([^/]+)", 1))
      .withColumn("path",
        when(regexp_extract(col("url"), "^https?://[^/]+([^?#]*)", 1) === "",
          lit("/"))
          .otherwise(regexp_extract(col("url"), "^https?://[^/]+([^?#]*)", 1)))
    u.join(broadcast(rules), Seq("domain"), "left")
      .withColumn("score", // longer rule dominates; allow wins exact ties
        when(col("pattern").isNotNull && expr("path LIKE pattern"),
          col("rule_len") * 2 + col("allow")))
      .groupBy("doc_id", "url", "domain", "path")
      .agg(max("score").as("_best"))
      .select(col("doc_id"), col("url"), col("domain"), col("path"),
        coalesce(floor(col("_best") / 2), lit(-1L)).as("best_len"),
        coalesce(pmod(col("_best"), lit(2)).cast("int"), lit(1)).as("allowed"))
  }
}
