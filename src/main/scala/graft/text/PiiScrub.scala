package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M24 — PII scrubbing for training-data pipelines: replace emails,
  * IPv4 addresses and international phone numbers with typed
  * placeholders and count what was removed per document.
  *
  * Not in the reference (emiproc has no text surface); standard
  * pre-training hygiene alongside dedup/decontamination. Engine form:
  * a fixed chain of `regexp_replace`/`regexp_count` column expressions —
  * narrow, codegen'd, zero shuffles, linear in corpus size, so the pass
  * scales to 100 TB exactly like the M6 normalization chain.
  *
  * The regexes deliberately stay inside the RE2-compatible subset (no
  * lookaround, no backrefs, ASCII classes) so an external SQL engine
  * can mirror the pass verbatim — the gate oracle runs them in DuckDB.
  *
  * Replacement ORDER is part of the contract: emails first (an email
  * local part may contain `+digits`, which the phone pattern would
  * otherwise eat), then IPv4 (dotted digits would otherwise be split by
  * the phone pattern), then phones.
  */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{9,15}"

  /** The ordered (pattern, placeholder) chain. */
  val Rules: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>", Ipv4Re -> "<IP>", PhoneRe -> "<PHONE>")

  /** Scrubbed text column: the ordered replace chain over `text`. */
  def scrubbed(text: Column): Column =
    Rules.foldLeft(text) { case (c, (re, ph)) => regexp_replace(c, re, ph) }

  /** Per-type match-count columns, evaluated BEFORE any replacement on
    * the intermediate state the rule actually sees (email counts on raw
    * text, ip counts after email removal, …) so counts sum to the number
    * of placeholders inserted. The afterEmail/afterIp chains are
    * re-derived per count column on purpose: they are pure expressions,
    * so Catalyst fuses every count into the SAME single codegen'd
    * projection (PlanSpec asserts one Project, one stage) — threading
    * materialized intermediate columns through would add nothing. */
  def counts(text: Column): Seq[(String, Column)] = {
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    Seq(
      "n_emails" -> regexp_count(text, lit(EmailRe)),
      "n_ips" -> regexp_count(afterEmail, lit(Ipv4Re)),
      "n_phones" -> regexp_count(afterIp, lit(PhoneRe)))
  }

  /** Scrub `textCol` on `docs`: adds `clean` plus the per-type counts.
    * One narrow projection — no shuffle, no UDF. */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    counts(t).foldLeft(docs.withColumn("clean", scrubbed(t))) {
      case (df, (n, c)) => df.withColumn(n, c)
    }
  }
}
