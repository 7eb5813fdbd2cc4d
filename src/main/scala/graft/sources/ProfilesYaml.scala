package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Temporal-profile YAML reader — reference `from_yaml`
  * (emiproc/profiles/temporal/io.py:211-281). The files are a flat
  * mapping of profile-kind keys to ratio lists:
  *
  * {{{
  * daily: [0.1, 0.2, ...]        # flow list
  * weekly:                       # or block list
  *   - 0.3
  *   - 0.7
  * diurn_monday: [...]           # SpecificDayProfile
  * }}}
  *
  * Key aliases follow the reference exactly (io.py:231-238):
  * diurn/daily/day → hour_of_day; weekly/week → day_of_week;
  * season/year/monthly/month → month; `diurn_<day>` → an hour_of_day
  * profile restricted to that specific day. Ratios must sum to 1
  * (io.py:256-259); a second profile of the same kind raises
  * (io.py:249-253); unknown keys are skipped with a warning
  * (io.py:243-246). The environment ships no YAML library, so this is a
  * minimal parser for exactly the subset the reference writes
  * (`to_yaml`, io.py:284-306: flat dict of scalar lists).
  */
object ProfilesYaml {

  final case class YamlProfile(
      kind: String, specificDay: Option[String], ratios: Seq[Double])

  private val Aliases: Map[String, String] = Map(
    "diurn" -> "hour_of_day", "daily" -> "hour_of_day", "day" -> "hour_of_day",
    "weekly" -> "day_of_week", "week" -> "day_of_week",
    "season" -> "month", "year" -> "month",
    "monthly" -> "month", "month" -> "month")

  private val SpecificDays = Set(
    "monday", "tuesday", "wednesday", "thursday", "friday",
    "saturday", "sunday", "weekday", "weekend")

  private def stripComment(line: String): String = {
    val i = line.indexOf('#')
    if (i < 0) line else line.substring(0, i)
  }

  def parse(text: String): Seq[YamlProfile] = {
    val lines = text.split("\n").toSeq
    val out = scala.collection.mutable.ListBuffer.empty[YamlProfile]
    val seen = scala.collection.mutable.Set.empty[(String, Option[String])]
    var i = 0
    val KeyLine = """^([A-Za-z0-9_]+):\s*(.*)$""".r
    val ItemLine = """^\s*-\s*(\S+)\s*$""".r
    while (i < lines.length) {
      stripComment(lines(i)).trim match {
        case "" => i += 1
        case KeyLine(key, rest) =>
          i += 1
          val ratios: Seq[Double] =
            if (rest.startsWith("[")) {
              require(rest.endsWith("]"), s"unterminated flow list for $key")
              rest.substring(1, rest.length - 1).split(",")
                .map(_.trim).filter(_.nonEmpty).map(_.toDouble).toSeq
            } else {
              require(rest.isEmpty, s"unsupported value for $key: $rest")
              val items = scala.collection.mutable.ListBuffer.empty[Double]
              var done = false
              while (i < lines.length && !done) {
                stripComment(lines(i)) match {
                  case ItemLine(v) => items += v.toDouble; i += 1
                  case l if l.trim.isEmpty => i += 1
                  case _ => done = true
                }
              }
              items.toSeq
            }
          val (kind, specific) = key.toLowerCase match {
            case k if k.startsWith("diurn_") =>
              val day = k.stripPrefix("diurn_")
              require(SpecificDays.contains(day), s"unknown specific day $day")
              ("hour_of_day", Some(day))
            case k if Aliases.contains(k) => (Aliases(k), None)
            case _ => ("", None) // unknown key: reference warns + skips
          }
          if (kind.nonEmpty) {
            val s = ratios.sum
            require(math.abs(s - 1.0) < 1e-6,
              s"ratios of $key sum to $s, not 1 (io.py:256-259)")
            require(seen.add((kind, specific)),
              s"duplicate profile kind for $key (io.py:249-253)")
            out += YamlProfile(kind, specific, ratios)
          }
        case other =>
          throw new IllegalArgumentException(s"unsupported yaml line: $other")
      }
    }
    out.toSeq
  }

  /** Write profiles back to YAML — the reference's `to_yaml`
    * (io.py:284-306): daily/weekly/monthly keys, `diurn_<day>` for
    * specific days, flow lists. Round-trips with [[parse]]. */
  def write(profiles: Seq[YamlProfile], path: String): Unit = {
    val keyOf: YamlProfile => String = p => (p.kind, p.specificDay) match {
      case ("hour_of_day", Some(d)) => s"diurn_$d"
      case ("hour_of_day", None) => "daily"
      case ("day_of_week", None) => "weekly"
      case ("month", None) => "monthly"
      case other => throw new IllegalArgumentException(s"cannot write $other")
    }
    val text = profiles.map { p =>
      s"${keyOf(p)}: [${p.ratios.mkString(", ")}]"
    }.mkString("", "\n", "\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), text)
  }

  /** Read a profile YAML into long format
    * `(kind, specific_day, pos, ratio)`. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    val rows = parse(text).flatMap { p =>
      p.ratios.zipWithIndex.map { case (r, pos) =>
        (p.kind, p.specificDay.orNull, pos, r)
      }
    }
    spark.createDataFrame(rows).toDF("kind", "specific_day", "pos", "ratio")
  }
}
