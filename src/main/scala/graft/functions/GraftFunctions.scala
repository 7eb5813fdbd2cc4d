package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of the engine's custom Catalyst expressions as SQL
  * functions — the `SparkSessionExtensions` path of the build brief, so
  * `spark.sql("SELECT portable_hash(text) ...")` works without the Scala
  * Column API:
  *
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *
  * or [[GraftFunctions.register]] on an existing session. */
object GraftFunctions {

  private def fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "portable_hash" -> { exprs =>
      require(exprs.length == 1, "portable_hash(str)")
      PortableHashExpr(exprs.head)
    },
    "shingles" -> { exprs =>
      require(exprs.length == 2, "shingles(text, n)")
      val n = exprs(1).eval(null).asInstanceOf[Number].intValue()
      ShingleGenerator(exprs.head, n)
    },
    "dot_product" -> { exprs =>
      require(exprs.length == 2, "dot_product(array<double>, array<double>)")
      DotProductExpr(exprs.head, exprs(1))
    },
    "ac_scan" -> { exprs =>
      require(exprs.length == 2, "ac_scan(text, 'pat1,pat2,...')")
      val pats = exprs(1).eval(null)
        .asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toString.split(',').toSeq.filter(_.nonEmpty)
      AhoCorasickExpr(exprs.head, AcAutomaton(pats))
    },
    "html_strip" -> { exprs =>
      require(exprs.length == 1, "html_strip(html)")
      graft.text.HtmlStripExpr(exprs.head)
    },
    "html_main_text" -> { exprs =>
      require(exprs.length == 1 || exprs.length == 3,
        "html_main_text(html[, max_link_density, min_chars])")
      if (exprs.length == 1)
        graft.text.HtmlMainExpr(exprs.head, 0.33, 2)
      else
        graft.text.HtmlMainExpr(exprs.head,
          exprs(1).eval(null).asInstanceOf[Number].doubleValue(),
          exprs(2).eval(null).asInstanceOf[Number].intValue())
    })

  /** Register on a live session (test/REPL convenience). */
  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }

  /** Inject via SparkSessionExtensions (for spark.sql.extensions). */
  def inject(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}

/** Entry point for `spark.sql.extensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
