package graft.varda

import org.apache.spark.sql.Column

/** The reference's sample-selection expression language
  * (varda/expressions.py [U]): boolean combinations of named sample
  * selectors with AND / OR / NOT / parentheses. Parsed here into a Spark
  * `Column` predicate, so a sample query compiles straight into the
  * frequency aggregation's WHERE clause — no per-sample round trips.
  *
  * Grammar:  expr   := term ('OR' term)*
  *           term   := factor ('AND' factor)*
  *           factor := 'NOT' factor | '(' expr ')' | ident
  */
object ExprLang {

  final case class ParseError(msg: String) extends RuntimeException(msg)

  private final class P(tokens: List[String], tags: Map[String, Column]) {
    private var rest = tokens

    private def peek: Option[String] = rest.headOption
    private def next(): String = rest match {
      case h :: t => rest = t; h
      case Nil    => throw ParseError("unexpected end of expression")
    }

    def expr(): Column = {
      var l = term()
      while (peek.exists(_.equalsIgnoreCase("OR"))) { next(); l = l || term() }
      l
    }

    private def term(): Column = {
      var l = factor()
      while (peek.exists(_.equalsIgnoreCase("AND"))) { next(); l = l && factor() }
      l
    }

    private def factor(): Column = next() match {
      case t if t.equalsIgnoreCase("NOT") => !factor()
      // `*` = all public active samples in the reference's language
      // (varda/expressions.py [U]) — here: no restriction.
      case "*" => org.apache.spark.sql.functions.lit(true)
      case "(" =>
        val e = expr()
        next() match {
          case ")" => e
          case o   => throw ParseError(s"expected ')' but found '$o'")
        }
      case ")" => throw ParseError("unexpected ')'")
      case id =>
        tags.getOrElse(id,
          throw ParseError(s"unknown sample tag '$id' (known: ${tags.keys.toSeq.sorted.mkString(", ")})"))
    }

    def done(): Unit =
      if (rest.nonEmpty) throw ParseError(s"trailing input: ${rest.mkString(" ")}")
  }

  private def tokenize(s: String): List[String] =
    s.replace("(", " ( ").replace(")", " ) ")
      .split("\\s+").filter(_.nonEmpty).toList

  /** Parse `input` into a predicate, resolving identifiers via `tags`. */
  def parse(input: String, tags: Map[String, Column]): Column = {
    val p = new P(tokenize(input), tags)
    val c = p.expr()
    p.done()
    c
  }
}
