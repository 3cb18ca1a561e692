package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.parsing.combinator.RegexParsers
import graft.fields.FieldOps

/** calculator (reference: logprep/processor/calculator/processor.py:37-88,
  * grammar logprep/processor/calculator/fourFn.py): arithmetic/comparison
  * over `${dotted.field}` template expressions.
  *
  * The reference interprets the parsed expression per event (with a 1 s
  * timeout guard). Here the expression string is parsed ONCE at plan time
  * into a native Catalyst arithmetic Column tree — `pow`, `conv(x,16,10)`
  * for from_hex, builtin trig — so evaluation is codegen'd and the timeout
  * machinery is unnecessary. This is the headline "compile, don't
  * interpret" win of the Spark design.
  *
  * Grammar: `+ - * / ^`, unary minus, parens, comparisons
  * `> < >= <= == !=`, functions sin cos tan exp abs trunc round sgn
  * from_hex, constants E / PI, numeric literals, `${field}` references.
  */
object Calculator {

  private class P(schema: org.apache.spark.sql.types.StructType) extends RegexParsers {
    private val num = """\d+\.\d+|\d+""".r
    private val fieldRef = """\$\{([^}]+)\}""".r

    def expr: Parser[Column] = comparison

    def comparison: Parser[Column] =
      addSub ~ opt(("==" | "!=" | ">=" | "<=" | ">" | "<") ~ addSub) ^^ {
        case l ~ None => l
        case l ~ Some(op ~ r) => op match {
          case "==" => (l === r).cast("int")
          case "!=" => (l =!= r).cast("int")
          case ">=" => (l >= r).cast("int")
          case "<=" => (l <= r).cast("int")
          case ">" => (l > r).cast("int")
          case "<" => (l < r).cast("int")
        }
      }

    def addSub: Parser[Column] =
      mulDiv ~ rep(("+" | "-") ~ mulDiv) ^^ { case h ~ t =>
        t.foldLeft(h) { case (acc, op ~ r) =>
          if (op == "+") acc + r else acc - r
        }
      }

    def mulDiv: Parser[Column] =
      power ~ rep(("*" | "/") ~ power) ^^ { case h ~ t =>
        t.foldLeft(h) { case (acc, op ~ r) =>
          if (op == "*") acc * r else acc / r
        }
      }

    // right-associative exponentiation, as in the reference's fourFn grammar
    def power: Parser[Column] =
      unary ~ opt("^" ~> power) ^^ {
        case b ~ None => b
        case b ~ Some(e) => pow(b, e)
      }

    def unary: Parser[Column] =
      ("-" ~> unary ^^ (c => -c)) | ("+" ~> unary) | atom

    def atom: Parser[Column] =
      func | const | hexLit | numberLit | fieldAtom | ("(" ~> expr <~ ")")

    def func: Parser[Column] =
      ("""(?i)(sin|cos|tan|exp|abs|trunc|round|sgn|from_hex)""".r <~ "(") ~ rep1sep(expr, ",") <~ ")" ^^ {
        case name ~ args =>
          val a = args.head
          name.toLowerCase match {
            case "sin" => sin(a)
            case "cos" => cos(a)
            case "tan" => tan(a)
            case "exp" => exp(a)
            case "abs" => abs(a)
            case "trunc" => a.cast("long")
            case "round" =>
              // round's scale must be a plan-time literal int (Spark's round
              // signature requires it; the reference's fourFn also only ever
              // sees literal digits, e.g. round(E, 3)).
              if (args.size > 1) {
                val scale = org.apache.spark.sql.GraftSqlBridge.literalValue(args(1)) match {
                  case Some(v: Long) => v.toInt
                  case Some(v: Int) => v
                  case Some(v: Double) if v == v.toInt => v.toInt
                  case other => throw new IllegalArgumentException(
                    s"round() digits must be a literal integer, got: $other")
                }
                round(a, scale)
              } else round(a, 0)
            case "sgn" => signum(a)
            case "from_hex" =>
              conv(regexp_replace(a.cast("string"), "^0[xX]", ""), 16, 10).cast("long")
          }
      }

    def const: Parser[Column] =
      ("""(?i)PI""".r ^^ (_ => lit(math.Pi))) | ("""(?i)E(?![0-9A-Za-z_])""".r ^^ (_ => lit(math.E)))

    def hexLit: Parser[Column] =
      """0[xX][0-9a-fA-F]+""".r ^^ (s => lit(s))

    def numberLit: Parser[Column] = num ^^ { s =>
      if (s.contains('.')) lit(s.toDouble) else lit(s.toLong)
    }

    def fieldAtom: Parser[Column] = fieldRef ^^ { m =>
      val path = fieldRef.findFirstMatchIn(m).get.group(1)
      FieldOps.getOrNull(schema, path).cast("double")
    }

    def parseExpr(s: String): Column = parseAll(expr, s) match {
      case Success(c, _) => c
      case other => throw new IllegalArgumentException(s"calc parse error: $other")
    }
  }

  /** Compile a calc expression to a Column against `schema`. */
  def compile(expression: String, schema: org.apache.spark.sql.types.StructType): Column =
    new P(schema).parseExpr(expression)

  /** Apply: evaluate `expression` and write the result to `target`. */
  def calculator(df: DataFrame, expression: String, target: String): DataFrame =
    FieldOps.set(df, target, compile(expression, df.schema))
}
