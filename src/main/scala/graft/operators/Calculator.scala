package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.parsing.combinator.RegexParsers
import graft.fields.FieldOps

/** calculator (reference: logprep/processor/calculator/processor.py:37-88,
  * grammar logprep/processor/calculator/fourFn.py:36-64): arithmetic /
  * comparison / logical functions over `${dotted.field}` template
  * expressions.
  *
  * Two compilation paths:
  *  1. **Static template** (the common case): `${ref}`s appear only in
  *     operand position, so the expression parses ONCE at plan time into a
  *     native Catalyst Column tree — codegen'd, no per-row parsing, no
  *     timeout machinery.
  *  2. **Dynamic template**: the reference substitutes field VALUES into
  *     the expression text and re-parses per event
  *     (resolve_template + BNF.parse_string, processor.py:50-57), so a
  *     value can become a function name or hex digits
  *     (`${op}(${v})`, `from_hex(0x${f1})`). When the plan-time parse
  *     fails, we fall back to a per-row interpreter UDF implementing the
  *     same fourFn semantics over doubles — confined to the rare rules
  *     that need it; the hot path stays codegen'd.
  *
  * Grammar: `+ - * / ^`, unary sign, parens, one comparison
  * `> < >= <= == !=` (booleans out), functions sin cos tan exp abs trunc
  * round sgn from_hex multiply hypot all, constants E / PI, numeric
  * literals incl. scientific notation, `${field}` references.
  */
object Calculator {

  /** `${dotted.field}` refs in template order (reference FIELD_PATTERN,
    * field_manager/rule.py:84 — calculator source_fields are derived from
    * the template the same way, calculator/rule.py:174).
    */
  def sources(template: String): Seq[String] =
    """\$\{([^${}]*)\}""".r.findAllMatchIn(template).map(_.group(1)).toSeq.distinct

  // ------------------------------------------------------- plan-time path

  private class P(schema: org.apache.spark.sql.types.StructType) extends RegexParsers {
    private val num = """\d+\.\d+([eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+""".r
    private val fieldRef = """\$\{([^${}]+)\}""".r

    def expr: Parser[Column] = comparison

    def comparison: Parser[Column] =
      addSub ~ opt(("==" | "!=" | ">=" | "<=" | ">" | "<") ~ addSub) ^^ {
        case l ~ None => l
        // comparisons yield booleans, like Python's operator.gt etc.
        case l ~ Some(op ~ r) => op match {
          case "==" => l === r
          case "!=" => l =!= r
          case ">=" => l >= r
          case "<=" => l <= r
          case ">" => l > r
          case "<" => l < r
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
      fromHex | func | const | hexLit | numberLit | fieldAtom | ("(" ~> expr <~ ")")

    // from_hex's argument is a STRING in the reference (int(a, 16)), so a
    // `${ref}` inside it must stay a string column — no double cast
    def fromHex: Parser[Column] =
      ("""(?i)from_hex""".r ~> "(") ~> fromHexArg <~ ")" ^^ { s =>
        conv(regexp_replace(s, "^0[xX]", ""), 16, 10).cast("long")
      }
    def fromHexArg: Parser[Column] =
      (fieldRef ^^ { m =>
        val path = fieldRef.findFirstMatchIn(m).get.group(1)
        FieldOps.getOrNull(schema, path).cast("string")
      }) | ("""0[xX][0-9a-fA-F]+""".r ^^ (s => lit(s)))

    def func: Parser[Column] =
      ("""(?i)(sin|cos|tan|exp|abs|trunc|round|sgn|multiply|hypot|all)""".r <~ "(") ~ rep1sep(expr, ",") <~ ")" ^^ {
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
            case "multiply" => args.reduce(_ * _)
            case "hypot" => sqrt(args.map(x => x * x).reduce(_ + _))
            // Python all(): truthiness over numbers — 0 is falsy
            case "all" => args.map(x => x =!= lit(0)).reduce(_ && _)
          }
      }

    def const: Parser[Column] =
      ("""(?i)PI""".r ^^ (_ => lit(math.Pi))) | ("""(?i)E(?![0-9A-Za-z_])""".r ^^ (_ => lit(math.E)))

    def hexLit: Parser[Column] =
      """0[xX][0-9a-fA-F]+""".r ^^ (s => lit(s))

    def numberLit: Parser[Column] = num ^^ { s =>
      if (s.exists(c => c == '.' || c == 'e' || c == 'E')) lit(s.toDouble) else lit(s.toLong)
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

  // ----------------------------------------------- row-level interpreter

  /** fourFn over doubles for dynamic templates: parses the
    * already-substituted expression text per row. Returns None on parse or
    * arithmetic failure (→ failure tag upstream).
    */
  private object Interp extends RegexParsers {
    private val num = """\d+\.\d+([eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+""".r

    def expr: Parser[Double] = comparison
    def comparison: Parser[Double] =
      addSub ~ opt(("==" | "!=" | ">=" | "<=" | ">" | "<") ~ addSub) ^^ {
        case l ~ None => l
        case l ~ Some(op ~ r) =>
          val b = op match {
            case "==" => l == r; case "!=" => l != r
            case ">=" => l >= r; case "<=" => l <= r
            case ">" => l > r; case "<" => l < r
          }
          if (b) 1.0 else 0.0
      }
    def addSub: Parser[Double] =
      mulDiv ~ rep(("+" | "-") ~ mulDiv) ^^ { case h ~ t =>
        t.foldLeft(h) { case (a, op ~ r) => if (op == "+") a + r else a - r }
      }
    def mulDiv: Parser[Double] =
      power ~ rep(("*" | "/") ~ power) ^^ { case h ~ t =>
        t.foldLeft(h) { case (a, op ~ r) => if (op == "*") a * r else a / r }
      }
    def power: Parser[Double] =
      unary ~ opt("^" ~> power) ^^ { case b ~ e => e.fold(b)(math.pow(b, _)) }
    def unary: Parser[Double] =
      ("-" ~> unary ^^ (-_)) | ("+" ~> unary) | atom
    def atom: Parser[Double] =
      func | const | hexLit | numberLit | ("(" ~> expr <~ ")")
    def func: Parser[Double] =
      ("""(?i)(sin|cos|tan|exp|abs|trunc|round|sgn|from_hex|multiply|hypot|all)""".r <~ "(") ~ rep1sep(expr, ",") <~ ")" ^^ {
        case name ~ args =>
          val a = args.head
          name.toLowerCase match {
            case "sin" => math.sin(a); case "cos" => math.cos(a)
            case "tan" => math.tan(a); case "exp" => math.exp(a)
            case "abs" => math.abs(a); case "trunc" => a.toLong.toDouble
            case "round" =>
              if (args.size > 1) {
                val s = math.pow(10, args(1))
                math.rint(a * s) / s
              } else math.rint(a)
            case "sgn" => math.signum(a)
            // the hex literal atom already decoded 0x…; from_hex is then
            // the identity (reference: int(a, 16) on the string form)
            case "from_hex" => a
            case "multiply" => args.product
            case "hypot" => math.sqrt(args.map(x => x * x).sum)
            case "all" => if (args.forall(_ != 0.0)) 1.0 else 0.0
          }
      }
    def const: Parser[Double] =
      ("""(?i)PI""".r ^^ (_ => math.Pi)) | ("""(?i)E(?![0-9A-Za-z_])""".r ^^ (_ => math.E))
    def hexLit: Parser[Double] =
      """0[xX][0-9a-fA-F]+""".r ^^ (s => java.lang.Long.parseLong(s.drop(2), 16).toDouble)
    def numberLit: Parser[Double] = num ^^ (_.toDouble)

    def eval(s: String): Option[Double] =
      try parseAll(expr, s) match {
        case Success(v, _) if !v.isNaN && !v.isInfinite => Some(v)
        case _ => None
      } catch { case _: Exception => None }
  }

  /** Substitute per-row source values into the template and evaluate —
    * only used for rules whose template doesn't parse statically.
    */
  private def dynamicEval(template: String, refs: Seq[String])(
      values: Seq[String]): Option[Double] = {
    if (values.exists(_ == null)) return None
    val substituted = refs.zip(values).foldLeft(template) { case (acc, (r, v)) =>
      acc.replace("${" + r + "}", v)
    }
    Interp.eval(substituted)
  }

  /** Compile a calc expression to a Column against `schema`. Static
    * templates → native Column tree; dynamic templates → interpreter UDF
    * over the referenced fields.
    */
  def compile(expression: String, schema: org.apache.spark.sql.types.StructType): Column =
    try new P(schema).parseExpr(expression)
    catch {
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.startsWith("calc parse error") =>
        val refs = sources(expression)
        val f = udf((values: Seq[String]) => dynamicEval(expression, refs)(values))
        f(array(refs.map(r => FieldOps.getOrNull(schema, r).cast("string")): _*))
    }

  /** Apply: evaluate `expression` and write the result to `target`. */
  def calculator(df: DataFrame, expression: String, target: String): DataFrame =
    FieldOps.set(df, target, compile(expression, df.schema))
}
