package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lowers a [[FilterAst]] to a single Catalyst `Column` predicate against a
  * concrete schema. This is the Spark-native replacement for the
  * reference's entire rule-match machinery (luqum tree walk + rule trie,
  * logprep/framework/rule_tree/rule_tree.py:218-252): predicates become
  * codegen'd boolean expressions evaluated by Tungsten, and Catalyst's
  * BooleanSimplification / common-subexpression elimination replaces the
  * DNF + shared-prefix-trie optimization wholesale.
  *
  * Missing-key semantics: any leaf over a path the schema does not contain
  * compiles to `lit(false)` (the reference catches KeyDoesNotExistError and
  * returns false, filter_expression.py:39-63); leaves over nullable columns
  * are wrapped `coalesce(pred, false)` so SQL NULL never escapes the leaf.
  */
object FilterCompiler {
  import FilterAst._

  /** Resolve a dotted path against a schema. Returns the Column and its
    * type, or None if the path cannot exist. Supports struct traversal and
    * integer list indices (`a.b.0`).
    */
  /** Split a dotted path with the reference's OBSERVABLE backslash
    * semantics (exercised by its processor corpus): `\.` is a literal dot
    * inside a segment, `\\` a literal backslash, and a backslash before
    * any other character stays literal (`par\ent` is the key `par\ent`) —
    * so event keys containing backslashes round-trip.
    */
  def splitPath(path: String): List[String] = {
    if (!path.contains('\\')) return path.split("\\.", -1).toList
    // Backslash-run semantics reverse-engineered from the reference's own
    // processor corpus (grokker/dissector/calculator escaping cases): a
    // run of k backslashes followed by
    //   '.'        → (k-1)/2 backslashes + a LITERAL dot (no split)
    //   other char → (k+1)/2 backslashes + the char
    //   end        → k/2 backslashes
    // and an unescaped '.' splits segments.
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val buf = new StringBuilder
    var i = 0
    while (i < path.length) {
      path.charAt(i) match {
        case '.' => out += buf.result(); buf.clear(); i += 1
        case '\\' =>
          var k = 0
          while (i < path.length && path.charAt(i) == '\\') { k += 1; i += 1 }
          if (i >= path.length) buf.append("\\" * (k / 2))
          else if (path.charAt(i) == '.') {
            buf.append("\\" * ((k - 1) / 2)).append('.'); i += 1
          } else buf.append("\\" * ((k + 1) / 2))
        case c => buf.append(c); i += 1
      }
    }
    out += buf.result()
    out.toList
  }

  def resolve(schema: StructType, path: String): Option[(Column, DataType)] = {
    val parts = splitPath(path)
    def walk(c: Column, dt: DataType, rest: List[String]): Option[(Column, DataType)] =
      rest match {
        case Nil => Some((c, dt))
        case p :: tail => dt match {
          case st: StructType =>
            st.fields.find(_.name == p).flatMap(f => walk(c.getField(p), f.dataType, tail))
          case ArrayType(et, _) if p.forall(_.isDigit) =>
            walk(element_at(c, p.toInt + 1), et, tail) // 0-based like reference
          case MapType(StringType, vt, _) =>
            walk(element_at(c, lit(p)), vt, tail)
          case _ => None
        }
      }
    parts match {
      case head :: tail =>
        schema.fields.find(_.name == head)
          // backquote: col() PARSES its argument, so a literal name with
          // dots/hyphens must be quoted
          .flatMap(f => walk(col("`" + head.replace("`", "``") + "`"),
            f.dataType, tail))
          .orElse {
            // allow "a.b" to name a literal top-level column with a dot? No —
            // reference paths are strictly dotted. Give up.
            None
          }
      case Nil => None
    }
  }

  /** Translate a Lucene wildcard pattern (`*`/`?`, backslash escapes) to an
    * anchored Java regex (reference: filter_expression.py:218-267).
    */
  def wildcardToRegex(pattern: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\' && i + 1 < pattern.length) {
        sb.append(java.util.regex.Pattern.quote(pattern.charAt(i + 1).toString))
        i += 2
      } else {
        c match {
          case '*' => sb.append(".*")
          case '?' => sb.append(".")
          case o => sb.append(java.util.regex.Pattern.quote(o.toString))
        }
        i += 1
      }
    }
    sb.append("$").toString
  }

  /** Normalize a user regex to full anchoring, preserving inline flags
    * (reference: filter_expression.py:378-411).
    */
  def anchorRegex(p: String): String = {
    val flagRe = """^(\(\?[a-zA-Z]+\))(.*)$""".r
    val (flags, body) = p match {
      case flagRe(f, b) => (f, b)
      case _ => ("", p)
    }
    val b1 = if (body.startsWith("^")) body.drop(1) else body
    val b2 = if (b1.endsWith("$") && !b1.endsWith("\\$")) b1.dropRight(1) else b1
    s"$flags^${pyBraces(b2)}$$"
  }

  /** Python `re` accepts a bare `{` that doesn't open a quantifier as a
    * literal (e.g. the reference's GUID filters: `{.{8}-…}`), and accepts
    * the `{,m}` shorthand; Java's Pattern rejects both. Escape non-quantifier
    * `{`s (outside character classes) and rewrite `{,m}` → `{0,m}`.
    */
  private def pyBraces(p: String): String = {
    val quant = """^\{(\d+(,\d*)?|,\d+)\}""".r
    val sb = new StringBuilder
    var i = 0
    var inClass = false
    while (i < p.length) {
      p(i) match {
        case '\\' if i + 1 < p.length =>
          sb.append(p(i)).append(p(i + 1)); i += 2
        case '[' if !inClass => inClass = true; sb.append('['); i += 1
        case ']' if inClass => inClass = false; sb.append(']'); i += 1
        case '{' if !inClass =>
          quant.findFirstMatchIn(p.substring(i)) match {
            case Some(q) =>
              val content = q.group(1)
              if (content.startsWith(",")) sb.append("{0").append(content).append('}')
              else sb.append(q.matched)
              i += q.matched.length
            case None => sb.append("\\{"); i += 1
          }
        case ch => sb.append(ch); i += 1
      }
    }
    sb.toString
  }

  /** Leaves are NOT coalesce-wrapped: in a WHERE context SQL's
    * null-rejecting semantics already treat a null predicate as false,
    * and a bare `col === lit` / `col >= lit` pushes down to the parquet
    * scan (`PushedFilters`), which `coalesce(...)` would block. The one
    * place null ≠ false changes the result is under negation — `Not`
    * wraps its CHILD in `coalesce(p, false)` so a missing/null field
    * makes the child false and the negation true, exactly the
    * reference's KeyDoesNotExistError-⇒-false behavior.
    */
  private def nullSafe(p: Column): Column = p

  def compile(ast: FilterAst, schema: StructType): Column = ast match {
    case Always(v) => lit(v)
    case Not(c) => !coalesce(compile(c, schema), lit(false))
    case And(cs) => cs.map(compile(_, schema)).reduce(_ && _)
    case Or(cs) => cs.map(compile(_, schema)).reduce(_ || _)

    case StringEq(f, v) => resolve(schema, f) match {
      case Some((c, ArrayType(_, _))) => nullSafe(array_contains(c.cast("array<string>"), v))
      case Some((c, BooleanType)) =>
        // reference stringifies Python bools as True/False; accept both
        // casings — but ONLY for the strings "true"/"false". Any other
        // value ("yes", "garbage") matches nothing, as in the reference;
        // the old `lit(false) === c` form wrongly matched every false row.
        if (v.equalsIgnoreCase("true")) nullSafe(c === lit(true))
        else if (v.equalsIgnoreCase("false")) nullSafe(c === lit(false))
        else lit(false)
      case Some((c, _)) => nullSafe(c.cast("string") === v)
      case None => lit(false)
    }

    case Wildcard(f, p) => resolve(schema, f) match {
      case Some((c, _)) => nullSafe(c.cast("string").rlike(wildcardToRegex(p)))
      case None => lit(false)
    }
    case SigmaWildcard(f, p) => resolve(schema, f) match {
      case Some((c, _)) => nullSafe(c.cast("string").rlike("(?i)" + wildcardToRegex(p)))
      case None => lit(false)
    }

    case IntEq(f, v) => resolve(schema, f) match {
      case Some((c, t)) if numeric(t) => nullSafe(c === lit(v))
      case Some((c, StringType)) => nullSafe(c === lit(v.toString))
      case _ => lit(false)
    }
    case FloatEq(f, v) => resolve(schema, f) match {
      case Some((c, t)) if numeric(t) => nullSafe(c === lit(v))
      case _ => lit(false)
    }

    case IntRange(f, lo, hi, li, hi2) => numRange(schema, f, lo.map(lit), hi.map(lit), li, hi2)
    case FloatRange(f, lo, hi, li, hi2) => numRange(schema, f, lo.map(lit), hi.map(lit), li, hi2)

    case StringRange(f, lo, hi, li, hi2) => resolve(schema, f) match {
      case Some((c0, _)) =>
        val c = c0.cast("string")
        val conds = lo.map(v => if (li) c >= lit(v) else c > lit(v)).toSeq ++
          hi.map(v => if (hi2) c <= lit(v) else c < lit(v)).toSeq
        nullSafe(conds.reduceOption(_ && _).getOrElse(lit(true)))
      case None => lit(false)
    }

    case Regex(f, p) => resolve(schema, f) match {
      // array-valued field: any element matching counts (same contract as
      // StringEq's array_contains)
      case Some((c, ArrayType(_, _))) =>
        nullSafe(exists(c.cast("array<string>"), e => e.rlike(anchorRegex(p))))
      case Some((c, _)) => nullSafe(c.cast("string").rlike(anchorRegex(p)))
      case None => lit(false)
    }

    case Exists(f) => resolve(schema, f) match {
      // Static schema: the path exists structurally; "exists" per the
      // reference means the key is present. With a declared schema, a
      // non-null value (or any parent struct present) is the closest
      // faithful semantic; parquet null ⇔ key absent for our flat tables.
      // A NullType column is the one case where the schema PROVES the key
      // was present with a JSON null — exists is true there.
      case Some((_, NullType)) => lit(true)
      case Some((c, _)) => c.isNotNull
      case None => lit(false)
    }

    case IsNull(f) => resolve(schema, f) match {
      case Some((_, NullType)) => lit(true)
      case Some((c, _)) => c.isNull
      case None => lit(false)
    }
  }

  private def numeric(t: DataType): Boolean = t match {
    case _: NumericType => true
    case _ => false
  }

  /** Numeric ranges apply only to numeric-typed values — the reference's
    * IntegerRangeFilterExpression requires `isinstance(value, int)` and
    * explicitly excludes bools (filter_expression.py:338-347); a string or
    * boolean field never matches a numeric range.
    */
  private def numRange(schema: StructType, f: String, lo: Option[Column],
                       hi: Option[Column], loIncl: Boolean, hiIncl: Boolean): Column =
    resolve(schema, f) match {
      case Some((c, t)) if numeric(t) =>
        val conds = lo.map(v => if (loIncl) c >= v else c > v).toSeq ++
          hi.map(v => if (hiIncl) c <= v else c < v).toSeq
        nullSafe(conds.reduceOption(_ && _).getOrElse(lit(true)))
      case _ => lit(false)
    }

  /** One-call convenience: parse + compile. */
  def predicate(filterString: String, schema: StructType): Column =
    compile(LuceneParser.parseOrThrow(filterString), schema)
}
