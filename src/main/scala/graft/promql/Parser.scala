package graft.promql

/** AST + recursive-descent parser for the PromQL front door (SURVEY §2
  * TSDB tier; VERDICT r9/r10 missing #1). This is the LAST MILE over the
  * range-vector machinery that already exists in operators/TimeSeries and
  * operators/Promql: the parser turns Prometheus query text into an AST,
  * and [[Compiler]] lowers the AST onto the same hourly-grid DataFrame
  * plans those operators run — so a Prometheus-shaped user can type
  * `sum by (type) (rate(events{type!="view"}[6h]))` instead of composing
  * DataFrames by hand.
  *
  * Supported subset (the shapes the operator tier implements; anything
  * else fails loudly at parse time):
  *   - instant selectors  m / m{l="v", l!="v", l=~"re", l!~"re"}
  *   - range selectors    m{...}[Nh] / [Nd]  (whole hours only)
  *   - subqueries         expr[Nh:1h]        (step pinned to the 1h grid)
  *   - range functions    rate increase irate delta idelta resets changes
  *                        avg/min/max/sum/count/last/quantile_over_time
  *                        present_over_time holt_winters
  *                        deriv predict_linear stddev/stdvar_over_time
  *   - instant functions  histogram_quantile topk bottomk abs ceil floor
  *                        sgn exp ln log2 log10 sqrt clamp clamp_min
  *                        clamp_max round absent absent_over_time
  *                        label_replace label_join count_values sort
  *                        sort_desc scalar vector time timestamp
  *                        day_of_week day_of_month hour month year
  *   - aggregations       sum avg min max count stddev stdvar group
  *                        quantile(φ, …) [by (…)|without (…)] (expr)
  *   - binary arithmetic  + - * / with scalars or vectors,
  *                        on(l1,…) / ignoring(l1,…) matching modifiers,
  *                        one-to-many via group_left/group_right with an
  *                        optional include-label list (arithmetic only —
  *                        set ops reject grouping, as upstream)
  *   - comparisons        > < >= <= == != (filter form; `bool` maps 1/0);
  *                        vector ∘ vector with on()/ignoring() and
  *                        group_left (lhs = many; the threshold-table
  *                        shape) — group_right rejected, results carry
  *                        the lhs side as upstream
  *   - set operations     and / unless / or with matching modifiers
  *   - offset             selector-level `offset Nh/Nd/Nw`
  *   - @ modifier         selector-level `@ <unix-seconds>` / `@ start()`
  *                        / `@ end()` pinning the evaluation to one grid
  *                        hour (whole hours inside the 30-day grid;
  *                        start/end resolve to the grid endpoints)
  *
  * The grammar is the PromQL reference grammar cut to this subset;
  * precedence: unary minus, * / %, + -, comparisons, and/unless, or.
  */
sealed trait Expr
final case class NumLit(v: Double) extends Expr
final case class StrLit(s: String) extends Expr
final case class Matcher(label: String, op: String, value: String)
final case class Selector(metric: String, matchers: Seq[Matcher],
    offsetHours: Int = 0, atUnixSec: Option[Long] = None) extends Expr
final case class RangeSel(sel: Selector, hours: Int) extends Expr
final case class Subquery(inner: Expr, hours: Int) extends Expr
final case class FnCall(name: String, args: Seq[Expr]) extends Expr
final case class AggOp(op: String, by: Seq[String], e: Expr,
    param: Option[Double] = None) extends Expr
/** on()/ignoring() matching, optionally with a one-to-many grouping
  * modifier: `group` is Some("left"|"right") naming the MANY side, and
  * `include` the extra labels copied over from the one side (the
  * group_left(l1,…) list). */
final case class VectorMatch(on: Boolean, labels: Seq[String],
    group: Option[String] = None, include: Seq[String] = Nil)
final case class BinOp(op: String, lhs: Expr, rhs: Expr,
    matching: Option[VectorMatch]) extends Expr
final case class Cmp(op: String, bool: Boolean, lhs: Expr, rhs: Expr,
    matching: Option[VectorMatch] = None) extends Expr
final case class SetOp(op: String, lhs: Expr, rhs: Expr,
    matching: Option[VectorMatch]) extends Expr
final case class AggWithout(op: String, without: Seq[String], e: Expr,
    param: Option[Double] = None) extends Expr

final class ParseException(msg: String) extends IllegalArgumentException(msg)

object Parser {

  private sealed trait Tok
  private case class TIdent(s: String) extends Tok
  private case class TNum(v: Double) extends Tok
  private case class TDur(hours: Int) extends Tok
  private case class TStr(s: String) extends Tok
  private case class TOp(s: String) extends Tok // punctuation + operators
  private case object TEnd extends Tok

  private val rangeFns = Set("rate", "increase", "irate", "delta", "idelta",
    "resets", "changes", "avg_over_time", "min_over_time", "max_over_time",
    "sum_over_time", "count_over_time", "last_over_time", "quantile_over_time",
    "present_over_time", "holt_winters",
    "deriv", "predict_linear", "stddev_over_time", "stdvar_over_time")
  private val aggOps = Set("sum", "avg", "min", "max", "count",
    "stddev", "stdvar", "group", "quantile")

  def parse(q: String): Expr = {
    val p = new P(lex(q))
    val e = p.expr()
    p.expect(TEnd)
    e
  }

  // ---- lexer ---------------------------------------------------------------

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val j = q.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_'), i)
        val end = if (j < 0) n else j
        out += TIdent(q.substring(i, end)); i = end
      } else if (c.isDigit || (c == '.' && i + 1 < n && q(i + 1).isDigit)) {
        val j = q.indexWhere(ch => !(ch.isDigit || ch == '.'), i)
        val end = if (j < 0) n else j
        val num = q.substring(i, end)
        // duration suffix: 6h / 2d / 1w (whole hours only — the eval grid)
        if (end < n && "hdw".contains(q(end)) &&
            (end + 1 >= n || !q(end + 1).isLetterOrDigit)) {
          val mult = q(end) match { case 'h' => 1; case 'd' => 24; case 'w' => 168 }
          if (num.contains('.')) throw new ParseException(s"fractional duration: $num${q(end)}")
          out += TDur(num.toInt * mult); i = end + 1
        } else { out += TNum(num.toDouble); i = end }
      } else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && q(i) != '"') {
          if (q(i) == '\\' && i + 1 < n) { sb += q(i + 1); i += 2 }
          else { sb += q(i); i += 1 }
        }
        if (i >= n) throw new ParseException("unterminated string")
        out += TStr(sb.toString); i += 1
      } else {
        val two = if (i + 1 < n) q.substring(i, i + 2) else ""
        if (Set("!=", "=~", "!~", ">=", "<=", "==").contains(two)) { out += TOp(two); i += 2 }
        else if ("{}[]():,+-*/%=<>@".contains(c)) { out += TOp(c.toString); i += 1 }
        else throw new ParseException(s"unexpected character '$c' at $i")
      }
    }
    out += TEnd
    out.result()
  }

  // ---- parser --------------------------------------------------------------

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    def expect(t: Tok): Unit =
      if (next() != t) throw new ParseException(s"expected $t, got ${toks(pos - 1)}")
    private def expectOp(s: String): Unit = expect(TOp(s))

    // PromQL precedence: * / % over + - over comparisons over
    // and/unless over or
    def expr(): Expr = {
      var l = andExpr()
      while (peek == TIdent("or")) {
        next()
        val m = setMatching("or")
        l = SetOp("or", l, andExpr(), m)
      }
      maybeSubquery(l)
    }

    private def andExpr(): Expr = {
      var l = cmpExpr()
      while (peek == TIdent("and") || peek == TIdent("unless")) {
        val op = next().asInstanceOf[TIdent].s
        val m = setMatching(op)
        l = SetOp(op, l, cmpExpr(), m)
      }
      l
    }

    /** Set operations take on()/ignoring() but never a grouping modifier
      * (upstream rejects group_left/right on and/unless/or too). */
    private def setMatching(op: String): Option[VectorMatch] = {
      val m = matching()
      m.foreach(vm => if (vm.group.nonEmpty)
        throw new ParseException(s"grouping modifiers cannot be used with $op"))
      m
    }

    private val cmpOps = Set(">", "<", ">=", "<=", "==", "!=")
    private def cmpExpr(): Expr = {
      var l = addExpr()
      while (peek match { case TOp(o) => cmpOps.contains(o); case _ => false }) {
        val op = next().asInstanceOf[TOp].s
        val bool = peek == TIdent("bool")
        if (bool) next()
        val m = matching() // vector-vector comparisons take on()/ignoring()
        m.foreach(vm => if (vm.group.contains("right"))
          throw new ParseException(
            "group_right on a comparison is out of subset (filter results carry the lhs/many side)"))
        l = Cmp(op, bool, l, addExpr(), m)
      }
      l
    }

    private def addExpr(): Expr = {
      var l = term()
      while (peek == TOp("+") || peek == TOp("-")) {
        val op = next().asInstanceOf[TOp].s
        val m = matching()
        l = BinOp(op, l, term(), m)
      }
      maybeSubquery(l)
    }

    private def term(): Expr = {
      var l = unary()
      while (peek == TOp("*") || peek == TOp("/") || peek == TOp("%")) {
        val op = next().asInstanceOf[TOp].s
        val m = matching()
        l = BinOp(op, l, unary(), m)
      }
      l
    }

    private def matching(): Option[VectorMatch] = peek match {
      case TIdent("on") | TIdent("ignoring") =>
        val on = next() == TIdent("on")
        val ls = labelList()
        peek match {
          case TIdent(g @ ("group_left" | "group_right")) =>
            next()
            // upstream grammar: a '(' directly after group_left/right IS
            // the include-label list (the classic PromQL gotcha — a
            // parenthesized rhs needs `group_left() (expr)`)
            val inc = if (peek == TOp("(")) labelList() else Nil
            Some(VectorMatch(on, ls, Some(g.stripPrefix("group_")), inc))
          case _ => Some(VectorMatch(on, ls))
        }
      case _ => None
    }

    private def labelList(): Seq[String] = {
      expectOp("(")
      val ls = Seq.newBuilder[String]
      var first = true
      while (peek != TOp(")")) {
        if (!first) expectOp(",")
        first = false
        next() match {
          case TIdent(l) => ls += l
          case t => throw new ParseException(s"expected label, got $t")
        }
      }
      expectOp(")")
      ls.result()
    }

    private def unary(): Expr = peek match {
      case TOp("-") => next(); BinOp("*", NumLit(-1), atom(), None)
      case _ => atom()
    }

    private def atom(): Expr = next() match {
      case TNum(v) => NumLit(v)
      case TStr(v) => StrLit(v)
      case TOp("(") =>
        val e = expr(); expectOp(")"); maybeSubquery(e)
      case TIdent(id) if aggOps.contains(id) && peek != TOp("{") &&
          peek != TOp("[") && (peek == TOp("(") || peek == TIdent("by") ||
            peek == TIdent("without")) =>
        val (by, without) = peek match {
          case TIdent("by") => next(); (labelList(), Seq.empty[String])
          case TIdent("without") => next(); (Seq.empty[String], labelList())
          case _ => (Nil, Nil)
        }
        expectOp("(")
        // quantile is the one parameterized aggregator: quantile(phi, expr)
        val param =
          if (id == "quantile") {
            val phi = next() match {
              case TNum(v) => v
              case t => throw new ParseException(s"quantile needs a numeric phi, got $t")
            }
            // ADVICE r12: out-of-range phi otherwise surfaces as a deep
            // Spark analysis error; upstream's ±Inf-with-warning behavior
            // is out of subset — fail loudly at parse time instead
            if (phi < 0 || phi > 1)
              throw new ParseException(s"quantile phi must be in [0, 1], got $phi")
            expectOp(",")
            Some(phi)
          } else None
        val e = expr()
        expectOp(")")
        maybeSubquery(
          if (without.nonEmpty) AggWithout(id, without, e, param)
          else AggOp(id, by, e, param))
      case TIdent(id) if peek == TOp("(") =>
        next() // "("
        val args = Seq.newBuilder[Expr]
        var first = true
        while (peek != TOp(")")) {
          if (!first) expectOp(",")
          first = false
          args += expr()
        }
        expectOp(")")
        val call = FnCall(id, args.result())
        if (rangeFns.contains(id) && !call.args.exists(a =>
            a.isInstanceOf[RangeSel] || a.isInstanceOf[Subquery]))
          throw new ParseException(s"$id needs a range-vector argument (m[Nh])")
        maybeSubquery(call)
      case TIdent(metric) =>
        val ms = if (peek == TOp("{")) {
          next()
          val b = Seq.newBuilder[Matcher]
          var first = true
          while (peek != TOp("}")) {
            if (!first) expectOp(",")
            first = false
            val l = next() match {
              case TIdent(x) => x
              case t => throw new ParseException(s"expected label, got $t")
            }
            val op = next() match {
              case TOp(o) if Set("=", "!=", "=~", "!~").contains(o) => o
              case t => throw new ParseException(s"expected matcher op, got $t")
            }
            val v = next() match {
              case TStr(x) => x
              case t => throw new ParseException(s"expected string, got $t")
            }
            b += Matcher(l, op, v)
          }
          expectOp("}")
          b.result()
        } else Nil
        val sel0 = Selector(metric, ms)
        var ranged = if (peek == TOp("[")) rangeSuffix(sel0) else sel0
        // offset / @ suffixes, either order (upstream allows both)
        def mapSel(e: Expr)(f: Selector => Selector): Expr = e match {
          case s: Selector => f(s)
          case RangeSel(s, h) => RangeSel(f(s), h)
          case Subquery(s: Selector, h) => Subquery(f(s), h)
          case other => other
        }
        var more = true
        while (more) peek match {
          case TIdent("offset") =>
            next()
            val off = next() match {
              case TDur(h) => h
              case t => throw new ParseException(s"expected duration after offset, got $t")
            }
            ranged = mapSel(ranged)(_.copy(offsetHours = off))
          case TOp("@") =>
            next()
            // start()/end() resolve against the fixed 30-day eval grid
            // (the compiler's 720-hour window) — upstream's query-range
            // endpoints, which on this grid ARE constants
            val at = next() match {
              case TNum(v) if v == v.floor && v >= 0 => v.toLong
              case TIdent(e @ ("start" | "end")) =>
                expectOp("("); expectOp(")")
                if (e == "start") 1704067200L else 1704067200L + 719L * 3600L
              case t => throw new ParseException(
                s"expected a whole unix-seconds timestamp or start()/end() after @, got $t")
            }
            ranged = mapSel(ranged)(_.copy(atUnixSec = Some(at)))
          case _ => more = false
        }
        ranged
      case t => throw new ParseException(s"unexpected token $t")
    }

    /** `sel[Nh]` (plain range) or `sel[Nh:1h]` (selector subquery). */
    private def rangeSuffix(sel: Selector): Expr = {
      expectOp("[")
      val d = next() match {
        case TDur(h) => h
        case t => throw new ParseException(s"expected duration, got $t")
      }
      next() match {
        case TOp("]") => RangeSel(sel, d)
        case TOp(":") =>
          next() match {
            case TDur(1) => ()
            case t => throw new ParseException(s"subquery step must be 1h (the eval grid), got $t")
          }
          expectOp("]")
          Subquery(sel, d)
        case t => throw new ParseException(s"expected ] or :, got $t")
      }
    }

    /** `expr[Nh:1h]` — the subquery form; step MUST be the 1h grid. */
    private def maybeSubquery(e: Expr): Expr =
      if (peek == TOp("[") && !e.isInstanceOf[Selector]) {
        next()
        val d = next() match {
          case TDur(h) => h
          case t => throw new ParseException(s"expected duration, got $t")
        }
        expectOp(":")
        next() match {
          case TDur(1) => ()
          case t => throw new ParseException(s"subquery step must be 1h (the eval grid), got $t")
        }
        expectOp("]")
        Subquery(e, d)
      } else e
  }
}
