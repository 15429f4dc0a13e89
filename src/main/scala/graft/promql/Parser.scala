package graft.promql

/** Hand-written recursive-descent PromQL parser for the subset in SURVEY.md
  * §7.5. Precedence (loosest→tightest), matching Prometheus:
  * or < and/unless < comparison < +,- < *,/,% < ^ < unary < postfix.
  *
  * Reference behavior being reproduced (not its implementation): the
  * simplified AST of /root/reference/promql/parser.go, including rejection
  * of group_left/group_right (parser.go:455-460).
  */
object Parser {
  def parse(input: String): Either[String, Expr] =
    try Right(new Parser(input).parseAll())
    catch { case e: ParseError => Left(e.getMessage) }

  final class ParseError(msg: String) extends RuntimeException(msg)

  def parseDurationMs(s: String): Long = {
    val re = "(\\d+(?:\\.\\d+)?)(ms|s|m|h|d|w|y)".r
    val ms = re.findAllMatchIn(s).map { m =>
      val n = m.group(1).toDouble
      val unit = m.group(2) match {
        case "ms" => 1L
        case "s"  => 1000L
        case "m"  => 60000L
        case "h"  => 3600000L
        case "d"  => 86400000L
        case "w"  => 604800000L
        case "y"  => 31536000000L
      }
      (n * unit).toLong
    }.sum
    if (ms <= 0) throw new ParseError(s"invalid duration: $s")
    ms
  }

  /** Signed duration for the `offset` modifier ONLY — modern PromQL
    * accepts `offset -5m` (look-ahead: the selector reads samples AFTER
    * the evaluation time). Ranges and subquery steps stay strictly
    * positive ([[parseDurationMs]]). Before this existed, the unsigned
    * parser's regex silently SKIPPED a leading '-' and summed the
    * magnitude, so `offset -5m` evaluated as `offset 5m` — confidently
    * wrong numbers with no error (r15 VERDICT What's-wrong #1).
    */
  def parseOffsetMs(s: String): Long = {
    val t = s.trim
    if (t.startsWith("-")) -parseDurationMs(t.substring(1))
    else parseDurationMs(t)
  }
}

private final class Parser(input: String) {
  import Parser.ParseError
  private var pos = 0

  def parseAll(): Expr = {
    val e = parseOr()
    skipWs()
    if (pos < input.length) fail(s"unexpected trailing input at $pos: '${input.substring(pos)}'")
    e
  }

  private def fail(msg: String): Nothing = throw new ParseError(msg)

  private def skipWs(): Unit =
    while (pos < input.length && input(pos).isWhitespace) pos += 1

  private def peekWord(): String = {
    skipWs()
    val start = pos
    var i = pos
    while (i < input.length && (input(i).isLetterOrDigit || input(i) == '_' || input(i) == ':')) i += 1
    input.substring(start, i)
  }

  private def eatWord(w: String): Boolean = {
    skipWs()
    if (input.regionMatches(pos, w, 0, w.length)) {
      val end = pos + w.length
      val boundary = end >= input.length ||
        !(input(end).isLetterOrDigit || input(end) == '_')
      if (boundary) { pos = end; true } else false
    } else false
  }

  private def eat(c: Char): Boolean = {
    skipWs()
    if (pos < input.length && input(pos) == c) { pos += 1; true } else false
  }

  private def expect(c: Char): Unit =
    if (!eat(c)) fail(s"expected '$c' at $pos in '$input'")

  private def peek(): Char = { skipWs(); if (pos < input.length) input(pos) else '\u0000' }

  // ---- precedence chain ----------------------------------------------------

  private def parseOr(): Expr = {
    var l = parseAndUnless()
    while (eatWord("or")) {
      val m = parseMatching()
      l = BinOp("or", l, parseAndUnless(), m)
    }
    l
  }

  private def parseAndUnless(): Expr = {
    var l = parseComparison()
    var continue = true
    while (continue) {
      if (eatWord("and")) { val m = parseMatching(); l = BinOp("and", l, parseComparison(), m) }
      else if (eatWord("unless")) { val m = parseMatching(); l = BinOp("unless", l, parseComparison(), m) }
      else continue = false
    }
    l
  }

  private def parseComparison(): Expr = {
    var l = parseAddSub()
    var continue = true
    while (continue) {
      skipWs()
      val op =
        if (input.regionMatches(pos, "==", 0, 2)) "=="
        else if (input.regionMatches(pos, "!=", 0, 2)) "!="
        else if (input.regionMatches(pos, ">=", 0, 2)) ">="
        else if (input.regionMatches(pos, "<=", 0, 2)) "<="
        else if (pos < input.length && input(pos) == '>') ">"
        else if (pos < input.length && input(pos) == '<') "<"
        else ""
      if (op.nonEmpty) {
        pos += op.length
        val boolMod = eatWord("bool")
        val m = parseMatching()
        l = BinOp(op, l, parseAddSub(), m, boolMod)
      } else continue = false
    }
    l
  }

  private def parseAddSub(): Expr = {
    var l = parseMulDiv()
    var continue = true
    while (continue) {
      skipWs()
      if (pos < input.length && (input(pos) == '+' || input(pos) == '-')) {
        val op = input(pos).toString; pos += 1
        val m = parseMatching()
        l = BinOp(op, l, parseMulDiv(), m)
      } else continue = false
    }
    l
  }

  private def parseMulDiv(): Expr = {
    var l = parsePow()
    var continue = true
    while (continue) {
      skipWs()
      if (pos < input.length && (input(pos) == '*' || input(pos) == '/' || input(pos) == '%')) {
        val op = input(pos).toString; pos += 1
        val m = parseMatching()
        l = BinOp(op, l, parsePow(), m)
      } else if (eatWord("atan2")) {
        // Prometheus's one word-form arithmetic operator (2.31+), same
        // precedence tier as * / %
        val m = parseMatching()
        l = BinOp("atan2", l, parsePow(), m)
      } else continue = false
    }
    l
  }

  private def parsePow(): Expr = {
    val l = parseUnary()
    skipWs()
    if (pos < input.length && input(pos) == '^') {
      pos += 1
      BinOp("^", l, parsePow()) // right-assoc
    } else l
  }

  private def parseUnary(): Expr = {
    skipWs()
    if (pos < input.length && input(pos) == '-') {
      pos += 1
      BinOp("*", NumberLit(-1.0), parseUnary())
    } else if (pos < input.length && input(pos) == '+') {
      pos += 1; parseUnary()
    } else parsePostfix()
  }

  /** on(...)/ignoring(...) after a binary operator, optionally followed by
    * group_left(...)/group_right(...) many-to-one matching (Prometheus
    * requires an explicit on/ignoring before a group modifier)
    */
  private def parseMatching(): Option[VectorMatch] = {
    val m =
      if (eatWord("on")) Some(VectorMatch(on = true, labels = parseLabelList()))
      else if (eatWord("ignoring")) Some(VectorMatch(on = false, labels = parseLabelList()))
      else None
    val gl = eatWord("group_left")
    val gr = !gl && eatWord("group_right")
    if (gl || gr) {
      if (m.isEmpty) fail("group_left/group_right requires on() or ignoring()")
      val inc = { skipWs(); if (pos < input.length && input(pos) == '(') parseLabelList() else Nil }
      Some(m.get.copy(card = if (gl) 1 else 2, include = inc))
    } else m
  }

  private def parseLabelList(): List[String] = {
    expect('(')
    val out = scala.collection.mutable.ListBuffer[String]()
    if (!eat(')')) {
      var continue = true
      while (continue) {
        out += parseIdent()
        if (!eat(',')) { expect(')'); continue = false }
      }
    }
    out.toList
  }

  private def parseIdent(): String = {
    skipWs()
    val start = pos
    if (pos < input.length && (input(pos).isLetter || input(pos) == '_')) {
      pos += 1
      while (pos < input.length && (input(pos).isLetterOrDigit || input(pos) == '_' || input(pos) == ':')) pos += 1
      input.substring(start, pos)
    } else fail(s"expected identifier at $pos in '$input'")
  }

  private def parseString(): String = {
    skipWs()
    if (pos >= input.length || (input(pos) != '"' && input(pos) != '\'' && input(pos) != '`'))
      fail(s"expected string at $pos")
    val quote = input(pos); pos += 1
    val sb = new StringBuilder
    while (pos < input.length && input(pos) != quote) {
      if (input(pos) == '\\' && quote != '`' && pos + 1 < input.length) {
        pos += 1
        sb += (input(pos) match {
          case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
          case c => c
        })
      } else sb += input(pos)
      pos += 1
    }
    if (pos >= input.length) fail("unterminated string")
    pos += 1
    sb.toString
  }

  private def parseNumber(): Double = {
    skipWs()
    val start = pos
    if (pos < input.length && (input(pos) == '-' || input(pos) == '+')) pos += 1
    // PromQL special literals (case-insensitive): Inf / NaN
    if (input.regionMatches(true, pos, "inf", 0, 3) &&
      (pos + 3 >= input.length || !input(pos + 3).isLetterOrDigit)) {
      val neg = input(start) == '-'
      pos += 3
      return if (neg) Double.NegativeInfinity else Double.PositiveInfinity
    }
    if (input.regionMatches(true, pos, "nan", 0, 3) &&
      (pos + 3 >= input.length || !input(pos + 3).isLetterOrDigit)) {
      pos += 3
      return Double.NaN
    }
    while (pos < input.length &&
      (input(pos).isDigit || input(pos) == '.' || input(pos) == 'e' || input(pos) == 'E' ||
        ((input(pos) == '-' || input(pos) == '+') && pos > start &&
          (input(pos - 1) == 'e' || input(pos - 1) == 'E')))) pos += 1
    if (pos == start) fail(s"expected number at $pos")
    val s = input.substring(start, pos)
    // the scan is permissive ("8E", "1.2.3" shapes reach here) — a malformed
    // literal must surface as a ParseError/Left, never an exception
    s.toDoubleOption.getOrElse(fail(s"malformed number '$s' at $start"))
  }

  // ---- postfix / primary ---------------------------------------------------

  private def parsePostfix(): Expr = {
    val e = parsePrimary()
    skipWs()
    // subquery over an expression: [range:step]. A Selector reaching here
    // already consumed any directly-attached range inside parseSelectorTail,
    // so a remaining '[' is a subquery (e.g. the `(m)[5m:1m]` form)
    if (pos < input.length && input(pos) == '[') {
      pos += 1
      val start = pos
      while (pos < input.length && input(pos) != ':' && input(pos) != ']') pos += 1
      val range = Parser.parseDurationMs(input.substring(start, pos))
      if (pos >= input.length || input(pos) != ':')
        fail("expression range requires a subquery step: [range:step]")
      pos += 1
      val s2 = pos
      while (pos < input.length && input(pos) != ']') pos += 1
      val sub = input.substring(s2, pos).trim
      val step = if (sub.isEmpty) 0L else Parser.parseDurationMs(sub)
      expect(']')
      var off = 0L
      if (eatWord("offset")) {
        skipWs()
        val o0 = pos
        while (pos < input.length && !input(pos).isWhitespace && input(pos) != ')' &&
          input(pos) != ',' && input(pos) != '}') pos += 1
        off = Parser.parseOffsetMs(input.substring(o0, pos))
      }
      Subquery(e, range, step, off)
    } else e
  }

  private def parsePrimary(): Expr = {
    skipWs()
    if (pos >= input.length) fail("unexpected end of input")
    val c = input(pos)
    if (c == '(') {
      pos += 1
      val e = parseOr()
      expect(')')
      e
    } else if (c.isDigit || ((c == '-' || c == '+' || c == '.') && pos + 1 < input.length && (input(pos + 1).isDigit || input(pos + 1) == '.'))) {
      NumberLit(parseNumber())
    } else if (c == '{') {
      // bare matcher set (no metric name)
      parseSelectorTail("")
    } else {
      val word = parseIdent()
      skipWs()
      if (pos < input.length && input(pos) == '(') parseCall(word)
      // bare Inf/NaN in expression position are number literals, like the
      // Prometheus lexer (a metric cannot be named inf/nan there either)
      else if (word.equalsIgnoreCase("inf")) NumberLit(Double.PositiveInfinity)
      else if (word.equalsIgnoreCase("nan")) NumberLit(Double.NaN)
      else parseSelectorTail(word)
    }
  }

  private def parseCall(fn: String): Expr = {
    expect('(')
    fn match {
      case f if Ast.rangeFns.contains(f) =>
        val arg = parseOr()
        expect(')')
        RangeFn(f, arg)
      case f if Ast.unaryFns.contains(f) =>
        val arg = parseOr()
        expect(')')
        UnaryFn(f, arg)
      case "clamp_min" | "clamp_max" =>
        val arg = parseOr()
        expect(',')
        val k = parseNumber()
        expect(')')
        Clamp(fn == "clamp_min", arg, k)
      case "clamp" =>
        val arg = parseOr()
        expect(','); val lo = parseNumber()
        expect(','); val hi = parseNumber()
        expect(')')
        ClampRange(arg, lo, hi)
      case "pi" =>
        expect(')')
        NumberLit(math.Pi)
      case "double_exponential_smoothing" | "holt_winters" =>
        val arg = parseOr()
        expect(','); val sf = parseNumber()
        expect(','); val tf = parseNumber()
        expect(')')
        arg match {
          case s: Selector if s.rangeMs > 0 => DoubleExpSmoothing(s, sf, tf)
          case _ => fail(s"$fn requires a range selector")
        }
      case "scalar" =>
        val arg = parseOr()
        expect(')')
        ScalarFn(arg)
      case "vector" =>
        val v = parseNumber()
        expect(')')
        NumberLit(v)
      case "histogram_quantile" =>
        val q = parseNumber()
        expect(',')
        val arg = parseOr()
        expect(')')
        HistogramQuantile(q, arg)
      case "histogram_avg" | "histogram_sum" | "histogram_count" |
           "histogram_stddev" | "histogram_stdvar" =>
        val arg = parseOr()
        expect(')')
        arg match {
          case s: Selector => SketchFn(fn, s)
          case other => fail(s"$fn requires a selector argument, got $other")
        }
      case "histogram_fraction" =>
        val lo = parseNumber()
        expect(',')
        val hi = parseNumber()
        expect(',')
        val arg = parseOr()
        expect(')')
        arg match {
          case s: Selector => SketchFn(fn, s, lo, hi)
          case other => fail(s"$fn requires a selector argument, got $other")
        }
      case "label_replace" =>
        val arg = parseOr()
        expect(','); val dst = parseString()
        expect(','); val repl = parseString()
        expect(','); val src = parseString()
        expect(','); val regex = parseString()
        expect(')')
        LabelReplace(arg, dst, repl, src, regex)
      case "label_join" =>
        val arg = parseOr()
        expect(','); val dst = parseString()
        expect(','); val sep = parseString()
        val srcs = scala.collection.mutable.ListBuffer[String]()
        while (eat(',')) srcs += parseString()
        expect(')')
        LabelJoin(arg, dst, sep, srcs.toList)
      case "absent" =>
        val arg = parseOr()
        expect(')')
        Absent(arg)
      case "time" =>
        expect(')')
        TimeFn
      case "timestamp" =>
        val arg = parseOr()
        expect(')')
        TimestampFn(arg)
      case f if Ast.timeComponentFns.contains(f) =>
        // Prometheus allows a missing argument: hour() ≡ hour(time())
        val arg = if (peek() == ')') TimeFn else parseOr()
        expect(')')
        TimeComponentFn(f, arg)
      case "absent_over_time" =>
        val arg = parseOr()
        expect(')')
        arg match {
          case s: Selector if s.rangeMs > 0 => AbsentOverTime(s)
          case _ => fail("absent_over_time requires a range selector")
        }
      case "sort" | "sort_desc" =>
        val arg = parseOr()
        expect(')')
        SortFn(fn == "sort_desc", arg)
      case "sort_by_label" | "sort_by_label_desc" =>
        val arg = parseOr()
        val lbls = scala.collection.mutable.ListBuffer[String]()
        while (eat(',')) lbls += parseString()
        expect(')')
        if (lbls.isEmpty) fail(s"$fn requires at least one label argument")
        SortByLabel(fn == "sort_by_label_desc", arg, lbls.toList)
      case "predict_linear" =>
        val arg = parseOr()
        expect(',')
        val t = parseNumber()
        expect(')')
        arg match {
          case s: Selector if s.rangeMs > 0 => PredictLinear(s, t)
          case _ => fail("predict_linear requires a range selector")
        }
      case "round" =>
        val arg = parseOr()
        val to = if (eat(',')) parseNumber() else 1.0
        expect(')')
        RoundFn(arg, to)
      case "quantile_over_time" =>
        val q = parseNumber()
        expect(',')
        val arg = parseOr()
        expect(')')
        arg match {
          case s: Selector if s.rangeMs > 0 => QuantileOverTime(q, s)
          case _ => fail("quantile_over_time requires a range selector")
        }
      case "count_values" =>
        val lbl = parseString()
        expect(',')
        val arg = parseOr()
        expect(')')
        val (by, without) = parseGrouping()
        CountValues(lbl, arg, by, without)
      case f if Ast.aggOps.contains(f) =>
        // form: agg(expr) or agg(param, expr); by/without may follow args
        val param =
          if (Ast.paramAggOps.contains(f)) {
            val p = parseNumber(); expect(','); Some(p)
          } else None
        val arg = parseOr()
        expect(')')
        val (by, without) = parseGrouping()
        Agg(f, arg, by, without, param)
      case other => fail(s"unsupported function: $other")
    }
  }

  private def parseGrouping(): (List[String], List[String]) = {
    if (eatWord("by")) (parseLabelList(), Nil)
    else if (eatWord("without")) (Nil, parseLabelList())
    else (Nil, Nil)
  }

  private def parseSelectorTail(metric: String): Expr = {
    // aggregations may be written prefix-grouped: sum by (a) (expr)
    if (Ast.aggOps.contains(metric)) {
      val (by, without) = parseGrouping()
      if (by.nonEmpty || without.nonEmpty || peek() == '(') {
        expect('(')
        val param =
          if (Ast.paramAggOps.contains(metric)) {
            val p = parseNumber(); expect(','); Some(p)
          } else None
        val arg = parseOr()
        expect(')')
        return Agg(metric, arg, by, without, param)
      }
    }
    var matchers = List.empty[Matcher]
    skipWs()
    if (pos < input.length && input(pos) == '{') {
      pos += 1
      if (!eat('}')) {
        var continue = true
        while (continue) {
          val label = parseIdent()
          skipWs()
          val op =
            if (input.regionMatches(pos, "=~", 0, 2)) { pos += 2; MatchOp.Re }
            else if (input.regionMatches(pos, "!~", 0, 2)) { pos += 2; MatchOp.Nre }
            else if (input.regionMatches(pos, "!=", 0, 2)) { pos += 2; MatchOp.Ne }
            else if (pos < input.length && input(pos) == '=') { pos += 1; MatchOp.Eq }
            else fail(s"expected matcher op at $pos")
          val v = parseString()
          matchers ::= Matcher(label, op, v)
          if (!eat(',')) { expect('}'); continue = false }
        }
      }
    }
    var rangeMs = 0L
    var subStepMs = 0L
    skipWs()
    if (pos < input.length && input(pos) == '[') {
      pos += 1
      val start = pos
      while (pos < input.length && input(pos) != ']' && input(pos) != ':') pos += 1
      rangeMs = Parser.parseDurationMs(input.substring(start, pos))
      if (pos < input.length && input(pos) == ':') {
        pos += 1
        val s2 = pos
        while (pos < input.length && input(pos) != ']') pos += 1
        val sub = input.substring(s2, pos).trim
        if (sub.nonEmpty) subStepMs = Parser.parseDurationMs(sub)
      }
      expect(']')
    }
    var offsetMs = 0L
    var atKind = 0
    var atMs = 0L
    var modifiers = true
    while (modifiers) {
      if (eatWord("offset")) {
        skipWs()
        val start = pos
        while (pos < input.length && !input(pos).isWhitespace && input(pos) != ')' &&
          input(pos) != ',' && input(pos) != '}') pos += 1
        offsetMs = Parser.parseOffsetMs(input.substring(start, pos))
      } else {
        skipWs()
        if (pos < input.length && input(pos) == '@') {
          pos += 1
          skipWs()
          if (eatWord("start")) { expect('('); expect(')'); atKind = 2 }
          else if (eatWord("end")) { expect('('); expect(')'); atKind = 3 }
          else { atKind = 1; atMs = math.round(parseNumber() * 1000.0) }
        } else modifiers = false
      }
    }
    if (metric.isEmpty && matchers.isEmpty) fail("empty selector")
    Selector(metric, matchers.reverse, rangeMs, offsetMs, subStepMs, atKind, atMs)
  }
}
